package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the text/vector signature primitives.
  *
  * These compute EXACTLY the same values as the SQL higher-order-function
  * formulations in `graft.ops.{TextOps, PipelineQueries}` (same polynomial
  * recurrence mod 2^31-1 over codepoints, same fold order for floats) —
  * the DuckDB oracles are unchanged — but in ONE compiled pass per row
  * instead of nested interpreted lambda trees: a SimHash over T tokens is
  * T*32 interpreted lambda evaluations as a HOF vs one tight loop here.
  * CodegenFallback keeps them valid inside any plan; the per-row work is
  * a single JVM-compiled method either way.
  *
  * This is the preference order SURVEY §7 prescribes for operators Spark
  * lacks: compose built-ins first (the HOF versions remain in TextOps as
  * the reference formulation), then a native `Expression` where the hot
  * path warrants it.
  */
object TextExpressions {
  final val P = 2147483647L

  @inline def polyHash(s: String): Long = {
    // fold CODE POINTS, not UTF-16 units: the HOF form (split + ascii)
    // and DuckDB (unicode()) both see one value per code point, so a
    // surrogate pair (emoji, CJK-ext) must hash as one term here too
    var h = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      h = (h * 31 + cp) % P
      i += Character.charCount(cp)
    }
    h
  }

  private[functions] def tokens(text: String): Array[String] =
    text.split(" ").filter(_.nonEmpty)

  /** Distinct word-n-gram shingle hashes, first-occurrence order (same
    * set as TextOps.shingleHashes). */
  private[functions] def shingleHashes(text: String, n: Int): Array[Long] = {
    val t = tokens(text)
    val out = new java.util.LinkedHashSet[java.lang.Long]()
    if (t.length < n) out.add(polyHash(t.mkString(" ")))
    else {
      var i = 0
      while (i <= t.length - n) {
        val sb = new StringBuilder
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(t(i + j)); j += 1
        }
        out.add(polyHash(sb.toString)); i += 1
      }
    }
    val arr = new Array[Long](out.size)
    val it = out.iterator; var i = 0
    while (it.hasNext) { arr(i) = it.next(); i += 1 }
    arr
  }
}

/** shingle_hashes(text, n): distinct word n-gram polynomial hashes. */
case class ShingleHashesExpr(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  // literal inputs fold to a literal at plan time (ConstantFolding)
  override def foldable: Boolean = child.foldable
  override protected def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      TextExpressions.shingleHashes(input.asInstanceOf[UTF8String].toString, n))
  override protected def withNewChildInternal(newChild: Expression) =
    copy(child = newChild)
}

/** minhash_sig(hashes, k): k-permutation MinHash signature over a hash
  * array — sig_i = min (h*(1+7919 i) + (1+104729 i)) mod P. */
case class MinHashSigExpr(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  // literal inputs fold to a literal at plan time (ConstantFolding)
  override def foldable: Boolean = child.foldable
  override protected def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData].toLongArray()
    val sig = new Array[Long](k)
    var i = 0
    while (i < k) {
      val a = 1L + 7919L * i
      val b = 1L + 104729L * i
      var mn = Long.MaxValue
      var j = 0
      while (j < hs.length) {
        val v = (hs(j) * a + b) % TextExpressions.P
        if (v < mn) mn = v
        j += 1
      }
      sig(i) = if (hs.isEmpty) 0L else mn
      i += 1
    }
    new GenericArrayData(sig)
  }
  override protected def withNewChildInternal(newChild: Expression) =
    copy(child = newChild)
}

/** simhash32(text): 32-bit SimHash over the token multiset (bit j set iff
  * sum over tokens of +-1 on bit j of polyHash(token) is positive). */
case class SimHash32Expr(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  // literal inputs fold to a literal at plan time (ConstantFolding)
  override def foldable: Boolean = child.foldable
  override protected def nullSafeEval(input: Any): Any = {
    val toks = TextExpressions.tokens(input.asInstanceOf[UTF8String].toString)
    val votes = new Array[Int](32)
    var i = 0
    while (i < toks.length) {
      val h = TextExpressions.polyHash(toks(i))
      var j = 0
      while (j < 32) {
        if (((h >> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
        j += 1
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < 32) { if (votes(j) > 0) sig |= (1L << j); j += 1 }
    sig
  }
  override protected def withNewChildInternal(newChild: Expression) =
    copy(child = newChild)
}

/** simhash64(text): 64-bit SimHash over the token multiset — the
  * PRODUCTION geometry for Hamming-radius dedup (q165's scaladoc
  * valve: 16-bit bands over 64 bits keep band occupancy ~1 per value
  * at corpus scale, where sig32/8-bit bands saturate). polyHash gives
  * 31 uniform bits; the upper 32 bits vote on the avalanche31-mixed
  * hash (the Sketches uniformity chain), so the two halves are
  * decorrelated. Bits 31 and 63 are structurally 0 (both source
  * hashes are 31-bit) — 62 informative bits, stated honestly. */
case class SimHash64Expr(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def foldable: Boolean = child.foldable
  private def avalanche31(h0: Long): Long = {
    var h = h0
    h ^= h >> 15
    h = (h * 739982445L) & 2147483647L
    h ^= h >> 12
    h = (h * 695872825L) & 2147483647L
    h ^ (h >> 15)
  }
  override protected def nullSafeEval(input: Any): Any = {
    val toks = TextExpressions.tokens(input.asInstanceOf[UTF8String].toString)
    val votes = new Array[Int](64)
    var i = 0
    while (i < toks.length) {
      val h = TextExpressions.polyHash(toks(i))
      val g = avalanche31(h)
      var j = 0
      while (j < 32) {
        if (((h >> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
        if (((g >> j) & 1L) == 1L) votes(32 + j) += 1
        else votes(32 + j) -= 1
        j += 1
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < 64) { if (votes(j) > 0) sig |= (1L << j); j += 1 }
    sig
  }
  override protected def withNewChildInternal(newChild: Expression) =
    copy(child = newChild)
}

/** winnow_fp(text, k, w): distinct minima of w-windows over char k-gram
  * rolling hashes (MOSS winnowing fingerprint). */
case class WinnowFpExpr(child: Expression, k: Int, w: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  // literal inputs fold to a literal at plan time (ConstantFolding)
  override def foldable: Boolean = child.foldable
  override protected def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString
    val nGrams = math.max(text.length - k, 0) + 1
    val grams = new Array[Long](nGrams)
    var i = 0
    while (i < nGrams) {
      grams(i) = TextExpressions.polyHash(
        text.substring(i, math.min(i + k, text.length)))
      i += 1
    }
    val out = new java.util.LinkedHashSet[java.lang.Long]()
    if (grams.length < w) out.add(grams.min)
    else {
      var j = 0
      while (j <= grams.length - w) {
        var mn = Long.MaxValue
        var x = 0
        while (x < w) { if (grams(j + x) < mn) mn = grams(j + x); x += 1 }
        out.add(mn); j += 1
      }
    }
    val arr = new Array[Long](out.size)
    val it = out.iterator; var y = 0
    while (it.hasNext) { arr(y) = it.next(); y += 1 }
    new GenericArrayData(arr)
  }
  override protected def withNewChildInternal(newChild: Expression) =
    copy(child = newChild)
}

/** char_gram_hashes(text, k): distinct char k-gram polynomial hashes in
  * first-occurrence order — the char-mode sibling of ShingleHashesExpr
  * (grams at code-point positions 0..max(len-k, 0), the final ones
  * clamped, matching the SQL `transform(sequence(0, greatest(len-k,0)),
  * i -> poly(substring(text, i+1, k)))` spec kept as the DuckDB oracle).
  * One tight loop over the code-point array — no per-position substring
  * allocation, no interpreted lambda tree. */
case class CharGramHashesExpr(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  // literal inputs fold to a literal at plan time (ConstantFolding)
  override def foldable: Boolean = child.foldable
  override protected def nullSafeEval(input: Any): Any = {
    val cps = input.asInstanceOf[UTF8String].toString.codePoints().toArray
    val nPos = math.max(cps.length - k, 0) + 1
    val out = new java.util.LinkedHashSet[java.lang.Long]()
    var i = 0
    while (i < nPos) {
      var h = 0L
      var j = i
      val end = math.min(i + k, cps.length)
      while (j < end) { h = (h * 31 + cps(j)) % TextExpressions.P; j += 1 }
      out.add(h)
      i += 1
    }
    val arr = new Array[Long](out.size)
    val it = out.iterator; var y = 0
    while (it.hasNext) { arr(y) = it.next(); y += 1 }
    new GenericArrayData(arr)
  }
  override protected def withNewChildInternal(newChild: Expression) =
    copy(child = newChild)
}

/** sorted_intersect_size(a, b): |A ∩ B| of two ASCENDING-sorted distinct
  * long arrays via a zero-allocation merge walk — the verify kernel of
  * the prefix-filtered Jaccard join. Equals size(array_intersect(a, b))
  * for distinct inputs but is O(|a|+|b|) with no per-row hash set (the
  * built-in was measured 10x slower on the q28 candidate verify). */
case class SortedIntersectSizeExpr(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = IntegerType
  override def foldable: Boolean = left.foldable && right.foldable
  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData].toLongArray()
    val y = b.asInstanceOf[ArrayData].toLongArray()
    var i = 0; var j = 0; var n = 0
    while (i < x.length && j < y.length) {
      if (x(i) == y(j)) { n += 1; i += 1; j += 1 }
      else if (x(i) < y(j)) i += 1
      else j += 1
    }
    n
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** dot_f(a, b): left-fold dot product of two float arrays accumulated in
  * double — IEEE-identical to the HOF/list_reduce formulation. */
case class DotProductExpr(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def foldable: Boolean = left.foldable && right.foldable
  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData].toFloatArray()
    val y = b.asInstanceOf[ArrayData].toFloatArray()
    var acc = 0.0
    var i = 0
    val n = math.min(x.length, y.length)
    while (i < n) { acc = acc + x(i).toDouble * y(i).toDouble; i += 1 }
    acc
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** vec_lsh(v, bits): random-hyperplane LSH bucket (same deterministic
  * integer planes as VectorOps.lshSignature). */
case class VecLshExpr(child: Expression, bits: Int, table: Int = 0)
    extends UnaryExpression with CodegenFallback {
  // OR-amplification support: `table` selects an INDEPENDENT hyperplane
  // family — bit j of table t uses global plane index t*bits + j, so
  // table 0 is exactly the historical single-table signature and tables
  // never share a plane (Charikar STOC'02 sign-random-projection;
  // amplified 1-(1-p^bits)^L recall like MinHash banding)
  require(table >= 0, s"vec_lsh table must be >= 0, got $table")
  override def dataType: DataType = LongType
  // literal inputs fold to a literal at plan time (ConstantFolding)
  override def foldable: Boolean = child.foldable
  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData].toFloatArray()
    var sig = 0L
    var j = 0
    while (j < bits) {
      var d = 0.0
      var i = 0
      val plane = table.toLong * bits + j
      while (i < v.length) {
        // plane component: QUADRATIC congruential mix of x = i+plane*64.
        // A plain multiplicative hash (x*c mod P mod 2001) has LCG
        // lattice structure — measured: 162 of 19900 plane pairs with
        // |sign corr| > 0.9, some planes near-identical directions,
        // which silently caps OR-amplified recall (~0.81 where theory
        // says >= 0.9 at bits=20, L=50). Squaring mod P breaks the
        // affine lattice (0 correlated pairs measured; recall 0.977).
        // Bounds: x < dim + 82k so x*c < 2^53; y < P so y*y < 2^62;
        // (y*y%P + x)*c < 2^63 — safe in checked-BIGINT engines too.
        // NB: ((x * planeInt) / 1000.0) — the exact op order of the SQL
        // formulation (x * plane / 1000.0 parses left-assoc); a
        // mathematically-equal x * (planeInt/1000.0) can differ in ULPs
        // and flip a bucket sign
        val x = i + plane * 64L
        val y = x * 2654435761L % TextExpressions.P
        val planeInt = ((y * y % TextExpressions.P + x) * 2654435761L
          % TextExpressions.P % 2001L - 1000L).toDouble
        d = d + v(i).toDouble * planeInt / 1000.0
        i += 1
      }
      if (d > 0) sig |= (1L << j)
      j += 1
    }
    sig
  }
  override protected def withNewChildInternal(newChild: Expression) =
    copy(child = newChild)
}

/** ngram_repeat_stats(text, n): per-document repetition statistics over
  * the word n-gram MULTISET — struct(n_grams, n_distinct, top_n) where
  * top_n is the occurrence count of the most repeated n-gram. Same
  * values as the explode + groupBy(doc, gram) + groupBy(doc) two-shuffle
  * formulation (the DuckDB oracle keeps that shape), but computed in one
  * hash-map pass per row: repetition is a PER-DOCUMENT signal, so a
  * 100 TB quality scan needs zero shuffles — this expression is the
  * difference between a map-only stage and two corpus-wide exchanges.
  * Short docs (< n tokens) collapse to one whole-doc gram, matching
  * TextOps.wordShingles; ZERO-token docs yield (0, 0, 0) — the
  * explode formulation produces no rows for them, so downstream
  * queries drop them with a `n_grams > 0` filter to stay aligned. */
/** token_spans(text, n): every rolling n-token span (single-space
  * joined), in position order, duplicates kept; empty when the doc has
  * fewer than n tokens. The compiled form of the transform + slice +
  * array_join HOF chain the duplicate-span audit explodes (interpreted
  * lambdas measured ~3x slower on the q97 volume — PERF lesson 3). */
case class TokenSpansExpr(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {
  // n <= 0 would silently yield t.length - n + 1 degenerate spans per
  // doc instead of an error — fail at construction (= plan time)
  require(n >= 1, s"token_spans span width must be >= 1, got $n")
  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)
  // literal inputs fold to a literal at plan time (ConstantFolding)
  override def foldable: Boolean = child.foldable
  override protected def nullSafeEval(input: Any): Any = {
    val t = TextExpressions.tokens(input.asInstanceOf[UTF8String].toString)
    if (t.length < n) new GenericArrayData(Array.empty[Any])
    else {
      val out = new Array[Any](t.length - n + 1)
      var i = 0
      while (i <= t.length - n) {
        val sb = new java.lang.StringBuilder
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(t(i + j)); j += 1
        }
        out(i) = UTF8String.fromString(sb.toString); i += 1
      }
      new GenericArrayData(out)
    }
  }
  override protected def withNewChildInternal(newChild: Expression) =
    copy(child = newChild)
}

/** span_hashes(text, n): polynomial char hash of every rolling n-token
  * span (exactly char_poly_hash of the single-space-joined span string,
  * space included between tokens) WITHOUT building the strings — the
  * one-pass kernel of the hash-first duplicate-span audit's position
  * pass. The hash choice is free there (a true duplicate span always
  * repeats whatever hash; collisions are corrected by the exact string
  * regroup), so a cheap rolling polynomial beats per-position
  * interpreted-lambda slicing + xxhash64. Invariant (property-tested):
  * span_hashes(text, n)[i] == char_poly_hash(token_spans(text, n)[i]). */
case class SpanHashesExpr(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {
  require(n >= 1, s"span_hashes span width must be >= 1, got $n")
  override def dataType: DataType =
    ArrayType(LongType, containsNull = false)
  override def foldable: Boolean = child.foldable
  override protected def nullSafeEval(input: Any): Any = {
    val t = TextExpressions.tokens(input.asInstanceOf[UTF8String].toString)
    if (t.length < n) new GenericArrayData(Array.empty[Any])
    else {
      // prefix hashes would need modular division to roll; with n <= a
      // few dozen tokens a direct per-span fold is already linear in
      // output size (the same work the string build was doing)
      val out = new Array[Any](t.length - n + 1)
      var i = 0
      while (i <= t.length - n) {
        var h = 0L
        var j = 0
        while (j < n) {
          if (j > 0) h = (h * 31L + 32L) % TextExpressions.P // ' '
          val w = t(i + j)
          var k = 0
          while (k < w.length) {
            h = (h * 31L + w.charAt(k).toLong) % TextExpressions.P
            k += 1
          }
          j += 1
        }
        out(i) = h
        i += 1
      }
      new GenericArrayData(out)
    }
  }
  override protected def withNewChildInternal(newChild: Expression) =
    copy(child = newChild)
}

/** char_poly_hash(s): the fold (h*31 + char) mod P over a string's
  * chars — the string-side twin of [[SpanHashesExpr]] (hashing the
  * already-materialized span in the exact-verify pass). */
case class CharPolyHashExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def foldable: Boolean = child.foldable
  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    var h = 0L
    var k = 0
    while (k < s.length) {
      h = (h * 31L + s.charAt(k).toLong) % TextExpressions.P
      k += 1
    }
    h
  }
  override protected def withNewChildInternal(newChild: Expression) =
    copy(child = newChild)
}

/** normalize_text(s, form): Unicode normalization (java.text.Normalizer)
  * — the canonicalization pass a dedup pipeline needs BEFORE any
  * exact/hash gate: a decomposed "e<combining acute>" and the composed
  * "é" are different byte strings (different content hashes,
  * different shingles) for the same text, so non-NFC twins silently
  * defeat exact dedup. `form`: NFC (canonical compose — the DuckDB
  * `nfc_normalize` twin, oracled), NFD, NFKC, NFKD (compatibility
  * folds: ligatures, fullwidth forms). Idempotent by the Unicode
  * stability guarantee — spec-asserted. Per-row scalar, map-only. */
case class NormalizeTextExpr(child: Expression, form: String)
    extends UnaryExpression with CodegenFallback {
  private val f = form.toUpperCase match {
    case "NFC" => java.text.Normalizer.Form.NFC
    case "NFD" => java.text.Normalizer.Form.NFD
    case "NFKC" => java.text.Normalizer.Form.NFKC
    case "NFKD" => java.text.Normalizer.Form.NFKD
    case other => throw new IllegalArgumentException(
      s"normalize_text form must be NFC|NFD|NFKC|NFKD (got $other)")
  }
  override def dataType: DataType = StringType
  override def foldable: Boolean = child.foldable
  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    // fast path: already-normalized text (the overwhelming case in a
    // clean corpus) copies nothing
    if (java.text.Normalizer.isNormalized(s, f)) input
    else UTF8String.fromString(java.text.Normalizer.normalize(s, f))
  }
  override protected def withNewChildInternal(newChild: Expression) =
    copy(child = newChild)
}

case class NgramRepeatStatsExpr(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StructType(Seq(
    StructField("n_grams", LongType, nullable = false),
    StructField("n_distinct", LongType, nullable = false),
    StructField("top_n", LongType, nullable = false)))
  // literal inputs fold to a literal at plan time (ConstantFolding)
  override def foldable: Boolean = child.foldable
  override protected def nullSafeEval(input: Any): Any = {
    val t = TextExpressions.tokens(input.asInstanceOf[UTF8String].toString)
    if (t.length == 0) return InternalRow(0L, 0L, 0L)
    val counts = new java.util.HashMap[String, Long]()
    var total = 0L
    if (t.length < n) {
      counts.put(t.mkString(" "), 1L)
      total = 1L
    } else {
      var i = 0
      while (i <= t.length - n) {
        val sb = new StringBuilder
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(t(i + j)); j += 1
        }
        counts.merge(sb.toString, 1L, _ + _)
        total += 1L
        i += 1
      }
    }
    var top = 0L
    val it = counts.values().iterator()
    while (it.hasNext) { val c = it.next(); if (c > top) top = c }
    InternalRow(total, counts.size.toLong, top)
  }
  override protected def withNewChildInternal(newChild: Expression) =
    copy(child = newChild)
}

/** feature_hash_counts(text, dims): token-count vector of length `dims`
  * with dim = polyHash(token) mod dims — the feature-hashing vectorizer
  * kernel. Same values as the HOF formulation
  * `transform(sequence(0, dims-1), i -> size(filter(th, h -> h % dims
  * = i)))` (which the DuckDB oracle keeps), but one tokenize+hash pass
  * per row instead of dims interpreted filter scans over an
  * interpreted per-token hash. */
case class FeatureHashCountsExpr(child: Expression, dims: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  // literal inputs fold to a literal at plan time (ConstantFolding)
  override def foldable: Boolean = child.foldable
  override protected def nullSafeEval(input: Any): Any = {
    val t = TextExpressions.tokens(input.asInstanceOf[UTF8String].toString)
    val vec = new Array[Long](dims)
    var i = 0
    while (i < t.length) {
      vec((TextExpressions.polyHash(t(i)) % dims).toInt) += 1L
      i += 1
    }
    new GenericArrayData(vec)
  }
  override protected def withNewChildInternal(newChild: Expression) =
    copy(child = newChild)
}

/** token_positions(text): per-document positional postings as an array
  * of (t, tf, pos) structs in first-occurrence order — `pos` is the
  * ascending 0-based token positions of `t` within the whitespace token
  * stream (empty strings dropped, matching [[TextExpressions.tokens]]).
  * One hash-map pass per row turns the positional-index build into a
  * MAP-ONLY stage: the postings list is a per-row value, no corpus-wide
  * shuffle of token occurrences. The explode + posexplode + groupBy
  * formulation (which the DuckDB oracle keeps) produces the same rows. */
case class TokenPositionsExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("t", StringType, nullable = false),
    StructField("tf", LongType, nullable = false),
    StructField("pos", ArrayType(IntegerType, containsNull = false),
      nullable = false))), containsNull = false)
  // literal inputs fold to a literal at plan time (ConstantFolding)
  override def foldable: Boolean = child.foldable
  override protected def nullSafeEval(input: Any): Any = {
    val t = TextExpressions.tokens(input.asInstanceOf[UTF8String].toString)
    val posByTerm =
      new java.util.LinkedHashMap[String, java.util.ArrayList[Int]]()
    var i = 0
    while (i < t.length) {
      posByTerm.computeIfAbsent(t(i),
        _ => new java.util.ArrayList[Int]()).add(i)
      i += 1
    }
    val out = new Array[Any](posByTerm.size)
    val it = posByTerm.entrySet().iterator()
    var j = 0
    while (it.hasNext) {
      val e = it.next()
      val ps = e.getValue
      val pa = new Array[Int](ps.size())
      var k = 0
      while (k < pa.length) { pa(k) = ps.get(k); k += 1 }
      out(j) = InternalRow(UTF8String.fromString(e.getKey),
        ps.size().toLong, new GenericArrayData(pa))
      j += 1
    }
    new GenericArrayData(out)
  }
  override protected def withNewChildInternal(newChild: Expression) =
    copy(child = newChild)
}

/** token_tf(text): per-document term frequencies as an array of
  * (t, tf) structs in first-occurrence order — the same pairs the
  * explode + groupBy(doc, token) formulation produces (which the DuckDB
  * oracle keeps), computed in one hash-map pass per row. Turns a
  * corpus-wide shuffle of EVERY token occurrence into a map-only stage:
  * downstream only shuffles one row per DISTINCT token per doc. */
case class TokenTfExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("t", StringType, nullable = false),
    StructField("tf", LongType, nullable = false))), containsNull = false)
  // literal inputs fold to a literal at plan time (ConstantFolding)
  override def foldable: Boolean = child.foldable
  override protected def nullSafeEval(input: Any): Any = {
    val t = TextExpressions.tokens(input.asInstanceOf[UTF8String].toString)
    val counts = new java.util.LinkedHashMap[String, Long]()
    var i = 0
    while (i < t.length) {
      counts.merge(t(i), 1L, _ + _)
      i += 1
    }
    val out = new Array[Any](counts.size)
    val it = counts.entrySet().iterator()
    var j = 0
    while (it.hasNext) {
      val e = it.next()
      out(j) = InternalRow(UTF8String.fromString(e.getKey), e.getValue)
      j += 1
    }
    new GenericArrayData(out)
  }
  override protected def withNewChildInternal(newChild: Expression) =
    copy(child = newChild)
}

/** feature_buckets(text, b): DSIR hashed n-gram feature buckets —
  * unigram then bigram polynomial hashes mod `b`, in text order (the
  * fold order every DSIR weight sum uses; Curation.featureBuckets is the
  * HOF reference formulation). The bigram hash reuses the token hashes
  * by rolling arithmetic — polyHash(a+" "+b) =
  * ((h_a*31+32)*31^cp(b) + h_b) mod P — so the pass allocates no gram
  * strings: one codepoint scan per token, then O(1) per bigram. */
case class FeatureBucketsExpr(child: Expression, b: Int)
    extends UnaryExpression with CodegenFallback {
  require(b >= 1, s"feature_buckets needs b >= 1 buckets, got $b")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  // literal inputs fold to a literal at plan time (ConstantFolding)
  override def foldable: Boolean = child.foldable
  override protected def nullSafeEval(input: Any): Any = {
    import TextExpressions.P
    val t = TextExpressions.tokens(input.asInstanceOf[UTF8String].toString)
    val n = t.length
    val hs = new Array[Long](n) // polyHash(token)
    val pw = new Array[Long](n) // 31^codepointCount(token) mod P
    var i = 0
    while (i < n) {
      val s = t(i)
      var h = 0L; var p = 1L; var j = 0
      while (j < s.length) {
        val cp = s.codePointAt(j)
        h = (h * 31 + cp) % P
        p = (p * 31) % P
        j += Character.charCount(cp)
      }
      hs(i) = h; pw(i) = p; i += 1
    }
    val out = new Array[Long](if (n < 2) n else 2 * n - 1)
    i = 0
    while (i < n) { out(i) = hs(i) % b; i += 1 }
    i = 0
    while (i < n - 1) {
      val withSpace = (hs(i) * 31 + 32) % P // then shift past token i+1
      out(n + i) = ((withSpace * pw(i + 1)) % P + hs(i + 1)) % P % b
      i += 1
    }
    new GenericArrayData(out)
  }
  override protected def withNewChildInternal(newChild: Expression) =
    copy(child = newChild)
}

/** HTML → text extraction in ONE pass — the WET-style content pull a
  * web-scale training pipeline runs before any quality/dedup stage
  * (Common Crawl WET extraction; trafilatura/jusText do the same
  * strip-tags-drop-script core before their heuristics).
  *
  * Semantics (state machine, mirrored by the q202 DuckDB oracle's
  * regexp_replace chain — two INDEPENDENT implementations under one
  * differential hash):
  *   - `<script ...>...</script>` and `<style ...>...</style>` blocks
  *     are dropped WITH their content (lowercase tags; an unclosed
  *     block falls back to plain tag-strip, like the oracle's
  *     non-matching regex);
  *   - `<!-- ... -->` comments are dropped;
  *   - every remaining `<...>` tag is replaced by a space (block
  *     boundaries must separate words, never glue them);
  *   - the named entities `&lt; &gt; &quot; &#39; &nbsp; &amp;` decode
  *     by longest-prefix match at the cursor, single pass, no rescan —
  *     equivalent to the oracle's replace chain with `&amp;` LAST
  *     (decoded output never re-forms an entity);
  *   - whitespace runs collapse to one space; result is trimmed.
  */
case class HtmlExtractExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def foldable: Boolean = child.foldable

  private val entities = Array(
    "&lt;" -> '<', "&gt;" -> '>', "&quot;" -> '"',
    "&#39;" -> '\'', "&nbsp;" -> ' ', "&amp;" -> '&')

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val n = s.length
    val sb = new java.lang.StringBuilder(n)
    var pendingSpace = false
    def emit(ch: Char): Unit = {
      if (ch == ' ' || ch == '\t' || ch == '\n' || ch == '\r') {
        pendingSpace = sb.length > 0
      } else {
        if (pendingSpace) { sb.append(' '); pendingSpace = false }
        sb.append(ch)
      }
    }
    var i = 0
    while (i < n) {
      val ch = s.charAt(i)
      if (ch == '<') {
        if (s.startsWith("<!--", i)) {
          val end = s.indexOf("-->", i + 4)
          // unterminated comment swallows the rest, as the spec says
          // browsers do and the oracle's regex declines to match —
          // synthesized corpora never hit this; keep tag-strip fallback
          if (end >= 0) { i = end + 3; pendingSpace = sb.length > 0 }
          else { val gt = s.indexOf('>', i); i = if (gt >= 0) gt + 1 else n
            pendingSpace = sb.length > 0 }
        } else if (s.startsWith("<script", i)) {
          val close = s.indexOf("</script>", i)
          val gt = s.indexOf('>', i)
          if (close >= 0 && gt >= 0) { i = close + "</script>".length
            pendingSpace = sb.length > 0 }
          else { i = if (gt >= 0) gt + 1 else n; pendingSpace = sb.length > 0 }
        } else if (s.startsWith("<style", i)) {
          val close = s.indexOf("</style>", i)
          val gt = s.indexOf('>', i)
          if (close >= 0 && gt >= 0) { i = close + "</style>".length
            pendingSpace = sb.length > 0 }
          else { i = if (gt >= 0) gt + 1 else n; pendingSpace = sb.length > 0 }
        } else {
          val gt = s.indexOf('>', i)
          if (gt >= 0) { i = gt + 1; pendingSpace = sb.length > 0 }
          else { emit(ch); i += 1 } // stray '<' with no close: literal
        }
      } else if (ch == '&') {
        var k = 0
        var matched = false
        while (k < entities.length && !matched) {
          val (ent, rep) = entities(k)
          if (s.startsWith(ent, i)) { emit(rep); i += ent.length
            matched = true }
          k += 1
        }
        if (!matched) { emit(ch); i += 1 }
      } else { emit(ch); i += 1 }
    }
    UTF8String.fromString(sb.toString)
  }
  override protected def withNewChildInternal(newChild: Expression) =
    copy(child = newChild)
}
