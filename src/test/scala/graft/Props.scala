package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.dialect.Increments
import graft.functions.TextExpressions
import graft.ingest.SchemaInference

/** Property-based invariants (SURVEY §5 test plan) — pure-logic layers
  * only, so these run without a Spark session. */
object GraftProps extends Properties("graft") {

  private val genTime = for {
    epoch <- Gen.choose(0L, 4102444800L) // 1970..2100
  } yield java.time.LocalDateTime.ofEpochSecond(epoch, 0,
    java.time.ZoneOffset.UTC)

  property("increments.resolve yields positive n and a known unit") =
    forAll(genTime, Gen.choose(1L, 10L * 365 * 86400), Gen.choose(1, 10000)) {
      (lo, spanSec, points) =>
        val hi = lo.plusSeconds(spanSec)
        val (unit, n) = Increments.resolve(lo, hi, points)
        n >= 1 && Seq("second", "minute", "hour", "day", "month", "year")
          .contains(unit)
    }

  property("increments.resolve bucket width is within the target span") =
    forAll(genTime, Gen.choose(3600L, 5L * 365 * 86400), Gen.choose(10, 5000)) {
      (lo, spanSec, points) =>
        val hi = lo.plusSeconds(spanSec)
        val (unit, n) = Increments.resolve(lo, hi, points)
        val unitSec = Map("second" -> 1L, "minute" -> 60L, "hour" -> 3600L,
          "day" -> 86400L, "month" -> 2592000L, "year" -> 31536000L)(unit)
        // bucket width never exceeds the span itself
        unitSec * n <= math.max(spanSec, unitSec)
    }

  private val genAscii = Gen.listOf(Gen.choose(32.toChar, 126.toChar))
    .map(_.mkString)

  property("polyHash stays in [0, P)") = forAll(genAscii) { s =>
    val h = TextExpressions.polyHash(s)
    h >= 0 && h < TextExpressions.P
  }

  property("polyHash is deterministic and content-sensitive") =
    forAll(genAscii, genAscii) { (a, b) =>
      (TextExpressions.polyHash(a) == TextExpressions.polyHash(a)) &&
        (a == b || a.length > 12 ||
          // short distinct strings essentially never collide mod P
          TextExpressions.polyHash(a + "x") != TextExpressions.polyHash(a + "y"))
    }

  private val genValue: Gen[Any] = Gen.oneOf(
    Gen.choose(-1000000, 1000000).map(x => x: Any),
    Gen.choose(-1e6, 1e6).map(x => x: Any),
    Gen.alphaNumStr.map(x => x: Any),
    Gen.oneOf(true, false).map(x => x: Any))

  property("inferSchema accepts any row order (lattice join commutes)") =
    forAll(Gen.listOfN(5, genValue)) { vs =>
      val rows = vs.zipWithIndex.map { case (v, i) =>
        Map[String, Any]("c" -> v, s"k$i" -> i)
      }
      SchemaInference.inferSchema(rows).toMap ==
        SchemaInference.inferSchema(rows.reverse).toMap
    }

  property("widened type accepts both operands' widths (absorption)") =
    forAll(Gen.choose(0, 10), Gen.choose(0, 10)) { (i, j) =>
      import SchemaInference._
      val all = Vector[ELType](ELBool, ELInt, ELBigInt, ELDecimal, ELFloat,
        ELUuid, ELTimestamp, ELDate, ELTime, ELCidr, ELVarchar)
      val a = all(i % all.size); val b = all(j % all.size)
      val w = widen(a, b)
      // joining again with either operand is a no-op (absorption law)
      widen(w, a) == w && widen(w, b) == w
    }

  // ---- prefix-filtered AllPairs completeness (the theorem behind
  // Dedup.jaccardPairs, mirrored in pure logic): a pair at or above the
  // Jaccard threshold ALWAYS shares a token inside both docs' prefixes
  // at a position passing the PPJoin bound. Small alphabets force heavy
  // token sharing — the adversarial regime for the filter.
  private val genDocSet: Gen[Set[Long]] = for {
    n <- Gen.choose(1, 12)
    toks <- Gen.listOfN(n, Gen.choose(0L, 20L))
  } yield toks.toSet
  private val genCorpus: Gen[List[Set[Long]]] =
    Gen.choose(3, 9).flatMap(k => Gen.listOfN(k, genDocSet))

  property("prefix+positional candidate generation is complete") =
    forAll(genCorpus, Gen.oneOf(0.3, 0.5, 0.7)) { (docs, t) =>
      val df = docs.flatten.groupBy(identity).map { case (h, o) =>
        h -> o.size
      }
      // global total order: (df asc, token asc)
      def ordered(s: Set[Long]): Vector[Long] =
        s.toVector.sortBy(h => (df(h), h))
      def prefix(s: Set[Long]): Vector[(Long, Int)] = {
        val ord = ordered(s)
        val p = ord.size - math.ceil(t * ord.size).toInt + 1
        ord.take(p).zipWithIndex
      }
      val minFrac = t / (1.0 + t)
      val candidates = (for {
        i <- docs.indices; j <- docs.indices if i < j
        pi = prefix(docs(i)); pj = prefix(docs(j))
        ni = docs(i).size; nj = docs(j).size
        shared = pi.exists { case (h, pos) =>
          pj.exists { case (h2, pos2) =>
            h == h2 &&
              math.min(ni - pos, nj - pos2) >= (ni + nj) * minFrac
          }
        }
        if shared
      } yield (i, j)).toSet
      val truePairs = (for {
        i <- docs.indices; j <- docs.indices if i < j
        inter = (docs(i) & docs(j)).size
        jac = inter.toDouble / (docs(i).size + docs(j).size - inter)
        if jac >= t
      } yield (i, j)).toSet
      truePairs.subsetOf(candidates)
    }

  // ---- containment candidate completeness (the q89 theorem): a pair
  // with |A∩B|/|A| >= t always shares a token inside A's df-ordered
  // prefix — the index side keeps ALL tokens, so the A-prefix join
  // generates every qualifying directional pair.
  property("containment prefix candidate generation is complete") =
    forAll(genCorpus, Gen.oneOf(0.5, 0.8, 0.9)) { (docs, t) =>
      val df = docs.flatten.groupBy(identity).map { case (h, o) =>
        h -> o.size
      }
      def prefix(s: Set[Long]): Set[Long] = {
        val ord = s.toVector.sortBy(h => (df(h), h))
        ord.take(ord.size - math.ceil(t * ord.size).toInt + 1).toSet
      }
      (for {
        a <- docs.indices; b <- docs.indices if a != b
        inter = (docs(a) & docs(b)).size
        if inter.toDouble / docs(a).size >= t
      } yield (prefix(docs(a)) & docs(b)).nonEmpty).forall(identity)
    }

  // ---- native token-span kernel (TokenSpansExpr eval, no session):
  // span count, width, and content must match the slicing definition
  property("token_spans: count and per-span reconstruction") =
    forAll(Gen.listOf(Gen.oneOf("a", "bb", "ccc", "d", "")),
        Gen.choose(1, 6)) { (ws, n) =>
      val text = ws.mkString(" ")
      val toks = text.split(" ").filter(_.nonEmpty)
      val out = graft.functions.TokenSpansExpr(
          org.apache.spark.sql.catalyst.expressions.Literal.create(
            text, org.apache.spark.sql.types.StringType), n)
        .eval(null)
        .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      val spans = (0 until out.numElements())
        .map(i => out.getUTF8String(i).toString)
      spans.length == math.max(0, toks.length - n + 1) &&
        spans.zipWithIndex.forall { case (s, i) =>
          s == toks.slice(i, i + n).mkString(" ")
        }
    }

  // ---- native span-hash kernel vs the string route: the invariant the
  // hash-first duplicate-span audit's two passes stand on —
  // span_hashes(text, n)[i] == char_poly_hash(token_spans(text, n)[i])
  // — on arbitrary token shapes (empties, repeats, unicode chars)
  property("span_hashes == char_poly_hash of each token span") =
    forAll(Gen.listOf(Gen.oneOf("a", "bb", "ccc", "", "é世")),
        Gen.choose(1, 5)) { (ws, n) =>
      import org.apache.spark.sql.catalyst.expressions.Literal
      import org.apache.spark.sql.catalyst.util.ArrayData
      import org.apache.spark.sql.types.StringType
      val text = ws.mkString(" ")
      val hs = graft.functions.SpanHashesExpr(
          Literal.create(text, StringType), n)
        .eval(null).asInstanceOf[ArrayData]
      val sp = graft.functions.TokenSpansExpr(
          Literal.create(text, StringType), n)
        .eval(null).asInstanceOf[ArrayData]
      hs.numElements() == sp.numElements() &&
        (0 until hs.numElements()).forall { i =>
          val viaString = graft.functions.CharPolyHashExpr(
              Literal.create(sp.getUTF8String(i).toString, StringType))
            .eval(null).asInstanceOf[Long]
          hs.getLong(i) == viaString
        }
    }

  // ---- sequence-packing arithmetic (Packing.sequencePack in pure
  // logic): offsets stay inside the sequence, seq ids never decrease,
  // and an id gap can only follow a doc longer than the gap it skips.
  property("packing offsets and seq ids are consistent") =
    forAll(Gen.nonEmptyListOf(Gen.choose(1, 2000)), Gen.choose(16, 1024)) {
      (toks, seqLen) =>
        val cums = toks.scanLeft(0L)(_ + _).tail
        val rows = toks.zip(cums).map { case (n, cum) =>
          ((cum - n) / seqLen, (cum - n) % seqLen, n)
        }
        val offsetsOk = rows.forall { case (_, off, _) =>
          off >= 0 && off < seqLen
        }
        val monotone = rows.sliding(2).forall {
          case Seq((s1, _, _), (s2, _, _)) => s2 >= s1
          case _ => true
        }
        val gapsExplained = rows.sliding(2).forall {
          case Seq((s1, _, n1), (s2, _, _)) =>
            s2 <= s1 + 1 || n1 > (s2 - s1 - 1) * seqLen
          case _ => true
        }
        offsetsOk && monotone && gapsExplained
    }

  // ---- Modbus map kernels (streaming/ModbusMap.scala) --------------

  private val genAddrs = Gen.nonEmptyListOf(Gen.choose(0, 400))
    .map(_.distinct.sorted)

  property("modbus.batchSingles covers every address exactly once, " +
      "contiguously, within maxBlock") =
    forAll(genAddrs, Gen.choose(1, 125)) { (addrs, maxBlock) =>
      val batches = graft.streaming.ModbusMap.batchSingles(addrs, maxBlock)
      val covered = batches.flatMap { case (s, c) => s until s + c }
      covered == addrs &&
        batches.forall { case (_, c) => c >= 1 && c <= maxBlock }
    }

  private val genPoints: Gen[List[graft.streaming.ModbusMap.Point]] =
    Gen.nonEmptyListOf(for {
      kind <- Gen.oneOf("hr", "ir", "c", "di")
      start <- Gen.choose(0, 300)
      count <- Gen.frequency(4 -> Gen.const(1), 1 -> Gen.choose(2, 4))
      i <- Gen.choose(0, 1 << 20)
    } yield graft.streaming.ModbusMap.Point(s"p$i", kind, start, count,
      None, None, None, None))

  property("modbus.plan resolves every point inside one of its ops") =
    forAll(genPoints) { pts =>
      val (ops, where) = graft.streaming.ModbusMap.plan(pts)
      pts.forall { p =>
        where.get((p.kind, p.start, p.count)).exists { case (op, off) =>
          ops.contains(op) && op.kind == p.kind && off >= 0 &&
            op.start + off == p.start && off + p.count <= op.count
        }
      }
    }

  property("modbus long decode round-trips any value at any width") =
    forAll(Gen.choose(1, 4).flatMap(n => Gen.zip(Gen.const(n),
      Gen.choose(
        if (n == 4) Long.MinValue else -(1L << (n * 16 - 1)),
        if (n == 4) Long.MaxValue else (1L << (n * 16 - 1)) - 1)))) {
      case (n, v) =>
        val words = (0 until n).map(i =>
          ((v >>> ((n - 1 - i) * 16)) & 0xFFFF).toInt)
        val p = graft.streaming.ModbusMap.Point("t", "hr", 0, n,
          Some("long"), None, None, None)
        graft.streaming.ModbusMap.decode(words, p) ==
          graft.streaming.ModbusMap.MLong(v)
    }

  property("modbus float decode round-trips any finite float") =
    forAll(Gen.choose(-1e30f, 1e30f)) { f =>
      val bits = java.lang.Float.floatToIntBits(f)
      val words = IndexedSeq((bits >>> 16) & 0xFFFF, bits & 0xFFFF)
      val p = graft.streaming.ModbusMap.Point("t", "hr", 0, 2,
        Some("float"), None, None, None)
      graft.streaming.ModbusMap.decode(words, p) ==
        graft.streaming.ModbusMap.MDouble(f.toDouble)
    }

  property("modbus swap=both on 2 registers is pre-swapping the wire " +
      "words: decode(swapped input, both) == decode(input, none)") =
    forAll(Gen.zip(Gen.choose(0, 0xFFFF), Gen.choose(0, 0xFFFF))) {
      case (w0, w1) =>
        def bs(w: Int) = ((w & 0xFF) << 8) | (w >> 8)
        val plain = graft.streaming.ModbusMap.Point("t", "hr", 0, 2,
          Some("long"), None, None, None)
        val both = plain.copy(swap = Some("both"))
        // a device emitting byte-and-word-swapped order: feeding its
        // raw words through swap=both recovers the true value
        graft.streaming.ModbusMap.decode(
          IndexedSeq(bs(w1), bs(w0)), both) ==
          graft.streaming.ModbusMap.decode(IndexedSeq(w0, w1), plain)
    }
}
