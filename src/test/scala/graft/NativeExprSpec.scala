package graft

import org.apache.spark.sql.functions._

import graft.engine.Tables
import graft.functions.F
import graft.ops.{TextOps, VectorOps}

/** The native Catalyst expressions must be BIT-IDENTICAL to the
  * higher-order-function formulations (which the DuckDB oracles mirror) —
  * cross-validated here on real corpus rows. */
class NativeExprSpec extends SparkSpec {

  private lazy val docs = Tables.load(spark, sfDir, "documents").limit(50)
  private lazy val embs = Tables.load(spark, sfDir, "embeddings").limit(50)

  test("shingle_hashes == HOF shingleHashes (as sets)") {
    val both = docs.select(
      sort_array(F.shingleHashes(col("text"), 3)).as("native"),
      sort_array(TextOps.shingleHashes(col("text"), 3)).as("hof"))
    assert(both.filter(col("native") =!= col("hof")).count() === 0)
  }

  test("token_spans == HOF transform/slice/array_join (positions kept)") {
    val hof = "CASE WHEN size(filter(split(text, ' '), t -> t != '')) < 8 " +
      "THEN array() ELSE transform(sequence(0, " +
      "size(filter(split(text, ' '), t -> t != '')) - 8), " +
      "i -> array_join(slice(filter(split(text, ' '), t -> t != ''), " +
      "i + 1, 8), ' ')) END"
    val both = docs.select(
      F.tokenSpans(col("text"), 8).as("native"), expr(hof).as("hofc"))
    assert(both.filter(col("native") =!= col("hofc")).count() === 0)
    // a doc shorter than the span yields an EMPTY array, not a collapse
    import spark.implicits._
    val short = Seq("a b c").toDF("text")
      .select(F.tokenSpans(col("text"), 8).as("s")).head().getSeq[String](0)
    assert(short.isEmpty)
  }

  test("minhash_sig == HOF minHash") {
    val both = docs.select(
      F.minhashSig(F.shingleHashes(col("text"), 3), 16).as("native"),
      TextOps.minHash(TextOps.shingleHashes(col("text"), 3), 16).as("hof"))
    assert(both.filter(col("native") =!= col("hof")).count() === 0)
  }

  test("simhash32 == HOF simHash") {
    val both = docs.select(
      F.simhash32(col("text")).as("native"),
      TextOps.simHash(col("text")).as("hof"))
    assert(both.filter(col("native") =!= col("hof")).count() === 0)
  }

  test("winnow_fp == HOF winnow (as sets)") {
    val both = docs.select(
      sort_array(F.winnowFp(expr("substring(text, 1, 256)"), 8, 4)).as("native"),
      sort_array(TextOps.winnow(expr("substring(text, 1, 256)"), 8, 4)).as("hof"))
    assert(both.filter(col("native") =!= col("hof")).count() === 0)
  }

  test("dot_f == HOF dot (bit-identical doubles)") {
    val both = embs.select(
      F.dotF(col("embedding"), col("embedding")).as("native"),
      VectorOps.dot(col("embedding"), col("embedding")).as("hof"))
    assert(both.filter(col("native") =!= col("hof")).count() === 0)
  }

  test("vec_lsh == HOF lshSignature") {
    val both = embs.select(
      F.vecLsh(col("embedding"), 4).as("native"),
      VectorOps.lshSignature(col("embedding"), 4).as("hof"))
    assert(both.filter(col("native") =!= col("hof")).count() === 0)
  }

  test("vec_lsh table t == HOF with plane offset t*bits, and tables " +
      "are genuinely distinct plane families") {
    for (t <- Seq(1, 7)) {
      val both = embs.select(
        F.vecLshT(col("embedding"), 4, t).as("native"),
        VectorOps.lshSignature(col("embedding"), 4, t).as("hof"))
      assert(both.filter(col("native") =!= col("hof")).count() === 0,
        s"table $t")
    }
    // independence smoke: different tables bucket differently
    val diff = embs.select(
      F.vecLshT(col("embedding"), 4, 0).as("t0"),
      F.vecLshT(col("embedding"), 4, 1).as("t1"))
    assert(diff.filter(col("t0") =!= col("t1")).count() > 0)
  }

  test("span_hashes[i] == char_poly_hash(token_spans[i]) (the invariant " +
      "the hash-first span audit's two passes stand on)") {
    val both = docs.select(
      F.spanHashes(col("text"), 8).as("native"),
      transform(F.tokenSpans(col("text"), 8),
        s => F.charPolyHash(s)).as("via_strings"))
    assert(both.filter(col("native") =!= col("via_strings")).count() === 0)
    // and char_poly_hash matches a pure fold on a known value
    val h = spark.range(1).select(
      F.charPolyHash(lit("ab c")).as("h")).head().getLong(0)
    val ref = "ab c".foldLeft(0L)((a, c) => (a * 31 + c.toLong) % 2147483647L)
    assert(h === ref)
  }

  test("char_gram_hashes == HOF char-gram spec (as sets)") {
    val hof = "array_distinct(transform(" +
      "sequence(0, greatest(length(head) - 5, 0)), " +
      "i -> aggregate(filter(split(substring(head, i + 1, 5), ''), " +
      "c -> c != ''), cast(0 as bigint), " +
      "(a, c) -> (a*31 + cast(ascii(c) as bigint)) % 2147483647)))"
    val both = docs.withColumn("head", expr("substring(text, 1, 128)"))
      .select(sort_array(F.charGramHashes(col("head"), 5)).as("native"),
        sort_array(expr(hof)).as("hof"))
    assert(both.filter(col("native") =!= col("hof")).count() === 0)
  }

  test("sorted_intersect_size == size(array_intersect) on sorted sets") {
    val both = docs.select(
      sort_array(F.shingleHashes(col("text"), 3)).as("a"),
      sort_array(F.shingleHashes(expr("substring(text, 1, 200)"), 3)).as("b"))
      .select(F.sortedIntersectSize(col("a"), col("b")).as("native"),
        size(array_intersect(col("a"), col("b"))).as("builtin"))
    assert(both.filter(col("native") =!= col("builtin")).count() === 0)
  }

  test("polyhash folds code points — surrogate pairs match the SQL form") {
    import spark.implicits._
    // U+1F600 emoji (surrogate pair in UTF-16) + CJK: one term per code
    // point in both the native loop and the split+ascii HOF
    val rows = Seq("hello 😀 world", "中文 text 😀")
      .toDF("text")
    val both = rows.select(
      F.simhash32(col("text")).as("native"),
      TextOps.simHash(col("text")).as("hof"))
    assert(both.filter(col("native") =!= col("hof")).count() === 0)
  }

  test("native expressions over literals constant-fold at plan time") {
    // a probe signature written as a literal must be computed ONCE by
    // the optimizer, not per row — the plan carries the folded array,
    // no shingle/minhash expression survives
    val df = docs.select(col("doc_id"),
      F.minhashSig(F.shingleHashes(lit("the quick brown fox"), 3), 16)
        .as("probe_sig"))
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(!optimized.toLowerCase.contains("shinglehashes"),
      s"expected folded literal, got:\n$optimized")
    assert(!optimized.toLowerCase.contains("minhashsig"))
    assert(df.head().getAs[Seq[Long]]("probe_sig").length === 16)
  }

  test("normalize_text: NFC composes combining sequences, NFKC folds " +
      "compatibility forms, idempotent, null-safe, bad form refuses at " +
      "construction") {
    import spark.implicits._
    val in = Seq(
      (1L, "cafe\u0301"),   // decomposed e + combining acute
      (2L, "café"),             // composed é (already NFC)
      (3L, "ﬁle Ａ"),       // fi-ligature + fullwidth A
      (4L, null.asInstanceOf[String])
    ).toDF("id", "t")
    val out = in.select(col("id"),
        F.normalizeText(col("t"), "NFC").as("nfc"),
        F.normalizeText(col("t"), "NFKC").as("nfkc"))
      .orderBy("id").collect()
    assert(out(0).getString(1) === "café")      // composed
    assert(out(1).getString(1) === "café")      // identity
    assert(out(0).getString(1) === out(1).getString(1),
      "decomposed and composed twins must converge under NFC")
    assert(out(2).getString(1) === "ﬁle Ａ",
      "NFC must NOT fold compatibility forms")
    assert(out(2).getString(2) === "file A",
      "NFKC must fold the ligature and the fullwidth letter")
    assert(out(3).isNullAt(1) && out(3).isNullAt(2))
    // idempotence (the Unicode stability guarantee)
    val twice = in.filter(col("t").isNotNull).select(
      (F.normalizeText(F.normalizeText(col("t"), "NFC"), "NFC")
        === F.normalizeText(col("t"), "NFC")).as("eq"))
    assert(twice.collect().forall(_.getBoolean(0)))
    intercept[IllegalArgumentException] {
      F.normalizeText(org.apache.spark.sql.functions.lit("x"), "NFX")
    }
  }

  test("functions register into a session FunctionRegistry for SQL use") {
    val reg = spark.sessionState.functionRegistry
    new graft.functions.GraftExtensions().registrations.foreach {
      case (ident, info, builder) =>
        reg.registerFunction(ident, info, builder)
    }
    val out = spark.sql(
      "SELECT simhash32('spark catalyst tungsten') AS s, " +
        "minhash_sig(shingle_hashes('a b c d e', 3), 16) AS m, " +
        "dot_f(array(cast(1.0 as float), cast(2.0 as float)), " +
        "      array(cast(3.0 as float), cast(4.0 as float))) AS d, " +
        "char_gram_hashes('abcdefgh', 5) AS g, " +
        "sorted_intersect_size(array(1L, 3L, 7L), array(3L, 5L, 7L)) AS i")
      .head()
    assert(out.getAs[Long]("s") >= 0L)
    assert(out.getAs[Seq[Long]]("m").length === 16)
    assert(out.getAs[Double]("d") === 11.0)
    assert(out.getAs[Seq[Long]]("g").length === 4)
    assert(out.getAs[Int]("i") === 2)
  }

  test("feature_hash_counts == the HOF transform/filter formulation") {
    val hof = docs.select(col("doc_id"), expr(
      "transform(sequence(0, 15), i -> size(filter(" +
        "transform(filter(split(text, ' '), t -> t != ''), " +
        "t -> aggregate(filter(split(t, ''), c -> c != ''), " +
        "cast(0 as bigint), (a, c) -> (a*31 + cast(ascii(c) as bigint)) " +
        "% 2147483647)), h -> h % 16 = i)))").as("vec"))
    val nat = docs.select(col("doc_id"),
      F.featureHashCounts(col("text"), 16).as("v"))
      .select(col("doc_id"), expr("transform(v, x -> cast(x as int))").as("vec"))
    assert(nat.exceptAll(hof).count() === 0)
    assert(hof.exceptAll(nat).count() === 0)
  }

  test("token_tf == the explode+groupBy tf formulation") {
    val naive = docs
      .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("t"))
      .groupBy(col("doc_id"), col("t")).agg(count(lit(1)).as("tf"))
    val native = docs
      .select(col("doc_id"), explode(F.tokenTf(col("text"))).as("e"))
      .select(col("doc_id"), col("e.t").as("t"), col("e.tf").as("tf"))
    assert(native.exceptAll(naive).count() === 0)
    assert(naive.exceptAll(native).count() === 0)
  }

  test("ngram_repeat_stats == the explode+groupBy formulation") {
    // naive two-shuffle formulation (the oracle's shape) over tokens
    val naive = docs
      .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("t"))
      .groupBy(col("doc_id"), col("t")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_grams"), count(lit(1)).as("n_distinct"),
        max(col("c")).as("top_n"))
    val native = docs.select(col("doc_id"),
      F.ngramRepeatStats(col("text"), 1).as("s"))
      .select(col("doc_id"), col("s.n_grams"), col("s.n_distinct"),
        col("s.top_n"))
    assert(native.exceptAll(naive).count() === 0)
    assert(naive.exceptAll(native).count() === 0)
    // bigram path: most-repeated bigram count matches too
    val naive2 = docs
      .select(col("doc_id"),
        explode(TextOps.wordShingles(col("text"), 2)).as("g"))
      .groupBy(col("doc_id"), col("g")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id")).agg(max(col("c")).as("top_n"))
    val native2 = docs.select(col("doc_id"),
      F.ngramRepeatStats(col("text"), 2).getField("top_n").as("top_n"))
    assert(native2.exceptAll(naive2).count() === 0)
    // short doc (< n tokens) collapses to ONE whole-doc gram
    import spark.implicits._
    val short = Seq("one").toDF("text").select(
      F.ngramRepeatStats(col("text"), 2).as("s")).head()
    assert(short.getStruct(0).getLong(0) === 1L)
  }

  test("feature_buckets == HOF featureBuckets (ordered, incl. surrogates)") {
    val both = docs.select(
      F.featureBuckets(col("text"), 512).as("native"),
      graft.ops.Curation.featureBucketsHof(col("text"), 512).as("hofc"))
    assert(both.filter(col("native") =!= col("hofc")).count() === 0)
    // surrogate pairs + empties: one codepoint per emoji, single token
    import spark.implicits._
    val tricky = Seq("\ud83d\ude00 x", " lone", "").toDF("text").select(
      F.featureBuckets(col("text"), 512).as("native"),
      graft.ops.Curation.featureBucketsHof(col("text"), 512).as("hofc"))
    assert(tricky.filter(col("native") =!= col("hofc")).count() === 0)
  }
}

/** HtmlExtractExpr — the q202 native state machine's edge cases,
  * including the ones the synthesized corpus never exercises (the
  * oracle proves the happy path; these pin the fallbacks). */
class HtmlExtractSpec extends SparkSpec {
  import spark.implicits._

  private def extract(html: String): String = {
    val r = Seq(Tuple1(html)).toDF("h")
      .select(F.htmlExtract(col("h"))).collect()(0)
    if (r.isNullAt(0)) null else r.getString(0)
  }

  test("tags strip to word separators; whitespace collapses; trimmed") {
    assert(extract("<p>a</p><p>b</p>") === "a b")
    assert(extract("  <div> a \t b </div>  ") === "a b")
    assert(extract("a<br/>b") === "a b")
  }

  test("script/style/comment blocks drop WITH content") {
    assert(extract("x<script>var a = '<p>hi</p>';</script>y") === "x y")
    assert(extract("x<style>p { color: red; }</style>y") === "x y")
    assert(extract("x<!-- note <b>bold</b> -->y") === "x y")
    assert(extract("<script src=\"a.js\"></script>done") === "done")
  }

  test("core entities decode; double-escaping survives one pass") {
    assert(extract("a &amp; b &lt;c&gt; &quot;d&#39; e&nbsp;f") ===
      "a & b <c> \"d' e f")
    // &amp;lt; is an ESCAPED &lt; — must decode to literal "&lt;", not "<"
    assert(extract("&amp;lt;tag&amp;gt;") === "&lt;tag&gt;")
    assert(extract("&unknown; stays") === "&unknown; stays")
  }

  test("fallbacks: unclosed script keeps content; stray '<' is literal") {
    assert(extract("a <script>var x = 1 rest") === "a var x = 1 rest")
    // '<'...'>' spans are tags to this stripper AND to the oracle's
    // <[^>]*> regex — identical greedy mis-parse on math text, by design
    assert(extract("1 < 2 and 3 > 2") === "1 2")
    // no '>' anywhere: the '<' stays literal in both implementations
    assert(extract("1 < 2 and 3 greater") === "1 < 2 and 3 greater")
    assert(extract("<style>unclosed body text") === "unclosed body text")
  }

  test("null-safe; empty and tag-only inputs yield empty") {
    assert(extract(null) === null)
    assert(extract("") === "")
    assert(extract("<html><body></body></html>") === "")
  }

  test("sql registration html_extract() works") {
    val reg = spark.sessionState.functionRegistry
    new graft.functions.GraftExtensions().registrations.foreach {
      case (ident, info, builder) =>
        reg.registerFunction(ident, info, builder)
    }
    val out = spark.sql(
      "SELECT html_extract('<b>a</b> &amp; <i>b</i>') AS t").collect()
    assert(out(0).getString(0) === "a & b")
  }
}
