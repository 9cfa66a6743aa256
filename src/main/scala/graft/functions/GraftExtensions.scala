package graft.functions

import org.apache.spark.sql.{Column, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Session extension registering the native signature expressions as SQL
  * functions, so `spark.sql("SELECT minhash_sig(shingle_hashes(text, 3),
  * 16) ...")` works — activate with
  * `.config("spark.sql.extensions", "graft.functions.GraftExtensions")`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  private def lit(e: Expression): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"expected integer literal, got $other")
  }
  private def slit(e: Expression): String = e match {
    case Literal(v, _) if v != null => v.toString
    case other => throw new IllegalArgumentException(
      s"expected string literal, got $other")
  }

  /** (name, info, builder) triples — used by apply() at session build and
    * registrable post-hoc on an existing session's FunctionRegistry. */
  def registrations: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = {
    def info(name: String, usage: String) =
      new ExpressionInfo("graft", null, name, s"_FUNC_ - $usage", "", "",
        "", "", "", "", "java_udf")
    Seq(
      (FunctionIdentifier("shingle_hashes"),
        info("shingle_hashes", "distinct word n-gram polynomial hashes"),
        (args: Seq[Expression]) => ShingleHashesExpr(args(0), lit(args(1)))),
      (FunctionIdentifier("minhash_sig"),
        info("minhash_sig", "k-permutation MinHash signature"),
        (args: Seq[Expression]) => MinHashSigExpr(args(0), lit(args(1)))),
      (FunctionIdentifier("simhash32"),
        info("simhash32", "32-bit SimHash of the token multiset"),
        (args: Seq[Expression]) => SimHash32Expr(args(0))),
      (FunctionIdentifier("simhash64"),
        info("simhash64", "64-bit SimHash of the token multiset"),
        (args: Seq[Expression]) => SimHash64Expr(args(0))),
      (FunctionIdentifier("winnow_fp"),
        info("winnow_fp", "winnowing fingerprint hash set"),
        (args: Seq[Expression]) =>
          WinnowFpExpr(args(0), lit(args(1)), lit(args(2)))),
      (FunctionIdentifier("dot_f"),
        info("dot_f", "left-fold float-array dot product"),
        (args: Seq[Expression]) => DotProductExpr(args(0), args(1))),
      (FunctionIdentifier("vec_lsh"),
        info("vec_lsh", "random-hyperplane LSH bucket"),
        (args: Seq[Expression]) => VecLshExpr(args(0), lit(args(1)))),
      (FunctionIdentifier("char_gram_hashes"),
        info("char_gram_hashes", "distinct char k-gram polynomial hashes"),
        (args: Seq[Expression]) => CharGramHashesExpr(args(0), lit(args(1)))),
      (FunctionIdentifier("sorted_intersect_size"),
        info("sorted_intersect_size",
          "|A ∩ B| of two ascending-sorted distinct long arrays"),
        (args: Seq[Expression]) =>
          SortedIntersectSizeExpr(args(0), args(1))),
      (FunctionIdentifier("ngram_repeat_stats"),
        info("ngram_repeat_stats",
          "per-doc word n-gram repetition stats struct"),
        (args: Seq[Expression]) =>
          NgramRepeatStatsExpr(args(0), lit(args(1)))),
      (FunctionIdentifier("feature_hash_counts"),
        info("feature_hash_counts",
          "token-count vector, dim = polyhash(token) mod dims"),
        (args: Seq[Expression]) =>
          FeatureHashCountsExpr(args(0), lit(args(1)))),
      (FunctionIdentifier("bloom_agg"),
        info("bloom_agg", "m-bit Bloom bitmap over a long hash column"),
        (args: Seq[Expression]) =>
          BloomBuildAgg(args(0), lit(args(1)), lit(args(2)))),
      (FunctionIdentifier("bloom_maybe"),
        info("bloom_maybe", "all-k-bits-set Bloom membership probe"),
        (args: Seq[Expression]) =>
          BloomMaybeExpr(args(0), args(1), lit(args(2)), lit(args(3)))),
      (FunctionIdentifier("kmv_agg"),
        info("kmv_agg", "k smallest distinct hash values (KMV sketch)"),
        (args: Seq[Expression]) => KmvAgg(args(0), lit(args(1)))),
      (FunctionIdentifier("normalize_text"),
        info("normalize_text", "Unicode normalization (NFC|NFD|NFKC|NFKD)"),
        (args: Seq[Expression]) =>
          NormalizeTextExpr(args(0), slit(args(1)))),
      (FunctionIdentifier("html_extract"),
        info("html_extract",
          "HTML → text: drop script/style/comments, strip tags, " +
            "decode core entities, collapse whitespace"),
        (args: Seq[Expression]) => HtmlExtractExpr(args(0))))
  }

  override def apply(ext: SparkSessionExtensions): Unit =
    registrations.foreach(ext.injectFunction)
}

/** Column-API wrappers over the native expressions. */
object F {
  private def c(e: Expression): Column = ColumnBridge.column(e)
  private def e(col: Column): Expression = ColumnBridge.expression(col)

  def shingleHashes(text: Column, n: Int): Column =
    c(ShingleHashesExpr(e(text), n))
  def minhashSig(hashes: Column, k: Int): Column =
    c(MinHashSigExpr(e(hashes), k))
  def simhash32(text: Column): Column = c(SimHash32Expr(e(text)))
  def simhash64(text: Column): Column = c(SimHash64Expr(e(text)))
  def winnowFp(text: Column, k: Int, w: Int): Column =
    c(WinnowFpExpr(e(text), k, w))
  def charGramHashes(text: Column, k: Int): Column =
    c(CharGramHashesExpr(e(text), k))
  def sortedIntersectSize(a: Column, b: Column): Column =
    c(SortedIntersectSizeExpr(e(a), e(b)))
  def dotF(a: Column, b: Column): Column = c(DotProductExpr(e(a), e(b)))
  def vecLsh(v: Column, bits: Int): Column = c(VecLshExpr(e(v), bits))
  /** Signature of hyperplane TABLE `t` (independent plane family per
    * table — OR-amplified LSH); table 0 == [[vecLsh]]. */
  def vecLshT(v: Column, bits: Int, t: Int): Column =
    c(VecLshExpr(e(v), bits, t))
  def ngramRepeatStats(text: Column, n: Int): Column =
    c(NgramRepeatStatsExpr(e(text), n))
  def tokenSpans(text: Column, n: Int): Column =
    c(TokenSpansExpr(e(text), n))
  def spanHashes(text: Column, n: Int): Column =
    c(SpanHashesExpr(e(text), n))
  def charPolyHash(s: Column): Column = c(CharPolyHashExpr(e(s)))
  def normalizeText(s: Column, form: String = "NFC"): Column =
    c(NormalizeTextExpr(e(s), form))
  def htmlExtract(s: Column): Column = c(HtmlExtractExpr(e(s)))
  def featureBuckets(text: Column, b: Int): Column =
    c(FeatureBucketsExpr(e(text), b))
  def featureHashCounts(text: Column, dims: Int): Column =
    c(FeatureHashCountsExpr(e(text), dims))
  def tokenTf(text: Column): Column = c(TokenTfExpr(e(text)))
  def tokenPositions(text: Column): Column = c(TokenPositionsExpr(e(text)))
  def bloomAgg(h: Column, mBits: Int, k: Int): Column =
    c(BloomBuildAgg(e(h), mBits, k).toAggregateExpression())
  def bloomMaybe(words: Column, h: Column, mBits: Int, k: Int): Column =
    c(BloomMaybeExpr(e(words), e(h), mBits, k))
  def kmvAgg(h: Column, k: Int): Column =
    c(KmvAgg(e(h), k).toAggregateExpression())
}
