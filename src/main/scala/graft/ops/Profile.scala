package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Column profiling — the "what is in this table" receipt every data
  * platform grows (the reference's `suggest create` infers a schema
  * from sample rows; this is the statistical deepening of that
  * surface). ONE aggregate pass computes, for every column at once:
  * row count, null count, distinct count, min/max (rendered as
  * strings so the receipt is one uniform frame), and for string
  * columns min/avg/max length. The receipt is #columns rows.
  *
  * Scale: all per-column metrics ride ONE `agg` (Catalyst plans a
  * single scan; the distinct counts are the only expensive members —
  * `exact = false` swaps them for HyperLogLog `approx_count_distinct`
  * (2% default error), which is the 100 TB mode: sketches fold
  * map-side, nothing shuffles by value). min/max on strings use the
  * column's natural ordering in BOTH engines (ASCII corpus — the
  * collation caveat is documented where it bites). */
object Profile {
  def profile(df: DataFrame, exact: Boolean = true): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val fields = df.schema.fields
    require(fields.nonEmpty, "empty schema")
    val aggCols: Seq[Column] = count(lit(1)).as("__n") +: fields.toSeq.flatMap {
      f =>
        val c = f.name
        val base = Seq(
          sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__null_$c"),
          min(col(c)).cast(StringType).as(s"__min_$c"),
          max(col(c)).cast(StringType).as(s"__max_$c")) ++
          (if (exact) Seq.empty
           else Seq(approx_count_distinct(col(c)).as(s"__nd_$c")))
        val strExtra = f.dataType match {
          case StringType => Seq(
            min(length(col(c))).as(s"__lmin_$c"),
            max(length(col(c))).as(s"__lmax_$c"),
            sum(length(col(c)).cast("long")).as(s"__lsum_$c"))
          case _ => Seq.empty
        }
        base ++ strExtra
    }
    // Exact mode runs the per-column distinct counts as OVERLAPPED
    // concurrent jobs (guide §2.6) instead of folding them into the one
    // agg: N exact countDistincts in one agg plan as an Expand x(N+1) —
    // every row replicated N+1 times through the partial aggregate on
    // ONE lineage, serially. Split out, each count is a column-pruned
    // scan (columnar input: the N scans together read about one full-
    // width pass) + one distinct aggregate, and they back-fill each
    // other's stragglers from a small thread pool. Same exact answers.
    // Approx mode (the 100 TB default) keeps all HLL sketches on the
    // single agg pass — map-side, one scan, nothing distinct-shuffled.
    val ndFuture: Map[String, java.util.concurrent.Future[Long]] =
      if (!exact) Map.empty
      else {
        val pool = java.util.concurrent.Executors.newFixedThreadPool(
          math.min(fields.length, 8))
        try fields.toSeq.map { f =>
          f.name -> pool.submit(new java.util.concurrent.Callable[Long] {
            def call(): Long =
              df.agg(countDistinct(col(f.name))).head().getLong(0)
          })
        }.toMap
        finally pool.shutdown() // tasks already queued; pool drains
      }
    val r = df.agg(aggCols.head, aggCols.tail: _*).head()
    val n = r.getAs[Long]("__n")
    val rows = fields.map { f =>
      val c = f.name
      val nulls = r.getAs[Long](s"__null_$c")
      val (lmin, lmax, lavg) = f.dataType match {
        case StringType =>
          val nn = n - nulls
          (Option(r.getAs[Integer](s"__lmin_$c")).map(_.toLong),
            Option(r.getAs[Integer](s"__lmax_$c")).map(_.toLong),
            if (nn > 0) Some(r.getAs[Long](s"__lsum_$c") / nn) else None)
        case _ => (None, None, None)
      }
      (c, f.dataType.simpleString, n, nulls,
        ndFuture.get(c).map(_.get()).getOrElse(r.getAs[Long](s"__nd_$c")),
        Option(r.getAs[String](s"__min_$c")),
        Option(r.getAs[String](s"__max_$c")),
        lmin, lmax, lavg)
    }
    rows.toSeq.toDF("col_name", "col_type", "n_rows", "n_nulls",
      "n_distinct", "min_s", "max_s", "len_min", "len_max", "len_avg")
  }
}
