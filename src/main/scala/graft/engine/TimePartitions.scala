package graft.engine

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Time partitioning — the reference's `partition <dbms> <table> using
  * <col> by <n> <unit>` (/root/reference/edge_lake/cmd/member_cmd.py:5011
  * `_partition_data`; physical table naming dbms/partitions.py:17-23;
  * "week" rejected in favor of "7 days", member_cmd.py:5044-5046).
  *
  * Spark-first: a partition is a directory keyed by a derived bucket
  * column, written with `partitionBy`. Query-side partition-name matching
  * (partitions.py:406-466) is replaced by Catalyst partition pruning —
  * a WHERE on the event-time column prunes directories automatically
  * when the filter references the derived key, and `drop partition`
  * becomes deleting bucket directories past the retention horizon.
  */
object TimePartitions {

  /** Derived partition-bucket expression: truncate the event-time column
    * to the n-unit boundary, rendered as a sortable string. */
  def bucketExpr(tsCol: String, unit: String, n: Int) = {
    val ts = col(tsCol)
    unit match {
      case "year" => date_format(date_trunc("year", ts), "yyyy")
      case "month" => date_format(date_trunc("month", ts), "yyyy-MM")
      case "day" if n == 1 => date_format(date_trunc("day", ts), "yyyy-MM-dd")
      case "day" => // n-day buckets from epoch (the reference's "7 days")
        date_format(to_date(from_unixtime(
          floor(unix_timestamp(ts) / (n * 86400L)) * (n * 86400L))),
          "yyyy-MM-dd")
      case "hour" =>
        date_format(date_trunc("hour", ts), "yyyy-MM-dd-HH")
      case other =>
        throw new IllegalArgumentException(
          s"partition unit $other (use year/month/day/hour; week -> 7 days)")
    }
  }

  /** Write a table partitioned by the derived time bucket, rows sorted
    * by event time WITHIN each file — the Spark analog of the reference
    * auto-indexing every timestamp column on ingest
    * (suggest_create_table.py:275-276): sorted row groups give parquet
    * min/max statistics that skip whole row groups on ts-range scans. */
  def write(df: DataFrame, tsCol: String, unit: String, n: Int,
      path: String, mode: SaveMode = SaveMode.Overwrite): Unit =
    df.withColumn("__par", bucketExpr(tsCol, unit, n))
      .sortWithinPartitions(col("__par"), col(tsCol))
      .write.mode(mode).partitionBy("__par").parquet(path)

  /** Bucket string for an instant — the Scala mirror of `bucketExpr`,
    * used to derive partition predicates from a query's time range. */
  def bucketString(t: java.time.LocalDateTime, unit: String, n: Int): String =
    unit match {
      case "year" => f"${t.getYear}%04d"
      case "month" => f"${t.getYear}%04d-${t.getMonthValue}%02d"
      case "day" if n == 1 => t.toLocalDate.toString
      case "day" =>
        val epochSec = t.toEpochSecond(java.time.ZoneOffset.UTC)
        val bucket = math.floorDiv(epochSec, n * 86400L) * (n * 86400L)
        java.time.LocalDateTime.ofEpochSecond(bucket, 0,
          java.time.ZoneOffset.UTC).toLocalDate.toString
      case "hour" =>
        f"${t.toLocalDate}%s-${t.getHour}%02d"
      case other =>
        throw new IllegalArgumentException(s"partition unit $other")
    }

  /** Partition predicate covering [lo, hi] — bucket strings sort
    * lexicographically in time order, so a string range suffices. This is
    * the reference's time-range -> partition-name matching
    * (partitions.py:474-541 is_par_with_data/compare_one_date_to_par)
    * expressed as a Catalyst partition filter. */
  def pruneFilter(unit: String, n: Int, lo: java.time.LocalDateTime,
      hi: java.time.LocalDateTime): org.apache.spark.sql.Column =
    col("__par") >= lit(bucketString(lo, unit, n)) &&
      col("__par") <= lit(bucketString(hi, unit, n))

  /** List partition bucket values present at a path. */
  def partitions(spark: org.apache.spark.sql.SparkSession, path: String)
      : Seq[String] =
    // a registered-but-not-yet-written table path (or a plain file)
    // must render an empty bucket list, not NPE (listFiles -> null)
    Option(new java.io.File(path).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("__par="))
      .map(_.getName.stripPrefix("__par="))
      .toSeq.sorted

  /** `drop partition` by age: delete bucket directories strictly older
    * than `keepFrom` (the reference drops the oldest partition(s) —
    * member_cmd.py:21115). */
  def dropOlderThan(spark: org.apache.spark.sql.SparkSession, path: String,
      keepFrom: String): Seq[String] = {
    val dropped = partitions(spark, path).filter(_ < keepFrom)
    dropped.foreach { p =>
      val dir = new java.io.File(s"$path/__par=$p")
      dir.listFiles().foreach(_.delete())
      dir.delete()
    }
    dropped
  }
}
