package graft.engine

import org.apache.spark.sql.DataFrame

/** Bucketed table support — the co-located-join scale path.
  *
  * The reference co-locates data by assigning tables to operator clusters
  * (blockchain/metadata.py cluster->operator mapping) so a query fans out
  * to the nodes holding the shards. Spark's equivalent for JOIN-heavy
  * workloads is bucketing: both sides pre-hash-partitioned (and
  * optionally sorted) on the join key into the same bucket count — the
  * join then runs with NO exchange on either side (asserted in
  * BucketingSpec). At 100 TB this turns the dominant fact-fact shuffle
  * into a local merge per bucket.
  */
object Bucketing {

  /** Write `df` as a bucketed+sorted managed parquet table. */
  def writeBucketed(df: DataFrame, tableName: String, bucketCol: String,
      buckets: Int, sortCols: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, bucketCol)
    val sorted =
      if (sortCols.isEmpty) w
      else w.sortBy(sortCols.head, sortCols.tail: _*)
    sorted.saveAsTable(tableName)
  }
}
