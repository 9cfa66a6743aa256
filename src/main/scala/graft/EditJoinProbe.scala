package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** SCALING evidence probe: stage decomposition of the deletion-
  * neighborhood edit join ([[graft.ops.StringSim.deletionJoin]]) on
  * the dense-ID name corpus (`tools/make_name_probe.py`). Reports
  * per-stage row counts and wall-clock — variants built, raw
  * candidates from the variant equi-join, verified pairs, distinct
  * output — plus the LARGEST variant-bucket occupancy. The claims
  * under test (SCALING.md q172 read): candidate volume tracks
  * TRUE-pair volume (not corpus size), and bucket size tracks local
  * ed-2 clique size — the properties that let this geometry hold on
  * corpora where gram-frequency prefix filtering saturates.
  * Usage: SPARK_GRAFT_SF_DIR=/tmp/probe_cust10x ./run.sh graft.EditJoinProbe
  */
object EditJoinProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val spark = Sessions.local("graft-editjoin-probe")
    spark.sparkContext.setLogLevel("ERROR")
    val d = 1
    val strs = spark.read.parquet(s"$sfDir/customer.parquet")
      .select(col("c_name").as("s")).distinct()
    def tm(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime; val n = f
      println(f"$label%-22s rows=$n%12d  ${(System.nanoTime - t0) / 1e9}%.2f s")
    }
    val vexpr = "array_distinct(flatten(transform(array(s), v -> " +
      "CASE WHEN char_length(v) = 0 THEN array(v) ELSE " +
      "array_union(array(v), transform(sequence(1, char_length(v)), " +
      "i -> concat(substring(v, 1, i - 1), substring(v, i + 1, char_length(v))))) END)))"
    val vars = strs.select(col("s"), explode(expr(vexpr)).as("u"))
      .localCheckpoint()
    tm("variants")(vars.count())
    val cand = vars.join(vars.toDF("s2", "u"), Seq("u"))
      .filter(col("s") < col("s2"))
      .select(col("s").as("s_a"), col("s2").as("s_b"))
    tm("candidates raw")(cand.count())
    val ver = cand.withColumn("lev", expr(s"levenshtein(s_a,s_b,$d)"))
      .filter(col("lev") >= 0)
    tm("verified")(ver.count())
    tm("distinct pairs")(ver.select("s_a", "s_b", "lev").distinct().count())
    vars.groupBy("u").count().orderBy(desc("count")).show(5, false)
    spark.stop()
  }
}
