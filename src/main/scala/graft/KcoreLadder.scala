package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** SCALING evidence probe: the q144 k-core rounds-vs-k ladder. For a
  * ladder of k values over the q144 trade graph (customer—supplier
  * bipartite, undirected), reports peel rounds to fixpoint, wall-clock,
  * and core size. The claim under test: cost = rounds x (one map-side
  * degree aggregate + two semi-joins), and rounds stays SMALL and
  * k-dependent (not data-sized), because each round removes every
  * node below k simultaneously (Seidman 1983 peeling, batch form).
  * Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 ./run.sh graft.KcoreLadder
  */
object KcoreLadder {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.01")
    val spark = Sessions.local("graft-kcore-ladder")
    spark.sparkContext.setLogLevel("ERROR")
    val e0 = graft.engine.Tables.load(spark, sfDir, "orders")
      .join(graft.engine.Tables.load(spark, sfDir, "lineitem"),
        col("o_orderkey") === col("l_orderkey"))
      .select((col("o_custkey") * 2).as("src"),
        (col("l_suppkey") * 2 + 1).as("dst"))
      .distinct()
    val edges = e0.unionByName(
      e0.select(col("dst").as("src"), col("src").as("dst")))
      .localCheckpoint(true)
    println(s"edges: ${edges.count() / 2} undirected, sf dir $sfDir")
    for (k <- Seq(5, 10, 20, 30, 50, 80)) {
      val t0 = System.nanoTime()
      val (core, rounds) =
        graft.ops.Graph.kcoreWithRounds(edges, k, maxRounds = 20)
      val n = core.count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"k=$k%-3d rounds=$rounds%-2d core_nodes=$n%-6d $sec%.2f s")
    }
    spark.stop()
  }
}
