package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.Tables

/** Graph-analytics queries over [[Graph]]: link-centrality signals on
  * the order graph. Same cross-engine determinism contract as the rest
  * of the board — integer-lattice arithmetic only, so the DuckDB oracle
  * unrolls the identical iterations and hash-matches exactly.
  */
object GraphQueries {
  type QFn = (SparkSession, String) => DataFrame

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  // =====================================================================
  // q136 — PageRank centrality on the customer–supplier trade graph:
  // nodes are customers (key*2) and suppliers (key*2+1), edges the
  // distinct trading pairs from orders ⋈ lineitem, symmetrized (so no
  // node dangles). 3 damped power iterations on the 2^20 integer
  // lattice; output = the 20 most central nodes. The oracle unrolls the
  // same 3 iterations as chained CTEs.
  // =====================================================================

  private val prIters = 3

  private val q136: QFn = (s, d) => {
    val e0 = t(s, d, "orders").join(t(s, d, "lineitem"),
        col("o_orderkey") === col("l_orderkey"))
      .select((col("o_custkey") * 2).as("src"),
        (col("l_suppkey") * 2 + 1).as("dst"))
      .distinct()
    val edges = e0.unionByName(
      e0.select(col("dst").as("src"), col("src").as("dst")))
    Graph.pageRank(edges, prIters)
      .orderBy(col("rank_q").desc, col("node"))
      .limit(20)
  }

  private val q136Sql: String = {
    val iterCtes = (1 to prIters).map { i =>
      s"""r$i AS (SELECT e.dst AS node,
        157286 + sum(((r.r * 85) // 100) // d.od) AS r
      FROM e JOIN r${i - 1} r ON r.node = e.src
      JOIN deg d ON d.src = e.src
      GROUP BY 1)"""
    }.mkString(",\n    ")
    s"""
    WITH e0 AS (SELECT DISTINCT o_custkey * 2 AS src,
        l_suppkey * 2 + 1 AS dst
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
    e AS (SELECT src, dst FROM e0
      UNION ALL SELECT dst AS src, src AS dst FROM e0),
    deg AS (SELECT src, count(*) AS od FROM e GROUP BY 1),
    r0 AS (SELECT DISTINCT src AS node, 1048576 AS r FROM e),
    $iterCtes
    SELECT node, CAST(r AS BIGINT) AS rank_q FROM r$prIters
    ORDER BY r DESC, node LIMIT 20"""
  }

  val queries: Map[String, QFn] = Map(
    "q136_pagerank" -> q136)
  val oracles: Map[String, String] = Map(
    "q136_pagerank" -> q136Sql)
}
