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

  // =====================================================================
  // q139 — triangle census on the tri-partite trade graph (customer ×3,
  // supplier ×3+1, part ×3+2; edges cust–supp, supp–part, part–cust):
  // a closed triad (c, s, p) means c bought from s, s supplies p, and c
  // bought p — possibly through DIFFERENT orders, the co-occurrence
  // closure a relationship audit asks for. Exact enumeration by
  // degree-ordered orientation; output = the 20 nodes participating in
  // the most triangles.
  // =====================================================================

  private val q139: QFn = (sp, d) => {
    val base = t(sp, d, "orders").join(t(sp, d, "lineitem"),
        col("o_orderkey") === col("l_orderkey"))
      .select((col("o_custkey") * 3).as("c"),
        (col("l_suppkey") * 3 + 1).as("sn"),
        (col("l_partkey") * 3 + 2).as("p"))
    val e = base.select(col("c").as("x"), col("sn").as("y"))
      .unionByName(base.select(col("sn").as("x"), col("p").as("y")))
      .unionByName(base.select(col("p").as("x"), col("c").as("y")))
      .select(least(col("x"), col("y")).as("a"),
        greatest(col("x"), col("y")).as("b"))
      .distinct()
    Graph.triangles(e)
      .select(explode(array(col("x"), col("y"), col("z"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("tri_cnt"))
      .orderBy(col("tri_cnt").desc, col("node")).limit(20)
  }

  private val q139Sql = """
    WITH base AS (SELECT o_custkey * 3 AS c, l_suppkey * 3 + 1 AS s,
        l_partkey * 3 + 2 AS p
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
    e AS (SELECT DISTINCT least(x, y) AS a, greatest(x, y) AS b FROM (
      SELECT c AS x, s AS y FROM base
      UNION ALL SELECT s AS x, p AS y FROM base
      UNION ALL SELECT p AS x, c AS y FROM base)),
    deg AS (SELECT n, count(*) AS d FROM (SELECT a AS n FROM e
      UNION ALL SELECT b AS n FROM e) GROUP BY 1),
    o AS (SELECT CASE WHEN (d1.d, e.a) < (d2.d, e.b) THEN e.a ELSE e.b
          END AS u,
        CASE WHEN (d1.d, e.a) < (d2.d, e.b) THEN e.b ELSE e.a END AS v,
        CASE WHEN (d1.d, e.a) < (d2.d, e.b) THEN d2.d ELSE d1.d END AS dv
      FROM e JOIN deg d1 ON d1.n = e.a JOIN deg d2 ON d2.n = e.b),
    w AS (SELECT e1.u AS w0, e1.v AS w1, e2.v AS w2 FROM o e1 JOIN o e2
      ON e1.u = e2.u AND (e1.dv, e1.v) < (e2.dv, e2.v)),
    tri AS (SELECT w0, w1, w2 FROM w JOIN o ON o.u = w.w1 AND o.v = w.w2),
    nn AS (SELECT unnest([w0, w1, w2]) AS node FROM tri)
    SELECT node, count(*) AS tri_cnt FROM nn GROUP BY 1
    ORDER BY tri_cnt DESC, node LIMIT 20"""

  val queries: Map[String, QFn] = Map(
    "q136_pagerank" -> q136,
    "q139_triangle_census" -> q139)
  val oracles: Map[String, String] = Map(
    "q136_pagerank" -> q136Sql,
    "q139_triangle_census" -> q139Sql)
}
