package graft.dialect

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.ops.JoinMatView

/** Serve a dialect JOIN query from a REGISTERED standing join matview
  * ([[graft.ops.JoinMatView]]) — the front door the round-10 IVM
  * machinery lacked: `SELECT keys, aggs FROM a JOIN b ON a.k = b.k
  * GROUP BY keys` answered from the #groups-row artifact, never
  * re-joining the bases. At 100 TB the served plan reads thousands of
  * rows where the live plan shuffles two fact tables.
  *
  * QUALIFICATION IS STRICTLY CONSERVATIVE, same contract as
  * [[MatViewServe]] (whose [[MatViewServe.servePlan]] does the
  * aggregate matching — the state algebra is identical once the FROM
  * shape matches):
  *  - FROM must be the recorded two-table inner equi-join: same table
  *    pair and the SAME on-pair set, in either orientation (`a join b
  *    on a.x = b.y` == `b join a on b.y = a.x`);
  *  - everything else (GROUP BY subset of recorded keys, agg-by-agg
  *    recorded-partial matching incl. the exact-decimal sum/avg
  *    discipline, HAVING over output columns, WHERE over key columns,
  *    no distinct/include/extend/committed/approx/limit-per) is
  *    [[MatViewServe.servePlan]]'s proof, unchanged.
  * Anything unprovable returns None and the Engine falls back to the
  * always-correct live join plan.
  *
  * Reference tie-in: the reference cannot parse a JOIN at all
  * (`is_suport_join()` = False, dbms/sqlite_dbms.py:113,
  * psql_dbms.py:206) — SURVEY §2.3 declares exceeding that surface
  * desirable; this module is the serving half, [[EdgeSql.JoinSpec]]
  * the grammar half.
  */
object JoinMatViewServe {

  private def bare(n: String): String =
    if (n.contains('.')) n.substring(n.lastIndexOf('.') + 1) else n

  /** True when the query's FROM is exactly the recorded join, in
    * either orientation. */
  private[dialect] def fromMatches(sel: EdgeSql.Select,
      spec: JoinMatView.Spec): Boolean = sel.join.exists { j =>
    if (j.joinType != "inner") return false // the artifact is inner
    val (lt, rt) = (bare(sel.table), bare(j.table))
    val onSet = j.on.toSet
    (lt == spec.left && rt == spec.right && onSet == spec.on.toSet) ||
      (lt == spec.right && rt == spec.left &&
        j.on.map(_.swap).toSet == spec.on.toSet)
  }

  def tryServe(spark: SparkSession, path: String,
      spec: JoinMatView.Spec, cmd: EdgeSql.Command): Option[DataFrame] = {
    val sel = EdgeSql.parseSelect(cmd.select)
    if (!fromMatches(sel, spec)) None
    else MatViewServe.servePlan(spark, path, spec.keys, spec.aggs,
      sel, cmd)
  }
}
