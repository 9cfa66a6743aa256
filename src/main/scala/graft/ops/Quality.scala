package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality constraints with a verification receipt —
  * the "unit tests for data" layer (public lineage: Deequ, Schelter et
  * al. VLDB 2018; re-expressed Spark-first here). A constraint suite
  * compiles to ONE aggregate pass over the table (every row-local
  * check is a conditional count inside the same `agg`), so checking a
  * 100 TB table costs one scan regardless of how many constraints the
  * suite holds. Checks that are NOT row-local pay exactly their
  * documented extra cost: `unique` adds one distinct aggregate on its
  * column; `ref` adds one broadcast-able anti-join against the
  * referenced dimension.
  *
  * Receipt schema: (check_name, metric_num, metric_den, pass) — integers
  * and a boolean, oracle-replayable bit-for-bit. `pass` is
  * metric_num == metric_den for full-compliance checks, or
  * metric_num >= ceil(min_pct * metric_den / 100) when a tolerance is
  * given (integer cross-multiplication — no float thresholds, per the
  * repo's determinism discipline).
  *
  * Reference tie-in: the reference's data-monitor surface watches
  * stream health (`edge_lake/cmd/member_cmd.py` data monitor); this is
  * the batch contract layer the same operator family needs at rest.
  */
object Quality {
  sealed trait Check { def name: String }
  /** Fraction of non-null values in `col`. */
  final case class Complete(name: String, col: String,
      minPct: Int = 100) extends Check
  /** Fraction of rows with `lo <= col <= hi` (nulls fail). */
  final case class InRange(name: String, col: String, lo: Double,
      hi: Double, minPct: Int = 100) extends Check
  /** Fraction of rows whose `col` is in `values` (nulls fail). */
  final case class InSet(name: String, col: String,
      values: Seq[String], minPct: Int = 100) extends Check
  /** Fraction of rows satisfying an arbitrary boolean SQL predicate. */
  final case class Satisfies(name: String, predicate: String,
      minPct: Int = 100) extends Check
  /** `col` has no duplicate NON-NULL values. Pinned null semantic
    * (the SQL UNIQUE-constraint rule — NULLs never collide): metric =
    * count(distinct non-null values) + count(null rows), vs total
    * rows, so every null row counts as its own group and only
    * duplicated non-null values fail the check. Both engines compute
    * the identical expression (`count(DISTINCT col)` excludes NULLs
    * in Spark AND DuckDB; the null term is explicit). Extra cost: one
    * distinct aggregate on the column. */
  final case class Unique(name: String, col: String) extends Check
  /** Every non-null `col` value exists in `refDf`'s `refCol` (broadcast
    * the dimension side when small). Extra cost: one anti-join. */
  final case class Ref(name: String, col: String, refDf: DataFrame,
      refCol: String, minPct: Int = 100) extends Check

  private def rowLocalNum(c: Check): Option[(String, Column)] = c match {
    case Complete(n, col0, _) =>
      Some(n -> sum(when(expr(col0).isNotNull, 1L).otherwise(0L)))
    case InRange(n, col0, lo, hi, _) =>
      Some(n -> sum(when(expr(col0).isNotNull &&
        expr(col0) >= lit(lo) && expr(col0) <= lit(hi), 1L).otherwise(0L)))
    case InSet(n, col0, vs, _) =>
      Some(n -> sum(when(expr(col0).isInCollection(vs), 1L).otherwise(0L)))
    case Satisfies(n, p, _) =>
      Some(n -> sum(when(expr(p), 1L).otherwise(0L)))
    case _ => None
  }

  private def minPctOf(c: Check): Int = c match {
    case Complete(_, _, p) => p
    case InRange(_, _, _, _, p) => p
    case InSet(_, _, _, p) => p
    case Satisfies(_, _, p) => p
    case Ref(_, _, _, _, p) => p
    case _: Unique => 100
  }

  /** Run a constraint suite. One aggregate pass covers every row-local
    * check; each `unique`/`ref` pays its own documented pass. Returns
    * the receipt ordered by check name. */
  def verify(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "empty constraint suite")
    require(checks.map(_.name).distinct.size == checks.size,
      "duplicate check names")
    val spark = df.sparkSession
    import spark.implicits._
    val rowLocal = checks.flatMap(rowLocalNum)
    val aggCols = count(lit(1)).as("__den") +:
      rowLocal.map { case (n, c) => c.as(s"__n_$n") }
    val base = df.agg(aggCols.head, aggCols.tail: _*).head()
    val den = base.getAs[Long]("__den")
    val perCheck: Seq[(String, Long, Long)] = checks.map {
      case u: Unique =>
        // count(DISTINCT x) excludes NULLs in both engines; each null
        // row is its own group (SQL UNIQUE semantics — see the case
        // class doc), so the metric is distinct-non-null + null rows
        val r = df.agg(
          countDistinct(expr(u.col)).as("__d"),
          count(when(expr(u.col).isNull, lit(1))).as("__nulls")).head()
        (u.name, r.getAs[Long]("__d") + r.getAs[Long]("__nulls"), den)
      case r: Ref =>
        val nn = df.filter(expr(r.col).isNotNull)
        val nnCount = nn.count()
        val orphans = nn.select(expr(r.col).as("__fk"))
          .join(r.refDf.select(col(r.refCol).as("__fk")).distinct(),
            Seq("__fk"), "left_anti").count()
        (r.name, nnCount - orphans, nnCount)
      case c =>
        (c.name, base.getAs[Long](s"__n_${c.name}"), den)
    }
    val pctByName = checks.map(c => c.name -> minPctOf(c)).toMap
    perCheck.map { case (n, num, d) =>
      // integer cross-multiplication: pass iff num*100 >= minPct*den
      (n, num, d, num * 100L >= pctByName(n).toLong * d)
    }.toDF("check_name", "metric_num", "metric_den", "pass")
      .orderBy(col("check_name"))
  }

  /** JSON spec → suite (the command-surface entry):
    * {"checks": [
    *   {"kind": "complete", "name": "...", "col": "...", "min_pct": 99},
    *   {"kind": "in_range", "name": "...", "col": "...", "lo": 0,
    *    "hi": 1},
    *   {"kind": "in_set", "name": "...", "col": "...",
    *    "values": ["A", "N"]},
    *   {"kind": "satisfies", "name": "...", "predicate": "a < b"},
    *   {"kind": "unique", "name": "...", "col": "..."},
    *   {"kind": "ref", "name": "...", "col": "...", "ref_table": "...",
    *    "ref_col": "..."}]}
    * `resolve` maps ref_table names to frames (the Engine passes its
    * catalog). */
  def fromJson(json: String,
      resolve: String => DataFrame): Seq[Check] = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    implicit val fmts: Formats = DefaultFormats
    val cs = (JsonMethods.parse(json) \ "checks").extract[List[JValue]]
    require(cs.nonEmpty, "spec has no checks")
    cs.map { j =>
      def s(k: String): String = (j \ k).extract[String]
      def pct: Int = (j \ "min_pct").extractOpt[Int].getOrElse(100)
      s("kind") match {
        case "complete" => Complete(s("name"), s("col"), pct)
        case "in_range" => InRange(s("name"), s("col"),
          (j \ "lo").extract[Double], (j \ "hi").extract[Double], pct)
        case "in_set" => InSet(s("name"), s("col"),
          (j \ "values").extract[List[String]], pct)
        case "satisfies" => Satisfies(s("name"), s("predicate"), pct)
        case "unique" => Unique(s("name"), s("col"))
        case "ref" => Ref(s("name"), s("col"), resolve(s("ref_table")),
          s("ref_col"), pct)
        case other =>
          throw new IllegalArgumentException(s"unknown check kind $other")
      }
    }
  }
}
