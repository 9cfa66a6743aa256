package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: times every SparkEntry query on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line {"metric":...,"value":...,"queries":{...}}.
  *
  * Results are materialized through the noop sink so the full plan
  * (including projection payloads) executes — `.count()` would let
  * Catalyst prune away most of the work.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // session conf (incl. the AQE shuffled-hash rewrite bound) comes from
    // the ONE shared construction site — see Sessions.defaults
    val spark = Sessions.local("graft-bench")

    // JVM + codegen warm-up (untimed): one representative of each major
    // plan family (scan+limit, aggregate, window, broadcast join), so
    // the first TIMED queries don't absorb first-use JIT/codegen cost
    Seq("q01_scan_limit", "q03_global_aggs", "q22_window_funcs",
        "q20_join_3way")
      .flatMap(SparkEntry.queries.get)
      .foreach(fn => fn(spark, sfDir).collect())

    // Optional comma-separated substring filter for local iteration
    // (e.g. SPARK_GRAFT_ONLY=q62,q39); the driver never sets it.
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(',').toSeq)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1).filter { case (n, _) =>
      only.forall(_.exists(n.contains))
    }

    // three timed iterations per query, report the min — steady-state
    // timing robust to transient machine load (the box is shared; the
    // round-10 driver bench produced 16 phantom >1.5x regressions at
    // min-of-2 that judges had to re-adjudicate solo)
    def timeOne(name: String,
        fn: (SparkSession, String) => org.apache.spark.sql.DataFrame)
        : Double = {
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9 }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}"); -1.0 }
      }
      if (times.exists(_ < 0)) -1.0 else times.min
    }
    val firstPass = selected.map { case (name, fn) => name -> timeOne(name, fn) }

    // AUTO-RE-TIME (round-12 verdict item 4): any query >=1.5x slower
    // than the previous committed artifact gets re-timed min-of-3 AFTER
    // the full pass (JVM fully warm, suite churn settled) and the
    // committed value is the min of both passes — so transient box-load
    // phantoms adjudicate themselves in-run instead of costing the
    // judge a solo re-timing pass. BENCH_delta.md records
    // reverted/confirmed per re-timed row.
    val prevFile = {
      val rx = "BENCH_full_r(\\d+)\\.json".r
      val outFile = sys.env.getOrElse("SPARK_GRAFT_BENCH_FILE",
        "BENCH_full_latest.json")
      sys.env.get("SPARK_GRAFT_BENCH_PREV").getOrElse(
        Option(new java.io.File(".").listFiles()).getOrElse(Array.empty)
          .toSeq.map(_.getName)
          .collect { case n @ rx(k) if n != outFile => (k.toInt, n) }
          .sortBy(-_._1).headOption.map(_._2)
          .getOrElse("BENCH_full_r10.json"))
    }
    val prev = if (only.isEmpty) readPrev(prevFile) else Map.empty[String, Double]
    val byName = selected.toMap
    val retimed = scala.collection.mutable.Map.empty[String, Double]
    val results = firstPass.map { case (name, t) =>
      val suspect = t >= 0 && prev.get(name).exists(p => p > 0 && t / p >= 1.5)
      if (!suspect) name -> t
      else {
        val again = timeOne(name, byName(name))
        val best = if (again >= 0) math.min(t, again) else t
        retimed += name -> t // first-pass value, for the delta report
        System.err.println(
          f"[bench] re-timed $name: first $t%.3f s -> committed $best%.3f s")
        name -> best
      }
    }
    val qs = results
      .map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val line =
      f"""{"metric":"total_query_time","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    println(line)
    val outFile = sys.env.getOrElse("SPARK_GRAFT_BENCH_FILE",
      "BENCH_full_latest.json")
    // The full line above is ~6 KB at 210 queries and the driver's
    // stdout-tail capture (~2.2 KB) cuts off its START, so the driver's
    // parser saw no bench numbers in r14/r15 (PERF prev/now_bench_ok
    // false). ALSO print a compact LAST line that always fits in the
    // tail window (r15 verdict item 2). Timing methodology and the full
    // per-query line are unchanged; this is an additional summary.
    val nOk = results.count(_._2 >= 0)
    println(
      f"""{"metric":"total_query_time","value":$total%.3f,"unit":"sec","n":$nOk,"queries_file":"$outFile","sf":"$sfDir"}""")
    // the driver's log tail truncates long per-query maps — ALSO write
    // the full line to a file so every round's complete bench is a
    // committed artifact (round-9 verdict item 7). Unfiltered runs
    // only: a SPARK_GRAFT_ONLY local iteration must not clobber it.
    if (only.isEmpty) {
      try java.nio.file.Files.writeString(
        java.nio.file.Paths.get(outFile), line + "\n")
      catch { case scala.util.control.NonFatal(e) =>
        System.err.println(s"[bench] could not write $outFile: $e") }
      // in-run delta report vs the previous round's COMMITTED full
      // bench: the round-close receipt itself shows per-query ratios,
      // so phantom load-noise regressions stop costing a judge a solo
      // re-adjudication pass every round. Default baseline: the
      // highest-numbered committed BENCH_full_r<N>.json that isn't
      // this run's own output — self-advancing across rounds.
      try writeDelta(results.toMap, prevFile, retimed.toMap)
      catch { case scala.util.control.NonFatal(e) =>
        System.err.println(s"[bench] could not write BENCH_delta.md: $e") }
    }
    spark.stop()
  }

  /** The per-query map of a previous committed bench artifact; empty
    * when the file is absent or unparsable. */
  private def readPrev(prevFile: String): Map[String, Double] = {
    val p = java.nio.file.Paths.get(prevFile)
    if (!java.nio.file.Files.exists(p)) return Map.empty
    try {
      import org.json4s._
      import org.json4s.jackson.JsonMethods
      (JsonMethods.parse(java.nio.file.Files.readString(p))
        \ "queries") match {
        case JObject(fields) => fields.collect {
          case (k, JDouble(v)) => k -> v
          case (k, JInt(v)) => k -> v.toDouble
        }.toMap
        case _ => Map.empty
      }
    } catch { case scala.util.control.NonFatal(e) =>
      System.err.println(s"[bench] could not parse $prevFile: $e")
      Map.empty
    }
  }

  /** BENCH_delta.md: per-query ratio vs a previous committed full-bench
    * artifact — totals, the >=1.5x slower and <=0.67x faster tails, and
    * adds/removes. Comparing min-of-3 against a committed min keeps the
    * report about the PLAN, not the box's load at round close.
    * `retimed` maps query -> FIRST-pass seconds for rows the auto-
    * re-time loop re-measured; each surviving slow row is annotated
    * confirmed (still >=1.5x after re-time) and each reverted row is
    * listed so the adjudication is in the artifact, not judge labor. */
  private def writeDelta(now: Map[String, Double], prevFile: String,
      retimed: Map[String, Double]): Unit = {
    val p = java.nio.file.Paths.get(prevFile)
    if (!java.nio.file.Files.exists(p)) {
      System.err.println(s"[bench] no previous artifact $prevFile — " +
        "skipping BENCH_delta.md")
      return
    }
    val prev = readPrev(prevFile)
    val shared = now.keySet.intersect(prev.keySet).toSeq.sorted
      .filter(k => now(k) >= 0 && prev(k) > 0)
    val ratios = shared.map(k => (k, now(k), prev(k), now(k) / prev(k)))
    val slower = ratios.filter(_._4 >= 1.5).sortBy(-_._4)
    val faster = ratios.filter(_._4 <= 0.67).sortBy(_._4)
    val added = (now.keySet -- prev.keySet).toSeq.sorted
    val removed = (prev.keySet -- now.keySet).toSeq.sorted
    def row(t: (String, Double, Double, Double)) = {
      val note = retimed.get(t._1)
        .map(f => f" re-timed (first $f%.3f s) -> confirmed |")
        .getOrElse(" |")
      f"| ${t._1} | ${t._3}%.3f | ${t._2}%.3f | ${t._4}%.2fx |$note"
    }
    val reverted = retimed.keySet.intersect(prev.keySet).toSeq.sorted
      .filter(k => now(k) >= 0 && prev(k) > 0 && now(k) / prev(k) < 1.5)
    val md = new StringBuilder
    md ++= "# BENCH delta vs " + prevFile + "\n\n"
    md ++= f"Shared queries: ${shared.length}; total " +
      f"${shared.map(prev).sum}%.1f s -> ${shared.map(now).sum}%.1f s " +
      f"(x${shared.map(now).sum / math.max(1e-9, shared.map(prev).sum)}%.2f). " +
      "min-of-3 vs committed min; per-query ratios below are the plan " +
      "signal, uniform drift is box load (PERF lesson 18). Any row " +
      ">=1.5x on the first pass was auto-re-timed min-of-3 after the " +
      "suite finished; the committed value is the min of both passes.\n\n"
    md ++= s"New queries (${added.length}): " +
      (if (added.isEmpty) "none" else added.mkString(", ")) + "\n\n"
    if (removed.nonEmpty)
      md ++= s"Removed queries (${removed.length}): " +
        removed.mkString(", ") + "\n\n"
    if (reverted.nonEmpty)
      md ++= s"Re-timed, REVERTED to <1.5x (${reverted.length}): " +
        reverted.map(k =>
          f"$k (first ${retimed(k)}%.3f s -> ${now(k)}%.3f s)")
          .mkString(", ") + "\n\n"
    md ++= s"## >=1.5x slower (${slower.length})\n\n"
    if (slower.isEmpty) md ++= "none\n\n"
    else md ++= ("| query | prev s | now s | ratio | note |\n" +
      "|---|---|---|---|---|\n" +
      slower.map(row).mkString("\n") + "\n\n")
    def fastRow(t: (String, Double, Double, Double)) =
      f"| ${t._1} | ${t._3}%.3f | ${t._2}%.3f | ${t._4}%.2fx |"
    md ++= s"## <=0.67x (faster, ${faster.length})\n\n"
    if (faster.isEmpty) md ++= "none\n"
    else md ++= ("| query | prev s | now s | ratio |\n|---|---|---|---|\n" +
      faster.map(fastRow).mkString("\n") + "\n")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("BENCH_delta.md"), md.toString)
  }
}
