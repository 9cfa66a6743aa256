package graft

import org.apache.spark.sql.SparkSession

/** Scratch profiler main for plan-shape investigations (PERF.md
  * evidence): prints the POST-AQE executed plan and wall-clock of one
  * query, isolated from Bench's query mix. */
object QProf {
  def main(args: Array[String]): Unit = {
    val q = args.headOption.getOrElse("q63_bigram_rarity")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local("graft-qprof")
    spark.sparkContext.setLogLevel("ERROR")
    // Bench-faithful: rebuild the DataFrame per iteration (fresh
    // analysis + optimization + AQE + codegen each time), plus one
    // same-DataFrame re-collect to split compile cost from execution
    for (i <- 1 to 4) {
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(q)(spark, sfDir)
      df.write.format("noop").mode("overwrite").save()
      val t1 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val t2 = System.nanoTime()
      println(f"iter $i: fresh-plan ${(t1 - t0) / 1e9}%.3f s, " +
        f"same-df re-run ${(t2 - t1) / 1e9}%.3f s")
    }
    // EXECUTE THIS DataFrame's own QueryExecution before printing:
    // with AQE the final plan (join-strategy flips, coalesced reads)
    // only exists after a run, and a .write wraps the plan in its own
    // QueryExecution — so collect() here, not the noop sink, or the
    // printout stays isFinalPlan=false with the initial shapes
    val last = SparkEntry.queries(q)(spark, sfDir)
    last.collect()
    println(last.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
