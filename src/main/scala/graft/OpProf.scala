package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

import scala.collection.mutable

/** Per-JOB wall-clock profiler for one query (optimization-round
  * evidence): many QFns are multi-job pipelines (eager localCheckpoints,
  * engine-lifecycle fixtures), so a single fresh-vs-rerun split (QProf)
  * cannot say WHICH internal job eats the time. OpProf registers a
  * SparkListener, runs the query once warm (untimed) + once measured,
  * and prints every job's duration, call site and total task time —
  * the local stand-in for the Spark UI's Jobs page (guide §7.1).
  */
object OpProf {
  def main(args: Array[String]): Unit = {
    val q = args.headOption.getOrElse("q141_label_propagation")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local("graft-opprof")
    spark.sparkContext.setLogLevel("ERROR")

    // warm-up (JIT/codegen), untimed
    SparkEntry.queries(q)(spark, sfDir)
      .write.format("noop").mode("overwrite").save()

    case class JobRow(id: Int, start: Long, var end: Long = 0L,
      site: String = "", var taskTimeMs: Long = 0L, var tasks: Int = 0,
      var shuffleReadMB: Double = 0, var shuffleWriteMB: Double = 0)
    val jobs = mutable.LinkedHashMap.empty[Int, JobRow]
    val stageToJob = mutable.Map.empty[Int, Int]
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val site = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description"))
            .orElse(Option(p.getProperty("callSite.short"))))
          .getOrElse("")
        jobs.synchronized {
          jobs(e.jobId) = JobRow(e.jobId, e.time, site = site)
          e.stageIds.foreach(sid => stageToJob(sid) = e.jobId)
        }
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        jobs.synchronized { jobs.get(e.jobId).foreach(_.end = e.time) }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
        jobs.synchronized {
          stageToJob.get(e.stageInfo.stageId).flatMap(jobs.get).foreach { j =>
            j.taskTimeMs += e.stageInfo.taskMetrics.executorRunTime
            j.tasks += e.stageInfo.numTasks
            j.shuffleReadMB +=
              e.stageInfo.taskMetrics.shuffleReadMetrics.totalBytesRead / 1e6
            j.shuffleWriteMB +=
              e.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten / 1e6
          }
        }
    }
    spark.sparkContext.addSparkListener(listener)
    val t0 = System.nanoTime()
    SparkEntry.queries(q)(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    val wall = (System.nanoTime() - t0) / 1e9
    Thread.sleep(500) // let the listener bus drain
    println(f"== $q measured pass: wall $wall%.3f s, ${jobs.size} jobs ==")
    var prevEnd = 0L
    jobs.values.toSeq.sortBy(_.start).foreach { j =>
      val dur = (j.end - j.start) / 1e3
      val gap = if (prevEnd == 0) 0.0 else (j.start - prevEnd) / 1e3
      prevEnd = math.max(prevEnd, j.end)
      println(f"job ${j.id}%3d  ${dur}%7.3f s  (driver gap ${gap}%6.3f s)  " +
        f"tasks ${j.tasks}%4d  taskTime ${j.taskTimeMs / 1e3}%7.2f s  " +
        f"shufR ${j.shuffleReadMB}%8.2f MB  shufW ${j.shuffleWriteMB}%8.2f MB" +
        f"  ${j.site}")
    }
    val jobSum = jobs.values.map(j => (j.end - j.start) / 1e3).sum
    println(f"job-time sum ${jobSum}%.3f s; driver-only (wall - sum, " +
      f"incl. planning/codegen) ${wall - jobSum}%.3f s")
    spark.stop()
  }
}
