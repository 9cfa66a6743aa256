package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Dump `.explain("formatted")` of named queries to
  * plans/r15/<query>_<suffix>.txt — the optimization round's
  * before/after plan evidence. Usage:
  *   ./run.sh graft.PlanDump <suffix> q141_label_propagation,q165_...
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val suffix = args.headOption.getOrElse("before")
    val names = args.lift(1).map(_.split(',').toSeq)
      .getOrElse(Seq("q141_label_propagation"))
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.001")
    // mirror the Bench session conf (SHJ threshold, cpus, shuffle
    // partitions) so committed plan evidence reflects the executed
    // configuration (r15 advice item 2)
    val spark = Sessions.local("graft-plandump")
    spark.sparkContext.setLogLevel("ERROR")
    val outDir = sys.env.getOrElse("SPARK_GRAFT_PLANS_DIR", "plans/r16")
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(outDir))
    names.foreach { q =>
      val df = SparkEntry.queries(q)(spark, sfDir)
      val plan = df.queryExecution
        .explainString(ExplainMode.fromString("formatted"))
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$outDir/${q}_$suffix.txt"), plan)
      println(s"wrote $outDir/${q}_$suffix.txt")
    }
    spark.stop()
  }
}
