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
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get("plans/r15"))
    names.foreach { q =>
      val df = SparkEntry.queries(q)(spark, sfDir)
      val plan = df.queryExecution
        .explainString(ExplainMode.fromString("formatted"))
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"plans/r15/${q}_$suffix.txt"), plan)
      println(s"wrote plans/r15/${q}_$suffix.txt")
    }
    spark.stop()
  }
}
