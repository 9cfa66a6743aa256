package graft

import org.apache.spark.sql.SparkSession

/** The ONE construction site for the engine's session defaults.
  *
  * Every main in this repo (Bench, Verify, OpProf, QProf, PlanDump,
  * Plans, KcoreLadder, EditJoinProbe) builds its session here, so the
  * plans the bench times, the plans the oracle verifies, and the plans
  * the diagnostic tools dump are produced under IDENTICAL engine conf.
  *
  * Embedders: an application that constructs its own SparkSession for
  * `graft.SparkEntry` / `graft.engine.Engine` must route its builder
  * through [[defaults]] (or replicate these conf keys), otherwise the
  * engine's join-strategy work — most visibly the triangle-closure
  * sort-merge→shuffled-hash rewrite gated by
  * `spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold` — silently
  * reverts to slower plans. The settings are scale-independent: the SHJ
  * threshold is a RUNTIME per-partition bound (AQE only rewrites when
  * the measured build side fits task memory, where a static
  * SHUFFLE_HASH hint OOM'd the 10x probe), and AQE itself is on by
  * default since Spark 3.2.
  */
object Sessions {
  /** Engine conf applied to any builder — see the object doc. */
  def defaults(b: SparkSession.Builder): SparkSession.Builder =
    b.config("spark.sql.adaptive.enabled", "true")
      // let AQE rewrite a sort-merge join to shuffled-hash when the
      // RUNTIME-measured per-partition build side fits task memory —
      // skips sorting the big streamed side (e.g. the triangle wedge
      // stream: 443 MB / 141 s of taskTime at sf0.1; optimization r15)
      .config("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
        "64m")
      .config("spark.sql.session.timeZone", "UTC")

  /** A local-mode session for this repo's mains: master/parallelism from
    * `$SPARK_GRAFT_CPUS` (driver contract — the driver re-runs the bench
    * at a lower core count to measure scaling), engine [[defaults]], UI
    * off, and the audited WindowExec warning demotion (every
    * unpartitioned window in the repo is bounded — see Verify). */
  def local(app: String, defaultCpus: String = "32"): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", defaultCpus)
    val spark = defaults(SparkSession.builder()
        .master(s"local[$cpus]")
        .appName(app)
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // audited bounded-input windows only — see the note in Verify.scala
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.execution.window.WindowExec",
      org.apache.logging.log4j.Level.ERROR)
    spark
  }
}
