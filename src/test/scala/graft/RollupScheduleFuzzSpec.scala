package graft

import org.apache.spark.sql.functions._

/** SERIAL seeded schedule fuzzer for the day-grain rollup's
  * exactly-once lifecycle: every op sequence of PUTs (into doomed and
  * surviving days), auto-refresh toggles, syncs and partition drops
  * must leave the rollup row-exact against a rebuild. The concurrency
  * soak found a rollup divergence its serialized mutation schedule
  * must also reach (all engine mutations hold one write lock) — this
  * spec hunts that schedule deterministically and pins the fix. */
class RollupScheduleFuzzSpec extends SparkSpec {
  import spark.implicits._

  private def freshEngine(dir: java.nio.file.Path)
      : (graft.engine.Engine, String) = {
    val p = dir.resolve("rt").toString
    val seed = Seq((1L, "2024-01-01 10:00:00", "a"),
        (2L, "2024-01-02 10:00:00", "b"))
      .toDF("id", "ts_s", "g")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
      .withColumn("tsd_id", lit(0))
    graft.engine.TimePartitions.write(seed, "ts", "day", 1, p)
    val cat = new graft.engine.Catalog(spark)
    cat.registerPartitionedTable("rt", p, "ts", "day", 1)
    val engine = new graft.engine.Engine(spark, cat)
    engine.dataDir = Some(dir.resolve("data").toString)
    engine.execute(s"rollup create where table = rt and " +
      s"path = ${dir.resolve("ru")} and time = ts and value = id " +
      "and grain = day")
    (engine, p)
  }

  test("rollup stays verify-exact under seeded serial schedules of " +
      "PUT / toggle / sync / drop (the soak's op alphabet)") {
    for (seedN <- 1 to 12) {
      val rnd = new scala.util.Random(seedN)
      val dir = java.nio.file.Files.createTempDirectory(s"rfz$seedN")
      val (engine, p) = freshEngine(dir)
      var nextId = 100L * seedN
      val log = Seq.newBuilder[String]
      def put(): Unit = {
        nextId += 1
        val day = 1 + (rnd.nextInt(5))
        log += s"put day=$day id=$nextId"
        engine.ingest("rt", s"""{"id": $nextId, """ +
          s""""ts": "2024-01-0$day 0${nextId % 10}:00:00", "g": "g${nextId % 2}"}""")
      }
      def dropOldest(): Unit = {
        val parts = graft.engine.TimePartitions.partitions(spark, p)
        if (parts.length > 1) {
          log += s"drop before ${parts(1)}"
          try engine.execute(s"drop partition rt before ${parts(1)}")
          catch { case _: Exception =>
            log += "  (aborted -> sync -> retry)"
            engine.execute("sync all where table = rt")
            engine.execute(s"drop partition rt before ${parts(1)}")
          }
        }
      }
      for (i <- 1 to 14) rnd.nextInt(6) match {
        case 0 | 1 => put()
        case 2 =>
          val on = rnd.nextBoolean()
          log += s"refresh=$on"
          engine.execute(s"set view auto refresh = ${if (on) "on" else "off"}")
        case 3 =>
          log += "sync"
          engine.execute("sync all where table = rt")
        case _ => dropOldest()
      }
      engine.execute("set view auto refresh = on")
      engine.execute("sync all where table = rt")
      val audit = engine.execute("artifact verify where table = rt")
      assert(audit.contains("VERIFIED exact") && !audit.contains("DIVERGED"),
        s"seed $seedN diverged; schedule:\n${log.result().mkString("\n")}\n$audit")
    }
  }
}
