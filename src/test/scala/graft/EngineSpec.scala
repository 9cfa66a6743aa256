package graft

import org.apache.spark.sql.functions._

import graft.engine.{Catalog, Render, Tables, TimePartitions}

class RenderSpec extends SparkSpec {
  import spark.implicits._

  private val df = Seq((1, "a"), (2, "b")).toDF("id", "name")

  test("json format wraps rows under Query") {
    val out = Render.json(df.orderBy("id"))
    assert(out ===
      """{"Query": [{"id":1,"name":"a"},{"id":2,"name":"b"}]}""")
  }

  test("json:list is one object per line") {
    assert(Render.jsonList(df.orderBy("id")).linesIterator.size === 2)
  }

  test("table format renders fixed-width ASCII") {
    val out = Render.table(df.orderBy("id"))
    assert(out.contains("| id | name |"))
    assert(out.contains("| 1  | a    |"))
  }

  test("stat footer appends count") {
    val out = Render.withStat(df, Render.json(_))
    assert(out.contains("\"Count\": 2"))
  }
}

class CatalogSpec extends SparkSpec {
  test("tables register and resolve; views rename/subset") {
    val cat = new Catalog(spark)
    cat.registerTable("events", s"$sfDir/events.parquet")
    assert(cat.table("events").count() > 0)
    cat.createView("ev_slim", "events",
      Seq("event_id" -> "id", "event_type" -> "kind"))
    val v = cat.table("ev_slim")
    assert(v.columns.toSeq === Seq("id", "kind"))
    // column pruning sees through the view to the scan
    val plan = v.select("kind").queryExecution.executedPlan.toString
    assert(plan.contains("event_type"))
    assert(!plan.contains("user_id"))
  }

  test("policies persist to the metadata root") {
    val dir = java.nio.file.Files.createTempDirectory("cat")
    val cat = new Catalog(spark, Some(dir))
    cat.addPolicy("p1", """{"mapping": {"dbms": "d", "table": "t"}}""")
    assert(cat.policy("p1").isDefined)
    assert(java.nio.file.Files.exists(dir.resolve("policy_p1.json")))
  }
}

class TimePartitionsSpec extends SparkSpec {
  test("write partitioned by day; prune; drop old partitions") {
    val dir = java.nio.file.Files.createTempDirectory("par").toString
    val ev = Tables.load(spark, sfDir, "events")
      .filter(col("ts") >= lit("2024-01-01") && col("ts") < lit("2024-01-06"))
    TimePartitions.write(ev, "ts", "day", 1, dir)
    val parts = TimePartitions.partitions(spark, dir)
    assert(parts === Seq("2024-01-01", "2024-01-02", "2024-01-03",
      "2024-01-04", "2024-01-05"))

    // partition pruning: filtering the derived key scans one directory
    val pruned = spark.read.parquet(dir).filter(col("__par") === "2024-01-03")
    val scan = pruned.queryExecution.executedPlan.toString
    assert(pruned.count() ===
      ev.filter(date_format(col("ts"), "yyyy-MM-dd") === "2024-01-03").count())

    // retention drop
    val dropped = TimePartitions.dropOlderThan(spark, dir, "2024-01-03")
    assert(dropped === Seq("2024-01-01", "2024-01-02"))
    assert(TimePartitions.partitions(spark, dir) ===
      Seq("2024-01-03", "2024-01-04", "2024-01-05"))
  }

  test("a not-yet-written table path lists zero partitions (no NPE)") {
    val missing = java.nio.file.Files.createTempDirectory("par").toString +
      "/never_written"
    assert(TimePartitions.partitions(spark, missing) === Seq.empty)
    // plain file (not a directory) — same clean empty answer
    val f = java.nio.file.Files.createTempFile("par", ".dat")
    assert(TimePartitions.partitions(spark, f.toString) === Seq.empty)
  }

  test("7-day buckets (the reference's week replacement)") {
    val ev = Tables.load(spark, sfDir, "events")
    val buckets = ev.select(TimePartitions.bucketExpr("ts", "day", 7).as("b"))
      .distinct().orderBy("b").collect().map(_.getString(0))
    assert(buckets.nonEmpty)
    // consecutive buckets are exactly 7 days apart
    val days = buckets.map(java.time.LocalDate.parse)
    days.sliding(2).foreach { case Array(a, b) =>
      assert(java.time.temporal.ChronoUnit.DAYS.between(a, b) === 7)
    }
  }
}

class IncrementsAutoDialectSpec extends SparkSpec {
  test("timeBounds extracts literal ranges") {
    val b = graft.dialect.EdgeSql.timeBounds(
      "ts >= '2024-01-01' and ts < '2024-01-31' and x = 1", "ts")
    assert(b.isDefined)
    assert(b.get._1 === java.time.LocalDateTime.parse("2024-01-01T00:00"))
  }
}

class BucketingSpec extends SparkSpec {
  import graft.engine.{Bucketing, Tables}

  test("bucketed tables join with NO exchange on either side") {
    val ev = Tables.load(spark, sfDir, "events")
    val facts = ev.select(col("event_id"), col("user_id"), col("value"))
    val dims = ev.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"), max(col("value")).as("max_value"))
    Bucketing.writeBucketed(facts, "ev_bucketed", "user_id", 8,
      sortCols = Seq("user_id"))
    Bucketing.writeBucketed(dims, "user_bucketed", "user_id", 8,
      sortCols = Seq("user_id"))

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("ev_bucketed")
        .join(spark.table("user_bucketed"), "user_id")
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"))
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle:\n$plan")
      // correctness too
      assert(joined.count() === spark.table("ev_bucketed").count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS ev_bucketed")
      spark.sql("DROP TABLE IF EXISTS user_bucketed")
    }
  }
}

class AgePartitionDropSpec extends SparkSpec {
  import graft.engine.{Catalog, Engine, Tables, TimePartitions}

  test("drop partition ... older than <n> <unit> uses the age horizon") {
    val dir = java.nio.file.Files.createTempDirectory("aged").toString
    val ev = Tables.load(spark, sfDir, "events")
      .filter(col("ts") < lit("2024-01-04"))
    TimePartitions.write(ev, "ts", "day", 1, dir)
    assert(TimePartitions.partitions(spark, dir).nonEmpty)
    val cat = new Catalog(spark)
    val engine = new Engine(spark, cat)
    // data is from 2024 — anything "older than 1 day" from now drops all
    val out = engine.execute(s"drop partition $dir older than 1 day")
    assert(out.startsWith("dropped 3"))
    assert(TimePartitions.partitions(spark, dir).isEmpty)
  }
}

class PipelineCleanCommandSpec extends SparkSpec {
  import graft.engine.{Catalog, Engine}

  test("pipeline clean materializes a cleaned table queryable via sql") {
    // testdata is read-only — stage a copy so the dest lands beside it
    val dir = java.nio.file.Files.createTempDirectory("pclean")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/documents.parquet"),
      dir.resolve("documents.parquet"))
    val cat = new Catalog(spark)
    cat.registerTable("documents", dir.resolve("documents.parquet").toString)
    val engine = new Engine(spark, cat)
    val out = engine.execute("pipeline clean where table = documents " +
      """and dest = cleaned and spec = {"pipeline": {"stages": [
        {"op": "lang_keep", "langs": ["en"]},
        {"op": "dedup_exact"},
        {"op": "split", "train": 80, "valid": 10}
      ]}}""")
    assert(out.startsWith("table cleaned created: "))
    // the cleaned corpus is now a first-class table on the sql surface
    val reply = engine.execute(
      """sql edge format = json "select count(*) as n from cleaned"""")
    val en = cat.table("documents")
      .filter(col("lang") === "en").select("text").distinct().count()
    assert(reply.contains(s""""n":$en"""))
    assert(cat.table("cleaned").columns.contains("split"))
  }

  test("pipeline clean rejects unregistered sources and bad dest names") {
    val engine = new Engine(spark, new Catalog(spark))
    intercept[IllegalArgumentException](engine.execute(
      """pipeline clean where table = nope and dest = x and spec = {}"""))
  }

  test("dest colliding with the source's storage is rejected") {
    val dir = java.nio.file.Files.createTempDirectory("pclean3")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/documents.parquet"),
      dir.resolve("docs.parquet"))
    val cat = new Catalog(spark)
    cat.registerTable("docs", dir.resolve("docs.parquet").toString)
    val engine = new Engine(spark, cat)
    val ex = intercept[IllegalArgumentException](engine.execute(
      """pipeline clean where table = docs and dest = docs and spec = """ +
        """{"pipeline": {"stages": [{"op": "dedup_exact"}]}}"""))
    assert(ex.getMessage.contains("collides"))
  }

  test("an unregistered parquet sibling is not clobbered without overwrite") {
    val dir = java.nio.file.Files.createTempDirectory("pclean4")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/documents.parquet"),
      dir.resolve("documents.parquet"))
    // an UNREGISTERED parquet sitting beside the source: the catalog
    // collision check can't see it, the on-disk check must
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      dir.resolve("bystander.parquet"))
    val cat = new Catalog(spark)
    cat.registerTable("documents", dir.resolve("documents.parquet").toString)
    val engine = new Engine(spark, cat)
    val spec = """{"pipeline": {"stages": [{"op": "dedup_exact"}]}}"""
    val ex = intercept[IllegalArgumentException](engine.execute(
      "pipeline clean where table = documents and dest = bystander " +
        s"and spec = $spec"))
    assert(ex.getMessage.contains("overwrite = true"))
    // bystander survived untouched
    assert(spark.read.parquet(dir.resolve("bystander.parquet").toString)
      .columns.contains("ts"))
    // explicit overwrite = true is honored
    val out = engine.execute("pipeline clean where table = documents " +
      s"and dest = bystander and overwrite = true and spec = $spec")
    assert(out.startsWith("table bystander created: "))
  }

  test("curation stages (dsir_gate / domain_mixture / lm_quality_max) " +
      "compose from the pipeline clean command surface") {
    val dir = java.nio.file.Files.createTempDirectory("pclean6")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/documents.parquet"),
      dir.resolve("documents.parquet"))
    val cat = new Catalog(spark)
    cat.registerTable("documents", dir.resolve("documents.parquet").toString)
    val engine = new Engine(spark, cat)
    val docs = cat.table("documents")
    val ipath = dir.resolve("dsir_idx").toString
    graft.ops.IndexStore.write(graft.ops.Curation.dsirIndex(
      docs.filter(col("lang") === "en"), docs, "text", 256), ipath)
    val out = engine.execute("pipeline clean where table = documents " +
      s"""and dest = curated and spec = {"pipeline": {"stages": [
        {"op": "dsir_gate", "index": "$ipath", "min_weight_q": -100000000},
        {"op": "domain_mixture", "budget_bp": 8000},
        {"op": "lm_quality_max", "max_score_q": 100000000}
      ]}}""")
    assert(out.startsWith("table curated created: "))
    val n = cat.table("curated").count()
    assert(n > 0 && n < docs.count())
  }

  test("a source name containing the letters 'spec' parses cleanly") {
    val dir = java.nio.file.Files.createTempDirectory("pclean2")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/documents.parquet"),
      dir.resolve("inspection.parquet"))
    val cat = new Catalog(spark)
    cat.registerTable("inspection",
      dir.resolve("inspection.parquet").toString)
    val engine = new Engine(spark, cat)
    val out = engine.execute("pipeline clean where table = inspection " +
      """and dest = insp_clean and spec = {"pipeline": {"stages": [
        {"op": "dedup_exact"}]}}""")
    assert(out.startsWith("table insp_clean created: "))
  }
}

class PolicyCommandSpec extends SparkSpec {
  import graft.engine.{Catalog, Engine}

  test("policy add / get round-trips through the command surface") {
    val engine = new Engine(spark, new Catalog(spark))
    val json = """{"mapping": {"dbms": "iot", "table": "t"}}"""
    assert(engine.execute(s"policy add p1 $json") === "policy p1 stored")
    assert(engine.execute("policy get p1") === json)
    intercept[IllegalArgumentException](engine.execute("policy get nope"))
  }
}

class AppendPartitionSpec extends SparkSpec {
  import graft.engine.{Tables, TimePartitions}
  import org.apache.spark.sql.SaveMode

  test("append mode accretes new days without rewriting old ones") {
    val dir = java.nio.file.Files.createTempDirectory("app").toString
    val ev = Tables.load(spark, sfDir, "events")
    TimePartitions.write(ev.filter(col("ts") < "2024-01-03"),
      "ts", "day", 1, dir)
    val before = TimePartitions.partitions(spark, dir)
    TimePartitions.write(
      ev.filter(col("ts") >= "2024-01-03" && col("ts") < "2024-01-05"),
      "ts", "day", 1, dir, mode = SaveMode.Append)
    val after = TimePartitions.partitions(spark, dir)
    assert(after.length === before.length + 2)
    assert(spark.read.parquet(dir).count() ===
      ev.filter(col("ts") < "2024-01-05").count())
  }
}

class RollupServeSpec extends SparkSpec {
  import graft.engine.{Catalog, Engine}

  private def freshEngine(): (Engine, String) = {
    val cat = new Catalog(spark)
    cat.registerTable("events", s"$sfDir/events.parquet",
      nanoTs = Seq("ts"))
    val dir = java.nio.file.Files.createTempDirectory("rollsrv")
      .resolve("roll").toString
    (new Engine(spark, cat), dir)
  }

  private def touchesEvents(df: org.apache.spark.sql.DataFrame): Boolean =
    df.queryExecution.sparkPlan.toString.contains("events.parquet")

  /** Collect (schema names+types, sorted row strings) for comparison. */
  private def sig(df: org.apache.spark.sql.DataFrame) =
    (df.schema.fields.map(f => (f.name, f.dataType)).toSeq,
      df.collect().map(_.toString).sorted.toSeq)

  // the SERVE battery: every dialect shape the matcher accepts
  private val servedQueries = Seq(
    """sql edge "select increments(hour, 6, ts), count(*) as n, """ +
      """sum(value) as s, min(value) as mn, max(value) as mx, """ +
      """avg(value) as av from events """ +
      """where ts >= '2024-01-05 00:00:00' and ts < '2024-01-20 00:00:00'"""",
    // dims + default aliases + range agg + no WHERE
    """sql edge "select event_type, increments(day, 1, ts), count(*), """ +
      """sum(value), range(value) from events group by event_type"""",
    // auto-sized increments over an aligned bounded range
    """sql edge "select increments(ts), count(*) as n, avg(value) as av """ +
      """from events where ts >= '2024-01-05 00:00:00' """ +
      """and ts < '2024-01-20 00:00:00'"""",
    // count(value) (null-aware path) + order by + limit
    """sql edge "select increments(day, 7, ts), count(value) as nv """ +
      """from events order by day_parent, day_bucket limit 3"""",
    // year unit from a minute-grain rollup
    """sql edge "select increments(year, 1, ts), count(*) as n from events"""",
    // dim-equality predicates commute with the re-aggregation
    """sql edge "select increments(day, 1, ts), count(*) as n, """ +
      """avg(value) as av from events where event_type = 'click' """ +
      """and ts >= '2024-01-05 00:00:00' and ts < '2024-01-20 00:00:00'"""",
    """sql edge "select event_type, increments(day, 1, ts), count(*) as n """ +
      """from events where event_type != 'error' group by event_type"""")

  // shapes the matcher must REFUSE (fallback stays correct)
  private val fallbackQueries = Seq(
    // unaligned lower bound (cuts inside a minute bucket)
    """sql edge "select increments(hour, 1, ts), count(*) as n """ +
      """from events where ts >= '2024-01-05 00:00:30' """ +
      """and ts < '2024-01-06 00:00:00'"""",
    // <= upper bound includes a single boundary instant, not its bucket
    """sql edge "select increments(hour, 1, ts), count(*) as n """ +
      """from events where ts >= '2024-01-05 00:00:00' """ +
      """and ts <= '2024-01-06 00:00:00'"""",
    // non-servable aggregate
    """sql edge "select increments(day, 1, ts), """ +
      """count(distinct event_type) as d from events"""",
    // aggregate over a non-rollup column
    """sql edge "select increments(day, 1, ts), sum(user_id) as s """ +
      """from events"""",
    // non-dim, non-ts predicate (value is a measure, not a key)
    """sql edge "select increments(day, 1, ts), count(*) as n """ +
      """from events where value > 50"""")

  test("HAVING on a rollup-servable query: served == base plan; a " +
      "HAVING the matcher can't prove declines (never silently " +
      "dropped)") {
    val (engine, dir) = freshEngine()
    val q = """sql edge "select increments(day, 1, ts), event_type, """ +
      """count(*) as n, avg(value) as av from events """ +
      """group by event_type having av > 49.5 order by n desc""""
    val base = sig(engine.query(q))
    engine.execute("rollup create where table = events and " +
      s"path = $dir and time = ts and value = value and " +
      "grain = minute and dims = (event_type)")
    val served = engine.query(q)
    assert(!touchesEvents(served), "should serve from the rollup")
    assert(sig(served) === base)
    // the filter actually bites: unfiltered row count is larger
    val qAll = """sql edge "select increments(day, 1, ts), """ +
      """event_type, count(*) as n from events group by event_type""""
    assert(served.count() < engine.query(qAll).count())
    // HAVING over a function identifier -> decline to base, correct
    val qFn = """sql edge "select increments(day, 1, ts), event_type, """ +
      """count(*) as n from events group by event_type """ +
      """having abs(n) > 10""""
    val fb = engine.query(qFn)
    assert(touchesEvents(fb), "unprovable HAVING must fall back")
    assert(fb.count() > 0)
  }

  test("rollup delete: before= retires whole buckets exactly " +
      "(retention form); source=+base= recomputes touched buckets " +
      "from the post-delete base (row form)") {
    import graft.ops.{IndexStore, Rollup}
    val ev = graft.engine.Tables.load(spark, sfDir, "events")
    // --- retention form
    val (engine, dir) = freshEngine()
    engine.execute("rollup create where table = events and " +
      s"path = $dir and time = ts and value = value and " +
      "grain = minute and dims = (event_type)")
    val cut = "2024-01-10 00:00:00"
    val out = engine.execute(
      s"rollup delete where table = events and before = '$cut'")
    assert(out.contains("buckets remain"), out)
    val st = IndexStore.read(spark, dir).get
    assert(st.filter(col("grain_ts") < cut).count() === 0)
    assert(st.count() > 0)
    // bucket-aligned == rebuild over the surviving time range
    val rebuilt = Rollup.build(ev.filter(col("ts") >= cut), "ts",
      "minute", Seq("event_type"), "value")
    assert(st.exceptAll(rebuilt).count() === 0)
    assert(rebuilt.exceptAll(st).count() === 0)
    // --- row form on a fresh rollup
    val (engine2, dir2) = freshEngine()
    engine2.execute("rollup create where table = events and " +
      s"path = $dir2 and time = ts and value = value and " +
      "grain = minute and dims = (event_type)")
    val tmp = java.nio.file.Files.createTempDirectory("rolldel")
    val dels = ev.filter(col("user_id") % 7 === 3)
    val after = ev.filter(col("user_id") % 7 =!= 3)
    dels.write.parquet(tmp.resolve("dels").toString)
    after.write.parquet(tmp.resolve("after").toString)
    // register the post-delete base under a name
    val cat2 = new Catalog(spark)
    cat2.registerTable("events", s"$sfDir/events.parquet",
      nanoTs = Seq("ts"))
    cat2.registerTable("ev_after", tmp.resolve("after").toString)
    val engine3 = new Engine(spark, cat2)
    engine3.execute("rollup attach where table = events and " +
      s"path = $dir2 and time = ts and value = value and " +
      "grain = minute and dims = (event_type)")
    val out2 = engine3.execute("rollup delete where table = events " +
      s"and source = ${tmp.resolve("dels")} and base = ev_after")
    assert(out2.contains("buckets remain"), out2)
    val st2 = IndexStore.read(spark, dir2).get
    // min/max repaired exactly: state == rebuild over post-delete base
    val rebuilt2 = Rollup.build(after, "ts", "minute",
      Seq("event_type"), "value")
    assert(st2.exceptAll(rebuilt2).count() === 0)
    assert(rebuilt2.exceptAll(st2).count() === 0)
  }

  test("served rollup plans equal the base dialect plans, never scan events") {
    val (engine, dir) = freshEngine()
    val expected = (servedQueries ++ fallbackQueries).map(q => sig(engine.query(q)))
    val msg = engine.execute("rollup create where table = events and " +
      s"path = $dir and time = ts and value = value and " +
      "grain = minute and dims = (event_type)")
    assert(msg.contains("rollup for events created"))
    servedQueries.zip(expected).foreach { case (q, exp) =>
      val df = engine.query(q)
      assert(!touchesEvents(df), s"not served from rollup: $q")
      assert(sig(df) === exp, s"served result differs: $q")
    }
    fallbackQueries.zip(expected.drop(servedQueries.length)).foreach {
      case (q, exp) =>
        val df = engine.query(q)
        assert(touchesEvents(df), s"expected fallback to base plan: $q")
        assert(sig(df) === exp, s"fallback result differs: $q")
    }
    assert(engine.execute("get rollups").contains("grain=minute"))
    // drop unregisters: the same query falls back to the base plan
    assert(engine.execute("rollup drop where table = events")
      .contains("dropped"))
    assert(touchesEvents(engine.query(servedQueries.head)))
    assert(engine.execute("get rollups") === "no rollups registered")
  }

  test("rollup attach re-registers from the artifact alone after a restart") {
    val (engine1, dir) = freshEngine()
    engine1.execute("rollup create where table = events and " +
      s"path = $dir and time = ts and value = (value, user_id) and " +
      "grain = minute and dims = (event_type)")
    val q = servedQueries.head
    val expected = sig(engine1.query(q))
    // a RESTARTED engine: fresh instance, no in-memory registration
    val (engine2, _) = freshEngine()
    assert(touchesEvents(engine2.query(q))) // not registered yet
    val msg = engine2.execute(
      s"rollup attach where table = events and path = $dir")
    assert(msg.contains("grain=minute") && msg.contains("event_type")
      && msg.contains("value,user_id"), msg)
    val df = engine2.query(q)
    assert(!touchesEvents(df), "attached rollup did not serve")
    assert(sig(df) === expected)
  }

  test("multi-measure rollup serves aggregates over every registered measure") {
    val (engine, dir) = freshEngine()
    val q = """sql edge "select increments(day, 1, ts), count(*) as n, """ +
      """sum(value) as sv, avg(user_id) as au, max(user_id) as mu, """ +
      """count(user_id) as nu from events""""
    val exp = sig(engine.query(q))
    engine.execute("rollup create where table = events and " +
      s"path = $dir and time = ts and value = (value, user_id) and " +
      "grain = hour")
    val df = engine.query(q)
    assert(!touchesEvents(df), "multi-measure query not served")
    assert(sig(df) === exp)
    assert(engine.execute("get rollups").contains("value=value,user_id"))
  }

  test("property: registering a rollup NEVER changes any query's answer " +
      "(random units, bounds, aggregates, predicates)") {
    val (plain, _) = freshEngine()
    val (rolled, dir) = freshEngine()
    rolled.execute("rollup create where table = events and " +
      s"path = $dir and time = ts and value = (value, user_id) and " +
      "grain = minute and dims = (event_type)")
    val rnd = new scala.util.Random(7)
    val units = Seq("second", "minute", "hour", "day", "month", "year")
    val aggPool = Seq("count(*) as n", "sum(value) as s",
      "min(value) as mn", "max(value) as mx", "avg(value) as av",
      "range(value) as rv", "count(value) as nv", "sum(user_id) as su",
      "avg(user_id) as au", "count(distinct event_type) as d")
    val wheres = Seq(None,
      Some("ts >= '2024-01-03 00:00:00' and ts < '2024-01-20 00:00:00'"),
      Some("ts >= '2024-01-03 00:00:30' and ts < '2024-01-20 00:00:00'"),
      Some("ts >= '2024-01-03 00:00:00' and ts <= '2024-01-20 00:00:00'"),
      Some("event_type = 'click' and ts >= '2024-01-03 00:00:00' " +
        "and ts < '2024-01-20 00:00:00'"),
      Some("value > 50"))
    for (_ <- 1 to 20) {
      val unit = units(rnd.nextInt(units.length))
      val n = Seq(1, 2, 5, 6, 10)(rnd.nextInt(5))
      val aggs = rnd.shuffle(aggPool).take(1 + rnd.nextInt(3))
      val dim = if (rnd.nextBoolean()) Seq("event_type") else Nil
      val where = wheres(rnd.nextInt(wheres.length))
        .map(w => s" where $w").getOrElse("")
      val q = s"""sql edge "select ${(dim :+
        s"increments($unit, $n, ts)").mkString(", ")}, ${
        aggs.mkString(", ")} from events$where""""
      val a = plain.query(q).collect().map(_.toString).sorted.toSeq
      val b = rolled.query(q).collect().map(_.toString).sorted.toSeq
      assert(a === b, s"rollup registration changed the answer for: $q")
    }
  }

  test("rollup refresh folds a delta; serving reflects it without rescans") {
    val cat = new Catalog(spark)
    val dir0 = java.nio.file.Files.createTempDirectory("rollref")
    // stage a split corpus: first half now, second half as the delta
    val ev = graft.engine.Tables.load(spark, sfDir, "events")
    val half = dir0.resolve("half.parquet").toString
    val delta = dir0.resolve("delta.parquet").toString
    ev.filter(col("event_id") % 2 === 0).write.parquet(half)
    ev.filter(col("event_id") % 2 === 1).write.parquet(delta)
    cat.registerTable("events", half)
    val engine = new Engine(spark, cat)
    val rollDir = dir0.resolve("roll").toString
    engine.execute("rollup create where table = events and " +
      s"path = $rollDir and time = ts and value = value and grain = hour")
    engine.execute(
      s"rollup refresh where table = events and source = $delta")
    val q = """sql edge "select increments(day, 1, ts), count(*) as n, """ +
      """sum(value) as s from events""""
    val served = engine.query(q)
    assert(!served.queryExecution.sparkPlan.toString.contains("half.parquet"))
    // equals the full corpus aggregated directly
    val direct = ev
      .groupBy(date_format(date_trunc("month", col("ts")), "yyyy-MM")
          .as("day_parent"),
        floor(dayofmonth(col("ts")) / 1).as("day_bucket"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("s"))
    assert(served.collect().map(_.toString).sorted ===
      direct.collect().map(_.toString).sorted)
  }
}

class VIndexCommandSpec extends SparkSpec {
  import graft.engine.{Catalog, Engine}
  import graft.ops.Similarity

  private def staged(): (Catalog, Engine, java.nio.file.Path) = {
    val dir = java.nio.file.Files.createTempDirectory("vindex")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/embeddings.parquet"),
      dir.resolve("embeddings.parquet"))
    val cat = new Catalog(spark)
    cat.registerTable("embeddings",
      dir.resolve("embeddings.parquet").toString)
    val engine = new Engine(spark, cat)
    (cat, engine, dir)
  }

  test("vindex create/search (pq): command serve == library ADC serve; " +
      "get vindexes lists it; drop unregisters") {
    val (cat, engine, dir) = staged()
    val p = dir.resolve("pqidx").toString
    val out = engine.execute("vindex create where table = embeddings " +
      s"and path = $p and id = vec_id and vector = embedding " +
      "and type = pq and numsub = 4 and ksub = 8")
    assert(out.contains("type=pq"))
    assert(engine.execute("get vindexes").contains("embeddings: type=pq"))
    // stage a 3-probe parquet and search through the command
    val probes = dir.resolve("probes").toString
    cat.table("embeddings").filter(col("vec_id") < 3)
      .write.parquet(probes)
    val reply = engine.execute("vindex search where table = embeddings " +
      s"and probes = $probes and k = 2")
    // equals serving straight from the library over the same artifact
    val idx = graft.ops.IndexStore.read(spark, p).get
    val expect = Similarity.pqSearchIndex(idx,
      spark.read.parquet(probes), "embedding", "vec_id", k = 2, numSub = 4)
    expect.collect().foreach { r =>
      assert(reply.contains(s""""id":${r.getAs[Long]("id")}"""),
        s"missing neighbor ${r.getAs[Long]("id")} in $reply")
    }
    assert(engine.execute("vindex drop where table = embeddings")
      .contains("dropped"))
    intercept[IllegalArgumentException](engine.execute(
      s"vindex search where table = embeddings and probes = $probes and k = 2"))
  }

  test("vindex delete tombstones coded rows: search never surfaces " +
      "deleted ids, the recorded geometry survives untouched") {
    val (cat, engine, dir) = staged()
    val p = dir.resolve("pqdel").toString
    engine.execute("vindex create where table = embeddings " +
      s"and path = $p and id = vec_id and vector = embedding " +
      "and type = pq and numsub = 4 and ksub = 8")
    val booksBefore = Similarity.pqIndexBooks(
      graft.ops.IndexStore.read(spark, p).get).collect().toSet
    val out = engine.execute(
      "vindex delete where table = embeddings and ids = (3, 4, 5)")
    // numSub = 4 code rows per vector: 3 ids x 4 subs
    assert(out.contains("12 coded row(s) deleted"), out)
    val idx = graft.ops.IndexStore.read(spark, p).get
    assert(idx.filter(col("role") === "code" &&
      col("id").isin(3L, 4L, 5L)).count() === 0)
    // frozen geometry: books byte-identical across the delete
    assert(Similarity.pqIndexBooks(idx).collect().toSet === booksBefore)
    // serve-after-delete == library serve over the surviving artifact,
    // and no deleted id can rank
    val probes = dir.resolve("probes").toString
    cat.table("embeddings").filter(col("vec_id") < 3)
      .write.parquet(probes)
    val reply = engine.execute("vindex search where table = embeddings " +
      s"and probes = $probes and k = 5")
    val expect = Similarity.pqSearchIndex(idx,
      spark.read.parquet(probes), "embedding", "vec_id", k = 5,
      numSub = 4).collect()
    assert(expect.forall(r => !Set(3L, 4L, 5L)
      .contains(r.getAs[Long]("id"))))
    expect.foreach { r =>
      assert(reply.contains(s""""id":${r.getAs[Long]("id")}"""),
        s"missing neighbor ${r.getAs[Long]("id")} in $reply")
    }
    // delete via source-frame form composes (no-op on already-gone id)
    val dels = dir.resolve("dels").toString
    cat.table("embeddings").filter(col("vec_id") === 6L)
      .select(col("vec_id")).write.parquet(dels)
    assert(engine.execute("vindex delete where table = embeddings " +
      s"and source = $dels").contains("4 coded row(s) deleted"))
  }

  test("vindex refresh folds new vectors against the RECORDED books; " +
      "attach re-registers from the artifact alone") {
    val (cat, engine, dir) = staged()
    val p = dir.resolve("pqidx2").toString
    // build on the first half only, then fold the rest via refresh
    cat.registerTable("emb_head", dir.resolve("embeddings.parquet").toString)
    val half = dir.resolve("head").toString
    val full = cat.table("embeddings")
    val n = full.count()
    full.filter(col("vec_id") < n / 2).write.parquet(half)
    val rest = dir.resolve("rest").toString
    full.filter(col("vec_id") >= n / 2).write.parquet(rest)
    cat.registerTable("emb_half", half)
    engine.execute("vindex create where table = emb_half " +
      s"and path = $p and id = vec_id and vector = embedding " +
      "and type = pq and numsub = 4 and ksub = 8")
    engine.execute(
      s"vindex refresh where table = emb_half and source = $rest")
    // the folded artifact covers the whole corpus, codes from the
    // half-trained books (fold == encode-all with those books)
    val idx = graft.ops.IndexStore.read(spark, p).get
    val books = Similarity.pqIndexBooks(idx)
    val expect = Similarity.pqEncode(full, books, "embedding", "vec_id",
      numSub = 4)
    assert(idx.filter(col("role") === "code")
        .select("id", "sub", "code").collect().map(_.toString).sorted
      === expect.select("id", "sub", "code")
        .collect().map(_.toString).sorted)
    // a fresh engine attaches from the artifact alone (numsub recovered)
    val engine2 = new Engine(spark, cat)
    val att = engine2.execute("vindex attach where table = emb_half " +
      s"and path = $p and type = pq and id = vec_id and vector = embedding")
    assert(att.contains("numsub=4"))
    val probes = dir.resolve("probes2").toString
    full.filter(col("vec_id") < 2).write.parquet(probes)
    assert(engine2.execute("vindex search where table = emb_half " +
        s"and probes = $probes and k = 2")
      === { val e = new Engine(spark, cat)
            e.execute("vindex attach where table = emb_half " +
              s"and path = $p and type = pq and id = vec_id " +
              "and vector = embedding")
            e.execute("vindex search where table = emb_half " +
              s"and probes = $probes and k = 2") })
  }

  test("vindex create/search (ivf): nprobe=cells equals library " +
      "exhaustive search; format = table renders") {
    val (cat, engine, dir) = staged()
    val p = dir.resolve("ivfidx").toString
    engine.execute("vindex create where table = embeddings " +
      s"and path = $p and id = vec_id and vector = embedding " +
      "and type = ivf and cells = 4")
    val probes = dir.resolve("probes3").toString
    cat.table("embeddings").filter(col("vec_id") < 3)
      .write.parquet(probes)
    val reply = engine.execute("vindex search where table = embeddings " +
      s"and probes = $probes and k = 2 and nprobe = 4 and format = table")
    val idx = graft.ops.IndexStore.read(spark, p).get
    val expect = Similarity.ivfSearchIndex(idx,
      spark.read.parquet(probes), "embedding", "vec_id", k = 2, nprobe = 4)
    assert(expect.count() === 6)
    expect.select("id").collect().foreach(r =>
      assert(reply.contains(r.getAs[Long]("id").toString)))
  }

  test("vindex negatives: filtered ANN serves hard negatives (label-" +
      "filtered, oversample-then-rerank) == library compose at " +
      "exhaustive nprobe") {
    val (cat, engine, dir) = staged()
    val p = dir.resolve("negidx").toString
    engine.execute("vindex create where table = embeddings " +
      s"and path = $p and id = vec_id and vector = embedding " +
      "and type = ivf and cells = 4")
    val probes = dir.resolve("probesNeg").toString
    cat.table("embeddings").filter(col("vec_id") < 3)
      .write.parquet(probes)
    val reply = engine.execute("vindex negatives where table = " +
      s"embeddings and probes = $probes and k = 2 and label = label " +
      "and oversample = 8 and nprobe = 4")
    // library compose: exhaustive search at k*oversample, label join,
    // same-label drop, re-rank, top-k
    val idx = graft.ops.IndexStore.read(spark, p).get
    val pf = spark.read.parquet(probes)
    val labels = cat.table("embeddings")
      .select(col("vec_id").as("id"), col("label").as("neg_label"))
    val plabels = pf.select(col("vec_id").as("q_id"),
      col("label").as("q_label"))
    val expect = Similarity.ivfSearchIndex(idx, pf, "embedding",
        "vec_id", k = 16, nprobe = 4)
      .join(labels, "id").join(plabels, "q_id")
      .filter(col("neg_label") =!= col("q_label"))
      .withColumn("neg_rank", org.apache.spark.sql.functions.row_number()
        .over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("q_id")).orderBy(col("rank"))))
      .filter(col("neg_rank") <= 2)
    assert(expect.count() === 6) // 3 probes x 2 negatives
    expect.select("q_id", "id", "neg_label", "q_label").collect()
      .foreach { r =>
        assert(r.getAs[Int]("neg_label") !== r.getAs[Int]("q_label"))
        assert(reply.contains(s""""id":${r.getAs[Long]("id")}"""))
      }
  }
}

class TIndexCommandSpec extends SparkSpec {
  import graft.engine.{Catalog, Engine}
  import graft.ops.Retrieval

  private def staged(): (Catalog, Engine, java.nio.file.Path) = {
    val dir = java.nio.file.Files.createTempDirectory("tindex")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/documents.parquet"),
      dir.resolve("documents.parquet"))
    val cat = new Catalog(spark)
    cat.registerTable("documents",
      dir.resolve("documents.parquet").toString)
    val engine = new Engine(spark, cat)
    (cat, engine, dir)
  }

  test("tindex create/search: command BM25 serve == library serve; " +
      "get tindexes lists it; drop unregisters") {
    val (cat, engine, dir) = staged()
    val p = dir.resolve("postidx").toString
    val out = engine.execute("tindex create where table = documents " +
      s"and path = $p and id = doc_id and text = text")
    assert(out.contains("created"))
    assert(engine.execute("get tindexes")
      .contains("documents: id=doc_id text=text"))
    val probes = dir.resolve("probes").toString
    cat.table("documents").filter(col("doc_id") < 3).write.parquet(probes)
    val reply = engine.execute("tindex search where table = documents " +
      s"and probes = $probes and k = 3")
    val idx = graft.ops.IndexStore.read(spark, p).get
    val expect = Retrieval.bm25TopK(idx, spark.read.parquet(probes),
      "text", "doc_id", k = 3)
    expect.collect().foreach { r =>
      assert(reply.contains(s""""id":${r.getAs[Long]("id")}"""),
        s"missing hit ${r.getAs[Long]("id")} in $reply")
    }
    assert(engine.execute("tindex drop where table = documents")
      .contains("dropped"))
    intercept[IllegalArgumentException](engine.execute(
      s"tindex search where table = documents and probes = $probes and k = 3"))
  }

  test("tindex delete tombstones doc ids: artifact == rebuild over " +
      "survivors, BM25 stats shift, trigram sidecar forgets too") {
    val (cat, engine, dir) = staged()
    val p = dir.resolve("postdel").toString
    engine.execute("tindex create where table = documents " +
      s"and path = $p and id = doc_id and text = text and grams = true")
    val out = engine.execute("tindex delete where table = documents " +
      "and ids = (1, 2, 3, 4, 5, 6, 7, 8, 9, 10)")
    assert(out.contains("deleted"), out)
    assert(out.contains("trigram sidecar"), out)
    val full = cat.table("documents")
    val survivors = full.filter(!col("doc_id").isin((1L to 10L): _*))
    // postings artifact == from-scratch build over the survivors
    val idx = graft.ops.IndexStore.read(spark, p).get
    val rebuilt = Retrieval.postingsIndex(survivors, "text", "doc_id")
    assert(idx.exceptAll(rebuilt).count() === 0)
    assert(rebuilt.exceptAll(idx).count() === 0)
    // trigram sidecar forgot the same ids (doc 0 legitimately stays)
    val grams = graft.ops.IndexStore.read(spark, s"$p-grams").get
    assert(grams.filter(col("id").between(1L, 10L)).count() === 0)
    assert(grams.filter(col("id") === 0L).count() > 0)
    // a deleted doc can still QUERY but never be retrieved
    val probes = dir.resolve("probes").toString
    full.filter(col("doc_id").isin(2L, 3L)).write.parquet(probes)
    val reply = engine.execute("tindex search where table = documents " +
      s"and probes = $probes and k = 3")
    val hits = Retrieval.bm25TopK(idx, spark.read.parquet(probes),
      "text", "doc_id", k = 3).collect()
    assert(hits.nonEmpty)
    assert(hits.forall(r => r.getAs[Long]("id") > 10L))
    hits.foreach { r =>
      assert(reply.contains(s""""id":${r.getAs[Long]("id")}"""),
        s"missing hit ${r.getAs[Long]("id")} in $reply")
    }
  }

  test("tindex refresh folds a batch (fold == rebuild), phrase serves " +
      "from position lists, attach re-registers from the artifact") {
    val (cat, engine, dir) = staged()
    val p = dir.resolve("postidx2").toString
    val full = cat.table("documents")
    val head = dir.resolve("head").toString
    val rest = dir.resolve("rest").toString
    full.filter(col("doc_id") < 100).write.parquet(head)
    full.filter(col("doc_id") >= 100).write.parquet(rest)
    cat.registerTable("docs_head", head)
    engine.execute("tindex create where table = docs_head " +
      s"and path = $p and id = doc_id and text = text")
    engine.execute("tindex refresh where table = docs_head " +
      s"and source = $rest")
    // folded artifact == whole-corpus rebuild
    val idx = graft.ops.IndexStore.read(spark, p).get
    val rebuilt = Retrieval.postingsIndex(full, "text", "doc_id")
    assert(idx.exceptAll(rebuilt).count() === 0)
    assert(rebuilt.exceptAll(idx).count() === 0)
    // phrase command == library phraseMatch on the most frequent bigram
    val pr = Retrieval.positionRows(idx)
    val top = pr.as("a").join(pr.as("b"),
        col("a.id") === col("b.id") && col("b.p") === col("a.p") + 1)
      .groupBy(col("a.term").as("w1"), col("b.term").as("w2"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("w1"), col("w2")).limit(1).head()
    val (w1, w2) = (top.getString(0), top.getString(1))
    val reply = engine.execute("tindex phrase where table = docs_head " +
      s"and w1 = $w1 and w2 = $w2")
    val expect = Retrieval.phraseMatch(idx,
      spark.range(1).select(lit(w1).as("w1"), lit(w2).as("w2"))).count()
    assert(expect > 0)
    assert(s""""w1":"$w1"""".r.findAllIn(reply).size === expect)
    // attach on a fresh engine re-serves without re-reading the corpus
    val engine2 = new Engine(spark, cat)
    engine2.execute("tindex attach where table = docs_head " +
      s"and path = $p and id = doc_id and text = text")
    assert(engine2.execute("get tindexes").contains(s"path=$p"))
  }

  test("tindex near/snippet/like: proximity, KWIC windows and " +
      "trigram-accelerated substring search from the command surface") {
    val (cat, engine, dir) = staged()
    val p = dir.resolve("postidx3").toString
    engine.execute("tindex create where table = documents " +
      s"and path = $p and id = doc_id and text = text and grams = true")
    assert(engine.execute("get tindexes").contains("grams=true"))
    val idx = graft.ops.IndexStore.read(spark, p).get
    val pr = Retrieval.positionRows(idx)
    val top = pr.as("a").join(pr.as("b"),
        col("a.id") === col("b.id") && col("b.p") === col("a.p") + 1)
      .groupBy(col("a.term").as("w1"), col("b.term").as("w2"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("w1"), col("w2")).limit(1).head()
    val (w1, w2) = (top.getString(0), top.getString(1))
    // near == library proximityMatch
    val near = engine.execute("tindex near where table = documents " +
      s"and w1 = $w1 and w2 = $w2 and w = 5")
    val expNear = Retrieval.proximityMatch(idx,
      spark.range(1).select(lit(w1).as("w1"), lit(w2).as("w2")),
      w = 5).count()
    assert(expNear > 0)
    assert(s""""id":""".r.findAllIn(near).size === expNear)
    // snippet contains the phrase text itself
    val snip = engine.execute("tindex snippet where table = documents " +
      s"and w1 = $w1 and w2 = $w2 and window = 2")
    assert(snip.contains(s"$w1 $w2"))
    // like == the exact contains() scan
    val like = engine.execute("tindex like where table = documents " +
      s"""and pattern = "$w1 $w2"""")
    val expLike = cat.table("documents")
      .filter(col("text").contains(s"$w1 $w2")).count()
    assert(expLike > 0)
    assert(s""""id":""".r.findAllIn(like).size === expLike)
    // like without the sidecar fails loudly
    val p2 = dir.resolve("postidx4").toString
    cat.registerTable("docs2", dir.resolve("documents.parquet").toString)
    engine.execute("tindex create where table = docs2 " +
      s"and path = $p2 and id = doc_id and text = text")
    intercept[IllegalArgumentException](engine.execute(
      s"""tindex like where table = docs2 and pattern = "$w1 $w2""""))
  }
}

class RpqVIndexCommandSpec extends SparkSpec {
  import graft.engine.{Catalog, Engine}
  import graft.ops.Similarity

  test("vindex type=rpq: create/refresh/search/attach — command serve " +
      "== library residual-ADC serve over the folded artifact") {
    val dir = java.nio.file.Files.createTempDirectory("rpqvindex")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/embeddings.parquet"),
      dir.resolve("embeddings.parquet"))
    val cat = new Catalog(spark)
    val full = spark.read.parquet(dir.resolve("embeddings.parquet").toString)
    val n = full.count()
    val head = dir.resolve("head").toString
    val rest = dir.resolve("rest").toString
    full.filter(col("vec_id") < n / 2).write.parquet(head)
    full.filter(col("vec_id") >= n / 2).write.parquet(rest)
    cat.registerTable("emb_head", head)
    val engine = new Engine(spark, cat)
    val p = dir.resolve("rpqidx").toString
    val out = engine.execute("vindex create where table = emb_head " +
      s"and path = $p and id = vec_id and vector = embedding " +
      "and type = rpq and numsub = 4 and ksub = 8 and cells = 8")
    assert(out.contains("type=rpq"))
    engine.execute("vindex refresh where table = emb_head " +
      s"and source = $rest")
    // folded artifact == library fold of the same split
    val stored = graft.ops.IndexStore.read(spark, p).get
    val expectIdx = Similarity.refreshResidualIvfIndex(
      Similarity.residualIvfIndex(spark.read.parquet(head),
        "embedding", "vec_id", ncells = 8, numSub = 4, ksub = 8),
      spark.read.parquet(rest), "embedding", "vec_id", numSub = 4)
    assert(stored.exceptAll(expectIdx).count() === 0)
    assert(expectIdx.exceptAll(stored).count() === 0)
    // search through the command == library serve
    val probes = dir.resolve("probes").toString
    full.filter(col("vec_id") < 3).write.parquet(probes)
    val reply = engine.execute("vindex search where table = emb_head " +
      s"and probes = $probes and k = 2 and nprobe = 2")
    val expect = Similarity.searchResidualIndex(stored,
      spark.read.parquet(probes), "embedding", "vec_id", k = 2,
      nprobe = 2, numSub = 4)
    expect.collect().foreach { r =>
      assert(reply.contains(s""""id":${r.getAs[Long]("id")}"""),
        s"missing neighbor ${r.getAs[Long]("id")} in $reply")
    }
    // attach recovers numsub from the fine books
    val engine2 = new Engine(spark, cat)
    val att = engine2.execute("vindex attach where table = emb_head " +
      s"and path = $p and type = rpq and id = vec_id " +
      "and vector = embedding")
    assert(att.contains("numsub=4"))
  }
}

class HybridSearchCommandSpec extends SparkSpec {
  import graft.engine.{Catalog, Engine}
  import graft.ops.{Retrieval, Similarity}

  test("hybrid search fuses the registered tindex (BM25) and vindex " +
      "(SQ8) legs — command == library rrfFuse composition") {
    val dir = java.nio.file.Files.createTempDirectory("hybrid")
    // one table carrying text AND embedding (ids align by construction)
    val joined = spark.read.parquet(s"$sfDir/documents.parquet")
      .join(spark.read.parquet(s"$sfDir/embeddings.parquet"),
        col("doc_id") === col("vec_id"))
      .select(col("doc_id"), col("text"), col("embedding"))
    val tablePath = dir.resolve("corpus").toString
    joined.write.parquet(tablePath)
    val cat = new Catalog(spark)
    cat.registerTable("corpus", tablePath)
    val engine = new Engine(spark, cat)
    val tp = dir.resolve("tidx").toString
    val vp = dir.resolve("vidx").toString
    engine.execute("tindex create where table = corpus " +
      s"and path = $tp and id = doc_id and text = text")
    engine.execute("vindex create where table = corpus " +
      s"and path = $vp and id = doc_id and vector = embedding " +
      "and type = sq8")
    val probes = dir.resolve("probes").toString
    joined.filter(col("doc_id") < 3).write.parquet(probes)
    val reply = engine.execute("hybrid search where table = corpus " +
      s"and probes = $probes and k = 3")
    // library composition over the same artifacts
    val tstored = graft.ops.IndexStore.read(spark, tp).get
    val vstored = graft.ops.IndexStore.read(spark, vp).get
    val pdf = spark.read.parquet(probes)
    val expect = Retrieval.rrfFuse(
      Retrieval.bm25TopK(tstored, pdf, "text", "doc_id", 6)
        .select(col("q_id"), col("rank"), col("id")),
      Similarity.sq8SearchIndex(vstored, pdf, "embedding", "doc_id", 6)
        .select(col("q_id"), col("rank"), col("id")),
      k = 3).collect()
    assert(expect.nonEmpty)
    expect.foreach { r =>
      assert(reply.contains(
        s""""rrf_q":${r.getAs[Long]("rrf_q")}"""),
        s"missing fused score ${r.getAs[Long]("rrf_q")} in $reply")
    }
    // without a vindex the command refuses loudly
    cat.registerTable("corpus2", tablePath)
    engine.execute("tindex create where table = corpus2 " +
      s"and path = ${dir.resolve("t2")} and id = doc_id and text = text")
    intercept[IllegalArgumentException](engine.execute(
      s"hybrid search where table = corpus2 and probes = $probes and k = 3"))
  }
}

class SIndexCommandSpec extends SparkSpec {
  import graft.engine.{Catalog, Engine}
  import graft.ops.Sketches

  private def staged(): (Catalog, Engine, java.nio.file.Path) = {
    val dir = java.nio.file.Files.createTempDirectory("sindex")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/documents.parquet"),
      dir.resolve("documents.parquet"))
    val cat = new Catalog(spark)
    cat.registerTable("documents",
      dir.resolve("documents.parquet").toString)
    val engine = new Engine(spark, cat)
    (cat, engine, dir)
  }

  private def libSketches(df: org.apache.spark.sql.DataFrame, k: Int) =
    Sketches.kmvKeyed(
      df.select(col("source"),
          explode(graft.ops.TextOps.shingleHashes(col("text"), 3))
            .as("h0"))
        .select(col("source"), Sketches.avalanche31(col("h0")).as("h")),
      "source", "h", k)

  test("sindex create/estimate/overlap: command serve == library KMV " +
      "algebra; get sindexes lists it; drop unregisters") {
    val (cat, engine, dir) = staged()
    val p = dir.resolve("kmvidx").toString
    val out = engine.execute("sindex create where table = documents " +
      s"and key = source and text = text and k = 32 and path = $p")
    assert(out.contains("created"))
    assert(engine.execute("get sindexes")
      .contains("documents: key=source text=text k=32"))
    // estimate == library kmvDistinctEst over the artifact
    val lib = libSketches(cat.table("documents"), 32)
      .select(col("key"), Sketches.kmvDistinctEst(col("sk"), 32)
        .as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val reply = engine.execute("sindex estimate where table = documents")
    lib.foreach { case (key, est) =>
      assert(reply.contains(s""""key":"$key""""))
      assert(reply.contains(s""""kmv_est":$est"""),
        s"estimate for $key should be $est in $reply")
    }
    // overlap: the top pair matches the library jaccard on sketches
    val ov = engine.execute(
      "sindex overlap where table = documents and k = 3")
    assert(ov.contains("\"jacc_ppm\"") && ov.contains("\"union_est\""))
    assert(engine.execute("sindex drop where table = documents")
      .contains("dropped"))
    intercept[IllegalArgumentException](engine.execute(
      "sindex estimate where table = documents"))
  }

  test("sindex refresh folds by bottom-k union (fold == rebuild); " +
      "attach re-registers from the artifact alone") {
    val (cat, engine, dir) = staged()
    val p = dir.resolve("kmvidx2").toString
    val full = cat.table("documents")
    val head = dir.resolve("head").toString
    val rest = dir.resolve("rest").toString
    full.filter(col("doc_id") < 30).write.parquet(head)
    full.filter(col("doc_id") >= 30).write.parquet(rest)
    cat.registerTable("docs_head", head)
    engine.execute("sindex create where table = docs_head " +
      s"and key = source and text = text and k = 32 and path = $p")
    engine.execute("sindex refresh where table = docs_head " +
      s"and source = $rest")
    val idx = graft.ops.IndexStore.read(spark, p).get
    val rebuilt = libSketches(full, 32)
    assert(idx.exceptAll(rebuilt).count() === 0)
    assert(rebuilt.exceptAll(idx).count() === 0)
    // attach on a fresh engine serves without the corpus
    val engine2 = new Engine(spark, cat)
    engine2.execute(s"sindex attach where table = anything and path = $p " +
      "and key = source and text = text and k = 32")
    assert(engine2.execute("sindex estimate where table = anything")
      .contains("\"kmv_est\""))
  }
}

class LayoutCommandSpec extends SparkSpec {
  import graft.engine.{Catalog, Engine}

  test("layout zorder/scan: command pruning receipt == library " +
      "candidateBuckets; get layouts lists it; drop unregisters") {
    val dir = java.nio.file.Files.createTempDirectory("laycmd")
    // int64 view of events (ts cast to epoch ms)
    graft.engine.Tables.load(spark, sfDir, "events")
      .select(col("event_id"), col("user_id").as("u"),
        expr("unix_micros(ts) div 1000").as("tm"))
      .write.parquet(dir.resolve("ev").toString)
    val cat = new Catalog(spark)
    cat.registerTable("ev", dir.resolve("ev").toString)
    val engine = new Engine(spark, cat)
    val p = dir.resolve("zorder").toString
    val out = engine.execute("layout zorder where table = ev and x = u " +
      s"and y = tm and path = $p and bits = 10 and buckets = 64")
    assert(out.contains("written"))
    assert(engine.execute("get layouts").contains("ev: x=u y=tm bits=10"))
    val reply = engine.execute("layout scan where table = ev and " +
      "x0 = 256 and x1 = 511 and y0 = 256 and y1 = 511")
    val cands = graft.ops.Layout.candidateBuckets(256, 511, 256, 511,
      10, 64)
    assert(reply.contains(s""""buckets_scanned":${cands.length}"""),
      s"expected ${cands.length} candidate quads in $reply")
    assert(reply.contains(""""buckets_total":64"""))
    // matching rows == unpruned exact filter over the written copy
    val full = spark.read.parquet(p)
      .filter(col("zq_x").between(256, 511) &&
        col("zq_y").between(256, 511)).count()
    assert(reply.contains(s""""rows_matching":$full"""), reply)
    assert(engine.execute("layout drop where table = ev")
      .contains("dropped"))
    intercept[IllegalArgumentException](engine.execute(
      "layout scan where table = ev and x0 = 0 and x1 = 1 and y0 = 0 " +
        "and y1 = 1"))
  }
}

class GraphCommandSpec extends SparkSpec {
  import graft.engine.{Catalog, Engine}

  private def staged(): (Catalog, Engine, java.nio.file.Path) = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graphcmd")
    // symmetric ring 1..6 + chord triangle 1-2-4 (via 1-4, 2-4)
    val one = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L),
      (6L, 1L), (1L, 4L), (2L, 4L))
    val sym = one ++ one.map { case (a, b) => (b, a) }
    sym.toDF("u", "v").write.parquet(dir.resolve("edges").toString)
    val cat = new Catalog(spark)
    cat.registerTable("edges", dir.resolve("edges").toString)
    Seq(1L).toDF("n").write.parquet(dir.resolve("seeds").toString)
    cat.registerTable("seeds", dir.resolve("seeds").toString)
    (cat, new Engine(spark, cat), dir)
  }

  test("graph pagerank/ppr/components/triangles/kcore serve the " +
      "library results over a registered edge table") {
    val (cat, engine, _) = staged()
    val pr = engine.execute("graph pagerank where edges = edges and " +
      "src = u and dst = v and iters = 3")
    assert(pr.contains("\"rank_q\""))
    val lib = graft.ops.Graph.pageRank(cat.table("edges")
        .select(col("u").as("src"), col("v").as("dst")), 3)
      .orderBy(col("rank_q").desc, col("node")).limit(1).head()
    assert(pr.contains(s""""node":${lib.getLong(0)},"rank_q":${lib.getLong(1)}""") ||
      pr.contains(s""""rank_q":${lib.getLong(1)}"""), pr)
    val ppr = engine.execute("graph ppr where edges = edges and src = u " +
      "and dst = v and seeds = seeds and seedcol = n and iters = 3")
    assert(ppr.contains("\"rank_q\""))
    val cc = engine.execute("graph components where edges = edges and " +
      "src = u and dst = v")
    assert(cc.contains(""""label":1"""))
    val tri = engine.execute("graph triangles where edges = edges and " +
      "src = u and dst = v")
    assert(tri.contains(""""x":1,"y":2,"z":4"""), tri)
    val core = engine.execute("graph kcore where edges = edges and " +
      "src = u and dst = v and k = 2")
    assert(core.contains("\"core_deg\""))
    intercept[IllegalArgumentException](engine.execute(
      "graph louvain where edges = edges and src = u and dst = v"))
  }
}

class MonitorCommandSpec extends SparkSpec {
  import graft.engine.{Catalog, Engine}

  test("monitor create/refresh/level: standing CUSUM state through the " +
      "command surface, fold == rebuild, out-of-order refresh throws") {
    val dir = java.nio.file.Files.createTempDirectory("moncmd")
    val ev = graft.engine.Tables.load(spark, sfDir, "events")
    val cut = ev.agg(expr("percentile_approx(unix_micros(ts), 0.5)"))
      .head().getLong(0)
    val head = dir.resolve("head").toString
    val tail = dir.resolve("tail").toString
    ev.filter(expr(s"unix_micros(ts) <= $cut")).write.parquet(head)
    ev.filter(expr(s"unix_micros(ts) > $cut")).write.parquet(tail)
    val cat = new Catalog(spark)
    cat.registerTable("ev_head", head)
    val engine = new Engine(spark, cat)
    val p = dir.resolve("mon").toString
    val out = engine.execute("monitor create where table = ev_head " +
      s"and key = event_type and ts = ts and path = $p")
    assert(out.contains("created"))
    assert(engine.execute("get monitors").contains("ev_head: " +
      "key=event_type ts=ts"))
    engine.execute(s"monitor refresh where table = ev_head and " +
      s"source = $tail")
    // folded state == rebuild over the whole history with frozen k
    val k = graft.ops.IndexStore.read(spark, p).get
      .select(col("etype"), col("k100"))
    val whole = ev.select(col("event_type").as("etype"),
        expr("unix_micros(ts) div 60000000").as("m"))
      .groupBy("etype", "m").agg(count(lit(1)).as("x"))
    val rebuilt = graft.streaming.StreamOps.cusumRebuild(whole, k)
      .collect().map(_.toString).sorted.toSeq
    val stored = graft.ops.IndexStore.read(spark, p).get
      .collect().map(_.toString).sorted.toSeq
    assert(stored === rebuilt)
    // serving
    val lvl = engine.execute("monitor level where table = ev_head")
    assert(lvl.contains("\"level\""))
    // replaying the SAME batch is out-of-order -> throws
    intercept[IllegalArgumentException](engine.execute(
      s"monitor refresh where table = ev_head and source = $tail"))
    assert(engine.execute("monitor drop where table = ev_head")
      .contains("dropped"))
  }
}

class CompactMergeCommandSpec extends SparkSpec {
  import graft.engine.{Catalog, Engine}
  import spark.implicits._

  test("compact: many small files rewrite into few, row-identical, " +
      "table stays queryable") {
    val dir = java.nio.file.Files.createTempDirectory("compact")
    val p = dir.resolve("t").toString
    (1 to 500).map(i => (i.toLong, s"row_$i")).toDF("id", "v")
      .repartition(64).write.parquet(p) // 64 tiny files
    val cat = new Catalog(spark)
    cat.registerTable("t", p)
    val engine = new Engine(spark, cat)
    val before = spark.read.parquet(p)
      .collect().map(_.toString).sorted.toSeq
    val out = engine.execute("compact where table = t and target_mb = 64")
    assert(out.contains("64 files -> 1"), out)
    val after = spark.read.parquet(p)
    assert(after.collect().map(_.toString).sorted.toSeq === before)
    assert(after.inputFiles.length === 1)
  }

  test("compact sort = <col>: range-clustered rewrite is " +
      "row-identical and every output file covers a disjoint narrow " +
      "slice of the sort key (zone-map skipping)") {
    val dir = java.nio.file.Files.createTempDirectory("compactsort")
    val p = dir.resolve("t").toString
    // shuffled ids so the unsorted layout interleaves ranges everywhere;
    // enough bytes that target_mb = 1 yields several output files
    val rnd = new scala.util.Random(7)
    rnd.shuffle((1 to 200000).toVector)
      .map(i => (i.toLong, s"row_${i}_${"x" * 40}"))
      .toDF("id", "v").repartition(16).write.parquet(p)
    val cat = new Catalog(spark)
    cat.registerTable("t", p)
    val engine = new Engine(spark, cat)
    val before = spark.read.parquet(p)
      .collect().map(_.toString).sorted.toSeq
    val out = engine.execute(
      "compact where table = t and target_mb = 1 and sort = id")
    assert(out.contains("range-clustered on id"), out)
    val after = spark.read.parquet(p)
    assert(after.collect().map(_.toString).sorted.toSeq === before)
    // per-file min/max ranges must be disjoint (that IS the skipping
    // property: a selective predicate matches at most one file's range)
    import org.apache.spark.sql.functions.{min => fmin, max => fmax,
      input_file_name}
    val ranges = after.groupBy(input_file_name().as("f"))
      .agg(fmin("id").as("lo"), fmax("id").as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(ranges.length > 1, "expected multiple output files")
    ranges.sliding(2).foreach { case Array((_, hi1), (lo2, _)) =>
      assert(hi1 < lo2, s"overlapping file ranges: $hi1 >= $lo2")
    case _ => }
  }

  test("merge into: SCD1 upsert — source wins on key, unmatched " +
      "target survives, receipt counts updates vs inserts") {
    val dir = java.nio.file.Files.createTempDirectory("merge")
    val p = dir.resolve("tgt").toString
    Seq((1L, "old1"), (2L, "old2"), (3L, "old3")).toDF("id", "v")
      .write.parquet(p)
    val srcP = dir.resolve("src").toString
    Seq((2L, "NEW2"), (4L, "NEW4")).toDF("id", "v").write.parquet(srcP)
    val cat = new Catalog(spark)
    cat.registerTable("tgt", p)
    val engine = new Engine(spark, cat)
    val out = engine.execute(s"merge into tgt using $srcP on id")
    assert(out.contains("1 updated") && out.contains("1 inserted"), out)
    val rows = spark.read.parquet(p).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows === Map(1L -> "old1", 2L -> "NEW2", 3L -> "old3",
      4L -> "NEW4"))
  }
}

class Scd2Spec extends SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions.col

  test("merge scd2: closes current rows, chains in-batch versions, " +
      "preserves full history, point-in-time query works") {
    val dir = java.nio.file.Files.createTempDirectory("scd2")
    Seq((1L, "alice", "NY"), (2L, "bob", "LA"))
      .toDF("id", "name", "city")
      .write.parquet(dir.resolve("dim.parquet").toString)
    // batch: alice moves twice (chained), carol appears
    Seq(
      (1L, "alice", "SF", java.sql.Timestamp.valueOf("2024-02-01 00:00:00")),
      (1L, "alice", "TX", java.sql.Timestamp.valueOf("2024-03-01 00:00:00")),
      (3L, "carol", "OR", java.sql.Timestamp.valueOf("2024-02-15 00:00:00")))
      .toDF("id", "name", "city", "ts")
      .write.parquet(dir.resolve("batch.parquet").toString)
    val cat = new graft.engine.Catalog(spark)
    cat.registerTable("dim", dir.resolve("dim.parquet").toString)
    val engine = new graft.engine.Engine(spark, cat)
    val out = engine.execute(s"merge scd2 into dim using " +
      s"${dir.resolve("batch.parquet")} on id at ts")
    assert(out.contains("1 keys versioned"), out)    // only alice existed
    assert(out.contains("3 rows appended"), out)
    val dim = cat.table("dim")
    assert(dim.count() === 5L) // 2 original + 3 batch versions
    // alice: NY (closed at 02-01) -> SF (closed at 03-01) -> TX current
    val alice = dim.filter(col("id") === 1L)
      .orderBy(col("valid_from").asc_nulls_first)
      .collect().map(r => (r.getAs[String]("city"),
        r.getAs[Boolean]("is_current")))
    assert(alice.toSeq === Seq(("NY", false), ("SF", false),
      ("TX", true)))
    // bob untouched and current; carol current
    assert(dim.filter(col("id") === 2L && col("is_current")).count() === 1)
    assert(dim.filter(col("id") === 3L && col("is_current")).count() === 1)
    // point-in-time: who lived where on 2024-02-20?
    val at = dim.filter(
      (col("valid_from").isNull ||
        col("valid_from") <= "2024-02-20") &&
      (col("valid_to").isNull || col("valid_to") > "2024-02-20"))
      .select("id", "city").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(at === Map(1L -> "SF", 2L -> "LA", 3L -> "OR"))
    // a second merge on an ALREADY-scd2 table composes
    Seq((2L, "bob", "WA", java.sql.Timestamp.valueOf("2024-04-01 00:00:00")))
      .toDF("id", "name", "city", "ts")
      .write.parquet(dir.resolve("b2.parquet").toString)
    val out2 = engine.execute(s"merge scd2 into dim using " +
      s"${dir.resolve("b2.parquet")} on id at ts")
    assert(out2.contains("1 keys versioned"), out2)
    assert(cat.table("dim").count() === 6L)
    assert(cat.table("dim")
      .filter(col("id") === 2L && col("is_current"))
      .select("city").head().getString(0) === "WA")
  }

  test("merge scd2 rejects duplicate (key, ts) batch rows loudly — " +
      "same-instant changes have no deterministic chain order") {
    val dir = java.nio.file.Files.createTempDirectory("scd2dup")
    Seq((1L, "alice", "NY")).toDF("id", "name", "city")
      .write.parquet(dir.resolve("dim.parquet").toString)
    Seq(
      (1L, "alice", "SF", java.sql.Timestamp.valueOf("2024-02-01 00:00:00")),
      (1L, "alice", "TX", java.sql.Timestamp.valueOf("2024-02-01 00:00:00")))
      .toDF("id", "name", "city", "ts")
      .write.parquet(dir.resolve("batch.parquet").toString)
    val cat = new graft.engine.Catalog(spark)
    cat.registerTable("dim", dir.resolve("dim.parquet").toString)
    val engine = new graft.engine.Engine(spark, cat)
    val err = intercept[IllegalArgumentException] {
      engine.execute(s"merge scd2 into dim using " +
        s"${dir.resolve("batch.parquet")} on id at ts")
    }
    assert(err.getMessage.contains("duplicate"), err.getMessage)
    // target untouched by the rejected merge
    assert(cat.table("dim").count() === 1L)
  }
}

class MatViewServeSpec extends SparkSpec {
  import org.apache.spark.sql.functions.col

  private def staged(): (graft.engine.Catalog, graft.engine.Engine,
      java.nio.file.Path) = {
    val dir = java.nio.file.Files.createTempDirectory("mvserve")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/lineitem.parquet"),
      dir.resolve("lineitem.parquet"))
    val cat = new graft.engine.Catalog(spark)
    cat.registerTable("lineitem", dir.resolve("lineitem.parquet").toString)
    val engine = new graft.engine.Engine(spark, cat)
    (cat, engine, dir)
  }

  test("qualified GROUP BY serves from the matview state (schema- and " +
      "value-identical to the base plan, base files untouched); " +
      "unqualified queries fall back") {
    val (_, engine, dir) = staged()
    val p = dir.resolve("mv").toString
    engine.execute(s"matview create where table = lineitem and " +
      s"""path = $p and spec = {"keys":
        ["l_returnflag", "l_linestatus"], "aggs": [
        {"fn": "count", "alias": "n"},
        {"fn": "sum", "expr": "cast(l_quantity as decimal(18,2))",
         "alias": "sq"},
        {"fn": "min", "expr": "l_quantity", "alias": "mn"},
        {"fn": "max", "expr": "l_quantity", "alias": "mx"}]}""")
    val q = """sql edge "select l_returnflag, count(*),
      sum(l_quantity) as sq, max(l_quantity) as mx from lineitem
      where l_returnflag = 'R' or l_returnflag = 'A'
      group by l_returnflag order by l_returnflag""""
        .replaceAll("\n\\s*", " ")
    val served = engine.query(q)
    // base plan from an engine with NO matview registered
    val (_, plain, _) = staged()
    val base = plain.query(q)
    assert(served.columns.toSeq === base.columns.toSeq)
    assert(served.collect().toSeq === base.collect().toSeq)
    // the served plan reads the artifact, never the base parquet
    val plan = served.queryExecution.executedPlan.toString
    assert(!plan.contains("lineitem.parquet"), plan)
    assert(plan.contains("mv"), plan)
    // subset grouping (coarser than recorded keys) also serves
    val q2 = """sql edge "select l_linestatus, count(*) from lineitem
      group by l_linestatus order by l_linestatus""""
        .replaceAll("\n\\s*", " ")
    val served2 = engine.query(q2)
    assert(!served2.queryExecution.executedPlan.toString
      .contains("lineitem.parquet"))
    assert(served2.collect().toSeq === plain.query(q2).collect().toSeq)
    // avg is NOT served from THIS view — it lacks the null-sensitive
    // count(l_quantity) the exact decomposition needs (count(*) would
    // diverge on NULLs) -> base plan, still correct
    val q3 = """sql edge "select l_returnflag, avg(l_quantity) as a
      from lineitem group by l_returnflag order by l_returnflag""""
        .replaceAll("\n\\s*", " ")
    assert(engine.query(q3).queryExecution.executedPlan.toString
      .contains("lineitem.parquet"))
    // WHERE over a VALUE column is not servable -> base plan
    val q4 = """sql edge "select l_returnflag, count(*) from lineitem
      where l_quantity > 10 group by l_returnflag""""
        .replaceAll("\n\\s*", " ")
    assert(engine.query(q4).queryExecution.executedPlan.toString
      .contains("lineitem.parquet"))
  }

  test("avg / count(col) / HAVING serve from a view recording the " +
      "(decimal sum, non-null count) pair — bit-equal to the base " +
      "plan; HAVING over non-output identifiers falls back") {
    val (_, engine, dir) = staged()
    val p = dir.resolve("mvavg").toString
    engine.execute(s"matview create where table = lineitem and " +
      s"""path = $p and spec = {"keys":
        ["l_returnflag", "l_linestatus"], "aggs": [
        {"fn": "count", "alias": "n"},
        {"fn": "count", "expr": "l_quantity", "alias": "nq"},
        {"fn": "sum", "expr": "cast(l_quantity as decimal(18,2))",
         "alias": "sq"}]}""")
    val q = """sql edge "select l_returnflag, avg(l_quantity) as aq,
      count(l_quantity) as nq, count(*) as n from lineitem
      group by l_returnflag having aq > 25.4 order by l_returnflag""""
        .replaceAll("\n\\s*", " ")
    val served = engine.query(q)
    val (_, plain, _) = staged()
    val base = plain.query(q)
    assert(served.columns.toSeq === base.columns.toSeq)
    // === on doubles: bit-equality of the served decomposition
    assert(served.collect().toSeq === base.collect().toSeq)
    val plan = served.queryExecution.executedPlan.toString
    assert(!plan.contains("lineitem.parquet"), plan)
    // HAVING actually filtered: fewer groups than the unfiltered set
    val qAll = """sql edge "select l_returnflag, avg(l_quantity) as aq
      from lineitem group by l_returnflag""""
        .replaceAll("\n\\s*", " ")
    assert(served.count() < engine.query(qAll).count())
    // HAVING containing an identifier that is NOT an output column
    // (here the function name abs) -> conservative serve declines,
    // base plan answers it correctly
    val qBad = """sql edge "select l_returnflag, count(*) as n
      from lineitem group by l_returnflag having abs(n) > 10""""
        .replaceAll("\n\\s*", " ")
    val bad = engine.query(qBad)
    assert(bad.queryExecution.sparkPlan.toString
      .contains("lineitem.parquet"))
    assert(bad.collect().toSeq === plain.query(qBad).collect().toSeq)
  }
}
