package graft

import org.apache.spark.sql.functions._

/** `connect dbms ... type = jdbc` — the §2.1 PI/OLEDB connector row's
  * modern seam (SURVEY: "JDBC source if ever";
  * dbms/oledb_dbms.py:64-76 is a dialect tweak on a remote cursor).
  * Driven against a LIVE embedded Derby engine (ships with Spark), so
  * the wire, type mapping, pushdown and parallel-cursor behavior are
  * real, not mocked. */
class JdbcSourceSpec extends SparkSpec {
  import graft.engine.{Catalog, Engine}

  private def derby(nRows: Int): (String, java.nio.file.Path) = {
    val root = java.nio.file.Files.createTempDirectory("jdbcspec")
    if (System.getProperty("derby.system.home") == null)
      System.setProperty("derby.system.home", root.toString)
    val url = s"jdbc:derby:$root/db;create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.executeUpdate("CREATE TABLE m (k INT, grp VARCHAR(8), v BIGINT)")
      val ps = conn.prepareStatement("INSERT INTO m VALUES (?, ?, ?)")
      (0 until nRows).foreach { i =>
        ps.setInt(1, i); ps.setString(2, s"g${i % 3}")
        ps.setLong(3, (i * 7 % 100).toLong); ps.addBatch()
      }
      ps.executeBatch()
    } finally conn.close()
    (url, root)
  }

  test("connect dbms registers a foreign table; sql dialect queries " +
      "it; filters and pruning PUSH DOWN to the remote engine") {
    val (url, _) = derby(200)
    val engine = new Engine(spark, new Catalog(spark))
    val reply = engine.execute(
      s"connect dbms rem where type = jdbc and url = $url and dbtable = m")
    assert(reply.contains("dbms rem connected") &&
      reply.contains("3 columns"), reply)
    val df = engine.query(
      """sql edge "select grp, count(*) as n, sum(v) as sv from rem """ +
        """where k >= 50 group by grp order by grp"""")
    val got = df.collect().map(r =>
      (r.getString(0), r.getLong(1))).toSeq
    assert(got.map(_._2).sum === 150L)
    assert(got.map(_._1) === Seq("g0", "g1", "g2"))
    // the filter must reach the REMOTE engine, not run post-transfer,
    // and the scan must read only the referenced columns
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("JDBCRelation"), plan)
    assert(plan.contains("PushedFilters:") &&
      plan.contains("GreaterThanOrEqual(K,50)"), plan)
    assert(!plan.replaceAll("(?s)PushedFilters.*", "").contains("K#") ||
      plan.contains("ReadSchema"), plan)
  }

  test("the partition quadruple issues parallel range-bounded cursors") {
    val (url, _) = derby(100)
    val engine = new Engine(spark, new Catalog(spark))
    engine.execute(s"connect dbms remp where type = jdbc and " +
      s"url = $url and dbtable = m and partition_column = k and " +
      "lower_bound = 0 and upper_bound = 100 and num_partitions = 4")
    val df = engine.catalog.table("remp")
    assert(df.rdd.getNumPartitions === 4)
    assert(df.count() === 100L)
    // an incomplete quadruple is refused loudly, not silently serial
    intercept[IllegalArgumentException](engine.execute(
      s"connect dbms bad where type = jdbc and url = $url and " +
        "dbtable = m and partition_column = k"))
  }

  test("an UNOPTIONED registration auto-derives the parallel-scan " +
      "triple from a one-probe MIN/MAX of the first numeric column: " +
      ">1 range-bounded cursor, same rows") {
    val (url, _) = derby(120)
    val engine = new Engine(spark, new Catalog(spark))
    val reply = engine.execute(s"connect dbms remauto where type = jdbc " +
      s"and url = $url and dbtable = m")
    assert(reply.contains("auto on K"), reply)
    val reg = engine.catalog.jdbcMeta("remauto").get
    assert(reg.options.get("partitionColumn").contains("K"),
      reg.options.toString)
    assert(reg.options("lowerBound") === "0" &&
      reg.options("upperBound") === "119", reg.options.toString)
    val df = engine.catalog.table("remauto")
    assert(df.rdd.getNumPartitions > 1,
      s"auto-derived scan still single-task: ${reg.options}")
    // partition ranges cover the key space exactly once
    assert(df.count() === 120L)
    assert(df.agg(sum("v")).head.getLong(0) ===
      (0 until 120).map(i => (i * 7 % 100).toLong).sum)
    // explicit options always WIN over derivation
    engine.execute(s"connect dbms remexp where type = jdbc and " +
      s"url = $url and dbtable = m and partition_column = k and " +
      "lower_bound = 0 and upper_bound = 120 and num_partitions = 3")
    assert(engine.catalog.table("remexp").rdd.getNumPartitions === 3)
    // a table with NO numeric column falls back to single-cursor
    // (probe failure must not fail the connect)
    val conn = java.sql.DriverManager.getConnection(url)
    try conn.createStatement().executeUpdate(
      "CREATE TABLE strs (s VARCHAR(8))")
    finally conn.close()
    val r2 = engine.execute(s"connect dbms remstr where type = jdbc " +
      s"and url = $url and dbtable = strs")
    assert(r2.contains("single cursor"), r2)
  }

  test("key=value pairs inside the JDBC url are not misread as " +
      "command options") {
    val (url0, _) = derby(5)
    // credentials carried IN the url (the usual managed-DB shape):
    // the command parser must mask the url before option parsing, or
    // `user=app` below would leak into the pass-through options
    val url = url0 + ";user=app;password=secret"
    val engine = new Engine(spark, new Catalog(spark))
    engine.execute(s"connect dbms remu where type = jdbc and " +
      s"url = $url and dbtable = m")
    val reg = engine.catalog.jdbcMeta("remu").get
    assert(reg.url === url)
    assert(!reg.options.contains("user") &&
      !reg.options.contains("password"), reg.options.toString)
    assert(engine.catalog.table("remu").count() === 5L)
  }

  test("a jdbc registration survives an engine restart (catalog " +
      "reload); a password option is never persisted to disk") {
    val (url, _) = derby(10)
    val meta = java.nio.file.Files.createTempDirectory("jdbcmeta")
    val engine = new Engine(spark, new Catalog(spark, Some(meta)))
    engine.execute(s"connect dbms remr where type = jdbc and " +
      s"url = $url and dbtable = m and user = app and password = hunter2")
    // in-memory registration carries the credential for live use...
    assert(engine.catalog.jdbcMeta("remr").get
      .options.get("password").contains("hunter2"))
    // ...but the metadata root must not (plaintext secret on disk)
    val persisted = java.nio.file.Files.readString(
      meta.resolve("jdbc_remr.json"))
    assert(!persisted.contains("hunter2") &&
      !persisted.contains("password"), persisted)
    assert(persisted.contains("\"user\""))
    // fresh catalog from the same metadata root — the reference's
    // startup reload (Derby here needs no auth, so the read works)
    val reborn = new Catalog(spark, Some(meta))
    assert(reborn.tableNames.contains("remr"))
    assert(reborn.table("remr").count() === 10L)
    assert(reborn.jdbcMeta("remr").get.dbtable === "m")
    assert(!reborn.jdbcMeta("remr").get.options.contains("password"))
  }

  test("a jdbc name cannot shadow a registered table, and vice versa") {
    val (url, _) = derby(5)
    val root = java.nio.file.Files.createTempDirectory("jdbcshadow")
    import spark.implicits._
    val p = root.resolve("local.parquet").toString
    Seq((1L, "x")).toDF("k", "v").write.parquet(p)
    val cat = new Catalog(spark)
    cat.registerTable("events_local", p)
    val engine = new Engine(spark, cat)
    intercept[IllegalArgumentException](engine.execute(
      s"connect dbms events_local where type = jdbc and url = $url " +
        "and dbtable = m"))
    // and a parquet registration cannot bury an existing jdbc one
    engine.execute(s"connect dbms remshadow where type = jdbc and " +
      s"url = $url and dbtable = m")
    intercept[IllegalArgumentException](
      cat.registerTable("remshadow", p))
    // no duplicate names in the listing
    assert(cat.tableNames.count(_ == "remshadow") === 1)
    // the invariant is SYMMETRIC for views: table() resolves views
    // first, so a view named like the JDBC (or parquet) table would
    // silently hide it
    intercept[IllegalArgumentException](
      cat.createView("remshadow", "events_local", Seq("k" -> "k")))
    intercept[IllegalArgumentException](
      cat.createView("events_local", "remshadow", Seq("k" -> "k")))
    // re-defining an existing VIEW stays allowed (idempotent replace)
    cat.createView("vw_ok", "events_local", Seq("k" -> "k1"))
    cat.createView("vw_ok", "events_local", Seq("k" -> "k2"))
    assert(cat.table("vw_ok").columns.toSeq === Seq("k2"))
  }

  test("federated include=: ONE dialect query unions a parquet table " +
      "with a JDBC table — both scans keep their own pushdown and the " +
      "union is shuffle-free") {
    val (url, _) = derby(40)
    val root = java.nio.file.Files.createTempDirectory("fedinc")
    import spark.implicits._
    val p = root.resolve("local.parquet").toString
    (100 until 140).map(i => (i, s"g${i % 3}", (i * 3 % 50).toLong))
      .toDF("k", "grp", "v").write.parquet(p)
    val cat = new Catalog(spark)
    cat.registerTable("loc", p)
    val engine = new Engine(spark, cat)
    engine.execute(s"connect dbms remfed where type = jdbc and " +
      s"url = $url and dbtable = m")
    val df = engine.query(
      """sql edge include = (remfed) "select grp, count(*) as n, """ +
        """sum(v) as sv from loc where k >= 0 group by grp order by grp"""")
    val got = df.collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    // 40 local + 40 remote rows, all keys >= 0
    assert(got.map(_._2).sum === 80L, got.toString)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("JDBCRelation"), plan)
    assert(plan.toLowerCase.contains("parquet"), plan)
    // the remote side still pushes its filter to the foreign engine
    assert(plan.contains("PushedFilters:") &&
      plan.contains("GreaterThanOrEqual(K,0)"), plan)
    // union + PARTIAL aggregation happen below the shuffle, and the
    // only exchanges are the aggregate's hash repartition and the
    // order-by's range repartition, both on the group key — the
    // federation itself introduces no data movement (AQE prints the
    // plan twice, so assert on exchange KINDS, not line counts)
    assert(plan.contains("partial_count"), plan)
    val exchanges = plan.linesIterator
      .filter(_.contains("Exchange "))
      .map(_.replaceAll(".*Exchange ", "").takeWhile(_ != '(')).toSet
    assert(exchanges.subsetOf(Set("hashpartitioning",
      "rangepartitioning")), s"unexpected exchanges $exchanges\n$plan")
  }
}
