package graft

import org.apache.spark.sql.functions._

/** Restart recovery: the catalog reloads its metadata root (tables /
  * views / policies / artifact attach records) and `attach all`
  * re-registers the standing-artifact fleet — the reference's
  * startup `blockchain load` equivalent. */
class RestartRecoverySpec extends SparkSpec {
  import spark.implicits._

  test("a root-backed catalog reloads tables, views and policies on " +
      "construction") {
    val root = java.nio.file.Files.createTempDirectory("rr1")
    val data = root.resolve("t.parquet").toString
    Seq((1L, "a"), (2L, "b")).toDF("id", "s").write.parquet(data)
    val cat1 = new graft.engine.Catalog(spark, Some(root))
    cat1.registerTable("t", data)
    cat1.createView("v", "t", Seq("id" -> "key", "s" -> "label"))
    cat1.addPolicy("p1", """{"mapping": {"dbms": "d", "table": "t"}}""")

    // "restart": a brand-new catalog over the same root
    val cat2 = new graft.engine.Catalog(spark, Some(root))
    assert(cat2.reloadErrors.isEmpty, cat2.reloadErrors.mkString("; "))
    assert(cat2.tableNames === Seq("t"))
    assert(cat2.table("t").count() === 2L)
    assert(cat2.viewNames === Seq("v"))
    assert(cat2.table("v").columns.toSeq === Seq("key", "label"))
    assert(cat2.policy("p1").isDefined)
  }

  test("attach all replays recorded artifacts: matview serving and " +
      "the ingest auto-fold survive an engine restart") {
    val root = java.nio.file.Files.createTempDirectory("rr2")
    val data = root.resolve("base.parquet").toString
    Seq(("a", 1L), ("a", 5L), ("b", 2L)).toDF("g", "k")
      .write.parquet(data)
    val cat1 = new graft.engine.Catalog(spark, Some(root))
    cat1.registerTable("base", data)
    val e1 = new graft.engine.Engine(spark, cat1)
    val p = root.resolve("mv").toString
    e1.execute(s"matview create where table = base and path = $p " +
      s"""and spec = {"keys": ["g"], "aggs": [
        {"fn": "count", "alias": "n"},
        {"fn": "sum", "expr": "k", "alias": "sk"}]}""")

    // restart: fresh catalog + engine over the same root
    val cat2 = new graft.engine.Catalog(spark, Some(root))
    val e2 = new graft.engine.Engine(spark, cat2)
    // before attach all: the artifact exists on disk but is unserved
    assert(e2.execute("get matviews").contains("no matviews"))
    val out = e2.execute("attach all")
    assert(out.contains("attached matview:"), out)
    assert(!out.contains("FAILED"), out)
    // serving is back
    val got = e2.execute(s"matview get where path = $p")
    assert(got.contains(""""g":"a","n":2,"sk":6"""), got)
    // and the re-attached registry feeds the auto-fold: a manual
    // refresh-equivalent fold through foldStandingViews
    e2.foldStandingViews("base", Seq(("b", 10L)).toDF("g", "k"))
    val got2 = e2.execute(s"matview get where path = $p")
    assert(got2.contains(""""g":"b","n":2,"sk":12"""), got2)
  }

  test("monitor and layout artifacts re-attach through attach all") {
    val root = java.nio.file.Files.createTempDirectory("rr4")
    val data = root.resolve("ev.parquet").toString
    (0 until 120).map(i =>
      (s"k${i % 2}", java.sql.Timestamp.valueOf(
        f"2024-01-01 00:${i % 60}%02d:00"), i.toLong, i.toLong * 2))
      .toDF("k", "ts", "x", "y").write.parquet(data)
    val cat1 = new graft.engine.Catalog(spark, Some(root))
    cat1.registerTable("ev", data)
    val e1 = new graft.engine.Engine(spark, cat1)
    e1.execute(s"monitor create where table = ev and " +
      s"path = ${root.resolve("mon")} and key = k and ts = ts")
    e1.execute(s"layout zorder where table = ev and " +
      s"path = ${root.resolve("lay")} and x = x and y = y and " +
      "bits = 8 and buckets = 16")

    val cat2 = new graft.engine.Catalog(spark, Some(root))
    val e2 = new graft.engine.Engine(spark, cat2)
    val out = e2.execute("attach all")
    assert(out.contains("attached monitor:"), out)
    assert(out.contains("attached layout:"), out)
    assert(!out.contains("FAILED"), out)
    // the re-attached monitor serves levels without re-create
    val lvl = e2.execute("monitor level where table = ev")
    assert(lvl.contains("k0"), lvl)
  }

  test("reload is per-entry tolerant: a vanished storage path reports " +
      "in reloadErrors, the rest of the catalog restores") {
    val root = java.nio.file.Files.createTempDirectory("rr3")
    val keep = root.resolve("keep.parquet").toString
    val gone = root.resolve("gone.parquet")
    Seq((1L, "x")).toDF("id", "s").write.parquet(keep)
    Seq((2L, "y")).toDF("id", "s").write.parquet(gone.toString)
    val cat1 = new graft.engine.Catalog(spark, Some(root))
    cat1.registerTable("keep", keep)
    cat1.registerTable("gone", gone.toString)
    // vanish one table's storage
    def rm(p: java.nio.file.Path): Unit = {
      if (java.nio.file.Files.isDirectory(p)) {
        val s = java.nio.file.Files.list(p)
        try {
          import scala.jdk.CollectionConverters._
          s.iterator().asScala.toVector.foreach(rm)
        } finally s.close()
      }
      java.nio.file.Files.delete(p)
    }
    rm(gone)
    val cat2 = new graft.engine.Catalog(spark, Some(root))
    assert(cat2.tableNames === Seq("keep"))
    assert(cat2.reloadErrors.exists(_.contains("table_gone")),
      cat2.reloadErrors.mkString("; "))
    assert(cat2.table("keep").count() === 1L)
  }
}
