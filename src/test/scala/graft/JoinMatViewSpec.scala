package graft

import org.apache.spark.sql.functions._
import graft.ops.{JoinMatView, MatView}
import graft.ops.MatView.AggSpec

/** [[graft.ops.JoinMatView]] — IVM over an inner equi-join: the
  * delta-join fold rules against one-shot rebuilds, the delete
  * boundary, the broadcast plan shape, and the Engine command
  * round-trip. */
class JoinMatViewSpec extends SparkSpec {
  import spark.implicits._

  private val spec = JoinMatView.Spec(
    on = Seq(("ak", "bk")),
    keys = Seq("grp"),
    aggs = Seq(AggSpec("count", "1", "n"), AggSpec("sum", "v", "sv")))

  // left (ak, grp): join key + group key; right (bk, v): join key + value
  private def leftRows(n: Int) =
    (1 to n).map(i => (i.toLong, s"g${i % 3}")).toDF("ak", "grp")
  private def rightRows(n: Int) =
    (1 to n).flatMap(i => Seq((i.toLong, (i * 7 % 11).toLong),
      (i.toLong, (i * 13 % 17).toLong))).toDF("bk", "v")

  test("one-side refresh == rebuild (left delta, then right delta)") {
    val l = leftRows(40)
    val r = rightRows(40)
    val rebuild = JoinMatView.create(l, r, spec)
      .orderBy("grp").collect().toSeq

    // left split: old = ak <= 25, delta = ak > 25
    val foldedL = JoinMatView.refresh(
      JoinMatView.create(l.filter($"ak" <= 25), r, spec),
      l.filter($"ak" > 25), r, spec, "left")
      .orderBy("grp").collect().toSeq
    assert(foldedL === rebuild)

    // right split: old = even bk rows' first value stream
    val foldedR = JoinMatView.refresh(
      JoinMatView.create(l, r.filter($"v" % 2 === 0), spec),
      r.filter($"v" % 2 =!= 0), l, spec, "right")
      .orderBy("grp").collect().toSeq
    assert(foldedR === rebuild)
  }

  test("refreshBoth == rebuild (both-side deltas, one commit)") {
    val l = leftRows(60)
    val r = rightRows(60)
    val rebuild = JoinMatView.create(l, r, spec)
      .orderBy("grp").collect().toSeq
    val (lOld, lNew) = ($"ak" % 4 =!= 0, $"ak" % 4 === 0)
    val (rOld, rNew) = ($"bk" % 5 =!= 0, $"bk" % 5 === 0)
    val folded = JoinMatView.refreshBoth(
      JoinMatView.create(l.filter(lOld), r.filter(rOld), spec),
      l.filter(lNew), r.filter(rNew),
      l.filter(lOld), r.filter(rOld), spec)
      .orderBy("grp").collect().toSeq
    assert(folded === rebuild)
  }

  test("delete fold == filtered rebuild; min/max spec refuses; " +
      "missing-count spec refuses") {
    val l = leftRows(40)
    val r = rightRows(40)
    val dels = l.filter($"ak" % 3 === 1)
    val after = JoinMatView.delete(
      JoinMatView.create(l, r, spec), dels, r, spec, "left")
      .orderBy("grp").collect().toSeq
    val rebuild = JoinMatView.create(
      l.filter($"ak" % 3 =!= 1), r, spec)
      .orderBy("grp").collect().toSeq
    assert(after === rebuild)

    // whole-group retirement: delete every g1 row (ak % 3 == 1)
    assert(!after.exists(_.getString(0) == "g1"))

    val mmSpec = spec.copy(aggs = spec.aggs :+ AggSpec("max", "v", "mx"))
    val err = intercept[IllegalStateException] {
      JoinMatView.delete(JoinMatView.create(l, r, mmSpec), dels, r,
        mmSpec, "left").collect()
    }
    assert(err.getMessage.contains("not self-maintainable"))

    val noCnt = spec.copy(aggs = Seq(AggSpec("sum", "v", "sv")))
    val err2 = intercept[IllegalStateException] {
      JoinMatView.delete(JoinMatView.create(l, r, noCnt), dels, r,
        noCnt, "left").collect()
    }
    assert(err2.getMessage.contains("count"))
  }

  test("refresh delta-join broadcasts the batch side (no shuffle of " +
      "the big side)") {
    val l = leftRows(30)
    val r = rightRows(30)
    val folded = JoinMatView.refresh(
      JoinMatView.create(l.filter($"ak" <= 20), r, spec),
      l.filter($"ak" > 20), r, spec, "left")
    val plan = folded.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
  }

  test("sides with overlapping column names refuse loudly") {
    val l = Seq((1L, "a")).toDF("k", "s")
    val r = Seq((1L, "b")).toDF("k", "s")
    val err = intercept[IllegalArgumentException] {
      JoinMatView.joined(l, r, Seq(("k", "k")))
    }
    assert(err.getMessage.contains("share column name"))
  }

  test("spec JSON round-trips") {
    val s = JoinMatView.Spec(Seq(("a", "b"), ("c", "d")), Seq("g"),
      Seq(AggSpec("count", "1", "n"), AggSpec("sum", "x", "sx")),
      "t1", "t2")
    assert(JoinMatView.specFromJson(JoinMatView.specToJson(s)) === s)
  }

  test("engine commands: create/refresh/delete/get round-trip under " +
      "the recorded spec; non-subset delete aborts with state intact") {
    val dir = java.nio.file.Files.createTempDirectory("jmv")
    leftRows(20).filter($"ak" <= 15)
      .write.parquet(dir.resolve("l.parquet").toString)
    leftRows(20).filter($"ak" > 15)
      .write.parquet(dir.resolve("ldelta.parquet").toString)
    rightRows(20).write.parquet(dir.resolve("r.parquet").toString)
    // 8 copies of the single folded (ak=1) row: subtracts 16 pairs
    // from group g1's 14 — a non-subset batch that must go negative.
    // (A delete of rows with NO join partner is correctly a no-op —
    // it removes nothing from the view.)
    Seq.fill(8)((1L, "g1")).toDF("ak", "grp")
      .write.parquet(dir.resolve("bad.parquet").toString)
    leftRows(20).filter($"ak" % 3 === 1 && $"ak" <= 15)
      .write.parquet(dir.resolve("dels.parquet").toString)

    val cat = new graft.engine.Catalog(spark)
    cat.registerTable("lt", dir.resolve("l.parquet").toString)
    cat.registerTable("rt", dir.resolve("r.parquet").toString)
    val engine = new graft.engine.Engine(spark, cat)
    val p = dir.resolve("jmv1").toString
    val created = engine.execute(s"join matview create where path = $p " +
      s"""and spec = {"left": "lt", "right": "rt",
        "on": [["ak", "bk"]], "keys": ["grp"], "aggs": [
        {"fn": "count", "alias": "n"},
        {"fn": "sum", "expr": "v", "alias": "sv"}]}""")
    assert(created.contains("groups"), created)

    engine.execute(s"join matview refresh where path = $p and " +
      s"side = left and source = ${dir.resolve("ldelta.parquet")}")
    val got = engine.execute(s"join matview get where path = $p")
    // folded state == one-shot rebuild over all 20 left rows
    val expect = JoinMatView.create(leftRows(20), rightRows(20), spec)
      .orderBy("grp").collect()
      .map(row => (row.getString(0), row.getLong(1), row.getLong(2)))
    expect.foreach { case (g, n, sv) =>
      assert(got.contains(s""""grp":"$g","n":$n,"sv":$sv"""), got)
    }

    // non-subset delete: negative count detected, state intact
    val err = intercept[IllegalArgumentException] {
      engine.execute(s"join matview delete where path = $p and " +
        s"side = left and source = ${dir.resolve("bad.parquet")}")
    }
    assert(err.getMessage.contains("not a subset"), err.getMessage)
    assert(engine.execute(s"join matview get where path = $p") === got)

    // legal delete == rebuild over surviving left rows
    engine.execute(s"join matview delete where path = $p and " +
      s"side = left and source = ${dir.resolve("dels.parquet")}")
    val got2 = engine.execute(s"join matview get where path = $p")
    val expect2 = JoinMatView.create(
      leftRows(20).filter(!($"ak" % 3 === 1 && $"ak" <= 15)),
      rightRows(20), spec)
      .orderBy("grp").collect()
      .map(row => (row.getString(0), row.getLong(1), row.getLong(2)))
    expect2.foreach { case (g, n, sv) =>
      assert(got2.contains(s""""grp":"$g","n":$n,"sv":$sv"""), got2)
    }
  }
}
