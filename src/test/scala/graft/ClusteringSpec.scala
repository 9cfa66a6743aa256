package graft

import org.apache.spark.sql.functions._

import graft.ops.Clustering

class ClusteringSpec extends SparkSpec {
  import spark.implicits._

  private def df(pts: Seq[(Long, Long, Long)]) = pts.toDF("id", "x", "y")

  test("epsPairs == brute-force eps-ball pairs, each produced once") {
    val pts = (0L until 120L).map(i =>
      (i, (i * 37) % 100, (i * 61) % 100))
    val eps = 7L
    val brute = (for {
      (i, xi, yi) <- pts; (j, xj, yj) <- pts if i < j
      if (xi - xj) * (xi - xj) + (yi - yj) * (yi - yj) <= eps * eps
    } yield (i, j)).toSet
    val got = Clustering.epsPairs(df(pts), eps)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.length === got.toSet.size, "duplicate pairs emitted")
    assert(got.toSet === brute)
  }

  test("dbscan2d labels two separated blobs, border points adopt the " +
      "smallest core neighbor's cluster, stragglers are noise") {
    // blob A: tight 3x3 around (10,10); blob B: around (50,50);
    // a border point hanging off blob A; two isolated noise points
    val blobA = for (dx <- 0L to 2L; dy <- 0L to 2L)
      yield (dx * 3 + dy, 10L + dx, 10L + dy)
    val blobB = for (dx <- 0L to 2L; dy <- 0L to 2L)
      yield (100L + dx * 3 + dy, 50L + dx, 50L + dy)
    val border = Seq((200L, 14L, 14L)) // within eps of A's corner only
    val noise = Seq((300L, 80L, 5L), (301L, 5L, 80L))
    val out = Clustering.dbscan2d(
        df(blobA ++ blobB ++ border ++ noise), eps = 3L, minPts = 4)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2)))
      .toMap
    // every blob member is core, labeled by the blob's smallest id
    blobA.foreach { case (i, _, _) => assert(out(i) === ("core", 0L)) }
    blobB.foreach { case (i, _, _) => assert(out(i) === ("core", 100L)) }
    assert(out(200L) === ("border", 0L))
    assert(out(300L) === ("noise", -1L) && out(301L) === ("noise", -1L))
  }

  test("dbscan2d: an isolated dense clique is its own singleton-core " +
      "cluster; partitioning never changes labels") {
    val pts = (for (dx <- 0L to 1L; dy <- 0L to 1L)
      yield (dx * 2 + dy, 5L + dx, 5L + dy)) ++ Seq((9L, 30L, 30L))
    val a = Clustering.dbscan2d(df(pts), 3L, 4)
      .collect().map(_.toString).sorted.toSeq
    val b = Clustering.dbscan2d(df(pts).repartition(7), 3L, 4)
      .collect().map(_.toString).sorted.toSeq
    assert(a === b)
    val m = Clustering.dbscan2d(df(pts), 3L, 4)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2)))
      .toMap
    (0L to 3L).foreach(i => assert(m(i) === ("core", 0L)))
    assert(m(9L) === ("noise", -1L))
  }
}
