package graft

import org.apache.spark.sql.functions._

import graft.ops.Blocking

class BlockingSpec extends SparkSpec {
  import spark.implicits._

  private def items(n: Int) =
    (1 to n).map(i => ((i * 37 % 100).toLong, s"key_${i % 13}_$i"))
      .toDF("id", "k")

  test("globalRank equals the single-window reference rank on the " +
      "total (key, id) order, for any partition count") {
    val df = items(200)
    val ref = df.collect().map(r => (r.getString(1), r.getLong(0)))
      .sortBy(identity).zipWithIndex
      .map { case ((_, id), pos) => id -> pos.toLong }.toMap
    for (parts <- Seq(1, 4, 13)) {
      val got = Blocking.globalRank(df.repartition(7), "k", "id", parts)
        .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("pos"))
        .toMap
      assert(got === ref, s"parts=$parts")
    }
  }

  test("sortedNeighborhoodPairs == brute-force window pairs; pair " +
      "budget is bounded by n*w") {
    val df = items(150)
    val w = 4
    val order = df.collect().map(r => (r.getString(1), r.getLong(0)))
      .sortBy(identity).map(_._2)
    val brute = (for {
      i <- order.indices; j <- (i + 1) to math.min(i + w, order.length - 1)
    } yield (order(i), order(j), (j - i).toLong)).toSet
    val got = Blocking.sortedNeighborhoodPairs(df, "k", "id", w)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(got === brute)
    assert(got.size <= 150 * w)
    // partitioning invariance
    val again = Blocking
      .sortedNeighborhoodPairs(df.repartition(11), "k", "id", w)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(again === brute)
  }

  test("duplicate keys break ties by id — the order stays total") {
    val df = Seq((5L, "same"), (1L, "same"), (3L, "same"))
      .toDF("id", "k")
    val pos = Blocking.globalRank(df, "k", "id")
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("pos"))
      .toMap
    assert(pos === Map(1L -> 0L, 3L -> 1L, 5L -> 2L))
  }
}
