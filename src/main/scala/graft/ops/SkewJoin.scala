package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys.
  *
  * AQE's skew-join handles most cases at runtime; salting is the
  * deterministic planner-side tool for EXTREME single-key skew (one key
  * holding a double-digit percent of a 100 TB fact table): the probe side
  * gets a salt in [0, S) derived from a stable row hash, the build side is
  * replicated S times (one copy per salt value), and the join key becomes
  * (key, salt) — splitting each hot key's partition S ways. Result is
  * row-identical to the plain join (proved in SkewJoinSpec).
  */
object SkewJoin {

  /** Inner equi-join of `probe` (large, possibly skewed) with `build`
    * (smaller) on `key`, salted `s` ways. `probeId` must be a stable
    * per-row expression (any column mix) — it only seeds salt placement,
    * not semantics. */
  def saltedJoin(probe: DataFrame, build: DataFrame, key: String, s: Int,
      probeId: Column): DataFrame = {
    require(s >= 1)
    val salted = probe.withColumn("__salt", pmod(xxhash64(probeId), lit(s)))
    val replicated = build
      .withColumn("__salt", explode(sequence(lit(0), lit(s - 1))))
      .withColumn("__salt", col("__salt").cast("long"))
    salted.join(replicated, Seq(key, "__salt"), "inner").drop("__salt")
  }
}
