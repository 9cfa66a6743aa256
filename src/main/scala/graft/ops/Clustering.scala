package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Density clustering: exact 2-D DBSCAN (Ester et al. KDD 1996) over
  * integer grid coordinates — the spatiotemporal "dense activity
  * pocket" detector (events on a (user, time) lattice, points on any
  * two quantized dims).
  *
  * Exactness at scale: the eps-neighbor search is a GRID-CELL
  * equi-join — cell side = eps, so every eps-ball lies within the 3×3
  * cell neighborhood; one side explodes its 9 candidate cells
  * (map-only ×9), the join key is the cell id, and each qualifying
  * pair is produced exactly once (the partner's cell is exactly one of
  * the 9). No KD-tree, no cross join, no approximation: candidates are
  * bounded by local density × 9·eps², never N².
  *
  * Roles follow the paper: core = |N_eps(p)| ≥ minPts (the point
  * itself counts), clusters = connected components of the core-core
  * eps-graph ([[Dedup.connectedComponents]] pointer jumping; isolated
  * cores are singleton clusters), border = non-core with ≥ 1 core
  * neighbor, adopted by its SMALLEST core neighbor's cluster label
  * (deterministic — never the paper's first-seen order), the rest
  * noise. All integer arithmetic — a DuckDB oracle replays pairs,
  * roles, and labels bit-for-bit.
  */
object Clustering {
  /** Exact eps-neighbor pairs `(id_a, id_b)`, id_a < id_b, over integer
    * points `(id, x, y)`: L2² <= eps². */
  def epsPairs(points: DataFrame, eps: Long): DataFrame = {
    require(eps >= 1, "eps must be >= 1")
    val cells = points.select(col("id"), col("x"), col("y"),
      expr(s"x div $eps").as("cx"), expr(s"y div $eps").as("cy"))
    val probes = cells.select(col("id"), col("x"), col("y"),
        explode(expr(
          "transform(sequence(0, 8), k -> " +
            "struct(cx + k div 3 - 1 as ncx, cy + k % 3 - 1 as ncy))"))
          .as("nc"))
      .select(col("id"), col("x"), col("y"),
        col("nc.ncx").as("cx"), col("nc.ncy").as("cy"))
    probes.join(cells.select(col("id").as("jd"), col("x").as("jx"),
        col("y").as("jy"), col("cx"), col("cy")), Seq("cx", "cy"))
      .filter(col("id") < col("jd") &&
        (col("x") - col("jx")) * (col("x") - col("jx")) +
          (col("y") - col("jy")) * (col("y") - col("jy")) <= eps * eps)
      .select(col("id").as("id_a"), col("jd").as("id_b"))
  }

  /** DBSCAN labels `(id, role, cluster)`: role core/border/noise;
    * cluster = smallest member core id, -1 for noise. */
  def dbscan2d(points: DataFrame, eps: Long, minPts: Int): DataFrame = {
    require(minPts >= 2, "minPts must be >= 2")
    val pairs = epsPairs(points, eps).localCheckpoint(true)
    val deg = pairs.select(col("id_a").as("id"))
      .unionByName(pairs.select(col("id_b").as("id")))
      .groupBy("id").agg(count(lit(1)).as("deg"))
    val core = deg.filter(col("deg") + 1 >= minPts).select(col("id"))
      .localCheckpoint(true)
    val coreEdges = pairs
      .join(core.withColumnRenamed("id", "id_a"), Seq("id_a"),
        "left_semi")
      .join(core.withColumnRenamed("id", "id_b"), Seq("id_b"),
        "left_semi")
    val linked = Dedup.connectedComponents(coreEdges)
    val coreLabels = core.join(linked, Seq("id"), "left")
      .select(col("id"), coalesce(col("label"), col("id")).as("cluster"))
      .localCheckpoint(true)
    val sym = pairs.select(col("id_a").as("id"), col("id_b").as("nb"))
      .unionByName(pairs.select(col("id_b").as("id"),
        col("id_a").as("nb")))
    val border = sym
      .join(core.withColumnRenamed("id", "nb"), Seq("nb"), "left_semi")
      .join(core, Seq("id"), "left_anti")
      .join(coreLabels.select(col("id").as("nb"), col("cluster")),
        Seq("nb"))
      .groupBy("id").agg(min(col("cluster")).as("cluster"))
    val labeled = coreLabels.withColumn("role", lit("core"))
      .unionByName(border.withColumn("role", lit("border")))
    points.select(col("id"))
      .join(labeled, Seq("id"), "left")
      .select(col("id"), coalesce(col("role"), lit("noise")).as("role"),
        coalesce(col("cluster"), lit(-1L)).as("cluster"))
  }
}
