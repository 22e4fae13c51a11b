package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.HexGrid
import graft.functions.geo

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** hex_kring(cell, k) → array<bigint> of cells within ring distance k. */
case class HexKRingExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "hex_kring"
  override protected def nullSafeEval(cell: Any, k: Any): Any =
    new GenericArrayData(HexGrid.kRing(cell.asInstanceOf[Long], k.asInstanceOf[Int]))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (cell, k) =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.core.HexGrid.kRing($cell, $k))")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(l, r)
}

/** Exact k-nearest-neighbor join via hex cell-ring expansion (BASELINE.json
  * north_star: "computes kNN via cell-ring expansion"). Two-phase exact
  * algorithm — no driver loop over data, both phases are joins:
  *
  *  phase 1 (probe): join queries to points in kRing(qcell, probeRings) →
  *    per-query candidate distances → kth-distance upper bound d_k.
  *    Queries with < k candidates fall back to a conservative global bound.
  *  phase 2 (guarantee): expand each query to every cell within ring
  *    distance ceil(d_k/inradius)+1 — geometry guarantees every true
  *    neighbor is inside — join, rank, take k. Exact by construction.
  *
  * Distance metric: squared planar degrees (matches the SQL oracle).
  */
object KnnJoin {
  import org.apache.spark.sql.GraftBridge.{column, expression}

  def hex_kring(cell: Column, k: Column): Column =
    column(HexKRingExpr(expression(cell), expression(k)))

  private def d2(qLon: Column, qLat: Column, pLon: Column, pLat: Column): Column =
    (qLon - pLon) * (qLon - pLon) + (qLat - pLat) * (qLat - pLat)

  /** queries(q_id, q_lon, q_lat) × points(p_id, lon, lat) → top-k rows
    * (q_id, p_id, dist2, rank). `res` picks the grid granularity;
    * `probeRings` the phase-1 neighborhood.
    */
  def knn(queries: DataFrame, points: DataFrame, k: Int, res: Int = 4,
          probeRings: Int = 2): DataFrame = {
    // probeRings = 0 would pin the ring-doubling re-probe at 0 rings
    // forever (0·2 = 0): the sparse-query loop must be able to grow
    require(probeRings >= 1, "probeRings must be >= 1")
    val inradius = HexGrid.radius(res) * math.sqrt(3.0) / 2.0
    val pts = points
      .withColumn("__pcell", geo.hex_cell(col("lon"), col("lat"), lit(res)))
    val qs = queries
      .withColumn("__qcell", geo.hex_cell(col("q_lon"), col("q_lat"), lit(res)))

    // ---- phase 1: probe neighborhood → per-query kth-distance bound
    val probe = qs
      .withColumn("__cell", explode(hex_kring(col("__qcell"), lit(probeRings))))
      .join(pts, col("__cell") === col("__pcell"))
      .withColumn("__d2", d2(col("q_lon"), col("q_lat"), col("lon"), col("lat")))
    val wq = Window.partitionBy("q_id").orderBy(col("__d2").asc)
    // one row per query — checkpointed so the probe/window/agg subtree
    // runs ONCE: it previously re-evaluated in the sparse-queries check
    // AND again under the phase-2 action (only sparseQ was truncated)
    val bounds = probe
      .withColumn("__rn", row_number().over(wq))
      .filter(col("__rn") <= k)
      .groupBy("q_id")
      .agg(max(col("__d2")).as("__dk"), count(lit(1)).as("__found"))
      .select(col("q_id"),
        when(col("__found") >= k, sqrt(col("__dk"))).as("__radius"))
      .localCheckpoint(true)

    val qsWithR = qs.join(bounds, Seq("q_id"), "left")
    val filled = qsWithR.filter(col("__radius").isNotNull)
      .withColumn("__rings", ceil(col("__radius") / inradius).cast("int") + lit(1))
      .select("q_id", "q_lon", "q_lat", "__qcell", "__rings")

    // queries whose probe neighborhood held < k points (sparse regions —
    // rare at planetary density): RING-DOUBLING re-probe — 2×, 4×, …
    // rings until ≥ k candidates are found, then the normal phase-2
    // guarantee. Geometry stays exact and every step is the same cell
    // equi join (never a nested-loop cross join, even when EVERY query
    // is sparse under a pathological res choice). The loop is bounded
    // by log₂(worldRings): once rings cover the whole domain the probe
    // candidates ARE all points, which is exact for datasets holding
    // fewer than k points in total.
    val worldRings = math.ceil(
      math.sqrt(360.0 * 360.0 + 180.0 * 180.0) / inradius).toInt + 1
    // lazy on purpose: in the common all-dense case the loop guard's
    // head(1) is the only consumer (one cheap job over the checkpointed
    // bounds), so an eager materialization here would be a wasted
    // blocking action; iterations that DO run re-checkpoint on
    // reassignment below
    var sparseQ = qsWithR.filter(col("__radius").isNull)
      .select("q_id", "q_lon", "q_lat", "__qcell")
    var rings = probeRings
    val graduated = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    var leftover: DataFrame = null // total-coverage candidates (< k points)
    while (leftover == null && sparseQ.head(1).nonEmpty) {
      rings = math.min(rings.toLong * 2L, worldRings.toLong).toInt
      val reprobe = sparseQ
        .withColumn("__cell", explode(hex_kring(col("__qcell"), lit(rings))))
        .join(pts, col("__cell") === col("__pcell"))
        .withColumn("__d2", d2(col("q_lon"), col("q_lat"), col("lon"), col("lat")))
      if (rings >= worldRings) {
        leftover = reprobe.select(col("q_id"), col("p_id"),
          col("__d2").as("dist2"))
      } else {
        val grads = reprobe
          .withColumn("__rn", row_number().over(wq))
          .filter(col("__rn") <= k)
          .groupBy("q_id")
          .agg(max(col("__d2")).as("__dk"), count(lit(1)).as("__found"))
          .filter(col("__found") >= k)
          .select(col("q_id"),
            (ceil(sqrt(col("__dk")) / inradius).cast("int") + lit(1))
              .as("__rings"))
          .localCheckpoint(true)
        graduated += sparseQ.join(grads, Seq("q_id"))
          .select("q_id", "q_lon", "q_lat", "__qcell", "__rings")
        sparseQ = sparseQ
          .join(grads.select("q_id"), Seq("q_id"), "left_anti")
          .localCheckpoint(true)
      }
    }

    // ---- phase 2: guaranteed-coverage join + exact top-k
    val expand = graduated.foldLeft(filled)(_ unionByName _)
    val cand = expand
      .withColumn("__cell", explode(hex_kring(col("__qcell"), col("__rings"))))
      .join(pts, col("__cell") === col("__pcell"))
      .withColumn("dist2", d2(col("q_lon"), col("q_lat"), col("lon"), col("lat")))
      .select("q_id", "p_id", "dist2")
    val w = Window.partitionBy("q_id")
      .orderBy(col("dist2").asc, col("p_id").asc)
    (if (leftover == null) cand else cand.unionByName(leftover))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("p_id"), round(col("dist2"), 9).as("dist2"), col("rank"))
  }

  /** Distance-band (DWithin) join — every (query, point) pair within
    * `radiusDeg` planar degrees (the metric of [[knn]] and its oracle):
    * the "all pairs within r" spatial predicate that a naive
    * `dist(q,p) <= r` join plans as a BroadcastNestedLoopJoin. One
    * kRing explode on the query side (rings = ⌈r/inradius⌉+1 — the
    * phase-2 coverage geometry) → ONE cell equi join → exact distance
    * filter. A pair meets exactly once, in the point's own cell, so no
    * distinct pass is needed. Fan-out is O(rings²) cells per query:
    * pick `res` so the cell inradius is near `radiusDeg` and rings
    * stays ~2. Hot cells fall under AQE skew handling like any hash
    * join. Returns (q_id, p_id, dist2) plus any `carry` columns — extra
    * per-side attributes (e.g. an event-time column on each side) that
    * ride the ONE cell equi join instead of being joined back to the
    * pair set afterwards (each such join-back is a full shuffle of the
    * pair set at scale).
    */
  def withinRadius(queries: DataFrame, points: DataFrame,
                   radiusDeg: Double, res: Int = 4,
                   carry: Seq[String] = Nil): DataFrame = {
    require(radiusDeg > 0.0)
    val inradius = HexGrid.radius(res) * math.sqrt(3.0) / 2.0
    val rings = math.ceil(radiusDeg / inradius).toInt + 1
    val pts = points
      .withColumn("__pcell", geo.hex_cell(col("lon"), col("lat"), lit(res)))
    queries
      .withColumn("__qcell", geo.hex_cell(col("q_lon"), col("q_lat"), lit(res)))
      .withColumn("__cell", explode(hex_kring(col("__qcell"), lit(rings))))
      .join(pts, col("__cell") === col("__pcell"))
      .withColumn("dist2",
        d2(col("q_lon"), col("q_lat"), col("lon"), col("lat")))
      .filter(col("dist2") <= lit(radiusDeg) * lit(radiusDeg))
      .select(col("q_id") +: col("p_id") +:
        round(col("dist2"), 9).as("dist2") +: carry.map(col): _*)
  }
}
