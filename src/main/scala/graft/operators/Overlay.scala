package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Polygon–polygon spatial overlay: the "which geometries intersect
  * which" join that completes the join family (point–point kNN/DWithin,
  * point–polygon PIP, polygon–polygon HERE). Implemented for convex
  * polygons (triangles in the driver queries) with the exact
  * separating-axis test — closed semantics: touching at a point or
  * edge counts as intersecting.
  *
  * Scale shape (the SpatialHadoop/PBSM discipline):
  *  - candidates come from a planar-grid BBOX COVER: each geometry
  *    explodes to the grid cells its bbox overlaps (bounded fan-out —
  *    pick `cellDeg` near the median geometry extent so the cover is
  *    ~4 cells) and the two sides meet in ONE cell equi join; a naive
  *    `intersects(a,b)` predicate would plan as a nested-loop
  *    cartesian.
  *  - a candidate pair sharing several cells is evaluated exactly ONCE
  *    via reference-point dedup: the pair is kept only in the cell
  *    containing the max of the two bbox-min corners — a cell both
  *    covers share whenever the bboxes overlap — so there is no
  *    distinct pass and no duplicate SAT work.
  *  - the SAT predicate is pure fixed-order double arithmetic
  *    (orientation signs, no rounding, no epsilon), codegen-friendly
  *    and reproducible bit-for-bit by an external SQL engine.
  */
object Overlay {

  /** 2·signed-area orientation of (p,q,r) — the SAT primitive. */
  private def orient(px: Column, py: Column, qx: Column, qy: Column,
                     rx: Column, ry: Column): Column =
    (qx - px) * (ry - py) - (qy - py) * (rx - px)

  /** Exact closed-intersection test for two triangles given as 12
    * coordinate columns. Separated iff some edge of either triangle has
    * ALL vertices of the other strictly on the opposite side from its
    * own third vertex; intersecting = not separated. Degenerate
    * (zero-area) triangles never separate anything (orientation sign 0)
    * — callers supply non-degenerate geometry.
    */
  def triIntersects(a: Seq[(Column, Column)], b: Seq[(Column, Column)]): Column = {
    require(a.size == 3 && b.size == 3)
    def separates(tri: Seq[(Column, Column)], other: Seq[(Column, Column)]): Column = {
      (0 until 3).map { i =>
        val (px, py) = tri(i)
        val (qx, qy) = tri((i + 1) % 3)
        val (rx, ry) = tri((i + 2) % 3)
        val oSelf = orient(px, py, qx, qy, rx, ry)
        val oth = other.map { case (vx, vy) => orient(px, py, qx, qy, vx, vy) }
        (oSelf > 0 && oth.map(_ < 0).reduce(_ && _)) ||
          (oSelf < 0 && oth.map(_ > 0).reduce(_ && _))
      }.reduce(_ || _)
    }
    !(separates(a, b) || separates(b, a))
  }

  /** All intersecting (a_id, b_id) triangle pairs. Inputs:
    * `as`(idA, ax1..ay3), `bs`(idB, bx1..by3) with the given column
    * names; `cellDeg` sizes the candidate grid (≈ the median bbox
    * extent). Returns (idA, idB) exactly once per intersecting pair.
    */
  def triangleIntersectsJoin(as: DataFrame, bs: DataFrame,
                             cellDeg: Double): DataFrame = {
    require(cellDeg > 0.0)
    def cover(df: DataFrame, p: String): DataFrame = {
      val xs = Seq(col(s"${p}x1"), col(s"${p}x2"), col(s"${p}x3"))
      val ys = Seq(col(s"${p}y1"), col(s"${p}y2"), col(s"${p}y3"))
      df.withColumn(s"__${p}cx0",
          floor(least(xs: _*) / lit(cellDeg)).cast("long"))
        .withColumn(s"__${p}cx1",
          floor(greatest(xs: _*) / lit(cellDeg)).cast("long"))
        .withColumn(s"__${p}cy0",
          floor(least(ys: _*) / lit(cellDeg)).cast("long"))
        .withColumn(s"__${p}cy1",
          floor(greatest(ys: _*) / lit(cellDeg)).cast("long"))
        .withColumn("__cx",
          explode(sequence(col(s"__${p}cx0"), col(s"__${p}cx1"))))
        .withColumn("__cy",
          explode(sequence(col(s"__${p}cy0"), col(s"__${p}cy1"))))
        .drop(s"__${p}cx1", s"__${p}cy1")
    }
    val av = Seq((col("ax1"), col("ay1")), (col("ax2"), col("ay2")),
      (col("ax3"), col("ay3")))
    val bv = Seq((col("bx1"), col("by1")), (col("bx2"), col("by2")),
      (col("bx3"), col("by3")))
    cover(as, "a")
      .join(cover(bs, "b"), Seq("__cx", "__cy"))
      // reference-point dedup: evaluate the pair ONLY in the cell of the
      // max bbox-min corner (shared by both covers iff bboxes overlap)
      .filter(col("__cx") === greatest(col("__acx0"), col("__bcx0")) &&
        col("__cy") === greatest(col("__acy0"), col("__bcy0")))
      .filter(triIntersects(av, bv))
      .drop("__cx", "__cy", "__acx0", "__acy0", "__bcx0", "__bcy0")
  }
}
