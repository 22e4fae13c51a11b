package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Raster

/** Raster → vector extraction: marching-squares contour segments and
  * 4-connected region polygonize, each against a serial reference on a
  * seeded random grid, plus the plan gates that keep them scale-shaped.
  */
class RasterVectorSpec extends AnyFunSuite {
  import SharedSpark._

  // a seeded random sparse grid: ~35% occupied over a 24×24 field —
  // dense enough for interior (mask-15) blocks, saddles, and
  // multi-pixel regions, sparse enough for singletons
  private val rnd = new scala.util.Random(42)
  private val cellsLocal: Seq[(Long, Long, Long)] =
    (for { x <- 0 until 24; y <- 0 until 24 if rnd.nextDouble() < 0.35 }
      yield (x.toLong, y.toLong, (1 + rnd.nextInt(5)).toLong))

  private def cellsDf = {
    import spark.implicits._
    cellsLocal.toDF("gx", "gy", "n")
  }

  test("contour segments match a serial marching-squares reference") {
    val occ = cellsLocal.map(c => (c._1, c._2)).toSet
    // serial reference: visit every block adjacent to an occupied pixel
    val blocks = occ.flatMap { case (x, y) =>
      Seq((x, y), (x - 1, y), (x - 1, y - 1), (x, y - 1)) }
    val want = blocks.flatMap { case (bx, by) =>
      val mask = (if (occ((bx, by))) 1 else 0) +
        (if (occ((bx + 1, by))) 2 else 0) +
        (if (occ((bx + 1, by + 1))) 4 else 0) +
        (if (occ((bx, by + 1))) 8 else 0)
      Raster.SegTable.filter(_._1 == mask).map { case (_, sg, a, b, c, d) =>
        (bx, by, mask.toLong, sg.toLong,
          bx + a, by + b, bx + c, by + d)
      }
    }
    val got = Raster.contourSegments(cellsDf, threshold = 1L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4), r.getDouble(5), r.getDouble(6),
        r.getDouble(7))).toSet
    assert(got === want)
    // the field is dense enough that interior blocks exist and are cut
    assert(want.nonEmpty)
  }

  test("contour threshold binarizes the field (n >= t), not mere occupancy") {
    val hi = cellsLocal.filter(_._3 >= 3L).map(c => (c._1, c._2)).toSet
    assert(hi.nonEmpty && hi.size < cellsLocal.size)
    val got = Raster.contourSegments(cellsDf, threshold = 3L)
      .select(countDistinct(struct(col("mx"), col("my")))).head().getLong(0)
    val wantBlocks = hi.flatMap { case (x, y) =>
      Seq((x, y), (x - 1, y), (x - 1, y - 1), (x, y - 1)) }
      .count { case (bx, by) =>
        val m = (if (hi((bx, by))) 1 else 0) + (if (hi((bx + 1, by))) 2 else 0) +
          (if (hi((bx + 1, by + 1))) 4 else 0) + (if (hi((bx, by + 1))) 8 else 0)
        m != 0 && m != 15
      }
    assert(got === wantBlocks.toLong)
  }

  test("polygonize matches a serial flood fill: labels, counts, sums, bboxes") {
    val byPix = cellsLocal.map(c => (c._1, c._2) -> c._3).toMap
    // serial 4-connected flood fill
    var label = Map.empty[(Long, Long), Long]
    def key(p: (Long, Long)): Long = p._1 * (1L << 22) + p._2
    for (p <- byPix.keys if !label.contains(p)) {
      var comp = Set(p); var frontier = Set(p)
      while (frontier.nonEmpty) {
        frontier = frontier.flatMap { case (x, y) =>
          Seq((x + 1, y), (x - 1, y), (x, y + 1), (x, y - 1)) }
          .filter(q => byPix.contains(q) && !comp(q))
        comp ++= frontier
      }
      val lbl = comp.map(key).min
      comp.foreach(q => label += q -> lbl)
    }
    val want = label.groupBy(_._2).map { case (lbl, m) =>
      val pix = m.keys.toSeq
      (lbl, pix.size.toLong, pix.map(byPix).sum,
        pix.map(_._1).min, pix.map(_._1).max,
        pix.map(_._2).min, pix.map(_._2).max)
    }.toSet
    val got = Raster.polygonize(cellsDf, threshold = 1L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toSet
    assert(got === want)
    // multi-pixel regions AND singletons both occur at this density
    assert(want.exists(_._2 > 1) && want.exists(_._2 == 1))
  }

  test("plans: no cartesian anywhere; contour's lookup side broadcasts") {
    val contour = Raster.contourSegments(cellsDf, threshold = 1L)
    val cPlan = contour.queryExecution.executedPlan.toString
    assert(!cPlan.contains("CartesianProduct") &&
      !cPlan.contains("BroadcastNestedLoopJoin"), cPlan)
    assert(cPlan.contains("BroadcastHashJoin"), cPlan)
    val regions = Raster.polygonize(cellsDf, threshold = 1L)
    val rPlan = regions.queryExecution.executedPlan.toString
    assert(!rPlan.contains("CartesianProduct") &&
      !rPlan.contains("BroadcastNestedLoopJoin"), rPlan)
  }
}
