package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Overlay

/** Polygon–polygon overlay join: exact SAT semantics vs a serial
  * reference, single evaluation per pair, and the cell-cover plan.
  */
class OverlaySpec extends AnyFunSuite {
  import SharedSpark._

  private type Tri = Seq[(Double, Double)]

  // serial separating-axis reference (closed semantics)
  private def refIntersects(a: Tri, b: Tri): Boolean = {
    def orient(p: (Double, Double), q: (Double, Double),
               r: (Double, Double)): Double =
      (q._1 - p._1) * (r._2 - p._2) - (q._2 - p._2) * (r._1 - p._1)
    def sep(t: Tri, o: Tri): Boolean = (0 until 3).exists { i =>
      val (p, q, r) = (t(i), t((i + 1) % 3), t((i + 2) % 3))
      val os = orient(p, q, r)
      (os > 0 && o.forall(v => orient(p, q, v) < 0)) ||
        (os < 0 && o.forall(v => orient(p, q, v) > 0))
    }
    !(sep(a, b) || sep(b, a))
  }

  private def toDfA(tris: Seq[(Long, Tri)]) = {
    import spark.implicits._
    tris.map { case (id, t) => (id, t(0)._1, t(0)._2, t(1)._1, t(1)._2,
      t(2)._1, t(2)._2) }
      .toDF("a_id", "ax1", "ay1", "ax2", "ay2", "ax3", "ay3")
  }
  private def toDfB(tris: Seq[(Long, Tri)]) = {
    import spark.implicits._
    tris.map { case (id, t) => (id, t(0)._1, t(0)._2, t(1)._1, t(1)._2,
      t(2)._1, t(2)._2) }
      .toDF("b_id", "bx1", "by1", "bx2", "by2", "bx3", "by3")
  }

  private def run(as: Seq[(Long, Tri)], bs: Seq[(Long, Tri)],
                  cellDeg: Double): Set[(Long, Long)] =
    Overlay.triangleIntersectsJoin(toDfA(as), toDfB(bs), cellDeg)
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("closed semantics: overlap, containment, edge/vertex touch, disjoint") {
    val big: Tri = Seq((0.0, 0.0), (10.0, 0.0), (0.0, 10.0))
    val inner: Tri = Seq((1.0, 1.0), (2.0, 1.0), (1.0, 2.0))       // contained
    val cross: Tri = Seq((5.0, -1.0), (6.0, -1.0), (5.0, 5.0))     // proper overlap
    val edgeTouch: Tri = Seq((4.0, -3.0), (6.0, -3.0), (5.0, 0.0)) // vertex on edge
    val vertTouch: Tri = Seq((10.0, 0.0), (12.0, 0.0), (12.0, 2.0)) // shared vertex
    val far: Tri = Seq((50.0, 50.0), (51.0, 50.0), (50.0, 51.0))
    val bs = Seq(1L -> inner, 2L -> cross, 3L -> edgeTouch,
      4L -> vertTouch, 5L -> far)
    val got = run(Seq(0L -> big), bs, cellDeg = 8.0)
    assert(got === Set((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L)))
    bs.foreach { case (id, t) =>
      assert(refIntersects(big, t) === got.contains((0L, id)), s"b=$id")
    }
  }

  test("pair spanning many shared cover cells is reported exactly once") {
    // both triangles span several 2°-cells and overlap over many of them
    val a: Tri = Seq((0.0, 0.0), (9.0, 0.0), (0.0, 9.0))
    val b: Tri = Seq((-1.0, -1.0), (8.0, -1.0), (-1.0, 8.0))
    val rows = Overlay.triangleIntersectsJoin(
        toDfA(Seq(7L -> a)), toDfB(Seq(9L -> b)), cellDeg = 2.0)
      .select("a_id", "b_id").collect()
    assert(rows.length === 1 && rows.head.getLong(0) === 7L)
  }

  test("brute-force parity on scattered sets; equi-join plan (no cartesian)") {
    def tri(i: Long, shift: Double): (Long, Tri) = {
      val lon = (i * 17.000170000017) % 340.0 - 170.0 + shift
      val lat = (i * 7.000070000007) % 160.0 - 80.0 + shift
      (i, Seq((lon, lat), (lon + 2.0 + i % 5, lat), (lon, lat + 2.0 + i % 7)))
    }
    val as = (0L until 120L).map(tri(_, 0.0))
    val bs = (0L until 120L).map(i => tri(i + 1000L, 1.0) match {
      case (_, t) => (i, t)
    })
    val want = (for { (ia, ta) <- as; (ib, tb) <- bs
      if refIntersects(ta, tb) } yield (ia, ib)).toSet
    val out = Overlay.triangleIntersectsJoin(toDfA(as), toDfB(bs), 8.0)
    val got = out.select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === want)
    assert(got.nonEmpty)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan)
  }
}
