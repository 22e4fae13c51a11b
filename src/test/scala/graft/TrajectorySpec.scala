package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core.DouglasPeucker

/** Douglas-Peucker kernel + per-track operator: parity with an
  * independent recursive reference, deterministic tie behavior, and
  * partitioning invariance of the distributed reduction.
  */
class TrajectorySpec extends AnyFunSuite {
  import SharedSpark._

  // independent recursive reference (inline distance math)
  private def refKeep(xs: Array[Double], ys: Array[Double],
                      tol: Double): Set[Int] = {
    def d2(a: Int, b: Int, p: Int): Double = {
      val dx = xs(b) - xs(a); val dy = ys(b) - ys(a)
      val l2 = dx * dx + dy * dy
      if (l2 == 0.0) {
        val ux = xs(p) - xs(a); val uy = ys(p) - ys(a); ux * ux + uy * uy
      } else {
        val t0 = ((xs(p) - xs(a)) * dx + (ys(p) - ys(a)) * dy) / l2
        val t = math.max(0.0, math.min(1.0, t0))
        val ux = xs(p) - (xs(a) + t * dx); val uy = ys(p) - (ys(a) + t * dy)
        ux * ux + uy * uy
      }
    }
    def go(a: Int, b: Int): Set[Int] =
      if (b - a <= 1) Set.empty
      else {
        var best = -1; var bd = tol * tol
        (a + 1) until b foreach { i =>
          val d = d2(a, b, i); if (d > bd) { bd = d; best = i }
        }
        if (best < 0) Set.empty else go(a, best) + best ++ go(best, b)
      }
    if (xs.length <= 2) xs.indices.toSet
    else go(0, xs.length - 1) + 0 + (xs.length - 1)
  }

  test("kernel: hand case — outlier kept, collinear jitter dropped, endpoints always") {
    val xs = Array(0.0, 1.0, 2.0, 3.0, 4.0)
    val ys = Array(0.0, 0.01, 0.0, 5.0, 0.0)
    val kept = DouglasPeucker.simplifyIndices(xs, ys, 1.0).toSeq
    // the spike splits at 3; (2,0) is then 1.7° off the (0,0)-(3,5)
    // segment so it survives too; only the 0.01° jitter at index 1 goes
    assert(kept === Seq(0, 2, 3, 4))
    // tolerance below the jitter keeps everything
    assert(DouglasPeucker.simplifyIndices(xs, ys, 0.001).toSeq ===
      Seq(0, 1, 2, 3, 4))
    // two points pass through
    assert(DouglasPeucker
      .simplifyIndices(Array(1.0, 2.0), Array(3.0, 4.0), 10.0).toSeq ===
      Seq(0, 1))
  }

  test("kernel: parity with the recursive reference on varied tracks") {
    (0 until 30).foreach { t =>
      val n = 3 + (t * 7) % 60
      val xs = Array.tabulate(n)(i =>
        120.0 * math.sin(i * 0.15 + t) + 2.0 * math.sin(i * 0.93))
      val ys = Array.tabulate(n)(i =>
        60.0 * math.sin(i * 0.11 + t) + 1.0 * math.sin(i * 0.77))
      val tol = Seq(0.5, 2.0, 5.0, 20.0)(t % 4)
      val got = DouglasPeucker.simplifyIndices(xs, ys, tol).toSet
      assert(got === refKeep(xs, ys, tol), s"track $t tol $tol")
      assert(got.contains(0) && got.contains(n - 1))
    }
  }

  test("operator: per-track results, partitioning invariance, wkt shape") {
    import spark.implicits._
    val rows = for {
      id <- 0L until 12L
      k <- 0 until (40 + (id % 5).toInt)
    } yield (id, k.toLong,
      120.0 * math.sin((k + 1) * 0.15 + id) + 2.0 * math.sin((k + 1) * 0.93),
      60.0 * math.sin((k + 1) * 0.11 + id) + 1.0 * math.sin((k + 1) * 0.77))
    val df = rows.toDF("user_id", "event_id", "lon", "lat")
    val out = graft.operators.Trajectory
      .simplifyTracks(df, "user_id", "event_id", "lon", "lat", tolDeg = 5.0)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out.size === 12)
    out.foreach { case (id, (nIn, nKept, wkt)) =>
      assert(nIn === 40 + (id % 5) && nKept >= 2 && nKept < nIn, s"track $id")
      assert(wkt.startsWith("LINESTRING(") && wkt.endsWith(")"))
      assert(wkt.count(_ == ',') === nKept - 1)
    }
    // sub-tolerance wiggle is actually pruned (the point of the tolerance)
    assert(out.values.map(_._2).sum < rows.size / 2)
    // same result from any partitioning of the input
    val shuffled = graft.operators.Trajectory
      .simplifyTracks(df.repartition(7), "user_id", "event_id",
        "lon", "lat", tolDeg = 5.0)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(shuffled === out)
  }

  test("region exposure: clipped length matches an independent serial clip; bounds hold") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(31)
    // random segments + random well-formed triangles
    val segs = (0L until 200L).map { i =>
      val x = rnd.nextDouble() * 200 - 100; val y = rnd.nextDouble() * 100 - 50
      (i, 0L, x, y, x + rnd.nextDouble() * 40 - 20, y + rnd.nextDouble() * 40 - 20)
    }
    val tris = (0L until 10L).map { i =>
      val cx = rnd.nextDouble() * 180 - 90; val cy = rnd.nextDouble() * 80 - 40
      (i, cx, cy, cx + 10 + rnd.nextDouble() * 10, cy + rnd.nextDouble() * 4,
        cx + rnd.nextDouble() * 4, cy + 10 + rnd.nextDouble() * 10)
    }
    // independent serial clip: sample-free parametric interval math
    // written separately from the SQL generator
    def clipLen(s: (Long, Long, Double, Double, Double, Double),
                t: (Long, Double, Double, Double, Double, Double, Double)): Double = {
      val vs = Seq((t._2, t._3), (t._4, t._5), (t._6, t._7))
      def or(p: (Double, Double), q: (Double, Double), x: Double, y: Double) =
        (q._1 - p._1) * (y - p._2) - (q._2 - p._2) * (x - p._1)
      var lo = 0.0; var hi = 1.0
      vs.indices.foreach { i =>
        val p = vs(i); val q = vs((i + 1) % 3)
        val os = vs.map(w => or(p, q, w._1, w._2)).sum
        val gp = os * or(p, q, s._3, s._4)
        val gq = os * or(p, q, s._5, s._6)
        if (gp >= 0 && gq >= 0) ()
        else if (gp < 0 && gq < 0) { lo = 1.0; hi = 0.0 }
        else {
          val tt = gp / (gp - gq)
          if (gp >= 0) hi = math.min(hi, tt) else lo = math.max(lo, tt)
        }
      }
      if (hi > lo)
        (hi - lo) * math.sqrt((s._5 - s._3) * (s._5 - s._3) +
          (s._6 - s._4) * (s._6 - s._4))
      else 0.0
    }
    val want = (for { s <- segs; t <- tris
      val l = clipLen(s, t) if l > 0 } yield ((s._1, t._1), l)).toMap
    val out = graft.operators.Trajectory.regionExposure(
      segs.toDF("user_id", "seq", "ax1", "ay1", "ax2", "ay2"),
      tris.toDF("admin_id", "bx1", "by1", "bx2", "by2", "bx3", "by3"),
      cellDeg = 25.0, idCols = Seq("user_id", "seq"))
    val got = out.collect().map(r =>
      ((r.getLong(0), r.getLong(2)), r.getDouble(4))).toMap
    assert(got.keySet === want.keySet)
    got.foreach { case (k, v) =>
      assert(math.abs(v - want(k)) < 1e-6, s"pair $k: $v vs ${want(k)}")
    }
    // bounds: every clipped length <= its segment's own length
    val segLen = segs.map(s => s._1 -> math.sqrt(
      (s._5 - s._3) * (s._5 - s._3) + (s._6 - s._4) * (s._6 - s._4))).toMap
    got.foreach { case ((sid, _), v) => assert(v <= segLen(sid) + 1e-9) }
    // fully-inside case: a tiny segment at a triangle centroid keeps
    // its whole length
    val t0 = tris.head
    val (cx, cy) = ((t0._2 + t0._4 + t0._6) / 3, (t0._3 + t0._5 + t0._7) / 3)
    val inner = Seq((99L, 0L, cx, cy, cx + 0.01, cy))
      .toDF("user_id", "seq", "ax1", "ay1", "ax2", "ay2")
    val innerOut = graft.operators.Trajectory.regionExposure(inner,
      tris.toDF("admin_id", "bx1", "by1", "bx2", "by2", "bx3", "by3"),
      cellDeg = 25.0, idCols = Seq("user_id"))
      .filter(col("admin_id") === t0._1).collect()
    assert(innerOut.length === 1 &&
      math.abs(innerOut.head.getDouble(3) - 0.01) < 1e-6)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("dwell episodes: revisits split runs; gates apply; serial parity on random walks") {
    import spark.implicits._
    // hand case: A A A B A A C C C C → runs (A,1..3) (B,4) (A,5..6) (C,7..10)
    val hand = Seq("A", "A", "A", "B", "A", "A", "C", "C", "C", "C")
      .zipWithIndex.map { case (c, i) =>
        (1L, (i + 1).toLong, c.hashCode.toLong, (i + 1) * 1000L) }
    val got = graft.operators.Trajectory.dwellEpisodes(
      hand.toDF("user_id", "seq", "cell", "tus"),
      "user_id", "seq", "cell", "tus", minPts = 2, minDurUs = 0L)
      .collect().map(r => (r.getLong(2), r.getLong(3), r.getLong(4))).toSet
    assert(got === Set((1L, 3L, 2000L), (5L, 2L, 1000L), (7L, 4L, 3000L)))

    // serial parity on seeded random cell walks with sticky cells
    val rnd = new scala.util.Random(47)
    val walks = (0L until 20L).flatMap { u =>
      var cell = 0L
      (1L to 50L).map { s =>
        if (rnd.nextDouble() < 0.4) cell = rnd.nextInt(5).toLong
        (u, s, cell, s * 37L + u)
      }
    }
    def serial(pts: Seq[(Long, Long, Long, Long)]) =
      pts.groupBy(_._1).toSeq.flatMap { case (u, ps) =>
        val sorted = ps.sortBy(_._2)
        val runs = scala.collection.mutable.ArrayBuffer
          .empty[scala.collection.mutable.ArrayBuffer[(Long, Long, Long, Long)]]
        sorted.foreach { p =>
          if (runs.nonEmpty && runs.last.last._3 == p._3) runs.last += p
          else runs += scala.collection.mutable.ArrayBuffer(p)
        }
        runs.filter(r => r.size >= 3 &&
            r.map(_._4).max - r.map(_._4).min >= 1)
          .map(r => (u, r.head._3, r.head._2, r.size.toLong,
            r.map(_._4).max - r.map(_._4).min))
      }.toSet
    val want = serial(walks)
    val out = graft.operators.Trajectory.dwellEpisodes(
      walks.toDF("user_id", "seq", "cell", "tus"),
      "user_id", "seq", "cell", "tus", minPts = 3, minDurUs = 1L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    assert(out === want)
    assert(want.nonEmpty)
  }
}
