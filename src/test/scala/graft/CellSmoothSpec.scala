package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.core.HexGrid
import graft.operators.CellSmooth

class CellSmoothSpec extends AnyFunSuite {
  import SharedSpark._

  test("grid hotspot matches a hand computation on a 3-cell line") {
    import spark.implicits._
    // cells (0,0)=10, (1,0)=20, (5,5)=1 — first two are mutual neighbors
    val cells = Seq((0L, 0L, 10L), (1L, 0L, 20L), (5L, 5L, 1L))
      .toDF("x", "y", "v")
    val out = CellSmooth.gridHotspot(cells, "x", "y", "v")
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getDouble(3), r.getLong(4), r.getDouble(5))).toMap
    val mu = 31.0 / 3.0
    val sd = math.sqrt((Seq(10.0, 20.0, 1.0).map(v => (v - mu) * (v - mu)).sum) / 3.0)
    def z(s: Double, w: Long): Double = {
      val wd = w.toDouble
      BigDecimal((s - wd * mu) / (sd * math.sqrt((3 * wd - wd * wd) / 2.0)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    assert(out((0L, 0L)) === ((30.0, 2L, z(30.0, 2L))))
    assert(out((1L, 0L)) === ((30.0, 2L, z(30.0, 2L))))
    assert(out((5L, 5L)) === ((1.0, 1L, z(1.0, 1L))))
  }

  test("hex hotspot ring sums match brute-force kRing membership") {
    import spark.implicits._
    val cells = (0 until 60).map { i =>
      val lon = (i * 37) % 240 - 120.0
      val lat = (i * 23) % 120 - 60.0
      (HexGrid.cell(lon, lat, 5), (i % 7 + 1).toLong)
    }.distinct.groupBy(_._1).map { case (c, vs) => (c, vs.head._2) }.toSeq
    val df = cells.toDF("cell", "v")
    val out = CellSmooth.hexHotspot(df, "cell", "v", k = 1)
      .collect().map(r => r.getLong(0) -> (r.getDouble(2), r.getLong(3))).toMap
    // brute force: neighbor iff within ring distance 1 (symmetric)
    val m = cells.toMap
    cells.foreach { case (c, _) =>
      val ring = HexGrid.kRing(c, 1).toSet
      val want = cells.filter { case (c2, _) => ring.contains(c2) }
      assert(out(c)._1 === want.map(_._2.toDouble).sum, s"cell $c")
      assert(out(c)._2 === want.size.toLong, s"cell $c")
    }
    assert(m.nonEmpty)
  }

  test("contribution aggregation is partial (map-side combine) and stats broadcast") {
    import spark.implicits._
    val df = (0 until 200).map(i => (i.toLong % 20, i.toLong % 13, 1L))
      .distinct.toDF("x", "y", "v")
    val plan = CellSmooth.gridHotspot(df, "x", "y", "v")
      .queryExecution.executedPlan.toString
    assert(plan.contains("HashAggregate"))
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"))
  }

  test("Moran's I: brute-force parity; checkerboard repels, cluster attracts") {
    import spark.implicits._
    def moran(cells: Seq[(Long, Long, Long)]) = {
      val r = CellSmooth.gridMoransI(cells.toDF("x", "y", "v"), "x", "y", "v")
        .head()
      (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4))
    }
    // serial queen-contiguity reference
    def ref(cells: Seq[(Long, Long, Long)]): Double = {
      val n = cells.size
      val mu = cells.map(_._3).sum.toDouble / n
      val terms = for {
        a <- cells; b <- cells
        if (a._1 != b._1 || a._2 != b._2) &&
          math.abs(a._1 - b._1) <= 1 && math.abs(a._2 - b._2) <= 1
      } yield (a._3 - mu) * (b._3 - mu)
      val den = cells.map(c => (c._3 - mu) * (c._3 - mu)).sum
      n.toDouble / terms.size * terms.sum / den
    }
    val checker = for { x <- 0L until 4L; y <- 0L until 4L }
      yield (x, y, ((x + y) % 2) * 10L)
    val (_, wC, _, iC, eC) = moran(checker)
    assert(wC === 84L) // 4x4 queen grid: 4·3 + 8·5 + 4·8 ordered pairs
    // under QUEEN contiguity the diagonals of a checkerboard agree, so
    // repulsion is mild (rook pairs repel, diagonal pairs attract)
    assert(iC < -0.1 && math.abs(iC - ref(checker)) < 1e-4, s"I=$iC")
    assert(math.abs(eC - (-1.0 / 15)) < 1e-6)
    val cluster = for { x <- 0L until 4L; y <- 0L until 4L }
      yield (x, y, if (x < 2) 10L else 1L)
    val (_, _, _, iH, _) = moran(cluster)
    assert(iH > 0.2 && math.abs(iH - ref(cluster)) < 1e-4, s"I=$iH")
    // uniform values: den = 0 → 0 by convention; single cell: no pairs
    val uni = for { x <- 0L until 3L; y <- 0L until 3L } yield (x, y, 5L)
    assert(moran(uni)._4 === 0.0)
    val (n1, w1, m1, i1, e1) = moran(Seq((0L, 0L, 7L)))
    assert(n1 === 1L && w1 === 0L && m1 === 7.0 && i1 === 0.0 && e1 === 0.0)
  }

  // shared scattered test points for the surface operators
  private def surfacePts: Seq[(Long, Double, Double)] =
    (0 until 200).map { i =>
      val lon = (i * 17.000170000017) % 360.0 - 180.0
      val lat = (i * 7.000070000007) % 170.0 - 85.0
      (i.toLong, lon, lat)
    }

  // the operator's exact arithmetic, replayed serially (same op order)
  private def bruteSurface(pts: Seq[(Long, Double, Double)], cell: Double,
                           r: Double): Map[(Long, Long), Seq[(Long, Double)]] = {
    def cx(lon: Double) = math.floor((lon + 180.0) / cell).toLong
    def cy(lat: Double) = math.floor((lat + 90.0) / cell).toLong
    val centers = pts.map(p => (cx(p._2), cy(p._3))).distinct
    centers.map { case (x, y) =>
      val lonc = (x.toDouble + 0.5) * cell - 180.0
      val latc = (y.toDouble + 0.5) * cell - 90.0
      val within = pts.flatMap { case (id, lon, lat) =>
        val d2 = (lonc - lon) * (lonc - lon) + (latc - lat) * (latc - lat)
        if (d2 <= r * r) Some((id, d2)) else None
      }
      (x, y) -> within
    }.filter(_._2.nonEmpty).toMap
  }

  private def roundL(d: Double): Long = math.floor(d + 0.5).toLong

  test("KDE surface: exact parity with serial brute force; equi-join plan") {
    import spark.implicits._
    val pts = surfacePts.toDF("id", "lon", "lat")
    val out = CellSmooth.kdeSurface(pts, "lon", "lat",
      cellDeg = 6.0, radiusDeg = 6.0)
    val got = out.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    val want = bruteSurface(surfacePts.map(p => (p._1, p._2, p._3)), 6.0, 6.0)
      .map { case (k, within) =>
        val dq = within.map { case (_, d2) =>
          val k1 = 1.0 - d2 / 36.0
          roundL(k1 * k1 * 1e12)
        }.sum
        k -> ((within.size.toLong, dq))
      }
    assert(got === want)
    assert(got.nonEmpty && got.values.forall(v => v._2 >= 0L))
    // candidate generation is an equi join on the cell key — never a
    // nested-loop/cartesian over all (center, point) pairs
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("IDW surface: exact integer sums vs brute force; value within data range") {
    import spark.implicits._
    val pts = surfacePts.map(p => (p._1, p._2, p._3, (p._1 % 7).toDouble))
      .toDF("id", "lon", "lat", "v")
    val got = CellSmooth.idwGrid(pts, "lon", "lat", "v",
        cellDeg = 6.0, radiusDeg = 6.0)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))))
      .toMap
    val want = bruteSurface(surfacePts, 6.0, 6.0).map { case (k, within) =>
      val nq = within.map { case (id, d2) =>
        roundL((id % 7).toDouble * (1e9 / (1.0 + d2)))
      }.sum
      val dq = within.map { case (_, d2) => roundL(1e9 / (1.0 + d2)) }.sum
      val idw = BigDecimal(nq.toDouble / dq.toDouble)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      k -> ((within.size.toLong, nq, dq, idw))
    }
    assert(got === want)
    // interpolated values stay inside the observed value range
    assert(got.values.forall(v => v._4 >= 0.0 && v._4 <= 6.0))
  }
}
