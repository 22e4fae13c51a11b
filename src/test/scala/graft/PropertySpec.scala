package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop}
import org.scalacheck.Prop.forAll
import org.scalacheck.Test.{check, Parameters}

/** Generative property tests for the round-2 kernels — randomized inputs
  * (fixed ScalaCheck seed via default params + bounded generators) probe
  * edge regions that fixed fixtures miss.
  */
class PropertySpec extends AnyFunSuite {
  private val params = Parameters.default.withMinSuccessfulTests(200)
  private def holds(p: Prop, name: String): Unit = {
    val r = check(params, p)
    assert(r.passed, s"$name: ${r.status}")
  }

  test("repetition metrics are bounded and consistent") {
    val word = Gen.oneOf("a", "bb", "ccc", "dd", "e")
    val text = Gen.listOf(word).map(_.mkString(" "))
    holds(forAll(text) { t =>
      val r = graft.core.TextStats.repetition(t)
      val n = r(0)
      (n >= 0) &&
        r.drop(1).forall(v => v >= 0.0 && v <= 1.0) &&
        // single-token text has no bigram metrics
        (n >= 2 || (r(2) == 0.0 && r(4) == 0.0)) &&
        // distinct fraction and top-word share are reciprocal bounds
        (n == 0 || r(1) >= 1.0 / n) && (n == 0 || r(3) >= 1.0 / n)
    }, "repetition")
  }

  test("rolling window hashes agree with per-substring recomputation") {
    val ch = Gen.oneOf('a', 'b', ' ', 'x', 'é')
    val strG = Gen.listOf(ch).map(_.mkString)
    val winG = Gen.choose(1, 8)
    holds(forAll(strG, winG) { (s, w) =>
      val h = graft.core.TextHash.charWindowHashes(s, w)
      val expectLen = math.max(0, s.length - w + 1)
      h.length == expectLen && h.indices.forall { i =>
        // recompute window i from scratch: identical (no drift in the
        // rolling update), and equal windows hash equal
        val direct = graft.core.TextHash.charWindowHashes(s.substring(i, i + w), w)
        direct.length == 1 && direct(0) == h(i)
      }
    }, "charWindowHashes")
  }

  test("ring stats match JTS on random closed convex-ish rings") {
    val gf = new org.locationtech.jts.geom.GeometryFactory()
    val nG = Gen.choose(3, 12)
    val seedG = Gen.choose(0L, Long.MaxValue)
    holds(forAll(nG, seedG) { (n, seed) =>
      // star polygon: angles sorted → simple (non-self-intersecting) ring
      val xs = new Array[Double](n + 1)
      val ys = new Array[Double](n + 1)
      var k = 0
      while (k < n) {
        val ang = 2 * math.Pi * k / n
        val r = 1.0 + graft.core.Rng.uniform(seed, k.toLong, 1L) * 4.0
        xs(k) = 10.0 + r * math.cos(ang)
        ys(k) = -5.0 + r * math.sin(ang)
        k += 1
      }
      xs(n) = xs(0); ys(n) = ys(0)
      val st = graft.core.GeoKernels.ringStats(xs, ys)
      val poly = gf.createPolygon(
        xs.indices.map(i => new org.locationtech.jts.geom.Coordinate(xs(i), ys(i))).toArray)
      val c = poly.getCentroid
      math.abs(math.abs(st(0)) - poly.getArea) < 1e-9 &&
        math.abs(st(1) - c.getX) < 1e-9 && math.abs(st(2) - c.getY) < 1e-9 &&
        math.abs(st(3) - poly.getExteriorRing.getLength) < 1e-9
    }, "ringStats-jts")
  }

  test("gopher kernel agrees with the independent repetition kernel") {
    val word = Gen.oneOf("the", "cat", "dog", "a", "bb", "xyz")
    val text = Gen.listOf(word).map(_.mkString(" "))
    holds(forAll(text) { t =>
      val g = graft.core.TextStats.gopher(t)
      val r = graft.core.TextStats.repetition(t)
      g(0) == r(0) && g(3) == r(3) && g(4) == r(2) &&
        // stopword count bounded by word count; mean length positive iff words
        g(2) >= 0 && g(2) <= g(0) && ((g(0) == 0) == (g(1) == 0.0))
    }, "gopher-vs-repetition")
  }

  test("haversine is a symmetric pseudo-metric bounded by half circumference") {
    val lon = Gen.choose(-180.0, 180.0)
    val lat = Gen.choose(-85.0, 85.0)
    holds(forAll(lon, lat, lon, lat) { (lo1, la1, lo2, la2) =>
      val d = graft.core.GeoKernels.haversineM(lo1, la1, lo2, la2)
      val back = graft.core.GeoKernels.haversineM(lo2, la2, lo1, la1)
      d >= 0.0 && d == back &&
        d <= math.Pi * graft.core.GeoKernels.EarthRadiusM + 1e-6 &&
        graft.core.GeoKernels.haversineM(lo1, la1, lo1, la1) == 0.0
    }, "haversine")
  }

  test("resizePpm dims always within maxSide; pixels come from the source") {
    val dim = Gen.choose(1, 40)
    val side = Gen.choose(1, 24)
    holds(Prop.forAllNoShrink(dim, dim, side, Gen.choose(0L, Long.MaxValue)) { (w, h, ms, seed) =>
      val rgb = Array.tabulate(w * h * 3)(i =>
        (graft.core.Rng.mix(seed, i, 1L) & 0xff).toByte)
      val resized = graft.operators.Multimodal.resizePpm(
        graft.operators.Multimodal.encodePpm(w, h, rgb), ms)
      val (ow, oh, off) = graft.operators.Multimodal.ppmHeader(resized)
      val srcPixels = rgb.grouped(3).map(_.toSeq).toSet
      val outPixels = resized.drop(off).grouped(3).map(_.toSeq).toSet
      ow <= math.max(ms, 1) && oh <= math.max(ms, 1) && ow >= 1 && oh >= 1 &&
        outPixels.subsetOf(srcPixels) // nearest-neighbor never invents pixels
    }, "resize")
  }

  test("sampling LCG is uniform enough and in range") {
    holds(forAll(Gen.choose(0L, Long.MaxValue)) { k =>
      // replicate Sampling.portableUniform scalar-side
      val reduced = java.lang.Math.floorMod(k, 2147483647L)
      val h = java.lang.Math.floorMod(1103515245L * reduced + 12345L, 2147483647L)
      val u = h.toDouble / 2147483647.0
      u >= 0.0 && u < 1.0
    }, "lcg-range")
    // coarse uniformity over a dense id range (the actual use: doc_id keys)
    val us = (0L until 20000L).map { k =>
      val h = java.lang.Math.floorMod(1103515245L * k + 12345L, 2147483647L)
      h.toDouble / 2147483647.0
    }
    val frac = us.count(_ < 0.3).toDouble / us.length
    assert(math.abs(frac - 0.3) < 0.02, s"rate $frac")
  }

  test("jacobi eigenvalues of a random symmetric matrix sum to its trace") {
    val entry = Gen.choose(-5.0, 5.0)
    val dimG = Gen.choose(2, 10)
    holds(forAll(dimG, Gen.listOfN(100, entry)) { (d, es) =>
      val it = Iterator.continually(es).flatten
      val m = Array.ofDim[Double](d, d)
      for (i <- 0 until d; j <- i until d) {
        val v = it.next(); m(i)(j) = v; m(j)(i) = v
      }
      val (evals, evecs) = graft.core.Eigen.jacobi(m)
      val trace = (0 until d).map(i => m(i)(i)).sum
      math.abs(evals.sum - trace) < 1e-8 * math.max(1.0, math.abs(trace)) &&
        evecs.forall(v => math.abs(v.map(x => x * x).sum - 1.0) < 1e-9)
    }, "jacobi-trace")
  }
}

class InvarianceSpec extends AnyFunSuite {
  import SharedSpark._

  test("range join results are invariant to the bucket width (tuning knob, not semantics)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val pts = (0 until 800).map(i =>
      (i.toLong, (graft.core.Rng.uniform(41L, i, 1L) * 1e5).toLong)).toDF("id", "t")
    val ivs = (0 until 120).map { i =>
      val lo = (graft.core.Rng.uniform(42L, i, 1L) * 1e5).toLong
      (i.toLong, lo, lo + (graft.core.Rng.uniform(42L, i, 2L) * 5000).toLong)
    }.toDF("id", "lo", "hi")
    def run(b: Long) = graft.operators.RangeJoin.pointInInterval(
        pts, col("id"), col("t"), ivs, col("id"), col("lo"), col("hi"), b)
      .select("interval_id", "point_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val base = run(1024)
    assert(base.nonEmpty)
    Seq(7L, 333L, 100000L).foreach(b => assert(run(b) === base, s"bucket $b"))
  }

  test("geohash bboxes nest: child bbox is inside the parent bbox") {
    import graft.core.Geohash
    (0 until 300).foreach { i =>
      val lon = graft.core.Rng.uniform(43L, i, 1L) * 360.0 - 180.0
      val lat = graft.core.Rng.uniform(43L, i, 2L) * 180.0 - 90.0
      val gh = Geohash.encode(lon, lat, 8)
      (2 to 8).foreach { p =>
        val (clo, cla, chi, cha) = Geohash.decodeBbox(gh.take(p))
        val (plo, pla, phi, pha) = Geohash.decodeBbox(gh.take(p - 1))
        assert(clo >= plo && chi <= phi && cla >= pla && cha <= pha,
          s"$gh at $p not nested")
      }
    }
  }
}
