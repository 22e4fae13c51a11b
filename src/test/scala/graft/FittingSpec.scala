package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class FittingSpec extends AnyFunSuite {
  import SharedSpark._

  test("closed-form OLS matches scalar least squares") {
    import spark.implicits._
    val pts = (0 until 500).map { i =>
      val x = i.toDouble
      ("g", x, 3.5 * x + 7.25 + math.sin(i) * 0.01)
    }
    val got = graft.operators.Fitting.linearFit(
      pts.toDF("g", "x", "y"), Seq("g"), col("x"), col("y")).head
    assert(math.abs(got.getDouble(1) - 3.5) < 1e-3)
    assert(math.abs(got.getDouble(2) - 7.25) < 0.1)
  }

  test("robust stats: median/MAD correct on a known sample") {
    import spark.implicits._
    val vals = Seq(1.0, 2.0, 3.0, 4.0, 100.0) // outlier
    val got = graft.operators.Fitting.robustStats(
      vals.map(("g", _)).toDF("g", "v"), Seq("g"), col("v")).head
    assert(got.getDouble(1) === 3.0) // median
    assert(math.abs(got.getDouble(2) - 1.4826) < 1e-6) // MAD=1 → sigma
  }

  test("robust stack gates groups below min support") {
    import spark.implicits._
    val df = (Seq.fill(60)(("big", 1.0)) ++ Seq.fill(10)(("small", 2.0)))
      .toDF("g", "v")
    val got = graft.operators.Fitting.robustStack(df, Seq("g"), col("v"), 50)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(got("big").getDouble(2) === 1.0)
    assert(got("small").isNullAt(2)) // below support → gated to null
  }
}

class BootstrapSpec extends AnyFunSuite {
  import SharedSpark._

  test("bootstrap envelope brackets the true median and is deterministic") {
    val ev = spark.read.parquet(s"$sfDir/events.parquet")
    val r1 = graft.operators.Bootstrap.medianEnvelope(
      ev, Seq("event_type"), col("value"), nBoot = 50).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    val trueMed = ev.groupBy("event_type").agg(median(col("value")))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    r1.foreach { case (g, (bm, p16, p84)) =>
      assert(p16 <= bm && bm <= p84)
      assert(p16 <= trueMed(g) && trueMed(g) <= p84,
        s"$g: true=${trueMed(g)} env=[$p16,$p84]")
    }
    // determinism
    val r2 = graft.operators.Bootstrap.medianEnvelope(
      ev, Seq("event_type"), col("value"), nBoot = 50).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(r1 === r2)
  }
}

class SkewGateSpec extends AnyFunSuite {
  import SharedSpark._

  test("hot-tile partitions stay within 2x median bytes (skew gate)") {
    import spark.implicits._
    // heavy skew: 80% of points in one city block + uniform background
    val pts = (0 until 20000).map { i =>
      if (i % 5 != 0) (2.35 + (i % 97) * 1e-5, 48.85 + (i % 89) * 1e-5, s"p$i")
      else (graft.core.Rng.uniform(71L, i.toLong, 1L) * 320.0 - 160.0,
        graft.core.Rng.uniform(71L, i.toLong, 2L) * 140.0 - 70.0, s"p$i")
    }.toDF("lon", "lat", "name")
    val tiles = graft.operators.Tiler.buildTiles(pts, Seq(4, 8, 12), cap = 1024)
    val report = graft.plans.SkewReport.forTiles(tiles)
    assert(report.nonEmptyStats.nonEmpty)
    // per-TILE byte bound: hottest tile ≤ cap features, so its bytes stay
    // bounded; partition-level: max ≤ 2× median over non-empty partitions
    assert(report.gateOk(2.0),
      s"max=${report.maxBytes} median=${report.medianBytes}")
  }
}

class BinaryPagesSpec extends AnyFunSuite {
  import SharedSpark._

  test("binaryFile glob scan round-trips the frozen extraction rule") {
    val dir = java.nio.file.Files.createTempDirectory("graft-html").toString
    val pages = graft.sources.SynthPages.pagesDF(spark, 20)
    graft.sources.BinaryPages.writeHtmlFiles(pages, dir)
    val back = graft.sources.BinaryPages.readHtmlDir(spark, dir)
    assert(back.count() === 20)
    val texts = back.select("text").collect().map(_.getString(0)).sorted
    val orig = pages.select("text").collect().map(_.getString(0)).sorted
    assert(texts.toSeq === orig.toSeq) // byte-identical extraction
  }
}
