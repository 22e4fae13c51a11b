package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.core.Geohash
import graft.operators.SpatialFilter
import graft.operators.SpatialFilter.Bbox

class SpatialFilterSpec extends AnyFunSuite {
  import SharedSpark._

  private def randPts(n: Int, seed: Long) = {
    import spark.implicits._
    (0 until n).map { i =>
      val h = (i * 2654435761L + seed) & 0x7fffffffL
      val lon = (h % 36000).toDouble / 100.0 - 180.0
      val lat = ((h / 36000) % 18000).toDouble / 100.0 - 90.0
      (i.toLong, lon, lat)
    }.toDF("id", "lon", "lat")
  }

  test("bbox filter equals the naive filter for random boxes") {
    val pts = randPts(2000, 7).cache()
    val boxes = Seq(
      Bbox(-30, 10, 20, 50), Bbox(-180, -90, 180, 90), Bbox(0, 0, 0.5, 0.5),
      Bbox(-179.9, -89.9, -170.0, -80.0), Bbox(100, 60, 179.99, 89.99))
    boxes.foreach { b =>
      val got = SpatialFilter.bboxFilter(pts, "lon", "lat", b)
        .select("id").collect().map(_.getLong(0)).toSet
      val want = pts.filter(col("lon").between(b.minLon, b.maxLon) &&
          col("lat").between(b.minLat, b.maxLat))
        .select("id").collect().map(_.getLong(0)).toSet
      assert(got === want, s"bbox $b")
    }
    pts.unpersist()
  }

  test("cover cells really cover: every in-box point's cell is in the cover") {
    val b = Bbox(-42.3, 11.7, 13.9, 55.1)
    val (p, cover) = SpatialFilter.coverForBbox(b)
    val coverSet = cover.toSet
    val pts = randPts(3000, 99).collect()
    pts.foreach { r =>
      val (lon, lat) = (r.getDouble(1), r.getDouble(2))
      if (lon >= b.minLon && lon <= b.maxLon && lat >= b.minLat && lat <= b.maxLat)
        assert(coverSet.contains(Geohash.encode(lon, lat, p)))
    }
  }

  test("coarse prefix predicate reaches the parquet scan as a pushed filter") {
    spark.catalog.clearCache()
    val dir = java.nio.file.Files.createTempDirectory("ghpush").toString
    randPts(500, 3)
      .withColumn("gh", graft.functions.geo.geohash(col("lon"), col("lat"), lit(6)))
      .sort("gh")
      .write.mode("overwrite").parquet(dir)
    val stored = spark.read.parquet(dir)
    val out = SpatialFilter.bboxFilter(stored, "lon", "lat",
      Bbox(-30, 10, 20, 50), ghCol = Some("gh"))
    val formatted = out.queryExecution.executedPlan.toString
    assert(formatted.contains("PushedFilters") &&
      formatted.contains("StringStartsWith"),
      s"expected pushed StartsWith in:\n$formatted")
    // and the pushdown path returns the same rows as the computed path
    val viaCompute = SpatialFilter.bboxFilter(stored, "lon", "lat",
      Bbox(-30, 10, 20, 50))
    assert(out.select("id").collect().map(_.getLong(0)).toSet ===
      viaCompute.select("id").collect().map(_.getLong(0)).toSet)
  }

  test("auto precision respects the cell cap and tightens for small boxes") {
    val wide = SpatialFilter.coverForBbox(Bbox(-180, -90, 180, 90), maxCells = 64)
    assert(wide._2.size <= 64)
    val small = SpatialFilter.coverForBbox(Bbox(10.0, 10.0, 10.01, 10.01))
    assert(small._1 > wide._1, "smaller box should pick a finer precision")
    assert(small._2.size <= 64)
  }
}
