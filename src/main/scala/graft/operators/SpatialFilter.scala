package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.core.Geohash

/** Bounding-box spatial filtering with scan-level pushdown.
  *
  * The 100 TB pattern: a lat/lon predicate alone prunes nothing at the
  * scan — row groups aren't sorted by latitude. A geohash prefix IS the
  * standard spatial sort/partition key (q52), and a bbox decomposes
  * EXACTLY into a small set of geohash cells (geohash cells are axis-
  * aligned lat/lon rectangles — integer bin arithmetic, no curved-cell
  * approximation). So: coarse-filter on prefix membership — an OR of
  * `StartsWith` that Spark pushes into the parquet scan as
  * `StringStartsWith`, pruning row groups via column statistics when the
  * data is geohash-sorted — then refine with the exact bbox predicate.
  * The refine step makes the result exactly equal to the naive filter
  * regardless of cover precision (the cover only has to be a superset,
  * and by construction it is).
  *
  * Antimeridian-crossing boxes: split into two boxes and union — not
  * handled here (documented contract: minLon ≤ maxLon).
  */
object SpatialFilter {
  /** Inclusive lat/lon box; minLon ≤ maxLon (no antimeridian wrap). */
  final case class Bbox(minLon: Double, minLat: Double,
                        maxLon: Double, maxLat: Double) {
    require(minLon <= maxLon && minLat <= maxLat, "malformed bbox")
  }

  /** Cover: every geohash cell at `precision` that intersects the box,
    * enumerated from the lat/lon bin ranges (a geohash cell at precision p
    * spans 360/2^lonBits × 180/2^latBits degrees). `pad` widens the bin
    * ranges by that many cells per side — the filter uses pad=1 so a point
    * within one ulp of a cell boundary can never fall outside the cover
    * through floating-point disagreement between the floor binning here
    * and the bisection binning in Geohash.encode (the cover only needs to
    * be a superset; the exact refine keeps the result unchanged).
    * Driver-side metadata: the caller bounds the count via `coverForBbox`.
    */
  def bboxCover(bbox: Bbox, precision: Int, pad: Int = 0): Seq[String] = {
    require(precision >= 1 && precision <= 12)
    val bits = 5 * precision
    val lonBits = (bits + 1) / 2
    val latBits = bits / 2
    val nLon = 1L << lonBits
    val nLat = 1L << latBits
    def bin(v: Double, lo: Double, span: Double, n: Long): Long =
      math.min(n - 1, math.max(0L, math.floor((v - lo) / span * n).toLong))
    def clamp(v: Long, n: Long): Long = math.min(n - 1, math.max(0L, v))
    val lo0 = clamp(bin(bbox.minLon, -180.0, 360.0, nLon) - pad, nLon)
    val lo1 = clamp(bin(bbox.maxLon, -180.0, 360.0, nLon) + pad, nLon)
    val la0 = clamp(bin(bbox.minLat, -90.0, 180.0, nLat) - pad, nLat)
    val la1 = clamp(bin(bbox.maxLat, -90.0, 180.0, nLat) + pad, nLat)
    for {
      lo <- lo0 to lo1
      la <- la0 to la1
    } yield {
      // encode the cell's center point — lands exactly in this cell
      val cLon = -180.0 + (lo + 0.5) * 360.0 / nLon
      val cLat = -90.0 + (la + 0.5) * 180.0 / nLat
      Geohash.encode(cLon, cLat, precision)
    }
  }

  /** Finest precision whose cover stays within `maxCells` (pushdown
    * predicates are per-cell — a bounded OR keeps the plan small).
    */
  def coverForBbox(bbox: Bbox, maxCells: Int = 64): (Int, Seq[String]) = {
    var best: (Int, Seq[String]) = (1, bboxCover(bbox, 1, pad = 1))
    var p = 1
    while (p < 12) {
      p += 1
      val c = bboxCover(bbox, p, pad = 1)
      if (c.size > maxCells) return best
      best = (p, c)
    }
    best
  }

  /** Filter `df` to rows inside `bbox`. `ghCol` names a stored geohash
    * column (any precision ≥ the cover's) — the coarse OR-of-StartsWith
    * predicate on it reaches the parquet scan. Without a stored column the
    * coarse test is computed on the fly (no pushdown, but the same
    * bounded-cover shape). Result is EXACTLY the naive bbox filter.
    */
  def bboxFilter(df: DataFrame, lonCol: String, latCol: String, bbox: Bbox,
                 ghCol: Option[String] = None,
                 maxCells: Int = 64): DataFrame = {
    val (precision, cover) = coverForBbox(bbox, maxCells)
    val coarse: Column = ghCol match {
      case Some(gc) =>
        cover.map(p => col(gc).startsWith(p)).reduce(_ || _)
      case None =>
        graft.functions.geo.geohash(col(lonCol), col(latCol), lit(precision))
          .isin(cover: _*)
    }
    df.filter(coarse)
      .filter(col(lonCol).between(bbox.minLon, bbox.maxLon) &&
        col(latCol).between(bbox.minLat, bbox.maxLat))
  }
}
