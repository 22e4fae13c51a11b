package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.geo

/** Raster ↔ vector operators (BASELINE.json north_rule "raster↔vector").
  *
  * Rasterize: points → per-(tile, pixel) counts — a pure two-level integer
  * binning, all codegen'd column math + one partial-aggregated groupBy.
  * This is the reference's grid-assignment semantics (interp-to-regular-
  * grid, mvt/matrix.py:78-86) where a point→cell encode replaces
  * interpolation (SURVEY.md §2.4).
  *
  * Vectorize: aggregated cells → hex boundary polygons (WKT) — cells
  * back to geometry.
  */
object Raster {
  /** points(lon, lat) → (zoom, x, y, px, py, n) pixel-count raster at the
    * given zoom with a gridSize×gridSize raster per tile.
    */
  def rasterize(points: DataFrame, zoom: Int, gridSize: Int = 256): DataFrame = {
    val n = (1L << zoom).toDouble
    val mercX = (col("lon") + 180.0) / 360.0
    val mercY = (lit(1.0) -
      log(tan(lit(math.Pi / 4.0) + radians(col("lat")) / 2.0)) / math.Pi) / 2.0
    val gx = floor(mercX * n * gridSize).cast("long")
    val gy = floor(mercY * n * gridSize).cast("long")
    points
      .withColumn("x", floor(mercX * n).cast("long"))
      .withColumn("y", floor(mercY * n).cast("long"))
      .withColumn("px", (gx - col("x") * gridSize).cast("long"))
      .withColumn("py", (gy - col("y") * gridSize).cast("long"))
      .groupBy("x", "y", "px", "py")
      .agg(count(lit(1)).as("n"))
      .withColumn("zoom", lit(zoom).cast("long"))
      .select("zoom", "x", "y", "px", "py", "n")
  }

  /** points(lon, lat) → hex-cell counts at `res` (the vector-side
    * aggregation).
    */
  def cellCounts(points: DataFrame, res: Int): DataFrame = {
    points
      .withColumn("cell", geo.hex_cell(col("lon"), col("lat"), lit(res)))
      .groupBy("cell").agg(count(lit(1)).as("n"))
  }

  /** cell counts → WKT hexagon polygons (vectorize) — codegen'd hex_wkt
    * expression, no closure udf in the path.
    */
  def vectorize(cells: DataFrame): DataFrame =
    cells.withColumn("wkt", geo.hex_wkt(col("cell")))
}
