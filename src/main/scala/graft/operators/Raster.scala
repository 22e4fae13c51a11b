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

  /** [[rasterize]] output → one global integer pixel grid (gx, gy, n):
    * gx = x·gridSize + px (and likewise gy) — the coordinate frame the
    * raster→vector extractors below consume.
    */
  def globalCells(raster: DataFrame, gridSize: Int = 256): DataFrame =
    raster.select(
      (col("x") * gridSize + col("px")).as("gx"),
      (col("y") * gridSize + col("py")).as("gy"),
      col("n"))

  /** The 16-case marching-squares segment table: for each corner mask
    * (bit 1 = corner (bx,by), 2 = (bx+1,by), 4 = (bx+1,by+1),
    * 8 = (bx,by+1); a set bit means the corner is at/above threshold),
    * the iso-segments as endpoint offsets from (bx, by) on edge
    * midpoints — every value is 0, 0.5, or 1 (exact doubles). Saddle
    * masks 5 and 10 emit TWO segments, resolved deterministically
    * (no center sampling); masks 0 and 15 emit none. Shared verbatim
    * with the q108 oracle's VALUES table so the two cannot drift.
    */
  val SegTable: Seq[(Int, Int, Double, Double, Double, Double)] = Seq(
    (1, 0, 0.0, 0.5, 0.5, 0.0),
    (2, 0, 0.5, 0.0, 1.0, 0.5),
    (3, 0, 0.0, 0.5, 1.0, 0.5),
    (4, 0, 1.0, 0.5, 0.5, 1.0),
    (5, 0, 0.0, 0.5, 0.5, 0.0), (5, 1, 1.0, 0.5, 0.5, 1.0),
    (6, 0, 0.5, 0.0, 0.5, 1.0),
    (7, 0, 0.0, 0.5, 0.5, 1.0),
    (8, 0, 0.5, 1.0, 0.0, 0.5),
    (9, 0, 0.5, 0.0, 0.5, 1.0),
    (10, 0, 0.5, 0.0, 1.0, 0.5), (10, 1, 0.5, 1.0, 0.0, 0.5),
    (11, 0, 1.0, 0.5, 0.5, 1.0),
    (12, 0, 1.0, 0.5, 0.0, 0.5),
    (13, 0, 0.5, 0.0, 1.0, 0.5),
    (14, 0, 0.0, 0.5, 0.5, 0.0))

  /** Raster → vector ISO-CONTOUR extraction (marching squares) over a
    * binary field n ≥ threshold on the (gx, gy, n) grid: every occupied
    * pixel contributes its corner bit to the ≤4 blocks it touches
    * (bounded ×4 explode), ONE groupBy sums bits into the block's corner
    * mask, and a broadcast join against [[SegTable]] emits the segments.
    * Endpoints land on edge midpoints (half-integer doubles — exact);
    * downstream can chain segments into rings, but the segment set IS
    * the contour (unordered, complete).
    *
    * Scale shape: one shuffle (the mask aggregation, key = block coord —
    * dense regions produce interior blocks that are FILTERED by the
    * mask≠15 predicate after a map-side-combinable sum); the lookup side
    * is 16 rows, always broadcast. Never materializes the empty space:
    * cost is O(occupied pixels), not O(grid area).
    */
  def contourSegments(cells: DataFrame, threshold: Long): DataFrame = {
    val spark = cells.sparkSession
    import spark.implicits._
    val occ = cells.filter(col("n") >= threshold).select("gx", "gy")
    val contrib = occ.select(explode(array(
      struct(col("gx").as("mx"), col("gy").as("my"), lit(1L).as("bit")),
      struct((col("gx") - 1).as("mx"), col("gy").as("my"), lit(2L).as("bit")),
      struct((col("gx") - 1).as("mx"), (col("gy") - 1).as("my"),
        lit(4L).as("bit")),
      struct(col("gx").as("mx"), (col("gy") - 1).as("my"),
        lit(8L).as("bit")))).as("c"))
      .select(col("c.mx"), col("c.my"), col("c.bit"))
    val masks = contrib.groupBy("mx", "my").agg(sum(col("bit")).as("mask"))
      .filter(col("mask") =!= 15L)
    val segs = broadcast(
      SegTable.toDF("mask", "seg", "dx1", "dy1", "dx2", "dy2")
        .select(col("mask").cast("long").as("mask"),
          col("seg").cast("long").as("seg"),
          col("dx1"), col("dy1"), col("dx2"), col("dy2")))
    masks.join(segs, Seq("mask"))
      .select(col("mx"), col("my"), col("mask"), col("seg"),
        (col("mx").cast("double") + col("dx1")).as("x1"),
        (col("my").cast("double") + col("dy1")).as("y1"),
        (col("mx").cast("double") + col("dx2")).as("x2"),
        (col("my").cast("double") + col("dy2")).as("y2"))
  }

  /** Raster → vector REGION extraction (polygonize): occupied pixels
    * (n ≥ threshold) grouped into 4-connected regions, one row per
    * region with pixel count, value sum, and bbox. Adjacency comes from
    * two shifted self equi joins (right and up neighbors — each pair
    * found exactly once), the transitive closure from the pointer-
    * jumping [[Dedup.connectedComponents]] (O(log diameter) supersteps),
    * so the engine never materializes a quadratic closure; region id =
    * min pixel key in the region, where key = gx·yDim + gy.
    *
    * `yDim` must exceed the grid's y extent (key collisions would merge
    * unrelated pixels); the default 2²² covers zoom 14 at gridSize 256.
    */
  def polygonize(cells: DataFrame, threshold: Long,
                 yDim: Long = 1L << 22): DataFrame = {
    val occ = cells.filter(col("n") >= threshold)
      .select(col("gx"), col("gy"), col("n"),
        (col("gx") * yDim + col("gy")).as("__id"))
      .localCheckpoint(true) // feeds two neighbor joins + the label join
    val mine = occ.select(col("gx"), col("gy"), col("__id").as("id_a"))
    val nbr = occ.select((col("gx") + 1).as("gx"), col("gy"),
        col("__id").as("id_b"))
      .unionByName(occ.select(col("gx"), (col("gy") + 1).as("gy"),
        col("__id").as("id_b")))
    val edges = mine.join(nbr, Seq("gx", "gy")).select("id_a", "id_b")
    val cc = Dedup.connectedComponents(edges, "id_a", "id_b")
    occ.join(cc, occ("__id") === cc("id"), "left")
      .select(col("gx"), col("gy"), col("n"),
        coalesce(col("cluster_id"), col("__id")).as("region_id"))
      .groupBy("region_id")
      .agg(count(lit(1)).as("n_cells"), sum(col("n")).as("sum_n"),
        min(col("gx")).as("min_gx"), max(col("gx")).as("max_gx"),
        min(col("gy")).as("min_gy"), max(col("gy")).as("max_gy"))
  }
}
