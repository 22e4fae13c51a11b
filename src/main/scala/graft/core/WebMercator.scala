package graft.core

/** WGS84 → WebMercator → zoom/x/y tile → tile-local integer coordinates.
  *
  * Target analog of the reference's coordinate-frame transforms
  * (reference: mvt/matrix.py:13-76 `_shift_to_frame`; mvt/rv.py:5-18):
  * a per-row pure-math change of frame followed by assignment onto a
  * regular grid (reference: mvt/matrix.py:78-86). All formulas here are
  * the standard slippy-map equations, kept in a shape that is also
  * expressible in ANSI SQL (ln/tan/floor) so tile assignment can be
  * oracle-checked in DuckDB.
  */
object WebMercator {
  val MaxLat: Double = 85.05112878 // atan(sinh(pi)) in degrees
  val Extent: Int = 4096           // MVT default tile extent

  @inline def clampLat(lat: Double): Double =
    math.max(-MaxLat, math.min(MaxLat, lat))

  /** Normalized mercator x in [0,1). */
  @inline def mercX(lon: Double): Double = (lon + 180.0) / 360.0

  /** Normalized mercator y in [0,1); y grows southward (slippy convention). */
  @inline def mercY(lat: Double): Double = {
    val phi = math.toRadians(clampLat(lat))
    (1.0 - math.log(math.tan(math.Pi / 4.0 + phi / 2.0)) / math.Pi) / 2.0
  }

  /** Tile x index at zoom z. */
  def tileX(lon: Double, z: Int): Long = {
    val n = 1L << z
    val x = math.floor(mercX(lon) * n).toLong
    math.max(0L, math.min(n - 1, x))
  }

  /** Tile y index at zoom z. */
  def tileY(lat: Double, z: Int): Long = {
    val n = 1L << z
    val y = math.floor(mercY(lat) * n).toLong
    math.max(0L, math.min(n - 1, y))
  }

  /** Pack (zoom, x, y) into one sortable long: 5 bits zoom, 29+29 bits x,y
    * (supports zoom ≤ 28; we use 0-16).
    */
  def tileId(z: Int, x: Long, y: Long): Long =
    (z.toLong << 58) | (x << 29) | y

  def tileIdZoom(id: Long): Int = (id >>> 58).toInt
  def tileIdX(id: Long): Long = (id >>> 29) & ((1L << 29) - 1)
  def tileIdY(id: Long): Long = id & ((1L << 29) - 1)

  /** Tile-local integer coordinate (0..extent-1 inside the tile; may fall
    * outside for geometry in the clip buffer).
    */
  def localX(lon: Double, z: Int, tx: Long, extent: Int = Extent): Int = {
    val n = (1L << z).toDouble
    math.round((mercX(lon) * n - tx) * extent).toInt
  }

  def localY(lat: Double, z: Int, ty: Long, extent: Int = Extent): Int = {
    val n = (1L << z).toDouble
    math.round((mercY(lat) * n - ty) * extent).toInt
  }

  /** Geographic bounds (lonMin, latMin, lonMax, latMax) of a tile. */
  def tileBounds(z: Int, x: Long, y: Long): (Double, Double, Double, Double) = {
    val n = (1L << z).toDouble
    def lon(tx: Double) = tx / n * 360.0 - 180.0
    def lat(ty: Double) = {
      val yNorm = 1.0 - 2.0 * ty / n
      math.toDegrees(math.atan(math.sinh(math.Pi * yNorm)))
    }
    (lon(x.toDouble), lat(y + 1.0), lon(x + 1.0), lat(y.toDouble))
  }
}
