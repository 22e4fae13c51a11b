package graft.core

/** Pure-Scala planar geometry kernels (point-in-polygon, bbox, haversine)
  * — static methods callable from codegen'd expressions. JTS is used at
  * the operator layer for prepared geometries / simplification; these
  * kernels keep the per-row hot path allocation-free.
  */
object GeoKernels {
  /** Ray-casting PIP with on-edge counted as inside (matches JTS covers
    * for simple rings; fixtures never place points exactly on edges).
    * Ring is closed or open (first==last optional), coords as parallel
    * arrays.
    */
  def pointInRing(xs: Array[Double], ys: Array[Double], px: Double, py: Double): Boolean = {
    var inside = false
    val n = if (xs(0) == xs(xs.length - 1) && ys(0) == ys(ys.length - 1)) xs.length - 1 else xs.length
    var i = 0
    var j = n - 1
    while (i < n) {
      val xi = xs(i); val yi = ys(i)
      val xj = xs(j); val yj = ys(j)
      // edge crossing test
      if (((yi > py) != (yj > py)) &&
          (px < (xj - xi) * (py - yi) / (yj - yi) + xi)) inside = !inside
      // on-edge check: collinear + within bbox of segment
      val cross = (xj - xi) * (py - yi) - (yj - yi) * (px - xi)
      if (cross == 0.0 &&
          px >= math.min(xi, xj) && px <= math.max(xi, xj) &&
          py >= math.min(yi, yj) && py <= math.max(yi, yj)) return true
      j = i
      i += 1
    }
    inside
  }

  /** Squared planar distance in degrees (kNN ranking metric at small
    * extents; monotone with true distance locally).
    */
  @inline def dist2(x1: Double, y1: Double, x2: Double, y2: Double): Double = {
    val dx = x1 - x2; val dy = y1 - y2
    dx * dx + dy * dy
  }

  /** Haversine distance in kilometers (reporting metric). */
  def haversineKm(lat1: Double, lon1: Double, lat2: Double, lon2: Double): Double = {
    val R = 6371.0088
    val p1 = math.toRadians(lat1); val p2 = math.toRadians(lat2)
    val dp = p2 - p1; val dl = math.toRadians(lon2 - lon1)
    val a = math.sin(dp / 2) * math.sin(dp / 2) +
      math.cos(p1) * math.cos(p2) * math.sin(dl / 2) * math.sin(dl / 2)
    2 * R * math.asin(math.min(1.0, math.sqrt(a)))
  }
}
