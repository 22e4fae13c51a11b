package graft.core

/** Andrew's monotone-chain convex hull — pure, deterministic: points
  * sorted by (x, y), strict turns only (collinear boundary points are
  * dropped), CCW vertex order starting from the lexicographically
  * smallest point. Degenerate inputs pass through: n ≤ 2 returns the
  * distinct sorted points; all-collinear returns the two extremes.
  */
object ConvexHull {

  private def cross(ox: Double, oy: Double, ax: Double, ay: Double,
                    bx: Double, by: Double): Double =
    (ax - ox) * (by - oy) - (ay - oy) * (bx - ox)

  /** Hull vertices in CCW order (closing point NOT repeated). */
  def hull(pts: Array[(Double, Double)]): Array[(Double, Double)] = {
    val s = pts.distinct.sortBy(identity)
    if (s.length <= 2) return s
    val h = new Array[(Double, Double)](2 * s.length)
    var k = 0
    // lower chain
    for (p <- s) {
      while (k >= 2 && cross(h(k - 2)._1, h(k - 2)._2,
        h(k - 1)._1, h(k - 1)._2, p._1, p._2) <= 0) k -= 1
      h(k) = p; k += 1
    }
    // upper chain
    val lower = k + 1
    for (i <- s.length - 2 to 0 by -1) {
      val p = s(i)
      while (k >= lower && cross(h(k - 2)._1, h(k - 2)._2,
        h(k - 1)._1, h(k - 1)._2, p._1, p._2) <= 0) k -= 1
      h(k) = p; k += 1
    }
    h.take(k - 1) // last point == first
  }

  /** Shoelace area of a CCW ring (positive). */
  def area(ring: Array[(Double, Double)]): Double = {
    if (ring.length < 3) return 0.0
    var a = 0.0
    var i = 0
    while (i < ring.length) {
      val (x1, y1) = ring(i)
      val (x2, y2) = ring((i + 1) % ring.length)
      a += x1 * y2 - x2 * y1
      i += 1
    }
    a / 2.0
  }
}
