package graft.core

/** Pure-Scala Douglas-Peucker polyline simplification — the kernel the
  * polygon tiler applies through JTS at tile resolution
  * (reference: MVT tooling simplifies at tile tolerance; see
  * operators/PolyTiler.scala), exposed standalone for per-track
  * simplification of ordered point sequences.
  *
  * Deterministic by construction: segment (not infinite-line) distance,
  * squared comparisons, strict `>` against tol² so an exactly-at-
  * tolerance point is dropped, and ties on the farthest point resolve
  * to the LOWEST index — the same kept-index set from any traversal
  * order. Iterative explicit stack: no recursion-depth limit on long
  * tracks.
  */
object DouglasPeucker {

  /** Squared distance from p to segment (a, b) (clamped projection). */
  def segDist2(ax: Double, ay: Double, bx: Double, by: Double,
               px: Double, py: Double): Double = {
    val dx = bx - ax
    val dy = by - ay
    val len2 = dx * dx + dy * dy
    if (len2 == 0.0) {
      val ux = px - ax; val uy = py - ay
      ux * ux + uy * uy
    } else {
      val t0 = ((px - ax) * dx + (py - ay) * dy) / len2
      val t = if (t0 < 0.0) 0.0 else if (t0 > 1.0) 1.0 else t0
      val cx = ax + t * dx; val cy = ay + t * dy
      val ux = px - cx; val uy = py - cy
      ux * ux + uy * uy
    }
  }

  /** Indices (ascending) of the points kept at tolerance `tol`; first
    * and last survive always; n ≤ 2 passes through.
    */
  def simplifyIndices(xs: Array[Double], ys: Array[Double],
                      tol: Double): Array[Int] = {
    val n = xs.length
    require(ys.length == n)
    if (n <= 2) return Array.tabulate(n)(identity)
    val tol2 = tol * tol
    val keep = new Array[Boolean](n)
    keep(0) = true
    keep(n - 1) = true
    var stack = List((0, n - 1))
    while (stack.nonEmpty) {
      val (a, b) = stack.head
      stack = stack.tail
      if (b - a > 1) {
        var best = -1
        var bestD = tol2
        var i = a + 1
        while (i < b) {
          val d = segDist2(xs(a), ys(a), xs(b), ys(b), xs(i), ys(i))
          if (d > bestD) { bestD = d; best = i } // strict > : ties → lowest i
          i += 1
        }
        if (best >= 0) {
          keep(best) = true
          stack = (a, best) :: (best, b) :: stack
        }
      }
    }
    val out = new Array[Int](keep.count(identity))
    var i = 0; var k = 0
    while (i < n) { if (keep(i)) { out(k) = i; k += 1 }; i += 1 }
    out
  }
}
