package graft.core

/** Per-group nonlinear Gaussian model fit (reference:
  * mvt/fitlines.py:19-35 `fit_gaussian_velocity`; per-row variant
  * mvt/frameqa.py:15-28 `_fit_per_row`): least-squares fit of
  *   y = a · exp(−(x − μ)² / (2σ²))
  * by Gauss–Newton with Levenberg damping, moment-based init. Pure Scala,
  * driver-free — called per group from `mapGroups`.
  */
object GaussFit {
  final case class Result(amp: Double, mu: Double, sigma: Double,
                          sse: Double, iters: Int, converged: Boolean)

  /** Fit (x, y) samples; `pts` is sorted by (x, y) by the caller for
    * bit-deterministic accumulation order.
    */
  def fit(xs: Array[Double], ys: Array[Double], maxIter: Int = 40): Result = {
    val n = xs.length
    if (n < 3) return Result(Double.NaN, Double.NaN, Double.NaN, Double.NaN, 0, false)

    // moment init: centroid & spread weighted by max(y, 0)
    var sy = 0.0; var sxy = 0.0; var ymax = 0.0
    var i = 0
    while (i < n) {
      val w = math.max(ys(i), 0.0)
      sy += w; sxy += w * xs(i)
      if (ys(i) > ymax) ymax = ys(i)
      i += 1
    }
    if (sy <= 0.0 || ymax <= 0.0)
      return Result(0.0, Double.NaN, Double.NaN, Double.NaN, 0, false)
    var mu = sxy / sy
    var s2 = 0.0
    i = 0
    while (i < n) {
      val w = math.max(ys(i), 0.0)
      val d = xs(i) - mu
      s2 += w * d * d
      i += 1
    }
    var sigma = math.max(math.sqrt(s2 / sy), 1e-6)
    var amp = ymax

    def sse(a: Double, m: Double, sg: Double): Double = {
      var e = 0.0
      var j = 0
      while (j < n) {
        val d = (xs(j) - m) / sg
        val r = ys(j) - a * math.exp(-0.5 * d * d)
        e += r * r
        j += 1
      }
      e
    }

    var lambda = 1e-9
    var curSse = sse(amp, mu, sigma)
    var it = 0
    var converged = false
    while (it < maxIter && !converged) {
      // J^T J (3×3, symmetric) and J^T r for θ = (a, μ, σ)
      var h00 = 0.0; var h01 = 0.0; var h02 = 0.0
      var h11 = 0.0; var h12 = 0.0; var h22 = 0.0
      var g0 = 0.0; var g1 = 0.0; var g2 = 0.0
      var j = 0
      while (j < n) {
        val dx = xs(j) - mu
        val e = math.exp(-0.5 * dx * dx / (sigma * sigma))
        val r = ys(j) - amp * e
        val ja = e
        val jm = amp * e * dx / (sigma * sigma)
        val js = amp * e * dx * dx / (sigma * sigma * sigma)
        h00 += ja * ja; h01 += ja * jm; h02 += ja * js
        h11 += jm * jm; h12 += jm * js; h22 += js * js
        g0 += ja * r; g1 += jm * r; g2 += js * r
        j += 1
      }
      // Levenberg: (H + λ·diag(H)) δ = g, solved by Cramer's rule
      val a00 = h00 * (1 + lambda); val a11 = h11 * (1 + lambda)
      val a22 = h22 * (1 + lambda)
      val det = a00 * (a11 * a22 - h12 * h12) -
        h01 * (h01 * a22 - h12 * h02) + h02 * (h01 * h12 - a11 * h02)
      if (det == 0.0 || det.isNaN) return Result(amp, mu, sigma, curSse, it, false)
      val d0 = (g0 * (a11 * a22 - h12 * h12) -
        h01 * (g1 * a22 - h12 * g2) + h02 * (g1 * h12 - a11 * g2)) / det
      val d1 = (a00 * (g1 * a22 - g2 * h12) -
        g0 * (h01 * a22 - h12 * h02) + h02 * (h01 * g2 - g1 * h02)) / det
      val d2 = (a00 * (a11 * g2 - h12 * g1) -
        h01 * (h01 * g2 - g1 * h02) + g0 * (h01 * h12 - a11 * h02)) / det
      val nAmp = amp + d0
      val nMu = mu + d1
      val nSigma = math.max(math.abs(sigma + d2), 1e-9)
      val nSse = sse(nAmp, nMu, nSigma)
      if (nSse <= curSse) {
        val rel = (curSse - nSse) / math.max(curSse, 1e-300)
        amp = nAmp; mu = nMu; sigma = nSigma; curSse = nSse
        lambda = math.max(lambda / 4.0, 1e-12)
        if (rel < 1e-14 || curSse < 1e-24) converged = true
      } else {
        lambda *= 10.0
        if (lambda > 1e12) converged = true // stuck: accept current optimum
      }
      it += 1
    }
    Result(amp, mu, sigma, curSse, it, converged)
  }
}
