package graft.core

/** Symmetric eigen-decomposition by cyclic Jacobi rotations — the
  * textbook algorithm (Golub & Van Loan §8.5), pure Scala, deterministic
  * (fixed sweep order, fixed convergence rule, fixed sign convention).
  * Dimensions here are embedding-sized (≤ a few hundred); Jacobi's O(d³)
  * per sweep is irrelevant next to the distributed covariance pass.
  */
object Eigen {
  /** Returns (eigenvalues, eigenvectors-as-rows), sorted by eigenvalue
    * descending; ties broken by the original index for determinism. Each
    * eigenvector is sign-normalized so its largest-magnitude component
    * is positive.
    */
  def jacobi(aIn: Array[Array[Double]], maxSweeps: Int = 64,
             tol: Double = 1e-14): (Array[Double], Array[Array[Double]]) = {
    val d = aIn.length
    val a = Array.tabulate(d, d)((i, j) => aIn(i)(j))
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = offDiag(a)
    val scale = math.max(1.0, frob(a))
    while (sweep < maxSweeps && off > tol * scale) {
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          val apq = a(p)(q)
          if (math.abs(apq) > 1e-300) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            val t = math.signum(theta) match {
              case 0.0 => 1.0 / (theta + math.sqrt(theta * theta + 1.0))
              case s => s / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            }
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            // A <- J^T A J on rows/cols p,q
            var k = 0
            while (k < d) {
              val akp = a(k)(p); val akq = a(k)(q)
              a(k)(p) = c * akp - s * akq
              a(k)(q) = s * akp + c * akq
              k += 1
            }
            k = 0
            while (k < d) {
              val apk = a(p)(k); val aqk = a(q)(k)
              a(p)(k) = c * apk - s * aqk
              a(q)(k) = s * apk + c * aqk
              k += 1
            }
            k = 0
            while (k < d) {
              val vkp = v(k)(p); val vkq = v(k)(q)
              v(k)(p) = c * vkp - s * vkq
              v(k)(q) = s * vkp + c * vkq
              k += 1
            }
          }
          q += 1
        }
        p += 1
      }
      off = offDiag(a)
      sweep += 1
    }
    // sort by eigenvalue desc (tie: index asc); vectors are v's COLUMNS
    val order = (0 until d).sortBy(i => (-a(i)(i), i))
    val evals = order.map(i => a(i)(i)).toArray
    val evecs = order.map { i =>
      val col = Array.tabulate(d)(k => v(k)(i))
      // deterministic sign: largest-|component| positive
      var bi = 0
      var bm = 0.0
      var k = 0
      while (k < d) {
        if (math.abs(col(k)) > bm) { bm = math.abs(col(k)); bi = k }
        k += 1
      }
      if (col(bi) < 0) col.map(-_) else col
    }.toArray
    (evals, evecs)
  }

  private def offDiag(a: Array[Array[Double]]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) {
      var j = 0
      while (j < a.length) {
        if (i != j) s += a(i)(j) * a(i)(j)
        j += 1
      }
      i += 1
    }
    math.sqrt(s)
  }

  private def frob(a: Array[Array[Double]]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) {
      var j = 0
      while (j < a.length) { s += a(i)(j) * a(i)(j); j += 1 }
      i += 1
    }
    math.sqrt(s)
  }
}
