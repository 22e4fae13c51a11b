package graft.core

import org.apache.spark.sql.catalyst.util.ArrayData

/** Dense-vector kernels over Catalyst ArrayData (float32 embeddings) —
  * static, allocation-light, callable from codegen'd expressions.
  */
object VecKernels {
  def dotF(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1 }
    s
  }

  def normF(a: ArrayData): Double = {
    var s = 0.0
    var i = 0
    val n = a.numElements()
    while (i < n) { val v = a.getFloat(i).toDouble; s += v * v; i += 1 }
    math.sqrt(s)
  }

  def cosineF(a: ArrayData, b: ArrayData): Double = {
    val na = normF(a); val nb = normF(b)
    if (na == 0.0 || nb == 0.0) 0.0 else dotF(a, b) / (na * nb)
  }

  /** Nearest centroid by cosine (tie → lower index). Centroids ride the
    * serialized expression (ctx.addReferenceObj) — cluster-safe, zero
    * joins, zero shuffle: the IVF assign is one codegen'd map pass.
    */
  def nearestCentroid(v: ArrayData, cs: Array[Array[Float]]): Int = {
    var best = -1
    var bestCos = Double.NegativeInfinity
    var c = 0
    while (c < cs.length) {
      val cos = cosineFA(v, cs(c))
      if (cos > bestCos) { bestCos = cos; best = c }
      c += 1
    }
    best
  }

  /** Top-`k` nearest centroids by cosine (desc, tie → lower index) — the
    * query-side probe list. k and |cs| are tiny; simple selection sort.
    */
  def nearestCentroids(v: ArrayData, cs: Array[Array[Float]], k: Int): Array[Int] = {
    val n = cs.length
    val cos = new Array[Double](n)
    var i = 0
    while (i < n) { cos(i) = cosineFA(v, cs(i)); i += 1 }
    val kk = math.min(k, n)
    val out = new Array[Int](kk)
    val taken = new Array[Boolean](n)
    var j = 0
    while (j < kk) {
      var best = -1
      var bestCos = Double.NegativeInfinity
      i = 0
      while (i < n) {
        if (!taken(i) && cos(i) > bestCos) { bestCos = cos(i); best = i }
        i += 1
      }
      taken(best) = true
      out(j) = best
      j += 1
    }
    out
  }

  /** Cosine between a Catalyst float array and a plain float[]. */
  def cosineFA(a: ArrayData, b: Array[Float]): Double = {
    val n = math.min(a.numElements(), b.length)
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble; val y = b(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Random-hyperplane LSH signature (`nBits` sign bits, ≤ 64) for cosine
    * similarity; hyperplane j, dim i weight = deterministic counter-based
    * gaussian — identical in every JVM.
    */
  def rpSignature(a: ArrayData, nBits: Int, seed: Long): Long = {
    var sig = 0L
    val n = a.numElements()
    var j = 0
    while (j < nBits) {
      var s = 0.0
      var i = 0
      while (i < n) {
        s += a.getFloat(i).toDouble * Rng.gaussian(seed, j.toLong, i.toLong)
        i += 1
      }
      if (s > 0) sig |= (1L << j)
      j += 1
    }
    sig
  }
}
