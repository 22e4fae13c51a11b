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
