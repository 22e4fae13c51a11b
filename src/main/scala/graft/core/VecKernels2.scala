package graft.core

import org.apache.spark.sql.catalyst.util.ArrayData

/** PCA projection kernel — static call from the codegen'd expression.
  * Split from VecKernels only to keep diffs additive.
  */
object PcaKernel {
  /** Project a float vector onto `basis` rows after centering: out_i =
    * Σ_j basis(i)(j) · (v_j − mean_j). Output float32 (embedding dtype).
    */
  def project(v: ArrayData, mean: Array[Double],
              basis: Array[Array[Double]]): Array[Float] = {
    val k = basis.length
    val d = mean.length
    val out = new Array[Float](k)
    var i = 0
    while (i < k) {
      val row = basis(i)
      var s = 0.0
      var j = 0
      while (j < d) { s += row(j) * (v.getFloat(j).toDouble - mean(j)); j += 1 }
      out(i) = s.toFloat
      i += 1
    }
    out
  }
}
