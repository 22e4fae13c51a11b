package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed logistic regression for quality classification — the
  * "train a fastText-style keep/drop model on labeled web docs" step of a
  * training-data pipeline, built the way a 100 TB corpus demands:
  *
  * Newton-Raphson (IRLS) where each iteration is ONE distributed pass
  * computing the (d+1)-dim gradient and (d+1)²-dim Hessian as
  * per-partition partial sums (the pcaTrain shape — P × small arrays to
  * the driver, never rows), then a driver-side d×d solve. Feature
  * dimension is pipeline-feature-sized (≤ dozens), so the Hessian solve
  * is microseconds; the data passes are embarrassingly parallel with no
  * shuffle at all — the collect is the agg tree.
  *
  * Scoring is pure column arithmetic (sigmoid of the dot product unrolled
  * over feature columns) — codegen'd, streams through any plan, works on
  * batch and structured streams alike.
  */
object Classifier {
  /** weights(0) = intercept, weights(i) = coefficient of featureCols(i-1). */
  final case class LogisticModel(weights: Array[Double]) {
    require(weights.nonEmpty)
  }

  /** Fixed-iteration Newton (deterministic given data+params; default 8
    * iterations reaches machine precision on separable-scale problems).
    * `ridge` keeps the Hessian invertible on degenerate data.
    */
  def logisticTrain(df: DataFrame, featureCols: Seq[String], labelCol: String,
                    iters: Int = 8, ridge: Double = 1e-6): LogisticModel = {
    require(featureCols.nonEmpty && iters >= 1)
    val spark = df.sparkSession
    import spark.implicits._
    val d = featureCols.size + 1
    val data = df.select(col(labelCol).cast("double").as("y"),
        array(featureCols.map(c => col(c).cast("double")): _*).as("x"))
      .as[(Double, Seq[Double])]
      .cache() // iterated over `iters` times
    var w = new Array[Double](d)
    for (_ <- 0 until iters) {
      val wB = w // task-closure capture: d doubles
      val parts = data.mapPartitions { it =>
        val g = new Array[Double](d)
        val h = new Array[Double](d * d)
        it.foreach { case (y, xs) =>
          var eta = wB(0)
          var i = 0
          while (i < d - 1) { eta += wB(i + 1) * xs(i); i += 1 }
          val p = 1.0 / (1.0 + math.exp(-eta))
          val r = y - p
          val v = p * (1.0 - p)
          // x̃ = (1, x): accumulate g += x̃·r, H += v·x̃x̃ᵀ
          var a = 0
          while (a < d) {
            val xa = if (a == 0) 1.0 else xs(a - 1)
            g(a) += xa * r
            var b = 0
            while (b < d) {
              val xb = if (b == 0) 1.0 else xs(b - 1)
              h(a * d + b) += v * xa * xb
              b += 1
            }
            a += 1
          }
        }
        Iterator.single((g, h))
      }.collect()
      val g = new Array[Double](d)
      val h = Array.ofDim[Double](d, d)
      parts.foreach { case (pg, ph) =>
        var i = 0
        while (i < d) {
          g(i) += pg(i)
          var j = 0
          while (j < d) { h(i)(j) += ph(i * d + j); j += 1 }
          i += 1
        }
      }
      var i = 0
      while (i < d) { h(i)(i) += ridge; i += 1 }
      val delta = solve(h, g)
      i = 0
      while (i < d) { w(i) += delta(i); i += 1 }
    }
    data.unpersist()
    LogisticModel(w)
  }

  /** sigmoid(w·x̃) as a pure column expression over the feature columns. */
  def logisticScore(model: LogisticModel, featureCols: Seq[String]): Column = {
    require(model.weights.length == featureCols.size + 1)
    val eta = featureCols.zipWithIndex.foldLeft(lit(model.weights(0))) {
      case (acc, (c, i)) =>
        acc + col(c).cast("double") * model.weights(i + 1)
    }
    lit(1.0) / (lit(1.0) + exp(-eta))
  }

  /** Gaussian elimination with partial pivoting (driver-side, d ≤ dozens). */
  private def solve(aIn: Array[Array[Double]], bIn: Array[Double]): Array[Double] = {
    val n = bIn.length
    val a = aIn.map(_.clone())
    val b = bIn.clone()
    var col0 = 0
    while (col0 < n) {
      var piv = col0
      var r = col0 + 1
      while (r < n) {
        if (math.abs(a(r)(col0)) > math.abs(a(piv)(col0))) piv = r
        r += 1
      }
      if (piv != col0) {
        val t = a(piv); a(piv) = a(col0); a(col0) = t
        val tb = b(piv); b(piv) = b(col0); b(col0) = tb
      }
      val pv = a(col0)(col0)
      require(math.abs(pv) > 1e-300, "singular Hessian (raise ridge)")
      r = col0 + 1
      while (r < n) {
        val f = a(r)(col0) / pv
        if (f != 0.0) {
          var c = col0
          while (c < n) { a(r)(c) -= f * a(col0)(c); c += 1 }
          b(r) -= f * b(col0)
        }
        r += 1
      }
      col0 += 1
    }
    val x = new Array[Double](n)
    var i = n - 1
    while (i >= 0) {
      var s = b(i)
      var j = i + 1
      while (j < n) { s -= a(i)(j) * x(j); j += 1 }
      x(i) = s / a(i)(i)
      i -= 1
    }
    x
  }
}
