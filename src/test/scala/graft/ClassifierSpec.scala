package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Classifier

class ClassifierSpec extends AnyFunSuite {
  import SharedSpark._

  private def synth(n: Int) = {
    import spark.implicits._
    // two gaussian-ish blobs around (0,0) and (3,3), deterministic
    (0 until n).map { i =>
      val h1 = ((i * 2654435761L) % 2000).toDouble / 1000.0 - 1.0
      val h2 = ((i * 40503L) % 2000).toDouble / 1000.0 - 1.0
      val y = i % 2
      (i.toLong, h1 + y * 3.0, h2 + y * 3.0, y.toLong)
    }.toDF("id", "f1", "f2", "y")
  }

  /** Serial reference: identical Newton on driver-collected rows. */
  private def serialTrain(rows: Seq[(Double, Double, Double)],
                          iters: Int, ridge: Double): Array[Double] = {
    val d = 3
    var w = new Array[Double](d)
    for (_ <- 0 until iters) {
      val g = new Array[Double](d)
      val h = Array.ofDim[Double](d, d)
      rows.foreach { case (y, x1, x2) =>
        val eta = w(0) + w(1) * x1 + w(2) * x2
        val p = 1.0 / (1.0 + math.exp(-eta))
        val r = y - p
        val v = p * (1.0 - p)
        val xt = Array(1.0, x1, x2)
        for (a <- 0 until d) {
          g(a) += xt(a) * r
          for (b <- 0 until d) h(a)(b) += v * xt(a) * xt(b)
        }
      }
      for (i <- 0 until d) h(i)(i) += ridge
      // tiny 3x3 solve via the same elimination the operator uses is
      // private; re-derive with Cramer-free Gauss (no pivoting needed here)
      val delta = gauss(h, g)
      for (i <- 0 until d) w(i) += delta(i)
    }
    w
  }

  private def gauss(aIn: Array[Array[Double]], bIn: Array[Double]): Array[Double] = {
    val n = bIn.length
    val a = aIn.map(_.clone()); val b = bIn.clone()
    for (c <- 0 until n) {
      var piv = c
      for (r <- c + 1 until n) if (math.abs(a(r)(c)) > math.abs(a(piv)(c))) piv = r
      val t = a(piv); a(piv) = a(c); a(c) = t
      val tb = b(piv); b(piv) = b(c); b(c) = tb
      for (r <- c + 1 until n) {
        val f = a(r)(c) / a(c)(c)
        for (cc <- c until n) a(r)(cc) -= f * a(c)(cc)
        b(r) -= f * b(c)
      }
    }
    val x = new Array[Double](n)
    for (i <- n - 1 to 0 by -1) {
      var s = b(i)
      for (j <- i + 1 until n) s -= a(i)(j) * x(j)
      x(i) = s / a(i)(i)
    }
    x
  }

  test("separable blobs: perfect accuracy, and weights match the serial Newton") {
    val df = synth(400).cache()
    val m = Classifier.logisticTrain(df, Seq("f1", "f2"), "y")
    val rows = df.select(col("y").cast("double"), col("f1"), col("f2"))
      .collect().map(r => (r.getDouble(0), r.getDouble(1), r.getDouble(2))).toSeq
    val wRef = serialTrain(rows, iters = 8, ridge = 1e-6)
    m.weights.zip(wRef).foreach { case (a, b) =>
      assert(math.abs(a - b) < 1e-6 * math.max(1.0, math.abs(b)),
        s"${m.weights.toSeq} vs ${wRef.toSeq}")
    }
    val acc = df.withColumn("s", Classifier.logisticScore(m, Seq("f1", "f2")))
      .filter((col("s") > 0.5) === (col("y") === 1)).count()
    assert(acc === 400L, "blobs are separable; accuracy must be perfect")
    df.unpersist()
  }

  test("scores are partitioning-invariant at output rounding") {
    val df = synth(300)
    def scores(parts: Int) = {
      val m = Classifier.logisticTrain(df.repartition(parts), Seq("f1", "f2"), "y")
      df.select(col("id"),
          round(Classifier.logisticScore(m, Seq("f1", "f2")), 4).as("s"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    }
    assert(scores(1) === scores(7))
  }

  test("scoring is a pure projection (no shuffle, codegen'd)") {
    spark.catalog.clearCache()
    val m = Classifier.LogisticModel(Array(0.5, -1.0, 2.0))
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id").cast("double").as("f1"),
        col("n_chars").cast("double").as("f2"))
    val plan = docs.select(Classifier.logisticScore(m, Seq("f1", "f2")).as("s"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project") && !plan.contains("Exchange"), plan)
  }
}
