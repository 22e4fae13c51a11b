package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.vec

/** Approximate-nearest-neighbor search over embedding columns.
  *
  * Baseline: brute-force cosine top-k (broadcast the small query side —
  * exact, one pass over the corpus, no corpus shuffle; the 100 TB shape).
  * Scale path: IVF — Lloyd-iterated centroids (driver-coordinated, tiny),
  * corpus partitioned by nearest centroid, queries probe `nProbe` nearest
  * lists. Recall measured against brute force in tests.
  */
object Similarity {
  /** Exact brute-force top-k: queries(id, vec) × corpus(id, vec).
    * Queries are broadcast; ranking via window over query id.
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int,
                     qId: String = "q_id", qVec: String = "q_vec",
                     cId: String = "vec_id", cVec: String = "embedding"): DataFrame = {
    val scored = corpus.crossJoin(broadcast(queries))
      .withColumn("cosine", vec.cosine_sim(col(qVec), col(cVec)))
    val w = Window.partitionBy(col(qId))
      .orderBy(col("cosine").desc, col(cId).asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(qId), col(cId), round(col("cosine"), 6).as("cosine"), col("rank"))
  }

  /** IVF index: `nCentroids` centroids refined by `iters` Lloyd steps
    * (means computed distributedly, centroids collected — tiny). Returns
    * (centroid_id, centroid_vec) and corpus assignment is recomputed on
    * demand (cheap, codegen'd).
    */
  def trainCentroids(corpus: DataFrame, nCentroids: Int, iters: Int = 3,
                     cId: String = "vec_id", cVec: String = "embedding")
      : Array[(Int, Array[Float])] = {
    val spark = corpus.sparkSession
    import spark.implicits._
    // deterministic seeding: evenly-strided corpus rows as initial centroids
    val n = corpus.count()
    val stride = math.max(1L, n / nCentroids)
    var centroids: Array[(Int, Array[Float])] = corpus
      .filter(pmod(col(cId), lit(stride)) === 0)
      .orderBy(col(cId))
      .limit(nCentroids)
      .select(col(cVec)).as[Array[Float]].collect()
      .zipWithIndex.map { case (v, i) => (i, v) }

    for (_ <- 0 until iters) {
      val cDf = centroids.toSeq.toDF("centroid_id", "centroid_vec")
      val assigned = assign(corpus, cDf, cVec)
      // dimension-wise mean via posexplode + partial-agg avg (scales:
      // shuffle keyed by (centroid, dim), never materializes a list)
      val means = assigned
        .select(col("centroid_id"), posexplode(col(cVec)).as(Seq("pos", "v")))
        .groupBy("centroid_id", "pos").agg(avg("v").as("m"))
        .groupBy("centroid_id")
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
          s => s.getField("m").cast("float")).as("mean_vec"))
        .as[(Int, Array[Float])].collect()
      // keep old centroid when a cluster went empty
      val byId = means.toMap
      centroids = centroids.map { case (i, v) => (i, byId.getOrElse(i, v)) }
    }
    centroids
  }

  /** Assign each corpus row to its nearest centroid (broadcast NL join +
    * window min — centroid count is small).
    */
  def assign(corpus: DataFrame, centroids: DataFrame,
             cVec: String = "embedding"): DataFrame = {
    val w = Window.partitionBy(col("__rowkey")).orderBy(
      col("__cos").desc, col("centroid_id").asc)
    corpus.withColumn("__rowkey", monotonically_increasing_id())
      .crossJoin(broadcast(centroids))
      .withColumn("__cos", vec.cosine_sim(col(cVec), col("centroid_vec")))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn", "__cos", "__rowkey", "centroid_vec")
  }

  /** IVF top-k: probe the `nProbe` nearest centroid lists per query. */
  def ivfTopK(queries: DataFrame, corpus: DataFrame,
              centroids: Array[(Int, Array[Float])], k: Int, nProbe: Int = 2,
              qId: String = "q_id", qVec: String = "q_vec",
              cId: String = "vec_id", cVec: String = "embedding"): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val cDf = centroids.toSeq.toDF("centroid_id", "centroid_vec")
    val assigned = assign(corpus, cDf, cVec) // corpus rows + centroid_id
    // query → nProbe nearest centroids
    val wq = Window.partitionBy(col(qId)).orderBy(col("__cos").desc,
      col("centroid_id").asc)
    val probes = queries.crossJoin(broadcast(cDf))
      .withColumn("__cos", vec.cosine_sim(col(qVec), col("centroid_vec")))
      .withColumn("__rn", row_number().over(wq))
      .filter(col("__rn") <= nProbe)
      .select(col(qId), col(qVec), col("centroid_id"))
    val w = Window.partitionBy(col(qId))
      .orderBy(col("cosine").desc, col(cId).asc)
    assigned.join(broadcast(probes), Seq("centroid_id"))
      .withColumn("cosine", vec.cosine_sim(col(qVec), col(cVec)))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(qId), col(cId), round(col("cosine"), 6).as("cosine"), col("rank"))
  }
}
