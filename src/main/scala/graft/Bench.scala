package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main. Prints ONE JSON line:
  * {"metric":"total","value":<sec>,"unit":"sec","queries":{...},"sf":...,
  *  "tiles_per_sec":..., "scaling":{...}}
  *
  * The headline number is end-to-end MVT pipeline throughput (pages →
  * geoparse → cells → PIP → tile encode), measured at two parallelism
  * levels (local[8] vs local[32]) on IDENTICAL input to evidence the
  * N→4N scaling-efficiency gate (BASELINE.md (c); real-cluster scaling is
  * out of sandbox scope per the driver instruction).
  */
object Bench {
  private def session(cpus: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-bench-$cpus")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private def time[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = f
    (a, (System.nanoTime() - t0) / 1e9)
  }

  /** End-to-end pipeline: pages → features → tiles; returns tile count. */
  private def pipeline(spark: SparkSession, nPages: Long): Long = {
    val pages = graft.sources.SynthPages.pagesDF(spark, nPages)
    val features = graft.operators.GeoPipeline.pagesToFeatures(spark, pages)
      .filter(org.apache.spark.sql.functions.col("lat").isNotNull)
    graft.operators.Tiler.buildTiles(features, Seq(4, 8, 12)).count()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val nPages = graft.sources.SynthPages.countForSfDir(sfDir)
    val doScaling = sys.env.getOrElse("SPARK_GRAFT_SCALING", "1") == "1"

    // ---- scaling evidence: identical pipeline at 8 and `cpus` threads ----
    var scalingJson = ""
    var tilesPerSecHi = 0.0
    var tilesHi = 0L
    if (doScaling) {
      val sLow = session(8)
      // warm JIT/classloading with a small run, then measure
      pipeline(sLow, 500)
      val (tilesLow, tLow) = time(pipeline(sLow, nPages))
      sLow.stop()
      val sHi = session(cpus)
      pipeline(sHi, 500)
      val (tiles, tHi) = time(pipeline(sHi, nPages))
      tilesHi = tiles
      tilesPerSecHi = tiles / tHi
      val speedup = tLow / tHi
      val eff = speedup / (cpus / 8.0)
      scalingJson = f""","scaling":{"pages":$nPages,"cores_low":8,"cores_high":$cpus,""" +
        f""""sec_low":$tLow%.3f,"sec_high":$tHi%.3f,"tiles":$tiles,""" +
        f""""tiles_per_sec_low":${tilesLow / tLow}%.1f,"tiles_per_sec_high":$tilesPerSecHi%.1f,""" +
        f""""speedup":$speedup%.3f,"efficiency":$eff%.3f}"""
      sHi.stop()
    }

    val spark = session(cpus)
    // warm up (parquet footers, codegen)
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()

    val headline: Seq[String] = Seq(
      "q01_pricing_summary", "q02_revenue_by_nation",
      "q03_top_orders_per_customer", "q12_pip_triangles", "q13_knn",
      "q14_tile_counts_via_tiler", "q16_rasterize", "q20_text_stats",
      "q24_minhash_pairs", "q26_ngram_jaccard", "q27_ann_topk",
      "q28_embedding_pairs", "q30_asof_nearest", "q31_window_agg")
    val results = headline.map { name =>
      val fn = SparkEntry.queries(name)
      val (_, secs) = time {
        try fn(spark, sfDir).count()
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}"); -1L }
      }
      name -> secs
    }
    // pipeline timing in the primary session too (if not already measured)
    val (pTiles, pSecs) = time(pipeline(spark, nPages))
    if (tilesPerSecHi == 0.0) { tilesPerSecHi = pTiles / pSecs; tilesHi = pTiles }

    val qs = (results :+ ("pipeline_tiles" -> pSecs))
      .map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum + pSecs
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir","pages":$nPages,"tiles":$tilesHi,"tiles_per_sec":$tilesPerSecHi%.1f$scalingJson}""")
    spark.stop()
  }
}
