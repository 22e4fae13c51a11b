package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** spark-submit entry point: the full resumable pipeline
  *   synth pages → extract/geoparse → cell encode → PIP join →
  *   tile build (salted/capped) → MVT encode → snapshot commit.
  *
  * Usage: graft.Main <outDir> [nPages] [zooms csv] [--resume]
  * Staged-main shape mirrors the reference pipeline main (reference:
  * mvt/run_mvt_espre.py:103-423).
  */
object Main {
  def session(cpus: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")): SparkSession = {
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cpus]"))
      .appName("graft-mvt")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "32"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  /** The pipeline from pages to tiles-with-stats, with optional resume
    * (anti-join committed tile ids BEFORE the expensive group+encode).
    */
  def run(spark: SparkSession, outDir: String, nPages: Long,
          zooms: Seq[Int], resume: Boolean): graft.plans.Lineage.Snapshot = {
    val pages = graft.sources.SynthPages.pagesDF(spark, nPages)
    val features = graft.operators.GeoPipeline.pagesToFeatures(spark, pages)
      .filter(col("lat").isNotNull && col("lon").isNotNull)

    // tile assignment first (cheap column math), then resume filter, then
    // the single heavy shuffle (group by tile) + encode
    val zoomed = graft.operators.Tiler.assignTiles(features, zooms)
    val pending =
      if (resume) graft.plans.Lineage.pendingOnly(zoomed, outDir) else zoomed

    val tiles = graft.operators.Tiler.encodeTiles(pending)
    val withStats = graft.operators.Tiler.tilesWithStats(tiles)
    graft.plans.Lineage.commit(withStats, outDir,
      s"pages=$nPages zooms=${zooms.mkString(",")} resume=$resume")
  }

  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("/tmp/graft-tiles")
    val nPages = args.lift(1).map(_.toLong).getOrElse(20000L)
    val zooms = args.lift(2).map(_.split(",").map(_.toInt).toSeq)
      .getOrElse(Seq(4, 8, 12))
    val resume = args.contains("--resume")
    val spark = session()
    val t0 = System.nanoTime()
    val snap = run(spark, outDir, nPages, zooms, resume)
    val secs = (System.nanoTime() - t0) / 1e9
    println(f"committed snapshot ${snap.id} rows=${snap.rows} " +
      f"bytes=${snap.bytes} in $secs%.1f s (${snap.rows / secs}%.1f tiles/sec)")
    spark.stop()
  }
}
