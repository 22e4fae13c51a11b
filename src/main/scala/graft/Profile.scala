package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level profiling main: times each pipeline stage independently on
  * a materialized page table to locate bottlenecks (dev tool).
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val nPages = args.headOption.map(_.toLong).getOrElse(20000L)
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      // small synthetic tables must still split across all cores —
      // at 100 TB the default 128 MB splits are right, here they serialize
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.sql.files.openCostInBytes", "512k")
      // object-agg buffers are growth-bounded → keep hashing far longer
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "131072")
      // shuffle on tmpfs: the sandbox disk shows burst-credit-like IOPS
      // collapse under sustained writes — RAM-backed local dirs decouple
      // measurements from it
      .config("spark.local.dir", "/dev/shm/graft-spark")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val pagesPath = s"/tmp/graft-bench-pages-$nPages"
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(pagesPath, "_SUCCESS")))
      graft.sources.SynthPages.pagesDF(spark, nPages)
        .write.mode("overwrite").parquet(pagesPath)

    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }
    // optional: repeated full-pipeline timing (arg 2 = reps)
    // optional: interleaved per-zoom vs pyramid A/B (same JVM — the host's
    // noise windows hit both variants equally); arg 2 = reps per variant
    args.lift(1).map(_.toInt).filter(_ > 0).foreach { reps =>
      def run(pyramid: Boolean): Double = {
        val t0 = System.nanoTime()
        val pages = spark.read.parquet(pagesPath)
        val features = graft.operators.GeoPipeline.pagesToFeatures(spark, pages)
          .filter(col("lat").isNotNull)
        val tiles =
          if (pyramid) graft.operators.Tiler.buildTilesPyramid(features, Seq(4, 8, 12))
          else graft.operators.Tiler.buildTiles(features, Seq(4, 8, 12))
        val n = tiles.count()
        val s = (System.nanoTime() - t0) / 1e9
        println(f"[profile] pipeline ${if (pyramid) "pyramid" else "perzoom"}%-8s cores=$cpus $s%8.2f s tiles=$n")
        s
      }
      run(pyramid = false); run(pyramid = true) // warmup both paths
      val pairs = (0 until reps).map(_ => (run(pyramid = false), run(pyramid = true)))
      println(f"[profile] MIN perzoom=${pairs.map(_._1).min}%.2f s " +
        f"pyramid=${pairs.map(_._2).min}%.2f s")
      spark.stop()
      return
    }
    val pages = spark.read.parquet(pagesPath)
    // warm
    pages.count()
    t("scan_pages")(pages.count())
    t("scan_text_only")(pages.select("text").count())
    val mentions = graft.operators.GeoPipeline.pagesToMentions(pages)
    t("mentions")(mentions.count())
    t("mentions_again")(mentions.count())
    val features = graft.operators.GeoPipeline.pagesToFeatures(spark, pages)
    t("features_pip")(features.count())
    val zoomed = graft.operators.Tiler.assignTiles(
      features.filter(col("lat").isNotNull), Seq(4, 8, 12))
    t("assign_tiles")(zoomed.count())
    t("encode_tiles")(graft.operators.Tiler.encodeTiles(zoomed).count())
    // split the encode stage: top-cap aggregation (shuffle + buffers)
    // vs the per-tile MVT encode proper
    locally {
      import spark.implicits._
      import graft.operators.{Feat, TopKFeatures}
      val proj = zoomed.select(
          col("tile_id"), col("fkey"), col("lon"), col("lat"),
          col("kind"), col("name"))
        .as[(Long, Long, Double, Double, String, String)]
      val topk = new TopKFeatures(4096).toColumn
      t("encode_agg_only")(proj.groupByKey(_._1)
        .mapValues(r => Feat(r._2, r._3, r._4, r._5, r._6))
        .agg(topk).count())
    }
    // isolate mention kinds
    val base = pages.select("url", "text")
    t("regex_labeled")(base.select(regexp_extract_all(col("text"),
      lit("""(?i)lat(?:itude)?\s*[:=]\s*(-?\d{1,2}\.\d+)\s*[,;\s]\s*(?:lon|lng|long)(?:itude)?\s*[:=]\s*(-?\d{1,3}\.\d+)"""),
      lit(1)).as("m")).select(explode(col("m"))).count())
    t("ngram_explode")(base.select(explode(split(lower(col("text")), "[^a-z]+")).as("t")).count())
    spark.stop()
  }
}
