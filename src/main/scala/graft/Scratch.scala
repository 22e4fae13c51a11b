package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Throwaway profiling main for optimization work (not a surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", math.max(cpus * 4, 32).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4m")
      .config("spark.sql.files.maxPartitionBytes", "1m")
      .config("spark.sql.files.openCostInBytes", "512k")
      .config("spark.local.dir", "/dev/shm/graft-spark")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[scratch] $name%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s  ($r)")
    }
    val s = spark
    def pts = {
      val d = s.read.parquet(s"$sfDir/documents.parquet").select("doc_id")
        .withColumn("lon", col("doc_id") * lit(17.000170000017) -
          floor(col("doc_id") * lit(17.000170000017) / 360.0) * 360.0 - 180.0)
        .withColumn("lat", col("doc_id") * lit(7.000070000007) -
          floor(col("doc_id") * lit(7.000070000007) / 170.0) * 170.0 - 85.0)
      d.select(col("doc_id"),
        ((col("doc_id") % 8).cast("double") * lit(45.0) - lit(157.5)
          + col("lon") * lit(0.05)).as("lon"),
        ((col("doc_id") % 8).cast("double") * lit(20.0) - lit(70.0)
          + col("lat") * lit(0.05)).as("lat"))
    }
    // warmup
    t("warm_labels") {
      graft.operators.Dbscan.clusterGrid(pts, "doc_id",
        epsDeg = 5.0, minPts = 8, cellDeg = 0.25, res = 1).count()
    }
    t("labels") {
      graft.operators.Dbscan.clusterGrid(pts, "doc_id",
        epsDeg = 5.0, minPts = 8, cellDeg = 0.25, res = 1).count()
    }
    var hulls: DataFrame = null
    t("hulls_ckpt") {
      hulls = graft.operators.Dbscan.clusterGridHulls(pts, "doc_id",
        epsDeg = 5.0, minPts = 8, cellDeg = 0.25, res = 1)
        .localCheckpoint(true)
      hulls.count()
    }
    var a: DataFrame = null
    t("wkt_parse_ckpt") {
      a = graft.operators.Overlay.wktConvexCols(
        hulls.select(col("cluster_id").as("a_id"), col("wkt")),
        "a_id", "wkt", maxN = 24, prefix = "a")
        .localCheckpoint(true)
      a.count()
    }
    t("overlay_join") {
      import s.implicits._
      val b = graft.sources.PolyRegistry.oracleTriangles.map { p =>
        (p.adminId, p.xs(0), p.ys(0), p.xs(1), p.ys(1), p.xs(2), p.ys(2))
      }.toDF("b_id", "bx1", "by1", "bx2", "by2", "bx3", "by3")
      graft.operators.Overlay.convexIntersectsJoin(a, b, nA = 24, nB = 3,
        cellDeg = 45.0, validate = false).count()
    }
    t("full_q107") {
      SparkEntry.queries("q107_hull_admin_overlay")(s, sfDir).count()
    }
    t("full_q107_again") {
      SparkEntry.queries("q107_hull_admin_overlay")(s, sfDir).count()
    }
    spark.stop()
  }
}
