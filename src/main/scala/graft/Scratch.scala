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
    // warmup full chain once
    t("warm") {
      graft.operators.Dbscan.clusterGrid(pts, "doc_id",
        epsDeg = 5.0, minPts = 8, cellDeg = 0.25, res = 1).count()
    }
    // step-by-step replay of clusterGrid internals
    val cellDeg = 0.25; val epsDeg = 5.0; val minPts = 8; val res = 1
    var withCell: DataFrame = null
    var reps: DataFrame = null
    var pairs: DataFrame = null
    var cores: DataFrame = null
    t("reps_ckpt") {
      withCell = pts
        .withColumn("__cx",
          floor((col("lon") + lit(180.0)) / lit(cellDeg)).cast("long"))
        .withColumn("__cy",
          floor((col("lat") + lit(90.0)) / lit(cellDeg)).cast("long"))
        .withColumn("__rep", col("__cx") * lit(100000L) + col("__cy"))
      reps = withCell.groupBy("__cx", "__cy", "__rep")
        .agg(count(lit(1)).as("__w"))
        .withColumn("__rlon",
          (col("__cx").cast("double") + lit(0.5)) * lit(cellDeg) - lit(180.0))
        .withColumn("__rlat",
          (col("__cy").cast("double") + lit(0.5)) * lit(cellDeg) - lit(90.0))
        .localCheckpoint(true)
      reps.rdd.getNumPartitions
    }
    t("pairs_ckpt") {
      val qs = reps.select(col("__rep").as("q_id"), col("__rlon").as("q_lon"),
        col("__rlat").as("q_lat"))
      val ps = reps.select(col("__rep").as("p_id"), col("__rlon").as("lon"),
        col("__rlat").as("lat"), col("__w"))
      pairs = graft.operators.KnnJoin.withinRadius(qs, ps, epsDeg, res,
          carry = Seq("__w"))
        .select("q_id", "p_id", "__w").localCheckpoint(true)
      s"${pairs.rdd.getNumPartitions}p"
    }
    t("pairs_count") { pairs.count() }
    t("cores_ckpt") {
      cores = pairs
        .groupBy("q_id").agg(sum("__w").as("__n"))
        .filter(col("__n") >= minPts)
        .select(col("q_id").as("id"))
        .localCheckpoint(true)
      cores.rdd.getNumPartitions
    }
    t("labels_rest") {
      val k = math.max(1L, math.floor((epsDeg / 2.0) / cellDeg).toLong)
      val coreCell = reps.select(col("__rep").as("id"),
          floor(col("__cx") / lit(k)).cast("long").as("__sc1"),
          floor(col("__cy") / lit(k)).cast("long").as("__sc2"))
        .join(cores, Seq("id"), "left_semi")
      // mirror contractedCoreLabels
      val cellMin = coreCell.groupBy(col("__sc1"), col("__sc2"))
        .agg(min(col("id")).as("__cid"))
      val coreNode = coreCell.join(cellMin, Seq("__sc1", "__sc2"))
        .select(col("id"), col("__cid"))
        .localCheckpoint(true)
      val superEdges = pairs
        .join(coreNode.select(col("id").as("q_id"), col("__cid").as("__ca")),
          Seq("q_id"))
        .join(coreNode.select(col("id").as("p_id"), col("__cid").as("__cb")),
          Seq("p_id"))
        .filter(col("__ca") =!= col("__cb"))
        .select(col("__ca").as("id_a"), col("__cb").as("id_b"))
      val cc = graft.operators.Dedup.connectedComponents(superEdges)
      val coreLabels = coreNode.join(cc, coreNode("__cid") === cc("id"), "left")
        .select(coreNode("id"),
          coalesce(col("cluster_id"), col("__cid")).as("cluster_id"))
        .localCheckpoint(true)
      coreLabels.count()
    }
    t("full_again") {
      graft.operators.Dbscan.clusterGrid(pts, "doc_id",
        epsDeg = 5.0, minPts = 8, cellDeg = 0.25, res = 1).count()
    }
    spark.stop()
  }
}
