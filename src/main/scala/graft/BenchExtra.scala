package graft

import java.util.Locale
import org.apache.spark.sql.SparkSession

/** Targeted per-query benchmark (optimization-round iteration aid; the
  * frozen `graft.Bench` stays the driver's artifact). Times the named
  * queries (all when no args) through the NOOP sink — every column of
  * every row computed, no sink cost, no count-only pruning (guide §1.4)
  * — with the same session shape as Bench. Prints one JSON line:
  * {"queries":{name:sec,...},"cpu_sec":{...},"reps":N}.
  *
  * Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, SPARK_GRAFT_EXTRA_REPS.
  */
object BenchExtra {
  private def fmt(d: Double, dec: Int = 3): String =
    String.format(Locale.ROOT, s"%.${dec}f", d.asInstanceOf[AnyRef])

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val reps = sys.env.getOrElse("SPARK_GRAFT_EXTRA_REPS", "2").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench-extra")
      .config("spark.sql.shuffle.partitions", math.max(cpus * 4, 32).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4m")
      .config("spark.sql.files.maxPartitionBytes", "1m")
      .config("spark.sql.files.openCostInBytes", "512k")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "131072")
      .config("spark.local.dir", "/dev/shm/graft-spark")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val listener = new graft.plans.TaskTimeListener
    spark.sparkContext.addSparkListener(listener)
    val names = if (args.nonEmpty) args.toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    // one unmeasured warmup of the first query (JIT + codegen + planner)
    SparkEntry.queries(names.head)(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    val results = names.map { name =>
      val fn = SparkEntry.queries(name)
      val samples = (1 to reps).map { i =>
        spark.sparkContext.setJobDescription(s"$name rep$i")
        listener.reset()
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        val secs = (System.nanoTime() - t0) / 1e9
        org.apache.spark.GraftSparkBridge.waitForListeners(spark.sparkContext)
        (secs, listener.cpuSeconds)
      }
      val best = samples.minBy(_._1)
      System.err.println(s"[extra] $name " +
        samples.map(s => fmt(s._1, 2)).mkString("[", ",", "]") +
        s" cpu=${fmt(best._2, 1)}")
      (name, best)
    }
    spark.stop()
    val qs = results.map { case (k, v) => "\"" + k + "\":" + fmt(v._1) }
      .mkString("{", ",", "}")
    val cpu = results.map { case (k, v) => "\"" + k + "\":" + fmt(v._2, 1) }
      .mkString("{", ",", "}")
    println(s"""{"queries":$qs,"cpu_sec":$cpu,"reps":$reps}""")
  }
}
