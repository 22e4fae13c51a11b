package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Bootstrap resampling (reference §2.8: mvt/injection.py:23-36
  * `bootstrap_stack`, mvt/run_mvt_espre.py:61-82 `_bootstrap_amp`):
  * n_boot× resample rows with replacement, reduce each replicate, report
  * the percentile envelope of the replicate statistics.
  *
  * Determinism under parallelism: the resample index for (boot, row) is
  * counter-based (xxhash64 of (seed, boot, row)) — identical at any
  * partitioning (SURVEY.md §7.5.2), unlike Spark's rand().
  * Scale shape: explode(n_boot) × equi-join on resample index — shuffle-
  * parallel, no driver loop.
  */
object Bootstrap {
  /** Bootstrap the per-group median of `v`: returns per group the
    * median/p16/p84 of the n_boot replicate medians.
    */
  def medianEnvelope(df: DataFrame, groupCols: Seq[String], v: Column,
                     nBoot: Int, seed: Long = 42L): DataFrame = {
    val g = groupCols.map(col)
    // stable intra-group row index (deterministic order by value, id-free)
    val w = Window.partitionBy(g: _*).orderBy(col("v").asc)
    val indexed = df.select((g :+ v.as("v")): _*)
      .withColumn("ridx", row_number().over(w) - 1)
      .withColumn("gn", count(lit(1)).over(Window.partitionBy(g: _*)))
    // fan out boots; pick resample index via counter hash
    val resampled = indexed
      .withColumn("boot", explode(sequence(lit(0), lit(nBoot - 1))))
      .withColumn("pick",
        pmod(xxhash64(lit(seed), col("boot"), col("ridx")), col("gn")))
    // join back: replicate row (boot, pick) takes value of row ridx=pick
    val picks = resampled.select((g ++ Seq(col("boot"), col("pick"))): _*)
    val joined = picks.join(
      indexed.select((g ++ Seq(col("ridx").as("pick"), col("v"))): _*),
      groupCols :+ "pick")
    val replicates = joined.groupBy((g :+ col("boot")): _*)
      .agg(median(col("v")).as("rep_med"))
    replicates.groupBy(g: _*)
      .agg(
        round(median(col("rep_med")), 6).as("boot_median"),
        round(percentile(col("rep_med"), lit(0.16)), 6).as("boot_p16"),
        round(percentile(col("rep_med"), lit(0.84)), 6).as("boot_p84"),
        count(lit(1)).as("n_boot"))
  }
}
