package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Model-fitting operators (reference §2.7): the reference's
  * np.polyfit(deg=1) call sites (reference: mvt/run_mvt_espre.py:95,
  * mvt/residuals.py:95,257, mvt/matrix.py:313) map to closed-form OLS as
  * pure Catalyst aggregates — slope = covar_pop/var_pop, intercept from
  * the means — codegen'd, partial-aggregated, one pass.
  */
object Fitting {
  /** Per-group simple linear regression y ~ a + b·x. */
  def linearFit(df: DataFrame, groupCols: Seq[String], x: Column, y: Column,
                round6: Boolean = true): DataFrame = {
    val slope = covar_pop(x, y) / var_pop(x)
    val intercept = avg(y) - slope * avg(x)
    val r = df.groupBy(groupCols.map(col): _*)
      .agg(
        (if (round6) round(slope, 6) else slope).as("slope"),
        (if (round6) round(intercept, 6) else intercept).as("intercept"),
        count(lit(1)).as("n"))
    r
  }

  /** Robust location/scale per group: median + MAD·1.4826 (reference:
    * mvt/frameqa.py:30-34 `_baseline_band_stats`, mvt/frameguess.py:9-13
    * `_mad`) — two-pass exact (median join back for the |x−med| pass).
    */
  def robustStats(df: DataFrame, groupCols: Seq[String], v: Column): DataFrame = {
    val med = df.groupBy(groupCols.map(col): _*)
      .agg(median(v).as("med"))
    df.join(med, groupCols)
      .groupBy(groupCols.map(col): _*)
      .agg(
        first(col("med")).as("median"),
        round(median(abs(v - col("med"))) * 1.4826, 6).as("mad_sigma"),
        count(lit(1)).as("n"))
      .withColumn("median", round(col("median"), 6))
  }

  /** Per-group robust stack: median with min-support gate (reference:
    * mvt/stack.py:20-55 robust_nanmedian — NaN where support < k) plus
    * exact p16/p84 band (reference: mvt/stack.py:7-18).
    */
  def robustStack(df: DataFrame, groupCols: Seq[String], v: Column,
                  minValid: Int): DataFrame = {
    df.groupBy(groupCols.map(col): _*)
      .agg(
        count(v).as("n_valid"),
        median(v).as("med_raw"),
        percentile(v, lit(0.16)).as("p16_raw"),
        percentile(v, lit(0.84)).as("p84_raw"))
      .select(
        (groupCols.map(col) ++ Seq(
          col("n_valid"),
          round(when(col("n_valid") >= minValid, col("med_raw")), 6).as("med"),
          round(when(col("n_valid") >= minValid, col("p16_raw")), 6).as("p16"),
          round(when(col("n_valid") >= minValid, col("p84_raw")), 6).as("p84"))): _*)
  }
}
