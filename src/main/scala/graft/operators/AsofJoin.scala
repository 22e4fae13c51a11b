package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of / nearest-timestamp join with tolerance — the reference's
  * `match_by_time` semantics (reference: mvt/detrend.py:28-34: match each
  * exposure BJD to the nearest activity timestamp, reject if Δt exceeds
  * tolerance).
  *
  * Scale shape: tolerance-bucketed equi-join (each left row probes its
  * bucket ± 1), never a cross join; ranking by |Δt| with deterministic
  * tiebreak. Any right row within tolerance τ lies in an adjacent
  * floor(ts/τ) bucket, so the bucketed join is exact.
  */
object AsofJoin {
  /** left(leftId, leftTs) × right(rightId, rightTs) → one row per left id
    * that has a right row within `tolUs` microseconds:
    * (leftId, rightId, dt_us).
    */
  def nearest(left: DataFrame, right: DataFrame,
              leftId: String, leftTs: String,
              rightId: String, rightTs: String,
              tolUs: Long): DataFrame = {
    // cast handles TIMESTAMP_NTZ inputs (session tz is pinned to UTC, so
    // the NTZ→TZ cast preserves the naive instant — matches DuckDB epoch_us)
    val l = left.select(col(leftId).as("l_id"),
        unix_micros(col(leftTs).cast("timestamp")).as("l_us"))
      .withColumn("__b0", floor(col("l_us") / tolUs))
      .withColumn("__b", explode(array(col("__b0") - 1, col("__b0"), col("__b0") + 1)))
      .drop("__b0")
    val r = right.select(col(rightId).as("r_id"),
        unix_micros(col(rightTs).cast("timestamp")).as("r_us"))
      .withColumn("__b", floor(col("r_us") / tolUs))
    val w = Window.partitionBy("l_id")
      .orderBy(abs(col("l_us") - col("r_us")).asc, col("r_id").asc)
    l.join(r, Seq("__b"))
      .filter(abs(col("l_us") - col("r_us")) <= tolUs)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col("l_id"), col("r_id"), abs(col("l_us") - col("r_us")).as("dt_us"))
  }
}
