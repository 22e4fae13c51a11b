package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Declarative gap-based sessionization — the batch counterpart of the
  * streaming mapGroupsWithState sessionizer (graft.streaming.EventStream
  * .sessionize): an event starts a new session when more than `gapSec`
  * elapses since the user's previous event; session ids are per-user
  * ordinals (1-based, in time order).
  *
  * Scale shape: both windows are PARTITIONED BY the user key — per-user
  * event streams are the natural unit (bounded per key), so there is
  * exactly one shuffle (by user) and no global order anywhere. The
  * classic lag → boundary flag → running sum formulation stays entirely
  * inside Spark's window machinery; per-session stats are one further
  * keyed aggregation that reuses the same partitioning.
  */
object Sessions {
  /** events(+userCol, tsCol) → per-session rows: (userCol, session_id,
    * n_events, start_us, end_us, duration_us).
    */
  def sessionStats(events: DataFrame, userCol: String, tsCol: String,
                   gapSec: Long): DataFrame = {
    val byUser = Window.partitionBy(userCol).orderBy(col(tsCol).asc)
    // NTZ timestamps reach epoch math via an ltz cast (session tz is
    // pinned UTC by every entrypoint, so the interpretation is fixed)
    val ts = col(tsCol).cast("timestamp")
    val t = ts.cast("double") // epoch seconds with fraction
    val assigned = events
      .withColumn("__prev", lag(t, 1).over(byUser))
      .withColumn("__new",
        when(col("__prev").isNull || t - col("__prev") > gapSec, 1L)
          .otherwise(0L))
      .withColumn("session_id", sum(col("__new")).over(byUser))
    assigned
      .groupBy(col(userCol), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        min(unix_micros(ts)).as("start_us"),
        max(unix_micros(ts)).as("end_us"))
      .withColumn("duration_us", col("end_us") - col("start_us"))
  }
}
