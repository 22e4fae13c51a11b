package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bucketed range join: points joined to the intervals that contain them.
  *
  * Spark plans a raw `p.ts BETWEEN i.lo AND i.hi` join as
  * BroadcastNestedLoopJoin — O(points × intervals) compared rows, the
  * classic scale cliff for event-window enrichment. The standard fix is
  * bucket decomposition: explode each interval to the fixed-width buckets
  * it overlaps, bucket each point once, equi-join on the bucket (a plain
  * shuffled/broadcast hash join), and keep the exact containment filter.
  * A (point, interval) pair meets in exactly one bucket — the point's own
  * — so no distinct pass is needed.
  *
  * Scale shape: interval fan-out = ceil(len/bucket)+1 rows per interval;
  * pick `bucketWidth` near the typical interval length so the fan-out is
  * ~2× and each bucket's population stays bounded. Skewed hot buckets
  * fall under AQE skew-join handling like any other hash join.
  */
object RangeJoin {
  /** points(pointId, t) ⋈ intervals(intervalId, lo, hi) where lo ≤ t ≤ hi.
    * All of t/lo/hi must be the same numeric scale (e.g. epoch micros).
    * Output: (intervalId, pointId, t, lo, hi) — one row per containment.
    */
  def pointInInterval(points: DataFrame, pointId: Column, t: Column,
                      intervals: DataFrame, intervalId: Column,
                      lo: Column, hi: Column, bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0)
    val p = points.select(pointId.cast("long").as("point_id"),
      t.cast("long").as("t"))
      .withColumn("__bucket", floor(col("t") / bucketWidth).cast("long"))
    val iv = intervals.select(intervalId.cast("long").as("interval_id"),
      lo.cast("long").as("lo"), hi.cast("long").as("hi"))
      .filter(col("lo") <= col("hi"))
      .withColumn("__bucket",
        explode(sequence(floor(col("lo") / bucketWidth).cast("long"),
          floor(col("hi") / bucketWidth).cast("long"))))
    iv.join(p, Seq("__bucket"))
      .filter(col("t") >= col("lo") && col("t") <= col("hi"))
      .select("interval_id", "point_id", "t", "lo", "hi")
  }
}
