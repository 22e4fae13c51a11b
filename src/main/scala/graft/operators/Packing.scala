package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LLM training: stream documents in a deterministic
  * order, accumulate token counts, and assign each document to the
  * context-window "bin" its exclusive prefix sum lands in (the standard
  * concat-and-chunk packing; a document straddling a boundary belongs to
  * the bin it starts in, mirroring how the tokenized stream is chunked).
  *
  * The scale problem is the global running sum: a naive
  * `Window.orderBy(id)` with no partition key collapses 100 TB into ONE
  * task. This is the classic distributed prefix-sum instead:
  *   1. bucket rows by a range key derived from the order column,
  *   2. per-bucket token totals → driver prefix-sum (one tiny collect,
  *      #buckets values),
  *   3. per-bucket window (parallel across buckets) + broadcast offset.
  * Every stage is key-partitioned; the only serial work is the
  * #buckets-long prefix scan on the driver.
  */
object Packing {
  /** docs(idCol numeric-ordered, tokCol) → (idCol, tokCol, bin).
    * `buckets` controls parallelism of the windowed stage; results are
    * identical for any bucket count (property-tested).
    */
  def contiguousPack(docs: DataFrame, idCol: String, tokCol: String,
                     capacity: Long, buckets: Int = 64): DataFrame = {
    require(capacity > 0 && buckets > 0)
    val spark = docs.sparkSession
    // 1. range-bucket on the order key: pmod of a monotone transform keeps
    //    bucket ↔ contiguous-id-range alignment, so per-bucket order is a
    //    contiguous slice of the global order
    val span = docs.agg(min(col(idCol)).cast("long"),
      max(col(idCol)).cast("long")).head()
    if (span.isNullAt(0))
      return docs.select(col(idCol), col(tokCol)).withColumn("bin", lit(0L))
    val (lo, hi) = (span.getLong(0), span.getLong(1))
    val width = math.max(1L, (hi - lo) / buckets + 1L)
    val bucket = floor((col(idCol).cast("long") - lo) / width).cast("long")
    val bucketed = docs.select(col(idCol), col(tokCol))
      .withColumn("__b", bucket)
    // 2. per-bucket totals → driver prefix sum (bounded: `buckets` rows)
    val totals = bucketed.groupBy("__b")
      .agg(sum(col(tokCol).cast("long")).as("__t"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val offsets = (0L until buckets.toLong + 1L)
      .scanLeft(0L) { case (acc, b) => acc + totals.getOrElse(b, 0L) }
    val offsetMap = typedLit(offsets.zipWithIndex
      .map { case (o, i) => i.toLong -> o }.toMap)
    // 3. per-bucket exclusive prefix + broadcast offset → bin
    val w = Window.partitionBy("__b").orderBy(col(idCol).cast("long").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    bucketed
      .withColumn("__prefix",
        coalesce(sum(col(tokCol).cast("long")).over(w), lit(0L)) +
          offsetMap(col("__b")))
      .select(col(idCol), col(tokCol),
        (col("__prefix") / capacity).cast("long").as("bin"))
  }
}
