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
    withExclusivePrefix(docs, idCol, tokCol, buckets) match {
      case None =>
        docs.select(col(idCol), col(tokCol)).withColumn("bin", lit(0L))
      case Some((prefixed, _)) =>
        prefixed.select(col(idCol), col(tokCol),
          (col("__prefix") / capacity).cast("long").as("bin"))
    }
  }

  /** Token-balanced output sharding — the shard-manifest step of a
    * training-data export: documents in deterministic `idCol` order are
    * cut into `numShards` contiguous runs of near-equal TOKEN mass (a
    * shard's mass deviates from total/numShards by at most one
    * document), so a trainer reading one shard per worker gets balanced
    * work. shard(d) = ⌊prefix(d)·S / total⌋ clamped to S−1 — pure
    * integer arithmetic over the same distributed prefix sum as
    * [[contiguousPack]]: no global window, no key-sized driver state.
    * prefix·numShards must fit in a long (at 100 TB ≈ 2.5e13 tokens and
    * 10k shards that is 2.5e17 — comfortably inside 2^63).
    * Returns (idCol, tokCol, shard).
    */
  def shardByTokens(docs: DataFrame, idCol: String, tokCol: String,
                    numShards: Int, buckets: Int = 64): DataFrame = {
    require(numShards > 0 && buckets > 0)
    withExclusivePrefix(docs, idCol, tokCol, buckets) match {
      case Some((prefixed, total)) if total > 0L =>
        prefixed
          .withColumn("shard", least(lit(numShards - 1L),
            expr(s"__prefix * ${numShards}L div ${total}L")))
          .select(col(idCol), col(tokCol), col("shard"))
      case Some((prefixed, _)) =>
        prefixed.select(col(idCol), col(tokCol)).withColumn("shard", lit(0L))
      case None =>
        docs.select(col(idCol), col(tokCol)).withColumn("shard", lit(0L))
    }
  }

  /** Shared distributed exclusive-prefix-sum core: (idCol, tokCol,
    * __prefix) in `idCol` order plus the grand token total; None when
    * the input is empty.
    *   1. range-bucket on the order key — bucket ↔ contiguous id range,
    *      so per-bucket order is a contiguous slice of the global order,
    *   2. per-bucket totals → driver prefix scan (bounded: `buckets`
    *      values — the only serial work),
    *   3. per-bucket window (parallel across buckets) + broadcast
    *      offset map.
    */
  private def withExclusivePrefix(docs: DataFrame, idCol: String,
                                  tokCol: String,
                                  buckets: Int): Option[(DataFrame, Long)] = {
    val span = docs.agg(min(col(idCol)).cast("long"),
      max(col(idCol)).cast("long")).head()
    if (span.isNullAt(0)) return None
    val (lo, hi) = (span.getLong(0), span.getLong(1))
    // full-range order keys (e.g. 64-bit content fingerprints) make
    // hi − lo exceed a long, and ANSI mode turns the wrap into a
    // runtime error — the span math runs in BigInt/decimal instead
    // (one projection, off the hot path)
    val width = (BigInt(hi) - BigInt(lo)) / buckets + 1
    val bucket = floor(
      (col(idCol).cast("decimal(38,0)")
        - lit(new java.math.BigDecimal(lo)))
        / lit(new java.math.BigDecimal(width.bigInteger))).cast("long")
    val bucketed = docs.select(col(idCol), col(tokCol))
      .withColumn("__b", bucket)
    val totals = bucketed.groupBy("__b")
      .agg(sum(col(tokCol).cast("long")).as("__t"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val offsets = (0L until buckets.toLong + 1L)
      .scanLeft(0L) { case (acc, b) => acc + totals.getOrElse(b, 0L) }
    val offsetMap = typedLit(offsets.zipWithIndex
      .map { case (o, i) => i.toLong -> o }.toMap)
    val w = Window.partitionBy("__b").orderBy(col(idCol).cast("long").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val prefixed = bucketed.withColumn("__prefix",
      coalesce(sum(col(tokCol).cast("long")).over(w), lit(0L)) +
        offsetMap(col("__b")))
    Some((prefixed, totals.valuesIterator.sum))
  }

  /** Fixed-size token-window chunking with overlap — context-window
    * preparation: whitespace tokens grouped into windows of `k` tokens
    * at stride `stride` (consecutive windows share k−stride tokens; the
    * last window may be short; a document with ≤ k tokens yields one
    * window). Chunk count = 1 + max(0, ⌈(n−k)/stride⌉), so every token
    * is covered. Pure per-row column math — tokenize, per-doc window
    * fan-out, slice — ZERO shuffle; output size ≈ k/stride × corpus.
    * Returns (idCol, chunk_id, n_tokens, text_chunk).
    */
  def chunkTokens(docs: DataFrame, textCol: String, idCol: String,
                  k: Int, stride: Int): DataFrame = {
    require(k > 0 && stride > 0 && stride <= k,
      s"need 0 < stride <= k, got k=$k stride=$stride")
    val toks = filter(split(col(textCol), "\\s+"), t => length(t) > 0)
    docs
      .withColumn("__toks", toks)
      .withColumn("__n", size(col("__toks")).cast("long"))
      .filter(col("__n") > 0)
      .withColumn("__nc",
        lit(1L) + greatest(lit(0L),
          floor((col("__n") - lit(k) + lit(stride) - 1).cast("double")
            / lit(stride)).cast("long")))
      .withColumn("chunk_id", explode(sequence(lit(0L), col("__nc") - 1)))
      .withColumn("__chunk",
        slice(col("__toks"), (col("chunk_id") * stride + 1).cast("int"), lit(k)))
      .select(col(idCol), col("chunk_id"),
        size(col("__chunk")).cast("long").as("n_tokens"),
        concat_ws(" ", col("__chunk")).as("text_chunk"))
  }
}
