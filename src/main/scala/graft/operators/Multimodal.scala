package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Rng

/** Multimodal-column plumbing: opaque `binary` payloads + typed metadata,
  * batch decode / feature-extract / resize / frame-sample.
  *
  * The image/audio codec libraries are NOT in this container, so the
  * decode kernel is a clearly-marked DETERMINISTIC STUB (see
  * `stubDecode`): it fabricates plausible dimensions/features as a pure
  * function of the payload bytes. Everything AROUND the stub — the binary
  * schema, the batched mapPartitions shape (the JVM analog of a Pandas
  * UDF over mapInPandas), partitioning, and the feature pipeline — is
  * real and tested; swapping in a real codec changes one function.
  */
object Multimodal {
  final case class Media(media_id: Long, kind: String, payload: Array[Byte])
  final case class Decoded(media_id: Long, kind: String, width: Int,
                           height: Int, channels: Int, n_frames: Int,
                           features: Array[Float])

  /** Deterministic synthetic media table: payload bytes from the counter
    * RNG; kinds image/audio/video.
    */
  def synthMedia(spark: SparkSession, n: Long, seed: Long = 43L): Dataset[Media] = {
    import spark.implicits._
    val parts = math.max(spark.sparkContext.defaultParallelism,
      math.min(20000L, n / 50000L).toInt)
    spark.range(0, n, 1, parts).map { id =>
      val kinds = Array("image", "audio", "video")
      val kind = kinds(Rng.nextInt(seed, id, 1L, 3))
      val len = 64 + Rng.nextInt(seed, id, 2L, 192)
      val payload = Array.tabulate(len)(i => (Rng.mix(seed, id, 100L + i) & 0xff).toByte)
      Media(id, kind, payload)
    }
  }

  /** =============== STUB — replace with a real codec ===============
    * Fabricates decode results as a pure function of the payload. The
    * real implementation would parse image headers / decode frames here.
    */
  def stubDecode(m: Media): Decoded = {
    val h0 = Rng.mix(m.payload.length.toLong,
      m.payload.take(8).foldLeft(0L)((a, b) => a * 31 + b), m.media_id)
    val width = 16 + (Rng.mix64(h0 ^ 1) >>> 32).toInt.abs % 2048
    val height = 16 + (Rng.mix64(h0 ^ 2) >>> 32).toInt.abs % 2048
    val channels = if (m.kind == "audio") 2 else 3
    val nFrames = m.kind match {
      case "video" => 1 + (Rng.mix64(h0 ^ 3) >>> 48).toInt.abs % 600
      case _ => 1
    }
    val features = Array.tabulate(16)(i =>
      (Rng.unitDouble(Rng.mix64(h0 ^ (10L + i))) * 2 - 1).toFloat)
    Decoded(m.media_id, m.kind, width, height, channels, nFrames, features)
  }
  /* =============== end STUB =============== */

  /** Batched decode: mapPartitions over the binary column — the Scala
    * analog of a Pandas UDF via mapInPandas (batch in, batch out; no
    * per-row closure dispatch at the plan level).
    */
  def decode(media: Dataset[Media]): Dataset[Decoded] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it => it.map(stubDecode) }
  }

  /** Resize plan: compute target dims bounded by `maxSide` keeping aspect
    * ratio — pure column math on decoded metadata.
    */
  def withResizePlan(decoded: DataFrame, maxSide: Int): DataFrame = {
    val scale = least(lit(1.0),
      lit(maxSide.toDouble) / greatest(col("width"), col("height")))
    decoded
      .withColumn("out_width", ceil(col("width") * scale).cast("int"))
      .withColumn("out_height", ceil(col("height") * scale).cast("int"))
  }

  /** Frame sampling plan: every `stride`-th frame index, capped. */
  def withFrameSample(decoded: DataFrame, stride: Int, maxFrames: Int): DataFrame = {
    decoded.withColumn("sampled_frames",
      when(col("n_frames") <= 1, array(lit(0)))
        .otherwise(slice(sequence(lit(0), col("n_frames") - 1, lit(stride)),
          1, maxFrames)))
  }
}
