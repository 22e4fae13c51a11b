package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Rng

/** Multimodal-column plumbing: opaque `binary` payloads + typed metadata,
  * batch decode / feature-extract / resize / frame-sample.
  *
  * The decode kernels are REAL parsers for the three uncompressed public
  * container formats that need no codec library: netpbm P6 (image), RIFF
  * WAVE PCM-16 (audio), and YUV4MPEG2 C444 (video). A compressed codec
  * (JPEG/Opus/H.264 — not shipped in this environment) would slot into the
  * same `decodeBytes` kernel without touching the Spark plumbing: the
  * binary schema, the batched mapPartitions shape (the JVM analog of a
  * Pandas UDF over mapInPandas), partitioning, and the feature pipeline
  * are format-agnostic.
  */
object Multimodal {
  final case class Media(media_id: Long, kind: String, payload: Array[Byte])
  final case class Decoded(media_id: Long, kind: String, width: Int,
                           height: Int, channels: Int, n_frames: Int,
                           features: Array[Float])

  // ======================= encoders (synthesis) =======================

  /** netpbm P6: ASCII header, then h rows of w RGB byte triples. */
  def encodePpm(w: Int, h: Int, rgb: Array[Byte]): Array[Byte] = {
    require(rgb.length == w * h * 3)
    val header = s"P6\n$w $h\n255\n".getBytes("US-ASCII")
    header ++ rgb
  }

  /** RIFF WAVE, PCM 16-bit little-endian, interleaved channels. */
  def encodeWav(channels: Int, sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    require(samples.length % channels == 0)
    val dataLen = samples.length * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(channels.toShort).putInt(sampleRate)
      .putInt(sampleRate * channels * 2).putShort((channels * 2).toShort)
      .putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(buf.putShort)
    buf.array()
  }

  /** YUV4MPEG2, C444 planar (Y, U, V full resolution), FRAME markers. */
  def encodeY4m(w: Int, h: Int, frames: Seq[Array[Byte]]): Array[Byte] = {
    require(frames.forall(_.length == 3 * w * h))
    val header = s"YUV4MPEG2 W$w H$h F25:1 Ip A1:1 C444\n".getBytes("US-ASCII")
    val frameMark = "FRAME\n".getBytes("US-ASCII")
    val out = new java.io.ByteArrayOutputStream(
      header.length + frames.map(_.length + frameMark.length).sum)
    out.write(header)
    frames.foreach { f => out.write(frameMark); out.write(f) }
    out.toByteArray
  }

  /** Deterministic synthetic media table with REAL payloads: pixel/sample
    * bytes from the counter RNG wrapped in valid P6 / WAV / Y4M containers
    * (identical at any parallelism).
    */
  def synthMedia(spark: SparkSession, n: Long, seed: Long = 43L): Dataset[Media] = {
    import spark.implicits._
    val parts = math.max(spark.sparkContext.defaultParallelism,
      math.min(20000L, n / 50000L).toInt)
    spark.range(0, n, 1, parts).map { id =>
      val kinds = Array("image", "audio", "video")
      val kind = kinds(Rng.nextInt(seed, id, 1L, 3))
      val payload = kind match {
        case "image" =>
          val w = 8 + Rng.nextInt(seed, id, 2L, 33)
          val h = 8 + Rng.nextInt(seed, id, 3L, 33)
          encodePpm(w, h, Array.tabulate(w * h * 3)(i =>
            (Rng.mix(seed, id, 100L + i) & 0xff).toByte))
        case "audio" =>
          val ch = 1 + Rng.nextInt(seed, id, 2L, 2)
          val ns = (200 + Rng.nextInt(seed, id, 3L, 1801)) * ch
          encodeWav(ch, 8000, Array.tabulate(ns)(i =>
            (Rng.mix(seed, id, 200L + i) >>> 48).toShort))
        case _ =>
          val w = 8 + Rng.nextInt(seed, id, 2L, 17)
          val h = 8 + Rng.nextInt(seed, id, 3L, 17)
          val nf = 2 + Rng.nextInt(seed, id, 4L, 11)
          encodeY4m(w, h, (0 until nf).map(f =>
            Array.tabulate(3 * w * h)(i =>
              (Rng.mix(seed, id, 300L + f * 1000003L + i) & 0xff).toByte)))
      }
      Media(id, kind, payload)
    }
  }

  // ======================= decoders (parsing) =======================

  /** Parse the P6 header (whitespace/#-comment tolerant); returns
    * (width, height, offset of pixel data). */
  def ppmHeader(p: Array[Byte]): (Int, Int, Int) = {
    require(p.length >= 2 && p(0) == 'P' && p(1) == '6', "not a P6 ppm")
    var i = 2
    val vals = new Array[Int](3)
    var v = 0
    while (v < 3) {
      while (i < p.length && (p(i) == ' ' || p(i) == '\n' || p(i) == '\r' ||
        p(i) == '\t' || p(i) == '#')) {
        if (p(i) == '#') { while (i < p.length && p(i) != '\n') i += 1 }
        else i += 1
      }
      var x = 0
      while (i < p.length && p(i) >= '0' && p(i) <= '9') {
        x = x * 10 + (p(i) - '0'); i += 1
      }
      vals(v) = x; v += 1
    }
    require(vals(2) == 255, s"maxval ${vals(2)} unsupported")
    (vals(0), vals(1), i + 1) // header ends with single whitespace byte
  }

  private def lumaOf(r: Int, g: Int, b: Int): Double =
    0.299 * r + 0.587 * g + 0.114 * b

  private def decodeImage(m: Media): Decoded = {
    val (w, h, off) = ppmHeader(m.payload)
    // A zero dimension would yield all-NaN features that slip through
    // decodeSafe as successes; surface it in the error channel instead.
    require(w > 0 && h > 0, s"degenerate image ${w}x$h")
    val n = w * h
    var sr, sg, sb, sl, sl2 = 0.0
    var lMin = 255.0; var lMax = 0.0
    val hist = new Array[Double](8)
    var i = 0
    while (i < n) {
      val r = m.payload(off + 3 * i) & 0xff
      val g = m.payload(off + 3 * i + 1) & 0xff
      val b = m.payload(off + 3 * i + 2) & 0xff
      val l = lumaOf(r, g, b)
      sr += r; sg += g; sb += b; sl += l; sl2 += l * l
      if (l < lMin) lMin = l
      if (l > lMax) lMax = l
      hist(math.min(7, (l / 32.0).toInt)) += 1.0
      i += 1
    }
    val meanL = sl / n
    val f = new Array[Float](16)
    f(0) = (sr / n).toFloat; f(1) = (sg / n).toFloat; f(2) = (sb / n).toFloat
    f(3) = meanL.toFloat
    f(4) = math.sqrt(math.max(0.0, sl2 / n - meanL * meanL)).toFloat
    f(5) = lMin.toFloat; f(6) = lMax.toFloat
    f(7) = (w.toDouble / h).toFloat
    var k = 0
    while (k < 8) { f(8 + k) = (hist(k) / n).toFloat; k += 1 }
    Decoded(m.media_id, m.kind, w, h, 3, 1, f)
  }

  private def decodeAudio(m: Media): Decoded = {
    val buf = java.nio.ByteBuffer.wrap(m.payload)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    require(m.payload.length >= 44 &&
      new String(m.payload, 0, 4, "US-ASCII") == "RIFF" &&
      new String(m.payload, 8, 4, "US-ASCII") == "WAVE", "not a RIFF WAVE")
    // walk chunks for fmt + data (tolerates extra chunks)
    var pos = 12
    var channels = 0; var bits = 0; var dataOff = -1; var dataLen = 0
    while (pos + 8 <= m.payload.length && (channels == 0 || dataOff < 0)) {
      val cid = new String(m.payload, pos, 4, "US-ASCII")
      val clen = buf.getInt(pos + 4)
      // A corrupt negative/oversized length would make the walk step by
      // <=0 (infinite loop) or read past the payload; fail into the
      // decodeSafe error channel instead.
      require(clen >= 0 && pos + 8 + clen <= m.payload.length,
        s"corrupt RIFF chunk length $clen at offset $pos")
      if (cid == "fmt ") {
        require(buf.getShort(pos + 8) == 1, "non-PCM wav")
        channels = buf.getShort(pos + 10)
        bits = buf.getShort(pos + 22)
      } else if (cid == "data") { dataOff = pos + 8; dataLen = clen }
      pos += 8 + clen + (clen & 1)
    }
    require(channels > 0 && dataOff >= 0 && bits == 16, "missing fmt/data/16-bit")
    val nTotal = dataLen / 2
    require(nTotal > 0, "empty data chunk")
    val nPerCh = nTotal / channels
    var s, s2 = 0.0; var peak = 0.0; var zc = 0; var prev = 0.0
    val hist = new Array[Double](8)
    var i = 0
    while (i < nTotal) {
      val v = buf.getShort(dataOff + 2 * i).toDouble / 32768.0
      s += v; s2 += v * v
      val a = math.abs(v)
      if (a > peak) peak = a
      if (i > 0 && (v > 0) != (prev > 0)) zc += 1
      prev = v
      hist(math.min(7, ((v + 1.0) * 4.0).toInt.max(0))) += 1.0
      i += 1
    }
    val f = new Array[Float](16)
    f(0) = (s / nTotal).toFloat
    f(1) = math.sqrt(s2 / nTotal).toFloat
    f(2) = peak.toFloat
    f(3) = (zc.toDouble / nTotal).toFloat
    var k = 0
    while (k < 8) { f(4 + k) = (hist(k) / nTotal).toFloat; k += 1 }
    f(12) = channels.toFloat
    f(13) = nPerCh.toFloat / 10000.0f
    Decoded(m.media_id, m.kind, nPerCh, 1, channels, 1, f)
  }

  /** Parse the Y4M stream header; returns (w, h, offset past header). */
  def y4mHeader(p: Array[Byte]): (Int, Int, Int) = {
    var end = 0
    while (end < p.length && p(end) != '\n') end += 1
    val head = new String(p, 0, end, "US-ASCII")
    require(head.startsWith("YUV4MPEG2"), "not a y4m stream")
    var w = -1; var h = -1
    head.split(' ').foreach { tok =>
      if (tok.startsWith("W")) w = tok.drop(1).toInt
      else if (tok.startsWith("H")) h = tok.drop(1).toInt
      else if (tok.startsWith("C")) require(tok == "C444", s"colorspace $tok")
    }
    require(w > 0 && h > 0, "missing W/H")
    (w, h, end + 1)
  }

  private val FrameMark = "FRAME\n".getBytes("US-ASCII")

  private def decodeVideo(m: Media): Decoded = {
    val (w, h, off) = y4mHeader(m.payload)
    val frameBytes = 3 * w * h
    val step = FrameMark.length + frameBytes
    val nFrames = (m.payload.length - off) / step
    require(nFrames > 0, "no frames")
    val n = w * h
    val frameMeans = new Array[Double](nFrames)
    var fi = 0
    while (fi < nFrames) {
      val base = off + fi * step + FrameMark.length
      var sy = 0.0
      var i = 0
      while (i < n) { sy += (m.payload(base + i) & 0xff); i += 1 }
      frameMeans(fi) = sy / n
      fi += 1
    }
    // histogram of first-frame Y plane
    val hist = new Array[Double](8)
    val base0 = off + FrameMark.length
    var i = 0
    while (i < n) {
      hist(math.min(7, (m.payload(base0 + i) & 0xff) / 32)) += 1.0
      i += 1
    }
    val mAll = frameMeans.sum / nFrames
    val vAll = frameMeans.map(x => (x - mAll) * (x - mAll)).sum / nFrames
    val f = new Array[Float](16)
    f(0) = (w.toDouble / h).toFloat
    f(1) = nFrames.toFloat
    f(2) = frameMeans(0).toFloat
    f(3) = frameMeans(nFrames - 1).toFloat
    f(4) = math.sqrt(vAll).toFloat
    var k = 0
    while (k < 8) { f(5 + k) = (hist(k) / n).toFloat; k += 1 }
    Decoded(m.media_id, m.kind, w, h, 3, nFrames, f)
  }

  /** Per-row decode kernel: real header parsing + feature extraction. */
  def decodeBytes(m: Media): Decoded = m.kind match {
    case "image" => decodeImage(m)
    case "audio" => decodeAudio(m)
    case "video" => decodeVideo(m)
    case other => throw new IllegalArgumentException(s"kind $other")
  }

  /** Batched decode: mapPartitions over the binary column — the Scala
    * analog of a Pandas UDF via mapInPandas (batch in, batch out; no
    * per-row closure dispatch at the plan level).
    */
  def decode(media: Dataset[Media]): Dataset[Decoded] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it => it.map(decodeBytes) }
  }

  /** Decode result with an error channel: `error` is null on success,
    * else the parse failure and a zeroed payload row. */
  final case class DecodedSafe(media_id: Long, kind: String, width: Int,
                               height: Int, channels: Int, n_frames: Int,
                               features: Array[Float], error: String)

  /** Corruption-tolerant decode — the 100 TB default: at scale a corpus
    * ALWAYS contains truncated/corrupt payloads, and a throwing kernel
    * kills the whole job for one bad row. Bad rows become zeroed rows
    * with the failure in `error` (filter or count them downstream);
    * good rows are identical to [[decode]].
    */
  def decodeSafe(media: Dataset[Media]): Dataset[DecodedSafe] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        try {
          val d = decodeBytes(m)
          DecodedSafe(d.media_id, d.kind, d.width, d.height, d.channels,
            d.n_frames, d.features, null)
        } catch {
          case e: Exception =>
            DecodedSafe(m.media_id, m.kind, 0, 0, 0, 0,
              new Array[Float](16), String.valueOf(e.getMessage))
        }
      }
    }
  }

  /** Resize plan: compute target dims bounded by `maxSide` keeping aspect
    * ratio — pure column math on decoded metadata.
    */
  def withResizePlan(decoded: DataFrame, maxSide: Int): DataFrame = {
    val scale = least(lit(1.0),
      lit(maxSide.toDouble) / greatest(col("width"), col("height")))
    // min with maxSide: dim * (maxSide / dim) can round UP past maxSide
    // (e.g. ceil(25 * (14.0/25)) = 15) — the bound is the contract
    decoded
      .withColumn("out_width",
        least(lit(maxSide), ceil(col("width") * scale).cast("int")))
      .withColumn("out_height",
        least(lit(maxSide), ceil(col("height") * scale).cast("int")))
  }

  /** REAL image resize kernel: nearest-neighbor resample of a P6 payload
    * to the `withResizePlan` target dims (same ceil(scale) arithmetic).
    */
  def resizePpm(payload: Array[Byte], maxSide: Int): Array[Byte] = {
    val (w, h, off) = ppmHeader(payload)
    val scale = math.min(1.0, maxSide.toDouble / math.max(w, h))
    if (scale >= 1.0) return payload
    // same min-with-maxSide clamp as withResizePlan (float rounding can
    // push ceil(dim * scale) one past the bound)
    val ow = math.min(maxSide, math.ceil(w * scale).toInt)
    val oh = math.min(maxSide, math.ceil(h * scale).toInt)
    val out = new Array[Byte](ow * oh * 3)
    var y = 0
    while (y < oh) {
      val sy = math.min(h - 1, (y / scale).toInt)
      var x = 0
      while (x < ow) {
        val sx = math.min(w - 1, (x / scale).toInt)
        val si = off + 3 * (sy * w + sx)
        val di = 3 * (y * ow + x)
        out(di) = payload(si); out(di + 1) = payload(si + 1)
        out(di + 2) = payload(si + 2)
        x += 1
      }
      y += 1
    }
    encodePpm(ow, oh, out)
  }

  /** Distributed resize: image rows get a resampled payload, others pass
    * through (batched kernel, same mapPartitions shape as decode). */
  def resizeImages(media: Dataset[Media], maxSide: Int): Dataset[Media] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        if (m.kind == "image") m.copy(payload = resizePpm(m.payload, maxSide))
        else m
      }
    }
  }

  /** Frame sampling plan: every `stride`-th frame index, capped. */
  def withFrameSample(decoded: DataFrame, stride: Int, maxFrames: Int): DataFrame = {
    decoded.withColumn("sampled_frames",
      when(col("n_frames") <= 1, array(lit(0)))
        .otherwise(slice(sequence(lit(0), col("n_frames") - 1, lit(stride)),
          1, maxFrames)))
  }

  /** REAL frame extraction kernel: every `stride`-th Y4M frame's Y plane
    * as a grayscale netpbm P5 payload (same indices as withFrameSample).
    */
  def sampleFramesY4m(payload: Array[Byte], stride: Int,
                      maxFrames: Int): Array[Array[Byte]] = {
    val (w, h, off) = y4mHeader(payload)
    val frameBytes = 3 * w * h
    val step = FrameMark.length + frameBytes
    val nFrames = (payload.length - off) / step
    val header = s"P5\n$w $h\n255\n".getBytes("US-ASCII")
    (0 until nFrames by stride).take(maxFrames).map { fi =>
      val base = off + fi * step + FrameMark.length
      header ++ java.util.Arrays.copyOfRange(payload, base, base + w * h)
    }.toArray
  }

  /** Distributed frame sampling: one (media_id, frame_idx, frame) row per
    * sampled video frame. */
  def explodeFrames(media: Dataset[Media], stride: Int,
                    maxFrames: Int): DataFrame = {
    import media.sparkSession.implicits._
    media.filter(col("kind") === "video")
      .flatMap { m =>
        sampleFramesY4m(m.payload, stride, maxFrames).zipWithIndex.map {
          case (fr, i) => (m.media_id, i * stride, fr)
        }
      }.toDF("media_id", "frame_idx", "frame")
  }
}
