package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Multimodal
import graft.operators.Multimodal.Media

/** Round-trip tests for the REAL pure-JVM multimodal decode kernels
  * (netpbm P6, RIFF WAVE PCM-16, YUV4MPEG2 C444) and the resize /
  * frame-sample kernels.
  */
class MultimodalCodecSpec extends AnyFunSuite {
  import SharedSpark._

  test("P6 decode: exact dims and hand-computed features on a known image") {
    // 2x1: pure red, pure white
    val rgb = Array[Byte](255.toByte, 0, 0, 255.toByte, 255.toByte, 255.toByte)
    val d = Multimodal.decodeBytes(Media(7L, "image", Multimodal.encodePpm(2, 1, rgb)))
    assert((d.width, d.height, d.channels, d.n_frames) === ((2, 1, 3, 1)))
    assert(d.features(0) === 255.0f)            // mean R
    assert(d.features(1) === 127.5f)            // mean G
    assert(d.features(2) === 127.5f)            // mean B
    val lumaRed = (0.299 * 255).toFloat
    assert(d.features(5) === lumaRed)           // min luma (red pixel)
    assert(d.features(6) === 255.0f)            // max luma (white pixel)
    assert(d.features(7) === 2.0f)              // aspect
    // histogram: red luma 76.2 -> bin 2, white 255 -> bin 7
    assert(d.features(8 + 2) === 0.5f && d.features(8 + 7) === 0.5f)
  }

  test("P6 header parser tolerates comments and multi-digit dims") {
    val p = ("P6\n# a comment\n12 3\n255\n" + "x" * (12 * 3 * 3)).getBytes("US-ASCII")
    assert(Multimodal.ppmHeader(p) === ((12, 3, 24)))
  }

  test("WAV decode: channels/length from the fmt chunk, exact RMS/peak/ZCR") {
    // stereo, 4 frames: constant +/- half-scale square wave
    val q = 16384.toShort // 0.5 full scale
    val samples = Array[Short](q, q, (-q).toShort, (-q).toShort,
      q, q, (-q).toShort, (-q).toShort)
    val d = Multimodal.decodeBytes(Media(8L, "audio",
      Multimodal.encodeWav(2, 8000, samples)))
    assert((d.width, d.height, d.channels, d.n_frames) === ((4, 1, 2, 1)))
    assert(d.features(1) === 0.5f)              // RMS of a +/-0.5 square
    assert(d.features(2) === 0.5f)              // peak
    assert(d.features(0) === 0.0f)              // mean
    assert(d.features(12) === 2.0f)             // channels feature
  }

  test("Y4M decode: frame count and per-frame Y means") {
    val w = 4; val h = 2
    def frame(y: Int) = Array.fill(3 * w * h)(y.toByte)
    val d = Multimodal.decodeBytes(Media(9L, "video",
      Multimodal.encodeY4m(w, h, Seq(frame(10), frame(30), frame(50)))))
    assert((d.width, d.height, d.n_frames) === ((4, 2, 3)))
    assert(d.features(2) === 10.0f)             // first frame mean Y
    assert(d.features(3) === 50.0f)             // last frame mean Y
    assert(d.features(1) === 3.0f)
  }

  test("resizePpm is nearest-neighbor exact and matches the column plan") {
    // 4x4 image with distinct corner colors; maxSide 2 -> 2x2 of sources (0,0),(2,0),(0,2),(2,2)
    val rgb = Array.tabulate(4 * 4 * 3) { i =>
      val p = i / 3; ((p * 10) + i % 3).toByte
    }
    val resized = Multimodal.resizePpm(Multimodal.encodePpm(4, 4, rgb), 2)
    val (w2, h2, off) = Multimodal.ppmHeader(resized)
    assert((w2, h2) === ((2, 2)))
    val px = (x: Int, y: Int) => resized(off + 3 * (y * 2 + x)) & 0xff
    assert(px(0, 0) === 0)    // src pixel 0
    assert(px(1, 0) === 20)   // src pixel 2
    assert(px(0, 1) === 80)   // src pixel 8
    assert(px(1, 1) === 100)  // src pixel 10

    // distributed: decode(resizeImages(media)) dims == withResizePlan dims
    val media = Multimodal.synthMedia(spark, 300)
    val plan = Multimodal.withResizePlan(
      Multimodal.decode(media).toDF(), maxSide = 24)
      .select(col("media_id"), col("out_width"), col("out_height"))
    val real = Multimodal.decode(Multimodal.resizeImages(media, maxSide = 24))
      .toDF().select(col("media_id"), col("width").as("rw"), col("height").as("rh"))
    val mism = plan.join(real, "media_id")
      .join(media.toDF().select(col("media_id"), col("kind")), "media_id")
      .filter(col("kind") === "image" &&
        (col("out_width") =!= col("rw") || col("out_height") =!= col("rh")))
    assert(mism.count() === 0)
  }

  test("sampleFramesY4m indices match the withFrameSample plan; frames are valid P5") {
    val media = Multimodal.synthMedia(spark, 200)
    val frames = Multimodal.explodeFrames(media, stride = 3, maxFrames = 4)
    val planned = Multimodal.withFrameSample(
      Multimodal.decode(media).toDF(), stride = 3, maxFrames = 4)
      .filter(col("kind") === "video")
      .select(col("media_id"), explode(col("sampled_frames")).as("frame_idx"))
    // exact same (media_id, frame_idx) multiset
    assert(frames.select("media_id", "frame_idx").exceptAll(planned).count() === 0)
    assert(planned.exceptAll(frames.select("media_id", "frame_idx")).count() === 0)
    // each extracted frame is a parseable grayscale P5 with the video's dims
    val bad = frames.join(media.toDF().select(col("media_id"), col("payload")), "media_id")
      .collect().count { r =>
        val fr = r.getAs[Array[Byte]]("frame")
        val (w, h, _) = Multimodal.y4mHeader(r.getAs[Array[Byte]]("payload"))
        val expectHeader = s"P5\n$w $h\n255\n".getBytes("US-ASCII")
        !(fr.length == expectHeader.length + w * h &&
          fr.startsWith(expectHeader))
      }
    assert(bad === 0)
  }

  test("decode is parallelism-invariant (counter-based generation)") {
    def sig(parts: Int): Seq[String] = {
      val m = Multimodal.synthMedia(spark, 150).repartition(parts)
      Multimodal.decode(m).toDF()
        .select(col("media_id"), col("width"), col("height"),
          col("n_frames"), col("features")(0), col("features")(5))
        .collect().map(_.toString).sorted.toSeq
    }
    assert(sig(1) === sig(6))
  }
}

class MultimodalSafeSpec extends AnyFunSuite {
  import SharedSpark._
  import graft.operators.Multimodal
  import graft.operators.Multimodal.Media

  test("decodeSafe survives truncated/corrupt payloads and flags them") {
    import spark.implicits._
    val good = Multimodal.encodePpm(2, 2, Array.fill[Byte](12)(7))
    val corrupt = Seq(
      Media(0L, "image", good),                          // fine
      Media(1L, "image", good.take(6)),                  // truncated pixels -> OOB
      Media(2L, "image", "garbage".getBytes),            // not a P6
      Media(3L, "audio", Array[Byte](1, 2, 3)),          // not RIFF
      Media(4L, "video", "YUV4MPEG2 Wx H2\n".getBytes),  // bad header
      Media(5L, "nonsense", good))                       // unknown kind
    val out = Multimodal.decodeSafe(corrupt.toDS().repartition(3))
      .collect().map(d => d.media_id -> d).toMap
    assert(out(0L).error === null && out(0L).width === 2)
    (1L to 5L).foreach { i =>
      assert(out(i).error != null, s"row $i should be flagged")
      assert(out(i).width === 0)
    }
    // the throwing variant does fail on the same input (contract contrast)
    intercept[org.apache.spark.SparkException] {
      Multimodal.decode(corrupt.toDS()).collect()
    }
  }
}
