package graft

import graft.operators.{Multimodal, Video}

/** The AVI reader walks real RIFF structure (nested LISTs, pad bytes)
  * and its MJPEG frames must decode through the image path — plus
  * malformed-container rejection and the non-AVI fallback/empty cases.
  */
class VideoSpec extends SparkSpec {
  import spark.implicits._

  test("encode→parse round-trips the avih header") {
    val b = Video.encodeMjpegAvi(16, 12, nFrames = 4, seed = 7, fps = 20)
    val v = Video.parseAvi(b).get
    assert((v.width, v.height, v.nFrames) === (16, 12, 4))
    assert(v.usPerFrame === 50000)
    assert(v.durationMs === 4L * 50000 / 1000)
  }

  test("frame chunks are standalone JPEGs the image decoder reads") {
    val b = Video.encodeMjpegAvi(9, 5, nFrames = 3, seed = 11)
    val frames = Video.frameChunks(b)
    assert(frames.length === 3)
    frames.foreach { j =>
      assert((j(0) & 0xff) === 0xff && (j(1) & 0xff) === 0xd8, "jpeg magic")
      assert(Multimodal.sniffFormat(j) === "jpeg")
    }
  }

  test("malformed and foreign payloads reject cleanly") {
    assert(Video.parseAvi(null).isEmpty)
    assert(Video.parseAvi("RIFF0000AVI ".getBytes).isEmpty) // no header
    val good = Video.encodeMjpegAvi(8, 6, 2, 3)
    assert(Video.parseAvi(good.take(40)).isEmpty) // truncated
    assert(Video.frameChunks("not a container".getBytes) === Seq.empty)
    // a WAV is RIFF but not AVI — must not cross-parse
    assert(Video.parseAvi(graft.operators.Audio.encodePcmWav(10, 8000, 1)).isEmpty)
    // adversarial: near-Int.MaxValue chunk size must reject via the
    // Long-bounded guard, not wrap negative and crash walk/frameChunks
    val huge = good.clone
    huge(16) = 0xF4.toByte; huge(17) = 0xFF.toByte
    huge(18) = 0xFF.toByte; huge(19) = 0x7F.toByte
    assert(Video.parseAvi(huge).isEmpty)
    assert(Video.frameChunks(huge) === Seq.empty)
  }

  test("sampleFrames explodes partition-locally with stride") {
    val rows = Seq(
      (1L, Video.encodeMjpegAvi(8, 6, 5, 13)),
      (2L, "raw payload".getBytes)).toDF("id", "content")
    val out = Video.sampleFrames(rows, "content", stride = 2)
      .select("id", "frame_idx").as[(Long, Int)].collect().toSet
    // id=1: frames 0,2,4 sampled; id=2: non-AVI emits nothing
    assert(out === Set((1L, 0), (1L, 2), (1L, 4)))
  }

  test("withVideoMeta is total: AVI real, anything else zeros+raw") {
    val rows = Seq(
      (1L, Video.encodeMjpegAvi(10, 8, 2, 5, fps = 10)),
      (2L, "xx".getBytes)).toDF("id", "content")
    val metas = Video.withVideoMeta(rows, "content")
      .select("id", "video_meta.format", "video_meta.width",
        "video_meta.duration_ms")
      .as[(Long, String, Int, Long)].collect()
      .map { case (id, f, w, d) => id -> ((f, w, d)) }.toMap
    assert(metas(1L) === (("avi", 10, 200L)))
    assert(metas(2L) === (("raw", 0, 0L)))
  }
}
