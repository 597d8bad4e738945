package graft

import graft.operators.{Mp4Meta, Multimodal}
import org.apache.spark.sql.functions._

/** The MP4/ISO-BMFF metadata tier: box-walk roundtrips (brand,
  * timescale/duration, per-track dims and handlers), 64-bit largesize
  * and unknown boxes skipped, corrupt→None, and the decodeVideoMeta
  * mapPartitions seam. */
class Mp4MetaSpec extends SparkTestBase {
  import spark.implicits._

  test("build→parse roundtrip: brand, duration, tracks, first video dims") {
    val mp4 = Mp4Meta.build("mp42", 1000L, 95000L,
      videoDims = Seq((1920, 1080), (640, 360)), audioTracks = 2)
    val m = Mp4Meta.parse(mp4).getOrElse(fail("parse failed"))
    assert(m.brand == "mp42" && m.timescale == 1000L && m.duration == 95000L)
    assert(m.durationMs == 95000L)
    assert(m.nVideoTracks == 2 && m.nAudioTracks == 2)
    assert(m.width == 1920 && m.height == 1080) // first video track wins
    // non-1000 timescale scales to ms
    val m2 = Mp4Meta.parse(Mp4Meta.build("isom", 90000L, 450000L, Seq((64, 48)), 0)).get
    assert(m2.durationMs == 5000L)
  }

  test("unknown and largesize boxes are skipped; audio-only parses with 0x0 dims") {
    val base = Mp4Meta.build("isom", 600L, 1200L, Nil, audioTracks = 1)
    // splice an unknown box (uuid) and a 64-bit-size free box before moov
    def u32(v: Long) = Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    val uuid = u32(16) ++ "uuid".getBytes ++ Array.fill(8)(7.toByte)
    val large = u32(1) ++ "free".getBytes ++
      Array[Byte](0, 0, 0, 0, 0, 0, 0, 20) ++ Array.fill(4)(0.toByte)
    val ftypLen = 20 // as built: 8-byte header + brand(4)+pad(4)+compat(4)
    val spliced = base.take(ftypLen) ++ uuid ++ large ++ base.drop(ftypLen)
    val m = Mp4Meta.parse(spliced).getOrElse(fail("skip parse failed"))
    assert(m.nAudioTracks == 1 && m.nVideoTracks == 0 && m.width == 0)
    assert(m.durationMs == 2000L)
  }

  test("corruption parses to None: truncation, no ftyp, no moov, bad sizes") {
    val mp4 = Mp4Meta.build("mp41", 1000L, 3000L, Seq((320, 240)), 1)
    assert(Mp4Meta.parse(mp4.dropRight(25)).isEmpty) // truncated moov
    assert(Mp4Meta.parse("not a video at all".getBytes).isEmpty)
    assert(Mp4Meta.parse(null).isEmpty)
    assert(Mp4Meta.parse(Array[Byte](0, 0, 0, 8, 'f', 't', 'y', 'p')).isEmpty) // no moov
    val badSize = mp4.clone(); badSize(0) = 0x7f // ftyp size huge
    assert(Mp4Meta.parse(badSize).isEmpty)
  }

  test("decodeVideoMeta appends the metadata columns; corrupt rows NULL") {
    val good = Mp4Meta.build("mp42", 1000L, 42000L, Seq((1280, 720)), 1)
    val df = Seq((1L, good), (2L, "junk".getBytes)).toDF("id", "payload")
    val out = Multimodal.decodeVideoMeta(df, "payload")
    val rows = out.select($"id", $"vid_brand", $"vid_duration_ms",
        $"vid_width", $"vid_n_audio")
      .collect().map(r => (r.getLong(0), r.get(1), r.get(2), r.get(3), r.get(4))).toSet
    assert(rows == Set((1L, "mp42", 42000L, 1280, 1), (2L, null, null, null, null)))
  }
}
