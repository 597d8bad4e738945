package graft

import graft.operators.{ImageCodec, Multimodal}
import org.apache.spark.sql.functions._

/** The REAL codec tier: byte-level header parsing (no imaging libs),
  * pinned against hand-assembled spec-conformant payloads and the
  * column-math builders the q176 oracle drives. */
class ImageCodecSpec extends SparkTestBase {
  import spark.implicits._

  private def hexBytes(s: String): Array[Byte] =
    s.replaceAll("\\s", "").grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  test("PNG: canonical 1x1 image and 4-byte dimension edge") {
    // the standard minimal 1x1 PNG header (signature + IHDR)
    val png1x1 = hexBytes(
      "89504E470D0A1A0A 0000000D 49484452 00000001 00000001 0806000000")
    assert(ImageCodec.parseHeader(png1x1).contains(("png", 1, 1)))
    // width spanning >2 bytes exercises big-endian u32 assembly
    val wide = hexBytes(
      "89504E470D0A1A0A 0000000D 49484452 00012345 00000002 0806000000")
    assert(ImageCodec.parseHeader(wide).contains(("png", 0x12345, 2)))
    // zero dimension is invalid per spec
    val zero = hexBytes(
      "89504E470D0A1A0A 0000000D 49484452 00000000 00000001 0806000000")
    assert(ImageCodec.parseHeader(zero).isEmpty)
  }

  test("JPEG: SOF behind APP0/DHT segments, progressive SOF2, EOI-before-SOF") {
    // JFIF APP0 then SOF0 300x200 (h=00C8, w=012C)
    val jfif = hexBytes(
      "FFD8 FFE000104A46494600010100000100010000 FFC00011 08 00C8 012C 03011100021101031101")
    assert(ImageCodec.parseHeader(jfif).contains(("jpeg", 300, 200)))
    // progressive (SOF2) with a DHT (C4 must be skipped, not treated as frame)
    val prog = hexBytes(
      "FFD8 FFC40005101122 FFC20011 08 0010 0020 03011100021101031101")
    assert(ImageCodec.parseHeader(prog).contains(("jpeg", 32, 16)))
    // EOI with no frame header: undecodable, not a crash
    assert(ImageCodec.parseHeader(hexBytes("FFD8 FFD9")).isEmpty)
    // truncated mid-segment
    assert(ImageCodec.parseHeader(hexBytes("FFD8 FFC000")).isEmpty)
  }

  test("GIF: little-endian dims, 87a and 89a variants") {
    val gif = hexBytes("474946383961 2C01 C800 F7000000") // 300x200, GIF89a
    assert(ImageCodec.parseHeader(gif).contains(("gif", 300, 200)))
    val gif87 = hexBytes("474946383761 0500 0300 F7000000")
    assert(ImageCodec.parseHeader(gif87).contains(("gif", 5, 3)))
  }

  test("garbage, null, empty never throw") {
    assert(ImageCodec.parseHeader(null).isEmpty)
    assert(ImageCodec.parseHeader(Array.emptyByteArray).isEmpty)
    assert(ImageCodec.parseHeader("not an image at all".getBytes).isEmpty)
    assert(ImageCodec.parseHeader(Array.fill(64)(0xff.toByte)).isEmpty)
  }

  test("column-math builders round-trip through the byte parser (all formats)") {
    val dims = Seq((1, 1), (255, 256), (1919, 1079), (640, 480))
    val df = dims.toDF("w", "h").select(
      $"w", $"h",
      Multimodal.syntheticPng($"w", $"h").as("png"),
      Multimodal.syntheticJpeg($"w", $"h").as("jpeg"),
      Multimodal.syntheticGif($"w", $"h").as("gif"))
    df.collect().foreach { r =>
      val (w, h) = (r.getInt(0), r.getInt(1))
      assert(ImageCodec.parseHeader(r.getAs[Array[Byte]]("png")).contains(("png", w, h)))
      assert(ImageCodec.parseHeader(r.getAs[Array[Byte]]("jpeg")).contains(("jpeg", w, h)))
      assert(ImageCodec.parseHeader(r.getAs[Array[Byte]]("gif")).contains(("gif", w, h)))
    }
  }

  test("decodeHeaders: mapPartitions decode appends nullable columns, keeps input schema") {
    val df = Seq(1L, 2L, 3L).toDF("id").select($"id",
      when($"id" === 1, Multimodal.syntheticPng(lit(10), lit(20)))
        .when($"id" === 2, Multimodal.syntheticGif(lit(7), lit(9)))
        .otherwise(lit("junk").cast("binary")).as("payload"))
    val out = Multimodal.decodeHeaders(df, "payload")
      .select($"id", $"img_format", $"img_width", $"img_height")
      .collect().map(r => (r.getLong(0), r.get(1), r.get(2), r.get(3))).toSet
    assert(out == Set((1L, "png", 10, 20), (2L, "gif", 7, 9), (3L, null, null, null)))
  }
}
