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

  // ---- PNG PIXEL decode (PngCodec): inflate + all five filters ----
  import graft.operators.{GifCodec, PngCodec}

  private def gradient(w: Int, h: Int, ch: Int): Array[Byte] =
    Array.tabulate(w * h * ch) { i =>
      val px = i / ch; val c = i % ch
      val x = px % w; val y = px / w
      ((x * 7 + y * 13 + c * 31) % 256).toByte
    }

  test("PNG pixels: encode→decode roundtrip for gray/gray-alpha/RGB/RGBA") {
    for (ch <- Seq(1, 2, 3, 4)) {
      val (w, h) = (13, 9)
      val data = gradient(w, h, ch)
      val png = PngCodec.encode(w, h, ch, data)
      // the header tier agrees with the pixel tier
      assert(ImageCodec.parseHeader(png).contains(("png", w, h)))
      val p = PngCodec.decode(png).getOrElse(fail(s"decode failed for ch=$ch"))
      assert(p.width == w && p.height == h && p.channels == ch)
      assert(p.data.sameElements(data), s"pixel bytes differ for ch=$ch")
      val sums = PngCodec.channelSums(p)
      val expect = (0 until ch).map(c =>
        data.indices.filter(_ % ch == c).map(data(_) & 0xff).map(_.toLong).sum)
      assert(sums.toSeq == expect)
    }
  }

  test("PNG pixels: all five scanline filters reconstruct exactly") {
    val (w, h, ch) = (6, 5, 3)
    val data = gradient(w, h, ch)
    val stride = w * ch
    // reference FILTER pass (the encoder side of PNG spec §9): line y
    // uses filter type y % 5, so every filter is exercised
    val raw = new Array[Byte](h * (stride + 1))
    for (y <- 0 until h) {
      val f = y % 5
      raw(y * (stride + 1)) = f.toByte
      for (x <- 0 until stride) {
        val cur = data(y * stride + x) & 0xff
        val a = if (x >= ch) data(y * stride + x - ch) & 0xff else 0
        val b = if (y > 0) data((y - 1) * stride + x) & 0xff else 0
        val c = if (y > 0 && x >= ch) data((y - 1) * stride + x - ch) & 0xff else 0
        val paeth = {
          val p = a + b - c
          val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
          if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
        }
        val filtered = f match {
          case 0 => cur
          case 1 => cur - a
          case 2 => cur - b
          case 3 => cur - ((a + b) >> 1)
          case 4 => cur - paeth
        }
        raw(y * (stride + 1) + 1 + x) = (filtered & 0xff).toByte
      }
    }
    val png = {
      val out = new java.io.ByteArrayOutputStream()
      out.write(hexBytes("89504E470D0A1A0A"))
      out.write(PngCodec.chunk("IHDR", PngCodec.ihdr(w, h, 2)))
      out.write(PngCodec.chunk("IDAT", PngCodec.deflate(raw)))
      out.write(PngCodec.chunk("IEND", Array.empty[Byte]))
      out.toByteArray
    }
    val p = PngCodec.decode(png).getOrElse(fail("filtered stream must decode"))
    assert(p.data.sameElements(data), "unfiltering must reconstruct the exact pixels")
  }

  test("PNG pixels: corruption decodes to None, never wrong pixels or a throw") {
    val png = PngCodec.encode(8, 8, 3, gradient(8, 8, 3))
    assert(PngCodec.decode(png).isDefined)
    // truncated stream (no IEND)
    assert(PngCodec.decode(png.take(png.length - 20)).isEmpty)
    // a flipped byte inside IDAT breaks the chunk CRC
    val flipped = png.clone()
    flipped(45) = (flipped(45) ^ 0x55).toByte
    assert(PngCodec.decode(flipped).isEmpty)
    // non-PNG and null-ish inputs
    assert(PngCodec.decode("not a png at all, just text bytes....".getBytes).isEmpty)
    assert(PngCodec.decode(Array.empty[Byte]).isEmpty)
    // 16-bit depth is out of scope → None (not wrong pixels)
    val deep = {
      val out = new java.io.ByteArrayOutputStream()
      out.write(hexBytes("89504E470D0A1A0A"))
      val ih = PngCodec.ihdr(4, 4, 2); ih(8) = 16
      out.write(PngCodec.chunk("IHDR", ih))
      out.write(PngCodec.chunk("IDAT", PngCodec.deflate(new Array[Byte](4 * (4 * 3 * 2 + 1)))))
      out.write(PngCodec.chunk("IEND", Array.empty[Byte]))
      out.toByteArray
    }
    assert(PngCodec.decode(deep).isEmpty)
  }

  test("decodePixels appends exact channel sums; corrupt rows come back NULL") {
    val w = 5; val h = 4
    val good = PngCodec.encode(w, h, 3, gradient(w, h, 3))
    val df = Seq((1L, good), (2L, good.take(30)), (3L, "junk".getBytes))
      .toDF("id", "payload")
    val out = Multimodal.decodePixels(df, "payload")
    val rows = out.select($"id", $"px_width", $"px_channels", $"px_sum0", $"px_sum3")
      .collect().map(r => (r.getLong(0), r.get(1), r.get(2), r.get(3), r.get(4))).toSet
    val data = gradient(w, h, 3)
    val sum0 = data.indices.filter(_ % 3 == 0).map(data(_) & 0xff).map(_.toLong).sum
    assert(rows == Set(
      (1L, w, 3, sum0, null), // 3-channel image: sum3 is NULL
      (2L, null, null, null, null),
      (3L, null, null, null, null)))
  }

  private def gifPalette(n: Int): Array[Byte] = {
    val p = new Array[Byte](n * 3)
    (0 until n).foreach { i =>
      p(i * 3) = (i * 7 % 256).toByte
      p(i * 3 + 1) = (i * 31 % 256).toByte
      p(i * 3 + 2) = (255 - i % 256).toByte
    }
    p
  }

  test("GIF pixels: encode→decode roundtrip (LZW), palette lookup exact") {
    for (nColors <- Seq(2, 4, 16, 256)) {
      val (w, h) = (17, 11)
      val pal = gifPalette(nColors)
      val idxs = Array.tabulate(w * h)(i => (i % nColors).toByte)
      val gif = GifCodec.encode(w, h, pal, idxs)
      assert(ImageCodec.parseHeader(gif).contains(("gif", w, h)))
      val p = GifCodec.decode(gif).getOrElse(fail(s"decode failed for n=$nColors"))
      assert(p.width == w && p.height == h && p.channels == 3)
      val expect = idxs.flatMap { ix =>
        val i = (ix & 0xff) * 3
        Seq(pal(i), pal(i + 1), pal(i + 2))
      }
      assert(p.data.sameElements(expect), s"pixels differ for n=$nColors")
    }
  }

  test("GIF pixels: real compressed LZW streams (dictionary growth + KwKwK) decode") {
    // repetitive pixels force the dictionary to actually grow; the
    // aaa...a prefix exercises the KwKwK (code == nextCode) case.
    // Encode via java's own GIF writer? Not available — instead craft
    // the canonical KwKwK stream by hand: minCodeSize 2,
    // codes CLEAR,1,6,EOI over palette index 1 = "aaaaa" (a=1):
    // 6 == nextCode at read time → expand(prev)+first = 1,1 then 1,1,1?
    // Simpler canon: CLEAR(4),1,6(KwKwK→"11"),EOI gives pixels 1,1,1.
    val pal = gifPalette(4)
    def bitsLsb(codes: Seq[Int], codeSize: Int): Array[Byte] = {
      var acc = 0L; var n = 0
      val out = new java.io.ByteArrayOutputStream()
      codes.foreach { c =>
        acc |= c.toLong << n; n += codeSize
        while (n >= 8) { out.write((acc & 0xff).toInt); acc >>= 8; n -= 8 }
      }
      if (n > 0) out.write((acc & 0xff).toInt)
      out.toByteArray
    }
    val lzw = bitsLsb(Seq(4, 1, 6, 5), 3) // CLEAR, 1, KwKwK, EOI
    val out = new java.io.ByteArrayOutputStream()
    out.write("GIF89a".getBytes("US-ASCII"))
    out.write(Array[Byte](3, 0, 1, 0)) // 3x1
    out.write(0x81); out.write(0); out.write(0) // global table 4 entries
    out.write(gifPalette(4), 0, 12)
    out.write(0x2c)
    out.write(Array[Byte](0, 0, 0, 0, 3, 0, 1, 0, 0))
    out.write(2) // min code size
    out.write(lzw.length); out.write(lzw, 0, lzw.length); out.write(0)
    out.write(0x3b)
    val p = GifCodec.decode(out.toByteArray).getOrElse(fail("KwKwK decode failed"))
    assert(p.width == 3 && p.height == 1)
    val c1 = Seq(pal(3), pal(4), pal(5))
    assert(p.data.toSeq == c1 ++ c1 ++ c1)
  }

  test("GIF pixels: interlaced frames de-interlace to row order") {
    val (w, h) = (5, 13)
    val pal = gifPalette(16)
    val rows = Array.tabulate(h)(y => Array.fill(w)((y % 16).toByte))
    // interlace pass order: rows 0,8 / 4,12 / 2,6,10 / 1,3,5,7,9,11
    val passOrder = Seq(0, 8) ++ Seq(4, 12) ++ Seq(2, 6, 10) ++
      (1 until h by 2)
    val shuffled = passOrder.flatMap(rows(_)).toArray
    val plain = GifCodec.encode(w, h, pal, shuffled)
    // flip the interlace bit in the image descriptor (offset: 6 header
    // + 7 lsd + 48 palette + 1 sep + 8 geom = byte 70 is the packed field)
    val buf = plain.clone()
    val packedOff = 6 + 7 + 16 * 3 + 1 + 8
    assert(buf(packedOff) == 0)
    buf(packedOff) = 0x40.toByte
    val p = GifCodec.decode(buf).getOrElse(fail("interlaced decode failed"))
    (0 until h).foreach { y =>
      val got = p.data.slice(y * w * 3, y * w * 3 + 3)
      val i = (y % 16) * 3
      assert(got.toSeq == Seq(pal(i), pal(i + 1), pal(i + 2)), s"row $y wrong")
    }
  }

  test("GIF pixels: extensions are skipped; corruption decodes to None") {
    val pal = gifPalette(4)
    val idxs = Array.tabulate(12)(i => (i % 4).toByte)
    val gif = GifCodec.encode(4, 3, pal, idxs)
    // splice a graphic-control extension between LSD+table and the frame
    val head = 6 + 7 + 4 * 3
    val ext = Array[Byte](0x21, 0xf9.toByte, 4, 0, 0, 0, 0, 0)
    val spliced = gif.take(head) ++ ext ++ gif.drop(head)
    assert(GifCodec.decode(spliced).isDefined)
    // corruption: truncated sub-block, bad signature, out-of-palette index
    assert(GifCodec.decode(gif.take(gif.length - 6)).isEmpty)
    val badSig = gif.clone(); badSig(0) = 'X'.toByte
    assert(GifCodec.decode(badSig).isEmpty)
    assert(GifCodec.decode(null).isEmpty)
    assert(GifCodec.decode(Array[Byte](0x47, 0x49)).isEmpty)
    // decodePixels dispatches GIF alongside PNG in one pass
    import spark.implicits._
    val df = Seq((1L, gif), (2L, "junk".getBytes)).toDF("id", "payload")
    val out = Multimodal.decodePixels(df, "payload")
    val got = out.select($"id", $"px_width", $"px_channels", $"px_sum0")
      .collect().map(r => (r.getLong(0), r.get(1), r.get(2), r.get(3))).toSet
    val sumR = idxs.map(ix => pal((ix & 0xff) * 3) & 0xff).map(_.toLong).sum
    assert(got == Set((1L, 4, 3, sumR), (2L, null, null, null)))
  }

  test("dHash: pooled-luma gradient hash is exact on block fixtures, invariant to resize/re-encode") {
    import graft.operators.{Dedup, GifCodec, PngCodec}
    def pat(seed: Long)(r: Int, c: Int): Int = ((seed * 37 + r * 11 + c * 7) % 256).toInt
    // expected bits straight from the construction arithmetic
    def expectedHash(seed: Long): Long = {
      var bits = 0L
      for (r <- 0 until 8; c <- 0 until 8)
        if (pat(seed)(r, c) > pat(seed)(r, c + 1)) bits |= 1L << (r * 8 + c)
      bits
    }
    val grayPalette = Array.tabulate(256 * 3)(i => (i / 3).toByte)
    def png2x(seed: Long): Array[Byte] = PngCodec.encode(18, 16, 1,
      Array.tabulate(18 * 16)(i => pat(seed)(i / 18 / 2, i % 18 / 2).toByte))
    def gif1x(seed: Long): Array[Byte] = GifCodec.encode(9, 8, grayPalette,
      Array.tabulate(9 * 8)(i => pat(seed)(i / 9, i % 9).toByte))
    val media = Seq(
      (1L, png2x(5L)), (2L, gif1x(5L)),      // resized re-encoded copies
      (3L, png2x(12L)), (4L, gif1x(12L)),    // a second pattern
      (5L, png2x(5L).take(10))               // corrupt -> NULL
    ).toDF("img_id", "payload")
    val hashed = Multimodal.dhashImages(media, "payload")
      .select($"img_id", $"dhash").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(hashed(1L).contains(expectedHash(5L)), "decode+pool must equal the arithmetic")
    assert(hashed(2L) == hashed(1L), "GIF 9x8 re-encode must hash like the PNG 18x16")
    assert(hashed(3L).contains(expectedHash(12L)) && hashed(4L) == hashed(3L))
    assert(hashed(1L) != hashed(3L), "distinct patterns must not collide here")
    assert(hashed(5L).isEmpty, "corrupt payload -> NULL, never a task failure")
    // RGB luma path: a 3-channel gray PNG hashes identically to 1-channel
    val rgb = PngCodec.encode(18, 16, 3, Array.tabulate(18 * 16 * 3)(i =>
      pat(5L)((i / 3) / 18 / 2, (i / 3) % 18 / 2).toByte))
    val rgbHash = Multimodal.dhashImages(Seq((9L, rgb)).toDF("img_id", "payload"),
      "payload").select($"dhash").as[Long].head()
    assert(rgbHash == expectedHash(5L), "299/587/114 luma of gray RGB is the gray value")
    // Hamming pairing: copies pair, distinct patterns only if hashes tie
    val ok = Multimodal.dhashImages(media, "payload").where($"dhash".isNotNull)
    val pairs = Dedup.hammingNearDupPairs(ok, "img_id", "dhash", maxHamming = 0)
      .as[(Long, Long)].collect().toSet
    val expectCross = expectedHash(5L) == expectedHash(12L)
    assert(pairs.contains((1L, 2L)) && pairs.contains((3L, 4L)))
    assert(expectCross || pairs == Set((1L, 2L), (3L, 4L)), s"unexpected pairs: $pairs")
    // one-bit neighbors pair under maxHamming 1 (pigeonhole recall), not 0
    val nbr = Seq((1L, expectedHash(5L)), (2L, expectedHash(5L) ^ 1L))
      .toDF("img_id", "dhash")
    assert(Dedup.hammingNearDupPairs(nbr, "img_id", "dhash", maxHamming = 0).count() == 0)
    assert(Dedup.hammingNearDupPairs(nbr, "img_id", "dhash", maxHamming = 1)
      .count() == 1)
    // the valve: a hot hash bucket drops, and the ledger records it
    val flood = (1L to 20L).map(i => (i, 0x1234L)).toDF("img_id", "dhash")
    assert(Dedup.hammingNearDupPairs(flood, "img_id", "dhash", 0, 4,
      maxBucketSize = 8).count() == 0)
    assert(Dedup.hammingDroppedBuckets(flood, "img_id", "dhash", 4,
      maxBucketSize = 8).count() == 4, "all 4 band buckets of the flood hash drop")
  }
}
