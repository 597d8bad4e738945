package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** REAL pure-JVM image header codec: container signature + dimension
  * extraction for PNG / JPEG / GIF from raw bytes — no imaging
  * library, no native code, safe inside an executor task. This is the
  * honest subset of "decode" a JVM-only 100 TB pipeline can always
  * run (full pixel decode stays behind the documented mapPartitions
  * seam where a deployment adds its imaging dependency).
  *
  *  - PNG: 8-byte signature, IHDR width/height as big-endian u32 at
  *    offsets 16/20 (PNG spec §11.2.2).
  *  - JPEG: segment walk from SOI to the first SOF0-SOF15 frame
  *    header (skipping DHT/DAC/APPn/fill bytes); height/width are
  *    big-endian u16 at frame offsets +5/+7 (ITU T.81 §B.2.2).
  *  - GIF: "GIF87a"/"GIF89a", logical-screen width/height as
  *    LITTLE-endian u16 at offsets 6/8.
  *
  * Anything else (or truncated/corrupt payloads) → None — corrupt
  * media must surface as NULL rows to filter and account, never as a
  * task failure. */
object ImageCodec {
  private def beU16(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)
  private def beU32(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
      ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)
  private def leU16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)

  private val PngSig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  /** SOF0–SOF15 minus DHT (C4), JPG (C8), DAC (CC) — the frame
    * markers that carry dimensions. */
  private def isSof(m: Int): Boolean =
    m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc

  def parseHeader(bytes: Array[Byte]): Option[(String, Int, Int)] = {
    if (bytes == null || bytes.length < 10) return None
    // PNG
    if (bytes.length >= 24 && bytes.take(8).sameElements(PngSig) &&
        bytes(12) == 'I' && bytes(13) == 'H' && bytes(14) == 'D' && bytes(15) == 'R') {
      val w = beU32(bytes, 16); val h = beU32(bytes, 20)
      // spec caps dimensions at 2^31-1; 0 is invalid
      if (w > 0 && h > 0 && w <= Int.MaxValue && h <= Int.MaxValue)
        return Some(("png", w.toInt, h.toInt))
      return None
    }
    // GIF
    if (bytes.length >= 10 && bytes(0) == 'G' && bytes(1) == 'I' && bytes(2) == 'F' &&
        bytes(3) == '8' && (bytes(4) == '7' || bytes(4) == '9') && bytes(5) == 'a') {
      val w = leU16(bytes, 6); val h = leU16(bytes, 8)
      if (w > 0 && h > 0) return Some(("gif", w, h))
      return None
    }
    // JPEG: walk segments to the first frame header
    if ((bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8) {
      var i = 2
      while (i + 3 < bytes.length) {
        if ((bytes(i) & 0xff) != 0xff) return None // desynced stream
        val marker = bytes(i + 1) & 0xff
        if (marker == 0xff) i += 1 // fill byte
        else if (marker == 0x01 || (marker >= 0xd0 && marker <= 0xd7)) i += 2 // standalone
        else if (marker == 0xd9) return None // EOI before any SOF
        else {
          val segLen = beU16(bytes, i + 2)
          if (segLen < 2) return None
          if (isSof(marker)) {
            if (i + 8 >= bytes.length) return None
            val h = beU16(bytes, i + 5); val w = beU16(bytes, i + 7)
            if (w > 0 && h > 0) return Some(("jpeg", w, h))
            return None
          }
          i += 2 + segLen
        }
      }
      return None
    }
    None
  }
}

/** REAL pure-JVM PNG PIXEL codec — the decode seam closed: IDAT
  * inflate via `java.util.zip.Inflater` plus the five PNG scanline
  * filters (None/Sub/Up/Average/Paeth, PNG spec §9), no imaging
  * library. Supports the non-interlaced 8-bit-depth color types
  * (gray, gray+alpha, RGB, RGBA) — the overwhelming majority of real
  * PNGs; anything else (16-bit, palette, Adam7) and any corruption
  * (bad signature, chunk CRC mismatch, truncated IDAT, wrong
  * inflated size) decodes to None → a NULL row, never a task
  * failure. The matching [[encode]] (filter-0 scanlines, CRC'd
  * chunks) exists so tests and oracles can build REAL byte-exact
  * PNGs from arithmetic another engine reproduces. */
object PngCodec {
  import java.util.zip.{CRC32, Deflater, Inflater}

  /** Decoded 8-bit image: row-major samples, `channels` per pixel. */
  final case class Pixels(width: Int, height: Int, channels: Int, data: Array[Byte])

  private val Sig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  private def beU32(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
      ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)

  private def channelsOf(colorType: Int): Option[Int] = colorType match {
    case 0 => Some(1) // grayscale
    case 2 => Some(3) // RGB
    case 4 => Some(2) // gray + alpha
    case 6 => Some(4) // RGBA
    case _ => None    // palette (3) and exotica: out of scope, None
  }

  /** Full pixel decode. None on anything malformed — the corrupt→NULL
    * contract [[ImageCodec.parseHeader]] established. */
  def decode(bytes: Array[Byte]): Option[Pixels] = {
    try {
      if (bytes == null || bytes.length < 45) return None
      if (!bytes.take(8).sameElements(Sig)) return None
      var i = 8
      var w = 0; var h = 0; var channels = 0
      var seenIhdr = false
      val idat = new java.io.ByteArrayOutputStream()
      while (i + 8 <= bytes.length) {
        val len = beU32(bytes, i)
        if (len > Int.MaxValue - 12 || i + 12 + len > bytes.length) return None
        val typ = new String(bytes, i + 4, 4, "US-ASCII")
        // chunk CRC covers type + data — a flipped byte must not
        // silently decode into wrong pixels
        val crc = new CRC32()
        crc.update(bytes, i + 4, 4 + len.toInt)
        if (crc.getValue != beU32(bytes, i + 8 + len.toInt)) return None
        typ match {
          case "IHDR" =>
            if (len != 13) return None
            w = beU32(bytes, i + 8).toInt; h = beU32(bytes, i + 12).toInt
            val bitDepth = bytes(i + 16) & 0xff
            val colorType = bytes(i + 17) & 0xff
            val compression = bytes(i + 18) & 0xff
            val filterMethod = bytes(i + 19) & 0xff
            val interlace = bytes(i + 20) & 0xff
            if (w <= 0 || h <= 0 || bitDepth != 8 || compression != 0 ||
                filterMethod != 0 || interlace != 0) return None
            channels = channelsOf(colorType).getOrElse(return None)
            seenIhdr = true
          case "IDAT" => idat.write(bytes, i + 8, len.toInt)
          case "IEND" =>
            if (!seenIhdr) return None
            return inflateAndUnfilter(idat.toByteArray, w, h, channels)
          case _ => () // ancillary chunks pass through
        }
        i += 12 + len.toInt
      }
      None // no IEND: truncated stream
    } catch { case _: Exception => None }
  }

  private def inflateAndUnfilter(compressed: Array[Byte], w: Int, h: Int,
      ch: Int): Option[Pixels] = {
    val stride = w * ch
    val expect = h.toLong * (stride + 1)
    if (expect > Int.MaxValue / 2) return None // decompression-bomb guard
    val raw = new Array[Byte](expect.toInt)
    val inf = new Inflater()
    try {
      inf.setInput(compressed)
      var off = 0
      while (off < raw.length && !inf.finished()) {
        val n = inf.inflate(raw, off, raw.length - off)
        if (n == 0 && inf.needsInput()) return None // truncated IDAT
        off += n
      }
      if (off != raw.length) return None
    } catch { case _: Exception => return None }
    finally inf.end()
    val out = new Array[Byte](h * stride)
    var y = 0
    while (y < h) {
      val f = raw(y * (stride + 1)) & 0xff
      val src = y * (stride + 1) + 1
      val dst = y * stride
      var x = 0
      while (x < stride) {
        val a = if (x >= ch) out(dst + x - ch) & 0xff else 0          // left
        val b = if (y > 0) out(dst - stride + x) & 0xff else 0        // up
        val c = if (y > 0 && x >= ch) out(dst - stride + x - ch) & 0xff else 0 // up-left
        val v = raw(src + x) & 0xff
        val recon = f match {
          case 0 => v
          case 1 => v + a
          case 2 => v + b
          case 3 => v + ((a + b) >> 1)
          case 4 => // Paeth predictor (PNG spec §9.4)
            val p = a + b - c
            val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
            v + (if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c)
          case _ => return None
        }
        out(dst + x) = (recon & 0xff).toByte
        x += 1
      }
      y += 1
    }
    Some(Pixels(w, h, ch, out))
  }

  /** One CRC'd chunk. Package-visible so specs can hand-build streams
    * (including deliberately filtered scanlines). */
  private[graft] def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def be32(v: Long): Unit = {
      out.write(((v >> 24) & 0xff).toInt); out.write(((v >> 16) & 0xff).toInt)
      out.write(((v >> 8) & 0xff).toInt); out.write((v & 0xff).toInt)
    }
    be32(data.length.toLong)
    val tb = typ.getBytes("US-ASCII")
    out.write(tb); out.write(data)
    val crc = new CRC32(); crc.update(tb); crc.update(data)
    be32(crc.getValue)
    out.toByteArray
  }

  private[graft] def ihdr(w: Int, h: Int, colorType: Int): Array[Byte] = {
    val d = new Array[Byte](13)
    d(0) = ((w >> 24) & 0xff).toByte; d(1) = ((w >> 16) & 0xff).toByte
    d(2) = ((w >> 8) & 0xff).toByte; d(3) = (w & 0xff).toByte
    d(4) = ((h >> 24) & 0xff).toByte; d(5) = ((h >> 16) & 0xff).toByte
    d(6) = ((h >> 8) & 0xff).toByte; d(7) = (h & 0xff).toByte
    d(8) = 8 // bit depth
    d(9) = colorType.toByte
    d
  }

  private[graft] def deflate(raw: Array[Byte]): Array[Byte] = {
    val d = new Deflater()
    d.setInput(raw); d.finish()
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  /** Encode 8-bit samples as a real PNG (filter-0 scanlines). */
  def encode(width: Int, height: Int, channels: Int, data: Array[Byte]): Array[Byte] = {
    val colorType = channels match {
      case 1 => 0; case 2 => 4; case 3 => 2; case 4 => 6
      case n => throw new IllegalArgumentException(s"encode: $n channels")
    }
    require(data.length == width * height * channels,
      s"encode: ${data.length} bytes for ${width}x$height x$channels")
    val stride = width * channels
    val raw = new Array[Byte](height * (stride + 1))
    var y = 0
    while (y < height) {
      raw(y * (stride + 1)) = 0 // filter: None
      System.arraycopy(data, y * stride, raw, y * (stride + 1) + 1, stride)
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    out.write(Sig)
    out.write(chunk("IHDR", ihdr(width, height, colorType)))
    out.write(chunk("IDAT", deflate(raw)))
    out.write(chunk("IEND", Array.empty[Byte]))
    out.toByteArray
  }

  /** Per-channel unsigned sums — exact integers, the oracle-friendly
    * aggregate (means are sums over w·h, derived downstream). */
  def channelSums(p: Pixels): Array[Long] = {
    val sums = new Array[Long](p.channels)
    var i = 0
    while (i < p.data.length) {
      sums(i % p.channels) += p.data(i) & 0xff
      i += 1
    }
    sums
  }
}

/** Multimodal column plumbing: image/audio/video payloads as opaque
  * `BinaryType` columns plus a typed metadata struct, processed with
  * ordinary column expressions. The HEADER codec is REAL
  * ([[ImageCodec]] + [[Multimodal.decodeHeaders]]: PNG/JPEG/GIF
  * signature + dimension byte-parsing, pure JVM, q176-oracle-pinned),
  * and so is PNG PIXEL decode ([[PngCodec]] +
  * [[Multimodal.decodePixels]]: IDAT inflate + all five scanline
  * filters, q205-oracle-pinned); only JPEG/GIF pixel decode remains
  * behind [[fakeDecode]]'s documented seam (their entropy coders are
  * a deploy-time imaging dependency).
  *
  * At 100 TB: binary payloads ride parquet as-is; metadata extraction
  * is scan-side column math; heavy per-item work (real decode, model
  * featurization) would slot into `mapPartitions` over an iterator of
  * rows with the SAME schema contract these functions establish.
  */
object Multimodal {

  /** The canonical media metadata schema. */
  val metaSchema: StructType = StructType(Seq(
    StructField("byte_len", LongType),
    StructField("sha256", StringType),
    StructField("mime", StringType)))

  /** Wrap any binary payload with extracted metadata. */
  def withMeta(payload: Column, mime: String): Column =
    struct(
      length(payload).cast(LongType).as("byte_len"),
      sha2(payload, 256).as("sha256"),
      lit(mime).as("mime"))

  /** STUB CODEC — deterministic fake. A real deployment replaces this
    * with an image/audio decode inside mapPartitions (libraries not
    * available in this environment). Derives plausible (width, height,
    * n_frames) from the payload hash so the downstream plumbing —
    * schema, joins, aggregations — is fully exercised and testable.
    */
  def fakeDecode(payload: Column): Column = {
    // two independent hex slices: deriving height as h1/1280 would go
    // through double division (inexact above 2^53) — a second slice
    // keeps all arithmetic exact and engine-reproducible
    val h1 = conv(substring(sha2(payload, 256), 1, 15), 16, 10).cast(LongType)
    val h2 = conv(substring(sha2(payload, 256), 16, 15), 16, 10).cast(LongType)
    struct(
      (pmod(h1, lit(1280L)) + 32L).cast(IntegerType).as("width"),
      (pmod(h2, lit(720L)) + 32L).cast(IntegerType).as("height"),
      (pmod(h1, lit(240L)) + 1L).cast(IntegerType).as("n_frames"))
  }

  /** Deterministic byte-histogram "feature" (16 buckets over byte
    * values) — stands in for an embedding extractor; real column math
    * over the binary payload. */
  def byteHistogram(payload: Column): Column = {
    val buckets = transform(sequence(lit(1), length(payload)),
      i => pmod(unhexByte(payload, i), lit(16)))
    transform(sequence(lit(0), lit(15)), b => size(filter(buckets, x => x === b)))
  }

  /** Byte value at 1-based position i of a binary column (0..255). */
  private def unhexByte(payload: Column, i: Column): Column =
    conv(hex(substring(payload, i, lit(1))), 16, 10).cast(IntegerType)

  /** Resize plan for a decoded image: fit (width, height) inside a
    * maxDim bounding box preserving aspect ratio — integer math only
    * (floor, like most thumbnailers), never upscales. The arithmetic
    * IS the real operator; only the pixel resample behind it is the
    * stubbed codec. */
  def resizePlan(decoded: Column, maxDim: Int): Column = {
    val w = decoded.getField("width").cast(LongType)
    val h = decoded.getField("height").cast(LongType)
    val longest = greatest(w, h)
    val needs = longest > maxDim
    struct(
      when(needs, (w * maxDim / longest).cast(IntegerType))
        .otherwise(w.cast(IntegerType)).as("out_width"),
      when(needs, (h * maxDim / longest).cast(IntegerType))
        .otherwise(h.cast(IntegerType)).as("out_height"),
      needs.as("resized"))
  }

  /** Deterministic frame-sample plan for a video payload: `k` frame
    * indices evenly spaced over [0, n_frames) — `i * n_frames / k`
    * (integer floor), the standard uniform-temporal-sampling grid.
    * Fewer frames than k → every frame once. Real decode would seek
    * these offsets inside mapPartitions; the index arithmetic and the
    * exploded (item, frame_idx) batch shape are the Spark-side
    * contract and are exercised for real. */
  def frameSamplePlan(decoded: Column, k: Int): Column = {
    val n = decoded.getField("n_frames").cast(LongType)
    when(n >= k,
      transform(sequence(lit(0), lit(k - 1)), i => (i.cast(LongType) * n / k).cast(IntegerType)))
      .when(n > 0, sequence(lit(0), (n - 1).cast(IntegerType)))
      // 0-frame/corrupt payloads: sequence(0, -1) would count DOWN to
      // [0, -1] — a real decoder sees these, so pin the empty grid
      .otherwise(array().cast(ArrayType(IntegerType)))
  }

  /** Attach payload + metadata + decoded struct to a text-keyed table
    * (payload faked as the utf-8 bytes of the text column). */
  def mediaTable(df: DataFrame, textCol: String): DataFrame = {
    val payload = col(textCol).cast(BinaryType)
    df.withColumn("payload", payload)
      .withColumn("meta", withMeta(payload, "application/octet-stream"))
      .withColumn("decoded", fakeDecode(payload))
  }

  /** REAL pixel decode over a binary payload column ([[PngCodec]]):
    * appends (px_width, px_height, px_channels, px_sum0..px_sum3) —
    * dimensions, channel count and EXACT per-channel byte sums
    * (integer, oracle-reproducible; means derive downstream as
    * sum / (w·h)) — with NULL columns for undecodable payloads. Same
    * mapPartitions seam as [[decodeHeaders]]: one narrow pass over
    * the payload scan, no shuffle, corrupt rows surface as NULLs to
    * filter and account. */
  def decodePixels(df: DataFrame, payloadCol: String): DataFrame = {
    val outSchema = StructType(df.schema.fields ++ Seq(
      StructField("px_width", IntegerType),
      StructField("px_height", IntegerType),
      StructField("px_channels", IntegerType),
      StructField("px_sum0", LongType),
      StructField("px_sum1", LongType),
      StructField("px_sum2", LongType),
      StructField("px_sum3", LongType)))
    val idx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { it =>
      it.map { r =>
        PngCodec.decode(r.getAs[Array[Byte]](idx)) match {
          case Some(p) =>
            val s = PngCodec.channelSums(p)
            def sumAt(c: Int): Any = if (c < p.channels) s(c) else null
            Row.fromSeq(r.toSeq ++ Seq(p.width, p.height, p.channels,
              sumAt(0), sumAt(1), sumAt(2), sumAt(3)))
          case None =>
            Row.fromSeq(r.toSeq ++ Seq(null, null, null, null, null, null, null))
        }
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
  }

  /** REAL header decode over a binary payload column: appends
    * (img_format, img_width, img_height), NULL for undecodable rows.
    * Runs [[ImageCodec.parseHeader]] inside `mapPartitions` — the
    * per-item imperative seam SURVEY §2.10 reserves for genuine
    * byte-level work; everything around it (schema contract,
    * partitioning, null accounting) is ordinary Dataset plumbing. At
    * 100 TB this is one narrow pass over the payload scan with no
    * shuffle. */
  def decodeHeaders(df: DataFrame, payloadCol: String): DataFrame = {
    val outSchema = StructType(df.schema.fields ++ Seq(
      StructField("img_format", StringType),
      StructField("img_width", IntegerType),
      StructField("img_height", IntegerType)))
    val idx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { it =>
      it.map { r =>
        ImageCodec.parseHeader(r.getAs[Array[Byte]](idx)) match {
          case Some((fmt, w, h)) => Row.fromSeq(r.toSeq ++ Seq(fmt, w, h))
          case None => Row.fromSeq(r.toSeq ++ Seq(null, null, null))
        }
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
  }

  // ---- synthetic payload builders (pure column math over hex) ----
  // These exist so an oracle in ANOTHER engine can pin the decoder:
  // the payload is built from arithmetic the oracle reproduces, the
  // decoder must hand the numbers back. Minimal-but-VALID headers.

  private def beHex(v: Column, bytes: Int): Column =
    lpad(hex(v), bytes * 2, "0")
  private def leHex16(v: Column): Column =
    concat(lpad(hex(v.bitwiseAND(lit(255))), 2, "0"),
      lpad(hex(shiftright(v, 8)), 2, "0"))

  /** PNG signature + IHDR with the given dimensions. */
  def syntheticPng(w: Column, h: Column): Column =
    unhex(concat(lit("89504E470D0A1A0A" + "0000000D" + "49484452"),
      beHex(w, 4), beHex(h, 4), lit("0806000000C0C0C0C0")))

  /** JPEG SOI + (realistically) an APP0 segment, then SOF0 with the
    * given dimensions — exercises the segment walk, not just offset
    * math. */
  def syntheticJpeg(w: Column, h: Column): Column =
    unhex(concat(
      lit("FFD8" + "FFE000104A46494600010100000100010000" + "FFC0" + "0011" + "08"),
      beHex(h, 2), beHex(w, 2), lit("03011100021101031101")))

  /** GIF89a logical screen descriptor (little-endian dims). */
  def syntheticGif(w: Column, h: Column): Column =
    unhex(concat(lit("474946383961"), leHex16(w), leHex16(h), lit("F7000000")))
}
