package graft.operators

/** REAL pure-JVM baseline JPEG pixel codec — the LAST image seam
  * closed: ITU T.81 baseline sequential DCT, no imaging library.
  * Decode: marker walk (DQT / DHT / SOF0 / DRI / SOS, APPn skipped),
  * canonical Huffman tables, the entropy-coded scan with 0xFF00 byte
  * stuffing and D0–D7 restart markers, per-MCU run/size AC decoding
  * through the zigzag, dequantization, a double-precision 2-D IDCT,
  * nearest-neighbor chroma upsampling for the 4:4:4 / 4:2:2 / 4:2:0
  * sampling factors, and the JFIF YCbCr→RGB transform. Grayscale (1
  * component) and YCbCr (3 components) at 8-bit precision decode;
  * progressive (SOF2), arithmetic coding, 12-bit and CMYK refuse to
  * None — as does any corruption, the same contract as
  * [[PngCodec]]/[[GifCodec]].
  *
  * The matching [[encodeGray]] builds REAL baseline grayscale JPEGs
  * with all-ones quantization and the spec's Annex K Huffman tables.
  * A constant 8×8 block has exactly one nonzero coefficient
  * (DC = 8·(v−128), an integer), so constant-block images ROUNDTRIP
  * BIT-EXACTLY through the lossy pipeline — which is what lets an
  * oracle recompute decoded pixel sums arithmetically (q213). */
object JpegCodec {
  import PngCodec.Pixels

  // --- Huffman table: canonical codes from (BITS, HUFFVAL) ---
  private final class Huff(bits: Array[Int], vals: Array[Int]) {
    // minCode/maxCode/valPtr per code length, T.81 F.2.2.3
    val minCode = new Array[Int](17)
    val maxCode = new Array[Int](17)
    val valPtr = new Array[Int](17)
    locally {
      var code = 0; var k = 0
      var l = 1
      while (l <= 16) {
        valPtr(l) = k
        minCode(l) = code
        code += bits(l - 1); k += bits(l - 1)
        maxCode(l) = if (bits(l - 1) > 0) code - 1 else -1
        code <<= 1
        l += 1
      }
    }
    def decode(br: BitReader): Int = {
      var code = br.bit()
      var l = 1
      while (code > maxCode(l) || maxCode(l) < 0) {
        l += 1
        if (l > 16) throw new IllegalStateException("huffman desync")
        code = (code << 1) | br.bit()
      }
      vals(valPtr(l) + code - minCode(l))
    }
  }

  /** Entropy-scan bit reader: 0xFF00 unstuffs to 0xFF; a bare marker
    * mid-scan surfaces as an exception (corrupt), restart markers are
    * consumed by the MCU loop via [[restart]]. */
  private final class BitReader(data: Array[Byte], var pos: Int) {
    private var acc = 0
    private var nBits = 0
    def bit(): Int = {
      if (nBits == 0) {
        if (pos >= data.length) throw new IllegalStateException("scan truncated")
        var b = data(pos) & 0xff; pos += 1
        if (b == 0xff) {
          if (pos >= data.length) throw new IllegalStateException("scan truncated")
          val m = data(pos) & 0xff
          if (m == 0x00) pos += 1 // stuffed
          else throw new IllegalStateException("marker in scan")
          b = 0xff
        }
        acc = b; nBits = 8
      }
      nBits -= 1
      (acc >> nBits) & 1
    }
    def bits(n: Int): Int = {
      var v = 0; var i = 0
      while (i < n) { v = (v << 1) | bit(); i += 1 }
      v
    }
    /** Align to byte and consume an RSTn marker. */
    def restart(): Unit = {
      nBits = 0
      if (pos + 1 >= data.length) throw new IllegalStateException("missing RST")
      if ((data(pos) & 0xff) != 0xff) throw new IllegalStateException("bad RST")
      val m = data(pos + 1) & 0xff
      if (m < 0xd0 || m > 0xd7) throw new IllegalStateException("bad RST marker")
      pos += 2
    }
  }

  private val Zigzag = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  /** T.81 F.2.2.1 EXTEND: map a `size`-bit magnitude to its signed value. */
  private def extend(v: Int, size: Int): Int =
    if (size == 0) 0
    else if (v < (1 << (size - 1))) v - (1 << size) + 1
    else v

  private val idctCos: Array[Double] = {
    val c = new Array[Double](64)
    for (u <- 0 until 8; x <- 0 until 8)
      c(u * 8 + x) = math.cos((2 * x + 1) * u * math.Pi / 16.0)
    c
  }

  /** Double-precision 2-D IDCT (separable), output NOT level-shifted. */
  private def idct(coef: Array[Int], out: Array[Double]): Unit = {
    val tmp = new Array[Double](64)
    // rows: for each y, inverse transform over u
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var s = 0.0
        var u = 0
        while (u < 8) {
          val cu = if (u == 0) 0.70710678118654752440 else 1.0
          s += cu * coef(y * 8 + u) * idctCos(u * 8 + x)
          u += 1
        }
        tmp(y * 8 + x) = s / 2.0
        x += 1
      }
      y += 1
    }
    var x = 0
    while (x < 8) {
      var yy = 0
      while (yy < 8) {
        var s = 0.0
        var v = 0
        while (v < 8) {
          val cv = if (v == 0) 0.70710678118654752440 else 1.0
          s += cv * tmp(v * 8 + x) * idctCos(v * 8 + yy)
          v += 1
        }
        out(yy * 8 + x) = s / 2.0
        yy += 1
      }
      x += 1
    }
  }

  private final case class Component(id: Int, h: Int, v: Int, tq: Int) {
    var dcTable: Huff = null
    var acTable: Huff = null
    var pred = 0
    var plane: Array[Int] = null // full-resolution-in-component samples
    var pw = 0; var ph = 0       // plane dims (blocks * 8)
  }

  private def beU16(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)

  /** Full baseline decode. None on anything unsupported or malformed. */
  def decode(bytes: Array[Byte]): Option[Pixels] = {
    try {
      if (bytes == null || bytes.length < 4) return None
      if ((bytes(0) & 0xff) != 0xff || (bytes(1) & 0xff) != 0xd8) return None
      val quant = Array.ofDim[Int](4, 64)
      val quantSeen = new Array[Boolean](4)
      val dcTables = new Array[Huff](4)
      val acTables = new Array[Huff](4)
      var comps: Array[Component] = null
      var w = 0; var h = 0
      var restartInterval = 0
      var i = 2
      while (i + 3 < bytes.length) {
        if ((bytes(i) & 0xff) != 0xff) return None
        val marker = bytes(i + 1) & 0xff
        if (marker == 0xff) { i += 1 } // fill
        else if (marker == 0xd8) i += 2
        else if (marker == 0xd9) return None // EOI before SOS
        else if (marker == 0x01 || (marker >= 0xd0 && marker <= 0xd7)) i += 2
        else {
          val segLen = beU16(bytes, i + 2)
          if (segLen < 2 || i + 2 + segLen > bytes.length) return None
          val segEnd = i + 2 + segLen
          marker match {
            case 0xdb => // DQT
              var p = i + 4
              while (p < segEnd) {
                val pq = (bytes(p) >> 4) & 0xf
                val tq = bytes(p) & 0xf
                if (pq != 0 || tq > 3) return None // 8-bit tables only
                if (p + 65 > segEnd) return None
                var k = 0
                while (k < 64) { quant(tq)(k) = bytes(p + 1 + k) & 0xff; k += 1 }
                quantSeen(tq) = true
                p += 65
              }
            case 0xc4 => // DHT
              var p = i + 4
              while (p < segEnd) {
                val tc = (bytes(p) >> 4) & 0xf
                val th = bytes(p) & 0xf
                if (tc > 1 || th > 3 || p + 17 > segEnd) return None
                val bits = Array.tabulate(16)(k => bytes(p + 1 + k) & 0xff)
                val n = bits.sum
                if (p + 17 + n > segEnd || n > 256) return None
                val vals = Array.tabulate(n)(k => bytes(p + 17 + k) & 0xff)
                val tbl = new Huff(bits, vals)
                if (tc == 0) dcTables(th) = tbl else acTables(th) = tbl
                p += 17 + n
              }
            case 0xc0 => // SOF0 baseline
              if (comps != null) return None
              val precision = bytes(i + 4) & 0xff
              h = beU16(bytes, i + 5); w = beU16(bytes, i + 7)
              val nc = bytes(i + 9) & 0xff
              if (precision != 8 || w <= 0 || h <= 0 ||
                  (nc != 1 && nc != 3) ||
                  w.toLong * h > (1L << 26)) return None
              comps = Array.tabulate(nc) { c =>
                val off = i + 10 + c * 3
                val hv = bytes(off + 1) & 0xff
                Component(bytes(off) & 0xff, (hv >> 4) & 0xf, hv & 0xf,
                  bytes(off + 2) & 0xf)
              }
              if (comps.exists(c => c.h < 1 || c.h > 2 || c.v < 1 || c.v > 2 ||
                  c.tq > 3)) return None
            case 0xc1 | 0xc2 | 0xc3 | 0xc5 | 0xc6 | 0xc7 | 0xc9 | 0xca |
                 0xcb | 0xcd | 0xce | 0xcf =>
              return None // non-baseline SOF / arithmetic coding
            case 0xdd => // DRI
              if (segLen != 4) return None
              restartInterval = beU16(bytes, i + 4)
            case 0xda => // SOS — decode the scan
              if (comps == null) return None
              val ns = bytes(i + 4) & 0xff
              if (ns != comps.length) return None // single interleaved scan only
              var p = i + 5
              var k = 0
              while (k < ns) {
                val cs = bytes(p) & 0xff
                val comp = comps.find(_.id == cs).getOrElse(return None)
                comp.dcTable = dcTables((bytes(p + 1) >> 4) & 0xf)
                comp.acTable = acTables(bytes(p + 1) & 0xf)
                if (comp.dcTable == null || comp.acTable == null) return None
                if (!quantSeen(comp.tq)) return None
                p += 2; k += 1
              }
              p += 3 // Ss/Se/AhAl — fixed for baseline
              return decodeScan(bytes, p, w, h, comps, quant, restartInterval)
            case _ => () // APPn / COM / others: skip
          }
          i = segEnd
        }
      }
      None
    } catch { case _: Exception => None }
  }

  private def decodeScan(bytes: Array[Byte], scanStart: Int, w: Int, h: Int,
      comps: Array[Component], quant: Array[Array[Int]],
      restartInterval: Int): Option[Pixels] = {
    val hmax = comps.map(_.h).max
    val vmax = comps.map(_.v).max
    val mcuW = hmax * 8; val mcuH = vmax * 8
    val mcusX = (w + mcuW - 1) / mcuW
    val mcusY = (h + mcuH - 1) / mcuH
    comps.foreach { c =>
      c.pw = mcusX * c.h * 8; c.ph = mcusY * c.v * 8
      c.plane = new Array[Int](c.pw * c.ph)
      c.pred = 0
    }
    val br = new BitReader(bytes, scanStart)
    val coef = new Array[Int](64)
    val px = new Array[Double](64)
    var mcu = 0
    val totalMcus = mcusX * mcusY
    while (mcu < totalMcus) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        br.restart()
        comps.foreach(_.pred = 0)
      }
      val mx = mcu % mcusX; val my = mcu / mcusX
      comps.foreach { c =>
        val q = quant(c.tq)
        var by = 0
        while (by < c.v) {
          var bx = 0
          while (bx < c.h) {
            java.util.Arrays.fill(coef, 0)
            // DC
            val t = c.dcTable.decode(br)
            if (t > 11) throw new IllegalStateException("bad DC size")
            c.pred += extend(br.bits(t), t)
            coef(0) = c.pred * q(0)
            // AC run/size
            var k = 1
            while (k < 64) {
              val rs = c.acTable.decode(br)
              val r = (rs >> 4) & 0xf; val size = rs & 0xf
              if (size == 0) {
                if (r == 15) k += 16 // ZRL
                else k = 64          // EOB
              } else {
                k += r
                if (k > 63) throw new IllegalStateException("AC overrun")
                coef(Zigzag(k)) = extend(br.bits(size), size) * q(k)
                k += 1
              }
            }
            idct(coef, px)
            // place the block in the component plane (level shift + clamp)
            val ox = (mx * c.h + bx) * 8; val oy = (my * c.v + by) * 8
            var yy = 0
            while (yy < 8) {
              var xx = 0
              while (xx < 8) {
                val v = Math.round(px(yy * 8 + xx) + 128.0).toInt
                c.plane((oy + yy) * c.pw + ox + xx) =
                  if (v < 0) 0 else if (v > 255) 255 else v
                xx += 1
              }
              yy += 1
            }
            bx += 1
          }
          by += 1
        }
      }
      mcu += 1
    }
    // assemble: grayscale straight out; color via upsample + YCbCr→RGB
    if (comps.length == 1) {
      val c = comps(0)
      val out = new Array[Byte](w * h)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { out(y * w + x) = c.plane(y * c.pw + x).toByte; x += 1 }
        y += 1
      }
      Some(Pixels(w, h, 1, out))
    } else {
      val Array(cy, cb, cr) = comps
      val out = new Array[Byte](w * h * 3)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val yv = cy.plane((y * cy.v / vmax) * cy.pw + (x * cy.h / hmax))
          val bv = cb.plane((y * cb.v / vmax) * cb.pw + (x * cb.h / hmax))
          val rv = cr.plane((y * cr.v / vmax) * cr.pw + (x * cr.h / hmax))
          def clamp(d: Double): Byte = {
            val v = Math.round(d).toInt
            (if (v < 0) 0 else if (v > 255) 255 else v).toByte
          }
          val o = (y * w + x) * 3
          out(o) = clamp(yv + 1.402 * (rv - 128))
          out(o + 1) = clamp(yv - 0.344136 * (bv - 128) - 0.714136 * (rv - 128))
          out(o + 2) = clamp(yv + 1.772 * (bv - 128))
          x += 1
        }
        y += 1
      }
      Some(Pixels(w, h, 3, out))
    }
  }

  // --- Encoder: baseline GRAYSCALE, all-ones quantization, Annex K
  // luminance Huffman tables (ITU T.81 tables K.3/K.5 — the spec's
  // own published example tables every decoder ships). ---

  private val KDcBits =
    Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val KDcVals = Array(0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11)
  private val KAcBits =
    Array(0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d)
  private val KAcVals = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xa1, 0x08,
    0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0a, 0x16, 0x17, 0x18, 0x19, 0x1a, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3a, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3,
    0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6,
    0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9,
    0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1, 0xe2,
    0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf1, 0xf2, 0xf3, 0xf4,
    0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa)

  /** (code, length) per symbol for canonical (BITS, HUFFVAL). */
  private def encTable(bits: Array[Int], vals: Array[Int]): Map[Int, (Int, Int)] = {
    var code = 0; var k = 0
    val m = scala.collection.mutable.HashMap.empty[Int, (Int, Int)]
    for (l <- 1 to 16) {
      for (_ <- 0 until bits(l - 1)) { m(vals(k)) = (code, l); code += 1; k += 1 }
      code <<= 1
    }
    m.toMap
  }

  private final class BitWriter {
    val out = new java.io.ByteArrayOutputStream()
    private var acc = 0L
    private var n = 0
    def put(code: Int, len: Int): Unit = {
      acc = (acc << len) | (code & ((1L << len) - 1)); n += len
      while (n >= 8) {
        val b = ((acc >> (n - 8)) & 0xff).toInt
        out.write(b)
        if (b == 0xff) out.write(0x00) // byte stuffing
        n -= 8
      }
    }
    def flush(): Unit = if (n > 0) { // pad with 1s, T.81 F.1.2.3
      val b = (((acc << (8 - n)) | ((1 << (8 - n)) - 1)) & 0xff).toInt
      out.write(b)
      if (b == 0xff) out.write(0x00)
      n = 0
    }
  }

  private def fdct(block: Array[Double], out: Array[Double]): Unit = {
    var u = 0
    while (u < 8) {
      var v = 0
      while (v < 8) {
        var s = 0.0
        var x = 0
        while (x < 8) {
          var y = 0
          while (y < 8) {
            s += block(y * 8 + x) * idctCos(u * 8 + x) * idctCos(v * 8 + y)
            y += 1
          }
          x += 1
        }
        val cu = if (u == 0) 0.70710678118654752440 else 1.0
        val cv = if (v == 0) 0.70710678118654752440 else 1.0
        out(v * 8 + u) = s * cu * cv / 4.0
        v += 1
      }
      u += 1
    }
  }

  /** A REAL baseline grayscale JPEG of `gray` (row-major, 0..255).
    * All-ones quantization: a constant 8×8 block survives the
    * pipeline bit-exactly (one integer DC coefficient), which is the
    * property oracles lean on. Edge blocks replicate the last
    * row/column, the spec's usual padding. */
  def encodeGray(width: Int, height: Int, gray: Array[Byte]): Array[Byte] = {
    require(gray.length == width * height, "gray must be w*h bytes")
    val out = new java.io.ByteArrayOutputStream()
    def u16(v: Int): Unit = { out.write((v >> 8) & 0xff); out.write(v & 0xff) }
    out.write(0xff); out.write(0xd8) // SOI
    out.write(0xff); out.write(0xdb); u16(2 + 65); out.write(0x00) // DQT id 0
    (0 until 64).foreach(_ => out.write(1))
    out.write(0xff); out.write(0xc0); u16(8 + 3) // SOF0
    out.write(8); u16(height); u16(width); out.write(1)
    out.write(1); out.write(0x11); out.write(0) // comp 1, 1x1, quant 0
    def dht(tc: Int, bits: Array[Int], vals: Array[Int]): Unit = {
      out.write(0xff); out.write(0xc4); u16(2 + 1 + 16 + vals.length)
      out.write(tc << 4)
      bits.foreach(out.write)
      vals.foreach(out.write)
    }
    dht(0, KDcBits, KDcVals)
    dht(1, KAcBits, KAcVals)
    out.write(0xff); out.write(0xda); u16(6 + 2) // SOS
    out.write(1); out.write(1); out.write(0x00) // comp 1 → DC 0 / AC 0
    out.write(0); out.write(63); out.write(0)
    val dcEnc = encTable(KDcBits, KDcVals)
    val acEnc = encTable(KAcBits, KAcVals)
    val bw = new BitWriter
    val block = new Array[Double](64)
    val coef = new Array[Double](64)
    var pred = 0
    val bY = (height + 7) / 8; val bX = (width + 7) / 8
    def sizeOf(v: Int): Int = { var m = math.abs(v); var s = 0; while (m > 0) { m >>= 1; s += 1 }; s }
    def putSigned(v: Int, s: Int): Unit =
      if (s > 0) bw.put(if (v < 0) v + (1 << s) - 1 else v, s)
    var by = 0
    while (by < bY) {
      var bx = 0
      while (bx < bX) {
        var y = 0
        while (y < 8) {
          var x = 0
          while (x < 8) {
            val sy = math.min(by * 8 + y, height - 1)
            val sx = math.min(bx * 8 + x, width - 1)
            block(y * 8 + x) = (gray(sy * width + sx) & 0xff) - 128.0
            x += 1
          }
          y += 1
        }
        fdct(block, coef)
        val q = coef.map(c => Math.round(c).toInt)
        val dcDiff = q(0) - pred
        pred = q(0)
        val s = sizeOf(dcDiff)
        val (c0, l0) = dcEnc(s); bw.put(c0, l0); putSigned(dcDiff, s)
        // AC in zigzag order with run/size coding
        var run = 0
        var k = 1
        while (k < 64) {
          val v = q(Zigzag(k))
          if (v == 0) run += 1
          else {
            while (run > 15) { val (cz, lz) = acEnc(0xf0); bw.put(cz, lz); run -= 16 }
            val sz = sizeOf(v)
            val (ca, la) = acEnc((run << 4) | sz)
            bw.put(ca, la); putSigned(v, sz)
            run = 0
          }
          k += 1
        }
        if (run > 0) { val (ce, le) = acEnc(0x00); bw.put(ce, le) } // EOB
        bx += 1
      }
      by += 1
    }
    bw.flush()
    out.write(bw.out.toByteArray, 0, bw.out.size())
    out.write(0xff); out.write(0xd9) // EOI
    out.toByteArray
  }
}
