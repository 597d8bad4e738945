package graft.operators

/** REAL pure-JVM JPEG pixel codec — ITU T.81 with no imaging library.
  * Decode: marker walk (DQT / DHT / SOF0 / SOF2 / DRI / SOS, APPn
  * skipped), canonical Huffman tables, the entropy-coded scan with
  * 0xFF00 byte stuffing and D0–D7 restart markers, per-MCU run/size AC
  * decoding through the zigzag, dequantization, a double-precision 2-D
  * IDCT, nearest-neighbor chroma upsampling for the 4:4:4 / 4:2:2 /
  * 4:2:0 sampling factors, and the JFIF YCbCr→RGB transform. BASELINE
  * (SOF0) decodes streaming per-MCU; PROGRESSIVE (SOF2 — the majority
  * class of web-scraped JPEGs) decodes the full Annex G surface:
  * spectral selection (interleaved DC scans, single-component AC band
  * scans with EOB-run coding) and successive approximation (DC
  * refinement bits, the G.1.2.3 AC correction-bit algorithm),
  * coefficients accumulating across scans with one IDCT at EOI.
  * Grayscale (1 component) and YCbCr (3 components) at 8-bit precision
  * decode; arithmetic coding, hierarchical/lossless SOFs, 12-bit and
  * CMYK refuse to None — as does any corruption, the same contract as
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
    // progressive state: per-block coefficients in ZIGZAG order,
    // accumulated across scans; IDCT happens once at EOI
    var coefs: Array[Int] = null
    var bw = 0; var bh = 0   // coefficient-grid block dims (MCU-padded)
    var niW = 0; var niH = 0 // non-interleaved scan block dims
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
      var progressive = false
      var scansDecoded = 0
      var i = 2
      // i+1 (not i+3): EOI is the stream's LAST two bytes, and a
      // progressive image only completes there
      while (i + 1 < bytes.length) {
        if ((bytes(i) & 0xff) != 0xff) return None
        val marker = bytes(i + 1) & 0xff
        if (marker == 0xff) { i += 1 } // fill
        else if (marker == 0xd8) i += 2
        else if (marker == 0xd9) {
          // EOI: a progressive image is complete only here — all scans
          // have accumulated into the coefficient planes
          return if (progressive && scansDecoded > 0)
            finishProgressive(w, h, comps, quant, quantSeen)
          else None // EOI before any (baseline) scan
        }
        else if (marker == 0x01 || (marker >= 0xd0 && marker <= 0xd7)) i += 2
        else {
          if (i + 3 >= bytes.length) return None // truncated segment header
          val segLen = beU16(bytes, i + 2)
          if (segLen < 2 || i + 2 + segLen > bytes.length) return None
          val segEnd = i + 2 + segLen
          // a progressive SOS consumes its entropy data too and leaves
          // `i` at the NEXT marker; every other segment ends at segEnd
          var nextI = segEnd
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
            case 0xc0 | 0xc2 => // SOF0 baseline / SOF2 progressive
              if (comps != null) return None
              progressive = marker == 0xc2
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
            case 0xc1 | 0xc3 | 0xc5 | 0xc6 | 0xc7 | 0xc9 | 0xca |
                 0xcb | 0xcd | 0xce | 0xcf =>
              return None // other non-baseline SOF / arithmetic coding
            case 0xdd => // DRI
              if (segLen != 4) return None
              restartInterval = beU16(bytes, i + 4)
            case 0xda => // SOS — decode the scan
              if (comps == null) return None
              val ns = bytes(i + 4) & 0xff
              if (ns < 1 || ns > comps.length) return None
              var p = i + 5
              val scanComps = new Array[Component](ns)
              var k = 0
              while (k < ns) {
                val cs = bytes(p) & 0xff
                val comp = comps.find(_.id == cs).getOrElse(return None)
                scanComps(k) = comp
                comp.dcTable = dcTables((bytes(p + 1) >> 4) & 0xf)
                comp.acTable = acTables(bytes(p + 1) & 0xf)
                p += 2; k += 1
              }
              if (scanComps.map(_.id).distinct.length != ns) return None
              val ss = bytes(p) & 0xff; val se = bytes(p + 1) & 0xff
              val ah = (bytes(p + 2) >> 4) & 0xf; val al = bytes(p + 2) & 0xf
              p += 3
              if (!progressive) {
                // baseline: one interleaved full-band scan
                if (ns != comps.length || ss != 0 || se != 63 ||
                    ah != 0 || al != 0) return None
                if (comps.exists(c => c.dcTable == null || c.acTable == null ||
                    !quantSeen(c.tq))) return None
                return decodeScan(bytes, p, w, h, comps, quant, restartInterval)
              }
              // progressive: accumulate this scan, continue the walk
              nextI = decodeProgScan(bytes, p, w, h, comps, scanComps,
                ss, se, ah, al, restartInterval)
              scansDecoded += 1
            case _ => () // APPn / COM / others: skip
          }
          i = nextI
        }
      }
      None
    } catch { case _: Exception => None }
  }

  /** One progressive scan (T.81 Annex G): DC or AC band, first pass or
    * successive-approximation refinement, interleaved (DC only, all
    * components) or single-component. Coefficients accumulate into each
    * component's zigzag-ordered block storage; returns the byte index
    * of the next marker after the scan's entropy data. */
  private def decodeProgScan(bytes: Array[Byte], scanStart: Int, w: Int,
      h: Int, comps: Array[Component], scanComps: Array[Component],
      ss: Int, se: Int, ah: Int, al: Int, restartInterval: Int): Int = {
    // lazy coefficient-grid init on the first scan
    if (comps(0).coefs == null) {
      val hmax = comps.map(_.h).max
      val vmax = comps.map(_.v).max
      val mcusX = (w + hmax * 8 - 1) / (hmax * 8)
      val mcusY = (h + vmax * 8 - 1) / (vmax * 8)
      comps.foreach { c =>
        c.bw = mcusX * c.h; c.bh = mcusY * c.v
        c.coefs = new Array[Int](c.bw * c.bh * 64)
        c.niW = ((w * c.h + hmax - 1) / hmax + 7) / 8
        c.niH = ((h * c.v + vmax - 1) / vmax + 7) / 8
        c.pred = 0
      }
    }
    require(ss <= se && se <= 63 && al <= 13, "bad spectral band")
    val dcScan = ss == 0
    if (dcScan) require(se == 0, "DC scan must cover only coefficient 0")
    else require(scanComps.length == 1, "AC scans are single-component")
    if (dcScan && ah == 0)
      scanComps.foreach(c => require(c.dcTable != null, "missing DC table"))
    if (!dcScan && scanComps.exists(_.acTable == null))
      throw new IllegalStateException("missing AC table")
    scanComps.foreach(_.pred = 0)
    val br = new BitReader(bytes, scanStart)
    var eobrun = 0

    def dcFirst(c: Component, off: Int): Unit = {
      val t = c.dcTable.decode(br)
      if (t > 11) throw new IllegalStateException("bad DC size")
      c.pred += extend(br.bits(t), t)
      c.coefs(off) = c.pred << al
    }
    def dcRefine(c: Component, off: Int): Unit =
      if (br.bit() == 1) c.coefs(off) |= (1 << al)

    def acFirst(c: Component, off: Int): Unit = {
      if (eobrun > 0) { eobrun -= 1; return }
      var k = ss
      while (k <= se) {
        val rs = c.acTable.decode(br)
        val r = (rs >> 4) & 0xf; val size = rs & 0xf
        if (size == 0) {
          if (r == 15) k += 16 // ZRL
          else {
            eobrun = (1 << r) - 1
            if (r > 0) eobrun += br.bits(r)
            k = se + 1 // EOB for this block
          }
        } else {
          k += r
          if (k > se) throw new IllegalStateException("AC overrun")
          c.coefs(off + k) = extend(br.bits(size), size) << al
          k += 1
        }
      }
    }

    /** T.81 G.1.2.3 AC successive-approximation refinement: run/size
      * symbols address ZERO-HISTORY positions only; every already-
      * nonzero coefficient passed over consumes one correction bit. */
    def acRefine(c: Component, off: Int): Unit = {
      val p1 = 1 << al; val m1 = -1 << al
      var k = ss
      if (eobrun == 0) {
        var done = false
        while (k <= se && !done) {
          val rs = c.acTable.decode(br)
          var r = (rs >> 4) & 0xf; val size = rs & 0xf
          var newVal = 0
          if (size == 0) {
            if (r < 15) {
              // INCLUSIVE of the current block (unlike acFirst): its
              // remaining correction bits are read below, then the
              // run decrements
              eobrun = 1 << r
              if (r > 0) eobrun += br.bits(r)
              done = true
            }
            // r == 15 (ZRL): skip 16 zero-history positions
          } else {
            if (size != 1) throw new IllegalStateException("bad refine size")
            newVal = if (br.bit() == 1) p1 else m1
          }
          if (!done) {
            var advanced = false
            while (k <= se && !advanced) {
              val cur = c.coefs(off + k)
              if (cur != 0) {
                if (br.bit() == 1 && (cur & p1) == 0)
                  c.coefs(off + k) = cur + (if (cur >= 0) p1 else m1)
              } else {
                if (r == 0) {
                  if (newVal != 0) c.coefs(off + k) = newVal
                  advanced = true
                } else r -= 1
              }
              k += 1
            }
          }
        }
      }
      if (eobrun > 0) {
        // the EOB run covers this block: only correction bits for the
        // already-nonzero coefficients in the band
        while (k <= se) {
          val cur = c.coefs(off + k)
          if (cur != 0 && br.bit() == 1 && (cur & p1) == 0)
            c.coefs(off + k) = cur + (if (cur >= 0) p1 else m1)
          k += 1
        }
        eobrun -= 1
      }
    }

    def decodeBlock(c: Component, off: Int): Unit =
      if (dcScan) { if (ah == 0) dcFirst(c, off) else dcRefine(c, off) }
      else { if (ah == 0) acFirst(c, off) else acRefine(c, off) }

    if (scanComps.length > 1) {
      // interleaved DC scan: MCU order over the full grid
      val hmax = comps.map(_.h).max
      val vmax = comps.map(_.v).max
      val mcusX = (w + hmax * 8 - 1) / (hmax * 8)
      val mcusY = (h + vmax * 8 - 1) / (vmax * 8)
      var mcu = 0
      val total = mcusX * mcusY
      while (mcu < total) {
        if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
          br.restart(); scanComps.foreach(_.pred = 0); eobrun = 0
        }
        val mx = mcu % mcusX; val my = mcu / mcusX
        scanComps.foreach { c =>
          var by = 0
          while (by < c.v) {
            var bx = 0
            while (bx < c.h) {
              decodeBlock(c, ((my * c.v + by) * c.bw + mx * c.h + bx) * 64)
              bx += 1
            }
            by += 1
          }
        }
        mcu += 1
      }
    } else {
      // single-component scan: the component's own block grid, one
      // block per "MCU" for the restart interval
      val c = scanComps(0)
      var bi = 0
      val total = c.niW * c.niH
      while (bi < total) {
        if (restartInterval > 0 && bi > 0 && bi % restartInterval == 0) {
          br.restart(); c.pred = 0; eobrun = 0
        }
        val by = bi / c.niW; val bx = bi % c.niW
        decodeBlock(c, (by * c.bw + bx) * 64)
        bi += 1
      }
    }
    // align to the next true marker (skip stuffing and stray RSTs)
    var j = br.pos
    while (j + 1 < bytes.length) {
      if ((bytes(j) & 0xff) == 0xff) {
        val m = bytes(j + 1) & 0xff
        if (m == 0x00) j += 2
        else if (m >= 0xd0 && m <= 0xd7) j += 2
        else if (m == 0xff) j += 1
        else return j
      } else j += 1
    }
    throw new IllegalStateException("no marker after scan")
  }

  /** EOI of a progressive image: dequantize + de-zigzag + IDCT every
    * accumulated block into the component planes, then assemble. */
  private def finishProgressive(w: Int, h: Int, comps: Array[Component],
      quant: Array[Array[Int]], quantSeen: Array[Boolean]): Option[Pixels] = {
    if (comps == null || comps(0).coefs == null) return None
    if (comps.exists(c => !quantSeen(c.tq))) return None
    val hmax = comps.map(_.h).max
    val vmax = comps.map(_.v).max
    val coef = new Array[Int](64)
    val px = new Array[Double](64)
    comps.foreach { c =>
      c.pw = c.bw * 8; c.ph = c.bh * 8
      c.plane = new Array[Int](c.pw * c.ph)
      val q = quant(c.tq)
      var b = 0
      val nBlocks = c.bw * c.bh
      while (b < nBlocks) {
        val off = b * 64
        var k = 0
        while (k < 64) { coef(Zigzag(k)) = c.coefs(off + k) * q(k); k += 1 }
        idct(coef, px)
        val ox = (b % c.bw) * 8; val oy = (b / c.bw) * 8
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
        b += 1
      }
      c.coefs = null // free before assembly
    }
    Some(assemblePixels(w, h, comps, hmax, vmax))
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
    Some(assemblePixels(w, h, comps, hmax, vmax))
  }

  /** Shared by the baseline and progressive paths: grayscale straight
    * out; color via nearest-neighbor upsample + JFIF YCbCr→RGB. */
  private def assemblePixels(w: Int, h: Int, comps: Array[Component],
      hmax: Int, vmax: Int): Pixels =
    if (comps.length == 1) {
      val c = comps(0)
      val out = new Array[Byte](w * h)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { out(y * w + x) = c.plane(y * c.pw + x).toByte; x += 1 }
        y += 1
      }
      Pixels(w, h, 1, out)
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
      Pixels(w, h, 3, out)
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

  /** A REAL progressive (SOF2) JPEG with successive approximation —
    * the test-fixture counterpart of [[decode]]'s progressive path.
    * `planes` holds 1 (grayscale) or 3 (Y, Cb, Cr — RAW component
    * samples, no RGB transform) full-resolution planes at 1×1
    * sampling; all-ones quantization, Annex K tables. The scan script
    * exercises every progressive decode path: an INTERLEAVED DC first
    * scan at Al=1 (arithmetic-shift point transform), a DC refinement
    * scan, per-component AC first scans at Al=1 (spectral selection
    * 1–63 with EOB-run coding), and per-component AC refinement scans
    * (G.1.2.3 correction bits). The split is lossless — DC
    * `(v>>1)<<1 | (v&1)` and AC toward-zero halves plus sign-aware
    * correction reconstruct v exactly — so the decoded pixels equal
    * the BASELINE decode of the same coefficient set. */
  def encodeProgressive(width: Int, height: Int,
      planes: Seq[Array[Byte]]): Array[Byte] = {
    require(planes.size == 1 || planes.size == 3,
      "encodeProgressive: 1 (gray) or 3 (YCbCr) planes")
    planes.foreach(p => require(p.length == width * height,
      "each plane must be w*h bytes"))
    val nc = planes.size
    val bX = (width + 7) / 8; val bY = (height + 7) / 8
    // integer coefficients per component, zigzag order per block
    val coefs: Array[Array[Int]] = planes.toArray.map { plane =>
      val out = new Array[Int](bX * bY * 64)
      val block = new Array[Double](64)
      val f = new Array[Double](64)
      var b = 0
      while (b < bX * bY) {
        val bx = b % bX; val by = b / bX
        var y = 0
        while (y < 8) {
          var x = 0
          while (x < 8) {
            val sy = math.min(by * 8 + y, height - 1)
            val sx = math.min(bx * 8 + x, width - 1)
            block(y * 8 + x) = (plane(sy * width + sx) & 0xff) - 128.0
            x += 1
          }
          y += 1
        }
        fdct(block, f)
        var k = 0
        while (k < 64) { out(b * 64 + k) = Math.round(f(Zigzag(k))).toInt; k += 1 }
        b += 1
      }
      out
    }
    val out = new java.io.ByteArrayOutputStream()
    def u16(v: Int): Unit = { out.write((v >> 8) & 0xff); out.write(v & 0xff) }
    out.write(0xff); out.write(0xd8) // SOI
    out.write(0xff); out.write(0xdb); u16(2 + 65); out.write(0x00)
    (0 until 64).foreach(_ => out.write(1))
    out.write(0xff); out.write(0xc2); u16(8 + 3 * nc) // SOF2
    out.write(8); u16(height); u16(width); out.write(nc)
    (1 to nc).foreach { id =>
      out.write(id); out.write(0x11); out.write(0) // 1x1, quant 0
    }
    def dht(tc: Int, bits: Array[Int], vals: Array[Int]): Unit = {
      out.write(0xff); out.write(0xc4); u16(2 + 1 + 16 + vals.length)
      out.write(tc << 4)
      bits.foreach(out.write)
      vals.foreach(out.write)
    }
    // progressive AC scans need EOBn symbols (0x10..0xE0), which the
    // baseline Annex K table does not carry — a flat custom table (every
    // used symbol at code length 8) keeps the fixture encoder simple
    val progAcVals: Array[Int] =
      ((0 to 14).map(_ << 4) ++ Seq(0xf0) ++
        (for { r <- 0 to 15; s <- 1 to 10 } yield (r << 4) | s)).toArray
    val progAcBits: Array[Int] =
      Array(0, 0, 0, 0, 0, 0, 0, progAcVals.length, 0, 0, 0, 0, 0, 0, 0, 0)
    dht(0, KDcBits, KDcVals)
    dht(1, progAcBits, progAcVals)
    val dcEnc = encTable(KDcBits, KDcVals)
    val acEnc = encTable(progAcBits, progAcVals)
    def sos(compIds: Seq[Int], ss: Int, se: Int, ah: Int, al: Int): Unit = {
      out.write(0xff); out.write(0xda); u16(4 + 2 * compIds.size + 2)
      out.write(compIds.size)
      compIds.foreach { id => out.write(id); out.write(0x00) } // DC 0 / AC 0
      out.write(ss); out.write(se); out.write((ah << 4) | al)
    }
    def sizeOf(v: Int): Int = {
      var m = math.abs(v); var s = 0; while (m > 0) { m >>= 1; s += 1 }; s
    }
    def emitScan(body: BitWriter => Unit): Unit = {
      val bw = new BitWriter
      body(bw)
      bw.flush()
      out.write(bw.out.toByteArray, 0, bw.out.size())
    }

    // scan 1: DC first, interleaved, Al=1 (arithmetic-shift transform)
    sos(1 to nc, 0, 0, 0, 1)
    emitScan { bw =>
      def putSigned(v: Int, s: Int): Unit =
        if (s > 0) bw.put(if (v < 0) v + (1 << s) - 1 else v, s)
      val preds = new Array[Int](nc)
      var b = 0
      while (b < bX * bY) {
        var c = 0
        while (c < nc) {
          val dc = coefs(c)(b * 64) >> 1 // arithmetic shift: G.1.2.1
          val diff = dc - preds(c); preds(c) = dc
          val s = sizeOf(diff)
          val (code, len) = dcEnc(s); bw.put(code, len); putSigned(diff, s)
          c += 1
        }
        b += 1
      }
    }
    // scan 2: DC refinement, interleaved, Ah=1 Al=0 — the held-back bit
    sos(1 to nc, 0, 0, 1, 0)
    emitScan { bw =>
      var b = 0
      while (b < bX * bY) {
        var c = 0
        while (c < nc) { bw.put(coefs(c)(b * 64) & 1, 1); c += 1 }
        b += 1
      }
    }
    // per component: AC first at Al=1 (toward-zero halves, EOB runs)
    (0 until nc).foreach { c =>
      sos(Seq(c + 1), 1, 63, 0, 1)
      emitScan { bw =>
        def putSigned(v: Int, s: Int): Unit =
          if (s > 0) bw.put(if (v < 0) v + (1 << s) - 1 else v, s)
        var eobrun = 0
        def flushEob(): Unit = if (eobrun > 0) {
          val n = 31 - Integer.numberOfLeadingZeros(eobrun)
          val (code, len) = acEnc(n << 4); bw.put(code, len)
          if (n > 0) bw.put(eobrun - (1 << n), n)
          eobrun = 0
        }
        var b = 0
        while (b < bX * bY) {
          var r = 0
          var k = 1
          while (k <= 63) {
            val v = coefs(c)(b * 64 + k)
            val half = if (v >= 0) v >> 1 else -((-v) >> 1) // toward zero
            if (half == 0) r += 1
            else {
              flushEob()
              while (r > 15) { val (cz, lz) = acEnc(0xf0); bw.put(cz, lz); r -= 16 }
              val s = sizeOf(half)
              val (ca, la) = acEnc((r << 4) | s)
              bw.put(ca, la); putSigned(half, s)
              r = 0
            }
            k += 1
          }
          if (r > 0) { // trailing zeros: block ends in the EOB run
            eobrun += 1
            if (eobrun == 0x7fff) flushEob()
          }
          b += 1
        }
        flushEob()
      }
    }
    // per component: AC refinement Ah=1 Al=0 (G.1.2.3 correction bits)
    (0 until nc).foreach { c =>
      sos(Seq(c + 1), 1, 63, 1, 0)
      emitScan { bw =>
        var eobrun = 0
        val pending = scala.collection.mutable.ArrayBuffer.empty[Int]
        def flushEob(): Unit = {
          if (eobrun > 0) {
            val n = 31 - Integer.numberOfLeadingZeros(eobrun)
            val (code, len) = acEnc(n << 4); bw.put(code, len)
            if (n > 0) bw.put(eobrun - (1 << n), n)
            eobrun = 0
          }
          pending.foreach(bit => bw.put(bit, 1))
          pending.clear()
        }
        var b = 0
        while (b < bX * bY) {
          val off = b * 64
          // EOB = last newly-significant position (|v| == 1 at Al=0
          // given the first scan sent |v| >> 1)
          var eob = 0
          var k = 1
          while (k <= 63) {
            if (math.abs(coefs(c)(off + k)) == 1) eob = k
            k += 1
          }
          var r = 0
          val buffered = scala.collection.mutable.ArrayBuffer.empty[Int]
          k = 1
          while (k <= 63) {
            val v = coefs(c)(off + k)
            val a = math.abs(v)
            if (a == 0) r += 1
            else {
              // ZRLs are checked at EVERY nonzero (history included):
              // a run must never extend past a history coefficient, or
              // its buffered correction bit would land in the wrong
              // crossing on the decode side
              while (r > 15 && k <= eob) {
                flushEob()
                val (cz, lz) = acEnc(0xf0); bw.put(cz, lz); r -= 16
                buffered.foreach(bit => bw.put(bit, 1)); buffered.clear()
              }
              if (a > 1) {
                // history coefficient: correction bit rides the buffer
                buffered += (a & 1)
              } else {
                // newly significant: spend the run
                flushEob()
                val (ca, la) = acEnc((r << 4) | 1)
                bw.put(ca, la)
                bw.put(if (v < 0) 0 else 1, 1)
                buffered.foreach(bit => bw.put(bit, 1)); buffered.clear()
                r = 0
              }
            }
            k += 1
          }
          if (r > 0 || buffered.nonEmpty) {
            eobrun += 1
            pending ++= buffered
            if (eobrun == 0x7fff) flushEob()
          }
          b += 1
        }
        flushEob()
      }
    }
    out.write(0xff); out.write(0xd9) // EOI
    out.toByteArray
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
