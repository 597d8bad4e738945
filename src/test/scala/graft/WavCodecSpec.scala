package graft

import graft.operators.{Multimodal, WavCodec}
import org.apache.spark.sql.functions._

/** The WAV (RIFF/PCM) codec: byte-exact encode→decode roundtrips at
  * 8/16/24 bits mono and stereo, RIFF chunk-walk robustness (unknown
  * chunks skipped with the spec's even-byte padding), the
  * corrupt→NULL contract, and the decodeAudio mapPartitions seam. */
class WavCodecSpec extends SparkTestBase {
  import spark.implicits._

  private def ramp(n: Int, bits: Int): Array[Int] = bits match {
    case 8 => Array.tabulate(n)(i => i * 7 % 256)
    case 16 => Array.tabulate(n)(i => (i * 131 % 60001) - 30000)
    case 24 => Array.tabulate(n)(i => (i * 524287 % 16000001) - 8000000)
  }

  test("roundtrip 8/16/24-bit, mono and stereo: samples byte-exact") {
    for (bits <- Seq(8, 16, 24); ch <- Seq(1, 2)) {
      val samples = ramp(90 * ch, bits)
      val wav = WavCodec.encode(16000, ch, bits, samples)
      val got = WavCodec.decode(wav)
        .getOrElse(fail(s"decode failed bits=$bits ch=$ch"))
      assert(got.sampleRate == 16000 && got.channels == ch &&
        got.bitsPerSample == bits && got.frames == 90)
      assert(got.data.sameElements(samples), s"samples differ bits=$bits ch=$ch")
    }
  }

  test("unknown RIFF chunks (odd-length, padded) are skipped") {
    val samples = ramp(40, 16)
    val wav = WavCodec.encode(8000, 1, 16, samples)
    // splice an odd-length LIST chunk after "WAVE": 5 data bytes + pad
    val ins = "LIST".getBytes("US-ASCII") ++
      Array[Byte](5, 0, 0, 0, 1, 2, 3, 4, 5, 0)
    val spliced = wav.take(12) ++ ins ++ wav.drop(12)
    val got = WavCodec.decode(spliced).getOrElse(fail("chunk-skip decode failed"))
    assert(got.data.sameElements(samples))
  }

  test("corruption decodes to None: truncation, float PCM, garbage, null") {
    val wav = WavCodec.encode(8000, 2, 16, ramp(64, 16))
    assert(WavCodec.decode(wav.take(wav.length - 9)).isEmpty)
    val floatFmt = wav.clone(); floatFmt(20) = 3 // IEEE float format code
    assert(WavCodec.decode(floatFmt).isEmpty)
    val badSig = wav.clone(); badSig(0) = 'X'.toByte
    assert(WavCodec.decode(badSig).isEmpty)
    assert(WavCodec.decode(null).isEmpty)
    assert(WavCodec.decode(Array[Byte](1, 2, 3)).isEmpty)
    assert(WavCodec.decode("RIFF1234WAVE".getBytes("US-ASCII")).isEmpty)
  }

  test("channelStats are exact per-channel sums/sumsq; decodeAudio appends them") {
    val samples = Array.tabulate(30 * 2)(i => (i * 31 % 4001) - 2000)
    val wav = WavCodec.encode(44100, 2, 16, samples)
    val st = WavCodec.channelStats(WavCodec.decode(wav).get)
    def expect(c: Int) = {
      val vs = samples.indices.filter(_ % 2 == c).map(samples(_).toLong)
      (vs.sum, vs.map(v => v * v).sum)
    }
    assert(st(0) == expect(0) && st(1) == expect(1))
    val df = Seq((1L, wav), (2L, "noise".getBytes)).toDF("id", "payload")
    val out = Multimodal.decodeAudio(df, "payload")
    val rows = out.select($"id", $"au_rate", $"au_frames", $"au_sum0",
        $"au_sumsq1")
      .collect().map(r => (r.getLong(0), r.get(1), r.get(2), r.get(3), r.get(4))).toSet
    assert(rows == Set(
      (1L, 44100, 30, expect(0)._1, expect(1)._2),
      (2L, null, null, null, null)))
    // mono payload: channel-1 stats are NULL, not zero
    val mono = WavCodec.encode(8000, 1, 8, ramp(10, 8))
    val m = Multimodal.decodeAudio(Seq((3L, mono)).toDF("id", "payload"), "payload")
      .select($"au_channels", $"au_sum1").collect()(0)
    assert(m.getInt(0) == 1 && m.isNullAt(1))
  }

  // window-w-constant amplitude stream: frames per window = rep
  private def contour(amps: Array[Int], rep: Int, gain: Int = 1): Array[Int] =
    Array.tabulate(amps.length * rep)(f => gain * amps(f / rep))

  test("audioEnergyHash: hand-computed bits; gain + resample invariance") {
    val amps = Array.tabulate(65)(w => (w * 29 % 127) - 63)
    val base = WavCodec.encode(8000, 1, 16, contour(amps, 4))
    val h = WavCodec.decode(base).map(Multimodal.energyHashOf).get
    val expect = (0 until 64).foldLeft(0L) { (acc, w) =>
      if (amps(w).toLong * amps(w) > amps(w + 1).toLong * amps(w + 1))
        acc | (1L << w) else acc
    }
    assert(h == expect, "hash bits must follow the squared-amplitude contour")
    // 2× sample-duplication at 5× gain: every byte changes, hash doesn't
    val scaled = WavCodec.encode(16000, 1, 16, contour(amps, 8, gain = 5))
    assert(!scaled.sameElements(base))
    assert(WavCodec.decode(scaled).map(Multimodal.energyHashOf).get == h)
    // stereo duplication of the same contour: energy doubles uniformly
    val stereo = WavCodec.encode(8000, 2, 16,
      contour(amps, 4).flatMap(v => Seq(v, v)))
    assert(WavCodec.decode(stereo).map(Multimodal.energyHashOf).get == h)
  }

  test("audioEnergyHash: uneven window boundaries cross-multiply exactly") {
    // 97 frames over 65 windows: floor boundaries give 1- and 2-frame
    // windows; mean comparison must not truncate (cross-multiplied)
    val samples = Array.tabulate(97)(f => (f * 53 % 1001) - 500)
    val s = WavCodec.decode(WavCodec.encode(8000, 1, 16, samples)).get
    val e = Array.tabulate(65) { w =>
      val f0 = w * 97 / 65; val f1 = (w + 1) * 97 / 65
      ((f0 until f1).map(f => samples(f).toLong * samples(f)).sum, f1 - f0)
    }
    val expect = (0 until 64).foldLeft(0L) { (acc, w) =>
      if (e(w)._1 * e(w + 1)._2 > e(w + 1)._1 * e(w)._2) acc | (1L << w) else acc
    }
    assert(Multimodal.energyHashOf(s) == expect)
  }

  test("audioEnergyHash: NULL for corrupt and too-short; planted flip is Hamming 1") {
    val amps = Array.tabulate(65)(w => (w * 13 % 91) - 45)
    val base = WavCodec.encode(8000, 1, 16, contour(amps, 2))
    val short = WavCodec.encode(8000, 1, 16, contour(amps.take(32), 2)) // 64 < 65
    val flipped = amps.clone()
    flipped(0) = if (amps(0) * amps(0) > amps(1) * amps(1)) 0 else 127
    val flip = WavCodec.encode(8000, 1, 16, contour(flipped, 2))
    val df = Seq((0L, base), (1L, short), (2L, "junk".getBytes), (3L, flip))
      .toDF("aud_id", "payload")
    val out = Multimodal.audioEnergyHash(df, "payload")
      .select($"aud_id", $"ahash").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toMap
    assert(out(1L).isEmpty && out(2L).isEmpty)
    assert(out(0L).isDefined && out(3L).isDefined)
    assert(java.lang.Long.bitCount(out(0L).get ^ out(3L).get) == 1,
      "window-0 amplitude replacement must flip exactly bit 0")
    // 24-bit energies at full scale (accumulator spills to BigInt):
    // still exact, still gain-invariant vs the same contour at 1/1000
    val loudAmps = Array.tabulate(65)(w => ((w * 37 % 255) - 127) * 60000)
    val hLoud = WavCodec.decode(WavCodec.encode(8000, 1, 24,
      contour(loudAmps, 4))).map(Multimodal.energyHashOf).get
    val hQuiet = WavCodec.decode(WavCodec.encode(8000, 1, 24,
      contour(loudAmps.map(_ / 1000), 4))).map(Multimodal.energyHashOf).get
    assert(hLoud == hQuiet && hLoud != 0L)
  }
}
