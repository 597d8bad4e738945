package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video payloads as opaque
  * `BinaryType` columns plus a typed metadata struct, processed with
  * ordinary column expressions (schema, partitioning and batch shape
  * are real; only the codec itself is faked — see [[fakeDecode]]).
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
}
