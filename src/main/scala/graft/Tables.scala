package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table access layer over the driver-generated parquet test data
  * (TESTDATA.md). One accessor per table; all reads go through
  * [[Tables.read]] so the scan options (and, at cluster scale, the
  * catalog/bucketing decisions) live in one place.
  *
  * Reference parallel: the bronze Delta scans of
  * `extractor_polymarket.py:208-223` / `main.py:128-162` (SURVEY §2.1
  * S7/S8) — here re-expressed as plain columnar parquet scans that
  * Catalyst can push filters/projections into.
  */
object Tables {
  def read(spark: SparkSession, sfDir: String, name: String): DataFrame =
    normalizeTs(spark.read.parquet(s"$sfDir/$name.parquet"))

  /** Pin timestamp semantics regardless of which parquet flavor the
    * data generator emitted: a tz-less `timestamp[us]` column arrives
    * as TIMESTAMP_NTZ (Spark 4 infers NTZ from parquet
    * isAdjustedToUTC=false), which `unix_micros`/epoch casts reject.
    * Sessions run in UTC, so casting NTZ→TIMESTAMP is wall-clock
    * identity and every query keeps the one type (LTZ) the engine and
    * the DuckDB oracle agreed on from the start. */
  private def normalizeTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.TimestampNTZType
    df.schema.fields.filter(_.dataType == TimestampNTZType).foldLeft(df) {
      (d, f) => d.withColumn(f.name, d(f.name).cast("timestamp"))
    }
  }

  /** events.ts is parquet TIMESTAMP(NANOS) which Spark's vectorized
    * reader rejects; sessions set spark.sql.legacy.parquet.nanosAsLong
    * (see Sessions.tune) and we rebuild a microsecond TimestampType
    * here with integer `div` (a double division would lose precision —
    * epoch-nanos ≈ 1.7e18 overflows double's 2^53 exact range).
    * DuckDB truncates ns→µs the same way for positive epochs.
    */
  private def fixNanoTs(df: DataFrame, col: String): DataFrame =
    if (df.schema(col).dataType == org.apache.spark.sql.types.LongType)
      df.withColumn(col, org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr(s"$col div 1000")))
    else df

  def region(s: SparkSession, d: String): DataFrame    = read(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = read(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = read(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = read(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = read(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = read(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = read(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame    = fixNanoTs(read(s, d, "events"), "ts")
  def documents(s: SparkSession, d: String): DataFrame = read(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = read(s, d, "embeddings")

  val all: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")
}
