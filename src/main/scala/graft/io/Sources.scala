package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Ingestion layer (SURVEY §2.1 S1–S6): the reference's paginated REST
  * extractor re-expressed as a partition-per-page Spark job behind a
  * pluggable [[PagedSource]] trait. Offline parity uses
  * [[FileBackedSource]]; a live deployment implements fetchPage with an
  * HTTP client and Spark schedules the page fan-out — no manual
  * ThreadPoolExecutor (extractor_polymarket.py:93-141).
  */
trait PagedSource extends Serializable {
  /** One page of raw JSON object strings; empty = past the end. */
  def fetchPage(offset: Long, limit: Int): Seq[String]
}

/** Reads "pages" from a JSONL file — the offline stand-in used by
  * tests. The file is read once per JVM and memoized (the naive
  * per-call re-read made ingestion O(pages × file size); a live HTTP
  * implementation has no equivalent cost — each page is one request).
  */
class FileBackedSource(path: String) extends PagedSource {
  override def fetchPage(offset: Long, limit: Int): Seq[String] =
    FileBackedSource.lines(path).slice(offset.toInt, offset.toInt + limit)
}

object FileBackedSource {
  // keyed by (path, mtime, size) so a rewritten file is re-read, not
  // served stale; old versions' entries are abandoned (bounded by the
  // few fixture files a test JVM touches — this class is the offline
  // stand-in, not a production source)
  private val cache = new java.util.concurrent.ConcurrentHashMap[String, Vector[String]]()
  private def lines(path: String): Vector[String] = {
    val f = new java.io.File(path)
    cache.computeIfAbsent(s"$path@${f.lastModified}:${f.length}", _ => {
      val src = scala.io.Source.fromFile(path)
      try src.getLines().toVector finally src.close()
    })
  }
}

object Ingest {

  /** Partition-per-page ingestion: `spark.range(numPages)` gives one
    * task per page; executors fetch in parallel (S2's thread fan-out,
    * scheduled by Spark). Rows parse via from_json against a declared
    * schema (S6 coercion). */
  def ingest(spark: SparkSession, source: PagedSource, numPages: Int,
      pageSize: Int, schema: StructType): DataFrame = {
    import spark.implicits._
    val raw = spark.range(numPages)
      .repartition(numPages.min(64))
      .flatMap(p => source.fetchPage(p * pageSize, pageSize))
      .toDF("json")
    raw.select(from_json(col("json"), schema).as("r")).select(col("r.*"))
  }

  /** S3 bronze hygiene: drop all-null columns in ONE aggregation pass
    * (never per-column actions). */
  def dropAllNullColumns(df: DataFrame): DataFrame = {
    val counts = df.select(df.columns.map(c => count(col(c)).as(c)).toSeq: _*)
      .collect()(0)
    val keep = df.columns.zipWithIndex.collect {
      case (c, i) if counts.getLong(i) > 0 => c
    }
    df.select(keep.map(col).toSeq: _*)
  }

  /** S5 null defaulting by type: strings→"", numerics→0, booleans→false
    * (extractor_polymarket.py:176-183). */
  def fillWriteDefaults(df: DataFrame): DataFrame = {
    val strings = df.schema.collect { case StructField(n, StringType, _, _) => n }
    val nums = df.schema.collect {
      case StructField(n, LongType | IntegerType | DoubleType | FloatType, _, _) => n }
    val bools = df.schema.collect { case StructField(n, BooleanType, _, _) => n }
    df.na.fill("", strings).na.fill(0, nums).na.fill(false, bools)
  }

  /** S4 bronze-compat mode: nested columns serialized to JSON strings
    * (the preferred path keeps them typed; this exists for parity). */
  def nestedToJsonStrings(df: DataFrame): DataFrame =
    df.schema.fields.foldLeft(df) {
      case (acc, StructField(n, _: StructType | _: ArrayType | _: MapType, _, _)) =>
        acc.withColumn(n, to_json(col(n)))
      case (acc, _) => acc
    }

  /** S6 explicit schema coercion: cast present columns to the declared
    * types, add missing ones as null (schema-tolerant, SURVEY §1.2). */
  def coerceTo(df: DataFrame, schema: StructType): DataFrame = {
    val cols = schema.fields.map { f =>
      if (df.columns.contains(f.name)) col(f.name).cast(f.dataType).as(f.name)
      else lit(null).cast(f.dataType).as(f.name)
    }
    df.select(cols.toSeq: _*)
  }
}
