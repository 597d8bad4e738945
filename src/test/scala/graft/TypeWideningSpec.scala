package graft

import graft.io.{DeltaRead, DeltaWrite}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** TYPE WIDENING (PROTOCOL.md "Type Widening") and VARIANT
  * (`variantType`): widenColumnType re-emits the schema with the
  * wider type + `delta.typeChanges` provenance in one log-only commit;
  * narrow old files and wide new files read back uniformly because
  * every scan runs under the log schema (Spark's parquet layer
  * performs the physical upcast — the probe this spec pins); foreign
  * typeWidening tables open; variant columns create at the feature
  * form and roundtrip. */
class TypeWideningSpec extends SparkTestBase {
  import spark.implicits._

  private def newTable(): String =
    Files.createTempDirectory("widen").toString

  private def cleanup(t: String): Unit =
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(t))

  test("widenColumnType int->long: old narrow files + new wide files read uniformly") {
    val t = newTable()
    try {
      DeltaWrite.append((1 to 50).map(i => (i, s"r$i")).toDF("n", "txt"), t)
      assert(DeltaRead.snapshot(spark, t).schema.get("n").dataType == IntegerType)
      DeltaWrite.widenColumnType(spark, t, "n", LongType)
      val s = DeltaRead.snapshot(spark, t)
      assert(s.schema.get("n").dataType == LongType)
      assert(s.readerFeatures.contains("typeWidening") &&
        s.writerFeatures.contains("typeWidening"))
      // typeChanges provenance recorded on the field
      val meta = s.schema.get("n").metadata
      assert(meta.contains("delta.typeChanges"))
      assert(meta.json.contains("\"fromType\":\"integer\"") &&
        meta.json.contains("\"toType\":\"long\""))
      // append WIDE values past Int.MaxValue alongside the narrow files
      DeltaWrite.append(Seq((10_000_000_000L, "big")).toDF("n", "txt"), t)
      val got = DeltaRead.read(spark, t)
      assert(got.schema("n").dataType == LongType)
      assert(got.count() == 51)
      assert(got.agg(sum($"n")).first().getLong(0) ==
        (1 to 50).map(_.toLong).sum + 10_000_000_000L)
      // a second widening on the same column appends provenance
      DeltaWrite.widenColumnType(spark, t, "n", DecimalType(25, 0))
      val meta2 = DeltaRead.snapshot(spark, t).schema.get("n").metadata
      assert(meta2.json.contains("\"toType\":\"decimal(25,0)\""))
      assert(DeltaRead.read(spark, t).agg(sum($"n")).first()
        .getDecimal(0).longValue() == (1 to 50).map(_.toLong).sum + 10_000_000_000L)
    } finally cleanup(t)
  }

  test("decimal and date widenings read back exactly; disallowed conversions refuse") {
    val t = newTable()
    try {
      val df = Seq(1).toDF("x").selectExpr(
        "CAST(123.45 AS DECIMAL(5,2)) AS dec",
        "CAST('2024-03-09' AS DATE) AS dt",
        "CAST(7 AS FLOAT) AS f")
      DeltaWrite.append(df, t)
      DeltaWrite.widenColumnType(spark, t, "dec", DecimalType(12, 4))
      DeltaWrite.widenColumnType(spark, t, "dt", TimestampNTZType)
      DeltaWrite.widenColumnType(spark, t, "f", DoubleType)
      val r = DeltaRead.read(spark, t)
        .selectExpr("CAST(dec AS STRING)", "CAST(dt AS STRING)", "f").first()
      assert(r.getString(0) == "123.4500", r.getString(0))
      assert(r.getString(1).startsWith("2024-03-09 00:00"), r.getString(1))
      assert(r.getDouble(2) == 7.0)
      // narrowing / lossy conversions refuse
      intercept[IllegalArgumentException] {
        DeltaWrite.widenColumnType(spark, t, "dec", DecimalType(5, 2))
      }
      intercept[IllegalArgumentException] {
        DeltaWrite.widenColumnType(spark, t, "f", FloatType)
      }
    } finally cleanup(t)
  }

  test("foreign typeWidening table (feature-listed, widened schema over narrow files) opens") {
    val t = newTable()
    try {
      DeltaWrite.append((1 to 9).map(i => (i, i.toFloat)).toDF("a", "b"), t)
      val v = DeltaRead.latestVersion(t)
      val wide = StructType(Seq(StructField("a", LongType),
        StructField("b", DoubleType)))
      Files.write(Paths.get(t, "_delta_log", f"${v + 1}%020d.json"), Seq(
        """{"commitInfo":{"timestamp":0,"operation":"FOREIGN WIDEN"}}""",
        """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,""" +
          """"readerFeatures":["typeWidening"],""" +
          """"writerFeatures":["typeWidening","appendOnly","invariants"]}}""",
        s"""{"metaData":{"id":"m1","format":{"provider":"parquet","options":{}},""" +
          s""""schemaString":${com.fasterxml.jackson.databind.json.JsonMapper.builder().build()
            .writeValueAsString(wide.json)},"partitionColumns":[],"configuration":{},""" +
          s""""createdTime":0}}""").asJava)
      val got = DeltaRead.read(spark, t)
      assert(got.schema("a").dataType == LongType)
      assert(got.agg(sum($"a"), sum($"b")).first().toSeq == Seq(45L, 45.0))
      // and graft may keep writing it (feature supported)
      DeltaWrite.append(Seq((100L, 1.5)).toDF("a", "b"), t)
      assert(DeltaRead.read(spark, t).count() == 10)
    } finally cleanup(t)
  }

  test("variant column: creation lands the (3,7) feature form; values roundtrip") {
    val t = newTable()
    try {
      val df = spark.sql(
        """SELECT id, parse_json(concat('{"k":', id, ',"tag":"v', id, '"}')) AS j
          |FROM range(5)""".stripMargin)
      DeltaWrite.append(df, t)
      val s = DeltaRead.snapshot(spark, t)
      assert(s.minReaderVersion == 3 && s.minWriterVersion == 7)
      assert(s.readerFeatures.contains("variantType") &&
        s.writerFeatures.contains("variantType"))
      assert(s.schema.get("j").dataType.typeName == "variant")
      val got = DeltaRead.read(spark, t)
        .selectExpr("id", "variant_get(j, '$.k', 'long') AS k",
          "variant_get(j, '$.tag', 'string') AS tag")
        .orderBy($"id").collect()
      assert(got.map(_.getLong(1)).toSeq == (0L to 4L))
      assert(got.last.getString(2) == "v4")
      DeltaWrite.append(df.withColumn("id", $"id" + 10), t)
      assert(DeltaRead.read(spark, t).count() == 10)
    } finally cleanup(t)
  }
}
