package graft

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._

import graft.io.{DeltaRead, DeltaWrite}

/** VARIANT SHREDDING (the parquet variant shredding layout behind the
  * Delta `variantShredding` feature): appendShredded must land files
  * whose variant columns are typed_value groups, declare the feature
  * in or before the commit that makes shredded bytes visible, and
  * read back exactly what an unshredded write would. */
class VariantShreddingSpec extends SparkTestBase {
  import spark.implicits._

  private def newTable(): String = {
    val d = Files.createTempDirectory("varshred")
    org.apache.commons.io.FileUtils.deleteDirectory(d.toFile)
    d.toString
  }
  private def cleanup(t: String): Unit =
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(t))

  private def variantDf(rows: Seq[(Long, String)]) =
    rows.toDF("id", "js").selectExpr("id", "parse_json(js) AS v")

  test("appendShredded: files are shredded, feature declared at creation, reads agree") {
    val t = newTable()
    try {
      val rows = Seq(
        (1L, """{"a":5,"b":"x"}"""),
        (2L, """{"a":7,"b":"y","c":[1,2]}"""),
        (3L, """{"a":-2,"b":"z","d":{"e":true}}"""))
      DeltaWrite.appendShredded(variantDf(rows), t)
      val s = DeltaRead.snapshot(spark, t)
      assert(s.readerFeatures.contains("variantShredding") &&
        s.writerFeatures.contains("variantShredding"),
        "creation commit must declare the feature")
      // every staged file is genuinely shredded (typed_value in footer)
      val files = s.files.map(f => Paths.get(t, f.path))
      assert(files.nonEmpty && files.forall(p =>
        new String(Files.readAllBytes(p), "ISO-8859-1").contains("typed_value")))
      // values read back exactly
      val got = DeltaRead.read(spark, t)
        .selectExpr("id", "variant_get(v, '$.a', 'long') AS a",
          "variant_get(v, '$.b', 'string') AS b")
        .orderBy($"id").as[(Long, Long, String)].collect().toSeq
      assert(got == Seq((1L, 5L, "x"), (2L, 7L, "y"), (3L, -2L, "z")))
      // full variant binary reconstruction too (nested paths)
      val j = DeltaRead.read(spark, t).where($"id" === 3L)
        .selectExpr("to_json(v) AS j").as[String].head()
      assert(j.contains("\"e\":true"))
    } finally cleanup(t)
  }

  /** Spark 4 shreds variant writes BY DEFAULT — so the protocol
    * discipline under test is the guard the other way around: a table
    * that does NOT declare variantShredding must keep receiving
    * UNSHREDDED bytes from routine writes, whatever the session conf
    * says, until the explicit upgrade path runs. */
  test("undeclared table gets unshredded bytes; appendShredded upgrades BEFORE bytes land") {
    val t = newTable()
    try {
      // a variantType-only table (the foreign/legacy shape)
      spark.conf.set("spark.sql.variant.writeShredding.enabled", "false")
      try DeltaWrite.append(variantDf(Seq((1L, """{"a":1}"""))), t)     // v0
      finally spark.conf.unset("spark.sql.variant.writeShredding.enabled")
      val s0 = DeltaRead.snapshot(spark, t)
      assert(s0.readerFeatures.contains("variantType") &&
        !s0.readerFeatures.contains("variantShredding"))
      // a PLAIN append under the shred-by-default session conf must
      // honor the declared protocol: bytes land UNSHREDDED
      DeltaWrite.append(variantDf(Seq((2L, """{"a":2}"""))), t)         // v1
      val s1 = DeltaRead.snapshot(spark, t)
      assert(!s1.writerFeatures.contains("variantShredding"))
      assert(s1.files.forall(f => !new String(
        Files.readAllBytes(Paths.get(t, f.path)), "ISO-8859-1")
        .contains("typed_value")))
      DeltaWrite.appendShredded(variantDf(Seq((3L, """{"a":3}"""))), t) // v2 upgrade, v3 data
      // the protocol upgrade is its OWN commit, before the shredded add
      val v2 = Files.readAllLines(
        Paths.get(t, "_delta_log", f"${2L}%020d.json")).asScala.mkString
      assert(v2.contains("variantShredding") && !v2.contains("\"add\""))
      val s = DeltaRead.snapshot(spark, t)
      assert(s.writerFeatures.contains("variantShredding"))
      // mixed shredded + unshredded files read as one table
      assert(DeltaRead.read(spark, t)
        .selectExpr("variant_get(v, '$.a', 'long') AS a")
        .as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L))
      // plain appends remain legal (and may now shred freely)
      DeltaWrite.append(variantDf(Seq((4L, """{"a":4}"""))), t)
      assert(DeltaRead.read(spark, t).count() == 4)
    } finally cleanup(t)
  }

  test("a FOREIGN shredded table (feature-declared, hand-authored log) opens and reads") {
    val t = newTable()
    try {
      // stage shredded parquet the way a foreign engine would
      spark.conf.set("spark.sql.variant.writeShredding.enabled", "true")
      spark.conf.set("spark.sql.variant.inferShreddingSchema", "true")
      try variantDf(Seq((1L, """{"q":10,"w":"aa"}"""), (2L, """{"q":20,"w":"bb"}""")))
        .coalesce(1).write.parquet(t + "/data")
      finally {
        spark.conf.unset("spark.sql.variant.writeShredding.enabled")
        spark.conf.unset("spark.sql.variant.inferShreddingSchema")
      }
      val part = Files.list(Paths.get(t, "data")).iterator().asScala
        .filter(_.getFileName.toString.endsWith(".parquet")).toSeq.head
      val ld = Paths.get(t, "_delta_log"); Files.createDirectories(ld)
      val schema = """{\"type\":\"struct\",\"fields\":[{\"name\":\"id\",\"type\":\"long\",\"nullable\":true,\"metadata\":{}},{\"name\":\"v\",\"type\":\"variant\",\"nullable\":true,\"metadata\":{}}]}"""
      Files.write(ld.resolve(f"${0L}%020d.json"), Seq(
        """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":["variantType","variantShredding"],"writerFeatures":["variantType","variantShredding"]}}""",
        s"""{"metaData":{"id":"foreign","schemaString":"$schema","partitionColumns":[],"configuration":{}}}""",
        s"""{"add":{"path":"data/${part.getFileName}","partitionValues":{},"size":${Files.size(part)},"modificationTime":0,"dataChange":true}}""").asJava)
      val got = DeltaRead.read(spark, t)
        .selectExpr("id", "variant_get(v, '$.q', 'long') AS q",
          "variant_get(v, '$.w', 'string') AS w")
        .orderBy($"id").as[(Long, Long, String)].collect().toSeq
      assert(got == Seq((1L, 10L, "aa"), (2L, 20L, "bb")))
    } finally cleanup(t)
  }
}
