package graft

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, StructField, StructType}

import graft.io.{DeltaRead, DeltaWrite}

/** CONVERT TO DELTA ([[DeltaWrite.convertToDelta]] + the SQL door):
  * a Delta log over an existing parquet directory in place — no data
  * moved, footer stats harvested, partition layout declared not
  * guessed. After conversion the directory is a first-class table:
  * DML, OPTIMIZE, time travel all work. */
class ConvertToDeltaSpec extends SparkTestBase {
  import spark.implicits._

  private def newDir(): String = Files.createTempDirectory("convert").toString
  private def cleanup(t: String): Unit =
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(t))

  test("flat directory: in-place, stats harvested, DML works after") {
    val d = newDir() + "/t"
    try {
      (1L to 100L).map(i => (i, i % 7)).toDF("id", "grp")
        .repartition(4).write.parquet(d)
      val parquetBefore = {
        val st = Files.walk(Paths.get(d))
        try st.iterator().asScala.count(
          _.getFileName.toString.endsWith(".parquet"))
        finally st.close()
      }
      DeltaWrite.convertToDelta(spark, d)
      assert(DeltaRead.read(spark, d).count() == 100)
      val snap = DeltaRead.snapshot(spark, d)
      assert(snap.files.size == parquetBefore, "every file referenced in place")
      assert(snap.files.forall(f => f.stats.isDefined && f.size.isDefined),
        "footer stats + size must ride every add from version 0")
      // data skipping works from commit zero
      val kept = DeltaRead.filesAfterSkipping(spark, d, 0L,
        Seq(DeltaRead.StatRange.atLeast("id", 1000L)))
      assert(kept.isEmpty, "id >= 1000 must prune every file by stats")
      // the converted table is a full citizen: DV delete + compact
      DeltaWrite.deleteWhere(spark, d, col("id") % 10 === 0)
      assert(DeltaRead.read(spark, d).count() == 90)
      DeltaWrite.compact(spark, d)
      assert(DeltaRead.read(spark, d).count() == 90)
      // converting again refuses
      val e = intercept[IllegalArgumentException](
        DeltaWrite.convertToDelta(spark, d))
      assert(e.getMessage.contains("_delta_log"))
    } finally cleanup(Paths.get(d).getParent.toString)
  }

  test("partitioned layout: declared schema, pruning works, drift refuses") {
    val d = newDir() + "/p"
    try {
      (1L to 60L).map(i => (i, (i % 3).toInt)).toDF("id", "p")
        .write.partitionBy("p").parquet(d)
      // undeclared partitioning refuses (k=v dirs present)
      val e0 = intercept[IllegalArgumentException](
        DeltaWrite.convertToDelta(spark, d))
      assert(e0.getMessage.contains("PARTITIONED BY"))
      DeltaWrite.convertToDelta(spark, d,
        Some(StructType(Seq(StructField("p", IntegerType)))))
      val got = DeltaRead.read(spark, d)
      assert(got.count() == 60)
      assert(got.filter(col("p") === 1).count() == 20)
      // partition values decoded from the Hive dirs
      val snap = DeltaRead.snapshot(spark, d)
      assert(snap.partitionColumns == Seq("p"))
      assert(snap.files.flatMap(_.partitionValues.get("p")).toSet
        == Set("0", "1", "2"))
      // wrong declaration refuses
      val d2 = newDir() + "/p2"
      (1L to 10L).map(i => (i, (i % 2).toInt)).toDF("id", "q")
        .write.partitionBy("q").parquet(d2)
      val e1 = intercept[IllegalArgumentException](
        DeltaWrite.convertToDelta(spark, d2,
          Some(StructType(Seq(StructField("nope", IntegerType))))))
      assert(e1.getMessage.contains("declares"))
      cleanup(Paths.get(d2).getParent.toString)
    } finally cleanup(Paths.get(d).getParent.toString)
  }

  test("SQL door: CONVERT TO DELTA '<path>' [PARTITIONED BY (...)]") {
    val d = newDir() + "/s"
    try {
      (1L to 40L).map(i => (i, (i % 2).toInt)).toDF("id", "p")
        .write.partitionBy("p").parquet(d)
      val r = spark.sql(
        s"CONVERT TO DELTA '$d' PARTITIONED BY (p INT)").collect().head
      assert(r.getLong(1) >= 2L, "at least one file per partition")
      assert(spark.read.format("graft-delta").load(d).count() == 40)
    } finally cleanup(Paths.get(d).getParent.toString)
  }
}
