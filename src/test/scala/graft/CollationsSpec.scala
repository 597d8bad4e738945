package graft

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._

import graft.io.{DeltaRead, DeltaWrite}

/** COLLATED string columns (the Delta `collations` writer feature):
  * collation must survive the schemaString round-trip, the protocol
  * must declare the obligation writer-side only, and — the actual
  * writer obligation — binary-ordered min/max bounds must never be
  * emitted for collated columns, while skipping treats them as
  * evidence-free. */
class CollationsSpec extends SparkTestBase {
  import spark.implicits._

  private def newTable(): String = {
    val d = Files.createTempDirectory("collated")
    org.apache.commons.io.FileUtils.deleteDirectory(d.toFile)
    d.toString
  }
  private def cleanup(t: String): Unit =
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(t))

  private def collatedDf(rows: Seq[(Long, String)]) =
    rows.toDF("id", "raw")
      .select($"id", collate($"raw", "UTF8_LCASE").as("name"))

  test("creation declares collations writer-side only; collation survives the round-trip") {
    val t = newTable()
    try {
      DeltaWrite.append(collatedDf(Seq((1L, "Apple"), (2L, "apple"),
        (3L, "BANANA"), (4L, "banana"))), t)
      val s = DeltaRead.snapshot(spark, t)
      assert(s.writerFeatures.contains("collations"))
      assert(!s.readerFeatures.contains("collations"),
        "collations is writer-only — listing it reader-side locks out clients")
      assert(s.minReaderVersion == 1,
        "a writer-only feature set must not bump minReaderVersion")
      // the read-back column COMPARES case-insensitively: the
      // collation survived schemaString → scan schema
      val groups = DeltaRead.read(spark, t).groupBy($"name").count()
        .as[(String, Long)].collect().toMap
      assert(groups.size == 2 && groups.values.forall(_ == 2L),
        s"UTF8_LCASE grouping lost: $groups")
    } finally cleanup(t)
  }

  test("no binary min/max for collated columns; skipping treats them as evidence-free") {
    val t = newTable()
    try {
      DeltaWrite.append(collatedDf(Seq((1L, "Zebra"), (2L, "apple"))).coalesce(1), t)
      DeltaWrite.append(collatedDf(Seq((10L, "Mango"), (20L, "kiwi"))).coalesce(1), t)
      val ld = Paths.get(t, "_delta_log")
      (0L to 1L).foreach { v =>
        val add = Files.readAllLines(ld.resolve(f"$v%020d.json")).asScala
          .find(_.contains("\"add\"")).get
        val om = new com.fasterxml.jackson.databind.ObjectMapper()
        val st = om.readTree(om.readTree(add).get("add").get("stats").asText())
        assert(st.get("minValues").has("id") && st.get("maxValues").has("id"))
        assert(!st.get("minValues").has("name") && !st.get("maxValues").has("name"),
          s"binary bounds leaked for a collated column: $st")
        assert(st.get("nullCount").has("name"), "nullCount is collation-free — keep it")
      }
      // a StatRange on the collated column admits every file (sound);
      // the numeric column still prunes
      val head = DeltaRead.latestVersion(t)
      assert(DeltaRead.filesAfterSkipping(spark, t, head,
        Seq(DeltaRead.StatRange("name", Some("a"), Some("b")))).size == 2)
      assert(DeltaRead.filesAfterSkipping(spark, t, head,
        Seq(DeltaRead.StatRange("id", Some(5L), Some(30L)))).size == 1)
    } finally cleanup(t)
  }

  test("a COLUMN-MAPPED collated creation still strips bounds (physical stats keys)") {
    val t = newTable()
    try {
      // creation commit: mapping context + collated column in ONE
      // commit — the stats are keyed by col-<uuid> physical names that
      // only the commit's own metaData (not the pre-commit snapshot,
      // which doesn't exist yet) can resolve
      DeltaWrite.createColumnMapped(
        collatedDf(Seq((1L, "Zebra"), (2L, "apple"))).coalesce(1), t)
      val s = DeltaRead.snapshot(spark, t)
      assert(s.columnMappingMode == "name")
      val om = new com.fasterxml.jackson.databind.ObjectMapper()
      s.files.foreach { f =>
        val st = om.readTree(f.stats.get)
        val minKeys = st.get("minValues").fieldNames().asScala.toSet
        // snapshot stats are logical-renamed: id bounds survive, the
        // collated column's must be gone
        assert(minKeys.contains("id") && !minKeys.contains("name"),
          s"mapped collated bounds leaked: $st")
      }
      val groups = DeltaRead.read(spark, t).groupBy($"name").count().count()
      assert(groups == 2)
    } finally cleanup(t)
  }

  test("a foreign table declaring collations-preview accepts plain appends") {
    val t = newTable()
    try {
      DeltaWrite.append(Seq((1L, "x")).toDF("id", "s"), t)
      val proto = """{"protocol":{"minReaderVersion":1,"minWriterVersion":7,""" +
        """"writerFeatures":["appendOnly","invariants","collations-preview"]}}"""
      Files.write(Paths.get(t, "_delta_log", f"${1L}%020d.json"),
        Seq(proto).asJava)
      DeltaWrite.append(Seq((2L, "y")).toDF("id", "s"), t) // must not refuse
      assert(DeltaRead.read(spark, t).count() == 2)
    } finally cleanup(t)
  }
}
