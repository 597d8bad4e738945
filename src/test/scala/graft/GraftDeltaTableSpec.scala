package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.io.{DeltaRead, DeltaWrite, GraftDeltaTable}

/** The fluent table-handle facade: every verb must land on the same
  * transactional entry points the Scala and SQL doors use (no drift),
  * and the merge builder must compose ordered clauses exactly like
  * mergeAdvanced's own surface. */
class GraftDeltaTableSpec extends SparkTestBase {
  import spark.implicits._

  private def newDir(): String = Files.createTempDirectory("gdt").toString
  private def cleanup(t: String): Unit =
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(t))

  test("forPath verbs: read, delete, update, optimize, history, restore") {
    val t = newDir() + "/t"
    try {
      (0 until 3).foreach(i =>
        DeltaWrite.append((1L to 20L).map(_ + i * 20).map(i => (i, i * 2))
          .toDF("id", "v"), t))
      intercept[IllegalArgumentException](
        GraftDeltaTable.forPath(spark, "/nope"))
      val dt = GraftDeltaTable.forPath(spark, t)
      assert(dt.toDF.count() == 60)
      assert(dt.version == 2L)
      assert(dt.asOf(0L).count() == 20)
      dt.delete(col("id") % 10 === 0)
      assert(dt.toDF.count() == 54)
      dt.update(col("id") === 1L, Map("v" -> lit(999L)))
      assert(dt.toDF.filter(col("id") === 1).head.getLong(1) == 999L)
      assert(dt.optimize().executeCompaction() > 0)
      assert(dt.toDF.count() == 54)
      val hist = dt.history(Some(2))
      assert(hist.size == 2 && hist.head._3.contains("OPTIMIZE"))
      dt.restoreToVersion(2L)
      assert(dt.toDF.count() == 60)
      assert(dt.vacuum(retentionHours = 0.0) >= 1, "rewrites reclaimed")
      assert(dt.toDF.count() == 60, "live files survive the vacuum")
    } finally cleanup(java.nio.file.Paths.get(t).getParent.toString)
  }

  test("merge builder: ordered clauses, BY SOURCE, partial sets") {
    val t = newDir() + "/t"
    try {
      DeltaWrite.append(
        Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L)).toDF("id", "s", "v"), t)
      val src = Seq((1L, "A", 100L), (2L, "B", 2L), (9L, "I", 90L))
        .toDF("id", "s", "v")
      val dt = GraftDeltaTable.forPath(spark, t)
      dt.merge(src, Seq("id"))
        .whenMatched(DeltaWrite.mergeSrc("v") < col("v")).delete()
        .whenMatched().update(Map("s" -> DeltaWrite.mergeSrc("s")))
        .whenNotMatched().insertAll()
        .whenNotMatchedBySource(col("id") === 3L)
          .update(Map("s" -> lit("stale")))
        .execute()
      val got = dt.toDF.orderBy("id").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
      // id=1: src.v=100 >= 10 -> second clause, s updated, v kept
      // id=2: src.v=2 < 20 -> first clause fires, row deleted
      // id=3: unmatched by source, condition hits -> s = stale
      // id=9: inserted whole
      assert(got == Seq((1L, "A", 10L), (3L, "stale", 30L), (9L, "I", 90L)))
      // facade == engine: same merge through mergeAdvanced directly
      // leaves an identical table
      val t2 = newDir() + "/u"
      DeltaWrite.append(
        Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L)).toDF("id", "s", "v"), t2)
      DeltaWrite.mergeAdvanced(spark, t2, src, Seq("id"),
        matched = Seq(
          DeltaWrite.MergeDeleteWhen(Some(DeltaWrite.mergeSrc("v") < col("v"))),
          DeltaWrite.MergeUpdateWhen(None, Seq("s" -> DeltaWrite.mergeSrc("s")))),
        notMatched = Seq(DeltaWrite.MergeInsertWhen(None,
          src.columns.toSeq.map(c => c -> col(c)))),
        notMatchedBySource = Seq(DeltaWrite.MergeUpdateWhen(
          Some(col("id") === 3L), Seq("s" -> lit("stale")))))
      val got2 = DeltaRead.read(spark, t2).orderBy("id").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
      assert(got2 == got)
      cleanup(java.nio.file.Paths.get(t2).getParent.toString)
    } finally cleanup(java.nio.file.Paths.get(t).getParent.toString)
  }

  test("forName resolves catalog identifiers to the same handle") {
    val wh = graft.io.Staging.tempDir("graft_gdt_cat")
    spark.conf.set("spark.sql.catalog.gdt",
      classOf[graft.io.v2.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gdt.warehouse", wh)
    try {
      spark.sql("CREATE TABLE gdt.t (id BIGINT) USING `graft-delta`")
      spark.sql("INSERT INTO gdt.t VALUES (1), (2), (3)")
      val dt = GraftDeltaTable.forName(spark, "gdt.t")
      assert(dt.toDF.count() == 3)
      dt.delete(col("id") === 2L)
      assert(spark.sql("SELECT count(*) FROM gdt.t").head.getLong(0) == 2,
        "the handle and the SQL door see one table")
    } finally {
      spark.sql("DROP TABLE IF EXISTS gdt.t")
      cleanup(wh)
    }
  }

  test("shallowCloneTo and convertToDelta round through the facade") {
    val t = newDir() + "/t"; val c = newDir() + "/c"; val p = newDir() + "/p"
    try {
      DeltaWrite.append((1L to 30L).toDF("id"), t)
      val dt = GraftDeltaTable.forPath(spark, t)
      dt.shallowCloneTo(c)
      assert(GraftDeltaTable.forPath(spark, c).toDF.count() == 30)
      (31L to 40L).toDF("id").write.parquet(p)
      val conv = GraftDeltaTable.convertToDelta(spark, p)
      assert(conv.toDF.count() == 10)
      assert(conv.fsck(dryRun = true).isEmpty)
    } finally {
      cleanup(java.nio.file.Paths.get(t).getParent.toString)
      cleanup(java.nio.file.Paths.get(c).getParent.toString)
      cleanup(java.nio.file.Paths.get(p).getParent.toString)
    }
  }

  test("deepCloneTo, verifyChecksum and generateManifest round through the facade") {
    val t = newDir() + "/t"; val d = newDir() + "/d"
    try {
      DeltaWrite.append((1L to 30L).map(i => (i, (i % 2).toString))
        .toDF("id", "p"), t, partitionBy = Seq("p"))
      val dt = GraftDeltaTable.forPath(spark, t)
      assert(dt.verifyChecksum().contains(Nil), "fresh commit digest must verify")
      dt.deepCloneTo(d)
      cleanup(java.nio.file.Paths.get(t).getParent.toString)
      assert(GraftDeltaTable.forPath(spark, d).toDF.count() == 30,
        "deep clone must survive source destruction")
      assert(GraftDeltaTable.forPath(spark, d).generateManifest() == 2)
      assert(GraftDeltaTable.forPath(spark, d)
        .generateManifest(incremental = true) == 0, "unchanged → nothing rewritten")
    } finally {
      if (java.nio.file.Files.exists(java.nio.file.Paths.get(t).getParent))
        cleanup(java.nio.file.Paths.get(t).getParent.toString)
      cleanup(java.nio.file.Paths.get(d).getParent.toString)
    }
  }
}
