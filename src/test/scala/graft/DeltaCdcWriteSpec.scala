package graft

import graft.io.{DeltaRead, DeltaWrite}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** WRITE-side Change Data Feed: a table with
  * `delta.enableChangeDataFeed = true` obligates the writer to record
  * every row-level change a commit's add/remove actions cannot
  * represent as `_change_data/` cdc parquet (PROTOCOL.md "Add CDC
  * File"). These specs pin: the cdc actions land (deleteWhere / merge /
  * restore), a cdc read and a reconstruction read of the same history
  * agree (row-for-row where reconstruction is exact; fold-to-snapshot
  * always), merge cdc never reports kept rows, the protocol advances
  * as the feature requires, and vacuum leaves `_change_data` alone. */
class DeltaCdcWriteSpec extends SparkTestBase {
  import spark.implicits._

  private def newTable(): String =
    Files.createTempDirectory("deltacdc").toString

  private def cleanup(t: String): Unit =
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(t))

  private def commitLines(t: String, v: Long): Seq[String] =
    Files.readAllLines(Paths.get(t, "_delta_log", f"$v%020d.json")).asScala.toSeq

  private def hasCdcAction(t: String, v: Long): Boolean =
    commitLines(t, v).exists(_.contains("\"cdc\""))

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq

  private def fold(changes: DataFrame, keyCols: Seq[String]): DataFrame =
    changes.groupBy(keyCols.map(col): _*)
      .agg(sum(when(col(DeltaRead.ChangeTypeCol) === "insert", 1).otherwise(-1)).as("net"))
      .where(col("net") === 1).drop("net")

  test("deleteWhere on a CDF table emits cdc; cdc read == reconstruction read row-for-row") {
    val t = newTable()
    try {
      val df = (1 to 60).map(i => (i.toLong, s"x$i")).toDF("id", "txt")
      DeltaWrite.append(df, t)                                         // v0
      DeltaWrite.setProperties(spark, t, Map("delta.enableChangeDataFeed" -> "true")) // v1
      val dv = DeltaWrite.deleteWhere(spark, t, $"id" % 3 === 0)       // v2
      assert(hasCdcAction(t, dv), "DV delete on a CDF table must carry cdc actions")
      assert(Files.isDirectory(Paths.get(t, "_change_data")))
      val viaCdc = DeltaRead.changesBetween(spark, t, dv - 1, dv)
      val viaRecon = DeltaRead.changesBetween(spark, t, dv - 1, dv, useCdc = false)
      assert(sortedRows(viaCdc) == sortedRows(viaRecon),
        "cdc read and reconstruction read of a DV delete must agree row-for-row")
      assert(viaCdc.where(col(DeltaRead.ChangeTypeCol) =!= "delete").count() == 0)
      assert(viaCdc.count() == 20)
      // and folding the whole feed still reproduces the snapshot
      val folded = fold(DeltaRead.changesBetween(spark, t, -1L, dv), Seq("id", "txt"))
      assert(sortedRows(folded.select($"id", $"txt")) ==
        sortedRows(DeltaRead.read(spark, t).select($"id", $"txt")))
    } finally cleanup(t)
  }

  test("merge cdc records exact changes — kept rows never surface as spurious pairs") {
    val t = newTable()
    try {
      val df = (1 to 50).map(i => (i.toLong, s"x$i")).toDF("id", "txt")
      DeltaWrite.append(df.repartition(1), t)                          // v0: one file
      DeltaWrite.setProperties(spark, t, Map("delta.enableChangeDataFeed" -> "true")) // v1
      val src = Seq((3L, "upd3"), (7L, "upd7"), (99L, "new99")).toDF("id", "txt")
      val mv = DeltaWrite.merge(spark, t, src, Seq("id"))              // v2
      assert(hasCdcAction(t, mv))
      val viaCdc = DeltaRead.changesBetween(spark, t, mv - 1, mv)
      // exactly: 2 updates (pre+post pairs → delete+insert) + 1 insert
      assert(viaCdc.count() == 5, s"got ${viaCdc.count()} change rows")
      assert(viaCdc.where(col(DeltaRead.ChangeTypeCol) === "delete").count() == 2)
      assert(viaCdc.where(col(DeltaRead.ChangeTypeCol) === "insert").count() == 3)
      // kept rows (e.g. id=1) must NOT appear — reconstruction would
      // report all 50 rewritten rows; cdc is the exact change set
      assert(viaCdc.where($"id" === 1L).count() == 0)
      val viaRecon = DeltaRead.changesBetween(spark, t, mv - 1, mv, useCdc = false)
      assert(viaRecon.count() > viaCdc.count())
      // both paths fold to the same final state
      val a = fold(DeltaRead.changesBetween(spark, t, -1L, mv), Seq("id", "txt"))
      val b = fold(DeltaRead.changesBetween(spark, t, -1L, mv, useCdc = false),
        Seq("id", "txt"))
      val live = DeltaRead.read(spark, t)
      assert(sortedRows(a) == sortedRows(live.select($"id", $"txt")))
      assert(sortedRows(b) == sortedRows(live.select($"id", $"txt")))
    } finally cleanup(t)
  }

  test("restore on a CDF table emits cdc; feed folds to the restored state") {
    val t = newTable()
    try {
      val df = (1 to 40).map(i => (i.toLong, s"x$i")).toDF("id", "txt")
      DeltaWrite.append(df, t)                                         // v0
      DeltaWrite.setProperties(spark, t, Map("delta.enableChangeDataFeed" -> "true")) // v1
      DeltaWrite.deleteWhere(spark, t, $"id" % 4 === 0)                // v2 (DV + cdc)
      val rv = DeltaWrite.restore(spark, t, 0L)                        // v3
      assert(hasCdcAction(t, rv), "restore on a CDF table must carry cdc actions")
      // the restore commit's cdc = exactly the 10 resurrected rows
      val restoreChanges = DeltaRead.changesBetween(spark, t, rv - 1, rv)
      assert(restoreChanges.count() == 10)
      assert(restoreChanges.where(col(DeltaRead.ChangeTypeCol) =!= "insert").count() == 0)
      val folded = fold(DeltaRead.changesBetween(spark, t, -1L, rv), Seq("id", "txt"))
      assert(sortedRows(folded) == sortedRows(DeltaRead.read(spark, t).select($"id", $"txt")))
      assert(DeltaRead.read(spark, t).count() == 40)
    } finally cleanup(t)
  }

  test("setProperties advances the protocol: legacy bumps to writer v4, feature form gains changeDataFeed") {
    val legacy = newTable(); val featured = newTable()
    try {
      DeltaWrite.append((1 to 10).map(i => (i.toLong, s"x$i")).toDF("id", "txt"), legacy)
      DeltaWrite.setProperties(spark, legacy, Map("delta.enableChangeDataFeed" -> "true"))
      val ls = DeltaRead.snapshot(spark, legacy)
      assert(ls.minWriterVersion == 4, s"legacy table must bump to writer v4, got ${ls.minWriterVersion}")
      DeltaWrite.append((1 to 10).map(i => (i.toLong, s"x$i")).toDF("id", "txt"), featured)
      DeltaWrite.deleteWhere(spark, featured, $"id" === 1L) // (3,7) upgrade first
      DeltaWrite.setProperties(spark, featured, Map("delta.enableChangeDataFeed" -> "true"))
      val fs = DeltaRead.snapshot(spark, featured)
      assert(fs.minWriterVersion == 7 && fs.writerFeatures.contains("changeDataFeed"),
        s"feature-form table must gain changeDataFeed: ${fs.writerFeatures}")
    } finally { cleanup(legacy); cleanup(featured) }
  }

  test("cdc works on a column-mapped CDF table (physical names in files, logical out)") {
    val t = newTable()
    try {
      val df = (1 to 30).map(i => (i.toLong, s"x$i", if (i % 2 == 0) "a" else "b"))
        .toDF("id", "txt", "grp")
      DeltaWrite.createColumnMapped(df, t, partitionBy = Seq("grp"))
      DeltaWrite.setProperties(spark, t, Map("delta.enableChangeDataFeed" -> "true"))
      val dv = DeltaWrite.deleteWhere(spark, t, $"id" % 5 === 0)
      assert(hasCdcAction(t, dv))
      val viaCdc = DeltaRead.changesBetween(spark, t, dv - 1, dv)
      assert(viaCdc.columns.toSet ==
        Set("id", "txt", "grp", DeltaRead.ChangeTypeCol, DeltaRead.CommitVersionCol))
      assert(viaCdc.count() == 6)
      assert(sortedRows(viaCdc) ==
        sortedRows(DeltaRead.changesBetween(spark, t, dv - 1, dv, useCdc = false)))
      // the cdc parquet itself stores PHYSICAL column names
      val cdcFile = Files.walk(Paths.get(t, "_change_data")).iterator().asScala
        .find(_.getFileName.toString.endsWith(".parquet")).get
      val raw = spark.read.parquet(cdcFile.toString)
      assert(!raw.columns.contains("id") && raw.columns.contains("_change_type"),
        s"cdc file must store physical names: ${raw.columns.mkString(",")}")
    } finally cleanup(t)
  }

  test("vacuum never reclaims _change_data files") {
    val t = newTable()
    try {
      DeltaWrite.append((1 to 30).map(i => (i.toLong, s"x$i")).toDF("id", "txt"), t)
      DeltaWrite.setProperties(spark, t, Map("delta.enableChangeDataFeed" -> "true"))
      val dv = DeltaWrite.deleteWhere(spark, t, $"id" % 3 === 0)
      val cdcFiles = Files.walk(Paths.get(t, "_change_data")).iterator().asScala
        .filter(_.getFileName.toString.endsWith(".parquet")).toList
      assert(cdcFiles.nonEmpty)
      cdcFiles.foreach(p => Files.setLastModifiedTime(p,
        java.nio.file.attribute.FileTime.fromMillis(1000L)))
      DeltaWrite.vacuum(spark, t, retentionMs = -60000)
      cdcFiles.foreach(p => assert(Files.exists(p), s"vacuum reclaimed cdc file $p"))
      // the feed still reads whole afterwards
      assert(DeltaRead.changesBetween(spark, t, dv - 1, dv).count() == 10)
    } finally cleanup(t)
  }
}
