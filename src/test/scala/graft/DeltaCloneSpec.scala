package graft

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._

import graft.io.{DeltaRead, DeltaWrite}

/** Protocol SHALLOW CLONE ([[DeltaWrite.shallowClone]] + the SQL
  * `CREATE TABLE dst SHALLOW CLONE src` door): a metadata-only table
  * whose add actions carry ABSOLUTE paths into the source. The
  * contract under test — zero data files under the clone's root,
  * version pinning against a moving source, write isolation in both
  * directions, deletion vectors re-addressed not copied, OPTIMIZE
  * progressively localizing the clone, and VACUUM never reaching
  * across into source data. */
class DeltaCloneSpec extends SparkTestBase {
  import spark.implicits._

  private def newDir(): String = Files.createTempDirectory("deltaclone").toString
  private def cleanup(t: String): Unit =
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(t))

  /** Data-file (non-log) parquet under a table root. */
  private def parquetUnder(t: String): Seq[String] = {
    val st = Files.walk(Paths.get(t))
    try st.iterator().asScala
      .filter(p => p.getFileName.toString.endsWith(".parquet") &&
        !p.startsWith(Paths.get(t, "_delta_log")))
      .map(_.toString).toList
    finally st.close()
  }

  test("shallow clone is metadata-only, reads the source, pins the version") {
    val src = newDir(); val dst = newDir() + "/c"
    try {
      DeltaWrite.append((1L to 100L).toDF("id"), src)            // v0
      DeltaWrite.append((101L to 120L).toDF("id"), src)          // v1
      val v = DeltaWrite.shallowClone(spark, src, dst)
      assert(v == 0L)
      assert(parquetUnder(dst).isEmpty, "a shallow clone copies ZERO data files")
      assert(DeltaRead.read(spark, dst).count() == 120)
      // the source advancing never shows through
      DeltaWrite.append((121L to 200L).toDF("id"), src)          // v2
      DeltaWrite.compact(spark, src)
      assert(DeltaRead.read(spark, dst).count() == 120,
        "clone must pin the source AS OF the cloned version")
      assert(DeltaRead.read(spark, src).count() == 200)
      // VERSION AS OF an older version pins that version
      val dst2 = newDir() + "/c2"
      DeltaWrite.shallowClone(spark, src, dst2, version = Some(0L))
      assert(DeltaRead.read(spark, dst2).count() == 100)
      cleanup(Paths.get(dst2).getParent.toString)
    } finally { cleanup(src); cleanup(Paths.get(dst).getParent.toString) }
  }

  test("writes are isolated both ways; stats/data-skipping survive the clone") {
    val src = newDir(); val dst = newDir() + "/c"
    try {
      DeltaWrite.append((1L to 50L).map(i => (i, i * 2)).toDF("id", "v"), src)
      DeltaWrite.shallowClone(spark, src, dst)
      DeltaWrite.append((51L to 60L).map(i => (i, i * 2)).toDF("id", "v"), dst)
      assert(DeltaRead.read(spark, dst).count() == 60)
      assert(DeltaRead.read(spark, src).count() == 50,
        "appending to the clone must not touch the source")
      // the clone's new file lands under the CLONE's root
      assert(parquetUnder(dst).nonEmpty)
      assert(parquetUnder(src).size == parquetUnder(src).distinct.size)
      // add.stats rode through: data skipping on the clone still prunes
      val snap = DeltaRead.snapshot(spark, dst)
      assert(snap.files.forall(_.stats.isDefined),
        "cloned adds must carry the source's stats")
      assert(snap.files.forall(_.size.isDefined),
        "cloned adds must carry add.size (no per-file stats at scale)")
    } finally { cleanup(src); cleanup(Paths.get(dst).getParent.toString) }
  }

  test("deletion vectors re-address as absolute; deletes on the clone stay local") {
    val src = newDir(); val dst = newDir() + "/c"
    try {
      DeltaWrite.append((1L to 100L).toDF("id"), src)
      DeltaWrite.deleteWhere(spark, src, col("id") % 10 === 0)   // DV on source
      DeltaWrite.shallowClone(spark, src, dst)
      assert(DeltaRead.read(spark, dst).count() == 90,
        "the clone must see the source's deletion vectors")
      val d = DeltaRead.snapshot(spark, dst).files.flatMap(_.dv)
      assert(d.nonEmpty && d.forall(_.storageType == "p"),
        s"'u' descriptors resolve against the SOURCE root and must be " +
          s"re-addressed as absolute, got ${d.map(_.storageType)}")
      // a delete on the CLONE writes its bitmap under the clone's root
      DeltaWrite.deleteWhere(spark, dst, col("id") === 1L)
      assert(DeltaRead.read(spark, dst).count() == 89)
      assert(DeltaRead.read(spark, src).count() == 90,
        "deleting on the clone must not touch the source")
    } finally { cleanup(src); cleanup(Paths.get(dst).getParent.toString) }
  }

  test("OPTIMIZE localizes the clone; VACUUM never deletes source data") {
    val src = newDir(); val dst = newDir() + "/c"
    try {
      (0 until 4).foreach(i =>
        DeltaWrite.append((1L to 25L).map(_ + i * 25).toDF("id"), src))
      DeltaWrite.shallowClone(spark, src, dst)
      val srcFiles = parquetUnder(src).toSet
      assert(DeltaWrite.compact(spark, dst) > 0, "4 small files bin-pack")
      val snap = DeltaRead.snapshot(spark, dst)
      assert(snap.files.forall(f => !Paths.get(f.path).isAbsolute),
        "after OPTIMIZE every live entry is clone-local")
      assert(DeltaRead.read(spark, dst).count() == 100)
      // vacuum the clone aggressively: the tombstoned ABSOLUTE entries
      // (the source's files!) must survive — external paths are never
      // deletion candidates
      DeltaWrite.vacuum(spark, dst, retentionMs = 0L)
      assert(srcFiles.forall(p => Files.exists(Paths.get(p))),
        "VACUUM on a clone must never reach into the source's data")
      assert(DeltaRead.read(spark, src).count() == 100)
    } finally { cleanup(src); cleanup(Paths.get(dst).getParent.toString) }
  }

  test("SQL door: CREATE TABLE ... SHALLOW CLONE, IF NOT EXISTS, OR REPLACE") {
    val wh = graft.io.Staging.tempDir("graft_clone_cat")
    spark.conf.set("spark.sql.catalog.gclone",
      classOf[graft.io.v2.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gclone.warehouse", wh)
    try {
      spark.sql("CREATE TABLE gclone.s (id BIGINT) USING `graft-delta`")
      spark.sql("INSERT INTO gclone.s VALUES (1), (2), (3)")
      spark.sql("INSERT INTO gclone.s VALUES (4), (5)")
      val r = spark.sql(
        "CREATE TABLE gclone.c SHALLOW CLONE gclone.s").collect().head
      assert(r.getLong(3) == 0L)
      assert(spark.sql("SELECT count(*) FROM gclone.c").head.getLong(0) == 5)
      // the clone is a first-class catalog table: DML works on it
      spark.sql("INSERT INTO gclone.c VALUES (6)")
      assert(spark.sql("SELECT count(*) FROM gclone.c").head.getLong(0) == 6)
      assert(spark.sql("SELECT count(*) FROM gclone.s").head.getLong(0) == 5)
      // IF NOT EXISTS no-ops on an existing table
      val skip = spark.sql(
        "CREATE TABLE IF NOT EXISTS gclone.c SHALLOW CLONE gclone.s").collect().head
      assert(skip.getLong(2) == -1L && skip.getLong(3) == -1L)
      assert(spark.sql("SELECT count(*) FROM gclone.c").head.getLong(0) == 6)
      // VERSION AS OF pins: version 1 = first insert only
      spark.sql(
        "CREATE TABLE gclone.c1 SHALLOW CLONE gclone.s VERSION AS OF 1")
      assert(spark.sql("SELECT count(*) FROM gclone.c1").head.getLong(0) == 3)
      // OR REPLACE re-points the clone at the source's head, one commit
      val rep = spark.sql(
        "CREATE OR REPLACE TABLE gclone.c1 SHALLOW CLONE gclone.s").collect().head
      assert(rep.getLong(3) == 1L, "replace lands as ONE new commit")
      assert(spark.sql("SELECT count(*) FROM gclone.c1").head.getLong(0) == 5)
      // history survives the replace: time travel to the pinned version
      assert(spark.sql("SELECT count(*) FROM gclone.c1 VERSION AS OF 0")
        .head.getLong(0) == 3)
      // plain CREATE refuses an existing destination
      val e = intercept[Exception](spark.sql(
        "CREATE TABLE gclone.c SHALLOW CLONE gclone.s"))
      assert(e.getMessage.contains("replace"))
      // TIMESTAMP AS OF (epoch millis after the last commit → head)
      spark.sql(s"CREATE TABLE gclone.ct SHALLOW CLONE gclone.s " +
        s"TIMESTAMP AS OF '${System.currentTimeMillis()}'")
      assert(spark.sql("SELECT count(*) FROM gclone.ct").head.getLong(0) == 5)
      spark.sql("DROP TABLE IF EXISTS gclone.ct")
    } finally {
      spark.sql("DROP TABLE IF EXISTS gclone.c")
      spark.sql("DROP TABLE IF EXISTS gclone.c1")
      spark.sql("DROP TABLE IF EXISTS gclone.s")
      cleanup(wh)
    }
  }

  test("clone of a column-mapped, partitioned table keeps physical identity") {
    val src = newDir(); val dst = newDir() + "/c"
    try {
      DeltaWrite.createColumnMapped(
        (1L to 40L).map(i => (i, i % 4)).toDF("id", "p"), src,
        partitionBy = Seq("p"))
      DeltaWrite.shallowClone(spark, src, dst)
      val got = DeltaRead.read(spark, dst)
      assert(got.count() == 40)
      assert(got.columns.toSeq == Seq("id", "p"),
        "logical names must survive the mapped clone")
      assert(got.filter(col("p") === 2).count() == 10)
      // rename on the CLONE (metaData-only) leaves the source alone
      DeltaWrite.renameColumn(spark, dst, "id", "key")
      assert(DeltaRead.read(spark, dst).columns.toSeq == Seq("key", "p"))
      assert(DeltaRead.read(spark, src).columns.toSeq == Seq("id", "p"))
    } finally { cleanup(src); cleanup(Paths.get(dst).getParent.toString) }
  }

  test("UPDATE and MERGE on a clone rewrite locally, source untouched") {
    val src = newDir(); val dst = newDir() + "/c"
    try {
      DeltaWrite.append((1L to 40L).map(i => (i, i * 10)).toDF("id", "v"), src)
      DeltaWrite.shallowClone(spark, src, dst)
      // copy-on-write UPDATE: touched absolute files tombstone, the
      // rewrite lands under the CLONE's root
      DeltaWrite.updateWhere(spark, dst, col("id") <= 5,
        Seq("v" -> (col("v") + 1)))
      val afterUpdate = DeltaRead.read(spark, dst)
      assert(afterUpdate.filter(col("id") === 1).head.getLong(1) == 11)
      assert(DeltaRead.read(spark, src).filter(col("id") === 1)
        .head.getLong(1) == 10, "UPDATE on the clone must not touch the source")
      assert(parquetUnder(dst).nonEmpty, "the rewrite is clone-local")
      // MERGE upsert through the general path
      import spark.implicits._
      val updates = Seq((2L, 999L), (100L, 1000L)).toDF("id", "v")
      DeltaWrite.merge(spark, dst, updates, Seq("id"))
      val m = DeltaRead.read(spark, dst)
      assert(m.filter(col("id") === 2).head.getLong(1) == 999)
      assert(m.filter(col("id") === 100).head.getLong(1) == 1000)
      assert(m.count() == 41)
      assert(DeltaRead.read(spark, src).count() == 40)
      // every file the source owns is still byte-identical in place
      assert(DeltaRead.read(spark, src).agg(sum(col("v"))).head.getLong(0)
        == (1L to 40L).map(_ * 10).sum)
    } finally { cleanup(src); cleanup(Paths.get(dst).getParent.toString) }
  }

  test("clone survives checkpoint resolution; clone-of-clone passes through") {
    val src = newDir(); val dst = newDir() + "/c"
    try {
      DeltaWrite.append((1L to 30L).toDF("id"), src)
      DeltaWrite.shallowClone(spark, src, dst)
      // force a checkpoint on the CLONE: absolute add paths must
      // round-trip through the parquet state (encode → decode)
      DeltaWrite.setProperties(spark, dst,
        Map("delta.checkpointInterval" -> "2"))
      DeltaWrite.append((31L to 40L).toDF("id"), dst)
      DeltaWrite.append((41L to 50L).toDF("id"), dst)
      val log = Paths.get(dst, "_delta_log")
      val st = Files.list(log)
      val hasCp = try st.iterator().asScala
        .exists(_.getFileName.toString.contains(".checkpoint."))
        finally st.close()
      assert(hasCp, "checkpointInterval=2 must have produced a checkpoint")
      assert(DeltaRead.read(spark, dst).count() == 50,
        "checkpoint-resolved clone must still serve the absolute entries")
      // a DV on an ABSOLUTE entry: the bitmap lives under the FIRST
      // clone's root ("u"-typed), so the hard-link clone below must
      // re-address it — resolving "u" against the new root would read
      // a missing bitmap (or worse, silently unmask)
      DeltaWrite.deleteWhere(spark, dst, col("id") === 7L)
      // hard-link clone OF a shallow clone: absolute entries pass
      // through verbatim (nothing under the source root to link)
      val dst2 = newDir() + "/cc"
      DeltaWrite.clone(spark, dst, dst2)
      assert(DeltaRead.read(spark, dst2).count() == 49)
      assert(DeltaRead.read(spark, dst2).filter(col("id") === 7).count() == 0,
        "the absolute entry's deletion vector must still mask")
      // the shallow-clone's own (relative) files DID link; the
      // absolute ones stayed references into the original source
      val snap2 = DeltaRead.snapshot(spark, dst2)
      assert(snap2.files.exists(f => Paths.get(f.path).isAbsolute))
      assert(snap2.files.exists(f => !Paths.get(f.path).isAbsolute))
      cleanup(Paths.get(dst2).getParent.toString)
    } finally { cleanup(src); cleanup(Paths.get(dst).getParent.toString) }
  }

  test("replace refuses a CDF destination; clone carries row-tracking ids") {
    val src = newDir(); val dst = newDir() + "/c"
    try {
      DeltaWrite.append((1L to 10L).toDF("id"), src)
      DeltaWrite.shallowClone(spark, src, dst)
      DeltaWrite.setProperties(spark, dst,
        Map("delta.enableChangeDataFeed" -> "true"))
      val e = intercept[UnsupportedOperationException](
        DeltaWrite.shallowClone(spark, src, dst, replace = true))
      assert(e.getMessage.contains("change data feed"))
    } finally { cleanup(src); cleanup(Paths.get(dst).getParent.toString) }
  }

  test("DEEP CLONE materializes a self-contained table that survives source destruction") {
    val src = newDir(); val dst = newDir() + "/d"
    try {
      val df = (1L to 60L).map(i => (i, (i % 3).toString, s"v$i"))
        .toDF("id", "p", "txt")
      DeltaWrite.append(df, src, partitionBy = Seq("p"))           // v0
      DeltaWrite.enableRowTracking(spark, src)                     // v1
      DeltaWrite.deleteWhere(spark, src, $"id" % 7 === 0)          // v2: DVs
      val srcIds = DeltaRead.readWithRowIds(spark, src)
        .select($"id", col(DeltaRead.RowIdCol))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val v = DeltaWrite.deepClone(spark, src, dst)
      assert(v == 0L)
      // every add is RELATIVE (self-contained) and physically present
      val s = DeltaRead.snapshot(spark, dst)
      assert(s.files.nonEmpty &&
        s.files.forall(f => !Paths.get(f.path).isAbsolute),
        "deep clone adds must be table-relative")
      assert(parquetUnder(dst).nonEmpty, "deep clone must copy bytes")
      assert(s.files.forall(_.partitionValues.keySet == Set("p")))
      // stats carried from the log (no re-harvest): still prunable
      assert(s.files.forall(_.stats.isDefined))
      // row ids verbatim; DV masking intact
      val dstIds = DeltaRead.readWithRowIds(spark, dst)
        .select($"id", col(DeltaRead.RowIdCol))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(dstIds == srcIds)
      // the proof of self-containment: DESTROY the source entirely
      cleanup(src)
      assert(DeltaRead.read(spark, dst).count() == 60 - 8,
        "deep clone must read whole with the source gone")
      assert(DeltaRead.read(spark, dst).where($"id" % 7 === 0).count() == 0,
        "deletion vectors must mask in the clone with the source gone")
    } finally {
      if (Files.exists(Paths.get(src))) cleanup(src)
      cleanup(Paths.get(dst).getParent.toString)
    }
  }

  test("SQL: CREATE TABLE ... DEEP CLONE localizes a shallow clone's absolute entries") {
    val src = newDir(); val mid = newDir() + "/m"; val dst = newDir() + "/d2"
    try {
      DeltaWrite.append((1L to 40L).toDF("id"), src)
      DeltaWrite.shallowClone(spark, src, mid)
      assert(DeltaRead.snapshot(spark, mid).files
        .forall(f => Paths.get(f.path).isAbsolute))
      val row = spark.sql(
        s"CREATE TABLE '$dst' DEEP CLONE '$mid'").collect().head
      assert(row.getString(0) == dst && row.getLong(3) == 0L)
      // the deep clone of a shallow clone owns LOCAL copies
      val s = DeltaRead.snapshot(spark, dst)
      assert(s.files.forall(f => !Paths.get(f.path).isAbsolute))
      cleanup(src); cleanup(Paths.get(mid).getParent.toString)
      assert(DeltaRead.read(spark, dst).agg(sum($"id")).head.getLong(0) ==
        (1L to 40L).sum)
    } finally {
      if (Files.exists(Paths.get(src))) cleanup(src)
      if (Files.exists(Paths.get(mid).getParent)) cleanup(Paths.get(mid).getParent.toString)
      cleanup(Paths.get(dst).getParent.toString)
    }
  }
}
