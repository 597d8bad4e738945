package graft

import graft.io.{DeltaRead, DeltaWrite}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}
import java.nio.file.attribute.FileTime
import scala.jdk.CollectionConverters._

/** The Dataset-tier snapshot file state (the engine's last 100 TB
  * driver ceiling, VERDICT r14 top item): past
  * `spark.graft.snapshot.datasetThreshold` advertised add-files, the
  * checkpoint's add rows stay a Spark DataFrame reconciled with the
  * JSON tail in a window — the driver holds O(tail), not O(table
  * files). Pins, on a synthetic 120 000-file log:
  *
  *  - the resolved state equals the Seq tier row-for-row;
  *  - resolution, data skipping, count/bytes aggregates, and vacuum
  *    NEVER materialize the full entry list on the driver (the
  *    [[DeltaRead.onDatasetMaterialize]] seam stays silent);
  *
  * and, on a real table pushed over a lowered threshold: reads,
  * deletes (DV masking), MERGE, DESCRIBE DETAIL, and vacuum all
  * behave byte-identically to the Seq tier. */
class DatasetSnapshotSpec extends SparkTestBase {
  import spark.implicits._

  private def newTable(): String =
    Files.createTempDirectory("dsindex").toString
  private def cleanup(t: String): Unit =
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(t))

  private val ThresholdKey = DeltaRead.DatasetThresholdKey
  private def withThreshold[A](n: Long)(body: => A): A = {
    val prior = spark.conf.getOption(ThresholdKey)
    spark.conf.set(ThresholdKey, n.toString)
    try body
    finally prior match {
      case Some(v) => spark.conf.set(ThresholdKey, v)
      case None => spark.conf.unset(ThresholdKey)
    }
  }
  private def withSeam[A](counter: java.util.concurrent.atomic.AtomicInteger)(
      body: => A): A = {
    DeltaRead.onDatasetMaterialize = Some(_ => counter.incrementAndGet())
    try body finally DeltaRead.onDatasetMaterialize = None
  }

  /** A synthetic log: one classic checkpoint carrying `n` adds (with
    * stats and sizes) + an advertising `_last_checkpoint` + a JSON
    * tail (one remove, one replacing re-add, one fresh add). Metadata
    * only — no data files, which is all resolution needs. */
  private def writeBigLog(t: String, n: Int): Unit = {
    val ld = Paths.get(t, "_delta_log")
    Files.createDirectories(ld)
    val schemaJson = new org.apache.spark.sql.types.StructType()
      .add("id", "long").add("v", "string").json
    val addType = "STRUCT<path:STRING,partitionValues:MAP<STRING,STRING>," +
      "size:BIGINT,modificationTime:BIGINT,stats:STRING>"
    val metaType = "STRUCT<id:STRING,schemaString:STRING,partitionColumns:ARRAY<STRING>>"
    val adds = spark.range(n).selectExpr(
      s"""CAST(named_struct(
         |  'path', concat('part-', lpad(cast(id AS STRING), 7, '0'), '.parquet'),
         |  'partitionValues', cast(map() AS MAP<STRING,STRING>),
         |  'size', id + 10L,
         |  'modificationTime', 1000L,
         |  'stats', concat('{"numRecords":1,"minValues":{"id":',
         |    CAST(id * 10 AS STRING),
         |    '},"maxValues":{"id":', CAST(id * 10 + 9 AS STRING), '}}')
         |) AS $addType) AS add""".stripMargin,
      s"CAST(NULL AS $metaType) AS metaData")
    val meta = spark.range(1).selectExpr(
      s"CAST(NULL AS $addType) AS add",
      s"CAST(named_struct('id', 'fixture', 'schemaString', '$schemaJson', " +
        s"'partitionColumns', CAST(array() AS ARRAY<STRING>)) AS $metaType) AS metaData")
    val staged = Files.createTempDirectory("cpstage").toString
    adds.unionByName(meta).coalesce(1).write.mode("overwrite").parquet(staged)
    val part = new java.io.File(staged).listFiles()
      .find(_.getName.endsWith(".parquet")).get
    Files.move(part.toPath, ld.resolve(f"${0L}%020d.checkpoint.parquet"))
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(staged))
    Files.write(ld.resolve("_last_checkpoint"), Seq(
      s"""{"version":0,"size":${n + 1},"numOfAddFiles":$n}""").asJava)
    // the tail: v1 removes one checkpointed file, REPLACES another
    // (remove + re-add with a new size — the window's add-wins case),
    // and adds a fresh one
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    def add(p: String, size: Long, lo: Long, hi: Long): String = {
      val root = mapper.createObjectNode(); val a = root.putObject("add")
      a.put("path", p).put("size", size).put("modificationTime", 2000L)
        .put("dataChange", true)
        .put("stats", s"""{"numRecords":1,"minValues":{"id":$lo},"maxValues":{"id":$hi}}""")
      a.putObject("partitionValues")
      mapper.writeValueAsString(root)
    }
    def rem(p: String): String = {
      val root = mapper.createObjectNode()
      root.putObject("remove").put("path", p).put("dataChange", true)
      mapper.writeValueAsString(root)
    }
    Files.write(ld.resolve(f"${1L}%020d.json"), Seq(
      rem("part-0000000.parquet"),
      rem("part-0000001.parquet"), add("part-0000001.parquet", 777L, 5L, 6L),
      add("tail-fresh.parquet", 42L, 9000000L, 9000010L)).asJava)
  }

  test("120k-file log: Dataset tier equals the Seq tier row-for-row; resolution never collects") {
    val t = newTable()
    val n = 120000
    try {
      writeBigLog(t, n)
      val fired = new java.util.concurrent.atomic.AtomicInteger(0)
      val (dsEntries, seqEntries) = withSeam(fired) {
        val ds = withThreshold(100000L) {
          val s = DeltaRead.snapshot(spark, t)
          assert(s.index.isInstanceOf[DeltaRead.DatasetIndex],
            "an advertising 120k-add checkpoint must choose the Dataset tier")
          assert(fired.get == 0, "resolution alone must not materialize")
          assert(s.index.count == n.toLong,
            "live = n checkpointed − 1 removed (one replaced in place) + 1 fresh")
          assert(fired.get == 0, "count is an aggregate, not a collect")
          s.files // NOW materialize deliberately — the seam must fire once
        }
        assert(fired.get == 1, "explicit .files must trip the seam exactly once")
        val sq = withThreshold(Long.MaxValue) {
          val s = DeltaRead.snapshot(spark, t)
          assert(s.index.isInstanceOf[DeltaRead.SeqIndex])
          s.files
        }
        (ds, sq)
      }
      assert(dsEntries.size == seqEntries.size,
        s"tiers disagree on live count: ${dsEntries.size} vs ${seqEntries.size}")
      val dsByPath = dsEntries.sortBy(_.path)
      val seqByPath = seqEntries.sortBy(_.path)
      dsByPath.zip(seqByPath).foreach { case (a, b) =>
        assert(a == b, s"entry mismatch:\n  dataset $a\n  seq     $b")
      }
      // the replaced file carries the TAIL's version of the entry
      assert(dsByPath.find(_.path == "part-0000001.parquet")
        .exists(_.size.contains(777L)), "re-add must win over the checkpoint row")
      assert(!dsByPath.exists(_.path == "part-0000000.parquet"), "removed stays removed")
      assert(dsByPath.exists(_.path == "tail-fresh.parquet"))
    } finally cleanup(t)
  }

  test("120k-file log: data skipping runs executor-side and returns only survivors") {
    val t = newTable()
    try {
      writeBigLog(t, 120000)
      val fired = new java.util.concurrent.atomic.AtomicInteger(0)
      withSeam(fired) {
        withThreshold(100000L) {
          // id ∈ [500, 509] lives in exactly one checkpointed file
          // (file k covers [10k, 10k+9] → k=50)
          val surv = DeltaRead.filesAfterSkipping(spark, t, 1L, Seq(
            DeltaRead.StatRange("id", Some(500L), Some(509L))))
          assert(surv.map(_.path) == Seq("part-0000050.parquet"),
            s"skipping must isolate the one overlapping file, got ${surv.map(_.path)}")
          assert(fired.get == 0, "skipping must never materialize the full list")
          // an unbounded predicate set admits everything — that IS a
          // full-scan plan, and the only case seq-materialization is due
          val open = DeltaRead.filesAfterSkipping(spark, t, 1L, Nil)
          assert(open.size == 120000)
        }
      }
    } finally cleanup(t)
  }

  test("real table over a lowered threshold: reads, DV deletes, MERGE, DESCRIBE DETAIL agree") {
    val t = newTable()
    try {
      (0 until 6).foreach(k => DeltaWrite.append(
        Seq((k.toLong, s"r$k")).toDF("id", "s").coalesce(1), t))
      DeltaWrite.checkpoint(spark, t) // _last_checkpoint advertises 6 adds
      withThreshold(5L) {
        val s = DeltaRead.snapshot(spark, t)
        assert(s.index.isInstanceOf[DeltaRead.DatasetIndex],
          "6 advertised adds over a threshold of 5 must tier up")
        // full read through the Dataset tier
        assert(DeltaRead.read(spark, t).as[(Long, String)].collect().sorted.toSeq ==
          (0 until 6).map(k => (k.toLong, s"r$k")))
        // a DV delete rides the tier (descriptor survives the frame)
        DeltaWrite.deleteWhere(spark, t, col("id") === 2L)
        assert(DeltaRead.read(spark, t).agg(sum($"id")).as[Long].head() == 13L)
        // MERGE: touched-file lookup is filterEntries, not a full map
        DeltaWrite.merge(spark, t,
          Seq((3L, "updated"), (100L, "fresh")).toDF("id", "s"), Seq("id"))
        val after = DeltaRead.read(spark, t).as[(Long, String)].collect().toMap
        assert(after(3L) == "updated" && after(100L) == "fresh" && !after.contains(2L))
        // DESCRIBE DETAIL aggregates executor-side — numbers must match
        // the Seq tier's exactly
        val fired = new java.util.concurrent.atomic.AtomicInteger(0)
        val (nDs, bDs) = withSeam(fired) {
          val d = spark.sql(s"DESCRIBE DETAIL '$t'").collect()(0)
          (d.getAs[Long]("num_files"), d.getAs[Long]("size_bytes"))
        }
        assert(fired.get == 0, "DESCRIBE DETAIL must not materialize entries")
        val (nSq, bSq) = withThreshold(Long.MaxValue) {
          val d = spark.sql(s"DESCRIBE DETAIL '$t'").collect()(0)
          (d.getAs[Long]("num_files"), d.getAs[Long]("size_bytes"))
        }
        assert((nDs, bDs) == (nSq, bSq),
          s"tiers disagree on detail: ($nDs,$bDs) vs ($nSq,$bSq)")
        // CDF reconstruction over the tier: the rolled-forward base
        // state fetches only TOUCHED entries — per-micro-batch cost on
        // a streaming tail, so it must not materialize the inventory
        val f2 = new java.util.concurrent.atomic.AtomicInteger(0)
        val byType = withSeam(f2) {
          DeltaRead.changesBetween(spark, t, 5L, DeltaRead.latestVersion(t))
            .groupBy(col(DeltaRead.ChangeTypeCol)).count().collect()
            .map(r => r.getString(0) -> r.getLong(1)).toMap
        }
        assert(f2.get == 0, "CDF base state must fetch only touched entries")
        assert(byType.getOrElse("delete", 0L) >= 2L &&
          byType.getOrElse("insert", 0L) >= 2L,
          s"DV delete + merge rewrite must surface: $byType")
      }
    } finally cleanup(t)
  }

  test("120k-file log: the checkpoint WRITER runs frame-side — classic and v2") {
    val t = newTable()
    val n = 120000
    try {
      writeBigLog(t, n)
      val fired = new java.util.concurrent.atomic.AtomicInteger(0)
      withSeam(fired) {
        withThreshold(100000L) {
          val before = DeltaRead.snapshot(spark, t)
          assert(before.index.isInstanceOf[DeltaRead.DatasetIndex])
          // CLASSIC checkpoint at head (v1): written from the frame
          assert(DeltaWrite.checkpoint(spark, t) == 1L)
          assert(fired.get == 0, "checkpoint writing must not collect the inventory")
          val lc = new String(Files.readAllBytes(
            Paths.get(t, "_delta_log", "_last_checkpoint")), "UTF-8")
          assert(lc.contains("\"version\":1") &&
            lc.contains(s"""\"numOfAddFiles\":$n"""), s"pointer: $lc")
          // resolution from the NEW checkpoint (tail JSONs gone) equals
          // the pre-checkpoint state
          Files.delete(Paths.get(t, "_delta_log", f"${1L}%020d.json"))
          val after = DeltaRead.snapshot(spark, t)
          assert(after.index.isInstanceOf[DeltaRead.DatasetIndex],
            "the advertising pointer keeps the table on the Dataset tier")
          assert(after.index.count == before.index.count)
          val a = after.files.sortBy(_.path)
          assert(fired.get == 1)
          val b = before.files.sortBy(_.path)
          assert(fired.get == 2)
          a.zip(b).foreach { case (x, y) =>
            assert(x == y, s"checkpoint roundtrip mismatch:\n  $x\n  $y") }
          // V2 checkpoint from the same tier: sidecars frame-written
          assert(DeltaWrite.checkpointV2(spark, t, sidecars = 3) == 1L)
          assert(fired.get == 2, "v2 sidecar writing must not collect either")
          val lc2 = new String(Files.readAllBytes(
            Paths.get(t, "_delta_log", "_last_checkpoint")), "UTF-8")
          assert(lc2.contains("\"v2Checkpoint\"") &&
            lc2.contains(s"""\"numOfAddFiles\":$n"""))
          // drop the classic file so resolution must go through the v2
          // manifest + its frame-written sidecars
          Files.delete(Paths.get(t, "_delta_log",
            f"${1L}%020d.checkpoint.parquet"))
          val sc = Files.list(Paths.get(t, "_delta_log", "_sidecars"))
          val nSidecars = try sc.iterator().asScala.size finally sc.close()
          assert(nSidecars == 3, s"expected 3 frame-written sidecars, got $nSidecars")
          val viaV2 = DeltaRead.snapshot(spark, t)
          assert(viaV2.index.isInstanceOf[DeltaRead.DatasetIndex])
          assert(viaV2.index.count == before.index.count)
        }
      }
    } finally cleanup(t)
  }

  test("OPTIMIZE plans O(candidates) on the Dataset tier: no inventory materialization") {
    val t = newTable()
    try {
      import spark.implicits._
      (0 until 6).foreach(k => DeltaWrite.append(
        Seq((k.toLong, s"r$k")).toDF("id", "s").coalesce(1), t))
      DeltaWrite.checkpoint(spark, t)
      withThreshold(5L) {
        assert(DeltaRead.snapshot(spark, t).index.isInstanceOf[DeltaRead.DatasetIndex])
        val fired = new java.util.concurrent.atomic.AtomicInteger(0)
        val n = withSeam(fired) { DeltaWrite.compact(spark, t) }
        assert(fired.get == 0,
          "compaction planning must pre-filter candidates executor-side")
        assert(n == 5, s"six tiny files fold to one (net 5 removed), got $n")
        assert(DeltaRead.snapshot(spark, t).files.size == 1)
        assert(DeltaRead.read(spark, t).count() == 6)
        // a typo'd scope still refuses on the tier (no vacuous success)
        val e = intercept[IllegalArgumentException](
          DeltaWrite.compact(spark, t, partitions = Map("id" -> "1")))
        assert(e.getMessage.contains("not a partition column"))
      }
    } finally cleanup(t)
  }

  test("column mapping composes with the Dataset tier: logical pv keys, rekeyed stats, reads agree") {
    val t = newTable()
    try {
      import spark.implicits._
      val df = (1 to 12).map(i => (i.toLong, s"v$i", (i % 2).toString))
        .toDF("id", "txt", "lang")
      DeltaWrite.createColumnMapped(df.repartition(6), t,
        partitionBy = Seq("lang"))
      DeltaWrite.checkpoint(spark, t) // advertises the add count
      withThreshold(3L) {
        val s = DeltaRead.snapshot(spark, t)
        assert(s.index.isInstanceOf[DeltaRead.DatasetIndex],
          "a mapped table past the threshold must tier up too")
        // entries materialize in LOGICAL key space on both tiers
        val ds = s.files.sortBy(_.path)
        val sq = withThreshold(Long.MaxValue) {
          DeltaRead.snapshot(spark, t).files.sortBy(_.path)
        }
        ds.zip(sq).foreach { case (a, b) =>
          assert(a == b, s"mapped-tier entry mismatch:\n  $a\n  $b") }
        assert(ds.forall(_.partitionValues.keySet == Set("lang")),
          "pv keys must be the LOGICAL names after the frame rekey")
        assert(ds.forall(_.stats.exists(_.contains("\"id\""))),
          "stats keys must rekey to logical names at materialization")
        // reads + stats skipping behave identically through the tier
        assert(DeltaRead.read(spark, t).as[(Long, String, String)]
          .collect().sortBy(_._1).toSeq ==
          (1 to 12).map(i => (i.toLong, s"v$i", (i % 2).toString)))
        val surv = DeltaRead.filesAfterSkipping(spark, t,
          DeltaRead.latestVersion(t), Seq(
            DeltaRead.StatRange("id", Some(1L), Some(2L))))
        assert(surv.nonEmpty && surv.size < ds.size,
          s"logical-column skipping must prune mapped stats: ${surv.size}/${ds.size}")
      }
    } finally cleanup(t)
  }

  test("vacuum over the threshold: anti-join tier reclaims exactly what the Set tier would") {
    val t = newTable()
    try {
      val df = (1 to 24).map(i => (i.toLong, s"x$i", (i % 3).toString))
        .toDF("id", "txt", "p")
      DeltaWrite.append(df, t, partitionBy = Seq("p"))    // v0
      DeltaWrite.checkpoint(spark, t)                      // advertises the head
      DeltaWrite.overwrite(df, t, partitionBy = Seq("p")) // v2 orphans v0's files
      val orphan = Paths.get(t, "orphan-loose.parquet")
      Files.write(orphan, Array[Byte](9, 9, 9))
      Files.setLastModifiedTime(orphan, FileTime.fromMillis(1000L))
      val deadFiles = DeltaRead.snapshotAt(spark, t, 0).files
        .map(f => Paths.get(t, f.path))
      val liveFiles = DeltaRead.snapshot(spark, t).files
        .map(f => Paths.get(t, f.path))
      // both tiers must ENUMERATE identically (dry run)
      val wantSeq = withThreshold(Long.MaxValue) {
        assert(DeltaRead.snapshot(spark, t).index.isInstanceOf[DeltaRead.SeqIndex])
        DeltaWrite.vacuum(spark, t, retentionMs = -60000, dryRun = true)
      }
      val fired = new java.util.concurrent.atomic.AtomicInteger(0)
      withThreshold(3L) {
        assert(DeltaRead.snapshot(spark, t).index.isInstanceOf[DeltaRead.DatasetIndex])
        val wantDs = withSeam(fired) {
          DeltaWrite.vacuum(spark, t, retentionMs = -60000, dryRun = true)
        }
        assert(fired.get == 0, "Dataset-tier vacuum must not materialize entries")
        assert(wantDs == wantSeq,
          s"tier enumeration diverged: dataset $wantDs vs set $wantSeq")
        assert(wantDs == deadFiles.size + 1, // + the loose orphan
          s"expected ${deadFiles.size + 1} candidates, got $wantDs")
        assert(deadFiles.forall(Files.exists(_)), "dry run must not delete")
        // destructive run on the Dataset tier: byte-identical outcome
        val got = withSeam(fired) {
          DeltaWrite.vacuum(spark, t, retentionMs = -60000)
        }
        assert(got == wantSeq)
        deadFiles.foreach(p => assert(!Files.exists(p), s"dead file survived: $p"))
        assert(!Files.exists(orphan))
        liveFiles.foreach(p => assert(Files.exists(p), s"live file reclaimed: $p"))
        assert(DeltaRead.read(spark, t).count() == 24)
      }
    } finally cleanup(t)
  }

  test("tiered row-level DML: delete/update/mergeAdvanced/replaceWhere resolve touched entries index-routed") {
    val t = newTable()
    try {
      (0 until 8).foreach(k => DeltaWrite.append(
        Seq((k.toLong, s"r$k", k % 2)).toDF("id", "s", "grp").coalesce(1), t))
      DeltaWrite.checkpoint(spark, t) // advertises 8 adds
      withThreshold(5L) {
        assert(DeltaRead.snapshot(spark, t).index
          .isInstanceOf[DeltaRead.DatasetIndex])
        // Each op's ONLY permitted materialization is its full-table
        // lineage scan (a parquet scan needs the path list — inherent);
        // the TOUCHED-ENTRY resolution must go through filterEntries.
        // Pre-fix, every op below also built a full snap.files →
        // byAbs driver map: one extra seam fire each, O(table-files)
        // driver memory on a 10M-file table.
        val fired = new java.util.concurrent.atomic.AtomicInteger(0)
        withSeam(fired) {
          DeltaWrite.deleteWhere(spark, t, col("id") === 6L)
        }
        assert(fired.get == 1,
          s"DELETE must materialize only its lineage scan, fired ${fired.get}")
        fired.set(0)
        withSeam(fired) {
          DeltaWrite.updateWhere(spark, t, col("id") === 3L,
            Seq("s" -> lit("upd")))
        }
        assert(fired.get == 1,
          s"UPDATE must materialize only its lineage scan, fired ${fired.get}")
        assert(DeltaRead.read(spark, t).where($"id" === 3L)
          .select($"s").as[String].head() == "upd")
        fired.set(0)
        withSeam(fired) {
          DeltaWrite.mergeAdvanced(spark, t,
            Seq((1L, "m1", 1), (50L, "m50", 0)).toDF("id", "s", "grp"), Seq("id"),
            matched = Seq(DeltaWrite.MergeUpdateWhen(None,
              Seq("s" -> DeltaWrite.mergeSrc("s")))),
            notMatched = Seq(DeltaWrite.MergeInsertWhen(None,
              Seq("id" -> col("id"), "s" -> col("s"), "grp" -> col("grp")))))
        }
        assert(fired.get <= 2,
          s"MERGE must not materialize beyond its scans, fired ${fired.get}")
        assert(DeltaRead.read(spark, t).where($"id" === 1L)
          .select($"s").as[String].head() == "m1")
        fired.set(0)
        withSeam(fired) {
          DeltaWrite.replaceWhere(spark, t,
            Seq((100L, "rw", 1)).toDF("id", "s", "grp"), col("grp") === 1)
        }
        assert(fired.get == 1,
          s"replaceWhere must materialize only its lineage scan, fired ${fired.get}")
        // end state: all four rewrites composed correctly on the tier.
        // grp=1 rows (1,3,5,7 — including the updated and merged ones)
        // were replaced wholesale by (100,"rw",1); grp=0 keeps the
        // delete (id 6 gone) and the merge insert (id 50).
        val rows = DeltaRead.read(spark, t).as[(Long, String, Int)]
          .collect().sortBy(_._1).toSeq
        assert(rows.filter(_._3 == 1) == Seq((100L, "rw", 1)),
          s"replaceWhere must have replaced every grp=1 row: $rows")
        assert(rows.filter(_._3 == 0).map(r => (r._1, r._2)) ==
          Seq((0L, "r0"), (2L, "r2"), (4L, "r4"), (50L, "m50")),
          s"grp=0 must keep the DELETE and the MERGE insert: $rows")
      }
    } finally cleanup(t)
  }

  test("tiered append with autoCompact: the follow-on plans from touched-partition survivors") {
    val t = newTable()
    try {
      (0 until 8).foreach(k => DeltaWrite.append(
        Seq((k.toLong, s"r$k")).toDF("id", "s").coalesce(1), t))
      DeltaWrite.checkpoint(spark, t)
      DeltaWrite.setProperties(spark, t, Map(
        "delta.autoOptimize.autoCompact" -> "true",
        "graft.autoCompact.minNumFiles" -> "3"))
      withThreshold(5L) {
        assert(DeltaRead.snapshot(spark, t).index
          .isInstanceOf[DeltaRead.DatasetIndex])
        // pre-fix the follow-on groupBy'd the FULL head inventory on
        // the driver after every append; now it filterEntries the
        // touched partitions' small files only
        val fired = new java.util.concurrent.atomic.AtomicInteger(0)
        withSeam(fired) {
          DeltaWrite.append(Seq((100L, "x")).toDF("id", "s").coalesce(1), t)
        }
        assert(fired.get == 0,
          s"autoCompact planning must not materialize the inventory, fired ${fired.get}")
        // the pass really ran: the small files compacted into one
        val files = DeltaRead.snapshot(spark, t).files
        assert(files.size < 9, s"autoCompact must have compacted: ${files.size}")
        assert(DeltaRead.read(spark, t).count() == 9)
      }
    } finally cleanup(t)
  }

  test("scheme-ful (clone-style) checkpoint paths decode like the driver: tail removes reconcile") {
    val t = newTable()
    try {
      // a checkpoint the way a foreign writer / SHALLOW CLONE leaves
      // it: two ABSOLUTE scheme-ful adds pointing into a source table,
      // one with a percent-encoded segment, plus two normal relative
      // adds — then a tail that REMOVES one clone entry via its
      // driver-decoded path. Pre-fix, the Dataset tier kept the scheme
      // on the checkpoint row, the remove missed, and the dead clone
      // path stayed live (and unresolvable).
      val ld = Paths.get(t, "_delta_log")
      Files.createDirectories(ld)
      val schemaJson = new org.apache.spark.sql.types.StructType()
        .add("id", "long").json
      val addType = "STRUCT<path:STRING,partitionValues:MAP<STRING,STRING>," +
        "size:BIGINT,modificationTime:BIGINT,stats:STRING>"
      val metaType = "STRUCT<id:STRING,schemaString:STRING,partitionColumns:ARRAY<STRING>>"
      def addRow(p: String, size: Long) =
        s"""named_struct('path', '$p',
           |  'partitionValues', cast(map() AS MAP<STRING,STRING>),
           |  'size', ${size}L, 'modificationTime', 1000L,
           |  'stats', CAST(NULL AS STRING))""".stripMargin
      val paths = Seq(
        "rel-a.parquet" -> 1L,
        "rel-b.parquet" -> 2L,
        "s3://src-bucket/tbl/clone-dead.parquet" -> 3L,
        "file:///ext/tbl/clone%20live.parquet" -> 4L)
      val rows = paths.map { case (p, sz) =>
        spark.range(1).selectExpr(
          s"CAST(${addRow(p, sz)} AS $addType) AS add",
          s"CAST(NULL AS $metaType) AS metaData")
      }
      val meta = spark.range(1).selectExpr(
        s"CAST(NULL AS $addType) AS add",
        s"CAST(named_struct('id', 'fixture', 'schemaString', '$schemaJson', " +
          s"'partitionColumns', CAST(array() AS ARRAY<STRING>)) AS $metaType) AS metaData")
      val staged = Files.createTempDirectory("cpstage2").toString
      rows.reduce(_.unionByName(_)).unionByName(meta)
        .coalesce(1).write.mode("overwrite").parquet(staged)
      val part = new java.io.File(staged).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      Files.move(part.toPath, ld.resolve(f"${0L}%020d.checkpoint.parquet"))
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(staged))
      Files.write(ld.resolve("_last_checkpoint"), Seq(
        """{"version":0,"size":5,"numOfAddFiles":4}""").asJava)
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      val root = mapper.createObjectNode()
      root.putObject("remove")
        .put("path", "s3://src-bucket/tbl/clone-dead.parquet")
        .put("dataChange", true)
      Files.write(ld.resolve(f"${1L}%020d.json"),
        Seq(mapper.writeValueAsString(root)).asJava)

      val seqPaths = withThreshold(Long.MaxValue) {
        val s = DeltaRead.snapshot(spark, t)
        assert(s.index.isInstanceOf[DeltaRead.SeqIndex])
        s.files.map(_.path).sorted
      }
      val dsPaths = withThreshold(1L) {
        val s = DeltaRead.snapshot(spark, t)
        assert(s.index.isInstanceOf[DeltaRead.DatasetIndex])
        s.files.map(_.path).sorted
      }
      assert(dsPaths == seqPaths,
        s"tiers must decode identically:\n  dataset $dsPaths\n  seq     $seqPaths")
      assert(dsPaths == Seq("/ext/tbl/clone live.parquet", "rel-a.parquet", "rel-b.parquet"),
        s"scheme stripped, percent decoded, dead clone reconciled away: $dsPaths")
    } finally cleanup(t)
  }
}
