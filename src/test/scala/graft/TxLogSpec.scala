package graft

import graft.io.TxLog
import org.apache.spark.sql.functions._

/** The transactional commit protocol: snapshot isolation, optimistic
  * concurrency, idempotent merge, time travel, compaction and vacuum
  * through the manifest path — the Delta-tier contract the plain
  * parquet sinks document as out of scope. */
class TxLogSpec extends SparkTestBase {
  import spark.implicits._

  private def tmpTable(): String =
    java.nio.file.Files.createTempDirectory("txlog").toString

  private def cleanup(t: String): Unit =
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(t))

  test("append + idempotent re-run: same batch twice is a no-op at the manifest level") {
    val t = tmpTable()
    try {
      val batch = (1 to 100).map(i => (i.toLong, s"v$i")).toDF("id", "v")
      val s1 = TxLog.appendNew(batch, t, Seq("id"))
      assert(s1.version == 1L)
      val s2 = TxLog.appendNew(batch, t, Seq("id"))
      assert(s2.version == 1L, "re-run must not mint a new version")
      assert(TxLog.read(spark, t).count() == 100)
    } finally cleanup(t)
  }

  test("merge semantics: only fresh keys land; overlapping batch appends the delta") {
    val t = tmpTable()
    try {
      TxLog.appendNew((1 to 50).map(i => (i.toLong, "a")).toDF("id", "v"), t, Seq("id"))
      TxLog.appendNew((26 to 75).map(i => (i.toLong, "b")).toDF("id", "v"), t, Seq("id"))
      val got = TxLog.read(spark, t)
      assert(got.count() == 75)
      // first-writer-wins on the overlap, like ON CONFLICT DO NOTHING
      assert(got.filter($"id" === 30L).select($"v").collect()(0).getString(0) == "a")
    } finally cleanup(t)
  }

  test("concurrent writers: every key lands exactly once across racing commits") {
    val t = tmpTable()
    try {
      // disjoint key ranges racing: each thread must retry through the
      // version conflicts and neither may clobber the other's files
      val ranges = Seq((1, 200), (201, 400), (401, 600), (601, 800))
      val threads = ranges.map { case (lo, hi) =>
        new Thread(() => {
          TxLog.appendNew(
            (lo to hi).map(i => (i.toLong, s"w$lo")).toDF("id", "v"), t, Seq("id"))
        })
      }
      threads.foreach(_.start()); threads.foreach(_.join())
      val got = TxLog.read(spark, t)
      assert(got.count() == 800)
      assert(got.select($"id").distinct().count() == 800)
      assert(TxLog.currentSnapshot(t).version == 4L)
    } finally cleanup(t)
  }

  test("concurrent SAME-key writers resolve to exactly-once") {
    val t = tmpTable()
    try {
      val threads = (1 to 4).map { w =>
        new Thread(() => {
          TxLog.appendNew((1 to 100).map(i => (i.toLong, s"w$w")).toDF("id", "v"),
            t, Seq("id"))
        })
      }
      threads.foreach(_.start()); threads.foreach(_.join())
      val got = TxLog.read(spark, t)
      assert(got.count() == 100, "racing identical batches must not duplicate keys")
      // all rows came from ONE winner per key is not required (dedup is
      // per key, not per batch) — but each key exactly once is
      assert(got.select($"id").distinct().count() == 100)
    } finally cleanup(t)
  }

  test("time travel: old versions stay readable; compaction swaps files, not rows") {
    val t = tmpTable()
    try {
      TxLog.appendNew((1 to 100).map(i => (i.toLong, 1)).toDF("id", "b"), t, Seq("id"))
      TxLog.appendNew((101 to 300).map(i => (i.toLong, 2)).toDF("id", "b"), t, Seq("id"))
      assert(TxLog.readVersion(spark, t, 1).count() == 100)
      assert(TxLog.readVersion(spark, t, 2).count() == 300)
      val before = TxLog.read(spark, t)
        .agg(sum($"id"), count(lit(1))).collect()(0)
      val nFiles = TxLog.compact(spark, t, targetBytes = Long.MaxValue)
      assert(nFiles == 1)
      val after = TxLog.read(spark, t).agg(sum($"id"), count(lit(1))).collect()(0)
      assert(before == after, "compaction must preserve content exactly")
      // pre-compaction version still readable (its files not deleted)
      assert(TxLog.readVersion(spark, t, 2).count() == 300)
      // vacuum to head: old files + manifests go, head unaffected
      // (retentionMs = 0: this test's writers are quiesced)
      val dropped = TxLog.vacuum(t, keepVersions = 1, retentionMs = 0L)
      assert(dropped > 0)
      assert(TxLog.read(spark, t).count() == 300)
      intercept[Exception] { TxLog.readVersion(spark, t, 1) }
    } finally cleanup(t)
  }

  test("schema drift is rejected at commit time with names, not read time") {
    val t = tmpTable()
    try {
      TxLog.appendNew((1 to 10).map(i => (i.toLong, s"v$i")).toDF("id", "v"), t, Seq("id"))
      // same column names, different type: must refuse
      val drifted = (11 to 20).map(i => (i.toLong, i.toDouble)).toDF("id", "v")
      val e = intercept[IllegalArgumentException] {
        TxLog.appendNew(drifted, t, Seq("id"))
      }
      assert(e.getMessage.contains("schema drift"))
      // column order is NOT drift; nullable flips are NOT drift
      TxLog.appendNew((11 to 20).map(i => (s"v$i", i.toLong)).toDF("v", "id")
        .select($"id", $"v"), t, Seq("id"))
      assert(TxLog.read(spark, t).count() == 20)
      // compaction carries the schema forward
      TxLog.compact(spark, t, targetBytes = Long.MaxValue)
      assert(TxLog.currentSnapshot(t).schemaJson.exists(_.nonEmpty))
    } finally cleanup(t)
  }

  test("reader never sees staged-but-uncommitted files (snapshot isolation)") {
    val t = tmpTable()
    try {
      TxLog.appendNew((1 to 10).map(i => (i.toLong, "a")).toDF("id", "v"), t, Seq("id"))
      // plant an orphan data file in the table dir (a crashed writer)
      (11 to 999).map(i => (i.toLong, "orphan")).toDF("id", "v")
        .write.mode("overwrite").parquet(s"$t/_staging-crashed")
      val orphan = new java.io.File(s"$t/_staging-crashed").listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(orphan.toPath,
        java.nio.file.Paths.get(t, "part-orphan.parquet"))
      assert(TxLog.read(spark, t).count() == 10, "orphan file must be invisible")
      // vacuum with the default retention window must NOT reap it —
      // an unreferenced-but-recent file is indistinguishable from a
      // commit in flight (stage() publishes data files before the
      // manifest), and deleting it would break the winner's manifest
      TxLog.vacuum(t, keepVersions = 1)
      assert(new java.io.File(s"$t/part-orphan.parquet").exists(),
        "files inside the retention window must survive vacuum")
      // quiesced-writer vacuum (retention 0) reaps it
      TxLog.vacuum(t, keepVersions = 1, retentionMs = 0L)
      assert(!new java.io.File(s"$t/part-orphan.parquet").exists())
    } finally cleanup(t)
  }

  test("vacuum reclaims crashed-writer staging directories past retention") {
    val t = tmpTable()
    try {
      TxLog.appendNew((1 to 10).map(i => (i.toLong, "a")).toDF("id", "v"), t, Seq("id"))
      // a writer that died mid-stage leaves its _staging-* dir behind
      (1 to 50).map(i => (i.toLong, "dead")).toDF("id", "v")
        .write.mode("overwrite").parquet(s"$t/_staging-deadbeef")
      // inside the retention window: the dir survives (could be live)
      TxLog.vacuum(t, keepVersions = 1)
      assert(new java.io.File(s"$t/_staging-deadbeef").isDirectory)
      // past the window (retention 0): reclaimed, data unharmed
      TxLog.vacuum(t, keepVersions = 1, retentionMs = 0L)
      assert(!new java.io.File(s"$t/_staging-deadbeef").exists())
      assert(TxLog.read(spark, t).count() == 10)
    } finally cleanup(t)
  }

  test("empty batches never mint versions — on an empty or non-empty table") {
    val t = tmpTable()
    try {
      val empty = Seq.empty[(Long, String)].toDF("id", "v")
      // empty first micro-batch on an empty table: no zero-file v1
      // (which would make read() throw despite version > 0)
      val s0 = TxLog.appendNew(empty, t, Seq("id"))
      assert(s0.version == 0L, "empty batch on empty table must not commit")
      // real data, then another empty batch: version must not move
      TxLog.appendNew((1 to 10).map(i => (i.toLong, "a")).toDF("id", "v"), t, Seq("id"))
      val s2 = TxLog.appendNew(empty, t, Seq("id"))
      assert(s2.version == 1L, "empty batch must not mint a version")
      // fully-overlapping batch (all keys already present) — same rule
      val s3 = TxLog.appendNew((1 to 10).map(i => (i.toLong, "b")).toDF("id", "v"),
        t, Seq("id"))
      assert(s3.version == 1L)
      assert(TxLog.read(spark, t).count() == 10)
    } finally cleanup(t)
  }

  test("scale guard: a manifest past the threshold warns loudly with the Delta exit") {
    val t = tmpTable()
    val prior = TxLog.scaleWarnFiles
    val fired = new java.util.concurrent.atomic.AtomicReference[(String, Int)]()
    try {
      TxLog.scaleWarnFiles = 2
      TxLog.onScaleWarning = Some((tbl, n) => fired.set((tbl, n)))
      // below threshold: silent (the staged anti-join lands one file)
      TxLog.appendNew((1 to 20).map(i => (i.toLong, "a")).toDF("id", "v"),
        t, Seq("id"))
      assert(fired.get == null, "below-threshold commits must stay silent")
      // a commit whose manifest lists >= threshold LIVE files: the seam
      // fires with the live count — working pipeline, loud operator
      // signal, never a failure
      val snap = TxLog.appendNew(
        (21 to 60).map(i => (i.toLong, "b")).toDF("id", "v"), t, Seq("id"))
      assert(snap.files.size >= 2, s"fixture needs >=2 live files: ${snap.files.size}")
      val got = fired.get
      assert(got != null && got._1 == t && got._2 == snap.files.size,
        s"threshold crossing must warn with the live count, got $got")
      assert(TxLog.read(spark, t).count() == 60, "the commit itself must succeed")
    } finally {
      TxLog.scaleWarnFiles = prior
      TxLog.onScaleWarning = None
      cleanup(t)
    }
  }
}
