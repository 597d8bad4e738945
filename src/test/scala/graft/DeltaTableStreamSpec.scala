package graft

import java.nio.file.Files

import graft.io.{DeltaRead, DeltaWrite}
import org.apache.spark.sql.functions._

/** `readStream.format("graft-delta")` — the plain-table streaming
  * source ([[graft.streaming.DeltaTableSource]]): stream == batch over
  * an append+OPTIMIZE history (maintenance invisible), file-granular
  * rate limiting, checkpoint restart without replays, and loud refusal
  * (or opt-in skipping) of data-removing commits. */
class DeltaTableStreamSpec extends SparkTestBase {
  import spark.implicits._

  private def newDir(tag: String): String =
    Files.createTempDirectory(tag).toString
  private def cleanup(dirs: String*): Unit = dirs.foreach(d =>
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(d)))

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[(Long, String)] =
    df.select($"id", $"txt").as[(Long, String)].collect().toSeq.sorted

  test("stream == batch over an append + OPTIMIZE history") {
    val src = newDir("gdstream")
    try {
      DeltaWrite.append((0 until 20).map(i => (i.toLong, s"a$i")).toDF("id", "txt")
        .repartition(2), src)                                         // v0
      DeltaWrite.append((20 until 30).map(i => (i.toLong, s"b$i")).toDF("id", "txt"), src) // v1
      DeltaWrite.compact(spark, src, targetBytes = Long.MaxValue)     // v2: dataChange=false
      DeltaWrite.append((30 until 35).map(i => (i.toLong, s"c$i")).toDF("id", "txt"), src) // v3
      val q = spark.readStream.format("graft-delta")
        .option("startingVersion", "0").load(src)
        .writeStream.format("memory").queryName("gd_all").start()
      q.processAllAvailable(); q.stop()
      val streamed = rows(spark.table("gd_all"))
      assert(streamed == rows(DeltaRead.read(spark, src)),
        "startingVersion=0 stream must equal the head table — OPTIMIZE's " +
          "dataChange=false rewrite must be invisible (no duplicates)")
      assert(streamed.size == 35)
    } finally cleanup(src)
  }

  test("default start surfaces the initial snapshot, then tails new commits") {
    val src = newDir("gdstream_snap")
    try {
      DeltaWrite.append((0 until 10).map(i => (i.toLong, s"a$i")).toDF("id", "txt"), src)
      DeltaWrite.deleteWhere(spark, src, $"id" % 3 === 0) // pre-stream DV delete
      val q = spark.readStream.format("graft-delta").load(src)
        .writeStream.format("memory").queryName("gd_snap").start()
      q.processAllAvailable()
      // snapshot honors the DV mask at the base version
      assert(rows(spark.table("gd_snap")) ==
        rows(DeltaRead.read(spark, src)))
      // appends made while running are tailed per-commit
      DeltaWrite.append(Seq((100L, "late")).toDF("id", "txt"), src)
      q.processAllAvailable(); q.stop()
      assert(rows(spark.table("gd_snap")).exists(_._1 == 100L))
      assert(rows(spark.table("gd_snap")) == rows(DeltaRead.read(spark, src)))
    } finally cleanup(src)
  }

  test("maxFilesPerTrigger paces the initial snapshot file-by-file") {
    val src = newDir("gdstream_rate")
    try {
      DeltaWrite.append((0 until 40).map(i => (i.toLong, s"a$i")).toDF("id", "txt")
        .repartition(8), src) // 8 files
      val q = spark.readStream.format("graft-delta")
        .option("maxFilesPerTrigger", "2").load(src)
        .writeStream.format("memory").queryName("gd_rate").start()
      q.processAllAvailable(); q.stop()
      assert(rows(spark.table("gd_rate")).size == 40)
      val nonEmpty = q.recentProgress.count(_.numInputRows > 0)
      assert(nonEmpty >= 4,
        s"8 files at 2 per trigger must take >= 4 batches, got $nonEmpty")
    } finally cleanup(src)
  }

  test("maxBytesPerTrigger paces by add.size; an oversized file flows alone") {
    val src = newDir("gdstream_bytes")
    try {
      DeltaWrite.append((0 until 40).map(i => (i.toLong, s"a$i")).toDF("id", "txt")
        .repartition(8), src) // 8 ~equal files
      val sizes = DeltaRead.snapshot(spark, src).files.map(_.size.getOrElse(0L))
      assert(sizes.forall(_ > 0), "writer must record add.size on every add")
      // budget fits ONE file but not two → exactly one file per batch,
      // and the budget is never exceeded except by a solo file
      val oneFile = sizes.max + (sizes.min / 2)
      val q = spark.readStream.format("graft-delta")
        .option("startingVersion", "0")
        .option("maxBytesPerTrigger", oneFile.toString).load(src)
        .writeStream.format("memory").queryName("gd_bytes").start()
      q.processAllAvailable(); q.stop()
      assert(rows(spark.table("gd_bytes")).size == 40)
      val nonEmpty = q.recentProgress.filter(_.numInputRows > 0)
      assert(nonEmpty.length == 8,
        s"8 files at a one-file byte budget must be exactly 8 batches " +
          s"(a smaller count means a batch exceeded the budget), got " +
          s"${nonEmpty.length}")
      // a budget SMALLER than any file must not starve: each file is
      // oversized and goes through alone
      val q2 = spark.readStream.format("graft-delta")
        .option("startingVersion", "0")
        .option("maxBytesPerTrigger", "1").load(src)
        .writeStream.format("memory").queryName("gd_bytes1").start()
      q2.processAllAvailable(); q2.stop()
      assert(rows(spark.table("gd_bytes1")).size == 40,
        "an oversized file must be admitted alone, never starve the stream")
      assert(q2.recentProgress.count(_.numInputRows > 0) == 8,
        "byte floor is ONE file per batch")
    } finally cleanup(src)
  }

  test("Trigger.AvailableNow drains to the start-head in paced batches, then stops") {
    val src = newDir("gdstream_avnow")
    val ckpt = newDir("gdstream_avnow_ckpt")
    val out = newDir("gdstream_avnow_out")
    try {
      DeltaWrite.append((0 until 40).map(i => (i.toLong, s"a$i")).toDF("id", "txt")
        .repartition(8), src)
      def drain(): org.apache.spark.sql.streaming.StreamingQuery = {
        val q = spark.readStream.format("graft-delta")
          .option("startingVersion", "0")
          .option("maxFilesPerTrigger", "2").load(src)
          .writeStream.format("parquet").option("path", out)
          .option("checkpointLocation", ckpt)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        // AvailableNow must SELF-terminate once the captured head is
        // drained — a hang here means the bound was never honored
        assert(q.awaitTermination(120000), "AvailableNow query did not stop")
        q
      }
      val q1 = drain()
      assert(rows(spark.read.parquet(out)).size == 40,
        "the drain must reach the start-head, not stop at the first " +
          "rate-limited chunk (the generic wrapper's under-drain)")
      assert(q1.recentProgress.count(_.numInputRows > 0) >= 4,
        "the drain must still honor maxFilesPerTrigger (8 files / 2)")
      // a second run picks up exactly what landed since — and stops
      DeltaWrite.append(Seq((99L, "late")).toDF("id", "txt"), src)
      drain()
      val resumed = rows(spark.read.parquet(out))
      assert(resumed.size == 41 && resumed.exists(_._1 == 99L),
        "restarted AvailableNow must drain exactly the NEW commit")
    } finally cleanup(src, ckpt, out)
  }

  test("checkpoint restart resumes without replaying surfaced files") {
    val src = newDir("gdstream_resume")
    val ckpt = newDir("gdstream_ckpt")
    val out = newDir("gdstream_out")
    try {
      DeltaWrite.append((0 until 10).map(i => (i.toLong, s"a$i")).toDF("id", "txt"), src)
      // pre-fix revisions stranded a CWD-relative 'file:' dir; clear
      // any stale debris so the no-debris assertion below is about
      // THIS run, not history
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File("file:"))
      def run(): Unit = {
        val q = spark.readStream.format("graft-delta")
          .option("startingVersion", "0").load(src)
          .writeStream.format("parquet").option("path", out)
          .option("checkpointLocation", ckpt).start()
        q.processAllAvailable(); q.stop()
      }
      run()
      assert(spark.read.parquet(out).count() == 10)
      DeltaWrite.append((10 until 15).map(i => (i.toLong, s"b$i")).toDF("id", "txt"), src)
      DeltaWrite.compact(spark, src, targetBytes = Long.MaxValue) // invisible
      DeltaWrite.append(Seq((99L, "last")).toDF("id", "txt"), src)
      run()
      val resumed = rows(spark.read.parquet(out))
      assert(resumed == rows(DeltaRead.read(spark, src)),
        "restart must append exactly the new commits: a duplicate means " +
          "a replay, a gap means a skipped commit")
      // the base-version marker must live INSIDE the checkpoint (Spark
      // hands metadataPath as a URI; resolving it with java.nio Paths
      // would strand it in a CWD-relative 'file:' directory and break
      // resume from any other working directory)
      assert(Files.exists(java.nio.file.Paths.get(ckpt, "sources", "0",
        "graft-table-source")), "base marker missing from the checkpoint")
      assert(!Files.exists(java.nio.file.Paths.get("file:")),
        "metadataPath URI was resolved as a relative filesystem path")
    } finally cleanup(src, ckpt, out)
  }

  test("schema drift since the checkpoint refuses with a re-bootstrap pointer") {
    val src = newDir("gdstream_drift")
    val ckpt = newDir("gdstream_dckpt")
    val out = newDir("gdstream_dout")
    try {
      DeltaWrite.append((0 until 5).map(i => (i.toLong, s"a$i")).toDF("id", "txt"), src)
      def run(): Unit = {
        val q = spark.readStream.format("graft-delta")
          .option("startingVersion", "0").load(src)
          .writeStream.format("parquet").option("path", out)
          .option("checkpointLocation", ckpt).start()
        q.processAllAvailable(); q.stop()
      }
      run()
      // the table evolves AFTER the checkpoint bootstrapped: a restarted
      // query's logical plan resolves the NEW schema while every
      // checkpointed offset indexes files of the old one — the source
      // must refuse with the re-bootstrap pointer, not die on an
      // internal plan assertion (or null-fill its way to wrong answers).
      // With an explicit startingVersion the MID-STREAM guard catches
      // the drifted commit (the walk reaches v1's metaData)...
      DeltaWrite.overwrite((0 until 5).map(i => (i.toLong, s"b$i", i * 2))
        .toDF("id", "txt", "extra"), src)
      val e = intercept[Exception] { run() }
      def chain(t: Throwable): String =
        Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
          .map(x => Option(x.getMessage).getOrElse("")).mkString("\n")
      assert(chain(e).contains("changed the schema") &&
        chain(e).toLowerCase.contains("re-bootstrap"),
        s"expected an actionable schema-drift refusal, got: ${chain(e)}")
      // ...and a DEFAULT-start checkpoint (head snapshot bootstrap)
      // refuses at RESTART: the marker's persisted schema disagrees
      // with what the restarted plan resolved at the new head
      val ckpt2 = newDir("gdstream_dckpt2")
      val out2 = newDir("gdstream_dout2")
      try {
        val src2 = newDir("gdstream_drift2")
        try {
          DeltaWrite.append((0 until 5).map(i => (i.toLong, s"a$i")).toDF("id", "txt"), src2)
          def run2(): Unit = {
            val q = spark.readStream.format("graft-delta").load(src2)
              .writeStream.format("parquet").option("path", out2)
              .option("checkpointLocation", ckpt2).start()
            q.processAllAvailable(); q.stop()
          }
          run2()
          DeltaWrite.overwrite((0 until 5).map(i => (i.toLong, s"c$i", i * 3))
            .toDF("id", "txt", "extra"), src2)
          val e2 = intercept[Exception] { run2() }
          assert(chain(e2).contains("schema changed since this checkpoint") &&
            chain(e2).toLowerCase.contains("re-bootstrap"),
            s"expected a restart-time schema-drift refusal, got: ${chain(e2)}")
        } finally cleanup(src2)
      } finally cleanup(ckpt2, out2)
    } finally cleanup(src, ckpt, out)
  }

  test("same-schema metaData commits pass the drift guard — nested types included") {
    val src = newDir("gdstream_props")
    try {
      // a STRUCT column: the committed schemaString records tight inner
      // nullability while the scan schema relaxes it at every level —
      // the guard must normalize nested nullability or a same-schema
      // properties commit reads as phantom drift
      DeltaWrite.append(Seq((1L, ("a", 1))).toDF("id", "s"), src)
      val q = spark.readStream.format("graft-delta")
        .option("startingVersion", "0").load(src)
        .writeStream.format("memory").queryName("gd_props").start()
      q.processAllAvailable()
      DeltaWrite.setProperties(spark, src, Map("graft.test" -> "1")) // metaData, same schema
      DeltaWrite.append(Seq((2L, ("b", 2))).toDF("id", "s"), src)
      q.processAllAvailable(); q.stop()
      assert(spark.table("gd_props").count() == 2,
        "a properties commit re-declaring the same columns must stream through")
    } finally cleanup(src)
  }

  test("data-removing commits refuse loudly; skipChangeCommits opts into skipping") {
    val src = newDir("gdstream_chg")
    try {
      DeltaWrite.append((0 until 10).map(i => (i.toLong, s"a$i")).toDF("id", "txt"), src) // v0
      DeltaWrite.deleteWhere(spark, src, $"id" === 1L)                                    // v1
      DeltaWrite.append(Seq((50L, "post")).toDF("id", "txt"), src)                        // v2
      val q1 = spark.readStream.format("graft-delta")
        .option("startingVersion", "0").load(src)
        .writeStream.format("memory").queryName("gd_refuse").start()
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q1.processAllAvailable()
      }
      q1.stop()
      assert(e.getMessage.contains("removes data") ||
        Option(e.getCause).exists(_.getMessage.contains("removes data")))
      val q2 = spark.readStream.format("graft-delta")
        .option("startingVersion", "0").option("skipChangeCommits", "true").load(src)
        .writeStream.format("memory").queryName("gd_skip").start()
      q2.processAllAvailable(); q2.stop()
      // v1's delete (and its DV re-add) skipped entirely: the stream is
      // v0's rows + v2's insert; the deleted row is still present
      val got = rows(spark.table("gd_skip"))
      assert(got.size == 11 && got.exists(_._1 == 1L) && got.exists(_._1 == 50L))
    } finally cleanup(src)
  }

  test("tiered table: stream bootstrap enumerates the base snapshot from the frame") {
    val src = newDir("gdstream_tier")
    val thresholdKey = DeltaRead.DatasetThresholdKey
    try {
      (0 until 8).foreach(k => DeltaWrite.append(
        Seq((k.toLong, s"a$k")).toDF("id", "txt").coalesce(1), src))
      DeltaWrite.checkpoint(spark, src) // _last_checkpoint advertises 8 adds
      spark.conf.set(thresholdKey, "5")
      assert(DeltaRead.snapshot(spark, src).index
        .isInstanceOf[DeltaRead.DatasetIndex])
      // Seam QUIET through the whole first start: the base FILE LIST
      // rides the frame (pre-fix, fileList(base) collected full
      // FileEntries for the whole snapshot — a 100 TB tail's first
      // act), and BOTH schema resolutions (provider sourceSchema +
      // the persisted bootstrap marker) resolve from the declared log
      // schema, not a full assemble.
      val fired = new java.util.concurrent.atomic.AtomicInteger(0)
      DeltaRead.onDatasetMaterialize = Some(_ => fired.incrementAndGet())
      try {
        val q = spark.readStream.format("graft-delta").load(src)
          .writeStream.format("memory").queryName("gd_tier").start()
        q.processAllAvailable(); q.stop()
      } finally DeltaRead.onDatasetMaterialize = None
      assert(fired.get == 0,
        s"bootstrap must not materialize the base snapshot, fired ${fired.get}")
      assert(rows(spark.table("gd_tier")) == rows(DeltaRead.read(spark, src)),
        "tiered bootstrap must surface exactly the base snapshot")
    } finally {
      spark.conf.unset(thresholdKey)
      cleanup(src)
    }
  }
}
