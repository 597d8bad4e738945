package graft

import graft.io.{DeltaRead, DeltaWrite}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** [[graft.streaming.DeltaCdfStreamProvider]] — the change feed as a
  * real `readStream` source: a streamed feed equals the batch
  * `changesBetween` fold over the same history, the checkpoint resumes
  * across separate queries without re-surfacing old versions, and the
  * rate limit paces versions per trigger. */
class DeltaCdfStreamSpec extends SparkTestBase {
  import spark.implicits._

  private def newTable(): String = Files.createTempDirectory("cdfstream").toString
  private def cleanup(t: String): Unit =
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(t))

  private def history(src: String): Unit = {
    DeltaWrite.append((0 until 40).map(i => (i.toLong, s"v$i")).toDF("id", "txt")
      .repartition(2), src)                                          // v0
    DeltaWrite.append((40 until 60).map(i => (i.toLong, s"v$i")).toDF("id", "txt"), src) // v1
    DeltaWrite.deleteWhere(spark, src, $"id" % 4 === 0)              // v2: DV deletes
    DeltaWrite.merge(spark, src,
      Seq((3L, "upd"), (500L, "new")).toDF("id", "txt"), Seq("id"))  // v3: upsert
  }

  private def feed(df: org.apache.spark.sql.DataFrame): Seq[(Long, String, String, Long)] =
    df.select($"id", $"txt", $"_change_type", $"_commit_version")
      .as[(Long, String, String, Long)].collect().toSeq.sorted

  test("streamed change feed == batch changesBetween over the same history") {
    val src = newTable()
    try {
      history(src)
      val q = spark.readStream.format("graft-delta-cdf").load(src)
        .writeStream.format("memory").queryName("cdf_all").start()
      q.processAllAvailable(); q.stop()
      val streamed = feed(spark.table("cdf_all"))
      val batch = feed(DeltaRead.changesBetween(spark, src, -1L, DeltaRead.latestVersion(src)))
      assert(streamed == batch, "stream must surface exactly the batch feed")
      assert(streamed.exists(_._3 == "delete"), "history must exercise deletes")
    } finally { cleanup(src) }
  }

  test("checkpoint resume: a restarted query appends only new versions, no replays") {
    val src = newTable()
    val ckpt = Files.createTempDirectory("cdfstream_ckpt").toString
    val out = Files.createTempDirectory("cdfstream_out").toString
    try {
      history(src)
      // the memory sink refuses checkpoint recovery (it is not
      // fault-tolerant) — a parquet sink makes exactly-once visible:
      // a replayed version would land duplicate rows in the directory
      def run(): Unit = {
        val q = spark.readStream.format("graft-delta-cdf").load(src)
          .writeStream.format("parquet").option("path", out)
          .option("checkpointLocation", ckpt).start()
        q.processAllAvailable(); q.stop()
      }
      run()
      assert(spark.read.parquet(out).count() ==
        DeltaRead.changesBetween(spark, src, -1L, DeltaRead.latestVersion(src)).count())
      // new commits while the query is down
      DeltaWrite.append(Seq((600L, "late")).toDF("id", "txt"), src)  // v4
      DeltaWrite.deleteWhere(spark, src, $"id" === 3L)               // v5
      run() // same checkpoint: resumes past v3
      val resumed = feed(spark.read.parquet(out))
      val expected = feed(DeltaRead.changesBetween(spark, src, -1L, 5L))
      assert(resumed == expected,
        "restart must append exactly versions 4..5 — a duplicate means a replay, " +
          s"a gap means a skip (got versions ${resumed.map(_._4).distinct.sorted})")
    } finally { cleanup(src); cleanup(ckpt); cleanup(out) }
  }

  test("maxVersionsPerTrigger paces one commit per micro-batch") {
    val src = newTable()
    try {
      history(src) // 4 versions
      val q = spark.readStream.format("graft-delta-cdf")
        .option("maxVersionsPerTrigger", "1").load(src)
        .writeStream.format("memory").queryName("cdf_paced").start()
      q.processAllAvailable()
      val batches = q.recentProgress.filter(_.numInputRows > 0)
      q.stop()
      assert(batches.length == 4,
        s"4 row-bearing versions should take 4 micro-batches, got ${batches.length}")
      assert(feed(spark.table("cdf_paced")) ==
        feed(DeltaRead.changesBetween(spark, src, -1L, 3L)))
    } finally { cleanup(src) }
  }

  test("maxBytesPerTrigger paces by the commits' add.size; oversized version rides alone") {
    val src = newTable()
    try {
      // four same-shaped appends (~equal bytes per version) then one
      // big one — a budget of ~2.5 versions groups 2+2, and the big
      // version exceeds the whole budget but is admitted alone
      (0 until 4).foreach(i =>
        DeltaWrite.append((1L to 50L).map(_ + i * 50).map(j => (j, s"v$j"))
          .toDF("id", "txt").coalesce(1), src))                       // v0..v3
      DeltaWrite.append((1000L to 3000L).map(j => (j, s"v$j"))
        .toDF("id", "txt").coalesce(1), src)                          // v4 (big)
      val perVersion = DeltaRead.snapshot(spark, src).files
        .map(_.sizeOrStat(src))
      val small = perVersion.min
      val q = spark.readStream.format("graft-delta-cdf")
        .option("maxBytesPerTrigger", (small * 5 / 2).toString).load(src)
        .writeStream.format("memory").queryName("cdf_bytes").start()
      q.processAllAvailable()
      val batches = q.recentProgress.filter(_.numInputRows > 0)
      q.stop()
      assert(batches.length == 3,
        s"2+2+oversized-alone should be 3 micro-batches, got ${batches.length}")
      assert(feed(spark.table("cdf_bytes")) ==
        feed(DeltaRead.changesBetween(spark, src, -1L, 4L)))
    } finally { cleanup(src) }
  }

  test("Trigger.AvailableNow drains the paced feed to the start-head, then stops") {
    val src = newTable()
    val ckpt = Files.createTempDirectory("cdf_avnow_ckpt").toString
    val out = Files.createTempDirectory("cdf_avnow_out").toString
    try {
      history(src) // v0..v3
      val q = spark.readStream.format("graft-delta-cdf")
        .option("maxVersionsPerTrigger", "1").load(src)
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      assert(q.awaitTermination(120000), "AvailableNow query did not stop")
      val drained = feed(spark.read.parquet(out))
      val batch = feed(DeltaRead.changesBetween(spark, src, -1L,
        DeltaRead.latestVersion(src)))
      assert(drained == batch,
        "the drain must cover every version to the start-head, not stop " +
          "at the first rate-limited chunk")
      assert(q.recentProgress.count(_.numInputRows > 0) >= 3,
        "the drain must still pace one version per batch")
    } finally { cleanup(src); cleanup(ckpt); cleanup(out) }
  }

  test("startingVersion skips history; schema carries the change columns") {
    val src = newTable()
    try {
      history(src)
      val df = spark.readStream.format("graft-delta-cdf")
        .option("startingVersion", "2").load(src)
      assert(df.isStreaming)
      assert(df.columns.toSeq == Seq("id", "txt", "_change_type", "_commit_version"))
      val q = df.writeStream.format("memory").queryName("cdf_from2").start()
      q.processAllAvailable(); q.stop()
      assert(feed(spark.table("cdf_from2")) ==
        feed(DeltaRead.changesBetween(spark, src, 2L, 3L)))
    } finally { cleanup(src) }
  }
}
