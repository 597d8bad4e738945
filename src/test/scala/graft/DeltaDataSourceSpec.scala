package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources._

import graft.io.{DeltaRead, DeltaWrite}
import graft.io.v2.DeltaRelation

/** The `graft-delta` SQL-facing format: spark.read.format /
  * CREATE TEMPORARY VIEW ... USING must read exactly what the Scala
  * API reads (DV masking included), honor time travel options, and
  * translate pushed filters into both file skipping and scan
  * predicates. */
class DeltaDataSourceSpec extends SparkTestBase {
  import spark.implicits._

  private def newTable(): String = {
    val d = Files.createTempDirectory("gdeltads")
    org.apache.commons.io.FileUtils.deleteDirectory(d.toFile)
    d.toString
  }
  private def cleanup(t: String): Unit =
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(t))

  test("format read == Scala API read, DVs and time travel included") {
    val t = newTable()
    try {
      DeltaWrite.append((1 to 50).map(i => (i.toLong, s"r$i")).toDF("id", "txt"), t)
      DeltaWrite.append((51 to 80).map(i => (i.toLong, s"r$i")).toDF("id", "txt"), t)
      DeltaWrite.deleteWhere(spark, t, $"id" % 7 === 0) // DV mask
      val api = DeltaRead.read(spark, t).orderBy($"id")
        .as[(Long, String)].collect().toSeq
      val fmt = spark.read.format("graft-delta").load(t).orderBy($"id")
        .as[(Long, String)].collect().toSeq
      assert(fmt == api && fmt.size == 80 - (80 / 7))
      // versionAsOf re-opens the pre-delete state
      val v1 = spark.read.format("graft-delta")
        .option("versionAsOf", "1").load(t).count()
      assert(v1 == 80)
      // SQL DDL path: a temp view over the format, queried with sql()
      spark.sql(s"""CREATE OR REPLACE TEMPORARY VIEW gd_docs
        USING `graft-delta` OPTIONS (path '$t')""")
      val n = spark.sql("SELECT count(*) AS n FROM gd_docs WHERE id <= 10")
        .as[Long].head()
      assert(n == 10 - 1) // id 7 deleted
    } finally cleanup(t)
  }

  test("pushed filters become StatRanges (file skipping) and scan predicates") {
    // translation unit: conjuncts tighten, unsupported shapes drop out
    val ranges = DeltaRelation.toStatRanges(Array(
      GreaterThan("id", 10L), LessThanOrEqual("id", 100L),
      GreaterThanOrEqual("id", 25L), EqualTo("lang", "es"),
      In("k", Array(5L, 2L, 9L)), IsNotNull("txt"),
      StringStartsWith("txt", "a")))
    val byCol = ranges.map(r => r.col -> ((r.lo, r.hi))).toMap
    assert(byCol("id") == ((Some(25L), Some(100L))), s"got $byCol")
    assert(byCol("lang") == ((Some("es"), Some("es"))))
    assert(byCol("k") == ((Some(2L), Some(9L))))
    assert(!byCol.contains("txt"), "non-range shapes must not produce ranges")
    // end-to-end: a range query through the format equals a plain scan
    val t = newTable()
    try {
      DeltaWrite.append((1 to 40).map(i => (i.toLong, i % 5L)).toDF("id", "g")
        .coalesce(1), t)
      DeltaWrite.append((41 to 90).map(i => (i.toLong, i % 5L)).toDF("id", "g")
        .coalesce(1), t)
      val got = spark.read.format("graft-delta").load(t)
        .where($"id" > 50L && $"g" === 2L).agg(sum($"id")).as[Long].head()
      val want = (51 to 90).filter(_ % 5 == 2).map(_.toLong).sum
      assert(got == want)
    } finally cleanup(t)
  }

  test("write side: save modes and SQL INSERT INTO go through the transactional writer") {
    val t = newTable()
    try {
      val mk = (lo: Int, hi: Int) => (lo to hi).map(i => (i.toLong, s"r$i")).toDF("id", "txt")
      mk(1, 10).write.format("graft-delta").option("path", t).save() // creates
      mk(11, 15).write.format("graft-delta").mode("append").option("path", t).save()
      assert(DeltaRead.read(spark, t).count() == 15)
      assert(DeltaRead.latestVersion(t) == 1L, "two real commits")
      intercept[IllegalStateException] {
        mk(1, 1).write.format("graft-delta").option("path", t).save() // ErrorIfExists
      }
      mk(99, 99).write.format("graft-delta").mode("ignore").option("path", t).save()
      assert(DeltaRead.read(spark, t).count() == 15, "ignore must be a no-op")
      // SQL INSERT INTO via the view
      spark.sql(s"""CREATE OR REPLACE TEMPORARY VIEW gd_w
        USING `graft-delta` OPTIONS (path '$t')""")
      spark.sql("INSERT INTO gd_w VALUES (100, 'sql'), (101, 'sql2')")
      assert(DeltaRead.read(spark, t).count() == 17)
      mk(1, 3).write.format("graft-delta").mode("overwrite").option("path", t).save()
      assert(DeltaRead.read(spark, t).count() == 3)
      // the whole history is ordinary Delta: time travel still works
      assert(spark.read.format("graft-delta").option("versionAsOf", "2")
        .load(t).count() == 17)
    } finally cleanup(t)
  }

  test("partition-column predicates prune files through StatRanges (and the format)") {
    val t = newTable()
    try {
      val df = (1 to 60).map(i => (i.toLong, s"p${i % 3}", s"r$i")).toDF("id", "part", "txt")
      DeltaWrite.append(df, t, partitionBy = Seq("part"))
      val head = DeltaRead.latestVersion(t)
      val total = DeltaRead.snapshotAt(spark, t, head).files.size
      val oneP = DeltaRead.filesAfterSkipping(spark, t, head,
        Seq(DeltaRead.StatRange("part", Some("p1"), Some("p1"))))
      assert(oneP.nonEmpty && oneP.size < total,
        s"partition equality must prune: ${oneP.size} of $total")
      assert(oneP.forall(_.partitionValues("part") == "p1"))
      // combined partition + data-column pruning composes
      val both = DeltaRead.filesAfterSkipping(spark, t, head,
        Seq(DeltaRead.StatRange("part", Some("p2"), Some("p2")),
          DeltaRead.StatRange("id", Some(1000L), None)))
      assert(both.isEmpty, "no file holds part=p2 AND id>=1000")
      // and the format's pushed filter path returns the right rows
      val got = spark.read.format("graft-delta").load(t)
        .where($"part" === "p1").count()
      assert(got == (1 to 60).count(_ % 3 == 1))
    } finally cleanup(t)
  }

  test("timestampAsOf parses every documented form; sink refuses non-Append modes") {
    val t = newTable()
    try {
      DeltaWrite.append(Seq((1L, "a")).toDF("id", "txt"), t)
      DeltaWrite.append(Seq((2L, "b")).toDF("id", "txt"), t)
      // bare date, local datetime with space and with T, epoch millis —
      // all far-future, all resolving to the head version
      Seq("2999-01-01", "2999-01-01 12:00:00", "2999-01-01T12:00:00",
        (System.currentTimeMillis() + 86400000L).toString).foreach { ts =>
        assert(spark.read.format("graft-delta")
          .option("timestampAsOf", ts).load(t).count() == 2, s"form '$ts'")
      }
      val bad = intercept[IllegalArgumentException] {
        spark.read.format("graft-delta")
          .option("timestampAsOf", "next tuesday").load(t)
      }
      assert(bad.getMessage.contains("unparseable"))
      // Complete mode would duplicate the aggregate on every trigger
      val e = intercept[Exception] {
        spark.readStream.format("graft-delta-cdf").load(t)
          .groupBy($"id").count()
          .writeStream.format("graft-delta")
          .outputMode("complete")
          .option("path", newTable())
          .option("checkpointLocation",
            Files.createTempDirectory("gdbad").toString)
          .start()
      }
      assert(e.getMessage.contains("Append") ||
        Option(e.getCause).exists(_.getMessage.contains("Append")))
    } finally cleanup(t)
  }

  test("readChangeFeed=true: batch CDF through pure SQL views") {
    val t = Files.createTempDirectory("gd_cdfbatch").toString
    try {
      DeltaWrite.append(Seq((1L, "a"), (2L, "b")).toDF("id", "s"), t)         // v0
      DeltaWrite.setProperties(spark, t,
        Map("delta.enableChangeDataFeed" -> "true"))                          // v1
      DeltaWrite.append(Seq((3L, "c"), (4L, "d")).toDF("id", "s"), t)         // v2
      DeltaWrite.deleteWhere(spark, t, $"id" === 1L)                          // v3
      DeltaWrite.updateWhere(spark, t, $"id" === 4L, Seq("s" -> lit("D")))    // v4
      // startingVersion is INCLUSIVE (Delta's batch convention)
      spark.sql(s"""CREATE OR REPLACE TEMPORARY VIEW gd_ch
        USING `graft-delta` OPTIONS (path '$t', readChangeFeed 'true',
        startingVersion '2')""")
      val got = spark.sql(
        "SELECT id, s, _change_type AS ct, _commit_version AS v FROM gd_ch")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
          r.getLong(3))).toSet
      // the feed folds update pre/post onto delete/insert (readCdc's
      // documented two-type decomposition)
      assert(got == Set(
        (3L, "c", "insert", 2L), (4L, "d", "insert", 2L),
        (1L, "a", "delete", 3L),
        (4L, "d", "delete", 4L), (4L, "D", "insert", 4L)))
      // endingVersion pins the upper bound; the view stays stable while
      // the table moves (construction-bounded, like a pinned read)
      spark.sql(s"""CREATE OR REPLACE TEMPORARY VIEW gd_ch2
        USING `graft-delta` OPTIONS (path '$t', readChangeFeed 'true',
        startingVersion '2', endingVersion '3')""")
      DeltaWrite.append(Seq((9L, "z")).toDF("id", "s"), t)                    // v5
      assert(spark.table("gd_ch2").count() == 3)
      // time travel and the feed are mutually exclusive
      val e = intercept[Exception] {
        spark.sql(s"""CREATE OR REPLACE TEMPORARY VIEW gd_bad
          USING `graft-delta` OPTIONS (path '$t', readChangeFeed 'true',
          startingVersion '0', versionAsOf '1')""")
      }
      assert(e.getMessage.contains("mutually exclusive"))
    } finally org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(t))
  }

  test("streaming sink: Delta→Delta through readStream+writeStream is exactly-once") {
    val src = newTable(); val dst = newTable()
    val ckpt = Files.createTempDirectory("gdsink_ckpt").toString
    try {
      DeltaWrite.append((1 to 20).map(i => (i.toLong, s"r$i")).toDF("id", "txt"), src)
      DeltaWrite.deleteWhere(spark, src, $"id" % 4 === 0)
      def run(): Unit = {
        val q = spark.readStream.format("graft-delta-cdf").load(src)
          .writeStream.format("graft-delta")
          .option("path", dst).option("checkpointLocation", ckpt)
          .start()
        q.processAllAvailable(); q.stop()
      }
      run()
      val want = DeltaRead.changesBetween(spark, src, -1L,
        DeltaRead.latestVersion(src)).count()
      assert(DeltaRead.read(spark, dst).count() == want)
      // restart with nothing new: the SetTransaction ledger blocks any
      // replayed batch — not one duplicate row
      run()
      assert(DeltaRead.read(spark, dst).count() == want)
      // new source commits flow through incrementally after a restart
      DeltaWrite.append(Seq((100L, "late")).toDF("id", "txt"), src)
      run()
      assert(DeltaRead.read(spark, dst).count() == want + 1)
      assert(DeltaRead.snapshot(spark, dst).txns.keys
        .exists(_.startsWith("graft-delta-sink:")), "ledger must be recorded")
    } finally { cleanup(src); cleanup(dst); cleanup(ckpt) }
  }

  test("streaming sink refuses to start without a per-query identity") {
    // with no txnAppId and no checkpointLocation OPTION there is no
    // per-query identity: a path-derived appId would be shared by every
    // query writing the table, and their overlapping batchIds would be
    // silently deduplicated by the appendOnce replay guard (data loss)
    val e = intercept[IllegalArgumentException] {
      new graft.io.v2.DeltaDataSource().createSink(spark.sqlContext,
        Map("path" -> newTable()), Nil,
        org.apache.spark.sql.streaming.OutputMode.Append())
    }
    assert(e.getMessage.contains("txnAppId"))
  }
}
