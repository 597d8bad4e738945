package graft

import graft.io.{DeltaRead, DeltaWrite}
import graft.streaming.DeltaTail
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** [[graft.streaming.DeltaTail]] — the change feed consumed as
  * micro-batches: a mirror folded one commit at a time equals the
  * source snapshot (stream == batch), resumes from the protocol's
  * SetTransaction mark across separate runs, and replays as no-ops. */
class DeltaTailSpec extends SparkTestBase {
  import spark.implicits._

  private def newTable(): String = Files.createTempDirectory("deltatail").toString
  private def cleanup(t: String): Unit =
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(t))

  private def rows(t: String): Seq[(Long, String)] =
    DeltaRead.read(spark, t).orderBy($"id").as[(Long, String)].collect().toSeq

  test("mirror folds appends, DV deletes, merges and overwrites into an identical table") {
    val src = newTable(); val dst = newTable()
    new java.io.File(dst).delete()
    try {
      DeltaWrite.append((0 until 60).map(i => (i.toLong, s"v$i")).toDF("id", "txt")
        .repartition(3), src)                                        // v0
      DeltaWrite.append((60 until 90).map(i => (i.toLong, s"v$i")).toDF("id", "txt"), src) // v1
      assert(DeltaWrite.compact(spark, src) > 0)                     // v2: invisible
      DeltaWrite.deleteWhere(spark, src, $"id" % 5 === 0)            // v3: DV deletes
      DeltaWrite.merge(spark, src,
        Seq((7L, "upd"), (200L, "new")).toDF("id", "txt"), Seq("id")) // v4: upsert
      val n = DeltaTail.mirror(spark, src, dst, Seq("id"))
      assert(n == 5, s"expected 5 versions folded, got $n")
      assert(rows(dst) == rows(src), "mirror must equal the source snapshot")
      // the source keeps changing; a later run resumes from the mark
      DeltaWrite.append(Seq((300L, "late")).toDF("id", "txt"), src)  // v5
      DeltaWrite.deleteWhere(spark, src, $"id" === 7L)               // v6
      assert(DeltaTail.mirror(spark, src, dst, Seq("id")) == 2)
      assert(rows(dst) == rows(src))
      // nothing new: replay is a no-op and moves no versions
      val sinkHead = DeltaRead.latestVersion(dst)
      assert(DeltaTail.mirror(spark, src, dst, Seq("id")) == 0)
      assert(DeltaRead.latestVersion(dst) == sinkHead)
      assert(rows(dst) == rows(src))
    } finally { cleanup(src); cleanup(dst) }
  }

  test("a delete-only version still advances the mark (no stuck replays)") {
    val src = newTable(); val dst = newTable()
    new java.io.File(dst).delete()
    try {
      DeltaWrite.append((0 until 20).map(i => (i.toLong, s"v$i")).toDF("id", "txt"), src)
      DeltaTail.mirror(spark, src, dst, Seq("id"))
      DeltaWrite.deleteWhere(spark, src, $"id" < 5)  // v1: deletes only
      assert(DeltaTail.mirror(spark, src, dst, Seq("id")) == 1)
      assert(rows(dst) == rows(src))
      // the delete-only version recorded its mark: re-running skips it
      assert(DeltaTail.mirror(spark, src, dst, Seq("id")) == 0)
    } finally { cleanup(src); cleanup(dst) }
  }
}
