package graft

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._

import graft.io.{DeltaRead, DeltaWrite}

/** Metadata cleanup (log expiration): expired commits and checkpoints
  * below a surviving checkpoint boundary are deleted per
  * `delta.logRetentionDuration`, `checkpointProtection` blocks any
  * partial sweep below its version, and shared v2 sidecars survive as
  * long as ANY surviving manifest references them. */
class MetadataCleanupSpec extends SparkTestBase {
  import spark.implicits._

  private def newTable(): String = Files.createTempDirectory("metaclean").toString
  private def cleanup(t: String): Unit =
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(t))

  private def logNames(t: String): Set[String] = {
    val st = Files.list(Paths.get(t, "_delta_log"))
    try st.iterator().asScala.map(_.getFileName.toString).toSet
    finally st.close()
  }

  test("expired commits and checkpoints below the boundary go; reads survive") {
    val t = newTable()
    try {
      (0 to 3).foreach(i =>
        DeltaWrite.append(Seq((i.toLong, s"r$i")).toDF("id", "s"), t))  // v0..v3
      DeltaWrite.checkpoint(spark, t)                                    // cp@3
      DeltaWrite.append(Seq((4L, "r4")).toDF("id", "s"), t)              // v4
      DeltaWrite.compactLog(t, 0L, 2L)
      DeltaWrite.setProperties(spark, t,
        Map("delta.logRetentionDuration" -> "interval 0 seconds"))       // v5
      DeltaWrite.checkpoint(spark, t)                                    // cp@5
      DeltaWrite.append(Seq((5L, "r5")).toDF("id", "s"), t)              // v6
      val n = DeltaWrite.cleanMetadata(spark, t)
      assert(n > 0)
      val names = logNames(t)
      // everything below cp@5 expired: jsons 0..4, cp@3, the 0..2 span
      (0L to 4L).foreach(v =>
        assert(!names(f"$v%020d.json"), s"commit $v should be expired"))
      assert(!names("00000000000000000003.checkpoint.parquet"))
      assert(!names.exists(_.endsWith(".compacted.json")))
      // the boundary checkpoint and the live tail stay
      assert(names(f"${5L}%020d.json") && names(f"${6L}%020d.json"))
      assert(names("00000000000000000005.checkpoint.parquet"))
      assert(DeltaRead.read(spark, t).count() == 6)
      // time travel below the boundary refuses loudly (the Delta trade)
      val e = intercept[IllegalArgumentException] {
        DeltaRead.snapshotAt(spark, t, 2L)
      }
      assert(e.getMessage.contains("missing") || e.getMessage.contains("truncated"))
    } finally cleanup(t)
  }

  test("a long retention keeps everything; checkpointProtection blocks partial sweeps") {
    val t = newTable()
    try {
      (0 to 2).foreach(i =>
        DeltaWrite.append(Seq((i.toLong, s"r$i")).toDF("id", "s"), t))   // v0..v2
      DeltaWrite.checkpoint(spark, t)                                     // cp@2
      DeltaWrite.append(Seq((3L, "x")).toDF("id", "s"), t)                // v3
      // default 30-day retention: nothing is old enough
      assert(DeltaWrite.cleanMetadata(spark, t) == 0)
      // zero retention BUT protection demands cleanup clear version 50
      DeltaWrite.setProperties(spark, t, Map(
        "delta.logRetentionDuration" -> "interval 0 seconds",
        "delta.requireCheckpointProtectionBeforeVersion" -> "50"))        // v4
      DeltaWrite.checkpoint(spark, t)                                     // cp@4
      val before = logNames(t)
      assert(DeltaWrite.cleanMetadata(spark, t) == 0,
        "a sweep below the protected version must not run")
      assert(logNames(t) == before)
      // once the protection version is cleared by the boundary, go
      DeltaWrite.setProperties(spark, t, Map(
        "delta.requireCheckpointProtectionBeforeVersion" -> "5"))         // v5
      DeltaWrite.checkpoint(spark, t)                                     // cp@5
      assert(DeltaWrite.cleanMetadata(spark, t) > 0)
      assert(!logNames(t)(f"${0L}%020d.json"))
      assert(DeltaRead.read(spark, t).count() == 4)
    } finally cleanup(t)
  }

  test("an INCOMPLETE multipart checkpoint never anchors the deletion boundary") {
    val t = newTable()
    try {
      (0 to 2).foreach(i =>
        DeltaWrite.append(Seq((i.toLong, s"r$i")).toDF("id", "s"), t))  // v0..v2
      DeltaWrite.checkpoint(spark, t)                                    // whole cp@2
      DeltaWrite.append(Seq((3L, "x")).toDF("id", "s"), t)               // v3
      DeltaWrite.append(Seq((4L, "y")).toDF("id", "s"), t)               // v4
      DeltaWrite.setProperties(spark, t,
        Map("delta.logRetentionDuration" -> "interval 0 seconds"))       // v5
      // a crashed multipart writer left PART 1 OF 2 at v4 — a ghost
      // that names a version but resolves nothing
      Files.write(Paths.get(t, "_delta_log",
        f"${4L}%020d.checkpoint.${1}%010d.${2}%010d.parquet"), Array[Byte](1))
      val n = DeltaWrite.cleanMetadata(spark, t)
      // boundary anchored at the WHOLE cp@2, never the ghost: commits
      // 2..5 survive and every read still resolves
      assert(Files.exists(Paths.get(t, "_delta_log", f"${2L}%020d.json")))
      assert(Files.exists(Paths.get(t, "_delta_log", f"${3L}%020d.json")))
      assert(DeltaRead.read(spark, t).count() == 5)
      assert(n >= 0) // v0, v1 may go — that is fine
    } finally cleanup(t)
  }

  test("v2 sidecars survive while any surviving manifest references them") {
    val t = newTable()
    try {
      DeltaWrite.append(Seq((1L, "a"), (2L, "b")).toDF("id", "s"), t)     // v0
      DeltaWrite.setProperties(spark, t,
        Map("delta.checkpointPolicy" -> "v2",
          "delta.logRetentionDuration" -> "interval 0 seconds"))          // v1
      DeltaWrite.checkpointV2(spark, t)                                   // v2cp@1
      DeltaWrite.append(Seq((3L, "c")).toDF("id", "s"), t)                // v2
      DeltaWrite.checkpointV2(spark, t)                                   // v2cp@2
      val sidecarsBefore = {
        val st = Files.list(Paths.get(t, "_delta_log", "_sidecars"))
        try st.iterator().asScala.map(_.getFileName.toString).toSet
        finally st.close()
      }
      assert(sidecarsBefore.size >= 2)
      val n = DeltaWrite.cleanMetadata(spark, t)
      assert(n > 0)
      // the old manifest went; its unreferenced sidecar went; the
      // surviving manifest's sidecar stays and the table still reads
      val names = logNames(t)
      assert(!names(f"${0L}%020d.json") && !names(f"${1L}%020d.json"))
      val sidecarsAfter = {
        val st = Files.list(Paths.get(t, "_delta_log", "_sidecars"))
        try st.iterator().asScala.map(_.getFileName.toString).toSet
        finally st.close()
      }
      assert(sidecarsAfter.nonEmpty && sidecarsAfter.subsetOf(sidecarsBefore))
      assert(sidecarsAfter.size < sidecarsBefore.size,
        "the orphaned sidecar should be reclaimed")
      assert(DeltaRead.read(spark, t).count() == 3)
    } finally cleanup(t)
  }

  private def cdcPathsOf(t: String, v: Long): Seq[String] =
    Files.readAllLines(Paths.get(t, "_delta_log", f"$v%020d.json")).asScala
      .filter(_.contains("\"cdc\"")).map { l =>
        """"path":"([^"]+)"""".r.findFirstMatchIn(l).get.group(1)
      }.toSeq

  test("cleanMetadata reclaims the cdc files of expired commits, keeps the rest") {
    val t = newTable()
    try {
      DeltaWrite.append((1 to 60).map(i => (i.toLong, s"x$i")).toDF("id", "s"), t) // v0
      DeltaWrite.setProperties(spark, t,
        Map("delta.enableChangeDataFeed" -> "true"))                       // v1
      DeltaWrite.deleteWhere(spark, t, col("id") % 3 === 0)                // v2 cdc
      DeltaWrite.setProperties(spark, t,
        Map("delta.logRetentionDuration" -> "interval 0 seconds"))         // v3
      DeltaWrite.checkpoint(spark, t)                                      // cp@3
      DeltaWrite.deleteWhere(spark, t, col("id") % 7 === 0)                // v4 cdc
      val doomedCdc = cdcPathsOf(t, 2L)
      val keptCdc = cdcPathsOf(t, 4L)
      assert(doomedCdc.nonEmpty && keptCdc.nonEmpty)
      assert(DeltaWrite.cleanMetadata(spark, t) > 0)
      // the expired commit's cdc parquet died WITH its JSON — without
      // this, vacuum (which never touches _change_data) would leave it
      // orphaned forever
      doomedCdc.foreach(p => assert(!Files.exists(Paths.get(t, p)),
        s"cdc file $p of expired commit 2 must be reclaimed"))
      keptCdc.foreach(p => assert(Files.exists(Paths.get(t, p)),
        s"cdc file $p of surviving commit 4 must stay"))
      // the surviving change feed still reads via its cdc files
      val tail = DeltaRead.changesBetween(spark, t, 3L, 4L)
      assert(tail.where(col(DeltaRead.ChangeTypeCol) === "delete").count() > 0)
      assert(DeltaRead.read(spark, t).count() ==
        60 - 20 - (1 to 60).count(i => i % 7 == 0 && i % 3 != 0))
    } finally cleanup(t)
  }

  test("vacuum with retention past the cleaned log boundary clamps, not throws") {
    val t = newTable()
    try {
      DeltaWrite.append((1 to 40).map(i => (i.toLong, s"x$i")).toDF("id", "s"), t) // v0
      DeltaWrite.append(Seq((100L, "y")).toDF("id", "s"), t)               // v1
      DeltaWrite.deleteWhere(spark, t, col("id") % 4 === 0)                // v2 (DV)
      DeltaWrite.checkpoint(spark, t)                                      // cp@2
      DeltaWrite.setProperties(spark, t,
        Map("delta.logRetentionDuration" -> "interval 0 seconds"))         // v3
      DeltaWrite.checkpoint(spark, t)                                      // cp@3
      DeltaWrite.append(Seq((200L, "z")).toDF("id", "s"), t)               // v4
      assert(DeltaWrite.cleanMetadata(spark, t) > 0)                       // kills <3
      // a DV-protecting vacuum whose retention exceeds the log
      // retention lands its window start below the cleanup boundary,
      // where no checkpoint or JSONs survive — the replay must clamp to
      // the oldest resolvable version instead of throwing
      val n = DeltaWrite.vacuum(spark, t, retentionMs = 7L * 24 * 3600 * 1000)
      assert(n >= 0)
      // 40 base − 10 (id%4) − id=100 (also %4) + the two appends
      assert(DeltaRead.read(spark, t).count() == 40 - 10 - 1 + 2)
    } finally cleanup(t)
  }
}
