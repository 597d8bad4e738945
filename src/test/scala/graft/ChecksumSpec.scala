package graft

import graft.io.{DeltaRead, DeltaWrite}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** VERSION CHECKSUMS (`_delta_log/<v>.crc`, the per-commit state
  * digest delta-io's OSS writer emits): every graft commit writes one
  * incrementally (no log re-replay), verifyChecksum cross-checks a
  * version's digest against its resolved snapshot in O(1) data reads,
  * a tampered log trips it, foreign tables without digests return
  * None, and cleanMetadata expires digests with their commit JSON. */
class ChecksumSpec extends SparkTestBase {
  import spark.implicits._

  private def newTable(): String =
    Files.createTempDirectory("crctab").toString

  private def cleanup(t: String): Unit =
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(t))

  private def crcFiles(t: String): Seq[String] = {
    val st = Files.list(Paths.get(t, "_delta_log"))
    try st.iterator().asScala.map(_.getFileName.toString)
      .filter(_.endsWith(".crc")).toList.sorted
    finally st.close()
  }

  test("every commit writes a digest; verifyChecksum matches across op types") {
    val t = newTable()
    try {
      DeltaWrite.append((1L to 40L).map(i => (i, s"v$i")).toDF("id", "txt"), t) // v0
      DeltaWrite.append((41L to 60L).map(i => (i, s"v$i")).toDF("id", "txt"), t) // v1
      DeltaWrite.deleteWhere(spark, t, $"id" % 5 === 0)                          // v2 (DV)
      DeltaWrite.compact(spark, t)                                               // v3
      DeltaWrite.merge(spark, t, Seq((2L, "x"), (99L, "y")).toDF("id", "txt"),
        Seq("id"))                                                               // v4
      assert(crcFiles(t).size == 5, s"one digest per commit: ${crcFiles(t)}")
      (0L to 4L).foreach { v =>
        val r = DeltaWrite.verifyChecksum(spark, t, Some(v))
        assert(r.contains(Nil), s"v$v digest must match its snapshot, got $r")
      }
    } finally cleanup(t)
  }

  test("a tampered digest trips; a foreign table without digests returns None") {
    val t = newTable()
    try {
      DeltaWrite.append((1L to 10L).toDF("id"), t)
      val crc = Paths.get(t, "_delta_log", f"${0L}%020d.crc")
      val doctored = new String(Files.readAllBytes(crc), "UTF-8")
        .replaceAll(""""numFiles":\d+""", "\"numFiles\":999")
      Files.write(crc, Seq(doctored).asJava)
      val r = DeltaWrite.verifyChecksum(spark, t, Some(0L))
      assert(r.exists(_.exists(_.contains("numFiles"))), s"tamper must trip: $r")
      // foreign history: no digest at all → None (nothing to validate)
      Files.delete(crc)
      assert(DeltaWrite.verifyChecksum(spark, t, Some(0L)).isEmpty)
    } finally cleanup(t)
  }

  test("cleanMetadata expires digests with their commit JSON") {
    val t = newTable()
    try {
      DeltaWrite.append((1L to 10L).toDF("id"), t)                 // v0
      DeltaWrite.append((11L to 20L).toDF("id"), t)                // v1
      DeltaWrite.checkpoint(spark, t)                              // cp@1
      DeltaWrite.append((21L to 30L).toDF("id"), t)                // v2
      // age everything past the retention window
      val ld = Paths.get(t, "_delta_log")
      val st = Files.list(ld)
      try st.iterator().asScala.foreach(p => Files.setLastModifiedTime(p,
        java.nio.file.attribute.FileTime.fromMillis(1000L)))
      finally st.close()
      DeltaWrite.setProperties(spark, t,
        Map("delta.logRetentionDuration" -> "interval 0 seconds"))  // v3
      DeltaWrite.cleanMetadata(spark, t)
      val left = crcFiles(t)
      assert(!left.contains(f"${0L}%020d.crc"),
        s"v0's digest must die with its commit JSON: $left")
      assert(left.contains(f"${3L}%020d.crc"), s"live digests survive: $left")
      assert(DeltaRead.read(spark, t).count() == 30)
    } finally cleanup(t)
  }
}
