package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.io.{DeltaRead, DeltaWrite}

/** Minor log compaction ({x}.{y}.compacted.json): snapshot resolution
  * through the reconciled file must equal per-commit replay, the
  * compaction must actually be USED (proven by hiding the commits it
  * spans), and it must never leak into versions outside its range. */
class LogCompactionSpec extends SparkTestBase {
  import spark.implicits._

  private def newTable(): String = Files.createTempDirectory("logcompact").toString
  private def cleanup(t: String): Unit =
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(t))

  /** Comparable essence of a snapshot: live file paths + dv cardinality,
    * schema, config, txns. */
  private def essence(t: String, v: Long) = {
    val s = DeltaRead.snapshotAt(spark, t, v)
    (s.files.map(f => (f.path, f.dv.map(_.cardinality))).sortBy(_._1),
      s.schema.map(_.json), s.configuration, s.txns)
  }

  /** A varied history: appends, a property change, a DV delete, a
    * txn-marked append, a second delete restoring part of the key
    * space via re-add patterns. */
  private def buildHistory(t: String): Long = {
    DeltaWrite.append(Seq((1L, "a"), (2L, "b")).toDF("id", "s"), t)        // v0
    DeltaWrite.append(Seq((3L, "c"), (4L, "d")).toDF("id", "s"), t)        // v1
    DeltaWrite.setProperties(spark, t, Map("graft.note" -> "one"))         // v2
    DeltaWrite.deleteWhere(spark, t, $"id" === 3L)                         // v3
    DeltaWrite.appendOnce(Seq((5L, "e")).toDF("id", "s"), t, "app-x", 7L)  // v4
    DeltaWrite.setProperties(spark, t, Map("graft.note" -> "two"))         // v5
    DeltaWrite.append(Seq((6L, "f")).toDF("id", "s"), t)                   // v6
    6L
  }

  test("resolution via the compacted file equals per-commit replay — and is used") {
    val t = newTable()
    try {
      val head = buildHistory(t)
      val before = essence(t, head)
      val dataBefore = DeltaRead.read(spark, t).orderBy($"id").collect().toSeq
      val dest = DeltaWrite.compactLog(t, 1L, 5L)
      assert(dest.getFileName.toString ==
        "00000000000000000001.00000000000000000005.compacted.json")
      assert(essence(t, head) == before, "compacted resolution diverged")
      // prove the compaction is USED: hide commits 1..5 — resolution
      // must still succeed (through the compacted file) and agree
      val hidden = (1L to 5L).map { v =>
        val p = Paths.get(t, "_delta_log", f"$v%020d.json")
        val bak = Paths.get(t, "_delta_log", f"hidden-$v")
        Files.move(p, bak); (p, bak)
      }
      try {
        assert(essence(t, head) == before,
          "resolution with commits hidden must ride the compacted file")
        assert(DeltaRead.read(spark, t).orderBy($"id").collect().toSeq == dataBefore)
        // mid-range time travel CANNOT use it (range overshoots) and
        // must fail loudly on the missing per-commit file
        val e = intercept[IllegalArgumentException] {
          DeltaRead.snapshotAt(spark, t, 3L)
        }
        assert(e.getMessage.contains("missing"))
      } finally hidden.foreach { case (p, bak) => Files.move(bak, p) }
      // restored: mid-range time travel works again
      assert(DeltaRead.snapshotAt(spark, t, 3L).files.nonEmpty)
    } finally cleanup(t)
  }

  test("reconciliation: superseded adds vanish, tombstones survive, latest meta/txn win") {
    val t = newTable()
    try {
      buildHistory(t)
      DeltaWrite.compact(spark, t) // v7: OPTIMIZE — real remove tombstones
      val head = DeltaRead.latestVersion(t)
      DeltaWrite.compactLog(t, 0L, head)
      val lines = Files.readAllLines(
        Paths.get(t, "_delta_log",
          f"${0L}%020d.$head%020d.compacted.json")).toArray.mkString("\n")
      // OPTIMIZE removed the small appended files without re-adding
      // their paths: those removes must survive as tombstones, while
      // each path appears exactly once (superseded adds vanish)
      assert(lines.contains("\"remove\""), "tombstones must survive compaction")
      val om = new com.fasterxml.jackson.databind.ObjectMapper()
      val paths = lines.split('\n').map(om.readTree)
        .flatMap(n => Option(n.get("add")).orElse(Option(n.get("remove"))))
        .map(_.get("path").asText()).toSeq
      assert(paths.distinct.size == paths.size, "one action per path after reconciliation")
      assert(lines.contains("\"txn\"") && lines.contains("app-x"))
      assert(lines.contains("\"two\"") && !lines.contains("\"one\""),
        "only the LATEST metaData survives")
      assert(!lines.contains("commitInfo"), "commitInfo is per-commit, dropped")
      // the reconciled resolution equals per-commit replay from scratch
      val viaCompact = {
        val hidden = (0L to head).map { v =>
          val p = Paths.get(t, "_delta_log", f"$v%020d.json")
          val bak = Paths.get(t, "_delta_log", f"hidden-$v")
          Files.move(p, bak); (p, bak)
        }
        // version listings deliberately ignore compacted files, so the
        // anchor must be explicit once every commit is hidden
        try DeltaRead.readVersion(spark, t, head).orderBy($"id").collect().toSeq
        finally hidden.foreach { case (p, bak) => Files.move(bak, p) }
      }
      assert(viaCompact == DeltaRead.read(spark, t).orderBy($"id").collect().toSeq)
      assert(DeltaRead.snapshot(spark, t).txns.get("app-x").contains(7L))
    } finally cleanup(t)
  }

  test("a compaction never leaks outside its range or under a checkpoint") {
    val t = newTable()
    try {
      val head = buildHistory(t)
      DeltaWrite.compactLog(t, 0L, head)
      // snapshotAt(head-1): the 0..head compaction overshoots and must
      // be IGNORED — v6's append must not appear at version 5
      val at5 = DeltaRead.snapshotAt(spark, t, 5L)
      assert(!DeltaRead.read(spark, t).where($"id" === 6L).isEmpty)
      assert(at5.files.size ==
        DeltaRead.snapshotAt(spark, t, head).files.size - 1)
      // with a checkpoint past the range, resolution starts above it
      // and the stale compaction is structurally unreachable
      DeltaWrite.append(Seq((7L, "g")).toDF("id", "s"), t) // v7
      DeltaWrite.checkpoint(spark, t)
      DeltaWrite.append(Seq((8L, "h")).toDF("id", "s"), t) // v8
      val s = DeltaRead.snapshot(spark, t)
      assert(s.files.nonEmpty &&
        DeltaRead.read(spark, t).count() == 7L) // 6 live (one deleted) + 7,8 → 7 rows
      // two compactions share a start (0..6, 0..2): a target inside
      // the long span takes the SHORT one that fits — prove it by
      // hiding the short range's commits and resolving version 2
      DeltaWrite.compactLog(t, 0L, 2L)
      val want2 = essence(t, 2L)
      val hidden = (0L to 2L).map { v =>
        val p = Paths.get(t, "_delta_log", f"$v%020d.json")
        val bak = Paths.get(t, "_delta_log", f"hidden-$v")
        Files.move(p, bak); (p, bak)
      }
      try assert(essence(t, 2L) == want2,
        "the fitting short-span compaction must be taken")
      finally hidden.foreach { case (p, bak) => Files.move(bak, p) }
    } finally cleanup(t)
  }

  test("graft.logCompaction.interval auto-compacts every Nth commit") {
    val t = newTable()
    try {
      DeltaWrite.append(Seq((0L, "z")).toDF("id", "s"), t)              // v0
      DeltaWrite.setProperties(spark, t,
        Map("graft.logCompaction.interval" -> "4"))                     // v1
      (1 to 6).foreach(i =>
        DeltaWrite.append(Seq((i.toLong, s"r$i")).toDF("id", "s"), t))  // v2..v7
      val ld = Paths.get(t, "_delta_log")
      assert(Files.exists(ld.resolve(
        "00000000000000000000.00000000000000000003.compacted.json")))
      assert(Files.exists(ld.resolve(
        "00000000000000000004.00000000000000000007.compacted.json")))
      // the two spans chain: resolution works with EVERY commit hidden
      val want = DeltaRead.read(spark, t).orderBy($"id").collect().toSeq
      val hidden = (0L to 7L).map { v =>
        val p = ld.resolve(f"$v%020d.json"); val b = ld.resolve(f"hidden-$v")
        Files.move(p, b); (p, b)
      }
      try assert(DeltaRead.readVersion(spark, t, 7L)
        .orderBy($"id").collect().toSeq == want)
      finally hidden.foreach { case (p, b) => Files.move(b, p) }
    } finally cleanup(t)
  }
}
