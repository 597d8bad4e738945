package graft

import graft.io.{DeltaRead, DeltaWrite}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** AUTO OPTIMIZE (`delta.autoOptimize.optimizeWrite` /
  * `delta.autoOptimize.autoCompact`, honored as real writer behavior):
  * optimizeWrite right-sizes a batch's file count BEFORE staging (a
  * many-task tiny append lands as one file per partition), autoCompact
  * follows an append with an OPTIMIZE over exactly the touched
  * partitions once one crosses the small-file threshold — and a failed
  * follow-on never turns a committed append into an error. The
  * small-files discipline at 100 TB, driven by table properties a
  * Databricks-authored table already carries. */
class AutoOptimizeSpec extends SparkTestBase {
  import spark.implicits._

  private def newTable(): String =
    Files.createTempDirectory("autoopt").toString

  private def cleanup(t: String): Unit =
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(t))

  test("optimizeWrite coalesces a many-task tiny append to one file per partition") {
    val t = newTable()
    try {
      val df = (1 to 60).map(i => (i.toLong, (i % 3).toString)).toDF("id", "p")
      DeltaWrite.append(df.repartition(16), t, partitionBy = Seq("p")) // v0: no property yet
      val v0Files = DeltaRead.snapshot(spark, t).files.size
      assert(v0Files > 3, s"without the property a 16-task append fragments: $v0Files")
      DeltaWrite.setProperties(spark, t,
        Map("delta.autoOptimize.optimizeWrite" -> "true"))
      DeltaWrite.append(df.repartition(16), t, partitionBy = Seq("p"))
      val added = DeltaRead.snapshot(spark, t).files.size - v0Files
      assert(added == 3,
        s"optimizeWrite must land one file per touched partition, added $added")
      assert(DeltaRead.read(spark, t).count() == 120)
    } finally cleanup(t)
  }

  test("optimizeWrite never reshapes an explicitly laid-out (z-ordered) batch") {
    val t = newTable()
    try {
      DeltaWrite.append(Seq((0L, 0L)).toDF("x", "y"), t)
      DeltaWrite.setProperties(spark, t,
        Map("delta.autoOptimize.optimizeWrite" -> "true"))
      val before = DeltaRead.snapshot(spark, t).files.size
      val df = (1 to 400).map(i => (i.toLong, (i * 7 % 400).toLong)).toDF("x", "y")
      DeltaWrite.appendZOrdered(df, t, Seq("x", "y"), numFiles = 4)
      val added = DeltaRead.snapshot(spark, t).files.size - before
      assert(added == 4,
        s"the z-ordered layout (4 range files) must survive optimizeWrite, added $added")
    } finally cleanup(t)
  }

  test("autoCompact also follows row rewrites: merge inserts trip the pass") {
    val t = newTable()
    try {
      DeltaWrite.append(
        Seq((1L, "0"), (2L, "1")).toDF("id", "p").coalesce(1),
        t, partitionBy = Seq("p"))
      DeltaWrite.setProperties(spark, t, Map(
        "delta.autoOptimize.autoCompact" -> "true",
        "graft.autoCompact.minNumFiles" -> "3"))
      // three merges, each inserting fresh keys into p=1 only
      (1 to 3).foreach(k => DeltaWrite.merge(spark, t,
        Seq((100L + k, "1")).toDF("id", "p"), Seq("id")))
      val p1 = DeltaRead.snapshot(spark, t).files
        .filter(_.partitionValues.get("p").contains("1"))
      assert(p1.size <= 3,
        s"merge-fed partition must stay at the compaction floor, got ${p1.size}")
      assert(DeltaRead.history(t).flatMap(_._3).contains("OPTIMIZE"),
        "a merge past the threshold must trigger the follow-on OPTIMIZE")
      assert(DeltaRead.read(spark, t).count() == 5)
    } finally cleanup(t)
  }

  test("parseByteSize accepts bytes and kb/mb/gb; refuses garbage") {
    assert(DeltaWrite.parseByteSize("134217728") == 128L << 20)
    assert(DeltaWrite.parseByteSize("128mb") == 128L << 20)
    assert(DeltaWrite.parseByteSize("4KB") == 4096L)
    assert(DeltaWrite.parseByteSize("1gb") == 1L << 30)
    assert(DeltaWrite.parseByteSize("77b") == 77L)
    intercept[IllegalArgumentException](DeltaWrite.parseByteSize("fast"))
    // a negative, zero, or Long-overflowing size would silently disable
    // optimizeWrite sizing — refused as loudly as garbage
    intercept[IllegalArgumentException](DeltaWrite.parseByteSize("-5mb"))
    intercept[IllegalArgumentException](DeltaWrite.parseByteSize("0"))
    intercept[IllegalArgumentException](DeltaWrite.parseByteSize("99999999999gb"))
  }

  test("autoCompact refuses a non-positive minNumFiles loudly") {
    val t = newTable()
    try {
      DeltaWrite.append(Seq((1L, "0")).toDF("id", "p"), t, partitionBy = Seq("p"))
      DeltaWrite.setProperties(spark, t, Map(
        "delta.autoOptimize.autoCompact" -> "true",
        "graft.autoCompact.minNumFiles" -> "0"))
      val e = intercept[IllegalArgumentException](DeltaWrite.append(
        Seq((2L, "0")).toDF("id", "p"), t, partitionBy = Seq("p")))
      assert(e.getMessage.contains("minNumFiles"))
    } finally cleanup(t)
  }

  test("optimizeWrite splits an oversized single Hive partition across tasks") {
    val t = newTable()
    try {
      DeltaWrite.append(Seq((0L, "0", "x")).toDF("id", "p", "pad"), t,
        partitionBy = Seq("p"))
      // one partition whose PLAN estimate (~200 rows × schema-default
      // widths ≈ 11 KB, × the parquet factor) spans several 1 KB target
      // files: the unsalted shape would emit a single oversized file;
      // the salt lets the partition split toward
      // ceil(partitionBytes/target) files
      DeltaWrite.setProperties(spark, t, Map(
        "delta.autoOptimize.optimizeWrite" -> "true",
        "delta.targetFileSize" -> "1kb"))
      val pad = "abcdefghij" * 100
      val df = (1 to 200).map(i => (i.toLong, "1", pad + i)).toDF("id", "p", "pad")
      val before = DeltaRead.snapshot(spark, t).files.size
      DeltaWrite.append(df.repartition(8), t, partitionBy = Seq("p"))
      val p1 = DeltaRead.snapshot(spark, t).files
        .filter(_.partitionValues.get("p").contains("1"))
      assert(p1.size > 1,
        s"a partition estimated far above targetFileSize must split, got ${p1.size} file(s)")
      assert(DeltaRead.read(spark, t).where($"p" === "1").count() == 200)
    } finally cleanup(t)
  }

  test("optimizeWrite salt skips map columns (Spark 4 refuses hash on MapType)") {
    val t = newTable()
    try {
      DeltaWrite.append(
        Seq((0L, "0", Map("k" -> "v"))).toDF("id", "p", "m"), t,
        partitionBy = Seq("p"))
      DeltaWrite.setProperties(spark, t, Map(
        "delta.autoOptimize.optimizeWrite" -> "true",
        "delta.targetFileSize" -> "1kb"))
      // one Hive partition far above targetFileSize, schema carrying a
      // MapType: the split-salt must build from the hashable columns
      // only — hash() over the map would throw AnalysisException and
      // fail an append that wrote fine unsalted
      val pad = "abcdefghij" * 100
      val df = (1 to 200).map(i => (i.toLong, "1", Map("pad" -> (pad + i))))
        .toDF("id", "p", "m")
      val before = DeltaRead.snapshot(spark, t).files.size
      DeltaWrite.append(df.repartition(8), t, partitionBy = Seq("p"))
      val p1 = DeltaRead.snapshot(spark, t).files
        .filter(_.partitionValues.get("p").contains("1"))
      assert(p1.size > 1,
        s"the non-map salt must still split the oversized partition: ${p1.size}")
      assert(DeltaRead.read(spark, t).where($"p" === "1").count() == 200)
      assert(before >= 1)
    } finally cleanup(t)
  }

  test("autoCompact OPTIMIZEs exactly the touched partition at the threshold") {
    val t = newTable()
    try {
      DeltaWrite.append(
        (1 to 10).map(i => (i.toLong, (i % 2).toString)).toDF("id", "p")
          .coalesce(1),
        t, partitionBy = Seq("p"))
      DeltaWrite.setProperties(spark, t, Map(
        "delta.autoOptimize.autoCompact" -> "true",
        "graft.autoCompact.minNumFiles" -> "5"))
      val p0Before = DeltaRead.snapshot(spark, t).files
        .filter(_.partitionValues.get("p").contains("0")).map(_.path).toSet
      // feed ONLY p=1 with small appends until the threshold trips
      (1 to 5).foreach(k => DeltaWrite.append(
        Seq((100L + k, "1")).toDF("id", "p"), t, partitionBy = Seq("p")))
      val s = DeltaRead.snapshot(spark, t)
      val p1 = s.files.filter(_.partitionValues.get("p").contains("1"))
      val p0 = s.files.filter(_.partitionValues.get("p").contains("0"))
      // the threshold trips at the 4th append (1 seed + 4 small = 5);
      // that pass folds p=1 to one file, the 5th append adds one more —
      // steady state never exceeds minNumFiles
      assert(p1.size == 2,
        s"p=1 must be {compacted file, newest append}, got ${p1.map(_.path)}")
      assert(p1.exists(_.stats.exists(_.contains("\"numRecords\":9"))),
        s"one of p=1's files must be the 9-row compaction output: ${p1.map(_.stats)}")
      assert(p0.map(_.path).toSet == p0Before,
        s"p=0 was never touched and must keep its exact file set")
      // the pass is its own commit with the OPTIMIZE operation marker
      val ops = DeltaRead.history(t).flatMap(_._3)
      assert(ops.contains("OPTIMIZE"), s"expected an OPTIMIZE commit in $ops")
      val got = DeltaRead.read(spark, t)
      assert(got.count() == 15 && got.where($"p" === "1").count() == 10,
        "auto compaction must preserve every row")
    } finally cleanup(t)
  }
}
