package graft

import graft.io.DeltaRead
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** The read-only `_delta_log` reader against hand-authored fixtures
  * that follow the public Delta protocol: JSON commits (add / remove /
  * metaData actions), time travel by replay, partition-column
  * re-attachment from partitionValues, and checkpoint-then-tail
  * resolution (proven by deleting the pre-checkpoint JSON). */
class DeltaReadSpec extends SparkTestBase {
  import spark.implicits._

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  private def newTable(): String =
    Files.createTempDirectory("deltaread").toString

  private def cleanup(t: String): Unit =
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(t))

  /** Write one spark DataFrame as a single parquet file at
    * `table/relPath`, creating parent dirs. */
  private def writeDataFile(df: org.apache.spark.sql.DataFrame,
      table: String, relPath: String): Unit = {
    val staged = Files.createTempDirectory("deltastage").toString
    df.coalesce(1).write.mode("overwrite").parquet(staged)
    val part = new java.io.File(staged).listFiles()
      .find(_.getName.endsWith(".parquet")).get
    val dest = Paths.get(table, relPath)
    Files.createDirectories(dest.getParent)
    Files.move(part.toPath, dest)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(staged))
  }

  private def metaAction(schemaJson: String, partCols: Seq[String]): String = {
    val root = mapper.createObjectNode()
    val meta = root.putObject("metaData")
    meta.put("id", "fixture").put("schemaString", schemaJson)
    val pc = meta.putArray("partitionColumns")
    partCols.foreach(pc.add)
    mapper.writeValueAsString(root)
  }

  private def addAction(path: String, pv: Map[String, String] = Map.empty): String = {
    val root = mapper.createObjectNode()
    val add = root.putObject("add")
    add.put("path", path).put("dataChange", true)
    val pvN = add.putObject("partitionValues")
    pv.foreach { case (k, v) => pvN.put(k, v) }
    mapper.writeValueAsString(root)
  }

  private def removeAction(path: String): String = {
    val root = mapper.createObjectNode()
    root.putObject("remove").put("path", path)
    mapper.writeValueAsString(root)
  }

  private def writeCommit(table: String, v: Long, actions: Seq[String]): Unit = {
    val ld = Paths.get(table, "_delta_log")
    Files.createDirectories(ld)
    Files.write(ld.resolve(f"$v%020d.json"), actions.asJava)
  }

  test("add/remove replay: head sees live files only; time travel replays to any version") {
    val t = newTable()
    try {
      val a = (1 to 10).map(i => (i.toLong, s"a$i")).toDF("id", "v")
      val b = (11 to 30).map(i => (i.toLong, s"b$i")).toDF("id", "v")
      writeDataFile(a, t, "part-a.parquet")
      writeDataFile(b, t, "part-b.parquet")
      writeCommit(t, 0, Seq(metaAction(a.schema.json, Nil), addAction("part-a.parquet")))
      writeCommit(t, 1, Seq(addAction("part-b.parquet")))
      writeCommit(t, 2, Seq(removeAction("part-a.parquet")))
      assert(DeltaRead.latestVersion(t) == 2L)
      assert(DeltaRead.read(spark, t).agg(sum($"id")).collect()(0).getLong(0) ==
        (11 to 30).sum.toLong, "head must exclude the removed file")
      assert(DeltaRead.readVersion(spark, t, 1).count() == 30, "v1 = both files")
      assert(DeltaRead.readVersion(spark, t, 0).count() == 10, "v0 = first file")
    } finally cleanup(t)
  }

  test("staged-but-unreferenced files are invisible (snapshot semantics)") {
    val t = newTable()
    try {
      val a = (1 to 10).map(i => (i.toLong, "x")).toDF("id", "v")
      writeDataFile(a, t, "part-a.parquet")
      writeDataFile(a, t, "part-orphan.parquet") // no add action anywhere
      writeCommit(t, 0, Seq(metaAction(a.schema.json, Nil), addAction("part-a.parquet")))
      assert(DeltaRead.read(spark, t).count() == 10)
    } finally cleanup(t)
  }

  test("partitioned table: partition columns re-attach from the log with schema types") {
    val t = newTable()
    try {
      // Delta does not store partition columns inside the data files —
      // write them WITHOUT the column, declare them via partitionValues
      val es = (1 to 5).map(i => (i.toLong, s"e$i")).toDF("id", "v")
      val fr = (6 to 9).map(i => (i.toLong, s"f$i")).toDF("id", "v")
      writeDataFile(es, t, "cc=ES/part-0.parquet")
      writeDataFile(fr, t, "cc=FR/part-0.parquet")
      val full = es.withColumn("cc", lit("ES")) // schema INCLUDES the partition col
      writeCommit(t, 0, Seq(
        metaAction(full.schema.json, Seq("cc")),
        addAction("cc=ES/part-0.parquet", Map("cc" -> "ES")),
        addAction("cc=FR/part-0.parquet", Map("cc" -> "FR"))))
      val got = DeltaRead.read(spark, t)
      assert(got.columns.toSet == Set("id", "v", "cc"))
      assert(got.groupBy($"cc").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap == Map("ES" -> 5L, "FR" -> 4L))
      // partition value carries the schemaString type
      assert(got.schema("cc").dataType == org.apache.spark.sql.types.StringType)
    } finally cleanup(t)
  }

  test("checkpoint-then-tail: reader starts at the checkpoint even with the JSON prefix gone") {
    val t = newTable()
    try {
      val a = (1 to 10).map(i => (i.toLong, "a")).toDF("id", "v")
      val b = (11 to 20).map(i => (i.toLong, "b")).toDF("id", "v")
      val c = (21 to 25).map(i => (i.toLong, "c")).toDF("id", "v")
      writeDataFile(a, t, "part-a.parquet")
      writeDataFile(b, t, "part-b.parquet")
      writeDataFile(c, t, "part-c.parquet")
      writeCommit(t, 0, Seq(metaAction(a.schema.json, Nil), addAction("part-a.parquet")))
      writeCommit(t, 1, Seq(addAction("part-b.parquet"), removeAction("part-a.parquet")))
      // checkpoint at v1: live state = {part-b}, one action per row
      val cpRows = Seq(
        (Some(("part-b.parquet", Map.empty[String, String])), None: Option[(String, Seq[String])]),
        (None, Some((a.schema.json, Seq.empty[String]))))
        .toDF("addRaw", "metaRaw")
        .select(
          when($"addRaw".isNotNull,
            struct($"addRaw._1".as("path"), $"addRaw._2".as("partitionValues"))).as("add"),
          when($"metaRaw".isNotNull,
            struct($"metaRaw._1".as("schemaString"),
              $"metaRaw._2".as("partitionColumns"))).as("metaData"))
      // single-file checkpoint at the protocol name
      val stagedDir = Files.createTempDirectory("cpstage").toString
      cpRows.coalesce(1).write.mode("overwrite").parquet(stagedDir)
      val partFile = new java.io.File(stagedDir).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      Files.move(partFile.toPath,
        Paths.get(t, "_delta_log", f"${1L}%020d.checkpoint.parquet"))
      Files.write(Paths.get(t, "_delta_log", "_last_checkpoint"),
        Seq("""{"version":1,"size":2}""").asJava)
      // tail after the checkpoint
      writeCommit(t, 2, Seq(addAction("part-c.parquet")))
      // delete the pre-checkpoint JSON: replay-from-zero is now impossible,
      // so a correct read PROVES the checkpoint path is taken
      Files.delete(Paths.get(t, "_delta_log", f"${0L}%020d.json"))
      Files.delete(Paths.get(t, "_delta_log", f"${1L}%020d.json"))
      val got = DeltaRead.read(spark, t)
      assert(got.count() == 15, "checkpoint live set {b} + tail add {c}")
      assert(got.agg(sum($"id")).collect()(0).getLong(0) ==
        ((11 to 20) ++ (21 to 25)).sum.toLong)
    } finally cleanup(t)
  }
}
