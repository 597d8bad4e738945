package graft

import java.nio.file.{Files, Paths}
import java.nio.file.attribute.FileTime

import org.apache.spark.sql.functions._

import graft.io.{DeltaRead, DeltaWrite}

/** Idempotent bulk ingestion ([[DeltaWrite.copyInto]] + the SQL
  * `COPY INTO` door): re-runs load nothing, late-arriving files load
  * exactly once, the mtime-watermark + tie-set ledger stays O(1), and
  * FORCE / PATTERN behave as documented. */
class CopyIntoSpec extends SparkTestBase {
  import spark.implicits._

  private def newDir(): String = Files.createTempDirectory("copyinto").toString
  private def cleanup(t: String): Unit =
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(t))

  /** Write `rows` as ONE parquet file named `name` under `dir`. */
  private def dropFile(dir: String, name: String, from: Long, to: Long): Unit = {
    val tmp = Files.createTempDirectory("copydrop").toString
    (from to to).toDF("id").coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = Files.list(Paths.get(tmp)).iterator()
    val src = {
      var found: java.nio.file.Path = null
      while (part.hasNext) {
        val p = part.next()
        if (p.getFileName.toString.endsWith(".parquet")) found = p
      }
      found
    }
    Files.createDirectories(Paths.get(dir))
    Files.copy(src, Paths.get(dir, name))
    cleanup(tmp)
  }

  test("copy, re-copy no-op, late file loads once, force reloads") {
    val srcDir = newDir(); val t = newDir() + "/t"
    try {
      dropFile(srcDir, "a.parquet", 1, 10)
      dropFile(srcDir, "b.parquet", 11, 20)
      DeltaWrite.createEmpty(spark, t,
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("id",
            org.apache.spark.sql.types.LongType))))
      val r1 = DeltaWrite.copyInto(spark, t, srcDir)
      assert(r1.filesLoaded == 2 && r1.rowsLoaded == 20)
      assert(DeltaRead.read(spark, t).count() == 20)
      // exact idempotency: nothing new → NO commit at all
      val v = DeltaRead.latestVersion(t)
      val r2 = DeltaWrite.copyInto(spark, t, srcDir)
      assert(r2.filesLoaded == 0 && r2.version.isEmpty)
      assert(DeltaRead.latestVersion(t) == v, "a no-op copy must not commit")
      // a file arriving later loads exactly once
      Thread.sleep(5)
      dropFile(srcDir, "c.parquet", 21, 30)
      val r3 = DeltaWrite.copyInto(spark, t, srcDir)
      assert(r3.filesLoaded == 1 && r3.rowsLoaded == 10)
      assert(DeltaRead.read(spark, t).count() == 30)
      assert(DeltaWrite.copyInto(spark, t, srcDir).filesLoaded == 0)
      // FORCE re-ingests everything listed
      val rf = DeltaWrite.copyInto(spark, t, srcDir, force = true)
      assert(rf.filesLoaded == 3)
      assert(DeltaRead.read(spark, t).count() == 60)
    } finally { cleanup(srcDir); cleanup(Paths.get(t).getParent.toString) }
  }

  test("tie at the watermark loads; below-watermark skip is the documented trade") {
    val srcDir = newDir(); val t = newDir() + "/t"
    try {
      dropFile(srcDir, "a.parquet", 1, 10)
      DeltaWrite.createEmpty(spark, t,
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("id",
            org.apache.spark.sql.types.LongType))))
      assert(DeltaWrite.copyInto(spark, t, srcDir).filesLoaded == 1)
      val wm = Files.getLastModifiedTime(Paths.get(srcDir, "a.parquet"))
      // a new file with the SAME mtime as the watermark: the tie set
      // knows a.parquet but not b.parquet — b must load
      dropFile(srcDir, "b.parquet", 11, 20)
      Files.setLastModifiedTime(Paths.get(srcDir, "b.parquet"), wm)
      val r = DeltaWrite.copyInto(spark, t, srcDir)
      assert(r.filesLoaded == 1, "same-mtime-as-watermark file must load")
      assert(DeltaWrite.copyInto(spark, t, srcDir).filesLoaded == 0,
        "and only once")
      // the documented trade: a file backdated BELOW the watermark is
      // treated as already-loaded (force is the recovery door)
      dropFile(srcDir, "old.parquet", 21, 30)
      Files.setLastModifiedTime(Paths.get(srcDir, "old.parquet"),
        FileTime.fromMillis(wm.toMillis - 60000))
      assert(DeltaWrite.copyInto(spark, t, srcDir).filesLoaded == 0)
    } finally { cleanup(srcDir); cleanup(Paths.get(t).getParent.toString) }
  }

  test("PATTERN filters; hidden files and schema drift refuse correctly") {
    val srcDir = newDir(); val t = newDir() + "/t"
    try {
      dropFile(srcDir, "keep.parquet", 1, 10)
      dropFile(srcDir, "skip.dat.parquet", 11, 20)
      dropFile(srcDir, "_hidden.parquet", 21, 30)
      DeltaWrite.createEmpty(spark, t,
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("id",
            org.apache.spark.sql.types.LongType))))
      val r = DeltaWrite.copyInto(spark, t, srcDir,
        pattern = Some("keep.parquet"))
      assert(r.filesLoaded == 1 && r.rowsLoaded == 10)
      // no pattern: the non-matching visible file loads now, the
      // underscore-prefixed one never does
      val r2 = DeltaWrite.copyInto(spark, t, srcDir)
      assert(r2.filesLoaded == 1 && r2.rowsLoaded == 10)
      // drift refuses through the normal append gate
      val bad = newDir()
      (1 to 3).map(i => (i, s"x$i")).toDF("id", "extra")
        .coalesce(1).write.parquet(bad + "/p")
      val e = intercept[Exception](
        DeltaWrite.copyInto(spark, t, bad + "/p"))
      assert(e.getMessage.contains("drift"))
      cleanup(bad)
    } finally { cleanup(srcDir); cleanup(Paths.get(t).getParent.toString) }
  }

  test("csv and json load under the committed schema; Delta source refuses") {
    val srcDir = newDir(); val t = newDir() + "/t"
    try {
      Files.write(Paths.get(srcDir, "a.csv"),
        "id,name\n1,alpha\n2,beta\n".getBytes("UTF-8"))
      Files.write(Paths.get(srcDir, "b.json"),
        """{"id": 3, "name": "gamma"}""".getBytes("UTF-8"))
      DeltaWrite.createEmpty(spark, t,
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("id",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("name",
            org.apache.spark.sql.types.StringType))))
      // csv: header matched, values typed by the COMMITTED schema
      val rc = DeltaWrite.copyInto(spark, t, srcDir, format = "csv",
        pattern = Some("*.csv"))
      assert(rc.filesLoaded == 1 && rc.rowsLoaded == 2)
      // json: same table, same schema discipline
      val rj = DeltaWrite.copyInto(spark, t, srcDir, format = "json",
        pattern = Some("*.json"))
      assert(rj.filesLoaded == 1 && rj.rowsLoaded == 1)
      val rows = DeltaRead.read(spark, t).orderBy("id").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSeq
      assert(rows == Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma")))
      // copying FROM a Delta table refuses loudly (dead versions)
      val e = intercept[IllegalArgumentException](
        DeltaWrite.copyInto(spark, t, t))
      assert(e.getMessage.contains("Delta table"))
    } finally { cleanup(srcDir); cleanup(Paths.get(t).getParent.toString) }
  }

  test("clone-replace tombstones the COPY INTO ledger: files reload") {
    val srcDir = newDir(); val t = newDir() + "/t"; val o = newDir() + "/o"
    try {
      dropFile(srcDir, "a.parquet", 1, 10)
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id",
          org.apache.spark.sql.types.LongType)))
      DeltaWrite.createEmpty(spark, t, schema)
      assert(DeltaWrite.copyInto(spark, t, srcDir).filesLoaded == 1)
      // an (empty) other table replaces t wholesale — the ledger now
      // describes content the table no longer holds, so the replace
      // must tombstone it or the next copy silently skips a.parquet
      DeltaWrite.createEmpty(spark, o, schema)
      DeltaWrite.shallowClone(spark, o, t, replace = true)
      assert(DeltaRead.read(spark, t).count() == 0)
      val r = DeltaWrite.copyInto(spark, t, srcDir)
      assert(r.filesLoaded == 1,
        "a replaced table's stale copy ledger must not suppress reloads")
      assert(DeltaRead.read(spark, t).count() == 10)
    } finally {
      cleanup(srcDir); cleanup(Paths.get(t).getParent.toString)
      cleanup(Paths.get(o).getParent.toString)
    }
  }

  test("SQL door: COPY INTO ... FILEFORMAT = PARQUET is idempotent") {
    val srcDir = newDir()
    val wh = graft.io.Staging.tempDir("graft_copy_cat")
    spark.conf.set("spark.sql.catalog.gcopy",
      classOf[graft.io.v2.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gcopy.warehouse", wh)
    try {
      dropFile(srcDir, "a.parquet", 1, 25)
      spark.sql("CREATE TABLE gcopy.t (id BIGINT) USING `graft-delta`")
      val r = spark.sql(
        s"COPY INTO gcopy.t FROM '$srcDir' FILEFORMAT = PARQUET").collect().head
      assert(r.getInt(2) == 1 && r.getLong(3) == 25L)
      val again = spark.sql(
        s"COPY INTO gcopy.t FROM '$srcDir' FILEFORMAT = PARQUET").collect().head
      assert(again.getInt(2) == 0 && again.isNullAt(1))
      assert(spark.sql("SELECT count(*) FROM gcopy.t").head.getLong(0) == 25)
      // FORCE = true duplicates deliberately
      val f = spark.sql(s"COPY INTO gcopy.t FROM '$srcDir' " +
        "FILEFORMAT = PARQUET FORCE = true").collect().head
      assert(f.getInt(2) == 1)
      assert(spark.sql("SELECT count(*) FROM gcopy.t").head.getLong(0) == 50)
    } finally {
      spark.sql("DROP TABLE IF EXISTS gcopy.t")
      cleanup(srcDir); cleanup(wh)
    }
  }
}
