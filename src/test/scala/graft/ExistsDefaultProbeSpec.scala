package graft

import org.apache.spark.sql.types._
import java.nio.file.Files

/** Probe: does Spark's parquet reader serve a column missing from the
  * file as its EXISTS_DEFAULT metadata value (not null) when the read
  * schema carries the key? This is the mechanism ADD COLUMN DEFAULT's
  * read side rides — pinned here so a Spark upgrade that changes the
  * contract fails loudly. */
class ExistsDefaultProbeSpec extends SparkTestBase {
  import spark.implicits._

  test("read schema EXISTS_DEFAULT fills file-missing columns; file-present nulls stay null") {
    val dir = Files.createTempDirectory("existsdefault").toString
    try {
      // old file: no 'score' column
      Seq((1L, "a"), (2L, "b")).toDF("id", "txt")
        .write.parquet(s"$dir/old")
      // new file: has 'score', one explicit null
      Seq((3L, "c", Some(9.5)), (4L, "d", None: Option[Double]))
        .toDF("id", "txt", "score").write.parquet(s"$dir/new")
      val meta = new MetadataBuilder()
        .putString("CURRENT_DEFAULT", "2.5")
        .putString("EXISTS_DEFAULT", "2.5").build()
      val sch = StructType(Seq(
        StructField("id", LongType), StructField("txt", StringType),
        StructField("score", DoubleType, nullable = true, meta)))
      val got = spark.read.schema(sch)
        .parquet(s"$dir/old", s"$dir/new")
        .select($"id", $"score").as[(Long, Option[Double])].collect().toMap
      assert(got(1L).contains(2.5) && got(2L).contains(2.5),
        s"pre-add rows must serve the default, got $got")
      assert(got(3L).contains(9.5), s"present values must pass through, got $got")
      assert(got(4L).isEmpty, s"an explicit null in a post-add file must stay null, got $got")
    } finally org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }
}
