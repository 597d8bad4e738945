package graft

import graft.clean.Cleaner
import graft.functions.NativeHelpers
import graft.io.{FileBackedSource, Ingest, Sinks, Volumetry}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

class IoCleanerSpec extends SparkTestBase {
  import spark.implicits._

  test("paged ingestion: file-backed source, partition-per-page, schema coercion") {
    val tmp = java.nio.file.Files.createTempFile("graft_pages", ".jsonl")
    val rows = (1 to 25).map(i => s"""{"id": $i, "name": "row$i"}""")
    java.nio.file.Files.writeString(tmp, rows.mkString("\n"))
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType)))
    val df = Ingest.ingest(spark, new FileBackedSource(tmp.toString),
      numPages = 5, pageSize = 10, schema = schema)
    assert(df.count() == 25)
    assert(df.agg(sum($"id")).collect()(0).getLong(0) == 325)
  }

  test("DSv2 graft-paged source: partition-per-page, probe, parse parity with Ingest") {
    val tmp = java.nio.file.Files.createTempFile("graft_dsv2", ".jsonl")
    val rows = (1 to 103).map(i => s"""{"id": $i, "name": "row$i"}""")
    java.nio.file.Files.writeString(tmp, rows.mkString("\n"))
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType)))

    // short-name registration + explicit numPages
    val raw = spark.read.format("graft-paged")
      .option("path", tmp.toString).option("pageSize", "10").option("numPages", "11")
      .load()
    assert(raw.rdd.getNumPartitions == 11, "one InputPartition per page")
    val typed = raw.select(from_json($"json", schema).as("r")).select("r.*")
    assert(typed.count() == 103)
    assert(typed.agg(sum($"id")).collect()(0).getLong(0) == 103L * 104 / 2)

    // stop-on-empty probe: numPages omitted -> ceil(103/10) = 11 pages
    val probed = spark.read.format("graft-paged")
      .option("path", tmp.toString).option("pageSize", "10").load()
    assert(probed.rdd.getNumPartitions == 11, "probe must find ceil(103/10) pages")
    assert(probed.count() == 103)

    // parity with the flatMap-based Ingest path
    val viaIngest = Ingest.ingest(spark, new FileBackedSource(tmp.toString),
      numPages = 11, pageSize = 10, schema = schema)
    assert(typed.exceptAll(viaIngest).count() == 0 && viaIngest.exceptAll(typed).count() == 0)

    // probe edge: empty file -> zero partitions, zero rows
    val empty = java.nio.file.Files.createTempFile("graft_dsv2_empty", ".jsonl")
    val e = spark.read.format("graft-paged")
      .option("path", empty.toString).option("pageSize", "10").load()
    assert(e.count() == 0)
  }

  test("bucketed tables join with zero exchanges (co-located join layout)") {
    val orders = Tables.orders(spark, sf).select($"o_orderkey", $"o_totalprice")
    val lineitem = Tables.lineitem(spark, sf).select($"l_orderkey", $"l_extendedprice")
    Sinks.parquetBucketed(orders, "b_orders", Seq("o_orderkey"), 8)
    Sinks.parquetBucketed(lineitem, "b_lineitem", Seq("l_orderkey"), 8)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force the shuffle path
      val joined = spark.table("b_orders")
        .join(spark.table("b_lineitem"), $"o_orderkey" === $"l_orderkey")
        .groupBy($"o_orderkey")
        .agg(sum($"l_extendedprice").as("rev"))
      val plan = joined.queryExecution.executedPlan.toString
      // the join itself must be exchange-free: the only permitted
      // exchange would come AFTER the join (none here — the aggregate
      // key is the bucket key, so even that reuses the layout)
      assert(!plan.contains("Exchange"), s"unexpected shuffle in bucketed join plan:\n$plan")
      assert(joined.count() == orders.join(lineitem, $"o_orderkey" === $"l_orderkey")
        .groupBy($"o_orderkey").agg(sum($"l_extendedprice")).count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }

  test("dropAllNullColumns keeps populated, drops empty") {
    val df = Seq((1, Option.empty[String], "x"), (2, Option.empty[String], "y"))
      .toDF("a", "empty", "c")
    assert(Ingest.dropAllNullColumns(df).columns.toSeq == Seq("a", "c"))
  }

  test("coerceTo adds missing columns as typed nulls and casts present ones") {
    val df = Seq(("1", "x")).toDF("id", "name")
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("name", StringType), StructField("extra", DoubleType)))
    val out = Ingest.coerceTo(df, schema)
    assert(out.schema == schema)
    assert(out.collect()(0).getLong(0) == 1L)
    assert(out.collect()(0).isNullAt(2))
  }

  test("cleaner pipeline: pk filter + sentinel nulls + dedup latest") {
    val df = Seq(
      (Some(1L), "click", 10.0), (Some(1L), "view", 20.0),
      (None, "error", 0.0), (Some(2L), "N/A", 5.0))
      .toDF("event_id", "event_type", "value")
      .withColumn("ts", timestamp_seconds(lit(1704067200L) + $"value"))
    val out = Cleaner.pipeline(
      Cleaner.filterValidPk("event_id"),
      Cleaner.normalizeNulls(Seq("event_type")),
      Cleaner.dedupLatest("event_id", "ts"),
      Cleaner.fillStringDefaults(Map("event_type" -> "unknown")))(df)
    val rows = out.orderBy("event_id").collect()
    assert(rows.length == 2)
    assert(rows(0).getString(1) == "view")      // latest by ts for id 1
    assert(rows(1).getString(1) == "unknown")   // sentinel 'N/A' -> filled
  }

  test("conflict-skip insert SQL text") {
    assert(Sinks.insertSql("t", Seq("a", "b"), Seq("a")) ==
      "INSERT INTO t (a, b) VALUES (?, ?) ON CONFLICT (a) DO NOTHING")
  }

  test("volumetry report JSON is valid-ish and complete") {
    val json = Volumetry.reportJson(spark, sf)
    assert(json.contains("\"lineitem\"") && json.contains("table_counts")
      && json.contains("top10"))
  }

  test("word-boundary pattern: whole words only, escaped metacharacters") {
    import graft.functions.Classify
    val df = Seq("a join here", "conjoined words", "sort-of ok", "nothing").toDF("t")
    val got = df.filter($"t".rlike(Classify.wordBoundaryPattern(Seq("join", "sort"))))
      .collect().map(_.getString(0)).toSeq
    assert(got == Seq("a join here", "sort-of ok")) // \b matches at '-'; not inside "conjoined"
  }

  test("nestedToJsonStrings flattens struct/array columns to JSON text") {
    val df = Seq((1, Seq("a", "b"))).toDF("id", "tags")
    val out = Ingest.nestedToJsonStrings(df)
    assert(out.schema("tags").dataType == StringType)
    assert(out.collect()(0).getString(1) == """["a","b"]""")
  }

  test("multimodal fake decode is deterministic and within bounds") {
    import graft.operators.Multimodal
    val m1 = Multimodal.mediaTable(Tables.documents(spark, sf).limit(3), "text")
      .select("decoded.width", "decoded.height", "decoded.n_frames").collect()
    val m2 = Multimodal.mediaTable(Tables.documents(spark, sf).limit(3), "text")
      .select("decoded.width", "decoded.height", "decoded.n_frames").collect()
    assert(m1.toSeq == m2.toSeq)
    assert(m1.forall(r => r.getInt(0) >= 32 && r.getInt(1) >= 32 && r.getInt(2) >= 1))
  }

  test("native numeric helper: reference rules incl. mixed-format null") {
    def p(s: String): java.lang.Double = NativeHelpers.parse(UTF8String.fromString(s))
    assert(p("1.234,56") == 1234.56)
    assert(p("185,22") == 18522.0)
    assert(p("1,234.56") == null)
    assert(p("  42 ") == 42.0)
    assert(p("x") == null)
  }

  test("native repairJson keeps apostrophes inside words") {
    def r(s: String): String = NativeHelpers.repairJson(UTF8String.fromString(s)).toString
    assert(r("['Lee's team', 'b']") == "[\"Lee's team\", \"b\"]")
    assert(r("""["already", "fine"]""") == """["already", "fine"]""")
  }

  test("compact: many small files become few, data and schema survive the swap") {
    val dir = java.nio.file.Files.createTempDirectory("graft_compact").resolve("t").toString
    val df = Tables.orders(spark, sf).limit(2000)
    df.repartition(20).write.parquet(dir)
    val before = new java.io.File(dir).listFiles().count(_.getName.endsWith(".parquet"))
    assert(before == 20)
    val after = graft.io.Sinks.compact(spark, dir, targetBytes = 1L << 30)
    assert(after == 1, s"expected 1 compacted file, got $after")
    val back = spark.read.parquet(dir)
    assert(back.schema == df.schema)
    assert(back.exceptAll(df).count() == 0 && df.exceptAll(back).count() == 0)
  }

  test("z-ordered write: per-file ranges shrink on BOTH clustered columns") {
    val dir = java.nio.file.Files.createTempDirectory("graft_zorder").resolve("t").toString
    val df = Tables.orders(spark, sf).select($"o_custkey", $"o_totalprice")
    graft.io.Sinks.parquetZOrdered(df, dir, Seq("o_custkey", "o_totalprice"), numFiles = 8)
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.toString)
    assert(files.length >= 4, s"expected multiple files, got ${files.length}")
    def spanFraction(colName: String): Double = {
      val g = df.agg(max(col(colName)).cast("double") - min(col(colName)).cast("double"))
        .collect()(0).getDouble(0)
      val per = files.map { f =>
        val r = spark.read.parquet(f)
          .agg(max(col(colName)).cast("double") - min(col(colName)).cast("double"))
          .collect()(0).getDouble(0)
        r / g
      }
      per.sum / per.length
    }
    // a random layout gives ~1.0 per file on both; a single-column sort
    // gives ~1/numFiles on one and ~1.0 on the other; z-order shrinks both
    val fCust = spanFraction("o_custkey")
    val fPrice = spanFraction("o_totalprice")
    assert(fCust < 0.75 && fPrice < 0.75, f"per-file spans $fCust%.2f / $fPrice%.2f")
    // and the data round-trips
    val back = spark.read.parquet(dir)
    assert(back.exceptAll(df).count() == 0 && df.exceptAll(back).count() == 0)
  }

  test("native expressions callable from SQL after registration") {
    val got = spark.sql(
      "SELECT normalize_numeric_native('1.234,56') AS a, repair_json_native(\"['x']\") AS b")
      .collect()(0)
    assert(got.getDouble(0) == 1234.56 && got.getString(1) == "[\"x\"]")
  }
}
