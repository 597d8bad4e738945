package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** Dev tool: micro-benchmarks for expression-level choices. Currently:
  * declarative (zip_with/aggregate) vs native codegen'd cosine over the
  * full embeddings pair scan — the hot inner loop of the ANN tier.
  *
  * Usage: graft.MicroBench <sfDir> [reps]
  */
object MicroBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.drop(1).headOption.map(_.toInt).getOrElse(3)
    val spark = Sessions.local()
    val emb = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), Similarity.asDouble(col("embedding")).as("v"))
    val q = emb.limit(8).select(col("vec_id").as("qid"), col("v").as("qv"))

    def scan(form: String) = {
      val sim = form match {
        case "declarative" => Similarity.cosine(col("qv"), col("v"))
        case "native"      => Similarity.cosineNative(col("qv"), col("v"))
      }
      emb.join(broadcast(q), col("qid") =!= col("vec_id"))
        .select(sum(sim).as("checksum"))
    }

    for (form <- Seq("declarative", "native"); r <- 1 to reps) {
      val t0 = System.nanoTime()
      val chk = scan(form).collect()(0).getDouble(0)
      println(f"$form%-12s rep$r: ${(System.nanoTime() - t0) / 1e9}%.3f s (checksum $chk%.6f)")
    }

    // top-k per key: custom bounded-heap physical operator vs the
    // window row_number form (which sorts every group in full)
    val events = Tables.events(spark, sfDir)
    def topkScan(form: String) = {
      val picked = form match {
        case "window" =>
          val w = org.apache.spark.sql.expressions.Window
            .partitionBy(col("user_id")).orderBy(col("value").desc, col("event_id").asc)
          events.withColumn("__rn", row_number().over(w))
            .filter(col("__rn") <= 3).drop("__rn")
        case "topk_operator" =>
          graft.plans.TopK.perKey(events, Seq("user_id"), "value", "event_id", 3)
      }
      picked.select(sum(col("value")).as("checksum"))
    }
    for (form <- Seq("window", "topk_operator"); r <- 1 to reps) {
      val t0 = System.nanoTime()
      val chk = topkScan(form).collect()(0).getDouble(0)
      println(f"$form%-13s rep$r: ${(System.nanoTime() - t0) / 1e9}%.3f s (checksum $chk%.6f)")
    }

    // SQ8 persisted-codes ANN: rank from the 1-byte codes parquet vs
    // from the float32 embeddings parquet — the compression must pay
    // in BYTES SCANNED, not just on paper (VERDICT r4 #2)
    val embRaw = Tables.embeddings(spark, sfDir)
    val idxDir = java.nio.file.Files.createTempDirectory("sq8bench").toString
    Similarity.sq8WriteIndex(embRaw, idxDir)
    embRaw.write.mode("overwrite").parquet(s"$idxDir/floats")
    def dirBytes(p: String): Long = {
      val hp = new org.apache.hadoop.fs.Path(p)
      hp.getFileSystem(spark.sessionState.newHadoopConf()).getContentSummary(hp).getLength
    }
    println(f"sq8 on-disk: codes ${dirBytes(s"$idxDir/codes")}%,d B vs " +
      f"floats ${dirBytes(s"$idxDir/floats")}%,d B " +
      f"(${dirBytes(s"$idxDir/floats").toDouble / dirBytes(s"$idxDir/codes")}%.2fx)")
    val queries = embRaw.limit(8)
    def sq8Scan(form: String) = form match {
      case "codes_scan" =>
        Similarity.sq8TopKFromCodes(queries,
          spark.read.parquet(s"$idxDir/codes"),
          spark.read.parquet(s"$idxDir/bounds"), 5)
      case "float_scan" =>
        Similarity.sq8TopK(queries, spark.read.parquet(s"$idxDir/floats"), 64, 5)
    }
    for (form <- Seq("float_scan", "codes_scan"); r <- 1 to reps) {
      val t0 = System.nanoTime()
      val chk = sq8Scan(form).agg(sum(col("sim"))).collect()(0).getDouble(0)
      println(f"$form%-13s rep$r: ${(System.nanoTime() - t0) / 1e9}%.3f s (checksum $chk%.6f)")
    }
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(idxDir))
    spark.stop()
  }
}
