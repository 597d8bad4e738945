package graft.tools

import graft.{Sessions, Tables}
import graft.clean.Cleaner
import graft.io.{Sinks, Volumetry}
import graft.operators.{StarSchema, Validator}

/** Dev tool: per-phase wall clock of the bronze→silver→gold→validate
  * pipeline (the shape `app.Main.run` executes and Bench times as
  * `pipeline_total`) — the profiling loop for pipeline regressions.
  * Usage: graft.tools.TimePipeline [sfDir] [reps]. */
object TimePipeline {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(2)
    val spark = Sessions.local()
    spark.read.parquet(s"$sfDir/region.parquet").count() // warm-up
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"  $label%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    for (rep <- 1 to reps) {
      val outDir = java.nio.file.Files.createTempDirectory("graft_timepipe").toString
      println(s"rep $rep -> $outDir")
      val total0 = System.nanoTime()
      t("silver events") {
        Sinks.parquet(Cleaner.cleanEvents(Tables.events(spark, sfDir)),
          s"$outDir/silver/events")
      }
      t("silver documents") {
        Sinks.parquet(Cleaner.cleanDocuments()(Tables.documents(spark, sfDir)),
          s"$outDir/silver/documents")
      }
      val star = t("star build (lazy)")(StarSchema.build(spark, sfDir))
      star.foreach { case (name, df) =>
        t(s"gold $name") {
          Sinks.parquetAppendNew(df, s"$outDir/gold/$name",
            StarSchema.mergeKeys(name), StarSchema.partitionSpec(name))
        }
      }
      val goldStar = star.map { case (name, _) =>
        name -> spark.read.parquet(s"$outDir/gold/$name") }
      val report = t("validator (gold, cached)")(
        Validator.report(goldStar).persist())
      t("validation csv")(Sinks.csv(report, s"$outDir/validation_report"))
      t("violations count")(
        report.filter(org.apache.spark.sql.functions.col("n_bad") =!= 0L).count())
      report.unpersist(blocking = false)
      t("volumetry")(
        Sinks.jsonReport(Volumetry.reportJson(spark, sfDir), s"$outDir/volumetry_report.json"))
      println(f"  TOTAL ${(System.nanoTime() - total0) / 1e9}%.3f s")
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(outDir))
    }
    spark.stop()
  }
}
