package graft.tools

import graft.Sessions

/** Dev tool: end-to-end wall clock of `app.Main.run` with Bench's exact
  * methodology (fresh child session + fresh outDir per rep, so the
  * StarSchema memo cannot serve a cached build) — the A/B instrument
  * for `pipeline_total` changes. Usage: TimeMain [sfDir] [reps]. */
object TimeMain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = Sessions.local()
    spark.read.parquet(s"$sfDir/region.parquet").count() // warm-up
    for (rep <- 1 to reps) {
      val out = java.nio.file.Files.createTempDirectory("graft_timemain").toString
      try {
        val t0 = System.nanoTime()
        graft.app.Main.run(spark.newSession(), sfDir, out)
        println(f"pipeline rep$rep: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      } finally org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(out))
    }
    spark.stop()
  }
}
