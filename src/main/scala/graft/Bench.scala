package graft

import graft.queries.Registry

/** Benchmark main — runs the headline query set (GQuery.benchmark=true:
  * the heavy scan/join/window/text/dedup representatives) against
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line for the driver.
  * A tiny warm-up action runs first so JVM/codegen startup isn't
  * attributed to the first measured query.
  */
object Bench {
  /** One noop-format-write timed run of a plan: evaluates every output
    * column (a count() lets Catalyst prune aggregate arithmetic away),
    * discards the rows, propagates whatever the plan throws. Shared by
    * the dev timing tools (TimeQ, ProfileText) so the methodology
    * cannot drift. */
  def timeNoop(df: org.apache.spark.sql.DataFrame): Double = {
    val t0 = System.nanoTime()
    df.write.format("noop").mode("overwrite").save()
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local()
    spark.read.parquet(s"$sfDir/region.parquet").count() // warm-up
    val headline = Registry.allQueries.filter(_.benchmark)
    // Discarded warm-up rep + median-of-3 measured reps: the warm-up
    // absorbs codegen compilation, shuffle-file creation and page-cache
    // faults; the median resists the one-off GC pause that min-of-2
    // let through (the r5 "+23% on untouched queries" phantom
    // regression). The median is the reproducible cost of the plan
    // itself — the thing that scales to the cluster. A FAILING query
    // must not masquerade as a fast one: it reports -1 and is named in
    // "errors" instead of contributing a near-zero time.
    val results = headline.map { q =>
      def rep(): Option[Double] =
        try Some(timeNoop(q.run(spark, sfDir)))
        catch { case e: Throwable =>
          System.err.println(s"[bench] ${q.name} FAILED: ${e.getMessage}"); None }
      rep() // warm-up, discarded
      val times = (1 to 3).flatMap(_ => rep())
      q.name -> (if (times.nonEmpty) times.sorted.apply(times.size / 2) else -1.0)
    }
    val (ok, failed) = results.partition(_._2 >= 0)
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errs = failed.map(f => "\"" + f._1 + "\"").mkString("[", ",", "]")
    val total = if (ok.nonEmpty) ok.map(_._2).sum else 0.0
    // end-to-end pipeline wall clock (bronze→silver→gold→validate +
    // volumetry) — directly comparable to the reference's published
    // 3–5 min end-to-end figure (README.md:322). Each rep runs on a
    // FRESH child session into a fresh outDir: StarSchema.build
    // memoizes per (session, sfDir), and a memo hit would time a
    // cache lookup, not the pipeline. min-of-2, like the queries.
    val pipelineSecs = (1 to 2).flatMap { _ =>
      val out = java.nio.file.Files.createTempDirectory("graft_bench_pipeline").toString
      try {
        val t0 = System.nanoTime()
        graft.app.Main.run(spark.newSession(), sfDir, out)
        Some((System.nanoTime() - t0) / 1e9)
      } catch { case e: Throwable =>
        System.err.println(s"[bench] pipeline FAILED: ${e.getMessage}"); None
      } finally org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(out))
    }
    val pipelineTotal = if (pipelineSecs.nonEmpty) pipelineSecs.min else -1.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"pipeline_total":$pipelineTotal,"sf":"$sfDir"}""")
    spark.stop()
  }
}
