package graft

import graft.queries.Registry

/** Dev tool: dump `explain("formatted")` for selected queries (all
  * benchmark queries by default) so plan regressions — lost broadcasts,
  * stray exchanges, single-partition windows, unpruned scans — are
  * reviewable per round without spelunking the Spark UI.
  *
  * Usage: graft.ExplainAudit <sfDir> [queryName ...]
  */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val wanted = args.drop(1).toSet
    val spark = Sessions.local()
    val qs = Registry.allQueries
      .filter(q => if (wanted.nonEmpty) wanted(q.name) else q.benchmark)
    qs.foreach { q =>
      println(s"\n========== ${q.name} ==========")
      q.run(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
