package graft.tools

import graft.{Sessions, SparkEntry}

/** Plan inspector: prints the formatted physical plan for the named
  * queries (or all headline ones) so pushdown/broadcast/codegen can be
  * reviewed. Usage: graft.tools.Explain [sfDir] [query ...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("q02_filter_project", "q16_broadcast_lookup", "q17_regional_revenue",
        "q19_latest_per_key", "q34_star_agg", "q42_minhash_lsh")
    val spark = Sessions.local()
    names.foreach { n =>
      println(s"\n=================== $n ===================")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
