package graft.tools
import graft._
import graft.queries.Registry
/** Dev tool: time named queries (noop write, 2 reps) at a given SF. */
object TimeQ {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.drop(1).toSet
    val spark = Sessions.local()
    val reps = sys.env.get("SPARK_GRAFT_TIMEQ_REPS").map(_.toInt).getOrElse(2)
    Registry.allQueries.filter(q => names(q.name)).foreach { q =>
      for (r <- 1 to reps)
        println(f"${q.name} rep$r: ${Bench.timeNoop(q.run(spark, sfDir))}%.3f s")
    }
    spark.stop()
  }
}
