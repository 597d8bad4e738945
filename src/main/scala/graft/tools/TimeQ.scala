package graft.tools
import graft._
import graft.queries.Registry
/** Dev tool: time named queries (noop write, 2 reps) at a given SF. */
object TimeQ {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.drop(1).toSet
    val spark = Sessions.local()
    Registry.allQueries.filter(q => names(q.name)).foreach { q =>
      for (r <- 1 to 2) {
        val t0 = System.nanoTime()
        q.run(spark, sfDir).write.format("noop").mode("overwrite").save()
        println(f"${q.name} rep$r: ${(System.nanoTime()-t0)/1e9}%.3f s")
      }
    }
    spark.stop()
  }
}
