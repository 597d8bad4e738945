package graft

import graft.queries.Registry

/** Registry-level invariants + sf0.001 smoke for every query (the
  * driver's rows>0 check, run early and cheap). */
class QueriesSpec extends SparkTestBase {

  test("registry names are unique and oracle keys subset of queries") {
    val names = Registry.allQueries.map(_.name)
    assert(names.distinct.size == names.size)
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("entry returns rows at sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("approx sketches within tolerance of exact values") {
    import org.apache.spark.sql.functions._
    val r = Registry.allQueries.find(_.name == "q60_approx_sketches").get
      .run(spark, sf).collect()(0)
    val (approx, exact) = (r.getLong(0), r.getLong(1))
    assert(math.abs(approx - exact).toDouble / exact < 0.05,
      s"HLL error >5%: $approx vs $exact")
    val approxMedian = r.getDouble(2)
    val exactMedian = Tables.orders(spark, sf)
      .agg(expr("percentile(o_totalprice, 0.5)")).collect()(0).getDouble(0)
    assert(math.abs(approxMedian - exactMedian) / exactMedian < 0.05,
      s"approx median off >5%: $approxMedian vs $exactMedian")
  }

  test("every query returns rows at sf0.001") {
    val empty = Registry.allQueries.flatMap { q =>
      val n = q.run(spark, sf).count()
      if (n == 0) Some(q.name) else None
    }
    assert(empty.isEmpty, s"queries with empty results: $empty")
  }
}
