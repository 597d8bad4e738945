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
    // the tolerance checks now run INSIDE the query as boolean columns
    // (oracle-hashable); here we assert they actually hold
    val r = Registry.allQueries.find(_.name == "q60_approx_sketches").get
      .run(spark, sf).collect()(0)
    assert(r.getLong(0) > 0, "exact distinct count must be positive")
    assert(r.getBoolean(1), "HLL distinct estimate outside 5% tolerance")
    assert(r.getBoolean(2), "approx median outside 1% tolerance")
  }

  test("every query returns rows at sf0.001") {
    val empty = Registry.allQueries.flatMap { q =>
      val n = q.run(spark, sf).count()
      if (n == 0) Some(q.name) else None
    }
    assert(empty.isEmpty, s"queries with empty results: $empty")
  }
}
