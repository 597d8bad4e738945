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

  test("every query returns rows at sf0.001") {
    val empty = Registry.allQueries.flatMap { q =>
      val n = q.run(spark, sf).count()
      if (n == 0) Some(q.name) else None
    }
    assert(empty.isEmpty, s"queries with empty results: $empty")
  }
}
