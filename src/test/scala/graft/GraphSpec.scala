package graft

import graft.operators.Graph

class GraphSpec extends SparkTestBase {
  import spark.implicits._

  test("pagerank: symmetric 2-cycle converges to uniform") {
    val edges = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    val r = Graph.pagerank(edges, iters = 5).collect()
      .map(row => row.getLong(0) -> row.getDouble(1)).toMap
    assert(math.abs(r(1L) - 0.5) < 1e-12 && math.abs(r(2L) - 0.5) < 1e-12)
  }

  test("pagerank: hub in a star graph outranks leaves and mass stays bounded") {
    // leaves 2..5 all point at 1, and 1 points back at each — hub gets
    // 4 full contributions, each leaf gets 1/4 of the hub's.
    val edges = ((2L to 5L).map(i => (i, 1L)) ++ (2L to 5L).map(i => (1L, i))).toDF("src", "dst")
    val r = Graph.pagerank(edges, iters = 10).collect()
      .map(row => row.getLong(0) -> row.getDouble(1)).toMap
    assert(r(1L) > r(2L) * 2)
    val total = r.values.sum
    assert(total > 0.99 && total < 1.01, s"rank mass drifted: $total")
    // leaves are symmetric → identical ranks
    assert((2L to 5L).map(r).distinct.size == 1)
  }
}
