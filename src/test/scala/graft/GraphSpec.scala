package graft

import graft.operators.Graph
import org.apache.spark.sql.functions.sum

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

  test("triangleStats: K4 has 4 triangles and clustering 1.0") {
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
      .toDF("ua", "ub")
    val r = Graph.triangleStats(k4).collect()(0)
    assert(r.getAs[Long]("n_nodes") == 4)
    assert(r.getAs[Long]("n_edges") == 6)
    assert(r.getAs[Long]("n_triangles") == 4)
    assert(r.getAs[Long]("n_triplets") == 12) // 4 nodes × C(3,2)
    assert(r.getAs[Double]("clustering") == 1.0)
  }

  test("triangleStats: a path graph has no triangles") {
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("ua", "ub")
    val r = Graph.triangleStats(path).collect()(0)
    assert(r.getAs[Long]("n_triangles") == 0)
    assert(r.getAs[Long]("n_triplets") == 2) // middle nodes each close one
    assert(r.getAs[Double]("clustering") == 0.0)
  }

  test("pagerank dangling redistribution matches the analytic fixed point, Σrank = 1") {
    // 1 → 2, node 2 dangling. Strict random-surfer fixed point with
    // d = 0.85, n = 2: r1 = (1−d)/n + d·r2/n and r1 + r2 = 1, so
    // r1 = 0.5/1.425 = 0.3508771…, r2 = 0.6491228…
    val edges = Seq((1L, 2L)).toDF("src", "dst")
    // contraction factor ≈ 0.425 per round: 30 rounds ≈ 7e-12 residual
    val ranks = Graph.pagerank(edges, iters = 30, redistributeDangling = true)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(ranks(1L) - 0.5 / 1.425) < 1e-9)
    assert(math.abs(ranks(2L) - 0.925 / 1.425) < 1e-9)
    assert(math.abs(ranks.values.sum - 1.0) < 1e-9,
      "redistribution must conserve total mass exactly")
    // default mode on the same graph: mass leaks (sum < 1) — the
    // documented scale-down, proving the flag changes the model
    val leaky = Graph.pagerank(edges, iters = 10)
      .agg(sum($"rank")).collect()(0).getDouble(0)
    assert(leaky < 0.99)
  }

  test("pagerank high-iteration run stays flat-lineage via interval checkpoints") {
    // 25 redistribution iterations double plan growth per round; the
    // interval localCheckpoint keeps analysis time bounded — this test
    // is the regression guard (it crawls without checkpoints)
    val cyc = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L)).toDF("src", "dst")
    val ranks = Graph.pagerank(cyc, iters = 25, redistributeDangling = true,
      checkpointInterval = 5)
    assert(math.abs(ranks.agg(sum($"rank")).collect()(0).getDouble(0) - 1.0) < 1e-9)
  }
}
