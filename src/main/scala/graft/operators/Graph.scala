package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph analytics in the Pregel-lite style the
  * connected-components dedup already uses (Dedup.connectedComponents):
  * a fixed number of message-passing rounds, each one shuffle keyed by
  * destination node. No adjacency is ever collected; the edge list is
  * the only state, so the cost per round is one join + one aggregation
  * over |E| rows — the shape that scales linearly with cluster width.
  */
object Graph {

  /** PageRank with damping `d` over a directed edge list (src, dst),
    * `iters` fixed iterations from a uniform start.
    *
    * `redistributeDangling = false` (default): nodes with no out-edges
    * leak rank — for ranking use the leak is a uniform scale-down, and
    * the iteration is one join + one aggregation.
    * `redistributeDangling = true`: the strict random-surfer model —
    * each round the dangling nodes' total rank is spread uniformly
    * over all nodes, so Σrank stays exactly 1. The dangling total is a
    * one-row aggregate crossJoin-broadcast back into the update (never
    * a driver collect in the loop), costing one extra anti-join +
    * scalar aggregate per round.
    *
    * Lineage control: each round's plan nests the last, so at high
    * `iters` analyzer cost and task-binary size grow without bound —
    * every `checkpointInterval` rounds the rank frame materializes via
    * eager localCheckpoint (same lifecycle as
    * Dedup.connectedComponents). In redistribution mode rank feeds
    * BOTH the contribution join and the dangling aggregate, so the
    * plan DOUBLES per round (2^interval nodes between checkpoints) —
    * that mode therefore checkpoints every round, the interval only
    * governs the linear-growth default mode.
    *
    * Returns (node, rank). Deterministic up to FP summation order —
    * round before comparing across engines/runs.
    */
  def pagerank(edges: DataFrame, iters: Int, d: Double = 0.85,
      redistributeDangling: Boolean = false,
      checkpointInterval: Int = 10): DataFrame = {
    val e = edges.select(col("src"), col("dst")).distinct().persist()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct().persist()
    val n = nodes.count().toDouble
    val deg = e.groupBy("src").agg(count(lit(1)).as("deg"))
    val withDeg = e.join(deg, "src")
    val outNodes = deg.select(col("src").as("node"))
    var rank = nodes.withColumn("rank", lit(1.0 / n))
    for (i <- 1 to iters) {
      val contrib = withDeg
        .join(rank.withColumnRenamed("node", "src"), "src")
        .groupBy(col("dst").as("node"))
        .agg(sum(col("rank") / col("deg")).as("mass"))
      rank =
        if (redistributeDangling) {
          val dangling = rank.join(outNodes, Seq("node"), "left_anti")
            .agg(coalesce(sum(col("rank")), lit(0.0)).as("__dm"))
          nodes
            .join(contrib, Seq("node"), "left")
            .crossJoin(broadcast(dangling))
            .select(col("node"),
              (lit((1.0 - d) / n) + lit(d) *
                (coalesce(col("mass"), lit(0.0)) + col("__dm") / lit(n))).as("rank"))
        } else
          nodes
            .join(contrib, Seq("node"), "left")
            .select(col("node"),
              (lit((1.0 - d) / n) + lit(d) * coalesce(col("mass"), lit(0.0))).as("rank"))
      if (i < iters && (redistributeDangling || i % checkpointInterval == 0))
        rank = rank.localCheckpoint(true)
    }
    // materialize lineage-free, then drop the loop caches — the result
    // must not pin persisted blocks for the session's lifetime (same
    // hygiene as Dedup.connectedComponents).
    val out = rank.localCheckpoint(true)
    e.unpersist()
    nodes.unpersist()
    out
  }

  /** Triangle count + global clustering coefficient over an undirected
    * id-oriented edge list (ua < ub, already distinct). Each triangle
    * a<b<c materializes exactly once: the two-path a→b→c closed by the
    * a→c edge — three equi-joins on node keys. At 100 TB orient by
    * degree instead of id (same plan shape) so hub two-paths don't
    * skew; triplet counts are pure integer math.
    *
    * Returns one row: (n_nodes, n_edges, n_triangles, n_triplets,
    * clustering).
    */
  def triangleStats(edges: DataFrame): DataFrame = {
    val e = edges.select(col("ua"), col("ub")).persist()
    val tri = e.select(col("ua").as("a"), col("ub").as("b"))
      .join(e.select(col("ua").as("b2"), col("ub").as("c")), col("b") === col("b2"))
      .join(e.select(col("ua").as("a3"), col("ub").as("c3")),
        col("a") === col("a3") && col("c") === col("c3"))
      .agg(count(lit(1)).as("n_triangles"))
    val deg = e.select(explode(array(col("ua"), col("ub"))).as("u"))
      .groupBy(col("u")).agg(count(lit(1)).as("deg"))
    val nodes = deg.agg(count(lit(1)).as("n_nodes"),
      coalesce(sum(expr("(deg * (deg - 1)) div 2")), lit(0L)).as("n_triplets"))
    val stats = e.agg(count(lit(1)).as("n_edges"))
      .crossJoin(nodes).crossJoin(tri)
      .select(col("n_nodes"), col("n_edges"), col("n_triangles"), col("n_triplets"),
        when(col("n_triplets") > 0,
          round(lit(3.0) * col("n_triangles").cast("double") /
            col("n_triplets").cast("double"), 6)).otherwise(0.0).as("clustering"))
    // single-row result: materialize lineage-free, then release the
    // edge cache (same hygiene as pagerank above)
    val out = stats.localCheckpoint(true)
    e.unpersist()
    out
  }
}
