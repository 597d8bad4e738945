package graft.queries

import graft.Tables
import graft.operators.Joins
import org.apache.spark.sql.functions._

/** Scale-pipeline coverage: the operators a 100 TB curation/warehouse
  * pipeline runs around the per-row transforms — runtime-filter-style
  * join pruning, repetition quality gates, context-window chunking,
  * token-budget packing, and SCD2 history builds. Every query's result
  * is exact (bloom false positives are scrubbed by the exact join that
  * follows), so each has a full DuckDB oracle twin.
  */
object PipelineQueries {

  /** Bloom-prune + exact join: revenue of lineitems belonging to
    * high-value orders. The bloom filter drops ~80% of the fact scan
    * before the shuffle; the exact join afterwards removes bloom false
    * positives, so the result ≡ the plain join the oracle runs. */
  val q96BloomPrune = GQuery(
    "q96_bloom_prune",
    (s, d) => {
      import s.implicits._
      val hi = Tables.orders(s, d)
        .where($"o_totalprice" > 450000.0)
        .select($"o_orderkey", $"o_orderpriority")
      val pruned = Joins.bloomPrune(
        Tables.lineitem(s, d), $"l_orderkey", hi, $"o_orderkey",
        numItems = 100000L)
      pruned
        .join(hi, $"l_orderkey" === $"o_orderkey")
        .groupBy($"o_orderpriority")
        .agg(
          count(lit(1)).as("n_items"),
          round(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")), 2)
            .as("revenue"))
        .orderBy($"o_orderpriority")
    },
    Some("""SELECT o_orderpriority, count(*) AS n_items,
           |       round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
           |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
           |WHERE o_totalprice > 450000.0
           |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin))

  val all: Seq[GQuery] = Seq(q96BloomPrune)
}
