package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.{broadcast, lit}

/** Join-shape helpers for the 100 TB contract.
  *
  * An unconditional `broadcast()` hint is right for catalog-sized dims
  * (region, nation, seed catalogs) but becomes a forced-OOM at scale:
  * the hint OVERRIDES `spark.sql.autoBroadcastJoinThreshold`, so a dim
  * that grew 100× (customer at SF100 ≈ hundreds of MB) would still be
  * collected to the driver and shipped to every executor. The helpers
  * here hint only when Catalyst's own static size estimate
  * (`optimizedPlan.stats.sizeInBytes` — free, no job) is under the
  * threshold, and otherwise leave the strategy to the planner + AQE
  * (which can still broadcast at runtime from ACTUAL shuffle sizes,
  * or skew-split the shuffle join).
  */
object Joins {

  /** 64 MB: comfortably under typical executor headroom even with
    * dozens of concurrent tasks; ~8× Spark's default auto threshold
    * because gold dims are trusted projections, not raw scans. */
  val DefaultBroadcastBytes: Long = 64L << 20

  /** Catalyst's static size estimate for a frame's optimized plan. */
  def estimatedBytes(df: DataFrame): BigInt =
    df.queryExecution.optimizedPlan.stats.sizeInBytes

  /** The build side, hinted for broadcast only when its static size
    * estimate fits `maxBytes` — plans identical to the explicit hint at
    * catalog scale, degrades to a planner-chosen shuffle join instead
    * of a forced OOM when the dim outgrows the executor. */
  def maybeBroadcast(dim: DataFrame, maxBytes: Long = DefaultBroadcastBytes): DataFrame =
    if (estimatedBytes(dim) <= maxBytes) broadcast(dim) else dim

  /** Fact ⋈ dim with the scale-aware hint on the dim side. */
  def dimJoin(fact: DataFrame, dim: DataFrame, keys: Seq[String],
      maxBytes: Long = DefaultBroadcastBytes): DataFrame =
    fact.join(maybeBroadcast(dim, maxBytes), keys)

  /** Bloom-filter semi-join pruning: build a bloom filter over the dim
    * side's join key and pre-filter the fact side BEFORE its shuffle —
    * the explicit form of Catalyst's own runtime-filter rewrite
    * (`InjectRuntimeFilter`), usable where that rule doesn't fire
    * (non-equi follow-ups, reused prune sets, multi-join pipelines).
    *
    * Scale contract: the filter is `numItems`-sized (1 M keys ≈ 1.2 MB
    * at the default FPP), built by one partial-aggregating job over the
    * dim and shipped once per executor inside a literal — the fact-side
    * scan then drops non-joining rows at the source, so the shuffle
    * carries only rows that can actually join (modulo the bloom FPP;
    * false positives are removed by the exact join that follows, so
    * composed results are exact).
    *
    * The driver-side `head` is one row of ~MB — the same data movement
    * a broadcast would do, without forcing the join strategy.
    */
  def bloomPrune(fact: DataFrame, factKey: Column, dim: DataFrame,
      dimKey: Column, numItems: Long = 1000000L): DataFrame = {
    import org.apache.spark.sql.GraftColumnBridge.{column, expression}
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    import org.apache.spark.sql.types.BinaryType
    // XxHash64 hashes by PHYSICAL type: int 5 and long 5 hash
    // differently, so a fact/dim key type mismatch would silently turn
    // the prune into near-total (false-negative) row loss. Refuse it.
    val (fType, dType) = (fact.select(factKey).schema.head.dataType,
      dim.select(dimKey).schema.head.dataType)
    require(fType == dType,
      s"bloomPrune key types must match exactly (fact: $fType, dim: $dType) — " +
        "cast one side; XxHash64 is physical-type-sensitive")
    val agg = new BloomFilterAggregate(
      new XxHash64(Seq(expression(dimKey))), numItems)
    val bf = dim
      .select(column(agg.toAggregateExpression()).as("bf"))
      .head.getAs[Array[Byte]](0)
    // Empty dim side → null buffer: nothing can join, prune everything.
    if (bf == null) fact.where(lit(false))
    else fact.where(column(BloomFilterMightContain(
      Literal(bf, BinaryType), new XxHash64(Seq(expression(factKey))))))
  }
}
