package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.broadcast

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
}
