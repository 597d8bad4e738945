package graft.streaming

import graft.io.{DeltaRead, DeltaWrite}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Micro-batch consumption of a Delta table's CHANGE FEED
  * ([[graft.io.DeltaRead.changesBetween]]) — the streaming half of the
  * CDC story: a downstream job tails one COMMIT per micro-batch and
  * lands each exactly once, resuming from the protocol's own
  * SetTransaction high-water mark instead of an external checkpoint
  * (the same machinery [[graft.io.DeltaWrite.appendOnce]] gives the
  * file-stream sinks — see [[Streams.startGoldAppendDelta]]).
  *
  * This is deliberately a driver-paced micro-batch loop, not a DSv2
  * `readStream` source: a DSv2 source would have to re-implement the
  * parquet scan inside its PartitionReader, while the loop reuses the
  * full change-feed read path (DV diffs, column mapping, partition
  * re-attachment) and the exactly-once commit path unchanged. Each
  * version's work is bounded by that commit's touched files, so
  * tailing cost is O(new data), never O(table) — the property that
  * makes incremental mirroring viable at 100 TB. For Spark's own
  * trigger/checkpoint/metrics machinery over the same feed, use the
  * `readStream` wrapper [[DeltaCdfStreamProvider]] (format
  * `graft-delta-cdf`), whose DSv1 `getBatch` returns a DataFrame and
  * therefore shares this same read path.
  */
object DeltaTail {

  /** Process every commit of `source` in `(lastSeen(sink), head]`,
    * one version per call to `land`. `land(changes, v)` must make the
    * batch durable TOGETHER with the (appId, v) mark — use
    * [[graft.io.DeltaWrite.appendOnce]] — so that a crash between
    * batches resumes at the right version and a replayed batch is a
    * no-op. Returns the number of versions processed. */
  def processNew(spark: SparkSession, source: String, sink: String, appId: String)(
      land: (DataFrame, Long) => Unit): Int = {
    val head = DeltaRead.latestVersion(source)
    val from = DeltaWrite.lastTxnVersion(spark, sink, appId).getOrElse(-1L)
    var n = 0
    ((from + 1) to head).foreach { v =>
      land(DeltaRead.changesBetween(spark, source, v - 1, v), v)
      n += 1
    }
    n
  }

  /** Maintain `sink` as an exact row-level MIRROR of `source` by
    * folding the change feed: per version, the delete half applies by
    * key through [[graft.io.DeltaWrite.deleteIn]] (deletion vectors —
    * no rewrite), then the insert half lands via `appendOnce` carrying
    * the version mark. `keys` must uniquely identify rows in `source`
    * (the usual CDC primary-key contract) — the delete half arrives as
    * keys. The contract is ENFORCED per batch: a version whose insert
    * half carries duplicate keys is refused loudly (see below) rather
    * than silently over-deleting on a later fold.
    *
    * Exactly-once across crashes and re-runs: a version whose mark the
    * sink already records is skipped whole; a crash between the delete
    * and the insert replays the version, and both halves are
    * idempotent (re-deleting dead keys matches nothing; the insert
    * re-checks the mark inside the commit CAS). Returns the number of
    * versions folded. */
  def mirror(spark: SparkSession, source: String, sink: String,
      keys: Seq[String], appId: String = "graft-cdf-mirror"): Int =
    processNew(spark, source, sink, appId) { (changes, v) =>
      val dels = changes.where(col(DeltaRead.ChangeTypeCol) === "delete")
        .select(keys.map(col): _*)
      val ins = changes.where(col(DeltaRead.ChangeTypeCol) === "insert")
        .drop(DeltaRead.ChangeTypeCol, DeltaRead.CommitVersionCol)
      // the CDC primary-key contract is CHECKED, not trusted: a source
      // version inserting two rows under one key would silently
      // over-delete on the next fold (the delete half applies by key) —
      // refuse loudly instead, one limit(1) job per batch
      val dup = ins.groupBy(keys.map(col): _*)
        .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("__n"))
        .where(col("__n") > 1).limit(1).count()
      require(dup == 0L,
        s"mirror: source $source version $v inserts duplicate rows under " +
          s"keys ${keys.mkString(",")} — not a valid CDC key; mirroring " +
          "would over-delete on a later fold")
      if (graft.io.DeltaWrite.lastTxnVersion(spark, sink, appId).forall(_ < v)) {
        // sink may not exist yet — create it with the first insert
        // batch; deletes against a non-existent sink cannot match
        if (new java.io.File(sink, "_delta_log").isDirectory && !dels.isEmpty)
          DeltaWrite.deleteIn(spark, sink, keys, dels)
        DeltaWrite.appendOnce(ins, sink, appId, v)
        ()
      }
    }
}
