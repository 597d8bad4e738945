package graft.streaming

import graft.io.DeltaRead
import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.{LongOffset, SerializedOffset}
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.StructType

/** `readStream` front-end for the Delta CHANGE FEED — the DSv1
  * streaming-source wrapper around [[graft.io.DeltaRead.changesBetween]]
  * that [[DeltaTail]]'s scaladoc deliberately deferred:
  *
  * {{{
  *   spark.readStream.format("graft-delta-cdf")
  *     .option("startingVersion", "-1")      // -1 = full history (default)
  *     .option("maxVersionsPerTrigger", "1") // optional rate limit
  *     .option("maxBytesPerTrigger", "...")  // optional: byte pacing off
  *                                           //   the commits' add.size
  *     .load(tablePath)
  * }}}
  *
  * Both rate limits may be set; a batch closes at whichever budget
  * fills first. A single version whose adds exceed the whole byte
  * budget is admitted alone (a version is this source's atom).
  *
  * The `Source` API's `getBatch(start, end)` returns a DataFrame, so the
  * COMPLETE batch change-feed read path — cdc-file preference, DV
  * diffing, column-mapping resolution, partition re-attachment — is
  * reused verbatim; nothing is re-implemented inside a PartitionReader
  * (the reason [[DeltaTail]] stayed a driver-paced loop, and the reason
  * the reference Delta implementation's own streaming source uses this
  * same API). What the wrapper adds over the loop is Spark's streaming
  * machinery: triggers (incl. `AvailableNow`/`Once`), the offset/commit
  * checkpoint log (resume without a SetTransaction mark in a sink
  * table), progress metrics, and any downstream streaming sink —
  * `foreachBatch`, memory, file, or [[Streams]]' own Delta sinks.
  *
  * Offsets are COMMIT VERSIONS (`LongOffset(v)` = "versions ≤ v have
  * been surfaced"), so a batch is `changesBetween(prev, v]` — per-batch
  * work is bounded by those commits' touched files, never O(table):
  * the same tailing-cost contract as [[DeltaTail.processNew]]. Restart
  * replays of the last uncommitted batch are deterministic because
  * `changesBetween` is a pure function of the immutable commit log.
  *
  * Exactly-once: the checkpoint's offset log de-duplicates at BATCH
  * granularity; for row-level exactly-once into a Delta sink, pair with
  * `foreachBatch` + [[graft.io.DeltaWrite.appendOnce]] keyed on
  * `batchId` (idempotent re-land), exactly as the file-stream sinks do.
  */
class DeltaCdfStreamProvider extends StreamSourceProvider with DataSourceRegister {
  override def shortName: String = "graft-delta-cdf"

  private def tablePath(parameters: Map[String, String]): String =
    parameters.getOrElse("path", throw new IllegalArgumentException(
      "graft-delta-cdf: .load(path) is required — the Delta table root"))

  override def sourceSchema(sqlContext: SQLContext, schema: Option[StructType],
      providerName: String, parameters: Map[String, String]): (String, StructType) = {
    require(schema.isEmpty,
      "graft-delta-cdf: user-specified schemas are not supported — the " +
        "feed's schema is the table's schema plus the change metadata columns")
    (shortName, DeltaCdfSource.feedSchema(sqlContext.sparkSession, tablePath(parameters)))
  }

  override def createSource(sqlContext: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source = {
    val path = tablePath(parameters)
    val starting = parameters.get("startingVersion").map(_.toLong).getOrElse(-1L)
    val maxPer = parameters.get("maxVersionsPerTrigger").map(_.toLong)
    require(maxPer.forall(_ > 0), "maxVersionsPerTrigger must be positive")
    val maxBytes = parameters.get("maxBytesPerTrigger").map(_.toLong)
    require(maxBytes.forall(_ > 0), "maxBytesPerTrigger must be positive")
    new DeltaCdfSource(sqlContext.sparkSession, path, starting, maxPer, maxBytes)
  }
}

object DeltaCdfSource {
  /** The feed's schema: the table's snapshot schema plus the two change
    * metadata columns — identical to a `changesBetween` frame. */
  def feedSchema(spark: SparkSession, table: String): StructType = {
    val head = DeltaRead.latestVersion(table)
    require(head >= 0, s"graft-delta-cdf: $table is not a Delta table")
    DeltaRead.changesBetween(spark, table, head, head).schema
  }
}

/** See [[DeltaCdfStreamProvider]]. `startingVersion` is EXCLUSIVE: -1
  * surfaces the full history, v surfaces `(v, head]` — matching the
  * `sinceVersion` convention of `changesBetween`. */
class DeltaCdfSource(spark: SparkSession, table: String,
    startingVersion: Long, maxVersionsPerTrigger: Option[Long],
    maxBytesPerTrigger: Option[Long] = None) extends Source
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {

  override val schema: StructType = DeltaCdfSource.feedSchema(spark, table)

  /** Highest version already surfaced through getOffset/getBatch — the
    * rate limit advances from here. Recovery-safe: on restart Spark
    * replays getBatch with the checkpointed offsets before asking for
    * new ones, and getBatch advances the mark. */
  @volatile private var surfaced: Long = startingVersion

  /** `Trigger.AvailableNow` bound captured once at query start — the
    * rate-limited walk drains exactly to THIS head and stops, in as
    * many batches as `maxVersionsPerTrigger` dictates. Implemented
    * directly (like [[DeltaTableSource]]) because Spark's generic
    * wrapper captures the delegate's rate-limited NEXT offset as the
    * run bound and would under-drain a paced feed to its first chunk. */
  @volatile private var availableNowHead: Option[Long] = None
  override def prepareForTriggerAvailableNow(): Unit =
    availableNowHead = Some(DeltaRead.latestVersion(table))
  override def getDefaultReadLimit
      : org.apache.spark.sql.connector.read.streaming.ReadLimit =
    org.apache.spark.sql.connector.read.streaming.ReadLimit.allAvailable()
  override def latestOffset(
      start: org.apache.spark.sql.connector.read.streaming.Offset,
      limit: org.apache.spark.sql.connector.read.streaming.ReadLimit)
      : org.apache.spark.sql.connector.read.streaming.Offset =
    getOffset.orNull

  private def version(o: Offset): Long = o match {
    case l: LongOffset => l.offset
    case s: SerializedOffset => LongOffset(s).offset
    case other => other.json.toLong
  }

  override def getOffset: Option[Offset] = {
    val head = availableNowHead.fold(DeltaRead.latestVersion(table))(
      b => math.min(b, DeltaRead.latestVersion(table)))
    val from = math.max(surfaced, startingVersion)
    val versionCap = maxVersionsPerTrigger
      .map(m => math.min(head, from + m)).getOrElse(head)
    // BYTE pacing (parity with the table source): versions admit until
    // their cumulative add.size exceeds the budget — whichever limit
    // fills first closes the batch; a single oversized version is
    // admitted alone (the floor is one version per batch, since a
    // version is this source's atom). Sizes come from the LOG, so the
    // walk is metadata-only.
    val capped = maxBytesPerTrigger match {
      case None => versionCap
      case Some(budget) =>
        var v = from
        var spent = 0L
        var full = false
        while (v < versionCap && !full) {
          val next = DeltaRead.commitAdds(table, v + 1)._1.map(_._2).sum
          if (spent > 0L && spent + next > budget) full = true
          else { spent += next; v += 1 }
        }
        v
    }
    if (capped <= startingVersion || capped <= surfaced) None
    else { surfaced = math.max(surfaced, capped); Some(LongOffset(capped)) }
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val since = start.map(version).getOrElse(startingVersion)
    val until = version(end)
    surfaced = math.max(surfaced, until)
    // MicroBatchExecution asserts isStreaming on the returned frame —
    // stamp the batch plan via the package-private bridge
    org.apache.spark.sql.graft.StreamingFrames.asStreaming(
      DeltaRead.changesBetween(spark, table, since, until))
  }

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
  override def toString: String = s"DeltaCdfSource[$table]"
}
