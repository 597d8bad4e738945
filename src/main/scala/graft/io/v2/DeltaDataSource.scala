package graft.io.v2

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Row, SQLContext}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.StructType

import graft.io.DeltaRead

/** `spark.read.format("graft-delta")` — the SQL-facing door to the
  * graft Delta reader, so `CREATE TEMPORARY VIEW ... USING
  * graft-delta OPTIONS (path '...')` and plain `spark.sql` work
  * against graft-written (or foreign) Delta tables without touching
  * the Scala API. Options: `path` (required), `versionAsOf` /
  * `timestampAsOf` (time travel, millis or ISO date-time).
  *
  * Implemented as a v1 `PrunedFilteredScan` deliberately: the heavy
  * machinery (snapshot resolution, DV masking, column mapping, stats
  * pruning, parquet scanning) already lives behind
  * [[DeltaRead.readVersion]], and the v1 contract lets this relation
  * delegate to that DataFrame wholesale. Pushed filters do double
  * duty — comparable literal conjuncts become [[DeltaRead.StatRange]]
  * file pruning BEFORE any scan is planned (log-metadata skipping),
  * and every translatable filter is re-applied INSIDE the delegate so
  * it reaches the parquet readers as a real pushed predicate. Spark
  * re-evaluates all filters above this relation (the v1 default), so
  * partial translation is always sound. */
class DeltaDataSource extends RelationProvider
    with CreatableRelationProvider
    with org.apache.spark.sql.sources.StreamSinkProvider
    with org.apache.spark.sql.sources.StreamSourceProvider
    with DataSourceRegister {
  override def shortName(): String = "graft-delta"

  /** `readStream.format("graft-delta")` — tail a PLAIN table: initial
    * snapshot + per-commit adds, file-granular `maxFilesPerTrigger`
    * rate limiting. See [[graft.streaming.DeltaTableSource]]. */
  override def sourceSchema(sqlContext: SQLContext,
      schema: Option[org.apache.spark.sql.types.StructType],
      providerName: String, parameters: Map[String, String])
      : (String, org.apache.spark.sql.types.StructType) = {
    require(schema.isEmpty,
      "graft-delta source: user-specified schemas are not supported — " +
        "the stream's schema is the table's schema")
    val path = parameters.getOrElse("path", throw new IllegalArgumentException(
      "graft-delta source: .load(path) is required — the Delta table root"))
    // resolve at the SAME version the source's base uses (base = v-1
    // for an explicit startingVersion) — resolving at v would disagree
    // with the source when commit v itself changed the schema
    val v = parameters.get("startingVersion")
      .map(x => math.max(x.toLong - 1, 0L))
      .getOrElse(DeltaRead.latestVersion(path))
    (shortName(), DeltaRead.readVersionSchema(sqlContext.sparkSession, path, v))
  }

  override def createSource(sqlContext: SQLContext, metadataPath: String,
      schema: Option[org.apache.spark.sql.types.StructType],
      providerName: String, parameters: Map[String, String])
      : org.apache.spark.sql.execution.streaming.Source = {
    val path = parameters.getOrElse("path", throw new IllegalArgumentException(
      "graft-delta source: .load(path) is required — the Delta table root"))
    val maxFiles = parameters.get("maxFilesPerTrigger").map(_.toInt)
    require(maxFiles.forall(_ > 0), "maxFilesPerTrigger must be positive")
    val maxBytes = parameters.get("maxBytesPerTrigger").map(_.toLong)
    require(maxBytes.forall(_ > 0), "maxBytesPerTrigger must be positive")
    new graft.streaming.DeltaTableSource(sqlContext.sparkSession, path,
      metadataPath, parameters.get("startingVersion").map(_.toLong), maxFiles,
      skipChangeCommits = parameters.get("skipChangeCommits")
        .exists(_.equalsIgnoreCase("true")),
      maxBytesPerTrigger = maxBytes)
  }

  /** `writeStream.format("graft-delta")` — an EXACTLY-ONCE streaming
    * Delta sink: every micro-batch lands via `appendOnce` carrying a
    * SetTransaction (appId, batchId), so a restarted query whose
    * checkpoint replays a batch skips it at the TABLE level, whatever
    * the checkpoint said. The appId comes from the `txnAppId` option
    * when given (several queries may then share one target table),
    * else from the checkpoint location — the stable identity of a
    * restartable query. There is deliberately NO path-based fallback:
    * two independent queries writing the same table would share one
    * SetTransaction appId, and their overlapping batchIds (both start
    * at 0) would be silently skipped by the appendOnce replay guard —
    * silent data loss. A checkpoint resolved only from the
    * `spark.sql.streaming.checkpointLocation` conf never reaches this
    * options map, so that configuration must pass `txnAppId` (or an
    * explicit per-query `checkpointLocation` option) instead.
    * Pairs with the `graft-delta-cdf` SOURCE for an
    * end-to-end exactly-once Delta→Delta pipeline through nothing but
    * standard writeStream/readStream APIs. */
  override def createSink(sqlContext: SQLContext,
      parameters: Map[String, String], partitionColumns: Seq[String],
      outputMode: org.apache.spark.sql.streaming.OutputMode)
      : org.apache.spark.sql.execution.streaming.Sink = {
    val path = parameters.getOrElse("path",
      throw new IllegalArgumentException("graft-delta: 'path' option is required"))
    // each micro-batch APPENDS — Complete mode re-emits the whole
    // result every trigger and Update re-emits changed rows, both of
    // which an append-only sink would duplicate; refuse rather than
    // silently multiply (Delta's own sink does the same)
    require(outputMode == org.apache.spark.sql.streaming.OutputMode.Append(),
      s"graft-delta sink supports Append output mode only, got $outputMode — " +
        "Complete/Update would duplicate rows on every trigger")
    val appId = parameters.get("txnAppId")
      .orElse(parameters.get("checkpointLocation").map("graft-delta-sink:" + _))
      .getOrElse(throw new IllegalArgumentException(
        "graft-delta sink: set option 'txnAppId' (or a per-query " +
          "'checkpointLocation' option) — without a per-query identity, " +
          "two queries writing the same table would share one " +
          "SetTransaction appId and overlapping batchIds would be " +
          "silently deduplicated (data loss). A checkpoint taken from " +
          "the spark.sql.streaming.checkpointLocation conf does not " +
          "reach the sink's options, so it cannot serve as identity."))
    new org.apache.spark.sql.execution.streaming.Sink {
      override def addBatch(batchId: Long,
          data: org.apache.spark.sql.DataFrame): Unit = {
        // a Sink's input frame cannot be re-planned (.rdd throws on
        // streaming lineage) — decode its InternalRows explicitly and
        // rebuild a batch frame, the standard v1-sink idiom
        val schema = data.schema
        val enc = org.apache.spark.sql.catalyst.encoders.ExpressionEncoder(
          org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema))
          .resolveAndBind()
        val rows = data.queryExecution.toRdd.mapPartitions { it =>
          val deser = enc.createDeserializer()
          it.map(ir => deser(ir.copy()))
        }
        val batchDf = data.sparkSession.createDataFrame(rows, schema)
        graft.io.DeltaWrite.appendOnce(batchDf, path, appId, batchId,
          partitionColumns)
        ()
      }
      override def toString: String = s"GraftDeltaSink[$path]"
    }
  }

  /** `df.write.format("graft-delta").mode(...).save(path)`:
    * Append/Overwrite delegate to the transactional writer (commit
    * CAS, stats, feature gating — everything a Scala-API write gets);
    * ErrorIfExists/Ignore honor their SaveMode contracts against the
    * table's existence. */
  override def createRelation(sqlContext: SQLContext,
      mode: org.apache.spark.sql.SaveMode, parameters: Map[String, String],
      data: org.apache.spark.sql.DataFrame): BaseRelation = {
    val path = parameters.getOrElse("path",
      throw new IllegalArgumentException("graft-delta: 'path' option is required"))
    val partitionBy = parameters.get("partitionBy")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq).getOrElse(Nil)
    val exists = java.nio.file.Files.isDirectory(
      java.nio.file.Paths.get(path, "_delta_log"))
    import org.apache.spark.sql.SaveMode._
    mode match {
      case Append => graft.io.DeltaWrite.append(data, path, partitionBy)
      case Overwrite => graft.io.DeltaWrite.overwrite(data, path, partitionBy)
      case ErrorIfExists if exists =>
        throw new IllegalStateException(
          s"graft-delta: $path already exists (SaveMode.ErrorIfExists)")
      case ErrorIfExists => graft.io.DeltaWrite.append(data, path, partitionBy)
      case Ignore if exists => ()
      case Ignore => graft.io.DeltaWrite.append(data, path, partitionBy)
    }
    createRelation(sqlContext, parameters)
  }

  override def createRelation(sqlContext: SQLContext,
      parameters: Map[String, String]): BaseRelation = {
    val path = parameters.getOrElse("path",
      throw new IllegalArgumentException("graft-delta: 'path' option is required"))
    val spark = sqlContext.sparkSession
    // readChangeFeed=true — the BATCH change-data-feed door (Delta's
    // own option shape), so pure SQL can consume exact change rows:
    //   CREATE TEMP VIEW ch USING `graft-delta` OPTIONS (
    //     path '...', readChangeFeed 'true',
    //     startingVersion '2' [, endingVersion '5'])
    // startingVersion is INCLUSIVE (Delta's batch convention; the
    // STREAMING cdf source's exclusive sinceVersion stays as
    // documented there) and required — an unbounded "all history"
    // default silently explodes on a long-lived table. Ends at the
    // current head unless endingVersion pins it.
    if (parameters.get("readChangeFeed").exists(_.equalsIgnoreCase("true"))) {
      require(!parameters.contains("versionAsOf") &&
        !parameters.contains("timestampAsOf"),
        "graft-delta: readChangeFeed and versionAsOf/timestampAsOf are " +
          "mutually exclusive — the feed is already version-bounded")
      val start = parameters.get("startingVersion").map(_.toLong).getOrElse(
        throw new IllegalArgumentException(
          "graft-delta readChangeFeed: 'startingVersion' is required " +
            "(inclusive; use 0 for the full surviving history)"))
      val head = DeltaRead.latestVersion(path)
      val end = parameters.get("endingVersion").map(_.toLong).getOrElse(head)
      require(end <= head,
        s"graft-delta readChangeFeed: endingVersion $end is ahead of the " +
          s"table head $head")
      require(start >= 0 && start <= end,
        s"graft-delta readChangeFeed: startingVersion $start must be in " +
          s"[0, endingVersion $end]")
      return new CdfBatchRelation(sqlContext, path, start, end)
    }
    val pinned = parameters.get("versionAsOf").map(_.toLong)
      .orElse(parameters.get("timestampAsOf").map { ts =>
        DeltaRead.versionAtTime(spark, path, parseTimestampOption(ts))
      })
    val version = pinned.getOrElse(DeltaRead.latestVersion(path))
    new DeltaRelation(sqlContext, path, version, pinned = pinned.isDefined)
  }

  /** `timestampAsOf` parsing lives in [[DeltaRead.parseTimestampMillis]]
    * so the SQL doors (clone, restore) resolve timestamps identically. */
  private def parseTimestampOption(ts: String): Long =
    DeltaRead.parseTimestampMillis(ts)
}

/** The batch change-feed relation: versions `[startV, endV]`'s exact
  * change rows ([[DeltaRead.changesBetween]] — cdc files when the
  * commit recorded them, add/remove/DV reconstruction otherwise), as a
  * plain v1 TableScan. The frame is version-bounded at CONSTRUCTION,
  * so repeated scans of one view are stable even while the table moves
  * (the SQL-view analogue of the streaming source's offset pinning). */
private[graft] class CdfBatchRelation(ctx: SQLContext, table: String,
    startV: Long, endV: Long) extends BaseRelation with TableScan {
  override def sqlContext: SQLContext = ctx
  // ONE construction: the range is immutable, and changesBetween's
  // history replay (snapshot + per-commit JSON parse) must not re-run
  // per scan — a [2, 500] view queried N times would otherwise replay
  // ~500 commit parses on the driver N+1 times
  private val frame: org.apache.spark.sql.DataFrame =
    DeltaRead.changesBetween(ctx.sparkSession, table, startV - 1, endV)
  override val schema: StructType = frame.schema
  override def buildScan(): RDD[Row] = frame.rdd
}

private[graft] class DeltaRelation(ctx: SQLContext, val table: String,
    val version: Long, val pinned: Boolean = false)
    extends BaseRelation with PrunedFilteredScan with InsertableRelation {
  override def sqlContext: SQLContext = ctx
  override val schema: StructType =
    DeltaRead.readVersion(ctx.sparkSession, table, version).schema

  /** SQL `INSERT INTO` / `INSERT OVERWRITE` on a graft-delta view —
    * the transactional append/overwrite, same as the Scala API.
    * NOTE: the relation keeps serving its RESOLVED version; re-create
    * the view (or re-read) to see the insert, like any v1 relation. */
  override def insert(data: org.apache.spark.sql.DataFrame,
      overwrite: Boolean): Unit =
    if (overwrite) graft.io.DeltaWrite.overwrite(data, table)
    else graft.io.DeltaWrite.append(data, table)

  override def buildScan(requiredColumns: Array[String],
      filters: Array[Filter]): RDD[Row] = {
    val spark = ctx.sparkSession
    val preds = DeltaRelation.toStatRanges(filters)
    val base =
      if (preds.isEmpty) DeltaRead.readVersion(spark, table, version)
      else DeltaRead.readVersionWhereStats(spark, table, version, preds)
    val filtered = filters.foldLeft(base) { (df, f) =>
      DeltaRelation.toColumn(f).map(df.where).getOrElse(df)
    }
    val projected =
      if (requiredColumns.isEmpty) filtered.select()
      else filtered.select(requiredColumns.map(col): _*)
    projected.rdd
  }
}

private[graft] object DeltaRelation {
  /** Comparable-literal conjuncts → per-column [lo, hi] ranges for
    * log-metadata file skipping. Only shapes whose range semantics
    * are exact translate; everything else simply skips no files. */
  private[graft] def toStatRanges(filters: Array[Filter]): Seq[DeltaRead.StatRange] = {
    val byCol = scala.collection.mutable.LinkedHashMap
      .empty[String, (Option[Any], Option[Any])]
    def tighten(c: String, lo: Option[Any], hi: Option[Any]): Unit = {
      val (l0, h0) = byCol.getOrElse(c, (None, None))
      // two bounds on one column: keep the TIGHTER one; mixed-type
      // writes are the stats reader's concern (it compares soundly)
      def pick(a: Option[Any], b: Option[Any], wantMax: Boolean): Option[Any] =
        (a, b) match {
          case (Some(x), Some(y)) => (x, y) match {
            case (x: Comparable[_], y: Any) if x.getClass == y.getClass =>
              val cmp = x.asInstanceOf[Comparable[Any]].compareTo(y)
              Some(if ((cmp >= 0) == wantMax) x else y)
            case _ => Some(x) // incomparable: keep first, still sound
          }
          case _ => a.orElse(b)
        }
      byCol(c) = (pick(lo, l0, wantMax = true), pick(hi, h0, wantMax = false))
    }
    filters.foreach {
      case EqualTo(c, v) if v != null => tighten(c, Some(v), Some(v))
      case GreaterThan(c, v) if v != null => tighten(c, Some(v), None)
      case GreaterThanOrEqual(c, v) if v != null => tighten(c, Some(v), None)
      case LessThan(c, v) if v != null => tighten(c, None, Some(v))
      case LessThanOrEqual(c, v) if v != null => tighten(c, None, Some(v))
      case In(c, vs) if vs.nonEmpty && !vs.contains(null) =>
        val sorted = vs.toSeq.sortWith {
          case (x: Comparable[_], y) if x.getClass == y.getClass =>
            x.asInstanceOf[Comparable[Any]].compareTo(y) < 0
          case _ => false
        }
        tighten(c, sorted.headOption, sorted.lastOption)
      case _ => () // unsupported shape: no pruning from it
    }
    byCol.toSeq.collect { case (c, (lo, hi)) if lo.isDefined || hi.isDefined =>
      DeltaRead.StatRange(c, lo, hi)
    }
  }

  /** v1 filters → Catalyst columns, re-applied inside the delegate so
    * they reach the parquet scan as pushed predicates. Unknown shapes
    * return None — Spark re-applies everything above the relation. */
  private[graft] def toColumn(f: Filter): Option[org.apache.spark.sql.Column] = f match {
    case EqualTo(c, v) => Some(col(c) === lit(v))
    case EqualNullSafe(c, v) => Some(col(c) <=> lit(v))
    case GreaterThan(c, v) => Some(col(c) > lit(v))
    case GreaterThanOrEqual(c, v) => Some(col(c) >= lit(v))
    case LessThan(c, v) => Some(col(c) < lit(v))
    case LessThanOrEqual(c, v) => Some(col(c) <= lit(v))
    case In(c, vs) => Some(col(c).isin(vs.toSeq: _*))
    case IsNull(c) => Some(col(c).isNull)
    case IsNotNull(c) => Some(col(c).isNotNull)
    case StringStartsWith(c, p) => Some(col(c).startsWith(p))
    case StringEndsWith(c, p) => Some(col(c).endsWith(p))
    case StringContains(c, p) => Some(col(c).contains(p))
    case And(l, r) => for (a <- toColumn(l); b <- toColumn(r)) yield a && b
    case Or(l, r) => for (a <- toColumn(l); b <- toColumn(r)) yield a || b
    case Not(x) => toColumn(x).map(!_)
    case _ => None
  }
}
