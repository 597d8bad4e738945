package graft.streaming

import java.nio.charset.StandardCharsets

import graft.io.DeltaRead
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.SerializedOffset
import org.apache.spark.sql.types.StructType

/** `readStream.format("graft-delta")` — a PLAIN Delta table as a
  * streaming source (the shape every downstream lakehouse job starts
  * from): an initial snapshot of the table, then each commit's
  * `dataChange` adds as they land, complementing the change-feed
  * source ([[DeltaCdfStreamProvider]]) for tables that never enabled
  * CDF.
  *
  * {{{
  *   spark.readStream.format("graft-delta")
  *     .option("maxFilesPerTrigger", "4")   // optional rate limit
  *     .option("maxBytesPerTrigger", "1g-in-bytes") // optional: byte
  *                                          //   pacing off add.size —
  *                                          //   mixed file sizes can't
  *                                          //   starve or flood a batch
  *     .option("startingVersion", "0")      // optional: no snapshot,
  *                                          //   adds from v0 on
  *     .option("skipChangeCommits", "true") // optional: see below
  *     .load(tablePath)
  * }}}
  *
  * Both rate limits may be set; a batch closes at whichever budget
  * fills first. A single file larger than the whole byte budget is
  * admitted alone (the floor is one file per batch). Under
  * `Trigger.AvailableNow` the source drains exactly to the head
  * captured at query start — in rate-limited batches — then stops.
  *
  * Offsets are FILE-GRANULAR — `{"version": v, "index": i}` = "the
  * first `i` files of version v's file list (and everything before)
  * have been surfaced", where a version's file list is the base
  * snapshot's live files for the base version and the commit's sorted
  * `dataChange=true` adds after it. File granularity is what makes
  * `maxFilesPerTrigger` a real rate limit THROUGH the initial
  * snapshot: a 100 TB table's bootstrap paces file-by-file instead of
  * one giant batch. Each batch reads ONLY its offset-range files
  * ([[DeltaRead.readFilesWithLineage]]) — per-trigger cost is bounded
  * by the new files, never O(table).
  *
  * The BASE version (whose full snapshot seeds the stream) is resolved
  * once at first start and persisted under the checkpoint's source
  * metadata directory, so a restarted query keeps indexing the SAME
  * file lists — the head having moved cannot shift offsets already in
  * the checkpoint log.
  *
  * Maintenance commits (OPTIMIZE / compaction: `dataChange=false`) are
  * invisible by construction — their adds never enter any file list.
  * Commits that REMOVE data (deletes/updates/overwrites) cannot be
  * represented in an append-only stream: the source REFUSES them
  * loudly by default; `skipChangeCommits=true` opts into skipping such
  * commits entirely (their adds included — rewritten old rows must not
  * resurface as inserts), Delta's own documented semantics for that
  * option. */
class DeltaTableSource(spark: SparkSession, table: String,
    metadataPath: String, startingVersion: Option[Long],
    maxFilesPerTrigger: Option[Int], skipChangeCommits: Boolean,
    maxBytesPerTrigger: Option[Long] = None)
    extends Source
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {

  /** (base version, whether the base contributes its full snapshot,
    * the schema the stream was BOOTSTRAPPED with) — resolved once per
    * CHECKPOINT, not per source instance. The marker lives under the
    * checkpoint's source-metadata directory, which Spark hands over as
    * a URI STRING (`file:/...`, `hdfs://...`) — it must be resolved
    * through the checkpoint's Hadoop filesystem, never `java.nio.Paths`
    * (which would silently create a CWD-relative `file:/...` directory
    * and lose the marker on restart from another working directory or
    * node — exactly the offset-misalignment the marker exists to
    * prevent).
    *
    * The schema rides the marker (line 2, its JSON form) so a RESTART
    * after the table's schema evolved fails with an actionable refusal
    * instead of a mid-plan assertion: the restarted query's logical
    * plan carries the CURRENT head schema (the provider's sourceSchema
    * can only see the head — it has no checkpoint to consult), while
    * the checkpointed offsets index files written under the bootstrap
    * schema; no answer the source could serve satisfies both. */
  private val (base: Long, baseIsSnapshot: Boolean, schemaAtBase: StructType) = {
    val dir = new org.apache.hadoop.fs.Path(metadataPath)
    val f = new org.apache.hadoop.fs.Path(dir, "graft-table-source")
    val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
    def resolveNow(): (Long, Boolean) = startingVersion match {
      // startingVersion v = adds from v on, no snapshot: encode as an
      // empty base at v-1 so the walk naturally starts at v
      case Some(v) => (v - 1, false)
      case None => (DeltaRead.latestVersion(table), true)
    }
    def schemaOf(b: Long): StructType =
      DeltaRead.readVersionSchema(spark, table, math.max(b, 0L))
    if (fs.exists(f)) {
      val in = fs.open(f)
      val raw = try new String(
        org.apache.commons.io.IOUtils.toByteArray(in), StandardCharsets.UTF_8)
      finally in.close()
      val lines = raw.trim.split("\n", 2)
      val Array(b, snap) = lines(0).trim.split(",")
      val persisted =
        if (lines.length > 1 && lines(1).trim.nonEmpty)
          org.apache.spark.sql.types.DataType.fromJson(lines(1).trim)
            .asInstanceOf[StructType]
        else schemaOf(b.toLong) // legacy marker: pre-schema format
      // the restarted logical plan resolves the schema the same way a
      // FIRST start would (the provider cannot see this marker) — if
      // the table's schema moved since bootstrap, the plan and the
      // checkpointed data disagree and nothing downstream can be trusted
      val current = schemaOf(resolveNow()._1)
      if (DeltaTableSource.shapeOf(current) !=
          DeltaTableSource.shapeOf(persisted)) throw new IllegalStateException(
        s"graft-delta source: $table schema changed since this " +
          s"checkpoint was created — was ${persisted.simpleString}, now " +
          s"${current.simpleString}. An append-only tail cannot migrate " +
          "mid-checkpoint: re-bootstrap from a NEW checkpoint location " +
          "(optionally with startingVersion to skip the snapshot).")
      (b.toLong, snap.toBoolean, persisted)
    } else {
      val resolved = resolveNow()
      val schema = schemaOf(resolved._1)
      fs.mkdirs(dir)
      // create-no-overwrite: two racing first starts agree or one fails
      val out = fs.create(f, false)
      try out.write(s"${resolved._1},${resolved._2}\n${schema.json}"
        .getBytes(StandardCharsets.UTF_8))
      finally out.close()
      (resolved._1, resolved._2, schema)
    }
  }

  override val schema: StructType = schemaAtBase

  /** A version's surfaceable (file path, size) pairs, in the stable
    * order the offsets index. Sizes come from the LOG's `add.size`
    * (what byte pacing budgets against — never a per-file stat at
    * scale). Cached: lists are re-enumerated on every
    * getOffset/getBatch walk and commit JSONs are immutable. Entries
    * below the committed watermark are evicted in [[commit]] — a
    * long-lived tail over an active table must hold O(uncommitted
    * window) driver state, not O(history). */
  private val listCache =
    scala.collection.mutable.HashMap.empty[Long, Seq[(String, Long)]]
  private def fileList(v: Long): Seq[(String, Long)] = listCache.getOrElseUpdate(v, {
    if (v == base) {
      if (!baseIsSnapshot) Nil
      else DeltaRead.snapshotAt(spark, table, base).index match {
        // Dataset tier: the bootstrap needs only the (path, size)
        // pacing pair, so it enumerates straight from the frame —
        // materializing full FileEntries (stats JSON, DV descriptors,
        // partition maps) for the whole base snapshot is exactly the
        // driver ceiling the tier exists to avoid, and it is the first
        // thing a 100 TB tail would do
        case idx: DeltaRead.DatasetIndex =>
          import org.apache.spark.sql.functions.col
          idx.df.select(col("path"), col("size"))
            .orderBy(col("path")).collect()
            .map(r => (r.getString(0),
              if (r.isNullAt(1))
                java.nio.file.Files.size(DeltaRead.dataPath(table, r.getString(0)))
              else r.getLong(1))).toSeq
        case idx =>
          idx.seq.map(f => (f.path, f.sizeOrStat(table))).sortBy(_._1)
      }
    } else {
      // a commit that DECLARED a different schema poisons every later
      // file list: cross-version unions against the bootstrap schema
      // would fail (or worse, silently null-fill) — refuse at the first
      // drifted commit with the re-bootstrap pointer. Width-only
      // metaData commits (properties, same schema) pass through.
      DeltaRead.commitSchemaChange(table, v).foreach { json =>
        val declared = org.apache.spark.sql.types.DataType.fromJson(json)
          .asInstanceOf[StructType]
        // compare SHAPE (names + types), not StructType equality: a
        // commit's declared schema carries writer metadata (identity,
        // mapping ids) the logical read schema does not — a properties
        // or constraint commit re-declaring the same columns must pass
        if (DeltaTableSource.shapeOf(declared) !=
            DeltaTableSource.shapeOf(schemaAtBase)) throw new IllegalStateException(
          s"graft-delta source: $table version $v changed the schema " +
            s"(was ${schemaAtBase.simpleString}, now ${declared.simpleString}) " +
            "— an append-only tail cannot migrate mid-stream. Re-bootstrap " +
            "from a new checkpoint (startingVersion >= " + v + ").")
      }
      val (adds, removesData) = DeltaRead.commitAdds(table, v)
      if (removesData && !skipChangeCommits)
        throw new IllegalStateException(
          s"graft-delta source: $table version $v removes data " +
            "(delete/update/overwrite) — an append-only stream cannot " +
            "represent it. Use the graft-delta-cdf source for the full " +
            "change feed, or option skipChangeCommits=true to skip such " +
            "commits entirely.")
      if (removesData) Nil else adds
    }
  })

  private def parse(o: Offset): (Long, Int) = {
    val json = o match {
      case s: SerializedOffset => s.json
      case other => other.json
    }
    val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(json)
    (node.get("version").asLong(), node.get("index").asInt())
  }
  private def offsetOf(v: Long, i: Int): Offset = new Offset {
    override val json: String = s"""{"version":$v,"index":$i}"""
  }

  /** Latest position already handed to getOffset/getBatch — the rate
    * limit advances from here; recovery replays re-teach it. */
  @volatile private var surfaced: (Long, Int) = (base, 0)

  /** `Trigger.AvailableNow` bound, captured ONCE at query start: the
    * head version at that moment. The paced walk never looks past it,
    * so the run drains exactly to the start-head (in as many
    * rate-limited batches as the budgets dictate) and then stops —
    * commits landing DURING the drain wait for the next run. Spark
    * calls [[prepareForTriggerAvailableNow]] only under that trigger;
    * other triggers leave the bound unset and the walk chases the live
    * head. Implementing [[SupportsTriggerAvailableNow]] directly (the
    * FileStreamSource pattern) matters: the generic wrapper Spark
    * would otherwise apply captures the delegate's RATE-LIMITED next
    * offset as the bound, under-draining a paced source to its first
    * chunk. */
  @volatile private var availableNowHead: Option[Long] = None
  override def prepareForTriggerAvailableNow(): Unit =
    availableNowHead = Some(DeltaRead.latestVersion(table))
  /** Pacing is the source's own options, not engine-imposed. */
  override def getDefaultReadLimit
      : org.apache.spark.sql.connector.read.streaming.ReadLimit =
    org.apache.spark.sql.connector.read.streaming.ReadLimit.allAvailable()
  /** Admission-control twin of [[getOffset]] — the door Spark actually
    * calls once a source declares [[SupportsTriggerAvailableNow]]. */
  override def latestOffset(
      start: org.apache.spark.sql.connector.read.streaming.Offset,
      limit: org.apache.spark.sql.connector.read.streaming.ReadLimit)
      : org.apache.spark.sql.connector.read.streaming.Offset =
    getOffset.orNull

  override def getOffset: Option[Offset] = {
    val head = availableNowHead.fold(DeltaRead.latestVersion(table))(
      b => math.min(b, DeltaRead.latestVersion(table)))
    var (v, i) = surfaced
    var fileBudget = maxFilesPerTrigger.map(_.toLong).getOrElse(Long.MaxValue)
    var byteBudget = maxBytesPerTrigger.getOrElse(Long.MaxValue)
    var taken = 0L
    var exhausted = false
    while (fileBudget > 0 && byteBudget > 0 && !exhausted) {
      val list = fileList(v)
      // per-file admission: bytes count against the budget as files are
      // taken, and a batch never exceeds it EXCEPT a single oversized
      // file admitted alone (a file larger than the whole budget must
      // still flow — the floor is one file per batch, like Delta's own
      // maxBytesPerTrigger)
      var blocked = false
      while (!blocked && i < list.size && fileBudget > 0 && byteBudget > 0) {
        val sz = list(i)._2
        if (sz <= byteBudget || taken == 0) {
          i += 1; taken += 1; fileBudget -= 1
          byteBudget = math.max(0L, byteBudget - sz)
        } else blocked = true
      }
      if (blocked) exhausted = true // the next file doesn't fit this batch
      else if (i >= list.size) {
        if (v < head) { v += 1; i = 0 } else exhausted = true
      }
    }
    if (taken == 0) None // nothing new (empty/maintenance commits rewalk cheaply)
    else { surfaced = (v, i); Some(offsetOf(v, i)) }
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val (sv, si) = start.map(parse).getOrElse((base, 0))
    val (ev, ei) = parse(end)
    if (surfaced._1 < ev || (surfaced._1 == ev && surfaced._2 < ei))
      surfaced = (ev, ei)
    val frames = (sv to ev).flatMap { v =>
      val list = fileList(v)
      val from = if (v == sv) si else 0
      val until = if (v == ev) ei else list.size
      val slice = list.slice(from, until).map(_._1)
      if (slice.isEmpty) None
      else Some(DeltaRead.readFilesWithLineage(spark, table, v, slice.toSet)
        .drop(DeltaRead.LineageFile, DeltaRead.LineagePos))
    }
    val batch = frames.reduceOption(_ unionByName _).getOrElse(
      DeltaRead.readFilesWithLineage(spark, table, math.max(base, 0L), Set.empty)
        .drop(DeltaRead.LineageFile, DeltaRead.LineagePos))
    org.apache.spark.sql.graft.StreamingFrames.asStreaming(batch)
  }

  override def commit(end: Offset): Unit = {
    // versions at or below the committed offset can never be asked for
    // again on THIS instance (restarts build a fresh source) — drop
    // their file lists; the partially-consumed end version stays
    val (ev, _) = parse(end)
    listCache.filterInPlace((v, _) => v >= ev)
  }
  override def stop(): Unit = ()
  override def toString: String = s"DeltaTableSource[$table]"
}

private[streaming] object DeltaTableSource {
  /** A schema's user-visible shape: (name, nullability-normalized type)
    * per field — what schema-drift refusal compares. Field metadata
    * (identity marks, column-mapping ids) and NULLABILITY — at EVERY
    * nesting level — are excluded: a commit's declared schema routinely
    * records tighter nullability than the parquet-scan schema the
    * stream serves (the read side relaxes nullability recursively, so
    * a struct column's inner fields differ too — a same-schema
    * metaData commit like enabling CDF must pass), and an append-only
    * union is indifferent to it. Only a name/type change makes the
    * checkpointed offsets unservable. */
  def shapeOf(s: StructType): Seq[(String, org.apache.spark.sql.types.DataType)] =
    s.fields.toSeq.map(f => (f.name, normalize(f.dataType)))

  import org.apache.spark.sql.types._
  private def normalize(dt: DataType): DataType = dt match {
    case st: StructType => StructType(st.fields.map(f =>
      StructField(f.name, normalize(f.dataType), nullable = true)))
    case ArrayType(et, _) => ArrayType(normalize(et), containsNull = true)
    case MapType(k, v, _) =>
      MapType(normalize(k), normalize(v), valueContainsNull = true)
    case other => other
  }
}
