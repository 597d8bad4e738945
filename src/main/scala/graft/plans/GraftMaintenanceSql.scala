package graft.plans

import org.apache.spark.sql.{GraftCatalogBridge, Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.{IntegerType, LongType, StringType}

import graft.io.{DeltaRead, DeltaWrite}
import graft.io.v2.GraftTable

/** SQL entry points for table MAINTENANCE — the statements a nightly
  * SQL-only operator runs against the tables the catalog gave them
  * (the reference's warehouse jobs are all-SQL; without these, graft's
  * OPTIMIZE/VACUUM/RESTORE existed only behind Scala calls):
  *
  * {{{
  *   OPTIMIZE graft.db.t                            -- bin-pack small files
  *   OPTIMIZE graft.db.t ZORDER BY (a, b)           -- declare + re-cluster
  *   VACUUM graft.db.t [RETAIN 168 HOURS]           -- reclaim dead files
  *   RESTORE TABLE graft.db.t TO VERSION AS OF 3    -- roll back the head
  * }}}
  *
  * None of these are ANSI statements, so they ride an injected parser
  * ([[GraftMaintenanceParser]], registered by [[GraftExtensions]]) that
  * intercepts exactly these shapes and delegates EVERYTHING else to
  * Spark's parser untouched — the same extension door Delta Lake and
  * Iceberg use for their maintenance SQL. One deliberate ambiguity
  * comes with that door (Delta makes the same trade): `DESCRIBE
  * HISTORY x` is CLAIMED, so a table literally named `history` cannot
  * have its column `x` described via the bare `DESC history x` — use
  * `DESCRIBE TABLE history x`, which passes through untouched. The table may be a catalog
  * identifier (resolved through the session's catalogs to a
  * [[GraftTable]]) or a quoted path (`OPTIMIZE '/data/t'`) for
  * path-addressed tables. Execution delegates to the SAME transactional
  * entry points as the Scala door ([[DeltaWrite.compact]] /
  * [[DeltaWrite.vacuum]] / [[DeltaWrite.restore]] /
  * [[DeltaWrite.clusterBy]]), so the two surfaces cannot drift.
  */
class GraftMaintenanceParser(delegate: ParserInterface) extends ParserInterface {
  import GraftMaintenanceParser._

  override def parsePlan(sqlText: String): LogicalPlan =
    maintenancePlan(sqlText, delegate).getOrElse(delegate.parsePlan(sqlText))

  /** Parameterized SQL never carries maintenance statements (they take
    * no expression positions), but the delegate must keep seeing the
    * parameter context for everything else. */
  override def parsePlanWithParameters(sqlText: String,
      ctx: org.apache.spark.sql.catalyst.parser.ParameterContext): LogicalPlan =
    maintenancePlan(sqlText, delegate)
      .getOrElse(delegate.parsePlanWithParameters(sqlText, ctx))

  override def parseQuery(sqlText: String): LogicalPlan = delegate.parseQuery(sqlText)
  override def parseExpression(t: String) = delegate.parseExpression(t)
  override def parseTableIdentifier(t: String) = delegate.parseTableIdentifier(t)
  override def parseFunctionIdentifier(t: String) = delegate.parseFunctionIdentifier(t)
  override def parseMultipartIdentifier(t: String) = delegate.parseMultipartIdentifier(t)
  override def parseTableSchema(t: String) = delegate.parseTableSchema(t)
  override def parseDataType(t: String) = delegate.parseDataType(t)
  override def parseRoutineParam(t: String) = delegate.parseRoutineParam(t)
}

object GraftMaintenanceParser {
  /** A table operand: a quoted path or a multipart identifier. */
  private val Tbl = """('[^']+'|(?:`[^`]+`|[\w$])+(?:\.(?:`[^`]+`|[\w$]+))*)"""
  private val OptimizeRe =
    ("""(?is)^\s*OPTIMIZE\s+""" + Tbl +
      """(?:\s+WHERE\s+(.+?))?(?:\s+ZORDER\s+BY\s*\(([^)]+)\))?\s*;?\s*$""").r
  private val VacuumRe =
    ("""(?is)^\s*VACUUM\s+""" + Tbl +
      """(?:\s+RETAIN\s+(\d+)\s+HOURS?)?(\s+DRY\s+RUN)?\s*;?\s*$""").r
  /** One `col = literal` conjunct of an OPTIMIZE WHERE clause. */
  private val ConjunctRe = """(?s)^\s*`?([\w$]+)`?\s*=\s*(?:'([^']*)'|(\S+))\s*$""".r
  private val RestoreRe =
    ("""(?is)^\s*RESTORE\s+(?:TABLE\s+)?""" + Tbl +
      """\s+TO\s+(?:VERSION\s+AS\s+OF\s+(\d+)|TIMESTAMP\s+AS\s+OF\s+'([^']+)')""" +
      """\s*;?\s*$""").r
  private val HistoryRe =
    ("""(?is)^\s*(?:DESCRIBE|DESC)\s+HISTORY\s+""" + Tbl +
      """(?:\s+LIMIT\s+(\d+))?\s*;?\s*$""").r
  private val DetailRe =
    ("""(?is)^\s*(?:DESCRIBE|DESC)\s+DETAIL\s+""" + Tbl + """\s*;?\s*$""").r
  private val CloneRe =
    ("""(?is)^\s*CREATE\s+(OR\s+REPLACE\s+)?TABLE\s+(IF\s+NOT\s+EXISTS\s+)?""" +
      Tbl + """\s+(SHALLOW|DEEP)\s+CLONE\s+""" + Tbl +
      """(?:\s+VERSION\s+AS\s+OF\s+(\d+)|\s+TIMESTAMP\s+AS\s+OF\s+'([^']+)')?""" +
      """\s*;?\s*$""").r
  private val CopyIntoRe =
    ("""(?is)^\s*COPY\s+INTO\s+""" + Tbl + """\s+FROM\s+'([^']+)'""" +
      """\s+FILEFORMAT\s*=\s*(\w+)""" +
      """(?:\s+PATTERN\s*=\s*'([^']+)')?""" +
      """(?:\s+FORCE\s*=\s*(true|false))?\s*;?\s*$""").r
  private val ConvertRe =
    ("""(?is)^\s*CONVERT\s+TO\s+DELTA\s+'([^']+)'""" +
      """(?:\s+PARTITIONED\s+BY\s*\(([^)]+)\))?\s*;?\s*$""").r
  private val FsckRe =
    ("""(?is)^\s*FSCK\s+REPAIR\s+TABLE\s+""" + Tbl +
      """(\s+DRY\s+RUN)?\s*;?\s*$""").r
  private val GenerateRe =
    ("""(?is)^\s*GENERATE\s+symlink_format_manifest\s+FOR\s+TABLE\s+""" +
      Tbl + """\s*;?\s*$""").r

  private def firstWord(sql: String): String =
    sql.trim.takeWhile(!_.isWhitespace).toUpperCase(java.util.Locale.ROOT)

  private def tableSpec(tok: String,
      delegate: ParserInterface): Either[String, Seq[String]] =
    if (tok.startsWith("'")) Left(tok.stripPrefix("'").stripSuffix("'"))
    else Right(delegate.parseMultipartIdentifier(tok))

  def maintenancePlan(sqlText: String,
      delegate: ParserInterface): Option[LogicalPlan] =
    firstWord(sqlText) match {
      case "OPTIMIZE" => sqlText match {
        case OptimizeRe(tok, where, z) =>
          val zcols = Option(z).toSeq.flatMap(_.split(",").toSeq)
            .map(_.trim.stripPrefix("`").stripSuffix("`")).filter(_.nonEmpty)
          // WHERE scopes the pass to partitions: a conjunction of
          // `col = literal` over partition columns — anything else
          // refuses loudly (a silently ignored predicate would read as
          // "optimized everything")
          val conjuncts = Option(where).toSeq
            .flatMap(_.split("""(?i)\s+AND\s+""").toSeq).map {
              case ConjunctRe(col, quoted, bare) =>
                col.toLowerCase(java.util.Locale.ROOT) ->
                  Option(quoted).getOrElse(bare)
              case other => throw new UnsupportedOperationException(
                s"OPTIMIZE WHERE supports `partitionCol = literal` " +
                  s"conjunctions only, got: $other")
            }
          // a column named twice would silently collapse through toMap:
          // `WHERE p='1' AND p='2'` (selects nothing) must not compact
          // p=2 — refuse the ambiguity instead
          conjuncts.groupBy(_._1).foreach { case (c, vs) =>
            if (vs.map(_._2).distinct.size > 1)
              throw new UnsupportedOperationException(
                s"OPTIMIZE WHERE names '$c' twice with different values " +
                  s"(${vs.map(_._2).mkString(", ")}) — the predicate " +
                  "selects no partition")
          }
          val parts = conjuncts.toMap
          Some(GraftOptimizeCommand(tableSpec(tok, delegate), zcols, parts))
        case _ => None
      }
      case "VACUUM" => sqlText match {
        case VacuumRe(tok, hours, dry) =>
          Some(GraftVacuumCommand(tableSpec(tok, delegate),
            Option(hours).map(_.toLong * 3600L * 1000L),
            dryRun = dry != null))
        case _ => None
      }
      case "RESTORE" => sqlText match {
        case RestoreRe(tok, v, ts) =>
          Some(GraftRestoreCommand(tableSpec(tok, delegate),
            Option(v).map(_.toLong), Option(ts)))
        case _ => None
      }
      // only DESCRIBE HISTORY/DETAIL are ours — plain DESCRIBE stays Spark's
      case "DESCRIBE" | "DESC" => sqlText match {
        case HistoryRe(tok, limit) =>
          Some(GraftHistoryCommand(tableSpec(tok, delegate),
            Option(limit).map(_.toInt)))
        case DetailRe(tok) =>
          Some(GraftDetailCommand(tableSpec(tok, delegate)))
        case _ => None
      }
      case "GENERATE" => sqlText match {
        case GenerateRe(tok) =>
          Some(GraftGenerateCommand(tableSpec(tok, delegate)))
        case _ => None
      }
      case "FSCK" => sqlText match {
        case FsckRe(tok, dry) =>
          Some(GraftFsckCommand(tableSpec(tok, delegate), dryRun = dry != null))
        case _ => None
      }
      case "CONVERT" => sqlText match {
        case ConvertRe(path, parts) =>
          Some(GraftConvertCommand(path,
            Option(parts).map(delegate.parseTableSchema)))
        case _ => None
      }
      case "COPY" => sqlText match {
        case CopyIntoRe(tok, from, fmt, pat, force) =>
          Some(GraftCopyIntoCommand(tableSpec(tok, delegate), from,
            fmt.toLowerCase(java.util.Locale.ROOT), Option(pat),
            force = force != null && force.equalsIgnoreCase("true")))
        case _ => None
      }
      // ONLY the SHALLOW/DEEP CLONE forms are claimed — every other
      // CREATE (tables, views, functions, namespaces) stays Spark's
      case "CREATE" => sqlText match {
        case CloneRe(orReplace, ifNotExists, dstTok, kind, srcTok, v, ts) =>
          require(orReplace == null || ifNotExists == null,
            "CREATE TABLE ... CLONE: OR REPLACE and IF NOT " +
              "EXISTS cannot be combined")
          Some(GraftCloneCommand(tableSpec(dstTok, delegate),
            tableSpec(srcTok, delegate), Option(v).map(_.toLong),
            replace = orReplace != null, ifNotExists = ifNotExists != null,
            timestamp = Option(ts),
            deep = kind.equalsIgnoreCase("DEEP")))
        case _ => None
      }
      case _ => None
    }

  /** A quoted path is used as-is (must hold a `_delta_log`); an
    * identifier resolves through the session's catalogs and must land
    * on a [[GraftTable]] — maintenance on a foreign table would commit
    * with this writer's feature set, not its owner's. */
  private[plans] def resolvePath(spark: SparkSession,
      table: Either[String, Seq[String]]): String = table match {
    case Left(path) =>
      require(DeltaRead.latestVersion(path) >= 0,
        s"maintenance: $path is not a Delta table (no _delta_log)")
      path
    case Right(parts) =>
      val (plugin, ident) = GraftCatalogBridge.resolve(spark, parts)
      plugin match {
        case tc: org.apache.spark.sql.connector.catalog.TableCatalog =>
          tc.loadTable(ident) match {
            case g: GraftTable => g.path
            case other => throw new UnsupportedOperationException(
              s"maintenance: ${parts.mkString(".")} is not a graft-delta " +
                s"table (got ${other.getClass.getSimpleName})")
          }
        case _ => throw new UnsupportedOperationException(
          s"maintenance: catalog '${plugin.name()}' is not a table catalog")
      }
  }

  /** Like [[resolvePath]] but for a table that may not EXIST yet (the
    * clone destination): a quoted path is used as-is; an identifier
    * resolves to where a [[graft.io.v2.GraftCatalog]] would place it —
    * existing or not — so the created directory is discoverable by
    * `loadTable` the moment the clone commits (the catalog is
    * directory-backed; no separate registration step). */
  private[plans] def resolveCreatePath(spark: SparkSession,
      table: Either[String, Seq[String]]): String = table match {
    case Left(path) => path
    case Right(parts) =>
      val (plugin, ident) = GraftCatalogBridge.resolve(spark, parts)
      plugin match {
        case gc: graft.io.v2.GraftCatalog => gc.dirForIdent(ident).toString
        case other => throw new UnsupportedOperationException(
          s"SHALLOW CLONE: destination catalog '${other.name()}' is not a " +
            "GraftCatalog — clone to a quoted path or a graft catalog " +
            "identifier")
      }
  }
}

/** `OPTIMIZE t [WHERE partCol = v [AND ...]] [ZORDER BY (cols)]` →
  * [[DeltaWrite.compact]], after declaring the clustering columns when
  * a ZORDER clause names a different set than the table currently
  * carries (re-declaration is its own commit; an unchanged declaration
  * is skipped so nightly runs converge to pure no-ops). WHERE scopes
  * the pass to the named partitions — at 100 TB the nightly OPTIMIZE
  * touches one day, not the table. Returns the net file-count
  * reduction. */
case class GraftOptimizeCommand(table: Either[String, Seq[String]],
    zorderBy: Seq[String],
    partitions: Map[String, String] = Map.empty) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("path", StringType, nullable = false)(),
    AttributeReference("net_files_removed", IntegerType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val path = GraftMaintenanceParser.resolvePath(spark, table)
    if (zorderBy.nonEmpty) {
      val cur = DeltaWrite.clusteringColumns(DeltaRead.snapshot(spark, path))
      // compare case-insensitively, like the writer resolves: a
      // case-mismatched ZORDER clause must NOT re-commit an identical
      // CLUSTER BY declaration on every nightly run
      val same = cur.size == zorderBy.size &&
        cur.zip(zorderBy).forall { case (a, b) => a.equalsIgnoreCase(b) }
      if (!same) DeltaWrite.clusterBy(spark, path, zorderBy)
    }
    Seq(Row(path, DeltaWrite.compact(spark, path, partitions = partitions)))
  }
  override def simpleString(maxFields: Int): String =
    s"GraftOptimizeCommand $table" +
      (if (partitions.isEmpty) "" else s" WHERE $partitions") +
      (if (zorderBy.isEmpty) "" else s" ZORDER BY ${zorderBy.mkString(",")}")
}

/** `VACUUM t [RETAIN n HOURS] [DRY RUN]` → [[DeltaWrite.vacuum]]. The
  * writer clamps the horizon to `oldestResolvableVersion`, so an
  * aggressive RETAIN can never strand a restorable version. DRY RUN
  * reports the reclaim count without touching a byte — the pre-flight
  * before an aggressive RETAIN. */
case class GraftVacuumCommand(table: Either[String, Seq[String]],
    retainMs: Option[Long], dryRun: Boolean = false) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("path", StringType, nullable = false)(),
    AttributeReference("files_deleted", IntegerType, nullable = false)(),
    AttributeReference("dry_run", org.apache.spark.sql.types.BooleanType,
      nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val path = GraftMaintenanceParser.resolvePath(spark, table)
    val n = retainMs.map(ms => DeltaWrite.vacuum(spark, path, ms, dryRun))
      .getOrElse(DeltaWrite.vacuum(spark, path, dryRun = dryRun))
    Seq(Row(path, n, dryRun))
  }
  override def simpleString(maxFields: Int): String =
    s"GraftVacuumCommand $table" +
      retainMs.map(ms => s" RETAIN ${ms}ms").getOrElse("") +
      (if (dryRun) " DRY RUN" else "")
}

/** `DESCRIBE HISTORY t [LIMIT n]` → [[DeltaRead.history]]: one row per
  * surviving commit, newest first — (version, commit timestamp millis,
  * operation). The audit surface a SQL-only operator reads before
  * deciding what to RESTORE or VACUUM. */
case class GraftHistoryCommand(table: Either[String, Seq[String]],
    limit: Option[Int]) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType, nullable = false)(),
    AttributeReference("ts_millis", LongType, nullable = true)(),
    AttributeReference("operation", StringType, nullable = true)())
  override def run(spark: SparkSession): Seq[Row] = {
    val path = GraftMaintenanceParser.resolvePath(spark, table)
    // LIMIT pushes into the log read: only the newest n commit files
    // are parsed (a long-lived table's "check the last 10 operations"
    // must not replay the whole log on the driver)
    DeltaRead.history(path, limit)
      .map { case (v, ts, op) => Row(v, ts.map(Long.box).orNull, op.orNull) }
  }
  override def simpleString(maxFields: Int): String =
    s"GraftHistoryCommand $table${limit.map(n => s" LIMIT $n").getOrElse("")}"
}

/** `DESCRIBE DETAIL t` — the table-level summary an operator reads
  * before deciding maintenance (Delta's surface of the same name):
  * head version, live file count and bytes, partitioning, clustering,
  * protocol versions + features, and the table properties. One
  * snapshot resolution; file sizes come from the log's `add.size`
  * (filesystem stat only for a legacy action lacking the field). */
case class GraftDetailCommand(table: Either[String, Seq[String]])
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("format", StringType, nullable = false)(),
    AttributeReference("location", StringType, nullable = false)(),
    AttributeReference("version", LongType, nullable = false)(),
    AttributeReference("num_files", LongType, nullable = false)(),
    AttributeReference("size_bytes", LongType, nullable = false)(),
    AttributeReference("partition_columns", StringType, nullable = false)(),
    AttributeReference("clustering_columns", StringType, nullable = false)(),
    AttributeReference("min_reader_version", IntegerType, nullable = false)(),
    AttributeReference("min_writer_version", IntegerType, nullable = false)(),
    AttributeReference("table_features", StringType, nullable = false)(),
    AttributeReference("properties", StringType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val path = GraftMaintenanceParser.resolvePath(spark, table)
    val s = DeltaRead.snapshot(spark, path)
    // sizes come from the LOG's add.size (protocol-required on every
    // add) — a metadata-only answer at any file count. Only a legacy
    // self-written action lacking the field falls back to a stat, and
    // THERE a live file missing from disk is table damage, not a
    // detail to paper over as 0 bytes — it errors rather than
    // under-report.
    // index-routed: the Dataset tier answers (count, bytes) as one
    // executor-side aggregate — the driver never materializes entries
    val (nFiles, bytes) = s.index match {
      case idx: DeltaRead.DatasetIndex => idx.countAndBytes
      case _ => (s.files.size.toLong, s.files.map(_.sizeOrStat(path)).sum)
    }
    val features = (s.readerFeatures ++ s.writerFeatures).toSeq.sorted
    val props = s.configuration.toSeq.sortBy(_._1)
      .map { case (k, v) => s"$k=$v" }
    Seq(Row("graft-delta", path, s.version, nFiles, bytes,
      s.partitionColumns.mkString(","),
      DeltaWrite.clusteringColumns(s).mkString(","),
      s.minReaderVersion, s.minWriterVersion,
      features.mkString(","), props.mkString(";")))
  }
  override def simpleString(maxFields: Int): String =
    s"GraftDetailCommand $table"
}

/** `RESTORE TABLE t TO VERSION AS OF v` → [[DeltaWrite.restore]]: a
  * NEW head commit reinstating version v's file set (history is kept —
  * a restore is itself undoable). */
case class GraftRestoreCommand(table: Either[String, Seq[String]],
    version: Option[Long], timestamp: Option[String] = None)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("path", StringType, nullable = false)(),
    AttributeReference("restored_to", LongType, nullable = false)(),
    AttributeReference("new_version", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val path = GraftMaintenanceParser.resolvePath(spark, table)
    val v = version
      .orElse(timestamp.map(ts => DeltaRead.versionAtTime(spark, path,
        DeltaRead.parseTimestampMillis(ts))))
      .getOrElse(throw new IllegalArgumentException(
        "RESTORE needs VERSION AS OF or TIMESTAMP AS OF"))
    val newV = DeltaWrite.restore(spark, path, v)
    Seq(Row(path, v, newV))
  }
  override def simpleString(maxFields: Int): String =
    s"GraftRestoreCommand $table TO " +
      version.map(v => s"VERSION AS OF $v")
        .getOrElse(s"TIMESTAMP AS OF ${timestamp.getOrElse("?")}")
}

/** `CREATE [OR REPLACE] TABLE [IF NOT EXISTS] dst SHALLOW CLONE src
  * [VERSION AS OF v]` → [[DeltaWrite.shallowClone]]: a metadata-only
  * table whose add actions point (absolutely) at the SOURCE's live
  * data files as of the cloned version — the zero-copy dev/test
  * snapshot of a 100 TB table. `IF NOT EXISTS` no-ops (source_version
  * −1) when the destination already is a table; `OR REPLACE`
  * re-points an existing table in one commit, history intact. */
case class GraftCloneCommand(dest: Either[String, Seq[String]],
    source: Either[String, Seq[String]], version: Option[Long],
    replace: Boolean, ifNotExists: Boolean,
    timestamp: Option[String] = None,
    deep: Boolean = false) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("path", StringType, nullable = false)(),
    AttributeReference("source_path", StringType, nullable = false)(),
    AttributeReference("source_version", LongType, nullable = false)(),
    AttributeReference("committed_version", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val src = GraftMaintenanceParser.resolvePath(spark, source)
    val dst = GraftMaintenanceParser.resolveCreatePath(spark, dest)
    val dstExists = java.nio.file.Files.isDirectory(
      java.nio.file.Paths.get(dst, "_delta_log"))
    if (ifNotExists && dstExists) return Seq(Row(dst, src, -1L, -1L))
    val v = version
      .orElse(timestamp.map(ts => DeltaRead.versionAtTime(spark, src,
        DeltaRead.parseTimestampMillis(ts))))
      .getOrElse(DeltaRead.latestVersion(src))
    val committed =
      if (deep) DeltaWrite.deepClone(spark, src, dst, Some(v), replace)
      else DeltaWrite.shallowClone(spark, src, dst, Some(v), replace)
    Seq(Row(dst, src, v, committed))
  }
  override def simpleString(maxFields: Int): String =
    s"GraftCloneCommand $dest ${if (deep) "DEEP" else "SHALLOW"} CLONE $source" +
      version.map(v => s" VERSION AS OF $v").getOrElse("")
}

/** `COPY INTO t FROM '/dir' FILEFORMAT = PARQUET [PATTERN = '*.parquet']
  * [FORCE = true]` → [[DeltaWrite.copyInto]]: idempotent bulk file
  * ingestion — re-running the statement loads only files that arrived
  * since the last run (exactly-once under racing copies via the
  * ledger's SetTransaction generation). */
case class GraftCopyIntoCommand(table: Either[String, Seq[String]],
    from: String, format: String, pattern: Option[String],
    force: Boolean) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("path", StringType, nullable = false)(),
    AttributeReference("version", LongType, nullable = true)(),
    AttributeReference("files_loaded", IntegerType, nullable = false)(),
    AttributeReference("rows_loaded", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val path = GraftMaintenanceParser.resolvePath(spark, table)
    val r = DeltaWrite.copyInto(spark, path, from, format, pattern, force)
    Seq(Row(path, r.version.map(Long.box).orNull, r.filesLoaded, r.rowsLoaded))
  }
  override def simpleString(maxFields: Int): String =
    s"GraftCopyIntoCommand $table FROM $from FILEFORMAT $format" +
      pattern.map(p => s" PATTERN $p").getOrElse("") +
      (if (force) " FORCE" else "")
}

/** `CONVERT TO DELTA '/dir' [PARTITIONED BY (p INT, ...)]` →
  * [[DeltaWrite.convertToDelta]]: a Delta log over an existing parquet
  * directory in place — no data read or moved, footer stats harvested
  * so data skipping works from version 0. The 100 TB migration door. */
case class GraftConvertCommand(path: String,
    partitionSchema: Option[org.apache.spark.sql.types.StructType])
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("path", StringType, nullable = false)(),
    AttributeReference("files", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    DeltaWrite.convertToDelta(spark, path, partitionSchema)
    Seq(Row(path, DeltaRead.snapshot(spark, path).files.size.toLong))
  }
  override def simpleString(maxFields: Int): String =
    s"GraftConvertCommand $path" +
      partitionSchema.map(s => s" PARTITIONED BY ${s.simpleString}").getOrElse("")
}

/** `FSCK REPAIR TABLE t [DRY RUN]` → [[DeltaWrite.fsck]]: tombstone
  * live adds whose data files (or DV bitmaps) were deleted out-of-band
  * so scans stop dying on them; DRY RUN reports one row per missing
  * file without committing (shared candidate enumeration). */
case class GraftFsckCommand(table: Either[String, Seq[String]],
    dryRun: Boolean) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("path", StringType, nullable = false)(),
    AttributeReference("removed_file", StringType, nullable = false)(),
    AttributeReference("dry_run", org.apache.spark.sql.types.BooleanType,
      nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val path = GraftMaintenanceParser.resolvePath(spark, table)
    DeltaWrite.fsck(spark, path, dryRun)
      .map(f => Row(path, f.path, dryRun))
  }
  override def simpleString(maxFields: Int): String =
    s"GraftFsckCommand $table" + (if (dryRun) " DRY RUN" else "")
}

/** `GENERATE symlink_format_manifest FOR TABLE t` →
  * [[DeltaWrite.generateSymlinkManifest]]: the Presto/Trino/Athena
  * interop manifest tree, regenerated whole. */
case class GraftGenerateCommand(table: Either[String, Seq[String]])
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("path", StringType, nullable = false)(),
    AttributeReference("manifests_written", IntegerType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val path = GraftMaintenanceParser.resolvePath(spark, table)
    Seq(Row(path, DeltaWrite.generateSymlinkManifest(spark, path)))
  }
  override def simpleString(maxFields: Int): String =
    s"GraftGenerateCommand $table"
}
