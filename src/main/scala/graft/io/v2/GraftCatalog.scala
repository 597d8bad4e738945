package graft.io.v2

import java.nio.file.{Files, Path, Paths}
import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.{Expressions, Transform}
import org.apache.spark.sql.connector.expressions.filter.{AlwaysFalse, AlwaysTrue, And => V2And, Not => V2Not, Or => V2Or, Predicate => V2Predicate}
import org.apache.spark.sql.connector.expressions.{FieldReference, Literal => V2Literal, NamedReference}
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns, V1Scan}
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, SupportsOverwrite, SupportsTruncate, V1Write, Write, WriteBuilder}
import org.apache.spark.sql.sources.{BaseRelation, Filter, InsertableRelation, TableScan}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.sql.{Column, DataFrame, Row, SQLContext}

import graft.io.{DeltaRead, DeltaWrite}

/** A DSv2 `TableCatalog` over a directory of graft-delta tables — the
  * catalog-resolved SQL door to the lakehouse layer:
  *
  * {{{
  * spark.sql.catalog.graft          = graft.io.v2.GraftCatalog
  * spark.sql.catalog.graft.warehouse = /data/warehouse
  *
  * CREATE TABLE graft.db.events (id BIGINT, ts TIMESTAMP) USING graft-delta
  * INSERT INTO graft.db.events SELECT ...
  * SELECT * FROM graft.db.events VERSION AS OF 3
  * DELETE FROM graft.db.events WHERE id < 0     -- via GraftSqlDml
  * }}}
  *
  * An identifier `db.t` maps to `<warehouse>/db/t`; `LOCATION` creates
  * an external table at an explicit path. Reads and writes delegate to
  * the existing transactional reader/writer through the V1 fallback
  * interfaces ([[V1Scan]]/[[V1Write]]) — the battle-tested
  * [[DeltaRelation]] scan (stats pruning + parquet pushdown) and
  * [[DeltaWrite.append]]/[[DeltaWrite.overwrite]] serve catalog tables
  * byte-identically to path-options tables, so the two doors cannot
  * drift. Time travel resolves through the `loadTable(ident, version)` /
  * `loadTable(ident, timestampMicros)` catalog hooks (Spark routes
  * `VERSION AS OF` / `TIMESTAMP AS OF` there).
  */
class GraftCatalog extends TableCatalog with SupportsNamespaces {
  private var catalogName: String = _
  private var warehouse: Path = _

  // opt in to DEFAULT clauses (CREATE/ADD COLUMN/ALTER COLUMN SET
  // DEFAULT) and constraint DDL (ALTER TABLE ADD/DROP CONSTRAINT) —
  // without these declarations Spark refuses the statements at
  // analysis before the catalog ever sees the change
  override def capabilities(): util.Set[TableCatalogCapability] =
    util.EnumSet.of(TableCatalogCapability.SUPPORT_COLUMN_DEFAULT_VALUE,
      TableCatalogCapability.SUPPORT_TABLE_CONSTRAINT)

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    val w = options.get("warehouse")
    require(w != null && w.nonEmpty,
      s"GraftCatalog '$name': set spark.sql.catalog.$name.warehouse to the " +
        "directory that holds (or will hold) the catalog's tables")
    // SANDBOX CONSTRAINT, not a design choice: the warehouse resolves
    // through java.nio (local filesystem only) because the offline test
    // environment has no remote FS. A deploy against hdfs://s3a:// would
    // resolve this through Hadoop Path/FileSystem like DeltaTableSource
    // does — the reader/writer underneath are path-string based and
    // would follow.
    warehouse = Paths.get(w).toAbsolutePath.normalize()
  }

  override def name(): String = catalogName

  /** Refuse identifier/namespace segments that could escape the
    * warehouse root — path traversal via a crafted name aimed at
    * `DROP ... CASCADE` is a data-destruction hole, not a nicety. */
  private def checkSegments(segs: Seq[String]): Unit =
    segs.foreach(s => require(
      s.nonEmpty && !s.contains("/") && !s.contains("\\") && s != "." && s != "..",
      s"GraftCatalog: illegal identifier segment '$s'"))

  /** Where `ident` lives (or would live) under the warehouse — the
    * creation-side twin of [[loadTable]]'s resolution, for commands
    * that materialize a NEW table at a catalog identifier (SQL
    * `CREATE TABLE dst SHALLOW CLONE src` runs outside Spark's
    * createTable hook and needs the destination directory up front). */
  private[graft] def dirForIdent(ident: Identifier): Path = tableDir(ident)

  /** `db.t` → `<warehouse>/db/t`, traversal-checked. */
  private def tableDir(ident: Identifier): Path = {
    val segs = ident.namespace().toSeq :+ ident.name()
    checkSegments(segs)
    segs.foldLeft(warehouse)(_.resolve(_))
  }

  /** Namespace → directory, traversal-checked — EVERY namespace-taking
    * entry point resolves through here. */
  private def nsDir(namespace: Array[String]): Path = {
    checkSegments(namespace.toSeq)
    namespace.foldLeft(warehouse)(_.resolve(_))
  }

  private def isTable(dir: Path): Boolean =
    Files.isDirectory(dir.resolve("_delta_log"))

  private def spark: SparkSession = SparkSession.active

  /** A DANGLING external-table link still EXISTS for catalog purposes:
    * Spark's DROP TABLE checks tableExists before calling dropTable, so
    * treating the broken registration as absent would make it
    * un-droppable (and un-recreatable). */
  override def tableExists(ident: Identifier): Boolean = {
    val dir = tableDir(ident)
    isTable(dir) || Files.isSymbolicLink(dir)
  }

  override def loadTable(ident: Identifier): Table = {
    val dir = tableDir(ident)
    if (!isTable(dir)) {
      if (Files.isSymbolicLink(dir)) throw new IllegalStateException(
        s"${fullName(ident)}: external table target " +
          s"${Files.readSymbolicLink(dir)} is gone — DROP TABLE to deregister")
      throw new NoSuchTableException(ident)
    }
    new GraftTable(dir.toString, fullName(ident), None)
  }

  /** `VERSION AS OF <v>` — a commit number; Spark routes timestamp
    * forms to the `loadTable(ident, timestampMicros)` hook instead. */
  override def loadTable(ident: Identifier, version: String): Table = {
    val dir = tableDir(ident)
    if (!isTable(dir)) throw new NoSuchTableException(ident)
    val v = version.toLongOption.getOrElse(throw new IllegalArgumentException(
      s"GraftCatalog: VERSION AS OF wants a commit number, got '$version'"))
    new GraftTable(dir.toString, fullName(ident), Some(v))
  }

  /** `TIMESTAMP AS OF <ts>` — Spark hands MICROseconds since epoch. */
  override def loadTable(ident: Identifier, timestampMicros: Long): Table = {
    val dir = tableDir(ident)
    if (!isTable(dir)) throw new NoSuchTableException(ident)
    val v = DeltaRead.versionAtTime(spark, dir.toString, timestampMicros / 1000L)
    new GraftTable(dir.toString, fullName(ident), Some(v))
  }

  private def fullName(ident: Identifier): String =
    (Seq(catalogName) ++ ident.namespace().toSeq :+ ident.name()).mkString(".")

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: util.Map[String, String]): Table = {
    if (tableExists(ident)) throw new TableAlreadyExistsException(ident)
    val props = properties.asScala.toMap
    props.get(TableCatalog.PROP_PROVIDER).foreach { p =>
      require(p.equalsIgnoreCase("graft-delta"),
        s"GraftCatalog serves graft-delta tables only, got USING $p")
    }
    // LOCATION makes the table EXTERNAL: data lives (and stays) at the
    // explicit path, and the identifier resolves through a symbolic
    // link under the warehouse — without the link, loadTable/INSERT/
    // DROP would all look under the warehouse and never find the table.
    // Spark normalizes LOCATION to a URI (`file:/tmp/...`) — resolve
    // the scheme, never Paths.get the raw string (a CWD-relative
    // `file:/...` directory is where the data would silently land)
    val external = props.get(TableCatalog.PROP_LOCATION).map { l =>
      // only URI-parse strings that actually carry a scheme: raw local
      // paths may hold URI-illegal characters (spaces) that
      // URI.create would refuse even though the filesystem is fine
      val p =
        if (!l.matches("[a-zA-Z][a-zA-Z0-9+.-]*:/.*")) Paths.get(l)
        else {
          val uri = java.net.URI.create(l)
          if (uri.getScheme == "file") Paths.get(uri)
          else throw new UnsupportedOperationException(
            s"GraftCatalog: LOCATION scheme '${uri.getScheme}' is not " +
              "supported offline — local paths only")
        }
      p.toAbsolutePath.normalize()
    }
    val dir = tableDir(ident)
    val target = external.getOrElse(dir)
    val partitionBy = partitions.toSeq.map {
      case t if t.name == "identity" && t.references().length == 1 =>
        t.references()(0).fieldNames().mkString(".")
      case other => throw new UnsupportedOperationException(
        s"GraftCatalog: only PARTITIONED BY (col) is supported, got $other")
    }
    // reserved/engine keys are Spark bookkeeping, not table properties
    val reserved = Set(TableCatalog.PROP_PROVIDER, TableCatalog.PROP_LOCATION,
      TableCatalog.PROP_OWNER, TableCatalog.PROP_EXTERNAL,
      TableCatalog.PROP_IS_MANAGED_LOCATION, TableCatalog.PROP_TABLE_TYPE,
      "option.path", "path")
    val tblProps0 = props.filterNot { case (k, _) =>
      reserved.contains(k) || k.startsWith(TableCatalog.OPTION_PREFIX)
    }
    // constraint keys route through addCheckConstraint AFTER creation
    // (trivially valid on an empty table); any other obligation key
    // must refuse BEFORE any commit lands — refusing inside
    // setProperties would strand a half-created v0 table
    val (constraintProps, tblProps) = tblProps0.partition(
      _._1.startsWith("delta.constraints."))
    tblProps.keys.find(k => k.startsWith("delta.columnMapping.") ||
        k.startsWith("delta.rowTracking.")).foreach { k =>
      throw new UnsupportedOperationException(
        s"GraftCatalog: TBLPROPERTIES '$k' is an obligation-bearing key — " +
          "use the dedicated Scala writer APIs (createColumnMapped, row " +
          "tracking enablement) instead of CREATE TABLE properties")
    }
    // (a stale/dangling symlink cannot reach here: tableExists above
    // reports it and the CREATE throws — DROP TABLE deregisters it)
    if (isTable(target)) {
      // registering EXISTING external data: no new commit; a non-empty
      // declared schema must agree with the committed one
      require(external.isDefined, s"GraftCatalog: ${dir} already holds a table")
      if (schema.fields.nonEmpty) {
        val committed = DeltaRead.readVersion(spark, target.toString,
          DeltaRead.latestVersion(target.toString)).schema
        // compare names + types only, normalized at EVERY nesting level:
        // a mapped table's committed nested fields carry columnMapping
        // metadata and possibly tighter nullability than the declared
        // DDL — neither is a shape mismatch
        def norm(dt: org.apache.spark.sql.types.DataType)
            : org.apache.spark.sql.types.DataType = dt match {
          case st: StructType => StructType(st.fields.map(f =>
            org.apache.spark.sql.types.StructField(
              f.name.toLowerCase, norm(f.dataType), nullable = true)))
          case org.apache.spark.sql.types.ArrayType(et, _) =>
            org.apache.spark.sql.types.ArrayType(norm(et), containsNull = true)
          case org.apache.spark.sql.types.MapType(k, v, _) =>
            org.apache.spark.sql.types.MapType(norm(k), norm(v),
              valueContainsNull = true)
          case other => other
        }
        def shape(s: StructType) =
          s.fields.map(f => (f.name.toLowerCase, norm(f.dataType))).sortBy(_._1).toSeq
        require(shape(schema) == shape(committed),
          s"GraftCatalog: declared schema ${schema.simpleString} does not " +
            s"match the existing table's ${committed.simpleString} " +
            "(names AND types must agree)")
      }
      require(partitionBy.isEmpty && tblProps0.isEmpty,
        "GraftCatalog: PARTITIONED BY / TBLPROPERTIES cannot re-declare an " +
          "existing external table — alter it after registration")
    } else {
      DeltaWrite.createEmpty(spark, target.toString, schema, partitionBy, tblProps)
    }
    external.foreach { _ =>
      Files.createDirectories(dir.getParent)
      Files.createSymbolicLink(dir, target)
    }
    // CHECK constraints land through their dedicated commit (trivially
    // valid against the just-created empty table)
    constraintProps.foreach { case (k, cond) =>
      DeltaWrite.addCheckConstraint(spark, dir.toString,
        k.stripPrefix("delta.constraints."), cond)
    }
    new GraftTable(dir.toString, fullName(ident), None)
  }

  /** ALTER TABLE SET/UNSET TBLPROPERTIES + schema evolution. Every
    * change is VALIDATED up front against one head snapshot before ANY
    * commit is issued — a statement like `ADD COLUMNS (a INT, b INT NOT
    * NULL)` refuses on b BEFORE a lands, so a failed DDL statement
    * leaves the table untouched. All AddColumn changes of one statement
    * fold into ONE metaData commit ([[DeltaWrite.addColumns]]) — `ADD
    * COLUMNS (a INT, b INT)` is one version, atomic by construction,
    * and nested adds into existing struct columns (`meta.quality
    * DOUBLE`) are supported. Constraint keys route through
    * [[DeltaWrite.addCheckConstraint]]/[[DeltaWrite.dropCheckConstraint]]
    * (existing-data validation + protocol bump); other property edits
    * are one metaData commit. NOTE: a statement mixing DIFFERENT change
    * kinds (SQL can't express one, but the DSv2 API can) still maps to
    * successive commits — the upfront validation closes the
    * statically-checkable failure modes, while a concurrent writer
    * racing between validation and a later commit can still surface a
    * mid-statement refusal; each writer re-validates under its own CAS
    * loop so no single commit is ever wrong. */
  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    val dir = tableDir(ident)
    if (!isTable(dir)) throw new NoSuchTableException(ident)
    val sets = changes.collect { case s: TableChange.SetProperty =>
      s.property() -> s.value() }
    val unsets = changes.collect { case r: TableChange.RemoveProperty => r.property() }
    def topLevel(names: Array[String], what: String): String = {
      require(names.length == 1, s"GraftCatalog: $what supports top-level " +
        s"columns only, got ${names.mkString(".")}")
      names(0)
    }
    // --- phase 1: validate EVERY change by FOLDING a SIMULATED schema
    // through the statement in order — intra-statement references
    // resolve (`ADD COLUMNS (a INT, b INT AFTER a)`), duplicates
    // refuse, and SEQUENCE effects surface before any commit (`DROP
    // COLUMNS (meta.a, meta.b)` on a two-field struct refuses on b's
    // last-field rule instead of half-applying). Each validated change
    // contributes a thunk to the execution plan, so phase 2 never
    // re-derives decisions against a stale schema. ---
    val head = DeltaRead.snapshot(spark, dir.toString)
    val headSchema = head.schema.getOrElse(throw new IllegalStateException(
      s"GraftCatalog: ${fullName(ident)} has no committed schema"))
    var sim: StructType = headSchema
    def simParent(path: Seq[String], what: String): StructType =
      path.foldLeft(sim) { (st, name) =>
        st.fields.find(_.name.equalsIgnoreCase(name)) match {
          case Some(f) => f.dataType match {
            case s: StructType => s
            case other => throw new IllegalArgumentException(
              s"GraftCatalog: $what — '$name' is ${other.simpleString}, not a struct")
          }
          case None => throw new IllegalArgumentException(
            s"GraftCatalog: $what — no column '$name'")
        }
      }
    def simUpdate(path: Seq[String], what: String)(
        leafOp: (StructType, String) => StructType): Unit = {
      def go(st: StructType, p: Seq[String]): StructType = p match {
        case Seq(leaf) => leafOp(st, leaf)
        case h +: rest =>
          val i = st.fields.indexWhere(_.name.equalsIgnoreCase(h))
          require(i >= 0, s"GraftCatalog: $what — no column '$h'")
          st.fields(i).dataType match {
            case inner: StructType => StructType(st.fields.updated(i,
              st.fields(i).copy(dataType = go(inner, rest))))
            case other => throw new IllegalArgumentException(
              s"GraftCatalog: $what — '$h' is ${other.simpleString}, not a struct")
          }
      }
      sim = go(sim, path)
    }
    val adds = Seq.newBuilder[DeltaWrite.AddColSpec]
    val exec = Seq.newBuilder[() => Unit]
    changes.foreach {
      case a: TableChange.AddColumn =>
        val path = a.fieldNames().toSeq
        val shown = path.mkString(".")
        require(a.isNullable, s"GraftCatalog: ADD COLUMN $shown must be " +
          "nullable — existing rows have no value to satisfy NOT NULL")
        // DEFAULT rides the add: pre-add rows serve the alter-time
        // folded value (EXISTS_DEFAULT), later inserts re-evaluate the
        // expression (CURRENT_DEFAULT) — one metadata commit, zero
        // files rewritten (DeltaWrite.addColumns)
        val defaultSql: Option[String] = Option(a.defaultValue()).map { dv =>
          Option(dv.getSql).getOrElse(dv.getExpression.toString)
        }
        require(defaultSql.isEmpty || path.length == 1,
          s"GraftCatalog: ADD COLUMN $shown DEFAULT on a nested column " +
            "is not supported — existence defaults are top-level only")
        val parent = simParent(path.init, s"ADD COLUMN $shown")
        require(!parent.fieldNames.exists(_.equalsIgnoreCase(path.last)),
          s"GraftCatalog: ADD COLUMN $shown — column already exists (or the " +
            "statement names it twice)")
        val pos = a.position() match {
          case null => None
          case _: TableChange.First => Some(DeltaWrite.ColFirst)
          case after: TableChange.After =>
            require(parent.fieldNames.exists(_.equalsIgnoreCase(after.column())),
              s"GraftCatalog: ADD COLUMN $shown AFTER ${after.column()} — " +
                "no such sibling")
            Some(DeltaWrite.ColAfter(after.column()))
          case other => throw new UnsupportedOperationException(
            s"GraftCatalog: unsupported column position $other")
        }
        adds += DeltaWrite.AddColSpec(path, a.dataType(), Option(a.comment()),
          pos, defaultSql)
        simUpdate(path, s"ADD COLUMN $shown") { (st, leaf) =>
          val field = org.apache.spark.sql.types.StructField(
            leaf, a.dataType(), nullable = true)
          val at = pos match {
            case None => st.fields.length
            case Some(DeltaWrite.ColFirst) => 0
            case Some(DeltaWrite.ColAfter(sib)) =>
              st.fields.indexWhere(_.name.equalsIgnoreCase(sib)) + 1
          }
          StructType((st.fields.take(at) :+ field) ++ st.fields.drop(at))
        }
      case r: TableChange.RenameColumn =>
        val path = r.fieldNames().toSeq
        val shown = path.mkString(".")
        val parent = simParent(path.init, s"RENAME COLUMN $shown")
        require(parent.fieldNames.exists(_.equalsIgnoreCase(path.last)),
          s"GraftCatalog: RENAME COLUMN — no column '$shown'")
        require(!parent.fieldNames.exists(_.equalsIgnoreCase(r.newName())),
          s"GraftCatalog: RENAME COLUMN — '${r.newName()}' already exists " +
            s"beside '$shown'")
        simUpdate(path, s"RENAME COLUMN $shown") { (st, leaf) =>
          val i = st.fields.indexWhere(_.name.equalsIgnoreCase(leaf))
          StructType(st.fields.updated(i, st.fields(i).copy(name = r.newName())))
        }
        exec += (() => DeltaWrite.renameColumnPath(spark, dir.toString,
          path, r.newName()))
      case del: TableChange.DeleteColumn =>
        val path = del.fieldNames().toSeq
        val shown = path.mkString(".")
        val parent = simParent(path.init, s"DROP COLUMN $shown")
        val exists = parent.fieldNames.exists(_.equalsIgnoreCase(path.last))
        require(exists || del.ifExists() == java.lang.Boolean.TRUE,
          s"GraftCatalog: DROP COLUMN — no column '$shown'")
        if (exists) {
          if (path.length == 1)
            require(!head.partitionColumns.exists(_.equalsIgnoreCase(path.head)),
              s"GraftCatalog: DROP COLUMN — '$shown' is a partition column")
          require(parent.fields.length > 1,
            s"GraftCatalog: DROP COLUMN — cannot drop the last " +
              (if (path.length == 1) "column" else s"field of '${path.init.mkString(".")}'"))
          simUpdate(path, s"DROP COLUMN $shown") { (st, leaf) =>
            StructType(st.fields.filterNot(_.name.equalsIgnoreCase(leaf)))
          }
          exec += (() => DeltaWrite.dropColumnPath(spark, dir.toString, path))
        } // ifExists + missing: validated no-op, nothing to execute
      case u: TableChange.UpdateColumnType =>
        val col = topLevel(u.fieldNames(), "ALTER COLUMN TYPE")
        require(sim.fieldNames.exists(_.equalsIgnoreCase(col)),
          s"GraftCatalog: ALTER COLUMN TYPE — no column '$col'")
        exec += (() => DeltaWrite.widenColumnType(spark, dir.toString,
          col, u.newDataType()))
      case u: TableChange.UpdateColumnNullability =>
        val path = u.fieldNames().toSeq
        val shown = path.mkString(".")
        val parent = simParent(path.init, s"ALTER COLUMN $shown NULLABILITY")
        require(parent.fieldNames.exists(_.equalsIgnoreCase(path.last)),
          s"GraftCatalog: ALTER COLUMN NULLABILITY — no column '$shown'")
        exec += (() => DeltaWrite.updateColumnNullability(spark, dir.toString,
          path, u.nullable()))
      case cm: TableChange.UpdateColumnComment =>
        val path = cm.fieldNames().toSeq
        val shown = path.mkString(".")
        val parent = simParent(path.init, s"ALTER COLUMN $shown COMMENT")
        require(parent.fieldNames.exists(_.equalsIgnoreCase(path.last)),
          s"GraftCatalog: ALTER COLUMN COMMENT — no column '$shown'")
        exec += (() => DeltaWrite.updateColumnComment(spark, dir.toString,
          path, Option(cm.newComment()).filter(_.nonEmpty)))
      case ac: TableChange.AddConstraint =>
        ac.constraint() match {
          case chk: org.apache.spark.sql.connector.catalog.constraints.Check =>
            require(chk.enforced(),
              s"GraftCatalog: CHECK constraint '${chk.name()}' NOT ENFORCED " +
                "is not supported — this writer enforces every constraint " +
                "it records (an unenforced one would be a lie in the log)")
            // routes through the dedicated commit: existing rows are
            // VALIDATED and the checkConstraints feature listed — never
            // a raw properties write
            exec += (() => DeltaWrite.addCheckConstraint(spark, dir.toString,
              chk.name(), chk.predicateSql()))
          case other => throw new UnsupportedOperationException(
            s"GraftCatalog: only CHECK constraints are enforceable here — " +
              s"got ${other.toDDL}; UNIQUE/PK/FK are informational in open " +
              "formats and this writer refuses to record promises it " +
              "cannot keep")
        }
      case dc: TableChange.DropConstraint =>
        require(dc.mode() != TableChange.DropConstraint.Mode.CASCADE,
          "GraftCatalog: DROP CONSTRAINT CASCADE has nothing to cascade to " +
            "for CHECK constraints — use RESTRICT (the default)")
        val stored = head.configuration.keys
          .find(k => k.startsWith("delta.constraints.") &&
            k.stripPrefix("delta.constraints.").equalsIgnoreCase(dc.name()))
          .map(_.stripPrefix("delta.constraints."))
        stored match {
          case Some(n) =>
            exec += (() => DeltaWrite.dropCheckConstraint(spark, dir.toString, n))
          case None => require(dc.ifExists(),
            s"GraftCatalog: DROP CONSTRAINT — no constraint '${dc.name()}'")
        }
      case d: TableChange.UpdateColumnDefaultValue =>
        val col = topLevel(d.fieldNames(), "ALTER COLUMN SET/DROP DEFAULT")
        require(sim.fieldNames.exists(_.equalsIgnoreCase(col)),
          s"GraftCatalog: ALTER COLUMN SET DEFAULT — no column '$col'")
        // empty/null SQL = DROP DEFAULT (Spark encodes both through
        // this one change); setColumnDefault(null) clears the key
        val sql = Option(d.newCurrentDefault()).map(dv =>
          Option(dv.getSql).getOrElse(dv.getExpression.toString))
          .filter(_.nonEmpty).orNull
        exec += (() => DeltaWrite.setColumnDefault(spark, dir.toString, col, sql))
      case cb: TableChange.ClusterBy =>
        val cols = cb.clusteringColumns().toSeq.map(r =>
          topLevel(r.fieldNames(), "CLUSTER BY"))
        cols.foreach(col => require(
          sim.fieldNames.exists(_.equalsIgnoreCase(col)),
          s"GraftCatalog: CLUSTER BY — no column '$col'"))
        // ALTER TABLE ... CLUSTER BY (cols) — declares the clustering
        // domain (layout enforced on future writes and OPTIMIZE)
        exec += (() => DeltaWrite.clusterBy(spark, dir.toString, cols))
      case _: TableChange.SetProperty | _: TableChange.RemoveProperty => ()
      case other => throw new UnsupportedOperationException(
        s"GraftCatalog: unsupported ALTER TABLE change $other — supported: " +
          "SET/UNSET TBLPROPERTIES, ADD COLUMNS (nullable, FIRST/AFTER, " +
          "nested-into-struct allowed), RENAME/DROP COLUMN (column-mapped " +
          "tables, nested allowed), ALTER COLUMN TYPE (lossless widenings), " +
          "ALTER COLUMN COMMENT / SET NOT NULL (data-validated) / " +
          "DROP NOT NULL")
    }
    // --- phase 2: execute the validated plan. ALL adds = ONE commit ---
    val addSpecs = adds.result()
    if (addSpecs.nonEmpty) DeltaWrite.addColumns(spark, dir.toString, addSpecs)
    exec.result().foreach(_())
    // CHECK constraints ride their dedicated commit (existing-data
    // validation + the checkConstraints protocol bump) — a raw
    // properties edit would record a constraint nobody validated
    val (constraintSets, plainSets) = sets.partition(
      _._1.startsWith("delta.constraints."))
    constraintSets.foreach { case (k, cond) =>
      DeltaWrite.addCheckConstraint(spark, dir.toString,
        k.stripPrefix("delta.constraints."), cond)
    }
    if (plainSets.nonEmpty)
      DeltaWrite.setProperties(spark, dir.toString, plainSets.toMap)
    val (constraintUnsets, plainUnsets) = unsets.partition(
      _.startsWith("delta.constraints."))
    constraintUnsets.foreach(k => DeltaWrite.dropCheckConstraint(
      spark, dir.toString, k.stripPrefix("delta.constraints.")))
    if (plainUnsets.nonEmpty)
      DeltaWrite.unsetProperties(spark, dir.toString, plainUnsets)
    loadTable(ident)
  }

  override def dropTable(ident: Identifier): Boolean = {
    val dir = tableDir(ident)
    // an external table drops its LINK only (data stays) — including a
    // DANGLING link whose target was deleted out-of-band, which would
    // otherwise brick the identifier (isTable false forever, re-CREATE
    // colliding with the stale link)
    if (Files.isSymbolicLink(dir)) { Files.delete(dir); return true }
    if (!isTable(dir)) return false
    org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
    true
  }

  override def renameTable(from: Identifier, to: Identifier): Unit = {
    val src = tableDir(from)
    if (!isTable(src)) throw new NoSuchTableException(from)
    if (tableExists(to)) throw new TableAlreadyExistsException(to)
    val dst = tableDir(to)
    Files.createDirectories(dst.getParent)
    Files.move(src, dst)
  }

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val dir = nsDir(namespace)
    if (!Files.isDirectory(dir)) throw new NoSuchNamespaceException(namespace)
    val st = Files.list(dir)
    try st.iterator().asScala
      .filter(p => isTable(p))
      .map(p => Identifier.of(namespace, p.getFileName.toString))
      .toArray
    finally st.close()
  }

  // --- namespaces: directories under the warehouse root ---

  override def listNamespaces(): Array[Array[String]] = {
    if (!Files.isDirectory(warehouse)) return Array.empty
    val st = Files.list(warehouse)
    try st.iterator().asScala
      .filter(p => Files.isDirectory(p) && !isTable(p))
      .map(p => Array(p.getFileName.toString))
      .toArray
    finally st.close()
  }

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] = {
    if (namespace.isEmpty) return listNamespaces()
    val dir = nsDir(namespace)
    if (!Files.isDirectory(dir)) throw new NoSuchNamespaceException(namespace)
    val st = Files.list(dir)
    try st.iterator().asScala
      .filter(p => Files.isDirectory(p) && !isTable(p))
      .map(p => namespace :+ p.getFileName.toString)
      .toArray
    finally st.close()
  }

  override def namespaceExists(namespace: Array[String]): Boolean =
    namespace.isEmpty || Files.isDirectory(nsDir(namespace))

  override def loadNamespaceMetadata(namespace: Array[String]): util.Map[String, String] = {
    if (!namespaceExists(namespace)) throw new NoSuchNamespaceException(namespace)
    new util.HashMap[String, String]()
  }

  override def createNamespace(namespace: Array[String],
      metadata: util.Map[String, String]): Unit = {
    Files.createDirectories(nsDir(namespace))
  }

  override def alterNamespace(namespace: Array[String],
      changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException(
      "GraftCatalog: namespaces carry no metadata to alter")

  override def dropNamespace(namespace: Array[String], cascade: Boolean): Boolean = {
    val dir = nsDir(namespace)
    if (!Files.isDirectory(dir)) return false
    if (!cascade) {
      val st = Files.list(dir)
      val empty = try !st.iterator().hasNext finally st.close()
      require(empty, s"GraftCatalog: namespace ${namespace.mkString(".")} is " +
        "not empty — use DROP NAMESPACE ... CASCADE")
    }
    org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
    true
  }
}

/** A catalog-resolved graft-delta table. Reads ride [[V1Scan]] into the
  * existing [[DeltaRelation]] (stats pruning, DV masking, column
  * mapping, parquet pushdown); writes ride [[V1Write]] into
  * [[DeltaWrite.append]]/[[DeltaWrite.overwrite]]. `SupportsDeleteV2`
  * lets simple `DELETE FROM` predicates run even on sessions WITHOUT
  * [[graft.plans.GraftExtensions]] (Spark's own metadata-delete path);
  * arbitrary DELETE / UPDATE / MERGE route through the extension rule.
  * `pinnedVersion` carries `VERSION AS OF` — a pinned table refuses
  * writes (time travel is a read concept). */
class GraftTable(val path: String, ident: String,
    val pinnedVersion: Option[Long]) extends Table
    with SupportsRead with SupportsWrite with SupportsDeleteV2 {
  private def spark: SparkSession = SparkSession.active

  /** The version this instance serves — resolved ONCE per loadTable
    * (lazily, at first use), so one analyzed statement sees ONE
    * snapshot: schema, partitioning, and every newScanBuilder of the
    * same table reference agree even if a commit lands mid-query
    * (e.g. a head self-join reading the table twice). Each statement's
    * analysis calls loadTable afresh, so the next statement sees the
    * new head. */
  private lazy val versionForRead: Long =
    pinnedVersion.getOrElse(DeltaRead.latestVersion(path))

  override def name(): String =
    ident + pinnedVersion.map(v => s" VERSION AS OF $v").getOrElse("")

  override lazy val schema: StructType =
    DeltaRead.readVersion(spark, path, versionForRead).schema

  override def partitioning(): Array[Transform] =
    DeltaRead.snapshotAt(spark, path, versionForRead)
      .partitionColumns.map(Expressions.identity).toArray

  override def properties(): util.Map[String, String] = {
    val m = new util.HashMap[String, String]()
    DeltaRead.snapshotAt(spark, path, versionForRead)
      .configuration.foreach { case (k, v) => m.put(k, v) }
    m.put("provider", "graft-delta")
    m
  }

  /** Surface `delta.constraints.*` as connector CHECK constraints so
    * DESCRIBE shows them and ADD CONSTRAINT analysis sees duplicates. */
  override def constraints():
      Array[org.apache.spark.sql.connector.catalog.constraints.Constraint] =
    DeltaRead.snapshotAt(spark, path, versionForRead).configuration.toSeq
      .collect { case (k, v) if k.startsWith("delta.constraints.") =>
        val b = org.apache.spark.sql.connector.catalog.constraints.Constraint
          .check(k.stripPrefix("delta.constraints.")).predicateSql(v)
        b.enforced(true)
        b.build(): org.apache.spark.sql.connector.catalog.constraints.Constraint
      }.sortBy(_.name()).toArray

  // AUTOMATIC_SCHEMA_EVOLUTION does NOT auto-evolve every merge: Spark
  // gates MERGE schema evolution on `withSchemaEvolution && capability`
  // (MergeIntoTable.schemaEvolutionEnabled), so the capability merely
  // UNLOCKS the user's explicit `MERGE WITH SCHEMA EVOLUTION`, whose
  // schema diff the analyzer then commits through alterTable →
  // DeltaWrite.addColumns (one metaData commit). Nothing else in Spark
  // 4.1 consults the capability.
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.V1_BATCH_WRITE,
      TableCapability.TRUNCATE, TableCapability.OVERWRITE_BY_FILTER,
      TableCapability.AUTOMATIC_SCHEMA_EVOLUTION)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftScanBuilder(path, versionForRead, schema)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    require(pinnedVersion.isEmpty,
      s"$ident: cannot write to a time-travelled table (VERSION AS OF " +
        s"${pinnedVersion.get})")
    new GraftWriteBuilder(path)
  }

  // --- SupportsDeleteV2: the no-extensions DELETE door ---

  override def canDeleteWhere(predicates: Array[V2Predicate]): Boolean =
    pinnedVersion.isEmpty &&
      predicates.forall(p => GraftTable.predicateToColumn(p).isDefined)

  override def deleteWhere(predicates: Array[V2Predicate]): Unit = {
    require(pinnedVersion.isEmpty,
      s"$ident: cannot DELETE from a time-travelled table")
    val conds = predicates.toSeq.map(p => GraftTable.predicateToColumn(p)
      .getOrElse(throw new UnsupportedOperationException(
        s"$ident: cannot translate DELETE predicate ${p.describe()} — " +
          "register graft.plans.GraftExtensions for arbitrary-predicate DML")))
    val cond = conds.reduceOption(_ && _)
      .getOrElse(org.apache.spark.sql.functions.lit(true))
    DeltaWrite.deleteWhere(spark, path, cond)
  }
}

private[graft] object GraftTable {
  import org.apache.spark.sql.functions.{col, lit, not}

  /** Connector `Predicate` → `Column`, for the SupportsDeleteV2 door.
    * Only shapes with exact Column equivalents translate; anything else
    * returns None and the caller refuses (never a silent partial
    * delete). */
  def predicateToColumn(p: V2Predicate): Option[Column] = {
    def ref(e: org.apache.spark.sql.connector.expressions.Expression): Option[Column] =
      e match {
        case n: NamedReference => Some(col(n.fieldNames().mkString(".")))
        case l: V2Literal[_] =>
          Some(org.apache.spark.sql.GraftColumnBridge.column(
            org.apache.spark.sql.catalyst.expressions.Literal(l.value(), l.dataType())))
        case _ => None
      }
    def bin(f: (Column, Column) => Column): Option[Column] = {
      val ch = p.children()
      if (ch.length != 2) None
      else for (a <- ref(ch(0)); b <- ref(ch(1))) yield f(a, b)
    }
    p match {
      case _: AlwaysTrue => Some(lit(true))
      case _: AlwaysFalse => Some(lit(false))
      case a: V2And =>
        for (l <- predicateToColumn(a.left()); r <- predicateToColumn(a.right()))
          yield l && r
      case o: V2Or =>
        for (l <- predicateToColumn(o.left()); r <- predicateToColumn(o.right()))
          yield l || r
      case n: V2Not => predicateToColumn(n.child()).map(not)
      case _ => p.name() match {
        case "=" => bin(_ === _)
        case "<=>" => bin(_ <=> _)
        case "<>" | "!=" => bin(_ =!= _)
        case ">" => bin(_ > _)
        case ">=" => bin(_ >= _)
        case "<" => bin(_ < _)
        case "<=" => bin(_ <= _)
        case "IS_NULL" =>
          p.children() match { case Array(c) => ref(c).map(_.isNull); case _ => None }
        case "IS_NOT_NULL" =>
          p.children() match { case Array(c) => ref(c).map(_.isNotNull); case _ => None }
        case "IN" =>
          val ch = p.children()
          if (ch.length < 2) None
          else for {
            c <- ref(ch(0))
            vs <- ch.tail.foldLeft(Option(Seq.empty[Column])) { (acc, e) =>
              acc.flatMap(s => ref(e).map(s :+ _))
            }
          } yield c.isin(vs: _*)
        case _ => None
      }
    }
  }
}

/** Column-pruning + filter-collecting scan builder whose built scan is
  * a [[V1Scan]] over the existing [[DeltaRelation]] machinery. All
  * filters are returned as post-scan (Spark re-applies them — the v1
  * contract), while the translatable subset ALSO drives log-metadata
  * file pruning and reaches the parquet readers as pushed predicates
  * inside the delegate. */
private[v2] class GraftScanBuilder(path: String, version: Long,
    tableSchema: StructType) extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns {
  private var required: StructType = tableSchema
  private var filters: Array[Filter] = Array.empty

  override def pushFilters(fs: Array[Filter]): Array[Filter] = {
    filters = fs
    fs // all re-applied above the scan; double-application is sound
  }
  override def pushedFilters(): Array[Filter] =
    filters.filter(f => DeltaRelation.toColumn(f).isDefined)

  // TOP-LEVEL pruning only: Spark's nested schema pruning may hand a
  // narrowed struct (`SELECT meta.quality` → meta: struct<quality>),
  // but the V1 row scan materializes FULL struct values — declaring the
  // narrowed type in readSchema would make the row encoder read
  // struct fields at the wrong positions (a String where it expects
  // the pruned-to DOUBLE). Keeping the table's full field types in
  // readSchema makes Spark project the nested field above the scan.
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = StructType(tableSchema.fields.filter(f =>
      requiredSchema.fieldNames.exists(_.equalsIgnoreCase(f.name))))

  override def build(): Scan = new V1Scan {
    override def readSchema(): StructType = required
    override def toV1TableScan[T <: BaseRelation with TableScan](
        context: SQLContext): T = {
      val cols = required.fieldNames
      val fs = filters
      val rel = new DeltaRelation(context, path, version)
      new BaseRelation with TableScan {
        override def sqlContext: SQLContext = context
        override def schema: StructType = required
        override def buildScan(): org.apache.spark.rdd.RDD[Row] =
          rel.buildScan(cols, fs)
      }.asInstanceOf[T]
    }
  }
}

/** INSERT INTO → transactional append; INSERT OVERWRITE / TRUNCATE →
  * transactional overwrite; `INSERT OVERWRITE ... PARTITION (p = v)` →
  * [[DeltaWrite.replaceWhere]], ONE commit that replaces only the
  * matching rows (the nightly partition-reload primitive — untouched
  * partitions keep their bytes). The V1 fallback hands a
  * fully-materialized batch DataFrame to the same writer entry points
  * the Scala API uses. */
private[v2] class GraftWriteBuilder(path: String) extends WriteBuilder
    with SupportsOverwrite {
  /** None = append; Some(None) = full overwrite; Some(Some(c)) =
    * replace rows matching c. */
  private var mode: Option[Option[Column]] = None

  override def truncate(): WriteBuilder = { mode = Some(None); this }

  override def overwrite(filters: Array[Filter]): WriteBuilder = {
    val meaningful = filters.filterNot(
      _.isInstanceOf[org.apache.spark.sql.sources.AlwaysTrue])
    if (meaningful.isEmpty) mode = Some(None)
    else {
      val conds = meaningful.toSeq.map(f => DeltaRelation.toColumn(f)
        .getOrElse(throw new UnsupportedOperationException(
          s"graft-delta: cannot translate overwrite filter $f — use the " +
            "Scala API (DeltaWrite.replaceWhere) for arbitrary predicates")))
      mode = Some(Some(conds.reduce(_ && _)))
    }
    this
  }

  override def build(): Write = new V1Write {
    override def toInsertableRelation: InsertableRelation = {
      val m = mode
      new InsertableRelation {
        override def insert(data: DataFrame, overwriteFlag: Boolean): Unit =
          m match {
            case Some(Some(cond)) =>
              DeltaWrite.replaceWhere(data.sparkSession, path, data, cond)
            case Some(None) => DeltaWrite.overwrite(data, path)
            case None =>
              if (overwriteFlag) DeltaWrite.overwrite(data, path)
              else DeltaWrite.append(data, path)
          }
      }
    }
  }
}
