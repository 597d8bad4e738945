package graft.plans

import org.apache.spark.sql.{Column, GraftColumnBridge, Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{EliminateSubqueryAliases, UnresolvedAttribute}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.Literal.TrueLiteral
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.functions.lit

import graft.io.DeltaWrite
import graft.io.v2.{DeltaRelation, GraftTable}

/** SQL DML for graft-delta tables — `DELETE FROM`, `UPDATE`, and
  * `MERGE INTO` in plain `spark.sql`, routed to the existing
  * transactional writer ([[DeltaWrite.deleteWhere]] /
  * [[DeltaWrite.updateWhere]] / [[DeltaWrite.merge]]).
  *
  * An analyzer resolution rule (injected by [[GraftExtensions]])
  * rewrites the resolved row-level plans over a graft relation — either
  * a catalog-resolved [[GraftTable]] or a `USING graft-delta` temp-view
  * [[DeltaRelation]] — into runnable commands, BEFORE Spark's own
  * row-level machinery would reject the table for not implementing
  * `SupportsRowLevelOperations`. This is what the reference's SQL-first
  * warehouse users actually type (`loader_NeonDB.py:364-371` `ON
  * CONFLICT` upserts, `validator_warehouse.py` all-SQL checks); the
  * Scala APIs stay the power-user door and both commit IDENTICAL logs
  * (pinned by SqlDmlSpec).
  *
  * Supported surface, refusing loudly beyond it:
  *  - `DELETE FROM t [WHERE cond]` — any deterministic condition.
  *  - `UPDATE t SET c = expr, ... [WHERE cond]` — top-level columns,
  *    expressions over the pre-image row.
  *  - `MERGE INTO t USING s ON t.k = s.k [AND ...]` with ordered
  *    `WHEN MATCHED [AND c] THEN UPDATE SET .../DELETE`,
  *    `WHEN NOT MATCHED [AND c] THEN INSERT ...`, and
  *    `WHEN NOT MATCHED BY SOURCE [AND c] THEN UPDATE/DELETE` —
  *    first-match-wins within each population. The star shape
  *    (`SET *`/`INSERT *`, source-only conditions, no BY SOURCE) keeps
  *    the dedicated [[DeltaWrite.merge]] path so the SQL and Scala
  *    doors commit identical logs; partial assignments, expressions
  *    over both rows, target-referencing conditions, partial-column
  *    INSERT, and BY SOURCE clauses route to
  *    [[DeltaWrite.mergeAdvanced]]. `WITH SCHEMA EVOLUTION` is refused
  *    with guidance.
  *
  * Subqueries inside DML conditions are refused (they would need their
  * own execution against a moving table — run them into a temp view
  * first). Conditions are re-resolved BY NAME against a fresh head
  * snapshot inside the writer, which is exactly DML semantics: the
  * statement applies to the table, not to the analysis-time snapshot.
  */
case class GraftSqlDmlRule(spark: SparkSession) extends Rule[LogicalPlan] {

  /** The write path of a DML-targetable graft relation: unwraps
    * aliases/views, refuses time-travelled targets loudly (DML applies
    * to the head, never to a pinned past version). */
  private object Target {
    private def unwrap(plan: LogicalPlan): LogicalPlan = plan match {
      case v: View => unwrap(v.child)
      case other => EliminateSubqueryAliases(other) match {
        case v: View => unwrap(v.child)
        case u => u
      }
    }
    def unapply(plan: LogicalPlan): Option[String] = unwrap(plan) match {
      case r: DataSourceV2Relation => r.table match {
        case t: GraftTable =>
          if (t.pinnedVersion.isDefined) throw new UnsupportedOperationException(
            s"${t.name()}: DML on a time-travelled table — drop VERSION AS OF")
          Some(t.path)
        case _ => None
      }
      case l: LogicalRelation => l.relation match {
        case d: DeltaRelation =>
          if (d.pinned) throw new UnsupportedOperationException(
            s"graft-delta ${d.table}: DML on a time-travelled view — " +
              "re-create it without versionAsOf/timestampAsOf")
          Some(d.table)
        case _ => None
      }
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperators {
    case d @ DeleteFromTable(Target(path), cond) if d.resolved =>
      GraftSqlDml.noSubquery(cond, "DELETE")
      GraftDeleteCommand(path, cond)

    case u @ UpdateTable(Target(path), assignments, cond) if u.resolved =>
      val assigns = assignments.map { a =>
        val name = a.key match {
          case ar: AttributeReference => ar.name
          case other => throw new UnsupportedOperationException(
            s"UPDATE $path: only top-level columns can be assigned, got " +
              s"SET ${other.sql}")
        }
        GraftSqlDml.noSubquery(a.value, "UPDATE")
        name -> a.value
      }
      // Spark's assignment alignment (when it ran) pads unmentioned
      // columns with identity assignments — drop those no-ops. When the
      // user's ENTIRE statement is identity (`SET c = c`), keep the
      // original list: Delta executes such an update for real (rewrite +
      // CDC pre/post images), and an empty list would instead trip the
      // writer's 'no assignments' require at runtime.
      val effective0 = assigns.filterNot { case (n, v) => v match {
        case ar: AttributeReference => ar.name == n
        case _ => false
      }}
      val effective = if (effective0.nonEmpty) effective0 else assigns
      val condition = cond.getOrElse(TrueLiteral)
      GraftSqlDml.noSubquery(condition, "UPDATE")
      GraftUpdateCommand(path, effective, condition)

    case m: MergeIntoTable if m.resolved =>
      m.targetTable match {
        case Target(path) => buildMerge(path, m)
        case _ => m
      }

    // ALTER COLUMN ... SET NOT NULL: Spark's analyzer refuses
    // nullable→non-nullable for any DSv2 table ("Cannot change nullable
    // column to non-nullable") because IT cannot know whether the data
    // qualifies — but graft's writer CAN: updateColumnNullability
    // validates the head's rows before committing the tightened schema.
    // Intercept the resolved plan before CheckAnalysis, exactly like
    // the DML rewrites. Only pure nullability specs are taken; mixed
    // specs (type+nullability in one ALTER) stay on Spark's path.
    case ac: org.apache.spark.sql.catalyst.plans.logical.AlterColumns
        if ac.table.isInstanceOf[org.apache.spark.sql.catalyst.analysis.ResolvedTable] &&
          ac.table.asInstanceOf[org.apache.spark.sql.catalyst.analysis.ResolvedTable]
            .table.isInstanceOf[GraftTable] &&
          ac.specs.nonEmpty && ac.specs.forall(s =>
            s.newNullability.contains(false) && s.newDataType.isEmpty &&
              s.newComment.isEmpty && s.newPosition.isEmpty &&
              s.column.isInstanceOf[org.apache.spark.sql.catalyst.analysis.ResolvedFieldName]) =>
      val path = ac.table.asInstanceOf[org.apache.spark.sql.catalyst.analysis.ResolvedTable]
        .table.asInstanceOf[GraftTable].path
      GraftSetNotNullCommand(path, ac.specs.map { s =>
        val f = s.column.asInstanceOf[org.apache.spark.sql.catalyst.analysis.ResolvedFieldName]
        f.path :+ f.field.name
      })
  }

  private def refuse(what: String): Nothing =
    throw new UnsupportedOperationException(
      s"graft-delta MERGE supports ordered WHEN MATCHED [AND c] THEN " +
        "UPDATE SET .../DELETE, WHEN NOT MATCHED [AND c] THEN INSERT ..., " +
        "and WHEN NOT MATCHED BY SOURCE [AND c] THEN UPDATE/DELETE, over " +
        s"an equi-join ON of same-named keys; got: $what")

  private def buildMerge(path: String, m: MergeIntoTable): LogicalPlan = {
    // WITH SCHEMA EVOLUTION is honored UPSTREAM of this rule: Spark's
    // ResolveMergeIntoSchemaEvolution computes the source-vs-target
    // schema diff and applies it through TableCatalog.alterTable — i.e.
    // GraftCatalog.alterTable → DeltaWrite.addColumns, ONE metaData-only
    // commit — then re-resolves the merge against the evolved table. By
    // the time the plan reaches here the target already carries the new
    // columns, so nothing is left to refuse for catalog-identified
    // targets. A PATH-based target (`delta`.`/dir`) has no catalog for
    // the analyzer to alter, so the flag would silently do nothing
    // there — refuse with the explicit two-statement workaround.
    if (m.withSchemaEvolution && !EliminateSubqueryAliases(m.targetTable)
        .collectFirst { case r: DataSourceV2Relation => r }
        .exists(r => r.catalog.isDefined && r.identifier.isDefined))
      throw new UnsupportedOperationException(
        "graft-delta MERGE WITH SCHEMA EVOLUTION needs a catalog table " +
          "(schema changes commit through the catalog); for a path table " +
          "run ALTER TABLE ... ADD COLUMNS (...) first, then MERGE")
    val targetOut = m.targetTable.outputSet
    val sourceOut = m.sourceTable.outputSet

    // ON must be a conjunction of target.k = source.k same-name
    // equalities — the key-equality contract of both merge paths
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case And(l, r) => conjuncts(l) ++ conjuncts(r)
      case other => Seq(other)
    }
    val keys = conjuncts(m.mergeCondition).map {
      case EqualTo(a: AttributeReference, b: AttributeReference) =>
        val pair =
          if (targetOut.contains(a) && sourceOut.contains(b)) Some((a, b))
          else if (targetOut.contains(b) && sourceOut.contains(a)) Some((b, a))
          else None
        val (t, s) = pair.getOrElse(refuse(
          s"ON ${a.sql} = ${b.sql} does not join target to source"))
        if (!t.name.equalsIgnoreCase(s.name)) refuse(
          s"ON ${t.name} = ${s.name}: the source column must carry the " +
            "target column's name (alias it in USING (...))")
        t.name
      case other => refuse(s"ON condition ${other.sql}")
    }

    // the STAR shape keeps its dedicated path (DeltaWrite.merge) so the
    // SQL and Scala doors commit identical logs for the common upsert;
    // everything beyond it routes to the general three-population merge
    def isStarAssigns(assigns: Seq[Assignment]): Boolean = {
      val assigned = assigns.flatMap { a =>
        (a.key, a.value) match {
          case (k: AttributeReference, v: AttributeReference)
            if sourceOut.contains(v) && k.name.equalsIgnoreCase(v.name) =>
            Some(k.name)
          case _ => None
        }
      }
      assigned.size == assigns.size &&
        m.targetTable.output.map(_.name).forall(n =>
          assigned.exists(_.equalsIgnoreCase(n)))
    }
    def srcOnlyRefs(c: Expression): Boolean = c.references.subsetOf(sourceOut)
    val starShape =
      m.notMatchedBySourceActions.isEmpty &&
        m.matchedActions.count(_.isInstanceOf[UpdateAction]) <= 1 &&
        m.matchedActions.count(_.isInstanceOf[DeleteAction]) <= 1 &&
        m.matchedActions.forall {
          case UpdateAction(c, assigns, _) =>
            isStarAssigns(assigns) && c.forall(srcOnlyRefs)
          case DeleteAction(c) => c.forall(srcOnlyRefs)
          case _ => false
        } &&
        (m.notMatchedActions match {
          case Seq() => true
          case Seq(InsertAction(c, assigns)) =>
            isStarAssigns(assigns) && c.forall(srcOnlyRefs)
          case _ => false
        })
    if (starShape) buildStar(path, m, keys) else buildGeneral(path, m, keys)
  }

  /** The general shape → [[graft.io.DeltaWrite.mergeAdvanced]]: ordered
    * clauses, partial assignments, target-referencing conditions, and
    * NOT MATCHED BY SOURCE. Matched-clause expressions are re-anchored
    * into the joined-frame namespace the writer evaluates them in —
    * target columns by plain name, source columns behind
    * [[graft.io.DeltaWrite.MergeSrcPrefix]]; insert clauses see the
    * plain source, BY SOURCE clauses the plain target. */
  private def buildGeneral(path: String, m: MergeIntoTable,
      keys: Seq[String]): LogicalPlan = {
    val targetOut = m.targetTable.outputSet
    val sourceOut = m.sourceTable.outputSet
    def sided(e: Expression): Expression = {
      GraftSqlDml.noSubquery(e, "MERGE")
      e.transform {
        case a: AttributeReference if sourceOut.contains(a) =>
          UnresolvedAttribute.quoted(graft.io.DeltaWrite.MergeSrcPrefix + a.name)
        case a: AttributeReference if targetOut.contains(a) =>
          UnresolvedAttribute.quoted(a.name)
      }
    }
    def plain(e: Expression): Expression = {
      GraftSqlDml.noSubquery(e, "MERGE")
      e.transform { case a: AttributeReference => UnresolvedAttribute.quoted(a.name) }
    }
    def assignName(a: Assignment): String = a.key match {
      case ar: AttributeReference => ar.name
      case other => refuse(s"assignment to ${other.sql} — top-level columns only")
    }
    // Spark's alignment pads unmentioned columns with exprId-identical
    // identity assignments — drop them (they mean "keep"); an
    // all-identity list the USER wrote stays (a real rewrite + CDC)
    def dropPadding(assigns: Seq[Assignment]): Seq[Assignment] = {
      val real = assigns.filterNot { a =>
        (a.key, a.value) match {
          case (k: AttributeReference, v: AttributeReference) => k.exprId == v.exprId
          case _ => false
        }
      }
      if (real.nonEmpty || assigns.isEmpty) real else assigns
    }
    val matched = m.matchedActions.map {
      case UpdateAction(c, assigns, _) =>
        (c.map(sided), Some(dropPadding(assigns).map(a =>
          assignName(a) -> sided(a.value))))
      case DeleteAction(c) => (c.map(sided), None)
      case other => refuse(s"matched action $other")
    }
    val inserts = m.notMatchedActions.map {
      case InsertAction(c, assigns) =>
        c.foreach(cc => if (!cc.references.subsetOf(sourceOut)) refuse(
          s"NOT MATCHED condition ${cc.sql} references target columns"))
        (c.map(plain), assigns.map(a => assignName(a) -> plain(a.value)))
      case other => refuse(s"not-matched action $other")
    }
    val bySource = m.notMatchedBySourceActions.map {
      case UpdateAction(c, assigns, _) =>
        c.foreach(cc => if (!cc.references.subsetOf(targetOut)) refuse(
          s"NOT MATCHED BY SOURCE condition ${cc.sql} references source columns"))
        (c.map(plain), Some(dropPadding(assigns).map(a =>
          assignName(a) -> plain(a.value))))
      case DeleteAction(c) =>
        c.foreach(cc => if (!cc.references.subsetOf(targetOut)) refuse(
          s"NOT MATCHED BY SOURCE condition ${cc.sql} references source columns"))
        (c.map(plain), None)
      case other => refuse(s"not-matched-by-source action $other")
    }
    GraftMergeAdvancedCommand(path, m.sourceTable, keys, matched, inserts, bySource)
  }

  private def buildStar(path: String, m: MergeIntoTable,
      keys: Seq[String]): LogicalPlan = {
    val sourceOut = m.sourceTable.outputSet

    def sourceOnly(cond: Expression, clause: String): Expression = {
      GraftSqlDml.noSubquery(cond, "MERGE")
      if (!cond.references.subsetOf(sourceOut)) refuse(
        s"$clause condition ${cond.sql} references target columns — " +
          "graft merge clause conditions evaluate over the source row")
      cond
    }

    /** Every target column assigned the same-named source attribute —
      * the aligned expansion of `SET *` / `INSERT *`. */
    def requireStar(assigns: Seq[Assignment], clause: String): Unit = {
      val assigned = assigns.map { a =>
        (a.key, a.value) match {
          case (k: AttributeReference, v: AttributeReference)
            if sourceOut.contains(v) && k.name.equalsIgnoreCase(v.name) => k.name
          case (k, v) => refuse(
            s"$clause SET ${k.sql} = ${v.sql} — only SET * / INSERT * " +
              "(full-row, same-named source columns) is supported")
        }
      }
      val missing = m.targetTable.output.map(_.name).filterNot(n =>
        assigned.exists(_.equalsIgnoreCase(n)))
      if (missing.nonEmpty) refuse(
        s"$clause assigns only ${assigned.mkString(",")} — missing " +
          s"${missing.mkString(",")} (full-row SET * / INSERT * required)")
    }

    // first-match-wins across WHEN MATCHED clauses: each action fires
    // only where no earlier action's condition held. An earlier
    // condition evaluating NULL did NOT hold (SQL: only TRUE fires),
    // so the negation coalesces through false — Not(NULL) is NULL and
    // would otherwise silently suppress every later clause for that
    // row instead of falling through
    var updateWhen: Option[Expression] = None
    var deleteWhen: Option[Expression] = None
    var priorNeg: Expression = TrueLiteral
    def guard(c: Option[Expression]): Expression = c match {
      case None => priorNeg
      case Some(e) => And(priorNeg, e)
    }
    def didNotFire(c: Option[Expression]): Expression =
      Not(Coalesce(Seq(c.getOrElse(TrueLiteral), Literal.FalseLiteral)))
    m.matchedActions.foreach {
      case UpdateAction(c, assigns, _) =>
        if (updateWhen.isDefined) refuse("two WHEN MATCHED UPDATE clauses")
        requireStar(assigns, "WHEN MATCHED UPDATE")
        c.foreach(sourceOnly(_, "WHEN MATCHED UPDATE"))
        updateWhen = Some(guard(c))
        priorNeg = And(priorNeg, didNotFire(c))
      case DeleteAction(c) =>
        if (deleteWhen.isDefined) refuse("two WHEN MATCHED DELETE clauses")
        c.foreach(sourceOnly(_, "WHEN MATCHED DELETE"))
        deleteWhen = Some(guard(c))
        priorNeg = And(priorNeg, didNotFire(c))
      case other => refuse(s"matched action $other")
    }
    val insertWhen: Option[Expression] = m.notMatchedActions match {
      case Seq() => None
      case Seq(InsertAction(c, assigns)) =>
        requireStar(assigns, "WHEN NOT MATCHED INSERT")
        c.foreach(sourceOnly(_, "WHEN NOT MATCHED INSERT"))
        Some(c.getOrElse(TrueLiteral))
      case other => refuse(s"not-matched actions $other")
    }
    GraftMergeCommand(path, m.sourceTable, keys,
      updateWhen, deleteWhen, insertWhen)
  }
}

private[plans] object GraftSqlDml {
  /** Re-anchor a resolved condition/assignment onto a FRESH read of the
    * table: attribute references become by-name lookups (the original
    * exprIds belong to the analysis-time relation and would never
    * resolve against the writer's head-snapshot scan). */
  def byName(e: Expression): Column =
    GraftColumnBridge.column(e.transform {
      case a: AttributeReference => UnresolvedAttribute.quoted(a.name)
    })

  def noSubquery(e: Expression, stmt: String): Unit =
    if (e.exists(_.isInstanceOf[SubqueryExpression]))
      throw new UnsupportedOperationException(
        s"graft-delta $stmt: subqueries in DML conditions are not " +
          "supported — materialize the subquery into a temp view and " +
          "reference it, or use the Scala API (deleteIn for key sets)")
}

/** `ALTER TABLE t ALTER COLUMN c SET NOT NULL` → the data-validated
  * tighten ([[DeltaWrite.updateColumnNullability]]): existing rows are
  * checked for NULLs before the metaData commit, and future writes
  * enforce the declared contract. One commit per column, in statement
  * order. */
case class GraftSetNotNullCommand(path: String, columns: Seq[Seq[String]])
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    columns.foreach(c =>
      DeltaWrite.updateColumnNullability(spark, path, c, nullable = false))
    Seq.empty
  }
  override def simpleString(maxFields: Int): String =
    s"GraftSetNotNullCommand $path (${columns.map(_.mkString(".")).mkString(", ")})"
}

/** `DELETE FROM t WHERE cond` → deletion-vector delete at the head. */
case class GraftDeleteCommand(path: String, condition: Expression)
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    DeltaWrite.deleteWhere(spark, path, GraftSqlDml.byName(condition))
    Seq.empty
  }
  override def simpleString(maxFields: Int): String =
    s"GraftDeleteCommand $path WHERE ${condition.sql}"
}

/** `UPDATE t SET ... WHERE cond` → copy-on-write rewrite at the head. */
case class GraftUpdateCommand(path: String,
    assignments: Seq[(String, Expression)], condition: Expression)
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    DeltaWrite.updateWhere(spark, path, GraftSqlDml.byName(condition),
      assignments.map { case (n, e) => n -> GraftSqlDml.byName(e) })
    Seq.empty
  }
  override def simpleString(maxFields: Int): String =
    s"GraftUpdateCommand $path SET ${assignments.map(_._1).mkString(",")} " +
      s"WHERE ${condition.sql}"
}

/** `MERGE INTO t USING s ON keys ...` → [[DeltaWrite.merge]] with the
  * clause conditions composed first-match-wins. A `None` clause means
  * ABSENT (never fires); DeltaWrite.MergeClauses uses None-means-always
  * for update/insert, so absence is made explicit with `lit(false)`. */
case class GraftMergeCommand(path: String, source: LogicalPlan,
    keys: Seq[String], updateWhen: Option[Expression],
    deleteWhen: Option[Expression], insertWhen: Option[Expression])
    extends LeafRunnableCommand {
  override def innerChildren: Seq[LogicalPlan] = Seq(source)
  override def run(spark: SparkSession): Seq[Row] = {
    val src = GraftColumnBridge.ofRows(spark, source)
    DeltaWrite.merge(spark, path, src, keys,
      clauses = DeltaWrite.MergeClauses(
        updateWhen = Some(updateWhen.map(GraftSqlDml.byName).getOrElse(lit(false))),
        deleteWhen = deleteWhen.map(GraftSqlDml.byName),
        insertWhen = Some(insertWhen.map(GraftSqlDml.byName).getOrElse(lit(false)))))
    Seq.empty
  }
  override def simpleString(maxFields: Int): String =
    s"GraftMergeCommand $path ON ${keys.mkString(",")}"
}

/** The GENERAL merge → [[DeltaWrite.mergeAdvanced]]. Each clause is
  * `(condition, Some(assignments))` for UPDATE/INSERT or `(condition,
  * None)` for DELETE; expressions were re-anchored at build time into
  * the writer's evaluation namespaces (see `buildGeneral`), so run()
  * just wraps them into Columns. */
case class GraftMergeAdvancedCommand(path: String, source: LogicalPlan,
    keys: Seq[String],
    matched: Seq[(Option[Expression], Option[Seq[(String, Expression)]])],
    inserts: Seq[(Option[Expression], Seq[(String, Expression)])],
    bySource: Seq[(Option[Expression], Option[Seq[(String, Expression)]])])
    extends LeafRunnableCommand {
  override def innerChildren: Seq[LogicalPlan] = Seq(source)
  override def run(spark: SparkSession): Seq[Row] = {
    import graft.io.DeltaWrite
    val src = GraftColumnBridge.ofRows(spark, source)
    def c(e: Expression) = GraftColumnBridge.column(e)
    def when(w: (Option[Expression], Option[Seq[(String, Expression)]])): DeltaWrite.MergeWhen =
      w match {
        case (cond, Some(as)) => DeltaWrite.MergeUpdateWhen(cond.map(c),
          as.map { case (n, e) => n -> c(e) })
        case (cond, None) => DeltaWrite.MergeDeleteWhen(cond.map(c))
      }
    DeltaWrite.mergeAdvanced(spark, path, src, keys,
      matched = matched.map(when),
      notMatched = inserts.map { case (cond, as) =>
        DeltaWrite.MergeInsertWhen(cond.map(c), as.map { case (n, e) => n -> c(e) })
      },
      notMatchedBySource = bySource.map(when))
    Seq.empty
  }
  override def simpleString(maxFields: Int): String =
    s"GraftMergeAdvancedCommand $path ON ${keys.mkString(",")} " +
      s"[matched=${matched.size}, insert=${inserts.size}, bySource=${bySource.size}]"
}
