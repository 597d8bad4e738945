package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the sql-private Column ↔ catalyst Expression converters
  * (Spark 4 wrapped Column around ColumnNode; `classic.ExpressionUtils`
  * is `private[sql]`). Living in Spark's package to expose exactly
  * these two conversions is the established extension-library pattern —
  * it keeps graft's native expressions usable as plain Columns on ANY
  * session, with no FunctionRegistry coupling. */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** STRICT Column → catalyst conversion. [[expression]] returns a lazy
    * `ColumnNodeExpression` whose children are connect-style
    * ColumnNodes — invisible to TreeNode traversal, so `collect`-based
    * reference inspection silently finds NOTHING. Callers that walk the
    * tree (e.g. mergeAdvanced's source-only-condition detection) must
    * use this eager converter instead. */
  def catalystExpression(c: Column): Expression =
    classic.ColumnNodeToExpressionConverter(c.node)

  /** `Dataset.ofRows` is `private[sql]`: the door a custom LogicalPlan
    * (graft.plans.TopKPerKey) walks through to become a DataFrame. */
  def ofRows(spark: SparkSession,
      plan: catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** The analyzed logical plan of a DataFrame (for wrapping in a
    * custom logical node). */
  def analyzed(df: DataFrame): catalyst.plans.logical.LogicalPlan =
    df.queryExecution.analyzed
}

/** Test-only probe into `private[sql]` members of SparkSessionExtensions
  * so the specs can assert what `GraftExtensions` injected without
  * building a whole second SparkSession (getOrCreate reuses the test
  * JVM's shared session, ignoring builder extensions). */
object GraftExtensionsProbe {
  def optimizerRules(ext: SparkSessionExtensions, session: SparkSession)
      : Seq[catalyst.rules.Rule[catalyst.plans.logical.LogicalPlan]] =
    ext.buildOptimizerRules(session)
  def resolutionRules(ext: SparkSessionExtensions, session: SparkSession)
      : Seq[catalyst.rules.Rule[catalyst.plans.logical.LogicalPlan]] =
    ext.buildResolutionRules(session)
  def registerFunctions(ext: SparkSessionExtensions,
      reg: catalyst.analysis.FunctionRegistry): catalyst.analysis.FunctionRegistry =
    ext.registerFunctions(reg)
}

/** Multipart SQL identifier → the DSv2 (CatalogPlugin, Identifier) it
  * names — the resolution the maintenance commands (OPTIMIZE / VACUUM /
  * RESTORE, parsed by graft's injected parser) need OUTSIDE the
  * analyzer. `CatalogManager` is `private[sql]`; living in Spark's
  * package to expose exactly this lookup is the same bridge pattern as
  * [[GraftColumnBridge.ofRows]]. Resolution follows Spark's own rule:
  * a first part naming a registered catalog wins, otherwise the whole
  * identifier resolves inside the current catalog (current namespace
  * for a bare name). */
object GraftCatalogBridge {
  import org.apache.spark.sql.connector.catalog.{CatalogPlugin, Identifier}

  def resolve(spark: SparkSession, parts: Seq[String]): (CatalogPlugin, Identifier) = {
    require(parts.nonEmpty, "empty table identifier")
    val cm = spark.asInstanceOf[classic.SparkSession].sessionState.catalogManager
    if (parts.length > 1 && cm.isCatalogRegistered(parts.head))
      (cm.catalog(parts.head), Identifier.of(parts.tail.init.toArray, parts.last))
    else if (parts.length > 1)
      (cm.currentCatalog, Identifier.of(parts.init.toArray, parts.last))
    else
      (cm.currentCatalog, Identifier.of(cm.currentNamespace, parts.last))
  }
}
