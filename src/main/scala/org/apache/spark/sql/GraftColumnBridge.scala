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
