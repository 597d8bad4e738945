package graft.plans

import graft.functions.{CosineSimilarityExpr, Hash60Expr, NativeRegistry}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{BinaryType, DoubleType, LongType, StringType}

/** Extractor for the declarative sequential-fold dot product the
  * `Similarity.cosine` column builder emits:
  * `aggregate(zip_with(a, b, (x, y) => x * y), 0.0, (acc, x) => acc + x)`
  * — matched structurally on the bound lambda variables (exprId-checked
  * so a lambda body referencing anything but its own arguments can
  * never match).
  */
private object DotProduct {
  def unapply(e: Expression): Option[(Expression, Expression)] = e match {
    case ArrayAggregate(
        ZipWith(a, b, LambdaFunction(
          Multiply(x1: NamedLambdaVariable, y1: NamedLambdaVariable, _),
          Seq(x2: NamedLambdaVariable, y2: NamedLambdaVariable), _)),
        Literal(0.0, DoubleType),
        LambdaFunction(
          Add(acc1: NamedLambdaVariable, el1: NamedLambdaVariable, _),
          Seq(acc2: NamedLambdaVariable, el2: NamedLambdaVariable), _),
        LambdaFunction(fin1: NamedLambdaVariable, Seq(fin2: NamedLambdaVariable), _))
      if x1.exprId == x2.exprId && y1.exprId == y2.exprId &&
         acc1.exprId == acc2.exprId && el1.exprId == el2.exprId &&
         fin1.exprId == fin2.exprId =>
      Some((a, b))
    case _ => None
  }
}

/** Optimizer rule: rewrite the declarative cosine-similarity shape
  * `dot(a,b) / (sqrt(dot(a,a)) * sqrt(dot(b,b)))` into the codegen'd
  * [[CosineSimilarityExpr]]. Higher-order functions evaluate via
  * interpreted lambdas (the #1 hidden perf cliff of column-built vector
  * math), so a consumer who wrote the readable declarative form gets
  * the native hot path without touching their code.
  *
  * Opt-in (via [[GraftExtensions]] or
  * `spark.experimental.extraOptimizations`) because it is fast-math
  * flavored: on a ZERO-NORM vector the declarative form throws under
  * ANSI (DIVIDE_BY_ZERO) while the native expression degrades to null —
  * the same documented divergence the equivalence spec pins for the
  * hand-written native path.
  */
object NativizeCosine extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case Divide(DotProduct(a, b),
        Multiply(Sqrt(DotProduct(a1, a2)), Sqrt(DotProduct(b1, b2)), _), _)
      if a.semanticEquals(a1) && a.semanticEquals(a2) &&
         b.semanticEquals(b1) && b.semanticEquals(b2) =>
      CosineSimilarityExpr(a, b)
  }
}

/** Optimizer rule: rewrite the declarative 60-bit md5 hash shape
  * `conv(substring(md5(s), 1, 15), 16, 10)::long` — what
  * `TextAnalysis.tokenHash60` builds, and what a SQL-text user writes
  * to match the engine's hash contract — into the codegen'd
  * [[Hash60Expr]], which goes digest-bytes → long without the 32-char
  * hex string round-trip. Exact-value-preserving on every input
  * (NgramNativeSpec pins hash60 ≡ the conv form), so unlike
  * NativizeCosine this rule has no ANSI caveat. The analyzer wraps the
  * string argument in an implicit cast to binary; both the direct
  * string child and that cast shape are matched.
  */
object NativizeHash60 extends Rule[LogicalPlan] {
  private object StringToMd5 {
    def unapply(e: Expression): Option[Expression] = e match {
      case Md5(Cast(s, BinaryType, _, _)) if s.dataType == StringType => Some(s)
      case Md5(s) if s.dataType == StringType => Some(s)
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case Cast(Conv(Substring(StringToMd5(s), Literal(1, _), Literal(15, _)),
        Literal(fb, _), Literal(tb, _), _), LongType, _, _)
      if fb == 16 && tb == 10 =>
      Hash60Expr(s)
  }
}

/** The engine's `SparkSessionExtensions` entry point — the idiomatic
  * deploy-time hookup (`spark.sql.extensions=graft.plans.GraftExtensions`
  * on spark-submit, or `SparkSession.builder.withExtensions(new
  * GraftExtensions)` in code): injects every native function into the
  * session FunctionRegistry (SQL-text callers get `cosine_native(...)`
  * etc. without any imperative `NativeRegistry.register` call) and the
  * [[NativizeCosine]] optimizer rule. `Sessions.local` keeps the
  * imperative registration path for sessions built without extensions —
  * both routes share [[NativeRegistry.builders]] so the surfaces cannot
  * drift.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    NativeRegistry.builders.foreach { case (name, builder) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft.functions.NativeExpressions", name), builder))
    }
    ext.injectOptimizerRule(_ => NativizeCosine)
    ext.injectOptimizerRule(_ => NativizeHash60)
    ext.injectPlannerStrategy(_ => TopKStrategy)
    // SQL DELETE/UPDATE/MERGE on graft-delta relations → the
    // transactional writer (see GraftSqlDmlRule). Resolution-batch
    // placement rewrites the row-level plans before Spark's own
    // SupportsRowLevelOperations machinery would reject them.
    ext.injectResolutionRule(session => GraftSqlDmlRule(session))
    // OPTIMIZE / VACUUM / RESTORE SQL — non-ANSI statements ride an
    // injected parser that intercepts exactly those shapes and
    // delegates everything else (see GraftMaintenanceParser).
    ext.injectParser((_, delegate) => new GraftMaintenanceParser(delegate))
  }
}
