package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.sql.SparkSession
import org.apache.spark.unsafe.types.UTF8String

/** JVM helpers invoked from generated code (static forwarders make
  * them callable as `graft.functions.NativeHelpers.parse(...)`). */
object NativeHelpers {

  /** Reference-exact numeric normalization (transformer_data.py:63-75);
    * shared by the interpreted path and generated code. */
  def parse(s: UTF8String): java.lang.Double = {
    if (s == null) return null
    val v = s.toString.trim
    if (v.isEmpty) return null
    var dots = 0; var commas = 0
    var i = 0
    while (i < v.length) {
      val c = v.charAt(i)
      if (c == '.') dots += 1 else if (c == ',') commas += 1
      i += 1
    }
    val cleaned =
      if (dots > 0 && commas == 1 && v.lastIndexOf(',') > v.lastIndexOf('.'))
        v.replace(".", "").replace(',', '.')
      else if (commas > 0 && dots == 0) v.replace(",", "")
      else v
    try java.lang.Double.valueOf(cleaned)
    catch { case _: NumberFormatException => null }
  }

  /** State-machine single→double quote repair (SURVEY §0/§7.3): the
    * reference's blanket `replace("'", '"')` corrupts values like
    * "Lee's team"; here a quote converts ONLY when it's a delimiter —
    * i.e. not surrounded by letters/digits on both sides. A
    * regexp_replace cannot express this without lookaround pitfalls
    * across engines, hence the native helper. */
  def repairJson(s: UTF8String): UTF8String = {
    if (s == null) return null
    val v = s.toString
    if (v.indexOf('"') >= 0) return s // already double-quoted: leave as-is
    val sb = new java.lang.StringBuilder(v.length)
    var i = 0
    while (i < v.length) {
      val c = v.charAt(i)
      if (c == '\'') {
        val prevAlnum = i > 0 && Character.isLetterOrDigit(v.charAt(i - 1))
        val nextAlnum = i + 1 < v.length && Character.isLetterOrDigit(v.charAt(i + 1))
        sb.append(if (prevAlnum && nextAlnum) '\'' else '"')
      } else sb.append(c)
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }

  /** Cosine similarity over two double arrays — numerically IDENTICAL
    * to the declarative `aggregate(zip_with(a,b,_*_), 0.0, _+_) /
    * (sqrt(·)*sqrt(·))` fold (same left-to-right accumulation), with
    * its exact null semantics mirrored: null element → null,
    * length mismatch → null (zip_with pads with nulls, which poison
    * the fold). One deliberate divergence: a zero-norm vector yields
    * null here, where the declarative form under ANSI (the Spark 4
    * default) throws DIVIDE_BY_ZERO — in a corpus scan an all-zero
    * embedding is data noise to skip, not a query error.
    * Exists because higher-order functions evaluate via interpreted
    * lambdas and break the whole-stage-codegen span right where the
    * ANN scans are hottest. */
  def cosine(a: ArrayData, b: ArrayData): java.lang.Double = {
    if (a == null || b == null) return null
    val n = a.numElements()
    if (n != b.numElements()) return null
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = a.getDouble(i); val y = b.getDouble(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) null else java.lang.Double.valueOf(dot / denom)
  }
}

/** Codegen'd scalar expression: `normalize_numeric_native(str)`.
  * Preference order per SURVEY §7.3: this is the (b) tier — a custom
  * Catalyst Expression with doGenCode, no UDF SerDe, registered in the
  * session FunctionRegistry so it's callable from SQL too. */
case class NormalizeNumericExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "normalize_numeric_native"

  override protected def nullSafeEval(input: Any): Any = {
    val r = NativeHelpers.parse(input.asInstanceOf[UTF8String])
    if (r == null) null else r.doubleValue()
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    ev.copy(code =
      code"""
        ${childGen.code}
        boolean ${ev.isNull} = true;
        double ${ev.value} = 0.0;
        if (!${childGen.isNull}) {
          java.lang.Double r = graft.functions.NativeHelpers.parse(${childGen.value});
          if (r != null) { ${ev.isNull} = false; ${ev.value} = r.doubleValue(); }
        }
      """)
  }

  override protected def withNewChildInternal(newChild: Expression): NormalizeNumericExpr =
    copy(child = newChild)
}

/** Codegen'd quote-repair expression: `repair_json_native(str)`. */
case class RepairJsonExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "repair_json_native"

  override protected def nullSafeEval(input: Any): Any =
    NativeHelpers.repairJson(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NativeHelpers.repairJson($c)")

  override protected def withNewChildInternal(newChild: Expression): RepairJsonExpr =
    copy(child = newChild)
}

/** Codegen'd cosine similarity: `cosine_native(array<double>, array<double>)`.
  * The vector-math hot path of the ANN scans (q45/q56/q47 tier) —
  * see NativeHelpers.cosine for why this beats zip_with/aggregate. */
case class CosineSimilarityExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "cosine_native"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val r = NativeHelpers.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    if (r == null) null else r.doubleValue()
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aGen = left.genCode(ctx)
    val bGen = right.genCode(ctx)
    ev.copy(code =
      code"""
        ${aGen.code}
        ${bGen.code}
        boolean ${ev.isNull} = true;
        double ${ev.value} = 0.0;
        if (!${aGen.isNull} && !${bGen.isNull}) {
          java.lang.Double r = graft.functions.NativeHelpers.cosine(${aGen.value}, ${bGen.value});
          if (r != null) { ${ev.isNull} = false; ${ev.value} = r.doubleValue(); }
        }
      """)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarityExpr =
    copy(left = newLeft, right = newRight)
}

/** Session registration so the natives are callable from SQL and via
  * functions.call_function (SURVEY §2.10's "registered in the
  * FunctionRegistry" option). */
object NativeRegistry {
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("normalize_numeric_native",
      (exprs: Seq[Expression]) => NormalizeNumericExpr(exprs.head), "scala_udf")
    reg.createOrReplaceTempFunction("repair_json_native",
      (exprs: Seq[Expression]) => RepairJsonExpr(exprs.head), "scala_udf")
    reg.createOrReplaceTempFunction("cosine_native",
      (exprs: Seq[Expression]) => CosineSimilarityExpr(exprs(0), exprs(1)), "scala_udf")
  }
}
