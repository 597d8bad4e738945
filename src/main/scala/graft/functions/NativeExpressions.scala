package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
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
  }
}
