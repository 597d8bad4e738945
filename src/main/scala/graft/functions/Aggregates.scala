package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Custom typed aggregation surface (SURVEY §2.10's "UDAF" option,
  * which the rest of the engine avoids in favor of built-ins): a
  * numerically stable Welford/Chan sample-variance `Aggregator`,
  * registrable both as a Column (`Aggregates.welfordVar`) and in the
  * FunctionRegistry for SQL text (`Aggregates.register`).
  *
  * The merge step uses Chan et al.'s pairwise-combine formula, so the
  * aggregate is correct under Spark's arbitrary partial-merge order —
  * the property a naive sum/sum-of-squares UDAF loses at scale (its
  * E[x²]−E[x]² form cancels catastrophically once |mean| ≫ stddev).
  * AggregatesSpec pins equality with Spark's own var_samp to 1e-9
  * relative; the q159 oracle pins it against DuckDB's var_samp.
  */
object Aggregates {

  case class WelfordBuf(n: Long, mean: Double, m2: Double)

  object WelfordVar extends Aggregator[java.lang.Double, WelfordBuf, java.lang.Double] {
    override def zero: WelfordBuf = WelfordBuf(0L, 0.0, 0.0)

    override def reduce(b: WelfordBuf, xBoxed: java.lang.Double): WelfordBuf =
      if (xBoxed == null) b
      else {
        val x = xBoxed.doubleValue()
        val n1 = b.n + 1
        val d = x - b.mean
        val mean = b.mean + d / n1
        WelfordBuf(n1, mean, b.m2 + d * (x - mean))
      }

    override def merge(a: WelfordBuf, b: WelfordBuf): WelfordBuf =
      if (a.n == 0L) b
      else if (b.n == 0L) a
      else {
        val n = a.n + b.n
        val d = b.mean - a.mean
        WelfordBuf(n,
          a.mean + d * b.n / n,
          a.m2 + b.m2 + d * d * (a.n.toDouble * b.n / n))
      }

    override def finish(r: WelfordBuf): java.lang.Double =
      if (r.n < 2L) null else r.m2 / (r.n - 1)

    override def bufferEncoder: Encoder[WelfordBuf] = Encoders.product[WelfordBuf]
    override def outputEncoder: Encoder[java.lang.Double] = Encoders.DOUBLE
  }

  /** Column form: `welfordVar(col)` ≡ var_samp(col), stable. */
  def welfordVar(c: Column): Column = udaf(WelfordVar).apply(c)

  /** SQL-text form: SELECT welford_var(x) ... */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.udf.register("welford_var", udaf(WelfordVar))
}
