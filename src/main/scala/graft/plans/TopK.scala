package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, GraftColumnBridge}
import org.apache.spark.sql.execution.SparkStrategy
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Cast, Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.types.{ByteType, DoubleType, FloatType, IntegerType, LongType, ShortType}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}

import scala.collection.mutable

/** Whole-operator extension point (SURVEY preference (c): custom
  * LogicalPlan + Strategy + SparkPlan): top-k rows per key as ONE
  * physical operator with bounded per-key heaps.
  *
  * The declarative form — `row_number() over (partition by k order by
  * o desc) <= n` — must buffer and SORT every group in full before
  * discarding all but n rows; this operator holds at most k rows per
  * key at any moment, so a 10⁹-row group costs O(k) memory and one
  * scan. The exchange still comes from Catalyst: the exec node only
  * declares `ClusteredDistribution(keys)` and planning inserts the
  * same hash shuffle a groupBy would get (AQE-managed). Order contract:
  * `order` DESC with `tie` ASC breaking ties — deterministic whenever
  * (order, tie) is unique per key; rows whose order value is NULL are
  * never in the top-k (SQL "NULLS LAST under DESC" semantics).
  *
  * MEMORY CONTRACT: per-KEY memory is O(k), but per-PARTITION memory
  * is O(k × distinct keys in that partition), held in an on-heap map
  * with no spill path — the operator targets the many-rows-per-key
  * regime (ANN rankings: thousands of queries × millions of
  * candidates). For key cardinalities approaching row count the
  * window row_number form is the right tool (it spills through the
  * external sorter). `maxKeysPerPartition` (session conf
  * `spark.graft.topk.maxKeysPerPartition`, default unlimited) is the
  * guard rail: a partition exceeding it fails fast with an actionable
  * error instead of slow-burning the executor heap to OOM.
  */
case class TopKPerKey(
    keys: Seq[Expression],
    order: Expression,
    tie: Expression,
    k: Int,
    child: LogicalPlan,
    maxKeysPerPartition: Int = Int.MaxValue) extends UnaryNode {
  require(k > 0, "k must be positive")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKey =
    copy(child = newChild)
}

/** Planner strategy: the one-case match that turns the logical node
  * into its physical operator (everything else falls through to the
  * built-in strategies). Injected via GraftExtensions or appended to
  * `spark.experimental.extraStrategies` by [[TopK.perKey]]. */
object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKey(keys, order, tie, k, child, maxKeys) =>
      TopKPerKeyExec(keys, order, tie, k, planLater(child), maxKeys) :: Nil
    case _ => Nil
  }
}

case class TopKPerKeyExec(
    keys: Seq[Expression],
    order: Expression,
    tie: Expression,
    k: Int,
    child: SparkPlan,
    maxKeysPerPartition: Int = Int.MaxValue) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  /** All rows of a key must meet in one partition — Catalyst plans the
    * hash exchange (or reuses a compatible existing partitioning). */
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(keys) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val kLocal = k
    val maxKeysLocal = maxKeysPerPartition
    val keysLocal = keys
    val ordTieLocal = Seq(order, tie)
    val childOutput = child.output
    child.execute().mapPartitions({ it =>
      import TopKPerKeyExec.Entry
      val keyProj = UnsafeProjection.create(keysLocal, childOutput)
      val ordProj = UnsafeProjection.create(ordTieLocal, childOutput)
      // dequeue() must surface the WORST held row (smallest order,
      // then largest tie) so one comparison decides evict-vs-ignore
      val worstFirst: Ordering[Entry] = Ordering.by(e => (-e.ord, e.tie))
      val heaps = mutable.HashMap.empty[UnsafeRow, mutable.PriorityQueue[Entry]]
      it.foreach { row =>
        val ot = ordProj(row)
        if (!ot.isNullAt(0)) {
          // NULL tie = NULLS FIRST under ASC (Long.MinValue = best),
          // matching the window form's `.asc` tie ordering
          val e = Entry(ot.getDouble(0),
            if (ot.isNullAt(1)) Long.MinValue else ot.getLong(1),
            row.asInstanceOf[UnsafeRow].copy())
          // look up with the TRANSIENT projection result; copy the key
          // only on the miss path — getOrElseUpdate's eager key arg
          // would byte-copy the key row once per INPUT row
          val transientKey = keyProj(row)
          val heap = heaps.get(transientKey) match {
            case Some(h) => h
            case None =>
              if (heaps.size >= maxKeysLocal)
                throw new IllegalStateException(
                  s"TopKPerKey: partition exceeded $maxKeysLocal distinct keys " +
                    "(per-partition memory is O(k x distinct keys) with no spill); " +
                    "use the window row_number form for near-unique keys, or raise " +
                    "spark.graft.topk.maxKeysPerPartition")
              val h = mutable.PriorityQueue.empty[Entry](worstFirst)
              heaps.put(transientKey.copy(), h)
              h
          }
          if (heap.size < kLocal) heap.enqueue(e)
          else if (worstFirst.compare(e, heap.head) < 0) { heap.dequeue(); heap.enqueue(e) }
        }
      }
      heaps.valuesIterator.flatMap(_.iterator.map(_.row))
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}

object TopKPerKeyExec {
  /** Top-level (NOT an inner class of the exec node): an inner case
    * class would carry an $outer pointer, making every task closure
    * serialize the whole physical subtree. */
  private[plans] case class Entry(ord: Double, tie: Long, row: UnsafeRow)
}

/** DataFrame-level API over the operator. */
object TopK {
  /** Top `k` rows per key by column `orderName` DESC (ties broken by
    * `tieName` ASC). Columns are named, not `Column` objects: the node
    * wraps the ANALYZED child plan, so its expressions must be bound
    * to real output attributes up front (Spark 4's Column carries a
    * ColumnNode placeholder only the Dataset API lowers — an
    * unresolved one inside a custom node would reach runtime).
    * Appends [[TopKStrategy]] to the session's extraStrategies
    * idempotently, so any session can call this without
    * GraftExtensions. Output row ORDER is unspecified (as after any
    * shuffle) — sort downstream if presentation order matters. */
  def perKey(df: DataFrame, keyNames: Seq[String], orderName: String,
      tieName: String, k: Int): DataFrame = {
    val spark = df.sparkSession
    // check-and-append under a lock: extraStrategies is a plain var,
    // and a racy read-modify-write from two threads sharing a session
    // could lose a concurrently-added strategy or double-append
    TopK.synchronized {
      if (!spark.experimental.extraStrategies.contains(TopKStrategy))
        spark.experimental.extraStrategies =
          spark.experimental.extraStrategies :+ TopKStrategy
    }
    val lp = GraftColumnBridge.analyzed(df)
    def attr(name: String): Attribute =
      lp.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"column $name not in ${lp.output.map(_.name).mkString(",")}"))
    // the exec compares (double, long) internally; a silent Cast from a
    // non-numeric column would rank NULLs (= drop every row), and a
    // 64-bit order value would lose precision above 2^53 and diverge
    // from the window form the operator claims row-identity with —
    // reject both up front instead
    val ordAttr = attr(orderName)
    ordAttr.dataType match {
      case DoubleType | FloatType | IntegerType | ShortType | ByteType => ()
      case other => throw new IllegalArgumentException(
        s"TopK.perKey order column $orderName: $other is not exactly " +
          "representable as double (needed for heap comparison); cast " +
          "explicitly or use the window row_number form")
    }
    val tieAttr = attr(tieName)
    tieAttr.dataType match {
      case LongType | IntegerType | ShortType | ByteType => ()
      case other => throw new IllegalArgumentException(
        s"TopK.perKey tie column $tieName: $other is not an integral type")
    }
    val maxKeys = spark.conf.getOption("spark.graft.topk.maxKeysPerPartition")
      .map(_.toInt).getOrElse(Int.MaxValue)
    GraftColumnBridge.ofRows(spark, TopKPerKey(
      keyNames.map(attr),
      Cast(ordAttr, DoubleType),
      Cast(tieAttr, LongType),
      k,
      lp,
      maxKeys))
  }
}
