package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, GraftColumnBridge}
import org.apache.spark.sql.execution.SparkStrategy
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Cast, Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.types.{ByteType, DoubleType, FloatType, IntegerType, LongType, ShortType}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
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
  * MEMORY CONTRACT: per-KEY memory is O(k); per-PARTITION memory is
  * bounded by `maxKeysPerPartition` (session conf
  * `spark.graft.topk.maxKeysPerPartition`, default unlimited) live
  * heap entries. When the heap map reaches the cap, the operator
  * SPILLS: top-k is a monoid (topk(A∪B) = topk(topk(A)∪topk(B))), so
  * the partial heaps drain to disk as a run SORTED by (key bytes,
  * order DESC, tie ASC) and the map restarts empty; at input end the
  * sorted runs k-way merge — rows of each key group arrive best-first
  * across runs, so the merge emits the first k per group holding one
  * record per run in memory. With the cap unset nothing changes: the
  * all-in-memory fast path is byte-identical to before. The operator
  * targets the many-rows-per-key regime (ANN rankings: thousands of
  * queries × millions of candidates); for near-unique keys the window
  * row_number form remains the better plan (no per-key heap churn),
  * but it is no longer the only correct one.
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
      // Two-phase, like hash aggregation: a PARTIAL top-k with no
      // distribution requirement runs map-side, so the exchange the
      // FINAL node's ClusteredDistribution forces ships at most
      // k·keys rows per map partition instead of every input row —
      // top-k is a monoid (topk(A∪B) = topk(topk(A)∪topk(B)), the same
      // identity the spill path already relies on), so the final
      // node's output is row-identical. When the child is ALREADY
      // clustered by the keys no exchange is inserted and the partial
      // pass degenerates to one extra bounded-heap scan of the
      // (already ≤k-per-key) rows — measured noise.
      TopKPerKeyExec(keys, order, tie, k,
        TopKPerKeyExec(keys, order, tie, k, planLater(child), maxKeys,
          partial = true),
        maxKeys) :: Nil
    case _ => Nil
  }
}

case class TopKPerKeyExec(
    keys: Seq[Expression],
    order: Expression,
    tie: Expression,
    k: Int,
    child: SparkPlan,
    maxKeysPerPartition: Int = Int.MaxValue,
    partial: Boolean = false) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def nodeName: String =
    if (partial) "TopKPerKeyPartial" else "TopKPerKey"

  /** All rows of a key must meet in one partition — Catalyst plans the
    * hash exchange (or reuses a compatible existing partitioning). The
    * PARTIAL phase accepts any distribution: it runs before the
    * exchange and prunes each map partition to its local top-k. */
  override def requiredChildDistribution: Seq[Distribution] =
    (if (partial) UnspecifiedDistribution else ClusteredDistribution(keys)) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val kLocal = k
    val maxKeysLocal = maxKeysPerPartition
    val keysLocal = keys
    val ordTieLocal = Seq(order, tie)
    val childOutput = child.output
    child.execute().mapPartitions({ it =>
      import TopKPerKeyExec.{Entry, SpillReader, bestFirstBytes}
      val keyProj = UnsafeProjection.create(keysLocal, childOutput)
      val ordProj = UnsafeProjection.create(ordTieLocal, childOutput)
      // dequeue() must surface the WORST held row (smallest order,
      // then largest tie) so one comparison decides evict-vs-ignore
      val worstFirst: Ordering[Entry] = Ordering.by(e => (-e.ord, e.tie))
      val heaps = mutable.HashMap.empty[UnsafeRow, mutable.PriorityQueue[Entry]]
      val spills = mutable.ArrayBuffer.empty[java.io.File]

      // drain every heap to disk as ONE sorted run (key bytes asc,
      // order desc, tie asc) and restart the map empty — correctness
      // from the top-k monoid; see MEMORY CONTRACT in the scaladoc
      def spillAll(): Unit = {
        val batch = heaps.iterator.flatMap { case (key, h) =>
          val kb = key.getBytes
          h.iterator.map(e => (kb, e))
        }.toArray
        java.util.Arrays.sort(batch, bestFirstBytes)
        val f = java.io.File.createTempFile("graft-topk-spill-", ".run")
        val out = new java.io.DataOutputStream(new java.io.BufferedOutputStream(
          new java.io.FileOutputStream(f), 1 << 16))
        try batch.foreach { case (kb, e) =>
          out.writeInt(kb.length); out.write(kb)
          out.writeDouble(e.ord); out.writeLong(e.tie)
          val rb = e.row.getBytes
          out.writeInt(rb.length); out.write(rb)
        } finally out.close()
        spills += f
        heaps.clear()
      }

      it.foreach { row =>
        val ot = ordProj(row)
        if (!ot.isNullAt(0)) {
          // NULL tie = NULLS FIRST under ASC (Long.MinValue = best),
          // matching the window form's `.asc` tie ordering
          val ord = ot.getDouble(0)
          val tie = if (ot.isNullAt(1)) Long.MinValue else ot.getLong(1)
          // look up with the TRANSIENT projection result; copy the key
          // only on the miss path — getOrElseUpdate's eager key arg
          // would byte-copy the key row once per INPUT row
          val transientKey = keyProj(row)
          val heap = heaps.get(transientKey) match {
            case Some(h) => h
            case None =>
              if (heaps.size >= maxKeysLocal) spillAll()
              val h = mutable.PriorityQueue.empty[Entry](worstFirst)
              heaps.put(transientKey.copy(), h)
              h
          }
          // copy the row's bytes ONLY when it actually enters the heap:
          // in the steady state most rows lose the one comparison
          // against the held worst (same worstFirst comparator via a
          // row-less probe, so accept/reject is decided identically)
          // and an unconditional copy was the dominant per-row cost of
          // the map-side partial phase
          if (heap.size < kLocal)
            heap.enqueue(Entry(ord, tie, row.asInstanceOf[UnsafeRow].copy()))
          else if (worstFirst.compare(Entry(ord, tie, null), heap.head) < 0) {
            heap.dequeue()
            heap.enqueue(Entry(ord, tie, row.asInstanceOf[UnsafeRow].copy()))
          }
        }
      }

      if (spills.isEmpty)
        heaps.valuesIterator.flatMap(_.iterator.map(_.row))
      else {
        if (heaps.nonEmpty) spillAll()
        val files = spills.toSeq
        Option(org.apache.spark.TaskContext.get()).foreach(
          _.addTaskCompletionListener[Unit](_ => files.foreach(_.delete())))
        SpillReader.mergeTopK(files, childOutput.length, kLocal)
      }
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

  /** Spill-run record order: key bytes ascending (grouping only — the
    * semantic key order is irrelevant, byte order is consistent), then
    * order DESC, tie ASC (best row of a key first). */
  private[plans] val bestFirstBytes: java.util.Comparator[(Array[Byte], Entry)] =
    (a: (Array[Byte], Entry), b: (Array[Byte], Entry)) => {
      val c = java.util.Arrays.compareUnsigned(a._1, b._1)
      if (c != 0) c
      else {
        val o = java.lang.Double.compare(b._2.ord, a._2.ord)
        if (o != 0) o else java.lang.Long.compare(a._2.tie, b._2.tie)
      }
    }

  /** Streaming cursor over one sorted spill run. */
  private[plans] final class SpillReader(file: java.io.File) {
    private val in = new java.io.DataInputStream(new java.io.BufferedInputStream(
      new java.io.FileInputStream(file), 1 << 16))
    var key: Array[Byte] = _
    var ord: Double = _
    var tie: Long = _
    var rowBytes: Array[Byte] = _
    /** Load the next record; false (and closed stream) at EOF. */
    def advance(): Boolean =
      try {
        val kl = in.readInt()
        key = new Array[Byte](kl); in.readFully(key)
        ord = in.readDouble(); tie = in.readLong()
        val rl = in.readInt()
        rowBytes = new Array[Byte](rl); in.readFully(rowBytes)
        true
      } catch { case _: java.io.EOFException => in.close(); false }
  }

  private[plans] object SpillReader {
    /** K-way merge of sorted runs → top `k` rows per key group. The
      * merge order equals the run order, so each group streams
      * best-first and the first `k` records of the group ARE its
      * top-k; memory is one record per run. */
    def mergeTopK(files: Seq[java.io.File], numFields: Int, k: Int): Iterator[InternalRow] = {
      val cmp: java.util.Comparator[SpillReader] =
        (a: SpillReader, b: SpillReader) => {
          val c = java.util.Arrays.compareUnsigned(a.key, b.key)
          if (c != 0) c
          else {
            val o = java.lang.Double.compare(b.ord, a.ord)
            if (o != 0) o else java.lang.Long.compare(a.tie, b.tie)
          }
        }
      val pq = new java.util.PriorityQueue[SpillReader](math.max(1, files.size), cmp)
      files.foreach { f => val r = new SpillReader(f); if (r.advance()) pq.add(r) }
      new Iterator[InternalRow] {
        private var curKey: Array[Byte] = null
        private var taken = 0
        private var nextRow: InternalRow = null
        private def computeNext(): Unit = {
          nextRow = null
          while (nextRow == null && !pq.isEmpty) {
            val r = pq.poll()
            val newGroup = curKey == null || !java.util.Arrays.equals(curKey, r.key)
            if (newGroup) { curKey = r.key.clone(); taken = 0 }
            if (taken < k) {
              taken += 1
              val row = new UnsafeRow(numFields)
              row.pointTo(r.rowBytes, r.rowBytes.length)
              nextRow = row
            }
            if (r.advance()) pq.add(r)
          }
        }
        computeNext()
        override def hasNext: Boolean = nextRow != null
        override def next(): InternalRow = {
          val out = nextRow; computeNext(); out
        }
      }
    }
  }
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

  /** Bottom-k twin of [[perKey]]: k best rows per key by `orderName`
    * ASCENDING (smallest first), ties by `tieName` ASC — the ranking
    * the distance-flavored ANN tiers need (ADC / L2: smaller is
    * better). Implemented by negating the order into a temp double
    * column and reusing the same physical operator, so the
    * memory/spill contract is identical. The cast-to-double happens
    * BEFORE negation (exact for every type [[perKey]] accepts; no
    * integer-negation overflow edge). NULL-order rows are never
    * emitted — note this differs from a window `.asc` sort, whose
    * Spark default is NULLS FIRST: callers with nullable order
    * columns must filter explicitly (the bruteForceTopK contract). */
  def perKeyMin(df: DataFrame, keyNames: Seq[String], orderName: String,
      tieName: String, k: Int): DataFrame = {
    import org.apache.spark.sql.functions.col
    val neg = "__graft_topk_neg"
    perKey(df.withColumn(neg, -col(orderName).cast(DoubleType)),
      keyNames, neg, tieName, k).drop(neg)
  }
}
