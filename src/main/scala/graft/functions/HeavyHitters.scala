package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy hitters as a native Catalyst
  * [[TypedImperativeAggregate]] — the mergeable-summaries variant
  * (Agarwal et al., "Mergeable Summaries", PODS 2012), so Spark's
  * arbitrary partial/merge tree is safe: each partition keeps at most
  * `k` counters, partials serialize as compact byte arrays onto the
  * shuffle wire, and the merge step combines then re-prunes to `k`.
  *
  * Guarantees (n = stream length, for every item x with true count
  * c(x)): the reported estimate e(x) satisfies
  * `c(x) − n/(k+1) ≤ e(x) ≤ c(x)`, and every x with
  * `c(x) > n/(k+1)` IS in the summary. With `k` ≥ the number of
  * distinct items no counter is ever evicted and every estimate is
  * exact — the property the DuckDB oracle checks (q193); the
  * approximation bound itself is property-tested in
  * HeavyHittersSpec.
  *
  * Scale: this is the operator for "top domains / tokens / user
  * agents over 100 TB" where exact value_counts would shuffle every
  * distinct key — MG shuffles at most `k` counters per partition,
  * total state O(k · partitions), one round, no second pass.
  *
  * Reference parallel: `transformer_data.py`'s value_counts reporting
  * (§2 A6) is the exact small-data form of this summary.
  */
case class MisraGriesAgg(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]]
  with UnaryLike[Expression] {

  require(k >= 1, s"misra_gries: k must be >= 1, got $k")

  override def prettyName: String = "misra_gries"
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("est", LongType, nullable = false))), containsNull = false)

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  /** Add `c` observations of `item`: bump an existing counter, claim a
    * free slot, or — when full — apply the decrement step. Decrementing
    * by `d = min(c, smallest counter)` at once keeps single-row update
    * O(1) amortized and batched merge-adds correct. */
  private def add(buf: mutable.HashMap[String, Long], item: String, c: Long): Unit = {
    val cur = buf.getOrElse(item, -1L)
    if (cur >= 0L) { buf.update(item, cur + c); return }
    if (buf.size < k) { buf.update(item, c); return }
    // full + unseen: cancel d from every counter and d from the new item
    val d = math.min(c, buf.valuesIterator.min)
    buf.mapValuesInPlace((_, v) => v - d)
    buf.filterInPlace((_, v) => v > 0L)
    if (c > d) add(buf, item, c - d) // freed slots (or recurse-decrement again)
  }

  override def update(
      buf: mutable.HashMap[String, Long], input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) add(buf, v.toString, 1L)
    buf
  }

  override def merge(
      a: mutable.HashMap[String, Long],
      b: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    // combine counters, then prune back to k by subtracting the
    // (k+1)-th largest combined count from everything (Agarwal et al.
    // §3.2) — equivalent to a sequence of decrement steps, so the MG
    // bound survives arbitrary merge trees.
    b.foreach { case (item, c) => a.update(item, a.getOrElse(item, 0L) + c) }
    if (a.size > k) {
      val cut = a.valuesIterator.toArray.sorted(Ordering.Long.reverse).apply(k)
      a.mapValuesInPlace((_, v) => v - cut)
      a.filterInPlace((_, v) => v > 0L)
    }
    a
  }

  /** Deterministic output: counters sorted by estimate desc, item asc. */
  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    val rows = buf.toArray.sortBy { case (item, est) => (-est, item) }
      .map { case (item, est) =>
        InternalRow(UTF8String.fromString(item), est) }
    new GenericArrayData(rows.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (item, est) =>
      val bytes = item.getBytes("UTF-8")
      out.writeInt(bytes.length)
      out.write(bytes)
      out.writeLong(est)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf.update(new String(b, "UTF-8"), in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MisraGriesAgg =
    copy(child = newChild)
}

/** Column surface for the MG summary. */
object HeavyHitters {
  import org.apache.spark.sql.GraftColumnBridge.{column => toCol, expression => toExpr}

  /** `misraGries(col, k)`: array<struct<item,est>> of ≤ k counters,
    * sorted by estimate desc then item — exact when the group's
    * distinct count ≤ k. */
  def misraGries(c: Column, k: Int): Column =
    toCol(MisraGriesAgg(toExpr(c), k).toAggregateExpression())
}
