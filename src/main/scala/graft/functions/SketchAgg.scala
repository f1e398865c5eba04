package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, GraftShim}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded k-minimum-values state: the k SMALLEST DISTINCT longs seen
  * so far — a max-heap (largest-kept dequeues first) paired with a
  * membership set, both capped at k entries. The bound is the scale
  * story, exactly as with [[TopKBuffer]]: partial buffers, shuffle
  * rows, and merge work never exceed k per (group × partition),
  * regardless of how many billions of values stream through.
  */
final class KMinBuffer {
  val heap: scala.collection.mutable.PriorityQueue[Long] =
    scala.collection.mutable.PriorityQueue.empty[Long]
  val set: scala.collection.mutable.HashSet[Long] =
    scala.collection.mutable.HashSet.empty[Long]

  def offer(h: Long, k: Int): Unit =
    if (!set.contains(h)) {
      if (set.size < k) { heap.enqueue(h); set += h }
      else if (h < heap.head) { set -= heap.dequeue(); heap.enqueue(h); set += h }
    }

  def absorb(other: KMinBuffer, k: Int): Unit =
    other.set.foreach(offer(_, k))

  def sortedAsc: Array[Long] = set.toArray.sorted
}

/** Native KMV (k-minimum-values) sketch aggregate: per group, the k
  * smallest distinct hash values as a sorted `array<long>` — the
  * classical distinct-count sketch (Bar-Yossef et al.): with hashes
  * uniform on [0, 2^62), the k-th smallest h_k estimates the distinct
  * cardinality as (k-1)·2^62/h_k.
  *
  * DETERMINISTIC cross-engine, unlike approx_count_distinct's HLL:
  * the input is the md5-derived h62 hash both engines share, and the
  * k smallest distinct values of a set are order-independent — so a
  * DuckDB oracle reproduces the sketch (and therefore the estimate)
  * EXACTLY, not approximately.
  *
  * Same execution shape as [[TopKByScore]]: a TypedImperativeAggregate
  * run by ObjectHashAggregate, partial state = the bounded buffer
  * itself, map-side combine caps memory and shuffle at k values per
  * group per partition. A `sort + row_number` formulation would ship
  * and sort EVERY distinct value per group; this ships k.
  */
case class KMinValues(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KMinBuffer] {

  require(k > 0, s"kmin_values needs k > 0, got $k")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def prettyName: String = "kmin_values"

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): KMinBuffer = new KMinBuffer

  override def update(buffer: KMinBuffer, input: InternalRow): KMinBuffer = {
    val h = child.eval(input)
    if (h != null) buffer.offer(h.asInstanceOf[Long], k)
    buffer
  }

  override def merge(buffer: KMinBuffer, other: KMinBuffer): KMinBuffer = {
    buffer.absorb(other, k)
    buffer
  }

  override def eval(buffer: KMinBuffer): Any =
    new GenericArrayData(buffer.sortedAsc)

  override def serialize(buffer: KMinBuffer): Array[Byte] = {
    val entries = buffer.sortedAsc
    val bb = ByteBuffer.allocate(4 + entries.length * 8)
    bb.putInt(entries.length)
    entries.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): KMinBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new KMinBuffer
    var j = 0
    while (j < n) { buf.offer(bb.getLong, k); j += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KMinValues =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KMinValues =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KMinValues =
    copy(child = newChildren(0))
}

/** Column builder for [[KMinValues]]. */
object SketchAgg {
  def kMin(values: Column, k: Int): Column =
    GraftShim.column(KMinValues(
      GraftShim.expression(values), k).toAggregateExpression())
}
