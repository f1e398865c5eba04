package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, GraftShim}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k state: the k best (score DESC, id ASC) pairs seen so
  * far, kept in a worst-first binary heap so insertion beyond capacity
  * is an O(log k) replace-head. ~Constant size (k entries) regardless
  * of input cardinality — this bound IS the aggregate's scale story:
  * partial buffers, shuffle rows, and merge work are all ≤ k per
  * (group × partition).
  */
final class TopKBuffer {
  import TopKBuffer.worstFirst
  val heap: scala.collection.mutable.PriorityQueue[(Double, Long)] =
    scala.collection.mutable.PriorityQueue.empty(worstFirst)

  def offer(score: Double, id: Long, k: Int): Unit =
    if (heap.size < k) heap.enqueue((score, id))
    else if (worstFirst.lt((score, id), heap.head)) {
      heap.dequeue(); heap.enqueue((score, id))
    }

  def absorb(other: TopKBuffer, k: Int): Unit =
    other.heap.foreach { case (s, i) => offer(s, i, k) }

  /** Entries best-first: score DESC, id ASC (ascending under the
    * (-score, id) key — total and deterministic for unique ids). */
  def sortedBestFirst: Array[(Double, Long)] = heap.toArray.sorted(worstFirst)
}

object TopKBuffer {
  /** Max-heap priority = "worst kept row": lowest score, then highest
    * id, dequeues first. The same key sorted ascending is best-first. */
  val worstFirst: Ordering[(Double, Long)] =
    Ordering.by { case (s, id) => (-s, id) }
}

/** Native bounded top-k aggregate: per group, the k best (score DESC,
  * id ASC) rows as `array<struct<vec_id, cosine>>`.
  *
  * This is the scale-safe tail of every ANN variant. The naive tails
  * both fail at 100 TB: `row_number() OVER (PARTITION BY q_id)` ships
  * EVERY scored row to one reducer per query, and a plain
  * `collect_list` holds the whole group in its partial buffer (partial
  * collect does not reduce — the shuffle still carries every row).
  * Here the PARTIAL state is the bounded heap itself, so map-side
  * combine caps both memory and shuffle at k entries per query per
  * input partition, and the final merge is a k-way heap absorb.
  *
  * A TypedImperativeAggregate (executed by ObjectHashAggregate) rather
  * than a typed `mapPartitions` heap: input rows are read directly
  * from unsafe format via `eval` — no Dataset encoder boundary, no
  * per-row Scala tuple materialization in the scoring hot path.
  */
case class TopKByScore(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] {

  require(k > 0, s"topk_by_score needs k > 0, got $k")

  override def children: Seq[Expression] = Seq(score, id)
  override def nullable: Boolean = false
  override def prettyName: String = "topk_by_score"

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("vec_id", LongType, nullable = false),
      StructField("cosine", DoubleType, nullable = false))),
    containsNull = false)

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer

  override def update(buffer: TopKBuffer, input: InternalRow): TopKBuffer = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null)
      buffer.offer(s.asInstanceOf[Double], i.asInstanceOf[Long], k)
    buffer
  }

  override def merge(buffer: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    buffer.absorb(other, k)
    buffer
  }

  override def eval(buffer: TopKBuffer): Any =
    new GenericArrayData(buffer.sortedBestFirst.map { case (s, i) =>
      new GenericInternalRow(Array[Any](i, s)): AnyRef
    })

  override def serialize(buffer: TopKBuffer): Array[Byte] = {
    val entries = buffer.sortedBestFirst
    val bb = ByteBuffer.allocate(4 + entries.length * 16)
    bb.putInt(entries.length)
    entries.foreach { case (s, i) => bb.putDouble(s); bb.putLong(i) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new TopKBuffer
    var j = 0
    while (j < n) { buf.offer(bb.getDouble, bb.getLong, k); j += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKByScore =
    copy(score = newChildren(0), id = newChildren(1))
}

/** Column builder for [[TopKByScore]]. */
object TopKAgg {
  def topK(score: Column, id: Column, k: Int): Column =
    GraftShim.column(TopKByScore(
      GraftShim.expression(score),
      GraftShim.expression(id), k).toAggregateExpression())
}
