package graft.plans

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.{GraftColumnBridge => CB}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct-collect with a HARD per-key memory bound: keeps at most
  * `maxSize` distinct elements; the moment a key exceeds it, the
  * buffer FLIPS TO AN EMPTY TOMBSTONE and the key evaluates to NULL.
  *
  * This is the memory-safe spelling of the hot-bucket guard used by
  * every LSH/bucket candidate generator (q30/q31/q34/q41/q66):
  * `collect_list(...)` + `filter(size <= cap)` applies the cap only
  * AFTER one task has materialized the whole array — at 100 TB a
  * degenerate key (the band hash of near-empty docs, a boilerplate
  * window shared by millions of pages) builds a multi-million-element
  * buffer and OOMs the very executor the cap was meant to protect.
  * Here the buffer can never hold more than `maxSize + 1` elements no
  * matter how many rows a key receives, overflowed keys carry ZERO
  * payload through the shuffle, and the decision is exact:
  *
  *   - a partial buffer that overflows stays overflowed through
  *     `merge` (the flag is sticky), so the final verdict equals
  *     "distinct count > maxSize" even though no buffer ever saw all
  *     the elements;
  *   - below the cap every partial set is complete, so the merged set
  *     (and the sorted array it evaluates to) is exact.
  *
  * Output is SORTED ascending — callers feed it straight into ordered
  * a<b pair expansion without a `sort_array`. Dedup happens inside the
  * aggregate (map-side too), so callers that previously needed a
  * `.distinct()` before the groupBy get it for free without the extra
  * exchange. One-pass alternative to the pre-count + broadcast
  * anti-join (q60's shape, SimilarityOps.deltaDedupPairs): same
  * bounded-memory guarantee without scanning / shuffling the stream
  * twice, at the cost of shipping capped payloads instead of bare
  * counts for the below-cap keys — which the candidate generators need
  * to ship anyway.
  *
  * Supports LONG and STRING elements (doc ids / domains — the two key
  * types the bucket family groups on).
  */
case class BoundedCollectSet(
    child: Expression,
    maxSize: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BoundedCollectSet.Buffer]
  with UnaryLike[Expression] {

  require(maxSize > 0, s"maxSize must be positive, got $maxSize")
  // deferred: the child is unresolved at construction time
  private def isLong = child.dataType == LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == LongType || child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"bounded_collect_set supports LONG and STRING, got ${child.dataType}")

  override def prettyName: String = "bounded_collect_set"
  override def dataType: DataType = ArrayType(child.dataType, containsNull = false)
  override def nullable: Boolean = true

  override def createAggregationBuffer(): BoundedCollectSet.Buffer =
    new BoundedCollectSet.Buffer

  override def update(b: BoundedCollectSet.Buffer, input: InternalRow): BoundedCollectSet.Buffer = {
    if (!b.overflowed) {
      val v = child.eval(input)
      if (v != null) {
        // UTF8String from eval may alias a reused scan buffer — copy
        val owned: AnyRef = v match {
          case s: UTF8String => s.clone()
          case other => other.asInstanceOf[AnyRef]
        }
        b.values.add(owned)
        if (b.values.size > maxSize) b.spill()
      }
    }
    b
  }

  override def merge(b1: BoundedCollectSet.Buffer, b2: BoundedCollectSet.Buffer): BoundedCollectSet.Buffer = {
    if (b1.overflowed || b2.overflowed) { b1.spill(); b1 }
    else {
      val it = b2.values.iterator()
      while (it.hasNext && !b1.overflowed) {
        b1.values.add(it.next())
        if (b1.values.size > maxSize) b1.spill()
      }
      b1
    }
  }

  override def eval(b: BoundedCollectSet.Buffer): Any = {
    if (b.overflowed) null
    else {
      val arr = b.values.toArray
      if (isLong) java.util.Arrays.sort(arr.asInstanceOf[Array[AnyRef]],
        (x: AnyRef, y: AnyRef) =>
          java.lang.Long.compare(x.asInstanceOf[Long], y.asInstanceOf[Long]))
      else java.util.Arrays.sort(arr.asInstanceOf[Array[AnyRef]],
        (x: AnyRef, y: AnyRef) =>
          x.asInstanceOf[UTF8String].compareTo(y.asInstanceOf[UTF8String]))
      new GenericArrayData(arr.asInstanceOf[Array[Any]])
    }
  }

  override def serialize(b: BoundedCollectSet.Buffer): Array[Byte] = {
    if (b.overflowed) Array[Byte](1)
    else if (isLong) {
      val bb = ByteBuffer.allocate(1 + 4 + 8 * b.values.size)
      bb.put(0: Byte).putInt(b.values.size)
      val it = b.values.iterator()
      while (it.hasNext) bb.putLong(it.next().asInstanceOf[Long])
      bb.array()
    } else {
      val strs = new java.util.ArrayList[Array[Byte]](b.values.size)
      var n = 0
      val it = b.values.iterator()
      while (it.hasNext) {
        val bytes = it.next().asInstanceOf[UTF8String].getBytes
        strs.add(bytes); n += 4 + bytes.length
      }
      val bb = ByteBuffer.allocate(1 + 4 + n)
      bb.put(0: Byte).putInt(strs.size())
      strs.forEach { s => bb.putInt(s.length).put(s) }
      bb.array()
    }
  }

  override def deserialize(bytes: Array[Byte]): BoundedCollectSet.Buffer = {
    val b = new BoundedCollectSet.Buffer
    val bb = ByteBuffer.wrap(bytes)
    if (bb.get() != 0) b.spill()
    else {
      val n = bb.getInt
      var i = 0
      while (i < n) {
        if (isLong) b.values.add(java.lang.Long.valueOf(bb.getLong))
        else {
          val len = bb.getInt
          val s = new Array[Byte](len)
          bb.get(s)
          b.values.add(UTF8String.fromBytes(s))
        }
        i += 1
      }
    }
    b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedCollectSet =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedCollectSet =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BoundedCollectSet =
    copy(child = newChild)
}

object BoundedCollectSet {

  /** Mutable distinct buffer: sticky overflow flag + the set (cleared
    * on overflow so a hot key ships one flag byte, never payload).
    */
  final class Buffer {
    var overflowed: Boolean = false
    val values = new java.util.HashSet[AnyRef]()
    def spill(): Unit = { overflowed = true; values.clear() }
  }

  /** `bounded_collect_set(c) FILTER (size <= maxSize)`, null when over. */
  def of(c: Column, maxSize: Int): Column =
    CB.column(BoundedCollectSet(CB.expression(c), maxSize).toAggregateExpression())
}
