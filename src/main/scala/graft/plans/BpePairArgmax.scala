package graft.plans

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.{GraftColumnBridge => CB}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The BPE fit's per-merge ARGMAX as one mergeable aggregate (r20,
  * guide §2.3 "aggregate before you shuffle" taken to its limit): for
  * each word row (syms array, cnt), fold every adjacent symbol pair
  * into a pair→count map; merge maps across partitions; eval returns
  * the single best pair under the fit's exact tie-break — count DESC,
  * then left, then right symbol in UTF8 BINARY order (the same order
  * `orderBy(c.desc, l.asc, r.asc)` used, so the selected merge sequence
  * is bit-identical to the explode+groupBy+head spelling, which
  * TokenizerSpec pins against a driver-side reference BPE).
  *
  * Why an aggregate instead of the explode → groupBy → TakeOrdered
  * plan: inside `observe()` it computes as an ACCUMULATOR on the side
  * of whatever action materializes the merged vocab — per merge round
  * that deletes the (pair, count) exchange and the whole dedicated
  * argmax action (2 AQE stage-jobs at the bench SFs). The buffer is
  * bounded by the DISTINCT adjacent pairs of the vocab frame — the
  * vocab is Heaps'-law sublinear in corpus size and its frame is
  * AQE-coalesced to a handful of partitions, so the per-task maps the
  * driver merges stay index-sized (alphabet²-ish early, ≤ distinct
  * adjacent positions later), never corpus-sized.
  */
case class BpePairArgmax(
    left: Expression,
    right: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.HashMap[(UTF8String, UTF8String), java.lang.Long]]
  with BinaryLike[Expression] {

  private type Buf = java.util.HashMap[(UTF8String, UTF8String), java.lang.Long]

  override def prettyName: String = "bpe_pair_argmax"
  override def nullable: Boolean = true
  override def dataType: DataType = StructType(Seq(
    StructField("l", StringType), StructField("r", StringType),
    StructField("c", LongType)))

  override def createAggregationBuffer(): Buf = new Buf()

  override def update(buf: Buf, input: InternalRow): Buf = {
    val arr = left.eval(input)
    val cnt = right.eval(input)
    if (arr != null && cnt != null) {
      val a = arr.asInstanceOf[ArrayData]
      val c = cnt.asInstanceOf[Long]
      val n = a.numElements()
      var i = 0
      var prev: UTF8String = if (n > 0) a.getUTF8String(0) else null
      while (i < n - 1) {
        val next = a.getUTF8String(i + 1)
        val key = (prev, next)
        val old = buf.get(key)
        if (old == null)
          // getUTF8String can be a VIEW over a reused row buffer —
          // clone on first insert; on hit the map keeps its own key
          buf.put((prev.clone(), next.clone()), java.lang.Long.valueOf(c))
        else buf.put(key, java.lang.Long.valueOf(old.longValue() + c))
        prev = next
        i += 1
      }
    }
    buf
  }

  override def merge(b1: Buf, b2: Buf): Buf = {
    val it = b2.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val old = b1.get(e.getKey)
      b1.put(e.getKey,
        if (old == null) e.getValue
        else java.lang.Long.valueOf(old.longValue() + e.getValue.longValue()))
    }
    b1
  }

  override def eval(buf: Buf): Any =
    if (buf.isEmpty) null
    else {
      var bl: UTF8String = null
      var br: UTF8String = null
      var bc = 0L
      val it = buf.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val (l, r) = e.getKey
        val c = e.getValue.longValue()
        val better =
          if (bl == null) true
          else if (c != bc) c > bc
          else {
            val cl = l.compareTo(bl)
            if (cl != 0) cl < 0 else r.compareTo(br) < 0
          }
        if (better) { bl = l; br = r; bc = c }
      }
      new GenericInternalRow(Array[Any](bl, br, bc))
    }

  override def serialize(buf: Buf): Array[Byte] = {
    var bytes = 4
    val it0 = buf.entrySet().iterator()
    while (it0.hasNext) {
      val e = it0.next()
      bytes += 4 + e.getKey._1.numBytes() + 4 + e.getKey._2.numBytes() + 8
    }
    val bb = ByteBuffer.allocate(bytes)
    bb.putInt(buf.size())
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val l = e.getKey._1.getBytes
      val r = e.getKey._2.getBytes
      bb.putInt(l.length); bb.put(l)
      bb.putInt(r.length); bb.put(r)
      bb.putLong(e.getValue.longValue())
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new Buf()
    var i = 0
    while (i < n) {
      val l = new Array[Byte](bb.getInt); bb.get(l)
      val r = new Array[Byte](bb.getInt); bb.get(r)
      buf.put((UTF8String.fromBytes(l), UTF8String.fromBytes(r)),
        java.lang.Long.valueOf(bb.getLong))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BpePairArgmax =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BpePairArgmax =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BpePairArgmax =
    copy(left = newLeft, right = newRight)
}

object BpePairArgmax {
  def of(syms: Column, cnt: Column): Column =
    CB.column(BpePairArgmax(CB.expression(syms), CB.expression(cnt))
      .toAggregateExpression())
}
