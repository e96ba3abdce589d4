package graft.plans

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.{GraftColumnBridge => CB}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** MinHash UNION sketch as a custom aggregate function: the signature
  * of the SET of input strings (each string = one element, md5-hashed —
  * so a group's sketch is bit-exactly reproducible in the DuckDB
  * oracle via `('0x' || substr(md5(x), 1, 8))::BIGINT` and the same
  * Carter-Wegman constants).
  *
  * The buffer is the k running minima; `update` folds a row's element
  * hash in directly, `merge` is elementwise min. Elementwise min is
  * associative and commutative, so Spark runs this with map-side
  * partial aggregation like any built-in aggregate — at 100 TB a
  * per-domain text-profile sketch costs one shuffle of k longs per
  * (domain, partition), never the text. Two groups' sketches estimate
  * the Jaccard similarity of their shingle sets by position agreement —
  * the mergeable-sketch counterpart of q30's per-document signatures.
  *
  * Reference analogue: per-domain aggregation in the linkdb store
  * (storelinks groups by domain), upgraded from counts to a sketch.
  */
case class MinHashAgg(
    child: Expression,
    numHashes: Int = 48,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  override def prettyName: String = "minhash_agg"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(numHashes)(Long.MaxValue)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val sig = Signatures.elementMinhash(v.asInstanceOf[UTF8String], numHashes)
      var i = 0
      while (i < numHashes) {
        if (sig(i) < buffer(i)) buffer(i) = sig(i)
        i += 1
      }
    }
    buffer
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < numHashes) {
      if (b2(i) < b1(i)) b1(i) = b2(i)
      i += 1
    }
    b1
  }

  override def eval(buffer: Array[Long]): Any = new GenericArrayData(buffer)

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * numHashes)
    buffer.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(numHashes)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MinHashAgg =
    copy(child = newChild)
}

object MinHashAgg {
  def of(c: Column, k: Int = 48): Column =
    CB.column(MinHashAgg(CB.expression(c), k).toAggregateExpression())
}
