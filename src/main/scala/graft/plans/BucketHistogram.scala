package graft.plans

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.{GraftColumnBridge => CB}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.TernaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, LongType}

/** Fixed-width weighted bucket histogram: sums `cnt` into slot `b` of
  * a `2 * buckets`-slot long array — slots [0, buckets) take every
  * row, slots [buckets, 2*buckets) only rows with `isTarget` — and
  * evaluates to the flat array.
  *
  * This exists so a bounded "model fit" (DSIR's per-bucket raw/target
  * feature counts — q76, CurationOps.dsirScores) can ride an
  * `observe()` on a job the query already runs (the oracle-dump
  * write), instead of paying a second scan of the aggregated frame
  * just to produce ≤`buckets` rows. The buffer is a plain long array:
  * O(1) update, O(buckets) merge, no per-key state — safe at any
  * scale because the width is a compile-time-style constant of the
  * operator, not a function of the data.
  */
case class BucketHistogram(
    bucket: Expression,
    cnt: Expression,
    isTarget: Expression,
    buckets: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with TernaryLike[Expression] {

  require(buckets > 0, s"buckets must be positive, got $buckets")

  override def first: Expression = bucket
  override def second: Expression = cnt
  override def third: Expression = isTarget

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (bucket.dataType == LongType && cnt.dataType == LongType &&
        isTarget.dataType == BooleanType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"bucket_histogram expects (LONG, LONG, BOOLEAN), got " +
        s"(${bucket.dataType}, ${cnt.dataType}, ${isTarget.dataType})")

  override def prettyName: String = "bucket_histogram"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Array[Long] = new Array[Long](2 * buckets)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val bv = bucket.eval(input)
    val cv = cnt.eval(input)
    if (bv != null && cv != null) {
      val b = bv.asInstanceOf[Long].toInt
      require(b >= 0 && b < buckets, s"bucket $b outside [0, $buckets)")
      val c = cv.asInstanceOf[Long]
      buf(b) += c
      val tv = isTarget.eval(input)
      if (tv != null && tv.asInstanceOf[Boolean]) buf(buckets + b) += c
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < b1.length) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any =
    new GenericArrayData(buf.map(x => x: Any))

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buf.length)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BucketHistogram =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BucketHistogram =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): BucketHistogram =
    copy(bucket = newFirst, cnt = newSecond, isTarget = newThird)
}

object BucketHistogram {
  /** `bucket_histogram(b, cnt, is_target)` over `buckets` slots. */
  def of(b: Column, cnt: Column, isTarget: Column, buckets: Int): Column =
    CB.column(BucketHistogram(
      CB.expression(b), CB.expression(cnt), CB.expression(isTarget), buckets)
      .toAggregateExpression())
}
