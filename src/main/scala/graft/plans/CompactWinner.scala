package graft.plans

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.{GraftColumnBridge => CB}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{DataType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** The compaction winner state (cmd/importer/main.go:567-609) as ONE
  * hash-compatible aggregate.
  *
  * The declarative spelling — `max_by(ip, lineKey)` plus three
  * `min_by(col, variantKey)` — keeps string state in the aggregation
  * buffer, which `HashAggregateExec` cannot hold in its UnsafeRow map,
  * so Catalyst lowers the whole compaction to SortAggregate: BOTH the
  * partial and the final aggregate sort every partition of the raw
  * link stream on the 5-column string key, and the concat ordering
  * keys are rebuilt per comparison. At import scale that per-partition
  * O(n log n) on the widest stream in the system is the dominant
  * avoidable cost.
  *
  * This TypedImperativeAggregate computes all four winner columns in
  * one pass — `ip` of the max full-line key, page path/query/scheme of
  * the min shortest-variant key — holding six small strings per group.
  * Its presence flips the aggregate to ObjectHashAggregateExec
  * (hash-based, arbitrary buffer objects), which also evaluates the
  * sibling declarative min/max/sum aggregates hash-side; the plan
  * becomes partial ObjectHashAggregate → single Exchange → final
  * ObjectHashAggregate with no Sort anywhere. Each ordering key is
  * built exactly once per input row, byte-compatible with the SQL
  * spelling the DuckDB oracle still runs:
  *
  *   variantKey = lpad(len(path),4,'0') || lpad(len(query),4,'0')
  *                || path || '|' || query          (min wins)
  *   lineKey    = concat_ws('|', path, query, text, date_from, ip)
  *                                                 (max wins)
  *
  * Comparisons are UTF8String binary order — identical to Spark's and
  * DuckDB's string comparison on this all-ASCII schema, so the q17
  * oracle stays hash-green.
  *
  * Children: (page_path, page_rawquery, page_scheme, link_text,
  * date_from, ip). Output: struct(ip, page_path, page_rawquery,
  * page_scheme).
  */
case class CompactWinner(
    children: Seq[Expression],
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CompactWinner.Buffer] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.length == 6 && children.forall(_.dataType == StringType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"compact_winner expects 6 STRING children, got ${children.map(_.dataType)}")

  override def prettyName: String = "compact_winner"
  override def nullable: Boolean = true
  override def dataType: DataType = CompactWinner.OutType

  override def createAggregationBuffer(): CompactWinner.Buffer =
    new CompactWinner.Buffer

  override def update(b: CompactWinner.Buffer, input: InternalRow): CompactWinner.Buffer = {
    val path = children(0).eval(input).asInstanceOf[UTF8String]
    val query = children(1).eval(input).asInstanceOf[UTF8String]
    val scheme = children(2).eval(input).asInstanceOf[UTF8String]
    val text = children(3).eval(input).asInstanceOf[UTF8String]
    val date = children(4).eval(input).asInstanceOf[UTF8String]
    val ip = children(5).eval(input).asInstanceOf[UTF8String]

    // variant winner: concat() is null if any component is — min_by
    // skips null ordering keys, so only non-null (path, query) compete
    if (path != null && query != null) {
      val vKey = UTF8String.concat(
        CompactWinner.pad4(path.numChars()), CompactWinner.pad4(query.numChars()),
        path, CompactWinner.Pipe, query)
      if (b.vKey == null || vKey.compareTo(b.vKey) < 0) {
        b.vKey = vKey // concat output owns its bytes
        b.vPath = CompactWinner.owned(path)
        b.vQuery = CompactWinner.owned(query)
        b.vScheme = CompactWinner.owned(scheme)
      }
    }

    // line winner: concat_ws skips nulls entirely, so the key is never
    // null and every row competes
    val lKey = CompactWinner.concatWsPipe(path, query, text, date, ip)
    if (b.lKey == null || lKey.compareTo(b.lKey) > 0) {
      b.lKey = lKey
      b.lIp = CompactWinner.owned(ip)
    }
    b
  }

  override def merge(b1: CompactWinner.Buffer, b2: CompactWinner.Buffer): CompactWinner.Buffer = {
    if (b2.vKey != null && (b1.vKey == null || b2.vKey.compareTo(b1.vKey) < 0)) {
      b1.vKey = b2.vKey; b1.vPath = b2.vPath; b1.vQuery = b2.vQuery; b1.vScheme = b2.vScheme
    }
    if (b2.lKey != null && (b1.lKey == null || b2.lKey.compareTo(b1.lKey) > 0)) {
      b1.lKey = b2.lKey; b1.lIp = b2.lIp
    }
    b1
  }

  override def eval(b: CompactWinner.Buffer): Any =
    new GenericInternalRow(Array[Any](b.lIp, b.vPath, b.vQuery, b.vScheme))

  override def serialize(b: CompactWinner.Buffer): Array[Byte] = {
    val parts = Array(b.vKey, b.vPath, b.vQuery, b.vScheme, b.lKey, b.lIp)
    var n = 0
    val bytes = parts.map { s =>
      if (s == null) null else { val x = s.getBytes; n += x.length; x }
    }
    val bb = ByteBuffer.allocate(4 * parts.length + n)
    bytes.foreach { x =>
      if (x == null) bb.putInt(-1) else { bb.putInt(x.length); bb.put(x) }
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): CompactWinner.Buffer = {
    val bb = ByteBuffer.wrap(bytes)
    def str(): UTF8String = {
      val len = bb.getInt
      if (len < 0) null
      else { val x = new Array[Byte](len); bb.get(x); UTF8String.fromBytes(x) }
    }
    val b = new CompactWinner.Buffer
    b.vKey = str(); b.vPath = str(); b.vQuery = str(); b.vScheme = str()
    b.lKey = str(); b.lIp = str()
    b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CompactWinner =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CompactWinner =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CompactWinner =
    copy(children = newChildren)
}

object CompactWinner {

  /** Mutable winner state: (ordering key, payload) for each of the two
    * independent competitions. Null keys = no contender yet.
    */
  final class Buffer {
    var vKey: UTF8String = null
    var vPath: UTF8String = null
    var vQuery: UTF8String = null
    var vScheme: UTF8String = null
    var lKey: UTF8String = null
    var lIp: UTF8String = null
  }

  val OutType: StructType = StructType(Seq(
    StructField("ip", StringType),
    StructField("page_path", StringType),
    StructField("page_rawquery", StringType),
    StructField("page_scheme", StringType)))

  private val Pipe = UTF8String.fromString("|")

  /** lpad(cast(n as string), 4, '0') — Spark/DuckDB lpad both keep the
    * FIRST 4 chars when the input is longer. Cached for the common
    * range so key building allocates nothing for the pads.
    */
  private val padCache: Array[UTF8String] =
    Array.tabulate(10000)(n => UTF8String.fromString(f"$n%04d"))
  private def pad4(n: Int): UTF8String =
    if (n < 10000) padCache(n) else UTF8String.fromString(n.toString.substring(0, 4))

  /** concat_ws('|', ...): null components are skipped WITH their
    * separator; never returns null.
    */
  private def concatWsPipe(parts: UTF8String*): UTF8String = {
    val present = parts.filter(_ != null)
    if (present.isEmpty) UTF8String.EMPTY_UTF8
    else UTF8String.concatWs(Pipe, present: _*)
  }

  /** eval() may return a UTF8String aliasing a reused scan buffer —
    * copy before the buffer holds it across rows.
    */
  private def owned(s: UTF8String): UTF8String = if (s == null) null else s.clone()

  /** struct(ip, page_path, page_rawquery, page_scheme) of the merge
    * winners — see class doc for key semantics.
    */
  def of(pagePath: Column, pageRawquery: Column, pageScheme: Column,
      linkText: Column, dateFrom: Column, ip: Column): Column =
    CB.column(CompactWinner(
      Seq(pagePath, pageRawquery, pageScheme, linkText, dateFrom, ip)
        .map(CB.expression)).toAggregateExpression())
}
