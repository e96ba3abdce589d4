package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.{GraftColumnBridge => CB}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Product-quantization codec as codegen'd Catalyst expressions.
  *
  * Why expressions and not HOF lambdas: PQ encode runs once per CORPUS
  * row (normalize + m×k×sub multiply-adds) and ADC scoring once per
  * (candidate, probe) row — both corpus-wide hot paths. Spark
  * evaluates `transform`/`zip_with`/`aggregate` lambda bodies
  * interpreted, row by row; same rationale as `MinHashSig`
  * (Signatures.scala). Fully unrolling into scalar SQL arithmetic
  * keeps codegen but explodes the expression tree (thousands of nodes
  * → minutes of analysis/janino time, measured); a single static call
  * with the codebook as a reference object is both.
  *
  * The codebook rides the expression as a plan-embedded object
  * (`ctx.addReferenceObj`), exactly like literal centroids — shipped
  * once per executor with the serialized plan, not per row.
  */
object PqCodes {

  /** argmax over sub-centroids of `⟨x/|x|, c⟩ − ‖c‖²/2` per subspace
    * (≡ argmin L2 to the normalized sub-vector; ties → lowest code).
    * One pass computes the norm; the scan never allocates beyond the
    * code array.
    */
  def encode(emb: ArrayData, books: Array[Double], biases: Array[Double],
      m: Int, k: Int, sub: Int): ArrayData = {
    val n = emb.numElements()
    var ss = 0.0
    var i = 0
    while (i < n) { val v = emb.getFloat(i).toDouble; ss += v * v; i += 1 }
    val inv = 1.0 / math.max(math.sqrt(ss), 1e-30)
    val codes = new Array[Int](m)
    var mi = 0
    while (mi < m) {
      var best = 0
      var bs = Double.NegativeInfinity
      var c = 0
      while (c < k) {
        val boff = (mi * k + c) * sub
        var dot = 0.0
        var j = 0
        while (j < sub) {
          dot += emb.getFloat(mi * sub + j) * inv * books(boff + j)
          j += 1
        }
        val s = dot - biases(mi * k + c)
        if (s > bs) { bs = s; best = c }
        c += 1
      }
      codes(mi) = best
      mi += 1
    }
    new GenericArrayData(codes)
  }

  /** Query-side ADC lookup table: lut[mi*k + c] = ⟨x/|x| sub-vector
    * mi, books[mi][c]⟩, flat m×k doubles. Replaces the HOF-lambda
    * spelling that recomputed the full normalization INSIDE each of
    * the m×k inner aggregates after CollapseProject inlined it (the
    * r12 finding: ~15 s of interpreted lambda steps per BROADCAST
    * BUILD once the corpus-scaled index probes 144 cells — paid on
    * every query execution because broadcasts aren't shared across
    * plans). Arithmetic ORDER clones the HOF spelling exactly
    * (element-wise divide by max(norm, 1e-30), then a left-fold dot),
    * so the ADC scores — and therefore the dumped shortlist the
    * oracle re-ranks — are bit-identical.
    */
  def lut(emb: ArrayData, books: Array[Double], m: Int, k: Int, sub: Int): ArrayData = {
    val n = emb.numElements()
    var ss = 0.0
    var i = 0
    while (i < n) { val v = emb.getFloat(i).toDouble; ss += v * v; i += 1 }
    val denom = math.max(math.sqrt(ss), 1e-30)
    val out = new Array[Double](m * k)
    var mi = 0
    while (mi < m) {
      var c = 0
      while (c < k) {
        val boff = (mi * k + c) * sub
        var dot = 0.0
        var j = 0
        while (j < sub) {
          dot += (emb.getFloat(mi * sub + j).toDouble / denom) * books(boff + j)
          j += 1
        }
        out(mi * k + c) = dot
        c += 1
      }
      mi += 1
    }
    new GenericArrayData(out)
  }

  /** Asymmetric-distance score: Σ_m lut[m*k + codes[m]]. */
  def adc(lut: ArrayData, codes: ArrayData, k: Int): Double = {
    val m = codes.numElements()
    var s = 0.0
    var mi = 0
    while (mi < m) { s += lut.getDouble(mi * k + codes.getInt(mi)); mi += 1 }
    s
  }
}

/** `pq_encode(embedding)` → array<int> of [[m]] sub-centroid codes. */
case class PqEncode(child: Expression, books: Array[Double],
    biases: Array[Double], m: Int, k: Int, sub: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_encode"

  override protected def nullSafeEval(input: Any): Any =
    PqCodes.encode(input.asInstanceOf[ArrayData], books, biases, m, k, sub)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val booksRef = ctx.addReferenceObj("pqBooks", books, "double[]")
    val biasesRef = ctx.addReferenceObj("pqBiases", biases, "double[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.plans.PqCodes.encode($c, $booksRef, $biasesRef, $m, $k, $sub)")
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}

object PqEncode {
  /** `books` indexed [m][k][sub]; flattened row-major into the plan. */
  def of(c: Column, books: Seq[Seq[Seq[Double]]]): Column = {
    val m = books.length
    val k = books.head.length
    val sub = books.head.head.length
    val flat = books.flatten.flatten.toArray
    val biases = books.flatten.map(cent => cent.map(x => x * x).sum / 2).toArray
    CB.column(PqEncode(CB.expression(c), flat, biases, m, k, sub))
  }
}

/** `pq_adc(lut, codes)` → double approximate similarity. */
case class PqAdc(left: Expression, right: Expression, k: Int)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_adc"

  override protected def nullSafeEval(lut: Any, codes: Any): Any =
    PqCodes.adc(lut.asInstanceOf[ArrayData], codes.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (l, c) => s"graft.plans.PqCodes.adc($l, $c, $k)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdc =
    copy(left = newLeft, right = newRight)
}

object PqAdc {
  def of(lut: Column, codes: Column, k: Int): Column =
    CB.column(PqAdc(CB.expression(lut), CB.expression(codes), k))
}

/** `pq_lut(q_emb)` → array<double> of m×k query-side ADC lookups —
  * see [[PqCodes.lut]] for the bit-identity contract with the HOF
  * spelling it replaced.
  */
case class PqLut(child: Expression, books: Array[Double],
    m: Int, k: Int, sub: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "pq_lut"

  override protected def nullSafeEval(input: Any): Any =
    PqCodes.lut(input.asInstanceOf[ArrayData], books, m, k, sub)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val booksRef = ctx.addReferenceObj("pqBooks", books, "double[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.plans.PqCodes.lut($c, $booksRef, $m, $k, $sub)")
  }

  override protected def withNewChildInternal(newChild: Expression): PqLut =
    copy(child = newChild)
}

object PqLut {
  /** `books` indexed [m][k][sub]; flattened row-major into the plan. */
  def of(c: Column, books: Seq[Seq[Seq[Double]]]): Column = {
    val m = books.length
    val k = books.head.length
    val sub = books.head.head.length
    CB.column(PqLut(CB.expression(c), books.flatten.flatten.toArray, m, k, sub))
  }
}
