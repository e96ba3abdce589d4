package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.{GraftColumnBridge => CB}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Dense-vector primitives as codegen'd Catalyst expressions — the
  * PqCodes rationale applied to the remaining embedding hot paths:
  * Spark evaluates `aggregate`/`zip_with`/`transform` lambda bodies
  * INTERPRETED, row by row, so a 64-dim dot product spelled as a HOF
  * costs ~200 interpreted expression-tree steps where a static call
  * inside WholeStageCodegen costs one virtual call + a tight loop
  * (measured on q34: the hyperplane-bit HOFs alone were ~370M
  * interpreted steps at sf10).
  *
  * EVERY method reproduces the exact double-arithmetic ORDER of the
  * HOF spelling it replaces (left-to-right fold, float→double per
  * element, dot / (√Σa² · √Σb²)) — the quantized-cosine oracles
  * (q32/q34/q40/q73 verify companions) hash floor(cos·1e9) against
  * DuckDB, so a re-associated sum would flip gates. The driver-gate
  * run after the swap is the proof the substitution is bit-exact.
  */
object VectorOps {

  /** Σ aᵢ·bᵢ / (√Σaᵢ² · √Σbᵢ²), all folds left-to-right. */
  def cosine(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    var dot = 0.0
    var i = 0
    while (i < n) { dot += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1 }
    var na = 0.0
    i = 0
    while (i < n) { val v = a.getFloat(i).toDouble; na += v * v; i += 1 }
    var nb = 0.0
    i = 0
    while (i < n) { val v = b.getFloat(i).toDouble; nb += v * v; i += 1 }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Σ aᵢ·bᵢ (left-to-right — the `aggregate(zip_with(...))` fold
    * order, bit-identical to the HOF spelling it replaces).
    */
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    var s = 0.0
    var i = 0
    while (i < n) { s += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1 }
    s
  }

  /** √Σ xᵢ² (left-to-right). */
  def norm(a: ArrayData): Double = {
    val n = a.numElements()
    var s = 0.0
    var i = 0
    while (i < n) { val v = a.getFloat(i).toDouble; s += v * v; i += 1 }
    math.sqrt(s)
  }

  /** Per-band LSH bucket ids: band b's bucket folds its planes'
    * sign bits MSB-first (`acc*2 + bit`, bit = 1 iff dot > 0) —
    * byte-for-byte the bits→slice→fold HOF chain it replaces.
    * `planes` is flattened [band*planesPerBand + j][dim] row-major.
    */
  def hyperplaneBuckets(emb: ArrayData, planes: Array[Double],
      bands: Int, planesPerBand: Int, dim: Int): ArrayData = {
    // loud on contract violation: unsafe ArrayData reads past the end
    // would return garbage bits, not throw
    require(emb.numElements() == dim,
      s"embedding dim ${emb.numElements()} != $dim")
    val out = new Array[Int](bands)
    var b = 0
    while (b < bands) {
      var bucket = 0
      var j = 0
      while (j < planesPerBand) {
        val off = (b * planesPerBand + j) * dim
        var dot = 0.0
        var i = 0
        while (i < dim) { dot += emb.getFloat(i).toDouble * planes(off + i); i += 1 }
        bucket = bucket * 2 + (if (dot > 0) 1 else 0)
        j += 1
      }
      out(b) = bucket
      b += 1
    }
    new GenericArrayData(out)
  }

  /** Nearest IVF cell: argmax over cells of ⟨emb, c⟩/‖c‖, ties → the
    * LOWEST cell id — identical to the array_max-over-struct(s, -i, i)
    * HOF spelling (strict `>` keeps the earliest argmax).
    * `cents` flattened [cell][dim] row-major; `cnorms(cell)` = ‖c‖.
    */
  def nearestCell(emb: ArrayData, cents: Array[Double],
      cnorms: Array[Double], dim: Int): Int = {
    require(emb.numElements() == dim,
      s"embedding dim ${emb.numElements()} != $dim")
    var best = 0
    var bs = Double.NegativeInfinity
    var c = 0
    while (c < cnorms.length) {
      var dot = 0.0
      var i = 0
      while (i < dim) { dot += emb.getFloat(i).toDouble * cents(c * dim + i); i += 1 }
      val s = dot / cnorms(c)
      if (s > bs) { bs = s; best = c }
      c += 1
    }
    best
  }

  /** Second level of the two-level IVF quantizer: within the already-
    * assigned coarse cell, argmax over that cell's FINE centroids (same
    * ⟨emb, c⟩/‖c‖ metric, same strict-> lowest-id tie rule), returned as
    * a GLOBAL fine-cell id (`offsets(cell) + j`). Row-local: the per-
    * coarse-cell centroid tables ride the plan as one reference object,
    * so assignment cost is O(|coarse| + occupancy/512) dots per row —
    * the flat argmax over k ∝ n cells would be O(n/512) dots per row,
    * ~2.7e13 FLOP corpus-wide at sf100.
    */
  def fineCell(emb: ArrayData, cell: Int, fineCents: Array[Array[Double]],
      fineNorms: Array[Array[Double]], offsets: Array[Int], dim: Int): Int = {
    val cents = fineCents(cell)
    val norms = fineNorms(cell)
    var best = 0
    var bs = Double.NegativeInfinity
    var c = 0
    while (c < norms.length) {
      var dot = 0.0
      var i = 0
      while (i < dim) { dot += emb.getFloat(i).toDouble * cents(c * dim + i); i += 1 }
      val s = dot / norms(c)
      if (s > bs) { bs = s; best = c }
      c += 1
    }
    offsets(cell) + best
  }

  /** Top-`m` cells by ⟨emb, c⟩/‖c‖ (the query-side probe set over the
    * GLOBAL fine-cell table), ordered by (score desc, id asc) — the
    * same total order as the struct(-score, id) array_sort HOF the
    * coarse regime uses. Scores all k cells (k·dim FLOP — row-local,
    * query-side only) then selection-sorts via one full argsort; k is
    * ≤ ~n/512 and this runs once per QUERY row, so the sort is noise.
    */
  def topCells(emb: ArrayData, cents: Array[Double], cnorms: Array[Double],
      m: Int, dim: Int): ArrayData = {
    require(emb.numElements() == dim,
      s"embedding dim ${emb.numElements()} != $dim")
    val k = cnorms.length
    val scores = new Array[Double](k)
    var c = 0
    while (c < k) {
      var dot = 0.0
      var i = 0
      while (i < dim) { dot += emb.getFloat(i).toDouble * cents(c * dim + i); i += 1 }
      scores(c) = dot / cnorms(c)
      c += 1
    }
    val idx = new Array[Integer](k)
    c = 0
    while (c < k) { idx(c) = Integer.valueOf(c); c += 1 }
    java.util.Arrays.sort(idx, (a: Integer, b: Integer) => {
      val d = java.lang.Double.compare(scores(b.intValue), scores(a.intValue))
      if (d != 0) d else Integer.compare(a.intValue, b.intValue)
    })
    val take = math.min(m, k)
    val out = new Array[Int](take)
    c = 0
    while (c < take) { out(c) = idx(c).intValue; c += 1 }
    new GenericArrayData(out)
  }
}

/** `cosine_sim(a, b)` → double. */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.plans.VectorOps.cosine($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}

object CosineSim {
  def of(a: Column, b: Column): Column =
    CB.column(CosineSim(CB.expression(a), CB.expression(b)))
}

/** `vec_dot(a, b)` → double — for pair frames that carry precomputed
  * per-row norms (SemDeDup): CosineSim would re-fold both norms per
  * PAIR, tripling the flops on a corpus-quadratic frame.
  */
case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.plans.VectorOps.dot($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)
}

object VecDot {
  def of(a: Column, b: Column): Column =
    CB.column(VecDot(CB.expression(a), CB.expression(b)))
}

/** `vec_norm(a)` → double. */
case class VecNorm(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_norm"
  override protected def nullSafeEval(a: Any): Any =
    VectorOps.norm(a.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.plans.VectorOps.norm($a)")
  override protected def withNewChildInternal(newChild: Expression): VecNorm =
    copy(child = newChild)
}

object VecNorm {
  def of(a: Column): Column = CB.column(VecNorm(CB.expression(a)))
}

/** `hyperplane_buckets(embedding)` → array<int> of band bucket ids. */
case class HyperplaneBuckets(child: Expression, planes: Array[Double],
    bands: Int, planesPerBand: Int, dim: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "hyperplane_buckets"
  override protected def nullSafeEval(a: Any): Any =
    VectorOps.hyperplaneBuckets(a.asInstanceOf[ArrayData], planes, bands,
      planesPerBand, dim)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("lshPlanes", planes, "double[]")
    defineCodeGen(ctx, ev, a =>
      s"graft.plans.VectorOps.hyperplaneBuckets($a, $ref, $bands, $planesPerBand, $dim)")
  }
  override protected def withNewChildInternal(newChild: Expression): HyperplaneBuckets =
    copy(child = newChild)
}

object HyperplaneBuckets {
  /** `planeRows` ordered band-major: row p serves band p/planesPerBand. */
  def of(c: Column, planeRows: Seq[Seq[Double]], bands: Int,
      planesPerBand: Int): Column = {
    require(planeRows.length == bands * planesPerBand,
      s"${planeRows.length} planes != $bands bands × $planesPerBand")
    val dim = planeRows.head.length
    CB.column(HyperplaneBuckets(CB.expression(c),
      planeRows.flatten.toArray, bands, planesPerBand, dim))
  }
}

/** `nearest_cell(embedding)` → int IVF cell id. */
case class NearestCell(child: Expression, cents: Array[Double],
    cnorms: Array[Double], dim: Int) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "nearest_cell"
  override protected def nullSafeEval(a: Any): Any =
    VectorOps.nearestCell(a.asInstanceOf[ArrayData], cents, cnorms, dim)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("ivfCents", cents, "double[]")
    val nRef = ctx.addReferenceObj("ivfNorms", cnorms, "double[]")
    defineCodeGen(ctx, ev, a =>
      s"graft.plans.VectorOps.nearestCell($a, $cRef, $nRef, $dim)")
  }
  override protected def withNewChildInternal(newChild: Expression): NearestCell =
    copy(child = newChild)
}

object NearestCell {
  def of(c: Column, cents: Seq[Seq[Double]], cnorms: Seq[Double]): Column = {
    require(cents.length == cnorms.length)
    CB.column(NearestCell(CB.expression(c), cents.flatten.toArray,
      cnorms.toArray, cents.head.length))
  }
}

/** `fine_cell(embedding, coarse_cell)` → int GLOBAL fine-cell id. */
case class FineCell(left: Expression, right: Expression,
    fineCents: Array[Array[Double]], fineNorms: Array[Array[Double]],
    offsets: Array[Int], dim: Int) extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "fine_cell"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.fineCell(a.asInstanceOf[ArrayData], b.asInstanceOf[Int],
      fineCents, fineNorms, offsets, dim)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("fineCents", fineCents, "double[][]")
    val nRef = ctx.addReferenceObj("fineNorms", fineNorms, "double[][]")
    val oRef = ctx.addReferenceObj("fineOffsets", offsets, "int[]")
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.plans.VectorOps.fineCell($a, $b, $cRef, $nRef, $oRef, $dim)")
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FineCell =
    copy(left = newLeft, right = newRight)
}

object FineCell {
  def of(emb: Column, cell: Column, fineCents: Array[Array[Double]],
      fineNorms: Array[Array[Double]], offsets: Array[Int], dim: Int): Column =
    CB.column(FineCell(CB.expression(emb), CB.expression(cell),
      fineCents, fineNorms, offsets, dim))
}

/** `top_cells(q_emb)` → array<int> of the m best global cell ids. */
case class TopCells(child: Expression, cents: Array[Double],
    cnorms: Array[Double], m: Int, dim: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "top_cells"
  override protected def nullSafeEval(a: Any): Any =
    VectorOps.topCells(a.asInstanceOf[ArrayData], cents, cnorms, m, dim)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("probeCents", cents, "double[]")
    val nRef = ctx.addReferenceObj("probeNorms", cnorms, "double[]")
    defineCodeGen(ctx, ev, a =>
      s"graft.plans.VectorOps.topCells($a, $cRef, $nRef, $m, $dim)")
  }
  override protected def withNewChildInternal(newChild: Expression): TopCells =
    copy(child = newChild)
}

object TopCells {
  def of(c: Column, cents: Array[Double], cnorms: Array[Double],
      m: Int, dim: Int): Column =
    CB.column(TopCells(CB.expression(c), cents, cnorms, m, dim))
}
