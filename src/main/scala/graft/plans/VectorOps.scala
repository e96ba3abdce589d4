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

/** One Broadcast per (JVM, table instance) — the index-table transport
  * for [[FineCell]]/[[TopCells]] (r19, "broadcast from the read"):
  * the fine centroid tables previously rode the plan as codegen
  * reference objects, i.e. were SERIALIZED WITH EVERY TASK BINARY —
  * ~2 MB per task at sf100 and O(n/512·dim) growth (~1 GB at 10⁹
  * vectors, where per-task shipping is a non-starter). A Broadcast
  * ships once per executor JVM and the task binary carries only the
  * handle. Identity-keyed because every table comes from a
  * dir-memoized fit (or the loaded `_ANN_INDEX` artifact), so plan
  * reconstruction reuses one broadcast instead of leaking a new one
  * per query.
  */
object BroadcastOnce {
  // fast path: same INSTANCE → same broadcast. WeakHashMap + array
  // reference-equality ⇒ identity keying that does not pin the arrays
  // (a dropped fit result lets its key entries collect).
  private val byId =
    new java.util.WeakHashMap[AnyRef, org.apache.spark.broadcast.Broadcast[_]]()
  // dedup path: same CONTENT → same broadcast. Callers build fresh
  // arrays per plan construction (`cents.flatten.toArray`), so without
  // a content key every query run would leak one broadcast. Bounded by
  // distinct table contents (≈ one per fitted corpus per JVM).
  private val byDigest =
    new java.util.HashMap[String, org.apache.spark.broadcast.Broadcast[_]]()
  // a Broadcast is only valid within the SparkContext that created it:
  // sequential sessions in one JVM (ClusterRehearsal's local[8] →
  // local-cluster legs, spec suites) would otherwise resolve a digest
  // to a handle of a STOPPED context and fail executor-side with
  // "Failed to get broadcast_N" — caught by the r19 rehearsal.
  private var ctxTag: String = null

  def of[T <: AnyRef](v: T): org.apache.spark.broadcast.Broadcast[T] =
    synchronized {
      val sc = org.apache.spark.sql.SparkSession.active.sparkContext
      val tag = s"${sc.applicationId}/${System.identityHashCode(sc)}"
      if (tag != ctxTag) { byId.clear(); byDigest.clear(); ctxTag = tag }
      val fast = byId.get(v)
      if (fast != null) fast.asInstanceOf[org.apache.spark.broadcast.Broadcast[T]]
      else {
        val key = digest(v)
        val bc = byDigest.get(key) match {
          case null =>
            val fresh = org.apache.spark.sql.SparkSession.active.sparkContext
              .broadcast(v)(scala.reflect.ClassTag[T](v.getClass))
            byDigest.put(key, fresh): Unit
            fresh
          case hit => hit
        }
        byId.put(v, bc): Unit
        bc.asInstanceOf[org.apache.spark.broadcast.Broadcast[T]]
      }
    }

  private def digest(v: AnyRef): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    def doubles(a: Array[Double]): Unit = {
      val bb = java.nio.ByteBuffer.allocate(a.length * 8)
      a.foreach(bb.putDouble(_): Unit)
      md.update(bb.array())
    }
    v match {
      case a: Array[Double] => md.update('d'.toByte); doubles(a)
      case a: Array[Int] =>
        md.update('i'.toByte)
        val bb = java.nio.ByteBuffer.allocate(a.length * 4)
        a.foreach(bb.putInt(_): Unit)
        md.update(bb.array())
      case a: Array[Array[Double]] =>
        md.update('D'.toByte)
        a.foreach { row => md.update(row.length.toByte); doubles(row) }
      case other =>
        // no structural key — fall back to identity (no cross-instance
        // dedup, but still one broadcast per instance via byId)
        md.update(System.identityHashCode(other).toString.getBytes)
    }
    md.digest().map(b => f"$b%02x").mkString
  }
}

/** `fine_cell(embedding, coarse_cell)` → int GLOBAL fine-cell id.
  * Centroid tables arrive via Broadcast ([[BroadcastOnce]]); codegen
  * unwraps the handle ONCE per task instance into a plain field, so
  * the per-row path reads an array field exactly as the literal
  * spelling did.
  */
case class FineCell(left: Expression, right: Expression,
    fineCents: org.apache.spark.broadcast.Broadcast[Array[Array[Double]]],
    fineNorms: org.apache.spark.broadcast.Broadcast[Array[Array[Double]]],
    offsets: org.apache.spark.broadcast.Broadcast[Array[Int]],
    dim: Int) extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "fine_cell"
  @transient private lazy val centsV = fineCents.value
  @transient private lazy val normsV = fineNorms.value
  @transient private lazy val offsetsV = offsets.value
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.fineCell(a.asInstanceOf[ArrayData], b.asInstanceOf[Int],
      centsV, normsV, offsetsV, dim)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcType = "org.apache.spark.broadcast.Broadcast"
    val cBc = ctx.addReferenceObj("fineCentsBc", fineCents, bcType)
    val nBc = ctx.addReferenceObj("fineNormsBc", fineNorms, bcType)
    val oBc = ctx.addReferenceObj("fineOffsetsBc", offsets, bcType)
    val cArr = ctx.addMutableState("double[][]", "fineCents",
      v => s"$v = (double[][]) $cBc.value();")
    val nArr = ctx.addMutableState("double[][]", "fineNorms",
      v => s"$v = (double[][]) $nBc.value();")
    val oArr = ctx.addMutableState("int[]", "fineOffsets",
      v => s"$v = (int[]) $oBc.value();")
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.plans.VectorOps.fineCell($a, $b, $cArr, $nArr, $oArr, $dim)")
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FineCell =
    copy(left = newLeft, right = newRight)
}

object FineCell {
  def of(emb: Column, cell: Column, fineCents: Array[Array[Double]],
      fineNorms: Array[Array[Double]], offsets: Array[Int], dim: Int): Column =
    CB.column(FineCell(CB.expression(emb), CB.expression(cell),
      BroadcastOnce.of(fineCents), BroadcastOnce.of(fineNorms),
      BroadcastOnce.of(offsets), dim))
}

/** `top_cells(q_emb)` → array<int> of the m best global cell ids.
  * Same Broadcast transport as [[FineCell]].
  */
case class TopCells(child: Expression,
    cents: org.apache.spark.broadcast.Broadcast[Array[Double]],
    cnorms: org.apache.spark.broadcast.Broadcast[Array[Double]],
    m: Int, dim: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "top_cells"
  @transient private lazy val centsV = cents.value
  @transient private lazy val cnormsV = cnorms.value
  override protected def nullSafeEval(a: Any): Any =
    VectorOps.topCells(a.asInstanceOf[ArrayData], centsV, cnormsV, m, dim)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcType = "org.apache.spark.broadcast.Broadcast"
    val cBc = ctx.addReferenceObj("probeCentsBc", cents, bcType)
    val nBc = ctx.addReferenceObj("probeNormsBc", cnorms, bcType)
    val cArr = ctx.addMutableState("double[]", "probeCents",
      v => s"$v = (double[]) $cBc.value();")
    val nArr = ctx.addMutableState("double[]", "probeNorms",
      v => s"$v = (double[]) $nBc.value();")
    defineCodeGen(ctx, ev, a =>
      s"graft.plans.VectorOps.topCells($a, $cArr, $nArr, $m, $dim)")
  }
  override protected def withNewChildInternal(newChild: Expression): TopCells =
    copy(child = newChild)
}

object TopCells {
  def of(c: Column, cents: Array[Double], cnorms: Array[Double],
      m: Int, dim: Int): Column =
    CB.column(TopCells(CB.expression(c), BroadcastOnce.of(cents),
      BroadcastOnce.of(cnorms), m, dim))
}
