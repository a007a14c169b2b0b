package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.{call_function, lit, typedlit}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType, LongType}

/** Native codegen kernels for the vector/ANN family.
  *
  * The ANN operators (SimilarityOps) originally computed quantization,
  * residuals, subspace distances and ADC sums with higher-order column
  * functions (`transform`/`zip_with`/`aggregate`). Those are
  * CodegenFallback expressions — every element is an interpreted
  * closure call — and worse, Catalyst's projection collapsing inlines a
  * shared input (e.g. a residual vector) into EVERY consuming
  * expression, so an m×k lookup-table projection re-evaluated the
  * residual chain (including a cells·dim literal map build) 64× per
  * row. At bench scale that made the residual IVF-PQ scan ~6× slower
  * than the flat-PQ scan on identical join sizes, with GC-driven
  * variance (profiled: 15s → 158s across reps on 2 000 vectors).
  *
  * Each kernel here is ONE expression node: a tight JVM loop over
  * primitive longs, shared verbatim by `eval` and the generated code
  * (`doGenCode` emits a single static call, so the whole scan stays
  * inside whole-stage codegen). Model parameters (codebooks, centroids)
  * live in the expression node and reach generated code via
  * `addReferenceObj` — evaluated zero times per row. Arithmetic is
  * bit-identical to the column-function originals: floor(x·10⁶) long
  * quantization, left-to-right integer sums, first-minimum tie-breaks —
  * every DuckDB oracle hash is unchanged.
  *
  * Registered by [[graft.plans.GraftExtensions]]; construct through the
  * [[VecExprs]] column helpers (model arguments must be literals).
  */
object VecKernels {

  /** floor(x·10⁶) per element — exactly `transform(v, x =>
    * floor(x.cast("double") * 1e6).cast("long"))`. Elements must be
    * non-null (embedding vectors are).
    */
  def quantize(v: ArrayData, fromFloat: Boolean): ArrayData = {
    val n = v.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      val d = if (fromFloat) v.getFloat(i).toDouble else v.getDouble(i)
      out(i) = math.floor(d * 1e6).toLong
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Elementwise a − b over long arrays (the residual kernel). */
  def subArr(a: ArrayData, b: ArrayData): ArrayData = {
    val n = a.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) { out(i) = a.getLong(i) - b.getLong(i); i += 1 }
    new GenericArrayData(out)
  }

  /** Σ (a_i − b_i)² over long arrays, left to right. */
  def sqDist(a: ArrayData, b: ArrayData): Long = {
    val n = a.numElements()
    var s = 0L
    var i = 0
    while (i < n) { val d = a.getLong(i) - b.getLong(i); s += d * d; i += 1 }
    s
  }

  /** Σ a_i·b_i over long arrays (the exact integer dot product). */
  def dotLong(a: ArrayData, b: ArrayData): Long = {
    val n = a.numElements()
    var s = 0L
    var i = 0
    while (i < n) { s += a.getLong(i) * b.getLong(i); i += 1 }
    s
  }

  /** Σ (a_i − c_i)² against a model-constant centroid. */
  def sqDistConst(a: ArrayData, c: Array[Long]): Long = {
    var s = 0L
    var i = 0
    while (i < c.length) { val d = a.getLong(i) - c(i); s += d * d; i += 1 }
    s
  }

  /** Squared L2 of v[offset, offset+sub) to each of one codebook's k
    * centroids: the per-subspace ADC lookup-table row.
    */
  def subspaceDists(v: ArrayData, offset: Int, books: Array[Array[Long]]): ArrayData = {
    val k = books.length
    val out = new Array[Long](k)
    var ki = 0
    while (ki < k) {
      val c = books(ki)
      var s = 0L
      var i = 0
      while (i < c.length) { val d = v.getLong(offset + i) - c(i); s += d * d; i += 1 }
      out(ki) = s
      ki += 1
    }
    new GenericArrayData(out)
  }

  /** Argmin centroid for one subspace, ties to the LOWEST index —
    * identical to `array_position(d, array_min(d)) - 1` over the
    * [[subspaceDists]] row (array_position returns the first minimum).
    */
  def pqCode(v: ArrayData, offset: Int, books: Array[Array[Long]]): Int = {
    var best = 0
    var bestD = Long.MaxValue
    var ki = 0
    while (ki < books.length) {
      val c = books(ki)
      var s = 0L
      var i = 0
      while (i < c.length) { val d = v.getLong(offset + i) - c(i); s += d * d; i += 1 }
      if (s < bestD) { bestD = s; best = ki }
      ki += 1
    }
    best
  }

  /** Σ_mi lut[mi][codes[mi]] — the asymmetric-distance gather. */
  def adcSum(codes: ArrayData, lut: ArrayData): Long = {
    val m = codes.numElements()
    var s = 0L
    var i = 0
    while (i < m) { s += lut.getArray(i).getLong(codes.getInt(i)); i += 1 }
    s
  }

  /** Argmin centroid index over the FULL vector, ties to the LOWEST
    * index — bit-identical to `array_position(dists, array_min(dists))
    * - 1` over `array(sqDistConst(v, c_0), …, sqDistConst(v, c_{k-1}))`
    * (array_position returns the first minimum; strict `<` here keeps
    * the first minimum too, and each per-centroid sum accumulates the
    * same left-to-right long arithmetic, so even a wrapped overflow
    * wraps identically). One expression node instead of k: the
    * k-literal-array shape generated k inlined kernel calls plus an
    * array build + two array scans PER ROW, and at k ≈ √n (the
    * SemDeDup production stance) the generated projection blew past
    * JIT-friendly method sizes and Janino compile time grew with k on
    * every Lloyd pass.
    */
  def assignCell(v: ArrayData, cents: Array[Array[Long]]): Long = {
    var best = 0
    var bestD = Long.MaxValue
    var ki = 0
    while (ki < cents.length) {
      val c = cents(ki)
      var s = 0L
      var i = 0
      while (i < c.length) { val d = v.getLong(i) - c(i); s += d * d; i += 1 }
      if (s < bestD) { bestD = s; best = ki }
      ki += 1
    }
    best.toLong
  }
}

/** `graft_quantize(vec)` — float/double array → floor(x·10⁶) longs. */
case class QuantizeVec(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_quantize"
  @transient private lazy val fromFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType
  override def nullSafeEval(v: Any): Any =
    VecKernels.quantize(v.asInstanceOf[ArrayData], fromFloat)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.VecKernels.quantize($c, $fromFloat)")
  override protected def withNewChildInternal(newChild: Expression): QuantizeVec =
    copy(child = newChild)
}

/** `graft_sub_arrays(a, b)` — elementwise long difference. */
case class SubLongArrays(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_sub_arrays"
  override def nullSafeEval(a: Any, b: Any): Any =
    VecKernels.subArr(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VecKernels.subArr($a, $b)")
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): SubLongArrays =
    copy(left = newLeft, right = newRight)
}

/** `graft_sq_dist(a, b)` — Σ (a_i − b_i)² over long arrays. */
case class SqDistLongArrays(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_sq_dist"
  override def nullSafeEval(a: Any, b: Any): Any =
    VecKernels.sqDist(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VecKernels.sqDist($a, $b)")
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): SqDistLongArrays =
    copy(left = newLeft, right = newRight)
}

/** `graft_dot_long(a, b)` — Σ a_i·b_i over long arrays. */
case class DotLongArrays(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_dot_long"
  override def nullSafeEval(a: Any, b: Any): Any =
    VecKernels.dotLong(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VecKernels.dotLong($a, $b)")
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): DotLongArrays =
    copy(left = newLeft, right = newRight)
}

/** `graft_sq_dist_const(vec, centroid)` — distance to a model constant.
  * The centroid child must be foldable (a literal); it is evaluated
  * once at plan time, never per row.
  */
case class SqDistToConst(child: Expression, centroid: Seq[Long]) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_sq_dist_const"
  @transient private lazy val cArr: Array[Long] = centroid.toArray
  override def nullSafeEval(v: Any): Any =
    VecKernels.sqDistConst(v.asInstanceOf[ArrayData], cArr)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("centroid", cArr, "long[]")
    defineCodeGen(ctx, ev, c => s"graft.functions.VecKernels.sqDistConst($c, $ref)")
  }
  override protected def withNewChildInternal(newChild: Expression): SqDistToConst =
    copy(child = newChild)
}

/** `graft_pq_dists(vec, offset, books)` — one subspace's k-entry ADC
  * lookup-table row (squared L2 to each codebook centroid).
  */
case class PqSubspaceDists(child: Expression, offset: Int, books: Seq[Seq[Long]])
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_pq_dists"
  @transient private lazy val booksArr: Array[Array[Long]] = books.map(_.toArray).toArray
  override def nullSafeEval(v: Any): Any =
    VecKernels.subspaceDists(v.asInstanceOf[ArrayData], offset, booksArr)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("books", booksArr, "long[][]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.VecKernels.subspaceDists($c, $offset, $ref)")
  }
  override protected def withNewChildInternal(newChild: Expression): PqSubspaceDists =
    copy(child = newChild)
}

/** `graft_pq_code(vec, offset, books)` — the subspace's argmin centroid
  * index (first minimum on ties, matching array_position semantics).
  */
case class PqCodeExpr(child: Expression, offset: Int, books: Seq[Seq[Long]])
    extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_pq_code"
  @transient private lazy val booksArr: Array[Array[Long]] = books.map(_.toArray).toArray
  override def nullSafeEval(v: Any): Any =
    VecKernels.pqCode(v.asInstanceOf[ArrayData], offset, booksArr)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("books", booksArr, "long[][]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.VecKernels.pqCode($c, $offset, $ref)")
  }
  override protected def withNewChildInternal(newChild: Expression): PqCodeExpr =
    copy(child = newChild)
}

/** `graft_assign_cell(vec, centroids)` — nearest-centroid index over
  * the full vector (first minimum on ties), the coarse-quantizer assign
  * as ONE kernel node. The centroid matrix rides the node as a model
  * constant via addReferenceObj — k never inflates the generated code.
  */
case class AssignCellExpr(child: Expression, cents: Seq[Seq[Long]])
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_assign_cell"
  @transient private lazy val centsArr: Array[Array[Long]] = cents.map(_.toArray).toArray
  override def nullSafeEval(v: Any): Any =
    VecKernels.assignCell(v.asInstanceOf[ArrayData], centsArr)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cents", centsArr, "long[][]")
    defineCodeGen(ctx, ev, c => s"graft.functions.VecKernels.assignCell($c, $ref)")
  }
  override protected def withNewChildInternal(newChild: Expression): AssignCellExpr =
    copy(child = newChild)
}

/** `graft_adc_sum(codes, lut)` — Σ lut[mi][codes[mi]]. */
case class AdcSumExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_adc_sum"
  override def nullSafeEval(codes: Any, lut: Any): Any =
    VecKernels.adcSum(codes.asInstanceOf[ArrayData], lut.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VecKernels.adcSum($a, $b)")
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): AdcSumExpr =
    copy(left = newLeft, right = newRight)
}

/** Column-level constructors (via the session function registry, the
  * same public route as [[NormalizeNameExpr]]). Model parameters are
  * passed as literals and unpacked ONCE at plan-build time by the
  * builders in [[graft.plans.GraftExtensions]].
  */
object VecExprs {
  def quantize(v: Column): Column = call_function("graft_quantize", v)

  def subArrays(a: Column, b: Column): Column = call_function("graft_sub_arrays", a, b)

  def sqDist(a: Column, b: Column): Column = call_function("graft_sq_dist", a, b)

  def dotLong(a: Column, b: Column): Column = call_function("graft_dot_long", a, b)

  def sqDistConst(v: Column, c: Seq[Long]): Column =
    call_function("graft_sq_dist_const", v, typedlit(c))

  def pqDists(v: Column, offset: Int, books: Seq[Array[Long]]): Column =
    call_function("graft_pq_dists", v, lit(offset),
      typedlit(books.map(_.toSeq): Seq[Seq[Long]]))

  def pqCode(v: Column, offset: Int, books: Seq[Array[Long]]): Column =
    call_function("graft_pq_code", v, lit(offset),
      typedlit(books.map(_.toSeq): Seq[Seq[Long]]))

  def adcSum(codes: Column, lut: Column): Column = call_function("graft_adc_sum", codes, lut)

  def assignCell(v: Column, cents: Seq[Array[Long]]): Column =
    call_function("graft_assign_cell", v,
      typedlit(cents.map(_.toSeq): Seq[Seq[Long]]))

  /** Unpack a foldable literal argument at plan-build time. */
  private[graft] def constInt(e: Expression): Int = {
    require(e.foldable, s"model argument must be a literal, got $e")
    e.eval(null).asInstanceOf[Int]
  }

  private[graft] def constLongs(e: Expression): Seq[Long] = {
    require(e.foldable, s"model argument must be a literal, got $e")
    e.eval(null).asInstanceOf[ArrayData].toLongArray().toSeq
  }

  private[graft] def constLongMatrix(e: Expression): Seq[Seq[Long]] = {
    require(e.foldable, s"model argument must be a literal, got $e")
    val ad = e.eval(null).asInstanceOf[ArrayData]
    (0 until ad.numElements()).map(i => ad.getArray(i).toLongArray().toSeq)
  }
}
