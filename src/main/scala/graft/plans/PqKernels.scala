package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftsql.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Native kernels for the vector-quantization family (PQ encode / ADC LUT /
  * IVF cell probe).
  *
  * Why these exist: the HOF compositions in [[graft.functions.Pq]] /
  * [[graft.functions.Ivf]] are semantically exactly right, but their
  * expression TREES grow with the codebook — m·k literal sub-arrays and one
  * `aggregate`(`zip_with`) pair per codebook entry ≈ thousands of nodes per
  * operator. That cost lands twice: Catalyst optimizes a 10k-node tree on
  * the driver per query, and every row pays per-element closure dispatch
  * (HOFs are interpreted). Measured on sf0.1: 14.5 s per `ann_pq` run with
  * the codebooks already cached.
  *
  * Each kernel is ONE expression node holding the codebook as a reference
  * object; the generated code calls a static helper whose loops JIT to the
  * same machine code a hand-written operator would get. Fold order inside
  * the helpers matches the HOF forms element-for-element, so the kernels
  * are bit-identical to the reference compositions (asserted in PqSpec /
  * IvfIndexSpec equivalence tests).
  */
object PqKernels {

  private def normalize(x: ArrayData): Array[Double] = {
    val n = x.numElements()
    val out = new Array[Double](n)
    var s = 0.0
    var i = 0
    while (i < n) { val v = x.getDouble(i); out(i) = v; s += v * v; i += 1 }
    // HOF reference: transform(v, _ / sqrt(aggregate(v², +))) — same
    // order. DOCUMENTED DIVERGENCE for the all-zero vector: the HOF form
    // yields NaN components (0/0) and NaN-ordering-dependent codes; this
    // kernel keeps the zero vector and picks a definite argmin — defined
    // behavior for a padding/failed-ingest row beats mirroring NaN. The
    // bit-for-bit claim holds for every nonzero vector.
    val norm = math.sqrt(s)
    if (norm > 0) { i = 0; while (i < n) { out(i) /= norm; i += 1 } }
    out
  }

  /** PQ codes of a raw (unnormalized) vector: normalize, then per
    * subspace the argmin-distance codebook entry (ties → lowest code,
    * matching `array_min` struct ordering). */
  def encode(v: ArrayData, cb: Array[Array[Array[Double]]]): ArrayData = {
    val x = normalize(v)
    val m = cb.length
    val subDim = cb(0)(0).length
    val codes = new Array[Int](m)
    var mi = 0
    while (mi < m) {
      val book = cb(mi)
      val off = mi * subDim
      var best = 0
      var bestD = Double.MaxValue
      var ki = 0
      while (ki < book.length) {
        val c = book(ki)
        var d = 0.0
        var i = 0
        while (i < subDim) { val t = x(off + i) - c(i); d += t * t; i += 1 }
        if (d < bestD) { bestD = d; best = ki }
        ki += 1
      }
      codes(mi) = best
      mi += 1
    }
    new GenericArrayData(codes)
  }

  /** ADC lookup table of a raw query vector: normalized exact squared
    * sub-distance to every codebook entry, flattened m-major. */
  def lut(v: ArrayData, cb: Array[Array[Array[Double]]]): ArrayData = {
    val x = normalize(v)
    val m = cb.length
    val k = cb(0).length
    val subDim = cb(0)(0).length
    val out = new Array[Double](m * k)
    var mi = 0
    while (mi < m) {
      val book = cb(mi)
      val off = mi * subDim
      var ki = 0
      while (ki < k) {
        val c = book(ki)
        var d = 0.0
        var i = 0
        while (i < subDim) { val t = x(off + i) - c(i); d += t * t; i += 1 }
        out(mi * k + ki) = d
        ki += 1
      }
      mi += 1
    }
    new GenericArrayData(out)
  }

  /** Top-`nProbe` IVF cells of a vector by the linearized score
    * v·c − |c|²/2 (argmax ≡ argmin L2), descending, ties → lower cell id —
    * the exact ordering of the HOF `array_sort` composition in
    * [[graft.functions.Ivf]]. Selection sort over nCells scores: nCells is
    * small (≤ a few hundred) and nProbe ≤ nCells. */
  def probeCells(
      v: ArrayData, centroids: Array[Array[Double]], halfNorms: Array[Double],
      nProbe: Int): ArrayData = {
    val n = centroids.length
    val dim = math.min(v.numElements(), centroids(0).length)
    val scores = new Array[Double](n)
    var ci = 0
    while (ci < n) {
      val c = centroids(ci)
      var s = 0.0
      var i = 0
      while (i < dim) { s += v.getDouble(i) * c(i); i += 1 }
      scores(ci) = s - halfNorms(ci)
      ci += 1
    }
    val take = math.min(nProbe, n)
    val out = new Array[Int](take)
    val used = new Array[Boolean](n)
    var t = 0
    while (t < take) {
      var best = -1
      var bestS = Double.NegativeInfinity
      ci = 0
      while (ci < n) {
        if (!used(ci) && scores(ci) > bestS) { bestS = scores(ci); best = ci }
        ci += 1
      }
      if (best < 0) {
        // every remaining score is NaN (a corrupt vector or centroid):
        // `NaN > x` is false for all x, so the scan selected nothing.
        // Fall back to the lowest-index unused cell — deterministic and
        // total, so one bad row degrades its own result instead of
        // killing the task with used(-1)
        ci = 0
        while (best < 0 && ci < n) { if (!used(ci)) best = ci; ci += 1 }
      }
      used(best) = true
      out(t) = best
      t += 1
    }
    new GenericArrayData(out)
  }
}

/** Base for the unary quantization kernels: ARRAY<DOUBLE> in, reference
  * payload codebook, generated code delegating to the static helper. */
abstract class PqKernelExpression extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  /** Java source for the helper call, given the input variable name and the
    * codebook reference variable name. */
  protected def helperCall(input: String, ref: String): String
  protected def refObj: AnyRef
  protected def refType: String

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftRef", refObj, refType)
    nullSafeCodeGen(ctx, ev, input => s"${ev.value} = ${helperCall(input, ref)};")
  }
}

/** Native PQ encode: raw ARRAY<DOUBLE> → ARRAY<INT> codes (length m). */
case class PqEncode(child: Expression, cb: Array[Array[Array[Double]]])
    extends PqKernelExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_encode"
  override protected def refObj: AnyRef = cb
  override protected def refType: String = "double[][][]"
  override protected def helperCall(input: String, ref: String): String =
    s"graft.plans.PqKernels.encode($input, $ref)"
  override def nullSafeEval(v: Any): Any =
    PqKernels.encode(v.asInstanceOf[ArrayData], cb)
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Native ADC LUT: raw ARRAY<DOUBLE> query → ARRAY<DOUBLE> (m·k). */
case class PqLut(child: Expression, cb: Array[Array[Array[Double]]])
    extends PqKernelExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "pq_lut"
  override protected def refObj: AnyRef = cb
  override protected def refType: String = "double[][][]"
  override protected def helperCall(input: String, ref: String): String =
    s"graft.plans.PqKernels.lut($input, $ref)"
  override def nullSafeEval(v: Any): Any =
    PqKernels.lut(v.asInstanceOf[ArrayData], cb)
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Native IVF cell probe: ARRAY<DOUBLE> → ARRAY<INT> of the nProbe best
  * cells (centroid half-norms precomputed once at construction). */
case class CellProbe(
    child: Expression, centroids: Array[Array[Double]], nProbe: Int)
    extends PqKernelExpression {
  @transient private lazy val halfNorms: Array[Double] =
    centroids.map(c => c.map(x => x * x).sum / 2)
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "cell_probe"
  override protected def refObj: AnyRef = this
  override protected def refType: String = "graft.plans.CellProbe"
  override protected def helperCall(input: String, ref: String): String =
    s"(org.apache.spark.sql.catalyst.util.ArrayData) $ref.probe($input)"
  /** Instance entry point for both eval paths. */
  def probe(v: ArrayData): ArrayData =
    PqKernels.probeCells(v, centroids, halfNorms, nProbe)
  override def nullSafeEval(v: Any): Any = probe(v.asInstanceOf[ArrayData])
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object PqNative {
  def encodeNative(v: Column, cb: Array[Array[Array[Double]]]): Column =
    Bridge.toColumn(PqEncode(Bridge.toExpression(v), cb))
  def lutNative(v: Column, cb: Array[Array[Array[Double]]]): Column =
    Bridge.toColumn(PqLut(Bridge.toExpression(v), cb))
  def probeCellsNative(v: Column, centroids: Array[Array[Double]], nProbe: Int): Column =
    Bridge.toColumn(CellProbe(Bridge.toExpression(v), centroids, nProbe))
}
