package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftsql.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native winnowing kernel ([[graft.functions.Winnow]] semantics,
  * Schleimer et al. SIGMOD 2003): the sorted distinct window-minima of
  * the polynomial k-gram hash sequence, in ONE compiled pass —
  * O(n) per document via the rolling-hash recurrence
  * `h' = (h − c_out·B^{k−1})·B + c_in mod M` and a monotonic-deque
  * sliding minimum.
  *
  * Replaces the higher-order-function form for the hot path: HOFs are
  * INTERPRETED (no codegen), and the shifted-slice algebra still walks
  * k+w array copies per row — measured minutes per bench round at
  * sf0.1 where this kernel is milliseconds. The HOF pipeline
  * ([[graft.functions.Winnow.kgramHashes]]) stays as the
  * cross-checkable reference: WinnowSpec asserts kernel ≡ reference,
  * and the DuckDB oracle mirrors the same arithmetic.
  *
  * Character model: Unicode CODE POINTS — `split(text, '')` / `ascii()`
  * (the HOF reference) and DuckDB `substring`/`ascii` (the oracle) both
  * step by code point, so the kernel decodes the UTF-16 buffer to a code
  * point array first; supplementary-plane characters (emoji, rare CJK)
  * hash as one symbol with value ≤ 0x10FFFF, identical across all three
  * implementations. Arithmetic bound: each term ≤ M·2^21 and the k-term
  * polynomial sum ≤ k·M·2^21 < 2^57 for k ≤ 64 — exact long math. */
case class WinnowFingerprints(child: Expression, k: Int, w: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_winnow_fingerprints"

  override def nullSafeEval(v: Any): Any =
    WinnowFingerprints.compute(v.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.plans.WinnowFingerprints.compute($c, $k, $w)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WinnowFingerprints {

  /** One-pass winnowing; called from generated code. */
  def compute(text: UTF8String, k: Int, w: Int): ArrayData = {
    val B = graft.functions.Winnow.B
    val M = graft.functions.Winnow.M
    val s = text.toString
    // Code-point indexed: the HOF reference and the SQL oracle both step
    // by code point, so the kernel must too (a surrogate pair is ONE
    // symbol, not two). n == s.length means no surrogate pairs — then
    // charAt IS the code point and the hot path skips the decode array
    // (corpus text is overwhelmingly BMP; the allocation cost was ~15%
    // on the winnow bench queries).
    val n = s.codePointCount(0, s.length)
    if (n < k) return new GenericArrayData(Array.empty[Long])
    val m = n - k + 1
    // B^(k-1) mod M for the roll-out term
    var bk1 = 1L
    var j = 1
    while (j < k) { bk1 = bk1 * B % M; j += 1 }
    // rolling k-gram hashes
    val hs = new Array[Long](m)
    var h = 0L
    var i = 0
    if (n == s.length) {
      while (i < k) { h = (h * B + s.charAt(i).toLong) % M; i += 1 }
      hs(0) = h
      i = 1
      while (i < m) {
        val out = s.charAt(i - 1).toLong * bk1 % M
        h = ((h - out + M) % M * B + s.charAt(i + k - 1).toLong) % M
        hs(i) = h
        i += 1
      }
    } else {
      val cp = new Array[Int](n)
      var ci = 0
      var cj = 0
      while (ci < s.length) {
        val c = s.codePointAt(ci)
        cp(cj) = c; cj += 1; ci += Character.charCount(c)
      }
      while (i < k) { h = (h * B + cp(i).toLong) % M; i += 1 }
      hs(0) = h
      i = 1
      while (i < m) {
        val out = cp(i - 1).toLong * bk1 % M
        h = ((h - out + M) % M * B + cp(i + k - 1).toLong) % M
        hs(i) = h
        i += 1
      }
    }
    // sliding window minima (monotonic deque over indices); m < w
    // degenerates to the single whole-array min
    val win = math.min(w, m)
    val mins = new java.util.TreeSet[java.lang.Long]()
    val dq = new Array[Int](m)
    var head = 0
    var tail = 0 // deque in dq[head, tail)
    i = 0
    while (i < m) {
      while (tail > head && hs(dq(tail - 1)) >= hs(i)) tail -= 1
      dq(tail) = i; tail += 1
      if (dq(head) <= i - win) head += 1
      if (i >= win - 1) mins.add(hs(dq(head)))
      i += 1
    }
    val out = new Array[Long](mins.size)
    val it = mins.iterator()
    i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  /** Column-API entry point: text must be STRING. */
  def winnowNative(text: Column, k: Int, w: Int): Column =
    Bridge.toColumn(WinnowFingerprints(Bridge.toExpression(text), k, w))
}
