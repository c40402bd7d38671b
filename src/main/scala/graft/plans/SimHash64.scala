package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftsql.Bridge
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit SimHash of a text column in ONE pass over the bytes: tokenize
  * on single spaces, xxhash64 each token in place (no substring
  * materialization — hashes the UTF8String's byte range directly), and
  * take the per-bit majority vote.
  *
  * Replaces both prior forms: the per-row HOF composition
  * ([[graft.functions.NearDup.simhash64]] — 64 interpreted `aggregate`
  * traversals per document) and the exploded bit-sum aggregate
  * ([[graft.functions.NearDup.simhashTable]] — one extra
  * explode+groupBy shuffle). Semantics are identical to both (asserted in
  * NearDupSpec): tokenization matches `split(text, " ")` with unlimited
  * limit (consecutive/leading/trailing spaces produce empty tokens, the
  * empty string is one empty token), and the token hash is Spark's
  * `xxhash64` (XXH64, seed 42) over the token's UTF-8 bytes.
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash64_native"

  override def nullSafeEval(v: Any): Any =
    SimHash64.compute(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.SimHash64.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHash64 {

  /** Single-pass simhash; called from generated code (stays inside
    * whole-stage codegen as one static call per row). */
  def compute(text: UTF8String): Long = {
    val nb = text.numBytes()
    val base = text.getBaseObject
    val off = text.getBaseOffset
    val counts = new Array[Int](64)
    var n = 0
    var start = 0
    var i = 0
    while (i <= nb) {
      // token boundary: end of string or a space byte (0x20 is never part
      // of a multi-byte UTF-8 sequence)
      if (i == nb || text.getByte(i) == 0x20) {
        val h = XXH64.hashUnsafeBytes(base, off + start, i - start, 42L)
        n += 1
        var b = 0
        while (b < 64) {
          counts(b) += ((h >>> b) & 1L).toInt
          b += 1
        }
        start = i + 1
      }
      i += 1
    }
    var sh = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) * 2 > n) sh |= (1L << b)
      b += 1
    }
    sh
  }

  /** Column-API entry point: text must be STRING. */
  def simhash64Native(text: Column): Column =
    Bridge.toColumn(SimHash64(Bridge.toExpression(text)))
}
