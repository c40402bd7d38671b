package graft.plans

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftsql.Bridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization of a string column (NFC/NFD/NFKC/NFKD) as a
  * per-row codegen'd expression — the text-canonicalization step that
  * belongs BEFORE any hash-keyed text operator. Exact dedup, line
  * dedup, shingle hashing, and vocabulary building all key on raw
  * bytes; "café" composed and "cafe" + combining-acute are the same
  * text but different bytes, so un-normalized corpora leak duplicates
  * straight through every hash family. One pass here makes byte
  * equality mean text equality.
  *
  * Scale shape: per-row, zero shuffle, stays inside whole-stage codegen
  * as a single static call. The overwhelmingly common case — pure-ASCII
  * rows — is detected with a byte scan and returns the input UTF8String
  * unchanged: no decode, no `java.text.Normalizer` call, no allocation.
  * (ASCII is closed under all four normal forms.)
  */
case class UnicodeNormalize(child: Expression, form: String)
    extends UnaryExpression {

  Normalizer.Form.valueOf(form) // fail at plan time on a bad form name

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_unicode_normalize"

  override def nullSafeEval(v: Any): Any =
    UnicodeNormalize.compute(v.asInstanceOf[UTF8String], form)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"""graft.plans.UnicodeNormalize.compute($c, "$form")""")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object UnicodeNormalize {

  /** Called from generated code — one static call per row. */
  def compute(s: UTF8String, form: String): UTF8String = {
    val nb = s.numBytes()
    var i = 0
    var ascii = true
    while (ascii && i < nb) {
      if ((s.getByte(i) & 0x80) != 0) ascii = false
      i += 1
    }
    if (ascii) s
    else {
      val str = s.toString
      val f = Normalizer.Form.valueOf(form)
      if (Normalizer.isNormalized(str, f)) s
      else UTF8String.fromString(Normalizer.normalize(str, f))
    }
  }

  /** Canonical composition — the form to normalize to before hashing. */
  def nfc(text: Column): Column = of(text, "NFC")

  /** Compatibility composition: also folds ligatures (ﬁ → fi),
    * full-width forms (２ → 2), etc. — the aggressive variant for
    * dedup keys where "compatibility-equal" should collide. */
  def nfkc(text: Column): Column = of(text, "NFKC")

  def of(text: Column, form: String): Column =
    Bridge.toColumn(UnicodeNormalize(Bridge.toExpression(text), form))
}
