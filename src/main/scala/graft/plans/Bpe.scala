package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftsql.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Byte-pair-encoding tokenizer kernel (Sennrich, Haddow & Birch 2016,
  * arXiv:1508.07909 — the public word-level BPE algorithm): each
  * whitespace word becomes its character symbols plus a `</w>` end-of-word
  * marker symbol, then learned merges apply greedily in RANK order (lowest
  * rank first, all occurrences in the word per step) until no learned pair
  * remains adjacent. The expression emits the whole document's piece
  * stream as one `array<string>`.
  *
  * Decode is pure concatenation — every input character survives into
  * exactly one piece and `</w>` marks the removed spaces — so
  * `decode(encode(text)) == text` for any text not containing the literal
  * marker (asserted corpus-wide by the `bpe_roundtrip` oracle query).
  *
  * Scale shape: per-row expression, ZERO shuffle; one static call per row
  * from whole-stage codegen (same pattern as [[SimHash64]]). The merge
  * table rides along as a plan reference object (driver-built, serialized
  * once per plan like the LSH plane literals), and a bounded per-table
  * word→pieces memo exploits the zipfian word distribution — the hot
  * few-thousand words encode once per executor JVM, not once per
  * occurrence.
  */
case class BpeEncode(child: Expression, merges: Seq[(String, String)])
  extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_bpe_encode"

  @transient private lazy val table = new Bpe.Table(merges)

  override def nullSafeEval(v: Any): Any =
    Bpe.encode(v.asInstanceOf[UTF8String], table)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeTable", table, classOf[Bpe.Table].getName)
    defineCodeGen(ctx, ev, c => s"graft.plans.Bpe.encode($c, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Bpe {

  /** End-of-word marker symbol (kept out of the corpus alphabet). */
  val Marker = "</w>"

  /** A merge table prepared for encoding: pair → rank, plus the per-JVM
    * word memo (bounded: cleared wholesale past `memoCap` distinct words —
    * simple, deterministic, and the zipfian head re-fills instantly). */
  final class Table(val merges: Seq[(String, String)]) extends Serializable {
    private[plans] val ranks: java.util.HashMap[String, Integer] = {
      val m = new java.util.HashMap[String, Integer](merges.size * 2)
      merges.zipWithIndex.foreach { case ((a, b), i) =>
        m.put(a + "\u0000" + b, Integer.valueOf(i))
      }
      m
    }
    private val memoCap = 1 << 16
    @transient private lazy val memo =
      new java.util.concurrent.ConcurrentHashMap[String, Array[String]]()
    private[plans] def piecesOf(word: String): Array[String] = {
      val hit = memo.get(word)
      if (hit != null) return hit
      val pieces = applyMerges(word, ranks)
      if (memo.size >= memoCap) memo.clear()
      memo.put(word, pieces)
      pieces
    }
  }

  /** Greedy rank-ordered merge application for one word. */
  private def applyMerges(
      word: String, ranks: java.util.HashMap[String, Integer]): Array[String] = {
    var syms = new java.util.ArrayList[String](word.length + 1)
    var i = 0
    // split by CODE POINT, not UTF-16 unit: a lone surrogate piece would
    // be mangled to '?' by UTF8String.fromString at encode time, breaking
    // the decode(encode(text)) == text contract on supplementary-plane
    // text (emoji, rare CJK)
    while (i < word.length) {
      val w = Character.charCount(word.codePointAt(i))
      syms.add(word.substring(i, i + w)); i += w
    }
    syms.add(Marker)
    var done = false
    while (!done && syms.size() > 1) {
      // lowest-rank adjacent pair present in the word
      var bestRank = Int.MaxValue
      var j = 0
      while (j < syms.size() - 1) {
        val r = ranks.get(syms.get(j) + "\u0000" + syms.get(j + 1))
        if (r != null && r.intValue() < bestRank) bestRank = r.intValue()
        j += 1
      }
      if (bestRank == Int.MaxValue) done = true
      else {
        // merge ALL its non-overlapping occurrences, left to right
        val next = new java.util.ArrayList[String](syms.size())
        var k = 0
        while (k < syms.size()) {
          if (k < syms.size() - 1 && {
            val r = ranks.get(syms.get(k) + "\u0000" + syms.get(k + 1))
            r != null && r.intValue() == bestRank
          }) {
            next.add(syms.get(k) + syms.get(k + 1)); k += 2
          } else { next.add(syms.get(k)); k += 1 }
        }
        syms = next
      }
    }
    val out = new Array[String](syms.size())
    var m = 0
    while (m < out.length) { out(m) = syms.get(m); m += 1 }
    out
  }

  /** Document → BPE piece stream; called from generated code. Words are
    * single-space splits (empty words included, matching `split(text, " ")`
    * — an empty word encodes to the bare marker, so decode restores runs
    * of spaces exactly). */
  def encode(text: UTF8String, table: Table): GenericArrayData = {
    val words = text.toString.split(" ", -1)
    val out = new java.util.ArrayList[UTF8String](words.length * 2)
    var i = 0
    while (i < words.length) {
      val pieces = table.piecesOf(words(i))
      var j = 0
      while (j < pieces.length) {
        out.add(UTF8String.fromString(pieces(j))); j += 1
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** Column-API entry point: text must be STRING. */
  def bpeEncodeNative(text: Column, merges: Seq[(String, String)]): Column =
    Bridge.toColumn(BpeEncode(Bridge.toExpression(text), merges))
}
