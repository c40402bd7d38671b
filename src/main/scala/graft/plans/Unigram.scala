package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftsql.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unigram-LM tokenizer kernel (Kudo 2018, arXiv:1804.10959 — the
  * SentencePiece unigram model): each whitespace word is segmented into
  * the MAXIMUM-LIKELIHOOD sequence of vocabulary pieces — the Viterbi
  * path under independent piece probabilities — followed by the shared
  * `</w>` end-of-word marker ([[Bpe.Marker]], so [[graft.functions.Text
  * .bpeDecode]] inverts both tokenizers). The training half is
  * [[graft.functions.UnigramTrain]].
  *
  * Determinism contract (shared bit-for-bit with the DuckDB oracle's
  * unrolled-DP replica): piece probabilities are round-6 doubles; a
  * path's likelihood is the IEEE product of its pieces' probabilities
  * folded LEFT TO RIGHT in segmentation order; ties break to the FEWER-
  * piece path, then to the smallest piece sequence (pieces joined with
  * `chr(1)`, which sorts below every printable character) under CODE
  * POINT order — which is exactly UTF-8 byte order, DuckDB's string
  * collation (Java's `String.compareTo` orders by UTF-16 code unit,
  * which diverges for supplementary-plane characters: surrogates sort
  * below U+E000..U+FFFF while their code points sort above all of the
  * BMP). Both engines therefore compute identical candidate products in
  * identical op order and pick identical argmaxes, for any vocabulary.
  *
  * Scale shape: per-row expression, ZERO shuffle; one static call per
  * row from whole-stage codegen (same pattern as [[BpeEncode]]). The
  * piece table rides along as a plan reference object, and the bounded
  * per-table word→pieces memo exploits the zipfian word distribution.
  */
case class UnigramEncode(child: Expression, pieces: Seq[(String, Double)])
  extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_unigram_encode"

  @transient private lazy val table = new Unigram.Table(pieces)

  override def nullSafeEval(v: Any): Any =
    Unigram.encode(v.asInstanceOf[UTF8String], table)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("unigramTable", table,
      classOf[Unigram.Table].getName)
    defineCodeGen(ctx, ev, c => s"graft.plans.Unigram.encode($c, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Unigram {

  /** Tie-break separator for piece sequences (sorts below every
    * printable character in both engines). */
  private[plans] val Sep = "\u0001"

  /** A piece table prepared for encoding: piece → round-6 probability,
    * the max piece length (DP lookback bound), and the same bounded
    * per-JVM word memo as [[Bpe.Table]]. */
  final class Table(val pieces: Seq[(String, Double)]) extends Serializable {
    private[plans] val probs: java.util.HashMap[String, java.lang.Double] = {
      val m = new java.util.HashMap[String, java.lang.Double](pieces.size * 2)
      pieces.foreach { case (p, pr) => m.put(p, java.lang.Double.valueOf(pr)) }
      m
    }
    private[plans] val maxLen: Int =
      if (pieces.isEmpty) 1 else pieces.iterator.map(_._1.length).max
    private val memoCap = 1 << 16
    @transient private lazy val memo =
      new java.util.concurrent.ConcurrentHashMap[String, Array[String]]()
    private[plans] def piecesOf(word: String): Array[String] = {
      val hit = memo.get(word)
      if (hit != null) return hit
      val out = viterbi(word, this)
      if (memo.size >= memoCap) memo.clear()
      memo.put(word, out)
      out
    }
  }

  /** Max-likelihood segmentation of one word — the DP the object
    * scaladoc's determinism contract describes. `best(j)` = the winning
    * (product, nPieces, pieceSeq) over prefixes of length j; candidates
    * at j extend `best(i)` for `i ∈ [j-maxLen, j)` with piece
    * `word[i, j)`; `best(i).prod * p(piece)` IS the left-to-right fold
    * because `best(i).prod` was itself built that way. A word the vocab
    * cannot segment (possible only when the vocab is missing pieces a
    * word needs — never for the corpus the model was trained on, whose
    * head words are EM-segmentable by construction) falls back to one
    * piece per character, the SentencePiece `<unk>`-char convention
    * without a sentinel, keeping decode pure concatenation. */
  private[graft] def viterbi(word: String, table: Table): Array[String] = {
    val n = word.length
    if (n == 0) return Array.empty
    val prod = new Array[Double](n + 1)
    val np = new Array[Int](n + 1)
    val seg = new Array[String](n + 1)
    java.util.Arrays.fill(prod, -1.0) // unreachable sentinel
    prod(0) = 1.0; np(0) = 0; seg(0) = ""
    var j = 1
    while (j <= n) {
      var i = math.max(0, j - table.maxLen)
      while (i < j) {
        if (prod(i) >= 0) {
          val piece = word.substring(i, j)
          val p = table.probs.get(piece)
          if (p != null) {
            val cProd = prod(i) * p.doubleValue()
            val cNp = np(i) + 1
            val cSeg = if (seg(i).isEmpty) piece else seg(i) + Sep + piece
            val better = prod(j) < 0 ||
              cProd > prod(j) ||
              (cProd == prod(j) && (cNp < np(j) ||
                (cNp == np(j) && codePointCompare(cSeg, seg(j)) < 0)))
            if (better) { prod(j) = cProd; np(j) = cNp; seg(j) = cSeg }
          }
        }
        i += 1
      }
      j += 1
    }
    if (prod(n) < 0) {
      // unsegmentable fallback splits by CODE POINT, not UTF-16 unit —
      // a lone-surrogate piece would be mangled to '?' downstream (the
      // same rule as Bpe.applyMerges)
      val out = new java.util.ArrayList[String](n)
      var k = 0
      while (k < n) {
        val w = Character.charCount(word.codePointAt(k))
        out.add(word.substring(k, k + w)); k += w
      }
      out.toArray(new Array[String](out.size()))
    } else seg(n).split(Sep, -1)
  }

  /** Compare by Unicode CODE POINT — identical to UTF-8 BYTE order (UTF-8
    * preserves code-point order), i.e. DuckDB's collation for the oracle's
    * `seg ASC`. `String.compareTo` (UTF-16 code units) would diverge for
    * supplementary-plane pieces. */
  private[plans] def codePointCompare(a: String, b: String): Int = {
    var i = 0; var j = 0
    while (i < a.length && j < b.length) {
      val ca = a.codePointAt(i); val cb = b.codePointAt(j)
      if (ca != cb) return Integer.compare(ca, cb)
      i += Character.charCount(ca); j += Character.charCount(cb)
    }
    Integer.compare(a.length - i, b.length - j)
  }

  /** Document → unigram piece stream; called from generated code. Words
    * are single-space splits (empty words included, matching
    * `split(text, " ")` — an empty word encodes to the bare marker, so
    * decode restores runs of spaces exactly; same contract as
    * [[Bpe.encode]]). */
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
      out.add(UTF8String.fromString(Bpe.Marker))
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** Column-API entry point: text must be STRING. */
  def unigramEncodeNative(text: Column, pieces: Seq[(String, Double)]): Column =
    Bridge.toColumn(UnigramEncode(Bridge.toExpression(text), pieces))
}
