package graft

import org.apache.spark.sql.functions._
import graft.functions.Text
import graft.plans.Bpe

/** BPE tokenizer ([[graft.plans.Bpe]] + [[Text.bpeMerges]]): merge
  * learning determinism, rank-ordered greedy application, the
  * decode∘encode ≡ id contract, and the packing/quota wiring. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  private def docs(texts: String*) =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")

  private def encodePieces(text: String, merges: Seq[(String, String)]): Seq[String] =
    docs(text).select(Text.bpeEncode(col("text"), merges).as("p"))
      .as[Seq[String]].collect().head

  test("no merges → characters plus end-of-word markers") {
    assert(encodePieces("ab c", Nil) == Seq("a", "b", "</w>", "c", "</w>"))
  }

  test("supplementary-plane text survives the roundtrip (code-point split)") {
    // UTF-16-unit splitting would cut the surrogate pairs into lone
    // surrogates that UTF8String mangles to '?', breaking the roundtrip
    val emoji = "hi 😀 ok 🤖x"
    assert(encodePieces("😀", Nil) == Seq("😀", "</w>"))
    val merges = Text.bpeMerges(docs("the cat sat on the mat"), nMerges = 16)
    val rt = docs(emoji)
      .select(Text.bpeDecode(Text.bpeEncode(col("text"), merges)).as("rt"))
      .as[String].collect().head
    assert(rt == emoji, s"roundtrip mangled supplementary text: '$rt'")
  }

  test("merges apply in rank order, all occurrences per step") {
    // rank0 joins "a b" everywhere first; THEN rank1 can see "ab ab"
    val merges = Seq(("a", "b"), ("ab", "ab"))
    assert(encodePieces("abab", merges) == Seq("abab", "</w>"))
    // rank order matters: a lower-rank merge consumes the pair a
    // higher-rank one needed
    val shadowed = Seq(("b", "c"), ("a", "b"))
    assert(encodePieces("abc", shadowed) == Seq("a", "bc", "</w>"))
  }

  test("marker merges let whole words become single pieces") {
    val merges = Seq(("t", "h"), ("th", "e"), ("the", "</w>"))
    assert(encodePieces("the the", merges) == Seq("the</w>", "the</w>"))
  }

  test("learned merges are deterministic and frequency-greedy") {
    val corpus = docs(Seq.fill(20)("low").mkString(" "),
      Seq.fill(10)("lowest").mkString(" "), Seq.fill(5)("newer").mkString(" "))
    val m1 = Text.bpeMerges(corpus, nMerges = 4)
    val m2 = Text.bpeMerges(corpus, nMerges = 4)
    assert(m1 == m2)
    // "l o" (count 30) must be the first merge; "lo w" second
    assert(m1.take(2) == Seq(("l", "o"), ("lo", "w")))
  }

  test("training exhausts gracefully when fewer merges exist than asked") {
    val m = Text.bpeMerges(docs("aa aa"), nMerges = 50)
    // "aa" + marker admits exactly 2 merges; (a,</w>) ties (a,a) at count
    // 2 and wins lexicographically ('<' sorts before 'a')
    assert(m == Seq(("a", "</w>"), ("a", "a</w>")))
  }

  test("decode∘encode ≡ id — incl. empty text, space runs, trailing space") {
    val merges = Text.bpeMerges(docs("the cat sat on the mat"), nMerges = 10)
    val samples = Seq("the cat sat", "", " ", "a  b", "tail ", " lead",
      "unseen words zq", "the the the")
    val got = docs(samples: _*)
      .select(col("doc_id"),
        Text.bpeDecode(Text.bpeEncode(col("text"), merges)).as("rt"))
      .orderBy(col("doc_id")).as[(Long, String)].collect().map(_._2).toSeq
    assert(got == samples)
  }

  test("fixture merges load, and roundtrip holds corpus-wide at sf0.001") {
    val merges = Text.fixtureMerges
    assert(merges.nonEmpty && merges.size <= 512)
    val corpus = spark.read.parquet(s"$sf0001/documents.parquet")
    val bad = corpus.select(col("text"),
        Text.bpeDecode(Text.bpeEncode(col("text"), merges)).as("rt"))
      .filter(col("text") =!= col("rt"))
    assert(bad.isEmpty)
    // the fixture actually compresses: pieces per doc well under chars
    val ratio = corpus.select(
        (sum(size(Text.bpeEncode(col("text"), merges))).cast("double") /
          sum(length(col("text")))).as("r"))
      .as[Double].collect().head
    assert(ratio < 0.6, s"fixture merges barely compress: $ratio")
  }

  test("kernel matches an independent reference implementation") {
    // naive reference: same greedy rank-ordered algorithm, written flat
    def ref(word: String, merges: Seq[(String, String)]): Seq[String] = {
      val rank = merges.zipWithIndex.toMap
      var syms = word.map(String.valueOf).toVector :+ Bpe.Marker
      var going = true
      while (going && syms.size > 1) {
        val pairs = syms.zip(syms.tail)
        val present = pairs.filter(rank.contains)
        if (present.isEmpty) going = false
        else {
          val best = present.minBy(rank)
          val out = Vector.newBuilder[String]
          var i = 0
          while (i < syms.size) {
            if (i < syms.size - 1 && (syms(i), syms(i + 1)) == best) {
              out += syms(i) + syms(i + 1); i += 2
            } else { out += syms(i); i += 1 }
          }
          syms = out.result()
        }
      }
      syms
    }
    val merges = Text.fixtureMerges
    val words = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(explode(split(col("text"), " ")).as("w"))
      .distinct().limit(300).as[String].collect().toSeq
    words.foreach { w =>
      assert(encodePieces(w, merges) == ref(w, merges), s"word '$w'")
    }
  }

  test("bpeTokenCount drives packing: offsets equal the sequential cumsum") {
    val corpus = spark.read.parquet(s"$sf0001/documents.parquet").limit(100)
    val merges = Text.fixtureMerges
    val packed = graft.functions.Packing.packSequences(
      corpus, orderKey = col("doc_id"),
      tokenCount = Text.bpeTokenCount(col("text"), merges), budget = 2048)
    val got = packed.select(col("doc_id"), col("n_tokens"),
        col("stream_offset"), col("bin"))
      .orderBy(col("doc_id")).as[(Long, Long, Long, Long)].collect().toSeq
    assert(got.size == 100)
    // sequential reference: exclusive cumsum of the BPE counts in key order
    var acc = 0L
    got.foreach { case (_, n, off, bin) =>
      assert(off == acc && bin == off / 2048)
      acc += n
    }
  }
}
