package graft

import org.apache.spark.sql.functions._
import graft.functions.{Text, UnigramTrain}

/** Unigram-LM tokenizer ([[graft.plans.Unigram]] +
  * [[graft.functions.UnigramTrain]]): Viterbi max-likelihood
  * segmentation with the tie-break contract, the char fallback, the
  * decode∘encode ≡ id contract (the `bpe_roundtrip`-mirroring property
  * sweep), and hard-EM training determinism. Oracle parity at sf is
  * `unigram_train` / `unigram_tokenize` / `unigram_roundtrip` in
  * CORRECTNESS. */
class UnigramSpec extends SparkSpec {
  import spark.implicits._

  private def docs(texts: String*) =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")

  private def encodePieces(
      text: String, pieces: Seq[(String, Double)]): Seq[String] =
    docs(text).select(Text.unigramEncode(col("text"), pieces).as("p"))
      .as[Seq[String]].collect().head

  test("single-char vocab → characters plus end-of-word markers") {
    val v = Seq("a" -> 0.4, "b" -> 0.3, "c" -> 0.3)
    assert(encodePieces("ab c", v) == Seq("a", "b", "</w>", "c", "</w>"))
  }

  test("viterbi picks the max-likelihood segmentation, not greedy-longest") {
    // "abc": greedy-longest would take "ab"+"c" (0.2·0.1 = 0.02);
    // max-likelihood is "a"+"bc" (0.3·0.3 = 0.09)
    val v = Seq("a" -> 0.3, "b" -> 0.05, "c" -> 0.1, "ab" -> 0.2, "bc" -> 0.3)
    assert(encodePieces("abc", v) == Seq("a", "bc", "</w>"))
  }

  test("product ties break to fewer pieces, then lexicographic sequence") {
    // "aa": "aa" (0.25) ties "a"+"a" (0.5·0.5) — fewer pieces wins
    val v1 = Seq("a" -> 0.5, "aa" -> 0.25)
    assert(encodePieces("aa", v1) == Seq("aa", "</w>"))
    // "ab": "a"+"b" ties "ab"+nothing? no — construct an equal-np tie:
    // "abab" under {ab: p, a: q, b: r} with pq? keep it simple:
    // "ab" as ("a","b") vs ("ab") — np 1 < np 2, single piece wins
    val v2 = Seq("a" -> 0.5, "b" -> 0.5, "ab" -> 0.25)
    assert(encodePieces("ab", v2) == Seq("ab", "</w>"))
  }

  test("unsegmentable word falls back to one piece per character") {
    val v = Seq("a" -> 0.6, "ab" -> 0.4) // no way to cover 'x'
    assert(encodePieces("axb", v) == Seq("a", "x", "b", "</w>"))
  }

  test("unsegmentable supplementary-plane word falls back per CODE POINT") {
    val v = Seq("a" -> 1.0) // cannot cover the emoji → fallback path
    assert(encodePieces("a😀b", v) ==
      Seq("a", "😀", "b", "</w>"),
      "fallback must not split surrogate pairs")
  }

  test("decode∘encode ≡ id — incl. empty text, space runs, unseen chars") {
    val model = UnigramTrain.learnedPieces(
      docs("the cat sat on the mat the cat"), col("text"), vocabSize = 64)
    val pieces = UnigramTrain.pieceTable(model)
    val samples = Seq("the cat sat", "", " ", "a  b", "tail ", " lead",
      "unseen words zq", "the the the")
    val got = docs(samples: _*)
      .select(col("doc_id"),
        Text.bpeDecode(Text.unigramEncode(col("text"), pieces)).as("rt"))
      .orderBy(col("doc_id")).as[(Long, String)].collect().map(_._2).toSeq
    assert(got == samples)
  }

  test("roundtrip property sweep over generated texts (bpe_roundtrip mirror)") {
    val rnd = new scala.util.Random(20260815)
    val alphabet = "abcde "
    val samples = (1 to 200).map { _ =>
      (0 until rnd.nextInt(30)).map(_ =>
        alphabet(rnd.nextInt(alphabet.length))).mkString
    }
    val model = UnigramTrain.learnedPieces(
      docs(samples.take(50): _*), col("text"), vocabSize = 64)
    val pieces = UnigramTrain.pieceTable(model)
    val got = docs(samples: _*)
      .select(col("doc_id"),
        Text.bpeDecode(Text.unigramEncode(col("text"), pieces)).as("rt"))
      .orderBy(col("doc_id")).as[(Long, String)].collect().map(_._2).toSeq
    assert(got == samples)
  }

  test("training is deterministic and alphabet-closed") {
    val corpus = docs(Seq.fill(20)("low").mkString(" "),
      Seq.fill(10)("lowest").mkString(" "), Seq.fill(5)("newer").mkString(" "))
    val m1 = UnigramTrain.pieceTable(
      UnigramTrain.learnedPieces(corpus, col("text"), vocabSize = 32))
    val m2 = UnigramTrain.pieceTable(
      UnigramTrain.learnedPieces(corpus, col("text"), vocabSize = 32))
    assert(m1 == m2)
    assert(m1.nonEmpty && m1.size <= 32)
    // every piece the EM kept must explain some corpus word; probs are
    // round-6, positive, and sum to ≤ 1 (pruning never renormalizes)
    assert(m1.forall { case (_, p) => p > 0 && p <= 1 })
    assert(m1.map(_._2).sum <= 1.0 + 1e-9)
  }

  test("EM drops pieces the corpus never uses as a best explanation") {
    // a corpus of pure repetition: "ababab"... the 'ab' piece should
    // dominate and single chars should lose their counts
    val corpus = docs(Seq.fill(30)("abab").mkString(" "))
    val m = UnigramTrain.pieceTable(
      UnigramTrain.learnedPieces(corpus, col("text"), vocabSize = 64))
    val best = m.maxBy(_._2)
    assert(best._1 == "abab" || best._1 == "ab",
      s"expected the repeated block to dominate, got $m")
  }

  test("fixture pieces load, and roundtrip holds corpus-wide at sf0.001") {
    val pieces = Text.fixturePieces
    assert(pieces.nonEmpty && pieces.size <= 512)
    assert(pieces.forall { case (p, pr) => p.nonEmpty && pr > 0 })
    val corpus = spark.read.parquet(s"$sf0001/documents.parquet")
    val bad = corpus.select(col("doc_id"), col("text"),
        Text.bpeDecode(Text.unigramEncode(col("text"), pieces)).as("rt"))
      .filter(col("rt") =!= col("text")).count()
    assert(bad == 0L, "fixture roundtrip must hold for every corpus doc")
  }

  test("sf0.001 corpus words never hit the char fallback under the fixture") {
    // every distinct corpus word must be exactly segmentable — the
    // precondition the SQL oracle's COALESCE fallback never fires under
    val pieces = Text.fixturePieces
    val table = Text.fixturePieces.toMap
    val words = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "").distinct().as[String].collect()
    val t = new graft.plans.Unigram.Table(pieces)
    words.foreach { w =>
      val segd = graft.plans.Unigram.viterbi(w, t)
      assert(segd.mkString("") == w)
      // reconstructible AND every piece is in-vocab (no fallback chars)
      assert(segd.forall(table.contains),
        s"word '$w' fell back to chars: ${segd.toSeq}")
    }
  }
}
