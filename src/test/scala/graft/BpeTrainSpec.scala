package graft

import org.apache.spark.sql.functions._
import graft.functions.{BpeTrain, Text}

/** Distributed BPE training ([[graft.functions.BpeTrain]]) — hand-checked
  * merge sequences, equivalence with the driver-side trainer
  * ([[Text.bpeMerges]]), overlap semantics of the merge pass, rebase
  * path, exhaustion, and layout invariance. Oracle parity at sf is
  * `bpe_train` in CORRECTNESS. */
class BpeTrainSpec extends SparkSpec {
  import spark.implicits._

  private def train(texts: Seq[String], k: Int, ckpt: Int = 16) =
    BpeTrain.learnedMerges(
      texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text"),
      col("text"), k, ckpt)
      .as[(Int, String, String, Long)].collect().toSeq

  test("hand-checked merge sequence with deterministic tie-break") {
    // words: low x2, lowest x1. (l,o) and (o,w) both count 3 — the
    // lexicographically smaller left symbol wins; then the merged
    // symbol participates in later merges
    val got = train(Seq("low low", "lowest"), 3)
    assert(got === Seq(
      (1, "l", "o", 3L),
      (2, "lo", "w", 3L),
      (3, "low", "</w>", 2L)))
  }

  test("merge pass takes all non-overlapping occurrences left-to-right") {
    // word 'aaaa': pairs (a,a) x3 -> merge 1 = (a,a). Applied left-to-
    // right it must yield [aa, aa, </w>] (a boundary-sharing replace
    // would leave [aa, a, a, </w>] and change every later count)
    val got = train(Seq("aaaa"), 3)
    assert(got === Seq(
      (1, "a", "a", 3L),
      (2, "aa", "</w>", 1L),
      (3, "aa", "aa</w>", 1L)))
  }

  test("matches the driver-side trainer on a shared corpus") {
    val texts = Seq(
      "the cat sat on the mat", "the dog sat on the log",
      "a cat and a dog", "mats and logs", "the the the")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val dist = train(texts, 10).map { case (_, a, b, _) => (a, b) }
    val drv = Text.bpeMerges(df, nMerges = 10)
    assert(dist === drv)
  }

  test("rebase path: checkpointEvery does not change the result") {
    val texts = Seq("banana bandana", "ban ban banana", "an anna")
    assert(train(texts, 8, ckpt = 2) === train(texts, 8, ckpt = 1000))
  }

  test("exhaustion stops early with fewer merges than requested") {
    // 'ab': (a,b) then (ab,</w>) fully merge the only word
    val got = train(Seq("ab"), 10)
    assert(got === Seq((1, "a", "b", 1L), (2, "ab", "</w>", 1L)))
  }

  test("merges are partition-invariant") {
    val df = (1L to 40L).map(i => (i, s"tok${i % 7} tok${i % 5} x${i % 3}"))
      .toDF("doc_id", "text")
    val a = BpeTrain.learnedMerges(df.repartition(1), col("text"), 6)
      .collect().map(_.toSeq).toSeq
    val b = BpeTrain.learnedMerges(df.repartition(13), col("text"), 6)
      .collect().map(_.toSeq).toSeq
    assert(a === b)
  }

  test("learned merges drive the encode kernel") {
    val texts = Seq("low low lower", "lowest low")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val merges = train(texts, 4).map { case (_, a, b, _) => (a, b) }
    val decoded = df
      .select(Text.bpeDecode(Text.bpeEncode(col("text"), merges)).as("t"))
      .as[String].collect().toSeq
    assert(decoded === texts)
  }
}
