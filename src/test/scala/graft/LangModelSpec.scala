package graft

import org.apache.spark.sql.functions._
import graft.functions.LangModel

/** Corpus-trained bigram LM ([[graft.functions.LangModel]]): perplexity
  * must match the closed-form add-one-smoothed value on a hand-counted
  * fixture, be partitioning-invariant, and the CCNet tiers must be a
  * value-ordered partition of the scored corpus. Oracle parity at sf is
  * `ngram_perplexity` / `perplexity_tiers` in CORRECTNESS. */
class LangModelSpec extends SparkSpec {
  import spark.implicits._

  // c2: (a,b)=3, (b,a)=1; c1: a=3, b=1; V={a,b,x}=3
  private def docs = Seq(
    (1L, "a b a b"),
    (2L, "a b"),
    (3L, "x")).toDF("doc_id", "text")

  test("perplexity matches the hand-computed smoothed bigram LM") {
    val got = LangModel.perplexity(docs)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    val pAB = math.log(4.0 / 6.0) // (3+1)/(3+3)
    val pBA = math.log(2.0 / 4.0) // (1+1)/(1+3)
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(1L) == ((3L, r6(math.exp(-(2 * pAB + pBA) / 3)))))
    assert(got(2L) == ((1L, r6(math.exp(-pAB)))))
    // a one-token doc has no bigram and carries no LM evidence
    assert(!got.contains(3L))
  }

  test("perplexity is invariant to input partitioning") {
    val base = LangModel.perplexity(docs).collect().toSet
    assert(LangModel.perplexity(docs.repartition(7)).collect().toSet == base)
  }

  test("tiers are a value-ordered partition of the scored corpus") {
    // 30 docs over a shared vocab with varying repetitiveness
    val many = (1L to 30L).map { i =>
      val body = (0 until 8).map(j => s"w${(i * (j + 1)) % (3 + i % 9)}")
      (i, body.mkString(" "))
    }.toDF("doc_id", "text")
    val scored = LangModel.perplexity(many)
    val tiers = LangModel.perplexityTiers(many)
      .as[(String, Long, Double, Double)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4))).toMap
    assert(tiers.values.map(_._1).sum == scored.count())
    // ordering: head ends at or below middle's start, middle below tail
    for {
      (loTier, hiTier) <- Seq(("head", "middle"), ("middle", "tail"))
      l <- tiers.get(loTier); h <- tiers.get(hiTier)
    } assert(l._3 <= h._2, s"$loTier max must be <= $hiTier min")
    // tier bounds really are the min/max of member ppls
    val all = scored.select(col("ppl")).as[Double].collect().sorted
    assert(tiers.values.map(_._2).min == all.head)
    assert(tiers.values.map(_._3).max == all.last)
  }
}
