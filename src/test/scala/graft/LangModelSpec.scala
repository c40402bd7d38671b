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

  test("perplexityKn matches the hand-computed interpolated KN values") {
    // c2: (a,b)=3, (b,a)=1; ctx: a=(3 tot, 1 distinct), b=(1, 1);
    // cont: a=1, b=1; types T=2; V=3; D=0.75
    // Pcont(a)=Pcont(b)=(1+1)/(2+3)=0.4
    // P(b|a)=(max(3-.75,0)+.75*1*.4)/3=0.85; P(a|b)=(.25+.3)/1=0.55
    val got = LangModel.perplexityKn(docs)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val (pAB, pBA) = (math.log(0.85), math.log(0.55))
    assert(got(1L) == ((3L, r6(math.exp(-(2 * pAB + pBA) / 3)))))
    assert(got(2L) == ((1L, r6(math.exp(-pAB)))))
    assert(!got.contains(3L))
  }

  test("frozen KN model: unseen bigram, context, and word all score mass") {
    val lm = LangModel.trainKn(docs)
    val held = Seq(
      (10L, "a z"), // seen context a, unseen continuation z
      (11L, "z a"), // unseen context z -> pure continuation back-off
      (12L, "q z") // nothing seen anywhere
    ).toDF("doc_id", "text")
    val got = LangModel.scoreWithKn(lm, held)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // Pcont(z)=Pcont(q)=(0+1)/(2+3)=0.2; Pcont(a)=0.4
    assert(got(10L) == r6(1.0 / ((0.75 * 1 * 0.2) / 3))) // (0 + D*nf*Pcont)/n1
    assert(got(11L) == r6(1.0 / 0.4))
    assert(got(12L) == r6(1.0 / 0.2))
    lm.unpersist()
  }

  test("KN conditionals sum to exactly 1 over the vocabulary, per context") {
    // Proper-distribution identity of the estimator: Σ_{w2∈V} Pcont'(w2)
    // = (T + V)/(T + V) = 1, so for a seen context the discounted mass
    // D·nf exactly funds the continuation spend —
    // Σ P(w2|w1) = [(n1 - D·nf) + D·nf·1]/n1 = 1 — and an unseen
    // context's pure back-off sums to 1 trivially. A smoothing bug
    // (wrong floor, wrong normalizer) breaks this equality.
    val lm = LangModel.trainKn(docs)
    val c2 = lm.counts.as[(String, String, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    val ctx = lm.contexts.as[(String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    val cont = lm.cont.as[(String, Long)].collect().toMap
    val tv = (lm.bigramTypes + lm.vocab).toDouble
    val vocabWords = Seq("a", "b", "x")
    def pcont(w2: String) = (cont.getOrElse(w2, 0L) + 1).toDouble / tv
    assert(math.abs(vocabWords.map(pcont).sum - 1.0) < 1e-12)
    for ((w1, (n1, nf)) <- ctx) {
      val total = vocabWords.map { w2 =>
        (math.max(c2.getOrElse((w1, w2), 0L) - 0.75, 0.0) +
          0.75 * nf * pcont(w2)) / n1
      }.sum
      assert(math.abs(total - 1.0) < 1e-12, s"context $w1 mass $total != 1")
    }
    lm.unpersist()
  }

  test("perplexityKn is invariant to input partitioning") {
    val base = LangModel.perplexityKn(docs).collect().toSet
    assert(LangModel.perplexityKn(docs.repartition(7)).collect().toSet == base)
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

  test("tiers under a ModelStore-published bigram LM equal the in-JVM tiers " +
    "(the perplexity_tiers_served topology)") {
    val many = (1L to 30L).map { i =>
      val body = (0 until 8).map(j => s"w${(i * (j + 1)) % (3 + i % 9)}")
      (i, body.mkString(" "))
    }.toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("lm_tiers_served")
      .toString + "/m"
    graft.functions.ModelStore.saveBigram(LangModel.train(many), dir)
    val served = LangModel.perplexityTiersOf(
      LangModel.scoreWith(
        graft.functions.ModelStore.loadBigram(spark, dir), many))
    assert(rows(served) == rows(LangModel.perplexityTiers(many)),
      "published-model tier summary diverged from the in-JVM one")
  }

  test("cross-handle cold serve: a SECOND fresh loadBigram from a " +
    "pre-existing dir — no publish in that 'session' — is tier-identical " +
    "(the versioned-artifact topology perplexity_tiers_served claims)") {
    val many = (1L to 30L).map { i =>
      val body = (0 until 8).map(j => s"w${(i * (j + 1)) % (3 + i % 9)}")
      (i, body.mkString(" "))
    }.toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("lm_tiers_cold")
      .toString + "/m"
    // "session 1": train + publish + serve (the build path)
    graft.functions.ModelStore.saveBigram(LangModel.train(many), dir)
    val manifest = java.nio.file.Paths.get(s"$dir/_MODEL")
    val publishedBytes = java.nio.file.Files.readAllBytes(manifest)
    val first = rows(LangModel.perplexityTiersOf(
      LangModel.scoreWith(
        graft.functions.ModelStore.loadBigram(spark, dir), many)))
    // "session 2": a COLD load of the pre-existing artifact — a fresh
    // handle resolved purely from the on-disk manifest, never the
    // trainer (the recurring-tiering-job topology: score + tier under
    // the versioned LM, no retrain, no republish)
    val cold = graft.functions.ModelStore.loadBigram(spark, dir)
    val second = rows(LangModel.perplexityTiersOf(
      LangModel.scoreWith(cold, many)))
    assert(second == first,
      "a cold cross-handle load served different tiers than the " +
        "publishing session")
    assert(java.util.Arrays.equals(
      java.nio.file.Files.readAllBytes(manifest), publishedBytes),
      "a cold load must never republish or mutate the model manifest")
  }
}
