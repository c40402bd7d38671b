package graft

import org.apache.spark.sql.functions._
import graft.functions.{Doremi, LangModel}

/** DoReMi-style domain reweighting ([[graft.functions.Doremi]]): weights
  * must be a normalized tilt of the baseline token shares, clip at the
  * corpus mean (at-or-below-mean domains keep exactly their baseline
  * ratio against each other), move share toward the hardest domain, and
  * be partitioning-invariant. Oracle parity at sf is `domain_reweight`
  * in CORRECTNESS. */
class DoremiSpec extends SparkSpec {
  import spark.implicits._

  /** Three domains: `tmpl` is a highly repetitive template domain (low
    * ppl), `mid` mixed, `rare` each doc over near-unique vocab (high
    * ppl). */
  private def docs = {
    val tmpl = (1L to 8L).map(i => (i, "a b a b a b a b", "tmpl"))
    val mid = (9L to 16L).map(i => (i, s"a b c${i % 4} a b c${i % 3}", "mid"))
    val rare = (17L to 24L).map(i => (i, s"u$i v$i w$i x$i y$i z$i", "rare"))
    (tmpl ++ mid ++ rare).toDF("doc_id", "text", "source")
  }

  test("weights normalize, clip at corpus mean, and tilt toward the hardest domain") {
    val got = Doremi.domainReweight(docs, "source")
      .as[(String, Long, Long, Double, Double, Double, Double)]
      .collect().map(r => r._1 -> r).toMap
    assert(got.keySet == Set("tmpl", "mid", "rare"))
    val wsum = got.values.map(_._7).sum
    assert(math.abs(wsum - 1.0) < 1e-5, s"weights must sum to 1, got $wsum")
    val bsum = got.values.map(_._4).sum
    assert(math.abs(bsum - 1.0) < 1e-5, s"base shares must sum to 1, got $bsum")
    // the template domain is easiest (lowest mean nll), rare hardest
    assert(got("tmpl")._5 < got("mid")._5 && got("mid")._5 < got("rare")._5)
    // clipping: the easiest domain is below corpus mean -> excess 0, and
    // its weight can only LOSE share vs baseline (normalization)
    assert(got("tmpl")._6 == 0.0)
    assert(got("tmpl")._7 < got("tmpl")._4)
    // the hardest domain gains share over its baseline
    assert(got("rare")._7 > got("rare")._4)
    // weight ratio equals base ratio tilted by exp(excess diff)
    val lhs = got("rare")._7 / got("mid")._7
    val rhs = (got("rare")._3.toDouble / got("mid")._3) *
      math.exp(got("rare")._6 - got("mid")._6)
    assert(math.abs(lhs - rhs) < 1e-4, s"tilt identity: $lhs vs $rhs")
  }

  test("high temperature recovers the baseline mixture") {
    val got = Doremi.domainReweight(docs, "source", temperature = 1e9)
      .as[(String, Long, Long, Double, Double, Double, Double)].collect()
    got.foreach(r => assert(math.abs(r._7 - r._4) < 1e-5,
      s"domain ${r._1}: weight ${r._7} must approach base ${r._4}"))
  }

  test("token accounting matches the LM's scored-bigram counts") {
    val scored = LangModel.perplexity(docs).agg(sum(col("n_bigrams")))
      .collect()(0).getLong(0)
    val got = Doremi.domainReweight(docs, "source")
      .agg(sum(col("n_tokens"))).collect()(0).getLong(0)
    assert(got == scored)
  }

  test("reweighting is invariant to input partitioning") {
    val base = Doremi.domainReweight(docs, "source").collect().toSeq
    assert(Doremi.domainReweight(docs.repartition(7), "source")
      .collect().toSeq == base)
  }

  test("epochPlan: caps bind, floors are exact, achieved shares renormalize to 1") {
    val got = Doremi.epochPlan(docs, "source", budgetFactor = 2.0, maxEpochs = 4.0)
      .as[(String, Long, Double, Double, Double, Long, Double)]
      .collect().map(r => r._1 -> r).toMap
    assert(got.keySet == Set("tmpl", "mid", "rare"))
    got.values.foreach { case (dom, nTok, _, epochs, eff, effTok, _) =>
      assert(eff <= 4.0 + 1e-12, s"$dom: cap violated ($eff)")
      assert(eff <= epochs + 1e-12, s"$dom: eff_epochs exceeds implied epochs")
      assert(effTok == math.floor(eff * nTok).toLong,
        s"$dom: eff_tokens must be the exact floor")
    }
    val shares = got.values.map(_._7).sum
    assert(math.abs(shares - 1.0) < 1e-5, s"achieved shares must sum to 1: $shares")
  }

  test("epochPlan: with no binding cap, achieved share recovers the mixture weight") {
    val got = Doremi.epochPlan(docs, "source", budgetFactor = 1.0, maxEpochs = 1e9)
      .as[(String, Long, Double, Double, Double, Long, Double)].collect()
    got.foreach { case (dom, _, w, epochs, eff, _, share) =>
      assert(epochs == eff, s"$dom: cap must not bind at maxEpochs=1e9")
      // eff_tokens = floor(epochs * n_tokens) ≈ weight * budget, so the
      // renormalized share returns the weight up to the floor's ±1-token
      // quantization — on this ~150-token fixture that's ~1/150 per domain
      assert(math.abs(share - w) < 0.01, s"$dom: share $share vs weight $w")
    }
  }

  test("reweightedSample: the realized mixture approaches the DoReMi weights end-to-end") {
    import org.apache.spark.sql.DataFrame
    // 3000 easy template docs vs 1500 hard near-unique-vocab docs: the
    // LM upweights `hard`, so the sample must thin `easy` toward the
    // reweighted shares — the full planning->execution composition
    val easy = spark.range(3000).select(col("id").as("doc_id"),
      lit("a b a b a b a b").as("text"), lit("easy").as("source"))
    val hard = spark.range(1500).select((col("id") + 10000L).as("doc_id"),
      concat(lit("u"), col("id"), lit(" v"), col("id"), lit(" w"), col("id"),
        lit(" x"), col("id"), lit(" y"), col("id")).as("text"),
      lit("hard").as("source"))
    val corpus: DataFrame = easy.unionByName(hard)
    val weights = Doremi.domainReweight(corpus, "source")
      .select(col("domain"), col("weight"))
      .as[(String, Double)].collect().toMap
    assert(weights("hard") > 0.4, s"fixture must upweight hard: $weights")
    val sampled = Doremi.reweightedSample(
        corpus, "source", col("doc_id").cast("string"))
      .groupBy(col("source")).count()
      .as[(String, Long)].collect().toMap
    val total = sampled.values.sum.toDouble
    weights.foreach { case (dom, w) =>
      val realized = sampled.getOrElse(dom, 0L) / total
      assert(math.abs(realized - w) < 0.05,
        s"$dom: realized share $realized vs planned weight $w")
    }
    // the binding stratum keeps everything (targetMixture's max-data rule)
    assert(sampled("hard") == 1500L || sampled("easy") == 3000L,
      s"one stratum must keep all rows: $sampled")
  }

  test("epochPlan: a hard domain under a tight budget needs more epochs than its base share") {
    val got = Doremi.epochPlan(docs, "source", budgetFactor = 8.0, maxEpochs = 100.0)
      .as[(String, Long, Double, Double, Double, Long, Double)]
      .collect().map(r => r._1 -> r).toMap
    // rare is upweighted, so at 8x budget its implied epochs exceed 8
    assert(got("rare")._4 > 8.0, s"rare epochs ${got("rare")._4}")
    assert(got("tmpl")._4 < 8.0, s"tmpl epochs ${got("tmpl")._4}")
  }
}
