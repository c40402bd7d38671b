package graft

import org.apache.spark.sql.functions._
import graft.functions.QualityClassifier

/** NB quality classifier ([[graft.functions.QualityClassifier]]): the
  * log-odds must match the closed-form add-one-smoothed multinomial on a
  * hand-counted fixture, frozen-model scoring must give unseen tokens
  * pure smoothing mass, and the verdict must separate engineered
  * good/spam corpora. Oracle parity at sf is `nb_quality_score` /
  * `nb_quality_top` in CORRECTNESS. */
class QualityClassifierSpec extends SparkSpec {
  import spark.implicits._

  private def r6(x: Double) = BigDecimal(x)
    .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  // hand-countable corpus: cnt good=(2,0) fine=(1,0) spam=(0,3) junk=(0,1)
  // N_pos=3, N_neg=4, V=4, prior=ln(2/2)=0
  private def docs = Seq((1L, "good good fine"), (2L, "spam spam spam junk"))
    .toDF("doc_id", "text")
  private def labels = Seq((1L, true), (2L, false)).toDF("doc_id", "pass")

  private val llrGood = math.log(3.0 / 7) - math.log(1.0 / 8)
  private val llrFine = math.log(2.0 / 7) - math.log(1.0 / 8)
  private val llrSpam = math.log(1.0 / 7) - math.log(4.0 / 8)
  private val llrJunk = math.log(1.0 / 7) - math.log(2.0 / 8)

  test("log-odds match the hand-computed smoothed multinomial") {
    val m = QualityClassifier.train(docs, labels)
    assert((m.nPos, m.nNeg, m.vocab) == ((3L, 4L, 4L)))
    assert(m.priorLogOdds == 0.0)
    val got = QualityClassifier.scoreWith(m, docs)
      .as[(Long, Long, Double, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(1L) == ((3L, r6(2 * llrGood + llrFine), true)))
    assert(got(2L) == ((4L, r6(3 * llrSpam + llrJunk), false)))
  }

  test("frozen model: unseen tokens score pure smoothing mass") {
    val m = QualityClassifier.train(docs, labels)
    val drift = Seq((9L, "novel novel")).toDF("doc_id", "text")
    val got = QualityClassifier.scoreWith(m, drift)
      .as[(Long, Long, Double, Boolean)].collect()
    // each unseen token: ln(1/7) - ln(1/8) = ln(8/7)
    assert(got.toSeq == Seq((9L, 2L, r6(2 * math.log(8.0 / 7)), true)))
  }

  test("pred is derived from the rounded log-odds; score is partitioning-invariant") {
    val base = QualityClassifier.score(corpus).collect()
    base.foreach(r => assert(r.getBoolean(3) == (r.getDouble(2) > 0)))
    assert(QualityClassifier.score(corpus.repartition(7)).collect().toSet ==
      base.toSet)
  }

  test("empty labeled corpus fails loudly, never trains a degenerate model") {
    val e = intercept[IllegalArgumentException](
      QualityClassifier.train(docs.filter(col("doc_id") < 0), labels))
    assert(e.getMessage.contains("no labeled tokens"))
  }

  // engineered corpus where the Gopher rules split cleanly: good docs are
  // 16 alpha tokens with stopwords; spam docs fail alpha_frac (digits)
  private def corpus = {
    val good = (1L to 6L).map { i =>
      (i, s"the a of report item$i " + (1 to 10).map(j => s"word$j").mkString(" "))
    }
    val spam = (7L to 12L).map { i =>
      (i, (1 to 16).map(j => s"$j$j$j").mkString(" "))
    }
    (good ++ spam).toDF("doc_id", "text")
  }

  test("self-trained verdict separates engineered good from spam docs") {
    val got = QualityClassifier.score(corpus)
      .as[(Long, Long, Double, Boolean)].collect()
      .map(r => r._1 -> r._4).toMap
    (1L to 6L).foreach(i => assert(got(i), s"doc $i should score quality"))
    (7L to 12L).foreach(i => assert(!got(i), s"doc $i should score spam"))
  }

  test("topTokens: rounded-llr descending, token tie-break, k-bounded") {
    val top = QualityClassifier.topTokens(corpus, 5).collect()
    assert(top.length == 5)
    val keys = top.map(r => (-r.getDouble(3), r.getString(0))).toSeq
    assert(keys == keys.sorted, "must be sorted")
    // stopwords only appear in quality docs -> positive llr at the top
    assert(top.head.getDouble(3) > 0)
  }

  test("calibration: bins partition the scored corpus, rates and means stay in-bin") {
    val rows = QualityClassifier.calibration(corpus, bins = 10).collect()
    assert(rows.nonEmpty)
    val total = QualityClassifier.score(corpus).count()
    assert(rows.map(_.getLong(1)).sum == total,
      "bin counts must partition the scored docs")
    rows.foreach { r =>
      val (bin, n, nPos, mp, rate) = (r.getInt(0), r.getLong(1),
        r.getLong(2), r.getDouble(3), r.getDouble(4))
      assert(bin >= 0 && bin <= 9)
      assert(nPos <= n)
      assert(rate >= 0.0 && rate <= 1.0)
      // mean predicted p must lie inside its decile (bin 9 absorbs p=1.0)
      assert(mp >= bin / 10.0 - 1e-9 &&
        mp <= (if (bin == 9) 1.0 else (bin + 1) / 10.0) + 1e-9,
        s"bin $bin mean_pred $mp escaped its decile")
    }
    // the classifier separates this corpus: the top-decile bin must be
    // purer than the bottom one
    val byBin = rows.map(r => r.getInt(0) -> r).toMap
    val lo = byBin.minBy(_._1)._2
    val hi = byBin.maxBy(_._1)._2
    assert(hi.getDouble(4) >= lo.getDouble(4),
      "observed positive rate must not invert across extreme bins")
  }
}
