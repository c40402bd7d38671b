package graft

import org.apache.spark.sql.functions._
import graft.functions.{Contamination, CorpusClean, Dedup, NearDup}

/** Corpus-cleaning composition: the survivor set must honor each of the
  * four criteria it is built from (full value parity vs DuckDB is the
  * `corpus_clean` oracle's job; this pins the set algebra). */
class CorpusCleanSpec extends SparkSpec {

  test("survivors honor quality, keeper, near-dup, and contamination criteria") {
    val docs = Tables.documents(spark, sf0001)
    val bench = docs.filter(col("doc_id") < 10)
    val out = CorpusClean.surviving(docs, bench).collect()
    val ids = out.map(_.getLong(0)).toSet
    assert(ids.nonEmpty, "cleaning must not empty the corpus")
    assert(out.forall(_.getDouble(1) >= 0.3), "a low-quality doc survived")
    val keepers = Dedup.exactGroups(docs)
      .select(col("keep_id")).collect().map(_.getLong(0)).toSet
    assert(ids.subsetOf(keepers), "a non-keeper exact duplicate survived")
    val ndDrop = NearDup.ngramJaccardPairs(docs, 0.5)
      .select(col("id_b")).collect().map(_.getLong(0)).toSet
    assert(ids.intersect(ndDrop).isEmpty, "a near-dup id_b survived")
    val contam = Contamination.report(docs, bench)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(ids.intersect(contam).isEmpty, "a contaminated doc survived")
  }

  test("funnel: attribution counts are consistent and pin the survivor count") {
    val docs = Tables.documents(spark, sf0001)
    val bench = docs.filter(col("doc_id") < 10)
    val rows = CorpusClean.funnel(docs, bench).collect()
    assert(rows.map(_.getInt(0)).toSeq == Seq(1, 2, 3, 4))
    assert(rows.map(_.getString(1)).toSeq ==
      Seq("quality", "exact_dup", "near_dup", "contamination"))
    val total = docs.count()
    rows.foreach { r =>
      val (nf, nu, nc) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(nu <= nf, s"stage ${r.getInt(0)}: unique $nu exceeds total fail $nf")
      assert(nf <= total && nc <= total)
    }
    // the funnel curve is monotone non-increasing
    val cum = rows.map(_.getLong(4)).toSeq
    assert(cum == cum.sorted.reverse, s"funnel must shrink monotonically: $cum")
    // ... and its last point is exactly the surviving() count
    assert(cum.last == CorpusClean.surviving(docs, bench).count(),
      "funnel tail must equal the survivor pipeline's count")
    // stage-1 cumulative + stage-1 fails account for the whole corpus
    assert(rows(0).getLong(2) + rows(0).getLong(4) == total)
  }

  test("property: funnel counters equal the set algebra over the component rule sets") {
    import spark.implicits._
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val pool = Vector("the", "a", "of", "and", "to", "xx", "yy", "zz",
      "qq", "ww", "9")
    val genDoc = Gen.listOfN(6, Gen.choose(0, pool.size - 1))
      .map(_.map(pool).mkString(" "))
    val gen = Gen.listOfN(30, genDoc)
    for (seed <- 1 to 3) {
      val texts = gen.pureApply(Gen.Parameters.default, Seed(seed.toLong))
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val bench = docs.filter(col("doc_id") < 3)
      // independent per-rule fail sets from the component operators
      val all = (0L until 30L).toSet
      val fq = all -- graft.functions.Text.qualityScore(docs)
        .filter(col("quality") >= 0.3)
        .select("doc_id").as[Long].collect().toSet
      val fx = all -- graft.functions.Dedup.exactGroups(docs)
        .select(col("keep_id")).as[Long].collect().toSet
      val fn = graft.functions.NearDup.ngramJaccardPairs(docs, 0.5)
        .select(col("id_b")).as[Long].collect().toSet
      val fc = graft.functions.Contamination.report(docs, bench)
        .select(col("doc_id")).as[Long].collect().toSet
      val fails = Seq(fq, fx, fn, fc)
      val got = CorpusClean.funnel(docs, bench).collect()
        .map(r => r.getInt(0) -> ((r.getLong(2), r.getLong(3), r.getLong(4))))
        .toMap
      fails.zipWithIndex.foreach { case (f, i) =>
        val others = fails.zipWithIndex.collect {
          case (o, j) if j != i => o }.reduce(_ ++ _)
        val cum = all -- fails.take(i + 1).reduce(_ ++ _)
        assert(got(i + 1) == ((f.size.toLong, (f -- others).size.toLong,
          cum.size.toLong)),
          s"seed $seed stage ${i + 1}: ${got(i + 1)} vs set algebra")
      }
    }
  }
}
