package graft

import org.apache.spark.sql.functions._
import graft.functions.{Dedup, NearDup, Similarity, Text}
import graft.operators.{Frame, Grouped, Sessions}
import Frame._

/** Empty-input behavior: every operator must return an empty result of the
  * right schema, never throw (the reference explicitly short-circuits the
  * empty groupby, `groupby.d:33`; a pipeline stage receiving an empty
  * partition filter result is routine at scale). */
class EmptyInputSpec extends SparkSpec {
  import spark.implicits._

  private lazy val noDocs =
    Seq.empty[(Long, String)].toDF("doc_id", "text")
  private lazy val noRows =
    Seq.empty[(String, Int, Double)].toDF("k", "i", "d")
  private lazy val noVecs =
    Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
  private lazy val noEvents = Seq.empty[Ev].toDF()

  test("core verbs on empty frames") {
    assert(noRows.filterCmp("i", ">", 0).count() == 0)
    assert(noRows.sortAll().count() == 0)
    assert(noRows.distinctSorted().count() == 0)
    assert(Frame.concat(Seq(noRows, noRows)).count() == 0)
    assert(noRows.headN(5).count() == 0)
  }

  test("grouped aggregates on empty frames (reference groupby.d:33 short-circuit)") {
    assert(Grouped.count(noRows, Seq("k")).count() == 0)
    assert(Grouped.sumNumeric(noRows, Seq("k")).count() == 0)
    assert(Grouped.firstRows(noRows, Seq("k"), Seq("i")).count() == 0)
  }

  test("text + dedup operators on an empty corpus") {
    assert(Text.textStats(noDocs).count() == 0)
    assert(Text.langId(noDocs.withColumn("lang", lit("en"))).count() == 0)
    assert(Text.repetitionScore(noDocs).count() == 0)
    assert(Dedup.exactGroups(noDocs).count() == 0)
    assert(NearDup.ngramJaccardPairs(noDocs, 0.5).count() == 0)
    assert(NearDup.minhashPairs(noDocs).count() == 0)
    assert(NearDup.simhashPairs(noDocs).count() == 0)
    assert(NearDup.ngramJaccardPairsAuto(noDocs, 0.5).count() == 0)
    assert(graft.functions.Contamination
      .removeContaminatedSpans(noDocs, noDocs).count() == 0)
    // empty bench -> every doc passes through whole
    val one = Seq((1L, "a b c")).toDF("doc_id", "text")
    assert(graft.functions.Contamination
      .removeContaminatedSpans(one, noDocs, l = 2)
      .select("clean_text").as[String].head() == "a b c")
  }

  test("compression ratio, url dedup, k-anonymity on empty inputs") {
    assert(Text.compressionRatio(noDocs).count() == 0)
    assert(Text.urlDedup(
      Seq.empty[(Long, String)].toDF("doc_id", "url")).count() == 0)
    assert(graft.functions.Privacy
      .kAnonymityProfile(noRows, Seq("k", "i"), k = 3).count() == 0)
    assert(graft.functions.Privacy
      .kAnonymize(noRows, Seq("k", "i"), k = 3).count() == 0)
  }

  test("blocklist screen on empty corpus / empty blocklist") {
    val phrases = Seq("a b").toDF("phrase")
    assert(graft.functions.Blocklist.phraseHits(noDocs, phrases, "phrase")
      .count() == 0)
    val docs = Seq((0L, "a b c d")).toDF("doc_id", "text")
    val got = graft.functions.Blocklist
      .phraseHits(docs, Seq.empty[String].toDF("phrase"), "phrase")
      .as[(Long, Long, Boolean)].collect().toSeq
    assert(got == Seq((0L, 0L, false)))
  }

  test("contamination report on empty corpus / empty benchmark") {
    val docs = Seq((0L, "a b c d")).toDF("doc_id", "text")
    assert(graft.functions.Contamination.report(noDocs, docs).count() == 0)
    assert(graft.functions.Contamination.report(docs, noDocs).count() == 0)
  }

  test("similarity search on an empty corpus / empty query set") {
    val e = Tables.embeddings(spark, sf0001).limit(20)
    assert(Similarity.bruteForceTopK(noVecs, noVecs, "vec_id", "embedding", 5).count() == 0)
    assert(Similarity.bruteForceTopK(e, e.limit(0), "vec_id", "embedding", 5).count() == 0)
    assert(Similarity.lshTopK(e, e.limit(0), "vec_id", "embedding", 5).count() == 0)
    assert(Similarity.embeddingNearDups(noVecs, "vec_id", "embedding", 0.9).count() == 0)
  }

  test("sessionize on an empty event stream") {
    assert(Sessions.sessionize(noEvents.withColumn("value", lit(0.0))
      .select("event_id", "ts", "user_id", "value")).count() == 0)
  }

  test("packing, sampling, shuffle order, and token quota on empty frames") {
    import graft.functions.{Packing, Sampling}
    val noKeyed = Seq.empty[(Long, Long)].toDF("k", "n")
    val packed = Packing.packSequences(noKeyed, col("k"), col("n"), budget = 10L)
    assert(packed.count() == 0)
    assert(packed.columns.toSeq ==
      Seq("k", "n", "n_tokens", "stream_offset", "bin"))
    assert(Packing.binStats(packed, 10L).count() == 0)
    val key = col("i").cast("string")
    assert(Sampling.stratifiedSample(noRows, col("k"), key, 3).count() == 0)
    assert(Sampling.mixtureSample(noRows, col("k"), key, Map("a" -> 0.5), 0.1).count() == 0)
    assert(Sampling.shuffleOrder(noRows, key).count() == 0)
    assert(Sampling.tokenQuota(noRows, col("k"), key, col("i"), 10L).count() == 0)
  }

  test("round-8 operators on empty frames") {
    import graft.functions.{Packing, Profile, Sampling, SemDedup, SubstringDedup}
    import graft.operators.{Funnel, Resample}
    assert(Text.chunkDocs(noDocs, 8, 6).count() == 0)
    assert(Text.gopherRules(noDocs).count() == 0)
    assert(Text.tokensToIds(noDocs, 10).count() == 0)
    assert(SubstringDedup.dupSpanStats(noDocs).count() == 0)
    assert(SubstringDedup.dedupSpansRemoved(noDocs).count() == 0)
    assert(SemDedup.semanticDupPairs(noVecs, "vec_id", "embedding", 0.9).count() == 0)
    assert(Sampling.weightedSample(noRows, col("k"), lit(0.5)).count() == 0)
    assert(Resample.resampleLocf(noEvents.toDF()).count() == 0)
    assert(Funnel.funnel(noEvents.toDF().withColumn("event_type", lit("view")),
      Seq("view", "click")).count() == 0)
    assert(Funnel.retentionCohorts(noEvents.toDF()).count() == 0)
    assert(Grouped.modeOf(noRows, "k", "i").count() == 0)
    assert(graft.functions.Quantiles.winsorize(noEvents.toDF()
      .withColumn("event_type", lit("a")), "event_type", "value").count() == 0)
    assert(Packing.binTexts(
      Packing.packSequences(noDocs.withColumn("n", lit(1L)),
        col("doc_id"), col("n"), 10L), "doc_id", "text").count() == 0)
    val prof = Profile.profile(noRows)
    assert(prof.count() == 3) // one row per column, zero counts
    assert(prof.filter(col("n_rows") =!= 0 || col("n_nulls") =!= 0).count() == 0)
    assert(Profile.categoryDrift(noDocs.withColumn("source", lit("s")), "source", "text")
      .count() == 0)
  }

  test("connected components and range join on empty inputs") {
    import graft.functions.Clusters
    import graft.operators.Joins
    val noNodes = Seq.empty[Long].toDF("id")
    val noEdges = Seq.empty[(Long, Long)].toDF("a", "b")
    assert(Clusters.connectedComponents(noNodes, noEdges, "id", "a", "b").count() == 0)
    val nodes = Seq(1L, 2L).toDF("id")
    assert(Clusters.connectedComponents(nodes, noEdges, "id", "a", "b").count() == 2)
    val noPts = Seq.empty[(Long, Long)].toDF("pid", "p")
    val noIv = Seq.empty[(Long, Long, Long)].toDF("iid", "lo", "hi")
    val iv = Seq((1L, 0L, 10L)).toDF("iid", "lo", "hi")
    assert(Joins.rangeJoin(noPts, iv, "p", "lo", "hi", 8L).count() == 0)
    assert(Joins.rangeJoin(Seq((1L, 5L)).toDF("pid", "p"), noIv,
      "p", "lo", "hi", 8L).count() == 0)
  }

  test("round-10 event analytics on empty event frames") {
    import graft.functions.EventStats
    import graft.operators.{Funnel, Joins}
    val ev = noEvents.toDF().withColumn("event_type", lit("view"))
    assert(EventStats.cumulativeDistinctUsers(ev, "user_id", "ts").count() == 0)
    assert(EventStats.rollingActiveUsers(ev, "user_id", "ts").count() == 0)
    assert(EventStats.transitionCounts(
      ev, "user_id", "event_type", "ts", "event_id").count() == 0)
    assert(EventStats.topPaths(
      ev, "user_id", "event_type", "ts", "event_id").count() == 0)
    // global aggregates still emit their single summary row, with zero
    // counts and null lag/duration stats
    val lag = Funnel.funnelLag(
      ev.withColumn("event_type", lit("view")), Seq("view", "click")).collect()
    assert(lag.length == 1 && lag(0).getLong(2) == 0L && lag(0).isNullAt(3))
    val stats = Sessions.sessionStats(
      ev.withColumn("value", lit(0.0))).collect()
    assert(stats.length == 1 && stats(0).getLong(0) == 0L)
    // as-of variants: empty right side leaves every left row unmatched
    val left = Seq((1L, new java.sql.Timestamp(1000L), 1L))
      .toDF("k", "ts", "v").select("k", "ts", "v")
    val noRight = Seq.empty[(Long, java.sql.Timestamp)].toDF("k", "ts")
    val fwd = Joins.asofJoinForwardWithin(left, noRight, "k", "ts", "nxt", 60L)
      .collect()
    assert(fwd.length == 1 && fwd(0).isNullAt(3))
    // interval overlap: either side empty -> empty result
    val noIv2 = Seq.empty[(Long, Long, Long)].toDF("bid", "b_lo", "b_hi")
    val oneIv = Seq((1L, 0L, 10L)).toDF("aid", "a_lo", "a_hi")
    assert(Joins.intervalOverlapJoin(
      oneIv, noIv2, "a_lo", "a_hi", "b_lo", "b_hi", 8L).count() == 0)
    // per-group quantiles / MAD on empty input -> empty result
    val noKd = Seq.empty[(String, Double)].toDF("g", "v")
    assert(graft.functions.Quantiles
      .groupQuantilesDisc(noKd, "g", "v", Seq(0.5)).count() == 0)
    assert(graft.functions.Quantiles.madOutliers(noKd, "g", "v").count() == 0)
  }

  test("normalization / fingerprint / graph operators on empty frames") {
    import graft.functions.{EventStats, Graph, Normalize, Profile, Text, Winnow}
    val noVal = Seq.empty[(Long, String, Double)].toDF("event_id", "event_type", "value")
    assert(Normalize.zscore(noVal, "event_type", "value", Seq("event_id")).count() == 0)
    assert(Normalize.robustScale(noVal, "event_type", "value", Seq("event_id")).count() == 0)
    assert(Normalize.rankTransform(noVal, "value", Seq("event_id")).count() == 0)
    val noVec = Seq.empty[(Long, Seq[Float])].toDF("vec_id", "embedding")
    assert(Normalize.quantizeInt8(noVec, "vec_id", "embedding").count() == 0)
    val noDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(Text.stopwordFilter(noDocs, 0.1).count() == 0)
    assert(Text.oovRate(noDocs, 10).count() == 0)
    assert(Winnow.fingerprintSummary(noDocs, 8, 4).count() == 0)
    assert(Winnow.overlapPairs(noDocs, 8, 4, 1L).count() == 0)
    val noEdges = Seq.empty[(Long, Long)].toDF("src", "dst")
    assert(Graph.triangleCounts(noEdges, "src", "dst").count() == 0)
    val noEv = noEvents.toDF().withColumn("event_type", lit("view"))
    assert(EventStats.lastTouchAttribution(noEv, "user_id", "event_type",
      "ts", "event_id", "purchase", Seq("view")).count() == 0)
    // activityQuartiles needs ≥1 row to place boundaries: empty fails LOUD
    // (the exactQuantilesGlobal contract), never silently emits garbage
    val thrown = intercept[Exception] {
      EventStats.activityQuartiles(noEv, "user_id").count()
    }
    assert(thrown.getMessage.contains("no non-null values"))
    // giniProfile: per-column summary row survives with empty-marker values
    val gp = Profile.giniProfile(noDocs, Seq("text")).collect()
    assert(gp.length == 1 && gp(0).getLong(1) == 0L)
  }
}
