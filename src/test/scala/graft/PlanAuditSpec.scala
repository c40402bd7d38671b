package graft

/** Fleet-wide plan audit: every registered query's physical plan is checked
  * for the anti-patterns that kill a 100× scale-up — cartesian products
  * (outside the explicitly-broadcast brute-force similarity baseline) and
  * unbatched (non-columnar) parquet scans. A cheap tripwire so a future
  * operator can't silently regress into an O(n²) or row-at-a-time plan.
  */
class PlanAuditSpec extends SparkSpec {

  private val allowCartesian = Set(
    // brute-force top-k IS a deliberate broadcast nested-loop baseline
    "sim_topk"
  )

  test("no query plans a CartesianProduct") {
    val offenders = Queries.all.flatMap { q =>
      val p = q.fn(spark, sf0001).queryExecution.executedPlan.toString()
      if (p.contains("CartesianProduct") && !allowCartesian(q.name)) Some(q.name)
      else None
    }
    assert(offenders.isEmpty, s"cartesian products in: $offenders")
  }

  test("every parquet scan is columnar-batched") {
    val offenders = Queries.all.flatMap { q =>
      val p = q.fn(spark, sf0001).queryExecution.executedPlan.toString()
      if (p.contains("Scan parquet") && p.contains("Batched: false")) Some(q.name)
      else None
    }
    assert(offenders.isEmpty, s"non-columnar scans in: $offenders")
  }

  test("near-dup verify joins never broadcast the O(docs) tables when large") {
    // The verify-side tables (minhash signatures, shingle arrays) are
    // O(docs) — unbounded at 100 TB. The broadcast hint is gated on a size
    // estimate vs autoBroadcastJoinThreshold; with broadcasting disabled
    // (the stand-in for "table bigger than threshold") the static plan must
    // contain NO BroadcastExchange — the verify joins shuffle on doc_id.
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val old = spark.conf.get(key)
    spark.conf.set(key, "-1")
    try {
      val docs = Tables.documents(spark, sf0001)
      // threshold 0.6 (not the registered 0.5): the shared pairs cache
      // registers the 0.5 plan with the CacheManager, which would swap an
      // InMemoryRelation (frozen with broadcasts ON) into this plan
      val plans = Seq(
        "dedup_minhash" -> functions.NearDup.minhashPairs(docs, 0.6),
        "dedup_ngram" -> functions.NearDup.ngramJaccardPairs(docs, 0.6))
      for ((name, df) <- plans) {
        val p = df.queryExecution.executedPlan.toString()
        assert(!p.contains("BroadcastExchange"),
          s"$name hardcodes a broadcast of an unbounded table")
      }
    } finally spark.conf.set(key, old)
  }

  test("no query plans a partition-less (global) Window") {
    // A Window with no PARTITION BY funnels every row through ONE task —
    // fine only when the windowed relation is bounded metadata, and even
    // then the one-row-aggregate + broadcast cross-join shape (see
    // Profile.categoryDrift, Sampling.temperatureMix) does the same job
    // without the single-partition stage. Physical signature: a Window
    // operator preceded by Exchange SinglePartition.
    val offenders = Queries.all.flatMap { q =>
      // sparkPlan (pre-AQE): WindowExec nodes are direct tree children,
      // not hidden behind an AdaptiveSparkPlanExec boundary
      val global = q.fn(spark, sf0001).queryExecution.sparkPlan.collect {
        case w: org.apache.spark.sql.execution.window.WindowExec
          if w.partitionSpec.isEmpty => w
      }.nonEmpty
      if (global) Some(q.name) else None
    }
    assert(offenders.isEmpty, s"global windows in: $offenders")
  }

  test("no query plans an unbounded-following window frame") {
    // Spark executes [current, unbounded following] frames by rescanning
    // current→end for EVERY row — O(partition²). Any backward fill /
    // next-value lookup must be expressed as a RUNNING frame over the
    // DESCENDING order instead (same exchange, one extra sort, O(n)) —
    // the resample_interp lesson.
    import org.apache.spark.sql.functions._
    def hasQuadraticFrame(df: org.apache.spark.sql.DataFrame): Boolean =
      df.queryExecution.sparkPlan.collect {
        case w: org.apache.spark.sql.execution.window.WindowExec
          if w.windowExpression.map(_.toString)
            .exists(s => s.contains("unboundedfollowing$()")
              && !s.contains("unboundedpreceding$(), unboundedfollowing$()")) => w
      }.nonEmpty
    // negative control: the detector must actually match the banned shape
    // (guards against a Spark-version toString drift making it vacuous)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("g")).orderBy(col("x"))
    val probe = { import spark.implicits._; Seq((1, 1)).toDF("g", "x") }
    assert(hasQuadraticFrame(probe.select(
      first(col("x")).over(w.rowsBetween(0, Long.MaxValue)).as("nxt"))),
      "unbounded-following detector no longer matches the banned frame")
    assert(!hasQuadraticFrame(probe.select(
      last(col("x")).over(w.rowsBetween(Long.MinValue, 0)).as("prv"))),
      "unbounded-following detector misfires on a running frame")
    val offenders = Queries.all.flatMap { q =>
      if (hasQuadraticFrame(q.fn(spark, sf0001))) Some(q.name) else None
    }
    assert(offenders.isEmpty, s"unbounded-following frames in: $offenders")
  }

  test("every recompute-priced dedup key has a store-served twin registered") {
    // The iterative-closure dedup keys exist to pin the recompute oracle
    // under the cold-cache bench rule — in production the build-once
    // artifact serves (COVERAGE.md "Which key do I call in production").
    // This tripwire keeps that contract honest: a new closure-priced
    // dedup key may not land without its cheap serving twin. graph_* and
    // winnow_clusters are analytics keys, not pipeline artifacts — the
    // closure IS their deliverable, so they carry no store twin.
    val recomputePriced = Set("dedup_clusters", "dedup_collapse",
      "dedup_keep_best", "split_leakage_safe", "entity_resolve")
    val names = Queries.all.map(_.name).toSet
    assert(recomputePriced.subsetOf(names),
      s"audit list drifted from the registry: ${recomputePriced.diff(names)}")
    val missing = recomputePriced.filterNot(k => names.contains(s"${k}_store"))
    assert(missing.isEmpty,
      s"recompute-priced dedup keys without a _store twin: $missing")
    // and the twin relation can't dangle the other way: every _store key
    // must still have its recompute-oracle base registered.
    // dedup_pairs_store's recompute base is dedup_ngram (same rows, same
    // oracle SQL — the pair table just predates the _store suffix rule).
    val baseOf = Map("dedup_pairs_store" -> "dedup_ngram")
      .withDefault(_.stripSuffix("_store"))
    val orphans = names.filter(_.endsWith("_store"))
      .filterNot(k => names.contains(baseOf(k)))
    assert(orphans.isEmpty, s"_store keys whose base key vanished: $orphans")
  }

  test("no query shuffles more than 6 times") {
    // count DISTINCT exchange plan ids: persisted subtrees repeat their
    // plan text under every InMemoryRelation occurrence, but share ids.
    // Round-robin exchanges are excluded — those are deliberate fanOut
    // repartitions spreading compute-bound stages, not data movement a
    // better plan would avoid.
    val exchangeId = "Exchange (?:hash|range)partitioning[^\\n]*plan_id=(\\d+)".r
    // Accuracy-gate queries (`*_recall`, `*_bounds`) deliberately run TWO
    // full pipelines (exact reference + approximate) plus the comparison
    // join/aggregate, and the composition queries (`corpus_clean`,
    // `dedup_incremental`) run FOUR operator pipelines each — their budget
    // is a pipeline multiple, not one pipeline.
    // dedup_clusters is ITERATIVE (min-label propagation): ~2 bounded
    // shuffles per closure round, rounds = graph diameter — its shuffle
    // count is the algorithm, not a plan defect. Budget 4 shuffles per
    // round over its 25-round ceiling's realistic 10-round slice.
    def cap(name: String): Int =
      if (name.endsWith("_recall") || name.endsWith("_bounds")
        || name == "corpus_clean" || name == "dedup_incremental"
        // the deleted-store variant serves the SAME store-screen pipeline
        // as dedup_incremental_store (the delete happens at build time)
        || name == "dedup_incremental_store"
        || name == "dedup_incremental_deleted") 16
      // graph_pagerank is likewise ITERATIVE (power iteration): 2 bounded
      // shuffles per unrolled iteration × 5 iterations + pair generation.
      // split_leakage_safe = the SAME pair+closure pipeline as
      // dedup_clusters plus one stateless hash projection on its output.
      else if (name == "dedup_clusters" || name == "dedup_collapse"
        || name == "dedup_keep_best" || name == "graph_pagerank"
        || name == "split_leakage_safe") 40
      // the directed variant adds, per unrolled iteration, the
      // dangling-mass anti-join + one-row fold (2 more bounded
      // exchanges/iter than the undirected 2) on top of the same pair
      // pipeline — 5 iterations × ~5 + pair generation.
      else if (name == "graph_pagerank_directed") 56
      // calibration-gated weighting embeds the whole NB scoring pipeline
      // PLUS the bins-sized calibration fold and its one-row gap
      // broadcast — two pipelines in one key by contract, measured 8.
      else if (name == "quality_weighted_mixture") 10
      // entity_resolve = fuzzy pair generation + a pointer-jumping
      // closure (3 bounded shuffles × O(log diameter) rounds, all nested
      // in the final plan's persisted-lineage text).
      else if (name == "entity_resolve") 40
      // four-aggregate single pipelines: postings + tf + df + corpus
      // stats + two-stage top-k (bm25), or per-group shingle sets +
      // pairwise enumeration + sizes joined back (source overlap).
      else if (name == "retrieval_bm25" || name == "source_overlap") 8
      // Kneser-Ney adds the continuation fold to the add-one LM's
      // bigram agg + context fold + scoring join + per-doc reduction —
      // one more vocab-bounded exchange by estimator design, measured 7.
      else if (name == "kn_perplexity") 8
      else if (name == "source_overlap_sketch") 10
      // threshold sweep = the shared pair pipeline + the 7-way explode's
      // TWO aggregates (pairs, distinct docs) + the threshold join —
      // every stage bounded by the pair table, measured 8.
      else if (name == "dedup_threshold_sweep") 10
      // hybrid = BOTH retrieval legs (bm25 + hashed cosine) + the RRF
      // fusion join/window — three pipelines in one query by contract.
      else if (name == "retrieval_hybrid") 20
      // triangle counting is a fixed 5-stage pipeline (canonical distinct,
      // degree count, two endpoint-annotate joins, wedge self-join +
      // closing join, per-node rollup joined back) — each stage a bounded
      // equality shuffle; the persisted intermediates are co-partitioned
      // on their join keys so the wedge join and the final join-back add
      // no new exchange, but the cached subplans' own exchanges still
      // appear in the audited plan text.
      else if (name == "graph_triangles") 12
      // the dedup health report embeds the full near-dup pair pipeline
      // (cold-cache rule: the shared pair cache is cleared per query)
      // PLUS its own content-key aggregate + join-back + pair semi-join.
      else if (name == "dedup_report") 12
      // winnow_clusters = fingerprint pair generation + the iterative
      // min-label closure (same class as dedup_clusters, capped 40).
      else if (name == "winnow_clusters") 40
      // tiers embed the whole bigram-LM scoring pipeline (bigram agg,
      // context agg, two count joins, per-doc reduction) TWICE in the
      // audited text — once under the quantile-cut cache, once live —
      // plus the tier rollup; each is a bounded equality shuffle.
      else if (name == "perplexity_tiers") 12
      // the epoch plan embeds the full DoReMi pipeline (bigram-LM scoring
      // + domain cells + two mixture folds) plus its own two
      // mixture-sized budget folds — every stage a bounded equality
      // shuffle over domain-count-sized frames past the LM.
      else if (name == "mixture_epochs") 12
      else 6
    val offenders = Queries.all.flatMap { q =>
      // cold caches per query (the Bench convention): a shared
      // intermediate warmed by an earlier query would collapse a later
      // query's pipeline into an InMemoryRelation and make the audited
      // shuffle count depend on sweep order.
      PlanCache.clearShared()
      spark.catalog.clearCache()
      val p = q.fn(spark, sf0001).queryExecution.executedPlan.toString()
      val n = exchangeId.findAllMatchIn(p).map(_.group(1)).toSet.size
      if (n > cap(q.name)) Some(s"${q.name}($n)") else None
    }
    assert(offenders.isEmpty, s"shuffle-heavy plans: $offenders")
  }
}
