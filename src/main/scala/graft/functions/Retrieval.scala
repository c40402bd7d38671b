package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Sparse (keyword) retrieval — the BM25 face of "similarity search".
  * Dense ANN ([[Similarity]], [[Ivf]], [[Pq]]) answers "what is
  * semantically near this embedding"; a training-data pipeline equally
  * needs "which documents mention these terms" — targeted decontamination
  * sweeps, corpus QA ("show me docs about X"), and hybrid retrieval all
  * start from an inverted-index score. This is the Okapi BM25 ranking
  * function (Robertson & Walker 1994) over whitespace tokens.
  *
  * Bit-reproducibility (the engine's oracle contract): two deviations
  * from the textbook form, both documented:
  *
  *   - idf is the LOG-FREE rational form `(N - df + 0.5) / (df + 0.5)` —
  *     the argument of the standard `ln(...)` idf, without the `ln`.
  *     `ln` is strictly monotone, so PER-TERM score order is unchanged;
  *     dropping it removes the one transcendental whose last-ulp varies
  *     across libm implementations (same trick as
  *     [[Text.tfidfTopTerms]]). NOTE the limit of that argument: a
  *     MULTI-term document score sums per-term partials, and a monotone
  *     per-term map does not commute with the sum — rare terms weigh
  *     ~N here vs ~ln N under textbook BM25, so multi-term rankings can
  *     differ from ln-idf BM25 (rare-term matches rank relatively
  *     higher). This is a deliberate member of the BM25 variant family
  *     (cross-engine exactness over ln-idf fidelity), not a
  *     rank-preserving rewrite of it; callers needing ln-idf ranking
  *     should apply `ln` per partial and accept last-ulp engine skew.
  *   - the per-document score sums its per-term partials as
  *     `DECIMAL(28,10)` — decimal addition is EXACT and therefore
  *     order-invariant, where a double sum would depend on Spark's
  *     partition merge order and could diverge from any re-computation
  *     (including the oracle's). Each partial is a pure IEEE-double
  *     expression (exactly-rounded ops in a fixed parenthesization), so
  *     partials are bit-identical across engines; no double can sit
  *     exactly on a decimal rounding boundary at scale 10 (that would
  *     need a 5·10⁻¹¹-denominator dyadic rational), so the cast is
  *     unambiguous too.
  *
  * Scale shape (100 TB): postings are filtered to QUERY terms by a
  * broadcast join before any aggregation, so the shuffled state is
  * O(docs containing a query term), not O(corpus vocabulary); corpus
  * statistics (N, Σdl) are a one-row aggregate broadcast back; df comes
  * from a vocabulary-sized aggregate pruned to query terms. Top-k is
  * TWO-STAGE — per-(query, doc-hash-bucket) top-k first, then top-k of
  * the ≤ 32k survivors — so no single window partition ever holds a
  * whole query's posting list (the classic single-stage
  * `Window.partitionBy(query)` skew).
  */
object Retrieval {

  /** Top-`k` documents per query under BM25 (rational-idf form).
    *
    * @param docs    corpus with `idCol` (integral) and `textCol`
    * @param queries (query_id, qtext) — one row per query; terms are the
    *                whitespace tokens of `qtext`, deduplicated (query
    *                term frequency is ignored, the common BM25 practice)
    * @return (query_id, doc_id, score, rank) — rank 1..k per query by
    *         (score desc, doc_id asc); only docs matching ≥1 term appear.
    */
  def bm25TopK(
      docs: DataFrame,
      queries: DataFrame,
      k: Int,
      k1: Double = 1.2,
      b: Double = 0.75,
      textCol: String = "text",
      idCol: String = "doc_id",
      buckets: Int = 32
  ): DataFrame =
    bm25FromPostings(docs, postings(docs, idCol, textCol), queries,
      k, k1, b, textCol, idCol, buckets)

  /** The (doc_id, dl, term) posting relation both retrieval legs read —
    * one tokenize+explode of the corpus. dl rides along with every
    * posting (8 bytes/row in the pruned match set) so no separate
    * doc-length join — that join would re-shuffle both sides on doc_id
    * for a value already in hand at explode time. */
  private def postings(
      docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"), split(col(textCol), " ").as("_t"))
      .select(col("doc_id"), size(col("_t")).as("dl"),
        explode(col("_t")).as("term"))

  /** [[bm25TopK]] over a precomputed posting relation — the seam
    * [[hybridTopK]] uses to share ONE corpus tokenize/explode between
    * its two legs. */
  private def bm25FromPostings(
      docs: DataFrame,
      post: DataFrame,
      queries: DataFrame,
      k: Int,
      k1: Double,
      b: Double,
      textCol: String,
      idCol: String,
      buckets: Int
  ): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(k1 > 0 && b >= 0 && b <= 1, s"bad BM25 params k1=$k1 b=$b")
    require(buckets > 0, s"buckets must be positive, got $buckets")

    val dl = docs.select(col(idCol).as("doc_id"),
      size(split(col(textCol), " ")).as("dl"))

    val qterms = queries.select(col("query_id"),
      explode(array_distinct(split(col("qtext"), " "))).as("term"))

    // Postings restricted to query terms FIRST (broadcast SEMI join: the
    // build side needs no dedup exchange — semi-join semantics ignore
    // build-side duplicates): everything downstream is sized by the match
    // set, not the corpus.
    val matched = post.join(broadcast(qterms.select("term")),
      Seq("term"), "left_semi")
    // tf is consumed twice (df derivation + scoring) — persisted so the
    // corpus tokenize/explode runs ONCE and df keeps map-side partial
    // aggregation over the cache (a window partitioned by term would be
    // the compact alternative but piles each term's whole posting list
    // into one task — a skew bomb the moment a query contains a stopword).
    val tf = matched.groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"), max(col("dl")).as("dl"))
      .persist()
    // df MUST count docs over the full corpus, and tf holds exactly one
    // row per matched (doc, term) — so df is a count over the tf table
    // (no second distinct+aggregate pass over the raw postings).
    val dfT = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val stats = dl.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))

    val tfD = col("tf").cast("double")
    val idf = ((col("n_docs") - col("df")).cast("double") + lit(0.5)) /
      (col("df").cast("double") + lit(0.5))
    val avgdl = col("sum_dl").cast("double") / col("n_docs").cast("double")
    val den = tfD + lit(k1) * (lit(1.0 - b) + (lit(b) * col("dl").cast("double")) / avgdl)
    val partial = idf * ((tfD * lit(k1 + 1.0)) / den)

    val scored = tf
      .join(broadcast(qterms), "term")
      .join(broadcast(dfT), "term")
      .crossJoin(broadcast(stats))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(partial.cast(DecimalType(28, 10))).as("_sdec"))

    // Two-stage exact top-k: stage 1 bounds every window partition by the
    // doc-hash bucket; the global top-k is a subset of the per-bucket
    // top-ks, so stage 2 over ≤ buckets·k rows/query is exact.
    val w1 = Window
      .partitionBy(col("query_id"), pmod(col("doc_id"), lit(buckets.toLong)))
      .orderBy(col("_sdec").desc, col("doc_id"))
    val w2 = Window.partitionBy(col("query_id"))
      .orderBy(col("_sdec").desc, col("doc_id"))
    val result = scored
      .withColumn("_rb", row_number().over(w1)).filter(col("_rb") <= k)
      .withColumn("rank", row_number().over(w2)).filter(col("rank") <= k)
      .select(col("query_id"), col("doc_id"),
        col("_sdec").cast("double").as("score"), col("rank"))
      .orderBy(col("query_id"), col("rank"))
    graft.AutoUnpersist.afterFirstUse(result, tf)
  }

  /** Hashed-feature cosine retrieval — the "dense" leg of hybrid search
    * when no learned embeddings exist for the corpus: documents and
    * queries become 256-dimensional count vectors by feature hashing
    * (Weinberger et al. 2009) each whitespace token to its 2-hex-char
    * md5 prefix, and similarity is the cosine between those vectors.
    * Unlike BM25's per-term idf weighting this is a pure
    * vector-space model — the two legs genuinely rank differently,
    * which is what makes fusing them worthwhile.
    *
    * Bit-reproducibility: feature counts, dot products, and squared
    * norms are exact integer aggregates (md5 is engine-independent);
    * the only floating-point is the final
    * `dot / (sqrt(nd2) * sqrt(nq2))` — exactly-rounded IEEE ops in a
    * fixed parenthesization, so scores are bit-identical in any engine.
    *
    * Scale shape: the corpus side reduces to ≤256 (doc, feature) rows
    * per doc before any join; the query side is broadcast; dot products
    * shuffle O(docs · queries) rows; top-k is the same two-stage window
    * as [[bm25TopK]] (no whole-corpus window partition).
    *
    * @return (query_id, doc_id, sim, rank) — rank 1..k per query by
    *         (sim desc, doc_id asc); only docs sharing ≥1 feature appear.
    */
  /** (id, _f, dc) hashed-feature count vectors: one row per (row id,
    * 2-hex-char md5 token prefix) with the token count. */
  private def featureVectors(
      df: DataFrame, idCol: String, idOut: String, textCol: String): DataFrame =
    df.select(col(idCol).as(idOut), explode(split(col(textCol), " ")).as("_t"))
      .groupBy(col(idOut), substring(md5(col("_t")), 1, 2).as("_f"))
      .agg(count(lit(1)).as("dc"))

  def hashedCosineTopK(
      docs: DataFrame,
      queries: DataFrame,
      k: Int,
      textCol: String = "text",
      idCol: String = "doc_id",
      buckets: Int = 32
  ): DataFrame =
    hashedCosineFromVectors(
      featureVectors(docs, idCol, "doc_id", textCol), queries, k, buckets)

  /** [[hashedCosineTopK]] over a precomputed (doc_id, _f, dc) corpus
    * feature-vector relation — the [[hybridTopK]] sharing seam. */
  private def hashedCosineFromVectors(
      corpusVectors: DataFrame,
      queries: DataFrame,
      k: Int,
      buckets: Int
  ): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val dvec = corpusVectors
      .persist() // consumed twice: norms + dot products (tokenize once)
    val dnorm = dvec.groupBy(col("doc_id"))
      .agg(sum(col("dc") * col("dc")).as("nd2"))
    val qvec = featureVectors(queries, "query_id", "query_id", "qtext")
      .withColumnRenamed("dc", "qc")
    val qnorm = qvec.groupBy(col("query_id"))
      .agg(sum(col("qc") * col("qc")).as("nq2"))
    val dot = dvec.join(broadcast(qvec), "_f")
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("dc") * col("qc")).as("dot"))
    val sim = dot
      .join(dnorm, "doc_id")
      .join(broadcast(qnorm), "query_id")
      .select(col("query_id"), col("doc_id"),
        (col("dot").cast("double") /
          (sqrt(col("nd2").cast("double")) * sqrt(col("nq2").cast("double"))))
          .as("sim"))
    val w1 = Window
      .partitionBy(col("query_id"), pmod(col("doc_id"), lit(buckets.toLong)))
      .orderBy(col("sim").desc, col("doc_id"))
    val w2 = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("doc_id"))
    val result = sim
      .withColumn("_rb", row_number().over(w1)).filter(col("_rb") <= k)
      .withColumn("rank", row_number().over(w2)).filter(col("rank") <= k)
      .select(col("query_id"), col("doc_id"), col("sim"), col("rank"))
      .orderBy(col("query_id"), col("rank"))
    graft.AutoUnpersist.afterFirstUse(result, dvec)
  }

  /** Reciprocal-rank fusion (Cormack et al. 2009) of two per-query
    * rankings: `rrf = 1/(kRrf + rank_a) + 1/(kRrf + rank_b)`, with a
    * missing leg contributing 0. RRF is the standard hybrid-search
    * combiner precisely because it needs NO score calibration — only
    * ranks cross the fusion boundary, so a BM25 leg and a cosine leg
    * (incomparable score scales) fuse cleanly.
    *
    * Each contribution is one exactly-rounded IEEE division and the
    * fusion is one addition in fixed (a, b) order, so fused scores are
    * bit-reproducible given the input ranks. The candidate set per query
    * is ≤ the two legs' k's combined — fusion cost is negligible next to
    * the legs.
    *
    * @param a,b (query_id, doc_id, rank) rankings (extra columns ignored)
    * @return (query_id, doc_id, rrf, rank_a, rank_b, rank) — top `k` per
    *         query by (rrf desc, doc_id asc); absent-leg ranks are null.
    */
  def rrfFuse(a: DataFrame, b: DataFrame, k: Int, kRrf: Int = 60): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(kRrf > 0, s"kRrf must be positive, got $kRrf")
    val fa = a.select(col("query_id"), col("doc_id"), col("rank").as("rank_a"))
    val fb = b.select(col("query_id"), col("doc_id"), col("rank").as("rank_b"))
    val contrib = (r: Column) =>
      coalesce(lit(1.0) / (lit(kRrf) + r).cast("double"), lit(0.0))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("rrf").desc, col("doc_id"))
    fa.join(fb, Seq("query_id", "doc_id"), "full_outer")
      .select(col("query_id"), col("doc_id"),
        (contrib(col("rank_a")) + contrib(col("rank_b"))).as("rrf"),
        col("rank_a"), col("rank_b"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .orderBy(col("query_id"), col("rank"))
  }

  /** Hybrid retrieval: BM25 and hashed-cosine legs (top `kLeg` each)
    * fused by RRF to the final top `k` — the standard two-retriever
    * hybrid-search pipeline over one corpus. */
  def hybridTopK(
      docs: DataFrame,
      queries: DataFrame,
      k: Int,
      kLeg: Int = 20,
      textCol: String = "text",
      idCol: String = "doc_id"
  ): DataFrame = {
    // ONE corpus tokenize/explode shared by both legs (guide §1.2): the
    // BM25 leg consumes the posting relation directly and the cosine
    // leg's 256-bucket count vectors are a groupBy over the same rows —
    // run separately, each leg re-exploded the corpus.
    val post = postings(docs, idCol, textCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val dvec = post.groupBy(col("doc_id"),
        substring(md5(col("term")), 1, 2).as("_f"))
      .agg(count(lit(1)).as("dc"))
    graft.AutoUnpersist.afterFirstUse(
      rrfFuse(
        hashedCosineFromVectors(dvec, queries, kLeg, buckets = 32),
        bm25FromPostings(docs, post, queries, kLeg, k1 = 1.2, b = 0.75,
          textCol = textCol, idCol = idCol, buckets = 32),
        k),
      post)
  }

  /** Maximal Marginal Relevance selection (Carbonell & Goldstein 1998):
    * from each query's candidate shortlist, greedily pick `k` items
    * maximizing `λ·rel(d) − (1−λ)·max_{s∈selected} sim(d, s)` — the
    * diversity-aware re-rank that keeps a result list (or a training-data
    * subset) from filling up with near-duplicates of the top hit.
    *
    * The greedy loop is UNROLLED as `k` declarative steps — each step is
    * one (remaining × selected) max-sim aggregate plus one per-query
    * top-1 window — rather than a per-group imperative fold, so the
    * whole selection stays in Catalyst, scales across queries, and can
    * be mirrored step-for-step by a SQL oracle. Shortlists are
    * contractually small (≤ tens of rows per query), so k·3 bounded
    * shuffles over shortlist-sized tables is noise next to candidate
    * generation. Each step's one-row-per-query pick is materialized via
    * `localCheckpoint` (k tiny eager jobs): as a plan LEAF it keeps the
    * unrolled recursion linear — inlined, pick_i would re-embed the whole
    * prior step twice and the plan would grow O(2^k).
    *
    * Arithmetic is bit-reproducible: `rel` and `sim` arrive
    * bit-identical (exact integer dots, fixed-form IEEE), a missing
    * pair row means a zero dot product and contributes sim 0, and the
    * score is `(λ·rel) − (λ'·maxsim)` in fixed parenthesization with
    * dyadic-rational λ.
    *
    * @param candidates (query_id, doc_id, rel) shortlist per query
    * @param pairSims   (query_id, id_a, id_b, sim) pairwise similarities
    *                   within each query's shortlist, BOTH orientations;
    *                   zero-similarity pairs may be absent
    * @return (query_id, doc_id, mmr, rank) — rank 1..k in selection order
    */
  def mmrSelect(
      candidates: DataFrame,
      pairSims: DataFrame,
      k: Int,
      lambda: Double = 0.5
  ): DataFrame = {
    require(k >= 1 && k <= 16, s"k must be in [1, 16] (unrolled plan), got $k")
    require(lambda >= 0 && lambda <= 1, s"lambda must be in [0,1], got $lambda")
    val cand = candidates.select(col("query_id"), col("doc_id"), col("rel"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("mmr").desc, col("doc_id"))
    // step 1: empty selected set, max-sim term is 0 — argmax of λ·rel.
    // Each step's pick is LOCALCHECKPOINTED (one row per query — tiny):
    // without the cut, pick_i re-embeds remaining_{i-1}, which re-embeds
    // pick_{i-1} AND remaining_{i-2} — an O(2^k) plan that stalls
    // analysis long before execution. With leaf picks, the remaining
    // chain is a linear k-deep anti-join over the shortlist.
    var selected = cand
      .select(col("query_id"), col("doc_id"),
        (lit(lambda) * col("rel") - lit(1 - lambda) * lit(0.0)).as("mmr"))
      .withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1)
      .select(col("query_id"), col("doc_id"), col("mmr"), lit(1).as("rank"))
      .localCheckpoint(true)
    var remaining = cand.join(selected.select("query_id", "doc_id"),
      Seq("query_id", "doc_id"), "left_anti")
    for (step <- 2 to k) {
      val ms = remaining
        .join(selected.select(col("query_id"), col("doc_id").as("_s")),
          Seq("query_id"))
        .join(pairSims.select(col("query_id"), col("id_a").as("doc_id"),
            col("id_b").as("_s"), col("sim")),
          Seq("query_id", "doc_id", "_s"), "left")
        .groupBy(col("query_id"), col("doc_id"), col("rel"))
        .agg(max(col("sim")).as("_ms")) // all-null group -> null -> 0
      val pick = ms
        .select(col("query_id"), col("doc_id"),
          (lit(lambda) * col("rel") -
            lit(1 - lambda) * coalesce(col("_ms"), lit(0.0))).as("mmr"))
        .withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1)
        .select(col("query_id"), col("doc_id"), col("mmr"),
          lit(step).as("rank"))
        .localCheckpoint(true)
      selected = selected.unionByName(pick)
      remaining = remaining.join(pick.select("query_id", "doc_id"),
        Seq("query_id", "doc_id"), "left_anti")
    }
    selected.orderBy(col("query_id"), col("rank"))
  }

  /** MMR-diversified retrieval over the hashed-cosine shortlist: top
    * `kShortlist` candidates per query, pairwise shortlist similarities
    * from the same feature vectors, greedy MMR down to `k`. */
  def mmrTopK(
      docs: DataFrame,
      queries: DataFrame,
      k: Int,
      kShortlist: Int = 20,
      lambda: Double = 0.5,
      textCol: String = "text",
      idCol: String = "doc_id"
  ): DataFrame = {
    val cand = hashedCosineTopK(docs, queries, kShortlist, textCol, idCol)
      .select(col("query_id"), col("doc_id"), col("sim").as("rel"))
      .persist() // consumed 3×: selection + both sides of the pair join
    // pairwise sims among SHORTLISTED docs only (≤ queries·kShortlist
    // distinct docs): vectors rebuilt for that sliver of the corpus,
    // dots via the feature-keyed self-join, then scoped to each query's
    // own shortlist pairs.
    val ids = cand.select(col("doc_id").as(idCol)).distinct()
    val dv = featureVectors(
        docs.join(ids, Seq(idCol), "left_semi"), idCol, "doc_id", textCol)
      .persist()
    val norms = dv.groupBy(col("doc_id")).agg(sum(col("dc") * col("dc")).as("n2"))
    val dots = dv.select(col("doc_id").as("id_a"), col("_f"), col("dc").as("_ca"))
      .join(dv.select(col("doc_id").as("id_b"), col("_f"), col("dc").as("_cb")),
        Seq("_f"))
      .filter(col("id_a") =!= col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(sum(col("_ca") * col("_cb")).as("dot"))
    val psimAll = dots
      .join(norms.select(col("doc_id").as("id_a"), col("n2").as("_na")), "id_a")
      .join(norms.select(col("doc_id").as("id_b"), col("n2").as("_nb")), "id_b")
      .select(col("id_a"), col("id_b"),
        (col("dot").cast("double") /
          (sqrt(col("_na").cast("double")) * sqrt(col("_nb").cast("double"))))
          .as("sim"))
    // restrict to pairs inside one query's shortlist
    val psim = psimAll
      .join(cand.select(col("query_id"), col("doc_id").as("id_a")), "id_a")
      .join(cand.select(col("query_id"), col("doc_id").as("id_b")),
        Seq("query_id", "id_b"))
    val result = mmrSelect(cand, psim, k, lambda)
    graft.AutoUnpersist.afterFirstUse(result, cand, dv)
  }
}
