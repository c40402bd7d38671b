package graft.functions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
  * arXiv:2302.03169): score every raw document by how target-like its
  * hashed n-gram feature distribution is, then keep the highest-
  * importance docs. The published recipe for steering a 100 TB crawl
  * toward a small high-quality target corpus without training anything:
  * fit two bag-of-hashed-ngrams multinomials (target and raw), and each
  * doc's log importance weight is `Σ_b tf(b) · ln(p_target(b) /
  * p_raw(b))` over its hashed feature buckets.
  *
  * Feature hashing here is the first md5 hex byte of each unigram and
  * bigram — 256 buckets, engine-portable (both Spark and DuckDB emit
  * lowercase md5 hex, the same cross-engine determinism trick as
  * `sample_det`), no seed, no vocabulary. The target corpus defaults to
  * the Gopher-rule-passed subset ([[Text.gopherRules]]), keeping the
  * pipeline closed over the input and SQL-checkable; production swaps
  * any target corpus in via [[train]].
  *
  * The reference has no sampling/selection surface at all; this is
  * LLM-pipeline tier ([[Sampling]] holds the unweighted cousins).
  *
  * Scale shape: the model is TWO 256-row bucket tables folded into one
  * 256-row log-ratio table — broadcast by construction, never a
  * shuffled join. Training is one feature pass over each corpus
  * (map-side-combined bucket counts); scoring is one feature pass with
  * a map-side combine on (doc, bucket) — ≤256 rows per doc into the
  * shuffle — a broadcast join, and a per-doc sum. Selection is a
  * TakeOrdered top-k, never a global sort. Integer counts throughout;
  * the one log ratio is rounded to 6 decimals, the float-oracle
  * convention ([[LangModel]]).
  */
object Dsir {

  /** Feature-hash bucket count: md5's first hex byte. Fixed and small
    * ON PURPOSE — the model must stay broadcastable at any corpus size;
    * the paper's quality/selection results hold from 1e4 buckets down
    * (§4.2 ablation), and 256 keeps the DuckDB oracle a 2-char
    * substring compare. */
  val Buckets = 256

  /** A trained DSIR model: the 256-row (bucket, log_ratio) table.
    * `log_ratio(b) = ln((n_t(b)+1)/(N_t+256)) - ln((n_r(b)+1)/(N_r+256))`
    * — add-one smoothed so buckets absent from either corpus score
    * smoothing mass (the frozen-model contract for stream scoring). */
  final case class DsirModel(bucketLogRatio: DataFrame)

  /** (doc_id, b): one row per unigram AND bigram occurrence of each
    * doc, hashed to its md5-prefix bucket. Token array bound to an
    * attribute first (per-element re-eval caveat, [[NearDup.shinglesOf]]). */
  def features(docs: DataFrame): DataFrame = {
    val toks = NearDup.fanOut(docs)
      .select(col("doc_id"), Text.tokens(col("text")).as("_t"))
    val bigrams = transform(
      slice(col("_t"), lit(1), greatest(size(col("_t")) - 1, lit(0))),
      (w, i) => concat(w, lit(" "), element_at(col("_t"), i + lit(2))))
    toks
      .select(col("doc_id"),
        explode(concat(col("_t"), bigrams)).as("_f"))
      .select(col("doc_id"), substring(md5(col("_f")), 1, 2).as("b"))
  }

  /** Per-bucket occurrence counts of a corpus — a ≤256-row frame. */
  private def bucketCounts(docs: DataFrame): DataFrame =
    features(docs).groupBy(col("b")).agg(count(lit(1)).as("n"))

  /** Null-safe one-row sum collect (NULL on empty input → 0). */
  private def scalarSum(df: DataFrame, c: String): Long = {
    val r = df.agg(sum(col(c))).collect()(0)
    if (r.isNullAt(0)) 0L else r.getLong(0)
  }

  /** Smoothed log-probability of a coalesced count column under a
    * corpus total. */
  private def logP(n: Column, total: Long): Column =
    log((coalesce(n, lit(0L)) + lit(1)).cast("double") /
      lit((total + Buckets).toDouble))

  /** Fit the importance model: bucket counts of `target` and `raw`,
    * folded to the 256-row log-ratio table. The two one-row total
    * collects are the only driver-side values. */
  def train(raw: DataFrame, target: DataFrame): DsirModel =
    trainFromCounts(raw.sparkSession,
      bucketCounts(raw), bucketCounts(target).withColumnRenamed("n", "_nt"))

  /** [[train]] over PRECOMPUTED bucket-count tables — the fold shared
    * with [[weights]], whose raw and target counts both derive from one
    * persisted feature pass instead of re-hashing each corpus. */
  private def trainFromCounts(
      s: SparkSession, rawN: DataFrame, tgtN: DataFrame): DsirModel = {
    val totR = scalarSum(rawN, "n")
    val totT = scalarSum(tgtN, "_nt")
    // an empty corpus yields a NULL sum — fail loudly (an all-smoothing
    // model silently ranks everything equal, which reads as "selection
    // ran" while selecting nothing)
    require(totR > 0, "DSIR raw corpus produced no features")
    require(totT > 0,
      "DSIR target corpus produced no features — empty or unmatched target")
    // DENSIFY over all 256 buckets: a full join of the two count tables
    // only covers buckets seen in raw OR target, and scoreWith's
    // coalesce(log_ratio, 0.0) would then score an unseen bucket 0
    // instead of the documented add-one smoothing mass — wrong for every
    // NEW doc scored under a frozen model whose training corpora left
    // buckets uncovered. With all 256 rows present the coalesce is dead
    // belt-and-braces.
    import s.implicits._
    val allB = (0 until Buckets).map(i => f"$i%02x").toDF("b")
    DsirModel(
      allB
        .join(rawN, Seq("b"), "left")
        .join(tgtN, Seq("b"), "left")
        .select(col("b"),
          (logP(col("_nt"), totT) - logP(col("n"), totR)).as("log_ratio")))
  }

  /** Score `docs` under a frozen model: (doc_id, n_feats, logw) with
    * `logw = Σ_occurrences log_ratio(bucket)` rounded to 6 decimals.
    * The model join is a hard `broadcast` — the table is ≤256 rows by
    * construction, the one case where an unconditional hint is correct
    * at any scale. ONE aggregation on purpose: the broadcast join is
    * narrow, per-doc partial sums fold map-side before the doc_id
    * shuffle, and the single-stateful-operator shape lets
    * [[graft.streaming.StreamOps.dsirStream]] run this same plan in
    * update mode. */
  def scoreWith(m: DsirModel, docs: DataFrame): DataFrame =
    scoreFeatures(m, features(docs))

  /** [[scoreWith]] over a precomputed (doc_id, b) feature relation. */
  private def scoreFeatures(m: DsirModel, feats: DataFrame): DataFrame =
    feats
      .join(broadcast(m.bucketLogRatio), Seq("b"), "left")
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_feats"),
        round(sum(coalesce(col("log_ratio"), lit(0.0))), 6).as("logw"))

  /** Self-contained weights over one corpus: target = its Gopher-passed
    * subset, raw = the whole corpus. The per-doc importance ranking the
    * selection step and the monitoring dashboards read.
    *
    * ONE feature pass (guide §1.2 "don't compute things twice"): the
    * hashed (doc_id, bucket) relation is persisted and shared by the raw
    * counts, the target counts (the Gopher-passed subset restricted by a
    * doc_id join — identical rows to re-featurizing the subset, since
    * weak labels are one row per doc), and the scoring join. The md5
    * feature hash of every unigram+bigram occurrence is the pipeline's
    * dominant per-row cost; the naive train+score composition paid it
    * three times per corpus. */
  def weights(docs: DataFrame): DataFrame = {
    val d = docs.persist()
    val feats = features(d)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val passedIds =
      QualityClassifier.weakLabels(d).filter(col("pass")).select("doc_id")
    val rawN = feats.groupBy(col("b")).agg(count(lit(1)).as("n"))
    val tgtN = feats.join(passedIds, Seq("doc_id"))
      .groupBy(col("b")).agg(count(lit(1)).as("_nt"))
    val m = trainFromCounts(d.sparkSession, rawN, tgtN)
    graft.AutoUnpersist.afterFirstUse(scoreFeatures(m, feats), d, feats)
  }

  /** Deterministic top-`n` selection by importance weight — ordered by
    * the ROUNDED logw descending, doc_id tie-break, so both engines cut
    * the same set. (The paper resamples with Gumbel noise; the
    * deterministic top-k is the reproducible variant — equivalent at
    * temperature→0 — matching this engine's no-rand() convention,
    * see [[Sampling]].) */
  def select(docs: DataFrame, n: Int): DataFrame =
    weights(docs).orderBy(col("logw").desc, col("doc_id")).limit(n)
}
