package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Learned document-quality classifier — the fastText-style filter tier
  * of a web-corpus pipeline (Joulin et al. 2016; used as the quality
  * gate in GPT-3/CCNet-descended pipelines): train a multinomial Naive
  * Bayes model on weakly-labeled documents and score every document
  * with its log-odds of being "quality". The weak labels come from the
  * published Gopher rules ([[Text.gopherRules]] `pass` verdict — Rae et
  * al. 2021 §A1.1), so the whole pipeline is closed over the corpus and
  * SQL-checkable; in production the same `train`/`scoreWith` split runs
  * with any labeled reference set (e.g. Wikipedia-vs-crawl, the CCNet
  * arrangement).
  *
  * Why NB and not SGD-logistic: the model is pure counting — one
  * token-keyed corpus aggregate — so training is a single deterministic
  * distributed pass with no iteration, no learning-rate state, and no
  * driver-side parameter vector beyond four scalars. At the quality-
  * filter operating point the two are interchangeable (fastText itself
  * is a linear bag-of-ngrams model); NB's count table IS its weights.
  *
  * The reference has no classifier surface (its scalar tier is user
  * lambdas, `/root/reference/source/koalas/dataframe.d:238-262`); this
  * is LLM-pipeline tier like [[LangModel]].
  *
  * Scale shape: training is ONE token-keyed aggregate over the corpus
  * (map-side partial counts, vocabulary-bounded result) plus two
  * one-row scalar collects; scoring folds each doc to its distinct-
  * token term frequencies (map-side combine on (doc, token)), joins the
  * vocabulary-bounded weight table (size-gated broadcast, shuffled
  * fallback at 100 TB vocabularies), and reduces per doc. Nothing
  * corpus-sized ever reaches the driver. All arithmetic is integer
  * counts until the final log-ratio, which both engines round to 6
  * decimals — the float-emitting-oracle convention here
  * ([[LangModel]], `stats_corr`).
  */
object QualityClassifier {

  /** A trained NB model: per-token class counts (vocabulary-bounded
    * frame) plus the four scalars scoring needs — total positive-class
    * tokens, total negative-class tokens, vocabulary size, and the
    * add-one-smoothed document-prior log-odds. Frozen at train time:
    * tokens unseen then score from coalesced zero counts (pure
    * smoothing mass), the contract the streaming twin
    * ([[graft.streaming.StreamOps.nbQualityStream]]) relies on. */
  final case class NbModel(
      tokenCounts: DataFrame, // (token, n_pos, n_neg)
      nPos: Long,
      nNeg: Long,
      vocab: Long,
      priorLogOdds: Double)

  /** Gopher-rule weak labels: (doc_id, pass). The standard bootstrap
    * for a corpus with no human labels — rule-passed docs are the
    * positive class the classifier generalizes from. */
  def weakLabels(docs: DataFrame): DataFrame =
    Text.gopherRules(docs).select(col("doc_id"), col("pass"))

  /** One row per token OCCURRENCE (multiplicity kept — multinomial NB
    * counts occurrences, not presence). */
  private def docTokens(docs: DataFrame): DataFrame =
    NearDup.fanOut(docs)
      .select(col("doc_id"), explode(Text.tokens(col("text"))).as("token"))

  /** Train on `docs` with `labels` = (doc_id, pass: boolean): one
    * token-keyed aggregate counting both classes at once, one
    * vocabulary fold for the scalars, one two-value prior count. */
  def train(docs: DataFrame, labels: DataFrame): NbModel =
    trainFromTokens(docTokens(docs), labels)

  /** [[train]] over a precomputed (doc_id, token) occurrence relation —
    * the seam the self-trained compositions use to share ONE tokenize/
    * explode pass between training and scoring (guide §1.2: the
    * train+score composition exploded the corpus twice). */
  private def trainFromTokens(toks: DataFrame, labels: DataFrame): NbModel = {
    val counts = toks
      .join(labels, Seq("doc_id"))
      .groupBy(col("token"))
      .agg(
        sum(when(col("pass"), 1L).otherwise(0L)).as("n_pos"),
        sum(when(col("pass"), 0L).otherwise(1L)).as("n_neg"))
    // vocabulary-bounded frame -> one-row scalar collect. An empty
    // labeled corpus yields NULL sums — fail loudly rather than train a
    // degenerate all-smoothing model.
    val tot = counts.agg(
      sum(col("n_pos")), sum(col("n_neg")), count(lit(1))).collect()(0)
    require(!tot.isNullAt(0),
      "NB training corpus produced no labeled tokens — empty docs or labels")
    val prior = labels.agg(
      sum(when(col("pass"), 1L).otherwise(0L)),
      sum(when(col("pass"), 0L).otherwise(1L))).collect()(0)
    NbModel(counts, tot.getLong(0), tot.getLong(1), tot.getLong(2),
      math.log((prior.getLong(0) + 1.0) / (prior.getLong(1) + 1.0)))
  }

  /** Self-trained convenience: labels from the Gopher rules over the
    * same corpus. */
  def train(docs: DataFrame): NbModel = train(docs, weakLabels(docs))

  /** Per-token log-likelihood ratio under `m`, from coalesced counts so
    * unseen tokens score smoothing mass:
    * `llr(w) = ln((n_pos(w)+1)/(N_pos+V)) - ln((n_neg(w)+1)/(N_neg+V))`. */
  private def llr(m: NbModel) =
    log((coalesce(col("n_pos"), lit(0L)) + lit(1)).cast("double") /
        lit((m.nPos + m.vocab).toDouble)) -
      log((coalesce(col("n_neg"), lit(0L)) + lit(1)).cast("double") /
        lit((m.nNeg + m.vocab).toDouble))

  /** Score `docs` under a PRE-TRAINED (frozen) model — the production
    * path: train once on the labeled reference, score every ingest
    * batch or stream micro-batch. Output (doc_id, n_tokens, log_odds,
    * pred): `log_odds = prior + Σ_occurrences llr(w)` rounded to 6
    * decimals, `pred` derived from the ROUNDED value so both engines
    * agree at the boundary. ONE aggregation on purpose: the weight join
    * is size-gated-broadcast (narrow), per-doc partial sums fold
    * map-side before the doc_id shuffle, and the single-stateful-
    * operator shape is what lets [[graft.streaming.StreamOps
    * .nbQualityStream]] run this same plan in update mode. */
  def scoreWith(m: NbModel, docs: DataFrame): DataFrame =
    scoreTokens(m, docTokens(docs))

  /** [[scoreWith]] over a precomputed (doc_id, token) relation. */
  private def scoreTokens(m: NbModel, toks: DataFrame): DataFrame =
    toks
      .join(NearDup.broadcastIfSmall(m.tokenCounts), Seq("token"), "left")
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_tokens"),
        round(lit(m.priorLogOdds) + sum(llr(m)), 6).as("log_odds"))
      .select(col("doc_id"), col("n_tokens"), col("log_odds"),
        (col("log_odds") > 0.0).as("pred"))

  /** Self-trained score of the whole corpus — train on the Gopher weak
    * labels, score every doc. One persisted label pass shared between
    * prior counting and token labeling. */
  def score(docs: DataFrame): DataFrame = {
    val labels = weakLabels(docs).persist()
    val toks = docTokens(docs)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val m = trainFromTokens(toks, labels)
    graft.AutoUnpersist.afterFirstUse(scoreTokens(m, toks), labels, toks)
  }

  /** The model's top-k most quality-discriminative tokens —
    * (token, n_pos, n_neg, llr) ordered by rounded llr descending, the
    * dashboard view a pipeline owner audits the classifier with.
    * Ordering uses the ROUNDED llr (ties broken by token) so both
    * engines cut the same top-k. */
  def topTokens(docs: DataFrame, k: Int = 25): DataFrame = {
    val m = train(docs)
    m.tokenCounts
      .select(col("token"), col("n_pos"), col("n_neg"),
        round(llr(m), 6).as("llr"))
      .orderBy(col("llr").desc, col("token"))
      .limit(k)
  }

  /** Calibration (reliability) table — the audit that decides whether
    * the classifier's scores can be used as sampling WEIGHTS (DSIR-style
    * soft filtering needs calibrated probabilities) or only as a
    * threshold gate: per decile of predicted probability
    * `p = σ(log_odds)`, how many docs landed there, their mean predicted
    * p, and the rate actually labeled positive. A calibrated model has
    * `mean_pred ≈ pos_rate` per bin; systematic gaps mean the log-odds
    * scale is distorted (expected for NB's independence assumption — the
    * question is by how much).
    *
    * Determinism: p rounds to 6 from the already-6-rounded log_odds, the
    * bin is `min(⌊p·bins⌋, bins−1)` on that value, and `mean_pred` sums
    * p as exact DECIMAL(18,6) before the one rounded divide — no
    * float-summation-order dependence in either engine.
    *
    * Scale shape: one score pass + the label pass it already shares,
    * then a `bins`-row aggregate. */
  def calibration(docs: DataFrame, bins: Int = 10): DataFrame = {
    require(bins > 1, s"bins must exceed 1, got $bins")
    val labels = weakLabels(docs).persist()
    val (_, cal) = scoredWithReliability(docs, labels, bins)
    graft.AutoUnpersist.afterFirstUse(cal.orderBy(col("bin")), labels)
  }

  /** Shared core of [[calibration]] and [[calibratedWeightedSample]]:
    * the round-6 predicted-probability frame and its per-bin reliability
    * table, SINGLE-SOURCED so the published audit table and the
    * weighting gate's branch input can never drift apart (a bin-edge or
    * rounding change lands in both by construction). Caller owns
    * `labels`' persist lifecycle. */
  private def scoredWithReliability(
      docs: DataFrame, labels: DataFrame, bins: Int)
      : (DataFrame, DataFrame) = {
    // one tokenize/explode pass shared by train and score; the persisted
    // relation is released by the callers' AutoUnpersist via `scored`'s
    // first materialization (both outputs derive from it)
    val toks = docTokens(docs)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val m = trainFromTokens(toks, labels)
    val scored = graft.AutoUnpersist.afterFirstUse(
      scoreTokens(m, toks), toks)
      .withColumn("p",
        round(lit(1.0) / (lit(1.0) + exp(-col("log_odds"))), 6))
    val cal = scored
      .join(labels.select(col("doc_id"), col("pass")), Seq("doc_id"))
      .withColumn("bin",
        least(floor(col("p") * bins), lit(bins - 1L)).cast("int"))
      .groupBy(col("bin"))
      .agg(
        count(lit(1)).as("n"),
        sum(when(col("pass"), 1L).otherwise(0L)).as("n_pos"),
        round(sum(col("p").cast("decimal(18,6)")).cast("double")
          / count(lit(1)), 6).as("mean_pred"))
      .withColumn("pos_rate",
        round(col("n_pos").cast("double") / col("n"), 6))
    (scored, cal)
  }

  /** Calibration-GATED quality weighting — the consumer of
    * [[calibration]]'s verdict, closing the loop the reliability table
    * exists for: IF the classifier is calibrated (every decile's
    * |mean_pred − pos_rate| ≤ `maxGap`), its predicted probabilities
    * serve as per-doc sampling WEIGHTS ([[Sampling.weightedKeepExpr]]
    * with rate = p — DSIR-style soft filtering, high-quality docs kept
    * proportionally more); otherwise the probabilities are NOT
    * trustworthy as weights and the selection falls back to the hard
    * threshold GATE (`log_odds > 0`), which only needs the ranking to
    * be right at one operating point. The emitted `mode` column makes
    * the branch auditable downstream.
    *
    * The branch is decided IN-PLAN: the reliability gap is a one-row
    * aggregate over the bins-sized calibration table, crossed back as a
    * one-row broadcast — no driver collect, so the whole key stays a
    * deterministic pure function of the corpus in both engines (the
    * gap compares round-6 values, so the branch itself is
    * engine-agreed).
    *
    * @return kept docs as (doc_id, p, mode); `p` is the round-6
    *         predicted quality probability, `mode` is 'weighted' or
    *         'gate' (constant per run). */
  def calibratedWeightedSample(
      docs: DataFrame, maxGap: Double = 0.25, bins: Int = 10): DataFrame = {
    require(maxGap > 0 && maxGap < 1, s"maxGap must be in (0,1), got $maxGap")
    require(bins > 1, s"bins must exceed 1, got $bins")
    val labels = weakLabels(docs).persist()
    val (scored, cal) = scoredWithReliability(docs, labels, bins)
    val gap = cal.agg(
      max(abs(col("mean_pred") - col("pos_rate"))).as("gap"))
    val out = scored
      .crossJoin(broadcast(gap))
      .withColumn("mode",
        when(col("gap") <= maxGap, lit("weighted")).otherwise(lit("gate")))
      .filter(when(col("gap") <= maxGap,
          Sampling.weightedKeepExpr(col("doc_id").cast("string"), col("p")))
        .otherwise(col("log_odds") > 0.0))
      .select(col("doc_id"), col("p"), col("mode"))
      .orderBy(col("doc_id"))
    graft.AutoUnpersist.afterFirstUse(out, labels)
  }
}
