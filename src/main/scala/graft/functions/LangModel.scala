package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Count-based n-gram language model over the corpus — the CCNet-style
  * quality gate: train a smoothed bigram LM on the corpus itself, score
  * every document's perplexity under it, and bucket the corpus into
  * head / middle / tail tiers that downstream mixing samples from.
  * (CCNet: Wenzek et al., "CCNet: Extracting High Quality Monolingual
  * Datasets from Web Crawl Data", 2019 — there the LM is KenLM trained
  * on Wikipedia; here the LM is the corpus's own bigram table, which
  * keeps the whole pipeline closed over the input and SQL-checkable.)
  *
  * The reference has no language-model surface (its whole scalar tier is
  * user lambdas, `/root/reference/source/koalas/dataframe.d:238-262`);
  * this is LLM-pipeline tier like the rest of [[Text]].
  *
  * Scale shape: training is ONE corpus-bigram aggregate (map-side
  * partial count, bigram-keyed shuffle) whose result is vocab²-bounded
  * but in practice distinct-bigram-sized; the context-count table folds
  * out of it with a vocab-keyed aggregate. Scoring re-joins the doc
  * bigram stream against the count tables — the bigram join shuffles on
  * the bigram key, the context join broadcasts when the vocab table
  * fits (size-gated, shuffled fallback at 100 TB vocabularies) — and
  * per-doc reduction is a map-side-combined sum. No collect touches
  * anything larger than the scalar vocabulary size. Every step is
  * integer-count arithmetic except the final log/exp, which both
  * engines round to 6 decimals — the convention the other
  * float-emitting oracles here use.
  */
object LangModel {

  /** (doc_id, w1, w2): one row per ADJACENT token pair of each doc.
    * Token array bound to an attribute first — an inline `split` inside
    * the transform lambda would re-tokenize per element (see
    * [[NearDup.shinglesOf]]). */
  def docBigrams(docs: DataFrame): DataFrame =
    NearDup.fanOut(docs)
      .select(col("doc_id"), split(col("text"), " ").as("_t"))
      .filter(size(col("_t")) >= 2)
      .select(col("doc_id"),
        explode(transform(slice(col("_t"), lit(1), size(col("_t")) - 1),
          (w, i) => struct(w.as("w1"),
            element_at(col("_t"), i + lit(2)).as("w2")))).as("_bg"))
      .select(col("doc_id"), col("_bg.w1").as("w1"), col("_bg.w2").as("w2"))

  /** A trained bigram LM: the bigram count table (w1, w2, _n12), the
    * context count table (w1, _n1), and the scalar vocabulary size —
    * everything [[scoreWith]] needs, FROZEN at train time. The frames
    * are vocabulary-bounded, not corpus-bounded. */
  final case class BigramLm(counts: DataFrame, contexts: DataFrame, vocab: Long)

  /** Train the add-one-smoothed bigram LM on `ref`: one bigram-keyed
    * corpus aggregate, a vocab-keyed fold of it, and the scalar
    * vocabulary count — the one driver-side value. */
  def train(ref: DataFrame): BigramLm = {
    val c2 = docBigrams(ref)
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("_n12"))
    val c1 = c2.groupBy(col("w1")).agg(sum(col("_n12")).as("_n1"))
    val vocab = ref.select(explode(split(col("text"), " ")).as("w"))
      .agg(countDistinct(col("w"))).collect()(0).getLong(0)
    BigramLm(c2, c1, vocab)
  }

  /** Score pre-exploded bigrams under `lm`. LEFT joins + coalesce(0):
    * a bigram or context unseen at train time scores pure smoothing
    * mass (1/(c1+V), or 1/V for an unseen context) instead of dropping
    * — the frozen-LM contract the streaming twin relies on.
    *
    * The context/continuation tables get NO sizeProxy: they are
    * aggregates of an unbounded vocabulary, so no source scan stands in
    * for their size (passing the table itself would be a no-op). If
    * Catalyst's post-aggregate estimate overshoots the broadcast
    * threshold, the join falls back to a shuffle and AQE re-converts it
    * to broadcast at runtime from the ACTUAL size — the safe direction
    * at 100 TB, where a web-scale vocabulary genuinely may not fit. */
  private def scoreBigrams(
      bg: DataFrame, lm: BigramLm,
      countsProxy: Option[DataFrame] = None): DataFrame =
    bg
      .join(NearDup.broadcastIfSmall(lm.counts, countsProxy),
        Seq("w1", "w2"), "left")
      .join(NearDup.broadcastIfSmall(lm.contexts),
        Seq("w1"), "left")
      .select(col("doc_id"),
        log((coalesce(col("_n12"), lit(0L)) + lit(1)).cast("double") /
          (coalesce(col("_n1"), lit(0L)) + lit(lm.vocab)).cast("double"))
          .as("_lp"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        round(exp(-sum(col("_lp")) / count(lit(1))), 6).as("ppl"))

  /** Per-document perplexity of `docs` under a PRE-TRAINED (frozen) LM
    * — the production scoring path: train once on the reference corpus,
    * score every ingest batch (or stream micro-batch:
    * [[graft.streaming.StreamOps.perplexityStream]]) against it. */
  def scoreWith(lm: BigramLm, docs: DataFrame): DataFrame =
    scoreBigrams(docBigrams(docs), lm)

  /** Per-document perplexity under the corpus-trained add-one-smoothed
    * bigram LM: `P(w2|w1) = (c(w1,w2) + 1) / (c(w1,·) + V)` with `V` the
    * distinct-token vocabulary size; `ppl(doc) = exp(-mean ln P)` over
    * the doc's bigrams, rounded to 6 decimals. Docs with fewer than two
    * tokens have no bigram and are absent (they carry no LM evidence —
    * route them through [[Text.textStats]] length gates instead).
    * Self-scoring specialization of [[train]]+[[scoreWith]], sharing one
    * persisted bigram pass between training and scoring.
    *
    * Output: (doc_id, n_bigrams, ppl). Low ppl = head (predictable,
    * template-like), high ppl = tail (noisy); self-trained, so boiler-
    * plate scores LOW — the CCNet tail cut drops gibberish, the head
    * cut drops boilerplate. */
  def perplexity(docs: DataFrame): DataFrame = {
    val bg = docBigrams(docs).persist()
    // persisted + forced: c2 feeds TWO broadcast builds (the context fold
    // and the counts join) whose stages launch concurrently and would
    // otherwise race to compute the aggregate — and its one eager job
    // also materializes the bg cache before the scoring branch reads it
    // (the same concurrent-materialization race, one level down; the KN
    // twin gets this for free from its types count)
    val c2 = bg.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("_n12"))
      .persist()
    c2.count()
    val c1 = c2.groupBy(col("w1")).agg(sum(col("_n12")).as("_n1"))
    val vocab = vocabOf(docs)
    // counts join size-gated on the SOURCE scan (guide §3.1: post-
    // aggregate Catalyst estimates wildly overestimate — the bigram
    // count table is ≤ the raw text bytes it derives from): a small
    // corpus broadcasts the count table and the scoring join never
    // shuffles the corpus-sized bigram stream; at 100 TB the gate
    // falls back to the shuffled join.
    graft.AutoUnpersist.afterFirstUse(
      scoreBigrams(bg, BigramLm(c2, c1, vocab), countsProxy = Some(docs)),
      bg, c2)
  }

  /** Distinct-token vocabulary size — the one driver scalar of both
    * smoothers. */
  private def vocabOf(docs: DataFrame): Long =
    docs.select(explode(split(col("text"), " ")).as("w"))
      .agg(countDistinct(col("w"))).collect()(0).getLong(0)

  /** A trained interpolated Kneser-Ney bigram LM — the KenLM-grade
    * smoothing CCNet actually ships (Wenzek et al. 2019 use a KenLM
    * 5-gram; Kneser–Ney is its estimator), upgrading [[BigramLm]]'s
    * add-one: absolute discounting on seen bigrams, with the discounted
    * mass re-spent on the CONTINUATION distribution (how many distinct
    * contexts a word follows — "Francisco" is frequent but only ever
    * follows "San", so its continuation probability is tiny and novel
    * contexts stop predicting it). All tables are vocabulary-bounded:
    * `counts` (w1, w2, _n12), `contexts` (w1, _n1 total, _nf distinct
    * continuations), `cont` (w2, _nc distinct left-contexts), plus two
    * scalars (distinct bigram types, vocabulary size).
    *
    * `counts` is persisted at train time (three folds and every scoring
    * batch read it); release with [[KnLm.unpersist]] when the model
    * retires. */
  final case class KnLm(counts: DataFrame, contexts: DataFrame,
      cont: DataFrame, bigramTypes: Long, vocab: Long, discount: Double) {
    def unpersist(): Unit = { counts.unpersist(blocking = false); () }
  }

  /** Train the interpolated Kneser-Ney bigram LM on `ref`: ONE
    * bigram-keyed corpus aggregate (persisted), two vocab-keyed folds of
    * it, and two driver scalars. `discount` is the absolute discount D
    * (0.75 — the Ney/Essen/Kneser standard); fixed rather than estimated
    * from count-of-counts so both engines derive the identical model. */
  def trainKn(ref: DataFrame, discount: Double = 0.75): KnLm =
    trainKnFromBigrams(docBigrams(ref), vocabOf(ref), discount)

  /** [[trainKn]] over a precomputed (doc_id, w1, w2) bigram relation —
    * the seam [[perplexityKn]] uses to share ONE bigram pass between
    * training and self-scoring (the standalone composition tokenized the
    * corpus twice). */
  private def trainKnFromBigrams(
      bg: DataFrame, vocab: Long, discount: Double): KnLm = {
    require(discount > 0 && discount < 1,
      s"absolute discount must be in (0, 1), got $discount")
    val c2 = bg
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("_n12"))
      .persist()
    val ctx = c2.groupBy(col("w1"))
      .agg(sum(col("_n12")).as("_n1"), count(lit(1)).as("_nf"))
    val cont = c2.groupBy(col("w2")).agg(count(lit(1)).as("_nc"))
    val types = c2.count()
    KnLm(c2, ctx, cont, types, vocab, discount)
  }

  /** Score pre-exploded bigrams under a frozen KN model. Seen context:
    * `P(w2|w1) = (max(c12-D, 0) + D·N1+(w1·)·Pcont(w2)) / c(w1·)`; unseen
    * context backs off fully to the continuation distribution. `Pcont`
    * is add-one smoothed over bigram types —
    * `(N1+(·w2) + 1) / (types + V)` — so words never seen as a
    * continuation (or at all) still carry mass and the frozen model is
    * total over any scoring batch, the [[scoreBigrams]] contract. */
  private def scoreBigramsKn(
      bg: DataFrame, lm: KnLm,
      countsProxy: Option[DataFrame] = None): DataFrame = {
    val pcont = (coalesce(col("_nc"), lit(0L)) + lit(1)).cast("double") /
      lit(lm.bigramTypes + lm.vocab).cast("double")
    val seen = (greatest(coalesce(col("_n12"), lit(0L)).cast("double") -
        lit(lm.discount), lit(0.0)) +
      lit(lm.discount) * col("_nf") * pcont) / col("_n1").cast("double")
    bg
      .join(NearDup.broadcastIfSmall(lm.counts, countsProxy),
        Seq("w1", "w2"), "left")
      .join(NearDup.broadcastIfSmall(lm.contexts),
        Seq("w1"), "left")
      .join(NearDup.broadcastIfSmall(lm.cont),
        Seq("w2"), "left")
      .select(col("doc_id"),
        when(col("_n1").isNotNull, log(seen)).otherwise(log(pcont)).as("_lp"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        round(exp(-sum(col("_lp")) / count(lit(1))), 6).as("ppl"))
  }

  /** Per-document perplexity under a pre-trained (frozen) KN model —
    * the production path: train on the reference corpus once, score
    * every batch (or micro-batch: [[graft.streaming.StreamOps
    * .knPerplexityStream]]) against it. */
  def scoreWithKn(lm: KnLm, docs: DataFrame): DataFrame =
    scoreBigramsKn(docBigrams(docs), lm)

  /** Self-scored interpolated Kneser-Ney perplexity of the corpus —
    * [[perplexity]]'s smoothing upgrade, same output shape
    * (doc_id, n_bigrams, ppl). Unlike add-one, KN separates "frequent
    * because versatile" from "frequent because one template repeats a
    * phrase": boilerplate bigrams are discounted toward their
    * continuation mass, sharpening the head/tail contrast the tier cut
    * consumes. */
  def perplexityKn(docs: DataFrame, discount: Double = 0.75): DataFrame = {
    // Self-scoring shares ONE persisted bigram pass between training and
    // scoring (the train-then-score composition tokenized and exploded
    // the corpus twice), and the counts join is size-gated on the source
    // scan exactly as in [[perplexity]].
    val bg = docBigrams(docs).persist()
    val lm = trainKnFromBigrams(bg, vocabOf(docs), discount)
    graft.AutoUnpersist.afterFirstUse(
      scoreBigramsKn(bg, lm, countsProxy = Some(docs)), bg, lm.counts)
  }

  /** CCNet head/middle/tail tiers: split the scored corpus at the exact
    * discrete terciles of the (rounded) perplexity distribution —
    * `head` = ppl ≤ q(1/3), `tail` = ppl > q(2/3), `middle` between.
    * Threshold-based (every tied doc lands in the same tier), computed
    * with the exact distributed quantile machinery ([[Quantiles]]), so
    * both engines derive the SAME cut points independently — no rank
    * window, no single-partition sort.
    *
    * Output: (tier, n_docs, min_ppl, max_ppl) — the mixing dashboard's
    * three-row summary. */
  def perplexityTiers(docs: DataFrame): DataFrame =
    perplexityTiersOf(perplexity(docs))

  /** [[perplexityTiers]] from an ALREADY-SCORED (doc_id, n_bigrams, ppl)
    * frame — the served-model twin's entry point: score under a
    * [[ModelStore]]-published LM ([[scoreWith]]/[[scoreWithKn]]), then
    * tier here, so the tier cuts never force a retrain. */
  def perplexityTiersOf(scored: DataFrame): DataFrame = {
    val ppl = scored.persist()
    // a corpus with no 2+-token documents has no perplexities at all:
    // return the EMPTY three-column summary instead of letting the
    // quantile machinery throw its unrelated-looking "no non-null
    // values" — the empty-input convention of every other operator
    if (ppl.limit(1).count() == 0L) {
      ppl.unpersist(blocking = false)
      import org.apache.spark.sql.types.{DoubleType, LongType, StringType, StructField, StructType}
      return scored.sparkSession.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](),
        StructType(Seq(
          StructField("tier", StringType),
          StructField("n_docs", LongType),
          StructField("min_ppl", DoubleType),
          StructField("max_ppl", DoubleType))))
    }
    // two rows (q, value) — the bounded driver-side collect of this op
    val cuts = Quantiles.exactQuantilesGlobal(
        ppl, "ppl", Seq(1.0 / 3, 2.0 / 3))
      .orderBy(col("q")).collect()
    val (lo, hi) = (cuts(0).getDouble(1), cuts(1).getDouble(1))
    graft.AutoUnpersist.afterFirstUse(
      ppl
        .select(col("ppl"),
          when(col("ppl") <= lo, lit("head"))
            .when(col("ppl") <= hi, lit("middle"))
            .otherwise(lit("tail")).as("tier"))
        .groupBy(col("tier"))
        .agg(count(lit(1)).as("n_docs"),
          min(col("ppl")).as("min_ppl"), max(col("ppl")).as("max_ppl"))
        .orderBy(col("tier")),
      ppl)
  }
}
