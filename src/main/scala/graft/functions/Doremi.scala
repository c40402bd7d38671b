package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Domain-mixture reweighting — a deterministic, SQL-checkable analog of
  * DoReMi (Xie et al., "DoReMi: Optimizing Data Mixtures Speeds Up
  * Language Model Pretraining", 2023). DoReMi trains a proxy model with
  * group DRO and upweights domains whose EXCESS LOSS (loss beyond a
  * reference model's) is largest; the published recipe's output is one
  * tiny vector — a weight per domain — that the real pretraining run
  * then samples by.
  *
  * This engine's closed-over-the-corpus variant keeps the shape but
  * swaps the learned proxies for the corpus-trained bigram LM the CCNet
  * gate already maintains ([[LangModel.perplexity]]): a domain's loss is
  * its docs' mean log-perplexity, the reference loss is the corpus-wide
  * mean, and excess is clipped at zero exactly as DoReMi clips group
  * excess loss. The exponentiated-gradient update then becomes one
  * closed-form step from the baseline token shares:
  *
  *   weight(d) ∝ tokens(d) · exp(max(0, nll(d) − nll(corpus)) / τ)
  *
  * normalized over domains — domains the LM finds hardest (novel,
  * under-represented text) gain share; domains at or below corpus-mean
  * difficulty keep their token-proportional baseline. τ is the usual
  * temperature: τ→∞ recovers the baseline mixture, small τ concentrates
  * on the hardest domain.
  *
  * The reference has no mixing surface (its scalar tier is user lambdas,
  * `/root/reference/source/koalas/dataframe.d:238-262`); this is
  * LLM-pipeline tier, the planning half of [[Sampling.targetMixture]] —
  * feed the weights straight in as that operator's target shares.
  *
  * Scale shape: everything after [[LangModel.perplexity]] (one bigram
  * shuffle, see its scaladoc) is a doc_id equality join to recover the
  * domain column, ONE domain-keyed aggregate (map-side partial), and
  * two one-row/domain-count-sized broadcast folds — the domain table is
  * mixture-sized (thousands at most), never corpus-sized. No collect
  * anywhere; the weights stay a DataFrame for [[Sampling]] to join.
  *
  * Determinism across engines: per-doc ppl is rounded to 6 decimals by
  * the LM (both engines), mean-NLL works on ln(ppl) of those rounded
  * values, excess is rounded to 6 BEFORE the exp so both engines
  * exponentiate identical arguments, and the final weight/share columns
  * round to 6 after the normalizing divide.
  */
object Doremi {

  /** Per-domain DoReMi-style mixture weights over `domainCol`.
    *
    * Output, one row per domain, ordered by domain:
    * (domain, n_docs, n_tokens, base_w, mean_nll, excess, weight) —
    * `n_tokens` counts scored bigrams (the LM's token-evidence measure),
    * `base_w` is the baseline token share, `mean_nll` the domain's mean
    * ln-perplexity, `excess` its clipped distance above corpus mean,
    * `weight` the reweighted mixture share (sums to 1). Docs with fewer
    * than 2 tokens carry no LM evidence and are absent, exactly as in
    * [[LangModel.perplexity]]. */
  def domainReweight(
      docs: DataFrame,
      domainCol: String,
      temperature: Double = 1.0): DataFrame = {
    require(temperature > 0, s"temperature must be positive, got $temperature")
    val scored = LangModel.perplexity(docs)
      .join(docs.select(col("doc_id"), col(domainCol).as("domain")), "doc_id")
    // the ONE corpus-sized reduction: domain cells of (docs, tokens,
    // summed ln ppl). Everything below folds over this mixture-sized
    // frame, so persist it across the two global passes.
    val cells = scored
      .groupBy(col("domain"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_bigrams")).as("n_tokens"),
        sum(log(col("ppl"))).as("_snll"))
      .persist()
    val totals = cells.agg(
      (sum(col("_snll")) / sum(col("n_docs"))).as("_gnll"),
      sum(col("n_tokens")).as("_ttok"))
    val excess = cells.crossJoin(broadcast(totals))
      .select(col("domain"), col("n_docs"), col("n_tokens"), col("_ttok"),
        (col("_snll") / col("n_docs")).as("_mnll"),
        round(greatest(col("_snll") / col("n_docs") - col("_gnll"), lit(0d)),
          6).as("excess"))
    val z = excess
      .agg(sum(col("n_tokens") * exp(col("excess") / temperature)).as("_z"))
    graft.AutoUnpersist.afterFirstUse(
      excess.crossJoin(broadcast(z))
        .select(col("domain"), col("n_docs"), col("n_tokens"),
          round(col("n_tokens").cast("double") / col("_ttok"), 6).as("base_w"),
          round(col("_mnll"), 6).as("mean_nll"),
          col("excess"),
          round(col("n_tokens") * exp(col("excess") / temperature) / col("_z"),
            6).as("weight"))
        .orderBy(col("domain")),
      cells)
  }

  /** The end-to-end composition the planner exists FOR: sample `docs`
    * to the DoReMi mixture in one pass. The reweight table is collected
    * to [[Sampling.targetMixture]]'s target map — mixture-sized by
    * contract (thousands of domains at most), the bounded-metadata
    * collect class — and the sampler is one count pass plus a codegen'd
    * md5-threshold filter: membership stays a pure function of
    * (row key, domain weights), reproducible across engines and runs
    * and stable under late-arriving data. */
  def reweightedSample(
      docs: DataFrame,
      domainCol: String,
      key: org.apache.spark.sql.Column,
      temperature: Double = 1.0): DataFrame = {
    val targets = domainReweight(docs, domainCol, temperature)
      .select(col("domain"), col("weight")).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    // A domain whose docs ALL have <2 tokens never reaches the LM
    // scoring table and is absent from `targets`; a weight that rounds
    // to 0.0 at 6 decimals would trip targetMixture's require(p > 0)
    // with an opaque error. Either way a whole domain would vanish from
    // the sample — fail loudly NAMING the domains instead of silently
    // dropping training data. The distinct-domain probe is the same
    // mixture-sized bounded-collect class as the reweight table itself.
    val allDomains = docs.select(col(domainCol).cast("string").as("d"))
      .where(col("d").isNotNull).distinct().collect().map(_.getString(0))
    val dropped = allDomains.filterNot(d => targets.getOrElse(d, 0.0) > 0)
    require(dropped.isEmpty,
      s"reweightedSample would drop domain(s) ${dropped.sorted.mkString(", ")}: " +
        "each has no LM-scorable docs (<2 tokens throughout) or a DoReMi " +
        "weight that rounds to 0 at 6 decimals. Exclude them explicitly " +
        "before sampling, or raise `temperature` to flatten the mixture.")
    Sampling.targetMixture(docs, col(domainCol), key, targets)
  }

  /** Data-constrained epoch planning on top of [[domainReweight]] —
    * the Muennighoff et al. 2023 ("Scaling Data-Constrained Language
    * Models") question: the mixture says each domain SHOULD contribute
    * `weight·budget` tokens, but a domain only HAS `n_tokens` — how many
    * epochs (repeats) does the plan imply, and what mixture is actually
    * achievable once repeats are capped? Per domain:
    *   - `epochs` = weight·budget / n_tokens (budget =
    *     `budgetFactor` × corpus tokens) — the implied repeat count;
    *   - `eff_epochs` = min(epochs, `maxEpochs`) — the paper's finding
    *     that value decays past ~4 epochs, applied as a hard cap;
    *   - `eff_tokens` = ⌊eff_epochs · n_tokens⌋ — what the domain can
    *     actually contribute;
    *   - `achieved_share` — the post-cap renormalized mixture, the
    *     shares [[Sampling.targetMixture]] should ACTUALLY be fed (a
    *     capped domain's shortfall flows pro-rata to the others).
    *
    * Scale shape: one extra fold + broadcast join over the
    * mixture-sized reweight table — the corpus is touched exactly as
    * many times as [[domainReweight]] touches it, no more.
    *
    * Determinism across engines: starts from the 6-rounded `weight`,
    * every derived value is a short chain of single IEEE ops on rounded
    * inputs (each correctly rounded in both engines), `eff_tokens` is
    * floored to an exact BIGINT so its total sums exactly, and the final
    * share rounds to 6 after one exact-int division. */
  def epochPlan(
      docs: DataFrame,
      domainCol: String,
      budgetFactor: Double = 2.0,
      maxEpochs: Double = 4.0,
      temperature: Double = 1.0): DataFrame = {
    require(budgetFactor > 0, s"budgetFactor must be positive, got $budgetFactor")
    require(maxEpochs > 0, s"maxEpochs must be positive, got $maxEpochs")
    // One pipeline instantiation: the reweight table is persisted
    // (mixture-sized rows, computed once), and the two normalizing
    // totals fold to ONE-ROW driver scalars — the bounded-metadata
    // collect class (codebooks, per-stratum maps), never row data. A
    // broadcast-fold formulation instead re-instantiates the whole LM
    // pipeline under each fold branch in the audited plan.
    val w = domainReweight(docs, domainCol, temperature)
      .select(col("domain"), col("n_tokens"), col("weight"))
      .persist()
    // null-safe scalar fold (empty corpus -> empty plan, no NPE)
    def scalarSum(df: DataFrame, c: String): Long = {
      val r = df.agg(sum(col(c))).collect()(0)
      if (r.isNullAt(0)) 0L else r.getLong(0)
    }
    val tt = scalarSum(w, "n_tokens")
    val planned = w
      .select(col("domain"), col("n_tokens"), col("weight"),
        round(col("weight") * lit(tt * budgetFactor) / col("n_tokens"),
          6).as("epochs"))
      .select(col("domain"), col("n_tokens"), col("weight"), col("epochs"),
        least(col("epochs"), lit(maxEpochs)).as("eff_epochs"))
      .select(col("*"),
        floor(col("eff_epochs") * col("n_tokens")).cast("long").as("eff_tokens"))
    val et = scalarSum(planned, "eff_tokens")
    graft.AutoUnpersist.afterFirstUse(
      planned
        .select(col("domain"), col("n_tokens"), col("weight"), col("epochs"),
          col("eff_epochs"), col("eff_tokens"),
          round(col("eff_tokens").cast("double") / lit(et), 6)
            .as("achieved_share"))
        .orderBy(col("domain")),
      w)
  }
}
