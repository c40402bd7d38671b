package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** End-to-end corpus cleaning — the composition the individual EXT
  * operators exist FOR: a training corpus goes in, the documents that
  * survive quality filtering, exact dedup, near-dup removal, and
  * benchmark decontamination come out.
  *
  * Each criterion is computed independently over the full corpus and the
  * final answer is a set intersection/difference on `doc_id` — order-free
  * semantics (no "which filter ran first" ambiguity), which is also what
  * makes the whole pipeline reproducible across engines (the registered
  * `corpus_clean` query hash-matches DuckDB running the identical four
  * criteria).
  *
  * Scale shape: four independent passes over the corpus (each with the
  * scale properties documented on its operator — see SCALING.md) joined
  * by doc_id semi/anti joins whose right sides are id sets, orders of
  * magnitude smaller than the corpus. Nothing here adds a shuffle beyond
  * what the component operators already pay.
  */
object CorpusClean {

  /** Documents surviving all four criteria, with their quality score.
    *
    * Survives ⇔ quality ≥ `qualityMin` AND is its exact-duplicate group's
    * keeper (min doc_id) AND is not the higher id of any verified
    * near-dup pair at `jaccardT` AND shares < `minShared` shingles with
    * the benchmark.
    *
    * Uncached by default — a library entry point must not quietly route
    * through the per-JVM pair cache; pass `sharedPairs = true` when this
    * pipeline runs alongside other consumers of the same pair set (the
    * cluster report, the collapsed corpus) and the cached table is wanted.
    */
  def surviving(
      docs: DataFrame,
      bench: DataFrame,
      qualityMin: Double = 0.3,
      jaccardT: Double = 0.5,
      w: Int = 3,
      minShared: Long = 1L,
      sharedPairs: Boolean = false
  ): DataFrame = {
    val quality = Text.qualityScore(docs)
      .select(col("doc_id"), col("quality"))
      .filter(col("quality") >= qualityMin)
    val keepers = Dedup.exactGroups(docs).select(col("keep_id").as("doc_id"))
    val pairs =
      if (sharedPairs) NearDup.ngramJaccardPairsShared(docs, jaccardT, w)
      else NearDup.ngramJaccardPairs(docs, jaccardT, w)
    val nearDupDrop = pairs
      .select(col("id_b").as("doc_id")).distinct()
    val contaminated = Contamination.report(docs, bench, w, minShared)
      .select(col("doc_id"))
    quality
      .join(keepers, Seq("doc_id"), "left_semi")
      .join(nearDupDrop, Seq("doc_id"), "left_anti")
      .join(contaminated, Seq("doc_id"), "left_anti")
      .orderBy(col("doc_id"))
  }

  /** Filter-funnel attribution — the observability face of [[surviving]]:
    * WHICH rule is doing the cutting, and how much of it is redundant.
    * One row per rule in the canonical order (quality → exact-dup →
    * near-dup → contamination) with
    *   - `n_fail`: docs failing the rule (regardless of other rules),
    *   - `n_fail_only`: docs ONLY that rule rejects — the rule's unique
    *     contribution; a rule whose n_fail_only ≈ 0 is subsumed and a
    *     candidate to drop from the pipeline,
    *   - `n_pass_cum`: survivors of rules 1..k — the funnel curve; the
    *     last row equals [[surviving]]'s count.
    * The release-audit companion of `Profile.datacard`: a datacard says
    * what's IN the corpus, the funnel says what was cut and why.
    *
    * Scale shape: the rule flags are the SAME per-doc frames [[surviving]]
    * builds (share the per-JVM pair cache via `sharedPairs` when run
    * alongside it), combined into one boolean frame by doc_id equality
    * joins, then folded by ONE aggregate into a single 12-counter row —
    * the stack to 4 presentation rows operates on that one row. Nothing
    * after the flags frame is corpus-sized. */
  def funnel(
      docs: DataFrame,
      bench: DataFrame,
      qualityMin: Double = 0.3,
      jaccardT: Double = 0.5,
      w: Int = 3,
      minShared: Long = 1L,
      sharedPairs: Boolean = false
  ): DataFrame = {
    val pairs =
      if (sharedPairs) NearDup.ngramJaccardPairsShared(docs, jaccardT, w)
      else NearDup.ngramJaccardPairs(docs, jaccardT, w)
    val flags = Text.qualityScore(docs)
      .select(col("doc_id"), (col("quality") < qualityMin).as("fq"))
      .join(Dedup.exactGroups(docs)
        .select(col("keep_id").as("doc_id"), lit(true).as("_keep")),
        Seq("doc_id"), "left")
      .join(pairs.select(col("id_b").as("doc_id")).distinct()
        .withColumn("_nd", lit(true)), Seq("doc_id"), "left")
      .join(Contamination.report(docs, bench, w, minShared)
        .select(col("doc_id")).withColumn("_ct", lit(true)),
        Seq("doc_id"), "left")
      .select(col("fq"), col("_keep").isNull.as("fx"),
        coalesce(col("_nd"), lit(false)).as("fn"),
        coalesce(col("_ct"), lit(false)).as("fc"))
    def n(c: Column): Column = sum(when(c, 1L).otherwise(0L))
    flags.agg(
        n(col("fq")).as("a1"),
        n(col("fq") && !col("fx") && !col("fn") && !col("fc")).as("u1"),
        n(!col("fq")).as("c1"),
        n(col("fx")).as("a2"),
        n(col("fx") && !col("fq") && !col("fn") && !col("fc")).as("u2"),
        n(!col("fq") && !col("fx")).as("c2"),
        n(col("fn")).as("a3"),
        n(col("fn") && !col("fq") && !col("fx") && !col("fc")).as("u3"),
        n(!col("fq") && !col("fx") && !col("fn")).as("c3"),
        n(col("fc")).as("a4"),
        n(col("fc") && !col("fq") && !col("fx") && !col("fn")).as("u4"),
        n(!col("fq") && !col("fx") && !col("fn") && !col("fc")).as("c4"))
      .selectExpr("stack(4, " +
        "1, 'quality', a1, u1, c1, " +
        "2, 'exact_dup', a2, u2, c2, " +
        "3, 'near_dup', a3, u3, c3, " +
        "4, 'contamination', a4, u4, c4) " +
        "AS (stage, rule, n_fail, n_fail_only, n_pass_cum)")
      .orderBy(col("stage"))
  }
}
