package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for LLM-data pipelines (EXT tier). Exact dedup
  * here; MinHash/SimHash/n-gram near-dup in [[NearDup]]. The reference's
  * only dedup-shaped verb is whole-row `unique()`
  * (`/root/reference/source/koalas/dataframe.d:230-234`); a training-data
  * engine needs content-hash and near-duplicate variants that survive
  * 100 TB: everything below is groupBy-on-a-hash (one shuffle, map-side
  * combine, no pairwise comparisons outside candidate buckets).
  */
object Dedup {

  /** Canonical content key: hash of the normalized text. md5 (not
    * xxhash64) so the same key is computable by any engine — at scale one
    * would switch to xxhash64 (cheaper, codegen'd) via `contentKey64`. */
  def contentKey(text: Column): Column = md5(lower(trim(text)))

  /** 64-bit engine-native variant for production-scale grouping. */
  def contentKey64(text: Column): Column = xxhash64(lower(trim(text)))

  /** Exact dedup groups: one row per distinct normalized content with the
    * representative (minimum) doc_id and the duplicate count. Keeping
    * min(doc_id) rather than "first seen" makes the representative
    * deterministic under any partitioning (SURVEY §7.4). */
  def exactGroups(docs: DataFrame): DataFrame =
    docs
      .groupBy(contentKey(col("text")).as("h"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_dups"))
      .orderBy(col("h"))

  /** Exact-dedup pass: keep only the representative row per content key —
    * the operator a pipeline actually runs. Implemented as a window-free
    * self-semi-join-free aggregate: group to representatives, then
    * broadcast-or-shuffle join back is unnecessary because we aggregate
    * the full row via min_by. */
  def dropExactDups(docs: DataFrame): DataFrame = {
    val cols = docs.columns.map(c => min_by(col(c), col("doc_id")).as(c))
    docs
      .groupBy(contentKey(col("text")).as("_h"))
      .agg(cols.head, cols.tail.toIndexedSeq: _*)
      .drop("_h")
  }

  /** Per-source dedup health report — the ingest dashboard a corpus
    * pipeline publishes per batch: for every `source`, the doc count,
    * how many docs are exact COPIES (same content key as a smaller
    * doc_id — the rows `dropExactDups` would drop), how many are
    * flagged by the near-dup pair table, and the exact-copy rate.
    *
    * `nearPairs` is caller-supplied (id_a, id_b) so the expensive pair
    * generation can come from the shared [[NearDup]] cache — this
    * report adds only a content-key aggregate, a key join-back, and a
    * doc-id semi-join: nothing here exceeds the cost of `dedup_exact`
    * itself. One IEEE division per source row. */
  def sourceReport(docs: DataFrame, nearPairs: DataFrame): DataFrame = {
    val keyed = docs.select(col("doc_id"), col("source"),
      contentKey(col("text")).as("_h"))
    val keepers = keyed.groupBy(col("_h")).agg(min(col("doc_id")).as("_keep"))
    val near = nearPairs.select(col("id_a").as("doc_id"))
      .union(nearPairs.select(col("id_b").as("doc_id")))
      .distinct().withColumn("_near", lit(1))
    keyed.join(keepers, "_h")
      .join(near, Seq("doc_id"), "left")
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("doc_id") =!= col("_keep"), 1L).otherwise(0L))
          .as("n_exact_copies"),
        sum(when(col("_near").isNotNull, 1L).otherwise(0L))
          .as("n_near_flagged"))
      .withColumn("exact_rate",
        col("n_exact_copies").cast("double") / col("n_docs"))
  }

  /** Provenance-aware near-dup pairs: only the pairs whose two docs come
    * from DIFFERENT `source` values — the syndication/mirror detector
    * (cross-source copies are usually scraped republication and the ones
    * a licensing/attribution pass must review; intra-source near-dups
    * are ordinary template reuse handled by the plain dedup path).
    *
    * Scale shape: the pair table is the banded near-dup output (edge-
    * sized); the two provenance lookups are doc_id equality joins
    * against a (doc_id, source) projection — size-gated broadcast with
    * the corpus scan as the size proxy, shuffled fallback at 100 TB. */
  def crossSourcePairs(docs: DataFrame, threshold: Double): DataFrame = {
    val src = docs.select(col("doc_id"), col("source"))
    def lookup(side: String) = NearDup.broadcastIfSmall(
      src.select(col("doc_id").as(side), col("source").as(s"src_$side")),
      sizeProxy = Some(docs))
    NearDup.ngramJaccardPairsShared(docs, threshold)
      .join(lookup("id_a"), Seq("id_a"))
      .join(lookup("id_b"), Seq("id_b"))
      .filter(col("src_id_a") =!= col("src_id_b"))
      .select(col("id_a"), col("src_id_a").as("src_a"),
        col("id_b"), col("src_id_b").as("src_b"), col("jaccard"))
      .orderBy(col("id_a"), col("id_b"))
  }

  /** Syndication rollup of [[crossSourcePairs]]: near-dup pair counts per
    * UNORDERED source pair (cells keyed src_lo ≤ src_hi so the matrix is
    * triangular) — the dashboard that names which feeds copy which. */
  def syndicationReport(docs: DataFrame, threshold: Double): DataFrame =
    crossSourcePairs(docs, threshold)
      .select(
        least(col("src_a"), col("src_b")).as("src_lo"),
        greatest(col("src_a"), col("src_b")).as("src_hi"))
      .groupBy(col("src_lo"), col("src_hi"))
      .agg(count(lit(1)).as("n_pairs"))
      .orderBy(col("src_lo"), col("src_hi"))

  /** Threshold-sensitivity sweep — [[graft.functions.NearDup.lshTune]]'s
    * data-driven companion: the tuner plans banding for a CHOSEN
    * threshold; this measures, on the actual corpus, how much the choice
    * matters — per candidate threshold t ∈ {minThreshold} ∪ {0.1-grid
    * strictly above it, …, 0.9} (minThreshold itself is always the
    * loosest row, even when it isn't a 0.1 multiple; minThreshold
    * > 0.9 degrades to the single-row sweep), how many near-dup pairs
    * and how many distinct documents
    * would be flagged at Jaccard ≥ t. A cliff between two rows means the
    * corpus has a dup-mass mode there (mirrors/templates); a flat tail
    * means the threshold barely matters above it. Run BEFORE committing
    * a threshold for a 100 TB dedup pass — rerunning the pass to try
    * another threshold costs a corpus rescan, this sweep costs one.
    *
    * Scale shape: ONE pair-finding pass at the LOOSEST candidate
    * threshold (the pair pipeline's own prefix-filter bound), then a
    * per-pair 7-way threshold explode + two aggregates over the
    * PAIR-sized table and a threshold-count-sized join — nothing
    * corpus-sized past the shared pair pipeline. */
  def thresholdSweep(
      docs: DataFrame,
      minThreshold: Double = 0.3,
      w: Int = 3): DataFrame = {
    require(minThreshold > 0 && minThreshold < 1,
      s"minThreshold must be in (0, 1), got $minThreshold")
    // Grid = minThreshold itself plus every 0.1-multiple strictly above
    // it up to 0.9 — so the loosest row always matches the documented
    // "t in {minThreshold, …}" contract even for non-0.1-multiple
    // inputs (0.35 → {0.35, 0.4, …, 0.9}), and near-1.0 inputs degrade
    // to the single-row sweep {minThreshold} instead of an empty grid.
    val grid = (minThreshold +:
      (math.ceil(minThreshold * 10).toInt to 9).map(_ / 10.0)
        .filter(_ > minThreshold)).sorted
    val flagged = NearDup.ngramJaccardPairsShared(docs, minThreshold, w)
      .select(col("id_a"), col("id_b"), col("jaccard"),
        explode(array(grid.map(lit): _*)).as("threshold"))
      .filter(col("jaccard") >= col("threshold"))
    val nPairs = flagged.groupBy(col("threshold"))
      .agg(count(lit(1)).as("n_pairs"))
    val nDocs = flagged
      .select(col("threshold"),
        explode(array(col("id_a"), col("id_b"))).as("d"))
      .groupBy(col("threshold"))
      .agg(count_distinct(col("d")).as("n_docs"))
    nPairs.join(nDocs, Seq("threshold")).orderBy(col("threshold"))
  }
}
