package graft.functions

import org.apache.spark.sql.DataFrame
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
}
