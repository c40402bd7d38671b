package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Phrase-blocklist screening — the standard toxicity/spam/compliance
  * filter step of a corpus-cleaning pipeline (CCNet/RefinedWeb-style
  * pipelines drop or flag documents containing listed phrases).
  *
  * Scale shape: this is a TOKEN-SHINGLE EQUALITY JOIN, not a per-phrase
  * scan. A `LIKE '%p%'` OR-chain is O(docs × phrases × doc length) and
  * dies first on a 10k-phrase list; here each document explodes once
  * into its distinct L-token grams per DISTINCT PHRASE LENGTH L (a
  * handful of lengths, collected as bounded metadata), and the grams
  * meet the broadcast phrase table in an equality join — cost is
  * O(corpus tokens × #lengths) map-side plus a phrase-hit-sized
  * aggregate, independent of blocklist size beyond the broadcast.
  * Matching is case-insensitive on whole-token boundaries (the same
  * single-space token model as the near-dup family).
  */
object Blocklist {

  /** Per-document screen: `(doc_id, n_hits, flagged)` where `n_hits` is
    * the number of DISTINCT blocklist phrases present in the document
    * (multiplicity inside one document does not inflate the count) and
    * `flagged = n_hits > 0`. One row per input document.
    *
    * @param phrases blocklist frame; `phraseCol` holds space-separated
    *                token phrases (vocabulary-level: list-sized, it is
    *                broadcast). Blank entries are dropped; matching is
    *                on lowercased tokens.
    *
    * Note: the distinct phrase LENGTHS are collected eagerly — one tiny
    * metadata job, bounded by the longest phrase, same convention as the
    * IVF/quantizer training collects. */
  def phraseHits(
      docs: DataFrame, phrases: DataFrame, phraseCol: String): DataFrame = {
    val (counts, p) = hitCounts(docs, phrases, phraseCol)
    graft.AutoUnpersist.afterFirstUse(
      docs.select(col("doc_id"))
        .join(counts, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("n_hits"), lit(0L)).as("n_hits"),
          (coalesce(col("n_hits"), lit(0L)) > 0L).as("flagged")),
      p)
  }

  /** The shared screen core: `(doc_id, n_hits)` for documents with at
    * least one distinct-phrase hit, plus the persisted phrase-table
    * handle (the caller owns its release). `docs` may be a STREAMING
    * frame — every stage is a per-row gram expansion, a broadcast
    * equality join against the static phrase table, and a per-doc
    * aggregate, all of which Structured Streaming runs per micro-batch
    * ([[graft.streaming.StreamOps.blocklistStream]] is that face). */
  private[graft] def hitCounts(
      docs: DataFrame, phrases: DataFrame, phraseCol: String
  ): (DataFrame, DataFrame) = {
    val p = phrases
      .select(lower(trim(col(phraseCol))).as("_p"))
      .filter(col("_p").isNotNull && col("_p") =!= "").distinct()
      .withColumn("_np", size(split(col("_p"), " ")))
      .persist()
    val lens = p.select(col("_np")).distinct()
      .collect().map(_.getInt(0)).sorted
    val toks = docs
      .select(col("doc_id"), split(lower(col("text")), " ").as("_toks"))
    // ONE corpus pass: the distinct L-gram arrays for every distinct
    // phrase length concatenate into one gram column (an L-gram has
    // L−1 spaces, so grams of different lengths are distinct strings —
    // the concat stays (doc, gram)-distinct and one equality join
    // against the whole phrase set is exact)
    val hits = lens.map { l =>
      when(size(col("_toks")) >= l, NearDup.shinglesOf(col("_toks"), l))
        .otherwise(array().cast("array<string>"))
    }.reduceOption(concat(_, _)) match {
      case None => docs.select(col("doc_id")).where(lit(false))
      case Some(grams) =>
        toks.select(col("doc_id"), explode(grams).as("_p"))
          .join(broadcast(p.select(col("_p"))), "_p")
          .select(col("doc_id"))
    }
    (hits.groupBy(col("doc_id")).agg(count(lit(1)).as("n_hits")), p)
  }
}
