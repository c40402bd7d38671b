package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Benchmark decontamination — EXT tier. Before training, a corpus must be
  * screened for overlap with evaluation benchmarks (the data the model will
  * be scored on); the standard method is w-token n-gram collision (the
  * reference has no such operator; the shape follows the published
  * decontamination procedures of the large-LM corpora papers).
  *
  * Scale shape: the BENCHMARK side is small by contract (an eval suite,
  * not a corpus) — its distinct shingle set broadcasts; the training side
  * streams through ONE hash join on the shingle string and ONE aggregate
  * exchange on doc_id. The corpus is never shuffled by shingle, and
  * nothing is O(train × bench).
  */
object Contamination {

  /** Per-training-doc contamination report: distinct-shingle total, count
    * shared with ANY benchmark doc, and the overlap fraction; only docs
    * with `n_shared >= minShared` survive. Shingles are the same
    * `w`-token space-joined windows as the near-dup pipeline
    * ([[NearDup.docShingles]]). */
  def report(
      train: DataFrame,
      bench: DataFrame,
      w: Int = 3,
      minShared: Long = 1L
  ): DataFrame = reportRows(train, bench, w, minShared).orderBy(col("doc_id"))

  /** [[report]] without the final presentation sort — the shared core of
    * the batch and streaming faces (`train` may be a STREAMING frame:
    * shingle expansion is per-row, the benchmark side is static and
    * broadcast, and the per-doc aggregate runs per micro-batch —
    * [[graft.streaming.StreamOps.decontaminateStream]]). */
  private[graft] def reportRows(
      train: DataFrame,
      bench: DataFrame,
      w: Int = 3,
      minShared: Long = 1L
  ): DataFrame = {
    // Size-gated like every other O(table) broadcast in the near-dup
    // family: below the threshold the bench shingle set ships once per
    // executor; above it (someone passed a corpus as "bench") the join
    // degrades to a shuffled shingle join instead of an OOM. The gate
    // reads the SOURCE scan's stats via sizeProxy — post-aggregate stats
    // wildly overestimate (the measured NearDup lesson).
    val benchShingles = NearDup.broadcastIfSmall(
      NearDup.docShingles(bench, w).select(col("shingle")).distinct()
        .withColumn("_hit", lit(1)),
      sizeProxy = Some(bench))
    val marked = NearDup.docShingles(train, w)
      .join(benchShingles, Seq("shingle"), "left")
    marked.groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_shingles"),
        sum(coalesce(col("_hit"), lit(0))).as("n_shared"))
      .filter(col("n_shared") >= minShared)
      .select(col("doc_id"),
        col("n_shingles"),
        col("n_shared"),
        (col("n_shared").cast(DoubleType) / col("n_shingles"))
          .as("overlap_frac"))
  }

  /** SURGICAL decontamination — remove the contaminated SPANS, keep the
    * document: every token position covered by an `l`-token window that
    * appears verbatim in the benchmark is cut, and the doc re-materializes
    * without it. The doc-level screen ([[report]] → drop) throws away a
    * whole document over one quoted benchmark sentence; at training-corpus
    * scale that's real data loss for popular benchmarks, and the span cut
    * is what the published decontamination pipelines moved to. Exactness
    * contract mirrors [[SubstringDedup.dedupSpansRemoved]] (the same
    * windowed-gram machinery, pointed at an external corpus instead of the
    * corpus itself): any shared run of ≥ l tokens contains a shared
    * l-window, so the cut removes every ≥l-token verbatim overlap.
    *
    * Output: (doc_id, n_tokens, n_kept, clean_text); docs with no overlap
    * pass through with `clean_text == text`.
    *
    * Scale shape: train-side gram stream is 8 bytes/token (hashes, never
    * gram text); the bench gram set is eval-suite-sized by contract and
    * size-gate-broadcast against it (shuffled semi-join fallback if a
    * corpus is passed as "bench"); position explode + rebuild touch only
    * contaminated docs' rows past the semi-join. */
  def removeContaminatedSpans(
      train: DataFrame,
      bench: DataFrame,
      l: Int = 8
  ): DataFrame = {
    require(l > 1, s"gram length must exceed 1 token, got $l")
    // shared gram-stream kernel — one definition across the span ops
    def gramsOf(df: DataFrame) = SubstringDedup.gramStream(df, l)
    val base = train
      .select(col("doc_id"), Text.tokens(col("text")).as("_t"))
      .withColumn("_n", size(col("_t")))
    val benchGrams = NearDup.broadcastIfSmall(
      gramsOf(bench).select(col("_h")).distinct(), sizeProxy = Some(bench))
    val cut = gramsOf(train)
      .join(benchGrams, Seq("_h"), "left_semi")
      .select(col("doc_id"),
        explode(sequence(col("pos"), col("pos") + l - 1)).as("_p"))
      // overlapping contaminated windows cover a position once —
      // collect_set dedups on its own (a distinct pre-pass would add a
      // second full shuffle of the position stream for nothing)
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_set(col("_p"))).as("_cut"))
    base
      .join(cut, Seq("doc_id"), "left")
      .select(col("doc_id"), col("_n").as("n_tokens"),
        (col("_n") - coalesce(size(col("_cut")), lit(0))).as("n_kept"),
        // O(n + |cut|) sorted-merge rebuild (see [[SubstringDedup
        // .dedupSpansRemoved]] — same kernel, same quadratic hazard)
        array_join(
          graft.plans.DropSortedPositions.dropSortedPositions(col("_t"),
            coalesce(col("_cut"), array().cast("array<int>"))),
          " ").as("clean_text"))
  }
}
