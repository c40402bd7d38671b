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
}
