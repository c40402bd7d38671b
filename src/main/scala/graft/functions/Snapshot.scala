package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus snapshot diff — dataset versioning for a pipeline that re-crawls
  * / re-ingests: given two versions of a corpus, classify every document
  * as `added` / `removed` / `changed` / `unchanged`. This is the audit
  * step before shipping a new training mix: "what actually moved between
  * v1 and v2" drives re-tokenization scope, dedup re-screening, and
  * rollback decisions.
  *
  * Scale shape: each side is reduced AT THE SCAN to (id, 16-byte content
  * hash) — document text never crosses the wire — and the classification
  * is one full-outer hash join on id. At 100 TB that is the minimal
  * movement for an exact diff: the join state is O(corpus ids), and both
  * sides' parquet scans prune to the two columns involved
  * (`ReadSchema: id, text`).
  */
object Snapshot {

  /** Per-document diff of `newC` against `oldC`.
    *
    * @return (idCol, status) for every id present in either version —
    *         `added` (only in new), `removed` (only in old), `changed`
    *         (both, different content hash), `unchanged`.
    */
  def diff(
      oldC: DataFrame,
      newC: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text"
  ): DataFrame = {
    val a = oldC.select(col(idCol).as("_id"), md5(col(textCol)).as("_ha"))
    val b = newC.select(col(idCol).as("_id"), md5(col(textCol)).as("_hb"))
    a.join(b, Seq("_id"), "full_outer")
      .select(col("_id").as(idCol),
        when(col("_ha").isNull, lit("added"))
          .when(col("_hb").isNull, lit("removed"))
          .when(col("_ha") === col("_hb"), lit("unchanged"))
          .otherwise(lit("changed")).as("status"))
  }

  /** Diff rollup: one row per status with its document count — the
    * headline "v2 adds X, removes Y, rewrites Z" numbers. */
  def diffSummary(
      oldC: DataFrame,
      newC: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text"
  ): DataFrame =
    diff(oldC, newC, idCol, textCol)
      .groupBy(col("status")).agg(count(lit(1)).as("n_docs"))
      .orderBy(col("status"))
}
