package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted near-dup pair + cluster-label store — the build-once-serve-
  * many artifact for the whole dedup family. Pair finding (shingle/LSH/
  * deletion-key joins) and the connected-components closure are the
  * expensive shared prefix of EVERY keep-one-per-cluster consumer
  * (collapse, keep-best, per-source report, entity resolution, cluster
  * audits); at 100 TB nobody recomputes MinHash pairs per downstream
  * query — the pair table and the labels are written ONCE at ingest and
  * every consumer reads parquet. The per-JVM [[graft.PlanCache]] sharing
  * covers one warm process; this store is the durable cross-job form,
  * the text-dedup analog of [[IvfIndex]] (persisted index) and
  * [[SignatureStore]] (persisted signatures).
  *
  * Layout under `dir`:
  *   - `pairs/`  — the verified pair rows exactly as produced by the
  *     finder (e.g. `(id_a, id_b, jaccard)` or `(term_a, term_b, dist)`);
  *     tens of bytes per EDGE, never corpus text.
  *   - `labels/` — `(nodeCol, cluster_id)` for EVERY node (singletons
  *     label themselves), hash-distributed and sorted on the node column
  *     so the downstream survivor joins read co-clustered, run-length-
  *     friendly files and column-prune to exactly the two columns.
  *
  * The closure is computed FROM the stored pair parquet (read back, not
  * from the live pair plan), so the pair pipeline executes exactly once
  * per build even though both artifacts derive from it. Incremental
  * growth composes with [[SignatureStore]]: screen a batch against the
  * signature store, append accepted signatures, and rebuild pairs only
  * for the batch-touched buckets — batch-sized work, never a corpus
  * rescan.
  */
object PairStore {

  /** Build (overwrite) the store: persist the verified `pairs`, then the
    * connected-components labels of `nodes` under those pairs.
    *
    * @param nodes    one row per node (the full id universe — isolated
    *                 nodes become singleton clusters)
    * @param pairs    verified pair rows; direction/duplicates don't matter
    * @param shortcut pointer-jumping mode for chain-shaped graphs (typo
    *                 chains) — see [[Clusters.connectedComponents]]
    */
  def build(
      nodes: DataFrame,
      pairs: DataFrame,
      dir: String,
      nodeCol: String,
      srcCol: String,
      dstCol: String,
      shortcut: Boolean = false): Unit = {
    pairs.write.mode("overwrite").parquet(s"$dir/pairs")
    val stored = nodes.sparkSession.read.parquet(s"$dir/pairs")
    Clusters.connectedComponents(
        nodes.select(col(nodeCol)), stored, nodeCol, srcCol, dstCol,
        shortcut = shortcut)
      .repartition(col(nodeCol))
      .sortWithinPartitions(nodeCol)
      .write.mode("overwrite").parquet(s"$dir/labels")
  }

  /** The stored verified pair table. */
  def pairs(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/pairs")

  /** The stored `(nodeCol, cluster_id)` label table (every node, incl.
    * singletons). */
  def labels(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/labels")
}
