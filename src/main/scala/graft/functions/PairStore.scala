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

  /** Incrementally extend the store with a batch: append the batch's
    * verified pairs and update the labels WITHOUT recomputing the
    * closure over the full corpus. Existing clusters collapse to
    * SUPER-NODES: each new pair (a, b) becomes an edge between the
    * CURRENT labels of a and b (new nodes label themselves), so the
    * quotient graph has one node per touched cluster or new doc and one
    * edge per new pair — connected components over it costs O(batch
    * pairs), not O(corpus pairs). Because every label is its cluster's
    * MINIMUM member id, the min label of a merged super-node set is the
    * merged cluster's true minimum member — the canonical-id invariant
    * survives, and the result is row-identical to a full rebuild
    * (pinned by PairStoreSpec and the `dedup_clusters_incr` oracle).
    *
    * The label table is rewritten in full — O(corpus) rows of two ids,
    * a sliver of corpus bytes; at extreme scale, bucketing labels by a
    * cluster-id residue turns this into a touched-partition rewrite.
    *
    * Idempotent under replay: nodes already labeled and pair rows
    * already stored are anti-joined away before anything writes, so
    * re-running an append (a restarted ingest loop re-delivering its
    * batch) is a no-op — both screens are batch-sized on one side and
    * column-pruned on the store side.
    *
    * @param newNodes one row per NEW node (already-stored ids are
    *                 ignored)
    * @param newPairs verified pairs touching the batch (batch-internal
    *                 and batch-vs-corpus, e.g. from
    *                 [[NearDup.ngramJaccardAcross]] or a
    *                 [[SignatureStore]] screen); old-old pairs are
    *                 also legal and merge their clusters
    */
  def append(
      newNodes: DataFrame,
      newPairs: DataFrame,
      dir: String,
      nodeCol: String,
      srcCol: String,
      dstCol: String,
      shortcut: Boolean = false): Unit = {
    val spark = newNodes.sparkSession
    // Eager localCheckpoint, NOT persist: the anti-join reads pairs/
    // and the append below writes pairs/ — appending triggers Spark's
    // recache-by-path, which would RECOMPUTE a persisted plan against
    // the just-appended files and empty the batch mid-flight. The
    // checkpoint truncates lineage to concrete blocks first, so the
    // screened batch is immune to its own append.
    val freshPairs = newPairs
      .join(pairs(spark, dir).select(col(srcCol), col(dstCol)),
        Seq(srcCol, dstCol), "left_anti")
      .localCheckpoint(true)
    freshPairs.write.mode("append").parquet(s"$dir/pairs")
    val old = labels(spark, dir)
    val freshNodes = newNodes.select(col(nodeCol)).distinct()
      .join(old.select(col(nodeCol)), Seq(nodeCol), "left_anti")
    val base = old
      .union(freshNodes.select(col(nodeCol), col(nodeCol).as("cluster_id")))
      .persist()
    // lift each fresh pair onto current labels — the quotient edge list
    val lab = base.select(col(nodeCol).as("_n"), col("cluster_id").as("_l"))
    val qEdges = freshPairs
      .select(col(srcCol).as("_s"), col(dstCol).as("_d"))
      .join(lab.withColumnRenamed("_n", "_s").withColumnRenamed("_l", "_ls"), "_s")
      .join(lab.withColumnRenamed("_n", "_d").withColumnRenamed("_l", "_ld"), "_d")
      .select(col("_ls"), col("_ld"))
      .filter(col("_ls") =!= col("_ld"))
    val qNodes = qEdges.select(col("_ls").as("_q"))
      .union(qEdges.select(col("_ld").as("_q"))).distinct()
    // CC over the touched super-nodes only: (old label -> merged label)
    val merged = Clusters
      .connectedComponents(qNodes, qEdges, "_q", "_ls", "_ld",
        shortcut = shortcut)
      .select(col("_q"), col("cluster_id").as("_merged"))
    val next = base
      .join(merged, base("cluster_id") === merged("_q"), "left")
      .select(col(nodeCol),
        coalesce(col("_merged"), col("cluster_id")).as("cluster_id"))
      .repartition(col(nodeCol))
      .sortWithinPartitions(nodeCol)
    // labels/ is both input and output of this pass: stage through a
    // temp dir, then swap. The previous generation survives as
    // labels_prev until the swap completes, so any crash window leaves
    // a recoverable copy on disk (labels_prev and/or labels_next); a
    // table format with atomic commit (Iceberg/Delta) is the production
    // answer for concurrent readers — this store assumes the documented
    // single-writer, no-concurrent-reader ingest loop.
    next.write.mode("overwrite").parquet(s"$dir/labels_next")
    base.unpersist()
    freshPairs.unpersist(blocking = false)
    val cur = new org.apache.hadoop.fs.Path(s"$dir/labels")
    val prev = new org.apache.hadoop.fs.Path(s"$dir/labels_prev")
    val nxt = new org.apache.hadoop.fs.Path(s"$dir/labels_next")
    val fs = cur.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(prev, true)
    fs.rename(cur, prev)
    fs.rename(nxt, cur)
    fs.delete(prev, true)
  }

  /** The stored verified pair table. */
  def pairs(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/pairs")

  /** The stored `(nodeCol, cluster_id)` label table (every node, incl.
    * singletons). */
  def labels(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/labels")
}
