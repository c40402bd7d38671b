package graft.functions

import org.apache.hadoop.fs.{FileSystem, Path}
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
  *   - `pairs/` — the verified pair rows exactly as produced by the
  *     finder (e.g. `(id_a, id_b, jaccard)` or `(term_a, term_b, dist)`);
  *     tens of bytes per EDGE, never corpus text. Grows append-mode per
  *     ingest batch; [[compactPairs]] folds the accumulated small files
  *     back to ~128 MB targets (auto-triggered by [[append]] past
  *     `maxPairFiles`).
  *   - `labels/cbucket=<b>/` — `(nodeCol, cluster_id)` for EVERY node
  *     (singletons label themselves), hive-partitioned by a cluster-id
  *     hash residue (`cbucket = pmod(hash(cluster_id), buckets)`) and
  *     node-sorted within each bucket. The bucketing is what makes
  *     [[append]] a TOUCHED-PARTITION rewrite: a batch that merges k
  *     clusters rewrites only the buckets holding those clusters' rows
  *     (plus the fresh nodes' buckets), never the full corpus table.
  *   - `_BUCKETS` — the residue modulus, fixed at [[build]] time so every
  *     later append agrees on the layout.
  *   - transient: `labels_staged/` (replacement partitions mid-append),
  *     `_PENDING` (the commit journal), `pairs_next/` (compaction
  *     staging). [[recover]] heals any crash that left these behind.
  *
  * '''Crash model.''' Label updates commit through a write-ahead
  * journal: the staged partitions are fully written (with `_SUCCESS`)
  * first, then `_PENDING` — the exact list of `replace`/`drop` bucket
  * moves — is published via a tmp-file rename, then the per-bucket
  * swaps run, then the journal is deleted. A crash BEFORE the journal
  * publishes leaves `labels/` untouched (recover discards the stage); a
  * crash AFTER leaves a journal whose application is idempotent
  * (replace skips buckets whose staged dir is already consumed, drop is
  * a delete), so recover always rolls FORWARD to the post-append state.
  * [[append]] itself is idempotent under whole-batch replay — a
  * restarted ingest loop re-delivering its batch is a no-op — because
  * the quotient edges are derived from the FULL delivered batch lifted
  * onto current labels (already-merged pairs lift to `label == label`
  * and drop out), while only the pairs-file append is screened by the
  * stored-pair anti-join. Replay after ANY partial crash (pairs
  * appended but labels not yet swapped, or a half-applied journal)
  * therefore converges to the same store as a clean run.
  *
  * The closure is computed FROM the stored pair parquet (read back, not
  * from the live pair plan), so the pair pipeline executes exactly once
  * per build even though both artifacts derive from it. Incremental
  * growth composes with [[SignatureStore]]: screen a batch against the
  * signature store, append accepted signatures, and rebuild pairs only
  * for the batch-touched buckets — batch-sized work, never a corpus
  * rescan.
  *
  * Single-writer: appends must not run concurrently with each other;
  * readers racing an append can observe a mid-swap mix of old and new
  * buckets (adopt a table format with snapshot commits for that).
  */
object PairStore {

  /** Partition-column name for the cluster-residue bucket (no leading
    * underscore — Spark's file listing hides `_`-prefixed paths). */
  private val BucketCol = "cbucket"

  /** Build (overwrite) the store: persist the verified `pairs`, then the
    * connected-components labels of `nodes` under those pairs.
    *
    * @param nodes    one row per node (the full id universe — isolated
    *                 nodes become singleton clusters)
    * @param pairs    verified pair rows; direction/duplicates don't matter
    * @param shortcut pointer-jumping mode for chain-shaped graphs (typo
    *                 chains) — see [[Clusters.connectedComponents]]
    * @param buckets  cluster-residue modulus for the label layout; sized
    *                 so one bucket ≈ one comfortable rewrite unit (at
    *                 100 TB / 10^11 docs, 1024 buckets ≈ 1.6 GB of label
    *                 rows each). Fixed for the store's lifetime.
    */
  def build(
      nodes: DataFrame,
      pairs: DataFrame,
      dir: String,
      nodeCol: String,
      srcCol: String,
      dstCol: String,
      shortcut: Boolean = false,
      buckets: Int = 16): Unit = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    val spark = nodes.sparkSession
    val fs = fsOf(spark, dir)
    // a rebuild must not inherit a crashed append's transient state
    for (stray <- Seq("labels_staged", "pairs_next", "_PENDING", "_PENDING.tmp"))
      fs.delete(new Path(s"$dir/$stray"), true)
    pairs.write.mode("overwrite").parquet(s"$dir/pairs")
    val stored = spark.read.parquet(s"$dir/pairs")
    val labels = Clusters.connectedComponents(
      nodes.select(col(nodeCol)), stored, nodeCol, srcCol, dstCol,
      shortcut = shortcut)
    withBucket(labels, buckets)
      .write.partitionBy(BucketCol).mode("overwrite").parquet(s"$dir/labels")
    writeSmallFile(fs, new Path(s"$dir/_BUCKETS"), buckets.toString)
    spark.catalog.refreshByPath(s"$dir/labels")
  }

  /** Incrementally extend the store with a batch: append the batch's
    * verified pairs and update the labels WITHOUT recomputing the
    * closure over the full corpus. Existing clusters collapse to
    * SUPER-NODES: each delivered pair (a, b) becomes an edge between the
    * CURRENT labels of a and b (new nodes label themselves), so the
    * quotient graph has one node per touched cluster or new doc and one
    * edge per new pair — connected components over it costs O(batch
    * pairs), not O(corpus pairs). Because every label is its cluster's
    * MINIMUM member id, the min label of a merged super-node set is the
    * merged cluster's true minimum member — the canonical-id invariant
    * survives, and the result is row-identical to a full rebuild
    * (pinned by PairStoreSpec and the `dedup_clusters_incr` oracle).
    *
    * Only the TOUCHED label buckets are rewritten: the buckets holding
    * rows of merging clusters (old residue), receiving merged labels
    * (new residue), or receiving fresh nodes. A pure-growth batch
    * rewrites the fresh nodes' buckets; a no-op batch (replay of a
    * completed append) rewrites nothing. The one O(corpus) cost left is
    * the label SCAN that lifts batch pair endpoints onto current labels
    * — a broadcast-batch map-side join, no corpus shuffle (a node-keyed
    * secondary index would remove even the scan; out of scope here).
    *
    * Idempotent under replay, including replay after a crash at ANY
    * point of a previous delivery — see the crash model in the object
    * doc. [[recover]] runs first, so a restarted ingest loop only ever
    * calls `append` again.
    *
    * @param newNodes     one row per NEW node (already-stored ids are
    *                     ignored)
    * @param newPairs     verified pairs touching the batch
    *                     (batch-internal and batch-vs-corpus, e.g. from
    *                     [[NearDup.ngramJaccardAcross]] or a
    *                     [[SignatureStore]] screen); old-old pairs are
    *                     also legal and merge their clusters
    * @param maxPairFiles auto-compaction trigger: when the append-mode
    *                     `pairs/` dir exceeds this many data files, fold
    *                     them with [[compactPairs]] (edge-sized IO,
    *                     amortized over ~maxPairFiles batches)
    */
  def append(
      newNodes: DataFrame,
      newPairs: DataFrame,
      dir: String,
      nodeCol: String,
      srcCol: String,
      dstCol: String,
      shortcut: Boolean = false,
      maxPairFiles: Int = 64): Unit = {
    val spark = newNodes.sparkSession
    recover(spark, dir)
    val fs = fsOf(spark, dir)
    val b = bucketCount(fs, dir)
    // Eager localCheckpoint: the batch is read several times (pairs
    // screen, quotient lift) across writes that modify the very paths a
    // live plan might read (pairs/ append triggers Spark's
    // recache-by-path and would recompute a lazy screen against its own
    // output, emptying the batch mid-flight). Checkpointing truncates
    // lineage to concrete blocks first. Batch-sized by contract.
    val batch = newPairs.localCheckpoint(true)
    // Screen ONLY the pairs-file append on already-stored rows — the
    // label merge below deliberately uses the full batch, so a replay
    // whose pairs landed before a crash still re-derives its merges.
    // Shape: the store side is first semi-reduced by a BROADCAST of the
    // batch's endpoints (a stored row can only collide with a replayed
    // pair if its src is a batch endpoint), so the anti-join's store
    // side is batch-sized — the store is scanned, never shuffled.
    val batchSrc = batch.select(col(srcCol)).distinct()
    val storedTouching = pairs(spark, dir).select(col(srcCol), col(dstCol))
      .join(broadcast(batchSrc), Seq(srcCol), "left_semi")
    val freshPairs = batch
      .join(storedTouching, Seq(srcCol, dstCol), "left_anti")
      .localCheckpoint(true)
    freshPairs.write.mode("append").parquet(s"$dir/pairs")
    if (dataFileCount(fs, new Path(s"$dir/pairs")) > maxPairFiles)
      compactPairs(spark, dir)

    val stored = spark.read.parquet(s"$dir/labels")
    val old = stored.select(col(nodeCol), col("cluster_id"))
    // Fresh-node screen, same broadcast-batch shape as the pair screen:
    // semi-reduce the corpus label table by the batch's node ids first,
    // then anti-join two batch-sized frames — corpus scanned, not
    // shuffled.
    val batchNodes = newNodes.select(col(nodeCol)).distinct()
    val storedBatchNodes = old.select(col(nodeCol))
      .join(broadcast(batchNodes), Seq(nodeCol), "left_semi")
    val freshNodes = batchNodes
      .join(storedBatchNodes, Seq(nodeCol), "left_anti")
      .localCheckpoint(true)
    // lift each delivered pair onto current labels — the quotient edge
    // list. Pairs already inside one cluster lift to _ls === _ld and
    // drop out, which is exactly what makes replay a no-op. The batch
    // side is broadcast: the corpus-sized label table streams through
    // two map-side probes and contributes no shuffle.
    val lab = old
      .unionByName(freshNodes.select(col(nodeCol), col(nodeCol).as("cluster_id")))
      .select(col(nodeCol).as("_n"), col("cluster_id").as("_l"))
    val endLabels = lab
      .join(broadcast(batch.select(col(srcCol).as("_n"))
        .union(batch.select(col(dstCol).as("_n"))).distinct()),
        Seq("_n"), "left_semi")
      .localCheckpoint(true)
    val qEdges = batch
      .select(col(srcCol).as("_s"), col(dstCol).as("_d"))
      .join(endLabels.select(col("_n").as("_s"), col("_l").as("_ls")), "_s")
      .join(endLabels.select(col("_n").as("_d"), col("_l").as("_ld")), "_d")
      .select(col("_ls"), col("_ld"))
      .filter(col("_ls") =!= col("_ld"))
    val qNodes = qEdges.select(col("_ls").as("_q"))
      .union(qEdges.select(col("_ld").as("_q"))).distinct()
    // CC over the touched super-nodes only: (old label -> merged label),
    // identity rows dropped so the touched-bucket set stays merge-sized
    val merged = Clusters
      .connectedComponents(qNodes, qEdges, "_q", "_ls", "_ld",
        shortcut = shortcut)
      .select(col("_q"), col("cluster_id").as("_merged"))
      .filter(col("_q") =!= col("_merged"))
      .localCheckpoint(true)

    // Buckets needing a rewrite: sources of moved rows (old residue),
    // destinations (new residue), and fresh nodes' residues. Bounded by
    // the modulus, so the collect is ≤ `buckets` ints of driver state.
    val touched = merged.select(pmod(hash(col("_q")), lit(b)).as("bk"))
      .unionByName(merged.select(pmod(hash(col("_merged")), lit(b)).as("bk")))
      .unionByName(freshNodes.select(pmod(hash(col(nodeCol)), lit(b)).as("bk")))
      .distinct().collect().map(_.getInt(0)).toSeq.sorted
    if (touched.nonEmpty) {
      // Rewrite = every current row of a touched bucket (partition
      // pruning keeps the read touched-sized), relabeled through the
      // batch-sized merge map, plus the fresh nodes. Rows whose new
      // label has a different residue migrate buckets; a bucket whose
      // rows ALL migrate out ends up with no staged dir and is journaled
      // as a drop.
      val candidates = stored.filter(col(BucketCol).isin(touched: _*))
        .select(col(nodeCol), col("cluster_id"))
        .unionByName(freshNodes.select(col(nodeCol), col(nodeCol).as("cluster_id")))
      val staged = candidates
        .join(broadcast(merged), col("cluster_id") === col("_q"), "left")
        .select(col(nodeCol),
          coalesce(col("_merged"), col("cluster_id")).as("cluster_id"))
      withBucket(staged, b)
        .write.partitionBy(BucketCol).mode("overwrite")
        .parquet(s"$dir/labels_staged")
      val outBuckets = listBuckets(fs, new Path(s"$dir/labels_staged"))
      val drops = touched.filterNot(outBuckets.contains)
        .filter(bk => fs.exists(new Path(s"$dir/labels/$BucketCol=$bk")))
      publishPending(fs, dir,
        outBuckets.map(bk => s"replace $bk") ++ drops.map(bk => s"drop $bk"))
      applyPending(spark, dir)
    }
    merged.unpersist(blocking = false)
    endLabels.unpersist(blocking = false)
    freshNodes.unpersist(blocking = false)
    freshPairs.unpersist(blocking = false)
    batch.unpersist(blocking = false)
  }

  /** Heal any crash-interrupted [[append]] or [[compactPairs]]: rolls a
    * published journal FORWARD (its application is idempotent), discards
    * an unpublished stage (labels untouched ⇒ the batch will simply be
    * re-delivered), and completes or discards a pairs compaction swap.
    * Safe to call on a healthy store (pure existence checks); [[append]]
    * calls it first, so a restarted ingest loop needs no extra step. */
  def recover(spark: SparkSession, dir: String): Unit = {
    val fs = fsOf(spark, dir)
    // unpublished journal tmp: the commit never happened — discard
    fs.delete(new Path(s"$dir/_PENDING.tmp"), true)
    if (fs.exists(new Path(s"$dir/_PENDING"))) {
      applyPending(spark, dir)
    } else if (fs.exists(new Path(s"$dir/labels_staged"))) {
      // stage written (possibly partially) but never journaled: labels/
      // is still the pre-append generation — discard the stage
      deleteOrThrow(fs, new Path(s"$dir/labels_staged"))
    }
    val pNext = new Path(s"$dir/pairs_next")
    if (fs.exists(pNext)) {
      val pairsP = new Path(s"$dir/pairs")
      if (!fs.exists(pairsP) && fs.exists(new Path(s"$dir/pairs_next/_SUCCESS"))) {
        // crash between the compaction delete and rename: roll forward
        renameOrThrow(fs, pNext, pairsP)
        spark.catalog.refreshByPath(s"$dir/pairs")
      } else {
        // compaction staged but old pairs/ still live (or the stage is
        // incomplete): roll back — compaction re-triggers later
        deleteOrThrow(fs, pNext)
      }
    }
  }

  /** Fold the append-mode `pairs/` small files into ~`targetFileBytes`
    * outputs (one read+shuffle of the EDGE-sized pair table — amortized
    * across the `maxPairFiles` appends that triggered it). Swap is
    * staged through `pairs_next` with a `_SUCCESS` gate; [[recover]]
    * heals a crash on either side of the swap. */
  def compactPairs(
      spark: SparkSession,
      dir: String,
      targetFileBytes: Long = 128L << 20): Unit = {
    val fs = fsOf(spark, dir)
    val pairsP = new Path(s"$dir/pairs")
    if (!fs.exists(pairsP)) return
    val bytes = fs.getContentSummary(pairsP).getLength
    val parts = math.max(1L, (bytes + targetFileBytes - 1) / targetFileBytes).toInt
    spark.read.parquet(s"$dir/pairs").repartition(parts)
      .write.mode("overwrite").parquet(s"$dir/pairs_next")
    deleteOrThrow(fs, pairsP)
    renameOrThrow(fs, new Path(s"$dir/pairs_next"), pairsP)
    spark.catalog.refreshByPath(s"$dir/pairs")
  }

  /** The stored verified pair table. */
  def pairs(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/pairs")

  /** The stored `(nodeCol, cluster_id)` label table (every node, incl.
    * singletons; the physical bucket partition column is dropped). */
  def labels(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/labels").drop(BucketCol)

  // ---------------------------------------------------------------- //

  private def withBucket(labels: DataFrame, buckets: Int): DataFrame =
    labels.withColumn(BucketCol, pmod(hash(col("cluster_id")), lit(buckets)))
      .repartition(col(BucketCol))
      .sortWithinPartitions(col(BucketCol), col(labels.columns.head))

  private def bucketCount(fs: FileSystem, dir: String): Int = {
    val p = new Path(s"$dir/_BUCKETS")
    require(fs.exists(p),
      s"$dir is not a PairStore (missing _BUCKETS) — run build() first")
    val in = fs.open(p)
    try new String(org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8")
      .trim.toInt
    finally in.close()
  }

  /** Publish the commit journal atomically: full write to a tmp path,
    * then rename — recover treats a tmp as "never committed". */
  private def publishPending(
      fs: FileSystem, dir: String, moves: Seq[String]): Unit = {
    val tmp = new Path(s"$dir/_PENDING.tmp")
    val out = fs.create(tmp, true)
    try out.write((moves.mkString("\n") + "\n").getBytes("UTF-8"))
    finally out.close()
    renameOrThrow(fs, tmp, new Path(s"$dir/_PENDING"))
  }

  /** Apply (or re-apply) the published journal: per-bucket staged→live
    * swaps plus emptied-bucket drops, each step idempotent — a `replace`
    * whose staged dir is gone was already consumed; a `drop` is a
    * delete. Ends by retiring the journal and the stage dir. */
  private def applyPending(spark: SparkSession, dir: String): Unit = {
    val fs = fsOf(spark, dir)
    val pendingP = new Path(s"$dir/_PENDING")
    val in = fs.open(pendingP)
    val moves =
      try new String(org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8")
        .split("\n").toSeq.map(_.trim).filter(_.nonEmpty)
      finally in.close()
    for (m <- moves) m.split(" ") match {
      case Array("replace", bk) =>
        val src = new Path(s"$dir/labels_staged/$BucketCol=$bk")
        val dst = new Path(s"$dir/labels/$BucketCol=$bk")
        if (fs.exists(src)) {
          deleteOrThrow(fs, dst)
          renameOrThrow(fs, src, dst)
        }
      case Array("drop", bk) =>
        deleteOrThrow(fs, new Path(s"$dir/labels/$BucketCol=$bk"))
      case other =>
        throw new IllegalStateException(
          s"corrupt PairStore journal line '${other.mkString(" ")}' in $pendingP")
    }
    deleteOrThrow(fs, pendingP)
    deleteOrThrow(fs, new Path(s"$dir/labels_staged"))
    spark.catalog.refreshByPath(s"$dir/labels")
  }

  private def listBuckets(fs: FileSystem, dir: Path): Seq[Int] =
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith(s"$BucketCol="))
      .map(_.getPath.getName.stripPrefix(s"$BucketCol=").toInt)
      .sorted

  private def dataFileCount(fs: FileSystem, dir: Path): Int =
    if (!fs.exists(dir)) 0
    else fs.listStatus(dir)
      .count(s => s.isFile && s.getPath.getName.startsWith("part-"))

  private def writeSmallFile(fs: FileSystem, p: Path, content: String): Unit = {
    val out = fs.create(p, true)
    try out.write(content.getBytes("UTF-8")) finally out.close()
  }

  private def fsOf(spark: SparkSession, dir: String): FileSystem =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Filesystems may report failure by RETURNING false (local FS renames
    * across devices, permission walls) — a silent false here corrupts
    * the store, so every structural move is checked and loud. */
  private def renameOrThrow(fs: FileSystem, src: Path, dst: Path): Unit =
    if (!fs.rename(src, dst))
      throw new IllegalStateException(s"PairStore: rename $src -> $dst failed")

  private def deleteOrThrow(fs: FileSystem, p: Path): Unit =
    if (!fs.delete(p, true) && fs.exists(p))
      throw new IllegalStateException(s"PairStore: delete $p failed")
}
