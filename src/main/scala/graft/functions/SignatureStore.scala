package graft.functions

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted dedup signature store — the [[IvfIndex]] of text dedup: the
  * per-document signatures (exact content hash + sorted n-gram hash
  * array) are computed ONCE at ingest time and written as parquet; every
  * future batch screens against the STORE, never against re-shingled
  * corpus text. At 100 TB this is the difference between a batch-sized
  * job and re-reading the corpus per ingest:
  *
  *   - the store row is (doc_id, exact_h, arr, n_shingles) — tens of
  *     bytes of hashes per doc instead of the document body;
  *   - screening reads only the columns it needs (exact_h for the
  *     anti-join, arr/n_shingles for the prefix-filter candidates), both
  *     column-pruned at the parquet scan;
  *   - accepted batches [[append]] their signatures — batch-sized
  *     writes, no compaction of history required.
  *
  * Screening semantics match the `dedup_incremental` contract: a batch
  * doc survives iff it is its batch exact-group's keeper, its exact hash
  * is not already ingested, and it has no ≥threshold near-dup in the
  * store or earlier in the batch.
  *
  * '''Layout & write contract''' ([[StoreCommit]] — the [[PairStore]]
  * protocol, applied verbatim): signature rows live in immutable salted
  * `data_g<v>.<salt>/` generation dirs; `history/v<N>` manifests list the
  * LIVE files of each committed version; readers resolve every path
  * through the current manifest, so uncommitted and superseded files are
  * invisible. [[append]] writes its generation completely, then
  * CAS-commits — of N writers racing an append, EXACTLY ONE commits and
  * the rest throw `ConcurrentModificationException` with the store
  * unharmed (replaying the loser's batch converges: its docs either
  * re-screen out or re-append fresh rows). Note what the CAS does and
  * does not give: it SERIALIZES commits (no lost or torn writes), but
  * screening stays a caller-side read — two INDEPENDENT ingest streams
  * sharing one store can each accept a doc that near-dups the other's
  * in-flight batch, because neither screen saw the other's uncommitted
  * rows. Screening SEMANTICS therefore keep the single-ingest-stream
  * contract ([[graft.streaming.StreamOps.ingestDedupStream]]'s serial
  * foreachBatch); the CAS makes the multi-writer case safe, not
  * duplicate-proof. [[delete]] is file-pruned
  * copy-on-write at the manifest level: survivor rows of the dead files
  * land in a new generation and the dead files leave the manifest —
  * superseded files stay on disk for concurrent readers until
  * [[vacuum]]. A crash before any commit leaves unreferenced garbage
  * only. */
object SignatureStore {

  private val Store = "SignatureStore"

  /** Test seam: invoked immediately before [[append]]'s /[[delete]]'s
    * manifest commit, so SignatureStoreSpec can interleave a full
    * competing write at exactly the CAS window, deterministically.
    * No-op in production. */
  private[graft] var onBeforeCommit: () => Unit = () => ()

  /** Signature frame for a doc table: (doc_id, exact_h, arr, n_shingles).
    * Docs shorter than `w` tokens get an empty array (they can never be
    * near-dups but still screen exactly). */
  def signatures(docs: DataFrame, w: Int = 3): DataFrame = {
    val arrs = NearDup.shingleHashArrays(docs, w)
      .select(col("doc_id"), col("arr"), col("n_shingles"))
    docs.select(col("doc_id"), md5(lower(trim(col("text")))).as("exact_h"))
      .join(arrs, Seq("doc_id"), "left")
      .select(col("doc_id"), col("exact_h"),
        coalesce(col("arr"), array().cast("array<bigint>")).as("arr"),
        coalesce(col("n_shingles"), lit(0)).as("n_shingles"))
  }

  /** Build (overwrite) the store from an initial corpus: the store's
    * history starts over at manifest v0. */
  def build(docs: DataFrame, dir: String, w: Int = 3): Unit = {
    val spark = docs.sparkSession
    val fs = StoreCommit.fsOf(spark, dir)
    if (fs.exists(new Path(dir)))
      fs.listStatus(new Path(dir)).toSeq
        .filter(s => s.getPath.getName.startsWith("data_g") ||
          s.getPath.getName == "history")
        .foreach(s => StoreCommit.deleteOrThrow(fs, s.getPath, Store))
    val gen = StoreCommit.saltedGenDir("data", 0L)
    val sigs = signatures(docs, w)
    sigs.write.mode("overwrite").parquet(s"$dir/$gen")
    if (StoreCommit.listDataFiles(fs, dir, gen).isEmpty)
      // Cross-version insurance, not a reachable path on the shipped
      // Spark 4.1.2 (which always emits one schema-bearing part file
      // even for an empty non-partitioned write): should a future Spark/
      // AQE combination write zero files, force one so every manifest
      // lists a schema-bearing file and readers never fall back to
      // directory listing.
      spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], sigs.schema)
        .repartition(1).write.mode("overwrite").parquet(s"$dir/$gen")
    val files = StoreCommit.listDataFiles(fs, dir, gen)
    StoreCommit.commitManifest(fs, dir, 0L, manifestLines(0L, files), Store,
      referenced = files.map(f => new Path(s"$dir/$f")))
  }

  /** Append a batch's signatures (call after [[screenBatch]] accepts):
    * write a complete salted generation, then CAS-commit the grown file
    * list. A loser of a concurrent-append race throws with the store
    * unharmed; replaying its batch (screen + append) converges. */
  def append(docs: DataFrame, dir: String, w: Int = 3): Unit = {
    val spark = docs.sparkSession
    val fs = StoreCommit.fsOf(spark, dir)
    val v = StoreCommit.currentVersion(fs, dir, Store)
    val old = liveFiles(fs, dir, v)
    val gen = StoreCommit.saltedGenDir("data", v + 1)
    signatures(docs, w).write.mode("overwrite").parquet(s"$dir/$gen")
    val fresh = StoreCommit.listDataFiles(fs, dir, gen)
    if (fresh.isEmpty) return // empty batch: nothing to commit
    onBeforeCommit()
    StoreCommit.commitManifest(fs, dir, v + 1,
      manifestLines(v + 1, old ++ fresh), Store,
      referenced = (old ++ fresh).map(f => new Path(s"$dir/$f")))
  }

  /** Delete signatures by doc id — the retention pass: once a document
    * is forgotten, future batches must stop being screened against it
    * (a new doc that matches only a deleted one must now be ACCEPTED).
    * File-pruned copy-on-write at the MANIFEST level: one columnar
    * `doc_id` scan of the live files tags those holding deleted ids
    * (the signature arrays' pages are never read), their survivor rows
    * are written as a new salted generation, and the CAS commit swaps
    * the dead files for the new ones. Superseded files stay on disk for
    * racing readers until [[vacuum]]; a crash before the commit leaves
    * only an unreferenced generation. Replaying a completed delete is a
    * no-op (already-deleted ids match no live file). */
  def delete(spark: SparkSession, ids: DataFrame, dir: String): Unit = {
    val fs = StoreCommit.fsOf(spark, dir)
    val v = StoreCommit.currentVersion(fs, dir, Store)
    val live = liveFiles(fs, dir, v)
    val del = ids.select(col(ids.columns.head).as("doc_id"))
      .distinct().localCheckpoint(true)
    // try/finally: losing a CAS race throws out of the commit, and the
    // checkpointed delete set must release on that path too
    try {
      val deadAbs = readFiles(spark, dir, live)
        .select(col("doc_id"), input_file_name().as("_f"))
        .join(broadcast(del), Seq("doc_id"), "left_semi")
        .select(col("_f")).distinct().collect().map(_.getString(0))
      val dead = live.filter(f => deadAbs.exists(_.endsWith("/" + f))).toSet
      if (dead.isEmpty) return
      val gen = StoreCommit.saltedGenDir("data", v + 1)
      readFiles(spark, dir, dead.toSeq.sorted)
        .join(broadcast(del), Seq("doc_id"), "left_anti")
        .write.mode("overwrite").parquet(s"$dir/$gen")
      onBeforeCommit()
      val survivors =
        live.filterNot(dead) ++ StoreCommit.listDataFiles(fs, dir, gen)
      StoreCommit.commitManifest(fs, dir, v + 1,
        manifestLines(v + 1, survivors), Store,
        referenced = survivors.map(f => new Path(s"$dir/$f")))
    } finally del.unpersist(blocking = false)
  }

  /** Fold the live signature files into ~`targetFileBytes` outputs as a
    * new committed version — the small-files compaction a long
    * micro-batch ingest history needs (every [[append]] adds a
    * generation). Logical content identical; superseded files stay for
    * pinned readers until [[vacuum]]. Explicit, never auto-triggered
    * ([[PairStore]]'s auto-compaction folds edge-sized pair files; the
    * signature table carries the full shingle-hash arrays, so this
    * rewrite is signature-corpus-sized and an ingest loop schedules
    * it). */
  def compact(
      spark: SparkSession, dir: String,
      targetFileBytes: Long = 128L << 20): Unit = {
    val fs = StoreCommit.fsOf(spark, dir)
    val v = StoreCommit.currentVersion(fs, dir, Store)
    val live = liveFiles(fs, dir, v)
    val bytes = live.map(f =>
      fs.getFileStatus(new Path(s"$dir/$f")).getLen).sum
    val parts = math.max(1L, (bytes + targetFileBytes - 1) / targetFileBytes).toInt
    val gen = StoreCommit.saltedGenDir("data", v + 1)
    readFiles(spark, dir, live).repartition(parts)
      .write.mode("overwrite").parquet(s"$dir/$gen")
    onBeforeCommit()
    val folded = StoreCommit.listDataFiles(fs, dir, gen)
    StoreCommit.commitManifest(fs, dir, v + 1,
      manifestLines(v + 1, folded), Store,
      referenced = folded.map(f => new Path(s"$dir/$f")))
  }

  /** Retire manifests older than the newest `keepLast` and delete the
    * data files no retained manifest references — superseded delete
    * targets, crashed appends' orphans, and losing racers' generations.
    * Run it only when no writer is live (the PairStore rule: a reap can
    * race a not-yet-committed generation into a loud commit abort). */
  def vacuum(spark: SparkSession, dir: String, keepLast: Int = 2): Unit = {
    require(keepLast >= 1, s"keepLast must be >= 1, got $keepLast")
    val fs = StoreCommit.fsOf(spark, dir)
    val versions = StoreCommit.committedVersions(fs, dir).sorted
    val (drop, keep) = versions.splitAt(math.max(0, versions.size - keepLast))
    val liveSet: Set[String] = keep.flatMap(liveFiles(fs, dir, _)).toSet
    // abort loudly (deleting nothing) if a publish landed since the reap
    // set was computed — see StoreCommit.assertVersionsUnchanged
    StoreCommit.assertVersionsUnchanged(fs, dir, versions, Store)
    drop.foreach(dv =>
      StoreCommit.deleteOrThrow(fs, new Path(s"$dir/history/v$dv"), Store))
    StoreCommit.reapManifestTmp(fs, dir, Store)
    fs.listStatus(new Path(dir)).toSeq
      .filter(_.getPath.getName.startsWith("data_g"))
      .foreach { s =>
        val sub = s.getPath.getName
        StoreCommit.listDataFiles(fs, dir, sub).filterNot(liveSet)
          .foreach(f => StoreCommit.deleteOrThrow(fs, new Path(s"$dir/$f"), Store))
        if (StoreCommit.listDataFiles(fs, dir, sub).isEmpty)
          StoreCommit.deleteOrThrow(fs, s.getPath, Store)
      }
  }

  /** The stored signature table at the CURRENT committed version — a
    * consistent snapshot that stays valid while appends/deletes race
    * ahead (until [[vacuum]] retires it). */
  def stored(spark: SparkSession, dir: String): DataFrame = {
    val fs = StoreCommit.fsOf(spark, dir)
    storedAt(spark, dir, StoreCommit.currentVersion(fs, dir, Store))
  }

  /** The signature table PINNED at a specific committed version — the
    * [[PairStore.snapshotAt]] symmetry the versioned manifests buy:
    * "screen this batch against the store AS OF version V" is what makes
    * an ingest decision reproducible after the store has moved on.
    * Throws if `version` was never committed or has been vacuumed past
    * retention. */
  def storedAt(spark: SparkSession, dir: String, version: Long): DataFrame = {
    val fs = StoreCommit.fsOf(spark, dir)
    require(fs.exists(new Path(s"$dir/history/v$version")),
      s"$Store $dir has no committed version $version (never written, or " +
        "vacuumed past retention)")
    readFiles(spark, dir, liveFiles(fs, dir, version))
  }

  /** Committed versions, ascending (the audit/ops verb). */
  def versions(spark: SparkSession, dir: String): Seq[Long] =
    StoreCommit.committedVersions(StoreCommit.fsOf(spark, dir), dir).sorted

  /** Surviving doc ids of a new batch screened against the store:
    * batch-exact-keeper ∧ exact hash unseen ∧ no near-dup vs store ∧ no
    * near-dup vs smaller batch id. All joins are batch-sized on one side;
    * the store side is touched via column-pruned scans and the prefix
    * hash join only. */
  def screenBatch(
      spark: SparkSession, batch: DataFrame, dir: String,
      threshold: Double, w: Int = 3): DataFrame = {
    val store = stored(spark, dir)
    val batchSigs = signatures(batch, w).persist()
    val keepers = batchSigs.groupBy(col("exact_h"))
      .agg(min(col("doc_id")).as("doc_id"))
    val afterExact = keepers
      .join(store.select(col("exact_h")).distinct(), Seq("exact_h"), "left_anti")
      .select(col("doc_id"))
    val storeArrs = store
      .select(col("doc_id"), col("arr"), col("n_shingles"))
      .filter(col("n_shingles") > 0)
    val batchArrs = batchSigs
      .select(col("doc_id"), col("arr"), col("n_shingles"))
      .filter(col("n_shingles") > 0)
    val ndStore = NearDup
      .acrossArrays(batchArrs, storeArrs, threshold)
      .select(col("id_a").as("doc_id")).distinct()
    val ndBatch = NearDup.ngramJaccardPairs(batch, threshold, w)
      .select(col("id_b").as("doc_id")).distinct()
    // batchSigs released once the survivor set is first materialized — an
    // ingest loop screens many batches and must not accumulate one cached
    // signature table per call
    graft.AutoUnpersist.afterFirstUse(
      afterExact
        .join(ndStore, Seq("doc_id"), "left_anti")
        .join(ndBatch, Seq("doc_id"), "left_anti")
        .orderBy(col("doc_id")),
      batchSigs)
  }

  // ------------------------------------------------------------------ //

  private def manifestLines(v: Long, files: Seq[String]): Seq[String] =
    s"version $v" +: files.sorted.map(f => s"file $f")

  private def liveFiles(fs: FileSystem, dir: String, v: Long): Seq[String] =
    // memoized: committed manifests are immutable; any commit at `dir`
    // invalidates its entries (StoreCommit.commitManifest), so the serve
    // path pays the manifest open once per (dir, version) per JVM
    StoreCommit.readManifestLinesCached(fs, dir, v).flatMap { l =>
      l.split(" ", 2) match {
        case Array("file", f)    => Some(f)
        case Array("version", _) => None
        case Array("nonce", _)   => None
        case other => throw new IllegalStateException(
          s"corrupt $Store manifest line '${other.mkString(" ")}' in $dir/history/v$v")
      }
    }

  /** Schema per store, memoized by the FIRST live file's full path:
    * part files are immutable once committed (salted generation dirs),
    * and a rebuilt/compacted store mints new salted paths — so the key
    * can never alias two different schemas, and the per-call footer
    * read schema inference pays otherwise disappears from the serve
    * path. Durable: a store's layout is an offline-built artifact. */
  private val schemaMemo =
    new graft.PlanCache[org.apache.spark.sql.types.StructType](
      capacity = 64, durable = true)

  private def readFiles(
      spark: SparkSession, dir: String, files: Seq[String]): DataFrame = {
    require(files.nonEmpty,
      s"$Store $dir manifest lists no files — corrupt store?")
    val paths = files.map(f => s"$dir/$f")
    val schema = schemaMemo.getOrCompute(
      graft.PlanCache.Key(spark, s"$Store.schema", paths.head),
      spark.read.parquet(paths.head).schema)
    spark.read.schema(schema).parquet(paths: _*)
  }
}
