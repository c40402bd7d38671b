package graft.functions

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
  */
object SignatureStore {

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

  /** Build (overwrite) the store from an initial corpus. */
  def build(docs: DataFrame, dir: String, w: Int = 3): Unit =
    signatures(docs, w).write.mode("overwrite").parquet(dir)

  /** Append a batch's signatures (call after [[screenBatch]] accepts). */
  def append(docs: DataFrame, dir: String, w: Int = 3): Unit =
    signatures(docs, w).write.mode("append").parquet(dir)

  /** Delete signatures by doc id — the retention pass: once a document
    * is forgotten, future batches must stop being screened against it
    * (a new doc that matches only a deleted one must now be ACCEPTED).
    * File-pruned copy-on-write like [[PairStore.delete]]: one columnar
    * `doc_id` scan tags the files holding deleted ids (the signature
    * arrays' pages are never read), their survivor rows are appended as
    * new files, then the dead files are removed. A crash between the
    * two steps leaves duplicated survivor signatures — harmless to
    * screening (every screen is an anti-join / distinct-candidate
    * path), and reaped when a later delete touches those files. */
  def delete(spark: SparkSession, ids: DataFrame, dir: String): Unit = {
    val del = ids.select(col(ids.columns.head).as("doc_id"))
      .distinct().localCheckpoint(true)
    val dead = spark.read.parquet(dir)
      .select(col("doc_id"), input_file_name().as("_f"))
      .join(broadcast(del), Seq("doc_id"), "left_semi")
      .select(col("_f")).distinct().collect().map(_.getString(0))
    if (dead.isEmpty) { del.unpersist(blocking = false); return }
    val survivors = spark.read.parquet(dead.toIndexedSeq: _*)
      .join(broadcast(del), Seq("doc_id"), "left_anti")
      .localCheckpoint(true)
    if (!survivors.isEmpty) survivors.write.mode("append").parquet(dir)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    dead.foreach { f =>
      val p = new org.apache.hadoop.fs.Path(f)
      if (!fs.delete(p, false) && fs.exists(p))
        throw new IllegalStateException(s"SignatureStore: delete $p failed")
    }
    Seq(survivors, del).foreach(_.unpersist(blocking = false))
  }

  /** Surviving doc ids of a new batch screened against the store:
    * batch-exact-keeper ∧ exact hash unseen ∧ no near-dup vs store ∧ no
    * near-dup vs smaller batch id. All joins are batch-sized on one side;
    * the store side is touched via column-pruned scans and the prefix
    * hash join only. */
  def screenBatch(
      spark: SparkSession, batch: DataFrame, dir: String,
      threshold: Double, w: Int = 3): DataFrame = {
    val store = spark.read.parquet(dir)
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
}
