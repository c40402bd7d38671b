package graft.functions

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Persisted IVF(-PQ) index — the production shape of [[Ivf]]/[[Pq]]: build
  * ONCE (train a coarse quantizer + per-subspace PQ codebooks on a sample,
  * assign every corpus vector to its cell, ENCODE it to m small codes, write
  * the assignment `PARTITIONED BY (cell)`), then serve many query batches
  * against the on-disk layout.
  *
  * Why partitioned-by-cell matters at 100 TB: a probe of `nProbe` of
  * `nCells` cells becomes a DIRECTORY-level filter — the scan reads
  * `nProbe/nCells` of the corpus bytes and never opens the rest
  * (`PartitionFilters` in the plan, asserted in IvfIndexSpec). The
  * in-query [[Ivf.ivfTopK]] path still scans the full corpus to assign
  * cells per call; this class moves that cost to build time, which is the
  * difference between "ANN query reads 100 TB" and "ANN query reads
  * 100 TB × nProbe/nCells once the index exists".
  *
  * Why codes live in the SAME table as the raw vectors: parquet is
  * columnar — the ADC serve path projects `(id, codes)` and the raw-vector
  * column's pages are never fetched (ReadSchema asserted in IvfIndexSpec),
  * so one cell-partitioned table behaves exactly like a codes table with a
  * sibling raw-vector table, without the build writing the corpus twice or
  * the two tables drifting apart. At (m,k) = (8,16) the ADC scan reads
  * ~m bytes/row instead of dim·4 — the compressed-domain win of PQ reaches
  * disk, instead of being recomputed per query.
  *
  * The query batch is broadcast-small by contract (same contract as
  * [[Similarity.bruteForceTopK]]); its probed-cell set is collected
  * driver-side — O(queries·nProbe) ints — and pushed as a literal IN
  * filter so pruning is STATIC (no runtime DPP machinery needed).
  */
final class IvfIndex private (
    spark: SparkSession,
    private[graft] val path: String,
    val centroids: Array[Array[Double]],
    codebooksOpt: Option[Pq.Codebooks]) {

  def nCells: Int = centroids.length

  /** PQ codebooks persisted with the index (codebooks(mi)(ki) = sub-centroid). */
  def codebooks: Pq.Codebooks = codebooksOpt.getOrElse(
    throw new IllegalStateException(
      s"index at $path has no PQ codebooks (built before PQ persistence?)"))

  /** Cell-assigned corpus, read from the partitioned layout:
    * (id BIGINT, v ARRAY<DOUBLE>, codes ARRAY<INT>, cell INT partition col). */
  def cells: DataFrame = spark.read.parquet(s"$path/cells")

  /** Driver-side probed-cell set of a tagged query frame (tiny:
    * O(queries·nProbe) ints) — the static partition-pruning literal. */
  private def probedCells(q: DataFrame): Seq[Int] =
    q.select(col("cell")).distinct().collect().map(_.getInt(0)).toSeq

  /** Incremental ingest: assign + encode a NEW batch with the index's
    * FROZEN quantizer (centroids + codebooks unchanged — the standard IVF
    * growth mode) and append it to the cell-partitioned layout. Cost is
    * batch-sized: the existing corpus is never read or rewritten, and the
    * new rows land in their cells' directories where every later probe
    * finds them ([[cells]] re-reads the layout per serve call). Retraining
    * the quantizer (after heavy drift) is [[IvfIndex.build]] to a fresh
    * path — append never silently changes what existing codes mean. */
  def appendBatch(batch: DataFrame, idCol: String, vecCol: String): Unit = {
    val cb = codebooks // fail fast on legacy PQ-less indexes
    NearDup.fanOut(batch)
      .select(col(idCol).as("id"), Similarity.asDouble(col(vecCol)).as("v"))
      .withColumn("cell", Ivf.assignCellCol(col("v"), centroids))
      .withColumn("codes", graft.plans.PqNative.encodeNative(col("v"), cb))
      .write.mode("append").partitionBy("cell").parquet(s"$path/cells")
  }

  /** [[appendBatch]] made IDEMPOTENT under whole-batch replay — the
    * micro-batch ingest kernel [[graft.streaming.StreamOps
    * .ingestIvfStream]] runs per batch: ids already in the index are
    * screened out first, so a crashed-and-replayed delivery appends
    * nothing the crash's partial write (or the completed earlier
    * delivery) already landed. The screen is the [[PairStore.append]]
    * shape: the index side projects the id column only (columnar —
    * vector and code pages never read) and is semi-reduced by a
    * BROADCAST of the batch's ids before the anti-join, so the index is
    * scanned, never shuffled, and both join sides are batch-sized.
    *
    * The append itself is parquet-append of cell-partitioned files —
    * data-first, no manifest to publish: a crash mid-write leaves whole
    * well-formed part-files of ALREADY-SCREENED rows, which the replay
    * then skips (their ids are now present), so convergence needs no
    * recovery step. NOT safe for two concurrent writers racing the SAME
    * ids (both screens can pass before either writes) — one ingest
    * stream owns an index, the [[graft.streaming.StreamOps
    * .ingestDedupStream]] single-writer contract.
    *
    * @return the number of genuinely new rows appended (0 for a full
    *         replay — the cheap signal a restarted loop logs). */
  def appendBatchIdempotent(
      batch: DataFrame, idCol: String, vecCol: String): Long = {
    val b = batch.localCheckpoint(true)
    val fresh = screenFresh(b, idCol).localCheckpoint(true)
    val n = fresh.count()
    if (n > 0) appendBatch(fresh, idCol, vecCol)
    b.unpersist(blocking = false)
    fresh.unpersist(blocking = false)
    n
  }

  /** The already-indexed screen shared by [[appendBatchIdempotent]] and
    * [[graft.streaming.StreamOps.ingestIvfStream]]: rows of `batch`
    * whose id is NOT yet in the index. The index side projects the id
    * column only (columnar — vector/code pages never read), semi-reduced
    * by a BROADCAST of the batch's ids before the anti-join, so the
    * index is scanned, never shuffled, and both join sides stay
    * batch-sized. Callers own materialization (checkpoint/persist) —
    * the plan must not stay lazy across an append to the paths it
    * reads. */
  private[graft] def screenFresh(batch: DataFrame, idCol: String): DataFrame = {
    val batchIds = batch.select(col(idCol).cast("long").as("id")).distinct()
    val stored = cells.select(col("id"))
      .join(broadcast(batchIds), Seq("id"), "left_semi")
    batch.join(stored.withColumnRenamed("id", idCol), Seq(idCol), "left_anti")
  }

  /** Delete vectors by id — the retention path, CELL-pruned copy-on-
    * write (the ANN mirror of [[PairStore.delete]]'s file pruning): one
    * columnar `(id, cell)` projection scan locates the cells holding
    * deleted ids (vector and code pages never read), ONLY those cell
    * directories are rewritten without the deleted rows (dynamic
    * partition overwrite), and a fully-emptied cell's directory is
    * removed outright. Untouched cells — `(nCells - touched)/nCells` of
    * the corpus — are never read or written. The quantizer stays frozen
    * ([[appendBatch]]'s contract): an empty cell is a valid probe
    * target, and later appends may repopulate it.
    *
    * Not transactional, matching the layout's append semantics: a crash
    * mid-delete can leave some touched cells rewritten and others not.
    * Re-running the SAME delete converges (already-rewritten cells no
    * longer match the id scan); a torn state never corrupts serving —
    * every surviving row is a real corpus row. */
  def delete(ids: DataFrame, idCol: String): Unit = {
    val del = ids.select(col(idCol).as("id")).distinct().localCheckpoint(true)
    val touched = cells.select(col("id"), col("cell"))
      .join(broadcast(del), Seq("id"), "left_semi")
      .select(col("cell")).distinct().collect().map(_.getInt(0)).toSeq.sorted
    if (touched.isEmpty) { del.unpersist(blocking = false); return }
    // materialize survivors BEFORE overwriting the very directories the
    // plan reads (touched-cells-sized by construction)
    val survivors = cells.filter(col("cell").isin(touched: _*))
      .join(broadcast(del), Seq("id"), "left_anti")
      .localCheckpoint(true)
    val kept = survivors.select(col("cell")).distinct()
      .collect().map(_.getInt(0)).toSet
    survivors.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("cell").parquet(s"$path/cells")
    // dynamic overwrite only replaces partitions PRESENT in the data —
    // a cell whose every row was deleted must be removed explicitly
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    touched.filterNot(kept).foreach { c =>
      val p = new org.apache.hadoop.fs.Path(s"$path/cells/cell=$c")
      if (fs.exists(p) && !fs.delete(p, true))
        throw new IllegalStateException(s"IvfIndex: delete $p failed")
    }
    Seq(survivors, del).foreach(_.unpersist(blocking = false))
  }

  /** Top-k cosine neighbors of each query against the probed cells only,
    * re-ranking RAW vectors (the plain-IVF serve path).
    * `nProbe = nCells` probes everything → exact brute-force top-k (each
    * corpus vector lives in exactly one cell), which is what makes the
    * index path oracle-checkable end-to-end. */
  def topK(queries: DataFrame, idCol: String, vecCol: String, k: Int,
      nProbe: Int): DataFrame = {
    val q = queries.select(
      col(idCol).as("qid"), Similarity.asDouble(col(vecCol)).as("qv"))
      .withColumn("cell", explode(Ivf.probeCellsCol(col("qv"), centroids, nProbe)))
    val probed = probedCells(q)
    val sims = cells.select(col("id"), col("cell"), col("v"))
      .filter(col("cell").isin(probed: _*))
      .join(broadcast(q), "cell")
      .filter(col("qid") =!= col("id"))
      .select(col("qid"), col("id").as("nid"),
        Similarity.cosine(col("qv"), col("v")).as("sim"))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("nid"))
    sims.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= k)
      .select(col("qid"), col("nid"), round(col("sim"), 6).as("sim"))
      .orderBy(col("qid"), col("nid"))
  }

  /** IVF-PQ top-k against the PERSISTED codes: probe cells, ADC-score the
    * probed partitions' `(id, codes)` projection (raw vectors never read —
    * compressed-domain scan), shortlist `rerank·k` per query, exact cosine
    * re-rank of the shortlist only.
    *
    * The re-rank reads the raw-vector projection of the SAME probed
    * partitions and broadcast-joins the shortlist ids against it — at scale
    * the scan is bounded by nProbe/nCells of the corpus and the join keeps
    * only the shortlist. `nProbe = nCells` with `rerank·k ≥ corpus`
    * degenerates to exact brute force (the `ann_pq_full` oracle).
    */
  def pqTopK(queries: DataFrame, idCol: String, vecCol: String, k: Int,
      nProbe: Int, rerank: Int): DataFrame = {
    val cb = codebooks
    val m = cb.length
    val kCodes = cb(0).length
    val q = queries.select(
      col(idCol).as("qid"), Similarity.asDouble(col(vecCol)).as("qv"))
      .withColumn("cell", explode(Ivf.probeCellsCol(col("qv"), centroids, nProbe)))
      .withColumn("lut", graft.plans.PqNative.lutNative(col("qv"), cb))
    val probed = probedCells(q)

    // Compressed-domain scan: the projection IS (id, codes) — columnar
    // pruning keeps the raw-vector pages on disk (plan-asserted).
    val adc = cells.select(col("id"), col("cell"), col("codes"))
      .filter(col("cell").isin(probed: _*))
      .join(broadcast(q), "cell")
      .filter(col("qid") =!= col("id"))
      .withColumn("adc",
        aggregate(
          zip_with(col("codes"),
            sequence(lit(0), lit(m - 1)),
            (code, mi) => element_at(col("lut"), mi * kCodes + code + 1)),
          lit(0.0), (acc, x) => acc + x))
    val wAdc = Window.partitionBy(col("qid")).orderBy(col("adc"), col("id"))
    // Shortlist carries (qid, id) ONLY — duplicating the query vector per
    // shortlist row would broadcast O(queries·rerank·k·dim) doubles; the
    // vectors re-join from the (tiny, separately broadcast) query frame.
    val shortlist = adc.withColumn("_ar", row_number().over(wAdc))
      .filter(col("_ar") <= rerank * k)
      .select(col("qid"), col("id"))
    val qVecs = queries.select(
      col(idCol).as("qid"), Similarity.asDouble(col(vecCol)).as("qv"))

    // Exact re-rank: raw vectors only for the shortlist ids, read from the
    // probed partitions only (every shortlist id lives in a probed cell).
    val sims = cells.select(col("id"), col("cell"), col("v"))
      .filter(col("cell").isin(probed: _*))
      .join(broadcast(shortlist), "id")
      .join(broadcast(qVecs), "qid")
      .select(col("qid"), col("id").as("nid"),
        Similarity.cosine(col("qv"), col("v")).as("sim"))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("nid"))
    sims.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= k)
      .select(col("qid"), col("nid"), round(col("sim"), 6).as("sim"))
      .orderBy(col("qid"), col("nid"))
  }
}

object IvfIndex {

  /** Train on a sample, assign + PQ-encode, and persist the index at `path`
    * (`path/cells` partitioned by cell with raw vectors AND codes;
    * `path/centroids` the coarse quantizer; `path/codebooks` the PQ books). */
  def build(corpus: DataFrame, idCol: String, vecCol: String, nCells: Int,
      path: String, seed: Long = 42L, m: Int = 8, kCodes: Int = 16): IvfIndex = {
    val spark = corpus.sparkSession
    val centroids = Ivf.trainCentroids(corpus, vecCol, nCells, seed)
    val cb = Pq.trainCodebooks(corpus, vecCol, m, kCodes, seed)
    NearDup.fanOut(corpus)
      .select(col(idCol).as("id"), Similarity.asDouble(col(vecCol)).as("v"))
      .withColumn("cell", Ivf.assignCellCol(col("v"), centroids))
      .withColumn("codes", graft.plans.PqNative.encodeNative(col("v"), cb))
      .write.mode("overwrite").partitionBy("cell").parquet(s"$path/cells")
    val cRows = centroids.zipWithIndex.map { case (c, i) => Row(i, c.toSeq) }
    spark.createDataFrame(
      spark.sparkContext.parallelize(cRows.toIndexedSeq, 1),
      StructType(Seq(StructField("cell", IntegerType),
        StructField("centroid", ArrayType(DoubleType)))))
      .write.mode("overwrite").parquet(s"$path/centroids")
    val cbRows = for {
      (book, mi) <- cb.zipWithIndex
      (c, ki) <- book.zipWithIndex
    } yield Row(mi, ki, c.toSeq)
    spark.createDataFrame(
      spark.sparkContext.parallelize(cbRows.toIndexedSeq, 1),
      StructType(Seq(StructField("mi", IntegerType),
        StructField("ki", IntegerType),
        StructField("centroid", ArrayType(DoubleType)))))
      .write.mode("overwrite").parquet(s"$path/codebooks")
    new IvfIndex(spark, path, centroids, Some(cb))
  }

  /** Load a previously-built index: centroids and codebooks are
    * O(nCells·dim + m·k·subDim) — driver-side literal matrices, like the
    * LSH planes. Indexes built before PQ persistence load with no
    * codebooks (topK works; pqTopK errors with a clear message). */
  def load(spark: SparkSession, path: String): IvfIndex = {
    val centroids = spark.read.parquet(s"$path/centroids")
      .collect().sortBy(_.getInt(0))
      .map(_.getSeq[Double](1).toArray)
    // Only a genuinely ABSENT codebooks dir means "legacy index without PQ"
    // — an existing-but-unreadable or empty one is corruption and must
    // surface, not silently degrade to a PQ-less index.
    val cbPath = new org.apache.hadoop.fs.Path(s"$path/codebooks")
    val fs = cbPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val cbOpt =
      if (!fs.exists(cbPath)) None
      else {
        val rows = spark.read.parquet(s"$path/codebooks").collect()
          .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2).toArray))
        require(rows.nonEmpty, s"codebooks at $cbPath exist but hold no rows" +
          " (corrupt or half-written index?)")
        val m = rows.map(_._1).max + 1
        Some(Array.tabulate(m) { mi =>
          rows.filter(_._1 == mi).sortBy(_._2).map(_._3)
        }: Pq.Codebooks)
      }
    new IvfIndex(spark, path, centroids, cbOpt)
  }

  /** Per-JVM built-index cache for the registered queries: one build per
    * (corpus identity, quantizer config), every later call loads the
    * persisted layout — the serve-many-probes production shape. Durable:
    * a persisted index is an offline-built artifact; the parquet layout
    * outlives the handle either way. */
  private val indexCache =
    new graft.PlanCache[IvfIndex](capacity = 8, durable = true,
      onEvict = i => graft.TempDirs.delete(i.path))

  private[graft] def cachedFor(corpus: DataFrame, idCol: String,
      vecCol: String, nCells: Int, m: Int = 8, kCodes: Int = 16): IvfIndex =
    indexCache.getOrCompute(
      graft.PlanCache.keyOf(corpus, idCol, vecCol, nCells, m, kCodes),
      graft.BuildTimer.timed("ivf_index") {
        val dir = graft.TempDirs.create(s"graft_ivf_$nCells")
        build(corpus, idCol, vecCol, nCells, dir, m = m, kCodes = kCodes)
      })
}
