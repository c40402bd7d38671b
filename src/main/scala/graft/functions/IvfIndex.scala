package graft.functions

import org.apache.hadoop.fs.Path
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
  *
  * '''Layout & write contract''' ([[StoreCommit]] — the [[PairStore]]
  * protocol): vectors+codes live in immutable salted cell-partitioned
  * generation dirs `cells_g<v>.<salt>/cell=<c>/`; each quantizer lives in
  * an immutable `quant_g<v>.<salt>/` dir; `history/v<N>` manifests map
  * each committed version to its quantizer and its live (generation,
  * cell) pairs. Every reader pins ONE manifest per call, so a racing
  * append/delete/[[rebuild]] is invisible until its commit — readers see
  * old-or-new, never a mix. Writers stage a complete generation, then
  * CAS-commit: of N racing writers, EXACTLY ONE commits; the rest throw
  * `ConcurrentModificationException` with the index unharmed, and
  * replaying the loser converges ([[appendBatchIdempotent]] re-screens
  * against the winner's head). Superseded and orphaned generations stay
  * on disk for pinned readers until [[vacuum]] (run it only with no
  * writer live — the store tier's rule).
  *
  * '''Quantizer lifecycle.''' [[appendBatch]] grows the index under the
  * manifest's FROZEN quantizer (the standard IVF growth mode — append
  * never silently changes what existing codes mean). When drift degrades
  * partial-probe recall (the `ann_ivf_appended_recall` gate), [[rebuild]]
  * is the blue-green recovery: retrain the quantizer on the CURRENT
  * corpus, re-encode everything into a fresh generation, and swap both
  * in with one atomic manifest commit.
  */
final class IvfIndex private (
    spark: SparkSession,
    private[graft] val path: String,
    pin: Option[Long] = None) {

  import IvfIndex._

  /** One committed version, pinned: its quantizer dir and its live
    * (generation dir, cell) pairs. */
  private final case class Snap(
      version: Long, quantDir: String, genCells: Seq[(String, Int)])

  private def snapshot(): Snap = pin match {
    case Some(v) =>
      val fs = StoreCommit.fsOf(spark, path)
      require(fs.exists(new Path(s"$path/history/v$v")),
        s"$Store $path has no committed version $v (never written, or " +
          "vacuumed past retention)")
      snapshotAt(v)
    case None =>
      val fs = StoreCommit.fsOf(spark, path)
      snapshotAt(StoreCommit.currentVersion(fs, path, Store))
  }

  /** A read-only handle PINNED at committed version `v` — the
    * [[PairStore.snapshotAt]] symmetry: every serve call (topK, pqTopK,
    * cells, centroids) resolves version `v`'s quantizer and layout no
    * matter how far appends/deletes/rebuilds have advanced the store
    * (until [[vacuum]] retires it — then reads fail loudly). Writers
    * ([[appendBatch]], [[delete]], [[rebuild]], [[compact]],
    * [[vacuum]]) refuse on a pinned handle: a pin is a reproducible
    * VIEW, never a write target. */
  def at(v: Long): IvfIndex = new IvfIndex(spark, path, Some(v))

  /** The pinned version, if this handle is a [[at]] view. */
  def pinnedVersion: Option[Long] = pin

  private def requireWritable(op: String): Unit =
    require(pin.isEmpty,
      s"$Store: $op refused on a handle pinned at version ${pin.get} — " +
        "pins are reproducible views; write through an unpinned handle")

  private def snapshotAt(v: Long): Snap = {
    val fs = StoreCommit.fsOf(spark, path)
    var quant: Option[String] = None
    val pairs = Seq.newBuilder[(String, Int)]
    // serve path: memoized — committed manifests are immutable, so a
    // pinned or re-resolved version pays the manifest open ONCE per JVM
    StoreCommit.readManifestLinesCached(fs, path, v).foreach { l =>
      l.split(" ") match {
        case Array("version", _) | Array("nonce", _) => ()
        case Array("quant", q)                       => quant = Some(q)
        case Array("gen", g, c)                      => pairs += ((g, c.toInt))
        case other => throw new IllegalStateException(
          s"corrupt $Store manifest line '${other.mkString(" ")}' in $path/history/v$v")
      }
    }
    Snap(v, quant.getOrElse(throw new IllegalStateException(
      s"$Store manifest v$v at $path names no quantizer")), pairs.result())
  }

  private def quantOf(snap: Snap): Quantizer =
    loadQuantizer(spark, s"$path/${snap.quantDir}")

  /** The pinned snapshot's data — all cells, or only `probe`'s. Each
    * generation is read by DIRECT manifest addressing of its live
    * `cell=` leaf dirs (basePath keeps the partition column), so
    * uncommitted generations and superseded cells are never listed, let
    * alone scanned; unprobed cells are pruned from the SCAN by a
    * partition filter (`PartitionFilters`, plan-asserted) while their
    * one-time LISTING is shared through [[IvfIndex.genFrameCache]] —
    * generations are immutable once referenced, so the relation built
    * over a (generation, live-cell-set) pair is a pure function of its
    * key and every later probe of any cell subset reuses it instead of
    * re-listing leaf dirs per query (the dominant serve cost on an
    * object store, where each listing is a remote round-trip). */
  private def cellsOf(snap: Snap, probe: Option[Set[Int]]): DataFrame = {
    val frames = snap.genCells.groupBy(_._1).toSeq.sortBy(_._1).map {
      case (g, cs) =>
        val cells = cs.map(_._2).sorted
        genFrameCache.getOrCompute(
          graft.PlanCache.Key(spark, "ivf-gen-cells",
            s"$path|$g|${cells.mkString(",")}"), {
          // test seam: physical relation builds (leaf-dir listings) this
          // JVM performed — IvfIndexSpec pins that repeated probes of one
          // generation hit the memo (the manifestFileReads pattern)
          genRelationBuilds.incrementAndGet()
          // explicit schema: the layout is ours by construction, so
          // schema inference's footer read is pure serve-path overhead
          spark.read.option("basePath", s"$path/$g").schema(CellsSchema)
            .parquet(cells.map(c => s"$path/$g/cell=$c"): _*)
            .select(col("id"), col("v"), col("codes"), col("cell"))
        })
    }
    val all = frames.reduceOption(_.unionByName(_)).getOrElse(
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[Row], CellsSchema))
    probe match {
      case Some(p) => all.filter(col("cell").isin(p.toSeq.sorted: _*))
      case None    => all
    }
  }

  def version: Long = snapshot().version
  def nCells: Int = centroids.length
  def centroids: Array[Array[Double]] = quantOf(snapshot()).centroids

  /** PQ codebooks persisted with the index (codebooks(mi)(ki) = sub-centroid). */
  def codebooks: Pq.Codebooks = quantOf(snapshot()).codebooks

  /** Cell-assigned corpus at the CURRENT committed version:
    * (id BIGINT, v ARRAY<DOUBLE>, codes ARRAY<INT>, cell INT). */
  def cells: DataFrame = cellsOf(snapshot(), None)

  /** Driver-side probed-cell set of a tagged query frame (tiny:
    * O(queries·nProbe) ints) — the static partition-pruning literal. */
  private def probedCells(q: DataFrame): Seq[Int] =
    q.select(col("cell")).distinct().collect().map(_.getInt(0)).toSeq

  /** Incremental ingest: assign + encode a NEW batch with the current
    * version's FROZEN quantizer and commit it as a new generation. Cost
    * is batch-sized: the existing corpus is never read or rewritten.
    * Retraining after heavy drift is [[rebuild]] — append never silently
    * changes what existing codes mean. Of N appenders racing one index,
    * exactly one commits (manifest CAS); losers throw with the index
    * unharmed and replay via [[appendBatchIdempotent]]. */
  def appendBatch(batch: DataFrame, idCol: String, vecCol: String): Unit = {
    requireWritable("appendBatch")
    appendFrom(snapshot(), batch, idCol, vecCol)
  }

  /** Stage + CAS-commit `batch` as a new generation ON TOP OF `snap` —
    * the version the CALLER observed. Threading the observed snapshot
    * into the commit is what makes screen-then-append safe: a concurrent
    * commit landing anywhere after the caller's read (screen included)
    * moves the head past `snap.version` and this commit's CAS aborts,
    * instead of silently stacking on the interloper. */
  private def appendFrom(
      snap: Snap, batch: DataFrame, idCol: String, vecCol: String): Unit = {
    val fs = StoreCommit.fsOf(spark, path)
    val quant = quantOf(snap)
    val gen = StoreCommit.saltedGenDir("cells", snap.version + 1)
    NearDup.fanOut(batch)
      .select(col(idCol).cast("long").as("id"),
        Similarity.asDouble(col(vecCol)).as("v"))
      .withColumn("cell", Ivf.assignCellCol(col("v"), quant.centroids))
      .withColumn("codes",
        graft.plans.PqNative.encodeNative(col("v"), quant.codebooks))
      .write.mode("overwrite").partitionBy("cell").parquet(s"$path/$gen")
    val written = listCells(fs, path, gen)
    if (written.isEmpty) return // empty batch: nothing to commit
    onBeforeCommit()
    val all = snap.genCells ++ written.map(gen -> _)
    StoreCommit.commitManifest(fs, path, snap.version + 1,
      manifestLines(snap.version + 1, snap.quantDir, all), Store,
      referenced = referencedPaths(snap.quantDir, all))
  }

  /** On-disk paths a manifest references — the commit-time existence
    * verify's target list (see [[StoreCommit.commitManifest]] guard 2). */
  private def referencedPaths(
      quantDir: String, genCells: Seq[(String, Int)]): Seq[Path] =
    new Path(s"$path/$quantDir") +:
      genCells.map { case (g, c) => new Path(s"$path/$g/cell=$c") }

  /** [[appendBatch]] made IDEMPOTENT under whole-batch replay — the
    * micro-batch ingest kernel [[graft.streaming.StreamOps
    * .ingestIvfStream]] runs per batch: ids already in the index are
    * screened out first, so a crashed-and-replayed delivery appends
    * nothing a completed earlier delivery already landed (a crash BEFORE
    * the manifest commit left nothing visible at all — the generation is
    * unreferenced garbage for [[vacuum]]). Duplicate ids WITHIN one
    * batch collapse to a single (arbitrary) row before the screen, so a
    * self-duplicating batch can never double-insert either. Two writers
    * racing the SAME ids both pass the screen, but ONE manifest snapshot
    * spans each writer's screen AND commit ([[ingestBatch]]), so any
    * concurrent commit landing after the screen aborts this writer's CAS
    * — the loser replays, re-screens against the winner's head, and
    * appends only the genuinely-missing remainder.
    *
    * @return the number of genuinely new rows appended (0 for a full
    *         replay — the cheap signal a restarted loop logs). */
  def appendBatchIdempotent(
      batch: DataFrame, idCol: String, vecCol: String): Long =
    ingestBatch(batch, idCol, vecCol)(_ => ())

  /** The screen-then-append kernel under ONE pinned manifest snapshot
    * (shared with [[graft.streaming.StreamOps.ingestIvfStream]], whose
    * `onFresh` consumes the genuinely-new rows before they append).
    * The screen's index side projects the id column only (columnar —
    * vector/code pages never read), semi-reduced by a BROADCAST of the
    * batch's ids before the anti-join, so the index is scanned, never
    * shuffled, and both join sides stay batch-sized. Checkpointed
    * frames release on every exit path — losing a CAS race is a normal
    * flow here, and a contended ingest loop must not leak executor
    * blocks per lost race. */
  private[graft] def ingestBatch(batch: DataFrame, idCol: String,
      vecCol: String)(onFresh: DataFrame => Unit): Long = {
    requireWritable("ingestBatch")
    val b = batch.localCheckpoint(true)
    try {
      val snap = snapshot()
      val uniq = b.dropDuplicates(idCol)
      val batchIds = uniq.select(col(idCol).cast("long").as("id")).distinct()
      val stored = cellsOf(snap, None).select(col("id"))
        .join(broadcast(batchIds), Seq("id"), "left_semi")
      val fresh = uniq
        .join(stored.withColumnRenamed("id", idCol), Seq(idCol), "left_anti")
        .localCheckpoint(true)
      try {
        val n = fresh.count()
        onFresh(fresh)
        if (n > 0) appendFrom(snap, fresh, idCol, vecCol)
        n
      } finally fresh.unpersist(blocking = false)
    } finally b.unpersist(blocking = false)
  }

  /** Delete vectors by id — the retention path, CELL-pruned copy-on-
    * write (the ANN mirror of [[PairStore.delete]]'s file pruning): one
    * columnar `(id, cell)` projection scan locates the cells holding
    * deleted ids (vector and code pages never read), ONLY those cells'
    * survivor rows are rewritten into a new generation, and the CAS
    * commit swaps the touched cells over to it — a fully-emptied cell
    * simply leaves the manifest (still a valid probe target; later
    * appends may repopulate it). Untouched cells — `(nCells - touched)/
    * nCells` of the corpus — are never read or written, and keep their
    * physical files. The quantizer stays frozen ([[appendBatch]]'s
    * contract). Superseded cell data stays on disk for pinned readers
    * until [[vacuum]]; replaying a completed delete finds no touched
    * cell and commits nothing. */
  def delete(ids: DataFrame, idCol: String): Unit = {
    requireWritable("delete")
    val fs = StoreCommit.fsOf(spark, path)
    val snap = snapshot()
    val del = ids.select(col(idCol).cast("long").as("id"))
      .distinct().localCheckpoint(true)
    // try/finally: losing a CAS race throws out of the commit, and the
    // checkpointed delete set must release on that path too
    try {
      val touched = cellsOf(snap, None).select(col("id"), col("cell"))
        .join(broadcast(del), Seq("id"), "left_semi")
        .select(col("cell")).distinct().collect().map(_.getInt(0)).toSet
      if (touched.isEmpty) return
      val gen = StoreCommit.saltedGenDir("cells", snap.version + 1)
      cellsOf(snap, Some(touched))
        .join(broadcast(del), Seq("id"), "left_anti")
        .write.mode("overwrite").partitionBy("cell").parquet(s"$path/$gen")
      val kept = listCells(fs, path, gen)
      onBeforeCommit()
      val all = snap.genCells.filterNot { case (_, c) => touched(c) } ++
        kept.map(gen -> _)
      StoreCommit.commitManifest(fs, path, snap.version + 1,
        manifestLines(snap.version + 1, snap.quantDir, all), Store,
        referenced = referencedPaths(snap.quantDir, all))
    } finally del.unpersist(blocking = false)
  }

  /** Fold every live generation into ONE — the small-files compaction a
    * long micro-batch ingest history needs (each [[appendBatch]] commit
    * adds a generation; thousands of micro-batches mean thousands of
    * small files per cell and a thousand-line manifest). The quantizer
    * is UNCHANGED — this is a physical rewrite with identical logical
    * content (cell assignments and codes are carried, not recomputed),
    * so serving is bit-identical before and after. One O(live rows)
    * pass, CAS-committed like every other write; superseded generations
    * stay for pinned readers until [[vacuum]]. Explicit, never
    * auto-triggered: unlike [[PairStore]]'s edge-sized pair compaction,
    * this rewrite is corpus-sized — an ingest loop schedules it, an
    * append must not silently pay it. */
  def compact(): Unit = {
    requireWritable("compact")
    val fs = StoreCommit.fsOf(spark, path)
    val snap = snapshot()
    if (snap.genCells.map(_._1).distinct.size <= 1) return // already compact
    val gen = StoreCommit.saltedGenDir("cells", snap.version + 1)
    cellsOf(snap, None)
      .write.mode("overwrite").partitionBy("cell").parquet(s"$path/$gen")
    val written = listCells(fs, path, gen)
    onBeforeCommit()
    StoreCommit.commitManifest(fs, path, snap.version + 1,
      manifestLines(snap.version + 1, snap.quantDir, written.map(gen -> _)),
      Store,
      referenced = referencedPaths(snap.quantDir, written.map(gen -> _)))
  }

  /** Blue-green quantizer rebuild — the drift recovery [[appendBatch]]'s
    * frozen-quantizer contract defers to: retrain the coarse quantizer
    * and PQ codebooks on the CURRENT corpus, re-encode every vector into
    * one fresh generation, and publish both with a single atomic
    * manifest commit. Readers pinned to the old version keep serving the
    * old quantizer+layout until the swap lands (old generations stay on
    * disk until [[vacuum]]); a reader arriving after sees only the new —
    * never a mix of new centroids over old cell assignments. A writer
    * racing the rebuild hits the manifest CAS: one of them loses loudly
    * and replays. Full-probe exactness is invariant under rebuild (every
    * vector lives in exactly one cell either way); partial-probe recall
    * is what the retrain restores. */
  def rebuild(
      nCells: Int = 0, m: Int = 0, kCodes: Int = 0, seed: Long = 42L): Unit = {
    requireWritable("rebuild")
    val fs = StoreCommit.fsOf(spark, path)
    val snap = snapshot()
    val old = quantOf(snap)
    val nc = if (nCells > 0) nCells else old.centroids.length
    val nm = if (m > 0) m else old.codebooks.length
    val nk = if (kCodes > 0) kCodes else old.codebooks(0).length
    val corpus = cellsOf(snap, None).select(col("id"), col("v"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // unpersist in finally: a failed retrain/write must not pin a
    // corpus-sized cache for the session (the delete()/ingestBatch() rule)
    val gen = StoreCommit.saltedGenDir("cells", snap.version + 1)
    val (quantDir, v) = try {
      val centroids = Ivf.trainCentroids(corpus, "v", nc, seed)
      val cb = Pq.trainCodebooks(corpus, "v", nm, nk, seed)
      val nv = snap.version + 1
      val qd = StoreCommit.saltedGenDir("quant", nv)
      writeQuantizer(spark, s"$path/$qd", centroids, cb)
      corpus
        .withColumn("cell", Ivf.assignCellCol(col("v"), centroids))
        .withColumn("codes", graft.plans.PqNative.encodeNative(col("v"), cb))
        .write.mode("overwrite").partitionBy("cell").parquet(s"$path/$gen")
      (qd, nv)
    } finally corpus.unpersist(blocking = false)
    val written = listCells(fs, path, gen)
    onBeforeCommit()
    StoreCommit.commitManifest(fs, path, v,
      manifestLines(v, quantDir, written.map(gen -> _)), Store,
      referenced = referencedPaths(quantDir, written.map(gen -> _)))
  }

  /** Retire manifests older than the newest `keepLast` and delete the
    * cell generations and quantizer dirs no retained manifest
    * references — superseded deletes/rebuilds, crashed appends, losing
    * racers. Run only with no writer live (the store tier's rule). */
  def vacuum(keepLast: Int = 2): Unit = {
    requireWritable("vacuum")
    require(keepLast >= 1, s"keepLast must be >= 1, got $keepLast")
    val fs = StoreCommit.fsOf(spark, path)
    val versions = StoreCommit.committedVersions(fs, path).sorted
    val (drop, keep) = versions.splitAt(math.max(0, versions.size - keepLast))
    val snaps = keep.map(snapshotAt)
    val liveQuant = snaps.map(_.quantDir).toSet
    val liveCells: Set[(String, Int)] = snaps.flatMap(_.genCells).toSet
    val liveGens = liveCells.map(_._1)
    // abort loudly (deleting nothing) if a publish landed since the reap
    // set was computed — see StoreCommit.assertVersionsUnchanged
    StoreCommit.assertVersionsUnchanged(fs, path, versions, Store)
    drop.foreach(dv =>
      StoreCommit.deleteOrThrow(fs, new Path(s"$path/history/v$dv"), Store))
    StoreCommit.reapManifestTmp(fs, path, Store)
    StoreCommit.fsOf(spark, path).listStatus(new Path(path)).toSeq.foreach { s =>
      val n = s.getPath.getName
      if (n.startsWith("quant_g") && !liveQuant(n))
        StoreCommit.deleteOrThrow(fs, s.getPath, Store)
      else if (n.startsWith("cells_g")) {
        if (!liveGens(n)) StoreCommit.deleteOrThrow(fs, s.getPath, Store)
        else fs.listStatus(s.getPath).toSeq
          .filter(c => c.getPath.getName.startsWith("cell=") &&
            !liveCells((n, c.getPath.getName.stripPrefix("cell=").toInt)))
          .foreach(c => StoreCommit.deleteOrThrow(fs, c.getPath, Store))
      }
    }
  }

  /** Top-k cosine neighbors of each query against the probed cells only,
    * re-ranking RAW vectors (the plain-IVF serve path).
    * `nProbe = nCells` probes everything → exact brute-force top-k (each
    * corpus vector lives in exactly one cell), which is what makes the
    * index path oracle-checkable end-to-end. One snapshot pins the
    * quantizer AND the data for the whole call. */
  def topK(queries: DataFrame, idCol: String, vecCol: String, k: Int,
      nProbe: Int): DataFrame = {
    val snap = snapshot()
    val cents = quantOf(snap).centroids
    val q = queries.select(
      col(idCol).as("qid"), Similarity.asDouble(col(vecCol)).as("qv"))
      .withColumn("cell", explode(Ivf.probeCellsCol(col("qv"), cents, nProbe)))
    val probed = probedCells(q)
    val sims = cellsOf(snap, Some(probed.toSet)).select(col("id"), col("cell"), col("v"))
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
    val snap = snapshot()
    val quant = quantOf(snap)
    val cb = quant.codebooks
    val m = cb.length
    val kCodes = cb(0).length
    val q = queries.select(
      col(idCol).as("qid"), Similarity.asDouble(col(vecCol)).as("qv"))
      .withColumn("cell",
        explode(Ivf.probeCellsCol(col("qv"), quant.centroids, nProbe)))
      .withColumn("lut", graft.plans.PqNative.lutNative(col("qv"), cb))
    val probed = probedCells(q)
    val probedData = cellsOf(snap, Some(probed.toSet))

    // Compressed-domain scan: the projection IS (id, codes) — columnar
    // pruning keeps the raw-vector pages on disk (plan-asserted).
    val adc = probedData.select(col("id"), col("cell"), col("codes"))
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
    val sims = probedData.select(col("id"), col("cell"), col("v"))
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

  private val Store = "IvfIndex"

  /** Test seam: invoked immediately before every manifest commit
    * (append/delete/rebuild), so IvfIndexSpec can interleave a full
    * competing write at exactly the CAS window. No-op in production. */
  private[graft] var onBeforeCommit: () => Unit = () => ()

  /** Physical cell-relation builds (each one a leaf-dir listing pass)
    * performed by this JVM — the memo-hit observability seam for
    * [[genFrameCache]], mirroring [[StoreCommit.manifestFileReads]]. */
  private[graft] val genRelationBuilds =
    new java.util.concurrent.atomic.AtomicLong(0L)

  private[functions] final case class Quantizer(
      centroids: Array[Array[Double]], codebooks: Pq.Codebooks)

  private val CellsSchema = StructType(Seq(
    StructField("id", LongType),
    StructField("v", ArrayType(DoubleType)),
    StructField("codes", ArrayType(IntegerType)),
    StructField("cell", IntegerType)))

  private def manifestLines(
      v: Long, quantDir: String, genCells: Seq[(String, Int)]): Seq[String] =
    Seq(s"version $v", s"quant $quantDir") ++
      genCells.sortBy(gc => (gc._1, gc._2)).map { case (g, c) => s"gen $g $c" }

  /** Cell ids present in a freshly-written generation dir. */
  private def listCells(
      fs: org.apache.hadoop.fs.FileSystem, path: String,
      gen: String): Seq[Int] = {
    val p = new Path(s"$path/$gen")
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("cell="))
      .map(_.getPath.getName.stripPrefix("cell=").toInt).sorted
  }

  /** Per-(path, generation, live-cell-set) relation memo: a generation
    * dir is immutable once a manifest references it (appends mint new
    * salted dirs; deletes supersede whole cells out of the manifest, so
    * a changed live-cell-set changes the key), which makes the listed
    * relation a pure function of the key — probes stop re-listing leaf
    * dirs per query. A vacuumed generation's cached frame fails loudly
    * at execution (files gone), matching the pinned-reader contract.
    * Durable (offline-built artifacts); holds plans only, no executor
    * storage. */
  private val genFrameCache =
    new graft.PlanCache[org.apache.spark.sql.DataFrame](
      capacity = 256, durable = true)

  /** Quantizer dirs are immutable once referenced by a manifest — cache
    * the collected matrices per (session, absolute path), across handles
    * (driver memory: O(nCells·dim + m·k·subDim) doubles per distinct
    * quantizer). A bounded [[graft.PlanCache]] rather than a bare map: a
    * long-lived ingest service running periodic [[IvfIndex.rebuild]]s
    * mints a fresh quantizer dir per rebuild, and an unbounded map would
    * grow for the process lifetime (vacuumed dirs included). Durable —
    * quantizers are offline-built artifacts. */
  private val quantCache =
    new graft.PlanCache[Quantizer](capacity = 32, durable = true)

  private def loadQuantizer(spark: SparkSession, dir: String): Quantizer =
    quantCache.getOrCompute(
      graft.PlanCache.Key(spark, "quantizer", dir), {
      val centroids = spark.read.parquet(s"$dir/centroids")
        .collect().sortBy(_.getInt(0))
        .map(_.getSeq[Double](1).toArray)
      val rows = spark.read.parquet(s"$dir/codebooks").collect()
        .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2).toArray))
      require(rows.nonEmpty, s"codebooks at $dir exist but hold no rows" +
        " (corrupt or half-written index?)")
      val m = rows.map(_._1).max + 1
      Quantizer(centroids,
        Array.tabulate(m) { mi => rows.filter(_._1 == mi).sortBy(_._2).map(_._3) })
    })

  private def writeQuantizer(
      spark: SparkSession, dir: String,
      centroids: Array[Array[Double]], cb: Pq.Codebooks): Unit = {
    val cRows = centroids.zipWithIndex.map { case (c, i) => Row(i, c.toSeq) }
    spark.createDataFrame(
      spark.sparkContext.parallelize(cRows.toIndexedSeq, 1),
      StructType(Seq(StructField("cell", IntegerType),
        StructField("centroid", ArrayType(DoubleType)))))
      .write.mode("overwrite").parquet(s"$dir/centroids")
    val cbRows = for {
      (book, mi) <- cb.zipWithIndex
      (c, ki) <- book.zipWithIndex
    } yield Row(mi, ki, c.toSeq)
    spark.createDataFrame(
      spark.sparkContext.parallelize(cbRows.toIndexedSeq, 1),
      StructType(Seq(StructField("mi", IntegerType),
        StructField("ki", IntegerType),
        StructField("centroid", ArrayType(DoubleType)))))
      .write.mode("overwrite").parquet(s"$dir/codebooks")
  }

  /** Train on a sample, assign + PQ-encode, and persist the index at
    * `path` as manifest version 0 (the store's history starts over). */
  def build(corpus: DataFrame, idCol: String, vecCol: String, nCells: Int,
      path: String, seed: Long = 42L, m: Int = 8, kCodes: Int = 16): IvfIndex = {
    val spark = corpus.sparkSession
    val fs = StoreCommit.fsOf(spark, path)
    if (fs.exists(new Path(path)))
      fs.listStatus(new Path(path)).toSeq
        .filter(s => s.getPath.getName.startsWith("cells_g") ||
          s.getPath.getName.startsWith("quant_g") ||
          s.getPath.getName == "history" ||
          // pre-round-14 flat layout — a rebuild starts over
          Seq("cells", "centroids", "codebooks").contains(s.getPath.getName))
        .foreach(s => StoreCommit.deleteOrThrow(fs, s.getPath, Store))
    val centroids = Ivf.trainCentroids(corpus, vecCol, nCells, seed)
    val cb = Pq.trainCodebooks(corpus, vecCol, m, kCodes, seed)
    val quantDir = StoreCommit.saltedGenDir("quant", 0L)
    writeQuantizer(spark, s"$path/$quantDir", centroids, cb)
    val gen = StoreCommit.saltedGenDir("cells", 0L)
    NearDup.fanOut(corpus)
      .select(col(idCol).cast("long").as("id"),
        Similarity.asDouble(col(vecCol)).as("v"))
      .withColumn("cell", Ivf.assignCellCol(col("v"), centroids))
      .withColumn("codes", graft.plans.PqNative.encodeNative(col("v"), cb))
      .write.mode("overwrite").partitionBy("cell").parquet(s"$path/$gen")
    StoreCommit.commitManifest(fs, path, 0L,
      manifestLines(0L, quantDir, listCells(fs, path, gen).map(gen -> _)),
      Store)
    new IvfIndex(spark, path)
  }

  /** Open a previously-built index. The handle is version-free: every
    * call pins the CURRENT committed manifest, so one long-lived handle
    * always serves the newest committed state and never a torn one. */
  def load(spark: SparkSession, path: String): IvfIndex = {
    val fs = StoreCommit.fsOf(spark, path)
    StoreCommit.currentVersion(fs, path, Store) // fail fast on non-stores
    new IvfIndex(spark, path)
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
