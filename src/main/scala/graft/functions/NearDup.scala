package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Near-duplicate detection over text — MinHash+LSH, SimHash, and exact
  * n-gram Jaccard (EXT tier). The 100 TB contract for all three: candidate
  * pairs come from equality joins on hash keys (shingle, band signature, or
  * simhash band) — never an O(n²) cross product; the exact similarity is
  * only computed on candidates.
  */
object NearDup {

  /** Spread a compute-bound per-row stage across the cluster when the
    * input's file layout under-parallelizes it (a single-row-group parquet
    * file scans as ONE partition — which serialized all shingling/hashing
    * on one core locally). No-op when the input is big enough to split,
    * so at real scale (thousands of splits) no reshuffle happens.
    * Split count is estimated from Catalyst plan statistics (driver-side
    * metadata only — no RDD lineage materialization, no job). */
  private[graft] def fanOut(df: DataFrame): DataFrame = {
    if (df.isStreaming) return df // micro-batch sizing is the scheduler's
    val spark = df.sparkSession
    val want = spark.sparkContext.defaultParallelism
    val maxSplit = bytesConf(spark.conf.get(
      "spark.sql.files.maxPartitionBytes", "134217728"), 134217728L)
    val estSplits =
      (df.queryExecution.optimizedPlan.stats.sizeInBytes / BigInt(maxSplit.max(1L))) + 1
    if (estSplits >= want) df else df.repartition(want)
  }

  /** Parse a Spark byte-size conf value ("10MB", "134217728b", "-1"). */
  private def bytesConf(v: String, default: Long): Long =
    try org.apache.spark.network.util.JavaUtils.byteStringAsBytes(v)
    catch { case _: NumberFormatException => default }

  /** Broadcast hint gated on a size estimate: applied only when the
    * estimated size fits the session's autoBroadcastJoinThreshold. The
    * near-dup verify tables are O(docs) — small at test SF, unbounded at
    * 100 TB — so a hardcoded hint would OOM at scale; with the gate, small
    * inputs keep the single-shuffle broadcast plan and large inputs fall
    * back to a shuffled join on the id key (which AQE may still convert to
    * broadcast at runtime if the actual size turns out small).
    *
    * `sizeProxy`: plan whose stats stand in for `df`'s size — pass the
    * SOURCE scan (its estimate is the actual file bytes) when `df` itself
    * is an aggregate/array derivation, because Catalyst's post-aggregate
    * size estimates wildly overestimate and would silently de-broadcast a
    * table that comfortably fits (measured 4.7× slowdown on the ngram
    * verify at sf0.1). The derived tables here (shingle-hash arrays,
    * signatures) are all ≤ the raw text bytes they derive from. */
  private[graft] def broadcastIfSmall(
      df: DataFrame, sizeProxy: Option[DataFrame] = None): DataFrame = {
    val threshold = bytesConf(df.sparkSession.conf.get(
      "spark.sql.autoBroadcastJoinThreshold", "10485760"), -1L)
    val est = sizeProxy.getOrElse(df).queryExecution.optimizedPlan.stats.sizeInBytes
    if (threshold > 0 && est <= BigInt(threshold)) broadcast(df) else df
  }

  /** Distinct w-token shingles over a TOKEN-ARRAY column. `toks` must be a
    * bound attribute (a materialized column), NOT an inline `split(...)`
    * expression: an expression referenced inside the transform lambda is
    * re-evaluated PER ELEMENT — with inline split that re-tokenizes the
    * whole document for every shingle, turning shingling O(tokens²)
    * (measured: 6s of a 10s query at sf0.1). */
  def shinglesOf(toks: Column, w: Int = 3): Column = {
    require(w >= 1, "shingle width must be >= 1")
    // TOTAL on short inputs: sequence(0, size-w) with size < w yields a
    // DESCENDING [0, -1, …] (Spark's sequence steps -1 when start > stop)
    // whose transform indexes past the array — an ANSI runtime error. The
    // guard must live HERE, not in callers' size(toks) >= w filters: the
    // optimizer can evaluate a projection on a row its sibling filter
    // later drops (observed with a repartitioned input), so the
    // expression itself has to be safe on every row it might see.
    val starts = when(size(toks) >= w, sequence(lit(0), size(toks) - w))
      .otherwise(array().cast("array<int>"))
    array_distinct(
      transform(starts,
        i => concat_ws(" ", (0 until w).map(j => element_at(toks, i + 1 + j)): _*)))
  }

  /** Distinct w-token shingles of `text` — convenience form for single-use
    * contexts; see [[shinglesOf]] for the per-element-eval caveat. */
  def shingles(text: Column, w: Int = 3): Column = shinglesOf(split(text, " "), w)

  /** Exploded (doc_id, shingle) relation — the base for both exact Jaccard
    * and MinHash. One row per distinct shingle per doc. Tokens bound to an
    * attribute column before shingling (see shinglesOf). */
  def docShingles(docs: DataFrame, w: Int = 3): DataFrame =
    fanOut(docs)
      .select(col("doc_id"), split(col("text"), " ").as("_toks"))
      .filter(size(col("_toks")) >= w)
      .select(col("doc_id"), explode(shinglesOf(col("_toks"), w)).as("shingle"))

  /** Hashed distinct (doc_id, shingle-hash) relation. Joining on the
    * 64-bit shingle hash instead of the string keeps shuffles at 8 bytes
    * per shingle; a cross-shingle collision could overcount an
    * intersection with probability ~(distinct shingles)²/2⁶⁵ (~1e-8 at
    * sf0.1) — accepted and documented. */
  private def hashedShingles(docs: DataFrame, w: Int): DataFrame =
    docShingles(docs, w).select(col("doc_id"), xxhash64(col("shingle")).as("h"))

  /** Exact n-gram Jaccard pairs: similarity = |∩| / |∪| over distinct
    * shingle sets, kept when ≥ threshold; each pair once (a < b).
    *
    * Candidate generation uses PPJoin-style *prefix filtering*, lossless
    * for Jaccard ≥ t: under any global total order of shingles, two docs
    * with Jaccard ≥ t MUST share a shingle within each other's first
    * ⌊(1-t)·|d|⌋+1 shingles, so only those prefixes enter the self-join.
    * The global order here is the shingle hash itself, which makes the
    * whole prefix derivation ROW-LOCAL (sort the per-doc hash array, slice
    * the prefix — zero shuffles before the candidate join); verification
    * counts intersections only for candidate pairs. All equality joins, no
    * cross product. For zipfian corpora the rarest-first ordering
    * ([[ngramJaccardPairsRareFirst]]) prunes harder;
    * [[ngramJaccardPairsAuto]] picks between the two from a cheap
    * document-frequency skew probe.
    */
  /** (doc_id, sorted distinct shingle-hash array, n_shingles) — the shared
    * payload for prefix filtering, minhash signatures, and exact verify. */
  private[functions] def shingleHashArrays(docs: DataFrame, w: Int): DataFrame =
    fanOut(docs)
      .select(col("doc_id"), split(col("text"), " ").as("_toks"))
      .filter(size(col("_toks")) >= w)
      .select(col("doc_id"),
        array_sort(array_distinct(
          transform(shinglesOf(col("_toks"), w), s => xxhash64(s)))).as("arr"))
      .withColumn("n_shingles", size(col("arr")))

  /** PPJoin prefix length `n - ⌈t·n⌉ + 1` as a column — the shared,
    * FP-SAFE form all three prefix-filter pipelines use.
    *
    * `n - ceil(t·n) + 1`, NOT `floor((1-t)·n)+1`: algebraically equal,
    * but (1-t) is inexact in double for t like 0.8/0.9 and the floor
    * form can deflate the prefix by one — silently losing an exactly-
    * at-threshold pair. The ceil itself needs one more guard: binary
    * doubles can round an exact integer product UP (t=0.56 × n=25 →
    * 14.000000000000002, ceil → 15), which would SHORTEN the prefix by
    * one and reintroduce the same at-threshold false negative from the
    * other side. Subtracting an epsilon far below 1 ulp of any real
    * (t·n) before the ceil makes FP rounding err only toward LONGER
    * prefixes (more candidates, never a lost pair). */
  private[graft] def prefixLenCol(n: Column, threshold: Double): Column =
    (n - ceil(lit(threshold) * n - lit(1e-9)) + 1).cast("int")

  /** Exact-Jaccard verification of candidate (id_a, id_b) pairs against the
    * per-doc shingle-hash arrays: row-local sorted-intersect (no explode,
    * no per-pair groupBy), size-gated broadcast of the O(docs) array table
    * (shuffled join on the id at scale). */
  private def verifyJaccard(
      cand: DataFrame, arrs: DataFrame, threshold: Double,
      sizeProxy: Option[DataFrame]): DataFrame =
    verifyJaccardTwoSided(cand, arrs, arrs, threshold, sizeProxy, sizeProxy)

  /** [[verifyJaccard]] with distinct array tables per pair side — the
    * cross-corpus case ([[ngramJaccardAcross]]). */
  private def verifyJaccardTwoSided(
      cand: DataFrame, arrsA: DataFrame, arrsB: DataFrame, threshold: Double,
      proxyA: Option[DataFrame], proxyB: Option[DataFrame]): DataFrame = {
    def byId(arrs: DataFrame) =
      arrs.select(col("doc_id"), col("arr"), col("n_shingles"))
    cand
      .join(broadcastIfSmall(byId(arrsA).toDF("id_a", "arr_a", "na"), proxyA), "id_a")
      .join(broadcastIfSmall(byId(arrsB).toDF("id_b", "arr_b", "nb"), proxyB), "id_b")
      .withColumn("inter", graft.plans.SortedIntersectCount
        .sortedIntersectCount(col("arr_a"), col("arr_b")))
      .withColumn("jaccard",
        col("inter").cast("double") / (col("na") + col("nb") - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
      .orderBy(col("id_a"), col("id_b"))
  }

  /** CROSS-corpus exact n-gram Jaccard pairs: near-dups BETWEEN `left`
    * and `right` (`id_a` from left, `id_b` from right) — the
    * INCREMENTAL-INGEST probe: a new batch screened against the
    * already-ingested corpus without ever re-pairing the corpus with
    * itself. Same lossless PPJoin prefix filter as [[ngramJaccardPairs]]
    * (a cross pair with Jaccard ≥ t must share a hash inside both
    * prefixes, by the same total order), same row-local sorted-intersect
    * verify; cost ∝ shared prefix hashes between the sides — at scale the
    * new batch is small, so this is batch-sized, never corpus². No
    * `a < b` constraint: the sides are distinct by role (ids may overlap;
    * callers pass disjoint corpora). */
  def ngramJaccardAcross(
      left: DataFrame, right: DataFrame, threshold: Double, w: Int = 3): DataFrame = {
    val la = shingleHashArrays(left, w).persist()
    val ra = shingleHashArrays(right, w).persist()
    graft.AutoUnpersist.afterFirstUse(
      acrossArrays(la, ra, threshold,
        proxyA = Some(left), proxyB = Some(right)),
      la, ra)
  }

  /** [[ngramJaccardAcross]] over PRECOMPUTED signature tables
    * (doc_id, arr, n_shingles) — the store-backed path
    * ([[SignatureStore]]): the right side comes off parquet, so screening
    * a batch never re-shingles the ingested corpus. Size proxies default
    * to the array tables themselves (parquet stats price the store). */
  private[functions] def acrossArrays(
      la: DataFrame, ra: DataFrame, threshold: Double,
      proxyA: Option[DataFrame] = None, proxyB: Option[DataFrame] = None): DataFrame = {
    val prefixLen = prefixLenCol(col("n_shingles"), threshold)
    def prefix(arrs: DataFrame, id: String) = arrs.select(
      col("doc_id").as(id), explode(slice(col("arr"), lit(1), prefixLen)).as("h"))
    val cand = prefix(la, "id_a").join(prefix(ra, "id_b"), "h")
      .select(col("id_a"), col("id_b")).distinct()
    verifyJaccardTwoSided(cand, la, ra, threshold, proxyA, proxyB)
  }

  /** Per-JVM cache of VERIFIED pair tables, keyed by the corpus plan's
    * canonicalized hash + (threshold, w): the exact-Jaccard pair set is
    * the expensive shared input of the whole dedup stage — pair report,
    * cluster closure, collapsed corpus, and the cleaning pipeline's
    * near-dup criterion all consume the SAME pairs. The persisted payload
    * is dup pairs only (three columns, dup-pair-sized — a sliver of the
    * corpus), and it spills (MEMORY_AND_DISK). Same production shape as
    * [[graft.functions.Clusters.connectedComponentsShared]]: compute the
    * intermediate once, fan out consumers. Bounded LRU with unpersist on
    * evict; see [[graft.PlanCache]] for the key/lifecycle contract. */
  private val pairsCache =
    new graft.PlanCache[DataFrame](capacity = 16, onEvict = graft.PlanCache.unpersist)

  /** [[ngramJaccardPairsAuto]] through the per-JVM cache — use when
    * several queries consume one pair set. Identical output, computed
    * once; the skew probe runs only on a cache miss (a served pair set
    * costs no corpus pass at all). */
  def ngramJaccardPairsShared(docs: DataFrame, threshold: Double, w: Int = 3): DataFrame =
    pairsCache.getOrCompute(graft.PlanCache.keyOf(docs, threshold, w),
      ngramJaccardPairsAuto(docs, threshold, w)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))

  /** Share of all (doc, shingle) occurrences held by the single
    * most-frequent shingle hash — the skew statistic
    * [[ngramJaccardPairsAuto]] selects on. One exploded-count aggregate
    * folded to ONE driver row (8 bytes of state per distinct shingle on
    * the executors, two bounded shuffles, nothing collected but the
    * max/total pair) — the cheap probe a 100 TB operator can afford
    * before committing to a pair-generation ordering. */
  def topShingleDfShare(docs: DataFrame, w: Int = 3): Double =
    probeCache.getOrCompute(graft.PlanCache.keyOf(docs, w),
      Double.box(dfShareOf(shingleHashArrays(docs, w)))).doubleValue()

  /** The probe's aggregate over a (possibly pre-persisted) shingle-hash
    * array table — shared so [[ngramJaccardPairsAuto]] probes the same
    * arrays its pair pipeline consumes. */
  private def dfShareOf(arrs: DataFrame): Double = {
    val row = arrs.select(explode(col("arr")).as("h"))
      .groupBy(col("h")).agg(count(lit(1)).as("df"))
      .agg(max(col("df")).as("mx"), sum(col("df")).as("tot")).head()
    if (row.isNullAt(1) || row.getLong(1) == 0L) 0.0
    else row.getLong(0).toDouble / row.getLong(1)
  }

  /** Memoized skew verdicts, keyed by (corpus plan, w). DURABLE — the
    * verdict is a planning statistic of the corpus, not a query
    * intermediate: it survives the bench harness's between-query
    * [[graft.PlanCache.clearShared]], so only the FIRST cold pair-family
    * key per corpus pays the df aggregate (~0.3–0.8 s at sf0.1 × ~8 keys
    * before this cache). Same staleness caveat as every durable cache:
    * rewriting data in place at an unchanged path needs
    * [[graft.PlanCache.clearAll]]. A boxed double per corpus — no
    * executor storage to evict. */
  private val probeCache =
    new graft.PlanCache[java.lang.Double](capacity = 64, durable = true)

  /** Exact n-gram Jaccard pairs with the prefix ORDERING chosen by a
    * document-frequency skew probe: zipfian corpora (mirrors, templates,
    * boilerplate — a handful of stop-shingles held by a large doc share)
    * get the rarest-first order ([[ngramJaccardPairsRareFirst]]), whose
    * Σ df_prefix² candidate bound is what survives the skew; uniform
    * corpora keep the hash order ([[ngramJaccardPairs]]), which skips
    * the df aggregate and the per-doc re-sort entirely. Both paths are
    * EXACT — the choice moves candidate-join cost, never the output —
    * so callers (and the oracle) see identical rows either way.
    *
    * The probe reads the SAME persisted shingle-hash array table the
    * chosen pair pipeline then consumes — its marginal cost is one
    * df aggregate over cached arrays, NOT a second shingle pass (a
    * first cut re-shingled, which cost every pair-family bench key
    * 2–4× before the arrays were shared).
    *
    * `skewShare` is the top-shingle occurrence share above which the
    * probe declares skew. 0.02 separates the regimes by orders of
    * magnitude: a healthy shingled corpus tops out near 1/|distinct
    * shingles| (~1e-4 at sf0.01), while template skew puts whole
    * percents of all occurrences on one shingle. */
  def ngramJaccardPairsAuto(
      docs: DataFrame, threshold: Double, w: Int = 3,
      skewShare: Double = 0.02): DataFrame = {
    val arrs = shingleHashArrays(docs, w).persist()
    // the probe's verdict is MEMOIZED per (corpus, w) in a durable cache
    // (it is a planning statistic, not a query intermediate): only the
    // first cold pair-family key per corpus pays the df aggregate —
    // whose action also materializes `arrs` into the cache, so the pair
    // pipeline underneath starts from warmed arrays on that first call
    val share = probeCache.getOrCompute(graft.PlanCache.keyOf(docs, w),
      Double.box(dfShareOf(arrs))).doubleValue()
    if (share >= skewShare) {
      // the SKEWED branch needs the df table anyway (rarest-first order);
      // persisted so the candidate and verify stages share one compute
      val dfreq = arrs.select(explode(col("arr")).as("h"))
        .groupBy(col("h")).agg(count(lit(1)).as("df")).persist()
      graft.AutoUnpersist.afterFirstUse(
        rareFirstFromArrs(arrs, threshold, Some(docs), Some(dfreq)),
        arrs, dfreq)
    } else
      graft.AutoUnpersist.afterFirstUse(
        pairsFromArrs(arrs, threshold, Some(docs)), arrs)
  }

  def ngramJaccardPairs(docs: DataFrame, threshold: Double, w: Int = 3): DataFrame = {
    // (doc_id, sorted distinct shingle-hash array, n) — persisted: feeds
    // the prefix branch, the verify branch, and the size lookups; released
    // after the result's first materialization (AutoUnpersist)
    val arrs = shingleHashArrays(docs, w).persist()
    graft.AutoUnpersist.afterFirstUse(
      pairsFromArrs(arrs, threshold, sizeProxy = Some(docs)), arrs)
  }

  /** Hash-ordered prefix-filter pair pipeline over a PRE-PERSISTED
    * shingle-hash array table — the shared kernel of
    * [[ngramJaccardPairs]] and [[ngramJaccardPairsAuto]] (which pays
    * the shingle pass once for probe and pairs together). */
  private def pairsFromArrs(
      arrs: DataFrame, threshold: Double,
      sizeProxy: Option[DataFrame]): DataFrame = {
    val prefixLen = prefixLenCol(col("n_shingles"), threshold)
    val prefix = arrs.select(col("doc_id"),
      explode(slice(col("arr"), lit(1), prefixLen)).as("h"))
    val cand = prefix.as("a")
      .join(prefix.as("b"), col("a.h") === col("b.h")
        && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .distinct()
    verifyJaccard(cand, arrs, threshold, sizeProxy)
  }

  /** Exact n-gram Jaccard with RAREST-FIRST prefix ordering: the global
    * total order behind the prefix filter is (document frequency asc,
    * hash) instead of the raw hash. Prefix filtering is lossless under ANY
    * consistently-applied global order, but the candidate count is
    * Σ df_prefix² — putting the RAREST shingles in every prefix minimizes
    * exactly that sum, which matters on zipfian corpora where a handful of
    * stop-shingles would otherwise pair everything with everything. Costs
    * one extra aggregate (the df table) and a per-doc re-sort shuffle over
    * the hash-ordered default [[ngramJaccardPairs]]; choose it when the
    * shingle distribution is skewed. Output is identical (both exact). */
  def ngramJaccardPairsRareFirst(
      docs: DataFrame, threshold: Double, w: Int = 3): DataFrame = {
    val arrs = shingleHashArrays(docs, w).persist()
    graft.AutoUnpersist.afterFirstUse(
      rareFirstFromArrs(arrs, threshold, sizeProxy = Some(docs)), arrs)
  }

  /** Rarest-first pair pipeline over a pre-persisted array table — see
    * [[pairsFromArrs]]. `dfreqIn`: a precomputed (h, df) document-
    * frequency table (the skew probe already built one — recomputing it
    * here would double the aggregate on exactly the path the probe
    * selects). */
  private def rareFirstFromArrs(
      arrs: DataFrame, threshold: Double,
      sizeProxy: Option[DataFrame],
      dfreqIn: Option[DataFrame] = None): DataFrame = {
    val exploded = arrs.select(col("doc_id"), explode(col("arr")).as("h"))
    val dfreq = dfreqIn.getOrElse(
      exploded.groupBy(col("h")).agg(count(lit(1)).as("df")))
    // per-doc shingles sorted rarest-first: struct sort = (df asc, h asc),
    // a valid global total order (ties broken by the hash)
    val ranked = exploded.join(dfreq, "h")
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(struct(col("df"), col("h")))).as("ordered"),
        count(lit(1)).as("n_sh"))
    val prefix = ranked.select(col("doc_id"),
      explode(transform(
        slice(col("ordered"), lit(1), prefixLenCol(col("n_sh"), threshold)),
        s => s.getField("h"))).as("h"))
    val cand = prefix.as("a")
      .join(prefix.as("b"), col("a.h") === col("b.h")
        && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .distinct()
    verifyJaccard(cand, arrs, threshold, sizeProxy)
  }

  /** Naive variant (full shingle self-join) — the reference implementation
    * prefix filtering is tested against. */
  private[graft] def ngramJaccardPairsNaive(
      docs: DataFrame, threshold: Double, w: Int = 3): DataFrame = {
    val ds = hashedShingles(docs, w).persist()
    val sizes = ds.groupBy(col("doc_id")).agg(count(lit(1)).as("n_shingles"))
    val inter = ds.as("a")
      .join(ds.as("b"), col("a.h") === col("b.h")
        && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(broadcastIfSmall(sizes.withColumnRenamed("doc_id", "id_a")
        .withColumnRenamed("n_shingles", "na"), Some(docs)), "id_a")
      .join(broadcastIfSmall(sizes.withColumnRenamed("doc_id", "id_b")
        .withColumnRenamed("n_shingles", "nb"), Some(docs)), "id_b")
      .withColumn("jaccard",
        col("inter").cast("double") / (col("na") + col("nb") - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
      .orderBy(col("id_a"), col("id_b"))
  }

  /** Seeded per-slot salts for the k-member hash family. */
  private def slotSalts(k: Int, seed: Long = 0x9E3779B97F4A7C15L): Seq[Long] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(k)(rnd.nextLong())
  }

  /** MinHash signatures: k independent hash slots, slot j =
    * min over shingles of h_j(shingle) where h_j(s) = xxhash64(xxhash64(s)
    * XOR salt_j) — the variable-length shingle string is hashed ONCE and
    * each family member is an XOR plus one fixed-width (8-byte) rehash,
    * instead of k full string hashes. (XOR, not affine a·h+b: Spark 4 runs
    * ANSI mode, where wrapping long arithmetic throws on overflow.)
    * Computed as k min-aggregates over the exploded shingle relation:
    * map-side combine collapses each doc's shingles to one signature row
    * per partition before the shuffle. */
  def minhashSignatures(docs: DataFrame, k: Int = 32, w: Int = 3): DataFrame = {
    val ds = docShingles(docs, w).withColumn("h0", xxhash64(col("shingle")))
    val slots = slotSalts(k).zipWithIndex.map { case (salt, j) =>
      min(xxhash64(col("h0").bitwiseXOR(lit(salt)))).as(s"mh_$j")
    }
    ds.groupBy(col("doc_id")).agg(slots.head, slots.tail: _*)
  }

  /** MinHash-LSH candidate pairs + signature-estimated Jaccard.
    * Bands of r consecutive slots; docs agreeing on any whole band are
    * candidates (join on the band hash); estimate = fraction of all k
    * slots that agree; kept when ≥ threshold.
    */
  def minhashPairs(
      docs: DataFrame,
      threshold: Double = 0.5,
      k: Int = 32,
      bands: Int = 8,
      w: Int = 3
  ): DataFrame = {
    require(k % bands == 0, "bands must divide k")
    val r = k / bands
    // persist: the signature table (O(docs) rows, k+1 columns) feeds the
    // banding pass and both sides of the candidate verify — without it the
    // k×|shingles| hashing runs three times
    val sig = minhashSignatures(docs, k, w).persist()
    // (doc_id, band, band_hash): one hash per r-slot band
    val banded = sig.select(col("doc_id"),
      posexplode(array((0 until bands).map { b =>
        xxhash64((lit(b) +: (b * r until (b + 1) * r).map(j => col(s"mh_$j"))): _*)
      }: _*)).as(Seq("band", "band_hash")))
    val cand = banded.as("x")
      .join(banded.as("y"),
        col("x.band") === col("y.band")
          && col("x.band_hash") === col("y.band_hash")
          && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"))
      .distinct()
    val sa = sig.toDF(sig.columns.map(c => if (c == "doc_id") "id_a" else s"a_$c").toIndexedSeq: _*)
    val sb = sig.toDF(sig.columns.map(c => if (c == "doc_id") "id_b" else s"b_$c").toIndexedSeq: _*)
    val agree = (0 until k).map(j =>
      when(col(s"a_mh_$j") === col(s"b_mh_$j"), 1).otherwise(0)).reduce(_ + _)
    // signature table is O(docs) — broadcast only when the size gate
    // (source-scan bytes as proxy) says it fits; at scale this is a
    // shuffled join on the doc id
    graft.AutoUnpersist.afterFirstUse(
      cand.join(broadcastIfSmall(sa, Some(docs)), "id_a")
        .join(broadcastIfSmall(sb, Some(docs)), "id_b")
        .withColumn("est_jaccard", agree.cast("double") / k)
        .filter(col("est_jaccard") >= threshold)
        .select(col("id_a"), col("id_b"), col("est_jaccard"))
        .orderBy(col("id_a"), col("id_b")),
      sig)
  }

  /** MinHash-LSH candidates + EXACT Jaccard verification — the production
    * dedup pipeline (banded signatures prune the pair space, the exact
    * row-local intersect confirms), and the oracle-checkable face of
    * minhash: with r=2 rows per band × 16 bands, a true pair at Jaccard
    * ≥ t is a candidate with probability 1-(1-t²)^16 — ≈ 1-1e-7 at
    * t=0.8, but only ≈ 0.99 at the 0.5 default, so equality with the
    * exact-Jaccard pair set is PROBABILISTIC near the threshold: the
    * salts are fixed, making the outcome deterministic per corpus (the
    * oracle-pinned key rides that determinism on the shipped corpus),
    * but a different corpus holding a just-at-threshold pair can lose
    * the ~1% banding draw and emit a strict subset. Run t ≥ ~0.7 (or
    * more bands) when set-equality with exact Jaccard is the contract.
    * Signatures are derived from the SAME shingle-hash arrays the verify
    * step uses (hash once, reuse everywhere).
    */
  def minhashVerifiedPairs(
      docs: DataFrame,
      threshold: Double = 0.5,
      k: Int = 32,
      bands: Int = 16,
      w: Int = 3
  ): DataFrame = {
    require(k % bands == 0, "bands must divide k")
    val r = k / bands
    val arrs = shingleHashArrays(docs, w).persist()
    val ds = arrs.select(col("doc_id"), explode(col("arr")).as("h0"))
    val slots = slotSalts(k).zipWithIndex.map { case (salt, j) =>
      min(xxhash64(col("h0").bitwiseXOR(lit(salt)))).as(s"mh_$j")
    }
    val sig = ds.groupBy(col("doc_id")).agg(slots.head, slots.tail: _*)
    val banded = sig.select(col("doc_id"),
      posexplode(array((0 until bands).map { b =>
        xxhash64((lit(b) +: (b * r until (b + 1) * r).map(j => col(s"mh_$j"))): _*)
      }: _*)).as(Seq("band", "band_hash")))
    val cand = banded.as("x")
      .join(banded.as("y"),
        col("x.band") === col("y.band")
          && col("x.band_hash") === col("y.band_hash")
          && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"))
      .distinct()
    graft.AutoUnpersist.afterFirstUse(
      verifyJaccard(cand, arrs, threshold, sizeProxy = Some(docs)), arrs)
  }

  /** 64-bit SimHash over whitespace tokens: per-bit majority vote of token
    * hashes. Pure Catalyst expressions: per bit b, count tokens whose
    * hash has bit b set; bit set in the result iff count*2 > n_tokens. */
  def simhash64(text: Column): Column = {
    val hashes = transform(split(text, " "), t => xxhash64(t))
    val n = size(hashes)
    val bits = (0 until 64).map { b =>
      val ones = aggregate(hashes, lit(0),
        (acc, h) => acc + shiftright(h, b).bitwiseAND(1).cast("int"))
      when(ones * 2 > n, lit(1L << b)).otherwise(lit(0L))
    }
    // null text -> null fingerprint (NOT 0L): the native kernel and the
    // aggregate table form treat null as absent, and a 0L sentinel would
    // Hamming-band against genuinely all-zero fingerprints
    when(text.isNotNull, bits.reduce(_ + _))
  }

  /** (doc_id, sh) SimHash table computed as 64 bit-sum aggregates over the
    * exploded token relation — semantically identical to
    * `simhash64(text)` per row, but a single codegen'd pass with map-side
    * combine instead of 64 interpreted HOF traversals per document (~6×
    * faster at sf0.1, and the aggregate shuffles one 65-column row per doc
    * per partition at scale). */
  def simhashTable(docs: DataFrame): DataFrame = {
    val toks = fanOut(docs)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .withColumn("h", xxhash64(col("tok")))
    val bitSums = (0 until 64).map(b =>
      sum(shiftright(col("h"), b).bitwiseAND(1)).as(s"c_$b"))
    val agg = toks.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n"), bitSums: _*)
    val sh = (0 until 64)
      .map(b => when(col(s"c_$b") * 2 > col("n"), lit(1L << b)).otherwise(lit(0L)))
      .reduce(_ + _)
    agg.select(col("doc_id"), sh.as("sh"))
  }

  /** SimHash near-dup pairs: band the 64-bit fingerprint into `bands`
    * equal-width keys; pairs matching on any band are candidates, then
    * exact Hamming distance ≤ maxHamming is verified. When
    * `maxHamming < bands`, candidate generation is EXACT by pigeonhole (a
    * matching band survives the ≤ maxHamming differing bits), so the
    * banded output EQUALS the brute-force pair set — `dedup_simhash_bounds`
    * asserts that at the driver by comparing two independent
    * decompositions. With `maxHamming ≥ bands` banding degrades to a
    * recall heuristic (still useful, no guarantee). Fingerprints come from
    * the native single-pass kernel ([[graft.plans.SimHash64]]) — a per-row
    * expression, so NOTHING shuffles before the banding join (the
    * exploded bit-sum aggregate `simhashTable` form cost one extra
    * explode+groupBy exchange). */
  def simhashPairs(docs: DataFrame, maxHamming: Int = 3, bands: Int = 4): DataFrame =
    hammingBandedPairs(
      fanOut(docs).select(col("doc_id"),
        graft.plans.SimHash64.simhash64Native(col("text")).as("sh")),
      "doc_id", "sh", maxHamming, bands)

  /** Hamming near-dup pairs over ANY (id, 64-bit fingerprint) table —
    * the banding core shared by text SimHash ([[simhashPairs]]) and
    * image perceptual hashes ([[Multimodal.phashPairs]]): split the
    * fingerprint into `bands` equal-width keys, equality-join on any
    * matching band, verify exact Hamming ≤ `maxHamming`. Exact by
    * pigeonhole when `maxHamming < bands`; a recall heuristic
    * otherwise. Only the banding join shuffles — fingerprint-sized
    * rows, never payloads. */
  def hammingBandedPairs(
      table: DataFrame, idCol: String, hashCol: String,
      maxHamming: Int, bands: Int): DataFrame = {
    require(64 % bands == 0, s"bands=$bands must divide 64")
    val bits = 64 / bands
    val mask = if (bits == 64) -1L else (1L << bits) - 1
    val banded = table.select(col(idCol), col(hashCol).as("_h"),
      posexplode(array((0 until bands).map(b =>
        shiftrightunsigned(col(hashCol), b * bits).bitwiseAND(mask)): _*))
        .as(Seq("band", "band_key")))
    val cand = banded.as("x")
      .join(banded.as("y"),
        col("x.band") === col("y.band")
          && col("x.band_key") === col("y.band_key")
          && col(s"x.$idCol") < col(s"y.$idCol"))
      .select(col(s"x.$idCol").as("id_a"), col("x._h").as("_ha"),
        col(s"y.$idCol").as("id_b"), col("y._h").as("_hb"))
      .distinct()
    cand
      .withColumn("hamming", bit_count(col("_ha").bitwiseXOR(col("_hb"))))
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
      .orderBy(col("id_a"), col("id_b"))
  }

  /** MinHash-LSH parameter planner: for every (bands, rows) factoring of
    * the `k`-permutation signature, the S-curve's false-positive and
    * false-negative mass around `threshold` — the table an operator
    * chooses `bands` FROM before a 100 TB run, because the wrong S-curve
    * either floods the verify stage (FP: candidate pairs are the
    * dominant shuffle) or silently loses duplicates (FN: no verify can
    * recover a pair banding never produced).
    *
    * Collision probability at similarity s is `1-(1-s^rows)^bands`
    * (Leskovec/Rajaraman/Ullman, Mining of Massive Datasets §3.4.3).
    * `fp` integrates that curve below `threshold`, `fn` integrates its
    * complement above, both by midpoint rule on a `gridN`-point uniform
    * similarity grid (an assumed-uniform pair-similarity density — the
    * standard planning neutral when the true density is unknown);
    * `cost = fp + fn` is the equal-loss pick, top row = recommendation.
    *
    * Pure arithmetic on a divisors×grid frame (≤ k·gridN rows) — no
    * corpus access. Per-point p rounds to 6 decimals before the sums so
    * both engines fold identical values (pow is the only transcendental;
    * the established exp/round-6 convention). */
  def lshTune(
      spark: org.apache.spark.sql.SparkSession,
      k: Int = 32,
      threshold: Double = 0.5,
      gridN: Int = 40): DataFrame = {
    require(k > 0 && gridN > 0, s"k=$k and gridN=$gridN must be positive")
    require(threshold > 0 && threshold < 1, s"threshold must be in (0,1)")
    spark.range(1, k + 1L)
      .filter(lit(k) % col("id") === 0)
      .select(col("id").cast("int").as("bands"),
        (lit(k) / col("id")).cast("int").as("rows_per_band"))
      .select(col("bands"), col("rows_per_band"),
        explode(sequence(lit(0), lit(gridN - 1))).as("i"))
      .withColumn("s", (col("i") + lit(0.5)) / gridN)
      .withColumn("p",
        round(lit(1.0) - pow(lit(1.0) - pow(col("s"), col("rows_per_band")),
          col("bands")), 6))
      .groupBy(col("bands"), col("rows_per_band"))
      .agg(
        round(sum(when(col("s") < threshold, col("p")).otherwise(lit(0.0)))
          / gridN, 6).as("fp"),
        round(sum(when(col("s") >= threshold, lit(1.0) - col("p"))
          .otherwise(lit(0.0))) / gridN, 6).as("fn"))
      .withColumn("cost", round(col("fp") + col("fn"), 6))
      .orderBy(col("cost"), col("bands"))
  }
}
