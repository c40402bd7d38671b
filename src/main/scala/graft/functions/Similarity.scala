package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Similarity search over embedding columns (`ARRAY<FLOAT>`) — EXT tier.
  *
  * All vector math is built from Spark's higher-order functions
  * (`zip_with` / `aggregate` / `transform`) over double-cast elements:
  * codegen'd, no UDFs, and — because `aggregate` is a *sequential* fold in
  * element order — bit-deterministic regardless of partitioning (the same
  * fold any other engine runs, which is what makes the DuckDB oracle
  * matchable).
  *
  * Scale design: the brute-force path broadcasts the (small) query set and
  * streams the corpus — per-partition top-k via window, no global
  * materialization of the similarity matrix. The LSH path buckets by
  * random-hyperplane signs so candidate generation is a hash join on the
  * bucket key: at 100 TB you run LSH for candidates and re-rank exactly,
  * never the O(n·q) cross product.
  */
object Similarity {

  /** Element-wise double view of a float vector. */
  def asDouble(v: Column): Column = transform(v, _.cast(DoubleType))

  /** Sequential-fold dot product. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  def l2norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0), (acc, x) => acc + x * x))

  /** Cosine via built-in HOFs — the reference composition; kept as the
    * cross-check for the native expression (bit-identical by construction,
    * asserted in SimilarityNativeSpec). */
  def cosineHof(a: Column, b: Column): Column = dot(a, b) / (l2norm(a) * l2norm(b))

  /** Cosine similarity — the native codegen'd kernel
    * ([[graft.plans.CosineSimilarity]]): one fused loop instead of three
    * interpreted HOF traversals per pair. */
  def cosine(a: Column, b: Column): Column =
    graft.plans.CosineSimilarity.cosineNative(a, b)

  /** Exact top-k cosine neighbors of each query vector against the corpus.
    *
    * @param corpus  (idCol, vecCol) table
    * @param queries (idCol, vecCol) table — must be broadcast-small; at
    *                scale this is the per-batch probe set
    */
  def bruteForceTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int
  ): DataFrame = {
    val q = queries.select(
      col(idCol).as("qid"), asDouble(col(vecCol)).as("qv"))
    val c = NearDup.fanOut(corpus).select(
      col(idCol).as("nid"), asDouble(col(vecCol)).as("nv"))
    val sims = c
      .join(broadcast(q), col("qid") =!= col("nid")) // self-pairs excluded
      .select(col("qid"), col("nid"),
        cosine(col("qv"), col("nv")).as("sim"))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("nid"))
    sims
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= k)
      .select(col("qid"), col("nid"), round(col("sim"), 6).as("sim"))
      .orderBy(col("qid"), col("nid"))
  }

  /** Per-JVM cache of derived embedding dims, keyed by the corpus plan's
    * canonicalized hash — the single-row probe job runs once per corpus. */
  private val dimCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, String), Integer]()

  /** Embedding dimension for plane generation: the explicit value when
    * given (>0), else read from the first corpus vector — one single-row
    * job per corpus (cached), the price of not silently hashing against
    * wrong-width planes (the native kernel hard-errors on a plane/vector
    * width mismatch). */
  private def resolveDim(corpus: DataFrame, vecCol: String, dim: Int): Int =
    if (dim > 0) dim
    else dimCache.computeIfAbsent(
      (corpus.queryExecution.analyzed.semanticHash(), vecCol),
      _ => corpus.select(size(col(vecCol)).as("d")).limit(1).collect()
        .headOption.map(r => Integer.valueOf(r.getInt(0)))
        .getOrElse(Integer.valueOf(1))) // empty corpus: any dim, empty output

  /** Deterministic random hyperplanes for sign-LSH (seeded, generated on
    * the driver once — tiny, broadcast as literals). */
  def hyperplanes(nPlanes: Int, dim: Int, seed: Long = 42L): Seq[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(nPlanes)(Array.fill(dim)(rnd.nextGaussian()))
  }

  /** Sign-LSH bucket key: bit-packed signs of `nPlanes` hyperplane dot
    * products. Vectors in the same bucket are ANN candidates. */
  def lshBucket(vec: Column, planes: Seq[Array[Double]]): Column = {
    val bits = planes.zipWithIndex.map { case (p, i) =>
      val pl = array(p.map(lit).toIndexedSeq: _*)
      when(dot(asDouble(vec), pl) >= 0, lit(1L << i)).otherwise(lit(0L))
    }
    bits.reduce(_ + _) // bitwise-or of disjoint bits == sum
  }

  /** Multi-table sign-LSH bucket tags: one (table, bucket) pair per hash
    * table — OR-amplification: a true neighbor is a candidate if it shares
    * a bucket in ANY table, recall ≈ 1-(1-p^b)^L for per-plane agreement p.
    * Native fused kernel ([[graft.plans.SignLshBuckets]]); the HOF
    * composition ([[lshBucket]] per table) is the tested reference. */
  private[graft] def lshTags(vec: Column, tables: Seq[Seq[Array[Double]]]): Column =
    graft.plans.SignLshBuckets.lshBucketsNative(asDouble(vec), tables)

  /** HOF reference form of [[lshTags]] (equivalence asserted in tests). */
  private[graft] def lshTagsHof(vec: Column, tables: Seq[Seq[Array[Double]]]): Column =
    array(tables.map(t => lshBucket(vec, t)): _*)

  /** ANN top-k: candidates = corpus vectors sharing an LSH bucket with the
    * query in any of `nTables` tables (hash join on (table, bucket)), then
    * exact cosine re-rank of the candidate set only. The plan at scale:
    * explode ×L, hash join, distinct pairs, one broadcast re-rank — cost
    * L·n + Σ bucket·q instead of n·q. `nPlanes` (bits per table) sets
    * bucket granularity; `nTables` buys recall.
    */
  def lshTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      nPlanes: Int = 4,
      nTables: Int = 8,
      dim: Int = -1
  ): DataFrame = {
    val d = resolveDim(corpus, vecCol, dim)
    val tables = (0 until nTables).map(t =>
      hyperplanes(nPlanes, d, seed = 42L + t))
    def tagged(df: DataFrame, id: String): DataFrame =
      NearDup.fanOut(df).select(col(idCol).as(id),
        posexplode(lshTags(col(vecCol), tables)).as(Seq("table", "bucket")))
    val cand = tagged(corpus, "nid")
      .join(broadcast(tagged(queries, "qid")), Seq("table", "bucket"))
      .filter(col("qid") =!= col("nid"))
      .select("qid", "nid").distinct()
    val q = queries.select(col(idCol).as("qid"), asDouble(col(vecCol)).as("qv"))
    val c = corpus.select(col(idCol).as("nid"), asDouble(col(vecCol)).as("nv"))
    val sims = cand.join(broadcast(q), "qid").join(c, "nid")
      .select(col("qid"), col("nid"), cosine(col("qv"), col("nv")).as("sim"))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("nid"))
    sims.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= k)
      .select(col("qid"), col("nid"), round(col("sim"), 6).as("sim"))
      .orderBy(col("qid"), col("nid"))
  }

  /** Embedding-cosine near-duplicate pairs: LSH-bucketed candidate
    * generation, exact cosine verify, `sim >= threshold`. Output each pair
    * once (id_a < id_b). */
  def embeddingNearDups(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double,
      nPlanes: Int = 4,
      nTables: Int = 8,
      dim: Int = -1
  ): DataFrame = {
    val tables = (0 until nTables).map(t =>
      hyperplanes(nPlanes, resolveDim(corpus, vecCol, dim), seed = 42L + t))
    val tagged = NearDup.fanOut(corpus).select(col(idCol).as("id"),
      posexplode(lshTags(col(vecCol), tables)).as(Seq("table", "bucket")))
    val cand = tagged.as("a")
      .join(tagged.as("b"),
        col("a.table") === col("b.table") && col("a.bucket") === col("b.bucket")
          && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b")).distinct()
    val v = corpus.select(col(idCol).as("id"), asDouble(col(vecCol)).as("v"))
    cand
      .join(v.withColumnRenamed("id", "id_a").withColumnRenamed("v", "va"), "id_a")
      .join(v.withColumnRenamed("id", "id_b").withColumnRenamed("v", "vb"), "id_b")
      .select(col("id_a"), col("id_b"), cosine(col("va"), col("vb")).as("sim"))
      .filter(col("sim") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("sim"), 6).as("sim"))
      .orderBy(col("id_a"), col("id_b"))
  }
}
