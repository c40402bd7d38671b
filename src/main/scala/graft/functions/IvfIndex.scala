package graft.functions

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Persisted IVF index — the production shape of [[Ivf]]: build ONCE
  * (train a coarse quantizer on a sample, assign every corpus vector to
  * its cell, write the assignment `PARTITIONED BY (cell)`), then serve
  * many query batches against the on-disk layout.
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
  * The query batch is broadcast-small by contract (same contract as
  * [[Similarity.bruteForceTopK]]); its probed-cell set is collected
  * driver-side — O(queries·nProbe) ints — and pushed as a literal IN
  * filter so pruning is STATIC (no runtime DPP machinery needed).
  */
final class IvfIndex private (
    spark: SparkSession,
    path: String,
    val centroids: Array[Array[Double]]) {

  def nCells: Int = centroids.length

  /** Cell-assigned corpus, read from the partitioned layout:
    * (id BIGINT, v ARRAY<DOUBLE>, cell INT partition column). */
  def cells: DataFrame = spark.read.parquet(s"$path/cells")

  /** Top-k cosine neighbors of each query against the probed cells only.
    * `nProbe = nCells` probes everything → exact brute-force top-k (each
    * corpus vector lives in exactly one cell), which is what makes the
    * index path oracle-checkable end-to-end. */
  def topK(queries: DataFrame, idCol: String, vecCol: String, k: Int,
      nProbe: Int): DataFrame = {
    val q = queries.select(
      col(idCol).as("qid"), Similarity.asDouble(col(vecCol)).as("qv"))
      .withColumn("cell", explode(Ivf.probeCellsCol(col("qv"), centroids, nProbe)))
    // Driver-side probed-cell set (tiny): static partition pruning.
    val probed = q.select(col("cell")).distinct().collect()
      .map(_.getInt(0)).toSeq
    val sims = cells.filter(col("cell").isin(probed: _*))
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
}

object IvfIndex {

  /** Train on a sample, assign, and persist the index at `path`
    * (`path/cells` partitioned by cell, `path/centroids` the quantizer). */
  def build(corpus: DataFrame, idCol: String, vecCol: String, nCells: Int,
      path: String, seed: Long = 42L): IvfIndex = {
    val spark = corpus.sparkSession
    val centroids = Ivf.trainCentroids(corpus, vecCol, nCells, seed)
    NearDup.fanOut(corpus)
      .select(col(idCol).as("id"), Similarity.asDouble(col(vecCol)).as("v"))
      .withColumn("cell", Ivf.assignCellCol(col("v"), centroids))
      .write.mode("overwrite").partitionBy("cell").parquet(s"$path/cells")
    val cRows = centroids.zipWithIndex.map { case (c, i) => Row(i, c.toSeq) }
    spark.createDataFrame(
      spark.sparkContext.parallelize(cRows.toIndexedSeq, 1),
      StructType(Seq(StructField("cell", IntegerType),
        StructField("centroid", ArrayType(DoubleType)))))
      .write.mode("overwrite").parquet(s"$path/centroids")
    new IvfIndex(spark, path, centroids)
  }

  /** Load a previously-built index: centroids are O(nCells·dim) — a
    * driver-side literal matrix, like the LSH planes. */
  def load(spark: SparkSession, path: String): IvfIndex = {
    val centroids = spark.read.parquet(s"$path/centroids")
      .collect().sortBy(_.getInt(0))
      .map(_.getSeq[Double](1).toArray)
    new IvfIndex(spark, path, centroids)
  }

  /** Per-JVM built-index cache for the registered queries: one build per
    * (corpus identity, nCells), every later call loads the persisted
    * layout — the serve-many-probes production shape. */
  private val indexCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int), IvfIndex]()

  private[graft] def cachedFor(corpus: DataFrame, idCol: String,
      vecCol: String, nCells: Int): IvfIndex = {
    val key = (corpus.queryExecution.analyzed.semanticHash(), nCells)
    indexCache.computeIfAbsent(key, _ => {
      val dir = java.nio.file.Files
        .createTempDirectory(s"graft_ivf_${key._1}_$nCells").toString
      build(corpus, idCol, vecCol, nCells, dir)
    })
  }
}
