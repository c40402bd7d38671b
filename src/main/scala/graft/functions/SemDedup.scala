package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SemDedup — semantic deduplication by clustered pairwise comparison
  * (Abbas et al. 2023, arXiv:2303.09540): quantize the embedding space
  * with a coarse k-means (the same seeded quantizer as [[Ivf]] — trained
  * once per corpus, cached), then compare pairs ONLY within a cell.
  *
  * This is the third point on the embedding-dedup cost/recall curve the
  * engine offers, complementing [[Similarity.embeddingNearDups]] (sign-LSH
  * buckets, multi-table OR-amplification):
  *
  *   - brute force: n²/2 comparisons, exact;
  *   - sign-LSH:    Σ bucket² per table — recall from OR-amplification,
  *                  robust for "find pairs above t" at any similarity;
  *   - SemDedup:    Σ cell² ≈ n²/nCells for balanced cells — ONE data-aware
  *                  partition instead of nTables oblivious ones, so each
  *                  vector is compared once, not nTables times. Misses only
  *                  above-threshold pairs that straddle a k-means boundary,
  *                  which at the near-duplicate thresholds the method is
  *                  published for (≥0.95) is rare: near-identical vectors
  *                  share an argmin centroid unless they sit exactly on a
  *                  boundary (and exact copies share it ALWAYS — the
  *                  assignment is a pure function of the vector).
  *
  * Scale shape (100 TB): centroids are O(nCells·dim) driver-side literals;
  * cell assignment is a per-row native expression ([[Ivf.assignCellCol]]);
  * the pair generation is an equi-join on the cell id, so the only shuffle
  * keys are cell ids and the per-task working set is one cell's rows. Size
  * `nCells` ∝ corpus size to hold the per-cell population (and so per-task
  * memory) constant — the same knob documented at
  * [[Similarity.autoPlanes]].
  */
object SemDedup {

  /** Above-`threshold` cosine pairs (id_a < id_b, sim rounded to 6dp)
    * found within a shared k-means cell. Output is sorted (id_a, id_b) —
    * the oracle-parity convention. */
  def semanticDupPairs(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double,
      nCells: Int = 16,
      seed: Long = 42L
  ): DataFrame = {
    // an empty corpus can't train a quantizer — short-circuit to the
    // empty pair set (one limit-1 probe job at BUILD time, never per row;
    // the reference's groupby.d:33 empty-input convention)
    if (df.isEmpty) {
      val spark = df.sparkSession
      import org.apache.spark.sql.types._
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(Seq(
          StructField("id_a", df.schema(idCol).dataType),
          StructField("id_b", df.schema(idCol).dataType),
          StructField("sim", DoubleType))))
    }
    val centroids = Ivf.centroidsFor(df, vecCol, nCells, seed)
    val base = NearDup.fanOut(df).select(
      col(idCol), Similarity.asDouble(col(vecCol)).as("_v"))
      .withColumn("_cell", Ivf.assignCellCol(col("_v"), centroids))
    val a = base.select(col(idCol).as("id_a"), col("_v").as("_va"), col("_cell"))
    val b = base.select(col(idCol).as("id_b"), col("_v").as("_vb"), col("_cell"))
    a.join(b, Seq("_cell"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        Similarity.cosine(col("_va"), col("_vb")).as("_sim"))
      .filter(col("_sim") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("_sim"), 6).as("sim"))
      .orderBy(col("id_a"), col("id_b"))
  }

  /** Keep-one-per-duplicate dedup: a row survives iff it has no
    * above-threshold neighbor with a SMALLER id in its cell (the
    * canonical-survivor rule — deterministic, engine-independent). Chains
    * collapse to their cell-local minima; for full transitive-closure
    * semantics feed [[semanticDupPairs]] into
    * [[Clusters.connectedComponents]] (the `dedup_collapse` path). */
  def semanticSurvivors(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double,
      nCells: Int = 16,
      seed: Long = 42L
  ): DataFrame = {
    val dupIds = semanticDupPairs(df, idCol, vecCol, threshold, nCells, seed)
      .select(col("id_b").as(idCol)).distinct()
    df.join(dupIds, Seq(idCol), "left_anti")
  }
}
