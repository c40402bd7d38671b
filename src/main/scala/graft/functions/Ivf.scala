package graft.functions

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** IVF (inverted-file) approximate nearest neighbor — the k-means
  * counterpart to sign-LSH bucketing (EXT tier; the "IVF or LSH-bucketed
  * variant" scale path). Train a coarse quantizer (k-means, mllib,
  * seeded → deterministic), assign every corpus vector to its nearest
  * centroid cell, probe each query's `nProbe` closest cells, and re-rank
  * exactly (native cosine kernel) within the probed cells only.
  *
  * Scale shape: training samples the corpus (mllib handles it), centroids
  * are O(nCells·dim) driver-side literals (like the LSH planes), cell
  * assignment is a per-row expression, candidate generation is a hash join
  * on the cell id — cost n/nCells·nProbe per query instead of n. The
  * centroid argmax uses the identity argmax(v·c − |c|²/2) =
  * argmin |v−c|², so assignment needs only dot products against literal
  * arrays.
  */
object Ivf {

  /** struct(cell, score) array for a vector against all centroid literals. */
  private def cellScores(v: Column, centroids: Array[Array[Double]]): Column =
    array(centroids.zipWithIndex.map { case (c, i) =>
      val cl = array(c.map(lit).toIndexedSeq: _*)
      struct(
        (Similarity.dot(v, cl) - lit(c.map(x => x * x).sum / 2)).as("score"),
        lit(i).as("cell"))
    }: _*)

  /** Top-`nProbe` cells by score, descending, ties by cell id. Relies on
    * struct ordering: (score desc, cell) via negated score sort. */
  private def probeCells(v: Column, centroids: Array[Array[Double]], nProbe: Int): Column = {
    val scored = cellScores(v, centroids)
    val sorted = array_sort(scored, (l, r) =>
      when(l.getField("score") > r.getField("score"), -1)
        .when(l.getField("score") < r.getField("score"), 1)
        .otherwise((l.getField("cell") - r.getField("cell")).cast("int")))
    transform(slice(sorted, 1, nProbe), s => s.getField("cell"))
  }

  /** Train the coarse quantizer; returns the centroid matrix. Few
    * iterations — a COARSE quantizer only partitions space, it doesn't
    * need converged clusters. In a production pipeline the quantizer is
    * trained once (on a sample) and reused across every query batch; the
    * per-call training here is a self-contained-query artifact. */
  def trainCentroids(
      corpus: DataFrame, vecCol: String, nCells: Int, seed: Long = 42L
  ): Array[Array[Double]] = {
    val feats = corpus.select(
      array_to_vector(Similarity.asDouble(col(vecCol))).as("features"))
    new KMeans().setK(nCells).setSeed(seed).setMaxIter(5)
      .setFeaturesCol("features")
      .fit(feats).clusterCenters.map(_.toArray)
  }

  /** IVF top-k: probe the query's nearest `nProbe` cells, exact cosine
    * re-rank within them. */
  def ivfTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      nCells: Int = 16,
      nProbe: Int = 4
  ): DataFrame = {
    val centroids = trainCentroids(corpus, vecCol, nCells)
    val c = NearDup.fanOut(corpus).select(
      col(idCol).as("nid"), Similarity.asDouble(col(vecCol)).as("nv"))
      .withColumn("cell",
        element_at(probeCells(col("nv"), centroids, 1), 1))
    val q = queries.select(
      col(idCol).as("qid"), Similarity.asDouble(col(vecCol)).as("qv"))
      .withColumn("cell", explode(probeCells(col("qv"), centroids, nProbe)))
    val sims = c.join(broadcast(q), "cell")
      .filter(col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"),
        Similarity.cosine(col("qv"), col("nv")).as("sim"))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("nid"))
    sims.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= k)
      .select(col("qid"), col("nid"), round(col("sim"), 6).as("sim"))
      .orderBy(col("qid"), col("nid"))
  }
}
