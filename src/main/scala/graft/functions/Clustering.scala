package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Distributed Lloyd's k-means over an embedding column — the clustering
  * face of the embedding tier. [[Ivf]]/[[SemDedup]] use a SAMPLED mllib
  * quantizer (coarse space partitioning, seeded but engine-private); this
  * is the full-corpus training loop as a first-class, ORACLE-CHECKABLE
  * operator: corpus curation uses it directly (topic bucketing for
  * mixture weights, cluster-balanced sampling, SemDedup cell refinement),
  * not just as an index implementation detail.
  *
  * Bit-reproducibility — every step is exactly mirrorable in another
  * engine, so assignments hash-match, not just "cluster similarly":
  *
  *   - init: the k vectors with the SMALLEST ids, cluster j = rank in id
  *     order (no RNG — a seeded sample would be engine-private state);
  *   - distance: squared L2 as a SEQUENTIAL left fold
  *     (`aggregate(zip_with(...))` ≡ DuckDB `list_reduce`) — one fixed
  *     parenthesization, so the IEEE double result is bit-identical;
  *     ties broken by smallest cluster id;
  *   - mean update: [[graft.plans.VectorSumFixed]] over pre-scaled
  *     integers (floor(x·1e7) longs) — exact, reduction-order-invariant
  *     sums; the new centroid component is
  *     `sx.toDouble / n.toDouble / 1e7` (two divides, fixed order);
  *   - empty cluster: keeps its previous centroid (deterministic, no
  *     re-seeding).
  *
  * Scale shape (100 TB): the scaled-vector table is persisted once and
  * each iteration is ONE pass over it — per-row argmin against k·dim
  * centroid LITERALS (driver-held, like [[Ivf]] centroids), then a
  * k-group aggregate whose shuffle state is k·dim longs per partition
  * (map-side combined, row-count independent — the [[graft.plans
  * .VectorSumFixed]] contract). Driver state is the k·dim centroid
  * matrix; nothing row-scale ever reaches the driver. This is the same
  * job shape mllib's Lloyd uses, minus its RNG.
  *
  * Reference scope: clustering is EXT-tier (the reference engine,
  * dataframe.d, has no embedding ops); published algorithm (Lloyd 1982).
  */
object Clustering {

  private val Scale = 1e7

  private def scaledExpr(vecCol: String): Column =
    expr(s"transform($vecCol, x -> CAST(floor(CAST(x AS DOUBLE) * 10000000.0D) AS BIGINT))")

  /** Squared L2 distance to a centroid literal as a sequential fold. */
  private def distTo(v: Column, c: Array[Double]): Column = {
    val cl = array(c.toIndexedSeq.map(lit): _*)
    aggregate(zip_with(v, cl, (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, d) => acc + d)
  }

  /** argmin cluster + its distance: struct(dist, cluster) sorted by
    * (dist asc, cluster asc), first element. */
  private def nearest(v: Column, cents: Array[Array[Double]]): Column = {
    val scored = array(cents.zipWithIndex.toIndexedSeq.map { case (c, j) =>
      struct(distTo(v, c).as("dist"), lit(j).as("cluster"))
    }: _*)
    element_at(array_sort(scored, (l, r) =>
      when(l.getField("dist") < r.getField("dist"), lit(-1))
        .when(l.getField("dist") > r.getField("dist"), lit(1))
        .otherwise((l.getField("cluster") - r.getField("cluster")).cast("int"))), 1)
  }

  /** Cluster assignments after `iters` Lloyd iterations.
    *
    * @return (idCol, cluster, dist) — dist is the squared L2 to the FINAL
    *         centroid, rounded to 6dp; ordered by id.
    */
  def kmeansAssign(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      iters: Int
  ): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(iters >= 0, s"iters must be non-negative, got $iters")
    // scaled longs ride along so each iteration's mean update needs no
    // second pass; persisted once, every iteration reads the cache
    val v = df.select(col(idCol).as("_id"),
        Similarity.asDouble(col(vecCol)).as("_v"),
        scaledExpr(vecCol).as("_sv"))
      .persist()

    // init: the k smallest ids, cluster = rank in id order (k·dim driver
    // metadata — the Ivf centroid convention)
    var cents: Array[Array[Double]] = v.orderBy(col("_id")).limit(k)
      .select(col("_v")).collect()
      .map(_.getSeq[Double](0).toArray)
    require(cents.length == k,
      s"need at least $k rows to seed $k clusters, got ${cents.length}")
    val dim = cents.head.length

    for (_ <- 0 until iters) {
      // one pass: assign to nearest centroid, exact fixed-point sums per
      // cluster; k rows of (n, dim longs) come back to the driver
      val sums = v
        .select(nearest(col("_v"), cents).getField("cluster").as("_c"),
          col("_sv"))
        .groupBy(col("_c"))
        .agg(count(lit(1)).as("_n"),
          graft.plans.VectorSumFixed.vectorSum(col("_sv"), dim).as("_s"))
        .collect()
        .map(r => r.getInt(0) ->
          (r.getLong(1), r.getSeq[Long](2).toArray))
        .toMap
      cents = cents.zipWithIndex.map { case (old, j) =>
        sums.get(j) match {
          case Some((n, sx)) => sx.map(s => s.toDouble / n.toDouble / Scale)
          case None => old // empty cluster keeps its centroid
        }
      }
    }

    val fin = nearest(col("_v"), cents)
    val result = v
      .select(col("_id").as(idCol),
        fin.getField("cluster").as("cluster"),
        round(fin.getField("dist"), 6).as("dist"))
      .orderBy(col(idCol))
    graft.AutoUnpersist.afterFirstUse(result, v)
  }

  /** Per-group embedding outliers: the `topK` vectors FARTHEST from
    * their group's mean embedding — the anomaly sweep run before
    * trusting a labeled embedding batch (mislabeled / corrupted vectors
    * sit far from their class centroid).
    *
    * EXACT integer ranking, no float accumulation: coordinates are
    * fixed-point scaled (×10^7, the [[graft.plans.VectorSumFixed]]
    * contract), and instead of dividing the centroid sum by n (an
    * inexact step both engines would have to round identically), the
    * squared distance is computed in the n-scaled space —
    * `d = Σ_j (x_j·n − sx_j)²` as DECIMAL(38,0), which ranks exactly
    * like the true distance (positive scale factor n²) and is
    * bit-identical across engines and partitionings. Overflow headroom:
    * |x·n − sx| ≤ 2n·10^8, so d ≤ dim·4n²·10^16 — safe in 38 digits to
    * n ≈ 10^9 rows per group; beyond that re-scale.
    *
    * Plan: one group aggregate (custom exact vector-sum), a
    * group-cardinality join back, a per-group top-k window. The emitted
    * `dist_scaled` is the exact integer cast to double (deterministic
    * nearest-rounding in both engines). */
  def centroidOutliers(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      groupCol: String,
      dim: Int,
      topK: Int
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(topK >= 1, s"topK must be >= 1, got $topK")
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val sv = transform(col(vecCol),
      x => floor(x.cast(DoubleType) * 10000000.0d).cast("long"))
    val cent = emb
      .select(col(groupCol), sv.as("_sv"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("_n"),
        graft.plans.VectorSumFixed.vectorSum(col("_sv"), dim).as("_sx"))
    val diffs = zip_with(sv, col("_sx"), (x, s) => x * col("_n") - s)
    val d = aggregate(diffs, lit(0).cast(dec),
      (acc, v) => acc + v.cast(dec) * v.cast(dec))
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col("_d").desc, col(idCol))
    emb.join(cent, groupCol)
      .withColumn("_d", d)
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= topK)
      .select(col(groupCol), col(idCol), col("_rn").as("rank"),
        col("_d").cast(DoubleType).as("dist_scaled"))
  }
}
