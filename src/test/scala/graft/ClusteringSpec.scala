package graft

import org.apache.spark.sql.functions._
import graft.functions.Clustering

/** Deterministic Lloyd's k-means ([[graft.functions.Clustering
  * .kmeansAssign]]) — convergence, tie-breaking, the empty-cluster
  * branch, and layout invariance. Oracle parity at sf is `embed_kmeans`
  * in CORRECTNESS. */
class ClusteringSpec extends SparkSpec {
  import spark.implicits._

  test("well-separated clusters converge to the obvious assignment") {
    // ids 1,3 near the origin; 2,4 near (10,10) — init seeds clusters
    // from ids 1 and 2, so each group already holds one seed
    val df = Seq(
      (1L, Seq(0f, 0f)), (2L, Seq(10f, 10f)),
      (3L, Seq(0f, 1f)), (4L, Seq(10f, 9f))
    ).toDF("vec_id", "embedding")
    val got = Clustering.kmeansAssign(df, "vec_id", "embedding", k = 2, iters = 2)
      .select("vec_id", "cluster").as[(Long, Int)].collect().toSeq
    assert(got === Seq((1L, 0), (2L, 1), (3L, 0), (4L, 1)))
  }

  test("identical seeds: ties go to the smaller cluster, empty cluster keeps its centroid") {
    // seeds (ids 1,2) are IDENTICAL vectors → iteration 1 assigns every
    // point to cluster 0 (tie-break), cluster 1 goes empty and must keep
    // centroid (0,0); iteration 2 then reclaims the origin points for it
    val df = Seq(
      (1L, Seq(0f, 0f)), (2L, Seq(0f, 0f)), (3L, Seq(1f, 0f))
    ).toDF("vec_id", "embedding")
    val got = Clustering.kmeansAssign(df, "vec_id", "embedding", k = 2, iters = 2)
      .select("vec_id", "cluster").as[(Long, Int)].collect().toSeq
    // after iter2: c0 = mean({3}) = (1,0), c1 = mean({1,2}) = (0,0)
    assert(got === Seq((1L, 1), (2L, 1), (3L, 0)))
  }

  test("iters = 0 assigns against the raw seeds") {
    val df = Seq(
      (1L, Seq(0f, 0f)), (2L, Seq(4f, 0f)), (3L, Seq(3f, 0f))
    ).toDF("vec_id", "embedding")
    val got = Clustering.kmeansAssign(df, "vec_id", "embedding", k = 2, iters = 0)
      .select("vec_id", "cluster", "dist")
      .as[(Long, Int, Double)].collect().toSeq
    assert(got === Seq((1L, 0, 0.0), (2L, 1, 0.0), (3L, 1, 1.0)))
  }

  test("assignments are partition-invariant (fixed-point sums)") {
    val df = (1L to 60L).map(i =>
      (i, Seq((i % 7).toFloat * 0.37f, (i % 11).toFloat * 0.13f,
        (i % 5).toFloat * 0.71f)))
      .toDF("vec_id", "embedding")
    val a = Clustering.kmeansAssign(df.repartition(1), "vec_id", "embedding", 4, 3)
      .collect().map(_.toSeq)
    val b = Clustering.kmeansAssign(df.repartition(13), "vec_id", "embedding", 4, 3)
      .collect().map(_.toSeq)
    assert(a.toSeq === b.toSeq)
  }

  test("fewer rows than k fails loudly") {
    val df = Seq((1L, Seq(0f, 0f))).toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      Clustering.kmeansAssign(df, "vec_id", "embedding", k = 3, iters = 1)
    }
    assert(e.getMessage.contains("need at least"))
  }
}
