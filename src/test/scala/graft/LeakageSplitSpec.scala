package graft

import org.apache.spark.sql.functions._
import graft.functions.{Clusters, NearDup, Sampling}

/** Leakage-safe split ([[graft.functions.Sampling.leakageSafeSplit]]):
  * the structural invariant is that split is a pure function of the
  * cluster id — so whole near-dup clusters move atomically and no pair
  * can span splits. Value parity vs DuckDB is `split_leakage_safe`. */
class LeakageSplitSpec extends SparkSpec {
  import spark.implicits._

  test("every cluster lands wholly in one split; singletons match trainTestSplit") {
    val labels = Seq(
      (0L, 0L), (1L, 0L), (7L, 0L),      // one 3-doc cluster
      (2L, 2L), (9L, 2L),                // one 2-doc cluster
      (3L, 3L), (4L, 4L), (5L, 5L)       // singletons
    ).toDF("doc_id", "cluster_id")
    val got = Sampling.leakageSafeSplit(labels, "cluster_id")
      .as[(Long, Long, String)].collect().toSeq
    val byCluster = got.groupBy(_._2).view.mapValues(_.map(_._3).toSet)
    byCluster.foreach { case (c, splits) =>
      assert(splits.size == 1, s"cluster $c spans splits: $splits")
    }
    // a singleton (label = own id) is exactly trainTestSplit on the id
    val single = Sampling.trainTestSplit(
        Seq(3L, 4L, 5L).toDF("doc_id"), col("doc_id").cast("string"))
      .as[(Long, String)].collect().toMap
    got.filter(r => Seq(3L, 4L, 5L).contains(r._1)).foreach { r =>
      assert(r._3 == single(r._1), s"singleton ${r._1} diverged")
    }
  }

  test("no near-dup pair spans splits on the real corpus pipeline") {
    val docs = Tables.documents(spark, sf0001)
    val pairs = NearDup.ngramJaccardPairsShared(docs, threshold = 0.5)
    val labels = Clusters.connectedComponentsShared(
      docs.select(col("doc_id")), pairs,
      nodeCol = "doc_id", srcCol = "id_a", dstCol = "id_b")
    val split = Sampling.leakageSafeSplit(labels, "cluster_id")
      .select(col("doc_id"), col("split"))
    val spanning = pairs
      .join(split.withColumnRenamed("doc_id", "id_a")
        .withColumnRenamed("split", "_sa"), Seq("id_a"))
      .join(split.withColumnRenamed("doc_id", "id_b")
        .withColumnRenamed("split", "_sb"), Seq("id_b"))
      .filter(col("_sa") =!= col("_sb"))
    assert(spanning.count() == 0L, "a near-dup pair spans train/test")
    assert(pairs.count() > 0L, "fixture must actually contain near-dup pairs")
  }

  test("split assignment is the documented md5-of-cluster rule") {
    val labels = spark.range(200).select(col("id").as("doc_id"),
      (col("id") / 2).cast("long").as("cluster_id"))
    val got = Sampling.leakageSafeSplit(labels, "cluster_id", testBytes = 26)
    val bad = got.filter(
      (substring(md5(col("cluster_id").cast("string")), 1, 2) < "1a") =!=
        (col("split") === "test"))
    assert(bad.count() == 0L)
    // both sides populated at this size, and test is the minority
    val counts = got.groupBy(col("split")).count()
      .as[(String, Long)].collect().toMap
    assert(counts.getOrElse("test", 0L) > 0L && counts("train") > 0L)
    assert(counts("test") < counts("train"))
  }
}
