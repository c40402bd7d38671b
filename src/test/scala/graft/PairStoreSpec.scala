package graft

import org.apache.spark.sql.functions._
import graft.functions.{Clusters, Fuzzy, NearDup, PairStore}

/** Durable pair/cluster store ([[graft.functions.PairStore]]): the
  * persisted pairs and labels must equal a live recompute exactly (the
  * build-once-serve-many contract), singletons must label themselves,
  * and a rebuild must overwrite cleanly. Oracle parity at sf is the
  * `dedup_*_store` / `entity_resolve_store` family in CORRECTNESS. */
class PairStoreSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(): String =
    java.nio.file.Files.createTempDirectory("graft_pairstore_spec").toString

  // Two 3-gram near-dup clusters ({1,2}, {3,4}) + singletons 5, 6.
  private def docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy cat"),
    (3L, "spark catalyst optimizer rewrites logical plans fast"),
    (4L, "spark catalyst optimizer rewrites logical plans slow"),
    (5L, "completely unrelated content lives here alone"),
    (6L, "short")).toDF("doc_id", "text")

  test("stored pairs and labels equal the live recompute") {
    val dir = tmpDir()
    val livePairs = NearDup.ngramJaccardPairs(docs, threshold = 0.5)
    PairStore.build(docs.select(col("doc_id")), livePairs, dir,
      "doc_id", "id_a", "id_b")

    val storedPairs = PairStore.pairs(spark, dir)
      .as[(Long, Long, Double)].collect().toSet
    assert(storedPairs == livePairs.as[(Long, Long, Double)].collect().toSet)
    assert(storedPairs.map(p => (p._1, p._2)) == Set((1L, 2L), (3L, 4L)))

    val storedLabels = PairStore.labels(spark, dir)
      .as[(Long, Long)].collect().toMap
    val liveLabels = Clusters.connectedComponents(
        docs.select(col("doc_id")), livePairs, "doc_id", "id_a", "id_b")
      .as[(Long, Long)].collect().toMap
    assert(storedLabels == liveLabels)
    // every node present, singletons label themselves
    assert(storedLabels == Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 3L,
      5L -> 5L, 6L -> 6L))
  }

  test("rebuild overwrites; label files are node-sorted and 2-column") {
    val dir = tmpDir()
    val pairs = NearDup.ngramJaccardPairs(docs, threshold = 0.5)
    PairStore.build(docs.select(col("doc_id")), pairs, dir,
      "doc_id", "id_a", "id_b")
    // second build on a SHRUNK corpus must fully replace the first
    val less = docs.filter(col("doc_id") <= 2L)
    PairStore.build(less.select(col("doc_id")),
      NearDup.ngramJaccardPairs(less, threshold = 0.5), dir,
      "doc_id", "id_a", "id_b")
    assert(PairStore.labels(spark, dir).as[(Long, Long)].collect().toMap
      == Map(1L -> 1L, 2L -> 1L))
    assert(PairStore.labels(spark, dir).columns.toSeq
      == Seq("doc_id", "cluster_id"))
  }

  test("append == full rebuild, including a batch edge that MERGES old clusters") {
    val dir = tmpDir()
    // old corpus: clusters {1,2} and {3,4}, singleton 5
    val oldNodes = Seq(1L, 2L, 3L, 4L, 5L).toDF("id")
    val oldPairs = Seq((1L, 2L), (3L, 4L)).toDF("id_a", "id_b")
    PairStore.build(oldNodes, oldPairs, dir, "id", "id_a", "id_b")
    // batch: 6 joins {3,4}; 7 is a singleton; and pair (2,3) MERGES the
    // two old clusters through the quotient graph — the hard case
    val newNodes = Seq(6L, 7L).toDF("id")
    val newPairs = Seq((6L, 4L), (2L, 3L)).toDF("id_a", "id_b")
    PairStore.append(newNodes, newPairs, dir, "id", "id_a", "id_b")

    val incr = PairStore.labels(spark, dir).as[(Long, Long)].collect().toMap
    assert(incr == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 5L,
      6L -> 1L, 7L -> 7L))
    // row-identical to a from-scratch closure over the union
    val full = graft.functions.Clusters.connectedComponents(
        oldNodes.union(newNodes), oldPairs.union(newPairs),
        "id", "id_a", "id_b")
      .as[(Long, Long)].collect().toMap
    assert(incr == full)
    // stored pairs accumulated both generations
    assert(PairStore.pairs(spark, dir).as[(Long, Long)].collect().toSet
      == Set((1L, 2L), (3L, 4L), (6L, 4L), (2L, 3L)))
    // a second append with NO merging edges (pure growth) also matches
    PairStore.append(Seq(8L, 9L).toDF("id"),
      Seq((8L, 9L)).toDF("id_a", "id_b"), dir, "id", "id_a", "id_b")
    assert(PairStore.labels(spark, dir).as[(Long, Long)].collect().toMap
      == incr ++ Map(8L -> 8L, 9L -> 8L))
  }

  test("append is idempotent under replay: re-delivering a batch changes nothing") {
    val dir = tmpDir()
    PairStore.build(Seq(1L, 2L, 3L).toDF("id"),
      Seq((1L, 2L)).toDF("id_a", "id_b"), dir, "id", "id_a", "id_b")
    val nodes = Seq(4L, 5L).toDF("id")
    val batchPairs = Seq((4L, 5L), (2L, 3L)).toDF("id_a", "id_b")
    PairStore.append(nodes, batchPairs, dir, "id", "id_a", "id_b")
    val labels1 = PairStore.labels(spark, dir).as[(Long, Long)].collect().toMap
    val pairs1 = PairStore.pairs(spark, dir).as[(Long, Long)].collect()
    // a restarted ingest loop re-delivers the identical batch
    PairStore.append(nodes, batchPairs, dir, "id", "id_a", "id_b")
    assert(PairStore.labels(spark, dir).as[(Long, Long)].collect().toMap
      == labels1)
    val pairs2 = PairStore.pairs(spark, dir).as[(Long, Long)].collect()
    assert(pairs2.sorted.toSeq == pairs1.sorted.toSeq,
      "replay must not duplicate pair rows")
    assert(labels1 == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 4L))
  }

  test("append with an empty or pair-free batch is the identity on labels") {
    val dir = tmpDir()
    val oldNodes = Seq(1L, 2L, 3L).toDF("id")
    PairStore.build(oldNodes, Seq((1L, 2L)).toDF("id_a", "id_b"), dir,
      "id", "id_a", "id_b")
    val before = PairStore.labels(spark, dir).as[(Long, Long)].collect().toMap
    // batch with new nodes but zero near-dup pairs: pure growth
    PairStore.append(Seq(4L).toDF("id"),
      Seq.empty[(Long, Long)].toDF("id_a", "id_b"), dir, "id", "id_a", "id_b")
    assert(PairStore.labels(spark, dir).as[(Long, Long)].collect().toMap
      == before + (4L -> 4L))
    // fully empty batch: labels unchanged
    PairStore.append(Seq.empty[Long].toDF("id"),
      Seq.empty[(Long, Long)].toDF("id_a", "id_b"), dir, "id", "id_a", "id_b")
    assert(PairStore.labels(spark, dir).as[(Long, Long)].collect().toMap
      == before + (4L -> 4L))
  }

  test("entity store round-trip: fuzzy chain closure with pointer jumping") {
    val dir = tmpDir()
    val terms = Seq("acmee", "acme", "acmees", "bolt", "bolts", "zed")
      .toDF("term")
    PairStore.build(terms, Fuzzy.fuzzyPairs(terms, "term", 1), dir,
      "term", "term_a", "term_b", shortcut = true)
    assert(PairStore.labels(spark, dir).as[(String, String)].collect().toMap
      == Map("acme" -> "acme", "acmee" -> "acme", "acmees" -> "acme",
        "bolt" -> "bolt", "bolts" -> "bolt", "zed" -> "zed"))
  }
}
