package graft

import org.apache.spark.sql.functions._
import graft.functions.Clusters

/** Connected components ([[graft.functions.Clusters]]) — closure
  * correctness on shapes the testdata's disjoint planted pairs can't
  * reach: chains (multi-round propagation), cycles, merged stars, and
  * the loud non-convergence guard. */
class ClustersSpec extends SparkSpec {
  import spark.implicits._

  private def cc(nodes: Seq[Long], edges: Seq[(Long, Long)], maxIter: Int = 25,
      shortcut: Boolean = false) =
    Clusters.connectedComponents(
        nodes.toDF("id"), edges.toDF("a", "b"), "id", "a", "b", maxIter,
        shortcut)
      .as[(Long, Long)].collect().sortBy(_._1).toSeq

  test("chain merges to one cluster labeled by its minimum") {
    // 5-4-3-2-1: min label must walk the full diameter
    val got = cc(1L to 5L, Seq((5L, 4L), (4L, 3L), (3L, 2L), (2L, 1L)))
    assert(got == (1L to 5L).map(_ -> 1L))
  }

  test("cycle, star, singleton, and duplicate/reversed edges") {
    val edges = Seq((10L, 11L), (11L, 12L), (12L, 10L), // cycle
      (20L, 21L), (20L, 22L), (22L, 20L), (21L, 20L),   // star + dups
      (30L, 31L))
    val got = cc(Seq(10L, 11L, 12L, 20L, 21L, 22L, 30L, 31L, 40L), edges)
    assert(got == Seq(10L -> 10L, 11L -> 10L, 12L -> 10L,
      20L -> 20L, 21L -> 20L, 22L -> 20L, 30L -> 30L, 31L -> 30L,
      40L -> 40L))
  }

  test("two pair-chains merging via a bridge edge") {
    // {1,2} and {3,4} separately, then 2-3 bridges them
    val got = cc(1L to 4L, Seq((1L, 2L), (3L, 4L), (2L, 3L)))
    assert(got == (1L to 4L).map(_ -> 1L))
  }

  test("no edges → every node is its own singleton cluster") {
    val got = cc(Seq(7L, 8L, 9L), Seq.empty)
    assert(got == Seq(7L -> 7L, 8L -> 8L, 9L -> 9L))
  }

  test("maxIter too small for the diameter fails loudly, never truncates") {
    val chain = (1L until 8L).map(i => (i, i + 1))
    val e = intercept[IllegalStateException](cc(1L to 8L, chain, maxIter = 2))
    assert(e.getMessage.contains("converge"))
  }

  test("shortcut mode: same closure on every shape, O(log d) rounds") {
    // identical fixpoints on chain / cycle / star / bridge / singletons
    val edges = Seq((10L, 11L), (11L, 12L), (12L, 10L),
      (20L, 21L), (20L, 22L), (30L, 31L))
    val nodes = Seq(10L, 11L, 12L, 20L, 21L, 22L, 30L, 31L, 40L)
    assert(cc(nodes, edges, shortcut = true) === cc(nodes, edges))
    val chain = (1L until 33L).map(i => (i, i + 1))
    assert(cc(1L to 33L, chain, shortcut = true) === (1L to 33L).map(_ -> 1L))
    // the logarithmic bound is the point: a 32-hop chain must converge
    // within ~log2(32)+2 rounds where plain propagation needs 32
    val e = intercept[IllegalStateException](
      cc(1L to 33L, chain, maxIter = 8))
    assert(e.getMessage.contains("converge"))
    assert(cc(1L to 33L, chain, maxIter = 8, shortcut = true) ===
      (1L to 33L).map(_ -> 1L))
  }

  test("deep chain to fixpoint in BOTH modes: plain needs diameter rounds, shortcut O(log d)") {
    // 33-node chain, diameter 32 — past the ~20-round horizon where the
    // scaladoc tells cluster deployments to swap persist for checkpoint;
    // this drives the localCheckpoint-per-round shortcut path AND the
    // plain persist/unpersist loop all the way to their fixpoints.
    val chain = (1L until 33L).map(i => (i, i + 1))
    def run(shortcut: Boolean, maxIter: Int) = {
      val (df, rounds) = Clusters.connectedComponentsWithRounds(
        (1L to 33L).toDF("id"), chain.toDF("a", "b"), "id", "a", "b",
        maxIter, shortcut)
      (df.as[(Long, Long)].collect().sortBy(_._1).toSeq, rounds)
    }
    val (plainLabels, plainRounds) = run(shortcut = false, maxIter = 64)
    val (jumpLabels, jumpRounds) = run(shortcut = true, maxIter = 16)
    val expected = (1L to 33L).map(_ -> 1L)
    assert(plainLabels == expected)
    assert(jumpLabels == expected)
    // plain propagation moves the min label one hop per round: exactly
    // diameter rounds of change + the convergence-confirming round
    assert(plainRounds == 33, s"plain took $plainRounds rounds")
    // pointer jumping halves label distances per round: log2(32)=5, plus
    // the neighbor hop and the confirm round — single digits, not 33
    assert(jumpRounds <= 9, s"shortcut took $jumpRounds rounds")
    assert(jumpRounds * 3 < plainRounds)
  }

  test("near-dup pairs at sf0.001 match a driver-side union-find closure") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val pairs = graft.functions.NearDup.ngramJaccardPairs(docs, threshold = 0.5)
    val got = Clusters.connectedComponents(
        docs.select(col("doc_id")), pairs, "doc_id", "id_a", "id_b")
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    // reference: classic union-find over the collected pairs (tiny here)
    val ids = docs.select("doc_id").as[Long].collect().sorted
    val parent = scala.collection.mutable.Map(ids.map(i => i -> i): _*)
    def find(x: Long): Long =
      if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    pairs.select("id_a", "id_b").as[(Long, Long)].collect().foreach {
      case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expected = ids.map(i => i -> find(i)).toSeq
    assert(got == expected)
    // and the pair graph is non-trivial: some clusters exceed two docs
    val sizes = got.groupBy(_._2).values.map(_.size)
    assert(sizes.exists(_ >= 2), "no multi-doc cluster — fixture degenerate")
  }

  test("connectedComponentsShared matches the uncached closure on repeat calls") {
    val nodes = (1L to 6L).toDF("id")
    val edges = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("a", "b")
    val want = Clusters.connectedComponents(nodes, edges, "id", "a", "b")
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    // both the cold (computing) and warm (cache-hit) paths must agree
    for (_ <- 1 to 2) {
      val got = Clusters.connectedComponentsShared(nodes, edges, "id", "a", "b")
        .as[(Long, Long)].collect().sortBy(_._1).toSeq
      assert(got == want)
    }
  }

  test("keepBestPerCluster: max score survives, score ties to smallest id") {
    import org.apache.spark.sql.functions.col
    // clusters {1,2,3} (scores 5,9,9), {4} (singleton), {5,6} (tie 7,7)
    val labeled = Seq(
      (1L, 1L, 5L), (2L, 1L, 9L), (3L, 1L, 9L),
      (4L, 4L, 2L),
      (5L, 5L, 7L), (6L, 5L, 7L)
    ).toDF("doc_id", "cluster_id", "score")
    val got = Clusters.keepBestPerCluster(labeled, "doc_id", "score")
      .as[Long].collect().sorted.toSeq
    // cluster 1: score tie 9 between ids 2,3 -> id 2; cluster {5,6} -> id 5
    assert(got == Seq(2L, 4L, 5L))
    // partition invariance
    val repart = Clusters.keepBestPerCluster(
        labeled.repartition(7, col("doc_id")), "doc_id", "score")
      .as[Long].collect().sorted.toSeq
    assert(repart == got)
  }

  test("keepBestPerCluster works over STRING ids (tie-break needs no negation)") {
    val labeled = Seq(
      ("doc-b", 1L, 9L), ("doc-a", 1L, 9L), ("doc-c", 1L, 5L),
      ("doc-z", 2L, 1L)
    ).toDF("doc_id", "cluster_id", "score")
    val got = Clusters.keepBestPerCluster(labeled, "doc_id", "score")
      .as[String].collect().sorted.toSeq
    assert(got == Seq("doc-a", "doc-z")) // tie 9 -> smallest id "doc-a"
  }
}
