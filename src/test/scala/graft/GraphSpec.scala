package graft

import org.apache.spark.sql.functions._
import graft.functions.Graph

/** Deterministic integer PageRank ([[graft.functions.Graph.pageRank]]) —
  * hand-checked star, equivalence with an in-test driver-side reference
  * over a larger graph, symmetry, partition invariance. Oracle parity at
  * sf is `graph_pagerank` in CORRECTNESS. */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  /** Driver-side reference: the same fixed-point recurrence, sequential. */
  private def refRanks(
      edges: Seq[(Long, Long)], iters: Int, scale: Long = 1000000L
  ): Map[Long, Long] = {
    val deg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    val base = 15L * scale / 100L
    var r = nodes.map(_ -> scale).toMap
    for (_ <- 1 to iters) {
      val s = edges.groupBy(_._2).view.mapValues(
        _.map { case (u, _) => r(u) / deg(u) }.sum).toMap
      r = nodes.map(n => n -> (base + 85L * s.getOrElse(n, 0L) / 100L)).toMap
    }
    r
  }

  private def both(pairs: Seq[(Long, Long)]): Seq[(Long, Long)] =
    pairs ++ pairs.map(_.swap)

  private def run(edges: Seq[(Long, Long)], iters: Int) =
    Graph.pageRank(edges.toDF("src", "dst"), "src", "dst", iters)
      .as[(Long, Long)].collect().toMap

  test("hand-checked star graph, one iteration") {
    // undirected star a(1)–{2,3,4}: deg(1)=3, leaves deg 1.
    // r1(1) = 150000 + (85·3·1000000) div 100 = 2700000
    // r1(leaf) = 150000 + (85·(1000000 div 3)) div 100 = 433333
    val got = run(both(Seq((1L, 2L), (1L, 3L), (1L, 4L))), iters = 1)
    assert(got === Map(1L -> 2700000L, 2L -> 433333L, 3L -> 433333L,
      4L -> 433333L))
  }

  test("matches the sequential reference on an irregular graph") {
    val pairs = for {
      i <- 1L to 30L; j <- (i + 1) to 30L
      if (i * 7 + j * 13) % 11 == 0 // sparse deterministic subset
    } yield (i, j)
    assert(pairs.nonEmpty)
    val e = both(pairs)
    assert(run(e, iters = 5) === refRanks(e, iters = 5))
  }

  test("symmetric nodes get identical ranks") {
    // path 1–2–3: endpoints 1 and 3 are automorphic
    val got = run(both(Seq((1L, 2L), (2L, 3L))), iters = 4)
    assert(got(1L) === got(3L))
    assert(got(2L) > got(1L))
  }

  test("ranks are partition-invariant") {
    val e = both((1L to 40L).map(i => (i, i % 7 + 100L)))
    val df = e.toDF("src", "dst")
    val a = Graph.pageRank(df.repartition(1), "src", "dst", 3)
      .as[(Long, Long)].collect().toMap
    val b = Graph.pageRank(df.repartition(17), "src", "dst", 3)
      .as[(Long, Long)].collect().toMap
    assert(a === b)
  }

  test("pageRank plan depth stays bounded in the iteration count " +
    "(lazy chain truncated every CheckpointEvery rounds; directed is " +
    "constant — each round plans over the checkpointed aggregate leaf)") {
    val e = both(Seq((1L, 2L), (2L, 3L), (3L, 1L))).toDF("src", "dst")
    def nodesOf(df: org.apache.spark.sql.DataFrame): Int =
      df.queryExecution.analyzed.collect { case n => n }.size
    // undirected: the recurrence references the previous rank table once,
    // so the lazy chain grows LINEARLY between checkpoints and the
    // checkpoint (every 8 rounds) truncates it — 12 and 20 iterations are
    // both 4 rounds past their last checkpoint and must plan identically
    val u12 = nodesOf(Graph.pageRank(e, "src", "dst", 12))
    val u20 = nodesOf(Graph.pageRank(e, "src", "dst", 20))
    assert(u12 === u20,
      s"undirected plan not truncated at the checkpoint cap: $u12 -> $u20 nodes")
    // directed: every round's rank table is a lazy projection over the
    // per-round checkpointed (dst, matched) aggregate — without that
    // truncation the dangling broadcast's second reference to the
    // previous round would DOUBLE the plan tree per iteration
    val d2 = nodesOf(Graph.pageRankDirected(e, "src", "dst", 2))
    val d6 = nodesOf(Graph.pageRankDirected(e, "src", "dst", 6))
    assert(d2 === d6,
      s"directed plan grew with iterations: $d2 -> $d6 nodes")
  }

  test("total rank mass is conserved up to truncation") {
    // undirected graph: Σ ranks ≤ N·scale, shortfall only from the two
    // integer divs (< 1 + deg per node per iteration)
    val pairs = (1L to 20L).map(i => (i, i % 5 + 50L))
    val e = both(pairs)
    val got = run(e, iters = 5)
    val n = got.size
    val total = got.values.sum
    assert(total <= n * 1000000L)
    assert(total > (n * 1000000L * 99L) / 100L)
  }

  // ---- directed PageRank (dangling-mass conservation) ----------------

  /** Driver-side reference for the DIRECTED recurrence with the
    * dangling-mass redistribution, sequential. */
  private def refRanksDirected(
      edges: Seq[(Long, Long)], iters: Int, scale: Long = 1000000L
  ): Map[Long, Long] = {
    val deg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    val n = nodes.size.toLong
    val base = 15L * scale / 100L
    var r = nodes.map(_ -> scale).toMap
    for (_ <- 1 to iters) {
      val s = edges.groupBy(_._2).view.mapValues(
        _.map { case (u, _) => r(u) / deg(u) }.sum).toMap
      val dm = nodes.filterNot(deg.contains).map(r).sum
      r = nodes.map(v =>
        v -> (base + 85L * (s.getOrElse(v, 0L) + dm / n) / 100L)).toMap
    }
    r
  }

  private def runDirected(edges: Seq[(Long, Long)], iters: Int) =
    Graph.pageRankDirected(edges.toDF("src", "dst"), "src", "dst", iters)
      .as[(Long, Long)].collect().toMap

  test("pageRankDirected: hand-checked two-node chain with a sink") {
    // 1 -> 2: deg(1)=1, node 2 is dangling; N = 2.
    // iter 1: s(2) = 1000000; dm = r(2) = 1000000, dm div N = 500000
    //   r1(1) = 150000 + 85·(0 + 500000) div 100      = 575000
    //   r1(2) = 150000 + 85·(1000000 + 500000) div 100 = 1425000
    val got = runDirected(Seq((1L, 2L)), iters = 1)
    assert(got === Map(1L -> 575000L, 2L -> 1425000L))
  }

  test("pageRankDirected: conserves total mass where the undirected " +
      "formula would leak it through sinks") {
    // a chain with a long tail of sinks off a cycle
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 4L), (4L, 5L),
      (2L, 6L), (6L, 7L))
    val got = runDirected(edges, iters = 5)
    val n = got.size
    val total = got.values.sum
    // with redistribution, mass stays ≈ N·scale up to integer dust
    assert(total <= n * 1000000L)
    assert(total > (n * 1000000L * 97L) / 100L,
      s"dangling mass leaked: $total of ${n * 1000000L}")
  }

  test("pageRankDirected: matches the sequential directed reference") {
    val core = for {
      i <- 1L to 25L; j <- 1L to 25L
      if i != j && (i * 5 + j * 17) % 13 == 0 // sparse deterministic core
    } yield (i, j)
    // explicit sink tails: 101..105 never appear as a source
    val edges = core ++ (1L to 5L).map(i => (i * 3, 100L + i))
    val sinks = (edges.map(_._2).toSet -- edges.map(_._1).toSet)
    assert(sinks.nonEmpty, "fixture must contain dangling nodes")
    assert(runDirected(edges, iters = 5) === refRanksDirected(edges, iters = 5))
  }

  test("pageRankDirected: equals pageRank on a symmetrized graph " +
      "(no dangling mass, dm = 0)") {
    val e = both(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (1L, 3L)))
    assert(runDirected(e, iters = 4) === run(e, iters = 4))
  }

  private def tri(edges: Seq[(Long, Long)]) =
    Graph.triangleCounts(edges.toDF("src", "dst"), "src", "dst")
      .select(col("node"), col("degree"), col("n_triangles"), col("clustering"))
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap

  test("triangleCounts: hand-checked K4 minus one edge") {
    // 1-2, 1-3, 1-4, 2-3, 2-4 (missing 3-4): triangles {1,2,3}, {1,2,4}
    val got = tri(Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L)))
    assert(got(1L) == ((3L, 2L, 2.0 * 2 / (3 * 2))))
    assert(got(2L) == ((3L, 2L, 2.0 * 2 / (3 * 2))))
    assert(got(3L) == ((2L, 1L, 1.0)))
    assert(got(4L) == ((2L, 1L, 1.0)))
  }

  test("triangleCounts: dedups reversed/duplicate edges, drops self-loops") {
    val noisy = Seq((1L, 2L), (2L, 1L), (1L, 2L), (2L, 3L), (3L, 1L), (2L, 2L))
    val got = tri(noisy)
    assert(got.keySet == Set(1L, 2L, 3L))
    assert(got.values.forall { case (d, t, c) => d == 2L && t == 1L && c == 1.0 })
  }

  test("triangleCounts: triangle-free graph and degree-1 nodes") {
    // path 1-2-3-4: zero triangles, clustering 0 everywhere
    val got = tri(Seq((1L, 2L), (2L, 3L), (3L, 4L)))
    assert(got.values.forall { case (_, t, c) => t == 0L && c == 0.0 })
    assert(got(1L)._1 == 1L && got(2L)._1 == 2L)
  }

  test("triangleCounts: matches naive count on a skewed hub graph") {
    // hub 0 connected to 1..12, plus ring edges among leaves — the shape
    // where degree ordering matters; compare against a driver-side naive
    // all-triple count.
    val hub = (1L to 12L).map(0L -> _)
    val ring = (1L to 12L).map(i => (i, if (i == 12L) 1L else i + 1))
    val edges = hub ++ ring
    val canon = edges.map { case (a, b) => (math.min(a, b), math.max(a, b)) }.toSet
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    val naive = nodes.map { v =>
      val nbrs = nodes.filter(u => canon(math.min(u, v) -> math.max(u, v)))
      v -> (for {
        x <- nbrs; y <- nbrs if x < y
        if canon(math.min(x, y) -> math.max(x, y))
      } yield 1).size.toLong
    }.toMap
    val got = tri(edges)
    nodes.foreach { v => assert(got(v)._2 == naive(v), s"node $v") }
  }
}
