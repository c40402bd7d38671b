package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph analytics over edge tables (EXT tier — the reference has no graph
  * surface; companion to [[Clusters.connectedComponents]] which resolves
  * duplicate clusters over the same near-dup pair graphs).
  *
  * PageRank here is the DETERMINISTIC integer-arithmetic variant: ranks are
  * fixed-point longs (`scale` units = rank 1.0) and every step is integer
  * multiply / integer `div`, so the result is bit-identical across
  * partitionings, engines, and runs — float PageRank sums contributions in
  * shuffle-arrival order and never hash-matches an oracle. With
  * `scale = 10^6` the quantization error per step is < 10^-6 per in-edge,
  * far below any ranking-relevant difference, and overflow is impossible
  * until `85 · N · scale` exceeds Long.MaxValue (N ≈ 10^11 nodes).
  */
object Graph {

  /** Power-iteration PageRank with damping 0.85, unrolled into ONE logical
    * plan (no driver loop, no collect): iteration i+1 is
    *
    * {{{ r'(v) = (15·scale) div 100  +  (85 · Σ_{u→v} (r(u) div deg(u))) div 100 }}}
    *
    * over the node set = every vertex incident to an edge. `edges` is the
    * DIRECTED edge list; pass both directions for an undirected graph
    * (every node then has outdeg ≥ 1, so there is no dangling mass and the
    * classic formula applies unmodified — callers with genuinely directed
    * graphs must handle dangling nodes upstream).
    *
    * Scale shape: out-degrees are counted once and the degree-annotated
    * edge list is repartitioned on `src` and persisted, so each of the k
    * iterations re-reads a co-partitioned cached table; per iteration the
    * only data movement is the rank table to the edge partitioning (join on
    * src) and the contribution aggregate (groupBy dst) — 2 bounded
    * shuffles, each carrying one long per edge/node. k is a compile-time
    * plan depth (default 5), not a convergence loop: at 100 TB you pick the
    * iteration budget up front, exactly like the reference batch engines.
    *
    * @return (node, rank_scaled) — `rank_scaled` is the fixed-point rank in
    *         `scale` units; ranks of an undirected graph sum to ≈ N·scale.
    */
  def pageRank(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      iterations: Int = 5,
      scale: Long = 1000000L): DataFrame = {
    require(iterations > 0, s"iterations must be positive, got $iterations")
    require(scale > 0, s"scale must be positive, got $scale")

    val e = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst"))
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    // degree-annotated edges, co-partitioned on the per-iteration join key
    val ed = e.join(deg, "src").repartition(col("src")).persist()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct().persist()

    val base = 15L * scale / 100L
    var ranks = nodes.select(col("node"), lit(scale).as("rank"))
    for (_ <- 1 to iterations) {
      val summed = ed.join(ranks, ed("src") === ranks("node"))
        .select(col("dst"), expr("rank div deg").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("s"))
      ranks = nodes.join(summed, nodes("node") === summed("dst"), "left")
        .select(col("node"),
          (lit(base) + expr("(85 * coalesce(s, 0L)) div 100")).as("rank"))
    }
    graft.AutoUnpersist.afterFirstUse(ranks, ed, nodes)
  }
}
