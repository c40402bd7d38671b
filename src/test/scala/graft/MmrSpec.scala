package graft

import org.apache.spark.sql.functions._
import graft.functions.Retrieval

/** Greedy MMR re-rank ([[Retrieval.mmrSelect]]): hand-checked greedy
  * trace, missing-pair-means-zero-sim, per-query independence, sub-k
  * shortlist degradation, and the k=16 plan staying tractable (the
  * unrolled recursion is linearized by per-step leaf picks). */
class MmrSpec extends SparkSpec {
  import spark.implicits._

  // A(.9) and B(.85) are near-dups (sim .95); C(.5) is distant from A
  // and has NO pair row with B (contract: absent pair = sim 0)
  private def cand = Seq(
    (1L, "A", 0.9), (1L, "B", 0.85), (1L, "C", 0.5)
  ).toDF("query_id", "doc_id", "rel")
  private def sims = Seq(
    (1L, "A", "B", 0.95), (1L, "B", "A", 0.95),
    (1L, "A", "C", 0.10), (1L, "C", "A", 0.10)
  ).toDF("query_id", "id_a", "id_b", "sim")

  test("greedy trace: diversity demotes the near-duplicate of the top hit") {
    val got = Retrieval.mmrSelect(cand, sims, k = 3)
      .select("doc_id", "rank", "mmr")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getDouble(2)))
    // step1: argmax λ·rel → A (0.45)
    // step2: B = .5·.85 − .5·.95 ≈ −0.05 ; C = .5·.5 − .5·.1 = 0.20 → C
    // step3: B = .5·.85 − .5·max(.95, 0) ≈ −0.05 (sim(B,C) absent → 0)
    assert(got.map(g => (g._1, g._2)).toSeq ==
      Seq(("A", 1), ("C", 2), ("B", 3)), s"got ${got.toSeq}")
    val byDoc = got.map(g => g._1 -> g._3).toMap
    assert(math.abs(byDoc("A") - 0.45) < 1e-12 &&
      math.abs(byDoc("C") - 0.2) < 1e-12 &&
      math.abs(byDoc("B") - (-0.05)) < 1e-12, s"mmr values: $byDoc")
  }

  test("queries select independently; sub-k shortlists degrade to their size") {
    val two = cand.unionByName(
      Seq((2L, "X", 0.3), (2L, "Y", 0.9)).toDF("query_id", "doc_id", "rel"))
    val got = Retrieval.mmrSelect(two, sims, k = 16)
      .groupBy("query_id").agg(count(lit(1)).as("n"),
        min(when(col("rank") === 1, col("doc_id"))).as("first"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2))))
      .toMap
    // k=16 > both shortlists: every candidate selected exactly once, in
    // greedy order; no crash, no duplicate, no cross-query bleed
    assert(got(1L) == ((3L, "A")) && got(2L) == ((2L, "Y")), s"got $got")
  }

  test("lambda=1 is pure relevance order; lambda=0 is pure anti-similarity") {
    val rel = Retrieval.mmrSelect(cand, sims, k = 3, lambda = 1.0)
      .orderBy("rank").select("doc_id").as[String].collect().toSeq
    assert(rel == Seq("A", "B", "C"))
  }
}
