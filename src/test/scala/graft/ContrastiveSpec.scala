package graft

import graft.functions.Contrastive

/** Contrastive pair/triplet mining ([[graft.functions.Contrastive]]):
  * hand-checkable 2-D geometry — hardest positives/negatives by exact
  * cosine, FaceNet semi-hard selection including the no-valid-triplet
  * anchors. Oracle parity at sf is `contrastive_pairs` /
  * `contrastive_triplets` in CORRECTNESS. */
class ContrastiveSpec extends SparkSpec {
  import spark.implicits._

  // unit-ish 2-D vectors; cosine order is readable from the angles.
  // 7 sits between 5 and 6 so that EVERY negative of anchor 6 is closer
  // than 6's best positive (the no-semi-hard case).
  private val vecs: Map[Long, (Float, Float)] = Map(
    1L -> ((1.0f, 0.0f)),   // label 0; pos twin of 2
    2L -> ((0.9f, 0.1f)),   // label 0
    3L -> ((0.0f, 1.0f)),   // label 1
    4L -> ((0.1f, 0.9f)),   // label 1
    5L -> ((0.7f, 0.7f)),   // label 1; the semi-hard negative for anchor 1
    6L -> ((0.6f, 0.8f)),   // label 0; every neg closer than its best pos
    7L -> ((0.65f, 0.75f))) // label 2: unique label, no positive exists
  private val labels = Map(1L -> 0, 2L -> 0, 3L -> 1, 4L -> 1, 5L -> 1,
    6L -> 0, 7L -> 2)

  private def emb = vecs.toSeq.sortBy(_._1)
    .map { case (id, (x, y)) => (id, Array(x, y), labels(id)) }
    .toDF("vec_id", "embedding", "label")

  // expected cosine with the engine's exact arithmetic: float values
  // cast to double, then one IEEE fold
  private def cos(i: Long, j: Long): Double = {
    val (ax, ay) = (vecs(i)._1.toDouble, vecs(i)._2.toDouble)
    val (bx, by) = (vecs(j)._1.toDouble, vecs(j)._2.toDouble)
    (ax * bx + ay * by) /
      (math.sqrt(ax * ax + ay * ay) * math.sqrt(bx * bx + by * by))
  }
  private def r6(x: Double) = BigDecimal(x)
    .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("hardPairs ranks within each kind and caps at k") {
    val got = Contrastive.hardPairs(emb, emb.filter($"vec_id" <= 2),
        "vec_id", "embedding", "label", k = 2)
      .as[(Long, String, Long, Double)].collect()
    val a1 = got.filter(_._1 == 1L)
    // anchor 1: positives = {2, 6}; negatives ranked 5 > 7 > 4 > 3, top-2
    assert(a1.filter(_._2 == "pos").map(_._3).toSet == Set(2L, 6L))
    assert(a1.filter(_._2 == "neg").map(_._3).toSet == Set(5L, 7L))
    val a1n5 = a1.find(r => r._2 == "neg" && r._3 == 5L).get
    assert(a1n5._4 == r6(cos(1L, 5L)))
  }

  test("semiHardTriplets: hardest negative strictly farther than hardest positive") {
    val got = Contrastive.semiHardTriplets(emb, emb,
        "vec_id", "embedding", "label")
      .as[(Long, Long, Double, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    // anchor 1: best pos = 2; negatives below pos_sim: 5 is hardest
    val (p1, ps1, n1, ns1) = got(1L)
    assert((p1, n1) == ((2L, 5L)))
    assert(ps1 == r6(cos(1L, 2L)) && ns1 == r6(cos(1L, 5L)))
    assert(ns1 < ps1, "semi-hard negative must be farther than the positive")
    // anchor 6: its best positive is 2, but negatives 3,4,5,7 are ALL
    // closer than that positive -> no semi-hard triplet
    assert(cos(6L, 2L) < Seq(3L, 4L, 5L, 7L).map(cos(6L, _)).min,
      "fixture: anchor 6's negatives must all dominate its best positive")
    assert(!got.contains(6L), "no semi-hard triplet when negatives dominate")
    // anchor 7: unique label, no positive -> no triplet
    assert(!got.contains(7L))
    // every emitted triplet satisfies the margin ordering
    got.values.foreach { case (_, ps, _, ns) => assert(ns < ps) }
  }

  test("mining is invariant to corpus partitioning") {
    val base = Contrastive.semiHardTriplets(emb, emb,
      "vec_id", "embedding", "label").collect().toSet
    assert(Contrastive.semiHardTriplets(emb.repartition(5), emb,
      "vec_id", "embedding", "label").collect().toSet == base)
  }

  test("IVF-served mining at full probe equals the brute-force miner") {
    val e = Tables.embeddings(spark, sf0001)
    val anchors = e.filter(org.apache.spark.sql.functions.col("vec_id") < 8)
    val dir = java.nio.file.Files.createTempDirectory("ivf_contrastive").toString
    val idx = graft.functions.IvfIndex.build(e, "vec_id", "embedding", 8, dir)
    val exact = Contrastive.hardPairs(e, anchors,
        "vec_id", "embedding", "label", k = 4)
      .select("qid", "kind", "nid")
      .as[(Long, String, Long)].collect().toSet
    val ivf = Contrastive.hardPairsIvf(idx, e, anchors,
        "vec_id", "embedding", "label", k = 4, nProbe = 8, candidates = 1 << 20)
      .select("qid", "kind", "nid")
      .as[(Long, String, Long)].collect().toSet
    assert(ivf == exact,
      "full probe with a corpus-sized pool must mine exactly the brute-force set")
    // partial probe: a subset relation isn't guaranteed (per-kind top-k
    // over fewer candidates), but every mined id must come from the
    // probed pool and each (qid, kind) emits at most k rows
    val part = Contrastive.hardPairsIvf(idx, e, anchors,
        "vec_id", "embedding", "label", k = 4, nProbe = 2, candidates = 64)
      .select("qid", "kind", "nid")
      .as[(Long, String, Long)].collect().toSeq
    part.groupBy(r => (r._1, r._2)).foreach { case (g, rows) =>
      assert(rows.size <= 4, s"group $g overflowed k")
    }
  }
}
