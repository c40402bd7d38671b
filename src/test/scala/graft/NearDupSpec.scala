package graft

import org.apache.spark.sql.functions._
import graft.functions.{Dedup, NearDup, Similarity}

/** Near-dup + similarity operators: planted-duplicate fixtures with known
  * answers, plus accuracy checks of the approximate methods against exact
  * ones on the sf0.001 testdata. */
class NearDupSpec extends SparkSpec {
  import spark.implicits._

  // Planted fixture: 0/1 near-identical (one token changed), 2 unrelated,
  // 3 an exact duplicate of 0 up to case/whitespace.
  private lazy val docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog again and again today"),
    (1L, "the quick brown fox jumps over the lazy cat again and again today"),
    (2L, "completely different content about spark query engines and shuffles"),
    (3L, "  The quick brown fox jumps over the lazy dog again and again today ")
  ).toDF("doc_id", "text")

  test("exact dedup groups case/whitespace-normalized duplicates") {
    val g = Dedup.exactGroups(docs)
    assert(g.count() == 3)
    assert(g.filter(col("n_dups") === 2).select("keep_id").as[Long].head() == 0L)
  }

  test("dropExactDups keeps the min-id representative") {
    val kept = Dedup.dropExactDups(docs)
    assert(kept.count() == 3)
    assert(kept.select("doc_id").as[Long].collect().toSet == Set(0L, 1L, 2L))
  }

  test("shingles: distinct w-grams, short docs excluded") {
    val s = NearDup.docShingles(Seq((9L, "a b")).toDF("doc_id", "text"))
    assert(s.count() == 0)
    val s2 = NearDup.docShingles(Seq((9L, "a b c d")).toDF("doc_id", "text"))
    assert(s2.select("shingle").as[String].collect().toSet == Set("a b c", "b c d"))
  }

  test("ngram jaccard finds the planted near-pair (and not the unrelated one)") {
    val pairs = NearDup.ngramJaccardPairs(docs, threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 1L)))
    assert(!pairs.exists(p => p._1 == 2L || p._2 == 2L))
  }

  test("prefix-filtered jaccard equals the naive shingle self-join (lossless)") {
    val d = Tables.documents(spark, sf0001)
    for (t <- Seq(0.3, 0.5, 0.8)) {
      val fast = rows(NearDup.ngramJaccardPairs(d, t))
      val naive = rows(NearDup.ngramJaccardPairsNaive(d, t))
      assert(fast == naive, s"prefix filter lost pairs at t=$t")
    }
    // and on the planted fixture
    assert(rows(NearDup.ngramJaccardPairs(docs, 0.5)) ==
      rows(NearDup.ngramJaccardPairsNaive(docs, 0.5)))
  }

  test("exactly-at-threshold pairs survive the prefix filter at t=0.8 " +
      "(FP-safe prefix length)") {
    // 200 planted pairs at Jaccard EXACTLY 8/10 = 0.8: y_i's shingles are
    // a subset of x_i's. floor((1-0.8)*10) under-computes to 1 in double
    // arithmetic (prefix 2 instead of the required 3), which loses a
    // pair whenever x's two non-shared hashes happen to be its two
    // smallest (~1/45 per pair — near-certain across 200). The ceil-form
    // prefix must keep every one.
    val planted = (0 until 200).flatMap { i =>
      val toks = (0 until 12).map(j => s"t${i}_$j")
      Seq((2L * i, toks.mkString(" ")),
        (2L * i + 1, toks.take(10).mkString(" ")))
    }.toDF("doc_id", "text")
    for (t <- Seq(0.8, 0.9)) {
      val fast = rows(NearDup.ngramJaccardPairs(planted, t))
      val naive = rows(NearDup.ngramJaccardPairsNaive(planted, t))
      assert(fast == naive, s"prefix filter lost at-threshold pairs at t=$t")
      val rare = rows(NearDup.ngramJaccardPairsRareFirst(planted, t))
      assert(rare == naive, s"rare-first prefix lost at-threshold pairs at t=$t")
    }
  }

  test("prefix length is FP-safe when t*n rounds ABOVE an exact integer " +
    "(ceil-epsilon form)") {
    // t=0.56, n=25: the true product is exactly 14, but the double
    // computes 14.000000000000002 — a bare ceil reads 15 and SHORTENS
    // the prefix to 11, reintroducing the at-threshold false-negative
    // window from the other side. The epsilon form must yield 12; spot
    // checks around other exact-product and non-integer points pin the
    // formula against a driver-side BigDecimal reference.
    val cases = Seq((0.56, 25, 12), (0.8, 10, 3), (0.9, 20, 3),
      (0.5, 7, 4), (0.75, 16, 5), (0.07, 100, 94))
    val got = cases.map { case (t, n, _) =>
      Seq(n).toDF("n").select(NearDup.prefixLenCol(col("n"), t))
        .head.getInt(0)
    }
    assert(got == cases.map(_._3),
      s"prefix lengths ${cases.map(c => (c._1, c._2)).zip(got)} != expected " +
        cases.map(_._3))
  }

  test("simhash64 column form: null text yields null, not a 0L sentinel") {
    val got = Seq((1L, Some("a b c")), (2L, None))
      .toDF("doc_id", "text")
      .select(NearDup.simhash64(col("text")).as("s")).collect()
    assert(!got(0).isNullAt(0) && got(1).isNullAt(0),
      "null text must fingerprint to null (the native kernel's rule)")
  }

  test("rarest-first prefix ordering is lossless too (equals naive)") {
    val d = Tables.documents(spark, sf0001)
    for (t <- Seq(0.3, 0.8)) {
      assert(rows(NearDup.ngramJaccardPairsRareFirst(d, t)) ==
        rows(NearDup.ngramJaccardPairsNaive(d, t)),
        s"rarest-first lost pairs at t=$t")
    }
    assert(rows(NearDup.ngramJaccardPairsRareFirst(docs, 0.5)) ==
      rows(NearDup.ngramJaccardPairsNaive(docs, 0.5)))
  }

  test("skew probe: zipfian fixture selects rarest-first, uniform keeps hash order") {
    // Zipfian: every doc shares one 3-token boilerplate template (the
    // "stop-shingle" regime rarest-first exists for), plus a unique tail.
    val zipf = (0L until 40L).map { i =>
      (i, s"shared template header w$i x$i y$i z$i q$i r$i")
    }.toDF("doc_id", "text")
    // Uniform: fully disjoint vocabularies — every shingle df = 1.
    val uni = (0L until 40L).map { i =>
      (i, s"a$i b$i c$i d$i e$i f$i g$i h$i")
    }.toDF("doc_id", "text")
    val zs = NearDup.topShingleDfShare(zipf)
    val us = NearDup.topShingleDfShare(uni)
    assert(zs >= 0.02, s"zipfian fixture must probe as skewed, got $zs")
    assert(us < 0.02, s"uniform fixture must probe as uniform, got $us")
    // the real corpus is healthy — auto must not pay the df aggregate there
    assert(NearDup.topShingleDfShare(Tables.documents(spark, sf0001)) < 0.02,
      "sf0.001 documents must select the hash-ordered path")
    // and whichever path auto picks, the rows are the exact pair set
    assert(rows(NearDup.ngramJaccardPairsAuto(zipf, 0.5)) ==
      rows(NearDup.ngramJaccardPairsNaive(zipf, 0.5)))
    assert(rows(NearDup.ngramJaccardPairsAuto(uni, 0.5)) ==
      rows(NearDup.ngramJaccardPairsNaive(uni, 0.5)))
    // empty/degenerate corpora probe as uniform, not divide-by-zero
    assert(NearDup.topShingleDfShare(
      Seq((1L, "a b")).toDF("doc_id", "text")) == 0.0)
  }

  test("cross-corpus jaccard equals the self-join restricted to left×right") {
    val d = Tables.documents(spark, sf0001)
    val left = d.filter(col("doc_id") >= 250)
    val right = d.filter(col("doc_id") < 250)
    val across = NearDup.ngramJaccardAcross(left, right, threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // the self-join emits (a<b); a cross pair (new, old) appears as (old, new)
    val expect = NearDup.ngramJaccardPairs(d, threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect()
      .collect { case (a, b) if a < 250 && b >= 250 => (b, a) }.toSet
    assert(across == expect, s"$across vs $expect")
    assert(across.nonEmpty, "split must cut at least one planted pair")
  }

  test("minhash agrees with exact jaccard pairs on sf0.001 documents") {
    val d = Tables.documents(spark, sf0001)
    val exact = NearDup.ngramJaccardPairs(d, threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val mh = NearDup.minhashPairs(d, threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // estimated-Jaccard thresholding is approximate: demand high overlap
    val inter = (exact & mh).size.toDouble
    assert(exact.nonEmpty)
    assert(inter / exact.size >= 0.9, s"recall ${inter / exact.size}: $exact vs $mh")
    assert(inter / mh.size >= 0.9, s"precision ${inter / mh.size}")
  }

  test("simhashTable (aggregate form) equals per-row simhash64 expression") {
    val viaExpr = docs.select(col("doc_id"), NearDup.simhash64(col("text")).as("sh"))
      .as[(Long, Long)].collect().toMap
    val viaAgg = NearDup.simhashTable(docs).as[(Long, Long)].collect().toMap
    assert(viaExpr == viaAgg)
  }

  test("native single-pass simhash equals the HOF expression (incl. edge tokens)") {
    import graft.plans.SimHash64
    val edge = Seq((0L, "a b"), (1L, " leading"), (2L, "trailing "),
      (3L, "double  space"), (4L, "x")).toDF("doc_id", "text")
    for (df <- Seq(docs, edge, Tables.documents(spark, sf0001))) {
      val hof = df.select(col("doc_id"), NearDup.simhash64(col("text")).as("sh"))
        .as[(Long, Long)].collect().toMap
      val nat = df.select(col("doc_id"),
        SimHash64.simhash64Native(col("text")).as("sh"))
        .as[(Long, Long)].collect().toMap
      assert(hof == nat, "native simhash diverges from the HOF reference")
    }
  }

  test("simhash: identical docs distance 0, near docs close, pairs found") {
    val sh = docs.select(col("doc_id"), NearDup.simhash64(col("text")).as("sh"))
      .as[(Long, Long)].collect().toMap
    assert(java.lang.Long.bitCount(sh(0L) ^ sh(1L)) <= 16)
    assert(java.lang.Long.bitCount(sh(0L) ^ sh(2L)) > 16)
    val pairs = NearDup.simhashPairs(docs, maxHamming = 8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 1L)))
  }

  test("lsh ann recall vs brute force on sf0.001 embeddings") {
    val e = Tables.embeddings(spark, sf0001)
    val q = e.filter(col("vec_id") < 10)
    val exact = Similarity.bruteForceTopK(e, q, "vec_id", "embedding", 5)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    val ann = Similarity.lshTopK(e, q, "vec_id", "embedding", 5)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    val recall = (exact & ann).size.toDouble / exact.size
    // 8 tables x 4 planes OR-amplified; random near-orthogonal vectors are
    // the hardest case for sign-LSH, so the bar is moderate
    assert(recall >= 0.5, s"ann recall $recall too low")
  }

  test("ivf ann recall vs brute force on sf0.001 embeddings") {
    val e = Tables.embeddings(spark, sf0001)
    val q = e.filter(col("vec_id") < 10)
    val exact = Similarity.bruteForceTopK(e, q, "vec_id", "embedding", 5)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    val ivf = functions.Ivf.ivfTopK(e, q, "vec_id", "embedding", 5)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    val recall = (exact & ivf).size.toDouble / exact.size
    // random near-orthogonal vectors cluster weakly — probing 4/16 cells
    // is a moderate-recall regime by construction
    assert(recall >= 0.4, s"ivf recall $recall too low")
  }

  test("embedding near-dups finds planted identical vectors") {
    val base = Tables.embeddings(spark, sf0001).limit(50)
    // plant: duplicate vec 0 as id 9999
    val dup = base.filter(col("vec_id") === 0)
      .select(lit(9999L).as("vec_id"), col("embedding"), col("label"))
    val corpus = base.select("vec_id", "embedding", "label").union(dup)
    val pairs = Similarity.embeddingNearDups(corpus, "vec_id", "embedding",
      threshold = 0.999, nPlanes = 4)
    val found = pairs.select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(found == Set((0L, 9999L)), s"got $found")
  }

  // Direction-skewed corpus: a moderately-spread cluster the base planes
  // under-resolve (the hot-bucket failure mode) + uniform background.
  private def skewedCorpus(n: Int, clusterFrac: Double, eps: Double, d: Int) = {
    val rnd = new scala.util.Random(7)
    val base = Array.fill(d)(rnd.nextGaussian())
    val nc = (n * clusterFrac).toInt
    val rows: Seq[(Long, Seq[Float])] =
      (0 until nc).map(i => (i.toLong,
        base.map(b => (b + eps * rnd.nextGaussian()).toFloat).toSeq)) ++
      (nc until n).map(i => (i.toLong,
        Array.fill(d)(rnd.nextGaussian().toFloat).toSeq))
    rows.toDF("vec_id", "embedding")
  }

  test("hot-bucket sub-split bounds LSH candidates on a skewed corpus") {
    // eps=0.5 → pairwise cluster cosine ~0.8: hot because 6 planes
    // under-resolve the region, NOT because members are near-identical —
    // exactly the case the salt bits must split.
    val corpus = skewedCorpus(3000, 0.8, eps = 0.5, d = 16)
    def cand(maxBucket: Int): Long =
      Similarity.lshCandidatePairs(corpus, "vec_id", "embedding",
        nPlanes = 6, nTables = 8, dim = 16, maxBucket = maxBucket).count()
    val uncapped = cand(Int.MaxValue)
    val capped = cand(100)
    assert(capped < uncapped / 2,
      s"sub-split did not bound candidates: capped=$capped uncapped=$uncapped")
  }

  test("sub-split never separates exactly-identical vectors") {
    // Tight cluster → guaranteed hot bucket at maxBucket=20; the planted
    // exact duplicate must survive aggressive sub-splitting because salt
    // bits are functions of vector content, not id.
    val base = skewedCorpus(500, 1.0, eps = 0.3, d = 16)
    val dup = base.filter(col("vec_id") === 0)
      .select(lit(9999L).as("vec_id"), col("embedding"))
    val pairs = Similarity.embeddingNearDups(base.union(dup),
      "vec_id", "embedding", threshold = 0.9999, maxBucket = 20)
    val found = pairs.select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(found.contains((0L, 9999L)), s"planted exact dup lost: $found")
  }

  test("autoPlanes targets ~64-row buckets and clamps to [4, 30]") {
    assert(Similarity.autoPlanes(0) == 4)
    assert(Similarity.autoPlanes(500) == 4)
    assert(Similarity.autoPlanes(2000) == 5)
    assert(Similarity.autoPlanes(1000000) == 14)
    assert(Similarity.autoPlanes(Long.MaxValue) == 30)
  }

  test("sourceReport: exact copies per source, near flags, keeper not counted") {
    // srcA: doc 1 original, doc 2 exact copy (modulo case/trim), doc 3 unique
    // srcB: doc 4 copy of doc 1's text (copy counted in ITS OWN source)
    val docs = Seq(
      (1L, "the same text", "srcA"),
      (2L, "  THE SAME TEXT ", "srcA"),
      (3L, "something else", "srcA"),
      (4L, "the same text", "srcB")
    ).toDF("doc_id", "text", "source")
    val pairs = Seq((3L, 4L)).toDF("id_a", "id_b") // near-flag docs 3 and 4
    val got = graft.functions.Dedup.sourceReport(docs, pairs)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(got("srcA") == ((3L, 1L, 1L, 1.0 / 3)))
    assert(got("srcB") == ((1L, 1L, 1L, 1.0)))
  }

  test("crossSourcePairs keeps only pairs spanning sources; syndication rolls up unordered") {
    // 1~2 near-dup within srcA (dropped), 1~4 and 2~4 across srcA/srcB
    // (kept), 5 unique in srcB
    val docs = Seq(
      (1L, "a b c d e f g h", "srcA"),
      (2L, "a b c d e f g x", "srcA"),
      (4L, "a b c d e f g h", "srcB"),
      (5L, "q r s t u v w z", "srcB")
    ).toDF("doc_id", "text", "source")
    val got = graft.functions.Dedup.crossSourcePairs(docs, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(2)) ->
        ((r.getString(1), r.getString(3)))).toMap
    assert(got.keySet == Set((1L, 4L), (2L, 4L)),
      s"intra-source pair must be dropped: ${got.keySet}")
    assert(got((1L, 4L)) == (("srcA", "srcB")))
    val rep = graft.functions.Dedup.syndicationReport(docs, threshold = 0.5)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(rep == Map(("srcA", "srcB") -> 2L))
  }

  test("thresholdSweep: monotone pair/doc mass, cliff where the dup mode sits") {
    import spark.implicits._
    // docs 1/2 identical (J=1.0); 3/4 share most shingles (high J);
    // 5/6 share a minority (low J); 7 unique
    val docs = Seq(
      (1L, "a b c d e f g h"), (2L, "a b c d e f g h"),
      (3L, "p q r s t u v w"), (4L, "p q r s t u v x"),
      (5L, "k l m n o z1 z2 z3"), (6L, "k l m n o y1 y2 y3"),
      (7L, "j1 j2 j3 j4 j5 j6 j7 j8")).toDF("doc_id", "text")
    val got = graft.functions.Dedup.thresholdSweep(docs, minThreshold = 0.3)
      .as[(Double, Long, Long)].collect().toSeq.sortBy(_._1)
    // monotone non-increasing in both masses
    assert(got.map(_._2) == got.map(_._2).sorted.reverse, s"pairs not monotone: $got")
    assert(got.map(_._3) == got.map(_._3).sorted.reverse, s"docs not monotone: $got")
    val byT = got.map(g => g._1 -> g).toMap
    // at 0.9 only the identical pair survives; doc 7 never appears
    assert(byT(0.9) == ((0.9, 1L, 2L)), s"got ${byT(0.9)}")
    assert(got.map(_._3).max <= 6L, "unique doc must never be flagged")
    // the loosest row sees all three planted pairs
    assert(byT(0.3)._2 == 3L && byT(0.3)._3 == 6L, s"got ${byT(0.3)}")
  }

  test("lshTune: every factoring present, S-curve extremes, cost-ordered recommendation") {
    val got = graft.functions.NearDup.lshTune(spark, k = 32, threshold = 0.5)
      .collect().map(r => (r.getInt(0), r.getInt(1),
        r.getDouble(2), r.getDouble(3), r.getDouble(4)))
    assert(got.map(b => (b._1, b._2)).toSet ==
      Set((1, 32), (2, 16), (4, 8), (8, 4), (16, 2), (32, 1)))
    val byBands = got.map(r => r._1 -> r).toMap
    // 32 bands of 1 row: collides on ANY shared perm — no false negatives,
    // maximal false positives; 1 band of 32 rows is the mirror image
    assert(byBands(32)._4 == 0.0 && byBands(32)._3 > 0.4)
    assert(byBands(1)._3 == 0.0 && byBands(1)._4 > 0.4)
    // output is sorted by total cost and the balanced S-curve wins at 0.5
    val costs = got.map(_._5).toSeq
    assert(costs == costs.sorted, s"must be cost-ordered: $costs")
    assert(got.head._1 == 8 && got.head._2 == 4,
      s"expected 8x4 recommendation at t=0.5, got ${got.head}")
    got.foreach(r => assert(r._5 == BigDecimal(r._3 + r._4)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
  }

  test("lshTunedBands: the tuner pick is memoized per parameter tuple — " +
    "a serve path never replans the grid") {
    // warm: the first call may pay the one grid evaluation
    val pick = Ext.lshTunedBands(spark, k = 32, threshold = 0.5,
      gridN = 40, fnCeiling = 0.001)
    assert(pick == 16, s"fn<=0.001 constrained pick at t=0.5 must be " +
      s"(16,2) — the recall-safe banding the verified pipeline needs; got $pick")
    val before = Ext.lshTuneComputes.get()
    val again = Ext.lshTunedBands(spark, k = 32, threshold = 0.5,
      gridN = 40, fnCeiling = 0.001)
    assert(again == pick)
    assert(Ext.lshTuneComputes.get() == before,
      "a repeat serve-path call re-ran the lshTune grid instead of " +
        "hitting the pick memo")
    // a DIFFERENT parameter tuple is a different plan — must not alias
    val looser = Ext.lshTunedBands(spark, k = 32, threshold = 0.5,
      gridN = 40, fnCeiling = 1.0)
    assert(looser == 8, s"unconstrained pick at t=0.5 is the (8,4) cost " +
      s"minimum; got $looser (memo aliased across parameter tuples?)")
  }
}
