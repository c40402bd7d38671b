package graft

import graft.functions.Profile

/** Corpus-monitoring operators ([[graft.functions.Profile]]) — null/
  * distinct semantics and the chi-square definition on hand-checkable
  * fixtures. Oracle parity at sf is `profile_table` / `drift_cells`. */
class ProfileSpec extends SparkSpec {
  import spark.implicits._

  test("profile counts nulls, excludes them from distinct, strings min/max") {
    val df = Seq(
      (1L, Some("b")), (2L, None), (3L, Some("a")), (4L, Some("a"))
    ).toDF("id", "s")
    val got = Profile.profile(df)
      .as[(String, Long, Long, Long, Option[String], Option[String])]
      .collect().map(r => r._1 -> r).toMap
    assert(got("id") == (("id", 4L, 0L, 4L, Some("1"), Some("4"))))
    assert(got("s") == (("s", 4L, 1L, 2L, Some("a"), Some("b"))))
  }

  test("categoryDrift terms match the textbook chi-square decomposition") {
    // 2x2 contingency: slices X/Y over cats p/q with a known imbalance
    val df = (Seq.fill(30)(("X", "p")) ++ Seq.fill(10)(("X", "q")) ++
      Seq.fill(10)(("Y", "p")) ++ Seq.fill(30)(("Y", "q")))
      .toDF("source", "lang")
    val got = Profile.categoryDrift(df, "source", "lang")
      .as[(String, String, Long, Double, Double)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    // each slice total 40, each cat total 40, n = 80 → expected 20 per cell
    for (cell <- Seq(("X", "p"), ("X", "q"), ("Y", "p"), ("Y", "q"))) {
      assert(got(cell)._4 == 20.0)
      assert(got(cell)._5 == 100.0 / 20.0) // (30-20)^2/20 = (10-20)^2/20
    }
    // the statistic (downstream sum of terms) is the textbook 20.0
    assert(got.values.map(_._5).sum == 20.0)
  }

  test("categoryDrift on independent distributions yields zero terms") {
    val df = (for (s <- Seq("X", "Y"); l <- Seq("p", "q"); _ <- 1 to 5)
      yield (s, l)).toDF("source", "lang")
    val terms = Profile.categoryDrift(df, "source", "lang")
      .as[(String, String, Long, Double, Double)].collect().map(_._5)
    assert(terms.length == 4 && terms.forall(_ == 0.0))
  }

  test("sourceOverlap: exact Jaccard on hand-built shingle sets") {
    // A: "a b c d" → shingles {a b c, b c d}; B: "b c d e" → {b c d, c d e}
    // A∩B = {b c d} → J = 1/3. C shares nothing with A or B.
    val df = Seq(
      (1L, "a b c d", "A"), (2L, "b c d e", "B"), (3L, "x y z w", "C")
    ).toDF("doc_id", "text", "source")
    val got = Profile.sourceOverlap(df, "source")
      .as[(String, String, Long, Long, Long, Double)].collect()
    assert(got.toSeq === Seq(("A", "B", 2L, 2L, 1L, 1.0 / 3.0)))
  }

  test("sourceOverlap: duplicate shingles within a group count once") {
    // both docs of A contain the same shingle set
    val df = Seq(
      (1L, "a b c", "A"), (2L, "a b c", "A"), (3L, "a b c d", "B")
    ).toDF("doc_id", "text", "source")
    val got = Profile.sourceOverlap(df, "source")
      .as[(String, String, Long, Long, Long, Double)].collect()
    assert(got.toSeq === Seq(("A", "B", 1L, 2L, 1L, 0.5)))
  }

  test("sourceOverlap: zero-overlap pairs are absent (read as zero)") {
    val df = Seq((1L, "a b c", "A"), (2L, "p q r", "B"))
      .toDF("doc_id", "text", "source")
    assert(Profile.sourceOverlap(df, "source").isEmpty)
  }

  test("sourceOverlapSketch: k >= set sizes makes the estimate exact") {
    // sketches hold the full sets → Ĵ must equal J exactly
    val df = Seq(
      (1L, "a b c d", "A"), (2L, "b c d e", "B"), (3L, "x y z w", "C")
    ).toDF("doc_id", "text", "source")
    val got = Profile.sourceOverlapSketch(df, "source", k = 16, tol = 0.0)
      .as[(String, String, Double, Double, Boolean)].collect().toSeq
    assert(got === Seq(
      ("A", "B", 1.0 / 3.0, 1.0 / 3.0, true),
      ("A", "C", 0.0, 0.0, true),
      ("B", "C", 0.0, 0.0, true)))
  }

  test("sourceOverlapSketch: estimate tracks exact within tolerance at small k") {
    // two groups with engineered overlap: 60 shared / 40+40 private shingles
    val mk = (g: String, words: Seq[String]) =>
      words.zipWithIndex.map { case (ws, i) => ((g + i).hashCode.toLong, ws, g) }
    val shared = (0 until 60).map(i => s"s$i s${i}x s${i}y")
    val privA = (0 until 40).map(i => s"pa$i pa${i}x pa${i}y")
    val privB = (0 until 40).map(i => s"pb$i pb${i}x pb${i}y")
    val df = (mk("A", shared ++ privA) ++ mk("B", shared ++ privB))
      .toDF("doc_id", "text", "source")
    // true J = 60 / 140 ≈ 0.4286
    val got = Profile.sourceOverlapSketch(df, "source", k = 64, tol = 0.2)
      .as[(String, String, Double, Double, Boolean)].collect()
    assert(got.length === 1)
    val (_, _, est, exact, ok) = got.head
    assert(exact === 60.0 / 140.0)
    assert(ok, s"estimate $est vs exact $exact outside 0.2")
  }

  test("sourceOverlapSketch is partition-invariant (sketch is canonical)") {
    val df = (1L to 50L).map(i =>
      (i, s"w${i % 17} w${i % 7} w${i % 5} w${i % 3}", s"g${i % 3}"))
      .toDF("doc_id", "text", "source")
    val a = Profile.sourceOverlapSketch(df.repartition(1), "source", k = 8)
      .collect().map(_.toSeq)
    val b = Profile.sourceOverlapSketch(df.repartition(11), "source", k = 8)
      .collect().map(_.toSeq)
    assert(a.toSeq === b.toSeq)
  }

  test("giniProfile: constant column 0, uniform 2-value 0.5, skew in between") {
    val df = Seq(
      ("x", "a", "p"), ("x", "a", "p"), ("x", "b", "p"), ("x", "b", "q")
    ).toDF("const", "uniform", "skewed")
    val got = Profile.giniProfile(df, Seq("const", "uniform", "skewed"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got("const") == ((1L, 4L, 0.0)))
    assert(got("uniform") == ((2L, 4L, 0.5)))
    // skewed 3:1 → 1 - (9+1)/16 = 0.375
    assert(got("skewed") == ((2L, 4L, 0.375)))
  }

  test("datacard: counts, distinct contents, totals, shares per (lang, source) cell") {
    val docs = Seq(
      (1L, "alpha beta", "en", "s1", 10L),
      (2L, "alpha beta", "en", "s1", 10L),   // exact dup of 1
      (3L, "  ALPHA BETA ", "en", "s1", 13L), // same content key (trim+lower)
      (4L, "gamma", "en", "s2", 5L),
      (5L, "delta eps zeta", "fr", "s1", 14L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = Profile.datacard(docs)
      .as[(String, String, Long, Long, Long, Long, Double, Double)]
      .collect().map(r => (r._1, r._2) -> r).toMap
    // (en, s1): 3 docs, ONE distinct content, 33 chars, 2+2+5 tokens
    // (space-split keeps empty fields: doc 3's padding makes 5)
    assert(got(("en", "s1")) ==
      (("en", "s1", 3L, 1L, 33L, 9L, 11.0, 0.6)))
    assert(got(("en", "s2")) == (("en", "s2", 1L, 1L, 5L, 1L, 5.0, 0.2)))
    assert(got(("fr", "s1")) == (("fr", "s1", 1L, 1L, 14L, 3L, 14.0, 0.2)))
    // shares partition the corpus
    assert(got.values.map(_._8).sum == 1.0)
  }

  test("datacard is invariant to input partitioning") {
    val docs = (1L to 40L).map(i =>
      (i, s"w$i x y", if (i % 2 == 0) "en" else "fr", s"s${i % 3}", i))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    assert(Profile.datacard(docs.repartition(7)).collect().toSeq ==
      Profile.datacard(docs).collect().toSeq)
  }
}
