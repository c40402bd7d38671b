package graft

import graft.functions.SubstringDedup

/** Exact-substring dedup ([[graft.functions.SubstringDedup]]) — span
  * semantics the sf oracle data can't pin: exact window boundaries,
  * overlapping-window coverage, within-doc-only repetition, and the
  * shorter-than-L guard. Oracle parity at sf is `dedup_substring`. */
class SubstringDedupSpec extends SparkSpec {
  import spark.implicits._

  private def stats(texts: Seq[String], l: Int): Map[Long, (Int, Long)] =
    SubstringDedup.dupSpanStats(
        texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text"),
        l)
      .as[(Long, Int, Long)].collect()
      .map { case (id, n, d) => id -> (n, d) }.toMap

  test("a shared L-token run marks exactly its span in both docs") {
    // docs 0 and 1 share tokens c..f (4 tokens); the rest is unique
    val got = stats(Seq("a b c d e f g", "x y c d e f z w"), l = 4)
    assert(got(0L) == (7, 4L)) // positions of c d e f
    assert(got(1L) == (8, 4L))
    assert(!got.contains(2L)) // no third doc in the fixture
  }

  test("overlapping duplicate windows count each position once") {
    // 6 shared tokens with l=4 → three overlapping windows, 6 covered
    val got = stats(Seq("p q c d e f g h r", "c d e f g h"), l = 4)
    assert(got(0L) == (9, 6L))
    assert(got(1L) == (6, 6L))
  }

  test("repetition WITHIN one doc does not mark spans (cross-doc only)") {
    val got = stats(Seq("a b c d a b c d", "u v w x y z q r"), l = 4)
    assert(got(0L) == (8, 0L))
    assert(got(1L) == (8, 0L))
  }

  test("docs shorter than the gram length report zero") {
    val got = stats(Seq("a b c", "a b c", "a b c d"), l = 4)
    assert(got(0L) == (3, 0L) && got(1L) == (3, 0L))
    assert(got(2L) == (4, 0L)) // its one 4-gram appears nowhere else
  }

  test("identical docs are fully covered") {
    val t = "m n o p q r s"
    val got = stats(Seq(t, t), l = 4)
    assert(got(0L) == (7, 7L) && got(1L) == (7, 7L))
  }

  private def removed(texts: Seq[String], l: Int): Map[Long, (Int, Int, String)] =
    SubstringDedup.dedupSpansRemoved(
        texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text"),
        l)
      .as[(Long, Int, Int, String)].collect()
      .map { case (id, n, k, t) => id -> (n, k, t) }.toMap

  test("span removal keeps the canonical owner intact, cuts the copy") {
    val got = removed(Seq("a b c d e f g", "x y c d e f z w"), l = 4)
    assert(got(0L) == (7, 7, "a b c d e f g")) // owner: untouched
    assert(got(1L) == (8, 4, "x y z w"))       // copy: span cut
  }

  test("identical docs: first survives verbatim, second empties") {
    val t = "m n o p q r s"
    val got = removed(Seq(t, t), l = 4)
    assert(got(0L) == (7, 7, t))
    assert(got(1L) == (7, 0, ""))
  }

  test("overlapping grams with different owners cannot mutilate an owned span") {
    // gram "a b" is owned by doc1, gram "q a" by doc0. doc1's copy of
    // "q a" overlaps its OWNED "a b" span: only the non-overlapping 'q'
    // may be cut — without the owner exemption, "a b" would survive
    // verbatim in NO document (doc1 cut to "p b", doc2 emptied).
    val got = removed(Seq("q a", "p q a b", "a b"), l = 2)
    assert(got(0L) == (2, 2, "q a"))   // owner of "q a": untouched
    assert(got(1L) == (4, 3, "p a b")) // owned "a b" span survives verbatim
    assert(got(2L) == (2, 0, ""))      // the non-owner copy of "a b" cuts
  }

  test("span removal leaves dup-free corpora untouched") {
    val texts = Seq("a b c d e", "f g h i j")
    val got = removed(texts, l = 4)
    assert(got(0L) == (5, 5, texts(0)) && got(1L) == (5, 5, texts(1)))
  }

  test("topRepeated: doc-count-first ordering, cross-doc only, within-doc occurrences summed") {
    // "c d e" appears in docs 0,1,2 (once each) = 3 docs / 3 occurrences;
    // "x y z" in docs 3,4 but TWICE in doc 3 = 2 docs / 3 occurrences;
    // "q r s" only repeats inside doc 5 — must not appear at all
    val docs = Seq(
      (0L, "a c d e b"), (1L, "c d e f g"), (2L, "h c d e i"),
      (3L, "x y z m x y z"), (4L, "x y z n o"),
      (5L, "q r s t q r s")).toDF("doc_id", "text")
    val got = SubstringDedup.topRepeated(docs, l = 3, k = 10)
      .as[(String, Long, Long)].collect().toSeq
    assert(got.head == (("c d e", 3L, 3L)), s"head was ${got.head}")
    assert(got.contains(("x y z", 2L, 3L)))
    assert(!got.exists(_._1 == "q r s"), "within-doc repeat leaked into the report")
    // every reported gram spans >= 2 docs, and ordering is (docs, occ, gram)
    assert(got.forall(_._2 >= 2))
    val key = got.map(g => (-g._2, -g._3, g._1))
    assert(key == key.sorted, s"ordering violated: $got")
  }

  test("topRepeated: k cuts deterministically and short docs are excluded") {
    val docs = Seq(
      (0L, "a b c d"), (1L, "a b c e"), // share "a b c"
      (2L, "p q r s"), (3L, "p q r t"), // share "p q r"
      (4L, "u v"), (5L, "u v")          // too short for l=3
    ).toDF("doc_id", "text")
    val all = SubstringDedup.topRepeated(docs, l = 3, k = 10)
      .as[(String, Long, Long)].collect().toSeq
    assert(all.map(_._1) == Seq("a b c", "p q r"), s"got $all") // tie → gram asc
    val one = SubstringDedup.topRepeated(docs, l = 3, k = 1)
      .as[(String, Long, Long)].collect().toSeq
    assert(one.map(_._1) == Seq("a b c"))
  }
}
