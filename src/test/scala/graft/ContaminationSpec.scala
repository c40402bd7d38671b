package graft

import org.apache.spark.sql.functions._
import graft.functions.{Contamination, Text}

/** Decontamination overlap report + intra-doc repetition score. */
class ContaminationSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog"),
    (1L, "the quick brown fox jumps over a sleeping cat"),
    (2L, "completely different words in this one here now"),
    (3L, "spam spam spam spam spam spam")
  ).toDF("doc_id", "text")

  test("contamination report: self-overlap 1.0, partial overlap, clean docs absent") {
    val bench = docs.filter(col("doc_id") === 0)
    val got = Contamination.report(docs, bench, w = 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getDouble(3))).toMap
    // the bench doc itself: every shingle shared
    assert(got(0L)._2 == 1.0)
    // doc 1 shares the 4 leading shingles of "the quick brown fox jumps over"
    assert(got(1L)._1 == 4L)
    // docs 2 and 3 share nothing -> filtered out
    assert(!got.contains(2L) && !got.contains(3L))
  }

  test("repetition score: looped doc ~1.0, varied doc at 1/n_grams") {
    val got = Text.repetitionScore(docs, w = 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    // "spam spam" x5 identical bigrams out of 5 -> share 1.0
    assert(got(3L) == ((5L, 5L, 1.0)))
    // doc 0 has a repeated "the" but no repeated bigram -> 1/8
    assert(got(0L)._1 == 1L && got(0L)._2 == 8L)
  }

  test("removeContaminatedSpans: surgical cut, pass-through, overlap merge") {
    import graft.functions.Contamination
    val bench = Seq((100L, "the quick brown fox jumps")).toDF("doc_id", "text")
    val train = Seq(
      // contaminated mid-doc: the 5-gram sits at positions 3..7
      (1L, "intro words the quick brown fox jumps and then more tail"),
      // two OVERLAPPING contaminated windows (6-token run) cut once each
      (2L, "x the quick brown fox jumps quick brown fox jumps y"),
      // clean doc passes through byte-identical
      (3L, "completely unrelated prose about spark plans"),
      // shorter than l -> no grams, passes through
      (4L, "tiny doc")
    ).toDF("doc_id", "text")
    val got = Contamination.removeContaminatedSpans(train, bench, l = 5)
      .orderBy(col("doc_id"))
      .as[(Long, Int, Int, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(1L) == ((11, 6, "intro words and then more tail")))
    // doc 2: "quick brown fox jumps quick brown fox jumps" has bench
    // 5-grams at pos 2 ("the quick brown fox jumps") only — the second
    // run lacks the leading "the", so only positions 2..6 cut
    assert(got(2L) == ((11, 6, "x quick brown fox jumps y")))
    assert(got(3L) == ((6, 6, "completely unrelated prose about spark plans")))
    assert(got(4L) == ((2, 2, "tiny doc")))
    // a doc made ENTIRELY of benchmark text empties out
    val all = Contamination.removeContaminatedSpans(
      Seq((9L, "the quick brown fox jumps")).toDF("doc_id", "text"), bench, l = 5)
      .as[(Long, Int, Int, String)].head()
    assert(all == ((9L, 5, 0, "")))
  }
}
