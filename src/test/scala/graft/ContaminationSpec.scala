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
}
