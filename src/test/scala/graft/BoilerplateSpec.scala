package graft

import org.apache.spark.sql.functions._
import graft.functions.Boilerplate

/** [[graft.functions.Boilerplate]] — cross-document line removal. */
class BoilerplateSpec extends SparkSpec {

  private def corpus(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  // "HDR" in 3 docs, "FTR" in 2, bodies unique
  private def sample = corpus(
    1L -> "HDR\nbody one\nFTR",
    2L -> "HDR\nbody two\nFTR",
    3L -> "HDR\nbody three",
    4L -> "body four")

  test("lines in >= minDocs distinct docs are cut everywhere, others survive") {
    val out = Boilerplate.removeDupLines(sample, minDocs = 3L)
      .orderBy(col("doc_id")).collect()
    assert(out.map(_.getString(1)).toSeq ===
      Seq("body one\nFTR", "body two\nFTR", "body three", "body four"))
    assert(out.map(_.getLong(2)).toSeq === Seq(1L, 1L, 1L, 0L))
  }

  test("minDocs boundary: a line in exactly minDocs docs is boilerplate") {
    val out = Boilerplate.removeDupLines(sample, minDocs = 2L)
      .orderBy(col("doc_id")).collect()
    // HDR (3 docs) and FTR (2 docs) both go
    assert(out.map(_.getString(1)).toSeq ===
      Seq("body one", "body two", "body three", "body four"))
  }

  test("in-doc repetition does not make a line boilerplate") {
    val out = Boilerplate.removeDupLines(
      corpus(1L -> "same\nsame\nsame", 2L -> "other"), minDocs = 2L)
      .orderBy(col("doc_id")).collect()
    assert(out.map(_.getString(1)).toSeq === Seq("same\nsame\nsame", "other"))
    assert(out.map(_.getLong(2)).toSeq === Seq(0L, 0L))
  }

  test("in-doc multiplicity of a boilerplate line is counted and cut fully") {
    val out = Boilerplate.removeDupLines(
      corpus(1L -> "ad\nbody\nad", 2L -> "ad\nmore", 3L -> "unrelated"),
      minDocs = 2L)
      .orderBy(col("doc_id")).collect()
    assert(out.map(_.getString(1)).toSeq === Seq("body", "more", "unrelated"))
    assert(out.map(_.getLong(2)).toSeq === Seq(2L, 1L, 0L))
  }

  test("empty lines are structure: never boilerplate, always survive") {
    val out = Boilerplate.removeDupLines(
      corpus(1L -> "a\n\nb", 2L -> "c\n\nd", 3L -> "e\n\nf"), minDocs = 2L)
      .orderBy(col("doc_id")).collect()
    assert(out.map(_.getString(1)).toSeq === Seq("a\n\nb", "c\n\nd", "e\n\nf"))
  }

  test("lineFrequencies counts distinct docs, not occurrences") {
    val freq = Boilerplate.lineFrequencies(
      corpus(1L -> "x\nx\ny", 2L -> "x"))
      .orderBy(col("line")).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(freq === Seq("x" -> 2L, "y" -> 1L))
  }

  test("lineFrequencies excludes empty lines, agreeing with the removal face") {
    // blank separator lines sit in every doc; a report topped by "" that
    // removeDupLines will never cut would mislead threshold tuning
    val freq = Boilerplate.lineFrequencies(
      corpus(1L -> "a\n\nb", 2L -> "c\n\nd", 3L -> "e\n\nf"))
      .collect().map(_.getString(0)).toSeq
    assert(!freq.contains(""), s"empty line leaked into the report: $freq")
  }

  test("extra columns pass through unchanged") {
    import spark.implicits._
    val df = Seq((1L, "HDR\na", "en"), (2L, "HDR\nb", "fr"), (3L, "HDR\nc", "de"))
      .toDF("doc_id", "text", "lang")
    val out = Boilerplate.removeDupLines(df, minDocs = 3L)
      .orderBy(col("doc_id")).collect()
    assert(out.map(_.getString(2)).toSeq === Seq("en", "fr", "de"))
    assert(out.map(_.getString(1)).toSeq === Seq("a", "b", "c"))
  }

  // ---- dedupLinesWithinDoc (intra-document first-occurrence filter) ----

  test("intra-doc: later repeats go, first occurrence and order survive") {
    val out = Boilerplate.dedupLinesWithinDoc(
      corpus(1L -> "a\nb\na\nc\nb\na", 2L -> "x\ny"))
      .orderBy(col("doc_id")).collect()
    assert(out.map(_.getString(1)).toSeq === Seq("a\nb\nc", "x\ny"))
    assert(out.map(_.getLong(2)).toSeq === Seq(3L, 0L))
  }

  test("intra-doc: empty lines always survive, even repeated") {
    val out = Boilerplate.dedupLinesWithinDoc(
      corpus(1L -> "a\n\nb\n\na"))
      .orderBy(col("doc_id")).collect()
    assert(out.map(_.getString(1)).toSeq === Seq("a\n\nb\n"))
    assert(out.map(_.getLong(2)).toSeq === Seq(1L))
  }

  test("intra-doc: cross-document repetition is NOT touched") {
    val out = Boilerplate.dedupLinesWithinDoc(
      corpus(1L -> "same\nbody1", 2L -> "same\nbody2"))
      .orderBy(col("doc_id")).collect()
    assert(out.map(_.getString(1)).toSeq === Seq("same\nbody1", "same\nbody2"))
  }

  test("intra-doc: composes with removeDupLines for the full hygiene pass") {
    // "HDR" is cross-doc boilerplate; doc 1 also stutters its own body
    val cleaned = Boilerplate.removeDupLines(
      Boilerplate.dedupLinesWithinDoc(
        corpus(1L -> "HDR\nbody\nbody", 2L -> "HDR\nother", 3L -> "HDR\nthird"))
        .drop("n_removed"),
      minDocs = 3L)
      .orderBy(col("doc_id")).collect()
    assert(cleaned.map(_.getString(1)).toSeq === Seq("body", "other", "third"))
  }
}
