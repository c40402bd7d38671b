package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.Retrieval

/** [[graft.functions.Retrieval.bm25TopK]] — BM25 sparse retrieval. */
class RetrievalSpec extends SparkSpec {

  private def docs(rows: (Long, String)*): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }
  private def qs(rows: (Int, String)*): DataFrame = {
    import spark.implicits._
    rows.toDF("query_id", "qtext")
  }

  test("higher tf ranks first; only matching docs appear") {
    val out = Retrieval.bm25TopK(
      docs(
        1L -> "cat cat cat dog",
        2L -> "cat dog bird",
        3L -> "bird bird bird"),
      qs(1 -> "cat"), k = 5).collect()
    assert(out.map(_.getLong(1)).toSeq === Seq(1L, 2L)) // doc 3 no match
    assert(out.map(_.getInt(3)).toSeq === Seq(1, 2))
    assert(out(0).getDouble(2) > out(1).getDouble(2))
  }

  test("rare term outweighs common term at equal tf (idf ordering)") {
    // "rare" in 1 of 4 docs, "common" in all 4
    val c = docs(
      1L -> "rare x y z",
      2L -> "common x y z",
      3L -> "common p q r",
      4L -> "common common p q") // doc 4 matches twice but common is cheap
    val out = Retrieval.bm25TopK(c.withColumn("text", concat(col("text"), lit(" common"))),
      qs(1 -> "rare common"), k = 4).collect()
    // doc 1 has rare (idf (4-1+.5)/(1+.5)=2.33…) + common; others common only
    assert(out.head.getLong(1) === 1L)
  }

  test("length normalization: same tf, shorter doc scores higher") {
    val out = Retrieval.bm25TopK(
      docs(1L -> "cat a", 2L -> "cat a b c d e f g h"),
      qs(1 -> "cat"), k = 2).collect()
    assert(out.map(_.getLong(1)).toSeq === Seq(1L, 2L))
  }

  test("two-stage top-k equals the single-window definition") {
    val corpus = docs((1L to 60L).map(i =>
      i -> s"term${i % 7} filler${i % 3} x${i}"): _*)
    val queries = qs(1 -> "term0 term1", 2 -> "term2 filler1")
    val twoStage = Retrieval.bm25TopK(corpus, queries, k = 5, buckets = 4)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    val oneStage = Retrieval.bm25TopK(corpus, queries, k = 5, buckets = 1)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    assert(twoStage.toSeq === oneStage.toSeq)
  }

  test("deterministic across partitionings") {
    val rows = (1L to 40L).map(i => i -> s"w${i % 5} w${i % 11} pad")
    val a = Retrieval.bm25TopK(docs(rows: _*).repartition(1), qs(1 -> "w0 w3"), k = 10)
      .collect().map(_.toSeq)
    val b = Retrieval.bm25TopK(docs(rows: _*).repartition(13), qs(1 -> "w0 w3"), k = 10)
      .collect().map(_.toSeq)
    assert(a.toSeq === b.toSeq)
  }

  test("ties broken by doc_id ascending") {
    val out = Retrieval.bm25TopK(
      docs(5L -> "cat a b", 3L -> "cat a b", 9L -> "cat a b"),
      qs(1 -> "cat"), k = 3).collect()
    assert(out.map(_.getLong(1)).toSeq === Seq(3L, 5L, 9L))
    assert(out.map(_.getDouble(2)).distinct.length === 1)
  }
}
