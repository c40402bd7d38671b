package graft

import org.apache.spark.sql.functions._
import graft.functions.{Dedup, NearDup, Similarity, Text}
import graft.operators.{Frame, Grouped, Sessions}
import Frame._

/** Empty-input behavior: every operator must return an empty result of the
  * right schema, never throw (the reference explicitly short-circuits the
  * empty groupby, `groupby.d:33`; a pipeline stage receiving an empty
  * partition filter result is routine at scale). */
class EmptyInputSpec extends SparkSpec {
  import spark.implicits._

  private lazy val noDocs =
    Seq.empty[(Long, String)].toDF("doc_id", "text")
  private lazy val noRows =
    Seq.empty[(String, Int, Double)].toDF("k", "i", "d")
  private lazy val noVecs =
    Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
  private lazy val noEvents = Seq.empty[Ev].toDF()

  test("core verbs on empty frames") {
    assert(noRows.filterCmp("i", ">", 0).count() == 0)
    assert(noRows.sortAll().count() == 0)
    assert(noRows.distinctSorted().count() == 0)
    assert(Frame.concat(Seq(noRows, noRows)).count() == 0)
    assert(noRows.headN(5).count() == 0)
  }

  test("grouped aggregates on empty frames (reference groupby.d:33 short-circuit)") {
    assert(Grouped.count(noRows, Seq("k")).count() == 0)
    assert(Grouped.sumNumeric(noRows, Seq("k")).count() == 0)
    assert(Grouped.firstRows(noRows, Seq("k"), Seq("i")).count() == 0)
  }

  test("text + dedup operators on an empty corpus") {
    assert(Text.textStats(noDocs).count() == 0)
    assert(Text.langId(noDocs.withColumn("lang", lit("en"))).count() == 0)
    assert(Text.repetitionScore(noDocs).count() == 0)
    assert(Dedup.exactGroups(noDocs).count() == 0)
    assert(NearDup.ngramJaccardPairs(noDocs, 0.5).count() == 0)
    assert(NearDup.minhashPairs(noDocs).count() == 0)
    assert(NearDup.simhashPairs(noDocs).count() == 0)
  }

  test("contamination report on empty corpus / empty benchmark") {
    val docs = Seq((0L, "a b c d")).toDF("doc_id", "text")
    assert(graft.functions.Contamination.report(noDocs, docs).count() == 0)
    assert(graft.functions.Contamination.report(docs, noDocs).count() == 0)
  }

  test("similarity search on an empty corpus / empty query set") {
    val e = Tables.embeddings(spark, sf0001).limit(20)
    assert(Similarity.bruteForceTopK(noVecs, noVecs, "vec_id", "embedding", 5).count() == 0)
    assert(Similarity.bruteForceTopK(e, e.limit(0), "vec_id", "embedding", 5).count() == 0)
    assert(Similarity.lshTopK(e, e.limit(0), "vec_id", "embedding", 5).count() == 0)
    assert(Similarity.embeddingNearDups(noVecs, "vec_id", "embedding", 0.9).count() == 0)
  }

  test("sessionize on an empty event stream") {
    assert(Sessions.sessionize(noEvents.withColumn("value", lit(0.0))
      .select("event_id", "ts", "user_id", "value")).count() == 0)
  }
}
