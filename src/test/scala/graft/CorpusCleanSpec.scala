package graft

import org.apache.spark.sql.functions._
import graft.functions.{Contamination, CorpusClean, Dedup, NearDup}

/** Corpus-cleaning composition: the survivor set must honor each of the
  * four criteria it is built from (full value parity vs DuckDB is the
  * `corpus_clean` oracle's job; this pins the set algebra). */
class CorpusCleanSpec extends SparkSpec {

  test("survivors honor quality, keeper, near-dup, and contamination criteria") {
    val docs = Tables.documents(spark, sf0001)
    val bench = docs.filter(col("doc_id") < 10)
    val out = CorpusClean.surviving(docs, bench).collect()
    val ids = out.map(_.getLong(0)).toSet
    assert(ids.nonEmpty, "cleaning must not empty the corpus")
    assert(out.forall(_.getDouble(1) >= 0.3), "a low-quality doc survived")
    val keepers = Dedup.exactGroups(docs)
      .select(col("keep_id")).collect().map(_.getLong(0)).toSet
    assert(ids.subsetOf(keepers), "a non-keeper exact duplicate survived")
    val ndDrop = NearDup.ngramJaccardPairs(docs, 0.5)
      .select(col("id_b")).collect().map(_.getLong(0)).toSet
    assert(ids.intersect(ndDrop).isEmpty, "a near-dup id_b survived")
    val contam = Contamination.report(docs, bench)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(ids.intersect(contam).isEmpty, "a contaminated doc survived")
  }
}
