package graft

import java.security.MessageDigest

import org.apache.spark.sql.functions._
import graft.functions.Retrieval

/** Hybrid retrieval ([[graft.functions.Retrieval.hashedCosineTopK]] /
  * [[Retrieval.rrfFuse]] / [[Retrieval.hybridTopK]]): the hashed-cosine
  * leg against a driver-side reference, RRF fusion against hand-computed
  * scores (including single-leg documents), and partition-invariance of
  * the composed pipeline. Oracle parity at sf is `retrieval_hybrid` in
  * CORRECTNESS. */
class HybridRetrievalSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "table scan and table join"),
    (2L, "fast table scan"),
    (3L, "hash join order"),
    (4L, "customer order entry"),
    (5L, "vector stream hash hash")
  ).toDF("doc_id", "text")

  private val queries = Seq((1, "table scan"), (2, "hash hash order"))
    .toDF("query_id", "qtext")

  /** Driver-side reference: md5-prefix feature counts + cosine. */
  private def refCosine(text: String, qtext: String): Double = {
    def vec(s: String): Map[String, Int] =
      s.split(" ", -1).toSeq
        .map { t =>
          MessageDigest.getInstance("MD5").digest(t.getBytes("UTF-8"))
            .take(1).map("%02x".format(_)).mkString
        }
        .groupBy(identity).map { case (k, v) => k -> v.size }
    val (d, q) = (vec(text), vec(qtext))
    val dot = d.keySet.intersect(q.keySet).toSeq.map(f => d(f).toLong * q(f)).sum
    val nd = math.sqrt(d.values.map(c => c.toLong * c).sum.toDouble)
    val nq = math.sqrt(q.values.map(c => c.toLong * c).sum.toDouble)
    dot.toDouble / (nd * nq)
  }

  test("hashedCosineTopK equals the driver-side cosine reference") {
    val got = Retrieval.hashedCosineTopK(docs, queries, k = 5)
      .as[(Int, Long, Double, Int)].collect()
    val docMap = docs.as[(Long, String)].collect().toMap
    val qMap = queries.as[(Int, String)].collect().toMap
    for ((qid, did, sim, _) <- got)
      assert(sim === refCosine(docMap(did), qMap(qid)),
        s"cosine mismatch for q$qid d$did")
    // ranks are (sim desc, doc_id) per query
    val byQ = got.groupBy(_._1).values
    for (g <- byQ) {
      val sorted = g.sortBy { case (_, did, sim, _) => (-sim, did) }.map(_._4)
      assert(sorted.toSeq === (1 to g.length))
    }
  }

  test("rrfFuse hand-computed scores, including single-leg docs") {
    val a = Seq((1, 10L, 1), (1, 11L, 2)).toDF("query_id", "doc_id", "rank")
    val b = Seq((1, 11L, 1), (1, 12L, 2)).toDF("query_id", "doc_id", "rank")
    val got = Retrieval.rrfFuse(a, b, k = 10)
      .select(col("doc_id"), col("rrf")).as[(Long, Double)].collect().toMap
    assert(got(11L) === 1.0 / 62 + 1.0 / 61) // both legs
    assert(got(10L) === 1.0 / 61)            // dense only
    assert(got(12L) === 1.0 / 62)            // sparse only
    // doc 11 (two legs) must outrank both single-leg docs
    val rank = Retrieval.rrfFuse(a, b, k = 10)
      .select(col("doc_id"), col("rank")).as[(Long, Int)].collect().toMap
    assert(rank(11L) === 1)
  }

  test("hybridTopK is deterministic across partitionings") {
    val base = Retrieval.hybridTopK(docs, queries, k = 3).collect().toSeq
    val repart = Retrieval.hybridTopK(
      docs.repartition(7), queries, k = 3).collect().toSeq
    assert(base === repart)
    assert(base.nonEmpty)
  }
}
