package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Sparse (keyword) retrieval — the BM25 face of "similarity search".
  * Dense ANN ([[Similarity]], [[Ivf]], [[Pq]]) answers "what is
  * semantically near this embedding"; a training-data pipeline equally
  * needs "which documents mention these terms" — targeted decontamination
  * sweeps, corpus QA ("show me docs about X"), and hybrid retrieval all
  * start from an inverted-index score. This is the Okapi BM25 ranking
  * function (Robertson & Walker 1994) over whitespace tokens.
  *
  * Bit-reproducibility (the engine's oracle contract): two deviations
  * from the textbook form, both documented and rank-preserving:
  *
  *   - idf is the LOG-FREE rational form `(N - df + 0.5) / (df + 0.5)` —
  *     the argument of the standard `ln(...)` idf, without the `ln`.
  *     `ln` is strictly monotone, so per-term score ORDER is unchanged;
  *     dropping it removes the one transcendental whose last-ulp varies
  *     across libm implementations (same trick as
  *     [[Text.tfidfTopTerms]]).
  *   - the per-document score sums its per-term partials as
  *     `DECIMAL(28,10)` — decimal addition is EXACT and therefore
  *     order-invariant, where a double sum would depend on Spark's
  *     partition merge order and could diverge from any re-computation
  *     (including the oracle's). Each partial is a pure IEEE-double
  *     expression (exactly-rounded ops in a fixed parenthesization), so
  *     partials are bit-identical across engines; no double can sit
  *     exactly on a decimal rounding boundary at scale 10 (that would
  *     need a 5·10⁻¹¹-denominator dyadic rational), so the cast is
  *     unambiguous too.
  *
  * Scale shape (100 TB): postings are filtered to QUERY terms by a
  * broadcast join before any aggregation, so the shuffled state is
  * O(docs containing a query term), not O(corpus vocabulary); corpus
  * statistics (N, Σdl) are a one-row aggregate broadcast back; df comes
  * from a vocabulary-sized aggregate pruned to query terms. Top-k is
  * TWO-STAGE — per-(query, doc-hash-bucket) top-k first, then top-k of
  * the ≤ 32k survivors — so no single window partition ever holds a
  * whole query's posting list (the classic single-stage
  * `Window.partitionBy(query)` skew).
  */
object Retrieval {

  /** Top-`k` documents per query under BM25 (rational-idf form).
    *
    * @param docs    corpus with `idCol` (integral) and `textCol`
    * @param queries (query_id, qtext) — one row per query; terms are the
    *                whitespace tokens of `qtext`, deduplicated (query
    *                term frequency is ignored, the common BM25 practice)
    * @return (query_id, doc_id, score, rank) — rank 1..k per query by
    *         (score desc, doc_id asc); only docs matching ≥1 term appear.
    */
  def bm25TopK(
      docs: DataFrame,
      queries: DataFrame,
      k: Int,
      k1: Double = 1.2,
      b: Double = 0.75,
      textCol: String = "text",
      idCol: String = "doc_id",
      buckets: Int = 32
  ): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(k1 > 0 && b >= 0 && b <= 1, s"bad BM25 params k1=$k1 b=$b")
    require(buckets > 0, s"buckets must be positive, got $buckets")

    val toks = docs.select(col(idCol).as("doc_id"),
      split(col(textCol), " ").as("_t"))
    val dl = toks.select(col("doc_id"), size(col("_t")).as("dl"))
    // dl rides along with every posting (8 bytes/row in the pruned match
    // set) so no separate doc-length join — that join would re-shuffle
    // both sides on doc_id for a value already in hand at explode time.
    val post = toks.select(col("doc_id"), size(col("_t")).as("dl"),
      explode(col("_t")).as("term"))

    val qterms = queries.select(col("query_id"),
      explode(array_distinct(split(col("qtext"), " "))).as("term"))

    // Postings restricted to query terms FIRST (broadcast SEMI join: the
    // build side needs no dedup exchange — semi-join semantics ignore
    // build-side duplicates): everything downstream is sized by the match
    // set, not the corpus.
    val matched = post.join(broadcast(qterms.select("term")),
      Seq("term"), "left_semi")
    // tf is consumed twice (df derivation + scoring) — persisted so the
    // corpus tokenize/explode runs ONCE and df keeps map-side partial
    // aggregation over the cache (a window partitioned by term would be
    // the compact alternative but piles each term's whole posting list
    // into one task — a skew bomb the moment a query contains a stopword).
    val tf = matched.groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"), max(col("dl")).as("dl"))
      .persist()
    // df MUST count docs over the full corpus, and tf holds exactly one
    // row per matched (doc, term) — so df is a count over the tf table
    // (no second distinct+aggregate pass over the raw postings).
    val dfT = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val stats = dl.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))

    val tfD = col("tf").cast("double")
    val idf = ((col("n_docs") - col("df")).cast("double") + lit(0.5)) /
      (col("df").cast("double") + lit(0.5))
    val avgdl = col("sum_dl").cast("double") / col("n_docs").cast("double")
    val den = tfD + lit(k1) * (lit(1.0 - b) + (lit(b) * col("dl").cast("double")) / avgdl)
    val partial = idf * ((tfD * lit(k1 + 1.0)) / den)

    val scored = tf
      .join(broadcast(qterms), "term")
      .join(broadcast(dfT), "term")
      .crossJoin(broadcast(stats))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(partial.cast(DecimalType(28, 10))).as("_sdec"))

    // Two-stage exact top-k: stage 1 bounds every window partition by the
    // doc-hash bucket; the global top-k is a subset of the per-bucket
    // top-ks, so stage 2 over ≤ buckets·k rows/query is exact.
    val w1 = Window
      .partitionBy(col("query_id"), pmod(col("doc_id"), lit(buckets.toLong)))
      .orderBy(col("_sdec").desc, col("doc_id"))
    val w2 = Window.partitionBy(col("query_id"))
      .orderBy(col("_sdec").desc, col("doc_id"))
    val result = scored
      .withColumn("_rb", row_number().over(w1)).filter(col("_rb") <= k)
      .withColumn("rank", row_number().over(w2)).filter(col("rank") <= k)
      .select(col("query_id"), col("doc_id"),
        col("_sdec").cast("double").as("score"), col("rank"))
      .orderBy(col("query_id"), col("rank"))
    graft.AutoUnpersist.afterFirstUse(result, tf)
  }
}
