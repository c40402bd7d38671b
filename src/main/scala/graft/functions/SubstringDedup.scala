package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact-substring deduplication (Lee et al. 2022, arXiv:2107.06499,
  * "Deduplicating Training Data Makes Language Models Better") — the
  * span-level member of the dedup family: instead of scoring whole
  * documents (exact hash, MinHash, SimHash, n-gram Jaccard, embeddings),
  * find the TOKEN SPANS that are repeated verbatim across documents. Any
  * shared substring of ≥ L tokens contains a shared L-token window, so
  * windowed L-grams (stride 1) detect exactly the ≥L-token duplications
  * the paper removes — the Spark-native equivalent of its suffix-array
  * pass, built from the operations a cluster does well: explode, hash,
  * aggregate, equi-join.
  *
  * Scale shape: the gram stream is n_tokens rows per doc (stride 1), each
  * carried as an 8-byte `xxhash64` — never the gram text — so the shuffle
  * is ~8·n_tokens bytes per doc; cross-doc repetition is `min(doc) ≠
  * max(doc)` per gram (one partial-agg pass, no distinct expansion);
  * coverage re-joins only the DUPLICATED grams (dup-span-sized, not
  * corpus-sized) back to positions. No driver state, no windows over the
  * corpus, equality shuffles only. 64-bit gram collisions are the
  * standard trade (the paper's hash pass makes it too); a collision can
  * only over-mark ~L tokens.
  */
object SubstringDedup {

  /** Per-document duplicated-span stats: `n_tokens`, and `n_dup_tokens` =
    * how many of the doc's token positions sit inside an L-token window
    * that appears verbatim in ANOTHER document. `n_dup_tokens / n_tokens`
    * is the cut ratio a Lee-style cleaning pass would remove. Docs shorter
    * than L tokens can't participate and report 0. */
  /** The REMOVE pass: re-materialize each document with its duplicated
    * spans cut, keeping each span only in its canonical OWNER — the
    * minimum doc_id that contains the gram (so one copy always survives,
    * the paper's all-but-one semantics). A token position is dropped iff
    * some cross-doc-repeated L-gram covers it whose owner is another doc.
    * Output: (doc_id, n_tokens, n_kept, clean_text).
    *
    * Same shuffle shape as [[dupSpanStats]] plus one tiny change: the dup
    * table carries the per-gram min doc (already computed by the same
    * aggregate). The text rebuild sorts each doc's KEPT positions — a
    * per-doc array fold, no window over the stream. */
  /** The (doc_id, pos, _h) l-gram hash stream every span operator here
    * (and [[Contamination.removeContaminatedSpans]]) starts from — ONE
    * definition so a change to gram hashing or the length guard cannot
    * silently diverge between the operators. */
  private[functions] def gramStream(docs: DataFrame, l: Int): DataFrame =
    docs
      .select(col("doc_id"), Text.tokens(col("text")).as("_t"))
      .withColumn("_n", size(col("_t")))
      .filter(col("_n") >= l)
      .select(col("doc_id"), col("_t"),
        explode(sequence(lit(1), col("_n") - l + 1)).as("pos"))
      .select(col("doc_id"), col("pos"),
        xxhash64(array_join(slice(col("_t"), col("pos"), lit(l)), " ")).as("_h"))

  def dedupSpansRemoved(docs: DataFrame, l: Int = 8): DataFrame = {
    require(l > 1, s"gram length must exceed 1 token, got $l")
    val base = docs
      .select(col("doc_id"), Text.tokens(col("text")).as("_t"))
      .withColumn("_n", size(col("_t")))
    val grams = gramStream(docs, l)
    val dupOwned = grams.groupBy(col("_h"))
      .agg(min(col("doc_id")).as("_owner"), max(col("doc_id")).as("_hi"))
      .filter(col("_owner") =!= col("_hi"))
      .select(col("_h"), col("_owner"))
    // positions covered by a dup gram owned ELSEWHERE...
    val cutRaw = grams.join(dupOwned, Seq("_h"))
      .filter(col("doc_id") =!= col("_owner"))
      .select(col("doc_id"),
        explode(sequence(col("pos"), col("pos") + l - 1)).as("_p"))
    // ...EXEMPTING positions under a gram this doc OWNS: without the
    // exemption, an overlapping dup gram with a different owner could cut
    // into the owner's protected span and the duplicated text would
    // survive verbatim NOWHERE — the exemption is what makes the
    // documented all-but-one guarantee actually hold. (collect_set
    // dedups, so no distinct pre-pass — one shuffle, not two.)
    val ownedPos = grams.join(dupOwned, Seq("_h"))
      .filter(col("doc_id") === col("_owner"))
      .select(col("doc_id"),
        explode(sequence(col("pos"), col("pos") + l - 1)).as("_p"))
    val removed = cutRaw
      .join(ownedPos, Seq("doc_id", "_p"), "left_anti")
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_set(col("_p"))).as("_cut"))
    base
      .join(removed, Seq("doc_id"), "left")
      .select(col("doc_id"), col("_n").as("n_tokens"),
        (col("_n") - coalesce(size(col("_cut")), lit(0))).as("n_kept"),
        // O(n + |cut|) sorted-merge rebuild — the cut array is already
        // sort_array-sorted; an array_contains scan per token position
        // would be O(n·|cut|), worst-quadratic on a long heavily-
        // duplicated document (one straggler task at 100 TB)
        array_join(
          graft.plans.DropSortedPositions.dropSortedPositions(col("_t"),
            coalesce(col("_cut"), array().cast("array<int>"))),
          " ").as("clean_text"))
  }

  /** Memorization-risk audit: the `k` L-gram spans repeated verbatim in
    * the MOST DOCUMENTS, with their text — "what's the most duplicated
    * passage in my corpus" is the first question a release review asks
    * (license boilerplate, templated pages, and mass-syndicated passages
    * all surface here before they surface as model regurgitation).
    * Output: (gram, n_docs, n_occurrences) for grams appearing in ≥ 2
    * distinct docs, by (n_docs desc, n_occurrences desc, gram) — the
    * doc-count ordering because a passage repeated across many documents
    * is the memorization signal; within-doc repetition is
    * `intradoc_dedup`'s business.
    *
    * Scale shape: the per-(gram,doc) dedup and the per-gram rollup are
    * the standard two-level exact-distinct aggregate (both map-side
    * partial); gram TEXT rides the shuffle as the grouping key — ~8·L
    * bytes vs the hash pipeline's 8, the price of a report that must
    * output text (the detection-only paths above stay hash-keyed). The
    * final top-k is a distributed TakeOrdered: per-partition heads, a
    * k-row driver merge — never a global sort. */
  def topRepeated(docs: DataFrame, l: Int = 5, k: Int = 20): DataFrame = {
    require(l > 1, s"gram length must exceed 1 token, got $l")
    require(k > 0, s"k must be positive, got $k")
    val base = docs
      .select(col("doc_id"), Text.tokens(col("text")).as("_t"))
      .withColumn("_n", size(col("_t")))
    val grams = base.filter(col("_n") >= l)
      .select(col("doc_id"),
        explode(sequence(lit(1), col("_n") - l + 1)).as("pos"),
        col("_t"))
      .select(col("doc_id"),
        array_join(slice(col("_t"), col("pos"), lit(l)), " ").as("gram"))
    grams
      .groupBy(col("gram"), col("doc_id"))
      .agg(count(lit(1)).as("_occ"))
      .groupBy(col("gram"))
      .agg(count(lit(1)).as("n_docs"), sum(col("_occ")).as("n_occurrences"))
      .filter(col("n_docs") >= 2)
      .orderBy(col("n_docs").desc, col("n_occurrences").desc, col("gram"))
      .limit(k)
  }

  def dupSpanStats(docs: DataFrame, l: Int = 8): DataFrame = {
    require(l > 1, s"gram length must exceed 1 token, got $l")
    val base = docs
      .select(col("doc_id"), Text.tokens(col("text")).as("_t"))
      .withColumn("_n", size(col("_t")))
    val grams = gramStream(docs, l)
    // repeated across documents ⇔ two distinct doc ids share the hash
    val dup = grams.groupBy(col("_h"))
      .agg(min(col("doc_id")).as("_lo"), max(col("doc_id")).as("_hi"))
      .filter(col("_lo") =!= col("_hi"))
      .select(col("_h"))
    val covered = grams.join(dup, Seq("_h"))
      .select(col("doc_id"),
        explode(sequence(col("pos"), col("pos") + l - 1)).as("_p"))
      .distinct() // overlapping dup windows cover a position once
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("_ndup"))
    base
      .join(covered, Seq("doc_id"), "left")
      .select(col("doc_id"), col("_n").as("n_tokens"),
        coalesce(col("_ndup"), lit(0L)).as("n_dup_tokens"))
  }
}
