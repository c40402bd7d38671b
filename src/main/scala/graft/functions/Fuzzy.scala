package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fuzzy string matching by deletion neighborhoods (the SymSpell candidate
  * scheme, Garbe 2012 — public algorithm): two strings within Levenshtein
  * distance d always share a member of their ≤d-deletion neighborhoods
  * (delete the edited positions from each side), so candidate generation
  * is an EQUALITY join on short string keys instead of the all-pairs
  * cross product a distance predicate would force. Candidates are then
  * verified with the exact `levenshtein` built-in (codegen'd) — the key
  * join over-generates (e.g. transpositions share keys at distance 2),
  * never under-generates, so the verified result is exact.
  *
  * Scale shape: keys per term = O(len^d); the join shuffles (key, term)
  * rows hashed on the key — Σ len per term for d=1, the same order as
  * tokenizing the vocabulary — and the verify filter runs on the
  * candidate-pair set only. The entity-resolution / spell-candidate
  * primitive for vocab- or entity-sized tables (typo unification,
  * near-identical URL/author/title matching) where an O(n²) levenshtein
  * cross join is the naive plan that dies first at scale.
  */
object Fuzzy {

  /** Every string obtained by deleting exactly one character. */
  private def del1(w: Column): Column =
    transform(sequence(lit(1), length(w)),
      i => concat(w.substr(lit(1), i - 1), w.substr(i + 1, length(w))))

  /** The ≤`maxDist`-deletion neighborhood of `w`, including `w` itself. */
  private def delKeys(w: Column, maxDist: Int): Column = {
    var frontier = array(w)
    var all = frontier
    for (_ <- 1 to maxDist) {
      frontier = array_distinct(flatten(transform(frontier, del1(_))))
      all = array_union(all, frontier)
    }
    all
  }

  /** Longest term the deletion-key scheme accepts, by distance. Keys per
    * term are O(len) at d=1 but O(len²) at d=2 — a single multi-KB "term"
    * (a mis-fed document body, a concatenated record) at d=2 would emit
    * millions of keys and quietly dominate the whole join. These caps make
    * the documented vocabulary-level contract (short entity-ish strings)
    * ENFORCED: an over-long term fails the job loudly via a codegen'd
    * `raise_error` (zero extra passes — the guard rides the key
    * projection) instead of silently exploding the shuffle. Truncate or
    * hash degenerate terms upstream if they are expected. */
  val MaxTermLenDist1 = 4096
  val MaxTermLenDist2 = 256

  /** (term, key) rows for the distinct terms of `df(termCol)`, with the
    * [[MaxTermLenDist1]]/[[MaxTermLenDist2]] length guard inlined.
    *
    * The guard sits BELOW the distinct: the Aggregate is a projection-
    * collapse barrier, so `delKeys` above it references a plain
    * attribute. Guarding above the distinct let CollapseProject inline
    * the when/raise_error tree into every `delKeys` reference, which
    * cost 2.7× on the sf0.1 bench (4.4 s vs 1.6 s) for a check that is
    * one length compare per row down here. */
  private def keyed(
      df: DataFrame, termCol: String, out: String, maxDist: Int): DataFrame = {
    val cap = if (maxDist >= 2) MaxTermLenDist2 else MaxTermLenDist1
    df.select(col(termCol).cast("string").as(out)).filter(col(out).isNotNull)
      .select(
        when(length(col(out)) > cap,
          raise_error(concat(
            lit(s"Fuzzy: term exceeds $cap chars (deletion keys are " +
              s"O(len^$maxDist) at maxDist=$maxDist); truncate or hash " +
              "degenerate terms upstream. Term prefix: "),
            col(out).substr(1, 64))))
          .otherwise(col(out)).as(out))
      .distinct()
      .select(col(out), explode(delKeys(col(out), maxDist)).as("_k"))
  }

  /** All cross-table term pairs within Levenshtein distance `maxDist`:
    * (term_a from `left`, term_b from `right`, dist). Equal terms pair at
    * distance 0. Terms are deduplicated per side first, so this is a
    * vocabulary-level operator — join the result back to carrier rows by
    * term. */
  def fuzzyJoin(
      left: DataFrame,
      right: DataFrame,
      leftCol: String,
      rightCol: String,
      maxDist: Int = 1): DataFrame = {
    require(maxDist >= 1 && maxDist <= 2,
      s"maxDist must be 1 or 2 (deletion-key blowup is O(len^d)), got $maxDist")
    keyed(left, leftCol, "term_a", maxDist)
      .join(keyed(right, rightCol, "term_b", maxDist), "_k")
      // threshold variant: O(maxDist·len) banded DP with early exit
      // (returns -1 past the bound) instead of the O(len²) full matrix —
      // the verify step's cost on long terms
      .select(col("term_a"), col("term_b"),
        levenshtein(col("term_a"), col("term_b"), maxDist).as("dist"))
      .filter(col("dist") >= 0)
      .distinct()
  }

  /** Within-one-set near-duplicate term pairs: each unordered pair once
    * (`term_a < term_b`), verified distance in [1, maxDist]. */
  def fuzzyPairs(
      terms: DataFrame, termCol: String, maxDist: Int = 1): DataFrame = {
    require(maxDist >= 1 && maxDist <= 2,
      s"maxDist must be 1 or 2 (deletion-key blowup is O(len^d)), got $maxDist")
    // PERSISTED AND MATERIALIZED EAGERLY: the self-join consumes the
    // keyed relation on BOTH sides, and the deletion-key explode is the
    // kernel's dominant compute (O(len) substring concats per term;
    // measured 2 × ~0.9 s of entity_resolve's 7 s at sf0.1, the two
    // largest stages of the query). A lazy persist does NOT deduplicate
    // it — the join's two child stages launch concurrently and RACE to
    // populate the same cache, each computing the full explode (probe:
    // two ~860 ms stages either way). The count() forces one
    // materialization up front; both join branches then read the cache.
    // (term, key) rows are Σ len per term — vocabulary-sized, spills if
    // not.
    val k = keyed(terms, termCol, "term_a", maxDist)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    k.count()
    // Verify (codegen'd levenshtein) BEFORE the pair distinct: candidate
    // multiplicity barely dedups (same-key collisions are mostly distinct
    // pairs), so deduping first shuffles the full candidate set while
    // verifying first shrinks the distinct's input to the true-pair set —
    // ~4× less data through the expensive shuffle at sf0.1, identical rows
    // out (dist is a pure function of the pair, so it rides along).
    // threshold variant: banded DP, O(maxDist·len) with early exit
    // (returns -1 past the bound) — kept rows carry the exact distance.
    graft.AutoUnpersist.afterFirstUse(
      k.join(k.withColumnRenamed("term_a", "term_b"), "_k")
        .filter(col("term_a") < col("term_b"))
        .select(col("term_a"), col("term_b"),
          levenshtein(col("term_a"), col("term_b"), maxDist).as("dist"))
        .filter(col("dist") >= 0)
        .distinct(),
      k)
  }

  /** Per-JVM cache of verified fuzzy pair tables, keyed by the term
    * corpus plan + (termCol, maxDist): the pair table is the expensive
    * shared input of both the pair report ([[fuzzyPairs]]) and entity
    * resolution ([[resolveEntities]]) — same fan-out shape as
    * [[NearDup.ngramJaccardPairsShared]]. Payload is the verified pair
    * set only (pair-sized, not corpus-sized) and spills; bounded LRU with
    * unpersist on evict — see [[graft.PlanCache]] for the lifecycle. */
  private val pairsCache =
    new graft.PlanCache[DataFrame](capacity = 16, onEvict = graft.PlanCache.unpersist)

  /** [[fuzzyPairs]] through the per-JVM cache — use when several queries
    * consume one pair set. Identical output, computed once. */
  def fuzzyPairsShared(
      terms: DataFrame, termCol: String, maxDist: Int = 1): DataFrame =
    pairsCache.getOrCompute(graft.PlanCache.keyOf(terms, termCol, maxDist),
      fuzzyPairs(terms, termCol, maxDist)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))

  /** Entity resolution: every distinct term labeled with a canonical
    * entity id — the lexicographically smallest term reachable through a
    * chain of ≤`maxDist` edits. Fuzzy matching gives PAIRS; unifying
    * records needs the transitive closure of those pairs (a~b, b~c ⇒ one
    * entity even when dist(a,c) > maxDist — that chaining IS the point:
    * every typo variant of a name lands on one id). Composition of
    * [[fuzzyPairs]] with distributed min-label propagation
    * ([[Clusters.connectedComponents]]); all joins are equality joins on
    * deletion keys / term labels, so the whole pipeline is
    * shuffle-on-key — no cross product at any stage.
    *
    * @return (term, entity_id) — one row per distinct non-null term;
    *         singleton terms are their own entity.
    */
  def resolveEntities(
      terms: DataFrame, termCol: String, maxDist: Int = 1): DataFrame = {
    val t = terms.select(col(termCol).cast("string").as("term"))
      .filter(col("term").isNotNull).distinct()
    // shortcut (pointer jumping): typo graphs are CHAINS, not the
    // near-cliques dedup produces — propagation depth is the chain
    // length, so the O(log diameter) mode pays for its extra join here.
    Clusters.connectedComponents(
        t, fuzzyPairsShared(terms, termCol, maxDist),
        nodeCol = "term", srcCol = "term_a", dstCol = "term_b",
        shortcut = true,
        // verified pair tables are strict term_a < term_b + distinct
        pairsCanonical = true)
      .withColumnRenamed("cluster_id", "entity_id")
  }
}
