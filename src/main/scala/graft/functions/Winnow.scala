package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Winnowing document fingerprints — local rolling-hash sampling
  * (Schleimer, Wilkerson, Aiken, "Winnowing: Local Algorithms for
  * Document Fingerprinting", SIGMOD 2003). The character-level
  * complement of the token-shingle near-dup family: robust to
  * whitespace/token drift, and the fingerprint DENSITY is guaranteed —
  * every window of `w` consecutive k-gram hashes contributes at least
  * one selected fingerprint, so a shared substring of length
  * ≥ k + w − 1 ALWAYS yields a shared fingerprint (the paper's
  * correctness property; plain 1/p hash sampling has no such bound).
  *
  * Hashes are the classic polynomial k-gram hash
  * `h_i = Σ_j c_{i+j}·B^{k−1−j} mod M` over per-character code points,
  * evaluated with PRE-REDUCED power-of-B literals so every intermediate
  * stays ≤ k·M·2^16 < 2^63 — exact long arithmetic end to end, no
  * float, no overflow, and the identical expression tree runs in the
  * SQL oracle (both engines do the same `%`/`//` on the same longs).
  * Selection per window is the minimum hash VALUE — a pure
  * order-statistic on exact longs, so the fingerprint SET is
  * engine-portable without the paper's positional tie-break (which
  * exists to pick among equal minima; the value set is tie-invariant).
  *
  * Everything up to the fingerprint set is per-row higher-order-function
  * expression work — ZERO shuffle; the overlap join is a fingerprint
  * equality join (the shingle-join shape), never a doc×doc product.
  */
object Winnow {

  /** Default polynomial base (prime > any BMP code unit count ratio). */
  val B: Long = 257L
  /** Default modulus: the Mersenne prime 2^31 − 1. */
  val M: Long = 2147483647L

  /** Array of k-gram polynomial hashes of `text` (empty when the text
    * is shorter than k). `B^(k−1−j) mod M` power literals are
    * pre-computed — no runtime pow, every term ≤ M·2^16, the k-term sum
    * ≪ 2^63: exact long arithmetic. */
  def kgramHashes(text: Column, k: Int): Column = {
    require(k >= 1, s"k must be >= 1, got $k")
    val pows: Seq[Long] = {
      var p = 1L
      val ps = Array.fill(k)(0L)
      for (j <- (k - 1) to 0 by -1) { ps(j) = p; p = p * B % M }
      ps.toSeq
    }
    // SHIFTED-SLICE algebra, not per-position substring: h is the
    // elementwise sum of k shifted views of the code-point array
    // (h_i = Σ_j codes[i+j]·P_j), built with zip_with — O(k·n) per row.
    // The naive transform-over-positions form re-evaluates its operand
    // per lambda call (HOFs are interpreted, no subexpression reuse) and
    // substring(pos) seeks from the string head: O(k·n²) per row — it
    // WEDGED at sf0.01. Same trap for the window minima below.
    val codes = transform(split(text, ""), c => ascii(c))
    val cnt = greatest(length(text) - (k - 1), lit(0))
    val shifted = pows.zipWithIndex.map { case (p, j) =>
      transform(slice(codes, lit(1 + j), cnt), c => c.cast("long") * lit(p))
    }
    val summed = shifted.reduce((a, b) => zip_with(a, b, (x, y) => x + y))
    transform(summed, h => h % lit(M))
  }

  /** The winnowed fingerprint set of `text`: distinct minima of every
    * `w`-window over the k-gram hash array, sorted ascending. Texts
    * shorter than k yield an empty set. */
  def fingerprints(text: Column, k: Int, w: Int): Column = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(w >= 1, s"w must be >= 1, got $w")
    graft.plans.WinnowFingerprints.winnowNative(text, k, w)
  }

  /** Interpreted HOF reference of [[fingerprints]] — kept as the
    * cross-check for the native kernel (WinnowSpec asserts equality);
    * NOT the hot path: higher-order functions don't codegen, and the
    * shifted-slice walk is ~1000× the native kernel at corpus scale. */
  def fingerprintsHof(text: Column, k: Int, w: Int): Column = {
    require(w >= 1, s"w must be >= 1, got $w")
    val h = kgramHashes(text, k)
    val nh = size(h)
    // window minima by the same shifted-slice algebra: m_i =
    // least(h[i], …, h[i+w−1]) as a zip_with fold over w shifted views.
    // nh ≥ w ⇒ nh−w+1 sliding minima; 0 < nh < w ⇒ one whole-array min
    // (the sub-guarantee-length degenerate); nh = 0 ⇒ none.
    val nWins = greatest(nh - (w - 1), lit(1))
    val slid = (0 until w).map(j => slice(h, lit(1 + j), nWins))
      .reduce((a, b) => zip_with(a, b, (x, y) => least(x, y)))
    val mins = when(nh >= w, slid)
      .when(nh > 0, array(array_min(h)))
      .otherwise(slice(h, lit(1), lit(0)))
    array_sort(array_distinct(mins))
  }

  /** Per-document fingerprint summary — the scalar face (no array
    * output): gram count, fingerprint count, and the exact long SUM of
    * the fingerprint set (an order-invariant content witness: two
    * engines agreeing on n + sum + min + max agree on the set with
    * overwhelming probability, and the unit suite pins the exact set). */
  def fingerprintSummary(
      docs: DataFrame, k: Int, w: Int): DataFrame = {
    val fp = fingerprints(col("text"), k, w)
    docs.select(
      col("doc_id"),
      greatest(length(col("text")) - (k - 1), lit(0)).cast("long").as("n_grams"),
      size(fp).cast("long").as("n_fingerprints"),
      coalesce(aggregate(fp, lit(0L), (acc, x) => acc + x), lit(0L)).as("fp_sum"),
      array_min(fp).as("fp_min"),
      array_max(fp).as("fp_max"))
  }

  /** Document pairs sharing ≥ `minShared` winnowed fingerprints — the
    * plagiarism/mirror detector. Fingerprint sets explode to
    * (fingerprint, doc) rows and meet in an EQUALITY join on the
    * fingerprint (the shingle-join scale shape: cost tracks fingerprint
    * collisions, never doc²). */
  def overlapPairs(
      docs: DataFrame, k: Int, w: Int, minShared: Long): DataFrame = {
    require(minShared >= 1, s"minShared must be >= 1, got $minShared")
    val fps = docs.select(col("doc_id"),
      explode(fingerprints(col("text"), k, w)).as("fp"))
    fps.as("a").join(fps.as("b"),
        col("a.fp") === col("b.fp") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }
}
