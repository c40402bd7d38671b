package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Sequence packing — the concatenate-and-chunk step of an LLM training
  * pipeline: documents are laid out in a deterministic global token
  * stream (ordered by a key), and the stream is cut every `budget` tokens
  * into training bins. Each document gets its global stream offset and
  * the bin its first token lands in; bin-level stats (docs per bin, fill,
  * boundary-spanning docs) fall out of one aggregate over that.
  *
  * The scale problem is the GLOBAL running sum: a single `Window.orderBy`
  * cumsum funnels the whole corpus through one task. This implementation
  * is the two-pass order-statistics shape instead (same pattern as
  * [[Quantiles.exactQuantilesGlobal]]):
  *
  *   1. rows land in `nBuckets` ORDER-PRESERVING key ranges (a monotone
  *      function of the key, so bucket boundaries respect stream order);
  *   2. per-bucket token totals — one tiny aggregate (`nBuckets` rows,
  *      driver-side prefix sum: bounded metadata, never row data);
  *   3. the in-bucket cumsum is a window PARTITIONED BY bucket (each
  *      window partition is corpus/nBuckets rows, not the corpus), and
  *      the global offset = bucket prefix + in-bucket cumsum.
  *
  * No stage sees more than corpus/nBuckets rows in one task; the only
  * driver state is `nBuckets` longs. The DuckDB oracle reproduces the
  * result with a plain global-window cumsum — exact (integer arithmetic),
  * so the distributed layout is hash-checked against the sequential
  * definition.
  */
object Packing {

  /** Per-document packing assignment: (all input columns) + `n_tokens`,
    * `stream_offset` (tokens before this doc in the global stream), and
    * `bin` (= stream_offset div budget — the training bin the doc starts
    * in; a doc spans into the next bin iff offset+n_tokens crosses a
    * multiple of `budget`).
    *
    * `orderKey` must be unique per row (stream order must be total for
    * the layout to be deterministic); `tokenCount` is any non-negative
    * integer expression (whitespace tokens, BPE-ish counts, bytes).
    */
  def packSequences(
      docs: DataFrame,
      orderKey: Column,
      tokenCount: Column,
      budget: Long,
      nBuckets: Int = 1024
  ): DataFrame = {
    require(budget > 0, s"token budget must be positive, got $budget")
    val reserved = Seq("n_tokens", "stream_offset", "bin", "_key", "_bucket")
    val clash = docs.columns.intersect(reserved)
    require(clash.isEmpty,
      s"packSequences reserves output columns ${reserved.mkString("/")}; " +
        s"input already has ${clash.mkString(", ")} — rename before packing")
    val keyed = docs
      .withColumn("_key", orderKey.cast(LongType))
      .withColumn("n_tokens", tokenCount.cast(LongType))

    // Order-preserving bucket: fixed-width key ranges. min/max are a
    // footer-cheap aggregate (bounded driver state). Width is computed
    // DIVIDE-FIRST: `(key-min)*nBuckets/span` would wrap for spans past
    // Long.MaxValue/nBuckets (~9e15 — nanosecond timestamps, hash keys),
    // silently producing negative/non-monotone buckets. `(key-min)/width`
    // with width = ceil(span/nBuckets) cannot overflow (key-min < span),
    // stays monotone, and provably lands in [0, nBuckets). Span overflow
    // itself fails loudly via addExact/subtractExact.
    val boundsRow = keyed.agg(min(col("_key")), max(col("_key")),
      sum(when(col("_key").isNull, 1L).otherwise(0L))).collect().head
    // a non-numeric orderKey (string/md5 keys) casts to null SILENTLY and
    // would surface as a cryptic driver NPE on the bucket totals — catch
    // it here with context, riding the same bounds aggregate
    require(boundsRow.isNullAt(2) || boundsRow.getLong(2) == 0L,
      s"packSequences: orderKey casts to null on ${boundsRow.getLong(2)} " +
        "row(s) — the key must be integral (numeric, unique); hash string " +
        "keys to a number first (e.g. xxhash64)")
    val Array(minKey, maxKey) =
      boundsRow.toSeq.take(2).map(_.asInstanceOf[Long]).toArray
    val span =
      try Math.addExact(Math.subtractExact(maxKey, minKey), 1L)
      catch { case _: ArithmeticException => throw new IllegalArgumentException(
        s"key span [$minKey, $maxKey] exceeds Long range; rescale the order key") }
    val width = math.max(1L, (math.max(1L, span) - 1L) / nBuckets + 1L)
    val bucketed = keyed.withColumn("_bucket",
      expr(s"(_key - ${minKey}L) div ${width}L"))

    // Pass 1: per-bucket totals → driver prefix sums (nBuckets longs).
    val totals = bucketed.groupBy(col("_bucket"))
      .agg(sum(col("n_tokens")).as("_bucket_tokens"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val prefixes = {
      var acc = 0L
      (0L until nBuckets.toLong).map { b =>
        val p = b -> acc; acc += totals.getOrElse(b, 0L); p
      }.toMap
    }
    val prefixCol = {
      // nBuckets-entry literal CASE is wasteful; a map literal keeps it one
      // expression: element_at(map(...), bucket)
      val entries = prefixes.toSeq.sortBy(_._1)
        .flatMap { case (b, p) => Seq(lit(b), lit(p)) }
      element_at(map(entries: _*), col("_bucket"))
    }

    // Pass 2: in-bucket exclusive cumsum; window partitions are bucket-sized.
    val w = Window.partitionBy(col("_bucket")).orderBy(col("_key"))
      .rowsBetween(Window.unboundedPreceding, -1)
    bucketed
      .withColumn("stream_offset",
        coalesce(sum(col("n_tokens")).over(w), lit(0L)) + prefixCol)
      .withColumn("bin", expr(s"stream_offset div ${budget}L"))
      .drop("_key", "_bucket")
  }

  /** Materialized training bins over [[packSequences]] output: each bin's
    * document count and its CONCATENATED text in stream order — the step
    * that turns the packing layout into actual training examples.
    *
    * Per-bin state is budget-bounded (a bin holds ~`budget` tokens by
    * construction), so the aggregate task never exceeds one bin's text.
    * `collect_list` order is partition-dependent; sorting the collected
    * (key, text) structs makes the concatenation deterministic — the
    * aggregate state is the same either way. */
  def binTexts(packed: DataFrame, keyCol: String, textCol: String): DataFrame =
    packed
      .groupBy(col("bin"))
      .agg(
        count(lit(1)).as("n_docs"),
        array_join(
          transform(
            // sort by the CAST key — packSequences laid out stream
            // offsets in numeric key order, and a raw string-typed key
            // would concatenate '10' before '9', contradicting them
            array_sort(collect_list(struct(
              col(keyCol).cast(LongType).as("_k"), col(textCol).as("_t")))),
            x => x.getField("_t")),
          " ").as("bin_text"))

  /** Bin-level packing stats over [[packSequences]] output: documents per
    * bin, tokens STARTING in the bin, and how many of its docs span past
    * the bin boundary (span iff offset + n_tokens > (bin+1)·budget). The
    * span rate is the packing-efficiency metric pipeline owners watch. */
  def binStats(packed: DataFrame, budget: Long): DataFrame =
    packed
      .withColumn("_spans",
        (col("stream_offset") + col("n_tokens") >
          (col("bin") + 1) * budget).cast("int"))
      .groupBy(col("bin"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens_starting"),
        sum(col("_spans")).cast(LongType).as("n_spanning"))
}
