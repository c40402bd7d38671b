package graft.functions

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Corpus monitoring — the stats a pipeline owner watches between runs.
  *
  * [[profile]] is the per-column health summary (nulls, cardinality,
  * range); [[categoryDrift]] is the distribution-shift alarm between
  * corpus slices (chi-square contingency terms). Both are single-pass
  * aggregates whose OUTPUT is group/column-cardinality-sized — the
  * monitoring plane never carries row data.
  */
object Profile {

  /** Per-column profile in long format: row count, null count, distinct
    * count, and min/max rendered as strings. ONE pass over the table (a
    * single aggregate row holding 4 expressions per column), reshaped on
    * the driver — bounded state, n_cols·4 values, the same contract as
    * the quantile/centroid metadata collects. Distinct counts are exact
    * (Expand-based multi-distinct, one extra shuffle by design). */
  def profile(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val cols = df.columns.toSeq
    val aggs = cols.flatMap { c =>
      Seq(
        coalesce(sum(when(col(c).isNull, 1L).otherwise(0L)), lit(0L))
          .as(s"__nn_$c"),
        count_distinct(col(c)).as(s"__nd_$c"),
        min(col(c)).cast(StringType).as(s"__mn_$c"),
        max(col(c)).cast(StringType).as(s"__mx_$c"))
    }
    val row: Row = df.agg(count(lit(1)).as("__n"), aggs: _*).collect().head
    val n = row.getLong(0)
    val out = cols.zipWithIndex.map { case (c, i) =>
      val b = 1 + i * 4
      Row(c, n, row.getLong(b), row.getLong(b + 1),
        row.getString(b + 2), row.getString(b + 3))
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(out, 1),
      StructType(Seq(
        StructField("col_name", StringType, nullable = false),
        StructField("n_rows", LongType, nullable = false),
        StructField("n_nulls", LongType, nullable = false),
        StructField("n_distinct", LongType, nullable = false),
        StructField("min_str", StringType),
        StructField("max_str", StringType))))
      .orderBy(col("col_name"))
  }

  /** Chi-square contingency terms between a slice column (e.g. `source`)
    * and a category column (e.g. `lang`): per cell, the observed count,
    * the independence-expected count, and the cell's chi² contribution.
    * The statistic itself is the trivial downstream sum; emitting TERMS
    * keeps every value a fixed IEEE expression over exact integer counts
    * (one multiply, two divides, one square per cell) — no float
    * reduction whose order could differ between engines. All joins run on
    * the CELL table (group-cardinality-sized), after one count pass over
    * the data. */
  def categoryDrift(df: DataFrame, sliceCol: String, catCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cells = df.groupBy(col(sliceCol), col(catCol))
      .agg(count(lit(1)).as("n_obs"))
    // marginals as windows over the CELL table (group-cardinality-sized);
    // the GRAND total is a one-row aggregate broadcast-cross-joined back
    // (the temperatureMix pattern) — NOT a partition-less window, which
    // would single-thread the whole cell table through one task the moment
    // a caller picks a row-scale slice column. Both branches aggregate the
    // same groupBy exchange, so the data is still scanned once
    // (ReuseExchange dedupes the identical shuffle at physical planning).
    val st = sum(col("n_obs")).over(Window.partitionBy(col(sliceCol)))
    val ct = sum(col("n_obs")).over(Window.partitionBy(col(catCol)))
    val total = cells.agg(sum(col("n_obs")).as("_n_total"))
    val expected = st.cast(DoubleType) * ct / col("_n_total")
    cells
      .crossJoin(broadcast(total))
      .select(col(sliceCol), col(catCol), col("n_obs"),
        expected.as("expected"))
      .withColumn("chi2_term",
        (col("n_obs") - col("expected")) * (col("n_obs") - col("expected"))
          / col("expected"))
      .orderBy(col(sliceCol), col(catCol))
  }

  /** One-pass corpus datacard ("Datasheets for Datasets", Gebru et al.
    * 2018 §3.2's composition questions as a query): per (lang, source)
    * cell — doc count, DISTINCT-content count (md5 content key, the
    * [[Dedup.contentKey]] convention), char and token totals, mean doc
    * length, and the cell's share of the corpus. The first table of any
    * data card / release audit, and the drift baseline the per-snapshot
    * monitors compare against.
    *
    * Scale shape: ONE aggregate over the corpus (map-side partial
    * counts; the distinct-content count shuffles 16-byte keys, not
    * text), then the grand total re-joins as a one-row broadcast cross
    * join (the [[categoryDrift]] pattern — never a global window). Mean
    * and share are single IEEE divides of exact integer sums. */
  def datacard(docs: DataFrame): DataFrame = {
    val cells = docs
      .select(col("lang"), col("source"), col("n_chars"),
        Dedup.contentKey(col("text")).as("_h"),
        size(split(col("text"), " ")).cast("long").as("_toks"))
      .groupBy(col("lang"), col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        countDistinct(col("_h")).as("n_unique"),
        sum(col("n_chars")).as("n_chars"),
        sum(col("_toks")).as("n_tokens"))
    val total = cells.agg(sum(col("n_docs")).as("_n_total"))
    cells.crossJoin(broadcast(total))
      .select(col("lang"), col("source"), col("n_docs"), col("n_unique"),
        col("n_chars"), col("n_tokens"),
        round(col("n_chars").cast(DoubleType) / col("n_docs"), 6)
          .as("mean_chars"),
        round(col("n_docs").cast(DoubleType) / col("_n_total"), 6)
          .as("pct_docs"))
      .orderBy(col("lang"), col("source"))
  }

  /** Pairwise content overlap between corpus groups (sources, snapshots,
    * providers): EXACT Jaccard of the groups' distinct w-token shingle
    * sets. The corpus-monitoring question this answers — "how much of
    * provider B is already in provider A" — decides mixture weights and
    * flags license/laundering risk before a mix ships.
    *
    * Scale shape: one explode pass, then ONE shingle-keyed aggregate —
    * the shingle string never shuffles, only its 8-byte xxhash64 (the
    * [[NearDup]] convention; cross-shingle collision odds ~|shingles|²/2⁶⁵,
    * accepted and documented there) — collecting each shingle's distinct
    * group set (bounded by group CARDINALITY, small by definition: a
    * corpus has tens of sources, not millions). Pairs are enumerated
    * WITHIN each set row (≤ |groups|²/2 per shingle, driver-free) and
    * pair-counted; sizes fall out of the same aggregate by re-exploding
    * the set. No self-join: the previous shape joined the full
    * distinct-shingle table against itself on the hash — two extra
    * vocabulary-sized exchanges for the same intersection counts. Pairs
    * with an EMPTY intersection are absent from the report (reading
    * absence as zero) — emitting them would take a groups×groups cross
    * product for rows that carry no information.
    *
    * @return (group_a, group_b, n_a, n_b, n_inter, jaccard) for every
    *         group pair (a < b) sharing ≥ 1 shingle, ordered.
    */
  /** Join-key skew diagnostic: the `k` heaviest values of `keyCol` with
    * their counts and share of all rows — the first thing to check before
    * shuffling 100 TB on a key (a 5% single-key share means one reducer
    * gets 5% of the table; see the salted-join operator for the cure).
    *
    * One key-cardinality-sized shuffle for the counts; the total rides a
    * broadcast 1-row cross join; the top-k sort runs over the (already
    * aggregated) key table, not rows. Ties break by key for determinism. */
  def keySkew(df: DataFrame, keyCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val t = df.groupBy(col(keyCol).as("key")).agg(count(lit(1)).as("n"))
    val tot = t.select(sum(col("n")).as("_total"))
    t.crossJoin(broadcast(tot))
      .select(col("key"), col("n"),
        (col("n").cast(DoubleType) / col("_total")).as("share"))
      .orderBy(col("n").desc, col("key"))
      .limit(k)
  }

  def sourceOverlap(
      docs: DataFrame,
      groupCol: String = "source",
      w: Int = 3
  ): DataFrame = {
    // gsets backs THREE consumers (pair counts + both size joins) and
    // sizes two — persisted so the corpus explode runs once and the
    // audit-visible plan carries one exchange per logical shuffle, not
    // one per reference (AutoUnpersist frees both after the result's
    // first materialization).
    val gsets = NearDup.docShingles(docs.select(col(groupCol).as("doc_id"),
        col("text")), w)
      .select(col("doc_id").as("_g"), xxhash64(col("shingle")).as("_h"))
      .groupBy(col("_h"))
      .agg(sort_array(collect_set(col("_g"))).as("_gs"))
      .persist()
    val sizes = gsets.select(explode(col("_gs")).as("_g"))
      .groupBy(col("_g")).agg(count(lit(1)).as("_n"))
      .persist()
    // all ordered pairs (a < b) inside each shingle's group set; the set
    // is sorted, so pair (i, j>i) enumeration IS the a < b constraint
    val pairExpr = flatten(transform(col("_gs"), (a, i) =>
      transform(slice(col("_gs"), i + 2, size(col("_gs"))),
        b => struct(a.as("group_a"), b.as("group_b")))))
    val inter = gsets
      .select(explode(pairExpr).as("_p"))
      .groupBy(col("_p.group_a").as("group_a"), col("_p.group_b").as("group_b"))
      .agg(count(lit(1)).as("n_inter"))
    val result = inter
      .join(broadcast(sizes.select(col("_g").as("group_a"), col("_n").as("n_a"))),
        Seq("group_a"))
      .join(broadcast(sizes.select(col("_g").as("group_b"), col("_n").as("n_b"))),
        Seq("group_b"))
      .select(col("group_a"), col("group_b"), col("n_a"), col("n_b"),
        col("n_inter"),
        (col("n_inter").cast(DoubleType) /
          (col("n_a") + col("n_b") - col("n_inter"))).as("jaccard"))
      .orderBy(col("group_a"), col("group_b"))
    graft.AutoUnpersist.afterFirstUse(result, gsets, sizes)
  }

  /** Sketch-based [[sourceOverlap]] — the scale path. [[sourceOverlap]]
    * joins the groups' FULL distinct-shingle sets; at 100 TB that join is
    * corpus-vocabulary-sized. This estimates the same pairwise Jaccard
    * from per-group bottom-k KMV sketches ([[graft.plans.BottomKByHash]]:
    * the k distinct shingles with smallest md5 — a pure function of the
    * shingle SET, so the sketch and therefore the estimate are exactly
    * reproducible across runs, partitionings, and engines; this estimator
    * is ORACLE-CHECKABLE, unlike engine-private sketch internals).
    * Estimator (Bar-Yossef et al. 2002 / Broder): with S = the k smallest
    * of A_k ∪ B_k, Ĵ = |S ∩ A_k ∩ B_k| / |S|; std ≈ √(J(1−J)/k).
    *
    * Scale shape: the corpus is touched ONCE by the mergeable sketch
    * aggregate (each partition ships ≤ k entries per group); everything
    * pairwise runs over the groups-sized sketch table (a broadcast
    * nested-loop of config-cardinality rows, |pairs| · O(k log k) total
    * driver-free work). The exact companion joins only for the
    * `within_tol` gate — drop it at true scale, keep it wherever the
    * exact join is still affordable (it is the accuracy tripwire the
    * driver sees).
    *
    * @return (group_a, group_b, jaccard_est, jaccard_exact, within_tol)
    *         for ALL group pairs (zero-overlap pairs included — the
    *         sketch table makes them free), ordered.
    */
  def sourceOverlapSketch(
      docs: DataFrame,
      groupCol: String = "source",
      k: Int = 128,
      tol: Double = 0.15,
      w: Int = 3
  ): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    // both sides of the pair join read the sketch table — persisted so
    // the corpus pass runs once (the broadcast side would otherwise
    // re-scan and re-aggregate the whole corpus).
    val sk = NearDup.docShingles(
        docs.select(col(groupCol).as("doc_id"), col("text")), w)
      .groupBy(col("doc_id"))
      .agg(graft.plans.BottomKByHash.bottomK(col("shingle"), k).as("_sk"))
      .persist()
    val pairs = sk.select(col("doc_id").as("group_a"), col("_sk").as("_ska"))
      .join(broadcast(
          sk.select(col("doc_id").as("group_b"), col("_sk").as("_skb"))),
        col("group_a") < col("group_b"))
    // S = k smallest (by md5) of the sketch union; Ĵ = |S ∩ A_k ∩ B_k|/|S|
    val unionSorted = array_sort(
      array_distinct(concat(col("_ska"), col("_skb"))),
      (l, r) => when(md5(l) < md5(r), lit(-1))
        .when(md5(l) === md5(r), lit(0)).otherwise(lit(1)))
    val est = pairs
      .withColumn("_s", slice(unionSorted, 1, k))
      .select(col("group_a"), col("group_b"),
        (size(filter(col("_s"), x =>
          array_contains(col("_ska"), x) && array_contains(col("_skb"), x)))
          .cast(DoubleType) /
          least(lit(k), size(array_distinct(concat(col("_ska"), col("_skb"))))))
          .as("jaccard_est"))
    val exact = sourceOverlap(docs, groupCol, w)
      .select(col("group_a"), col("group_b"), col("jaccard"))
    val result = est.join(broadcast(exact), Seq("group_a", "group_b"), "left")
      .select(col("group_a"), col("group_b"), col("jaccard_est"),
        coalesce(col("jaccard"), lit(0.0)).as("jaccard_exact"))
      .withColumn("within_tol",
        abs(col("jaccard_est") - col("jaccard_exact")) <= tol)
      .orderBy(col("group_a"), col("group_b"))
    graft.AutoUnpersist.afterFirstUse(result, sk)
  }

  /** Per-column categorical concentration profile: for each listed
    * column, its distinct-count, row count, and Gini impurity
    * `1 − Σ (c_i/N)²` — the "is this column degenerate / skewed /
    * healthy" monitor a corpus pipeline runs per ingest batch (impurity
    * 0 = constant column, → 1 = uniform high-cardinality).
    *
    * Entropy needs a log — whose last bit differs across engines — so
    * the impurity form is used instead: Σc² and N are EXACT
    * (DECIMAL(38,0) sums survive c up to ~10^19 rows per value), and
    * the single double division + subtract at the end is IEEE-identical
    * to the SQL oracle. One count shuffle per column, each output ONE
    * row — a k-column profile is k bounded aggregates unioned. */
  def giniProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "cols must not be empty")
    val dec = DecimalType(38, 0)
    cols.map { c =>
      df.groupBy(col(c)).agg(count(lit(1)).as("_c"))
        .agg(
          lit(c).as("column_name"),
          count(lit(1)).as("n_distinct"),
          sum(col("_c")).as("_n"),
          sum(col("_c").cast(dec) * col("_c")).as("_s2"))
        .select(
          col("column_name"),
          col("n_distinct"),
          col("_n").as("n_rows"),
          (lit(1.0) - col("_s2").cast(DoubleType) /
            (col("_n").cast(dec) * col("_n")).cast(DoubleType)).as("gini"))
    }.reduce(_.unionAll(_))
  }
}
