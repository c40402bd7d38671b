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

  /** Pairwise content overlap between corpus groups (sources, snapshots,
    * providers): EXACT Jaccard of the groups' distinct w-token shingle
    * sets. The corpus-monitoring question this answers — "how much of
    * provider B is already in provider A" — decides mixture weights and
    * flags license/laundering risk before a mix ships.
    *
    * Scale shape: one explode pass to distinct (group, shingle) — the
    * shingle string never shuffles, only its 8-byte xxhash64 (the
    * [[NearDup]] convention; cross-shingle collision odds ~|shingles|²/2⁶⁵,
    * accepted and documented there) — then a self-equi-join on the hash
    * and a pair-keyed count. Group sizes broadcast back (group cardinality
    * is small by definition). Pairs with an EMPTY intersection are absent
    * from the report (reading absence as zero) — emitting them would take
    * a groups×groups cross product for rows that carry no information.
    *
    * @return (group_a, group_b, n_a, n_b, n_inter, jaccard) for every
    *         group pair (a < b) sharing ≥ 1 shingle, ordered.
    */
  def sourceOverlap(
      docs: DataFrame,
      groupCol: String = "source",
      w: Int = 3
  ): DataFrame = {
    val gs = NearDup.docShingles(docs.select(col(groupCol).as("doc_id"),
        col("text")), w)
      .select(col("doc_id").as("_g"), xxhash64(col("shingle")).as("_h"))
      .distinct()
    val sizes = gs.groupBy(col("_g")).agg(count(lit(1)).as("_n"))
    val inter = gs.as("a")
      .join(gs.as("b"),
        col("a._h") === col("b._h") && col("a._g") < col("b._g"))
      .groupBy(col("a._g").as("group_a"), col("b._g").as("group_b"))
      .agg(count(lit(1)).as("n_inter"))
    inter
      .join(broadcast(sizes.select(col("_g").as("group_a"), col("_n").as("n_a"))),
        Seq("group_a"))
      .join(broadcast(sizes.select(col("_g").as("group_b"), col("_n").as("n_b"))),
        Seq("group_b"))
      .select(col("group_a"), col("group_b"), col("n_a"), col("n_b"),
        col("n_inter"),
        (col("n_inter").cast(DoubleType) /
          (col("n_a") + col("n_b") - col("n_inter"))).as("jaccard"))
      .orderBy(col("group_a"), col("group_b"))
  }
}
