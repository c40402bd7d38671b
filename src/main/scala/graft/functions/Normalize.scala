package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Per-group feature normalization — the scaling pass before numeric
  * features feed a model (EXT tier; the reference has no normalization
  * surface).
  *
  * Moments come from EXACT decimal sums (2-decimal inputs are exact in
  * DECIMAL(18,2); the sums commute with partial aggregation, so
  * map-side combine applies and the result is reduction-order-stable),
  * and the per-row finishing arithmetic is one IEEE subtract + divide
  * with the same expression tree as the DuckDB oracle — doubles
  * bit-match. The group-stats table is group-cardinality-sized and
  * joins back broadcast-small; the input is scanned twice (once for
  * moments, once for rows) rather than cached — at 100 TB a re-scan
  * beats pinning the corpus in memory.
  */
object Normalize {

  /** Z-score per group: `z = (x − mean_g) / sd_g` (population sd).
    * Output: `idCols…, groupCol, z` one row per input row. Groups with
    * zero variance emit NULL z (ANSI sessions make a raw 0-divide an
    * error, so the degenerate case is gated explicitly) — NULL is the
    * detectable "constant feature" signal, and `NULLIF(sd, 0)` gives
    * the identical semantics in the SQL oracle. NULL values are excluded
    * from the moments (`count(v)` pairs with SQL `count(valueCol)`, and
    * `sum` skips NULL on both engines), matching [[robustScale]] /
    * [[rankTransform]]; NULL-value rows still pass through with NULL z. */
  def zscore(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      idCols: Seq[String]
  ): DataFrame = {
    val v = col(valueCol).cast(DecimalType(18, 2))
    val stats = df
      .groupBy(col(groupCol))
      .agg(
        count(v).as("n"),
        sum(v).as("_s1"),
        sum(v * v).as("_s2"))
    val mean = col("_s1").cast(DoubleType) / col("n")
    val dims = stats.select(
      col(groupCol),
      mean.as("_mean"),
      sqrt(col("_s2").cast(DoubleType) / col("n") - mean * mean).as("_sd"))
    df.join(broadcast(dims), groupCol)
      .select((idCols.map(col) :+ col(groupCol) :+
        when(col("_sd") =!= 0d,
          (v.cast(DoubleType) - col("_mean")) / col("_sd")).as("z")): _*)
  }

  /** Robust per-group scaling: `(x − median_g) / IQR_g` with the
    * DISCRETE p25/p50/p75 (actual data values via
    * [[Quantiles.groupQuantilesDisc]] — rank ceil(q·n), never
    * interpolated, so every intermediate is an input value and the two
    * finishing IEEE ops bit-match the SQL oracle). The outlier-immune
    * sibling of [[zscore]]: heavy tails move the mean/sd but not the
    * quartiles. Zero-IQR groups (over half the group identical) emit
    * NULL — same loud-NULL contract as zscore's zero-sd.
    *
    * Plan shape: one group-partitioned window for the quartile table
    * (group-cardinality-sized), broadcast join-back, per-row finishing. */
  def robustScale(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      idCols: Seq[String]
  ): DataFrame = {
    val stats = Quantiles.groupQuantilesDisc(
      df, groupCol, valueCol, Seq(0.25, 0.5, 0.75))
    df.join(broadcast(stats), groupCol)
      .select((idCols.map(col) :+ col(groupCol) :+
        when(col("p75") =!= col("p25"),
          (col(valueCol) - col("p50")) / (col("p75") - col("p25")))
          .as("robust_z")): _*)
  }

  /** Global percent-rank transform: each row's `valueCol` mapped to
    * `(rank − 1) / (N − 1)` with SQL `percent_rank` tie semantics
    * (rank = 1 + count of strictly smaller values) — the
    * distribution-free [0,1] normalization that survives any value
    * distribution, where z-scores assume rough normality.
    *
    * NO single-partition global window: ranks come from the
    * range-shuffle two-pass of `Quantiles.exactQuantilesGlobal` applied
    * to the DISTINCT-value count table — per-partition multiplicity
    * sums to bounded driver offsets (one long per partition), then an
    * in-partition running sum; the corpus pays one distinct-count
    * shuffle and one value-equality join back. All rank arithmetic is
    * exact longs; the one division bit-matches the oracle.
    *
    * @return (idCols…, valueCol, pct_rank) — pct_rank 0.0 when all
    *         values are identical (N−1 guard, DuckDB's convention). */
  def rankTransform(
      df: DataFrame,
      valueCol: String,
      idCols: Seq[String]
  ): DataFrame = {
    val spark = df.sparkSession
    val parts = spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val vc = df.filter(col(valueCol).isNotNull)
      .groupBy(col(valueCol)).agg(count(lit(1)).as("_cnt"))
    val ranged = vc.repartitionByRange(parts, col(valueCol))
      .withColumn("_pid", spark_partition_id())
      .persist()
    // pass 1: per-partition multiplicity totals → driver prefix offsets
    val totals = ranged.groupBy(col("_pid")).agg(sum(col("_cnt")).as("_t"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val n = totals.map(_._2).sum
    val offsets = totals.zip(totals.scanLeft(0L)(_ + _._2))
      .map { case ((pid, _), off) => pid -> off }.toMap
    val offCol = {
      val entries = offsets.toSeq.sortBy(_._1)
        .flatMap { case (p, o) => Seq(lit(p), lit(o)) }
      element_at(map(entries: _*), col("_pid"))
    }
    // pass 2: rows strictly below = offset + in-partition exclusive cumsum
    val w = Window.partitionBy(col("_pid")).orderBy(col(valueCol))
      .rowsBetween(Window.unboundedPreceding, 0)
    val ranks = ranged
      .withColumn("_below", offCol + sum(col("_cnt")).over(w) - col("_cnt"))
      .select(col(valueCol),
        (when(lit(n) > 1L,
          col("_below").cast(DoubleType) / lit(n - 1L).cast(DoubleType))
          .otherwise(lit(0.0))).as("pct_rank"))
    val out = df.join(ranks, valueCol)
      .select((idCols.map(col) :+ col(valueCol) :+ col("pct_rank")): _*)
    graft.AutoUnpersist.afterFirstUse(out, ranged)
  }

  /** Symmetric int8 quantization of an embedding column — the 4×
    * shrink applied before embeddings are shipped to an ANN index or
    * checkpointed: per-vector `scale = 127 / max|v_i|`, each element
    * `q_i = floor(v_i·scale + 0.5)` (round-half-up spelled as
    * floor(+0.5) because the two engines' `round` half-rules differ;
    * floor is IEEE-identical everywhere). All-zero vectors quantize to
    * zeros with scale 0 — flagged by `scale = 0`, not an error.
    *
    * Purely per-row expression work: zero shuffle, codegen'd higher-
    * order functions, output `q` in [-127, 127] so the downstream
    * byte cast can never overflow.
    *
    * @return (idCol, q array<int>, scale double) */
  def quantizeInt8(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val maxAbs = array_max(transform(col(vecCol),
      x => abs(x.cast(DoubleType))))
    val scale = when(maxAbs > 0d, lit(127.0) / maxAbs).otherwise(lit(0.0))
    df.withColumn("_scale", scale)
      .select(
        col(idCol),
        transform(col(vecCol),
          x => floor(x.cast(DoubleType) * col("_scale") + 0.5).cast("int")).as("q"),
        col("_scale").as("scale"))
  }
}
