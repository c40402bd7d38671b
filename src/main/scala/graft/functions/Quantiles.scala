package graft.functions

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Distributed EXACT quantiles without value concentration.
  *
  * Spark's built-in `percentile` aggregate collects every value of a group
  * into one task's memory — fine for high-cardinality groups, a
  * scale-killer for a global quantile (or 3-group quantiles) over 100 TB.
  * This operator computes exact interpolated quantiles with the classic
  * two-pass order-statistics plan, all data movement bounded by one range
  * shuffle:
  *
  *  1. range-repartition the values (Spark samples split bounds — the same
  *     machinery as a global sort; no partition ever holds more than
  *     ~n/parts values);
  *  2. pass 1: per-partition counts (a tiny parts-row aggregate) →
  *     prefix-sum offsets on the driver (parts longs — metadata, like AQE
  *     stats);
  *  3. pass 2: partition-LOCAL rank via row_number windowed by partition id
  *     (never a single-partition global window), global rank = offset +
  *     local rank;
  *  4. join the O(#quantiles) needed ranks (broadcast literal) and
  *     interpolate `lo + (hi-lo)*frac` — bit-identical to Spark
  *     `percentile` and DuckDB `quantile_cont`.
  *
  * Ties across partition bounds are harmless: rank→value is unique per
  * rank position under any stable assignment of equal values.
  */
object Quantiles {

  /** Exact interpolated quantiles of `valueCol` over the whole frame.
    * Returns one row per requested fraction: (q DOUBLE, value DOUBLE),
    * ordered by q.
    */
  def exactQuantilesGlobal(
      df: DataFrame, valueCol: String, qs: Seq[Double]): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q >= 0.0 && q <= 1.0))
    val spark = df.sparkSession
    val parts = spark.conf.get("spark.sql.shuffle.partitions", "32").toInt

    val vals = df.select(col(valueCol).cast(DoubleType).as("v"))
      .filter(col("v").isNotNull)
    val n = vals.count()
    require(n > 0, s"no non-null values in $valueCol")

    // range shuffle: partition i holds values <= partition i+1's.
    // PERSISTED: pass 1 and pass 2 must see the SAME partitioning — the
    // range sampler is free to pick different bounds on recomputation,
    // which would silently skew the rank offsets.
    val ranged = vals.repartitionByRange(parts, col("v"))
      .withColumn("pid", spark_partition_id())
      .persist()
    // pass 1: per-partition counts → driver-side prefix sums (parts longs);
    // empty partitions are absent and contribute 0 to every prefix
    val counts = ranged.groupBy(col("pid")).agg(count(lit(1)).as("cnt"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val offsets = counts.zip(counts.scanLeft(0L)(_ + _._2))
      .map { case ((pid, _), off) => (pid, off) }

    // the O(#qs) order statistics we actually need
    val needed = qs.flatMap { q =>
      val exact = (n - 1) * q
      val il = math.floor(exact).toLong
      val iu = math.ceil(exact).toLong
      val frac = exact - il
      Seq(Row(q, frac, il, "lo"), Row(q, frac, iu, "hi"))
    }
    val neededDf = spark.createDataFrame(
      spark.sparkContext.parallelize(needed, 1),
      StructType(Seq(
        StructField("q", DoubleType), StructField("frac", DoubleType),
        StructField("rank", LongType), StructField("kind", StringType))))
    val offDf = spark.createDataFrame(
      spark.sparkContext.parallelize(offsets.map(o => Row(o._1, o._2)).toSeq, 1),
      StructType(Seq(StructField("pid", IntegerType), StructField("off", LongType))))

    // pass 2: partition-local rank; global rank = prefix offset + local
    val w = Window.partitionBy(col("pid")).orderBy(col("v"))
    val ranked = ranged
      .join(broadcast(offDf), "pid")
      .withColumn("rank", col("off") + row_number().over(w) - 1)
    val result = ranked.join(broadcast(neededDf), "rank")
      .groupBy(col("q"), col("frac"))
      .agg(
        max(when(col("kind") === "lo", col("v"))).as("lo"),
        max(when(col("kind") === "hi", col("v"))).as("hi"))
      .select(col("q"),
        (col("lo") + (col("hi") - col("lo")) * col("frac")).as("value"))
      .orderBy(col("q"))
      // O(#qs) rows: materialize eagerly so `ranged` can be released now
      // instead of leaking a cached copy of the data per call.
      .collect().toSeq
    ranged.unpersist(blocking = false)
    spark.createDataFrame(
      spark.sparkContext.parallelize(result, 1),
      StructType(Seq(
        StructField("q", DoubleType), StructField("value", DoubleType))))
      .orderBy(col("q"))
  }

  /** Winsorize: clamp `valCol` into its per-group [lo, hi] quantile
    * bounds — the standard outlier-capping pass before aggregate features
    * are computed over heavy-tailed values. Adds `<valCol>_w`.
    *
    * The bounds table is GROUP-cardinality-sized by construction (two
    * doubles per group), so the join back is the small-side-broadcast
    * shape — left to Catalyst/AQE rather than forced, since a
    * pathological key cardinality should degrade to a shuffle join, not
    * an executor OOM. Exact interpolated `percentile` matches DuckDB's
    * `quantile_cont` bit-for-bit (the `quantile_agg` contract); the clamp
    * itself is order comparisons — no new arithmetic. */
  /** Exact per-group DISCRETE quantiles (percentile_disc semantics: the
    * smallest group value whose cumulative fraction reaches q — rank
    * ceil(q·n), an actual data value, never interpolated). One window
    * partitioned by the group (per-group state bounded by group size) +
    * one aggregate; the global operator above is for the low-cardinality
    * case where a group would swallow the corpus. Emits one column per
    * requested fraction, named `p<100q>`. */
  def groupQuantilesDisc(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      qs: Seq[Double]
  ): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q > 0.0 && q <= 1.0),
      s"fractions must be in (0, 1], got $qs")
    val w = Window.partitionBy(col(groupCol)).orderBy(col(valueCol))
    val ranked = df
      .select(col(groupCol), col(valueCol))
      .filter(col(valueCol).isNotNull)
      .withColumn("_rn", row_number().over(w))
      .withColumn("_n", count(lit(1)).over(Window.partitionBy(col(groupCol))))
    val aggs = qs.map { q =>
      min(when(col("_rn") ===
        ceil(lit(q) * col("_n")).cast(LongType), col(valueCol)))
        .as(s"p${math.round(q * 100)}")
    }
    ranked.groupBy(col(groupCol)).agg(aggs.head, aggs.tail: _*)
  }

  /** Robust outlier summary per group via MAD (median absolute
    * deviation): per group, the discrete median m, mad = discrete median
    * of |v − m|, and the count of rows with |v − m| > cutoff·mad. Two
    * group-partitioned windows (median, then deviation median) and two
    * small joins back — deterministic end to end: medians are data
    * values, |v − m| and cutoff·mad are single correctly-rounded IEEE
    * ops. A mad of 0 (over half the group identical) flags every
    * deviating row, the standard MAD degeneracy. */
  def madOutliers(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      cutoff: Double = 3.0
  ): DataFrame = {
    require(cutoff > 0, s"cutoff must be positive, got $cutoff")
    val med = groupQuantilesDisc(df, groupCol, valueCol, Seq(0.5))
      .withColumnRenamed("p50", "median")
    val dev = df.select(col(groupCol), col(valueCol))
      .filter(col(valueCol).isNotNull)
      .join(med, Seq(groupCol))
      .withColumn("_dev", abs(col(valueCol) - col("median")))
    val mad = groupQuantilesDisc(dev, groupCol, "_dev", Seq(0.5))
      .withColumnRenamed("p50", "mad")
    dev.join(mad, Seq(groupCol))
      .groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("n"),
        min(col("median")).as("median"),
        min(col("mad")).as("mad"),
        count(when(col("_dev") > lit(cutoff) * col("mad"), 1)).as("n_outliers"))
  }

  def winsorize(
      df: DataFrame, keyCol: String, valCol: String,
      lo: Double = 0.05, hi: Double = 0.95): DataFrame = {
    require(lo >= 0 && hi <= 1 && lo <= hi, s"need 0 <= lo <= hi <= 1, got [$lo, $hi]")
    val bounds = df.groupBy(col(keyCol)).agg(
      expr(s"percentile($valCol, $lo)").as("_lo"),
      expr(s"percentile($valCol, $hi)").as("_hi"))
    df.join(bounds, Seq(keyCol))
      .withColumn(s"${valCol}_w",
        least(greatest(col(valCol), col("_lo")), col("_hi")))
      .drop("_lo", "_hi")
  }
}
