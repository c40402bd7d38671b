package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, engine-independent sampling and splitting — the
  * train/test-split primitive of a training-data pipeline. `rand()`-based
  * sampling is irreproducible across runs and engines; hashing a stable
  * row key gives the same split everywhere, forever: membership is a pure
  * function of the key, so late-arriving data lands in the same split and
  * any engine (or the DuckDB oracle) agrees row-for-row.
  */
object Sampling {

  /** Hex-prefix threshold selection: keeps rows where the first two hex
    * chars of md5(key) compare below `hexThreshold` ("1a" ≈ 26/256 ≈ 10%).
    * String comparison on lowercase hex == numeric comparison on the top
    * byte, and md5 is identical in every engine. */
  def hashSample(df: DataFrame, key: Column, hexThreshold: String): DataFrame =
    df.filter(substring(md5(key), 1, 2) < hexThreshold)

  /** Adds a `split` column ("test" for ~`testPct`/256ths of rows by hash,
    * else "train"). */
  def trainTestSplit(df: DataFrame, key: Column, testBytes: Int = 26): DataFrame = {
    // out-of-range values corrupt SILENTLY through %02x: 256 formats to
    // "100" (≈6.6% test, not 100%), -1 to a widening hex string (all
    // test) — the clamp-or-require convention of the other samplers
    require(testBytes >= 0 && testBytes <= 255,
      s"testBytes must be in [0, 255] (256ths of rows), got $testBytes")
    val th = f"$testBytes%02x"
    df.withColumn("split",
      when(substring(md5(key), 1, 2) < th, lit("test")).otherwise(lit("train")))
  }

  /** LEAKAGE-SAFE train/test split: the hash key is the row's near-dup
    * CLUSTER id, not the row id, so an entire duplicate cluster lands in
    * one split atomically — a near-duplicate of an eval document can
    * never appear in train. Splitting by row key (plain
    * [[trainTestSplit]]) leaks: two near-identical docs hash to
    * independent splits with probability 2·p·(1−p), and at 100 TB that
    * is millions of eval documents effectively memorized in training
    * (the contamination mode n-gram decontamination against a KNOWN
    * benchmark can't catch, because eval is drawn from the corpus
    * itself).
    *
    * `labels` is the (idCol, clusterCol) table — the output of
    * [[Clusters.connectedComponents]] or a [[PairStore]] read, so the
    * expensive closure is the shared prefix the store already serves.
    * This operator itself is ONE per-row hash on the label table — no
    * extra shuffle, and membership is a pure function of the cluster id:
    * reproducible across engines/runs, and a late-arriving doc joins its
    * cluster's existing side. Singleton clusters (label = own id)
    * degrade exactly to [[trainTestSplit]] semantics on the id.
    *
    * Output: `labels` + a `split` column; the no-pair-spans-splits
    * invariant is structural (split is a function of clusterCol). */
  def leakageSafeSplit(
      labels: DataFrame,
      clusterCol: String,
      testBytes: Int = 26): DataFrame = {
    require(testBytes >= 0 && testBytes <= 255,
      s"testBytes must be in [0, 255] (256ths of rows), got $testBytes")
    val th = f"$testBytes%02x"
    labels.withColumn("split",
      when(substring(md5(col(clusterCol).cast("string")), 1, 2) < th,
        lit("test")).otherwise(lit("train")))
  }

  /** Mixture-weighted sample: per-stratum deterministic keep RATES (vs
    * [[stratifiedSample]]'s per-stratum COUNT cap) — the "2 parts web, 1
    * part code" mixing step of corpus assembly. Each stratum keeps
    * ~rate·|stratum| rows chosen by md5 threshold on the row key, so
    * membership is a pure function of (key, stratum rate): reproducible
    * across engines/runs, and stable under late-arriving data. One
    * filter, zero shuffles — the rate lookup is a literal map expression.
    *
    * Rates are clamped to [0, 1] and quantized to 1/256ths (the md5
    * two-hex-char prefix compared against). Strata absent from `rates`
    * keep `defaultRate`.
    */
  def mixtureSample(df: DataFrame, stratum: Column, key: Column,
      rates: Map[String, Double], defaultRate: Double): DataFrame = {
    def th(r: Double): String =
      if (r >= 1.0) "zz" // every hex pair sorts below "zz": keep all
      else f"${math.max(0, (r * 256).toInt)}%02x"
    val thCol =
      if (rates.isEmpty) lit(th(defaultRate))
      else coalesce(
        element_at(
          map(rates.toSeq.sortBy(_._1)
            .flatMap { case (k, r) => Seq(lit(k), lit(th(r))) }: _*),
          stratum),
        lit(th(defaultRate)))
    df.filter(substring(md5(key), 1, 2) < thCol)
  }

  /** Per-row weighted Bernoulli keep: each row survives with probability
    * `rate01` (a per-row Column in [0,1] — e.g. a quality score), decided
    * by comparing the first FOUR hex chars of md5(key) against the rate
    * quantized to 1/65536ths. The importance-sampling step of corpus
    * assembly ("keep high-quality docs proportionally more"), with
    * [[mixtureSample]]'s determinism contract: membership is a pure
    * function of (key, rate), reproducible across engines and stable
    * under late-arriving data — and NO transcendental functions, so the
    * DuckDB oracle agrees bit-for-bit (an Efraimidis–Spirakis u^(1/w)
    * key would hinge on pow()'s last ulp).
    *
    * Rates ≥ 1 keep always (`zzzzz` sorts above every hex quartet — the
    * [[mixtureSample]] trick); null/negative rates keep nothing. Zero
    * shuffle: one codegen'd filter. */
  def weightedSample(df: DataFrame, key: Column, rate01: Column): DataFrame =
    df.filter(weightedKeepExpr(key, rate01))

  /** [[weightedSample]]'s keep predicate as a bare Column, for callers
    * that must COMBINE it with another condition in one filter (e.g.
    * [[QualityClassifier.calibratedWeightedSample]]'s in-plan
    * weighted-vs-gate branch). Same contract: pure function of
    * (key, rate), no transcendentals. */
  def weightedKeepExpr(key: Column, rate01: Column): Column = {
    val th = when(rate01.isNull || rate01 <= 0.0, lit("0000"))
      .when(rate01 >= 1.0, lit("zzzzz"))
      .otherwise(format_string("%04x", floor(rate01 * 65536).cast("int")))
    substring(md5(key), 1, 4) < th
  }

  /** Temperature-flattened corpus mix (the T5/LLaMA mixing step at
    * temperature 2): KEPT rows per stratum ∝ sqrt(stratum size), i.e.
    * keep RATE ∝ 1/sqrt(stratum size), anchored so the LARGEST stratum
    * keeps `maxRate` — small sources are over-represented relative to
    * proportional sampling (their rate rises toward the keep-everything
    * clamp), large ones flattened. (A rate ∝ +sqrt(n) would do the
    * OPPOSITE — amplify the skew — since kept = rate·n.) Composes
    * [[weightedSample]] with a rate computed from the stratum-count table
    * (group-cardinality-sized, broadcast by AQE); rates ≥ 1 ride
    * weightedSample's keep-always clamp. Deterministic across engines:
    * sqrt is IEEE exactly-rounded and the rate quantizes to 1/65536ths
    * before the hash compare — no pow(). */
  def temperatureMix(df: DataFrame, stratum: Column, key: Column,
      maxRate: Double = 0.5): DataFrame = {
    require(maxRate > 0 && maxRate <= 1, s"maxRate must be in (0,1], got $maxRate")
    val reserved = Seq("_stratum", "_n", "_maxn", "_rate")
    val clash = df.columns.intersect(reserved)
    require(clash.isEmpty,
      s"temperatureMix reserves ${reserved.mkString("/")}; input already " +
        s"has ${clash.mkString(", ")} — rename first")
    val counts = df.groupBy(stratum.as("_stratum"))
      .agg(count(lit(1)).as("_n"))
    val maxN = counts.agg(max(col("_n")).as("_maxn"))
    val rated = df
      .join(counts, stratum === col("_stratum"))
      .crossJoin(broadcast(maxN))
      .withColumn("_rate",
        lit(maxRate) * sqrt(col("_maxn").cast("double"))
          / sqrt(col("_n").cast("double")))
    weightedSample(rated, key, col("_rate"))
      .drop("_stratum", "_n", "_maxn", "_rate")
  }

  /** Target-proportion corpus mix — the "data mixture" step where the
    * recipe is EXPLICIT (e.g. 50% web / 30% wiki / 20% books): per-stratum
    * keep rates that hit the target proportions in expectation while
    * keeping as much data as possible. The binding stratum (smallest
    * `n_s / p_s`) keeps everything; every other stratum thins to match:
    * total `T = min_s(n_s / p_s)`, `rate_s = p_s · T / n_s`. Strata
    * absent from `targets` are dropped (rate 0); target strata absent
    * from the data are ignored (no engine can manufacture rows — the
    * realized mixture is then the renormalized remainder, which the
    * caller can detect from [[graft.functions.Profile.profile]] counts).
    *
    * Composes [[weightedSample]] over the stratum-count table (group-
    * cardinality-sized, broadcast by AQE) — one count pass + one
    * codegen'd filter, zero extra shuffle of the data. Deterministic
    * across engines: the rate arithmetic is three exactly-rounded IEEE
    * ops in fixed order (`n/p`, global min, `(p·T)/n`) and the rate
    * quantizes to 1/65536ths before the hash compare. */
  def targetMixture(df: DataFrame, stratum: Column, key: Column,
      targets: Map[String, Double]): DataFrame = {
    require(targets.nonEmpty, "targets must be non-empty")
    targets.foreach { case (s, p) =>
      require(p > 0 && p.isFinite, s"target for '$s' must be finite and positive, got $p") }
    val reserved = Seq("_stratum", "_n", "_p", "_quot", "_t", "_rate")
    val clash = df.columns.intersect(reserved)
    require(clash.isEmpty,
      s"targetMixture reserves ${reserved.mkString("/")}; input has ${clash.mkString(", ")}")
    val spark = df.sparkSession
    val tdf = spark.createDataFrame(
      spark.sparkContext.parallelize(
        targets.toSeq.sortBy(_._1)
          .map { case (s, p) => org.apache.spark.sql.Row(s, p) }, 1),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("_stratum",
          org.apache.spark.sql.types.StringType, nullable = false),
        org.apache.spark.sql.types.StructField("_p",
          org.apache.spark.sql.types.DoubleType, nullable = false))))
    val counts = df.groupBy(stratum.cast("string").as("_stratum"))
      .agg(count(lit(1)).cast("double").as("_n"))
    val joined = counts.join(tdf, "_stratum")
      .withColumn("_quot", col("_n") / col("_p"))
    val tmin = joined.agg(min(col("_quot")).as("_t"))
    val rated = df
      .join(joined.select(col("_stratum"), col("_n"), col("_p")),
        stratum.cast("string") === col("_stratum"))
      .crossJoin(broadcast(tmin))
      .withColumn("_rate", col("_p") * col("_t") / col("_n"))
    weightedSample(rated, key, col("_rate"))
      .drop("_stratum", "_n", "_p", "_t", "_rate")
  }

  /** Deterministic global shuffle order — the training-order permutation:
    * every row gets its rank in md5(key) order (`0..n-1`). rand() orders
    * differ per run and engine; hash order is a pure function of the key
    * set, so shards cut from it are reproducible everywhere.
    *
    * The sequential definition is a GLOBAL row_number window — one task
    * sees every row. This runs the two-pass order-statistics shape
    * instead: rows land in 256 md5-prefix buckets (uniform by
    * construction), per-bucket counts become driver-side prefix offsets
    * (256 longs), and the rank is offset + in-bucket row_number — no task
    * ever holds more than n/256 rows. `key` must be unique per row (it is
    * the order tiebreak after the full md5). */
  def shuffleOrder(df: DataFrame, key: Column,
      posCol: String = "shuffle_pos"): DataFrame = {
    val reserved = Seq(posCol, "_h", "_hbucket")
    val clash = df.columns.intersect(reserved)
    require(clash.isEmpty,
      s"shuffleOrder reserves ${reserved.mkString("/")}; input has ${clash.mkString(", ")}")
    val keyed = df.withColumn("_h", md5(key))
      .withColumn("_hbucket", substring(col("_h"), 1, 2))
    val counts = keyed.groupBy(col("_hbucket")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val hex = "0123456789abcdef"
    val buckets = for (a <- hex; b <- hex) yield s"$a$b"
    val offsets = {
      var acc = 0L
      buckets.map { bk => val p = bk -> acc; acc += counts.getOrElse(bk, 0L); p }
    }
    val offsetCol = element_at(
      map(offsets.flatMap { case (bk, o) => Seq(lit(bk), lit(o)) }: _*),
      col("_hbucket"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("_hbucket")).orderBy(col("_h"), key)
    keyed
      .withColumn(posCol, row_number().over(w) - 1 + offsetCol)
      .drop("_h", "_hbucket")
  }

  /** Curriculum ordering — the easy-to-hard training permutation: every
    * row's EXACT global position (`0..n-1`) in (`difficulty` asc, `key`)
    * order, the schedule curriculum-learning consumes (Bengio et al.
    * 2009) with any difficulty signal: token count (short-first),
    * perplexity ([[LangModel.perplexityKn]] — predictable-first), or a
    * quality score. Deterministic: position is a pure function of the
    * data, so shards cut from it are reproducible across engines and
    * runs ([[shuffleOrder]]'s contract with a MEANINGFUL order instead
    * of a hash).
    *
    * The sequential definition is a global row_number window — one task
    * sees every row. This runs the range-shuffle two-pass instead
    * (the [[graft.functions.Normalize.rankTransform]] shape): rows
    * range-partition on (difficulty, key) so partitions tile the global
    * order, per-partition counts fold to driver prefix offsets (one
    * long per partition), and position = offset + in-partition
    * row_number − 1. `key` must be unique per row (the total-order
    * tiebreak) and `difficulty` non-null (a null sorts differently
    * across engines — gate or fill first). */
  def curriculumOrder(df: DataFrame, difficulty: Column, key: Column,
      posCol: String = "curriculum_pos"): DataFrame = {
    val reserved = Seq(posCol, "_diff", "_ckey", "_pid")
    val clash = df.columns.intersect(reserved)
    require(clash.isEmpty,
      s"curriculumOrder reserves ${reserved.mkString("/")}; input has ${clash.mkString(", ")}")
    val spark = df.sparkSession
    val parts = spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val ranged = df.withColumn("_diff", difficulty).withColumn("_ckey", key)
      .repartitionByRange(parts, col("_diff"), col("_ckey"))
      .withColumn("_pid", spark_partition_id())
      .persist()
    // pass 1: per-partition row counts → driver prefix offsets (≤ one
    // long per shuffle partition — bounded metadata)
    val totals = ranged.groupBy(col("_pid")).agg(count(lit(1)).as("_t"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val offsets = totals.zip(totals.scanLeft(0L)(_ + _._2))
      .map { case ((pid, _), off) => pid -> off }
    val offCol =
      if (offsets.isEmpty) lit(0L)
      else element_at(
        map(offsets.flatMap { case (p, o) => Seq(lit(p), lit(o)) }: _*),
        col("_pid"))
    // pass 2: in-partition row_number over the tiled order
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("_pid")).orderBy(col("_diff"), col("_ckey"))
    graft.AutoUnpersist.afterFirstUse(
      ranged.withColumn(posCol, row_number().over(w) - 1 + offCol)
        .drop("_diff", "_ckey", "_pid"),
      ranged)
  }

  /** Per-stratum token quota — "cap every source at `budget` tokens":
    * walk each stratum in md5(key) order and keep rows while the running
    * token total stays within budget (greedy deterministic fill). One
    * shuffle on the stratum key; the cumsum window partitions by stratum,
    * so no task concentrates more than a stratum. Deterministic: the kept
    * set is a pure function of the data, reproducible in any engine. */
  def tokenQuota(df: DataFrame, stratum: Column, key: Column,
      tokens: Column, budget: Long): DataFrame = {
    require(budget >= 0, s"budget must be non-negative, got $budget")
    require(!df.columns.contains("_cum_tokens"),
      "tokenQuota reserves the internal column _cum_tokens; rename it first")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(stratum).orderBy(md5(key), key)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    df.withColumn("_cum_tokens", sum(tokens).over(w))
      .filter(col("_cum_tokens") <= budget)
      .drop("_cum_tokens")
  }

  /** Balanced stratified sample: exactly `min(n, |stratum|)` rows per
    * stratum, chosen by md5 order of the row key — deterministic,
    * engine-independent (DuckDB reproduces it with a row_number window),
    * and a pure function of the data, so re-runs and late additions
    * never reshuffle previously-selected rows within an unchanged
    * stratum. This is the "cap every language/source at N docs" mixture
    * step of corpus assembly.
    *
    * Scale shape: one hash shuffle on the stratum key and a per-stratum
    * top-n window — no stratum ever concentrates more than its own rows
    * in a task, and there is no driver-side state at all. A skewed
    * stratum is inherent to the operator's semantics (its rows must meet
    * to be ranked); for corpus-scale strata apply [[hashSample]] first to
    * pre-thin, then rank exactly. */
  def stratifiedSample(df: DataFrame, stratum: Column, key: Column,
      n: Int): DataFrame = {
    require(!df.columns.contains("_sel"),
      "stratifiedSample reserves the internal column _sel; rename it first")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(stratum).orderBy(md5(key), key)
    df.withColumn("_sel", row_number().over(w))
      .filter(col("_sel") <= n)
      .drop("_sel")
  }
}
