package graft

import org.apache.spark.sql.functions._
import graft.functions.{Packing, Sampling}

/** Sequence-packing layout ([[graft.functions.Packing]]) — the
  * distributed two-pass cumsum vs its sequential definition, the
  * overflow-safe bucketing, and the reserved-column guards. Oracle parity
  * at sf is covered by `pack_sequences` / `pack_binstats` in CORRECTNESS;
  * these tests pin the edge cases the oracle data can't reach. */
class PackingSpec extends SparkSpec {
  import spark.implicits._

  private def seqPack(rows: Seq[(Long, Long)], budget: Long): Seq[(Long, Long, Long)] = {
    // sequential definition: running sum in key order
    var acc = 0L
    rows.sortBy(_._1).map { case (k, n) =>
      val off = acc; acc += n; (k, off, off / budget)
    }
  }

  test("packSequences matches the sequential cumsum definition") {
    val rows = (0L until 200L).map(i => (i * 7 % 997, i % 13 + 1))
    val df = rows.toDF("k", "n")
    val packed = Packing.packSequences(df, col("k"), col("n"), budget = 50L, nBuckets = 16)
      .select("k", "stream_offset", "bin")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(packed.toSeq == seqPack(rows, 50L))
  }

  test("bucketing survives key spans past Long.MaxValue/nBuckets (divide-first)") {
    // A multiply-first bucket expression wraps for these keys; divide-first
    // must stay monotone and exact. Keys span ~1.8e19 of range.
    val big = Seq(Long.MinValue / 4, -1000000L, 0L, 1000000L, Long.MaxValue / 4)
      .zipWithIndex.map { case (k, i) => (k, i.toLong + 1) }
    val packed = Packing.packSequences(big.toDF("k", "n"), col("k"), col("n"),
        budget = 3L, nBuckets = 1024)
      .select("k", "stream_offset", "bin")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(packed.toSeq == seqPack(big, 3L))
  }

  test("span overflowing Long fails loudly, not silently") {
    val df = Seq((Long.MinValue, 1L), (Long.MaxValue, 1L)).toDF("k", "n")
    val e = intercept[IllegalArgumentException](
      Packing.packSequences(df, col("k"), col("n"), budget = 10L))
    assert(e.getMessage.contains("span"))
  }

  test("a null-casting order key fails with context, not a cryptic NPE") {
    // (a plain non-numeric STRING key already fails loudly under ANSI
    // mode's cast check; the silent path is a genuinely null key)
    val df = Seq((Some(1L), 3L), (None, 4L)).toDF("k", "n")
    val e = intercept[IllegalArgumentException](
      Packing.packSequences(df, col("k"), col("n"), budget = 10L).count())
    assert(e.getMessage.contains("casts to null"), e.getMessage)
  }

  test("binTexts orders string-NUMERIC keys numerically, matching the offsets") {
    // '9' sorts after '10' lexicographically — the concat must follow the
    // same numeric order the stream offsets were laid out in
    val packed = Seq((2L, "two", 0L, 0L), (9L, "nine", 0L, 0L), (10L, "ten", 0L, 0L))
      .toDF("k", "text", "bin", "stream_offset")
      .withColumn("k", col("k").cast("string"))
    val got = Packing.binTexts(packed, "k", "text")
      .select("bin_text").as[String].head()
    assert(got == "two nine ten", s"got '$got'")
  }

  test("reserved output columns in the input fail fast") {
    val df = Seq((1L, 2L)).toDF("k", "n_tokens")
    val e = intercept[IllegalArgumentException](
      Packing.packSequences(df, col("k"), col("k"), budget = 10L))
    assert(e.getMessage.contains("n_tokens"))
  }

  test("binTexts concatenates in key order regardless of partitioning") {
    val docs = (0L until 30L).map(i => (i, s"d$i word", 7L))
    def run(parts: Int) = {
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(docs, parts)).toDF("k", "text", "n")
      Packing.binTexts(
          Packing.packSequences(df, col("k"), col("n"), budget = 20L),
          keyCol = "k", textCol = "text")
        .orderBy("bin")
        .select("bin", "n_docs", "bin_text")
        .as[(Long, Long, String)].collect().toSeq
    }
    val one = run(1)
    assert(run(7) == one) // collect_list order is pinned by the sort
    // sequential reference: budget 20 / 7 tokens → bins of 3 docs
    assert(one.head == ((0L, 3L, "d0 word d1 word d2 word")))
    assert(one.map(_._2).sum == 30L)
  }

  test("binStats counts boundary-spanning docs") {
    // budget 10: doc A [0,8) no span, B [8,14) spans, C [14,18) no span
    val df = Seq((1L, 8L), (2L, 6L), (3L, 4L)).toDF("k", "n")
    val packed = Packing.packSequences(df, col("k"), col("n"), budget = 10L)
    val stats = Packing.binStats(packed, budget = 10L)
      .select("bin", "n_docs", "n_tokens_starting", "n_spanning")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(stats == Seq((0L, 2L, 14L, 1L), (1L, 1L, 4L, 0L)))
  }

  test("mixtureSample keeps ~rate per stratum, exact at the 0/1 edges") {
    val df = (1 to 2000).map(i => (i.toLong, if (i % 2 == 0) "a" else "b"))
      .toDF("id", "g")
    val k = col("id").cast("string")
    val got = Sampling.mixtureSample(df, col("g"), k,
      Map("a" -> 0.75), defaultRate = 0.25)
    val byG = got.groupBy("g").count()
      .as[(String, Long)].collect().toMap
    // 1000 rows per stratum; md5 is uniform — allow ±10% absolute
    assert(math.abs(byG("a") - 750L) < 100, s"stratum a kept ${byG("a")}")
    assert(math.abs(byG("b") - 250L) < 100, s"stratum b kept ${byG("b")}")
    // rate 1.0 keeps everything, 0.0 keeps nothing
    assert(Sampling.mixtureSample(df, col("g"), k, Map.empty, 1.0).count() == 2000)
    assert(Sampling.mixtureSample(df, col("g"), k, Map.empty, 0.0).count() == 0)
    // deterministic: the kept id set is a pure function of the key
    val twice = Sampling.mixtureSample(df, col("g"), k, Map("a" -> 0.75), 0.25)
    assert(got.select("id").as[Long].collect().sorted.toSeq ==
      twice.select("id").as[Long].collect().sorted.toSeq)
  }

  test("targetMixture hits target proportions, binding stratum keeps all") {
    // 1200 a / 600 b / 300 c; targets 50/30/20 → T = min(2400, 2000, 1500)
    // = 1500: c is binding (rate 1.0), a thins to 750, b to 450.
    val df = (1 to 2100).map { i =>
      (i.toLong, if (i <= 1200) "a" else if (i <= 1800) "b" else "c")
    }.toDF("id", "g")
    val k = col("id").cast("string")
    val got = Sampling.targetMixture(df, col("g"), k,
      Map("a" -> 0.5, "b" -> 0.3, "c" -> 0.2))
    val byG = got.groupBy("g").count().as[(String, Long)].collect().toMap
    assert(byG("c") == 300L, s"binding stratum must keep all, kept ${byG("c")}")
    assert(math.abs(byG("a") - 750L) < 90, s"stratum a kept ${byG("a")}")
    assert(math.abs(byG("b") - 450L) < 70, s"stratum b kept ${byG("b")}")
    // untargeted strata are dropped
    val withD = df.union(Seq((9999L, "d")).toDF("id", "g"))
    val gotD = Sampling.targetMixture(withD, col("g"), k,
      Map("a" -> 0.5, "b" -> 0.3, "c" -> 0.2))
    assert(gotD.filter(col("g") === "d").count() == 0)
    // a target stratum absent from the data is ignored, not fatal
    val gotMissing = Sampling.targetMixture(df, col("g"), k,
      Map("a" -> 0.5, "zz" -> 0.5))
    assert(gotMissing.filter(col("g") === "a").count() == 1200L)
    // deterministic; invalid targets and reserved columns fail fast
    assert(got.select("id").as[Long].collect().sorted.toSeq ==
      Sampling.targetMixture(df, col("g"), k,
        Map("a" -> 0.5, "b" -> 0.3, "c" -> 0.2))
        .select("id").as[Long].collect().sorted.toSeq)
    intercept[IllegalArgumentException] {
      Sampling.targetMixture(df, col("g"), k, Map("a" -> 0.0))
    }
    intercept[IllegalArgumentException] {
      Sampling.targetMixture(df.withColumn("_rate", lit(1)), col("g"), k,
        Map("a" -> 0.5))
    }
  }

  test("shuffleOrder is the exact md5-order permutation, bucket-distributed") {
    val df = (1L to 500L).toDF("id")
    val got = Sampling.shuffleOrder(df, col("id").cast("string"))
      .as[(Long, Long)].collect()
    // positions are a permutation of 0..n-1
    assert(got.map(_._2).sorted.toSeq == (0L until 500L))
    // and equal to the sequential definition: rank by (md5, key)
    val expected = got.map(_._1).sortBy(id => {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      d.map("%02x".format(_)).mkString
    }).zipWithIndex.map { case (id, i) => id -> i.toLong }.toMap
    got.foreach { case (id, pos) => assert(pos == expected(id), s"id=$id") }
    intercept[IllegalArgumentException](
      Sampling.shuffleOrder(df.withColumn("shuffle_pos", lit(1)), col("id")))
  }

  test("curriculumOrder is the exact (difficulty, key) permutation, " +
      "range-distributed") {
    // non-uniform difficulty with heavy ties: difficulty = id % 7
    val df = (1L to 500L).map(i => (i, i % 7)).toDF("id", "diff")
    val got = Sampling.curriculumOrder(df, col("diff"), col("id"))
      .select("id", "curriculum_pos").as[(Long, Long)].collect()
    assert(got.map(_._2).sorted.toSeq == (0L until 500L))
    val expected = got.map(_._1).sortBy(id => (id % 7, id))
      .zipWithIndex.map { case (id, i) => id -> i.toLong }.toMap
    got.foreach { case (id, pos) => assert(pos == expected(id), s"id=$id") }
    // partitioning-invariant (the range shuffle re-tiles any layout)
    val re = Sampling.curriculumOrder(df.repartition(13), col("diff"), col("id"))
      .select("id", "curriculum_pos").as[(Long, Long)].collect().toMap
    got.foreach { case (id, pos) => assert(re(id) == pos) }
    // all-equal difficulty degrades to pure key order
    val flat = Sampling.curriculumOrder(df, lit(0), col("id"))
      .select("id", "curriculum_pos").as[(Long, Long)].collect()
    flat.foreach { case (id, pos) => assert(pos == id - 1) }
    intercept[IllegalArgumentException](
      Sampling.curriculumOrder(df.withColumn("_pid", lit(1)), col("diff"), col("id")))
    assert(Sampling.curriculumOrder(df.limit(0), col("diff"), col("id")).count() == 0)
  }

  test("tokenQuota greedily fills each stratum to the budget in md5 order") {
    val df = (1 to 60).map(i => (i.toLong, s"s${i % 3}", 10L)).toDF("id", "g", "tok")
    // 20 rows x 10 tokens per stratum; budget 95 keeps exactly 9 per stratum
    val got = Sampling.tokenQuota(df, col("g"), col("id").cast("string"),
      col("tok"), budget = 95L)
    val perG = got.groupBy("g").count().as[(String, Long)].collect().toMap
    assert(perG.values.toSeq == Seq(9L, 9L, 9L), s"got $perG")
    assert(got.columns.toSeq == Seq("id", "g", "tok"), "internal column leaked")
    // a single row larger than the budget is excluded even when first
    val big = Seq((1L, "x", 100L), (2L, "x", 1L)).toDF("id", "g", "tok")
    val kept = Sampling.tokenQuota(big, col("g"), col("id").cast("string"),
      col("tok"), budget = 50L).as[(Long, String, Long)].collect()
    assert(!kept.exists(_._3 == 100L))
  }

  test("stratifiedSample caps each stratum and rejects _sel collisions") {
    val df = (1 to 100).map(i => (i.toLong, s"g${i % 3}")).toDF("id", "g")
    val sampled = Sampling.stratifiedSample(df, col("g"), col("id").cast("string"), 5)
    val counts = sampled.groupBy("g").count().as[(String, Long)].collect().toMap
    assert(counts.values.forall(_ == 5L) && counts.size == 3)
    // deterministic: same rows on re-run
    val again = Sampling.stratifiedSample(df, col("g"), col("id").cast("string"), 5)
    assert(sampled.collect().map(_.toSeq).toSet == again.collect().map(_.toSeq).toSet)
    intercept[IllegalArgumentException](
      Sampling.stratifiedSample(df.withColumn("_sel", lit(1)), col("g"), col("id"), 5))
  }
}
