package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.functions.Sampling
import graft.operators.{Grouped, Resample}

/** Resample/LOCF, weighted Bernoulli sampling, and per-group mode —
  * gap/tie semantics the sf oracle data can't isolate. Oracle parity at
  * sf is `resample_locf` / `weighted_sample` / `groupby_mode`. */
class ResampleSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Long) = new Timestamp(min * 60000L)

  test("resampleLocf fills gaps with the last observation, counts zero") {
    // user 1: events in buckets 0 and 3 (hours) — buckets 1,2 are gaps
    val ev = Seq(
      (1L, ts(5), 10L, 1.5),   // hour 0
      (1L, ts(20), 11L, 2.5),  // hour 0, later → bucket-last
      (1L, ts(185), 12L, 9.0), // hour 3
      (2L, ts(70), 20L, 4.0)   // user 2: single bucket
    ).toDF("user_id", "ts", "event_id", "value")
    val got = Resample.resampleLocf(ev, bucketMinutes = 60)
      .orderBy("user_id", "bucket")
      .select(col("user_id"), col("n_obs"), col("value_locf"))
      .as[(Long, Long, Double)].collect().toSeq
    assert(got == Seq(
      (1L, 2L, 2.5), // hour 0: two events, last by ts = 2.5
      (1L, 0L, 2.5), // hour 1: gap → carried
      (1L, 0L, 2.5), // hour 2: gap → carried
      (1L, 1L, 9.0), // hour 3
      (2L, 1L, 4.0)))
  }

  test("resampleLocf bucket-last tie on ts breaks by event_id") {
    val ev = Seq(
      (1L, ts(5), 7L, 1.0),
      (1L, ts(5), 9L, 3.0) // same ts, higher event_id wins
    ).toDF("user_id", "ts", "event_id", "value")
    val got = Resample.resampleLocf(ev, 60)
      .select("value_locf").as[Double].collect().toSeq
    assert(got == Seq(3.0))
  }

  test("weightedSample: rate 0 keeps nothing, rate 1 keeps all, monotone in rate") {
    val df = (1L to 400L).toDF("id")
    def kept(rate: Double): Set[Long] =
      Sampling.weightedSample(df, col("id").cast("string"), lit(rate))
        .as[Long].collect().toSet
    assert(kept(0.0).isEmpty)
    assert(kept(1.0).size == 400)
    val (k25, k50) = (kept(0.25), kept(0.5))
    assert(k25.subsetOf(k50), "a kept row must stay kept at a higher rate")
    // rough proportionality (md5 is uniform; 400 rows, generous bounds)
    assert(k25.size > 50 && k25.size < 150, s"got ${k25.size}")
    assert(k50.size > 140 && k50.size < 260, s"got ${k50.size}")
    assert(kept(0.5) == kept(0.5), "determinism")
  }

  test("temperatureMix flattens toward small strata at sqrt rates") {
    val df = ((1L to 800L).map(i => (i, "big")) ++ (801L to 1000L).map(i => (i, "small")))
      .toDF("id", "src")
    val kept = Sampling.temperatureMix(df, col("src"), col("id").cast("string"))
      .groupBy("src").count()
      .as[(String, Long)].collect().toMap
    // T=2 flattening: kept ∝ sqrt(n). big keeps ~50% (the maxRate
    // anchor); small's rate 0.5*sqrt(800/200) = 1.0 clamps to keep-ALL —
    // the 4:1 input skew flattens to ~2:1 kept (rate ∝ +sqrt(n) would
    // AMPLIFY it to 8:1, the round-14 inversion this pins against)
    assert(kept("big") > 320 && kept("big") < 480, s"big=${kept("big")}")
    assert(kept("small") == 200, s"small=${kept("small")}")
    assert(kept("big").toDouble / kept("small") < 2.5,
      s"skew must flatten below the 4:1 input, got ${kept("big")}:${kept("small")}")
    // determinism: same inputs, same rows
    val again = Sampling.temperatureMix(df, col("src"), col("id").cast("string"))
      .as[(Long, String)].collect().toSet
    assert(again == Sampling.temperatureMix(df, col("src"), col("id").cast("string"))
      .as[(Long, String)].collect().toSet)
  }

  test("samplers validate their knobs loudly") {
    val df = Seq((1L, "a")).toDF("id", "src")
    intercept[IllegalArgumentException] {
      Sampling.trainTestSplit(df, col("id").cast("string"), testBytes = 256)
    }
    intercept[IllegalArgumentException] {
      Sampling.trainTestSplit(df, col("id").cast("string"), testBytes = -1)
    }
    intercept[IllegalArgumentException] {
      Sampling.leakageSafeSplit(df, "id", testBytes = 300)
    }
    // reserved-column clash is a clear refusal, not an ambiguous-ref error
    val clash = Seq((1L, "a", 2L)).toDF("id", "src", "_n")
    intercept[IllegalArgumentException] {
      Sampling.temperatureMix(clash, col("src"), col("id").cast("string"))
    }
  }

  test("funnel requires strict stage order and propagates drop-out nulls") {
    import graft.operators.Funnel
    val ev = Seq(
      // user 1: full conversion, but only via the SECOND view->click path
      (1L, ts(10), "view"), (1L, ts(5), "click"),   // click before view: no
      (1L, ts(20), "click"), (1L, ts(30), "purchase"),
      // user 2: view only
      (2L, ts(10), "view"),
      // user 3: purchase precedes click — stage 3 stays null
      (3L, ts(10), "view"), (3L, ts(20), "purchase"), (3L, ts(30), "click"),
      // user 4: never viewed — not in the funnel at all
      (4L, ts(10), "click"), (4L, ts(20), "purchase")
    ).map { case (u, t, e) => (u, t, e) }.toDF("user_id", "ts", "event_type")
    val got = Funnel.funnel(ev, Seq("view", "click", "purchase"))
      .collect().map(r => r.getLong(0) ->
        ((r.get(1), r.get(2), r.get(3)))).toMap
    assert(got.keySet == Set(1L, 2L, 3L))
    assert(got(1L) == ((ts(10), ts(20), ts(30))))
    assert(got(2L) == ((ts(10), null, null)))
    assert(got(3L) == ((ts(10), ts(30), null))) // click at 30, no purchase after
  }

  test("funnelLag: per-pair converter counts and exact avg/max lag seconds") {
    import graft.operators.Funnel
    val ev = Seq(
      // user 1 converts fully: view@10 -> click@20 (600s) -> purchase@30 (600s)
      (1L, ts(10), "view"), (1L, ts(20), "click"), (1L, ts(30), "purchase"),
      // user 2: view@10 -> click@40 (1800s), no purchase
      (2L, ts(10), "view"), (2L, ts(40), "click"),
      // user 3: view only
      (3L, ts(10), "view")
    ).toDF("user_id", "ts", "event_type")
    val got = Funnel.funnelLag(ev, Seq("view", "click", "purchase"))
      .orderBy("stage_from")
      .as[(String, String, Long, Option[Double], Option[Double])]
      .collect().toSeq
    assert(got == Seq(
      ("click", "purchase", 1L, Some(600.0), Some(600.0)),
      ("view", "click", 2L, Some(1200.0), Some(1800.0))))
    // nobody past stage 1: lag stats are null, count is zero
    val none = Funnel.funnelLag(
        Seq((1L, ts(1), "view")).toDF("user_id", "ts", "event_type"),
        Seq("view", "click"))
      .as[(String, String, Long, Option[Double], Option[Double])]
      .collect().toSeq
    assert(none == Seq(("view", "click", 0L, None, None)))
  }

  test("retention cohorts: offsets count distinct-week activity per cohort") {
    import graft.operators.Funnel
    def week(w: Long, m: Long = 0) = new java.sql.Timestamp(w * 604800000L + m * 60000L)
    val ev = Seq(
      (1L, week(0)), (1L, week(0, 30)), (1L, week(1)), // cohort 0, offsets 0,1
      (2L, week(0)), (2L, week(2)),                    // cohort 0, offsets 0,2
      (3L, week(1)), (3L, week(2))                     // cohort 1, offsets 0,1
    ).toDF("user_id", "ts")
    val got = Funnel.retentionCohorts(ev)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (0L, 0L, 2L), (0L, 1L, 1L), (0L, 2L, 1L),
      (1L, 0L, 1L), (1L, 1L, 1L)))
  }

  test("winsorize clamps into per-group quantile bounds, leaves the middle") {
    val df = ((1 to 9).map(v => ("a", v.toDouble)) :+ ("b", 100.0))
      .zipWithIndex.map { case ((k, v), i) => (i.toLong, k, v) }
      .toDF("event_id", "event_type", "value")
    val got = graft.functions.Quantiles.winsorize(df, "event_type", "value",
        lo = 0.25, hi = 0.75)
      .orderBy("event_id")
      .select("event_type", "value", "value_w")
      .as[(String, Double, Double)].collect().toSeq
    // group a: p25 = 3, p75 = 7 (interpolated on 1..9)
    assert(got.filter(_._1 == "a").map(_._3) ==
      Seq(3.0, 3.0, 3.0, 4.0, 5.0, 6.0, 7.0, 7.0, 7.0))
    // singleton group: both bounds equal the value — untouched
    assert(got.find(_._1 == "b").get._3 == 100.0)
  }

  test("modeOf pins ties to the smallest value") {
    val df = Seq(("a", "x"), ("a", "y"), ("a", "y"), ("a", "x"), // tie x/y
      ("b", "z")).toDF("k", "v")
    val got = Grouped.modeOf(df, "k", "v").orderBy("k")
      .as[(String, String, Long)].collect().toSeq
    assert(got == Seq(("a", "x", 2L), ("b", "z", 1L)))
  }
}
