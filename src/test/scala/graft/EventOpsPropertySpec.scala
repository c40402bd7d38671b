package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.operators.{Cdc, Joins}

/** Property tests for the event-tier operators with the thinnest oracle
  * surface (`join_asof_tol`, `scd2_intervals` — round-9 VERDICT item 5):
  * random feeds checked against a naive in-memory oracle / algebraic
  * invariants. Plain ScalaCheck generators with fixed seeds, same pattern
  * as [[PropertySpec]]. */
class EventOpsPropertySpec extends SparkSpec {
  import spark.implicits._

  // ---- as-of join with tolerance ------------------------------------

  private val asofGen = for {
    left  <- Gen.listOfN(40, Gen.zip(Gen.oneOf("a", "b", "c"), Gen.choose(0L, 100L)))
    right <- Gen.listOfN(25, Gen.zip(Gen.oneOf("a", "b", "c", "d"), Gen.choose(0L, 100L)))
    tol   <- Gen.choose(0L, 60L)
  } yield (left, right, tol)

  test("asofJoinWithin == naive latest-prior-within-tolerance oracle") {
    for (seed <- 1 to 8) {
      val (l, r, tol) = asofGen.pureApply(Gen.Parameters.default, Seed(seed.toLong))
      val left = l.zipWithIndex.map { case ((k, t), i) => (k, t, i) }
        .toDF("k", "sec", "v")
        .withColumn("ts", timestamp_seconds(col("sec"))).drop("sec")
        .select("k", "ts", "v")
      val right = r.toDF("k", "sec")
        .withColumn("ts", timestamp_seconds(col("sec"))).drop("sec")

      val got = Joins.asofJoinWithin(left, right, "k", "ts", "asof", tol)
        .select(col("v"), unix_timestamp(col("asof")).as("asof_sec"))
        .collect().map(row => row.getInt(0) ->
          (if (row.isNullAt(1)) None else Some(row.getLong(1)))).toMap

      val expected = l.zipWithIndex.map { case ((k, t), i) =>
        val cands = r.collect { case (rk, rt) if rk == k && rt <= t && rt >= t - tol => rt }
        i -> cands.sorted.lastOption
      }.toMap
      assert(got == expected, s"seed=$seed tol=$tol")
    }
  }

  test("asof match is <= left ts, and tolerance widening is monotone") {
    val (l, r, _) = asofGen.pureApply(Gen.Parameters.default, Seed(99L))
    val left = l.zipWithIndex.map { case ((k, t), i) => (k, t, i) }
      .toDF("k", "sec", "v")
      .withColumn("ts", timestamp_seconds(col("sec"))).drop("sec")
      .select("k", "ts", "v")
    val right = r.toDF("k", "sec")
      .withColumn("ts", timestamp_seconds(col("sec"))).drop("sec")

    def matches(tol: Long): Map[Int, Option[Long]] =
      Joins.asofJoinWithin(left, right, "k", "ts", "asof", tol)
        .select(col("v"), unix_timestamp(col("asof")).as("a"), unix_timestamp(col("ts")).as("t"))
        .collect().map { row =>
          if (!row.isNullAt(1))
            assert(row.getLong(1) <= row.getLong(2), "asof match must be <= left ts")
          row.getInt(0) -> (if (row.isNullAt(1)) None else Some(row.getLong(1)))
        }.toMap

    val tols = Seq(0L, 5L, 20L, 60L, 120L).map(t => t -> matches(t))
    // Widening the tolerance can only turn None into Some; a Some value is
    // the unconstrained latest-prior match and never changes.
    for (Seq((t1, m1), (t2, m2)) <- tols.sliding(2)) {
      m1.foreach { case (v, a1) =>
        (a1, m2(v)) match {
          case (Some(x), y) => assert(y == Some(x), s"tol $t1->$t2 changed match for $v")
          case (None, _)    => () // may appear at the wider tolerance
        }
      }
    }
    // And the widest tolerance equals the unbounded as-of.
    val unbounded = Joins.asofJoin(left, right, "k", "ts", "asof")
      .select(col("v"), unix_timestamp(col("asof")).as("a"))
      .collect().map(row => row.getInt(0) ->
        (if (row.isNullAt(1)) None else Some(row.getLong(1)))).toMap
    assert(matches(120L) == unbounded)
  }

  test("asofJoinForwardWithin == naive earliest-following-within-horizon oracle") {
    for (seed <- 11 to 16) {
      val (l, r, tol) = asofGen.pureApply(Gen.Parameters.default, Seed(seed.toLong))
      val left = l.zipWithIndex.map { case ((k, t), i) => (k, t, i) }
        .toDF("k", "sec", "v")
        .withColumn("ts", timestamp_seconds(col("sec"))).drop("sec")
        .select("k", "ts", "v")
      val right = r.toDF("k", "sec")
        .withColumn("ts", timestamp_seconds(col("sec"))).drop("sec")

      val got = Joins.asofJoinForwardWithin(left, right, "k", "ts", "next", tol)
        .select(col("v"), unix_timestamp(col("next")).as("n"), unix_timestamp(col("ts")).as("t"))
        .collect().map { row =>
          if (!row.isNullAt(1))
            assert(row.getLong(1) >= row.getLong(2), "forward match must be >= left ts")
          row.getInt(0) -> (if (row.isNullAt(1)) None else Some(row.getLong(1)))
        }.toMap

      val expected = l.zipWithIndex.map { case ((k, t), i) =>
        val cands = r.collect { case (rk, rt) if rk == k && rt >= t && rt <= t + tol => rt }
        i -> cands.sorted.headOption
      }.toMap
      assert(got == expected, s"seed=$seed tol=$tol")
    }
  }

  test("forward-horizon widening is monotone and converges to unbounded") {
    val (l, r, _) = asofGen.pureApply(Gen.Parameters.default, Seed(77L))
    val left = l.zipWithIndex.map { case ((k, t), i) => (k, t, i) }
      .toDF("k", "sec", "v")
      .withColumn("ts", timestamp_seconds(col("sec"))).drop("sec")
      .select("k", "ts", "v")
    val right = r.toDF("k", "sec")
      .withColumn("ts", timestamp_seconds(col("sec"))).drop("sec")
    def matches(tol: Long): Map[Int, Option[Long]] =
      Joins.asofJoinForwardWithin(left, right, "k", "ts", "next", tol)
        .select(col("v"), unix_timestamp(col("next")).as("n"))
        .collect().map(row => row.getInt(0) ->
          (if (row.isNullAt(1)) None else Some(row.getLong(1)))).toMap
    val tols = Seq(0L, 5L, 20L, 60L, 120L).map(t => t -> matches(t))
    for (Seq((t1, m1), (t2, m2)) <- tols.sliding(2)) {
      m1.foreach { case (v, a1) =>
        (a1, m2(v)) match {
          case (Some(x), y) => assert(y == Some(x), s"horizon $t1->$t2 changed match for $v")
          case (None, _)    => ()
        }
      }
    }
    val unbounded = Joins.asofJoinForward(left, right, "k", "ts", "next")
      .select(col("v"), unix_timestamp(col("next")).as("n"))
      .collect().map(row => row.getInt(0) ->
        (if (row.isNullAt(1)) None else Some(row.getLong(1)))).toMap
    assert(matches(120L) == unbounded)
  }

  // ---- SCD2 interval history ----------------------------------------

  private val feedGen: Gen[List[(String, Long, String)]] = for {
    pairs <- Gen.listOfN(50, Gen.zip(Gen.oneOf("k1", "k2", "k3", "k4"),
      Gen.choose(0L, 200L)))
    ops <- Gen.listOfN(50, Gen.oneOf("I", "U", "D"))
  } yield pairs.distinct.zip(ops).map { case ((k, o), op) => (k, o, op) }

  test("scd2History intervals partition each key's timeline") {
    for (seed <- 1 to 8) {
      val feed = feedGen.pureApply(Gen.Parameters.default, Seed(seed.toLong))
      val df = feed.toDF("k", "ord", "op")
      val hist = Cdc.scd2History(df, "k", "ord")
        .select("k", "ord", "op", "valid_from", "valid_to", "version", "is_current")
        .collect()
        .map(r => (r.getString(0), r.getLong(3),
          if (r.isNullAt(4)) None else Some(r.getLong(4)),
          r.getInt(5), r.getBoolean(6)))

      assert(hist.length == feed.length, "one interval row per change")
      hist.groupBy(_._1).foreach { case (k, rows) =>
        val sorted = rows.sortBy(_._2)
        // versions are 1..n in valid_from order
        assert(sorted.map(_._4).toSeq == (1 to sorted.length).toSeq, s"key $k versions")
        // adjacent intervals chain: valid_to == next valid_from
        for (i <- 0 until sorted.length - 1)
          assert(sorted(i)._3.contains(sorted(i + 1)._2),
            s"key $k interval chain broken at ${sorted(i)._2}")
        // exactly the last interval is open and current
        assert(sorted.init.forall(r => r._3.isDefined && !r._5), s"key $k closed rows")
        assert(sorted.last._3.isEmpty && sorted.last._5, s"key $k open row")
        // valid_from values are exactly the key's change orders
        assert(sorted.map(_._2).toSet == feed.collect { case (fk, o, _) if fk == k => o }.toSet)
      }
    }
  }

  test("scd2History throws loudly on an order collision within a key") {
    val df = Seq(("k1", 5L, "I"), ("k1", 5L, "U"), ("k2", 1L, "I"))
      .toDF("k", "ord", "op")
    val e = intercept[Exception] {
      Cdc.scd2History(df, "k", "ord").collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("order collision")), e.getMessage)
  }
}
