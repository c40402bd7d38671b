package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.functions.EventStats

/** EventStats operators vs brute-force definitions on random data. */
class EventStatsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(day: Int, min: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-${day}%02d 00:$min%02d:00")

  private val evGen = Gen.listOfN(60,
    Gen.zip(Gen.choose(1L, 8L), Gen.choose(1, 9), Gen.choose(0, 59),
      Gen.oneOf("a", "b", "c")))

  test("runningSum == sequential cumsum for random values and sparse keys") {
    for (seed <- 1 to 6) {
      val data = Gen.listOfN(50, Gen.zip(Gen.choose(-1000L, 1000L), Gen.choose(0L, 50L)))
        .pureApply(Gen.Parameters.default, Seed(seed.toLong))
        .map(_._1).distinct.zipWithIndex
        .map { case (k, i) => (k, (i % 7).toLong) }
      val df = data.toDF("k", "v")
      val got = EventStats.runningSum(df, col("k"), col("v"), "cum", nBuckets = 8)
        .select("k", "cum").as[(Long, Long)].collect().toMap
      var acc = 0L
      val expected = data.sortBy(_._1).map { case (k, v) => acc += v; k -> acc }.toMap
      assert(got == expected, s"seed=$seed")
    }
  }

  test("runningSum on empty input yields null column, not a crash") {
    val df = Seq.empty[(Long, Long)].toDF("k", "v")
    assert(EventStats.runningSum(df, col("k"), col("v"), "cum").count() == 0L)
  }

  test("cumulativeDistinctUsers == brute-force distinct recount per day") {
    for (seed <- 1 to 6) {
      val evs = evGen.pureApply(Gen.Parameters.default, Seed(seed.toLong))
        .map { case (u, day, min, _) => (u, ts(day, min)) }
      val df = evs.toDF("user_id", "ts")
      val got = EventStats.cumulativeDistinctUsers(df, "user_id", "ts")
        .orderBy("day")
        .select(col("day").cast("string"), col("new_users"), col("cum_users"))
        .as[(String, Long, Long)].collect().toSeq

      val days = evs.map(_._2.toLocalDateTime.toLocalDate).distinct.sorted
      val expected = days.map { d =>
        val until = evs.filter(!_._2.toLocalDateTime.toLocalDate.isAfter(d)).map(_._1).toSet
        val before = evs.filter(_._2.toLocalDateTime.toLocalDate.isBefore(d)).map(_._1).toSet
        (d.toString, (until -- before).size.toLong, until.size.toLong)
      }
      assert(got == expected, s"seed=$seed")
      // cumulative column is monotone and ends at the total distinct count
      assert(got.last._3 == evs.map(_._1).distinct.size.toLong)
    }
  }

  test("rollingActiveUsers == brute-force trailing-window recount") {
    for ((seed, win) <- Seq((1, 1), (2, 3), (3, 7), (4, 30))) {
      val evs = evGen.pureApply(Gen.Parameters.default, Seed(seed.toLong))
        .map { case (u, day, min, _) => (u, ts(day, min)) }
      val df = evs.toDF("user_id", "ts")
      val got = EventStats.rollingActiveUsers(df, "user_id", "ts", win)
        .orderBy("day")
        .select(col("day").cast("string"), col("active_users"))
        .as[(String, Long)].collect().toSeq

      val days = evs.map(_._2.toLocalDateTime.toLocalDate).distinct.sorted
      val expected = days.map { d =>
        val lo = d.minusDays(win - 1L)
        val active = evs.filter { case (_, t) =>
          val ed = t.toLocalDateTime.toLocalDate
          !ed.isBefore(lo) && !ed.isAfter(d)
        }.map(_._1).toSet
        (d.toString, active.size.toLong)
      }
      assert(got == expected, s"seed=$seed win=$win")
    }
  }

  test("transitionCounts == brute-force adjacent pairs per user") {
    for (seed <- 1 to 6) {
      val evs = evGen.pureApply(Gen.Parameters.default, Seed(seed.toLong))
        .zipWithIndex
        .map { case ((u, day, min, t), i) => (i.toLong, u, ts(day, min), t) }
      val df = evs.toDF("event_id", "user_id", "ts", "event_type")
      val got = EventStats
        .transitionCounts(df, "user_id", "event_type", "ts", "event_id")
        .as[(String, String, Long)].collect()
        .map { case (a, b, n) => (a, b) -> n }.toMap

      val expected = evs.groupBy(_._2).toSeq.flatMap { case (_, rows) =>
        rows.sortBy(r => (r._3.getTime, r._1)).map(_._4).sliding(2).collect {
          case Seq(a, b) => (a, b)
        }
      }.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      assert(got == expected, s"seed=$seed")
      // total transitions = total events minus one per active user
      assert(got.values.sum ==
        evs.length - evs.map(_._2).distinct.size)
    }
  }
}
