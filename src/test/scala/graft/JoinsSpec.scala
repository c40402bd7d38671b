package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.operators.Joins

/** As-of join and salted-join operators. */
class JoinsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Int): Timestamp = Timestamp.valueOf(f"2024-01-01 00:$min%02d:00")

  test("asofJoin attaches the latest prior right ts, inclusive at equality") {
    val left = Seq((10L, ts(5), 1L), (11L, ts(20), 1L), (12L, ts(3), 2L))
      .toDF("event_id", "ts", "user_id")
    val right = Seq((ts(5), 1L), (ts(15), 1L), (ts(30), 1L), (ts(10), 2L))
      .toDF("ts", "user_id")
    val got = Joins.asofJoin(left, right, "user_id", "ts", "prev_ts")
      .orderBy("event_id")
    assert(rows(got.select("event_id", "prev_ts")) == Seq(
      Seq(10L, ts(5)),   // inclusive: right at exactly ts(5)
      Seq(11L, ts(15)),  // latest prior of {5,15}
      Seq(12L, null)     // user 2 has no prior right row
    ))
  }

  test("asofJoin preserves left payload columns and row count") {
    val left = Seq((1L, ts(9), 7L, "x", 1.5)).toDF("event_id", "ts", "user_id", "tag", "v")
    val right = Seq((ts(1), 7L)).toDF("ts", "user_id")
    val got = Joins.asofJoin(left, right, "user_id", "ts", "prev_ts")
    assert(got.columns.toSeq == Seq("event_id", "ts", "user_id", "tag", "v", "prev_ts"))
    assert(got.count() == 1)
    assert(rows(got).head == Seq(1L, ts(9), 7L, "x", 1.5, ts(1)))
  }

  test("saltedJoin equals the plain join (incl. a pathologically skewed key)") {
    val large = ((1 to 500).map(i => ("hot", i)) ++ Seq(("a", 1), ("b", 2)))
      .toDF("k", "v")
    val small = Seq(("hot", 10), ("a", 20), ("c", 30)).toDF("k", "w")
    val plain = large.join(small, "k")
    val salted = Joins.saltedJoin(large, small, "k", saltBuckets = 8)
    assert(salted.count() == plain.count())
    assert(rows(salted.orderBy("k", "v", "w")) == rows(plain.orderBy("k", "v", "w")))
  }
}
