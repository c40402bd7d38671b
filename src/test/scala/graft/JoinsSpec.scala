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

  test("asofJoinWithin nulls out matches older than the tolerance") {
    val left = Seq((10L, ts(30), 1L), (11L, ts(31), 2L)).toDF("event_id", "ts", "user_id")
    val right = Seq((ts(29), 1L), (ts(5), 2L)).toDF("ts", "user_id")
    val got = Joins.asofJoinWithin(left, right, "user_id", "ts", "prev_ts",
      toleranceSec = 600L) // 10 minutes
      .orderBy("event_id")
    assert(rows(got.select("event_id", "prev_ts")) == Seq(
      Seq(10L, ts(29)), // 1 min old: kept
      Seq(11L, null)    // 26 min old: stale, nulled
    ))
    intercept[IllegalArgumentException](
      Joins.asofJoinWithin(left, right, "user_id", "ts", "p", -1L))
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

  test("bloomPrunedJoin equals the plain join and plants might_contain") {
    // parquet tables, not local Seqs: ConvertToLocalRelation evaluates
    // filters over local relations at OPTIMIZATION time, which would hide
    // the might_contain node from the plan assertion
    val large = Tables.lineitem(spark, sf0001)
    val small = Tables.supplier(spark, sf0001).filter(col("s_nationkey") === 3)
    val plain = large.join(small, col("l_suppkey") === col("s_suppkey"))
    val bloomed = Joins.bloomPrunedJoin(large, small, "l_suppkey", "s_suppkey")
    assert(rows(bloomed.orderBy("l_orderkey", "l_linenumber"))
      == rows(plain.orderBy("l_orderkey", "l_linenumber")))
    assert(bloomed.count() > 0, "test fixture matched nothing")
    // the fact side is pre-filtered by the native might_contain expression
    val p = bloomed.queryExecution.executedPlan.toString()
    assert(p.contains("might_contain"), p.take(1500))
  }

  test("bloomPrunedJoin with an empty small side is empty, same schema") {
    val large = (1L to 100L).map(i => (i, i * 2)).toDF("lk", "v")
    val small = Seq((1L, "x")).toDF("sk", "w").filter(col("sk") < 0)
    val out = Joins.bloomPrunedJoin(large, small, "lk", "sk")
    assert(out.columns.toSeq == Seq("lk", "v", "sk", "w"))
    assert(out.count() == 0)
  }

  test("rangeJoin equals the naive inequality join, incl. negatives and overlaps") {
    val pts = Seq(-300L, -256L, -1L, 0L, 1L, 255L, 256L, 1000L, 5000L)
      .zipWithIndex.map { case (p, i) => (i.toLong, p) }.toDF("pid", "p")
    val iv = Seq((1L, -300L, -200L), (2L, -10L, 10L), (3L, 0L, 0L),
      (4L, 200L, 300L), (5L, 250L, 260L), // overlapping intervals
      (6L, 999L, 1001L), (7L, 10L, 5L))   // start > end: empty
      .toDF("iid", "lo", "hi")
    val got = Joins.rangeJoin(pts, iv, "p", "lo", "hi", bandWidth = 256L)
    val naive = pts.join(iv, col("p") >= col("lo") && col("p") <= col("hi"))
    assert(rows(got.orderBy("pid", "iid")) == rows(naive.orderBy("pid", "iid")))
    // each matching pair appears exactly once (bands never double-count)
    assert(got.count() == got.dropDuplicates("pid", "iid").count())
  }

  test("rangeJoin with band width larger and smaller than every interval") {
    val pts = (0L until 100L).map(p => (p, p)).toDF("pid", "p")
    val iv = Seq((1L, 10L, 30L), (2L, 25L, 26L)).toDF("iid", "lo", "hi")
    val naive = pts.join(iv, col("p") >= col("lo") && col("p") <= col("hi"))
    for (w <- Seq(1L, 7L, 1000L)) {
      val got = Joins.rangeJoin(pts, iv, "p", "lo", "hi", bandWidth = w)
      assert(rows(got.orderBy("pid", "iid")) == rows(naive.orderBy("pid", "iid")),
        s"bandWidth=$w diverged")
    }
    intercept[IllegalArgumentException](
      Joins.rangeJoin(pts, iv, "p", "lo", "hi", bandWidth = 0L))
    intercept[IllegalArgumentException](
      Joins.rangeJoin(pts.withColumn("_band", lit(1)), iv, "p", "lo", "hi", 8L))
  }
}
