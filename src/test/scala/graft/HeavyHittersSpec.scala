package graft

import org.apache.spark.sql.functions._
import graft.plans.HeavyHittersMG

/** Misra–Gries heavy-hitters aggregate ([[graft.plans.HeavyHittersMG]]):
  * exactness at capacity ≥ distinct, and the MG guarantees (never
  * overcount, bounded undercount, heavy-hitter containment) on a zipf
  * stream that actually forces decrements and lossy merges. */
class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  private def sketch(df: org.apache.spark.sql.DataFrame, cap: Int) =
    df.agg(HeavyHittersMG.heavyHitters(col("v"), cap).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select(col("e.item"), col("e.est"))
      .as[(String, Long)].collect().toMap

  // zipf-ish: item k appears ~N/k times — heavy head, long tail
  private def zipf(n: Int): Seq[String] =
    (1 to 40).flatMap(k => Seq.fill(n / k)(s"item$k"))

  test("capacity >= distinct items is the exact count table, any partitioning") {
    val data = zipf(400)
    val exact = data.groupBy(identity).view.mapValues(_.size.toLong).toMap
    for (p <- Seq(1, 8, 32)) {
      val got = sketch(data.toDF("v").repartition(p), cap = 64)
      assert(got == exact, s"diverged at $p partitions")
    }
  }

  test("sub-capacity: never overcounts, undercount <= N/(cap+1), heavy hitters present") {
    val data = zipf(2000)
    val n = data.size.toLong
    val exact = data.groupBy(identity).view.mapValues(_.size.toLong).toMap
    for (p <- Seq(1, 8); cap <- Seq(8, 16)) {
      val got = sketch(data.toDF("v").repartition(p), cap)
      assert(got.size <= cap)
      val bound = n / (cap + 1)
      got.foreach { case (item, est) =>
        assert(est <= exact(item), s"overcount on $item (cap=$cap,p=$p)")
        assert(exact(item) - est <= bound,
          s"undercount ${exact(item) - est} > $bound on $item (cap=$cap,p=$p)")
      }
      // containment: anything truly above the bound must be in the sketch
      exact.filter(_._2 > bound).keys.foreach { hh =>
        assert(got.contains(hh), s"missed heavy hitter $hh (cap=$cap,p=$p)")
      }
    }
  }

  test("empty input and null values") {
    val got = Seq.empty[String].toDF("v")
      .agg(HeavyHittersMG.heavyHitters(col("v"), 4).as("hh"))
      .select(size(col("hh"))).as[Int].head()
    assert(got == 0)
    val withNulls = Seq(Some("a"), None, Some("a"), None).toDF("v")
    assert(sketch(withNulls, 4) == Map("a" -> 2L))
  }
}
