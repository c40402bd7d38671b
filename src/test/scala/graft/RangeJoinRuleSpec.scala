package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.plans.BandedRangeJoinRule

/** The banded-range-join optimizer rule: a NAIVE inequality join —
  * exactly what a user writes — must plan as a hash join on the synthetic
  * band key instead of a BroadcastNestedLoopJoin, with identical results,
  * while equi joins and non-integral conditions pass through untouched. */
class RangeJoinRuleSpec extends SparkSpec {
  import spark.implicits._

  private lazy val pts = Seq(-300L, -256L, -1L, 0L, 1L, 255L, 256L, 999L, 5000L)
    .zipWithIndex.map { case (p, i) => (i.toLong, p) }.toDF("pid", "p")
  private lazy val iv = Seq((1L, -300L, -200L), (2L, -10L, 10L), (3L, 0L, 0L),
    (4L, 200L, 300L), (5L, 250L, 260L), (6L, 998L, 1000L), (7L, 10L, 5L))
    .toDF("iid", "lo", "hi")

  private def withRule[A](f: => A): A = {
    val before = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = before :+ BandedRangeJoinRule
    try f finally spark.experimental.extraOptimizations = before
  }

  private def plan(df: DataFrame): String =
    df.queryExecution.executedPlan.toString()

  test("naive inequality join is rewritten: no nested loop, same rows") {
    val expected = rows(
      pts.join(iv, col("p") >= col("lo") && col("p") <= col("hi"))
        .orderBy("pid", "iid"))
    withRule {
      val joined = pts.join(iv, col("p") >= col("lo") && col("p") <= col("hi"))
      val p = plan(joined)
      assert(!p.contains("BroadcastNestedLoopJoin"),
        s"rule did not fire:\n$p")
      assert(p.contains("_graft_band"), s"no band key in plan:\n$p")
      assert(rows(joined.orderBy("pid", "iid")) == expected)
      // flipped operand order and swapped sides fire too
      val flipped = iv.join(pts, col("lo") <= col("p") && col("hi") >= col("p"))
      assert(!plan(flipped).contains("BroadcastNestedLoopJoin"))
      assert(flipped.count() == expected.size)
    }
  }

  test("strict bounds band too, residual keeps strictness") {
    val expected = rows(
      pts.join(iv, col("p") > col("lo") && col("p") < col("hi"))
        .orderBy("pid", "iid"))
    withRule {
      val joined = pts.join(iv, col("p") > col("lo") && col("p") < col("hi"))
      val p = plan(joined)
      assert(!p.contains("BroadcastNestedLoopJoin"), s"rule did not fire:\n$p")
      assert(rows(joined.orderBy("pid", "iid")) == expected)
    }
  }

  test("band width conf is honored") {
    withRule {
      spark.conf.set("spark.graft.rangeJoin.bandWidth", "64")
      try {
        val joined = pts.join(iv, col("p") >= col("lo") && col("p") <= col("hi"))
        assert(!plan(joined).contains("BroadcastNestedLoopJoin"))
        assert(rows(joined.orderBy("pid", "iid")) == rows(
          pts.join(iv, col("p") >= col("lo") && col("p") <= col("hi"))
            .hint("SHUFFLE_REPLICATE_NL")
            .orderBy("pid", "iid")))
      } finally spark.conf.unset("spark.graft.rangeJoin.bandWidth")
    }
  }

  test("equi joins and non-integral ranges pass through untouched") {
    withRule {
      // equi join: already hash-joinable — the rule must not touch it
      val equi = pts.join(iv, col("p") === col("lo"))
      assert(!plan(equi).contains("_graft_band"))
      // double-typed range: banding integral division doesn't apply
      val dPts = pts.select(col("pid"), col("p").cast("double").as("p"))
      val dIv = iv.select(col("iid"), col("lo").cast("double").as("lo"),
        col("hi").cast("double").as("hi"))
      val dJoin = dPts.join(dIv, col("p") >= col("lo") && col("p") <= col("hi"))
      assert(!plan(dJoin).contains("_graft_band"))
      assert(dJoin.count() ==
        rows(pts.join(iv, col("p") >= col("lo") && col("p") <= col("hi"))).size)
    }
  }

  test("rule matches the explicit rangeJoin operator row-for-row") {
    val explicit = rows(graft.operators.Joins
      .rangeJoin(pts, iv, "p", "lo", "hi", bandWidth = 1024L)
      .select("pid", "p", "iid", "lo", "hi").orderBy("pid", "iid"))
    withRule {
      val auto = pts.join(iv, col("p") >= col("lo") && col("p") <= col("hi"))
        .select("pid", "p", "iid", "lo", "hi").orderBy("pid", "iid")
      assert(rows(auto) == explicit)
    }
  }

  test("mirrored orientation carries per-side hints with the swapped children") {
    import org.apache.spark.sql.catalyst.plans.logical.Join
    withRule {
      // intervals on the ORIGINAL LEFT with a broadcast hint: the rule
      // mirrors the sides (points become the left child), so the hint
      // must travel to the right child or the huge points side would be
      // broadcast instead of the small intervals table
      val joined = iv.hint("broadcast")
        .join(pts, col("p") >= col("lo") && col("p") <= col("hi"))
      val hints = joined.queryExecution.optimizedPlan.collect {
        case j: Join => j.hint
      }
      assert(hints.exists(h =>
        h.rightHint.exists(_.strategy.isDefined) && h.leftHint.isEmpty),
        s"broadcast hint did not follow the intervals side: $hints")
      assert(rows(joined.orderBy("pid", "iid")).size ==
        rows(pts.join(iv, col("p") >= col("lo") && col("p") <= col("hi"))).size)
    }
  }

  test("zero or garbage band width is refused loudly, not silently empty") {
    withRule {
      Seq("0", "-5", "wat").foreach { bad =>
        spark.conf.set("spark.graft.rangeJoin.bandWidth", bad)
        try {
          val e = intercept[Exception] {
            pts.join(iv, col("p") >= col("lo") && col("p") <= col("hi")).collect()
          }
          assert(e.getMessage != null &&
            e.getMessage.contains("spark.graft.rangeJoin.bandWidth"),
            s"for '$bad': ${e.getMessage}")
        } finally spark.conf.unset("spark.graft.rangeJoin.bandWidth")
      }
    }
  }
}
