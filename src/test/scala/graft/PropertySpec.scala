package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.operators.Frame._
import graft.operators.Grouped

/** Algebraic properties over generated frames (SURVEY §5 item 3).
  * Plain ScalaCheck generators sampled with fixed seeds (the
  * scalatest/scalacheck bridge artifact isn't in the offline cache). */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private val rowGen = Gen.listOfN(30,
    Gen.zip(Gen.oneOf("a", "b", "c"), Gen.choose(0, 5), Gen.choose(-10.0, 10.0)))

  private def samples(n: Int): Seq[List[(String, Int, Double)]] =
    (1 to n).map(i => rowGen.pureApply(Gen.Parameters.default, Seed(i.toLong)))

  test("distinct(union(df, df)) == distinct(df)") {
    for (data <- samples(5)) {
      val df = data.toDF("k", "i", "d")
      assert(rows(df.appendAll(df).distinctSorted()) == rows(df.distinctSorted()))
    }
  }

  test("groupby counts sum to row count") {
    for (data <- samples(5)) {
      val df = data.toDF("k", "i", "d")
      val total = Grouped.count(df, Seq("k"))
        .agg(org.apache.spark.sql.functions.sum("count")).as[Long].head()
      assert(total == df.count())
    }
  }

  test("sort is idempotent and a permutation") {
    for (data <- samples(5)) {
      val df = data.toDF("k", "i", "d")
      val once = rows(df.sortAll())
      assert(rows(df.sortAll().sortAll()) == once)
      assert(once.sortBy(_.toString()) == rows(df).sortBy(_.toString()))
    }
  }

  test("filter(p) and filter(!p) partition the frame") {
    for ((data, pivot) <- samples(5).zip(Seq(0, 1, 3, 5, 2))) {
      val df = data.toDF("k", "i", "d")
      val lo = df.filterCmp("i", "<", pivot).count()
      val hi = df.filterCmp("i", ">=", pivot).count()
      assert(lo + hi == df.count())
    }
  }

  test("first row per group is a member of its group") {
    for (data <- samples(5)) {
      val df = data.toDF("k", "i", "d")
      val firsts = Grouped.firstRows(df, Seq("k"), Seq("i", "d")).collect()
      val all = df.collect().toSet
      assert(firsts.forall(all.contains))
      assert(firsts.length == df.select("k").distinct().count())
    }
  }
}
