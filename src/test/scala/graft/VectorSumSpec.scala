package graft

import org.apache.spark.sql.functions._
import graft.plans.VectorSumFixed

/** Custom vector-sum aggregate ([[graft.plans.VectorSumFixed]]):
  * partition-invariance (the mergeable-state contract), exact arithmetic,
  * and the loud failure modes. */
class VectorSumSpec extends SparkSpec {
  import spark.implicits._

  private def vecs(n: Int) =
    (1 to n).map(i => (i % 3, Array(i.toLong, -i.toLong, i.toLong * 2)))
      .toDF("g", "v")

  test("sums element-wise and matches the explode reference") {
    val df = vecs(100)
    val got = df.groupBy("g").agg(VectorSumFixed.vectorSum(col("v"), 3).as("s"))
      .select(col("g"), col("s")).as[(Int, Seq[Long])].collect()
      .map { case (g, s) => g -> s.toList }.toMap
    val ref = df.select(col("g"), posexplode(col("v")))
      .groupBy("g", "pos").agg(sum("col").as("s"))
      .collect().groupBy(_.getInt(0))
      .map { case (g, rows) =>
        g -> rows.sortBy(_.getInt(1)).map(_.getLong(2)).toList }
    assert(got == ref)
  }

  test("partition-invariant: 1, 7, and 32 partitions agree") {
    val base = vecs(500)
    val expected = base.coalesce(1).groupBy("g")
      .agg(VectorSumFixed.vectorSum(col("v"), 3).as("s"))
      .orderBy("g").as[(Int, Seq[Long])].collect().toSeq
    for (p <- Seq(7, 32)) {
      val got = base.repartition(p).groupBy("g")
        .agg(VectorSumFixed.vectorSum(col("v"), 3).as("s"))
        .orderBy("g").as[(Int, Seq[Long])].collect().toSeq
      assert(got == expected, s"diverged at $p partitions")
    }
  }

  test("null vectors are skipped; wrong length throws; overflow is loud") {
    val withNull = Seq((1, Some(Array(1L, 2L))), (1, None), (1, Some(Array(3L, 4L))))
      .toDF("g", "v")
    val s = withNull.groupBy("g").agg(VectorSumFixed.vectorSum(col("v"), 2).as("s"))
      .select("s").as[Seq[Long]].head()
    assert(s == Seq(4L, 6L))
    val wrong = Seq((1, Array(1L, 2L, 3L))).toDF("g", "v")
    val e1 = intercept[Exception](
      wrong.groupBy("g").agg(VectorSumFixed.vectorSum(col("v"), 2)).collect())
    assert(e1.getMessage != null)
    val big = Seq((1, Array(Long.MaxValue)), (1, Array(1L))).toDF("g", "v")
    intercept[Exception](
      big.groupBy("g").agg(VectorSumFixed.vectorSum(col("v"), 1)).collect())
  }
}
