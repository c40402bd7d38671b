package graft

import org.apache.spark.sql.functions._

/** Relational-extension operators: sketch-accuracy bounds vs exact. */
class RelSpec extends SparkSpec {
  import spark.implicits._

  test("approx sketches land within tolerance of the exact aggregates") {
    val li = Tables.lineitem(spark, sf0001)
    val cmp = li.groupBy(col("l_returnflag")).agg(
      countDistinct(col("l_partkey")).as("exact_d"),
      approx_count_distinct(col("l_partkey")).as("approx_d"),
      expr("percentile(l_extendedprice, 0.5)").as("exact_m"),
      expr("approx_percentile(l_extendedprice, 0.5, 1000)").as("approx_m"))
      .collect()
    cmp.foreach { r =>
      val (ed, ad) = (r.getLong(1).toDouble, r.getLong(2).toDouble)
      assert(math.abs(ad - ed) / ed < 0.1, s"HLL off: $ed vs $ad")
      val (em, am) = (r.getDouble(3), r.getDouble(4))
      assert(math.abs(am - em) / em < 0.05, s"quantile sketch off: $em vs $am")
    }
  }

  test("bottom-k-by-hash sample: deterministic, partition-invariant") {
    import graft.plans.BottomKByHash
    val li = Tables.lineitem(spark, sf0001)
      .select(col("l_orderkey").cast("string").as("v"))
    def sample(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.agg(BottomKByHash.bottomK(col("v"), 10).as("s"))
        .collect().head.getSeq[String](0)
    val a = sample(li)
    assert(a.length == 10)
    // partition-invariant: the partial/merge path yields the same set
    assert(sample(li.repartition(13)) == a)
    // equals the brute-force definition: 10 distinct values with the
    // smallest md5 digests, in digest order
    val expected = li.distinct()
      .select(col("v"), md5(col("v")).as("h")).orderBy(col("h"))
      .limit(10).select("v").as[String].collect().toSeq
    assert(a == expected)
  }

  test("cube emits all four grouping levels") {
    val got = SparkEntry.queries("cube_agg")(spark, sf0001)
    assert(got.select("lvl").distinct().as[Long].collect().toSet == Set(0L, 1L, 2L, 3L))
  }
}
