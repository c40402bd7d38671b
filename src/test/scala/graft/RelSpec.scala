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

  test("cube emits all four grouping levels") {
    val got = SparkEntry.queries("cube_agg")(spark, sf0001)
    assert(got.select("lvl").distinct().as[Long].collect().toSet == Set(0L, 1L, 2L, 3L))
  }
}
