package graft

import org.apache.spark.sql.functions._
import graft.sources.Sinks

/** Sink layout levers: partition pruning and shuffle-free bucketed joins —
  * asserted on the actual physical plans, not just round-trip values. */
class SinksSpec extends SparkSpec {

  test("partitioned parquet: round-trips and prunes partitions on read") {
    val dir = java.nio.file.Files.createTempDirectory("graft_part").toString
    val ev = Tables.events(spark, sf0001)
      .withColumn("day", to_date(col("ts")))
    Sinks.writeParquetPartitioned(ev, s"$dir/events", Seq("day"))

    val back = spark.read.parquet(s"$dir/events")
    assert(back.count() == ev.count())

    val oneDay = back.filter(col("day") === "2024-01-02")
    val scan = oneDay.queryExecution.executedPlan.toString()
    assert(scan.contains("PartitionFilters: [isnotnull(day"),
      s"partition filter not pushed to listing:\n$scan")
    assert(oneDay.count() ==
      ev.filter(col("day") === "2024-01-02").count())
  }

  test("bucketed tables join with zero exchanges") {
    // warehouse dir is a static conf — set to a temp dir in SparkSpec
    val li = Tables.lineitem(spark, sf0001)
      .select("l_orderkey", "l_quantity", "l_extendedprice")
    val ord = Tables.orders(spark, sf0001)
      .select(col("o_orderkey").as("l_orderkey"), col("o_orderstatus"))
    Sinks.writeBucketedTable(li, "li_b", "l_orderkey", 8)
    Sinks.writeBucketedTable(ord, "ord_b", "l_orderkey", 8)
    try {
      // disable broadcast so the join would otherwise shuffle both sides
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("li_b").join(spark.table("ord_b"), "l_orderkey")
      joined.collect()
      val p = joined.queryExecution.executedPlan.toString()
      assert(!p.contains("Exchange"),
        s"bucketed join should not shuffle:\n$p")
      assert(joined.count() == li.count()) // every lineitem has its order
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS li_b")
      spark.sql("DROP TABLE IF EXISTS ord_b")
    }
  }

  test("training shards: near-equal, deterministic, prunable") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_shard").toString
    val docs = Tables.documents(spark, sf0001)
    Sinks.writeTrainingShards(docs, "doc_id", s"$dir/shards", nShards = 8)

    val back = spark.read.parquet(s"$dir/shards")
    assert(back.count() == docs.count())
    // near-equal shard sizes: max-min <= 1
    val sizes = back.groupBy("shard").count().as[(Int, Long)].collect().toMap
    assert(sizes.size == 8)
    assert(sizes.values.max - sizes.values.min <= 1, s"skewed shards: $sizes")
    // deterministic: a second write assigns identical shards
    Sinks.writeTrainingShards(docs, "doc_id", s"$dir/shards2", nShards = 8)
    val a = back.select("doc_id", "shard").as[(Long, Int)].collect().sortBy(_._1).toSeq
    val b = spark.read.parquet(s"$dir/shards2")
      .select("doc_id", "shard").as[(Long, Int)].collect().sortBy(_._1).toSeq
    assert(a == b)
    // a shard filter prunes the other directories at listing time
    val one = back.filter(col("shard") === 3)
    val scan = one.queryExecution.executedPlan.toString()
    assert(scan.contains("PartitionFilters: [isnotnull(shard"),
      s"shard filter not pushed to listing:\n$scan")
  }

  test("row iteration streams partitions without a full collect (opApply analog)") {
    // reference foreach with early break (`dataframe.d:265-277`):
    // toLocalIterator pulls one partition at a time to the driver
    val it = Tables.nation(spark, sf0001).sortAsc(Seq("n_nationkey"))
      .toLocalIterator()
    var n = 0
    while (it.hasNext && n < 3) { it.next(); n += 1 } // early break
    assert(n == 3)
  }

  private implicit class FrameOpsLocal(df: org.apache.spark.sql.DataFrame) {
    def sortAsc(keys: Seq[String]) =
      graft.operators.Frame.FrameOps(df).sortAsc(keys)
  }
}
