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

  test("z-order write: every file covers a small rectangle of BOTH key ranges") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_z").toString
    val li = Tables.lineitem(spark, sf0001)
      .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
    Sinks.writeZOrdered(li, s"$dir/z", "l_partkey", "l_suppkey", nFiles = 16)

    val back = spark.read.parquet(s"$dir/z")
    assert(back.count() == li.count())
    // per-file min/max of both keys — the footer stats pruning works from
    val spans = back
      .withColumn("f", input_file_name())
      .groupBy("f")
      .agg(min("l_partkey").as("pLo"), max("l_partkey").as("pHi"),
        min("l_suppkey").as("sLo"), max("l_suppkey").as("sHi"))
      .as[(String, Long, Long, Long, Long)].collect()
    assert(spans.length >= 8, s"expected ~16 files, got ${spans.length}")
    val Seq(pMin, pMax, sMin, sMax) = li
      .agg(min("l_partkey"), max("l_partkey"), min("l_suppkey"), max("l_suppkey"))
      .collect().head.toSeq.map(_.asInstanceOf[Long])
    def avgFrac(lohi: Seq[(Long, Long)], lo: Long, hi: Long) =
      lohi.map { case (a, b) => (b - a).toDouble / math.max(1L, hi - lo) }
        .sum / lohi.length
    val pFrac = avgFrac(spans.map(s => (s._2, s._3)).toSeq, pMin, pMax)
    val sFrac = avgFrac(spans.map(s => (s._4, s._5)).toSeq, sMin, sMax)
    // 16 files ≈ 4 z-bits: each file should span ~25% of each dimension;
    // a single-column sort would pin one near 100%. Allow slack to 60%.
    assert(pFrac < 0.6, f"l_partkey avg file span $pFrac%.2f of range")
    assert(sFrac < 0.6, f"l_suppkey avg file span $sFrac%.2f of range")
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
