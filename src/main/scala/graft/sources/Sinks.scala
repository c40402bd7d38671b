package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Parquet sinks with the two layout levers that matter at 100 TB:
  * partition columns (directory-level pruning: a date/tenant filter skips
  * whole partitions at planning time) and bucketing (pre-shuffled layout:
  * joins/aggregations on the bucket key need no exchange at read time).
  * The reference's only sink is a single-file CSV writer
  * (`/root/reference/source/koalas/dataframe.d:128-149` → Io.writeCsv).
  */
object Sinks {

  /** Hive-style partitioned parquet: one directory per partition-column
    * value. Readers filtering on `partitionCols` prune at file-listing
    * time (PartitionFilters in the scan, asserted in SinksSpec). */
  def writeParquetPartitioned(
      df: DataFrame,
      path: String,
      partitionCols: Seq[String]
  ): Unit =
    df.write.mode("overwrite").partitionBy(partitionCols: _*).parquet(path)

  /** Bucketed + sorted managed table: `numBuckets` files per partition,
    * rows hash-distributed by `bucketCol` and sorted within buckets. Two
    * tables bucketed the same way join with ZERO exchanges (asserted in
    * SinksSpec) — the batch-layout answer to "this join shuffles 100 TB
    * every night". */
  def writeBucketedTable(
      df: DataFrame,
      table: String,
      bucketCol: String,
      numBuckets: Int
  ): Unit =
    df.write.mode("overwrite")
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)

  /** Training shards: the corpus cut into `nShards` near-equal partitioned
    * directories in DETERMINISTIC shuffle order ([[graft.functions.Sampling
    * .shuffleOrder]] — rank by md5 of the row key). Shard membership is
    * `rank mod nShards`, so (a) shard sizes differ by at most one row,
    * (b) the assignment is a pure function of the key set — re-runs and
    * engines agree — and (c) each shard is itself a uniform sample of the
    * corpus (any prefix of shards is a valid smaller training set). The
    * write repartitions ON the shard column, so each task writes one
    * shard's file — no tiny-file spray — and readers of `shard=k` prune
    * every other directory at listing time.
    */
  def writeTrainingShards(
      df: DataFrame,
      keyCol: String,
      path: String,
      nShards: Int
  ): Unit = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    val sharded = graft.functions.Sampling
      .shuffleOrder(df, col(keyCol).cast("string"))
      .withColumn("shard", (col("shuffle_pos") % nShards).cast("int"))
      .drop("shuffle_pos")
    sharded
      .repartition(nShards, col("shard"))
      .write.mode("overwrite").partitionBy("shard").parquet(path)
  }
}
