package graft.sources

import org.apache.spark.sql.DataFrame

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
}
