package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Z-order clustered parquet: rows sorted by the interleaved bits of two
    * range-normalized key columns, so EACH output file covers a small
    * rectangle of the (a, b) value space — min/max footer stats then prune
    * files for filters on EITHER column. A plain sort by `a` gives perfect
    * pruning on `a` and none on `b`; with F files, z-order gives every
    * file ~1/sqrt(F) of each dimension's range. This is the multi-column
    * layout lever for 100 TB scans (the others being partition dirs and
    * buckets — [[writeParquetPartitioned]], [[writeBucketedTable]]).
    *
    * Keys are normalized to 16-bit ranks via driver-side min/max (bounded
    * metadata, same pattern as Packing) and spread/interleaved with the
    * standard magic-mask shifts — all codegen'd built-in expressions. The
    * write range-partitions on z (one task per file, contiguous z runs)
    * and sorts within partitions.
    */
  def writeZOrdered(
      df: DataFrame,
      path: String,
      colA: String,
      colB: String,
      nFiles: Int
  ): Unit = {
    require(nFiles > 0, s"nFiles must be positive, got $nFiles")
    val Array(minA, maxA, minB, maxB) =
      df.agg(min(col(colA)).cast("long"), max(col(colA)).cast("long"),
          min(col(colB)).cast("long"), max(col(colB)).cast("long"))
        .collect().head.toSeq.map(_.asInstanceOf[Long]).toArray
    // Normalize to the FULL 16-bit space: a narrow key (10 suppliers) must
    // stretch to the high bits or the interleave degenerates to a
    // single-column sort. Multiply-first is exact for spans that fit;
    // wider spans (hash keys) fall back to divide-first (overflow-safe,
    // same monotone contract as Packing).
    def bucket(c: String, lo: Long, hi: Long) = {
      val span = math.max(1L, hi - lo + 1)
      if (span <= Long.MaxValue / 65536L)
        expr(s"((CAST($c AS BIGINT) - ${lo}L) * 65536L) div ${span}L")
      else {
        val width = (span - 1L) / 65536L + 1L
        expr(s"(CAST($c AS BIGINT) - ${lo}L) div ${width}L")
      }
    }
    // spread 16 bits to even positions: x | x<<8 … with the magic masks
    def spread(e: Column): Column = {
      val s1 = (e.bitwiseOR(shiftleft(e, 8))).bitwiseAND(lit(0x00FF00FFL))
      val s2 = (s1.bitwiseOR(shiftleft(s1, 4))).bitwiseAND(lit(0x0F0F0F0FL))
      val s3 = (s2.bitwiseOR(shiftleft(s2, 2))).bitwiseAND(lit(0x33333333L))
      (s3.bitwiseOR(shiftleft(s3, 1))).bitwiseAND(lit(0x55555555L))
    }
    val z = spread(bucket(colA, minA, maxA))
      .bitwiseOR(shiftleft(spread(bucket(colB, minB, maxB)), 1))
    df.withColumn("_z", z)
      .repartitionByRange(nFiles, col("_z"))
      .sortWithinPartitions(col("_z"))
      .drop("_z")
      .write.mode("overwrite").parquet(path)
  }

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
