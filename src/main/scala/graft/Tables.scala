package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table access for the driver testdata star schema (TESTDATA.md).
  *
  * Reference analog: `fromTable` eager ingest
  * (`/root/reference/source/koalas/dataframe.d:108-126`). Here ingest is a
  * lazy Catalyst `LogicalRelation`; Spark's parquet reader gives columnar
  * scan, predicate pushdown and partition-parallel IO for free — the 100 TB
  * replacement for the reference's single-threaded in-RAM `RT[] records`.
  */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def lineitem(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "orders")
  def customer(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "part")
  def nation(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "nation")
  def region(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "region")
  /** `events.parquet` stores `ts` as parquet TIMESTAMP(NANOS), which Spark
    * has no native type for. Read nanos as long (legacy conf) and convert
    * to a microsecond timestamp — the testdata's values are micro-precision
    * anyway, and the DuckDB oracle casts TIMESTAMP_NS → TIMESTAMP to match.
    *
    * Session invariant: `spark.sql.legacy.parquet.nanosAsLong=true` is set
    * at session construction by every owned builder (Bench / Verify /
    * SparkSpec) — the set below is a defensive idempotent re-assert for
    * externally-built sessions (e.g. the driver's `SparkEntry.entry`
    * session). It is session-global and harmless to non-nanos reads (only
    * events.parquet carries a nanos column).
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    import org.apache.spark.sql.functions._
    table(spark, sfDir, "events")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
  def documents(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "embeddings")
}
