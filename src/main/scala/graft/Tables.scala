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
  /** `events.parquet`'s `ts` column has shipped in two physical encodings
    * across testdata generations: parquet TIMESTAMP(NANOS) — which Spark
    * surfaces as `long` under `spark.sql.legacy.parquet.nanosAsLong` — and
    * plain `timestamp[us]` without UTC adjustment, which Spark surfaces as
    * TIMESTAMP_NTZ. Dispatch on the scanned type so either generation reads
    * as a session-TZ TIMESTAMP, matching the DuckDB oracle's
    * `CAST(ts AS TIMESTAMP)`:
    *   - Long/Integer  → nanos-as-long → `timestamp_micros(ts div 1000)`
    *   - TimestampNTZ  → cast to TIMESTAMP (sessions pin UTC, so the
    *                     wall-clock reinterpretation is value-identical)
    *   - Timestamp     → pass-through
    *
    * The UTC session-TZ pin and the `nanosAsLong` re-assert are defensive
    * idempotent sets for externally-built sessions (e.g. the driver's
    * `SparkEntry.entry` session); both are session-global and harmless to
    * every other table (only events.parquet ever carried a nanos column).
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    val raw = table(spark, sfDir, "events")
    raw.schema("ts").dataType match {
      case LongType | IntegerType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType    => raw
      case other =>
        throw new IllegalStateException(
          s"events.parquet ts has unsupported type $other — expected long (nanos), timestamp_ntz, or timestamp")
    }
  }
  def documents(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "embeddings")
}
