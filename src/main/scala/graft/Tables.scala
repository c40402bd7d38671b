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
    * Session-conf contract (no silent overwrites — an accessor must not
    * mutate semantics a caller chose):
    *   - session time zone must already resolve to UTC (the entire event
    *     tier — oracle SQL, NTZ reinterpretation, date_trunc buckets — is
    *     defined against UTC wall clocks). A conflicting zone THROWS with
    *     the required setting named, instead of being overwritten mid-
    *     session (which would silently re-time every earlier read).
    *   - `spark.sql.legacy.parquet.nanosAsLong` is enabled ONLY if the
    *     scan actually fails on a TIMESTAMP(NANOS) column (the pre-2026
    *     testdata encoding). The flag is read-path-only and no other table
    *     ever carried nanos, so the lazy one-way enable is side-effect-free
    *     for every other read; current NTZ-encoded data triggers no
    *     mutation at all.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    val tz = spark.conf.get("spark.sql.session.timeZone")
    // normalized() collapses every fixed-offset-zero spelling (UTC,
    // Etc/UTC, GMT, +00:00, Z) onto ZoneOffset.UTC
    val utc = try java.time.ZoneId.of(tz).normalized() == java.time.ZoneOffset.UTC
      catch { case _: java.time.DateTimeException => false }
    if (!utc)
      throw new IllegalStateException(
        s"Tables.events requires spark.sql.session.timeZone=UTC (event-tier " +
          s"timestamps are defined against UTC wall clocks) but the session " +
          s"has '$tz' — set it on the SparkSession builder before reading events")
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    val raw =
      try table(spark, sfDir, "events")
      catch {
        case e: Exception
            if Option(e.getMessage).exists(_.contains("NANOS")) &&
              spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") != "true" =>
          spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
          table(spark, sfDir, "events")
      }
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
