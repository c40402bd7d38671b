package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.StructType

/** Streaming ingest/egress over directories — Spark's file streaming
  * source/sink, the schema-ful stand-in for a broker-backed feed (the
  * container ships no Kafka; swapping `format("parquet")` for
  * `format("kafka")` + serde changes none of the downstream operator
  * code, which is the point of the abstraction).
  *
  * Scale contract: the file source tracks seen files in the checkpoint
  * and each micro-batch reads only newly-landed files (splittable,
  * partition-parallel); the file sink commits atomically through the
  * manifest log, so a crashed writer never exposes partial batches —
  * end-to-end exactly-once with a deterministic pipeline.
  */
object StreamIo {

  /** Directory-as-stream: every file landing in `dir` becomes (part of) a
    * micro-batch. Schema is caller-supplied — streaming sources do not
    * infer (the reference's "you must know your schema" stance,
    * `dataframe.d:108`). `maxFilesPerTrigger` bounds batch size so one
    * bulk backfill doesn't become one giant batch. */
  def readParquetStream(
      spark: SparkSession, dir: String, schema: StructType,
      maxFilesPerTrigger: Int = 16): DataFrame =
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(dir)

  /** CSV variant (same contract; sep/header as in Io.readTable). */
  def readCsvStream(
      spark: SparkSession, dir: String, schema: StructType,
      sep: String = "\t", maxFilesPerTrigger: Int = 16): DataFrame =
    spark.readStream
      .schema(schema)
      .option("sep", sep)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .csv(dir)

  /** Exactly-once parquet sink: append-mode file sink with a manifest
    * checkpoint. The result directory is readable as a normal batch table
    * while the stream runs. */
  def writeParquetStream(
      df: DataFrame, dir: String, checkpointDir: String): StreamingQuery =
    df.writeStream
      .format("parquet")
      .option("path", dir)
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .start()
}
