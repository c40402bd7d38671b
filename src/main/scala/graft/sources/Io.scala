package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Delimited-text ingest and CSV sink — the reference's `fromTable` /
  * `toCsv` (`/root/reference/source/koalas/dataframe.d:108-149`).
  *
  * `fromTable` semantics preserved: caller supplies the schema ("You must
  * know the size and type of your data coming in", reference README), no
  * inference, strict per-field conversion (FAILFAST ≈ `to!T` throwing on
  * mismatch), optional leading index columns dropped, header lines skipped.
  * Unlike the reference's eager single-threaded line loop, this is Spark's
  * splittable text scan: each 128 MB file split parses in parallel.
  */
object Io {

  /** @param indexCols  drop this many leading columns after parse
    *                   (reference `dataframe.d:119`)
    * @param headerLines skip this many leading header lines per file
    *                   (reference `dataframe.d:111-114` supports N).
    *                   0/1 ride the native CSV source; N>1 routes through
    *                   [[linesSkippingHeader]] (same splittable text scan,
    *                   header dropped at the file-start split).
    */
  def readTable(
      spark: SparkSession,
      path: String,
      schema: StructType,
      sep: String = "\t",
      indexCols: Int = 0,
      headerLines: Int = 0
  ): DataFrame = {
    require(headerLines >= 0, "headerLines must be non-negative")
    val df =
      if (headerLines <= 1)
        spark.read
          .option("sep", sep)
          .option("header", headerLines == 1)
          .option("mode", "FAILFAST") // strict parse: to!T throws on mismatch
          .schema(schema)
          .csv(path)
      else
        spark.read
          .option("sep", sep)
          .option("mode", "FAILFAST")
          .schema(schema)
          .csv(linesSkippingHeader(spark, path, headerLines))
    if (indexCols == 0) df else df.drop(schema.fieldNames.take(indexCols).toIndexedSeq: _*)
  }

  /** The text lines of `path` minus the first `n` lines of EACH file,
    * dropped distributedly: Hadoop's text splits carry the byte offset of
    * every line as the record key, and only a file-START split ever yields
    * a key-0 record — so the partition holding a file's head drops its
    * first `n` records and every other partition passes through untouched.
    * No driver-side reads, no per-file listing, fully splittable (the one
    * assumption: a file's header fits inside its first input split —
    * 128 MB of header is not a real table). */
  private[graft] def linesSkippingHeader(
      spark: SparkSession, path: String, n: Int) = {
    import org.apache.hadoop.io.{LongWritable, Text}
    import org.apache.hadoop.mapred.TextInputFormat
    import spark.implicits._
    val raw = spark.sparkContext.hadoopFile(
      path, classOf[TextInputFormat], classOf[LongWritable], classOf[Text])
    spark.createDataset(raw.mapPartitions { it =>
      val buf = it.buffered
      val atFileStart = buf.hasNext && buf.head._1.get == 0L
      val rest = if (atFileStart) buf.drop(n) else buf
      rest.map(_._2.toString) // copy out: Hadoop reuses the Text instance
    })
  }

  /** JSONL (one JSON object per line) source — the interchange format LLM
    * corpora actually ship in. Same contract as [[readTable]]: caller
    * supplies the schema (no inference pass over 100 TB), FAILFAST parse
    * so a malformed line fails the job instead of silently nulling a
    * column. JSONL is splittable text: each file split parses in
    * parallel, same as the CSV path. */
  def readJsonl(
      spark: SparkSession,
      path: String,
      schema: StructType
  ): DataFrame =
    spark.read
      .option("mode", "FAILFAST")
      .schema(schema)
      .json(path)

  /** JSONL sink: one object per line, one file per partition. Column
    * order/naming carries through as JSON keys; callers wanting one file
    * coalesce(1) explicitly (driver-size data only). */
  def writeJsonl(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** CSV sink (`toCsv`, `dataframe.d:128-149`): optional header, optional
    * leading row-number column. The reference writes one file from one
    * array; a distributed engine writes one file per partition — callers
    * wanting a single file coalesce(1) explicitly (driver-size data only).
    *
    * `writeIndex` emits the reference's contiguous 0..n-1 row numbers,
    * which requires a caller-supplied total order (`indexOrder`) — there
    * is no "frame order" after a shuffle. The numbering window is global
    * (single-partition): correct for the driver-size exports `toCsv`
    * serves; for a 100 TB sink drop the index or use a partition-offset
    * scheme like [[graft.functions.Quantiles]]'s ranking pass.
    */
  def writeCsv(
      df: DataFrame,
      path: String,
      sep: String = ",",
      writeHeader: Boolean = true,
      writeIndex: Boolean = false,
      indexOrder: Seq[String] = Seq.empty
  ): Unit = {
    val out =
      if (writeIndex) {
        require(indexOrder.nonEmpty,
          "writeIndex=true needs indexOrder: contiguous row numbers require a total order")
        val w = org.apache.spark.sql.expressions.Window
          .orderBy(indexOrder.map(col): _*)
        df.withColumn("index", row_number().over(w) - 1)
          .select(col("index") +: df.columns.map(col).toIndexedSeq: _*)
      } else df
    out.write
      .option("sep", sep)
      .option("header", writeHeader)
      .mode("overwrite")
      .csv(path)
  }
}
