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
    * @param headerLines 0 or 1 — 1 skips a header line (the reference
    *                   supports N; CSV sources support one)
    */
  def readTable(
      spark: SparkSession,
      path: String,
      schema: StructType,
      sep: String = "\t",
      indexCols: Int = 0,
      headerLines: Int = 0
  ): DataFrame = {
    require(headerLines <= 1, "Spark CSV supports at most one header line")
    val df = spark.read
      .option("sep", sep)
      .option("header", headerLines == 1)
      .option("mode", "FAILFAST") // strict parse: to!T throws on mismatch
      .schema(schema)
      .csv(path)
    if (indexCols == 0) df else df.drop(schema.fieldNames.take(indexCols): _*)
  }

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
