package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, engine-independent sampling and splitting — the
  * train/test-split primitive of a training-data pipeline. `rand()`-based
  * sampling is irreproducible across runs and engines; hashing a stable
  * row key gives the same split everywhere, forever: membership is a pure
  * function of the key, so late-arriving data lands in the same split and
  * any engine (or the DuckDB oracle) agrees row-for-row.
  */
object Sampling {

  /** Hex-prefix threshold selection: keeps rows where the first two hex
    * chars of md5(key) compare below `hexThreshold` ("1a" ≈ 26/256 ≈ 10%).
    * String comparison on lowercase hex == numeric comparison on the top
    * byte, and md5 is identical in every engine. */
  def hashSample(df: DataFrame, key: Column, hexThreshold: String): DataFrame =
    df.filter(substring(md5(key), 1, 2) < hexThreshold)

  /** Adds a `split` column ("test" for ~`testPct`/256ths of rows by hash,
    * else "train"). */
  def trainTestSplit(df: DataFrame, key: Column, testBytes: Int = 26): DataFrame = {
    val th = f"$testBytes%02x"
    df.withColumn("split",
      when(substring(md5(key), 1, 2) < th, lit("test")).otherwise(lit("train")))
  }
}
