package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Streaming counterparts of the batch pipeline operators (EXT tier):
  * exact dedup and windowed aggregation with watermarked, bounded state.
  * The reference has no streaming at all (SURVEY §2.5); these are the
  * shapes a continuously-ingesting training-data pipeline runs.
  */
object StreamOps {

  /** Streaming exact dedup: drop rows whose key columns repeat within the
    * watermark horizon. State is bounded by the watermark — the streaming
    * analog of `Dedup.dropExactDups`, trading "dedup against all history"
    * for "dedup against the last `watermark` of event time", which is the
    * only state-bounded contract possible on an infinite stream. */
  def dedupWithinWatermark(
      df: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      watermark: String = "1 hour"
  ): DataFrame =
    df.withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keyCols)

  /** Tumbling-window event aggregation: counts + exact decimal sums per
    * (window, event_type). Runs identically in batch mode. */
  def windowedEventCounts(
      events: DataFrame,
      windowMinutes: Int = 5,
      watermark: String = "1 hour"
  ): DataFrame = {
    val withWm =
      if (events.isStreaming) events.withWatermark("ts", watermark) else events
    withWm
      .groupBy(window(col("ts"), s"$windowMinutes minutes"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 2))).cast(DoubleType).as("sum_value"))
      .select(
        col("window.start").as("window_start"),
        col("event_type"), col("n_events"), col("sum_value"))
  }
}
