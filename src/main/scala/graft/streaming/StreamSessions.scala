package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Structured-Streaming sessionization — the streaming twin of
  * `graft.operators.Sessions.sessionize` (EXT tier; the reference has zero
  * streaming, SURVEY §2.5).
  *
  * Uses `session_window(ts, gap)`: Spark maintains per-key merging session
  * state; the watermark bounds state and admits bounded late data. Runs
  * identically over `readStream` (incremental, stateful) and a batch
  * `read` (Catalyst rewrites session_window to a sort-based assignment) —
  * one definition, two execution modes, which is exactly the property the
  * batch `Sessions` operator documents as its design point.
  *
  * Boundary note: an event exactly `gap` after its predecessor *starts a
  * new session* here (session windows are half-open `[start, start+gap)`),
  * while the batch `Sessions.sessionize` keeps it in the old session
  * (`ts > prev + gap` starts new). Sub-microsecond coincidence at exactly
  * the gap is the only divergence.
  */
object StreamSessions {

  /** @param events streaming or batch DataFrame with
    *               (user_id, ts timestamp, value double)
    */
  def sessionize(
      events: DataFrame,
      gapMinutes: Int = 30,
      watermark: String = "1 hour"
  ): DataFrame = {
    val withWm =
      if (events.isStreaming) events.withWatermark("ts", watermark) else events
    withWm
      .groupBy(col("user_id"), session_window(col("ts"), s"$gapMinutes minutes"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 2))).cast(DoubleType).as("sum_value"))
      .select(
        col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"),
        col("sum_value"))
  }
}
