package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Streaming counterparts of the batch pipeline operators (EXT tier):
  * exact dedup, windowed aggregation with watermarked bounded state, and
  * arbitrary per-key state via mapGroupsWithState. The reference has no
  * streaming at all (SURVEY §2.5); these are the shapes a continuously-
  * ingesting training-data pipeline runs.
  */
object StreamOps {

  /** Running per-user totals carried in custom state. */
  final case class UserTotals(user_id: Long, n_events: Long, sum_value: Double)

  /** Arbitrary stateful processing: per-user running (count, sum) across
    * micro-batches via `mapGroupsWithState` — the escape hatch for
    * per-key logic no built-in aggregation expresses (the streaming analog
    * of the reference's arbitrary `apply` lambdas). State is one small
    * case class per key, partitioned by the grouping key — scales with
    * distinct users, not events. */
  def runningUserTotals(
      events: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row]
  ): org.apache.spark.sql.Dataset[UserTotals] = {
    import org.apache.spark.sql.{Encoder, Encoders}
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    implicit val encLong: Encoder[Long] = Encoders.scalaLong
    implicit val encTot: Encoder[UserTotals] = Encoders.product[UserTotals]
    implicit val encPair: Encoder[(Long, Double)] = Encoders.product[(Long, Double)]
    events
      .selectExpr("user_id", "value")
      .as[(Long, Double)]
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[(Long, Double)], state: GroupState[UserTotals]) =>
          val prev = state.getOption.getOrElse(UserTotals(user, 0L, 0.0))
          val (n, s) = rows.foldLeft((prev.n_events, prev.sum_value)) {
            case ((cn, cs), (_, v)) => (cn + 1, cs + v)
          }
          val next = UserTotals(user, n, s)
          state.update(next)
          next
      }
  }

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

  /** Watermarked stream-stream interval join: each left event pairs with
    * right events of the same key from the trailing `windowMinutes`.
    * Both sides are watermarked so the join state (buffered unmatched
    * rows) is bounded by watermark + interval — the only state-bounded
    * stream-stream join contract. Batch analog: `Joins.asofJoin` (which
    * keeps only the latest prior event instead of the full interval). */
  def intervalJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      windowMinutes: Int = 30,
      watermark: String = "1 hour"
  ): DataFrame = {
    val l = left.withWatermark("ts", watermark)
      .select(col(key).as("l_key"), col("ts").as("l_ts"),
        col("event_id").as("l_event_id"))
    val r = right.withWatermark("ts", watermark)
      .select(col(key).as("r_key"), col("ts").as("r_ts"),
        col("event_id").as("r_event_id"))
    l.join(r,
      col("l_key") === col("r_key") &&
        col("r_ts") <= col("l_ts") &&
        col("r_ts") >= col("l_ts") - expr(s"INTERVAL $windowMinutes MINUTES"))
  }

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
