package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event-sequence analytics — the funnel / cohort shapes every
  * product-event store is asked for, expressed as joins and aggregates a
  * cluster executes well (no MATCH_RECOGNIZE engine needed).
  */
object Funnel {

  /** Ordered funnel: per user, the earliest timestamp of each stage that
    * STRICTLY FOLLOWS the previous stage's timestamp (earliest-first
    * semantics; a stage never reached leaves this and all later stages
    * null). Output: user_id, ts_<stage> per stage, ordered by user.
    *
    * Shape: one filtered min-aggregate for the entry stage, then per
    * stage ONE left join on user_id + one conditional min — all hash
    * joins co-partitioned on the user key, each stage table pre-filtered
    * to its event type at the scan (pushed predicate). Null propagation
    * is the correctness trick: `ts > null` is null, so users who fell out
    * stay out without special-casing. */
  def funnel(events: DataFrame, stages: Seq[String]): DataFrame = {
    require(stages.size >= 2, s"a funnel needs >= 2 stages, got $stages")
    require(stages.distinct.size == stages.size, s"duplicate stages: $stages")
    var acc = events.filter(col("event_type") === stages.head)
      .groupBy(col("user_id"))
      .agg(min(col("ts")).as(s"ts_${stages.head}"))
    var prev = s"ts_${stages.head}"
    for (stage <- stages.tail) {
      val nxt = events.filter(col("event_type") === stage)
        .select(col("user_id"), col("ts").as("_t"))
      val keep = acc.columns.toIndexedSeq.map(col)
      acc = acc.join(nxt, Seq("user_id"), "left")
        .groupBy(keep: _*)
        .agg(min(when(col("_t") > col(prev), col("_t"))).as(s"ts_$stage"))
      prev = s"ts_$stage"
    }
    acc.orderBy(col("user_id"))
  }

  /** Conversion-lag stats per adjacent funnel stage pair: among users who
    * reached stage k, the count and the average / maximum seconds from
    * stage k-1 to stage k. ONE pass over the [[funnel]] table (a single
    * global aggregate computes every pair's moments; rows are then
    * unpacked from a literal array — no per-pair re-aggregation, no
    * second funnel computation), with lags summed EXACTLY in long
    * microseconds and the only IEEE ops being the final two divides —
    * deterministic across engines, same recipe as the moment-sum stats.
    *
    * @return (stage_from, stage_to, n_converted, avg_lag_sec,
    *         max_lag_sec), one row per adjacent pair; null lag stats when
    *         nobody converted. */
  def funnelLag(events: DataFrame, stages: Seq[String]): DataFrame = {
    val f = funnel(events, stages)
    val pairs = stages.sliding(2).map(p => (p.head, p.last)).toSeq
    val moments = pairs.flatMap { case (a, b) =>
      val reached = col(s"ts_$b").isNotNull
      val lag = unix_micros(col(s"ts_$b")) - unix_micros(col(s"ts_$a"))
      Seq(
        count(when(reached, 1)).as(s"_n_$b"),
        sum(when(reached, lag)).as(s"_s_$b"),
        max(when(reached, lag)).as(s"_m_$b"))
    }
    val aggd = f.agg(moments.head, moments.tail: _*)
    aggd.select(explode(array(pairs.map { case (a, b) =>
      struct(
        lit(a).as("stage_from"), lit(b).as("stage_to"),
        col(s"_n_$b").as("n_converted"),
        (col(s"_s_$b").cast("double") / col(s"_n_$b").cast("double")
          / lit(1000000.0)).as("avg_lag_sec"),
        (col(s"_m_$b").cast("double") / lit(1000000.0)).as("max_lag_sec"))
    }: _*)).as("_r"))
      .select(col("_r.*"))
  }

  /** Retention cohorts: users grouped by their FIRST-seen week (epoch-
    * aligned 7-day buckets, integer arithmetic), counted in every later
    * week they were active, keyed by the week offset. Output:
    * (cohort_week, week_offset, n_users) — the retention-curve matrix.
    *
    * Shape: one (user, week) distinct pass, one per-user min for the
    * cohort, one join back on user_id, one count — every shuffle keyed on
    * user or on the (cohort, offset) matrix cell. The matrix itself is
    * weeks² rows: bounded metadata. */
  def retentionCohorts(events: DataFrame): DataFrame = {
    val weekUs = 7L * 86400L * 1000000L
    // floor division (pmod-adjusted): `div` truncates toward zero, which
    // would mis-assign pre-1970 weeks vs the oracle's flooring `//`
    val active = events
      .select(col("user_id"),
        expr(s"(unix_micros(ts) - pmod(unix_micros(ts), ${weekUs}L)) div ${weekUs}L")
          .as("week"))
      .distinct()
    val cohort = active.groupBy(col("user_id"))
      .agg(min(col("week")).as("cohort_week"))
    active.join(cohort, Seq("user_id"))
      .groupBy(col("cohort_week"),
        (col("week") - col("cohort_week")).as("week_offset"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy(col("cohort_week"), col("week_offset"))
  }
}
