package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series resampling — regularize an irregular event stream onto a
  * fixed per-key bucket grid, filling gaps by last-observation-carried-
  * forward (LOCF). The missing half of the windowed-aggregation story:
  * `window_agg` summarizes buckets that HAVE events; `resample` also
  * materializes the buckets that don't, which is what downstream
  * feature/training pipelines consume (fixed-length, gap-free series).
  *
  * Scale shape: bucketing is integer arithmetic on the epoch (epoch-
  * aligned, engine-exact); the per-key grid explode is bounded by
  * span/bucket rows per key; the LOCF fill is a window PARTITIONED BY
  * key — never a global window — so per-task state is one key's grid.
  * Fill carries the stored double verbatim (no interpolation arithmetic),
  * so results are bit-identical across engines; a linear-interp variant
  * would be one extra lead() and IEEE-deterministic too.
  */
object Resample {

  /** Per-key gap-free grid from each key's first to last occupied bucket:
    * `n_obs` events per bucket (0 in gaps) and `value_locf` = the
    * bucket's LAST observation by (ts, event_id), carried forward through
    * gaps. The first grid bucket is occupied by construction, so
    * `value_locf` is never null. */
  def resampleLocf(events: DataFrame, bucketMinutes: Int = 60): DataFrame =
    resampled(events, bucketMinutes, interp = false)

  /** Like [[resampleLocf]] but gap buckets get the LINEAR interpolation
    * between the surrounding occupied buckets' values:
    * `prev + (next - prev) * (t - t_prev) / (t_next - t_prev)` over epoch
    * micros. Occupied buckets keep their own last observation verbatim
    * (the fraction is exactly 0.0 there). The grid ends at each key's last
    * occupied bucket, so a bracketing occupied bucket always exists on
    * both sides. IEEE-deterministic: the fraction's numerator/denominator
    * are exact BIGINT micros cast to double (< 2^53), and the expression's
    * operation order is fixed, so any IEEE-754 engine (the DuckDB oracle
    * included) reproduces it bit-for-bit. */
  def resampleInterp(events: DataFrame, bucketMinutes: Int = 60): DataFrame =
    resampled(events, bucketMinutes, interp = true)

  private def resampled(
      events: DataFrame, bucketMinutes: Int, interp: Boolean): DataFrame = {
    require(bucketMinutes > 0, s"bucketMinutes must be positive, got $bucketMinutes")
    val us = bucketMinutes.toLong * 60L * 1000000L
    // FLOOR-aligned bucket start: micros - pmod(micros, width). Integer
    // `div` truncates toward zero, which for pre-1970 timestamps would
    // round UP (buckets starting after their events) and diverge from the
    // oracle's flooring `//`/time_bucket; pmod keeps it exact integer
    // arithmetic with no double-division rounding risk.
    val bucketed = events.select(
      col("user_id"),
      timestamp_micros(expr(s"unix_micros(ts) - pmod(unix_micros(ts), ${us}L)"))
        .as("bucket"),
      col("ts"), col("event_id"), col("value"))
    val byRecency = Window.partitionBy(col("user_id"), col("bucket"))
      .orderBy(col("ts").desc, col("event_id").desc)
    val lastObs = bucketed
      .withColumn("_rn", row_number().over(byRecency))
      .filter(col("_rn") === 1)
      .select(col("user_id"), col("bucket"), col("value").as("_last"))
    val counts = bucketed.groupBy(col("user_id"), col("bucket"))
      .agg(count(lit(1)).as("n_obs"))
    val grid = bucketed.groupBy(col("user_id"))
      .agg(min(col("bucket")).as("_b0"), max(col("bucket")).as("_b1"))
      .select(col("user_id"),
        explode(sequence(col("_b0"), col("_b1"),
          expr(s"INTERVAL $bucketMinutes MINUTES"))).as("bucket"))
    val fill = Window.partitionBy(col("user_id")).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val joined = grid
      .join(lastObs, Seq("user_id", "bucket"), "left")
      .join(counts, Seq("user_id", "bucket"), "left")
    if (!interp) {
      joined.select(col("user_id"), col("bucket"),
        coalesce(col("n_obs"), lit(0L)).as("n_obs"),
        last(col("_last"), ignoreNulls = true).over(fill).as("value_locf"))
    } else {
      // Backward fill as a RUNNING frame over bucket DESC: `first ignoreNulls
      // over [current, unbounded following]` ASC is the same value, but
      // Spark executes an unbounded-following frame by rescanning current→end
      // for EVERY row — O(buckets²) per key. The DESC running frame is the
      // O(n) streaming implementation; it reuses the same hash exchange and
      // costs one extra in-partition sort.
      val fillBwd = Window.partitionBy(col("user_id"))
        .orderBy(col("bucket").desc)
        .rowsBetween(Window.unboundedPreceding, 0)
      val occupiedAt = when(col("_last").isNotNull, col("bucket"))
      val frac =
        (unix_micros(col("bucket")) - unix_micros(col("_pb"))).cast("double") /
        (unix_micros(col("_nb")) - unix_micros(col("_pb"))).cast("double")
      joined
        .select(col("user_id"), col("bucket"),
          coalesce(col("n_obs"), lit(0L)).as("n_obs"),
          last(col("_last"), ignoreNulls = true).over(fill).as("_pv"),
          last(occupiedAt, ignoreNulls = true).over(fill).as("_pb"),
          last(col("_last"), ignoreNulls = true).over(fillBwd).as("_nv"),
          last(occupiedAt, ignoreNulls = true).over(fillBwd).as("_nb"))
        .select(col("user_id"), col("bucket"), col("n_obs"),
          // _nb == _pb only when the row IS that occupied bucket (0/0
          // guard); everywhere else prev < next strictly brackets.
          when(col("_nb") === col("_pb"), col("_pv"))
            .otherwise(col("_pv") + (col("_nv") - col("_pv")) * frac)
            .as("value_interp"))
    }
  }
}
