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
  def resampleLocf(events: DataFrame, bucketMinutes: Int = 60): DataFrame = {
    require(bucketMinutes > 0, s"bucketMinutes must be positive, got $bucketMinutes")
    val us = bucketMinutes.toLong * 60L * 1000000L
    val bucketed = events.select(
      col("user_id"),
      timestamp_micros(expr(s"(unix_micros(ts) div ${us}L) * ${us}L"))
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
    grid
      .join(lastObs, Seq("user_id", "bucket"), "left")
      .join(counts, Seq("user_id", "bucket"), "left")
      .select(col("user_id"), col("bucket"),
        coalesce(col("n_obs"), lit(0L)).as("n_obs"),
        last(col("_last"), ignoreNulls = true).over(fill).as("value_locf"))
  }
}
