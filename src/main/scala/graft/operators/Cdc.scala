package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Change-data-capture application (EXT tier — the reference has no
  * mutation surface; this is the batch MERGE INTO a snapshot-maintenance
  * pipeline runs at every ingest cycle, and the history face of the same
  * feed is the SCD type-2 interval table).
  *
  * Both operators treat the change feed as the source of truth for
  * ordering: `orderCol` must be a strict total order WITHIN each key (a
  * CDC log sequence number, or an event timestamp unique per key). An
  * order collision that would make the result ambiguous throws at runtime
  * via `assert_true` (codegen'd, no UDF) — silent tie-breaking is how
  * replicas diverge. `applyChanges` checks the collision that matters to
  * it (two changes tied at a key's LATEST order value); `scd2History`
  * checks every adjacent tie, since any of them corrupts an interval.
  */
object Cdc {

  /** MERGE a CDC change feed into a snapshot (upsert-or-delete semantics):
    * per key, the LATEST change by `orderCol` wins — if its `opCol` equals
    * `deleteOp` the key is removed, otherwise the change row replaces (or
    * inserts) the snapshot row. Changes must carry the snapshot's columns;
    * result schema = snapshot schema.
    *
    * Scale shape: the change feed is ranked with ONE window exchange on
    * the key (feed-sized, typically ≪ snapshot), then the snapshot is
    * touched by exactly one anti-join on the changed-key set — AQE
    * broadcasts it when the feed is small, so a 100 TB snapshot with a
    * 1 GB feed never shuffles the snapshot side. Unchanged rows are never
    * rewritten here by construction; pair with a partitioned sink to
    * rewrite only affected partitions.
    */
  def applyChanges(
      snapshot: DataFrame,
      changes: DataFrame,
      keyCol: String,
      orderCol: String,
      opCol: String,
      deleteOp: String = "D"): DataFrame = {
    val snapCols = snapshot.columns
    require(snapCols.forall(changes.columns.contains),
      s"changes must carry every snapshot column; missing " +
        s"${snapCols.filterNot(changes.columns.contains).mkString(", ")}")
    val w = Window.partitionBy(col(keyCol)).orderBy(col(orderCol).desc)
    val latest = changes
      .withColumn("_rn", row_number().over(w))
      .withColumn("_next", lead(col(orderCol), 1).over(w))
      .filter(col("_rn") === 1)
      .filter(assert_true(
        col("_next").isNull || col("_next") =!= col(orderCol),
        concat(lit("CDC order collision: two changes tied at the latest "),
          lit(s"$orderCol of $keyCol="), col(keyCol).cast("string"),
          lit(" — orderCol must be unique per key for deterministic MERGE")))
        .isNull)
    val upserts = latest.filter(col(opCol) =!= deleteOp)
      .select(snapCols.map(col).toIndexedSeq: _*)
    snapshot.join(latest.select(col(keyCol)), Seq(keyCol), "left_anti")
      .unionByName(upserts)
  }

  /** SCD type-2 interval history of a change feed: one row per change,
    * `valid_from` = its order value, `valid_to` = the NEXT change's order
    * value for the same key (null while current), `version` = 1-based
    * change number, `is_current` on the open interval. Delete semantics
    * stay visible: a delete change closes the prior interval and its own
    * row records the tombstone — downstream consumers filter on the op
    * column they carry. ONE exchange on the key; all three window
    * functions share it.
    */
  def scd2History(
      changes: DataFrame, keyCol: String, orderCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(orderCol))
    changes
      .withColumn("valid_from", col(orderCol))
      .withColumn("valid_to", lead(col(orderCol), 1).over(w))
      .withColumn("version", row_number().over(w))
      .filter(assert_true(
        col("valid_to").isNull || col("valid_to") =!= col("valid_from"),
        concat(lit(s"CDC order collision: $keyCol="), col(keyCol).cast("string"),
          lit(s" has two changes at $orderCol="), col(orderCol).cast("string"),
          lit(" — orderCol must be unique per key for interval history")))
        .isNull)
      .withColumn("is_current", col("valid_to").isNull)
  }
}
