package graft

import org.apache.spark.sql.functions._
import graft.operators.Cdc

/** CDC MERGE + SCD2 history ([[graft.operators.Cdc]]) — upsert/delete/
  * insert semantics, latest-wins ordering, untouched-row preservation,
  * loud order-collision failure, interval bookkeeping. Oracle parity at
  * sf is `cdc_upsert` / `scd2_intervals` in CORRECTNESS. */
class CdcSpec extends SparkSpec {
  import spark.implicits._

  private val snap = Seq(
    (1L, "alice", 10.0), (2L, "bob", 20.0), (3L, "carol", 30.0))
    .toDF("id", "name", "bal")

  test("upsert, delete, insert, and untouched rows in one merge") {
    val changes = Seq(
      (2L, "bob2", 21.0, 100L, "U"),   // update existing
      (3L, "carol", 30.0, 100L, "D"),  // delete existing
      (9L, "zoe", 90.0, 100L, "U"))    // insert new key
      .toDF("id", "name", "bal", "seq", "op")
    val got = Cdc.applyChanges(snap, changes, "id", "seq", "op")
      .orderBy("id").as[(Long, String, Double)].collect().toSeq
    assert(got === Seq((1L, "alice", 10.0), (2L, "bob2", 21.0),
      (9L, "zoe", 90.0)))
  }

  test("latest change per key wins, earlier ones are ignored") {
    val changes = Seq(
      (2L, "old", 1.0, 1L, "U"), (2L, "mid", 2.0, 2L, "D"),
      (2L, "new", 3.0, 3L, "U"))
      .toDF("id", "name", "bal", "seq", "op")
    val got = Cdc.applyChanges(snap, changes, "id", "seq", "op")
      .filter(col("id") === 2L).as[(Long, String, Double)].collect().toSeq
    assert(got === Seq((2L, "new", 3.0)))
  }

  test("delete of an absent key is a no-op; delete wins when latest") {
    val changes = Seq(
      (7L, "ghost", 0.0, 5L, "D"),                         // absent key
      (1L, "alice2", 11.0, 1L, "U"), (1L, "x", 0.0, 2L, "D")) // del wins
      .toDF("id", "name", "bal", "seq", "op")
    val got = Cdc.applyChanges(snap, changes, "id", "seq", "op")
      .orderBy("id").as[(Long, String, Double)].collect().toSeq
    assert(got === Seq((2L, "bob", 20.0), (3L, "carol", 30.0)))
  }

  test("a tie at a key's latest order value throws") {
    val changes = Seq(
      (2L, "a", 1.0, 5L, "U"), (2L, "b", 2.0, 5L, "U"))
      .toDF("id", "name", "bal", "seq", "op")
    val e = intercept[Exception] {
      Cdc.applyChanges(snap, changes, "id", "seq", "op").collect()
    }
    assert(e.getMessage.contains("order collision")
      || Option(e.getCause).exists(_.getMessage.contains("order collision")))
  }

  test("result schema equals the snapshot schema") {
    val changes = Seq((2L, "x", 1.0, 1L, "U"))
      .toDF("id", "name", "bal", "seq", "op")
    assert(Cdc.applyChanges(snap, changes, "id", "seq", "op").schema
      === snap.schema)
  }

  test("scd2 intervals chain per key with one open current row") {
    val changes = Seq(
      (1L, 10.0, 100L), (1L, 11.0, 200L), (1L, 12.0, 300L),
      (2L, 20.0, 150L))
      .toDF("id", "bal", "seq")
    val got = Cdc.scd2History(changes, "id", "seq")
      .select(col("id"), col("bal"), col("valid_from"), col("valid_to"),
        col("version"), col("is_current"))
      .orderBy("id", "version")
      .as[(Long, Double, Long, Option[Long], Int, Boolean)].collect().toSeq
    assert(got === Seq(
      (1L, 10.0, 100L, Some(200L), 1, false),
      (1L, 11.0, 200L, Some(300L), 2, false),
      (1L, 12.0, 300L, None, 3, true),
      (2L, 20.0, 150L, None, 1, true)))
  }

  test("scd2 throws on any order collision, not only the latest") {
    val changes = Seq(
      (1L, 1.0, 100L), (1L, 2.0, 100L), (1L, 3.0, 300L))
      .toDF("id", "bal", "seq")
    val e = intercept[Exception] {
      Cdc.scd2History(changes, "id", "seq").collect()
    }
    assert(e.getMessage.contains("order collision")
      || Option(e.getCause).exists(_.getMessage.contains("order collision")))
  }

  test("merge then history agree: latest non-delete rows are the current intervals") {
    val changes = Seq(
      (1L, "a1", 1.0, 1L, "U"), (1L, "a2", 2.0, 2L, "U"),
      (2L, "b1", 3.0, 1L, "D"), (9L, "z", 9.0, 1L, "U"))
      .toDF("id", "name", "bal", "seq", "op")
    val merged = Cdc.applyChanges(snap, changes, "id", "seq", "op")
    val current = Cdc.scd2History(changes, "id", "seq")
      .filter(col("is_current") && col("op") =!= "D")
      .select("id", "name", "bal")
    // every current non-delete interval row appears verbatim in the merge
    assert(current.except(merged).count() === 0)
  }
}
