package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.{NearDup, SignatureStore}

/** Persisted signature store ([[graft.functions.SignatureStore]]) — the
  * store round-trip must be invisible: screening against parquet
  * signatures equals screening against re-shingled text, including after
  * incremental appends. Oracle parity at sf is `dedup_incremental_store`
  * (same SQL as `dedup_incremental`). */
class SignatureStoreSpec extends SparkSpec {
  import spark.implicits._

  private def tmp() =
    java.nio.file.Files.createTempDirectory("graft_sigstore_test").toString

  /** recompute-from-text reference: the dedup_incremental composition */
  private def reference(existing: DataFrame, incoming: DataFrame): Seq[Long] = {
    val exKeys = existing.select(md5(lower(trim(col("text")))).as("h")).distinct()
    val keepers = incoming
      .select(col("doc_id"), md5(lower(trim(col("text")))).as("h"))
      .groupBy(col("h")).agg(min(col("doc_id")).as("doc_id"))
    val afterExact = keepers.join(exKeys, Seq("h"), "left_anti")
    val ndOld = NearDup.ngramJaccardAcross(incoming, existing, 0.5)
      .select(col("id_a").as("doc_id")).distinct()
    val ndNew = NearDup.ngramJaccardPairs(incoming, 0.5)
      .select(col("id_b").as("doc_id")).distinct()
    afterExact.select(col("doc_id"))
      .join(ndOld, Seq("doc_id"), "left_anti")
      .join(ndNew, Seq("doc_id"), "left_anti")
      .as[Long].collect().sorted.toSeq
  }

  private def docs(sf: String) = Tables.documents(spark, sf)

  test("store-backed screen equals the recompute-from-text reference") {
    val existing = docs(sf0001).filter(col("doc_id") < 30)
    val incoming = docs(sf0001).filter(col("doc_id") >= 30)
    val dir = tmp()
    SignatureStore.build(existing, dir)
    val got = SignatureStore.screenBatch(spark, incoming, dir, 0.5)
      .as[Long].collect().sorted.toSeq
    val want = reference(existing, incoming)
    assert(want.nonEmpty && got == want)
  }

  test("append grows the store batch-by-batch (second batch sees the first)") {
    val base = docs(sf0001).filter(col("doc_id") < 20)
    val b1 = docs(sf0001).filter(col("doc_id") >= 20 && col("doc_id") < 35)
    val b2 = docs(sf0001).filter(col("doc_id") >= 35)
    val dir = tmp()
    SignatureStore.build(base, dir)
    SignatureStore.append(b1, dir)
    val got = SignatureStore.screenBatch(spark, b2, dir, 0.5)
      .as[Long].collect().sorted.toSeq
    val want = reference(base.unionAll(b1), b2)
    assert(got == want)
  }

  test("short docs (< w tokens) screen exactly via the empty-array row") {
    val existing = Seq((1L, "x y"), (2L, "a b c d e")).toDF("doc_id", "text")
    val incoming = Seq((10L, "x y"), (11L, "q r"), (12L, "a b c d e f"))
      .toDF("doc_id", "text")
    val dir = tmp()
    SignatureStore.build(existing, dir)
    val got = SignatureStore.screenBatch(spark, incoming, dir, 0.5)
      .as[Long].collect().sorted.toSeq
    // 10 is an exact dup of 1 (short docs still hash); 12 is a near-dup
    // of 2 (jaccard 4/6 >= 0.5); only 11 survives
    assert(got == Seq(11L))
  }
}
