package graft

import org.apache.spark.sql.functions._
import graft.functions.Privacy

/** Suppression-based k-anonymity (`k_anonymize`, `k_anonymity_profile`):
  * the published table must be k-anonymous BY CONSTRUCTION — every
  * equivalence class over the quasi-identifiers (including the pooled
  * `(*,…,*)` residual) has ≥ k members, non-QI columns pass through
  * untouched, and the profile histogram partitions the row count. */
class PrivacySpec extends SparkSpec {
  import spark.implicits._

  // 3 big classes (sizes 5, 4, 3), 3 singletons → k=3: the singletons
  // pool into a residual class of 3, exactly at the threshold.
  private def fixture = Seq(
    (1L, "US", "A", 10.0), (2L, "US", "A", 11.0), (3L, "US", "A", 12.0),
    (4L, "US", "A", 13.0), (5L, "US", "A", 14.0),
    (6L, "DE", "B", 20.0), (7L, "DE", "B", 21.0), (8L, "DE", "B", 22.0),
    (9L, "DE", "B", 23.0),
    (10L, "FR", "A", 30.0), (11L, "FR", "A", 31.0), (12L, "FR", "A", 32.0),
    (13L, "JP", "C", 40.0), (14L, "BR", "B", 41.0), (15L, "IN", "A", 42.0)
  ).toDF("id", "country", "segment", "score")

  test("profile: histogram partitions rows and flags classes below k") {
    val p = Privacy.kAnonymityProfile(fixture, Seq("country", "segment"), k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3)))
    assert(p.toSeq == Seq((1L, 3L, 3L, true), (3L, 1L, 3L, false),
      (4L, 1L, 4L, false), (5L, 1L, 5L, false)))
    assert(p.map(_._3).sum == 15L)
  }

  test("anonymize: survivors keep QIs, small classes pool into '*' and clear k") {
    val out = Privacy.kAnonymize(fixture, Seq("country", "segment"), k = 3)
    val rows = out.orderBy(col("id")).collect()
    assert(rows.length == 15) // residual class is exactly 3 → published
    val byId = rows.map(r => r.getLong(0) ->
      (r.getString(1), r.getString(2), r.getBoolean(4), r.getLong(5))).toMap
    assert(byId(1L) == (("US", "A", false, 5L)))
    assert(byId(13L) == (("*", "*", true, 3L)))
    assert(byId(14L) == (("*", "*", true, 3L)))
    // non-QI columns untouched
    assert(rows.map(_.getDouble(3)).sorted.toSeq ==
      fixture.collect().map(_.getDouble(3)).sorted.toSeq)
    // the output is k-anonymous: EVERY published class has ≥ k members
    val classes = out.groupBy("country", "segment").count()
      .select("count").as[Long].collect()
    assert(classes.forall(_ >= 3L))
  }

  test("anonymize: a residual class below k is dropped entirely") {
    val two = fixture.filter(col("id") <= 14) // only 2 singletons remain
    val out = Privacy.kAnonymize(two, Seq("country", "segment"), k = 3)
    assert(out.count() == 12)
    assert(out.filter(col("suppressed")).count() == 0)
  }

  test("genuine '*' data cannot pad the suppressed residual class past k") {
    // 3 genuine ('*','*') rows (a real class, >= k alone) + 2 singletons
    // that suppress to the same tuple. The released `suppressed` flag
    // still separates them for an attacker, so the residual pool of 2
    // must be judged ALONE — and dropped — while the genuine class
    // publishes untouched.
    val data = Seq(
      (1L, "*", "*", 1.0), (2L, "*", "*", 2.0), (3L, "*", "*", 3.0),
      (4L, "US", "A", 4.0), (5L, "DE", "B", 5.0)
    ).toDF("id", "country", "segment", "score")
    val out = Privacy.kAnonymize(data, Seq("country", "segment"), k = 3)
      .orderBy(col("id")).collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    assert(out.forall(!_.getBoolean(4)))
    assert(out.forall(_.getLong(5) == 3L))
  }

  test("k=1 is the identity publish (nothing suppressed, nothing dropped)") {
    val out = Privacy.kAnonymize(fixture, Seq("country", "segment"), k = 1)
    assert(out.count() == 15 && out.filter(col("suppressed")).count() == 0)
  }
}
