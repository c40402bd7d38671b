package graft

import org.apache.spark.sql.functions._
import graft.functions.Dedup
import graft.plans.UnicodeNormalize

/** Unicode normalization expression ([[graft.plans.UnicodeNormalize]]):
  * composition semantics, idempotence, the ASCII fast path, NFKC
  * compatibility folding, and the dedup integration that motivates it
  * (byte equality == text equality after NFC). All non-ASCII input is
  * written as \u escapes so the assertions are independent of source-file
  * encoding. Oracle parity at sf is `normalize_text` in CORRECTNESS
  * (DuckDB `nfc_normalize`). */
class UnicodeNormalizeSpec extends SparkSpec {
  import spark.implicits._

  private val eAcuteD = "é"   // decomposed é
  private val eAcuteC = "\u00e9"    // composed é
  private val uUmlD = "ü"     // decomposed ü
  private val uUmlC = "\u00fc"      // composed ü

  private def nfc(ss: String*): Seq[String] =
    ss.toDF("t").select(UnicodeNormalize.nfc(col("t"))).as[String].collect().toSeq

  test("NFC composes decomposed sequences") {
    assert(nfc(s"caf$eAcuteD", s"${uUmlD}ber", s"Ångstro${uUmlD}m") ===
      Seq(s"caf$eAcuteC", s"${uUmlC}ber", s"\u00c5ngstro${uUmlC}m"))
  }

  test("NFC is idempotent and leaves ASCII + composed text unchanged") {
    val in = Seq("plain ascii", s"caf$eAcuteC", "", "a b  c")
    assert(nfc(in: _*) === in)
    val once = nfc(s"caf$eAcuteD mix $uUmlD")
    assert(nfc(once: _*) === once)
  }

  test("NFKC folds compatibility forms NFC must preserve") {
    val got = Seq("\ufb01le", "\uff12\uff10", "x\u00b2").toDF("t")
      .select(UnicodeNormalize.nfkc(col("t"))).as[String].collect().toSeq
    assert(got === Seq("file", "20", "x2")) // ligature, full-width, superscript
    assert(nfc("\ufb01le", "\uff12\uff10") === Seq("\ufb01le", "\uff12\uff10"))
  }

  test("nulls pass through; bad form name fails at plan time") {
    val got = Seq(Some(eAcuteC), None).toDF("t")
      .select(UnicodeNormalize.nfc(col("t"))).as[Option[String]].collect()
    assert(got.toSet === Set(Some(eAcuteC), None))
    intercept[IllegalArgumentException] {
      UnicodeNormalize.of(col("t"), "NFX")
    }
  }

  test("NFC upstream of exact dedup unifies composed/decomposed duplicates") {
    val docs = Seq((1L, s"caf$eAcuteC menu"), (2L, s"caf$eAcuteD menu"),
      (3L, "other")).toDF("doc_id", "text")
    // raw bytes differ -> 3 distinct content keys, no group has dups
    assert(Dedup.exactGroups(docs).filter(col("n_dups") > 1).count() === 0)
    val n = docs.withColumn("text", UnicodeNormalize.nfc(col("text")))
    assert(Dedup.exactGroups(n).filter(col("n_dups") > 1).count() === 1)
  }
}
