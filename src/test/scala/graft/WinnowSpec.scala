package graft

import org.apache.spark.sql.functions._
import graft.functions.Winnow

/** Winnowing fingerprints ([[graft.functions.Winnow]], Schleimer et al.
  * SIGMOD 2003): hash parity with a driver-side reference, the paper's
  * density/containment guarantee, short-text degenerates, overlap pairs
  * on a planted copy. Oracle parity at sf is `winnow_fingerprint` /
  * `winnow_overlap` in CORRECTNESS. */
class WinnowSpec extends SparkSpec {
  import spark.implicits._

  /** Driver-side reference of the same pipeline — CODE POINT indexed,
    * like `split(text,'')`/`ascii()` and the DuckDB oracle. */
  private def refHashes(s: String, k: Int): Seq[Long] = {
    val cps = s.codePoints().toArray
    if (cps.length < k) Seq.empty
    else (0 to cps.length - k).map { i =>
      var h = 0L
      for (j <- 0 until k) h = (h * Winnow.B + cps(i + j).toLong) % Winnow.M
      h
    }
  }
  private def refFps(s: String, k: Int, w: Int): Seq[Long] = {
    val hs = refHashes(s, k)
    if (hs.isEmpty) Seq.empty
    else if (hs.length < w) Seq(hs.min)
    else (0 to hs.length - w).map(i => hs.slice(i, i + w).min).distinct.sorted
  }

  private def engineFps(texts: Seq[String], k: Int, w: Int): Map[String, Seq[Long]] =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      .select(col("text"), Winnow.fingerprints(col("text"), k, w).as("fp"))
      .as[(String, Seq[Long])].collect().toMap

  test("k-gram hashes match the driver-side polynomial reference") {
    val texts = Seq("the quick brown fox", "aaaaaaaa", "abc", "", "abcdefgh")
    val got = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
      .select(col("text"), Winnow.kgramHashes(col("text"), 8).as("h"))
      .as[(String, Seq[Long])].collect().toMap
    texts.foreach { t => assert(got(t) == refHashes(t, 8), s"text '$t'") }
  }

  test("native kernel == interpreted HOF pipeline on varied texts") {
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog and runs far away",
      "aaaaaaaaaaaaaaaaaaaa", "abcdefgh", "abcdefghi", "abc", "",
      "x y z " * 20)
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val native = df.select(col("doc_id"), Winnow.fingerprints(col("text"), 8, 4).as("f"))
      .as[(Long, Seq[Long])].collect().toMap
    val hof = df.select(col("doc_id"), Winnow.fingerprintsHof(col("text"), 8, 4).as("f"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(native == hof)
  }

  test("supplementary-plane code points: kernel == HOF == driver reference") {
    // 😀 (U+1F600) is TWO UTF-16 units but ONE code point — a code-unit
    // kernel would both shift the gram grid and hash surrogate halves.
    val emoji = new String(Character.toChars(0x1F600))
    val gclef = new String(Character.toChars(0x1D11E)) // U+1D11E, also supplementary
    val texts = Seq(
      s"abc${emoji}def${emoji}ghi jkl",
      (s"x$emoji" * 8) + "tail of text",
      s"$gclef$emoji" * 6,
      emoji * 3) // shorter than k in code points though not in chars
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val native = df.select(col("doc_id"), Winnow.fingerprints(col("text"), 8, 4).as("f"))
      .as[(Long, Seq[Long])].collect().toMap
    val hof = df.select(col("doc_id"), Winnow.fingerprintsHof(col("text"), 8, 4).as("f"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(native == hof)
    texts.zipWithIndex.foreach { case (t, i) =>
      assert(native(i.toLong) == refFps(t, 8, 4), s"text #$i")
    }
  }

  test("fingerprints match the reference incl. short-text degenerates") {
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog",
      "abcdefgh",          // exactly k chars -> 1 gram -> 1 fingerprint
      "abcdefghi",         // 2 grams < w -> whole-array min
      "abc", "")           // < k -> empty
    val got = engineFps(texts, 8, 4)
    texts.foreach { t => assert(got(t) == refFps(t, 8, 4), s"text '$t'") }
    assert(got("abcdefgh").length == 1 && got("abc").isEmpty && got("").isEmpty)
  }

  test("density guarantee: shared substring of length >= k+w-1 shares a fingerprint") {
    // the paper's correctness property: any common substring of length
    // t = k + w - 1 contains a full hash window in both docs, and the
    // window's min VALUE is selected in both
    val core = "zqxwvuty plagiarized span jkmnbpoi"  // 34 > 8+4-1
    val a = s"left context before $core and a tail"
    val b = s"completely different opening $core other ending"
    val got = engineFps(Seq(a, b), 8, 4)
    assert(got(a).toSet.intersect(got(b).toSet).nonEmpty)
  }

  test("summary: counts/sum/min/max derive from the exact fingerprint set") {
    val t = "the quick brown fox jumps over the lazy dog"
    val fps = refFps(t, 8, 4)
    val row = Winnow.fingerprintSummary(Seq((1L, t)).toDF("doc_id", "text"), 8, 4)
      .collect().head
    assert(row.getLong(1) == (t.length - 7).toLong)
    assert(row.getLong(2) == fps.length.toLong)
    assert(row.getLong(3) == fps.sum)
    assert(row.getLong(4) == fps.min && row.getLong(5) == fps.max)
  }

  test("property: random texts — kernel == reference; planted shared span always detected") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val alpha = Gen.listOfN(60, Gen.oneOf(('a' to 'f') :+ ' ')).map(_.mkString)
    val (k, w) = (8, 4)
    val texts = (1 to 40).map(i => alpha.pureApply(Gen.Parameters.default, Seed(i.toLong)))
    // 1) engine == driver reference on arbitrary text (small alphabet →
    //    dense hash ties, the hardest case for min-selection parity)
    val got = engineFps(texts.distinct, k, w)
    texts.distinct.foreach { t => assert(got(t) == refFps(t, k, w), s"'$t'") }
    // 2) density/containment guarantee on every pair sharing a planted
    //    span of length k + w - 1 = 11
    (1 to 20).foreach { i =>
      val span = alpha.pureApply(Gen.Parameters.default, Seed(1000L + i)).take(k + w - 1)
      val a = texts(i % texts.size) + span + texts((i + 7) % texts.size)
      val b = texts((i + 3) % texts.size) + span + texts((i + 11) % texts.size)
      val fps = engineFps(Seq(a, b).distinct, k, w)
      assert(fps(a).toSet.intersect(fps(b).toSet).nonEmpty, s"span '$span' lost")
    }
  }

  test("overlapPairs: planted copy found, unrelated docs absent") {
    val core = "zqxwvuty plagiarized span jkmnbpoi shared across documents"
    val docs = Seq(
      (1L, s"alpha opening $core closing alpha"),
      (2L, s"beta preamble $core beta epilogue"),
      (3L, "entirely unrelated content with nothing in common qqq")
    ).toDF("doc_id", "text")
    val pairs = Winnow.overlapPairs(docs, 8, 4, minShared = 3L)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }
}
