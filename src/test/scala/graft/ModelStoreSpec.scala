package graft

import org.apache.spark.sql.functions._
import graft.functions.{Dsir, LangModel, ModelStore, QualityClassifier, Text}

/** Durable model artifacts ([[graft.functions.ModelStore]]): every
  * save/load round-trip must score identically to the in-JVM original
  * (the cross-job production contract), the manifest must be the commit
  * point (no `_MODEL` → loud refusal), and published dirs must be
  * immutable. Cross-engine parity is `kn_perplexity_served` in
  * CORRECTNESS. */
class ModelStoreSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString + "/m"

  private def ref = Seq(
    (1L, "a b a b c a"),
    (2L, "b c a b"),
    (3L, "c c a")).toDF("doc_id", "text")

  private def held = Seq(
    (10L, "a b z"), (11L, "z q"), (12L, "c a b a")).toDF("doc_id", "text")

  test("KN model round-trips: loaded scoring == in-JVM scoring") {
    val dir = tmp("graft_ms_kn")
    val lm = LangModel.trainKn(ref)
    ModelStore.saveKn(lm, dir)
    val loaded = ModelStore.loadKn(spark, dir)
    assert(loaded.bigramTypes == lm.bigramTypes)
    assert(loaded.vocab == lm.vocab)
    assert(loaded.discount == lm.discount)
    assert(rows(LangModel.scoreWithKn(loaded, held).orderBy(col("doc_id"))) ==
      rows(LangModel.scoreWithKn(lm, held).orderBy(col("doc_id"))))
    lm.unpersist()
  }

  test("add-one bigram model round-trips") {
    val dir = tmp("graft_ms_bg")
    val lm = LangModel.train(ref)
    ModelStore.saveBigram(lm, dir)
    val loaded = ModelStore.loadBigram(spark, dir)
    assert(rows(LangModel.scoreWith(loaded, held).orderBy(col("doc_id"))) ==
      rows(LangModel.scoreWith(lm, held).orderBy(col("doc_id"))))
  }

  test("NB model round-trips, scalar doubles exact") {
    val dir = tmp("graft_ms_nb")
    val m = QualityClassifier.train(ref,
      Seq((1L, true), (2L, false), (3L, true)).toDF("doc_id", "pass"))
    ModelStore.saveNb(m, dir)
    val loaded = ModelStore.loadNb(spark, dir)
    assert(loaded.priorLogOdds == m.priorLogOdds, "double must round-trip bit-exact")
    assert(rows(QualityClassifier.scoreWith(loaded, held).orderBy(col("doc_id"))) ==
      rows(QualityClassifier.scoreWith(m, held).orderBy(col("doc_id"))))
  }

  test("DSIR model round-trips") {
    val dir = tmp("graft_ms_dsir")
    val m = Dsir.train(ref, ref.filter(col("doc_id") =!= 2L))
    ModelStore.saveDsir(m, dir)
    assert(rows(Dsir.scoreWith(ModelStore.loadDsir(spark, dir), held)
        .orderBy(col("doc_id"))) ==
      rows(Dsir.scoreWith(m, held).orderBy(col("doc_id"))))
  }

  test("BPE merges and unigram pieces round-trip in exact order") {
    val mDir = tmp("graft_ms_bpe")
    val merges = Seq(("a", "b"), ("ab", "c"), ("d", "e</w>"))
    ModelStore.saveBpeMerges(spark, merges, mDir)
    assert(ModelStore.loadBpeMerges(spark, mDir) == merges)
    val pDir = tmp("graft_ms_uni")
    // deliberately NOT prob-sorted: order must survive as-is
    val pieces = Seq(("ab", 0.1), ("a", 0.4), ("b</w>", 0.4), ("c", 0.1))
    ModelStore.saveUnigramPieces(spark, pieces, pDir)
    assert(ModelStore.loadUnigramPieces(spark, pDir) == pieces)
    // and the loaded pieces drive the encoder identically
    val enc = Text.unigramEncode(col("text"), pieces)
    val encLoaded = Text.unigramEncode(col("text"),
      ModelStore.loadUnigramPieces(spark, pDir))
    assert(rows(held.select(enc)) == rows(held.select(encLoaded)))
  }

  test("no _MODEL manifest -> loud refusal; kind mismatch -> loud refusal") {
    val dir = tmp("graft_ms_bad")
    // crashed publish: data landed, manifest never committed
    ref.limit(1).write.parquet(s"$dir/counts")
    val e = intercept[IllegalStateException](ModelStore.loadKn(spark, dir))
    assert(e.getMessage.contains("no _MODEL manifest"))
    val dsirDir = tmp("graft_ms_kind")
    ModelStore.saveDsir(Dsir.train(ref, ref), dsirDir)
    val k = intercept[IllegalArgumentException](ModelStore.loadKn(spark, dsirDir))
    assert(k.getMessage.contains("kind"))
  }

  test("a retried publish over crashed leftovers converges") {
    val dir = tmp("graft_ms_retry")
    // crashed first attempt: one table landed, no manifest committed
    val lm = LangModel.trainKn(ref)
    lm.counts.write.parquet(s"$dir/counts")
    // the retry must clear the orphan and publish normally — not wedge
    // on errorifexists forever
    ModelStore.saveKn(lm, dir)
    assert(rows(LangModel.scoreWithKn(ModelStore.loadKn(spark, dir), held)
        .orderBy(col("doc_id"))) ==
      rows(LangModel.scoreWithKn(lm, held).orderBy(col("doc_id"))))
    lm.unpersist()
  }

  test("published model dirs are immutable: republish refuses, model intact") {
    val dir = tmp("graft_ms_imm")
    val m = Dsir.train(ref, ref)
    ModelStore.saveDsir(m, dir)
    val before = rows(ModelStore.loadDsir(spark, dir).bucketLogRatio
      .orderBy(col("b")))
    // the publish refuses BEFORE writing anything (requireUnpublished);
    // the manifest's exclusive create backs it up — the model stands
    intercept[Exception](ModelStore.saveDsir(Dsir.train(ref, ref), dir))
    assert(rows(ModelStore.loadDsir(spark, dir).bucketLogRatio
      .orderBy(col("b"))) == before)
  }

  test("list(): committed models enumerated with their kinds, crashed publishes invisible") {
    val root = java.nio.file.Files.createTempDirectory("graft_ms_list").toString
    ModelStore.saveDsir(Dsir.train(ref, ref), s"$root/dsir_a")
    ModelStore.saveBpeMerges(spark, Seq(("a", "b")), s"$root/bpe_b")
    // crashed publish: staged tables, no manifest — must be invisible
    ref.limit(1).write.parquet(s"$root/crashed/t123/counts")
    val got = ModelStore.list(spark, root)
    assert(got.map(e => (e._1.split('/').last, e._2))
      == Seq(("bpe_b", "bpe_merges"), ("dsir_a", "dsir")), got.toString)
    assert(got.forall(_._3 > 0L), "publish nonces must be recorded")
    // a dir that is no model store at all lists empty, not loudly
    assert(ModelStore.list(spark, s"$root/nowhere") == Seq.empty)
  }

  test("two publishers racing one dir: one winner, winner's tables intact, " +
      "orphans vacuumable") {
    // The round-13 hazard: staging at FIXED table names let a loser
    // delete/rewrite the winner's tables after the winner wrote them but
    // before its manifest landed. Salted staging makes the writes
    // disjoint: simulate the worst interleaving by staging B's tables
    // while A publishes completely, then letting B's commit race.
    val dir = tmp("graft_ms_race")
    val mA = Dsir.train(ref, ref.filter(col("doc_id") =!= 2L))
    val mB = Dsir.train(ref, ref.filter(col("doc_id") =!= 3L))
    ModelStore.saveDsir(mA, dir) // A wins
    val wantA = rows(ModelStore.loadDsir(spark, dir).bucketLogRatio
      .orderBy(col("b")))
    // B arrives late: must refuse without touching A's committed tables
    intercept[Exception](ModelStore.saveDsir(mB, dir))
    assert(rows(ModelStore.loadDsir(spark, dir).bucketLogRatio
      .orderBy(col("b"))) == wantA, "loser damaged the winner's model")
    // a crashed/losing attempt's staging dir is reaped by vacuumOrphans,
    // and the committed tables survive it
    mB.bucketLogRatio.write.parquet(s"$dir/t999/log_ratio")
    ModelStore.vacuumOrphans(spark, dir)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$dir/t999")),
      "orphan staging must be reaped")
    assert(rows(ModelStore.loadDsir(spark, dir).bucketLogRatio
      .orderBy(col("b"))) == wantA, "vacuum reaped the committed tables")
  }
}
