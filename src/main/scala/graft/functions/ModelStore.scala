package graft.functions

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Durable artifacts for the trained models — train once, PUBLISH, score
  * everywhere: the missing piece between the in-JVM frozen-model contract
  * (every `train`/`scoreWith` pair in [[LangModel]], [[QualityClassifier]],
  * [[Dsir]], [[graft.plans.Bpe]]) and a production topology where the
  * trainer, the batch scorers, and the streaming scorers are DIFFERENT
  * jobs on different machines. The reference has no model surface at all
  * (its scalar tier is user lambdas, `/root/reference/source/koalas/
  * dataframe.d:238-262`); this is the LLM-pipeline artifact tier, the
  * model-sized sibling of [[PairStore]] / [[SignatureStore]] /
  * [[IvfIndex]].
  *
  * '''Layout & crash model''' (the store tier's convention, data-first /
  * manifest-last): model tables land as parquet under `dir/<table>/`,
  * scalars and the model kind land in the `dir/_MODEL` manifest, written
  * to a temp name and RENAMED as the single commit point — the rename
  * is pre-checked against an existing destination and READ BACK after
  * publishing (a per-publish nonce makes the content ownable), so a
  * published model is immutable (republish to a fresh path) and two
  * racing publishers resolve to exactly one winner even on local
  * filesystems whose rename replaces silently. A crash before the
  * rename leaves no `_MODEL`; [[loadKn]]/[[loadNb]]/... refuse the dir
  * loudly, and a RETRIED publish to the same dir converges: each save*
  * first clears the crashed attempt's orphan tables ([[prepareDir]] —
  * a dir with no manifest holds nothing committed).
  *
  * Model tables are vocabulary-/bucket-bounded by construction — the
  * artifacts are MBs, not corpus-sized; the parquet detour costs one
  * columnar scan at load and buys cross-job, cross-engine reuse.
  * Loaded frames come straight off parquet (no persist — the scans are
  * pruned and cheap; callers scoring many batches may persist). */
object ModelStore {

  private def fsOf(spark: SparkSession, dir: String): FileSystem =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Make `dir` publishable for a fresh attempt: refuse if a `_MODEL`
    * manifest exists (published models are immutable), otherwise delete
    * the named table dirs and stale tmp manifests a CRASHED earlier
    * attempt left behind — with no manifest nothing in the dir is
    * committed, so a retried publish converges instead of wedging on
    * errorifexists forever. */
  private def prepareDir(
      spark: SparkSession, dir: String, tables: Seq[String]): Unit = {
    val fs = fsOf(spark, dir)
    if (fs.exists(new Path(s"$dir/_MODEL")))
      throw new java.util.ConcurrentModificationException(
        s"ModelStore: $dir/_MODEL already exists — published models are " +
          "immutable; publish to a fresh path or delete the dir first")
    val root = new Path(dir)
    if (fs.exists(root)) {
      tables.foreach { t =>
        val pth = new Path(s"$dir/$t")
        if (fs.exists(pth)) fs.delete(pth, true)
      }
      fs.listStatus(root).toSeq
        .filter(_.getPath.getName.startsWith(".tmp_MODEL_"))
        .foreach(st => fs.delete(st.getPath, false))
    }
  }

  /** Publish `lines` as `dir/_MODEL` — temp write, refuse-existing
    * pre-check, rename, then a READ-BACK VERIFY against a per-publish
    * nonce: a local filesystem's rename REPLACES an existing destination
    * silently (POSIX), so the exists pre-check alone is a TOCTOU window
    * — the nonce read-back makes a lost same-dir publish race loud on
    * every filesystem (the [[PairStore]] commit shape, single
    * version). */
  private def commitManifest(
      spark: SparkSession, dir: String, lines: Seq[String]): Unit = {
    val fs = fsOf(spark, dir)
    val dst = new Path(s"$dir/_MODEL")
    if (fs.exists(dst))
      throw new java.util.ConcurrentModificationException(
        s"ModelStore: $dst already exists — published models are " +
          "immutable; publish to a fresh path or delete the dir first")
    val nonce = java.util.concurrent.ThreadLocalRandom.current()
      .nextLong(1L, Long.MaxValue)
    val tmp = new Path(s"$dir/.tmp_MODEL_$nonce")
    val out = fs.create(tmp, true)
    try out.write(((lines :+ s"nonce $nonce").mkString("\n") + "\n")
      .getBytes("UTF-8"))
    finally out.close()
    if (fs.exists(dst)) { fs.delete(tmp, false)
      throw new java.util.ConcurrentModificationException(
        s"ModelStore: $dst published concurrently — this publish loses") }
    if (!fs.rename(tmp, dst)) { fs.delete(tmp, false)
      throw new java.util.ConcurrentModificationException(
        s"ModelStore: rename to $dst failed (concurrent publish?) — " +
          "never overwriting a committed model") }
    val back = readRawManifest(spark, dir)
    if (!back.get("nonce").contains(nonce.toString))
      throw new java.util.ConcurrentModificationException(
        s"ModelStore: published $dst content is not ours — lost a " +
          "same-dir publish race; the other publisher's model stands")
  }

  /** [[readManifest]] without the kind check — the commit read-back. */
  private def readRawManifest(
      spark: SparkSession, dir: String): Map[String, String] = {
    val fs = fsOf(spark, dir)
    val in = fs.open(new Path(s"$dir/_MODEL"))
    val lines =
      try new String(org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8")
        .split("\n").toSeq.map(_.trim).filter(_.nonEmpty)
      finally in.close()
    lines.flatMap { l =>
      val i = l.indexOf(' ')
      if (i > 0) Some(l.substring(0, i) -> l.substring(i + 1)) else None
    }.toMap
  }

  /** Parse `dir/_MODEL`, verifying the `kind` line — a missing manifest
    * is an unpublished (crashed or foreign) dir and fails loudly. */
  private def readManifest(
      spark: SparkSession, dir: String, kind: String): Map[String, String] = {
    val fs = fsOf(spark, dir)
    val p = new Path(s"$dir/_MODEL")
    if (!fs.exists(p))
      throw new IllegalStateException(
        s"ModelStore: $dir has no _MODEL manifest — not a committed " +
          "model dir (crashed publish leftovers are safe to delete)")
    val in = fs.open(p)
    val lines =
      try new String(org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8")
        .split("\n").toSeq.map(_.trim).filter(_.nonEmpty)
      finally in.close()
    val kv = lines.map { l =>
      val i = l.indexOf(' ')
      require(i > 0, s"ModelStore: malformed manifest line '$l' in $p")
      l.substring(0, i) -> l.substring(i + 1)
    }.toMap
    require(kv.get("kind").contains(kind),
      s"ModelStore: $dir holds kind '${kv.getOrElse("kind", "?")}', " +
        s"expected '$kind'")
    kv
  }

  // Doubles round-trip exactly through java.lang.Double.toString/parse —
  // the manifest never loses precision on discount/prior scalars.
  private def d2s(d: Double): String = java.lang.Double.toString(d)

  /** Publish an interpolated Kneser-Ney bigram LM
    * ([[LangModel.trainKn]]). */
  def saveKn(lm: LangModel.KnLm, dir: String): Unit = {
    val spark = lm.counts.sparkSession
    prepareDir(spark, dir, Seq("counts", "contexts", "cont"))
    lm.counts.write.mode("errorifexists").parquet(s"$dir/counts")
    lm.contexts.write.mode("errorifexists").parquet(s"$dir/contexts")
    lm.cont.write.mode("errorifexists").parquet(s"$dir/cont")
    commitManifest(spark, dir, Seq(
      "kind kn_bigram",
      s"types ${lm.bigramTypes}",
      s"vocab ${lm.vocab}",
      s"discount ${d2s(lm.discount)}"))
  }

  /** Load a published KN model; [[LangModel.scoreWithKn]] on the result
    * equals scoring under the in-JVM original ([[ModelStoreSpec]] pins
    * it; the `kn_perplexity_served` oracle pins it cross-engine). */
  def loadKn(spark: SparkSession, dir: String): LangModel.KnLm = {
    val m = readManifest(spark, dir, "kn_bigram")
    LangModel.KnLm(
      spark.read.parquet(s"$dir/counts"),
      spark.read.parquet(s"$dir/contexts"),
      spark.read.parquet(s"$dir/cont"),
      m("types").toLong, m("vocab").toLong, m("discount").toDouble)
  }

  /** Publish an add-one bigram LM ([[LangModel.train]]). */
  def saveBigram(lm: LangModel.BigramLm, dir: String): Unit = {
    val spark = lm.counts.sparkSession
    prepareDir(spark, dir, Seq("counts", "contexts"))
    lm.counts.write.mode("errorifexists").parquet(s"$dir/counts")
    lm.contexts.write.mode("errorifexists").parquet(s"$dir/contexts")
    commitManifest(spark, dir, Seq(
      "kind addone_bigram",
      s"vocab ${lm.vocab}"))
  }

  def loadBigram(spark: SparkSession, dir: String): LangModel.BigramLm = {
    val m = readManifest(spark, dir, "addone_bigram")
    LangModel.BigramLm(
      spark.read.parquet(s"$dir/counts"),
      spark.read.parquet(s"$dir/contexts"),
      m("vocab").toLong)
  }

  /** Publish an NB quality classifier ([[QualityClassifier.train]]). */
  def saveNb(m: QualityClassifier.NbModel, dir: String): Unit = {
    val spark = m.tokenCounts.sparkSession
    prepareDir(spark, dir, Seq("token_counts"))
    m.tokenCounts.write.mode("errorifexists").parquet(s"$dir/token_counts")
    commitManifest(spark, dir, Seq(
      "kind nb_quality",
      s"n_pos ${m.nPos}",
      s"n_neg ${m.nNeg}",
      s"vocab ${m.vocab}",
      s"prior_log_odds ${d2s(m.priorLogOdds)}"))
  }

  def loadNb(spark: SparkSession, dir: String): QualityClassifier.NbModel = {
    val m = readManifest(spark, dir, "nb_quality")
    QualityClassifier.NbModel(
      spark.read.parquet(s"$dir/token_counts"),
      m("n_pos").toLong, m("n_neg").toLong, m("vocab").toLong,
      m("prior_log_odds").toDouble)
  }

  /** Publish a DSIR importance model ([[Dsir.train]]) — the 256-row
    * log-ratio table. */
  def saveDsir(m: Dsir.DsirModel, dir: String): Unit = {
    prepareDir(m.bucketLogRatio.sparkSession, dir, Seq("log_ratio"))
    m.bucketLogRatio.write.mode("errorifexists").parquet(s"$dir/log_ratio")
    commitManifest(m.bucketLogRatio.sparkSession, dir, Seq("kind dsir"))
  }

  def loadDsir(spark: SparkSession, dir: String): Dsir.DsirModel = {
    readManifest(spark, dir, "dsir")
    Dsir.DsirModel(spark.read.parquet(s"$dir/log_ratio"))
  }

  /** Publish a BPE merge table ([[graft.plans.BpeTrain]] output) as
    * (rank, left, right) parquet — rank is the merge order, the only
    * state encode/decode need. */
  def saveBpeMerges(
      spark: SparkSession, merges: Seq[(String, String)], dir: String): Unit = {
    import spark.implicits._
    prepareDir(spark, dir, Seq("merges"))
    merges.zipWithIndex.map { case ((a, b), r) => (r, a, b) }
      .toDF("rank", "left", "right")
      .coalesce(1).write.mode("errorifexists").parquet(s"$dir/merges")
    commitManifest(spark, dir, Seq("kind bpe_merges", s"n ${merges.size}"))
  }

  def loadBpeMerges(spark: SparkSession, dir: String): Seq[(String, String)] = {
    val m = readManifest(spark, dir, "bpe_merges")
    val rows = spark.read.parquet(s"$dir/merges")
      .orderBy(col("rank"))
      .select(col("left"), col("right"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    require(rows.size == m("n").toInt,
      s"ModelStore: $dir merges table has ${rows.size} rows, manifest says ${m("n")}")
    rows
  }

  /** Publish a unigram-LM piece table ([[graft.plans.Unigram]] trainer
    * output) as (ord, piece, prob) parquet — the trainer's sequence
    * order is preserved exactly (tie-breaks in the encode DP follow
    * it). */
  def saveUnigramPieces(
      spark: SparkSession, pieces: Seq[(String, Double)], dir: String): Unit = {
    import spark.implicits._
    prepareDir(spark, dir, Seq("pieces"))
    pieces.zipWithIndex.map { case ((p, pr), i) => (i, p, pr) }
      .toDF("ord", "piece", "prob")
      .coalesce(1).write.mode("errorifexists").parquet(s"$dir/pieces")
    commitManifest(spark, dir, Seq("kind unigram_pieces", s"n ${pieces.size}"))
  }

  def loadUnigramPieces(
      spark: SparkSession, dir: String): Seq[(String, Double)] = {
    val m = readManifest(spark, dir, "unigram_pieces")
    val rows = spark.read.parquet(s"$dir/pieces")
      .orderBy(col("ord"))
      .select(col("piece"), col("prob"))
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    require(rows.size == m("n").toInt,
      s"ModelStore: $dir pieces table has ${rows.size} rows, manifest says ${m("n")}")
    rows
  }
}
