package graft.functions

import java.math.RoundingMode

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Unigram-LM (SentencePiece-style) tokenizer TRAINING (Kudo 2018,
  * arXiv:1804.10959) — the companion to [[BpeTrain]]: where BPE grows a
  * vocabulary bottom-up by merging, the unigram model starts from an
  * over-complete substring seed and EM-fits piece probabilities, keeping
  * the pieces the corpus actually uses. Encode kernel:
  * [[graft.plans.Unigram]].
  *
  * This is the Viterbi-EM (hard-EM) variant with a FIXED iteration
  * count, chosen so the whole procedure is a deterministic pure function
  * of the corpus — replayable as an unrolled DuckDB oracle — rather than
  * a convergence loop with float-sensitive stopping:
  *
  *  1. ONE corpus pass builds the word-frequency table; its top
  *     `maxWords` head (count desc, word asc — the [[Text.bpeMerges]]
  *     capped-head contract, the documented bounded-collect class)
  *     comes to the driver. On zipfian corpora the head carries almost
  *     all token mass, and training never touches the corpus again.
  *  2. SEED: every substring of length 1..`maxPieceLen` of every head
  *     word, weighted by word frequency × occurrence count (all
  *     positions, overlapping). All single characters are kept (alphabet
  *     closure); multi-char candidates keep the top `seedMultis` by
  *     (count desc, piece asc). Initial probabilities: round-6 of
  *     count / total over the selected seed.
  *  3. `emIters` rounds of hard EM: E-step Viterbi-segments each head
  *     word under current probabilities ([[graft.plans.Unigram.viterbi]]
  *     — the exact kernel the tokenizer ships, including its tie-break
  *     contract); piece counts are segmentation occurrences weighted by
  *     word frequency. M-step: probabilities re-normalize to round-6 of
  *     count / total; pieces with zero count DROP (they were never the
  *     best explanation of anything — single chars included, which is
  *     safe because a char every best segmentation covers with larger
  *     pieces is a char no head word needs bare).
  *  4. The final table prunes to the top `vocabSize` pieces by
  *     (count desc, piece asc).
  *
  * Driver state is seed + EM tables over the CAPPED head — bounded by
  * `maxWords · maxLen(word) · maxPieceLen` candidates regardless of
  * corpus size; the one distributed stage is the word count (vocab-sized
  * shuffle, map-side combined). Probabilities round to 6 decimals at
  * every step (the cross-engine determinism convention: both engines
  * then multiply identical doubles in identical order inside Viterbi).
  *
  * @return one row per kept piece — `(piece, n_count, prob)`, ordered by
  *         piece; `n_count` is the final E-step's weighted occurrence
  *         count, `prob` its round-6 share of the final total. Feeds
  *         [[graft.plans.Unigram]] / [[Text.unigramEncode]] directly.
  */
object UnigramTrain {

  private def round6(x: Double): Double =
    java.math.BigDecimal.valueOf(x).setScale(6, RoundingMode.HALF_UP)
      .doubleValue()

  /** Driver-side Viterbi via the shipping kernel's table (probs must
    * already be round-6). */
  private def segment(word: String, probs: Map[String, Double]): Array[String] =
    graft.plans.Unigram.viterbi(word,
      new graft.plans.Unigram.Table(probs.toSeq.sortBy(_._1)))

  def learnedPieces(
      docs: DataFrame,
      textCol: Column,
      vocabSize: Int,
      maxPieceLen: Int = 4,
      emIters: Int = 2,
      maxWords: Int = 512,
      seedMultis: Int = 64): DataFrame = {
    require(vocabSize > 0, s"vocabSize must be positive, got $vocabSize")
    require(maxPieceLen >= 1, s"maxPieceLen must be >= 1, got $maxPieceLen")
    require(emIters >= 1, s"emIters must be >= 1, got $emIters")
    require(maxWords > 0, s"maxWords must be positive, got $maxWords")
    require(seedMultis >= 0, s"seedMultis must be >= 0, got $seedMultis")
    val spark = docs.sparkSession

    // 1. capped word-frequency head (the only corpus pass)
    val head: Seq[(String, Long)] = docs
      .select(explode(split(textCol, " ")).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("w"))
      .limit(maxWords)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq

    // 2. seed: substring counts, alphabet-closed, multi head capped
    val seedCounts = scala.collection.mutable.LinkedHashMap.empty[String, Long]
    for ((w, f) <- head; i <- 0 until w.length;
         l <- 1 to math.min(maxPieceLen, w.length - i)) {
      val p = w.substring(i, i + l)
      seedCounts(p) = seedCounts.getOrElse(p, 0L) + f
    }
    val chars = seedCounts.filter(_._1.length == 1)
    val multis = seedCounts.filter(_._1.length > 1).toSeq
      .sortBy { case (p, c) => (-c, p) }.take(seedMultis)
    var counts: Map[String, Long] = (chars ++ multis).toMap
    var probs: Map[String, Double] = {
      val total = counts.values.sum
      counts.map { case (p, c) => p -> round6(c.toDouble / total) }
    }

    // 3. fixed-iteration hard EM over the head
    for (_ <- 1 to emIters) {
      val c = scala.collection.mutable.HashMap.empty[String, Long]
      for ((w, f) <- head; piece <- segment(w, probs))
        c(piece) = c.getOrElse(piece, 0L) + f
      counts = c.toMap // zero-count pieces drop here
      val total = counts.values.sum
      probs = counts.map { case (p, cc) => p -> round6(cc.toDouble / total) }
    }

    // 4. prune to vocabSize; emit with round-6 share of the FINAL total
    val kept = counts.toSeq.sortBy { case (p, c) => (-c, p) }.take(vocabSize)
    val total = counts.values.sum
    val rows = kept.sortBy(_._1).map { case (p, c) => Row(p, c) }
    spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1),
        StructType(Seq(
          StructField("piece", StringType, nullable = false),
          StructField("n_count", LongType, nullable = false))))
      .select(col("piece"), col("n_count"),
        round(col("n_count").cast("double") / lit(total.toDouble), 6).as("prob"))
      .orderBy(col("piece"))
  }

  /** The trained model as the encode kernel's (piece, prob) pairs —
    * the collect is vocab-sized by construction. */
  def pieceTable(model: DataFrame): Seq[(String, Double)] =
    model.select(col("piece"), col("prob")).collect()
      .map(r => (r.getString(0), r.getDouble(1))).toSeq.sortBy(_._1)
}
