package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Contrastive training-pair mining over a labeled embedding corpus —
  * the data-side half of metric / retrieval / embedding training
  * (DPR-style retriever negatives, FaceNet triplet mining): for each
  * anchor vector, the corpus neighbors that make the most informative
  * positives (nearest SAME-label) and negatives (nearest DIFFERENT-
  * label), plus full semi-hard triplets (Schroff et al. 2015 §3.2:
  * the hardest negative still FARTHER than the anchor's hardest
  * positive — hard enough to carry gradient, not so hard it collapses
  * training).
  *
  * The reference has no vector surface at all; this is LLM-pipeline
  * tier beside [[Similarity]].
  *
  * Scale shape: anchors are a bounded per-batch slate (the ANN probe
  * contract — contrastive miners work batch-by-batch), broadcast
  * against the corpus scan; scoring is the same fused cosine kernel as
  * [[Similarity.bruteForceTopK]], and ranking windows partition by
  * (anchor, kind) — never a global window. At selective labels or big
  * corpora the same composition runs against [[IvfIndex]] probes; the
  * exact form here is the oracle-checkable baseline, like `sim_topk`
  * for ANN.
  */
object Contrastive {

  /** (qid, nid, kind, sim) for every anchor×corpus pair: kind is
    * 'pos' (labels match) or 'neg'. Self-pairs excluded. */
  private def scored(
      corpus: DataFrame, anchors: DataFrame,
      idCol: String, vecCol: String, labelCol: String): DataFrame = {
    def asDouble(c: Column) = transform(c, x => x.cast("double"))
    val q = anchors.select(
      col(idCol).as("qid"), asDouble(col(vecCol)).as("qv"),
      col(labelCol).as("_qlab"))
    val c = NearDup.fanOut(corpus).select(
      col(idCol).as("nid"), asDouble(col(vecCol)).as("nv"),
      col(labelCol).as("_nlab"))
    c.join(broadcast(q), col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"),
        when(col("_nlab") === col("_qlab"), lit("pos"))
          .otherwise(lit("neg")).as("kind"),
        Similarity.cosine(col("qv"), col("nv")).as("sim"))
  }

  /** Top-`k` hardest positives AND negatives per anchor:
    * (qid, kind, nid, sim) — "hardest" = highest cosine within the
    * kind, nid tie-break. The per-anchor candidate pool a pair-loss
    * (InfoNCE, contrastive) trainer samples from. */
  def hardPairs(
      corpus: DataFrame, anchors: DataFrame,
      idCol: String, vecCol: String, labelCol: String,
      k: Int): DataFrame = {
    val w = Window.partitionBy(col("qid"), col("kind"))
      .orderBy(col("sim").desc, col("nid"))
    scored(corpus, anchors, idCol, vecCol, labelCol)
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= k)
      .select(col("qid"), col("kind"), col("nid"), round(col("sim"), 6).as("sim"))
      .orderBy(col("qid"), col("kind"), col("nid"))
  }

  /** [[hardPairs]] served from a persisted [[IvfIndex]] — the scale
    * path its scaladoc promises: candidates come from the index's
    * probed-cell top-`candidates` (partition-pruned scan, never the
    * full corpus at partial probe), labels join back, and the per-kind
    * top-`k` ranks over that pool. At `nProbe = nCells` with
    * `candidates` ≥ corpus the pool is every corpus vector, so the
    * result is EXACTLY the brute-force miner ranked by the index's
    * 6-rounded similarity (the `contrastive_pairs_ivf_full` oracle);
    * at partial probe it trades recall for the pruned scan, measured
    * by the `contrastive_pairs_ivf_recall` gate. The blind spot of the
    * composition is inherent: a same-label positive OUTSIDE the probed
    * cells can't be mined — rare-label positives want a higher
    * `candidates`/`nProbe` or a per-label index.
    *
    * Join shape: the candidate table is anchors×candidates (bounded by
    * the slate contract); the corpus label projection streams against
    * it on the id key (AQE broadcasts the bounded side), and the
    * anchor-label join is an explicit slate-sized broadcast. */
  def hardPairsIvf(
      index: IvfIndex, corpus: DataFrame, anchors: DataFrame,
      idCol: String, vecCol: String, labelCol: String,
      k: Int, nProbe: Int, candidates: Int): DataFrame = {
    val cand = index.topK(anchors, idCol, vecCol, k = candidates, nProbe)
    val lab = corpus.select(col(idCol).as("nid"), col(labelCol).as("_nlab"))
    val alab = anchors.select(col(idCol).as("qid"), col(labelCol).as("_qlab"))
    val w = Window.partitionBy(col("qid"), col("kind"))
      .orderBy(col("sim").desc, col("nid"))
    cand
      .join(lab, "nid")
      .join(broadcast(alab), "qid")
      .select(col("qid"), col("nid"),
        when(col("_nlab") === col("_qlab"), lit("pos"))
          .otherwise(lit("neg")).as("kind"),
        col("sim"))
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= k)
      .select(col("qid"), col("kind"), col("nid"), col("sim"))
      .orderBy(col("qid"), col("kind"), col("nid"))
  }

  /** One semi-hard triplet per anchor: the hardest positive (highest
    * same-label sim) and the hardest negative STRICTLY farther than it
    * (highest different-label sim with `sim < pos_sim`) — the FaceNet
    * §3.2 selection. Anchors with no positive, or whose every negative
    * is at least as close as the positive, emit no row (no useful
    * semi-hard gradient there). Ranking and the margin comparison use
    * the UNROUNDED similarity (both engines compute the identical IEEE
    * fold); only the emitted columns round. */
  def semiHardTriplets(
      corpus: DataFrame, anchors: DataFrame,
      idCol: String, vecCol: String, labelCol: String): DataFrame = {
    val s = scored(corpus, anchors, idCol, vecCol, labelCol)
    val wPos = Window.partitionBy(col("qid"))
      .orderBy(col("sim").desc, col("nid"))
    val pos = s.filter(col("kind") === "pos")
      .withColumn("_rn", row_number().over(wPos)).filter(col("_rn") === 1)
      .select(col("qid"), col("nid").as("pos_nid"), col("sim").as("_pos_sim"))
    val wNeg = Window.partitionBy(col("qid"))
      .orderBy(col("sim").desc, col("nid"))
    s.filter(col("kind") === "neg")
      .join(pos, Seq("qid"))
      .filter(col("sim") < col("_pos_sim"))
      .withColumn("_rn", row_number().over(wNeg)).filter(col("_rn") === 1)
      .select(col("qid"), col("pos_nid"),
        round(col("_pos_sim"), 6).as("pos_sim"),
        col("nid").as("neg_nid"), round(col("sim"), 6).as("neg_sim"))
      .orderBy(col("qid"))
  }
}
