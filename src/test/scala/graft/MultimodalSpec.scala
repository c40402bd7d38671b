package graft

import org.apache.spark.sql.functions._
import graft.functions.Multimodal

/** Multimodal plumbing: schema, partition-wise batch shape, stub decode
  * determinism. The byte-level decode is a documented stub; these tests
  * pin down everything a real codec would plug into. */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val media = Multimodal.syntheticMedia(spark, 40).cache()

  test("synthetic media conforms to the canonical schema") {
    assert(media.schema == Multimodal.mediaSchema)
    assert(media.count() == 40)
  }

  test("feature extraction: typed output, stable across recomputation") {
    val f1 = Multimodal.extractFeatures(media, dim = 16)
    assert(f1.head().feature.length == 16)
    // deterministic stub: same input -> same features on a second run
    val a = f1.collect().map(m => m.asset_id -> m.feature.toSeq).toMap
    val b = Multimodal.extractFeatures(media, dim = 16)
      .collect().map(m => m.asset_id -> m.feature.toSeq).toMap
    assert(a == b)
  }

  test("feature extraction composes with Similarity search") {
    val feats = Multimodal.extractFeatures(media, dim = 16)
      .toDF("vec_id", "embedding")
    val topk = graft.functions.Similarity.bruteForceTopK(
      feats, feats.filter(col("vec_id") < 3), "vec_id", "embedding", 2)
    assert(topk.count() == 6) // 3 queries x top-2
  }

  test("frame sampling: every n-th chunk, typed binary frames") {
    val frames = Multimodal.sampleFrames(media, everyN = 4, frameSize = 256)
    val f = frames.head()
    assert(f.frames.length == 4)   // 4096 bytes / 256 = 16 chunks, every 4th
    assert(f.frames.head.length == 256)
  }

  test("resize rewrites metadata struct and truncates media") {
    val resized = Multimodal.resize(media, 16, 16)
    assert(resized.schema == Multimodal.mediaSchema)
    val r = resized.select(col("meta.width"), col("meta.height"),
      length(col("media"))).collect().head
    assert(r.getInt(0) == 16 && r.getInt(1) == 16)
    assert(r.getInt(2) <= 4096)
  }
}
