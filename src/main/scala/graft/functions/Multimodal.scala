package graft.functions

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column handling — EXT tier.
  *
  * Media is an opaque `BinaryType` column plus a typed metadata struct;
  * decode / feature-extract / resize / frame-sample run per-partition so a
  * real implementation amortizes codec initialization across a partition's
  * rows (the Scala analog of PySpark's `mapInPandas` batch shape — in Scala
  * the batch-iterator surface IS `mapPartitions` with an `Encoder`).
  *
  * The container ships no image/audio codecs, so the byte-level decode is a
  * clearly-marked DETERMINISTIC STUB (seeded by content hash). Everything
  * Spark-side — schema, partition-wise batching, UDF signature, output
  * shapes — is real and tested; swapping `stubDecode*` for a JNI codec call
  * changes no plan shape.
  */
object Multimodal {

  /** Canonical media-asset schema: id + bytes + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("media", BinaryType, nullable = false),
    StructField("meta", StructType(Seq(
      StructField("format", StringType, nullable = false),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false)
    )), nullable = false)
  ))

  final case class MediaFeature(asset_id: Long, feature: Array[Float])
  final case class MediaFrames(asset_id: Long, frames: Array[Array[Byte]])

  /** STUB decode: deterministic pseudo-feature from the content bytes.
    * Stands in for "decode image → embed"; same signature a real codec
    * featurizer would have. */
  private[functions] def stubDecodeFeature(bytes: Array[Byte], dim: Int): Array[Float] = {
    val h = java.util.Arrays.hashCode(bytes)
    val rnd = new scala.util.Random(h.toLong)
    Array.fill(dim)(rnd.nextFloat() * 2f - 1f)
  }

  /** STUB frame sampling: every n-th fixed-size chunk of the byte stream
    * stands in for every n-th decoded video frame. */
  private[functions] def stubSampleFrames(
      bytes: Array[Byte], everyN: Int, frameSize: Int): Array[Array[Byte]] =
    bytes.grouped(frameSize).zipWithIndex
      .collect { case (chunk, i) if i % everyN == 0 => chunk }
      .toArray

  /** Partition-wise feature extraction over a media table. Real plumbing:
    * one "codec init" per partition, streamed rows, typed output. */
  def extractFeatures(media: DataFrame, dim: Int = 64): Dataset[MediaFeature] = {
    implicit val enc = Encoders.product[MediaFeature]
    media.select(col("asset_id"), col("media"))
      .mapPartitions { rows =>
        // real impl: val codec = Codec.load()  -- once per partition
        rows.map { r =>
          MediaFeature(r.getLong(0), stubDecodeFeature(r.getAs[Array[Byte]](1), dim))
        }
      }
  }

  /** Partition-wise frame sampling (video → every n-th frame). */
  def sampleFrames(media: DataFrame, everyN: Int = 10, frameSize: Int = 256): Dataset[MediaFrames] = {
    implicit val enc = Encoders.product[MediaFrames]
    media.select(col("asset_id"), col("media"))
      .mapPartitions { rows =>
        rows.map { r =>
          MediaFrames(r.getLong(0),
            stubSampleFrames(r.getAs[Array[Byte]](1), everyN, frameSize))
        }
      }
  }

  /** "Resize": metadata-level transform (the real op rewrites bytes; the
    * stub rewrites the typed metadata and truncates bytes proportionally —
    * enough to exercise schema evolution through the media struct). */
  def resize(media: DataFrame, w: Int, h: Int): DataFrame =
    media.select(
      col("asset_id"),
      expr(s"substring(media, 1, greatest(1, int(length(media) * $w * $h / " +
        "greatest(1, meta.width * meta.height))))").as("media"),
      struct(
        col("meta.format").as("format"),
        lit(w).as("width"),
        lit(h).as("height")).as("meta"))

  /** Deterministic synthetic media table for tests/demos (no real assets in
    * the container). */
  def syntheticMedia(spark: SparkSession, n: Int, bytesPerAsset: Int = 4096): DataFrame = {
    val rows = (0L until n.toLong).map { i =>
      val rnd = new scala.util.Random(i)
      val bytes = Array.fill(bytesPerAsset)(rnd.nextInt().toByte)
      Row(i, bytes, Row("png", 32 + (i % 64).toInt, 32 + (i % 48).toInt))
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, math.max(1, n / 100)), mediaSchema)
  }
}
