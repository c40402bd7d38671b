package graft.functions

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column handling — EXT tier.
  *
  * Media is an opaque `BinaryType` column plus a typed metadata struct;
  * decode / feature-extract / resize / frame-sample run per-partition so
  * codec initialization amortizes across a partition's rows (the Scala
  * analog of PySpark's `mapInPandas` batch shape — in Scala the
  * batch-iterator surface IS `mapPartitions` with an `Encoder`).
  *
  * IMAGE decode is REAL: the JDK ships a PNG codec (`javax.imageio`), so
  * `syntheticMedia` emits genuine PNG bytes and `decodeInfo` /
  * `extractFeatures` / `resize` decode them pixel-for-pixel. AUDIO decode
  * is REAL (`javax.sound.sampled`). VIDEO rides the documented GVID
  * container — a real structural demux of real PNG frames (see
  * [[demuxFrames]]); only the commercial codec layer (H.264/VP9) is out
  * of scope, since the container ships no such codec. The legacy
  * byte-chunk sampler ([[stubSampleFrames]]) remains for opaque formats.
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
  final case class MediaInfo(asset_id: Long, width: Int, height: Int, decoded: Boolean)

  /** Real image decode: PNG/JPEG/BMP bytes → BufferedImage via the JDK
    * codec; None when the bytes aren't a decodable image. */
  private[functions] def readImage(bytes: Array[Byte]): Option[BufferedImage] =
    try Option(ImageIO.read(new ByteArrayInputStream(bytes)))
    catch { case _: java.io.IOException => None }

  private[functions] def encodePng(img: BufferedImage): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Real image feature: L1-normalized luminance histogram with `dim`
    * bins — deterministic, pixel-exact, codec-backed. */
  private[functions] def imageFeature(img: BufferedImage, dim: Int): Array[Float] = {
    val hist = new Array[Float](dim)
    var y = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) {
        val rgb = img.getRGB(x, y)
        val lum = (((rgb >> 16) & 0xFF) * 299 + ((rgb >> 8) & 0xFF) * 587 +
          (rgb & 0xFF) * 114) / 1000
        hist((lum * dim) / 256) += 1f
        x += 1
      }
      y += 1
    }
    val n = (img.getWidth.toLong * img.getHeight).toFloat
    var i = 0
    while (i < dim) { hist(i) /= n; i += 1 }
    hist
  }

  /** STUB fallback feature for undecodable bytes: deterministic
    * pseudo-feature seeded by the content hash (same signature the codec
    * featurizer has, so mixed-media tables degrade gracefully). */
  private[functions] def stubDecodeFeature(bytes: Array[Byte], dim: Int): Array[Float] = {
    val h = java.util.Arrays.hashCode(bytes)
    val rnd = new scala.util.Random(h.toLong)
    Array.fill(dim)(rnd.nextFloat() * 2f - 1f)
  }

  /** STUB frame sampling: every n-th fixed-size chunk of the byte stream
    * stands in for every n-th decoded video frame (no video codec in the
    * JDK; the per-partition batch shape is the real one). */
  private[functions] def stubSampleFrames(
      bytes: Array[Byte], everyN: Int, frameSize: Int): Array[Array[Byte]] =
    bytes.grouped(frameSize).zipWithIndex
      .collect { case (chunk, i) if i % everyN == 0 => chunk }
      .toArray

  /** REAL decode pass: actual pixel dimensions from the image codec.
    * `decoded=false` (with -1 dims) marks undecodable rows — at scale you
    * route those to a quarantine sink instead of failing the job. */
  def decodeInfo(media: DataFrame): Dataset[MediaInfo] = {
    implicit val enc = Encoders.product[MediaInfo]
    media.select(col("asset_id"), col("media"))
      .mapPartitions { rows =>
        rows.map { r =>
          readImage(r.getAs[Array[Byte]](1)) match {
            case Some(img) => MediaInfo(r.getLong(0), img.getWidth, img.getHeight, decoded = true)
            case None => MediaInfo(r.getLong(0), -1, -1, decoded = false)
          }
        }
      }
  }

  /** Partition-wise feature extraction: REAL luminance-histogram features
    * for decodable images, stub fallback otherwise. */
  def extractFeatures(media: DataFrame, dim: Int = 64): Dataset[MediaFeature] = {
    implicit val enc = Encoders.product[MediaFeature]
    media.select(col("asset_id"), col("media"))
      .mapPartitions { rows =>
        rows.map { r =>
          val bytes = r.getAs[Array[Byte]](1)
          val feat = readImage(bytes) match {
            case Some(img) => imageFeature(img, dim)
            case None => stubDecodeFeature(bytes, dim)
          }
          MediaFeature(r.getLong(0), feat)
        }
      }
  }

  /** Partition-wise frame sampling (video → every n-th frame; stub codec). */
  def sampleFrames(media: DataFrame, everyN: Int = 10, frameSize: Int = 256): Dataset[MediaFrames] = {
    require(everyN >= 1, s"everyN must be >= 1, got $everyN")
    require(frameSize >= 1, s"frameSize must be >= 1, got $frameSize")
    implicit val enc = Encoders.product[MediaFrames]
    media.select(col("asset_id"), col("media"))
      .mapPartitions { rows =>
        rows.map { r =>
          MediaFrames(r.getLong(0),
            stubSampleFrames(r.getAs[Array[Byte]](1), everyN, frameSize))
        }
      }
  }

  /** REAL resize: decode → bilinear rescale to w×h → re-encode PNG, with
    * the metadata struct rewritten to match. Runs per-partition (codec
    * state amortized). Undecodable rows pass through untouched — bytes
    * AND metadata (target dims on an unresized payload would be
    * self-contradictory). Output conforms to [[mediaSchema]]. */
  def resize(media: DataFrame, w: Int, h: Int): DataFrame = {
    implicit val enc = Encoders.row(mediaSchema)
    media.select(col("asset_id"), col("media"), col("meta"))
      .mapPartitions { rows =>
        rows.map { r =>
          val bytes = r.getAs[Array[Byte]](1)
          val meta = r.getStruct(2)
          val (outBytes, outMeta) = readImage(bytes) match {
            case Some(img) =>
              val scaled = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
              val g = scaled.createGraphics()
              g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
                java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
              g.drawImage(img, 0, 0, w, h, null)
              g.dispose()
              (encodePng(scaled), Row("png", w, h))
            // undecodable: bytes pass through UNCHANGED, so the meta must
            // too — target dims on an unresized payload would be
            // self-contradictory metadata
            case None => (bytes, meta)
          }
          Row(r.getLong(0), outBytes, outMeta)
        }
      }.toDF("asset_id", "media", "meta")
  }

  // ------------------------------------------------------------- audio

  /** Canonical audio-asset schema: id + bytes + typed audio metadata. */
  val audioSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("media", BinaryType, nullable = false),
    StructField("meta", StructType(Seq(
      StructField("format", StringType, nullable = false),
      StructField("sample_rate", IntegerType, nullable = false),
      StructField("channels", IntegerType, nullable = false)
    )), nullable = false)
  ))

  final case class AudioInfo(
      asset_id: Long, sample_rate: Int, channels: Int, n_frames: Long,
      duration_s: Double, rms: Double, decoded: Boolean)

  /** REAL audio decode: WAV/AIFF bytes → (format, PCM payload) via the JDK
    * codec (`javax.sound.sampled`); None for undecodable bytes. The payload
    * is normalized to 16-bit signed LITTLE-ENDIAN PCM regardless of the
    * container's native layout (8-bit WAV, big-endian AIFF, float WAV) —
    * the RMS pass downstream assumes exactly that layout, so decoding
    * without converting would silently yield wrong amplitudes. */
  private[functions] def readAudio(
      bytes: Array[Byte]): Option[(javax.sound.sampled.AudioFormat, Array[Byte])] =
    try {
      import javax.sound.sampled.{AudioFormat, AudioSystem}
      val raw = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
      val f0 = raw.getFormat
      val canonical =
        f0.getEncoding == AudioFormat.Encoding.PCM_SIGNED &&
          f0.getSampleSizeInBits == 16 && !f0.isBigEndian
      val in =
        if (canonical) raw
        else AudioSystem.getAudioInputStream(
          new AudioFormat(AudioFormat.Encoding.PCM_SIGNED, f0.getSampleRate,
            16, f0.getChannels, f0.getChannels * 2, f0.getSampleRate,
            /* bigEndian = */ false), raw)
      val pcm = in.readAllBytes()
      Some((in.getFormat, pcm))
    } catch {
      case _: javax.sound.sampled.UnsupportedAudioFileException => None
      case _: java.io.IOException => None
      case _: IllegalArgumentException => None // no conversion path to 16-bit LE
    }

  /** Partition-wise REAL audio feature pass: sample rate / channels /
    * frame count / duration / RMS amplitude decoded from the actual PCM
    * samples ([[readAudio]] normalizes every decodable container to 16-bit
    * signed little-endian first). Undecodable rows get decoded=false. */
  def decodeAudioInfo(audio: DataFrame): Dataset[AudioInfo] = {
    implicit val enc = Encoders.product[AudioInfo]
    audio.select(col("asset_id"), col("media"))
      .mapPartitions { rows =>
        rows.map { r =>
          readAudio(r.getAs[Array[Byte]](1)) match {
            case Some((fmt, pcm)) =>
              val frameSize = fmt.getFrameSize
              val nFrames = pcm.length.toLong / frameSize
              var sumSq = 0.0
              var i = 0
              while (i + 1 < pcm.length) { // 16-bit LE samples
                val s = ((pcm(i + 1) << 8) | (pcm(i) & 0xFF)).toShort / 32768.0
                sumSq += s * s
                i += 2
              }
              val nSamples = pcm.length / 2
              AudioInfo(r.getLong(0), fmt.getSampleRate.toInt, fmt.getChannels,
                nFrames, nFrames / fmt.getSampleRate.toDouble,
                if (nSamples == 0) 0.0 else math.sqrt(sumSq / nSamples),
                decoded = true)
            case None =>
              AudioInfo(r.getLong(0), -1, -1, -1L, -1.0, -1.0, decoded = false)
          }
        }
      }
  }

  /** Renders one WAV asset — called on EXECUTORS by [[syntheticAudio]]. */
  private def renderAudioRow(i: Long, seconds: Double, sampleRate: Int): Row = {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    val freq = 220.0 + 20.0 * (i % 16)
    val nFrames = (seconds * sampleRate).toInt
    val pcm = new Array[Byte](nFrames * 2)
    var f = 0
    while (f < nFrames) {
      val s = (0.5 * math.sin(2 * math.Pi * freq * f / sampleRate) * 32767).toShort
      pcm(2 * f) = (s & 0xFF).toByte
      pcm(2 * f + 1) = ((s >> 8) & 0xFF).toByte
      f += 1
    }
    val fmt = new AudioFormat(sampleRate.toFloat, 16, 1, true, false)
    val out = new ByteArrayOutputStream()
    AudioSystem.write(
      new AudioInputStream(new ByteArrayInputStream(pcm), fmt, nFrames.toLong),
      AudioFileFormat.Type.WAVE, out)
    Row(i, out.toByteArray, Row("wav", sampleRate, 1))
  }

  /** Deterministic synthetic audio table: REAL WAV bytes (16-bit signed
    * mono PCM sine wave, frequency varying per asset). Rendered
    * EXECUTOR-side (`spark.range` → per-partition codec work) — the corpus
    * generation pattern that holds at 100 TB; the driver touches no PCM. */
  def syntheticAudio(
      spark: SparkSession, n: Int,
      seconds: Double = 0.1, sampleRate: Int = 8000): DataFrame =
    spark.createDataFrame(
      spark.range(0, n.toLong, 1, math.max(1, n / 100)).rdd
        .map(i => renderAudioRow(i, seconds, sampleRate)),
      audioSchema)

  // --------------------------------------- audio perceptual fingerprint

  /** Probe frequencies (Hz) of the audio fingerprint — ABSOLUTE
    * frequencies, not fractions of Nyquist, so a resampled copy of a
    * recording probes the same spectral bands (all sit below the 4 kHz
    * Nyquist of the lowest common speech rate, 8 kHz). Geometric-ish
    * spacing like a chromaprint filterbank. */
  private val FpFreqs: Array[Double] =
    Array(250.0, 375.0, 520.0, 700.0, 920.0, 1200.0, 1550.0, 1950.0)

  /** 64-bit perceptual audio fingerprint — the audio analog of
    * [[aHash64]], chromaprint's band-energy-delta shape: the signal is
    * mono-mixed, split into 9 equal-DURATION windows, each window's
    * power at the 8 [[FpFreqs]] probe frequencies measured by the
    * Goertzel recurrence (normalized by window length²), and bit
    * (t, f) set when band f's power RISES from window t to t+1 — 8
    * transitions × 8 bands = 64 bits of spectral-envelope shape.
    *
    * Invariances, mirroring aHash's exact-brightness-shift argument:
    * a GAIN shift scales every power by g² and cancels in every
    * comparison (exactly so for power-of-two gains — binary floats
    * scale exactly); RESAMPLING preserves the windows (fractions of
    * total duration) and the probed bands (absolute Hz), so powers stay
    * proportional up to interpolation error and the delta bits are
    * stable wherever adjacent windows differ decisively. Unrelated
    * recordings land ~32 bits apart. */
  private[functions] def audioFp64(
      pcm: Array[Byte], channels: Int, sampleRate: Float): Long = {
    val frameSize = channels * 2
    val nFrames = if (frameSize > 0) pcm.length / frameSize else 0
    if (nFrames == 0) return 0L
    val x = new Array[Double](nFrames)
    var fr = 0
    while (fr < nFrames) {
      var s = 0.0
      var c = 0
      while (c < channels) {
        val o = fr * frameSize + c * 2
        s += ((pcm(o + 1) << 8) | (pcm(o) & 0xFF)).toShort / 32768.0
        c += 1
      }
      x(fr) = s / channels
      fr += 1
    }
    val nT = 9
    val p = Array.ofDim[Double](nT, FpFreqs.length)
    var t = 0
    while (t < nT) {
      val lo = (t.toLong * nFrames / nT).toInt
      val hi = ((t + 1).toLong * nFrames / nT).toInt
      val n = hi - lo
      var k = 0
      while (k < FpFreqs.length) {
        val coeff = 2.0 * math.cos(2.0 * math.Pi * FpFreqs(k) / sampleRate)
        var s1 = 0.0
        var s2 = 0.0
        var i = lo
        while (i < hi) {
          val s0 = x(i) + coeff * s1 - s2
          s2 = s1; s1 = s0
          i += 1
        }
        p(t)(k) =
          if (n > 0) (s1 * s1 + s2 * s2 - coeff * s1 * s2) / (n.toDouble * n)
          else 0.0
        k += 1
      }
      t += 1
    }
    var hash = 0L
    var b = 0
    t = 0
    while (t < nT - 1) {
      var k = 0
      while (k < FpFreqs.length) {
        if (p(t + 1)(k) > p(t)(k)) hash |= (1L << b)
        b += 1; k += 1
      }
      t += 1
    }
    hash
  }

  /** (asset_id, afp) over decodable audio — REAL codec path
    * ([[readAudio]] normalizes any WAV/AIFF layout to 16-bit LE PCM),
    * per-partition amortized like every decode pass. Undecodable rows
    * are absent (quarantine-sink material, [[decodeAudioInfo]]'s
    * decoded=false contract). */
  def audioFingerprintTable(audio: DataFrame): DataFrame = {
    implicit val enc = org.apache.spark.sql.Encoders.product[(Long, Long)]
    audio.select(col("asset_id"), col("media"))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          readAudio(r.getAs[Array[Byte]](1)).map { case (fmt, pcm) =>
            (r.getLong(0),
              audioFp64(pcm, fmt.getChannels, fmt.getSampleRate))
          }
        }
      }
      .toDF("asset_id", "afp")
  }

  /** Perceptual near-dup audio pairs: [[audioFp64]] fingerprints through
    * the shared Hamming banding core ([[NearDup.hammingBandedPairs]]) —
    * exact by pigeonhole for `maxHamming < bands`, and only 16-byte
    * fingerprint rows ever shuffle (the PCM stays at the scan). The
    * audio analog of [[phashPairs]]; completes the family (text SimHash,
    * image aHash, audio band-delta). */
  def audioFingerprintPairs(
      audio: DataFrame, maxHamming: Int = 6, bands: Int = 8): DataFrame =
    NearDup.hammingBandedPairs(
      audioFingerprintTable(audio), "asset_id", "afp", maxHamming, bands)

  /** Renders one band-mix WAV — content twins for the audio-fingerprint
    * gate: asset `i`'s recording is 9 segments, each mixing all 8 probe
    * bands at seeded per-(segment, band) amplitude LEVELS that always
    * CHANGE between adjacent segments (odd stride through 4 power-of-two
    * levels), so every delta bit is decisive (≥2× power steps) and the
    * fingerprint survives gain shift and resampling. EXECUTOR-side like
    * [[renderAudioRow]]. */
  private def renderBandMixRow(
      i: Long, gain: Double, sampleRate: Int, seconds: Double): Row = {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    val nT = 9
    val nFrames = (seconds * sampleRate).toInt
    val pcm = new Array[Byte](nFrames * 2)
    val base = new Array[Long](FpFreqs.length)
    val stride = new Array[Int](FpFreqs.length)
    var k = 0
    while (k < FpFreqs.length) {
      val h = i * 1000003L + k * 7919L
      base(k) = math.floorMod(h, 4L)
      stride(k) = if (math.floorMod(h >> 8, 2L) == 0L) 1 else 3 // odd: level always changes
      k += 1
    }
    var f = 0
    while (f < nFrames) {
      val t = math.min(nT - 1, f * nT / nFrames)
      var s = 0.0
      k = 0
      while (k < FpFreqs.length) {
        val level = ((base(k) + t.toLong * stride(k)) % 4).toInt
        val amp = 0.01 * (1 << level) // 0.01 / 0.02 / 0.04 / 0.08
        s += amp * math.sin(2 * math.Pi * FpFreqs(k) * f / sampleRate)
        k += 1
      }
      // clamp, don't wrap: Double.toShort wraps past ±32767, and the
      // wrap-around harmonics would break the gain-invariance the
      // fingerprint twins rely on once gain * peak exceeds full scale
      val q = math.max(-32768.0, math.min(32767.0, s * gain * 32767)).toInt.toShort
      pcm(2 * f) = (q & 0xFF).toByte
      pcm(2 * f + 1) = ((q >> 8) & 0xFF).toByte
      f += 1
    }
    val fmt = new AudioFormat(sampleRate.toFloat, 16, 1, true, false)
    val out = new ByteArrayOutputStream()
    AudioSystem.write(
      new AudioInputStream(new ByteArrayInputStream(pcm), fmt, nFrames.toLong),
      AudioFileFormat.Type.WAVE, out)
    Row(i, out.toByteArray, Row("wav", sampleRate, 1))
  }

  /** Deterministic band-mix audio table (REAL WAV bytes): asset `i`'s
    * content is [[renderBandMixRow]]'s seeded 9-segment band mix — call
    * with different `gain`/`sampleRate`/`idOffset` to plant gain-shifted
    * and resampled twins of the same content ids. */
  def syntheticBandMixAudio(
      spark: SparkSession, n: Int, gain: Double = 0.5,
      sampleRate: Int = 8000, seconds: Double = 0.45,
      idOffset: Long = 0L): DataFrame =
    spark.createDataFrame(
      spark.range(0, n.toLong, 1, math.max(1, n / 20)).rdd
        .map(i => renderBandMixRow(i, gain, sampleRate, seconds) match {
          case Row(id: Long, media, meta) => Row(id + idOffset, media, meta)
        }),
      audioSchema)

  // ------------------------------------------------------------- video

  /** Canonical video-asset schema: id + container bytes + typed metadata. */
  val videoSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("media", BinaryType, nullable = false),
    StructField("meta", StructType(Seq(
      StructField("format", StringType, nullable = false),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("fps", FloatType, nullable = false),
      StructField("n_frames", IntegerType, nullable = false)
    )), nullable = false)
  ))

  final case class VideoFrame(
      asset_id: Long, frame_idx: Int, ts_s: Double, frame: Array[Byte])
  final case class VideoFeature(asset_id: Long, n_frames_used: Int, feature: Array[Float])

  /** The container ships no real video codec (H.264/VP9 decode would slot
    * in exactly at [[demuxFrames]]'s boundary via ffmpeg/jcodec), so video
    * rides a documented trivial container: ASCII magic "GVID", then
    * big-endian ints nFrames / fps-millis, then per frame an int byte
    * length + a REAL PNG payload. The demux below genuinely parses that
    * structure, and every sampled frame is a real decodable image that
    * flows into [[imageFeature]] — the only fake is the container format
    * itself, not the plumbing. */
  private val VideoMagic = "GVID".getBytes(java.nio.charset.StandardCharsets.US_ASCII)

  private[functions] def muxFrames(pngFrames: Seq[Array[Byte]], fps: Float): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val dos = new java.io.DataOutputStream(out)
    dos.write(VideoMagic)
    dos.writeInt(pngFrames.length)
    dos.writeInt((fps * 1000).round)
    pngFrames.foreach { f => dos.writeInt(f.length); dos.write(f) }
    dos.flush()
    out.toByteArray
  }

  /** Parse the GVID container: (fps, frames). None for non-GVID bytes. */
  private[functions] def demuxFrames(
      bytes: Array[Byte]): Option[(Float, Array[Array[Byte]])] =
    try {
      val in = new java.io.DataInputStream(new ByteArrayInputStream(bytes))
      val magic = new Array[Byte](4)
      in.readFully(magic)
      if (!java.util.Arrays.equals(magic, VideoMagic)) return None
      val n = in.readInt()
      val fpsMillis = in.readInt()
      if (n < 0 || n > 1000000) return None
      // fps <= 0 would make every sampled timestamp Infinity/NaN — an
      // invalid container quarantines like any other undecodable row
      if (fpsMillis <= 0) return None
      val fps = fpsMillis / 1000f
      val frames = Array.fill(n) {
        val len = in.readInt()
        // a corrupt length must quarantine, not allocate: negative would
        // throw NegativeArraySizeException past an IOException-only catch,
        // and a huge positive one would attempt a multi-GB allocation
        if (len < 0 || len > bytes.length)
          throw new java.io.IOException(s"frame length $len out of range")
        val f = new Array[Byte](len)
        in.readFully(f)
        f
      }
      Some((fps, frames))
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Partition-wise frame sampling over the GVID container: every n-th
    * frame, exploded to one typed row per frame with its timestamp. The
    * demux is real (structure-parsing, not chunking); undecodable
    * containers contribute zero rows — quarantine them with an anti-join
    * against [[decodeInfo]]-style probes at scale. */
  def sampleVideoFrames(video: DataFrame, everyN: Int = 10): Dataset[VideoFrame] = {
    require(everyN >= 1, s"everyN must be >= 1, got $everyN")
    implicit val enc = Encoders.product[VideoFrame]
    video.select(col("asset_id"), col("media"))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          demuxFrames(r.getAs[Array[Byte]](1)) match {
            case Some((fps, frames)) =>
              frames.iterator.zipWithIndex
                .filter(_._2 % everyN == 0)
                .map { case (f, i) =>
                  VideoFrame(r.getLong(0), i, i / fps.toDouble, f) }
            case None => Iterator.empty
          }
        }
      }
  }

  final case class VideoFrameInfo(
      asset_id: Long, frame_idx: Int, ts_s: Double,
      frame_w: Int, frame_h: Int, decoded: Boolean)

  /** Structural per-frame info: demux the container, sample every n-th
    * frame, and REALLY decode each sampled frame's pixel dimensions. The
    * output is pure structure (ids, indices, timestamps, dims) — for a
    * deterministic synthetic corpus it is arithmetic-reproducible by any
    * other engine, which is what makes the whole demux+decode path
    * end-to-end checkable against a SQL oracle. */
  def videoFrameInfo(video: DataFrame, everyN: Int = 10): Dataset[VideoFrameInfo] = {
    require(everyN >= 1, s"everyN must be >= 1, got $everyN")
    implicit val enc = Encoders.product[VideoFrameInfo]
    sampleVideoFrames(video, everyN).mapPartitions { frames =>
      frames.map { vf =>
        readImage(vf.frame) match {
          case Some(img) => VideoFrameInfo(vf.asset_id, vf.frame_idx, vf.ts_s,
            img.getWidth, img.getHeight, decoded = true)
          case None => VideoFrameInfo(vf.asset_id, vf.frame_idx, vf.ts_s,
            -1, -1, decoded = false)
        }
      }
    }
  }

  /** Per-video embedding: mean of the sampled frames' REAL luminance
    * histograms — the video face of [[extractFeatures]], composable with
    * [[Similarity]] search like any other embedding column. */
  def videoFeatures(
      video: DataFrame, everyN: Int = 10, dim: Int = 64): Dataset[VideoFeature] = {
    require(everyN >= 1, s"everyN must be >= 1, got $everyN")
    require(dim >= 1, s"dim must be >= 1, got $dim")
    implicit val enc = Encoders.product[VideoFeature]
    video.select(col("asset_id"), col("media"))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          demuxFrames(r.getAs[Array[Byte]](1)) match {
            case Some((_, frames)) =>
              val sampled = frames.iterator.zipWithIndex
                .filter(_._2 % everyN == 0)
                .flatMap(f => readImage(f._1))
                .map(imageFeature(_, dim))
                .toArray
              if (sampled.isEmpty) Iterator.empty
              else {
                val mean = new Array[Float](dim)
                sampled.foreach { f =>
                  var i = 0; while (i < dim) { mean(i) += f(i); i += 1 } }
                var i = 0
                while (i < dim) { mean(i) /= sampled.length; i += 1 }
                Iterator.single(VideoFeature(r.getLong(0), sampled.length, mean))
              }
            case None => Iterator.empty
          }
        }
      }
  }

  /** Renders one GVID asset — called on EXECUTORS by [[syntheticVideo]]. */
  private def renderVideoRow(i: Long, nFrames: Int, fps: Float): Row = {
    val w = 24 + (i % 16).toInt
    val h = 16 + (i % 12).toInt
    val frames = (0 until nFrames).map { f =>
      val rnd = new scala.util.Random(i * 1000 + f)
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { img.setRGB(x, y, rnd.nextInt() & 0xFFFFFF); x += 1 }
        y += 1
      }
      encodePng(img)
    }
    Row(i, muxFrames(frames, fps), Row("gvid", w, h, fps, nFrames))
  }

  /** Deterministic synthetic video table: GVID containers of REAL PNG
    * frames (seeded noise per frame, dims varying per asset). Rendered
    * EXECUTOR-side — the codec work distributes; the driver muxes nothing. */
  def syntheticVideo(
      spark: SparkSession, n: Int, nFrames: Int = 24, fps: Float = 12f): DataFrame =
    spark.createDataFrame(
      spark.range(0, n.toLong, 1, math.max(1, n / 20)).rdd
        .map(i => renderVideoRow(i, nFrames, fps)),
      videoSchema)

  // ------------------------------------------- perceptual-hash dedup

  /** 64-bit average hash (aHash) of an image: luminance block sums on
    * an 8×8 grid, one bit per block set when the block's mean exceeds
    * the image's global mean. The comparison is EXACT integer
    * cross-multiplication (`blockSum·n > totalSum·blockCnt` — no
    * division, no floats), so the hash is exactly invariant under a
    * uniform brightness shift: adding `c` to every channel adds
    * `1000c` to every integer luminance, which shifts block and global
    * sums proportionally and cancels in the cross-difference. That is
    * the property the near-dup gate relies on (re-exposed / brightness-
    * adjusted copies of one image collide at Hamming 0); unrelated
    * noise images land ~32 bits apart. Big-image guard: past ~3 M
    * pixels the cross-product could overflow a Long, so the comparison
    * falls back to BigInt — same exact semantics. */
  private[functions] def aHash64(img: BufferedImage): Long = {
    val w = img.getWidth
    val h = img.getHeight
    val blockSum = new Array[Long](64)
    val blockCnt = new Array[Long](64)
    var total = 0L
    var y = 0
    while (y < h) {
      val by = (y * 8) / h
      var x = 0
      while (x < w) {
        val bx = (x * 8) / w
        val rgb = img.getRGB(x, y)
        val lum = ((((rgb >> 16) & 0xFF) * 299 + ((rgb >> 8) & 0xFF) * 587 +
          (rgb & 0xFF) * 114)).toLong
        val b = by * 8 + bx
        blockSum(b) += lum
        blockCnt(b) += 1
        total += lum
        x += 1
      }
      y += 1
    }
    val n = w.toLong * h
    val exact = n <= 3000000L
    var hash = 0L
    var i = 0
    while (i < 64) {
      if (blockCnt(i) > 0) {
        val gt =
          if (exact) blockSum(i) * n > total * blockCnt(i)
          else BigInt(blockSum(i)) * n > BigInt(total) * blockCnt(i)
        if (gt) hash |= (1L << i)
      }
      i += 1
    }
    hash
  }

  /** (asset_id, phash) over decodable images — REAL codec path, per-
    * partition amortized like the other decode passes. Undecodable rows
    * are absent (quarantine-sink material, same contract as
    * [[decodeInfo]]'s decoded=false). */
  def phashTable(media: DataFrame): DataFrame = {
    implicit val enc = org.apache.spark.sql.Encoders.product[(Long, Long)]
    media.select(col("asset_id"), col("media"))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          readImage(r.getAs[Array[Byte]](1))
            .map(img => (r.getLong(0), aHash64(img)))
        }
      }
      .toDF("asset_id", "phash")
  }

  /** Perceptual near-dup image pairs: aHash fingerprints through the
    * shared Hamming banding core ([[NearDup.hammingBandedPairs]]) —
    * exact by pigeonhole for `maxHamming < bands`, and only 16-byte
    * fingerprint rows ever shuffle (the image bytes stay at the scan).
    * The image analog of text SimHash dedup. */
  def phashPairs(
      media: DataFrame, maxHamming: Int = 2, bands: Int = 4): DataFrame =
    NearDup.hammingBandedPairs(
      phashTable(media), "asset_id", "phash", maxHamming, bands)

  /** Renders one noise PNG whose channels stay in [0, 200], optionally
    * brightness-shifted by +17 — content twins for the pHash gate:
    * asset `i ≥ n` is asset `i - n`'s pixels shifted (no channel
    * clips, so [[aHash64]] must collide them exactly). EXECUTOR-side
    * like [[renderMediaRow]]. */
  private def renderShiftableRow(i: Long, n: Long): Row = {
    val base = i % n
    val shift = if (i >= n) 17 else 0
    val w = 24 + (base % 16).toInt
    val h = 24 + (base % 12).toInt
    val rnd = new scala.util.Random(base * 7919L + 13L)
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val r = rnd.nextInt(201) + shift
        val g = rnd.nextInt(201) + shift
        val b = rnd.nextInt(201) + shift
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    Row(i, encodePng(img), Row("png", w, h))
  }

  /** Deterministic corpus with PLANTED image near-dups: 2n real PNGs
    * where asset `n + i` is asset `i` brightness-shifted — the pHash
    * dedup gate's ground truth (`media_phash_dedup`: the matched pairs
    * must be exactly {(i, n+i)}). */
  def syntheticMediaDups(spark: SparkSession, n: Int): DataFrame =
    spark.createDataFrame(
      spark.range(0, 2L * n, 1, math.max(1, n / 50))
        .rdd.map(i => renderShiftableRow(i, n.toLong)),
      mediaSchema)

  /** Renders one PNG asset — called on EXECUTORS by [[syntheticMedia]]. */
  private def renderMediaRow(i: Long): Row = {
    val w = 32 + (i % 64).toInt
    val h = 32 + (i % 48).toInt
    val rnd = new scala.util.Random(i)
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.setRGB(x, y, rnd.nextInt() & 0xFFFFFF); x += 1 }
      y += 1
    }
    Row(i, encodePng(img), Row("png", w, h))
  }

  /** Deterministic synthetic media table: REAL PNG bytes (seeded pixel
    * noise, true width/height in the metadata struct). Rendered
    * EXECUTOR-side (`spark.range` + per-partition render, NOT a driver-side
    * `Seq` + `parallelize`) — the pattern a real 100 TB corpus generator
    * follows: the driver ships only the range bounds. */
  def syntheticMedia(spark: SparkSession, n: Int): DataFrame =
    spark.createDataFrame(
      spark.range(0, n.toLong, 1, math.max(1, n / 100)).rdd.map(i => renderMediaRow(i)),
      mediaSchema)
}
