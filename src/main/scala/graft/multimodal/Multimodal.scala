package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal binary-column plumbing (SURVEY.md §2 C11).
  *
  * Images / audio / video ride through the engine as opaque `binary`
  * columns with a typed metadata struct. Feature extraction dispatches
  * per row on `format`: real decoders for PPM images, JPEG/PNG/BMP/GIF
  * (the JDK's ImageIO — no new dependencies), WAV PCM audio, and
  * ppmseq frame containers ([[Codec]], all pure JVM and unit-tested);
  * formats the JVM genuinely cannot decode (mp3, h264…) fall back to a
  * clearly-labeled deterministic byte-hash. Adding a codec extends
  * [[decodeFeature]]'s match — the pipeline is format agnostic.
  *
  * Scale notes: rows carry megabyte-scale payloads, so
  * `spark.sql.files.maxPartitionBytes` governs rows/task, and feature
  * extraction is `mapPartitions` over an iterator — constant memory,
  * no per-row task overhead, no driver collect.
  */
object Multimodal {

  /** One media object: payload + typed metadata. */
  final case class MediaRow(
      media_id: Long,
      data: Array[Byte],
      format: String,     // e.g. "jpeg", "wav", "mp4"
      width: Int,
      height: Int,
      n_frames: Int)      // 1 for stills

  final case class MediaFeatures(
      media_id: Long,
      format: String,
      n_bytes: Int,
      feature: Array[Float]) // fixed-size embedding from the decoder

  val FeatureDim = 16

  /** FALLBACK for formats without a bundled decoder (compressed
    * codecs need external libraries): a deterministic byte-hash
    * "embedding", clearly labeled so it is never mistaken for a real
    * decode. */
  def byteHashFallback(data: Array[Byte]): Array[Float] = {
    val out = new Array[Float](FeatureDim)
    var i = 0
    while (i < data.length) {
      out(i % FeatureDim) += (data(i) & 0xff) / 255.0f
      i += 1
    }
    out
  }

  /** Backwards-compatible alias for the fallback. */
  def fakeDecode(data: Array[Byte]): Array[Float] = byteHashFallback(data)

  /** Format-dispatched feature extraction. Real codecs where the
    * format allows; byte-hash fallback otherwise. The whole dispatch
    * is exception-guarded: a corrupt payload that slips past a codec's
    * own validation falls back instead of killing a 100 TB job —
    * `Option`-returning codecs only cover the None path, not throws.
    * Images are resized to 32×32 before featurization so the feature
    * is resolution-invariant; ppmseq features are the mean over frames
    * sampled with stride [[FrameStride]]. */
  val FrameStride = 2

  private def imageFeature(img: Codec.Image): Array[Float] =
    Codec.imageFeatures(Codec.resize(img, 32, 32))

  def decodeFeature(format: String, data: Array[Byte]): Array[Float] =
    try decodeFeatureUnsafe(format, data)
    catch { case scala.util.control.NonFatal(_) => byteHashFallback(data) }

  private def decodeFeatureUnsafe(format: String, data: Array[Byte]): Array[Float] =
    format match {
      case "ppm" =>
        Codec.decodePpm(data).map(imageFeature).getOrElse(byteHashFallback(data))
      case "jpeg" | "jpg" | "png" | "bmp" | "gif" =>
        Codec.decodeImageIO(data).map(imageFeature).getOrElse(byteHashFallback(data))
      case "wav" =>
        Codec.decodeWav(data).map(Codec.audioFeatures)
          .getOrElse(byteHashFallback(data))
      case "ppmseq" =>
        val frames = Codec.decodePpmSeq(data)
        if (frames.isEmpty) byteHashFallback(data)
        else {
          val sampled = frames.zipWithIndex.collect {
            case (f, i) if i % FrameStride == 0 => f
          }
          val acc = new Array[Float](FeatureDim)
          sampled.foreach { f =>
            val feat = imageFeature(f)
            var i = 0
            while (i < FeatureDim) { acc(i) += feat(i); i += 1 }
          }
          var i = 0
          while (i < FeatureDim) { acc(i) /= sampled.length; i += 1 }
          acc
        }
      case _ => byteHashFallback(data)
    }

  /** Feature extraction as a typed mapPartitions pass (batch shape:
    * iterator of rows per partition, one output row per input). */
  def featurize(ds: Dataset[MediaRow],
                decode: (String, Array[Byte]) => Array[Float] = decodeFeature)
      : Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.map { r =>
      MediaFeatures(r.media_id, r.format, r.data.length, decode(r.format, r.data))
    })
  }

  /** (media_id, format, ahash, phash, decoded) — [[Codec.aHash]]
    * and/or [[Codec.pHash]] per image row (requested hashes share one
    * decode — the expensive step — so pipelines can band on either
    * signal without a second pass). The `withAHash`/`withPHash` flags
    * select the hash set: pHash costs a 32×32 resize + partial 2-D DCT
    * per image (~ms), so a consumer that bands only on `ahash` should
    * not pay for it — an unrequested hash column is emitted as 0.
    * Undecodable payloads emit `decoded = false` (hashes 0) rather
    * than vanishing — filter them into a quarantine count, the same
    * stance as every other lossy edge. Feed the decoded rows to
    * [[graft.operators.Dedup.hammingPairs]] for perceptual image
    * near-dup detection (C31 on `ahash`, C57 on `phash`): brightness
    * shifts and re-encodes of the same picture land within a few bits;
    * the DCT hash additionally rides out contrast/tone changes;
    * different pictures disagree on ~half. */
  final case class MediaHash(media_id: Long, format: String,
                             ahash: Long, phash: Long, decoded: Boolean)

  def imageHashes(ds: Dataset[MediaRow],
                  withAHash: Boolean = true,
                  withPHash: Boolean = true): Dataset[MediaHash] = {
    import ds.sparkSession.implicits._
    require(withAHash || withPHash, "select at least one hash")
    ds.mapPartitions(_.map { r =>
      val img = try {
        r.format match {
          case "ppm" => Codec.decodePpm(r.data)
          case "jpeg" | "jpg" | "png" | "bmp" | "gif" =>
            Codec.decodeImageIO(r.data)
          case _ => None
        }
      } catch { case scala.util.control.NonFatal(_) => None }
      img.map(i => MediaHash(r.media_id, r.format,
          if (withAHash) Codec.aHash(i) else 0L,
          if (withPHash) Codec.pHash(i) else 0L, decoded = true))
        .getOrElse(MediaHash(r.media_id, r.format, 0L, 0L, decoded = false))
    })
  }

  /** (media_id, format, afp, decoded) — [[Codec.audioHash]] per audio
    * row: the audio counterpart of [[imageHashes]], same
    * quarantine-not-drop stance for undecodable payloads, same
    * banded [[graft.operators.Dedup.hammingPairs]] downstream. */
  final case class AudioHash(media_id: Long, format: String,
                             afp: Long, decoded: Boolean)

  def audioHashes(ds: Dataset[MediaRow]): Dataset[AudioHash] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.map { r =>
      val aud = try {
        r.format match {
          case "wav" => Codec.decodeWav(r.data)
          case _ => None
        }
      } catch { case scala.util.control.NonFatal(_) => None }
      aud.map(a => AudioHash(r.media_id, r.format, Codec.audioHash(a),
          decoded = true))
        .getOrElse(AudioHash(r.media_id, r.format, 0L, decoded = false))
    })
  }

  /** Per-video sampled-frame perceptual hashes (SURVEY.md §2 C68) —
    * the video leg of multimodal dedup: decode the concatenated-P6
    * "ppmseq" container ([[Codec.decodePpmSeq]]), keep every
    * `stride`-th frame (the [[sampleFrameIndexes]] contract applied
    * at decode time), [[Codec.aHash]] each kept frame. `n_frames`
    * counts ALL decoded frames, so the sampling is accounted, not
    * silent. Payloads that decode to zero frames quarantine as
    * `decoded = false` with an empty hash array — the same
    * quarantine-not-drop stance as [[imageHashes]]. Feed to
    * [[graft.operators.Dedup.hammingSetPairs]]: near-dup VIDEOS share
    * most sampled-frame hashes within a few bits even when trimmed
    * (frame sets, not frame sequences — alignment-free) or
    * tone-shifted (per-frame aHash invariance). */
  final case class VideoHashes(media_id: Long, format: String,
                               n_frames: Int, fhashes: Array[Long],
                               decoded: Boolean)

  def videoHashes(ds: Dataset[MediaRow], stride: Int = 1): Dataset[VideoHashes] = {
    import ds.sparkSession.implicits._
    require(stride >= 1, "stride must be >= 1")
    ds.mapPartitions(_.map { r =>
      val frames = try {
        r.format match {
          case "ppmseq" | "ppm" => Codec.decodePpmSeq(r.data)
          case _ => Seq.empty[Codec.Image]
        }
      } catch { case scala.util.control.NonFatal(_) => Seq.empty[Codec.Image] }
      if (frames.isEmpty)
        VideoHashes(r.media_id, r.format, 0, Array.empty[Long], decoded = false)
      else {
        val hs = frames.indices.collect {
          case i if i % stride == 0 => Codec.aHash(frames(i))
        }
        VideoHashes(r.media_id, r.format, frames.size, hs.toArray,
          decoded = true)
      }
    })
  }

  /** C77 — scene-change segmentation over a [[videoHashes]] relation:
    * a cut falls between consecutive sampled frames whose perceptual
    * hashes differ by more than `threshold` bits (hard-cut detection
    * by frame-signature delta — the classical shot-boundary heuristic;
    * aHash is tone/brightness-robust, so gradual lighting drift does
    * NOT cut while a content change does). Emits per video the scene
    * count, the 1-based frame index where each scene starts, and each
    * scene's KEYFRAME hash (its first frame) — the scene-granular
    * fingerprint that catches clip reuse inside longer videos, where
    * whole-video set containment (C68) dilutes.
    *
    * Shape at 100 TB: pure codegen'd Catalyst over the per-video hash
    * array — `transform`/`filter` HOFs, zero shuffles, zero UDFs; the
    * expensive step (decode) already happened once in
    * [[videoHashes]]. Undecoded rows pass through with empty scenes,
    * preserved by the quarantine stance. */
  def sceneCuts(hashes: org.apache.spark.sql.DataFrame,
                threshold: Int = 10): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val n = size(col("fhashes"))
    // cut after frame i (1-based) ⇔ hamming(h_i, h_{i+1}) > threshold.
    // n ≤ 1 guard: Spark's sequence(1, 0) DESCENDS instead of emptying
    val cuts = when(n <= 1, array().cast("array<int>"))
      .otherwise(filter(sequence(lit(1), n - 1), i =>
        bit_count(element_at(col("fhashes"), i)
          .bitwiseXOR(element_at(col("fhashes"), i + 1))) > threshold))
    val starts = when(n === 0, array().cast("array<int>"))
      .otherwise(concat(array(lit(1)),
        transform(cuts, c => (c + 1).cast("int"))))
    hashes
      .withColumn("scene_starts", starts)
      .withColumn("n_scenes", size(col("scene_starts")))
      .withColumn("keyframes",
        transform(col("scene_starts"), i => element_at(col("fhashes"), i)))
      .select(col("media_id"), col("n_frames"), size(col("fhashes")).as("n_hashed"),
        col("n_scenes"), col("scene_starts"), col("keyframes"), col("decoded"))
  }

  /** Deterministic seed-frames→video rendering: each seed renders one
    * [[renderPpm]] frame and the frames concatenate into the "ppmseq"
    * container [[Codec.decodePpmSeq]] parses — the video counterpart
    * of [[renderPpm]]/[[renderWavPcm16]], letting q_mm_video_dups
    * drive the real multi-frame decode path from the plain-text
    * `documents` table. */
  def renderPpmSeq(seeds: Seq[Array[Byte]], w: Int, h: Int): Array[Byte] =
    seeds.toArray.flatMap(renderPpm(_, w, h))

  /** Deterministic text→image rendering: the seed bytes are cycled
    * into a P6 raster. Real encoder — the decode side is the same
    * [[Codec.decodePpm]] path production media takes, which is what
    * lets q_mm_features drive the actual codecs from the plain-text
    * `documents` table (no binary fixtures needed). */
  def renderPpm(seed: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val header = s"P6\n$w $h\n255\n".getBytes("US-ASCII")
    val n = 3 * w * h
    val out = new Array[Byte](header.length + n)
    System.arraycopy(header, 0, out, 0, header.length)
    var i = 0
    while (i < n) {
      out(header.length + i) = if (seed.isEmpty) 0 else seed(i % seed.length)
      i += 1
    }
    out
  }

  /** Deterministic text→audio rendering: seed bytes become centered
    * PCM16 samples in a complete RIFF/WAVE container (mono, 16-bit LE)
    * that [[Codec.decodeWav]] parses like any recorded file. */
  def renderWavPcm16(seed: Array[Byte], nSamples: Int,
                     sampleRate: Int = 8000): Array[Byte] = {
    val dataLen = nSamples * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1)                     // PCM, mono
      .putInt(sampleRate).putInt(sampleRate * 2)   // byte rate
      .putShort(2).putShort(16)                    // block align, bits
    buf.put("data".getBytes("US-ASCII")).putInt(dataLen)
    var i = 0
    while (i < nSamples) {
      val b = if (seed.isEmpty) 0 else seed(i % seed.length) & 0xff
      buf.putShort(((b - 128) << 8).toShort)
      i += 1
    }
    buf.array()
  }

  /** Frame sampling for video-like payloads: keep every `stride`-th
    * frame index; a zero-frame row samples nothing. Pure column
    * arithmetic — the decode of the selected frames happens later in
    * [[featurize]]. (The n_frames guard matters: `sequence(0, -1)`
    * counts DOWN in Spark, so an unguarded zero-frame row would
    * report phantom frame 0 as sampled.) */
  def sampleFrameIndexes(df: DataFrame, stride: Int): DataFrame = {
    require(stride >= 1, "stride must be >= 1")
    df.withColumn("sampled_frames",
      when(col("n_frames") > 0,
        filter(sequence(lit(0), col("n_frames") - 1), i => i % stride === 0))
        .otherwise(expr("CAST(array() AS array<bigint>)")))
  }

  /** "Resize" plumbing: records the target dims in metadata; the pixel
    * work lives in the decoder stub. */
  def withResizeTarget(df: DataFrame, w: Int, h: Int): DataFrame =
    df.withColumn("resize_target", struct(lit(w).as("width"), lit(h).as("height")))
}
