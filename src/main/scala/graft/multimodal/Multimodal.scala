package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal binary-column plumbing (SURVEY.md §2 C11).
  *
  * Images / audio / video ride through the engine as opaque `binary`
  * columns with a typed metadata struct. The Spark-side plumbing —
  * schema, batch shape, partition sizing, frame-sampling arithmetic —
  * is real; the codec itself is STUBBED (`fakeDecode`) because no
  * image/audio library ships in this environment. Swapping the stub
  * for a real decoder changes only the function passed to
  * [[featurize]], not the pipeline.
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

  /** STUB decoder: a deterministic byte-hash "embedding" standing in
    * for a real image/audio decode + model forward pass. Marked
    * clearly so it is never mistaken for a real codec. */
  def fakeDecode(data: Array[Byte]): Array[Float] = {
    // ??? real codec goes here; deterministic stand-in below
    val out = new Array[Float](FeatureDim)
    var i = 0
    while (i < data.length) {
      out(i % FeatureDim) += (data(i) & 0xff) / 255.0f
      i += 1
    }
    out
  }

  /** Feature extraction as a typed mapPartitions pass (batch shape:
    * iterator of rows per partition, one output row per input). */
  def featurize(ds: Dataset[MediaRow],
                decode: Array[Byte] => Array[Float] = fakeDecode): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.map { r =>
      MediaFeatures(r.media_id, r.format, r.data.length, decode(r.data))
    })
  }

  /** Frame sampling for video-like payloads: keep every `stride`-th
    * frame index. Pure column arithmetic — the decode of the selected
    * frames happens later in [[featurize]]. */
  def sampleFrameIndexes(df: DataFrame, stride: Int): DataFrame =
    df.withColumn("sampled_frames",
      filter(sequence(lit(0), col("n_frames") - 1), i => i % stride === 0))

  /** "Resize" plumbing: records the target dims in metadata; the pixel
    * work lives in the decoder stub. */
  def withResizeTarget(df: DataFrame, w: Int, h: Int): DataFrame =
    df.withColumn("resize_target", struct(lit(w).as("width"), lit(h).as("height")))
}
