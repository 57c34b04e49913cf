package graft.multimodal

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** C11 — multimodal plumbing: schema, featurize batch shape, frame
  * sampling. The codec is a deterministic stub by design. */
class MultimodalSpec extends SparkSpec {

  import spark.implicits._
  import Multimodal._

  def media = Seq(
    MediaRow(1L, Array[Byte](1, 2, 3, 4), "jpeg", 640, 480, 1),
    MediaRow(2L, Array[Byte](9, 8, 7), "wav", 0, 0, 1),
    MediaRow(3L, Array.tabulate(64)(_.toByte), "mp4", 1280, 720, 10)
  ).toDS()

  test("featurize: one fixed-size feature row per media row, deterministic") {
    val out = featurize(media).collect().sortBy(_.media_id)
    assert(out.length == 3)
    assert(out.forall(_.feature.length == FeatureDim))
    assert(out(0).n_bytes == 4)
    val again = featurize(media).collect().sortBy(_.media_id)
    assert(out(2).feature.toSeq == again(2).feature.toSeq)
  }

  test("frame sampling keeps every Nth frame index") {
    val sampled = sampleFrameIndexes(media.toDF(), stride = 3)
      .filter(col("media_id") === 3L)
      .select("sampled_frames").head().getSeq[Long](0)
    assert(sampled == Seq(0L, 3L, 6L, 9L))
  }

  test("resize target metadata rides along the plan") {
    val r = withResizeTarget(media.toDF(), 224, 224)
      .select("resize_target.width", "resize_target.height").head()
    assert(r.getInt(0) == 224 && r.getInt(1) == 224)
  }
}
