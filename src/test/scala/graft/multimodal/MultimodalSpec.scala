package graft.multimodal

import graft.SparkSpec
import Multimodal._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("decode pipeline: typed mapPartitions, deterministic stub features") {
    val media = Seq(
      MediaRow(1L, "image", "key agg row".getBytes("UTF-8")),
      MediaRow(2L, "audio", Array[Byte]()),
      MediaRow(3L, "image", "key agg row".getBytes("UTF-8"))).toDS()
    val feats = decodeFeatures(media).collect().sortBy(_.media_id)
    assert(feats.map(_.media_id).toSeq == Seq(1L, 2L, 3L))
    assert(feats(0).n_bytes == 11 && feats(1).n_bytes == 0)
    // determinism: same payload -> same features
    assert(feats(0).copy(media_id = 3L) == feats(2))
    assert(feats(0).magic == "6b657920")   // "key " in hex
    assert(feats(1).width == 0 && feats(1).height == 0)
  }

  test("asMedia wraps any binary-able column with kind + id") {
    val ds = asMedia(Seq((7L, "payload")).toDF("id", "data"), "id", "data", "video")
    val row = ds.head()
    assert(row.media_id == 7L && row.kind == "video")
    assert(new String(row.payload, "UTF-8") == "payload")
  }

  test("resize re-chunks deterministically; frameSample keeps every Nth") {
    val media = Seq(MediaRow(1L, "video", Array.tabulate(4096)(_.toByte))).toDS()
    val resized = resize(media, 64, 64).collect().head
    assert(resized.payload.length == 64)
    val frames = frameSample(media, everyN = 2, frameBytes = 1024)
      .collect().sortBy(_.frame_no)
    assert(frames.map(_.frame_no).toSeq == Seq(0, 2))
    assert(frames.forall(_.frame.length == 1024))
    // determinism
    val again = resize(media, 64, 64).collect().head
    assert(resized.payload.toSeq == again.payload.toSeq)
  }

  test("synthetic media from documents feeds the full pipeline") {
    val feats = decodeFeatures(syntheticMedia(spark, sf())).toDF()
    assert(feats.count() == 500)
    assert(feats.columns.toSeq == Seq("media_id", "kind", "n_bytes", "magic",
      "width", "height", "checksum"))
  }
}
