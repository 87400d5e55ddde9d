package graft

import graft.functions.Multimodal
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: schema, per-partition decode contract,
 *  frame sampling, metadata-only pruning. Codec is a deterministic stub. */
class MultimodalSpec extends SparkSpec {

  private lazy val media = Multimodal.synthetic(spark, 30)

  test("feature extraction: fixed-width vectors, deterministic") {
    val f1 = Multimodal.extractFeatures(media, dim = 16).collect().sortBy(_.media_id)
    val f2 = Multimodal.extractFeatures(media, dim = 16).collect().sortBy(_.media_id)
    assert(f1.length == 30)
    assert(f1.forall(_.feature.length == 16))
    assert(f1.zip(f2).forall { case (a, b) => a.feature.sameElements(b.feature) })
  }

  test("frame sampling yields one row per sampled frame for videos only") {
    val frames = Multimodal.sampleFrames(media, everyMs = 1000).collect()
    val videos = media.collect().filter(_.meta.media_type == "video")
    val expected = videos.map(v => ((v.meta.duration_ms + 999) / 1000).toInt).sum
    assert(frames.length == expected)
    assert(frames.forall(_.frame_idx >= 0))
  }

  test("resize rewrites image payload + metadata, passes non-images through") {
    val resized = Multimodal.resize(media, 320, 240).collect()
    val images = resized.filter(_.meta.media_type == "image")
    assert(images.nonEmpty)
    assert(images.forall(r => r.meta.width == 320 && r.meta.height == 240))
    val audio = resized.filter(_.meta.media_type == "audio")
    val origAudio = media.collect().filter(_.meta.media_type == "audio")
    assert(audio.map(_.payload.length).sorted.sameElements(
      origAudio.map(_.payload.length).sorted))
  }

  test("metadata-only projection prunes the binary payload column") {
    val df = Multimodal.metaOnly(media.toDF())
    assert(!df.columns.contains("payload"))
    assert(df.columns.toSet ==
      Set("media_id", "media_type", "format", "width", "height", "duration_ms", "sample_rate"))
    assert(df.count() == 30)
  }
}
