package graft

import graft.functions.{BuiltinMediaCodecs, MediaCodecConformance, Multimodal}
import graft.functions.MediaCodecConformance.Fixture
import graft.functions.Multimodal.{MediaCodec, MediaMeta, MediaRow}

/**
 * Reusable MediaCodec contract (round-6 VERDICT ask #5): subclass with
 * YOUR codec + golden fixtures and the suite verifies everything the
 * multimodal stages assume — the pure-JVM conformance checks
 * ([[MediaCodecConformance]]) plus the Spark-side routing and
 * frame-offset mapping that need a session. The three JDK built-in
 * reference implementations instantiate it below, proving the kit
 * against real codecs; a deployment's FFmpeg-backed codec gets its own
 * three-line subclass (with its own mp4/mp3 goldens).
 */
abstract class MediaCodecContract(codecName: String, codec: MediaCodec,
    fixtures: => Seq[Fixture]) extends SparkSpec {

  test(s"$codecName: passes every pure-JVM conformance check") {
    val checks = MediaCodecConformance.run(codec, fixtures)
    val failed = checks.filter(!_.passed)
    assert(failed.isEmpty, "\n" + failed.mkString("\n"))
  }

  test(s"$codecName: extractFeatures routes claimed rows through this codec") {
    import spark.implicits._
    fixtures.foreach { f =>
      val row = MediaRow(1L, f.payload, f.meta)
      val viaStage = Multimodal.extractFeatures(spark.createDataset(Seq(row)),
        dim = 16, codecs = Seq(codec)).collect().head.feature
      val direct = codec.decodeToFeature(f.payload, f.meta, 16).get
      assert(viaStage.sameElements(direct),
        s"${f.format}: stage output differs from direct decode")
      // corrupt twin degrades to the deterministic stub — job survives
      val corrupt = MediaRow(2L, f.corrupt, f.meta)
      val viaCorrupt = Multimodal.extractFeatures(spark.createDataset(Seq(corrupt)),
        dim = 16, codecs = Seq(codec)).collect().head.feature
      assert(viaCorrupt.sameElements(
        Multimodal.FakeCodec.decodeToFeature(f.corrupt, 16)),
        s"${f.format}: corrupt payload did not degrade to the stub")
    }
  }

  test(s"$codecName: sampleFrames maps offsets onto the decoded sequence") {
    import spark.implicits._
    fixtures.filter(f => codec.frames(f.payload, f.meta).isDefined).foreach { f =>
      val n = codec.frames(f.payload, f.meta).get.length
      val video = MediaRow(3L, f.payload,
        f.meta.copy(media_type = "video", duration_ms = n * 1000L))
      val out = Multimodal.sampleFrames(spark.createDataset(Seq(video)),
        everyMs = 1000, codecs = Seq(codec)).collect().sortBy(_.frame_idx)
      // one sampled row per 1000ms offset, mapped proportionally: with
      // duration == n seconds, offset k*1000 lands on frame k exactly
      assert(out.length == n, s"${f.format}: expected $n sampled frames, got ${out.length}")
      val frames = codec.frames(f.payload, f.meta).get
      out.zipWithIndex.foreach { case (fr, i) =>
        assert(fr.payload.sameElements(frames(i)),
          s"${f.format}: offset ${i}s mapped to the wrong frame")
      }
    }
  }
}

class ImageMediaCodecContractSpec extends MediaCodecContract(
  "builtin imageio codec", BuiltinMediaCodecs.ImageRef,
  Seq(MediaCodecConformance.goldenPng()))

class AudioMediaCodecContractSpec extends MediaCodecContract(
  "builtin sampled-audio codec", BuiltinMediaCodecs.AudioRef,
  Seq(MediaCodecConformance.goldenWav()))

class GifMediaCodecContractSpec extends MediaCodecContract(
  "builtin gif frame codec", BuiltinMediaCodecs.GifRef,
  Seq(MediaCodecConformance.goldenGif()))

/** The kit must also REJECT a broken codec — a conformance harness that
 *  cannot fail is no harness. */
class MediaCodecKitRejectsSpec extends SparkSpec {
  test("non-deterministic and throwing codecs fail conformance") {
    object Flaky extends MediaCodec {
      private var n = 0
      def claims = Set("xyz")
      def decodeToFeature(p: Array[Byte], m: MediaMeta, dim: Int): Option[Array[Float]] = {
        n += 1; Some(Array.fill(dim)(n.toFloat)) // drifts per call
      }
    }
    val f = Fixture("xyz", Array.fill[Byte](32)(1),
      MediaMeta("video", "xyz", 0, 0, 0L, 0), corrupt = Array[Byte](0))
    val flakyChecks = MediaCodecConformance.run(Flaky, Seq(f))
    assert(flakyChecks.exists(c => !c.passed && c.name.contains("deterministic")))

    object Thrower extends MediaCodec {
      def claims = Set("xyz")
      def decodeToFeature(p: Array[Byte], m: MediaMeta, dim: Int): Option[Array[Float]] =
        if (p.length < 8) throw new RuntimeException("boom") // must be None instead
        else Some(Array.fill(dim)(1.0f))
    }
    val throwChecks = MediaCodecConformance.run(Thrower, Seq(f))
    assert(throwChecks.exists(c => !c.passed && c.name.contains("corrupt")))
  }
}
