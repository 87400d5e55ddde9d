package graft.functions

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal column plumbing: image/audio/video as opaque `binary`
 * columns with typed metadata structs, plus decode / feature-extract /
 * resize / frame-sample stages.
 *
 * The actual codec step is STUBBED with a deterministic fake (no
 * image/audio libraries in this environment) — everything Spark-side
 * (schema, batch shape, partition behavior, the mapPartitions contract
 * a vectorized decode UDF would run under) is real and tested. Swap
 * `FakeCodec` for a real decoder without touching the pipeline.
 *
 * Scale notes: binary payloads stay columnar until the decode stage, the
 * decode runs per-partition (mapPartitions — one codec init per
 * partition, not per row), and metadata-only queries never touch the
 * bytes thanks to parquet column pruning.
 */
object Multimodal {

  /** Typed metadata carried next to each binary payload. */
  val mediaMetaSchema: StructType = StructType(Seq(
    StructField("media_type", StringType),   // image | audio | video
    StructField("format", StringType),       // jpeg | wav | mp4 ...
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("duration_ms", LongType),
    StructField("sample_rate", IntegerType)))

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("payload", BinaryType),
    StructField("meta", mediaMetaSchema)))

  final case class MediaMeta(media_type: String, format: String, width: Int,
      height: Int, duration_ms: Long, sample_rate: Int)
  final case class MediaRow(media_id: Long, payload: Array[Byte], meta: MediaMeta)
  final case class Feature(media_id: Long, feature: Array[Float])
  final case class Frame(media_id: Long, frame_idx: Int, payload: Array[Byte])

  /**
   * Deterministic fake codec: "decodes" a payload to a feature vector by
   * hashing byte windows. Stands in for a real image/audio decoder; the
   * signature (bytes + meta in, fixed-width float vector out) is the real
   * contract a vision/audio embedder would satisfy.
   */
  object FakeCodec {
    def decodeToFeature(payload: Array[Byte], dim: Int): Array[Float] = {
      val out = new Array[Float](dim)
      var i = 0
      while (i < payload.length) {
        out(i % dim) += (payload(i) & 0xFF) / 255.0f
        i += 1
      }
      out
    }
    def frameOffsets(meta: MediaMeta, everyMs: Long): Seq[Long] =
      if (meta.duration_ms <= 0) Seq(0L)
      else 0L.until(meta.duration_ms, everyMs)
  }

  /**
   * Feature extraction stage: per-partition batched decode (the shape a
   * vectorized/pandas-style UDF runs under — one codec per partition,
   * rows streamed through it).
   */
  def extractFeatures(media: Dataset[MediaRow], dim: Int = 64): Dataset[Feature] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // real impl: initialize the codec ONCE here
      it.map(r => Feature(r.media_id, FakeCodec.decodeToFeature(r.payload, dim)))
    }
  }

  /** Frame sampling for video rows: one output row per sampled frame. */
  def sampleFrames(media: Dataset[MediaRow], everyMs: Long = 1000): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.filter(_.meta.media_type == "video").flatMap { r =>
      FakeCodec.frameOffsets(r.meta, everyMs).zipWithIndex.map { case (_, idx) =>
        Frame(r.media_id, idx, r.payload.take(16)) // stub: real impl decodes the frame
      }
    }
  }

  /**
   * Resize stage for image rows: returns new payloads with updated
   * metadata. Codec stubbed (deterministic byte subsample standing in for
   * a real scaler); the Spark contract — binary in, binary out, metadata
   * struct rewritten, non-images passed through — is real.
   */
  def resize(media: Dataset[MediaRow], w: Int, h: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.map { r =>
      if (r.meta.media_type != "image") r
      else {
        val stride = math.max(1, r.payload.length / math.max(1, (w * h) / 64))
        val scaled = r.payload.indices.by(stride).map(r.payload).toArray
        r.copy(payload = scaled, meta = r.meta.copy(width = w, height = h))
      }
    }
  }

  /** Metadata-only projection — must prune the binary column at scan time. */
  def metaOnly(media: DataFrame): DataFrame =
    media.select(col("media_id"), col("meta.*"))

  /** Deterministic synthetic media table (for tests; payload derived from id). */
  def synthetic(spark: org.apache.spark.sql.SparkSession, n: Int): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(n).map { id =>
      val bytes = Array.tabulate[Byte](64 + (id % 64).toInt)(i => ((id * 31 + i) % 251).toByte)
      val mt = (id % 3) match {
        case 0 => MediaMeta("image", "jpeg", 640, 480, 0L, 0)
        case 1 => MediaMeta("audio", "wav", 0, 0, 4000L + id % 1000, 16000)
        case _ => MediaMeta("video", "mp4", 1280, 720, 5000L + id % 2000, 0)
      }
      MediaRow(id, bytes, mt)
    }
  }
}
