package graft

import graft.functions.Multimodal
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: schema, per-partition decode contract,
 *  frame sampling, metadata-only pruning. Images use the real
 *  javax.imageio codec, audio the real javax.sound codec (WAV),
 *  animated GIF the real multi-frame reader; other containers use the
 *  deterministic stub. */
class MultimodalSpec extends SparkSpec {

  private lazy val media = Multimodal.synthetic(spark, 30)

  /** A real PNG: left half black, right half white. */
  private def png(w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, if (x < w / 2) 0x000000 else 0xFFFFFF)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("real PNG decode: features reflect pixel luminance, resize re-encodes (javax.imageio)") {
    import spark.implicits._
    val row = Multimodal.MediaRow(1L, png(64, 64),
      Multimodal.MediaMeta("image", "png", 64, 64, 0L, 0))
    val ds = spark.createDataset(Seq(row))
    // 4×4 grid over a half-black/half-white image: left two columns ≈ 0,
    // right two ≈ 1, row-major
    val feat = Multimodal.extractFeatures(ds, dim = 16).collect().head.feature
    for (r <- 0 until 4; c <- 0 until 4) {
      val v = feat(r * 4 + c)
      if (c < 2) assert(v < 0.01, s"cell ($r,$c) should be black, got $v")
      else assert(v > 0.99, s"cell ($r,$c) should be white, got $v")
    }
    // real resize: output decodes as a 16×8 PNG, metadata rewritten
    val resized = Multimodal.resize(ds, 16, 8).collect().head
    assert(resized.meta.format == "png" && resized.meta.width == 16)
    val back = Multimodal.ImageCodec.decode(resized.payload).get
    assert(back.getWidth == 16 && back.getHeight == 8)
    // scaled content preserved: left edge black, right edge white
    assert((back.getRGB(0, 4) & 0xFFFFFF) == 0x000000)
    assert((back.getRGB(15, 4) & 0xFFFFFF) == 0xFFFFFF)
    // non-decodable image payloads keep the deterministic fallback
    val junk = Multimodal.MediaRow(2L, Array.tabulate[Byte](64)(_.toByte),
      Multimodal.MediaMeta("image", "jpeg", 8, 8, 0L, 0))
    val f2 = Multimodal.extractFeatures(spark.createDataset(Seq(junk)), dim = 16)
      .collect().head.feature
    assert(f2.sameElements(Multimodal.FakeCodec.decodeToFeature(junk.payload, 16)))
  }

  /** A real 16-bit PCM mono WAV: first half a full-scale-ish 440 Hz sine,
   *  second half silence. */
  private def wav(rate: Int, seconds: Double, amp: Double): Array[Byte] = {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    val n = (rate * seconds).toInt
    val bytes = new Array[Byte](n * 2)
    for (i <- 0 until n) {
      val s =
        if (i < n / 2) (amp * 32767 * math.sin(2 * math.Pi * 440 * i / rate)).toInt
        else 0
      bytes(2 * i) = (s & 0xFF).toByte
      bytes(2 * i + 1) = ((s >> 8) & 0xFF).toByte
    }
    val fmt = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED, rate, 16, 1, 2, rate, false)
    val ais = new AudioInputStream(new java.io.ByteArrayInputStream(bytes), fmt, n)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("real WAV decode: stream info exact, RMS features track the signal (javax.sound)") {
    import spark.implicits._
    val payload = wav(16000, 1.0, 0.5)
    val (info, mono) = Multimodal.AudioCodec.decode(payload).get
    assert(info.sampleRate == 16000 && info.channels == 1)
    assert(info.frames == 16000L && info.durationMs == 1000L)
    assert(mono.length == 16000)

    // 4 windows: first two over the sine (RMS ≈ amp/√2), last two silent
    val feat = Multimodal.AudioCodec.decodeToFeature(payload, 4).get
    val expected = 0.5 / math.sqrt(2)
    assert(math.abs(feat(0) - expected) < 0.01, feat.toSeq)
    assert(math.abs(feat(1) - expected) < 0.01, feat.toSeq)
    assert(feat(2) == 0.0f && feat(3) == 0.0f, feat.toSeq)

    // the Spark stage routes audio rows through the REAL codec
    val row = Multimodal.MediaRow(7L, payload,
      Multimodal.MediaMeta("audio", "wav", 0, 0, 1000L, 16000))
    val viaStage = Multimodal.extractFeatures(spark.createDataset(Seq(row)), dim = 4)
      .collect().head.feature
    assert(viaStage.toSeq == feat.toSeq)
    // an UNCLAIMED container ("mp3" — no JDK decoder, no plugged codec)
    // fails fast by default: no silent fake features for real media
    val junk = Multimodal.MediaRow(8L, Array.tabulate[Byte](32)(_.toByte),
      Multimodal.MediaMeta("audio", "mp3", 0, 0, 0L, 0))
    val err = intercept[Exception] {
      Multimodal.extractFeatures(spark.createDataset(Seq(junk)), dim = 4).collect()
    }
    def rootMsg(t: Throwable): String =
      (Iterator.iterate(t)(_.getCause).takeWhile(_ != null).toSeq.last).getMessage
    assert(rootMsg(err).contains("no feature decoder for container 'mp3'"), rootMsg(err))
    // fixtures opt into the deterministic stub explicitly
    val fb = Multimodal.extractFeatures(spark.createDataset(Seq(junk)), dim = 4,
      fakeFallback = true).collect().head.feature
    assert(fb.toSeq == Multimodal.FakeCodec.decodeToFeature(junk.payload, 4).toSeq)
  }

  test("pluggable MediaCodec: a codec claiming mp4 routes both stages") {
    import spark.implicits._
    object Mp4Marker extends Multimodal.MediaCodec {
      def claims = Set("mp4")
      def decodeToFeature(payload: Array[Byte], meta: Multimodal.MediaMeta,
          dim: Int): Option[Array[Float]] =
        Some(Array.fill(dim)(42.0f)) // marker proves the routing
      override def frames(payload: Array[Byte],
          meta: Multimodal.MediaMeta): Option[IndexedSeq[Array[Byte]]] =
        Some(IndexedSeq(Array[Byte](9, 9, 9)))
    }
    val row = Multimodal.MediaRow(11L, Array.fill[Byte](32)(1),
      Multimodal.MediaMeta("video", "mp4", 64, 64, 2000L, 0))
    val ds = spark.createDataset(Seq(row))
    val feat = Multimodal.extractFeatures(ds, dim = 4, codecs = Seq(Mp4Marker))
      .collect().head.feature
    assert(feat.toSeq == Seq(42.0f, 42.0f, 42.0f, 42.0f))
    val frames = Multimodal.sampleFrames(ds, everyMs = 1000, codecs = Seq(Mp4Marker))
      .collect()
    assert(frames.length == 2 && frames.forall(_.payload.toSeq == Seq[Byte](9, 9, 9)))
    // a codec that claims the container but can't decode the payload →
    // deterministic stub, not an abort (the documented corrupt-file boundary)
    object Mp4Broken extends Multimodal.MediaCodec {
      def claims = Set("mp4")
      def decodeToFeature(payload: Array[Byte], meta: Multimodal.MediaMeta,
          dim: Int): Option[Array[Float]] = None
    }
    val fb = Multimodal.extractFeatures(ds, dim = 4, codecs = Seq(Mp4Broken))
      .collect().head.feature
    assert(fb.toSeq == Multimodal.FakeCodec.decodeToFeature(row.payload, 4).toSeq)
  }

  test("feature extraction: fixed-width vectors, deterministic") {
    // synthetic fixture carries mp4 rows → explicit fakeFallback opt-in
    val f1 = Multimodal.extractFeatures(media, dim = 16, fakeFallback = true)
      .collect().sortBy(_.media_id)
    val f2 = Multimodal.extractFeatures(media, dim = 16, fakeFallback = true)
      .collect().sortBy(_.media_id)
    assert(f1.length == 30)
    assert(f1.forall(_.feature.length == 16))
    assert(f1.zip(f2).forall { case (a, b) => a.feature.sameElements(b.feature) })
  }

  test("frame sampling yields one row per sampled frame for videos only") {
    val frames = Multimodal.sampleFrames(media, everyMs = 1000, fakeFallback = true)
      .collect()
    val videos = media.collect().filter(_.meta.media_type == "video")
    val expected = videos.map(v => ((v.meta.duration_ms + 999) / 1000).toInt).sum
    assert(frames.length == expected)
    assert(frames.forall(_.frame_idx >= 0))
  }

  test("animated GIF: real frames decoded, offsets mapped onto the sequence") {
    import spark.implicits._
    // three solid-color frames (primaries survive GIF palettization exact)
    val colors = Seq(0xFF0000, 0x00FF00, 0x0000FF)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    colors.foreach { c =>
      val img = new java.awt.image.BufferedImage(8, 8,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 8; x <- 0 until 8) img.setRGB(x, y, c)
      writer.writeToSequence(
        new javax.imageio.IIOImage(img, null, null), writer.getDefaultWriteParam)
    }
    writer.endWriteSequence(); ios.close(); writer.dispose()
    val gif = bos.toByteArray
    assert(Multimodal.GifCodec.frames(gif).get.length == 3)
    // duration 3000ms, sample every 1000ms → offsets 0/1000/2000 map to
    // frames 0/1/2; payloads are REAL decoded frames re-encoded as PNG
    val row = Multimodal.MediaRow(7L, gif,
      Multimodal.MediaMeta("video", "gif", 8, 8, 3000L, 0))
    val out = Multimodal.sampleFrames(spark.createDataset(Seq(row)), everyMs = 1000)
      .collect().sortBy(_.frame_idx)
    assert(out.length == 3)
    out.zip(colors).foreach { case (f, c) =>
      val img = Multimodal.ImageCodec.decode(f.payload).get
      assert((img.getRGB(4, 4) & 0xFFFFFF) == c,
        s"frame ${f.frame_idx} should be ${c.toHexString}")
    }
    // a non-GIF video row with no claiming codec: stub only on explicit
    // opt-in (errors by default — covered in the MediaCodec test)
    val stub = Multimodal.sampleFrames(spark.createDataset(Seq(
      Multimodal.MediaRow(8L, Array.fill[Byte](32)(5),
        Multimodal.MediaMeta("video", "mp4", 64, 64, 2000L, 0)))), everyMs = 1000,
      fakeFallback = true)
      .collect()
    assert(stub.length == 2 && stub.forall(_.payload.length == 16))
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

  // ---- Containers: the hand-written layouts behind the mm_* oracles ----

  test("Containers.grayBmp: bit-stable bytes, imageio decodes every gray exactly") {
    val bmp = Multimodal.Containers.grayBmp(8, 8)((x, y) => (y * 8 + x) * 4 % 256)
    assert(bmp.sameElements(Multimodal.Containers.grayBmp(8, 8)((x, y) => (y * 8 + x) * 4 % 256)))
    assert(bmp.length == 54 + 8 * 24) // header + 8 rows of 24 bytes, no padding
    val img = Multimodal.ImageCodec.decode(bmp).get
    assert(img.getWidth == 8 && img.getHeight == 8)
    for (y <- 0 until 8; x <- 0 until 8) {
      val v = (y * 8 + x) * 4 % 256
      assert((img.getRGB(x, y) & 0xFFFFFF) == v * 0x010101,
        s"pixel ($x,$y): expected gray $v")
    }
    // odd width exercises the 4-byte row padding branch
    val odd = Multimodal.Containers.grayBmp(3, 2)((x, y) => 10 * y + x)
    val oi = Multimodal.ImageCodec.decode(odd).get
    for (y <- 0 until 2; x <- 0 until 3)
      assert((oi.getRGB(x, y) & 0xFF) == 10 * y + x)
  }

  test("Containers.pcmWav: javax.sound decodes samples bit-exactly") {
    val samples = Array.tabulate[Short](64)(i => ((i - 32) * 512).toShort)
    val wav = Multimodal.Containers.pcmWav(8000, samples)
    val (info, mono) = Multimodal.AudioCodec.decode(wav).get
    assert(info.sampleRate == 8000 && info.channels == 1 && info.frames == 64)
    assert(mono.length == 64)
    for (i <- 0 until 64)
      assert(mono(i) == samples(i) / 32768.0f, s"sample $i")
  }

  test("Containers.solidGif: palette grays survive encode+frame-decode exactly") {
    // arbitrary grays — incl. ones a web-safe palette would NOT contain
    val grays = Seq(7, 133, 250)
    val gif = Multimodal.Containers.solidGif(8, grays)
    val frames = Multimodal.GifCodec.frames(gif).get
    assert(frames.length == 3)
    frames.zip(grays).foreach { case (png, g) =>
      val img = Multimodal.ImageCodec.decode(png).get
      for (y <- 0 until 8; x <- 0 until 8)
        assert((img.getRGB(x, y) & 0xFFFFFF) == g * 0x010101,
          s"gray $g pixel ($x,$y) got ${img.getRGB(x, y) & 0xFFFFFF}")
    }
  }

  test("decode oracles' float paths are exact: 1-pixel cells and power-of-two RMS") {
    // image: dim=64 over 8×8 → one pixel per cell, mean = v/255, ×255
    // rounds back to the integer for ALL 256 grays
    val bmp = Multimodal.Containers.grayBmp(8, 8)((x, y) => (y * 8 + x) * 4 % 256)
    val feat = Multimodal.ImageCodec.decodeToFeature(bmp, 64).get
    for (c <- 0 until 64)
      assert(math.round(feat(c).toDouble * 255d) == c * 4 % 256, s"cell $c")
    // audio: constant power-of-two window amplitudes → RMS exactly k/32768
    val samples = Array.tabulate[Short](128)(i =>
      (Seq(0, 2048, 4096, 8192, 16384)((i / 8) % 5)).toShort)
    val wav = Multimodal.Containers.pcmWav(8000, samples)
    val rms = Multimodal.AudioCodec.decodeToFeature(wav, 16).get
    for (w <- 0 until 16)
      assert(rms(w) == Seq(0, 2048, 4096, 8192, 16384)(w % 5) / 32768.0f, s"window $w")
  }
}
