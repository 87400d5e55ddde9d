package graft.functions

import graft.functions.Multimodal.{MediaCodec, MediaMeta}

/**
 * MediaCodec CONFORMANCE KIT (round-6 VERDICT ask #5): golden byte
 * fixtures plus a pure-JVM check harness that any external
 * [[Multimodal.MediaCodec]] implementation (an FFmpeg binding, a vendor
 * SDK wrapper) must pass before a deployment trusts it inside the
 * multimodal stages. The contract being verified is exactly what
 * [[Multimodal.extractFeatures]]/[[Multimodal.sampleFrames]] rely on
 * (Multimodal.scala routing + the corrupt-payload degradation
 * boundary):
 *
 *  1. `claims` is non-empty lowercase container names;
 *  2. the golden payload decodes to a feature vector of EXACTLY the
 *     requested width, with finite values;
 *  3. decoding is DETERMINISTIC (same bytes → same vector, call after
 *     call and across a serialization round trip — the codec ships to
 *     executors inside stage closures);
 *  4. a corrupt payload returns None and NEVER throws — the stages turn
 *     None into the deterministic stub instead of aborting a 100 TB
 *     job on one bad file;
 *  5. when the codec does frame extraction, frames are deterministic,
 *     non-empty, and corrupt payloads again degrade via None.
 *
 * No Spark required here — a deployment can run `MediaCodecConformance
 * .run(myCodec, myFixtures)` in a plain JVM and read the report. The
 * in-repo `MediaCodecContractSpec` runs the same harness over the JDK
 * built-in codecs (imageio / sampled / gif) as reference
 * implementations, plus the Spark-side routing and frame-offset checks
 * that need a session.
 */
object MediaCodecConformance {

  /** One golden fixture: a decodable payload for a claimed container,
   *  its metadata, and a corrupt twin that must degrade gracefully. */
  final case class Fixture(format: String, payload: Array[Byte],
      meta: MediaMeta, corrupt: Array[Byte])

  final case class Check(name: String, passed: Boolean, detail: String = "") {
    override def toString: String =
      f"${if (passed) "PASS" else "FAIL"}  $name${if (detail.nonEmpty) s"  ($detail)" else ""}"
  }

  private def check(name: String)(body: => Either[String, Unit]): Check =
    try body match {
      case Right(()) => Check(name, passed = true)
      case Left(msg) => Check(name, passed = false, msg)
    } catch {
      case e: Throwable =>
        Check(name, passed = false, s"threw ${e.getClass.getSimpleName}: ${e.getMessage}")
    }

  private def ok: Either[String, Unit] = Right(())
  private def fail(msg: String): Either[String, Unit] = Left(msg)

  private def roundTrip(codec: MediaCodec): MediaCodec = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.ObjectOutputStream(bos)
    out.writeObject(codec); out.close()
    val in = new java.io.ObjectInputStream(
      new java.io.ByteArrayInputStream(bos.toByteArray))
    in.readObject().asInstanceOf[MediaCodec]
  }

  /** Run every conformance check; all `passed` ⇒ the codec honors the
   *  stage contract for the supplied fixtures. */
  def run(codec: MediaCodec, fixtures: Seq[Fixture], dims: Seq[Int] = Seq(4, 16, 64)): Seq[Check] = {
    val base = Seq(
      check("claims: non-empty, lowercase") {
        if (codec.claims.isEmpty) fail("claims is empty")
        else if (codec.claims.exists(c => c != c.toLowerCase)) fail(s"non-lowercase: ${codec.claims}")
        else ok
      },
      check("serializable: java round trip") {
        roundTrip(codec); ok
      })
    val perFixture = fixtures.flatMap { f =>
      val tag = s"[${f.format}]"
      val claimed = check(s"$tag container is claimed") {
        if (codec.claims.contains(f.format)) ok
        else fail(s"claims=${codec.claims} missing ${f.format}")
      }
      val widths = dims.map { d =>
        check(s"$tag feature width $d: decodes to exactly $d finite floats") {
          codec.decodeToFeature(f.payload, f.meta, d) match {
            case None => fail("golden payload did not decode")
            case Some(v) if v.length != d => fail(s"got width ${v.length}")
            case Some(v) if v.exists(x => x.isNaN || x.isInfinite) => fail("non-finite values")
            case Some(_) => ok
          }
        }
      }
      val deterministic = check(s"$tag feature deterministic (repeat + post-serialization)") {
        val d = dims.head
        val a = codec.decodeToFeature(f.payload, f.meta, d)
        val b = codec.decodeToFeature(f.payload, f.meta, d)
        val c = roundTrip(codec).decodeToFeature(f.payload, f.meta, d)
        (a, b, c) match {
          case (Some(x), Some(y), Some(z)) if x.sameElements(y) && y.sameElements(z) => ok
          case (Some(_), Some(_), Some(_)) => fail("repeat decodes differ")
          case _ => fail("a decode returned None")
        }
      }
      val corruptFeature = check(s"$tag corrupt payload: feature → None, no throw") {
        codec.decodeToFeature(f.corrupt, f.meta, dims.head) match {
          case None => ok
          case Some(_) => fail("corrupt payload decoded — corrupt twin too gentle, " +
            "or codec does not validate payloads")
        }
      }
      val framesChecks = codec.frames(f.payload, f.meta) match {
        case None => Nil // codec does no frame extraction for this container
        case Some(fr) => Seq(
          check(s"$tag frames: non-empty, every payload non-empty") {
            if (fr.isEmpty) fail("zero frames from golden payload")
            else if (fr.exists(_.isEmpty)) fail("empty frame payload")
            else ok
          },
          check(s"$tag frames deterministic") {
            codec.frames(f.payload, f.meta) match {
              case Some(fr2) if fr.length == fr2.length &&
                fr.zip(fr2).forall { case (x, y) => x.sameElements(y) } => ok
              case Some(_) => fail("repeat frame decodes differ")
              case None => fail("second decode returned None")
            }
          },
          check(s"$tag corrupt payload: frames → None, no throw") {
            codec.frames(f.corrupt, f.meta) match {
              case None => ok
              case Some(_) => fail("corrupt payload produced frames")
            }
          })
      }
      claimed +: (widths ++ Seq(deterministic, corruptFeature) ++ framesChecks)
    }
    base ++ perFixture
  }

  // ---- golden fixtures (deterministic, generated from JDK encoders —
  //      no binary blobs in the repo; a deployment supplies its own
  //      mp4/mp3 goldens the same shape) ----

  /** Golden PNG: half-black/half-white `w`×`h` bitmap. */
  def goldenPng(w: Int = 64, h: Int = 64): Fixture = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, if (x < w / 2) 0x000000 else 0xFFFFFF)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val bytes = bos.toByteArray
    Fixture("png", bytes, MediaMeta("image", "png", w, h, 0L, 0),
      corrupt = bytes.take(16)) // truncated after the signature
  }

  /** Golden WAV: 16-bit PCM mono, first half 440 Hz sine, second half
   *  silence. */
  def goldenWav(rate: Int = 16000, seconds: Double = 0.5, amp: Double = 0.5): Fixture = {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    val n = (rate * seconds).toInt
    val pcm = new Array[Byte](n * 2)
    for (i <- 0 until n) {
      val s =
        if (i < n / 2) (amp * 32767 * math.sin(2 * math.Pi * 440 * i / rate)).toInt
        else 0
      pcm(2 * i) = (s & 0xFF).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xFF).toByte
    }
    val fmt = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED, rate, 16, 1, 2, rate, false)
    val ais = new AudioInputStream(new java.io.ByteArrayInputStream(pcm), fmt, n)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    val bytes = bos.toByteArray
    Fixture("wav", bytes,
      MediaMeta("audio", "wav", 0, 0, (seconds * 1000).toLong, rate),
      corrupt = bytes.take(8)) // RIFF header cut short
  }

  /** Golden animated GIF: `colors.length` solid-color 8×8 frames
   *  (primaries survive GIF palettization exactly). */
  def goldenGif(colors: Seq[Int] = Seq(0xFF0000, 0x00FF00, 0x0000FF)): Fixture = {
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
    val bytes = bos.toByteArray
    Fixture("gif", bytes,
      MediaMeta("video", "gif", 8, 8, colors.length * 1000L, 0),
      corrupt = bytes.take(6)) // GIF89a signature only
  }

  /** Print a human-readable report; returns true when fully conformant
   *  (deployment smoke-test entry point). */
  def report(codec: MediaCodec, fixtures: Seq[Fixture]): Boolean = {
    val checks = run(codec, fixtures)
    checks.foreach(c => println(c.toString))
    val bad = checks.count(!_.passed)
    println(s"${checks.size - bad}/${checks.size} checks passed")
    bad == 0
  }
}

/**
 * The JDK built-in decoders wrapped as [[Multimodal.MediaCodec]]
 * REFERENCE IMPLEMENTATIONS: they prove the conformance kit against
 * real codecs, and show a deployment exactly what an FFmpeg-backed
 * implementation has to look like. (The stages already use the
 * built-ins directly; these wrappers exist for the kit and as the
 * documented example.)
 */
object BuiltinMediaCodecs {

  /** javax.imageio over PNG/JPEG/BMP (single-frame feature decode). */
  object ImageRef extends MediaCodec {
    def claims: Set[String] = Set("png", "jpeg", "jpg", "bmp")
    def decodeToFeature(payload: Array[Byte], meta: MediaMeta, dim: Int): Option[Array[Float]] =
      Multimodal.ImageCodec.decodeToFeature(payload, dim)
  }

  /** javax.sound.sampled over WAV/AIFF/AU PCM. */
  object AudioRef extends MediaCodec {
    def claims: Set[String] = Set("wav", "wave", "aiff", "aif", "au")
    def decodeToFeature(payload: Array[Byte], meta: MediaMeta, dim: Int): Option[Array[Float]] =
      Multimodal.AudioCodec.decodeToFeature(payload, dim)
  }

  /** Multi-frame animated GIF (frames + first-frame features). */
  object GifRef extends MediaCodec {
    def claims: Set[String] = Set("gif")
    def decodeToFeature(payload: Array[Byte], meta: MediaMeta, dim: Int): Option[Array[Float]] =
      Multimodal.ImageCodec.decodeToFeature(payload, dim)
    override def frames(payload: Array[Byte], meta: MediaMeta): Option[IndexedSeq[Array[Byte]]] =
      Multimodal.GifCodec.frames(payload)
  }
}
