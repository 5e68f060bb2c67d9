package graft

import graft.operators.MultimodalOps
import graft.operators.MultimodalOps.{ImageIoDecoder, MediaMeta, MediaRow, StubDecoder}
import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import javax.imageio.ImageIO

/** Real image decoding over the JDK's own codecs: exact pixel features
  * on known rasters, re-encoding-invariant raster fingerprints, the
  * parse-or-degrade contract on non-image payloads, and the
  * distributed mapPartitions face. */
class MultimodalDecodeSpec extends SparkSpec {

  private def png(img: BufferedImage): Array[Byte] = encode(img, "png")
  private def encode(img: BufferedImage, fmt: String): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    require(ImageIO.write(img, fmt, out), s"JDK cannot encode $fmt")
    out.toByteArray
  }

  // 2×2 test raster: black, white, red, mid-gray
  private def raster: BufferedImage = {
    val img = new BufferedImage(2, 2, BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, 0x000000); img.setRGB(1, 0, 0xffffff)
    img.setRGB(0, 1, 0xff0000); img.setRGB(1, 1, 0x808080)
    img
  }

  private def row(id: Long, bytes: Array[Byte]) =
    MediaRow(MediaMeta(id, bytes.length.toLong, "image"), bytes)

  test("known 2x2 raster decodes to exact dimensions, integer-grid " +
    "luminance, and the raster md5 an independent fold computes") {
    val bytes = png(raster)
    val f = ImageIoDecoder.decode(row(7L, bytes))
    assert(f.docId == 7L && f.nBytes == bytes.length && f.nFrames == 2L)
    // luminances: 0, 255, (255+0+0)/3=85, 128 → mean = 468/4 = 117
    assert(f.feature0 == 117L, s"luminance grid wrong: ${f.feature0}")
    // independent ARGB fold (row-major, a r g b per pixel)
    val expected = Array(
      0xff, 0x00, 0x00, 0x00, 0xff, 0xff, 0xff, 0xff,
      0xff, 0xff, 0x00, 0x00, 0xff, 0x80, 0x80, 0x80).map(_.toByte)
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(expected).map("%02x".format(_)).mkString
    assert(f.fingerprint == hex, "raster fingerprint != independent md5")
  }

  test("the fingerprint is a content identity: PNG and BMP encodings " +
    "of the same raster share it while their payload bytes differ") {
    val (p, b) = (png(raster), encode(raster, "bmp"))
    assert(!java.util.Arrays.equals(p, b))
    val (fp, fb) = (ImageIoDecoder.decode(row(1L, p)),
      ImageIoDecoder.decode(row(1L, b)))
    assert(fp.fingerprint == fb.fingerprint,
      "re-encoding changed the raster fingerprint")
    assert(fp.nFrames == fb.nFrames && fp.feature0 == fb.feature0)
    // while the STUB (payload-md5) face cannot see the equivalence
    assert(StubDecoder.decode(row(1L, p)).fingerprint !=
      StubDecoder.decode(row(1L, b)).fingerprint)
  }

  test("non-image payloads degrade to the deterministic stub features " +
    "instead of poisoning the partition — across the whole corpus") {
    val viaImage = MultimodalOps
      .decodeFeatures(spark, sf(), MultimodalOps.ImageIoDecoder).collect()
    val viaStub = MultimodalOps
      .decodeFeatures(spark, sf(), MultimodalOps.StubDecoder).collect()
    assert(viaImage.toSet == viaStub.toSet,
      "text payloads must take the degrade path exactly")
    assert(viaImage.nonEmpty)
  }

  // --- real PCM audio (javax.sound: WAVE/AU/AIFF ship with the JDK) ---

  /** 16-bit signed mono PCM: a deterministic 64-sample ramp, written
    * into a real audio container via the JDK's own encoder. */
  private def pcmSamples: Array[Short] =
    (0 until 64).map(i => ((i * 523) % 8192 - 4096).toShort).toArray

  private def audio(fmt: javax.sound.sampled.AudioFileFormat.Type): Array[Byte] = {
    import javax.sound.sampled._
    val f = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
      8000f, 16, 1, 2, 8000f, true) // big-endian source
    val bytes = new Array[Byte](pcmSamples.length * 2)
    pcmSamples.zipWithIndex.foreach { case (s, i) =>
      bytes(2 * i) = ((s >> 8) & 0xff).toByte
      bytes(2 * i + 1) = (s & 0xff).toByte
    }
    val in = new AudioInputStream(
      new java.io.ByteArrayInputStream(bytes), f, pcmSamples.length.toLong)
    val out = new ByteArrayOutputStream()
    require(AudioSystem.write(in, fmt, out) > 0, s"JDK cannot write $fmt")
    out.toByteArray
  }

  test("known PCM ramp decodes to the exact frame count, integer mean " +
    "|sample|, and a container-invariant fingerprint (WAV == AIFF == AU " +
    "while their payload bytes differ)") {
    import javax.sound.sampled.AudioFileFormat.Type
    import graft.operators.MultimodalOps.AudioPcmDecoder
    val wav = audio(Type.WAVE)
    val aiff = audio(Type.AIFF)
    val au = audio(Type.AU)
    assert(!java.util.Arrays.equals(wav, aiff))
    val fw = AudioPcmDecoder.decode(row(3L, wav))
    val fa = AudioPcmDecoder.decode(row(3L, aiff))
    val fu = AudioPcmDecoder.decode(row(3L, au))
    assert(fw.nFrames == 64L, s"frames: ${fw.nFrames}")
    val meanAbs = pcmSamples.map(s => math.abs(s.toLong)).sum / 64
    assert(fw.feature0 == meanAbs, s"mean |sample|: ${fw.feature0} != $meanAbs")
    assert(fw.fingerprint == fa.fingerprint && fa.fingerprint == fu.fingerprint,
      "container re-encoding changed the PCM fingerprint")
    assert(fw.copy(nBytes = 0) == fa.copy(nBytes = 0),
      "features diverge across containers")
    // the stub face cannot see the equivalence
    assert(StubDecoder.decode(row(3L, wav)).fingerprint !=
      StubDecoder.decode(row(3L, aiff)).fingerprint)
  }

  test("non-audio payloads degrade to the stub; the decoder composes " +
    "with the directory ingest end to end") {
    import graft.operators.MultimodalOps.AudioPcmDecoder
    val txt = "not audio at all".getBytes("UTF-8")
    assert(AudioPcmDecoder.decode(row(9L, txt)) == StubDecoder.decode(row(9L, txt)))
    // directory: one wav + one txt through decodeMediaDir's shape
    val dir = java.nio.file.Files.createTempDirectory("mm-audio")
    java.nio.file.Files.write(dir.resolve("clip_5.wav"),
      audio(javax.sound.sampled.AudioFileFormat.Type.WAVE))
    java.nio.file.Files.write(dir.resolve("note_6.txt"), txt)
    val feats = MultimodalOps.decodeMediaDir(spark, dir.toString,
        decoder = AudioPcmDecoder)
      .collect().map(f => f.docId -> f).toMap
    assert(feats(5L).nFrames == 64L, s"wav via ingest: ${feats(5L)}")
    assert(feats(6L).fingerprint ==
      StubDecoder.decode(MediaRow(MediaMeta(6L, txt.length.toLong,
        "text/plain"), txt)).fingerprint)
  }

  test("distributed decode: a Dataset of real images maps through the " +
    "same mapPartitions shape with per-partition parallelism") {
    import spark.implicits._
    val imgs = (1L to 8L).map { i =>
      val img = new BufferedImage(3, 2, BufferedImage.TYPE_INT_RGB)
      (0 until 3).foreach(x => (0 until 2).foreach(y =>
        img.setRGB(x, y, (i * 0x112233).toInt & 0xffffff)))
      row(i, png(img))
    }
    val got = spark.createDataset(imgs).repartition(4)
      .mapPartitions(_.map(ImageIoDecoder.decode))
      .collect().sortBy(_.docId)
    assert(got.length == 8 && got.forall(_.nFrames == 2L))
    // uniform-color image: mean luminance == the pixel's own luminance
    got.zipWithIndex.foreach { case (f, idx) =>
      val p = ((idx + 1) * 0x112233) & 0xffffff
      val lum = (((p >> 16) & 0xff) + ((p >> 8) & 0xff) + (p & 0xff)) / 3
      assert(f.feature0 == lum.toLong, s"doc ${f.docId}: ${f.feature0} != $lum")
    }
  }
}
