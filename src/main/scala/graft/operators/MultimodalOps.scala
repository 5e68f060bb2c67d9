package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (builder brief): media payloads travel as
  * opaque `binary` columns with typed metadata structs; decode /
  * feature-extract runs per-partition against a pluggable decoder.
  *
  * Third-party media codecs are not in this container, so `StubDecoder`
  * produces deterministic fake features from the bytes — the Spark-side
  * contract (schema, batch shape, partition parallelism, metadata
  * propagation) is the real, tested part. `ImageIoDecoder` goes one
  * step further with the codecs the JDK itself ships (javax.imageio:
  * PNG/BMP/GIF/JPEG): REAL pixel decoding with parse-or-degrade
  * fallback to the stub, spec'd on generated rasters
  * (MultimodalDecodeSpec); `AudioPcmDecoder` does the same for the
  * JDK's PCM audio containers (WAVE/AU/AIFF). Only compressed
  * audio/video (MP3/AAC/H.264 — zero SPIs in this container, probe
  * re-run each round) remains stubbed. The testdata has no media
  * table, so document text doubles as the payload
  * (`cast(text as binary)`).
  */
object MultimodalOps {

  /** Typed metadata every media row carries alongside its payload. */
  case class MediaMeta(docId: Long, nBytes: Long, contentType: String)
  case class MediaRow(meta: MediaMeta, payload: Array[Byte])
  case class MediaFeatures(docId: Long, nBytes: Long, nFrames: Long,
    feature0: Long, fingerprint: String)

  /** Decoder contract — swap in a real image/audio decoder in production.
    * Must be deterministic given the payload bytes. */
  trait Decoder extends Serializable {
    def decode(row: MediaRow): MediaFeatures
  }

  /** Deterministic fake: "frames" = 256-byte chunks, feature = byte-sum
    * proxy. Stands in for `???` real decoding (brief-sanctioned stub). */
  /** lowercase-hex md5 — ONE definition shared by every Dataset face so
    * the columnar-twin parity can never drift on encoding */
  private def md5Hex(bytes: Array[Byte]): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(bytes).map("%02x".format(_)).mkString

  object StubDecoder extends Decoder {
    def decode(row: MediaRow): MediaFeatures = {
      val n = row.payload.length.toLong
      MediaFeatures(row.meta.docId, n, n / 256 + 1, n % 7, md5Hex(row.payload))
    }
  }

  /** documents.text → binary payload + metadata struct. */
  def mediaTable(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .map(r => MediaRow(
        MediaMeta(r.getLong(0), r.getAs[Array[Byte]](1).length.toLong, "text/plain"),
        r.getAs[Array[Byte]](1)))
  }

  /** REAL image decoder over the JDK's own codecs (javax.imageio —
    * PNG/BMP/GIF/JPEG ship with every JVM, no container deps): decodes
    * the payload to pixels and emits real features — nFrames = pixel
    * rows, feature0 = the mean luminance on the integer grid (sum of
    * (r+g+b)/3 per pixel / n, integer division — deterministic),
    * fingerprint = md5 of the DECODED ARGB raster (content identity
    * that survives re-encoding byte differences, which the payload-md5
    * stub cannot see). A payload ImageIO cannot parse (the corpus's
    * text-as-bytes stand-ins, truncated files) degrades to the
    * deterministic stub features rather than poisoning the partition —
    * the parse-or-degrade contract of the signal pipeline applied to
    * media. Same mapPartitions shape: one decoder instance per
    * partition, embarrassingly parallel at 100 TB. */
  object ImageIoDecoder extends Decoder {
    def decode(row: MediaRow): MediaFeatures = {
      // NonFatal, not just IOException: ImageIO.read throws runtime
      // exceptions on some malformed payloads (CMMException for corrupt
      // ICC profiles, IndexOutOfBounds/NegativeArraySize on bad
      // headers) — parse-or-degrade must absorb those too, while OOM
      // and other fatal errors still propagate.
      val img =
        try javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(row.payload))
        catch { case scala.util.control.NonFatal(_) => null }
      if (img == null || img.getWidth <= 0) StubDecoder.decode(row)
      else {
        val (w, h) = (img.getWidth, img.getHeight)
        var lumSum = 0L
        val argb = new Array[Byte](w * h * 4)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val p = img.getRGB(x, y)
            val (r, g, b) = ((p >> 16) & 0xff, (p >> 8) & 0xff, p & 0xff)
            lumSum += (r + g + b) / 3
            val o = (y * w + x) * 4
            argb(o) = ((p >> 24) & 0xff).toByte; argb(o + 1) = r.toByte
            argb(o + 2) = g.toByte; argb(o + 3) = b.toByte
            x += 1
          }
          y += 1
        }
        MediaFeatures(row.meta.docId, row.meta.nBytes,
          nFrames = h.toLong,
          feature0 = lumSum / (w.toLong * h),
          fingerprint = md5Hex(argb))
      }
    }
  }

  /** REAL audio decoder over the JDK's own PCM codecs
    * (javax.sound.sampled — the WAVE/AU/AIFF containers ship with every
    * JVM; compressed codecs like MP3/AAC have no SPI in this container
    * — probe re-run r7 — and keep the honest stub): decodes the payload
    * to PCM samples and emits real features — nFrames = PCM frame
    * count, feature0 = mean |sample| over all channels on the 16-bit
    * integer grid (integer division — deterministic), fingerprint =
    * md5 of the CANONICAL PCM rendering (signed 16-bit big-endian at
    * the source rate/channels), so the same recording in WAV, AU or
    * AIFF containers fingerprints identically — ImageIoDecoder's
    * re-encoding-invariant raster fingerprint applied to sound. A
    * payload javax.sound cannot parse degrades to the deterministic
    * stub (the shared parse-or-degrade contract). */
  object AudioPcmDecoder extends Decoder {
    def decode(row: MediaRow): MediaFeatures = {
      import javax.sound.sampled._
      val real =
        try {
          val in = AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(row.payload))
          try {
            val src = in.getFormat
            val canon = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
              src.getSampleRate, 16, src.getChannels,
              2 * src.getChannels, src.getSampleRate, true)
            val pcm = AudioSystem.getAudioInputStream(canon, in).readAllBytes()
            var absSum = 0L
            var i = 0
            while (i + 1 < pcm.length) {
              val s = (((pcm(i) & 0xff) << 8) | (pcm(i + 1) & 0xff)).toShort
              absSum += math.abs(s.toLong)
              i += 2
            }
            val nSamples = pcm.length / 2
            Some(MediaFeatures(row.meta.docId, row.meta.nBytes,
              nFrames = pcm.length.toLong / canon.getFrameSize,
              feature0 = if (nSamples == 0) 0L else absSum / nSamples,
              fingerprint = md5Hex(pcm)))
          } finally in.close()
        } catch { case scala.util.control.NonFatal(_) => None }
      real.getOrElse(StubDecoder.decode(row))
    }
  }

  /** Per-partition decode — the mapPartitions shape a real decoder needs
    * (amortize codec init per partition, stream rows, never collect). */
  def decodeFeatures(spark: SparkSession, dir: String,
      decoder: Decoder = StubDecoder): Dataset[MediaFeatures] = {
    import spark.implicits._
    mediaTable(spark, dir).mapPartitions(_.map(decoder.decode))
  }

  /** Extension → MIME type for the directory ingest (the handful the
    * JDK can actually decode, plus the honest octet-stream default). */
  private val MimeByExt = Map(
    "png" -> "image/png", "bmp" -> "image/bmp", "gif" -> "image/gif",
    "jpg" -> "image/jpeg", "jpeg" -> "image/jpeg", "wav" -> "audio/wav",
    "au" -> "audio/basic", "aiff" -> "audio/aiff", "txt" -> "text/plain")

  /** FILE-DIRECTORY media ingest — the real-world entry point for an
    * image corpus: Spark's built-in `binaryFile` source (ships in
    * spark-sql, no new dependency) reads a directory tree of media
    * files into the SAME `MediaRow` contract the decode pipeline runs
    * on. Each file is one row: payload = the file bytes, nBytes = the
    * file length, content type from the extension, and docId from the
    * trailing digits of the file stem (the `img_0042.png` shard
    * convention) falling back to a stable 60-bit digest of the
    * CORPUS-ROOT-RELATIVE path — relocating the root keeps ids, but
    * same-named files in different shard subdirectories hash apart
    * (advice r6: a bare-NAME digest silently merged them). The digit
    * path cannot make that guarantee (`img_0042` and `doc_0042` both
    * read 42), so by default the ingest ASSERTS docId uniqueness with
    * one metadata-only pass (content pruned — listing speed) and fails
    * loudly listing the colliding paths; `checkIds = false` opts out
    * when the caller owns the naming convention.
    *
    * Scale: `pathGlobFilter` prunes at the LISTING level (non-matching
    * files are never opened), selecting only the metadata columns
    * prunes `content` out of the scan entirely (pinned by spec), and
    * the unit of parallelism is the file — the right grain for media,
    * where one file is one decode task. */
  def ingestMediaDir(spark: SparkSession, mediaDir: String,
      glob: String = "*", checkIds: Boolean = true): Dataset[MediaRow] = {
    import spark.implicits._
    val rootPath = new org.apache.hadoop.fs.Path(mediaDir)
    val rootPrefix = rootPath
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
      .makeQualified(rootPath).toString + "/"
    if (checkIds) {
      val collisions = spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .option("recursiveFileLookup", "true") // a corpus is a TREE
        .load(mediaDir)
        .select(col("path"))
        .map(r => (docIdOf(r.getString(0), rootPrefix), r.getString(0)))
        .toDF("doc_id", "path")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n"),
          slice(sort_array(collect_list(col("path"))), 1, 4).as("paths"))
        .filter(col("n") > 1)
        .limit(5).collect()
      if (collisions.nonEmpty)
        throw new IllegalStateException(
          "ingestMediaDir: docId collisions — downstream joins/dedup " +
            "would silently merge distinct media. First collisions: " +
            collisions.map(r => s"id=${r.getLong(0)} <- " +
              r.getSeq[String](2).mkString(", ")).mkString("; ") +
            ". Rename the files or pass checkIds = false to accept.")
    }
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .option("recursiveFileLookup", "true")
      .load(mediaDir)
      .select(col("path"), col("length"), col("content"))
      .map { r =>
        val path = r.getString(0)
        val name = path.substring(path.lastIndexOf('/') + 1)
        val dot = name.lastIndexOf('.')
        val ext =
          if (dot < 0) "" else name.substring(dot + 1).toLowerCase
        MediaRow(
          MediaMeta(docIdOf(path, rootPrefix), r.getLong(1),
            MimeByExt.getOrElse(ext, "application/octet-stream")),
          r.getAs[Array[Byte]](2))
      }
  }

  /** The shared docId derivation: trailing stem digits, else a 60-bit
    * digest of the path RELATIVE to the qualified corpus root (falling
    * back to the bare name if the prefix unexpectedly differs). */
  private def docIdOf(path: String, rootPrefix: String): Long = {
    val rel =
      if (path.startsWith(rootPrefix)) path.substring(rootPrefix.length)
      else path.substring(path.lastIndexOf('/') + 1)
    val name = rel.substring(rel.lastIndexOf('/') + 1)
    val dot = name.lastIndexOf('.')
    val stem = if (dot < 0) name else name.substring(0, dot)
    val digits = stem.reverse.takeWhile(_.isDigit).reverse
    if (digits.nonEmpty && digits.length <= 18) digits.toLong
    else java.lang.Long.parseLong(
      md5Hex(rel.getBytes("UTF-8")).substring(0, 15), 16)
  }

  /** Metadata-only listing of a media directory — catalog/inventory
    * queries (counts, size histograms, shard audits) must never pay
    * for the payload bytes: this face selects only the file metadata,
    * and the binaryFile scan prunes `content` out of the read schema
    * entirely (spec-pinned) — a listing-speed scan over a petabyte of
    * media. */
  def mediaDirMeta(spark: SparkSession, mediaDir: String,
      glob: String = "*"): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .option("recursiveFileLookup", "true")
      .load(mediaDir)
      .select(col("path"), col("length"), col("modificationTime"))

  /** Directory ingest composed with the per-partition decode — files
    * in, features out, parse-or-degrade end to end. */
  def decodeMediaDir(spark: SparkSession, mediaDir: String,
      glob: String = "*",
      decoder: Decoder = ImageIoDecoder): Dataset[MediaFeatures] = {
    import spark.implicits._
    ingestMediaDir(spark, mediaDir, glob).mapPartitions(_.map(decoder.decode))
  }

  /** Oracle-checked face of the stub decode (column-expression twin of
    * StubDecoder so DuckDB can mirror it). */
  def mediaMetaQuery(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("n_bytes", length(col("text").cast("binary")).cast("long"))
      .withColumn("n_frames", expr("n_bytes div 256") + 1L)
      .withColumn("feature0", col("n_bytes") % 7)
      .withColumn("fingerprint", md5(col("text").cast("binary")))
      .select("doc_id", "n_bytes", "n_frames", "feature0", "fingerprint")
      .orderBy("doc_id")

  case class Frame(docId: Long, frameIdx: Long, frameBytes: Long, frameMd5: String)

  val FrameBytes = 64

  /** FRAME-SAMPLING (brief: "frame-sample" for video-like payloads):
    * every `every`-th 64-byte frame of each payload becomes its own
    * row — the 1→N flatMap a video pipeline runs before per-frame
    * featurization. Dataset face: mapPartitions (codec init amortized,
    * rows streamed); the oracle face below is its column-expression twin. */
  def sampleFrames(spark: SparkSession, dir: String,
      every: Int = 2): Dataset[Frame] = {
    import spark.implicits._
    mediaTable(spark, dir).mapPartitions(_.flatMap { row =>
      row.payload.grouped(FrameBytes).zipWithIndex
        .filter(_._2 % every == 0)
        .map { case (chunk, i) =>
          Frame(row.meta.docId, i.toLong, chunk.length.toLong, md5Hex(chunk))
        }
    })
  }

  /** Oracle-checked frame-sample twin: pure column expressions over the
    * text payload (ASCII corpus ⇒ 1 char = 1 byte), one Generate —
    * shuffle-free like every per-row multimodal op. */
  def frameSampleQuery(spark: SparkSession, dir: String, every: Int = 2): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("n_bytes", length(col("text")).cast("long"))
      // empty payloads emit NO frames (Spark's `div` truncates toward
      // zero, so (0-1) div 64 = 0 would fabricate a frame; the Dataset
      // face and DuckDB's flooring `//` both emit nothing)
      .filter(col("n_bytes") > 0)
      .withColumn("frame_idx",
        explode(sequence(lit(0L), expr(s"(n_bytes - 1) div $FrameBytes"), lit(every.toLong))))
      .withColumn("frame_text",
        expr(s"substr(text, CAST(1 + $FrameBytes * frame_idx AS INT), $FrameBytes)"))
      .withColumn("frame_bytes", length(col("frame_text")).cast("long"))
      .withColumn("frame_md5", md5(col("frame_text").cast("binary")))
      .select("doc_id", "frame_idx", "frame_bytes", "frame_md5")
      .orderBy("doc_id", "frame_idx")

  /** RESIZE (brief: thumbnail/resize step): deterministic byte-crop to
    * `target` bytes — the stub stand-in for a real image resize; the
    * plumbing (per-row transform of the payload, new payload + metadata
    * out) is the real part. */
  def resizeQuery(spark: SparkSession, dir: String, target: Int = 128): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("n_bytes", length(col("text")).cast("long"))
      .withColumn("resized", expr(s"substr(text, 1, $target)"))
      .withColumn("resized_bytes", length(col("resized")).cast("long"))
      .withColumn("resized_md5", md5(col("resized").cast("binary")))
      .select("doc_id", "n_bytes", "resized_bytes", "resized_md5")
      .orderBy("doc_id")
}
