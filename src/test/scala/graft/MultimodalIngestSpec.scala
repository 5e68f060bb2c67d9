package graft

import graft.operators.MultimodalOps
import graft.operators.MultimodalOps.{ImageIoDecoder, MediaMeta, MediaRow, StubDecoder}
import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import java.nio.file.{Files, Path}
import javax.imageio.ImageIO

/** File-directory media ingest over Spark's built-in `binaryFile`
  * source: a directory of real image files flows into the same
  * MediaRow → decode pipeline as the columnar media table —
  * ids/types/sizes from file metadata, glob pruning at the listing,
  * content pruned from metadata-only scans, and parse-or-degrade
  * decode end to end. */
class MultimodalIngestSpec extends SparkSpec {

  private def encode(img: BufferedImage, fmt: String): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    require(ImageIO.write(img, fmt, out), s"JDK cannot encode $fmt")
    out.toByteArray
  }

  // the MultimodalDecodeSpec 2×2 raster: black, white, red, mid-gray
  private def raster: BufferedImage = {
    val img = new BufferedImage(2, 2, BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, 0x000000); img.setRGB(1, 0, 0xffffff)
    img.setRGB(0, 1, 0xff0000); img.setRGB(1, 1, 0x808080)
    img
  }

  /** media dir fixture: two encodings of the raster, a text file, and
    * an extensionless file (hash-id path). */
  private def mediaDir: Path = {
    val dir = Files.createTempDirectory("mm-ingest")
    Files.write(dir.resolve("img_7.png"), encode(raster, "png"))
    Files.write(dir.resolve("img_8.bmp"), encode(raster, "bmp"))
    Files.write(dir.resolve("notes_9.txt"), "not an image".getBytes("UTF-8"))
    Files.write(dir.resolve("README"), "extensionless".getBytes("UTF-8"))
    dir
  }

  test("directory files land as MediaRows: digit-stem doc ids, MIME " +
    "from extension, exact byte counts, stable hash id without digits") {
    val dir = mediaDir
    val rows = MultimodalOps.ingestMediaDir(spark, dir.toString)
      .collect().map(r => r.meta.docId -> r).toMap
    assert(rows.size == 4)
    assert(rows(7L).meta.contentType == "image/png")
    assert(rows(8L).meta.contentType == "image/bmp")
    assert(rows(9L).meta.contentType == "text/plain")
    for (id <- Seq(7L, 8L, 9L)) {
      assert(rows(id).meta.nBytes == rows(id).payload.length.toLong)
    }
    assert(rows(7L).payload.sameElements(encode(raster, "png")))
    // the extensionless file gets the 60-bit name digest, reproducibly
    val hashId = java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest("README".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 15), 16)
    assert(rows.contains(hashId), s"hash id $hashId missing: ${rows.keys}")
    assert(rows(hashId).meta.contentType == "application/octet-stream")
  }

  test("glob prunes at the listing: *.png ingests exactly the png, and " +
    "the decode pipeline produces the SAME features as the columnar face") {
    val dir = mediaDir
    val only = MultimodalOps.ingestMediaDir(spark, dir.toString, "*.png")
      .collect()
    assert(only.map(_.meta.docId).toSeq == Seq(7L))
    // end-to-end decode: real pixels for the images, degrade for text
    val feats = MultimodalOps.decodeMediaDir(spark, dir.toString, "img_*")
      .collect().map(f => f.docId -> f).toMap
    assert(feats.size == 2)
    val direct = ImageIoDecoder.decode(MediaRow(
      MediaMeta(7L, encode(raster, "png").length.toLong, "image/png"),
      encode(raster, "png")))
    assert(feats(7L) == direct,
      "directory decode diverged from decoding the same bytes directly")
    // png vs bmp of one raster: same content fingerprint through ingest
    assert(feats(7L).fingerprint == feats(8L).fingerprint)
    val textFeats = MultimodalOps.decodeMediaDir(spark, dir.toString, "*.txt")
      .collect()
    val stubTwin = StubDecoder.decode(MediaRow(
      MediaMeta(9L, 12L, "text/plain"), "not an image".getBytes("UTF-8")))
    assert(textFeats.toSeq == Seq(stubTwin),
      "non-image file must take the degrade path")
  }

  test("docId collisions fail loudly instead of silently merging " +
    "distinct media (advice r6); subdirectory shards hash apart") {
    val dir = Files.createTempDirectory("mm-collide")
    Files.write(dir.resolve("img_0042.png"), encode(raster, "png"))
    Files.write(dir.resolve("doc_0042.txt"), "same digits".getBytes("UTF-8"))
    val e = intercept[IllegalStateException] {
      MultimodalOps.ingestMediaDir(spark, dir.toString)
    }
    assert(e.getMessage.contains("img_0042.png")
      && e.getMessage.contains("doc_0042.txt"), e.getMessage)
    // the opt-out still ingests (caller owns the naming convention)
    assert(MultimodalOps.ingestMediaDir(spark, dir.toString,
      checkIds = false).count() == 2)

    // same extensionless NAME in two shard dirs: root-relative hashing
    // keeps them distinct (the bare-name digest merged them)
    val sharded = Files.createTempDirectory("mm-shards")
    Files.createDirectories(sharded.resolve("s1"))
    Files.createDirectories(sharded.resolve("s2"))
    Files.write(sharded.resolve("s1/README"), "a".getBytes("UTF-8"))
    Files.write(sharded.resolve("s2/README"), "b".getBytes("UTF-8"))
    val ids = MultimodalOps.ingestMediaDir(spark, sharded.toString)
      .collect().map(_.meta.docId).toSet
    assert(ids.size == 2, s"shard README ids collided: $ids")
  }

  test("metadata-only listing prunes `content` from the binaryFile scan") {
    val dir = mediaDir
    val df = MultimodalOps.mediaDirMeta(spark, dir.toString)
    val read = df.queryExecution.executedPlan.toString.linesIterator
      .find(_.contains("ReadSchema"))
      .getOrElse(fail("no scan in plan"))
    assert(!read.contains("content"),
      s"metadata listing reads payload bytes: $read")
    assert(df.count() == 4)
  }
}
