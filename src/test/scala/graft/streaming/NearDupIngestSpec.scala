package graft.streaming

import graft.SparkSpec
import java.nio.file.Files

/** Screened near-dup ingestion: within-batch rejection, cross-batch
  * rejection against the growing artifact, replay idempotence, and the
  * checkpointed streaming face. */
class NearDupIngestSpec extends SparkSpec {

  import spark.implicits._

  private def phrase(tag: String) =
    (0 until 14).map(k => s"${tag}_$k").mkString(" ")

  test("within-batch and cross-batch near-dups are rejected; the " +
    "artifact grows by exactly the admitted docs; replay appends nothing") {
    val artifact = Files.createTempDirectory("nd-ingest").toString + "/art"

    // batch 1: two unique docs + an internal near-dup pair (30/31)
    val b1 = Seq(
      (10L, "en", phrase("a") + " tail10"),
      (20L, "en", phrase("b") + " tail20"),
      (30L, "en", phrase("c") + " tail30"),
      (31L, "en", phrase("c") + " tail31"))
      .toDF("doc_id", "lang", "text")
    val (ad1, rj1) = NearDupIngest.mergeBatch(spark, b1, artifact)
    assert((ad1, rj1) == (3L, 1L), s"batch 1: got ($ad1, $rj1)")
    assert(spark.read.parquet(s"$artifact/grams").count() == 3)

    // batch 2: one unique doc + a near-dup of batch 1's doc 10
    val b2 = Seq(
      (40L, "en", phrase("d") + " tail40"),
      (41L, "en", phrase("a") + " tail41"))
      .toDF("doc_id", "lang", "text")
    val (ad2, rj2) = NearDupIngest.mergeBatch(spark, b2, artifact)
    assert((ad2, rj2) == (1L, 1L), s"batch 2: got ($ad2, $rj2)")
    val ids = spark.read.parquet(s"$artifact/grams")
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(ids == Seq(10L, 20L, 30L, 40L), s"artifact ids: $ids")

    // verbatim replay of batch 2 (at-least-once): nothing appended; 41
    // is rejected again, and 40 is now rejected too — as an identity
    // match of its OWN earlier admission (the screen sees it in the
    // corpus), which is precisely the absorption that keeps the replay
    // a no-op
    val (ad3, rj3) = NearDupIngest.mergeBatch(spark, b2, artifact)
    assert(ad3 == 0L, s"replay appended $ad3 docs")
    assert(rj3 == 2L, s"replay rejections: $rj3")
    assert(spark.read.parquet(s"$artifact/grams").count() == 4)
    // postings stay aligned with grams (4 docs × 4 bands)
    assert(spark.read.parquet(s"$artifact/postings").count() == 16)
  }

  test("streaming ingest: screened corpus converges across two file " +
    "batches with a checkpointed restart") {
    val base = Files.createTempDirectory("nd-stream").toString
    val (src, art, ckpt) = (s"$base/src", s"$base/art", s"$base/ckpt")
    def doc(id: Long, text: String): String =
      s"""{"doc_id":$id,"text":"$text","lang":"en","source":"s"}"""
    def write(name: String, rows: Seq[String]): Unit = {
      Files.createDirectories(java.nio.file.Paths.get(src))
      java.nio.file.Files.write(java.nio.file.Paths.get(src, name),
        rows.mkString("\n").getBytes("UTF-8"))
    }

    write("b1.json", Seq(doc(1, phrase("x") + " t1"), doc(2, phrase("y") + " t2")))
    val q1 = NearDupIngest.ingest(spark, src, art, ckpt).start()
    q1.processAllAvailable(); q1.stop()
    assert(spark.read.parquet(s"$art/grams").count() == 2)

    // restart from checkpoint; second file has one dup of doc 1
    write("b2.json", Seq(doc(3, phrase("x") + " t3"), doc(4, phrase("z") + " t4")))
    val q2 = NearDupIngest.ingest(spark, src, art, ckpt).start()
    q2.processAllAvailable(); q2.stop()

    val ids = spark.read.parquet(s"$art/grams")
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(ids == Seq(1L, 2L, 4L), s"screened corpus ids: $ids")
  }
}
