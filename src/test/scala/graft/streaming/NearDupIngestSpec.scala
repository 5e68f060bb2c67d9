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

  test("a crash between the grams and postings appends converges on " +
    "replay to the crash-free artifact (advice r4)") {
    val base = Files.createTempDirectory("nd-crash").toString
    val clean = s"$base/clean"
    val crashed = s"$base/crashed"
    val b1 = Seq(
      (10L, "en", phrase("a") + " tail10"),
      (20L, "en", phrase("b") + " tail20")).toDF("doc_id", "lang", "text")
    val b2 = Seq(
      (30L, "en", phrase("c") + " tail30"),
      (31L, "en", phrase("a") + " tail31")).toDF("doc_id", "lang", "text")
    // reference run, no crash
    NearDupIngest.mergeBatch(spark, b1, clean)
    NearDupIngest.mergeBatch(spark, b2, clean)
    // crashed run: batch 2 dies between the two appends
    NearDupIngest.mergeBatch(spark, b1, crashed)
    intercept[RuntimeException] {
      NearDupIngest.mergeBatch(spark, b2, crashed,
        afterGramsAppend = () => throw new RuntimeException("boom"))
    }
    // the crash window is observable: doc 30 admitted in grams, its
    // postings missing — the exact state that used to become a
    // permanent false negative
    def ids(path: String): Seq[Long] = spark.read.parquet(path)
      .select("doc_id").distinct().as[Long].collect().sorted.toSeq
    assert(ids(s"$crashed/grams") == Seq(10L, 20L, 30L))
    assert(ids(s"$crashed/postings") == Seq(10L, 20L))
    // replay (Structured Streaming's recovery unit): appends ONLY the
    // missing postings; admitted=0 because grams saw the doc already
    val (ad, _) = NearDupIngest.mergeBatch(spark, b2, crashed)
    assert(ad == 0L, s"replay re-admitted $ad docs")
    for (sub <- Seq("grams", "postings"))
      assert(ids(s"$crashed/$sub") == ids(s"$clean/$sub"),
        s"$sub diverged from the crash-free run")
    // and the healed doc is a live near-dup source: a later near-dup of
    // doc 30 is rejected in both runs alike
    val b3 = Seq((50L, "en", phrase("c") + " tail50")).toDF("doc_id", "lang", "text")
    val r1 = NearDupIngest.mergeBatch(spark, b3, clean)
    val r2 = NearDupIngest.mergeBatch(spark, b3, crashed)
    assert(r1 == (0L, 1L) && r2 == (0L, 1L), s"post-heal screen: $r1 vs $r2")
  }

  test("repairArtifact re-derives missing postings from stored grams " +
    "when the crashed batch is never replayed") {
    val base = Files.createTempDirectory("nd-repair").toString
    val art = s"$base/art"
    val b1 = Seq(
      (10L, "en", phrase("a") + " tail10"),
      (20L, "en", phrase("b") + " tail20")).toDF("doc_id", "lang", "text")
    val b2 = Seq((30L, "en", phrase("c") + " tail30")).toDF("doc_id", "lang", "text")
    NearDupIngest.mergeBatch(spark, b1, art)
    intercept[RuntimeException] {
      NearDupIngest.mergeBatch(spark, b2, art,
        afterGramsAppend = () => throw new RuntimeException("boom"))
    }
    assert(NearDupIngest.repairArtifact(spark, art) == 1L)
    assert(NearDupIngest.repairArtifact(spark, art) == 0L, "repair not idempotent")
    // repaired postings are BIT-identical to the batch derivation: the
    // screen now rejects a near-dup of the once-orphaned doc
    val probe = Seq((50L, "en", phrase("c") + " tail50")).toDF("doc_id", "lang", "text")
    assert(NearDupIngest.mergeBatch(spark, probe, art) == (0L, 1L))
    assert(spark.read.parquet(s"$art/postings").count() == 3 * 4)
  }

  test("randomized trials: any batch split with random crash injection " +
    "+ replay converges to the one-shot artifact (seeded)") {
    val rnd = new scala.util.Random(11)
    val base = Files.createTempDirectory("nd-prop").toString
    def ids(path: String): Seq[Long] = spark.read.parquet(path)
      .select("doc_id").distinct().as[Long].collect().sorted.toSeq
    for (trial <- 0 until 3) {
      // corpus with planted near-dup groups: docs i and i+100 share a
      // phrase for even i, so rejections depend on arrival order of
      // within-group members — exactly what replay must keep stable
      val docs = (0 until 10).flatMap { i =>
        val tag = s"t${trial}_${i / 2}" // pairs share a tag
        Seq((i.toLong, "en", phrase(tag) + s" tail$i"))
      }
      val oneShot = s"$base/one$trial"
      // one-shot reference: a single batch admits one doc per tag group
      NearDupIngest.mergeBatch(spark,
        docs.toDF("doc_id", "lang", "text"), oneShot)

      // split delivery IN DOC-ID ORDER (streaming preserves source
      // order; the screen's keeper choice is order-sensitive by design)
      val split = s"$base/split$trial"
      val batches = docs.grouped(1 + rnd.nextInt(4)).toSeq
      batches.foreach { b =>
        val df = b.toDF("doc_id", "lang", "text")
        if (rnd.nextBoolean()) {
          // crash between the appends, then replay (streaming's
          // recovery unit) — must converge, not double-admit
          intercept[RuntimeException] {
            NearDupIngest.mergeBatch(spark, df, split,
              afterGramsAppend = () => throw new RuntimeException("boom"))
          }
          NearDupIngest.mergeBatch(spark, df, split)
        } else NearDupIngest.mergeBatch(spark, df, split)
      }
      for (sub <- Seq("grams", "postings"))
        assert(ids(s"$split/$sub") == ids(s"$oneShot/$sub"),
          s"trial $trial: $sub diverged (batches=${batches.map(_.map(_._1))})")
    }
  }

  test("compaction bounds the artifact's file count and changes no " +
    "screening result") {
    val base = Files.createTempDirectory("nd-compact").toString
    val art = s"$base/art"
    // 4 batches → 4 file sets per table
    for (i <- 0 until 4) {
      val b = Seq((100L + i, "en", phrase(s"t$i") + s" tail$i"))
        .toDF("doc_id", "lang", "text")
      NearDupIngest.mergeBatch(spark, b, art)
    }
    def parquetFiles(sub: String): Int = {
      val it = Files.walk(java.nio.file.Paths.get(s"$art/$sub")).iterator()
      var n = 0
      while (it.hasNext) if (it.next().toString.endsWith(".parquet")) n += 1
      n
    }
    val before = parquetFiles("grams")
    assert(before >= 4, s"expected >=4 pre-compaction grams files, got $before")
    // screening result to preserve: a near-dup of doc 102 is rejected
    val probe = Seq((200L, "en", phrase("t2") + " tailX")).toDF("doc_id", "lang", "text")
    // (screen WITHOUT admitting: measure, then compact, then re-measure)
    val preGrams = spark.read.parquet(s"$art/grams").collect().map(_.getLong(0)).toSet
    NearDupIngest.compactArtifact(spark, art, nFiles = 2)
    assert(parquetFiles("grams") <= 2, s"grams not compacted: ${parquetFiles("grams")}")
    assert(parquetFiles("postings") <= 2)
    assert(NearDupIngest.compactArtifact(spark, art, nFiles = 2).==(()),
      "re-compaction must be safe")
    val postGrams = spark.read.parquet(s"$art/grams").collect().map(_.getLong(0)).toSet
    assert(preGrams == postGrams, "compaction lost or invented docs")
    assert(NearDupIngest.mergeBatch(spark, probe, art) == (0L, 1L),
      "screening diverged after compaction")
  }

  test("soak: per-batch cost stays flat as the artifact grows (corpus " +
    "probes bounded by the batch's band keys and candidate ids — r7)") {
    val art = Files.createTempDirectory("nd-soak").toString + "/art"
    val nBatches = sys.env.getOrElse("SPARK_GRAFT_SOAK_BATCHES", "10").toInt
    val times = (0 until nBatches).map { b =>
      val docs = (0 until 20)
        .map(i => (b * 100L + i, "en", phrase(s"b${b}u$i") + s" t$i"))
        .toDF("doc_id", "lang", "text")
      val t0 = System.nanoTime()
      val (ad, rj) = NearDupIngest.mergeBatch(spark, docs, art)
      assert((ad, rj) == (20L, 0L), s"batch $b: ($ad, $rj)")
      (System.nanoTime() - t0) / 1e9
    }
    info(s"per-batch sec: ${times.map(t => f"$t%.2f").mkString(", ")}")
    val first = times.take(3).sorted.apply(1)
    val last = times.takeRight(3).sorted.apply(1)
    assert(last <= first * 3.0 + 0.5,
      s"per-batch cost grew with the artifact: first-3 median $first, " +
        s"last-3 median $last")
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
