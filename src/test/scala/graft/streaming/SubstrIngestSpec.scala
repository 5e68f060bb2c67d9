package graft.streaming

import graft.SparkSpec
import java.nio.file.Files

/** Screened exact-substring ingestion (r6 verdict #1/#4): within-batch
  * and cross-batch rejection, VERBATIM-REPLAY COUNT PARITY (the own-doc
  * exclusion — the r6 defect was each admitted doc matching its own
  * stored hashes on replay), (doc_id, h)-grain crash healing, bloom
  * crash-window safety, batch-split convergence, compaction identity,
  * the checkpointed streaming face, and the flat per-batch soak. */
class SubstrIngestSpec extends SparkSpec {

  import spark.implicits._

  /** 14 shared tokens + a distinct tail: two docs sharing a tag overlap
    * on 7 of their 8 positional 8-gram windows → dup_tokens 14 of 15 →
    * rejected (2·14 > 15); distinct tags share nothing. */
  private def phrase(tag: String) =
    (0 until 14).map(k => s"${tag}_$k").mkString(" ")

  private def doc(id: Long, tag: String) =
    (id, "en", phrase(tag) + s" tail$id")

  private def storeIds(store: String): Seq[Long] =
    spark.read.parquet(s"$store/grams")
      .select("doc_id").distinct().as[Long].collect().sorted.toSeq

  private def storeRows(store: String): Set[(Long, Long)] =
    spark.read.parquet(s"$store/grams")
      .as[(Long, Long)].collect().toSet

  test("within-batch and cross-batch duplicates are rejected; the store " +
    "grows by exactly the admitted docs; a verbatim replay appends " +
    "nothing AND re-derives the same rejections (own-doc exclusion)") {
    val store = Files.createTempDirectory("ss-ingest").toString + "/st"

    // batch 1: two unique docs + an internal dup pair (30 keeps, 31 out)
    val b1 = Seq(doc(10, "a"), doc(20, "b"), doc(30, "c"), doc(31, "c"))
      .toDF("doc_id", "lang", "text")
    assert(SubstrIngest.mergeBatch(spark, b1, store) == (3L, 1L))
    assert(storeIds(store) == Seq(10L, 20L, 30L))

    // batch 2: one unique + a dup of batch 1's doc 10
    val b2 = Seq(doc(40, "d"), doc(41, "a")).toDF("doc_id", "lang", "text")
    assert(SubstrIngest.mergeBatch(spark, b2, store) == (1L, 1L))
    assert(storeIds(store) == Seq(10L, 20L, 30L, 40L))

    // VERBATIM REPLAY (streaming's at-least-once unit): nothing appends,
    // and the rejection count REPRODUCES — doc 40's own stored hashes
    // must not score it as a duplicate of itself (fails on the r6 code,
    // which flipped (1,1) to (0,2) here)
    assert(SubstrIngest.mergeBatch(spark, b2, store) == (0L, 1L),
      "replay did not reproduce the original (admitted=0, rejected=1)")
    assert(storeIds(store) == Seq(10L, 20L, 30L, 40L))
  }

  test("within-batch ASYMMETRIC overlap is replay-stable: a lower-id " +
    "doc must not start matching its higher-id peer's stored hashes on " +
    "replay (batch-member exclusion, not just own-doc)") {
    val store = Files.createTempDirectory("ss-asym").toString + "/st"
    // X (id 1): the 14-token block + 12 fresh = 26 tokens; Y (id 2):
    // the same block + 16 fresh = 30 tokens. First run: X is the lower
    // id (dup 0); Y's 7 shared positions merge to one 14-token island,
    // 2·14 ≤ 30 — BOTH admitted. A replay must re-derive (0 appended,
    // 0 rejected); own-doc-only exclusion scored X against Y's stored
    // block (2·14 > 26) and flipped X to rejected.
    val x = (1L, "en",
      phrase("p") + " " + (0 until 12).map(k => s"xf$k").mkString(" "))
    val y = (2L, "en",
      phrase("p") + " " + (0 until 16).map(k => s"yf$k").mkString(" "))
    val b = Seq(x, y).toDF("doc_id", "lang", "text")
    assert(SubstrIngest.mergeBatch(spark, b, store) == (2L, 0L))
    assert(storeIds(store) == Seq(1L, 2L))
    assert(SubstrIngest.mergeBatch(spark, b, store) == (0L, 0L),
      "replay flipped a within-batch asymmetric-overlap verdict")
    val rep = SubstrIngest.screen(spark, b, store).collect()
    assert(rep.forall(!_.getBoolean(3)), s"screen rejects on replay: ${rep.toSeq}")
  }

  test("a batch peer's stored rows stay visible to HIGHER-id probers " +
    "(lower-id-peer convention across the store, r7 advice #2): a new " +
    "doc duplicating a stored peer's ORIGINAL text is rejected even " +
    "when that peer rides the same batch with changed text") {
    val store = Files.createTempDirectory("ss-peer").toString + "/st"
    // admit doc 100 with text A
    SubstrIngest.mergeBatch(spark,
      Seq(doc(100, "a")).toDF("doc_id", "lang", "text"), store)
    // batch: 100 re-delivered with CHANGED text (tag q — shares
    // nothing), plus NEW doc 200 duplicating 100's ORIGINAL text. The
    // r7 all-peers exclusion removed 100's stored "a" hashes from
    // every probe (100 is a batch member), and 100's new pos frame has
    // no "a" hashes either — 200 escaped both screens. Under the
    // lower-id-peer rule 100 < 200, so 100's stored rows stay visible
    // and 200 is rejected.
    val b = Seq(doc(100, "q"), doc(200, "a")).toDF("doc_id", "lang", "text")
    assert(SubstrIngest.mergeBatch(spark, b, store) == (1L, 1L),
      "new doc duplicating a re-delivered peer's stored text escaped")
    assert(storeIds(store) == Seq(100L))
    // replay stability holds with the visibility widened: 100's fresh
    // "q" hashes are now its own stored rows (own-doc: 100 < 100 is
    // false → excluded), 200 rejects again
    assert(SubstrIngest.mergeBatch(spark, b, store) == (0L, 1L),
      "replay flipped a verdict after the peer-visibility widening")
  }

  test("monotone-id arrival guard (r8 advice #2): a batch doc at or " +
    "below the store's max-id watermark bumps nonMonotoneArrivals — " +
    "detection only, verdicts unchanged — and monotone batches are " +
    "silent") {
    val store = Files.createTempDirectory("ss-mono").toString + "/st"
    val c0 = SubstrIngest.nonMonotoneArrivals.get()
    // monotone ingest: ids 10, 20 → watermark 20, no violation
    SubstrIngest.mergeBatch(spark,
      Seq(doc(10, "a"), doc(20, "b")).toDF("doc_id", "lang", "text"), store)
    assert(SubstrIngest.readMaxId(spark, store).contains(20L),
      "watermark not persisted at append")
    SubstrIngest.mergeBatch(spark,
      Seq(doc(30, "c")).toDF("doc_id", "lang", "text"), store)
    assert(SubstrIngest.nonMonotoneArrivals.get() == c0,
      "monotone batches must not count violations")
    assert(SubstrIngest.readMaxId(spark, store).contains(30L))
    // THE contract violation (the r8 advice scenario): a FRESH doc
    // below the watermark, batched with the re-delivery of the stored
    // doc it duplicates. The lower-id-peer rule makes fresh doc 15 the
    // canonical keeper of stored 20's text — it ADMITS, silently
    // leaving two stored copies; without the watermark guard this is
    // invisible. Both batch docs sit at/below watermark 30 → count +2.
    val b = Seq(doc(15, "b"), doc(20, "b")).toDF("doc_id", "lang", "text")
    assert(SubstrIngest.mergeBatch(spark, b, store) == (1L, 1L),
      "fresh low-id doc must admit under the lower-id-peer convention")
    assert(storeIds(store).contains(15L) && storeIds(store).contains(20L),
      "the silent two-copy corruption this guard exists to surface")
    assert(SubstrIngest.nonMonotoneArrivals.get() == c0 + 2,
      "sub-watermark arrivals were not counted")
    // the watermark never regresses
    assert(SubstrIngest.readMaxId(spark, store).contains(30L),
      "watermark regressed on a low-id append")
    // a verbatim replay also counts (legitimate, logged, same verdicts)
    assert(SubstrIngest.mergeBatch(spark, b, store) == (0L, 1L))
    assert(SubstrIngest.nonMonotoneArrivals.get() == c0 + 4)
  }

  test("watermark basis is the FULL batch (r9 advice #2): a batch whose " +
    "highest-id doc is REJECTED still advances the watermark, so later " +
    "sub-max arrivals are detected; and the composed-pipeline `admit` " +
    "face runs the same guard (r9 advice #1) with `arrivals` as its " +
    "watermark basis") {
    val store = Files.createTempDirectory("ss-wm").toString + "/st"
    val c0 = SubstrIngest.nonMonotoneArrivals.get()
    SubstrIngest.mergeBatch(spark,
      Seq(doc(10, "a")).toDF("doc_id", "lang", "text"), store)
    // doc 50 duplicates stored 10 → rejected, nothing appended; the
    // pre-r10 bump (max of `fresh`) left the watermark at 10 and a
    // later fresh doc 30 went undetected
    assert(SubstrIngest.mergeBatch(spark,
      Seq(doc(50, "a")).toDF("doc_id", "lang", "text"), store) == (0L, 1L))
    assert(SubstrIngest.readMaxId(spark, store).contains(50L),
      "a fully-rejected batch must still advance the watermark")
    assert(SubstrIngest.nonMonotoneArrivals.get() == c0)
    SubstrIngest.mergeBatch(spark,
      Seq(doc(30, "c")).toDF("doc_id", "lang", "text"), store)
    assert(SubstrIngest.nonMonotoneArrivals.get() == c0 + 1,
      "sub-max arrival after a rejected-high-id batch went undetected")

    // the admit face (composed pipeline's only path to this store):
    // guard fires on sub-watermark docs, and the watermark advances
    // from `arrivals` (the full post-door batch) even when the admitted
    // subset tops out lower — a screened-out high-id doc must not
    // leave the watermark stale
    val store2 = Files.createTempDirectory("ss-wm2").toString + "/st2"
    val full = Seq(doc(100, "x"), doc(200, "y"))
      .toDF("doc_id", "lang", "text")
    val survivors = full.filter($"doc_id" === 100L)
    assert(SubstrIngest.admit(spark, survivors, store2,
      arrivals = Some(full)) == 1L)
    assert(SubstrIngest.readMaxId(spark, store2).contains(200L),
      "admit must bump the watermark from arrivals, not the admitted subset")
    val c1 = SubstrIngest.nonMonotoneArrivals.get()
    SubstrIngest.admit(spark,
      Seq(doc(150, "z")).toDF("doc_id", "lang", "text"), store2)
    assert(SubstrIngest.nonMonotoneArrivals.get() == c1 + 1,
      "admit did not run the arrival-contract guard")
  }

  test("screen (the report face) is replay-stable: the same batch " +
    "screened before and after its own admission reports identical rows") {
    val store = Files.createTempDirectory("ss-screen").toString + "/st"
    SubstrIngest.mergeBatch(spark,
      Seq(doc(1, "x"), doc(2, "y")).toDF("doc_id", "lang", "text"), store)
    val b = Seq(doc(5, "z"), doc(6, "x")).toDF("doc_id", "lang", "text")
    val before = SubstrIngest.screen(spark, b, store).collect().toSeq
    SubstrIngest.mergeBatch(spark, b, store)
    val after = SubstrIngest.screen(spark, b, store).collect().toSeq
    assert(before == after,
      s"screen verdicts flipped after admission:\n$before\nvs\n$after")
    // and the verdicts are the expected ones: 6 duplicates 1, 5 is clean
    val rej = before.filter(_.getBoolean(3)).map(_.getLong(0))
    assert(rej == Seq(6L), s"rejected: $rej")
  }

  test("a crash between the bloom segment and the parquet append " +
    "converges on replay (bloom stays a harmless superset)") {
    val base = Files.createTempDirectory("ss-crash").toString
    val clean = s"$base/clean"
    val crashed = s"$base/crashed"
    val b1 = Seq(doc(10, "a"), doc(20, "b")).toDF("doc_id", "lang", "text")
    val b2 = Seq(doc(30, "c"), doc(31, "a")).toDF("doc_id", "lang", "text")
    SubstrIngest.mergeBatch(spark, b1, clean)
    SubstrIngest.mergeBatch(spark, b2, clean)
    SubstrIngest.mergeBatch(spark, b1, crashed)
    intercept[RuntimeException] {
      SubstrIngest.mergeBatch(spark, b2, crashed,
        afterBloomWrite = () => throw new RuntimeException("boom"))
    }
    // crash window observable: doc 30's bloom bits exist, its rows don't
    assert(storeIds(crashed) == Seq(10L, 20L))
    // replay heals: rows append, counts re-derive
    assert(SubstrIngest.mergeBatch(spark, b2, crashed) == (1L, 1L))
    assert(storeRows(crashed) == storeRows(clean),
      "crashed-then-replayed store diverged from the crash-free run")
    // the healed store screens like the clean one
    val probe = Seq(doc(50, "c")).toDF("doc_id", "lang", "text")
    assert(SubstrIngest.mergeBatch(spark, probe, clean) == (0L, 1L))
    assert(SubstrIngest.mergeBatch(spark, probe, crashed) == (0L, 1L))
  }

  test("(doc_id, h)-grain healing: a store holding only SOME of a doc's " +
    "hashes (partial append commit) is completed by the replay, never " +
    "permanently under-covered (advice r6)") {
    val base = Files.createTempDirectory("ss-partial").toString
    val clean = s"$base/clean"
    val partial = s"$base/partial"
    val b = Seq(doc(10, "a"), doc(20, "b")).toDF("doc_id", "lang", "text")
    SubstrIngest.mergeBatch(spark, b, clean)
    // fabricate the crash artifact: same store minus half of doc 20's
    // rows (a torn append that committed some task files only)
    val rows = spark.read.parquet(s"$clean/grams").as[(Long, Long)]
      .collect().sortBy(r => (r._1, r._2))
    val doc20 = rows.filter(_._1 == 20L)
    val torn = rows.filter(_._1 != 20L) ++ doc20.take(doc20.length / 2)
    torn.toSeq.toDF("doc_id", "h")
      .write.parquet(s"$partial/grams")
    // bloom for the partial store (the migration segment would cover it
    // anyway; building it explicitly keeps the test on the heal path)
    SubstrIngest.compactStore(spark, partial)
    // replay the batch: ONLY the missing rows of doc 20 append
    val (ad, _) = SubstrIngest.mergeBatch(spark, b, partial)
    assert(ad == 1L, s"heal replay admitted $ad docs (want doc 20 only)")
    assert(storeRows(partial) == storeRows(clean),
      "partial store not healed to the crash-free rows")
    // and a later duplicate of doc 20 is now caught
    val probe = Seq(doc(60, "b")).toDF("doc_id", "lang", "text")
    assert(SubstrIngest.mergeBatch(spark, probe, partial) == (0L, 1L))
  }

  test("randomized trials: any batch split with crash injection + " +
    "replay converges to the one-shot store (seeded)") {
    val rnd = new scala.util.Random(7)
    val base = Files.createTempDirectory("ss-prop").toString
    for (trial <- 0 until 3) {
      // planted dup groups: even/odd id pairs share a tag, so keeper
      // choice depends on delivery order — what replay must keep stable
      val docs = (0 until 10).map(i => doc(i.toLong, s"t${trial}_${i / 2}"))
      val oneShot = s"$base/one$trial"
      SubstrIngest.mergeBatch(spark,
        docs.toDF("doc_id", "lang", "text"), oneShot)
      val split = s"$base/split$trial"
      val batches = docs.grouped(1 + rnd.nextInt(4)).toSeq
      batches.foreach { g =>
        val df = g.toDF("doc_id", "lang", "text")
        if (rnd.nextBoolean()) {
          intercept[RuntimeException] {
            SubstrIngest.mergeBatch(spark, df, split,
              afterBloomWrite = () => throw new RuntimeException("boom"))
          }
          SubstrIngest.mergeBatch(spark, df, split)
        } else SubstrIngest.mergeBatch(spark, df, split)
      }
      assert(storeRows(split) == storeRows(oneShot),
        s"trial $trial diverged (batches=${batches.map(_.map(_._1))})")
    }
  }

  test("compaction bounds the store's file count, rebuilds ONE covering " +
    "bloom segment, and changes no screening result") {
    val base = Files.createTempDirectory("ss-compact").toString
    val store = s"$base/st"
    for (i <- 0 until 4)
      SubstrIngest.mergeBatch(spark,
        Seq(doc(100L + i, s"t$i")).toDF("doc_id", "lang", "text"), store)
    def files(sub: String, suffix: String): Int = {
      val it = Files.walk(java.nio.file.Paths.get(s"$store/$sub")).iterator()
      var n = 0
      while (it.hasNext) if (it.next().toString.endsWith(suffix)) n += 1
      n
    }
    assert(files("grams", ".parquet") >= 4)
    assert(files("bloom", ".bf") == 4)
    val pre = storeRows(store)
    SubstrIngest.compactStore(spark, store, nFiles = 2)
    assert(files("grams", ".parquet") <= 2)
    assert(files("bloom", ".bf") == 1, "bloom segments not merged")
    assert(storeRows(store) == pre, "compaction lost or invented rows")
    // screening result preserved: a dup of doc 102 is still rejected
    val probe = Seq(doc(200, "t2")).toDF("doc_id", "lang", "text")
    assert(SubstrIngest.mergeBatch(spark, probe, store) == (0L, 1L))
  }

  test("streaming ingest: screened store converges across two file " +
    "batches with a checkpointed restart") {
    val base = Files.createTempDirectory("ss-stream").toString
    val (src, store, ckpt) = (s"$base/src", s"$base/st", s"$base/ckpt")
    def json(id: Long, tag: String): String =
      s"""{"doc_id":$id,"text":"${phrase(tag)} tail$id","lang":"en","source":"s"}"""
    def write(name: String, rows: Seq[String]): Unit = {
      Files.createDirectories(java.nio.file.Paths.get(src))
      Files.write(java.nio.file.Paths.get(src, name),
        rows.mkString("\n").getBytes("UTF-8"))
      ()
    }
    write("b1.json", Seq(json(1, "x"), json(2, "y")))
    val q1 = SubstrIngest.ingest(spark, src, store, ckpt).start()
    q1.processAllAvailable(); q1.stop()
    assert(storeIds(store) == Seq(1L, 2L))
    write("b2.json", Seq(json(3, "x"), json(4, "z")))
    val q2 = SubstrIngest.ingest(spark, src, store, ckpt).start()
    q2.processAllAvailable(); q2.stop()
    assert(storeIds(store) == Seq(1L, 2L, 4L))
  }

  test("soak: per-batch cost stays flat as the store grows (the bloom " +
    "pre-screen keeps fresh batches off the store entirely)") {
    val store = Files.createTempDirectory("ss-soak").toString + "/st"
    val nBatches = sys.env.getOrElse("SPARK_GRAFT_SOAK_BATCHES", "10").toInt
    val times = (0 until nBatches).map { b =>
      val docs = (0 until 20)
        .map(i => doc(b * 100L + i, s"b${b}_u$i"))
        .toDF("doc_id", "lang", "text")
      val t0 = System.nanoTime()
      val (ad, rj) = SubstrIngest.mergeBatch(spark, docs, store)
      assert((ad, rj) == (20L, 0L), s"batch $b: ($ad, $rj)")
      (System.nanoTime() - t0) / 1e9
    }
    info(s"per-batch sec: ${times.map(t => f"$t%.2f").mkString(", ")}")
    val first = times.take(3).sorted.apply(1)
    val last = times.takeRight(3).sorted.apply(1)
    assert(last <= first * 3.0 + 0.5,
      s"per-batch cost grew with the store: first-3 median $first, " +
        s"last-3 median $last")
  }

  test("store probe survives the >IsinThreshold candidate path after " +
    "the bloom broadcast is destroyed (r11: PipeBench at the sf10 store " +
    "crashed on the constraint-resurrected pre-screen UDF)") {
    // The failure mechanism: the bloom pre-screen filter, if
    // DETERMINISTIC, enters the plan's constraint set; localCheckpoint
    // preserves origin constraints on the pinned candidate frame; the
    // nCand > IsinThreshold semi-join then lets
    // InferFiltersFromConstraints re-materialize the UDF on the store
    // side AFTER the broadcast was destroyed -> INTERNAL_ERROR_BROADCAST.
    // This spec drives the real probe through that exact path: a store
    // whose bloom passes > IsinThreshold batch hashes.
    val store = Files.createTempDirectory("ss-bcfix").toString + "/st"
    def wideDoc(id: Long, tag: String) =
      (id, "en", (0 until 120).map(j => s"${tag}_$j").mkString(" "))
    // 40 unique 120-token docs: ~113 hashes each, ~4520 distinct total
    val b1 = (0L until 40L).map(i => wideDoc(i, s"u$i"))
      .toDF("doc_id", "lang", "text")
    val (ad, rj) = SubstrIngest.mergeBatch(spark, b1, store)
    assert((ad, rj) == (40L, 0L))
    // batch 2 = the same texts under fresh higher ids: every hash is a
    // TRUE bloom hit, so the candidate set crosses IsinThreshold and
    // the probe takes the broadcast-join path
    val b2 = (0L until 40L).map(i => wideDoc(1000L + i, s"u$i"))
      .toDF("doc_id", "lang", "text")
    val bp = SubstrIngest.probe(spark, b2, store)
    val nCand = bp.pos.select("h").distinct().count()
    assert(nCand > SubstrIngest.IsinThreshold,
      s"spec must exercise the join path, got $nCand candidates")
    // the probe is COMPLETE for the batch hashes: every stored twin row
    // surfaces (40 docs x ~113 hashes), and consuming the pinned frame
    // through a further join (the admission anti-join shape) stays
    // healthy post-destroy
    assert(bp.storeHits.count() == b1.count() * 113L,
      "probe must return every stored twin row")
    val fresh = bp.pos.select("doc_id", "h").distinct()
      .join(bp.storeHits, Seq("doc_id", "h"), "left_anti").count()
    assert(fresh == 40L * 113L) // same hashes, different doc_ids
  }
}
