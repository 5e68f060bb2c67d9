package graft.streaming

import graft.operators.TextOps
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}
import org.apache.spark.util.sketch.BloomFilter

/** Streaming EXACT-SUBSTRING screening — the ingest face of
  * `doc_substring_dedup` and the deployment shape of Lee et al. 2022 at
  * scale: documents arrive continuously, each batch's positional K-gram
  * hashes are checked against the PERSISTED hash store of everything
  * admitted so far (and against lower-id documents in the same batch),
  * duplicated positions merge into maximal spans, and a document whose
  * duplicated-token mass exceeds half its length is rejected. Admitted
  * documents' distinct (doc_id, h) rows append to the store, which
  * therefore grows by exactly the admitted text.
  *
  * The gate is INTEGER-EXACT: reject iff 2·dup_tokens > n_tokens — no
  * float threshold to drift. Within a batch the keeper convention is
  * LOWER doc_id wins: a position is duplicated iff a lower-id PEER in
  * the same batch holds the same hash — regardless of whether that
  * peer is itself admitted (the convention every dedup tier shares);
  * across batches a stored hash counts unless it belongs to a batch
  * peer with id ≥ the probing doc — the SAME lower-id-peer convention
  * carried uniformly across the store (r8, closing r7 advice #2; the
  * r7 all-members exclusion let a duplicate escape when its stored
  * peer rode the same batch with changed text). Replays after ANY
  * prefix of the admissions re-derive the SAME verdicts: a lower-id
  * peer's freshly stored rows are subsumed by the within-batch rule,
  * and a higher-id peer's stay excluded — which is where the r6
  * instability lived (own-doc exclusion alone let a replayed lower-id
  * doc match its higher-id batch peer's freshly stored hashes and
  * flip a mass-based verdict). See crossDupPos for the proof sketch
  * and the monotone-id arrival contract on mergeBatch.
  *
  * Replay/crash safety is per-ROW idempotence: fresh hashes anti-join
  * the store at (doc_id, h) granularity, so a verbatim replay appends
  * nothing and a batch whose append crashed mid-write (some of a doc's
  * hashes committed, the rest not) converges on replay by appending
  * exactly the missing rows — never permanently under-covering a text
  * (advice r6). The bloom segment for a batch is written BEFORE its
  * parquet rows, so a crash between the two leaves the bloom a strict
  * superset of the store — false positives fall to the exact confirm;
  * false negatives (which would admit duplicates) cannot occur.
  *
  * COST BOUND (r6 verdict #4): the store is probed ONCE per batch and
  * never fully scanned in the steady state. Each append also writes a
  * fixed-parameter bloom segment of its hashes; the batch's distinct
  * hashes screen against the merged bloom (driver state = one bounded
  * bit array), and only bloom-positive candidates reach the exact
  * probe — pushed as an `h IN (...)` literal filter when the candidate
  * set is small (the store is range-laid on h by `compactStore`, so
  * parquet min/max stats skip non-matching files/row-groups), falling
  * back to a broadcast semi-join (one store scan, never shuffled) past
  * the literal threshold. The probe result serves BOTH the cross-dup
  * screen and the append's (doc_id, h) anti-join. A batch of entirely
  * fresh text — the steady state — touches ZERO store bytes.
  * SubstrIngestSpec's soak records the flat per-batch cost.
  *
  * Store growth is one parquet file set + one bloom segment per batch;
  * `compactStore` rewrites both into bounded counts via the shared
  * StagedSwap discipline. */
object SubstrIngest {

  /** Fixed bloom parameters — shared via BloomSide so segments merge. */
  val BloomExpected: Long = BloomSide.Expected
  val BloomFpp: Double = BloomSide.Fpp

  /** Candidate-hash count up to which the exact probe is pushed as
    * literals into the store scan (file/row-group skipping on the
    * range-laid store); larger sets fall back to a broadcast
    * semi-join. */
  val IsinThreshold: Int = 4096

  private def dirExists(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(p) && fs.listStatus(p).exists(_.getPath.getName.endsWith(".parquet"))
  }

  private def bloomDir(store: String) = s"$store/bloom"

  /** JVM-local detectability counter for MONOTONE-ID ARRIVAL CONTRACT
    * violations (r8 advice: the contract was documented but a violating
    * source produced no signal — two silently stored copies). Counts
    * distinct batch docs arriving at `mergeBatch` with doc_id ≤ the
    * store's persisted max-id watermark. Re-deliveries of stored ids
    * land here too (crash-replay is legitimate), as does a
    * forget-then-reingest of the same doc_id, so nonzero during
    * recovery or doc replacement is expected; a count that GROWS on a
    * healthy source means
    * the source assigns ids non-monotonically and the lower-id-peer
    * convention may be keeping duplicate copies — remap ids at ingest. */
  val nonMonotoneArrivals = new java.util.concurrent.atomic.AtomicLong(0)

  private def maxIdPath(store: String) =
    new org.apache.hadoop.fs.Path(s"$store/_maxid")

  private[streaming] def readMaxId(spark: SparkSession,
      store: String): Option[Long] = {
    val p = maxIdPath(store)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return None
    scala.util.Try {
      val in = fs.open(p)
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim.toLong
      finally in.close()
    }.toOption // a torn write parses as absent: the guard degrades to
               // silent for one batch, never to a wrong violation count
  }

  /** Monotone bump of the store's max-id watermark (metric state only —
    * no admission decision reads it, so a crash that loses one bump
    * merely under-detects for a batch). Tmp-then-rename keeps readers
    * off partially written bytes on a local FS. */
  private def bumpMaxId(spark: SparkSession, store: String,
      batchMax: Long): Unit = {
    val cur = readMaxId(spark, store)
    if (cur.exists(_ >= batchMax)) return
    val p = maxIdPath(store)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new org.apache.hadoop.fs.Path(s"$store/_maxid.tmp")
    val out = fs.create(tmp, true)
    try out.write(batchMax.toString.getBytes("UTF-8")) finally out.close()
    if (fs.exists(p)) fs.delete(p, false)
    fs.rename(tmp, p)
    ()
  }

  /** The arrival-contract guard (r8 advice, lifted to a shared helper in
    * r10 per r9 ADVICE #1): one tiny agg over the small batch side, zero
    * store bytes — docs at or below the persisted max-id watermark are
    * counted in `nonMonotoneArrivals` + logged, never rejected (a
    * replayed stored id is legitimate and indistinguishable here from a
    * genuinely fresh low-id doc). Runs on BOTH admission faces: the
    * standalone `mergeBatch` AND the composed-pipeline `admit` path,
    * which previously maintained the watermark but never checked against
    * it — the detection claim was inert on the primary production path. */
  private[streaming] def checkArrivalContract(spark: SparkSession,
      docs: DataFrame, store: String): Long =
    readMaxId(spark, store).map { w =>
      val low = docs.filter(col("doc_id") <= w)
        .select("doc_id").distinct().count()
      if (low > 0) {
        nonMonotoneArrivals.addAndGet(low)
        org.slf4j.LoggerFactory.getLogger(getClass).warn(
          s"SubstrIngest: $low batch doc(s) at or below the store " +
          s"max-id watermark $w — crash-replay, or a non-monotone " +
          "source violating the arrival contract (see mergeBatch doc)")
      }
      low
    }.getOrElse(0L)

  private def readBloom(spark: SparkSession, store: String): Option[BloomFilter] =
    BloomSide.read(spark, bloomDir(store))

  private def writeBloomSegment(spark: SparkSession, store: String,
      bloom: BloomFilter): Unit =
    BloomSide.writeSegment(spark, bloomDir(store), bloom)

  /** Resume an interrupted stage→live swap (compactStore's `.stage`,
    * the composed pipeline's `.forget`) BEFORE any live-dir existence
    * probe — StagedSwap's contract: probing first silently no-ops on a
    * mid-swap store, the screen degrades to within-batch, duplicates
    * are admitted, and a later clearStale would drop the only copy. */
  private def resumeSwaps(spark: SparkSession, store: String): Unit = {
    val live = s"$store/grams"
    StagedSwap.resume(spark, live, Seq(s"$live.stage", s"$live.forget"))
    ()
  }

  /** ONE bounded store probe per batch: every stored (doc_id, h) row
    * whose hash appears in the pinned batch gram frame — EXACT and
    * COMPLETE for the batch's hashes (the bloom can only over-select),
    * so it serves both the cross-dup screen and the append anti-join.
    * Empty frame (zero store bytes read) when the bloom clears the
    * whole batch. Result is localCheckpointed: two consumers. */
  private def probeStore(spark: SparkSession, pos: DataFrame,
      store: String): DataFrame = {
    resumeSwaps(spark, store)
    val live = s"$store/grams"
    val empty = pos.select("doc_id", "h").limit(0).localCheckpoint(true)
    if (!dirExists(spark, live)) return empty
    val batchH0 = pos.select("h").distinct()
    // broadcast destroyed once the candidate set is pinned — GC-driven
    // cleanup leaks a filter per batch at production triggers (r8 advice)
    val bcOpt = readBloom(spark, store)
      .map(spark.sparkContext.broadcast(_))
    val batchH = bcOpt match {
      case Some(bc) =>
        // the one-UDF bloom idiom (TextOps.contaminationBloom):
        // might_contain has no public Column form.
        // asNondeterministic (r11, found by PipeBench at the sf10
        // store): a DETERMINISTIC filter becomes a plan CONSTRAINT,
        // and Dataset.localCheckpoint preserves origin constraints on
        // its LogicalRDD — so InferFiltersFromConstraints RESURRECTS
        // this UDF on the other side of any later equi-join against
        // the pinned frame (measured: inferred onto the store scan of
        // the nCand>threshold semi-join), serializing the by-then
        // DESTROYED broadcast → INTERNAL_ERROR_BROADCAST. The
        // nondeterministic mark keeps the filter where it is written,
        // out of the constraint set (also shedding the inferred
        // per-store-row bloom evaluation, a pure pessimization —
        // over-selection is the screen's contract either way).
        val might = udf((h: Long) => bc.value.mightContainLong(h))
          .asNondeterministic()
        batchH0.filter(might(col("h")))
      case None => batchH0 // pre-bloom store: no pre-screen
    }
    val cand = batchH.localCheckpoint(true)
    val nCand = cand.count()
    bcOpt.foreach(_.destroy())
    if (nCand == 0) return empty // fresh batch: store never read
    val storeRows = spark.read.parquet(live)
    val hits =
      if (nCand <= IsinThreshold) {
        val hs = cand.collect().map(_.getLong(0))
        // literal IN filter → parquet min/max skipping on the
        // range-laid store
        storeRows.filter(col("h").isin(hs: _*))
      } else
        storeRows.join(broadcast(cand), Seq("h"), "left_semi")
    hits.select("doc_id", "h").localCheckpoint(true)
  }

  /** Cross-store duplicated positions: a batch position of doc `d` is
    * duplicated iff a stored row holds its hash under a doc that is NOT
    * a batch peer with id ≥ d — i.e. a batch peer's stored rows stay
    * visible exactly when that peer's id is LOWER than the probing
    * doc's, the same lower-id-peer convention the within-batch rule
    * uses, now carried uniformly across the store (r7 ADVICE #2; the
    * r7 all-peers exclusion let a higher-id doc escape when a stored
    * peer was re-delivered with CHANGED text, its old hashes excluded
    * from everyone's probe).
    *
    * Replay stability (the r6 defect this rule must not reopen): rows a
    * crashed partial admission stored mid-batch belong to peers whose
    * pos frame holds the same hashes in THIS batch, so for any probing
    * doc d a lower-id peer's mid-batch rows are already marked by the
    * within-batch rule (batchMin ≤ peer < d) — visibility adds nothing
    * — and a HIGHER-id peer's mid-batch rows remain excluded, which is
    * where the r6 instability lived. Verdicts are therefore identical
    * across replays after any admission prefix.
    *
    * Arrival-model caveat (detected, not enforced — see
    * `nonMonotoneArrivals`): if a NEW doc
    * arrives with an id LOWER than a stored doc it duplicates (batched
    * together with that doc's re-delivery), the lower-id-peer
    * convention admits the new doc — it is the convention's canonical
    * keeper — leaving both copies stored. Under the monotone-id
    * arrival contract (`mergeBatch` scaladoc) stored ids are always
    * below fresh ids and the case cannot arise. */
  private def crossDupPos(pos: DataFrame, storeHits: DataFrame): DataFrame = {
    val batchIds = pos.select(col("doc_id").as("store_doc")).distinct()
      .withColumn("in_batch", lit(true))
    pos.join(
        storeHits.select(col("h"), col("doc_id").as("store_doc"))
          .join(batchIds, Seq("store_doc"), "left"),
        Seq("h"))
      .filter(col("in_batch").isNull || col("store_doc") < col("doc_id"))
      .select("doc_id", "pos")
  }

  /** Screen one batch and admit its clean documents' hashes. Returns
    * (admitted, rejected) doc counts — admitted counts docs whose
    * hashes were actually appended (0 on a verbatim replay; a
    * crash-healing replay re-counts the doc whose rows it completes).
    * `afterBloomWrite` is the crash-injection hook between the bloom
    * segment and the parquet append (spec use).
    *
    * MONOTONE-ID ARRIVAL CONTRACT: fresh documents carry ids above
    * every stored id (re-deliveries of stored ids are fine — that is
    * what replay stability covers). The lower-id-peer convention makes
    * the LOWEST id the canonical keeper of a duplicate set; a fresh doc
    * arriving BELOW a stored duplicate is by convention the keeper and
    * is admitted (see crossDupPos), leaving two stored copies. Sources
    * that assign ids non-monotonically should remap at ingest (the
    * synthetic feeds and every spec honor the contract). Violations are
    * DETECTED, not rejected: each batch's ids are checked against the
    * store's persisted max-id watermark (`_maxid`, maintained at append
    * time) and sub-watermark arrivals are counted in
    * `nonMonotoneArrivals` + logged — r8 advice; a rejecting guard is
    * impossible here because a crash-replay legitimately re-delivers
    * stored ids. */
  def mergeBatch(spark: SparkSession, batch: DataFrame, store: String,
      k: Int = TextOps.SubstrK,
      afterBloomWrite: () => Unit = () => ()): (Long, Long) = {
    val live = s"$store/grams"
    checkArrivalContract(spark, batch, store)
    // several passes consume the batch's gram derivation — pin it once
    // (localCheckpoint, not cache(): nothing leaks across batches)
    val pos = TextOps.substrPosFrame(batch, k).localCheckpoint(true)
    val nTok = batch.select(col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("n_tokens"))
    // within-batch: a position is duplicated iff a LOWER doc_id in the
    // batch holds the same hash (lower-id-peer convention, admission
    // of the peer irrelevant)
    val batchMin = pos.groupBy("h").agg(min(col("doc_id")).as("mn"))
    val withinDup = pos.join(batchMin, "h")
      .filter(col("doc_id") > col("mn"))
      .select("doc_id", "pos")
    val storeHits = probeStore(spark, pos, store)
    val dupPos = withinDup.union(crossDupPos(pos, storeHits)).distinct()
    val rejects = TextOps.substrIslands(dupPos, k)
      .join(nTok, "doc_id")
      .filter(col("dup_tokens") * 2 > col("n_tokens"))
      .select("doc_id")
      .localCheckpoint(true)
    val nRejected = rejects.count()
    // admitted docs' DISTINCT hashes; anti-join at (doc_id, h)
    // granularity — against the probe result, which is complete for
    // the batch's hashes — so a replay appends only genuinely missing
    // rows, including the tail of a partially-committed crash append
    val admitted = pos.join(rejects, Seq("doc_id"), "left_anti")
      .select("doc_id", "h").distinct()
    val fresh = admitted.join(storeHits, Seq("doc_id", "h"), "left_anti")
      .localCheckpoint(true)
    val nAdmitted = appendFresh(spark, store, fresh, afterBloomWrite,
      batchMaxId(batch))
    (nAdmitted, nRejected)
  }

  /** Arrival bookkeeping WITHOUT an admission — the zero-survivor path
    * of the composed pipeline (r10 review: the guard + watermark calls
    * lived inside its `if (nAdmitted > 0)` block, so a batch whose
    * docs were ALL screened out still left the watermark stale and the
    * contract unchecked — the exact standalone-face scenario
    * SubstrIngestSpec pins, persisting on the composed face). Runs the
    * contract guard and advances the watermark from the full arrival
    * frame; with no rows to append, the bump-after-rows ordering is
    * vacuous here. */
  def recordArrivals(spark: SparkSession, arrivals: DataFrame,
      store: String): Unit = {
    checkArrivalContract(spark, arrivals, store)
    batchMaxId(arrivals).foreach(bumpMaxId(spark, store, _))
  }

  /** Max doc_id of the FULL batch (rejected and replayed docs included)
    * — the watermark basis. r9 ADVICE #2: bumping from `fresh` (rows
    * actually appended) left the watermark stale whenever a batch's
    * highest-id docs were rejected or fully replayed, so later sub-max
    * arrivals went undetected — broader than the documented one-batch
    * crash degradation. One tiny agg over the small batch side. */
  private def batchMaxId(batch: DataFrame): Option[Long] = {
    val mx = batch.agg(max(col("doc_id"))).head
    if (mx.isNullAt(0)) None else Some(mx.getLong(0))
  }

  /** The shared append tail: bloom-before-rows with the pre-bloom-store
    * migration segment. `fresh` must already be anti-joined against the
    * store. Returns distinct docs appended. */
  private def appendFresh(spark: SparkSession, store: String,
      fresh: DataFrame, afterBloomWrite: () => Unit,
      batchMax: Option[Long]): Long = {
    resumeSwaps(spark, store) // never append beside a mid-swap stage
    val live = s"$store/grams"
    val nAdmitted = fresh.select("doc_id").distinct().count()
    if (nAdmitted > 0) {
      // MIGRATION: a pre-bloom store gets one full-store segment before
      // the first bloom-era append — partial bloom coverage would turn
      // the pre-screen into a false-negative source (missed duplicates)
      if (dirExists(spark, live) &&
          BloomSide.segPaths(spark, bloomDir(store)).isEmpty)
        writeBloomSegment(spark, store,
          spark.read.parquet(live).select("h")
            .stat.bloomFilter("h", BloomExpected, BloomFpp))
      // bloom BEFORE rows: a crash between them leaves the bloom a
      // superset (safe); the reverse order could leave stored hashes
      // invisible to the pre-screen — admitted duplicates. The folding
      // write caps the segment set at BloomSide.CompactAt (writers
      // fold; the screen/probe report faces stay read-only)
      BloomSide.writeSegmentFolding(spark, bloomDir(store),
        fresh.stat.bloomFilter("h", BloomExpected, BloomFpp))
    }
    afterBloomWrite() // unconditional: the crash-injection point
    if (nAdmitted > 0)
      fresh.write.mode(SaveMode.Append).parquet(live)
    // watermark AFTER rows — a crash before this point under-reports
    // the watermark (guard less sensitive for one batch), never lies —
    // and from the FULL batch's max id, bumped even when nothing
    // appended: a batch whose highest-id docs were rejected or fully
    // replayed must still advance the arrival watermark (r9 ADVICE #2).
    // For a verbatim replay batchMax ≤ stored watermark, so the
    // monotone bump no-ops.
    batchMax.foreach(bumpMaxId(spark, store, _))
    nAdmitted
  }

  /** The ADMISSION half for PRE-SCREENED docs (the composed-pipeline
    * face, r6 verdict #5): append their distinct (doc_id, h) rows via
    * the bounded probe's anti-join, bloom-before-rows. `pre` reuses a
    * probe built over a SUPERSET batch (its pos rows are filtered to
    * `docs`; extra storeHits rows belong to other doc ids and cannot
    * match the (doc_id, h) anti-join). Returns docs actually appended. */
  def admit(spark: SparkSession, docs: DataFrame, store: String,
      k: Int = TextOps.SubstrK,
      afterBloomWrite: () => Unit = () => (),
      pre: Option[BatchProbe] = None,
      arrivals: Option[DataFrame] = None): Long = {
    // `arrivals` = the batch's FULL arrival frame when `docs` is a
    // screened subset (the composed pipeline passes its post-door
    // batch): both the contract guard and the watermark bump must see
    // docs the screens rejected, or a batch whose highest-id doc was
    // screened out leaves the watermark stale (r9 ADVICE #2) and its
    // low-id peers go unchecked.
    val arrived = arrivals.getOrElse(docs)
    // the same arrival-contract guard mergeBatch runs (r9 ADVICE #1:
    // the composed pipeline reaches the store only through THIS face,
    // and it maintained the watermark without ever checking it). The
    // composed pipeline's door has already dropped stored ids, so a
    // sub-watermark doc here is a genuine contract violation or a
    // forget-then-reingest — both worth the counter.
    checkArrivalContract(spark, arrived, store)
    val (pos0, storeHits) = pre match {
      case Some(p) =>
        (p.pos.join(docs.select("doc_id"), Seq("doc_id"), "left_semi"),
          p.storeHits)
      case None =>
        val p = TextOps.substrPosFrame(docs, k).localCheckpoint(true)
        (p, probeStore(spark, p, store))
    }
    val fresh = pos0.select("doc_id", "h").distinct()
      .join(storeHits, Seq("doc_id", "h"), "left_anti")
      .localCheckpoint(true)
    appendFresh(spark, store, fresh, afterBloomWrite, batchMaxId(arrived))
  }

  /** Pinned per-batch probe state — ONE gram derivation + ONE store
    * probe serving both the screen and the admission (the composed
    * pipeline runs them as separate stages and must not pay the md5
    * transform or the store probe twice per batch). */
  private[streaming] final case class BatchProbe(pos: DataFrame,
      storeHits: DataFrame)

  private[streaming] def probe(spark: SparkSession, batch: DataFrame,
      store: String, k: Int = TextOps.SubstrK): BatchProbe = {
    val pos = TextOps.substrPosFrame(batch, k).localCheckpoint(true)
    BatchProbe(pos, probeStore(spark, pos, store))
  }

  /** Screen WITHOUT admitting — the report face (doc_id, n_tokens,
    * dup_tokens, reject) for a batch against the current store. Same
    * probe as mergeBatch (lower-id-peer visibility across the store),
    * so replaying a batch this store already absorbed reports the
    * ORIGINAL verdicts. The monotone-id arrival contract on
    * `mergeBatch` applies here too. */
  def screen(spark: SparkSession, batch: DataFrame, store: String,
      k: Int = TextOps.SubstrK): DataFrame =
    screenWith(spark, batch, store, k, probe(spark, batch, store, k))

  private[streaming] def screenWith(spark: SparkSession, batch: DataFrame,
      store: String, k: Int, pre: BatchProbe): DataFrame = {
    val pos = pre.pos
    val batchMin = pos.groupBy("h").agg(min(col("doc_id")).as("mn"))
    val withinDup = pos.join(batchMin, "h")
      .filter(col("doc_id") > col("mn")).select("doc_id", "pos")
    val stats = TextOps.substrIslands(
      withinDup.union(crossDupPos(pos, pre.storeHits)).distinct(), k)
    batch.select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
      .join(stats, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("dup_tokens"), lit(0L)).as("dup_tokens"),
        (coalesce(col("dup_tokens"), lit(0L)) * 2 > col("n_tokens")).as("reject"))
      .orderBy("doc_id")
  }

  /** Rewrite the append-per-batch store into a bounded file count
    * (range-laid on h so the literal probe skips files), staged and
    * swapped via the shared crash-safe sequence; the bloom segments
    * merge into ONE (rebuilt from the rows, so it also sheds the
    * superset slack accumulated by crash windows). */
  def compactStore(spark: SparkSession, store: String, nFiles: Int = 4): Unit = {
    val live = s"$store/grams"
    val stage = s"$store/grams.stage"
    if (!StagedSwap.resume(spark, live, Seq(stage, s"$live.forget"))) {
      if (!dirExists(spark, live)) return
      StagedSwap.clearStale(spark, stage)
      graft.sources.CorpusSink.writeRangeLayout(
        spark.read.parquet(live), stage, "h", nFiles)
      StagedSwap.commit(spark, live, stage)
    }
    // bloom rebuild: write the covering segment FIRST, then drop the
    // old ones — at every instant the segment set covers the store
    BloomSide.replaceAll(spark, bloomDir(store),
      spark.read.parquet(live).select("h").distinct()
        .stat.bloomFilter("h", BloomExpected, BloomFpp))
  }

  /** Streaming entry: JSON documents directory → screened hash store. */
  def ingest(spark: SparkSession, srcDir: String, store: String,
      checkpoint: String): DataStreamWriter[org.apache.spark.sql.Row] =
    spark.readStream.schema(CorpusIngest.docSchema).json(srcDir)
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.ProcessingTime("1 second"))
      .foreachBatch { (batch: DataFrame, _: Long) =>
        mergeBatch(batch.sparkSession, batch, store)
        ()
      }
}
