package graft.streaming

import graft.operators.CdcRoute
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}

/** Streaming SCD TYPE-2 maintenance — the continuous face of
  * `CdcRoute.scd2History`, maintaining a versioned dimension-history
  * table from a CDC change stream across micro-batches (the reference's
  * routed outbox topic feeding a history-keeping consumer,
  * README.md:96-104), the way `SnapshotMaintain` maintains the
  * latest-wins snapshot.
  *
  * Design: a type-2 history is a pure FUNCTION OF THE EVENT SET — the
  * gaps-and-islands fold over each key's events. So the durable state
  * is the event LOG itself, stored as a hash-bucketed parquet table
  * keyed by the globally-unique event_id:
  *
  *   $store/log/bucket=*      raw change events (a SET: append-dedup on
  *                            event_id, so appends are idempotent)
  *   $store/history/bucket=*  the derived SCD2 rows, recomputed per
  *                            touched bucket from that bucket's log
  *   $store/_graft_buckets    the layout's bucket modulus (marker)
  *
  * Exactly-once by CONSTRUCTION, one tier stronger than the snapshot's
  * versioned upsert: set-union is idempotent, commutative, AND
  * order-insensitive, so at-least-once delivery, within-batch
  * duplicates, replayed micro-batches and arbitrarily out-of-order
  * cross-batch arrival all converge to the same log — and the history,
  * being a deterministic function of the log, converges with it. A late
  * event that lands mid-history SPLITS the affected runs correctly on
  * the next recompute, the case a purely incremental
  * close-the-open-row SCD2 writer gets permanently wrong. `n_events`
  * here is exact under every delivery anomaly (contrast the
  * SnapshotMaintain caveat) because the log retains the full event set
  * — the price a type-2 history pays anyway, since the history IS the
  * data.
  *
  * Scale shape per micro-batch, all O(touched buckets), never O(store):
  *  1. batch dedups on event_id and reduces to its touched buckets
  *     (bounded by the modulus — the same handful-of-ints collect as
  *     SnapshotMaintain);
  *  2. ONLY touched buckets' log files are read (directory-level
  *     partition pruning), pinned, and anti-joined to keep the append a
  *     set-union;
  *  3. fresh events append into the touched bucket directories;
  *  4. the touched buckets' history is recomputed from their (pinned
  *     log ∪ fresh) — the islands fold runs on one bucket's events, a
  *     task-sized unit by the modulus knob — and swapped in via dynamic
  *     partition overwrite. Untouched buckets: no file opened, no file
  *     rewritten (spec-pinned byte-identical).
  *
  * Crash window: a crash between the log append (3) and the history
  * write (4) leaves touched buckets' HISTORY stale while their log is
  * already complete. Under Structured Streaming's replay model the
  * crashed micro-batch re-runs from the checkpoint: the replay's
  * anti-join finds nothing fresh (no double-append) and STILL recomputes
  * the touched buckets' history — the window self-heals on replay with
  * no operator action (crash-injection spec'd). `refreshHistory` covers
  * the checkpoint-lost case by rebuilding every bucket; `compactLog`
  * bounds the one-file-set-per-batch growth with a staged, resumable
  * rewrite (same swap shape as SnapshotMaintain.resizeStore).
  */
object Scd2Maintain {

  val DefaultBuckets: Int = SnapshotMaintain.DefaultBuckets

  private def logDir(store: String) = s"$store/log"
  private def histDir(store: String) = s"$store/history"

  /** Opt-in maintenance cadence POLICY (r12 verdict #1, promoting the
    * Scd2Probe-measured levers from manual calls to a schedule — the
    * same promotion [[IngestPipeline]]'s `compactEvery`/`compactGrowth`
    * gave `compactAll`). The probe separated the two cost components of
    * the busy-table profile (BASELINE.md §Round 12: per-batch wall
    * 2.98 → 12.27 s over 100×25k events): FILE ACCRETION — one file
    * set per applying batch, reclaimed by [[compactLog]] (12.27 →
    * 6.00 s/batch) — and RETAINED ROW MASS — every touched bucket's
    * recompute reads its whole log, bounded only by [[expireVersions]]
    * (→ 3.12 s). This policy schedules both:
    *
    *  - `compactEvery` > 0: sweep every N applying batches (fixed
    *    cadence — right when retention keeps the log bounded, making
    *    the sweep wall itself bounded);
    *  - `compactGrowth` > 0: sweep when events applied since the last
    *    sweep reach `compactGrowth` × the log's row count at that
    *    sweep (geometric back-off — O(log N) sweeps / O(N log N)
    *    lifetime work on an unbounded store; overrides `compactEvery`);
    *  - `retainMs` < Long.MaxValue: each sweep first expires versions
    *    closed more than `retainMs` before the log's max event time
    *    (EVENT-time retention — deterministic, replay-stable, no
    *    wall-clock in the trigger), then compacts the shrunken log.
    *    With retention on, the growth base tracks the RETAINED mass,
    *    so sweep frequency follows what recomputes actually read.
    *
    * All-defaults = off: cadence is deployment policy, not library
    * policy. Counter: `$store/_maintain_ctr`, torn-write-safe
    * ([[CtrFile]]); reset only AFTER the sweep completes, so a crash
    * mid-sweep re-triggers on the next applying batch and the staged
    * swaps resume — one redundant-but-idempotent sweep, never a
    * skipped one. A torn/zeroed counter re-seeds its base from the
    * log's actual row count (at most one cadence late, never early). */
  final case class MaintainPolicy(compactEvery: Int = 0,
      compactGrowth: Double = 0.0, retainMs: Long = Long.MaxValue) {
    // fail at construction, not silently at runtime — each degenerate
    // value below builds a policy the caller believes is maintaining
    // (or retaining) but isn't: Infinity reads as cadence-on yet
    // `applied >= Inf * base` never fires (NaN on a fresh store), NaN
    // reads as cadence-OFF, a NEGATIVE growth or compactEvery also
    // reads as cadence-off (the documented off values are exactly 0),
    // and retainMs <= 0 reads as retain-NOTHING — every closed
    // version expires at the next sweep (off is Long.MaxValue)
    require(!compactGrowth.isNaN && !compactGrowth.isInfinite &&
      compactGrowth >= 0.0,
      s"compactGrowth must be finite and >= 0 (0 = off), got $compactGrowth")
    require(compactEvery >= 0,
      s"compactEvery must be >= 0 (0 = off), got $compactEvery")
    require(retainMs > 0L,
      s"retainMs must be > 0 (Long.MaxValue = off), got $retainMs")
    def cadenceOn: Boolean = compactEvery > 0 || compactGrowth > 0.0
  }

  /** Persisted cadence state: applying batches and events applied
    * since the last sweep, and the log's row count at that sweep (the
    * growth trigger's base). Missing/torn file = all-zero: in fixed
    * mode one delayed sweep; in growth mode the base re-seeds from
    * the log's true mass at the next applying batch. */
  final case class MaintainCtr(applies: Long,
      appliedSince: Long, baseEvents: Long)

  private def maintainCtrPath(store: String) = s"$store/_maintain_ctr"

  private[graft] def readMaintainCtr(spark: SparkSession,
      store: String): MaintainCtr =
    CtrFile.read(spark, maintainCtrPath(store)) match {
      case Some(Array(a, m, b)) => MaintainCtr(a, m, b)
      case _ => MaintainCtr(0L, 0L, 0L)
    }

  /** Ops/dashboard face of the cadence counter, mirroring
    * [[IngestPipeline.appendsSinceCompact]]: applying batches and
    * events applied since the last [[MaintainPolicy]] sweep, and the
    * growth trigger's base. All-zero on a fresh, unmaintained, or
    * torn-counter store (see [[MaintainCtr]]). */
  def maintainStatus(spark: SparkSession, store: String): MaintainCtr =
    readMaintainCtr(spark, store)

  private def writeMaintainCtr(spark: SparkSession, store: String,
      v: MaintainCtr): Unit =
    CtrFile.write(spark, maintainCtrPath(store),
      Seq(v.applies, v.appliedSince, v.baseEvents))

  /** The log's current row count — the growth trigger's anchor. A
    * parquet count() is footer-metadata work, paid per sweep/seed/
    * erasure, never per batch. */
  private def logEventCount(spark: SparkSession, store: String): Long =
    if (SnapshotMaintain.storeExists(spark, logDir(store)))
      spark.read.parquet(logDir(store)).count()
    else 0L

  /** One maintenance sweep under `policy`: event-time retention first
    * (shrinks the retained set), then log compaction (rewrites the
    * shrunken log to one file per bucket). Both legs keep their own
    * crash discipline; the whole sweep is idempotent. Returns events
    * purged by retention. */
  def maintainSweep(spark: SparkSession, store: String,
      policy: MaintainPolicy): Long = {
    val purged =
      if (policy.retainMs < Long.MaxValue &&
          SnapshotMaintain.storeExists(spark, logDir(store))) {
        val maxTs = changeLog(spark, store).agg(max(col("ts_ms"))).head
        if (maxTs.isNullAt(0)) 0L
        else expireVersions(spark, store, maxTs.getLong(0) - policy.retainMs)
      } else 0L
    compactLog(spark, store)
    purged
  }

  /** Bump-or-fire, mirroring IngestPipeline.maybeCompact: called once
    * per APPLYING batch. Returns true when this call ran the sweep.
    * Counter resets AFTER the sweep; the growth base is the log's
    * actual post-sweep row count (so retention shrinkage re-anchors it
    * every sweep by construction). Replay skew: same argument as the
    * ingest cadence — a replayed batch applies zero events (set-union
    * log) and never bumps, so the counter is exactly-once up to a
    * crash between the bump and the stream checkpoint commit, which
    * costs at most one early sweep, never a skipped one. */
  private def maybeMaintain(spark: SparkSession, store: String,
      policy: MaintainPolicy, nApplied: Long): Boolean = {
    if (policy.compactGrowth > 0.0) {
      val c = readMaintainCtr(spark, store)
      val applied = c.appliedSince + nApplied
      // zero base (fresh store / torn counter): seed from the log's
      // true mass, excluding this counter epoch's own applies
      val base =
        if (c.baseEvents > 0L) c.baseEvents
        else math.max(0L, logEventCount(spark, store) - applied)
      if (applied.toDouble >= policy.compactGrowth * base) {
        maintainSweep(spark, store, policy)
        writeMaintainCtr(spark, store,
          MaintainCtr(0L, 0L, logEventCount(spark, store)))
        true
      } else {
        writeMaintainCtr(spark, store,
          MaintainCtr(c.applies + 1, applied, base))
        false
      }
    } else if (policy.compactEvery <= 0) false
    else {
      val c = readMaintainCtr(spark, store)
      val n = c.applies + 1
      if (n >= policy.compactEvery) {
        maintainSweep(spark, store, policy)
        writeMaintainCtr(spark, store,
          MaintainCtr(0L, 0L, logEventCount(spark, store)))
        true
      } else {
        writeMaintainCtr(spark, store,
          MaintainCtr(n, c.appliedSince + nApplied, c.baseEvents))
        false
      }
    }
  }

  /** The published SCD2 table — the store's derived history, partition
    * column stripped. */
  def history(spark: SparkSession, store: String): DataFrame =
    spark.read.parquet(histDir(store)).drop("bucket")

  /** The durable event set (diagnostics / rebuild input). Projected to
    * the wire `changeSchema` order explicitly so the frame layout is
    * deterministic even over a store whose files predate the canonical
    * write order (see [[canonLog]]). */
  def changeLog(spark: SparkSession, store: String): DataFrame =
    spark.read.parquet(logDir(store))
      .select(SnapshotMaintain.changeSchema.fieldNames.map(col).toSeq: _*)

  /** Merge one micro-batch of change events into the store. Returns the
    * number of NEW events applied (replayed/duplicate events excluded).
    * `numBuckets` applies only at store creation; the store's marker
    * governs afterwards. `policy` schedules the maintenance sweep
    * (default: off — see [[MaintainPolicy]]); the sweep runs LAST,
    * after both store commits. `afterLogAppend` and `afterSweep` are
    * the crash-injection hooks (test only). */
  def mergeBatch(spark: SparkSession, batch: DataFrame, store: String,
      numBuckets: Int = DefaultBuckets,
      afterLogAppend: () => Unit = () => (),
      policy: MaintainPolicy = MaintainPolicy(),
      afterSweep: () => Unit = () => ()): Long = {
    resumePendingCompact(spark, store)
    val exists = SnapshotMaintain.storeExists(spark, logDir(store))
    val buckets =
      if (exists) SnapshotMaintain.storedBuckets(spark, store, fallback = numBuckets)
      else numBuckets
    val delta = batch
      .dropDuplicates("event_id")
      .withColumn("bucket", SnapshotMaintain.bucketOf(buckets))
      .localCheckpoint(true)
    if (delta.isEmpty) return 0L
    val touched = delta.select("bucket").distinct()
      .collect().map(_.getInt(0)).toSeq
    // pinned BEFORE the append so the history recompute below cannot
    // observe (and double-count) the files this batch writes
    val curLog =
      if (exists)
        spark.read.parquet(logDir(store))
          .filter(col("bucket").isin(touched: _*))
          .localCheckpoint(true)
      else spark.emptyDataFrame
    val fresh =
      (if (exists) delta.join(curLog.select("event_id"), Seq("event_id"), "left_anti")
       else delta).localCheckpoint(true)
    val applied = fresh.count()
    if (applied > 0)
      canonLog(fresh).write.mode("append")
        .partitionBy("bucket").parquet(logDir(store))
    if (!exists) SnapshotMaintain.writeBucketMarker(spark, store, buckets)
    afterLogAppend()
    // recompute touched buckets' history even when nothing fresh landed:
    // a replayed batch after the crash window repairs the stale history
    val logNow = if (exists) curLog.unionByName(fresh) else fresh
    CdcRoute.scd2FromChanges(logNow.drop("bucket"))
      .withColumn("bucket", SnapshotMaintain.bucketOf(buckets))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("bucket")
      .parquet(histDir(store))
    // opt-in maintenance cadence — LAST, after both store commits (a
    // crash inside the sweep replays the batch: the anti-join applies
    // nothing, the history recompute repairs, the un-reset counter
    // re-triggers the sweep on the next applying batch and the staged
    // swap resumes)
    if (applied > 0 && policy.cadenceOn &&
        maybeMaintain(spark, store, policy, applied))
      afterSweep()
    applied
  }

  /** KEYED DELETION for the history store — the compliance face
    * (right-to-erasure): a type-2 store holds the subject's FULL
    * timeline, so forgetting a key must purge BOTH faces — the event
    * log (the durable state) and the derived history — in the touched
    * buckets only. Log first: if a crash intervenes before the history
    * rewrite, the stale history rows reference a key whose log is gone,
    * and the next merge touching the bucket (or `refreshHistory`)
    * recomputes history from the purged log — the deletion can only
    * become MORE complete, never resurrect (same convergence direction
    * as the append crash window). Idempotent; returns events removed
    * from the log. */
  def forgetKeys(spark: SparkSession, store: String, keys: Seq[Long]): Long = {
    if (keys.isEmpty ||
      !SnapshotMaintain.storeExists(spark, logDir(store))) return 0L
    resumePendingCompact(spark, store)
    val buckets = SnapshotMaintain.storedBuckets(spark, store, DefaultBuckets)
    val touched = SnapshotMaintain.touchedBucketsOf(spark, keys, buckets)
    val curLog = spark.read.parquet(logDir(store))
      .filter(col("bucket").isin(touched: _*))
      .localCheckpoint(true)
    val keptLog = curLog.filter(!col("user_id").isin(keys: _*))
      .localCheckpoint(true)
    val removed = curLog.count() - keptLog.count()
    if (removed == 0L) return 0L
    canonLog(keptLog).write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("bucket")
      .parquet(logDir(store))
    val present = keptLog.select("bucket").distinct()
      .collect().map(_.getInt(0)).toSet
    SnapshotMaintain.dropEmptiedBuckets(spark, logDir(store), touched, present)
    // touched buckets' history re-derives from the purged log
    CdcRoute.scd2FromChanges(keptLog.drop("bucket"))
      .withColumn("bucket", SnapshotMaintain.bucketOf(buckets))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("bucket")
      .parquet(histDir(store))
    SnapshotMaintain.dropEmptiedBuckets(spark, histDir(store), touched, present)
    reanchorBase(spark, store)
    removed
  }

  /** Re-anchor the growth cadence's base on the log's true row count
    * after an out-of-cadence mass change (erasure, manual retention) —
    * the IngestPipeline.forget re-anchor (r12 verdict #2) applied to
    * this store: without it the next growth sweep fires late by the
    * purged fraction. One cheap count, only when a base is anchored;
    * idempotent (a crash before it leaves sweeps late, never early,
    * and a re-run re-anchors). */
  private def reanchorBase(spark: SparkSession, store: String): Unit = {
    val c = readMaintainCtr(spark, store)
    if (c.baseEvents > 0L)
      writeMaintainCtr(spark, store,
        c.copy(baseEvents = logEventCount(spark, store)))
  }

  /** RETENTION / VACUUM — expire history closed strictly before
    * `horizonMs`: per key, the retained log starts at the oldest
    * version still ACTIVE at the horizon (valid_to > horizon or open),
    * so the current state and every version a time-travel read inside
    * the retention window could touch are preserved exactly, while
    * events supporting only pre-horizon versions are purged from the
    * log and the history re-derives. Purging the LOG (not just the
    * history) is the point: history is derived state, and a
    * history-only prune would resurrect on the next touched-bucket
    * recompute. Version numbers renumber from 1 over the retained
    * window — the standard type-2 retention semantics (versions are
    * relative to retained history). Every key keeps ≥1 event (its open
    * run), so no bucket empties. Idempotent; O(store), paid at the
    * operator's command like `compactLog`. Returns events purged. */
  def expireVersions(spark: SparkSession, store: String,
      horizonMs: Long): Long = {
    if (!SnapshotMaintain.storeExists(spark, logDir(store))) return 0L
    resumePendingCompact(spark, store)
    val buckets = SnapshotMaintain.storedBuckets(spark, store, DefaultBuckets)
    val log = spark.read.parquet(logDir(store)).localCheckpoint(true)
    val keepFrom = CdcRoute.scd2FromChanges(log.drop("bucket"))
      .filter(col("valid_to_ms").isNull || col("valid_to_ms") > horizonMs)
      .groupBy("user_id")
      .agg(min(col("valid_from_ms")).as("keep_from"))
    val kept = log.join(keepFrom, "user_id")
      .filter(col("ts_ms") >= col("keep_from"))
      .drop("keep_from")
      .localCheckpoint(true)
    val removed = log.count() - kept.count()
    if (removed > 0L)
      canonLog(kept).write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("bucket")
        .parquet(logDir(store))
    // the HISTORY rewrite runs even when removed == 0 (r13 review):
    // the crash window between the log overwrite and this write
    // replays with a log that has nothing left to purge, and an early
    // return here would leave the expired versions live in history
    // indefinitely (merges only recompute TOUCHED buckets). Rewriting
    // unconditionally makes the retention pass idempotent end-to-end:
    // any replay converges history to the fold of the retained log.
    CdcRoute.scd2FromChanges(kept.drop("bucket"))
      .withColumn("bucket", SnapshotMaintain.bucketOf(buckets))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("bucket")
      .parquet(histDir(store))
    // a manual (out-of-cadence) retention pass shrinks the mass the
    // growth trigger tracks; inside maintainSweep this is immediately
    // superseded by the post-sweep reset — redundant, never wrong
    reanchorBase(spark, store)
    removed
  }

  /** Rebuild EVERY bucket's history from the log — O(store), for
    * checkpoint-loss recovery or after a manual log edit. */
  def refreshHistory(spark: SparkSession, store: String): Unit = {
    val buckets = SnapshotMaintain.storedBuckets(spark, store, DefaultBuckets)
    CdcRoute.scd2FromChanges(changeLog(spark, store))
      .withColumn("bucket", SnapshotMaintain.bucketOf(buckets))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("bucket")
      .parquet(histDir(store))
  }

  /** Compact the log's per-batch file accumulation to one file per
    * bucket: staged rewrite beside the live log, then delete + rename
    * swap. A crash before the swap leaves the live log untouched; an
    * interrupted swap (live gone, stage present) is resumed by the next
    * `mergeBatch`. O(log), paid at the operator's command. */
  def compactLog(spark: SparkSession, store: String): Unit = {
    val stage = s"${logDir(store)}.compact"
    if (resumePendingCompact(spark, store)) return
    if (!SnapshotMaintain.storeExists(spark, logDir(store))) return
    StagedSwap.clearStale(spark, stage)
    val buckets = SnapshotMaintain.storedBuckets(spark, store, DefaultBuckets)
    canonLog(spark.read.parquet(logDir(store)))
      .repartition(buckets, col("bucket"))
      .write.partitionBy("bucket").parquet(stage)
    StagedSwap.commit(spark, logDir(store), stage)
  }

  private def resumePendingCompact(spark: SparkSession, store: String): Boolean =
    StagedSwap.resume(spark, logDir(store), Seq(s"${logDir(store)}.compact"))

  /** Canonical on-disk column order for the log store, applied at
    * EVERY log write. The write paths reach their frame through
    * different joins — mergeBatch's replay gate (left_anti on
    * event_id) moves event_id to the front, expireVersions' horizon
    * join moves user_id, the first-ever batch writes the raw batch
    * order — so without this select the log accumulates files with
    * MIXED column orders. Parquet reads values by NAME, so the data
    * is always correct, but `spark.read.parquet`'s inferred COLUMN
    * ORDER follows whichever file footer the (parallel,
    * order-unstable) listing samples first: every downstream read of
    * the store gets a nondeterministic frame layout. One canonical
    * order (the wire `changeSchema` + bucket) makes every file
    * uniform and every read deterministic.
    *
    * DELIBERATE TIGHTENING (vs pre-r15): maintenance rewrites
    * (compactLog / expireVersions / forgetKeys) now project to EXACTLY
    * changeSchema+bucket, where they previously preserved whatever
    * columns a store happened to hold. The log dir is not a
    * user-writable surface — every writer is in this object and writes
    * only these columns — so extra columns were never a supported
    * contract; if a store acquired any out-of-band, the first
    * maintenance pass drops them (see README migration notes). */
  private def canonLog(df: DataFrame): DataFrame =
    df.select((SnapshotMaintain.changeSchema.fieldNames :+ "bucket")
      .map(col).toSeq: _*)

  /** Streaming entry: JSON change-event directory → SCD2 history store
    * (same change schema as SnapshotMaintain — the two consumers read
    * the same routed topic). `policy` opts the deployment into the
    * scheduled maintenance sweep (see [[MaintainPolicy]]). */
  def maintain(spark: SparkSession, srcDir: String, store: String,
      checkpoint: String,
      numBuckets: Int = DefaultBuckets,
      policy: MaintainPolicy = MaintainPolicy()): DataStreamWriter[org.apache.spark.sql.Row] =
    spark.readStream.schema(SnapshotMaintain.changeSchema).json(srcDir)
      .writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.ProcessingTime("1 second"))
      .foreachBatch { (batch: DataFrame, _: Long) =>
        mergeBatch(batch.sparkSession, batch, store, numBuckets,
          policy = policy)
        ()
      }
}
