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

  /** The published SCD2 table — the store's derived history, partition
    * column stripped. */
  def history(spark: SparkSession, store: String): DataFrame =
    spark.read.parquet(histDir(store)).drop("bucket")

  /** The durable event set (diagnostics / rebuild input). */
  def changeLog(spark: SparkSession, store: String): DataFrame =
    spark.read.parquet(logDir(store)).drop("bucket")

  /** Merge one micro-batch of change events into the store. Returns the
    * number of NEW events applied (replayed/duplicate events excluded).
    * `numBuckets` applies only at store creation; the store's marker
    * governs afterwards. `afterLogAppend` is the crash-injection hook
    * (test only). */
  def mergeBatch(spark: SparkSession, batch: DataFrame, store: String,
      numBuckets: Int = DefaultBuckets,
      afterLogAppend: () => Unit = () => ()): Long = {
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
      fresh.write.mode("append").partitionBy("bucket").parquet(logDir(store))
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
    keptLog.write.mode("overwrite")
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
    removed
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
    if (removed == 0L) return 0L
    kept.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("bucket")
      .parquet(logDir(store))
    CdcRoute.scd2FromChanges(kept.drop("bucket"))
      .withColumn("bucket", SnapshotMaintain.bucketOf(buckets))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("bucket")
      .parquet(histDir(store))
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
    spark.read.parquet(logDir(store))
      .repartition(buckets, col("bucket"))
      .write.partitionBy("bucket").parquet(stage)
    StagedSwap.commit(spark, logDir(store), stage)
  }

  private def resumePendingCompact(spark: SparkSession, store: String): Boolean =
    StagedSwap.resume(spark, logDir(store), Seq(s"${logDir(store)}.compact"))

  /** Streaming entry: JSON change-event directory → SCD2 history store
    * (same change schema as SnapshotMaintain — the two consumers read
    * the same routed topic). */
  def maintain(spark: SparkSession, srcDir: String, store: String,
      checkpoint: String,
      numBuckets: Int = DefaultBuckets): DataStreamWriter[org.apache.spark.sql.Row] =
    spark.readStream.schema(SnapshotMaintain.changeSchema).json(srcDir)
      .writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.ProcessingTime("1 second"))
      .foreachBatch { (batch: DataFrame, _: Long) =>
        mergeBatch(batch.sparkSession, batch, store, numBuckets)
        ()
      }
}
