package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}
import org.apache.spark.sql.types._

/** Streaming snapshot maintenance — the continuous face of
  * `CdcRoute.snapshotMerge`: a change stream upserts a keyed
  * current-state table, latest-wins by EVENT TIME, maintained across
  * micro-batches with `foreachBatch` (the standard Spark CDC-apply
  * pattern; the reference's consumers rebuild exactly this state from
  * the routed topic, README.md:96-104).
  *
  * Exactly-once by CONSTRUCTION, like CorpusIngest: the merge is a
  * per-key argmax over (ts_ms, event_id) — commutative, associative,
  * idempotent — so at-least-once delivery, within-batch duplicates,
  * replayed micro-batches, and out-of-order arrival all converge to
  * the same state with NO commit log: a replayed or late event carries
  * a (ts_ms, event_id) no greater than the stored version and loses
  * the argmax. This versioned-upsert shape is what `MERGE INTO ...
  * WHEN MATCHED AND source.version > target.version` compiles to on
  * transactional table formats.
  *
  * Scale (VERDICT r4 next-round #1): the store is HASH-BUCKETED on
  * `pmod(hash(user_id), numBuckets)` and written as a partitioned
  * parquet table; each micro-batch
  *  1. reduces to ONE row per touched key (map-side combinable max_by
  *     struct aggregation — one slim shuffle of the batch, never the
  *     store),
  *  2. reads back ONLY the buckets containing touched keys (directory-
  *     level partition pruning),
  *  3. merges, and rewrites ONLY those buckets via dynamic partition
  *     overwrite — untouched buckets' files are never opened, never
  *     rewritten (byte-identical across the batch, spec-pinned).
  * Per-batch I/O is O(touched buckets), not O(store): with B buckets
  * and K touched keys a batch rewrites at most min(K, B) / B of the
  * store. Size numBuckets so one bucket ≈ a comfortable task's worth
  * of state (the 100 TB knob; transactional formats replace the
  * bucket rewrite with file-level upsert, same merge frame). The
  * `changed` metric derives from the merge output itself — no second
  * read of the store.
  */
object SnapshotMaintain {

  /** Default store bucket count — small enough that a toy store stays
    * browsable, large enough that a hot-key batch rewrites a sliver. */
  val DefaultBuckets = 64

  val changeSchema: StructType = StructType(Seq(
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("ts_ms", LongType),
    StructField("event_id", LongType)))

  /** The per-key latest-wins reduction: one state row per key, ordered
    * by (ts_ms, event_id), counting applied events. Within-batch
    * duplicate deliveries of the same event (at-least-once can duplicate
    * inside one micro-batch too) collapse on the event identity first;
    * cross-batch the version gate in `mergeBatch` absorbs replays at
    * Structured Streaming's replay unit, the whole micro-batch — so the
    * STATE columns are exact under any delivery. `n_events` counts
    * events APPLIED IN VERSION ORDER, not events seen: an adversarial
    * PARTIAL re-delivery bundled with newer events can overcount it,
    * and symmetrically a genuinely NEW late event arriving in a batch
    * whose version does not exceed the stored one contributes nothing
    * (undercount). An exact seen-events counter under either anomaly
    * needs an event-id log, i.e. real transactional state — see
    * OutboxPipeline for that tier. */
  private def latestPerKey(changes: DataFrame): DataFrame =
    changes.dropDuplicates("user_id", "event_id").groupBy("user_id").agg(
      max(struct(col("ts_ms"), col("event_id"), col("event_type"), col("value")))
        .as("top"),
      count(lit(1)).as("n_events"))
      .select(col("user_id"), col("top.event_type").as("last_event_type"),
        col("top.value").as("last_value"), col("top.ts_ms").as("last_ts_ms"),
        col("top.event_id").as("last_event_id"), col("n_events"))

  private[streaming] def bucketOf(numBuckets: Int) =
    pmod(hash(col("user_id")), lit(numBuckets))

  private[streaming] def storeExists(spark: SparkSession, store: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(store)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(p) && fs.listStatus(p).exists { s =>
      s.getPath.getName.endsWith(".parquet") || // pre-bucketed layout
        (s.isDirectory && s.getPath.getName.startsWith("bucket="))
    }
  }

  /** The store's logical state — the partition column stripped. */
  def snapshot(spark: SparkSession, store: String): DataFrame =
    spark.read.parquet(store).drop("bucket")

  /** One-time migration of a pre-bucketing FLAT store (loose parquet
    * files, no bucket= dirs) into the partitioned layout: staged write
    * to a sibling dir, then a delete + rename swap — a crash before the
    * swap leaves the flat store untouched, and an interrupted swap
    * (flat store deleted, stage present) is resumed by the probe at the
    * next call. `mergeBatch` detects the flat layout and refuses with a
    * pointer here rather than failing on the missing partition column
    * mid-merge. */
  def migrateStore(spark: SparkSession, store: String,
      numBuckets: Int = DefaultBuckets): Unit = {
    val stage = s"$store.migrate"
    if (resumePendingSwap(spark, store)) return
    if (!storeExists(spark, store) || isBucketed(spark, store)) return
    StagedSwap.clearStale(spark, stage)
    spark.read.parquet(store)
      .withColumn("bucket", bucketOf(numBuckets))
      .write.partitionBy("bucket").parquet(stage)
    // the marker travels INSIDE the stage so the rename carries layout
    // and its declaration atomically (a resumed swap inherits it)
    writeBucketMarker(spark, stage, numBuckets)
    StagedSwap.commit(spark, store, stage)
  }

  /** Resize an existing bucketed store to a NEW modulus — the layout
    * evolution knob (PLAN r6 #6): a store created at B buckets whose
    * keyspace has outgrown them (one bucket no longer a comfortable
    * task's worth of state) is rewritten ONCE to `newBuckets`, after
    * which every `mergeBatch` prunes against the new marker
    * automatically. Same staged + resumable shape as `migrateStore`:
    * the re-bucketed store (marker inside) is written to a sibling
    * `.resize` stage, then delete + rename swap. A crash before the
    * swap leaves the live store untouched at the old modulus; an
    * interrupted swap (live gone, stage present) is resumed by the
    * probe here, by `migrateStore`, or — self-healing — by the next
    * `mergeBatch`, so a maintenance stream restarting after a mid-swap
    * crash recovers the store rather than recreating an empty one.
    * The rewrite is one full-store pass — O(store), paid once at the
    * operator's command, never per batch. */
  def resizeStore(spark: SparkSession, store: String, newBuckets: Int): Unit = {
    require(newBuckets > 0, s"newBuckets must be positive: $newBuckets")
    val stage = s"$store.resize"
    if (resumePendingSwap(spark, store)) return
    if (!storeExists(spark, store)) return
    require(isBucketed(spark, store),
      s"$store is a pre-bucketing flat snapshot store — run " +
        "SnapshotMaintain.migrateStore(spark, store) first")
    if (storedBuckets(spark, store, fallback = -1) == newBuckets) return
    StagedSwap.clearStale(spark, stage)
    spark.read.parquet(store).drop("bucket")
      .withColumn("bucket", bucketOf(newBuckets))
      .write.partitionBy("bucket").parquet(stage)
    writeBucketMarker(spark, stage, newBuckets)
    StagedSwap.commit(spark, store, stage)
  }

  /** Resume an interrupted stage→live swap (live deleted, stage
    * present) from either `migrateStore` or `resizeStore`. Returns
    * true when a swap was completed. Safe to probe every batch: two
    * existence checks when nothing is pending. */
  private def resumePendingSwap(spark: SparkSession, store: String): Boolean =
    StagedSwap.resume(spark, store, Seq(s"$store.migrate", s"$store.resize"))

  private def isBucketed(spark: SparkSession, store: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(store)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(p).exists(s =>
      s.isDirectory && s.getPath.getName.startsWith("bucket="))
  }

  /** The store's bucket count rides WITH the store (a `_graft_buckets`
    * marker written at creation): partition pruning computes
    * pmod(hash(key), B) with the delta, and a caller passing a
    * DIFFERENT B than the layout was written with would prune the
    * wrong buckets — stored rows for a touched key would sit in
    * partitions the merge never reads, and the write would land a
    * duplicate row for the key in a second bucket. The parameter is
    * therefore only the CREATION default; an existing store's marker
    * always wins. (A marker-less store from this round's earlier
    * builds falls back to the caller's value — the pre-marker
    * contract.) */
  private[streaming] def storedBuckets(spark: SparkSession, store: String,
      fallback: Int): Int = {
    val p = new org.apache.hadoop.fs.Path(s"$store/_graft_buckets")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) fallback
    else {
      val in = fs.open(p)
      try new String(org.apache.hadoop.io.IOUtils.readFullyToByteArray(in),
        "UTF-8").trim.toInt
      finally in.close()
    }
  }

  private[streaming] def writeBucketMarker(spark: SparkSession, store: String,
      numBuckets: Int): Unit = {
    val p = new org.apache.hadoop.fs.Path(s"$store/_graft_buckets")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(s"$numBuckets\n".getBytes("UTF-8"))
    finally out.close()
  }

  /** Merge one micro-batch of change events into the bucketed snapshot
    * store. Returns the number of keys whose state actually changed
    * (new key, or a delta version exceeding the stored one) — computed
    * from the merge output, not a second store read. `numBuckets` only
    * applies when the store is CREATED; afterwards the store's own
    * marker governs (see `storedBuckets`). */
  def mergeBatch(spark: SparkSession, batch: DataFrame, store: String,
      numBuckets: Int = DefaultBuckets): Long = {
    resumePendingSwap(spark, store) // self-heal an interrupted swap
    val exists = storeExists(spark, store)
    val buckets =
      if (exists) storedBuckets(spark, store, fallback = numBuckets)
      else numBuckets
    // one row per touched key, pinned: the touched-bucket probe and the
    // merge both read it (batch-sized, never store-sized)
    val delta = latestPerKey(batch)
      .withColumn("bucket", bucketOf(buckets))
      .localCheckpoint(true)
    val merged =
      if (exists) {
        require(isBucketed(spark, store),
          s"$store is a pre-bucketing flat snapshot store — run " +
            "SnapshotMaintain.migrateStore(spark, store) once before resuming " +
            "the stream (staged + resumable; see its scaladoc)")
        // touched buckets: bounded by numBuckets — driver state is a
        // handful of ints, the collect the same class of action as the
        // IVF centroid pickup
        val touched = delta.select("bucket").distinct()
          .collect().map(_.getInt(0)).toSeq
        // partition pruning: only touched buckets' files are opened
        val cur = spark.read.parquet(store)
          .filter(col("bucket").isin(touched: _*))
        cur.select(col("user_id"), col("last_event_type"), col("last_value"),
            col("last_ts_ms"), col("last_event_id"), col("n_events"),
            lit(true).as("is_cur"))
          .unionByName(delta.drop("bucket").withColumn("is_cur", lit(false)))
          .groupBy("user_id")
          .agg(
            max(struct(col("last_ts_ms"), col("last_event_id"),
              col("last_event_type"), col("last_value"))).as("top"),
            // replay detection: the delta's version must EXCEED the
            // stored version for its events to count as new
            max(when(col("is_cur"), struct(col("last_ts_ms"), col("last_event_id"))))
              .as("cur_v"),
            max(when(!col("is_cur"), struct(col("last_ts_ms"), col("last_event_id"))))
              .as("new_v"),
            sum(when(col("is_cur"), col("n_events"))).as("cur_n"),
            sum(when(!col("is_cur"), col("n_events"))).as("new_n"))
          .select(col("user_id"),
            col("top.last_event_type").as("last_event_type"),
            col("top.last_value").as("last_value"),
            col("top.last_ts_ms").as("last_ts_ms"),
            col("top.last_event_id").as("last_event_id"),
            (coalesce(col("cur_n"), lit(0L)) +
              when(col("cur_v").isNull || col("new_v") > col("cur_v"),
                coalesce(col("new_n"), lit(0L))).otherwise(0L)).as("n_events"),
            // changed = new key, or delta version beats the stored one
            (col("new_v").isNotNull &&
              (col("cur_v").isNull || col("new_v") > col("cur_v")))
              .as("__changed"))
          .withColumn("bucket", bucketOf(buckets))
      } else delta.withColumn("__changed", lit(true))
    // pin the touched buckets' new content before overwriting the files
    // it was derived from; O(touched), not O(store)
    val pinned = merged.localCheckpoint(true)
    val changed = pinned.filter(col("__changed")).count()
    pinned.drop("__changed")
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic") // replace ONLY the
      .partitionBy("bucket")                       // buckets being written
      .parquet(store)
    if (!exists) writeBucketMarker(spark, store, buckets)
    changed
  }

  /** KEYED DELETION — the compliance face (right-to-erasure / GDPR
    * forget) every keyed store eventually needs: remove the given keys'
    * state, touching ONLY the buckets that can hold them. Same pruning
    * arithmetic as `mergeBatch`: compute each key's bucket from the
    * store's marker, read just those partitions, rewrite them without
    * the keys via dynamic partition overwrite — O(touched buckets),
    * untouched buckets never opened. Returns the number of rows
    * removed. Deletion is idempotent (a second call is a no-op) and
    * convergent with the merge stream: a later event for a deleted key
    * simply re-inserts fresh state, which is the CDC-correct reading
    * (the deletion forgets history, it does not tombstone the future —
    * emit an explicit tombstone event upstream for that). */
  def deleteKeys(spark: SparkSession, store: String, keys: Seq[Long]): Long = {
    if (keys.isEmpty || !storeExists(spark, store)) return 0L
    val buckets = storedBuckets(spark, store, DefaultBuckets)
    val touched = touchedBucketsOf(spark, keys, buckets)
    val cur = spark.read.parquet(store)
      .filter(col("bucket").isin(touched: _*))
      .localCheckpoint(true)
    val remaining = cur.filter(!col("user_id").isin(keys: _*))
      .localCheckpoint(true)
    val removed = cur.count() - remaining.count()
    if (removed == 0L) return 0L
    remaining
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("bucket")
      .parquet(store)
    // dynamic overwrite only replaces partitions PRESENT in the write;
    // a bucket whose every row was deleted writes nothing and would
    // silently keep its old files — drop those directories explicitly
    dropEmptiedBuckets(spark, store, touched,
      remaining.select("bucket").distinct().collect().map(_.getInt(0)).toSet)
    removed
  }

  /** The touched-bucket set of a key list, computed with the SAME
    * `pmod(hash(key), B)` expression the store layout uses (a tiny
    * local job — no hand-rolled hash that could drift from Spark's). */
  private[streaming] def touchedBucketsOf(spark: SparkSession,
      keys: Seq[Long], buckets: Int): Seq[Int] = {
    import spark.implicits._
    keys.toDF("user_id").select(bucketOf(buckets).as("b"))
      .distinct().collect().map(_.getInt(0)).toSeq
  }

  private[streaming] def dropEmptiedBuckets(spark: SparkSession,
      store: String, touched: Seq[Int], stillPresent: Set[Int]): Unit = {
    val fs = new org.apache.hadoop.fs.Path(store)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    touched.filterNot(stillPresent).foreach { b =>
      val dir = new org.apache.hadoop.fs.Path(s"$store/bucket=$b")
      if (fs.exists(dir)) fs.delete(dir, true)
    }
  }

  /** Streaming entry: JSON change-event directory → snapshot store. */
  def maintain(spark: SparkSession, srcDir: String, store: String,
      checkpoint: String,
      numBuckets: Int = DefaultBuckets): DataStreamWriter[org.apache.spark.sql.Row] =
    spark.readStream.schema(changeSchema).json(srcDir)
      .writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.ProcessingTime("1 second"))
      .foreachBatch { (batch: DataFrame, _: Long) =>
        mergeBatch(batch.sparkSession, batch, store, numBuckets)
        ()
      }
}
