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
  * Scale: the micro-batch reduces to ONE row per touched key before
  * the store merge (map-side combinable max_by struct aggregation —
  * one slim shuffle of the batch, never the store). The store rewrite
  * here is whole-table parquet — right for a demo store, wrong at
  * 100 TB; production swaps the sink for a format with file-level
  * upsert (the merge FRAME is identical) or partitions the store and
  * rewrites only partitions holding touched keys (dynamic partition
  * overwrite). The reduce-then-merge plan is the part that scales.
  */
object SnapshotMaintain {

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
    * STATE columns are exact under any delivery, and `n_events` is exact
    * under the streaming replay model (an adversarial PARTIAL
    * re-delivery bundled with newer events could overcount it; an exact
    * counter under that model needs an event-id log, i.e. real
    * transactional state — see OutboxPipeline for that tier). */
  private def latestPerKey(changes: DataFrame): DataFrame =
    changes.dropDuplicates("user_id", "event_id").groupBy("user_id").agg(
      max(struct(col("ts_ms"), col("event_id"), col("event_type"), col("value")))
        .as("top"),
      count(lit(1)).as("n_events"))
      .select(col("user_id"), col("top.event_type").as("last_event_type"),
        col("top.value").as("last_value"), col("top.ts_ms").as("last_ts_ms"),
        col("top.event_id").as("last_event_id"), col("n_events"))

  private def storeExists(spark: SparkSession, store: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(store)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(p) && fs.listStatus(p).exists(_.getPath.getName.endsWith(".parquet"))
  }

  /** Merge one micro-batch of change events into the snapshot store.
    * Returns the number of keys whose state actually changed. */
  def mergeBatch(spark: SparkSession, batch: DataFrame, store: String): Long = {
    val delta = latestPerKey(batch)
    val merged =
      if (storeExists(spark, store)) {
        val cur = spark.read.parquet(store)
        // versioned upsert: per key take the row with the larger
        // (ts_ms, event_id); n_events accumulates only NEWLY applied
        // events (a replay contributes a version no greater than the
        // stored one and adds nothing)
        cur.select(col("user_id"), col("last_event_type"), col("last_value"),
            col("last_ts_ms"), col("last_event_id"), col("n_events"),
            lit(true).as("is_cur"))
          .unionByName(delta.withColumn("is_cur", lit(false)))
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
                coalesce(col("new_n"), lit(0L))).otherwise(0L)).as("n_events"))
      } else delta
    // pin the result before overwriting the files it was read from
    val pinned = merged.localCheckpoint(true)
    val changed =
      if (storeExists(spark, store)) {
        val prev = spark.read.parquet(store)
        pinned.join(prev,
            pinned("user_id") === prev("user_id") &&
              pinned("last_ts_ms") === prev("last_ts_ms") &&
              pinned("last_event_id") === prev("last_event_id") &&
              pinned("n_events") === prev("n_events"),
            "left_anti")
          .count()
      } else pinned.count()
    pinned.write.mode("overwrite").parquet(store)
    changed
  }

  /** Streaming entry: JSON change-event directory → snapshot store. */
  def maintain(spark: SparkSession, srcDir: String, store: String,
      checkpoint: String): DataStreamWriter[org.apache.spark.sql.Row] =
    spark.readStream.schema(changeSchema).json(srcDir)
      .writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.ProcessingTime("1 second"))
      .foreachBatch { (batch: DataFrame, _: Long) =>
        mergeBatch(batch.sparkSession, batch, store)
        ()
      }
}
