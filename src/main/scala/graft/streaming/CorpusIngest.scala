package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}
import org.apache.spark.sql.types._

/** Incremental corpus ingestion — the streaming face of the dedup tier:
  * documents arrive continuously, and only texts never seen before enter
  * the canonical training corpus.
  *
  * Exactly-once by CONSTRUCTION, not by commit log: every batch is
  * (1) deduplicated within itself (min doc_id per fingerprint), then
  * (2) anti-joined against the canonical store on the fingerprint.
  * A replayed micro-batch re-derives fingerprints that are now all
  * present in the store, so the anti-join drops everything — the same
  * idempotent-key absorption the orders sink uses (OutboxPipeline).
  *
  * Scale: the fingerprint is 16 bytes, so the anti-join shuffles slim
  * keys, never document bodies (same shape as TextOps.dedupExact). In
  * production the store is bucketed on `fp` (BucketingSpec mechanics):
  * the incoming micro-batch — always small relative to the corpus —
  * shuffles into the store's bucketing and the store side stays in
  * place; the store itself is partitioned-parquet via CorpusSink. */
object CorpusIngest {

  val docSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType)))

  private def storeExists(spark: SparkSession, store: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(store)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(p) && fs.listStatus(p).exists(_.getPath.getName.endsWith(".parquet"))
  }

  /** Merge one micro-batch into the canonical store. Returns the number
    * of documents actually admitted. */
  def mergeBatch(spark: SparkSession, batch: DataFrame, store: String): Long = {
    val fingerprinted = batch
      .withColumn("fp", md5(col("text").cast("binary")))
    // within-batch dedup: EXACTLY ONE keeper row per fp. row_number (not
    // a min-filter) so even verbatim duplicate records — same doc_id,
    // same text, delivered twice in one batch — collapse to one row.
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("fp").orderBy("doc_id")
    val keepers = fingerprinted
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("rn")
    val fresh =
      if (storeExists(spark, store))
        keepers.join(spark.read.parquet(store).select("fp"), Seq("fp"), "left_anti")
      else keepers
    // materialize BEFORE appending: the plan reads the store's current
    // files; localCheckpoint pins the result so the append can't race
    // its own input listing
    val admitted = fresh.localCheckpoint(true)
    val n = admitted.count()
    if (n > 0)
      admitted.write.mode(SaveMode.Append).parquet(store)
    n
  }

  val timedDocSchema: StructType = docSchema.add("ts", TimestampType)

  /** NATIVE state-store dedup — Spark's own streaming face of the
    * exact-dedup tier: `dropDuplicatesWithinWatermark` keeps one row
    * per fingerprint in keyed state that the WATERMARK EVICTS, so state
    * is bounded by the dedup horizon instead of growing with the corpus
    * — the right face when duplicates cluster in time (re-crawls,
    * retry storms) while the canonical-store anti-join (`mergeBatch`)
    * covers all-time dedup. The horizon IS the contract: a duplicate
    * arriving after its key aged out is admitted again (spec pins both
    * sides of the boundary). At 100 TB/day this is the difference
    * between state ∝ horizon×rate and state ∝ corpus. */
  def dedupWithinHorizon(stream: DataFrame, horizon: String): DataFrame =
    stream
      .withColumn("fp", md5(col("text").cast("binary")))
      .withWatermark("ts", horizon)
      .dropDuplicatesWithinWatermark("fp")

  /** Streaming entry: JSON documents directory → canonical store. */
  def ingest(spark: SparkSession, srcDir: String, store: String,
      checkpoint: String): DataStreamWriter[org.apache.spark.sql.Row] =
    spark.readStream.schema(docSchema).json(srcDir)
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.ProcessingTime("1 second"))
      .foreachBatch { (batch: DataFrame, _: Long) =>
        mergeBatch(batch.sparkSession, batch, store)
        ()
      }
}
