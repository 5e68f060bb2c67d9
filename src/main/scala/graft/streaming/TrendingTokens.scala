package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}
import org.apache.spark.sql.types._

/** Streaming heavy hitters — the continuous face of
  * `TextOps.approxTopTokens`: a document stream maintains ONE bounded
  * Misra-Gries sketch of token frequencies across micro-batches (the
  * "trending tokens" job). State is a single sketch file of a few KB
  * regardless of corpus or vocabulary size.
  *
  * Exactly-once via the BATCH-ID-GATED idempotent sink — the third
  * classic Structured Streaming EOS pattern in this library, beside
  * OutboxPipeline (transactional JDBC sink) and SnapshotMaintain
  * (algebraically convergent merge). Sketch merge is NOT idempotent
  * (remerging a replayed batch double-counts), so the persisted state
  * carries the last applied foreachBatch batchId and a replayed batch
  * (id <= stored) is SKIPPED — Structured Streaming replays whole
  * micro-batches with the same id from the checkpoint, which is exactly
  * the unit the gate absorbs.
  *
  * Crash safety: state is swapped via write-tmp / delete-live / rename,
  * and a reader finding live missing with tmp present adopts tmp (the
  * SnapshotMaintain resumePendingSwap idiom). A crash BEFORE the swap
  * leaves the old state + old batchId (replay re-applies); AFTER the
  * swap, the stored id makes the replay a no-op.
  *
  * Scale: per batch, one mapPartitions pass builds partition sketches
  * (O(partitions) driver merge); the stored sketch never exceeds
  * `TextOps.MaxMapSize` counters. */
object TrendingTokens {

  import graft.operators.TextOps.MaxMapSize

  val docSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType)))

  private def fs(spark: SparkSession, p: org.apache.hadoop.fs.Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Read persisted (lastBatchId, sketch); heals an interrupted swap. */
  private def readState(spark: SparkSession, store: String)
      : (Long, org.apache.datasketches.frequencies.ItemsSketch[String]) = {
    import org.apache.datasketches.common.ArrayOfStringsSerDe
    import org.apache.datasketches.frequencies.ItemsSketch
    import org.apache.datasketches.memory.Memory
    val live = new org.apache.hadoop.fs.Path(store)
    val tmp = new org.apache.hadoop.fs.Path(s"$store.tmp")
    val f = fs(spark, live)
    if (!f.exists(live) && f.exists(tmp)) f.rename(tmp, live) // adopt
    if (!f.exists(live)) return (-1L, new ItemsSketch[String](MaxMapSize))
    val in = f.open(live)
    try {
      val id = in.readLong()
      val bytes = org.apache.hadoop.io.IOUtils.readFullyToByteArray(in)
      (id, ItemsSketch.getInstance(Memory.wrap(bytes), new ArrayOfStringsSerDe))
    } finally in.close()
  }

  private def writeState(spark: SparkSession, store: String, batchId: Long,
      sk: org.apache.datasketches.frequencies.ItemsSketch[String]): Unit = {
    import org.apache.datasketches.common.ArrayOfStringsSerDe
    val live = new org.apache.hadoop.fs.Path(store)
    val tmp = new org.apache.hadoop.fs.Path(s"$store.tmp")
    val f = fs(spark, live)
    val out = f.create(tmp, true)
    try { out.writeLong(batchId); out.write(sk.toByteArray(new ArrayOfStringsSerDe)) }
    finally out.close()
    if (f.exists(live)) f.delete(live, false)
    f.rename(tmp, live)
    ()
  }

  /** Merge one micro-batch into the sketch state. Returns true when the
    * batch was applied, false when the gate skipped a replay. */
  def mergeBatch(spark: SparkSession, batch: DataFrame, store: String,
      batchId: Long): Boolean = {
    import org.apache.datasketches.common.ArrayOfStringsSerDe
    import org.apache.datasketches.frequencies.ItemsSketch
    import org.apache.datasketches.memory.Memory
    import spark.implicits._
    val (lastId, current) = readState(spark, store)
    if (batchId <= lastId) return false // whole-batch replay: absorbed
    val m = MaxMapSize
    val parts = batch
      .select(explode(split(col("text"), " ")).as("token")).as[String]
      .mapPartitions { it =>
        val sk = new ItemsSketch[String](m)
        it.foreach(sk.update)
        Iterator.single(sk.toByteArray(new ArrayOfStringsSerDe))
      }.collect()
    val serde = new ArrayOfStringsSerDe
    val merged = parts.foldLeft(current) { (acc, b) =>
      acc.merge(ItemsSketch.getInstance(Memory.wrap(b), serde))
    }
    writeState(spark, store, batchId, merged)
    true
  }

  /** Current top-k from the persisted sketch. */
  def topK(spark: SparkSession, store: String, k: Int = 20): DataFrame = {
    import org.apache.datasketches.frequencies.ErrorType
    import spark.implicits._
    val (_, sk) = readState(spark, store)
    sk.getFrequentItems(ErrorType.NO_FALSE_NEGATIVES)
      .map(r => (r.getItem, r.getEstimate, r.getLowerBound, r.getUpperBound))
      .sortBy { case (t, est, _, _) => (-est, t) }
      .take(k).toSeq
      .toDF("token", "est", "lb", "ub")
  }

  /** Streaming entry: JSON document directory → sketch state file. */
  def maintain(spark: SparkSession, srcDir: String, store: String,
      checkpoint: String): DataStreamWriter[org.apache.spark.sql.Row] =
    spark.readStream.schema(docSchema).json(srcDir)
      .writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.ProcessingTime("1 second"))
      .foreachBatch { (batch: DataFrame, id: Long) =>
        mergeBatch(batch.sparkSession, batch, store, id)
        ()
      }
}
