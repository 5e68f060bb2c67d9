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

  /** Read persisted (lastBatchId, sketch); heals an interrupted swap.
    * Adoption VALIDATES the tmp first: the FIRST write for a store has
    * no complete-before-delete guarantee (live never existed), so a
    * crash mid-create can leave a truncated tmp — adopting it blindly
    * would wedge every later read on a corrupt live file. An unparsable
    * tmp is deleted and state starts fresh; the interrupted batch never
    * recorded its id, so the checkpoint replays it and the merge
    * re-applies — convergent, not lossy. */
  private def readState(spark: SparkSession, store: String)
      : (Long, org.apache.datasketches.frequencies.ItemsSketch[String]) = {
    import org.apache.datasketches.frequencies.ItemsSketch
    val live = new org.apache.hadoop.fs.Path(store)
    val tmp = new org.apache.hadoop.fs.Path(s"$store.tmp")
    val f = fs(spark, live)
    if (!f.exists(live) && f.exists(tmp)) {
      parseState(spark, tmp) match {
        case Some(st) => f.rename(tmp, live); return st // adopt, one read
        case None => f.delete(tmp, false) // truncated first write: discard
      }
    }
    if (!f.exists(live)) return (-1L, new ItemsSketch[String](MaxMapSize))
    parseState(spark, live).getOrElse(
      throw new IllegalStateException(
        s"$store is corrupt — it was swapped in whole, so this is " +
          "external damage, not a crash window; restore or delete it"))
  }

  /** Parse a state file. None means STRUCTURAL corruption (truncation /
    * bad sketch preamble) — the only case adoption may discard. A
    * transient read failure (connection reset, checksum, datanode loss)
    * PROPAGATES: after a non-first-write crash the tmp can be the only
    * surviving copy of the accumulated state, and conflating a flaky
    * read with corruption would delete it. */
  private def parseState(spark: SparkSession, p: org.apache.hadoop.fs.Path)
      : Option[(Long, org.apache.datasketches.frequencies.ItemsSketch[String])] = {
    import org.apache.datasketches.common.ArrayOfStringsSerDe
    import org.apache.datasketches.frequencies.ItemsSketch
    import org.apache.datasketches.memory.Memory
    val in = fs(spark, p).open(p)
    try {
      val id = in.readLong()
      val bytes = org.apache.hadoop.io.IOUtils.readFullyToByteArray(in)
      Some((id, ItemsSketch.getInstance(Memory.wrap(bytes), new ArrayOfStringsSerDe)))
    } catch {
      case _: java.io.EOFException => None // truncated write
      case _: org.apache.datasketches.common.SketchesException => None
      case _: IllegalArgumentException => None // bad preamble/serde
    }
    finally in.close()
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
    val (lastId, current) = readState(spark, store)
    if (batchId <= lastId) return false // whole-batch replay: absorbed
    // the shared batch-face build (TextOps.sketchTokens) keeps map size,
    // serde, and merge identical across the two faces
    val batchSketch = graft.operators.TextOps.sketchTokens(spark,
      batch.select(explode(split(col("text"), " ")).as("token")))
    current.merge(batchSketch)
    writeState(spark, store, batchId, current)
    true
  }

  /** Current top-k from the persisted sketch (same rendering as the
    * batch query — TextOps.sketchTopK). */
  def topK(spark: SparkSession, store: String, k: Int = 20): DataFrame =
    graft.operators.TextOps.sketchTopK(spark, readState(spark, store)._2, k)

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
