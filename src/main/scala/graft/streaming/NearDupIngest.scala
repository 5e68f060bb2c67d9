package graft.streaming

import graft.operators.{MinHashOps, TextOps}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}

/** Streaming NEAR-duplicate ingestion — the scale path CorpusIngest's
  * exact-dedup leaves open: documents arrive continuously, each batch
  * is screened against the PERSISTED corpus near-dup artifact
  * (MinHashOps.writeNearDupArtifact layout) AND against itself, and
  * only documents that are not near-duplicates of anything admitted so
  * far enter the corpus — whose artifact then grows by exactly the
  * admitted documents' shingle sets and band postings.
  *
  * Per batch the corpus side pays ONE df-cut count pass + one
  * band-bucket equi-join against postings read off disk (only the
  * batch computes signatures — the incremental asymmetry), and the
  * batch screens itself with the symmetric sweep (batches are small;
  * the corpus is never self-paired). Replay safety is the same
  * idempotent-key construction as CorpusIngest: admitted docs anti-join
  * the artifact on doc_id before the append, so a replayed micro-batch
  * appends nothing and re-derives the same rejections.
  */
object NearDupIngest {

  val Threshold = 0.5

  private def artifactExists(spark: SparkSession, artifact: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(s"$artifact/grams")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(p) && fs.listStatus(p).exists(_.getPath.getName.endsWith(".parquet"))
  }

  /** Screen one batch and admit its non-near-dup documents into the
    * artifact. Returns (admitted, rejected) doc counts — admitted =
    * rows actually APPENDED (0 on a verbatim replay). */
  def mergeBatch(spark: SparkSession, batch: DataFrame, artifact: String,
      dfCap: Int = TextOps.DfCap): (Long, Long) = {
    val (batchGrams0, batchPostings0) =
      MinHashOps.bandPostings(spark, batch, cache = false)
    // each micro-batch is consumed by several passes (within-batch
    // screen, cross screen, append) — pin it once instead of
    // re-deriving signatures per pass; localCheckpoint, not cache():
    // no session-lifetime registration to leak across batches
    val batchGrams = batchGrams0.localCheckpoint(true)
    val batchPostings = batchPostings0.localCheckpoint(true)

    // within-batch near-dups: keep the min doc_id of every pair
    val selfPairs = MinHashOps.pairsFromPostings(
        spark, batchGrams, batchPostings, dfCap)
      .filter(col("jaccard") >= Threshold)
      .select(greatest(col("d1"), col("d2")).as("doc_id")).distinct()
    // cross near-dups vs the persisted corpus artifact
    val crossRejects =
      if (artifactExists(spark, artifact))
        MinHashOps.incrementalNearDupVsArtifact(spark, artifact, batch, dfCap,
            batchSides = Some((batchGrams, batchPostings)))
          .filter(col("jaccard") >= Threshold)
          .select(col("d2").as("doc_id")).distinct()
      else selfPairs.limit(0)
    val rejects = selfPairs.union(crossRejects).distinct().localCheckpoint(true)
    val nRejected = rejects.count()

    val admittedGrams = batchGrams.join(rejects, Seq("doc_id"), "left_anti")
    // replay idempotence: only docs the artifact has never seen append
    val fresh0 =
      if (artifactExists(spark, artifact))
        admittedGrams.join(
          spark.read.parquet(s"$artifact/grams").select("doc_id"),
          Seq("doc_id"), "left_anti")
      else admittedGrams
    val fresh = fresh0.localCheckpoint(true)
    val nAdmitted = fresh.count()
    if (nAdmitted > 0) {
      fresh.write.mode(SaveMode.Append).parquet(s"$artifact/grams")
      batchPostings.join(fresh.select("doc_id"), Seq("doc_id"))
        .write.mode(SaveMode.Append).parquet(s"$artifact/postings")
    }
    (nAdmitted, nRejected)
  }

  /** Streaming entry: JSON documents directory → screened corpus
    * artifact. */
  def ingest(spark: SparkSession, srcDir: String, artifact: String,
      checkpoint: String): DataStreamWriter[org.apache.spark.sql.Row] =
    spark.readStream.schema(CorpusIngest.docSchema).json(srcDir)
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.ProcessingTime("1 second"))
      .foreachBatch { (batch: DataFrame, _: Long) =>
        mergeBatch(batch.sparkSession, batch, artifact)
        ()
      }
}
