package graft.streaming

import graft.operators.TextOps
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}

/** Streaming EXACT-SUBSTRING screening — the ingest face of
  * `doc_substring_dedup` and the deployment shape of Lee et al. 2022 at
  * scale: documents arrive continuously, each batch's positional K-gram
  * hashes are checked against the PERSISTED hash store of everything
  * admitted so far (and against lower-id documents in the same batch —
  * the keeper convention every dedup tier shares), duplicated positions
  * merge into maximal spans, and a document whose duplicated-token mass
  * exceeds half its length is rejected. Admitted documents' distinct
  * hashes append to the store, which therefore grows by exactly the
  * admitted text.
  *
  * The gate is INTEGER-EXACT: reject iff 2·dup_tokens > n_tokens — no
  * float threshold to drift. Screening semantics are asymmetric by
  * design (a doc is judged against what was admitted BEFORE it), the
  * same admission ordering as NearDupIngest; the batch face stays the
  * symmetric corpus-wide report.
  *
  * Per batch the corpus side pays ONE semi-join of the batch's slim
  * (doc_id, pos, h) rows against the store's hash column (column-pruned
  * read; the store never recomputes anything — the incremental
  * asymmetry). Replay safety is the per-table idempotent append: fresh
  * hashes anti-join the store's doc_ids, so a replayed micro-batch
  * appends nothing and re-derives the same rejections. Store growth is
  * one parquet file set per batch; `compactStore` rewrites it into a
  * bounded file count via the shared StagedSwap discipline. */
object SubstrIngest {

  private def dirExists(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(p) && fs.listStatus(p).exists(_.getPath.getName.endsWith(".parquet"))
  }

  /** Screen one batch and admit its clean documents' hashes. Returns
    * (admitted, rejected) doc counts — admitted counts docs whose
    * hashes were actually appended (0 on a verbatim replay). */
  def mergeBatch(spark: SparkSession, batch: DataFrame, store: String,
      k: Int = TextOps.SubstrK): (Long, Long) = {
    val live = s"$store/grams"
    // several passes consume the batch's gram derivation — pin it once
    // (localCheckpoint, not cache(): nothing leaks across batches)
    val pos = TextOps.substrPosFrame(batch, k).localCheckpoint(true)
    val nTok = batch.select(col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("n_tokens"))
    // within-batch: a position is duplicated iff a LOWER doc_id in the
    // batch holds the same hash (the keeper convention — the first copy
    // is admitted, later ones score the overlap)
    val batchMin = pos.groupBy("h").agg(min(col("doc_id")).as("mn"))
    val withinDup = pos.join(batchMin, "h")
      .filter(col("doc_id") > col("mn"))
      .select("doc_id", "pos")
    // vs the corpus so far: any stored hash counts (its holder was
    // admitted strictly earlier)
    val crossDup =
      if (dirExists(spark, live))
        pos.join(spark.read.parquet(live).select("h").distinct(),
            Seq("h"), "left_semi")
          .select("doc_id", "pos")
      else withinDup.limit(0)
    val dupPos = withinDup.union(crossDup).distinct()
    val rejects = TextOps.substrIslands(dupPos, k)
      .join(nTok, "doc_id")
      .filter(col("dup_tokens") * 2 > col("n_tokens"))
      .select("doc_id")
      .localCheckpoint(true)
    val nRejected = rejects.count()
    // admitted docs' DISTINCT hashes; anti-join the store's own doc_ids
    // so a replayed batch converges (column-pruned slim read)
    val admitted = pos.join(rejects, Seq("doc_id"), "left_anti")
      .select("doc_id", "h").distinct()
    val fresh0 =
      if (dirExists(spark, live))
        admitted.join(
          spark.read.parquet(live).select("doc_id").distinct(),
          Seq("doc_id"), "left_anti")
      else admitted
    val fresh = fresh0.localCheckpoint(true)
    val nAdmitted = fresh.select("doc_id").distinct().count()
    if (nAdmitted > 0)
      fresh.write.mode(SaveMode.Append).parquet(live)
    (nAdmitted, nRejected)
  }

  /** Screen WITHOUT admitting — the report face (doc_id, n_tokens,
    * dup_tokens, reject) for a batch against the current store. */
  def screen(spark: SparkSession, batch: DataFrame, store: String,
      k: Int = TextOps.SubstrK): DataFrame = {
    val live = s"$store/grams"
    val pos = TextOps.substrPosFrame(batch, k)
    val batchMin = pos.groupBy("h").agg(min(col("doc_id")).as("mn"))
    val withinDup = pos.join(batchMin, "h")
      .filter(col("doc_id") > col("mn")).select("doc_id", "pos")
    val crossDup =
      if (dirExists(spark, live))
        pos.join(spark.read.parquet(live).select("h").distinct(),
            Seq("h"), "left_semi")
          .select("doc_id", "pos")
      else withinDup.limit(0)
    val stats = TextOps.substrIslands(
      withinDup.union(crossDup).distinct(), k)
    batch.select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
      .join(stats, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("dup_tokens"), lit(0L)).as("dup_tokens"),
        (coalesce(col("dup_tokens"), lit(0L)) * 2 > col("n_tokens")).as("reject"))
      .orderBy("doc_id")
  }

  /** Rewrite the append-per-batch store into a bounded file count
    * (range-laid on h so a hash probe touches few files), staged and
    * swapped via the shared crash-safe sequence. */
  def compactStore(spark: SparkSession, store: String, nFiles: Int = 4): Unit = {
    val live = s"$store/grams"
    val stage = s"$store/grams.stage"
    if (StagedSwap.resume(spark, live, Seq(stage))) return
    if (!dirExists(spark, live)) return
    StagedSwap.clearStale(spark, stage)
    graft.sources.CorpusSink.writeRangeLayout(
      spark.read.parquet(live), stage, "h", nFiles)
    StagedSwap.commit(spark, live, stage)
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
