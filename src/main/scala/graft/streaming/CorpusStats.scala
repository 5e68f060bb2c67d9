package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}
import org.apache.spark.sql.types._

/** Streaming corpus governance — the continuous face of
  * `TextOps.corpusReport`: a document stream maintains the per-source
  * dataset-card counters (doc mass, token mass, quality-gate and
  * Gopher-gate pass counts, language set) incrementally across
  * micro-batches, so the release dashboard reads a tiny state table
  * instead of rescanning the corpus. The cross-document signals of the
  * batch report (duplicated-token mass, token share) stay batch-only by
  * design — they are not per-row-derivable, which is exactly the
  * boundary between this store and `corpusReport`.
  *
  * Per batch: the SAME stateless signal derivations the batch queries
  * use (`TextOps.qualitySignals`, `TextOps.gopherSignals` — pure per-row
  * arithmetic, so batch ≡ stream by construction) feed one
  * groupBy(source) aggregate; the collected result is O(|sources|) rows
  * of integers plus a bounded language set — the bounded-driver-state
  * class (production corpora have hundreds of sources, not millions).
  *
  * Exactly-once via the BATCH-ID-GATED idempotent sink (the
  * TrendingTokens pattern): integer addition is NOT idempotent, so the
  * persisted state carries the last applied foreachBatch batchId and a
  * replayed batch (id <= stored) is skipped — Structured Streaming
  * replays whole micro-batches under the same id, which is exactly the
  * unit the gate absorbs. Language-set union IS idempotent; it rides the
  * same gate for free. Crash safety is the shared contract: write-tmp /
  * delete-live / rename, with VALIDATED tmp adoption for the first-write
  * crash window (a truncated first tmp is discarded and the checkpoint
  * replays the batch — convergent, not lossy).
  *
  * State rows serialize as sorted TSV with percent-escaped values
  * (arbitrary source/lang strings round-trip), a row-count header (so
  * truncation at a line boundary is detected, not adopted), and a
  * version tag (an unknown version fails loudly instead of reading as
  * corruption). */
object CorpusStats {

  val docSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType)))

  /** Per-source accumulated counters. */
  final case class SourceStats(nDocs: Long, nTokens: Long, nQuality: Long,
      nGopher: Long, langs: Set[String])

  private def fs(spark: SparkSession, p: org.apache.hadoop.fs.Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Percent-escape the characters the TSV format reserves, so an
    * arbitrary source/lang value (a comma inside a lang tag, a tab in a
    * source name) round-trips instead of corrupting the row structure —
    * without this, the store would REJECT a file it itself just wrote
    * (the read-side structural checks are strict by design). */
  private[streaming] def enc(s: String): String =
    s.replace("%", "%25").replace("\t", "%09")
      .replace("\n", "%0a").replace(",", "%2c")

  private[streaming] def dec(s: String): String =
    s.replace("%2c", ",").replace("%0a", "\n")
      .replace("%09", "\t").replace("%25", "%")

  /** Stateless per-batch rollup — the shared derivation both faces use:
    * quality + gopher signals per row, then one aggregate per source. */
  private[streaming] def batchRollup(batch: DataFrame): DataFrame = {
    import graft.operators.TextOps
    TextOps.gopherSignals(TextOps.qualitySignals(batch))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        sum(when(col("quality") >= 0.5, 1L).otherwise(0L)).as("n_quality"),
        sum(when(col("gopher_pass"), 1L).otherwise(0L)).as("n_gopher"),
        collect_set(col("lang")).as("langs"))
  }

  /** Read persisted (lastBatchId, stats); heals an interrupted swap with
    * validated tmp adoption (the TrendingTokens.readState contract: only
    * STRUCTURAL corruption of a tmp is discardable; a corrupt LIVE file
    * was swapped in whole and means external damage). */
  private[streaming] def readState(spark: SparkSession, store: String)
      : (Long, Map[String, SourceStats]) = {
    val live = new org.apache.hadoop.fs.Path(store)
    val tmp = new org.apache.hadoop.fs.Path(s"$store.tmp")
    val f = fs(spark, live)
    if (!f.exists(live) && f.exists(tmp)) {
      parseState(spark, tmp) match {
        case Some(st) => f.rename(tmp, live); return st
        case None => f.delete(tmp, false)
      }
    }
    if (!f.exists(live)) return (-1L, Map.empty)
    parseState(spark, live).getOrElse(
      throw new IllegalStateException(
        s"$store is corrupt — it was swapped in whole, so this is " +
          "external damage, not a crash window; restore or delete it"))
  }

  /** Parse a state file. None means STRUCTURAL corruption — the only
    * case tmp adoption may discard. The header carries the ROW COUNT so
    * truncation at a LINE boundary (complete header + id + a prefix of
    * the rows — every surviving line individually well-formed) is still
    * detected: without the count, adopting such a tmp would silently
    * drop the missing sources' counters AND record the batchId, making
    * the checkpoint replay a no-op — permanent loss. Each row also
    * carries its language-set SIZE, so an empty-string lang (one lang,
    * empty field) round-trips distinguishably from no langs at all. */
  private def parseState(spark: SparkSession, p: org.apache.hadoop.fs.Path)
      : Option[(Long, Map[String, SourceStats])] = {
    val in = fs(spark, p).open(p)
    try {
      val text = new String(
        org.apache.hadoop.io.IOUtils.readFullyToByteArray(in), "UTF-8")
      val lines = text.split("\n", -1).filter(_.nonEmpty)
      if (lines.isEmpty) return None
      val hdr = lines.head.split("\t", -1)
      // an UNKNOWN version is not corruption — fail loudly instead of
      // discarding a tmp or blaming external damage on a live file
      if (hdr.nonEmpty && hdr(0).startsWith("corpus-stats-")
          && hdr(0) != "corpus-stats-v2")
        throw new IllegalStateException(
          s"$p carries state version ${hdr(0)}; this build reads " +
            "corpus-stats-v2 — migrate or delete the store explicitly")
      if (hdr.length != 2 || hdr(0) != "corpus-stats-v2") return None
      val n = hdr(1).toInt
      if (lines.length != 2 + n) return None // line-boundary truncation
      val id = lines(1).toLong
      val rows = lines.drop(2).map { l =>
        val c = l.split("\t", -1)
        if (c.length != 7) return None
        val nLangs = c(5).toInt
        val langs =
          if (nLangs == 0) Set.empty[String]
          else c(6).split(",", -1).map(dec).toSet
        if (langs.size != nLangs) return None
        dec(c(0)) -> SourceStats(c(1).toLong, c(2).toLong, c(3).toLong,
          c(4).toLong, langs)
      }
      Some((id, rows.toMap))
    } catch {
      case _: java.io.EOFException => None
      case _: NumberFormatException => None // truncated mid-line
    }
    finally in.close()
  }

  private def writeState(spark: SparkSession, store: String, batchId: Long,
      stats: Map[String, SourceStats]): Unit = {
    val live = new org.apache.hadoop.fs.Path(store)
    val tmp = new org.apache.hadoop.fs.Path(s"$store.tmp")
    val f = fs(spark, live)
    val body = stats.toSeq.sortBy(_._1).map { case (s, st) =>
      s"${enc(s)}\t${st.nDocs}\t${st.nTokens}\t${st.nQuality}\t${st.nGopher}\t" +
        s"${st.langs.size}\t" + st.langs.toSeq.sorted.map(enc).mkString(",")
    }
    val out = f.create(tmp, true)
    try out.write(
      (Seq(s"corpus-stats-v2\t${body.length}", batchId.toString) ++ body)
        .mkString("", "\n", "\n").getBytes("UTF-8"))
    finally out.close()
    if (f.exists(live)) f.delete(live, false)
    f.rename(tmp, live)
    ()
  }

  /** Merge one micro-batch. Returns true when applied, false when the
    * gate absorbed a replay. */
  def mergeBatch(spark: SparkSession, batch: DataFrame, store: String,
      batchId: Long): Boolean = {
    val (lastId, current) = readState(spark, store)
    if (batchId <= lastId) return false
    val delta = batchRollup(batch).collect().map { r =>
      r.getString(0) -> SourceStats(r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getSeq[String](5).toSet)
    }.toMap
    val merged = (current.keySet ++ delta.keySet).map { s =>
      val a = current.getOrElse(s, SourceStats(0, 0, 0, 0, Set.empty))
      val b = delta.getOrElse(s, SourceStats(0, 0, 0, 0, Set.empty))
      s -> SourceStats(a.nDocs + b.nDocs, a.nTokens + b.nTokens,
        a.nQuality + b.nQuality, a.nGopher + b.nGopher, a.langs ++ b.langs)
    }.toMap
    writeState(spark, store, batchId, merged)
    true
  }

  /** Current per-source stats as a frame — the same additive columns the
    * batch report emits (n_langs collapses the stored set). */
  def stats(spark: SparkSession, store: String): DataFrame = {
    val rows = readState(spark, store)._2.toSeq.sortBy(_._1).map {
      case (s, st) =>
        Row(s, st.nDocs, st.nTokens, st.nQuality, st.nGopher,
          st.langs.size.toLong)
    }
    val schema = StructType(Seq(
      StructField("source", StringType),
      StructField("n_docs", LongType),
      StructField("n_tokens", LongType),
      StructField("n_quality", LongType),
      StructField("n_gopher", LongType),
      StructField("n_langs", LongType)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), schema)
  }

  /** Streaming entry: JSON document directory → stats state file. */
  def maintain(spark: SparkSession, srcDir: String, store: String,
      checkpoint: String): DataStreamWriter[Row] =
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
