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
    * of documents actually admitted.
    *
    * The per-batch store probe is BLOOM-BOUNDED (r7, the shared
    * BloomSide discipline): each append writes a fingerprint bloom
    * segment beside the store BEFORE its rows (superset at every
    * instant — misses prove absence, false negatives cannot occur), so
    * a batch of entirely fresh texts — the steady state — anti-joins
    * against nothing and never reads a store byte; bloom-positive
    * candidates reach an exact confirm over the store's fp column,
    * pushed as IN literals below the threshold. A pre-bloom store gets
    * one covering migration segment at its first bloom-era append and
    * probes unbounded until then. */
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
      .localCheckpoint(true) // the probe and the anti-join both consume it
    val hits = probeStore(spark, keepers, store)
    // materialize BEFORE appending: the plan reads the store's current
    // files; localCheckpoint pins the result so the append can't race
    // its own input listing
    val admitted = keepers
      .join(hits.select("fp").distinct(), Seq("fp"), "left_anti")
      .localCheckpoint(true)
    val n = admitted.count()
    if (n > 0) appendFresh(spark, store, admitted)
    n
  }

  /** ONE bounded store probe per batch — the SubstrIngest.probeStore
    * discipline applied to the exact tier, shared by `mergeBatch` and
    * the composed pipeline's exact screen: every stored (fp, doc_id)
    * row whose fingerprint appears among `keepers` — EXACT and
    * COMPLETE for the batch's fps (the bloom can only over-select), so
    * it serves both the cross screen (whose caller excludes own-doc
    * rows) and the append's anti-join. Empty frame — zero store bytes
    * read — when the bloom clears the whole batch. */
  private[streaming] def probeStore(spark: SparkSession, keepers: DataFrame,
      store: String): DataFrame = {
    val empty = keepers.select(col("fp"), col("doc_id").as("store_doc"))
      .limit(0).localCheckpoint(true)
    if (!storeExists(spark, store)) return empty
    val batchFp0 = keepers.select("fp").distinct()
    // bloom broadcast is destroyed as soon as the candidate filter is
    // materialized (cand is eagerly localCheckpoint-pinned) — at a
    // production 30-60 s trigger, relying on the driver's GC-driven
    // ContextCleaner leaks ~160 KB/batch between GC cycles (r8 advice)
    val bcOpt = BloomSide.read(spark, s"$store.bloom")
      .map(spark.sparkContext.broadcast(_))
    val batchFp = bcOpt match {
      case Some(bc) =>
        // asNondeterministic: keep this pre-screen out of the plan's
        // CONSTRAINT set — localCheckpoint preserves origin
        // constraints, and InferFiltersFromConstraints would resurrect
        // the UDF (and its by-then DESTROYED broadcast) across any
        // later equi-join against the pinned frame; see
        // SubstrIngest.probeStore (r11, found at the sf10 store)
        val might = udf((fp: String) => bc.value.mightContainString(fp))
          .asNondeterministic()
        batchFp0.filter(might(col("fp")))
      case None => batchFp0 // pre-bloom store: no pre-screen
    }
    val cand = batchFp.localCheckpoint(true)
    val nCand = cand.count()
    bcOpt.foreach(_.destroy())
    if (nCand == 0) return empty // fresh batch: store never read
    val s0 = spark.read.parquet(store)
      .select(col("fp"), col("doc_id").as("store_doc"))
    val hits =
      if (nCand <= BloomSide.IsinThreshold)
        s0.filter(col("fp").isin(
          cand.collect().map(_.getString(0)).toSeq: _*))
      else s0.join(broadcast(cand), Seq("fp"), "left_semi")
    hits.localCheckpoint(true)
  }

  /** Canonical on-disk column order for a corpus store, applied at
    * EVERY corpus write (this append tail, IngestPipeline.compactAll's
    * range-layout rewrite, and IngestPipeline.forget's purge rewrite)
    * — the Scd2Maintain.canonLog pattern (r15's root-caused flake
    * class): parquet reads values by NAME so data is always correct,
    * but `spark.read.parquet` on a dir whose files carry MIXED column
    * orders infers the frame's column ORDER from whichever footer the
    * parallel, order-unstable listing samples first — a
    * nondeterministic layout for every downstream read. The corpus
    * store was exposed on two counts: the standalone `mergeBatch`
    * writes whatever order the CALLER's batch arrives in (two
    * differently-ordered batches to one store mix files), and the
    * composed pipeline's survivors carry a different join-chain order
    * than the standalone face — uniform per store only by the
    * convention that the faces never share a dir (VERDICT r15 #1).
    *
    * Unlike the log store, the two faces legitimately persist
    * DIFFERENT column sets (the composed face stores the gate's
    * admission-evidence columns), so the canonical order is a pure
    * function of the column SET — wire `docSchema` order, then `fp`,
    * then any remaining columns sorted by name — never of the
    * incoming frame's order. Same set ⇒ same order, at every write
    * site, from every face. */
  private[streaming] def canonCorpus(df: DataFrame): DataFrame = {
    val present = df.columns.toSet
    val front = (docSchema.fieldNames.toSeq :+ "fp").filter(present)
    val rest = (present -- front).toSeq.sorted
    df.select((front ++ rest).map(col): _*)
  }

  /** The shared append tail (bloom-before-rows, with the pre-bloom
    * migration segment — the superset invariant): `admitted` must
    * already be anti-joined against the store and PINNED, so the
    * append cannot race its own input listing. Shared by `mergeBatch`
    * and the composed pipeline's corpus admission. Since round 8 it
    * maintains a SECOND side bloom over doc_id (`$store.idbloom`, same
    * segment discipline, both blooms before the rows) so the composed
    * pipeline's doc_id guard (`dropStoredIds`) stays zero-store-bytes
    * for fresh batches; a pre-idbloom store gets its covering
    * migration segment at the first round-8-era append. Rows land in
    * the canonical column order (see [[canonCorpus]]). */
  private[streaming] def appendFresh(spark: SparkSession, store: String,
      admitted: DataFrame): Unit = {
    val bloomDir = s"$store.bloom"
    val idBloomDir = s"$store.idbloom"
    if (storeExists(spark, store) &&
        (BloomSide.segPaths(spark, bloomDir).isEmpty ||
         BloomSide.segPaths(spark, idBloomDir).isEmpty)) {
      // pre-bloom migration: ONE store pass builds both covering
      // segments (write only the missing one — the other dir keeps its
      // exact history)
      val (fpAll, idAll) = BloomSide.buildStrLong(
        spark.read.parquet(store), "fp", "doc_id")
      if (BloomSide.segPaths(spark, bloomDir).isEmpty)
        BloomSide.writeSegment(spark, bloomDir, fpAll)
      if (BloomSide.segPaths(spark, idBloomDir).isEmpty)
        BloomSide.writeSegment(spark, idBloomDir, idAll)
    }
    // one job for both per-batch segments (r7 verdict #5's shave; two
    // stat.bloomFilter calls paid two passes over the same pinned
    // rows); the folding write caps each segment set at CompactAt
    val (fpB, idB) = BloomSide.buildStrLong(admitted, "fp", "doc_id")
    BloomSide.writeSegmentFolding(spark, bloomDir, fpB)
    BloomSide.writeSegmentFolding(spark, idBloomDir, idB)
    canonCorpus(admitted).write.mode(SaveMode.Append).parquet(store)
  }

  /** Bounded doc_id guard for the composed pipeline's corpus admission
    * (r7 ADVICE #1): drop batch rows whose doc_id the store already
    * holds, so corpus doc_ids stay UNIQUE BY CONSTRUCTION — the
    * doc_id ≡ vec_id coherence key searchCorpus and the governance
    * counters rely on. The fp anti-join absorbs verbatim re-delivery;
    * this guard absorbs the remaining case, a stored doc_id
    * re-delivered with CHANGED text (which passes every screen — its
    * fp is new). Keep-old is the system-wide convention: every other
    * store's admission anti-joins at doc_id grain, so dropping the
    * changed row here keeps the five stores coherent (to actually
    * change a document: forget, then re-ingest — the doc_id
    * immutability contract).
    *
    * Cost shape: the idbloom pre-screen clears a fresh batch without
    * reading a store byte; bloom-positive ids reach an exact confirm
    * pushed as IN literals into the doc_id column (footer min/max
    * skipping on the range-laid store), falling back to a broadcast
    * semi-join past the threshold — the same bounds as every other
    * per-batch probe in this file. A pre-idbloom store probes its
    * doc_id column unbounded until the first round-8-era append
    * migrates it. */
  private[streaming] def dropStoredIds(spark: SparkSession, batch: DataFrame,
      store: String): DataFrame = {
    if (!storeExists(spark, store)) return batch
    val ids0 = batch.select("doc_id").distinct()
    // destroy the idbloom broadcast once the candidate set is pinned
    // (same per-batch-leak fix as probeStore — r8 advice)
    val bcOpt = BloomSide.read(spark, s"$store.idbloom")
      .map(spark.sparkContext.broadcast(_))
    val ids = bcOpt match {
      case Some(bc) =>
        // asNondeterministic — same constraint-resurrection guard as
        // probeStore above / SubstrIngest.probeStore (r11)
        val might = udf((id: Long) => bc.value.mightContainLong(id))
          .asNondeterministic()
        ids0.filter(might(col("doc_id")))
      case None => ids0 // pre-idbloom store: no pre-screen
    }
    val cand = ids.localCheckpoint(true)
    val nCand = cand.count()
    bcOpt.foreach(_.destroy())
    if (nCand == 0) return batch // fresh batch: store never read
    val s0 = spark.read.parquet(store).select("doc_id")
    val stored =
      if (nCand <= BloomSide.IsinThreshold)
        s0.filter(col("doc_id").isin(
          cand.collect().map(_.getLong(0)).toSeq: _*))
      else s0.join(broadcast(cand), Seq("doc_id"), "left_semi")
    batch.join(stored.distinct().localCheckpoint(true),
      Seq("doc_id"), "left_anti")
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

  /** QUALITY + PII gating as one stream-safe transform — the cleaning
    * gate every public-corpus pipeline runs at the door, composed from
    * the batch tier's verified pieces: Gopher rule signals
    * (TextOps.gopherSignals — the same columns doc_gopher_rules
    * oracles) filter admission, and survivors ship with their text
    * REDACTED by the PII scrub (TextOps.piiRedact — doc_pii_redact's
    * patterns, applied in the same order). Pure per-row column
    * arithmetic end to end: no aggregation, no watermark, no state —
    * so the SAME function serves batch frames and streaming frames,
    * and batch/stream parity is by construction (CorpusGateSpec pins
    * it anyway).
    *
    * External input is WHITESPACE-NORMALIZED at the door (runs of any
    * whitespace → one space, trimmed): the batch tier's signal
    * formulas assume the synthetic corpus's single-space-joined
    * invariant (`mean_wl` derives from len(text)−n_words+1), which
    * arbitrary external documents — newline-separated, tab-indented,
    * double-spaced — do not satisfy; without the normalization a
    * legitimately formatted doc tokenizes to one giant "word" and is
    * wrongly rejected. The signal columns are ADMISSION EVIDENCE,
    * measured on the normalized pre-redaction text (gating before
    * redacting keeps the 4-regex scrub off rejected rows — the cheap
    * order at 100 TB); the stored `text` is the redacted form, so
    * re-deriving signals from it shifts the PII spans' word counts.
    *
    * Scale: embarrassingly parallel (zero shuffle); at 100 TB/day the
    * gate runs at source parallelism and drops rejected documents
    * BEFORE anything downstream pays to move them. */
  def gate(docs: DataFrame, passthrough: Seq[String] = Nil): DataFrame =
    graft.operators.TextOps.piiRedact(
      graft.operators.TextOps.gopherSignals(normWs(docs))
        .filter(col("gopher_pass")))
      .select(Seq(col("doc_id"), col("lang"), col("source"),
        col("redacted").as("text"), col("n_words"), col("mean_wl"),
        col("frac_alpha"), col("n_stop"),
        col("n_email"), col("n_phone"), col("n_ip"), col("n_id9"),
        col("n_pii")) ++ passthrough.map(col): _*)

  /** The gate's whitespace normalization applied to `text` BEFORE
    * bigram tokenization — train and score must see the SAME token
    * stream the quality gate admits on. `bigramPairs` splits on a
    * single space (the synthetic corpus's invariant); an external doc
    * with newline/tab/double-space formatting would otherwise glue
    * words into tokens no trained bigram matches, score the 0 floor,
    * and be wrongly dropped as disfluent despite passing the quality
    * gate. Normalization runs ahead of redaction, so redaction still
    * cannot shift bigrams. On the single-space synthetic corpus this
    * is the identity (bigramLm parity is untouched). ONE definition,
    * reused by the quality gate, the LM trainer, and both scorer
    * faces — the equality of these token streams is load-bearing. */
  private def normWs(docs: DataFrame): DataFrame =
    docs.withColumn("text", trim(regexp_replace(col("text"), "\\s+", " ")))

  /** Train the bigram-LM model on a reference corpus and persist it —
    * the MODEL artifact the fluency gate scores against. One corpus
    * pass; the table is (bg, g), vocab²-bounded and slim. */
  def trainLmModel(spark: SparkSession, corpusDir: String,
      modelPath: String): Unit =
    graft.operators.TextOps.bigramModel(
      graft.operators.TextOps.bigramPairs(normWs(
        graft.Tables.documentsPar(spark, corpusDir))))
      .write.mode("overwrite").parquet(modelPath)

  /** Score documents against a TRAINED LM table — the deployment shape
    * of doc_bigram_lm: training happened once on the reference corpus,
    * new documents only pay scoring. Bigrams the model never saw score
    * the grid floor (0 — maximal disfluency, the standard no-backoff
    * reading), so gibberish in a live batch cannot inherit fluency.
    * On the training corpus itself this reproduces `bigramLm`'s
    * numbers exactly (no bigram misses — parity spec'd). Stateless
    * given the model frame: batch ≡ stream by construction; the join
    * shuffles only the BATCH's pairs on bg (stream-static join). */
  def lmScore(docs: DataFrame, model: DataFrame): DataFrame = {
    val G = 1048576L
    graft.operators.TextOps.bigramPairs(normWs(docs))
      .join(model, Seq("bg"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_pairs"),
        sum(coalesce(col("g"), lit(0L))).as("lm_grid"))
      .select(col("doc_id"), col("n_pairs"), col("lm_grid"),
        (col("lm_grid").cast("double") / (col("n_pairs") * G)).as("lm_score"))
  }

  /** The FLUENCY-gated gate, batch face: quality+PII (`gate`) composed
    * with the LM score against a trained model — the CCNet-style
    * "perplexity filter" face of ingest. Documents too short to score
    * (no bigram) pass the fluency leg (nothing to judge); everything
    * else needs lm_score ≥ minScore. Scoring reads the PRE-REDACTION
    * text, whitespace-normalized the same way the gate normalizes
    * (redaction must not shift the LM's bigrams; normalization must —
    * it is what the trained model saw). */
  def gateLm(docs: DataFrame, model: DataFrame, minScore: Double): DataFrame =
    gate(docs)
      .join(lmScore(docs, model).select("doc_id", "n_pairs", "lm_score"),
        Seq("doc_id"), "left")
      .filter(col("n_pairs").isNull || col("lm_score") >= minScore)

  /** PER-ROW scorer over a BROADCAST model — the streaming-safe face:
    * `lmScore`'s explode+aggregate is a streaming aggregation (append
    * mode rejects it), but LM inference with a shipped model is
    * naturally per-row — the model rides as a broadcast map (the
    * CCNet deployment shape: the trained table is a bounded artifact;
    * if it ever outgrows broadcast, fall back to `gateLm` under a
    * foreachBatch sink). One UDF per row, zero shuffle, bit-identical
    * to the join face (spec-pinned parity, like the bloom
    * might_contain precedent). */
  def lmScoreUdf(spark: SparkSession,
      model: Map[String, Long]): org.apache.spark.sql.expressions.UserDefinedFunction = {
    val bc = spark.sparkContext.broadcast(model)
    udf { text: String =>
      // EXACTLY normWs's normalization: collapse \s+ runs to one
      // space, then strip leading/trailing SPACES only — NOT
      // String.trim, which strips every char <= U+0020: a doc with a
      // leading non-\s control char (e.g. U+0001) keeps it through
      // the SQL face's trim but Java-trim would drop it, making the
      // two faces tokenize (and so score) differently near minScore
      val norm = text.replaceAll("\\s+", " ")
      var s = 0; var e = norm.length
      while (s < e && norm.charAt(s) == ' ') s += 1
      while (e > s && norm.charAt(e - 1) == ' ') e -= 1
      val toks = norm.substring(s, e).split(" ", -1)
      var i = 1; var n = 0L; var g = 0L
      while (i < toks.length) {
        n += 1; g += bc.value.getOrElse(toks(i - 1) + " " + toks(i), 0L)
        i += 1
      }
      (n, g)
    }
  }

  /** Streaming ingest with the fluency gate: per-row broadcast-model
    * scoring keeps the plan stateless, so the file-sink manifest alone
    * still carries exactly-once, like `ingestGated`. */
  def ingestGatedLm(spark: SparkSession, srcDir: String, store: String,
      checkpoint: String, modelPath: String,
      minScore: Double): DataStreamWriter[org.apache.spark.sql.Row] = {
    import spark.implicits._
    val model = spark.read.parquet(modelPath)
      .as[(String, Long)].collect().toMap
    val score = lmScoreUdf(spark, model)
    val G = 1048576L
    gate(spark.readStream.schema(docSchema).json(srcDir)
        // score PRE-REDACTION text; the UDF whitespace-normalizes
        // internally, matching the gate's (and the trainer's) tokens
        .withColumn("lm", score(col("text"))),
        passthrough = Seq("lm"))
      .withColumn("n_pairs", col("lm._1"))
      .withColumn("lm_score",
        col("lm._2").cast("double") / (col("n_pairs") * G))
      .filter(col("n_pairs") === 0L || col("lm_score") >= minScore)
      .drop("lm")
      .writeStream
      .outputMode("append")
      .format("parquet")
      .option("path", store)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.ProcessingTime("1 second"))
  }

  /** Gated streaming ingest: JSON documents directory → gate →
    * parquet store, exactly-once via the FILE-SINK MANIFEST — the
    * fourth EOS pattern in this repo, and the cheapest: because the
    * gate is stateless, Spark's transactional file sink alone gives
    * end-to-end exactly-once (each micro-batch's files commit
    * atomically into `_spark_metadata`; a replayed batch id is
    * skipped by the sink, and readers going through
    * `spark.read.parquet(store)` see only committed files). Contrast:
    * the orders sink needs a JDBC transaction, TrendingTokens a
    * batchId gate, SnapshotMaintain convergent merges — all because
    * they UPDATE state. Append-only lets the sink do the work. */
  def ingestGated(spark: SparkSession, srcDir: String, store: String,
      checkpoint: String): DataStreamWriter[org.apache.spark.sql.Row] =
    gate(spark.readStream.schema(docSchema).json(srcDir))
      .writeStream
      .outputMode("append")
      .format("parquet")
      .option("path", store)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.ProcessingTime("1 second"))
}
