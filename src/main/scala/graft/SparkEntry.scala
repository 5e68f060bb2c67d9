package graft

import graft.operators._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col => col_}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in `queries` has a DuckDB twin in `Oracle.sql` (same
  * column names/types, bit-identical values — see Oracle's conventions).
  */
object SparkEntry {

  /** Flagship: the reference's full signal→decision pipeline
    * (SURVEY §3.1) in batch form on sf0.001 — the COMPLETE decision
    * record including the nested signals array (round 2). */
  def entry(spark: SparkSession): DataFrame =
    Decide.decisionsNested(Tables.events(spark, "/root/testdata/sf0.001"))

  /** One entry per implemented operator family from SURVEY.md §2 plus the
    * LLM-data-pipeline tier. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // --- reference pipeline (SURVEY §2.2-§2.8) ---
    "sig_parse_enrich" -> ((s, d) => SignalOps.parseEnrich(Tables.events(s, d))),
    "sig_outliers" -> ((s, d) => SignalOps.outliers(s, d)),
    "sig_union_merge" -> ((s, d) => SignalOps.unionMerge(Tables.events(s, d))),
    "sig_window_agg" -> ((s, d) =>
      WindowAgg.windowAgg(Tables.events(s, d)).orderBy("w_start", "symbol")),
    // Full D6 record: the nested signals array rides as ArrayType in the
    // library API (Decide.decisionsNested); for the scalar-based oracle
    // compare it is emitted as canonical JSON here and element-by-element
    // in sig_decision_signals below.
    // the nested decision record is the SHARED artifact both decision
    // queries render from (JSON wire form vs element-wise explosion) —
    // one materialization per events input, like the reference's
    // persisted decisions table
    "sig_decisions" -> ((s, d) => {
      val n = graft.Artifacts.shared(Decide.decisionsNested(Tables.events(s, d)))
      n.withColumn("signals_json", Decide.signalsJson(col_("signals")))
        .drop("signals")
        .orderBy("w_start", "symbol")
    }),
    "sig_decision_signals" -> ((s, d) =>
      graft.Artifacts.shared(Decide.decisionsNested(Tables.events(s, d)))
        .select(col_("w_start"), col_("symbol"),
          org.apache.spark.sql.functions.posexplode(col_("signals"))
            .as(Seq("idx", "sig")))
        .select(col_("w_start"), col_("symbol"),
          (col_("idx") + 1).cast("long").as("sig_rank"),
          col_("sig.ts_ms").as("sig_ts_ms"),
          col_("sig.event_id").as("sig_event_id"),
          col_("sig.timeframe").as("sig_timeframe"),
          col_("sig.side").as("sig_side"),
          col_("sig.price").as("sig_price"),
          col_("sig.qty").as("sig_qty"))
        .orderBy("w_start", "symbol", "sig_rank")),
    "ord_orders" -> ((s, d) =>
      OrderOps.orders(s, Tables.events(s, d)).orderBy("w_start", "symbol")),
    "cdc_outbox_route" -> ((s, d) =>
      CdcRoute.outboxEvents(s, Tables.events(s, d)).orderBy("aggregate_id")),
    "cdc_snapshot_merge" -> ((s, d) => CdcRoute.snapshotMerge(s, d)),
    "cdc_scd2" -> ((s, d) => CdcRoute.scd2History(s, d)),
    "cdc_scd2_asof" -> ((s, d) => CdcRoute.scd2AsOf(s, d)),
    // --- relational suite (SURVEY §2.11 — free with Spark, still verified) ---
    "q1_pricing" -> ((s, d) => Relational.q1Pricing(s, d)),
    "q3_topk" -> ((s, d) => Relational.q3TopK(s, d)),
    "q5_join" -> ((s, d) => Relational.q5Join(s, d)),
    "join_semi" -> ((s, d) => Relational.joinSemi(s, d)),
    "join_anti" -> ((s, d) => Relational.joinAnti(s, d)),
    "wf_rank_topk" -> ((s, d) => Relational.wfRankTopPerGroup(s, d)),
    "wf_lag_delta" -> ((s, d) => Relational.wfLagDelta(s, d)),
    "rollup_acctbal" -> ((s, d) => Relational.rollupAcctbal(s, d)),
    "distinct_agg" -> ((s, d) => Relational.distinctAgg(s, d)),
    "events_tumbling" -> ((s, d) => Relational.eventsTumbling(s, d)),
    "events_hopping" -> ((s, d) => Relational.eventsHopping(s, d)),
    "events_funnel" -> ((s, d) => Relational.eventsFunnel(s, d)),
    "events_retention" -> ((s, d) => Relational.eventsRetention(s, d)),
    "setops_customers" -> ((s, d) => Relational.setOpsCustomers(s, d)),
    "grouping_sets" -> ((s, d) => Relational.groupingSetsOrders(s, d)),
    "doc_unpivot" -> ((s, d) => Relational.unpivotQuality(s, d)),
    "wf_range_frame" -> ((s, d) => Relational.wfRangeFrame(s, d)),
    "asof_join" -> ((s, d) => Relational.asofJoin(s, d)),
    "sessionize" -> ((s, d) => Relational.sessionize(s, d)),
    "cube_orders" -> ((s, d) => Relational.cubeOrders(s, d)),
    "interval_join" -> ((s, d) => Relational.intervalJoin(s, d)),
    "approx_distinct" -> ((s, d) => Relational.approxDistinct(s, d)),
    "percentiles" -> ((s, d) => Relational.percentiles(s, d)),
    "percentiles_dist" -> ((s, d) => Relational.percentilesDist(s, d)),
    "approx_percentiles" -> ((s, d) => Relational.approxPercentiles(s, d)),
    "hll_daily_merge" -> ((s, d) => Relational.hllDailyMerge(s, d)),
    "kll_daily_merge" -> ((s, d) => Relational.kllDailyMerge(s, d)),
    "events_overlap_theta" -> ((s, d) => Relational.eventsOverlapTheta(s, d)),
    "dq_report" -> ((s, d) => Relational.dqReport(s, d)),
    "events_key_skew" -> ((s, d) => Relational.eventsKeySkew(s, d)),
    // --- LLM-data-pipeline tier: text analysis ---
    "doc_token_stats" -> ((s, d) => TextOps.tokenStats(s, d)),
    "doc_top_tokens" -> ((s, d) => TextOps.topTokensSalted(s, d)),
    // sketch tier — oracle-checked via its EXACT mode (vocabulary fits
    // the Misra-Gries map at test SFs, r7 verdict #4); accuracy also
    // asserted against the salted exact top-k in the spec
    "approx_top_tokens" -> ((s, d) => TextOps.approxTopTokens(s, d)),
    "doc_lang_id" -> ((s, d) => TextOps.langId(s, d)),
    "doc_quality" -> ((s, d) => TextOps.quality(s, d)),
    "doc_fingerprint" -> ((s, d) => TextOps.fingerprint(s, d)),
    "doc_winnow" -> ((s, d) => TextOps.winnow(s, d)),
    "dedup_winnow_pairs" -> ((s, d) => TextOps.winnowPairs(s, d)),
    "doc_chunk" -> ((s, d) => TextOps.chunk(s, d)),
    "doc_pack" -> ((s, d) => TextOps.pack(s, d)),
    "doc_contamination" -> ((s, d) => TextOps.contamination(s, d)),
    "doc_decontam_bloom" -> ((s, d) => TextOps.contaminationBloom(s, d)),
    "doc_rarity" -> ((s, d) => TextOps.rarity(s, d)),
    "doc_tfidf" -> ((s, d) => TextOps.tfidf(s, d)),
    "doc_pivot" -> ((s, d) => TextOps.pivotSourceLang(s, d)),
    "doc_repetition" -> ((s, d) => TextOps.repetition(s, d)),
    "doc_gopher_rules" -> ((s, d) => TextOps.gopherRules(s, d)),
    "doc_span_dedup" -> ((s, d) => TextOps.spanDedup(s, d)),
    "doc_substring_dedup" -> ((s, d) => TextOps.substringDedup(s, d)),
    "doc_substring_strip" -> ((s, d) => TextOps.substringStrip(s, d)),
    "doc_leakage_split" -> ((s, d) => TextOps.leakageSplit(s, d)),
    "dedup_keep_best" -> ((s, d) => TextOps.dedupKeepBest(s, d)),
    "doc_training_set" -> ((s, d) => TextOps.trainingSet(s, d)),
    "corpus_report" -> ((s, d) => TextOps.corpusReport(s, d)),
    // the composed ingest's batch face: gate → exact → near → substring
    // cascade, per-doc settling stage (streaming.IngestPipeline)
    "doc_ingest_cascade" -> ((s, d) => streaming.IngestPipeline.cascade(s, d)),
    "doc_length_histogram" -> ((s, d) => TextOps.lengthHistogram(s, d)),
    "doc_mix_sample" -> ((s, d) => TextOps.mixSample(s, d)),
    "doc_token_budget" -> ((s, d) => TextOps.tokenBudget(s, d)),
    "doc_curate" -> ((s, d) => TextOps.curate(s, d)),
    "doc_pii_redact" -> ((s, d) => TextOps.piiRedactQuery(s, d)),
    "doc_shard_shuffle" -> ((s, d) => TextOps.shardShuffle(s, d)),
    // tokenizer tier: trained state (merges / piece costs) is shared
    // with the twin via the __GRAFT_OUT__ dump; segmentation and usage
    // counts are re-derived independently in DuckDB (see Oracle.scala)
    "vocab_bpe_merges" -> ((s, d) => TextOps.bpeMerges(s, d)),
    "doc_bpe_segment" -> ((s, d) => TextOps.bpeSegmentCounts(s, d)),
    "vocab_unigram" -> ((s, d) => TextOps.unigramVocab(s, d)),
    "doc_unigram_segment" -> ((s, d) => TextOps.unigramSegmentCounts(s, d)),
    "doc_bigram_lm" -> ((s, d) => TextOps.bigramLm(s, d)),
    "doc_classifier_score" -> ((s, d) => TextOps.classifierScore(s, d)),
    "doc_hash_embed" -> ((s, d) => TextOps.hashEmbed(s, d)),
    "doc_ppl_buckets" -> ((s, d) => TextOps.pplBuckets(s, d)),
    "emb_hash_topk" -> ((s, d) => TextOps.hashEmbedTopK(s, d)),
    "emb_hash_ann" -> ((s, d) => TextOps.hashEmbedAnn(s, d)),
    "doc_importance_dsir" -> ((s, d) => TextOps.importanceDsir(s, d)),
    // --- dedup ---
    "dedup_exact" -> ((s, d) => TextOps.dedupExact(s, d)),
    "dedup_normalized" -> ((s, d) => TextOps.dedupNormalized(s, d)),
    "dedup_canonical" -> ((s, d) => TextOps.dedupCanonical(s, d)),
    "doc_sample_stratified" -> ((s, d) => TextOps.sampleStratified(s, d)),
    "doc_sample_grouped" -> ((s, d) => TextOps.sampleGrouped(s, d)),
    "dedup_ngram_jaccard" -> ((s, d) => TextOps.ngramJaccardPairs(s, d)),
    "dedup_cross_source" -> ((s, d) => TextOps.crossSourceDupReport(s, d)),
    "dedup_clusters" -> ((s, d) => TextOps.dedupClusters(s, d)),
    "dedup_clusters_ls" -> ((s, d) => TextOps.dedupClustersLS(s, d)),
    "dedup_minhash_lsh" -> ((s, d) => MinHashOps.minhashLshPairs(s, d)),
    "dedup_incremental" -> ((s, d) => MinHashOps.incrementalNearDup(s, d)),
    "doc_simhash" -> ((s, d) => MinHashOps.simhash(s, d)),
    "dedup_simhash_pairs" -> ((s, d) => MinHashOps.simhashPairs(s, d)),
    // --- similarity search ---
    "emb_cosine_topk" -> ((s, d) => EmbeddingOps.cosineTopK(s, d)),
    "emb_curated_topk" -> ((s, d) => EmbeddingOps.curatedTopK(s, d)),
    "emb_cosine_neardup" -> ((s, d) => EmbeddingOps.cosineNearDup(s, d)),
    "emb_ann_lsh" -> ((s, d) => EmbeddingOps.annLsh(s, d)),
    "emb_ann_ivf" -> ((s, d) => EmbeddingOps.annIvf(s, d)),
    "emb_ann_ivf2" -> ((s, d) => EmbeddingOps.annIvfRefined(s, d)),
    "emb_ann_pq" -> ((s, d) => EmbeddingOps.annPq(s, d)),
    "emb_ann_ivfpq" -> ((s, d) => EmbeddingOps.annIvfPq(s, d)),
    "emb_ann_pq2" -> ((s, d) => EmbeddingOps.annPqRefined(s, d)),
    "emb_ann_binary" -> ((s, d) => EmbeddingOps.annBinary(s, d)),
    "emb_semdedup" -> ((s, d) => EmbeddingOps.semDedup(s, d)),
    "emb_quantize" -> ((s, d) => EmbeddingOps.quantize(s, d)),
    "emb_source_centroids" -> ((s, d) => EmbeddingOps.sourceCentroids(s, d)),
    // --- multimodal plumbing ---
    "mm_media_meta" -> ((s, d) => MultimodalOps.mediaMetaQuery(s, d)),
    "mm_frame_sample" -> ((s, d) => MultimodalOps.frameSampleQuery(s, d)),
    "mm_resize" -> ((s, d) => MultimodalOps.resizeQuery(s, d))
  )

  /** DuckDB twins — the driver's correctness gate. */
  def oracleSql: Map[String, String] = Oracle.sql
}
