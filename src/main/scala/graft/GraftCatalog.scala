package graft

import graft.plans.GraftFunctions
import org.apache.spark.sql.SparkSession

/** SQL entry point: register every test-data table as a temp view plus
  * graft's custom functions, so a SQL-first user drives the whole
  * engine through `spark.sql` — the interface a reference user switches
  * to with zero DataFrame code.
  *
  * Views are zero-copy plan aliases (no materialization); predicate
  * pushdown, pruning, and every Catalyst optimization apply exactly as
  * through the DataFrame API. Production would register the same names
  * in a real metastore catalog with `saveAsTable`/external locations —
  * the query surface is identical.
  */
object GraftCatalog {

  val tableNames: Seq[String] = Seq("region", "nation", "customer",
    "supplier", "part", "orders", "lineitem", "events", "documents",
    "embeddings")

  /** Register all tables of `dir` as temp views + the custom functions.
    * Idempotent; re-registering repoints the views at a new dir. */
  def registerAll(spark: SparkSession, dir: String): Unit = {
    tableNames.foreach { name =>
      val df = name match {
        case "events" => Tables.events(spark, dir) // nanos-ts handling
        // single-file CPU-bound tables get the documented repartition so
        // SQL users' interpreted expressions (graft_trigrams etc.) run
        // parallel, not on one input split
        case "documents" => Tables.documentsPar(spark, dir)
        case "embeddings" => Tables.embeddingsPar(spark, dir)
        case _ => Tables.table(spark, dir, name)
      }
      df.createOrReplaceTempView(name)
    }
    GraftFunctions.register(spark)
  }

  /** Session conf key the lazy view resolver reads (see
    * `plans.LazyGraftViews`). */
  val LazyViewDirKey = "spark.graft.lazyViews.dir"

  /** Queries whose BUILDERS execute driver-side Spark actions at plan-
    * construction time — registering these as temp views runs real jobs
    * at registration and freezes the collected state (IVF centroids,
    * the bloom's bit array, CC labels) at that instant (advice r4).
    * They are excluded from the default temp-view registration; the
    * lazy resolver (enableLazyViews) serves them on first SELECT
    * instead, or `includeEager = true` opts into eager registration. */
  val eagerQueries: Set[String] = Set(
    "emb_ann_lsh",        // N-derived bit width: one count()
    "emb_cosine_neardup", // same N-derived bit width (shared memo)
    "emb_ann_ivf",        // collected init centroids
    "emb_ann_ivf2",       // collected centroids + integer Lloyd sums
    "dedup_clusters",     // label propagation: convergence action per round
    "dedup_clusters_ls",  // large/small-star: fingerprint head() per round
    "doc_leakage_split",  // same large/small-star labels: head() per round
    "dedup_keep_best",    // same large/small-star labels: head() per round
    "doc_decontam_bloom", // bloom build: count() + treeAggregate
    "vocab_bpe_merges",   // BPE trainer: top-pair collect per round
    "approx_top_tokens",  // sketch build: mapPartitions collect
    "kll_daily_merge",    // daily sketch collect + driver merge
    "doc_bpe_segment",    // trains (collects) the merges first
    "emb_ann_pq",         // collected codebook seed vectors
    "emb_ann_ivfpq",      // collected codebooks + coarse cells
    "emb_ann_pq2",        // codebook seed + integer Lloyd sums
    "emb_semdedup",       // collected centroids + the bits count
    "events_overlap_theta", // per-partition sketch collect + driver algebra
    "vocab_unigram",      // EM training: seed + per-round usage collects
    "doc_unigram_segment", // trains (collects) the piece table first
    "emb_hash_ann",       // collected coarse-centroid seed vectors
    "doc_ingest_cascade") // screen cascade: per-stage localCheckpoints

  /** Register library queries as temp views `graft_<name>` — the
    * operator surface behind plain `SELECT * FROM graft_doc_tfidf`.
    * Registered views are UNMATERIALIZED plan aliases: a SQL user's
    * filter or projection on top composes into the same Catalyst plan
    * the DataFrame caller gets (pushdown through the view is pinned by
    * GraftCatalogSpec), and the queries run only when selected. The
    * `eagerQueries` above are the exception — their builders run jobs
    * at plan construction — so by default they are SKIPPED here (zero
    * jobs at registration, asserted by spec); pass `includeEager =
    * true` to register them too, accepting the construction-time jobs
    * and state freeze. */
  def registerQueryViews(spark: SparkSession, dir: String,
      includeEager: Boolean = false): Unit =
    SparkEntry.queries.foreach { case (name, fn) =>
      if (includeEager || !eagerQueries(name))
        fn(spark, dir).createOrReplaceTempView(s"graft_$name")
    }

  /** The genuinely lazy face of the full query surface — REQUIRES a
    * session built with spark.sql.extensions=graft.plans.GraftExtensions:
    * stamps `dir` on the session and lets the injected resolution rule
    * expand `graft_<name>` relations on first reference. Every query —
    * eager builders included — becomes SQL-addressable with zero work
    * until something actually selects from it. */
  def enableLazyViews(spark: SparkSession, dir: String): Unit =
    spark.conf.set(LazyViewDirKey, dir)

  /** One-call session setup — the "use this library from spark-sql"
    * entry: tables + custom functions + the full query-view surface.
    * Zero jobs run here. On an extensions-built session the eager
    * builders stay reachable through lazy resolution (first SELECT
    * pays their construction); on a plain session they are simply not
    * registered (see `eagerQueries`) and the DataFrame API remains
    * their entry. */
  def init(spark: SparkSession, dir: String): Unit = {
    registerAll(spark, dir)
    enableLazyViews(spark, dir)
    registerQueryViews(spark, dir)
  }
}
