package graft

/** The SQL-first user path: views + custom functions through spark.sql,
  * with the same plan quality as the DataFrame API. */
class GraftCatalogSpec extends SparkSpec {

  test("registered views answer SQL with pushdown intact") {
    GraftCatalog.registerAll(spark, sf())
    val df = spark.sql(
      """SELECT r_name, count(1) AS n
         FROM customer
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         WHERE c_acctbal > 0
         GROUP BY r_name ORDER BY r_name""")
    val rows = df.collect()
    assert(rows.length == 5, "five regions expected")
    // the acctbal filter must reach the parquet scan through the view
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(c_acctbal), GreaterThan(c_acctbal"),
      s"filter not pushed through the temp view:\n$plan")
  }

  test("custom functions are callable from SQL") {
    GraftCatalog.registerAll(spark, sf())
    val n = spark.sql(
      """SELECT doc_id, size(graft_trigrams(split(text, ' '))) AS n_shingles
         FROM documents WHERE doc_id < 10""").collect()
    assert(n.length == 10)
    assert(n.forall(_.getInt(1) > 0), "shingles must derive through SQL")
  }

  test("events view carries the nanos-timestamp handling") {
    GraftCatalog.registerAll(spark, sf())
    val r = spark.sql(
      "SELECT count(1) AS n FROM events WHERE ts IS NOT NULL").head()
    assert(r.getLong(0) > 0, "events must be readable through the view")
  }

  test("default view registration runs ZERO jobs and skips the eager " +
    "builders; includeEager opts them in") {
    GraftCatalog.registerAll(spark, sf())
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      // calibrate: how many jobs does the marker action itself cost
      // (listener delivery is async — settle by waiting for stability)
      def settle(): Int = {
        var last = -1
        var cur = jobs.get()
        while (cur != last) { Thread.sleep(100); last = cur; cur = jobs.get() }
        cur
      }
      spark.range(1).count()
      val c0 = settle()
      spark.range(1).count()
      val markerCost = settle() - c0
      val before = jobs.get()
      GraftCatalog.registerQueryViews(spark, sf())
      // marker job: the listener bus is ordered, so once its jobs land
      // every event from the registration above has been delivered
      spark.range(1).count()
      val ran = settle() - before - markerCost
      assert(ran == 0,
        s"view registration ran $ran eager jobs — " +
          "plan-construction actions leaked into the default path")
    } finally spark.sparkContext.removeSparkListener(listener)
    // the eager queries are absent by default, present with includeEager
    for (e <- GraftCatalog.eagerQueries)
      assert(!spark.catalog.tableExists(s"graft_$e"), s"graft_$e registered eagerly")
    GraftCatalog.registerQueryViews(spark, sf(), includeEager = true)
    assert(spark.catalog.tableExists("graft_emb_ann_ivf"))
    assert(spark.sql("SELECT * FROM graft_emb_ann_ivf").count() > 0)
  }

  test("every library query is selectable as a graft_* view, and a " +
    "filter on top composes into the view's plan") {
    GraftCatalog.registerAll(spark, sf())
    GraftCatalog.registerQueryViews(spark, sf(), includeEager = true)
    // spot-run one query per tier through plain SQL
    for (v <- Seq("graft_q1_pricing", "graft_doc_tfidf", "graft_dedup_exact",
        "graft_emb_cosine_topk", "graft_events_funnel", "graft_cdc_snapshot_merge"))
      assert(spark.sql(s"SELECT * FROM $v").count() > 0, s"$v returned no rows")
    // composition: the user's filter lands in the same optimized plan
    val filtered = spark.sql(
      "SELECT doc_id FROM graft_doc_tfidf WHERE term_rank = 1")
    assert(filtered.count() ==
      spark.sql("SELECT count(DISTINCT doc_id) FROM graft_doc_tfidf").head().getLong(0),
      "every doc must have exactly one rank-1 term")
  }
}
