package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational query suite (SURVEY.md §2.11): the categories the reference
  * lacks but Spark provides natively — exercised so a reference user gets
  * the full relational surface from this engine. All money aggregates
  * accumulate in exact DECIMAL and convert to DOUBLE only at the end
  * (identical formulas in graft.Oracle), so hash-compare vs DuckDB is
  * bit-stable under any degree of parallelism.
  *
  * Scale notes per query are inline; the common rules: filters stay
  * ahead of joins (Catalyst pushes them into the parquet scan), small
  * dimension tables are broadcast explicitly, and every query's plan was
  * checked with explain(formatted) for PushedFilters/pruned ReadSchema.
  */
object Relational {

  private def dec(c: String, t: String) = col(c).cast(t)

  /** TPC-H Q1-style pricing summary: single scan, partial-agg friendly,
    * 6-row result — the shuffle moves only per-group partial sums. */
  def q1Pricing(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val qty = dec("l_quantity", "decimal(12,2)")
    val ep = dec("l_extendedprice", "decimal(14,2)")
    val disc = dec("l_discount", "decimal(4,2)")
    val tax = dec("l_tax", "decimal(4,2)")
    li.filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum(qty).cast("double").as("sum_qty"),
        sum(ep).cast("double").as("sum_base_price"),
        sum(ep * (lit(1) - disc)).cast("double").as("sum_disc_price"),
        sum(ep * (lit(1) - disc) * (lit(1) + tax)).cast("double").as("sum_charge"),
        (sum(qty).cast("double") / count(lit(1))).as("avg_qty"),
        (sum(ep).cast("double") / count(lit(1))).as("avg_price"),
        (sum(disc).cast("double") / count(lit(1))).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** TPC-H Q3-style shipping-priority top-k. The exact-decimal revenue is
    * also the sort key, so the top-10 cut is deterministic cross-engine.
    * Join order: filtered orders ⋈ lineitem (both pushed-down scans),
    * customer side reduced by segment filter before joining. */
  def q3TopK(spark: SparkSession, dir: String): DataFrame = {
    val cutoff = lit("1995-03-15").cast("timestamp")
    val c = Tables.customer(spark, dir).filter(col("c_mktsegment") === "BUILDING")
    val o = Tables.orders(spark, dir).filter(col("o_orderdate") < cutoff)
    val l = Tables.lineitem(spark, dir).filter(col("l_shipdate") > cutoff)
    val ep = dec("l_extendedprice", "decimal(14,2)")
    val disc = dec("l_discount", "decimal(4,2)")
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
      .agg(sum(ep * (lit(1) - disc)).as("revenue_dec"))
      .orderBy(col("revenue_dec").desc, col("l_orderkey"))
      .limit(10)
      .select(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"),
        col("revenue_dec").cast("double").as("revenue"))
  }

  /** TPC-H Q5-style multi-join: region/nation are broadcast (tiny dims
    * never shuffle the fact side); customer⋈orders⋈lineitem⋈supplier
    * shuffle on their keys with AQE free to re-plan. */
  def q5Join(spark: SparkSession, dir: String): DataFrame = {
    val r = Tables.region(spark, dir).filter(col("r_name") === "ASIA")
    val n = Tables.nation(spark, dir)
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp")
        && col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
    val l = Tables.lineitem(spark, dir)
    val s = Tables.supplier(spark, dir)
    val ep = dec("l_extendedprice", "decimal(14,2)")
    val disc = dec("l_discount", "decimal(4,2)")
    c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .join(o, o("o_custkey") === c("c_custkey"))
      .join(l, l("l_orderkey") === o("o_orderkey"))
      .join(s, l("l_suppkey") === s("s_suppkey") && s("s_nationkey") === c("c_nationkey"))
      .groupBy("n_name")
      .agg(sum(ep * (lit(1) - disc)).as("revenue_dec"))
      .orderBy(col("revenue_dec").desc, col("n_name"))
      .select(col("n_name"), col("revenue_dec").cast("double").as("revenue"))
  }

  /** Left-semi join (EXISTS): customers holding at least one 'F' order. */
  def joinSemi(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir).filter(col("o_orderstatus") === "F")
    Tables.customer(spark, dir)
      .join(o, col("c_custkey") === col("o_custkey"), "left_semi")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")
  }

  /** Left-anti join (NOT EXISTS): customers with no urgent order. */
  def joinAnti(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir).filter(col("o_orderpriority") === "1-URGENT")
    Tables.customer(spark, dir)
      .join(o, col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")
  }

  /** Ranking window function: top-3 orders per customer by price.
    * Single hash exchange on o_custkey + sort; no global sort of the
    * fact table. */
  def wfRankTopPerGroup(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(spark, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("rn"))
      .orderBy("o_custkey", "rn")
  }

  /** Analytic window function: per-user event-over-event value delta
    * (lag) — the classic sessionized-stream derivative. */
  def wfLagDelta(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
      .withColumn("ts_ms", unix_millis(col("ts")))
    val w = Window.partitionBy("user_id").orderBy("ts_ms", "event_id")
    e.withColumn("prev_value", lag(col("value"), 1).over(w))
      .withColumn("delta", col("value") - col("prev_value"))
      .select("event_id", "user_id", "ts_ms", "value", "prev_value", "delta")
      .orderBy("event_id")
  }

  /** ROLLUP over region -> nation of customer account balances (exact
    * cents accumulation). Expressed through the SQL interface: Spark
    * 4.1's DetectAmbiguousSelfJoin false-positives on rollup-after-join
    * in the DataFrame API (the Expand duplicates dataset-tagged
    * attributes); the SQL path builds the identical plan from fresh
    * attributes. */
  def rollupAcctbal(spark: SparkSession, dir: String): DataFrame = {
    Tables.customer(spark, dir).createOrReplaceTempView("g_customer")
    Tables.nation(spark, dir).createOrReplaceTempView("g_nation")
    Tables.region(spark, dir).createOrReplaceTempView("g_region")
    spark.sql("""
      SELECT r_name, n_name,
        SUM(CAST(round(c_acctbal * 100) AS BIGINT)) / 1e2 AS sum_acctbal,
        count(1) AS n_customers
      FROM g_customer
      JOIN g_nation ON c_nationkey = n_nationkey
      JOIN g_region ON n_regionkey = r_regionkey
      GROUP BY ROLLUP(r_name, n_name)
      ORDER BY r_name ASC NULLS FIRST, n_name ASC NULLS FIRST""")
  }

  /** Multiple distinct aggregations in one pass (Spark expands to a
    * single multi-phase aggregate). */
  def distinctAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy("l_returnflag")
      .agg(
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        count(lit(1)).as("n_rows"))
      .orderBy("l_returnflag")

  /** Native tumbling event-time window (the batch face of the streaming
    * `groupBy(window(...))` — identical logical plan in readStream). */
  def eventsTumbling(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(window(col("ts"), "1 day").as("w"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        (sum(round(col("value") * 100).cast("long")) / 100.0).as("sum_value"))
      .select(unix_millis(col("w.start")).as("w_start"), col("event_type"),
        col("n"), col("sum_value"))
      .orderBy("w_start", "event_type")

  /** HOPPING (sliding) window aggregation — 2-day windows every 1 day,
    * Spark's native `window(ts, size, slide)`: each event lands in
    * size/slide windows, starts epoch-aligned to the slide. The oracle
    * twin replays the same alignment arithmetic with an explicit 2-row
    * unnest (window_start = (ts div slide)*slide - i*slide). */
  def eventsHopping(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(window(col("ts"), "2 days", "1 day").as("w"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        (sum(round(col("value") * 100).cast("long")) / 100.0).as("sum_value"))
      .select(unix_millis(col("w.start")).as("w_start"), col("event_type"),
        col("n"), col("sum_value"))
      .orderBy("w_start", "event_type")

  /** Set operations over derived relations (free with Spark; verified
    * anyway): customers active in BOTH years (INTERSECT = distinct set
    * semantics) and in 1996 but not 1995 (EXCEPT). */
  def setOpsCustomers(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    def custsIn(year: Int) = o
      .filter(col("o_orderdate") >= lit(s"$year-01-01").cast("timestamp") &&
        col("o_orderdate") < lit(s"${year + 1}-01-01").cast("timestamp"))
      .select(col("o_custkey"))
    val both = custsIn(1995).intersect(custsIn(1996))
      .withColumn("set_kind", lit("both_years"))
    val only96 = custsIn(1996).except(custsIn(1995))
      .withColumn("set_kind", lit("only_1996"))
    both.union(only96)
      .select(col("set_kind"), col("o_custkey"))
      .orderBy("set_kind", "o_custkey")
  }

  /** Sessionization: split each user's event stream at >30-minute gaps
    * (gaps-and-islands via lag + running sum — one exchange on user_id,
    * two window passes over the same sort; the native `session_window`
    * is the streaming face of the same operator). */
  def sessionize(spark: SparkSession, dir: String): DataFrame = {
    val gapMs = 30L * 60L * 1000L
    val e = Tables.events(spark, dir).withColumn("ts_ms", unix_millis(col("ts")))
    val byUser = Window.partitionBy("user_id").orderBy("ts_ms", "event_id")
    val newSession = when(
      col("ts_ms") - lag(col("ts_ms"), 1).over(byUser) >= gapMs || lag(col("ts_ms"), 1).over(byUser).isNull, 1L
    ).otherwise(0L)
    e.withColumn("new_s", newSession)
      .withColumn("session_id",
        sum(col("new_s")).over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy("user_id", "session_id")
      .agg(
        min(col("ts_ms")).as("session_start"),
        max(col("ts_ms")).as("session_end"),
        count(lit(1)).as("n_events"),
        (sum(round(col("value") * 100).cast("long")) / 100.0).as("sum_value"))
      .orderBy("user_id", "session_id")
  }

  /** FUNNEL conversion — view → click → purchase in ORDER per user: the
    * event-analytics staple. Stage progress is a running min over the
    * user's ordered stream (a click only qualifies after a view has been
    * seen, a purchase only after a qualified click), so the whole funnel
    * is three windowed columns + one aggregate on the SAME user_id
    * partitioning — one exchange, no self-joins, no per-user event list
    * ever buffered (the collect-free shape that survives a user with
    * millions of events). ROWS frame spelled explicitly on both engines
    * (Spark's default for an ordered window is RANGE). */
  def eventsFunnel(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), unix_millis(col("ts")).as("ts_ms"),
        col("event_id"))
    val w = Window.partitionBy("user_id").orderBy("ts_ms", "event_id")
      .rowsBetween(Window.unboundedPreceding, 0)
    val e2 = e
      .withColumn("seen_view",
        min(when(col("event_type") === "view", col("ts_ms"))).over(w))
      .withColumn("qclick_ts",
        when(col("event_type") === "click" && col("seen_view").isNotNull,
          col("ts_ms")))
      .withColumn("seen_qclick", min(col("qclick_ts")).over(w))
      .withColumn("conv_ts",
        when(col("event_type") === "purchase" && col("seen_qclick").isNotNull,
          col("ts_ms")))
    e2.groupBy("user_id")
      .agg(
        min(when(col("event_type") === "view", col("ts_ms"))).as("first_view_ms"),
        min(col("qclick_ts")).as("first_click_ms"),
        min(col("conv_ts")).as("first_purchase_ms"),
        count(lit(1)).as("n_events"))
      .withColumn("converted", col("first_purchase_ms").isNotNull)
      .select("user_id", "first_view_ms", "first_click_ms",
        "first_purchase_ms", "n_events", "converted")
      .orderBy("user_id")
  }

  /** COHORT RETENTION — users grouped by first-activity day, counted on
    * each later active day offset: the second event-analytics staple.
    * Two aggregates and one join, all keyed by user_id/day — the
    * cohort table is one slim row per user (broadcastable against the
    * activity set at any scale), day arithmetic is integer millis-div. */
  def eventsRetention(spark: SparkSession, dir: String): DataFrame = {
    val dayMs = 86400000L
    val e = Tables.events(spark, dir)
      .select(col("user_id"),
        expr(s"unix_millis(ts) div $dayMs").as("day"))
    val cohort = e.groupBy("user_id").agg(min(col("day")).as("cohort_day"))
    val active = e.distinct()
    active.join(cohort, "user_id")
      .withColumn("k", col("day") - col("cohort_day"))
      .groupBy("cohort_day", "k")
      .agg(count(lit(1)).as("n_users"))
      .orderBy("cohort_day", "k")
  }

  /** CUBE over order priority × status (all four grouping sets). */
  def cubeOrders(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .cube("o_orderpriority", "o_orderstatus")
      .agg(
        count(lit(1)).as("n"),
        (sum(round(col("o_totalprice") * 100).cast("long")) / 100.0).as("sum_price"))
      .orderBy(asc_nulls_first("o_orderpriority"), asc_nulls_first("o_orderstatus"))

  /** Interval (range) join, the scalable way: clicks within the hour
    * before each purchase. A naive theta join is O(clicks×purchases)
    * per user; bucketing both sides by the hour and joining each
    * purchase to its own and the previous bucket makes it an equi-join
    * whose candidates are only the two adjacent hours — the standard
    * range-join decomposition (candidate set ~2/24th of a day per
    * purchase instead of everything). */
  def intervalJoin(spark: SparkSession, dir: String): DataFrame = {
    val hourMs = 3600000L
    val e = Tables.events(spark, dir)
      .withColumn("ts_ms", unix_millis(col("ts")))
      .withColumn("bucket", expr(s"ts_ms div $hourMs"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts_ms").as("p_ts"), col("bucket"))
      .withColumn("probe", explode(array(col("bucket"), col("bucket") - 1)))
      .drop("bucket")
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts_ms").as("c_ts"),
        round(col("value") * 100).cast("long").as("c_value_c"),
        col("bucket").as("probe"))
    purchases.join(clicks, Seq("user_id", "probe"))
      .filter(col("c_ts") >= col("p_ts") - hourMs && col("c_ts") < col("p_ts"))
      .groupBy("event_id", "user_id", "p_ts")
      .agg(
        count(lit(1)).as("n_clicks_1h"),
        (sum(col("c_value_c")) / 100.0).as("click_value_1h"))
      .orderBy("event_id")
  }

  /** Ordered statistics: exact interpolated median / p90 of order value
    * per status. Accumulation is integer cents; Spark `percentile` and
    * DuckDB `quantile_cont` use the same (n-1)p linear interpolation, so
    * the doubles match bit-for-bit (probed before adoption). */
  def percentiles(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .withColumn("cents", round(col("o_totalprice") * 100).cast("long"))
      .groupBy("o_orderstatus")
      .agg(
        (expr("percentile(cents, 0.5)") / 100.0).as("median_price"),
        (expr("percentile(cents, 0.9)") / 100.0).as("p90_price"),
        count(lit(1)).as("n"))
      .orderBy("o_orderstatus")

  /** Exact quantiles, the DISTRIBUTED way (the 100 TB face of
    * `percentiles`): Spark's `percentile` aggregate buffers every group
    * value in the aggregation buffer — O(group) reducer MEMORY, the
    * exact-tier scale ceiling. This variant never materializes a group:
    *  1. compact to (status, cents) VALUE COUNTS — map-side combinable,
    *     so the one real shuffle carries distinct values, not rows
    *     (duplicates collapse at the mapper; a 100 TB orders table has
    *     bounded price cardinality);
    *  2. a cumulative-count window over the compacted table assigns
    *     each distinct value its rank span [cum-c+1, cum];
    *  3. the quantile's bracketing ranks lo=floor((n-1)p)+1 and lo+1
    *     pick their values by span membership — a filter that keeps
    *     ≤4 rows per group — and the same (n-1)p linear interpolation
    *     as `percentile`/`quantile_cont` reconstitutes the exact
    *     result, bit-for-bit (PercentilesDistSpec asserts equality
    *     against the buffering tier).
    * The per-group window sort spills through UnsafeExternalSorter
    * (disk, not memory) and sorts DISTINCT values only. */
  def percentilesDist(spark: SparkSession, dir: String): DataFrame =
    quantilesByValueCounts(
      Tables.orders(spark, dir).select(
        col("o_orderstatus").as("key"),
        round(col("o_totalprice") * 100).cast("long").as("cents")),
      Seq(0.5 -> "median_price", 0.9 -> "p90_price"))
      .withColumnRenamed("key", "o_orderstatus")
      .orderBy("o_orderstatus")

  /** The value-count quantile engine behind `percentilesDist`: exact
    * interpolated quantiles of `cents` per `key` without ever holding a
    * group in memory. Input frame: (key, cents: long). Output:
    * (key, <one double column per requested quantile>, n). */
  def quantilesByValueCounts(base: DataFrame,
      quantiles: Seq[(Double, String)]): DataFrame = {
    val vc = base.groupBy("key", "cents").agg(count(lit(1)).as("c"))
    // n rides the SAME window exchange as cum (max over the full
    // partition) — no second scan of the input, no count join
    val j = vc
      .withColumn("cum",
        sum(col("c")).over(Window.partitionBy("key").orderBy("cents")))
      .withColumn("n", max(col("cum")).over(Window.partitionBy("key")))
    // bracketing rank for quantile p: pos = (n-1)p, lo = floor(pos)+1
    def lo(p: Double) =
      floor((col("n") - 1).cast("double") * lit(p)) + 1
    def spans(r: Column) = col("cum") - col("c") < r && col("cum") >= r
    def vAt(r: Column) = min(when(col("cum") >= r, col("cents")))
    // Spark Percentile.getPercentile's EXACT token sequence (special
    // cases included), so the reconstruction is bit-identical to the
    // buffering tier: (higher-pos)*lower + (pos-lower)*higher, with
    // integral pos or equal bracketing keys short-circuiting to the
    // lower key. A rank past n leaves v_hi null -> coalesce to v_lo.
    def interp(vLo: Column, vHi: Column, p: Double) = {
      val pos = (col("n") - 1).cast("double") * lit(p)
      val hi = coalesce(vHi, vLo)
      when(ceil(pos) === floor(pos) || hi === vLo, vLo.cast("double"))
        .otherwise((ceil(pos) - pos) * vLo.cast("double") +
          (pos - floor(pos)) * hi.cast("double")) / 100.0
    }
    val ps = quantiles.map(_._1)
    val aggs = max(col("n")).as("n") +:
      ps.zipWithIndex.flatMap { case (p, i) => Seq(
        vAt(lo(p)).as(s"v_lo$i"), vAt(lo(p) + 1).as(s"v_hi$i")) }
    j.filter(ps.flatMap(p => Seq(lo(p), lo(p) + 1))
        .map(spans).reduce(_ || _))
      .groupBy("key")
      .agg(aggs.head, aggs.tail: _*)
      .select(
        col("key") +:
        quantiles.zipWithIndex.map { case ((p, name), i) =>
          interp(col(s"v_lo$i"), col(s"v_hi$i"), p).as(name) } :+
        col("n"): _*)
  }

  /** HLL approximate distinct (no DuckDB oracle — sketch internals are
    * engine-specific; accuracy is asserted against the exact count in
    * OperatorInvariantsSpec instead). Pure sketch path: partial HLL
    * buffers merge map-side, so the exchange carries one sketch per
    * (flag, partition) — the exact count it replaces at 100 TB would
    * shuffle every distinct key. */
  def approxDistinct(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy("l_returnflag")
      .agg(approx_count_distinct(col("l_partkey"), 0.02).as("approx_parts"))
      .orderBy("l_returnflag")

  /** Approximate percentiles (no DuckDB oracle — same sketch-tier rule
    * as approxDistinct). The scale path beside the exact `percentiles`
    * query: exact percentile materializes every group value at the
    * reducer (sort-based, O(group) memory), while this sketch keeps a
    * bounded digest per partition and merges map-side — the exchange
    * carries one digest per (status, partition) regardless of SF. The
    * accuracy parameter trades digest size for rank error (1e4 ≈ 0.01%
    * rank error — asserted against the exact quantiles in
    * OperatorInvariantsSpec). */
  def approxPercentiles(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .withColumn("cents", round(col("o_totalprice") * 100).cast("long"))
      .groupBy("o_orderstatus")
      .agg(
        (expr("approx_percentile(cents, 0.5, 10000)") / 100.0).as("median_price"),
        (expr("approx_percentile(cents, 0.9, 10000)") / 100.0).as("p90_price"),
        count(lit(1)).as("n"))
      .orderBy("o_orderstatus")

  /** MERGEABLE sketch rollup — the incremental-aggregation pattern a
    * 100 TB history table forces: per-day HLL sketches (DataSketches,
    * stored once per day in production) UNION into any larger window
    * without rescanning the raw data. The query materializes the daily
    * sketches and merges them; the spec checks the merged estimate
    * against the exact distinct count.
    *
    * lgConfigK = 14 puts the test SFs in the sketch's EXACT regime
    * (the theta precedent, r7 verdict #4): a DataSketches HLL stays in
    * its coupon LIST/SET phase — estimate ≡ exact distinct count, and
    * the union of coupon-phase sketches is again coupon-phase — until
    * the coupon set outgrows ~2^(lgK-2) keys. Measured: 1,500 distinct
    * users (sf0.1) is exact at lgK=14 where lgK=12's phase ended at
    * ~1,024 (1488 ≠ 1500). The DuckDB twin is therefore plain
    * count(DISTINCT) at every test SF; past the coupon phase (~4k
    * distinct at lgK=14 — any production SF) the twin stops applying
    * and the spec's accuracy bound is the contract. The sketch stays
    * honest at scale: 2^14 registers ≈ 16 KB per day ceiling. */
  def hllDailyMerge(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .withColumn("day", expr("unix_millis(ts) div 86400000"))
      .groupBy("day")
      .agg(hll_sketch_agg(col("user_id"), lit(14)).as("sk"))
    daily.agg(
      count(lit(1)).as("n_days"),
      hll_sketch_estimate(hll_union_agg(col("sk"))).as("merged_distinct_users"))
  }

  /** SET-EXPRESSION sketches — the capability HLL cannot provide:
    * DISTINCT-set INTERSECTION across audiences. Theta sketches
    * (DataSketches) support union/intersect/difference algebra, so
    * "how many distinct users did BOTH X and Y" — the audience-overlap
    * / cross-source-coverage question — is answered from one ~KB
    * sketch per audience with NO pairwise distinct join. Completes the
    * sketch family: distinct = HLL, heavy hitters = Misra-Gries,
    * quantiles = KLL, set algebra = Theta.
    *
    * Shape at 100 TB: ONE corpus pass builds a bounded sketch per
    * (partition, audience) inside mapPartitions — no shuffle of raw
    * rows at all; the driver unions O(partitions × audiences) ~KB
    * sketches (the bounded-collect class) and evaluates every pairwise
    * intersection on compact sketches. lgK=12 → RSE ≈ 1.6%; below 4096
    * distinct keys a theta sketch is EXACT (no sampling), which the
    * spec exploits at test SFs. Output: one row per unordered audience
    * pair with estimates and the sketch's own 2-σ intersection bounds.
    * Oracle: BECAUSE the test SFs sit below the sampling threshold the
    * sketch is exact there — estimates are exact counts and the bounds
    * collapse onto them — so the DuckDB twin is plain distinct-set
    * algebra (r6 verdict #2); past 4096 distinct keys the twin stops
    * applying and the accuracy spec is the contract. */
  def eventsOverlapTheta(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.datasketches.theta.{SetOperation, Sketches, UpdateSketch}
    import org.apache.datasketches.memory.Memory
    import spark.implicits._
    val lgK = 12
    val parts: Array[(String, Array[Byte])] = Tables.events(spark, dir)
      .select(col("event_type"), col("user_id")).as[(String, Long)]
      .mapPartitions { it =>
        val m = scala.collection.mutable.Map.empty[String, UpdateSketch]
        it.foreach { case (t, u) =>
          m.getOrElseUpdate(t,
            UpdateSketch.builder().setLogNominalEntries(lgK).build()).update(u)
        }
        m.iterator.map { case (t, sk) => (t, sk.compact().toByteArray) }
      }.collect()
    val byType = parts.groupBy(_._1).toSeq.sortBy(_._1).map { case (t, arr) =>
      val u = SetOperation.builder().setLogNominalEntries(lgK).buildUnion()
      arr.foreach { case (_, b) => u.union(Sketches.wrapSketch(Memory.wrap(b))) }
      t -> u.getResult
    }
    val rows = for {
      i <- byType.indices
      j <- (i + 1) until byType.size
    } yield {
      val (ta, ska) = byType(i)
      val (tb, skb) = byType(j)
      val inter = SetOperation.builder().setLogNominalEntries(lgK)
        .buildIntersection()
      inter.intersect(ska); inter.intersect(skb)
      val r = inter.getResult
      val un = SetOperation.builder().setLogNominalEntries(lgK).buildUnion()
      un.union(ska); un.union(skb)
      val uEst = un.getResult.getEstimate
      (ta, tb, ska.getEstimate, skb.getEstimate,
        r.getEstimate, r.getLowerBound(2), r.getUpperBound(2),
        uEst, if (uEst == 0.0) 0.0 else r.getEstimate / uEst)
    }
    rows.toDF("type_a", "type_b", "est_a", "est_b",
      "est_overlap", "lb_overlap", "ub_overlap", "est_union", "jaccard_est")
      .orderBy("type_a", "type_b")
  }

  /** MERGEABLE quantile sketches — the KLL analog of `hllDailyMerge`,
    * completing the sketch trio (distinct = HLL, heavy hitters =
    * Misra-Gries, quantiles = KLL): per-day KllDoublesSketches of the
    * event value, UNIONED into all-time quantiles without rescanning
    * raw data — the incremental-aggregation pattern a 100 TB history
    * table forces (store one ~KB sketch per day, answer any window).
    * Build is distributed (mapGroups per day); the driver holds one
    * sketch per day — bounded. k=200 bounds normalized rank error at
    * ~1.65% (99% confidence; the spec asserts against the exact CDF
    * with the library's own getNormalizedRankError bound). No oracle —
    * sketch internals are engine-specific, same rule as
    * approx_distinct. */
  def kllDailyMerge(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.datasketches.kll.KllDoublesSketch
    import org.apache.datasketches.memory.Memory
    import spark.implicits._
    val daily: Array[(Long, Array[Byte])] = Tables.events(spark, dir)
      .withColumn("day", expr("unix_millis(ts) div 86400000"))
      .select(col("day"), col("value")).as[(Long, Double)]
      .groupByKey(_._1)
      .mapGroups { (day, it) =>
        val sk = KllDoublesSketch.newHeapInstance(200)
        it.foreach(x => sk.update(x._2))
        (day, sk.toByteArray)
      }.collect()
    val merged = daily.foldLeft(KllDoublesSketch.newHeapInstance(200)) {
      case (acc, (_, b)) => acc.merge(KllDoublesSketch.heapify(Memory.wrap(b))); acc
    }
    // empty input: one row with NaN quantiles, matching hllDailyMerge's
    // always-emits-a-row contract (getQuantile throws on an empty sketch)
    val row =
      if (merged.isEmpty) (0L, Double.NaN, Double.NaN, Double.NaN)
      else (daily.length.toLong,
        merged.getQuantile(0.5), merged.getQuantile(0.9), merged.getQuantile(0.99))
    Seq(row).toDF("n_days", "p50", "p90", "p99")
  }

  /** DATA-QUALITY expectations report — the validation gate a training
    * pipeline runs before accepting a new data drop: each rule is a
    * violation predicate, all rules evaluate in ONE scan (conditional
    * sums), and the report is one row per rule. Counts are BIGINT so
    * the oracle is bit-exact. */
  def dqReport(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val rules: Seq[(String, Column)] = Seq(
      "quantity_in_1_50" -> (col("l_quantity") < 1 || col("l_quantity") > 50),
      "price_positive" -> (col("l_extendedprice") <= 0),
      "discount_in_0_0p1" -> (col("l_discount") < 0 || col("l_discount") > 0.1),
      "returnflag_domain" -> !col("l_returnflag").isin("A", "N", "R"),
      "orderkey_not_null" -> col("l_orderkey").isNull)
    val wide = li.agg(
      count(lit(1)).as("n_rows"),
      rules.map { case (name, bad) =>
        sum(when(bad, 1L).otherwise(0L)).as(name)
      }: _*)
    wide.unpivot(Array(col("n_rows")),
        rules.map { case (n, _) => col(n) }.toArray, "rule", "violations")
      .withColumn("pass", col("violations") === 0L)
      .select("rule", "n_rows", "violations", "pass")
      .orderBy("rule")
  }

  /** SHUFFLE-KEY SKEW report — the diagnostic a 100 TB job runs BEFORE
    * picking a join/aggregation strategy on a key: per-key row counts,
    * the global key statistics, and the top-10 heaviest keys with their
    * share of all rows. `skew_factor` = max_cnt · n_keys / n_rows is the
    * max-to-mean ratio — 1.0 is perfectly uniform; the threshold AQE's
    * skew-join split and the salted-join fallback are tuned against.
    *
    * Shape: one exchange builds the per-key counts (map-side partial
    * count first, so the shuffle carries one row per key per map task —
    * counting a skewed key is NOT itself skewed); the top-10 is a
    * TakeOrdered over the counts (no global sort materializes), the
    * 1-row totals frame broadcasts back, and the rank window orders 10
    * rows. Integer counts until the ratios; skew_factor multiplies in
    * DOUBLE (max_cnt · n_keys in BIGINT would wrap past 2^63 at the
    * very scale this diagnostic exists for — advice r6), in the token
    * order the oracle repeats. */
  def eventsKeySkew(spark: SparkSession, dir: String): DataFrame = {
    val counts = Tables.events(spark, dir)
      .groupBy("user_id").agg(count(lit(1)).as("cnt"))
    val totals = counts.agg(
      count(lit(1)).as("n_keys"),
      sum(col("cnt")).as("n_rows"),
      max(col("cnt")).as("max_cnt"))
    counts.orderBy(col("cnt").desc, col("user_id")).limit(10)
      .crossJoin(broadcast(totals))
      .withColumn("rank", row_number()
        .over(Window.orderBy(col("cnt").desc, col("user_id"))).cast("long"))
      .withColumn("share", col("cnt").cast("double") / col("n_rows"))
      .withColumn("skew_factor",
        col("max_cnt").cast("double") * col("n_keys") / col("n_rows"))
      .select("rank", "user_id", "cnt", "share", "n_keys", "n_rows",
        "max_cnt", "skew_factor")
      .orderBy("rank")
  }

  /** As-of join — the canonical stream-correlation operator Spark lacks
    * natively (DuckDB has ASOF JOIN; our oracle uses it). Implemented
    * the scalable way: tag both sides, one hash exchange on user_id, one
    * sort, `last(ignoreNulls)` running carry — O(n log n/partition), no
    * per-key state blowup, vs. the naive O(clicks × purchases) theta
    * join. ts is disambiguated to a unique key (ms*1e6 + event_id) so
    * tie-breaks are deterministic cross-engine. */
  def asofJoin(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
      .withColumn("ts_ms", unix_millis(col("ts")))
      .withColumn("ts_u", col("ts_ms") * 1000000L + col("event_id"))
    val w = Window.partitionBy("user_id").orderBy("ts_u")
      .rowsBetween(Window.unboundedPreceding, 0)
    e.withColumn("last_click_val",
        last(when(col("event_type") === "click", col("value")), ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts_ms", "value", "last_click_val")
      .orderBy("event_id")
  }

  /** GROUPING SETS — the explicit-set cousin of rollup/cube (§2.11
    * sweep): (status, priority), (status), grand total. SQL interface
    * for the same Spark 4.1 reason as rollupAcctbal. One Expand + one
    * aggregation exchange — the same plan shape cube builds. */
  def groupingSetsOrders(spark: SparkSession, dir: String): DataFrame = {
    Tables.orders(spark, dir).createOrReplaceTempView("g_orders")
    spark.sql("""
      SELECT o_orderstatus, o_orderpriority,
        count(1) AS n,
        SUM(CAST(round(o_totalprice * 100) AS BIGINT)) / 1e2 AS sum_price
      FROM g_orders
      GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
      ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""")
  }

  /** UNPIVOT (wide → long): the quality metrics melted to (doc_id,
    * metric, value) rows — per-row Expand, no shuffle beyond the
    * presentation sort. */
  def unpivotQuality(spark: SparkSession, dir: String): DataFrame =
    TextOps.qualityStats(spark, dir)
      .select("doc_id", "stop_ratio", "ttr", "quality")
      .unpivot(Array(col("doc_id")),
        Array(col("stop_ratio"), col("ttr"), col("quality")), "metric", "value")
      .orderBy("doc_id", "metric")

  /** Time-RANGE window frame (vs the ROWS frames elsewhere): per-user
    * trailing-1-hour count/sum at every event. RANGE on the numeric
    * ts_ms includes peers and needs no self-join — one exchange on
    * user_id, one sort, O(1) frame maintenance per row. */
  def wfRangeFrame(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
      .withColumn("ts_ms", unix_millis(col("ts")))
      .withColumn("value_c", round(col("value") * 100).cast("long"))
    val w = Window.partitionBy("user_id").orderBy("ts_ms")
      .rangeBetween(-3600000L, Window.currentRow)
    e.withColumn("n_1h", count(lit(1)).over(w))
      .withColumn("sum_1h", sum(col("value_c")).over(w) / 100.0)
      .select("event_id", "user_id", "ts_ms", "n_1h", "sum_1h")
      .orderBy("event_id")
  }
}
