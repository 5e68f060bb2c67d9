package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Per-record signal operators (SURVEY.md §2.2, P1-P10; §2.3 U1).
  *
  * The reference's signal stream (reference:
  * apps/signal-processor/.../SignalTopology.kt:86-111) is a Kafka topic of
  * JSON trading signals. The batch correctness tier derives an equivalent
  * signal stream deterministically from the `events` table so both Spark
  * and the DuckDB oracle compute over identical inputs:
  *
  *   symbol    = 'U' || user_id                      (re-key target, P4)
  *   side      = BUY if event_type in (click,view,signup) else SELL
  *   timeframe = event_id % 3 -> 1m / 5m / 15m
  *   price     = value
  *   qty       = (event_id % 100 + 1) / 100.0
  *   ts_ms     = epoch millis of ts
  *
  * All money-like values are carried as exact DECIMALs through aggregation
  * and only converted to DOUBLE in final formulas, so results are
  * bit-identical to the oracle regardless of partial-aggregation order.
  */
object SignalOps {

  /** Tumbling window size. The reference uses 5 minutes
    * (SignalTopology.kt:52) at ~15 msg/s over 5 symbols; the batch
    * correctness tier scales the window to 7 days so the testdata's
    * ~2.2 events/user/day produces the same per-(window,symbol) signal
    * density (~15) the reference windows see. The streaming pipeline
    * (graft.streaming) keeps the literal 5-minute window. */
  val WindowMs: Long = 7L * 24L * 3600L * 1000L

  /** Derived signal stream from `events` — shared input of the pipeline
    * queries. Mirrors OracleCtes.signals exactly. */
  def signals(events: DataFrame): DataFrame =
    events.select(
      col("event_id"),
      concat(lit("U"), col("user_id").cast("string")).as("symbol"),
      when(col("event_type").isin("click", "view", "signup"), lit("BUY"))
        .otherwise(lit("SELL")).as("side"),
      when(col("event_id") % 3 === 0, lit("1m"))
        .when(col("event_id") % 3 === 1, lit("5m"))
        .otherwise(lit("15m")).as("timeframe"),
      col("value").as("price"),
      ((col("event_id") % 100 + 1).cast("double") / 100.0).as("qty"),
      unix_millis(col("ts")).as("ts_ms"),
      col("props")
    ).withColumn("w_start", expr(s"(ts_ms div ${WindowMs}L) * ${WindowMs}L"))

  /** ROBUST per-symbol anomaly detection (`sig_outliers`) — the
    * monitoring face of the signal pipeline: flag prices whose modified
    * z-score |0.6745·(x − median)/MAD| exceeds 3.5 (Iglewicz-Hoaglin),
    * the standard robust rule a trading monitor runs because mean/σ are
    * themselves dragged by the outliers they should flag.
    *
    * Scale shape: ONE hash exchange on symbol serves everything — both
    * robust statistics are unordered window aggregates over the same
    * partitioning (median via percentile, then MAD as the median of
    * the deviations in a second window pass that reuses the exchange),
    * so no join, no second shuffle, plan-pinned. `percentile` buffers
    * one symbol's values per window partition — the exact-tier memory
    * ceiling; at 100 TB swap the window percentiles for the value-count
    * rank machinery (`quantilesByValueCounts`), same bracketing
    * semantics, bounded memory. A zero MAD (>50% of a symbol at one
    * price) yields NULL z and never flags — the degenerate case the
    * rule defines away. Prices ride the cents grid so the medians
    * interpolate over integers identically in both engines. */
  def outliers(spark: SparkSession, dir: String): DataFrame =
    signals(graft.Tables.events(spark, dir))
      .withColumn("price_c", round(col("price") * 100).cast("long"))
      .withColumn("med_c",
        expr("percentile(price_c, 0.5) OVER (PARTITION BY symbol)"))
      .withColumn("dev", abs(col("price_c") - col("med_c")))
      .withColumn("mad_c",
        expr("percentile(dev, 0.5) OVER (PARTITION BY symbol)"))
      .withColumn("z_mod", when(col("mad_c") > 0.0,
        lit(0.6745) * (col("price_c") - col("med_c")) / col("mad_c")))
      .filter(col("z_mod").isNotNull && abs(col("z_mod")) > 3.5)
      .select(col("symbol"), col("event_id"), col("ts_ms"), col("price"),
        (col("med_c") / 100.0).as("med_price"),
        (col("mad_c") / 100.0).as("mad_price"),
        col("z_mod"))
      .orderBy("symbol", "event_id")

  /** P1 (JSON parse-or-drop) + P2 (enrich) + strength derivation
    * (Signal.kt:23-29: weight 1/2/3 by timeframe, 0 otherwise).
    * `get_json_object` returns null on corrupt JSON → filter reproduces the
    * reference's drop-on-parse-failure (SignalTopology.kt:93-100). */
  def parseEnrich(events: DataFrame): DataFrame =
    signals(events)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
      .filter(col("k").isNotNull)
      .withColumn("strength",
        when(col("timeframe") === "1m", 1)
          .when(col("timeframe") === "5m", 2)
          .when(col("timeframe") === "15m", 3)
          .otherwise(0))
      .drop("props")

  /** U1: merge of the three per-timeframe streams (SignalTopology.kt:45-47).
    * In the rebuild a single multi-topic source subsumes this; kept as an
    * explicit union-all so the operator is exercised and oracle-checked.
    * Catalyst collapses `union` of three filters of one scan into one pass. */
  def unionMerge(events: DataFrame): DataFrame = {
    val s = signals(events)
    val merged = s.filter(col("timeframe") === "1m")
      .union(s.filter(col("timeframe") === "5m"))
      .union(s.filter(col("timeframe") === "15m"))
    merged.groupBy(col("timeframe"))
      .agg(
        count(lit(1)).as("n"),
        (sum(round(col("price") * 100).cast("long")) / 100.0).as("sum_price"))
  }

  /** P10: static price lookup with default — the reference's in-memory map
    * (OrderService.kt:42-47) with the `?: 100.0` fallback for symbols
    * missing from the map (the XRPUSDT path, OrderService.kt:139-142).
    * Becomes a broadcast hash join: the lookup side is tiny and must never
    * shuffle the fact side. */
  def priceLookup(spark: SparkSession, df: DataFrame): DataFrame = {
    import spark.implicits._
    val lookup = (0 until 10)
      .map(i => (s"U$i", 50.0 + 10.0 * i)).toDF("symbol", "base_price")
    df.join(broadcast(lookup), Seq("symbol"), "left")
      .withColumn("market_price", coalesce(col("base_price"), lit(100.0)))
  }
}
