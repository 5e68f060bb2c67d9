package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The heart of the engine (SURVEY.md §2.5, W1-W13): 5-minute tumbling
  * window per symbol with the reference's custom aggregate semantics
  * (reference: SignalTopology.kt:50-57, SignalAggregator.kt:9-99):
  *
  *  - W4  last-10 cap per timeframe — "last" = largest (ts, event_id),
  *        the deterministic batch order decided in SURVEY §7.5(1)
  *  - W5/W10 average price = mean of per-timeframe means over the capped
  *        lists (NOT a global mean — SignalAggregator.kt:46-48)
  *  - W6/W11 buy/sell balance — UNCAPPED (counts every signal in window)
  *  - W7  ≥2 distinct timeframes (hasMinimumSignals, SignalAggregator.kt:38)
  *  - W8  signal count = sum of capped list sizes
  *  - W12 alignment: per-tf majority side over the capped list, BUY on a
  *        tie (SURVEY §7.5(5)); 1.0 if all timeframes agree, else 0.5
  *  - W13 POPULATION std-dev of capped prices per tf, 0.0 when n<2
  *  - D4  qty basis = mean qty of the 5 globally-newest signals; global
  *        newest-5 is provably a subset of every per-tf newest-10 (fewer
  *        than 5 same-tf signals can outrank a global-top-5 row), so one
  *        pass over the full set is correct
  *
  * Numeric strategy for oracle parity: prices and qtys are exact 2-decimal
  * values, so they are aggregated as integer CENTS (order-free exact sums);
  * DOUBLE appears only in final formulas written token-identically in the
  * DuckDB oracle (graft.Oracle) — results are bit-identical regardless of
  * partial-aggregation order or parallelism.
  *
  * Scale notes: both window functions and both aggregations cluster by
  * (w_start, symbol[, timeframe]) — one hash exchange on (w_start, symbol)
  * satisfies every step (subset clustering), so the plan is a single
  * shuffle followed by sorts + partial/final aggs. State per key is O(1)
  * (counts + long sums — no per-key list materialization), so a skewed
  * symbol cannot OOM an executor.
  */
object WindowAgg {

  /** Per-(window, symbol, timeframe) partial aggregate — the exact
    * integer-cents sums everything downstream derives from.
    *
    * `withSignals` additionally collects the capped (rn_tf <= 10) signal
    * rows as an array of structs — the raw material of the decision
    * record's nested `signals` payload (W9/D6, TradingDecision.kt:19).
    * Off by default: the list rides the (w_start, symbol) exchange, so
    * queries that don't emit it shouldn't pay for it. The list is
    * BOUNDED — at most 10 structs per (window, symbol, timeframe), so a
    * hot symbol cannot OOM a reducer even at 100 TB. */
  def tfLevel(events: DataFrame, withSignals: Boolean = false): DataFrame = {
    val s = SignalOps.signals(events)
    val byTf = Window.partitionBy("w_start", "symbol", "timeframe")
      .orderBy(col("ts_ms").desc, col("event_id").desc)
    val byAll = Window.partitionBy("w_start", "symbol")
      .orderBy(col("ts_ms").desc, col("event_id").desc)
    val priceC = round(col("price") * 100).cast("long")
    val qtyC = round(col("qty") * 100).cast("long")
    val base = Seq(
        count(lit(1)).as("cnt_all"),
        sum(when(col("side") === "BUY", 1L).otherwise(-1L)).as("balance_tf"),
        sum(when(col("rn_tf") <= 10, 1L).otherwise(0L)).as("n_cap"),
        sum(when(col("rn_tf") <= 10, priceC)).as("sum_pc"),
        sum(when(col("rn_tf") <= 10, priceC * priceC)).as("sumsq_pc"),
        sum(when(col("rn_tf") <= 10 && col("side") === "BUY", 1L).otherwise(0L)).as("buy_cap"),
        sum(when(col("rn_all") <= 5, qtyC)).as("sum_q5c"),
        sum(when(col("rn_all") <= 5, 1L).otherwise(0L)).as("n_q5")) ++
      (if (withSignals)
        // collect_list drops the NULLs `when` leaves for uncapped rows
        Seq(collect_list(when(col("rn_tf") <= 10, struct(
          col("ts_ms"), col("event_id"), col("timeframe"), col("side"),
          col("price"), col("qty")))).as("sigs_tf"))
      else Nil)
    s.withColumn("rn_tf", row_number().over(byTf))
      .withColumn("rn_all", row_number().over(byAll))
      .groupBy("w_start", "symbol", "timeframe")
      .agg(base.head, base.tail: _*)
      .withColumn("avg_price_tf", (col("sum_pc") / 100.0) / col("n_cap"))
      .withColumn("vol_tf",
        when(col("n_cap") < 2, lit(0.0)).otherwise(
          sqrt(greatest(lit(0.0),
            (col("sumsq_pc") / 10000.0
              - (col("sum_pc") / 100.0) * (col("sum_pc") / 100.0) / col("n_cap"))
              / col("n_cap")))))
      .withColumn("mode_tf",
        when(col("buy_cap") * 2 >= col("n_cap"), lit("BUY")).otherwise(lit("SELL")))
  }

  /** Final per-(window, symbol) aggregate. Per-timeframe doubles are
    * pivoted into fixed slots (1m/5m/15m) and combined in a fixed textual
    * order so floating-point addition order is deterministic.
    *
    * `withSignals` flattens the per-tf capped lists into one `signals`
    * array sorted (ts_ms desc, event_id desc) — the reference's
    * getAllSignals ts-desc order (SignalAggregator.kt:42-44) with the
    * deterministic event_id tie-break; at most 30 structs per row. */
  def windowAgg(events: DataFrame, withSignals: Boolean = false): DataFrame = {
    val tf = tfLevel(events, withSignals)
    def slot(t: String, c: String) = max(when(col("timeframe") === t, col(c)))
    val aggs = Seq(
      count(lit(1)).as("n_tf"),
      sum(col("n_cap")).as("signal_count"),
      sum(col("balance_tf")).as("balance"),
      countDistinct(col("mode_tf")).as("n_modes"),
      slot("1m", "avg_price_tf").as("ap_1m"),
      slot("5m", "avg_price_tf").as("ap_5m"),
      slot("15m", "avg_price_tf").as("ap_15m"),
      slot("1m", "vol_tf").as("v_1m"),
      slot("5m", "vol_tf").as("v_5m"),
      slot("15m", "vol_tf").as("v_15m"),
      sum(col("sum_q5c")).as("sum_q5c"),
      sum(col("n_q5")).as("n_q5")) ++
      (if (withSignals)
        Seq(sort_array(flatten(collect_list(col("sigs_tf"))), asc = false)
          .as("signals"))
      else Nil)
    val g = tf.groupBy("w_start", "symbol").agg(aggs.head, aggs.tail: _*)
    g.filter(col("n_tf") >= 2)
      .withColumn("alignment", when(col("n_modes") === 1, 1.0).otherwise(0.5))
      .withColumn("avg_price",
        (coalesce(col("ap_1m"), lit(0.0)) + coalesce(col("ap_5m"), lit(0.0))
          + coalesce(col("ap_15m"), lit(0.0))) / col("n_tf"))
      .withColumn("avg_vol",
        (coalesce(col("v_1m"), lit(0.0)) + coalesce(col("v_5m"), lit(0.0))
          + coalesce(col("v_15m"), lit(0.0))) / col("n_tf"))
      .withColumn("qty_basis", (col("sum_q5c") / 100.0) / col("n_q5"))
      .select(Seq("w_start", "symbol", "n_tf", "signal_count", "balance",
        "alignment", "avg_price", "avg_vol", "qty_basis")
        ++ (if (withSignals) Seq("signals") else Nil) map col: _*)
  }
}
