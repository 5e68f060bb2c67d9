package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Decision operator (SURVEY.md §2.6, D1-D6; reference DecisionMaker.kt).
  *
  * The reference fans the alignment/balance/volatility computations out on
  * virtual threads (DecisionMaker.kt:16-36) — a concurrency workaround we
  * deliberately do not port (SURVEY §7.5(9)): here they are plain column
  * expressions in one `select`, fully inside whole-stage codegen.
  *
  * Determinism (SURVEY §7.5(6)): the reference multiplies the qty basis by
  * `Random.nextDouble(0.9, 1.1)` (DecisionMaker.kt:123) — quarantined to a
  * fixed 1.0 factor in test mode so hashes are reproducible; `Mode` below
  * is the live switch that re-enables it.
  */
object Decide {

  /** Execution-mode switch for the reference's nondeterministic faces
    * (VERDICT r3 missing #3). Three regimes:
    *  - [[Mode.Test]] (the default everywhere, and what every oracle
    *    query runs in): all faces quarantined deterministic — qty factor
    *    1.0, decision_id = md5(business key), decided_at = window close.
    *  - [[Mode.liveSeeded]]: the reference's randomized qty factor
    *    (DecisionMaker.kt:123, `Random.nextDouble(0.9, 1.1)`) via
    *    `rand(seed)` — a run is reproducible given the seed and
    *    partitioning, and id/timestamp stay business-key-derived so a
    *    seeded run's replays remain idempotent.
    *  - [[Mode.Live]]: full production nondeterminism — `rand()`,
    *    `uuid()` (TradingDecision.kt:11) and wall-clock
    *    `current_timestamp()` (kt:20). Replays are NOT idempotent in
    *    this regime — exactly why the order path keys on
    *    client_order_id, never decision_id (OrderOps scaladoc). */
  case class Mode(live: Boolean, seed: Option[Long] = None)
  object Mode {
    val Test: Mode = Mode(live = false, seed = Some(0L))
    def liveSeeded(k: Long): Mode = Mode(live = true, seed = Some(k))
    val Live: Mode = Mode(live = true, seed = None)
  }

  /** The qty factor face: 1.0 quarantined, `rand ∈ [0.9, 1.1)` live —
    * the uniform-range twin of DecisionMaker.kt:123. */
  private[graft] def qtyFactor(m: Mode): Column =
    if (!m.live) lit(1.0)
    else m.seed.map(rand(_)).getOrElse(rand()) * lit(0.2) + lit(0.9)

  /** D2 rule cascade + D3 confidence + D5 suggested price/qty + reason.
    * The slim record — no nested signals list; the streaming pipeline and
    * the order sink consume this shape. */
  def decisions(events: DataFrame): DataFrame = decisions(events, Mode.Test)

  def decisions(events: DataFrame, m: Mode): DataFrame =
    fromAgg(WindowAgg.windowAgg(events), m)
      .select("w_start", "symbol", "action", "confidence",
        "suggested_price", "suggested_qty", "reason", "signal_count", "balance")

  /** D6 FULL decision record (TradingDecision.kt:11-22, assembly
    * kt:39-57): everything in `decisions` plus
    *  - `signals`: the nested array of constituent Signal structs —
    *    per-timeframe capped lists flattened ts-desc (getAllSignals,
    *    SignalAggregator.kt:42-44), at most 30 elements;
    *  - `decision_id`: the reference's `id = UUID.randomUUID()` under the
    *    determinism quarantine (SURVEY §7.5(6)) — derived from the
    *    (window, symbol) business key, stable across replays;
    *  - `decided_at_ms`: the reference's `timestamp = Instant.now()`
    *    quarantined to the window close instant. */
  def decisionsNested(events: DataFrame): DataFrame =
    decisionsNested(events, Mode.Test)

  def decisionsNested(events: DataFrame, m: Mode): DataFrame =
    fromAgg(WindowAgg.windowAgg(events, withSignals = true), m)
      .withColumn("decision_id",
        // fully-live regime: the reference's `id = UUID.randomUUID()`
        // (TradingDecision.kt:11); seeded/test: the replay-stable
        // business-key id
        if (m.live && m.seed.isEmpty) expr("uuid()")
        else md5(concat(lit("DEC-"), col("w_start"), lit("-"), col("symbol")).cast("binary")))
      .withColumn("decided_at_ms",
        // fully-live regime: wall clock (TradingDecision.kt:20)
        if (m.live && m.seed.isEmpty) unix_millis(current_timestamp())
        else col("w_start") + lit(SignalOps.WindowMs))
      .select("w_start", "symbol", "decision_id", "action", "confidence",
        "suggested_price", "suggested_qty", "reason", "signal_count",
        "balance", "signals", "decided_at_ms")

  /** Canonical JSON rendering of the nested `signals` array — the wire
    * form a downstream consumer (the reference's order-manager re-parses
    * the list, order-manager Models.kt:6-13) reads. price/qty render via
    * exact integer cents (they are 2-decimal by construction) so the
    * string is deterministic cross-engine where raw double formatting
    * would not be. */
  def signalsJson(signals: Column): Column = {
    def cents2(c: Column): Column = {
      val v = round(c * 100).cast("long")
      concat((v / 100).cast("long"), lit("."), lpad((v % 100).cast("string"), 2, "0"))
    }
    concat(lit("["), array_join(transform(signals, s =>
      concat(lit("{\"ts\":"), s("ts_ms"),
        lit(",\"event_id\":"), s("event_id"),
        lit(",\"timeframe\":\""), s("timeframe"),
        lit("\",\"side\":\""), s("side"),
        lit("\",\"price\":"), cents2(s("price")),
        lit(",\"qty\":"), cents2(s("qty")), lit("}"))), ","), lit("]"))
  }

  /** The decision expressions over any frame carrying the aggregate
    * columns (balance, alignment, avg_price, avg_vol, qty_basis) — shared
    * by the batch path above and the streaming pipeline
    * (graft.streaming.SignalStream), one logical definition for both
    * execution modes. */
  def fromAgg(w: DataFrame): DataFrame = fromAgg(w, Mode.Test)

  def fromAgg(w: DataFrame, m: Mode): DataFrame =
    fromAggFactor(w, qtyFactor(m))

  /** The mode-independent body over an explicit qty factor column —
    * test mode IS the live path with the factor pinned to 1.0
    * (LiveModeSpec asserts that identity bit-exactly). */
  private[graft] def fromAggFactor(w: DataFrame, factor: Column): DataFrame = {
    val action =
      when(col("balance") > 5, "STRONG_BUY")
        .when(col("balance") > 2, "BUY")
        .when(col("balance") < -5, "STRONG_SELL")
        .when(col("balance") < -2, "SELL")
        .otherwise("HOLD")
    val priceAdj =
      when(col("balance") > 5, 0.998)
        .when(col("balance") > 2, 0.999)
        .when(col("balance") < -5, 1.002)
        .when(col("balance") < -2, 1.001)
        .otherwise(1.0)
    // D3 (DecisionMaker.kt:102-116): min(1, align*.4 + min(1,|bal|/10)*.4
    //   + max(.3, 1 - avgVol/100)*.2); HOLD pins confidence at 0.5.
    val conf = least(lit(1.0),
      col("alignment") * 0.4
        + least(lit(1.0), abs(col("balance")).cast("double") / 10.0) * 0.4
        + greatest(lit(0.3), lit(1.0) - col("avg_vol") / 100.0) * 0.2)
    w.withColumn("action", action)
      .withColumn("price_adj", priceAdj)
      .withColumn("confidence", when(col("action") === "HOLD", 0.5).otherwise(conf))
      .withColumn("suggested_price", col("avg_price") * col("price_adj"))
      // D4/D5: qty factor (1.0 quarantined / rand[0.9,1.1) live,
      // DecisionMaker.kt:123), then floor-truncate to 4 dp (kt:124);
      // 0.0 on HOLD
      .withColumn("suggested_qty",
        when(col("action") === "HOLD", 0.0)
          .otherwise(floor(col("qty_basis") * factor * 10000.0) / 10000.0))
      .withColumn("reason",
        when(col("action").isin("STRONG_BUY", "STRONG_SELL"),
          when(col("alignment") > 0.8, "ALIGNED_SIGNALS").otherwise("MOMENTUM_SHIFT"))
          .when(col("action").isin("BUY", "SELL"), "ALIGNED_SIGNALS")
          .otherwise(
            when(col("alignment") < 0.6, "DIVERGENT_SIGNALS").otherwise("INSUFFICIENT_DATA")))
  }
}
