package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** The flatMapGroupsWithState face of the windowed aggregate (SURVEY §2.5
  * W3 note): the Aggregator/UDAF path is the right default — Catalyst
  * plans partial aggregation, and merge associativity is tested — but the
  * reference's RocksDB processor is an arbitrary-state API, so the
  * rebuild carries the equivalent: explicit keyed state, update-mode
  * emission per micro-batch (W15), and watermark-driven state expiry
  * (the window-retention concern of SURVEY §2.10).
  *
  * Within a micro-batch, arrivals are folded in (tsMs, seq) order — the
  * deterministic stand-in for the reference's arrival order (SURVEY
  * §7.5(1)); across batches the state carries, so emission history
  * depends on batch boundaries (exactly like the reference's commit
  * cadence) while the FINAL per-window values are batch-size-invariant.
  *
  * State per key is the same O(1) AggState as the UDAF path; expired
  * windows are removed by event-time timeout as the watermark passes.
  */
object StatefulSignals {

  case class WindowUpdate(symbol: String, w_start: Long, n_tf: Long,
    signal_count: Long, balance: Long, alignment: Double, avg_price: Double,
    avg_vol: Double, qty_basis: Double, closed: Boolean)

  /** FMGWS input row — carries the watermarked event_time column (the
    * event-time timeout check requires it inside the grouped schema). */
  case class KeyedSig(symbol: String, timeframe: String, side: String,
    priceC: Long, qtyC: Long, tsMs: Long, seq: Long, w_start: Long,
    event_time: java.sql.Timestamp)

  val WindowMs: Long = 5L * 60L * 1000L

  private def update(
      key: (String, Long),
      rows: Iterator[KeyedSig],
      state: GroupState[AggState]): Iterator[WindowUpdate] = {
    if (state.hasTimedOut) {
      // watermark passed the window end: emit nothing new, drop state
      state.remove()
      Iterator.empty
    } else {
      val sorted = rows.toSeq.sortBy(s => (s.tsMs, s.seq))
        .map(k => SigInput(k.symbol, k.timeframe, k.side, k.priceC, k.qtyC,
          k.tsMs, k.seq))
      val st0 = state.getOption.getOrElse(SignalAggregator.zero)
      val st = sorted.foldLeft(st0)(SignalAggregator.reduce)
      state.update(st)
      if (state.getOption.isDefined && !state.hasTimedOut) {
        // retain until watermark passes window end
        try state.setTimeoutTimestamp(key._2 + WindowMs)
        catch { case _: UnsupportedOperationException => () } // batch mode
      }
      val r = SignalAggregator.finish(st)
      if (r.n_tf >= 2)
        Iterator.single(WindowUpdate(key._1, key._2, r.n_tf, r.signal_count,
          r.balance, r.alignment, r.avg_price, r.avg_vol, r.qty_basis,
          closed = false))
      else Iterator.empty
    }
  }

  /** parsed (SignalStream.parse shape) → per-(symbol, window) running
    * aggregate updates. Works on streaming and batch frames. */
  def windowUpdates(spark: SparkSession, parsed: DataFrame): Dataset[WindowUpdate] = {
    import spark.implicits._
    val withW = parsed
      .withColumn("w_start", expr(s"(tsMs div ${WindowMs}L) * ${WindowMs}L"))
      .withColumn("event_time", timestamp_millis(col("tsMs")))
    val src = if (parsed.isStreaming) withW.withWatermark("event_time", "0 seconds")
      else withW
    src.select(col("symbol"), col("timeframe"), col("side"), col("priceC"),
        col("qtyC"), col("tsMs"), col("seq"), col("w_start"), col("event_time"))
      .as[KeyedSig]
      .groupByKey(k => (k.symbol, k.w_start))
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.EventTimeTimeout)(update)
  }
}
