package graft.streaming

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** A single signal as consumed by the stateful aggregator. Prices/qtys are
  * integer cents (exact — see WindowAgg's numeric strategy); `seq` is the
  * deterministic tie-break (event_id in batch, source offset in streams).
  */
case class SigInput(symbol: String, timeframe: String, side: String,
  priceC: Long, qtyC: Long, tsMs: Long, seq: Long)

/** Per-timeframe state: capped signal list + UNCAPPED buy/sell balance
  * (reference: SignalAggregator.kt:16-34 — the list is capped at 10, the
  * balance counts every signal). */
case class TfState(sigs: List[SigInput], balance: Long)

/** Aggregation buffer: per-timeframe states (reference SerializableState,
  * SignalAggregator.kt:79-89 — three maps collapsed into one typed map). */
case class AggState(tfs: Map[String, TfState])

/** Aggregate output mirroring WindowAgg.windowAgg's columns. */
case class AggResult(n_tf: Long, signal_count: Long, balance: Long,
  alignment: Double, avg_price: Double, avg_vol: Double, qty_basis: Double)

/** The reference's one custom stateful aggregate (SURVEY §2.5 W3-W14;
  * reference SignalAggregator.kt) as a typed Spark `Aggregator` — usable
  * in batch `groupBy(...).agg(...)` and in Structured Streaming windowed
  * aggregation alike.
  *
  * The reference never merges states (single-writer per key), so merge
  * semantics are ours to define (SURVEY §7.3): concat per-timeframe lists,
  * re-cap to the 10 largest (tsMs, seq), sum balances — associative and
  * commutative, which is what makes map-side partial aggregation safe at
  * scale.
  *
  * State per key is O(1): ≤10 signals × ≤3 timeframes + a counter. A
  * hot symbol cannot grow state — the property that lets the streaming
  * query run forever.
  *
  * `finish` repeats WindowAgg's double formulas token-for-token, so
  * batch two-level aggregation, this Aggregator, and the DuckDB oracle
  * all produce bit-identical doubles.
  */
object SignalAggregator extends Aggregator[SigInput, AggState, AggResult] {

  val Cap = 10

  private def ord(s: SigInput): (Long, Long) = (s.tsMs, s.seq)

  /** keep the `Cap` largest by (tsMs, seq) — "last 10" under the
    * deterministic batch order of SURVEY §7.5(1). */
  private def recap(sigs: List[SigInput]): List[SigInput] =
    sigs.sortBy(ord).takeRight(Cap)

  def zero: AggState = AggState(Map.empty)

  def reduce(b: AggState, a: SigInput): AggState = {
    val tf = b.tfs.getOrElse(a.timeframe, TfState(Nil, 0L))
    val nb = tf.balance + (if (a.side == "BUY") 1L else -1L)
    b.copy(tfs = b.tfs.updated(a.timeframe, TfState(recap(a :: tf.sigs), nb)))
  }

  def merge(x: AggState, y: AggState): AggState =
    AggState((x.tfs.keySet ++ y.tfs.keySet).map { k =>
      val a = x.tfs.getOrElse(k, TfState(Nil, 0L))
      val b = y.tfs.getOrElse(k, TfState(Nil, 0L))
      k -> TfState(recap(a.sigs ++ b.sigs), a.balance + b.balance)
    }.toMap)

  def finish(s: AggState): AggResult = {
    // fixed slot order (1m, 5m, 15m) — float addition order must match
    // WindowAgg's pivoted formula exactly
    val slots = Seq("1m", "5m", "15m").flatMap(k => s.tfs.get(k).map(k -> _))
    val nTf = slots.size.toLong
    if (nTf == 0) return AggResult(0L, 0L, 0L, 1.0, 0.0, 0.0, 0.0)
    val signalCount = slots.map(_._2.sigs.size.toLong).sum
    val balance = slots.map(_._2.balance).sum
    def avgPriceTf(t: TfState): Double = {
      val sumPc = t.sigs.map(_.priceC).sum
      (sumPc / 100.0) / t.sigs.size
    }
    def volTf(t: TfState): Double = {
      val n = t.sigs.size
      if (n < 2) 0.0
      else {
        val sumPc = t.sigs.map(_.priceC).sum
        val sumsqPc = t.sigs.map(x => x.priceC * x.priceC).sum
        math.sqrt(math.max(0.0,
          (sumsqPc / 10000.0 - (sumPc / 100.0) * (sumPc / 100.0) / n) / n))
      }
    }
    def modeTf(t: TfState): String = {
      val buy = t.sigs.count(_.side == "BUY").toLong
      if (buy * 2 >= t.sigs.size) "BUY" else "SELL"
    }
    val alignment = if (slots.map(x => modeTf(x._2)).distinct.size == 1) 1.0 else 0.5
    val avgPrice = slots.map(x => avgPriceTf(x._2)).sum / nTf
    val avgVol = slots.map(x => volTf(x._2)).sum / nTf
    val top5 = slots.flatMap(_._2.sigs).sortBy(ord).takeRight(5)
    val qtyBasis =
      if (top5.isEmpty) 0.0 else (top5.map(_.qtyC).sum / 100.0) / top5.size
    AggResult(nTf, signalCount, balance, alignment, avgPrice, avgVol, qtyBasis)
  }

  /** The decision record's nested `signals` payload from streaming state
    * (W9/D6 parity with WindowAgg's batch array): the capped per-tf
    * lists flattened (tsMs desc, seq desc) — the reference's
    * getAllSignals order with the deterministic tie-break. Bounded at
    * Cap × 3 elements like the state itself. */
  def finishSignals(s: AggState): Seq[SigInput] =
    s.tfs.values.flatten(_.sigs).toSeq.sortBy(ord).reverse

  def bufferEncoder: Encoder[AggState] = Encoders.product[AggState]
  def outputEncoder: Encoder[AggResult] = Encoders.product[AggResult]
}
