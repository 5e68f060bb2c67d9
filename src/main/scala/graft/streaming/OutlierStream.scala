package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Streaming robust anomaly detection — the continuous face of
  * `SignalOps.outliers` (per-symbol modified z on median/MAD), the
  * alerting monitor a trading pipeline runs live rather than
  * retrospectively.
  *
  * The state problem: exact median/MAD need the full value history per
  * key — unbounded. The state here is a DETERMINISTIC BOTTOM-K SAMPLE:
  * keep the K events whose splitmix64(event_id) hash is smallest. A
  * bottom-k set is a uniform sample of everything seen, and — unlike a
  * reservoir — it is a pure SET FUNCTION of the observed event ids:
  * merge = union-then-cut, so it is order-insensitive, duplicate-proof
  * and replay-stable (the same exactly-once-by-construction class as
  * the snapshot store's argmax; the spec asserts the state equals the
  * bottom-k of ALL events regardless of batch split). Robust stats
  * from the sample converge to the true median/MAD at the usual
  * O(1/√K) sampling error; with K ≥ the key's history the stats are
  * EXACT and the stream reproduces the batch rule verbatim — the
  * parity law the spec pins.
  *
  * Scale shape: state per key is K (price, hash) pairs + a counter —
  * bounded, independent of stream length; each micro-batch shuffles
  * once on symbol (the groupByKey exchange); flags are emitted only
  * for the CURRENT batch's distinct events, scored against the
  * post-merge sample, once the pool's distinct-seen estimate (a set
  * function — replay-proof like the pool itself) reaches `warmup`. */
object OutlierStream {

  /** Bottom-k sample state: parallel arrays sorted by hash ascending.
    * `count` is the OBSERVED event count (deduped within each batch
    * only) — a diagnostic that over-counts under cross-batch replay;
    * the warmup gate therefore does NOT read it, gating instead on
    * `distinctEst`, a pure set function of the pool. */
  case class OutState(count: Long, hashes: Array[Long], prices: Array[Long])

  /** Distinct-events-seen as a SET FUNCTION of the bottom-k pool, so
    * the warmup gate inherits the pool's replay/duplicate/order
    * immunity: below capacity the pool holds EVERY distinct event seen
    * (estimate is exact); at capacity the k-th smallest hash gives the
    * standard KMV bottom-k estimate (k−1)/fraction-of-hash-space —
    * sampling error O(1/√k), ample for a warmup threshold. */
  private[streaming] def distinctEst(st: OutState, k: Int): Double = {
    val n = st.hashes.length
    if (n < k) n.toDouble
    else {
      // hashes sort SIGNED ascending; map the k-th smallest onto [0,1)
      // of the full 64-bit range via the signed→offset shift
      val frac = (st.hashes.last.toDouble - Long.MinValue.toDouble) /
        math.pow(2.0, 64)
      if (frac <= 0.0) n.toDouble else (k - 1).toDouble / frac
    }
  }

  case class Flag(symbol: String, event_id: Long, ts_ms: Long,
    price_c: Long, med_c: Double, mad_c: Double, z_mod: Double)

  private[streaming] def mix64(x: Long): Long = {
    var z = x + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** (n-1)·p bracketing interpolation — the same token sequence as the
    * batch percentile (and the engines' shared convention). */
  private[streaming] def median(sorted: Array[Long]): Double = {
    val n = sorted.length
    val pos = (n - 1) * 0.5
    val lo = pos.toInt
    if (lo + 1 < n) sorted(lo) + (sorted(lo + 1) - sorted(lo)) * (pos - lo)
    else sorted(lo).toDouble
  }

  /** One group-batch transition: merge the batch into the bottom-k
    * sample (union + dedupe by event-id hash + cut), then score the
    * batch's events against the merged sample. Deviations stay DOUBLES
    * (the median interpolates halves — truncating them before the MAD
    * median would diverge from the batch rule). Pure function — the
    * spec drives it directly; the streaming wrapper only adds state
    * plumbing. */
  private[streaming] def stepExact(evs: Seq[(String, Long, Long, Long)],
      old: OutState, k: Int, warmup: Long): (OutState, Seq[Flag]) = {
    val pool = (old.hashes.zip(old.prices) ++
      evs.map(e => (mix64(e._4), e._2))).distinct.sortBy(_._1).take(k)
    val st = OutState(old.count + evs.map(_._4).distinct.size,
      pool.map(_._1), pool.map(_._2))
    // score each distinct event ONCE: a within-batch duplicate would
    // otherwise emit two identical flags even though the pool layer
    // dedups it — update-mode consumers key on event_id
    val uniq = {
      val seen = scala.collection.mutable.HashSet.empty[Long]
      evs.filter(e => seen.add(e._4))
    }
    val flags =
      if (distinctEst(st, k) < warmup || st.prices.isEmpty) Seq.empty
      else {
        val sample = st.prices.sorted
        val med = median(sample)
        val devs = sample.map(p => math.abs(p - med)).sorted
        val n = devs.length
        val pos = (n - 1) * 0.5
        val lo = pos.toInt
        val mad = if (lo + 1 < n)
          devs(lo) + (devs(lo + 1) - devs(lo)) * (pos - lo) else devs(lo)
        if (mad <= 0.0) Seq.empty
        else uniq.flatMap { case (sym, pc, ts, eid) =>
          val z = 0.6745 * (pc - med) / mad
          if (math.abs(z) > 3.5) Some(Flag(sym, eid, ts, pc, med, mad, z))
          else None
        }
      }
    (st, flags)
  }

  /** Works identically on a batch frame (how the parity spec drives it)
    * and a streaming one. Input columns: symbol, price_c, ts_ms,
    * event_id. */
  def detect(signals: DataFrame, k: Int = 64,
      warmup: Long = 32): Dataset[Flag] = {
    val spark = signals.sparkSession
    import spark.implicits._
    signals.select(col("symbol"), col("price_c"), col("ts_ms"), col("event_id"))
      .as[(String, Long, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        (sym: String, it: Iterator[(String, Long, Long, Long)],
         state: org.apache.spark.sql.streaming.GroupState[OutState]) => {
          val evs = it.toSeq
          val old = state.getOption.getOrElse(
            OutState(0L, Array.empty, Array.empty))
          val (st, flags) = stepExact(evs, old, k, warmup)
          state.update(st)
          flags.iterator
        })
  }
}
