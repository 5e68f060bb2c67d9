package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming FUNNEL — the stateful-stage-machine face of
  * `Relational.eventsFunnel`: per-user view → click → purchase progress
  * carried as explicit keyed state across micro-batches
  * (flatMapGroupsWithState, the same arbitrary-state API the signal
  * aggregate's FMGWS face uses). Each batch folds its arrivals in
  * (ts_ms, event_id) order; a qualified click requires a view already
  * SEEN (in processing order), a conversion requires a qualified click
  * — the exact rule the batch query expresses with running-min windows,
  * so on in-order delivery the final states are BIT-IDENTICAL to the
  * batch funnel (FunnelStreamSpec pins the parity).
  *
  * Out-of-order caveat, stated rather than hidden: a view arriving
  * AFTER a click it should have qualified (across a batch boundary)
  * cannot retroactively qualify it — the streaming funnel is
  * order-sensitive by nature; production either delivers per-key
  * in-order (Kafka partitioning by user does exactly this) or delays
  * finalization behind a watermark. State is O(1) per user — four
  * optional timestamps and a count — the collect-free shape at any
  * events-per-user cardinality.
  */
object FunnelStream {

  case class FunnelEvent(user_id: Long, event_type: String, ts_ms: Long,
    event_id: Long)

  case class FunnelState(firstView: Long, firstClick: Long, firstPurchase: Long,
    nEvents: Long) // Long.MinValue = "unset" (Option[Long] needs no codec games)

  case class FunnelUpdate(user_id: Long, first_view_ms: java.lang.Long,
    first_click_ms: java.lang.Long, first_purchase_ms: java.lang.Long,
    n_events: Long, converted: Boolean)

  private val Unset = Long.MinValue

  private[streaming] def step(st: FunnelState, e: FunnelEvent): FunnelState = {
    val view =
      if (e.event_type == "view" && (st.firstView == Unset || e.ts_ms < st.firstView))
        st.copy(firstView = e.ts_ms)
      else st
    val click =
      if (e.event_type == "click" && view.firstView != Unset &&
        (view.firstClick == Unset || e.ts_ms < view.firstClick))
        view.copy(firstClick = e.ts_ms)
      else view
    val conv =
      if (e.event_type == "purchase" && click.firstClick != Unset &&
        (click.firstPurchase == Unset || e.ts_ms < click.firstPurchase))
        click.copy(firstPurchase = e.ts_ms)
      else click
    conv.copy(nEvents = conv.nEvents + 1)
  }

  private def update(key: Long, rows: Iterator[FunnelEvent],
      state: GroupState[FunnelState]): Iterator[FunnelUpdate] = {
    val sorted = rows.toSeq.sortBy(e => (e.ts_ms, e.event_id))
    val st0 = state.getOption.getOrElse(FunnelState(Unset, Unset, Unset, 0L))
    val st = sorted.foldLeft(st0)(step)
    state.update(st)
    def opt(v: Long): java.lang.Long = if (v == Unset) null else Long.box(v)
    Iterator.single(FunnelUpdate(key, opt(st.firstView), opt(st.firstClick),
      opt(st.firstPurchase), st.nEvents, st.firstPurchase != Unset))
  }

  /** (user_id, event_type, ts_ms, event_id) frame → per-user funnel
    * state updates, one row per touched user per micro-batch. Works on
    * streaming and batch frames. */
  def funnelUpdates(spark: SparkSession, events: DataFrame): Dataset[FunnelUpdate] = {
    import spark.implicits._
    events.select(col("user_id"), col("event_type"), col("ts_ms"), col("event_id"))
      .as[FunnelEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(update)
  }
}
