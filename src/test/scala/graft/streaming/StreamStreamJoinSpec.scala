package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

case class DecisionRow(w_start: Long, symbol: String, action: String)
case class FillRow(fill_ts: Long, fill_symbol: String, fill_qty: Double)

/** Stream-stream interval join: two live streams joined with both-side
  * watermarks, batch↔stream parity, and the join-state eviction bound. */
class StreamStreamJoinSpec extends SparkSpec {

  private val t0 = 1704067200000L // 2024-01-01 00:00 UTC
  private val min = 60000L

  private val decisions = Seq(
    DecisionRow(t0, "BTCUSDT", "BUY"),
    DecisionRow(t0, "ETHUSDT", "SELL"),
    DecisionRow(t0 + 5 * min, "BTCUSDT", "BUY"))
  private val fills = Seq(
    FillRow(t0 + 2 * min, "BTCUSDT", 1.5),  // joins decision 1 only (3 is later)
    FillRow(t0 + 7 * min, "BTCUSDT", 2.0),  // joins decisions 1 AND 3
    FillRow(t0 + 30 * min, "ETHUSDT", 9.9), // outside the 10-min range: no join
    FillRow(t0 + 1 * min, "SOLUSDT", 0.1))  // no matching symbol

  test("stream-stream join equals the batch join on the same data") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val dStream = MemoryStream[DecisionRow]
    val fStream = MemoryStream[FillRow]
    val joined = StreamJoins.decisionFills(dStream.toDF(), fStream.toDF())
    val q = joined.writeStream
      .format("memory").queryName("ssj")
      .outputMode(OutputMode.Append())
      .start()
    dStream.addData(decisions)
    fStream.addData(fills)
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("ssj")
      .select("symbol", "w_start", "fill_ts", "fill_qty", "latency_ms")
      .collect().map(_.toSeq).toSet
    val batch = StreamJoins.decisionFills(decisions.toDF(), fills.toDF())
      .select("symbol", "w_start", "fill_ts", "fill_qty", "latency_ms")
      .collect().map(_.toSeq).toSet
    assert(streamed == batch, s"stream/batch divergence:\n$streamed\nvs\n$batch")
    assert(batch.size == 3, "expected exactly 3 attributed fills")
    // the double-attributed fill: both BTC decisions within range
    assert(batch.count(_(2) == t0 + 7 * min) == 2)
  }

  test("join state is evicted once the watermark passes the range bound") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val dStream = MemoryStream[DecisionRow]
    val fStream = MemoryStream[FillRow]
    val joined = StreamJoins.decisionFills(dStream.toDF(), fStream.toDF())
    val q = joined.writeStream
      .format("memory").queryName("ssj_evict")
      .outputMode(OutputMode.Append())
      .start()
    // batch 1: a decision plus far-future rows on BOTH sides, advancing
    // both watermarks beyond t0 + 10min + delay
    dStream.addData(Seq(DecisionRow(t0, "BTCUSDT", "BUY"),
      DecisionRow(t0 + 120 * min, "ZZZ", "HOLD")))
    fStream.addData(Seq(FillRow(t0 + 120 * min, "ZZZ", 0.0)))
    q.processAllAvailable()
    // batch 2: a LATE fill for the old decision — behind the watermark,
    // its join partner's state is gone; no new output row may appear
    val before = spark.table("ssj_evict").count()
    fStream.addData(Seq(FillRow(t0 + 2 * min, "BTCUSDT", 1.0)))
    q.processAllAvailable()
    val after = spark.table("ssj_evict").count()
    q.stop()
    assert(after == before,
      "late fill must not join: the decision's state was watermark-evicted")
  }
}
