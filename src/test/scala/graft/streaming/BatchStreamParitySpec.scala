package graft.streaming

import graft.{SparkSpec, Tables}
import graft.operators.{Decide, SignalOps}
import org.apache.spark.sql.functions._

/** The UDAF/streaming pipeline and the batch two-level aggregation are two
  * physical strategies for one logical operator — their outputs must be
  * bit-identical (doubles included; same formulas, exact accumulators). */
class BatchStreamParitySpec extends SparkSpec {

  test("SignalAggregator pipeline == batch WindowAgg+Decide, bit-exact") {
    val events = Tables.events(spark, sf())
    val batchOut = Decide.decisions(events)

    // feed the aggregator path with the identical derived signal stream
    val parsed = SignalOps.signals(events).select(
      col("symbol"), col("timeframe"), col("side"),
      round(col("price") * 100).cast("long").as("priceC"),
      round(col("qty") * 100).cast("long").as("qtyC"),
      col("ts_ms").as("tsMs"),
      col("event_id").as("seq"))
    val udafOut = SignalStream.decisions(spark, parsed, "7 days")

    val a = batchOut.collect().map(_.toSeq).toSet
    val b = udafOut.collect().map(_.toSeq).toSet
    assert(a.nonEmpty)
    assert(a == b)
  }
}
