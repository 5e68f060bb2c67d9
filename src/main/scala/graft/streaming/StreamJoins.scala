package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream joins — the capability the reference approximates with
  * its DB round-trip (order-manager reads back recent orders to match
  * them, DatabaseManager.kt:90-121): joining two live streams directly,
  * with state bounded by watermarks on BOTH sides.
  *
  * Scale design: a stream-stream join shuffles both sides on the equi
  * key (symbol) once; the time-range predicate bounds how long each row
  * is retained in the join state store (Spark evicts rows once the other
  * side's watermark passes the range upper bound), so state is
  * O(rate × range) per key — never unbounded.
  */
object StreamJoins {

  /** Decision→fill attribution: each execution report (fill) joins the
    * decision that caused it — same symbol, fill within 10 minutes AFTER
    * the decision window opened. Inner join + both-side watermarks =
    * appendable and state-bounded. Works identically on batch frames
    * (the parity the spec checks). */
  def decisionFills(decisions: DataFrame, fills: DataFrame): DataFrame = {
    val d = decisions
      .withColumn("d_time", timestamp_millis(col("w_start")))
      .withWatermark("d_time", "10 minutes")
    val f = fills
      .withColumn("f_time", timestamp_millis(col("fill_ts")))
      .withWatermark("f_time", "10 minutes")
    d.join(f,
        col("symbol") === col("fill_symbol") &&
          col("f_time") >= col("d_time") &&
          col("f_time") <= col("d_time") + expr("INTERVAL 10 MINUTES"))
      .select(col("symbol"), col("w_start"), col("action"),
        col("fill_ts"), col("fill_qty"),
        (col("fill_ts") - col("w_start")).as("latency_ms"))
  }
}
