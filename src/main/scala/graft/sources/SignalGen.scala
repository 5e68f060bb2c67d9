package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic synthetic signal generator (SURVEY §2.1 S3; reference
  * signal-generator Main.kt:27-115).
  *
  * The reference rate-loops `ratePerSec × durationSec` random signals from
  * coroutines; here the same distribution comes from pure arithmetic on a
  * row id — seeded, partition-independent, reproducible (SURVEY §7.5(6)):
  * `rand()` in Spark depends on partition layout, id arithmetic does not.
  *
  * Batch form: `spark.range(n)`. Streaming form: the rate source mapped
  * through the same expressions — one definition, two execution modes.
  */
object SignalGen {

  /** Reference base-price map (signal-generator Main.kt:41-47). XRPUSDT is
    * emitted but missing from order-manager's price map — the default-price
    * path the rebuild keeps (SURVEY §0 known inconsistencies). */
  val symbols: Seq[(String, Double)] = Seq(
    "BTCUSDT" -> 43000.0, "ETHUSDT" -> 2300.0, "SOLUSDT" -> 98.0,
    "BNBUSDT" -> 310.0, "ADAUSDT" -> 0.52, "XRPUSDT" -> 0.62)

  /** uniform in [0,1) from id and a stream tag. xxhash64, not a linear
    * congruence: an affine map mod p is a rotation with near-zero
    * discrepancy — consecutive ids alternate around 0.5 and the buy/sell
    * balance never drifts from ~0, starving the decision cascade. A real
    * mixer gives the random walk the reference's generator has. */
  private def u(id: Column, tag: Int): Column =
    pmod(xxhash64(id, lit(tag)), lit(1000003L)).cast("double") / 1000003.0

  /** Columns of one synthetic signal for row `id`, starting at `baseTsMs`
    * spaced `gapMs` apart. */
  private def signalCols(id: Column, baseTsMs: Long, gapMs: Long): Seq[Column] = {
    val symIdx = pmod(id, lit(symbols.size)).cast("int")
    val symbol = symbols.zipWithIndex.foldLeft(lit(symbols.head._1)) {
      case (acc, ((s, _), i)) => when(symIdx === i, lit(s)).otherwise(acc)
    }
    val base = symbols.zipWithIndex.foldLeft(lit(symbols.head._2)) {
      case (acc, ((_, p), i)) => when(symIdx === i, lit(p)).otherwise(acc)
    }
    val side = when(u(id, 1) < 0.5, "BUY").otherwise("SELL")
    // timeframe from an independent hash, NOT id % 3 — id % 6 picks the
    // symbol, and gcd(6,3)=3 would weld each symbol to one timeframe,
    // starving the ≥2-timeframes window filter (W7)
    val tf = when(u(id, 4) < 1.0 / 3, "1m")
      .when(u(id, 4) < 2.0 / 3, "5m").otherwise("15m")
    // price = base × (1 ± 0.3%) (Main.kt:102); qty ~ U(0.01, 0.5) (kt:103)
    val price = round(base * (lit(1.0) + (u(id, 2) - 0.5) * 0.006), 2)
    val qty = round(lit(0.01) + u(id, 3) * 0.49, 2)
    val ts = lit(baseTsMs) + id * gapMs
    Seq(symbol.as("symbol"), side.as("side"), tf.as("timeframe"),
      price.as("price"), qty.as("qty"), ts.as("ts"))
  }

  private def toWire(df: DataFrame, id: Column, baseTsMs: Long, gapMs: Long): DataFrame =
    df.select(signalCols(id, baseTsMs, gapMs) :+ id.as("seq"): _*)
      .select(to_json(struct(col("symbol"), col("side"), col("qty"),
        col("price"), col("timeframe"), col("ts"))).as("value"), col("seq"))

  /** Batch: n signals as Kafka-wire JSON (`value` string + `seq`). */
  def batch(spark: SparkSession, n: Long,
      baseTsMs: Long = 1704067200000L, gapMs: Long = 1000L): DataFrame =
    toWire(spark.range(n).toDF(), col("id"), baseTsMs, gapMs)

  /** Streaming: rate-source signals at `rowsPerSecond`, same wire shape. */
  def stream(spark: SparkSession, rowsPerSecond: Int,
      baseTsMs: Long = 1704067200000L, gapMs: Long = 1000L): DataFrame =
    toWire(spark.readStream.format("rate")
      .option("rowsPerSecond", rowsPerSecond).load(),
      col("value"), baseTsMs, gapMs)
}
