package graft.streaming

import graft.SparkSpec
import graft.sources.SignalGen
import org.apache.spark.sql.functions._
import java.nio.file.Files
import scala.collection.concurrent.TrieMap

/** transformWithState variant: final per-window values must equal the
  * one-shot Aggregator fold regardless of micro-batch boundaries, and
  * state must live in RocksDB (the provider the API requires — same
  * store family as the reference's window store). */
class TwsSignalsSpec extends SparkSpec {

  test("transformWithState final values == one-shot aggregator fold") {
    val base = Files.createTempDirectory("tws").toString
    val rows = SignalGen.batch(spark, 900, gapMs = 400L)
      .select("value").collect().map(_.getString(0))
    Files.write(java.nio.file.Paths.get(base, "a.json"),
      rows.take(450).mkString("\n").getBytes("UTF-8"))
    Files.write(java.nio.file.Paths.get(base, "b.json"),
      rows.drop(450).mkString("\n").getBytes("UTF-8"))

    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val latest = TrieMap.empty[(String, Long), (Long, Seq[Any])]
    TwsSignalsSpec.sink = (batchId, k, v) => {
      latest.get(k) match {
        case Some((b, _)) if b > batchId => ()
        case _ => latest.put(k, (batchId, v))
      }
    }
    try {
      val raw = spark.readStream
        .option("maxFilesPerTrigger", 1)
        .text(base)
        .selectExpr("value", "CAST(0 AS LONG) AS seq")
      val updates = TwsSignals.windowUpdates(spark, SignalStream.parse(raw))
      val q = updates.toDF().writeStream
        .option("checkpointLocation", s"$base/ckpt")
        .outputMode("update")
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, batchId: Long) =>
          df.collect().foreach { r =>
            TwsSignalsSpec.sink(batchId, (r.getString(0), r.getLong(1)),
              Seq(r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5),
                r.getDouble(6), r.getDouble(7), r.getDouble(8)))
          }
          ()
        }.start()
      q.processAllAvailable()
      q.stop()
    } finally {
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }

    val parsedBatch = SignalStream.parse(SignalGen.batch(spark, 900, gapMs = 400L))
    val oneShot = parsedBatch
      .withColumn("w_start",
        expr(s"(tsMs div ${TwsSignals.WindowMs}L) * ${TwsSignals.WindowMs}L"))
      .collect()
      .groupBy(r => (r.getAs[String]("symbol"), r.getAs[Long]("w_start")))
      .map { case (k, rs) =>
        val st = rs.map(r => SigInput(r.getAs[String]("symbol"),
            r.getAs[String]("timeframe"), r.getAs[String]("side"),
            r.getAs[Long]("priceC"), r.getAs[Long]("qtyC"),
            r.getAs[Long]("tsMs"), r.getAs[Long]("seq")))
          .sortBy(s => (s.tsMs, s.seq))
          .foldLeft(SignalAggregator.zero)(SignalAggregator.reduce)
        k -> SignalAggregator.finish(st)
      }
      .filter(_._2.n_tf >= 2)

    assert(latest.nonEmpty, "transformWithState emitted nothing")
    assert(latest.keySet == oneShot.keySet.toSet)
    oneShot.foreach { case (k, r) =>
      val got = latest(k)._2
      val exp = Seq(r.n_tf, r.signal_count, r.balance, r.alignment,
        r.avg_price, r.avg_vol, r.qty_basis)
      assert(got == exp, s"mismatch at $k: got=$got exp=$exp")
    }
  }
}

object TwsSignalsSpec {
  @volatile var sink: (Long, (String, Long), Seq[Any]) => Unit = (_, _, _) => ()
}
