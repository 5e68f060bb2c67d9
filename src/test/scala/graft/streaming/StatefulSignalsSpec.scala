package graft.streaming

import graft.SparkSpec
import graft.sources.SignalGen
import org.apache.spark.sql.functions._
import java.nio.file.Files
import scala.collection.concurrent.TrieMap

/** flatMapGroupsWithState variant: final per-window values must equal a
  * one-shot fold of the aggregator regardless of how the input is split
  * into micro-batches. */
class StatefulSignalsSpec extends SparkSpec {

  test("stateful final values == one-shot aggregator fold, across batches") {
    val base = Files.createTempDirectory("fmgws").toString
    val rows = SignalGen.batch(spark, 900, gapMs = 400L)
      .select("value").collect().map(_.getString(0))
    // same data split into two files => multiple micro-batches
    Files.write(java.nio.file.Paths.get(base, "a.json"),
      rows.take(450).mkString("\n").getBytes("UTF-8"))
    Files.write(java.nio.file.Paths.get(base, "b.json"),
      rows.drop(450).mkString("\n").getBytes("UTF-8"))

    // collect the LAST update per key (latest batch wins)
    val latest = TrieMap.empty[(String, Long), (Long, Seq[Any])]
    StatefulSignalsSpec.sink = (batchId, k, v) => {
      latest.get(k) match {
        case Some((b, _)) if b > batchId => ()
        case _ => latest.put(k, (batchId, v))
      }
    }

    val raw = spark.readStream
      .option("maxFilesPerTrigger", 1) // force one micro-batch per file
      .text(base)
      .selectExpr("value", "CAST(0 AS LONG) AS seq")
    val updates = StatefulSignals.windowUpdates(spark, SignalStream.parse(raw))
    val q = updates.toDF().writeStream
      .option("checkpointLocation", s"$base/ckpt")
      .outputMode("update")
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, batchId: Long) =>
        df.collect().foreach { r =>
          StatefulSignalsSpec.sink(batchId, (r.getString(0), r.getLong(1)),
            Seq(r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5),
              r.getDouble(6), r.getDouble(7), r.getDouble(8)))
        }
        ()
      }.start()
    q.processAllAvailable()
    q.stop()

    // one-shot fold of the same data through the same aggregator
    val parsedBatch = SignalStream.parse(SignalGen.batch(spark, 900, gapMs = 400L))
    val oneShot = parsedBatch
      .withColumn("w_start",
        expr(s"(tsMs div ${StatefulSignals.WindowMs}L) * ${StatefulSignals.WindowMs}L"))
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

    assert(latest.nonEmpty, "stateful pipeline emitted nothing")
    assert(latest.keySet == oneShot.keySet.toSet)
    oneShot.foreach { case (k, r) =>
      val got = latest(k)._2
      val exp = Seq(r.n_tf, r.signal_count, r.balance, r.alignment,
        r.avg_price, r.avg_vol, r.qty_basis)
      assert(got == exp, s"mismatch at $k: got=$got exp=$exp")
    }
  }
}

object StatefulSignalsSpec {
  /** static hook so the foreachBatch closure (serialized to executors in
    * local mode) can reach the collector */
  @volatile var sink: (Long, (String, Long), Seq[Any]) => Unit = (_, _, _) => ()
}
