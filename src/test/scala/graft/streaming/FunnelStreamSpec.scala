package graft.streaming

import graft.{SparkSpec, Tables}
import graft.operators.Relational
import graft.streaming.FunnelStream.{FunnelEvent, FunnelState}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** The streaming funnel's stage machine must agree with the batch
  * running-min-window funnel: unit transition laws, whole-corpus batch
  * parity, and a two-batch checkpointed stream converging to the same
  * final states. */
class FunnelStreamSpec extends SparkSpec {

  private val Unset = Long.MinValue

  test("step: clicks before any view never qualify; purchases without " +
    "a qualified click never convert; minima are kept") {
    val z = FunnelState(Unset, Unset, Unset, 0L)
    val afterClick = FunnelStream.step(z, FunnelEvent(1, "click", 100, 1))
    assert(afterClick.firstClick == Unset, "unqualified click recorded")
    val afterBuy = FunnelStream.step(afterClick, FunnelEvent(1, "purchase", 150, 2))
    assert(afterBuy.firstPurchase == Unset, "conversion without click stage")
    val s1 = Seq(
      FunnelEvent(1, "view", 200, 3), FunnelEvent(1, "click", 300, 4),
      FunnelEvent(1, "view", 180, 5), // later event, earlier ts: min kept
      FunnelEvent(1, "purchase", 400, 6))
      .foldLeft(afterBuy)(FunnelStream.step)
    assert(s1.firstView == 180 && s1.firstClick == 300 &&
      s1.firstPurchase == 400 && s1.nEvents == 6, s"state: $s1")
  }

  test("batch-mode stage machine ≡ the running-min-window funnel on the " +
    "whole events table") {
    val ev = Tables.events(spark, sf())
      .select(col("user_id"), col("event_type"),
        unix_millis(col("ts")).as("ts_ms"), col("event_id"))
    val machine = FunnelStream.funnelUpdates(spark, ev)
      .toDF()
      .select("user_id", "first_view_ms", "first_click_ms",
        "first_purchase_ms", "n_events", "converted")
    val batch = Relational.eventsFunnel(spark, sf())
      .select("user_id", "first_view_ms", "first_click_ms",
        "first_purchase_ms", "n_events", "converted")
    assert(machine.exceptAll(batch).isEmpty && batch.exceptAll(machine).isEmpty,
      "stage machine diverged from the batch funnel")
  }

  test("two ts-ordered file batches + checkpointed restart converge to " +
    "the batch funnel's final states") {
    import spark.implicits._
    val base = Files.createTempDirectory("funnel").toString
    val (src, ckpt) = (s"$base/src", s"$base/ckpt")
    val ev = Tables.events(spark, sf())
      .select(col("user_id"), col("event_type"),
        unix_millis(col("ts")).as("ts_ms"), col("event_id"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .sortBy(e => (e._3, e._4))
    def j(e: (Long, String, Long, Long)): String =
      s"""{"user_id":${e._1},"event_type":"${e._2}","ts_ms":${e._3},"event_id":${e._4}}"""
    val (h1, h2) = ev.splitAt(ev.length / 2)
    Files.createDirectories(Paths.get(src))
    Files.write(Paths.get(src, "b1.json"), h1.map(j).mkString("\n").getBytes)

    val schema = "user_id long, event_type string, ts_ms long, event_id long"
    val out = s"$base/updates"
    def run(): Unit = {
      val q = FunnelStream.funnelUpdates(spark,
          spark.readStream.schema(schema).json(src).toDF())
        .writeStream
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .foreachBatch { (b: org.apache.spark.sql.Dataset[FunnelStream.FunnelUpdate],
            _: Long) =>
          b.write.mode("append").parquet(out)
          ()
        }
        .start()
      q.processAllAvailable(); q.stop()
    }
    run()
    Files.write(Paths.get(src, "b2.json"), h2.map(j).mkString("\n").getBytes)
    run() // restart from checkpoint

    // final state per user = the update with the highest event count
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("n_events").desc)
    val finalStates = spark.read.parquet(out)
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1).drop("rn")
      .select("user_id", "first_view_ms", "first_click_ms",
        "first_purchase_ms", "n_events", "converted")
    val batch = Relational.eventsFunnel(spark, sf())
      .select("user_id", "first_view_ms", "first_click_ms",
        "first_purchase_ms", "n_events", "converted")
    assert(finalStates.exceptAll(batch).isEmpty &&
      batch.exceptAll(finalStates).isEmpty,
      "streamed funnel states diverged from the batch funnel")
  }
}
