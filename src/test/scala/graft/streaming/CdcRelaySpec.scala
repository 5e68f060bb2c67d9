package graft.streaming

import graft.SparkSpec
import java.nio.file.Files

/** The emulated CDC relay (S5/C1-C4): outbox "WAL" directory tailed by a
  * file-source streaming query with the EventRouter projection. */
class CdcRelaySpec extends SparkSpec {

  test("outbox appends are routed, keyed, and tombstones dropped") {
    import spark.implicits._
    val base = Files.createTempDirectory("cdc").toString
    val (outboxDir, ckpt) = (s"$base/outbox", s"$base/ckpt")

    // first WAL segment (one tombstone in the mix)
    Seq(
      ("ORD-1-BTCUSDT", """{"v":1}""", 1000L),
      ("ORD-1-ETHUSDT", null.asInstanceOf[String], 1000L),
      ("ORD-2-BTCUSDT", """{"v":2}""", 2000L))
      .toDF("clientOrderId", "payload", "wStart")
      .write.mode("append").parquet(outboxDir)

    val routed = OutboxPipeline.cdcRelay(spark, outboxDir)
    val q = routed.writeStream
      .format("memory").queryName("cdc_out")
      .option("checkpointLocation", ckpt)
      .outputMode("append").start()
    q.processAllAvailable()

    // second segment arrives later — the relay tails it incrementally
    Seq(("ORD-3-SOLUSDT", """{"v":3}""", 3000L))
      .toDF("clientOrderId", "payload", "wStart")
      .write.mode("append").parquet(outboxDir)
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("cdc_out").collect()
    assert(rows.length == 3, "tombstone not dropped or segment missed")
    assert(rows.forall(_.getAs[String]("topic") == "trading.orders"))
    val keys = rows.map(_.getAs[String]("key")).toSet
    assert(keys == Set("ORD-1-BTCUSDT", "ORD-2-BTCUSDT", "ORD-3-SOLUSDT"))
  }
}
