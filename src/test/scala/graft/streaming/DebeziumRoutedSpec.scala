package graft.streaming

import graft.SparkSpec
import graft.operators.CdcRoute
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Files

/** S5 production path (a): parsing the records Debezium's EventRouter
  * SMT emits on the routed topic (pg-outbox-connector.yaml:31-53) —
  * literal wire fixtures in, frame parity with the emulated relay out.
  * No broker needed: the parser is a pure projection over the Kafka
  * source's output schema, driven here as a batch frame. */
case class Hdr(key: String, value: Array[Byte])
case class RoutedRec(key: Array[Byte], value: Array[Byte],
  topic: String, headers: Seq[Hdr])

class DebeziumRoutedSpec extends SparkSpec {

  private def b(s: String): Array[Byte] = s.getBytes(UTF_8)

  // literal routed-event payloads — the 9-field outbox order JSON
  // (OrderService.kt:161-171) exactly as the connector would carry it
  private val payload1 =
    """{"orderId":"a1b2","clientOrderId":"ORD-1000-BTCUSDT","symbol":"BTCUSDT","side":"BUY","qty":2.50,"price":50000.00,"status":"PENDING","confidence":0.700000,"signals":3}"""
  private val payload2 =
    """{"orderId":"c3d4","clientOrderId":"ORD-2000-ETHUSDT","symbol":"ETHUSDT","side":"SELL","qty":1.00,"price":3000.00,"status":"PENDING","confidence":0.820000,"signals":4}"""

  private def hdrs(aggId: String, eventId: String, occurredAtMs: Long) = Seq(
    Hdr("event_id", b(eventId)), Hdr("aggregate_id", b(aggId)),
    Hdr("event_type", b("ORDER_CREATED")), Hdr("occurred_at", b(occurredAtMs.toString)))

  test("routed EventRouter records parse to the relay frame; tombstones " +
    "and malformed values drop; header fallback keys keyless records") {
    import spark.implicits._
    val records = Seq(
      RoutedRec(b("a1b2"), b(payload1), "trading.orders", hdrs("a1b2", "e1", 1000L)),
      // keyless producer: aggregate_id header must take over
      RoutedRec(null, b(payload2), "trading.orders", hdrs("c3d4", "e2", 2000L)),
      // tombstone (yaml:52-53): dropped
      RoutedRec(b("dead"), null, "trading.orders", hdrs("dead", "e3", 3000L)),
      // non-JSON and non-order-JSON values: parse-or-drop
      RoutedRec(b("bad1"), b("not json"), "trading.orders", hdrs("bad1", "e4", 4000L)),
      RoutedRec(b("bad2"), b("""{"v":1}"""), "trading.orders", hdrs("bad2", "e5", 5000L)))
      .toDF()

    val out = CdcRoute.fromDebeziumRouted(records)
    val rows = out.orderBy("occurred_at_ms").collect()
    assert(rows.length == 2, s"expected 2 surviving records, got ${rows.length}")
    assert(rows(0).getAs[String]("key") == "a1b2")
    assert(rows(0).getAs[String]("value") == payload1)
    assert(rows(0).getAs[String]("topic") == "trading.orders")
    assert(rows(0).getAs[Long]("occurred_at_ms") == 1000L)
    assert(rows(1).getAs[String]("key") == "c3d4", "header fallback key")
    assert(rows(1).getAs[String]("value") == payload2)
    assert(rows(1).getAs[Long]("occurred_at_ms") == 2000L)
  }

  test("frame parity with the emulated relay: same schema, same records " +
    "from the same outbox rows") {
    import spark.implicits._
    val base = Files.createTempDirectory("dbz").toString
    val orders = Seq(
      ("ORD-1000-BTCUSDT", payload1, 1000L),
      ("ORD-2000-ETHUSDT", payload2, 2000L))
    orders.toDF("clientOrderId", "payload", "wStart")
      .write.mode("append").parquet(s"$base/outbox")
    val q = OutboxPipeline.cdcRelay(spark, s"$base/outbox").writeStream
      .format("memory").queryName("dbz_relay")
      .option("checkpointLocation", s"$base/ckpt")
      .outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val relay = spark.table("dbz_relay")

    val routed = CdcRoute.fromDebeziumRouted(Seq(
      RoutedRec(b("a1b2"), b(payload1), "trading.orders", hdrs("a1b2", "e1", 1000L)),
      RoutedRec(b("c3d4"), b(payload2), "trading.orders", hdrs("c3d4", "e2", 2000L)))
      .toDF())

    // identical frame: same column names, same types, same order
    assert(routed.schema.map(f => (f.name, f.dataType)) ==
      relay.schema.map(f => (f.name, f.dataType)),
      s"schema drift: ${routed.schema} vs ${relay.schema}")
    // identical records up to the documented key identity (the WAL
    // stores client_order_id; EventRouter keys by aggregate_id — both
    // the unique order id): value/topic/occurred_at_ms must agree
    def core(df: org.apache.spark.sql.DataFrame) =
      df.select("value", "topic", "occurred_at_ms").collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(core(routed) == core(relay))
    assert(routed.collect().map(_.getAs[String]("key")).toSet == Set("a1b2", "c3d4"))
  }
}
