package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, StringType, StructField, StructType}

/** CDC / outbox routing (SURVEY.md §2.8 C1-C4; reference
  * deploy/strimzi/connectors/pg-outbox-connector.yaml).
  *
  * The Debezium EventRouter SMT is pure per-record projection + routing —
  * on Spark it is a narrow `select`, no shuffle, fully codegen'd:
  *  - C1 envelope unwrap -> project outbox columns to event fields
  *  - C2 topic routing by aggregate_type ('trading.' || lower(type) || 's',
  *    the dynamic form documented at reference README.md:424)
  *  - C3 header propagation (kept as explicit columns; the Kafka sink maps
  *    them into record headers with includeHeaders=true)
  *  - C4 tombstone drop (payload IS NOT NULL)
  */
object CdcRoute {

  def outboxEvents(spark: SparkSession, events: DataFrame): DataFrame =
    OrderOps.orders(spark, events)
      .withColumn("aggregate_type", lit("ORDER"))
      .withColumn("event_type", lit("ORDER_CREATED"))
      .filter(col("payload").isNotNull)
      .select(
        // aggregateId = order.id (OrderService.kt:175), not the client id
        col("order_id").as("aggregate_id"),
        concat(lit("trading."), lower(col("aggregate_type")), lit("s")).as("topic"),
        col("event_type"),
        col("payload").as("value"),
        col("w_start").as("occurred_at_ms"))

  /** The 9-field order payload (OrderService.kt:161-171) — the schema
    * `fromDebeziumRouted` parses routed values against. */
  val PayloadSchema: StructType = StructType(Seq(
    StructField("orderId", StringType), StructField("clientOrderId", StringType),
    StructField("symbol", StringType), StructField("side", StringType),
    StructField("qty", DoubleType), StructField("price", DoubleType),
    StructField("status", StringType), StructField("confidence", DoubleType),
    StructField("signals", LongType)))

  /** S5 production path (a): consume the topic Debezium's EventRouter
    * SMT already routed (pg-outbox-connector.yaml:31-50) instead of
    * running the emulated relay — the projection a user points
    * `spark.readStream.format("kafka")` output at. Input is the Kafka
    * source's wire frame for `trading.orders` (key/value binary,
    * headers array<struct<key: string, value: binary>>, UTF-8 header
    * values); works identically on a batch frame of captured records
    * (how the spec drives it, no broker needed). Output is the exact
    * frame `cdcRelay` emits — (key, value, topic, occurred_at_ms):
    *  - tombstone drop (yaml:52-53 `drop.tombstones` removes them
    *    upstream; dropped again defensively here): value IS NULL;
    *  - key ← the record key, which EventRouter sets to aggregate_id
    *    (yaml:38 `table.field.event.key`), falling back to the
    *    aggregate_id header (yaml:48) for producers that keyed
    *    differently. Note the emulated relay keys by client_order_id —
    *    the only id its WAL stores; both are the unique order identity;
    *  - value ← the outbox payload verbatim, PARSE-OR-DROP against the
    *    9-field order JSON (same contract as the signal pipeline's P1:
    *    a malformed event is dropped, not poison);
    *  - occurred_at_ms ← the `occurred_at` header (yaml:48-49
    *    `additional.placement`), epoch millis.
    * Narrow select + filters: no shuffle, fully codegen'd except the
    * from_json validation — per-partition parallel at any scale. */
  def fromDebeziumRouted(records: DataFrame): DataFrame = {
    val hmap: Column = map_from_entries(transform(col("headers"),
      h => struct(h.getField("key"), h.getField("value").cast("string"))))
    records
      .filter(col("value").isNotNull) // C4 tombstone drop
      .withColumn("hmap", hmap)
      .withColumn("payload", col("value").cast("string"))
      .withColumn("parsed", from_json(col("payload"), PayloadSchema))
      // parse-or-drop: from_json yields NULL for non-JSON; a JSON value
      // that isn't an order payload has no clientOrderId
      .filter(col("parsed").isNotNull &&
        col("parsed").getField("clientOrderId").isNotNull)
      .select(
        coalesce(col("key").cast("string"), element_at(col("hmap"), "aggregate_id"))
          .as("key"),
        col("payload").as("value"),
        col("topic"),
        element_at(col("hmap"), "occurred_at").cast("long").as("occurred_at_ms"))
  }
}
