package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

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
}
