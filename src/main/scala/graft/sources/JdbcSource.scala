package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** JDBC source (SURVEY §2.1 S4; reference DatabaseManager.kt:90-121
  * `getRecentOrders`): SELECT … FROM app.orders ORDER BY created_at DESC
  * LIMIT n, plus the incremental poll the emulated CDC path (S5 option b)
  * uses.
  *
  * No RDBMS ships in the test container, so these are exercised only by
  * compilation and the production docstring; the streaming tests cover
  * the same contract against OutboxPipeline.TxnStore. Partitioning
  * matters at scale: `recentOrders` is a driver-side peek (LIMIT n —
  * deliberately not distributed); `incrementalOrders` carries
  * partitionColumn bounds so a backfill scan fans out across executors.
  */
object JdbcSource {

  def recentOrders(spark: SparkSession, url: String, limit: Int,
      props: java.util.Properties = new java.util.Properties): DataFrame =
    spark.read.jdbc(url, "app.orders", props)
      .orderBy(col("created_at").desc)
      .limit(limit)

  /** Incremental poll on the generated epoch-millis column
    * (configmap-init.yaml:36-46) — the self-contained CDC emulation's
    * batch face. `numPartitions` splits [fromMs, toMs) so the read is
    * cluster-parallel, not a single-connection trickle. */
  def incrementalOrders(spark: SparkSession, url: String,
      fromMs: Long, toMs: Long, numPartitions: Int = 16,
      props: java.util.Properties = new java.util.Properties): DataFrame =
    spark.read
      .option("partitionColumn", "occurred_at_ms")
      .option("lowerBound", fromMs)
      .option("upperBound", toMs)
      .option("numPartitions", numPartitions)
      .jdbc(url, "app.outbox", props)
      .filter(col("occurred_at_ms") >= fromMs && col("occurred_at_ms") < toMs)
}
