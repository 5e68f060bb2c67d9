package graft.streaming

import org.apache.spark.sql.streaming.StreamingQueryListener
import scala.collection.mutable.ArrayBuffer

/** O7 (SURVEY §2.7; reference OrderService.kt:72-81 + processor
  * Main.kt:68-92): the reference logs a processed/created ratio report
  * every 30 s from a side thread. The Spark-native shape is a
  * StreamingQueryListener fed by micro-batch progress — including any
  * `observe` metrics (P3) — with no user thread and no shared mutable
  * pipeline state.
  */
class MetricsListener extends StreamingQueryListener {

  final case class BatchMetrics(batchId: Long, numInputRows: Long,
    observed: Map[String, Map[String, Any]])

  val batches: ArrayBuffer[BatchMetrics] = ArrayBuffer.empty

  def totalInputRows: Long = synchronized(batches.map(_.numInputRows).sum)

  override def onQueryStarted(
      e: StreamingQueryListener.QueryStartedEvent): Unit = ()

  override def onQueryProgress(
      e: StreamingQueryListener.QueryProgressEvent): Unit = synchronized {
    import scala.jdk.CollectionConverters._
    val obs = e.progress.observedMetrics.asScala.map { case (k, row) =>
      k -> row.schema.fieldNames.zipWithIndex
        .map { case (f, i) => f -> row.get(i) }.toMap
    }.toMap
    batches += BatchMetrics(e.progress.batchId, e.progress.numInputRows, obs)
  }

  override def onQueryTerminated(
      e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
}
