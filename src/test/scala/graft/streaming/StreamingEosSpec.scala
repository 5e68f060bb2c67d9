package graft.streaming

import graft.SparkSpec
import graft.sources.SignalGen
import java.nio.file.{Files, Paths}

/** End-to-end streaming + exactly-once semantics (port of the reference's
  * operational EOS demos, SURVEY §5.1/§5.2):
  *
  *  - eos-demo.sh:27-65 — inject duplicate signals, assert they never
  *    reach the aggregate (source-side dedup within watermark);
  *  - checkpoint restart — committed offsets resume, nothing reprocessed;
  *  - replayed sink batches (crash-before-commit) become no-ops through
  *    the idempotent order key (verify-eos.sh:104-112 analogue).
  *
  * Source is a JSON-file directory (replayable across restarts, unlike
  * MemoryStream), sink is OutboxPipeline's idempotent TxnStore.
  */
class StreamingEosSpec extends SparkSpec {

  private def writeWire(dir: String, name: String, rows: Seq[String]): Unit = {
    Files.createDirectories(Paths.get(dir))
    Files.write(Paths.get(dir, name), rows.mkString("\n").getBytes("UTF-8"))
  }

  /** dense signals: every symbol×timeframe hit many times inside one
    * 5-minute window so decisions actually fire */
  private def wireRows(n: Int): Seq[String] = {
    import org.apache.spark.sql.functions._
    SignalGen.batch(spark, n, baseTsMs = 1704067200000L, gapMs = 500L)
      .select(col("value")).collect().map(_.getString(0)).toSeq
  }

  private def runUntilIdle(dir: String, checkpoint: String): Unit = {
    val raw = spark.readStream.text(dir)
      .selectExpr("value", "CAST(0 AS LONG) AS seq")
    val parsed = SignalStream.dedupSignals(SignalStream.parse(raw))
    val decisions = SignalStream.decisions(spark, parsed, "5 minutes")
    val q = OutboxPipeline.ordersSink(spark, decisions, checkpoint).start()
    q.processAllAvailable()
    q.stop()
  }

  test("dup injection + checkpoint restart: exactly one order per key") {
    val base = Files.createTempDirectory("eos").toString
    val (srcDir, ckpt) = (s"$base/src", s"$base/ckpt")
    OutboxPipeline.TxnStore.clear()

    val rows = wireRows(600)
    writeWire(srcDir, "batch1.json", rows)
    runUntilIdle(srcDir, ckpt)
    val after1 = OutboxPipeline.TxnStore.orders.size()
    assert(after1 > 0, "pipeline produced no orders")
    assert(OutboxPipeline.TxnStore.outbox.size == after1,
      "outbox not atomic with orders")

    // EOS gauntlet 1: redeliver the SAME signals (at-least-once upstream)
    // and restart from the same checkpoint — dedup drops them before the
    // aggregate, so decisions and orders must not change
    writeWire(srcDir, "batch2_dup.json", rows)
    runUntilIdle(srcDir, ckpt)
    assert(OutboxPipeline.TxnStore.orders.size() == after1,
      "duplicate delivery changed orders — EOS broken")

    // EOS gauntlet 2: replay a sink batch (crash-after-write-
    // before-offset-commit): idempotent key makes it a no-op
    import scala.jdk.CollectionConverters._
    val existing = OutboxPipeline.TxnStore.orders.values().asScala.head
    val dupsBefore = OutboxPipeline.TxnStore.duplicateAttempts
    OutboxPipeline.TxnStore.writeAtomically(existing)
    assert(OutboxPipeline.TxnStore.orders.size() == after1)
    assert(OutboxPipeline.TxnStore.duplicateAttempts == dupsBefore + 1)

    // one order per business key
    val keys = OutboxPipeline.TxnStore.orders.values().asScala.map(_.clientOrderId).toSeq
    assert(keys.size == keys.toSet.size)
  }

  test("restart with no new data reprocesses nothing") {
    val base = Files.createTempDirectory("eos2").toString
    val (srcDir, ckpt) = (s"$base/src", s"$base/ckpt")
    OutboxPipeline.TxnStore.clear()
    writeWire(srcDir, "b1.json", wireRows(300))
    runUntilIdle(srcDir, ckpt)
    val n1 = OutboxPipeline.TxnStore.orders.size()
    val dups1 = OutboxPipeline.TxnStore.duplicateAttempts
    runUntilIdle(srcDir, ckpt) // cold restart, same checkpoint
    assert(OutboxPipeline.TxnStore.orders.size() == n1)
    assert(OutboxPipeline.TxnStore.duplicateAttempts == dups1,
      "restart re-emitted batches — offsets not resumed")
  }
}
