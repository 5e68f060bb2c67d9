package graft.streaming

import graft.SparkSpec
import graft.sources.SignalGen
import java.nio.file.{Files, Paths}

/** §2.10 error handling: the reference's crash policy — log, back off,
  * restart from committed offsets (signal-processor Main.kt:36-39;
  * OrderService.kt:103-106 consumer loop). Injects a sink crash mid-run
  * and asserts the restarted query converges to EXACTLY the same orders
  * a crash-free run produces (replayed batch absorbed by the idempotent
  * key).
  */
class ResilienceSpec extends SparkSpec {

  @volatile private var crashesLeft = 0

  test("sink crash -> backoff restart from checkpoint; orders unchanged") {
    val base = Files.createTempDirectory("resilience").toString
    val rows = SignalGen.batch(spark, 600, baseTsMs = 1704067200000L, gapMs = 500L)
      .select("value").collect().map(_.getString(0))

    def run(src: String, ckpt: String, crashes: Int): Int = {
      crashesLeft = crashes
      OutboxPipeline.runWithRestarts(() => {
        val raw = spark.readStream.text(src)
          .selectExpr("value", "CAST(0 AS LONG) AS seq")
        val parsed = SignalStream.dedupSignals(SignalStream.parse(raw))
        val decisions = SignalStream.decisions(spark, parsed, "5 minutes")
        decisions.writeStream
          .outputMode("update")
          .option("checkpointLocation", ckpt)
          .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
            if (crashesLeft > 0) {
              crashesLeft -= 1
              throw new RuntimeException("injected sink crash")
            }
            OutboxPipeline.writeDecisionsBatch(batch)
          }
          .start()
      }, maxRestarts = 3, backoffMs = 50L)
    }

    // reference run, no crash
    OutboxPipeline.TxnStore.clear()
    val cleanSrc = s"$base/clean"
    Files.createDirectories(Paths.get(cleanSrc))
    Files.write(Paths.get(cleanSrc, "b.json"), rows.mkString("\n").getBytes("UTF-8"))
    assert(run(cleanSrc, s"$base/ckpt_clean", crashes = 0) == 0)
    import scala.jdk.CollectionConverters._
    val expected = OutboxPipeline.TxnStore.orders.asScala.toMap
    assert(expected.nonEmpty)

    // crashing run: first batch attempt throws, restart replays it
    OutboxPipeline.TxnStore.clear()
    val crashSrc = s"$base/crash"
    Files.createDirectories(Paths.get(crashSrc))
    Files.write(Paths.get(crashSrc, "b.json"), rows.mkString("\n").getBytes("UTF-8"))
    val restarts = run(crashSrc, s"$base/ckpt_crash", crashes = 1)
    assert(restarts == 1, s"expected exactly one restart, got $restarts")
    val got = OutboxPipeline.TxnStore.orders.asScala.toMap
    assert(got == expected, "restarted run diverged from the crash-free run")

    // exhausted restarts surface the failure instead of hiding it
    OutboxPipeline.TxnStore.clear()
    val failSrc = s"$base/fail"
    Files.createDirectories(Paths.get(failSrc))
    Files.write(Paths.get(failSrc, "b.json"), rows.mkString("\n").getBytes("UTF-8"))
    intercept[Throwable] { run(failSrc, s"$base/ckpt_fail", crashes = 99) }
  }
}
