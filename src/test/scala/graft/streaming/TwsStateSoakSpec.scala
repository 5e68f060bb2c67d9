package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.nio.file.Files

/** High-cardinality state soak for the transformWithState pipeline on
  * the RocksDB provider (PLAN_r3 item 7 / VERDICT r3 next-round #7):
  * tens of thousands of distinct (symbol, window) keys flow through
  * advancing windows; the event-time timers must EVICT closed windows'
  * state as the watermark passes, so resident state stays bounded by
  * the live window population — not by every key ever seen. Asserted
  * from the query's own state-store metrics (numRowsRemoved /
  * numRowsTotal and the RocksDB memory gauge); measured numbers are
  * recorded in BASELINE.md. */
class TwsStateSoakSpec extends SparkSpec {

  // symbols per window; env-scalable for the out-of-suite big soak
  // (SPARK_GRAFT_SOAK_KEYS=333334 drives ~1M distinct keys; measured
  // numbers recorded in BASELINE.md)
  private val N = sys.env.getOrElse("SPARK_GRAFT_SOAK_KEYS", "10000").toInt
  private val W = TwsSignals.WindowMs

  private def windowRows(w: Long, n: Int): Seq[SigInput] =
    (0 until n).flatMap { i =>
      val sym = s"S$i"
      Seq(
        SigInput(sym, "1m", "BUY", 100L + i, 10L, w * W + 100, 2L * i),
        SigInput(sym, "5m", "SELL", 100L + i, 10L, w * W + 200, 2L * i + 1))
    }

  test(s"watermark-driven eviction keeps RocksDB state bounded across " +
    s"3×$N-key windows") {
    import spark.implicits._
    val base = Files.createTempDirectory("tws-soak").toString
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val src = MemoryStream[SigInput]
    try {
      val updates = TwsSignals.windowUpdates(spark, src.toDF())
      val q = updates.toDF().writeStream
        .option("checkpointLocation", s"$base/ckpt")
        .outputMode("update")
        .format("noop").start()
      val t0 = System.nanoTime()
      // four advancing windows; watermark(0s) trails one batch, so w0's
      // timers fire while w2 loads, w1's while w3 loads
      for (w <- 0L to 3L) {
        src.addData(windowRows(w, if (w == 3) 100 else N))
        q.processAllAvailable()
      }
      val secs = (System.nanoTime() - t0) / 1e9
      val ops = q.recentProgress.toSeq.flatMap(_.stateOperators.toSeq)
      q.stop()

      val removed = ops.map(_.numRowsRemoved).sum
      val lastTotal = ops.last.numRowsTotal
      val expiredTimers = ops.map(
        _.customMetrics.getOrDefault("numExpiredTimers", 0L).toLong).sum
      val sst = ops.last.customMetrics.getOrDefault("rocksdbSstFileSize", 0L)
      val pinned = ops.last.customMetrics
        .getOrDefault("rocksdbPinnedBlocksMemoryUsage", 0L)
      info(f"soak: ${3 * N + 100} keys, $secs%.1f s, removed=$removed, " +
        s"finalRows=$lastTotal, expiredTimers=$expiredTimers, " +
        s"sstBytes=$sst, pinnedBytes=$pinned")

      // every closed window (w0, w1, and w2 once w3's rows advance the
      // watermark past its end) is evicted by its timer: 3 state rows
      // per key (two timeframe map entries + the timer flag)
      assert(removed >= 3 * 2 * N,
        s"expected >= ${3 * 2 * N} evicted state rows, got $removed")
      assert(expiredTimers >= 2 * N,
        s"expected >= ${2 * N} expired timers, got $expiredTimers")
      // resident state is bounded by the one still-open window's 100
      // keys (x3 rows, with slack) — NOT the 30k keys ever seen
      assert(lastTotal <= 1000L,
        s"state not bounded by the live window: $lastTotal rows resident")
      // RocksDB on-disk/pinned footprint stays proportional to keys,
      // not unbounded (tens of MB at the default 10k/window)
      assert(sst + pinned < math.max(256L * 1024 * 1024, 4096L * N),
        s"RocksDB footprint ${sst + pinned} bytes")
    } finally {
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }
}
