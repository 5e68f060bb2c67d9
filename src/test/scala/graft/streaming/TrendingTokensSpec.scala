package graft.streaming

import graft.SparkSpec
import java.nio.file.{Files, Paths}

/** Streaming heavy hitters: batchId-gated exactly-once sketch state. */
class TrendingTokensSpec extends SparkSpec {

  import spark.implicits._

  private def docs(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  private def counts(store: String): Map[String, Long] =
    TrendingTokens.topK(spark, store, 100).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap

  test("batches accumulate exact counts on a map-resident vocabulary; " +
    "a REPLAYED batch id is absorbed, a new one applies") {
    val store = Files.createTempDirectory("trend").toString + "/sketch"
    assert(TrendingTokens.mergeBatch(spark,
      docs((1, "a b a"), (2, "b c")), store, batchId = 0))
    assert(counts(store) == Map("a" -> 2L, "b" -> 2L, "c" -> 1L))

    // replay of batch 0 (same id): the gate absorbs it — no double count
    assert(!TrendingTokens.mergeBatch(spark, docs((1, "a b a"), (2, "b c")),
      store, batchId = 0))
    assert(counts(store) == Map("a" -> 2L, "b" -> 2L, "c" -> 1L),
      "replayed batch double-counted")

    // next id applies
    assert(TrendingTokens.mergeBatch(spark, docs((3, "c c d")), store, batchId = 1))
    assert(counts(store) == Map("a" -> 2L, "b" -> 2L, "c" -> 3L, "d" -> 1L))
  }

  test("an interrupted state swap (live gone, tmp present) self-heals on " +
    "the next read, preserving the batch gate") {
    import org.apache.hadoop.fs.Path
    val store = Files.createTempDirectory("trendx").toString + "/sketch"
    TrendingTokens.mergeBatch(spark, docs((1, "x y")), store, batchId = 0)
    // simulate: writer crashed between delete(live) and rename(tmp, live)
    val f = new Path(store).getFileSystem(spark.sparkContext.hadoopConfiguration)
    f.rename(new Path(store), new Path(s"$store.tmp"))
    assert(!f.exists(new Path(store)))
    // read adopts tmp; replay of id 0 is still absorbed afterwards
    assert(counts(store) == Map("x" -> 1L, "y" -> 1L))
    assert(!TrendingTokens.mergeBatch(spark, docs((1, "x y")), store, batchId = 0))
    assert(counts(store) == Map("x" -> 1L, "y" -> 1L))
  }

  test("a TRUNCATED first-write tmp (crash mid-create, live never " +
    "existed) is discarded, and the replayed batch re-applies cleanly") {
    val store = Files.createTempDirectory("trendt").toString + "/sketch"
    // crash window: first writeState died mid-create — 3 junk bytes
    Files.createDirectories(Paths.get(store).getParent)
    Files.write(Paths.get(s"$store.tmp"), Array[Byte](1, 2, 3))
    // reader discards the corrupt tmp instead of adopting it...
    assert(counts(store).isEmpty)
    // ...and the interrupted batch (never recorded) re-applies
    assert(TrendingTokens.mergeBatch(spark, docs((1, "a b a")), store, batchId = 0))
    assert(counts(store) == Map("a" -> 2L, "b" -> 1L))
  }

  test("streaming maintain: file batches + checkpointed RESTART never " +
    "double-counts (the replayed micro-batch hits the gate)") {
    val base = Files.createTempDirectory("trend3").toString
    val (src, store, ckpt) = (s"$base/src", s"$base/sketch", s"$base/ckpt")
    def put(name: String, rows: String*): Unit = {
      Files.createDirectories(Paths.get(src))
      Files.write(Paths.get(src, name), rows.mkString("\n").getBytes("UTF-8"))
    }
    put("b1.json", """{"doc_id":1,"text":"a b a"}""", """{"doc_id":2,"text":"b"}""")
    val q1 = TrendingTokens.maintain(spark, src, store, ckpt).start()
    q1.processAllAvailable(); q1.stop()
    assert(counts(store) == Map("a" -> 2L, "b" -> 2L))

    put("b2.json", """{"doc_id":3,"text":"b c"}""")
    val q2 = TrendingTokens.maintain(spark, src, store, ckpt).start()
    q2.processAllAvailable(); q2.stop()
    assert(counts(store) == Map("a" -> 2L, "b" -> 3L, "c" -> 1L),
      "restart lost or double-applied a batch")
  }
}
