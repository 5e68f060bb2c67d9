package graft.streaming

import graft.{SparkSpec, Tables}
import graft.operators.SignalOps
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._

/** Streaming robust outliers: the bottom-k sample state is a set
  * function of the observed events (order/replay/split-insensitive),
  * and with the sample covering a key's full history the stream
  * reproduces the batch median/MAD rule bit-exactly. */
class OutlierStreamSpec extends SparkSpec {

  import spark.implicits._

  private def sigRows(d: String) = SignalOps.signals(Tables.events(spark, d))
    .withColumn("price_c", round(col("price") * 100).cast("long"))
    .select("symbol", "price_c", "ts_ms", "event_id")

  test("bottom-k state is the bottom-k of ALL events, under any batch " +
    "split, order, and replay") {
    val evs = (1L to 200L).map(i => ("S", i * 7 % 101, 1000 + i, i))
    val k = 16
    val expected = evs.map(e => (OutlierStream.mix64(e._4), e._2))
      .distinct.sortBy(_._1).take(k)
    val rnd = new scala.util.Random(11)
    for (trial <- 1 to 3) {
      val shuffled = rnd.shuffle(evs)
      val batches = shuffled.grouped(rnd.nextInt(60) + 20).toSeq
      var st = OutlierStream.OutState(0, Array.empty, Array.empty)
      batches.foreach { b =>
        st = OutlierStream.stepExact(b, st, k, warmup = Long.MaxValue)._1
      }
      // replay a random earlier batch verbatim: sample unchanged
      st = OutlierStream.stepExact(batches.head, st, k, Long.MaxValue)._1
      assert(st.hashes.zip(st.prices).toSeq == expected,
        s"trial $trial: state is not the global bottom-k")
    }
  }

  test("with the sample covering full history, streaming flags == the " +
    "batch modified-z rule, bit-exactly") {
    val flags = OutlierStream.detect(sigRows(sf()), k = 4096, warmup = 1)
      .collect().map(f => (f.symbol, f.event_id, f.z_mod)).toSet
    val batch = SignalOps.outliers(spark, sf())
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(6))).toSet
    assert(flags == batch,
      s"stream/batch divergence: extra=${(flags -- batch).take(3)} " +
        s"missing=${(batch -- flags).take(3)}")
    assert(flags.nonEmpty)
  }

  test("two file batches + checkpointed restart: late batch's planted " +
    "outlier is flagged from the recovered sample state") {
    val base = Files.createTempDirectory("outstream").toString
    val (src, ckpt, out) = (s"$base/src", s"$base/ckpt", s"$base/flags")
    def j(sym: String, pc: Long, ts: Long, eid: Long): String =
      s"""{"symbol":"$sym","price_c":$pc,"ts_ms":$ts,"event_id":$eid}"""
    // batch 1: 40 tame prices (median 100, small MAD), no flags expected
    val b1 = (1L to 40L).map(i => j("S", 95 + i % 11, 1000 + i, i))
    Files.createDirectories(Paths.get(src))
    Files.write(Paths.get(src, "b1.json"), b1.mkString("\n").getBytes)
    val schema = "symbol string, price_c long, ts_ms long, event_id long"
    def run(): Unit = {
      val q = OutlierStream.detect(
          spark.readStream.schema(schema).json(src).toDF(),
          k = 4096, warmup = 32)
        .writeStream
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .foreachBatch {
          (b: org.apache.spark.sql.Dataset[OutlierStream.Flag], _: Long) =>
            b.write.mode("append").parquet(out)
            ()
        }
        .start()
      q.processAllAvailable(); q.stop()
    }
    run()
    // batch 2 after restart: one wild price among tame ones
    val b2 = Seq(j("S", 100, 2000, 50), j("S", 5000, 2001, 51),
      j("S", 101, 2002, 52))
    Files.write(Paths.get(src, "b2.json"), b2.mkString("\n").getBytes)
    run()
    val flags = spark.read.parquet(out).collect()
      .map(r => r.getAs[Long]("event_id")).toSet
    assert(flags.contains(51L),
      s"planted outlier not flagged from recovered state: $flags")
    assert(!flags.contains(50L) && !flags.contains(52L),
      s"tame prices flagged: $flags")
  }
}
