package graft.streaming

import graft.SparkSpec
import java.nio.file.{Files, Paths}

/** Incremental corpus ingestion: within-batch dedup, cross-batch dedup
  * against the store, replay absorption, and checkpointed streaming. */
class CorpusIngestSpec extends SparkSpec {

  private def doc(id: Long, text: String): String =
    s"""{"doc_id":$id,"text":"$text","lang":"en","source":"s"}"""

  private def write(dir: String, name: String, rows: Seq[String]): Unit = {
    Files.createDirectories(Paths.get(dir))
    Files.write(Paths.get(dir, name), rows.mkString("\n").getBytes("UTF-8"))
  }

  test("merge: within-batch dups collapse, cross-batch dups drop, replay is a no-op") {
    import spark.implicits._
    val store = Files.createTempDirectory("canon").toString + "/store"

    // note doc 1 delivered TWICE verbatim (same doc_id): at-least-once
    // can duplicate a record inside one micro-batch too
    val b1 = Seq((1L, "alpha beta", "en", "s"), (1L, "alpha beta", "en", "s"),
      (2L, "alpha beta", "en", "s"), (3L, "gamma delta", "en", "s"))
      .toDF("doc_id", "text", "lang", "source")
    assert(CorpusIngest.mergeBatch(spark, b1, store) == 2, "2 distinct texts admitted")

    // cross-batch: one known text, one new
    val b2 = Seq((9L, "alpha beta", "en", "s"), (10L, "epsilon zeta", "en", "s"))
      .toDF("doc_id", "text", "lang", "source")
    assert(CorpusIngest.mergeBatch(spark, b2, store) == 1, "only the unseen text admitted")

    // replay batch 1 verbatim (at-least-once upstream): fully absorbed
    assert(CorpusIngest.mergeBatch(spark, b1, store) == 0, "replay must admit nothing")

    val canon = spark.read.parquet(store)
    assert(canon.count() == 3)
    assert(canon.select("fp").distinct().count() == 3, "store must stay unique on fp")
    assert(canon.filter("text = 'alpha beta'").select("doc_id").as[Long].head() == 1L,
      "keeper is the min doc_id")
  }

  test("soak: per-batch cost stays flat as the store grows (the fp " +
    "bloom keeps fresh batches off the store — r7), and a bloom-era " +
    "store still rejects known texts exactly") {
    import spark.implicits._
    val store = Files.createTempDirectory("canon-soak").toString + "/store"
    val nBatches = sys.env.getOrElse("SPARK_GRAFT_SOAK_BATCHES", "10").toInt
    val times = (0 until nBatches).map { b =>
      val docs = (0 until 50)
        .map(i => (b * 100L + i, s"text b$b i$i unique", "en", "s"))
        .toDF("doc_id", "text", "lang", "source")
      val t0 = System.nanoTime()
      assert(CorpusIngest.mergeBatch(spark, docs, store) == 50L)
      (System.nanoTime() - t0) / 1e9
    }
    info(s"per-batch sec: ${times.map(t => f"$t%.2f").mkString(", ")}")
    val first = times.take(3).sorted.apply(1)
    val last = times.takeRight(3).sorted.apply(1)
    assert(last <= first * 3.0 + 0.5,
      s"per-batch cost grew with the store: $first -> $last")
    // exactness through the bloom path: a known text still drops, a
    // bloom-false-positive-shaped fresh one is still admitted
    val probe = Seq((90001L, "text b0 i0 unique", "en", "s"),
      (90002L, "never seen before", "en", "s"))
      .toDF("doc_id", "text", "lang", "source")
    assert(CorpusIngest.mergeBatch(spark, probe, store) == 1L)
  }

  test("BloomSide: the folding WRITE caps the segment set at one past " +
    "CompactAt without losing a key (r8 — the per-batch probe would " +
    "otherwise pay O(#appends) driver reads forever), read stays PURE " +
    "(report faces may hold no write privilege), and buildStrLong is " +
    "bit-exact with stat.bloomFilter on both columns") {
    import org.apache.spark.util.sketch.BloomFilter
    import spark.implicits._
    val dir = Files.createTempDirectory("bloomside").toString + "/s.bloom"
    def seg(k: String): BloomFilter = {
      val bf = BloomFilter.create(BloomSide.Expected, BloomSide.Fpp)
      bf.putString(k); bf
    }
    val keys = (0 until BloomSide.CompactAt + 8).map(i => s"k$i")
    keys.dropRight(1).foreach(k => BloomSide.writeSegment(spark, dir, seg(k)))
    // read is PURE even past CompactAt — probing must never mutate
    assert(BloomSide.read(spark, dir).isDefined)
    assert(BloomSide.segPaths(spark, dir).length == keys.size - 1,
      "read must not fold (report faces are read-only)")
    // the WRITER's folding append crosses the threshold and folds
    BloomSide.writeSegmentFolding(spark, dir, seg(keys.last))
    assert(BloomSide.segPaths(spark, dir).length == 1,
      "the folding write past CompactAt must fold the segments to one")
    val again = BloomSide.read(spark, dir).get
    assert(keys.forall(again.mightContainString),
      "the folded covering segment lost a key")

    // one-pass dual build vs two stat.bloomFilter jobs: the put
    // semantics (putString / putLong) and fixed parameters make the
    // bit arrays ORDER-INDEPENDENT, so equality is exact, not
    // probabilistic
    val df = (0 until 500).map(i => (s"fp$i", 1000L + i)).toDF("fp", "doc_id")
    val (bs, bl) = BloomSide.buildStrLong(df, "fp", "doc_id")
    def bytes(b: BloomFilter): Seq[Byte] = {
      val o = new java.io.ByteArrayOutputStream()
      b.writeTo(o); o.toByteArray.toSeq
    }
    assert(bytes(bs) == bytes(
      df.stat.bloomFilter("fp", BloomSide.Expected, BloomSide.Fpp)),
      "string bloom differs from stat.bloomFilter")
    assert(bytes(bl) == bytes(
      df.stat.bloomFilter("doc_id", BloomSide.Expected, BloomSide.Fpp)),
      "long bloom differs from stat.bloomFilter")
  }

  test("watermark-horizon dedup: duplicates inside the horizon drop via " +
    "bounded state; a key aged out past the watermark is admitted again") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000)
    val in = MemoryStream[(Long, String, java.sql.Timestamp)]
    val stream = in.toDF().toDF("doc_id", "text", "ts")
    val q = CorpusIngest.dedupWithinHorizon(stream, "10 seconds")
      .writeStream.format("memory").queryName("horizon_dedup")
      .outputMode("append").start()
    try {
      // batch 1: doc + same-text dup inside one batch → one survivor
      in.addData((1L, "alpha beta", ts(10)), (2L, "alpha beta", ts(11)))
      q.processAllAvailable()
      // batch 2: another dup, still inside the horizon → dropped by the
      // keyed state (no artifact, no store read)
      in.addData((3L, "alpha beta", ts(12)))
      q.processAllAvailable()
      val mid = spark.table("horizon_dedup")
      assert(mid.filter("text = 'alpha beta'").count() == 1,
        "in-horizon duplicates must collapse to the first arrival")
      // advance the watermark far past the key's expiry (11s + 10s),
      // then resend: the state was EVICTED, so the dup is admitted
      // again — the horizon is the contract, pinned from both sides
      in.addData((4L, "unrelated", ts(60)))
      q.processAllAvailable()
      in.addData((5L, "alpha beta", ts(55)))
      q.processAllAvailable()
      val fin = spark.table("horizon_dedup")
      assert(fin.filter("text = 'alpha beta'").count() == 2,
        "a key aged out past the watermark must be re-admitted")
      assert(fin.filter("text = 'alpha beta'")
        .select("doc_id").as[Long].collect().toSet == Set(1L, 5L))
    } finally q.stop()
  }

  test("streaming ingest: two file batches + checkpoint, store converges") {
    val base = Files.createTempDirectory("ingest").toString
    val (src, store, ckpt) = (s"$base/src", s"$base/store", s"$base/ckpt")

    write(src, "b1.json", Seq(doc(1, "a b c"), doc(2, "a b c"), doc(3, "d e f")))
    val q1 = CorpusIngest.ingest(spark, src, store, ckpt).start()
    q1.processAllAvailable(); q1.stop()
    assert(spark.read.parquet(store).count() == 2)

    // second file lands; restart from the checkpoint (crash-restart path)
    write(src, "b2.json", Seq(doc(4, "d e f"), doc(5, "g h i")))
    val q2 = CorpusIngest.ingest(spark, src, store, ckpt).start()
    q2.processAllAvailable(); q2.stop()

    val canon = spark.read.parquet(store)
    assert(canon.count() == 3, s"expected 3 canonical docs, got ${canon.count()}")
    assert(canon.select("fp").distinct().count() == 3)
  }
}
