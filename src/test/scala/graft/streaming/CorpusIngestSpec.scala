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
