package graft.streaming

import graft.SparkSpec
import graft.operators.TextOps
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._

/** Streaming corpus governance: batchId-gated per-source counters and
  * their bit parity with the batch report's additive columns. */
class CorpusStatsSpec extends SparkSpec {

  import spark.implicits._

  private def docs(rows: (Long, String, String, String)*) =
    rows.toDF("doc_id", "text", "lang", "source")

  private def state(store: String): Map[String, (Long, Long, Long, Long, Long)] =
    CorpusStats.stats(spark, store).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))))
      .toMap

  test("ingesting the corpus in three batches reproduces corpus_report's " +
    "additive columns bit-exactly (batch ≡ stream by construction)") {
    val store = Files.createTempDirectory("cstats").toString + "/stats"
    val corpus = graft.Tables.documents(spark, sf())
      .select("doc_id", "text", "lang", "source")
    // three disjoint batches by doc_id range — arbitrary cut points
    val cuts = Seq((Long.MinValue, 150L), (150L, 320L), (320L, Long.MaxValue))
    cuts.zipWithIndex.foreach { case ((lo, hi), i) =>
      val b = corpus.filter(col("doc_id") >= lo && col("doc_id") < hi)
      assert(CorpusStats.mergeBatch(spark, b, store, i.toLong))
    }
    val got = state(store)
    val expect = TextOps.corpusReport(spark, sf()).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(5), r.getLong(6), r.getLong(7))))
      .toMap
    assert(got.keySet == expect.keySet)
    expect.foreach { case (src, e) =>
      assert(got(src) == e, s"source $src: stream $got(src) vs batch $e")
    }
  }

  test("a replayed batch id is absorbed (integer sums never double-add); " +
    "a new id applies") {
    val store = Files.createTempDirectory("cstats2").toString + "/stats"
    val b0 = docs((1, "a b", "en", "s1"), (2, "c", "de", "s2"))
    assert(CorpusStats.mergeBatch(spark, b0, store, 0))
    val after0 = state(store)
    assert(after0("s1")._1 == 1L && after0("s1")._2 == 2L)
    assert(!CorpusStats.mergeBatch(spark, b0, store, 0))
    assert(state(store) == after0, "replayed batch double-counted")
    assert(CorpusStats.mergeBatch(spark,
      docs((3, "d e f", "fr", "s1")), store, 1))
    // "d e f": quality = 0.015 + 0.3 + 0.2 = 0.515 >= 0.5 -> counts
    val after1 = state(store)
    assert(after1("s1") == ((2L, 5L, 1L, 0L, 2L)), s"got ${after1("s1")}")
  }

  test("an interrupted swap self-heals; a truncated first-write tmp is " +
    "discarded and the batch re-applies") {
    import org.apache.hadoop.fs.Path
    val store = Files.createTempDirectory("cstats3").toString + "/stats"
    CorpusStats.mergeBatch(spark, docs((1, "x y", "en", "s")), store, 0)
    val f = new Path(store).getFileSystem(spark.sparkContext.hadoopConfiguration)
    f.rename(new Path(store), new Path(s"$store.tmp"))
    assert(state(store)("s")._2 == 2L) // adopts tmp
    assert(!CorpusStats.mergeBatch(spark, docs((1, "x y", "en", "s")), store, 0),
      "gate must survive the adopted swap")

    // every first-write truncation class must be DISCARDED, not adopted:
    // adopting a partial state AND its batchId would make the checkpoint
    // replay a no-op — permanent counter loss
    val truncations = Seq(
      "header only" -> "corpus-stats-v2\t2\n",
      "line-boundary cut (header claims 2 rows, 1 present)" ->
        "corpus-stats-v2\t2\n0\na\t1\t2\t0\t0\t1\ten\n",
      "mid-row cut" -> "corpus-stats-v2\t1\n0\ns\t1\t",
      "bad header" -> "corpus-stats\n0\n")
    truncations.foreach { case (label, bytes) =>
      val st = Files.createTempDirectory("cstats4").toString + "/stats"
      Files.createDirectories(Paths.get(st).getParent)
      Files.write(Paths.get(s"$st.tmp"), bytes.getBytes("UTF-8"))
      assert(state(st).isEmpty, s"$label: truncated first tmp must be discarded")
      assert(CorpusStats.mergeBatch(spark, docs((1, "x", "en", "s")), st, 0),
        s"$label: the interrupted batch must re-apply")
      assert(state(st)("s")._1 == 1L)
    }
  }

  test("an empty-string lang survives the state round-trip (the langs " +
    "field carries its own count)") {
    val store = Files.createTempDirectory("cstats6").toString + "/stats"
    CorpusStats.mergeBatch(spark, docs((1, "x", "", "s")), store, 0)
    assert(state(store)("s")._5 == 1L, "empty lang lost on round-trip")
    CorpusStats.mergeBatch(spark, docs((2, "y", "en", "s")), store, 1)
    assert(state(store)("s")._5 == 2L)
  }

  test("reserved characters in source/lang values round-trip escaped — " +
    "the store never rejects a file it wrote itself") {
    val store = Files.createTempDirectory("cstats7").toString + "/stats"
    CorpusStats.mergeBatch(spark,
      docs((1, "x", "en,US", "s\tweird"), (2, "y", "de%0a", "s\tweird")),
      store, 0)
    // re-read after write, then merge again: both operations parse the
    // file the previous write produced ("x"/"y" score 0.505 on quality)
    assert(state(store)("s\tweird") == ((2L, 2L, 2L, 0L, 2L)))
    assert(CorpusStats.mergeBatch(spark,
      docs((3, "z", "en,US", "s\tweird")), store, 1))
    assert(state(store)("s\tweird")._1 == 3L)
    assert(state(store)("s\tweird")._5 == 2L, "comma-lang must stay ONE lang")
  }

  test("an unknown state version fails loudly instead of reading as " +
    "corruption or external damage") {
    val store = Files.createTempDirectory("cstats8").toString + "/stats"
    Files.createDirectories(Paths.get(store).getParent)
    Files.write(Paths.get(store),
      "corpus-stats-v1\n0\ns\t1\t2\t0\t0\ten\n".getBytes("UTF-8"))
    val ex = intercept[IllegalStateException] {
      CorpusStats.stats(spark, store).collect()
    }
    assert(ex.getMessage.contains("corpus-stats-v1")
      && ex.getMessage.contains("migrate"), ex.getMessage)
  }

  test("streaming maintain: file batches + checkpointed restart never " +
    "double-counts") {
    val base = Files.createTempDirectory("cstats5").toString
    val (src, store, ckpt) = (s"$base/src", s"$base/stats", s"$base/ckpt")
    def put(name: String, rows: String*): Unit = {
      Files.createDirectories(Paths.get(src))
      Files.write(Paths.get(src, name), rows.mkString("\n").getBytes("UTF-8"))
    }
    put("b1.json",
      """{"doc_id":1,"text":"a b a","lang":"en","source":"s1"}""",
      """{"doc_id":2,"text":"b","lang":"de","source":"s1"}""")
    val q1 = CorpusStats.maintain(spark, src, store, ckpt).start()
    q1.processAllAvailable(); q1.stop()
    // "a b a" scores 0.448 (fails), "b" scores 0.505 (passes)
    assert(state(store)("s1") == ((2L, 4L, 1L, 0L, 2L)))

    put("b2.json", """{"doc_id":3,"text":"b c","lang":"en","source":"s2"}""")
    val q2 = CorpusStats.maintain(spark, src, store, ckpt).start()
    q2.processAllAvailable(); q2.stop()
    assert(state(store) == Map(
      "s1" -> ((2L, 4L, 1L, 0L, 2L)), "s2" -> ((1L, 2L, 1L, 0L, 1L))),
      "restart lost or double-applied a batch")
  }
}
