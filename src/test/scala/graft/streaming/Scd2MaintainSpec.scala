package graft.streaming

import graft.SparkSpec
import graft.operators.CdcRoute
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._

/** Streaming SCD2 maintenance: the history store converges to the batch
  * gaps-and-islands fold under batch splits, replay, out-of-order
  * delivery, a crash between the log append and the history write, and
  * checkpointed restart; untouched buckets stay byte-identical. */
class Scd2MaintainSpec extends SparkSpec {

  import spark.implicits._

  private def ev(uid: Long, et: String, v: Double, ts: Long, eid: Long) =
    (uid, et, v, ts, eid)

  private def df(rows: Seq[(Long, String, Double, Long, Long)]) =
    rows.toDF("user_id", "event_type", "value", "ts_ms", "event_id")

  private type HistRow = (Long, Long, String, Long, Option[Long], Long, Double, Boolean)

  private def histSet(store: String): Set[HistRow] =
    Scd2Maintain.history(spark, store)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getLong(4)), r.getLong(5),
        r.getDouble(6), r.getBoolean(7)))
      .toSet

  private def refSet(rows: Seq[(Long, String, Double, Long, Long)]): Set[HistRow] =
    CdcRoute.scd2FromChanges(df(rows))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getLong(4)), r.getLong(5),
        r.getDouble(6), r.getBoolean(7)))
      .toSet

  private val all = Seq(
    ev(1, "a", 1.0, 100, 1), ev(1, "a", 1.5, 200, 2), ev(1, "b", 2.0, 300, 3),
    ev(1, "a", 2.5, 400, 4), ev(2, "x", 4.0, 500, 5), ev(2, "x", 4.5, 600, 6),
    ev(3, "q", 7.0, 150, 7), ev(3, "r", 8.0, 250, 8), ev(3, "q", 9.0, 350, 9))

  test("sequential batches converge to the one-shot islands fold; " +
    "replay of a batch is a no-op on log and history") {
    val store = Files.createTempDirectory("scd2a").toString + "/store"
    val (b1, b2, b3) = (all.take(3), all.slice(3, 6), all.drop(6))
    assert(Scd2Maintain.mergeBatch(spark, df(b1), store) == 3)
    assert(Scd2Maintain.mergeBatch(spark, df(b2), store) == 3)
    // replay batch 2 verbatim: zero applied, history unchanged
    val before = histSet(store)
    assert(Scd2Maintain.mergeBatch(spark, df(b2), store) == 0,
      "replayed batch must apply nothing")
    assert(histSet(store) == before, "replay changed the history")
    assert(Scd2Maintain.mergeBatch(spark, df(b3), store) == 3)
    assert(histSet(store) == refSet(all),
      "batched ingest diverged from the one-shot fold")
    assert(Scd2Maintain.changeLog(spark, store).count() == all.size,
      "log must hold exactly the event set")
  }

  test("out-of-order cross-batch delivery converges — a late event " +
    "SPLITS an already-closed run correctly") {
    val store = Files.createTempDirectory("scd2b").toString + "/store"
    // key 1's run-splitting event (ts=300, state b) arrives LAST, after
    // versions around it were already materialized as one 'a' run
    val late = all(2)
    val rest = all.patch(2, Nil, 1)
    val rnd = new scala.util.Random(7)
    val shuffled = rnd.shuffle(rest)
    Scd2Maintain.mergeBatch(spark, df(shuffled.take(4)), store)
    Scd2Maintain.mergeBatch(spark, df(shuffled.drop(4)), store)
    Scd2Maintain.mergeBatch(spark, df(Seq(late)), store)
    assert(histSet(store) == refSet(all),
      "out-of-order ingest diverged from the one-shot fold")
    // key 1 must now have 3 versions: a(100-300), b(300-400), a(400-)
    val k1 = Scd2Maintain.history(spark, store)
      .filter("user_id = 1").orderBy("version").collect()
    assert(k1.map(_.getString(2)).toSeq == Seq("a", "b", "a"),
      s"late event did not split the run: ${k1.mkString("; ")}")
  }

  test("a crash between the log append and the history write self-heals " +
    "when the micro-batch replays") {
    val base = Files.createTempDirectory("scd2c").toString
    val (clean, crashed) = (s"$base/clean", s"$base/crashed")
    val (b1, b2) = (all.take(5), all.drop(5))
    Scd2Maintain.mergeBatch(spark, df(b1), clean)
    Scd2Maintain.mergeBatch(spark, df(b2), clean)
    Scd2Maintain.mergeBatch(spark, df(b1), crashed)
    intercept[RuntimeException] {
      Scd2Maintain.mergeBatch(spark, df(b2), crashed,
        afterLogAppend = () => throw new RuntimeException("crash"))
    }
    // log already complete, history stale for b2's buckets; the replay
    // (Structured Streaming re-runs the failed micro-batch) repairs it
    // without double-appending
    assert(Scd2Maintain.mergeBatch(spark, df(b2), crashed) == 0,
      "replay after crash must not re-append")
    assert(histSet(crashed) == histSet(clean),
      "crash+replay diverged from the crash-free run")
    assert(Scd2Maintain.changeLog(spark, crashed).count() == all.size)
  }

  test("untouched buckets: neither log nor history files are rewritten") {
    val store = Files.createTempDirectory("scd2d").toString + "/store"
    Scd2Maintain.mergeBatch(spark, df(all), store)
    def fileState(sub: String): Map[String, Long] = {
      val root = Paths.get(store, sub)
      import scala.jdk.CollectionConverters._
      Files.walk(root).iterator().asScala
        .filter(p => p.toString.endsWith(".parquet"))
        .map(p => p.toString -> Files.getLastModifiedTime(p).toMillis)
        .toMap
    }
    val (log0, hist0) = (fileState("log"), fileState("history"))
    // touch ONLY key 1's bucket
    Scd2Maintain.mergeBatch(spark, df(Seq(ev(1, "z", 9.9, 900, 99))), store)
    val b1 = spark.range(1).selectExpr("pmod(hash(CAST(1 AS BIGINT)), 64) b")
      .head().getInt(0)
    val (log1, hist1) = (fileState("log"), fileState("history"))
    val untouchedLog0 = log0.filter(!_._1.contains(s"bucket=$b1"))
    assert(untouchedLog0.forall { case (p, t) => log1.get(p).contains(t) },
      "an untouched bucket's log file was rewritten or removed")
    val untouchedHist0 = hist0.filter(!_._1.contains(s"bucket=$b1"))
    assert(untouchedHist0.forall { case (p, t) => hist1.get(p).contains(t) },
      "an untouched bucket's history file was rewritten or removed")
    // and key 1's history advanced
    val k1 = Scd2Maintain.history(spark, store).filter("user_id = 1")
      .orderBy("version").collect()
    assert(k1.last.getString(2) == "z" && k1.last.getBoolean(7))
  }

  test("compactLog: content identical, bounded file count; interrupted " +
    "swap resumes on the next merge") {
    val store = Files.createTempDirectory("scd2e").toString + "/store"
    all.grouped(2).foreach(b => Scd2Maintain.mergeBatch(spark, df(b), store))
    val logBefore = Scd2Maintain.changeLog(spark, store).collect().toSet
    val histBefore = histSet(store)
    Scd2Maintain.compactLog(spark, store)
    assert(Scd2Maintain.changeLog(spark, store).collect().toSet == logBefore,
      "compaction changed the log content")
    import scala.jdk.CollectionConverters._
    val perBucket = Files.walk(Paths.get(store, "log")).iterator().asScala
      .filter(_.toString.endsWith(".parquet")).toSeq
      .groupBy(_.getParent.toString).values.map(_.size)
    assert(perBucket.forall(_ == 1),
      s"compaction must leave one file per bucket, got $perBucket")
    // interrupted swap: live log deleted, stage present → next merge heals
    val fs = new org.apache.hadoop.fs.Path(store)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.rename(new org.apache.hadoop.fs.Path(s"$store/log"),
      new org.apache.hadoop.fs.Path(s"$store/log.compact"))
    assert(Scd2Maintain.mergeBatch(spark, df(Seq(ev(4, "n", 1.0, 50, 50))),
      store) == 1)
    assert(Scd2Maintain.changeLog(spark, store).count() == all.size + 1,
      "interrupted compaction swap was not resumed")
    assert(histSet(store) == refSet(all :+ ev(4, "n", 1.0, 50, 50)))
    assert(histBefore.subsetOf(histSet(store)))
  }

  test("forgetKeys: purges log AND history for the keys, keeps every " +
    "other key's history bit-identical, and a post-forget event starts " +
    "a fresh version 1") {
    val store = Files.createTempDirectory("scd2g").toString + "/store"
    Scd2Maintain.mergeBatch(spark, df(all), store)
    assert(Scd2Maintain.forgetKeys(spark, store, Seq(1L)) == 4L,
      "key 1 has 4 logged events")
    assert(Scd2Maintain.changeLog(spark, store)
      .filter("user_id = 1").isEmpty, "key 1 events survive in the log")
    assert(Scd2Maintain.history(spark, store)
      .filter("user_id = 1").isEmpty, "key 1 rows survive in the history")
    assert(histSet(store) == refSet(all.filterNot(_._1 == 1L)),
      "other keys' history changed under the forget")
    assert(Scd2Maintain.forgetKeys(spark, store, Seq(1L)) == 0L, "not idempotent")
    // the future is not tombstoned: a new event opens version 1 afresh
    Scd2Maintain.mergeBatch(spark, df(Seq(ev(1, "n", 5.0, 999, 99))), store)
    val k1 = Scd2Maintain.history(spark, store).filter("user_id = 1").collect()
    assert(k1.length == 1 && k1.head.getLong(1) == 1L &&
      k1.head.getString(2) == "n" && k1.head.getBoolean(7),
      s"post-forget state must be a fresh version 1: ${k1.mkString(";")}")
  }

  test("expireVersions: pre-horizon-closed versions go, every version " +
    "active at the horizon survives, current state untouched, idempotent") {
    val store = Files.createTempDirectory("scd2h").toString + "/store"
    Scd2Maintain.mergeBatch(spark, df(all), store)
    val curBefore = Scd2Maintain.history(spark, store)
      .filter("is_current").collect()
      .map(r => (r.getLong(0), r.getString(2), r.getDouble(6))).toSet
    // horizon 350: key1 drops a(100-300) [2 events], key3 drops
    // q(150-250) and r(250-350, valid_to==horizon → closed before it
    // is NOT strictly after → expired) [2 events], key2 keeps all
    assert(Scd2Maintain.expireVersions(spark, store, 350L) == 4L)
    val h = Scd2Maintain.history(spark, store)
    // current states identical after retention
    val curAfter = h.filter("is_current").collect()
      .map(r => (r.getLong(0), r.getString(2), r.getDouble(6))).toSet
    assert(curAfter == curBefore, "retention changed a current state")
    // no surviving version both closed and entirely before the horizon
    assert(h.filter(col("valid_to_ms").isNotNull &&
      col("valid_to_ms") <= 350L).isEmpty,
      "an expired version survived")
    // versions renumber densely from 1 over the retained window
    val perKey = h.groupBy("user_id").agg(
      min("version").as("lo"), max("version").as("hi"),
      org.apache.spark.sql.functions.count(lit(1)).as("n"))
    assert(perKey.filter(col("lo") =!= 1 || col("hi") =!= col("n")).isEmpty)
    // key1 now starts at the b(300-400) run
    val k1 = h.filter("user_id = 1").orderBy("version").collect()
    assert(k1.map(_.getString(2)).toSeq == Seq("b", "a") &&
      k1.head.getLong(3) == 300L, s"key1 window wrong: ${k1.mkString(";")}")
    // idempotent; and the log shrank consistently with the history
    assert(Scd2Maintain.expireVersions(spark, store, 350L) == 0L)
    assert(Scd2Maintain.changeLog(spark, store).count() == all.size - 4L)
    // a later merge still converges (log is the state, histories derive)
    Scd2Maintain.mergeBatch(spark, df(Seq(ev(1, "c", 9.0, 950, 99))), store)
    val k1b = Scd2Maintain.history(spark, store)
      .filter("user_id = 1").orderBy("version").collect()
    assert(k1b.map(_.getString(2)).toSeq == Seq("b", "a", "c"))
  }

  test("streaming maintain: two file batches + checkpointed restart " +
    "converge to the batch fold") {
    val base = Files.createTempDirectory("scd2f").toString
    val (src, store, ckpt) = (s"$base/src", s"$base/store", s"$base/ckpt")
    def j(e: (Long, String, Double, Long, Long)): String =
      s"""{"user_id":${e._1},"event_type":"${e._2}","value":${e._3},"ts_ms":${e._4},"event_id":${e._5}}"""
    def write(name: String, rows: Seq[(Long, String, Double, Long, Long)]): Unit = {
      Files.createDirectories(Paths.get(src))
      Files.write(Paths.get(src, name), rows.map(j).mkString("\n").getBytes("UTF-8"))
    }
    write("b1.json", all.take(5))
    val q1 = Scd2Maintain.maintain(spark, src, store, ckpt).start()
    q1.processAllAvailable(); q1.stop()
    write("b2.json", all.drop(5))
    val q2 = Scd2Maintain.maintain(spark, src, store, ckpt).start()
    q2.processAllAvailable(); q2.stop()
    assert(histSet(store) == refSet(all),
      "restarted stream diverged from the batch fold")
  }
}
