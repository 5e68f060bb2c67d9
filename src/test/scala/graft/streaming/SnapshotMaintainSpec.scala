package graft.streaming

import graft.SparkSpec
import java.nio.file.{Files, Paths}

/** Streaming snapshot maintenance: latest-wins state under duplicates,
  * replay, out-of-order delivery, and checkpointed restart. */
class SnapshotMaintainSpec extends SparkSpec {

  import spark.implicits._

  private def ev(uid: Long, et: String, v: Double, ts: Long, eid: Long) =
    (uid, et, v, ts, eid)

  private def df(rows: Seq[(Long, String, Double, Long, Long)]) =
    rows.toDF("user_id", "event_type", "value", "ts_ms", "event_id")

  test("latest-wins state: duplicates collapse, replay is a no-op, " +
    "late events never regress state") {
    val store = Files.createTempDirectory("snap").toString + "/store"

    // batch 1: two keys; key 1's event delivered twice verbatim
    val b1 = df(Seq(
      ev(1, "click", 1.0, 100, 10), ev(1, "click", 1.0, 100, 10),
      ev(1, "view", 2.0, 200, 11), ev(2, "signup", 5.0, 150, 12)))
    assert(SnapshotMaintain.mergeBatch(spark, b1, store) == 2, "2 keys created")
    val s1 = spark.read.parquet(store)
    assert(s1.count() == 2)
    val k1 = s1.filter("user_id = 1").head()
    assert(k1.getAs[String]("last_event_type") == "view" &&
      k1.getAs[Long]("last_ts_ms") == 200 && k1.getAs[Long]("n_events") == 2,
      s"key 1 state wrong: $k1")

    // replay batch 1 verbatim: nothing changes (state OR counters)
    assert(SnapshotMaintain.mergeBatch(spark, b1, store) == 0, "replay changed state")
    val s2 = spark.read.parquet(store)
    assert(s2.filter("user_id = 1").head().getAs[Long]("n_events") == 2)

    // late event (older ts) must not regress state but is a fresh batch
    val late = df(Seq(ev(1, "error", 9.0, 50, 5)))
    SnapshotMaintain.mergeBatch(spark, late, store)
    val k1b = spark.read.parquet(store).filter("user_id = 1").head()
    assert(k1b.getAs[String]("last_event_type") == "view" &&
      k1b.getAs[Long]("last_ts_ms") == 200,
      s"late event regressed state: $k1b")

    // genuinely newer event advances state
    assert(SnapshotMaintain.mergeBatch(spark,
      df(Seq(ev(1, "purchase", 7.0, 300, 20))), store) == 1)
    val k1c = spark.read.parquet(store).filter("user_id = 1").head()
    assert(k1c.getAs[String]("last_event_type") == "purchase" &&
      k1c.getAs[Long]("last_ts_ms") == 300)
  }

  test("out-of-order batch split converges to the same state as one batch") {
    val base = Files.createTempDirectory("snap2").toString
    val all = Seq(
      ev(1, "a", 1.0, 100, 1), ev(1, "b", 2.0, 300, 3), ev(1, "c", 3.0, 200, 2),
      ev(2, "x", 4.0, 500, 5), ev(2, "y", 5.0, 400, 4))
    // one-shot reference state
    val oneShot = s"$base/one"
    SnapshotMaintain.mergeBatch(spark, df(all), oneShot)
    // reversed two-batch delivery (newest first, then older)
    val split = s"$base/split"
    SnapshotMaintain.mergeBatch(spark, df(all.drop(2)), split)
    SnapshotMaintain.mergeBatch(spark, df(all.take(2)), split)
    val a = spark.read.parquet(oneShot)
      .select("user_id", "last_event_type", "last_value", "last_ts_ms", "last_event_id")
    val b = spark.read.parquet(split)
      .select("user_id", "last_event_type", "last_value", "last_ts_ms", "last_event_id")
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      "state depends on delivery order")
  }

  test("randomized trials: any batch split + order + duplication " +
    "converges to the one-shot state (seeded generators)") {
    val rnd = new scala.util.Random(42)
    val base = Files.createTempDirectory("snapprop").toString
    for (trial <- 0 until 4) {
      val events = (0 until 20 + rnd.nextInt(15)).map { i =>
        ev(rnd.nextInt(5).toLong, s"t${rnd.nextInt(4)}",
          rnd.nextInt(100) / 10.0, 100L + rnd.nextInt(50), 1000L + i)
      }
      val oneShot = s"$base/one$trial"
      SnapshotMaintain.mergeBatch(spark, df(events), oneShot)
      // shuffled delivery in 1-4 batches, one random batch replayed
      val shuffled = rnd.shuffle(events)
      val nBatches = 1 + rnd.nextInt(3)
      val batches = shuffled.grouped(
        math.max(1, shuffled.size / nBatches)).toSeq
      val split = s"$base/split$trial"
      batches.foreach(b => SnapshotMaintain.mergeBatch(spark, df(b), split))
      SnapshotMaintain.mergeBatch(spark,
        df(batches(rnd.nextInt(batches.size))), split) // replay one
      val cols = Seq("user_id", "last_event_type", "last_value",
        "last_ts_ms", "last_event_id")
      val a = spark.read.parquet(oneShot).select(cols.head, cols.tail: _*)
      val b = spark.read.parquet(split).select(cols.head, cols.tail: _*)
      assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
        s"trial $trial: state depends on delivery (events=$events, batches=$batches)")
    }
  }

  test("bucketed store: a batch rewrites ONLY buckets holding touched " +
    "keys — untouched buckets' files stay byte-identical") {
    import org.apache.spark.sql.functions.{hash, lit, pmod}
    val store = Files.createTempDirectory("snapb").toString + "/store"
    val B = 16
    // seed: enough keys to populate several buckets
    val seed = (1L to 12L).map(u => ev(u, "seed", u.toDouble, 100, u))
    assert(SnapshotMaintain.mergeBatch(spark, df(seed), store, B) == 12)
    val dirs = Files.list(Paths.get(store)).iterator()
    var bucketDirs = List.empty[String]
    while (dirs.hasNext) {
      val d = dirs.next().getFileName.toString
      if (d.startsWith("bucket=")) bucketDirs ::= d
    }
    assert(bucketDirs.size >= 3, s"want >=3 buckets, got $bucketDirs")

    def fileBytes(): Map[String, Seq[Byte]] = {
      val out = scala.collection.mutable.Map.empty[String, Seq[Byte]]
      val it = Files.walk(Paths.get(store)).iterator()
      while (it.hasNext) {
        val p = it.next()
        val rel = Paths.get(store).relativize(p).toString
        if (rel.contains("bucket=") && Files.isRegularFile(p))
          out(rel) = Files.readAllBytes(p).toSeq
      }
      out.toMap
    }
    val before = fileBytes()

    // touch ONLY user 1; find its bucket the way the store computes it
    val b1 = spark.range(1).select(pmod(hash(lit(1L)), lit(B))).head().getInt(0)
    assert(SnapshotMaintain.mergeBatch(spark,
      df(Seq(ev(1, "upd", 9.0, 900, 99))), store, B) == 1)
    val after = fileBytes()

    val untouchedBefore = before.filterNot(_._1.startsWith(s"bucket=$b1/"))
    val untouchedAfter = after.filterNot(_._1.startsWith(s"bucket=$b1/"))
    assert(untouchedBefore == untouchedAfter,
      "untouched buckets were rewritten — dynamic overwrite not confined " +
        s"to bucket=$b1")
    assert(before.keySet.filter(_.startsWith(s"bucket=$b1/")) !=
      after.keySet.filter(_.startsWith(s"bucket=$b1/")) ||
      before(before.keySet.find(_.startsWith(s"bucket=$b1/")).get) !=
      after(after.keySet.find(_.startsWith(s"bucket=$b1/")).get),
      "touched bucket did not change")
    // and the state is right: pruned-merge did not lose untouched keys
    val s = SnapshotMaintain.snapshot(spark, store)
    assert(s.count() == 12)
    assert(s.filter("user_id = 1").head().getAs[String]("last_event_type") == "upd")
    assert(s.filter("user_id = 7").head().getAs[String]("last_event_type") == "seed")
  }

  test("the store's bucket marker governs pruning: a caller passing a " +
    "different numBuckets cannot split keys across layouts") {
    val store = Files.createTempDirectory("snapbm").toString + "/store"
    // created at B=8; the marker rides with the store
    assert(SnapshotMaintain.mergeBatch(spark,
      df((1L to 10L).map(u => ev(u, "seed", u.toDouble, 100, u))), store, 8) == 10)
    assert(Files.exists(Paths.get(store, "_graft_buckets")))
    // later calls pass the DEFAULT (64): without the marker the delta
    // would hash into pmod(hash, 64) partitions, the merge would never
    // read user 1's pmod(hash, 8) bucket, and the store would carry the
    // key twice — once per layout
    assert(SnapshotMaintain.mergeBatch(spark,
      df(Seq(ev(1, "upd", 9.0, 900, 99))), store) == 1)
    val s = SnapshotMaintain.snapshot(spark, store)
    assert(s.count() == 10, "key duplicated across bucket layouts")
    assert(s.filter("user_id = 1").count() == 1)
    assert(s.filter("user_id = 1").head().getAs[String]("last_event_type") == "upd")
    // and the layout really is still the creation-time one
    val dirs = Files.list(Paths.get(store)).iterator()
    var maxBucket = -1
    while (dirs.hasNext) {
      val d = dirs.next().getFileName.toString
      if (d.startsWith("bucket="))
        maxBucket = math.max(maxBucket, d.stripPrefix("bucket=").toInt)
    }
    assert(maxBucket < 8, s"rows landed outside the B=8 layout: bucket=$maxBucket")
  }

  test("a pre-bucketing flat store is refused with a migration pointer; " +
    "migrateStore converts it losslessly and merging resumes") {
    val store = Files.createTempDirectory("snapmig").toString + "/store"
    // fabricate the legacy layout: the merged state written flat
    val legacy = Seq(
      (1L, "view", 2.0, 200L, 11L, 2L),
      (2L, "signup", 5.0, 150L, 12L, 1L))
      .toDF("user_id", "last_event_type", "last_value", "last_ts_ms",
        "last_event_id", "n_events")
    legacy.write.parquet(store)
    val ex = intercept[IllegalArgumentException] {
      SnapshotMaintain.mergeBatch(spark,
        df(Seq(ev(1, "purchase", 7.0, 300, 20))), store)
    }
    assert(ex.getMessage.contains("migrateStore"), s"unhelpful error: $ex")
    SnapshotMaintain.migrateStore(spark, store)
    SnapshotMaintain.migrateStore(spark, store) // idempotent on bucketed
    val migrated = SnapshotMaintain.snapshot(spark, store)
    assert(migrated.count() == 2)
    assert(migrated.filter("user_id = 1").head()
      .getAs[Long]("n_events") == 2, "migration altered state")
    // merging now works and preserves the migrated counters
    assert(SnapshotMaintain.mergeBatch(spark,
      df(Seq(ev(1, "purchase", 7.0, 300, 20))), store) == 1)
    val k1 = SnapshotMaintain.snapshot(spark, store).filter("user_id = 1").head()
    assert(k1.getAs[String]("last_event_type") == "purchase" &&
      k1.getAs[Long]("n_events") == 3, s"post-migration merge wrong: $k1")
  }

  test("resizeStore rewrites the layout to a new modulus losslessly; " +
    "subsequent merges prune against the NEW marker") {
    val store = Files.createTempDirectory("snaprs").toString + "/store"
    assert(SnapshotMaintain.mergeBatch(spark,
      df((1L to 12L).map(u => ev(u, "seed", u.toDouble, 100, u))), store, 8) == 12)
    val before = SnapshotMaintain.snapshot(spark, store)
      .orderBy("user_id").collect().toSeq
    SnapshotMaintain.resizeStore(spark, store, 32)
    SnapshotMaintain.resizeStore(spark, store, 32) // idempotent at target
    assert(new String(Files.readAllBytes(
      Paths.get(store, "_graft_buckets")), "UTF-8").trim == "32",
      "marker not updated to the new modulus")
    val after = SnapshotMaintain.snapshot(spark, store)
      .orderBy("user_id").collect().toSeq
    assert(before == after, "resize altered logical state")
    // rows really live in the new layout (pmod(hash,32) can exceed 7)
    val dirs = Files.list(Paths.get(store)).iterator()
    var maxBucket = -1
    while (dirs.hasNext) {
      val d = dirs.next().getFileName.toString
      if (d.startsWith("bucket="))
        maxBucket = math.max(maxBucket, d.stripPrefix("bucket=").toInt)
    }
    assert(maxBucket >= 8, s"layout still at the old modulus: max=$maxBucket")
    // a merge after the resize finds keys under the new pruning — no
    // duplicate rows, state advances
    assert(SnapshotMaintain.mergeBatch(spark,
      df(Seq(ev(1, "upd", 9.0, 900, 99))), store) == 1)
    val s = SnapshotMaintain.snapshot(spark, store)
    assert(s.count() == 12, "key duplicated across bucket layouts after resize")
    assert(s.filter("user_id = 1").head().getAs[String]("last_event_type") == "upd")
  }

  test("an interrupted resize swap (live gone, stage present) self-heals " +
    "on the next mergeBatch — the stream recovers the store") {
    import org.apache.hadoop.fs.Path
    val store = Files.createTempDirectory("snaprx").toString + "/store"
    assert(SnapshotMaintain.mergeBatch(spark,
      df((1L to 6L).map(u => ev(u, "seed", u.toDouble, 100, u))), store, 8) == 6)
    // simulate the crash window: stage fully written, live deleted,
    // rename never ran
    val fs = new Path(store).getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.rename(new Path(store), new Path(s"$store.resize"))
    assert(!fs.exists(new Path(store)))
    // next batch resumes the swap instead of creating an empty store
    assert(SnapshotMaintain.mergeBatch(spark,
      df(Seq(ev(1, "upd", 9.0, 900, 99))), store) == 1)
    val s = SnapshotMaintain.snapshot(spark, store)
    assert(s.count() == 6, s"swap not resumed: ${s.count()} keys")
    assert(s.filter("user_id = 3").head().getAs[String]("last_event_type") == "seed")
  }

  test("streaming maintain: two file batches + checkpointed restart") {
    val base = Files.createTempDirectory("snap3").toString
    val (src, store, ckpt) = (s"$base/src", s"$base/store", s"$base/ckpt")
    def j(uid: Long, et: String, v: Double, ts: Long, eid: Long): String =
      s"""{"user_id":$uid,"event_type":"$et","value":$v,"ts_ms":$ts,"event_id":$eid}"""
    def write(name: String, rows: Seq[String]): Unit = {
      Files.createDirectories(Paths.get(src))
      Files.write(Paths.get(src, name), rows.mkString("\n").getBytes("UTF-8"))
    }

    write("b1.json", Seq(j(1, "click", 1.0, 100, 1), j(2, "view", 2.0, 200, 2)))
    val q1 = SnapshotMaintain.maintain(spark, src, store, ckpt).start()
    q1.processAllAvailable(); q1.stop()
    assert(spark.read.parquet(store).count() == 2)

    // second file lands; RESTART from the checkpoint (crash-restart path)
    write("b2.json", Seq(j(1, "purchase", 9.0, 900, 9), j(3, "signup", 3.0, 300, 3)))
    val q2 = SnapshotMaintain.maintain(spark, src, store, ckpt).start()
    q2.processAllAvailable(); q2.stop()

    val s = spark.read.parquet(store)
    assert(s.count() == 3, s"expected 3 keys, got ${s.count()}")
    val k1 = s.filter("user_id = 1").head()
    assert(k1.getAs[String]("last_event_type") == "purchase" &&
      k1.getAs[Long]("last_ts_ms") == 900 && k1.getAs[Long]("n_events") == 2,
      s"restart lost or double-applied an update: $k1")
  }

  test("deleteKeys: forgets only the given keys, removes emptied bucket " +
    "dirs, leaves untouched buckets byte-identical, and a later event " +
    "re-inserts fresh state") {
    val store = Files.createTempDirectory("snapdel").toString + "/store"
    val b1 = df(Seq(
      ev(1, "click", 1.0, 100, 1), ev(2, "view", 2.0, 200, 2),
      ev(3, "signup", 3.0, 300, 3)))
    SnapshotMaintain.mergeBatch(spark, b1, store)
    import scala.jdk.CollectionConverters._
    def files(): Map[String, Long] =
      Files.walk(Paths.get(store)).iterator().asScala
        .filter(_.toString.endsWith(".parquet"))
        .map(p => p.toString -> Files.getLastModifiedTime(p).toMillis).toMap
    val before = files()
    val b2bucket = spark.range(1).selectExpr(
      "pmod(hash(CAST(2 AS BIGINT)), 64) b").head().getInt(0)
    assert(SnapshotMaintain.deleteKeys(spark, store, Seq(2L)) == 1L)
    val s1 = SnapshotMaintain.snapshot(spark, store)
    assert(s1.count() == 2 && s1.filter("user_id = 2").isEmpty,
      "key 2 must be forgotten, others kept")
    // key 2 was alone in its bucket -> the partition dir must be GONE
    assert(!Files.exists(Paths.get(store, s"bucket=$b2bucket")),
      "an emptied bucket directory survived the delete")
    // buckets not holding key 2 were never rewritten
    val after = files()
    before.filterNot(_._1.contains(s"bucket=$b2bucket")).foreach {
      case (path, t) => assert(after.get(path).contains(t),
        s"untouched bucket file rewritten: $path")
    }
    // idempotent
    assert(SnapshotMaintain.deleteKeys(spark, store, Seq(2L)) == 0L)
    // deletion forgets history, not the future: a fresh event re-inserts
    assert(SnapshotMaintain.mergeBatch(spark,
      df(Seq(ev(2, "return", 9.0, 900, 9))), store) == 1)
    val k2 = SnapshotMaintain.snapshot(spark, store).filter("user_id = 2").head()
    assert(k2.getAs[String]("last_event_type") == "return" &&
      k2.getAs[Long]("n_events") == 1, s"re-inserted state wrong: $k2")
  }
}
