package graft.streaming

import graft.SparkSpec
import graft.operators.CdcRoute
import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The SCD2 maintenance CADENCE (r12 verdict #1): Scd2Probe measured
  * the busy-table cost growth and the two reclamation levers
  * (compactLog for file accretion, expireVersions for retained mass);
  * this spec pins their promotion to a scheduled policy — fire on
  * schedule (fixed and growth modes), store content invariant vs an
  * unmaintained twin (retention off), retention's horizon derived from
  * event time exactly as a manual twin would, crash-at-sweep replay
  * convergence, and the counter lifecycle (reset-after-sweep,
  * torn/legacy re-seed, erasure re-anchor). */
class Scd2CadenceSpec extends SparkSpec {

  import spark.implicits._

  private val Buckets = 4

  /** Deterministic busy-table micro-batches (Scd2Probe's shape, tiny):
    * 6 events over 5 keys per batch, type churn on recurring keys,
    * unique event_ids, monotone event time. */
  private def batchDf(b: Int): DataFrame = {
    val rows = (0 until 6).map { i =>
      val uid = (b.toLong * 7L + i.toLong * 3L) % 5L
      (uid, s"t${(uid + b) % 3}", (b * 100 + i).toDouble,
        b.toLong * 1000L + i, b.toLong * 100000L + i)
    }
    rows.toDF("user_id", "event_type", "value", "ts_ms", "event_id")
  }

  private def rowsOf(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  private def storeState(store: String): (Seq[String], Seq[String]) =
    (rowsOf(Scd2Maintain.changeLog(spark, store)),
      rowsOf(Scd2Maintain.history(spark, store)))

  private def parquetFiles(p: String): Int = {
    val s = Files.walk(java.nio.file.Paths.get(p))
    try {
      val it = s.iterator()
      var n = 0
      while (it.hasNext) if (it.next().toString.endsWith(".parquet")) n += 1
      n
    } finally s.close()
  }

  test("fixed cadence fires every compactEvery applying batches: log " +
    "and history stay bit-identical to an unmaintained twin, the log's " +
    "file count is bounded, and the counter resets after each sweep") {
    val a = Files.createTempDirectory("scd2cad-a").toString + "/store"
    val b = Files.createTempDirectory("scd2cad-b").toString + "/store"
    val policy = Scd2Maintain.MaintainPolicy(compactEvery = 2)
    var swept = List.empty[Int]
    for (i <- 1 to 5) {
      Scd2Maintain.mergeBatch(spark, batchDf(i), a, Buckets,
        policy = policy, afterSweep = () => swept ::= i)
      Scd2Maintain.mergeBatch(spark, batchDf(i), b, Buckets)
    }
    assert(swept.reverse == List(2, 4), s"sweep schedule: ${swept.reverse}")
    assert(storeState(a) == storeState(b),
      "cadence maintenance changed log/history vs the unmaintained twin")
    assert(parquetFiles(s"$a/log") < parquetFiles(s"$b/log"),
      "cadence did not bound the log's file accretion")
    // counter: reset at batch 4's sweep, bumped once by batch 5; base
    // anchored on the log's actual row count at the sweep (4×6 events)
    assert(Scd2Maintain.readMaintainCtr(spark, a) ==
      Scd2Maintain.MaintainCtr(1L, 6L, 24L),
      s"counter: ${Scd2Maintain.readMaintainCtr(spark, a)}")
  }

  test("growth cadence backs off geometrically (fire on each doubling " +
    "of the retained log), anchors its base on the post-sweep row " +
    "count, and a torn/zeroed counter re-seeds from log mass instead " +
    "of firing an early sweep") {
    val a = Files.createTempDirectory("scd2cad-g").toString + "/store"
    val policy = Scd2Maintain.MaintainPolicy(compactGrowth = 1.0)
    var swept = List.empty[Int]
    for (i <- 1 to 8)
      Scd2Maintain.mergeBatch(spark, batchDf(i), a, Buckets,
        policy = policy, afterSweep = () => swept ::= i)
    // 6 events/batch: base 0 → batch 1 fires (seed on a fresh store is
    // 0), base 6 → batch 2 (6 ≥ 6), base 12 → batch 4, base 24 →
    // batch 8, base 48
    assert(swept.reverse == List(1, 2, 4, 8),
      s"geometric schedule violated: ${swept.reverse}")
    assert(Scd2Maintain.readMaintainCtr(spark, a) ==
      Scd2Maintain.MaintainCtr(0L, 0L, 48L),
      s"post-sweep anchor: ${Scd2Maintain.readMaintainCtr(spark, a)}")

    // torn counter (unparseable) reads all-zero; the next applying
    // batch re-seeds the base from the log's true mass (48 + its own
    // 6 applies excluded) — no early sweep on the existing store
    val p = new org.apache.hadoop.fs.Path(s"$a/_maintain_ctr")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write("torn garbage".getBytes("UTF-8")) finally out.close()
    assert(Scd2Maintain.readMaintainCtr(spark, a) ==
      Scd2Maintain.MaintainCtr(0L, 0L, 0L), "torn counter parse")
    Scd2Maintain.mergeBatch(spark, batchDf(9), a, Buckets,
      policy = policy, afterSweep = () => swept ::= 9)
    assert(swept.reverse == List(1, 2, 4, 8),
      "torn counter fired an early sweep on an existing store")
    assert(Scd2Maintain.readMaintainCtr(spark, a) ==
      Scd2Maintain.MaintainCtr(1L, 6L, 48L),
      "seeded base must be the pre-epoch log mass")

    // keyed erasure re-anchors the base on the purged log's count
    val removed = Scd2Maintain.forgetKeys(spark, a, Seq(0L, 1L))
    assert(removed > 0L)
    val afterForget = Scd2Maintain.readMaintainCtr(spark, a)
    assert(afterForget.baseEvents == 54L - removed,
      s"erasure did not re-anchor: $afterForget")
  }

  test("retention policy: each sweep expires versions closed more than " +
    "retainMs before the log's max event time — log and history match " +
    "a twin maintained by MANUAL expireVersions+compactLog calls at " +
    "the same points, and history stays the fold of the retained log") {
    val a = Files.createTempDirectory("scd2cad-r").toString + "/store"
    val b = Files.createTempDirectory("scd2cad-rt").toString + "/store"
    // retain 1.5 batches of event time: versions closed earlier than
    // (maxTs - 1500) at sweep time are purged
    val policy = Scd2Maintain.MaintainPolicy(compactEvery = 2,
      retainMs = 1500L)
    for (i <- 1 to 4) {
      Scd2Maintain.mergeBatch(spark, batchDf(i), a, Buckets,
        policy = policy)
      Scd2Maintain.mergeBatch(spark, batchDf(i), b, Buckets)
      if (i % 2 == 0) {
        // the manual twin: same horizon derivation, by hand
        val maxTs = Scd2Maintain.changeLog(spark, b)
          .agg(max(col("ts_ms"))).head.getLong(0)
        Scd2Maintain.expireVersions(spark, b, maxTs - 1500L)
        Scd2Maintain.compactLog(spark, b)
      }
    }
    assert(storeState(a) == storeState(b),
      "scheduled retention diverged from the manual twin")
    // something was actually purged (the policy is not a no-op here)
    assert(Scd2Maintain.changeLog(spark, a).count() < 24L,
      "retention horizon purged nothing — fixture too loose")
    // derived-state consistency: history == fold of the retained log
    assert(rowsOf(Scd2Maintain.history(spark, a)) ==
      rowsOf(CdcRoute.scd2FromChanges(Scd2Maintain.changeLog(spark, a))),
      "history is not the fold of the retained log")
  }

  test("retention's log-written/history-unwritten crash window " +
    "self-heals: a re-run with nothing left to purge (removed == 0) " +
    "still rewrites history to the fold of the retained log") {
    val a = Files.createTempDirectory("scd2cad-w").toString + "/store"
    for (i <- 1 to 4)
      Scd2Maintain.mergeBatch(spark, batchDf(i), a, Buckets)
    val allEvents = Scd2Maintain.changeLog(spark, a).localCheckpoint(true)
    val horizon = 4005L - 1500L
    assert(Scd2Maintain.expireVersions(spark, a, horizon) > 0L,
      "fixture must purge something")
    // simulate the crash: the log overwrite committed but the history
    // write was lost — history still shows the PRE-retention fold
    CdcRoute.scd2FromChanges(allEvents.drop("bucket"))
      .withColumn("bucket", SnapshotMaintain.bucketOf(Buckets))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("bucket")
      .parquet(s"$a/history")
    assert(rowsOf(Scd2Maintain.history(spark, a)) !=
      rowsOf(CdcRoute.scd2FromChanges(Scd2Maintain.changeLog(spark, a))),
      "fixture must start with a stale history")
    // the replayed retention pass purges nothing — pre-r13 it early-
    // returned here and the expired versions survived in history
    assert(Scd2Maintain.expireVersions(spark, a, horizon) == 0L)
    assert(rowsOf(Scd2Maintain.history(spark, a)) ==
      rowsOf(CdcRoute.scd2FromChanges(Scd2Maintain.changeLog(spark, a))),
      "no-op retention re-run did not repair the stale history")
  }

  test("growth+retention settles (unit pin of the BASELINE.md r13 " +
    "combined soak): after a retention-active sweep the growth base " +
    "anchors on the RETAINED log count, so the sweep interval stops " +
    "doubling and settles at the retention-capped mass") {
    val a = Files.createTempDirectory("scd2cad-gr").toString + "/store"
    val policy = Scd2Maintain.MaintainPolicy(compactGrowth = 1.0,
      retainMs = 1500L)
    // (batch, post-sweep base, post-sweep retained log count)
    var recs = List.empty[(Int, Long, Long)]
    for (i <- 1 to 13)
      Scd2Maintain.mergeBatch(spark, batchDf(i), a, Buckets,
        policy = policy, afterSweep = () => {
          val c = Scd2Maintain.readMaintainCtr(spark, a)
          recs ::= ((i, c.baseEvents,
            Scd2Maintain.changeLog(spark, a).count()))
        })
    val sweeps = recs.reverse
    // (a) the base anchors on the RETAINED log count at EVERY sweep —
    // never the pre-retention mass
    for ((b, base, retained) <- sweeps)
      assert(base == retained,
        s"batch $b: base $base != retained log count $retained")
    // retention is genuinely active: the settled mass sits far below
    // the total applied (13×6 = 78 events)
    val settledBases = sweeps.map(_._2).takeRight(3)
    assert(settledBases.max < 30L,
      s"retention never capped the mass: bases ${sweeps.map(_._2)}")
    // the capped base is CONSTANT across the settled tail
    assert(settledBases.distinct.size == 1,
      s"settled base not constant: $settledBases")
    // (b) the trigger interval derives from the capped base: the
    // schedule doubles while young (1,2,4) then settles at a fixed
    // interval — a growth-only run fires only {1,2,4,8} in 13 batches
    val schedule = sweeps.map(_._1)
    assert(schedule.take(3) == List(1, 2, 4),
      s"young-store doubling violated: $schedule")
    val tailGaps = schedule.drop(3).zip(schedule.drop(2))
      .map { case (n, p) => n - p }
    assert(tailGaps.nonEmpty && tailGaps.distinct.size == 1,
      s"interval did not settle: $schedule (gaps $tailGaps)")
    assert(schedule.last > 8 && schedule.size > 4,
      s"settled schedule should out-fire pure doubling's {1,2,4,8}: " +
        s"$schedule")
  }

  test("a non-finite compactGrowth fails at policy construction: Inf " +
    "claims cadence-on yet can never fire a sweep, NaN reads as " +
    "cadence-off — both are a policy the caller believes is " +
    "maintaining but isn't") {
    intercept[IllegalArgumentException] {
      Scd2Maintain.MaintainPolicy(compactGrowth = Double.PositiveInfinity)
    }
    intercept[IllegalArgumentException] {
      Scd2Maintain.MaintainPolicy(compactGrowth = Double.NaN)
    }
  }

  test("the remaining degenerate knobs fail at construction too (r14 " +
    "verdict #4 symmetry sweep): negative compactGrowth and negative " +
    "compactEvery silently read as cadence-off, retainMs <= 0 as " +
    "retain-nothing — while the documented off values still build") {
    intercept[IllegalArgumentException] {
      Scd2Maintain.MaintainPolicy(compactGrowth = -1.0)
    }
    intercept[IllegalArgumentException] {
      Scd2Maintain.MaintainPolicy(compactEvery = -1)
    }
    intercept[IllegalArgumentException] {
      Scd2Maintain.MaintainPolicy(retainMs = 0L)
    }
    intercept[IllegalArgumentException] {
      Scd2Maintain.MaintainPolicy(retainMs = -5L)
    }
    // the documented off defaults remain constructible
    val off = Scd2Maintain.MaintainPolicy()
    assert(!off.cadenceOn && off.retainMs == Long.MaxValue)
  }

  test("every log write path lands the SAME on-disk column order (r15 " +
    "root-cause of the twin-compare flake): the first-ever batch, the " +
    "replay-gated append (left_anti fronts event_id), the retention " +
    "rewrite (horizon join fronts user_id), erasure and compaction all " +
    "reached parquet with different column orders, so the dir's " +
    "inferred frame layout depended on which file footer the " +
    "order-unstable listing sampled first") {
    val a = Files.createTempDirectory("scd2cad-c").toString + "/store"
    val canonical = SnapshotMaintain.changeSchema.fieldNames.toSeq
    // first-ever batch + two replay-gated appends (pre-fix: two orders)
    for (i <- 1 to 3)
      Scd2Maintain.mergeBatch(spark, batchDf(i), a, Buckets)
    // compaction rewrite, then an append AFTER it
    Scd2Maintain.compactLog(spark, a)
    Scd2Maintain.mergeBatch(spark, batchDf(4), a, Buckets)
    // retention rewrite + keyed erasure rewrite
    val maxTs = Scd2Maintain.changeLog(spark, a)
      .agg(max(col("ts_ms"))).head.getLong(0)
    Scd2Maintain.expireVersions(spark, a, maxTs - 1500L)
    assert(Scd2Maintain.forgetKeys(spark, a, Seq(0L)) > 0L)
    // EVERY surviving data file carries the canonical column order
    // (single-file reads see no partition context, so the expected
    // order is exactly the wire changeSchema, no bucket)
    val files = {
      val s = Files.walk(java.nio.file.Paths.get(s"$a/log"))
      try {
        val b = Seq.newBuilder[String]
        s.forEach(p => if (p.toString.endsWith(".parquet")) b += p.toString)
        b.result()
      } finally s.close()
    }
    assert(files.nonEmpty)
    files.foreach { f =>
      assert(spark.read.parquet(f).schema.fieldNames.toSeq == canonical,
        s"non-canonical column order in $f")
    }
    // and the public read face is the canonical order too
    assert(Scd2Maintain.changeLog(spark, a)
      .schema.fieldNames.toSeq == canonical)
  }

  test("maintainStatus is the public ops face of the cadence counter: " +
    "it tracks mergeBatch bump-for-bump and resets at the sweep") {
    val a = Files.createTempDirectory("scd2cad-s").toString + "/store"
    val policy = Scd2Maintain.MaintainPolicy(compactEvery = 3)
    // fresh / unmaintained store reads all-zero
    assert(Scd2Maintain.maintainStatus(spark, a) ==
      Scd2Maintain.MaintainCtr(0L, 0L, 0L))
    Scd2Maintain.mergeBatch(spark, batchDf(1), a, Buckets, policy = policy)
    Scd2Maintain.mergeBatch(spark, batchDf(2), a, Buckets, policy = policy)
    assert(Scd2Maintain.maintainStatus(spark, a) ==
      Scd2Maintain.MaintainCtr(2L, 12L, 0L),
      s"status after 2 applying batches: ${Scd2Maintain.maintainStatus(spark, a)}")
    Scd2Maintain.mergeBatch(spark, batchDf(3), a, Buckets, policy = policy)
    assert(Scd2Maintain.maintainStatus(spark, a) ==
      Scd2Maintain.MaintainCtr(0L, 0L, 18L),
      "status must reset at the sweep with the post-sweep base anchored")
  }

  test("crash at the sweep point converges on replay: the completed " +
    "sweep's counter reset persists, the replayed batch applies " +
    "nothing and does not re-sweep, and the store matches a crash-free " +
    "twin through subsequent batches") {
    val a = Files.createTempDirectory("scd2cad-c").toString + "/store"
    val b = Files.createTempDirectory("scd2cad-ct").toString + "/store"
    val policy = Scd2Maintain.MaintainPolicy(compactEvery = 2)
    var sweptA = 0
    def mergeA(i: Int, inject: Boolean = false): Long =
      Scd2Maintain.mergeBatch(spark, batchDf(i), a, Buckets,
        policy = policy, afterSweep = () => {
          sweptA += 1
          if (inject) throw new RuntimeException("injected")
        })
    mergeA(1)
    // batch 2 trips the cadence; the crash lands AFTER the sweep and
    // counter reset, BEFORE the stream checkpoint would commit
    intercept[RuntimeException] { mergeA(2, inject = true) }
    assert(Scd2Maintain.readMaintainCtr(spark, a) ==
      Scd2Maintain.MaintainCtr(0L, 0L, 12L),
      "counter must reflect the completed pre-crash sweep")
    // replay of batch 2: set-union log applies nothing, the history
    // recompute repairs, and no second sweep fires
    assert(mergeA(2) == 0L, "replayed batch must apply nothing")
    assert(sweptA == 1, s"replay re-swept: $sweptA sweeps")
    // crash-free twin, same policy, no injection
    for (i <- 1 to 4)
      Scd2Maintain.mergeBatch(spark, batchDf(i), b, Buckets,
        policy = policy)
    mergeA(3); mergeA(4)
    assert(sweptA == 2, s"batch-4 sweep missing: $sweptA")
    assert(storeState(a) == storeState(b),
      "crash-at-sweep replay diverged from the crash-free twin")
    assert(Scd2Maintain.readMaintainCtr(spark, a) ==
      Scd2Maintain.readMaintainCtr(spark, b),
      "counters diverged from the crash-free twin")
  }
}
