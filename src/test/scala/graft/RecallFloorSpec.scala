package graft

import graft.operators.{MinHashOps, TextOps}
import org.apache.spark.sql.functions._

/** TextOps.recallFloor — the analytic recall criterion promoted from
  * CapRecallProbe to a library face (r11 verdict #4): per labeled pair,
  * the MIN df over keys shared by both docs = the smallest df cap at
  * which the candidate stage still emits the pair; null = no shared
  * key, unreachable at ANY cap. The criterion was cross-checked
  * end-to-end-equal against the real sweep frames on every planted-dup
  * ladder rung (BASELINE.md §Round 11). */
class RecallFloorSpec extends SparkSpec {

  import spark.implicits._

  test("recallFloor: min shared-key df per pair, null out of scope, " +
    "extra pair columns pass through") {
    // dfs by construction: k1=2, k2=5, k3=3, k4=1
    val e = Seq(
      (1L, "k1"), (2L, "k1"),
      (1L, "k2"), (2L, "k2"), (3L, "k2"), (4L, "k2"), (5L, "k2"),
      (3L, "k3"), (4L, "k3"), (7L, "k3"),
      (6L, "k4")).toDF("doc_id", "k")
    val pairs = Seq(
      (1L, 2L, "both"),    // shares k1 (df 2) and k2 (df 5) → 2
      (3L, 4L, "k3win"),   // shares k2 (df 5) and k3 (df 3) → 3
      (1L, 5L, "k2only"),  // shares only k2 → 5
      (1L, 6L, "none"),    // no shared key → null
      (1L, 99L, "ghost"))  // d2 has no postings at all → null
      .toDF("d1", "d2", "tag")
    val floor = TextOps.recallFloor(e, Seq("k"), pairs)
    assert(floor.columns.toSeq == Seq("d1", "d2", "tag", "min_df"))
    val got = floor.collect()
      .map(r => r.getString(2) ->
        (if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    assert(got == Map("both" -> Some(2L), "k3win" -> Some(3L),
      "k2only" -> Some(5L), "none" -> None, "ghost" -> None), s"got $got")

    // the summary face: quantiles over the REACHABLE set {2, 3, 5}
    val st = TextOps.recallFloorStats(floor)
    assert(st.pairs == 5L && st.reachable == 3L, s"got $st")
    assert(st.p50 == 3.0 && st.max == 5.0, s"got $st")
    // and recall-at-cap reads straight off min_df: cap 2 keeps 1 of 3
    assert(floor.filter(col("min_df") <= 2).count() == 1L)
    assert(floor.filter(col("min_df") <= 1000).count() == 3L)

    // empty-reachable degenerate: stats must not throw on all-null
    val st0 = TextOps.recallFloorStats(
      TextOps.recallFloor(e, Seq("k"), Seq((1L, 6L)).toDF("d1", "d2")))
    assert(st0 == TextOps.RecallFloorStats(1L, 0L, 0.0, 0.0, 0.0, 0.0))
  }

  test("recallFloor plan shape (r12 ADVICE #3): the postings frame " +
    "feeds the shared-key join through a LEFT-SEMI restriction to the " +
    "pairs' d2 ids — no unrestricted corpus-scale side in the join") {
    val e = (1L to 200L).flatMap(d => Seq((d, s"k${d % 40}"),
      (d, s"k${(d + 1) % 40}"))).toDF("doc_id", "k")
    val pairs = Seq((1L, 2L), (3L, 4L)).toDF("d1", "d2")
    val plan = TextOps.recallFloor(e, Seq("k"), pairs)
      .queryExecution.executedPlan.toString
    // the pre-r13 shape had exactly one semi-free pass of e into the
    // (keys, d2) join; the fix adds the LeftSemi that label-bounds it
    assert(plan.contains("LeftSemi"),
      s"kb side lost its semi-join restriction:\n$plan")
  }

  test("simhashRecallFloor: the generic floor masked by the " +
    "verify-stage Hamming bound, against a driver-side recomputation") {
    // identical pair (Hamming 0 by construction), a ladder of near
    // pairs (one to several tokens changed), and disjoint docs
    val base = (0 until 40).map(k => s"tok$k").mkString(" ")
    def mut(n: Int) = ((0 until 40).map { k =>
      if (k < n) s"mut$k" else s"tok$k" }).mkString(" ")
    val other = (0 until 40).map(k => s"zz$k").mkString(" ")
    val docs = Seq(
      (1L, base), (2L, base),              // identical
      (3L, mut(1)), (4L, mut(2)),          // near ladder
      (5L, mut(4)), (6L, mut(8)),
      (7L, other), (8L, other + " tail"))
      .toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L), (1L, 6L),
      (1L, 7L), (3L, 4L), (7L, 8L), (1L, 99L)).toDF("d1", "d2")

    // independent oracle: collect the fingerprints, redo bands /
    // Hamming / dfs in plain Scala
    val sh = MinHashOps.simhashShared(docs, 60).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    def probes(s: Long): Set[(Int, Long)] =
      (0 until 3).map(j => (j, (s >> (j * 20)) & ((1L << 20) - 1L))).toSet
    val dfm = sh.values.toSeq.flatMap(probes(_).toSeq)
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    def expect(d1: Long, d2: Long, mh: Int): Option[Long] =
      for {
        s1 <- sh.get(d1); s2 <- sh.get(d2)
        shared = probes(s1) intersect probes(s2)
        if shared.nonEmpty && java.lang.Long.bitCount(s1 ^ s2) <= mh
      } yield shared.map(dfm).min

    for (mh <- Seq(0, 2)) {
      val got = MinHashOps.simhashRecallFloor(docs, pairs, 60, mh)
        .collect().map(r => (r.getLong(0), r.getLong(1)) ->
          (if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
      val want = pairs.collect()
        .map(r => (r.getLong(0), r.getLong(1)) ->
          expect(r.getLong(0), r.getLong(1), mh)).toMap
      assert(got == want, s"maxHamming=$mh: got $got, want $want")
    }
    // the corpus must exercise every branch: the identical pair is
    // reachable even at Hamming 0 (min_df = 2, its own family), some
    // pair is CUT by the verify bound despite shared probes, and some
    // pair shares no probe at all
    assert(expect(1L, 2L, 0) == Some(2L))
    val cut = pairs.collect().map(r => (r.getLong(0), r.getLong(1)))
      .filter { case (a, b) => expect(a, b, 60).isDefined &&
        expect(a, b, 2).isEmpty }
    assert(cut.nonEmpty, "no pair exercises the Hamming cut branch")
    assert(expect(1L, 7L, 60).isEmpty, "disjoint docs share a probe?!")
  }

  test("recallFloor: pins the published sf1 winnow numbers " +
    "(BASELINE.md §Round 11 — 378/378 reachable, p50=19 p95=69 max=90)") {
    // the ladder rung is generated, not shipped (tools/gen_sf1.py);
    // cancel rather than fail where it is absent
    val dir = "/tmp/graft_sf1"
    val ledger = new org.apache.hadoop.fs.Path(s"$dir/planted_pairs.parquet")
    assume(ledger.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .exists(ledger), s"$dir not generated — run tools/gen_sf1.py")
    val near = spark.read.parquet(ledger.toString)
      .filter(col("kind") === "near").select("d1", "d2")
    val e = TextOps.winnowSel(spark, dir)
      .select(col("doc_id"), explode(col("sel")).as("fp"))
    val st = TextOps.recallFloorStats(
      TextOps.recallFloor(e, Seq("fp"), near))
    assert(st.pairs == 378L && st.reachable == 378L, s"got $st")
    assert(st.p50 == 19.0 && st.p95 == 69.0 && st.max == 90.0, s"got $st")
    Artifacts.unpersistAll()
  }
}
