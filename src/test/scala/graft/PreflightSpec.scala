package graft

import graft.operators.{MinHashOps, TextOps}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The composed opt-in pre-flight on the pair-sweep entry points
  * (r10 verdict #2): `preflight = true` must (a) leave every sweep's
  * output BIT-IDENTICAL to the plain call — detection, never a veto —
  * (b) fire the quadratic-regime WARN/counter on a planted hot corpus,
  * and (c) compute + log a suggestDfCap recommendation that satisfies
  * the mass target, while staying silent on a benign corpus. */
class PreflightSpec extends SparkSpec {

  import spark.implicits._

  /** Write a documents.parquet table and return its dir — the entry
    * points read directories, not frames. */
  private def docsDir(rows: Seq[(Long, String, String, String)]): String = {
    val dir = s"${System.getProperty("java.io.tmpdir")}/graft-preflight-" +
      java.util.UUID.randomUUID()
    rows.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.parquet(s"$dir/documents.parquet")
    dir
  }

  /** 40 identical docs (every postings family has df 40 → mass/posting
    * ≈ 19.5 > the warn ratio 16 at the default cap) + 3 distinct docs. */
  private lazy val hotDir = docsDir(
    (0L until 40L).map(i =>
      (i, (0 until 10).map(k => s"h$k").mkString(" "), "en", "web")) ++
    Seq(
      (100L, "one two three four five six seven eight", "en", "web"),
      (101L, "alpha beta gamma delta epsilon zeta eta theta", "en", "web"),
      (102L, "red green blue cyan magenta yellow black white", "en", "web")))

  /** All-distinct corpus: postings df ≤ 2, far below the warn ratio. */
  private lazy val benignDir = docsDir((0L until 30L).map { i =>
    (i, (0 until 10).map(k => s"t${i}_$k").mkString(" "), "en", "web")
  })

  /** Thunks, not frames: the pre-flight runs EAGERLY when the entry
    * point is called, so each test controls when that happens. */
  private def sweeps(dir: String, pf: Boolean): Seq[(String, () => DataFrame)] = Seq(
    ("winnow", () => TextOps.winnowPairs(spark, dir, preflight = pf)),
    ("jaccard", () => TextOps.ngramJaccardPairs(spark, dir, preflight = pf)),
    ("minhash", () => MinHashOps.minhashLshPairs(spark, dir, preflight = pf)),
    ("simhash", () => MinHashOps.simhashPairs(spark, dir, preflight = pf)))

  test("preflight=true is detection, not a veto: every sweep's output " +
    "is bit-identical to the plain call, on hot AND benign corpora") {
    for (dir <- Seq(hotDir, benignDir)) {
      val plain = sweeps(dir, pf = false).map { case (k, f) => k -> f().collect().toSeq }
      val pre = sweeps(dir, pf = true).map { case (k, f) => k -> f().collect().toSeq }
      for (((k, a), (_, b)) <- plain.zip(pre))
        assert(a == b, s"$k output changed under preflight=true in $dir")
      Artifacts.unpersistAll()
    }
  }

  test("the composed pre-flight fires the quadratic-regime counter on " +
    "the hot corpus, once per entry point, and stays silent on benign") {
    Artifacts.unpersistAll()
    val before = TextOps.quadraticPairRegimes.get()
    for ((k, f) <- sweeps(hotDir, pf = true)) {
      val c0 = TextOps.quadraticPairRegimes.get()
      f() // the pre-flight fires at call time
      assert(TextOps.quadraticPairRegimes.get() == c0 + 1,
        s"$k pre-flight must bump the counter exactly once on hot")
    }
    assert(TextOps.quadraticPairRegimes.get() == before + 4)
    Artifacts.unpersistAll()
    val c1 = TextOps.quadraticPairRegimes.get()
    sweeps(benignDir, pf = true).foreach(_._2())
    assert(TextOps.quadraticPairRegimes.get() == c1,
      "benign corpus must not fire the warn")
    Artifacts.unpersistAll()
  }

  test("preflightPairSweep returns the recommendation in the quadratic " +
    "regime (and it satisfies the mass target), None otherwise") {
    val hot = (0L until 40L).map(i => (i, "k")) ++
      (1000L until 1005L).map(i => (i, s"u$i")) // 780/45 ≈ 17.3 > 16
    val e = hot.toDF("doc_id", "k")
    val (pm, rec) = TextOps.preflightPairSweep(e, Seq("k"), 1000, "spec")
    assert(pm.quadraticRegime, s"expected quadratic, got $pm")
    assert(rec.isDefined && rec.get < 40,
      s"recommendation must exclude the 40-clique, got $rec")
    val at = TextOps.pairMass(e, Seq("k"), rec.get)
    assert(at.massPerPosting <= TextOps.PairMassWarnRatio)
    val benign = (0L until 40L).map(i => (i, s"b$i")).toDF("doc_id", "k")
    assert(TextOps.preflightPairSweep(benign, Seq("k"), 1000, "spec")._2.isEmpty)
  }
}
