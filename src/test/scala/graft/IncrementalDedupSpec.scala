package graft

import graft.operators.MinHashOps
import org.apache.spark.sql.functions._

/** Laws of the incremental (batch-vs-corpus) near-dup sweep that the
  * oracle compare can't articulate: its output is exactly the symmetric
  * sweep's cross-boundary subset, directional labeling holds, and the
  * df-cut bounds the CORPUS side's buckets.
  */
class IncrementalDedupSpec extends SparkSpec {

  import spark.implicits._

  /** 3 cross near-dup pairs (corpus doc + batch twin), one batch-internal
    * dup pair, one corpus-internal dup pair, plus unique filler. Batch =
    * doc_id >= 1000. */
  private def corpus() = {
    val cross = (0 until 3).flatMap { j =>
      val phrase = (0 until 14).map(k => s"p${j}_$k").mkString(" ")
      Seq((10L + j, "en", s"$phrase x$j"), (1000L + j, "en", s"$phrase y$j"))
    }
    val batchDup = Seq(
      (1100L, "en", (0 until 14).map(k => s"q$k").mkString(" ") + " bb1"),
      (1101L, "en", (0 until 14).map(k => s"q$k").mkString(" ") + " bb2"))
    val corpusDup = Seq(
      (20L, "en", (0 until 14).map(k => s"r$k").mkString(" ") + " cc1"),
      (21L, "en", (0 until 14).map(k => s"r$k").mkString(" ") + " cc2"))
    val filler = (0 until 40).map(i =>
      (200L + i, "en", (0 until 12).map(k => s"f${i}_$k").mkString(" ")))
    (cross ++ batchDup ++ corpusDup ++ filler).toDF("doc_id", "lang", "text")
  }

  test("incremental = symmetric sweep restricted to cross-boundary " +
    "pairs; direction is (corpus, batch)") {
    val docs = corpus()
    val isNew = col("doc_id") >= 1000L
    val inc = MinHashOps.incrementalNearDupFrame(spark, docs, isNew, 1000)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // every incremental pair goes corpus → batch
    assert(inc.forall { case (d1, d2) => d1 < 1000L && d2 >= 1000L },
      s"directional labeling violated: $inc")
    // parity with the symmetric sweep's cross subset (normalize order)
    val sym = MinHashOps.minhashLshPairsFrame(spark, docs, 1000)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1)))
    val symCross = sym.filter { case (a, b) => (a >= 1000L) != (b >= 1000L) }
      .map { case (a, b) => if (a < 1000L) (a, b) else (b, a) }.toSet
    assert(inc == symCross,
      s"incremental ≠ symmetric cross subset: inc=$inc sym=$symCross")
    assert(inc.size == 3, s"expected the 3 planted cross pairs, got $inc")
    // batch-internal and corpus-internal dups stay out of the
    // incremental output but ARE in the symmetric sweep
    assert(sym.exists { case (a, b) => a >= 1000L && b >= 1000L })
    assert(sym.exists { case (a, b) => a < 1000L && b < 1000L })
  }

  test("df-cut bounds the corpus side: a corpus-hot band bucket is " +
    "dropped, batch postings are not counted against the cap") {
    // 50 corpus docs sharing a full 12-token phrase → they agree on all
    // 4 bands → every (band) bucket has df=50 on the corpus side; with
    // cap 10 those buckets drop, so the planted batch twin finds no
    // candidate. A disjoint cold pair must survive.
    val phrase = (0 until 12).map(k => s"h$k").mkString(" ")
    val hotCorpus = (0 until 50).map(i => (100L + i, "en", s"$phrase z$i"))
    // probe tail token is unique (shared with NO corpus doc): any band
    // whose min comes from a unique gram then matches nothing, and the
    // shared-dominated band buckets are all hot → dropped by the cut
    val batchProbe = Seq((2000L, "en", s"$phrase zz"))
    val coldPair = Seq(
      (500L, "en", (0 until 12).map(k => s"w$k").mkString(" ") + " c1"),
      (2500L, "en", (0 until 12).map(k => s"w$k").mkString(" ") + " c2"))
    val docs = (hotCorpus ++ batchProbe ++ coldPair)
      .toDF("doc_id", "lang", "text")
    val isNew = col("doc_id") >= 2000L
    val got = MinHashOps.incrementalNearDupFrame(spark, docs, isNew, 10)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((500L, 2500L)),
      s"expected only the cold pair to survive the corpus df-cut: $got")
  }
}
