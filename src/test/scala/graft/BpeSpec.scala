package graft

import graft.operators.TextOps

/** BPE merge induction — spec tier (no DuckDB oracle; the
  * leftmost-non-overlap fold is not expressible in DuckDB 1.0's
  * list_reduce — see bpeMerges scaladoc). The classic fixture pins
  * every merge exactly. */
class BpeSpec extends SparkSpec {

  import spark.implicits._

  private def run(words: Seq[(String, Long)], k: Int) =
    TextOps.bpeMergesFromWordFreq(spark,
      words.toDF("word", "freq"), k)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq

  test("the Sennrich fixture: {low:5, lower:2, newest:6, widest:3} " +
    "learns es, est, est</w> — every count hand-verified") {
    // round 1 pair counts: e+s = 9, s+t = 9, t+</w> = 9, w+e = 8,
    // l+o = o+w = 7 … tie on 9 breaks to the lexicographically least
    // left symbol: (e, s). After merging, (es, t) = 9 wins round 2,
    // then (est, </w>) = 9 wins round 3.
    val m = run(Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L)), 3)
    assert(m == Seq(
      (1L, "e", "s", 9L),
      (2L, "es", "t", 9L),
      (3L, "est", "</w>", 9L)), s"merges drifted: $m")
  }

  test("merge application is LEFTMOST NON-OVERLAPPING: aaaa folds to " +
    "[aa, aa, </w>], not a cascade") {
    // round 1: (a,a) appears at 3 adjacent positions (overlaps counted).
    // A correct fold rewrites a a a a </w> -> aa aa </w>; round 2 then
    // sees pairs (aa,aa) and (aa,</w>) once each, and the tie breaks on
    // the right symbol ('<' < 'a').
    val m = run(Seq(("aaaa", 1L)), 2)
    assert(m == Seq(
      (1L, "a", "a", 3L),
      (2L, "aa", "</w>", 1L)), s"fold semantics wrong: $m")
  }

  test("APPLY phase: the fixture's learned merges segment each word to " +
    "the hand-computed subtoken count; zero merges = chars + marker") {
    val wf = Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))
      .toDF("word", "freq")
    val merges = TextOps.bpeMergesFromWordFreq(spark, wf, 3).collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val seg = TextOps.bpeSegmentWords(wf, merges).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // merges es, est, est</w>:  low = l o w </w>;  lower = l o w e r </w>;
    // newest = n e w est</w>;   widest = w i d est</w>
    assert(seg == Map("low" -> 4L, "lower" -> 6L, "newest" -> 4L, "widest" -> 4L),
      s"segmentation drifted: $seg")
    val seg0 = TextOps.bpeSegmentWords(wf, Nil).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(seg0 == Map("low" -> 4L, "lower" -> 6L, "newest" -> 7L, "widest" -> 7L),
      s"unmerged segmentation should be chars+1: $seg0")
  }

  test("corpus segment query: one row per doc, every word >= 1 subtoken, " +
    "fertility >= 1, and more merges never increase the token count") {
    val out = TextOps.bpeSegmentCounts(spark, sf(), k = 6).collect()
    assert(out.length == Tables.documentsPar(spark, sf()).count())
    out.foreach { r =>
      assert(r.getAs[Long]("n_bpe_tokens") >= r.getAs[Long]("n_words"))
      assert(r.getAs[Double]("bpe_fertility") >= 1.0)
    }
    val out2 = TextOps.bpeSegmentCounts(spark, sf(), k = 2).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_bpe_tokens")).toMap
    out.foreach { r =>
      assert(r.getAs[Long]("n_bpe_tokens") <= out2(r.getAs[Long]("doc_id")),
        "more merges increased a doc's token count")
    }
  }

  test("corpus run: k merges, positive counts, monotone non-increasing, " +
    "merged symbols chain from earlier vocabulary") {
    val m = TextOps.bpeMerges(spark, sf(), k = 6).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(m.length == 6, s"expected 6 merges, got ${m.length}")
    assert(m.forall(_._4 > 0), "non-positive pair count")
    // counts can only fall (or tie) as the best pair is consumed
    assert(m.sliding(2).forall { case Array(a, b) => b._4 <= a._4 },
      s"pair counts increased across rounds: ${m.toSeq}")
    // determinism: a second run reproduces the merges exactly
    val again = TextOps.bpeMerges(spark, sf(), k = 6).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(m.toSeq == again.toSeq, "BPE training not deterministic")
  }
}
