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
