package graft
// (span-dedup tests live beside the chunk invariants they build on)

import graft.operators.TextOps
import org.apache.spark.sql.functions._

/** Exhaustive chunker invariants: one synthetic doc per token count
  * 1..120, all checked in a single job. The 16/8 scheme must cover
  * every token, keep full-width chunks except possibly the last, and
  * overlap consecutive chunks by exactly 8. */
class ChunkInvariantsSpec extends SparkSpec {

  test("chunk arithmetic: full coverage, widths, overlap — n_tokens 1..120") {
    import spark.implicits._
    val docs = (1 to 120)
      .map(n => (n.toLong, (1 to n).map(i => s"t$i").mkString(" ")))
      .toDF("doc_id", "text")
    val chunks = TextOps.chunkFrame(docs)
      .select("doc_id", "chunk_id", "tok_start", "chunk_tokens")
      .collect()
      .groupBy(_.getLong(0)).view.mapValues(_.sortBy(_.getLong(1))).toMap

    for (n <- 1 to 120) {
      val cs = chunks(n.toLong)
      // starts are 1, 9, 17, ... (stride 8)
      cs.zipWithIndex.foreach { case (c, k) =>
        assert(c.getLong(1) == k, s"n=$n: chunk ids not dense")
        assert(c.getLong(2) == 1 + 8 * k, s"n=$n: wrong start for chunk $k")
      }
      // every chunk except the last is full-width (16 or n if shorter)
      cs.init.foreach(c => assert(c.getLong(3) == 16, s"n=$n: short mid-chunk"))
      val last = cs.last
      assert(last.getLong(3) >= 1 && last.getLong(3) <= 16, s"n=$n: bad last width")
      // exact coverage: last chunk must reach token n, and no chunk
      // may start past the previous chunk's end (no gaps)
      assert(last.getLong(2) + last.getLong(3) - 1 == n, s"n=$n: tail not covered")
      cs.sliding(2).foreach {
        case Array(a, b) =>
          assert(b.getLong(2) <= a.getLong(2) + a.getLong(3),
            s"n=$n: gap between chunks ${a.getLong(1)} and ${b.getLong(1)}")
        case _ =>
      }
      // no chunk is fully contained in its predecessor (it adds tokens)
      cs.sliding(2).foreach {
        case Array(a, b) =>
          assert(b.getLong(2) + b.getLong(3) > a.getLong(2) + a.getLong(3),
            s"n=$n: chunk ${b.getLong(1)} adds no new tokens")
        case _ =>
      }
    }
  }

  test("span dedup: cross-doc spans counted with keeper/borrow law; " +
    "within-doc repetition does not count") {
    import spark.implicits._
    // 24 tokens → 2 chunks (1-16, 9-24). doc 1 and doc 2 share ALL
    // tokens (identical text) — every span duplicated, doc 2 borrows
    // all of them from keeper 1. doc 3 is unique but internally
    // repetitive (its two chunks differ though tokens repeat). doc 4
    // shares doc 1's FIRST 16 tokens only → exactly its first chunk is
    // a cross-doc dup.
    val t24 = (1 to 24).map(i => s"w$i").mkString(" ")
    val t24b = (1 to 16).map(i => s"w$i").mkString(" ") + " " +
      (101 to 108).map(i => s"x$i").mkString(" ")
    val rep = (1 to 24).map(i => s"r${i % 3}").mkString(" ")
    val docs = Seq(
      (1L, t24), (2L, t24), (3L, rep), (4L, t24b)).toDF("doc_id", "text")
    val r = TextOps.spanDedupFrame(docs).collect()
      .map(x => x.getLong(0) ->
        (x.getLong(1), x.getLong(2), x.getLong(3), x.getDouble(4))).toMap
    assert(r(1L) == ((2L, 2L, 0L, 1.0)), s"keeper doc wrong: ${r(1L)}")
    assert(r(2L) == ((2L, 2L, 2L, 1.0)), s"borrowing dup wrong: ${r(2L)}")
    assert(r(3L)._2 == 0L && r(3L)._3 == 0L,
      s"within-doc repetition must not count as span dup: ${r(3L)}")
    assert(r(4L) == ((2L, 1L, 1L, 0.5)), s"partial overlap wrong: ${r(4L)}")
  }
}
