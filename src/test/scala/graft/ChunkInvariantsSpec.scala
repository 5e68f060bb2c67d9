package graft

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
}
