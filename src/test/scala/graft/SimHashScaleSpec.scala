package graft

import graft.operators.MinHashOps
import org.apache.spark.sql.functions._

/** The r4 SimHash scale defect, pinned as a spec: a narrow fingerprint
  * saturates — once expected bucket df crosses the cap, the df-cut
  * drops EVERY bucket and the sweep silently returns nothing — while
  * the wide banded fingerprint keeps finding the planted near-dup at
  * the same corpus size and cap. The test scales the failure down:
  * 600 diverse docs over 5-bit bands (32 values) reproduce exactly
  * what ~4M docs do to the old 16-bit probe space under DfCap=1000. */
class SimHashScaleSpec extends SparkSpec {

  import spark.implicits._

  private val dfCap = 4

  private lazy val docs = {
    val rnd = new scala.util.Random(7)
    val diverse = (0 until 600).map { i =>
      val toks = (0 until 40).map(_ => s"w${rnd.nextInt(100000)}")
      (i.toLong, "en", toks.mkString(" "))
    }
    val planted = "alpha beta gamma delta epsilon zeta eta theta " +
      "iota kappa lambda mu nu xi omicron pi"
    (diverse ++ Seq((9001L, "en", planted), (9002L, "en", planted)))
      .toDF("doc_id", "lang", "text")
  }

  private def pairs(bits: Int) =
    MinHashOps.simhashPairsFrame(spark, docs, dfCap, bits)
      .select("d1", "d2").as[(Long, Long)].collect().toSet

  test("narrow fingerprint: every bucket hot → planted pair silently " +
    "lost; wide banded fingerprint: found at the same N and cap") {
    // narrow = 15 bits → 5-bit bands, 32 probe values/band: 602 docs
    // put ~19 docs in every bucket, the cap drops them all, and the
    // sweep that 'worked' at small N returns nothing at this N
    val narrow = pairs(15)
    assert(!narrow.contains((9001L, 9002L)),
      "narrow sweep unexpectedly kept the planted pair — scale-down broken")
    assert(narrow.isEmpty,
      s"expected total recall loss from the narrow sweep, got $narrow")
    // wide = 60 bits → 20-bit bands: diverse docs spread over 2^20
    // values, the planted pair's buckets hold only the pair, recall
    // survives the SAME corpus and cap
    val wide = pairs(60)
    assert(wide.contains((9001L, 9002L)),
      s"wide sweep lost the planted near-dup pair: $wide")
    // and the verify stays exact: identical docs sit at distance 0
    val h = MinHashOps.simhashPairsFrame(spark, docs, dfCap, 60)
      .filter(col("d1") === 9001L && col("d2") === 9002L)
      .select("hamming").as[Long].head()
    assert(h == 0L, s"identical docs at hamming $h")
  }

  test("defaultSimhashBits widens with N and clamps to the md5 range") {
    // small corpora sit at the floor; the width then grows with N
    assert(MinHashOps.defaultSimhashBits(500) == 15)
    val b1m = MinHashOps.defaultSimhashBits(1000000)
    val b1g = MinHashOps.defaultSimhashBits(1000000000L)
    assert(b1m > 15 && b1g > b1m, s"width must grow: $b1m, $b1g")
    assert(MinHashOps.defaultSimhashBits(Long.MaxValue) == 60)
    // the shipped width covers the 10^9-doc corpus the scaladoc claims
    assert(b1g <= MinHashOps.SimBits)
  }
}
