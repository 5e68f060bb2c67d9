package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** Property tests for the one custom stateful aggregate (SURVEY §5.2):
  * cap, balance, alignment bounds, and — critical for partial
  * aggregation at scale — merge consistency under arbitrary splits.
  * Seeded generators (no scalatest-scalacheck bridge in the offline
  * cache) — 300 random cases per law, reproducible. */
class AggregatorLawsSpec extends AnyFunSuite {

  private def genSigs(rnd: Random): List[SigInput] = {
    val n = rnd.nextInt(60)
    List.fill(n)(SigInput("S",
      Seq("1m", "5m", "15m")(rnd.nextInt(3)),
      if (rnd.nextBoolean()) "BUY" else "SELL",
      1L + rnd.nextInt(100000), 1L + rnd.nextInt(100),
      rnd.nextInt(50).toLong, // deliberately narrow: force ts ties
      rnd.nextInt(1000000).toLong))
  }

  private def fold(sigs: Seq[SigInput]): AggState =
    sigs.foldLeft(SignalAggregator.zero)(SignalAggregator.reduce)

  private def cases(seed: Int)(body: List[SigInput] => Unit): Unit = {
    val rnd = new Random(seed)
    (1 to 300).foreach(_ => body(genSigs(rnd)))
  }

  test("cap: at most 10 signals retained per timeframe, the ts-largest") {
    cases(1) { sigs =>
      val st = fold(sigs)
      st.tfs.foreach { case (tf, t) =>
        assert(t.sigs.size <= 10)
        val all = sigs.filter(_.timeframe == tf)
        assert(t.sigs.size == math.min(all.size, 10))
        val expected = all.sortBy(s => (s.tsMs, s.seq)).takeRight(10).toSet
        assert(t.sigs.toSet == expected)
      }
    }
  }

  test("balance counts ALL signals (uncapped), +1 BUY / -1 SELL") {
    cases(2) { sigs =>
      val st = fold(sigs)
      st.tfs.foreach { case (tf, t) =>
        val all = sigs.filter(_.timeframe == tf)
        assert(t.balance == all.count(_.side == "BUY") - all.count(_.side == "SELL"))
      }
    }
  }

  test("merge of any split == straight fold (partial-agg correctness)") {
    val rnd = new Random(3)
    cases(4) { sigs =>
      val k = if (sigs.isEmpty) 0 else rnd.nextInt(sigs.size + 1)
      val (l, r) = sigs.splitAt(k)
      val merged = SignalAggregator.merge(fold(l), fold(r))
      val direct = fold(sigs)
      assert(merged.tfs.keySet == direct.tfs.keySet)
      merged.tfs.foreach { case (tf, t) =>
        assert(t.balance == direct.tfs(tf).balance)
        assert(t.sigs.toSet == direct.tfs(tf).sigs.toSet)
      }
      assert(SignalAggregator.finish(merged) == SignalAggregator.finish(direct))
    }
  }

  test("finish invariants: alignment ∈ {0.5,1.0}, counts consistent, vol ≥ 0") {
    cases(5) { sigs =>
      if (sigs.nonEmpty) {
        val r = SignalAggregator.finish(fold(sigs))
        assert(r.alignment == 0.5 || r.alignment == 1.0)
        assert(r.n_tf == sigs.map(_.timeframe).distinct.size)
        assert(r.signal_count <= math.min(sigs.size, 30))
        assert(r.avg_vol >= 0.0)
        assert(r.balance == sigs.count(_.side == "BUY") - sigs.count(_.side == "SELL"))
      }
    }
  }
}
