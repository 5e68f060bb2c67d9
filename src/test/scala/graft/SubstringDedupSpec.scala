package graft

import graft.operators.TextOps
import org.apache.spark.sql.functions._

/** Exact-substring dedup (Lee et al. 2022 shape) and the cluster-aware
  * leakage-safe split: planted-span fixtures with hand-computed island
  * extents, an independent driver recompute over the real corpus, and
  * the no-near-dup-pair-straddles-splits law. */
class SubstringDedupSpec extends SparkSpec {

  private val K = TextOps.SubstrK

  /** Fixture corpus → (doc_id → (n_spans, n_dup_pos, dup_tokens)). */
  private def run(docs: Seq[(Long, String)]): Map[Long, (Long, Long, Long)] = {
    import spark.implicits._
    val df = docs.toDF("doc_id", "text")
    TextOps.substringDedupFrame(df).collect()
      .map(r => r.getLong(0) -> (r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
  }

  private def words(prefix: String, n: Int): String =
    (0 until n).map(i => s"$prefix$i").mkString(" ")

  test("planted 12-token shared run: one island covering exactly the " +
    "shared tokens in both documents") {
    val shared = words("dup", 12)
    // distinct 10-token contexts either side, so only windows fully
    // inside the shared run collide: 12-K+1 = 5 positions, island
    // coverage p1-p0+K = 4+K = 12 tokens
    val m = run(Seq(
      1L -> s"${words("a", 10)} $shared ${words("b", 10)}",
      2L -> s"${words("c", 10)} $shared ${words("d", 10)}"))
    assert(m(1L) == ((1L, 5L, 12L)), s"got ${m(1L)}")
    assert(m(2L) == ((1L, 5L, 12L)), s"got ${m(2L)}")
  }

  test("documents shorter than K tokens have zero grams and zero spans; " +
    "within-doc-only repetition does not count as duplication") {
    val selfRep = (words("x", K) + " ") * 3 // same K tokens thrice, one doc only
    val m = run(Seq(
      1L -> words("s", K - 1),
      2L -> selfRep.trim,
      3L -> words("z", 30)))
    assert(m(1L) == ((0L, 0L, 0L)))
    assert(m(2L) == ((0L, 0L, 0L)), "self-repetition is repetition's signal, not dedup's")
    assert(m(3L) == ((0L, 0L, 0L)))
  }

  test("two shared runs separated by more than K unique tokens form two " +
    "islands; a contiguous longer run stays one island") {
    val s1 = words("p", 12)
    val s2 = words("q", 12)
    val long = words("r", 20)
    val m = run(Seq(
      1L -> s"$s1 ${words("u", 12)} $s2",
      2L -> s"$s1 ${words("v", 12)} $s2",
      3L -> s"${words("w", 5)} $long",
      4L -> s"${words("y", 5)} $long"))
    assert(m(1L)._1 == 2L && m(1L)._3 == 24L, s"got ${m(1L)}")
    assert(m(2L)._1 == 2L && m(2L)._3 == 24L)
    // contiguous 20-token run: 20-K+1 = 13 positions, one island, 20 tokens
    assert(m(3L) == ((1L, 13L, 20L)), s"got ${m(3L)}")
    assert(m(4L) == ((1L, 13L, 20L)))
  }

  /** Fixture corpus → (doc_id → (n_tokens, removed, kept, stripped)). */
  private def runStrip(docs: Seq[(Long, String)]):
      Map[Long, (Long, Long, Long, String)] = {
    import spark.implicits._
    TextOps.substringStripFrame(docs.toDF("doc_id", "text"), K).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
      .toMap
  }

  test("substring strip: keep-first-occurrence — the lower doc keeps " +
    "its copy verbatim, the higher doc loses exactly the island's " +
    "token coverage, an exact duplicate strips to empty text, and " +
    "short / self-repeating docs are untouched") {
    val shared = words("dup", 12)
    val d1 = s"${words("a", 10)} $shared ${words("b", 10)}"
    val d2 = s"${words("c", 10)} $shared ${words("d", 10)}"
    val selfRep = ((words("x", K) + " ") * 3).trim
    val short = words("s", K - 1)
    val m = runStrip(Seq(1L -> d1, 2L -> d2, 3L -> d1,
      4L -> short, 5L -> selfRep))
    assert(m(1L) == ((32L, 0L, 32L, d1)), s"lower doc touched: ${m(1L)}")
    // doc 2: shared grams at positions 10..14 → one island covering
    // token indexes 10..21 — exactly the 12 shared tokens
    val d2kept = s"${words("c", 10)} ${words("d", 10)}"
    assert(m(2L) == ((32L, 12L, 20L, d2kept)), s"got ${m(2L)}")
    assert(m(3L) == ((32L, 32L, 0L, "")), "exact dup must strip to empty")
    assert(m(4L) == ((K - 1L, 0L, K - 1L, short)), "sub-K doc touched")
    assert(m(5L) == ((3L * K, 0L, 3L * K, selfRep)),
      "self-repetition is repetition's signal — strip must not touch it")
  }

  test("substring strip conserves tokens on the real corpus, the kept " +
    "text re-tokenizes to kept_tokens, and strip only touches docs " +
    "the symmetric report already flags (lower-id ⊂ min≠max)") {
    val docs = graft.Tables.documentsPar(spark, sf()).select("doc_id", "text")
    val strip = TextOps.substringStripFrame(docs, K).collect()
    assert(strip.nonEmpty && strip.exists(_.getLong(2) > 0),
      "fixture corpus must exercise real stripping")
    assert(strip.forall(r => r.getLong(2) + r.getLong(3) == r.getLong(1)),
      "removed + kept must equal n_tokens")
    assert(strip.forall(r =>
      r.getString(4).split(" ").count(_.nonEmpty) == r.getLong(3)),
      "stripped text must re-tokenize to kept_tokens")
    val flagged = TextOps.substringDedupFrame(docs).collect()
      .filter(_.getLong(5) > 0L).map(_.getLong(0)).toSet
    assert(strip.filter(_.getLong(2) > 0).forall(r => flagged(r.getLong(0))),
      "strip touched a doc the symmetric report calls clean")
  }

  test("corpus-hot boilerplate (a span shared by EVERY document) is " +
    "flagged everywhere with bounded aggregate state — the no-df-cut claim") {
    val boiler = words("footer", 12)
    val m = run((1L to 200L).map(i =>
      i -> s"${words(s"u$i-", 10)} $boiler"))
    // every doc flags exactly the boilerplate: 5 dup positions, 1 island,
    // 12 tokens — a df-cut would have DROPPED the hot gram and missed it
    (1L to 200L).foreach { i =>
      assert(m(i) == ((1L, 5L, 12L)), s"doc $i: got ${m(i)}")
    }
  }

  test("corpus run matches an independent driver recompute (positions, " +
    "islands, coverage) on every document") {
    val docs = Tables.documents(spark, sf()).select("doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // independent reference: same definition, plain Scala
    def gramHash(g: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(g.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 15), 16)
    }
    val grams = docs.toSeq.flatMap { case (id, text) =>
      val t = text.split(" ", -1)
      (0 to t.length - K).map(p => (id, p.toLong, gramHash(t.slice(p, p + K).mkString(" "))))
    }
    val byH = grams.groupBy(_._3)
    val dup = grams.filter { case (id, _, h) => byH(h).exists(_._1 != id) }
    val expect = dup.groupBy(_._1).map { case (id, ps) =>
      val sorted = ps.map(_._2).sorted
      val islands = sorted.foldLeft(List.empty[(Long, Long)]) {
        case (acc, p) => acc match {
          case (p0, p1) :: rest if p - p1 <= K => (p0, p) :: rest
          case _ => (p, p) :: acc
        }
      }
      id -> ((islands.size.toLong, sorted.size.toLong,
        islands.map { case (p0, p1) => p1 - p0 + K }.sum))
    }
    val got = TextOps.substringDedup(spark, sf()).collect()
      .map(r => r.getLong(0) -> ((r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
    assert(got.size == docs.size)
    docs.keys.foreach { id =>
      assert(got(id) == expect.getOrElse(id, (0L, 0L, 0L)),
        s"doc $id: got ${got(id)} expected ${expect.getOrElse(id, (0L, 0L, 0L))}")
    }
    val dupDocs = got.count(_._2._1 > 0)
    assert(dupDocs > 0, "corpus must contain planted cross-doc duplication")
  }

  test("leakage split: no near-dup pair straddles splits, singletons keep " +
    "the naive assignment, and the leak flag matches a driver recompute") {
    val split = TextOps.leakageSplit(spark, sf()).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3),
        r.getString(4), r.getBoolean(5))))
      .toMap
    val pairs = TextOps.ngramJaccardPairsAll(spark, sf())
      .filter(col("jaccard") >= 0.5).select("d1", "d2").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty, "corpus must contain near-dup pairs")
    pairs.foreach { case (a, b) =>
      assert(split(a)._3 == split(b)._3,
        s"near-dup pair ($a,$b) straddles splits ${split(a)._3}/${split(b)._3}")
      assert(split(a)._1 == split(b)._1, "pair must share a cluster id")
    }
    // singletons: cluster_id == doc_id implies split == naive_split
    split.foreach { case (id, (cl, size, s, ns, leaky)) =>
      if (size == 1L) {
        assert(cl == id && s == ns, s"singleton $id must keep the naive split")
        assert(!leaky)
      }
    }
    // leak flag = cluster members' naive buckets differ (driver recompute)
    val byCluster = split.groupBy(_._2._1)
    split.foreach { case (id, (cl, size, _, _, leaky)) =>
      val naives = byCluster(cl).map(_._2._4).toSet
      assert(leaky == (size > 1 && naives.size > 1), s"leak flag wrong for doc $id")
    }
    assert(split.values.exists(_._5), "corpus must exhibit naive leakage")
    // split fractions near 8/1/1
    val frac = split.values.count(_._3 == "train").toDouble / split.size
    assert(frac > 0.7 && frac < 0.9, s"train fraction $frac out of band")
  }

  test("keep-best retention: one keeper per cluster, the keeper is the " +
    "quality argmax with doc_id tie-break, singletons keep themselves") {
    val rows = TextOps.dedupKeepBest(spark, sf()).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getLong(4), r.getBoolean(5)))
    val byCluster = rows.groupBy(_._2)
    byCluster.foreach { case (cl, ms) =>
      assert(ms.count(_._6) == 1, s"cluster $cl must have exactly one keeper")
      val best = ms.minBy(m => (-m._4, m._1)) // quality desc, doc_id asc
      assert(ms.forall(_._5 == best._1), s"keeper_id wrong in cluster $cl")
      assert(ms.forall(_._3 == ms.length.toLong))
      if (ms.length == 1) assert(ms.head._6 && ms.head._2 == ms.head._1)
    }
    assert(byCluster.exists(_._2.length > 1), "corpus must contain clusters")
    // the policy is quality-ranked, not min-id: at least verify the two
    // CAN diverge structurally (keeper == min id only when quality agrees)
    byCluster.filter(_._2.length > 1).foreach { case (_, ms) =>
      val keeper = ms.find(_._6).get
      val minId = ms.minBy(_._1)
      if (keeper._1 != minId._1)
        assert(keeper._4 > minId._4, "a non-min keeper must out-score the min id")
    }
  }

  test("corpus report: per-source masses conserve against the corpus and " +
    "the per-doc signal frames") {
    val rep = TextOps.corpusReport(spark, sf()).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getLong(5), r.getLong(6), r.getLong(7), r.getDouble(8))))
      .toMap
    val docs = Tables.documents(spark, sf())
      .select("doc_id", "source", "lang").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(rep.values.map(_._1).sum == docs.length, "n_docs must conserve")
    // per-source doc counts and language spread against a direct recompute
    docs.groupBy(_._2).foreach { case (src, rows) =>
      assert(rep(src)._1 == rows.length)
      assert(rep(src)._7 == rows.map(_._3).distinct.length.toLong)
    }
    // token mass conserves against the quality frame; dup mass against
    // the substring-dedup frame
    val nTok = TextOps.quality(spark, sf()).agg(sum(col("n_tokens")))
      .head().getLong(0)
    assert(rep.values.map(_._2).sum == nTok, "token mass must conserve")
    val dupTok = TextOps.substringDedup(spark, sf()).agg(sum(col("dup_tokens")))
      .head().getLong(0)
    assert(rep.values.map(_._3).sum == dupTok, "dup mass must conserve")
    rep.foreach { case (src, (nd, nt, dt, df, nq, ng, _, share)) =>
      assert(dt <= nt && nq <= nd && ng <= nd, s"bounds violated for $src")
      assert(df >= 0.0 && df <= 1.0 && share > 0.0 && share <= 1.0)
    }
    assert(math.abs(rep.values.map(_._8).sum - 1.0) < 1e-9,
      "token shares must sum to 1")
  }
}
