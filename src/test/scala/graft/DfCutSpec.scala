package graft

import graft.operators.{MinHashOps, TextOps}
import org.apache.spark.sql.functions._

/** The two-pass df-cut behind the postings-pair pattern (VERDICT r3
  * defect #1): groups hotter than the cap must be DROPPED before the
  * collect_list, so no reducer ever buffers a stopword-gram's full
  * postings list. Plants a 5000-df gram and asserts (a) the aggregation
  * input is bounded by the cap, (b) pair output is identical to a
  * corpus that never contained the hot gram, (c) drop — not truncate —
  * semantics, and (d) the same cut on the MinHash band buckets. */
class DfCutSpec extends SparkSpec {

  import spark.implicits._

  /** 5000 docs sharing one gram ("alpha beta gamma", df=5000) plus 6
    * genuine near-dups sharing a 10-token phrase (per-pair common=8
    * kept grams). */
  private def hotCorpus(hotPhrase: Boolean) = {
    val hotDocs = (0L until 5000L).map { i =>
      val head = if (hotPhrase) "alpha beta gamma" else s"a$i b$i c$i"
      (i, "en", s"$head u$i v$i w$i")
    }
    val nearDups = (0 until 6).map { j =>
      (100000L + j, "en", (0 until 10).map(k => s"p$k").mkString(" ") + s" s$j t$j")
    }
    (hotDocs ++ nearDups).toDF("doc_id", "lang", "text")
  }

  test("dfCut: a 5000-df group is dropped, kept groups are bounded by " +
    "the cap and untouched") {
    val postings = hotCorpus(hotPhrase = true)
      .withColumn("toks", split(col("text"), " "))
      .select(col("doc_id"), col("lang"),
        explode(TextOps.wordTrigrams(col("toks"))).as("gram"))
    val kept = TextOps.dfCut(postings, Seq("lang", "gram"), 1000)
    val sizes = kept.groupBy("lang", "gram").agg(count(lit(1)).as("df"))
    val maxDf = sizes.agg(max("df")).head().getLong(0)
    assert(maxDf <= 1000, s"kept group of size $maxDf exceeds the cap")
    assert(kept.filter(col("gram") === "alpha beta gamma").count() == 0,
      "the hot gram must be dropped entirely")
    // every sub-cap posting row survives verbatim
    val dropped = postings.count() - kept.count()
    assert(dropped == 5000L, s"exactly the 5000 hot postings drop, got $dropped")
  }

  test("ngram pairs: output with a planted 5000-df gram is identical to " +
    "the corpus without it, and matches a driver-side reference") {
    val withHot = TextOps.ngramJaccardPairsFrame(spark, hotCorpus(true), 1000)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5))).toSet
    val without = TextOps.ngramJaccardPairsFrame(spark, hotCorpus(false), 1000)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5))).toSet
    assert(withHot == without,
      "dropping the hot gram must make the hot corpus indistinguishable")

    // independent reference: postings map over kept grams, driver-side
    val docs = hotCorpus(true).collect()
      .map(r => r.getLong(0) -> r.getString(2).split(" ").sliding(3)
        .map(_.mkString(" ")).toSet)
    val df = docs.flatMap { case (_, gs) => gs }.groupBy(identity).map {
      case (g, o) => g -> o.length
    }
    val nGrams = docs.map { case (id, gs) => id -> gs.size.toLong }.toMap
    val byKeptGram = docs
      .flatMap { case (id, gs) => gs.filter(df(_) <= 1000).map(_ -> id) }
      .groupBy(_._1).values.map(_.map(_._2).sorted.toSeq)
    val commonCount = scala.collection.mutable.Map.empty[(Long, Long), Long]
      .withDefaultValue(0L)
    for (ds <- byKeptGram; Seq(a, b) <- ds.combinations(2))
      commonCount((a, b)) += 1
    val expected = commonCount.toSeq.map { case ((a, b), common) =>
      val (n1, n2) = (nGrams(a), nGrams(b))
      (a, b, common, n1, n2, common.toDouble / (n1 + n2 - common))
    }.toSet
    assert(withHot == expected, s"got ${withHot.size} pairs, " +
      s"expected ${expected.size} (the 15 near-dup pairs)")
    assert(expected.size == 15 && expected.forall(_._3 == 8L))
  }

  test("drop semantics, not truncate: when every shared gram is hot, " +
    "no pairs form at all") {
    val nearDups = (0 until 6).map { j =>
      (j.toLong, "en", (0 until 10).map(k => s"p$k").mkString(" ") + s" s$j t$j")
    }.toDF("doc_id", "lang", "text")
    // cap=5 < 6 docs: all 8 shared grams are hot → dropped → zero pairs
    // (the old slice-truncation would still emit C(5,2) pairs)
    assert(TextOps.ngramJaccardPairsFrame(spark, nearDups, 5).count() == 0)
    // cap=6: nothing is hot → the full 15 pairs return
    assert(TextOps.ngramJaccardPairsFrame(spark, nearDups, 6).count() == 15)
  }

  test("simhash pairs: identical docs pair at hamming 0; a probe bucket " +
    "hotter than the cap is dropped") {
    val hot = (0L until 12L).map { i =>
      (i, "en", (0 until 10).map(k => s"m$k").mkString(" "))
    }
    val dup = Seq(
      (100L, "en", (0 until 10).map(k => s"z$k").mkString(" ")),
      (101L, "en", (0 until 10).map(k => s"z$k").mkString(" ")))
    val corpus = (hot ++ dup).toDF("doc_id", "lang", "text")
    // default cap: the 12-clique (66 pairs) + the z-pair, all hamming 0
    val full = MinHashOps.simhashPairsFrame(spark, corpus, TextOps.DfCap)
    assert(full.filter(col("hamming") === 0).count() >= 67)
    // cap=10: the 12 identical docs' probe buckets all have df=12 > 10
    // → dropped; the z-pair (df=2 buckets) survives
    val cut = MinHashOps.simhashPairsFrame(spark, corpus, 10)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cut == Set((100L, 101L)), s"got $cut")
  }

  test("pairMass: exact df-histogram arithmetic, and mass equals the " +
    "pair stage's actual emitted row count (r9 verdict #3 pre-flight)") {
    // hand-built postings: keys with df 1, 2, 3, 5 → at cap 3 the df-5
    // key is dropped; mass = 0 + 1 + 3 = 4, kept = 1 + 2 + 3 = 6
    val e = (Seq("a").map((1L, _)) ++
      Seq("b", "b").zipWithIndex.map { case (k, i) => (10L + i, k) } ++
      Seq("c", "c", "c").zipWithIndex.map { case (k, i) => (20L + i, k) } ++
      Seq("d", "d", "d", "d", "d").zipWithIndex
        .map { case (k, i) => (30L + i, k) })
      .toDF("doc_id", "k")
    val pm = TextOps.pairMass(e, Seq("k"), 3)
    assert(pm == TextOps.PairMass(11L, 4L, 4L, 6L), s"got $pm")
    // and the mass IS the pair stage's output: postingsPairs on the
    // same frame emits exactly `mass` rows
    val emitted = TextOps.postingsPairs(spark, e, Seq("k"),
      col("doc_id"), 3).count()
    assert(emitted == pm.mass, s"pair stage emitted $emitted, mass ${pm.mass}")

    // on a real corpus shape: hotCorpus's 6 near-dups share 8 sub-cap
    // grams (df=6 → 15 pairs each) and the hot gram is cut → mass 120,
    // equal to the raw pair emissions behind the 15 scored pairs
    val postings = hotCorpus(hotPhrase = true)
      .withColumn("toks", split(col("text"), " "))
      .select(col("doc_id"), col("lang"),
        explode(TextOps.wordTrigrams(col("toks"))).as("gram"))
    val pmCorpus = TextOps.pairMass(postings, Seq("lang", "gram"), 1000)
    assert(pmCorpus.mass == 120L, s"got $pmCorpus")
    val emittedCorpus = TextOps.postingsPairs(spark, postings,
      Seq("lang", "gram"), col("doc_id"), 1000).count()
    assert(emittedCorpus == pmCorpus.mass)
  }

  test("pairCount: exact integer df*(df-1)/2 past the double-precision " +
    "boundary (r10 ADVICE #2 — Spark `/` is double division)") {
    // df·(df−1) is always EVEN, so the /2.0 step is exact in binary FP;
    // the naive form only loses exactness when the long→double cast of
    // the PRODUCT rounds — product ≥ 2^54 with product ≡ 2 (mod 4),
    // i.e. df ≡ 2 or 3 (mod 4) past ~1.34e8. (94906266·94906265 ≈
    // 9.007e15 < 2^53 and the 2^27±1 products are multiples of 4 up to
    // 2^55 — all exactly representable, r11 verdict #1.) Odd and even
    // df exercise both shift branches; the ~4e9 pair exercises the
    // range where the naive long multiply would overflow.
    val dfs = Seq(94906266L, 134217730L, 134217731L,
      4000000000L, 4000000001L)
    val got = dfs.toDF("df")
      .select(TextOps.pairCount(col("df")).as("pc"))
      .collect().map(_.getLong(0)).toSeq
    val want = dfs.map(d => (BigInt(d) * (d - 1) / 2).toLong)
    assert(got == want, s"got $got, want $want")
    // and the double-division form actually differs on the two dfs
    // chosen to round (≡ 2,3 mod 4, product ≥ 2^54): 134217730 →
    // naive 9007199456067584 vs exact …585 (tie-to-even at ulp 4),
    // 134217731 → naive 9007199590285316 vs exact …315. The ~4e9 dfs
    // are excluded: their naive long product trips ANSI overflow.
    val rounding = dfs.slice(1, 3)
    val naive = rounding.toDF("df")
      .select((col("df") * (col("df") - 1) / lit(2)).cast("long").as("pc"))
      .collect().map(_.getLong(0)).toSeq
    assert(naive != want.slice(1, 3),
      "double division became exact?! drop this guard")
    // the boundary pair stays exact in BOTH forms — pins the real model
    val below = dfs.take(1)
    val naiveBelow = below.toDF("df")
      .select((col("df") * (col("df") - 1) / lit(2)).cast("long").as("pc"))
      .collect().map(_.getLong(0)).toSeq
    assert(naiveBelow == want.take(1),
      "sub-2^54 product rounded?! the exactness model is wrong")
  }

  test("pairMassPreflight: detect-don't-reject — the quadratic-regime " +
    "counter bumps and only then (WARN face of the r9 mass finding)") {
    val c0 = TextOps.quadraticPairRegimes.get()
    // 50 docs sharing ONE key at a cap that keeps it: 1225 pairs from
    // 50 postings = 24.5 pairs/posting > the 16 warn bar
    val hot = (0L until 50L).map((_, "k")).toDF("doc_id", "k")
    val pmHot = TextOps.pairMassPreflight(hot, Seq("k"), 1000, "spec-hot")
    assert(pmHot.quadraticRegime && pmHot.mass == 1225L)
    assert(TextOps.quadraticPairRegimes.get() == c0 + 1,
      "quadratic regime not counted")
    // healthy postings (df=2 pairs): 1 pair from 2 postings — silent
    val cool = Seq((1L, "x"), (2L, "x")).toDF("doc_id", "k")
    val pmCool = TextOps.pairMassPreflight(cool, Seq("k"), 1000, "spec-cool")
    assert(!pmCool.quadraticRegime && pmCool.mass == 1L)
    assert(TextOps.quadraticPairRegimes.get() == c0 + 1,
      "healthy sweep must not count")
    // and at the same corpus a LOWER cap exits the regime — the lever
    // the warn message points at
    assert(!TextOps.pairMass(hot, Seq("k"), 10).quadraticRegime)
  }

  test("pairMass convenience faces match the generic call on testdata") {
    val dir = sf()
    val win = TextOps.winnowPairMass(spark, dir)
    val winRef = TextOps.pairMass(
      TextOps.winnowSel(spark, dir).select(explode(col("sel")).as("fp")),
      Seq("fp"), TextOps.DfCap)
    assert(win == winRef && win.postings > 0)
    val jac = TextOps.ngramJaccardPairMass(spark, dir)
    assert(jac.postings > 0 && jac.mass >= 0 && jac.nKeys > 0)
    // minhash face: postings = Bands rows per sized doc, and the mass
    // equals the candidate stage's emitted row count (pre-distinct)
    val mh = MinHashOps.minhashPairMass(spark, dir)
    assert(mh.postings > 0 && mh.nKeys > 0)
    val (_, exploded) = MinHashOps.bandPostings(spark,
      Tables.documentsPar(spark, dir))
    val emitted = TextOps.postingsPairs(spark, exploded,
      Seq("lang", "band_idx", "band_hash"), col("doc_id"),
      TextOps.DfCap).count()
    assert(emitted == mh.mass, s"candidate stage emitted $emitted, " +
      s"pre-flight mass ${mh.mass}")
  }

  test("pairMass randomized law: for random postings frames and random " +
    "caps, mass ≡ the pair stage's emitted rows, keptPostings ≡ the " +
    "df-cut's survivors, and the totals are exact (seeded trials)") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 6) {
      // random df profile: 5-25 keys, each with df 1..40 (some will
      // cross the random cap, some won't)
      val rows = (0 until (5 + rnd.nextInt(21))).flatMap { k =>
        val df = 1 + rnd.nextInt(40)
        (0 until df).map(i => (k * 1000L + i, s"key$k"))
      }
      val e = rows.toDF("doc_id", "k")
      val cap = 1 + rnd.nextInt(45)
      val pm = TextOps.pairMass(e, Seq("k"), cap)
      assert(pm.postings == rows.size.toLong, s"trial $trial postings")
      assert(pm.nKeys == rows.map(_._2).distinct.size.toLong,
        s"trial $trial nKeys")
      val emitted = TextOps.postingsPairs(spark, e, Seq("k"),
        col("doc_id"), cap).count()
      assert(emitted == pm.mass,
        s"trial $trial cap=$cap: emitted $emitted, mass ${pm.mass}")
      val kept = TextOps.dfCut(e, Seq("k"), cap).count()
      assert(kept == pm.keptPostings,
        s"trial $trial cap=$cap: dfCut kept $kept, pre-flight ${pm.keptPostings}")
    }
    // empty-frame edge: all zeros, no divide-by-zero, never in regime
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "k")
    val pm0 = TextOps.pairMass(empty, Seq("k"), 10)
    assert(pm0 == TextOps.PairMass(0L, 0L, 0L, 0L) &&
      pm0.massPerPosting == 0.0 && !pm0.quadraticRegime)
  }

  test("suggestDfCap: largest cap within the mass target, maximal by " +
    "construction, and the hot corpus's 5000-df gram sits above any " +
    "sane suggestion") {
    // df profile {1×5, 4, 10, 40}: cumulative mass/kept at each df =
    // 0/5, 6/9 (.67), 51/19 (2.68), 831/59 (14.08)
    val rows = (0 until 5).map(i => (i.toLong, s"u$i")) ++
      (0 until 4).map(i => (100L + i, "a")) ++
      (0 until 10).map(i => (200L + i, "b")) ++
      (0 until 40).map(i => (300L + i, "c"))
    val e = rows.toDF("doc_id", "k")
    assert(TextOps.suggestDfCap(e, Seq("k"), 16.0) == 40) // all pass
    assert(TextOps.suggestDfCap(e, Seq("k"), 3.0) == 10)  // 40 fails
    assert(TextOps.suggestDfCap(e, Seq("k"), 0.5) == 1)   // only df=1
    // maximality law: the suggestion satisfies the target and the
    // next df value above it violates it
    val c = TextOps.suggestDfCap(e, Seq("k"), 3.0)
    val at = TextOps.pairMass(e, Seq("k"), c)
    assert(at.massPerPosting <= 3.0)
    val above = TextOps.pairMass(e, Seq("k"), 40)
    assert(above.massPerPosting > 3.0)
    // no cap admits any group: single df=40 key at a tight target →
    // only a drop-everything cap satisfies, reported as 0
    val lone = (0 until 40).map(i => (i.toLong, "z")).toDF("doc_id", "k")
    assert(TextOps.suggestDfCap(lone, Seq("k"), 16.0) == 0)
    // hot corpus: the 5000-df gram is never inside a default-target cap
    val postings = hotCorpus(hotPhrase = true)
      .withColumn("toks", split(col("text"), " "))
      .select(col("doc_id"), col("lang"),
        explode(TextOps.wordTrigrams(col("toks"))).as("gram"))
    val sugg = TextOps.suggestDfCap(postings, Seq("lang", "gram"))
    assert(sugg >= 6 && sugg < 5000,
      s"suggestion $sugg must keep the near-dup grams (df 6) and " +
      "exclude the 5000-df stopword gram")
  }

  test("pairMass plan pin: the pre-flight is two aggregate levels and " +
    "two exchanges (keys, then one slim row per partition) — no sort, " +
    "no join; strictly cheaper than the sweep's own df-cut pass") {
    val e = Seq((1L, "a"), (2L, "a"), (3L, "b")).toDF("doc_id", "k")
    // STRUCTURAL checks on the plan tree, not plan-string substring
    // counts (r10 ADVICE #3): exact string shapes break spuriously on
    // Spark upgrades / AQE-config changes; node-type walks only break
    // on a real shape regression.
    val frame = TextOps.pairMassFrame(e, Seq("k"), 1000)
    frame.head // force execution so AQE's FINAL plan is what we walk
    val exec = frame.queryExecution.executedPlan
    def nodes(p: org.apache.spark.sql.execution.SparkPlan
        ): Seq[org.apache.spark.sql.execution.SparkPlan] = {
      val inner = p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          nodes(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          nodes(q.plan)
        case _ => Seq.empty
      }
      (p +: p.children.flatMap(nodes)) ++ inner
    }
    val all = nodes(exec)
    assert(!all.exists(n => n.isInstanceOf[
        org.apache.spark.sql.execution.joins.BaseJoinExec] ||
        n.isInstanceOf[org.apache.spark.sql.execution.SortExec]),
      s"pre-flight must not sort or join:\n$exec")
    val exchanges = all.count(_.isInstanceOf[
      org.apache.spark.sql.execution.exchange.ShuffleExchangeLike])
    assert(exchanges <= 2, s"expected at most 2 exchanges, got $exchanges:\n$exec")
    val aggs = all.count(_.isInstanceOf[
      org.apache.spark.sql.execution.aggregate.BaseAggregateExec])
    assert(aggs >= 4, // two levels, each partial + final
      s"both aggregate levels must partial-aggregate map-side:\n$exec")
  }

  test("minhash LSH: a band bucket hotter than the cap is dropped; " +
    "sub-cap buckets still pair") {
    val hot = (0L until 12L).map { i =>
      (i, "en", (0 until 10).map(k => s"m$k").mkString(" "))
    }
    val dup = Seq(
      (100L, "en", (0 until 10).map(k => s"z$k").mkString(" ")),
      (101L, "en", (0 until 10).map(k => s"z$k").mkString(" ")))
    val corpus = (hot ++ dup).toDF("doc_id", "lang", "text")
    // cap=10: the 12 identical docs share every band bucket (df=12>10,
    // dropped); the z-pair's buckets have df=2 and survive
    val cut = MinHashOps.minhashLshPairsFrame(spark, corpus, 10)
      .select("d1", "d2", "jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(cut == Set((100L, 101L, 1.0)), s"got $cut")
    // default cap: no bucket is hot → 12-clique (66 pairs) + the z-pair
    val full = MinHashOps.minhashLshPairsFrame(spark, corpus, TextOps.DfCap)
    assert(full.count() == 67)
  }
}
