package graft

import graft.operators._
import graft.sources.SignalGen
import graft.streaming.SignalStream
import org.apache.spark.sql.functions._

/** Cheap structural invariants per operator family — the heavy value-level
  * correctness lives in the DuckDB oracle gate (tools/check_oracle.py);
  * these catch semantic regressions fast in `sbt test`. */
class OperatorInvariantsSpec extends SparkSpec {

  lazy val d: String = sf()

  test("parseEnrich drops nothing on clean props and derives strength 1/2/3") {
    val df = SignalOps.parseEnrich(Tables.events(spark, d))
    assert(df.count() == 1000)
    val strengths = df.select("timeframe", "strength").distinct().collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(strengths == Map("1m" -> 1, "5m" -> 2, "15m" -> 3))
  }

  test("window agg: mean-of-means differs from global mean (W10 trap)") {
    val agg = WindowAgg.windowAgg(Tables.events(spark, d))
    val s = SignalOps.signals(Tables.events(spark, d))
    val globalMean = s.groupBy("w_start", "symbol")
      .agg(avg("price").as("gm"))
    val joined = agg.join(globalMean, Seq("w_start", "symbol"))
    // at least one group where the two disagree — proves we did not
    // collapse the two-level aggregate (SURVEY §7.5(2))
    assert(joined.filter(abs(col("avg_price") - col("gm")) > 1e-9).count() > 0)
  }

  test("decisions: action/confidence domains") {
    val dec = Decide.decisions(Tables.events(spark, d))
    val actions = dec.select("action").distinct().collect().map(_.getString(0)).toSet
    assert(actions.subsetOf(Set("STRONG_BUY", "BUY", "HOLD", "SELL", "STRONG_SELL")))
    assert(dec.filter(col("confidence") < 0 || col("confidence") > 1).count() == 0)
    assert(dec.filter(col("action") === "HOLD" && col("suggested_qty") =!= 0.0).count() == 0)
  }

  test("orders: threshold, sizing bounds, unique idempotency key") {
    val o = OrderOps.orders(spark, Tables.events(spark, d))
    assert(o.filter(col("adj_conf") < 0.65).count() == 0)
    assert(o.filter(col("order_qty") < 1.0 || col("order_qty") > 10.0).count() == 0)
    assert(o.select("client_order_id").distinct().count() == o.count())
    // default-price path exercised (symbols beyond the lookup map)
    assert(o.filter(col("market_price") === 100.0).count() > 0)
  }

  test("asof join: correlated value is from a strictly earlier click") {
    val e = Tables.events(spark, d)
    val res = Relational.asofJoin(spark, d)
    assert(res.count() > 0)
    // a purchase with no prior click for that user carries null
    val firstPerUser = e.withColumn("ts_ms", unix_millis(col("ts")))
    val nulls = res.filter(col("last_click_val").isNull).count()
    assert(nulls >= 0) // structural: no exception, null is representable
  }

  test("approx_count_distinct within its 2% design error") {
    val approx = Relational.approxDistinct(spark, d).collect()
      .map(r => r.getString(0) -> r.getLong(1).toDouble).toMap
    val exact = Tables.lineitem(spark, d).groupBy("l_returnflag")
      .agg(countDistinct(col("l_partkey")).as("exact_parts")).collect()
      .map(r => r.getString(0) -> r.getLong(1).toDouble).toMap
    exact.foreach { case (flag, ex) =>
      assert(math.abs(approx(flag) - ex) / ex < 0.05,
        s"HLL error too large for $flag: approx=${approx(flag)} exact=$ex")
    }
  }

  test("approx_percentile tracks the exact quantiles") {
    val approx = Relational.approxPercentiles(spark, d).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val exact = Relational.percentiles(spark, d).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    exact.foreach { case (status, (med, p90)) =>
      val (am, a90) = approx(status)
      // rank error 1e-4 on these group sizes ⇒ tiny value error; allow 1%
      assert(math.abs(am - med) / med < 0.01,
        s"median off for $status: approx=$am exact=$med")
      assert(math.abs(a90 - p90) / p90 < 0.01,
        s"p90 off for $status: approx=$a90 exact=$p90")
    }
  }

  test("percentiles_dist is BIT-IDENTICAL to the buffering exact tier") {
    val buffering = Relational.percentiles(spark, d).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2), r.getLong(3)))
    val dist = Relational.percentilesDist(spark, d).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2), r.getLong(3)))
    assert(buffering.toSeq == dist.toSeq,
      s"value-count reconstruction drifted from percentile():\n" +
        s"  buffering=${buffering.toSeq}\n  dist=${dist.toSeq}")
    // interpolation edges driven through the engine itself: n=1 (frac=0,
    // bracketing rank past n), n=2 (pure midpoint), all-duplicates
    import spark.implicits._
    val tiny = Seq(("A", 100L), ("B", 100L), ("B", 300L),
      ("C", 700L), ("C", 700L), ("C", 700L)).toDF("key", "cents")
    val got = Relational.quantilesByValueCounts(tiny, Seq(0.5 -> "m"))
      .orderBy("key").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    assert(got.toSeq == Seq(("A", 1.0, 1L), ("B", 2.0, 2L), ("C", 7.0, 3L)),
      s"edge-group quantiles wrong: ${got.toSeq}")
  }

  test("approx_top_tokens: bounds contain the exact salted counts; on a " +
    "map-resident vocabulary the sketch IS exact") {
    val truth = graft.operators.TextOps.topTokensSalted(spark, d).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val approx = graft.operators.TextOps.approxTopTokens(spark, d).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(approx.nonEmpty)
    approx.foreach { case (tok, est, lb, ub) =>
      assert(lb <= est && est <= ub, s"bounds inverted for $tok")
      truth.get(tok).foreach { ex =>
        assert(lb <= ex && ex <= ub, s"true count $ex outside [$lb,$ub] for $tok")
      }
    }
    // synthetic vocabulary << MaxMapSize ⇒ no evictions ⇒ exact
    val approxMap = approx.map(a => a._1 -> a._2).toMap
    truth.foreach { case (tok, ex) =>
      assert(approxMap.get(tok).contains(ex),
        s"sketch not exact on map-resident vocab: $tok approx=${approxMap.get(tok)} exact=$ex")
    }
  }

  test("merged daily KLL sketches hit the exact quantiles within design " +
    "rank error") {
    val r = Relational.kllDailyMerge(spark, d).head()
    assert(r.getLong(0) > 1, "need >1 daily sketch for the merge to mean anything")
    val values = Tables.events(spark, d).select("value").collect()
      .map(_.getDouble(0)).sorted
    def rankOf(v: Double): Double =
      values.count(_ <= v).toDouble / values.length
    // the library's own 99%-confidence bound for k=200 (~1.65%), doubled
    // for merge slack — KLL compaction is randomized, so a tight bound
    // would flake once the item count exceeds sketch capacity
    val eps = org.apache.datasketches.kll.KllSketch.getNormalizedRankError(200, false)
    Seq(0.5 -> r.getDouble(1), 0.9 -> r.getDouble(2), 0.99 -> r.getDouble(3))
      .foreach { case (p, est) =>
        val rk = rankOf(est)
        assert(math.abs(rk - p) < 2 * eps,
          s"KLL p$p estimate $est sits at true rank $rk — outside 2*eps=${2 * eps}")
      }
  }

  test("merged daily HLL sketches track the exact all-time distinct count") {
    val r = Relational.hllDailyMerge(spark, d).head()
    val merged = r.getLong(1)
    val exact = Tables.events(spark, d)
      .agg(countDistinct(col("user_id"))).head().getLong(0)
    assert(r.getLong(0) > 1, "need >1 daily sketch for the merge to mean anything")
    assert(math.abs(merged - exact).toDouble / exact < 0.05,
      s"merged sketch estimate $merged too far from exact $exact")
  }

  test("outliers: flagged iff |modified z| > 3.5 against an independent " +
    "per-symbol median/MAD recompute; MAD=0 symbols never flag") {
    val got = graft.operators.SignalOps.outliers(spark, d).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(6))).toSet
    // independent reference: driver-side exact median/MAD per symbol
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted; val n = s.size
      val pos = (n - 1) * 0.5
      val lo = pos.toInt
      if (lo + 1 < n) s(lo) + (s(lo + 1) - s(lo)) * (pos - lo) else s(lo)
    }
    val rows = Tables.events(spark, d)
      .select(concat(lit("U"), col("user_id").cast("string")).as("symbol"),
        col("event_id"), round(col("value") * 100).cast("long").as("pc"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val expected = rows.groupBy(_._1).flatMap { case (sym, evs) =>
      val med = median(evs.map(_._3.toDouble).toSeq)
      val mad = median(evs.map(e => math.abs(e._3 - med)).toSeq)
      if (mad == 0.0) Seq.empty[(String, Long, Double)]
      else evs.toSeq.flatMap { case (_, eid, pc) =>
        val z = 0.6745 * (pc - med) / mad
        if (math.abs(z) > 3.5) Some((sym, eid, z)) else None
      }
    }.toSet
    assert(got == expected,
      s"outlier set mismatch: extra=${(got -- expected).take(3)} " +
        s"missing=${(expected -- got).take(3)}")
    assert(got.nonEmpty, "no outliers at this SF — rule never bites")
  }

  test("theta overlap: every pair's exact overlap sits inside the " +
    "sketch bounds, and estimates are EXACT below the sampling threshold") {
    val rows = Relational.eventsOverlapTheta(spark, d).collect()
    assert(rows.nonEmpty, "no audience pairs emitted")
    val sets = Tables.events(spark, d)
      .select(col("event_type"), col("user_id")).distinct().collect()
      .groupBy(_.getString(0)).map { case (t, rs) =>
        t -> rs.map(_.getLong(1)).toSet
      }
    val nPairs = sets.size * (sets.size - 1) / 2
    assert(rows.length == nPairs, s"expected $nPairs pairs, got ${rows.length}")
    rows.foreach { r =>
      val (ta, tb) = (r.getString(0), r.getString(1))
      assert(ta < tb, "pairs must be unordered (a < b) with no dups")
      val exact = (sets(ta) intersect sets(tb)).size.toDouble
      assert(r.getDouble(5) <= exact && exact <= r.getDouble(6),
        s"($ta,$tb): exact $exact outside [${r.getDouble(5)}, ${r.getDouble(6)}]")
      // below 2^lgK distinct keys a theta sketch never samples → exact
      if (sets(ta).size < 4096 && sets(tb).size < 4096) {
        assert(r.getDouble(2) == sets(ta).size.toDouble &&
          r.getDouble(3) == sets(tb).size.toDouble,
          s"($ta,$tb): per-audience estimate not exact in exact mode")
        assert(r.getDouble(4) == exact,
          s"($ta,$tb): overlap estimate ${r.getDouble(4)} != exact $exact " +
            "in exact mode")
        assert(r.getDouble(7) == (sets(ta) union sets(tb)).size.toDouble)
      }
    }
  }

  test("sessions are gap-consistent: no intra-session gap >= 30min, " +
    "consecutive sessions separated by >= 30min") {
    val s = Relational.sessionize(spark, d).collect()
      .groupBy(_.getLong(0)).values
    s.foreach { sessions =>
      val sorted = sessions.sortBy(_.getLong(1))
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          // next session's start must be >= prev end + 30min
          assert(b.getLong(2) - a.getLong(3) >= 30L * 60 * 1000)
        case _ =>
      }
    }
  }

  test("interval join: click counts match a direct per-row filter") {
    val e = Tables.events(spark, d)
      .withColumn("ts_ms", unix_millis(col("ts")))
      .select("event_id", "user_id", "event_type", "ts_ms").collect()
    val clicks = e.filter(_.getString(2) == "click")
    val expected = e.filter(_.getString(2) == "purchase").map { p =>
      val n = clicks.count(c => c.getLong(1) == p.getLong(1)
        && c.getLong(3) >= p.getLong(3) - 3600000L && c.getLong(3) < p.getLong(3))
      (p.getLong(0), n.toLong)
    }.filter(_._2 > 0).toMap
    val got = Relational.intervalJoin(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(3))).toMap
    assert(got == expected)
  }

  test("dedup_exact: keeper is the min doc_id of its text group") {
    val dd = TextOps.dedupExact(spark, d)
    assert(dd.filter(col("keeper_id") > col("doc_id")).count() == 0)
  }

  test("jaccard pairs are valid similarities in (0,1]") {
    val j = TextOps.ngramJaccardPairs(spark, d)
    assert(j.filter(col("jaccard") <= 0 || col("jaccard") > 1).count() == 0)
    assert(j.filter(col("d1") >= col("d2")).count() == 0)
  }

  test("cosine top-k: k per query, sims in [-1,1], self excluded") {
    val t = EmbeddingOps.cosineTopK(spark, d)
    val perQ = t.groupBy("q_id").count().collect()
    assert(perQ.forall(_.getLong(1) == 5))
    assert(t.filter(col("sim") < -1.0 || col("sim") > 1.0).count() == 0)
    assert(t.filter(col("q_id") === col("vec_id")).count() == 0)
  }

  test("ann candidates share the query bucket") {
    val a = EmbeddingOps.annLsh(spark, d)
    val e = Tables.embeddings(spark, d)
      .select(col("vec_id"), EmbeddingOps.lshBucket(
        transform(col("embedding"), x => x.cast("double"))).as("b"))
    val joined = a.join(e, a("vec_id") === e("vec_id"))
    assert(joined.filter(col("bucket") =!= col("b")).count() == 0)
  }

  test("ivf ann: structure sound, recall vs brute force reported") {
    val ivf = EmbeddingOps.annIvf(spark, d)
    val rows = ivf.collect()
    assert(rows.nonEmpty)
    // <= 3 per query, self excluded, sims are valid cosines
    val perQ = rows.groupBy(_.getLong(0)).values.map(_.size)
    assert(perQ.forall(_ <= 3))
    assert(rows.forall(r => r.getLong(0) != r.getLong(2)))
    assert(rows.forall(r => math.abs(r.getDouble(4)) <= 1.0 + 1e-12))
    // recall@3 vs the exact brute-force ranking — IVF with nprobe=2/16 on
    // uniform synthetic vectors is a coverage/structure demo, so only a
    // loose floor is asserted; the measured value goes to the log
    val exact = EmbeddingOps.cosineTopK(spark, d).filter(col("rn") <= 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = rows.map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (exact & got).size.toDouble / exact.size
    info(f"IVF recall@3 vs exact: $recall%.2f")
    assert(recall > 0.0, "IVF found nothing the exact ranking has")

    // Lloyd-refined variant: same structural invariants; recall must not
    // collapse relative to the init-only index (re-centering can only
    // tighten cells on this data — measured value logged)
    val ivf2 = EmbeddingOps.annIvfRefined(spark, d).collect()
    assert(ivf2.nonEmpty)
    assert(ivf2.forall(r => r.getLong(0) != r.getLong(2)))
    val got2 = ivf2.map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall2 = (exact & got2).size.toDouble / exact.size
    info(f"IVF+Lloyd recall@3 vs exact: $recall2%.2f")
    assert(recall2 >= recall - 0.34,
      f"one Lloyd step collapsed recall: $recall2%.2f vs $recall%.2f")
  }

  test("pq ann: seed vectors self-encode, codes in range, ADC recall " +
    "vs exact L2 reported") {
    // every codebook comes from the first 16 vectors' own slices, so a
    // seed vector is at distance 0 from its own centroid in EVERY
    // subspace — its 8 codes must all equal its vec_id
    val codes = EmbeddingOps.pqEncode(spark, d).drop("v").collect()
    assert(codes.nonEmpty)
    codes.foreach { r =>
      val id = r.getLong(0)
      (1 to EmbeddingOps.PqM).foreach { i =>
        val c = r.getLong(i)
        assert(c >= 0 && c < EmbeddingOps.PqK, s"code out of range: $c")
        if (id < EmbeddingOps.PqK)
          assert(c == id, s"seed $id must self-encode, got $c in subspace ${i - 1}")
      }
    }

    // output shape: <=3 per query, no self, ADC is a squared distance
    val pq = EmbeddingOps.annPq(spark, d).collect()
    assert(pq.nonEmpty)
    assert(pq.groupBy(_.getLong(0)).values.forall(_.size <= 3))
    assert(pq.forall(r => r.getLong(0) != r.getLong(1)))
    assert(pq.forall(_.getDouble(3) >= 0.0), "ADC must be nonnegative")

    // recall@3 vs the exact L2 ranking (PQ approximates L2, not
    // cosine) — 16 data-seeded codes per subspace on uniform synthetic
    // vectors is a coverage demo, so the floor is loose and the
    // measured value goes to the log (the MinHashRecallSpec pattern)
    val vecs = Tables.embeddingsPar(spark, d)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def l2(a: Array[Double], b: Array[Double]): Double =
      a.lazyZip(b).map((x, y) => (x - y) * (x - y)).sum
    val exact = (0L until 5L).flatMap { qid =>
      vecs.keys.filter(_ != qid).toSeq
        .sortBy(c => (l2(vecs(qid), vecs(c)), c)).take(3).map(qid -> _)
    }.toSet
    val got = pq.map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & got).size.toDouble / exact.size
    info(f"PQ ADC recall@3 vs exact L2: $recall%.2f")
    assert(recall > 0.0, "ADC found nothing the exact L2 ranking has")

    // one Lloyd refinement of the codebooks: same structural laws;
    // recall must not collapse vs the seed books (re-centering tightens
    // cells on this data — the annIvfRefined precedent and bound)
    val pq2 = EmbeddingOps.annPqRefined(spark, d).collect()
    assert(pq2.nonEmpty)
    assert(pq2.forall(r => r.getLong(0) != r.getLong(1)))
    assert(pq2.forall(_.getDouble(3) >= 0.0))
    val got2 = pq2.map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall2 = (exact & got2).size.toDouble / exact.size
    info(f"PQ+Lloyd ADC recall@3 vs exact L2: $recall2%.2f")
    assert(recall2 >= recall - 0.34,
      f"one Lloyd step collapsed PQ recall: $recall2%.2f vs $recall%.2f")
  }

  test("dsir importance: matches an independent driver recompute of " +
    "the hashed-bigram likelihood-ratio estimate; eval split excluded") {
    val out = TextOps.importanceDsir(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getBoolean(4)))
    assert(out.nonEmpty)

    // independent reference in plain Scala
    def md5hex(s: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    def h28(s: String): Long = java.lang.Long.parseLong(md5hex(s).take(7), 16)
    val docs = Tables.documents(spark, d).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val grams = docs.flatMap { case (id, text) =>
      val tk = text.split(" ", -1).map(_.toLowerCase)
      val isEval = h28(s"$id#g1") % 10 == 0
      tk.sliding(2).filter(_.length == 2)
        .map(p => (id, isEval, h28(p.mkString(" ")) % TextOps.DsirBuckets))
        .toSeq
    }
    val byB = grams.groupBy(_._3)
    val tOf = byB.map { case (b, g) => b -> g.count(_._2).toLong }
    val rOf = byB.map { case (b, g) => b -> g.count(!_._2).toLong }
    val (tt, rr) = (tOf.values.sum, rOf.values.sum)
    val qlr = byB.keys.map { b =>
      b -> math.round(((tOf(b) + 1).toDouble / (tt + TextOps.DsirBuckets))
        / ((rOf(b) + 1).toDouble / (rr + TextOps.DsirBuckets)) * 1048576.0)
    }.toMap
    val expect = grams.filter(!_._2).groupBy(_._1).map { case (id, g) =>
      val units = g.map(t => qlr(t._3)).sum
      val n = g.size.toLong
      (id, n, units, units.toDouble / (n * 1048576.0), units > n * 1048576L)
    }.toSet
    // math.round is HALF_UP toward +inf on positive values = Spark/DuckDB
    // HALF_UP away-from-zero (ratios are always > 0 here)
    assert(out.toSet == expect,
      "DSIR scores diverged from the driver reference")
    info(s"dsir: ${out.length} raw docs scored, ${out.count(_._5)} kept")
  }

  test("binary ann: output matches an independent driver rerank " +
    "(signature, Hamming top-R, exact-cosine top-3); recall logged") {
    val out = EmbeddingOps.annBinary(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3), r.getDouble(4)))
    assert(out.nonEmpty)

    // fully independent driver reference: same definitions, plain Scala
    val norm = Tables.embeddings(spark, d).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toIndexedSeq))
      .map { case (id, v) => (id, v, v.foldLeft(0.0)((a, x) => a + x * x)) }
      .filter(_._3 > 0.0)
    def sigOf(v: IndexedSeq[Double]): Long =
      (0 until 64).map(i => if (v(i) >= 0.0) 1L << i else 0L).foldLeft(0L)(_ + _)
    val sigs = norm.map { case (id, v, _) => id -> sigOf(v) }.toMap
    val expect = norm.filter(_._1 < 5).flatMap { case (qid, qv, qd) =>
      val cands = norm.filter(_._1 != qid)
        .map { case (id, v, dd) =>
          (id, java.lang.Long.bitCount(sigs(id) ^ sigs(qid)).toLong, v, dd) }
        .sortBy { case (id, h, _, _) => (h, id) }
        .take(EmbeddingOps.BinR)
      cands.map { case (id, h, v, dd) =>
        val dotv = qv.zip(v).foldLeft(0.0) { case (a, (x, y)) => a + x * y }
        (id, h, dotv / (math.sqrt(qd) * math.sqrt(dd)))
      }.sortBy { case (id, _, s) => (-s, id) }.take(3).zipWithIndex
        .map { case ((id, h, s), i) => (qid, id, h, i + 1, s) }
    }
    assert(out.toSet == expect.toSet,
      s"binary-ANN rerank diverged from the driver reference")

    // how much the 1-bit index loses vs the exact ranking — informative
    val exact = EmbeddingOps.cosineTopK(spark, d).filter(col("rn") <= 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = out.map(t => (t._1, t._2)).toSet
    info(f"binary-ANN recall@3 vs exact: ${(exact & got).size.toDouble / exact.size}%.2f")
    assert((exact & got).nonEmpty)
  }

  test("semdedup: keep set matches an independent greedy driver sweep; " +
    "rank-1 rows always survive; drops have a prior within tau") {
    val rows = EmbeddingOps.semDedup(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3),
        r.getDouble(4), r.getDouble(5), r.getBoolean(6)))
    assert(rows.nonEmpty)
    // structural laws
    rows.groupBy(t => (t._1, t._2)).foreach { case (_, g) =>
      assert(g.map(_._4).sorted.toSeq == (1 to g.length),
        "group ranks must be contiguous 1..n")
    }
    assert(rows.filter(_._4 == 1).forall(t => t._7 && t._6 == -1.0),
      "greedy head of every group must be kept with no prior")
    assert(rows.filter(!_._7).forall(_._6 >= EmbeddingOps.SemTau),
      "a dropped doc must have a prior neighbor within tau")
    // independent driver reference: re-run the greedy sweep from raw
    // vectors (same fold-dot), compare the FULL keep verdict per vec
    val e = Tables.embeddingsPar(spark, d)
      .select(col("vec_id"), transform(col("embedding"),
        x => x.cast("double")).as("v")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    def dot(a: Seq[Double], b: Seq[Double]): Double =
      a.lazyZip(b).foldLeft(0.0)((acc, p) => acc + p._1 * p._2)
    // the operator compares each member against ALL earlier-ranked
    // group-mates (kept or not) — mirror exactly that sweep
    val expected = rows.toSeq.groupBy(t => (t._1, t._2)).flatMap { case (_, g) =>
      val ids = g.sortBy(t => (t._5, t._3)).map(_._3) // (csim, vec_id)
      ids.zipWithIndex.map { case (id, i) =>
        val v = e(id)
        val mp = ids.take(i).map { pid =>
          val pv = e(pid)
          dot(v, pv) / (math.sqrt(dot(v, v)) * math.sqrt(dot(pv, pv)))
        }.maxOption.getOrElse(-1.0)
        id -> (mp < EmbeddingOps.SemTau)
      }
    }
    rows.foreach { t =>
      assert(expected(t._3) == t._7,
        s"vec ${t._3}: driver greedy says keep=${expected(t._3)}, op says ${t._7}")
    }
    val dropped = rows.count(!_._7)
    info(s"semdedup: ${rows.length} vecs, $dropped dropped at tau=${EmbeddingOps.SemTau}")
  }

  test("classifier score: matches an independent driver reference " +
    "(java MD5) on sampled docs; label law; both labels present") {
    val out = TextOps.classifierScore(spark, d).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getBoolean(4))).toMap
    assert(out.nonEmpty)
    out.values.foreach { case (n, units, score, keep) =>
      assert(keep == (units > 0), "label must be sign(score_units)")
      assert(math.abs(score - units.toDouble / (n * 65536.0)) == 0.0)
      assert(math.abs(score) <= 0.5, "mean weight cannot leave the grid")
    }
    assert(out.values.exists(_._4) && out.values.exists(!_._4),
      "stand-in model should split the corpus, not constant-label it")
    // independent reference: java.security MD5, no Spark expressions
    def h28(s: String): Long =
      java.lang.Long.parseLong(java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
        .substring(0, 7), 16)
    val docs = Tables.documentsPar(spark, d)
      .select("doc_id", "text").limit(20).collect()
    docs.foreach { r =>
      val toks = r.getString(1).split(" ", -1).map(_.toLowerCase).toSeq
      val feats = toks ++ toks.lazyZip(toks.drop(1)).map(_ + " " + _)
      val units = feats.map(f =>
        h28("cls#" + (h28(f) % TextOps.ClsBuckets)) % 65536L - 32768L).sum
      val (n, u, _, _) = out(r.getLong(0))
      assert(n == feats.length && u == units,
        s"doc ${r.getLong(0)}: driver says ($n, $units), op says ($n, $u)")
    }
  }

  test("winnow: signatures match an independent driver reference for " +
    "every document; the any-window guarantee and real compression hold") {
    val docs = Tables.documentsPar(spark, d).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val got = TextOps.winnow(spark, d).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(got.keySet == docs.keySet)
    def hash28(s: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 7), 16)
    }
    val w = TextOps.WinnowW
    docs.foreach { case (id, text) =>
      // limit -1: keep trailing empty tokens, matching Spark's split()
      val toks = text.split(" ", -1)
      val hs =
        if (toks.length < 3) Array.empty[Long]
        else (0 to toks.length - 3)
          .map(i => hash28(s"${toks(i)} ${toks(i + 1)} ${toks(i + 2)}")).toArray
      val sel =
        if (hs.isEmpty) Set.empty[Long]
        else (0 until math.max(hs.length - w + 1, 1))
          .map(j => hs.slice(j, j + w).min).toSet
      val row = got(id)
      assert(row.getAs[Long]("n_selected") == sel.size, s"count drift, doc $id")
      assert(row.getAs[Long]("sel_sum") == sel.sum, s"sum drift, doc $id")
      // the winnowing guarantee: every window of w consecutive gram
      // hashes contains at least one selected fingerprint
      if (hs.length >= w)
        (0 to hs.length - w).foreach { j =>
          assert(hs.slice(j, j + w).exists(sel.contains),
            s"window $j of doc $id has no selected fingerprint")
        }
    }
    val totSel = got.values.map(_.getAs[Long]("n_selected")).sum
    val totGrams = got.values.map(_.getAs[Long]("n_grams")).sum
    assert(totSel > 0 && totSel < totGrams,
      s"selection must compress: $totSel of $totGrams grams")
  }

  test("winnow pairs: ordered pairs, containment bounded, overlap never " +
    "exceeds either selection, and the near-dup plants surface") {
    val rows = TextOps.winnowPairs(spark, d).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(0) < r.getLong(1), "pairs must be (d1 < d2)")
      val (common, n1, n2, c) =
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))
      assert(common >= 1 && common <= math.min(n1, n2),
        s"common $common vs selections $n1/$n2")
      assert(c > 0.0 && c <= 1.0, s"containment out of range: $c")
    }
    assert(rows.exists(_.getDouble(5) >= 0.5),
      "the corpus's planted near-dups must surface as high containment")
  }

  test("ivf+pq: pruned ADC agrees bit-for-bit with flat PQ on shared " +
    "pairs; overlap with the flat ranking logged") {
    val flat = EmbeddingOps.annPq(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    val pruned = EmbeddingOps.annIvfPq(spark, d).collect()
    assert(pruned.nonEmpty)
    assert(pruned.groupBy(_.getLong(0)).values.forall(_.size <= 3))
    assert(pruned.forall(r => r.getLong(0) != r.getLong(2)))
    // ADC is a property of (query, code word) alone — wherever both
    // rankings surface the same pair, the distance must be IDENTICAL
    val shared = pruned.flatMap(r =>
      flat.get((r.getLong(0), r.getLong(2))).map(_ -> r.getDouble(4)))
    assert(shared.nonEmpty, "rankings share no pairs — probe likely broken")
    shared.foreach { case (a, b) =>
      assert(a == b, f"ADC drifted between faces: $a%.9f vs $b%.9f")
    }
    // cell pruning can only LOSE candidates vs the flat scan; measure
    val prunedSet = pruned.map(r => (r.getLong(0), r.getLong(2))).toSet
    val overlap = (flat.keySet & prunedSet).size.toDouble / flat.size
    info(f"IVF+PQ overlap@3 with flat PQ: $overlap%.2f")
    assert(overlap > 0.0)
  }

  test("source centroids: bit-equal to a driver-computed quantized mean " +
    "for every source; coverage complete") {
    import graft.operators.EmbeddingOps
    val got = EmbeddingOps.sourceCentroids(spark, sf()).collect()
      .map(r => (r.getString(0), r.getInt(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    // ground truth on the driver: same quantization, same division
    val docs = Tables.documents(spark, sf())
      .select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val embs = Tables.embeddings(spark, sf())
      .selectExpr("vec_id", "transform(embedding, x -> cast(x as double)) AS v")
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1))
    val bySrc = embs.groupBy { case (id, _) => docs(id) }
    assert(got.keySet.map(_._1) == bySrc.keySet, "source coverage mismatch")
    // Spark's round() is HALF_UP (away from zero) — math.round would
    // drift by one on negative half-grid values
    def halfUp(x: Double): Long =
      new java.math.BigDecimal(x)
        .setScale(0, java.math.RoundingMode.HALF_UP).longValue
    for ((src, vecs) <- bySrc; dim <- 0 until 64) {
      val sq = vecs.map { case (_, v) => halfUp(v(dim) * 1048576.0) }.sum
      val n = vecs.size.toLong
      val expect = (n, sq, sq.toDouble / (n * 1048576.0))
      assert(got((src, dim)) == expect,
        s"centroid drift at ($src, $dim): got ${got((src, dim))}, want $expect")
    }
  }

  test("bloom decontamination: bit-identical to the exact path, and the " +
    "bloom actually cuts the pre-shuffle postings volume") {
    val exact = TextOps.contamination(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val bloomed = TextOps.contaminationBloom(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(bloomed.sameElements(exact),
      "bloom pre-filter changed the verified result")
    // selectivity: rebuild the same bloom over the same postings artifact
    // and measure the cut directly — the point of the variant is that
    // most clean train postings die BEFORE the shuffle
    val exploded = TextOps.contamPostings(spark, d)
    val evalGrams = exploded.filter(col("is_eval")).select("gram").distinct()
    val bloom = evalGrams.stat.bloomFilter("gram",
      math.max(evalGrams.count(), 1L), 0.01)
    val bc = spark.sparkContext.broadcast(bloom)
    val mc = udf((g: String) => bc.value.mightContainString(g))
    val train = exploded.filter(!col("is_eval"))
    val total = train.count()
    val kept = train.filter(mc(col("gram"))).count()
    info(f"bloom kept $kept of $total train postings (${kept * 100.0 / total}%.1f%%)")
    assert(kept < total, "bloom filtered nothing — no pre-shuffle reduction")
  }

  test("generator: deterministic and fully parseable") {
    val g1 = SignalGen.batch(spark, 500).collect().map(_.getString(0))
    val g2 = SignalGen.batch(spark, 500).collect().map(_.getString(0))
    assert(g1.sameElements(g2))
    val parsed = SignalStream.parse(SignalGen.batch(spark, 500))
    assert(parsed.count() == 500)
    val syms = parsed.select("symbol").distinct().count()
    assert(syms == SignalGen.symbols.size)
  }

  test("parse drops corrupt and schema-violating records (P1)") {
    import spark.implicits._
    val raw = Seq(
      ("""{"symbol":"BTCUSDT","side":"BUY","qty":1.0,"price":2.0,"timeframe":"1m","ts":1000}""", 1L),
      ("""{"symbol":"BTCUSDT","side":"LONG","qty":1.0,"price":2.0,"timeframe":"1m","ts":1000}""", 2L),
      ("""not json at all""", 3L),
      ("""{"symbol":null,"side":"BUY","ts":1000}""", 4L),
      ("""{"symbol":"ETHUSDT","side":"SELL","qty":0.5,"price":9.9,"timeframe":"5m","ts":2000,"extra_unknown_field":42}""", 5L))
      .toDF("value", "seq")
    val p = SignalStream.parse(raw).collect()
    // row 1 (clean) and row 5 (unknown field tolerated) survive
    assert(p.length == 2)
  }

  test("multimodal: mapPartitions decoder agrees with the columnar twin") {
    val viaPartitions = MultimodalOps.decodeFeatures(spark, d)
      .collect().map(f => (f.docId, f.nBytes, f.nFrames, f.feature0, f.fingerprint)).toSet
    val viaColumns = MultimodalOps.mediaMetaQuery(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getString(4))).toSet
    assert(viaPartitions == viaColumns)
  }

  test("multimodal: frame-sampling mapPartitions face agrees with the columnar twin") {
    val viaPartitions = MultimodalOps.sampleFrames(spark, d)
      .collect().map(f => (f.docId, f.frameIdx, f.frameBytes, f.frameMd5)).toSet
    val viaColumns = MultimodalOps.frameSampleQuery(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSet
    assert(viaPartitions == viaColumns)
    // sampling bites: some doc must contribute a frame beyond index 0
    assert(viaPartitions.exists(_._2 > 0), "no doc long enough to sample a 2nd frame")
  }

  test("key-skew report: top-10 descending, shares and skew factor match " +
    "a driver recompute over the full key histogram") {
    val rows = Relational.eventsKeySkew(spark, sf()).collect()
    assert(rows.length == 10)
    val counts = Tables.events(spark, sf()).groupBy("user_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val nRows = counts.values.sum
    val maxCnt = counts.values.max
    val expectTop = counts.toSeq.sortBy { case (k, c) => (-c, k) }.take(10)
    rows.zipWithIndex.foreach { case (r, i) =>
      assert(r.getLong(0) == i + 1L)
      assert((r.getLong(1), r.getLong(2)) == expectTop(i), s"rank ${i + 1}")
      assert(r.getDouble(3) == r.getLong(2).toDouble / nRows)
      assert(r.getLong(4) == counts.size.toLong && r.getLong(5) == nRows
        && r.getLong(6) == maxCnt)
      assert(r.getDouble(7) == (maxCnt * counts.size).toDouble / nRows)
    }
    // max-to-mean ratio is >= 1 by construction
    assert(rows.head.getDouble(7) >= 1.0)
  }

  test("length histogram: per-source shares sum to 1, doc mass conserves, " +
    "and every document's token count falls inside its bucket bounds") {
    val h = TextOps.lengthHistogram(spark, sf()).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
    val docs = Tables.documents(spark, sf())
      .select(col("source"), size(split(col("text"), " ")).cast("long").as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(h.map(_._5).sum == docs.length, "doc mass must conserve")
    h.groupBy(_._1).foreach { case (src, rows) =>
      assert(math.abs(rows.map(_._6).sum - 1.0) < 1e-9, s"$src shares")
    }
    // bucket bounds: recompute each doc's bucket and check containment
    val byBucket = docs.groupBy { case (s, n) =>
      (s, 63L - java.lang.Long.numberOfLeadingZeros(n))
    }.map { case (k, v) => k -> v.size.toLong }
    assert(h.map(t => (t._1, t._2) -> t._5).toMap == byBucket)
    h.foreach { case (_, b, lo, hi, _, _) =>
      assert(lo == (1L << b) && hi == (1L << (b + 1)) - 1)
    }
  }
}
