package graft

import graft.operators.TextOps
import org.apache.spark.sql.functions._

/** Repetition signals and the composed curation decision. */
class CurationSpec extends SparkSpec {

  test("repetition: crafted doc yields exact counts; ratios stay in range") {
    import spark.implicits._
    // "a b a b a b": trigrams (a b a)(b a b)(a b a)(b a b) → total 4,
    // distinct 2, top count 2 → dup_ratio 0.5, top_gram_frac 0.5
    val one = Seq((1L, "en", "a b a b a b")).toDF("doc_id", "lang", "text")
      .withColumn("toks", split(col("text"), " "))
      .select(col("doc_id"), explode(TextOps.wordTrigramsAll(col("toks"))).as("gram"))
      .groupBy("doc_id", "gram").agg(count(lit(1)).as("cnt"))
      .groupBy("doc_id").agg(sum("cnt").as("total"), count(lit(1)).as("dist"),
        max("cnt").as("top"))
      .head()
    assert((one.getLong(1), one.getLong(2), one.getLong(3)) == (4L, 2L, 2L))

    val r = TextOps.repetition(spark, sf()).collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      val (total, dist, top) = (row.getLong(1), row.getLong(2), row.getLong(3))
      val (dup, frac) = (row.getDouble(4), row.getDouble(5))
      assert(dist >= 1 && dist <= total && top >= 1 && top <= total)
      assert(dup >= 0.0 && dup < 1.0 && frac > 0.0 && frac <= 1.0)
      assert(math.abs(dup - (1.0 - dist.toDouble / total)) == 0.0)
    }
  }

  test("normalized dedup: case/punct variants collapse to one fingerprint; " +
    "keeper invariants hold") {
    import spark.implicits._
    val norm = trim(regexp_replace(
      regexp_replace(lower(col("text")), "[^a-z0-9 ]", ""), " +", " "))
    val got = Seq("Hello,  World!", "hello world", "HELLO-WORLD?", "different")
      .toDF("text").select(norm.as("n")).collect().map(_.getString(0))
    assert(got(0) == "hello world" && got(1) == "hello world",
      "case + punctuation + space-run variants must normalize equal")
    assert(got(2) == "helloworld", "stripped separator joins the words")
    assert(got(3) == "different")
    val r = TextOps.dedupNormalized(spark, sf()).collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      assert(row.getLong(3) <= row.getLong(0), "keeper is the min doc_id")
      assert(row.getBoolean(4) == (row.getLong(0) != row.getLong(3)))
    }
  }

  test("gopher rules: formula exact on a crafted doc; conjunction law " +
    "holds corpus-wide and the gate bites both ways") {
    import spark.implicits._
    // "ab cde the the" → 4 words, chars 14, mean_wl (14-4+1)/4 = 2.75,
    // all words alphabetic, 2 stop hits → fails mean_wl ∈ [3,10] only
    val one = TextOps.gopherRulesFrame(
      Seq((1L, "en", "ab cde the the")).toDF("doc_id", "lang", "text")).head()
    assert(one.getLong(1) == 4L && one.getDouble(2) == 2.75 &&
      one.getDouble(3) == 1.0 && one.getLong(4) == 2L && !one.getBoolean(5),
      s"crafted gopher signals wrong: $one")

    val r = TextOps.gopherRules(spark, sf()).collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      val expect = row.getLong(1) >= 40L && row.getLong(1) <= 100000L &&
        row.getDouble(2) >= 3.0 && row.getDouble(2) <= 10.0 &&
        row.getDouble(3) >= 0.8 && row.getLong(4) >= 2L
      assert(row.getBoolean(5) == expect, s"pass drift at doc ${row.getLong(0)}")
    }
    assert(r.exists(_.getBoolean(5)) && r.exists(!_.getBoolean(5)),
      "gopher gate must keep some docs and drop some docs on this corpus")
  }

  test("mix sample: temperature flattening up-samples small sources; " +
    "the draw is deterministic and bucket-thresholded") {
    import spark.implicits._
    // skewed corpus: big source 300 docs, small source 30
    val docs = ((0 until 300).map(i => (i.toLong, "en", s"t $i", "big")) ++
      (0 until 30).map(i => (1000L + i, "en", s"t $i", "small")))
      .toDF("doc_id", "lang", "text", "source")
    val kept = TextOps.mixSampleFrame(docs).collect()
    val thr = kept.map(r => (r.getString(1), r.getLong(3))).toMap
    // alpha=0.5: acceptance rate ∝ 1/sqrt(n_src) → the small source's
    // threshold must be strictly higher (up-sampled relative to share)
    assert(thr.keySet == Set("big", "small"), s"sources missing from draw: $thr")
    assert(thr("small") > thr("big"),
      s"temperature flattening inverted: $thr")
    // every kept row obeys its threshold; replay is bit-identical
    kept.foreach(r => assert(r.getLong(4) < r.getLong(3)))
    val again = TextOps.mixSampleFrame(docs).collect()
    assert(kept.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq,
      "mixture draw must replay identically")
    // the global budget holds in expectation: kept ≲ 30% + slack
    assert(kept.length <= (330 * 0.3 * 1.5).toInt,
      s"kept ${kept.length} of 330 — budget not enforced")
    // temperature law across the knob: alpha=1 is proportional (rate
    // T/N identical for every source → equal thresholds), alpha=0 is
    // uniform-over-sources (small source's threshold grows ∝ n_big/n_small,
    // stronger than sqrt's flattening)
    def thrs(alpha: Double) = TextOps.mixSampleFrame(docs, alpha = alpha)
      .select("source", "thr").distinct().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val t1 = thrs(1.0)
    assert(t1("big") == t1("small"), s"alpha=1 must be proportional: $t1")
    val t0 = thrs(0.0)
    assert(t0("small") > thr("small") && thr("small") > t1("small"),
      s"flattening must increase monotonically as alpha drops: " +
        s"a0=${t0("small")} a05=${thr("small")} a1=${t1("small")}")
  }

  test("training set: selection is exactly the conjunction of the four " +
    "gates, every gate bites, and the release is non-empty") {
    val r = TextOps.trainingSet(spark, sf()).collect()
    assert(r.length == 500, "one audit row per document")
    r.foreach { row =>
      val expect = row.getBoolean(2) && row.getBoolean(3) &&
        row.getDouble(4) <= 0.5 && row.getBoolean(5)
      assert(row.getBoolean(6) == expect, s"selection drift at ${row.getLong(0)}")
    }
    val selected = r.filter(_.getBoolean(6))
    assert(selected.nonEmpty, "empty release — gates over-tightened")
    assert(selected.length < r.length, "vacuous release — nothing filtered")
    // each gate individually excludes at least one doc that the other
    // gates would admit is too strong for a synthetic corpus; assert
    // the weaker per-gate law: every gate fails somewhere
    assert(r.exists(!_.getBoolean(2)) && r.exists(!_.getBoolean(3)) &&
      r.exists(_.getDouble(4) > 0.5) && r.exists(!_.getBoolean(5)),
      "a gate never fired on this corpus")
  }

  test("shard shuffle: a reproducible permutation — contiguous ranks per " +
    "shard, every doc exactly once, and genuinely not doc_id order") {
    val out = TextOps.shardShuffle(spark, sf())
    val n = Tables.documentsPar(spark, sf()).count()
    assert(out.count() == n, "not a permutation: row count drifted")
    assert(out.select("doc_id").distinct().count() == n, "doc duplicated")
    // ranks are 1..count(shard), no gaps: max == count per shard
    val bad = out.groupBy("shard")
      .agg(max("rank").as("mx"), count(lit(1)).as("c"))
      .filter(col("mx") =!= col("c")).count()
    assert(bad == 0, "rank gaps inside a shard")
    // the within-shard order must differ from plain doc_id order (the
    // whole point); probability of accidental agreement ~ 1/(k!)
    val firstShard = out.filter(col("shard") === 0).orderBy("rank")
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(firstShard != firstShard.sorted, "shuffle left doc_id order intact")
    // reproducible: a second build is bit-identical
    val again = TextOps.shardShuffle(spark, sf()).collect().toSeq
    assert(out.collect().toSeq == again, "shuffle not deterministic")
  }

  test("curate: keep is exactly the conjunction of its five signals; " +
    "no eval-bucket doc is ever kept") {
    val c = TextOps.curate(spark, sf()).collect()
    assert(c.nonEmpty)
    c.foreach { row =>
      val expect = row.getDouble(1) >= 0.5 && row.getBoolean(2) &&
        !row.getBoolean(3) && !row.getBoolean(4) && !row.getBoolean(5)
      assert(row.getBoolean(6) == expect, s"keep drift at doc ${row.getLong(0)}")
    }
    // the contaminated flag marks exactly the contamination query's docs
    val flagged = c.filter(_.getBoolean(4)).map(_.getLong(0)).toSet
    val contam = TextOps.contamination(spark, sf())
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(flagged == contam)
    // the held-out split itself must never enter the training keep-set
    // (r4 advice: contamination only flags train-side docs, so without
    // the is_eval predicate eval docs flow into the corpus)
    val evals = c.filter(_.getBoolean(5))
    assert(evals.nonEmpty, "eval bucket empty — split key drifted")
    assert(evals.forall(!_.getBoolean(6)), "an eval-bucket doc was kept")
    // at least one doc is kept and at least one dropped (decision bites)
    assert(c.exists(_.getBoolean(6)) && c.exists(!_.getBoolean(6)))
  }

  test("ppl buckets: balanced rank terciles per language, labels follow " +
    "the tercile, and every head doc outscores every tail doc in-language") {
    val b = TextOps.pplBuckets(spark, sf()).cache()
    // tercile sizes within a language differ by at most 1 (ntile law)
    val sizes = b.groupBy("lang", "tercile").count()
      .groupBy("lang").agg(max("count").as("mx"), min("count").as("mn"),
        countDistinct("tercile").as("nt"))
    assert(sizes.filter(col("mx") - col("mn") > 1).isEmpty,
      "tercile sizes unbalanced within a language")
    assert(sizes.filter(col("nt") =!= 3).isEmpty,
      "a language is missing a tercile at this SF")
    assert(b.filter(
      (col("tercile") === 1 && col("bucket") =!= "head") ||
        (col("tercile") === 2 && col("bucket") =!= "middle") ||
        (col("tercile") === 3 && col("bucket") =!= "tail")).isEmpty,
      "bucket label does not follow the tercile")
    // rank semantics: min head score >= max tail score per language
    val agg = b.groupBy("lang").agg(
      min(when(col("bucket") === "head", col("lm_score"))).as("h_min"),
      max(when(col("bucket") === "tail", col("lm_score"))).as("t_max"))
    assert(agg.filter(col("h_min") < col("t_max")).isEmpty,
      "a tail doc outscores a head doc within its language")
    b.unpersist()
  }
}
