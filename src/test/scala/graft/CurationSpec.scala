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
}
