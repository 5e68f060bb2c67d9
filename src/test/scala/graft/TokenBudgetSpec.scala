package graft

import graft.operators.TextOps
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Laws for the token-budget corpus fill (`doc_token_budget`):
  *
  *  1. EQUIVALENCE — the scale-shaped two-level form (coarse-bucket
  *     prefix cut + one boundary-bucket window) returns exactly the
  *     naive one-level prefix (a single cumulative window per source),
  *     the form the DuckDB oracle runs. This is the load-bearing law:
  *     it is what lets the oracle check the scalable plan.
  *  2. BUDGET — kept tokens per source never exceed the source's share,
  *     and the cut is TIGHT: unless a source kept every document, the
  *     next document in the deterministic order would overflow.
  *  3. DETERMINISM — the kept set is a pure function of the data:
  *     repartitioning the input changes nothing.
  */
class TokenBudgetSpec extends SparkSpec {

  import spark.implicits._

  private def docs = Tables.documentsPar(spark, sf("sf0.01"))

  /** The naive reference: one window per source over every doc. */
  private def naive(budgetDenom: Long) = {
    val d = docs
      .withColumn("n_tokens", size(TextOps.tokens).cast("long"))
      .withColumn("h", conv(substring(md5(concat(col("doc_id").cast("string"),
        lit("#tb")).cast("binary")), 1, 7), 16, 10).cast("long"))
      .withColumn("c", col("h") % TextOps.TokenBudgetBuckets)
      .select("doc_id", "source", "n_tokens", "h", "c")
    val bySrc = d.groupBy("source").agg(sum(col("n_tokens")).as("src_tokens"))
      .withColumn("q",
        round(sqrt(col("src_tokens").cast("double")) * lit(1048576.0))
          .cast("long"))
    val wAll = Window.partitionBy().rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    val shares = bySrc
      .withColumn("sum_q", sum(col("q")).over(wAll))
      .withColumn("all_tokens", sum(col("src_tokens")).over(wAll))
      .withColumn("src_share",
        expr(s"(cast(all_tokens div $budgetDenom as decimal(38,0)) * q)" +
          " div sum_q"))
      .select("source", "src_share")
    val w = Window.partitionBy("source")
      .orderBy(col("c"), col("h"), col("doc_id"))
    d.join(broadcast(shares), "source")
      .withColumn("cum", sum(col("n_tokens")).over(w))
  }

  private def asSet(df: org.apache.spark.sql.DataFrame): Set[(Long, String, Long, Long)] =
    df.select("doc_id", "source", "n_tokens", "src_share").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSet

  test("two-level fill == naive one-level prefix, at the default and a " +
    "tighter budget") {
    for (denom <- Seq(4L, 10L)) {
      val twoLevel = asSet(TextOps.tokenBudgetFrame(docs, budgetDenom = denom))
      val ref = asSet(naive(denom).filter(col("cum") <= col("src_share")))
      assert(twoLevel == ref,
        s"two-level diverged from the naive prefix at denom=$denom: " +
          s"only2=${(twoLevel -- ref).take(5)} onlyRef=${(ref -- twoLevel).take(5)}")
    }
  }

  test("budget law: kept tokens <= share per source, and the cut is tight") {
    val all = naive(4L).cache()
    try {
      val kept = all.filter(col("cum") <= col("src_share"))
      val overBudget = kept.groupBy("source")
        .agg(sum("n_tokens").as("kept"), first("src_share").as("share"))
        .filter(col("kept") > col("share"))
      assert(overBudget.isEmpty, "a source exceeded its token share")
      // tight: the first excluded doc per source overflows the share
      // by construction of the prefix (cum > share there)
      val firstExcluded = all.filter(col("cum") > col("src_share"))
        .groupBy("source").agg(min("cum").as("first_over"),
          first("src_share").as("share"))
      assert(firstExcluded.filter(col("first_over") <= col("share")).isEmpty)
      // and the fill is non-trivial: every source kept something and
      // dropped something at the quarter budget
      val srcs = docs.select("source").distinct().count()
      assert(kept.select("source").distinct().count() == srcs)
      assert(firstExcluded.count() == srcs)
    } finally { all.unpersist(); () }
  }

  test("share arithmetic is exact past the 63-bit product range: " +
    "decimal(38,0) carries corpus sizes where the BIGINT form wraps") {
    // ~1.2e9-token single-source corpus: B = 3e8, q ~ 3.63e10 —
    // B*q ~ 1.09e19 > Long.MaxValue. The decimal path must produce the
    // exact integral share, not a wrapped negative.
    val r = spark.sql(
      "SELECT (cast(cast(1200000000 as bigint) div 4 as decimal(38,0))" +
        " * 36318211072) div 36318211072 AS s").head()
    assert(r.getLong(0) == 300000000L,
      s"decimal share arithmetic broke: ${r.getLong(0)}")
  }

  test("determinism: repartitioned input yields the identical kept set") {
    val base = asSet(TextOps.tokenBudgetFrame(docs))
    val shuffled = asSet(TextOps.tokenBudgetFrame(docs.repartition(13)))
    assert(base == shuffled, "kept set depends on physical partitioning")
  }

  test("scale shape: no window ever runs over the full corpus — the " +
    "only per-doc window sees the boundary buckets' docs") {
    val df = TextOps.tokenBudgetFrame(docs)
    val p = df.queryExecution.executedPlan.toString
    // no cartesian or nested-loop join anywhere — every doc-level join
    // is a broadcast HASH join on (source[, c])
    assert(!p.contains("CartesianProduct"), p.take(2000))
    assert(!p.contains("BroadcastNestedLoopJoin"),
      s"doc-level join fell back to a nested loop:\n${p.take(3000)}")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    // the per-doc (fine) window is partitioned by (source, c) — the
    // boundary bucket — never by source alone over doc rows (the Window
    // node emits the sum as _weN; fine_cum = pre + _weN in a Project, so
    // the pin matches the windowspecdefinition signature: partition
    // (source, c), order (h, doc_id))
    assert("windowspecdefinition\\(source#\\d+, c#\\d+L, h#\\d+L ASC".r
      .findFirstIn(p).isDefined,
      s"boundary-bucket fine window missing:\n${p.take(3000)}")
    // and NO window partitions by source alone over doc rows ordered by
    // hash — that would be the naive full-corpus form
    assert("windowspecdefinition\\(source#\\d+, h#\\d+L ASC".r
      .findFirstIn(p).isEmpty,
      s"full-corpus window found:\n${p.take(3000)}")
  }
}
