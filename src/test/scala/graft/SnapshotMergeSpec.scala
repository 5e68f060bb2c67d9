package graft

import graft.operators.{CdcRoute, TextOps}
import org.apache.spark.sql.functions._

/** Invariants of the two corpus/CDC analysis queries added this cycle —
  * the DuckDB oracle pins exact values; these pin the semantic laws the
  * oracle compare can't articulate (and would hold on ANY input).
  */
class SnapshotMergeSpec extends SparkSpec {

  // NOT cached: the shared session's CacheManager would substitute the
  // cached plan into PlanShapeSpec's identical frame and break its
  // exchange-count pin (test-order dependence); sf0.001 recomputes in ms
  private def merged = CdcRoute.snapshotMerge(spark, sf())

  test("snapshotMerge: every merge outcome occurs, keys unique, " +
    "status law holds") {
    val statuses = merged.groupBy("row_status").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // even-keyed snapshot + full event key range → all three genuinely
    // occur (the even/odd restriction exists exactly for this)
    assert(Set("inserted", "unchanged", "updated").subsetOf(statuses.keySet),
      s"missing merge outcome in $statuses")
    assert(merged.groupBy("merge_key").count().filter(col("count") > 1).isEmpty,
      "merge emitted a duplicate key")
    // status ⟺ side-presence laws
    assert(merged.filter(col("row_status") === "unchanged" &&
      col("n_events") =!= 0L).isEmpty, "unchanged row with events")
    assert(merged.filter(col("row_status") =!= "unchanged" &&
      col("n_events") === 0L).isEmpty, "changed row without events")
    assert(merged.filter(col("row_status") === "inserted" &&
      col("c_name").isNotNull).isEmpty, "inserted row carries base fields")
    assert(merged.filter(col("row_status") =!= "inserted" &&
      (col("merge_key") % 2 =!= 0)).isEmpty, "odd key claims a base row")
  }

  test("snapshotMerge: latest-wins — the merged state is the max-ts " +
    "event of every key with events") {
    val ev = Tables.events(spark, sf())
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_millis(col("ts")).as("ts_ms"))
    val expected = ev
      .groupBy("user_id")
      .agg(max(struct(col("ts_ms"), col("event_id"), col("event_type")))
        .as("top"), count(lit(1)).as("n"))
      .select(col("user_id"), col("top.ts_ms").as("e_ts"),
        col("top.event_type").as("e_type"), col("n"))
    val got = merged.filter(col("n_events") > 0)
      .select(col("merge_key"), col("last_ts_ms"), col("last_event_type"),
        col("n_events"))
    val bad = got.join(expected, got("merge_key") === expected("user_id"))
      .filter(col("last_ts_ms") =!= col("e_ts") ||
        col("last_event_type") =!= col("e_type") ||
        col("n_events") =!= col("n"))
    assert(bad.isEmpty, s"latest-wins violated: ${bad.head(3).mkString("; ")}")
    assert(got.count() == expected.count(), "a keyed change batch row vanished")
  }

  test("pack: every training row is exactly full except each shard's " +
    "last; row tokens sum to the shard's stream; rows are contiguous") {
    val L = TextOps.PackLen
    val p = TextOps.pack(spark, sf()).cache()
    val lastPerShard = p.groupBy("shard").agg(max("seq_idx").as("last_idx"))
    val short = p.join(lastPerShard, "shard")
      .filter(col("seq_idx") =!= col("last_idx") && col("n_tokens") =!= L)
    assert(short.isEmpty, "a non-final training row is not exactly full")
    assert(p.filter(col("n_tokens") > L || col("n_tokens") <= 0).isEmpty)
    // conservation: per shard, sum of row tokens = total tokens of its docs
    val fromRows = p.groupBy("shard").agg(sum("n_tokens").as("t"))
    val fromDocs = Tables.documents(spark, sf())
      .withColumn("shard", TextOps.sampleBucket)
      .withColumn("n", size(TextOps.tokens).cast("long"))
      .groupBy("shard").agg(sum("n").as("t2"))
    assert(fromRows.join(fromDocs, "shard").filter(col("t") =!= col("t2")).isEmpty,
      "token stream not conserved through packing")
    // contiguity: seq_idx per shard is dense 0..last
    val dense = p.groupBy("shard").agg(
      count(lit(1)).as("n"), min("seq_idx").as("lo"), max("seq_idx").as("hi"))
    assert(dense.filter(col("lo") =!= 0L || col("hi") =!= col("n") - 1).isEmpty,
      "training rows are not contiguous per shard")
    p.unpersist()
  }

  test("tfidf: at most 3 terms per doc, ranks dense from 1, score law " +
    "score = tf/df, rank ordering matches (score desc, token)") {
    val t = TextOps.tfidf(spark, sf()).cache()
    val perDoc = t.groupBy("doc_id").agg(
      count(lit(1)).as("n"), min("term_rank").as("lo"), max("term_rank").as("hi"))
    assert(perDoc.filter(col("n") > 3 || col("lo") =!= 1 ||
      col("hi") =!= col("n")).isEmpty, "rank set not dense 1..n≤3")
    assert(t.filter(col("score") =!=
      col("tf").cast("double") / col("df")).isEmpty, "score ≠ tf/df")
    // within a doc, rank order must follow (score desc, token asc)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("term_rank")
    val mis = t.withColumn("p_score", lag("score", 1).over(w))
      .withColumn("p_token", lag("token", 1).over(w))
      .filter(col("p_score").isNotNull &&
        (col("p_score") < col("score") ||
          (col("p_score") === col("score") && col("p_token") >= col("token"))))
    assert(mis.isEmpty, "rank ordering violates (score desc, token asc)")
    t.unpersist()
  }
}
