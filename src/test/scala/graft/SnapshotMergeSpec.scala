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

  test("scd2: version/interval laws — contiguous versions, one open row " +
    "per key, intervals chain, change suppression real") {
    val h = CdcRoute.scd2History(spark, sf()).cache()
    val perKey = h.groupBy("user_id").agg(
      count(lit(1)).as("n"), min("version").as("lo"), max("version").as("hi"),
      sum(col("is_current").cast("long")).as("open"),
      sum("n_events").as("ev"))
    assert(perKey.filter(col("lo") =!= 1 || col("hi") =!= col("n")).isEmpty,
      "versions not dense 1..k")
    assert(perKey.filter(col("open") =!= 1).isEmpty,
      "a key must have exactly one open (is_current) version")
    // per-key event totals conserve: every event lands in exactly one run
    val evCounts = Tables.events(spark, sf())
      .groupBy("user_id").agg(count(lit(1)).as("n_raw"))
    assert(perKey.join(evCounts, "user_id")
      .filter(col("ev") =!= col("n_raw")).isEmpty,
      "per-key n_events must sum to the key's raw event count")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("version")
    val chained = h
      .withColumn("p_state", lag("state", 1).over(w))
      .withColumn("p_to", lag("valid_to_ms", 1).over(w))
    assert(chained.filter(col("p_state").isNotNull &&
      col("p_state") === col("state")).isEmpty,
      "consecutive versions share a state — change suppression failed")
    assert(chained.filter(col("p_to").isNotNull &&
      col("p_to") =!= col("valid_from_ms")).isEmpty,
      "valid_to of version v must equal valid_from of v+1")
    assert(h.filter(col("valid_to_ms").isNotNull &&
      col("valid_to_ms") <= col("valid_from_ms")).isEmpty,
      "closed interval must be non-empty")
    h.unpersist()
  }

  test("scd2 as-of: exactly one version per key existing at T, and it " +
    "is the history row whose interval contains T") {
    val asof = CdcRoute.scd2AsOf(spark, sf()).cache()
    assert(asof.groupBy("user_id").count().filter(col("count") =!= 1).isEmpty,
      "as-of must yield exactly one version per key")
    val t = asof.select("as_of_ms").head().getLong(0)
    val hist = CdcRoute.scd2History(spark, sf())
      .filter(col("valid_from_ms") <= t &&
        (col("valid_to_ms").isNull || lit(t) < col("valid_to_ms")))
      .select("user_id", "version", "state")
    val got = asof.select("user_id", "version", "state")
    assert(got.exceptAll(hist).isEmpty && hist.exceptAll(got).isEmpty,
      "as-of result diverges from filtering the history at T")
    asof.unpersist()
  }

  test("scd2: matches an independent per-key driver fold") {
    val rows = Tables.events(spark, sf())
      .select(col("user_id"), col("event_type"),
        unix_millis(col("ts")).as("ts_ms"), col("event_id"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    // independent reference: imperative run-length fold per key
    val expected = rows.groupBy(_._1).flatMap { case (uid, evs) =>
      val sorted = evs.sortBy(e => (e._3, e._4))
      val runs = scala.collection.mutable.ArrayBuffer
        .empty[(String, Long, Long)] // state, valid_from, n
      sorted.foreach { case (_, tpe, ts, _) =>
        if (runs.isEmpty || runs.last._1 != tpe) runs += ((tpe, ts, 1L))
        else { val l = runs.last; runs(runs.size - 1) = (l._1, l._2, l._3 + 1) }
      }
      runs.zipWithIndex.map { case ((state, from, n), i) =>
        val to = if (i + 1 < runs.size) Some(runs(i + 1)._2) else None
        (uid, i + 1L, state, from, to, n, to.isEmpty)
      }
    }.toSet
    val got = CdcRoute.scd2History(spark, sf())
      .select("user_id", "version", "state", "valid_from_ms", "valid_to_ms",
        "n_events", "is_current")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getLong(4)), r.getLong(5),
        r.getBoolean(6)))
      .toSet
    assert(got == expected,
      s"scd2 mismatch: extra=${(got -- expected).take(3)} " +
        s"missing=${(expected -- got).take(3)}")
  }
}
