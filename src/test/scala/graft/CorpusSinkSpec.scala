package graft

import graft.sources.CorpusSink
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Partitioned-parquet write path: layout, file-count bound, round-trip,
  * and partition pruning on the read side. */
class CorpusSinkSpec extends SparkSpec {

  test("partitioned write: one dir per lang, bounded files, lossless round-trip") {
    val out = Files.createTempDirectory("corpus").toString + "/docs"
    val docs = Tables.documents(spark, sf())
    CorpusSink.writePartitioned(docs, out, "lang", filesPerPart = 2)

    val dirs = Files.list(Paths.get(out)).iterator().asScala
      .map(_.getFileName.toString).filter(_.startsWith("lang=")).toSeq.sorted
    assert(dirs == Seq("lang=de", "lang=en", "lang=es", "lang=fr", "lang=zh"))

    // file-count bound: ≤ filesPerPart data files per partition value
    for (d <- dirs) {
      val files = Files.list(Paths.get(out, d)).iterator().asScala
        .map(_.getFileName.toString).filter(_.endsWith(".parquet")).toSeq
      assert(files.nonEmpty && files.size <= 2,
        s"$d has ${files.size} files — writer fan-out not bounded")
    }

    val back = spark.read.parquet(out)
    assert(back.count() == docs.count())
    val a = docs.select("doc_id", "lang", "text").collect().map(_.toSeq).toSet
    val b = back.select("doc_id", "lang", "text").collect().map(_.toSeq).toSet
    assert(a == b, "round-trip lost or altered rows")
  }

  test("range layout: files carry disjoint key ranges, filter reaches the scan") {
    import org.apache.spark.sql.functions._
    val out = Files.createTempDirectory("range").toString + "/events"
    val e = Tables.events(spark, sf()).withColumn("ts_ms", unix_millis(col("ts")))
      .select("event_id", "user_id", "ts_ms", "event_type", "value")
    CorpusSink.writeRangeLayout(e, out, "ts_ms", nFiles = 4)

    // per-file min/max must be pairwise disjoint — the property parquet
    // footer stats turn into whole-file skipping
    val files = Files.list(Paths.get(out)).iterator().asScala
      .map(_.toString).filter(_.endsWith(".parquet")).toSeq
    assert(files.size >= 3, s"expected >=3 range files, got ${files.size}")
    val ranges = files.map { f =>
      val r = spark.read.parquet(f).agg(min("ts_ms"), max("ts_ms")).head()
      (r.getLong(0), r.getLong(1))
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Seq((_, hi), (lo2, _)) =>
        assert(hi <= lo2, s"overlapping file ranges: $ranges")
      case _ =>
    }

    // the time predicate must be pushed to the scan (footer-stats skipping)
    val mid = ranges.head._2
    val q = spark.read.parquet(out).filter(col("ts_ms") <= mid)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(ts_ms), LessThanOrEqual(ts_ms"),
      s"ts filter not pushed:\n$plan")
    assert(q.count() == e.filter(col("ts_ms") <= mid).count())
  }

  test("read side prunes partitions at the directory level") {
    val out = Files.createTempDirectory("corpus2").toString + "/docs"
    CorpusSink.writePartitioned(Tables.documents(spark, sf()), out, "lang")
    val one = CorpusSink.readPartition(spark, out, "lang", "de")
    val plan = one.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(lang"),
      s"lang filter must prune partitions, not scan+filter:\n$plan")
    assert(one.count() ==
      Tables.documents(spark, sf()).filter("lang = 'de'").count())
  }
}
