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

  test("z-order layout: per-file spans tighten on BOTH dimensions vs a " +
    "single-key range layout; nothing lost") {
    import org.apache.spark.sql.functions._
    val base = Files.createTempDirectory("zorder").toString
    val e = Tables.events(spark, sf("sf0.01"))
      .withColumn("ts_ms", unix_millis(col("ts")))
      .select("event_id", "user_id", "ts_ms", "value")
    def fileSpans(path: String, c: String): Seq[Double] =
      Files.list(Paths.get(path)).iterator().asScala.map(_.toString)
        .filter(_.endsWith(".parquet")).toSeq.map { f =>
          val r = spark.read.parquet(f)
            .agg(min(col(c)).cast("double"), max(col(c)).cast("double")).head()
          r.getDouble(1) - r.getDouble(0)
        }
    val g = e.agg(
      (max("user_id") - min("user_id")).cast("double"),
      (max("value") - min("value")).cast("double")).head()
    val (guid, gval) = (g.getDouble(0), g.getDouble(1))

    // baseline: range layout on user_id only — value spans stay global
    CorpusSink.writeRangeLayout(e, s"$base/range", "user_id", nFiles = 16)
    // z-order on (user_id, value) — both spans must tighten
    CorpusSink.writeZOrder(e, s"$base/z", "user_id", "value", nFiles = 16)

    val zU = fileSpans(s"$base/z", "user_id").sum / 16 / guid
    val zV = fileSpans(s"$base/z", "value").sum / 16 / gval
    val rV = fileSpans(s"$base/range", "value").sum / 16 / gval
    assert(zU < 0.5, s"z-order user_id spans not tight: $zU of global")
    assert(zV < 0.5, s"z-order value spans not tight: $zV of global")
    // vs the single-key baseline the second dimension must tighten
    // MATERIALLY (the baseline's spans sit near the sampled-subset max,
    // ~0.67 here on the heavy-tailed value column)
    assert(zV < rV * 0.6,
      s"z-order value spans ($zV) not materially tighter than single-key layout ($rV)")
    // nothing lost, nothing duplicated
    assert(spark.read.parquet(s"$base/z").count() == e.count())
    assert(spark.read.parquet(s"$base/z").exceptAll(e).isEmpty)
  }

  test("quantile z-order: equi-populated bins keep tightening a " +
    "heavy-tailed key where linear bins collapse") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val base = Files.createTempDirectory("zq").toString
    // c2: independent of c1 (hash-scrambled) and heavily skewed — the
    // 4th power packs ~84% of rows into the lowest 1/16 of the range,
    // so linear binning puts almost everything in a few bins and the
    // interleave degenerates toward a c1-only sort
    val n = 4000
    val df = (0 until n).map { i =>
      val u = ((i * 2654435761L) % n).toDouble / n
      (i.toDouble, math.pow(u, 4) * 1000.0)
    }.toDF("c1", "c2")
    CorpusSink.writeZOrder(df, s"$base/lin", "c1", "c2", nFiles = 16)
    CorpusSink.writeZOrderQuantile(df, s"$base/q", "c1", "c2", nFiles = 16)

    def ranges(path: String, c: String): Seq[(Double, Double)] =
      Files.list(Paths.get(path)).iterator().asScala
        .map(_.toString).filter(_.endsWith(".parquet")).toSeq.map { f =>
          val r = spark.read.parquet(f)
            .agg(min(col(c)).cast("double"), max(col(c)).cast("double")).head()
          (r.getDouble(0), r.getDouble(1))
        }
    // the metric that matters: how many files must a SELECTIVE query on
    // the dense region open (footer min/max overlap)? Linear bins put
    // the whole dense region in bin ~0, so every c1-tile file contains
    // dense rows and the predicate prunes nothing; quantile bins spread
    // the dense rows across the c2 bin axis, confining the predicate to
    // the low-c2 tiles.
    val t = math.pow(0.1, 4) * 1000.0 // the exact 10th percentile of c2
    val linOpen = ranges(s"$base/lin", "c2").count(_._1 <= t)
    val qOpen = ranges(s"$base/q", "c2").count(_._1 <= t)
    assert(linOpen >= 12,
      s"scale check broken: linear layout should barely prune ($linOpen/16 open)")
    // dense rows live in the lowest b2-quarter → 4 of 16 tiles, plus
    // range-partition straddle at tile edges: at most half the files
    assert(qOpen <= 8,
      s"quantile layout must confine the dense predicate: $qOpen/16 open vs $linOpen/16")
    // the uniform key must still tile too (the interleave is intact)
    val c1Spans = ranges(s"$base/q", "c1").map(r => r._2 - r._1)
    assert(c1Spans.sum / c1Spans.size < n * 0.5,
      s"uniform key stopped tiling under quantile bins")
    // lossless
    assert(spark.read.parquet(s"$base/q").count() == n)
    assert(spark.read.parquet(s"$base/q").exceptAll(df).isEmpty)
  }

  test("z-order: wide bit widths stay in long arithmetic; empty frames " +
    "and out-of-range widths are guarded") {
    import org.apache.spark.sql.functions._
    val base = Files.createTempDirectory("zedge").toString
    val e = Tables.events(spark, sf("sf0.001"))
      .withColumn("ts_ms", unix_millis(col("ts")))
      .select("event_id", "user_id", "ts_ms", "value")
    // bits=20: interleaved shifts reach 39 — would wrap negative in int
    // arithmetic and scramble the tiling (advice r4). Long path must
    // still produce a lossless, tiled layout.
    CorpusSink.writeZOrder(e, s"$base/wide", "user_id", "value",
      nFiles = 8, bits = 20)
    assert(spark.read.parquet(s"$base/wide").count() == e.count())
    assert(spark.read.parquet(s"$base/wide").exceptAll(e).isEmpty)
    // and the curve actually tiles (a scrambled key would leave the
    // first dimension's per-file spans near-global)
    val g = e.agg((max("user_id") - min("user_id")).cast("double")).head().getDouble(0)
    val spans = Files.list(Paths.get(s"$base/wide")).iterator().asScala
      .map(_.toString).filter(_.endsWith(".parquet")).toSeq.map { f =>
        val r = spark.read.parquet(f)
          .agg(min(col("user_id")).cast("double"), max(col("user_id")).cast("double"))
          .head()
        r.getDouble(1) - r.getDouble(0)
      }
    assert(spans.sum / spans.size / g < 0.6,
      s"bits=20 z-order did not tile user_id: ${spans.sum / spans.size / g}")

    // empty input: min/max are null — must not throw, must write a
    // readable (empty) output
    CorpusSink.writeZOrder(e.filter(lit(false)), s"$base/empty",
      "user_id", "value", nFiles = 4)
    assert(spark.read.parquet(s"$base/empty").count() == 0)

    intercept[IllegalArgumentException] {
      CorpusSink.writeZOrder(e, s"$base/bad", "user_id", "value",
        nFiles = 4, bits = 31)
    }
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
