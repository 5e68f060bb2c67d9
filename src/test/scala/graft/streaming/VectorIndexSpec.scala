package graft.streaming

import graft.SparkSpec
import java.nio.file.Files
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

/** The persisted IVF index: batched idempotent ingest converges to the
  * same index regardless of split/replay, `search` over the store is
  * BIT-IDENTICAL to the in-session `emb_ann_ivf` query, the probed
  * scan prunes to the queries' cell partitions, and ingest leaves
  * untouched cell partitions byte-identical. */
class VectorIndexSpec extends SparkSpec {

  private def emb = graft.Tables.embeddings(spark, sf())

  private def fileState(dir: String): Map[String, (Long, Long)] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return Map.empty
    val it = fs.listFiles(p, true)
    val out = scala.collection.mutable.Map.empty[String, (Long, Long)]
    while (it.hasNext) {
      val s = it.next()
      if (s.getPath.getName.endsWith(".parquet"))
        out(s.getPath.toString) = (s.getLen, s.getModificationTime)
    }
    out.toMap
  }

  test("split ingest + replay converge, and store-served search is " +
    "bit-identical to the in-session emb_ann_ivf") {
    val store = Files.createTempDirectory("vidx").toString + "/idx"
    VectorIndex.train(spark, emb, store)
    // three disjoint batches; batch 2 replayed verbatim must apply 0
    val total = (0 until 3).map { i =>
      VectorIndex.mergeBatch(spark, emb.filter(col("vec_id") % 3 === i), store)
    }.sum
    assert(VectorIndex.mergeBatch(spark,
      emb.filter(col("vec_id") % 3 === 1), store) == 0L,
      "replayed batch must add nothing")
    val expected = graft.operators.EmbeddingOps.annIvf(spark, sf()).collect()
    assert(total == emb.count(), "every vector must land exactly once")
    val served = VectorIndex.search(spark, store,
      emb.filter(col("vec_id") < 5)).collect()
    assert(served.toSeq == expected.toSeq,
      s"served search diverged from the in-session query: " +
        s"served=${served.take(3).toSeq} vs ${expected.take(3).toSeq}")
    assert(VectorIndex.search(spark, store, emb.filter(col("vec_id") < 5))
      .schema == graft.operators.EmbeddingOps.annIvf(spark, sf()).schema,
      "served schema diverged (partition-type inference must not leak)")
  }

  test("search reads only the probed cell partitions (file-source " +
    "partition pruning), and ingest leaves untouched partitions " +
    "byte-identical") {
    val store = Files.createTempDirectory("vidx2").toString + "/idx"
    VectorIndex.train(spark, emb, store)
    VectorIndex.mergeBatch(spark, emb.filter(col("vec_id") % 2 === 0), store)
    val q = emb.filter(col("vec_id") === 0)
    val plan = VectorIndex.search(spark, store, q)
      .queryExecution.executedPlan.toString
    val scanLine = plan.linesIterator
      .find(l => l.contains("FileScan parquet") && l.contains("PartitionFilters"))
      .getOrElse(fail(s"no partitioned scan in plan:\n${plan.take(3000)}"))
    // (the partition column round-trips as int via directory-name
    // inference, so no L suffix on the attribute)
    assert("PartitionFilters: \\[cell#\\d+L? IN \\(".r
      .findFirstIn(scanLine).isDefined,
      s"probe filter did not reach the partition level: $scanLine")
    // functional pruning: the one-query search touches at most 2 cells
    val cells = VectorIndex.search(spark, store, q)
      .select("cell").distinct().collect().map(_.getLong(0)).toSet
    assert(cells.size <= 2, s"nprobe=2 search surfaced cells $cells")
    // second ingest: partitions its cells don't touch stay identical
    val batch2 = emb.filter(col("vec_id") % 2 === 1).limit(40)
    // discover which cells batch2 will land in by ingesting into a
    // scratch COPY of the trained quantizer, then diff the real store
    val scratch = Files.createTempDirectory("vidx3").toString + "/idx"
    VectorIndex.train(spark, emb, scratch)
    VectorIndex.mergeBatch(spark, batch2, scratch)
    val hit = fileState(s"$scratch/vectors").keys
      .flatMap("cell=(\\d+)".r.findFirstMatchIn(_).map(_.group(1).toLong)).toSet
    val beforeOther = fileState(s"$store/vectors")
      .filterNot { case (p, _) => hit.exists(c => p.contains(s"cell=$c/")) }
    VectorIndex.mergeBatch(spark, batch2, store)
    val afterOther = fileState(s"$store/vectors")
      .filterNot { case (p, _) => hit.exists(c => p.contains(s"cell=$c/")) }
    assert(afterOther == beforeOther,
      "ingest rewrote cell partitions its batch never touched")
  }

  test("compact collapses per-batch files to one per cell with search " +
    "results unchanged; an interrupted swap self-heals; forget purges " +
    "ids from their cells only and drops emptied cell dirs") {
    val store = Files.createTempDirectory("vidx5").toString + "/idx"
    VectorIndex.train(spark, emb, store)
    (0 until 4).foreach { i =>
      VectorIndex.mergeBatch(spark, emb.filter(col("vec_id") % 4 === i), store)
    }
    val qs = emb.filter(col("vec_id") < 5)
    val before = VectorIndex.search(spark, store, qs).collect().toSeq
    val filesBefore = fileState(s"$store/vectors").size
    VectorIndex.compact(spark, store)
    val filesAfter = fileState(s"$store/vectors").size
    assert(filesAfter < filesBefore, s"$filesBefore -> $filesAfter")
    val cells = fileState(s"$store/vectors").keys
      .flatMap("cell=(\\d+)".r.findFirstMatchIn(_).map(_.group(1))).toSet
    assert(filesAfter <= cells.size + 1, // one file per cell
      s"$filesAfter files over ${cells.size} cells")
    assert(VectorIndex.search(spark, store, qs).collect().toSeq == before,
      "compaction changed search results")
    // interrupted swap: live deleted, stage present -> next op resumes
    val fs = new Path(store).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    fs.rename(new Path(s"$store/vectors"), new Path(s"$store/vectors.compact"))
    assert(VectorIndex.search(spark, store, qs).collect().toSeq == before,
      "interrupted compaction swap did not self-heal")
    // keyed deletion: victims leave the results; replays cannot
    // resurrect them (their anti-join sees nothing, appends fresh)
    val victims = before.map(_.getLong(2)).distinct.take(2)
    val removed = VectorIndex.forget(spark, store, victims)
    assert(removed == victims.size.toLong, s"removed=$removed")
    assert(VectorIndex.forget(spark, store, victims) == 0L, "not idempotent")
    val after = VectorIndex.search(spark, store, qs).collect()
    assert(!after.exists(r => victims.contains(r.getLong(2))),
      "forgotten vectors still served")
    assert(spark.read.parquet(s"$store/vectors")
      .filter(col("vec_id").isin(victims: _*)).isEmpty)
  }

  test("edge states: erasure resumes an interrupted swap before " +
    "probing, a trained-but-empty store serves the empty result, and " +
    "a single-centroid quantizer searches without a second probe cell") {
    val store = Files.createTempDirectory("vidx6").toString + "/idx"
    VectorIndex.train(spark, emb, store)
    val qs = emb.filter(col("vec_id") < 3)
    // empty store: no vectors ingested yet -> empty frame, not an error
    assert(VectorIndex.search(spark, store, qs).isEmpty)
    VectorIndex.mergeBatch(spark, emb.limit(200), store)
    val served = VectorIndex.search(spark, store, qs).collect()
    assert(served.nonEmpty)
    // interrupt a compaction swap (live gone, stage present), then call
    // forget FIRST: the erasure must resume the swap and purge — a
    // probe-before-resume would no-op and the victim would resurrect
    // when the next search resumes the stage
    val fs = new Path(store).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    fs.rename(new Path(s"$store/vectors"), new Path(s"$store/vectors.compact"))
    val victim = served.head.getLong(2)
    assert(VectorIndex.forget(spark, store, Seq(victim)) == 1L,
      "forget on a mid-swap store must resume and purge, not no-op")
    assert(!VectorIndex.search(spark, store, qs).collect()
      .exists(_.getLong(2) == victim), "erased vector served after swap")
    // single-centroid quantizer: cell2 is null; search must not NPE
    val store1 = Files.createTempDirectory("vidx7").toString + "/idx"
    VectorIndex.train(spark, emb, store1, k = 1)
    VectorIndex.mergeBatch(spark, emb.limit(50), store1)
    val one = VectorIndex.search(spark, store1, qs).collect()
    assert(one.nonEmpty && one.forall(r => !qs.collect()
      .map(_.getLong(0)).contains(r.getLong(2)) || r.getLong(2) >= 0))
  }

  test("a dimensionality-mismatched embedding cannot poison the ingest " +
    "batch: the null-cell row drops, the rest of the batch indexes " +
    "(advice r6 — a poisoned batch would replay and stall forever)") {
    import spark.implicits._
    val store = Files.createTempDirectory("vidx8").toString + "/idx"
    VectorIndex.train(spark, emb, store)
    val good = emb.limit(20).select("vec_id", "embedding")
    val dim = good.selectExpr("size(embedding)").head().getInt(0)
    val bad = Seq((900001L, Seq.fill(dim + 3)(0.5f)))
      .toDF("vec_id", "embedding")
    val applied = VectorIndex.mergeBatch(spark, good.unionByName(bad), store)
    assert(applied == 20L, s"applied $applied (want the 20 good rows)")
    assert(spark.read.parquet(s"$store/vectors")
      .filter(col("vec_id") === 900001L).isEmpty,
      "the malformed row must not be indexed")
  }

  test("retrain: blue/green epoch swap rebuilds the quantizer from the " +
    "store's own vectors — ids preserved, serving continuous, ingest " +
    "and compaction keep working in the new epoch, crash windows leave " +
    "the old epoch serving") {
    import spark.implicits._
    val store = Files.createTempDirectory("vidx9").toString + "/idx"
    VectorIndex.train(spark, emb, store)
    VectorIndex.mergeBatch(spark, emb.limit(300), store)
    val qs = emb.filter(col("vec_id") < 3)
    def servedIds() = VectorIndex.search(spark, store, qs)
      .select("vec_id").distinct().as[Long].collect().toSet
    def storedIds() = spark.read
      .parquet(s"$store/${if (new java.io.File(s"$store/vectors").exists) "vectors" else "vectors@1"}")
      .select("vec_id").as[Long].collect().sorted.toSeq
    val idsBefore = storedIds()
    assert(servedIds().nonEmpty)

    // crash window 1: stage dirs written, nothing renamed — simulate by
    // planting stray .tmp dirs; the old epoch must keep serving and the
    // next retrain must clear them
    val fs = new Path(store).getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new Path(s"$store/centroids@1.tmp"))
    fs.mkdirs(new Path(s"$store/vectors@1.tmp"))
    assert(servedIds().nonEmpty, "strays must not affect serving")

    // crash window 2: centroids@1 renamed, vectors@1 not — old epoch
    // still serves (the commit point is the vectors dir)
    fs.mkdirs(new Path(s"$store/centroids@1"))
    assert(servedIds().nonEmpty, "an uncommitted epoch must not serve")

    VectorIndex.retrain(spark, store, lloydIters = 1)
    assert(fs.exists(new Path(s"$store/vectors@1")), "epoch 1 not committed")
    assert(!fs.exists(new Path(s"$store/vectors")), "legacy dirs not cleaned")
    assert(!fs.exists(new Path(s"$store/vectors@1.tmp")), "strays not cleaned")
    val after = spark.read.parquet(s"$store/vectors@1")
      .select("vec_id").as[Long].collect().sorted.toSeq
    assert(after == idsBefore, "retrain lost or invented vectors")
    val served = VectorIndex.search(spark, store, qs).collect()
    assert(served.nonEmpty && served.forall(r => after.contains(r.getLong(2))))

    // the new epoch is a live index: ingest into it, search finds it,
    // compaction still swaps cleanly, a second retrain advances to @2
    VectorIndex.mergeBatch(spark, emb.filter(col("vec_id").between(300, 339)), store)
    assert(spark.read.parquet(s"$store/vectors@1")
      .filter(col("vec_id") >= 300).count() > 0, "post-retrain ingest missed")
    VectorIndex.compact(spark, store)
    assert(servedIds().nonEmpty)
    VectorIndex.retrain(spark, store, lloydIters = 0)
    assert(fs.exists(new Path(s"$store/vectors@2")) &&
      !fs.exists(new Path(s"$store/vectors@1")), "epoch did not advance")
    assert(servedIds().nonEmpty)
  }

  test("erasing a quantizer SEED doc scrubs its embedding from the " +
    "centroids (blue/green retrain from the remainder — the same " +
    "derived-content obligation as the vectors); retry is idempotent; " +
    "full erasure drops the quantizer dirs entirely") {
    import spark.implicits._
    val store = Files.createTempDirectory("vidx10").toString + "/idx"
    VectorIndex.train(spark, emb, store)
    VectorIndex.mergeBatch(spark, emb, store)
    val fs = new Path(store).getFileSystem(spark.sparkContext.hadoopConfiguration)
    def centDirs() = fs.listStatus(new Path(store)).map(_.getPath.getName)
      .filter(_.startsWith("centroids")).toSeq
    def cids() = centDirs().flatMap(d => spark.read.parquet(s"$store/$d")
      .select("cid").as[Long].collect()).toSet
    val seed = cids().min
    assert(VectorIndex.forget(spark, store, Seq(seed)) == 1L)
    assert(!cids().contains(seed),
      s"erased seed $seed still referenced by the quantizer")
    // retry (a run that crashed between purge and scrub) stays clean
    assert(VectorIndex.forget(spark, store, Seq(seed)) == 0L)
    assert(!cids().contains(seed))
    // the rebuilt quantizer serves, and ingest keeps working
    val qs = emb.filter(col("vec_id").between(20, 22))
    assert(VectorIndex.search(spark, store, qs).collect().nonEmpty)
    // erase EVERYTHING: no quantizer (= no seed embedding) may remain
    val vdir = fs.listStatus(new Path(store)).map(_.getPath.getName)
      .filter(n => n.startsWith("vectors") && !n.contains(".")).head
    val allIds = spark.read.parquet(s"$store/$vdir")
      .select("vec_id").as[Long].collect().toSeq
    assert(VectorIndex.forget(spark, store, allIds) == allIds.length.toLong)
    assert(centDirs().isEmpty, "quantizer dirs survived full erasure")
    // the emptied store SERVES (empty) and SELF-HEALS: search returns
    // no rows instead of a missing-path error, and the next batch
    // re-seeds the quantizer instead of stalling a maintain() stream
    assert(VectorIndex.search(spark, store, qs).isEmpty,
      "fully-erased store must serve the empty result")
    assert(VectorIndex.mergeBatch(spark, emb.limit(10), store) == 10L,
      "post-erasure batch must re-seed and index")
    assert(VectorIndex.search(spark, store, qs).collect().nonEmpty)
  }

  test("stats: per-cell counts conserve the store, shares sum to 1, " +
    "the skew factor is the max-to-mean ratio, and erasure moves it") {
    import spark.implicits._
    val store = Files.createTempDirectory("vidx13").toString + "/idx"
    assert(VectorIndex.stats(spark, store).isEmpty, "absent store: empty")
    VectorIndex.train(spark, emb, store)
    VectorIndex.mergeBatch(spark, emb, store)
    val s = VectorIndex.stats(spark, store).collect()
    val n = emb.count()
    val nTrained = spark.read.parquet(s"$store/centroids").count().toInt
    assert(s.length == nTrained,
      "every TRAINED cell must be listed (empty ones at 0)")
    assert(s.map(_.getLong(1)).sum == n, "counts must conserve the store")
    assert(math.abs(s.map(_.getDouble(2)).sum - 1.0) < 1e-9,
      "shares must sum to 1")
    val want = s.map(_.getLong(1)).max.toDouble * nTrained / n
    assert(s.forall(r => math.abs(r.getDouble(3) - want) < 1e-12),
      s"skew factor ${s.head.getDouble(3)} != $want")
    assert(s.head.getLong(1) == s.map(_.getLong(1)).max,
      "rows must order heaviest-first")
    // the DETECTION property: a near-empty store (16 trained cells, 5
    // vectors) must read as heavily skewed, not uniform — a
    // non-empty-cells denominator would report 1.0 for total
    // concentration, the exact drift this diagnostic exists to catch
    val store3 = Files.createTempDirectory("vidx15").toString + "/idx"
    VectorIndex.train(spark, emb, store3)
    VectorIndex.mergeBatch(spark, emb.limit(5), store3)
    val s3 = VectorIndex.stats(spark, store3).collect()
    assert(s3.length == 16 && s3.map(_.getLong(1)).sum == 5)
    assert(s3.count(_.getLong(1) == 0L) >= 11,
      "empty trained cells missing from the report")
    assert(s3.head.getDouble(3) >= 16.0 / 5,
      s"concentration must register as skew: ${s3.head.getDouble(3)}")
    // erase the heaviest cell's vectors: the report must follow
    val hot = s.head.getLong(0)
    val hotIds = spark.read.parquet(
        s"$store/vectors").filter(col("cell") === hot)
      .select("vec_id").as[Long].collect().toSeq
    VectorIndex.forget(spark, store, hotIds)
    val s2 = VectorIndex.stats(spark, store).collect()
    assert(s2.map(_.getLong(1)).sum == n - hotIds.length)
    assert(!s2.map(_.getLong(0)).contains(hot), "emptied cell still listed")
  }

  test("filtered ANN: restricting to the full id set is identity; a " +
    "proper subset returns only kept neighbors, identically to an " +
    "index holding just those vectors under the same quantizer") {
    val store = Files.createTempDirectory("vidx11").toString + "/idx"
    VectorIndex.train(spark, emb, store)
    VectorIndex.mergeBatch(spark, emb, store)
    val qs = emb.filter(col("vec_id") < 3)
    val plain = VectorIndex.search(spark, store, qs).collect().toSeq
    assert(VectorIndex.search(spark, store, qs,
      restrict = Some(emb.select("vec_id"))).collect().toSeq == plain,
      "full-set restrict must be the identity")
    val filtered = VectorIndex.search(spark, store, qs,
      restrict = Some(emb.filter(col("vec_id") % 2 === 0).select("vec_id")))
      .collect().toSeq
    assert(filtered.nonEmpty && filtered.forall(_.getLong(2) % 2 == 0),
      s"restricted search served a filtered-out vector: $filtered")
    // parity law: same quantizer (trained from the same seed frame),
    // only the kept vectors ingested — post-filtering candidates must
    // equal the subset-only index's serving exactly
    val store2 = Files.createTempDirectory("vidx12").toString + "/idx"
    VectorIndex.train(spark, emb, store2)
    VectorIndex.mergeBatch(spark, emb.filter(col("vec_id") % 2 === 0), store2)
    assert(VectorIndex.search(spark, store2, qs).collect().toSeq == filtered,
      "filtered search diverged from the subset-only index")
  }

  test("nprobe escalation: probing every cell degrades gracefully to " +
    "exact brute-force cosine top-k (bit-equal sims), and the best " +
    "served similarity is monotone in nprobe") {
    import graft.operators.EmbeddingOps
    val store = Files.createTempDirectory("vidx14").toString + "/idx"
    VectorIndex.train(spark, emb, store)
    VectorIndex.mergeBatch(spark, emb, store)
    val qs = emb.filter(col("vec_id") < 3)
    val nCells = spark.read.parquet(s"$store/centroids").count().toInt
    val full = VectorIndex.search(spark, store, qs, nprobe = nCells)
      .select("q_id", "vec_id", "rn", "sim").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
      .toSet
    // independent brute force: same fold-order dot, all stored vectors
    val ev = emb
      .select(col("vec_id"),
        org.apache.spark.sql.functions.transform(
          col("embedding"), x => x.cast("double")).as("v"))
      .withColumn("ds", EmbeddingOps.dot(col("v"), col("v")))
      .filter(col("ds") > 0.0)
    val qv = ev.filter(col("vec_id") < 3)
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("ds").as("qd"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("q_id").orderBy(col("sim").desc, col("vec_id"))
    val brute = ev.crossJoin(qv)
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("sim", EmbeddingOps.dot(col("qv"), col("v"))
        / (sqrt(col("qd")) * sqrt(col("ds"))))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select("q_id", "vec_id", "rn", "sim").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
      .toSet
    assert(full == brute,
      s"all-cells probe diverged from brute force: ${full.take(3)}")
    // monotone: the best served similarity never drops as nprobe grows
    def best(n: Int): Map[Long, Double] =
      VectorIndex.search(spark, store, qs, nprobe = n)
        .filter(col("rn") === 1).collect()
        .map(r => r.getLong(0) -> r.getDouble(4)).toMap
    val (b2, b4) = (best(2), best(4))
    assert(b4.forall { case (qid, s4) =>
      b2.get(qid).forall(_ <= s4 + 1e-15) },
      s"nprobe=4 served worse than nprobe=2: $b2 vs $b4")
  }

  test("streaming maintain: a checkpointed file stream builds the same " +
    "index as one-shot ingest, across a restart") {
    import spark.implicits._
    val base = Files.createTempDirectory("vidx4").toString
    val (src, store, ck) = (s"$base/src", s"$base/idx", s"$base/ck")
    VectorIndex.train(spark, emb, store)
    val rows = emb.limit(60).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble)))
    def writeJson(part: Seq[(Long, Seq[Double])], name: String): Unit = {
      val json = part.map { case (id, v) =>
        s"""{"vec_id":$id,"embedding":[${v.mkString(",")}]}"""
      }.mkString("\n")
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(src))
      java.nio.file.Files.write(java.nio.file.Paths.get(s"$src/$name.json"),
        json.getBytes("UTF-8"))
    }
    writeJson(rows.take(30).toSeq, "b1")
    val q1 = VectorIndex.maintain(spark, src, store, ck).start()
    try q1.processAllAvailable() finally q1.stop()
    writeJson(rows.drop(30).toSeq, "b2")
    val q2 = VectorIndex.maintain(spark, src, store, ck).start()
    try q2.processAllAvailable() finally q2.stop()
    val got = spark.read.parquet(s"$store/vectors")
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(got == rows.map(_._1).toSet,
      "restarted stream did not converge to the full vector set")
  }
}
