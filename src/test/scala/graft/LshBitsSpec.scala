package graft

import graft.operators.EmbeddingOps
import org.apache.spark.sql.functions._

/** N-derived LSH bit width (VERDICT r3 next-round #6): the hyperplane
  * count must grow with corpus size so bucket population stays near the
  * target instead of growing linearly past a hard-coded width. */
class LshBitsSpec extends SparkSpec {

  test("defaultBits follows ceil(log2(N/target)) clamped to [1,16]") {
    assert(EmbeddingOps.defaultBits(5) == 1)
    assert(EmbeddingOps.defaultBits(64) == 3)
    assert(EmbeddingOps.defaultBits(500) == 6) // the sf0.01 fixture width
    assert(EmbeddingOps.defaultBits(2048) == 8)
    assert(EmbeddingOps.defaultBits(1000000000L) == 16)
  }

  /** deterministic synthetic embeddings: 64 dims of hash noise in
    * [-0.5, 0.5) */
  private def synth(n: Long) =
    spark.range(n).select(col("id").as("vec_id"),
      transform(sequence(lit(0), lit(63)), i =>
        pmod(xxhash64(col("id") * 64 + i), lit(100000L)).cast("double")
          / 100000.0 - 0.5).as("v"))

  test("derived bits bound bucket population at two sizes; a fixed width " +
    "would not") {
    for (n <- Seq(256L, 4096L)) {
      val bits = EmbeddingOps.defaultBits(n)
      val loads = synth(n)
        .withColumn("bucket", EmbeddingOps.lshBucket(col("v"), bits))
        .groupBy("bucket").agg(count(lit(1)).as("load"))
        .select("load").collect().map(_.getLong(0))
      val maxLoad = loads.max
      val meanLoad = n.toDouble / loads.length
      assert(meanLoad <= 2.0 * EmbeddingOps.TargetBucket,
        s"n=$n bits=$bits mean bucket load $meanLoad far over target")
      assert(maxLoad <= 8 * EmbeddingOps.TargetBucket,
        s"n=$n bits=$bits max bucket load $maxLoad unbounded")
    }
    // the old hard-coded 6 bits at n=4096: mean load 64 — the derived
    // width (8 bits) keeps the hottest bucket strictly smaller
    val fixed6 = synth(4096)
      .withColumn("bucket", EmbeddingOps.lshBucket(col("v"), 6))
      .groupBy("bucket").agg(count(lit(1)).as("load"))
      .agg(max("load")).head().getLong(0)
    val derived = synth(4096)
      .withColumn("bucket",
        EmbeddingOps.lshBucket(col("v"), EmbeddingOps.defaultBits(4096)))
      .groupBy("bucket").agg(count(lit(1)).as("load"))
      .agg(max("load")).head().getLong(0)
    assert(derived < fixed6,
      s"derived-bits max load $derived not below fixed-6-bit max $fixed6")
  }
}
