package graft

import org.apache.spark.sql.functions._

/** AQE skew-join handling: plant a pathologically hot key and verify the
  * adaptive plan splits it (OptimizeSkewedJoin) instead of funnelling the
  * whole key through one reducer — the runtime half of the skew story
  * (the compile-time half is the salted aggregation, TextOps). */
class SkewJoinSpec extends SparkSpec {

  test("AQE marks and splits the skewed side of a sort-merge join") {
    import spark.implicits._
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    // force SMJ (no broadcast) and low skew thresholds so the tiny test
    // dataset still triggers the optimization
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "10KB")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "10KB")
    try {
      // fact: 200k rows, 90% on key 0; dim: uniform keys
      val fact = spark.range(200000)
        .withColumn("k", when(col("id") % 10 =!= 0, 0L).otherwise(col("id") % 97))
        .withColumn("payload", concat(lit("x"), col("id")))
      val dim = spark.range(97).withColumn("k", col("id")).withColumn("v", col("id") * 2)
      val joined = fact.join(dim, "k").groupBy().agg(count(lit(1)).as("n"))
      val n = joined.collect().head.getLong(0)
      assert(n == 200000L)
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"AQE did not mark the skewed join:\n$finalPlan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.conf.unset("spark.sql.adaptive.skewJoin.skewedPartitionFactor")
      spark.conf.unset("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes")
      spark.conf.unset("spark.sql.adaptive.advisoryPartitionSizeInBytes")
    }
  }

  test("salted join: result identical to the plain join, hot key spread " +
    "across salts, deterministic under re-execution") {
    import spark.implicits._
    val salts = 8
    // fact: 5k rows, 80% on key 0, payload distinguishes every row
    val fact = spark.range(5000)
      .withColumn("k", when(col("id") % 5 =!= 0, 0L).otherwise(col("id") % 23))
      .withColumn("payload", concat(lit("p"), col("id")))
    val dim = spark.range(23).withColumn("k", col("id"))
      .withColumn("v", col("id") * 7).drop("id")
    val plain = fact.join(dim, Seq("k")).select("k", "payload", "v")
    val salted = graft.operators.SkewOps.saltedJoin(fact, dim, Seq("k"), salts)
      .select("k", "payload", "v")
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty,
      "salted join changed the result multiset")
    assert(salted.count() == plain.count())
    // the hot key's rows must actually scatter: re-derive the salt the
    // operator assigns and count distinct values on key 0
    val hotSalts = fact.filter(col("k") === 0L)
      .withColumn("s", pmod(xxhash64(fact.columns.map(col): _*), lit(salts.toLong)))
      .select("s").distinct().count()
    assert(hotSalts == salts.toLong,
      s"hot key used $hotSalts of $salts salts — no spread")
    // determinism: a second run pairs rows to identical salts
    val again = graft.operators.SkewOps.saltedJoin(fact, dim, Seq("k"), salts)
      .select("k", "payload", "v")
    assert(again.exceptAll(salted).isEmpty, "salt not replay-stable")
  }
}
