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
}
