package graft

import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Bucketed co-located join — the pre-shuffle pattern for repeated big
  * joins at 100 TB: both tables bucketed by the join key at write time
  * join WITHOUT any shuffle exchange at read time. */
class BucketingSpec extends SparkSpec {

  test("join of two tables bucketed on the key plans with no shuffle") {
    // warehouse.dir is a static conf — put the database somewhere
    // disposable via LOCATION instead
    val wh = Files.createTempDirectory("graft_wh").toString
    spark.sql(s"CREATE DATABASE IF NOT EXISTS graft_bkt LOCATION '$wh'")
    try {
      Tables.lineitem(spark, sf()).write
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .mode("overwrite").saveAsTable("graft_bkt.li_b")
      Tables.orders(spark, sf()).write
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .mode("overwrite").saveAsTable("graft_bkt.o_b")
      val joined = spark.table("graft_bkt.li_b")
        .join(spark.table("graft_bkt.o_b"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"))
      val plan = joined.queryExecution.executedPlan.toString
      // the join itself must not shuffle either side: the only exchange
      // allowed is the single-row aggregation at the end
      val joinSection = plan.split("HashAggregate").last
      assert(!joinSection.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$plan")
      assert(joined.collect().map(_.getLong(1)).sum ==
        Tables.lineitem(spark, sf()).join(Tables.orders(spark, sf()),
          col("l_orderkey") === col("o_orderkey")).count())
    } finally {
      spark.sql("DROP DATABASE IF EXISTS graft_bkt CASCADE")
    }
  }
}
