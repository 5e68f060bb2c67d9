package graft.functions

import graft.{SparkSpec, Tables}
import graft.operators.{MinHashOps, TextOps}
import graft.plans.GraftFunctions
import org.apache.spark.sql.functions._

/** The custom Catalyst expressions must be drop-in replacements for the
  * composed built-in forms — same values, element order included, on the
  * full documents corpus. */
class ExpressionParitySpec extends SparkSpec {

  test("graft_trigrams == composed array_distinct/transform form") {
    val df = Tables.documents(spark, sf())
      .withColumn("toks", TextOps.tokens)
      .withColumn("composed", TextOps.wordTrigrams(col("toks")))
      .withColumn("custom", GraftFunctions.graftTrigrams(spark, "toks"))
    assert(df.filter(not(col("composed") <=> col("custom"))).count() == 0)
  }

  test("graft_minhash == composed gramIds∘signature form") {
    val df = Tables.documents(spark, sf())
      .withColumn("toks", TextOps.tokens)
      .withColumn("grams", TextOps.wordTrigrams(col("toks")))
      .filter(size(col("grams")) > 0)
      .withColumn("ids", MinHashOps.gramIds(col("grams")))
      .withColumn("composed", MinHashOps.signature(col("ids")))
      .withColumn("custom", GraftFunctions.graftMinhash(spark, "grams"))
    assert(df.filter(not(col("composed") <=> col("custom"))).count() == 0)
  }

  test("SQL registration via extensions entry point") {
    new graft.plans.GraftExtensions() // construct: the --conf path exists
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT graft_trigrams(array('a','b','c','b','c','d')) AS g").collect()
    assert(r.head.getSeq[String](0) == Seq("a b c", "b c b", "c b c", "b c d"))
  }
}
