package graft.plans

import graft.functions.{ArrayPairs, MinHashSignature, PairsGenerator, TrigramShingles}
import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.functions.expr

/** Registration of graft's custom Catalyst expressions.
  *
  * Two entry points, same registry:
  *  - `GraftExtensions` for `--conf spark.sql.extensions=graft.plans.
  *    GraftExtensions` (the production path — every session gets the
  *    functions at build time);
  *  - `GraftFunctions.register(spark)` for imperative registration
  *    (tests, notebooks) — idempotent.
  *
  * No custom Rule[LogicalPlan]/SparkStrategy is registered: the
  * reference surface needs none (SURVEY §4.2) — scalar expressions are
  * the only place composing built-ins was inadequate.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("graft_trigrams"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[TrigramShingles].getName, "graft_trigrams"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        TrigramShingles(exprs.head)))
    e.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("graft_pairs"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[ArrayPairs].getName, "graft_pairs"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        ArrayPairs(exprs.head)))
    e.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("graft_minhash"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[MinHashSignature].getName, "graft_minhash"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        MinHashSignature(exprs.head)))
    e.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("graft_pairs_gen"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[PairsGenerator].getName, "graft_pairs_gen"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        PairsGenerator(exprs.head)))
  }
}

object GraftFunctions {
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_trigrams", exprs => TrigramShingles(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_minhash", exprs => MinHashSignature(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_pairs", exprs => ArrayPairs(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_pairs_gen", exprs => PairsGenerator(exprs.head), "built-in")
  }

  /** column faces over named columns (register first, then `expr`) */
  def graftTrigrams(spark: SparkSession, tokensCol: String): Column = {
    register(spark); expr(s"graft_trigrams($tokensCol)")
  }
  def graftMinhash(spark: SparkSession, gramsCol: String): Column = {
    register(spark); expr(s"graft_minhash($gramsCol)")
  }
  def graftPairs(spark: SparkSession, arrCol: String): Column = {
    register(spark); expr(s"graft_pairs($arrCol)")
  }
  /** generator form: select(...) plans a Generate emitting (l, r) rows */
  def graftPairsGen(spark: SparkSession, arrCol: String): Column = {
    register(spark); expr(s"graft_pairs_gen($arrCol)")
  }
}
