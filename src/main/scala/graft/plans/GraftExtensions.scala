package graft.plans

import graft.functions.{ArrayPairs, ClassifierScoreUnits, HashEmbedUnits, LongDot, MinHashSignature, PairsGenerator, RollingHashUnits, TrigramShingles}
import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.functions.expr

/** Registration of graft's custom Catalyst expressions and the LAZY
  * query-view resolver.
  *
  * Two entry points, same registry:
  *  - `GraftExtensions` for `--conf spark.sql.extensions=graft.plans.
  *    GraftExtensions` (the production path — every session gets the
  *    functions at build time);
  *  - `GraftFunctions.register(spark)` for imperative registration
  *    (tests, notebooks) — idempotent.
  *
  * Besides the scalar expressions, one analyzer RESOLUTION rule is
  * injected: `LazyGraftViews` resolves `graft_<query>` relations on
  * first reference, so the full library surface is SQL-addressable with
  * ZERO work at session start — including the queries whose builders
  * run driver-side actions (collected IVF centroids, bloom builds,
  * iterative CC rounds), which `GraftCatalog.registerQueryViews` must
  * otherwise execute eagerly or skip. No SparkStrategy is registered:
  * the reference surface needs none (SURVEY §4.2).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  def apply(e: SparkSessionExtensions): Unit = {
    e.injectResolutionRule(session => new LazyGraftViews(session))
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
    e.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("graft_cls_score"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[ClassifierScoreUnits].getName, "graft_cls_score"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        ClassifierScoreUnits(exprs.head)))
    e.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("graft_hash_embed"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[HashEmbedUnits].getName, "graft_hash_embed"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        HashEmbedUnits(exprs.head)))
    e.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("graft_dot_long"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[LongDot].getName, "graft_dot_long"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        LongDot(exprs.head, exprs(1))))
    e.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("graft_roll_hash"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[RollingHashUnits].getName, "graft_roll_hash"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        RollingHashUnits(exprs.head)))
  }
}

/** Analyzer rule: resolve `graft_<name>` to the library query's plan ON
  * FIRST SELECT — the genuinely lazy view face (advice r4: temp-view
  * registration executes eager builders at registration time and
  * freezes their collected state; this rule defers that work to the
  * query that actually reads the view, exactly like a metastore view's
  * body expanding at resolution).
  *
  * Scope guards: fires only when `spark.graft.lazyViews.dir` is set on
  * the session (GraftCatalog.enableLazyViews), only for single-part
  * `graft_`-prefixed names that match a library query, and only for
  * relations the built-in resolver left unresolved — an explicitly
  * registered temp view of the same name always wins. */
class LazyGraftViews(session: SparkSession)
    extends org.apache.spark.sql.catalyst.rules.Rule[
      org.apache.spark.sql.catalyst.plans.logical.LogicalPlan] {
  import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
  import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, SubqueryAlias}

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val dir = session.conf.get(graft.GraftCatalog.LazyViewDirKey, "")
    if (dir.isEmpty) plan
    else plan.resolveOperatorsUp {
      case u: UnresolvedRelation if u.multipartIdentifier.length == 1 &&
          u.multipartIdentifier.head
            .toLowerCase(java.util.Locale.ROOT).startsWith("graft_") =>
        val raw = u.multipartIdentifier.head
        val name = raw.toLowerCase(java.util.Locale.ROOT).stripPrefix("graft_")
        graft.SparkEntry.queries.get(name)
          .map(fn => SubqueryAlias(raw, fn(session, dir).queryExecution.analyzed))
          .getOrElse(u)
    }
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
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_cls_score", exprs => ClassifierScoreUnits(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_hash_embed", exprs => HashEmbedUnits(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_dot_long", exprs => LongDot(exprs.head, exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_roll_hash", exprs => RollingHashUnits(exprs.head), "built-in")
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
  def graftHashEmbed(spark: SparkSession, tokensCol: String): Column = {
    register(spark); expr(s"graft_hash_embed($tokensCol)")
  }
  def graftDotLong(spark: SparkSession, aCol: String, bCol: String): Column = {
    register(spark); expr(s"graft_dot_long($aCol, $bCol)")
  }
  def graftClsScore(spark: SparkSession, tokensCol: String): Column = {
    register(spark); expr(s"graft_cls_score($tokensCol)")
  }
  def graftRollHash(spark: SparkSession, tokensCol: String): Column = {
    register(spark); expr(s"graft_roll_hash($tokensCol)")
  }

  /** IVF top-2 centroid assignment over plan-time centroid constants.
    * The centroids are collected driver state, not SQL-literal-able
    * args, so the registry BUILDER closes over them — registered under
    * a name keyed by the centroid set (idempotent per set; a refined
    * set registers its own name). */
  def graftIvfAssign(spark: SparkSession, vCol: String,
      cents: Seq[(Long, Seq[Double], Double)]): Column = {
    val name = s"graft_ivf_assign_${java.lang.Integer.toHexString(cents.hashCode)}"
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name,
      exprs => graft.functions.IvfAssignTop2(exprs.head,
        cents.map(_._1), cents.map(_._2), cents.map(_._3)),
      "built-in")
    expr(s"$name($vCol)")
  }

  /** Integer-space coarse assignment for the hashed-document ANN
    * (emb_hash_ann) — same closure-registration pattern as
    * graftIvfAssign, BIGINT end to end. */
  def graftHashIvfAssign(spark: SparkSession, vCol: String,
      cents: Seq[Seq[Long]], cnorms: Seq[Long]): Column = {
    val name =
      s"graft_hash_ivf_assign_${java.lang.Integer.toHexString(cents.hashCode)}"
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name,
      exprs => graft.functions.HashIvfAssignTop2(exprs.head, cents, cnorms),
      "built-in")
    expr(s"$name($vCol)")
  }
}
