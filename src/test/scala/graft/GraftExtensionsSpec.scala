package graft

import graft.plans.GraftExtensions
import org.apache.spark.sql.SparkSession

/** The production registration path (VERDICT r3 next-round #8): a
  * session BUILT with spark.sql.extensions=graft.plans.GraftExtensions
  * must have every graft_* function available in plain SQL — no
  * imperative GraftFunctions.register call anywhere. Runs on a second
  * SparkSession over the shared context (suites execute sequentially in
  * the forked test JVM, so swapping the default session is safe). */
class GraftExtensionsSpec extends SparkSpec {

  test("a spark.sql.extensions-built session serves graft_* SQL") {
    val shared = spark // force the shared session/context to exist
    // spark.sql.extensions is a STATIC conf: session construction reads
    // it from the SparkContext's conf (what spark-submit --conf sets in
    // production), not from per-session options — so plant it there for
    // the new session and remove it after. SparkContext.conf is
    // private[spark] (public in bytecode), and getConf hands back a
    // copy, so go through the accessor method.
    def ctxConf(sc: org.apache.spark.SparkContext): org.apache.spark.SparkConf =
      sc.getClass.getMethod("conf").invoke(sc)
        .asInstanceOf[org.apache.spark.SparkConf]
    ctxConf(shared.sparkContext).set(
      "spark.sql.extensions", classOf[GraftExtensions].getName)
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[4]")
        .getOrCreate()
      assert(s2 ne shared, "must be a fresh session, not the shared one")

      val tri = s2.sql("SELECT graft_trigrams(split('a b c d', ' ')) AS g")
        .collect().head.getSeq[String](0)
      assert(tri == Seq("a b c", "b c d"))

      val sig = s2.sql("SELECT graft_minhash(array('a b c', 'b c d')) AS m")
        .collect().head.getSeq[Long](0)
      assert(sig.length == graft.operators.MinHashOps.K)

      val pairs = s2.sql(
        "SELECT graft_pairs(array(1L, 2L, 3L)) AS p").collect().head.getSeq[Any](0)
      assert(pairs.length == 3)

      // the generator form plans a Generate emitting (l, r) rows
      val gen = s2.sql("SELECT graft_pairs_gen(array(1L, 2L, 3L))")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(gen == Set((1L, 2L), (1L, 3L), (2L, 3L)))

      // end-to-end: the dedup pair pattern as pure SQL on the new session
      val sqlPairs = s2.sql(
        """SELECT l.d AS d1, r.d AS d2
          |FROM (SELECT graft_pairs_gen(ds) FROM (
          |  SELECT collect_list(named_struct('d', id)) AS ds
          |  FROM range(4)))""".stripMargin).count()
      assert(sqlPairs == 6)

      // LAZY query views: before enableLazyViews the rule is inert —
      // graft_* names must fail analysis like any unknown relation
      intercept[org.apache.spark.sql.AnalysisException] {
        s2.sql("SELECT * FROM graft_doc_quality").queryExecution.analyzed
      }
      GraftCatalog.enableLazyViews(s2, sf())
      // an EAGER-builder query resolves and runs with no registration
      // call at all — its collect/count work happens at THIS select,
      // not at session start (the whole point of the lazy face)
      assert(s2.sql("SELECT * FROM graft_emb_ann_ivf").count() > 0)
      // plain queries compose: a filter on top of the lazy view answers
      assert(s2.sql(
        "SELECT count(1) AS n FROM graft_doc_quality WHERE quality >= 0.5")
        .head().getLong(0) > 0)
      // an explicitly registered temp view of the same name WINS
      s2.range(1).selectExpr("42 AS marker")
        .createOrReplaceTempView("graft_doc_quality")
      assert(s2.sql("SELECT marker FROM graft_doc_quality").head().getInt(0) == 42)
      // unknown graft_ name still errors cleanly
      intercept[org.apache.spark.sql.AnalysisException] {
        s2.sql("SELECT * FROM graft_no_such_query").queryExecution.analyzed
      }

      // one-call setup: tables, functions, and the whole query surface
      // — a registered view (clobbering the marker above), a lazy
      // eager-builder view, and a base table all answer
      GraftCatalog.init(s2, sf())
      assert(s2.sql("SELECT * FROM graft_doc_quality").count() > 0)
      assert(s2.sql("SELECT * FROM graft_dedup_clusters").count() > 0)
      assert(s2.sql("SELECT count(1) FROM documents").head().getLong(0) > 0)
    } finally {
      ctxConf(spark.sparkContext).remove("spark.sql.extensions")
      SparkSession.setDefaultSession(shared)
      SparkSession.setActiveSession(shared)
    }
  }
}
