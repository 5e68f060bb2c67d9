package graft

import graft.plans.GraftFunctions
import org.apache.spark.sql.SparkSession

/** SQL entry point: register every test-data table as a temp view plus
  * graft's custom functions, so a SQL-first user drives the whole
  * engine through `spark.sql` — the interface a reference user switches
  * to with zero DataFrame code.
  *
  * Views are zero-copy plan aliases (no materialization); predicate
  * pushdown, pruning, and every Catalyst optimization apply exactly as
  * through the DataFrame API. Production would register the same names
  * in a real metastore catalog with `saveAsTable`/external locations —
  * the query surface is identical.
  */
object GraftCatalog {

  val tableNames: Seq[String] = Seq("region", "nation", "customer",
    "supplier", "part", "orders", "lineitem", "events", "documents",
    "embeddings")

  /** Register all tables of `dir` as temp views + the custom functions.
    * Idempotent; re-registering repoints the views at a new dir. */
  def registerAll(spark: SparkSession, dir: String): Unit = {
    tableNames.foreach { name =>
      val df = name match {
        case "events" => Tables.events(spark, dir) // nanos-ts handling
        // single-file CPU-bound tables get the documented repartition so
        // SQL users' interpreted expressions (graft_trigrams etc.) run
        // parallel, not on one input split
        case "documents" => Tables.documentsPar(spark, dir)
        case "embeddings" => Tables.embeddingsPar(spark, dir)
        case _ => Tables.table(spark, dir, name)
      }
      df.createOrReplaceTempView(name)
    }
    GraftFunctions.register(spark)
  }

  /** Register every library query as a temp view `graft_<name>` — the
    * full operator surface behind plain `SELECT * FROM graft_doc_tfidf`.
    * Views stay UNMATERIALIZED plan aliases: a SQL user's filter or
    * projection on top composes into the same Catalyst plan the
    * DataFrame caller gets (pushdown through the view is pinned by
    * GraftCatalogSpec), and queries run only when selected. */
  def registerQueryViews(spark: SparkSession, dir: String): Unit =
    SparkEntry.queries.foreach { case (name, fn) =>
      fn(spark, dir).createOrReplaceTempView(s"graft_$name")
    }
}
