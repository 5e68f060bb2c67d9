package graft

/** The SQL-first user path: views + custom functions through spark.sql,
  * with the same plan quality as the DataFrame API. */
class GraftCatalogSpec extends SparkSpec {

  test("registered views answer SQL with pushdown intact") {
    GraftCatalog.registerAll(spark, sf())
    val df = spark.sql(
      """SELECT r_name, count(1) AS n
         FROM customer
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         WHERE c_acctbal > 0
         GROUP BY r_name ORDER BY r_name""")
    val rows = df.collect()
    assert(rows.length == 5, "five regions expected")
    // the acctbal filter must reach the parquet scan through the view
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(c_acctbal), GreaterThan(c_acctbal"),
      s"filter not pushed through the temp view:\n$plan")
  }

  test("custom functions are callable from SQL") {
    GraftCatalog.registerAll(spark, sf())
    val n = spark.sql(
      """SELECT doc_id, size(graft_trigrams(split(text, ' '))) AS n_shingles
         FROM documents WHERE doc_id < 10""").collect()
    assert(n.length == 10)
    assert(n.forall(_.getInt(1) > 0), "shingles must derive through SQL")
  }

  test("events view carries the nanos-timestamp handling") {
    GraftCatalog.registerAll(spark, sf())
    val r = spark.sql(
      "SELECT count(1) AS n FROM events WHERE ts IS NOT NULL").head()
    assert(r.getLong(0) > 0, "events must be readable through the view")
  }
}
