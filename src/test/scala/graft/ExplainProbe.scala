package graft

import org.apache.spark.sql.SparkSession

/** Diagnostic main: print the physical skeleton (exchanges, joins,
  * scans, aggregates) of the queries named in args — the .explain
  * review loop the build brief asks for, kept runnable per round. */
object ExplainProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    for (q <- names) {
      println(s"=== $q ===")
      val p = SparkEntry.queries(q)(spark, dir).queryExecution.executedPlan.toString
      println(p.linesIterator
        .filter(l => l.contains("Exchange") || l.contains("Join") ||
          l.contains("FileScan") || l.contains("HashAggregate") ||
          l.contains("Window") || l.contains("Cartesian"))
        .map(_.trim.replaceAll("\\[plan_id=\\d+\\]", "").take(130))
        .mkString("\n"))
    }
    spark.stop()
  }
}
