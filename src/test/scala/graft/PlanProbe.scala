package graft

/** Dev-loop plan probe (a main, not a spec): prints the join/exchange/
  * aggregate skeleton of the df-cut pair pipeline so the exchange-reuse
  * claim in TextOps.dfCut's scaladoc can be re-checked after refactors. */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]").config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = operators.TextOps.ngramJaccardPairsFrame(
      spark, Tables.documentsPar(spark, "/root/testdata/sf0.001"), 1000)
    df.write.format("noop").mode("overwrite").save()
    println("=== SKELETON ===")
    println(df.queryExecution.executedPlan.toString
      .linesIterator.filter(l => l.contains("Exchange") || l.contains("Join")
        || l.contains("Aggregate") || l.contains("Generate")
        || l.contains("InMemory")).mkString("\n"))
    spark.stop()
  }
}
