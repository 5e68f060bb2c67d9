package graft

import org.apache.spark.sql.SparkSession

/** Diagnostic main (not a spec): which query builders run Spark jobs at
  * plan-construction time? Feeds GraftCatalog.eagerQueries — run it
  * whenever a new query lands to check the eager list is still exact.
  * Pass 1 includes one-time memo builds (table schemas, lsh bits,
  * bloom); pass 2 is the steady-state per-build cost. */
object EagerProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    })
    def settle(): Int = { // marker + drain (listener bus is ordered)
      spark.range(1).count()
      Thread.sleep(200)
      jobs.get()
    }
    settle()
    val m0 = jobs.get()
    val markerCost = settle() - m0
    GraftCatalog.registerAll(spark, dir) // memoize table relations
    settle()
    for (pass <- 1 to 2)
      SparkEntry.queries.foreach { case (name, fn) =>
        val before = jobs.get()
        fn(spark, dir)
        val n = settle() - before - markerCost
        val flagged = GraftCatalog.eagerQueries(name)
        if (n > 0 || (pass == 1 && flagged))
          println(s"[eager] pass$pass $name jobs=$n listed=$flagged")
      }
    println("[eager] done")
    spark.stop()
  }
}
