package graft
import org.apache.spark.sql.SparkSession

/** Throwaway dev probe — time a single SparkEntry query repeatedly.
  * Usage: runMain graft.Probe <name> <sfDir> [reps]
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 3
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    SparkEntry.queries("q1_pricing")(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    for (i <- 1 to reps) {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      println(f"[probe] $name rep$i ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    SparkEntry.queries(name)(spark, sfDir).explain("formatted")
    spark.stop()
  }
}
