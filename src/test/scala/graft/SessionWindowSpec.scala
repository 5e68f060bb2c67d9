package graft

import graft.operators.Relational
import org.apache.spark.sql.functions._

/** The native `session_window` operator must agree with the manual
  * gaps-and-islands sessionization (same 30-min gap) — the native form is
  * what the streaming face uses; the manual form is what the DuckDB
  * oracle checks. */
class SessionWindowSpec extends SparkSpec {

  test("session_window == gaps-and-islands on session count and bounds") {
    val gap = "30 minutes"
    val e = Tables.events(spark, sf())
    val native = e
      .groupBy(session_window(col("ts"), gap).as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        min(unix_millis(col("ts"))).as("session_start"))
      .select("user_id", "session_start", "n_events")
    val manual = Relational.sessionize(spark, sf())
      .select("user_id", "session_start", "n_events")
    val a = native.collect().map(_.toSeq).toSet
    val b = manual.collect().map(_.toSeq).toSet
    assert(a.nonEmpty)
    assert(a == b)
  }
}
