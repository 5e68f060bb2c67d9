package graft

import graft.operators.Relational
import org.apache.spark.sql.functions._

/** Ordering and consistency laws of the funnel and retention queries —
  * what the oracle's value-compare can't state as invariants. */
class FunnelSpec extends SparkSpec {

  test("funnel: stage timestamps are ordered, converted ⟺ purchase " +
    "stage reached, stages only regress to null together") {
    val f = Relational.eventsFunnel(spark, sf())
    assert(f.filter(col("first_click_ms") < col("first_view_ms")).isEmpty,
      "qualified click before first view")
    assert(f.filter(col("first_purchase_ms") < col("first_click_ms")).isEmpty,
      "conversion before qualified click")
    assert(f.filter(col("converted") =!= col("first_purchase_ms").isNotNull).isEmpty)
    assert(f.filter(col("first_click_ms").isNotNull &&
      col("first_view_ms").isNull).isEmpty, "click stage without view stage")
    assert(f.filter(col("first_purchase_ms").isNotNull &&
      col("first_click_ms").isNull).isEmpty, "purchase stage without click stage")
  }

  test("funnel plan: one hash exchange serves both window passes and " +
    "the per-user aggregate") {
    val p = Relational.eventsFunnel(spark, sf())
      .queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(p).length == 1,
      s"expected the single user_id exchange:\n$p")
  }

  test("retention: day-0 row equals each cohort's size, offsets " +
    "non-negative, counts bounded by cohort size") {
    val r = Relational.eventsRetention(spark, sf()).cache()
    assert(r.filter(col("k") < 0).isEmpty)
    val day0 = r.filter(col("k") === 0)
      .select(col("cohort_day"), col("n_users").as("c0"))
    // every cohort has a day-0 row (its members were active that day)
    val cohorts = r.select("cohort_day").distinct()
    assert(day0.count() == cohorts.count(), "a cohort lost its day-0 row")
    assert(r.join(day0, "cohort_day").filter(col("n_users") > col("c0")).isEmpty,
      "retention exceeded cohort size")
    r.unpersist()
  }
}
