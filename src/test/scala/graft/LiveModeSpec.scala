package graft

import graft.operators.{Decide, OrderOps, WindowAgg}
import org.apache.spark.sql.functions._

/** The live-mode faces of the quarantined nondeterminism (SURVEY
  * §7.5(6), VERDICT r3 missing #3): seeded live is reproducible, fully
  * live matches the reference's wall-clock/uuid shape, and test mode is
  * bit-identical to the live path with the qty factor pinned to 1.0. */
class LiveModeSpec extends SparkSpec {

  private lazy val events = Tables.events(spark, sf())
  // localCheckpoint, NOT cache: a cache() here would be picked up by
  // canonicalized-plan matching in every other suite that plans
  // windowAgg on the shared session (PlanShapeSpec's exchange counts).
  // The checkpoint also pins partitioning, which seeded rand() output
  // depends on.
  private lazy val agg = WindowAgg.windowAgg(events).localCheckpoint(true)

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.orderBy("w_start", "symbol").collect().toSeq

  test("live(seed=k) is deterministic run-to-run and differs from test " +
    "mode where a real qty exists") {
    val a = rows(Decide.fromAgg(agg, Decide.Mode.liveSeeded(42)))
    val b = rows(Decide.fromAgg(agg, Decide.Mode.liveSeeded(42)))
    assert(a == b, "same seed, same partitioning → identical output")
    val t = rows(Decide.fromAgg(agg, Decide.Mode.Test))
    val liveQty = a.map(_.getAs[Double]("suggested_qty"))
    val testQty = t.map(_.getAs[Double]("suggested_qty"))
    assert(testQty.exists(_ > 0), "fixture must produce non-HOLD decisions")
    assert(liveQty != testQty, "the random factor must actually apply")
    // a different seed draws different factors
    val c = rows(Decide.fromAgg(agg, Decide.Mode.liveSeeded(7)))
    assert(c.map(_.getAs[Double]("suggested_qty")) != liveQty)
  }

  test("live qty = test qty × a factor inside [0.9, 1.1)") {
    val live = Decide.fromAgg(agg, Decide.Mode.liveSeeded(42))
      .select(col("w_start"), col("symbol"), col("suggested_qty").as("ql"))
    val test = Decide.fromAgg(agg, Decide.Mode.Test)
      .select(col("w_start"), col("symbol"), col("suggested_qty").as("qt"))
    val ratios = live.join(test, Seq("w_start", "symbol"))
      .filter(col("qt") > 0)
      .select(col("ql") / col("qt")).collect().map(_.getDouble(0))
    assert(ratios.nonEmpty)
    // floor-to-4dp on both sides perturbs the pure factor by <1e-4/qty
    assert(ratios.forall(r => r > 0.88 && r < 1.12),
      s"factor out of range: min=${ratios.min} max=${ratios.max}")
  }

  test("test mode IS the live path with the factor pinned to 1.0") {
    val viaFactor = rows(Decide.fromAggFactor(agg, lit(1.0)))
    val viaTest = rows(Decide.fromAgg(agg, Decide.Mode.Test))
    assert(viaFactor == viaTest)
  }

  test("fully-live decisions mint uuids and wall-clock timestamps; " +
    "seeded live keeps the replay-stable ids") {
    val uuidRe = "^[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}$".r
    val before = System.currentTimeMillis() - 3600000L
    val liveRows = Decide.decisionsNested(events, Decide.Mode.Live)
      .select("decision_id", "decided_at_ms").collect()
    val after = System.currentTimeMillis() + 3600000L
    assert(liveRows.nonEmpty)
    assert(liveRows.forall(r => uuidRe.matches(r.getString(0))),
      "decision_id must be a real uuid in the fully-live regime")
    assert(liveRows.forall { r =>
      val ts = r.getLong(1); ts > before && ts < after
    }, "decided_at_ms must be wall clock")
    // a second run mints different uuids — fully live is NOT idempotent
    val rerunIds = Decide.decisionsNested(events, Decide.Mode.Live)
      .select("decision_id").collect().map(_.getString(0)).toSet
    assert(rerunIds != liveRows.map(_.getString(0)).toSet)
    // seeded live: ids and timestamps identical to test mode (replayable)
    val seeded = Decide.decisionsNested(events, Decide.Mode.liveSeeded(42))
      .select("w_start", "symbol", "decision_id", "decided_at_ms")
    val testm = Decide.decisionsNested(events)
      .select("w_start", "symbol", "decision_id", "decided_at_ms")
    assert(rows(seeded) == rows(testm))
  }

  test("fully-live orders mint wall-clock client ids (OrderService.kt:132-133 " +
    "shape); test mode keeps the idempotency-key form") {
    val idRe = "^ORD-\\d+-[0-9a-f]{8}$".r
    val uuidRe = "^[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}$".r
    val d = Decide.decisions(events)
    val live = OrderOps.fromDecisions(spark, d, Decide.Mode.Live)
      .select("client_order_id", "order_id").collect()
    assert(live.nonEmpty)
    assert(live.forall(r => idRe.matches(r.getString(0))), "ORD-{millis}-{uuid8}")
    assert(live.forall(r => uuidRe.matches(r.getString(1))))
    val test = OrderOps.fromDecisions(spark, d)
      .select("client_order_id").collect().map(_.getString(0))
    assert(test.forall(_.matches("^ORD-\\d+-[A-Z0-9]+$")),
      "test mode must keep ORD-{w_start}-{symbol}")
  }
}
