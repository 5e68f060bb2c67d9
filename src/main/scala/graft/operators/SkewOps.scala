package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities — the manual counterpart of AQE's runtime
  * skew-join split (SkewJoinSpec pins that path) for plans where AQE
  * can't help: a shuffle join whose HOT KEY concentrates on one reducer
  * while the dim side is too large to broadcast, or an engine run with
  * AQE disabled. `TextOps.topTokensSalted` is the aggregation face of
  * the same idea; this is the join face.
  */
object SkewOps {

  /** Salted equi-join: every `dim` row is replicated `salts` ways, every
    * `fact` row gets a deterministic salt in [0, salts), and the join
    * runs on (keys..., salt) — identical result set to the plain join
    * (each fact row meets exactly the one dim replica carrying its
    * salt), but a hot key's rows spread across `salts` reducers instead
    * of one.
    *
    * The salt is a hash of the whole fact row (not rand()): replays and
    * task retries re-derive the same salt, keeping the operator
    * deterministic end-to-end. Cost model: dim side shuffles `salts`×
    * its size — use for dims that are modest but above the broadcast
    * threshold; for tiny dims `broadcast()` already wins, and for
    * balanced keys the plain join's one-reducer-per-key is optimal. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, keys: Seq[String],
      salts: Int): DataFrame = {
    require(salts > 0, s"salts must be positive, got $salts")
    val saltCol = pmod(xxhash64(fact.columns.map(col): _*), lit(salts.toLong))
      .cast("int")
    val f = fact.withColumn("__salt", saltCol)
    val d = dim.withColumn("__salt",
      explode(array((0 until salts).map(lit(_)): _*)))
    f.join(d, keys :+ "__salt").drop("__salt")
  }
}
