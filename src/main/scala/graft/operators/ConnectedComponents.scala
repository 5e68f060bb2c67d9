package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components via LARGE-STAR / SMALL-STAR alternation
  * (Kiveris, Lattanzi, Mirrokni, Rastogi, Vassilvitskii: "Connected
  * Components in MapReduce and Beyond", ACM SoCC 2014 — the published
  * O(log n)-round algorithm for MapReduce-shaped engines).
  *
  * Why it exists next to `TextOps.dedupClusters`' plain min-label
  * propagation: propagation needs one round per hop of component
  * RADIUS. Near-dup clusters are usually shallow, but at 100 TB a
  * single pathological chain (A≈B≈C≈… pairwise-similar shingled spam)
  * makes the radius — and therefore the number of shuffles — O(n).
  * The star alternation contracts paths by at least half every round,
  * so a diameter-1M component still converges in ~2·log2(n) rounds of
  * the SAME per-round shape (two groupBy-min shuffles on compact
  * (long,long) edges; no text, no payload).
  *
  * Mechanics (per the paper):
  *  - large-star: every node attaches its strictly-LARGER neighbors to
  *    the minimum of its closed neighborhood;
  *  - small-star: with edges oriented large→small, every node attaches
  *    itself and its smaller neighbors to its minimum neighbor.
  * Both emit edges oriented large→small, so the orientation invariant
  * is established once and preserved. The fixpoint is a forest of
  * stars rooted at each component's minimum id.
  *
  * Convergence is DETECTED (edge-set fingerprint stable), not assumed,
  * and exhausting the round budget raises — same honesty contract as
  * dedupClusters. Per-round localCheckpoint truncates the iterative
  * lineage (the mandatory pattern; see BASELINE.md round-2 notes).
  */
object ConnectedComponents {

  /** One large-star step: input/output edges oriented src > dst. */
  private[operators] def largeStar(e: DataFrame): DataFrame = {
    val sym = e.union(e.select(col("dst").as("src"), col("src").as("dst")))
    val m = sym.groupBy("src").agg(min("dst").as("mn"))
      .select(col("src"), least(col("src"), col("mn")).as("m"))
    sym.join(m, "src")
      .filter(col("dst") > col("src")) // attach strictly-larger neighbors
      .select(col("dst").as("src"), col("m").as("dst"))
      .distinct()
  }

  /** One small-star step: input/output edges oriented src > dst. */
  private[operators] def smallStar(e: DataFrame): DataFrame = {
    val m = e.groupBy("src").agg(min("dst").as("m"))
    val nbrs = e.join(m, "src")
      .filter(col("dst") =!= col("m")) // v ∈ Γ(u) \ {m} → (v, m)
      .select(col("dst").as("src"), col("m").as("dst"))
    val self = m.select(col("src"), col("m").as("dst")) // u → m
    nbrs.union(self).distinct()
  }

  /** Order-independent fingerprint of a distinct edge set — one cheap
    * aggregate decides termination. */
  private def fingerprint(e: DataFrame): (Long, Long) = {
    // bit_xor, not sum: order-independent over the DISTINCT edge set and
    // immune to ANSI-mode long overflow on full-range hash values
    val r = e.agg(count(lit(1)),
      coalesce(expr("bit_xor(xxhash64(src, dst))"), lit(0L))).head()
    (r.getLong(0), r.getLong(1))
  }

  /** Labels `(id, root)` for every node of the undirected edge list
    * `(d1, d2)`; root = min id of the node's component. Returns the
    * label frame and the rounds taken (for specs/telemetry). */
  def labelsWithRounds(edges: DataFrame, maxRounds: Int = 24): (DataFrame, Int) = {
    var e = edges
      .select(greatest(col("d1"), col("d2")).as("src"),
        least(col("d1"), col("d2")).as("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct()
      .localCheckpoint(true)
    var prev = fingerprint(e)
    var rounds = 0
    var converged = false
    while (!converged) {
      rounds += 1
      e = smallStar(largeStar(e)).localCheckpoint(true)
      val f = fingerprint(e)
      converged = f == prev
      prev = f
      if (rounds >= maxRounds && !converged)
        throw new IllegalStateException(
          s"large-star/small-star did not converge in $maxRounds rounds — " +
            "edge fingerprint still moving; raise the budget")
    }
    // fixpoint = stars (v → root); roots appear only on the dst side
    val labels = e.select(col("src").as("id"), col("dst").as("root"))
      .union(e.select(col("dst").as("id"), col("dst").as("root")))
      .groupBy("id").agg(min("root").as("root"))
    (labels, rounds)
  }

  def labels(edges: DataFrame, maxRounds: Int = 24): DataFrame =
    labelsWithRounds(edges, maxRounds)._1
}
