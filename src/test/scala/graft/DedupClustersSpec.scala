package graft

import graft.operators.{ConnectedComponents, TextOps}
import org.apache.spark.sql.functions._

/** Connected-component dedup clusters: label validity and convergence
  * of the fixed-round min-label propagation, plus the large-star/
  * small-star alternation (the O(log n)-round scale path). */
class DedupClustersSpec extends SparkSpec {

  /** Driver-side union-find ground truth for small graphs. */
  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  test("large-star/small-star: deep 64-node chain converges in O(log n) " +
    "rounds, not O(n)") {
    import spark.implicits._
    // path graph 0-1-2-...-63: radius 63 from the root, the worst case
    // for per-hop propagation
    val chain = (0L until 63L).map(i => (i, i + 1)).toDF("d1", "d2")
    val (labels, rounds) = ConnectedComponents.labelsWithRounds(chain)
    val got = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == 64)
    assert(got.values.forall(_ == 0L), "every chain node must label to 0")
    // 2*log2(64)=12; assert the O(log n) bound with slack — plain
    // propagation would need 63 rounds here
    assert(rounds <= 14, s"took $rounds rounds — not the O(log n) contraction")
  }

  test("large-star/small-star: multi-component graph matches union-find " +
    "and already-star graphs are immediate fixpoints") {
    import spark.implicits._
    val edges: Seq[(Long, Long)] = Seq(
      (5L, 9L), (9L, 2L), (2L, 11L),        // component rooted at 2
      (20L, 21L), (22L, 21L), (23L, 21L),   // star centered off-root
      (30L, 31L),                           // pair
      (40L, 41L), (41L, 42L), (42L, 40L))   // triangle
    val truth = unionFind(edges)
    val got = ConnectedComponents.labels(edges.toDF("d1", "d2"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == truth, s"labels $got != union-find $truth")

    // a rooted star is a fixpoint: one verification round, no relabeling
    val star = Seq((1L, 0L), (2L, 0L), (3L, 0L)).toDF("d1", "d2")
    val (starLabels, starRounds) = ConnectedComponents.labelsWithRounds(star)
    assert(starRounds == 1)
    assert(starLabels.collect().forall(_.getLong(1) == 0L))
  }

  test("large-star/small-star clusters equal the propagation clusters " +
    "on the corpus graph") {
    val viaProp = TextOps.dedupClusters(spark, sf())
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val viaStars = TextOps.dedupClustersLS(spark, sf())
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(viaStars == viaProp, "the two CC algorithms disagree")
  }

  test("cluster labels: root is a member, edges never cross clusters, " +
    "and an explicit extra propagation round is a no-op") {
    val clusters = TextOps.dedupClusters(spark, sf())
    val labels = clusters.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels.nonEmpty, "corpus must contain >=1 near-dup cluster")

    // every root is itself a clustered node labeled by itself
    labels.values.toSet.foreach { (root: Long) =>
      assert(labels(root) == root, s"root $root not labeled by itself")
    }
    // root = min member id per cluster
    labels.groupBy(_._2).foreach { case (root, members) =>
      assert(members.keys.min == root, s"cluster $root root is not the min id")
    }
    // no edge crosses two clusters (otherwise propagation hasn't converged)
    val edges = TextOps.ngramJaccardPairsAll(spark, sf())
      .filter(col("jaccard") >= 0.5)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1)))
    edges.foreach { case (a, b) =>
      assert(labels(a) == labels(b), s"edge ($a,$b) crosses clusters — not converged")
    }
    // explicit extra round: one more min-label propagation over the
    // symmetric edge list must change nothing (the literal fixpoint the
    // operator's convergence detection claims)
    val sym = edges ++ edges.map { case (a, b) => (b, a) }
    val nbrMin = sym.groupBy(_._1).map { case (id, es) =>
      id -> es.map(e => labels(e._2)).min
    }
    labels.foreach { case (id, root) =>
      val next = math.min(root, nbrMin.getOrElse(id, root))
      assert(next == root, s"extra round would relabel $id: $root -> $next")
    }
  }

  test("cross-source dup report: fractions sum to 1, pair mass matches " +
    "the thresholded pair set, source pairs are normalized") {
    import org.apache.spark.sql.functions._
    val rep = graft.operators.TextOps.crossSourceDupReport(spark, sf()).collect()
    assert(rep.nonEmpty, "no near-dup pairs at threshold 0.5 — fixture broke")
    val totalPairs = graft.operators.TextOps.ngramJaccardPairsAll(spark, sf())
      .filter(col("jaccard") >= 0.5).count()
    assert(rep.map(_.getAs[Long]("n_pairs")).sum == totalPairs,
      "report lost or duplicated pair mass")
    val fracSum = rep.map(_.getAs[Double]("frac")).sum
    assert(math.abs(fracSum - 1.0) < 1e-9, s"fracs sum to $fracSum")
    rep.foreach { r =>
      val (a, b) = (r.getAs[String]("src_a"), r.getAs[String]("src_b"))
      assert(a <= b, s"source pair not normalized: ($a, $b)")
      assert(r.getAs[Boolean]("cross_source") == (a != b))
    }
  }
}
