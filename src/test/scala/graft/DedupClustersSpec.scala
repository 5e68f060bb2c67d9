package graft

import graft.operators.TextOps
import org.apache.spark.sql.functions._

/** Connected-component dedup clusters: label validity and convergence
  * of the fixed-round min-label propagation. */
class DedupClustersSpec extends SparkSpec {

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
}
