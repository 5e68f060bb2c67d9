package graft

import graft.operators.TextOps

/** The hashed-document ANN's quality contract against its own recall
  * oracle: `emb_hash_ann` prunes the scan to the nprobe=2 probed cells
  * (~2/16 of the corpus for balanced cells), and this spec pins what
  * that pruning costs in recall@3 against the brute-force
  * `emb_hash_topk` ground truth over the SAME shared embedding
  * artifact. Measured r6: mean recall@3 = 0.362 at sf0.01 (46 queries)
  * and 0.458 at sf0.1 (260 queries) vs the 0.125 a random 2-cell scan
  * would give — the floor asserts ≥ 0.3 so a refactor that silently
  * breaks assignment (wrong tie order, float creep, probe loss) fails
  * loudly while honest variance across SFs passes. */
class HashAnnRecallSpec extends SparkSpec {

  test("emb_hash_ann recall@3 vs the brute-force oracle is >= 0.3 " +
    "(~3x the probed-mass floor), and every ANN hit's sim is the " +
    "exact brute-force cosine") {
    val bf = TextOps.hashEmbedTopK(spark, sf()).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    val truth = bf.keys.groupBy(_._1).map { case (q, ps) =>
      q -> ps.map(_._2).toSet
    }
    val ann = TextOps.hashEmbedAnn(spark, sf()).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getDouble(4)))
    val got = ann.groupBy(_._1).map { case (q, rs) =>
      q -> rs.map(_._2).toSet
    }
    // ANN queries are exactly the brute-force queries (same eval split
    // over the same artifact); a query whose probed cells are empty
    // would vanish from the output, which the recall mean must punish,
    // so key the mean on the TRUTH set
    val recalls = truth.map { case (q, t) =>
      got.getOrElse(q, Set.empty).intersect(t).size.toDouble / t.size
    }.toSeq
    assert(recalls.nonEmpty)
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.3, f"mean recall@3 $mean%.3f < 0.3 floor " +
      s"(${recalls.count(_ == 0)} of ${recalls.size} queries at zero)")
    // exactness of the rerank: wherever ANN and brute force agree on a
    // pair, the similarity must be the IDENTICAL double — the ANN path
    // reranks with the same LongDot/cosine pipeline, not an approximation
    ann.foreach { case (q, c, sim) =>
      bf.get((q, c)).foreach { s =>
        assert(s == sim, s"sim mismatch on ($q,$c): ann=$sim bf=$s")
      }
    }
  }
}
