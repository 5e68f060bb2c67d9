package graft

import graft.operators.MinHashOps
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** The persisted corpus artifact (writeNearDupArtifact) must be a
  * drop-in replacement for the in-memory derivation: screening a batch
  * against the artifact yields bit-identical pairs to the in-memory
  * incremental sweep over the unioned frames. */
class ArtifactDedupSpec extends SparkSpec {

  import spark.implicits._

  test("artifact-backed incremental screening ≡ in-memory incremental " +
    "sweep, including the corpus-side df-cut") {
    val corpus = ((0 until 3).map { j =>
      val phrase = (0 until 14).map(k => s"a${j}_$k").mkString(" ")
      (10L + j, "en", s"$phrase x$j")
    } ++ // a corpus-hot phrase: 30 docs sharing all bands, df-cut fodder
      (0 until 30).map { i =>
        (300L + i, "en", (0 until 12).map(k => s"hot$k").mkString(" ") + s" u$i")
      } ++
      (0 until 20).map(i =>
        (400L + i, "en", (0 until 12).map(k => s"c${i}_$k").mkString(" ")))
      ).toDF("doc_id", "lang", "text")
    val batch = ((0 until 3).map { j =>
      val phrase = (0 until 14).map(k => s"a${j}_$k").mkString(" ")
      (1000L + j, "en", s"$phrase y$j")
    } :+ ((1100L, "en", (0 until 12).map(k => s"hot$k").mkString(" ") + " uz"))
      ).toDF("doc_id", "lang", "text")

    val path = Files.createTempDirectory("neardup-artifact").toString
    MinHashOps.writeNearDupArtifact(spark, corpus, path)

    val viaArtifact = MinHashOps
      .incrementalNearDupVsArtifact(spark, path, batch, 10)
      .select("d1", "d2", "jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

    val inMemory = MinHashOps.incrementalNearDupFrame(
      spark, corpus.unionByName(batch), col("doc_id") >= 1000L, 10)
      .select("d1", "d2", "jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

    assert(viaArtifact == inMemory,
      s"artifact path diverged: artifact=$viaArtifact inMemory=$inMemory")
    // the 3 planted cross pairs survive; the hot-phrase probe finds
    // nothing (its corpus buckets have df=30 > cap 10)
    assert(viaArtifact.map(p => (p._1, p._2)) ==
      Set((10L, 1000L), (11L, 1001L), (12L, 1002L)),
      s"expected exactly the planted cross pairs: $viaArtifact")
  }
}
