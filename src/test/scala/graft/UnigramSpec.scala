package graft

import graft.operators.TextOps
import org.apache.spark.sql.functions._

/** Unigram-LM (SentencePiece) trainer: Viterbi laws, fixture EM
  * behavior, determinism, and corpus-level structure. Spec tier — the
  * EM/Viterbi fold has no DuckDB twin (same rule as vocab_bpe_merges);
  * these pins carry the correctness claim instead. */
class UnigramSpec extends SparkSpec {

  import spark.implicits._

  test("uniViterbi: segments concatenate to the word, min-cost wins, " +
    "ties prefer the longer piece, empty word segments empty") {
    val costs = Map("a" -> 10L, "b" -> 10L, "ab" -> 12L, "abab" -> 30L)
    // "abab": [abab]=30 beats [ab,ab]=24? no — 24 < 30; [a,b,a,b]=40
    assert(TextOps.uniViterbi("abab", costs) == Seq("ab", "ab"))
    // equal cost: [ab]=12 vs... make a tie: "ab" via [a,b]=20 vs [ab]=20
    val tie = Map("a" -> 10L, "b" -> 10L, "ab" -> 20L)
    assert(TextOps.uniViterbi("ab", tie) == Seq("ab"),
      "equal-cost tie must prefer the longer piece")
    assert(TextOps.uniViterbi("", costs).isEmpty)
    // concatenation identity on an arbitrary word
    val w = "abba"
    assert(TextOps.uniViterbi(w, costs).mkString == w)
    // alphabet loss must fail loudly, not silently mis-segment
    intercept[IllegalArgumentException] {
      TextOps.uniViterbi("c", costs)
    }
  }

  test("fixture EM: whole words win as pieces when frequent (the " +
    "unigram-vs-BPE signature), longer words decompose into learned " +
    "subwords, and training is deterministic") {
    val wf = Seq(("abab", 3L), ("ab", 2L)).toDF("word", "freq")
    val v1 = TextOps.unigramTrainFromWordFreq(spark, wf, vocabSize = 6, rounds = 2)
    val v2 = TextOps.unigramTrainFromWordFreq(spark, wf, vocabSize = 6, rounds = 2)
    assert(v1 == v2, "training must be bit-deterministic")
    // unigram selects pieces by LIKELIHOOD, so the frequent whole word
    // 'abab' IS the top piece (BPE could only reach it via merges) and
    // 'ab' survives for the standalone word
    val top = v1.map(t => t._1 -> t._2).toMap
    assert(v1.head._1 == "abab" && v1.head._2 == 3L,
      s"the frequent whole word must dominate: ${v1.take(3)}")
    assert(top.get("ab").contains(2L), s"'ab' must cover its word: $v1")
    // alphabet floor always present
    assert(Set("a", "b").subsetOf(v1.map(_._1).toSet))
    val costs = v1.map { case (p, _, g) => p -> g }.toMap
    assert(TextOps.uniViterbi("abab", costs) == Seq("abab"))
    // a word LONGER than the max piece length must decompose into the
    // learned subwords, not single characters
    val wf2 = Seq(("ababab", 3L), ("ab", 2L)).toDF("word", "freq")
    val v3 = TextOps.unigramTrainFromWordFreq(spark, wf2, vocabSize = 8, rounds = 2)
    val costs3 = v3.map { case (p, _, g) => p -> g }.toMap
    val seg = TextOps.uniViterbi("ababab", costs3)
    assert(seg.mkString == "ababab" && seg.size <= 3,
      s"expected multi-char decomposition, got $seg")
  }

  test("corpus training: vocab bounded, ranks dense, counts " +
    "non-increasing; segmentation covers every corpus word") {
    val v = TextOps.unigramVocab(spark, sf()).collect()
    assert(v.nonEmpty)
    assert(v.map(_.getLong(0)).toSeq == (1L to v.length).toSeq, "ranks not dense")
    val counts = v.map(_.getLong(3)).toSeq
    assert(counts == counts.sortBy(-_), "counts must be rank-ordered")
    val singles = v.count(_.getLong(2) == 1L)
    assert(v.length <= math.max(200, singles),
      s"vocab ${v.length} exceeds the target beyond the alphabet floor")
    val seg = TextOps.unigramSegmentCounts(spark, sf())
    val agg = seg.agg(sum("n_words"), sum("n_uni_tokens")).head()
    val totalWords = Tables.documents(spark, sf())
      .select(explode(split(col("text"), " "))).count()
    assert(agg.getLong(0) == totalWords,
      "the segment join must preserve every corpus token")
    assert(agg.getLong(1) >= agg.getLong(0) -
      Tables.documents(spark, sf())
        .select(explode(split(col("text"), " ")).as("w"))
        .filter(col("w") === "").count(),
      "every non-empty word yields at least one piece")
  }
}
