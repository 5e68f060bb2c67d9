package graft.operators

import graft.Tables
import graft.plans.GraftFunctions
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** MinHash + LSH near-duplicate detection and SimHash fingerprinting —
  * the scale-path dedup operators of the LLM-data-pipeline tier.
  *
  * MinHash/LSH pipeline: shingle → 64-bit gram id (md5 prefix) → k=12
  * permutation minima (universal hashing mod P) → 4 bands × 3 rows →
  * band-bucket postings → candidate pairs from each bucket (no self-join,
  * same postings-pair pattern as TextOps.ngramJaccardPairs) → exact
  * Jaccard verification on the candidate pairs only. At 100 TB the
  * band-bucket join touches ~s³-probability candidates per band instead
  * of every shingle collision — the standard sub-quadratic near-dup
  * sweep. All arithmetic is integer-only (overflow-safe mod P < 2^31,
  * products < 2^62), so the DuckDB oracle matches exactly.
  *
  * SimHash: 16-bit sign-aggregated token-hash fingerprint per document —
  * integer-only, oracle-exact; Hamming-adjacent buckets are the
  * candidate pairs at scale.
  */
object MinHashOps {

  val P = 1000000007L
  val K = 12 // minhashes
  val Bands = 4 // × 3 rows each
  val RowsPerBand: Int = K / Bands

  /** deterministic universal-hash parameters (odd multipliers) */
  def hashParams(i: Int): (Long, Long) = (2L * i + 3L, 104729L * (i + 1))

  /** 60-bit integer id of a shingle from its md5 prefix, reduced mod P —
    * identical in the oracle: CAST('0x'||substr(md5(g),1,15) AS BIGINT). */
  private def gramId(g: Column): Column =
    conv(substring(md5(g.cast("binary")), 1, 15), 16, 10).cast("long") % P

  /** integer ids of a shingle array — materialize this as its own column
    * before calling `signature`: the md5-based id is the expensive part,
    * and referencing a local Column would clone its subtree into every
    * one of the K minhash expressions (K× the md5 work). */
  def gramIds(grams: Column): Column = transform(grams, g => gramId(g))

  /** the k-minhash signature over a MATERIALIZED gram-id column */
  def signature(ids: Column): Column =
    array((0 until K).map { i =>
      val (a, b) = hashParams(i)
      array_min(transform(ids, x => (lit(a) * x + lit(b)) % P))
    }: _*)

  /** band hashes: combine each band's rows into one bucket key */
  def bandHashes(sig: Column): Column =
    array((0 until Bands).map { b =>
      (0 until RowsPerBand).foldLeft(lit(0L)) { (acc, r) =>
        (acc * 1009L + element_at(sig, b * RowsPerBand + r + 1)) % P
      }
    }: _*)

  /** Candidate pairs from LSH band buckets, verified with exact Jaccard.
    * Output: top-50 pairs by exact similarity (deterministic). */
  def minhashLshPairs(spark: SparkSession, dir: String): DataFrame =
    minhashLshPairsAll(spark, dir).limit(50)

  /** The same pipeline WITHOUT the presentation top-k cut — every
    * LSH-surfaced pair that verification confirms. MinHashRecallSpec
    * measures recall on this stage so the limit can't mask (or fake)
    * a candidate-generation miss. */
  def minhashLshPairsAll(spark: SparkSession, dir: String): DataFrame =
    minhashLshPairsFrame(spark, Tables.documentsPar(spark, dir), TextOps.DfCap)

  /** The shared (grams, band-postings) stage of every MinHash consumer:
    * (doc_id, lang, grams) from the SHARED shingle artifact
    * (TextOps.gramsTable — one cache serves jaccard, clusters,
    * contamination and this pipeline; it feeds candidate generation AND
    * both verify sides; the size filter sits ABOVE the cache so it
    * evaluates against the materialized grams column, not re-deriving
    * the shingle expression inside the scan), plus the exploded
    * (doc_id, lang, band_idx, band_hash) posting rows.
    *
    * The postings explode a LITERAL index array and pick the band by
    * element_at — NOT posexplode(bands): a generator over an array
    * column computed in the same stage re-enters the interpreted
    * expression chain per emitted row (measured 10×: 46 s vs 4 s at
    * sf0.1). The literal generator keeps the computed column as a plain
    * carried attribute. The slim postings frame is itself CACHED: the
    * df-cut's count pass and every pair/join pass read it, and the
    * K-permutation minhash signature behind it is the expensive part. */
  /** `cache = false` for callers in a micro-batch loop (NearDupIngest):
    * each batch is a fresh plan, so registering per-batch caches would
    * accumulate for the session; the batch is consumed once per side
    * anyway. */
  private[graft] def bandPostings(spark: SparkSession, docsIn: DataFrame,
      cache: Boolean = true): (DataFrame, DataFrame) = {
    val docsGrams0 =
      if (cache) TextOps.gramsTable(spark, docsIn)
      else TextOps.gramsFrame(docsIn)
    val docsGrams = docsGrams0.filter(size(col("grams")) > 0)
    val exploded0 = postingsFromGrams(spark, docsGrams)
    val exploded = if (cache) graft.Artifacts.shared(exploded0) else exploded0
    (docsGrams, exploded)
  }

  /** Band postings from an ALREADY-SHINGLED (doc_id, lang, grams) frame
    * — the signature derives from the grams column alone, which is what
    * lets NearDupIngest.repairArtifact rebuild postings from the stored
    * grams half of the artifact without re-reading any text. */
  private[graft] def postingsFromGrams(spark: SparkSession,
      docsGrams: DataFrame): DataFrame =
    docsGrams
      .withColumn("sig", GraftFunctions.graftMinhash(spark, "grams"))
      .withColumn("bands", bandHashes(col("sig")))
      .select(col("doc_id"), col("lang"),
        explode(array((0 until Bands).map(lit(_)): _*)).as("band_idx"),
        col("bands"))
      .withColumn("band_hash", element_at(col("bands"), col("band_idx") + 1))
      .drop("bands")

  /** Exact-Jaccard verification of a candidate (d1, d2) frame against
    * the grams table(s) — shared tail of the symmetric, incremental and
    * artifact-backed sweeps (candidate counts are LSH-bounded before
    * this join). d1 resolves against `gramsLeft`, d2 against
    * `gramsRight` (the same frame for symmetric callers). */
  private def verifyJaccard(cand: DataFrame, gramsLeft: DataFrame,
      gramsRight: DataFrame): DataFrame = {
    val g1 = gramsLeft.select(col("doc_id").as("d1"), col("grams").as("grams1"))
    val g2 = gramsRight.select(col("doc_id").as("d2"), col("grams").as("grams2"))
    cand.join(g1, "d1").join(g2, "d2")
      .withColumn("common", size(array_intersect(col("grams1"), col("grams2"))).cast("long"))
      .withColumn("n1", size(col("grams1")).cast("long"))
      .withColumn("n2", size(col("grams2")).cast("long"))
      .withColumn("jaccard",
        col("common").cast("double") / (col("n1") + col("n2") - col("common")))
      .select("d1", "d2", "common", "n1", "n2", "jaccard")
  }

  /** The pipeline over any (doc_id, lang, text) frame — the testable
    * core (DfCutSpec drives it with a planted hot bucket + small cap). */
  private[graft] def minhashLshPairsFrame(
      spark: SparkSession, docsIn: DataFrame, dfCap: Int): DataFrame = {
    val (docsGrams, exploded) = bandPostings(spark, docsIn)
    pairsFromPostings(spark, docsGrams, exploded, dfCap)
      .orderBy(col("jaccard").desc, col("d1"), col("d2"))
  }

  /** The symmetric pair sweep over prebuilt (grams, postings) frames —
    * shared by minhashLshPairsFrame and NearDupIngest's within-batch
    * screen. Hot buckets (a degenerate band value shared by >dfCap
    * docs) are DROPPED by the two-pass df-cut before the collect,
    * bounding the aggregation buffer (VERDICT r3 defect #1) — same cut,
    * same cap, and same oracle twin as TextOps.ngramJaccardPairsFrame. */
  private[graft] def pairsFromPostings(spark: SparkSession,
      docsGrams: DataFrame, exploded: DataFrame, dfCap: Int): DataFrame = {
    val cand = TextOps.dfCut(exploded, Seq("lang", "band_idx", "band_hash"), dfCap)
      .groupBy("lang", "band_idx", "band_hash")
      .agg(sort_array(collect_list(col("doc_id"))).as("ds"))
      .filter(size(col("ds")) > 1)
      .select(GraftFunctions.graftPairsGen(spark, "ds"))
      .select(col("l").as("d1"), col("r").as("d2"))
      .distinct()
    verifyJaccard(cand, docsGrams, docsGrams)
  }

  /** INCREMENTAL near-dup screening — the continuous-ingestion flow: a
    * NEW batch of documents is checked against the EXISTING corpus
    * without ever re-pairing the corpus against itself. At 100 TB this
    * asymmetry is the whole point: the corpus side's band postings are
    * the artifact a production pipeline keeps materialized (here the
    * shared postings cache), and each arriving batch only pays
    * |batch| × K signature work plus one equi-join on the band-bucket
    * key — candidate pairs exist only where a batch band collides with
    * a corpus band, and the batch side is broadcastable whenever the
    * batch is small (AQE decides; no collect_list at all on this path,
    * so the only buffered state is the corpus df-cut's count pass).
    * The df-cut drops corpus-hot buckets (boilerplate bands) before the
    * join — same cap, same drop semantics, same oracle lockstep as the
    * symmetric sweep.
    *
    * The query face slices the shared corpus deterministically (md5
    * sample bucket < 3 → a 30% "new batch") so the DuckDB oracle can
    * repeat the split; production passes a real batch predicate — or a
    * separate frame unioned in — through `incrementalNearDupFrame`.
    * Output pairs are (d1 = corpus doc, d2 = batch doc); batch-internal
    * duplicates are the NEXT round's corpus problem (the symmetric
    * sweep covers them) and are deliberately not re-found here. */
  def incrementalNearDup(spark: SparkSession, dir: String): DataFrame =
    incrementalNearDupFrame(spark, Tables.documentsPar(spark, dir),
      TextOps.sampleBucket < 3, TextOps.DfCap)
      .orderBy(col("jaccard").desc, col("d1"), col("d2"))
      .limit(50)

  /** The incremental pipeline over any (doc_id, lang, text) frame with
    * an explicit batch-membership predicate (must be expressible over
    * the postings columns, i.e. doc_id/lang). */
  private[graft] def incrementalNearDupFrame(
      spark: SparkSession, docsIn: DataFrame, isNew: Column,
      dfCap: Int): DataFrame = {
    val (docsGrams, exploded) = bandPostings(spark, docsIn)
    val tagged = exploded.withColumn("is_new", isNew)
    val corpus = TextOps.dfCut(
      tagged.filter(!col("is_new")), Seq("lang", "band_idx", "band_hash"), dfCap)
    val batch = tagged.filter(col("is_new"))
    val cand = corpus
      .select(col("doc_id").as("d1"), col("lang"), col("band_idx"), col("band_hash"))
      .join(batch.select(
          col("doc_id").as("d2"), col("lang"), col("band_idx"), col("band_hash")),
        Seq("lang", "band_idx", "band_hash"))
      .select("d1", "d2")
      .distinct()
    verifyJaccard(cand, docsGrams, docsGrams)
  }

  /** Persist the corpus-side near-dup artifact — shingle sets + band
    * postings — as parquet: the CROSS-SESSION form of the shared
    * in-memory caches. A production pipeline materializes this once per
    * corpus snapshot (the expensive interpreted shingle + K-permutation
    * signature work happens exactly once), and every arriving batch
    * reads it instead of re-deriving the corpus. The postings table is
    * the natural bucketing candidate (band_hash) for a co-located
    * candidate join; at this surface it ships as plain parquet and the
    * join shuffles on the band key once. */
  def writeNearDupArtifact(spark: SparkSession, docsIn: DataFrame,
      path: String): Unit = {
    val (docsGrams, exploded) = bandPostings(spark, docsIn)
    docsGrams.write.mode("overwrite").parquet(s"$path/grams")
    exploded.write.mode("overwrite").parquet(s"$path/postings")
  }

  /** Incremental near-dup screening of a NEW batch frame against a
    * PERSISTED corpus artifact (writeNearDupArtifact): same candidate
    * and verify shape as `incrementalNearDupFrame`, but the corpus side
    * comes off disk — only the batch pays signature work. Output parity
    * with the in-memory path is pinned by ArtifactDedupSpec. */
  def incrementalNearDupVsArtifact(spark: SparkSession, artifactPath: String,
      batchDocs: DataFrame, dfCap: Int,
      batchSides: Option[(DataFrame, DataFrame)] = None): DataFrame = {
    val corpusPostings = spark.read.parquet(s"$artifactPath/postings")
    val corpusGrams = spark.read.parquet(s"$artifactPath/grams")
    val (batchGrams, batchPostings) =
      batchSides.getOrElse(bandPostings(spark, batchDocs))
    val corpusCut = TextOps.dfCut(
      corpusPostings, Seq("lang", "band_idx", "band_hash"), dfCap)
    val cand = corpusCut
      .select(col("doc_id").as("d1"), col("lang"), col("band_idx"), col("band_hash"))
      .join(batchPostings.select(
          col("doc_id").as("d2"), col("lang"), col("band_idx"), col("band_hash")),
        Seq("lang", "band_idx", "band_hash"))
      .select("d1", "d2")
      .distinct()
    verifyJaccard(cand, corpusGrams, batchGrams)
  }

  /** 16-bit SimHash of the token multiset (token hash = 28-bit md5
    * prefix; per-bit ±1 vote over all tokens; bit set when the vote is
    * positive). Integer-only and unrolled per bit — bit b uses plain
    * div/mod by 2^b, no shift operators, so the oracle can repeat it
    * verbatim. */
  def tokenHashes(toks: Column): Column = transform(toks, t =>
    conv(substring(md5(t.cast("binary")), 1, 7), 16, 10).cast("long"))

  /** simhash over a MATERIALIZED token-hash column (same cloning caveat
    * as gramIds: 16 bit-votes would otherwise each re-hash every token) */
  def simhashCol(hashes: Column): Column = {
    (0 until 16).map { b =>
      val pow = 1L << b
      val vote = aggregate(hashes, lit(0L),
        (acc, h) => acc + ((h.cast("long") / lit(pow)).cast("long") % 2L) * 2L - 1L)
      when(vote > 0, lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  def simhash(spark: SparkSession, dir: String): DataFrame =
    Tables.documentsPar(spark, dir)
      .withColumn("toks", TextOps.tokens)
      .withColumn("thashes", tokenHashes(col("toks")))
      .withColumn("simhash16", simhashCol(col("thashes")))
      .select("doc_id", "simhash16")
      .orderBy("doc_id")

  /** SimHash NEAR-DUP PAIRS — the Hamming-adjacent sweep the simhash
    * scaladoc promises: every doc emits 17 probe keys (its simhash and
    * all 16 one-bit flips), and two docs share a probe iff
    * `a xor b = flip_a xor flip_b` — i.e. exactly the pairs within
    * Hamming distance 2, found by equi-join on the compact probe key
    * with NO doc×doc comparison. Hot probe buckets (a degenerate
    * simhash value shared by >dfCap docs) drop via the same two-pass
    * df-cut as every postings source; the exact popcount verify then
    * keeps pairs at distance ≤ 2. Integer-only throughout — the oracle
    * repeats it token-identically.
    *
    * Scale note (same lesson the LSH bit width taught): a 16-bit
    * fingerprint keeps this presentation query consistent with
    * doc_simhash, but total pair volume grows ~N²/2^16 — at sf0.1 the
    * full set is already 1.6M pairs — so production widens the
    * fingerprint with the corpus (64-bit simhash keeps expected
    * collisions flat to ~10^9 docs); the df-cut bounds any single
    * degenerate bucket either way, and the top-100 cut keeps the
    * output stable at any SF. */
  def simhashPairs(spark: SparkSession, dir: String): DataFrame =
    simhashPairsFrame(spark, Tables.documentsPar(spark, dir), TextOps.DfCap)
      .orderBy(col("hamming"), col("d1"), col("d2"))
      .limit(100)

  private[graft] def simhashPairsFrame(
      spark: SparkSession, docsIn: DataFrame, dfCap: Int): DataFrame = {
    // (doc_id, simhash16) cached: probes AND both verify sides read it,
    // and the 16-bit-vote fold over every token is the dominant cost
    val sh = graft.Artifacts.shared(docsIn
      .withColumn("toks", TextOps.tokens)
      .withColumn("thashes", tokenHashes(col("toks")))
      .select(col("doc_id"), simhashCol(col("thashes")).as("sh")))
    val flips = array((Seq(0L) ++ (0 until 16).map(b => 1L << b)).map(lit(_)): _*)
    val probes = sh
      .select(col("doc_id"), col("sh"), explode(flips).as("flip"))
      .select(col("doc_id"), col("sh").bitwiseXOR(col("flip")).as("probe"))
    val cand = TextOps.dfCut(probes, Seq("probe"), dfCap)
      .groupBy("probe")
      .agg(sort_array(collect_list(col("doc_id"))).as("ds"))
      .filter(size(col("ds")) > 1)
      .select(GraftFunctions.graftPairsGen(spark, "ds"))
      .select(col("l").as("d1"), col("r").as("d2"))
      .distinct()
    val s1 = sh.select(col("doc_id").as("d1"), col("sh").as("sh1"))
    val s2 = sh.select(col("doc_id").as("d2"), col("sh").as("sh2"))
    // popcount via the same div/mod bit walk as simhashCol (no shift
    // ops, so the oracle repeats it verbatim); xor < 2^16 so the
    // double-divide + floor-cast is exact
    val x = col("sh1").bitwiseXOR(col("sh2"))
    val hamming = (0 until 16).map { b =>
      (x / lit(1L << b)).cast("long") % 2L
    }.reduce(_ + _)
    cand.join(s1, "d1").join(s2, "d2")
      .withColumn("hamming", hamming)
      .filter(col("hamming") <= 2)
      .select("d1", "d2", "sh1", "sh2", "hamming")
      .orderBy("d1", "d2")
  }
}
