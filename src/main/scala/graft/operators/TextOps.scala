package graft.operators

import graft.Tables
import graft.plans.GraftFunctions
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators for the LLM-data-pipeline tier (builder brief):
  * token statistics, language-ID, quality scoring, fingerprinting — all
  * pure column expressions (whole-stage codegen, no UDFs), one scan of
  * `documents`, embarrassingly parallel at 100 TB.
  */
object TextOps {

  /** Whitespace tokens of the document text. */
  def tokens: Column = split(col("text"), " ")

  /** Distinct word n-grams (shingles) over a MATERIALIZED tokens column,
    * n=3. Always derive shingles from a dedicated `toks` column, never
    * inline `split(...)`: higher-order functions run interpreted (no
    * codegen), so an inlined split would re-tokenize the document for
    * every element access — O(len²) per row. Documents shorter than n
    * tokens yield an empty set (guarded — `sequence` would happily count
    * backwards otherwise). */
  def wordTrigrams(t: Column): Column =
    array_distinct(
      when(size(t) < 3, array().cast("array<string>")).otherwise(
        transform(sequence(lit(1), size(t) - 2), i =>
          concat_ws(" ", element_at(t, i), element_at(t, i + 1), element_at(t, i + 2)))))

  /** BPE-ish subword segmentation regex: maximal consonant*-vowel+ onsets
    * or trailing consonant runs — a deterministic stand-in for a learned
    * BPE merge table; `n_subwords / n_tokens` is the tokenizer-fertility
    * cost proxy a training pipeline budgets by. Plain alternation +
    * character classes, so Java (Spark) and RE2 (oracle) agree. */
  val SubwordRegex = "[bcdfghjklmnpqrstvwxyz]*[aeiou]+|[bcdfghjklmnpqrstvwxyz]+"

  /** Token counting + type/token ratio + BPE-ish subword counts (cost
    * proxies for a training-data pipeline). All counts emitted as BIGINT
    * for oracle type parity. */
  def tokenStats(spark: SparkSession, dir: String): DataFrame =
    Tables.documentsPar(spark, dir)
      .withColumn("toks", tokens)
      .withColumn("n_tokens", size(col("toks")).cast("long"))
      .withColumn("n_chars_clean", length(regexp_replace(col("text"), " ", "")).cast("long"))
      .withColumn("n_distinct", size(array_distinct(col("toks"))).cast("long"))
      .withColumn("ttr", col("n_distinct").cast("double") / col("n_tokens"))
      .withColumn("avg_token_len", col("n_chars_clean").cast("double") / col("n_tokens"))
      .withColumn("n_subwords", regexp_count(col("text"), lit(SubwordRegex)).cast("long"))
      .withColumn("bpe_fertility", col("n_subwords").cast("double") / col("n_tokens"))
      .select("doc_id", "lang", "n_tokens", "n_chars_clean", "n_distinct",
        "ttr", "avg_token_len", "n_subwords", "bpe_fertility")
      .orderBy("doc_id")

  /** Language-ID by marker-token scoring — the classic stopword-profile
    * heuristic. The marker sets are tuned to the synthetic corpus
    * vocabulary so the argmax actually varies; ties break alphabetically
    * (deterministic). */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("window", "merge"),
    "en" -> Seq("the", "a"),
    "es" -> Seq("data", "table"),
    "fr" -> Seq("value", "filter"),
    "zh" -> Seq("spark", "stream"))

  def langId(spark: SparkSession, dir: String): DataFrame = {
    val scored = langMarkers.foldLeft(
      Tables.documentsPar(spark, dir).withColumn("toks", tokens)) {
      case (df, (lang, markers)) =>
        df.withColumn(s"s_$lang",
          size(filter(col("toks"), t => t.isin(markers.map(lit(_)): _*))).cast("long"))
    }
    val best = greatest(langMarkers.map { case (l, _) => col(s"s_$l") }: _*)
    // foldRight keeps alphabetical priority: 'de' wins ties, then 'en', …
    val predicted = langMarkers.foldRight(lit("und"): Column) {
      case ((lang, _), acc) => when(col(s"s_$lang") === best, lit(lang)).otherwise(acc)
    }
    scored.withColumn("predicted", predicted)
      .withColumn("match_label", (col("predicted") === col("lang")).cast("boolean"))
      .select(Seq(col("doc_id"), col("lang")) ++
        langMarkers.map { case (l, _) => col(s"s_$l") } ++
        Seq(col("predicted"), col("match_label")): _*)
      .orderBy("doc_id")
  }

  /** Quality scoring: length/stopword/diversity mix in [0,1] — the usual
    * pre-training filter signal. Doubles derive only from integer counts
    * via formulas repeated token-identically in the oracle. */
  def quality(spark: SparkSession, dir: String): DataFrame =
    qualityStats(spark, dir).orderBy("doc_id")

  /** quality WITHOUT the presentation sort — the face aggregating
    * consumers (corpusReport) cache: materializing an artifact that ends
    * in a global orderBy pays a full-corpus sort the aggregate discards;
    * the per-doc query re-adds its sort ON TOP of this cached subtree,
    * so both consumers share one materialization. */
  private[graft] def qualityStats(spark: SparkSession, dir: String): DataFrame =
    qualitySignals(Tables.documentsPar(spark, dir))
      .select("doc_id", "n_tokens", "n_stop", "n_distinct", "stop_ratio",
        "ttr", "quality")

  /** Signals-only face of the quality score: adds the columns and keeps
    * every input column — pure per-row arithmetic, no aggregation, so it
    * composes into BATCH AND STREAMING plans alike (the gopherSignals
    * contract; streaming.CorpusStats builds on exactly this property). */
  private[graft] def qualitySignals(docsIn: DataFrame): DataFrame =
    docsIn
      .withColumn("toks", tokens)
      .withColumn("n_tokens", size(col("toks")).cast("long"))
      .withColumn("n_stop",
        size(filter(col("toks"), t => t.isin("the", "a"))).cast("long"))
      .withColumn("n_distinct", size(array_distinct(col("toks"))).cast("long"))
      .withColumn("stop_ratio", col("n_stop").cast("double") / col("n_tokens"))
      .withColumn("ttr", col("n_distinct").cast("double") / col("n_tokens"))
      .withColumn("quality",
        least(lit(1.0), col("n_tokens") / 100.0) * 0.5
          + (lit(1.0) - col("stop_ratio")) * 0.3 + col("ttr") * 0.2)
      .drop("toks")

  /** Document fingerprinting: full-content MD5 (exact-dup key), a 60-bit
    * integer prefix of it (compact join/bucket key), the distinct shingle
    * count (near-dup prefilter signal), and a token-level POLYNOMIAL
    * ROLLING HASH (base-31 left fold of per-token 28-bit md5-prefix
    * hashes mod 1e9+7) — the order-sensitive content key: documents with
    * the same words in a different order collide on nothing else here.
    *
    * The rolling hash runs as the RollingHashUnits expression (r8):
    * the composed `aggregate` HOF fold — kept below as the parity twin
    * — paid n interpreted lambda frames + n md5 Column evals per row,
    * DecompProbe-measured at 55% of this query (over the r2 doGenCode
    * gate's 20% line, r7 verdict #3); the expression does one JVM loop
    * per row, bit-identical (ExpressionParitySpec + this query's own
    * DuckDB twin). */
  def fingerprint(spark: SparkSession, dir: String): DataFrame =
    Tables.documentsPar(spark, dir)
      .withColumn("toks", tokens)
      .withColumn("fp_md5", md5(col("text").cast("binary")))
      .withColumn("fp64", conv(substring(col("fp_md5"), 1, 15), 16, 10).cast("long"))
      .withColumn("n_shingles",
        size(GraftFunctions.graftTrigrams(spark, "toks")).cast("long"))
      .withColumn("fp_roll", GraftFunctions.graftRollHash(spark, "toks"))
      .select("doc_id", "fp_md5", "fp64", "n_shingles", "fp_roll")
      .orderBy("doc_id")

  /** The composed rolling-hash fold — ExpressionParitySpec's twin for
    * RollingHashUnits (and DecompProbe's measurement face). */
  private[graft] def fpRollComposed(toks: Column): Column =
    aggregate(toks, lit(0L), (acc, t) =>
      (acc * lit(31L)
        + conv(substring(md5(t.cast("binary")), 1, 7), 16, 10).cast("long"))
        % lit(1000000007L))

  /** WINNOWING fingerprint selection (Schleimer, Wilkerson & Aiken,
    * SIGMOD 2003 — the MOSS primitive): hash every positional 3-token
    * k-gram (the 28-bit md5-prefix idiom of `fingerprint`'s rolling
    * hash), slide a window of [[WinnowW]] consecutive hashes, and
    * select each window's MINIMUM — the guarantee is that any match of
    * at least w+k-1 tokens between two documents shares a selected
    * fingerprint, at ~2/(w+1) the density of keeping every gram.
    * Documents with fewer grams than the window winnow the whole gram
    * list (one window); under 3 tokens have no grams and select
    * nothing.
    *
    * Per-document ARRAY arithmetic only — zero shuffle, embarrassingly
    * parallel at 100 TB; emitted signature columns are all
    * order-independent (distinct-count, min, max, and an exact BIGINT
    * sum of the selected set) so the oracle needs no list-order
    * assumptions and a cross-doc overlap join keys on any of them. */
  val WinnowW = 4

  /** The shared (doc_id, n_grams, sel) winnow frame — cached because
    * both consumers (the per-doc signature report and the cross-doc
    * overlap pairs) would otherwise re-run the per-row gram/hash/
    * window derivation. */
  private[graft] def winnowSel(spark: SparkSession, dir: String): DataFrame =
    graft.Artifacts.shared(winnowSelFrame(spark, dir))

  /** The UNCACHED winnow-selection derivation — the pre-flight face
    * reads this so a planning call never pins a corpus-scale cache
    * (r10 review); the query faces go through [[winnowSel]], whose
    * shared cache serves the three selection consumers. */
  private[graft] def winnowSelFrame(spark: SparkSession, dir: String): DataFrame = {
    val w = WinnowW
    (
      Tables.documentsPar(spark, dir)
        .withColumn("toks", tokens)
        .withColumn("grams",
          when(size(col("toks")) < 3, array().cast("array<string>"))
            .otherwise(transform(sequence(lit(1), size(col("toks")) - 2), i =>
              concat_ws(" ", element_at(col("toks"), i),
                element_at(col("toks"), i + 1), element_at(col("toks"), i + 2)))))
        .withColumn("hs", transform(col("grams"), g =>
          conv(substring(md5(g.cast("binary")), 1, 7), 16, 10).cast("long")))
        .withColumn("sel",
          when(size(col("hs")) === 0, array().cast("array<long>"))
            .otherwise(array_distinct(
              transform(sequence(lit(1), greatest(size(col("hs")) - w + 1, lit(1))),
                j => array_min(slice(col("hs"), j, lit(w)))))))
        .select(col("doc_id"),
          size(col("grams")).cast("long").as("n_grams"), col("sel")))
  }

  def winnow(spark: SparkSession, dir: String): DataFrame = {
    val w = WinnowW
    winnowSel(spark, dir)
      .select(col("doc_id"), col("n_grams"),
        when(col("n_grams") === 0L, 0L)
          .otherwise(greatest(col("n_grams") - (w - 1), lit(1L)))
          .as("n_windows"),
        size(col("sel")).cast("long").as("n_selected"),
        coalesce(array_min(col("sel")), lit(0L)).as("fp_min"),
        coalesce(array_max(col("sel")), lit(0L)).as("fp_max"),
        aggregate(col("sel"), lit(0L), (a, x) => a + x).as("sel_sum"))
      .orderBy("doc_id")
  }

  /** Cross-document winnow overlap — what the MOSS selection is FOR:
    * two documents sharing any sufficiently long token run share a
    * selected fingerprint, so the fingerprint postings join surfaces
    * local-match candidates the whole-document measures (Jaccard over
    * the full shingle set, SimHash) dilute away. Scored by CONTAINMENT
    * (common / min(n1, n2)): a short document wholly embedded in a
    * long one scores 1.0 where Jaccard would score near 0.
    *
    * Same scale shape as the n-gram pair sweep: postings-driven pair
    * generation (no self-join of the corpus), the two-pass df-cut
    * dropping fingerprints hotter than `dfCap` before any collect_list,
    * pairs bounded per group by construction. The exploded postings
    * are (doc_id, n_sel, fp) — three scalars, never text.
    *
    * THE CAP IS THE SCALE LEVER (r9, measured — PairMassProbe +
    * BASELINE.md §Round 9): the pair stage emits Σ_{df≤cap} df·(df−1)/2
    * rows, and a fingerprint's df grows WITH the corpus, so at a fixed
    * absolute cap the pair MASS crosses a quadratic regime (~97× per
    * 10× docs between sf1 and sf10 at cap 1000) until mid-frequency
    * grams saturate the cap; wall-clock tracks the mass, not the input
    * rows, at any shuffle width. A production run sets the cap to its
    * quality target — a fingerprint shared by hundreds of documents is
    * stopword mass, not dedup evidence — and the plan is then linear in
    * the mass that target implies (measured ≈ input-linear at cap 50).
    *
    * PRE-FLIGHT (r9 verdict #3): [[winnowPairMass]] returns the exact
    * pair-stage row count this sweep will emit at a given cap — one
    * cheap aggregate, run it before a production-scale sweep instead
    * of discovering the quadratic regime as a wedged stage; it WARNs
    * and counts ([[quadraticPairRegimes]]) past [[PairMassWarnRatio]]. */
  def winnowPairs(spark: SparkSession, dir: String,
      dfCap: Int = DfCap, preflight: Boolean = false): DataFrame = {
    // no size>0 filter: explode already drops empty-selection docs
    val e = winnowSel(spark, dir)
      .withColumn("n_sel", size(col("sel")).cast("long"))
      .select(col("doc_id"), col("n_sel"), explode(col("sel")).as("fp"))
    // opt-in composed pre-flight over the sweep's OWN postings frame
    // (the shared winnowSel cache serves both, unlike the standalone
    // planning face winnowPairMass which stays uncached)
    if (preflight) preflightPairSweep(e, Seq("fp"), dfCap, "winnow")
    val pairs = postingsPairs(spark, e, Seq("fp"),
      struct(col("doc_id"), col("n_sel")), dfCap)
    pairs.groupBy(col("l.doc_id").as("d1"), col("r.doc_id").as("d2"),
        col("l.n_sel").as("n1"), col("r.n_sel").as("n2"))
      .agg(count(lit(1)).as("common"))
      .withColumn("containment",
        col("common").cast("double") / least(col("n1"), col("n2")))
      .select("d1", "d2", "common", "n1", "n2", "containment")
      .orderBy(col("containment").desc, col("d1"), col("d2"))
      .limit(100)
  }

  /** Exact deduplication: keeper = min doc_id per identical text.
    * The document is reduced to (doc_id, md5 fingerprint) BEFORE the
    * window's exchange, so the shuffle moves two narrow columns instead
    * of the corpus — at 100 TB that's 16-byte keys on the wire, not
    * document bodies (VERDICT r1 "What's wrong" #4). Reads `documents`
    * directly (no repartition): md5 is codegen'd and cheap, so the scan's
    * own splits are parallelism enough. */
  def dedupExact(spark: SparkSession, dir: String): DataFrame = {
    val slim = Tables.documents(spark, dir)
      .select(col("doc_id"), md5(col("text").cast("binary")).as("fp"))
    val w = Window.partitionBy("fp")
    slim.withColumn("keeper_id", min(col("doc_id")).over(w))
      .withColumn("is_dup", (col("doc_id") =!= col("keeper_id")).cast("boolean"))
      .select("doc_id", "keeper_id", "is_dup")
      .orderBy("doc_id")
  }

  /** Canonical-corpus materialization after exact dedup: one row per
    * distinct text (the min-doc_id keeper) with its multiplicity — the
    * "write the deduplicated training set" step. Same slim-shuffle shape
    * as dedupExact: only (doc_id, fingerprint) rides the exchange. */
  def dedupCanonical(spark: SparkSession, dir: String): DataFrame = {
    val slim = Tables.documents(spark, dir)
      .select(col("doc_id"), md5(col("text").cast("binary")).as("fp"))
    val w = Window.partitionBy("fp")
    slim.withColumn("keeper_id", min(col("doc_id")).over(w))
      .withColumn("n_copies", count(lit(1)).over(w).cast("long"))
      .filter(col("doc_id") === col("keeper_id"))
      .select(col("doc_id"), col("fp"), col("n_copies"))
      .orderBy("doc_id")
  }

  /** NORMALIZED dedup — the case/punctuation-insensitive pass a corpus
    * pipeline runs beside exact dedup: lowercase, strip non-alnum,
    * collapse runs of spaces, trim; keeper = min doc_id per normalized
    * fingerprint. Same slim-shuffle shape as dedupExact: only
    * (doc_id, 16-byte fp) rides the exchange, the normalization itself
    * is per-row codegen'd regex work in the scan stage. (The DuckDB
    * twin needs the 'g' flag — its regexp_replace is first-match-only
    * by default, Spark's replaces all.) */
  def dedupNormalized(spark: SparkSession, dir: String): DataFrame = {
    val norm = trim(regexp_replace(
      regexp_replace(lower(col("text")), "[^a-z0-9 ]", ""), " +", " "))
    val slim = Tables.documents(spark, dir)
      .withColumn("norm", norm)
      .select(col("doc_id"), md5(col("norm").cast("binary")).as("norm_fp"),
        length(col("norm")).cast("long").as("n_chars_norm"))
    val w = Window.partitionBy("norm_fp")
    slim.withColumn("keeper_id", min(col("doc_id")).over(w))
      .withColumn("is_dup", (col("doc_id") =!= col("keeper_id")).cast("boolean"))
      .select("doc_id", "norm_fp", "n_chars_norm", "keeper_id", "is_dup")
      .orderBy("doc_id")
  }

  /** Deterministic stratified sampling: hash-bucket each document on a
    * seeded md5 of its id and keep bucket 0 — a reproducible ~10% sample
    * per language with NO shuffle and no RNG state (the only sampling
    * that is replay-stable across a 1000-executor backfill). */
  def sampleStratified(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("bucket", sampleBucket)
      .filter(col("bucket") === 0)
      .select(col("doc_id"), col("lang"), col("bucket"))
      .orderBy("doc_id")

  /** Skew-safe corpus term frequency: two-phase SALTED aggregation.
    * A plain groupBy(token) sends every occurrence of a hot token ("the")
    * to one reducer — the classic straggler at 100 TB. Salting first
    * groups on (token, hash(doc) % 16) so the hot key fans out over 16
    * partial sums, then the tiny per-salt partials re-aggregate. Exact
    * same result, bounded per-reducer load. */
  def topTokensSalted(spark: SparkSession, dir: String): DataFrame = {
    val salted = Tables.documentsPar(spark, dir)
      .withColumn("toks", tokens)
      .select(col("doc_id"), explode(col("toks")).as("token"))
      .withColumn("salt", pmod(xxhash64(col("doc_id")), lit(16)))
      .groupBy("token", "salt")
      .agg(count(lit(1)).as("partial"))
    salted.groupBy("token")
      .agg(sum(col("partial")).as("n"))
      .orderBy(col("n").desc, col("token"))
      .limit(50)
  }

  /** APPROXIMATE heavy hitters — the sketch tier beside the exact
    * `topTokensSalted`, same rule as approx_distinct/approx_percentiles:
    * at 100 TB even the salted exact top-k shuffles one row per DISTINCT
    * token; the Misra-Gries ItemsSketch instead ships ONE bounded sketch
    * per partition (≤ `MaxMapSize` counters each) to the driver and
    * merges — the exchange is O(partitions), independent of both corpus
    * and vocabulary size. NO_FALSE_NEGATIVES guarantees every true heavy
    * hitter surfaces; estimates carry explicit lower/upper bounds, and
    * when the vocabulary fits the map (as in the synthetic corpus) the
    * sketch is EXACT — the spec asserts equality with the salted truth
    * there, and bound-containment always. Per-partition sketches ride as
    * serialized bytes (mapPartitions is the sketch-building idiom — the
    * same class of action as the bloom build); driver state is
    * partitions × sketch bytes, bounded. Deterministic for a fixed
    * input + partitioning (no RNG in Misra-Gries). */
  val MaxMapSize = 1024

  /** Per-partition sketch build + driver merge — shared by the batch
    * query here and streaming.TrendingTokens so the two faces can never
    * drift (same map size, serde, merge). */
  private[graft] def sketchTokens(spark: SparkSession, toks: DataFrame)
      : org.apache.datasketches.frequencies.ItemsSketch[String] = {
    import org.apache.datasketches.common.ArrayOfStringsSerDe
    import org.apache.datasketches.frequencies.ItemsSketch
    import org.apache.datasketches.memory.Memory
    import spark.implicits._
    val m = MaxMapSize
    val parts: Array[Array[Byte]] = toks.as[String]
      .mapPartitions { it =>
        val sk = new ItemsSketch[String](m)
        it.foreach(sk.update)
        Iterator.single(sk.toByteArray(new ArrayOfStringsSerDe))
      }.collect()
    val serde = new ArrayOfStringsSerDe
    parts.foldLeft(new ItemsSketch[String](m)) { (acc, b) =>
      acc.merge(ItemsSketch.getInstance(Memory.wrap(b), serde))
    }
  }

  /** Render a frequencies sketch as the (token, est, lb, ub) top-k frame
    * — ONE formatting (NO_FALSE_NEGATIVES, (-est, token) tie-break) for
    * both the batch and streaming faces. */
  private[graft] def sketchTopK(spark: SparkSession,
      sk: org.apache.datasketches.frequencies.ItemsSketch[String],
      k: Int): DataFrame = {
    import org.apache.datasketches.frequencies.ErrorType
    import spark.implicits._
    sk.getFrequentItems(ErrorType.NO_FALSE_NEGATIVES)
      .map(r => (r.getItem, r.getEstimate, r.getLowerBound, r.getUpperBound))
      .sortBy { case (t, est, _, _) => (-est, t) }
      .take(k).toSeq
      .toDF("token", "est", "lb", "ub")
  }

  def approxTopTokens(spark: SparkSession, dir: String, k: Int = 50): DataFrame =
    sketchTopK(spark,
      sketchTokens(spark, Tables.documentsPar(spark, dir)
        .select(explode(tokens).as("token"))),
      k)

  /** Non-distinct word-trigram list — repetition signals need the
    * multiplicity that wordTrigrams' set semantics throw away. */
  def wordTrigramsAll(t: Column): Column =
    when(size(t) < 3, array().cast("array<string>")).otherwise(
      transform(sequence(lit(1), size(t) - 2), i =>
        concat_ws(" ", element_at(t, i), element_at(t, i + 1), element_at(t, i + 2))))

  /** Within-document REPETITION signals — the Gopher-style quality
    * filters a pre-training pipeline cuts on: duplicate-trigram ratio
    * (1 - distinct/total) and the most-frequent trigram's share of all
    * trigram occurrences. Docs shorter than 3 tokens have no trigrams
    * and drop out. Two aggregations on compact keys — (doc_id, gram)
    * then doc_id — all counts integer (order-independent, bit-exact);
    * the two ratios derive from them in single divisions. The hot-key
    * risk of a groupBy(gram) does NOT exist here: grouping is by
    * (doc_id, gram), so a corpus-frequent gram spreads over its
    * documents. */
  def repetition(spark: SparkSession, dir: String): DataFrame = {
    val g = Tables.documentsPar(spark, dir)
      .withColumn("toks", tokens)
      .select(col("doc_id"), explode(wordTrigramsAll(col("toks"))).as("gram"))
    g.groupBy("doc_id", "gram").agg(count(lit(1)).as("cnt"))
      .groupBy("doc_id")
      .agg(sum("cnt").as("total_grams"),
        count(lit(1)).as("distinct_grams"),
        max("cnt").as("top_gram_cnt"))
      .withColumn("dup_ratio",
        lit(1.0) - col("distinct_grams").cast("double") / col("total_grams"))
      .withColumn("top_gram_frac",
        col("top_gram_cnt").cast("double") / col("total_grams"))
      .select("doc_id", "total_grams", "distinct_grams", "top_gram_cnt",
        "dup_ratio", "top_gram_frac")
      .orderBy("doc_id")
  }

  /** End-to-end corpus CURATION — the composed keep/drop decision that
    * actually builds the training set: quality score ≥ 0.5, language-ID
    * agreement, exact-dup keeper, and not benchmark-contaminated.
    *
    * Plan shape (the one you'd want at 100 TB): the per-row signals
    * (quality AND lang-ID, which share one tokenization) compute in a
    * SINGLE scan of `documents`; exact-dup adds one slim window shuffle
    * on the md5 fingerprint of the same rows (no second scan); only
    * contamination — inherently a second derivation over the shared
    * shingle artifact — joins in from outside, as a left join against
    * its (small) flagged set. Naively joining the four public operators
    * would scan the corpus four times and tokenize twice. Formulas are
    * expression-identical to quality()/langId()/dedupExact(), so the
    * oracle twin can keep REUSING those verified SQL texts. */
  def curate(spark: SparkSession, dir: String): DataFrame =
    curateStats(spark, dir).orderBy("doc_id")

  /** curate without the presentation sort (qualityStats' contract —
    * trainingSet caches this face). */
  private[graft] def curateStats(spark: SparkSession, dir: String): DataFrame = {
    val toksed = Tables.documentsPar(spark, dir).withColumn("toks", tokens)
    // quality (formula of quality()) and lang-ID (argmax of langId())
    // over the one materialized toks column
    val scored = langMarkers.foldLeft(toksed) { case (df, (lang, markers)) =>
      df.withColumn(s"s_$lang",
        size(filter(col("toks"), t => t.isin(markers.map(lit(_)): _*))).cast("long"))
    }
    val best = greatest(langMarkers.map { case (l, _) => col(s"s_$l") }: _*)
    val predicted = langMarkers.foldRight(lit("und"): Column) {
      case ((lang, _), acc) => when(col(s"s_$lang") === best, lit(lang)).otherwise(acc)
    }
    val sig = scored
      .withColumn("n_tokens", size(col("toks")).cast("long"))
      .withColumn("n_stop",
        size(filter(col("toks"), t => t.isin("the", "a"))).cast("long"))
      .withColumn("n_distinct", size(array_distinct(col("toks"))).cast("long"))
      .withColumn("stop_ratio", col("n_stop").cast("double") / col("n_tokens"))
      .withColumn("ttr", col("n_distinct").cast("double") / col("n_tokens"))
      .withColumn("quality",
        least(lit(1.0), col("n_tokens") / 100.0) * 0.5
          + (lit(1.0) - col("stop_ratio")) * 0.3 + col("ttr") * 0.2)
      .withColumn("match_label", (predicted === col("lang")).cast("boolean"))
      .select(col("doc_id"), col("quality"), col("match_label"),
        (sampleBucket === 0).as("is_eval"),
        md5(col("text").cast("binary")).as("fp"))
    val w = Window.partitionBy("fp")
    val withDup = sig
      .withColumn("is_dup", (col("doc_id") =!= min(col("doc_id")).over(w)).cast("boolean"))
    val contam = contamination(spark, dir)
      .select(col("doc_id"), lit(true).as("contaminated"))
    // the eval bucket itself is EXCLUDED from the training keep-set —
    // contamination only flags train docs sharing grams with the eval
    // split, so without this predicate the held-out docs themselves
    // would flow into the corpus (and into curatedTopK) as keepers
    withDup.join(contam, Seq("doc_id"), "left")
      .withColumn("contaminated", coalesce(col("contaminated"), lit(false)))
      .withColumn("keep",
        col("quality") >= 0.5 && col("match_label")
          && !col("is_dup") && !col("contaminated") && !col("is_eval"))
      .select("doc_id", "quality", "match_label", "is_dup", "contaminated",
        "is_eval", "keep")
  }

  /** Cross-document SPAN dedup (C4-style, Raffel et al. 2020 — C4 drops
    * duplicated three-sentence spans; the span unit here is `chunk`'s
    * 16-token stride-8 window): per document, how many of its chunks
    * also occur verbatim in ANOTHER document, and how many of those it
    * "borrowed" (a lower doc_id holds the same span — the keeper rule
    * shared with every dedup tier). Within-doc repetition deliberately
    * does NOT count (that's `repetition`'s signal); the span table
    * groups on the compact chunk_md5 key, so a corpus-hot boilerplate
    * span skews a partition but never blows up row counts (the
    * spans-side is one row per distinct span, join fan-out ≤ 1 per
    * chunk row — the rarity/tfidf shape). */
  def spanDedup(spark: SparkSession, dir: String): DataFrame =
    spanDedupFrame(Tables.documentsPar(spark, dir))

  private[graft] def spanDedupFrame(docs: DataFrame): DataFrame =
    spanStats(docs).orderBy("doc_id")

  /** spanDedup without the presentation sort (qualityStats' contract —
    * trainingSet caches this face). */
  private[graft] def spanStats(docs: DataFrame): DataFrame = {
    // the slim (doc_id, chunk_md5) frame feeds BOTH the span-stats
    // aggregate and the join-back; cached, or the tokenize+slice+md5
    // chunk derivation runs twice (ExplainProbe showed the double scan)
    val ch = graft.Artifacts.shared(
      chunkFrame(docs).select("doc_id", "chunk_md5"))
    val spans = ch.groupBy("chunk_md5").agg(
      countDistinct(col("doc_id")).as("n_docs"),
      min(col("doc_id")).as("keeper"))
    ch.join(spans, "chunk_md5")
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_chunks"),
        sum(when(col("n_docs") > 1L, 1L).otherwise(0L)).as("n_dup_spans"),
        sum(when(col("n_docs") > 1L && col("keeper") =!= col("doc_id"), 1L)
          .otherwise(0L)).as("n_borrowed"))
      .withColumn("dup_frac",
        col("n_dup_spans").cast("double") / col("n_chunks"))
      .select("doc_id", "n_chunks", "n_dup_spans", "n_borrowed", "dup_frac")
  }

  /** Token width of the exact-substring dedup gram (Lee et al. 2022 use
    * 50 BPE tokens on web corpora; 8 whitespace tokens keeps the same
    * granularity ratio against this corpus's ~100-token documents). */
  val SubstrK = 8

  /** Cross-document EXACT-SUBSTRING dedup (Lee et al. 2022, "Deduplicating
    * Training Data Makes Language Models Better" — the ExactSubstr side of
    * that paper, complementing the document-level MinHash side this tier
    * already has): find every MAXIMAL token span that occurs verbatim in
    * more than one document and report, per document, how much of it is
    * duplicated text. Their suffix-array formulation is replaced by the
    * equivalent postings shape Spark wants: a span of ≥ K tokens is
    * duplicated iff every one of its K-token windows is, so positional
    * K-gram hashes + cross-document collision + merge-adjacent-positions
    * reconstructs exactly the maximal duplicated spans.
    *
    * Pipeline: (1) one scan emits (doc_id, pos, h) positional K-gram
    * 60-bit md5-prefix hashes; (2) a gram is cross-doc duplicated iff its
    * hash group spans ≥ 2 distinct docs — detected as min(doc_id) ≠
    * max(doc_id), a BOUNDED two-long aggregate state, so unlike the
    * pair sweeps this needs NO df-cut: corpus-hot boilerplate costs one
    * group, never a postings list; (3) the duplicated-hash set joins back
    * one row per distinct hash (the rarity/tfidf fan-out-≤1 shape);
    * (4) per document, duplicated start positions sorted once merge into
    * maximal islands (gap > K breaks; a window partitioned by doc_id, so
    * the sort is bounded by document length, never corpus size). Island
    * [p0..p1] covers p1−p0+K tokens; islands are disjoint by
    * construction, so per-doc sums never exceed n_tokens.
    *
    * Integer-exact throughout (positions, counts, one final division),
    * and the hash idiom is the shared md5-prefix convention, so the
    * DuckDB twin lands bit-identically. Within-doc-only repetition
    * deliberately does NOT count (that's `repetition`'s signal), matching
    * `spanDedup`'s cross-doc convention on its coarser chunk unit. */
  def substringDedup(spark: SparkSession, dir: String): DataFrame =
    substringDedupFrame(Tables.documentsPar(spark, dir))

  private[graft] def substringDedupFrame(docs: DataFrame): DataFrame =
    substringDedupFrame(docs, SubstrK)

  private[graft] def substringDedupFrame(docs: DataFrame, k: Int): DataFrame =
    substringStats(docs, k).orderBy("doc_id")

  /** The positional K-gram hash frame (doc_id, pos, h) — the shared
    * derivation of the batch face and streaming.SubstrIngest. */
  private[graft] def substrPosFrame(docs: DataFrame, k: Int): DataFrame =
    docs
      .withColumn("toks", tokens)
      .withColumn("n_grams",
        greatest(size(col("toks")).cast("long") - (k - 1), lit(0L)))
      .select(col("doc_id"), col("n_grams"),
        posexplode(when(col("n_grams") > 0,
          expr(s"""transform(sequence(0L, n_grams - 1L),
            i -> conv(substring(md5(cast(concat_ws(' ', slice(toks, cast(i + 1 as int), $k)) as binary)), 1, 15), 16, 10))"""))
          .otherwise(array().cast("array<string>"))))
      .select(col("doc_id"), col("pos").cast("long").as("pos"),
        col("col").cast("long").as("h"))

  /** Per-document island statistics over duplicated (doc_id, pos) rows:
    * merge positions ≤ K apart into maximal spans (the gaps-and-islands
    * fold — windows partition by doc_id, bounded by document length)
    * and emit (n_spans, n_dup_pos, dup_tokens). Shared by the batch
    * face and streaming.SubstrIngest. */
  private[graft] def substrIslands(dupPos: DataFrame, k: Int): DataFrame =
    substrSpanExtents(dupPos, k)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_spans"),
        sum(col("n_pos")).as("n_dup_pos"),
        sum(col("p1") - col("p0") + k).as("dup_tokens"))

  /** The (h, mn, mx) per-hash doc-id bounds — ONE full-corpus
    * aggregate over the shared gram frame serving BOTH the report's
    * min≠max duplicated-hash filter and the strip's lower-id-peer
    * rule (running the two as separate aggregates paid the largest
    * intermediate's shuffle twice per session). Cached like the gram
    * frame itself; the aggregate state stays two longs per group. */
  private def substrHashBounds(docs: DataFrame, k: Int): DataFrame =
    graft.Artifacts.shared(
      graft.Artifacts.shared(substrPosFrame(docs, k))
        .groupBy("h")
        .agg(min(col("doc_id")).as("mn"), max(col("doc_id")).as("mx")))

  /** The per-(doc, island) extent stage `substrIslands` folds into
    * counts — exposed because the strip face needs the spans
    * themselves. Windows partition by doc_id (bounded by document
    * length); islands are disjoint by construction. */
  private[graft] def substrSpanExtents(dupPos: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy("doc_id").orderBy("pos")
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    dupPos
      .withColumn("prev", lag(col("pos"), 1).over(w))
      .withColumn("brk",
        when(col("prev").isNull || col("pos") - col("prev") > k, 1L).otherwise(0L))
      .withColumn("island", sum(col("brk")).over(run))
      .groupBy("doc_id", "island")
      .agg(min(col("pos")).as("p0"), max(col("pos")).as("p1"),
        count(lit(1)).as("n_pos"))
  }

  /** substringDedup without the presentation sort (qualityStats'
    * contract — corpusReport caches this face). */
  private[graft] def substringStats(docs: DataFrame, k: Int): DataFrame = {
    val base = docs
      .withColumn("toks", tokens)
      .withColumn("n_tokens", size(col("toks")).cast("long"))
      .withColumn("n_grams",
        greatest(col("n_tokens") - (k - 1), lit(0L)))
    // (doc_id, pos, h) positional K-gram hashes — cached: the frame feeds
    // both the duplicated-hash aggregate and the position join-back, and
    // uncached the tokenize+slice+md5 derivation (interpreted transform)
    // would run twice per consumer.
    val pos = graft.Artifacts.shared(substrPosFrame(docs, k))
    // cross-document duplicated hashes: min≠max over doc_id — two longs
    // of aggregate state per group, hot grams stay bounded
    val dupH = substrHashBounds(docs, k)
      .filter(col("mn") =!= col("mx"))
      .select("h")
    val perDoc = substrIslands(pos.join(dupH, "h").select("doc_id", "pos"), k)
    base.select("doc_id", "n_tokens", "n_grams")
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"), col("n_grams"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("n_dup_pos"), lit(0L)).as("n_dup_pos"),
        coalesce(col("dup_tokens"), lit(0L)).as("dup_tokens"),
        (col("n_tokens") - coalesce(col("dup_tokens"), lit(0L))).as("clean_tokens"),
        (coalesce(col("dup_tokens"), lit(0L)).cast("double") / col("n_tokens"))
          .as("dup_frac"))
  }

  /** EXACT-SUBSTRING REMOVAL (`doc_substring_strip`) — the other half
    * of Lee et al. 2022's ExactSubstr: `substringDedup` REPORTS the
    * duplicated mass (and the ingest tier REJECTS majority-duplicated
    * documents); production pipelines additionally STRIP the
    * duplicated spans from the surviving copies, so exactly ONE
    * occurrence of every duplicated passage remains in the corpus.
    * Keep-first-occurrence at the document grain: a position is
    * stripped iff a LOWER doc_id holds the same K-gram hash (the
    * lower-id-peer convention the ingest tier shares) — the lowest
    * holder keeps its copy verbatim; the report's symmetric min≠max
    * convention would delete BOTH copies. Within-document repetition
    * is deliberately untouched (`repetition`'s signal, not cross-doc
    * mass); an exact duplicate of a lower doc strips to empty text.
    *
    * Shape: the shared positional-gram artifact feeds one bounded
    * min-per-hash aggregate (two-long state, no df-cut needed — the
    * substringDedup argument) and the same gaps-and-islands merge;
    * per-doc span lists are bounded by document length, and the kept
    * tokens reassemble in order with ONE index-filter higher-order
    * function per row — no shuffle after the span aggregation.
    * Output: (doc_id, n_tokens, removed_tokens, kept_tokens,
    * stripped).
    *
    * CAVEAT the report tier doesn't share: a 60-bit hash COLLISION is
    * destructive here — it deletes up to K tokens of innocent text,
    * where in `substringDedup` it only inflated a count (and the
    * bit-exact oracle, sharing the hash, is blind to it). Birthday
    * bound: ~1 expected collision near 2^30 ≈ 1e9 distinct grams, so
    * at the 100 TB scale the hardening is a verbatim token-compare on
    * the dp candidates against the min-holder's slice (one extra
    * bounded join of the collided positions only) before stripping —
    * named here rather than silently risked. */
  def substringStrip(spark: SparkSession, dir: String): DataFrame =
    substringStripFrame(Tables.documentsPar(spark, dir), SubstrK)

  private[graft] def substringStripFrame(docs: DataFrame, k: Int): DataFrame = {
    val pos = graft.Artifacts.shared(substrPosFrame(docs, k))
    // doc_id > mn already implies mn != mx — the ONE shared bounds
    // aggregate serves the report's min≠max filter and this rule
    val dp = pos.join(substrHashBounds(docs, k).select("h", "mn"), "h")
      .filter(col("doc_id") > col("mn")).select("doc_id", "pos")
    val spans = substrSpanExtents(dp, k)
      .select(col("doc_id"),
        struct(col("p0").as("a"), (col("p1") + (k - 1)).as("b")).as("sp"))
      .groupBy("doc_id")
      .agg(collect_list(col("sp")).as("spans"))
    docs
      .withColumn("toks", tokens)
      .join(spans, Seq("doc_id"), "left")
      .withColumn("spans", coalesce(col("spans"),
        array().cast("array<struct<a:bigint,b:bigint>>")))
      .withColumn("kept", expr(
        "filter(toks, (t, i) -> NOT exists(spans, s -> i >= s.a AND i <= s.b))"))
      .select(col("doc_id"),
        size(col("toks")).cast("long").as("n_tokens"),
        (size(col("toks")) - size(col("kept"))).cast("long")
          .as("removed_tokens"),
        size(col("kept")).cast("long").as("kept_tokens"),
        array_join(col("kept"), " ").as("stripped"))
      .orderBy("doc_id")
  }

  /** GOPHER-style rule signals (Rae et al. 2021 §A1.1; same family as
    * C4's heuristics, Raffel et al. 2020) — the rule-based quality gate
    * production corpora apply before model-based scoring: word-count
    * bounds, mean-word-length band, alphabetic-word fraction, and the
    * stop-word evidence count, each emitted as its own signal plus the
    * conjunction. One scan, pure column arithmetic; mean word length
    * derives from len(text) (single-space-joined corpus) so no per-word
    * fold runs: mean_wl = (n_chars - n_words + 1) / n_words.
    * Thresholds follow Gopher scaled to this corpus's word counts. */
  def gopherRules(spark: SparkSession, dir: String): DataFrame =
    gopherRulesFrame(Tables.documentsPar(spark, dir))

  private[graft] def gopherRulesFrame(docsIn: DataFrame): DataFrame =
    gopherStats(docsIn).orderBy("doc_id")

  /** gopherRules without the presentation sort (qualityStats' contract). */
  private[graft] def gopherStats(docsIn: DataFrame): DataFrame =
    gopherSignals(docsIn)
      .select("doc_id", "n_words", "mean_wl", "frac_alpha", "n_stop", "gopher_pass")

  /** Signals-only face of the Gopher gate: adds the rule columns and
    * keeps every input column (no projection, no sort), so it composes
    * into BATCH AND STREAMING plans alike — pure per-row column
    * arithmetic, no aggregation, stream-safe in append mode
    * (CorpusIngest.gate builds on exactly this property). */
  private[graft] def gopherSignals(docsIn: DataFrame): DataFrame = {
    val stops = Seq("the", "be", "to", "of", "and", "that", "have", "with")
    docsIn
      .withColumn("toks", tokens)
      .withColumn("n_words", size(col("toks")).cast("long"))
      .withColumn("mean_wl",
        (length(col("text")).cast("long") - col("n_words") + 1L).cast("double")
          / col("n_words"))
      .withColumn("frac_alpha",
        size(filter(col("toks"), t => t.rlike("[a-z]"))).cast("long").cast("double")
          / col("n_words"))
      .withColumn("n_stop",
        size(filter(col("toks"), t => t.isin(stops.map(lit(_)): _*))).cast("long"))
      .withColumn("gopher_pass",
        col("n_words") >= 40L && col("n_words") <= 100000L &&
          col("mean_wl") >= 3.0 && col("mean_wl") <= 10.0 &&
          col("frac_alpha") >= 0.8 && col("n_stop") >= 2L)
      .drop("toks")
  }

  /** TEMPERATURE-WEIGHTED source mixture sampling — the standard
    * multi-source LM data-mixing step (alpha=0.5 unigram smoothing, as
    * in multilingual-BERT / XLM-R sampling): source s gets weight
    * n_s^alpha / Σ n_t^alpha, a global budget of 30% of the corpus is
    * split by those weights, and each doc keeps deterministically iff
    * its seeded hash bucket falls under its source's acceptance
    * threshold — so small sources are UP-sampled relative to their
    * share and the draw replays bit-identically (no RNG state).
    *
    * Exactness: sqrt(n_s) quantizes to the 2^20 integer grid
    * (correctly-rounded IEEE sqrt then round — identical in both
    * engines), the denominator is an INTEGER sum of those (order-
    * independent, immune to double-sum reordering), and the acceptance
    * rate divides once in a fixed token order. Scale shape: the
    * per-source table is ~|sources| rows (one tiny aggregate), joined
    * back broadcast; the corpus side is one scan + filter, no shuffle
    * of the documents at all. */
  def mixSample(spark: SparkSession, dir: String): DataFrame =
    mixSampleFrame(Tables.documentsPar(spark, dir))

  /** Library face with the mixing knobs exposed: `alpha` is the
    * temperature (0 = uniform over sources, 1 = proportional; the
    * 0.5 default is the multilingual-BERT/XLM-R convention) and
    * `budget` the kept fraction of the corpus. The alpha=0.5 default
    * keeps the source weight an exactly-quantizable sqrt; other alphas
    * quantize pow(n, alpha) on the same 2^20 grid (still
    * order-independent — the query face and oracle pin only the
    * default). */
  private[graft] def mixSampleFrame(d: DataFrame, alpha: Double = 0.5,
      budget: Double = 0.3): DataFrame =
    mixStats(d, alpha, budget).orderBy("doc_id")

  /** mixSample without the presentation sort (qualityStats' contract —
    * trainingSet caches this face). */
  private[graft] def mixStats(d: DataFrame, alpha: Double = 0.5,
      budget: Double = 0.3): DataFrame = {
    // sqrt (correctly-rounded IEEE) for the default — pow(x, 0.5) is
    // not guaranteed the same last ulp, and the oracle says sqrt
    val weight =
      if (alpha == 0.5) sqrt(col("n_src").cast("double"))
      else pow(col("n_src").cast("double"), lit(alpha))
    val bySrc = d.groupBy("source").agg(count(lit(1)).as("n_src"))
      .withColumn("q", round(weight * lit(1048576.0)).cast("long"))
    val tot = bySrc.agg(sum(col("q")).as("sum_q"), sum(col("n_src")).as("n_total"))
    val rates = bySrc.crossJoin(tot)
      .withColumn("target",
        floor(col("n_total").cast("double") * lit(budget)).cast("long"))
      .withColumn("thr", floor(least(lit(1.0),
        (col("target") * col("q")).cast("double")
          / (col("sum_q").cast("double") * col("n_src"))) * lit(1000000.0))
        .cast("long"))
      .select("source", "n_src", "thr")
    d.select(col("doc_id"), col("source"))
      .withColumn("bucket",
        conv(substring(md5(concat(col("doc_id").cast("string"), lit("#mix"))
          .cast("binary")), 1, 7), 16, 10).cast("long") % 1000000L)
      .join(broadcast(rates), "source")
      .filter(col("bucket") < col("thr"))
      .select("doc_id", "source", "n_src", "thr", "bucket")
  }

  /** Coarse-bucket modulus for the token-budget fill. 4096 keeps the
    * per-source bucket table broadcastable and the ONE boundary bucket
    * per source a task-sized unit (~N/4096 docs); at petabyte scale the
    * knob rises (2^20) without changing the semantics — the kept set is
    * a pure function of the (bucket, hash, doc_id) order. */
  private[graft] val TokenBudgetBuckets = 4096

  /** TOKEN-BUDGET corpus fill (`doc_token_budget`) — the release-side
    * twin of `doc_mix_sample`: instead of thinning by a per-source RATE,
    * fill a total TOKEN budget (all_tokens/4 here) allocated across
    * sources by temperature-0.5 weights over token mass (the same
    * sqrt-on-the-2^20-grid quantization as the mix), taking each
    * source's documents in a deterministic hash order and cutting at the
    * first document that would overflow its share — "give me N tokens
    * with these mixture weights", the request a training run actually
    * makes of a corpus.
    *
    * Scale shape — the naive form is ONE window over every document per
    * source (a single partition per source at 100 TB: unusable). This
    * runs TWO-LEVEL instead: (1) docs aggregate to (source, coarse
    * bucket) token sums — map-side partial agg, then a window over
    * ≤4096 rows per source; buckets whose cumulative mass fits keep ALL
    * their docs via a broadcast semi-join (no per-doc window at all);
    * (2) only the single boundary bucket per source — pre < share < cum
    * — pays a per-doc window, over ~N/4096 docs. The kept set is
    * provably identical to the naive prefix (cum monotone in the
    * (bucket, hash, doc_id) order — TokenBudgetSpec pins the law), and
    * no full-corpus window or sort ever runs. Integer arithmetic end to
    * end (BIGINT shares via `div`), so the DuckDB twin is bit-exact. */
  def tokenBudget(spark: SparkSession, dir: String): DataFrame =
    tokenBudgetFrame(Tables.documentsPar(spark, dir))

  private[graft] def tokenBudgetFrame(docs: DataFrame,
      budgetDenom: Long = 4L,
      coarse: Int = TokenBudgetBuckets): DataFrame = {
    val d = docs
      .withColumn("n_tokens", size(tokens).cast("long"))
      .withColumn("h", conv(substring(md5(concat(col("doc_id").cast("string"),
        lit("#tb")).cast("binary")), 1, 7), 16, 10).cast("long"))
      .withColumn("c", col("h") % coarse)
      .select("doc_id", "source", "n_tokens", "h", "c")
    val bySrc = d.groupBy("source").agg(sum(col("n_tokens")).as("src_tokens"))
      .withColumn("q",
        round(sqrt(col("src_tokens").cast("double")) * lit(1048576.0))
          .cast("long"))
    // corpus totals as a window over the per-source aggregate (a
    // handful of rows) — no single-row cross-join branches in the plan
    val wAll = Window.partitionBy().rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    // share arithmetic rides DECIMAL(38,0): the BIGINT product
    // (all_tokens/4)·q overflows 63 bits at ~1e9 corpus tokens — far
    // below this operator's scale claim — and with ANSI off Spark
    // would wrap silently to a negative share (empty kept set, no
    // error). 128-bit decimal keeps the integer math exact to ~1e38;
    // `div` on decimals still returns the exact integral BIGINT, and
    // the DuckDB twin mirrors it with HUGEINT.
    val shares = bySrc
      .withColumn("sum_q", sum(col("q")).over(wAll))
      .withColumn("all_tokens", sum(col("src_tokens")).over(wAll))
      .withColumn("src_share",
        expr(s"(cast(all_tokens div $budgetDenom as decimal(38,0)) * q)" +
          " div sum_q"))
      .select("source", "src_share")
    // level 1: bucket mass + prefix cut over ≤`coarse` rows per source
    val wc = Window.partitionBy("source").orderBy("c")
    val bucketCum = d.groupBy("source", "c")
      .agg(sum(col("n_tokens")).as("c_tokens"))
      .withColumn("cum", sum(col("c_tokens")).over(wc))
      .withColumn("pre", col("cum") - col("c_tokens"))
      .join(broadcast(shares), "source")
    val fullKeep = bucketCum.filter(col("cum") <= col("src_share"))
      .select("source", "c")
    val boundary = bucketCum
      .filter(col("pre") < col("src_share") && col("cum") > col("src_share"))
      .select("source", "c", "pre", "src_share")
    val keptFull = d.join(broadcast(fullKeep), Seq("source", "c"))
      .join(broadcast(shares), "source")
      .select("doc_id", "source", "n_tokens", "src_share")
    // level 2: the one boundary bucket per source pays the per-doc window
    val wf = Window.partitionBy("source", "c")
      .orderBy(col("h"), col("doc_id"))
    val keptBoundary = d.join(broadcast(boundary), Seq("source", "c"))
      .withColumn("fine_cum", col("pre") + sum(col("n_tokens")).over(wf))
      .filter(col("fine_cum") <= col("src_share"))
      .select("doc_id", "source", "n_tokens", "src_share")
    keptFull.unionByName(keptBoundary).orderBy("doc_id")
  }

  /** The END-TO-END training-set build — the composed selection a
    * corpus release actually ships, stacking every round's gates on
    * the shared doc identity:
    *   curate.keep (quality ∧ lang-match ∧ not-dup ∧ not-contaminated
    *   ∧ not-eval) ∧ gopher_pass (rule gate) ∧ span_dup_frac ≤ 0.5
    *   (mostly-original under C4 span dedup) ∧ the temperature-mixture
    *   draw (source-balanced budget).
    * Emitted as one audit row per document (each gate's verdict + the
    * conjunction), the lineage table a release pipeline keeps beside
    * the corpus. Plan shape: each signal is its own derivation — at
    * 100 TB they are materialized signal artifacts — joined on the
    * slim doc key; no signal recomputes another's scan. */
  def trainingSet(spark: SparkSession, dir: String): DataFrame = {
    // each gate's frame is a SHARED artifact: the standalone queries
    // (doc_curate / doc_gopher_rules / doc_span_dedup / doc_mix_sample)
    // build the identical plan, so the CacheManager's canonical-plan
    // match materializes every signal once per (session, dir) — the
    // release pipeline's signal tables, built once, read everywhere
    // the UNSORTED faces (qualityStats' contract): caching the sorted
    // query frames would materialize four full-corpus sorts this
    // composition discards, and would cache a SECOND copy of each
    // signal beside corpusReport's unsorted entries
    val c = graft.Artifacts.shared(curateStats(spark, dir))
      .select(col("doc_id"), col("keep").as("curate_keep"))
    val g = graft.Artifacts.shared(
        gopherStats(Tables.documentsPar(spark, dir)))
      .select(col("doc_id"), col("gopher_pass"))
    val sp = graft.Artifacts.shared(
        spanStats(Tables.documentsPar(spark, dir)))
      .select(col("doc_id"), col("dup_frac").as("span_dup_frac"))
    val m = graft.Artifacts.shared(
        mixStats(Tables.documentsPar(spark, dir)))
      .select(col("doc_id"), lit(true).as("in_mix"))
    Tables.documentsPar(spark, dir).select("doc_id", "source")
      .join(c, "doc_id").join(g, "doc_id").join(sp, "doc_id")
      .join(m, Seq("doc_id"), "left")
      .withColumn("in_mix", coalesce(col("in_mix"), lit(false)))
      .withColumn("selected",
        col("curate_keep") && col("gopher_pass")
          && col("span_dup_frac") <= 0.5 && col("in_mix"))
      .select("doc_id", "source", "curate_keep", "gopher_pass",
        "span_dup_frac", "in_mix", "selected")
      .orderBy("doc_id")
  }

  /** Corpus GOVERNANCE report — the per-source release-audit rollup a
    * dataset card is built from: document and token mass, exact-substring
    * duplicated-token mass, quality-gate and Gopher-gate pass counts,
    * language spread, and each source's share of total token mass. The
    * signal frames are the SAME shared artifacts the standalone queries
    * build (quality, gopherRules, substringDedup), joined on the slim doc
    * key and collapsed to |sources| rows — the materialized-signal shape
    * trainingSet uses, aggregated instead of audited per-doc.
    *
    * Exactness: every aggregate is an integer sum/count (token masses,
    * pass counts, distinct langs); the only doubles are two final
    * divisions (dup_frac, token_share) of BIGINTs, and token_share's
    * denominator rides an unpartitioned window over the already-tiny
    * per-source frame — order-independent by integer addition. */
  def corpusReport(spark: SparkSession, dir: String): DataFrame = {
    // the cached faces are the UNSORTED stats (qualityStats' contract):
    // materializing an artifact that ends in orderBy pays a full-corpus
    // global sort this aggregate immediately discards, while the per-doc
    // queries re-add their presentation sort on top of the same subtree
    val q = graft.Artifacts.shared(qualityStats(spark, dir))
      .select(col("doc_id"), col("n_tokens"), col("quality"))
    val g = graft.Artifacts.shared(
        gopherStats(Tables.documentsPar(spark, dir)))
      .select(col("doc_id"), col("gopher_pass"))
    val sd = graft.Artifacts.shared(
        substringStats(Tables.documentsPar(spark, dir), SubstrK))
      .select(col("doc_id"), col("dup_tokens"))
    val a = Tables.documentsPar(spark, dir).select("doc_id", "source", "lang")
      .join(q, "doc_id").join(g, "doc_id").join(sd, "doc_id")
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        sum(col("dup_tokens")).as("dup_tokens"),
        sum(when(col("quality") >= 0.5, 1L).otherwise(0L)).as("n_quality"),
        sum(when(col("gopher_pass"), 1L).otherwise(0L)).as("n_gopher"),
        countDistinct(col("lang")).as("n_langs"))
    a.select(col("source"), col("n_docs"), col("n_tokens"), col("dup_tokens"),
        (col("dup_tokens").cast("double") / col("n_tokens")).as("dup_frac"),
        col("n_quality"), col("n_gopher"), col("n_langs"),
        (col("n_tokens").cast("double")
          / sum(col("n_tokens")).over(Window.partitionBy())).as("token_share"))
      .orderBy("source")
  }

  /** Token-length HISTOGRAM per source — the dataset-card length
    * distribution (power-of-two buckets, the lognormal-ish shape plot
    * every corpus release publishes): bucket = floor(log2(n_tokens)),
    * computed INTEGER-EXACTLY as the bit length of the count (both
    * engines' `bin()` of a positive integer has no leading zeros, so
    * length(bin(n))−1 never touches floating log). One scan, one
    * (source, bucket) exchange, the per-source share a window over the
    * tiny histogram frame. */
  def lengthHistogram(spark: SparkSession, dir: String): DataFrame = {
    val h = Tables.documentsPar(spark, dir)
      .withColumn("toks", tokens)
      .withColumn("n_tokens", size(col("toks")).cast("long"))
      .withColumn("bucket", (length(bin(col("n_tokens"))) - 1).cast("long"))
      .groupBy("source", "bucket")
      .agg(count(lit(1)).as("n_docs"))
    h.withColumn("lo", expr("shiftleft(1L, cast(bucket as int))"))
      .withColumn("hi", expr("shiftleft(1L, cast(bucket as int) + 1) - 1L"))
      .withColumn("share", col("n_docs").cast("double")
        / sum(col("n_docs")).over(Window.partitionBy("source")))
      .select("source", "bucket", "lo", "hi", "n_docs", "share")
      .orderBy("source", "bucket")
  }

  /** Seeded 28-bit md5-prefix hash bucket (0-9) — the ONE deterministic
    * bucketing idiom every sampling/splitting query derives from; the
    * oracle SQL repeats it byte-for-byte, so all call sites must route
    * through here. */
  private[graft] def seededBucket(c: Column, seed: String): Column =
    conv(substring(md5(concat(c.cast("string"), lit(seed))
      .cast("binary")), 1, 7), 16, 10).cast("long") % 10

  /** The '#g1'-seeded doc bucket shared by sampleStratified and the
    * contamination eval split. */
  private[graft] def sampleBucket: Column = seededBucket(col("doc_id"), "#g1")

  /** Overlapping token-window CHUNKING — the "long document → training
    * samples" step: 16-token windows every 8 tokens (50% overlap), the
    * last chunk short. n_chunks = 1 + ceil(max(0, n-16)/8) so every token
    * is covered and no chunk is fully contained in its predecessor.
    * Pure per-row generate+slice (posexplode of an index sequence): no
    * shuffle at all, embarrassingly parallel at 100 TB, and the output
    * carries a per-chunk md5 so chunk-level exact dedup can chain on it
    * with the same slim-shuffle shape as dedupExact. */
  def chunk(spark: SparkSession, dir: String): DataFrame =
    chunkFrame(Tables.documentsPar(spark, dir))

  /** chunking over any frame with (doc_id, text) — the testable core */
  def chunkFrame(docs: DataFrame): DataFrame =
    docs
      .withColumn("toks", tokens)
      .withColumn("n_tokens", size(col("toks")).cast("long"))
      .withColumn("n_chunks",
        lit(1L) + expr("(greatest(0L, n_tokens - 16L) + 7L) div 8L"))
      .select(col("doc_id"), col("n_tokens"), col("toks"),
        explode(sequence(lit(0L), col("n_chunks") - 1)).as("chunk_id"))
      .withColumn("tok_start", (lit(1L) + lit(8L) * col("chunk_id")))
      .withColumn("chunk_tokens", least(lit(16L), col("n_tokens") - lit(8L) * col("chunk_id")))
      .withColumn("chunk_text",
        concat_ws(" ", slice(col("toks"), col("tok_start").cast("int"), lit(16))))
      .withColumn("chunk_md5", md5(col("chunk_text").cast("binary")))
      .select("doc_id", "chunk_id", "tok_start", "chunk_tokens", "chunk_md5", "chunk_text")
      .orderBy("doc_id", "chunk_id")

  /** BALANCED per-group sampling — exactly k documents per (lang,
    * source) cell, chosen by seeded-hash order: the corpus-balancing
    * step that stops a dominant source from swamping a training mix
    * (complement of `sampleStratified`, which takes a proportional
    * slice). Deterministic (hash order, doc_id tie-break), replay
    * stable, and one window per cell — the rank cut pushes below the
    * exchange (WindowGroupLimit), so each map task pre-prunes to k
    * before any shuffle. */
  def sampleGrouped(spark: SparkSession, dir: String): DataFrame = {
    val h = md5(concat(col("doc_id").cast("string"), lit("#g2")).cast("binary"))
    val w = Window.partitionBy("lang", "source").orderBy(col("h"), col("doc_id"))
    Tables.documents(spark, dir)
      .withColumn("h", h)
      .withColumn("rk", row_number().over(w).cast("int"))
      .filter(col("rk") <= 5)
      .select("doc_id", "lang", "source", "h", "rk")
      .orderBy("lang", "source", "rk")
  }

  /** Fixed training-sequence length for `pack`. */
  val PackLen = 32L

  /** SEQUENCE PACKING — the "concatenate the shard's token stream, slice
    * into fixed windows" step that turns variable-length documents into
    * uniform training rows (the standard pretraining batch layout;
    * complements `chunk`, which windows WITHIN a document). Each doc
    * occupies token interval [tok_start, tok_end) of its shard's stream
    * (one running sum), every training row r covers [r·L, (r+1)·L), and
    * a doc emits one posting per row it overlaps — an interval-to-bucket
    * decomposition (same trick as intervalJoin), all integer, so the
    * oracle repeats it bit-exactly.
    *
    * Scale: packing is inherently order-sensitive, so the parallel unit
    * is the SHARD (deterministic hash bucket, the corpus sampling key):
    * the running sum sorts per shard, and production scales shard count
    * with the corpus (10^5 shards at 100 TB keeps each window sort a
    * task-sized job); rows never cross shards. The query face uses the
    * 10 sampleBucket shards. */
  def pack(spark: SparkSession, dir: String): DataFrame = {
    val L = PackLen
    val d = Tables.documentsPar(spark, dir)
      .withColumn("shard", sampleBucket)
      .withColumn("n_toks", size(tokens).cast("long"))
      .filter(col("n_toks") > 0)
    val w = Window.partitionBy("shard").orderBy("doc_id")
    val c = d
      .withColumn("tok_end", sum(col("n_toks")).over(w))
      .withColumn("tok_start", col("tok_end") - col("n_toks"))
    c.withColumn("seq_idx",
        explode(sequence(expr(s"tok_start div $L"), expr(s"(tok_end - 1) div $L"))))
      .groupBy("shard", "seq_idx")
      .agg(
        count(lit(1)).as("n_docs"),
        min(col("doc_id")).as("first_doc_id"),
        max(col("doc_id")).as("last_doc_id"),
        sum(least(col("tok_end"), (col("seq_idx") + 1) * L)
          - greatest(col("tok_start"), col("seq_idx") * L)).as("n_tokens"))
      .select("shard", "seq_idx", "n_docs", "first_doc_id", "last_doc_id", "n_tokens")
      .orderBy("shard", "seq_idx")
  }

  /** Benchmark CONTAMINATION detection — the decontamination pass every
    * training pipeline runs before an eval release: which training docs
    * share word-trigrams with the held-out eval split (here: the
    * deterministic 10% sample bucket standing in for the benchmark set).
    *
    * Scale shape: the eval side is reduced to DISTINCT grams BEFORE the
    * join, so each training gram matches at most one eval row — a hot
    * stopword-gram causes NO pair fan-out (unlike a doc×doc overlap
    * join), and the single equi-join on the compact gram string is all
    * that shuffles. AQE broadcasts the eval-gram set outright when the
    * benchmark is small (the common case). */
  def contamination(spark: SparkSession, dir: String): DataFrame = {
    val exploded = contamPostings(spark, dir)
    val evalGrams = exploded.filter(col("is_eval"))
      .select(col("gram")).distinct()
    val train = exploded.filter(!col("is_eval"))
      .select(col("doc_id"), col("n_grams"), col("gram"))
    contamScore(train.join(evalGrams, "gram"))
  }

  /** THE corpus shingle artifact (doc_id, lang, grams), CACHED — the
    * one materialization of the interpreted trigram derivation (the
    * dominant CPU cost of every gram-consuming query) shared by n-gram
    * Jaccard, MinHash/LSH, both cluster algorithms, and both
    * contamination variants. The cache boundary sits directly ABOVE the
    * derivation on purpose: downstream explodes/filters then hit the
    * materialized grams column instead of being constraint-pushed into
    * the parquet scan, where Spark's inferred `size(trigrams(...)) > 0`
    * predicate would evaluate the CodegenFallback expression a second
    * time per row during the build (observed in the executed plan —
    * PlanProbe prints the skeleton). */
  private[graft] def gramsTable(spark: SparkSession, docsIn: DataFrame): DataFrame =
    graft.Artifacts.shared(gramsFrame(docsIn))

  /** The same derivation UNCACHED — for per-micro-batch callers where a
    * per-batch cache registration would accumulate over the stream's
    * lifetime (NearDupIngest). */
  private[graft] def gramsFrame(docsIn: DataFrame): DataFrame =
    docsIn
      .withColumn("toks", tokens)
      .select(col("doc_id"), col("lang"),
        GraftFunctions.graftTrigrams(docsIn.sparkSession, "toks").as("grams"))

  /** The (slim) exploded posting rows of both contamination variants,
    * derived from the shared shingle artifact (explode + a md5 bucket
    * bit are cheap against the cache; text bodies never enter it). */
  private[graft] def contamPostings(spark: SparkSession, dir: String): DataFrame =
    gramsTable(spark, Tables.documentsPar(spark, dir))
      .withColumn("n_grams", size(col("grams")).cast("long"))
      .select(col("doc_id"), (sampleBucket === 0).as("is_eval"),
        col("n_grams"), explode(col("grams")).as("gram"))

  /** Shared tail of both contamination variants: per-doc hit aggregation
    * and the ≥25% contamination cut. */
  private def contamScore(hits: DataFrame): DataFrame =
    hits.groupBy("doc_id", "n_grams")
      .agg(count(lit(1)).as("n_hits"))
      .withColumn("contamination", col("n_hits").cast("double") / col("n_grams"))
      .filter(col("contamination") >= 0.25)
      .select("doc_id", "n_grams", "n_hits", "contamination")
      .orderBy(col("contamination").desc, col("doc_id"))

  /** Decontamination with a BLOOM-FILTER semi-join reduction — the
    * 100 TB shape for when the eval-gram set outgrows a broadcast HASH
    * relation but its BITS still fit everywhere: ~1.2 bytes/gram at 1%
    * fpp (vs tens of bytes per hash-table entry), so a 10^9-gram eval
    * split rides to every executor as ~1.2 GB of bits and the bloom
    * drops ~99% of clean train postings BEFORE the shuffle. The exact
    * equi-join then verifies only the surviving candidates, removing
    * bloom false positives — the result is bit-identical to
    * `contamination` (same oracle), only the pre-shuffle volume changes.
    *
    * This is the one deliberate UDF in the library: `might_contain` has
    * no public Column-level form (Spark keeps BloomFilterAggregate /
    * BloomFilterMightContain internal to its runtime join-pruning rule,
    * InjectRuntimeFilter), and `DataFrameStatFunctions.bloomFilter` +
    * a broadcast is the documented public pattern. The UDF sits on the
    * already-slim postings (one string column), not in a per-row hot
    * loop over text. */
  def contaminationBloom(spark: SparkSession, dir: String): DataFrame = {
    val exploded = contamPostings(spark, dir)
    val evalGrams = exploded.filter(col("is_eval"))
      .select(col("gram")).distinct()
    // The bloom is a shared artifact like the postings cache it sits on
    // (VERDICT r3 next-round #5): built ONCE per (session, dir) — the
    // production shape materializes the eval-split bloom beside the
    // eval release, not per query — so bench reps pay the join, not a
    // driver count() + treeAggregate rebuild per rep.
    val bc = graft.Artifacts.memo(
      s"decontam-bloom:${System.identityHashCode(spark)}:$dir") {
      val nEval = evalGrams.count() // one cheap job over the cached artifact
      val bloom = evalGrams.stat.bloomFilter("gram", math.max(nEval, 1L), 0.01)
      spark.sparkContext.broadcast(bloom)
    }
    val mightContain = udf((g: String) => bc.value.mightContainString(g))
    val train = exploded.filter(!col("is_eval"))
      .select(col("doc_id"), col("n_grams"), col("gram"))
    contamScore(
      train.filter(mightContain(col("gram"))) // bloom pre-filter (≥99% cut)
        .join(evalGrams, "gram")) // exact verify removes false positives
  }

  /** Token-RARITY scoring — the perplexity-filter stand-in (CCNet-style):
    * score each document by the corpus frequency of its tokens. Pass 1
    * builds the corpus frequency table (in production a reusable
    * artifact); pass 2 joins each token occurrence to its frequency and
    * aggregates per document. All aggregates are integer (BIGINT sums /
    * mins — order-independent, bit-exact); the one double derives from
    * them in a single division.
    *
    * Scale: the frequency join fans out ≤1 row per occurrence (the freq
    * table is keyed by token), so hot tokens skew partition sizes but
    * never blow up row counts; AQE skew-split handles the rest. */
  def rarity(spark: SparkSession, dir: String): DataFrame = {
    // slim (doc_id, token) occurrence table, CACHED: it feeds both the
    // frequency aggregation and the scoring join — without the cache the
    // scan + tokenization run twice (the artifact a production pipeline
    // materializes once)
    val tok = graft.Artifacts.shared(Tables.documentsPar(spark, dir)
      .withColumn("toks", tokens)
      .select(col("doc_id"), explode(col("toks")).as("token")))
    val freq = tok.groupBy("token").agg(count(lit(1)).as("freq"))
    tok.join(freq, "token")
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_tokens"),
        sum(col("freq")).as("sum_freq"),
        min(col("freq")).as("min_freq"),
        sum(when(col("freq") <= 2, 1L).otherwise(0L)).as("n_rare"))
      .withColumn("avg_freq", col("sum_freq").cast("double") / col("n_tokens"))
      .select("doc_id", "n_tokens", "sum_freq", "min_freq", "n_rare", "avg_freq")
      .orderBy("doc_id")
  }

  /** TF-IDF characteristic terms — the top-3 most document-specific
    * tokens per document, the signal behind topical corpus slicing and
    * keyword-based retrieval. The score is tf/df: since the corpus doc
    * count N is one constant factor, ordering by tf/df is ordering by
    * tf·N/df, and a single IEEE division of two exact BIGINTs is
    * exactly rounded — so both engines compute bit-identical scores and
    * identical rankings (no log(), whose rounding is libm-dependent).
    * Ties break on the token string.
    *
    * Scale shape (r5): tf aggregates on (doc_id, token) with map-side
    * combine and is itself the CACHED artifact; df is a window count
    * over tf's token partitions — tf is already one row per
    * (doc, token), so the partition count IS the document frequency,
    * and the former join-back (which recomputed the tf aggregate for
    * its second reference and shuffled both sides on the token key)
    * disappears; the final top-3-per-doc is one window over doc_id.
    * The exploded occurrence frame underneath still plan-matches
    * rarity's cached artifact, so the corpus is tokenized once across
    * both queries. */
  def tfidf(spark: SparkSession, dir: String): DataFrame = {
    val tok = graft.Artifacts.shared(Tables.documentsPar(spark, dir)
      .withColumn("toks", tokens)
      .select(col("doc_id"), explode(col("toks")).as("token")))
    val tf = graft.Artifacts.shared(
      tok.groupBy("doc_id", "token").agg(count(lit(1)).as("tf")))
    val w = Window.partitionBy("doc_id").orderBy(col("score").desc, col("token"))
    tf.withColumn("df", count(lit(1)).over(Window.partitionBy("token")).cast("long"))
      .withColumn("score", col("tf").cast("double") / col("df"))
      .withColumn("term_rank", row_number().over(w).cast("int"))
      .filter(col("term_rank") <= 3)
      .select("doc_id", "token", "tf", "df", "score", "term_rank")
      .orderBy("doc_id", "term_rank")
  }

  /** PIVOT: corpus composition matrix source × lang — the "what am I
    * training on" report. The pivot value list is explicit (the lang set
    * is closed), which skips the extra distinct-scan Spark needs for an
    * implicit pivot — at 100 TB that scan would double the cost. */
  def pivotSourceLang(spark: SparkSession, dir: String): DataFrame = {
    val langs = Seq("de", "en", "es", "fr", "zh")
    Tables.documents(spark, dir)
      .groupBy("source")
      .pivot("lang", langs)
      .agg(count(lit(1)))
      .select(col("source") +: langs.map(l => coalesce(col(l), lit(0L)).as(l)): _*)
      .orderBy("source")
  }

  /** df-cap for postings-pair generation: a (lang, gram) / band-bucket
    * group shared by more than this many documents is a stopword-gram —
    * it would add O(df²) candidate pairs and carries no near-dup signal. */
  val DfCap = 1000

  /** Two-pass df-cut over a postings frame: DROP every `keys` group whose
    * posting count exceeds `dfCap`, BEFORE any collect_list — so no
    * reducer ever materializes a hot group's postings (VERDICT r3 defect
    * #1: the previous `slice(collect_list)` capped pair GENERATION, but
    * the aggregation buffer had already held the full multi-GB list for
    * a 100 TB stopword-gram). Dropping rather than truncating is also
    * the better dedup signal: a gram shared by thousands of documents is
    * corpus boilerplate, not near-dup evidence. Cost shape: pass 1 is a
    * partial-aggregated count whose shuffle carries one row per distinct
    * group per map partition; the hot set it yields is tiny by
    * construction (≤ |postings|/dfCap groups); the anti-join shuffles
    * the postings on `keys` — the exact partitioning the pair
    * aggregation downstream needs, so that exchange is reused, not
    * added. The DuckDB oracle applies the same cut (Oracle.scala,
    * `QUALIFY count(*) OVER (PARTITION BY keys) <= cap`) — the two caps
    * MUST move together. */
  private[graft] def dfCut(e: DataFrame, keys: Seq[String], dfCap: Int): DataFrame = {
    val hot = e.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("df"))
      .filter(col("df") > dfCap)
      .select(keys.map(col): _*)
    e.join(hot, keys, "left_anti")
  }

  /** Average pair fan-out per surviving posting above which a pair
    * sweep is in the measured PRE-SATURATION QUADRATIC REGIME (r9,
    * BASELINE.md §Round 9): healthy runs measured ≤ ~12 pairs/posting
    * (sf1 jaccard@50 at 11.6 was the worst non-pathological entry —
    * the cut mid-saturation, wall 9.5 s); the two pathological runs
    * measured 34 (sf1 winnow@1000) and ~330 (sf10 winnow@1000, wall
    * 1766.8 s cold vs 2.23 s at cap 50). 16 splits the two
    * populations with margin on both sides. */
  val PairMassWarnRatio = 16.0

  /** JVM-local detectability counter for pair sweeps launched in the
    * quadratic regime — the detect-don't-reject pattern
    * (SubstrIngest.nonMonotoneArrivals): the sweep still runs (the
    * caller may genuinely want the mass), but the condition is counted
    * and WARNed instead of discovered as a 30-minute stage. */
  val quadraticPairRegimes = new java.util.concurrent.atomic.AtomicLong(0)

  /** What `pairMass` measures, for one postings frame at one cap:
    *  - `postings`: total exploded postings rows (input-linear);
    *  - `nKeys`: distinct `keys` groups;
    *  - `mass`: Σ_{groups with df ≤ cap} df·(df−1)/2 — EXACTLY the row
    *    count the pair stage will emit after the df-cut (the true cost
    *    driver, r9's headline finding: wall tracks mass, not rows);
    *  - `keptPostings`: postings surviving the cut (mass's denominator).
    * `massPerPosting` > [[PairMassWarnRatio]] is the quadratic-regime
    * signal: each surviving posting fans out into that many pairs on
    * average, so the pair stage writes an order of magnitude more than
    * it reads. Mass/posting is bounded by (cap−1)/2 — at saturation the
    * sweep is input-linear with a cap-sized constant, and the warn
    * fires precisely in the growth window before saturation where a
    * fixed absolute cap calibrated to a small corpus (the measured
    * DfCap=1000 trap: ~97× mass per 10× docs between sf1 and sf10)
    * costs quadratic wall. */
  /** df·(df−1)/2 in INTEGER arithmetic (r10 ADVICE #2): Spark's `/` is
    * double division. The product is always EVEN so the /2.0 itself is
    * exact; the naive form loses exactness only when the long→double
    * cast of the PRODUCT rounds — product ≥ 2^54 and not a multiple of
    * the ulp (first at product ≡ 2 mod 4, i.e. df ≡ 2,3 mod 4 past
    * df ≈ 1.34e8 in one key; r11 ADVICE corrected the earlier 2^53
    * model). Halve the EVEN factor with a shift instead — exact up to
    * the long product bound (df ≈ 6.07e9, where the pair count itself
    * no longer fits a long), and the naive multiply's ANSI overflow at
    * df ≳ 3.04e9 never happens. */
  private[graft] def pairCount(df: Column): Column =
    when(df.bitwiseAND(lit(1L)) === 0L, shiftright(df, 1) * (df - 1))
      .otherwise(df * shiftright(df - 1, 1))

  final case class PairMass(postings: Long, nKeys: Long, mass: Long,
      keptPostings: Long) {
    def massPerPosting: Double =
      if (keptPostings <= 0L) 0.0 else mass.toDouble / keptPostings
    def quadraticRegime: Boolean = massPerPosting > PairMassWarnRatio
  }

  /** PRE-FLIGHT for any postings pair sweep (r9 verdict #3, promoting
    * the PairMassProbe measurement to a library call): ONE cheap
    * aggregate over the exploded postings — the SAME groupBy the
    * df-cut's first pass runs, then a single-row rollup of the df
    * histogram — returning the exact pair-stage output size at `dfCap`
    * BEFORE the sweep is launched. A production caller sizes or
    * re-caps the sweep from this number instead of discovering the
    * quadratic regime as a wedged stage (measured: 1766.8 s cold at
    * sf10 under the suite-default absolute cap vs 2.23 s at cap 50).
    * Cost: strictly less than one extra df-cut pass — no anti-join,
    * one scalar row to the driver. */
  def pairMass(e: DataFrame, keys: Seq[String], dfCap: Int = DfCap): PairMass = {
    val r = pairMassFrame(e, keys, dfCap).head
    PairMass(r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
  }

  /** The one-row plan behind [[pairMass]], exposed for the plan pin:
    * partial count → ONE exchange on `keys` → final df count → partial
    * rollup (one slim row per partition) → SinglePartition exchange →
    * final rollup. Two exchanges, the second O(partitions) rows; no
    * sort, no join — strictly cheaper than the df-cut pass the sweep
    * itself will run. */
  private[graft] def pairMassFrame(e: DataFrame, keys: Seq[String],
      dfCap: Int): DataFrame =
    e.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("df"))
      .agg(
        coalesce(sum(col("df")), lit(0L)).as("postings"),
        count(lit(1)).as("n_keys"),
        coalesce(sum(when(col("df") <= dfCap, pairCount(col("df")))
          .otherwise(0L)), lit(0L)).as("mass"),
        coalesce(sum(when(col("df") <= dfCap, col("df")).otherwise(0L)),
          lit(0L)).as("kept"))

  /** `pairMass` + the WARN/counter face: logs and bumps
    * [[quadraticPairRegimes]] when the report crosses
    * [[PairMassWarnRatio]], mirroring the nonMonotoneArrivals
    * detect-don't-reject pattern — detection, never a veto (a caller
    * that wants the full mass at a high cap is allowed to pay for it,
    * knowingly). `what` names the sweep in the log line. */
  def pairMassPreflight(e: DataFrame, keys: Seq[String], dfCap: Int,
      what: String): PairMass = {
    val pm = pairMass(e, keys, dfCap)
    if (pm.quadraticRegime) {
      quadraticPairRegimes.incrementAndGet()
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        f"TextOps: $what pair sweep at dfCap=$dfCap is in the " +
        f"quadratic regime — ${pm.mass}%,d pairs from " +
        f"${pm.keptPostings}%,d surviving postings " +
        f"(${pm.massPerPosting}%.1f pairs/posting > " +
        f"$PairMassWarnRatio%.0f). The cap is the lever: lower it to " +
        "the quality target (a key shared by dozens of documents is " +
        "boilerplate, not dedup evidence — suggestDfCap computes the " +
        "largest cap within a mass target) or expect wall to track " +
        "mass, not input rows (BASELINE.md §Round 9).")
    }
    pm
  }

  /** The COMPOSED pre-flight (r10 verdict #2): measure → warn →
    * recommend in one call, wired into every pair-sweep entry point
    * behind its opt-in `preflight` flag ([[winnowPairs]],
    * [[ngramJaccardPairs]], MinHashOps.minhashLshPairs/simhashPairs) —
    * a production caller no longer has to know the three-call recipe;
    * `preflight = true` runs it against the EXACT postings frame the
    * sweep pairs on, then the sweep proceeds unchanged (detection,
    * never a veto: output is bit-identical to the plain sweep —
    * PreflightSpec). When the measurement is in the quadratic regime,
    * the [[suggestDfCap]] recommendation is computed and logged in the
    * same call. Cost: one extra aggregate over the artifact the sweep
    * builds anyway, plus — only in the quadratic case — the bounded
    * histogram-window pass behind the recommendation.
    *
    * THE RECOMMENDATION IS A COST TARGET, NOT A QUALITY FLOOR: the
    * suggested cap bounds mass/posting only. On the planted-dup ladder
    * the measured recall at the suggestion varies by sweep and rung
    * (BASELINE.md §Round 11 [recall] table) — check the near-pair df
    * floor there before adopting a recommendation at scale. */
  def preflightPairSweep(e: DataFrame, keys: Seq[String], dfCap: Int,
      what: String): (PairMass, Option[Int]) = {
    val pm = pairMassPreflight(e, keys, dfCap, what)
    val rec = if (pm.quadraticRegime) {
      val c = suggestDfCap(e, keys)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        f"TextOps: $what — suggestDfCap recommends dfCap=$c at the " +
        f"default $PairMassWarnRatio%.0f pairs/posting target " +
        f"(configured: $dfCap). The recommendation bounds COST only; " +
        "check the measured recall floor (BASELINE.md §Round 11) " +
        "before adopting it as a quality target.")
      Some(c)
    } else None
    (pm, rec)
  }

  /** The RECOMMENDATION face completing measure → warn → recommend:
    * the largest df cap whose pair sweep stays within
    * `maxMassPerPosting` pairs per surviving posting. The cumulative
    * ratio mass(c)/kept(c) is non-decreasing in c and steps only at
    * observed df values, so the answer is the largest df value whose
    * cumulative ratio passes — computed distributed: df histogram
    * (one slim row per DISTINCT df value), cumulative sums over a
    * single-partition window (bounded: ≤ max-df rows, a planning-call
    * cost), one scalar to the driver. Returns 0 when no cap admits
    * any group within the target (only a drop-everything cap
    * satisfies it). A production caller pairs this with
    * [[pairMassPreflight]]: warn at the configured cap, re-cap at the
    * suggestion.
    *
    * THE SUGGESTION BOUNDS COST, NOT RECALL — the trade is MEASURED
    * (r11, graft.CapRecallProbe on the planted-dup ladder; BASELINE.md
    * §Round 11): at sf1 the default-target suggestion keeps 90-100% of
    * each sweep's reachable planted near pairs, but by sf10 it keeps
    * 17% (winnow) / 7% (jaccard) / 0% (simhash), because on that
    * corpus family the df of TRUE near-pair keys grows ~10× per rung
    * (winnow p50 min-shared-df 19 → 187) alongside the boilerplate;
    * full reachable recall at sf10 needs winnow cap ≈ 1022 — the
    * measured pathological mass (3.3×10⁹ pairs). Before adopting a
    * recommendation at scale: validate recall on labeled/sampled
    * pairs via [[recallFloor]]/[[recallFloorStats]] (the probe's
    * min-shared-key-df criterion as a library call; simhash:
    * MinHashOps.simhashRecallFloor), or rely on the cap-independent
    * GROUP faces for the exact tier (measured 100% family coverage on
    * every rung), or set the cap from the quality floor and pay the
    * measured mass. */
  def suggestDfCap(e: DataFrame, keys: Seq[String],
      maxMassPerPosting: Double = PairMassWarnRatio): Int = {
    val hist = e.groupBy(keys.map(col): _*).agg(count(lit(1)).as("df"))
      .groupBy("df").agg(count(lit(1)).as("n"))
    val w = Window.orderBy("df")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val best = hist
      .withColumn("cum_mass",
        sum(col("n") * pairCount(col("df"))).over(w))
      .withColumn("cum_kept", sum(col("n") * col("df")).over(w))
      .filter(col("cum_mass").cast("double") <=
        lit(maxMassPerPosting) * col("cum_kept").cast("double"))
      .agg(coalesce(max(col("df")), lit(0L)))
      .head.getLong(0)
    math.min(best, Int.MaxValue.toLong).toInt
  }

  /** The RECALL-FLOOR face (r11 verdict #4, promoting CapRecallProbe's
    * analytic criterion to a library call) — option (a) of
    * [[suggestDfCap]]'s guidance, executable by a production caller:
    * given the sweep's exact postings frame `e` (doc_id + `keys`, the
    * same frame [[postingsPairs]] pairs on) and a labeled/sampled pair
    * frame (`d1`, `d2`, any extra columns pass through), compute each
    * pair's MIN SHARED-KEY DF — the smallest df cap at which the
    * candidate stage still emits that pair. `min_df` IS the analytic
    * recall criterion measured end-to-end-equal on every planted-dup
    * ladder rung (BASELINE.md §Round 11: every e2e count equals its
    * analytic count): a pair survives a df-cut at `cap` iff
    * `min_df <= cap`; `min_df` null = no shared key at all — outside
    * the sweep's scope at ANY cap. Simhash sweeps need the verify-stage
    * variant, MinHashOps.simhashRecallFloor.
    *
    * Scale: BOTH sides of the shared-key join are restricted to the
    * labeled docs before joining (the d1 side by the pair join, the d2
    * side by a semi-join on the pairs' d2 ids — r12 ADVICE #3: the
    * previous unrestricted kb side shuffled the full postings frame on
    * (keys, d2) even though only labeled d2 rows could ever match), so
    * the join cost is bounded by |pairs| × keys-per-doc. The one
    * corpus-scale pass that remains is the df histogram over `e` —
    * that pass IS the criterion (df is a global document frequency),
    * and its output is one slim row per distinct key group. A
    * labeled-sample cost, not a corpus pair sweep. */
  def recallFloor(e: DataFrame, keys: Seq[String],
      pairs: DataFrame): DataFrame = {
    val dfs = e.groupBy(keys.map(col): _*).agg(count(lit(1)).as("df"))
    val ka = e.join(pairs.select(col("d1"), col("d2")).distinct(),
        e("doc_id") === col("d1"))
      .select((Seq(col("d1"), col("d2")) ++ keys.map(col)): _*)
    val kb = e.join(pairs.select(col("d2")).distinct(),
        e("doc_id") === col("d2"), "left_semi")
      .select((col("doc_id").as("d2") +: keys.map(col)): _*)
    val shared = ka.join(kb, keys :+ "d2").distinct()
    val minDf = shared.join(dfs, keys)
      .groupBy("d1", "d2").agg(min(col("df")).as("min_df"))
    pairs.join(minDf, Seq("d1", "d2"), "left")
      .select(pairs.columns.map(col) :+ col("min_df"): _*)
  }

  /** Summary of a [[recallFloor]] frame: pair count, the REACHABLE
    * count (min_df non-null — findable by the uncapped sweep), and the
    * exact quantiles of min_df over the reachable set. `max` is the
    * cap for FULL reachable recall (the quality floor suggestDfCap's
    * scaladoc routes callers to); recall at any cap c is
    * `floor.filter(col("min_df") <= c).count() / reachable`. */
  final case class RecallFloorStats(pairs: Long, reachable: Long,
      p50: Double, p90: Double, p95: Double, max: Double)

  def recallFloorStats(floor: DataFrame): RecallFloorStats = {
    val reach = floor.filter(col("min_df").isNotNull)
    val r = reach.count()
    val qs = if (r == 0L) Array(0.0, 0.0, 0.0, 0.0)
      else reach.stat.approxQuantile("min_df",
        Array(0.5, 0.9, 0.95, 1.0), 0.0)
    RecallFloorStats(floor.count(), r, qs(0), qs(1), qs(2), qs(3))
  }

  /** Pre-flight face for [[winnowPairs]] — the fingerprint-postings df
    * histogram at `dfCap`. UNCACHED derivation (r10 review): a
    * planning call must not pin a corpus-scale cache; if the sweep
    * then runs, it builds its own shared selection as usual. */
  def winnowPairMass(spark: SparkSession, dir: String,
      dfCap: Int = DfCap): PairMass =
    pairMassPreflight(
      winnowSelFrame(spark, dir).select(explode(col("sel")).as("fp")),
      Seq("fp"), dfCap, "winnow")

  /** Pre-flight face for [[ngramJaccardPairs]] — the (lang, shingle)
    * postings df histogram at `dfCap`. Uncached, like
    * [[winnowPairMass]]. */
  def ngramJaccardPairMass(spark: SparkSession, dir: String,
      dfCap: Int = DfCap): PairMass =
    pairMassPreflight(
      gramsFrame(Tables.documentsPar(spark, dir))
        .select(col("lang"), explode(col("grams")).as("gram")),
      Seq("lang", "gram"), dfCap, "ngram_jaccard")

  /** The shared postings pair sweep — the ONE shape every pair-based
    * dedup query uses (n-gram Jaccard, MinHash bands, SimHash probes,
    * winnow overlap): df-cut the exploded postings on `keys` so hot
    * groups drop BEFORE any collect_list bounds every aggregation
    * buffer, group the surviving postings, sort for deterministic
    * (l < r) emission, and generate each group's pairs. The caller
    * provides the per-posting `payload` (a bare doc_id or a struct
    * carrying sizes for the score) and scores the emitted pairs. */
  private[graft] def postingsPairs(spark: SparkSession, e: DataFrame,
      keys: Seq[String], payload: Column, dfCap: Int): DataFrame =
    dfCut(e, keys, dfCap)
      .groupBy(keys.map(col): _*)
      .agg(sort_array(collect_list(payload)).as("ds"))
      .filter(size(col("ds")) > 1)
      .select(GraftFunctions.graftPairsGen(spark, "ds"))

  /** N-gram Jaccard near-duplicate detection, the scalable way: explode
    * distinct shingles, build the postings list per (lang, shingle), emit
    * pairs straight from each postings list, count common shingles per
    * pair, then |A∩B|/(|A|+|B|-|A∩B|). No doc×doc cross join and no
    * self-join — candidate pairs only materialize where a shingle
    * collides. Top-100 by similarity (deterministic tie-break) keeps the
    * output stable at any SF. */
  def ngramJaccardPairs(spark: SparkSession, dir: String,
      preflight: Boolean = false): DataFrame = {
    if (preflight)
      // the sweep's exact postings frame, off the SAME shared grams
      // artifact the sweep re-explodes (built once, read by both)
      preflightPairSweep(
        gramsTable(spark, Tables.documentsPar(spark, dir))
          .select(col("lang"), explode(col("grams")).as("gram")),
        Seq("lang", "gram"), DfCap, "ngram_jaccard")
    ngramJaccardPairsAll(spark, dir)
      .orderBy(col("jaccard").desc, col("d1"), col("d2"))
      .limit(100)
  }

  /** The scored pair set WITHOUT the presentation top-k — the edge
    * source for dedupClusters and the recall baseline. CACHED as a
    * shared artifact: three queries consume it (the top-100 pair
    * report and both cluster algorithms), and with the two-pass df-cut
    * the uncached pipeline would run the count pass + anti-join +
    * pair aggregation once per consumer. The pair set is bounded by
    * construction (≤ dfCap²/2 pairs per kept group), the same scored-
    * edge artifact a production dedup sweep materializes before
    * clustering. */
  def ngramJaccardPairsAll(spark: SparkSession, dir: String): DataFrame =
    graft.Artifacts.shared(
      ngramJaccardPairsFrame(spark, Tables.documentsPar(spark, dir), DfCap))

  /** The pair pipeline over any (doc_id, lang, text) frame — the
    * testable core (DfCutSpec feeds planted-hot-gram corpora through it
    * with a small cap). PRE-FLIGHT at scale: [[ngramJaccardPairMass]]
    * (one aggregate) returns the exact pair count this sweep emits at
    * a cap — the dfCap here is an ABSOLUTE df cut, so a cap calibrated
    * to a small corpus sits in the measured quadratic regime on a big
    * one (r9: ~97× mass per 10× docs at DfCap=1000). */
  private[graft] def ngramJaccardPairsFrame(
      spark: SparkSession, docsIn: DataFrame, dfCap: Int): DataFrame = {
    // no size>0 filter: explode already drops empty-gram docs. The
    // postings derive from the SHARED shingle artifact (gramsTable):
    // the df-count pass and the pair pass each re-explode the cached
    // grams column — cheap against the cache, vs re-running the
    // interpreted shingle derivation per pass.
    val e = gramsTable(spark, docsIn)
      .withColumn("n_grams", size(col("grams")).cast("long"))
      .select(col("doc_id"), col("lang"), col("n_grams"),
        explode(col("grams")).as("gram"))
    // Pairs WITHOUT a self-join: group the postings list per shingle and
    // emit its pairs directly — the shingle derivation runs once (a
    // self-join would evaluate it per side), and one exchange on
    // (lang, gram) replaces two plus a broadcast. Hot stopword-grams are
    // dropped by the two-pass df-cut BEFORE the collect, so the
    // aggregation buffer is bounded at dfCap postings per group.
    val pairs = postingsPairs(spark, e, Seq("lang", "gram"),
      struct(col("doc_id"), col("n_grams")), dfCap)
    pairs.groupBy(col("l.doc_id").as("d1"), col("r.doc_id").as("d2"),
        col("l.n_grams").as("n1"), col("r.n_grams").as("n2"))
      .agg(count(lit(1)).as("common"))
      .withColumn("jaccard",
        col("common").cast("double") / (col("n1") + col("n2") - col("common")))
      .select("d1", "d2", "common", "n1", "n2", "jaccard")
  }

  /** Near-duplicate CLUSTERS: connected components over the jaccard≥0.5
    * pair graph, labels = min doc_id per component — the step that turns
    * pairwise similarity into "keep one document per cluster". Iterative
    * min-label propagation on DataFrames: each round joins labels to the
    * symmetric edge list and takes the per-node min (one shuffle per
    * round). Convergence is DETECTED, not assumed: labels only ever
    * decrease, so sum(root) strictly decreases until the fixpoint — one
    * cheap aggregate on the per-round checkpoint decides termination,
    * and exhausting the round budget raises instead of silently emitting
    * wrong labels. Near-dup components are shallow (dups of a common
    * source); at larger diameters the standard large-star/small-star
    * alternation drops convergence to O(log n) rounds with the same
    * per-round shape. */
  def dedupClusters(spark: SparkSession, dir: String): DataFrame = {
    val edges = ngramJaccardPairsAll(spark, dir)
      .filter(col("jaccard") >= 0.5)
      .select("d1", "d2")
    // the symmetric edge list is read every round — materialize it once
    val sym = edges.union(edges.select(col("d2").as("d1"), col("d1").as("d2")))
      .localCheckpoint(true)
    var labels = sym.select(col("d1").as("id")).distinct()
      .withColumn("root", col("id"))
      .localCheckpoint(true)
    def labelSum(): Long =
      labels.agg(sum(col("root"))).head().getLong(0)
    var prevSum = labelSum()
    var converged = false
    val maxRounds = 12
    for (round <- 1 to maxRounds if !converged) {
      val viaNbr = sym.join(labels, sym("d2") === labels("id"))
        .select(sym("d1").as("id"), col("root"))
      // localCheckpoint per round: without it the lineage doubles every
      // iteration and round k replays rounds 1..k-1 (measured 20 s vs
      // ~2 s at sf0.1) — the mandatory pattern for iterative DataFrame
      // algorithms
      labels = labels.union(viaNbr).groupBy("id").agg(min("root").as("root"))
        .localCheckpoint(true)
      val s = labelSum()
      converged = s == prevSum
      prevSum = s
      if (round == maxRounds && !converged)
        throw new IllegalStateException(
          s"dedupClusters did not converge in $maxRounds rounds — component " +
            "radius exceeds the budget; switch to large-star/small-star")
    }
    labels
      .select(col("id").as("doc_id"), col("root").as("cluster_id"))
      .orderBy("doc_id")
  }

  /** The same clusters via LARGE-STAR/SMALL-STAR alternation
    * (ConnectedComponents) — the O(log n)-round scale path for deep
    * components, where plain propagation above would need one shuffle
    * round per hop of component radius. Identical output (min doc_id
    * per component), identical oracle. */
  /** Cross-source duplication report — corpus governance: which SOURCES
    * duplicate each other (mirror sites, re-crawls, shared upstreams).
    * Near-dup pairs (the shared scored-pair artifact — no new pair
    * computation) join each side's source label, normalize the pair to
    * (min, max), and aggregate: pair counts per source pair plus the
    * share of all near-dup mass, flagging cross-source rows. Slim
    * throughout: pairs are (long, long), the doc→source side is a
    * two-column projection. */
  def crossSourceDupReport(spark: SparkSession, dir: String): DataFrame = {
    val pairs = ngramJaccardPairsAll(spark, dir)
      .filter(col("jaccard") >= 0.5).select("d1", "d2")
    val src = Tables.documentsPar(spark, dir).select("doc_id", "source")
    val labeled = pairs
      .join(src.select(col("doc_id").as("d1"), col("source").as("s1")), "d1")
      .join(src.select(col("doc_id").as("d2"), col("source").as("s2")), "d2")
      .select(least(col("s1"), col("s2")).as("src_a"),
        greatest(col("s1"), col("s2")).as("src_b"))
    labeled.groupBy("src_a", "src_b")
      .agg(count(lit(1)).as("n_pairs"))
      .withColumn("cross_source", col("src_a") =!= col("src_b"))
      .withColumn("frac", col("n_pairs").cast("double")
        / sum(col("n_pairs")).over(Window.partitionBy()))
      .orderBy(col("n_pairs").desc, col("src_a"), col("src_b"))
  }

  /** Near-dup component labels over the jaccard≥0.5 edge set, memoized
    * per (session, dir): three queries (dedup_clusters_ls, leakageSplit,
    * dedupKeepBest) consume the IDENTICAL labels, and the large-star/
    * small-star rounds would otherwise re-run per consumer (measured
    * ~0.4-0.5 s each at sf0.1). The frame is localCheckpointed inside
    * ConnectedComponents, so the memo holds materialized blocks, not
    * replayable lineage; unpersistAll clears the memo with the rest of
    * the artifact state. */
  private[graft] def nearDupLabels(spark: SparkSession, dir: String): DataFrame =
    graft.Artifacts.memo(
      s"neardup-labels:${System.identityHashCode(spark)}:$dir") {
      val edges = ngramJaccardPairsAll(spark, dir)
        .filter(col("jaccard") >= 0.5)
        .select("d1", "d2")
      ConnectedComponents.labels(edges)
    }

  def dedupClustersLS(spark: SparkSession, dir: String): DataFrame =
    nearDupLabels(spark, dir)
      .select(col("id").as("doc_id"), col("root").as("cluster_id"))
      .orderBy("doc_id")

  /** LEAKAGE-SAFE train/val/test split — the split step of a training
    * pipeline done at the NEAR-DUP-CLUSTER grain instead of the document
    * grain: hashing each document independently sends near-duplicates to
    * different splits, so eval scores are inflated by memorized
    * near-copies of training docs (the contamination mode dataset decks
    * warn about alongside verbatim overlap). Assigning the seeded hash
    * bucket to the CLUSTER id makes every near-dup cluster co-travel by
    * construction. Documents outside any cluster are their own cluster
    * (label = doc_id), so the split stays the familiar per-doc hash for
    * the non-duplicated bulk of the corpus.
    *
    * The report keeps the counterfactual visible: `naive_split` is the
    * per-doc hash assignment, and `naive_leaky` flags docs whose cluster
    * the naive rule would have straddled across splits. Buckets use the
    * shared 28-bit md5-prefix idiom (8 train / 1 val / 1 test).
    *
    * Scale shape: cluster labels come from the O(log n)-round
    * large-star/small-star components over the shared scored-pair
    * artifact; the label side is pairs-bounded and slim (two longs), the
    * corpus side joins it on doc_id and the cluster stats are one
    * exchange on cluster_id joined back at fan-out ≤ 1 per doc (the
    * rarity shape). Nothing here shuffles document text. */
  def leakageSplit(spark: SparkSession, dir: String): DataFrame = {
    val labels = nearDupLabels(spark, dir)
      .select(col("id").as("doc_id"), col("root"))
    def bucket(c: Column): Column = seededBucket(c, "#sp")
    def splitName(b: Column): Column =
      when(b <= 7, "train").when(b === 8, "val").otherwise("test")
    val b = Tables.documentsPar(spark, dir).select("doc_id")
      .join(labels, Seq("doc_id"), "left")
      .withColumn("cluster_id", coalesce(col("root"), col("doc_id")))
      .withColumn("naive_split", splitName(bucket(col("doc_id"))))
      .withColumn("split", splitName(bucket(col("cluster_id"))))
    // leak = the cluster's members land in more than one SPLIT under the
    // naive rule (distinct split names, not distinct hash buckets — two
    // buckets inside the train range are not a leak)
    val stats = b.groupBy("cluster_id")
      .agg(count(lit(1)).as("cluster_size"),
        countDistinct(col("naive_split")).as("n_naive"))
    b.join(stats, "cluster_id")
      .select(col("doc_id"), col("cluster_id"), col("cluster_size"),
        col("split"), col("naive_split"),
        (col("cluster_size") > 1L && col("n_naive") > 1L).as("naive_leaky"))
      .orderBy("doc_id")
  }

  /** QUALITY-AWARE dedup retention — the keep policy production dedups
    * actually apply: within each near-dup cluster keep the HIGHEST-
    * QUALITY member, not the lowest doc_id (the min-id keeper every
    * pair/cluster query reports is the canonical LABEL; which copy
    * survives is a separate, quality-ranked decision — e.g. the cleanest
    * crawl of a mirrored page). Ranking is (quality desc, doc_id asc):
    * the quality score is computed bit-identically in both engines, so
    * the comparison-based rank carries no float-accumulation risk, and
    * the doc_id tie-break makes the order total. Singletons are their
    * own cluster and trivially keep themselves.
    *
    * Scale shape: cluster labels from the O(log n) large-star/small-star
    * components over the shared pair artifact; quality attaches from its
    * shared artifact on the slim doc key; both windows (rank, keeper
    * broadcast-back) ride ONE cluster_id exchange, and cluster
    * populations are pair-bounded, so no window partition ever exceeds a
    * cluster's size. */
  def dedupKeepBest(spark: SparkSession, dir: String): DataFrame = {
    val labels = nearDupLabels(spark, dir)
      .select(col("id").as("doc_id"), col("root"))
    val q = graft.Artifacts.shared(qualityStats(spark, dir))
      .select(col("doc_id"), col("quality"))
    val w = Window.partitionBy("cluster_id")
      .orderBy(col("quality").desc, col("doc_id"))
    val cw = Window.partitionBy("cluster_id")
    Tables.documentsPar(spark, dir).select("doc_id")
      .join(labels, Seq("doc_id"), "left")
      .withColumn("cluster_id", coalesce(col("root"), col("doc_id")))
      .join(q, "doc_id")
      .withColumn("rn", row_number().over(w))
      .withColumn("cluster_size", count(lit(1)).over(cw))
      .withColumn("keeper_id", max(when(col("rn") === 1, col("doc_id"))).over(cw))
      .select(col("doc_id"), col("cluster_id"),
        col("cluster_size").cast("long").as("cluster_size"), col("quality"),
        col("keeper_id"), (col("doc_id") === col("keeper_id")).as("keep"))
      .orderBy("doc_id")
  }

  /** Deterministic corpus shuffle + sharding — the step between packing
    * and training: documents are dealt into `ShuffleShards` shards and
    * given a pseudo-random, REPRODUCIBLE order inside each (seeded hash,
    * no RNG — the same property mixSample's sampling key has). Rank ties
    * (28-bit key collisions) break on doc_id, so the order is total.
    *
    * Shape at 100 TB: one shuffle by shard, then a per-shard sort — and
    * a shard IS the unit a training corpus is written in (one file per
    * shard, one task per file), so the per-shard sort is the job's
    * natural granularity. The shard count is the parallelism knob:
    * production corpora use O(thousands); 16 keeps the toy SFs' shards
    * populated. */
  val ShuffleShards = 16

  def shardShuffle(spark: SparkSession, dir: String): DataFrame = {
    val key = conv(substring(md5(concat(col("doc_id").cast("string"), lit("#shuf"))
      .cast("binary")), 1, 7), 16, 10).cast("long")
    Tables.documentsPar(spark, dir)
      .withColumn("skey", key)
      .withColumn("shard", col("skey") % ShuffleShards)
      .withColumn("rank", row_number()
        .over(Window.partitionBy("shard").orderBy("skey", "doc_id"))
        .cast("long"))
      .select("doc_id", "shard", "rank")
      .orderBy("shard", "rank")
  }

  // --- BPE merge induction ---------------------------------------------

  /** BPE tokenizer-vocabulary induction (Sennrich et al. 2016) — the
    * K most frequent adjacent-symbol merges, learned the way production
    * BPE trainers do: over the DISTINCT-WORD frequency table, never the
    * corpus. One corpus scan builds (word, freq); every merge round then
    * touches only the vocabulary (|V| rows — thousands, not billions),
    * so K rounds cost K tiny shuffles regardless of corpus size. Pair
    * counting weights by word frequency and counts every adjacent
    * position (overlaps included); the merge applies LEFTMOST
    * NON-OVERLAPPING, via an `aggregate` fold over the symbol array
    * (interpreted HOF — fine, it runs on |V| rows). Ties break
    * (count desc, left asc, right asc); the per-round top-1 collect is
    * the same bounded-driver-state class as the IVF centroid pickup.
    * Rounds localCheckpoint the vocab to keep lineage flat.
    *
    * No DuckDB oracle: the leftmost-non-overlap fold needs a
    * struct-accumulator lambda (DuckDB 1.0's list_reduce cannot express
    * it) — spec tier instead, with the classic hand-computed fixture
    * (BpeSpec) pinning every merge exactly. */
  def bpeMerges(spark: SparkSession, dir: String, k: Int = 8): DataFrame =
    mergesToDf(spark, trainedMerges(spark, dir, k))

  /** The corpus word-frequency table — the BPE trainer's input and the
    * apply phase's vocabulary, built ONCE per (session, dir) as a
    * shared artifact so both faces (and bench reps) read the same
    * cached |V| rows. One helper, not two copies: the sharing is
    * structural, not an accident of plan canonicalization. */
  private def wordFreq(spark: SparkSession, dir: String): DataFrame =
    graft.Artifacts.shared(
      Tables.documentsPar(spark, dir)
        .select(explode(tokens).as("word"))
        .groupBy("word").agg(count(lit(1)).as("freq")))

  /** Train-once memo: the merge list is a few KB of driver state, and
    * every consumer (the merges query, the apply phase, bench reps)
    * would otherwise re-run the K training rounds — the same memo class
    * as the decontamination bloom. */
  private[graft] def trainedMerges(spark: SparkSession, dir: String,
      k: Int): Seq[(Int, String, String, Long)] =
    graft.Artifacts.memo(
      s"bpe-merges:${System.identityHashCode(spark)}:$dir:$k") {
      trainMerges(spark, wordFreq(spark, dir), k)
    }

  /** Apply an ordered merge list to a (word, …) vocabulary frame:
    * word → subtoken count after all merges. The testable core of
    * `bpeSegmentCounts` (BpeSpec drives it with the fixture's learned
    * merges). */
  private[graft] def bpeSegmentWords(wordFreq: DataFrame,
      merges: Seq[(String, String)]): DataFrame = {
    val vocab = wordFreq
      .select(col("word"),
        concat(filter(split(col("word"), ""), s => s =!= ""),
          array(lit("</w>"))).as("sym"))
    merges.foldLeft(vocab) { case (v, (l, r)) =>
      v.withColumn("sym", mergeFold(col("sym"), l, r))
    }.select(col("word"), size(col("sym")).cast("long").as("n_sub"))
  }

  /** Leftmost non-overlapping merge of (l, r) -> l+r over a symbol
    * array — the ONE fold both BPE training and application use. Fold
    * state = (emitted prefix, pending symbol); "" is a safe sentinel
    * (never a symbol). */
  private def mergeFold(sym: Column, l: String, r: String): Column =
    aggregate(
      sym,
      struct(array().cast("array<string>").as("out"), lit("").as("pend")),
      (acc, s) =>
        when(acc.getField("pend") === l && s === r,
          struct(concat(acc.getField("out"), array(lit(l + r))).as("out"),
            lit("").as("pend")))
        .when(acc.getField("pend") === "",
          struct(acc.getField("out").as("out"), s.as("pend")))
        .otherwise(
          struct(concat(acc.getField("out"), array(acc.getField("pend"))).as("out"),
            s.as("pend"))),
      acc => when(acc.getField("pend") === "", acc.getField("out"))
        .otherwise(concat(acc.getField("out"), array(acc.getField("pend")))))

  private[graft] def bpeMergesFromWordFreq(
      spark: SparkSession, wordFreq: DataFrame, k: Int): DataFrame =
    mergesToDf(spark, trainMerges(spark, wordFreq, k))

  private def mergesToDf(spark: SparkSession,
      ms: Seq[(Int, String, String, Long)]): DataFrame = {
    import spark.implicits._
    ms.toDF("merge_rank", "left", "right", "pair_count")
      .select(col("merge_rank").cast("long"), col("left"), col("right"),
        col("pair_count"))
      .orderBy("merge_rank")
  }

  private def trainMerges(spark: SparkSession, wordFreq: DataFrame,
      k: Int): Seq[(Int, String, String, Long)] = {
    // symbols = characters + the word-final marker
    var vocab = wordFreq.select(col("freq"),
      concat(filter(split(col("word"), ""), s => s =!= ""),
        array(lit("</w>"))).as("sym"))
      .localCheckpoint(true)
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    var exhausted = false // no pairs left: every word is one symbol
    for (round <- 1 to k if !exhausted) {
      val top = vocab
        .select(col("freq"), posexplode(
          zip_with(slice(col("sym"), lit(1), size(col("sym")) - 1),
            slice(col("sym"), lit(2), size(col("sym")) - 1),
            (a, b) => struct(a.as("l"), b.as("r")))).as(Seq("i", "p")))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("freq")).as("c"))
        .orderBy(col("c").desc, col("l").asc, col("r").asc)
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (l, r, c) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += ((round, l, r, c))
        vocab = vocab.withColumn("sym", mergeFold(col("sym"), l, r))
          .localCheckpoint(true)
      }
    }
    merges.result()
  }

  /** BPE APPLICATION — the other half of the tokenizer story: segment
    * the corpus with the merges `bpeMerges` learned. Like training,
    * application is per-DISTINCT-WORD: the K merge folds run over the
    * |V|-row vocabulary once, and the corpus only joins each token to
    * its precomputed subtoken count — segmentation cost is independent
    * of corpus size, the join is the standard word-keyed probe (hinted
    * shuffle-hash like the bigram probe: the static estimate must not
    * broadcast the exploded corpus side). Output per document: word
    * count, BPE token count (the `</w>` marker counts as part of the
    * last subtoken only when a merge absorbed it — standard), and
    * fertility (one double division). Oracle-checked since r6: DuckDB
    * replays the merge fold independently (replace() over a
    * delimiter-encoded symbol string, one recursive-CTE step per
    * merge) against the trained merges this library dumps — see the
    * doc_bpe_segment twin in Oracle.scala. */
  def bpeSegmentCounts(spark: SparkSession, dir: String, k: Int = 8): DataFrame = {
    val merges = trainedMerges(spark, dir, k).map(m => (m._2, m._3))
    val segmented = bpeSegmentWords(wordFreq(spark, dir), merges)
    Tables.documentsPar(spark, dir)
      .select(col("doc_id"), explode(tokens).as("word"))
      .join(segmented.hint("shuffle_hash"), "word")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"), sum(col("n_sub")).as("n_bpe_tokens"))
      .select(col("doc_id"), col("n_words"), col("n_bpe_tokens"),
        (col("n_bpe_tokens").cast("double") / col("n_words")).as("bpe_fertility"))
      .orderBy("doc_id")
  }

  // --- unigram-LM (SentencePiece) tokenizer ----------------------------

  /** Max candidate piece length and the cost grid of the unigram
    * trainer. Costs are −log-likelihoods QUANTIZED to the 2^20 integer
    * grid (floor of StrictMath.log — bit-stable across JVMs), so
    * Viterbi compares BIGINTs: segmentation is exactly reproducible,
    * order-independent, and spec-checkable against a driver fold, the
    * same determinism discipline as the mixture/bigram grids. */
  val UniMaxPieceLen = 4
  val UniGrid = 1048576L

  /** Viterbi segmentation of one word under integer piece costs —
    * minimal total cost; ties prefer the LONGER piece at each boundary
    * (deterministic). Returns empty for the empty word; every word is
    * segmentable because the trainer always keeps the full alphabet. */
  private[graft] def uniViterbi(word: String,
      costs: scala.collection.Map[String, Long]): Seq[String] = {
    val n = word.length
    if (n == 0) return Seq.empty
    val INF = Long.MaxValue / 4
    val best = Array.fill(n + 1)(INF)
    val bl = Array.fill(n + 1)(0) // chosen piece length ending at i
    best(0) = 0L
    var i = 1
    while (i <= n) {
      var l = 1
      while (l <= math.min(UniMaxPieceLen, i)) {
        if (best(i - l) < INF) {
          val c = costs.get(word.substring(i - l, i))
          if (c.isDefined) {
            val cand = best(i - l) + c.get
            if (cand < best(i) || (cand == best(i) && l > bl(i))) {
              best(i) = cand; bl(i) = l
            }
          }
        }
        l += 1
      }
      i += 1
    }
    require(best(n) < INF, s"unsegmentable word '$word' — alphabet lost")
    val out = scala.collection.mutable.ListBuffer.empty[String]
    var j = n
    while (j > 0) { out.prepend(word.substring(j - bl(j), j)); j -= bl(j) }
    out.toList
  }

  /** UNIGRAM-LM tokenizer-vocabulary training (`vocab_unigram`) — the
    * SentencePiece algorithm (Kudo 2018), the second real tokenizer
    * trainer beside BPE and the one modern LLM vocabularies actually
    * ship: pieces are not grown bottom-up by merges but SELECTED — seed
    * a large candidate set, then alternate (E) Viterbi-segment the
    * corpus under current piece likelihoods and (M) re-estimate piece
    * probabilities from usage, pruning low-usage pieces toward the
    * target vocabulary. This implementation keeps the algorithm's
    * shape with two deterministic simplifications, both documented:
    * hard-EM (Viterbi counts, not lattice marginals) and prune-by-count
    * (not leave-one-out loss).
    *
    * Scale shape — the trainer is CORPUS-SIZE-INDEPENDENT like BPE:
    *  - the corpus appears only through the shared |V|-row word-
    *    frequency artifact (one corpus scan, already paid);
    *  - seeding explodes each distinct word into ≤ 4·len substrings,
    *    aggregates freq-weighted occurrence counts (one |V|-bounded
    *    shuffle), and keeps the top candidates (bounded collect:
    *    4·vocabSize rows + the alphabet);
    *  - each EM round maps the |V| words through `uniViterbi` with the
    *    piece table BROADCAST (mapPartitions, no shuffle of the words),
    *    aggregates piece-usage counts map-side, and collects the
    *    ≤|pieces| totals — bounded driver state per round, exactly the
    *    Lloyd-sums class;
    *  - Laplace-smoothed likelihoods land on the integer grid, so
    *    every round and the final ranking are bit-deterministic. */
  private[graft] def unigramTrainFromWordFreq(spark: SparkSession,
      wf: DataFrame, vocabSize: Int,
      rounds: Int): Seq[(String, Long, Long)] = {
    import spark.implicits._
    val words = wf.select(col("word"), col("freq")).as[(String, Long)]
    // seed: freq-weighted substring occurrence counts
    val subCounts = words.flatMap { case (w, f) =>
      for {
        i <- 0 until w.length
        l <- 1 to math.min(UniMaxPieceLen, w.length - i)
      } yield (w.substring(i, i + l), f)
    }.groupBy(col("_1").as("piece")).agg(sum(col("_2")).as("c"))
    val alphabet = subCounts.filter(length(col("piece")) === 1)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    val multis = subCounts.filter(length(col("piece")) > 1)
      .orderBy(col("c").desc, col("piece").asc)
      .limit(4 * vocabSize)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    def costsOf(counts: Seq[(String, Long)]): Map[String, Long] = {
      val total = counts.map(_._2).sum.toDouble + counts.size
      counts.map { case (p, c) =>
        p -> -math.floor(StrictMath.log((c + 1).toDouble / total) * UniGrid).toLong
      }.toMap
    }
    def prune(counts: Seq[(String, Long)]): Seq[(String, Long)] = {
      val (singles, rest) = counts.partition(_._1.length == 1)
      val keep = rest.sortBy { case (p, c) => (-c, p) }
        .take(math.max(0, vocabSize - singles.size))
      singles ++ keep
    }
    var pieces: Seq[(String, Long)] = prune(alphabet.toSeq ++ multis.toSeq)
    for (_ <- 1 to rounds) {
      val bc = spark.sparkContext.broadcast(costsOf(pieces))
      val used = words.flatMap { case (w, f) =>
        uniViterbi(w, bc.value).map(p => (p, f))
      }.groupBy(col("_1").as("piece")).agg(sum(col("_2")).as("c"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      // singles survive at zero usage (segmentability floor)
      pieces = prune(pieces.map { case (p, _) => p -> used.getOrElse(p, 0L) })
    }
    val finalCosts = costsOf(pieces)
    // one more counting pass under the SHIPPED costs: the emitted
    // viterbi_count is the usage a consumer segmenting with this piece
    // table actually observes (the loop's last counts were measured
    // under the PREVIOUS round's costs) — which also makes the count,
    // rank, and n_chars columns independently recomputable by the
    // DuckDB twin from (piece, cost_grid) + the raw corpus
    val bcF = spark.sparkContext.broadcast(finalCosts)
    val finalUsed = words.flatMap { case (w, f) =>
      uniViterbi(w, bcF.value).map(p => (p, f))
    }.groupBy(col("_1").as("piece")).agg(sum(col("_2")).as("c"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    pieces.map { case (p, _) => p -> finalUsed.getOrElse(p, 0L) }
      .sortBy { case (p, c) => (-c, p) }
      .map { case (p, c) => (p, c, finalCosts(p)) }
  }

  private[graft] def trainedUnigram(spark: SparkSession, dir: String,
      vocabSize: Int, rounds: Int): Seq[(String, Long, Long)] =
    graft.Artifacts.memo(
      s"uni-vocab:${System.identityHashCode(spark)}:$dir:$vocabSize:$rounds") {
      unigramTrainFromWordFreq(spark, wordFreq(spark, dir), vocabSize, rounds)
    }

  /** The `vocab_unigram` query: the trained piece table, ranked by the
    * final-pass Viterbi usage under the shipped costs. Oracle-checked
    * since r6b on the doc_bpe_segment trust model: (piece, cost_grid)
    * is the shared trained state, and the DuckDB twin independently
    * re-derives viterbi_count / rank / n_chars by re-running the
    * backtraced Viterbi over the raw corpus (the EM loop itself stays
    * spec-tier — UnigramSpec pins the fixture behavior). */
  def unigramVocab(spark: SparkSession, dir: String, vocabSize: Int = 200,
      rounds: Int = 3): DataFrame = {
    import spark.implicits._
    trainedUnigram(spark, dir, vocabSize, rounds).zipWithIndex
      .map { case ((p, c, g), i) => (i + 1L, p, p.length.toLong, c, g) }
      .toDF("rank", "piece", "n_chars", "viterbi_count", "cost_grid")
      .orderBy("rank")
  }

  /** Unigram APPLICATION (`doc_unigram_segment`) — segment the corpus
    * with the learned pieces, the `bpeSegmentCounts` twin for the
    * unigram tokenizer: per-distinct-word Viterbi over the |V|-row
    * vocabulary (broadcast piece table, mapPartitions, zero shuffle),
    * then the corpus joins each token to its piece count — application
    * cost independent of corpus size, same hinted shuffle-hash probe
    * as the BPE face. Oracle-checked since r6: DuckDB re-runs the
    * Viterbi DP as a recursive CTE over the trained piece table (see
    * the doc_unigram_segment twin in Oracle.scala). */
  def unigramSegmentCounts(spark: SparkSession, dir: String,
      vocabSize: Int = 200, rounds: Int = 3): DataFrame = {
    import spark.implicits._
    val costs = trainedUnigram(spark, dir, vocabSize, rounds)
      .map { case (p, _, g) => p -> g }.toMap
    val bc = spark.sparkContext.broadcast(costs)
    val segmented = wordFreq(spark, dir).select(col("word")).as[String]
      .mapPartitions { it =>
        it.map(w => (w, uniViterbi(w, bc.value).size.toLong))
      }.toDF("word", "n_pieces")
    Tables.documentsPar(spark, dir)
      .select(col("doc_id"), explode(tokens).as("word"))
      .join(segmented.hint("shuffle_hash"), "word")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"), sum(col("n_pieces")).as("n_uni_tokens"))
      .select(col("doc_id"), col("n_words"), col("n_uni_tokens"),
        (col("n_uni_tokens").cast("double") / col("n_words"))
          .as("uni_fertility"))
      .orderBy("doc_id")
  }

  // --- PII redaction ---------------------------------------------------

  /** PII patterns in the Java/RE2 COMMON dialect (plain classes,
    * bounded quantifiers, no backrefs/lookarounds) so Spark and the
    * DuckDB oracle match the same spans. Applied in list order; each
    * pattern's count is taken BEFORE its replacement. */
  val PiiPatterns: Seq[(String, String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phone", "\\+[0-9][0-9()\\- ]{6,}[0-9]", "<PHONE>"),
    ("ip", "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}", "<IP>"),
    ("id9", "[0-9]{9,}", "<ID>"))

  /** Redact PII from a (…, `textCol`, …) frame: emails, international
    * phone numbers, dotted quads, and long digit runs are replaced by
    * typed placeholders, with one count column per pattern — the
    * scrubbing gate every public-corpus pipeline runs before training.
    * Pure regexp column expressions: single scan, codegen'd,
    * embarrassingly parallel at 100 TB (no shuffle at all). Patterns
    * apply in `PiiPatterns` order, so a dotted quad inside an already
    * redacted email is not double-counted. */
  def piiRedact(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val counted = PiiPatterns.foldLeft(docs.withColumn("redacted", col(textCol))) {
      case (df, (name, pat, repl)) =>
        df.withColumn(s"n_$name",
            size(regexp_extract_all(col("redacted"), lit(pat), lit(0))).cast("long"))
          .withColumn("redacted", regexp_replace(col("redacted"), pat, repl))
    }
    counted.withColumn("n_pii",
      PiiPatterns.map { case (n, _, _) => col(s"n_$n") }.reduce(_ + _))
  }

  /** The `doc_pii_redact` query: the synthetic corpus carries no PII
    * (word-salad, zero digits), so the query PLANTS a deterministic
    * contact line per document — built identically in the oracle SQL —
    * and redacts that. The stand-in keeps the oracle compare exercising
    * real replacements on every row (counts >= 3, text provably
    * rewritten) instead of vacuously hashing unchanged text; `piiRedact`
    * itself is the generic library face (PiiRedactSpec drives it over
    * planted fixtures directly). */
  def piiRedactQuery(spark: SparkSession, dir: String): DataFrame =
    piiRedact(
      Tables.documentsPar(spark, dir).withColumn("pii_text",
        concat(col("text"),
          lit(" contact user"), col("doc_id"), lit("@example.com or +1 (555) 010-"),
          lpad((col("doc_id") % 10000).cast("string"), 4, "0"),
          lit(" host 10.0."), (col("doc_id") % 256).cast("string"), lit(".1"),
          lit(" ref "), lpad((col("doc_id") % 100000).cast("string"), 12, "0"))),
      textCol = "pii_text")
      .select("doc_id", "n_email", "n_phone", "n_ip", "n_id9", "n_pii", "redacted")
      .orderBy("doc_id")

  // --- bigram language-model fluency score -----------------------------

  /** Bigram-LM fluency score — the KenLM-style perplexity filter's
    * deterministic stand-in: every document is scored by how common its
    * token TRANSITIONS are in the corpus itself. For each adjacent pair
    * (w1, w2), the conditional frequency c(w1 w2)/c(w1·) is put on the
    * 2^20 integer grid with FLOOR DIVISION — c(w1 w2) * 2^20 div
    * c(w1·) — so the per-document sum is a BIGINT (order-independent,
    * oracle-exact), and only the final score performs one double
    * division. Gibberish (rare transitions) scores near 0; formulaic
    * text near 1.
    *
    * Shape at 100 TB: token pairs are PER-DOCUMENT — an array slice-zip
    * over the materialized tokens column (the wordTrigramsAll idiom), so
    * pair extraction is shuffle-FREE; the bigram/prefix count tables are
    * classic LM estimation aggregates (map-side combinable); the scoring
    * join keys on the bigram string. Zipf skew concentrates count rows
    * on few keys but the COUNT tables are slim (two longs); AQE
    * skew-join handles the probe side. */
  def bigramLm(spark: SparkSession, dir: String): DataFrame =
    bigramLmFrame(Tables.documentsPar(spark, dir)).orderBy("doc_id")

  /** The per-document bigram explosion both LM faces share. */
  private[graft] def bigramPairs(docs: DataFrame): DataFrame =
    docs.withColumn("toks", tokens)
      .select(col("doc_id"), explode(
        when(size(col("toks")) < 2, array().cast("array<string>"))
          .otherwise(transform(sequence(lit(1), size(col("toks")) - 1), i =>
            concat_ws(" ", element_at(col("toks"), i),
              element_at(col("toks"), i + 1))))).as("bg"))

  /** The trained LM itself — (bg, g): grid-quantized conditional
    * bigram frequency. Extracted so the streaming ingest gate can
    * TRAIN it once on a corpus and score later batches against it
    * (`CorpusIngest.trainLmModel`/`gateLm`). */
  private[graft] def bigramModel(pairs: DataFrame): DataFrame = {
    // the bigram-count table is the LM model — a shared artifact (like
    // gramsTable), so the prefix fold, the ratio attach, and warm bench
    // reps all read one materialization instead of re-running the
    // explode+lead pass (plan showed 3 corpus passes without it)
    val cb = graft.Artifacts.shared(
      pairs.groupBy("bg").agg(count(lit(1)).as("cb")))
    // prefix totals fold over the (small) bigram-count table, not the
    // exploded pairs — one corpus aggregation, not two
    val cp = cb.groupBy(split(col("bg"), " ").getItem(0).as("w1"))
      .agg(sum(col("cb")).as("cp"))
    // grid ratio attached to the count table FIRST (count ⨝ count, slim),
    // so the exploded pairs shuffle exactly once, on bg
    cb.withColumn("w1", split(col("bg"), " ").getItem(0))
      .join(cp, "w1")
      .select(col("bg"), expr("(cb * 1048576) div cp").as("g"))
  }

  private[graft] def bigramLmFrame(docs: DataFrame): DataFrame = {
    val G = 1048576L // 2^20 grid, matching the mixture sampler's
    val pairs = bigramPairs(docs)
    val scored = bigramModel(pairs)
    // SHUFFLE-HASH with the count table as build side: without the hint
    // the planner broadcasts whichever side its static estimate likes —
    // at test SFs that was the exploded CORPUS pairs (a corpus broadcast
    // at 100 TB). The count table is the smaller side but still
    // vocab²-bounded, so a shuffle join keyed on bg is the shape that
    // survives scale; AQE may still locally convert when runtime stats
    // allow.
    pairs.select("doc_id", "bg").join(scored.hint("shuffle_hash"), "bg")
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_pairs"),
        sum(col("g")).as("lm_grid"))
      .select(col("doc_id"), col("n_pairs"), col("lm_grid"),
        (col("lm_grid").cast("double") / (col("n_pairs") * G)).as("lm_score"))
  }

  // --- hashed-feature linear quality classifier ------------------------

  /** Feature-hash bucket count and weight grid of the linear classifier
    * — mirrored literally in the oracle twin; move together. */
  val ClsBuckets = 4096L

  /** The stand-in trained weight for bucket b: md5₂₈("cls#" + b) mod
    * 2^16 - 2^15. Computed ONCE driver-side (java MD5 ≡ Spark md5 ≡
    * DuckDB md5 on the same bytes) and shipped as a plan-time array
    * literal — the broadcast-model-array shape of real classifier
    * inference. The oracle twin derives the identical integer from the
    * same formula in SQL. */
  private[graft] def clsWeight(b: Long): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s"cls#$b".getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 7), 16) % 65536L - 32768L
  }

  /** Model-based quality scoring (`doc_classifier_score`) — the
    * fastText/hash-kernel linear classifier face of corpus filtering
    * (the pattern behind CCNet's and LLaMA's "page quality" filters):
    * every document is scored by a linear model over HASHED sparse
    * features — lowercased word unigrams + adjacent bigrams, each
    * hashed into one of 4096 weight buckets (the hashing trick: the
    * model is a fixed-size dense weight vector no matter how large the
    * vocabulary grows).
    *
    * The weight table is a deterministic stand-in for trained
    * parameters: w(b) = md5₂₈("cls#" + b) mod 2^16 - 2^15, integers in
    * [-32768, 32767] (`clsWeight`), precomputed once and shipped as a
    * 4096-entry plan-time array — exactly how a real scorer looks
    * weights up from a broadcast model array, and reproducible
    * integer-for-integer in the oracle's SQL md5. Scoring is
    * INTEGER-EXACT: score_units = Σ w(bucket(f)) accumulates BIGINTs
    * inside one array fold (order-independent by integrality), and only
    * the final normalized score divides once.
    *
    * Shape at 100 TB: ZERO shuffle — tokenize, hash, look up and fold
    * entirely inside per-row expressions; the only exchange in the
    * query is the presentation sort. This is the classifier-inference
    * shape that lets a quality model run inside the ingest scan itself.
    * Scoring runs as ONE custom-expression pass per row
    * (`ClassifierScoreUnits` — the composed transform/aggregate form
    * ran every feature through interpreted lambda frames, 21% of the
    * whole 91-query bench; kept as `classifierFrameComposed` for the
    * parity spec). */
  def classifierScore(spark: SparkSession, dir: String): DataFrame =
    classifierFrame(Tables.documentsPar(spark, dir)).orderBy("doc_id")

  private[graft] def classifierFrame(docs: DataFrame): DataFrame =
    classifierRender(docs
      .withColumn("toks", tokens)
      // one custom-expression pass: lowercase, unigram+bigram features,
      // md5 bucket, weight fold — the composed twin below is the spec's
      // parity reference (ExpressionParitySpec) and the oracle's shape
      .withColumn("n_feat", when(size(col("toks")) < 2, size(col("toks")))
        .otherwise(size(col("toks")) * 2 - 1).cast("long"))
      .withColumn("score_units",
        graft.plans.GraftFunctions.graftClsScore(docs.sparkSession, "toks")))

  /** The composed built-in form of the classifier — the shape the oracle
    * twin mirrors token-for-token; `ClassifierScoreUnits` must stay a
    * drop-in replacement for it (ExpressionParitySpec). */
  private[graft] def classifierFrameComposed(docs: DataFrame): DataFrame = {
    def h28(c: Column): Column =
      conv(substring(md5(c.cast("binary")), 1, 7), 16, 10).cast("long")
    val bis = when(size(col("toks")) < 2, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), size(col("toks")) - 1), i =>
        concat_ws(" ", element_at(col("toks"), i),
          element_at(col("toks"), i + 1))))
    classifierRender(docs
      .withColumn("toks", transform(tokens, t => lower(t)))
      .withColumn("feats", concat(col("toks"), bis))
      .withColumn("wts", transform(col("feats"), f =>
        element_at(typedLit((0 until ClsBuckets.toInt).map(b => clsWeight(b))),
          (h28(f) % lit(ClsBuckets)).cast("int") + 1)))
      .withColumn("n_feat", size(col("feats")).cast("long"))
      .withColumn("score_units", aggregate(col("wts"), lit(0L), (a, x) => a + x)))
  }

  private def classifierRender(scored: DataFrame): DataFrame =
    scored
      .filter(col("n_feat") > 0)
      .select(col("doc_id"), col("n_feat"), col("score_units"),
        (col("score_units").cast("double") / (col("n_feat") * lit(65536.0)))
          .as("score"),
        (col("score_units") > 0L).as("label_keep"))

  /** CCNet-style perplexity bucketing (`doc_ppl_buckets`) — the
    * head/middle/tail split CCNet (Wenzek et al. 2020) applies per
    * language before training-set mixing: documents are ranked by LM
    * fluency WITHIN their language and cut into rank terciles (ntile —
    * rank-based, so no float interpolation crosses the engines; ties
    * broken by doc_id make the ordering total and the twin's ntile
    * land identically). Score = the bigram-LM fluency (`bigramLm`,
    * grid-exact doubles), language = the corpus's own lang column (the
    * metadata join CCNet's pipeline does against its langID output).
    *
    * Scale shape: the LM frame arrives hash-partitioned on doc_id from
    * its aggregate, the metadata join co-partitions on the same key,
    * and the tercile window shuffles once on lang. The honest caveat:
    * an exact rank tercile is one sorted window PER LANGUAGE —
    * parallelism bounded by the language count (each sort spills via
    * UnsafeExternalSorter, so it completes, just wide-task). The 100 TB
    * variant keeps this frame for the assignment but derives the two
    * cut scores per language from the mergeable quantile machinery
    * (`kllDailyMerge` / `quantilesByValueCounts`) and assigns by
    * threshold — embarrassingly parallel, at the price of sketch-
    * boundary ties; this query ships the exact-rank face the oracle
    * can pin. */
  def pplBuckets(spark: SparkSession, dir: String): DataFrame = {
    val lm = bigramLmFrame(Tables.documentsPar(spark, dir))
      .select(col("doc_id"), col("lm_score"))
    val meta = Tables.documents(spark, dir).select(col("doc_id"), col("lang"))
    val byLang = org.apache.spark.sql.expressions.Window
      .partitionBy("lang").orderBy(col("lm_score").desc, col("doc_id"))
    lm.join(meta, "doc_id")
      .withColumn("tercile", ntile(3).over(byLang).cast("long"))
      .withColumn("bucket",
        when(col("tercile") === 1L, lit("head"))
          .when(col("tercile") === 2L, lit("middle"))
          .otherwise(lit("tail")))
      .select("doc_id", "lang", "lm_score", "tercile", "bucket")
      .orderBy("doc_id")
  }

  // --- feature-hashed document embeddings ------------------------------

  /** Dimension count of the hashed document embedding — mirrored
    * literally in the oracle twin; move together. */
  val EmbedDims = 64L

  /** Feature-hashed document embeddings (`doc_hash_embed`) — the
    * hashing-trick sparse random projection (Weinberger et al. 2009,
    * the vectorizer behind fastText/VW-style text models): every
    * lowercased token is assigned ONE of 64 dimensions by md5₂₈ mod 64
    * and a ±1 sign by the next md5 bit, and the document's embedding is
    * the signed count vector — an INTEGER-EXACT, order-independent
    * fold, so the DuckDB twin lands on bit-identical arrays. This is
    * the bridge between the text tier and the vector tier: it
    * manufactures an embedding column from raw text with zero training,
    * and its output is directly consumable by the ANN family (cosine /
    * LSH / IVF / PQ all take any fixed-width numeric array).
    *
    * Shape at 100 TB: ZERO shuffle — tokenize, hash and accumulate run
    * inside ONE custom-expression pass per row (`HashEmbedUnits`; the
    * composed transform(sequence(0,63), aggregate(...)) form re-walks
    * every token array 64 times through interpreted lambda frames — the
    * doc_classifier_score lesson, kept below as the parity reference).
    * The only exchange is the presentation sort; embedding production
    * runs inside the ingest scan like classifier inference. */
  def hashEmbed(spark: SparkSession, dir: String): DataFrame =
    hashEmbedFrame(Tables.documentsPar(spark, dir)).orderBy("doc_id")

  private[graft] def hashEmbedFrame(docs: DataFrame): DataFrame =
    hashEmbedRender(docs
      .withColumn("toks", tokens)
      .withColumn("emb",
        graft.plans.GraftFunctions.graftHashEmbed(docs.sparkSession, "toks")))

  /** The composed built-in form — the shape the oracle twin mirrors
    * token-for-token; `HashEmbedUnits` must stay a drop-in replacement
    * for it (ExpressionParitySpec). */
  private[graft] def hashEmbedFrameComposed(docs: DataFrame): DataFrame = {
    def h28(c: Column): Column =
      conv(substring(md5(c.cast("binary")), 1, 7), 16, 10).cast("long")
    hashEmbedRender(docs
      .withColumn("toks", tokens)
      .withColumn("hs", transform(col("toks"), t => h28(lower(t))))
      .withColumn("emb", transform(sequence(lit(0L), lit(EmbedDims - 1)), d =>
        aggregate(col("hs"), lit(0L), (a, h) =>
          // (h div 64) % 2 == bit 6 of h == h & 64 (dims is a power of 2)
          a + when(pmod(h, lit(EmbedDims)) === d,
            when(h.bitwiseAND(lit(EmbedDims)) === 0L, lit(1L))
              .otherwise(lit(-1L))).otherwise(lit(0L))))))
  }

  /** The embedding rides the compare as a canonical CSV string (the
    * sig_decisions convention — the hash-compare harness is scalar-
    * column based), plus an integer norm; the array form stays
    * available to the ANN tier via `hashEmbedVectors`. */
  private def hashEmbedRender(embedded: DataFrame): DataFrame =
    embedded.select(
      col("doc_id"),
      size(col("toks")).cast("long").as("n_tokens"),
      array_join(col("emb").cast("array<string>"), ",").as("embedding_csv"),
      aggregate(col("emb"), lit(0L), (a, x) => a + x * x).as("norm_sq"))

  /** The array-typed face for vector-tier composition: (doc_id,
    * vec: array<double>) — directly consumable by the ANN family. */
  def hashEmbedVectors(spark: SparkSession, dir: String): DataFrame =
    Tables.documentsPar(spark, dir)
      .withColumn("toks", tokens)
      .select(col("doc_id"),
        graft.plans.GraftFunctions.graftHashEmbed(spark, "toks")
          .cast("array<double>").as("vec"))

  /** The composed text→vector→search query (`emb_hash_topk`): cosine
    * top-k over the HASHED embeddings — eval-split docs (the same md5
    * bucket rule as DSIR/curation) query the raw corpus, proving the
    * manufactured embedding column drops straight into the ANN family.
    * The dot products are INTEGER-exact (BIGINT folds over the signed
    * counts — order-independent), so only the final cosine division
    * touches floats, with the token order the oracle repeats.
    *
    * Scale shape: the query side is the tiny eval split — broadcast —
    * so candidate scoring is a per-row loop over the corpus scan (one
    * BroadcastNestedLoopJoin, the brute-force baseline shape); the
    * top-k cut is one window exchange on q_id. The scale path for big
    * query sets is the LSH/IVF/PQ family over `hashEmbedVectors`. */
  /** The shared (doc_id, emb, norm_sq, is_eval) artifact both
    * hashed-document search faces read — brute force and ANN score the
    * SAME vectors, so recall comparisons are apples-to-apples. */
  private def hashEmbedBase(spark: SparkSession, dir: String): DataFrame =
    graft.Artifacts.shared(
      Tables.documentsPar(spark, dir)
        .withColumn("toks", tokens)
        .select(col("doc_id"),
          graft.plans.GraftFunctions.graftHashEmbed(spark, "toks").as("emb"))
        .withColumn("norm_sq", aggregate(col("emb"), lit(0L), (a, x) => a + x * x))
        .filter(col("norm_sq") > 0L)
        .withColumn("is_eval", sampleBucket === 0))

  def hashEmbedTopK(spark: SparkSession, dir: String, k: Int = 3): DataFrame = {
    val base = hashEmbedBase(spark, dir)
    val q = base.filter(col("is_eval"))
      .select(col("doc_id").as("q_id"), col("emb").as("qemb"),
        col("norm_sq").as("q_nsq"))
    val c = base.filter(!col("is_eval"))
      .select(col("doc_id").as("c_id"), col("emb").as("cemb"),
        col("norm_sq").as("c_nsq"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("q_id").orderBy(col("sim").desc, col("c_id"))
    c.join(broadcast(q))
      // one JVM-loop dot per pair (LongDot) — the composed
      // aggregate(zip_with(...)) fold ran 128 interpreted lambda frames
      // per candidate and was the whole query (the classifier lesson;
      // parity pinned in ExpressionParitySpec)
      .withColumn("dot",
        graft.plans.GraftFunctions.graftDotLong(spark, "qemb", "cemb"))
      .withColumn("sim", col("dot").cast("double") /
        (sqrt(col("q_nsq").cast("double")) * sqrt(col("c_nsq").cast("double"))))
      // SLIM before the window: the top-k exchange repartitions every
      // (query, candidate) pair on q_id, and without this projection it
      // shipped both 64-long embedding arrays per pair — ~1 KB/row,
      // gigabytes of shuffle at sf0.1 and the prime suspect for the
      // r5 driver-env 17 s outlier (spill under memory pressure).
      // Three slim columns make the exchange ~25 B/row; the plan pin
      // in PlanShapeSpec asserts no array column crosses it.
      .select(col("q_id"), col("c_id"), col("sim"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= k)
      .select(col("q_id"), col("c_id"), col("rn"), col("sim"))
      .orderBy("q_id", "rn")
  }

  /** DecompProbe face of the top-k scan: the same pair scoring with the
    * dot either composed (aggregate∘zip_with) or the LongDot loop —
    * the measurement behind the production choice. */
  private[graft] def hashEmbedTopKProbe(spark: SparkSession, dir: String,
      composedDot: Boolean): DataFrame = {
    val base = Tables.documentsPar(spark, dir)
      .withColumn("toks", tokens)
      .select(col("doc_id"),
        graft.plans.GraftFunctions.graftHashEmbed(spark, "toks").as("emb"))
      .withColumn("is_eval", sampleBucket === 0)
    val q = base.filter(col("is_eval"))
      .select(col("doc_id").as("q_id"), col("emb").as("qemb"))
    val c = base.filter(!col("is_eval"))
      .select(col("doc_id").as("c_id"), col("emb").as("cemb"))
    val dot =
      if (composedDot)
        aggregate(zip_with(col("qemb"), col("cemb"), (a, b) => a * b),
          lit(0L), (s, x) => s + x)
      else graft.plans.GraftFunctions.graftDotLong(spark, "qemb", "cemb")
    c.join(broadcast(q)).select(col("q_id"), col("c_id"), dot.as("dot"))
  }

  /** IVF-prefiltered hashed-document search (`emb_hash_ann`) — the
    * SCALE path the brute-force `hashEmbedTopK` is the recall oracle
    * for, mirroring the embedding tier's composition (emb_ann_ivfpq:
    * coarse cells prune the scan, the exact metric reranks survivors):
    *  - coarse quantizer: the nCent lowest-doc_id candidate embeddings
    *    seed the cells (the same deterministic kmeans-lite init as
    *    emb_ann_ivf, in INTEGER space), and assignment minimizes the
    *    BIGINT score ‖c‖² − 2·v·c (≡ argmin L2, the ‖v‖² term cancels)
    *    via the single-pass HashIvfAssignTop2 expression — no float
    *    anywhere, so the DuckDB twin reproduces cells bit-exactly;
    *  - queries (the eval split) probe their nprobe=2 nearest cells;
    *  - candidates come from an EQUI-JOIN on the cell id — the scan the
    *    brute-force face does over ALL pairs is pruned to ~2/nCent of
    *    the corpus — and survivors are reranked by the same
    *    LongDot-exact cosine, top-k per query.
    *
    * Scale shape: assignment is embarrassingly parallel (a per-row
    * expression over broadcast centroid state, like the float IVF); the
    * candidate join broadcasts the exploded query side and probes on a
    * compact integer key, so the 100× story is "scan the probed cells,
    * not the corpus" — with cell stats as the partition key, a real
    * deployment prunes at the file level too. HashAnnRecallSpec pins
    * recall@k against the brute-force face; the oracle checks the whole
    * pipeline bit-exactly. */
  def hashEmbedAnn(spark: SparkSession, dir: String, k: Int = 3,
      nCent: Int = 16): DataFrame = {
    val base = hashEmbedBase(spark, dir)
    val cand = base.filter(!col("is_eval"))
    val cents: IndexedSeq[(Seq[Long], Long)] = graft.Artifacts.memo(
      s"hash-ivf:${System.identityHashCode(spark)}:$dir:$nCent") {
      cand.orderBy("doc_id").limit(nCent)
        .select(col("emb"), col("norm_sq")).collect()
        .map(r => (r.getSeq[Long](0), r.getLong(1))).toIndexedSeq
    }
    val asg = graft.plans.GraftFunctions.graftHashIvfAssign(
      spark, "emb", cents.map(_._1), cents.map(_._2))
    val c = cand
      .withColumn("cell", asg.getField("cell"))
      .select(col("doc_id").as("c_id"), col("emb").as("cemb"),
        col("norm_sq").as("c_nsq"), col("cell"))
    val q = base.filter(col("is_eval"))
      .withColumn("asg", asg)
      .select(col("doc_id").as("q_id"), col("emb").as("qemb"),
        col("norm_sq").as("q_nsq"),
        explode(array(col("asg.cell"), col("asg.cell2"))).as("probe"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("q_id").orderBy(col("sim").desc, col("c_id"))
    c.join(broadcast(q), col("cell") === col("probe"))
      .withColumn("dot",
        graft.plans.GraftFunctions.graftDotLong(spark, "qemb", "cemb"))
      .withColumn("sim", col("dot").cast("double") /
        (sqrt(col("q_nsq").cast("double")) * sqrt(col("c_nsq").cast("double"))))
      // slim before the rank machinery — the emb_hash_topk lesson
      .select(col("q_id"), col("cell"), col("c_id"), col("sim"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= k)
      .select(col("q_id"), col("cell"), col("c_id"), col("rn"), col("sim"))
      .orderBy("q_id", "rn")
  }

  // --- DSIR importance weighting ---------------------------------------

  /** Hash-bucket count of the DSIR importance estimate — mirrored
    * literally in the oracle twin; move together. */
  val DsirBuckets = 4096L

  /** DSIR-style IMPORTANCE WEIGHTING (`doc_importance_dsir`) — Data
    * Selection via Importance Resampling (Xie et al. 2023,
    * arXiv:2302.03169), the UNSUPERVISED counterpart of
    * `doc_classifier_score`: instead of trained weights, each hashed
    * bigram bucket gets the Laplace-smoothed LIKELIHOOD RATIO between a
    * TARGET distribution (here the deterministic eval split — the same
    * `sampleBucket = 0` population the contamination sweep treats as
    * the benchmark stand-in) and the RAW distribution (everything
    * else). A raw document's importance is the mean per-bigram ratio;
    * resampling keeps documents whose mass leans toward the target.
    *
    * Exactness: the ratio estimate for bucket b is
    * ((t+1)/(T+B)) / ((r+1)/(R+B)) — three IEEE divisions in a fixed
    * order (correctly rounded, identical in DuckDB) — quantized to the
    * 2^20 integer grid with HALF_UP round; per-document totals are
    * BIGINT sums of those integers, order-independent under
    * distributed partial aggregation, and only the final mean divides
    * once at render.
    *
    * Scale shape: the gram frame is a slim (doc_id, is_eval, bucket)
    * triple — cached, since the counting pass and the scoring pass
    * both read it; bucket counts collapse map-side into ≤[[DsirBuckets]]
    * rows; the totals ride ONE single-partition window over that tiny
    * frame (never the corpus); the weight table re-joins as a
    * broadcast; scoring is one groupBy(doc_id). At 100 TB nothing but
    * the gram triples and the doc-id aggregate ever shuffles — the
    * estimator state is 4096 rows no matter the corpus size. */
  def importanceDsir(spark: SparkSession, dir: String): DataFrame = {
    def h28(c: Column): Column =
      conv(substring(md5(c.cast("binary")), 1, 7), 16, 10).cast("long")
    val bis = when(size(col("tk")) < 2, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), size(col("tk")) - 1), i =>
        concat_ws(" ", element_at(col("tk"), i), element_at(col("tk"), i + 1))))
    val gr = graft.Artifacts.shared(Tables.documentsPar(spark, dir)
      .withColumn("tk", transform(tokens, t => lower(t)))
      .withColumn("is_eval", sampleBucket === 0)
      .select(col("doc_id"), col("is_eval"), explode(bis).as("g"))
      .withColumn("b", h28(col("g")) % lit(DsirBuckets))
      .select("doc_id", "is_eval", "b"))
    val cnt = gr.groupBy("b").agg(
      sum(when(col("is_eval"), 1L).otherwise(0L)).as("t"),
      sum(when(col("is_eval"), 0L).otherwise(1L)).as("r"))
    // totals over the ≤4096-row count frame — a deliberate single-
    // partition window on bounded state, the semdedup-note class
    val wAll = Window.partitionBy()
    val wts = cnt
      .withColumn("tt", sum("t").over(wAll))
      .withColumn("rr", sum("r").over(wAll))
      .select(col("b"), round(
        ((col("t") + 1L).cast("double") / (col("tt") + lit(DsirBuckets)).cast("double"))
          / ((col("r") + 1L).cast("double") / (col("rr") + lit(DsirBuckets)).cast("double"))
          * lit(1048576.0)).cast("long").as("qlr"))
    gr.filter(!col("is_eval"))
      .join(broadcast(wts), "b")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"), sum("qlr").as("units"))
      .select(col("doc_id"), col("n_bigrams"), col("units"),
        (col("units").cast("double") / (col("n_bigrams") * lit(1048576.0)))
          .as("score"),
        (col("units") > col("n_bigrams") * lit(1048576L)).as("keep"))
      .orderBy("doc_id")
  }
}
