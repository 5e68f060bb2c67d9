package graft

import graft.operators.SignalOps

/** DuckDB oracle SQL — the semantic twin of every entry in
  * `SparkEntry.queries`, run by the driver on the same parquet tables.
  *
  * Conventions that make hash-compare bit-stable cross-engine:
  *  - integer/cents accumulation everywhere a SUM feeds a float result;
  *  - DOUBLE literals written in e-notation (4e-1 …) because bare
  *    fractional literals are DECIMAL in DuckDB;
  *  - every float formula repeats the Spark plan token-for-token, so
  *    both engines execute the identical IEEE operation sequence;
  *  - every integer output column is CAST to BIGINT (DuckDB count/sum
  *    would otherwise surface INT32/INT128);
  *  - array folds use list_reduce (left fold), matching Spark's
  *    `aggregate(.., 0.0, (a,x) -> a+x)` since 0.0+x0 == x0.
  */
object Oracle {

  private val W = SignalOps.WindowMs

  /** Shared CTE: the deterministic signal stream derived from `events`
    * (twin of SignalOps.signals). */
  val signalsCte: String =
    s"""signals AS (
  SELECT event_id,
    'U' || CAST(user_id AS VARCHAR) AS symbol,
    CASE WHEN event_type IN ('click','view','signup') THEN 'BUY' ELSE 'SELL' END AS side,
    CASE WHEN event_id % 3 = 0 THEN '1m' WHEN event_id % 3 = 1 THEN '5m' ELSE '15m' END AS timeframe,
    value AS price,
    CAST(event_id % 100 + 1 AS DOUBLE) / 1e2 AS qty,
    CAST(round(value * 100) AS BIGINT) AS price_c,
    CAST(event_id % 100 + 1 AS BIGINT) AS qty_c,
    epoch_ms(CAST(ts AS TIMESTAMP)) AS ts_ms,
    (epoch_ms(CAST(ts AS TIMESTAMP)) // $W) * $W AS w_start,
    props
  FROM events)"""

  /** Shared CTEs: ranked signals -> per-timeframe exact sums -> final
    * per-(window,symbol) aggregate (twin of WindowAgg). */
  val windowAggCtes: String =
    s"""$signalsCte,
ranked AS (
  SELECT *,
    row_number() OVER (PARTITION BY w_start, symbol, timeframe ORDER BY ts_ms DESC, event_id DESC) AS rn_tf,
    row_number() OVER (PARTITION BY w_start, symbol ORDER BY ts_ms DESC, event_id DESC) AS rn_all
  FROM signals),
tf AS (
  SELECT w_start, symbol, timeframe,
    CAST(count(*) AS BIGINT) AS cnt_all,
    CAST(SUM(CASE WHEN side = 'BUY' THEN 1 ELSE -1 END) AS BIGINT) AS balance_tf,
    CAST(SUM(CASE WHEN rn_tf <= 10 THEN 1 ELSE 0 END) AS BIGINT) AS n_cap,
    CAST(SUM(CASE WHEN rn_tf <= 10 THEN price_c END) AS BIGINT) AS sum_pc,
    CAST(SUM(CASE WHEN rn_tf <= 10 THEN price_c * price_c END) AS BIGINT) AS sumsq_pc,
    CAST(SUM(CASE WHEN rn_tf <= 10 AND side = 'BUY' THEN 1 ELSE 0 END) AS BIGINT) AS buy_cap,
    CAST(SUM(CASE WHEN rn_all <= 5 THEN qty_c END) AS BIGINT) AS sum_q5c,
    CAST(SUM(CASE WHEN rn_all <= 5 THEN 1 ELSE 0 END) AS BIGINT) AS n_q5
  FROM ranked GROUP BY 1, 2, 3),
tf2 AS (
  SELECT *,
    (sum_pc / 1e2) / n_cap AS avg_price_tf,
    CASE WHEN n_cap < 2 THEN 0e0 ELSE
      sqrt(greatest(0e0, (sumsq_pc / 1e4 - (sum_pc / 1e2) * (sum_pc / 1e2) / n_cap) / n_cap))
    END AS vol_tf,
    CASE WHEN buy_cap * 2 >= n_cap THEN 'BUY' ELSE 'SELL' END AS mode_tf
  FROM tf),
agg AS (
  SELECT w_start, symbol,
    CAST(count(*) AS BIGINT) AS n_tf,
    CAST(SUM(n_cap) AS BIGINT) AS signal_count,
    CAST(SUM(balance_tf) AS BIGINT) AS balance,
    CASE WHEN count(DISTINCT mode_tf) = 1 THEN 1e0 ELSE 5e-1 END AS alignment,
    (coalesce(MAX(CASE WHEN timeframe = '1m' THEN avg_price_tf END), 0e0)
     + coalesce(MAX(CASE WHEN timeframe = '5m' THEN avg_price_tf END), 0e0)
     + coalesce(MAX(CASE WHEN timeframe = '15m' THEN avg_price_tf END), 0e0))
      / CAST(count(*) AS BIGINT) AS avg_price,
    (coalesce(MAX(CASE WHEN timeframe = '1m' THEN vol_tf END), 0e0)
     + coalesce(MAX(CASE WHEN timeframe = '5m' THEN vol_tf END), 0e0)
     + coalesce(MAX(CASE WHEN timeframe = '15m' THEN vol_tf END), 0e0))
      / CAST(count(*) AS BIGINT) AS avg_vol,
    (CAST(SUM(sum_q5c) AS BIGINT) / 1e2) / CAST(SUM(n_q5) AS BIGINT) AS qty_basis
  FROM tf2 GROUP BY 1, 2 HAVING count(*) >= 2)"""

  /** Shared CTEs: decisions on top of the window aggregate (twin of
    * Decide.decisions). */
  val decisionsCtes: String =
    s"""$windowAggCtes,
dec AS (
  SELECT *,
    CASE WHEN balance > 5 THEN 'STRONG_BUY' WHEN balance > 2 THEN 'BUY'
         WHEN balance < -5 THEN 'STRONG_SELL' WHEN balance < -2 THEN 'SELL'
         ELSE 'HOLD' END AS action,
    CASE WHEN balance > 5 THEN 998e-3 WHEN balance > 2 THEN 999e-3
         WHEN balance < -5 THEN 1002e-3 WHEN balance < -2 THEN 1001e-3
         ELSE 1e0 END AS price_adj
  FROM agg),
dec2 AS (
  SELECT *,
    CASE WHEN action = 'HOLD' THEN 5e-1 ELSE
      least(1e0, alignment * 4e-1
        + least(1e0, CAST(abs(balance) AS DOUBLE) / 1e1) * 4e-1
        + greatest(3e-1, 1e0 - avg_vol / 1e2) * 2e-1)
    END AS confidence,
    avg_price * (CASE WHEN balance > 5 THEN 998e-3 WHEN balance > 2 THEN 999e-3
         WHEN balance < -5 THEN 1002e-3 WHEN balance < -2 THEN 1001e-3
         ELSE 1e0 END) AS suggested_price,
    CASE WHEN action = 'HOLD' THEN 0e0 ELSE floor(qty_basis * 1e4) / 1e4 END AS suggested_qty,
    CASE WHEN action IN ('STRONG_BUY','STRONG_SELL') THEN
           CASE WHEN alignment > 8e-1 THEN 'ALIGNED_SIGNALS' ELSE 'MOMENTUM_SHIFT' END
         WHEN action IN ('BUY','SELL') THEN 'ALIGNED_SIGNALS'
         ELSE CASE WHEN alignment < 6e-1 THEN 'DIVERGENT_SIGNALS' ELSE 'INSUFFICIENT_DATA' END
    END AS reason
  FROM dec)"""

  /** Shared CTEs: sized orders on top of decisions (twin of
    * OrderOps.orders). */
  val ordersCtes: String =
    s"""$decisionsCtes,
of1 AS (
  SELECT *,
    CASE WHEN starts_with(action, 'STRONG') THEN confidence * 12e-1 ELSE confidence END AS adj_conf,
    CASE WHEN action IN ('BUY','STRONG_BUY') THEN 'BUY' ELSE 'SELL' END AS order_side
  FROM dec2 WHERE action IN ('BUY','SELL','STRONG_BUY','STRONG_SELL')),
of2 AS (SELECT * FROM of1 WHERE adj_conf >= 65e-2),
lookup(symbol, base_price) AS (VALUES
  ('U0', 5e1), ('U1', 6e1), ('U2', 7e1), ('U3', 8e1), ('U4', 9e1),
  ('U5', 1e2), ('U6', 11e1), ('U7', 12e1), ('U8', 13e1), ('U9', 14e1)),
sized AS (
  SELECT of2.*, coalesce(lookup.base_price, 1e2) AS market_price,
    round(1e0 + 9e0 * least(1e0, greatest(0e0, (adj_conf - 65e-2) / 35e-2)), 2) AS order_qty,
    'ORD-' || CAST(w_start AS VARCHAR) || '-' || symbol AS client_order_id
  FROM of2 LEFT JOIN lookup USING (symbol)),
orders_out AS (
  SELECT w_start, symbol, md5(client_order_id) AS order_id, client_order_id,
    order_side, action, adj_conf, order_qty, market_price,
    '{"orderId":"' || md5(client_order_id) || '","clientOrderId":"' || client_order_id
      || '","symbol":"' || symbol || '","side":"' || order_side
      || '","qty":' || CAST(CAST(order_qty AS DECIMAL(12,2)) AS VARCHAR)
      || ',"price":' || CAST(CAST(market_price AS DECIMAL(12,2)) AS VARCHAR)
      || ',"status":"PENDING","confidence":' || CAST(CAST(confidence AS DECIMAL(18,6)) AS VARCHAR)
      || ',"signals":' || CAST(signal_count AS VARCHAR) || '}' AS payload,
    signal_count
  FROM sized)"""

  // ---- documents helpers ----

  private val tokensExpr = "string_split(text, ' ')"
  private val gramsExpr =
    s"""list_distinct(CASE WHEN len($tokensExpr) < 3 THEN [] ELSE
      list_transform(range(1, len($tokensExpr) - 1),
        i -> $tokensExpr[i] || ' ' || $tokensExpr[i+1] || ' ' || $tokensExpr[i+2]) END)"""

  /** 16-bit simhash expression — twin of MinHashOps.simhashCol, shared
    * by doc_simhash and dedup_simhash_pairs (declared before sqlBase:
    * object vals initialize in declaration order) */
  private val simhashBitsSql: String = {
    val thash = "(CAST('0x' || substr(md5(t), 1, 7) AS BIGINT))"
    (0 until 16).map { b =>
      val pow = 1L << b
      s"(CASE WHEN CAST(list_sum(list_transform($tokensExpr, " +
        s"t -> (($thash // $pow) % 2) * 2 - 1)) AS BIGINT) > 0 THEN ${1L << b} ELSE 0 END)"
    }.mkString(" + ")
  }

  /** twin of TextOps.contamination AND contaminationBloom (bit-identical
    * results by construction — the bloom is only a pre-shuffle cut) */
  private val contaminationSql: String =
    s"""WITH docs AS (
  SELECT doc_id, $gramsExpr AS grams,
    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '#g1'), 1, 7)) AS BIGINT) % 10 = 0 AS is_eval
  FROM documents),
d2 AS (SELECT doc_id, grams, CAST(len(grams) AS BIGINT) AS n_grams, is_eval FROM docs),
ev AS (SELECT DISTINCT gram FROM (SELECT unnest(grams) AS gram FROM d2 WHERE is_eval)),
tr AS (SELECT doc_id, n_grams, unnest(grams) AS gram FROM d2 WHERE NOT is_eval),
hits AS (
  SELECT doc_id, n_grams, CAST(count(*) AS BIGINT) AS n_hits
  FROM tr JOIN ev USING (gram) GROUP BY 1, 2)
SELECT doc_id, n_grams, n_hits,
  CAST(n_hits AS DOUBLE) / n_grams AS contamination
FROM hits WHERE CAST(n_hits AS DOUBLE) / n_grams >= 25e-2
ORDER BY contamination DESC, doc_id"""

  /** twin of TextOps.ngramJaccardPairsAll (no presentation cut) — shared
    * by dedup_ngram_jaccard and the dedup_clusters edge derivation */
  private val jaccardPairsSql: String =
    s"""WITH docs AS (
  SELECT doc_id, lang, $gramsExpr AS grams FROM documents),
d2 AS (
  SELECT doc_id, lang, CAST(len(grams) AS BIGINT) AS n_grams, grams
  FROM docs WHERE len(grams) > 0),
e0 AS (SELECT doc_id, lang, n_grams, unnest(grams) AS gram FROM d2),
e AS (
  -- df-cut twin: (lang, gram) groups with more than 1000 postings are
  -- stopword-grams — Spark DROPS them entirely (two-pass df-cut,
  -- TextOps.dfCut) before pairing; a no-op below the cap at test SFs,
  -- load-bearing at 100 TB. The two caps MUST move together.
  SELECT doc_id, lang, n_grams, gram FROM e0
  QUALIFY count(*) OVER (PARTITION BY lang, gram) <= 1000),
p AS (
  SELECT a.doc_id AS d1, b.doc_id AS d2, a.n_grams AS n1, b.n_grams AS n2,
    CAST(count(*) AS BIGINT) AS common
  FROM e a JOIN e b ON a.gram = b.gram AND a.lang = b.lang AND a.doc_id < b.doc_id
  GROUP BY 1, 2, 3, 4)
SELECT d1, d2, n1, n2, common,
  CAST(common AS DOUBLE) / (n1 + n2 - common) AS jaccard
FROM p"""

  /** twin of TextOps.quality — shared by doc_quality and doc_unpivot */
  private val qualitySql: String =
    s"""WITH q AS (
  SELECT doc_id,
    CAST(len($tokensExpr) AS BIGINT) AS n_tokens,
    CAST(len(list_filter($tokensExpr, t -> t IN ('the','a'))) AS BIGINT) AS n_stop,
    CAST(len(list_distinct($tokensExpr)) AS BIGINT) AS n_distinct
  FROM documents),
q2 AS (
  SELECT *, CAST(n_stop AS DOUBLE) / n_tokens AS stop_ratio,
    CAST(n_distinct AS DOUBLE) / n_tokens AS ttr
  FROM q)
SELECT doc_id, n_tokens, n_stop, n_distinct, stop_ratio, ttr,
  least(1e0, n_tokens / 1e2) * 5e-1 + (1e0 - stop_ratio) * 3e-1 + ttr * 2e-1 AS quality
FROM q2 ORDER BY doc_id"""

  // ---- embeddings helpers ----

  /** left-fold dot product of two double lists, twin of EmbeddingOps.dot */
  private def dotSql(a: String, b: String): String =
    s"list_reduce(list_transform(range(1, 65), i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)), (x, y) -> x + y)"

  /** Twin of TextOps.winnowSel: the shared winnow selection —
    * positional 3-gram 28-bit hashes, min per sliding window of 4,
    * distinct. range(1, n) is exclusive, matching Spark's inclusive
    * sequence(1, n-1); list_slice's inclusive (j, j+3) matches
    * slice(hs, j, 4). Shared by doc_winnow and dedup_winnow_pairs. */
  private lazy val winnowSelSql: String =
    s"""SELECT doc_id, n_grams,
  CASE WHEN n_grams = 0 THEN []
    ELSE list_distinct(list_transform(
      range(1, greatest(n_grams - 3, 1) + 1),
      j -> list_min(list_slice(hs, j, j + 3)))) END AS sel
FROM (
  -- hashes hoisted to a per-document column (the Spark side's `hs`):
  -- inside the per-window lambda they would recompute ALL G md5s per
  -- window — O(G²) md5 calls per document
  SELECT doc_id, len(grams) AS n_grams,
    list_transform(grams, g2 -> CAST(('0x' || substr(md5(g2), 1, 7)) AS BIGINT)) AS hs
  FROM (
    SELECT doc_id,
      CASE WHEN len($tokensExpr) < 3 THEN []
        ELSE list_transform(range(1, len($tokensExpr) - 1),
          i -> $tokensExpr[i] || ' ' || $tokensExpr[i+1] || ' ' || $tokensExpr[i+2]) END AS grams
    FROM documents))"""

  /** 8-dim variants over PQ subvector slices — same left fold
    * (list_reduce from the first element; 0.0 + t1 == t1 on the Spark
    * side), twins of the slice folds in EmbeddingOps.annPq */
  private def dot8Sql(a: String, b: String): String =
    s"list_reduce(list_transform(range(1, 9), i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)), (x, y) -> x + y)"
  private def l28Sql(a: String, b: String): String =
    s"list_reduce(list_transform(range(1, 9), i -> (CAST($a[i] AS DOUBLE) - CAST($b[i] AS DOUBLE)) * (CAST($a[i] AS DOUBLE) - CAST($b[i] AS DOUBLE))), (x, y) -> x + y)"

  private val dotSelfSql = dotSql("embedding", "embedding")

  /** Twin of annBinary's sign signature: ascending-bit CASE sum. Bits
    * 0..62 are positive BIGINT constants (partial sums peak at 2^63−1,
    * in range for DuckDB's checked +); bit 63 is Long.MinValue, which
    * DuckDB can neither shift into nor parse as a literal — spelled
    * (-9223372036854775807 - 1) like the Java idiom. */
  private def signSigSql(emb: String): String =
    (0 until 64).map { i =>
      val pow = if (i == 63) "(-9223372036854775807 - 1)" else (1L << i).toString
      s"(CASE WHEN CAST($emb[${i + 1}] AS DOUBLE) >= 0e0 THEN $pow ELSE 0 END)"
    }.mkString("CAST(", " + ", " AS BIGINT)")

  /** twin of EmbeddingOps.lshBucket with the N-DERIVED bit width
    * (EmbeddingOps.defaultBits): 16 unrolled plane terms, each gated by
    * `j < bits`, where `bits` comes from the nb CTE below — the same
    * ⌈log2(N/8)⌉ the Spark side computes, so the two stay in lockstep
    * at every SF. The plane weights are the Spark side's OWN
    * splitmix64-grid integers (EmbeddingOps.planeWeightInt) embedded as
    * literals: k/65536 - 0.5 is exactly representable, so both engines
    * land on the identical double. */
  private def planeWeightsSql(j: Int): String =
    (0 until 64).map(i =>
      s"${graft.operators.EmbeddingOps.planeWeightInt(j, i)} / 65536e0 - 5e-1")
      .mkString("[", ", ", "]")

  private def bucketSql(emb: String): String = (0 until 16).map { j =>
    val dotJ = s"list_reduce(list_transform(range(1, 65), " +
      s"i -> list_extract(${planeWeightsSql(j)}, i)" +
      s" * CAST($emb[i] AS DOUBLE)), (x, y) -> x + y)"
    s"(CASE WHEN $j < bits AND $dotJ >= 0e0 THEN ${1L << j} ELSE 0 END)"
  }.mkString("CAST(", " + ", " AS BIGINT)")

  /** shared CTE prologue of the two LSH queries: normalized set →
    * N-derived bit width → bucketed set */
  private val lshCtes: String =
    s"""e0 AS (
  SELECT vec_id, embedding, $dotSelfSql AS dot_self
  FROM embeddings WHERE $dotSelfSql > 0e0),
nb AS (SELECT GREATEST(1, LEAST(16,
    CAST(ceil(log2(CAST(count(*) AS DOUBLE) / 8)) AS INT))) AS bits FROM e0),
e AS (SELECT vec_id, embedding, dot_self, ${bucketSql("embedding")} AS bucket
  FROM e0, nb)"""

  private val sqlBase: Map[String, String] = Map(

    "sig_parse_enrich" ->
      s"""WITH $signalsCte
SELECT event_id, symbol, side, timeframe, price, qty, ts_ms, w_start,
  CAST(json_extract_string(props, '$$.k') AS INT) AS k,
  CASE WHEN timeframe = '1m' THEN 1 WHEN timeframe = '5m' THEN 2
       WHEN timeframe = '15m' THEN 3 ELSE 0 END AS strength
FROM signals WHERE json_extract_string(props, '$$.k') IS NOT NULL
ORDER BY event_id""",

    "sig_union_merge" ->
      s"""WITH $signalsCte,
merged AS (
  SELECT * FROM signals WHERE timeframe = '1m'
  UNION ALL SELECT * FROM signals WHERE timeframe = '5m'
  UNION ALL SELECT * FROM signals WHERE timeframe = '15m')
SELECT timeframe, CAST(count(*) AS BIGINT) AS n,
  CAST(SUM(price_c) AS BIGINT) / 1e2 AS sum_price
FROM merged GROUP BY 1 ORDER BY 1""",

    "sig_window_agg" ->
      s"""WITH $windowAggCtes
SELECT w_start, symbol, n_tf, signal_count, balance, alignment, avg_price,
  avg_vol, qty_basis
FROM agg ORDER BY w_start, symbol""",

    "sig_decisions" ->
      s"""WITH $decisionsCtes,
sigj AS (
  SELECT w_start, symbol,
    '[' || string_agg('{"ts":' || ts_ms || ',"event_id":' || event_id
      || ',"timeframe":"' || timeframe || '","side":"' || side
      || '","price":' || (price_c // 100) || '.' || lpad(CAST(price_c % 100 AS VARCHAR), 2, '0')
      || ',"qty":' || (qty_c // 100) || '.' || lpad(CAST(qty_c % 100 AS VARCHAR), 2, '0') || '}',
      ',' ORDER BY ts_ms DESC, event_id DESC) || ']' AS signals_json
  FROM ranked WHERE rn_tf <= 10 GROUP BY 1, 2)
SELECT d.w_start, d.symbol,
  md5('DEC-' || CAST(d.w_start AS VARCHAR) || '-' || d.symbol) AS decision_id,
  d.action, d.confidence, d.suggested_price, d.suggested_qty, d.reason,
  d.signal_count, d.balance, d.w_start + $W AS decided_at_ms, s.signals_json
FROM dec2 d JOIN sigj s ON d.w_start = s.w_start AND d.symbol = s.symbol
ORDER BY d.w_start, d.symbol""",

    "sig_decision_signals" ->
      s"""WITH $windowAggCtes
SELECT r.w_start, r.symbol,
  CAST(row_number() OVER (PARTITION BY r.w_start, r.symbol
    ORDER BY r.ts_ms DESC, r.event_id DESC) AS BIGINT) AS sig_rank,
  r.ts_ms AS sig_ts_ms, r.event_id AS sig_event_id,
  r.timeframe AS sig_timeframe, r.side AS sig_side,
  r.price AS sig_price, r.qty AS sig_qty
FROM ranked r JOIN agg a ON r.w_start = a.w_start AND r.symbol = a.symbol
WHERE r.rn_tf <= 10
ORDER BY r.w_start, r.symbol, sig_rank""",

    "ord_orders" ->
      s"""WITH $ordersCtes
SELECT w_start, symbol, order_id, client_order_id, order_side, action,
  adj_conf, order_qty, market_price, payload
FROM orders_out ORDER BY w_start, symbol""",

    "cdc_outbox_route" ->
      s"""WITH $ordersCtes
SELECT order_id AS aggregate_id,
  'trading.' || lower('ORDER') || 's' AS topic,
  'ORDER_CREATED' AS event_type,
  payload AS value,
  w_start AS occurred_at_ms
FROM orders_out WHERE payload IS NOT NULL ORDER BY aggregate_id""",

    // Latest-wins upsert merge of the events change batch into the
    // (even-keyed) customer snapshot — twin of CdcRoute.snapshotMerge.
    // epoch_ms(CAST .. AS TIMESTAMP) = Spark's unix_millis after the
    // shared ns→µs truncation (see signalsCte).
    "cdc_snapshot_merge" ->
      """WITH base AS (
  SELECT c_custkey, c_name, c_acctbal FROM customer WHERE c_custkey % 2 = 0),
ev AS (
  SELECT user_id, event_type, value,
    epoch_ms(CAST(ts AS TIMESTAMP)) AS ts_ms, event_id
  FROM events),
ranked AS (
  SELECT *,
    row_number() OVER (PARTITION BY user_id ORDER BY ts_ms DESC, event_id DESC) AS rn,
    CAST(count(*) OVER (PARTITION BY user_id) AS BIGINT) AS n_events
  FROM ev),
latest AS (
  SELECT user_id, event_type AS last_event_type, value AS last_value,
    ts_ms AS last_ts_ms, n_events
  FROM ranked WHERE rn = 1)
SELECT coalesce(c_custkey, user_id) AS merge_key, c_name, c_acctbal,
  last_event_type, last_value, last_ts_ms,
  CAST(coalesce(n_events, 0) AS BIGINT) AS n_events,
  CASE WHEN c_custkey IS NULL THEN 'inserted'
       WHEN user_id IS NULL THEN 'unchanged'
       ELSE 'updated' END AS row_status
FROM base FULL OUTER JOIN latest ON c_custkey = user_id
ORDER BY merge_key""",

    // SCD type-2 history — twin of CdcRoute.scd2History. Gaps-and-
    // islands: lag change mark (IS DISTINCT FROM ≡ Spark's !(a <=> b)),
    // running-sum version, per-run aggregate (last_value via rn=1, the
    // SQL face of Spark's max(struct(ts,eid,value)) argmax — value is a
    // pass-through double, no arithmetic), lead() closes each version.
    "cdc_scd2" ->
      """WITH ev AS (
  SELECT user_id, event_type, value,
    epoch_ms(CAST(ts AS TIMESTAMP)) AS ts_ms, event_id
  FROM events),
marked AS (
  SELECT *, CASE WHEN lag(event_type) OVER
      (PARTITION BY user_id ORDER BY ts_ms, event_id)
    IS DISTINCT FROM event_type THEN 1 ELSE 0 END AS is_change
  FROM ev),
versioned AS (
  SELECT *, CAST(SUM(is_change) OVER (PARTITION BY user_id
    ORDER BY ts_ms, event_id
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS version
  FROM marked),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY user_id, version
    ORDER BY ts_ms DESC, event_id DESC) AS rn
  FROM versioned),
runs AS (
  SELECT user_id, version, max(event_type) AS state,
    CAST(min(ts_ms) AS BIGINT) AS valid_from_ms,
    CAST(count(*) AS BIGINT) AS n_events,
    max(CASE WHEN rn = 1 THEN value END) AS last_value
  FROM ranked GROUP BY 1, 2)
SELECT user_id, version, state, valid_from_ms,
  lead(valid_from_ms) OVER (PARTITION BY user_id ORDER BY version) AS valid_to_ms,
  n_events, last_value,
  (lead(valid_from_ms) OVER (PARTITION BY user_id ORDER BY version) IS NULL) AS is_current
FROM runs ORDER BY user_id, version""",


    // Twin of SignalOps.outliers: the same two windowed robust
    // statistics over the shared signals CTE (median and MAD both
    // interpolate over the integer cents grid), the same fixed
    // division order for the modified z, the same 3.5 gate; MAD=0 →
    // NULL z → never flagged, in both engines.
    "sig_outliers" ->
      s"""WITH $signalsCte,
st AS (
  SELECT symbol, event_id, ts_ms, price, price_c,
    quantile_cont(price_c, 5e-1) OVER (PARTITION BY symbol) AS med_c
  FROM signals),
dv AS (
  SELECT *, abs(price_c - med_c) AS dev FROM st),
md AS (
  SELECT *, quantile_cont(dev, 5e-1) OVER (PARTITION BY symbol) AS mad_c
  FROM dv),
z AS (
  SELECT *, CASE WHEN mad_c > 0e0
    THEN 6.745e-1 * (price_c - med_c) / mad_c END AS z_mod
  FROM md)
SELECT symbol, event_id, ts_ms, price,
  med_c / 1e2 AS med_price, mad_c / 1e2 AS mad_price, z_mod
FROM z WHERE z_mod IS NOT NULL AND abs(z_mod) > 3.5e0
ORDER BY symbol, event_id""",


    // Twin of CdcRoute.scd2AsOf: the cdc_scd2 islands CTEs verbatim,
    // as-of instant = integer midpoint of the event-time range, the
    // half-open [valid_from, valid_to) probe.
    "cdc_scd2_asof" ->
      """WITH ev AS (
  SELECT user_id, event_type, value,
    epoch_ms(CAST(ts AS TIMESTAMP)) AS ts_ms, event_id
  FROM events),
marked AS (
  SELECT *, CASE WHEN lag(event_type) OVER
      (PARTITION BY user_id ORDER BY ts_ms, event_id)
    IS DISTINCT FROM event_type THEN 1 ELSE 0 END AS is_change
  FROM ev),
versioned AS (
  SELECT *, CAST(SUM(is_change) OVER (PARTITION BY user_id
    ORDER BY ts_ms, event_id
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS version
  FROM marked),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY user_id, version
    ORDER BY ts_ms DESC, event_id DESC) AS rn
  FROM versioned),
runs AS (
  SELECT user_id, version, max(event_type) AS state,
    CAST(min(ts_ms) AS BIGINT) AS valid_from_ms,
    CAST(count(*) AS BIGINT) AS n_events,
    max(CASE WHEN rn = 1 THEN value END) AS last_value
  FROM ranked GROUP BY 1, 2),
hist AS (
  SELECT *, lead(valid_from_ms) OVER (PARTITION BY user_id ORDER BY version)
    AS valid_to_ms
  FROM runs),
bounds AS (
  SELECT CAST(min(ts_ms) + (max(ts_ms) - min(ts_ms)) // 2 AS BIGINT)
    AS as_of_ms FROM ev)
SELECT user_id, as_of_ms, version, state, valid_from_ms, valid_to_ms,
  n_events, last_value
FROM hist CROSS JOIN bounds
WHERE valid_from_ms <= as_of_ms
  AND (valid_to_ms IS NULL OR as_of_ms < valid_to_ms)
ORDER BY user_id""",

    "q1_pricing" ->
      """SELECT l_returnflag, l_linestatus,
  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2))) AS DOUBLE) AS sum_base_price,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2)) * (1 - CAST(l_discount AS DECIMAL(4,2))) * (1 + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE) AS sum_charge,
  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / count(*) AS avg_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2))) AS DOUBLE) / count(*) AS avg_price,
  CAST(SUM(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) / count(*) AS avg_disc,
  CAST(count(*) AS BIGINT) AS count_order
FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY 1, 2 ORDER BY 1, 2""",

    "q3_topk" ->
      """SELECT l_orderkey, o_orderdate, o_orderpriority,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
  AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
GROUP BY 1, 2, 3
ORDER BY SUM(CAST(l_extendedprice AS DECIMAL(14,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) DESC, l_orderkey
LIMIT 10""",

    "q5_join" ->
      """SELECT n_name,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
JOIN orders ON o_custkey = c_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
GROUP BY 1
ORDER BY SUM(CAST(l_extendedprice AS DECIMAL(14,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) DESC, n_name""",

    "join_semi" ->
      """SELECT c_custkey, c_name FROM customer
WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
ORDER BY c_custkey""",

    "join_anti" ->
      """SELECT c_custkey, c_name FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
ORDER BY c_custkey""",

    "wf_rank_topk" ->
      """SELECT o_custkey, o_orderkey, o_totalprice,
  CAST(row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rn
FROM orders
QUALIFY rn <= 3
ORDER BY o_custkey, rn""",

    "wf_lag_delta" ->
      """WITH e AS (SELECT event_id, user_id, epoch_ms(CAST(ts AS TIMESTAMP)) AS ts_ms, value FROM events)
SELECT event_id, user_id, ts_ms, value,
  lag(value, 1) OVER (PARTITION BY user_id ORDER BY ts_ms, event_id) AS prev_value,
  value - lag(value, 1) OVER (PARTITION BY user_id ORDER BY ts_ms, event_id) AS delta
FROM e ORDER BY event_id""",

    "rollup_acctbal" ->
      """SELECT r_name, n_name,
  CAST(SUM(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT) / 1e2 AS sum_acctbal,
  CAST(count(*) AS BIGINT) AS n_customers
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP(r_name, n_name)
ORDER BY r_name NULLS FIRST, n_name NULLS FIRST""",

    "distinct_agg" ->
      """SELECT l_returnflag,
  CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_parts,
  CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_supps,
  CAST(count(*) AS BIGINT) AS n_rows
FROM lineitem GROUP BY 1 ORDER BY 1""",

    "events_tumbling" ->
      """SELECT (epoch_ms(CAST(ts AS TIMESTAMP)) // 86400000) * 86400000 AS w_start,
  event_type, CAST(count(*) AS BIGINT) AS n,
  CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) / 1e2 AS sum_value
FROM events GROUP BY 1, 2 ORDER BY 1, 2""",

    "events_hopping" ->
      """WITH e AS (
  SELECT epoch_ms(CAST(ts AS TIMESTAMP)) AS ts_ms, event_type,
    CAST(round(value * 100) AS BIGINT) AS value_c
  FROM events),
expanded AS (
  SELECT (ts_ms // 86400000) * 86400000 - i * 86400000 AS w_start,
    event_type, value_c
  FROM e CROSS JOIN (VALUES (0), (1)) AS offs(i))
SELECT w_start, event_type, CAST(count(*) AS BIGINT) AS n,
  CAST(SUM(value_c) AS BIGINT) / 1e2 AS sum_value
FROM expanded GROUP BY 1, 2 ORDER BY 1, 2""",

    // Twin of Relational.eventsKeySkew: per-key counts, global key
    // stats, deterministic top-10; skew_factor multiplies in DOUBLE
    // (BIGINT would overflow at scale) in the Spark token order.
    "events_key_skew" ->
      """WITH c AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS cnt FROM events GROUP BY 1),
t AS (
  SELECT CAST(count(*) AS BIGINT) AS n_keys, CAST(SUM(cnt) AS BIGINT) AS n_rows,
    CAST(MAX(cnt) AS BIGINT) AS max_cnt
  FROM c),
top AS (SELECT user_id, cnt FROM c ORDER BY cnt DESC, user_id LIMIT 10)
SELECT CAST(row_number() OVER (ORDER BY cnt DESC, user_id) AS BIGINT) AS rank,
  user_id, cnt, CAST(cnt AS DOUBLE) / t.n_rows AS share,
  t.n_keys, t.n_rows, t.max_cnt,
  CAST(t.max_cnt AS DOUBLE) * t.n_keys / t.n_rows AS skew_factor
FROM top, t ORDER BY rank""",

    "dq_report" ->
      """WITH wide AS (
  SELECT CAST(count(*) AS BIGINT) AS n_rows,
    CAST(SUM(CASE WHEN l_quantity < 1 OR l_quantity > 50 THEN 1 ELSE 0 END) AS BIGINT) AS quantity_in_1_50,
    CAST(SUM(CASE WHEN l_extendedprice <= 0 THEN 1 ELSE 0 END) AS BIGINT) AS price_positive,
    CAST(SUM(CASE WHEN l_discount < 0 OR l_discount > 1e-1 THEN 1 ELSE 0 END) AS BIGINT) AS discount_in_0_0p1,
    CAST(SUM(CASE WHEN l_returnflag NOT IN ('A', 'N', 'R') THEN 1 ELSE 0 END) AS BIGINT) AS returnflag_domain,
    CAST(SUM(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS orderkey_not_null
  FROM lineitem)
SELECT rule, n_rows, violations, violations = 0 AS pass FROM (
  SELECT 'discount_in_0_0p1' AS rule, n_rows, discount_in_0_0p1 AS violations FROM wide
  UNION ALL SELECT 'orderkey_not_null', n_rows, orderkey_not_null FROM wide
  UNION ALL SELECT 'price_positive', n_rows, price_positive FROM wide
  UNION ALL SELECT 'quantity_in_1_50', n_rows, quantity_in_1_50 FROM wide
  UNION ALL SELECT 'returnflag_domain', n_rows, returnflag_domain FROM wide)
ORDER BY rule""",

    "grouping_sets" ->
      """SELECT o_orderstatus, o_orderpriority,
  CAST(count(*) AS BIGINT) AS n,
  CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) / 1e2 AS sum_price
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""",

    "wf_range_frame" ->
      """WITH e AS (
  SELECT event_id, user_id, epoch_ms(CAST(ts AS TIMESTAMP)) AS ts_ms,
    CAST(round(value * 100) AS BIGINT) AS value_c
  FROM events)
SELECT event_id, user_id, ts_ms,
  CAST(count(*) OVER w AS BIGINT) AS n_1h,
  CAST(SUM(value_c) OVER w AS BIGINT) / 1e2 AS sum_1h
FROM e
WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms
  RANGE BETWEEN 3600000 PRECEDING AND CURRENT ROW)
ORDER BY event_id""",

    // Funnel twin: identical running-min windows (ROWS frame explicit —
    // Spark's ordered-window default is RANGE, DuckDB's too, but ties
    // on (ts_ms, event_id) are impossible so ROWS is spelled on both).
    "events_funnel" ->
      """WITH e AS (
  SELECT user_id, event_type, epoch_ms(CAST(ts AS TIMESTAMP)) AS ts_ms, event_id
  FROM events),
e2 AS (
  SELECT *, min(CASE WHEN event_type = 'view' THEN ts_ms END) OVER w AS seen_view
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms, event_id
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
e3 AS (
  SELECT *, CASE WHEN event_type = 'click' AND seen_view IS NOT NULL
    THEN ts_ms END AS qclick_ts FROM e2),
e4 AS (
  SELECT *, min(qclick_ts) OVER w AS seen_qclick
  FROM e3 WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms, event_id
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
e5 AS (
  SELECT *, CASE WHEN event_type = 'purchase' AND seen_qclick IS NOT NULL
    THEN ts_ms END AS conv_ts FROM e4)
SELECT user_id,
  CAST(min(CASE WHEN event_type = 'view' THEN ts_ms END) AS BIGINT) AS first_view_ms,
  CAST(min(qclick_ts) AS BIGINT) AS first_click_ms,
  CAST(min(conv_ts) AS BIGINT) AS first_purchase_ms,
  CAST(count(*) AS BIGINT) AS n_events,
  min(conv_ts) IS NOT NULL AS converted
FROM e5 GROUP BY user_id ORDER BY user_id""",

    "events_retention" ->
      """WITH e AS (
  SELECT DISTINCT user_id,
    epoch_ms(CAST(ts AS TIMESTAMP)) // 86400000 AS day
  FROM events),
c AS (SELECT user_id, CAST(min(day) AS BIGINT) AS cohort_day FROM e GROUP BY 1)
SELECT cohort_day, day - cohort_day AS k, CAST(count(*) AS BIGINT) AS n_users
FROM e JOIN c USING (user_id)
GROUP BY 1, 2 ORDER BY 1, 2""",

    // Twin of Relational.hllDailyMerge — valid on the same exact-mode
    // grounds as events_overlap_theta below: at lgConfigK = 14 the
    // DataSketches HLL (and every union of them) stays in its coupon
    // LIST/SET phase through the test SFs' 1,500 distinct users, where
    // the estimate ≡ the exact distinct count (measured exact at all
    // three SFs; lgK=12's coupon phase ended at ~1,024 and read 1488).
    // Past the coupon phase (~4k distinct) the twin stops applying and
    // the accuracy spec is the contract.
    "hll_daily_merge" ->
      """SELECT
  CAST(count(DISTINCT epoch_ms(CAST(ts AS TIMESTAMP)) // 86400000) AS BIGINT) AS n_days,
  CAST(count(DISTINCT user_id) AS BIGINT) AS merged_distinct_users
FROM events""",

    // Twin of TextOps.approxTopTokens — valid because the Misra-Gries
    // ItemsSketch is EXACT whenever the vocabulary fits its map (no
    // eviction ⇒ zero error ⇒ est = lb = ub = true count; the
    // NO_FALSE_NEGATIVES cut keeps every nonzero counter). The
    // synthetic corpus vocabulary (31 tokens) sits far below
    // MaxMapSize = 1024 at every SF, which OperatorInvariantsSpec pins
    // as the exact-mode law. Ties beyond rank k break by token in both
    // engines; past map capacity the twin stops applying and the
    // bound-containment spec is the contract.
    "approx_top_tokens" ->
      s"""WITH t AS (SELECT unnest($tokensExpr) AS token FROM documents),
c AS (SELECT token, CAST(count(*) AS BIGINT) AS est FROM t GROUP BY 1)
SELECT token, est, est AS lb, est AS ub FROM c
ORDER BY est DESC, token LIMIT 50""",

    // Twin of Relational.eventsOverlapTheta — valid because the theta
    // sketch is in EXACT mode at every test SF: below 2^lgK = 4096
    // retained keys it never samples (the testdata tops out at 1500
    // distinct users, so audiences, intersections AND unions are all
    // exact; OperatorInvariantsSpec pins the exact-mode law). In exact
    // mode estimate = retained count and both 2-σ bounds collapse onto
    // it, so the twin is plain exact distinct-set algebra; jaccard
    // divides the same integer-valued doubles in the same order. At a
    // production SF past 4096 distinct keys the sketch samples and this
    // twin stops applying — the sketch-tier accuracy spec takes over.
    "events_overlap_theta" ->
      """WITH a AS (SELECT DISTINCT event_type, user_id FROM events),
c AS (SELECT event_type, CAST(count(*) AS DOUBLE) AS n FROM a GROUP BY 1),
ov AS (
  SELECT x.event_type AS type_a, y.event_type AS type_b,
    CAST(count(*) AS DOUBLE) AS inter
  FROM a x JOIN a y ON x.user_id = y.user_id AND x.event_type < y.event_type
  GROUP BY 1, 2)
SELECT ca.event_type AS type_a, cb.event_type AS type_b,
  ca.n AS est_a, cb.n AS est_b,
  COALESCE(ov.inter, CAST(0 AS DOUBLE)) AS est_overlap,
  COALESCE(ov.inter, CAST(0 AS DOUBLE)) AS lb_overlap,
  COALESCE(ov.inter, CAST(0 AS DOUBLE)) AS ub_overlap,
  ca.n + cb.n - COALESCE(ov.inter, CAST(0 AS DOUBLE)) AS est_union,
  CASE WHEN ca.n + cb.n - COALESCE(ov.inter, CAST(0 AS DOUBLE)) = 0
    THEN CAST(0 AS DOUBLE)
    ELSE COALESCE(ov.inter, CAST(0 AS DOUBLE))
      / (ca.n + cb.n - COALESCE(ov.inter, CAST(0 AS DOUBLE))) END AS jaccard_est
FROM c ca
JOIN c cb ON ca.event_type < cb.event_type
LEFT JOIN ov ON ov.type_a = ca.event_type AND ov.type_b = cb.event_type
ORDER BY type_a, type_b""",

    "setops_customers" ->
      """WITH c95 AS (
  SELECT o_custkey FROM orders
  WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
    AND o_orderdate < TIMESTAMP '1996-01-01 00:00:00'),
c96 AS (
  SELECT o_custkey FROM orders
  WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00')
SELECT 'both_years' AS set_kind, o_custkey FROM (SELECT o_custkey FROM c95 INTERSECT SELECT o_custkey FROM c96)
UNION ALL
SELECT 'only_1996' AS set_kind, o_custkey FROM (SELECT o_custkey FROM c96 EXCEPT SELECT o_custkey FROM c95)
ORDER BY set_kind, o_custkey""",

    "asof_join" ->
      """WITH s AS (
  SELECT event_id, user_id, epoch_ms(CAST(ts AS TIMESTAMP)) AS ts_ms,
    epoch_ms(CAST(ts AS TIMESTAMP)) * 1000000 + event_id AS ts_u, value, event_type
  FROM events),
p AS (SELECT * FROM s WHERE event_type = 'purchase'),
c AS (SELECT * FROM s WHERE event_type = 'click')
SELECT p.event_id, p.user_id, p.ts_ms, p.value, c.value AS last_click_val
FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts_u >= c.ts_u
ORDER BY p.event_id""",

    "sessionize" ->
      """WITH e AS (
  SELECT event_id, user_id, epoch_ms(CAST(ts AS TIMESTAMP)) AS ts_ms,
    CAST(round(value * 100) AS BIGINT) AS value_c
  FROM events),
flagged AS (
  SELECT *, CASE WHEN ts_ms - lag(ts_ms) OVER w >= 1800000
                   OR lag(ts_ms) OVER w IS NULL THEN 1 ELSE 0 END AS new_s
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms, event_id)),
sessions AS (
  SELECT *, CAST(SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts_ms, event_id
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
  FROM flagged)
SELECT user_id, session_id,
  CAST(MIN(ts_ms) AS BIGINT) AS session_start,
  CAST(MAX(ts_ms) AS BIGINT) AS session_end,
  CAST(count(*) AS BIGINT) AS n_events,
  CAST(SUM(value_c) AS BIGINT) / 1e2 AS sum_value
FROM sessions GROUP BY 1, 2 ORDER BY 1, 2""",

    "cube_orders" ->
      """SELECT o_orderpriority, o_orderstatus,
  CAST(count(*) AS BIGINT) AS n,
  CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) / 1e2 AS sum_price
FROM orders GROUP BY CUBE(o_orderpriority, o_orderstatus)
ORDER BY o_orderpriority NULLS FIRST, o_orderstatus NULLS FIRST""",

    "interval_join" ->
      """WITH e AS (
  SELECT event_id, user_id, event_type,
    epoch_ms(CAST(ts AS TIMESTAMP)) AS ts_ms,
    CAST(round(value * 100) AS BIGINT) AS value_c
  FROM events),
p AS (SELECT event_id, user_id, ts_ms AS p_ts FROM e WHERE event_type = 'purchase'),
c AS (SELECT user_id, ts_ms AS c_ts, value_c FROM e WHERE event_type = 'click')
SELECT p.event_id, p.user_id, p.p_ts,
  CAST(count(*) AS BIGINT) AS n_clicks_1h,
  CAST(SUM(c.value_c) AS BIGINT) / 1e2 AS click_value_1h
FROM p JOIN c ON p.user_id = c.user_id
  AND c.c_ts >= p.p_ts - 3600000 AND c.c_ts < p.p_ts
GROUP BY 1, 2, 3 ORDER BY 1""",

    "percentiles" ->
      """SELECT o_orderstatus,
  quantile_cont(CAST(round(o_totalprice * 100) AS BIGINT), 5e-1) / 1e2 AS median_price,
  quantile_cont(CAST(round(o_totalprice * 100) AS BIGINT), 9e-1) / 1e2 AS p90_price,
  CAST(count(*) AS BIGINT) AS n
FROM orders GROUP BY 1 ORDER BY 1""",

    // twin of Relational.percentilesDist: the SAME value-count + rank-span
    // computation, so every intermediate (integer ranks, bracketing cents)
    // and the final interpolation are token-identical across engines
    "percentiles_dist" ->
      """WITH c AS (
  SELECT o_orderstatus, CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders),
vc AS (SELECT o_orderstatus, cents, CAST(count(*) AS BIGINT) AS c
  FROM c GROUP BY 1, 2),
cum AS (SELECT *, SUM(c) OVER (PARTITION BY o_orderstatus ORDER BY cents) AS cum
  FROM vc),
j AS (SELECT *,
    CAST(floor(CAST(n - 1 AS DOUBLE) * 5e-1) AS BIGINT) + 1 AS lo5,
    CAST(floor(CAST(n - 1 AS DOUBLE) * 9e-1) AS BIGINT) + 1 AS lo9
  FROM (SELECT *, MAX(cum) OVER (PARTITION BY o_orderstatus) AS n FROM cum)),
k AS (SELECT * FROM j
  WHERE (cum - c < lo5 AND cum >= lo5) OR (cum - c < lo5 + 1 AND cum >= lo5 + 1)
     OR (cum - c < lo9 AND cum >= lo9) OR (cum - c < lo9 + 1 AND cum >= lo9 + 1)),
a AS (SELECT o_orderstatus, MAX(n) AS n,
    MIN(CASE WHEN cum >= lo5 THEN cents END) AS v_lo5,
    MIN(CASE WHEN cum >= lo5 + 1 THEN cents END) AS v_hi5,
    MIN(CASE WHEN cum >= lo9 THEN cents END) AS v_lo9,
    MIN(CASE WHEN cum >= lo9 + 1 THEN cents END) AS v_hi9
  FROM k GROUP BY 1),
p AS (SELECT *,
    CAST(n - 1 AS DOUBLE) * 5e-1 AS pos5,
    CAST(n - 1 AS DOUBLE) * 9e-1 AS pos9,
    coalesce(v_hi5, v_lo5) AS h5, coalesce(v_hi9, v_lo9) AS h9
  FROM a)
SELECT o_orderstatus,
  CASE WHEN ceil(pos5) = floor(pos5) OR h5 = v_lo5 THEN CAST(v_lo5 AS DOUBLE)
    ELSE (CAST(ceil(pos5) AS BIGINT) - pos5) * CAST(v_lo5 AS DOUBLE)
       + (pos5 - CAST(floor(pos5) AS BIGINT)) * CAST(h5 AS DOUBLE)
  END / 1e2 AS median_price,
  CASE WHEN ceil(pos9) = floor(pos9) OR h9 = v_lo9 THEN CAST(v_lo9 AS DOUBLE)
    ELSE (CAST(ceil(pos9) AS BIGINT) - pos9) * CAST(v_lo9 AS DOUBLE)
       + (pos9 - CAST(floor(pos9) AS BIGINT)) * CAST(h9 AS DOUBLE)
  END / 1e2 AS p90_price,
  CAST(n AS BIGINT) AS n
FROM p ORDER BY 1""",

    // twin of TextOps.piiRedactQuery: the SAME planted contact line (built
    // with identical casts/lpad), then the SAME patterns applied in
    // PiiPatterns order — interpolated from the one definition so the two
    // engines can never drift. Each count is taken BEFORE its replacement.
    "doc_pii_redact" -> {
      val Seq(em, ph, ip, id) = graft.operators.TextOps.PiiPatterns.map(_._2)
      s"""WITH p AS (SELECT doc_id,
  text || ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com or +1 (555) 010-'
    || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
    || ' host 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.1'
    || ' ref ' || lpad(CAST(doc_id % 100000 AS VARCHAR), 12, '0') AS t0
  FROM documents),
r1 AS (SELECT doc_id, CAST(len(regexp_extract_all(t0, '$em')) AS BIGINT) AS n_email,
  regexp_replace(t0, '$em', '<EMAIL>', 'g') AS t1 FROM p),
r2 AS (SELECT *, CAST(len(regexp_extract_all(t1, '$ph')) AS BIGINT) AS n_phone,
  regexp_replace(t1, '$ph', '<PHONE>', 'g') AS t2 FROM r1),
r3 AS (SELECT *, CAST(len(regexp_extract_all(t2, '$ip')) AS BIGINT) AS n_ip,
  regexp_replace(t2, '$ip', '<IP>', 'g') AS t3 FROM r2),
r4 AS (SELECT *, CAST(len(regexp_extract_all(t3, '$id')) AS BIGINT) AS n_id9,
  regexp_replace(t3, '$id', '<ID>', 'g') AS t4 FROM r3)
SELECT doc_id, n_email, n_phone, n_ip, n_id9,
  n_email + n_phone + n_ip + n_id9 AS n_pii, t4 AS redacted
FROM r4 ORDER BY doc_id"""
    },

    // twin of TextOps.shardShuffle: same seeded 28-bit md5 key, same
    // shard modulus, same (key, doc_id) total order within a shard
    "doc_shard_shuffle" ->
      """WITH k AS (SELECT doc_id,
    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '#shuf'), 1, 7)) AS BIGINT) AS skey
  FROM documents)
SELECT doc_id, skey % 16 AS shard,
  CAST(row_number() OVER (PARTITION BY skey % 16 ORDER BY skey, doc_id) AS BIGINT) AS rank
FROM k ORDER BY shard, rank""",

    // Twin of TextOps.bpeMerges — the BPE TRAINER replayed fully
    // independently: the K greedy rounds are UNROLLED into K chained CTE
    // triples (pair counts from the current vocabulary → argmax with
    // Spark's exact tie order (count DESC, left ASC, right ASC — binary
    // string collation both engines) → merge applied via the same
    // delimiter-encoded replace() fold the apply twin uses). Every
    // quantity is a BIGINT sum over the word-frequency table, so the
    // replay is integer-exact end to end — no shared fixture, no float.
    // (The unigram trainer's EM loop is NOT replayed this way: its
    // rounds re-derive piece costs via StrictMath.log on the 2^20 grid,
    // and DuckDB's ln() is a different libm — a grid-boundary ulp
    // divergence would flake the hash compare. Its twin — see
    // "vocab_unigram" — instead shares the trained (piece, cost_grid)
    // table, like the apply twins, and independently re-derives the
    // usage counts/ranks by a backtraced Viterbi that never touches a
    // logarithm.)
    "vocab_bpe_merges" -> {
      val k = 8
      val head = Seq(
        s"""w AS (SELECT word, CAST(count(*) AS BIGINT) AS freq
  FROM (SELECT unnest($tokensExpr) AS word FROM documents) GROUP BY 1)""",
        s"""v0 AS (SELECT freq,
  '||' || regexp_replace(word, '(.)', '\\1||', 'g') || '</w>||' AS s FROM w)""")
      val rounds = (1 to k).flatMap { r =>
        Seq(
          s"""p$r AS (
  SELECT (p).l AS l, (p).r AS r, CAST(SUM(freq) AS BIGINT) AS c FROM (
    SELECT freq, unnest(list_transform(range(1, len(syms)),
      i -> {'l': syms[i], 'r': syms[i+1]})) AS p
    FROM (SELECT freq,
      list_filter(string_split(s, '||'), x -> x != '') AS syms FROM v${r - 1})
  ) GROUP BY 1, 2)""",
          s"""t$r AS (SELECT $r AS merge_rank, l, r, c FROM p$r
  ORDER BY c DESC, l ASC, r ASC LIMIT 1)""",
          s"""v$r AS (SELECT v${r - 1}.freq, replace(v${r - 1}.s,
  '|' || t$r.l || '||' || t$r.r || '|',
  '|' || t$r.l || t$r.r || '|') AS s FROM v${r - 1}, t$r)""")
      }
      val union = (1 to k).map(r => s"SELECT * FROM t$r").mkString(" UNION ALL ")
      "WITH " + (head ++ rounds).mkString(",\n") +
        s"""
SELECT CAST(merge_rank AS BIGINT) AS merge_rank, l AS "left", r AS "right",
  c AS pair_count
FROM ($union) ORDER BY merge_rank"""
    },

    // Twin of TextOps.bpeSegmentCounts — the BPE APPLY phase replayed
    // INDEPENDENTLY in SQL. The trained merge list is shared state (read
    // from Verify's own `vocab_bpe_merges` dump via the __GRAFT_OUT__
    // placeholder, substituted with the dump dir at oracle_sql.json
    // write time), but the segmentation itself is re-derived from
    // scratch: a word's symbol sequence is encoded as a
    // double-'|'-delimited string with flanking separators, and one
    // merge round is ONE `replace()` call — SQL replace scans left to
    // right over non-overlapping occurrences and resumes AFTER each
    // replacement, which is exactly the leftmost-non-overlapping
    // pending-symbol fold `mergeFold` implements (the flanking single
    // '|' in the pattern pins full-symbol matches; the replacement
    // re-emits it, so inter-symbol separators stay doubled). The
    // recursive CTE applies the K merges in merge_rank order; the final
    // subtoken count is (separator pairs − 1).
    "doc_bpe_segment" ->
      s"""WITH RECURSIVE
m AS (SELECT merge_rank, "left" AS l, "right" AS r
  FROM read_parquet('__GRAFT_OUT__/vocab_bpe_merges/*.parquet')),
words AS (SELECT DISTINCT unnest($tokensExpr) AS word FROM documents),
seg AS (
  SELECT word,
    '||' || regexp_replace(word, '(.)', '\\1||', 'g') || '</w>||' AS s,
    CAST(0 AS BIGINT) AS k
  FROM words
  UNION ALL
  SELECT seg.word,
    replace(seg.s, '|' || m.l || '||' || m.r || '|', '|' || m.l || m.r || '|'),
    seg.k + 1
  FROM seg JOIN m ON m.merge_rank = seg.k + 1
),
fin AS (
  SELECT word,
    CAST((length(s) - length(replace(s, '||', ''))) / 2 - 1 AS BIGINT) AS n_sub
  FROM seg WHERE k = (SELECT max(merge_rank) FROM m)
),
toks AS (SELECT doc_id, unnest($tokensExpr) AS word FROM documents)
SELECT t.doc_id,
  CAST(count(*) AS BIGINT) AS n_words,
  CAST(sum(f.n_sub) AS BIGINT) AS n_bpe_tokens,
  CAST(sum(f.n_sub) AS DOUBLE) / CAST(count(*) AS BIGINT) AS bpe_fertility
FROM toks t JOIN fin f ON f.word = t.word
GROUP BY t.doc_id ORDER BY t.doc_id""",

    // Twin of TextOps.unigramSegmentCounts — Viterbi re-implemented as a
    // recursive-CTE DP, independent of the Scala fold: each iteration
    // advances one character position for every word at once, carrying
    // the full best-cost and piece-count arrays as LISTs; the ≤4
    // candidate pieces ending at the new position come from LEFT JOINs
    // against the trained piece table (Verify's `vocab_unigram` dump —
    // shared trained state, like the BPE twin). Costs are the same 2^20
    // integer grid, so min/tie comparisons are BIGINT-exact; the CASE
    // checks length-4 candidates first, encoding uniViterbi's
    // prefer-the-LONGER-piece tie rule. 4611686018427387903 is the
    // Scala INF (Long.MaxValue/4).
    // Twin of TextOps.unigramVocab (r6b — the doc_bpe_segment trust
    // model: (piece, cost_grid) is the SHARED trained state from this
    // run's own dump; viterbi_count / rank / n_chars are INDEPENDENTLY
    // re-derived): the same length-capped DP as the segment twin, but
    // carrying the chosen piece LENGTH per position (the longest-first
    // CASE mirrors uniViterbi's l > bl(i) tie rule), then a recursive
    // BACKTRACE walks each word right-to-left emitting its chosen
    // pieces, and the freq-weighted piece usage joins back to the piece
    // table — the count the trainer's final pass measured.
    "vocab_unigram" -> {
      def cand(l: Int): String = {
        val bi = l match { case 1 => "d.i+1"; case 2 => "d.i"
          case 3 => "d.i-1"; case 4 => "d.i-2" }
        s"coalesce(d.best[$bi] + p$l.cost_grid, 4611686018427387903)"
      }
      val minAll = s"least(${cand(1)}, ${cand(2)}, ${cand(3)}, ${cand(4)})"
      s"""WITH RECURSIVE
pc AS (SELECT piece, cost_grid
  FROM read_parquet('__GRAFT_OUT__/vocab_unigram/*.parquet')),
wfreq AS (SELECT word, CAST(count(*) AS BIGINT) AS freq
  FROM (SELECT unnest($tokensExpr) AS word FROM documents) GROUP BY 1),
dp AS (
  SELECT word, CAST(0 AS BIGINT) AS i,
    [CAST(0 AS BIGINT)] AS best, [CAST(0 AS BIGINT)] AS bl
  FROM wfreq
  UNION ALL
  SELECT word, i, list_append(best, b), list_append(bl, l)
  FROM (
    SELECT d.word AS word, d.i + 1 AS i, d.best AS best, d.bl AS bl,
      $minAll AS b,
      CASE
        WHEN ${cand(4)} = $minAll THEN CAST(4 AS BIGINT)
        WHEN ${cand(3)} = $minAll THEN CAST(3 AS BIGINT)
        WHEN ${cand(2)} = $minAll THEN CAST(2 AS BIGINT)
        ELSE CAST(1 AS BIGINT)
      END AS l
    FROM dp d
    LEFT JOIN pc p1 ON p1.piece = substr(d.word, d.i+1, 1)
    LEFT JOIN pc p2 ON d.i+1 >= 2 AND p2.piece = substr(d.word, d.i, 2)
    LEFT JOIN pc p3 ON d.i+1 >= 3 AND p3.piece = substr(d.word, d.i-1, 3)
    LEFT JOIN pc p4 ON d.i+1 >= 4 AND p4.piece = substr(d.word, d.i-2, 4)
    WHERE d.i < length(d.word)
  )
),
fin AS (SELECT word, bl FROM dp WHERE i = length(word)),
bt AS (
  SELECT word, CAST(length(word) AS BIGINT) AS i,
    CAST(NULL AS VARCHAR) AS piece, bl
  FROM fin
  UNION ALL
  SELECT word, i - bl[CAST(i AS INT)+1],
    substr(word, CAST(i - bl[CAST(i AS INT)+1] + 1 AS INT),
      CAST(bl[CAST(i AS INT)+1] AS INT)),
    bl
  FROM bt WHERE i > 0),
chosen AS (SELECT word, piece FROM bt WHERE piece IS NOT NULL),
cnt AS (
  SELECT c.piece, CAST(SUM(w.freq) AS BIGINT) AS c
  FROM chosen c JOIN wfreq w USING (word) GROUP BY 1),
pc2 AS (
  SELECT p.piece, p.cost_grid, CAST(coalesce(cnt.c, 0) AS BIGINT) AS c
  FROM pc p LEFT JOIN cnt USING (piece))
SELECT CAST(row_number() OVER (ORDER BY c DESC, piece) AS BIGINT) AS rank,
  piece, CAST(length(piece) AS BIGINT) AS n_chars, c AS viterbi_count,
  CAST(cost_grid AS BIGINT) AS cost_grid
FROM pc2 ORDER BY rank"""
    },

    "doc_unigram_segment" -> {
      def cand(l: Int): String = {
        val bi = l match { case 1 => "d.i+1"; case 2 => "d.i"
          case 3 => "d.i-1"; case 4 => "d.i-2" }
        s"coalesce(d.best[$bi] + p$l.cost_grid, 4611686018427387903)"
      }
      val minAll = s"least(${cand(1)}, ${cand(2)}, ${cand(3)}, ${cand(4)})"
      s"""WITH RECURSIVE
pc AS (SELECT piece, cost_grid
  FROM read_parquet('__GRAFT_OUT__/vocab_unigram/*.parquet')),
words AS (SELECT DISTINCT unnest($tokensExpr) AS word FROM documents),
dp AS (
  SELECT word, CAST(0 AS BIGINT) AS i,
    [CAST(0 AS BIGINT)] AS best, [CAST(0 AS BIGINT)] AS np
  FROM words
  UNION ALL
  SELECT word, i, list_append(best, b), list_append(np, n)
  FROM (
    SELECT d.word AS word, d.i + 1 AS i, d.best AS best, d.np AS np,
      $minAll AS b,
      CASE
        WHEN ${cand(4)} = $minAll THEN d.np[d.i-2] + 1
        WHEN ${cand(3)} = $minAll THEN d.np[d.i-1] + 1
        WHEN ${cand(2)} = $minAll THEN d.np[d.i] + 1
        ELSE d.np[d.i+1] + 1
      END AS n
    FROM dp d
    LEFT JOIN pc p1 ON p1.piece = substr(d.word, d.i+1, 1)
    LEFT JOIN pc p2 ON d.i+1 >= 2 AND p2.piece = substr(d.word, d.i, 2)
    LEFT JOIN pc p3 ON d.i+1 >= 3 AND p3.piece = substr(d.word, d.i-1, 3)
    LEFT JOIN pc p4 ON d.i+1 >= 4 AND p4.piece = substr(d.word, d.i-2, 4)
    WHERE d.i < length(d.word)
  )
),
fin AS (SELECT word, np[length(word)+1] AS n_pieces
  FROM dp WHERE i = length(word)),
toks AS (SELECT doc_id, unnest($tokensExpr) AS word FROM documents)
SELECT t.doc_id,
  CAST(count(*) AS BIGINT) AS n_words,
  CAST(sum(f.n_pieces) AS BIGINT) AS n_uni_tokens,
  CAST(sum(f.n_pieces) AS DOUBLE) / CAST(count(*) AS BIGINT) AS uni_fertility
FROM toks t JOIN fin f ON f.word = t.word
GROUP BY t.doc_id ORDER BY t.doc_id"""
    },

    // twin of TextOps.bigramLm: same grid (2^20), same FLOOR division, so
    // the per-document sum is integer-exact; one double division at the end
    "doc_bigram_lm" ->
      s"""WITH t AS (SELECT doc_id, $tokensExpr AS toks FROM documents),
b AS (SELECT doc_id, unnest(list_transform(range(1, len(toks)),
    i -> toks[i] || ' ' || toks[i+1])) AS bg FROM t),
cb AS (SELECT bg, CAST(count(*) AS BIGINT) AS cb FROM b GROUP BY 1),
cp AS (SELECT string_split(bg, ' ')[1] AS w1, CAST(SUM(cb) AS BIGINT) AS cp
  FROM cb GROUP BY 1),
sc AS (SELECT bg, (cb * 1048576) // cp AS g
  FROM cb JOIN cp ON string_split(cb.bg, ' ')[1] = cp.w1),
a AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_pairs,
    CAST(SUM(g) AS BIGINT) AS lm_grid
  FROM b JOIN sc USING (bg) GROUP BY 1)
SELECT doc_id, n_pairs, lm_grid,
  CAST(lm_grid AS DOUBLE) / (n_pairs * 1048576) AS lm_score
FROM a ORDER BY doc_id""",

    // Twin of TextOps.pplBuckets: the bigram-LM score CTEs verbatim
    // from doc_bigram_lm, lang joined from the corpus metadata,
    // rank-tercile per language (ntile over the total order
    // (lm_score DESC, doc_id) — rank-based, no float interpolation
    // crosses the engines).
    "doc_ppl_buckets" ->
      s"""WITH t AS (SELECT doc_id, $tokensExpr AS toks FROM documents),
b AS (SELECT doc_id, unnest(list_transform(range(1, len(toks)),
    i -> toks[i] || ' ' || toks[i+1])) AS bg FROM t),
cb AS (SELECT bg, CAST(count(*) AS BIGINT) AS cb FROM b GROUP BY 1),
cp AS (SELECT string_split(bg, ' ')[1] AS w1, CAST(SUM(cb) AS BIGINT) AS cp
  FROM cb GROUP BY 1),
sc AS (SELECT bg, (cb * 1048576) // cp AS g
  FROM cb JOIN cp ON string_split(cb.bg, ' ')[1] = cp.w1),
a AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_pairs,
    CAST(SUM(g) AS BIGINT) AS lm_grid
  FROM b JOIN sc USING (bg) GROUP BY 1),
s AS (SELECT a.doc_id, d.lang,
    CAST(a.lm_grid AS DOUBLE) / (a.n_pairs * 1048576) AS lm_score
  FROM a JOIN documents d ON a.doc_id = d.doc_id),
r AS (SELECT doc_id, lang, lm_score,
    CAST(ntile(3) OVER (PARTITION BY lang
      ORDER BY lm_score DESC, doc_id) AS BIGINT) AS tercile
  FROM s)
SELECT doc_id, lang, lm_score, tercile,
  CASE WHEN tercile = 1 THEN 'head' WHEN tercile = 2 THEN 'middle'
       ELSE 'tail' END AS bucket
FROM r ORDER BY doc_id""",

    // Twin of TextOps.hashEmbed: same lowercased-token md5₂₈, dim =
    // h % 64, sign = (h // 64) % 2 (≡ bit 6, the expression's h & 64),
    // signed counts summed as BIGINTs (order-independent by
    // integrality), dense 64-dim reconstruction via a range join.
    // EmbedDims=64 mirrors TextOps — move together.
    "doc_hash_embed" ->
      s"""WITH t AS (
  SELECT doc_id, list_transform($tokensExpr, w -> lower(w)) AS toks
  FROM documents),
h AS (
  SELECT doc_id, CAST('0x' || substr(md5(tok), 1, 7) AS BIGINT) AS h
  FROM (SELECT doc_id, unnest(toks) AS tok FROM t)),
g AS (
  SELECT doc_id, h % 64 AS dim,
    CAST(SUM(CASE WHEN (h // 64) % 2 = 0 THEN 1 ELSE -1 END) AS BIGINT) AS v
  FROM h GROUP BY 1, 2),
dense AS (
  SELECT t.doc_id, d.dim, CAST(coalesce(g.v, 0) AS BIGINT) AS v
  FROM t CROSS JOIN (SELECT unnest(range(0, 64)) AS dim) d
  LEFT JOIN g ON g.doc_id = t.doc_id AND g.dim = d.dim),
n AS (
  SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens FROM t),
agg AS (
  SELECT dense.doc_id, max(n.n_tokens) AS n_tokens,
    list(v ORDER BY dim) AS emb,
    CAST(SUM(v * v) AS BIGINT) AS norm_sq
  FROM dense JOIN n ON dense.doc_id = n.doc_id
  GROUP BY dense.doc_id)
SELECT doc_id, n_tokens,
  array_to_string(list_transform(emb, x -> CAST(x AS VARCHAR)), ',')
    AS embedding_csv,
  norm_sq
FROM agg ORDER BY doc_id""",


    // Twin of TextOps.hashEmbedTopK: the doc_hash_embed dense-vector
    // CTEs verbatim, the DSIR eval-split rule for the query side,
    // INTEGER dot folds (order-independent), one final cosine division
    // in the same token order, (sim DESC, c_id) rank.
    "emb_hash_topk" ->
      s"""WITH t AS (
  SELECT doc_id, list_transform($tokensExpr, w -> lower(w)) AS toks
  FROM documents),
h AS (
  SELECT doc_id, CAST('0x' || substr(md5(tok), 1, 7) AS BIGINT) AS h
  FROM (SELECT doc_id, unnest(toks) AS tok FROM t)),
g AS (
  SELECT doc_id, h % 64 AS dim,
    CAST(SUM(CASE WHEN (h // 64) % 2 = 0 THEN 1 ELSE -1 END) AS BIGINT) AS v
  FROM h GROUP BY 1, 2),
dense AS (
  SELECT t.doc_id, d.dim, CAST(coalesce(g.v, 0) AS BIGINT) AS v
  FROM t CROSS JOIN (SELECT unnest(range(0, 64)) AS dim) d
  LEFT JOIN g ON g.doc_id = t.doc_id AND g.dim = d.dim),
agg AS (
  SELECT doc_id, list(v ORDER BY dim) AS emb,
    CAST(SUM(v * v) AS BIGINT) AS norm_sq
  FROM dense GROUP BY doc_id),
e AS (
  SELECT doc_id, emb, norm_sq,
    CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '#g1'), 1, 7) AS BIGINT) % 10 = 0 AS is_eval
  FROM agg WHERE norm_sq > 0),
q AS (SELECT doc_id AS q_id, emb AS qemb, norm_sq AS qn FROM e WHERE is_eval),
c AS (SELECT doc_id AS c_id, emb AS cemb, norm_sq AS cn FROM e WHERE NOT is_eval),
sims AS (
  SELECT q_id, c_id,
    CAST(list_reduce(list_transform(range(1, 65), i -> qemb[i] * cemb[i]),
      (x, y) -> x + y) AS DOUBLE)
      / (sqrt(CAST(qn AS DOUBLE)) * sqrt(CAST(cn AS DOUBLE))) AS sim
  FROM c, q)
SELECT q_id, c_id,
  CAST(row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, c_id) AS BIGINT) AS rn,
  sim
FROM sims QUALIFY rn <= 3 ORDER BY q_id, rn""",

    // Twin of TextOps.hashEmbedAnn: the hash-embed CTEs verbatim, then
    // the IVF composition replayed — centroids are the 16 lowest-doc_id
    // candidates (row_number−1 = the expression's ordinal cell id),
    // assignment minimizes the BIGINT score ‖c‖² − 2·v·c with ties to
    // the lowest cell (ORDER BY ns, cid — integer-exact, so cells match
    // Spark's bit-for-bit), queries keep their rk≤2 cells as probes,
    // and the candidate equi-join + exact-cosine rerank mirrors the
    // brute-force twin.
    "emb_hash_ann" ->
      s"""WITH t AS (
  SELECT doc_id, list_transform($tokensExpr, w -> lower(w)) AS toks
  FROM documents),
h AS (
  SELECT doc_id, CAST('0x' || substr(md5(tok), 1, 7) AS BIGINT) AS h
  FROM (SELECT doc_id, unnest(toks) AS tok FROM t)),
g AS (
  SELECT doc_id, h % 64 AS dim,
    CAST(SUM(CASE WHEN (h // 64) % 2 = 0 THEN 1 ELSE -1 END) AS BIGINT) AS v
  FROM h GROUP BY 1, 2),
dense AS (
  SELECT t.doc_id, d.dim, CAST(coalesce(g.v, 0) AS BIGINT) AS v
  FROM t CROSS JOIN (SELECT unnest(range(0, 64)) AS dim) d
  LEFT JOIN g ON g.doc_id = t.doc_id AND g.dim = d.dim),
agg AS (
  SELECT doc_id, list(v ORDER BY dim) AS emb,
    CAST(SUM(v * v) AS BIGINT) AS norm_sq
  FROM dense GROUP BY doc_id),
e AS (
  SELECT doc_id, emb, norm_sq,
    CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '#g1'), 1, 7) AS BIGINT) % 10 = 0 AS is_eval
  FROM agg WHERE norm_sq > 0),
cents AS (
  SELECT CAST(row_number() OVER (ORDER BY doc_id) - 1 AS BIGINT) AS cid,
    emb AS cv, norm_sq AS cn
  FROM (SELECT doc_id, emb, norm_sq FROM e WHERE NOT is_eval
        ORDER BY doc_id LIMIT 16)),
asgn AS (
  SELECT doc_id, cid,
    CAST(row_number() OVER (PARTITION BY doc_id ORDER BY ns, cid) AS BIGINT) AS rk
  FROM (
    SELECT e.doc_id, c.cid,
      c.cn - 2 * CAST(list_reduce(list_transform(range(1, 65),
        i -> e.emb[i] * c.cv[i]), (x, y) -> x + y) AS BIGINT) AS ns
    FROM e, cents c)),
c2 AS (
  SELECT e.doc_id AS c_id, e.emb AS cemb, e.norm_sq AS cn, a.cid AS cell
  FROM e JOIN asgn a USING (doc_id) WHERE NOT e.is_eval AND a.rk = 1),
qp AS (
  SELECT e.doc_id AS q_id, e.emb AS qemb, e.norm_sq AS qn, a.cid AS probe
  FROM e JOIN asgn a USING (doc_id) WHERE e.is_eval AND a.rk <= 2),
sims AS (
  SELECT q_id, cell, c_id,
    CAST(list_reduce(list_transform(range(1, 65), i -> qemb[i] * cemb[i]),
      (x, y) -> x + y) AS DOUBLE)
      / (sqrt(CAST(qn AS DOUBLE)) * sqrt(CAST(cn AS DOUBLE))) AS sim
  FROM c2 JOIN qp ON c2.cell = qp.probe)
SELECT q_id, cell, c_id,
  CAST(row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, c_id) AS BIGINT) AS rn,
  sim
FROM sims QUALIFY rn <= 3 ORDER BY q_id, rn""",

    // Twin of TextOps.classifierFrame: same lowercased unigram+bigram
    // feature set, same md5₂₈ bucket (mod 4096) and md5₂₈ weight grid
    // (mod 2^16 - 2^15), BIGINT feature-weight sum, one final division.
    // ClsBuckets=4096 and the 65536/32768 grid mirror TextOps — move
    // together.
    "doc_classifier_score" ->
      s"""WITH t AS (
  SELECT doc_id, list_transform($tokensExpr, w -> lower(w)) AS toks
  FROM documents),
f AS (
  SELECT doc_id, unnest(list_concat(toks, list_transform(range(1, len(toks)),
    i -> toks[i] || ' ' || toks[i+1]))) AS feat FROM t),
w AS (
  SELECT doc_id,
    (CAST('0x' || substr(md5('cls#' || CAST(
        CAST('0x' || substr(md5(feat), 1, 7) AS BIGINT) % 4096 AS VARCHAR)),
      1, 7) AS BIGINT) % 65536) - 32768 AS wt
  FROM f)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_feat,
  CAST(sum(wt) AS BIGINT) AS score_units,
  CAST(sum(wt) AS DOUBLE) / (count(*) * 65536e0) AS score,
  CAST(sum(wt) AS BIGINT) > 0 AS label_keep
FROM w GROUP BY doc_id ORDER BY doc_id""",

    // Twin of TextOps.importanceDsir: same eval-split key (md5 #g1
    // bucket 0), same lowercased-bigram md5₂₈ bucket (mod 4096),
    // Laplace likelihood-ratio in the SAME fixed division order
    // quantized to the 2^20 grid, BIGINT per-doc sums, one final mean
    // division. DsirBuckets=4096 mirrors TextOps — move together.
    "doc_importance_dsir" ->
      s"""WITH t AS (
  SELECT doc_id,
    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '#g1'), 1, 7)) AS BIGINT) % 10 = 0 AS is_eval,
    list_transform($tokensExpr, w -> lower(w)) AS tk
  FROM documents),
g0 AS (
  SELECT doc_id, is_eval,
    CASE WHEN len(tk) < 2 THEN [] ELSE
      list_transform(range(1, len(tk)), i -> tk[i] || ' ' || tk[i+1]) END AS bgs
  FROM t),
gr AS (
  SELECT doc_id, is_eval,
    CAST('0x' || substr(md5(g), 1, 7) AS BIGINT) % 4096 AS b
  FROM (SELECT doc_id, is_eval, unnest(bgs) AS g FROM g0)),
cnt AS (
  SELECT b,
    CAST(sum(CASE WHEN is_eval THEN 1 ELSE 0 END) AS BIGINT) AS t,
    CAST(sum(CASE WHEN is_eval THEN 0 ELSE 1 END) AS BIGINT) AS r
  FROM gr GROUP BY 1),
w AS (
  SELECT b, CAST(round(
    (CAST(t + 1 AS DOUBLE) / CAST(sum(t) OVER () + 4096 AS DOUBLE))
    / (CAST(r + 1 AS DOUBLE) / CAST(sum(r) OVER () + 4096 AS DOUBLE))
    * 1048576e0) AS BIGINT) AS qlr
  FROM cnt),
sc AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
    CAST(sum(qlr) AS BIGINT) AS units
  FROM gr JOIN w USING (b) WHERE NOT is_eval GROUP BY 1)
SELECT doc_id, n_bigrams, units,
  CAST(units AS DOUBLE) / (n_bigrams * 1048576e0) AS score,
  units > n_bigrams * 1048576 AS keep
FROM sc ORDER BY doc_id""",

    "doc_top_tokens" ->
      s"""WITH t AS (SELECT unnest($tokensExpr) AS token FROM documents)
SELECT token, CAST(count(*) AS BIGINT) AS n
FROM t GROUP BY 1 ORDER BY n DESC, token LIMIT 50""",

    "doc_token_stats" ->
      s"""SELECT doc_id, lang,
  CAST(len($tokensExpr) AS BIGINT) AS n_tokens,
  CAST(length(replace(text, ' ', '')) AS BIGINT) AS n_chars_clean,
  CAST(len(list_distinct($tokensExpr)) AS BIGINT) AS n_distinct,
  CAST(len(list_distinct($tokensExpr)) AS DOUBLE) / CAST(len($tokensExpr) AS BIGINT) AS ttr,
  CAST(length(replace(text, ' ', '')) AS DOUBLE) / CAST(len($tokensExpr) AS BIGINT) AS avg_token_len,
  CAST(len(regexp_extract_all(text, '[bcdfghjklmnpqrstvwxyz]*[aeiou]+|[bcdfghjklmnpqrstvwxyz]+')) AS BIGINT) AS n_subwords,
  CAST(len(regexp_extract_all(text, '[bcdfghjklmnpqrstvwxyz]*[aeiou]+|[bcdfghjklmnpqrstvwxyz]+')) AS DOUBLE)
    / CAST(len($tokensExpr) AS BIGINT) AS bpe_fertility
FROM documents ORDER BY doc_id""",

    "doc_lang_id" ->
      s"""WITH scored AS (
  SELECT doc_id, lang,
    CAST(len(list_filter($tokensExpr, t -> t IN ('window','merge'))) AS BIGINT) AS s_de,
    CAST(len(list_filter($tokensExpr, t -> t IN ('the','a'))) AS BIGINT) AS s_en,
    CAST(len(list_filter($tokensExpr, t -> t IN ('data','table'))) AS BIGINT) AS s_es,
    CAST(len(list_filter($tokensExpr, t -> t IN ('value','filter'))) AS BIGINT) AS s_fr,
    CAST(len(list_filter($tokensExpr, t -> t IN ('spark','stream'))) AS BIGINT) AS s_zh
  FROM documents)
SELECT doc_id, lang, s_de, s_en, s_es, s_fr, s_zh,
  CASE WHEN s_de = greatest(s_de, s_en, s_es, s_fr, s_zh) THEN 'de'
       WHEN s_en = greatest(s_de, s_en, s_es, s_fr, s_zh) THEN 'en'
       WHEN s_es = greatest(s_de, s_en, s_es, s_fr, s_zh) THEN 'es'
       WHEN s_fr = greatest(s_de, s_en, s_es, s_fr, s_zh) THEN 'fr'
       ELSE 'zh' END AS predicted,
  (CASE WHEN s_de = greatest(s_de, s_en, s_es, s_fr, s_zh) THEN 'de'
       WHEN s_en = greatest(s_de, s_en, s_es, s_fr, s_zh) THEN 'en'
       WHEN s_es = greatest(s_de, s_en, s_es, s_fr, s_zh) THEN 'es'
       WHEN s_fr = greatest(s_de, s_en, s_es, s_fr, s_zh) THEN 'fr'
       ELSE 'zh' END) = lang AS match_label
FROM scored ORDER BY doc_id""",

    "doc_quality" -> qualitySql,

    "doc_unpivot" ->
      s"""WITH src AS ($qualitySql)
SELECT doc_id, metric, value FROM (
  SELECT doc_id, 'quality' AS metric, quality AS value FROM src
  UNION ALL
  SELECT doc_id, 'stop_ratio' AS metric, stop_ratio AS value FROM src
  UNION ALL
  SELECT doc_id, 'ttr' AS metric, ttr AS value FROM src)
ORDER BY doc_id, metric""",

    "doc_fingerprint" ->
      s"""SELECT doc_id, md5(text) AS fp_md5,
  CAST(('0x' || substr(md5(text), 1, 15)) AS BIGINT) AS fp64,
  CAST(len($gramsExpr) AS BIGINT) AS n_shingles,
  CAST(list_reduce(
    list_prepend(CAST(0 AS BIGINT), list_transform($tokensExpr,
      t -> CAST(('0x' || substr(md5(t), 1, 7)) AS BIGINT))),
    (acc, h) -> (acc * 31 + h) % 1000000007) AS BIGINT) AS fp_roll
FROM documents ORDER BY doc_id""",

    // Twin of TextOps.winnow: positional 3-token k-grams (NOT the
    // distinct shingle set), the 28-bit md5-prefix hash idiom repeated
    // verbatim, min per sliding window of 4, then only order-free
    // signatures of the selected set (count / min / max / exact BIGINT
    // sum) so list_distinct's ordering never matters.
    "doc_winnow" ->
      s"""WITH s AS ($winnowSelSql)
SELECT doc_id, CAST(n_grams AS BIGINT) AS n_grams,
  CAST(CASE WHEN n_grams = 0 THEN 0 ELSE greatest(n_grams - 3, 1) END AS BIGINT) AS n_windows,
  CAST(len(sel) AS BIGINT) AS n_selected,
  CAST(coalesce(list_min(sel), 0) AS BIGINT) AS fp_min,
  CAST(coalesce(list_max(sel), 0) AS BIGINT) AS fp_max,
  CAST(coalesce(list_aggregate(sel, 'sum'), 0) AS BIGINT) AS sel_sum
FROM s ORDER BY doc_id""",

    // Twin of TextOps.winnowPairs: the shared winnow selection unnested
    // into fingerprint postings, the same 1000-df-cut as the n-gram
    // sweep (the caps MUST move together), containment scoring
    // (common / min) with the deterministic (containment desc, d1, d2)
    // top-100 cut.
    "dedup_winnow_pairs" ->
      s"""WITH s AS ($winnowSelSql),
sl AS (
  SELECT doc_id, CAST(len(sel) AS BIGINT) AS n_sel, unnest(sel) AS fp
  FROM s WHERE len(sel) > 0),
e AS (
  SELECT doc_id, n_sel, fp FROM sl
  QUALIFY count(*) OVER (PARTITION BY fp) <= 1000),
p AS (
  SELECT a.doc_id AS d1, b.doc_id AS d2, a.n_sel AS n1, b.n_sel AS n2,
    CAST(count(*) AS BIGINT) AS common
  FROM e a JOIN e b ON a.fp = b.fp AND a.doc_id < b.doc_id
  GROUP BY 1, 2, 3, 4)
SELECT d1, d2, common, n1, n2,
  CAST(common AS DOUBLE) / least(n1, n2) AS containment
FROM p ORDER BY containment DESC, d1, d2 LIMIT 100""",

    "dedup_canonical" ->
      """WITH d AS (SELECT doc_id, md5(text) AS fp FROM documents),
w AS (
  SELECT doc_id, fp,
    MIN(doc_id) OVER (PARTITION BY fp) AS keeper,
    CAST(COUNT(*) OVER (PARTITION BY fp) AS BIGINT) AS n_copies
  FROM d)
SELECT doc_id, fp, n_copies FROM w WHERE doc_id = keeper ORDER BY doc_id""",

    "doc_sample_stratified" ->
      """SELECT doc_id, lang,
  CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '#g1'), 1, 7)) AS BIGINT) % 10 AS bucket
FROM documents
WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '#g1'), 1, 7)) AS BIGINT) % 10 = 0
ORDER BY doc_id""",

    "doc_sample_grouped" ->
      """WITH h AS (
  SELECT doc_id, lang, source,
    md5(CAST(doc_id AS VARCHAR) || '#g2') AS h
  FROM documents),
r AS (
  SELECT doc_id, lang, source, h,
    CAST(row_number() OVER (PARTITION BY lang, source ORDER BY h, doc_id) AS INT) AS rk
  FROM h)
SELECT doc_id, lang, source, h, rk FROM r WHERE rk <= 5
ORDER BY lang, source, rk""",

    "dedup_exact" ->
      """SELECT doc_id,
  MIN(doc_id) OVER (PARTITION BY md5(text)) AS keeper_id,
  doc_id <> MIN(doc_id) OVER (PARTITION BY md5(text)) AS is_dup
FROM documents ORDER BY doc_id""",

    "doc_chunk" ->
      s"""WITH d AS (
  SELECT doc_id, $tokensExpr AS toks,
    CAST(len($tokensExpr) AS BIGINT) AS n_tokens
  FROM documents),
d2 AS (
  SELECT *, 1 + (greatest(0, n_tokens - 16) + 7) // 8 AS n_chunks FROM d),
c AS (
  SELECT doc_id, n_tokens, toks,
    unnest(generate_series(0, n_chunks - 1)) AS k
  FROM d2)
SELECT doc_id, CAST(k AS BIGINT) AS chunk_id,
  CAST(1 + 8 * k AS BIGINT) AS tok_start,
  CAST(least(16, n_tokens - 8 * k) AS BIGINT) AS chunk_tokens,
  md5(array_to_string(list_slice(toks, 1 + 8 * k, 8 * k + 16), ' ')) AS chunk_md5,
  array_to_string(list_slice(toks, 1 + 8 * k, 8 * k + 16), ' ') AS chunk_text
FROM c ORDER BY doc_id, chunk_id""",

    "doc_contamination" -> contaminationSql,

    // contaminationBloom's bloom stage is a pure pre-shuffle reduction
    // verified by the exact join, so the ground truth is the same query
    // — any false positive the bloom let through (or true hit it
    // wrongly dropped) would surface as an oracle mismatch here.
    "doc_decontam_bloom" -> contaminationSql,

    "doc_rarity" ->
      s"""WITH tok AS (SELECT doc_id, unnest($tokensExpr) AS token FROM documents),
freq AS (SELECT token, CAST(count(*) AS BIGINT) AS freq FROM tok GROUP BY 1)
SELECT doc_id,
  CAST(count(*) AS BIGINT) AS n_tokens,
  CAST(SUM(freq) AS BIGINT) AS sum_freq,
  CAST(MIN(freq) AS BIGINT) AS min_freq,
  CAST(SUM(CASE WHEN freq <= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_rare,
  CAST(SUM(freq) AS DOUBLE) / CAST(count(*) AS BIGINT) AS avg_freq
FROM tok JOIN freq USING (token)
GROUP BY doc_id ORDER BY doc_id""",

    // Sequence packing twin: running token sum per shard, doc interval
    // → training-row postings via integer interval decomposition.
    // Window SUM default frame (RANGE ... CURRENT ROW) agrees between
    // engines because doc_id is unique within a shard.
    "doc_pack" -> {
      val L = graft.operators.TextOps.PackLen
      s"""WITH d AS (
  SELECT doc_id,
    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '#g1'), 1, 7)) AS BIGINT) % 10 AS shard,
    CAST(len($tokensExpr) AS BIGINT) AS n_toks
  FROM documents),
c AS (
  SELECT doc_id, shard, n_toks,
    CAST(SUM(n_toks) OVER (PARTITION BY shard ORDER BY doc_id) AS BIGINT) AS tok_end
  FROM d WHERE n_toks > 0),
c2 AS (SELECT *, tok_end - n_toks AS tok_start FROM c),
r AS (
  SELECT doc_id, shard, tok_start, tok_end,
    unnest(range(tok_start // $L, (tok_end - 1) // $L + 1)) AS seq_idx
  FROM c2)
SELECT shard, seq_idx,
  CAST(count(*) AS BIGINT) AS n_docs,
  CAST(min(doc_id) AS BIGINT) AS first_doc_id,
  CAST(max(doc_id) AS BIGINT) AS last_doc_id,
  CAST(SUM(least(tok_end, (seq_idx + 1) * $L) - greatest(tok_start, seq_idx * $L)) AS BIGINT) AS n_tokens
FROM r GROUP BY 1, 2 ORDER BY 1, 2"""
    },

    // tf/df ordering ≡ tf·N/df ordering, and a single BIGINT÷BIGINT
    // division is exactly rounded — identical doubles, identical ranks
    // (no log(), whose rounding is libm-dependent).
    "doc_tfidf" ->
      s"""WITH tok AS (SELECT doc_id, unnest($tokensExpr) AS token FROM documents),
tfq AS (SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf FROM tok GROUP BY 1, 2),
dfq AS (SELECT token, CAST(count(*) AS BIGINT) AS df FROM tfq GROUP BY 1),
scored AS (
  SELECT doc_id, token, tf, df, CAST(tf AS DOUBLE) / df AS score
  FROM tfq JOIN dfq USING (token)),
ranked AS (
  SELECT doc_id, token, tf, df, score,
    CAST(row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, token) AS INT) AS term_rank
  FROM scored)
SELECT doc_id, token, tf, df, score, term_rank
FROM ranked WHERE term_rank <= 3
ORDER BY doc_id, term_rank""",

    "doc_pivot" ->
      """SELECT source,
  CAST(SUM(CASE WHEN lang = 'de' THEN 1 ELSE 0 END) AS BIGINT) AS de,
  CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS en,
  CAST(SUM(CASE WHEN lang = 'es' THEN 1 ELSE 0 END) AS BIGINT) AS es,
  CAST(SUM(CASE WHEN lang = 'fr' THEN 1 ELSE 0 END) AS BIGINT) AS fr,
  CAST(SUM(CASE WHEN lang = 'zh' THEN 1 ELSE 0 END) AS BIGINT) AS zh
FROM documents GROUP BY source ORDER BY source""",

    "emb_quantize" ->
      """WITH vd AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings),
am AS (
  SELECT vec_id, v,
    list_reduce(list_prepend(0e0, v), (a, x) -> greatest(a, abs(x))) AS amax
  FROM vd),
qt AS (
  SELECT vec_id, v, amax,
    list_transform(v, x -> CAST(round(x * 127e0 / amax) AS BIGINT)) AS q
  FROM am WHERE amax > 0e0)
SELECT vec_id, amax,
  CAST(list_reduce(list_prepend(CAST(0 AS BIGINT), q), (a, x) -> a + x) AS BIGINT) AS q_sum,
  CAST(len(list_filter(q, x -> abs(x) = 127)) AS BIGINT) AS n_sat,
  list_reduce(list_prepend(0e0, list_transform(range(1, 65), i ->
    (v[i] - CAST(q[i] AS DOUBLE) * amax / 127e0) * (v[i] - CAST(q[i] AS DOUBLE) * amax / 127e0))),
    (a, x) -> a + x) AS sq_err
FROM qt ORDER BY vec_id""",

    // Twin of EmbeddingOps.sourceCentroids: per-(source, dim) quantized
    // integer sums (2^20 grid, the ivf2 Lloyd convention) so the mean
    // is order-independent; generate_subscripts is 1-based → -1 aligns
    // with posexplode.
    "emb_source_centroids" ->
      """WITH j AS (
  SELECT d.source, e.embedding
  FROM embeddings e JOIN documents d ON d.doc_id = e.vec_id),
x AS (
  SELECT source,
    CAST(generate_subscripts(embedding, 1) - 1 AS INT) AS dim,
    CAST(round(CAST(unnest(embedding) AS DOUBLE) * 1048576e0) AS BIGINT) AS q
  FROM j),
a AS (
  SELECT source, dim, CAST(sum(q) AS BIGINT) AS sq,
    CAST(count(*) AS BIGINT) AS n_vecs
  FROM x GROUP BY 1, 2)
SELECT source, dim, n_vecs, sq,
  CAST(sq AS DOUBLE) / (n_vecs * 1048576e0) AS c
FROM a ORDER BY source, dim""",

    "dedup_ngram_jaccard" ->
      s"""SELECT * FROM ($jaccardPairsSql)
ORDER BY jaccard DESC, d1, d2 LIMIT 100""",

    // twin of TextOps.crossSourceDupReport: same pair truth, same 0.5
    // threshold, same (min, max) source normalization
    "dedup_cross_source" ->
      s"""WITH pairs AS ($jaccardPairsSql),
pp AS (SELECT d1, d2 FROM pairs WHERE jaccard >= 5e-1),
s AS (SELECT doc_id, source FROM documents),
j AS (SELECT least(a.source, b.source) AS src_a, greatest(a.source, b.source) AS src_b
  FROM pp JOIN s a ON pp.d1 = a.doc_id JOIN s b ON pp.d2 = b.doc_id),
g AS (SELECT src_a, src_b, CAST(count(*) AS BIGINT) AS n_pairs FROM j GROUP BY 1, 2)
SELECT src_a, src_b, n_pairs, src_a <> src_b AS cross_source,
  CAST(n_pairs AS DOUBLE) / CAST(SUM(n_pairs) OVER () AS BIGINT) AS frac
FROM g ORDER BY n_pairs DESC, src_a, src_b""",

    "dedup_clusters" ->
      s"""WITH RECURSIVE pairs AS ($jaccardPairsSql),
edges AS (SELECT d1, d2 FROM pairs WHERE jaccard >= 5e-1),
sym AS (SELECT d1, d2 FROM edges UNION ALL SELECT d2 AS d1, d1 AS d2 FROM edges),
reach(id, r) AS (
  SELECT d1, d1 FROM sym
  UNION
  SELECT s.d2, r.r FROM reach r JOIN sym s ON s.d1 = r.id)
SELECT id AS doc_id, CAST(MIN(r) AS BIGINT) AS cluster_id
FROM reach GROUP BY 1 ORDER BY 1""",

    // dedupClustersLS computes the SAME labels by a different algorithm
    // (large-star/small-star instead of propagation) — one ground truth
    // serves both, so a divergence between the two Spark paths surfaces
    // as an oracle failure on exactly one of them.
    "dedup_clusters_ls" ->
      s"""WITH RECURSIVE pairs AS ($jaccardPairsSql),
edges AS (SELECT d1, d2 FROM pairs WHERE jaccard >= 5e-1),
sym AS (SELECT d1, d2 FROM edges UNION ALL SELECT d2 AS d1, d1 AS d2 FROM edges),
reach(id, r) AS (
  SELECT d1, d1 FROM sym
  UNION
  SELECT s.d2, r.r FROM reach r JOIN sym s ON s.d1 = r.id)
SELECT id AS doc_id, CAST(MIN(r) AS BIGINT) AS cluster_id
FROM reach GROUP BY 1 ORDER BY 1""",

    // Twin of TextOps.dedupKeepBest: reach-CTE labels + the verified
    // quality twin; keeper = rank 1 of (quality desc, doc_id) per
    // cluster — quality is computed bit-identically on both sides, so
    // the comparison-based rank is deterministic.
    "dedup_keep_best" ->
      s"""WITH RECURSIVE pairs AS ($jaccardPairsSql),
edges AS (SELECT d1, d2 FROM pairs WHERE jaccard >= 5e-1),
sym AS (SELECT d1, d2 FROM edges UNION ALL SELECT d2 AS d1, d1 AS d2 FROM edges),
reach(id, r) AS (
  SELECT d1, d1 FROM sym
  UNION
  SELECT s.d2, r.r FROM reach r JOIN sym s ON s.d1 = r.id),
lab AS (SELECT id AS doc_id, CAST(MIN(r) AS BIGINT) AS root FROM reach GROUP BY 1),
q AS (SELECT doc_id, quality FROM ($qualitySql)),
cl AS (
  SELECT d.doc_id, coalesce(l.root, d.doc_id) AS cluster_id, q.quality
  FROM documents d LEFT JOIN lab l USING (doc_id) JOIN q USING (doc_id)),
r AS (
  SELECT doc_id, cluster_id, quality,
    row_number() OVER (PARTITION BY cluster_id ORDER BY quality DESC, doc_id) AS rn,
    CAST(count(*) OVER (PARTITION BY cluster_id) AS BIGINT) AS cluster_size
  FROM cl),
k AS (SELECT cluster_id, doc_id AS keeper_id FROM r WHERE rn = 1)
SELECT r.doc_id, CAST(r.cluster_id AS BIGINT) AS cluster_id, r.cluster_size,
  r.quality, k.keeper_id, r.doc_id = k.keeper_id AS keep
FROM r JOIN k USING (cluster_id) ORDER BY r.doc_id""",

    // Twin of TextOps.leakageSplit: the SAME reach-CTE component labels
    // as dedup_clusters, left-joined to the full corpus (singletons keep
    // their own doc_id), the shared 28-bit md5-prefix bucket idiom with
    // the '#sp' seed on BOTH the doc and the cluster key, cluster stats
    // re-joined at fan-out 1.
    "doc_leakage_split" ->
      s"""WITH RECURSIVE pairs AS ($jaccardPairsSql),
edges AS (SELECT d1, d2 FROM pairs WHERE jaccard >= 5e-1),
sym AS (SELECT d1, d2 FROM edges UNION ALL SELECT d2 AS d1, d1 AS d2 FROM edges),
reach(id, r) AS (
  SELECT d1, d1 FROM sym
  UNION
  SELECT s.d2, r.r FROM reach r JOIN sym s ON s.d1 = r.id),
lab AS (SELECT id AS doc_id, CAST(MIN(r) AS BIGINT) AS root FROM reach GROUP BY 1),
cl AS (
  SELECT d.doc_id, coalesce(l.root, d.doc_id) AS cluster_id
  FROM documents d LEFT JOIN lab l USING (doc_id)),
b0 AS (
  SELECT doc_id, cluster_id,
    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '#sp'), 1, 7)) AS BIGINT) % 10 AS naive_b,
    CAST(('0x' || substr(md5(CAST(cluster_id AS VARCHAR) || '#sp'), 1, 7)) AS BIGINT) % 10 AS cl_b
  FROM cl),
b AS (
  SELECT doc_id, cluster_id,
    CASE WHEN cl_b <= 7 THEN 'train' WHEN cl_b = 8 THEN 'val' ELSE 'test' END AS split,
    CASE WHEN naive_b <= 7 THEN 'train' WHEN naive_b = 8 THEN 'val' ELSE 'test' END AS naive_split
  FROM b0),
cs AS (
  -- leak counts distinct naive SPLIT NAMES, not hash buckets
  SELECT cluster_id, CAST(count(*) AS BIGINT) AS cluster_size,
    count(DISTINCT naive_split) AS n_naive
  FROM b GROUP BY 1)
SELECT b.doc_id, CAST(b.cluster_id AS BIGINT) AS cluster_id, cs.cluster_size,
  b.split, b.naive_split,
  cs.cluster_size > 1 AND cs.n_naive > 1 AS naive_leaky
FROM b JOIN cs USING (cluster_id) ORDER BY b.doc_id""",

    "emb_cosine_topk" ->
      s"""WITH e AS (
  SELECT vec_id, embedding, $dotSelfSql AS dot_self
  FROM embeddings WHERE $dotSelfSql > 0e0),
q AS (SELECT vec_id AS q_id, embedding AS qemb, dot_self AS q_dot FROM e WHERE vec_id < 5),
sims AS (
  SELECT q.q_id, e.vec_id,
    ${dotSql("q.qemb", "e.embedding")} / (sqrt(q.q_dot) * sqrt(e.dot_self)) AS sim
  FROM e, q WHERE e.vec_id <> q.q_id)
SELECT q_id, vec_id,
  CAST(row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, vec_id) AS INT) AS rn, sim
FROM sims QUALIFY rn <= 5 ORDER BY q_id, rn""",

    // Twin of EmbeddingOps.annBinary: the sign signature repeats the
    // Spark side's ascending-bit sum (bit 63 is the one negative
    // constant — DuckDB's checked `<<` cannot produce it, so it is
    // spelled as (-max - 1); the partial sums stay in range by the
    // same argument as the Spark scaladoc), Hamming is
    // bit_count(xor), the top-32 cut mirrors EmbeddingOps.BinR, and
    // the rerank cosine is the shared fold-dot convention.
    "emb_ann_binary" ->
      s"""WITH e0 AS (
  SELECT vec_id, embedding, $dotSelfSql AS dot_self
  FROM embeddings WHERE $dotSelfSql > 0e0),
e AS (SELECT vec_id, ${signSigSql("embedding")} AS sig FROM e0),
q AS (SELECT vec_id AS q_id, sig AS q_sig FROM e WHERE vec_id < 5),
ham AS (
  SELECT q.q_id, e.vec_id, CAST(bit_count(xor(e.sig, q.q_sig)) AS BIGINT) AS hamming
  FROM e, q WHERE e.vec_id <> q.q_id),
cand AS (
  SELECT q_id, vec_id, hamming,
    row_number() OVER (PARTITION BY q_id ORDER BY hamming, vec_id) AS hrn
  FROM ham),
sims AS (
  SELECT c.q_id, c.vec_id, c.hamming,
    ${dotSql("a.embedding", "b.embedding")} / (sqrt(a.dot_self) * sqrt(b.dot_self)) AS sim
  FROM cand c JOIN e0 a ON a.vec_id = c.q_id JOIN e0 b ON b.vec_id = c.vec_id
  WHERE c.hrn <= ${graft.operators.EmbeddingOps.BinR})
SELECT q_id, vec_id, hamming,
  CAST(row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, vec_id) AS INT) AS rn, sim
FROM sims QUALIFY rn <= 3 ORDER BY q_id, rn""",

    "emb_cosine_neardup" ->
      s"""WITH $lshCtes
SELECT a.vec_id AS d1, b.vec_id AS d2,
  ${dotSql("a.embedding", "b.embedding")} / (sqrt(a.dot_self) * sqrt(b.dot_self)) AS sim
FROM e a JOIN e b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
WHERE ${dotSql("a.embedding", "b.embedding")} / (sqrt(a.dot_self) * sqrt(b.dot_self)) > 2e-1
ORDER BY sim DESC, d1, d2 LIMIT 100""",

    // Twin of EmbeddingOps.semDedup: emb_ann_ivf's assignment CTEs give
    // each vector its cell; the LSH prologue gives the N-derived bucket
    // shard; the greedy order is row_number per (cell, bucket) on
    // (csim asc, vec_id); max-prior cosine comes from the rnk_b < rnk
    // self-join. τ = 0.2 mirrors EmbeddingOps.SemTau — move together.
    "emb_semdedup" ->
      s"""WITH $lshCtes,
c AS (SELECT vec_id AS c_id, embedding AS cemb, dot_self AS c_dot
  FROM e0 WHERE vec_id < 16),
scored AS (
  SELECT e.vec_id, c.c_id,
    ${dotSql("e.embedding", "c.cemb")} - 5e-1 * c.c_dot AS score
  FROM e CROSS JOIN c),
assign AS (
  SELECT vec_id, c_id,
    row_number() OVER (PARTITION BY vec_id ORDER BY score DESC, c_id) AS crn
  FROM scored),
cellv AS (SELECT vec_id, c_id AS cell FROM assign WHERE crn = 1),
m AS (
  SELECT e.vec_id, cv.cell, e.bucket, e.embedding, e.dot_self,
    ${dotSql("e.embedding", "c.cemb")} / (sqrt(e.dot_self) * sqrt(c.c_dot)) AS csim
  FROM e JOIN cellv cv USING (vec_id) JOIN c ON c.c_id = cv.cell),
rk AS (
  SELECT *, row_number() OVER (PARTITION BY cell, bucket
    ORDER BY csim, vec_id) AS rnk FROM m),
prior AS (
  SELECT a.vec_id,
    max(${dotSql("a.embedding", "b.embedding")}
        / (sqrt(a.dot_self) * sqrt(b.dot_self))) AS max_prior
  FROM rk a JOIN rk b ON b.cell = a.cell AND b.bucket = a.bucket
    AND b.rnk < a.rnk
  GROUP BY 1)
SELECT rk.cell, rk.bucket, rk.vec_id, CAST(rk.rnk AS INT) AS rnk, rk.csim,
  COALESCE(p.max_prior, -1e0) AS max_prior,
  COALESCE(p.max_prior, -1e0) < 2e-1 AS keep
FROM rk LEFT JOIN prior p USING (vec_id)
ORDER BY vec_id""",

    "dedup_minhash_lsh" -> {
      import graft.operators.MinHashOps.{P, K, Bands, RowsPerBand, hashParams}
      val gid = "(CAST('0x' || substr(md5(g), 1, 15) AS BIGINT) % " + P + ")"
      val sigElems = (0 until K).map { i =>
        val (a, b) = hashParams(i)
        s"list_min(list_transform(grams, g -> ($a * $gid + $b) % $P))"
      }.mkString("[", ", ", "]")
      val bandElems = (0 until Bands).map { b =>
        (0 until RowsPerBand).foldLeft("0") { (acc, r) =>
          s"(($acc * 1009 + sig[${b * RowsPerBand + r + 1}]) % $P)"
        }
      }.mkString("[", ", ", "]")
      s"""WITH docs AS (
  SELECT doc_id, lang, $gramsExpr AS grams FROM documents),
d2 AS (SELECT * FROM docs WHERE len(grams) > 0),
sigs AS (SELECT doc_id, lang, grams, $sigElems AS sig FROM d2),
bands AS (SELECT doc_id, lang, $bandElems AS bands FROM sigs),
e0 AS (SELECT doc_id, lang, unnest(bands) AS band_hash,
        generate_subscripts(bands, 1) AS band_idx FROM bands),
e AS (
  -- df-cut twin of TextOps.dfCut on the band buckets: a bucket shared
  -- by more than 1000 docs is dropped before pairing (no-op below the
  -- cap at test SFs). The two caps MUST move together.
  SELECT doc_id, lang, band_hash, band_idx FROM e0
  QUALIFY count(*) OVER (PARTITION BY lang, band_idx, band_hash) <= 1000),
cand AS (
  SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
  FROM e a JOIN e b ON a.lang = b.lang AND a.band_idx = b.band_idx
    AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id)
SELECT d1, d2,
  CAST(len(list_intersect(g1.grams, g2.grams)) AS BIGINT) AS common,
  CAST(len(g1.grams) AS BIGINT) AS n1,
  CAST(len(g2.grams) AS BIGINT) AS n2,
  CAST(len(list_intersect(g1.grams, g2.grams)) AS DOUBLE)
    / (len(g1.grams) + len(g2.grams) - len(list_intersect(g1.grams, g2.grams))) AS jaccard
FROM cand
JOIN d2 g1 ON g1.doc_id = d1
JOIN d2 g2 ON g2.doc_id = d2
ORDER BY jaccard DESC, d1, d2 LIMIT 50"""
    },

    // Twin of MinHashOps.incrementalNearDup: the same signature/band
    // derivation as dedup_minhash_lsh, but candidates come from a
    // corpus×batch band-bucket join (batch = md5 sample bucket < 3, the
    // doc_sample_stratified bucket expression) instead of within-bucket
    // pair generation. The df-cut applies to the CORPUS side only —
    // mirror of the Spark plan, where the batch side is the small
    // broadcastable frame. The two caps MUST move together.
    "dedup_incremental" -> {
      import graft.operators.MinHashOps.{P, K, Bands, RowsPerBand, hashParams}
      val gid = "(CAST('0x' || substr(md5(g), 1, 15) AS BIGINT) % " + P + ")"
      val sigElems = (0 until K).map { i =>
        val (a, b) = hashParams(i)
        s"list_min(list_transform(grams, g -> ($a * $gid + $b) % $P))"
      }.mkString("[", ", ", "]")
      val bandElems = (0 until Bands).map { b =>
        (0 until RowsPerBand).foldLeft("0") { (acc, r) =>
          s"(($acc * 1009 + sig[${b * RowsPerBand + r + 1}]) % $P)"
        }
      }.mkString("[", ", ", "]")
      s"""WITH docs AS (
  SELECT doc_id, lang, $gramsExpr AS grams,
    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '#g1'), 1, 7)) AS BIGINT) % 10 < 3 AS is_new
  FROM documents),
d2 AS (SELECT * FROM docs WHERE len(grams) > 0),
sigs AS (SELECT doc_id, lang, is_new, grams, $sigElems AS sig FROM d2),
bands AS (SELECT doc_id, lang, is_new, $bandElems AS bands FROM sigs),
e0 AS (SELECT doc_id, lang, is_new, unnest(bands) AS band_hash,
        generate_subscripts(bands, 1) AS band_idx FROM bands),
ec AS (
  SELECT doc_id, lang, band_hash, band_idx FROM e0 WHERE NOT is_new
  QUALIFY count(*) OVER (PARTITION BY lang, band_idx, band_hash) <= 1000),
eb AS (SELECT doc_id, lang, band_hash, band_idx FROM e0 WHERE is_new),
cand AS (
  SELECT DISTINCT c.doc_id AS d1, b.doc_id AS d2
  FROM ec c JOIN eb b ON c.lang = b.lang AND c.band_idx = b.band_idx
    AND c.band_hash = b.band_hash)
SELECT d1, d2,
  CAST(len(list_intersect(g1.grams, g2.grams)) AS BIGINT) AS common,
  CAST(len(g1.grams) AS BIGINT) AS n1,
  CAST(len(g2.grams) AS BIGINT) AS n2,
  CAST(len(list_intersect(g1.grams, g2.grams)) AS DOUBLE)
    / (len(g1.grams) + len(g2.grams) - len(list_intersect(g1.grams, g2.grams))) AS jaccard
FROM cand
JOIN d2 g1 ON g1.doc_id = d1
JOIN d2 g2 ON g2.doc_id = d2
ORDER BY jaccard DESC, d1, d2 LIMIT 50"""
    },

    "doc_simhash" ->
      s"""SELECT doc_id, CAST($simhashBitsSql AS BIGINT) AS simhash16
FROM documents ORDER BY doc_id""",

    // Twin of MinHashOps.simhashPairs on the WIDE 60-bit fingerprint:
    // one bit-sum aggregate over the exploded token hashes builds the
    // fingerprint (exact integer sums, order-independent), each doc
    // emits its 3 20-bit band values as probe keys (Hamming ≤ 2 ⇒ ≥1
    // exact band match by pigeonhole), hot (band, value) buckets df-cut
    // like every postings source, and bit_count of the xor — exact on
    // BIGINT in both engines — verifies distance ≤ 2.
    "dedup_simhash_pairs" -> {
      val bits = graft.operators.MinHashOps.SimBits
      val bands = graft.operators.MinHashOps.SimBands
      val bandWidth = bits / bands
      val sums = (0 until bits).map(b =>
        s"CAST(sum((h >> $b) & 1) AS BIGINT) AS s$b").mkString(", ")
      val fp = (0 until bits).map(b =>
        s"(CASE WHEN s$b * 2 > n THEN ${1L << b} ELSE 0 END)").mkString(" + ")
      val bandIdx = (0 until bands).map(_.toString).mkString("[", ", ", "]")
      s"""WITH tk AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents),
th AS (SELECT doc_id, CAST('0x' || substr(md5(t), 1, 15) AS BIGINT) AS h FROM tk),
v0 AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n, $sums FROM th GROUP BY 1),
s AS (SELECT doc_id, CAST($fp AS BIGINT) AS sh FROM v0),
p AS (SELECT doc_id, sh, unnest($bandIdx) AS band_idx FROM s),
pr AS (SELECT doc_id, band_idx,
  (sh >> (band_idx * $bandWidth)) & ${(1L << bandWidth) - 1L} AS probe FROM p),
e AS (
  SELECT doc_id, band_idx, probe FROM pr
  QUALIFY count(*) OVER (PARTITION BY band_idx, probe) <= 1000),
cand AS (
  SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
  FROM e a JOIN e b ON a.band_idx = b.band_idx AND a.probe = b.probe
    AND a.doc_id < b.doc_id),
v AS (
  SELECT d1, d2, s1.sh AS sh1, s2.sh AS sh2
  FROM cand JOIN s s1 ON s1.doc_id = d1 JOIN s s2 ON s2.doc_id = d2)
SELECT d1, d2, sh1, sh2, CAST(bit_count(xor(sh1, sh2)) AS BIGINT) AS hamming
FROM v WHERE bit_count(xor(sh1, sh2)) <= 2 ORDER BY hamming, d1, d2 LIMIT 100"""
    },

    "emb_ann_lsh" ->
      s"""WITH $lshCtes,
q AS (SELECT vec_id AS q_id, embedding AS qemb, dot_self AS q_dot, bucket FROM e WHERE vec_id < 5),
sims AS (
  SELECT q.q_id, e.bucket, e.vec_id,
    ${dotSql("q.qemb", "e.embedding")} / (sqrt(q.q_dot) * sqrt(e.dot_self)) AS sim
  FROM e JOIN q ON e.bucket = q.bucket AND e.vec_id <> q.q_id)
SELECT q_id, bucket, vec_id,
  CAST(row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, vec_id) AS INT) AS rn, sim
FROM sims QUALIFY rn <= 3 ORDER BY q_id, rn""",

    "emb_ann_ivf" ->
      s"""WITH e AS (
  SELECT vec_id, embedding, $dotSelfSql AS dot_self
  FROM embeddings WHERE $dotSelfSql > 0e0),
c AS (SELECT vec_id AS c_id, embedding AS cemb, dot_self AS c_dot FROM e WHERE vec_id < 16),
scored AS (
  SELECT e.vec_id, c.c_id,
    ${dotSql("e.embedding", "c.cemb")} - 5e-1 * c.c_dot AS score
  FROM e CROSS JOIN c),
assign AS (
  SELECT vec_id, c_id,
    row_number() OVER (PARTITION BY vec_id ORDER BY score DESC, c_id) AS crn
  FROM scored),
cell AS (SELECT vec_id, c_id AS cell FROM assign WHERE crn = 1),
qprobe AS (SELECT vec_id AS q_id, c_id AS probe FROM assign WHERE vec_id < 5 AND crn <= 2),
sims AS (
  SELECT q.q_id, ce.cell, ce.vec_id,
    ${dotSql("a.embedding", "b.embedding")} / (sqrt(a.dot_self) * sqrt(b.dot_self)) AS sim
  FROM qprobe q
  JOIN cell ce ON ce.cell = q.probe AND ce.vec_id <> q.q_id
  JOIN e a ON a.vec_id = q.q_id
  JOIN e b ON b.vec_id = ce.vec_id)
SELECT q_id, cell, vec_id,
  CAST(row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, vec_id) AS INT) AS rn, sim
FROM sims QUALIFY rn <= 3 ORDER BY q_id, rn""",

    // Twin of EmbeddingOps.annIvfRefined: one Lloyd step with the
    // refinement mean computed INTEGER-EXACT (round(x·2^20) as BIGINT,
    // order-independent integer sums, one fixed-order division) so both
    // engines land on bit-identical refined centroids; empty cells keep
    // their init centroid. c_dot re-derives via the same left fold the
    // Spark side performs driver-side.
    "emb_ann_ivf2" ->
      s"""WITH e AS (
  SELECT vec_id, embedding, $dotSelfSql AS dot_self
  FROM embeddings WHERE $dotSelfSql > 0e0),
c0 AS (SELECT vec_id AS c_id, embedding AS cemb, dot_self AS c_dot FROM e WHERE vec_id < 16),
scored0 AS (
  SELECT e.vec_id, c.c_id,
    ${dotSql("e.embedding", "c.cemb")} - 5e-1 * c.c_dot AS score
  FROM e CROSS JOIN c0 c),
assign0 AS (
  SELECT vec_id, c_id,
    row_number() OVER (PARTITION BY vec_id ORDER BY score DESC, c_id) AS crn
  FROM scored0),
cell0 AS (SELECT vec_id, c_id AS cell FROM assign0 WHERE crn = 1),
dims AS (
  SELECT cell,
    generate_subscripts(e.embedding, 1) AS dim,
    CAST(round(CAST(unnest(e.embedding) AS DOUBLE) * 1048576e0) AS BIGINT) AS q
  FROM cell0 JOIN e USING (vec_id)),
cm AS (
  SELECT cell, dim, CAST(sum(q) AS BIGINT) AS sq, CAST(count(*) AS BIGINT) AS n
  FROM dims GROUP BY 1, 2),
c1m AS (
  SELECT cell, list(CAST(sq AS DOUBLE) / (n * 1048576e0) ORDER BY dim) AS cemb
  FROM cm GROUP BY 1),
c1 AS (
  SELECT c0.c_id,
    COALESCE(c1m.cemb, list_transform(c0.cemb, x -> CAST(x AS DOUBLE))) AS cemb
  FROM c0 LEFT JOIN c1m ON c1m.cell = c0.c_id),
c1d AS (
  SELECT c_id, cemb,
    list_reduce(list_transform(range(1, 65), i -> cemb[i] * cemb[i]), (x, y) -> x + y) AS c_dot
  FROM c1),
scored1 AS (
  SELECT e.vec_id, c.c_id,
    ${dotSql("e.embedding", "c.cemb")} - 5e-1 * c.c_dot AS score
  FROM e CROSS JOIN c1d c),
assign1 AS (
  SELECT vec_id, c_id,
    row_number() OVER (PARTITION BY vec_id ORDER BY score DESC, c_id) AS crn
  FROM scored1),
cell AS (SELECT vec_id, c_id AS cell FROM assign1 WHERE crn = 1),
qprobe AS (SELECT vec_id AS q_id, c_id AS probe FROM assign1 WHERE vec_id < 5 AND crn <= 2),
sims AS (
  SELECT q.q_id, ce.cell, ce.vec_id,
    ${dotSql("a.embedding", "b.embedding")} / (sqrt(a.dot_self) * sqrt(b.dot_self)) AS sim
  FROM qprobe q
  JOIN cell ce ON ce.cell = q.probe AND ce.vec_id <> q.q_id
  JOIN e a ON a.vec_id = q.q_id
  JOIN e b ON b.vec_id = ce.vec_id)
SELECT q_id, cell, vec_id,
  CAST(row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, vec_id) AS INT) AS rn, sim
FROM sims QUALIFY rn <= 3 ORDER BY q_id, rn""",

    // Twin of EmbeddingOps.annPq: codebooks = subvector slices of the
    // first 16 vectors; code = argmax(dot − ‖c‖²/2) per subspace with
    // ties to the lowest k (the IvfAssignTop2 kernel, score DESC / k
    // ASC); ADC = per-subspace (x−c)² left folds quantized to the 2^20
    // grid and summed as order-independent BIGINTs, one double division
    // at render. The 8×8×16 geometry mirrors PqM/PqSub/PqK literally.
    "emb_ann_pq" ->
      s"""WITH m8 AS (SELECT unnest(generate_series(0, 7)) AS m),
sub AS (
  SELECT vec_id, m, list_slice(embedding, m * 8 + 1, m * 8 + 8) AS vm
  FROM embeddings, m8),
cb AS (
  SELECT vec_id AS k, m, list_slice(embedding, m * 8 + 1, m * 8 + 8) AS ck
  FROM embeddings, m8 WHERE vec_id < 16),
cbd AS (SELECT k, m, ck, ${dot8Sql("ck", "ck")} AS c_dot FROM cb),
scored AS (
  SELECT s.vec_id, s.m, c.k,
    ${dot8Sql("s.vm", "c.ck")} - 5e-1 * c.c_dot AS score
  FROM sub s JOIN cbd c ON c.m = s.m),
codes AS (
  SELECT vec_id, m, k AS code FROM (
    SELECT vec_id, m, k,
      row_number() OVER (PARTITION BY vec_id, m ORDER BY score DESC, k) AS crn
    FROM scored) WHERE crn = 1),
q AS (SELECT vec_id AS q_id, m, vm AS qm FROM sub WHERE vec_id < 5),
parts AS (
  SELECT q.q_id, c.vec_id,
    CAST(round(${l28Sql("q.qm", "b.ck")} * 1048576e0) AS BIGINT) AS d2u
  FROM q JOIN codes c ON c.m = q.m AND c.vec_id <> q.q_id
  JOIN cbd b ON b.m = q.m AND b.k = c.code),
adc AS (
  SELECT q_id, vec_id, CAST(sum(d2u) AS BIGINT) AS adc_units
  FROM parts GROUP BY 1, 2)
SELECT q_id, vec_id,
  CAST(row_number() OVER (PARTITION BY q_id ORDER BY adc_units, vec_id) AS INT) AS rn,
  adc_units / 1048576e0 AS adc
FROM adc QUALIFY rn <= 3 ORDER BY q_id, rn""",

    // Twin of EmbeddingOps.annPqRefined: seed-book encode (emb_ann_pq's
    // CTEs), then ONE Lloyd step per codebook with the refinement mean
    // INTEGER-EXACT on the 2^20 grid (the emb_ann_ivf2 convention:
    // order-independent BIGINT sums per (subspace, code, dim), one
    // fixed-order division) — both engines land on bit-identical
    // refined codebooks; empty codes keep their seed slice. Re-encode
    // and ADC repeat the flat-PQ tokens against the refined books.
    "emb_ann_pq2" ->
      s"""WITH m8 AS (SELECT unnest(generate_series(0, 7)) AS m),
sub AS (
  SELECT vec_id, m, list_slice(embedding, m * 8 + 1, m * 8 + 8) AS vm
  FROM embeddings, m8),
cb AS (
  SELECT vec_id AS k, m, list_slice(embedding, m * 8 + 1, m * 8 + 8) AS ck
  FROM embeddings, m8 WHERE vec_id < 16),
cbd AS (SELECT k, m, ck, ${dot8Sql("ck", "ck")} AS c_dot FROM cb),
scored0 AS (
  SELECT s.vec_id, s.m, c.k,
    ${dot8Sql("s.vm", "c.ck")} - 5e-1 * c.c_dot AS score
  FROM sub s JOIN cbd c ON c.m = s.m),
codes0 AS (
  SELECT vec_id, m, k AS code FROM (
    SELECT vec_id, m, k,
      row_number() OVER (PARTITION BY vec_id, m ORDER BY score DESC, k) AS crn
    FROM scored0) WHERE crn = 1),
dims AS (
  SELECT c.m, c.code, generate_subscripts(s.vm, 1) AS dim,
    CAST(round(CAST(unnest(s.vm) AS DOUBLE) * 1048576e0) AS BIGINT) AS q
  FROM codes0 c JOIN sub s ON s.vec_id = c.vec_id AND s.m = c.m),
cm AS (
  SELECT m, code, dim, CAST(sum(q) AS BIGINT) AS sq,
    CAST(count(*) AS BIGINT) AS n
  FROM dims GROUP BY 1, 2, 3),
c1m AS (
  SELECT m, code, list(CAST(sq AS DOUBLE) / (n * 1048576e0) ORDER BY dim) AS ck
  FROM cm GROUP BY 1, 2),
c1 AS (
  SELECT b.k, b.m,
    COALESCE(c1m.ck, list_transform(b.ck, x -> CAST(x AS DOUBLE))) AS ck
  FROM cbd b LEFT JOIN c1m ON c1m.m = b.m AND c1m.code = b.k),
c1d AS (SELECT k, m, ck, ${dot8Sql("ck", "ck")} AS c_dot FROM c1),
scored1 AS (
  SELECT s.vec_id, s.m, c.k,
    ${dot8Sql("s.vm", "c.ck")} - 5e-1 * c.c_dot AS score
  FROM sub s JOIN c1d c ON c.m = s.m),
codes1 AS (
  SELECT vec_id, m, k AS code FROM (
    SELECT vec_id, m, k,
      row_number() OVER (PARTITION BY vec_id, m ORDER BY score DESC, k) AS crn
    FROM scored1) WHERE crn = 1),
q AS (SELECT vec_id AS q_id, m, vm AS qm FROM sub WHERE vec_id < 5),
parts AS (
  SELECT q.q_id, c.vec_id,
    CAST(round(${l28Sql("q.qm", "b.ck")} * 1048576e0) AS BIGINT) AS d2u
  FROM q JOIN codes1 c ON c.m = q.m AND c.vec_id <> q.q_id
  JOIN c1d b ON b.m = q.m AND b.k = c.code),
adc AS (
  SELECT q_id, vec_id, CAST(sum(d2u) AS BIGINT) AS adc_units
  FROM parts GROUP BY 1, 2)
SELECT q_id, vec_id,
  CAST(row_number() OVER (PARTITION BY q_id ORDER BY adc_units, vec_id) AS INT) AS rn,
  adc_units / 1048576e0 AS adc
FROM adc QUALIFY rn <= 3 ORDER BY q_id, rn""",

    // Twin of EmbeddingOps.annIvfPq: emb_ann_ivf's coarse-cell CTEs
    // (minus the norm filter — PQ indexes every vector, c_dot from the
    // same 64-dim fold) composed with emb_ann_pq's codebook/code/ADC
    // CTEs, candidates restricted to the query's two probed cells.
    "emb_ann_ivfpq" ->
      s"""WITH m8 AS (SELECT unnest(generate_series(0, 7)) AS m),
sub AS (
  SELECT vec_id, m, list_slice(embedding, m * 8 + 1, m * 8 + 8) AS vm
  FROM embeddings, m8),
cb AS (
  SELECT vec_id AS k, m, list_slice(embedding, m * 8 + 1, m * 8 + 8) AS ck
  FROM embeddings, m8 WHERE vec_id < 16),
cbd AS (SELECT k, m, ck, ${dot8Sql("ck", "ck")} AS c_dot FROM cb),
scoredpq AS (
  SELECT s.vec_id, s.m, c.k,
    ${dot8Sql("s.vm", "c.ck")} - 5e-1 * c.c_dot AS score
  FROM sub s JOIN cbd c ON c.m = s.m),
codes AS (
  SELECT vec_id, m, k AS code FROM (
    SELECT vec_id, m, k,
      row_number() OVER (PARTITION BY vec_id, m ORDER BY score DESC, k) AS crn
    FROM scoredpq) WHERE crn = 1),
ce AS (
  SELECT vec_id AS c_id, embedding AS cemb, $dotSelfSql AS c_dot
  FROM embeddings WHERE vec_id < 16),
scoredc AS (
  SELECT e.vec_id, c.c_id,
    ${dotSql("e.embedding", "c.cemb")} - 5e-1 * c.c_dot AS score
  FROM embeddings e CROSS JOIN ce c),
assignc AS (
  SELECT vec_id, c_id,
    row_number() OVER (PARTITION BY vec_id ORDER BY score DESC, c_id) AS crn
  FROM scoredc),
cell AS (SELECT vec_id, c_id AS cell FROM assignc WHERE crn = 1),
qprobe AS (SELECT vec_id AS q_id, c_id AS probe FROM assignc WHERE vec_id < 5 AND crn <= 2),
qm AS (SELECT vec_id AS q_id, m, vm FROM sub WHERE vec_id < 5),
cand AS (
  SELECT q.q_id, ce2.vec_id, ce2.cell
  FROM qprobe q JOIN cell ce2 ON ce2.cell = q.probe AND ce2.vec_id <> q.q_id),
parts AS (
  SELECT c.q_id, c.vec_id, c.cell,
    CAST(round(${l28Sql("qm.vm", "b.ck")} * 1048576e0) AS BIGINT) AS d2u
  FROM cand c
  JOIN qm ON qm.q_id = c.q_id
  JOIN codes co ON co.vec_id = c.vec_id AND co.m = qm.m
  JOIN cbd b ON b.m = qm.m AND b.k = co.code),
adc AS (
  SELECT q_id, cell, vec_id, CAST(sum(d2u) AS BIGINT) AS adc_units
  FROM parts GROUP BY 1, 2, 3)
SELECT q_id, cell, vec_id,
  CAST(row_number() OVER (PARTITION BY q_id ORDER BY adc_units, vec_id) AS INT) AS rn,
  adc_units / 1048576e0 AS adc
FROM adc QUALIFY rn <= 3 ORDER BY q_id, rn""",

    "mm_media_meta" ->
      """SELECT doc_id,
  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
  CAST(octet_length(encode(text)) // 256 AS BIGINT) + 1 AS n_frames,
  CAST(octet_length(encode(text)) % 7 AS BIGINT) AS feature0,
  md5(text) AS fingerprint
FROM documents ORDER BY doc_id""",

    "mm_frame_sample" ->
      """WITH d AS (
  SELECT doc_id, text, CAST(length(text) AS BIGINT) AS n_bytes FROM documents),
f AS (
  SELECT doc_id, text,
    unnest(generate_series(0, (n_bytes - 1) // 64, 2)) AS frame_idx
  FROM d)
SELECT doc_id, CAST(frame_idx AS BIGINT) AS frame_idx,
  CAST(length(substr(text, CAST(1 + 64 * frame_idx AS INT), 64)) AS BIGINT) AS frame_bytes,
  md5(substr(text, CAST(1 + 64 * frame_idx AS INT), 64)) AS frame_md5
FROM f ORDER BY doc_id, frame_idx""",

    "mm_resize" ->
      """SELECT doc_id,
  CAST(length(text) AS BIGINT) AS n_bytes,
  CAST(length(substr(text, 1, 128)) AS BIGINT) AS resized_bytes,
  md5(substr(text, 1, 128)) AS resized_md5
FROM documents ORDER BY doc_id"""
  )

  /** non-distinct trigram list — twin of TextOps.wordTrigramsAll */
  private val gramsAllExpr: String =
    s"""CASE WHEN len($tokensExpr) < 3 THEN [] ELSE
      list_transform(range(1, len($tokensExpr) - 1),
        i -> $tokensExpr[i] || ' ' || $tokensExpr[i+1] || ' ' || $tokensExpr[i+2]) END"""

  /** Composed queries REUSE the verified base SQL as subqueries, so the
    * curation decision's twin is built from the same text as the four
    * signal twins it joins — one definition per signal, no drift. */
  val sql: Map[String, String] = sqlBase ++ Map(

    "doc_repetition" ->
      s"""WITH g AS (
  SELECT doc_id, unnest($gramsAllExpr) AS gram FROM documents),
c AS (SELECT doc_id, gram, CAST(count(*) AS BIGINT) AS cnt FROM g GROUP BY 1, 2),
a AS (
  SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS total_grams,
    CAST(count(*) AS BIGINT) AS distinct_grams,
    CAST(max(cnt) AS BIGINT) AS top_gram_cnt
  FROM c GROUP BY 1)
SELECT doc_id, total_grams, distinct_grams, top_gram_cnt,
  1e0 - CAST(distinct_grams AS DOUBLE) / total_grams AS dup_ratio,
  CAST(top_gram_cnt AS DOUBLE) / total_grams AS top_gram_frac
FROM a ORDER BY doc_id""",

    // Twin of TextOps.spanDedup: chunk derivation repeated from
    // doc_chunk's verified SQL, span stats per chunk_md5 (exact
    // count-distinct + min-keeper), cross-doc-only counting.
    "doc_span_dedup" -> spanDedupSql,

    // Twin of TextOps.substringDedup: positional 8-gram 60-bit
    // md5-prefix hashes (the fp64 idiom), cross-doc duplication as
    // min(doc_id)<>max(doc_id) per hash group, islands via the
    // lag/running-sum gaps-and-islands over duplicated positions
    // (break at gap > 8), island coverage p1-p0+8. Parallel unnests
    // zip the position and hash lists exactly like the Spark
    // posexplode.
    "doc_substring_dedup" -> substringSql,

    // Twin of TextOps.substringStrip — ExactSubstr's REMOVAL side:
    // the SAME positional-gram CTE prefix as substringSql (shared via
    // substrPosCtes so the two cannot drift), but the duplicated set
    // uses the LOWER-id-peer convention (keep-first-occurrence:
    // min-holder keeps its copy; min!=max would delete both), islands
    // merge as in the report, and the kept tokens reassemble by an
    // index anti-join + ordered list aggregate.
    "doc_substring_strip" ->
      s"""WITH $substrPosCtes,
mnh AS (SELECT h, min(doc_id) AS mn FROM p GROUP BY h),
dp AS (SELECT p.doc_id, p.pos FROM p JOIN mnh USING (h)
  WHERE p.doc_id > mnh.mn),
isl AS (
  SELECT doc_id, pos,
    CASE WHEN lag(pos) OVER w IS NULL OR pos - lag(pos) OVER w > 8
      THEN 1 ELSE 0 END AS brk
  FROM dp WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
isl2 AS (
  SELECT doc_id, pos,
    SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
  FROM isl),
sp AS (SELECT doc_id, island, MIN(pos) AS a, MAX(pos) + 7 AS b
  FROM isl2 GROUP BY 1, 2),
tok AS (SELECT doc_id, unnest(toks) AS tk,
    CAST(generate_subscripts(toks, 1) - 1 AS BIGINT) AS i FROM t),
kept AS (
  SELECT tok.doc_id, tok.tk, tok.i
  FROM tok LEFT JOIN sp ON sp.doc_id = tok.doc_id
    AND tok.i >= sp.a AND tok.i <= sp.b
  WHERE sp.doc_id IS NULL),
ka AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS kept_tokens,
    array_to_string(list(tk ORDER BY i), ' ') AS stripped
  FROM kept GROUP BY 1)
SELECT t.doc_id, t.n_tokens,
  CAST(t.n_tokens - coalesce(ka.kept_tokens, 0) AS BIGINT) AS removed_tokens,
  CAST(coalesce(ka.kept_tokens, 0) AS BIGINT) AS kept_tokens,
  coalesce(ka.stripped, '') AS stripped
FROM t LEFT JOIN ka USING (doc_id) ORDER BY t.doc_id""",

    // Twin of TextOps.lengthHistogram: bucket = bit length − 1 (both
    // engines' bin() emits no leading zeros — no floating log), bounds
    // via checked shifts on small exponents, share per source.
    "doc_length_histogram" ->
      s"""WITH d AS (
  SELECT source, CAST(len($tokensExpr) AS BIGINT) AS n_tokens FROM documents),
h AS (
  SELECT source, CAST(length(bin(n_tokens)) - 1 AS BIGINT) AS bucket,
    CAST(count(*) AS BIGINT) AS n_docs
  FROM d GROUP BY 1, 2)
SELECT source, bucket,
  CAST((CAST(1 AS BIGINT) << bucket) AS BIGINT) AS lo,
  CAST((CAST(1 AS BIGINT) << (bucket + 1)) - 1 AS BIGINT) AS hi,
  n_docs,
  CAST(n_docs AS DOUBLE) / CAST(SUM(n_docs) OVER (PARTITION BY source) AS BIGINT) AS share
FROM h ORDER BY source, bucket""",

    // Twin of TextOps.corpusReport: the three signal twins (quality,
    // gopher, substring-dedup) re-used as subqueries — shared verified
    // SQL, aggregated per source; integer sums throughout, two final
    // divisions, token_share's denominator a window total of BIGINTs.
    "corpus_report" ->
      s"""WITH q AS (SELECT doc_id, n_tokens, quality FROM ($qualitySql)),
g AS (SELECT doc_id, gopher_pass FROM ($gopherSql)),
sd AS (SELECT doc_id, dup_tokens FROM ($substringSql)),
j AS (
  SELECT d.source, d.lang, q.n_tokens, q.quality, g.gopher_pass, sd.dup_tokens
  FROM documents d JOIN q USING (doc_id) JOIN g USING (doc_id)
  JOIN sd USING (doc_id)),
a AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
    CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
    CAST(SUM(dup_tokens) AS BIGINT) AS dup_tokens,
    CAST(SUM(CASE WHEN quality >= 5e-1 THEN 1 ELSE 0 END) AS BIGINT) AS n_quality,
    CAST(SUM(CASE WHEN gopher_pass THEN 1 ELSE 0 END) AS BIGINT) AS n_gopher,
    CAST(count(DISTINCT lang) AS BIGINT) AS n_langs
  FROM j GROUP BY 1)
SELECT source, n_docs, n_tokens, dup_tokens,
  CAST(dup_tokens AS DOUBLE) / n_tokens AS dup_frac,
  n_quality, n_gopher, n_langs,
  CAST(n_tokens AS DOUBLE) / CAST(SUM(n_tokens) OVER () AS BIGINT) AS token_share
FROM a ORDER BY source""",


    // Twin of TextOps.gopherRules: mean word length from len(text)
    // (single-space-joined corpus: chars = Σlen + (n-1) separators),
    // per-word regexp/stop-set counts over the token list, thresholds
    // repeated literally.
    "doc_gopher_rules" -> gopherSql,

    // Twin of streaming.IngestPipeline.cascade — the COMPOSED ingest
    // re-derived end to end in SQL under the same empty-store
    // semantics: whitespace normalization, the gopher gate (shared
    // gopherSqlFrom over the normalized text), PII redaction in
    // PiiPatterns order (interpolated from the one definition), the
    // exact-fingerprint keeper (lowest doc_id per md5 of the redacted
    // text), the minhash band screen over exact survivors (sig/band
    // constants shared with dedup_minhash_lsh, df-cut cap mirrored,
    // exact-Jaccard >= 0.5 = NearDupIngest.Threshold, the HIGHER id of
    // every verified pair rejected regardless of the lower peer's own
    // admission), and the positional 8-gram substring screen over near
    // survivors (lower-id-peer convention — NOT substringSql's
    // symmetric min!=max — islands with gap > 8, reject iff
    // 2*dup_tokens > n_tokens). Each screen sees only the previous
    // screen's survivors; the CASE settles each doc at its first
    // rejecting stage.
    "doc_ingest_cascade" -> {
      import graft.operators.MinHashOps.{P, K, Bands, RowsPerBand, hashParams}
      val Seq(em, ph, ip, id9) = graft.operators.TextOps.PiiPatterns.map(_._2)
      val gid = "(CAST('0x' || substr(md5(g), 1, 15) AS BIGINT) % " + P + ")"
      val sigElems = (0 until K).map { i =>
        val (a, b) = hashParams(i)
        s"list_min(list_transform(grams, g -> ($a * $gid + $b) % $P))"
      }.mkString("[", ", ", "]")
      val bandElems = (0 until Bands).map { b =>
        (0 until RowsPerBand).foldLeft("0") { (acc, r) =>
          s"(($acc * 1009 + sig[${b * RowsPerBand + r + 1}]) % $P)"
        }
      }.mkString("[", ", ", "]")
      s"""WITH nrm AS (
  SELECT doc_id, lang, trim(regexp_replace(text, '\\s+', ' ', 'g')) AS text
  FROM documents),
gp AS (SELECT doc_id FROM (${gopherSqlFrom("nrm")}) WHERE gopher_pass),
red AS (
  SELECT n.doc_id, n.lang,
    regexp_replace(regexp_replace(regexp_replace(regexp_replace(
      n.text, '$em', '<EMAIL>', 'g'), '$ph', '<PHONE>', 'g'),
      '$ip', '<IP>', 'g'), '$id9', '<ID>', 'g') AS text
  FROM nrm n JOIN gp USING (doc_id)),
ek AS (
  SELECT doc_id, lang, text,
    row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
  FROM red),
k1 AS (SELECT doc_id, lang, text FROM ek WHERE rn = 1),
dg AS (SELECT doc_id, lang, $gramsExpr AS grams FROM k1),
d2 AS (SELECT * FROM dg WHERE len(grams) > 0),
sigs AS (SELECT doc_id, lang, grams, $sigElems AS sig FROM d2),
bands AS (SELECT doc_id, lang, $bandElems AS bands FROM sigs),
e0 AS (SELECT doc_id, lang, unnest(bands) AS band_hash,
        generate_subscripts(bands, 1) AS band_idx FROM bands),
e AS (
  -- df-cut twin (TextOps.dfCut; the two caps MUST move together)
  SELECT doc_id, lang, band_hash, band_idx FROM e0
  QUALIFY count(*) OVER (PARTITION BY lang, band_idx, band_hash) <= 1000),
cand AS (
  SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
  FROM e a JOIN e b ON a.lang = b.lang AND a.band_idx = b.band_idx
    AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id),
nrj AS (
  SELECT DISTINCT c.d2 AS doc_id FROM cand c
  JOIN d2 g1 ON g1.doc_id = c.d1 JOIN d2 g2 ON g2.doc_id = c.d2
  WHERE CAST(len(list_intersect(g1.grams, g2.grams)) AS DOUBLE)
    / (len(g1.grams) + len(g2.grams) - len(list_intersect(g1.grams, g2.grams))) >= 5e-1),
ns AS (SELECT k1.doc_id, k1.text FROM k1 LEFT JOIN nrj USING (doc_id)
  WHERE nrj.doc_id IS NULL),
st AS (
  SELECT doc_id, $tokensExpr AS toks,
    CAST(len($tokensExpr) AS BIGINT) AS n_tokens
  FROM ns),
st2 AS (SELECT doc_id, toks, n_tokens,
  CAST(greatest(n_tokens - 7, 0) AS BIGINT) AS n_grams FROM st),
sp0 AS (
  SELECT doc_id, n_grams,
    list_transform(range(1, CAST(n_grams AS INT) + 1),
      i -> CAST(('0x' || substr(md5(array_to_string(list_slice(toks, i, i + 7), ' ')), 1, 15)) AS BIGINT)) AS hs
  FROM st2),
sp1 AS (SELECT doc_id, unnest(range(1, CAST(n_grams AS INT) + 1)) AS i,
  unnest(hs) AS h FROM sp0),
sp AS (SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos, h FROM sp1),
smin AS (SELECT h, min(doc_id) AS mn FROM sp GROUP BY h),
sdp AS (SELECT sp.doc_id, sp.pos FROM sp JOIN smin USING (h)
  WHERE sp.doc_id > smin.mn),
sisl AS (
  SELECT doc_id, pos,
    CASE WHEN lag(pos) OVER w IS NULL OR pos - lag(pos) OVER w > 8
      THEN 1 ELSE 0 END AS brk
  FROM sdp WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
sisl2 AS (
  SELECT doc_id, pos,
    SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
  FROM sisl),
ssp AS (SELECT doc_id, island, MIN(pos) AS p0, MAX(pos) AS p1
  FROM sisl2 GROUP BY 1, 2),
sd AS (SELECT doc_id, CAST(SUM(p1 - p0 + 8) AS BIGINT) AS dup_tokens
  FROM ssp GROUP BY 1),
srj AS (
  SELECT st.doc_id FROM st JOIN sd USING (doc_id)
  WHERE sd.dup_tokens * 2 > st.n_tokens)
SELECT d.doc_id,
  CASE WHEN ek.doc_id IS NULL THEN 'gate'
       WHEN ek.rn > 1 THEN 'exact'
       WHEN nrj.doc_id IS NOT NULL THEN 'near'
       WHEN srj.doc_id IS NOT NULL THEN 'substr'
       ELSE 'admitted' END AS stage
FROM documents d
LEFT JOIN ek ON ek.doc_id = d.doc_id
LEFT JOIN nrj ON nrj.doc_id = d.doc_id
LEFT JOIN srj ON srj.doc_id = d.doc_id
ORDER BY d.doc_id"""
    },

    // Twin of TextOps.mixSample: alpha=0.5 temperature mixture with the
    // sqrt quantized to the 2^20 integer grid so the denominator is an
    // order-independent INTEGER sum; one fixed-order division per
    // source; md5 bucket repeated verbatim.
    "doc_mix_sample" -> mixSampleSql,

    // Twin of TextOps.tokenBudget: the oracle runs the NAIVE one-level
    // form — one cumulative window per source ordered by (coarse
    // bucket, hash, doc_id), keep while the running token total fits
    // the share. The Spark face decomposes the same prefix two-level
    // (bucket cut + boundary-bucket window) for scale; TokenBudgetSpec
    // pins the two forms identical, so this twin checks both. Shares
    // are BIGINT end to end: q = round(sqrt(src_tokens)*2^20),
    // share = ((all_tokens // 4) * q) // sum_q.
    "doc_token_budget" ->
      s"""WITH d AS (
  SELECT doc_id, source,
    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '#tb'), 1, 7))
      AS BIGINT) AS h
  FROM documents),
s AS (SELECT source, CAST(sum(n_tokens) AS BIGINT) AS src_tokens
  FROM d GROUP BY 1),
q AS (SELECT source, src_tokens,
    CAST(round(sqrt(CAST(src_tokens AS DOUBLE)) * 1048576e0) AS BIGINT) AS q
  FROM s),
t AS (SELECT CAST(sum(q) AS BIGINT) AS sum_q,
  CAST(sum(src_tokens) AS BIGINT) AS all_tokens FROM q),
r AS (SELECT source,
    CAST((CAST(all_tokens // 4 AS HUGEINT) * q) // sum_q AS BIGINT)
      AS src_share
  FROM q, t),
c AS (
  SELECT d.doc_id, d.source, d.n_tokens, r.src_share,
    CAST(sum(n_tokens) OVER (PARTITION BY d.source
      ORDER BY h % 4096, h, doc_id ROWS UNBOUNDED PRECEDING) AS BIGINT)
      AS cum
  FROM d JOIN r USING (source))
SELECT doc_id, source, n_tokens, src_share
FROM c WHERE cum <= src_share ORDER BY doc_id""",

    // Twin of TextOps.trainingSet: the composed corpus release —
    // every gate's verified SQL reused as a subquery (the curateSql
    // pattern), conjunction repeated literally.
    "doc_training_set" ->
      s"""WITH c AS (SELECT doc_id, keep FROM ($curateSql)),
g AS (SELECT doc_id, gopher_pass FROM ($gopherSql)),
sp AS (SELECT doc_id, dup_frac FROM ($spanDedupSql)),
m AS (SELECT doc_id FROM ($mixSampleSql))
SELECT d.doc_id, d.source, c.keep AS curate_keep, g.gopher_pass,
  sp.dup_frac AS span_dup_frac, m.doc_id IS NOT NULL AS in_mix,
  c.keep AND g.gopher_pass AND sp.dup_frac <= 5e-1
    AND m.doc_id IS NOT NULL AS selected
FROM documents d JOIN c USING (doc_id) JOIN g USING (doc_id)
JOIN sp USING (doc_id) LEFT JOIN m ON m.doc_id = d.doc_id
ORDER BY d.doc_id""",

    "dedup_normalized" ->
      s"""WITH n AS (
  SELECT doc_id,
    trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
      ' +', ' ', 'g')) AS norm
  FROM documents),
s AS (SELECT doc_id, md5(norm) AS norm_fp,
    CAST(length(norm) AS BIGINT) AS n_chars_norm FROM n)
SELECT doc_id, norm_fp, n_chars_norm,
  CAST(min(doc_id) OVER (PARTITION BY norm_fp) AS BIGINT) AS keeper_id,
  doc_id <> min(doc_id) OVER (PARTITION BY norm_fp) AS is_dup
FROM s ORDER BY doc_id""",

    "doc_curate" -> curateSql,

    // Curation-gated cosine top-k — twin of EmbeddingOps.curatedTopK:
    // emb_cosine_topk's exact SQL with the candidate (and query) set
    // restricted to doc_curate's keepers on the shared doc identity.
    "emb_curated_topk" ->
      s"""WITH kept AS (SELECT doc_id FROM ($curateSql) WHERE keep),
e AS (
  SELECT vec_id, embedding, $dotSelfSql AS dot_self
  FROM embeddings WHERE $dotSelfSql > 0e0
    AND vec_id IN (SELECT doc_id FROM kept)),
q AS (SELECT vec_id AS q_id, embedding AS qemb, dot_self AS q_dot
  FROM e ORDER BY vec_id LIMIT 5),
sims AS (
  SELECT q.q_id, e.vec_id,
    ${dotSql("q.qemb", "e.embedding")} / (sqrt(q.q_dot) * sqrt(e.dot_self)) AS sim
  FROM e, q WHERE e.vec_id <> q.q_id)
SELECT q_id, vec_id,
  CAST(row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, vec_id) AS INT) AS rn, sim
FROM sims QUALIFY rn <= 5 ORDER BY q_id, rn""")

  /** Shared positional-gram CTE prefix (t, t2, p0, p1, p) — the ONE
    * derivation the substring REPORT and STRIP twins both build on,
    * so an edit to the gram convention (hash width, K, tokenizer)
    * moves them together. */
  private lazy val substrPosCtes: String =
    s"""t AS (
  SELECT doc_id, $tokensExpr AS toks,
    CAST(len($tokensExpr) AS BIGINT) AS n_tokens
  FROM documents),
t2 AS (
  SELECT doc_id, toks, n_tokens,
    CAST(greatest(n_tokens - 7, 0) AS BIGINT) AS n_grams
  FROM t),
p0 AS (
  SELECT doc_id, n_grams,
    list_transform(range(1, CAST(n_grams AS INT) + 1),
      i -> CAST(('0x' || substr(md5(array_to_string(list_slice(toks, i, i + 7), ' ')), 1, 15)) AS BIGINT)) AS hs
  FROM t2),
p1 AS (
  SELECT doc_id,
    unnest(range(1, CAST(n_grams AS INT) + 1)) AS i,
    unnest(hs) AS h
  FROM p0),
p AS (SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos, h FROM p1)"""

  /** twin of TextOps.substringDedup — shared by doc_substring_dedup
    * and the corpus_report rollup */
  private lazy val substringSql: String =
      s"""WITH $substrPosCtes,
dh AS (SELECT h FROM p GROUP BY h HAVING min(doc_id) <> max(doc_id)),
dp AS (SELECT p.doc_id, p.pos FROM p JOIN dh USING (h)),
isl AS (
  SELECT doc_id, pos,
    CASE WHEN lag(pos) OVER w IS NULL OR pos - lag(pos) OVER w > 8
      THEN 1 ELSE 0 END AS brk
  FROM dp WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
isl2 AS (
  SELECT doc_id, pos,
    SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
  FROM isl),
sp AS (
  SELECT doc_id, island, MIN(pos) AS p0, MAX(pos) AS p1,
    CAST(count(*) AS BIGINT) AS n_pos
  FROM isl2 GROUP BY 1, 2),
d AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans,
    CAST(SUM(n_pos) AS BIGINT) AS n_dup_pos,
    CAST(SUM(p1 - p0 + 8) AS BIGINT) AS dup_tokens
  FROM sp GROUP BY 1)
SELECT t2.doc_id, t2.n_tokens, t2.n_grams,
  CAST(coalesce(d.n_spans, 0) AS BIGINT) AS n_spans,
  CAST(coalesce(d.n_dup_pos, 0) AS BIGINT) AS n_dup_pos,
  CAST(coalesce(d.dup_tokens, 0) AS BIGINT) AS dup_tokens,
  CAST(t2.n_tokens - coalesce(d.dup_tokens, 0) AS BIGINT) AS clean_tokens,
  CAST(coalesce(d.dup_tokens, 0) AS DOUBLE) / t2.n_tokens AS dup_frac
FROM t2 LEFT JOIN d USING (doc_id) ORDER BY doc_id"""

  // Twin of TextOps.spanDedup: chunk derivation repeated from
  // doc_chunk's verified SQL, span stats per chunk_md5 (exact
  // count-distinct + min-keeper), cross-doc-only counting. Shared by
  // doc_span_dedup and the training-set composition.
  private lazy val spanDedupSql: String =
    s"""WITH d AS (
  SELECT doc_id, $tokensExpr AS toks,
    CAST(len($tokensExpr) AS BIGINT) AS n_tokens
  FROM documents),
d2 AS (
  SELECT *, 1 + (greatest(0, n_tokens - 16) + 7) // 8 AS n_chunks FROM d),
c AS (
  SELECT doc_id,
    md5(array_to_string(list_slice(toks, 1 + 8 * k, 8 * k + 16), ' ')) AS chunk_md5
  FROM (SELECT doc_id, toks,
      unnest(generate_series(0, n_chunks - 1)) AS k FROM d2)),
s AS (
  SELECT chunk_md5, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
    min(doc_id) AS keeper
  FROM c GROUP BY 1)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_chunks,
  CAST(sum(CASE WHEN n_docs > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_spans,
  CAST(sum(CASE WHEN n_docs > 1 AND keeper <> doc_id THEN 1 ELSE 0 END)
    AS BIGINT) AS n_borrowed,
  CAST(sum(CASE WHEN n_docs > 1 THEN 1 ELSE 0 END) AS DOUBLE) / count(*)
    AS dup_frac
FROM c JOIN s USING (chunk_md5)
GROUP BY doc_id ORDER BY doc_id"""

  // Twin of TextOps.gopherRules: mean word length from len(text)
  // (single-space-joined corpus), per-word regexp/stop-set counts,
  // thresholds repeated literally. Shared with doc_training_set and —
  // over the whitespace-normalized source — the ingest-cascade twin.
  private lazy val gopherSql: String = gopherSqlFrom("documents")

  private def gopherSqlFrom(src: String): String =
    s"""WITH t AS (
  SELECT doc_id, text, $tokensExpr AS toks,
    CAST(len($tokensExpr) AS BIGINT) AS n_words
  FROM $src),
s AS (
  SELECT doc_id, n_words,
    CAST(len(text) - n_words + 1 AS DOUBLE) / n_words AS mean_wl,
    CAST(CAST(len(list_filter(toks, w -> regexp_matches(w, '[a-z]'))) AS BIGINT)
      AS DOUBLE) / n_words AS frac_alpha,
    CAST(len(list_filter(toks, w -> w IN
      ('the', 'be', 'to', 'of', 'and', 'that', 'have', 'with'))) AS BIGINT)
      AS n_stop
  FROM t)
SELECT doc_id, n_words, mean_wl, frac_alpha, n_stop,
  n_words >= 40 AND n_words <= 100000 AND mean_wl >= 3e0 AND mean_wl <= 10e0
    AND frac_alpha >= 8e-1 AND n_stop >= 2 AS gopher_pass
FROM s ORDER BY doc_id"""

  // Twin of TextOps.mixSample: alpha=0.5 temperature mixture, sqrt
  // quantized to the 2^20 integer grid (order-independent INTEGER
  // denominator), md5 bucket verbatim. Shared with doc_training_set.
  private lazy val mixSampleSql: String =
    s"""WITH s AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_src FROM documents GROUP BY 1),
q AS (
  SELECT source, n_src,
    CAST(round(sqrt(CAST(n_src AS DOUBLE)) * 1048576e0) AS BIGINT) AS q
  FROM s),
t AS (SELECT CAST(sum(q) AS BIGINT) AS sum_q,
  CAST(sum(n_src) AS BIGINT) AS n_total FROM q),
r AS (
  SELECT source, n_src,
    CAST(floor(least(1e0,
      CAST(CAST(floor(CAST(n_total AS DOUBLE) * 3e-1) AS BIGINT) * q AS DOUBLE)
        / (CAST(sum_q AS DOUBLE) * n_src)) * 1000000e0) AS BIGINT) AS thr
  FROM q, t)
SELECT doc_id, source, n_src, thr,
  CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '#mix'), 1, 7)) AS BIGINT)
    % 1000000 AS bucket
FROM documents JOIN r USING (source)
WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '#mix'), 1, 7)) AS BIGINT)
    % 1000000 < thr
ORDER BY doc_id"""

  /** The composed corpus-curation decision (quality + lang match +
    * exact-dup + contamination + eval-split exclusion) — its own oracle
    * row AND the keep-set gate of emb_curated_topk. The is_eval
    * predicate repeats the contamination split's bucket hash verbatim:
    * held-out docs are dropped from the keep-set, not just their
    * train-side contaminators. */
  private lazy val curateSql: String =
    s"""WITH q AS (SELECT doc_id, quality FROM (${sqlBase("doc_quality")})),
l AS (SELECT doc_id, match_label FROM (${sqlBase("doc_lang_id")})),
dd AS (SELECT doc_id, is_dup FROM (${sqlBase("dedup_exact")})),
ct AS (SELECT doc_id, TRUE AS contaminated FROM (${sqlBase("doc_contamination")})),
ev AS (SELECT doc_id,
  CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '#g1'), 1, 7)) AS BIGINT) % 10 = 0 AS is_eval
  FROM documents)
SELECT q.doc_id, quality, match_label, is_dup,
  COALESCE(contaminated, FALSE) AS contaminated, is_eval,
  quality >= 5e-1 AND match_label AND NOT is_dup
    AND NOT COALESCE(contaminated, FALSE) AND NOT is_eval AS keep
FROM q JOIN l USING (doc_id) JOIN dd USING (doc_id)
LEFT JOIN ct USING (doc_id) JOIN ev USING (doc_id) ORDER BY doc_id"""
}
