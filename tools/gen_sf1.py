#!/usr/bin/env python3
"""Synthesize sf1 = 10x sf0.1 for the empirical scale check (round 8,
verdict #2). Driver-side tooling only — the library never reads this in
production; the data exists to measure sf0.1 -> sf1 runtime RATIOS of
the heavy query tier.

Construction (seed 42, replica r in 0..9, replica 0 = the originals):
- every table gets fresh ids via id' = r*stride + id (stride = max+1),
  so referential integrity (lineitem->orders/part/supplier,
  orders->customer, customer->nation) is preserved per replica;
- documents: replica texts are per-doc token SHUFFLES (seeded by
  (r, doc_id)) — fresh content with the exact same length, vocabulary
  and per-doc unigram distribution, no accidental near-dup relation to
  the source — plus PLANTED duplicates per replica matching the
  original per-capita density (8 exact pairs ~ the 4992/5000 distinct
  rate; 42 near pairs with an 80% shared token prefix ~ the ~50
  minhash-pair mass at sf0.1), so the pair-verify stages scale the way
  a true 10x generator run would;
- embeddings: replicas are the source vectors + per-dim Gaussian noise
  at 0.7 sigma — far enough apart that replicas of one vector are not
  mutual near-dups, keeping near-dup density per-capita flat;
- events/orders/lineitem/customer/part/supplier: verbatim replication
  under the id remap (10x users with the same per-user event counts,
  10x orders with the same price distribution — group sizes scale,
  value distributions stay fixed, which is what a bigger SF of the
  same generator does); nation/region are fixed dims, copied.

Usage: python3 tools/gen_sf1.py [outdir [srcdir [R]]]
  default: outdir=/tmp/graft_sf1, srcdir=/root/testdata/sf0.1, R=10
  sf10 (round 9, one more decade on the ladder) chains off sf1:
    python3 tools/gen_sf1.py            # sf1  = 10x sf0.1 (~178 MB)
    python3 tools/gen_sf1.py /tmp/graft_sf10 /tmp/graft_sf1 10   # ~1.8 GB
  Chaining preserves the conventions: replica 0 = the source verbatim
  (so sf1 is a strict subset of sf10 under id remap), planted-dup
  density stays per-capita flat at every rung, and the per-(r, doc_id)
  shuffle seeds are namespaced by the SOURCE dir so sf10's fresh
  replicas don't accidentally reproduce sf1's.
"""
import os, random, sys

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_sf1"
SRC = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
R = int(sys.argv[3]) if len(sys.argv) > 3 else 10
# Seed namespaced by the SRC VALUE, not by argv arity (r9 ADVICE #3:
# keying on len(sys.argv) made `gen_sf1.py /tmp/graft_sf1
# /root/testdata/sf0.1` silently produce a different sf1 than the
# canonical no-arg invocation). Compared by REALPATH (r10 review) so
# a trailing slash, relative path or symlink denoting the canonical
# source still takes the canonical branch. The canonical source keeps
# the plain 42 so the recorded sf1 rung stays bit-identical; a
# non-canonical source namespaces by its OWN realpath, so two
# spellings of the same dir also agree with each other.
_SRC_REAL = os.path.realpath(SRC)
SEED = 42 if _SRC_REAL == os.path.realpath("/root/testdata/sf0.1") \
    else f"42:{_SRC_REAL}"

os.makedirs(OUT, exist_ok=True)
con = duckdb.connect()


def src(name):
    return f"read_parquet('{SRC}/{name}.parquet')"


def stride(name, key):
    return con.execute(f"SELECT max({key}) + 1 FROM {src(name)}").fetchone()[0]


def copy_sql(name, sql):
    con.execute(f"COPY ({sql}) TO '{OUT}/{name}.parquet' (FORMAT PARQUET)")
    n = con.execute(f"SELECT count(*) FROM read_parquet('{OUT}/{name}.parquet')").fetchone()[0]
    print(f"{name}: {n} rows")


S_DOC = stride("documents", "doc_id")
S_EMB = stride("embeddings", "vec_id")
S_EVT = stride("events", "event_id")
S_USR = stride("events", "user_id")
S_ORD = stride("orders", "o_orderkey")
S_CUS = stride("customer", "c_custkey")
S_PRT = stride("part", "p_partkey")
S_SUP = stride("supplier", "s_suppkey")

# fixed dims
for t in ("nation", "region"):
    copy_sql(t, f"SELECT * FROM {src(t)}")

copy_sql("customer", f"""
  SELECT r * {S_CUS} + c_custkey AS c_custkey, c_name, c_nationkey,
         c_acctbal, c_mktsegment
  FROM {src('customer')} CROSS JOIN range({R}) t(r)""")

copy_sql("supplier", f"""
  SELECT r * {S_SUP} + s_suppkey AS s_suppkey, s_name, s_nationkey, s_acctbal
  FROM {src('supplier')} CROSS JOIN range({R}) t(r)""")

copy_sql("part", f"""
  SELECT r * {S_PRT} + p_partkey AS p_partkey, p_name, p_brand, p_type,
         p_size, p_retailprice
  FROM {src('part')} CROSS JOIN range({R}) t(r)""")

copy_sql("orders", f"""
  SELECT r * {S_ORD} + o_orderkey AS o_orderkey,
         r * {S_CUS} + o_custkey AS o_custkey,
         o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
  FROM {src('orders')} CROSS JOIN range({R}) t(r)""")

copy_sql("lineitem", f"""
  SELECT r * {S_ORD} + l_orderkey AS l_orderkey,
         r * {S_PRT} + l_partkey AS l_partkey,
         r * {S_SUP} + l_suppkey AS l_suppkey,
         l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
         l_returnflag, l_linestatus, l_shipdate
  FROM {src('lineitem')} CROSS JOIN range({R}) t(r)""")

copy_sql("events", f"""
  SELECT r * {S_EVT} + event_id AS event_id, ts,
         r * {S_USR} + user_id AS user_id, event_type, value, props
  FROM {src('events')} CROSS JOIN range({R}) t(r)""")

# ---- documents: shuffled replicas + planted dup pairs ----
docs = con.execute(
    f"SELECT doc_id, text, lang, source FROM {src('documents')} ORDER BY doc_id"
).fetchall()
vocab = sorted({t for _, text, _, _ in docs for t in text.split(" ")})
rows = []
# Ground-truth ledger of the pairs planted below (round 11, the recall
# face of suggestDfCap): (kind, d1, d2) with d1 < d2, in FINAL doc_ids.
# Purely a side output — no extra RNG draws, so documents.parquet stays
# bit-identical to earlier generations. Chaining: replica 0 carries the
# SOURCE verbatim under identity ids, so the source's own planted pairs
# remain planted here and are propagated from its ledger when present.
planted = []
for r in range(R):
    rng = random.Random(f"{SEED}:{r}")
    rep = []
    for doc_id, text, lang, source in docs:
        toks = text.split(" ")
        if r > 0:
            sh = random.Random(f"{SEED}:{r}:{doc_id}")
            sh.shuffle(toks)
        rep.append([r * S_DOC + doc_id, toks, lang, source])
    if r > 0:
        # planted duplicates, per-capita density held flat at every
        # ladder rung: 8 exact + 42 near pairs per 5000 docs (sf0.1's
        # measured density), scaled by the source replica size
        n_exact = max(1, round(8 * len(rep) / 5000))
        n_near = max(1, round(42 * len(rep) / 5000))
        idx = list(range(len(rep)))
        rng.shuffle(idx)
        pos = 0
        for _ in range(n_exact):  # exact pairs
            a, b = idx[pos], idx[pos + 1]
            pos += 2
            rep[b][1] = list(rep[a][1])
            planted.append(("exact", min(rep[a][0], rep[b][0]),
                            max(rep[a][0], rep[b][0])))
        for _ in range(n_near):  # near pairs: 80% shared prefix, fresh tail
            a, b = idx[pos], idx[pos + 1]
            pos += 2
            keep = max(1, int(len(rep[a][1]) * 0.8))
            tail = [rng.choice(vocab) for _ in range(len(rep[a][1]) - keep)]
            rep[b][1] = list(rep[a][1][:keep]) + tail
            planted.append(("near", min(rep[a][0], rep[b][0]),
                            max(rep[a][0], rep[b][0])))
    for doc_id, toks, lang, source in rep:
        text = " ".join(toks)
        rows.append((doc_id, text, lang, source, len(text)))

tbl = pa.table(
    {
        "doc_id": pa.array([x[0] for x in rows], pa.int64()),
        "text": pa.array([x[1] for x in rows], pa.string()),
        "lang": pa.array([x[2] for x in rows], pa.string()),
        "source": pa.array([x[3] for x in rows], pa.string()),
        "n_chars": pa.array([x[4] for x in rows], pa.int64()),
    }
)
pq.write_table(tbl, f"{OUT}/documents.parquet")
print(f"documents: {len(rows)} rows")

# planted-pair ledger: source's pairs (replica-0 ids are identity) + ours
src_pp = f"{SRC}/planted_pairs.parquet"
all_pairs = []
if os.path.exists(src_pp):
    all_pairs += con.execute(
        f"SELECT kind, d1, d2 FROM read_parquet('{src_pp}') ORDER BY d1, d2"
    ).fetchall()
all_pairs += planted
ptbl = pa.table(
    {
        "kind": pa.array([p[0] for p in all_pairs], pa.string()),
        "d1": pa.array([p[1] for p in all_pairs], pa.int64()),
        "d2": pa.array([p[2] for p in all_pairs], pa.int64()),
    }
)
pq.write_table(ptbl, f"{OUT}/planted_pairs.parquet")
print(f"planted_pairs: {len(all_pairs)} rows "
      f"({sum(1 for p in all_pairs if p[0] == 'exact')} exact, "
      f"{sum(1 for p in all_pairs if p[0] == 'near')} near)")

# ---- embeddings: noisy replicas ----
embs = con.execute(
    f"SELECT vec_id, embedding, label FROM {src('embeddings')} ORDER BY vec_id"
).fetchall()
dim = len(embs[0][1])
# per-dim std for noise scaling
stds = []
for d in range(dim):
    vals = [e[1][d] for e in embs]
    m = sum(vals) / len(vals)
    stds.append((sum((v - m) ** 2 for v in vals) / len(vals)) ** 0.5 or 1.0)
erows = []
for r in range(R):
    for vec_id, emb, label in embs:
        if r == 0:
            v = list(emb)
        else:
            g = random.Random(f"{SEED}:emb:{r}:{vec_id}")
            v = [emb[d] + g.gauss(0.0, 0.7 * stds[d]) for d in range(dim)]
        erows.append((r * S_EMB + vec_id, v, label))
etbl = pa.table(
    {
        "vec_id": pa.array([x[0] for x in erows], pa.int64()),
        "embedding": pa.array([x[1] for x in erows], pa.list_(pa.float32())),
        "label": pa.array([x[2] for x in erows], pa.int32()),
    }
)
pq.write_table(etbl, f"{OUT}/embeddings.parquet")
print(f"embeddings: {len(erows)} rows")
print("done:", OUT)
