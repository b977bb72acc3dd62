#!/usr/bin/env python3
"""Dev-only sf1 generator for the local scale probe (BENCH_sf1.json).

The driver ships sf0.001/0.01/0.1 only (TESTDATA.md; /root/testdata is
read-only). For the 10x probe we build sf1 under target/testdata/sf1:

 - TPC-H-ish tables (customer/supplier/part/orders/lineitem): 10
   replicas of sf0.1 with consistent key offsets on every FK edge, so
   value distributions, selectivities, and per-key join fan-out are
   IDENTICAL to the driver's data — only cardinality changes.
 - events: same replication via pyarrow (preserves the TIMESTAMP(NANOS)
   physical type Events.load depends on); user_id offset per replica so
   per-user event counts (session/window sizes) are unchanged.
 - documents/embeddings: freshly GENERATED, not replicated — replicating
   text/vectors 10x would create 10-member exact-dup groups everywhere
   and invert the dedup operators' selectivity. Generation mirrors the
   originals' measured shape: 31-word vocab, 44-577 chars, ~20 sources,
   weighted lang tags, ~1.6 planted exact dups and ~1.4 same-source
   near-dup pairs per 1000 docs; embeddings are unit-norm 64-dim floats
   (per-dim sigma=1/8 as measured) with ~7 near-identical planted pairs
   per 10k vectors.

Usage: python3 tools/gen_sf1.py [outdir]   (default target/testdata/sf1)
"""
import os
import random
import sys

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
OUT = sys.argv[1] if len(sys.argv) > 1 else "target/testdata/sf1"
REPS = 10
SEED = 4242

os.makedirs(OUT, exist_ok=True)
con = duckdb.connect()

# ---------------------------------------------------------- relational
OFF = {"o": 150000, "c": 15000, "p": 20000, "s": 1000}

def replicate(table, sql):
    parts = " UNION ALL ".join(sql.format(r=r) for r in range(REPS))
    con.execute(
        f"COPY ({parts}) TO '{OUT}/{table}.parquet' (FORMAT PARQUET)")
    print(table, con.sql(f"SELECT count(*) FROM '{OUT}/{table}.parquet'").fetchone()[0])

for t in ("region", "nation"):
    con.execute(f"COPY (SELECT * FROM '{SRC}/{t}.parquet') "
                f"TO '{OUT}/{t}.parquet' (FORMAT PARQUET)")
    print(t, "copied")

replicate("customer",
          "SELECT c_custkey + {r}*" + str(OFF["c"]) + " AS c_custkey, "
          "c_name, c_nationkey, c_acctbal, c_mktsegment "
          f"FROM '{SRC}/customer.parquet'")
replicate("supplier",
          "SELECT s_suppkey + {r}*" + str(OFF["s"]) + " AS s_suppkey, "
          "s_name, s_nationkey, s_acctbal "
          f"FROM '{SRC}/supplier.parquet'")
replicate("part",
          "SELECT p_partkey + {r}*" + str(OFF["p"]) + " AS p_partkey, "
          "p_name, p_brand, p_type, p_size, p_retailprice "
          f"FROM '{SRC}/part.parquet'")
replicate("orders",
          "SELECT o_orderkey + {r}*" + str(OFF["o"]) + " AS o_orderkey, "
          "o_custkey + {r}*" + str(OFF["c"]) + " AS o_custkey, "
          "o_orderstatus, o_totalprice, o_orderdate, o_orderpriority "
          f"FROM '{SRC}/orders.parquet'")
replicate("lineitem",
          "SELECT l_orderkey + {r}*" + str(OFF["o"]) + " AS l_orderkey, "
          "l_partkey + {r}*" + str(OFF["p"]) + " AS l_partkey, "
          "l_suppkey + {r}*" + str(OFF["s"]) + " AS l_suppkey, "
          "l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax, "
          "l_returnflag, l_linestatus, l_shipdate "
          f"FROM '{SRC}/lineitem.parquet'")

# ------------------------------------------------------------- events
# Replicate via pyarrow to preserve the source's physical ts encoding
# exactly (the fixture has shipped both TIMESTAMP(NANOS) and native µs;
# Events.normalizeEventTime handles either, but the probe should measure
# the same encoding the driver ships). duckdb COPY would rewrite it.
ev = pq.read_table(f"{SRC}/events.parquet")
# Accept every encoding Events.normalizeEventTime supports: bare ns/µs
# (read as BIGINT-nanos / TIMESTAMP_NTZ) and tz-adjusted ns/µs (read as
# TIMESTAMP) — a tz-annotated fixture drift should replicate, not crash.
_ts = ev.schema.field("ts").type
assert pa.types.is_timestamp(_ts) and _ts.unit in ("ns", "us"), ev.schema
chunks = []
for r in range(REPS):
    t = ev.set_column(ev.schema.get_field_index("event_id"), "event_id",
                      pa.compute.add(ev.column("event_id"), r * 100000))
    t = t.set_column(t.schema.get_field_index("user_id"), "user_id",
                     pa.compute.add(t.column("user_id"), r * 1500))
    chunks.append(t)
events = pa.concat_tables(chunks)
pq.write_table(events, f"{OUT}/events.parquet")
print("events", events.num_rows)

# ---------------------------------------------------------- documents
# Mirror the measured shape of the driver corpus (see module docstring).
VOCAB = con.sql(
    f"SELECT DISTINCT unnest(string_split(text, ' ')) w "
    f"FROM '{SRC}/documents.parquet' ORDER BY 1").fetchnumpy()["w"].tolist()
LANGS = ["en", "de", "zh", "fr", "es"]
LANG_W = [0.41, 0.15, 0.15, 0.15, 0.14]
N_DOCS = 50000
N_SOURCES = 20
rng = random.Random(SEED)

texts, sources, langs = [], [], []
for i in range(N_DOCS):
    n_tok = rng.randint(8, 110)
    texts.append(" ".join(rng.choice(VOCAB) for _ in range(n_tok)))
    sources.append(f"src{i % N_SOURCES}")
    langs.append(rng.choices(LANGS, weights=LANG_W)[0])
# planted structure at the originals' per-capita rate (x10): exact dups
# copy a doc verbatim; near-dups mutate ~5% of tokens (3-gram jaccard
# lands ~0.8-0.97, same as the shipped plants), half cross-source.
for _ in range(80):
    a, b = rng.randrange(N_DOCS), rng.randrange(N_DOCS)
    texts[b] = texts[a]
for _ in range(70):
    a, b = rng.randrange(N_DOCS), rng.randrange(N_DOCS)
    toks = texts[a].split(" ")
    for _ in range(max(1, len(toks) // 20)):
        toks[rng.randrange(len(toks))] = rng.choice(VOCAB)
    texts[b] = " ".join(toks)
    if rng.random() < 0.5:
        sources[b] = sources[a]
docs = pa.table({
    "doc_id": pa.array(range(N_DOCS), pa.int64()),
    "text": pa.array(texts),
    "lang": pa.array(langs),
    "source": pa.array(sources),
    "n_chars": pa.array([len(t) for t in texts], pa.int64()),
})
pq.write_table(docs, f"{OUT}/documents.parquet")
print("documents", docs.num_rows)

# --------------------------------------------------------- embeddings
N_VECS, DIM = 20000, 64
nrng = np.random.default_rng(SEED)
vecs = nrng.standard_normal((N_VECS, DIM))
vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
# planted near-identical pairs (cosine ~0.99) at the x10 rate
for _ in range(14):
    a, b = nrng.integers(0, N_VECS, 2)
    v = vecs[a] + 0.1 * nrng.standard_normal(DIM)
    vecs[b] = v / np.linalg.norm(v)
emb = pa.table({
    "vec_id": pa.array(range(N_VECS), pa.int64()),
    "embedding": pa.array(vecs.astype(np.float32).tolist(),
                          pa.list_(pa.float32())),
    "label": pa.array((nrng.integers(0, 10, N_VECS)).astype(np.int32),
                      pa.int32()),
})
pq.write_table(emb, f"{OUT}/embeddings.parquet")
print("embeddings", emb.num_rows)
print("DONE", OUT)
