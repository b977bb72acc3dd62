#!/usr/bin/env python3
"""Dev-only sf10 generator for the at-rest-index scale probe.

The round-14 verdict's 100x claim extrapolated from a 10x (sf1) probe;
this builds the 100x point for the AT-REST serving family only — the
tables those probes touch (embeddings for x82/x84/x90/nl119, events for
the manifest point lookups). Relational tables are NOT generated: the
q-family's scale story is measured at sf1 and the at-rest probes never
read them, so ~2 GB of parquet covers the probe.

 - embeddings: 3.2M unit-norm 64-dim float32 vectors (same per-dim
   sigma and planted near-identical-pair rate as gen_sf1.py, labels
   0-9) — generated, not replicated, for the same reason as sf1: 100x
   replication would plant 100-member duplicate groups.
 - events: 100 replicas of sf0.1 via pyarrow (preserves the physical
   ts encoding), event_id/user_id offset per replica — 10M rows.

Usage: python3 tools/gen_sf10.py [outdir]  (default target/testdata/sf10)
"""
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
OUT = sys.argv[1] if len(sys.argv) > 1 else "target/testdata/sf10"
SEED = 424242

os.makedirs(OUT, exist_ok=True)

# --------------------------------------------------------- embeddings
N_VECS, DIM, CHUNK = 3_200_000, 64, 200_000
nrng = np.random.default_rng(SEED)
writer = None
for lo in range(0, N_VECS, CHUNK):
    n = min(CHUNK, N_VECS - lo)
    vecs = nrng.standard_normal((n, DIM)).astype(np.float32)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    # planted near-identical pairs at the sf1 per-capita rate (~7/10k)
    for _ in range(int(n * 7 / 10000)):
        a, b = nrng.integers(0, n, 2)
        v = vecs[a] + 0.1 * nrng.standard_normal(DIM).astype(np.float32)
        vecs[b] = v / np.linalg.norm(v)
    t = pa.table({
        "vec_id": pa.array(range(lo, lo + n), pa.int64()),
        "embedding": pa.array(vecs.tolist(), pa.list_(pa.float32())),
        "label": pa.array(nrng.integers(0, 10, n).astype(np.int32),
                          pa.int32()),
    })
    if writer is None:
        writer = pq.ParquetWriter(f"{OUT}/embeddings.parquet", t.schema)
    writer.write_table(t)
    print(f"embeddings {lo + n}/{N_VECS}")
writer.close()

# ------------------------------------------------------------- events
REPS = 100
ev = pq.read_table(f"{SRC}/events.parquet")
_ts = ev.schema.field("ts").type
assert pa.types.is_timestamp(_ts) and _ts.unit in ("ns", "us"), ev.schema
w = pq.ParquetWriter(f"{OUT}/events.parquet", ev.schema)
for r in range(REPS):
    t = ev.set_column(ev.schema.get_field_index("event_id"), "event_id",
                      pc.add(ev.column("event_id"), r * 1_000_000))
    t = t.set_column(t.schema.get_field_index("user_id"), "user_id",
                     pc.add(t.column("user_id"), r * 15000))
    w.write_table(t)
w.close()
print("events", REPS * ev.num_rows)

# ---------------------------------------------------------- documents
# 100 replicas of sf0.1's 5k docs (500k total) for the lexical-index
# probe-vs-flat scale point: replication preserves the term and
# doc-length distributions (df scales by the replica count), which is
# what the BM25 cost model depends on; doc ids offset per replica.
DREPS = 100
docs = pq.read_table(f"{SRC}/documents.parquet")
dw = pq.ParquetWriter(f"{OUT}/documents.parquet", docs.schema)
for r in range(DREPS):
    t = docs.set_column(docs.schema.get_field_index("doc_id"), "doc_id",
                        pc.add(docs.column("doc_id"), r * 5000))
    dw.write_table(t)
dw.close()
print("documents", DREPS * docs.num_rows)
