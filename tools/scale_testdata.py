#!/usr/bin/env python3
"""Deterministic scale-up of the sf0.1 test tables for the r16 SCALE
side-board (BENCHSCALE_r16.json): replicate each table K times with
id-shifted copies so the heavy-tier queries can be timed on a bigger
input than the largest driver-provided SF. This is MEASUREMENT tooling
only — it writes to a scratch dir, never touches /root/testdata, and no
query result at the bench SF depends on it.

Shape choices (documented so the side-board is interpretable):
 - orders/lineitem: copy i shifts o_orderkey/l_orderkey by i*100M and
   o_custkey/l_partkey by i*10M — every copy is an independent subgraph
   with the SAME basket-size distribution, so pair mining, k-core,
   cheapest-path and item-CF all grow LINEARLY in K by construction
   (and all ids stay < 2^31, so q306's packed-key guard passes, like
   production ids would at this scale).
 - documents: doc_id shifted by i*10M, text unchanged — duplicate docs
   across copies are exactly what a bigger crawl gives a dedup pass.
 - embeddings: vec_id shifted by i*1M (clear of q286's +100000 twin
   band); each non-original copy's vector is deterministically jittered
   per element by a factor in [0.5, 1.5] (hash of id, element, copy) so
   cross-copy cosine stays far below the 0.95 dup bar — otherwise every
   vector would join one K-member duplicate component, which no real
   corpus does.

Usage: python3 tools/scale_testdata.py <K> <outdir>
"""
import sys
import numpy as np
import pandas as pd

K = int(sys.argv[1])
out = sys.argv[2]

src = "/root/testdata/sf0.1"
import os
os.makedirs(out, exist_ok=True)

def shifted(df, col, step, i):
    d = df.copy()
    d[col] = d[col] + i * step
    return d

orders = pd.read_parquet(f"{src}/orders.parquet")
pd.concat(
    [shifted(shifted(orders, "o_orderkey", 100_000_000, i),
             "o_custkey", 10_000_000, i) for i in range(K)],
    ignore_index=True).to_parquet(f"{out}/orders.parquet", index=False)
print("orders", K * len(orders))

li = pd.read_parquet(f"{src}/lineitem.parquet")
# l_suppkey must shift too: q175's supplier co-purchase graph would
# otherwise get K-times DENSER instead of K-times BIGGER (shared
# suppliers across copies -> wedge count grows ~K^2, a generator
# artifact that masquerades as superlinear engine behavior — measured
# before this fix: q175 8.7x at K=4)
pd.concat(
    [shifted(shifted(shifted(li, "l_orderkey", 100_000_000, i),
                     "l_partkey", 10_000_000, i),
             "l_suppkey", 1_000_000, i) for i in range(K)],
    ignore_index=True).to_parquet(f"{out}/lineitem.parquet", index=False)
print("lineitem", K * len(li))

docs = pd.read_parquet(f"{src}/documents.parquet")
pd.concat([shifted(docs, "doc_id", 10_000_000, i) for i in range(K)],
          ignore_index=True).to_parquet(f"{out}/documents.parquet", index=False)
print("documents", K * len(docs))

emb = pd.read_parquet(f"{src}/embeddings.parquet")
dim = len(emb["embedding"].iloc[0])
copies = []
for i in range(K):
    d = emb.copy()
    d["vec_id"] = d["vec_id"] + i * 1_000_000
    if i > 0:
        # deterministic per-(id, element, copy) jitter factor in [0.5, 1.5]
        ids = d["vec_id"].to_numpy()[:, None]
        j = np.arange(dim)[None, :]
        h = (ids * 2654435761 + j * 40503 + i * 69621) % 101
        factor = 0.5 + h / 100.0
        mat = np.stack(d["embedding"].to_numpy()) * factor
        d["embedding"] = [row.astype(np.float32) for row in mat]
    copies.append(d)
pd.concat(copies, ignore_index=True).to_parquet(
    f"{out}/embeddings.parquet", index=False)
print("embeddings", K * len(emb))

# small dims the session loader may touch alongside the big tables
for t in ("region", "nation", "customer", "supplier", "part", "events"):
    p = f"{src}/{t}.parquet"
    if os.path.exists(p):
        pd.read_parquet(p).to_parquet(f"{out}/{t}.parquet", index=False)
print("done ->", out)
