"""Regenerate a 10x measurement dataset at /root/testdata/sf1.0.

MEASUREMENT PROXY ONLY — not driver data. The driver's round-end bench may
run at a driver-generated sf1.0 (BENCH_r05.json: "sf": 1.0); this tool
builds a same-shape 10x scale-up of sf0.1 so optimizations can be validated
at that scale locally (guide §1: measure at the scale you care about).

Construction (deterministic, seed fixed):
  - fact tables (customer/supplier/part/orders/lineitem/events): 10 copies
    with per-copy key offsets so join fanouts and group cardinalities scale
    like the driver's generator (10x rows, 10x distinct keys, same
    per-key distributions).
  - documents: 10 copies; copy 0 is verbatim, copies 1-9 apply a per-copy
    vocabulary permutation + word-sequence rotation. Doc length, in-doc
    repetition and global vocabulary are preserved, but cross-copy Jaccard
    is low — so dedup/similarity operators see a realistically diverse
    corpus instead of 9 exact duplicates of every doc.
  - embeddings: 10 copies; copies 1-9 flip the signs of a per-copy random
    half of the dimensions (norm-preserving, decorrelates copies).
  - region/nation: dimension tables, copied verbatim.

Usage: python tools/gen_scale.py [out_dir] [n_copies]
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
OUT = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf1.0"
COPIES = int(sys.argv[2]) if len(sys.argv) > 2 else 10

OFFSETS = {
    "customer": {"c_custkey": 15_000},
    "supplier": {"s_suppkey": 1_000},
    "part": {"p_partkey": 20_000},
    "orders": {"o_orderkey": 150_000, "o_custkey": 15_000},
    "lineitem": {"l_orderkey": 150_000, "l_partkey": 20_000, "l_suppkey": 1_000},
    "events": {"event_id": 100_000, "user_id": 2_000},
    "documents": {"doc_id": 5_000},
    "embeddings": {"vec_id": 2_000},
}


def scale_table(name: str) -> pa.Table:
    t = pq.read_table(f"{SRC}/{name}.parquet")
    if name in ("region", "nation"):
        return t
    offs = OFFSETS[name]
    parts = []
    for i in range(COPIES):
        cols = {}
        for field in t.schema:
            col = t.column(field.name)
            if field.name in offs and i > 0:
                col = pa.compute.add(col, offs[field.name] * i)
            cols[field.name] = col
        tt = pa.table(cols)
        if name == "documents" and i > 0:
            tt = permute_documents(tt, i)
        if name == "embeddings" and i > 0:
            tt = flip_embeddings(tt, i)
        parts.append(tt)
    return pa.concat_tables(parts)


def permute_documents(t: pa.Table, copy: int) -> pa.Table:
    rng = np.random.default_rng(1_000 + copy)
    texts = t.column("text").to_pylist()
    # global vocab permutation for this copy
    vocab = sorted({w for s in texts for w in s.split(" ")})
    perm = rng.permutation(len(vocab))
    vmap = {w: vocab[perm[j]] for j, w in enumerate(vocab)}
    out = []
    for k, s in enumerate(texts):
        ws = [vmap[w] for w in s.split(" ")]
        r = (k * 7 + copy * 13) % max(len(ws), 1)
        ws = ws[r:] + ws[:r]
        out.append(" ".join(ws))
    cols = {f.name: t.column(f.name) for f in t.schema}
    cols["text"] = pa.array(out, type=pa.string())
    cols["n_chars"] = pa.array([len(s) for s in out], type=pa.int64())
    return pa.table(cols)


def flip_embeddings(t: pa.Table, copy: int) -> pa.Table:
    rng = np.random.default_rng(2_000 + copy)
    vecs = t.column("embedding").to_pylist()
    dim = len(vecs[0])
    signs = np.where(rng.random(dim) < 0.5, -1.0, 1.0).astype(np.float32)
    flipped = [list((np.asarray(v, dtype=np.float32) * signs)) for v in vecs]
    cols = {f.name: t.column(f.name) for f in t.schema}
    cols["embedding"] = pa.array(flipped, type=pa.list_(pa.float32()))
    return pa.table(cols)


def main():
    os.makedirs(OUT, exist_ok=True)
    for name in "region nation customer supplier part orders lineitem events documents embeddings".split():
        out = scale_table(name)
        # multi-row-group files so scans parallelize like driver data
        pq.write_table(out, f"{OUT}/{name}.parquet", row_group_size=100_000)
        print(f"{name}: {out.num_rows} rows")


if __name__ == "__main__":
    main()
