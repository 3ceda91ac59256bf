#!/usr/bin/env python3
"""Streaming variant of gen_sf1.py for the sf100 decade (1000
replicas of sf0.1 ~ 50 GB of text): the list-building generator would
hold the whole corpus in Python memory, so this one writes a parquet
row group per replica batch instead. Same dup-density-preserving
construction (see gen_sf1.py): replica k suffixes every word with
"~k" (vocabulary bijection — within-replica shingle relations exactly
preserved, zero cross-replica shingles) and applies a seeded signed
permutation to embeddings (isometry — within-replica cosines exact).

Usage: python3 tools/gen_sf100.py [srcDir] [outDir] [replicas]
"""
import sys
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import os

src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf100"
REPLICAS = int(sys.argv[3]) if len(sys.argv) > 3 else 1000
OFF = 10_000_000

os.makedirs(out, exist_ok=True)

# ---- documents (row group per replica) -------------------------------
d = pq.read_table(f"{src}/documents.parquet")
doc_id = d.column("doc_id").to_pylist()
text = d.column("text").to_pylist()
lang = d.column("lang").to_pylist()
source = d.column("source").to_pylist()

schema = pa.schema([("doc_id", pa.int64()), ("text", pa.string()),
                    ("lang", pa.string()), ("source", pa.string()),
                    ("n_chars", pa.int64())])
w = pq.ParquetWriter(f"{out}/documents.parquet", schema)
for k in range(REPLICAS):
    if k == 0:
        tk = text
    else:
        suf = f"~{k}"
        tk = [" ".join(wd + suf for wd in t.split(" ")) for t in text]
    w.write_table(pa.table({
        "doc_id": pa.array([i + k * OFF for i in doc_id], pa.int64()),
        "text": pa.array(tk, pa.string()),
        "lang": pa.array(lang, pa.string()),
        "source": pa.array(source, pa.string()),
        "n_chars": pa.array([len(t) for t in tk], pa.int64()),
    }, schema=schema))
    if k % 100 == 0:
        print(f"documents: replica {k}/{REPLICAS}", flush=True)
w.close()
print(f"documents: {len(doc_id) * REPLICAS} rows")

# ---- embeddings (row group per replica) ------------------------------
e = pq.read_table(f"{src}/embeddings.parquet")
vec_id = np.asarray(e.column("vec_id").to_pylist(), dtype=np.int64)
emb = np.asarray(e.column("embedding").to_pylist(), dtype=np.float32)
label = np.asarray(e.column("label").to_pylist(), dtype=np.int32)
dims = emb.shape[1]

eschema = pa.schema([("vec_id", pa.int64()),
                     ("embedding", pa.list_(pa.float32())),
                     ("label", pa.int32())])
we = pq.ParquetWriter(f"{out}/embeddings.parquet", eschema)
for k in range(REPLICAS):
    if k == 0:
        vk = emb
    else:
        rng = np.random.RandomState(1000 + k)
        perm = rng.permutation(dims)
        signs = rng.choice([-1.0, 1.0], size=dims).astype(np.float32)
        vk = emb[:, perm] * signs  # signed permutation: exact isometry
    we.write_table(pa.table({
        "vec_id": pa.array(vec_id + k * OFF, pa.int64()),
        "embedding": pa.array([v.tolist() for v in vk],
                              pa.list_(pa.float32())),
        "label": pa.array(label, pa.int32()),
    }, schema=eschema))
    if k % 100 == 0:
        print(f"embeddings: replica {k}/{REPLICAS}", flush=True)
we.close()
print(f"embeddings: {len(vec_id) * REPLICAS} rows x {dims} dims")
