#!/usr/bin/env python3
"""Generate an sf1 fixture (10x sf0.1) for the scale-curve runs.

Dev tool only (pyarrow is driver-side tooling, never a library dep).

Scaling must preserve DUPLICATE DENSITY, not just row count: naively
replicating documents 10x makes every doc a 10-way near-dup cluster and
the pair space explodes quadratically — that would measure a data
artifact, not the engine. Construction:

- documents: replica 0 is sf0.1 verbatim; replica k>=1 suffixes every
  word with "~k". Word-level shingle relations WITHIN a replica are
  exactly the original ones (vocabulary bijection), and replicas share
  zero shingles, so near-dup pair counts scale exactly 10x (linear,
  like a real corpus growing at constant dup rate). doc_id offset is
  k*10_000_000; only replica 0 keeps ids < 20, so the doc_id<20
  eval-suite convention stays a FIXED eval set against a 10x corpus.
- embeddings: replica 0 verbatim; replica k applies a seeded signed
  permutation of dimensions — an isometry, so within-replica cosines
  (and thus near-dup/ANN structure) are EXACTLY preserved, while
  cross-replica cosines are ~0 for the isotropic vectors. vec_id
  offset k*10_000_000; only replica 0 keeps vec_id < 20 (ANN queries).

Usage: python3 tools/gen_sf1.py [srcDir] [outDir] [replicas]
(replicas defaults to 10 = sf1; 100 = sf10 — the construction is
parametric: every replica k uses its own "~k" word suffix and its own
seeded signed permutation, so dup density is preserved at any scale.)
"""
import sys
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"
REPLICAS = int(sys.argv[3]) if len(sys.argv) > 3 else 10
OFF = 10_000_000

import os
os.makedirs(out, exist_ok=True)

# ---- documents -------------------------------------------------------
d = pq.read_table(f"{src}/documents.parquet")
doc_id = d.column("doc_id").to_pylist()
text = d.column("text").to_pylist()
lang = d.column("lang").to_pylist()
source = d.column("source").to_pylist()

ids, txts, langs, srcs, nchars = [], [], [], [], []
for k in range(REPLICAS):
    if k == 0:
        tk = text
    else:
        suf = f"~{k}"
        tk = [" ".join(w + suf for w in t.split(" ")) for t in text]
    ids.extend(i + k * OFF for i in doc_id)
    txts.extend(tk)
    langs.extend(lang)
    srcs.extend(source)
    nchars.extend(len(t) for t in tk)

pq.write_table(pa.table({
    "doc_id": pa.array(ids, pa.int64()),
    "text": pa.array(txts, pa.string()),
    "lang": pa.array(langs, pa.string()),
    "source": pa.array(srcs, pa.string()),
    "n_chars": pa.array(nchars, pa.int64()),
}), f"{out}/documents.parquet")
print(f"documents: {len(ids)} rows")

# ---- embeddings ------------------------------------------------------
e = pq.read_table(f"{src}/embeddings.parquet")
vec_id = np.asarray(e.column("vec_id").to_pylist(), dtype=np.int64)
emb = np.asarray(e.column("embedding").to_pylist(), dtype=np.float32)
label = np.asarray(e.column("label").to_pylist(), dtype=np.int32)
dims = emb.shape[1]

all_ids, all_vecs, all_labels = [], [], []
for k in range(REPLICAS):
    if k == 0:
        vk = emb
    else:
        rng = np.random.RandomState(1000 + k)
        perm = rng.permutation(dims)
        signs = rng.choice([-1.0, 1.0], size=dims).astype(np.float32)
        vk = emb[:, perm] * signs  # signed permutation: exact isometry
    all_ids.append(vec_id + k * OFF)
    all_vecs.append(vk)
    all_labels.append(label)

all_ids = np.concatenate(all_ids)
all_vecs = np.concatenate(all_vecs)
all_labels = np.concatenate(all_labels)
pq.write_table(pa.table({
    "vec_id": pa.array(all_ids, pa.int64()),
    "embedding": pa.array([v.tolist() for v in all_vecs],
                          pa.list_(pa.float32())),
    "label": pa.array(all_labels, pa.int32()),
}), f"{out}/embeddings.parquet")
print(f"embeddings: {len(all_ids)} rows x {dims} dims")
