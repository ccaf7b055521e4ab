#!/usr/bin/env python3
"""Generate a larger documents/embeddings slice for the SCALE.md probe.

Model: sfN = N independent "shards", each statistically identical to the
driver's sf0.1 documents table (31-word vocabulary, uniform doc lengths
8-108 words, 5% near-dup docs = earlier doc + ' dup' suffix), with each
shard's vocabulary suffixed (w -> w<shard>) so cross-shard texts share no
shingles. This mirrors how real corpora scale (vocabulary grows with corpus;
similarity structure is local), and isolates ENGINE scaling from the
quadratic candidate blow-up a fixed 31-word vocabulary would cause at 10x
density — that blow-up is a property of the synthetic data, not of the
bucketed operators under test.

Embeddings: N x 2000 random unit-norm float32[64] vectors, labels 0-9 —
the same distribution as the driver's table (verified: unit norms, no
cluster structure, max pairwise cos ~0.6).

Deterministic (seed 42). Writes ONLY under the given output dir.

Usage: gen_scale.py <outDir> [shards=10]
"""
import sys
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = ['a', 'agg', 'batch', 'big', 'column', 'customer', 'data', 'fast',
         'filter', 'group', 'hash', 'join', 'key', 'line', 'merge', 'order',
         'part', 'query', 'row', 'scan', 'slow', 'small', 'sort', 'spark',
         'stream', 'table', 'the', 'value', 'vector', 'window']  # sans 'dup'
DOCS_PER_SHARD = 5000
DUP_FRAC = 0.05
VECS_PER_SHARD = 2000
DIM = 64

def main():
    out = sys.argv[1]
    shards = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    rng = np.random.default_rng(42)
    import os
    os.makedirs(out, exist_ok=True)

    ids, texts, langs, sources, nchars = [], [], [], [], []
    doc_id = 0
    for sh in range(shards):
        vocab = VOCAB if sh == 0 else [f"{w}{sh}" for w in VOCAB]
        shard_texts = []
        for i in range(DOCS_PER_SHARD):
            if i > 0 and rng.random() < DUP_FRAC:
                t = shard_texts[rng.integers(0, len(shard_texts))] + ' dup'
            else:
                n = rng.integers(8, 109)
                t = ' '.join(rng.choice(vocab, size=n))
            shard_texts.append(t)
            ids.append(doc_id); texts.append(t); langs.append('en')
            sources.append(f'src{doc_id % 20}'); nchars.append(len(t))
            doc_id += 1
    pq.write_table(pa.table({
        'doc_id': pa.array(ids, pa.int64()), 'text': texts,
        'lang': langs, 'source': sources,
        'n_chars': pa.array(nchars, pa.int32())}), f'{out}/documents.parquet')

    n = shards * VECS_PER_SHARD
    M = rng.standard_normal((n, DIM)).astype(np.float32)
    M /= np.linalg.norm(M, axis=1, keepdims=True)
    pq.write_table(pa.table({
        'vec_id': pa.array(range(n), pa.int64()),
        'embedding': pa.array([v.tolist() for v in M], pa.list_(pa.float32())),
        'label': pa.array((rng.integers(0, 10, n)).tolist(), pa.int32())}),
        f'{out}/embeddings.parquet')
    print(f'wrote {doc_id} docs, {n} vecs to {out}')

if __name__ == '__main__':
    main()
