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

Usage: gen_scale.py <outDir> [shards=10] [events]
  (third arg 'events' writes only the events slice via gen_events)
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

def gen_events(out_dir, shards):
    """10x events slice for the events-table SCALE probes: same shape as the
    driver's sf0.1 events (ns timestamps, 2-dp values, 5 event types,
    JSON-ish props), N independent month-long shards with disjoint user/event
    id ranges so per-user group sizes stay sf0.1-like (engine scaling, not
    synthetic hot keys)."""
    rng = np.random.default_rng(42)
    types = np.array(['view', 'click', 'purchase', 'signup', 'error'])
    tables = []
    n = 100_000
    for s in range(shards):
        ts = (np.datetime64('2024-01-01').astype('datetime64[ns]').astype(np.int64)
              + rng.integers(0, 30 * 86400 * 10**9, n, dtype=np.int64))
        tables.append(pa.table({
            'event_id': pa.array(s * n + np.arange(n, dtype=np.int64)),
            'ts': pa.array(np.sort(ts).astype('datetime64[ns]')),
            'user_id': pa.array(s * 1500 + rng.integers(0, 1500, n, dtype=np.int64)),
            'event_type': pa.array(types[rng.integers(0, 5, n)]),
            'value': pa.array(np.round(rng.uniform(0, 500, n) * rng.uniform(0, 1, n) ** 2, 2)),
            'props': pa.array(['{"k":%d}' % v for v in rng.integers(0, 100, n)]),
        }))
    pq.write_table(pa.concat_tables(tables), f'{out_dir}/events.parquet')
    print(f'wrote {shards * n} events to {out_dir}')

def gen_lineitem(out_dir, shards, src='/root/testdata/sf0.1/lineitem.parquet'):
    """Nx lineitem slice for the graph-family SCALE probes (q120/q185 read
    only (l_orderkey, l_partkey)): N disjoint shards, each the sf0.1 pair
    list with orderkeys/partkeys offset into its own id range. This
    reproduces sf0.1's exact per-order/per-part degree distribution per
    shard — the way TPC-H itself scales (order AND part counts grow, lines
    per order stay fixed), so the probe measures engine scaling on 10x
    nodes+edges, not a synthetic density blow-up. Deterministic (pure
    replication, no RNG)."""
    t = pq.read_table(src, columns=['l_orderkey', 'l_partkey'])
    ok = t.column('l_orderkey').to_numpy()
    pk = t.column('l_partkey').to_numpy()
    o_span = int(ok.max()) + 1
    p_span = int(pk.max()) + 1
    tables = [pa.table({
        'l_orderkey': pa.array(ok + s * o_span, pa.int64()),
        'l_partkey': pa.array(pk + s * p_span, pa.int64())})
        for s in range(shards)]
    pq.write_table(pa.concat_tables(tables), f'{out_dir}/lineitem.parquet')
    print(f'wrote {shards * len(ok)} lineitem rows to {out_dir}')

def gen_clustered(out_dir, shards, k=32, sigma=0.05, seed=7):
    """CLUSTERED embeddings fixture for the ANN recall probes (q256/q268/
    q269): the driver's synthetic embeddings are i.i.d. uniform on the
    sphere, so every composed-index recall curve is an honest negative —
    there is no cluster structure for IVF cell pruning or a PQ codebook to
    exploit, and the harness can only prove the levers DON'T work. This
    fixture plants k Gaussian clusters on the unit sphere (centers uniform,
    per-point noise sigma before re-normalization), the regime real text /
    image embeddings live in (semantic neighborhoods = local clusters), so
    the same probes can show recall RISING with nprobe and codebook size.
    Same schema/row-count model as the uniform table (shards x 2000 x
    float32[64], unit-norm, label = cluster mod 10); deterministic seed.

    sigma is PER-COORDINATE, so the noise vector's norm is sigma*sqrt(64):
    at sigma=0.05 that is 0.4 against a unit center, giving within-cluster
    cosine ~= 1/(1+0.4^2) ~= 0.86 and cross-cluster cosine ~= 0.1 — the
    true top-k of a query is inside its own cluster with overwhelming
    probability, which is exactly the structure IVF assumes."""
    rng = np.random.default_rng(seed)
    n = shards * VECS_PER_SHARD
    centers = rng.standard_normal((k, DIM)).astype(np.float32)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    assign = rng.integers(0, k, n)
    M = centers[assign] + sigma * rng.standard_normal((n, DIM)).astype(np.float32)
    M /= np.linalg.norm(M, axis=1, keepdims=True)
    pq.write_table(pa.table({
        'vec_id': pa.array(range(n), pa.int64()),
        'embedding': pa.array([v.tolist() for v in M], pa.list_(pa.float32())),
        'label': pa.array((assign % 10).astype(np.int32))}),
        f'{out_dir}/embeddings.parquet')
    print(f'wrote {n} clustered vecs (k={k}, sigma={sigma}) to {out_dir}')

def gen_full(out_dir, shards, src='/root/testdata/sf0.1'):
    """FULL 10-table sfN slice for the whole-gate replay at 100x the gate
    SF: every table the driver generates, scaled by the shard-union model
    (N disjoint shards, statistically identical to sf0.1 each):

    - region/nation: fixed dimensions, copied verbatim (TPC-H itself never
      scales them);
    - customer/supplier/part/orders/lineitem: sf0.1 rows with every PRIMARY
      and FOREIGN key offset into the shard's id range (nationkey stays --
      the dim is fixed), so per-key group sizes, join fan-outs, and value
      distributions are exactly sf0.1's while key domains grow Nx -- the
      way TPC-H scale factors actually behave;
    - events: sf0.1 events with event_id/user_id offset per shard (disjoint
      user ranges, same month -- densifies the timeline Nx, per-user
      behavior unchanged);
    - documents: shard 0 is the driver table verbatim; later shards suffix
      every word with the shard id (same lengths/lang/source mix, zero
      cross-shard shingle overlap -- a fixed 31-word vocabulary at 10x
      density would quadratically blow up near-dup candidates, a property
      of the synthetic data, not the operators);
    - embeddings: shard 0 verbatim; later shards fresh unit-norm
      float32[64] from the same i.i.d.-uniform distribution.

    Deterministic (seed 42). Writes ONLY under out_dir."""
    import os
    import shutil
    import pyarrow.compute as pc
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(42)
    for t in ['region', 'nation']:
        shutil.copyfile(f'{src}/{t}.parquet', f'{out_dir}/{t}.parquet')

    def shard_union(table, keycols):
        t = pq.read_table(f'{src}/{table}.parquet')
        spans = {c: int(pc.max(t.column(c)).as_py()) + 1 for c in keycols}
        parts = []
        for s in range(shards):
            cols = []
            for name in t.schema.names:
                col = t.column(name).combine_chunks()
                if name in keycols and s > 0:
                    col = pc.add(col, s * spans[name])
                cols.append(col)
            parts.append(pa.table(dict(zip(t.schema.names, cols))))
        pq.write_table(pa.concat_tables(parts), f'{out_dir}/{table}.parquet')
        print(f'wrote {table}: {shards * t.num_rows} rows')

    shard_union('customer', ['c_custkey'])
    shard_union('supplier', ['s_suppkey'])
    shard_union('part', ['p_partkey'])
    shard_union('orders', ['o_orderkey', 'o_custkey'])
    shard_union('lineitem', ['l_orderkey', 'l_partkey', 'l_suppkey'])
    shard_union('events', ['event_id', 'user_id'])

    docs = pq.read_table(f'{src}/documents.parquet')
    n_docs = docs.num_rows
    texts = docs.column('text').to_pylist()
    langs = docs.column('lang').to_pylist()
    sources = docs.column('source').to_pylist()
    d_ids, d_texts, d_langs, d_src, d_nchars = [], [], [], [], []
    for s in range(shards):
        for i in range(n_docs):
            t = texts[i] if s == 0 else ' '.join(
                f'{w}{s}' for w in texts[i].split(' '))
            d_ids.append(s * n_docs + i)
            d_texts.append(t)
            d_langs.append(langs[i])
            d_src.append(sources[i])
            d_nchars.append(len(t))
    pq.write_table(pa.table({
        'doc_id': pa.array(d_ids, pa.int64()), 'text': d_texts,
        'lang': d_langs, 'source': d_src,
        'n_chars': pa.array(d_nchars, pa.int64())}),
        f'{out_dir}/documents.parquet')
    print(f'wrote documents: {shards * n_docs} rows')

    emb = pq.read_table(f'{src}/embeddings.parquet')
    n_vec = emb.num_rows
    base = np.array(emb.column('embedding').to_pylist(), dtype=np.float32)
    base_labels = np.asarray(emb.column('label').to_pylist(), dtype=np.int32)
    dim = base.shape[1]
    vecs, labels = [base], [base_labels]
    for s in range(1, shards):
        M = rng.standard_normal((n_vec, dim)).astype(np.float32)
        M /= np.linalg.norm(M, axis=1, keepdims=True)
        vecs.append(M)
        labels.append(rng.integers(0, 10, n_vec).astype(np.int32))
    allv = np.concatenate(vecs)
    pq.write_table(pa.table({
        'vec_id': pa.array(range(shards * n_vec), pa.int64()),
        'embedding': pa.array([v.tolist() for v in allv], pa.list_(pa.float32())),
        'label': pa.array(np.concatenate(labels))}),
        f'{out_dir}/embeddings.parquet')
    print(f'wrote embeddings: {shards * n_vec} rows')


if __name__ == '__main__':
    if len(sys.argv) > 3 and sys.argv[3] == 'full':
        gen_full(sys.argv[1], int(sys.argv[2]))
    elif len(sys.argv) > 3 and sys.argv[3] == 'clustered':
        import os
        os.makedirs(sys.argv[1], exist_ok=True)
        sig = float(sys.argv[4]) if len(sys.argv) > 4 else 0.05
        kk = int(sys.argv[5]) if len(sys.argv) > 5 else 32
        gen_clustered(sys.argv[1], int(sys.argv[2]), k=kk, sigma=sig)
    elif len(sys.argv) > 3 and sys.argv[3] == 'events':
        gen_events(sys.argv[1], int(sys.argv[2]))
    elif len(sys.argv) > 3 and sys.argv[3] == 'lineitem':
        import os
        os.makedirs(sys.argv[1], exist_ok=True)
        gen_lineitem(sys.argv[1], int(sys.argv[2]))
    else:
        main()
