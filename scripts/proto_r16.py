#!/usr/bin/env python3
"""Round-16 prototypes (driver-side only, never shipped):
q453 graph-ANN beam search — pure-python reference vs the unrolled DuckDB
SQL, on sf0.001 embeddings with a placeholder cell function (vec_id % 16;
the real key uses the q443 LSH cells, same mechanics)."""
import duckdb

SF = "/root/testdata/sf0.001"
con = duckdb.connect()
con.sql(f"CREATE VIEW embeddings AS SELECT * FROM '{SF}/embeddings.parquet'")
con.sql(f"CREATE VIEW events AS SELECT * FROM '{SF}/events.parquet'")
con.sql(f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")

# ---------- pure-python reference ----------
rows = con.sql(
    "SELECT vec_id, CAST(embedding AS DOUBLE[]) FROM embeddings ORDER BY vec_id"
).fetchall()
vec = {r[0]: r[1] for r in rows}
ids = sorted(vec)
n = len(ids)

def cos_q(a, b):
    va, vb = vec[a], vec[b]
    dot = sum(x * y for x, y in zip(va, vb))
    na = sum(x * x for x in va) ** 0.5
    nb = sum(x * x for x in vb) ** 0.5
    import decimal
    # mirror round-half-even? both engines use round() (half away from 0 on
    # DuckDB, HALF_UP shortest-string on Spark) — micro grid on cos<=1 so
    # python round() (half-even) can differ at exact .5 micro boundaries;
    # accepted for the PROTOTYPE only (real gate compares engine vs duckdb)
    return int(round(dot / (na * nb) * 1e6))

CELLS = 16
cell = {i: i % CELLS for i in ids}

# edges: within-cell top-4 by (cos DESC, id), symmetrized
from collections import defaultdict
bycell = defaultdict(list)
for i in ids:
    bycell[cell[i]].append(i)
edges = set()
for c, members in bycell.items():
    for s in members:
        cands = sorted(((-cos_q(s, d), d) for d in members if d != s))[:4]
        for _, d in cands:
            edges.add((s, d))
            edges.add((d, s))
adj = defaultdict(list)
for s, d in edges:
    adj[s].append(d)

BEAM, HOPS, K = 8, 4, 5
queries = [i for i in ids if i < 8]
py_out = {}
for q in queries:
    entry = min(i for i in ids if i != q)
    v = {entry: cos_q(q, entry)}
    for _ in range(HOPS):
        cand = dict(v)
        for node in v:
            for d in adj[node]:
                if d != q and d not in cand:
                    cand[d] = cos_q(q, d)
        v = dict(sorted(cand.items(), key=lambda kv: (-kv[1], kv[0]))[:BEAM])
    top = sorted(v.items(), key=lambda kv: (-kv[1], kv[0]))[:K]
    py_out[q] = [(node, cq) for node, cq in top]

# ---------- DuckDB unrolled SQL ----------
def round_cte(i):
    return f"""
nb{i} AS (SELECT v.query_id, e.dst AS node FROM v{i-1} v JOIN edges e ON e.src = v.node
          WHERE e.dst <> v.query_id),
cand{i} AS (SELECT query_id, node FROM v{i-1} UNION SELECT query_id, node FROM nb{i}),
sc{i} AS (SELECT c.query_id, c.node, d.cq,
            row_number() OVER (PARTITION BY c.query_id ORDER BY d.cq DESC, c.node) AS rn
          FROM cand{i} c JOIN dist d ON d.query_id = c.query_id AND d.node = c.node),
v{i} AS (SELECT query_id, node, cq FROM sc{i} WHERE rn <= 8)"""

sql = f"""
WITH vecs AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vv FROM embeddings),
cellv AS (SELECT vec_id, vv, vec_id % {CELLS} AS cell FROM vecs),
pairs AS (SELECT a.vec_id AS src, b.vec_id AS dst,
    CAST(round(list_dot_product(a.vv, b.vv) /
      (sqrt(list_dot_product(a.vv, a.vv)) * sqrt(list_dot_product(b.vv, b.vv))) * 1000000, 0) AS BIGINT) AS cq
  FROM cellv a JOIN cellv b ON a.cell = b.cell AND a.vec_id <> b.vec_id),
ranked AS (SELECT src, dst, row_number() OVER (PARTITION BY src ORDER BY cq DESC, dst) AS rn FROM pairs),
edges AS (SELECT src, dst FROM ranked WHERE rn <= 4
          UNION SELECT dst, src FROM ranked WHERE rn <= 4),
q AS (SELECT vec_id AS query_id, vv AS qv FROM vecs WHERE vec_id < 8),
dist AS (SELECT q.query_id, c.vec_id AS node,
    CAST(round(list_dot_product(q.qv, c.vv) /
      (sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(c.vv, c.vv))) * 1000000, 0) AS BIGINT) AS cq
  FROM q CROSS JOIN vecs c WHERE c.vec_id <> q.query_id),
entry AS (SELECT query_id, min(node) AS node FROM dist GROUP BY 1),
v0 AS (SELECT e.query_id, e.node, d.cq FROM entry e
       JOIN dist d ON d.query_id = e.query_id AND d.node = e.node),
{','.join(round_cte(i) for i in range(1, 5))}
SELECT query_id, node, cq,
  row_number() OVER (PARTITION BY query_id ORDER BY cq DESC, node) AS rn
FROM v4 QUALIFY rn <= 5 ORDER BY query_id, rn
"""
duck = con.sql(sql).fetchall()
duck_out = defaultdict(list)
for qid, node, cq, rn in duck:
    duck_out[qid].append((node, cq))

ok = True
for q in queries:
    if py_out[q] != duck_out[q]:
        ok = False
        print(f"MISMATCH q={q}\n  py  ={py_out[q]}\n  duck={duck_out[q]}")
print("PROTO q453:", "MATCH" if ok else "MISMATCH", {q: py_out[q][:2] for q in queries[:2]})

# ================= q455 late-data audit =================
# model (pinned by LateProbeSpec): batch b = day index i carries on-time
# rows of day i (id%17!=0) + late rows of day i-3 (id%17==0); a row is
# dropped iff ts <= (max event ts over batches <= b-2) - horizon(1 day)
import datetime
evs = con.sql(f"SELECT event_id, CAST(ts AS TIMESTAMP) FROM '{SF}/events.parquet'").fetchall()
days_sorted = sorted({e[1].date() for e in evs})
didx = {d: i for i, d in enumerate(days_sorted)}
D = len(days_sorted)
batches2 = defaultdict(list)
for eid, ts in evs:
    i = didx[ts.date()]
    b = i + 3 if eid % 17 == 0 else i
    batches2[b].append((eid, ts))
H = datetime.timedelta(days=1)
maxts = {}
for b in sorted(batches2):
    prev = maxts.get(b - 1, datetime.datetime.min)
    cur = max(t for _, t in batches2[b])
    maxts[b] = max(prev, cur)
py_del = set()
for b in sorted(batches2):
    wm = maxts.get(b - 2)
    for eid, ts in batches2[b]:
        if wm is None or ts > wm - H:
            py_del.add(eid)
py_audit = defaultdict(lambda: [0, 0])
for eid, ts in evs:
    d = ts.date()
    py_audit[d][0] += 1
    if eid in py_del:
        py_audit[d][1] += 1

sql455 = """
WITH ev AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts,
    date_trunc('day', CAST(ts AS TIMESTAMP)) AS d FROM events),
days AS (SELECT d, row_number() OVER (ORDER BY d) - 1 AS i
  FROM (SELECT DISTINCT d FROM ev)),
rb AS (SELECT e.event_id, e.ts, e.d,
    CASE WHEN e.event_id % 17 = 0 THEN dd.i + 3 ELSE dd.i END AS b
  FROM ev e JOIN days dd ON dd.d = e.d),
bm AS (SELECT b, max(ts) AS mt FROM rb GROUP BY 1),
spine AS (SELECT CAST(unnest(range(0, (SELECT max(b) + 1 FROM rb))) AS BIGINT) AS b),
wm AS (SELECT s.b,
    max(bm.mt) OVER (ORDER BY s.b ROWS BETWEEN UNBOUNDED PRECEDING AND 2 PRECEDING)
      - INTERVAL 1 DAY AS w
  FROM spine s LEFT JOIN bm ON bm.b = s.b),
deliv AS (SELECT r.event_id, r.d FROM rb r JOIN wm ON wm.b = r.b
  WHERE wm.w IS NULL OR r.ts > wm.w)
SELECT CAST(e.d AS DATE) AS day, CAST(count(*) AS BIGINT) AS total,
  CAST(count(dv.event_id) AS BIGINT) AS delivered,
  CAST(count(*) - count(dv.event_id) AS BIGINT) AS late_dropped
FROM ev e LEFT JOIN deliv dv ON dv.event_id = e.event_id
GROUP BY 1 ORDER BY 1
"""
duck455 = {r[0]: (r[1], r[2]) for r in con.sql(sql455).fetchall()}
ok455 = all(duck455[d] == (tot, dl) for d, (tot, dl) in py_audit.items())
print("PROTO q455:", "MATCH" if ok455 else "MISMATCH",
      sorted((str(d), v) for d, v in list(py_audit.items())[:3]))
if not ok455:
    for d in sorted(py_audit):
        if duck455[d] != tuple(py_audit[d]):
            print("  day", d, "py", py_audit[d], "duck", duck455[d])

# ================= q456 WHT audio fingerprint =================
def wht64(a):
    a = list(a)
    bit = 1
    while bit < 64:
        for i in range(64):
            if i & bit == 0:
                x, y = a[i], a[i + bit]
                a[i], a[i + bit] = x + y, x - y
        bit *= 2
    return a

docs = con.sql(f"SELECT doc_id, substr(sha256(substr(text, 1, 40)), 1, 8) FROM '{SF}/documents.parquet'").fetchall()
py_fp = {}
for did, hx in docs:
    seed = int(hx, 16)
    samples = [(seed + i * 2654435761) % 65536 - 32768 for i in range(64)]
    w = wht64(samples)
    fp = sum((1 << (j - 1)) for j in range(1, 33) if w[j] > 0)
    py_fp[did] = fp

stage_sql = []
prev = "a0"
bit = 1
while bit < 64:
    cur = f"a{bit * 2 if bit > 1 else 2}" if False else f"s{bit}"
    stage_sql.append(
        f"{cur} AS (SELECT doc_id, list_transform(range(0, 64), i -> "
        f"CASE WHEN (i & {bit}) = 0 THEN a[CAST(i + 1 AS INT)] + a[CAST(i + {bit} + 1 AS INT)] "
        f"ELSE a[CAST(i - {bit} + 1 AS INT)] - a[CAST(i + 1 AS INT)] END) AS a FROM {prev})")
    prev = cur
    bit *= 2
sql456 = f"""
WITH sd AS (SELECT doc_id, CAST(CAST(('0x' || substr(sha256(substr(text, 1, 40)), 1, 8)) AS UBIGINT) AS BIGINT) AS seed FROM documents),
a0 AS (SELECT doc_id, list_transform(range(0, 64), i -> (seed + i * 2654435761) % 65536 - 32768) AS a FROM sd),
{','.join(stage_sql)}
SELECT doc_id, CAST(list_sum(list_transform(range(1, 33), j ->
  CASE WHEN a[CAST(j + 1 AS INT)] > 0 THEN (CAST(1 AS BIGINT) << CAST(j - 1 AS INT)) ELSE 0 END)) AS BIGINT) AS fp
FROM {prev} ORDER BY doc_id
"""
duck456 = dict(con.sql(sql456).fetchall())
ok456 = all(duck456[d] == f for d, f in py_fp.items())
ndup = len(py_fp) - len(set(py_fp.values()))
print("PROTO q456:", "MATCH" if ok456 else "MISMATCH", "dup-fps:", ndup)
if not ok456:
    bad = [d for d in py_fp if duck456[d] != py_fp[d]][:3]
    for d in bad:
        print("  doc", d, "py", py_fp[d], "duck", duck456[d])

# ================= q457 mergeable quantile summaries =================
# per-shard (event_id % 8) equi-depth 32-bound summaries, merged estimate
# vs exact global quantiles, all exact integers
evs2 = con.sql("SELECT event_id, CAST(round(value * 100, 0) AS BIGINT) FROM events").fetchall()
from collections import defaultdict as dd2
shards = dd2(list)
for eid, cents in evs2:
    shards[eid % 8].append(cents)
B = 32
merged = []
for sh, vals in shards.items():
    vals.sort()
    ns = len(vals)
    prev = 0
    for i in range(1, B + 1):
        r = (i * ns) // B
        w = r - prev
        prev = r
        if w > 0:
            merged.append((vals[r - 1], w))  # bound = value at rank r (1-based)
merged.sort()
N = sum(w for _, w in merged)
allv = sorted(v for _, v in evs2)
assert N == len(allv)
PS = [1, 5, 25, 50, 75, 95, 99]
py457 = {}
for p in PS:
    r = -(-p * N // 100)  # ceil
    cum = 0
    est = None
    for v, w in merged:
        cum += w
        if cum >= r:
            est = v
            break
    exact = allv[r - 1]
    py457[p] = (est, exact, abs(est - exact))

sql457 = """
WITH ev AS (SELECT event_id % 8 AS shard, CAST(round(value * 100, 0) AS BIGINT) AS cents FROM events),
hist AS (SELECT shard, cents, count(*) AS c FROM ev GROUP BY 1, 2),
cum AS (SELECT shard, cents, c,
    sum(c) OVER (PARTITION BY shard ORDER BY cents) AS cr,
    sum(c) OVER (PARTITION BY shard) AS ns
  FROM hist),
sz AS (SELECT shard, max(ns) AS ns FROM cum GROUP BY 1),
bk AS (SELECT shard,
    (CAST(t.i AS BIGINT) * ns) // 32 AS r,
    (CAST(t.i AS BIGINT) * ns) // 32 - ((CAST(t.i AS BIGINT) - 1) * ns) // 32 AS w
  FROM sz, LATERAL (SELECT unnest(range(1, 33)) AS i) t),
summ AS (SELECT b.shard, b.r, b.w, min(c.cents) AS cents
  FROM bk b JOIN cum c ON c.shard = b.shard AND c.cr >= b.r
  WHERE b.w > 0 GROUP BY 1, 2, 3),
mg AS (SELECT cents, sum(w) AS w FROM summ GROUP BY 1),
mc AS (SELECT cents, w, sum(w) OVER (ORDER BY cents) AS cw, sum(w) OVER () AS n FROM mg),
exact_h AS (SELECT cents, count(*) AS c FROM ev GROUP BY 1),
ec AS (SELECT cents, sum(c) OVER (ORDER BY cents) AS cr, sum(c) OVER () AS n FROM exact_h),
ps AS (SELECT CAST(unnest([1, 5, 25, 50, 75, 95, 99]) AS BIGINT) AS p),
tgt AS (SELECT p, -((-p * (SELECT max(n) FROM ec)) // 100) AS r FROM ps),
est AS (SELECT t.p, min(m.cents) AS est FROM tgt t JOIN mc m ON m.cw >= t.r GROUP BY 1),
exq AS (SELECT t.p, min(e.cents) AS exact FROM tgt t JOIN ec e ON e.cr >= t.r GROUP BY 1)
SELECT e.p, CAST(e.est AS BIGINT) AS est_cents, CAST(x.exact AS BIGINT) AS exact_cents,
  CAST(abs(e.est - x.exact) AS BIGINT) AS abs_err
FROM est e JOIN exq x USING (p) ORDER BY e.p
"""
duck457 = {r[0]: (r[1], r[2], r[3]) for r in con.sql(sql457).fetchall()}
ok457 = all(duck457[p] == py457[p] for p in PS)
print("PROTO q457:", "MATCH" if ok457 else "MISMATCH", py457)
if not ok457:
    for p in PS:
        if duck457[p] != py457[p]:
            print("  p", p, "py", py457[p], "duck", duck457[p])
