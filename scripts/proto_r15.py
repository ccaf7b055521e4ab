#!/usr/bin/env python3
"""Round-15 oracle-SQL prototypes (q442-q448) against sf0.01, each checked
against an independent pure-python/duckdb-bruteforce reference BEFORE the
Scala lands (the round-workflow convention)."""
import duckdb, math, sys

SF = sys.argv[1] if len(sys.argv) > 1 else '/root/testdata/sf0.01'
con = duckdb.connect()
for t in ['embeddings', 'documents', 'events', 'customer']:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

def splitmix_plane(p, d):
    M = (1 << 64) - 1
    z = (p * 1000003 + d + 0x9E3779B97F4A7C15) & M
    z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & M
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & M
    z = z ^ (z >> 31)
    return ((z >> 11) / float(1 << 53)) * 2.0 - 1.0

# ---------------------------------------------------------------- q442
n_emb = con.sql("SELECT count(*) FROM embeddings").fetchone()[0]
mod442 = max(1, n_emb // 128)
q442 = f"""WITH s AS (SELECT vec_id AS sid, label AS sl,
    CAST(embedding AS DOUBLE[]) AS sv FROM embeddings
    WHERE vec_id % greatest(1, (SELECT count(*) // 128 FROM embeddings)) = 0),
p AS (SELECT vec_id AS pid, label AS pl,
    CAST(embedding AS DOUBLE[]) AS pv FROM embeddings),
sn AS (SELECT sid, sl, sv, list_dot_product(sv, sv) AS snorm FROM s),
pn AS (SELECT pid, pl, pv, list_dot_product(pv, pv) AS pnorm FROM p),
pr AS (SELECT sid, sl, pl,
    CAST(round(sqrt(greatest(snorm + pnorm - 2 * list_dot_product(sv, pv), 0))
      * 100000, 0) AS BIGINT) AS d
  FROM pn CROSS JOIN sn WHERE pid <> sid),
pc AS (SELECT sid, sl, pl, sum(d) AS sm, count(*) AS n FROM pr GROUP BY 1, 2, 3),
ab AS (SELECT sid, sl,
    max(CASE WHEN pl = sl THEN CAST(sm AS DOUBLE) / CAST(n AS DOUBLE) END) AS a,
    min(CASE WHEN pl <> sl THEN CAST(sm AS DOUBLE) / CAST(n AS DOUBLE) END) AS b
  FROM pc GROUP BY 1, 2)
SELECT sid AS vec_id, sl AS label,
  (round(a / 100000, 4) + 0.0) AS a_dist, (round(b / 100000, 4) + 0.0) AS b_dist,
  (round((b - a) / greatest(a, b), 4) + 0.0) AS silhouette
FROM ab WHERE a IS NOT NULL AND b IS NOT NULL ORDER BY vec_id"""
r442 = con.sql(q442).df()
exp_rows = con.sql(f"SELECT count(*) FROM embeddings WHERE vec_id % {mod442} = 0").fetchone()[0]
print(f"q442: rows={len(r442)} (sample size ~{exp_rows}, mod={mod442}) "
      f"sil range [{r442.silhouette.min()}, {r442.silhouette.max()}]")
assert len(r442) == exp_rows, "every sampled point must have a and b at sf0.01"

# ---------------------------------------------------------------- q443
# 16 sign-bit hyperplane code, dynamic power-of-2 cell count from n//32
planes = [[splitmix_plane(p, d) for d in range(64)] for p in range(16)]
bit_exprs = []
for j in range(16):
    arr = "[" + ",".join(f"CAST({v!r} AS DOUBLE)" for v in planes[j]) + "]"
    bit_exprs.append(f"(CASE WHEN list_dot_product(v, {arr}) >= 0.0 THEN {1 << j} ELSE 0 END)")
code = " + ".join(bit_exprs)
# power-of-2 cell-count ladder on q = n // 32 (identical CASE both engines)
ladder = "CASE " + " ".join(
    f"WHEN q >= {1 << b} THEN {1 << (b + 1)}" for b in range(15, -1, -1)) + " ELSE 1 END"
q443 = f"""WITH nn AS (SELECT count(*) // 32 AS q FROM embeddings),
cells AS (SELECT {ladder} AS c FROM nn),
b AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
coded AS (SELECT vec_id, v, ({code}) % (SELECT c FROM cells) AS cell FROM b),
dropped AS (SELECT DISTINCT hi.vec_id
  FROM coded hi JOIN coded lo ON hi.cell = lo.cell AND lo.vec_id < hi.vec_id
  WHERE list_dot_product(hi.v, lo.v) /
    (sqrt(list_dot_product(hi.v, hi.v)) * sqrt(list_dot_product(lo.v, lo.v))) > 0.4)
SELECT c.vec_id, c.cell, CASE WHEN d.vec_id IS NULL THEN 1 ELSE 0 END AS kept
FROM coded c LEFT JOIN dropped d ON d.vec_id = c.vec_id ORDER BY c.vec_id"""
r443 = con.sql(q443).df()
# python reference
vecs = {r[0]: r[1] for r in con.sql(
    "SELECT vec_id, CAST(embedding AS DOUBLE[]) FROM embeddings").fetchall()}
q = n_emb // 32
cells = 1
while cells <= q:
    cells *= 2
def cell_of(v):
    c = 0
    for j in range(16):
        if sum(a * b for a, b in zip(v, planes[j])) >= 0.0:
            c += 1 << j
    return c % cells
py_cell = {i: cell_of(v) for i, v in vecs.items()}
bycell = {}
for i, c in py_cell.items():
    bycell.setdefault(c, []).append(i)
def cos(a, b):
    d = sum(x * y for x, y in zip(a, b))
    return d / math.sqrt(sum(x * x for x in a) * sum(x * x for x in b))
py_kept = {}
for c, ids in bycell.items():
    ids.sort()
    for i, hi in enumerate(ids):
        py_kept[hi] = 0 if any(cos(vecs[hi], vecs[lo]) > 0.4 for lo in ids[:i]) else 1
mism = [(r.vec_id, r.cell, r.kept) for r in r443.itertuples()
        if py_cell[r.vec_id] != r.cell or py_kept[r.vec_id] != r.kept]
occ = sorted(len(v) for v in bycell.values())
print(f"q443: rows={len(r443)} cells_used={len(bycell)}/{cells} occ max={occ[-1]} "
      f"dropped={sum(1 for k in py_kept.values() if k == 0)} mismatches={len(mism)}")
assert not mism, mism[:5]

# ---------------------------------------------------------------- q444
# semantics identical to q62 -> its oracle is q62's SQL; check the
# prefix-rank identity in python against the direct join count
ev = con.sql("SELECT event_id, CAST(ts AS TIMESTAMP) ts, event_type FROM events").fetchall()
clicks = sorted(r[1] for r in ev if r[2] == 'click')
import bisect
from datetime import timedelta
direct = con.sql("""WITH ev AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, event_type FROM events),
s AS (SELECT event_id, ts FROM ev WHERE event_type = 'signup'),
c AS (SELECT ts AS cts FROM ev WHERE event_type = 'click')
SELECT s.event_id, count(*) FROM s JOIN c ON cts BETWEEN s.ts - INTERVAL 30 MINUTE
  AND s.ts + INTERVAL 30 MINUTE GROUP BY 1 ORDER BY 1""").fetchall()
bad = 0
for eid, cnt in direct:
    t = next(r[1] for r in ev if r[0] == eid)
    lo = bisect.bisect_left(clicks, t - timedelta(minutes=30))
    hi = bisect.bisect_right(clicks, t + timedelta(minutes=30))
    if hi - lo != cnt:
        bad += 1
print(f"q444: rank identity holds on {len(direct)} signups, mismatches={bad}")
assert bad == 0

# ---------------------------------------------------------------- q445
q445 = """WITH base AS (SELECT c_custkey, c_name FROM customer
  UNION ALL SELECT * FROM (VALUES (900000001, 'Customer#A00001111'),
    (900000002, 'Customer#B00001111')) t(c_custkey, c_name)),
g AS (SELECT c_name, min(c_custkey) AS gid, count(*) AS cnt FROM base GROUP BY 1),
v AS (SELECT gid, c_name, CASE WHEN t.i = 0 THEN c_name
    ELSE substr(c_name, 1, CAST(t.i AS INT) - 1) || substr(c_name, CAST(t.i AS INT) + 1) END AS var
  FROM g, LATERAL (SELECT unnest(range(0, length(c_name) + 1)) AS i) t),
cand AS (SELECT DISTINCT a.gid AS gid_a, b.gid AS gid_b
  FROM v a JOIN v b ON a.var = b.var AND a.gid < b.gid),
ok AS (SELECT gid_a, gid_b, levenshtein(ga.c_name, gb.c_name) AS dist,
    ga.cnt AS n_a, gb.cnt AS n_b
  FROM cand JOIN g ga ON ga.gid = cand.gid_a JOIN g gb ON gb.gid = cand.gid_b
  WHERE levenshtein(ga.c_name, gb.c_name) <= 1)
SELECT gid_a, gid_b, CAST(dist AS BIGINT) AS dist,
  CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b
FROM ok ORDER BY gid_a, gid_b"""
r445 = con.sql(q445).df()
# ground truth: full cross join lev<=1 on distinct names (sf0.01: 1502^2)
truth = con.sql("""WITH base AS (SELECT c_custkey, c_name FROM customer
  UNION ALL SELECT * FROM (VALUES (900000001, 'Customer#A00001111'),
    (900000002, 'Customer#B00001111')) t(c_custkey, c_name)),
g AS (SELECT c_name, min(c_custkey) AS gid FROM base GROUP BY 1)
SELECT a.gid, b.gid FROM g a JOIN g b ON a.gid < b.gid
WHERE levenshtein(a.c_name, b.c_name) <= 1""").fetchall()
got = set(zip(r445.gid_a, r445.gid_b))
exp = set(truth)
print(f"q445: pairs={len(got)} truth={len(exp)} "
      f"missed={len(exp - got)} extra={len(got - exp)}")
assert got == exp, "deletion-neighborhood must have FULL recall at lev<=1"

# ---------------------------------------------------------------- q446
# components over q445 pairs; python union-find reference
parent = {}
def find(x):
    while parent.setdefault(x, x) != x:
        parent[x] = parent[parent[x]]
        x = parent[x]
    return x
def union(a, b):
    ra, rb = find(a), find(b)
    if ra != rb:
        parent[max(ra, rb)] = min(ra, rb)
for a, b in exp:
    union(a, b)
gids = [r[0] for r in con.sql("""WITH base AS (SELECT c_custkey, c_name FROM customer
  UNION ALL SELECT * FROM (VALUES (900000001, 'Customer#A00001111'),
    (900000002, 'Customer#B00001111')) t(c_custkey, c_name))
SELECT min(c_custkey) FROM base GROUP BY c_name""").fetchall()]
# min-label convergence: iterate to the true min of each component
changed = True
while changed:
    changed = False
    for a, b in exp:
        ra, rb = find(a), find(b)
        if ra != rb:
            union(a, b); changed = True
comp = {g: find(g) for g in gids}
sizes = {}
for g, c in comp.items():
    sizes[c] = sizes.get(c, 0) + 1
n_comp = len(set(comp.values()))
big = max(sizes.values())
print(f"q446: groups={len(gids)} components={n_comp} largest={big}")

# ---------------------------------------------------------------- q447
# pruned confirm: prefilter 10*lendiff <= maxlen, threshold sim_bp >= 9000.
# check: prefilter drops NO pair that would confirm (lev >= lendiff bound)
chk = con.sql("""SELECT count(*) FROM documents a JOIN documents b ON a.doc_id < b.doc_id
WHERE 10 * abs(length(a.text) - length(b.text)) > greatest(length(a.text), length(b.text), 1)
  AND 10000 - ((10000 * levenshtein(a.text, b.text)) // greatest(length(a.text), length(b.text), 1)) >= 9000
""").fetchone()[0]
print(f"q447: prefiltered-yet-confirmable pairs (must be 0): {chk}")
assert chk == 0
surv = con.sql("""SELECT count(*), sum(CASE WHEN 10 * abs(length(a.text) - length(b.text))
  <= greatest(length(a.text), length(b.text), 1) THEN 1 ELSE 0 END)
FROM documents a JOIN documents b ON a.doc_id < b.doc_id""").fetchone()
print(f"q447: all-pairs={surv[0]} pass-prefilter={surv[1]} ({100.0 * surv[1] / surv[0]:.1f}%)")

# ---------------------------------------------------------------- q448
q448 = """WITH u AS (SELECT DISTINCT user_id FROM events WHERE user_id IS NOT NULL),
nn AS (SELECT greatest(1, 33750000 // count(*)) AS r2 FROM u),
ww AS (SELECT r2, CAST(floor(sqrt(CAST(r2 AS DOUBLE))) AS BIGINT) + 1 AS w FROM nn),
p AS (SELECT user_id, (user_id * 7919) % 1001 - 500 AS px,
    (user_id * 104729) % 1001 - 500 AS py FROM u),
c AS (SELECT user_id, px, py, (px + 500) // (SELECT w FROM ww) AS cx,
    (py + 500) // (SELECT w FROM ww) AS cy FROM p),
o AS (SELECT CAST(unnest([-1, 0, 1]) AS BIGINT) AS d),
pr AS (SELECT c.user_id AS u_a, px AS xa, py AS ya,
    cx + ox.d AS cx, cy + oy.d AS cy FROM c, o ox, o oy),
j AS (SELECT pr.u_a,
    (pr.xa - b.px) * (pr.xa - b.px) + (pr.ya - b.py) * (pr.ya - b.py) AS dist2
  FROM pr JOIN c b ON pr.cx = b.cx AND pr.cy = b.cy AND pr.u_a <> b.user_id)
SELECT u_a, count(*) AS n_neighbors, CAST(min(dist2) AS BIGINT) AS min_dist2,
  CAST(sum(dist2) AS BIGINT) AS sum_dist2
FROM j WHERE dist2 <= (SELECT r2 FROM ww) GROUP BY 1 ORDER BY 1"""
r448 = con.sql(q448).df()
truth448 = con.sql("""WITH u AS (SELECT DISTINCT user_id FROM events WHERE user_id IS NOT NULL),
nn AS (SELECT greatest(1, 33750000 // count(*)) AS r2 FROM u),
p AS (SELECT user_id, (user_id * 7919) % 1001 - 500 AS px,
    (user_id * 104729) % 1001 - 500 AS py FROM u)
SELECT a.user_id, count(*), CAST(min((a.px-b.px)*(a.px-b.px)+(a.py-b.py)*(a.py-b.py)) AS BIGINT),
  CAST(sum((a.px-b.px)*(a.px-b.px)+(a.py-b.py)*(a.py-b.py)) AS BIGINT)
FROM p a JOIN p b ON a.user_id <> b.user_id
WHERE (a.px-b.px)*(a.px-b.px)+(a.py-b.py)*(a.py-b.py) <= (SELECT r2 FROM nn)
GROUP BY 1 ORDER BY 1""").df()
same = (len(r448) == len(truth448) and
        (r448.values == truth448.values).all())
r2v = con.sql("SELECT greatest(1, 33750000 // count(DISTINCT user_id)) FROM events WHERE user_id IS NOT NULL").fetchone()[0]
print(f"q448: rows={len(r448)} r2={r2v} matches bruteforce: {same}")
assert same

print("ALL PROTOTYPES PASS")
