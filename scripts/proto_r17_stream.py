"""Round-17 prototype: q452/q455 at 2-day-bucket batch granularity.

Pure-python replay of the PINNED Spark 4.1 watermark semantics
(StreamingSpec probes, SCALE.md round 16):
  - state entry = (key, expiry = firstSeen + horizon); dups never refresh
  - batch N's watermark = max event ts through batches <= N-2, minus horizon
  - eviction BEFORE batch N at wm >= expiry; late row dropped at ts <= wm
vs candidate DuckDB oracle SQL on the same bucket spine.
"""
import duckdb, sys, datetime
BD = int(sys.argv[2]) if len(sys.argv) > 2 else 2  # bucket days

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
con = duckdb.connect()
con.execute(f"CREATE VIEW events AS SELECT * FROM '{sf}/events.parquet'")

DAY = datetime.timedelta(days=1)

# ---------------------------------------------------------------- q452 sim
rows = con.execute("""
  SELECT DISTINCT user_id, date_trunc('day', CAST(ts AS TIMESTAMP)) AS d
  FROM events WHERE user_id IS NOT NULL""").fetchall()
d0 = min(r[1] for r in rows)
# 2-day bucket start timestamp
def bucket(d): return d0 + DAY * (BD * ((d - d0).days // BD))
ub = sorted({(u, bucket(d)) for u, d in rows})
buckets = sorted({b for _, b in ub})
span_b = ((buckets[-1] - buckets[0]).days // BD) + 1
h_b = max(1, span_b // 6)            # horizon in buckets
H = DAY * (BD * h_b)                 # horizon duration
by_bucket = {}
for u, b in ub: by_bucket.setdefault(b, []).append(u)

state = {}   # user -> expiry
emitted = [] # (user, bucket)
maxts = []   # max event ts per batch
for n, b in enumerate(buckets):
    wm = (max(maxts[:n-1]) - H) if n >= 2 else None   # batches <= N-2
    if wm is not None:
        state = {k: e for k, e in state.items() if not (wm >= e)}
    for u in by_bucket[b]:
        if wm is not None and b <= wm: continue        # late drop
        if u not in state:
            state[u] = b + H
            emitted.append((u, b))
    maxts.append(b)  # all rows in batch have ts = bucket start
sim452 = {}
for u, b in sorted(emitted):
    sim452.setdefault(u, []).append(b)
def _d(x):
    return x.date() if hasattr(x, "date") and not isinstance(x, datetime.date) or isinstance(x, datetime.datetime) else x
sim452 = {(u, _d(b), i + 1) for u, bs in sim452.items() for i, b in enumerate(sorted(bs))}

# candidate oracle SQL (bucket spine, era recursion unrolled)
sql452 = """
WITH ev0 AS (SELECT DISTINCT user_id, date_trunc('day', CAST(ts AS TIMESTAMP)) AS rd
  FROM events WHERE user_id IS NOT NULL),
d0 AS (SELECT min(rd) AS d0 FROM ev0),
ev AS (SELECT DISTINCT user_id,
    d0.d0 + INTERVAL 1 DAY * ({BD} * (date_diff('day', d0.d0, rd) // {BD})) AS d
  FROM ev0, d0),
span AS (SELECT {BD} * greatest(1, (date_diff('day', min(d), max(d)) // {BD} + 1) // 6) AS hd FROM ev),
days AS (SELECT d, lag(d, 2) OVER (ORDER BY d) AS evict_base
  FROM (SELECT DISTINCT d FROM ev)),
e1 AS (SELECT user_id, min(d) AS d FROM ev GROUP BY 1),
e2 AS (SELECT ev.user_id, min(ev.d) AS d FROM ev
  JOIN e1 USING (user_id) JOIN days ON days.d = ev.d
  WHERE days.evict_base IS NOT NULL
    AND date_diff('day', e1.d, days.evict_base) >= 2 * (SELECT hd FROM span) GROUP BY 1),
e3 AS (SELECT ev.user_id, min(ev.d) AS d FROM ev
  JOIN e2 USING (user_id) JOIN days ON days.d = ev.d
  WHERE days.evict_base IS NOT NULL
    AND date_diff('day', e2.d, days.evict_base) >= 2 * (SELECT hd FROM span) GROUP BY 1),
e4 AS (SELECT ev.user_id, min(ev.d) AS d FROM ev
  JOIN e3 USING (user_id) JOIN days ON days.d = ev.d
  WHERE days.evict_base IS NOT NULL
    AND date_diff('day', e3.d, days.evict_base) >= 2 * (SELECT hd FROM span) GROUP BY 1),
e5 AS (SELECT ev.user_id, min(ev.d) AS d FROM ev
  JOIN e4 USING (user_id) JOIN days ON days.d = ev.d
  WHERE days.evict_base IS NOT NULL
    AND date_diff('day', e4.d, days.evict_base) >= 2 * (SELECT hd FROM span) GROUP BY 1),
kept AS (SELECT user_id, d FROM e1 UNION ALL SELECT user_id, d FROM e2
  UNION ALL SELECT user_id, d FROM e3 UNION ALL SELECT user_id, d FROM e4
  UNION ALL SELECT user_id, d FROM e5)
SELECT user_id, CAST(d AS DATE) AS day,
  CAST(row_number() OVER (PARTITION BY user_id ORDER BY d) AS BIGINT) AS era
FROM kept ORDER BY user_id, era"""
got452 = set(map(tuple, con.execute(sql452.replace("{BD}", str(BD))).fetchall()))
print("q452 buckets:", len(buckets), "h_b:", h_b,
      "sim rows:", len(sim452), "sql rows:", len(got452),
      "MATCH" if sim452 == got452 else "MISMATCH")
if sim452 != got452:
    print(" sim-only:", sorted(sim452 - got452)[:5])
    print(" sql-only:", sorted(got452 - sim452)[:5])

# ---------------------------------------------------------------- q455 sim
rows = con.execute("""
  SELECT event_id, CAST(ts AS TIMESTAMP) AS ts,
    date_trunc('day', CAST(ts AS TIMESTAMP)) AS d
  FROM events WHERE event_id IS NOT NULL""").fetchall()
d0 = min(r[2] for r in rows)
bidx = lambda d: (d - d0).days // BD
nb = max(bidx(r[2]) for r in rows) + 1
DELAY = 3
H55 = DAY  # 1 day horizon
batches = {}
for eid, ts, d in rows:
    b = bidx(d) + DELAY if eid % 17 == 0 else bidx(d)
    batches.setdefault(b, []).append((eid, ts))
delivered = set()
batch_max = []   # per-batch max event ts (None for empty)
for n in range(nb + DELAY):
    cur = batches.get(n, [])
    prior = [m for m in batch_max[:max(0, n-1)] if m is not None]
    wm = (max(prior) - H55) if prior else None
    for eid, ts in cur:
        if wm is not None and ts <= wm: continue
        delivered.add(eid)
    batch_max.append(max((ts for _, ts in cur), default=None))
sim455 = {}
for eid, ts, d in rows:
    k = _d(d)
    t, dl = sim455.get(k, (0, 0))
    sim455[k] = (t + 1, dl + (1 if eid in delivered else 0))
sim455 = {(k, t, dl, t - dl) for k, (t, dl) in sim455.items()}

sql455 = """
WITH ev AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts,
    date_trunc('day', CAST(ts AS TIMESTAMP)) AS d FROM events
    WHERE event_id IS NOT NULL),
d0 AS (SELECT min(d) AS d0 FROM ev),
rb AS (SELECT e.event_id, e.ts, e.d,
    CASE WHEN e.event_id % 17 = 0
      THEN date_diff('day', d0.d0, e.d) // {BD} + 3
      ELSE date_diff('day', d0.d0, e.d) // {BD} END AS b
  FROM ev e, d0),
bm AS (SELECT b, max(ts) AS mt FROM rb GROUP BY 1),
spine AS (SELECT CAST(unnest(range(0, (SELECT max(b) + 1 FROM rb))) AS BIGINT) AS b),
wm AS (SELECT s.b,
    max(bm.mt) OVER (ORDER BY s.b ROWS BETWEEN UNBOUNDED PRECEDING AND 2 PRECEDING)
      - INTERVAL 1 DAY AS w
  FROM spine s LEFT JOIN bm ON bm.b = s.b),
deliv AS (SELECT r.event_id FROM rb r JOIN wm ON wm.b = r.b
  WHERE wm.w IS NULL OR r.ts > wm.w)
SELECT CAST(e.d AS DATE) AS day, CAST(count(*) AS BIGINT) AS total,
  CAST(count(dv.event_id) AS BIGINT) AS delivered,
  CAST(count(*) - count(dv.event_id) AS BIGINT) AS late_dropped
FROM ev e LEFT JOIN deliv dv ON dv.event_id = e.event_id
GROUP BY 1 ORDER BY 1"""
got455 = set(map(tuple, con.execute(sql455.replace("{BD}", str(BD))).fetchall()))
print("q455 batches:", nb + DELAY,
      "sim rows:", len(sim455), "sql rows:", len(got455),
      "MATCH" if sim455 == got455 else "MISMATCH")
if sim455 != got455:
    print(" sim-only:", sorted(sim455 - got455)[:5])
    print(" sql-only:", sorted(got455 - sim455)[:5])
