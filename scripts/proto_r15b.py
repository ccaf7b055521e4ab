#!/usr/bin/env python3
"""q450 prototype: k=16 micro-Lloyd (2 iters, first-16 seeds), then q58-shape
nprobe=1 cosine search under untrained (raw first-16) vs trained centroids,
recall@5 vs exact — all in DuckDB, values eyeballed for the claim
'trained >= untrained' before the Scala lands."""
import duckdb, sys

SF = sys.argv[1] if len(sys.argv) > 1 else '/root/testdata/sf0.01'
con = duckdb.connect()
con.sql(f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{SF}/embeddings.parquet')")

K = 16
lloyd = f"""
comp AS (SELECT vec_id, t.d AS dim,
    CAST(round(CAST(embedding[CAST(t.d AS BIGINT)] AS DOUBLE) * 1000000, 0)
      AS BIGINT) AS vm
  FROM embeddings, LATERAL (SELECT unnest(range(1, len(embedding) + 1)) AS d) t),
c0 AS (SELECT vec_id AS cell, dim, vm AS cm FROM comp WHERE vec_id < {K}),
dd1 AS (SELECT c.vec_id, ct.cell, sum((c.vm - ct.cm) * (c.vm - ct.cm)) AS d2
  FROM comp c JOIN c0 ct USING (dim) GROUP BY 1, 2),
b1 AS (SELECT vec_id, min(d2) AS md FROM dd1 GROUP BY 1),
a1 AS (SELECT d.vec_id, min(d.cell) AS cell FROM dd1 d
  JOIN b1 b ON b.vec_id = d.vec_id AND d.d2 = b.md GROUP BY 1),
c1 AS (SELECT a.cell, c.dim,
    CAST(floor(CAST(sum(c.vm) AS DOUBLE) / count(*)) AS BIGINT) AS cm
  FROM comp c JOIN a1 a USING (vec_id) GROUP BY 1, 2),
dd2 AS (SELECT c.vec_id, ct.cell, sum((c.vm - ct.cm) * (c.vm - ct.cm)) AS d2
  FROM comp c JOIN c1 ct USING (dim) GROUP BY 1, 2),
b2 AS (SELECT vec_id, min(d2) AS md FROM dd2 GROUP BY 1),
a2 AS (SELECT d.vec_id, min(d.cell) AS cell FROM dd2 d
  JOIN b2 b ON b.vec_id = d.vec_id AND d.d2 = b.md GROUP BY 1),
c2 AS (SELECT a.cell, c.dim,
    CAST(floor(CAST(sum(c.vm) AS DOUBLE) / count(*)) AS BIGINT) AS cm
  FROM comp c JOIN a2 a USING (vec_id) GROUP BY 1, 2)"""

q = f"""WITH {lloyd},
vecs AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vv FROM embeddings),
cl0 AS (SELECT vec_id AS cell, vv AS cv FROM vecs WHERE vec_id < {K}),
cl2 AS (SELECT cell, list(cm / 1000000.0 ORDER BY dim) AS cv FROM c2 GROUP BY 1),
qv AS (SELECT vec_id AS query_id, vv AS qvv FROM vecs WHERE vec_id < 8),
bs AS (SELECT query_id, vec_id AS neighbor_id,
  list_dot_product(qvv, vv) / (sqrt(list_dot_product(qvv, qvv)) * sqrt(list_dot_product(vv, vv))) AS cosine
  FROM vecs CROSS JOIN qv WHERE vec_id <> query_id),
tr AS (SELECT query_id, neighbor_id FROM (SELECT query_id, neighbor_id,
  row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rn
  FROM bs) WHERE rn <= 5),
cc0 AS (SELECT x.vec_id, c.cell,
  row_number() OVER (PARTITION BY x.vec_id ORDER BY
    list_dot_product(x.vv, c.cv) / (sqrt(list_dot_product(x.vv, x.vv)) * sqrt(list_dot_product(c.cv, c.cv))) DESC,
    c.cell) AS crn
  FROM vecs x CROSS JOIN cl0 c),
cc2 AS (SELECT x.vec_id, c.cell,
  row_number() OVER (PARTITION BY x.vec_id ORDER BY
    list_dot_product(x.vv, c.cv) / (sqrt(list_dot_product(x.vv, x.vv)) * sqrt(list_dot_product(c.cv, c.cv))) DESC,
    c.cell) AS crn
  FROM vecs x CROSS JOIN cl2 c),
s0 AS (SELECT qp.vec_id AS query_id, a.vec_id AS neighbor_id,
    list_dot_product(q.vv, n.vv) / (sqrt(list_dot_product(q.vv, q.vv)) * sqrt(list_dot_product(n.vv, n.vv))) AS cosine
  FROM (SELECT vec_id, cell FROM cc0 WHERE vec_id < 8 AND crn <= 1) qp
  JOIN (SELECT vec_id, cell FROM cc0 WHERE crn = 1) a ON a.cell = qp.cell
    AND a.vec_id <> qp.vec_id
  JOIN vecs q ON q.vec_id = qp.vec_id JOIN vecs n ON n.vec_id = a.vec_id),
t0 AS (SELECT query_id, neighbor_id FROM (SELECT query_id, neighbor_id,
  row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rn
  FROM s0) WHERE rn <= 5),
s2 AS (SELECT qp.vec_id AS query_id, a.vec_id AS neighbor_id,
    list_dot_product(q.vv, n.vv) / (sqrt(list_dot_product(q.vv, q.vv)) * sqrt(list_dot_product(n.vv, n.vv))) AS cosine
  FROM (SELECT vec_id, cell FROM cc2 WHERE vec_id < 8 AND crn <= 1) qp
  JOIN (SELECT vec_id, cell FROM cc2 WHERE crn = 1) a ON a.cell = qp.cell
    AND a.vec_id <> qp.vec_id
  JOIN vecs q ON q.vec_id = qp.vec_id JOIN vecs n ON n.vec_id = a.vec_id),
t2 AS (SELECT query_id, neighbor_id FROM (SELECT query_id, neighbor_id,
  row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rn
  FROM s2) WHERE rn <= 5),
h0 AS (SELECT tr.query_id, count(t0.neighbor_id) AS hits0 FROM tr
  LEFT JOIN t0 ON t0.query_id = tr.query_id AND t0.neighbor_id = tr.neighbor_id GROUP BY 1),
h2 AS (SELECT tr.query_id, count(t2.neighbor_id) AS hits2 FROM tr
  LEFT JOIN t2 ON t2.query_id = tr.query_id AND t2.neighbor_id = tr.neighbor_id GROUP BY 1)
SELECT h0.query_id, CAST(hits0 AS BIGINT) AS hits_untrained,
  CAST(hits2 AS BIGINT) AS hits_trained
FROM h0 JOIN h2 USING (query_id) ORDER BY query_id"""
df = con.sql(q).df()
print(df)
print('total untrained', df.hits_untrained.sum(), 'trained', df.hits_trained.sum())
