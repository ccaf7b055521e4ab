package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import SparkEntry._
import graft.ops.{Num, Similarity}

/** Registry part: round-16 additions (q451+).
  *
  * q451 closes the 100 TB ANN serving story (round-15 verdict item 3):
  * asymmetric-distance (ADC) search over the STORED PQ codes — the query
  * stays full-precision, the corpus is scored from its 8-bit codes through
  * a per-query lookup table, so the serving tier never reads the corpus
  * vectors (Jégou, Douze, Schmid, "Product Quantization for Nearest
  * Neighbor Search", TPAMI 2011, §IV.A).
  *
  * q452 pins the TTL-bounded streaming-dedup contract (round-15 verdict
  * item 5) under the gate: see [[graft.stream.Streaming.streamTtlDedupEras]]
  * for the measured eviction semantics the oracle replays.
  *
  * Same contract as every part: deterministic output order, exact integers
  * or bit-equal fixed-order doubles everywhere the gate hashes.
  */
private[graft] object RegistryRound16 {

  val queries: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
    "q451_adc_search" -> ((s, dir) => {
      // ADC search over q449's serving layout: per-query LUT of squared-L2
      // distances to every (subspace, codeword) — |queries|·m·K rows of
      // driver-broadcastable metadata — then each candidate in the probed
      // cell scores as the SUM OF 4 TABLE LOOKUPS on its stored codes; the
      // candidate's embedding column is never touched. LUT entries land on
      // the 1e-6 integer grid before the sum, so the additive score is an
      // exact integer (order-free, engine-agnostic). Ranking: ADC distance
      // asc, neighbor id tie-break; recall@5 of the code-scored ranking vs
      // the exact float truth rides along per row (the q450 readout
      // discipline: the number that justifies shipping 8-bit codes).
      val emb = T(s, dir, "embeddings")
      val queries = emb.filter(col("vec_id") < 8)
      val (idxCells, queryCells) = RegistryRound15.annServingParts(s, dir)
      def sliced(df: DataFrame, idAs: String, vecAs: String) = df.select(
        col("vec_id").as(idAs),
        posexplode(expr(
          "transform(sequence(0, 3), i -> slice(embedding, i * 16 + 1, 16))"))
          .as(Seq("sub", vecAs)))
      val qs = sliced(queries, "query_id", "qs")
      val cb = sliced(emb.filter(col("vec_id") < 8), "code", "cs")
      val lut = qs.join(cb, "sub")
        .select(col("query_id"), col("sub"), col("code"),
          Num.roundz((Similarity.dot("qs", "qs")
            - lit(2.0) * Similarity.dot("qs", "cs")
            + Similarity.dot("cs", "cs")) * lit(1000000d))
            .cast("long").as("lq"))
      val cand = idxCells.join(queryCells, "cell")
        .filter(col("neighbor_id") =!= col("query_id"))
        .select(col("query_id"), col("neighbor_id"),
          posexplode(array(col("c0"), col("c1"), col("c2"), col("c3")))
            .as(Seq("sub", "code")))
      val adc = cand.join(broadcast(lut), Seq("query_id", "sub", "code"))
        .groupBy(col("query_id"), col("neighbor_id"))
        .agg(sum(col("lq")).as("adc_d2q"))
      val ranked = adc.withColumn("rn", row_number().over(
          Window.partitionBy(col("query_id"))
            .orderBy(col("adc_d2q"), col("neighbor_id"))).cast("long"))
        .filter(col("rn") <= 5)
      val truth = Similarity.cosineTopK(emb, queries, "vec_id", "embedding", 5)
        .select(col("query_id").as("__tq"), col("neighbor_id").as("__tn"))
      ranked.join(truth,
          col("query_id") === col("__tq") && col("neighbor_id") === col("__tn"),
          "left")
        .withColumn("hit", when(col("__tn").isNotNull, 1L).otherwise(0L))
        .withColumn("hits_at_5",
          sum(col("hit")).over(Window.partitionBy(col("query_id"))).cast("long"))
        .select(col("query_id"), col("rn"), col("neighbor_id"),
          col("adc_d2q"), col("hit"), col("hits_at_5"))
        .orderBy("query_id", "rn")
    }),
    "q452_stream_ttl_dedup" -> ((s, dir) =>
      graft.stream.Streaming.streamTtlDedupEras(s, dir, s"$TMP/stream_ttl")
        .orderBy("user_id", "era")),
    "q453_graph_ann" -> ((s, dir) => {
      // GRAPH-based ANN — the third serving family next to IVF (q58/q449)
      // and LSH (q55): a bounded-degree proximity graph built once (each
      // node's top-4 cosine neighbors WITHIN its LSH cell, symmetrized —
      // build cost n·occupancy, occupancy ~32-64 by the q443 knob), then
      // batched greedy BEAM SEARCH from a fixed entry node: 4 hops, beam 8,
      // candidates re-ranked on the 1e-6 cosine grid with id tie-breaks
      // (public knowledge: NSW/Vamana-style best-first over a neighbor
      // graph, batched per hop for the dataflow engine). The scale
      // property: each hop touches only |beam|·degree candidate ids per
      // query — the corpus is read by ID-KEYED point lookups, never
      // scanned; recall@5 vs the exact truth rides along (the q451
      // readout discipline).
      val emb = T(s, dir, "embeddings")
      val n = emb.count()
      val cells = math.min(RegistryRound15.pow2Above(n / 32L),
        1L << RegistryRound15.signaturePlanes)
      val coded = Similarity.lshBands(emb, "vec_id", "embedding",
        numPlanes = RegistryRound15.signaturePlanes, bands = 1, dim = 64)
        .select(col("vec_id"), col("embedding"),
          pmod(col("bucket"), lit(cells)).as("cell"))
        .localCheckpoint() // self-join: signature computed once
      val la = coded.select(col("cell"), col("vec_id").as("src"),
        col("embedding").as("sv"))
      val lb = coded.select(col("cell"), col("vec_id").as("dst"),
        col("embedding").as("dv"))
      val out4 = la.join(lb, Seq("cell"))
        .filter(col("src") =!= col("dst"))
        .withColumn("cq", Num.roundz((Similarity.dot("sv", "dv") /
          (Similarity.norm("sv") * Similarity.norm("dv"))) * lit(1000000d))
          .cast("long"))
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("src")).orderBy(col("cq").desc, col("dst"))))
        .filter(col("rn") <= 4)
        .select(col("src"), col("dst"))
      val edges = out4
        .unionByName(out4.select(col("dst").as("src"), col("src").as("dst")))
        .distinct().localCheckpoint()
      val queries = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
      val corpus = emb.select(col("vec_id").as("node"), col("embedding").as("nv"))
      def withDist(cand: DataFrame): DataFrame =
        cand.join(corpus, "node")
          .join(broadcast(queries), "query_id")
          .select(col("query_id"), col("node"),
            Num.roundz((Similarity.dot("qv", "nv") /
              (Similarity.norm("qv") * Similarity.norm("nv"))) * lit(1000000d))
              .cast("long").as("cq"))
      // entry: the smallest corpus id that isn't the query itself
      val lowIds = emb.select(col("vec_id")).orderBy("vec_id").limit(2)
        .collect().map(_.getLong(0))
      var v = withDist(queries.select(col("query_id"),
        when(col("query_id") === lowIds(0), lit(lowIds(1)))
          .otherwise(lit(lowIds(0))).as("node"))).localCheckpoint()
      for (_ <- 1 to 4) {
        val nbrs = v.select(col("query_id"), col("node"))
          .join(edges, col("node") === col("src"))
          .select(col("query_id"), col("dst").as("node"))
          .filter(col("node") =!= col("query_id"))
        val cand = v.select(col("query_id"), col("node"))
          .unionByName(nbrs).distinct()
        v = withDist(cand)
          .withColumn("rn", row_number().over(
            Window.partitionBy(col("query_id"))
              .orderBy(col("cq").desc, col("node"))))
          .filter(col("rn") <= 8).drop("rn")
          .localCheckpoint() // flat lineage per hop
      }
      val ranked = v.withColumn("rn", row_number().over(
          Window.partitionBy(col("query_id"))
            .orderBy(col("cq").desc, col("node"))).cast("long"))
        .filter(col("rn") <= 5)
      val truth = Similarity.cosineTopK(emb,
          emb.filter(col("vec_id") < 8), "vec_id", "embedding", 5)
        .select(col("query_id").as("__tq"), col("neighbor_id").as("__tn"))
      ranked.join(truth,
          col("query_id") === col("__tq") && col("node") === col("__tn"),
          "left")
        .withColumn("hit", when(col("__tn").isNotNull, 1L).otherwise(0L))
        .withColumn("hits_at_5",
          sum(col("hit")).over(Window.partitionBy(col("query_id"))).cast("long"))
        .select(col("query_id"), col("rn"), col("node").as("neighbor_id"),
          col("cq").as("cos_q"), col("hit"), col("hits_at_5"))
        .orderBy("query_id", "rn")
    }),
    "q455_late_data_audit" -> ((s, dir) =>
      // the per-day delivery ledger of a watermarked ingest with 3-day
      // stragglers under a 1-day horizon: most delayed rows are dropped as
      // LATE (the measured lag-2 watermark rule); see
      // Streaming.lateDataAudit for the pinned semantics
      graft.stream.Streaming.lateDataAudit(s, dir, s"$TMP/stream_late")
        .orderBy("day")),
    "q456_audio_fingerprint" -> ((s, dir) => {
      // Walsh–Hadamard audio fingerprint dedup: per doc a 64-sample PCM
      // waveform derives from a seed hashed off the doc's leading 40 chars
      // (so docs sharing their opening content share audio — the planted
      // '+ dup' family collides by construction), a REAL WAV container is
      // synthesized and REALLY parsed back (javax.sound), the decoded
      // samples fingerprint through the exact-integer WHT (see
      // Multimodal.whtFingerprint), and matching is one equi-join on the
      // 64-bit key. Output: every doc with its fingerprint, canonical
      // group id (min doc_id) and group size.
      import s.implicits._
      // coalesce BEFORE the seed derivation: a null text must fingerprint
      // as the empty waveform on both engines, not null-poison the typed
      // decode (r16 advice — the generator permits null text)
      val seeded = T(s, dir, "documents").select(col("doc_id"),
        expr("CAST(conv(substring(sha2(substring(coalesce(text, ''), 1, 40), 256), 1, 8), 16, 10) AS BIGINT)")
          .as("seed"))
      val wavs = seeded.as[(Long, Long)].mapPartitions(_.map { case (id, seed) =>
        val samples = Array.tabulate(64)(i =>
          (((seed + i.toLong * 2654435761L) % 65536L) - 32768L).toShort)
        (id, graft.multimodal.Multimodal.synthWavSamples(samples, 16000))
      }).toDF("doc_id", "payload")
      val fps = graft.multimodal.Multimodal.whtFingerprint(wavs, "doc_id")
      val groups = fps.groupBy(col("fp"))
        .agg(min(col("doc_id")).as("group_id"), count(lit(1)).as("group_size"))
      fps.join(groups, "fp")
        .select(col("doc_id"), col("fp"), col("group_id"),
          col("group_size").cast("long").as("group_size"))
        .orderBy("doc_id")
    }),
    "q457_quantile_merge" -> ((s, dir) => {
      // MERGEABLE quantile summaries — the distributed-percentile pattern
      // a 100 TB deployment actually runs: each shard (event_id % 8,
      // standing in for 8 independent ingest partitions) reduces to a
      // 32-bound equi-depth summary (bound i = the shard value at exact
      // rank (i·ns) div 32, weight = the rank step — integer weights that
      // sum to ns), the 256-row summary union answers any quantile with
      // bounded rank error, and the key reports estimate vs EXACT global
      // quantile with the absolute error per percentile (the number that
      // justifies shipping summaries instead of raw values). Exact side
      // via the q65 value-histogram discipline (TwoPhase prefix sum over
      // the bounded cents domain — no single-partition window over data).
      val ev = T(s, dir, "events").select(
        (col("event_id") % 8).as("shard"),
        expr("CAST(round(value * 100, 0) AS BIGINT)").as("cents"))
      val hist = ev.groupBy(col("shard"), col("cents"))
        .agg(count(lit(1)).as("c"))
        .localCheckpoint() // feeds the shard CDF AND the exact global CDF
      val cum = hist
        .withColumn("cr", sum(col("c")).over(
          Window.partitionBy(col("shard")).orderBy(col("cents"))))
        .withColumn("ns", sum(col("c")).over(Window.partitionBy(col("shard"))))
        .localCheckpoint() // scanned once per join side below
      val bk = cum.groupBy(col("shard")).agg(max(col("ns")).as("ns"))
        .select(col("shard"), col("ns"),
          explode(expr("sequence(1, 32)")).as("i"))
        .select(col("shard"),
          expr("(i * ns) div 32").as("r"),
          expr("(i * ns) div 32 - ((i - 1) * ns) div 32").as("w"))
        .filter(col("w") > 0)
      val bounds = bk.join(cum, Seq("shard"))
        .filter(col("cr") >= col("r"))
        .groupBy(col("shard"), col("r"), col("w"))
        .agg(min(col("cents")).as("cents"))
      val mg = bounds.groupBy(col("cents")).agg(sum(col("w")).as("w"))
        // <= shards·32 summary rows: the partition-less window is a
        // metadata scan, the accepted q189 convention
        .withColumn("cw", sum(col("w")).over(
          Window.orderBy(col("cents"))))
      val (ec, n) = graft.ops.TwoPhase.prefixSum(
        hist.groupBy(col("cents")).agg(sum(col("c")).as("c")),
        binKey = col("cents"), order = Seq(col("cents")),
        value = col("c"), out = "cr")
      val ps = s.range(1, 2).select(
        explode(expr("array(1L, 5L, 25L, 50L, 75L, 95L, 99L)")).as("p"))
        .withColumn("r", expr(s"(p * ${n}L + 99) div 100"))
      val est = ps.join(mg, col("cw") >= col("r"))
        .groupBy(col("p"), col("r")).agg(min(col("cents")).as("est_cents"))
      val exq = ps.join(ec, col("cr") >= col("r"))
        .groupBy(col("p")).agg(min(col("cents")).as("exact_cents"))
      est.join(exq, "p")
        .select(col("p"), col("est_cents"), col("exact_cents"),
          abs(col("est_cents") - col("exact_cents")).as("abs_err"))
        .orderBy("p")
    }),
    "q454_orc_roundtrip" -> ((s, dir) => {
      // ORC source/sink (Spark-native, the other columnar interchange
      // format next to parquet/q115's XML): hive-partitioned write on the
      // priority key, read back with a partition predicate — the scan
      // lists ONLY the matching partition directory, and every value
      // (including the binary double o_totalprice) round-trips exactly
      val orders = T(s, dir, "orders")
      val tmp = s"$TMP/q454_orc"
      orders.select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
          col("o_orderdate"), col("o_orderpriority"))
        .write.mode("overwrite").partitionBy("o_orderpriority").orc(tmp)
      s.read.orc(tmp)
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
          col("o_orderdate"), col("o_orderpriority"))
        .orderBy("o_orderkey")
    }))

  val oracleSql: Seq[(String, String)] = Seq(
    "q451_adc_search" ->
      // q449's cell assignment + q116's code assignment, the per-query LUT
      // on the 1e-6 integer grid, 4 lookups summed per candidate, then the
      // exact-float top-5 truth for the recall readout
      """WITH vecs AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vv FROM embeddings),
        |cent AS (SELECT vec_id AS cell, vv AS cv FROM vecs WHERE vec_id < 16),
        |scored AS (SELECT x.vec_id, x.vv, c.cell,
        |  row_number() OVER (PARTITION BY x.vec_id ORDER BY
        |    list_dot_product(x.vv, c.cv) / (sqrt(list_dot_product(x.vv, x.vv)) * sqrt(list_dot_product(c.cv, c.cv))) DESC,
        |    c.cell) AS crn
        |  FROM vecs x CROSS JOIN cent c),
        |asg AS (SELECT vec_id, vv, cell FROM scored WHERE crn = 1),
        |subs AS (SELECT vec_id, CAST(s.i AS INT) AS sub,
        |    vv[CAST(s.i * 16 + 1 AS INT) : CAST(s.i * 16 + 16 AS INT)] AS xs
        |  FROM vecs, LATERAL (SELECT unnest(range(0, 4)) AS i) s),
        |cb AS (SELECT vec_id AS code, sub, xs AS cs FROM subs WHERE vec_id < 8),
        |sc AS (SELECT x.vec_id, x.sub, c.code,
        |  row_number() OVER (PARTITION BY x.vec_id, x.sub ORDER BY
        |    list_dot_product(x.xs, x.xs) - 2 * list_dot_product(x.xs, c.cs)
        |      + list_dot_product(c.cs, c.cs), c.code) AS rn
        |  FROM subs x JOIN cb c USING (sub)),
        |codes AS (SELECT vec_id, sub, code FROM sc WHERE rn = 1),
        |lut AS (SELECT qq.vec_id AS query_id, c.sub, c.code,
        |    CAST(round((list_dot_product(qq.xs, qq.xs) - 2 * list_dot_product(qq.xs, c.cs)
        |      + list_dot_product(c.cs, c.cs)) * 1000000, 0) AS BIGINT) AS lq
        |  FROM subs qq JOIN cb c USING (sub) WHERE qq.vec_id < 8),
        |q AS (SELECT vec_id AS query_id, cell FROM asg WHERE vec_id < 8),
        |cand AS (SELECT q.query_id, a.vec_id AS neighbor_id, c.sub, c.code
        |  FROM q JOIN asg a ON a.cell = q.cell AND a.vec_id <> q.query_id
        |  JOIN codes c ON c.vec_id = a.vec_id),
        |adc AS (SELECT query_id, neighbor_id, CAST(sum(lq) AS BIGINT) AS adc_d2q
        |  FROM cand JOIN lut USING (query_id, sub, code) GROUP BY 1, 2),
        |r AS (SELECT query_id, neighbor_id, adc_d2q,
        |  CAST(row_number() OVER (PARTITION BY query_id ORDER BY adc_d2q, neighbor_id) AS BIGINT) AS rn
        |  FROM adc),
        |bs AS (SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
        |    list_dot_product(a.vv, b.vv) / (sqrt(list_dot_product(a.vv, a.vv)) * sqrt(list_dot_product(b.vv, b.vv))) AS cosine
        |  FROM vecs a CROSS JOIN vecs b WHERE a.vec_id < 8 AND b.vec_id <> a.vec_id),
        |truth AS (SELECT query_id, neighbor_id FROM (SELECT query_id, neighbor_id,
        |  row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS trn
        |  FROM bs) WHERE trn <= 5)
        |SELECT r.query_id, r.rn, r.neighbor_id, r.adc_d2q,
        |  CAST(CASE WHEN t.neighbor_id IS NULL THEN 0 ELSE 1 END AS BIGINT) AS hit,
        |  CAST(sum(CASE WHEN t.neighbor_id IS NULL THEN 0 ELSE 1 END)
        |    OVER (PARTITION BY r.query_id) AS BIGINT) AS hits_at_5
        |FROM r LEFT JOIN truth t ON t.query_id = r.query_id AND t.neighbor_id = r.neighbor_id
        |WHERE r.rn <= 5 ORDER BY r.query_id, r.rn""".stripMargin,
    "q452_stream_ttl_dedup" ->
      // the pinned eviction recursion, unrolled on the round-17 3-DAY
      // BUCKET spine (prototyped scripts/proto_r17_stream.py against a
      // pure-python replay of the measured rule): era j+1 = the user's
      // first event bucket whose micro-batch sees an eviction watermark at
      // or past era j's expiry — evict_base(d) = the bucket TWO batches
      // back (the measured commit lag), condition date_diff(era_d,
      // evict_base) >= 2·horizon where horizon = hd = 3·greatest(1,
      // spanBuckets // 6) DAYS (the guard reads 2·hd).
      // Four unrolled rounds cover any span at /6 (eras are >= 2·horizon +
      // 2 buckets apart, so at most 3 fire; e5 is provably empty margin).
      """WITH ev0 AS (SELECT DISTINCT user_id, date_trunc('day', CAST(ts AS TIMESTAMP)) AS rd
        |  FROM events WHERE user_id IS NOT NULL),
        |d0 AS (SELECT min(rd) AS d0 FROM ev0),
        |ev AS (SELECT DISTINCT user_id,
        |    d0.d0 + INTERVAL 1 DAY * (3 * (date_diff('day', d0.d0, rd) // 3)) AS d
        |  FROM ev0, d0),
        |span AS (SELECT 3 * greatest(1, (date_diff('day', min(d), max(d)) // 3 + 1) // 6) AS hd FROM ev),
        |days AS (SELECT d, lag(d, 2) OVER (ORDER BY d) AS evict_base
        |  FROM (SELECT DISTINCT d FROM ev)),
        |e1 AS (SELECT user_id, min(d) AS d FROM ev GROUP BY 1),
        |e2 AS (SELECT ev.user_id, min(ev.d) AS d FROM ev
        |  JOIN e1 USING (user_id) JOIN days ON days.d = ev.d
        |  WHERE days.evict_base IS NOT NULL
        |    AND date_diff('day', e1.d, days.evict_base) >= 2 * (SELECT hd FROM span)
        |  GROUP BY 1),
        |e3 AS (SELECT ev.user_id, min(ev.d) AS d FROM ev
        |  JOIN e2 USING (user_id) JOIN days ON days.d = ev.d
        |  WHERE days.evict_base IS NOT NULL
        |    AND date_diff('day', e2.d, days.evict_base) >= 2 * (SELECT hd FROM span)
        |  GROUP BY 1),
        |e4 AS (SELECT ev.user_id, min(ev.d) AS d FROM ev
        |  JOIN e3 USING (user_id) JOIN days ON days.d = ev.d
        |  WHERE days.evict_base IS NOT NULL
        |    AND date_diff('day', e3.d, days.evict_base) >= 2 * (SELECT hd FROM span)
        |  GROUP BY 1),
        |e5 AS (SELECT ev.user_id, min(ev.d) AS d FROM ev
        |  JOIN e4 USING (user_id) JOIN days ON days.d = ev.d
        |  WHERE days.evict_base IS NOT NULL
        |    AND date_diff('day', e4.d, days.evict_base) >= 2 * (SELECT hd FROM span)
        |  GROUP BY 1),
        |kept AS (SELECT user_id, d FROM e1 UNION ALL SELECT user_id, d FROM e2
        |  UNION ALL SELECT user_id, d FROM e3 UNION ALL SELECT user_id, d FROM e4
        |  UNION ALL SELECT user_id, d FROM e5)
        |SELECT user_id, CAST(d AS DATE) AS day,
        |  CAST(row_number() OVER (PARTITION BY user_id ORDER BY d) AS BIGINT) AS era
        |FROM kept ORDER BY user_id, era""".stripMargin,
    "q453_graph_ann" -> {
      // q443's LSH cells feed the graph build; the 4 beam rounds unroll as
      // (expand ∪ keep, re-rank, cut-to-8) CTE triples — the oracle may be
      // naive (full q×n dist table) where the engine does id-keyed lookups
      val code = lshBandSqlGen(RegistryRound15.signaturePlanes, 1).head
      def round(i: Int) =
        s"""nb$i AS (SELECT v.query_id, e.dst AS node FROM v${i - 1} v
           |  JOIN edges e ON e.src = v.node WHERE e.dst <> v.query_id),
           |cand$i AS (SELECT query_id, node FROM v${i - 1}
           |  UNION SELECT query_id, node FROM nb$i),
           |sc$i AS (SELECT c.query_id, c.node, d.cq,
           |    row_number() OVER (PARTITION BY c.query_id ORDER BY d.cq DESC, c.node) AS rn
           |  FROM cand$i c JOIN dist d ON d.query_id = c.query_id AND d.node = c.node),
           |v$i AS (SELECT query_id, node, cq FROM sc$i WHERE rn <= 8)""".stripMargin
      s"""WITH nn AS (SELECT count(*) // 32 AS q FROM embeddings),
         |cells AS (SELECT ${RegistryRound15.cellLadderSql} AS c FROM nn),
         |b AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |coded AS (SELECT vec_id, v, ($code) % (SELECT c FROM cells) AS cell FROM b),
         |prs AS (SELECT a.vec_id AS src, b2.vec_id AS dst,
         |    CAST(round(list_dot_product(a.v, b2.v) /
         |      (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b2.v, b2.v))) * 1000000, 0) AS BIGINT) AS cq
         |  FROM coded a JOIN coded b2 ON a.cell = b2.cell AND a.vec_id <> b2.vec_id),
         |rk AS (SELECT src, dst, row_number() OVER (PARTITION BY src ORDER BY cq DESC, dst) AS rn FROM prs),
         |edges AS (SELECT src, dst FROM rk WHERE rn <= 4
         |  UNION SELECT dst, src FROM rk WHERE rn <= 4),
         |q AS (SELECT vec_id AS query_id, v AS qv FROM b WHERE vec_id < 8),
         |dist AS (SELECT q.query_id, c.vec_id AS node,
         |    CAST(round(list_dot_product(q.qv, c.v) /
         |      (sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(c.v, c.v))) * 1000000, 0) AS BIGINT) AS cq
         |  FROM q CROSS JOIN b c WHERE c.vec_id <> q.query_id),
         |entry AS (SELECT query_id, min(node) AS node FROM dist GROUP BY 1),
         |v0 AS (SELECT e.query_id, e.node, d.cq FROM entry e
         |  JOIN dist d ON d.query_id = e.query_id AND d.node = e.node),
         |${(1 to 4).map(round).mkString(",\n")},
         |fin AS (SELECT query_id, node, cq,
         |    CAST(row_number() OVER (PARTITION BY query_id ORDER BY cq DESC, node) AS BIGINT) AS rn
         |  FROM v4),
         |bs AS (SELECT a.vec_id AS query_id, c.vec_id AS neighbor_id,
         |    list_dot_product(a.v, c.v) / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(c.v, c.v))) AS cosine
         |  FROM b a CROSS JOIN b c WHERE a.vec_id < 8 AND c.vec_id <> a.vec_id),
         |truth AS (SELECT query_id, neighbor_id FROM (SELECT query_id, neighbor_id,
         |    row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS trn
         |  FROM bs) WHERE trn <= 5)
         |SELECT f.query_id, f.rn, f.node AS neighbor_id, f.cq AS cos_q,
         |  CAST(CASE WHEN t.neighbor_id IS NULL THEN 0 ELSE 1 END AS BIGINT) AS hit,
         |  CAST(sum(CASE WHEN t.neighbor_id IS NULL THEN 0 ELSE 1 END)
         |    OVER (PARTITION BY f.query_id) AS BIGINT) AS hits_at_5
         |FROM fin f LEFT JOIN truth t ON t.query_id = f.query_id AND t.neighbor_id = f.node
         |WHERE f.rn <= 5 ORDER BY f.query_id, f.rn""".stripMargin
    },
    "q454_orc_roundtrip" ->
      // the layout changes the container, never the values — the oracle is
      // the filtered source table
      """SELECT o_orderkey, o_custkey, o_totalprice,
        |  CAST(o_orderdate AS TIMESTAMP) AS o_orderdate, o_orderpriority
        |FROM orders WHERE o_orderpriority = '1-URGENT'
        |ORDER BY o_orderkey""".stripMargin,
    "q455_late_data_audit" ->
      // the measured late rule replayed on the round-17 3-DAY BUCKET spine
      // (prototyped scripts/proto_r17_stream.py): batch = bucket index
      // (+3 for the delayed %17 stream), running max over batches <= N-2
      // minus the 1-day horizon, boundary row dropped (ts > wm survives) —
      // empty batches advance nothing
      """WITH ev AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts,
        |    date_trunc('day', CAST(ts AS TIMESTAMP)) AS d FROM events
        |    WHERE event_id IS NOT NULL),
        |d0 AS (SELECT min(d) AS d0 FROM ev),
        |rb AS (SELECT e.event_id, e.ts, e.d,
        |    CASE WHEN e.event_id % 17 = 0
        |      THEN date_diff('day', d0.d0, e.d) // 3 + 3
        |      ELSE date_diff('day', d0.d0, e.d) // 3 END AS b
        |  FROM ev e, d0),
        |bm AS (SELECT b, max(ts) AS mt FROM rb GROUP BY 1),
        |spine AS (SELECT CAST(unnest(range(0, (SELECT max(b) + 1 FROM rb))) AS BIGINT) AS b),
        |wm AS (SELECT s.b,
        |    max(bm.mt) OVER (ORDER BY s.b ROWS BETWEEN UNBOUNDED PRECEDING AND 2 PRECEDING)
        |      - INTERVAL 1 DAY AS w
        |  FROM spine s LEFT JOIN bm ON bm.b = s.b),
        |deliv AS (SELECT r.event_id FROM rb r JOIN wm ON wm.b = r.b
        |  WHERE wm.w IS NULL OR r.ts > wm.w)
        |SELECT CAST(e.d AS DATE) AS day, CAST(count(*) AS BIGINT) AS total,
        |  CAST(count(dv.event_id) AS BIGINT) AS delivered,
        |  CAST(count(*) - count(dv.event_id) AS BIGINT) AS late_dropped
        |FROM ev e LEFT JOIN deliv dv ON dv.event_id = e.event_id
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q457_quantile_merge" ->
      // the prototyped summary-merge recursion (scripts/proto_r16.py):
      // per-shard CDF, 32 exact-rank bounds with integer weights, merged
      // weighted CDF vs the exact global CDF, ceil-rank targets
      """WITH ev AS (SELECT event_id % 8 AS shard,
        |    CAST(round(value * 100, 0) AS BIGINT) AS cents FROM events),
        |hist AS (SELECT shard, cents, count(*) AS c FROM ev GROUP BY 1, 2),
        |cum AS (SELECT shard, cents, c,
        |    sum(c) OVER (PARTITION BY shard ORDER BY cents) AS cr,
        |    sum(c) OVER (PARTITION BY shard) AS ns
        |  FROM hist),
        |sz AS (SELECT shard, max(ns) AS ns FROM cum GROUP BY 1),
        |bk AS (SELECT shard,
        |    (CAST(t.i AS BIGINT) * ns) // 32 AS r,
        |    (CAST(t.i AS BIGINT) * ns) // 32 - ((CAST(t.i AS BIGINT) - 1) * ns) // 32 AS w
        |  FROM sz, LATERAL (SELECT unnest(range(1, 33)) AS i) t),
        |summ AS (SELECT b.shard, b.r, b.w, min(c.cents) AS cents
        |  FROM bk b JOIN cum c ON c.shard = b.shard AND c.cr >= b.r
        |  WHERE b.w > 0 GROUP BY 1, 2, 3),
        |mg AS (SELECT cents, sum(w) AS w FROM summ GROUP BY 1),
        |mc AS (SELECT cents, w, sum(w) OVER (ORDER BY cents) AS cw FROM mg),
        |eh AS (SELECT cents, sum(c) AS c FROM hist GROUP BY 1),
        |ec AS (SELECT cents, sum(c) OVER (ORDER BY cents) AS cr,
        |    sum(c) OVER () AS n FROM eh),
        |ps AS (SELECT CAST(unnest([1, 5, 25, 50, 75, 95, 99]) AS BIGINT) AS p),
        |tgt AS (SELECT p, (p * (SELECT max(n) FROM ec) + 99) // 100 AS r FROM ps),
        |est AS (SELECT t.p, min(m.cents) AS est_cents FROM tgt t
        |  JOIN mc m ON m.cw >= t.r GROUP BY 1),
        |exq AS (SELECT t.p, min(e.cents) AS exact_cents FROM tgt t
        |  JOIN ec e ON e.cr >= t.r GROUP BY 1)
        |SELECT e.p, CAST(e.est_cents AS BIGINT) AS est_cents,
        |  CAST(x.exact_cents AS BIGINT) AS exact_cents,
        |  CAST(abs(e.est_cents - x.exact_cents) AS BIGINT) AS abs_err
        |FROM est e JOIN exq x USING (p) ORDER BY e.p""".stripMargin,
    "q456_audio_fingerprint" -> {
      // the same seed (first 8 sha256 hex chars of the 40-char prefix),
      // the same 64-sample integer waveform, the 6 WHT butterfly stages
      // unrolled as list_transform CTEs, sign bits 1..32 packed
      val stages = Iterator.iterate(1)(_ * 2).takeWhile(_ < 64).map { bit =>
        val prev = if (bit == 1) "a0" else s"s${bit / 2}"
        s"""s$bit AS (SELECT doc_id, list_transform(range(0, 64), i ->
           |  CASE WHEN (i & $bit) = 0 THEN a[CAST(i + 1 AS INT)] + a[CAST(i + $bit + 1 AS INT)]
           |  ELSE a[CAST(i - $bit + 1 AS INT)] - a[CAST(i + 1 AS INT)] END) AS a FROM $prev)""".stripMargin
      }.mkString(",\n")
      s"""WITH sd AS (SELECT doc_id,
         |    CAST(CAST(('0x' || substr(sha256(substr(coalesce(text, ''), 1, 40)), 1, 8)) AS UBIGINT) AS BIGINT) AS seed
         |  FROM documents),
         |a0 AS (SELECT doc_id,
         |    list_transform(range(0, 64), i -> (seed + i * 2654435761) % 65536 - 32768) AS a
         |  FROM sd),
         |$stages,
         |fps AS (SELECT doc_id, CAST(list_sum(list_transform(range(1, 33), j ->
         |    CASE WHEN a[CAST(j + 1 AS INT)] > 0 THEN (CAST(1 AS BIGINT) << CAST(j - 1 AS INT)) ELSE 0 END))
         |  AS BIGINT) AS fp FROM s32),
         |g AS (SELECT fp, min(doc_id) AS group_id, count(*) AS group_size FROM fps GROUP BY 1)
         |SELECT f.doc_id, f.fp, g.group_id, CAST(g.group_size AS BIGINT) AS group_size
         |FROM fps f JOIN g USING (fp) ORDER BY f.doc_id""".stripMargin
    })
}
