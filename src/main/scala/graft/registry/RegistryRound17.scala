package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import SparkEntry._
import graft.ops.{Similarity, TwoPhase}

/** Registry part: round-17 additions (q458+).
  *
  * q458 closes the filtered-ANN recall gap operationally (round-16 verdict
  * item 7): q307 measured recall collapsing to 0.525 at quarter selectivity
  * under a fixed nprobe = 2 — the production RAG serving path (q302 pins
  * the semantics) needs the probe width to follow the predicate, not a
  * constant. Same contract as every part: deterministic output order,
  * exact integers or bit-equal fixed-order doubles everywhere the gate
  * hashes.
  */
private[graft] object RegistryRound17 {

  /** The filter-aware probe rule shared by the engine and (formula-for-
    * formula) the oracle: nprobe = min(|cells|, ceil(2 / sel²)) with
    * sel = kept/total. Inverse-SQUARE, not inverse-linear: the qualifying
    * density inside each probed cell falls ∝ sel AND the per-cell
    * qualifying counts get noisier as cells thin out, so an inverse-linear
    * rule (probe 2/sel cells) measured 0.650–0.825 recall at the
    * half/quarter legs (sf0.01) while the squared rule clears 0.95 on
    * every leg at every fixture SF. At quarter selectivity the rule
    * saturates to nprobe = |cells| — the EXACT pre-filtered scan — which
    * costs sel · n ≈ a quarter of one unfiltered corpus pass: falling back
    * to brute force over a selective filter's survivors is cheaper than
    * any probed search that still misses (the FAISS/Milvus filtered-search
    * playbook). Scanned volume per leg ≈ min(sel, 2/|cells| · 1/sel) of
    * the corpus, so adaptive filtered traffic is never more than ~2× an
    * unfiltered search. */
  private[graft] def adaptiveNprobe(total: Long, kept: Long, cells: Long): Int = {
    val k = math.max(kept, 1L)
    math.min(cells, (2L * total * total + k * k - 1L) / (k * k)).toInt
  }

  val queries: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
    "q458_adaptive_nprobe" -> ((s, dir) => {
      // filter-aware nprobe (r16 verdict item 7): per selectivity leg the
      // probe width comes from adaptiveNprobe over a ONE-PASS label
      // histogram (the q166/q326 stats estimate — driver metadata, never a
      // second corpus scan), then the q302 pre-filtered IVF search runs at
      // that width with exact-truth recall riding along per leg (the q450
      // readout discipline: the number that justifies the rule).
      val emb = T(s, dir, "embeddings")
      val queries = emb.filter(col("vec_id") < 8)
      val cents = emb.filter(col("vec_id") < 16)
      val hist = emb.groupBy(col("label").cast("long").as("l"))
        .agg(count(lit(1)).as("c"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val total = hist.values.sum
      // labels are ~uniform over 0..9, so the four legs sweep the rule's
      // whole range: sel ~1.0 -> np 2, ~0.7 -> np 5, ~0.5 -> np 8,
      // ~0.1 -> np 16 (the exact pre-filtered fallback)
      val legs = Seq(
        ("l1_all", lit(true), total),
        ("l2_mild", col("label") <= 6, hist.filter(_._1 <= 6L).values.sum),
        ("l3_half", col("label") <= 4, hist.filter(_._1 <= 4L).values.sum),
        ("l4_narrow", col("label") === 2, hist.getOrElse(2L, 0L)))
      legs.map { case (name, pred, kept) =>
        val np = adaptiveNprobe(total, kept, cells = 16L)
        val corpus = emb.filter(pred)
        val approx = Similarity.ivfTopK(corpus, queries, cents,
          "vec_id", "embedding", 5, nprobe = np)
          .select(col("query_id"), col("neighbor_id"))
        val truth = Similarity.cosineTopK(corpus, queries,
          "vec_id", "embedding", 5)
          .select(col("query_id"), col("neighbor_id"))
        approx.join(broadcast(truth), Seq("query_id", "neighbor_id"))
          .agg(count(lit(1)).as("hits"))
          .select(lit(name).as("leg"),
            lit(10000L * kept / total).as("sel_bp"),
            lit(np.toLong).as("nprobe"), col("hits"))
      }.reduce(_ unionByName _)
        .crossJoin(broadcast(queries.agg(count(lit(1)).as("n_queries"))))
        .select(col("leg"), col("sel_bp"), col("nprobe"),
          col("n_queries").cast("long").as("n_queries"),
          col("hits").cast("long").as("hits"),
          ops.Num.roundz(col("hits").cast("double") /
            (col("n_queries").cast("double") * 5d), 4).as("recall"))
        .orderBy("leg")
    }),
    "q459_histogram_selectivity" -> ((s, dir) => {
      // the optimizer-statistics loop CLOSED: q326's ANALYZE-style
      // equi-depth histogram (32 buckets over order cents, exact two-phase
      // ranks) ESTIMATES range-predicate selectivities — full mass from
      // buckets above the threshold, uniform interpolation inside the
      // boundary bucket, all integer arithmetic — and each estimate is
      // priced against the exact count. This is the readout that decides
      // whether stored stats are fresh enough to drive runtime rules (the
      // q458 adaptive-nprobe selectivity input names exactly this family).
      // Scale shape: the histogram is 32 rows of metadata derived by the
      // TwoPhase rank (never a single-partition window); estimation is a
      // 32x|thresholds| broadcast fold; the exact side is ONE conditional
      // pass with map-side combine.
      import s.implicits._
      val o = T(s, dir, "orders").select(col("o_orderkey"),
        ops.Num.roundz(col("o_totalprice") * 100, 0).cast("long").as("cents"))
      val (ranked, nTot) = TwoPhase.globalRank(o, col("cents"),
        Seq(col("cents"), col("o_orderkey")), "rank")
      val hist = ranked
        .withColumn("bucket", TwoPhase.ntileFromRank("rank", nTot, 32).cast("long"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("cnt"), min(col("cents")).as("lo"),
          max(col("cents")).as("hi"))
        .localCheckpoint() // 32 rows, probed by every threshold leg
      // thresholds sweep the mass: tail / body / median / head / extreme
      val ts = Seq(5000000L, 15000000L, 25000000L, 40000000L, 48000000L)
        .toDF("t_cents")
      val est = hist.crossJoin(broadcast(ts))
        .select(col("t_cents"),
          when(col("t_cents") <= col("lo"), col("cnt"))
            .when(col("t_cents") > col("hi"), lit(0L))
            // inclusive integer widths: the boundary bucket contributes
            // cnt * (hi - t + 1) div (hi - lo + 1) — floor on both engines
            .otherwise(expr("cnt * (hi - t_cents + 1) div (hi - lo + 1)"))
            .as("part"))
        .groupBy(col("t_cents")).agg(sum(col("part")).as("est_rows"))
      val actual = o.crossJoin(broadcast(ts))
        .filter(col("cents") >= col("t_cents"))
        .groupBy(col("t_cents")).agg(count(lit(1)).as("actual_rows"))
      est.join(actual, Seq("t_cents"), "left")
        .select(col("t_cents"), lit(nTot).as("n_total"),
          col("est_rows").cast("long").as("est_rows"),
          coalesce(col("actual_rows"), lit(0L)).cast("long").as("actual_rows"),
          expr(s"est_rows * 10000 div $nTot").cast("long").as("est_bp"),
          expr(s"coalesce(actual_rows, 0) * 10000 div $nTot").cast("long").as("actual_bp"),
          expr(s"abs(est_rows - coalesce(actual_rows, 0)) * 10000 div $nTot")
            .cast("long").as("err_bp"))
        .orderBy("t_cents")
    }),
    "q460_ivf_cell_split" -> ((s, dir) => {
      // IVF index MAINTENANCE: the hottest cell splits in place — the
      // rebalancing act a serving index performs when ingest (q292) skews
      // occupancy (q283 measures the imbalance; this key FIXES it). The
      // split is the KD rule, fully deterministic and oracle-replicable:
      // inside the argmax-count cell (min cell id on ties), pick the
      // dimension with the widest within-cell range (min dim id on ties),
      // rank members on (value-at-dim, vec_id), and send rank <= ceil(n/2)
      // to sub-cell A = cell, the rest to B = 16 + cell (fresh id space).
      // Scale shape: ONE corpus pass assigns cells (the stored index in
      // production); the split itself touches only the hot cell's members
      // — maintenance cost follows the CELL, not the corpus — and the
      // readout (count per resulting cell + before/after max occupancy)
      // is |cells|+1 rows of metadata.
      val emb = T(s, dir, "embeddings")
      val cents = emb.filter(col("vec_id") < 16)
      val assigned = Similarity.ivfAssign(emb, cents, "vec_id", "embedding")
        .select(col("vec_id"), col("embedding"), col("cell"))
        .localCheckpoint() // counted, argmax'd, then split — one pass
      val hot = assigned.groupBy(col("cell")).agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("cell")).limit(1).head
      val (hotCell, hotCnt) = (hot.getLong(0), hot.getLong(1))
      val members = assigned.filter(col("cell") === hotCell)
      val dims = members
        .select(posexplode(expr("transform(embedding, x -> CAST(x AS DOUBLE))"))
          .as(Seq("dim", "v")))
        .groupBy(col("dim")).agg((max(col("v")) - min(col("v"))).as("range"))
        .orderBy(col("range").desc, col("dim")).limit(1).head
      val splitDim = dims.getInt(0)
      val half = (hotCnt + 1L) / 2L
      import org.apache.spark.sql.expressions.Window
      val ranked = members
        .withColumn("__v", expr(s"CAST(element_at(embedding, ${splitDim + 1}) AS DOUBLE)"))
        .withColumn("__rn", row_number().over(
          Window.partitionBy(col("cell")).orderBy(col("__v"), col("vec_id"))))
        .select(col("vec_id"),
          when(col("__rn") <= half, lit(hotCell)).otherwise(lit(16L + hotCell))
            .as("cell"))
      val after = assigned.filter(col("cell") =!= hotCell)
        .select(col("vec_id"), col("cell"))
        .unionByName(ranked)
        .groupBy(col("cell")).agg(count(lit(1)).as("cnt"))
        .localCheckpoint() // 17 rows; read twice (rows + max)
      val maxAfter = after.agg(max(col("cnt"))).head.getLong(0)
      after.select(col("cell"), col("cnt").cast("long").as("cnt"),
          lit(hotCell).as("split_cell"), lit(splitDim.toLong).as("split_dim"),
          lit(hotCnt).as("max_before"), lit(maxAfter).as("max_after"))
        .orderBy("cell")
    }))

  /** q458's oracle: q307's IVF structure (assignment crn = 1, probes
    * crn <= np_leg) with np_leg derived by the SAME integer formula the
    * engine runs — kept² ceil-division against 2·total², capped at the 16
    * cells — per selectivity leg. */
  private val q458Sql: String = {
    val cos = (a: String, b: String) =>
      s"list_dot_product($a, $b) / (sqrt(list_dot_product($a, $a)) * sqrt(list_dot_product($b, $b)))"
    val legs = Seq[(String, String => String)](
      ("l1_all", _ => "1 = 1"),
      ("l2_mild", a => s"$a.label <= 6"),
      ("l3_half", a => s"$a.label <= 4"),
      ("l4_narrow", a => s"$a.label = 2"))
    val legCtes = legs.map { case (name, pred) =>
      s"""k_$name AS (SELECT greatest(count(*), 1) AS kept FROM vecs WHERE ${pred("vecs")}),
         |np_$name AS (SELECT least(16, (2 * t.n * t.n + k.kept * k.kept - 1) // (k.kept * k.kept)) AS np,
         |    (10000 * k.kept) // t.n AS sel_bp FROM tot t, k_$name k),
         |q_$name AS (SELECT vec_id AS query_id, vv AS qv, cell FROM scored
         |  WHERE vec_id < 8 AND crn <= (SELECT np FROM np_$name)),
         |iv_$name AS (SELECT query_id, neighbor_id FROM (
         |    SELECT q.query_id, a.vec_id AS neighbor_id,
         |      row_number() OVER (PARTITION BY q.query_id ORDER BY ${cos("q.qv", "a.vv")} DESC, a.vec_id) AS rn
         |    FROM q_$name q JOIN asg a ON a.cell = q.cell AND a.vec_id <> q.query_id WHERE ${pred("a")})
         |  WHERE rn <= 5),
         |tr_$name AS (SELECT query_id, neighbor_id FROM (
         |    SELECT qq.vec_id AS query_id, n.vec_id AS neighbor_id,
         |      row_number() OVER (PARTITION BY qq.vec_id ORDER BY ${cos("qq.vv", "n.vv")} DESC, n.vec_id) AS rn
         |    FROM vecs qq CROSS JOIN vecs n
         |    WHERE qq.vec_id < 8 AND n.vec_id <> qq.vec_id AND ${pred("n")})
         |  WHERE rn <= 5),
         |h_$name AS (SELECT '$name' AS leg, np.sel_bp, np.np AS nprobe, count(*) AS hits
         |  FROM iv_$name i JOIN tr_$name t ON t.query_id = i.query_id AND t.neighbor_id = i.neighbor_id,
         |    np_$name np GROUP BY 1, 2, 3)""".stripMargin
    }.mkString(",\n")
    val union = legs.map { case (name, _) => s"SELECT * FROM h_$name" }.mkString(" UNION ALL ")
    s"""WITH vecs AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS vv FROM embeddings),
       |tot AS (SELECT count(*) AS n FROM vecs),
       |cent AS (SELECT vec_id AS cell, vv AS cv FROM vecs WHERE vec_id < 16),
       |scored AS (SELECT x.vec_id, x.vv, c.cell,
       |  row_number() OVER (PARTITION BY x.vec_id ORDER BY ${cos("x.vv", "c.cv")} DESC, c.cell) AS crn
       |  FROM vecs x CROSS JOIN cent c),
       |asg AS (SELECT s0.vec_id, v0.label, s0.vv, s0.cell FROM scored s0
       |  JOIN vecs v0 ON v0.vec_id = s0.vec_id WHERE s0.crn = 1),
       |$legCtes,
       |u AS ($union),
       |nq AS (SELECT count(*) AS n FROM vecs WHERE vec_id < 8)
       |SELECT u.leg, CAST(u.sel_bp AS BIGINT) AS sel_bp, CAST(u.nprobe AS BIGINT) AS nprobe,
       |  CAST(nq.n AS BIGINT) AS n_queries, CAST(u.hits AS BIGINT) AS hits,
       |  (round(CAST(u.hits AS DOUBLE) / (CAST(nq.n AS DOUBLE) * 5), 4) + 0.0) AS recall
       |FROM u, nq ORDER BY u.leg""".stripMargin
  }

  val oracleSql: Seq[(String, String)] = Seq(
    "q458_adaptive_nprobe" -> q458Sql,
    "q459_histogram_selectivity" ->
      // the same ntile histogram (q326's oracle convention), the same
      // inclusive-width interpolation, exact counts per threshold
      """WITH o AS (SELECT o_orderkey,
        |    CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents FROM orders),
        |n AS (SELECT count(*) AS n FROM o),
        |r AS (SELECT cents,
        |    CAST(ntile(32) OVER (ORDER BY cents, o_orderkey) AS BIGINT) AS bucket FROM o),
        |h AS (SELECT bucket, count(*) AS cnt, min(cents) AS lo, max(cents) AS hi
        |  FROM r GROUP BY 1),
        |ts AS (SELECT CAST(unnest([5000000, 15000000, 25000000, 40000000, 48000000]) AS BIGINT) AS t_cents),
        |e AS (SELECT t_cents, sum(CASE WHEN t_cents <= lo THEN cnt
        |    WHEN t_cents > hi THEN 0
        |    ELSE cnt * (hi - t_cents + 1) // (hi - lo + 1) END) AS est_rows
        |  FROM h CROSS JOIN ts GROUP BY 1),
        |a AS (SELECT t_cents, count(*) AS actual_rows FROM o JOIN ts ON cents >= t_cents GROUP BY 1)
        |SELECT e.t_cents, CAST(n.n AS BIGINT) AS n_total,
        |  CAST(e.est_rows AS BIGINT) AS est_rows,
        |  CAST(coalesce(a.actual_rows, 0) AS BIGINT) AS actual_rows,
        |  CAST(e.est_rows * 10000 // n.n AS BIGINT) AS est_bp,
        |  CAST(coalesce(a.actual_rows, 0) * 10000 // n.n AS BIGINT) AS actual_bp,
        |  CAST(abs(e.est_rows - coalesce(a.actual_rows, 0)) * 10000 // n.n AS BIGINT) AS err_bp
        |FROM e LEFT JOIN a USING (t_cents) CROSS JOIN n ORDER BY e.t_cents""".stripMargin,
    "q460_ivf_cell_split" ->
      // the same cosine argmax assignment (q307's asg convention), the
      // same KD split: widest-range dim (min dim id on ties), rank on
      // (value, vec_id), ceil-half to the old id, rest to 16 + cell
      """WITH vecs AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vv FROM embeddings),
        |cent AS (SELECT vec_id AS cell, vv AS cv FROM vecs WHERE vec_id < 16),
        |scored AS (SELECT x.vec_id, x.vv, c.cell,
        |  row_number() OVER (PARTITION BY x.vec_id ORDER BY
        |    list_dot_product(x.vv, c.cv) / (sqrt(list_dot_product(x.vv, x.vv)) * sqrt(list_dot_product(c.cv, c.cv))) DESC,
        |    c.cell) AS crn
        |  FROM vecs x CROSS JOIN cent c),
        |asg AS (SELECT vec_id, vv, cell FROM scored WHERE crn = 1),
        |cc AS (SELECT cell, count(*) AS cnt FROM asg GROUP BY 1),
        |hot AS (SELECT cell, cnt FROM cc ORDER BY cnt DESC, cell LIMIT 1),
        |mem AS (SELECT a.vec_id, a.vv FROM asg a JOIN hot h ON a.cell = h.cell),
        |dimx AS (SELECT CAST(u.i AS BIGINT) AS dim, m.vv[CAST(u.i + 1 AS INT)] AS v
        |  FROM mem m, (SELECT unnest(range(0, 64)) AS i) u),
        |sd AS (SELECT dim FROM (SELECT dim, max(v) - min(v) AS rng FROM dimx GROUP BY 1)
        |  ORDER BY rng DESC, dim LIMIT 1),
        |rk AS (SELECT m.vec_id,
        |    row_number() OVER (ORDER BY m.vv[CAST(sd.dim + 1 AS INT)], m.vec_id) AS rn
        |  FROM mem m, sd),
        |sp AS (SELECT vec_id, CASE WHEN rn <= (SELECT (cnt + 1) // 2 FROM hot)
        |    THEN (SELECT cell FROM hot) ELSE 16 + (SELECT cell FROM hot) END AS cell FROM rk),
        |aft AS (SELECT cell, count(*) AS cnt FROM (
        |  SELECT a.cell FROM asg a WHERE a.cell <> (SELECT cell FROM hot)
        |  UNION ALL SELECT cell FROM sp) GROUP BY 1)
        |SELECT aft.cell, CAST(aft.cnt AS BIGINT) AS cnt,
        |  CAST(hot.cell AS BIGINT) AS split_cell, CAST(sd.dim AS BIGINT) AS split_dim,
        |  CAST(hot.cnt AS BIGINT) AS max_before,
        |  CAST((SELECT max(cnt) FROM aft) AS BIGINT) AS max_after
        |FROM aft, hot, sd ORDER BY aft.cell""".stripMargin)
}
