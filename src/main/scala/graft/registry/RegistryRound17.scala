package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import SparkEntry._
import graft.ops.Similarity

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
    "q458_adaptive_nprobe" -> q458Sql)
}
