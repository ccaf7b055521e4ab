package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.ops._
import graft.stream.Streaming
import graft.multimodal.Multimodal

import SparkEntry._

/** Registry part: the statistics/ML batches (q384-q417) and the LLM-pipeline extensions (q41-q63, q116-q127).
  *
  * Split VERBATIM from SparkEntry's single queries/oracleSql map literals
  * (round-13 verdict item 8 - pure maintainability, zero semantic change);
  * merged back into the public maps at SparkEntry init. RegistrySpec pins
  * the merged key set and the 1:1 queries<->oracleSql correspondence.
  */
private[graft] object RegistryStatsMl {
  val queries: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
    "q384_worst_slices" -> ((s, dir) => {
      // worst-slice mining (SliceFinder-style): evaluate the q50 langid
      // model per (source, lang) subgroup and surface the 10 worst
      // slices with support ≥ 20 — per-slice evaluation catches the
      // failure the global confusion matrix (q279) averages away (a
      // model can be 95% overall and 40% on one source's German). One
      // scan, one hash aggregate to the |sources|·|langs| frame, heap
      // top-10 on (acc, support desc) — never a global sort.
      T(s, dir, "documents")
        .select(col("source"), col("lang"),
          (TextAnalysis.langId(col("text")) === col("lang")).as("ok"))
        .groupBy(col("source"), col("lang"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("ok"), 1L).otherwise(0L)).as("correct"))
        .filter(col("n") >= 20)
        .select(col("source"), col("lang"), col("n"), col("correct"),
          expr("correct * 10000 div n").as("acc_bp"))
        .orderBy(col("acc_bp"), col("n").desc, col("source"), col("lang"))
        .limit(10)
    }),
    "q385_variant_shred" -> ((s, dir) =>
      // semi-structured payloads through Spark 4's native VARIANT type:
      // parse_json once into the binary variant encoding, then typed
      // path extraction (variant_get) — the open-schema ingest shape that
      // replaces per-query get_json_object string re-parsing (q32): at
      // 100 TB the JSON parses ONCE at ingest and every downstream
      // extraction is a binary field walk, not a text scan. The gate
      // groups on the extracted typed value, so a wrong shred changes
      // the histogram.
      T(s, dir, "events")
        .filter(col("props").isNotNull)
        .selectExpr("parse_json(props) AS v")
        .selectExpr("CAST(variant_get(v, '$.k') AS BIGINT) AS k")
        .groupBy(col("k")).agg(count(lit(1)).as("cnt"))
        .orderBy("k")),
    "q386_observed_metrics" -> ((s, dir) => {
      // pipeline observability WITHOUT a second scan: Dataset.observe
      // attaches accumulator-backed metrics (row count, null count, value
      // mass) to the input of a real aggregation, and the metrics arrive
      // as a side effect of the one action — the production data-quality
      // ledger pattern (a separate auditing query would double the I/O at
      // 100 TB). The gate pins the observed values against the oracle's
      // direct computation, proving the observation path reports exactly
      // what flowed.
      import org.apache.spark.sql.Observation
      val obs = Observation(
        "q386_" + java.util.UUID.randomUUID().toString.take(8))
      val ev = T(s, dir, "events").observe(obs,
        count(lit(1)).as("rows_in"),
        sum(when(col("value").isNull, 1L).otherwise(0L)).as("null_values"),
        sum(coalesce(Num.roundz(col("value") * 100, 0).cast("long"), lit(0L)))
          .as("cents_in"))
      val rowsOut = ev.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n")).count()
      val m = obs.get
      import s.implicits._
      Seq((m("rows_in").asInstanceOf[Long],
        m("null_values").asInstanceOf[Long],
        m("cents_in").asInstanceOf[Long], rowsOut))
        .toDF("rows_in", "null_values", "cents_in", "rows_out")
    }),
    "q387_pipe_sql" -> ((s, dir) => {
      // Spark 4 SQL PIPE syntax (`|>`): the linear query form that reads
      // in execution order — same Catalyst plan as the nested-SELECT
      // equivalent the oracle runs, which is the point: the surface is
      // new, the engine semantics are identical, and the gate proves it
      // (a syntax-only feature must cost nothing and change nothing).
      T(s, dir, "events").createOrReplaceTempView("q387_events")
      s.sql(
        """FROM q387_events
          ||> WHERE value IS NOT NULL AND value > 50
          ||> AGGREGATE count(*) AS cnt,
          |     CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS cents
          |   GROUP BY event_type
          ||> ORDER BY event_type""".stripMargin)
    }),
    "q388_collated_group" -> ((s, dir) =>
      // Spark 4 COLLATION support: case-insensitive grouping via a
      // UTF8_LCASE-collated key instead of the lower()-projection
      // workaround — collation-aware hashing/equality runs inside the
      // aggregate (and, unlike lower(), preserves the original strings
      // for output). Mixed case is planted deterministically (odd ids
      // upper-cased); min() over the raw binary-collated column keeps
      // the representative choice engine-independent.
      T(s, dir, "documents")
        .select(when(col("doc_id") % 2 === 1, upper(col("source")))
          .otherwise(col("source")).as("s"))
        .groupBy(expr("collate(s, 'UTF8_LCASE')").as("g"))
        .agg(min(col("s")).as("variant_min"), count(lit(1)).as("cnt"))
        .select(col("variant_min"), col("cnt"))
        .orderBy("variant_min")),
    "q389_markov_attribution" -> ((s, dir) => {
      // Markov removal-effect attribution (Anderl et al. 2014) — the
      // data-driven alternative to q131's positional rules: each
      // channel's credit is how much the journey chain's conversion
      // probability DROPS when every transition into that channel is
      // absorbed into null. Journeys truncate at the first purchase
      // (absorbing); the only corpus-sized work is ONE user-keyed
      // ordering pass for the transition tallies — the chain itself is a
      // ≤5×6 matrix collected to the driver (the TwoPhase metadata-action
      // discipline) and solved by 8 fixed-point steps in EXACT millionth
      // integer arithmetic, replayed identically by the oracle's
      // unrolled CTEs: p' = b + ⌊Q·p/10⁶⌋, once per removal.
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val o = T(s, dir, "events")
        .filter(col("user_id").isNotNull)
        .select(col("user_id"), col("event_type"),
          row_number().over(w).as("ord"))
      val fp = o.filter(col("event_type") === "purchase")
        .groupBy(col("user_id")).agg(min(col("ord")).as("po"))
      val tr = o.join(fp, Seq("user_id"), "left")
        .filter(col("po").isNull || col("ord") <= col("po"))
      val w2 = Window.partitionBy(col("user_id")).orderBy(col("ord"))
      val steps = tr
        .withColumn("t", coalesce(lead(col("event_type"), 1).over(w2), lit("end")))
        .filter(col("event_type") =!= "purchase")
        .select(col("event_type").as("f"), col("t"))
      val starts = tr.filter(col("ord") === 1)
        .select(lit("start").as("f"), col("event_type").as("t"))
      val tallies = steps.unionByName(starts)
        .groupBy(col("f"), col("t")).agg(count(lit(1)).as("c"))
        .collect() // ≤ 5×6 metadata rows — the chain, not the corpus
      val cnt = tallies.map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      val tot = cnt.groupBy(_._1._1).map { case (f, m) => f -> m.values.sum }
      def qm(f: String, t: String): Long =
        cnt.get((f, t)).map(_ * 1000000L / tot(f)).getOrElse(0L)
      val all = Seq("start", "view", "click", "signup", "error")
      def solve(removed: Option[String]): Long = {
        val st = all.filterNot(removed.contains)
        var p = st.map(_ -> 0L).toMap
        (1 to 8).foreach { _ =>
          p = st.map { x =>
            x -> (qm(x, "purchase") +
              st.filter(_ != "start").map(t => qm(x, t) * p(t)).sum / 1000000L)
          }.toMap
        }
        p("start")
      }
      val base = solve(None)
      val channels = Seq("click", "error", "signup", "view")
      val rows = channels.map(c => (c, base, solve(Some(c))))
      val sumDiff = math.max(rows.map { case (_, b, r) => b - r }.sum, 1L)
      import s.implicits._
      rows.map { case (c, b, r) =>
        (c, b, r, b - r, (b - r) * 10000L / sumDiff)
      }.toDF("channel", "p_base_ppm", "p_removed_ppm", "diff_ppm", "share_bp")
        .orderBy("channel")
    }),
    "q390_restatement_ledger" -> ((s, dir) => {
      // RESTATEMENT ledger: what yesterday's report said vs what the data
      // says now. Each event's arrival is its event time plus a
      // deterministic processing delay (q344's jitter device); the
      // first-report count for day d includes only events that had
      // ARRIVED by d's midnight close, the final count includes
      // everything — restated_bp is the share of each day's truth the
      // first report missed. The reconciliation every bitemporal
      // reporting stack publishes next to its dashboards (the reference's
      // dashboard re-queries live tables and silently restates history).
      // One scan, two conditional sums per day.
      val e = T(s, dir, "events")
        .select(TextFunctions.dayString(col("ts")).as("day"),
          (col("ts") + expr(
            "make_interval(0, 0, 0, 0, CAST(event_id % 48 AS INT), 0, 0)"))
            .as("arrival"),
          (to_date(col("ts")) + lit(1)).cast("timestamp").as("day_end"))
      e.groupBy(col("day"))
        .agg(count(lit(1)).as("n_final"),
          sum(when(col("arrival") < col("day_end"), 1L).otherwise(0L))
            .as("n_first"))
        .select(col("day"), col("n_final"), col("n_first"),
          expr("(n_final - n_first) * 10000 div n_final").as("restated_bp"))
        .orderBy("day")
    }),
    "q391_aqe_skew_join" -> ((s, dir) => {
      // AQE SKEW-JOIN under the gate: a fact⋈dim join with 90% of rows on
      // one planted hot key, executed with the broadcast path disabled
      // and the skew thresholds lowered so OptimizeSkewedJoin must split
      // the hot partition AT RUNTIME from observed sizes — the automatic
      // remedy whose manual twin is q85's salting (which re-keys ahead of
      // time; AQE re-plans after the map stage measures). The result
      // materializes inside the scoped configuration (localCheckpoint) so
      // the session's settings are restored before the frame is consumed;
      // PlanSpec re-executes the same join under the same scope and
      // asserts the `skew=true` marker on the SortMergeJoin. The oracle
      // pins that the split changes NOTHING about the answer.
      val conf = s.conf
      val keys = Seq(
        "spark.sql.adaptive.skewJoin.enabled",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes",
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.forceOptimizeSkewedJoin")
      val saved = keys.map(k => k -> conf.getOption(k))
      try {
        conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "100b")
        conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "100b")
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
        Relational.plantedSkewJoin(T(s, dir, "events")).localCheckpoint()
      } finally saved.foreach { case (k, v) =>
        v.fold(conf.unset(k))(conf.set(k, _))
      }
    }),
    "q392_ols_regression" -> ((s, dir) => {
      // Per-cohort OLS by NORMAL EQUATIONS: the only corpus-sized work is
      // one hash aggregate collecting six exact integer moments (n, Σx,
      // Σy, Σxy, Σx², Σy²) — sufficient statistics combine associatively,
      // so the fit is map-side partials + one shuffle regardless of data
      // size (a row-iterating fit would be the .collect() antipattern).
      // Slope / intercept / r² are ONE fixed double chain over the exact
      // longs, written operator-for-operator identically in the oracle
      // (the q301/q297 exact-moments discipline).
      val e = T(s, dir, "events")
        .filter(col("value").isNotNull)
        .select(col("event_type"),
          hour(col("ts")).cast("long").as("x"),
          Num.roundz(col("value") * 100, 0).cast("long").as("y"))
      val m = e.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("x")).as("sx"), sum(col("y")).as("sy"),
          sum(col("x") * col("y")).as("sxy"),
          sum(col("x") * col("x")).as("sx2"),
          sum(col("y") * col("y")).as("sy2"))
      val nD = col("n").cast("double")
      val cov = nD * col("sxy") - col("sx").cast("double") * col("sy")
      val vx = nD * col("sx2") - col("sx").cast("double") * col("sx")
      val vy = nD * col("sy2") - col("sy").cast("double") * col("sy")
      m.select(col("event_type"), col("n"),
          Num.roundz(cov / vx, 4).as("slope"),
          Num.roundz((col("sy").cast("double") - cov / vx * col("sx")) / nD, 4)
            .as("intercept"),
          Num.roundz(cov * cov / (vx * vy), 4).as("r2"))
        .orderBy("event_type")
    }),
    "q393_logistic_gd" -> ((s, dir) => {
      // FULL-BATCH gradient descent trained in-engine: 3 unrolled
      // iterations of a hard-sigmoid logistic fit (σ̂(z) = clamp(0.5 +
      // z/4, 0, 1), the piecewise-linear sigmoid of Courbariaux et al.
      // 2015) predicting purchase from the centered hour. EVERY quantity
      // is an exact integer micro — gradients are plain sums (map-side
      // combinable), the weight state between iterations is a 1-row
      // broadcast frame, so each iteration costs one scan + one reduce
      // and nothing touches the driver. Truncating integer division
      // matches DuckDB's `//` bit-for-bit (both round toward zero), so
      // the oracle replays the 3 steps as chained CTEs.
      val e = T(s, dir, "events")
        .select((hour(col("ts")).cast("long") - 12L).as("x"),
          when(col("event_type") === "purchase", 1L).otherwise(0L).as("y"))
      def step(w: DataFrame): DataFrame =
        e.crossJoin(broadcast(w))
          .select(col("w0"), col("w1"), col("x"),
            (expr("greatest(least(500000 + (w0 + w1 * x) div 4, 1000000), 0)")
              - col("y") * 1000000L).as("err"))
          .agg(max(col("w0")).as("pw0"), max(col("w1")).as("pw1"),
            count(lit(1)).as("n"), sum(col("err")).as("g0"),
            sum(col("err") * col("x")).as("g1"))
          .selectExpr("pw0 - g0 div (2 * n) AS w0", "pw1 - g1 div (20 * n) AS w1")
      val w0 = s.range(1).select(lit(0L).as("w0"), lit(0L).as("w1"))
      val w3 = step(step(step(w0)))
      e.crossJoin(broadcast(w3))
        .select(col("w0"), col("w1"),
          (expr("greatest(least(500000 + (w0 + w1 * x) div 4, 1000000), 0)")
            > 500000L).as("pred"),
          (col("y") === 1L).as("pos"))
        .agg(max(col("w0")).as("w0"), max(col("w1")).as("w1"),
          count(lit(1)).as("n"),
          sum(when(col("pred") === col("pos"), 1L).otherwise(0L)).as("correct"))
        .selectExpr("w0", "w1", "n", "correct * 10000 div n AS correct_bp")
    }),
    "q395_winnowing" -> ((s, dir) => {
      // Winnowing fingerprints (Schleimer, Wilkerson & Aiken, SIGMOD 2003
      // — the MOSS algorithm): token-trigram Karp–Rabin hashes, then from
      // every window of w = 4 consecutive hashes keep the RIGHTMOST
      // MINIMUM. The tie-aware argmin rides ONE packed key —
      // hash·2²⁰ + (2²⁰−1−pos) — so a plain bounded window min() both
      // finds the min hash AND breaks ties toward the largest position;
      // distinct selected keys per doc are the fingerprint set (any two
      // docs sharing a run of ≥ w+k−1 = 6 tokens share a fingerprint).
      // All windows are per-doc and 4-row bounded; the packed key assumes
      // < 2²⁰ tokens/doc (chunk longer docs with q128 first).
      import org.apache.spark.sql.expressions.Window
      val toks = T(s, dir, "documents")
        .select(col("doc_id"), posexplode(
          expr("filter(split(lower(text), '\\\\s+'), t -> length(t) > 0)"))
          .as(Seq("pos", "tok")))
        .withColumn("h", graft.functions.RollingHash(col("tok")))
      val wLead = Window.partitionBy("doc_id").orderBy("pos")
      val tri = toks
        .withColumn("h1", lead(col("h"), 1).over(wLead))
        .withColumn("h2", lead(col("h"), 2).over(wLead))
        .filter(col("h2").isNotNull)
        .withColumn("gh",
          expr("((h * 31 + h1) % 1000000007 * 31 + h2) % 1000000007"))
      val wMin = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(-3, 0)
      tri.withColumn("k", expr("gh * 1048576 + (1048575 - pos)"))
        .withColumn("wmin", min(col("k")).over(wMin))
        .filter(col("pos") >= 3) // full windows only
        .select(col("doc_id"), col("wmin")).distinct()
        .select(col("doc_id"),
          expr("wmin div 1048576").as("hash"),
          (lit(1048575L) - expr("wmin % 1048576")).as("pos"))
        .orderBy("doc_id", "pos")
    }),
    "q396_t_closeness" -> ((s, dir) => {
      // t-closeness release audit (Li, Li & Venkatasubramanian, ICDE
      // 2007) — completes the privacy triad next to q308's k-anonymity
      // and q366's l-diversity: per quasi-identifier group, the ORDERED
      // earth-mover distance between the group's sensitive-band
      // distribution and the global one, EMD = Σ|cum_p − cum_q|/(m−1),
      // everything in exact integer ppm. The band grid is completed by a
      // groups × bands cross join (4 bands — metadata-sized), cumulative
      // sums ride a 4-row bounded window, and the global distribution is
      // a 4-row broadcast; one corpus aggregate total.
      val c = T(s, dir, "customer")
        .select(col("c_nationkey").cast("long").as("nat"),
          col("c_mktsegment").as("seg"),
          Num.roundz(col("c_acctbal") * 100, 0).cast("long").as("cents"))
        .withColumn("band",
          expr("greatest(least((cents + 100000) div 300000, 3), 0)"))
      // glob rides the same complete 0..3 grid as the per-group side
      // (coalesce(gc, 0)): a globally-empty band still contributes a
      // q_ppm = 0 row, so the downstream band join never drops a grid
      // position and the EMD divisor (m−1 = 3) stays honest.
      val glob = s.range(0, 4).select(col("id").as("band"))
        .join(c.groupBy(col("band")).agg(count(lit(1)).as("gc")),
          Seq("band"), "left")
        .crossJoin(broadcast(c.agg(count(lit(1)).as("gn"))))
        .select(col("band"),
          expr("coalesce(gc, 0) * 1000000 div gn").as("q_ppm"))
      val groups = c.groupBy(col("nat"), col("seg"))
        .agg(count(lit(1)).as("n"))
      val grid = groups
        .withColumn("band", explode(expr("sequence(CAST(0 AS BIGINT), 3)")))
      val cnt = c.groupBy(col("nat"), col("seg"), col("band"))
        .agg(count(lit(1)).as("nb"))
      import org.apache.spark.sql.expressions.Window
      val wCum = Window.partitionBy("nat", "seg").orderBy("band")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      grid.join(cnt, Seq("nat", "seg", "band"), "left")
        .join(broadcast(glob), Seq("band"))
        .withColumn("p_ppm", expr("coalesce(nb, 0) * 1000000 div n"))
        .withColumn("cp", sum(col("p_ppm")).over(wCum))
        .withColumn("cq", sum(col("q_ppm")).over(wCum))
        .filter(col("band") <= 2) // the (m-1) cumulative positions
        .groupBy(col("nat"), col("seg"))
        .agg(max(col("n")).as("n"),
          sum(abs(col("cp") - col("cq"))).as("emd_sum"))
        .select(col("nat"), col("seg"), col("n"),
          expr("emd_sum div 3").as("emd_ppm"))
        .withColumn("meets_t20", col("emd_ppm") <= 200000L)
        .orderBy("nat", "seg")
    }),
    "q397_ips_eval" -> ((s, dir) => {
      // OFFLINE POLICY EVALUATION by inverse propensity scoring (Horvitz–
      // Thompson; SNIPS per Swaminathan & Joachims 2015): logged actions
      // with known behavior-policy propensities {0.5, 0.3, 0.2} are
      // replayed against a deterministic target policy π(user) =
      // user_id % 3; IPS = Σ r·1[π=a]/p / N and the self-normalized
      // variant divide ONLY matched rows' micro-weights — all exact
      // integers, one hash aggregate per arm. The counterfactual-eval
      // shape every recommender ships before an online test.
      val e = T(s, dir, "events")
        .filter(col("user_id").isNotNull)
        .select(col("user_id"), col("event_id"),
          when(col("event_type") === "purchase", 1L).otherwise(0L).as("r"))
        .withColumn("a", expr(
          "CASE WHEN event_id % 10 < 5 THEN 0 WHEN event_id % 10 < 8 THEN 1 ELSE 2 END"))
        .withColumn("w_micro", expr(
          "CASE WHEN a = 0 THEN 2000000 WHEN a = 1 THEN 3333333 ELSE 5000000 END"))
        .withColumn("pi", expr("CAST(user_id % 3 AS INT)"))
        .withColumn("m", when(col("pi") === col("a"), 1L).otherwise(0L))
      e.groupBy(col("pi").cast("long").as("pi_arm"))
        .agg(count(lit(1)).as("n"), sum(col("m")).as("n_matched"),
          sum(col("r") * col("m") * col("w_micro")).as("swr"),
          sum(col("m") * col("w_micro")).as("sw"),
          sum(col("r")).as("sr"))
        .select(col("pi_arm"), col("n"), col("n_matched"),
          expr("swr div n").as("ips_micro"),
          expr("swr * 10000 div greatest(sw, 1)").as("snips_bp"),
          expr("sr * 10000 div n").as("logged_reward_bp"))
        .orderBy("pi_arm")
    }),
    "q398_bitmap_index" -> ((s, dir) => {
      // BITMAP INDEX set algebra: each event-type segment's user set is
      // packed into 32-bit words (word = id div 32, mask = 1 << id%32,
      // OR-aggregated — 32, not 64, because DuckDB's left shift overflows
      // at bit 63), then segment-pair intersections are ONE equi-join on
      // the word index + bit_count(a & b): the roaring-bitmap serving
      // shape, where |A∩B| costs O(words), not O(users). Cardinalities
      // come from the same bitmaps (never recounted from rows), and the
      // 5×5 pair frame is metadata-sized.
      val bm = T(s, dir, "events")
        .filter(col("user_id").isNotNull)
        .select(col("event_type").as("seg"), col("user_id")).distinct()
        .select(col("seg"), expr("user_id div 32").as("w"),
          expr("shiftleft(CAST(1 AS BIGINT), CAST(user_id % 32 AS INT))").as("m"))
        .groupBy(col("seg"), col("w")).agg(expr("bit_or(m)").as("bits"))
      val card = bm.groupBy(col("seg"))
        .agg(sum(expr("bit_count(bits)")).as("card"))
      val inter = bm.select(col("seg").as("seg_a"), col("w"), col("bits").as("ba"))
        .join(bm.select(col("seg").as("seg_b"), col("w"), col("bits").as("bb")),
          Seq("w"))
        .filter(col("seg_a") < col("seg_b"))
        .groupBy(col("seg_a"), col("seg_b"))
        .agg(sum(expr("bit_count(ba & bb)")).as("inter"))
      val ca = card.select(col("seg").as("seg_a"), col("card").as("card_a"))
      val cb = card.select(col("seg").as("seg_b"), col("card").as("card_b"))
      ca.crossJoin(cb).filter(col("seg_a") < col("seg_b"))
        .join(inter, Seq("seg_a", "seg_b"), "left")
        .withColumn("inter", coalesce(col("inter"), lit(0L)))
        .select(col("seg_a"), col("seg_b"), col("card_a"), col("card_b"),
          col("inter"),
          (col("card_a") + col("card_b") - col("inter")).as("uni"))
        .withColumn("jaccard_bp", expr("inter * 10000 div uni"))
        .orderBy("seg_a", "seg_b")
    }),
    "q399_powerlaw_mle" -> ((s, dir) =>
      // Power-law tail fit (Clauset, Shalizi & Newman 2009): per source,
      // the continuous MLE α = 1 + n / Σ ln(x/xmin) over doc lengths ≥
      // xmin = 200. Each row's log is quantized to EXACT floor-micros
      // before the sum, so the aggregate is an order-free integer sum
      // (summing raw doubles would leak partition order; buffering values
      // for an ordered fold would be the collect_list antipattern) — the
      // one double division happens once per source at the end.
      T(s, dir, "documents")
        .filter(col("n_chars") >= 200)
        .select(col("source"), expr(
          "CAST(floor(ln(CAST(n_chars AS DOUBLE) / 200.0) * 1000000) AS BIGINT)")
          .as("lnx"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_tail"), sum(col("lnx")).as("s_micro"))
        .select(col("source"), col("n_tail"), col("s_micro"),
          Num.roundz(lit(1.0) + col("n_tail").cast("double") * 1000000.0
            / expr("CAST(nullif(s_micro, 0) AS DOUBLE)"), 4).as("alpha"))
        .orderBy("source")),
    "q400_brier_decomposition" -> ((s, dir) => {
      // Murphy decomposition of the Brier score (Murphy 1973): forecasts
      // bucketed into 11 probability bins; per bin the EXACT ingredients
      // — n, hits, Σforecast_bp, and the raw Brier numerator
      // Σ(f_bp − y·10⁴)² (exact long) — plus the reliability term
      // n_k(f̄_k − ō_k)² as ONE fixed double chain over those longs
      // (the square of a 10⁴-scaled sum overflows int64 at sf1, so the
      // division-bearing term is double by design). One hash aggregate;
      // the calibration-audit twin of q211 with the variance accounting.
      val e = T(s, dir, "events")
        .filter(col("user_id").isNotNull)
        .select(expr("(user_id * 31 % 101) * 100").as("f_bp"),
          when(col("event_type") === "purchase", 1L).otherwise(0L).as("y"))
      e.groupBy(expr("f_bp div 1000").as("bin"))
        .agg(count(lit(1)).as("n"), sum(col("y")).as("o"),
          sum(col("f_bp")).as("sum_f_bp"),
          sum(expr("(f_bp - y * 10000) * (f_bp - y * 10000)")).as("brier_num"))
        .withColumn("rel", Num.roundz(
          (col("sum_f_bp").cast("double") - lit(10000.0) * col("o"))
            * (col("sum_f_bp").cast("double") - lit(10000.0) * col("o"))
            / (lit(100000000.0) * col("n")), 4))
        .orderBy("bin")
    }),
    "q401_neyman_allocation" -> ((s, dir) => {
      // NEYMAN OPTIMAL ALLOCATION (Neyman 1934) of a 1000-row sample
      // budget across strata: n_h ∝ N_h·S_h, with each stratum's sd from
      // exact integer moments and the weight quantized to floor(N·sd·10³)
      // BEFORE the cross-stratum sum (5 exact longs — order-free), then
      // LARGEST-REMAINDER rounding so the allocations sum to exactly 1000
      // deterministically. The strata frame is 5 rows of metadata; the
      // only corpus-sized work is one moment aggregate.
      import org.apache.spark.sql.expressions.Window
      val m = T(s, dir, "events")
        .select(col("event_type"),
          Num.roundz(col("value") * 100, 0).cast("long").as("cents"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("s"),
          sum(col("cents") * col("cents")).as("ss"))
        .withColumn("w_scaled", expr(
          """CAST(floor(CAST(n AS DOUBLE) * sqrt((CAST(n AS DOUBLE) * CAST(ss AS DOUBLE)
            | - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
            | / (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE))) * 1000) AS BIGINT)"""
            .stripMargin.replace("\n", " ")))
      val tot = m.agg(sum(col("w_scaled")).as("tw"))
      val base = m.crossJoin(broadcast(tot))
        .withColumn("alloc_base", expr("w_scaled * 1000 div tw"))
        .withColumn("rem", expr("(w_scaled * 1000) % tw"))
      val used = base.agg(sum(col("alloc_base")).as("ub"))
      base.crossJoin(broadcast(used))
        .withColumn("rk", row_number().over(
          Window.orderBy(col("rem").desc, col("event_type"))))
        .withColumn("alloc", col("alloc_base")
          + when(col("rk") <= lit(1000L) - col("ub"), 1L).otherwise(0L))
        .select(col("event_type"), col("n"), col("w_scaled"), col("alloc"))
        .orderBy("event_type")
    }),
    "q402_paa_symbolize" -> ((s, dir) => {
      // SAX-style series symbolization (Lin, Keogh et al. 2003): each
      // event type's daily-count series is piecewise-aggregate-
      // approximated over 4-day segments (exact micro means via integer
      // division — gaps shrink the divisor, not the truth), then
      // discretized to a 4-symbol alphabet by min-max scaling against the
      // series' own PAA range. Two bounded aggregates + a per-series
      // min/max broadcast join; symbols are exact integers end to end
      // (the Gaussian-breakpoint variant would hinge on cross-engine
      // float quantiles — min-max keeps the gate bit-exact).
      val daily = T(s, dir, "events")
        .groupBy(col("event_type"),
          datediff(to_date(col("ts")), lit("2020-01-01")).cast("long").as("d"))
        .agg(count(lit(1)).as("cnt"))
      val paa = daily.groupBy(col("event_type"), expr("d div 4").as("seg"))
        .agg(count(lit(1)).as("n_days"), sum(col("cnt")).as("sum_cnt"))
        .withColumn("paa_micro", expr("sum_cnt * 1000000 div n_days"))
      val rng = paa.groupBy(col("event_type"))
        .agg(min(col("paa_micro")).as("lo"), max(col("paa_micro")).as("hi"))
      paa.join(broadcast(rng), Seq("event_type"))
        .withColumn("sym", expr("(paa_micro - lo) * 4 div (hi - lo + 1)"))
        .select(col("event_type"), col("seg"), col("n_days"), col("sum_cnt"),
          col("paa_micro"), col("sym"))
        .orderBy("event_type", "seg")
    }),
    "q403_poisson_bootstrap" -> ((s, dir) => {
      // POISSON BOOTSTRAP standard error (Chamandy et al. 2012, the
      // resampling that works on streams/shards because replicate weights
      // are i.i.d. per row — no global sample draw): 32 replicas, each
      // row's weight a deterministic Poisson(1) variate read off hash
      // thresholds (CDF·10⁴ = 3679/7358/9197/9810/9963), replica means in
      // exact micros, and the SE over the 32 replica means from exact
      // integer moments with ONE sqrt at the end. The explode is a narrow
      // 32× map fan-out that map-side-combines straight back down to 32
      // groups — no corpus-sized shuffle.
      val e = T(s, dir, "events")
        .select(col("event_id"),
          Num.roundz(col("value") * 100, 0).cast("long").as("cents"))
      val rep = e.withColumn("r", explode(expr("sequence(CAST(0 AS BIGINT), 31)")))
        .withColumn("h", expr("((event_id * 131 + r) * 48271) % 2147483647 % 10000"))
        .withColumn("w", expr(
          """CASE WHEN h < 3679 THEN 0 WHEN h < 7358 THEN 1 WHEN h < 9197 THEN 2
            | WHEN h < 9810 THEN 3 WHEN h < 9963 THEN 4 ELSE 5 END"""
            .stripMargin.replace("\n", " ")))
        .groupBy(col("r"))
        .agg(sum(col("w")).as("sw"), sum(col("w") * col("cents")).as("swy"))
        .select(expr("swy * 100 div greatest(sw, 1)").as("m"))
        .agg(count(lit(1)).as("n_rep"), sum(col("m")).as("sm"),
          sum(col("m") * col("m")).as("sm2"))
      val pe = e.agg(count(lit(1)).as("n_events"), sum(col("cents")).as("sc"))
        .select(col("n_events"), expr("sc * 100 div n_events").as("point_mean_micros"))
      pe.crossJoin(broadcast(rep))
        .select(col("n_events"), col("point_mean_micros"),
          expr("sm div n_rep").as("boot_mean_micros"),
          Num.roundz(sqrt((col("n_rep").cast("double") * col("sm2")
            - col("sm").cast("double") * col("sm"))
            / (col("n_rep").cast("double") * (col("n_rep") - lit(1L)))), 4)
            .as("boot_se_micros"))
    }),
    "q404_theta_sketch" -> ((s, dir) => {
      // THETA (KMV bottom-k) sketch set algebra (Dasgupta et al. 2016,
      // the DataSketches theta family): per segment keep the k = 32
      // smallest MINSTD priorities — a mergeable O(k) summary. Union /
      // intersection estimates come from the RETAINED ENTRIES below
      // θ = min(θ_a, θ_b) — |{p < θ}|·M div θ, exact integer division —
      // next to the EXACT intersection from one corpus join, so the gate
      // row carries the estimator AND its truth (the q212 honest-eval
      // convention). The MINSTD map is a bijection mod the prime, so
      // priorities are collision-free; everything after the per-segment
      // bottom-k is a ≤5·32-row metadata frame.
      import org.apache.spark.sql.expressions.Window
      val M = 2147483647L
      val d = T(s, dir, "events")
        .filter(col("user_id").isNotNull)
        .select(col("event_type").as("seg"), col("user_id")).distinct()
        .withColumn("p", expr("(user_id * 48271) % 2147483647 + 1"))
      val sk = d.withColumn("rn",
          row_number().over(Window.partitionBy("seg").orderBy("p")))
        .filter(col("rn") <= 32)
      val theta = sk.groupBy(col("seg"))
        .agg(max(col("p")).as("kth"), count(lit(1)).as("n_ret"))
        .join(d.groupBy(col("seg")).agg(count(lit(1)).as("n_exact")), Seq("seg"))
        .withColumn("theta",
          when(col("n_ret") < 32, lit(M)).otherwise(col("kth")))
        .withColumn("est",
          when(col("n_ret") < 32, col("n_exact"))
            .otherwise(expr("CAST(31 AS BIGINT) * 2147483647 div theta")))
      val pa = theta.select(col("seg").as("seg_a"), col("theta").as("th_a"),
        col("est").as("est_a"))
      val pb = theta.select(col("seg").as("seg_b"), col("theta").as("th_b"),
        col("est").as("est_b"))
      val pairs = pa.crossJoin(pb).filter(col("seg_a") < col("seg_b"))
        .withColumn("th", least(col("th_a"), col("th_b")))
      val skp = pairs.select(col("seg_a"), col("seg_b"), col("th"))
        .join(sk.select(col("seg").as("sseg"), col("p")),
          col("sseg") === col("seg_a") || col("sseg") === col("seg_b"))
        .filter(col("p") < col("th"))
        .groupBy(col("seg_a"), col("seg_b"), col("th"), col("p"))
        .agg(count(lit(1)).as("c"))
        .groupBy(col("seg_a"), col("seg_b"), col("th"))
        .agg(count(lit(1)).as("u_cnt"),
          sum(when(col("c") === 2, 1L).otherwise(0L)).as("i_cnt"))
        .drop("th") // pairs carries the authoritative copy into the select
      val exact = d.select(col("seg").as("seg_a"), col("user_id"))
        .join(d.select(col("seg").as("seg_b"), col("user_id")), Seq("user_id"))
        .filter(col("seg_a") < col("seg_b"))
        .groupBy(col("seg_a"), col("seg_b"))
        .agg(count(lit(1)).as("true_inter"))
      pairs.join(skp, Seq("seg_a", "seg_b"), "left")
        .join(exact, Seq("seg_a", "seg_b"), "left")
        .select(col("seg_a"), col("seg_b"), col("est_a"), col("est_b"),
          expr("coalesce(u_cnt, 0) * 2147483647 div th").as("est_union"),
          expr("coalesce(i_cnt, 0) * 2147483647 div th").as("est_inter"),
          coalesce(col("true_inter"), lit(0L)).as("true_inter"))
        .orderBy("seg_a", "seg_b")
    }),
    "q405_borda_kendall" -> ((s, dir) => {
      // RANK AGGREGATION with agreement audit: three rankers' top-20s
      // (price, size, and a MINSTD "random" baseline) fuse by BORDA COUNT
      // (score = Σ(21 − rank), absent = 0, de Borda 1781), then each
      // input ranker is scored against the consensus by exact KENDALL
      // TAU-A over the items both lists share. Each top-20 is a
      // TakeOrderedAndProject heap (never a global sort of parts); all
      // pair counting happens on ≤20-row metadata frames. The
      // formula-complement of q189's reciprocal-rank fusion.
      import org.apache.spark.sql.expressions.Window
      val parts = T(s, dir, "part")
      def top20(ord: Column, name: String): DataFrame = {
        val t = parts.select(col("p_partkey"), ord.as("__o"))
          .orderBy(col("__o"), col("p_partkey")).limit(20)
        t.withColumn(name,
          row_number().over(Window.orderBy(col("__o"), col("p_partkey"))))
          .drop("__o")
      }
      val r1 = top20(negate(col("p_retailprice")), "r_price")
      val r2 = top20(negate(col("p_size").cast("long")), "r_size")
      val r3 = top20(expr("(p_partkey * 16807) % 2147483647"), "r_hash")
      val fused = r1.join(r2, Seq("p_partkey"), "full")
        .join(r3, Seq("p_partkey"), "full")
        .withColumn("borda",
          expr("coalesce(21 - r_price, 0) + coalesce(21 - r_size, 0)" +
            " + coalesce(21 - r_hash, 0)").cast("long"))
        .withColumn("consensus",
          row_number().over(Window.orderBy(col("borda").desc, col("p_partkey"))))
      def tau(rcol: String): DataFrame = {
        val c = fused.filter(col(rcol).isNotNull)
          .select(col("p_partkey").as("k"), col("consensus").as("cr"),
            col(rcol).cast("long").as("rr"))
        c.as("x").join(c.as("y"), col("x.k") < col("y.k"))
          .select((((col("x.cr") < col("y.cr")) === (col("x.rr") < col("y.rr")))
            .cast("long")).as("conc"))
          .agg(count(lit(1)).as("n_pairs"), sum(col("conc")).as("concordant"))
          .select(lit(rcol).as("ranker"), col("n_pairs"), col("concordant"),
            (col("n_pairs") - col("concordant")).as("discordant"),
            expr("(concordant - (n_pairs - concordant)) * 1000 div n_pairs")
              .as("tau_milli"))
      }
      tau("r_price").unionByName(tau("r_size")).unionByName(tau("r_hash"))
        .orderBy("ranker")
    }),
    "q406_good_turing" -> ((s, dir) => {
      // GOOD–TURING frequency re-estimation (Good 1953, the smoothing
      // under Katz backoff and the SGT family): token frequencies r →
      // frequencies-of-frequencies N_r → adjusted mass r* = (r+1)·N_{r+1}
      // / N_r in exact milli-units, plus the unseen-mass estimate
      // P₀ = N₁/N in bp. Two hash aggregates over the corpus; the N_r
      // frame is ≤ |distinct frequencies| rows (≈√corpus — metadata), and
      // the r+1 lookup is an equi-join on it, not a window.
      val tok = T(s, dir, "documents")
        .select(explode(expr(
          "filter(split(lower(text), '\\\\s+'), t -> length(t) > 0)")).as("tok"))
      val freq = tok.groupBy(col("tok")).agg(count(lit(1)).as("r"))
      val nr = freq.groupBy(col("r")).agg(count(lit(1)).as("n_r"))
      val tot = freq.agg(sum(col("r")).as("n_tokens"),
        sum(when(col("r") === 1, 1L).otherwise(0L)).as("n1"))
      nr.join(nr.select((col("r") - 1).as("r"), col("n_r").as("n_r1")),
          Seq("r"), "left")
        .crossJoin(broadcast(tot))
        .select(col("r"), col("n_r"),
          expr("(r + 1) * coalesce(n_r1, 0) * 1000 div n_r").as("r_star_milli"),
          expr("n1 * 10000 div n_tokens").as("p0_bp"))
        .orderBy("r").limit(20) // the 20 lowest frequencies PRESENT (a
        // fixed r <= 20 cut can be empty on a head-heavy tiny corpus)
    }),
    "q407_hash_ring" -> ((s, dir) => {
      // CONSISTENT-HASH RING with a resize audit — the ring twin of
      // q341's rendezvous sharding: 8 virtual nodes per shard at MINSTD
      // positions, every key owned by its clockwise successor (min
      // position ≥ key hash, wrapping to the global min). The successor
      // argmin rides ONE packed key (pos·100 + shard), so both ring
      // configurations (8 and 9 shards) resolve in a single conditional
      // aggregate over one 72-row broadcast fan-out. The ring property
      // under test: growing 8 → 9 shards moves ONLY keys claimed by the
      // new shard's vnodes — n_moved ≡ n_to_new, keys never reshuffle
      // among survivors (the audit column the gate pins).
      val vn = s.range(72).select(
        expr("id div 8").as("shard"),
        // Knuth multiplier > modulus so positions WRAP and spread over the
        // whole ring (a small MINSTD multiplier parks all 72 vnodes in the
        // first 0.2% of the ring and the wrap case dominates)
        expr("((id + 1) * 2654435761) % 2147483647").as("pos"))
        .withColumn("packed", expr("pos * 100 + shard"))
      val keys = T(s, dir, "events")
        .filter(col("user_id").isNotNull)
        .select(col("user_id")).distinct()
        .withColumn("kh", expr("(user_id * 2654435761) % 2147483647"))
      val asg = keys.crossJoin(broadcast(vn))
        .groupBy(col("user_id"))
        .agg(
          min(when(col("shard") < 8 && col("pos") >= col("kh"),
            col("packed"))).as("s8succ"),
          min(when(col("shard") < 8, col("packed"))).as("s8wrap"),
          min(when(col("pos") >= col("kh"), col("packed"))).as("s9succ"),
          min(col("packed")).as("s9wrap"))
        .select(col("user_id"),
          expr("coalesce(s8succ, s8wrap) % 100").as("shard8"),
          expr("coalesce(s9succ, s9wrap) % 100").as("shard9"))
      asg.groupBy(col("shard8"))
        .agg(count(lit(1)).as("n_keys"),
          sum(when(col("shard9") =!= col("shard8"), 1L).otherwise(0L))
            .as("n_moved"),
          sum(when(col("shard9") === 8, 1L).otherwise(0L)).as("n_to_new"))
        .withColumn("moved_bp", expr("n_moved * 10000 div n_keys"))
        .orderBy("shard8")
    }),
    "q408_contribution_bounding" -> ((s, dir) => {
      // PER-USER CONTRIBUTION BOUNDING — the differential-privacy
      // preprocessing step (Wilson et al. 2020, "DP SQL"): each user
      // contributes at most k = 8 events (first 8 by time, deterministic
      // tie-break), capping any aggregate's per-user sensitivity at k.
      // One user-keyed window pass; the output ledger shows per day what
      // the clamp cost — the utility-vs-sensitivity table a DP release
      // publishes before choosing ε.
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      T(s, dir, "events")
        .filter(col("user_id").isNotNull)
        .withColumn("rn", row_number().over(w))
        .groupBy(TextFunctions.dayString(col("ts")).as("day"))
        .agg(count(lit(1)).as("n_raw"),
          sum(when(col("rn") <= 8, 1L).otherwise(0L)).as("n_bounded"))
        .withColumn("clamp_loss_bp",
          expr("(n_raw - n_bounded) * 10000 div n_raw"))
        .orderBy("day")
    }),
    "q409_skipgram_pairs" -> ((s, dir) => {
      // SKIP-GRAM training-pair extraction (Mikolov et al. 2013): for
      // every token, its contexts at offsets ±1 and ±2 — both directions
      // emitted, so the pair table is exactly what a word2vec/fastText
      // run consumes. Contexts come from per-doc window leads (no
      // self-join on position), the global head is a TakeOrdered heap,
      // and the distance weight is the exact 1000/dist milli-unit.
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("doc_id").orderBy("pos")
      val t = T(s, dir, "documents")
        .select(col("doc_id"), posexplode(expr(
          "filter(split(lower(text), '\\\\s+'), t -> length(t) > 0)"))
          .as(Seq("pos", "tok")))
        .withColumn("n1", lead(col("tok"), 1).over(w))
        .withColumn("n2", lead(col("tok"), 2).over(w))
      val fwd1 = t.filter(col("n1").isNotNull)
        .select(col("tok").as("w1"), col("n1").as("w2"), lit(1L).as("dist"))
      val fwd2 = t.filter(col("n2").isNotNull)
        .select(col("tok").as("w1"), col("n2").as("w2"), lit(2L).as("dist"))
      val bwd1 = fwd1.select(col("w2").as("w1"), col("w1").as("w2"), col("dist"))
      val bwd2 = fwd2.select(col("w2").as("w1"), col("w1").as("w2"), col("dist"))
      fwd1.unionByName(fwd2).unionByName(bwd1).unionByName(bwd2)
        .groupBy(col("w1"), col("w2"), col("dist"))
        .agg(count(lit(1)).as("cnt"))
        .withColumn("weight_milli", expr("1000 div dist"))
        .orderBy(col("cnt").desc, col("w1"), col("w2"), col("dist"))
        .limit(30)
    }),
    "q410_churn_labels" -> ((s, dir) => {
      // FORWARD-WINDOW CHURN LABELING — the label-generation twin of
      // q310's point-in-time features: a user-day is "churned" when the
      // user has NO activity in the strictly-later 14-day window. The
      // lookahead is one lead() over the user's distinct active days —
      // strictly future data flows ONLY into the label column, never a
      // feature (the leakage direction q336's embargo guards). Output is
      // the per-day churn base rate a retention model trains against.
      import org.apache.spark.sql.expressions.Window
      val days = T(s, dir, "events")
        .filter(col("user_id").isNotNull)
        .select(col("user_id"), to_date(col("ts")).as("d")).distinct()
      val w = Window.partitionBy("user_id").orderBy("d")
      days.withColumn("nxt", lead(col("d"), 1).over(w))
        .withColumn("churned",
          when(col("nxt").isNull || datediff(col("nxt"), col("d")) > 14, 1L)
            .otherwise(0L))
        .groupBy(date_format(col("d"), "yyyy-MM-dd").as("day"))
        .agg(count(lit(1)).as("n_user_days"), sum(col("churned")).as("n_churned"))
        .withColumn("churn_bp", expr("n_churned * 10000 div n_user_days"))
        .orderBy("day")
    }),
    "q411_haar_wavelet" -> ((s, dir) => {
      // UNNORMALIZED HAAR WAVELET decomposition of each event type's
      // daily-count series (Haar 1910; the data-sketch use is Matias,
      // Vitter & Wang SIGMOD'98 wavelet synopses): 3 levels of pairwise
      // (sum, difference) coefficients — all exact integers because the
      // √2 normalization is dropped (resolution-k energy just carries a
      // 2^k scale). The series densifies against a calendar derived from
      // ONE 1-row min/max aggregate (gaps are real zeros, not absent
      // rows — pairing must align), then each level is one bounded
      // groupBy idx div 2. The smooth coefficients ARE the next level's
      // input, so the whole transform is 3 tiny aggregates after the
      // daily rollup.
      val e = T(s, dir, "events")
        .select(col("event_type"), to_date(col("ts")).as("d"))
      val bounds = e.agg(min(col("d")).as("d0"), max(col("d")).as("d1"))
      val cal = bounds.select(explode(expr(
        "sequence(CAST(0 AS BIGINT), CAST(datediff(d1, d0) AS BIGINT))")).as("idx"))
      val types = e.select(col("event_type")).distinct()
      val daily = e.crossJoin(broadcast(bounds))
        .groupBy(col("event_type"),
          datediff(col("d"), col("d0")).cast("long").as("idx"))
        .agg(count(lit(1)).as("c"))
      val dense = types.crossJoin(cal)
        .join(daily, Seq("event_type", "idx"), "left")
        .withColumn("c", coalesce(col("c"), lit(0L)))
      def level(prev: DataFrame): DataFrame = prev
        // signed term computed BEFORE regrouping so the aggregate never
        // references the (re-aliased) group key
        .withColumn("sgn",
          when(col("idx") % 2 === 0, col("c")).otherwise(-col("c")))
        .groupBy(col("event_type"), expr("idx div 2").as("idx"))
        .agg(sum(col("c")).as("c"), sum(col("sgn")).as("dcoef"))
      val l1 = level(dense)
      val l2 = level(l1.select(col("event_type"), col("idx"), col("c")))
      val l3 = level(l2.select(col("event_type"), col("idx"), col("c")))
      l1.withColumn("level", lit(1L))
        .unionByName(l2.withColumn("level", lit(2L)))
        .unionByName(l3.withColumn("level", lit(3L)))
        .select(col("event_type"), col("level"), col("idx"),
          col("c").as("smooth"), col("dcoef"))
        .orderBy("event_type", "level", "idx")
    }),
    "q412_mutual_knn" -> ((s, dir) => {
      // MUTUAL nearest neighbors (reciprocal top-1) — the hard filter on
      // top of q354's soft margin for bitext/alignment mining: x↔y is a
      // pair iff y is x's best forward match AND x is y's best backward
      // match. The backward pass scores ONLY the forward hits (≤|queries|
      // rows, broadcast back over one X-pool scan) — never pool×pool;
      // ranking on exact bp-quantized cosines, one IEEE division per
      // scored pair. At corpus scale both directions run on the IVF index
      // (q58); the exact scan here is the bounded-query-batch shape that
      // requireQueryBatch enforces. The pair table is the SHARED
      // materialized yardstick (mutualKnnExactIndex) q417's recall curve
      // reads — built once per (dir) per JVM.
      mutualKnnExactIndex(s, dir).orderBy("x")
    }),
    "q413_anova" -> ((s, dir) => {
      // ONE-WAY ANOVA across the k = 5 event-type arms (Fisher): the
      // k-arm generalization of q244's two-arm Welch t. Between/within
      // sums of squares decompose into per-group exact integer moments
      // (n_g, Σy, Σy²) plus grand totals — one hash aggregate, then a
      // 5-row metadata fold; F = (SSB/(k−1))/(SSW/(N−k)) is one fixed
      // double chain written identically in the oracle. The experiment
      // readout for "did ANY arm move" before pairwise tests.
      val m = T(s, dir, "events")
        .select(col("event_type"),
          Num.roundz(col("value") * 100, 0).cast("long").as("y"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("y")).as("s"),
          sum(col("y") * col("y")).as("ss"))
      val g = m.agg(count(lit(1)).as("k"), sum(col("n")).as("nn"),
        sum(col("s")).as("ts"),
        sum(col("ss")).as("tss"),
        // Σ_g s_g²/n_g quantized per group to exact CENTI units BEFORE the
        // sum (float-order-free, q399 discipline; centi not micro because
        // (Σcents)²/n · 10⁶ would overflow int64 at sf1)
        sum(expr("CAST(floor(CAST(s AS DOUBLE) * CAST(s AS DOUBLE)" +
          " / CAST(n AS DOUBLE) * 100) AS BIGINT)")).as("sg_centi"))
      g.select(col("k"), col("nn"),
          Num.roundz((col("sg_centi") / lit(100.0)
            - col("ts").cast("double") * col("ts") / col("nn")), 4).as("ssb"),
          Num.roundz((col("tss").cast("double")
            - col("sg_centi") / lit(100.0)), 4).as("ssw"),
          Num.roundz(((col("sg_centi") / lit(100.0)
            - col("ts").cast("double") * col("ts") / col("nn"))
            / (col("k") - lit(1L)))
            / ((col("tss").cast("double") - col("sg_centi") / lit(100.0))
              / (col("nn") - col("k"))), 4).as("f_stat"))
    }),
    "q414_stratified_kfold" -> ((s, dir) =>
      // STRATIFIED k-fold assignment (the cross-validation counterpart of
      // q109's single split): within each label stratum, documents take
      // folds round-robin in a deterministic (doc_id) order, so every
      // fold's stratum mix matches the corpus mix to within one document
      // — the property the gate row pins (per fold × stratum counts).
      // One stratum-keyed window pass; folds never shuffle the corpus.
      {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("lang").orderBy("doc_id")
        T(s, dir, "documents")
          .select(col("doc_id"), col("lang"))
          .withColumn("fold", (row_number().over(w) - 1) % 5)
          .groupBy(col("fold").cast("long").as("fold"), col("lang"))
          .agg(count(lit(1)).as("n"))
          .orderBy("fold", "lang")
      }),
    "q415_eb_shrinkage" -> ((s, dir) => {
      // EMPIRICAL-BAYES shrinkage of per-part return rates toward the
      // corpus prior (additive smoothing with data-derived prior mean,
      // prior strength τ = 20 pseudo-observations) — the stabilizer next
      // to q360's Wilson bound: a 1-return/1-line part no longer tops the
      // board. shrunk = (r + τ·p̄)/(n + τ) with p̄ = R/N evaluates EXACTLY
      // as (r·N + τ·R)·10⁴ div ((n + τ)·N) — all integers, one corpus
      // aggregate plus a 1-row broadcast.
      val per = T(s, dir, "lineitem")
        .groupBy(col("l_partkey"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("l_returnflag") === "R", 1L).otherwise(0L)).as("r"))
      val tot = per.agg(sum(col("n")).as("nn"), sum(col("r")).as("rr"))
      per.crossJoin(broadcast(tot))
        .select(col("l_partkey"), col("n"), col("r"),
          expr("r * 10000 div n").as("raw_bp"),
          expr("(r * nn + 20 * rr) * 10000 div ((n + 20) * nn)").as("shrunk_bp"))
        .orderBy(col("shrunk_bp").desc, col("l_partkey")).limit(20)
    }),
    "q416_set_cover" -> ((s, dir) => {
      // GREEDY SET COVER over token vocabularies — coverage-maximizing
      // corpus selection (the submodular data-selection shape of
      // facility-location/coreset curation, Wei et al. 2015): 10 rounds,
      // each picking the document adding the most not-yet-covered tokens
      // (ties to the smallest doc_id). Greedy is (1−1/e)-optimal and
      // INHERENTLY sequential — each round is one aggregate over the
      // doc-token pair index (derived once, localCheckpointed) with the
      // covered vocabulary as a ≤rounds·|doc| broadcast anti-join; the
      // per-round argmax is a 1-row metadata collect (q389 discipline).
      // the universe is BIGRAMS (unigram cover saturates in one pick on
      // this corpus's 31-word vocabulary — bigrams give the greedy walk
      // a real frontier at every SF)
      // size(arr) >= 2 guard: Spark's sequence(1, 0) DESCENDS ([1, 0]) and
      // element_at(arr, 0) throws, so a 0/1-token doc would crash the
      // transform; DuckDB's range(1, len) is simply empty. Filtering short
      // docs keeps both engines at "no bigrams" parity.
      val pairs = T(s, dir, "documents")
        .select(col("doc_id"),
          expr("filter(split(lower(text), '\\\\s+'), t -> length(t) > 0)")
            .as("arr"))
        .filter(expr("size(arr) >= 2"))
        .select(col("doc_id"), explode(expr(
          "transform(sequence(1, size(arr) - 1)," +
            " i -> concat(element_at(arr, i), ' ', element_at(arr, i + 1)))"))
          .as("tok"))
        .distinct()
        .localCheckpoint()
      Curation.greedySetCover(s, pairs, rounds = 10)
    }),
    "q417_mutual_knn_ivf" -> ((s, dir) => {
      // IVF-INDEXED mutual kNN — the corpus-scale variant q412's design
      // note promises: BOTH directions run on the q58 IVF index (probed
      // cells only, never a full scan), and recall is measured against
      // q412's exact reciprocal-top-1 semantics at nprobe 1/2/4/8 (the
      // q268 curve pattern). This is the operator a 100 TB bitext-mining
      // user actually runs: forward = X queries probe the Y index,
      // backward = the forward hits probe the X index; a pair survives
      // iff both directions agree. Per-direction cost is
      // nprobe/|cells| of one index scan; the exact truth (here the
      // recall yardstick) is what the index approximates. The cell
      // ASSIGNMENT is derived ONCE for the whole table and checkpointed
      // (the stored-index production shape — round-14 verdict item 3);
      // the 8 searches (4 nprobe points × 2 directions) filter the shared
      // index instead of re-assigning their corpus side per call.
      val emb = T(s, dir, "embeddings")
      val cents = emb.filter(col("vec_id") >= 100 && col("vec_id") < 116)
      // ONE centroid-scoring pass ranks every vector's cells 1..8; every
      // curve point and direction below FILTERS this frame — probe_rank=1
      // doubles as the storage assignment (the stored-index shape)
      val probed = Similarity.ivfProbeRanked(emb, cents, "vec_id",
        "embedding", maxProbe = 8).localCheckpoint()
      def qc(side: DataFrame): DataFrame = side.select(col("cell"),
        col("vec_id").as("query_id"), col("embedding").as("qv"))
      val xsP = probed.filter(col("vec_id") % 2 === 0 && col("vec_id") < 2000)
      val ysIdx = probed
        .filter(col("vec_id") % 2 === 1 && col("probe_rank") === 1)
        .select(col("cell"), col("vec_id").as("neighbor_id"),
          col("embedding").as("cv"))
      val xsIdx = probed
        .filter(col("vec_id") % 2 === 0 && col("vec_id") < 2000 &&
          col("probe_rank") === 1)
        .select(col("cell"), col("vec_id").as("neighbor_id"),
          col("embedding").as("cv"))
      // the exact yardstick is q412's SHARED materialized pair table —
      // the curve never re-runs the two exact corpus passes
      val exact = mutualKnnExactIndex(s, dir).select(col("x"), col("y"))
      val nEx = exact.agg(count(lit(1)).as("n_exact"))
      Seq(1, 2, 4, 8).map { np =>
        val fwd = Similarity.ivfTopKPrepared(ysIdx,
            qc(xsP.filter(col("probe_rank") <= np)), k = 1)
          .select(col("query_id").as("x"), col("neighbor_id").as("y"))
        val backQ = probed.join(fwd.select(col("y").as("vec_id")).distinct(),
          Seq("vec_id")).filter(col("probe_rank") <= np)
        val bwd = Similarity.ivfTopKPrepared(xsIdx, qc(backQ), k = 1)
          .select(col("query_id").as("y"), col("neighbor_id").as("bx"))
        val approx = fwd.join(bwd, Seq("y")).filter(col("x") === col("bx"))
          .select(col("x"), col("y"))
        approx.join(exact.withColumn("__hit", lit(1)), Seq("x", "y"), "left")
          .agg(count(lit(1)).as("n_pairs"), count(col("__hit")).as("hits"))
          .crossJoin(broadcast(nEx))
          .select(lit(np.toLong).as("nprobe"),
            col("n_pairs").cast("long").as("n_pairs"),
            col("hits").cast("long").as("hits"),
            col("n_exact").cast("long").as("n_exact"),
            Num.roundz(col("hits") / greatest(col("n_exact"), lit(1L)), 4)
              .as("recall"))
      }.reduce(_ unionByName _).orderBy("nprobe")
    }),
    "q41_keyed_fanout" -> ((s, dir) =>
      broadcast(T(s, dir, "nation"))
        .join(T(s, dir, "customer"), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(count(lit(1)).as("cnt"),
          sum(ops.Num.roundz(col("c_acctbal") * 100, 0).cast("long")).as("__cents"))
        // integer half-up rounding of cents/cnt: engine-independent (fp round
        // semantics differ between Spark and DuckDB at exact .5 boundaries)
        .withColumn("avg_bal", (expr("(__cents * 2 + cnt) div (2 * cnt)") / lit(100.0)))
        .drop("__cents")
        .orderBy("n_name")),
    "q42_session_window" -> ((s, dir) =>
      Streaming.tumblingDailyCounts(s, dir).orderBy("bucket_start")),
    // ---------------------------------------------------------- §2.10 extensions
    "q43_exact_dedup" -> ((s, dir) =>
      Dedup.exactDedup(T(s, dir, "documents"), "doc_id", "text").orderBy("keeper_id")),
    "q44_minhash_neardup" -> ((s, dir) =>
      Dedup.minHashNearDup(T(s, dir, "documents"), "doc_id", "text",
        shingleK = 2, numHashes = 16, bands = 8, threshold = 0.25)
        .orderBy("id_a", "id_b")),
    "q45_cosine_topk" -> ((s, dir) => {
      val emb = T(s, dir, "embeddings")
      Similarity.cosineTopK(emb, emb.filter(col("vec_id") < 8), "vec_id", "embedding", 5)
        .orderBy("query_id", "rn")
    }),
    "q46_approx_distinct" -> ((s, dir) =>
      T(s, dir, "events").groupBy(col("event_type"))
        .agg(count_distinct(col("user_id")).as("users")).orderBy("event_type")),
    "q47_text_stats" -> ((s, dir) =>
      TextAnalysis.corpusStats(T(s, dir, "documents"), "lang", "text").orderBy("lang")),
    "q48_simhash" -> ((s, dir) =>
      Dedup.simHash(T(s, dir, "documents"), "doc_id", "text").orderBy("doc_id")),
    "q49_ngram_jaccard" -> ((s, dir) =>
      Dedup.ngramJaccard(T(s, dir, "documents").filter(col("doc_id") < 100),
        "doc_id", "text", k = 2, threshold = 0.1)
        .orderBy("id_a", "id_b")),
    "q50_langid" -> ((s, dir) =>
      T(s, dir, "documents")
        .select(col("doc_id"), TextAnalysis.langId(col("text")).as("lang_pred"))
        .orderBy("doc_id")),
    "q51_quality_score" -> ((s, dir) =>
      T(s, dir, "documents")
        .select(col("doc_id"), TextAnalysis.qualityScore(col("text")).as("quality"))
        .orderBy("doc_id")),
    "q52_token_count" -> ((s, dir) =>
      T(s, dir, "documents").groupBy(col("lang"))
        .agg(sum(TextAnalysis.tokenCount(col("text"))).as("ws_tokens"),
          sum(TextAnalysis.bpeishTokenCount(col("text"))).as("bpe_tokens"))
        .orderBy("lang")),
    "q53_fingerprint" -> ((s, dir) =>
      T(s, dir, "documents")
        .select(col("doc_id"), graft.functions.RollingHash(col("text")).as("fp"))
        .orderBy("doc_id")),
    "q54_embed_neardup" -> ((s, dir) =>
      // scale path: LSH-banded candidates + exact cosine re-score — no
      // CartesianProduct anywhere in the plan (the brute-force all-pairs
      // variant survives only as the recall yardstick in SimilaritySpec)
      Similarity.lshBucketNearDup(
        T(s, dir, "embeddings").filter(col("vec_id") < 200), "vec_id", "embedding",
        threshold = 0.35, numPlanes = 32, bands = 8, dim = 64)
        .orderBy("id_a", "id_b")),
    "q55_ann_lsh" -> ((s, dir) =>
      Similarity.lshBucketNearDup(T(s, dir, "embeddings"), "vec_id", "embedding",
        threshold = 0.35, numPlanes = 32, bands = 4, dim = 64)
        .orderBy("id_a", "id_b")),
    "q56_multimodal" -> ((s, dir) =>
      Multimodal.asMultimodal(T(s, dir, "documents"), "doc_id", "text")
        .select(col("doc_id"), col("meta.n_bytes").as("n_bytes"))
        .orderBy("doc_id")),
    "q57_sessionize" -> ((s, dir) =>
      // gap-based sessionization (session_window): a new session starts only
      // when the inter-event gap EXCEEDS 30 min — session_window merges a
      // window starting exactly at the previous end (boundary-inclusive;
      // verified empirically, RelationalSpec "sessionStats")
      T(s, dir, "events")
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
        .agg(min(col("ts")).as("session_start"), max(col("ts")).as("session_end"),
          count(lit(1)).as("events"))
        .drop("session_window")
        .orderBy("user_id", "session_start")),
    "q58_ann_ivf" -> ((s, dir) => {
      val emb = T(s, dir, "embeddings")
      Similarity.ivfTopK(emb, emb.filter(col("vec_id") < 8),
        emb.filter(col("vec_id") < 16), "vec_id", "embedding", 5)
        .orderBy("query_id", "rn")
    }),
    "q59_stratified_sample" -> ((s, dir) =>
      Curation.stratifiedSample(T(s, dir, "documents"), "lang", "doc_id", 20)
        .select(col("doc_id"), col("lang"))
        .orderBy("lang", "doc_id")),
    "q60_vader" -> ((s, dir) =>
      Sentiment.scoreVader(T(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id")),
    "q61_asof_join" -> ((s, dir) => {
      // point-in-time lookup: each purchase labeled with the user's most
      // recent view at-or-before it (union + one window pass — no range join)
      val ev = T(s, dir, "events")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val views = ev.filter(col("event_type") === "view")
        .select(col("user_id"), col("ts"),
          col("event_id").as("view_event_id"), col("value").as("view_value"))
      Relational.asOfJoin(purchases, views, "user_id", "ts", "ts",
        Seq("view_event_id", "view_value"))
        .orderBy("event_id")
    }),
    "q142_asof_forward" -> ((s, dir) => {
      // the mirror lookup of q61: each purchase labeled with the user's
      // NEXT view at-or-after it (post-purchase behavior attribution) —
      // union + one forward-facing window pass, no range join
      val ev = T(s, dir, "events")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val views = ev.filter(col("event_type") === "view")
        .select(col("user_id"), col("ts"),
          col("event_id").as("view_event_id"), col("value").as("view_value"))
      Relational.asOfJoinForward(purchases, views, "user_id", "ts", "ts",
        Seq("view_event_id", "view_value"))
        .orderBy("event_id")
    }),
    // q62_range_join / q127_fuzzy_join / q394_grid_radius_join are
    // registered via SparkEntry.retiredToTwins (round 17): the binned
    // interval join, the prefix/suffix-blocked row-level fuzzy join and the
    // fixed-knob grid radius join enumerate pair volumes that grow
    // superlinearly with density; the registered plans are their
    // density-scaled twins (q444/q445/q448) and the original shapes live on
    // as Round15Spec yardsticks built inline from ops/.
    "q63_orc_roundtrip" -> ((s, dir) => {
      val nation = T(s, dir, "nation")
      val tmp = s"$TMP/q63_orc"
      nation.coalesce(1).write.mode("overwrite").orc(tmp)
      s.read.schema(nation.schema).orc(tmp).orderBy("n_nationkey")
    }),
    "q116_pq_encode" -> ((s, dir) => {
      // product quantization: m=4 subvectors × 16 dims, codes = nearest
      // codebook centroid per subvector (min L2, id tie-break); codebook =
      // first 8 vectors by id, q58's deterministic-gate convention
      val emb = T(s, dir, "embeddings")
      Similarity.pqEncode(emb, emb.filter(col("vec_id") < 8),
        "vec_id", "embedding", m = 4, subDim = 16)
        .orderBy("vec_id")
    }),
    "q117_rare_tokens" -> ((s, dir) =>
      // unigram-LM-flavored quality signal: rare-token counts + basis-point
      // ratio, all exact integers (no float accumulation anywhere)
      TextAnalysis.rareTokenStats(T(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id")),
    "q118_schema_evolution" -> ((s, dir) => {
      // schema drift across ingest batches: an early batch lacks a column
      // later batches carry; mergeSchema reads the union, old rows NULL
      val nation = T(s, dir, "nation")
      val tmp = s"$TMP/q118_evo"
      nation.select("n_nationkey", "n_name").coalesce(1)
        .write.mode("overwrite").parquet(s"$tmp/batch=1")
      nation.coalesce(1).write.mode("overwrite").parquet(s"$tmp/batch=2")
      s.read.option("mergeSchema", "true").parquet(tmp)
        .select(col("n_nationkey"), col("n_name"), col("n_regionkey"),
          col("batch").cast("int").as("batch"))
        .orderBy("batch", "n_nationkey")
    }),
    "q119_bloom_prune" -> ((s, dir) => {
      // bloom-filter join pruning: the dim key set rides as a sketch that
      // filters the fact MAP-SIDE before its exchange; the semi join then
      // removes false positives, so the result is exactly the semi join
      val cust = T(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      Relational.bloomPrunedSemiJoin(T(s, dir, "orders"), cust,
        "o_custkey", "c_custkey", expectedItems = 100000L)
        .orderBy("o_orderkey")
    }),
    "q120_copurchase_rank" -> ((s, dir) =>
      // item-importance over the co-purchase graph: damped PageRank in
      // scaled-long arithmetic (deterministic across partitionings)
      Graph.pageRank(
        copurchaseEdges(s, dir),
        iterations = 3) // auto strategy: |parts| nodes measure inside broadcast range
        .select(col("node").as("p_partkey"), col("rank").as("rank_scaled"))
        .orderBy("p_partkey")),
    "q121_line_dedup" -> ((s, dir) => {
      // corpus-frequency boilerplate removal (CCNet-style line dedup). The
      // testdata carries no newlines, so the gate segments each doc into
      // fixed 3-token pseudo-lines — the operator takes any lines array
      // (real `\n` lines in the wild) and the rebuild re-joins with the
      // same separator, so an untouched doc round-trips byte-identical.
      val docs = T(s, dir, "documents").withColumn("__tk", split(col("text"), " "))
      val lines = expr("transform(sequence(0, cast(ceil(size(__tk) / 3.0) as int) - 1)," +
        " i -> concat_ws(' ', slice(__tk, i * 3 + 1, 3)))")
      Dedup.commonLineRemoval(docs, "doc_id", lines, maxFreq = 2, sep = " ")
        .orderBy("doc_id")
    }),
    "q122_binary_ingest" -> ((s, dir) => {
      // blob-directory ingest via the binaryFile source — the multimodal
      // landing pattern (a crawl dumps one file per asset; Spark lists,
      // batches small files by maxPartitionBytes, and reads (path, length,
      // content) without a custom reader). Files are staged from executors
      // (one per doc, UTF-8 payload) and the scan proves content fidelity
      // by length + sha2 against the source table.
      // The foreachPartition+Files.write staging loop below is TEST
      // SCAFFOLDING ONLY — it manufactures the blob directory the operator
      // then reads. In production the assets land from the crawler; never
      // copy this one-file-per-row write as a Spark output path (it is the
      // small-files antipattern q133's compaction exists to fix).
      import s.implicits._
      val docs = T(s, dir, "documents")
      val safe = dir.replaceAll("[^A-Za-z0-9._-]", "_")
      val tmp = s"$TMP/q122_bin/$safe"
      // stage ONCE per (dir) per JVM: the operator under test is the
      // binaryFile SCAN; re-staging 5k small files per invocation made the
      // key's bench time mostly dirty-page writeback noise (round-15
      // adjudication of the r14 "q122 regression": isolated probes of
      // identical code ranged 1.3-2.8 s)
      graft.storage.Materialize.once(graft.storage.Materialize.key(tmp, docs)) {
        val root = java.nio.file.Paths.get(tmp)
        if (java.nio.file.Files.exists(root)) {
          val it = java.nio.file.Files.walk(root).sorted(java.util.Comparator.reverseOrder())
          try it.forEach(p => java.nio.file.Files.delete(p)) finally it.close()
        }
        java.nio.file.Files.createDirectories(root)
        // a NULL text has no byte payload to stage — skipped on BOTH sides
        // (the oracle filters identically), instead of an executor NPE
        docs.filter(col("text").isNotNull)
          .select(col("doc_id"), col("text"))
          .as[(Long, String)]
          .foreachPartition { (it: Iterator[(Long, String)]) =>
            it.foreach { case (id, text) =>
              java.nio.file.Files.write(
                java.nio.file.Paths.get(f"$tmp%s/$id%09d.bin"),
                text.getBytes(java.nio.charset.StandardCharsets.UTF_8))
            }
          }
      }
      s.read.format("binaryFile").load(tmp)
        .select(
          regexp_extract(col("path"), "([0-9]+)\\.bin$", 1).cast("long").as("doc_id"),
          col("length").as("n_bytes"),
          sha2(col("content"), 256).as("sha"))
        .orderBy("doc_id")
    }),
    "q123_cdc_diff" -> ((s, dir) => {
      // snapshot-diff CDC: the upstream republishes full snapshots; the diff
      // emits the delta stream (insert/update/delete + old/new values).
      // Synthetic drift off one deterministic base: keys ≡3 (mod 10) are
      // missing from the old snapshot (inserts), keys ≡0 (mod 10) from the
      // new one (deletes), balances shift for keys ≡0 (mod 7) and segments
      // churn for keys ≡0 (mod 13) (updates).
      val base = T(s, dir, "customer")
        .select(col("c_custkey"), col("c_acctbal"), col("c_mktsegment"))
      val oldSnap = base.filter(col("c_custkey") % 10 =!= 3)
      val newSnap = base.filter(col("c_custkey") % 10 =!= 0)
        .withColumn("c_acctbal",
          when(col("c_custkey") % 7 === 0, col("c_acctbal") + 10).otherwise(col("c_acctbal")))
        .withColumn("c_mktsegment",
          when(col("c_custkey") % 13 === 0, lit("CHURNED")).otherwise(col("c_mktsegment")))
      Warehouse.cdcDiff(oldSnap, newSnap, "c_custkey", Seq("c_acctbal", "c_mktsegment"))
        .orderBy("c_custkey")
    }),
    "q124_zorder_layout" -> ((s, dir) => {
      // Z-order clustered layout: interleave (user bucket, day-of-month)
      // into one Morton key, range-partition + sort the write on it so every
      // file's min/max footer spans a small rectangle of BOTH dimensions —
      // scans filtered on either dimension prune most files (StorageSpec
      // measures the per-file span shrink vs an unclustered layout). The
      // gate proves the interleave bit-exact through a write/read roundtrip.
      val tmp = s"$TMP/q124_z"
      T(s, dir, "events")
        .select(col("event_id"),
          (col("user_id") % 1024).cast("long").as("xb"),
          dayofmonth(col("ts")).cast("long").as("yb"))
        .withColumn("zval", graft.functions.ZOrder(col("xb"), col("yb")))
        .repartitionByRange(8, col("zval"))
        .sortWithinPartitions(col("zval"))
        .write.mode("overwrite").parquet(tmp)
      s.read.parquet(tmp).orderBy("event_id")
    }),
    "q125_triangle_count" -> ((s, dir) =>
      // local clustering over the co-purchase graph: per-part triangle
      // participation via degree-oriented wedge closing (Graph.scala — the
      // O(m^1.5) formulation; no hub ever owns Σdeg² work)
      Graph.triangleCounts(
        copurchaseEdges(s, dir),
        degrees = Some(copurchaseDegrees(s, dir)))
        .select(col("node").as("p_partkey"), col("triangles"))
        .orderBy(col("triangles").desc, col("p_partkey"))
        .limit(20)),
    "q126_grouping_sets" -> ((s, dir) =>
      // one-pass multi-granularity OLAP: CUBE over (status, priority) with
      // grouping_id disambiguating subtotal levels from genuine NULL keys;
      // revenue in scaled-long cents (float sums are accumulation-order-
      // dependent and could never hash-match)
      T(s, dir, "orders")
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(grouping_id().cast("long").as("gid"),
          count(lit(1)).as("cnt"),
          sum(ops.Num.roundz(col("o_totalprice") * 100).cast("long")).as("revenue_cents"))
        .orderBy(col("gid"), col("o_orderstatus").asc_nulls_first,
          col("o_orderpriority").asc_nulls_first)))

  val oracleSql: Seq[(String, String)] = Seq(
    "q60_vader" -> q60Sql,
    "q61_asof_join" ->
      // one struct carried by ONE last_value(IGNORE NULLS): mirrors the Spark
      // asOfJoin's atomic payload carry, so a view row with a NULL view_value
      // can never have its fields stitched from two different view rows
      """WITH ev AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, event_type, value FROM events),
        |u AS (
        |  SELECT user_id, ts AS uts, 0 AS side, event_id AS view_event_id,
        |         {'vid': event_id, 'vval': value} AS payload,
        |         CAST(NULL AS BIGINT) AS event_id, CAST(NULL AS TIMESTAMP) AS pts
        |    FROM ev WHERE event_type = 'view'
        |  UNION ALL
        |  SELECT user_id, ts, 1, NULL, NULL, event_id, ts FROM ev WHERE event_type = 'purchase'),
        |c AS (SELECT *,
        |  last_value(payload IGNORE NULLS) OVER win AS a
        |  FROM u WINDOW win AS (PARTITION BY user_id ORDER BY uts, side, view_event_id
        |                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT event_id, user_id, pts AS ts, a.vid AS view_event_id, a.vval AS view_value
        |FROM c WHERE side = 1 ORDER BY event_id""".stripMargin,
    "q142_asof_forward" ->
      // q61's carry, mirrored: left orders BEFORE right at equal ts (side
      // 1 vs 2) and first_value faces the following frame
      """WITH ev AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, event_type, value FROM events),
        |u AS (
        |  SELECT user_id, ts AS uts, 2 AS side, event_id AS view_event_id,
        |         {'vid': event_id, 'vval': value} AS payload,
        |         CAST(NULL AS BIGINT) AS event_id, CAST(NULL AS TIMESTAMP) AS pts
        |    FROM ev WHERE event_type = 'view'
        |  UNION ALL
        |  SELECT user_id, ts, 1, NULL, NULL, event_id, ts FROM ev WHERE event_type = 'purchase'),
        |c AS (SELECT *,
        |  first_value(payload IGNORE NULLS) OVER win AS a
        |  FROM u WINDOW win AS (PARTITION BY user_id ORDER BY uts, side, view_event_id
        |                        ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
        |SELECT event_id, user_id, pts AS ts, a.vid AS view_event_id, a.vval AS view_value
        |FROM c WHERE side = 1 ORDER BY event_id""".stripMargin,
    "q62_range_join" ->
      """WITH ev AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, event_type FROM events),
        |s AS (SELECT event_id, ts FROM ev WHERE event_type = 'signup'),
        |c AS (SELECT ts AS cts FROM ev WHERE event_type = 'click')
        |SELECT s.event_id, count(*) AS clicks_nearby
        |FROM s JOIN c ON cts BETWEEN s.ts - INTERVAL 30 MINUTE AND s.ts + INTERVAL 30 MINUTE
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q63_orc_roundtrip" -> "SELECT * FROM nation ORDER BY n_nationkey",
    "q117_rare_tokens" ->
      // same folded threshold: cf·10⁶ < n·ppm ⇔ cf ≤ (n·ppm − 1) // 10⁶
      """WITH tok AS (SELECT doc_id, t.term FROM documents,
        |  LATERAL (SELECT unnest(regexp_split_to_array(lower(text), '\s+')) AS term) t
        |  WHERE length(t.term) > 0),
        |f AS (SELECT term, count(*) AS cf FROM tok GROUP BY 1),
        |n AS (SELECT CAST(coalesce(sum(cf), 0) AS BIGINT) AS n FROM f),
        |s AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
        |    CAST(sum(CASE WHEN cf <= (n.n * 1000 - 1) // 1000000 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS rare_tokens
        |  FROM tok JOIN f USING (term) CROSS JOIN n GROUP BY doc_id)
        |SELECT d.doc_id, coalesce(n_tokens, 0) AS n_tokens,
        |  coalesce(rare_tokens, 0) AS rare_tokens,
        |  CAST(CASE WHEN coalesce(n_tokens, 0) > 0
        |    THEN (10000 * rare_tokens) // n_tokens ELSE 0 END AS BIGINT) AS rare_bp
        |FROM documents d LEFT JOIN s USING (doc_id) ORDER BY d.doc_id""".stripMargin,
    "q118_schema_evolution" ->
      """SELECT n_nationkey, n_name, CAST(NULL AS BIGINT) AS n_regionkey,
        |  CAST(1 AS INTEGER) AS batch FROM nation
        |UNION ALL
        |SELECT n_nationkey, n_name, n_regionkey, CAST(2 AS INTEGER) FROM nation
        |ORDER BY batch, n_nationkey""".stripMargin,
    "q119_bloom_prune" ->
      """SELECT * FROM orders WHERE o_custkey IN
        |  (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
        |ORDER BY o_orderkey""".stripMargin,
    "q120_copurchase_rank" ->
      // 3 unrolled damped-PageRank steps in the same scaled-long arithmetic
      """WITH e AS (SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
        |  FROM lineitem a JOIN lineitem b
        |  ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey),
        |d AS (SELECT src, count(*) AS deg FROM e GROUP BY 1),
        |r0 AS (SELECT src AS node, CAST(1000000 AS BIGINT) AS r FROM d),
        |r1 AS (SELECT e.dst AS node, CAST(150000 + (85 * sum(r0.r // d.deg)) // 100 AS BIGINT) AS r
        |  FROM e JOIN d USING (src) JOIN r0 ON r0.node = e.src GROUP BY e.dst),
        |r2 AS (SELECT e.dst AS node, CAST(150000 + (85 * sum(r1.r // d.deg)) // 100 AS BIGINT) AS r
        |  FROM e JOIN d USING (src) JOIN r1 ON r1.node = e.src GROUP BY e.dst),
        |r3 AS (SELECT e.dst AS node, CAST(150000 + (85 * sum(r2.r // d.deg)) // 100 AS BIGINT) AS r
        |  FROM e JOIN d USING (src) JOIN r2 ON r2.node = e.src GROUP BY e.dst)
        |SELECT node AS p_partkey, r AS rank_scaled FROM r3 ORDER BY 1""".stripMargin,
    "q121_line_dedup" ->
      // same 3-token segmentation, frequency on the line text itself (the
      // engine counts on xxhash64(line) — identical modulo 64-bit collisions)
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
        |chunks AS (
        |  SELECT doc_id,
        |    unnest(list_transform(range(0, CAST(ceil(len(tk) / 3.0) AS BIGINT)),
        |      i -> array_to_string(tk[i * 3 + 1 : i * 3 + 3], ' '))) AS line,
        |    unnest(range(0, CAST(ceil(len(tk) / 3.0) AS BIGINT))) AS pos
        |  FROM toks),
        |freq AS (SELECT line, count(*) AS cf FROM chunks GROUP BY line)
        |SELECT c.doc_id,
        |  coalesce(string_agg(c.line, ' ' ORDER BY c.pos) FILTER (f.cf <= 2), '') AS clean_text,
        |  CAST(count(*) FILTER (f.cf <= 2) AS BIGINT) AS kept_lines,
        |  CAST(count(*) FILTER (f.cf > 2) AS BIGINT) AS dropped_lines
        |FROM chunks c JOIN freq f USING (line)
        |GROUP BY c.doc_id ORDER BY c.doc_id""".stripMargin,
    "q122_binary_ingest" ->
      """SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |  sha256(text) AS sha
        |FROM documents WHERE text IS NOT NULL ORDER BY doc_id""".stripMargin,
    "q123_cdc_diff" ->
      """WITH base AS (SELECT c_custkey, c_acctbal, c_mktsegment FROM customer),
        |o AS (SELECT * FROM base WHERE c_custkey % 10 <> 3),
        |n AS (SELECT c_custkey,
        |    CASE WHEN c_custkey % 7 = 0 THEN c_acctbal + 10 ELSE c_acctbal END AS c_acctbal,
        |    CASE WHEN c_custkey % 13 = 0 THEN 'CHURNED' ELSE c_mktsegment END AS c_mktsegment
        |  FROM base WHERE c_custkey % 10 <> 0)
        |SELECT coalesce(o.c_custkey, n.c_custkey) AS c_custkey,
        |  CASE WHEN o.c_custkey IS NULL THEN 'insert'
        |       WHEN n.c_custkey IS NULL THEN 'delete' ELSE 'update' END AS change_type,
        |  o.c_acctbal AS old_c_acctbal, n.c_acctbal AS new_c_acctbal,
        |  o.c_mktsegment AS old_c_mktsegment, n.c_mktsegment AS new_c_mktsegment
        |FROM o FULL OUTER JOIN n ON o.c_custkey = n.c_custkey
        |WHERE o.c_custkey IS NULL OR n.c_custkey IS NULL
        |   OR o.c_acctbal IS DISTINCT FROM n.c_acctbal
        |   OR o.c_mktsegment IS DISTINCT FROM n.c_mktsegment
        |ORDER BY c_custkey""".stripMargin,
    "q124_zorder_layout" ->
      // bit-by-bit Morton interleave, generated as plain bit arithmetic —
      // the engine's magic-number spread (ZOrder.scala) must agree on every
      // one of the 32 bit placements
      s"""WITH b AS (SELECT event_id, CAST(user_id % 1024 AS BIGINT) AS xb,
         |    CAST(day(ts) AS BIGINT) AS yb FROM events)
         |SELECT event_id, xb, yb, CAST(${zorderSql("xb", "yb")} AS BIGINT) AS zval
         |FROM b ORDER BY event_id""".stripMargin,
    "q125_triangle_count" ->
      // plain u<v<w three-way join enumeration (no orientation needed at
      // oracle scale), each triangle credited to all three vertices
      """WITH e AS (SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
        |  FROM lineitem a JOIN lineitem b
        |  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
        |t AS (SELECT e1.u AS a, e1.v AS b, e2.v AS c
        |  FROM e e1 JOIN e e2 ON e1.v = e2.u
        |  JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v),
        |n AS (SELECT unnest([a, b, c]) AS p_partkey FROM t)
        |SELECT p_partkey, CAST(count(*) AS BIGINT) AS triangles
        |FROM n GROUP BY 1 ORDER BY triangles DESC, p_partkey LIMIT 20""".stripMargin,
    "q126_grouping_sets" ->
      """SELECT o_orderstatus, o_orderpriority,
        |  CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
        |  count(*) AS cnt,
        |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS revenue_cents
        |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY gid, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,
    // q127_fuzzy_join / q394_grid_radius_join verify against their twins'
    // oracles (SparkEntry.retiredToTwins, round 17)
    "q116_pq_encode" ->
      // same L2 expansion x·x − 2·x·c + c·c over list_dot_product, same
      // centroid-id tie-break — code assignment must agree per subvector
      """WITH vecs AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vv FROM embeddings),
        |subs AS (SELECT vec_id, CAST(s.i AS BIGINT) AS sub,
        |    vv[CAST(s.i * 16 + 1 AS INT) : CAST(s.i * 16 + 16 AS INT)] AS xs
        |  FROM vecs, LATERAL (SELECT unnest(range(0, 4)) AS i) s),
        |cb AS (SELECT vec_id AS code, sub, xs AS cs FROM subs WHERE vec_id < 8),
        |sc AS (SELECT x.vec_id, x.sub, c.code,
        |  row_number() OVER (PARTITION BY x.vec_id, x.sub ORDER BY
        |    list_dot_product(x.xs, x.xs) - 2 * list_dot_product(x.xs, c.cs)
        |      + list_dot_product(c.cs, c.cs), c.code) AS rn
        |  FROM subs x JOIN cb c USING (sub))
        |SELECT vec_id,
        |  max(CASE WHEN sub = 0 THEN code END) AS c0,
        |  max(CASE WHEN sub = 1 THEN code END) AS c1,
        |  max(CASE WHEN sub = 2 THEN code END) AS c2,
        |  max(CASE WHEN sub = 3 THEN code END) AS c3
        |FROM sc WHERE rn = 1 GROUP BY vec_id ORDER BY vec_id""".stripMargin,
    "q41_keyed_fanout" ->
      """SELECT n_name, count(*) AS cnt,
        |CAST((sum(CAST(round(c_acctbal * 100, 0) AS BIGINT)) * 2 + count(*)) // (2 * count(*)) AS BIGINT) / 100.0 AS avg_bal
        |FROM nation JOIN customer ON c_nationkey = n_nationkey GROUP BY 1 ORDER BY 1""".stripMargin,
    "q42_session_window" ->
      """SELECT date_trunc('day', CAST(ts AS TIMESTAMP)) AS bucket_start, count(*) AS cnt
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q43_exact_dedup" ->
      """SELECT min(doc_id) AS keeper_id, count(*) AS dupes FROM documents
        |GROUP BY text ORDER BY keeper_id""".stripMargin,
    "q45_cosine_topk" ->
      """WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id < 8),
        |c AS (SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS cv FROM embeddings),
        |s AS (SELECT query_id, neighbor_id,
        |  list_dot_product(qv, cv) / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv))) AS cosine
        |  FROM c CROSS JOIN q WHERE neighbor_id <> query_id),
        |r AS (SELECT query_id, neighbor_id, cosine,
        |  CAST(row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS BIGINT) AS rn FROM s)
        |SELECT query_id, neighbor_id, (round(cosine, 4) + 0.0) AS cosine, rn FROM r WHERE rn <= 5
        |ORDER BY query_id, rn""".stripMargin,
    "q46_approx_distinct" ->
      "SELECT event_type, count(DISTINCT user_id) AS users FROM events GROUP BY 1 ORDER BY 1",
    "q47_text_stats" ->
      """SELECT lang, count(*) AS docs,
        |CAST(sum(len(regexp_extract_all(text, '\S+'))) AS BIGINT) AS tokens,
        |(round(avg(length(text)), 2) + 0.0) AS avg_chars, CAST(max(length(text)) AS BIGINT) AS max_chars
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,
    "q49_ngram_jaccard" ->
      """WITH ws AS (SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS w FROM documents WHERE doc_id < 100),
        |sha AS (SELECT DISTINCT doc_id, w[CAST(i AS BIGINT)] || ' ' || w[CAST(i AS BIGINT) + 1] AS shingle
        |  FROM ws, LATERAL (SELECT unnest(range(1, len(w))) AS i) t),
        |rare AS (SELECT shingle FROM sha GROUP BY shingle HAVING count(*) <= 100),
        |sh AS (SELECT sha.doc_id, sha.shingle FROM sha JOIN rare USING (shingle)),
        |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
        |shared AS (SELECT x.doc_id AS id_a, y.doc_id AS id_b, count(*) AS shared
        |  FROM sh x JOIN sh y USING (shingle) WHERE x.doc_id < y.doc_id GROUP BY 1, 2)
        |SELECT id_a, id_b, (round(CAST(shared AS DOUBLE) / (na.n + nb.n - shared), 4) + 0.0) AS jaccard
        |FROM shared JOIN sizes na ON na.doc_id = id_a JOIN sizes nb ON nb.doc_id = id_b
        |WHERE (round(CAST(shared AS DOUBLE) / (na.n + nb.n - shared), 4) + 0.0) >= 0.1
        |ORDER BY id_a, id_b""".stripMargin,
    "q50_langid" ->
      s"SELECT doc_id, $langCase AS lang_pred FROM documents ORDER BY doc_id",
    "q51_quality_score" ->
      """WITH f AS (SELECT doc_id,
        |CAST(length(text) AS DOUBLE) AS len,
        |CAST(len(regexp_extract_all(text, '\S+')) AS DOUBLE) AS toks,
        |CAST(len(regexp_extract_all(text, '[A-Za-z]')) AS DOUBLE) AS alpha,
        |CAST(len(regexp_extract_all(lower(text), '\b(the|and|of|is|a)\b')) AS DOUBLE) AS stop
        |FROM documents)
        |SELECT doc_id, (round(
        |(CASE WHEN len >= 100 AND len <= 10000 THEN CAST(1.0 AS DOUBLE) WHEN len >= 20 THEN CAST(0.5 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END) * CAST(0.4 AS DOUBLE)
        |+ (CASE WHEN len > 0 THEN alpha / len ELSE CAST(0.0 AS DOUBLE) END) * CAST(0.3 AS DOUBLE)
        |+ (CASE WHEN toks > 0 THEN least(stop / toks * CAST(5.0 AS DOUBLE), CAST(1.0 AS DOUBLE)) ELSE CAST(0.0 AS DOUBLE) END) * CAST(0.3 AS DOUBLE),
        |4) + 0.0) AS quality FROM f ORDER BY doc_id""".stripMargin,
    "q52_token_count" ->
      """SELECT lang,
        |CAST(sum(len(regexp_extract_all(text, '\S+'))) AS BIGINT) AS ws_tokens,
        |CAST(sum(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))) AS BIGINT) AS bpe_tokens
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,
    "q54_embed_neardup" -> q54Sql,
    "q55_ann_lsh" ->
      s"""WITH b AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |bb AS (SELECT vec_id, v,
         |  (${lshBandSql(0)}) AS buck0, (${lshBandSql(1)}) AS buck1,
         |  (${lshBandSql(2)}) AS buck2, (${lshBandSql(3)}) AS buck3 FROM b),
         |banded AS (SELECT vec_id, v, t.band,
         |  CASE t.band WHEN 0 THEN buck0 WHEN 1 THEN buck1 WHEN 2 THEN buck2 ELSE buck3 END AS bucket
         |  FROM bb, (VALUES (0), (1), (2), (3)) AS t(band)),
         |cand AS (SELECT DISTINCT x.vec_id AS id_a, y.vec_id AS id_b, x.v AS xv, y.v AS yv
         |  FROM banded x JOIN banded y ON x.band = y.band AND x.bucket = y.bucket AND x.vec_id < y.vec_id),
         |p AS (SELECT id_a, id_b,
         |  list_dot_product(xv, yv) / (sqrt(list_dot_product(xv, xv)) * sqrt(list_dot_product(yv, yv))) AS cosine
         |  FROM cand)
         |SELECT id_a, id_b, (round(cosine, 4) + 0.0) AS cosine FROM p WHERE cosine >= 0.35
         |ORDER BY id_a, id_b""".stripMargin,
    "q56_multimodal" ->
      """SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q57_sessionize" -> sessionizeSql,
    "q58_ann_ivf" ->
      """WITH vecs AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vv FROM embeddings),
        |cent AS (SELECT vec_id AS cell, vv AS cv FROM vecs WHERE vec_id < 16),
        |scored AS (SELECT x.vec_id, x.vv, c.cell,
        |  row_number() OVER (PARTITION BY x.vec_id ORDER BY
        |    list_dot_product(x.vv, c.cv) / (sqrt(list_dot_product(x.vv, x.vv)) * sqrt(list_dot_product(c.cv, c.cv))) DESC,
        |    c.cell) AS crn
        |  FROM vecs x CROSS JOIN cent c),
        |asg AS (SELECT vec_id, vv, cell FROM scored WHERE crn = 1),
        |q AS (SELECT vec_id AS query_id, vv AS qv, cell FROM asg WHERE vec_id < 8),
        |s AS (SELECT q.query_id, a.vec_id AS neighbor_id,
        |  list_dot_product(q.qv, a.vv) / (sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(a.vv, a.vv))) AS cosine
        |  FROM q JOIN asg a ON a.cell = q.cell AND a.vec_id <> q.query_id),
        |r AS (SELECT query_id, neighbor_id, cosine,
        |  CAST(row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS BIGINT) AS rn FROM s)
        |SELECT query_id, neighbor_id, (round(cosine, 4) + 0.0) AS cosine, rn FROM r WHERE rn <= 5
        |ORDER BY query_id, rn""".stripMargin,
    "q59_stratified_sample" ->
      """SELECT doc_id, lang FROM (
        |  SELECT doc_id, lang,
        |    row_number() OVER (PARTITION BY lang
        |      ORDER BY ((doc_id % 1000003) * 2654435761) % 1000003, doc_id) AS rn
        |  FROM documents)
        |WHERE rn <= 20 ORDER BY lang, doc_id""".stripMargin,
    // fold over code points replicates the byte fold exactly for ASCII corpora
    // (the testdata is pure ASCII; unicode behavior is unit-tested Spark-side)
    "q53_fingerprint" ->
      """SELECT doc_id, list_reduce(
        |  list_transform(range(1, length(text) + 1),
        |    i -> CAST(ord(substr(text, CAST(i AS INT), 1)) AS BIGINT)),
        |  (a, b) -> (a * 31 + b) % 1000000007) AS fp
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q44_minhash_neardup" -> q44Sql,
    "q384_worst_slices" ->
      s"""SELECT source, lang, count(*) AS n,
         |  CAST(sum(CASE WHEN $langCase = lang THEN 1 ELSE 0 END) AS BIGINT) AS correct,
         |  CAST(sum(CASE WHEN $langCase = lang THEN 1 ELSE 0 END) * 10000 // count(*) AS BIGINT) AS acc_bp
         |FROM documents GROUP BY 1, 2 HAVING count(*) >= 20
         |ORDER BY acc_bp, n DESC, source, lang LIMIT 10""".stripMargin,
    "q385_variant_shred" ->
      // the engine parses once into VARIANT and walks the binary field;
      // the oracle re-parses the JSON text — same typed values
      """SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
        |  count(*) AS cnt
        |FROM events WHERE props IS NOT NULL GROUP BY 1 ORDER BY 1""".stripMargin,
    "q386_observed_metrics" ->
      // the oracle computes directly what observe() must have reported
      """SELECT count(*) AS rows_in,
        |  CAST(sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_values,
        |  CAST(sum(COALESCE(CAST(round(value * 100) AS BIGINT), 0)) AS BIGINT) AS cents_in,
        |  CAST(count(DISTINCT event_type) AS BIGINT) AS rows_out
        |FROM events""".stripMargin,
    "q387_pipe_sql" ->
      // the nested-SELECT equivalent of the pipe program
      """SELECT event_type, count(*) AS cnt,
        |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
        |FROM events WHERE value IS NOT NULL AND value > 50
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q388_collated_group" ->
      // collation-aware grouping ≡ the lower()-projection workaround
      """WITH d AS (SELECT CASE WHEN doc_id % 2 = 1 THEN upper(source)
        |    ELSE source END AS s FROM documents)
        |SELECT min(s) AS variant_min, count(*) AS cnt FROM d
        |GROUP BY lower(s) ORDER BY variant_min""".stripMargin,
    "q389_markov_attribution" -> q389Sql,
    "q390_restatement_ledger" ->
      // identical deterministic arrival = event time + (id % 48) hours
      """WITH e AS (SELECT strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS day,
        |    CAST(ts AS TIMESTAMP) + (event_id % 48) * INTERVAL 1 HOUR AS arrival,
        |    CAST(CAST(ts AS DATE) + 1 AS TIMESTAMP) AS day_end
        |  FROM events)
        |SELECT day, count(*) AS n_final,
        |  CAST(sum(CASE WHEN arrival < day_end THEN 1 ELSE 0 END) AS BIGINT) AS n_first,
        |  CAST((count(*) - sum(CASE WHEN arrival < day_end THEN 1 ELSE 0 END)) * 10000
        |    // count(*) AS BIGINT) AS restated_bp
        |FROM e GROUP BY 1 ORDER BY 1""".stripMargin,
    "q391_aqe_skew_join" ->
      // the plain join — the runtime skew split must change nothing
      """WITH f AS (SELECT event_id,
        |    CASE WHEN event_id % 10 < 9 THEN 'hot'
        |         ELSE 'cold' || CAST(event_id % 97 AS VARCHAR) END AS k,
        |    (event_id * 48271) % 2147483647 AS pad
        |  FROM events),
        |d AS (SELECT k, count(*) AS dim_n FROM f GROUP BY 1),
        |j AS (SELECT f.k, f.pad, d.dim_n FROM f JOIN d USING (k))
        |SELECT CASE WHEN k = 'hot' THEN 'hot' ELSE 'cold' END AS k_class,
        |  count(*) AS n, CAST(sum(dim_n) AS BIGINT) AS dim_mass,
        |  CAST(sum(pad) AS BIGINT) AS pad_mass
        |FROM j GROUP BY 1 ORDER BY 1""".stripMargin,
    "q392_ols_regression" ->
      // same six exact integer moments, same fixed double chain
      """WITH e AS (SELECT event_type, CAST(hour(CAST(ts AS TIMESTAMP)) AS BIGINT) AS x,
        |    CAST(round(value * 100, 0) AS BIGINT) AS y
        |  FROM events WHERE value IS NOT NULL),
        |m AS (SELECT event_type, count(*) AS n, CAST(sum(x) AS BIGINT) AS sx,
        |    CAST(sum(y) AS BIGINT) AS sy, CAST(sum(x * y) AS BIGINT) AS sxy,
        |    CAST(sum(x * x) AS BIGINT) AS sx2, CAST(sum(y * y) AS BIGINT) AS sy2
        |  FROM e GROUP BY 1)
        |SELECT event_type, n,
        |  (round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |    / (CAST(n AS DOUBLE) * CAST(sx2 AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 4) + 0.0) AS slope,
        |  (round((CAST(sy AS DOUBLE) - (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |    / (CAST(n AS DOUBLE) * CAST(sx2 AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |    * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE), 4) + 0.0) AS intercept,
        |  (round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |    * (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |    / ((CAST(n AS DOUBLE) * CAST(sx2 AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |       * (CAST(n AS DOUBLE) * CAST(sy2 AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 4) + 0.0) AS r2
        |FROM m ORDER BY event_type""".stripMargin,
    "q393_logistic_gd" ->
      // the 3 GD steps unrolled as chained CTEs; `//` and `div` both
      // truncate toward zero, so the integer walk is bit-identical
      """WITH e AS (SELECT CAST(hour(CAST(ts AS TIMESTAMP)) AS BIGINT) - 12 AS x,
        |    CASE WHEN event_type = 'purchase' THEN CAST(1 AS BIGINT) ELSE 0 END AS y FROM events),
        |i0 AS (SELECT CAST(0 AS BIGINT) AS w0, CAST(0 AS BIGINT) AS w1),
        |s1 AS (SELECT max(w0) AS pw0, max(w1) AS pw1, count(*) AS n,
        |    CAST(sum(greatest(least(500000 + (w0 + w1 * x) // 4, 1000000), 0) - y * 1000000) AS BIGINT) AS g0,
        |    CAST(sum((greatest(least(500000 + (w0 + w1 * x) // 4, 1000000), 0) - y * 1000000) * x) AS BIGINT) AS g1
        |  FROM e CROSS JOIN i0),
        |i1 AS (SELECT pw0 - g0 // (2 * n) AS w0, pw1 - g1 // (20 * n) AS w1 FROM s1),
        |s2 AS (SELECT max(w0) AS pw0, max(w1) AS pw1, count(*) AS n,
        |    CAST(sum(greatest(least(500000 + (w0 + w1 * x) // 4, 1000000), 0) - y * 1000000) AS BIGINT) AS g0,
        |    CAST(sum((greatest(least(500000 + (w0 + w1 * x) // 4, 1000000), 0) - y * 1000000) * x) AS BIGINT) AS g1
        |  FROM e CROSS JOIN i1),
        |i2 AS (SELECT pw0 - g0 // (2 * n) AS w0, pw1 - g1 // (20 * n) AS w1 FROM s2),
        |s3 AS (SELECT max(w0) AS pw0, max(w1) AS pw1, count(*) AS n,
        |    CAST(sum(greatest(least(500000 + (w0 + w1 * x) // 4, 1000000), 0) - y * 1000000) AS BIGINT) AS g0,
        |    CAST(sum((greatest(least(500000 + (w0 + w1 * x) // 4, 1000000), 0) - y * 1000000) * x) AS BIGINT) AS g1
        |  FROM e CROSS JOIN i2),
        |i3 AS (SELECT pw0 - g0 // (2 * n) AS w0, pw1 - g1 // (20 * n) AS w1 FROM s3),
        |ev AS (SELECT max(w0) AS w0, max(w1) AS w1, count(*) AS n,
        |    CAST(sum(CASE WHEN (greatest(least(500000 + (w0 + w1 * x) // 4, 1000000), 0) > 500000) = (y = 1)
        |      THEN 1 ELSE 0 END) AS BIGINT) AS correct
        |  FROM e CROSS JOIN i3)
        |SELECT w0, w1, n, correct * 10000 // n AS correct_bp FROM ev""".stripMargin,
    "q395_winnowing" ->
      // same trigram Karp-Rabin ring (the q353-proven ord/byte parity),
      // same packed rightmost-min key, same 4-row window
      """WITH raw AS (SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '\s+'),
        |    t -> length(t) > 0) AS arr FROM documents),
        |px AS (SELECT doc_id, unnest(list_transform(range(1, len(arr) + 1),
        |    i -> {'pos': i - 1, 'tok': arr[i]})) AS g FROM raw),
        |th AS (SELECT doc_id, CAST(g.pos AS BIGINT) AS pos,
        |    list_reduce(list_transform(range(1, length(g.tok) + 1),
        |      i -> CAST(ord(substr(g.tok, CAST(i AS INT), 1)) AS BIGINT)),
        |      (a, b) -> (a * 31 + b) % 1000000007) AS h
        |  FROM px),
        |tri AS (SELECT doc_id, pos,
        |    ((h * 31 + lead(h, 1) OVER w) % 1000000007 * 31 + lead(h, 2) OVER w) % 1000000007 AS gh,
        |    lead(h, 2) OVER w IS NOT NULL AS full3
        |  FROM th WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
        |k AS (SELECT doc_id, pos, gh * 1048576 + (1048575 - pos) AS k FROM tri WHERE full3),
        |wm AS (SELECT doc_id, pos, min(k) OVER (PARTITION BY doc_id ORDER BY pos
        |    ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS wmin FROM k),
        |sel AS (SELECT DISTINCT doc_id, wmin FROM wm WHERE pos >= 3)
        |SELECT doc_id, wmin // 1048576 AS hash, 1048575 - (wmin % 1048576) AS pos
        |FROM sel ORDER BY doc_id, pos""".stripMargin,
    "q396_t_closeness" ->
      // same 4-band grid, same ppm integer divisions, same (m-1) cum sum
      """WITH c AS (SELECT CAST(c_nationkey AS BIGINT) AS nat, c_mktsegment AS seg,
        |    CAST(round(c_acctbal * 100, 0) AS BIGINT) AS cents FROM customer),
        |b AS (SELECT nat, seg, greatest(least((cents + 100000) // 300000, 3), 0) AS band FROM c),
        |g AS (SELECT band, count(*) AS gc FROM b GROUP BY 1),
        |gt AS (SELECT count(*) AS gn FROM b),
        |q AS (SELECT CAST(gb.band AS BIGINT) AS band,
        |    coalesce(g.gc, 0) * 1000000 // gt.gn AS q_ppm
        |  FROM (SELECT unnest([0, 1, 2, 3]) AS band) gb
        |  LEFT JOIN g ON g.band = gb.band, gt),
        |gr AS (SELECT nat, seg, count(*) AS n FROM b GROUP BY 1, 2),
        |grid AS (SELECT nat, seg, n, CAST(unnest([0, 1, 2, 3]) AS BIGINT) AS band FROM gr),
        |cnt AS (SELECT nat, seg, band, count(*) AS nb FROM b GROUP BY 1, 2, 3),
        |p AS (SELECT grid.nat, grid.seg, grid.band, grid.n,
        |    coalesce(cnt.nb, 0) * 1000000 // grid.n AS p_ppm, q.q_ppm
        |  FROM grid LEFT JOIN cnt USING (nat, seg, band) JOIN q USING (band)),
        |cum AS (SELECT nat, seg, n, band,
        |    sum(p_ppm) OVER (PARTITION BY nat, seg ORDER BY band) AS cp,
        |    sum(q_ppm) OVER (PARTITION BY nat, seg ORDER BY band) AS cq
        |  FROM p)
        |SELECT nat, seg, CAST(max(n) AS BIGINT) AS n,
        |  CAST(sum(abs(cp - cq)) AS BIGINT) // 3 AS emd_ppm,
        |  (CAST(sum(abs(cp - cq)) AS BIGINT) // 3) <= 200000 AS meets_t20
        |FROM cum WHERE band <= 2 GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q397_ips_eval" ->
      // same hash-planted actions/propensities, same exact micro weights
      """WITH e AS (SELECT CAST(user_id % 3 AS BIGINT) AS pi_arm,
        |    CASE WHEN event_id % 10 < 5 THEN 0 WHEN event_id % 10 < 8 THEN 1 ELSE 2 END AS a,
        |    CASE WHEN event_type = 'purchase' THEN CAST(1 AS BIGINT) ELSE 0 END AS r
        |  FROM events WHERE user_id IS NOT NULL),
        |w AS (SELECT pi_arm, r,
        |    CASE WHEN a = 0 THEN 2000000 WHEN a = 1 THEN 3333333 ELSE 5000000 END AS w_micro,
        |    CASE WHEN pi_arm = a THEN CAST(1 AS BIGINT) ELSE 0 END AS m FROM e)
        |SELECT pi_arm, count(*) AS n, CAST(sum(m) AS BIGINT) AS n_matched,
        |  CAST(sum(r * m * w_micro) AS BIGINT) // count(*) AS ips_micro,
        |  CAST(sum(r * m * w_micro) AS BIGINT) * 10000
        |    // greatest(CAST(sum(m * w_micro) AS BIGINT), 1) AS snips_bp,
        |  CAST(sum(r) AS BIGINT) * 10000 // count(*) AS logged_reward_bp
        |FROM w GROUP BY 1 ORDER BY 1""".stripMargin,
    "q398_bitmap_index" ->
      // same 32-bit word packing, same bit_or / bit_count algebra
      """WITH d AS (SELECT DISTINCT event_type AS seg, user_id FROM events
        |  WHERE user_id IS NOT NULL),
        |bm AS (SELECT seg, user_id // 32 AS w,
        |    bit_or(CAST(1 AS BIGINT) << CAST(user_id % 32 AS INT)) AS bits
        |  FROM d GROUP BY 1, 2),
        |card AS (SELECT seg, CAST(sum(bit_count(bits)) AS BIGINT) AS card FROM bm GROUP BY 1),
        |inter AS (SELECT a.seg AS seg_a, b.seg AS seg_b,
        |    CAST(sum(bit_count(a.bits & b.bits)) AS BIGINT) AS inter
        |  FROM bm a JOIN bm b ON a.w = b.w AND a.seg < b.seg GROUP BY 1, 2),
        |pairs AS (SELECT ca.seg AS seg_a, cb.seg AS seg_b, ca.card AS card_a, cb.card AS card_b
        |  FROM card ca CROSS JOIN card cb WHERE ca.seg < cb.seg)
        |SELECT p.seg_a, p.seg_b, p.card_a, p.card_b,
        |  coalesce(i.inter, 0) AS inter,
        |  p.card_a + p.card_b - coalesce(i.inter, 0) AS uni,
        |  coalesce(i.inter, 0) * 10000 // (p.card_a + p.card_b - coalesce(i.inter, 0)) AS jaccard_bp
        |FROM pairs p LEFT JOIN inter i USING (seg_a, seg_b) ORDER BY 1, 2""".stripMargin,
    "q399_powerlaw_mle" ->
      // same floor-micro log quantization, same single closing division
      """WITH d AS (SELECT source,
        |    CAST(floor(ln(CAST(n_chars AS DOUBLE) / 200.0) * 1000000) AS BIGINT) AS lnx
        |  FROM documents WHERE n_chars >= 200)
        |SELECT source, count(*) AS n_tail, CAST(sum(lnx) AS BIGINT) AS s_micro,
        |  (round(1.0 + CAST(count(*) AS DOUBLE) * 1000000.0
        |    / CAST(nullif(CAST(sum(lnx) AS BIGINT), 0) AS DOUBLE), 4) + 0.0) AS alpha
        |FROM d GROUP BY 1 ORDER BY 1""".stripMargin,
    "q400_brier_decomposition" ->
      // same 11 bins, same exact Brier numerator, same double rel chain
      """WITH e AS (SELECT (user_id * 31 % 101) * 100 AS f_bp,
        |    CASE WHEN event_type = 'purchase' THEN CAST(1 AS BIGINT) ELSE 0 END AS y
        |  FROM events WHERE user_id IS NOT NULL)
        |SELECT f_bp // 1000 AS bin, count(*) AS n, CAST(sum(y) AS BIGINT) AS o,
        |  CAST(sum(f_bp) AS BIGINT) AS sum_f_bp,
        |  CAST(sum((f_bp - y * 10000) * (f_bp - y * 10000)) AS BIGINT) AS brier_num,
        |  (round((CAST(CAST(sum(f_bp) AS BIGINT) AS DOUBLE) - 10000.0 * CAST(sum(y) AS BIGINT))
        |    * (CAST(CAST(sum(f_bp) AS BIGINT) AS DOUBLE) - 10000.0 * CAST(sum(y) AS BIGINT))
        |    / (100000000.0 * count(*)), 4) + 0.0) AS rel
        |FROM e GROUP BY 1 ORDER BY 1""".stripMargin,
    "q401_neyman_allocation" ->
      // same exact moments, same floor(N·sd·10³) quantization, same
      // largest-remainder walk over the 5-row strata frame
      """WITH m AS (SELECT event_type, count(*) AS n,
        |    CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS s,
        |    CAST(sum(CAST(round(value * 100, 0) AS BIGINT)
        |      * CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS ss
        |  FROM events GROUP BY 1),
        |w AS (SELECT event_type, n,
        |    CAST(floor(CAST(n AS DOUBLE) * sqrt((CAST(n AS DOUBLE) * CAST(ss AS DOUBLE)
        |      - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
        |      / (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE))) * 1000) AS BIGINT) AS w_scaled
        |  FROM m),
        |t AS (SELECT CAST(sum(w_scaled) AS BIGINT) AS tw FROM w),
        |b AS (SELECT w.event_type, w.n, w.w_scaled,
        |    w.w_scaled * 1000 // t.tw AS alloc_base, (w.w_scaled * 1000) % t.tw AS rem
        |  FROM w, t),
        |u AS (SELECT CAST(sum(alloc_base) AS BIGINT) AS ub FROM b),
        |r AS (SELECT b.*, u.ub, row_number() OVER (ORDER BY rem DESC, event_type) AS rk FROM b, u)
        |SELECT event_type, n, w_scaled,
        |  alloc_base + CASE WHEN rk <= 1000 - ub THEN 1 ELSE 0 END AS alloc
        |FROM r ORDER BY event_type""".stripMargin,
    "q402_paa_symbolize" ->
      // same fixed anchor, same exact micro PAA, same min-max symbols
      """WITH daily AS (SELECT event_type,
        |    CAST(date_diff('day', DATE '2020-01-01', CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS BIGINT) AS d,
        |    count(*) AS cnt
        |  FROM events GROUP BY 1, 2),
        |paa AS (SELECT event_type, d // 4 AS seg, count(*) AS n_days,
        |    CAST(sum(cnt) AS BIGINT) AS sum_cnt FROM daily GROUP BY 1, 2),
        |p2 AS (SELECT *, sum_cnt * 1000000 // n_days AS paa_micro FROM paa),
        |rng AS (SELECT event_type, min(paa_micro) AS lo, max(paa_micro) AS hi FROM p2 GROUP BY 1)
        |SELECT p2.event_type, p2.seg, p2.n_days, p2.sum_cnt, p2.paa_micro,
        |  (p2.paa_micro - rng.lo) * 4 // (rng.hi - rng.lo + 1) AS sym
        |FROM p2 JOIN rng USING (event_type) ORDER BY 1, 2""".stripMargin,
    "q403_poisson_bootstrap" ->
      // same hash-threshold Poisson(1) weights, same exact micro means,
      // same integer moments with one closing sqrt
      """WITH e AS (SELECT event_id, CAST(round(value * 100, 0) AS BIGINT) AS cents FROM events),
        |rep AS (SELECT event_id, cents, CAST(unnest(range(0, 32)) AS BIGINT) AS r FROM e),
        |h AS (SELECT r, cents, ((event_id * 131 + r) * 48271) % 2147483647 % 10000 AS h FROM rep),
        |w AS (SELECT r, cents, CASE WHEN h < 3679 THEN 0 WHEN h < 7358 THEN 1
        |    WHEN h < 9197 THEN 2 WHEN h < 9810 THEN 3 WHEN h < 9963 THEN 4 ELSE 5 END AS w
        |  FROM h),
        |g AS (SELECT r, CAST(sum(w) AS BIGINT) AS sw, CAST(sum(w * cents) AS BIGINT) AS swy
        |  FROM w GROUP BY 1),
        |mm AS (SELECT swy * 100 // greatest(sw, 1) AS m FROM g),
        |agg AS (SELECT count(*) AS n_rep, CAST(sum(m) AS BIGINT) AS sm,
        |    CAST(sum(m * m) AS BIGINT) AS sm2 FROM mm),
        |pe AS (SELECT count(*) AS n_events,
        |    CAST(sum(cents) AS BIGINT) * 100 // count(*) AS point_mean_micros FROM e)
        |SELECT pe.n_events, pe.point_mean_micros, agg.sm // agg.n_rep AS boot_mean_micros,
        |  (round(sqrt((CAST(agg.n_rep AS DOUBLE) * CAST(agg.sm2 AS DOUBLE)
        |    - CAST(agg.sm AS DOUBLE) * CAST(agg.sm AS DOUBLE))
        |    / (CAST(agg.n_rep AS DOUBLE) * CAST(agg.n_rep - 1 AS DOUBLE))), 4) + 0.0) AS boot_se_micros
        |FROM pe, agg""".stripMargin,
    "q404_theta_sketch" ->
      // same MINSTD priorities, same bottom-32 retention, same θ algebra
      """WITH d AS (SELECT DISTINCT event_type AS seg, user_id FROM events
        |  WHERE user_id IS NOT NULL),
        |pr AS (SELECT seg, user_id, (user_id * 48271) % 2147483647 + 1 AS p FROM d),
        |sk AS (SELECT seg, p FROM (SELECT seg, p,
        |    row_number() OVER (PARTITION BY seg ORDER BY p) AS rn FROM pr)
        |  WHERE rn <= 32),
        |th AS (SELECT sk.seg, CASE WHEN count(*) < 32 THEN 2147483647
        |    ELSE max(sk.p) END AS theta, count(*) AS n_ret FROM sk GROUP BY 1),
        |ne AS (SELECT seg, count(*) AS n_exact FROM pr GROUP BY 1),
        |est AS (SELECT th.seg, th.theta,
        |    CASE WHEN th.n_ret < 32 THEN ne.n_exact
        |      ELSE CAST(31 AS BIGINT) * 2147483647 // th.theta END AS est
        |  FROM th JOIN ne USING (seg)),
        |pairs AS (SELECT a.seg AS seg_a, b.seg AS seg_b, a.est AS est_a, b.est AS est_b,
        |    least(a.theta, b.theta) AS th
        |  FROM est a CROSS JOIN est b WHERE a.seg < b.seg),
        |skp AS (SELECT p.seg_a, p.seg_b, p.th, s.p AS pv, count(*) AS c
        |  FROM pairs p JOIN sk s ON (s.seg = p.seg_a OR s.seg = p.seg_b) AND s.p < p.th
        |  GROUP BY 1, 2, 3, 4),
        |cnts AS (SELECT seg_a, seg_b, th, count(*) AS u_cnt,
        |    CAST(sum(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS i_cnt
        |  FROM skp GROUP BY 1, 2, 3),
        |ex AS (SELECT a.seg AS seg_a, b.seg AS seg_b, count(*) AS true_inter
        |  FROM d a JOIN d b ON a.user_id = b.user_id AND a.seg < b.seg GROUP BY 1, 2)
        |SELECT p.seg_a, p.seg_b, p.est_a, p.est_b,
        |  coalesce(c.u_cnt, 0) * 2147483647 // p.th AS est_union,
        |  coalesce(c.i_cnt, 0) * 2147483647 // p.th AS est_inter,
        |  coalesce(ex.true_inter, 0) AS true_inter
        |FROM pairs p LEFT JOIN cnts c USING (seg_a, seg_b)
        |LEFT JOIN ex USING (seg_a, seg_b) ORDER BY 1, 2""".stripMargin,
    "q405_borda_kendall" ->
      // same three top-20 heaps, same Borda fold, same pair concordance
      """WITH r1 AS (SELECT p_partkey, row_number() OVER (ORDER BY p_retailprice DESC, p_partkey) AS r_price
        |  FROM part ORDER BY p_retailprice DESC, p_partkey LIMIT 20),
        |r2 AS (SELECT p_partkey, row_number() OVER (ORDER BY p_size DESC, p_partkey) AS r_size
        |  FROM part ORDER BY p_size DESC, p_partkey LIMIT 20),
        |r3 AS (SELECT p_partkey, row_number() OVER (ORDER BY (p_partkey * 16807) % 2147483647, p_partkey) AS r_hash
        |  FROM part ORDER BY (p_partkey * 16807) % 2147483647, p_partkey LIMIT 20),
        |fused AS (SELECT coalesce(r1.p_partkey, r2.p_partkey, r3.p_partkey) AS k,
        |    r_price, r_size, r_hash,
        |    CAST(coalesce(21 - r_price, 0) + coalesce(21 - r_size, 0)
        |      + coalesce(21 - r_hash, 0) AS BIGINT) AS borda
        |  FROM r1 FULL JOIN r2 ON r1.p_partkey = r2.p_partkey
        |  FULL JOIN r3 ON coalesce(r1.p_partkey, r2.p_partkey) = r3.p_partkey),
        |cons AS (SELECT k, r_price, r_size, r_hash,
        |    row_number() OVER (ORDER BY borda DESC, k) AS consensus FROM fused),
        |tp AS (SELECT 'r_price' AS ranker, x.consensus AS c1, y.consensus AS c2,
        |    CAST(x.r_price AS BIGINT) AS v1, CAST(y.r_price AS BIGINT) AS v2
        |  FROM cons x JOIN cons y ON x.k < y.k
        |  WHERE x.r_price IS NOT NULL AND y.r_price IS NOT NULL
        |  UNION ALL
        |  SELECT 'r_size', x.consensus, y.consensus,
        |    CAST(x.r_size AS BIGINT), CAST(y.r_size AS BIGINT)
        |  FROM cons x JOIN cons y ON x.k < y.k
        |  WHERE x.r_size IS NOT NULL AND y.r_size IS NOT NULL
        |  UNION ALL
        |  SELECT 'r_hash', x.consensus, y.consensus,
        |    CAST(x.r_hash AS BIGINT), CAST(y.r_hash AS BIGINT)
        |  FROM cons x JOIN cons y ON x.k < y.k
        |  WHERE x.r_hash IS NOT NULL AND y.r_hash IS NOT NULL)
        |SELECT ranker, count(*) AS n_pairs,
        |  CAST(sum(CASE WHEN (c1 < c2) = (v1 < v2) THEN 1 ELSE 0 END) AS BIGINT) AS concordant,
        |  count(*) - CAST(sum(CASE WHEN (c1 < c2) = (v1 < v2) THEN 1 ELSE 0 END) AS BIGINT) AS discordant,
        |  (CAST(sum(CASE WHEN (c1 < c2) = (v1 < v2) THEN 1 ELSE 0 END) AS BIGINT)
        |    - (count(*) - CAST(sum(CASE WHEN (c1 < c2) = (v1 < v2) THEN 1 ELSE 0 END) AS BIGINT)))
        |    * 1000 // count(*) AS tau_milli
        |FROM tp GROUP BY 1 ORDER BY 1""".stripMargin,
    "q406_good_turing" ->
      // same tokenization, same N_r table, same exact milli adjustment
      """WITH tok AS (SELECT unnest(list_filter(regexp_split_to_array(lower(text), '\s+'),
        |    t -> length(t) > 0)) AS tok FROM documents),
        |freq AS (SELECT tok, count(*) AS r FROM tok GROUP BY 1),
        |nr AS (SELECT r, count(*) AS n_r FROM freq GROUP BY 1),
        |tot AS (SELECT CAST(sum(r) AS BIGINT) AS n_tokens,
        |    CAST(sum(CASE WHEN r = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1 FROM freq)
        |SELECT nr.r, nr.n_r,
        |  (nr.r + 1) * coalesce(n2.n_r, 0) * 1000 // nr.n_r AS r_star_milli,
        |  tot.n1 * 10000 // tot.n_tokens AS p0_bp
        |FROM nr LEFT JOIN nr n2 ON n2.r = nr.r + 1 CROSS JOIN tot
        |ORDER BY nr.r LIMIT 20""".stripMargin,
    "q407_hash_ring" ->
      // same 72-vnode ring, same packed successor argmin, same audit
      """WITH vn AS (SELECT CAST(unnest(range(0, 72)) AS BIGINT) AS v),
        |ring AS (SELECT v // 8 AS shard, ((v + 1) * 2654435761) % 2147483647 AS pos FROM vn),
        |pk AS (SELECT shard, pos, pos * 100 + shard AS packed FROM ring),
        |keys AS (SELECT DISTINCT user_id FROM events WHERE user_id IS NOT NULL),
        |kh AS (SELECT user_id, (user_id * 2654435761) % 2147483647 AS kh FROM keys),
        |asg AS (SELECT k.user_id,
        |    coalesce(min(CASE WHEN p.shard < 8 AND p.pos >= k.kh THEN p.packed END),
        |      min(CASE WHEN p.shard < 8 THEN p.packed END)) % 100 AS shard8,
        |    coalesce(min(CASE WHEN p.pos >= k.kh THEN p.packed END),
        |      min(p.packed)) % 100 AS shard9
        |  FROM kh k CROSS JOIN pk p GROUP BY 1, k.kh)
        |SELECT shard8, count(*) AS n_keys,
        |  CAST(sum(CASE WHEN shard9 <> shard8 THEN 1 ELSE 0 END) AS BIGINT) AS n_moved,
        |  CAST(sum(CASE WHEN shard9 = 8 THEN 1 ELSE 0 END) AS BIGINT) AS n_to_new,
        |  CAST(sum(CASE WHEN shard9 <> shard8 THEN 1 ELSE 0 END) AS BIGINT) * 10000
        |    // count(*) AS moved_bp
        |FROM asg GROUP BY 1 ORDER BY 1""".stripMargin,
    "q408_contribution_bounding" ->
      // same first-8-per-user clamp, same per-day ledger
      """WITH e AS (SELECT strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS day,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        |  FROM events WHERE user_id IS NOT NULL)
        |SELECT day, count(*) AS n_raw,
        |  CAST(sum(CASE WHEN rn <= 8 THEN 1 ELSE 0 END) AS BIGINT) AS n_bounded,
        |  (count(*) - CAST(sum(CASE WHEN rn <= 8 THEN 1 ELSE 0 END) AS BIGINT)) * 10000
        |    // count(*) AS clamp_loss_bp
        |FROM e GROUP BY 1 ORDER BY 1""".stripMargin,
    "q409_skipgram_pairs" ->
      // same per-doc leads, both directions, same top-30 total order
      """WITH raw AS (SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '\s+'),
        |    t -> length(t) > 0) AS arr FROM documents),
        |px AS (SELECT doc_id, unnest(list_transform(range(1, len(arr) + 1),
        |    i -> {'pos': i - 1, 'tok': arr[i]})) AS g FROM raw),
        |t AS (SELECT doc_id, g.pos AS pos, g.tok AS tok,
        |    lead(g.tok, 1) OVER w AS n1, lead(g.tok, 2) OVER w AS n2
        |  FROM px WINDOW w AS (PARTITION BY doc_id ORDER BY g.pos)),
        |prs AS (SELECT tok AS w1, n1 AS w2, CAST(1 AS BIGINT) AS dist FROM t WHERE n1 IS NOT NULL
        |  UNION ALL SELECT tok, n2, 2 FROM t WHERE n2 IS NOT NULL
        |  UNION ALL SELECT n1, tok, 1 FROM t WHERE n1 IS NOT NULL
        |  UNION ALL SELECT n2, tok, 2 FROM t WHERE n2 IS NOT NULL)
        |SELECT w1, w2, dist, count(*) AS cnt, 1000 // dist AS weight_milli
        |FROM prs GROUP BY 1, 2, 3
        |ORDER BY cnt DESC, w1, w2, dist LIMIT 30""".stripMargin,
    "q410_churn_labels" ->
      // same distinct active days, same strictly-forward 14-day lookahead
      """WITH days AS (SELECT DISTINCT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d
        |  FROM events WHERE user_id IS NOT NULL),
        |lb AS (SELECT user_id, d, lead(d, 1) OVER (PARTITION BY user_id ORDER BY d) AS nxt
        |  FROM days)
        |SELECT strftime(d, '%Y-%m-%d') AS day, count(*) AS n_user_days,
        |  CAST(sum(CASE WHEN nxt IS NULL OR date_diff('day', d, nxt) > 14
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_churned,
        |  CAST(sum(CASE WHEN nxt IS NULL OR date_diff('day', d, nxt) > 14
        |    THEN 1 ELSE 0 END) AS BIGINT) * 10000 // count(*) AS churn_bp
        |FROM lb GROUP BY 1 ORDER BY 1""".stripMargin,
    "q411_haar_wavelet" ->
      // same dense calendar, same 3 pairwise (sum, diff) levels
      """WITH e AS (SELECT event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d FROM events),
        |b AS (SELECT min(d) AS d0, max(d) AS d1 FROM e),
        |cal AS (SELECT CAST(unnest(range(0, date_diff('day', d0, d1) + 1)) AS BIGINT) AS idx FROM b),
        |ty AS (SELECT DISTINCT event_type FROM e),
        |daily AS (SELECT event_type, CAST(date_diff('day', b.d0, e.d) AS BIGINT) AS idx,
        |    count(*) AS c FROM e, b GROUP BY 1, 2),
        |dense AS (SELECT ty.event_type, cal.idx, CAST(coalesce(daily.c, 0) AS BIGINT) AS c
        |  FROM ty CROSS JOIN cal LEFT JOIN daily
        |  ON daily.event_type = ty.event_type AND daily.idx = cal.idx),
        |l1 AS (SELECT event_type, idx // 2 AS idx, CAST(sum(c) AS BIGINT) AS c,
        |    CAST(sum(CASE WHEN idx % 2 = 0 THEN c ELSE -c END) AS BIGINT) AS dcoef
        |  FROM dense GROUP BY 1, 2),
        |l2 AS (SELECT event_type, idx // 2 AS idx, CAST(sum(c) AS BIGINT) AS c,
        |    CAST(sum(CASE WHEN idx % 2 = 0 THEN c ELSE -c END) AS BIGINT) AS dcoef
        |  FROM l1 GROUP BY 1, 2),
        |l3 AS (SELECT event_type, idx // 2 AS idx, CAST(sum(c) AS BIGINT) AS c,
        |    CAST(sum(CASE WHEN idx % 2 = 0 THEN c ELSE -c END) AS BIGINT) AS dcoef
        |  FROM l2 GROUP BY 1, 2),
        |uni AS (SELECT event_type, CAST(1 AS BIGINT) AS level, idx, c AS smooth, dcoef FROM l1
        |  UNION ALL SELECT event_type, 2, idx, c, dcoef FROM l2
        |  UNION ALL SELECT event_type, 3, idx, c, dcoef FROM l3)
        |SELECT event_type, level, idx, smooth, dcoef FROM uni
        |ORDER BY event_type, level, idx""".stripMargin,
    "q412_mutual_knn" ->
      // same forward/backward exact scoring (q45's raw-cosine ranking),
      // backward restricted to the forward-hit set, same bp quantization
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |xs AS (SELECT vec_id, v FROM e WHERE vec_id % 2 = 0 AND vec_id < 2000),
        |ys AS (SELECT vec_id, v FROM e WHERE vec_id % 2 = 1),
        |fs AS (SELECT x.vec_id AS x, y.vec_id AS y,
        |    list_dot_product(x.v, y.v) / (sqrt(list_dot_product(x.v, x.v)) * sqrt(list_dot_product(y.v, y.v))) AS cosine
        |  FROM xs x CROSS JOIN ys y),
        |fr AS (SELECT x, y, cosine, row_number() OVER (PARTITION BY x ORDER BY cosine DESC, y) AS rn FROM fs),
        |fwd AS (SELECT x, y, cosine FROM fr WHERE rn = 1),
        |bq AS (SELECT DISTINCT y FROM fwd),
        |bs AS (SELECT b.y, x.vec_id AS bx,
        |    list_dot_product(yv.v, x.v) / (sqrt(list_dot_product(yv.v, yv.v)) * sqrt(list_dot_product(x.v, x.v))) AS cosine
        |  FROM bq b JOIN ys yv ON yv.vec_id = b.y CROSS JOIN xs x),
        |br AS (SELECT y, bx, row_number() OVER (PARTITION BY y ORDER BY cosine DESC, bx) AS rn FROM bs),
        |bwd AS (SELECT y, bx FROM br WHERE rn = 1)
        |SELECT f.x, f.y, CAST(round(f.cosine * 10000) AS BIGINT) AS cos_bp
        |FROM fwd f JOIN bwd ON f.y = bwd.y AND f.x = bwd.bx ORDER BY f.x""".stripMargin,
    "q413_anova" ->
      // same per-arm exact moments, same centi-quantized Σs²/n, same chain
      """WITH e AS (SELECT event_type, CAST(round(value * 100, 0) AS BIGINT) AS y FROM events),
        |m AS (SELECT event_type, count(*) AS n, CAST(sum(y) AS BIGINT) AS s,
        |    CAST(sum(y * y) AS BIGINT) AS ss FROM e GROUP BY 1),
        |g AS (SELECT count(*) AS k, CAST(sum(n) AS BIGINT) AS nn,
        |    CAST(sum(s) AS BIGINT) AS ts, CAST(sum(ss) AS BIGINT) AS tss,
        |    CAST(sum(CAST(floor(CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
        |      / CAST(n AS DOUBLE) * 100) AS BIGINT)) AS BIGINT) AS sg_centi
        |  FROM m)
        |SELECT k, nn,
        |  (round(sg_centi / 100.0 - CAST(ts AS DOUBLE) * CAST(ts AS DOUBLE) / CAST(nn AS DOUBLE), 4) + 0.0) AS ssb,
        |  (round(CAST(tss AS DOUBLE) - sg_centi / 100.0, 4) + 0.0) AS ssw,
        |  (round(((sg_centi / 100.0 - CAST(ts AS DOUBLE) * CAST(ts AS DOUBLE) / CAST(nn AS DOUBLE))
        |    / CAST(k - 1 AS DOUBLE))
        |    / ((CAST(tss AS DOUBLE) - sg_centi / 100.0) / CAST(nn - k AS DOUBLE)), 4) + 0.0) AS f_stat
        |FROM g""".stripMargin,
    "q414_stratified_kfold" ->
      // same per-stratum round-robin in (doc_id) order
      """WITH d AS (SELECT doc_id, lang,
        |    (row_number() OVER (PARTITION BY lang ORDER BY doc_id) - 1) % 5 AS fold
        |  FROM documents)
        |SELECT CAST(fold AS BIGINT) AS fold, lang, count(*) AS n
        |FROM d GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q415_eb_shrinkage" ->
      // same exact-integer additive-smoothing identity, same top-20 order
      """WITH per AS (SELECT l_partkey, count(*) AS n,
        |    CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS r
        |  FROM lineitem GROUP BY 1),
        |tot AS (SELECT CAST(sum(n) AS BIGINT) AS nn, CAST(sum(r) AS BIGINT) AS rr FROM per)
        |SELECT l_partkey, n, r, r * 10000 // n AS raw_bp,
        |  (r * nn + 20 * rr) * 10000 // ((n + 20) * nn) AS shrunk_bp
        |FROM per, tot ORDER BY shrunk_bp DESC, l_partkey LIMIT 20""".stripMargin,
    "q416_set_cover" -> q416Sql,
    "q417_mutual_knn_ivf" -> q417Sql,
    "q48_simhash" -> q48Sql
  )
}
