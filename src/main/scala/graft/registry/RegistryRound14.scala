package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import SparkEntry._

/** Registry part: round-14 additions (q418+) — model-evaluation statistics,
  * attribution, data-layout and governance operators, and series/similarity
  * primitives the earlier families don't cover.
  *
  * Same contract as every other part: each key is a deterministic DataFrame
  * (total output ordering, no wall-clock, explicit aliases) with a DuckDB
  * twin in [[oracleSql]]; exact integer arithmetic wherever a cross-engine
  * float could disagree (SURVEY.md §7.6).
  */
private[graft] object RegistryRound14 {

  /** Merkle tree over key ranges (fanout 512 rows/leaf, 32 leaves/node):
    * levels bottom-up, each one hash aggregate whose collect is bounded by
    * the FANOUT (never the table), concatenation ordered by child id so
    * both engines hash identical strings. Returns (level, node_id, h) with
    * level 0 = leaves. */
  private def merkleLevels(rows: DataFrame): DataFrame = {
    val leaves = rows
      .withColumn("node_id", expr("k div 512"))
      .groupBy(col("node_id"))
      .agg(md5(concat_ws("", expr(
        "transform(array_sort(collect_list(struct(k, rh))), x -> x.rh)"))).as("h"))
      .withColumn("level", lit(0L))
    // child concat sorts on the child NODE ID (not the hash) — two children
    // sharing a hash must not reorder
    val l1 = leaves
      .withColumn("pid", expr("node_id div 32"))
      .groupBy(col("pid"))
      .agg(md5(concat_ws("", expr(
        "transform(array_sort(collect_list(struct(node_id, h))), x -> x.h)"))).as("h"))
      .select(col("pid").as("node_id"), col("h"), lit(1L).as("level"))
    val root = l1
      .groupBy()
      .agg(md5(concat_ws("", expr(
        "transform(array_sort(collect_list(struct(node_id, h))), x -> x.h)"))).as("h"))
      .select(lit(0L).as("node_id"), col("h"), lit(2L).as("level"))
    leaves.select(col("node_id"), col("h"), col("level"))
      .unionByName(l1).unionByName(root)
  }

  /** Densified per-type daily series over January: one row per
    * (event_type, day 1..31), absent days as REAL ZEROS (q411's calendar
    * convention), values collected into a day-ordered array — the bounded
    * per-group frame the series operators (q431 DTW, q433 Holt-Winters)
    * fold over. |types| x 31 rows, never raw events. */
  private def dailySeries(s: SparkSession, dir: String,
                          asDouble: Boolean): DataFrame = {
    val d = T(s, dir, "events")
      .groupBy(col("event_type"), dayofmonth(col("ts")).cast("long").as("day"))
      .agg(count(lit(1)).as("x"))
    val dense = d.select(col("event_type")).distinct()
      .crossJoin(s.range(1, 32).toDF("day"))
      .join(d, Seq("event_type", "day"), "left")
      .withColumn("x", coalesce(col("x"), lit(0L)))
    val xVal = if (asDouble) "CAST(e.x AS DOUBLE)" else "e.x"
    dense.groupBy(col("event_type"))
      .agg(expr(s"transform(array_sort(collect_list(struct(day, x))), e -> $xVal)")
        .as("xs"))
  }

  val queries: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
    "q418_mcnemar" -> ((s, dir) => {
      // McNemar's paired test — the eval-family gap next to q208 (AUC) /
      // q238 (kappa): q208 scores ONE model, q238 measures rater agreement;
      // shipping a model swap needs the PAIRED comparison on the SAME docs,
      // where only the discordant cells carry information. A = the q50
      // n-gram langid, B = the majority-class baseline (always 'en');
      // b = A right & B wrong, c = A wrong & B right,
      // chi2 = (b-c)^2/(b+c) — exact integer centi-scale, the q205 SRM
      // convention (the 5%-level flag 3.84 decides on integers).
      // Scale shape: one scan, one global aggregate; 1 output row.
      val d = T(s, dir, "documents")
        .select((ops.TextAnalysis.langId(col("text")) === col("lang")).as("a_ok"),
          (col("lang") === "en").as("b_ok"))
      d.agg(
        sum(when(col("a_ok") && col("b_ok"), 1L).otherwise(0L)).as("n11"),
        sum(when(col("a_ok") && !col("b_ok"), 1L).otherwise(0L)).as("b"),
        sum(when(!col("a_ok") && col("b_ok"), 1L).otherwise(0L)).as("c"),
        sum(when(!col("a_ok") && !col("b_ok"), 1L).otherwise(0L)).as("n00"))
        .select(col("n11"), col("b"), col("c"), col("n00"),
          expr("CASE WHEN b + c = 0 THEN 0L ELSE (100 * (b - c) * (b - c)) div (b + c) END")
            .as("chi2_centi"),
          (expr("CASE WHEN b + c = 0 THEN 0L ELSE (100 * (b - c) * (b - c)) div (b + c) END")
            > 384L).as("significant"))
    }),
    "q419_shapley_attribution" -> ((s, dir) => {
      // exact Shapley-value channel attribution — the cooperative-game
      // complement of q389's Markov removal effect: v(S) counts converted
      // users whose touched-channel set fits inside coalition S, and each
      // channel's credit is the exact Shapley sum over all 2^5 coalitions.
      // With 5 fixed channels the coalition lattice is 32 rows — a
      // broadcast-side constant — so the corpus pays ONE user aggregate
      // and one |masks|<=32 rollup regardless of row count; everything
      // after is bounded algebra. phi * 120 (= 5!) is an exact integer:
      // weights k!(4-k)! are 24/6/4/6/24 by |S|.
      val idx = "CASE event_type WHEN 'click' THEN 0 WHEN 'error' THEN 1" +
        " WHEN 'purchase' THEN 2 WHEN 'signup' THEN 3 ELSE 4 END"
      val users = T(s, dir, "events")
        .groupBy(col("user_id"))
        .agg(sum_distinct(expr(s"CAST(shiftleft(1, $idx) AS BIGINT)")).as("mask"),
          max(col("value")).as("mx"))
        .filter(col("mx") >= 300.0)
      val obs = users.groupBy(col("mask")).agg(count(lit(1)).as("cnt"))
        .localCheckpoint() // <=32 rows; two consumers below
      val coal = s.range(0, 32).toDF("sm")
      val v = coal.join(broadcast(obs), expr("(mask & sm) = mask"), "left")
        .groupBy(col("sm")).agg(coalesce(sum(col("cnt")), lit(0L)).as("v"))
      val ch = s.range(0, 5).toDF("ci")
      ch.join(broadcast(v.as("vs")), expr("(sm & shiftleft(1, CAST(ci AS INT))) = 0"))
        .join(broadcast(v.select(col("sm").as("sm2"), col("v").as("v2")).as("vi")),
          expr("sm2 = (sm | shiftleft(1, CAST(ci AS INT)))"))
        .withColumn("w", expr("CASE bit_count(sm) WHEN 0 THEN 24 WHEN 1 THEN 6" +
          " WHEN 2 THEN 4 WHEN 3 THEN 6 ELSE 24 END"))
        .groupBy(col("ci"))
        .agg(sum(expr("w * (v2 - v)")).cast("long").as("shapley_x120"))
        .select(expr("CASE ci WHEN 0 THEN 'click' WHEN 1 THEN 'error'" +
          " WHEN 2 THEN 'purchase' WHEN 3 THEN 'signup' ELSE 'view' END")
          .as("channel"), col("shapley_x120"))
        .orderBy("channel")
    }),
    "q420_pass_at_k" -> ((s, dir) => {
      // the unbiased pass@k estimator (1 - C(n-c,k)/C(n,k)) per part,
      // treating its lineitems as trials and returnflag='R' as a pass —
      // the LLM-eval aggregation shape (n samples per task, c successes,
      // report pass@{1,5,10}). The combinatorial ratio is computed as the
      // ORDER-SPECIFIED product prod_{i<k} (n-c-i)/(n-i): each step is one
      // correctly-rounded IEEE divide and multiply, and the oracle folds
      // the identical sequence, so the doubles match BIT-FOR-BIT — no
      // quantization needed (ln/exp never enters). One hash aggregate to
      // |parts| rows; the fold is k<=10 scalar ops per row.
      def passAt(k: Int) = expr(
        s"CASE WHEN n - c < $k THEN CAST(1.0 AS DOUBLE) ELSE " +
          s"1.0 - aggregate(sequence(0, ${k - 1}), CAST(1.0 AS DOUBLE), " +
          s"(acc, i) -> acc * (CAST(n - c - i AS DOUBLE) / CAST(n - i AS DOUBLE))) END")
      T(s, dir, "lineitem")
        .groupBy(col("l_partkey"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("l_returnflag") === "R", 1L).otherwise(0L)).as("c"))
        .filter(col("n") >= 10)
        .select(col("l_partkey"), col("n"), col("c"),
          passAt(1).as("pass_at_1"), passAt(5).as("pass_at_5"),
          passAt(10).as("pass_at_10"))
        .orderBy("l_partkey")
    }),
    "q421_cusum_control" -> ((s, dir) => {
      // one-sided CUSUM control chart per event type: baseline mean from
      // the first 10 calendar days, then S_i = max(0, S_{i-1} + x_i - mu -
      // mu/20) over the monitored days, alarming when S crosses 4*mu.
      // DISTRIBUTED form: the reset-at-zero recursion is the reflected-walk
      // identity S_i = P_i - min(0, min_{j<=i} P_j) (P = prefix sum of the
      // increments), so the whole chart is two window functions over the
      // per-day frame — no sequential fold, unlike q200's Holt state, and
      // the frame is |types| x |days|, never raw events. All integer: cents
      // scaled by 20*n0 make mu + mu/20 the exact integer 21*base_sum.
      val daily = T(s, dir, "events")
        .groupBy(col("event_type"), ops.TextFunctions.dayString(col("ts")).as("day"))
        .agg(sum(ops.Num.roundz(col("value") * 100, 0).cast("long")).as("cents"))
      val base = daily.filter(col("day") <= "2024-01-10")
        .groupBy(col("event_type"))
        .agg(sum(col("cents")).as("base_sum"), count(lit(1)).as("n0"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("event_type")).orderBy(col("day"))
      daily.filter(col("day") > "2024-01-10")
        .join(broadcast(base), Seq("event_type"))
        .withColumn("inc", expr("20 * n0 * cents - 21 * base_sum"))
        .withColumn("p", sum(col("inc")).over(w))
        .withColumn("s_scaled",
          col("p") - least(lit(0L), min(col("p")).over(w)))
        .select(col("event_type"), col("day"), col("inc"), col("s_scaled"),
          (col("s_scaled") > expr("80 * base_sum")).as("alarm"))
        .orderBy("event_type", "day")
    }),
    "q422_decision_stump" -> ((s, dir) => {
      // histogram-based split finding (the LightGBM/XGBoost hist trick) —
      // the tree-learning primitive the stats family lacks: bin the feature
      // (price, $100 bins), aggregate per-bin (n, pos) once, then score
      // every split from prefix sums. Label: p_size >= 25. The split score
      // minimizes weighted Gini; ranking uses the EXACT integer rational
      //   score/1e6 = (pl^2+(nl-pl)^2)/nl + (pr^2+(nr-pr)^2)/nr
      // via decimal(38,0) `div` (the numerator tops int64 at sf1) — no
      // float enters, so cross-engine argmax cannot flip. Scale shape: one
      // hash aggregate to |bins| rows; prefix sums + scoring run on that
      // bounded frame, NEVER the corpus — the 100 TB shape (one pass +
      // bounded algebra), vs the naive sort-all-candidate-thresholds.
      val bins = T(s, dir, "part")
        .groupBy(expr("CAST(round(p_retailprice * 100, 0) AS BIGINT) div 10000")
          .as("bin"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("p_size") >= 25, 1L).otherwise(0L)).as("pos"))
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(col("bin")).rowsBetween(Long.MinValue, 0)
      bins
        .withColumn("nl", sum(col("n")).over(w))
        .withColumn("pl", sum(col("pos")).over(w))
        .crossJoin(broadcast(bins.agg(sum(col("n")).as("nt"), sum(col("pos")).as("pt"))))
        .filter(col("nl") < col("nt"))
        .withColumn("nr", col("nt") - col("nl"))
        .withColumn("pr", col("pt") - col("pl"))
        .withColumn("a", expr("pl * pl + (nl - pl) * (nl - pl)"))
        .withColumn("bb", expr("pr * pr + (nr - pr) * (nr - pr)"))
        .withColumn("score_ppm", expr(
          "CAST(CAST(1000000 AS DECIMAL(38,0)) * (CAST(a AS DECIMAL(38,0)) * nr + " +
            "CAST(bb AS DECIMAL(38,0)) * nl) div (CAST(nl AS DECIMAL(38,0)) * nr) AS BIGINT)"))
        .select(col("bin").as("split_bin"), col("nl"), col("pl"), col("nr"),
          col("pr"), col("score_ppm"))
        .orderBy(col("score_ppm").desc, col("split_bin"))
        .limit(10)
    }),
    "q423_uplift_qini" -> ((s, dir) => {
      // uplift deciles + the Qini numerator — the targeting readout next to
      // q163's average lift: rank users by a pre-period activity score,
      // then per score-decile compare treated vs control conversion, and
      // accumulate the Qini curve top-down. Everything after the per-user
      // aggregate is a 10-row frame; the Qini value at each decile is the
      // EXACT integer ct_cum*nc_cum - cc_cum*nt_cum (the 1/nc_cum
      // normalization would be rational — scaling by nc_cum keeps the
      // cross-engine compare on integers, the q252 convention).
      val ev = T(s, dir, "events")
      val users = ev.groupBy(col("user_id"))
        .agg(sum(when(ops.TextFunctions.dayString(col("ts")) <= "2024-01-15", 1L)
          .otherwise(0L)).as("score"),
          max(when(ops.TextFunctions.dayString(col("ts")) > "2024-01-15"
            && col("value") >= 300.0, 1L).otherwise(0L)).as("conv"))
        .withColumn("arm", pmod(col("user_id"), lit(2L)))
      val wOrd = org.apache.spark.sql.expressions.Window
        .orderBy(col("score").desc, col("user_id"))
      val byDec = users
        .withColumn("decile", ntile(10).over(wOrd).cast("long"))
        .groupBy(col("decile"))
        .agg(sum(when(col("arm") === 1, 1L).otherwise(0L)).as("nt"),
          sum(when(col("arm") === 0, 1L).otherwise(0L)).as("nc"),
          sum(when(col("arm") === 1, col("conv")).otherwise(0L)).as("ct"),
          sum(when(col("arm") === 0, col("conv")).otherwise(0L)).as("cc"))
      val wCum = org.apache.spark.sql.expressions.Window
        .orderBy(col("decile")).rowsBetween(Long.MinValue, 0)
      byDec
        .withColumn("qini_x", sum(col("ct")).over(wCum) * sum(col("nc")).over(wCum)
          - sum(col("cc")).over(wCum) * sum(col("nt")).over(wCum))
        .select(col("decile"), col("nt"), col("nc"), col("ct"), col("cc"),
          col("qini_x"))
        .orderBy("decile")
    }),
    "q424_bleu" -> ((s, dir) => {
      // corpus BLEU-4 — the generation-eval twin of q314's ROUGE overlap:
      // candidates are the planted near-dup docs, references their
      // originals (cand = ref + ' dup'), paired by an equi-join on the
      // constructed text. Modified n-gram precision is the clipped
      // multiset intersection summed over the corpus (exact integers);
      // the geometric mean is sqrt(sqrt(p1*p2*p3*p4)) — sqrt and the
      // four divides are correctly-rounded IEEE ops folded in the same
      // order by both engines, so the final double matches bit-for-bit
      // and ln/exp never enters (the brevity penalty's exp sits in a
      // CASE branch that c>=r makes unreachable). Scale shape: n-gram
      // explode only over the PAIRED docs (5% of the corpus), grouped
      // counts both sides, one bounded join per n.
      val docs = T(s, dir, "documents").select(col("doc_id"), col("text"))
      val pairs = docs.as("c").join(docs.as("r"),
        expr("c.text = concat(r.text, ' dup')"))
        .select(col("c.doc_id").as("pair_id"), col("c.text").as("ct"),
          col("r.text").as("rt"))
        .localCheckpoint() // reused by 4 n-gram passes + the length sums
      def grams(src: String, n: Int) = pairs
        .select(col("pair_id"), split(col(src), " ").as("t"))
        .filter(size(col("t")) >= n) // sequence(1, 0) would DESCEND (q416 lesson)
        .select(col("pair_id"), explode(expr(
          s"transform(sequence(1, size(t) - ${n - 1}), i -> " +
            s"concat_ws(' ', slice(t, i, $n)))")).as("g"))
        .groupBy(col("pair_id"), col("g")).agg(count(lit(1)).as("cnt"))
      val perN = (1 to 4).map { n =>
        val c = grams("ct", n)
        val r = grams("rt", n).withColumnRenamed("cnt", "rcnt")
        val m = c.join(r, Seq("pair_id", "g"))
          .agg(coalesce(sum(least(col("cnt"), col("rcnt"))), lit(0L)).as("match"))
        val t = c.agg(sum(col("cnt")).as("total"))
        m.crossJoin(t).select(lit(n).as("n"), col("match"), col("total"))
      }.reduce(_.unionByName(_))
      val lens = pairs.agg(
        sum(size(split(col("ct"), " "))).cast("long").as("c_len"),
        sum(size(split(col("rt"), " "))).cast("long").as("r_len"))
      perN.groupBy()
        .agg(sum(when(col("n") === 1, col("match"))).as("match1"),
          sum(when(col("n") === 1, col("total"))).as("total1"),
          sum(when(col("n") === 2, col("match"))).as("match2"),
          sum(when(col("n") === 2, col("total"))).as("total2"),
          sum(when(col("n") === 3, col("match"))).as("match3"),
          sum(when(col("n") === 3, col("total"))).as("total3"),
          sum(when(col("n") === 4, col("match"))).as("match4"),
          sum(when(col("n") === 4, col("total"))).as("total4"))
        .crossJoin(lens)
        .withColumn("bleu", expr(
          "(CASE WHEN c_len >= r_len THEN CAST(1.0 AS DOUBLE)" +
            " ELSE exp(1.0 - CAST(r_len AS DOUBLE) / CAST(c_len AS DOUBLE)) END) * " +
            "sqrt(sqrt((CAST(match1 AS DOUBLE) / CAST(total1 AS DOUBLE)) * " +
            "(CAST(match2 AS DOUBLE) / CAST(total2 AS DOUBLE)) * " +
            "(CAST(match3 AS DOUBLE) / CAST(total3 AS DOUBLE)) * " +
            "(CAST(match4 AS DOUBLE) / CAST(total4 AS DOUBLE))))"))
        .drop("c_len", "r_len")
    }),
    "q425_sort_for_compression" -> ((s, dir) => {
      // layout advisor: which sort key makes the OTHER columns compress? —
      // the decision input for q99/q124-style rewrites. For each candidate
      // key, count the RLE runs each payload column would have after
      // ORDER BY (key, orderkey, linenumber), computed WITHOUT a global
      // sort: rows group by (key, l_orderkey div 4096), transitions are
      // counted inside each bucket by a PARTITIONED window, and every
      // bucket boundary conservatively opens a new run (+1). The metric is
      // defined as this bucketed upper bound precisely so it distributes —
      // a true global-adjacency count would serialize a 3-value key's
      // whole corpus through one window task at 100 TB. Exact integers.
      val li = T(s, dir, "lineitem").select(col("l_orderkey"), col("l_linenumber"),
        col("l_partkey"), col("l_suppkey"), col("l_returnflag"), col("l_linestatus"),
        ops.TextFunctions.dayString(col("l_shipdate")).substr(1, 7).as("ship_month"))
      val payload = Seq("l_partkey", "l_suppkey", "l_returnflag", "l_linestatus")
      def runsFor(keyName: String): DataFrame = {
        // (l_orderkey, l_linenumber) is NOT unique in this data (the q07
        // lesson) — ordering by every payload column too makes the
        // within-bucket sequence invariant under duplicate sort keys, so
        // the transition counts are total-order-independent cross-engine
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("__k"), col("__b"))
          .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
            col("l_suppkey"), col("l_returnflag"), col("l_linestatus"))
        val flagged = li
          .withColumn("__k", col(keyName).cast("string"))
          .withColumn("__b", expr("l_orderkey div 4096"))
          .select(Seq(col("__k"), col("__b"), col("l_orderkey"), col("l_linenumber")) ++
            payload.map { c =>
              when(lag(col(c), 1).over(w).isNull
                || lag(col(c), 1).over(w) =!= col(c), 1L).otherwise(0L).as(s"__r_$c")
            }: _*)
        val agg = flagged.agg(
          payload.map(c => sum(col(s"__r_$c")).as(c)).head,
          payload.map(c => sum(col(s"__r_$c")).as(c)).tail: _*)
        agg.select(Seq(lit(keyName).as("sort_key")) ++
          payload.map(col): _*)
      }
      Seq("l_returnflag", "l_linestatus", "ship_month").map(runsFor)
        .reduce(_.unionByName(_))
        .select(col("sort_key"), col("l_partkey").as("runs_partkey"),
          col("l_suppkey").as("runs_suppkey"),
          col("l_returnflag").as("runs_returnflag"),
          col("l_linestatus").as("runs_linestatus"))
        .orderBy("sort_key")
    }),
    "q426_hierarchy_paths" -> ((s, dir) => {
      // FK-chain flatten: every node's root + full path through the
      // customer→nation→region hierarchy, by POINTER JUMPING — each round
      // joins the state with itself on (my farthest ancestor = your node),
      // DOUBLING the resolved horizon, so a depth-d hierarchy needs
      // ceil(log2 d) shuffle rounds, not d (the difference between 2 and
      // 40 rounds on a deep org/thread tree at 100 TB). Two rounds here
      // cover depth <= 4 > the schema's 3; roots are their own fixpoint
      // (suffix '', +0 depth), so extra rounds are no-ops, never wrong.
      def nodes(t: String, id: String, pid: String, p: String, pp: String) =
        T(s, dir, t).select(concat(lit(p), col(id)).as("node"),
          (if (pp.isEmpty) lit(null).cast("string")
           else concat(lit(pp), col(pid))).as("parent"))
      val all = nodes("customer", "c_custkey", "c_nationkey", "c:", "n:")
        .unionByName(nodes("nation", "n_nationkey", "n_regionkey", "n:", "r:"))
        .unionByName(T(s, dir, "region")
          .select(concat(lit("r:"), col("r_regionkey")).as("node"),
            lit(null).cast("string").as("parent")))
      val init = all.select(col("node"),
        coalesce(col("parent"), col("node")).as("anc"),
        when(col("parent").isNull, 0L).otherwise(1L).as("depth"),
        when(col("parent").isNull, "").otherwise(concat(lit("/"), col("parent")))
          .as("sfx"))
      val resolved = (1 to 2).foldLeft(init) { (st, _) =>
        st.as("a").join(
          st.select(col("node").as("bn"), col("anc").as("banc"),
            col("depth").as("bd"), col("sfx").as("bsfx")).as("b"),
          col("a.anc") === col("bn"))
          .select(col("a.node").as("node"), col("banc").as("anc"),
            (col("a.depth") + col("bd")).as("depth"),
            concat(col("a.sfx"), col("bsfx")).as("sfx"))
      }
      resolved.select(col("node"), col("anc").as("root"), col("depth"),
        concat(col("node"), col("sfx")).as("path"))
        .orderBy("node")
    }),
    "q427_policy_mask" -> ((s, dir) => {
      // data-driven row/column security (ops.Policy): the rule set below is
      // METADATA — per role it compiles to one pushed row-filter + one
      // codegen'd masking projection over customer, zero extra shuffles.
      // analyst: names truncated, balances nulled, one segment row-filtered
      // out; support: names pseudonymized by md5; admin: passthrough. The
      // gate pins that masking composes with filtering and that an unknown
      // action can never silently pass data through (Policy `require`s).
      import ops.Policy
      Policy.applyPolicy(
        T(s, dir, "customer"),
        Seq(
          Policy.Rule("analyst", "c_name", "redact_tail", "9"),
          Policy.Rule("analyst", "c_acctbal", "nullify", ""),
          Policy.Rule("analyst", "__row_filter__",
            "c_mktsegment <> 'AUTOMOBILE'", ""),
          Policy.Rule("support", "c_name", "md5", "")),
        roles = Seq("admin", "analyst", "support"),
        keepCols = Seq("c_custkey", "c_name", "c_acctbal", "c_mktsegment"))
        .orderBy("role", "c_custkey")
    }),
    "q428_merkle_ranges" -> ((s, dir) => {
      // snapshot diff by Merkle descent — the integrity primitive behind
      // "which key ranges changed between yesterday's copy and today's?"
      // without shipping either table: both snapshots hash into a 3-level
      // tree (512-row leaves, fanout 32), and ONLY differing nodes surface.
      // At 100 TB the comparison exchanges |tree| = N/512 + N/16384 + 1
      // hashes instead of N rows, and an unchanged subtree is pruned at its
      // root. The synthetic 'today' bumps every 997th order's price and
      // deletes every 1009th order, so the gate pins both edit kinds
      // (value change and membership change) surfacing on exactly the
      // ranges that hold them.
      val rows = T(s, dir, "orders").select(col("o_orderkey").as("k"),
        expr("CAST(round(o_totalprice * 100, 0) AS BIGINT)").as("cents"),
        col("o_orderstatus"))
      def hashed(df: DataFrame) = df.select(col("k"),
        md5(concat_ws("|", col("k"), col("cents"), col("o_orderstatus"))).as("rh"))
      val base = hashed(rows)
      val cur = hashed(rows
        .filter(col("k") % 1009 =!= 0)
        .withColumn("cents",
          when(col("k") % 997 === 0, col("cents") + 100).otherwise(col("cents"))))
      merkleLevels(base).as("b")
        .join(merkleLevels(cur)
          .select(col("level").as("cl"), col("node_id").as("cn"),
            col("h").as("ch")).as("c"),
          col("level") === col("cl") && col("node_id") === col("cn"), "full")
        .filter(!(col("h") <=> col("ch")))
        .select(coalesce(col("level"), col("cl")).as("level"),
          coalesce(col("node_id"), col("cn")).as("node_id"),
          col("h").as("base_h"), col("ch").as("cur_h"))
        .orderBy(col("level").desc, col("node_id"))
    }),
    "q429_mannwhitney_u" -> ((s, dir) => {
      // Mann-Whitney U — the nonparametric twin of q244's Welch t: arm
      // comparison on RANKS, so one $10k outlier cannot buy the verdict.
      // Rank sums come from the (type, cents) HISTOGRAM, not per-row
      // ranking: average tied ranks x2 are the exact integer 2s+t+1 (s =
      // count below the tie group, t = its size), so the window runs over
      // |distinct cents| rows per type — bounded by the value domain, not
      // the corpus — and every statistic stays an exact integer (U doubled;
      // the rank-biserial effect floor'd at ppm on decimal/hugeint).
      val g = T(s, dir, "events")
        .select(col("event_type"),
          expr("CAST(round(value * 100, 0) AS BIGINT)").as("cents"),
          pmod(col("user_id"), lit(2L)).as("arm"))
        .groupBy(col("event_type"), col("cents"))
        .agg(count(lit(1)).as("t"),
          sum(when(col("arm") === 1, 1L).otherwise(0L)).as("t1"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("event_type")).orderBy(col("cents"))
        .rowsBetween(Long.MinValue, -1)
      g.withColumn("s", coalesce(sum(col("t")).over(w), lit(0L)))
        .groupBy(col("event_type"))
        .agg(sum(expr("t1 * (2 * s + t + 1)")).as("r1_2"),
          sum(col("t1")).as("n1"), sum(expr("t - t1")).as("n2"))
        .withColumn("u2", expr("r1_2 - n1 * (n1 + 1)"))
        .select(col("event_type"), col("n1"), col("n2"), col("u2"),
          expr("CAST((CAST(1000000 AS DECIMAL(38,0)) * u2) div (n1 * n2) AS BIGINT)")
            .as("rb_plus1_ppm"))
        .orderBy("event_type")
    }),
    "q430_kcenter_seeds" -> ((s, dir) => {
      // greedy farthest-point k-center seeding — the deterministic
      // initializer the q257/q58 kmeans path lacks (its seeds are fixed id
      // ranges): each round picks the point farthest from every chosen
      // center, so the seed set 2-approximates the optimal k-center cover
      // (Gonzalez '85) and the emitted radius curve IS the coverage bound.
      // Each round is one broadcast pass over the corpus (<=k centers
      // crossed against points, min per point) + a 1-row argmax collect
      // (the q416 greedy convention); k rounds total, never a pairwise
      // matrix. dist^2 rides the dot identity |x|^2-2x.c+|c|^2 rounded to
      // 6dp before the argmax — last-ulp dot-order noise cannot flip a
      // pick (the q45 convention); ties break on vec_id.
      import s.implicits._
      val emb = T(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
        .localCheckpoint() // k scans of a frozen frame, not k re-reads
      var picked = Vector((0L, Option.empty[Double])) // seed 0: the convention start
      (1 to 7).foreach { _ =>
        val best = ops.Similarity
          .kcenterRound(emb, picked.map(_._1), "vec_id", "embedding")
          .orderBy(col("d").desc, col("vec_id")).limit(1)
          .head()
        picked = picked :+ ((best.getLong(0), Some(best.getDouble(1))))
      }
      picked.zipWithIndex
        .map { case ((cid, rad), r) => (r.toLong, cid, rad) }
        .toDF("r", "cid", "radius")
        .select(col("r"), col("cid"), ops.Num.normZero(col("radius")).as("radius"))
        .orderBy("r")
    }),
    "q431_dtw_distance" -> ((s, dir) => {
      // banded Dynamic Time Warping between every pair of event-type daily
      // series — the elastic series similarity q220's lag-scan cross-
      // correlation cannot express (DTW aligns local stretches, not one
      // global shift). Sakoe-Chiba band w=3, cost |a-b| on exact integer
      // counts, so the whole DP is integer arithmetic — bit-identical
      // cross-engine by construction. The grid is 31x31 per pair folded
      // INSIDE one row via nested higher-order aggregates (outer over
      // rows, inner over cells, O(band) effective work): |types|^2/2 rows
      // of bounded CPU, zero extra shuffles beyond the daily rollup —
      // at corpus scale the cost is the rollup, not the DP.
      val INF = "1000000000000000"
      val ser = dailySeries(s, dir, asDouble = false)
      val pairs = ser.select(col("event_type").as("ta"), col("xs").as("xa"))
        .join(ser.select(col("event_type").as("tb"), col("xs").as("xb")),
          col("ta") < col("tb"))
      val row1 =
        s"""aggregate(sequence(2, 31), array(abs(element_at(xa, 1) - element_at(xb, 1))),
           |  (N, j) -> concat(N, array(CASE WHEN abs(1 - j) <= 3
           |    THEN abs(element_at(xa, 1) - element_at(xb, j)) + element_at(N, j - 1)
           |    ELSE $INF END)))""".stripMargin
      val dp =
        s"""aggregate(sequence(2, 31), $row1,
           |  (P, i) -> aggregate(sequence(2, 31),
           |    array(CASE WHEN abs(i - 1) <= 3
           |      THEN abs(element_at(xa, i) - element_at(xb, 1)) + element_at(P, 1)
           |      ELSE $INF END),
           |    (N, j) -> concat(N, array(CASE WHEN abs(i - j) <= 3
           |      THEN abs(element_at(xa, i) - element_at(xb, j)) +
           |        least(element_at(P, j), element_at(P, j - 1), element_at(N, j - 1))
           |      ELSE $INF END))))""".stripMargin
      pairs.select(col("ta"), col("tb"),
        expr(s"element_at($dp, 31)").as("dtw"))
        .orderBy("ta", "tb")
    }),
    "q432_fellegi_sunter" -> ((s, dir) => {
      // Fellegi-Sunter probabilistic record linkage — the WEIGHTED layer
      // q203's rule-based entity resolution lacks: per comparison field
      // estimate m (agreement rate among true matches) and u (among
      // non-matches) from labeled candidates, then score every agreement
      // pattern by its likelihood ratio prod m_k/u_k (agree) x
      // (1-m_k)/(1-u_k) (disagree). Candidates come from one equi-join
      // block (n_chars div 25) over a fixed probe slice (doc_id < 400,
      // the q49 bounding convention — pairwise listings are a harness
      // yardstick, not a corpus scan); truth is the planted '+ dup'
      // construction. The weight is an order-specified chain of
      // correctly-rounded IEEE ops on exact counts — bit-identical
      // cross-engine; degenerate denominators surface as NULL, never a
      // crash or a silent wrong weight.
      val d = T(s, dir, "documents").filter(col("doc_id") < 400)
        .select(col("doc_id"), col("text"), col("lang"), col("source"),
          col("n_chars"), expr("n_chars div 25").as("bucket"))
      val cands = d.as("a").join(d.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.doc_id") < col("b.doc_id"))
        .select(
          (col("a.lang") === col("b.lang")).as("f1"),
          (col("a.source") === col("b.source")).as("f2"),
          (abs(col("a.n_chars") - col("b.n_chars")) <= 4).as("f3"),
          (col("b.text") === concat(col("a.text"), lit(" dup"))).as("is_match"))
        .localCheckpoint() // scanned by the global-count and pattern aggs
      val g = cands.agg(
        sum(when(col("is_match"), 1L).otherwise(0L)).as("mt"),
        sum(when(!col("is_match"), 1L).otherwise(0L)).as("ut"),
        sum(when(col("is_match") && col("f1"), 1L).otherwise(0L)).as("ma1"),
        sum(when(!col("is_match") && col("f1"), 1L).otherwise(0L)).as("ua1"),
        sum(when(col("is_match") && col("f2"), 1L).otherwise(0L)).as("ma2"),
        sum(when(!col("is_match") && col("f2"), 1L).otherwise(0L)).as("ua2"),
        sum(when(col("is_match") && col("f3"), 1L).otherwise(0L)).as("ma3"),
        sum(when(!col("is_match") && col("f3"), 1L).otherwise(0L)).as("ua3"))
      def ratio(k: Int) =
        s"""CASE WHEN f$k THEN
           |  CASE WHEN mt = 0 OR ut = 0 OR ua$k = 0 THEN CAST(NULL AS DOUBLE)
           |    ELSE (CAST(ma$k AS DOUBLE) / CAST(mt AS DOUBLE)) / (CAST(ua$k AS DOUBLE) / CAST(ut AS DOUBLE)) END
           |ELSE
           |  CASE WHEN mt = 0 OR ut = 0 OR ut = ua$k THEN CAST(NULL AS DOUBLE)
           |    ELSE (CAST(mt - ma$k AS DOUBLE) / CAST(mt AS DOUBLE)) / (CAST(ut - ua$k AS DOUBLE) / CAST(ut AS DOUBLE)) END
           |END""".stripMargin
      cands.groupBy(col("f1"), col("f2"), col("f3"))
        .agg(count(lit(1)).as("n_pairs"),
          sum(when(col("is_match"), 1L).otherwise(0L)).as("n_match"))
        .crossJoin(broadcast(g))
        .withColumn("weight",
          expr(s"((${ratio(1)}) * (${ratio(2)})) * (${ratio(3)})"))
        .select(col("f1"), col("f2"), col("f3"), col("n_pairs"), col("n_match"),
          col("weight"))
        .orderBy("f1", "f2", "f3")
    }),
    "q433_holt_winters" -> ((s, dir) => {
      // additive Holt-Winters (level + trend + weekly seasonality) — the
      // seasonal extension of q200's Holt: q175 MEASURES seasonality,
      // q200 smooths through it; this key forecasts WITH it. State
      // (l, b, s[7]) folds over the densified daily series inside one
      // row per type (the q200 struct-fold idiom; the seasonal ring
      // rotates by slice+append, never indexed mutation — the safe shape
      // both engines evaluate purely). alpha/beta/gamma = 0.3/0.1/0.2;
      // init: l = mean(week1), b = (mean(week2) - mean(week1))/7,
      // s_j = x_j - mean(week1). Identical fold text both engines, 4dp
      // display rounding at the end only.
      val ser = dailySeries(s, dir, asDouble = true)
      val m1 = (1 to 7).map(i => s"element_at(xs, $i)").mkString("(", " + ", ") / 7.0D")
      val m2 = (8 to 14).map(i => s"element_at(xs, $i)").mkString("(", " + ", ") / 7.0D")
      val s0 = (1 to 7).map(i => s"element_at(xs, $i) - __m1").mkString("array(", ", ", ")")
      val nl = "0.3D * (element_at(xs, t) - element_at(acc.s, 1)) + 0.7D * (acc.l + acc.b)"
      val fold =
        s"""aggregate(sequence(8, 31),
           |  named_struct('l', __m1, 'b', (__m2 - __m1) / 7.0D, 's', $s0),
           |  (acc, t) -> named_struct(
           |    'l', $nl,
           |    'b', 0.1D * (($nl) - acc.l) + 0.9D * acc.b,
           |    's', concat(slice(acc.s, 2, 6),
           |      array(0.2D * (element_at(xs, t) - ($nl)) + 0.8D * element_at(acc.s, 1)))))""".stripMargin
      ser
        .withColumn("__m1", expr(m1)).withColumn("__m2", expr(m2))
        .withColumn("__f", expr(fold))
        .select(col("event_type"),
          ops.Num.roundz(col("__f.l"), 4).as("level"),
          ops.Num.roundz(col("__f.b"), 4).as("trend"),
          ops.Num.roundz(expr("__f.l + __f.b + element_at(__f.s, 1)"), 4)
            .as("forecast"))
        .orderBy("event_type")
    }),
    "q434_theilsen_slope" -> ((s, dir) => {
      // Theil-Sen robust trend per event type: the MEDIAN of all pairwise
      // slopes (x_j - x_i)/(j - i) — one wild day cannot buy the trend the
      // way it buys q392's OLS line. The 465 day-pairs per type come from
      // self-joining the 31-row daily frame (bounded algebra, never
      // events); each slope is quantized as floor(1e6 * num/den) where the
      // division is ONE correctly-rounded IEEE op on exact integers — both
      // engines produce the same double, so the same floor and the same
      // median element (rank ceil(n/2) in (slope, i, j) order).
      val ser = dailySeries(s, dir, asDouble = false)
        .select(col("event_type"), explode(expr(
          "transform(sequence(1, 31), i -> named_struct('i', CAST(i AS BIGINT), 'x', element_at(xs, i)))"))
          .as("p"))
        .select(col("event_type"), col("p.i").as("i"), col("p.x").as("x"))
      val pairs = ser.as("a").join(ser.as("b"),
        col("a.event_type") === col("b.event_type") && col("a.i") < col("b.i"))
        .select(col("a.event_type").as("event_type"),
          col("a.i").as("i"), col("b.i").as("j"),
          expr("FLOOR(1000000 * (CAST(b.x - a.x AS DOUBLE) / CAST(b.i - a.i AS DOUBLE)))")
            .cast("long").as("slope_q"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("event_type")).orderBy(col("slope_q"), col("i"), col("j"))
      pairs
        .withColumn("rn", row_number().over(w))
        .join(broadcast(pairs.groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_pairs"))), Seq("event_type"))
        .filter(col("rn") === expr("CAST(ceil(n_pairs / 2.0) AS BIGINT)"))
        .select(col("event_type"), col("n_pairs"), col("slope_q").as("median_slope_q"))
        .orderBy("event_type")
    }),
    "q435_delta_method_ci" -> ((s, dir) => {
      // ratio-metric variance by the delta method — the missing CI next to
      // q359's proportion z-test: per-user ratio metrics (cents per event)
      // violate the iid-row assumption, so var(X̄/Ȳ) is estimated as
      // (s_xx − 2R·s_xy + R²·s_yy) / (n·Ȳ²) over USER-level totals. One
      // user aggregate then one moment aggregate per (type, arm) — exact
      // integer sums (squares on decimal(38): Σx² tops int64 at sf1), the
      // double algebra in one fixed order → bit-identical CI half-widths.
      val u = T(s, dir, "events")
        .groupBy(col("event_type"), pmod(col("user_id"), lit(2L)).as("arm"),
          col("user_id"))
        .agg(sum(expr("CAST(round(value * 100, 0) AS BIGINT)")).as("x"),
          count(lit(1)).as("y"))
      val dec = "decimal(38,0)"
      u.groupBy(col("event_type"), col("arm"))
        .agg(count(lit(1)).as("n"),
          sum(col("x")).as("sx"), sum(col("y")).as("sy"),
          sum(col("x").cast(dec) * col("x")).as("sxx"),
          sum(col("y").cast(dec) * col("y")).as("syy"),
          sum(col("x").cast(dec) * col("y")).as("sxy"))
        .filter(col("n") >= 2)
        .withColumn("r", expr("CAST(sx AS DOUBLE) / CAST(sy AS DOUBLE)"))
        .withColumn("vr", expr(
          // sample (co)variances from exact sums, then the delta form;
          // every subexpression parenthesized so both engines fold the
          // same op order
          "(((CAST(sxx AS DOUBLE) - (CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE)) / CAST(n - 1 AS DOUBLE))" +
            " - (2.0 * r) * ((CAST(sxy AS DOUBLE) - (CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) / CAST(n AS DOUBLE)) / CAST(n - 1 AS DOUBLE))" +
            " + (r * r) * ((CAST(syy AS DOUBLE) - (CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) / CAST(n AS DOUBLE)) / CAST(n - 1 AS DOUBLE)))" +
            " / (CAST(n AS DOUBLE) * ((CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)) * (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))))"))
        .select(col("event_type"), col("arm"), col("n"), col("r"),
          col("vr"), expr("1.96 * sqrt(vr)").as("ci_half"))
        .orderBy("event_type", "arm")
    }),
    "q436_mips_transform" -> ((s, dir) => {
      // maximum-inner-product search via the norm-augmentation reduction
      // (Bachrach et al. '14): append sqrt(M² − |x|²) to every corpus
      // vector and 0 to the query — argmax cosine on the augmented space
      // IS argmax dot on the original. The gate runs both paths (exact
      // dot top-1 vs transformed cosine top-1 through the SAME q45
      // two-phase scorer) and pins agreement per query — the reduction's
      // correctness certificate. Norms are varied first (unit vectors
      // would make the reduction trivially degenerate). Corpus scans
      // twice, queries broadcast; never a matrix.
      val emb = T(s, dir, "embeddings")
        .select(col("vec_id"), expr(
          "transform(embedding, v -> CAST(v AS DOUBLE) * ((1 + (vec_id % 5)) / 5.0))")
          .as("embedding"))
        .localCheckpoint() // two scoring passes over a frozen frame
      val qs = emb.filter(col("vec_id") < 8)
      // exact MIPS: brute-force dot (queries broadcast over one scan)
      val dot = "aggregate(zip_with(%s, %s, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
      val exact = emb.crossJoin(broadcast(
        qs.select(col("vec_id").as("qid"), col("embedding").as("qe"))))
        .filter(col("vec_id") =!= col("qid"))
        .select(col("qid"), col("vec_id"),
          round(expr(dot.format("embedding", "qe")), 6).as("ip"))
        .groupBy(col("qid"))
        .agg(max(struct(col("ip"), (-col("vec_id")).as("negid"))).as("m"))
        .select(col("qid"), (-col("m.negid")).as("exact_id"))
      // transformed path: augment corpus with sqrt(M^2 - |x|^2), query with 0
      val m2 = emb.select(expr(s"max(${dot.format("embedding", "embedding")})").as("m2"))
      val aug = emb.crossJoin(broadcast(m2))
        .select(col("vec_id"), expr(
          s"concat(embedding, array(sqrt(m2 - (${dot.format("embedding", "embedding")}))))")
          .as("embedding"))
      val augQ = qs.select(col("vec_id"),
        expr("concat(embedding, array(CAST(0.0 AS DOUBLE)))").as("embedding"))
      val viaCos = ops.Similarity.cosineTopK(aug, augQ, "vec_id", "embedding", 1)
        .select(col("query_id").as("qid"), col("neighbor_id").as("mips_id"))
      exact.join(viaCos, Seq("qid"))
        .select(col("qid"), col("exact_id"), col("mips_id"),
          (col("exact_id") === col("mips_id")).as("agree"))
        .orderBy("qid")
    }),
    "q437_simpson_flags" -> ((s, dir) => {
      // Simpson's-paradox detector: per market segment, does the
      // within-stratum (acctbal, order count) association point the OTHER
      // way from the pooled one? The decision rides EXACT integer
      // covariance numerators n·Σxy − Σx·Σy (decimal(38) — n·Σxy tops
      // int64 at sf1); the surfaced magnitude is the numerator cast to
      // double (same integer → same double both engines). One customer
      // aggregate, one 5-row stratum rollup, pooled from the same sums.
      val cust = T(s, dir, "customer")
        .join(T(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_custkey"), col("c_mktsegment"))
        .agg(min(expr("CAST(round(c_acctbal * 100, 0) AS BIGINT)")).as("x"),
          count(col("o_orderkey")).as("y"))
      val dec = "decimal(38,0)"
      val per = cust.groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"), sum(col("y")).as("sy"),
          sum(col("x").cast(dec) * col("y")).as("sxy"))
        .withColumn("cov_num", expr(s"CAST(n AS $dec) * sxy - CAST(sx AS $dec) * sy"))
      val pooled = cust.groupBy()
        .agg(count(lit(1)).as("pn"), sum(col("x")).as("psx"), sum(col("y")).as("psy"),
          sum(col("x").cast(dec) * col("y")).as("psxy"))
        .withColumn("pooled_num", expr(s"CAST(pn AS $dec) * psxy - CAST(psx AS $dec) * psy"))
        .select(col("pooled_num"))
      per.crossJoin(broadcast(pooled))
        .select(col("c_mktsegment"), col("n"),
          signum(col("cov_num").cast("double")).cast("long").as("stratum_sign"),
          signum(col("pooled_num").cast("double")).cast("long").as("pooled_sign"),
          (signum(col("cov_num").cast("double")) =!=
            signum(col("pooled_num").cast("double"))).as("flipped"))
        .orderBy("c_mktsegment")
    }),
    "q438_lof" -> ((s, dir) => {
      // Local Outlier Factor (Breunig '00) over embeddings — DENSITY-
      // relative anomaly detection: a point is outlying iff its local
      // density is low relative to its neighbors', which z-score fences
      // (q90/q147/q371) structurally cannot express. LOF's 3-hop need
      // (kNN of probes, k-dist of their neighbors, k-dist of THOSE
      // neighbors) runs as THREE staged knnL2 batches — each a broadcast-
      // queries/one-corpus-scan pass whose query set is the previous
      // stage's bounded neighbor closure (32 → ≤160+32 → ≤800+), never a
      // corpus self-join. Reach-dist sums fold in (d, id) order over
      // exactly 5 doubles, so lrd and LOF are bit-identical cross-engine.
      import ops.Similarity
      val e = T(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
        .localCheckpoint() // three scoring passes over a frozen frame
      def ids(df: DataFrame, c: String) = df.select(col(c).as("vec_id")).distinct()
      val probes = e.filter(col("vec_id") < 32)
      val nA = Similarity.knnL2(e, probes, "vec_id", "embedding", 5)
        .select(col("query_id").as("q"), col("neighbor_id").as("o"), col("d"))
        .localCheckpoint()
      val e2 = e.join(ids(nA, "q").unionByName(ids(nA, "o")).distinct(), Seq("vec_id"))
      val nB = Similarity.knnL2(e, e2, "vec_id", "embedding", 5)
        .select(col("query_id").as("q"), col("neighbor_id").as("o"), col("d"))
        .localCheckpoint()
      val e3 = e.join(ids(nB, "o"), Seq("vec_id"))
      val kd = Similarity.knnL2(e, e3, "vec_id", "embedding", 5)
        .filter(col("rn") === 5)
        .select(col("query_id").as("vec_id"), col("d").as("kdist"))
      val orderedSum = "aggregate(transform(array_sort(collect_list(" +
        "struct(d, o, rd))), s -> s.rd), CAST(0.0 AS DOUBLE), (a, b) -> a + b)"
      val lrd = nB.join(kd, nB("o") === kd("vec_id"))
        .select(col("q"), col("o"), col("d"), greatest(col("kdist"), col("d")).as("rd"))
        .groupBy(col("q"))
        .agg(expr(s"5.0 / ($orderedSum)").as("lrd"))
        .localCheckpoint() // joined twice below
      nA
        .join(lrd.select(col("q").as("o"), col("lrd").as("rd")), Seq("o"))
        .join(lrd.select(col("q"), col("lrd").as("plrd")), Seq("q"))
        .groupBy(col("q"))
        .agg((expr("aggregate(transform(array_sort(collect_list(struct(d, o, rd))), " +
          "s -> s.rd), CAST(0.0 AS DOUBLE), (a, b) -> a + b)") / lit(5.0) /
          max(col("plrd"))).as("lof"))
        .select(col("q").as("vec_id"), col("lof"))
        .orderBy("vec_id")
    }),
    "q439_cohens_d" -> ((s, dir) => {
      // Cohen's d + Hedges' g per event type — the standardized EFFECT SIZE
      // the q244/q413 test family reports next to its p-value ("significant"
      // is not "large" at 6M rows, where trivial deltas reach p<.05). One
      // hash aggregate to the (type, arm) moment frame (squares on
      // decimal(38) — sum of cents² tops int64 at sf1), then fixed-order
      // double algebra: pooled SD from the two arms' exact sums, g = d ×
      // the small-sample correction — bit-identical cross-engine.
      val dec = "decimal(38,0)"
      val m = T(s, dir, "events")
        .select(col("event_type"),
          expr("CAST(round(value * 100, 0) AS BIGINT)").as("x"),
          pmod(col("user_id"), lit(2L)).as("arm"))
        .groupBy(col("event_type"))
        .agg(sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n1"),
          sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n0"),
          sum(when(col("arm") === 1, col("x")).otherwise(0L)).as("sx1"),
          sum(when(col("arm") === 0, col("x")).otherwise(0L)).as("sx0"),
          sum(when(col("arm") === 1, col("x").cast(dec) * col("x"))
            .otherwise(lit(0).cast(dec))).as("sxx1"),
          sum(when(col("arm") === 0, col("x").cast(dec) * col("x"))
            .otherwise(lit(0).cast(dec))).as("sxx0"))
        .filter(col("n1") >= 2 && col("n0") >= 2)
      m.withColumn("d", expr(
        "((CAST(sx1 AS DOUBLE) / CAST(n1 AS DOUBLE)) - (CAST(sx0 AS DOUBLE) / CAST(n0 AS DOUBLE)))" +
          " / sqrt(((CAST(sxx1 AS DOUBLE) - (CAST(sx1 AS DOUBLE) * CAST(sx1 AS DOUBLE)) / CAST(n1 AS DOUBLE))" +
          " + (CAST(sxx0 AS DOUBLE) - (CAST(sx0 AS DOUBLE) * CAST(sx0 AS DOUBLE)) / CAST(n0 AS DOUBLE)))" +
          " / CAST(n1 + n0 - 2 AS DOUBLE))"))
        .select(col("event_type"), col("n1"), col("n0"), col("d"),
          expr("d * (1.0 - 3.0 / CAST(4 * (n1 + n0) - 9 AS DOUBLE))").as("hedges_g"))
        .orderBy("event_type")
    }),
    "q440_levene_bf" -> ((s, dir) => {
      // Brown-Forsythe (median-centered Levene) variance-homogeneity test
      // per event type — the GATE before q244/q439 trust their pooled-SD
      // assumptions: are the two arms' spreads even comparable? Group
      // medians come from the (type, arm, cents) HISTOGRAM (the q429
      // convention — the 'sort' is a window over the value domain, never
      // rows), doubled (lo+hi order statistics) so even-n medians stay
      // exact integers; |2x − med2| deviations are exact; the one-way F
      // on deviations is fixed-order double algebra from exact moments.
      val ev = T(s, dir, "events")
        .select(col("event_type"),
          expr("CAST(round(value * 100, 0) AS BIGINT)").as("x"),
          pmod(col("user_id"), lit(2L)).as("arm"))
      val hist = ev.groupBy(col("event_type"), col("arm"), col("x"))
        .agg(count(lit(1)).as("c"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("event_type"), col("arm")).orderBy(col("x"))
      val med = hist
        .withColumn("hi", sum(col("c")).over(w))
        .withColumn("lo", col("hi") - col("c") + 1)
        .join(broadcast(ev.groupBy(col("event_type"), col("arm"))
          .agg(count(lit(1)).as("n"))), Seq("event_type", "arm"))
        .groupBy(col("event_type"), col("arm"))
        .agg((sum(when(col("lo") <= expr("(n + 1) div 2")
          && expr("(n + 1) div 2") <= col("hi"), col("x")).otherwise(0L))
          + sum(when(col("lo") <= expr("(n + 2) div 2")
            && expr("(n + 2) div 2") <= col("hi"), col("x")).otherwise(0L)))
          .as("med2"))
      val dec = "decimal(38,0)"
      val z = ev.join(broadcast(med), Seq("event_type", "arm"))
        .select(col("event_type"), col("arm"), abs(expr("2 * x - med2")).as("z"))
      z.groupBy(col("event_type"))
        .agg(sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n1"),
          sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n0"),
          sum(when(col("arm") === 1, col("z")).otherwise(0L)).as("sz1"),
          sum(when(col("arm") === 0, col("z")).otherwise(0L)).as("sz0"),
          sum(when(col("arm") === 1, col("z").cast(dec) * col("z"))
            .otherwise(lit(0).cast(dec))).as("szz1"),
          sum(when(col("arm") === 0, col("z").cast(dec) * col("z"))
            .otherwise(lit(0).cast(dec))).as("szz0"))
        .filter(col("n1") >= 2 && col("n0") >= 2)
        .withColumn("ssw", expr(
          "(CAST(szz1 AS DOUBLE) - (CAST(sz1 AS DOUBLE) * CAST(sz1 AS DOUBLE)) / CAST(n1 AS DOUBLE))" +
            " + (CAST(szz0 AS DOUBLE) - (CAST(sz0 AS DOUBLE) * CAST(sz0 AS DOUBLE)) / CAST(n0 AS DOUBLE))"))
        .withColumn("ssb", expr(
          "CAST(n1 AS DOUBLE) * (((CAST(sz1 AS DOUBLE) / CAST(n1 AS DOUBLE)) - ((CAST(sz1 AS DOUBLE) + CAST(sz0 AS DOUBLE)) / CAST(n1 + n0 AS DOUBLE))) * ((CAST(sz1 AS DOUBLE) / CAST(n1 AS DOUBLE)) - ((CAST(sz1 AS DOUBLE) + CAST(sz0 AS DOUBLE)) / CAST(n1 + n0 AS DOUBLE))))" +
            " + CAST(n0 AS DOUBLE) * (((CAST(sz0 AS DOUBLE) / CAST(n0 AS DOUBLE)) - ((CAST(sz1 AS DOUBLE) + CAST(sz0 AS DOUBLE)) / CAST(n1 + n0 AS DOUBLE))) * ((CAST(sz0 AS DOUBLE) / CAST(n0 AS DOUBLE)) - ((CAST(sz1 AS DOUBLE) + CAST(sz0 AS DOUBLE)) / CAST(n1 + n0 AS DOUBLE))))"))
        .select(col("event_type"), col("n1"), col("n0"),
          expr("CASE WHEN ssw = 0.0 THEN CAST(NULL AS DOUBLE)" +
            " ELSE (ssb * CAST(n1 + n0 - 2 AS DOUBLE)) / ssw END").as("f_bf"))
        .orderBy("event_type")
    }),
    "q441_ordinal_patterns" -> ((s, dir) => {
      // Bandt-Pompe ordinal patterns (order 3) per event-type daily series
      // — the permutation-entropy complexity histogram: each of the 29
      // sliding windows maps to the permutation that sorts its 3 values
      // (ties broken by POSITION, so the pattern is total and exact), and
      // the pattern distribution separates trending / oscillating / noisy
      // series where q176's autocorrelation sees only linear structure.
      // Pure integer outputs: code = 4·[k0<k1] + 2·[k0<k2] + [k1<k2] over
      // (value, position) keys — 6 of 8 codes are realizable. The corpus
      // pays the one daily rollup; patterns explode from the bounded
      // 31-element array.
      val lt = "(%s < %s OR (%s = %s AND %s < %s))" // (value, pos) lexicographic
      def cmp(a: Int, b: Int) =
        lt.format(s"x$a", s"x$b", s"x$a", s"x$b", a.toString, b.toString)
      dailySeries(s, dir, asDouble = false)
        .select(col("event_type"), explode(expr(
          "transform(sequence(1, 29), i -> named_struct(" +
            "'x0', element_at(xs, i), 'x1', element_at(xs, i + 1)," +
            " 'x2', element_at(xs, i + 2)))")).as("w"))
        .select(col("event_type"), col("w.x0").as("x0"), col("w.x1").as("x1"),
          col("w.x2").as("x2"))
        .withColumn("code", expr(
          s"4 * CAST(${cmp(0, 1)} AS INT) + 2 * CAST(${cmp(0, 2)} AS INT)" +
            s" + CAST(${cmp(1, 2)} AS INT)").cast("long"))
        .groupBy(col("event_type"), col("code"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy("event_type", "code")
    })
  )

  val oracleSql: Seq[(String, String)] = Seq(
    "q418_mcnemar" -> {
      val langCase = SparkEntry.langCaseOn("text")
      s"""WITH cls AS (SELECT ($langCase) = lang AS a_ok, lang = 'en' AS b_ok FROM documents),
         |m AS (SELECT
         |  CAST(sum(CASE WHEN a_ok AND b_ok THEN 1 ELSE 0 END) AS BIGINT) AS n11,
         |  CAST(sum(CASE WHEN a_ok AND NOT b_ok THEN 1 ELSE 0 END) AS BIGINT) AS b,
         |  CAST(sum(CASE WHEN NOT a_ok AND b_ok THEN 1 ELSE 0 END) AS BIGINT) AS c,
         |  CAST(sum(CASE WHEN NOT a_ok AND NOT b_ok THEN 1 ELSE 0 END) AS BIGINT) AS n00
         |  FROM cls)
         |SELECT n11, b, c, n00,
         |  CAST(CASE WHEN b + c = 0 THEN 0 ELSE (100 * (b - c) * (b - c)) // (b + c) END AS BIGINT) AS chi2_centi,
         |  (CASE WHEN b + c = 0 THEN 0 ELSE (100 * (b - c) * (b - c)) // (b + c) END) > 384 AS significant
         |FROM m""".stripMargin
    },
    "q419_shapley_attribution" ->
      """WITH u AS (SELECT user_id,
        |    CAST(sum(DISTINCT 1 << (CASE event_type WHEN 'click' THEN 0 WHEN 'error' THEN 1
        |      WHEN 'purchase' THEN 2 WHEN 'signup' THEN 3 ELSE 4 END)) AS BIGINT) AS mask,
        |    max(value) AS mx FROM events GROUP BY 1),
        |obs AS (SELECT mask, count(*) AS cnt FROM u WHERE mx >= 300.0 GROUP BY 1),
        |coal AS (SELECT unnest(range(0, 32)) AS sm),
        |v AS (SELECT sm, CAST(coalesce(sum(cnt), 0) AS BIGINT) AS v
        |  FROM coal LEFT JOIN obs ON (obs.mask & coal.sm) = obs.mask GROUP BY 1),
        |ch AS (SELECT unnest(range(0, 5)) AS ci)
        |SELECT CASE ci WHEN 0 THEN 'click' WHEN 1 THEN 'error' WHEN 2 THEN 'purchase'
        |    WHEN 3 THEN 'signup' ELSE 'view' END AS channel,
        |  CAST(sum((CASE bit_count(vs.sm) WHEN 0 THEN 24 WHEN 1 THEN 6 WHEN 2 THEN 4
        |    WHEN 3 THEN 6 ELSE 24 END) * (vi.v - vs.v)) AS BIGINT) AS shapley_x120
        |FROM ch JOIN v vs ON (vs.sm & (1 << ci)) = 0
        |JOIN v vi ON vi.sm = (vs.sm | (1 << ci))
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q420_pass_at_k" ->
      """WITH g AS (SELECT l_partkey, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS c
        |  FROM lineitem GROUP BY 1 HAVING count(*) >= 10)
        |SELECT l_partkey, n, c,
        |  CASE WHEN n - c < 1 THEN CAST(1.0 AS DOUBLE) ELSE 1.0 - list_reduce(
        |    list_transform(range(0, 1), i -> CAST(n - c - i AS DOUBLE) / CAST(n - i AS DOUBLE)),
        |    (acc, x) -> acc * x) END AS pass_at_1,
        |  CASE WHEN n - c < 5 THEN CAST(1.0 AS DOUBLE) ELSE 1.0 - list_reduce(
        |    list_transform(range(0, 5), i -> CAST(n - c - i AS DOUBLE) / CAST(n - i AS DOUBLE)),
        |    (acc, x) -> acc * x) END AS pass_at_5,
        |  CASE WHEN n - c < 10 THEN CAST(1.0 AS DOUBLE) ELSE 1.0 - list_reduce(
        |    list_transform(range(0, 10), i -> CAST(n - c - i AS DOUBLE) / CAST(n - i AS DOUBLE)),
        |    (acc, x) -> acc * x) END AS pass_at_10
        |FROM g ORDER BY l_partkey""".stripMargin,
    "q421_cusum_control" ->
      """WITH d AS (SELECT event_type, strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS day,
        |    CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS cents
        |  FROM events GROUP BY 1, 2),
        |b AS (SELECT event_type, CAST(sum(cents) AS BIGINT) AS base_sum,
        |    CAST(count(*) AS BIGINT) AS n0
        |  FROM d WHERE day <= '2024-01-10' GROUP BY 1),
        |m AS (SELECT d.event_type, d.day,
        |    CAST(20 * b.n0 * d.cents - 21 * b.base_sum AS BIGINT) AS inc, b.base_sum
        |  FROM d JOIN b ON d.event_type = b.event_type WHERE d.day > '2024-01-10'),
        |p0 AS (SELECT event_type, day, inc, base_sum,
        |    sum(inc) OVER (PARTITION BY event_type ORDER BY day) AS p FROM m),
        |p AS (SELECT event_type, day, inc, base_sum, p,
        |    min(p) OVER (PARTITION BY event_type ORDER BY day) AS mp FROM p0)
        |SELECT event_type, day, inc, CAST(p - least(0, mp) AS BIGINT) AS s_scaled,
        |  (p - least(0, mp)) > 80 * base_sum AS alarm
        |FROM p ORDER BY event_type, day""".stripMargin,
    "q422_decision_stump" ->
      """WITH bins AS (SELECT CAST(round(p_retailprice * 100, 0) AS BIGINT) // 10000 AS bin,
        |    CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CASE WHEN p_size >= 25 THEN 1 ELSE 0 END) AS BIGINT) AS pos
        |  FROM part GROUP BY 1),
        |tot AS (SELECT CAST(sum(n) AS BIGINT) AS nt, CAST(sum(pos) AS BIGINT) AS pt FROM bins),
        |pre AS (SELECT bin,
        |    CAST(sum(n) OVER (ORDER BY bin) AS BIGINT) AS nl,
        |    CAST(sum(pos) OVER (ORDER BY bin) AS BIGINT) AS pl
        |  FROM bins),
        |sc AS (SELECT bin, nl, pl, nt - nl AS nr, pt - pl AS pr,
        |    pl * pl + (nl - pl) * (nl - pl) AS a,
        |    pr * pr + ((nt - nl) - pr) * ((nt - nl) - pr) AS bb
        |  FROM pre, tot WHERE nl < nt)
        |SELECT bin AS split_bin, nl, pl, CAST(nr AS BIGINT) AS nr, CAST(pr AS BIGINT) AS pr,
        |  CAST((CAST(1000000 AS HUGEINT) * (CAST(a AS HUGEINT) * nr + CAST(bb AS HUGEINT) * nl))
        |    // (CAST(nl AS HUGEINT) * nr) AS BIGINT) AS score_ppm
        |FROM sc ORDER BY score_ppm DESC, split_bin LIMIT 10""".stripMargin,
    "q423_uplift_qini" ->
      """WITH u AS (SELECT user_id,
        |    CAST(sum(CASE WHEN strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') <= '2024-01-15'
        |      THEN 1 ELSE 0 END) AS BIGINT) AS score,
        |    CAST(max(CASE WHEN strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') > '2024-01-15'
        |      AND value >= 300.0 THEN 1 ELSE 0 END) AS BIGINT) AS conv,
        |    user_id % 2 AS arm
        |  FROM events GROUP BY user_id),
        |d AS (SELECT *, CAST(ntile(10) OVER (ORDER BY score DESC, user_id) AS BIGINT) AS decile FROM u),
        |g AS (SELECT decile,
        |    CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS nt,
        |    CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS nc,
        |    CAST(sum(CASE WHEN arm = 1 THEN conv ELSE 0 END) AS BIGINT) AS ct,
        |    CAST(sum(CASE WHEN arm = 0 THEN conv ELSE 0 END) AS BIGINT) AS cc
        |  FROM d GROUP BY 1)
        |SELECT decile, nt, nc, ct, cc,
        |  CAST(sum(ct) OVER (ORDER BY decile) * sum(nc) OVER (ORDER BY decile)
        |    - sum(cc) OVER (ORDER BY decile) * sum(nt) OVER (ORDER BY decile) AS BIGINT) AS qini_x
        |FROM g ORDER BY decile""".stripMargin,
    "q424_bleu" ->
      """WITH pr AS (SELECT c.doc_id AS pair_id,
        |    regexp_split_to_array(c.text, ' ') AS ct, regexp_split_to_array(r.text, ' ') AS rt
        |  FROM documents c JOIN documents r ON c.text = r.text || ' dup'),
        |ns AS (SELECT unnest(range(1, 5)) AS n),
        |cg0 AS (SELECT pair_id, n, ct, unnest(range(1, len(ct) - n + 2)) AS i
        |  FROM pr, ns WHERE len(ct) >= n),
        |cg AS (SELECT pair_id, n,
        |    array_to_string(ct[CAST(i AS BIGINT):CAST(i + n - 1 AS BIGINT)], ' ') AS g,
        |    count(*) AS cnt FROM cg0 GROUP BY 1, 2, 3),
        |rg0 AS (SELECT pair_id, n, rt, unnest(range(1, len(rt) - n + 2)) AS i
        |  FROM pr, ns WHERE len(rt) >= n),
        |rg AS (SELECT pair_id, n,
        |    array_to_string(rt[CAST(i AS BIGINT):CAST(i + n - 1 AS BIGINT)], ' ') AS g,
        |    count(*) AS rcnt FROM rg0 GROUP BY 1, 2, 3),
        |mm AS (SELECT cg.n, CAST(coalesce(sum(least(cg.cnt, rg.rcnt)), 0) AS BIGINT) AS m
        |  FROM cg JOIN rg ON cg.pair_id = rg.pair_id AND cg.n = rg.n AND cg.g = rg.g
        |  GROUP BY 1),
        |tt AS (SELECT n, CAST(sum(cnt) AS BIGINT) AS tot FROM cg GROUP BY 1),
        |agg AS (SELECT
        |    max(CASE WHEN n = 1 THEN coalesce(m, 0) END) AS match1, max(CASE WHEN n = 1 THEN tot END) AS total1,
        |    max(CASE WHEN n = 2 THEN coalesce(m, 0) END) AS match2, max(CASE WHEN n = 2 THEN tot END) AS total2,
        |    max(CASE WHEN n = 3 THEN coalesce(m, 0) END) AS match3, max(CASE WHEN n = 3 THEN tot END) AS total3,
        |    max(CASE WHEN n = 4 THEN coalesce(m, 0) END) AS match4, max(CASE WHEN n = 4 THEN tot END) AS total4
        |  FROM tt LEFT JOIN mm USING (n)),
        |ln2 AS (SELECT CAST(sum(len(ct)) AS BIGINT) AS c_len, CAST(sum(len(rt)) AS BIGINT) AS r_len FROM pr)
        |SELECT match1, total1, match2, total2, match3, total3, match4, total4,
        |  (CASE WHEN c_len >= r_len THEN CAST(1.0 AS DOUBLE)
        |    ELSE exp(1.0 - CAST(r_len AS DOUBLE) / CAST(c_len AS DOUBLE)) END) *
        |  sqrt(sqrt((CAST(match1 AS DOUBLE) / CAST(total1 AS DOUBLE)) *
        |    (CAST(match2 AS DOUBLE) / CAST(total2 AS DOUBLE)) *
        |    (CAST(match3 AS DOUBLE) / CAST(total3 AS DOUBLE)) *
        |    (CAST(match4 AS DOUBLE) / CAST(total4 AS DOUBLE)))) AS bleu
        |FROM agg, ln2""".stripMargin,
    "q425_sort_for_compression" -> {
      def runsSql(keyExpr: String, keyName: String) =
        s"""SELECT '$keyName' AS sort_key,
           |  CAST(sum(CASE WHEN pp IS NULL OR pp <> l_partkey THEN 1 ELSE 0 END) AS BIGINT) AS runs_partkey,
           |  CAST(sum(CASE WHEN ps IS NULL OR ps <> l_suppkey THEN 1 ELSE 0 END) AS BIGINT) AS runs_suppkey,
           |  CAST(sum(CASE WHEN pf IS NULL OR pf <> l_returnflag THEN 1 ELSE 0 END) AS BIGINT) AS runs_returnflag,
           |  CAST(sum(CASE WHEN pl IS NULL OR pl <> l_linestatus THEN 1 ELSE 0 END) AS BIGINT) AS runs_linestatus
           |FROM (SELECT l_partkey, l_suppkey, l_returnflag, l_linestatus,
           |  lag(l_partkey) OVER w AS pp, lag(l_suppkey) OVER w AS ps,
           |  lag(l_returnflag) OVER w AS pf, lag(l_linestatus) OVER w AS pl
           |  FROM (SELECT *, $keyExpr AS __k, l_orderkey // 4096 AS __b FROM lineitem)
           |  WINDOW w AS (PARTITION BY __k, __b
           |    ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey, l_returnflag, l_linestatus))""".stripMargin
      Seq(
        runsSql("CAST(l_returnflag AS VARCHAR)", "l_returnflag"),
        runsSql("CAST(l_linestatus AS VARCHAR)", "l_linestatus"),
        runsSql("strftime(CAST(l_shipdate AS TIMESTAMP), '%Y-%m')", "ship_month"))
        .mkString("", "\nUNION ALL\n", "\nORDER BY sort_key")
    },
    "q426_hierarchy_paths" ->
      """WITH RECURSIVE e AS (
        |  SELECT 'c:' || c_custkey AS node, 'n:' || c_nationkey AS parent FROM customer
        |  UNION ALL SELECT 'n:' || n_nationkey, 'r:' || n_regionkey FROM nation
        |  UNION ALL SELECT 'r:' || r_regionkey, NULL FROM region),
        |rec AS (
        |  SELECT node, node AS cur, 0 AS depth, node AS path FROM e
        |  UNION ALL
        |  SELECT r.node, e.parent, r.depth + 1, r.path || '/' || e.parent
        |  FROM rec r JOIN e ON e.node = r.cur WHERE e.parent IS NOT NULL)
        |SELECT r.node, r.cur AS root, CAST(r.depth AS BIGINT) AS depth, r.path
        |FROM rec r JOIN e t ON t.node = r.cur
        |WHERE t.parent IS NULL ORDER BY r.node""".stripMargin,
    "q427_policy_mask" ->
      """SELECT * FROM (
        |  SELECT 'admin' AS role, c_custkey, c_name, c_acctbal, c_mktsegment FROM customer
        |  UNION ALL
        |  SELECT 'analyst', c_custkey, substr(c_name, 1, 9) || '***',
        |    CAST(NULL AS DOUBLE), c_mktsegment
        |  FROM customer WHERE c_mktsegment <> 'AUTOMOBILE'
        |  UNION ALL
        |  SELECT 'support', c_custkey, md5(c_name), c_acctbal, c_mktsegment FROM customer)
        |ORDER BY role, c_custkey""".stripMargin,
    "q428_merkle_ranges" ->
      """WITH rows0 AS (SELECT o_orderkey AS k,
        |    CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents, o_orderstatus
        |  FROM orders),
        |b AS (SELECT k, md5(k || '|' || cents || '|' || o_orderstatus) AS rh FROM rows0),
        |c AS (SELECT k, md5(k || '|' ||
        |    (CASE WHEN k % 997 = 0 THEN cents + 100 ELSE cents END) || '|' || o_orderstatus) AS rh
        |  FROM rows0 WHERE k % 1009 <> 0),
        |b0 AS (SELECT k // 512 AS node_id, md5(string_agg(rh, '' ORDER BY k)) AS h, 0 AS level FROM b GROUP BY 1),
        |b1 AS (SELECT node_id // 32 AS node_id, md5(string_agg(h, '' ORDER BY node_id)) AS h, 1 AS level FROM b0 GROUP BY 1),
        |b2 AS (SELECT CAST(0 AS BIGINT) AS node_id, md5(string_agg(h, '' ORDER BY node_id)) AS h, 2 AS level FROM b1),
        |c0 AS (SELECT k // 512 AS node_id, md5(string_agg(rh, '' ORDER BY k)) AS h, 0 AS level FROM c GROUP BY 1),
        |c1 AS (SELECT node_id // 32 AS node_id, md5(string_agg(h, '' ORDER BY node_id)) AS h, 1 AS level FROM c0 GROUP BY 1),
        |c2 AS (SELECT CAST(0 AS BIGINT) AS node_id, md5(string_agg(h, '' ORDER BY node_id)) AS h, 2 AS level FROM c1),
        |bt AS (SELECT * FROM b0 UNION ALL SELECT * FROM b1 UNION ALL SELECT * FROM b2),
        |ct AS (SELECT * FROM c0 UNION ALL SELECT * FROM c1 UNION ALL SELECT * FROM c2)
        |SELECT CAST(coalesce(bt.level, ct.level) AS BIGINT) AS level,
        |  CAST(coalesce(bt.node_id, ct.node_id) AS BIGINT) AS node_id,
        |  bt.h AS base_h, ct.h AS cur_h
        |FROM bt FULL OUTER JOIN ct ON bt.level = ct.level AND bt.node_id = ct.node_id
        |WHERE bt.h IS DISTINCT FROM ct.h
        |ORDER BY level DESC, node_id""".stripMargin,
    "q429_mannwhitney_u" ->
      """WITH e AS (SELECT event_type, CAST(round(value * 100, 0) AS BIGINT) AS cents,
        |    user_id % 2 AS arm FROM events),
        |g AS (SELECT event_type, cents, CAST(count(*) AS BIGINT) AS t,
        |    CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS t1
        |  FROM e GROUP BY 1, 2),
        |r AS (SELECT *, coalesce(sum(t) OVER (PARTITION BY event_type ORDER BY cents
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS s FROM g),
        |p AS (SELECT event_type, CAST(sum(t1 * (2 * s + t + 1)) AS BIGINT) AS r1_2,
        |    CAST(sum(t1) AS BIGINT) AS n1, CAST(sum(t - t1) AS BIGINT) AS n2
        |  FROM r GROUP BY 1)
        |SELECT event_type, n1, n2, CAST(r1_2 - n1 * (n1 + 1) AS BIGINT) AS u2,
        |  CAST((CAST(1000000 AS HUGEINT) * (r1_2 - n1 * (n1 + 1)))
        |    // (CAST(n1 AS HUGEINT) * n2) AS BIGINT) AS rb_plus1_ppm
        |FROM p ORDER BY event_type""".stripMargin,
    "q430_kcenter_seeds" -> {
      // 7 chained MATERIALIZED greedy rounds (the q416/q422 oracle
      // technique); dist^2 via the same dot identity, rounded 6dp before
      // the (d DESC, vec_id) argmax
      val rounds = new StringBuilder(
        "c0 AS MATERIALIZED (SELECT 0 AS r, CAST(0 AS BIGINT) AS cid, CAST(NULL AS DOUBLE) AS radius)")
      (1 to 7).foreach { r =>
        val prev = (0 until r).map(i => s"SELECT cid FROM c$i").mkString(" UNION ALL ")
        rounds.append(
          s""",
             |d$r AS MATERIALIZED (SELECT p.vec_id, min((round(
             |    list_dot_product(CAST(p.embedding AS DOUBLE[]), CAST(p.embedding AS DOUBLE[]))
             |    - 2 * list_dot_product(CAST(p.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[]))
             |    + list_dot_product(CAST(c.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])), 6) + 0.0)) AS d
             |  FROM embeddings p CROSS JOIN (SELECT e.embedding FROM embeddings e
             |    WHERE e.vec_id IN ($prev)) c GROUP BY 1),
             |c$r AS MATERIALIZED (SELECT $r AS r, vec_id AS cid, d AS radius FROM d$r
             |  ORDER BY d DESC, vec_id LIMIT 1)""".stripMargin)
      }
      val union = (0 to 7).map(i => s"SELECT * FROM c$i").mkString(" UNION ALL ")
      s"""WITH ${rounds.result()}
         |SELECT CAST(r AS BIGINT) AS r, cid, (radius + 0.0) AS radius
         |FROM ($union) ORDER BY r""".stripMargin
    },
    "q431_dtw_distance" ->
      // row-major linearized DP: one recursive CTE step per cell, state =
      // (prev row P, current row N) as BIGINT lists; 31*31 steps per pair.
      // (The engine folds the same grid via nested aggregate() lambdas —
      // DuckDB's list_reduce cannot carry a list accumulator, hence the
      // linearization here.)
      """WITH RECURSIVE d AS (
        |  SELECT event_type, CAST(strftime(CAST(ts AS TIMESTAMP), '%d') AS BIGINT) AS day,
        |    count(*) AS x FROM events GROUP BY 1, 2),
        |cal AS (SELECT unnest(range(1, 32)) AS day),
        |types AS (SELECT DISTINCT event_type FROM d),
        |dense AS (SELECT t.event_type, c.day, coalesce(d.x, 0) AS x
        |  FROM types t CROSS JOIN cal c
        |  LEFT JOIN d ON d.event_type = t.event_type AND d.day = c.day),
        |ser AS (SELECT event_type, list(x ORDER BY day) AS xs FROM dense GROUP BY 1),
        |pairs AS (SELECT a.event_type AS ta, b.event_type AS tb, a.xs AS xa, b.xs AS xb
        |  FROM ser a JOIN ser b ON a.event_type < b.event_type),
        |rec AS (
        |  SELECT ta, tb, xa, xb, CAST(1 AS BIGINT) AS s,
        |    CAST([] AS BIGINT[]) AS p,
        |    CAST([abs(xa[1] - xb[1])] AS BIGINT[]) AS n
        |  FROM pairs
        |  UNION ALL
        |  SELECT ta, tb, xa, xb, s + 1,
        |    CASE WHEN (s % 31) = 0 THEN n ELSE p END,
        |    CASE WHEN (s % 31) = 0
        |      THEN [CASE WHEN abs((s // 31 + 1) - 1) <= 3
        |        THEN abs(xa[CAST(s // 31 + 1 AS BIGINT)] - xb[1]) + n[1]
        |        ELSE 1000000000000000 END]
        |      ELSE n || [CASE WHEN abs((s // 31 + 1) - (s % 31 + 1)) <= 3
        |        THEN abs(xa[CAST(s // 31 + 1 AS BIGINT)] - xb[CAST(s % 31 + 1 AS BIGINT)]) +
        |          least(CASE WHEN s // 31 = 0 THEN 1000000000000000 ELSE p[CAST(s % 31 + 1 AS BIGINT)] END,
        |                CASE WHEN s // 31 = 0 OR s % 31 = 0 THEN 1000000000000000 ELSE p[CAST(s % 31 AS BIGINT)] END,
        |                n[CAST(s % 31 AS BIGINT)])
        |        ELSE 1000000000000000 END]
        |      END
        |  FROM rec WHERE s < 31 * 31)
        |SELECT ta, tb, n[31] AS dtw FROM rec WHERE s = 31 * 31 ORDER BY ta, tb""".stripMargin,
    "q432_fellegi_sunter" -> {
      def ratioSql(k: Int) =
        s"""CASE WHEN f$k THEN
           |  CASE WHEN mt = 0 OR ut = 0 OR ua$k = 0 THEN CAST(NULL AS DOUBLE)
           |    ELSE (CAST(ma$k AS DOUBLE) / CAST(mt AS DOUBLE)) / (CAST(ua$k AS DOUBLE) / CAST(ut AS DOUBLE)) END
           |ELSE
           |  CASE WHEN mt = 0 OR ut = 0 OR ut = ua$k THEN CAST(NULL AS DOUBLE)
           |    ELSE (CAST(mt - ma$k AS DOUBLE) / CAST(mt AS DOUBLE)) / (CAST(ut - ua$k AS DOUBLE) / CAST(ut AS DOUBLE)) END
           |END""".stripMargin
      s"""WITH d AS (SELECT doc_id, text, lang, source, n_chars, n_chars // 25 AS bucket
         |  FROM documents WHERE doc_id < 400),
         |cands AS (SELECT a.lang = b.lang AS f1, a.source = b.source AS f2,
         |    abs(a.n_chars - b.n_chars) <= 4 AS f3,
         |    b.text = a.text || ' dup' AS is_match
         |  FROM d a JOIN d b ON a.bucket = b.bucket AND a.doc_id < b.doc_id),
         |g AS (SELECT
         |    CAST(sum(CASE WHEN is_match THEN 1 ELSE 0 END) AS BIGINT) AS mt,
         |    CAST(sum(CASE WHEN NOT is_match THEN 1 ELSE 0 END) AS BIGINT) AS ut,
         |    CAST(sum(CASE WHEN is_match AND f1 THEN 1 ELSE 0 END) AS BIGINT) AS ma1,
         |    CAST(sum(CASE WHEN NOT is_match AND f1 THEN 1 ELSE 0 END) AS BIGINT) AS ua1,
         |    CAST(sum(CASE WHEN is_match AND f2 THEN 1 ELSE 0 END) AS BIGINT) AS ma2,
         |    CAST(sum(CASE WHEN NOT is_match AND f2 THEN 1 ELSE 0 END) AS BIGINT) AS ua2,
         |    CAST(sum(CASE WHEN is_match AND f3 THEN 1 ELSE 0 END) AS BIGINT) AS ma3,
         |    CAST(sum(CASE WHEN NOT is_match AND f3 THEN 1 ELSE 0 END) AS BIGINT) AS ua3
         |  FROM cands)
         |SELECT f1, f2, f3, CAST(count(*) AS BIGINT) AS n_pairs,
         |  CAST(sum(CASE WHEN is_match THEN 1 ELSE 0 END) AS BIGINT) AS n_match,
         |  ((${ratioSql(1)}) * (${ratioSql(2)})) * (${ratioSql(3)}) AS weight
         |FROM cands, g GROUP BY f1, f2, f3, mt, ut, ma1, ua1, ma2, ua2, ma3, ua3
         |ORDER BY f1, f2, f3""".stripMargin
    },
    "q433_holt_winters" ->
      """WITH RECURSIVE d AS (
        |  SELECT event_type, CAST(strftime(CAST(ts AS TIMESTAMP), '%d') AS BIGINT) AS day,
        |    count(*) AS x FROM events GROUP BY 1, 2),
        |cal AS (SELECT unnest(range(1, 32)) AS day),
        |types AS (SELECT DISTINCT event_type FROM d),
        |dense AS (SELECT t.event_type, c.day, CAST(coalesce(d.x, 0) AS DOUBLE) AS x
        |  FROM types t CROSS JOIN cal c
        |  LEFT JOIN d ON d.event_type = t.event_type AND d.day = c.day),
        |ser AS (SELECT event_type, list(x ORDER BY day) AS xs FROM dense GROUP BY 1),
        |init AS (SELECT event_type, xs,
        |    (xs[1] + xs[2] + xs[3] + xs[4] + xs[5] + xs[6] + xs[7]) / 7.0 AS m1,
        |    (xs[8] + xs[9] + xs[10] + xs[11] + xs[12] + xs[13] + xs[14]) / 7.0 AS m2
        |  FROM ser),
        |rec AS (
        |  SELECT event_type, xs, CAST(7 AS BIGINT) AS t, m1 AS lvl, (m2 - m1) / 7.0 AS tr,
        |    [xs[1] - m1, xs[2] - m1, xs[3] - m1, xs[4] - m1, xs[5] - m1, xs[6] - m1, xs[7] - m1] AS s
        |  FROM init
        |  UNION ALL
        |  SELECT event_type, xs, t + 1,
        |    0.3 * (xs[CAST(t + 1 AS BIGINT)] - s[1]) + 0.7 * (lvl + tr),
        |    0.1 * ((0.3 * (xs[CAST(t + 1 AS BIGINT)] - s[1]) + 0.7 * (lvl + tr)) - lvl) + 0.9 * tr,
        |    s[2:7] || [0.2 * (xs[CAST(t + 1 AS BIGINT)] - (0.3 * (xs[CAST(t + 1 AS BIGINT)] - s[1]) + 0.7 * (lvl + tr))) + 0.8 * s[1]]
        |  FROM rec WHERE t < 31)
        |SELECT event_type, (round(lvl, 4) + 0.0) AS level, (round(tr, 4) + 0.0) AS trend,
        |  (round(lvl + tr + s[1], 4) + 0.0) AS forecast
        |FROM rec WHERE t = 31 ORDER BY event_type""".stripMargin,
    "q434_theilsen_slope" ->
      """WITH d AS (SELECT event_type, CAST(strftime(CAST(ts AS TIMESTAMP), '%d') AS BIGINT) AS day,
        |    count(*) AS x FROM events GROUP BY 1, 2),
        |cal AS (SELECT unnest(range(1, 32)) AS day),
        |types AS (SELECT DISTINCT event_type FROM d),
        |dense AS (SELECT t.event_type, c.day AS i, coalesce(d.x, 0) AS x
        |  FROM types t CROSS JOIN cal c
        |  LEFT JOIN d ON d.event_type = t.event_type AND d.day = c.day),
        |p AS (SELECT a.event_type, a.i AS i, b.i AS j,
        |    CAST(floor(1000000 * (CAST(b.x - a.x AS DOUBLE) / CAST(b.i - a.i AS DOUBLE))) AS BIGINT) AS slope_q
        |  FROM dense a JOIN dense b ON a.event_type = b.event_type AND a.i < b.i),
        |r AS (SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY slope_q, i, j) AS rn,
        |    count(*) OVER (PARTITION BY event_type) AS np FROM p)
        |SELECT event_type, CAST(np AS BIGINT) AS n_pairs, slope_q AS median_slope_q
        |FROM r WHERE rn = CAST(ceil(np / 2.0) AS BIGINT) ORDER BY event_type""".stripMargin,
    "q435_delta_method_ci" ->
      """WITH u AS (SELECT event_type, user_id % 2 AS arm, user_id,
        |    CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS x,
        |    CAST(count(*) AS BIGINT) AS y
        |  FROM events GROUP BY 1, 2, 3),
        |g AS (SELECT event_type, CAST(arm AS BIGINT) AS arm, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |    sum(CAST(x AS HUGEINT) * x) AS sxx, sum(CAST(y AS HUGEINT) * y) AS syy,
        |    sum(CAST(x AS HUGEINT) * y) AS sxy
        |  FROM u GROUP BY 1, 2 HAVING count(*) >= 2),
        |v AS (SELECT *, CAST(sx AS DOUBLE) / CAST(sy AS DOUBLE) AS r FROM g),
        |w AS (SELECT *,
        |    (((CAST(sxx AS DOUBLE) - (CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE)) / CAST(n - 1 AS DOUBLE))
        |     - (2.0 * r) * ((CAST(sxy AS DOUBLE) - (CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) / CAST(n AS DOUBLE)) / CAST(n - 1 AS DOUBLE))
        |     + (r * r) * ((CAST(syy AS DOUBLE) - (CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) / CAST(n AS DOUBLE)) / CAST(n - 1 AS DOUBLE)))
        |    / (CAST(n AS DOUBLE) * ((CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)) * (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)))) AS vr
        |  FROM v)
        |SELECT event_type, arm, n, r, vr, 1.96 * sqrt(vr) AS ci_half
        |FROM w ORDER BY event_type, arm""".stripMargin,
    "q436_mips_transform" ->
      """WITH e AS (SELECT vec_id,
        |    list_transform(embedding, v -> CAST(v AS DOUBLE) * ((1 + (vec_id % 5)) / 5.0)) AS emb
        |  FROM embeddings),
        |q AS (SELECT vec_id AS qid, emb AS qe FROM e WHERE vec_id < 8),
        |ex AS (SELECT qid, e.vec_id, (round(list_dot_product(emb, qe), 6) + 0.0) AS ip
        |  FROM e CROSS JOIN q WHERE e.vec_id <> qid),
        |exr AS (SELECT qid, vec_id,
        |    row_number() OVER (PARTITION BY qid ORDER BY ip DESC, vec_id) AS rn FROM ex),
        |exact AS (SELECT qid, vec_id AS exact_id FROM exr WHERE rn = 1),
        |m2 AS (SELECT max(list_dot_product(emb, emb)) AS m2 FROM e),
        |aug AS (SELECT vec_id, emb || [sqrt(m2.m2 - list_dot_product(emb, emb))] AS emb
        |  FROM e, m2),
        |augq AS (SELECT vec_id AS qid, emb || [CAST(0.0 AS DOUBLE)] AS qe
        |  FROM e WHERE vec_id < 8),
        |cosd AS (SELECT qid, a.vec_id,
        |    list_dot_product(a.emb, qe) /
        |      (sqrt(list_dot_product(a.emb, a.emb)) * sqrt(list_dot_product(qe, qe))) AS cosine
        |  FROM aug a CROSS JOIN augq WHERE a.vec_id <> qid),
        |cosr AS (SELECT qid, vec_id,
        |    row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, vec_id) AS rn FROM cosd),
        |mips AS (SELECT qid, vec_id AS mips_id FROM cosr WHERE rn = 1)
        |SELECT exact.qid, exact_id, mips_id, exact_id = mips_id AS agree
        |FROM exact JOIN mips ON exact.qid = mips.qid ORDER BY exact.qid""".stripMargin,
    "q437_simpson_flags" ->
      """WITH cust AS (SELECT c_custkey, c_mktsegment,
        |    min(CAST(round(c_acctbal * 100, 0) AS BIGINT)) AS x,
        |    CAST(count(o_orderkey) AS BIGINT) AS y
        |  FROM customer LEFT JOIN orders ON c_custkey = o_custkey GROUP BY 1, 2),
        |per AS (SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |    sum(CAST(x AS HUGEINT) * y) AS sxy
        |  FROM cust GROUP BY 1),
        |per2 AS (SELECT *, CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy AS cov_num FROM per),
        |pooled AS (SELECT CAST(count(*) AS BIGINT) AS pn, CAST(sum(x) AS BIGINT) AS psx,
        |    CAST(sum(y) AS BIGINT) AS psy, sum(CAST(x AS HUGEINT) * y) AS psxy FROM cust),
        |pooled2 AS (SELECT CAST(pn AS HUGEINT) * psxy - CAST(psx AS HUGEINT) * psy AS pooled_num FROM pooled)
        |SELECT c_mktsegment, n,
        |  CAST(sign(CAST(cov_num AS DOUBLE)) AS BIGINT) AS stratum_sign,
        |  CAST(sign(CAST(pooled_num AS DOUBLE)) AS BIGINT) AS pooled_sign,
        |  sign(CAST(cov_num AS DOUBLE)) <> sign(CAST(pooled_num AS DOUBLE)) AS flipped
        |FROM per2, pooled2 ORDER BY c_mktsegment""".stripMargin,
    "q438_lof" ->
      // the same three staged kNN closures; reach/lrd folds via
      // list(... ORDER BY d, o) + list_reduce (left fold = the engine's
      // aggregate() with a 0.0 seed — 0.0 + x is exact)
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |probes AS (SELECT vec_id, v FROM e WHERE vec_id < 32),
        |dA AS (SELECT p.vec_id AS q, c.vec_id AS o, (round(
        |    list_dot_product(p.v, p.v) - 2 * list_dot_product(p.v, c.v) + list_dot_product(c.v, c.v), 6) + 0.0) AS d
        |  FROM probes p CROSS JOIN e c WHERE c.vec_id <> p.vec_id),
        |rA AS (SELECT *, row_number() OVER (PARTITION BY q ORDER BY d, o) AS rn FROM dA),
        |nA AS (SELECT q, o, d FROM rA WHERE rn <= 5),
        |q2 AS (SELECT DISTINCT vec_id FROM (SELECT q AS vec_id FROM nA UNION ALL SELECT o FROM nA)),
        |e2 AS (SELECT e.vec_id, v FROM e JOIN q2 USING (vec_id)),
        |dB AS (SELECT p.vec_id AS q, c.vec_id AS o, (round(
        |    list_dot_product(p.v, p.v) - 2 * list_dot_product(p.v, c.v) + list_dot_product(c.v, c.v), 6) + 0.0) AS d
        |  FROM e2 p CROSS JOIN e c WHERE c.vec_id <> p.vec_id),
        |rB AS (SELECT *, row_number() OVER (PARTITION BY q ORDER BY d, o) AS rn FROM dB),
        |nB AS (SELECT q, o, d FROM rB WHERE rn <= 5),
        |q3 AS (SELECT DISTINCT o AS vec_id FROM nB),
        |e3 AS (SELECT e.vec_id, v FROM e JOIN q3 USING (vec_id)),
        |dC AS (SELECT p.vec_id AS q, c.vec_id AS o, (round(
        |    list_dot_product(p.v, p.v) - 2 * list_dot_product(p.v, c.v) + list_dot_product(c.v, c.v), 6) + 0.0) AS d
        |  FROM e3 p CROSS JOIN e c WHERE c.vec_id <> p.vec_id),
        |rC AS (SELECT q, d, row_number() OVER (PARTITION BY q ORDER BY d, o) AS rn FROM dC),
        |kd AS (SELECT q AS vec_id, d AS kdist FROM rC WHERE rn = 5),
        |reach AS (SELECT nB.q, nB.o, nB.d, greatest(kd.kdist, nB.d) AS rd
        |  FROM nB JOIN kd ON kd.vec_id = nB.o),
        |lrd AS (SELECT q AS vec_id,
        |    5.0 / list_reduce(list(rd ORDER BY d, o), (a, b) -> a + b) AS lrd
        |  FROM reach GROUP BY q),
        |lof AS (SELECT nA.q, (list_reduce(list(lo.lrd ORDER BY nA.d, nA.o), (a, b) -> a + b) / 5.0)
        |      / max(lp.lrd) AS lof
        |  FROM nA JOIN lrd lo ON lo.vec_id = nA.o JOIN lrd lp ON lp.vec_id = nA.q
        |  GROUP BY nA.q)
        |SELECT q AS vec_id, lof FROM lof ORDER BY vec_id""".stripMargin,
    "q439_cohens_d" ->
      """WITH m AS (SELECT event_type,
        |    CAST(sum(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
        |    CAST(sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
        |    CAST(sum(CASE WHEN user_id % 2 = 1 THEN CAST(round(value * 100, 0) AS BIGINT) ELSE 0 END) AS BIGINT) AS sx1,
        |    CAST(sum(CASE WHEN user_id % 2 = 0 THEN CAST(round(value * 100, 0) AS BIGINT) ELSE 0 END) AS BIGINT) AS sx0,
        |    sum(CASE WHEN user_id % 2 = 1 THEN CAST(CAST(round(value * 100, 0) AS BIGINT) AS HUGEINT) * CAST(round(value * 100, 0) AS BIGINT) ELSE 0 END) AS sxx1,
        |    sum(CASE WHEN user_id % 2 = 0 THEN CAST(CAST(round(value * 100, 0) AS BIGINT) AS HUGEINT) * CAST(round(value * 100, 0) AS BIGINT) ELSE 0 END) AS sxx0
        |  FROM events GROUP BY 1
        |  HAVING sum(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END) >= 2
        |    AND sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) >= 2),
        |d AS (SELECT *,
        |    ((CAST(sx1 AS DOUBLE) / CAST(n1 AS DOUBLE)) - (CAST(sx0 AS DOUBLE) / CAST(n0 AS DOUBLE)))
        |    / sqrt(((CAST(sxx1 AS DOUBLE) - (CAST(sx1 AS DOUBLE) * CAST(sx1 AS DOUBLE)) / CAST(n1 AS DOUBLE))
        |    + (CAST(sxx0 AS DOUBLE) - (CAST(sx0 AS DOUBLE) * CAST(sx0 AS DOUBLE)) / CAST(n0 AS DOUBLE)))
        |    / CAST(n1 + n0 - 2 AS DOUBLE)) AS d
        |  FROM m)
        |SELECT event_type, n1, n0, d,
        |  d * (1.0 - 3.0 / CAST(4 * (n1 + n0) - 9 AS DOUBLE)) AS hedges_g
        |FROM d ORDER BY event_type""".stripMargin,
    "q440_levene_bf" ->
      """WITH ev AS (SELECT event_type, CAST(round(value * 100, 0) AS BIGINT) AS x,
        |    user_id % 2 AS arm FROM events),
        |hist AS (SELECT event_type, arm, x, CAST(count(*) AS BIGINT) AS c
        |  FROM ev GROUP BY 1, 2, 3),
        |np AS (SELECT event_type, arm, CAST(count(*) AS BIGINT) AS n FROM ev GROUP BY 1, 2),
        |cum AS (SELECT *, sum(c) OVER (PARTITION BY event_type, arm ORDER BY x) AS hi FROM hist),
        |cum2 AS (SELECT *, hi - c + 1 AS lo FROM cum),
        |med AS (SELECT cum2.event_type, cum2.arm,
        |    CAST(sum(CASE WHEN lo <= (n + 1) // 2 AND (n + 1) // 2 <= hi THEN x ELSE 0 END)
        |      + sum(CASE WHEN lo <= (n + 2) // 2 AND (n + 2) // 2 <= hi THEN x ELSE 0 END) AS BIGINT) AS med2
        |  FROM cum2 JOIN np ON np.event_type = cum2.event_type AND np.arm = cum2.arm
        |  GROUP BY 1, 2),
        |z AS (SELECT ev.event_type, ev.arm, abs(2 * x - med2) AS z
        |  FROM ev JOIN med ON med.event_type = ev.event_type AND med.arm = ev.arm),
        |g AS (SELECT event_type,
        |    CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
        |    CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
        |    CAST(sum(CASE WHEN arm = 1 THEN z ELSE 0 END) AS BIGINT) AS sz1,
        |    CAST(sum(CASE WHEN arm = 0 THEN z ELSE 0 END) AS BIGINT) AS sz0,
        |    sum(CASE WHEN arm = 1 THEN CAST(z AS HUGEINT) * z ELSE 0 END) AS szz1,
        |    sum(CASE WHEN arm = 0 THEN CAST(z AS HUGEINT) * z ELSE 0 END) AS szz0
        |  FROM z GROUP BY 1
        |  HAVING sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) >= 2
        |    AND sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) >= 2),
        |f AS (SELECT *,
        |    (CAST(szz1 AS DOUBLE) - (CAST(sz1 AS DOUBLE) * CAST(sz1 AS DOUBLE)) / CAST(n1 AS DOUBLE))
        |    + (CAST(szz0 AS DOUBLE) - (CAST(sz0 AS DOUBLE) * CAST(sz0 AS DOUBLE)) / CAST(n0 AS DOUBLE)) AS ssw,
        |    CAST(n1 AS DOUBLE) * (((CAST(sz1 AS DOUBLE) / CAST(n1 AS DOUBLE)) - ((CAST(sz1 AS DOUBLE) + CAST(sz0 AS DOUBLE)) / CAST(n1 + n0 AS DOUBLE))) * ((CAST(sz1 AS DOUBLE) / CAST(n1 AS DOUBLE)) - ((CAST(sz1 AS DOUBLE) + CAST(sz0 AS DOUBLE)) / CAST(n1 + n0 AS DOUBLE))))
        |    + CAST(n0 AS DOUBLE) * (((CAST(sz0 AS DOUBLE) / CAST(n0 AS DOUBLE)) - ((CAST(sz1 AS DOUBLE) + CAST(sz0 AS DOUBLE)) / CAST(n1 + n0 AS DOUBLE))) * ((CAST(sz0 AS DOUBLE) / CAST(n0 AS DOUBLE)) - ((CAST(sz1 AS DOUBLE) + CAST(sz0 AS DOUBLE)) / CAST(n1 + n0 AS DOUBLE)))) AS ssb
        |  FROM g)
        |SELECT event_type, n1, n0,
        |  CASE WHEN ssw = 0.0 THEN CAST(NULL AS DOUBLE)
        |    ELSE (ssb * CAST(n1 + n0 - 2 AS DOUBLE)) / ssw END AS f_bf
        |FROM f ORDER BY event_type""".stripMargin,
    "q441_ordinal_patterns" ->
      """WITH d AS (SELECT event_type, CAST(strftime(CAST(ts AS TIMESTAMP), '%d') AS BIGINT) AS day,
        |    count(*) AS x FROM events GROUP BY 1, 2),
        |cal AS (SELECT unnest(range(1, 32)) AS day),
        |types AS (SELECT DISTINCT event_type FROM d),
        |dense AS (SELECT t.event_type, c.day, coalesce(d.x, 0) AS x
        |  FROM types t CROSS JOIN cal c
        |  LEFT JOIN d ON d.event_type = t.event_type AND d.day = c.day),
        |w AS (SELECT event_type, day, x AS x0,
        |    lead(x, 1) OVER (PARTITION BY event_type ORDER BY day) AS x1,
        |    lead(x, 2) OVER (PARTITION BY event_type ORDER BY day) AS x2
        |  FROM dense),
        |codes AS (SELECT event_type,
        |    CAST(4 * CAST((x0 < x1 OR (x0 = x1 AND 0 < 1)) AS INT)
        |      + 2 * CAST((x0 < x2 OR (x0 = x2 AND 0 < 2)) AS INT)
        |      + CAST((x1 < x2 OR (x1 = x2 AND 1 < 2)) AS INT) AS BIGINT) AS code
        |  FROM w WHERE day <= 29)
        |SELECT event_type, code, CAST(count(*) AS BIGINT) AS cnt
        |FROM codes GROUP BY 1, 2 ORDER BY event_type, code""".stripMargin
  )
}
