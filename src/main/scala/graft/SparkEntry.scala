package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.ops._
import graft.stream.Streaming
import graft.multimodal.Multimodal

/** Driver contract (SURVEY.md §2 operator inventory → runnable queries).
  *
  * Every key returns a DETERMINISTIC DataFrame over the testdata in `dir`
  * (total ordering, no wall-clock, explicit aliases), and — where the
  * semantics are ANSI-SQL-expressible — has a DuckDB oracle in [[oracleSql]]
  * with matching column names/types. Determinism rules: SURVEY.md §7.6.
  */
object SparkEntry {

  private def T(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** MULTI-PASS blocked edit-distance self-join over customer names (shared
    * by q127's pair listing and q203's transitive entity resolution):
    * candidate pairs come from equi-joins on blocking keys, so Levenshtein
    * — quadratic in the naive formulation — runs only inside blocks; there
    * is NO cartesian anywhere in the plan. A single blocking key has a
    * structural blind spot (prefix-16 blocking can never find a pair whose
    * edit sits IN the first 16 chars), so two passes with complementary
    * keys union their candidates — standard multi-blocking:
    *   pass 1: block on the 16-char prefix, DP on the tails
    *           (edit distance is common-PREFIX invariant)
    *   pass 2: block on (length, last-8 suffix), DP on the heads
    *           (edit distance is common-SUFFIX invariant)
    * A substitution anywhere in an 18-char name lands in at least one pass;
    * two fixture rows whose edit is at char 10 (invisible to pass 1) prove
    * pass 2 carries its weight under the oracle. */
  private def fuzzyCustomerPairs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val base = T(s, dir, "customer").select(col("c_custkey"), col("c_name"))
      .unionByName(Seq(
        (900000001L, "Customer#A00001111"),
        (900000002L, "Customer#B00001111")).toDF("c_custkey", "c_name"))
    def pass(blk: Column, residue: Column): DataFrame = {
      val c = base.select(col("c_custkey"), blk.as("__blk"), residue.as("__res"))
      val a = c.select(col("__blk"), col("c_custkey").as("key_a"), col("__res").as("res_a"))
      val b = c.select(col("__blk"), col("c_custkey").as("key_b"), col("__res").as("res_b"))
      a.join(b, Seq("__blk"))
        .filter(col("key_a") < col("key_b"))
        .withColumn("dist", levenshtein(col("res_a"), col("res_b")).cast("long"))
        .filter(col("dist") <= 1)
        .select(col("key_a"), col("key_b"), col("dist"))
    }
    val p1 = pass(substring(col("c_name"), 1, 16),
      substring(col("c_name"), 17, 1000000))
    val p2 = pass(struct(length(col("c_name")), expr("substring(c_name, -8, 8)")),
      expr("substring(c_name, 1, greatest(length(c_name) - 8, 0))"))
    // a pair agreeing on BOTH keys surfaces twice with the same dist —
    // dedup on the pair (dist is a pure function of it)
    p1.unionByName(p2).dropDuplicates("key_a", "key_b")
  }

  private val TMP = "/root/repo/target/qtmp"

  /** The SHARED co-purchase edge table: the full-history lineitem
    * co-occurrence graph materialized once per (input dir) per JVM and
    * scanned by its six consumers — q120 (PageRank), q125 (triangles),
    * q185 (clustering coeff), q191 (k-core), q201 (BFS), q237
    * (personalized PR). q226 is NOT a consumer: its edges come from a
    * time-windowed relation by design. See [[Graph.coOccurrenceEdgeIndex]]. */
  private def copurchaseEdges(s: SparkSession, dir: String): DataFrame = {
    val safe = dir.replaceAll("[^A-Za-z0-9._-]", "_")
    Graph.coOccurrenceEdgeIndex(T(s, dir, "lineitem"), "l_partkey", "l_orderkey",
      indexDir = s"$TMP/edge_index/${safe}_lineitem_part_order")
  }

  /** The (node, degree) frame CO-MATERIALIZED with [[copurchaseEdges]]
    * (see [[Graph.coOccurrenceDegreeIndex]]): the seven consumers that
    * used to open with the same degree aggregate over the edge table now
    * scan |nodes| rows instead. */
  private def copurchaseDegrees(s: SparkSession, dir: String): DataFrame = {
    val safe = dir.replaceAll("[^A-Za-z0-9._-]", "_")
    Graph.coOccurrenceDegreeIndex(T(s, dir, "lineitem"), "l_partkey", "l_orderkey",
      indexDir = s"$TMP/edge_index/${safe}_lineitem_part_order")
  }

  /** The SHARED bigram-LM score table (q204 reads, q218 buckets): the
    * CCNet score-once shape — see [[TextAnalysis.bigramLogProbIndex]]. */
  private def lmScores(s: SparkSession, dir: String): DataFrame = {
    val safe = dir.replaceAll("[^A-Za-z0-9._-]", "_")
    TextAnalysis.bigramLogProbIndex(T(s, dir, "documents"), "doc_id", "text",
      indexDir = s"$TMP/lm_scores/${safe}_bigram_l7000")
  }

  /** The SHARED near-dup index for the q44-parameter family: pairs +
    * components materialized once per (input dir, params) per JVM and read
    * back as parquet by every consumer — q77 (canonicalization), q105
    * (representatives), q138 (leakage-safe split), q250 (modularity), q255
    * (funnel) all join this instead of each re-running the full
    * shingles → signatures → banded-join → components derivation (five
    * corpus passes at 100 TB; one here). See [[Dedup.componentIndex]]. */
  private def dedupIndex(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val safe = dir.replaceAll("[^A-Za-z0-9._-]", "_")
    Dedup.componentIndex(T(s, dir, "documents"), "doc_id", "text",
      shingleK = 2, numHashes = 16, bands = 8, threshold = 0.25,
      indexDir = s"$TMP/dedup_index/${safe}_k2_h16_b8_t25")
  }

  /** The persisted banded-signature side of [[dedupIndex]] (same artifact,
    * same write): what incremental maintenance probes (q265) instead of
    * re-banding the historical corpus. */
  private def dedupIndexBands(s: SparkSession, dir: String): DataFrame = {
    val safe = dir.replaceAll("[^A-Za-z0-9._-]", "_")
    Dedup.componentIndexBands(T(s, dir, "documents"), "doc_id", "text",
      shingleK = 2, numHashes = 16, bands = 8, threshold = 0.25,
      indexDir = s"$TMP/dedup_index/${safe}_k2_h16_b8_t25")
  }

  /** The top principal direction of the strided 16-dim embedding
    * projection by POWER ITERATION on the correlation matrix — q295's
    * extraction stage, shared with q299 (which projects the corpus back
    * onto the vector). The 100 TB division of labor is the point: the only
    * corpus-sized work is the one-pass moment accumulation (q288's shape);
    * extraction runs on the 16×16 metadata frame, in EXACT integer
    * arithmetic so every engine lands on the same vector — correlation
    * quantized to 1e-5 units (from exact moments, fixed op order), matvec
    * = long sums (≤16·10⁵·10⁶ ≪ 2⁶³), renormalize = sign·(|w|·10⁶ div
    * max|w|), where abs keeps the integer division non-negative so Spark's
    * `div` (trunc) and DuckDB's `//` (floor) agree. 8 fixed iterations (no
    * float convergence test to disagree on); sign pinned by the all-ones
    * start. Output: 16 rows (j int, v long micro-units, m long growth). */
  private def topPrincipalDirection(s: SparkSession, dir: String): DataFrame = {
    val emb = T(s, dir, "embeddings")
    val proj = emb.select(expr(
      "transform(sequence(0, 15), k -> CAST(round(CAST(element_at(embedding, k * 4 + 1) AS DOUBLE) * 1000000) AS BIGINT))")
      .as("p"))
    val withI = proj.select(col("p"), posexplode(col("p")).as(Seq("i", "mi")))
    val mom = withI
      .select(col("i"), col("mi"), posexplode(col("p")).as(Seq("j", "mj")))
      .groupBy(col("i"), col("j"))
      .agg(count(lit(1)).as("n"), sum(col("mi")).as("si"),
        sum(col("mj")).as("sj"), sum(col("mi") * col("mj")).as("sij"))
    val covDf = mom.select(col("i"), col("j"),
      (col("sij").cast("double") / col("n").cast("double") -
        (col("si").cast("double") / col("n").cast("double")) *
        (col("sj").cast("double") / col("n").cast("double"))).as("c"))
      .localCheckpoint()
    val varDf = covDf.filter(col("i") === col("j"))
      .select(col("i").as("__vi"), col("c").as("__v"))
    val corr = covDf
      .join(broadcast(varDf.select(col("__vi").as("i"), col("__v").as("va"))), "i")
      .join(broadcast(varDf.select(col("__vi").as("j"), col("__v").as("vb"))), "j")
      .select(col("i"), col("j"),
        expr("CAST(round(c / sqrt(va * vb) * 100000) AS BIGINT)").as("r"))
      .localCheckpoint()
    var v = s.range(0, 16).select(col("id").cast("int").as("j"),
      lit(1000000L).as("v"))
    var lastM: DataFrame = null
    (1 to 8).foreach { _ =>
      val w = corr.join(broadcast(v), "j")
        .groupBy(col("i")).agg(sum(col("r") * col("v")).as("w"))
        .localCheckpoint()
      lastM = w.agg(max(abs(col("w"))).as("m")).localCheckpoint()
      v = w.crossJoin(broadcast(lastM))
        .select(col("i").as("j"),
          (when(col("w") < 0, -1L).otherwise(1L) *
            expr("(abs(w) * 1000000) div m")).cast("long").as("v"))
        .localCheckpoint()
    }
    v.crossJoin(broadcast(lastM)).select(col("j"), col("v"), col("m"))
  }

  /** Morton interleave of the low 16 bits of `x`/`y` as plain SQL bit
    * arithmetic — the oracle-side twin of [[graft.functions.ZOrder]]
    * (generated term-by-term so both engines agree on all 32 placements). */
  private def zorderSql(x: String, y: String): String =
    (0 until 16).map(i =>
      s"((($x >> $i) & 1) << ${2 * i}) | ((($y >> $i) & 1) << ${2 * i + 1})")
      .mkString(" | ")

  /** Flagship query on sf0.001 (driver smoke-checks rows > 0): top-k order
    * priorities — scan → partial/final hash agg → TakeOrderedAndProject. */
  def entry(spark: SparkSession): DataFrame =
    Relational.topKGroups(Tables.orders(spark, "/root/testdata/sf0.001"), "o_orderpriority", 10)

  // case-bucket expression shared by q36/q40 (reference threshold-ladder shape,
  // `Data Analysis/Reddit_4chan_Analysis.py:152-160`)
  private def valueBucket = when(col("value") >= 100, "high")
    .when(col("value") >= 50, "mid").otherwise(lit("low"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---------------------------------------------------------- §2.1 sources
    "q01_csv_scan" -> ((s, dir) => {
      val region = T(s, dir, "region")
      val tmp = s"$TMP/q01_csv"
      region.coalesce(1).write.mode("overwrite").option("header", "true").csv(tmp)
      s.read.option("header", "true").schema(region.schema).csv(tmp).orderBy("r_regionkey")
    }),
    "q02_json_flatten" -> ((s, dir) =>
      T(s, dir, "events")
        .select(col("event_id"),
          from_json(col("props"), StructType.fromDDL("k INT")).getField("k").as("k"))
        .orderBy("event_id")),
    "q03_json_explode" -> ((s, dir) => {
      // build the 2-level nested shape (threads[].posts[]-like), then unnest both levels.
      // TEST-SHAPE-ONLY synthesis: the two collect_list groupBys exist solely to
      // MANUFACTURE the nested input from flat TPC-H rows (real nested data
      // arrives nested from the source, e.g. q02's from_json). At scale,
      // collect_list on a skewed key is unbounded per-group state — never use
      // this build pattern on production-sized groups; the operator under test
      // here is the double explode below, which is map-side and scale-safe.
      val items = T(s, dir, "lineitem").groupBy(col("l_orderkey"))
        .agg(collect_list(struct(col("l_linenumber"), col("l_quantity"))).as("items"))
      val nested = T(s, dir, "orders")
        .join(items, col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_custkey"))
        .agg(collect_list(struct(col("o_orderkey"), col("items"))).as("orders_arr"))
      nested.select(col("o_custkey").as("custkey"), explode(col("orders_arr")).as("o"))
        .select(col("custkey"), explode(col("o.items")).as("it"))
        .groupBy(col("custkey"))
        // exact integer-cents sum: order-independent, bit-identical to the oracle
        .agg((sum(ops.Num.roundz(col("it.l_quantity") * 100, 0).cast("long")) / 100.0).as("sum_qty"))
        .orderBy("custkey")
    }),
    "q04_table_sink_append" -> ((s, dir) => {
      val sink = s"$TMP/q04_sink"
      val li = T(s, dir, "lineitem")
      li.filter(col("l_returnflag") === "R").write.mode("overwrite").parquet(sink)
      li.filter(col("l_returnflag") === "A").write.mode("append").parquet(sink)
      s.read.parquet(sink).groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("cnt")).orderBy("l_returnflag")
    }),
    "q05_table_scan" -> ((s, dir) => T(s, dir, "orders").orderBy("o_orderkey")),
    // ---------------------------------------------------------- §2.2 filters
    "q06_project" -> ((s, dir) =>
      T(s, dir, "customer").select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
        .orderBy("c_custkey")),
    "q07_ts_range_filter" -> ((s, dir) =>
      // ORDER BY every output column: the testdata's (l_orderkey,
      // l_linenumber) is NOT unique (118k dup pairs at sf0.1), so the
      // 2-column sort was only total by luck — the sf1 replay caught the
      // tie order diverging between engines once Spark sorts across 32
      // real partitions. Sorting on the full projection is total up to
      // fully-duplicate rows, which the value compare is insensitive to.
      T(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
        .select(col("l_orderkey"), col("l_linenumber"), col("l_shipdate"))
        .orderBy("l_orderkey", "l_linenumber", "l_shipdate")),
    "q08_between_filter" -> ((s, dir) =>
      T(s, dir, "orders")
        .join(T(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .filter(col("o_orderdate").between(
          lit("1997-01-01").cast("timestamp"), lit("1997-12-31").cast("timestamp")))
        .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("cnt"))
        .orderBy("c_mktsegment")),
    "q09_recency_filter" -> ((s, dir) =>
      Relational.recentWithin(T(s, dir, "events"), "ts", "1 DAY")
        .select(col("event_id"), col("ts"), col("event_type")).orderBy("event_id")),
    "q10_date_cast_filter" -> ((s, dir) =>
      T(s, dir, "events")
        .withColumn("day", TextFunctions.dayString(col("ts")))
        .filter(col("day").between("2024-01-10", "2024-01-19"))
        .groupBy(col("day")).agg(count(lit(1)).as("cnt")).orderBy("day")),
    // ---------------------------------------------------------- §2.3 joins
    "q11_inner_equijoin" -> ((s, dir) =>
      T(s, dir, "orders")
        .join(T(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("cnt"),
          (sum(ops.Num.roundz(col("o_totalprice") * 100, 0).cast("long")) / 100.0).as("sum_price"))
        .orderBy("c_mktsegment")),
    "q12_anti_join_dedup" -> ((s, dir) =>
      Relational.antiDedup(
        T(s, dir, "customer"),
        T(s, dir, "orders").filter(col("o_orderstatus") === "P")
          .select(col("o_custkey").as("c_custkey")),
        Seq("c_custkey"))
        .select(col("c_custkey")).orderBy("c_custkey")),
    "q13_composite_key_anti" -> ((s, dir) => {
      val li = T(s, dir, "lineitem")
      Relational.antiDedup(
        li.filter(col("l_returnflag") === "N").select(col("l_orderkey"), col("l_suppkey")).distinct(),
        li.filter(col("l_returnflag") === "R").select(col("l_orderkey"), col("l_suppkey")),
        Seq("l_orderkey", "l_suppkey"))
        .orderBy("l_orderkey", "l_suppkey")
    }),
    // ---------------------------------------------------------- §2.4 aggs
    "q14_count_global" -> ((s, dir) => T(s, dir, "lineitem").agg(count(lit(1)).as("cnt"))),
    "q15_groupby_count" -> ((s, dir) =>
      T(s, dir, "lineitem").groupBy(col("l_returnflag")).agg(count(lit(1)).as("cnt"))
        .orderBy("l_returnflag")),
    "q16_groupby_multi" -> ((s, dir) =>
      T(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"),
          year(col("l_shipdate")).cast("long").as("ship_year"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy("l_returnflag", "l_linestatus", "ship_year")),
    "q17_topk_groups" -> ((s, dir) => Relational.topKGroups(T(s, dir, "orders"), "o_orderpriority", 10)),
    "q18_tumbling_day_count" -> ((s, dir) =>
      Relational.tumblingCounts(T(s, dir, "events"), "ts", "1 day").orderBy("bucket_start")),
    "q19_share_of_total" -> ((s, dir) =>
      Relational.shareOfTotal(T(s, dir, "events"), "event_type").orderBy("event_type")),
    // ---------------------------------------------------------- §2.5 sort/window
    "q20_orderby_ts" -> ((s, dir) =>
      T(s, dir, "events").select(col("event_id"), col("ts"), col("event_type"))
        .orderBy("ts", "event_id")),
    "q21_orderby_desc_limit" -> ((s, dir) =>
      T(s, dir, "orders").select(col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey")).limit(10)),
    "q22_running_state" -> ((s, dir) =>
      Relational.runningState(T(s, dir, "events"), "user_id", "ts", "event_id", "value")
        .withColumn("rn", col("rn").cast("long"))
        .orderBy("user_id", "rn")),
    // ---------------------------------------------------------- §2.6 set ops
    "q23_union_all" -> ((s, dir) => {
      val o = T(s, dir, "orders")
      o.filter(col("o_orderstatus") === "O").select(col("o_orderkey"), lit("open").as("src"))
        .unionByName(
          o.filter(col("o_totalprice") > 400000).select(col("o_orderkey"), lit("big").as("src")))
        .orderBy("o_orderkey", "src")
    }),
    // ---------------------------------------------------------- §2.7 scalar fns
    "q24_url_strip" -> ((s, dir) =>
      T(s, dir, "documents")
        .select(col("doc_id"), TextFunctions.stripUrls(
          concat(lit("see https://example.com/d/"), col("doc_id"), lit(" :: "), col("text")))
          .as("clean"))
        .orderBy("doc_id")),
    "q25_normalize_text" -> ((s, dir) =>
      T(s, dir, "documents")
        .select(col("doc_id"), TextFunctions.normalizeText(upper(col("text"))).as("normalized"))
        .orderBy("doc_id")),
    "q26_html_to_text" -> ((s, dir) =>
      T(s, dir, "documents")
        .select(col("doc_id"), TextFunctions.htmlToText(
          concat(lit("<p>Line &amp; <b>"), col("text"), lit("</b> &gt;&gt;42 tail</p>")))
          .as("clean"))
        .orderBy("doc_id")),
    "q27_epoch_to_ts" -> ((s, dir) =>
      T(s, dir, "events")
        .select(col("event_id"), TextFunctions.epochToTs(col("ts").cast("long")).as("ts_sec"))
        .orderBy("event_id")),
    "q28_iso_parse" -> ((s, dir) =>
      T(s, dir, "events")
        .select(col("event_id"), TextFunctions.isoParse(
          date_format(col("ts"), "yyyy-MM-dd'T'HH:mm:ss'Z'")).as("parsed"))
        .orderBy("event_id")),
    "q29_date_format" -> ((s, dir) =>
      T(s, dir, "orders")
        .select(col("o_orderkey"), TextFunctions.dayString(col("o_orderdate")).as("day"))
        .orderBy("o_orderkey")),
    "q30_date_arith" -> ((s, dir) =>
      T(s, dir, "orders")
        .select(col("o_orderkey"), (col("o_orderdate") + expr("INTERVAL 30 DAYS")).as("due"))
        .orderBy("o_orderkey")),
    "q31_scalar_math" -> ((s, dir) =>
      T(s, dir, "events")
        .groupBy(TextFunctions.dayString(col("ts")).as("day"))
        .agg(count(lit(1)).as("cnt"))
        .withColumn("extrapolated", ops.Num.roundz(col("cnt") / lit(10.0) * lit(5.5), 2))
        .orderBy("day")),
    "q32_json_get" -> ((s, dir) =>
      T(s, dir, "events")
        .select(col("event_id"), TextFunctions.jsonGetLong(col("props"), "k", -1).as("k"))
        .orderBy("event_id")),
    "q33_null_guard" -> ((s, dir) =>
      T(s, dir, "documents")
        .select(col("doc_id"),
          when(col("text").isNull || length(col("text")) === 0, lit("not a string"))
            .otherwise(substring(col("text"), 1, 20)).as("guarded"))
        .orderBy("doc_id")),
    // ---------------------------------------------------------- §2.8 UDF surface
    "q34_sentiment_udf" -> ((s, dir) =>
      // native codegen'd expression (functions/LexiconScore.scala): scoring
      // is one map-side byte loop per row — no token explode, no join, no
      // exchange; bit-parity with the relational and UDF forms is spec'd
      Sentiment.scoreByLexiconNative(T(s, dir, "documents"), "text")
        .select(col("doc_id"), col("sentiment_score"), col("sentiment"))
        .orderBy("doc_id")),
    "q35_hate_udf" -> ((s, dir) =>
      Moderation.classify(T(s, dir, "documents"), "text")
        .select(col("doc_id"), col("is_hate_speech"), col("hate_speech_confidence"))
        .orderBy("doc_id")),
    "q36_case_label" -> ((s, dir) =>
      T(s, dir, "events").groupBy(valueBucket.as("label")).agg(count(lit(1)).as("cnt"))
        .orderBy("label")),
    // ---------------------------------------------------------- §2.9 streaming
    "q37_microbatch_trigger" -> ((s, dir) =>
      Streaming.countsByType(s, dir).orderBy("event_type")),
    "q38_stream_dedup" -> ((s, dir) =>
      Streaming.streamDedupKeys(s, dir).orderBy("user_id")),
    "q39_late_data_drop" -> ((s, dir) =>
      Relational.recentWithin(T(s, dir, "events"), "ts", "12 HOURS")
        .groupBy(col("event_type")).agg(count(lit(1)).as("cnt")).orderBy("event_type")),
    "q40_incremental_enrich" -> ((s, dir) => {
      val ev = T(s, dir, "events")
      val existing = ev.filter(col("event_id") % 10 === 0).select(col("event_id"))
      Streaming.incrementalEnrich(ev, existing, "event_id")(
        _.withColumn("label", valueBucket))
        .groupBy(col("label")).agg(count(lit(1)).as("cnt")).orderBy("label")
    }),
    "q143_stream_static_join" -> ((s, dir) =>
      // per-micro-batch broadcast join against a static dimension — no
      // streaming state anywhere; complete-mode agg equals the batch twin
      Streaming.streamStaticTierCounts(s, dir).orderBy("tier")),
    "q144_expectations" -> ((s, dir) =>
      // ingest-gate quality audit: the whole rule set in ONE scan; a rule
      // passes only when TRUE (NULL strict-fails)
      Profiling.expectations(T(s, dir, "events"), Seq(
        "value_present_non_negative" -> (col("value").isNotNull && col("value") >= 0),
        "value_at_most_100" -> (col("value") <= 100),
        "user_id_present" -> col("user_id").isNotNull,
        "props_nonempty" -> (length(col("props")) > 0)))
        .orderBy("rule")),
    "q145_weighted_sample" -> ((s, dir) =>
      // A-ES weighted sampling via the exponential race: 100 docs drawn
      // w.p. proportional to length — global top-n plans as
      // TakeOrderedAndProject (per-partition heap), never a full sort
      Curation.weightedPrioritySample(T(s, dir, "documents"), "doc_id", "n_chars", n = 100)
        .select(col("doc_id"), col("lang"), col("n_chars"), col("priority"))
        .orderBy("doc_id")),
    "q146_rolling_median" -> ((s, dir) => {
      // robust 7-day trend line: exact median over a bounded frame of
      // per-day aggregates — per-row state is O(frame), not O(partition)
      val daily = T(s, dir, "events")
        .groupBy(col("event_type"), TextFunctions.dayString(col("ts")).as("day"))
        .agg(count(lit(1)).as("cnt"))
      Relational.rollingMedian(daily, "event_type", "day", "cnt", frameRows = 7)
        .orderBy("event_type", "day")
    }),
    "q147_mad_outliers" -> ((s, dir) => {
      // breakdown-robust anomaly flags: |cnt − median| > 3·MAD per event
      // type — exact interpolating percentiles over integer counts, group
      // stats broadcast back so the daily frame never reshuffles
      val daily = T(s, dir, "events")
        .groupBy(col("event_type"), TextFunctions.dayString(col("ts")).as("day"))
        .agg(count(lit(1)).as("cnt"))
      Profiling.madOutliers(daily, "event_type", "cnt", k = 3.0)
        .select(col("event_type"), col("day"), col("cnt"), col("med"),
          col("mad"), col("is_outlier"))
        .orderBy("event_type", "day")
    }),
    "q148_unigram_logprob" -> ((s, dir) =>
      // corpus-unigram perplexity stand-in: per-doc avg negative
      // log-likelihood under the corpus's own token distribution
      TextAnalysis.unigramLogProb(T(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id")),
    "q149_time_travel" -> ((s, dir) => {
      // snapshot-isolation time travel: v1 commits the first half-month,
      // v2 appends the rest to the SAME directory; reading v1 afterwards
      // must not see the appended files — the txn-log read, not a data copy
      val tmp = s"$TMP/q149_tt"
      val log = s"$TMP/q149_tt_log"
      val ev = T(s, dir, "events")
        .withColumn("day", TextFunctions.dayString(col("ts")))
      ev.filter(col("day") < "2024-01-16")
        .write.mode("overwrite").partitionBy("day").parquet(tmp)
      graft.storage.Storage.commitSnapshot(s, tmp, log, 1L, reset = true)
      ev.filter(col("day") >= "2024-01-16")
        .write.mode("append").partitionBy("day").parquet(tmp)
      graft.storage.Storage.commitSnapshot(s, tmp, log, 2L)
      graft.storage.Storage.readSnapshot(s, tmp, log, 1L)
        .groupBy(col("day").cast("string").as("day"))
        .agg(count(lit(1)).as("cnt"), sum(col("event_id")).as("sum_id"))
        .orderBy("day")
    }),
    "q150_snapshot_diff" -> ((s, dir) => {
      // incremental consumption: process ONLY the files the v2 commit added
      // — the change-feed read whose cost tracks the increment, not the
      // table (file-granularity complement of q123's row-level CDC)
      val tmp = s"$TMP/q150_sd"
      val log = s"$TMP/q150_sd_log"
      val ev = T(s, dir, "events")
        .withColumn("day", TextFunctions.dayString(col("ts")))
      ev.filter(col("day") < "2024-01-16")
        .write.mode("overwrite").partitionBy("day").parquet(tmp)
      graft.storage.Storage.commitSnapshot(s, tmp, log, 1L, reset = true)
      ev.filter(col("day") >= "2024-01-16")
        .write.mode("append").partitionBy("day").parquet(tmp)
      graft.storage.Storage.commitSnapshot(s, tmp, log, 2L)
      graft.storage.Storage.readSnapshotDiff(s, tmp, log, 1L, 2L)
        .groupBy(col("day").cast("string").as("day"))
        .agg(count(lit(1)).as("cnt"), sum(col("event_id")).as("sum_id"))
        .orderBy("day")
    }),
    "q151_transition_matrix" -> ((s, dir) =>
      // first-order Markov journey matrix: which event follows which, and
      // how often — one user-hash window + a matrix-sized share window
      Relational.transitionMatrix(T(s, dir, "events"),
        "user_id", "ts", "event_id", "event_type")
        .orderBy("from_type", "to_type")),
    "q152_winsorize" -> ((s, dir) => {
      // robust clipping to per-type [p05, p95] DISCRETE percentiles — cut
      // points are actual elements, so the audit sums stay exact longs
      val ev = T(s, dir, "events")
        .withColumn("cents", ops.Num.roundz(col("value") * 100, 0).cast("long"))
      Profiling.winsorize(ev, "event_type", "cents", 0.05, 0.95)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("clipped_low"), 1L).otherwise(0L)).as("clipped_low"),
          sum(when(col("clipped_high"), 1L).otherwise(0L)).as("clipped_high"),
          sum(col("winsorized")).as("sum_winsorized"))
        .orderBy("event_type")
    }),
    "q153_journey_trigrams" -> ((s, dir) =>
      // order-3 behavioral n-grams: two leads share ONE user-hash window;
      // rank runs after the top-k limit (bounded by k, the q103 discipline)
      Relational.journeyTrigrams(T(s, dir, "events"),
        "user_id", "ts", "event_id", "event_type", k = 25)
        .orderBy("rank")),
    "q154_interevent_gaps" -> ((s, dir) =>
      // latency fingerprint: whole-second gaps since the user's previous
      // event, summarized with DISCRETE percentiles — exact longs only
      Relational.interEventGaps(T(s, dir, "events"),
        "user_id", "ts", "event_id", "event_type")
        .orderBy("event_type")),
    "q155_heavy_hitters" -> ((s, dir) => {
      // Misra–Gries candidates (map-side, k counters per partition) +
      // exact recount of candidates only — the vocabulary never shuffles
      import s.implicits._
      val toks = T(s, dir, "documents")
        .select(explode(split(lower(col("text")), "\\s+")).as("item"))
        .filter(length(col("item")) > 0).as[String]
      ops.Sketch.heavyHitters(toks, shareBp = 100L).orderBy("item")
    }),
    "q156_unpivot" -> ((s, dir) =>
      // wide→long reshape (melt), q66's inverse: the crosstab unpivots back
      // to (day, event_type, cnt) rows — native `unpivot` plans an Expand,
      // a pure map-side row fan-out with no exchange
      T(s, dir, "events")
        .withColumn("day", TextFunctions.dayString(col("ts")))
        .groupBy(col("day"))
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .agg(count(lit(1))).na.fill(0)
        .unpivot(Array(col("day")),
          Array(col("click"), col("error"), col("purchase"),
            col("signup"), col("view")),
          "event_type", "cnt")
        .orderBy("day", "event_type")),
    "q157_cube" -> ((s, dir) =>
      // full 2-D cube: every (type, day) cell, both 1-D margins, and the
      // grand total in ONE pass — rollup's (q64) superset, same Expand-based
      // plan (no re-scan per granularity)
      T(s, dir, "events")
        .withColumn("day", TextFunctions.dayString(col("ts")))
        .withColumn("cents", ops.Num.roundz(col("value") * 100, 0).cast("long"))
        .cube(col("event_type"), col("day"))
        .agg(count(lit(1)).as("cnt"), sum(col("cents")).as("sum_cents"))
        .orderBy(col("event_type").asc_nulls_first, col("day").asc_nulls_first)),
    "q158_psi_drift" -> ((s, dir) =>
      // distribution drift: PSI of the value histogram, first half-month vs
      // second, per event type — the training-data freshness gate
      Stats.psiDrift(
        T(s, dir, "events")
          .withColumn("cents", ops.Num.roundz(col("value") * 100, 0).cast("long"))
          .withColumn("period",
            when(TextFunctions.dayString(col("ts")) < "2024-01-16", "a").otherwise("b")),
        "event_type", "cents", "period", bins = 10, binWidth = 5000L)
        .orderBy("event_type")),
    "q159_group_corr" -> ((s, dir) =>
      // price–quantity correlation per return flag from exact power sums
      // (never the engines' own streaming `corr` — see Stats.pearsonByGroup)
      Stats.pearsonByGroup(
        T(s, dir, "lineitem")
          .withColumn("qty", col("l_quantity").cast("long"))
          .withColumn("cents", ops.Num.roundz(col("l_extendedprice") * 100, 0).cast("long")),
        "l_returnflag", "qty", "cents")
        .orderBy("l_returnflag")),
    "q160_event_entropy" -> ((s, dir) =>
      // per-day event-mix entropy: a day collapsing to one event type is a
      // collection outage, not a trend — the degenerate-slice detector
      Stats.categoricalEntropy(
        T(s, dir, "events")
          .withColumn("day", TextFunctions.dayString(col("ts"))),
        "day", "event_type")
        .orderBy("day")),
    "q161_pmi_bigrams" -> ((s, dir) =>
      // collocation mining: adjacent-pair PMI over the corpus — phrase
      // candidates for tokenizer merges and multi-word unit detection
      TextAnalysis.pmiBigrams(T(s, dir, "documents"), "text", minCount = 25L)
        .orderBy("w1", "w2")),
    "q162_resample" -> ((s, dir) =>
      // hourly resample with LOCF gap fill: dense regular grid per type,
      // manufactured buckets flagged, last observed sum carried forward
      Relational.resampleLocf(
        T(s, dir, "events")
          .withColumn("cents", ops.Num.roundz(col("value") * 100, 0).cast("long")),
        "event_type", "ts", "cents", grain = "hour")
        .select(col("event_type"),
          date_format(col("bucket"), "yyyy-MM-dd HH").as("bucket"),
          col("cnt"), col("filled"), col("locf").cast("long").as("locf_cents"))
        .orderBy("event_type", "bucket")),
    "q163_conversion_lift" -> ((s, dir) =>
      // funnel health: per-day purchase/view conversion in basis points and
      // its two-proportion z-score against the month's pooled rate
      Stats.conversionLift(
        T(s, dir, "events")
          .withColumn("day", TextFunctions.dayString(col("ts"))),
        "day", "event_type", denomType = "view", numType = "purchase")
        .orderBy("day")),
    "q164_skyline" -> ((s, dir) =>
      // 2-D Pareto frontier: cheapest price at each quantity level that no
      // higher quantity beats — input collapses to |distinct qty| candidates
      // BEFORE the single-partition frontier window
      Relational.paretoFrontier(
        T(s, dir, "lineitem")
          .withColumn("qty", col("l_quantity").cast("long"))
          .withColumn("cents", ops.Num.roundz(col("l_extendedprice") * 100, 0).cast("long")),
        "qty", "cents")
        .orderBy("qty")),
    "q165_timed_funnel" -> ((s, dir) =>
      // cohorted view→purchase conversion WITHIN 24h of the user's first
      // view — the timed complement of q86's ordered funnel
      Relational.timedFunnel(T(s, dir, "events"),
        "user_id", "ts", "event_type", "view", "purchase", withinHours = 24)
        .orderBy("cohort_day")),
    "q166_skew_profile" -> ((s, dir) =>
      // the pre-salting diagnosis: per join-key candidate, exact hot-key
      // share / p99 / mean — q69/q85 are the treatments this prescribes
      Relational.skewProfile(T(s, dir, "events"), Seq("user_id", "event_type"))
        .orderBy("col_name")),
    "q167_mutual_info" -> ((s, dir) =>
      // does the event mix depend on the weekday? MI(event_type; dow) per
      // week, in nats — the aggregated twin of q161's per-pair PMI
      Stats.mutualInfo(
        T(s, dir, "events")
          .withColumn("week", expr("datediff(CAST(ts AS DATE), DATE '2024-01-01') div 7"))
          .withColumn("dow", expr("datediff(CAST(ts AS DATE), DATE '2024-01-01') % 7")),
        "week", "event_type", "dow")
        .orderBy("week")),
    "q168_gini" -> ((s, dir) =>
      // engagement inequality: Gini of the cents distribution per type via
      // the exact rank-sum identity over the GROUPED value domain
      Stats.giniByGroup(
        T(s, dir, "events")
          .withColumn("cents", ops.Num.roundz(col("value") * 100, 0).cast("long")),
        "event_type", "cents")
        .orderBy("event_type")),
    "q169_hhi" -> ((s, dir) =>
      // concentration twin of q160's entropy: HHI of each day's event mix
      Stats.hhiByGroup(
        T(s, dir, "events")
          .withColumn("day", TextFunctions.dayString(col("ts"))),
        "day", "event_type")
        .orderBy("day")),
    "q170_changepoint" -> ((s, dir) =>
      // CUSUM mean-shift probe over daily counts — scaled-long cumulative
      // sums, argmax resolved by max + earliest-day join-back
      Stats.cusumChangepoint(
        T(s, dir, "events")
          .withColumn("day", TextFunctions.dayString(col("ts")))
          .groupBy(col("event_type"), col("day"))
          .agg(count(lit(1)).as("x")),
        "event_type", "day", "x")
        .orderBy("event_type")),
    "q171_assoc_rules" -> ((s, dir) =>
      // market-basket rules: per-order item pairs → support/confidence/lift;
      // pairs fan out AFTER the per-basket agg, margins re-join as broadcasts
      Graph.associationRules(T(s, dir, "lineitem"),
        "l_partkey", "l_orderkey", minPairs = 2L)
        .orderBy("x", "y")),
    "q172_golden_record" -> ((s, dir) => {
      // survivorship merge: the freshest NON-NULL per column — a user whose
      // newest event isn't a purchase still keeps the last purchase amount
      val ev = T(s, dir, "events")
        .withColumn("day", TextFunctions.dayString(col("ts")))
        .withColumn("amount_cents", when(col("event_type") === "purchase",
          ops.Num.roundz(col("value") * 100, 0).cast("long")))
      Warehouse.goldenRecord(ev, "user_id", "ts", "event_id",
        Seq("amount_cents", "event_type", "day"))
        .orderBy("user_id")
    }),
    "q173_rank_normalize" -> ((s, dir) => {
      // quantile (rank) normalization of the value column — EXACT global
      // percentile in basis points, via the q96/q137 two-phase global rank
      // (never a single-partition row_number window)
      val ev = T(s, dir, "events")
        .select(col("event_id"), ops.Num.roundz(col("value") * 100, 0).cast("long").as("cents"))
      val (ranked, n) = graft.ops.TwoPhase.globalRank(ev, col("cents"),
        Seq(col("cents"), col("event_id")), "rank")
      ranked.select(col("event_id"), col("cents"), col("rank").cast("long").as("rank"),
        expr(s"((rank - 1) * 10000) div ${n - 1}L").as("pct_bp"))
        .orderBy("rank")
    }),
    "q174_rfm" -> ((s, dir) => {
      // RFM segmentation against the corpus's own tercile cutpoints — the
      // anchor "now" is the data max (no wall clock), cut values broadcast
      val ev = T(s, dir, "events")
        .withColumn("amount", when(col("event_type") === "purchase",
          ops.Num.roundz(col("value") * 100, 0).cast("long")).otherwise(0L))
      Stats.rfmSegments(ev, "user_id", "ts", "amount")
        .orderBy("user_id")
    }),
    "q175_seasonality" -> ((s, dir) =>
      // weekday over/under-indexing per type, floor basis points — runs on
      // the daily aggregate, never raw events
      Stats.seasonalityIndex(
        T(s, dir, "events")
          .withColumn("day", TextFunctions.dayString(col("ts")))
          .withColumn("dow",
            expr("datediff(CAST(ts AS DATE), DATE '2024-01-01') % 7").cast("long"))
          .groupBy(col("event_type"), col("day"), col("dow"))
          .agg(count(lit(1)).as("x")),
        "event_type", "day", "dow", "x")
        .orderBy("event_type", "dow")),
    "q176_autocorr" -> ((s, dir) =>
      // does today's volume predict tomorrow's (lag 1) and next week's
      // (lag 7)? — exact-sum Pearson over lag pairs from ONE shared window
      Stats.autocorrByGroup(
        T(s, dir, "events")
          .withColumn("day", TextFunctions.dayString(col("ts")))
          .groupBy(col("event_type"), col("day"))
          .agg(count(lit(1)).as("x")),
        "event_type", "day", "x", Seq(1, 7))
        .orderBy("event_type", "lag")),
    "q177_survival" -> ((s, dir) => {
      // Kaplan-Meier time-to-conversion: users who never purchase inside
      // the horizon are right-censored, not dropped — the honest funnel
      val ev = T(s, dir, "events")
      val entry = ev.filter(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("ts")).as("__t0"))
      val hit = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts").as("__t1"))
        .join(entry, Seq("user_id"))
        .filter(col("__t1") >= col("__t0"))
        .groupBy(col("user_id")).agg(min(col("__t1")).as("__te"))
      val horizon = ev.agg(max(col("ts")).as("__h"))
      val durations = entry.join(hit, Seq("user_id"), "left")
        .crossJoin(broadcast(horizon))
        .select(
          when(col("__te").isNotNull,
            datediff(col("__te").cast("date"), col("__t0").cast("date")))
            .otherwise(datediff(col("__h").cast("date"), col("__t0").cast("date")))
            .cast("long").as("duration_days"),
          col("__te").isNotNull.as("converted"))
      Stats.kaplanMeier(durations, "duration_days", "converted")
        .orderBy("duration_days")
    }),
    "q178_bm25" -> ((s, dir) =>
      // Okapi BM25 top-k for a fixed query over the corpus — the ranking
      // layer on top of q136's inverted index; rank AFTER the limit
      TextAnalysis.bm25TopK(T(s, dir, "documents"), "doc_id", "text",
        Seq("join", "filter", "scan"), k = 20)
        .orderBy("rank")),
    "q179_bollinger" -> ((s, dir) =>
      // trailing 7-day mean ± 2sigma bands with an EXACT integer breakout
      // test — a band-edge value can never flip engines
      Stats.rollingBands(
        T(s, dir, "events")
          .withColumn("day", TextFunctions.dayString(col("ts")))
          .groupBy(col("event_type"), col("day"))
          .agg(count(lit(1)).as("x")),
        "event_type", "day", "x", frameRows = 7)
        .orderBy("event_type", "day")),
    "q180_top_movers" -> ((s, dir) =>
      // week-over-week movement in basis points, sign-split so truncation
      // semantics agree across engines below zero
      Stats.periodMovers(
        T(s, dir, "events")
          .withColumn("week",
            expr("datediff(CAST(ts AS DATE), DATE '2024-01-01') div 7"))
          .groupBy(col("event_type"), col("week"))
          .agg(count(lit(1)).as("x")),
        "event_type", "week", "x")
        .orderBy("event_type", "week")),
    "q181_ewma" -> ((s, dir) =>
      // smoothed daily level per type: sequential fold seeded from the
      // first day — identical IEEE op order to the oracle's list_reduce
      Stats.ewma(
        T(s, dir, "events")
          .withColumn("day", TextFunctions.dayString(col("ts")))
          .groupBy(col("event_type"), col("day"))
          .agg(count(lit(1)).as("x")),
        "event_type", "day", "x", alphaBp = 3000)
        .orderBy("event_type")),
    "q182_twap" -> ((s, dir) =>
      // time-weighted mean value per type: each observation holds until
      // the next (micros-exact durations, decimal-exact weighted sums)
      Stats.timeWeightedAvg(
        T(s, dir, "events")
          .withColumn("cents", expr("CAST(round(value * 100, 0) AS BIGINT)")),
        "event_type", "ts", "event_id", "cents")
        .orderBy("event_type")),
    "q183_cohort_retention" -> ((s, dir) =>
      // first-week cohorts × weeks-since: distinct actives and exact
      // basis-point retention vs the cohort's own week-0 size
      Relational.cohortRetention(T(s, dir, "events"), "user_id", "ts",
        origin = "2024-01-01")
        .orderBy("cohort_week", "week_offset")),
    "q184_benford" -> ((s, dir) =>
      // first-digit audit over order totals in cents — string-bucketed,
      // so no float log sits in the grouping path
      Profiling.benford(
        T(s, dir, "orders")
          .withColumn("cents", expr("CAST(round(o_totalprice * 100, 0) AS BIGINT)")),
        "cents")
        .orderBy("digit")),
    "q185_clustering_coeff" -> ((s, dir) =>
      // how clique-like each part's co-purchase neighborhood is:
      // triangles over wedges, exact basis points
      Graph.clusteringCoefficient(
        copurchaseEdges(s, dir),
        degrees = Some(copurchaseDegrees(s, dir)))
        .orderBy(col("coeff_bp").desc, col("triangles").desc, col("node"))
        .limit(30)),
    "q186_audience_overlap" -> ((s, dir) =>
      // pairwise user-set Jaccard between event types — membership
      // collapses to distinct (user, type) BEFORE any pairing
      Relational.audienceOverlap(T(s, dir, "events"), "user_id", "event_type")
        .orderBy("seg_a", "seg_b")),
    "q187_pivot" -> ((s, dir) =>
      // long-to-wide with an explicit value list: one aggregate pass,
      // schema fixed at plan time (no hidden distinct-collect job)
      Relational.pivotCounts(
        T(s, dir, "events").withColumn("day", TextFunctions.dayString(col("ts"))),
        "day", "event_type", Seq("click", "error", "purchase", "signup", "view"))
        .orderBy("day")),
    "q188_session_stats" -> ((s, dir) =>
      // dwell-time distribution over q57's gap sessions: discrete
      // percentiles on exact microsecond durations
      Relational.sessionStats(T(s, dir, "events"), "user_id", "ts")),
    "q189_rrf_fusion" -> ((s, dir) => {
      val docs = T(s, dir, "documents")
      val byText = TextAnalysis.bm25TopK(docs, "doc_id", "text",
        Seq("join", "filter", "scan"), k = 20).select(col("doc_id"), col("rank"))
      val byLen = docs.orderBy(col("n_chars").desc, col("doc_id")).limit(20)
        .withColumn("rank", row_number().over(
          org.apache.spark.sql.expressions.Window
            .orderBy(col("n_chars").desc, col("doc_id"))).cast("long"))
        .select(col("doc_id"), col("rank"))
      // calibration-free merge of the lexical and length signals; both
      // inputs are top-20 lists so the fusion runs on metadata
      TextAnalysis.rrfFusion(Seq(byText, byLen), "doc_id", "rank", k = 60)
        .orderBy("fused_rank")
    }),
    "q190_jsd" -> ((s, dir) =>
      // symmetric, smoothing-free drift between the month's two halves
      Stats.jsDivergence(
        T(s, dir, "events").withColumn("period",
          when(expr("CAST(ts AS DATE) < DATE '2024-01-16'"), "a").otherwise("b")),
        "event_type", "period")),
    "q191_kcore" -> ((s, dir) =>
      // dense-subgraph extraction: 3 bounded peel rounds at k=6 over the
      // co-purchase graph, survivors with their post-peel degree
      Graph.kCorePeel(
        copurchaseEdges(s, dir),
        k = 6, rounds = 3,
        initialDegrees = Some(copurchaseDegrees(s, dir)))
        .orderBy(col("deg").desc, col("node")).limit(50)),
    "q192_clamped_balance" -> ((s, dir) =>
      // credit-ledger fold per user: purchases draw down, everything else
      // accrues, the balance floors at zero — nonlinear, so no window
      // prefix-sum; pure long arithmetic end to end
      Stats.clampedBalance(
        T(s, dir, "events")
          .withColumn("delta",
            when(col("event_type") === "purchase",
              -expr("CAST(round(value * 100, 0) AS BIGINT)"))
              .otherwise(expr("CAST(round(value * 100, 0) AS BIGINT)"))),
        "user_id", Seq("ts", "event_id"), "delta")
        .orderBy("user_id")),
    "q193_max_concurrency" -> ((s, dir) =>
      // capacity peak over gap sessions: ±1 sweep through the two-phase
      // global prefix sum, starts ordering before ends at the same instant
      Relational.maxConcurrentSessions(T(s, dir, "events"), "user_id", "ts")),
    "q194_theil" -> ((s, dir) =>
      // inequality in order revenue BETWEEN nations vs WITHIN them; the
      // decomposition identity defines the reported total
      Stats.theilDecomposition(
        T(s, dir, "orders")
          .join(T(s, dir, "customer"),
            col("o_custkey") === col("c_custkey"))
          .join(broadcast(T(s, dir, "nation")),
            col("c_nationkey") === col("n_nationkey"))
          .withColumn("cents", expr("CAST(round(o_totalprice * 100, 0) AS BIGINT)")),
        "n_name", "cents")),
    "q195_weighted_median" -> ((s, dir) =>
      // the price the median traded UNIT moved at — quantity-weighted,
      // exact longs through the two-phase prefix sum
      Relational.weightedMedian(
        T(s, dir, "lineitem")
          .withColumn("cents", expr("CAST(round(l_extendedprice * 100, 0) AS BIGINT)")),
        "cents", "l_quantity", Seq("l_orderkey", "l_linenumber"))),
    "q196_lorenz" -> ((s, dir) =>
      // who holds the revenue: customers decile'd by spend via the
      // two-phase exact ntile, shares in exact basis points
      Stats.lorenzDeciles(
        T(s, dir, "orders")
          .groupBy(col("o_custkey"))
          .agg(expr("sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))").as("spend")),
        "spend", "o_custkey")
        .orderBy("decile")),
    "q197_trimmed_mean" -> ((s, dir) =>
      // tail-dropping robust center per type; discrete percentile bounds,
      // one exact division
      Stats.trimmedMean(
        T(s, dir, "events")
          .withColumn("cents", expr("CAST(round(value * 100, 0) AS BIGINT)")),
        "event_type", "cents")
        .orderBy("event_type")),
    "q198_mode" -> ((s, dir) =>
      // most common order priority per nation, ties to the lexicographic
      // first — the categorical profile column
      Stats.modePerGroup(
        T(s, dir, "orders")
          .join(T(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
          .join(broadcast(T(s, dir, "nation")),
            col("c_nationkey") === col("n_nationkey")),
        "n_name", "o_orderpriority")
        .orderBy("n_name")),
    "q199_streak" -> ((s, dir) =>
      // longest consecutive-day streak per user (gaps-and-islands),
      // summarized as a streak-length histogram
      Relational.longestStreak(T(s, dir, "events"), "user_id", "ts",
        origin = "2024-01-01")
        .groupBy(col("streak_days"))
        .agg(count(lit(1)).as("n_users"))
        .orderBy("streak_days")),
    "q200_holt" -> ((s, dir) =>
      // level + trend smoothing per type: the registry's only two-state
      // fold, struct accumulator with identical lambda text both engines
      Stats.holt(
        T(s, dir, "events")
          .withColumn("day", TextFunctions.dayString(col("ts")))
          .groupBy(col("event_type"), col("day"))
          .agg(count(lit(1)).as("x")),
        "event_type", "day", "x")
        .orderBy("event_type")),
    "q201_bfs_hops" -> ((s, dir) =>
      // reach profile from the busiest part: nodes first touched at each
      // hop, 3 bounded frontier expansions
      Graph.bfsHopCounts(
        copurchaseEdges(s, dir),
        maxHops = 3,
        degrees = Some(copurchaseDegrees(s, dir)))
        .orderBy("hop")),
    "q202_systematic" -> ((s, dir) =>
      // every-100th doc in (n_chars, doc_id) order — uniform coverage of
      // the length dimension via the two-phase exact global rank
      Curation.systematicSample(
        T(s, dir, "documents").select(col("doc_id"), col("n_chars")),
        Seq("n_chars", "doc_id"), k = 100)
        .select(col("doc_id"), col("n_chars"), col("rank"))
        .orderBy("rank")),
    "q203_entity_resolution" -> ((s, dir) => {
      // end-to-end MDM: blocked fuzzy matching (q127's pairs) → transitive
      // closure → one golden id per entity, singletons self-canonical
      import s.implicits._
      val base = T(s, dir, "customer").select(col("c_custkey"))
        .unionByName(Seq(900000001L, 900000002L).toDF("c_custkey"))
      val pairs = fuzzyCustomerPairs(s, dir)
        .select(col("key_a").as("id_a"), col("key_b").as("id_b"))
      val comp = Dedup.connectedComponents(pairs)
      val m = base.join(comp, base("c_custkey") === comp("node"), "left")
        .select(col("c_custkey"),
          coalesce(col("component"), col("c_custkey")).as("entity_id"))
      val sz = m.groupBy(col("entity_id")).agg(count(lit(1)).as("cluster_size"))
      m.join(sz, Seq("entity_id"))
        .select(col("c_custkey"), col("entity_id"),
          (col("c_custkey") === col("entity_id")).as("is_canonical"),
          col("cluster_size").cast("long").as("cluster_size"))
        .orderBy("c_custkey")
    }),
    "q204_bigram_lm" -> ((s, dir) =>
      // context-aware fluency score: Jelinek-Mercer interpolated bigram
      // NLL per document, unseen bigrams backed off to the unigram floor;
      // served from the SHARED materialized score table (q218 buckets the
      // same scores - the CCNet score-once shape)
      lmScores(s, dir).orderBy("doc_id")),
    "q205_srm" -> ((s, dir) =>
      // experiment-health gate per event type: deterministic user_id % 2
      // arms; the 5% flag decides on exact integers, chi2 is display-only
      Stats.sampleRatioMismatch(
        T(s, dir, "events").withColumn("arm", expr("pmod(user_id, 2)")),
        "event_type", "arm")
        .orderBy("event_type")),
    "q206_did" -> ((s, dir) =>
      // treatment effect net of the control drift: q205's deterministic
      // arms, the month's halves as pre/post, value cents as the outcome
      Stats.diffInDiff(
        T(s, dir, "events")
          .withColumn("arm", expr("pmod(user_id, 2)"))
          .withColumn("period",
            when(expr("CAST(ts AS DATE) < DATE '2024-01-16'"), "a").otherwise("b"))
          .withColumn("cents", expr("CAST(round(value * 100, 0) AS BIGINT)")),
        "arm", "period", "cents")),
    "q207_ks_drift" -> ((s, dir) =>
      // distribution-level arm health: exact-integer KS over value cents,
      // complements q205's count-level SRM
      Stats.ksDrift(
        T(s, dir, "events")
          .withColumn("arm", expr("pmod(user_id, 2)"))
          .withColumn("cents", expr("CAST(round(value * 100, 0) AS BIGINT)")),
        "arm", "cents")),
    "q208_auc" -> ((s, dir) =>
      // scorer quality readout: exact Mann-Whitney AUC of value cents as a
      // predictor of the purchase label — rank-free histogram formulation
      Stats.aucFromScores(
        T(s, dir, "events")
          .withColumn("is_purchase", col("event_type") === "purchase")
          .withColumn("cents", expr("CAST(round(value * 100, 0) AS BIGINT)")),
        "is_purchase", "cents")),
    "q209_silhouette" -> ((s, dir) =>
      // cluster validity over the labeled embedding table: sampled
      // silhouette, distances on the tenth-of-bp integer grid
      Similarity.silhouetteSampled(
        T(s, dir, "embeddings"), "vec_id", "embedding", "label", sampleMod = 4)
        .orderBy("vec_id")),
    "q210_chi2_assoc" -> ((s, dir) =>
      // is language independent of source? exact micro-unit chi-square
      // contribution per (lang, source) cell
      Stats.chi2Independence(T(s, dir, "documents"), "lang", "source")
        .orderBy("lang", "source")),
    "q211_calibration" -> ((s, dir) =>
      // reliability deciles: mean predicted score vs observed purchase
      // rate per clamped score decile
      Stats.calibrationBins(
        T(s, dir, "events")
          .withColumn("is_purchase", col("event_type") === "purchase")
          .withColumn("cents", expr("CAST(round(value * 100, 0) AS BIGINT)")),
        "is_purchase", "cents")
        .orderBy("bin")),
    "q212_recall_at_k" -> ((s, dir) => {
      // ANN eval harness: recall@5 of the IVF path (q58) against the exact
      // brute-force truth (q45) — the number that justifies nprobe/cell
      // choices before a recall target ships
      val emb = T(s, dir, "embeddings")
      val queries = emb.filter(col("vec_id") < 8)
      val truth = Similarity.cosineTopK(emb, queries, "vec_id", "embedding", 5)
        .select(col("query_id"), col("neighbor_id"))
      val approx = Similarity.ivfTopK(emb, queries, emb.filter(col("vec_id") < 16),
        "vec_id", "embedding", 5)
        .select(col("query_id").as("__aq"), col("neighbor_id").as("__an"))
      truth.join(approx,
          col("query_id") === col("__aq") && col("neighbor_id") === col("__an"),
          "left")
        .groupBy(col("query_id"))
        .agg(count(col("__an")).as("hits"))
        .select(col("query_id"), col("hits").cast("long").as("hits"),
          ops.Num.roundz(col("hits") / lit(5.0), 4).as("recall"))
        .orderBy("query_id")
    }),
    "q213_mann_kendall" -> ((s, dir) =>
      // monotonic-trend gate over the daily count series per event type;
      // pair join runs on the aggregated |days| frame, never raw events
      Stats.mannKendall(
        T(s, dir, "events")
          .groupBy(col("event_type"), expr("CAST(ts AS DATE)").as("day"))
          .agg(count(lit(1)).as("x")),
        "event_type", "day", "x")
        .orderBy("event_type")),
    "q214_readability" -> ((s, dir) =>
      // Flesch reading ease per doc — dictionary-free vowel-group syllables
      TextAnalysis.readability(T(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id")),
    "q215_log_odds_terms" -> ((s, dir) =>
      // per-source distinctive vocabulary: smoothed log-odds vs the rest of
      // the corpus, top-5 per source
      TextAnalysis.logOddsTerms(T(s, dir, "documents"), "source", "text", k = 5)
        .orderBy("source", "rank")),
    "q216_curation_funnel" -> ((s, dir) =>
      // survival counts through the cumulative cleaning gates — one pass
      Curation.curationFunnel(T(s, dir, "documents"), "text", "lang", "n_chars")
        .orderBy("stage_idx")),
    "q217_neardup_rate" -> ((s, dir) => {
      // corpus-health readout: per source, share of docs with >= 1 minhash
      // near-dup candidate (q44's banding, est_jaccard >= 0.25)
      val docs = T(s, dir, "documents")
      val pairs = Dedup.minHashNearDup(docs, "doc_id", "text",
        shingleK = 2, numHashes = 16, bands = 8, threshold = 0.25)
      val ids = pairs.select(col("id_a").as("doc_id"))
        .union(pairs.select(col("id_b").as("doc_id"))).distinct()
        .withColumn("__dup", lit(1L))
      docs.join(ids, Seq("doc_id"), "left")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(coalesce(col("__dup"), lit(0L))).as("n_dup"))
        .select(col("source"), col("n_docs").cast("long").as("n_docs"),
          col("n_dup").cast("long").as("n_dup"),
          ops.Num.roundz(col("n_dup").cast("double") / col("n_docs").cast("double"), 4)
            .as("dup_rate"))
        .orderBy("source")
    }),
    "q218_lm_buckets" -> ((s, dir) => {
      // CCNet-style corpus split: exact terciles of the q204 bigram-LM
      // score (head = fluent, tail = noisy), two-phase rank — no global
      // window; mean rides exact scaled ints
      val scores = lmScores(s, dir)
      val (ranked, n) = graft.ops.TwoPhase.globalRank(scores, col("avg_nll"),
        Seq(col("avg_nll"), col("doc_id")), "__rank")
      ranked
        .withColumn("bucket",
          graft.ops.TwoPhase.ntileFromRank("__rank", n, 3).cast("long"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n_docs"),
          min("avg_nll").as("min_nll"), max("avg_nll").as("max_nll"),
          sum(ops.Num.roundz(col("avg_nll") * 10000, 0).cast("long")).as("__s"))
        .select(col("bucket"), col("n_docs").cast("long").as("n_docs"),
          col("min_nll"), col("max_nll"),
          ops.Num.roundz(col("__s").cast("double") /
            (col("n_docs").cast("double") * lit(10000.0)), 4).as("mean_nll"))
        .orderBy("bucket")
    }),
    "q219_pettitt" -> ((s, dir) =>
      // nonparametric changepoint LOCATION per event type (q170's CUSUM
      // says THAT it drifted; Pettitt says WHERE) — exact U_t via the
      // interval-add identity over the aggregated day series
      Stats.pettittChangepoint(
        T(s, dir, "events")
          .groupBy(col("event_type"), expr("CAST(ts AS DATE)").as("day"))
          .agg(count(lit(1)).as("x")),
        "event_type", "day", "x")
        .orderBy("event_type")),
    "q220_cross_corr" -> ((s, dir) =>
      // lead/lag readout: do views at day t predict purchases at t+lag?
      Stats.crossCorrLagged(
        T(s, dir, "events")
          .groupBy(expr("CAST(ts AS DATE)").as("day"))
          .agg(sum(when(col("event_type") === "view", 1L).otherwise(0L)).as("views"),
            sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
              .as("purchases")),
        "day", "views", "purchases", maxLag = 3)
        .orderBy("lag")),
    "q221_group_ks" -> ((s, dir) =>
      // segment-level drift table: each event type's value-cents
      // distribution vs the rest of the corpus
      Stats.ksDriftByGroup(
        T(s, dir, "events")
          .withColumn("cents", expr("CAST(round(value * 100, 0) AS BIGINT)")),
        "event_type", "cents")
        .orderBy("event_type")),
    "q222_ttr" -> ((s, dir) =>
      // lexical diversity per doc: type-token ratio — the boilerplate /
      // keyword-spam signal complementing q140's entropy (TTR is
      // length-sensitive where entropy is distribution-sensitive)
      T(s, dir, "documents")
        .select(col("doc_id"),
          explode(split(lower(col("text")), "\\s+")).as("__t"))
        .filter(length(col("__t")) > 0)
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("__n"), count_distinct(col("__t")).as("__d"))
        .select(col("doc_id"), col("__n").cast("long").as("n_tokens"),
          col("__d").cast("long").as("n_types"),
          ops.Num.roundz(col("__d").cast("double") / col("__n").cast("double"), 4)
            .as("ttr"))
        .orderBy("doc_id")),
    "q223_bpe_merges" -> ((s, dir) => {
      // BPE vocabulary learning (ops/Bpe.scala) gets its gate key: k = 8
      // bounded merges over the word-frequency table. Each step is one
      // distributed pair-count aggregate with map-side combine plus a 1-row
      // argmax collect (metadata, not data) — the corpus is scanned once,
      // ever, to build the |vocab|-sized word table. The oracle unrolls the
      // same k steps as chained CTEs (see [[bpeOracleSql]]).
      import s.implicits._
      Bpe.learnMerges(T(s, dir, "documents"), "text", k = 8)
        .zipWithIndex
        .map { case ((p1, p2, cnt), i) => (i + 1L, p1, p2, cnt) }
        .toDF("rank", "p1", "p2", "cnt")
        .orderBy("rank")
    }),
    "q224_pq_search" -> ((s, dir) => {
      // ADC search over the q116 PQ codes — the query path that completes
      // the ANN triple (LSH buckets / IVF cells / PQ codes): per query an
      // m×K LUT of quantized sub-distances, candidate distance = m exact
      // long lookups summed, ranking via the two-phase k-heap
      val emb = T(s, dir, "embeddings")
      val cb = emb.filter(col("vec_id") < 8)
      val codes = Similarity.pqEncode(emb, cb, "vec_id", "embedding",
        m = 4, subDim = 16)
      Similarity.pqSearchTopK(codes, emb.filter(col("vec_id") < 8), cb,
        "vec_id", "embedding", m = 4, subDim = 16, k = 5)
        .orderBy("query_id", "rn")
    }),
    "q225_pq_recall" -> ((s, dir) => {
      // recall@5 of the PQ/ADC path against q45's exact brute-force truth —
      // the q212 harness pointed at the third ANN index; the number that
      // justifies m/subDim before a recall target ships
      val emb = T(s, dir, "embeddings")
      val queries = emb.filter(col("vec_id") < 8)
      val truth = Similarity.cosineTopK(emb, queries, "vec_id", "embedding", 5)
        .select(col("query_id"), col("neighbor_id"))
      val codes = Similarity.pqEncode(emb, queries, "vec_id", "embedding",
        m = 4, subDim = 16)
      val approx = Similarity.pqSearchTopK(codes, queries, queries,
        "vec_id", "embedding", m = 4, subDim = 16, k = 5)
        .select(col("query_id").as("__aq"), col("neighbor_id").as("__an"))
      truth.join(approx,
          col("query_id") === col("__aq") && col("neighbor_id") === col("__an"),
          "left")
        .groupBy(col("query_id"))
        .agg(count(col("__an")).as("hits"))
        .select(col("query_id"), col("hits").cast("long").as("hits"),
          ops.Num.roundz(col("hits") / lit(5.0), 4).as("recall"))
        .orderBy("query_id")
    }),
    "q226_link_predict" -> ((s, dir) =>
      // Resource-Allocation link prediction over the co-purchase graph:
      // which part pairs are NOT co-purchased but structurally implied by
      // shared neighbors. Scaled-long contributions (order-free integer
      // sums), wedge fan-out map-side from sorted neighbor arrays, one
      // (u,v)-keyed aggregate, anti-join vs existing edges, distributed
      // TakeOrdered top-k. The relation is TIME-WINDOWED (one ship year) —
      // candidate generation runs on recent activity by design: wedge
      // volume is Σ deg², and the full-history graph's mean degree grows
      // with corpus age while the recommendation signal does not (the
      // whole-history variant measured 37 s vs ~1 s here at sf0.1, all of
      // it wedge shuffle)
      Graph.resourceAllocationTopK(
        Graph.coOccurrenceEdges(
          T(s, dir, "lineitem").filter(
            col("l_shipdate") >= lit("1995-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1996-01-01").cast("timestamp")),
          "l_partkey", "l_orderkey"),
        k = 20)
        .select(col("u"), col("v"), col("score"))),
    "q227_bpe_encode" -> ((s, dir) => {
      // the q223 learner's natural pair: ENCODE the corpus with the learned
      // merges — token counting under a learned tokenizer, the per-doc
      // budget signal a training pipeline actually bills by. Merges are
      // driver-side metadata (k rows); the encode is one map-side
      // projection (chained codegen'd folds), no join, no shuffle beyond
      // the output sort
      val docs = T(s, dir, "documents")
      val merges = Bpe.learnMerges(docs, "text", k = 8)
        .map { case (p1, p2, _) => (p1, p2) }
      // encodeRanked, not the fold-chain encode: the rank loop ships the
      // merge table once per partition and costs O(|word|·k) per word with
      // NO per-merge plan growth — the fold chain measured 20 s at sf0.1
      // vs ~2 s here (equivalence on learner output proven in BpeSpec)
      Bpe.encodeRanked(docs.select(col("doc_id"), col("text")),
          "doc_id", "text", merges)
        .select(col("doc_id"),
          size(col("tokens")).cast("long").as("n_tokens"),
          concat_ws(" ", col("tokens")).as("tokens_s"))
        .orderBy("doc_id")
    }),
    "q228_image_dhash" -> ((s, dir) => {
      // IMAGE near-duplicate detection under the gate: per doc a 9×7
      // gradient PNG is synthesized (pixel value a pure function of
      // doc_id % 50 and position, so ~50 planted duplicate groups), REAL
      // ImageIO decode + 56-bit difference hash per partition, then dedup
      // is a hash groupBy — never pairwise pixel comparison. The oracle
      // predicts every gradient bit arithmetically
      import s.implicits._
      val imgs = T(s, dir, "documents").select(col("doc_id"))
        .as[Long].mapPartitions(_.map { id =>
          val g = id % 50
          (id, Multimodal.synthPngPixels(9, 7, (x, y) =>
            { val v = ((g * 13 + x * (y + 3)) % 256).toInt; (v << 16) | (v << 8) | v }))
        }).toDF("doc_id", "payload")
      Multimodal.dHash56(imgs, "doc_id")
        .groupBy(col("dhash"))
        .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("keeper_id"))
        .filter(col("n_docs") >= 2)
        .orderBy("dhash")
    }),
    "q229_negative_sample" -> ((s, dir) => {
      // deterministic negative sampling for training pairs: per customer,
      // 5 hash-derived candidate parts, minus anything actually purchased
      // (anti-join on the positive set). Hash is plain integer arithmetic
      // so any engine reproduces it bit-for-bit; the anti-join shuffles on
      // the (custkey, partkey) key — no randomness, no driver loop
      val positives = T(s, dir, "orders")
        .join(T(s, dir, "lineitem"), col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("c"), col("l_partkey").as("p")).distinct()
      val maxP = T(s, dir, "part").agg(max(col("p_partkey")).as("__maxp"))
      T(s, dir, "orders").select(col("o_custkey").as("c")).distinct()
        .crossJoin(broadcast(maxP))
        .select(col("c"), col("__maxp"), explode(sequence(lit(0L), lit(4L))).as("sample_idx"))
        .withColumn("p",
          expr("((c * 2654435761 + sample_idx * 40503 + 12345) % 1000000007) % __maxp + 1"))
        .join(positives, Seq("c", "p"), "left_anti")
        .select(col("c").as("c_custkey"), col("sample_idx"), col("p").as("neg_partkey"))
        .orderBy("c_custkey", "sample_idx")
    }),
    "q230_nb_classify" -> ((s, dir) => {
      // supervised curation gate trained in-engine: multinomial Naive Bayes
      // over whitespace tokens, lang as the class — train on doc_id % 5 <> 0,
      // score the held-out fifth. Integer micro-nat weights make every score
      // an exact long sum (q224's ADC discipline), so the argmax — and the
      // per-doc hit flag against the true label — is deterministic
      val docs = T(s, dir, "documents")
      TextAnalysis.naiveBayes(
          docs.filter(col("doc_id") % 5 =!= 0),
          docs.filter(col("doc_id") % 5 === 0),
          "doc_id", "text", "lang")
        .orderBy("doc_id")
    }),
    "q231_containment" -> ((s, dir) =>
      // asymmetric sub-document duplication: directed |A∩B|/|A| over the
      // q49 candidate generator — catches the quoted-paragraph/template
      // cases symmetric Jaccard structurally misses. Same doc_id slice and
      // df-cap as q49 so bucket volume stays maxShingleDf²-bounded
      Dedup.ngramContainment(T(s, dir, "documents").filter(col("doc_id") < 100),
        "doc_id", "text", k = 2, threshold = 0.5)
        .orderBy("src_id", "dst_id")),
    "q232_seasonal_error" -> ((s, dir) =>
      // seasonal-naive backtest on the daily event series: the exact
      // integer error floor (SAE longs, floor-divided MAPE basis points)
      // that gates trust in the smoothing forecasts (q200/q181)
      Stats.seasonalNaiveError(
        T(s, dir, "events")
          .groupBy(col("event_type"), to_date(col("ts")).as("day"))
          .agg(count(lit(1)).as("c")),
        "event_type", "day", "c", season = 7)
        .orderBy("event_type")),
    "q233_minhash_recall" -> ((s, dir) => {
      // the dedup family's eval loop (q212/q225's role for ANN): plant
      // HARD near-dups — each variant keeps only the first half of the
      // doc's words, putting exact Jaccard near the 8-band × 2-row LSH
      // curve's steep region (j ≈ 0.5 → P(catch) = 1−(1−j²)⁸ ≈ 0.9) so
      // recall < 1 actually measures band-collision physics, not a
      // foregone conclusion. Truth = exact Jaccard ≥ 0.25 computed ONLY on
      // the planted pair mapping — a keyed (shingle, id→id+100000) join,
      // never all-pairs
      val base = T(s, dir, "documents").filter(col("doc_id") < 300)
        .select(col("doc_id"), col("text"))
      val variants = base.filter(col("doc_id") % 3 === 0)
        .select((col("doc_id") + 100000L).as("doc_id"),
          expr("concat_ws(' ', slice(split(text, '\\\\s+'), 1, " +
            "(size(split(text, '\\\\s+')) + 1) div 2))").as("text"))
      val corp = base.unionByName(variants)
      val mh = Dedup.minHashNearDup(corp, "doc_id", "text",
        shingleK = 2, numHashes = 16, bands = 8, threshold = 0.25)
        .select("id_a", "id_b")
      val sh = Dedup.wordShingles(corp, "doc_id", "text", 2)
      val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
      val shared = sh.as("x").join(sh.as("y"),
          col("y.shingle") === col("x.shingle") &&
            col("y.doc_id") === col("x.doc_id") + 100000L)
        .filter(col("x.doc_id") < 300 && col("x.doc_id") % 3 === 0)
        .groupBy(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"))
        .agg(count(lit(1)).as("shared"))
      val truth = shared
        .join(sizes.select(col("doc_id").as("id_a"), col("n").as("na")), "id_a")
        .join(sizes.select(col("doc_id").as("id_b"), col("n").as("nb")), "id_b")
        .filter(ops.Num.roundz(col("shared").cast("double") /
          (col("na") + col("nb") - col("shared")), 4) >= 0.25)
        .select("id_a", "id_b")
      val caught = truth.join(mh, Seq("id_a", "id_b"))
      truth.agg(count(lit(1)).as("n_truth"))
        .crossJoin(broadcast(caught.agg(count(lit(1)).as("n_caught"))))
        .select(col("n_truth"), col("n_caught"),
          ops.Num.roundz(col("n_caught").cast("double") / col("n_truth"), 4)
            .as("recall"))
    }),
    "q234_bpe_fertility" -> ((s, dir) => {
      // tokens-per-word under the LEARNED tokenizer, per language — the
      // fertility curve a multilingual mix is budgeted by. Reuses the
      // q223 learner + q227 encodeRanked (merge table ships once per
      // partition); the per-lang aggregate is exact longs, one 4-dp ratio
      val docs = T(s, dir, "documents")
      val merges = Bpe.learnMerges(docs, "text", k = 8)
        .map { case (p1, p2, _) => (p1, p2) }
      val enc = Bpe.encodeRanked(docs.select(col("doc_id"), col("text")),
          "doc_id", "text", merges)
        .select(col("doc_id"), size(col("tokens")).cast("long").as("n_bpe_doc"))
      docs.select(col("doc_id"), col("lang"),
          TextAnalysis.tokenCount(col("text")).as("n_words_doc"))
        .join(enc, "doc_id")
        .groupBy(col("lang"))
        .agg(sum(col("n_words_doc")).as("n_words"), sum(col("n_bpe_doc")).as("n_bpe"))
        .filter(col("n_words") > 0)
        .select(col("lang"), col("n_words").cast("long").as("n_words"),
          col("n_bpe").cast("long").as("n_bpe"),
          ops.Num.roundz(col("n_bpe").cast("double") / col("n_words"), 4)
            .as("fertility"))
        .orderBy("lang")
    }),
    "q235_centroid_classify" -> ((s, dir) =>
      // embedding-quality readout: per-label centroids, nearest-centroid
      // assignment, confusion matrix — exact micro-long arithmetic end to
      // end (quantize once, floor-div centroids, long squared distances)
      Similarity.nearestCentroid(T(s, dir, "embeddings"),
          "vec_id", "embedding", "label")
        .orderBy("label", "pred_label")),
    "q236_audio_segments" -> ((s, dir) => {
      // REAL voice-activity segmentation under the gate: per doc a WAV of
      // (n_chars%8+4) 100-sample blocks is synthesized — block b silent
      // when (doc_id+b)%3=0, else constant amplitude doc_id%20000+500 —
      // and silenceSegments genuinely parses the RIFF container and scans
      // the PCM. The oracle predicts every block flag arithmetically
      import s.implicits._
      val wavs = T(s, dir, "documents").select(col("doc_id"), col("n_chars"))
        .as[(Long, Long)].mapPartitions(_.map { case (id, nc) =>
          val nb = (nc % 8 + 4).toInt
          val amp = (id % 20000 + 500).toShort
          val samples = Array.tabulate[Short](nb * 100) { i =>
            if ((id + i / 100) % 3 == 0) 0 else amp
          }
          (id, Multimodal.synthWavSamples(samples, 16000))
        }).toDF("doc_id", "payload")
      Multimodal.silenceSegments(wavs, "doc_id", blockSamples = 100,
          threshold = 250)
        .orderBy("doc_id")
    }),
    "q237_personalized_pr" -> ((s, dir) =>
      // recommendation-from-seeds: restart mass pinned to the seed items
      // (partkey % 97 = 0) over the q120 co-purchase graph; same exact
      // scaled-long damping, top-20 neighborhood via TakeOrdered
      Graph.personalizedPageRank(
          copurchaseEdges(s, dir),
          seedPred = col("src") % 97 === 0, iterations = 3)
        .select(col("node").as("p_partkey"), col("rank").as("rank_scaled"))
        .orderBy(col("rank_scaled").desc, col("p_partkey")).limit(20)),
    "q238_kappa_agreement" -> ((s, dir) => {
      // do the q50 heuristic and the q230 trained classifier actually
      // agree? Cohen's kappa on the scored split via the rational identity
      // kappa = (n·agree − Σr·c)/(n² − Σr·c): every count exact, products
      // on decimal(38,0), ONE display division
      val dec = "decimal(38,0)"
      val docs = T(s, dir, "documents")
      val nb = TextAnalysis.naiveBayes(
        docs.filter(col("doc_id") % 5 =!= 0), docs.filter(col("doc_id") % 5 === 0),
        "doc_id", "text", "lang")
      val pairs = docs.filter(col("doc_id") % 5 === 0)
        .select(col("doc_id"), TextAnalysis.langId(col("text")).as("a"))
        .join(nb.select(col("doc_id"), col("pred_label").as("b")), "doc_id")
        .localCheckpoint(eager = false)
      val tot = pairs.agg(count(lit(1)).as("n"),
        sum(when(col("a") === col("b"), 1L).otherwise(0L)).as("ag"))
      val ra = pairs.groupBy(col("a")).agg(count(lit(1)).as("r"))
      val cb = pairs.groupBy(col("b")).agg(count(lit(1)).as("c"))
      val pe = ra.join(cb, col("a") === col("b"))
        .agg(coalesce(sum(col("r").cast(dec) * col("c")), lit(0L).cast(dec)).as("sm"))
      tot.crossJoin(broadcast(pe))
        .filter(col("n").cast(dec) * col("n") > col("sm"))
        .select(col("n").cast("long").as("n"), col("ag").cast("long").as("n_agree"),
          col("sm").cast("long").as("pe_num"),
          ops.Num.roundz((col("n").cast(dec) * col("ag") - col("sm")).cast("double") /
            (col("n").cast(dec) * col("n") - col("sm")).cast("double"), 4).as("kappa"))
    }),
    "q239_label_outliers" -> ((s, dir) =>
      // corrupted-embedding sweep with PLANTED corruption: vec_id % 50 = 0
      // rows are ×4-scaled (a power of two — float math exact in BOTH
      // engines, no single-vs-double rounding skew), modeling a
      // wrong-normalization batch. Measured separation: clean ratios
      // ≤ 1.11, planted ≥ 8.8 → factor 4 flags exactly the planted set.
      // Exact micro-long distances, decimal cross-product flag, no division
      Similarity.centroidOutliers(
          T(s, dir, "embeddings").select(col("vec_id"), col("label"),
            when(col("vec_id") % 50 === 0,
              expr("transform(embedding, x -> x * CAST(4 AS FLOAT))"))
              .otherwise(col("embedding")).as("embedding")),
          "vec_id", "embedding", "label")
        .orderBy("vec_id")),
    "q240_textrank" -> ((s, dir) => {
      // graph-based keyword extraction (TextRank): adjacent-word pairs
      // with corpus count ≥ 3 form the word graph (the df-cap discipline
      // inverted — RARE pairs drop, bounding the graph to recurring
      // collocations), then the q120 PageRank machinery runs verbatim on
      // word nodes — exact scaled-long damping, top-20 via TakeOrdered
      val pairs = T(s, dir, "documents")
        .withColumn("__w", split(lower(col("text")), "\\s+"))
        .filter(size(col("__w")) >= 2)
        .select(explode(transform(sequence(lit(1), size(col("__w")) - 1),
          i => struct(element_at(col("__w"), i).as("a"),
            element_at(col("__w"), i + 1).as("b")))).as("p"))
        .select(col("p.a").as("a"), col("p.b").as("b"))
        .filter(col("a") =!= col("b") && length(col("a")) > 0 && length(col("b")) > 0)
        .groupBy(col("a"), col("b")).agg(count(lit(1)).as("c"))
        .filter(col("c") >= 3)
      val edges = pairs.select(col("a").as("src"), col("b").as("dst"))
        .unionByName(pairs.select(col("b").as("src"), col("a").as("dst")))
        .distinct()
      Graph.pageRank(edges, iterations = 3)
        .select(col("node").as("word"), col("rank").as("rank_scaled"))
        .orderBy(col("rank_scaled").desc, col("word")).limit(20)
    }),
    "q241_emd_drift" -> ((s, dir) =>
      // q221's KS table, integrated: earth-mover distance of each event
      // type's value-cents distribution vs the rest — prices how much
      // value MOVED, not just the worst CDF gap; exact gap-weighted
      // cross-multiplied integers on decimal(38,0)
      Stats.emdDriftByGroup(
        T(s, dir, "events")
          .withColumn("cents", expr("CAST(round(value * 100, 0) AS BIGINT)")),
        "event_type", "cents")
        .orderBy("event_type")),
    "q242_novelty" -> ((s, dir) =>
      // the corpus-order novelty curve: share of each doc's bigrams first
      // seen IN that doc — per-doc complement of the pairwise near-dup
      // gates (catches fragment-assembled docs that evade every pairwise
      // check); floor basis points, one min-aggregate + one keyed join
      Dedup.noveltyByDoc(T(s, dir, "documents"), "doc_id", "text", k = 2)
        .orderBy("doc_id")),
    "q243_stream_quota" -> ((s, dir) =>
      // per-(user, hour) ingestion quota as a custom-state stream: ledgers
      // emit exactly once on watermark close; replay equals the batch
      // least(n, quota) twin because admission counts, not per-event
      // verdicts, are the contract (order-independent by construction)
      Streaming.quotaReplay(s, dir, s"$TMP/q243_src", maxPerHour = 1)
        .orderBy("user_id", "hour_start")),
    "q244_welch_t" -> ((s, dir) =>
      // per-metric two-arm mean test with unequal variances (the
      // experiment default): exact long/decimal sufficient stats, one
      // shared double chain for t and the Welch–Satterthwaite df
      Stats.welchTTest(
        T(s, dir, "events")
          .withColumn("arm", pmod(col("user_id"), lit(2L)))
          .withColumn("cents", expr("CAST(round(value * 100, 0) AS BIGINT)")),
        "event_type", "arm", "cents")
        .orderBy("event_type")),
    "q245_bh_fdr" -> ((s, dir) => {
      // multiple-testing correction over the q221 drift family: KS
      // asymptotic p per segment (identical formula text both engines,
      // from exact integer inputs), then Benjamini–Hochberg at 5% FDR
      val ks = Stats.ksDriftByGroup(
        T(s, dir, "events")
          .withColumn("cents", expr("CAST(round(value * 100, 0) AS BIGINT)")),
        "event_type", "cents")
      val withP = ks.select(col("event_type"),
        least(lit(1.0), lit(2.0) * exp(lit(-2.0) *
          col("d_num").cast("double") * col("d_num").cast("double") /
          (col("n_group").cast("double") * col("n_rest").cast("double") *
            (col("n_group") + col("n_rest")).cast("double")))).as("p"))
      Stats.bhAdjust(withP, "event_type", "p")
        .select(col("event_type"), ops.Num.roundz(col("p"), 4).as("p"),
          col("rank"), col("rejected"))
        .orderBy("rank")
    }),
    "q246_ivfpq_search" -> ((s, dir) => {
      // the composed production index (FAISS-style IVFx,PQy): IVF cell
      // pruning bounds the candidate set, then only candidates pay the
      // m-lookup ADC sum — the ANN capstone over q58's cells and q224's
      // codes, same exact tenth-basis-point long distances
      val emb = T(s, dir, "embeddings")
      Similarity.ivfPqTopK(emb, emb.filter(col("vec_id") < 8),
          centroids = emb.filter(col("vec_id") < 16),
          codebook = emb.filter(col("vec_id") < 8),
          "vec_id", "embedding", m = 4, subDim = 16, k = 5, nprobe = 2)
        .orderBy("query_id", "rn")
    }),
    "q247_best_threshold" -> ((s, dir) =>
      // operating-point selection: the doc-length cutoff that best
      // predicts the majority language — the F1 sweep runs on the score
      // HISTOGRAM via two descending two-phase prefix sums; exact micro-F1
      // argmax, ties to the larger threshold
      Stats.bestF1Threshold(
        T(s, dir, "documents").select(col("n_chars"), (col("lang") === "en").as("is_en")),
        "is_en", "n_chars")),
    "q248_stream_trending" -> ((s, dir) =>
      // per-day trending-item leaderboard from a watermarked append-mode
      // windowed count; top-3 ranked batch-side over the emitted window
      // rows (bounded by the item domain, never raw events)
      Streaming.trendingReplay(s, dir, s"$TMP/q248_src", topK = 3)
        .orderBy("day_start", "rn")),
    "q249_bpe_curve" -> ((s, dir) => {
      // the tokenizer-tuning readout: tokens-per-word as merges accumulate
      // (k = 0/2/4/8) — the curve that decides how many merges a budget
      // buys. Merges learned ONCE on the full corpus (greedy BPE nests, so
      // take(k) is exactly the k-merge vocabulary); each k is one encode
      // pass over a fixed doc slice; counts exact longs
      val docs = T(s, dir, "documents")
      val slice = docs.filter(col("doc_id") < 400).select(col("doc_id"), col("text"))
      val merges = Bpe.learnMerges(docs, "text", k = 8)
        .map { case (p1, p2, _) => (p1, p2) }
      val words = slice
        .agg(sum(TextAnalysis.tokenCount(col("text"))).as("n_words"))
      Seq(0, 2, 4, 8).map { k =>
        Bpe.encodeRanked(slice, "doc_id", "text", merges.take(k))
          .agg(sum(size(col("tokens"))).cast("long").as("n_tokens"))
          .select(lit(k.toLong).as("k"), col("n_tokens"))
      }.reduce(_ unionByName _)
        .crossJoin(broadcast(words))
        .select(col("k"), col("n_tokens"), col("n_words").cast("long").as("n_words"),
          ops.Num.roundz(col("n_tokens").cast("double") / col("n_words"), 4)
            .as("tokens_per_word"))
        .orderBy("k")
    }),
    "q250_modularity" -> ((s, dir) => {
      // clustering-health gate for the near-dup graph: modularity of the
      // connected-component partition — near 1 ⇒ healthy forest of small
      // clusters, near 0 ⇒ one over-merged blob (the alarm a banding or
      // threshold change must be gated on); pairs AND components from the
      // shared materialized index
      val (pairs, comp) = dedupIndex(s, dir)
      Graph.modularity(pairs.select("id_a", "id_b"), comp)
    }),
    "q251_fk_audit" -> ((s, dir) =>
      // post-load referential-integrity contract: the three real TPC-H
      // FK chains plus the cross-domain probe events.user_id → customer —
      // the event stream's user space carries NO FK guarantee, so the
      // audit MEASURES it instead of assuming either way (intact today,
      // and a generator change that breaks it shows up as orphan counts,
      // not as silently-wrong joins downstream)
      Profiling.fkAudit(Seq(
        ("lineitem.orderkey", T(s, dir, "lineitem"), "l_orderkey",
          T(s, dir, "orders"), "o_orderkey"),
        ("orders.custkey", T(s, dir, "orders"), "o_custkey",
          T(s, dir, "customer"), "c_custkey"),
        ("customer.nationkey", T(s, dir, "customer"), "c_nationkey",
          T(s, dir, "nation"), "n_nationkey"),
        ("events.user_id", T(s, dir, "events"), "user_id",
          T(s, dir, "customer"), "c_custkey")))
        .orderBy("relation")),
    "q252_seq_monitor" -> ((s, dir) =>
      // the peeking curve per metric: first day the running two-arm count
      // difference crosses the 5% bound (exact-integer crossing — the SRM
      // convention) + the final state; exposes across-time multiple-looks
      // inflation the way q245 exposes the across-metrics kind
      Stats.sequentialMonitor(
        T(s, dir, "events")
          .withColumn("arm", pmod(col("user_id"), lit(2L)))
          .withColumn("day", to_date(col("ts"))),
        "event_type", "arm", "day")
        .orderBy("event_type")),
    "q253_cuped" -> ((s, dir) =>
      // variance-reduced readout: per-user pre-period spend is the
      // covariate, θ pooled, adjusted diff = raw − θ·(pre-period
      // imbalance); the pre/post boundary anchors on min(day) + 15 so a
      // testdata regeneration moves the split with it
      Stats.cuped(
        T(s, dir, "events")
          .withColumn("arm", pmod(col("user_id"), lit(2L)))
          .withColumn("day", to_date(col("ts")))
          .withColumn("cents", expr("CAST(round(value * 100, 0) AS BIGINT)")),
        "user_id", "arm", "day", "cents")),
    "q254_lsh_curve" -> ((s, dir) => {
      // the empirical LSH collision curve: q233's eval with THREE planted
      // cohorts (half-truncate j≈0.5, three-quarter-keep j≈0.75, one-word
      // append j≈0.95), recall reported PER exact-Jaccard band — the
      // measurement that verifies the 1−(1−j²)⁸ S-curve end to end and
      // prices a banding change before it ships
      val base = T(s, dir, "documents").filter(col("doc_id") < 300)
        .select(col("doc_id"), col("text"))
      val words = "split(text, '\\\\s+')"
      val variants = base.select((col("doc_id") + 100000L).as("doc_id"),
        when(col("doc_id") % 3 === 0,
          expr(s"concat_ws(' ', slice($words, 1, (size($words) + 1) div 2))"))
          .when(col("doc_id") % 3 === 1,
            expr(s"concat_ws(' ', slice($words, 1, (3 * size($words) + 3) div 4))"))
          .otherwise(concat(col("text"), lit(" zzplantdup"))).as("text"))
      val corp = base.unionByName(variants)
      val mh = Dedup.minHashNearDup(corp, "doc_id", "text",
        shingleK = 2, numHashes = 16, bands = 8, threshold = 0.25)
        .select("id_a", "id_b")
      val sh = Dedup.wordShingles(corp, "doc_id", "text", 2)
      val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
      val truth = sh.as("x").join(sh.as("y"),
          col("y.shingle") === col("x.shingle") &&
            col("y.doc_id") === col("x.doc_id") + 100000L)
        .filter(col("x.doc_id") < 300)
        .groupBy(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"))
        .agg(count(lit(1)).as("shared"))
        .join(sizes.select(col("doc_id").as("id_a"), col("n").as("na")), "id_a")
        .join(sizes.select(col("doc_id").as("id_b"), col("n").as("nb")), "id_b")
        .filter(ops.Num.roundz(col("shared").cast("double") /
          (col("na") + col("nb") - col("shared")), 4) >= 0.25)
        .select(col("id_a"), col("id_b"),
          least(expr("(4 * shared) div (na + nb - shared)"), lit(3L)).as("band"))
      val caught = truth.join(mh, Seq("id_a", "id_b"))
        .groupBy(col("band")).agg(count(lit(1)).as("n_caught"))
      truth.groupBy(col("band")).agg(count(lit(1)).as("n_truth"))
        .join(caught, Seq("band"), "left")
        .select(col("band").cast("long").as("band"),
          col("n_truth").cast("long").as("n_truth"),
          coalesce(col("n_caught"), lit(0L)).cast("long").as("n_caught"),
          ops.Num.roundz(coalesce(col("n_caught"), lit(0L)).cast("double") /
            col("n_truth"), 4).as("recall"))
        .orderBy("band")
    }),
    "q255_dedup_funnel" -> ((s, dir) => {
      // which gate earns its cost: per-gate survivor counts over the SAME
      // corpus (raw / exact text / minhash components with one keeper per
      // component) — the comparison table a dedup-recipe decision reads,
      // complementing q216's sequential curation funnel. Near-dup
      // survivors = docs − (pair-graph nodes − components): docs outside
      // the pair graph survive untouched, count-sized arithmetic only
      val docs = T(s, dir, "documents")
      val nDocs = docs.agg(count(lit(1)).as("docs"))
      val exact = docs.agg(count_distinct(col("text")).as("survivors"))
      val (_, comp) = dedupIndex(s, dir)
      val nd = comp
        .agg(count(lit(1)).as("nodes"), count_distinct(col("component")).as("comps"))
      nDocs.select(lit("a_raw").as("gate"), col("docs").as("docs_in"),
          col("docs").as("survivors"))
        .unionByName(nDocs.crossJoin(broadcast(exact))
          .select(lit("b_exact_text").as("gate"), col("docs").as("docs_in"),
            col("survivors")))
        .unionByName(nDocs.crossJoin(broadcast(nd))
          .select(lit("c_minhash_components").as("gate"), col("docs").as("docs_in"),
            (col("docs") - (col("nodes") - col("comps"))).as("survivors")))
        .select(col("gate"), col("docs_in").cast("long").as("docs_in"),
          col("survivors").cast("long").as("survivors"),
          (col("docs_in") - col("survivors")).cast("long").as("removed"))
        .orderBy("gate")
    }),
    "q256_ivfpq_recall" -> ((s, dir) => {
      // the composed IVF+PQ index measured HONESTLY: centroids and codebook
      // come from corpus slices DISJOINT from the query set (q246's gate
      // config trains the codebook on the queries themselves — right for
      // the equivalence proof, self-referential as a recall number), so
      // this is the recall@5 an nprobe×m trade-off would actually be tuned
      // by — q212 (IVF) and q225 (PQ) closed per-path; this closes the
      // composition
      val emb = T(s, dir, "embeddings")
      val queries = emb.filter(col("vec_id") < 8)
      val truth = Similarity.cosineTopK(emb, queries, "vec_id", "embedding", 5)
        .select(col("query_id"), col("neighbor_id"))
      val approx = Similarity.ivfPqTopK(emb, queries,
          centroids = emb.filter(col("vec_id") >= 100 && col("vec_id") < 116),
          codebook = emb.filter(col("vec_id") >= 200 && col("vec_id") < 208),
          "vec_id", "embedding", m = 4, subDim = 16, k = 5, nprobe = 2)
        .select(col("query_id").as("__aq"), col("neighbor_id").as("__an"))
      truth.join(approx,
          col("query_id") === col("__aq") && col("neighbor_id") === col("__an"),
          "left")
        .groupBy(col("query_id"))
        .agg(count(col("__an")).as("hits"))
        .select(col("query_id"), col("hits").cast("long").as("hits"),
          ops.Num.roundz(col("hits") / lit(5.0), 4).as("recall"))
        .orderBy("query_id")
    }),
    "q257_ivf_train" -> ((s, dir) => {
      // the coarse quantizer TRAINED under the gate: 2 Lloyd rounds from
      // first-4-by-id seeds, entirely in exact micro-long arithmetic
      // (assignment = long-d2 struct-min, update = floor(sum/n) — the q235
      // discipline, which is what makes Lloyd oracle-able at all); output
      // is the per-cell assignment shift — seed occupancy, trained
      // occupancy, and arrivals (vectors that changed cell), the table
      // that says whether training moved anything
      val emb = T(s, dir, "embeddings")
      val seed = Similarity.microSeedCentroids(emb, "vec_id", "embedding", k = 4)
      val trained = Similarity.ivfTrainMicro(emb, "vec_id", "embedding",
        k = 4, iterations = 2)
      val a0 = Similarity.microAssign(emb, "vec_id", "embedding", seed)
        .select(col("vec_id"), col("cell").as("__c0"))
      val aT = Similarity.microAssign(emb, "vec_id", "embedding", trained)
        .select(col("vec_id"), col("cell").as("__ct"))
      val moved = a0.join(aT, Seq("vec_id"))
      moved.groupBy(col("__ct").as("cell"))
        .agg(count(lit(1)).as("n_trained"),
          sum(when(col("__c0") =!= col("__ct"), 1L).otherwise(0L)).as("arrivals"))
        .join(moved.groupBy(col("__c0").as("cell"))
          .agg(count(lit(1)).as("n_seed")), Seq("cell"), "full")
        .select(col("cell"),
          coalesce(col("n_seed"), lit(0L)).cast("long").as("n_seed"),
          coalesce(col("n_trained"), lit(0L)).cast("long").as("n_trained"),
          coalesce(col("arrivals"), lit(0L)).cast("long").as("arrivals"))
        .orderBy("cell")
    }),
    "q258_ivf_train_recall" -> ((s, dir) => {
      // does training the quantizer buy recall? recall@5 of the IVF search
      // path under the TRAINED centroids vs under the seed (first-K)
      // centroids, side by side per query against q45's exact truth — both
      // centroid sets pass through the same micro→double conversion so the
      // comparison isolates Lloyd, not quantization
      val emb = T(s, dir, "embeddings")
      val queries = emb.filter(col("vec_id") < 8)
      val truth = Similarity.cosineTopK(emb, queries, "vec_id", "embedding", 5)
        .select(col("query_id"), col("neighbor_id"))
      def hits(cent: org.apache.spark.sql.DataFrame, as: String) = {
        val cvecs = Similarity.microCentroidVectors(cent, "vec_id", "embedding")
        val approx = Similarity.ivfTopK(emb, queries, cvecs,
            "vec_id", "embedding", 5, nprobe = 1)
          .select(col("query_id").as("__aq"), col("neighbor_id").as("__an"))
        truth.join(approx,
            col("query_id") === col("__aq") && col("neighbor_id") === col("__an"),
            "left")
          .groupBy(col("query_id")).agg(count(col("__an")).cast("long").as(as))
      }
      val seedH = hits(
        Similarity.microSeedCentroids(emb, "vec_id", "embedding", k = 4), "hits_seed")
      val trainH = hits(
        Similarity.ivfTrainMicro(emb, "vec_id", "embedding", k = 4, iterations = 2),
        "hits_trained")
      seedH.join(trainH, Seq("query_id"))
        .select(col("query_id"), col("hits_seed"),
          ops.Num.roundz(col("hits_seed") / lit(5.0), 4).as("recall_seed"),
          col("hits_trained"),
          ops.Num.roundz(col("hits_trained") / lit(5.0), 4).as("recall_trained"))
        .orderBy("query_id")
    }),
    "q259_cached_views" -> ((s, dir) => {
      // the response-cache parity path (reference Youtube_final.py:9-14
      // memoizes per-keyword API responses in a driver dict; the engine
      // analog is a SCOPED block-cache pin): the scored table is persisted
      // for exactly the scope in which two dashboard views consume it,
      // then released. Both views materialize INSIDE the scope
      // (localCheckpoint), so the second provably reads the
      // InMemoryRelation rather than re-running the scoring lineage —
      // PlanSpec asserts the plan shape, this gate pins the values
      // (hash-identical to the uncached twin by construction: caching is
      // never semantic)
      val scored = Sentiment.scoreByLexiconNative(T(s, dir, "documents"), "text")
      Pipeline.withCache(scored) { e =>
        val v1 = e.groupBy(col("sentiment")).agg(count(lit(1)).as("n"))
          .select(lit("by_sentiment").as("view_name"),
            col("sentiment").as("k"), col("n"))
        val v2 = e.filter(col("sentiment") === "positive")
          .groupBy(col("lang")).agg(count(lit(1)).as("n"))
          .select(lit("positive_by_lang").as("view_name"),
            col("lang").as("k"), col("n"))
        v1.unionByName(v2)
          .select(col("view_name"), col("k"), col("n").cast("long").as("n"))
          .orderBy("view_name", "k").localCheckpoint()
      }
    }),
    "q260_sequence_pack" -> ((s, dir) =>
      // the concat-and-chunk packing audit: documents concatenated in id
      // order into 256-token context windows; straddle_bp IS naive
      // packing's attention-contamination rate, tail_waste_bp the final
      // window's padding cost — offsets via the two-phase prefix sum, no
      // single-partition window
      Curation.sequencePackStats(T(s, dir, "documents"), "doc_id", "text",
        capacity = 256)),
    "q261_mixture_plan" -> ((s, dir) =>
      // the per-source mixing table behind every published pretraining
      // mixture: weight-share token targets against available tokens;
      // epochs_bp > 10^4 flags upsampling (repeat-risk) — one token
      // aggregate to the |sources|-row metadata frame
      Curation.mixturePlan(T(s, dir, "documents"), "source", "text",
        Map("src0" -> 4L, "src1" -> 3L, "src2" -> 2L, "src3" -> 1L),
        totalBudget = 100000L)
        .orderBy("source")),
    "q262_dup_spans" -> ((s, dir) =>
      // exact repeated-span audit (Lee et al. substring dedup at 3-token
      // granularity): per-doc share of spans whose exact text recurs
      // ANYWHERE in the corpus — catches boilerplate/template bodies that
      // survive every document-level gate; 8-byte Karp-Rabin exchange key
      Dedup.dupSpanStats(T(s, dir, "documents"), "doc_id", "text", k = 3)
        .orderBy("doc_id")),
    "q264_hard_negatives" -> ((s, dir) => {
      // contrastive-training pair mining: per anchor (vec_id < 8), the 3
      // nearest corpus vectors with a DIFFERENT label — the triplet-loss
      // negative selection step; broadcast anchors, one corpus scan,
      // two-phase ranking
      val emb = T(s, dir, "embeddings")
      Similarity.hardNegatives(emb, emb.filter(col("vec_id") < 8),
          "vec_id", "embedding", "label", k = 3)
        .orderBy("query_id", "rn")
    }),
    "q265_incremental_components" -> ((s, dir) => {
      // incremental dedup-index maintenance PROVEN ≡ batch: components of
      // the historical slice (doc_id < 350) absorb a new batch (≥ 350) via
      // the resolved-star merge — old×new pairs from the STORED band index
      // (the shared materialized artifact: filtered to the historical ids
      // with a pushed parquet predicate, never re-banded — at 100 TB
      // re-banding history is the second corpus pass the production path
      // doesn't pay), new×new from banding the batch alone; historical
      // components likewise from the stored pair list restricted to
      // old×old edges (banding is per-doc and the threshold per-pair, so
      // the restriction IS the slice's pair set). The oracle recomputes
      // components over the WHOLE corpus from scratch, so the gate row IS
      // the incremental ≡ full-recompute proof.
      val docs = T(s, dir, "documents")
      val oldBands = dedupIndexBands(s, dir).filter(col("doc_id") < 350)
      val freshBanded = Dedup.bandedSignatures(docs.filter(col("doc_id") >= 350),
        "doc_id", "text", shingleK = 2, numHashes = 16, bands = 8)
      // the historical component map is a STORED artifact (yesterday's
      // merge output), read back — not recomputed per run (round-13
      // verdict item 3: the per-run min-label loop was the key's variance)
      val safe = dir.replaceAll("[^A-Za-z0-9._-]", "_")
      val existing = Dedup.componentIndexSliceBelow(docs, "doc_id", "text",
        shingleK = 2, numHashes = 16, bands = 8, threshold = 0.25,
        indexDir = s"$TMP/dedup_index/${safe}_k2_h16_b8_t25", idUpper = 350)
      val cross = Dedup.probeNearDupBanded(oldBands, freshBanded, "doc_id", 16, 0.25)
        .select(col("existing_id").as("id_a"), col("new_id").as("id_b"))
      val inner = Dedup.nearDupPairsBanded(freshBanded, "doc_id", 16, 0.25)
        .select(col("id_a"), col("id_b"))
      Dedup.mergeComponents(existing, cross.unionByName(inner))
        .select(col("node").as("doc_id"), col("component"))
        .orderBy("doc_id")
    }),
    "q266_stream_neardup" -> ((s, dir) =>
      // the streaming near-dup ingest gate: ascending-id micro-batches,
      // each banded once, probed against the accumulated parquet signature
      // index, deduped within-batch, survivors appended — the survivor set
      // is batching-invariant and equals "docs that are id_b of no
      // whole-corpus pair", which is exactly what the oracle computes
      Streaming.nearDupGateReplay(s, dir, s"$TMP/q266_src")
        .orderBy("doc_id")),
    "q267_stream_psi" -> ((s, dir) =>
      // the drift monitor as a STREAM: each arriving batch's value
      // histogram scored against the pinned first-batch reference via
      // q158's exact PSI machinery; batch boundaries derive from the id
      // span, so the oracle reproduces them with no stream knowledge
      Streaming.psiReplay(s, dir, s"$TMP/q267_src")
        .orderBy("batch_id")),
    "q268_ivfpq_curve" -> ((s, dir) => {
      // the nprobe trade-off curve q256's single point implies: composed
      // IVF+PQ recall@5 (disjoint centroids/codebook) at nprobe 1/2/4/8 —
      // rising recall prices the cost lever (nprobe/|cells| of the corpus
      // scanned per query); a plateau below 1.0 says the 8-entry codebook,
      // not cell pruning, is the bottleneck
      val emb = T(s, dir, "embeddings")
      val queries = emb.filter(col("vec_id") < 8)
      val truth = Similarity.cosineTopK(emb, queries, "vec_id", "embedding", 5)
        .select(col("query_id"), col("neighbor_id")).localCheckpoint()
      Seq(1, 2, 4, 8).map { np =>
        val approx = Similarity.ivfPqTopK(emb, queries,
            centroids = emb.filter(col("vec_id") >= 100 && col("vec_id") < 116),
            codebook = emb.filter(col("vec_id") >= 200 && col("vec_id") < 208),
            "vec_id", "embedding", m = 4, subDim = 16, k = 5, nprobe = np)
          .select(col("query_id").as("__aq"), col("neighbor_id").as("__an"))
        truth.join(approx,
            col("query_id") === col("__aq") && col("neighbor_id") === col("__an"),
            "left")
          .agg(count(col("__an")).as("hits"))
          .select(lit(np.toLong).as("nprobe"), col("hits").cast("long").as("hits"),
            ops.Num.roundz(col("hits") / lit(40.0), 4).as("recall"))
      }.reduce(_ unionByName _).orderBy("nprobe")
    }),
    "q269_pq_codebook_curve" -> ((s, dir) => {
      // q268's verdict was "the codebook, not cell pruning, caps recall" —
      // this curve proves the other lever works: FLAT ADC recall@5 (no IVF
      // confound) as the per-subspace codebook grows K = 4/8/16/32, all
      // slices disjoint from the query set; memory cost is log2(K) bits
      // per code, so the pair (q268, q269) prices the m/K-vs-nprobe budget
      val emb = T(s, dir, "embeddings")
      val queries = emb.filter(col("vec_id") < 8)
      val truth = Similarity.cosineTopK(emb, queries, "vec_id", "embedding", 5)
        .select(col("query_id"), col("neighbor_id")).localCheckpoint()
      Seq(4, 8, 16, 32).map { kk =>
        val cb = emb.filter(col("vec_id") >= 200 && col("vec_id") < 200 + kk)
        val codes = Similarity.pqEncode(emb, cb, "vec_id", "embedding",
          m = 4, subDim = 16)
        val approx = Similarity.pqSearchTopK(codes, queries, cb,
            "vec_id", "embedding", m = 4, subDim = 16, k = 5)
          .select(col("query_id").as("__aq"), col("neighbor_id").as("__an"))
        truth.join(approx,
            col("query_id") === col("__aq") && col("neighbor_id") === col("__an"),
            "left")
          .agg(count(col("__an")).as("hits"))
          .select(lit(kk.toLong).as("codebook_k"),
            col("hits").cast("long").as("hits"),
            ops.Num.roundz(col("hits") / lit(40.0), 4).as("recall"))
      }.reduce(_ unionByName _).orderBy("codebook_k")
    }),
    "q270_cluster_sizes" -> ((s, dir) => {
      // near-dup cluster-size distribution over the materialized component
      // index: pairs vs blobs decides the rep-picking strategy (q105's
      // window is safe only while clusters stay small — this is the table
      // that watches that assumption), and a fattening tail is the same
      // over-merge alarm q250 scores as one number
      val (_, comp) = dedupIndex(s, dir)
      comp.groupBy(col("component")).agg(count(lit(1)).as("__sz"))
        .groupBy(col("__sz").as("cluster_size"))
        .agg(count(lit(1)).as("n_clusters"))
        .select(col("cluster_size").cast("long").as("cluster_size"),
          col("n_clusters").cast("long").as("n_clusters"))
        .orderBy("cluster_size")
    }),
    "q271_source_dup_matrix" -> ((s, dir) => {
      // WHO copies from WHOM: near-dup pairs from the materialized index
      // grouped by unordered source pair — the provenance matrix that
      // decides which feeds are mirrors of each other (drop one) vs
      // independently noisy (dedup both); two narrow joins of the pair
      // list against the (id, source) projection, never text
      val docs = T(s, dir, "documents")
      val (pairs, _) = dedupIndex(s, dir)
      val src = docs.select(col("doc_id"), col("source"))
      pairs
        .join(src.select(col("doc_id").as("id_a"), col("source").as("__sa")), "id_a")
        .join(src.select(col("doc_id").as("id_b"), col("source").as("__sb")), "id_b")
        .groupBy(least(col("__sa"), col("__sb")).as("source_lo"),
          greatest(col("__sa"), col("__sb")).as("source_hi"))
        .agg(count(lit(1)).as("n_pairs"))
        .select(col("source_lo"), col("source_hi"),
          col("n_pairs").cast("long").as("n_pairs"))
        .orderBy("source_lo", "source_hi")
    }),
    "q272_pq_rerank" -> ((s, dir) => {
      // the production ANN SERVING shape (FAISS-style search-then-refine,
      // and what the round-12 lever probes showed actually moves recall:
      // ADC alone saturates at code resolution because co-coded vectors
      // are indistinguishable): a cheap ADC shortlist of 20 candidates per
      // query — exact long arithmetic, q224's chain — then an exact-cosine
      // re-rank of ONLY the shortlist. Scale shape: the expensive exact
      // scoring touches |queries|·20 rows instead of |corpus|·|queries|
      // (q45's brute force); queries broadcast onto the shortlist, and the
      // corpus is touched once by the narrow id-keyed gather join.
      val emb = T(s, dir, "embeddings")
      val queries = emb.filter(col("vec_id") < 8)
      val cb = emb.filter(col("vec_id") < 8) // q224's codebook config
      val codes = Similarity.pqEncode(emb, cb, "vec_id", "embedding",
        m = 4, subDim = 16)
      val shortlist = Similarity.pqSearchTopK(codes, queries, cb,
          "vec_id", "embedding", m = 4, subDim = 16, k = 20)
        .select(col("query_id"), col("neighbor_id"))
      val scored = shortlist
        .join(broadcast(queries.select(col("vec_id").as("query_id"),
          col("embedding").as("qv"))), Seq("query_id"))
        .join(emb.select(col("vec_id").as("neighbor_id"),
          col("embedding").as("cv")), Seq("neighbor_id"))
        .select(col("query_id"), col("neighbor_id"),
          (Similarity.dot("qv", "cv") /
            (Similarity.norm("qv") * Similarity.norm("cv"))).as("cosine"))
      Similarity.topKPerQuery(scored, 5).orderBy("query_id", "rn")
    }),
    "q273_semdedup" -> ((s, dir) => {
      // SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning at
      // web-scale through semantic deduplication"): embedding-space near-
      // dups pruned WITHIN k-means cells only — the cells bound the
      // quadratic (sum n_c^2, never n^2; at 100 TB k grows so cell size
      // stays fixed, and each cell's pair join is an independent
      // partition-local task). Cells from the q257 exact-micro Lloyd
      // trainer (deterministic, oracle-replicable); within a cell a vector
      // is dropped iff some LOWER-id member has cosine > 0.4 with it (the
      // q43 min-id-keeps discipline). Output: every vector with its cell
      // and kept flag — the curation verdict a downstream sampler joins.
      val emb = T(s, dir, "embeddings")
      val trained = Similarity.ivfTrainMicro(emb, "vec_id", "embedding",
        k = 4, iterations = 2)
      val assigned = Similarity.microAssign(emb, "vec_id", "embedding", trained)
      val withVec = assigned.join(emb.select(col("vec_id"), col("embedding")), "vec_id")
      val hi = withVec.select(col("cell"), col("vec_id").as("__ih"), col("embedding").as("vh"))
      val lo = withVec.select(col("cell"), col("vec_id").as("__il"), col("embedding").as("vl"))
      val dropped = hi.join(lo, Seq("cell"))
        .filter(col("__il") < col("__ih"))
        .filter((Similarity.dot("vh", "vl") /
          (Similarity.norm("vh") * Similarity.norm("vl"))) > 0.4)
        .select(col("__ih").as("vec_id")).distinct()
        .withColumn("__d", lit(1))
      assigned.join(dropped, Seq("vec_id"), "left")
        .select(col("vec_id"), col("cell"),
          when(col("__d").isNull, 1L).otherwise(0L).as("kept"))
        .orderBy("vec_id")
    }),
    "q274_knn_label" -> ((s, dir) => {
      // kNN majority-vote label propagation (the weak-labeling /
      // auto-labeling primitive): each query's label predicted from its 5
      // exact nearest neighbors' labels, majority with ties to the
      // smallest label. Composes q45's two-phase exact top-k (queries
      // broadcast, corpus scanned once) with a label gather; the vote
      // window runs on the |queries|x5 frame — metadata-sized, never the
      // corpus.
      val emb = T(s, dir, "embeddings")
      val queries = emb.filter(col("vec_id") < 8)
      val nn = Similarity.cosineTopK(emb, queries, "vec_id", "embedding", 5)
        .select(col("query_id"), col("neighbor_id"))
      val votes = nn
        .join(emb.select(col("vec_id").as("neighbor_id"), col("label")), "neighbor_id")
        .groupBy(col("query_id"), col("label"))
        .agg(count(lit(1)).as("votes"))
      import org.apache.spark.sql.expressions.Window
      votes
        .withColumn("__rn", row_number().over(
          Window.partitionBy(col("query_id"))
            .orderBy(col("votes").desc, col("label"))))
        .filter(col("__rn") === 1)
        .select(col("query_id"), col("label").cast("long").as("pred_label"),
          col("votes").cast("long").as("votes"))
        .orderBy("query_id")
    }),
    "q275_dsir" -> ((s, dir) => {
      // DSIR (Xie et al. 2023, "Data Selection for Language Models via
      // Importance Resampling"): per-doc importance weight = sum over
      // tokens of the hashed-bucket log-likelihood ratio between a TARGET
      // domain (source='src0' — the high-quality-domain proxy) and the raw
      // corpus, Laplace-smoothed over B=64 buckets. Per-bucket log-ratios
      // are computed once on the 64-row margin frame, quantized to exact
      // micro-nat longs (the order-free float discipline), broadcast back,
      // and per-doc weights are exact long sums — two token-frame
      // aggregates plus one broadcast join, linear in token volume.
      val docs = T(s, dir, "documents")
      val tok = docs.select(col("doc_id"), col("source"),
          explode(expr("filter(split(lower(text), '\\\\s+'), t -> length(t) > 0)")).as("w"))
        .withColumn("b", pmod(graft.functions.RollingHash(col("w")), lit(64L)))
        .localCheckpoint(eager = false)
      val tgt = tok.filter(col("source") === "src0")
        .groupBy(col("b")).agg(count(lit(1)).as("tc"))
      val raw = tok.groupBy(col("b")).agg(count(lit(1)).as("rc"))
      val totals = tok.agg(
        sum(when(col("source") === "src0", 1L).otherwise(0L)).as("nt"),
        count(lit(1)).as("nr"))
      val lam = raw.join(tgt, Seq("b"), "left")
        .crossJoin(broadcast(totals))
        .select(col("b"),
          ops.Num.roundz((
            log((coalesce(col("tc"), lit(0L)) + lit(1L)).cast("double") /
              (col("nt") + lit(64L)).cast("double")) -
            log((col("rc") + lit(1L)).cast("double") /
              (col("nr") + lit(64L)).cast("double"))) * lit(1000000d), 0)
            .cast("long").as("lam_unats"))
      tok.join(broadcast(lam), Seq("b"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_tokens"), sum(col("lam_unats")).as("w_unats"))
        .select(col("doc_id"), col("n_tokens").cast("long").as("n_tokens"),
          col("w_unats").cast("long").as("w_unats"))
        .orderBy("doc_id")
    }),
    "q276_editdist_confirm" -> ((s, dir) => {
      // the CONFIRM stage of a production near-dup pipeline: exact
      // Levenshtein run ONLY on the banded candidate pairs from the
      // materialized index (MinHash estimates admit false positives; edit
      // distance is the arbiter) — cost ∝ |candidate pairs| · len², never
      // corpus². Similarity in floor basis points of the longer text;
      // codegen'd levenshtein on both engines.
      val docs = T(s, dir, "documents")
      val (pairs, _) = dedupIndex(s, dir)
      val t = docs.select(col("doc_id"), col("text"))
      pairs
        .join(t.select(col("doc_id").as("id_a"), col("text").as("__ta")), "id_a")
        .join(t.select(col("doc_id").as("id_b"), col("text").as("__tb")), "id_b")
        // the pair frame is BYTE-small but COMPUTE-heavy (len^2 DP per
        // row), so AQE's byte-based coalescing would serialize the DP onto
        // a couple of tasks; spread it explicitly — the general rule for
        // expensive-per-row stages over narrow frames
        .repartition(64, col("id_a"))
        .withColumn("lev", levenshtein(col("__ta"), col("__tb")).cast("long"))
        .select(col("id_a"), col("id_b"), col("est_jaccard"), col("lev"),
          (lit(10000L) - expr(
            "(10000 * lev) div greatest(length(__ta), length(__tb), 1)"))
            .cast("long").as("sim_bp"))
        .withColumn("confirmed",
          when(col("sim_bp") >= 5000L, 1L).otherwise(0L))
        .orderBy("id_a", "id_b")
    }),
    "q277_ndcg" -> ((s, dir) => {
      // nDCG@5 of the exact retrieval path with label-match relevance —
      // the graded eval metric next to q212's recall@k: DCG discounts in
      // exact micro units (round(1e6/log2(rn+1)) — integer constants both
      // engines compute identically), IDCG = the same weights over the
      // first n_rel positions, ratio rounded 4dp. All on the |queries|x5
      // metadata frame.
      val emb = T(s, dir, "embeddings")
      val queries = emb.filter(col("vec_id") < 8)
      val nn = Similarity.cosineTopK(emb, queries, "vec_id", "embedding", 5)
        .select(col("query_id"), col("neighbor_id"), col("rn"))
      val wt = ops.Num.roundz(lit(1000000d) /
        (log(col("rn").cast("double") + lit(1.0)) / log(lit(2.0))), 0).cast("long")
      val scoredRel = nn
        .join(emb.select(col("vec_id").as("neighbor_id"), col("label").as("__nl")), "neighbor_id")
        .join(broadcast(queries.select(col("vec_id").as("query_id"),
          col("label").as("__ql"))), "query_id")
        .select(col("query_id"), col("rn"),
          when(col("__nl") === col("__ql"), 1L).otherwise(0L).as("rel"),
          wt.as("w"))
        .localCheckpoint()
      val perQ = scoredRel.groupBy(col("query_id"))
        .agg(sum(col("rel")).as("n_rel"), sum(col("rel") * col("w")).as("dcg_u"))
      val idcg = scoredRel
        .join(perQ.select(col("query_id"), col("n_rel").as("__nr")), "query_id")
        .filter(col("rn") <= col("__nr"))
        .groupBy(col("query_id")).agg(sum(col("w")).as("idcg_u"))
      perQ.join(idcg, Seq("query_id"), "left")
        .select(col("query_id"), col("n_rel").cast("long").as("n_rel"),
          col("dcg_u").cast("long").as("dcg_u"),
          coalesce(col("idcg_u"), lit(0L)).cast("long").as("idcg_u"),
          when(coalesce(col("idcg_u"), lit(0L)) === 0L, lit(0.0))
            .otherwise(ops.Num.roundz(
              col("dcg_u").cast("double") / col("idcg_u").cast("double"), 4))
            .as("ndcg"))
        .orderBy("query_id")
    }),
    "q278_lsh_precision" -> ((s, dir) => {
      // the PRECISION curve of the banded MinHash candidates, bucketed by
      // estimated Jaccard, with q276's exact edit-distance arbiter as
      // truth — q233 closed recall (planted pairs found), this closes
      // precision (found pairs real). est_jaccard values are k/16 (exact
      // binary doubles), so the decile floor is engine-safe; the exact
      // confirm runs only on the candidate list.
      val docs = T(s, dir, "documents")
      val (pairs, _) = dedupIndex(s, dir)
      val t = docs.select(col("doc_id"), col("text"))
      pairs
        .join(t.select(col("doc_id").as("id_a"), col("text").as("__ta")), "id_a")
        .join(t.select(col("doc_id").as("id_b"), col("text").as("__tb")), "id_b")
        // spread the len^2 DP — see q276
        .repartition(64, col("id_a"))
        .select(floor(col("est_jaccard") * 10).cast("long").as("jacc_decile"),
          when(lit(10000L) - expr(
            "(10000 * levenshtein(__ta, __tb)) div greatest(length(__ta), length(__tb), 1)")
            >= 5000L, 1L).otherwise(0L).as("__c"))
        .groupBy(col("jacc_decile"))
        .agg(count(lit(1)).as("n_pairs"), sum(col("__c")).as("n_confirmed"))
        .select(col("jacc_decile"), col("n_pairs").cast("long").as("n_pairs"),
          col("n_confirmed").cast("long").as("n_confirmed"),
          expr("(10000 * n_confirmed) div n_pairs").cast("long").as("precision_bp"))
        .orderBy("jacc_decile")
    }),
    "q279_langid_confusion" -> ((s, dir) =>
      // the language-ID confusion matrix against the corpus's lang column
      // — the eval that prices q50 before it gates anything: one
      // expression-native pass, one |langs|^2-bounded aggregate
      T(s, dir, "documents")
        .select(col("lang"), TextAnalysis.langId(col("text")).as("lang_pred"))
        .groupBy(col("lang"), col("lang_pred"))
        .agg(count(lit(1)).as("n_docs"))
        .select(col("lang"), col("lang_pred"), col("n_docs").cast("long").as("n_docs"))
        .orderBy("lang", "lang_pred")),
    "q280_curation_matrix" -> ((s, dir) => {
      // the curation DECISION table: LM-quality tercile × near-dup status,
      // with doc and token mass per cell — what a mixture planner reads to
      // decide "drop dup tail, upsample clean head". Reuses BOTH shared
      // materialized derivations (the LM score table and the dedup
      // component index); the only new work is one token-count pass and
      // two id-keyed joins.
      val scores = lmScores(s, dir)
      val (ranked, n) = graft.ops.TwoPhase.globalRank(scores, col("avg_nll"),
        Seq(col("avg_nll"), col("doc_id")), "__rank")
      val buck = ranked.withColumn("bucket",
        graft.ops.TwoPhase.ntileFromRank("__rank", n, 3).cast("long"))
        .select(col("doc_id"), col("bucket"))
      val (_, comp) = dedupIndex(s, dir)
      val dup = comp.select(col("node").as("doc_id")).withColumn("__d", lit(1L))
      val toks = T(s, dir, "documents")
        .select(col("doc_id"), TextAnalysis.tokenCount(col("text")).as("__nt"))
      buck.join(dup, Seq("doc_id"), "left")
        .join(toks, Seq("doc_id"))
        .groupBy(col("bucket"),
          when(col("__d").isNull, 0L).otherwise(1L).as("is_dup"))
        .agg(count(lit(1)).as("n_docs"), sum(col("__nt")).as("total_tokens"))
        .select(col("bucket"), col("is_dup"),
          col("n_docs").cast("long").as("n_docs"),
          col("total_tokens").cast("long").as("total_tokens"))
        .orderBy("bucket", "is_dup")
    }),
    "q281_gopher_repetition" -> ((s, dir) => {
      // Gopher's repetition rule (Rae et al. 2021, "Scaling Language
      // Models" §A1.1: drop docs whose most frequent n-gram covers too
      // much of the text — boilerplate/spam that per-line dedup misses):
      // per-doc top-bigram share in floor basis points, flagged at the
      // paper's 20% threshold for 2-grams. One bigram explode + two
      // map-side-combined aggregates, linear in token volume; docs with
      // < 2 tokens emit no row (no bigrams — both engines).
      val docs = T(s, dir, "documents")
      val withArr = docs.select(col("doc_id"),
        expr("filter(split(lower(text), '\\\\s+'), t -> length(t) > 0)").as("__tk"))
      val bi = withArr
        .select(col("doc_id"), explode(expr(
          "CASE WHEN size(__tk) >= 2 THEN " +
            "transform(sequence(0, size(__tk) - 2), i -> struct(__tk[i] AS a, __tk[i + 1] AS b)) " +
            "ELSE array() END")).as("__bg"))
        .select(col("doc_id"), col("__bg.a").as("a"), col("__bg.b").as("b"))
      bi.groupBy(col("doc_id"), col("a"), col("b"))
        .agg(count(lit(1)).as("c"))
        .groupBy(col("doc_id"))
        .agg(sum(col("c")).as("n_bigrams"), max(col("c")).as("top_n"))
        .select(col("doc_id"), col("n_bigrams").cast("long").as("n_bigrams"),
          col("top_n").cast("long").as("top_n"),
          expr("(10000 * top_n) div n_bigrams").cast("long").as("top_share_bp"))
        .withColumn("flagged",
          when(col("top_share_bp") > 2000L, 1L).otherwise(0L))
        .orderBy("doc_id")
    }),
    "q282_residual_pq" -> ((s, dir) => {
      // RESIDUAL-coded IVFPQ search (the production FAISS IVFx,PQy layout):
      // q246 composes IVF pruning with PQ codes of the RAW vectors; here the
      // codes quantize v − centroid(cell(v)), the fix for raw ADC's
      // within-cluster ranking ceiling measured in SCALE.md's round-12 ANN
      // probe. Per-(query, probed-cell) distance tables — the query residual
      // depends on the cell it's re-expressed against; same exact tenth-bp
      // long distances, same corpus-slice quantizers the oracle replicates
      // (centroids = first 16 by id; codebook = the RESIDUALS of the first 8)
      val emb = T(s, dir, "embeddings")
      val cent = emb.filter(col("vec_id") < 16)
      val res = Similarity.residuals(emb, cent, "vec_id", "embedding")
      val cb = res.filter(col("vec_id") < 8)
        .select(col("vec_id"), col("rvec"))
      val qres = Similarity.residuals(
        emb.filter(col("vec_id") < 8), cent, "vec_id", "embedding", nprobe = 2)
      Similarity.pqResidualSearchTopK(res, qres, cb, "vec_id",
          m = 4, subDim = 16, k = 5)
        .orderBy("query_id", "rn")
    }),
    "q283_ivf_balance" -> ((s, dir) => {
      // IVF index-health audit: the cell-occupancy table the nprobe cost
      // model stands on — per-query scan cost is sum of PROBED cell sizes,
      // so a skewed assignment (hot cell ≫ mean) silently turns "probe 2 of
      // 16 cells" into a near-full scan. Share in floor bp plus the per-cell
      // imbalance ratio vs the ideal |corpus|/|cells| (milli-units); the
      // monitor a production index rebuilds on. One assignment pass
      // (broadcast centroids), one |cells|-sized aggregate.
      val emb = T(s, dir, "embeddings")
      val cent = emb.filter(col("vec_id") < 16)
      val asg = Similarity.ivfAssign(emb, cent, "vec_id", "embedding")
      val total = asg.agg(count(lit(1)).as("__n"))
      asg.groupBy(col("cell"))
        .agg(count(lit(1)).as("n_vecs"))
        .crossJoin(broadcast(total))
        .select(col("cell").cast("long").as("cell"),
          col("n_vecs").cast("long").as("n_vecs"),
          expr("(10000 * n_vecs) div __n").cast("long").as("share_bp"),
          // occupancy vs the balanced ideal, milli-units: 1000 = ideal
          expr("(1000 * n_vecs * 16) div __n").cast("long").as("load_milli"))
        .orderBy("cell")
    }),
    "q284_sq8_search" -> ((s, dir) => {
      // scalar-quantized (SQ8) flat search: every dim affinely coded onto
      // 0..255 by its corpus [min,max] — the memory lever orthogonal to
      // PQ's (8 bits/DIM ≈ near-exact ranking at 4× compression vs
      // log2(K)/SUBSPACE at 10-100×); symmetric integer-L2 over codes,
      // exact long sums. Stats frame is 64 rows (broadcast); one encode
      // pass; the flat scan broadcasts the 8 coded queries
      val emb = T(s, dir, "embeddings")
      val codes = Similarity.sq8Encode(emb, "vec_id", "embedding")
      Similarity.sq8SearchTopK(codes, codes.filter(col("vec_id") < 8),
          "vec_id", k = 5)
        .orderBy("query_id", "rn")
    }),
    "q285_shard_merge" -> ((s, dir) => {
      // IVF index-shard MERGE — the maintenance op behind batched ingest
      // (build a per-batch index shard, merge into the serving index):
      // because assignment is per-vector against a SHARED coarse
      // quantizer, merging is a union of cell→vector assignments with no
      // re-clustering and no cross-shard work, and searching the merged
      // index is EXACTLY searching a monolithic one — which is the proof
      // this gate row encodes: the Spark side searches the union of two
      // parity shards, the oracle computes the monolithic nprobe=2 path.
      // At 100 TB: shards merge as parquet appends (cell is the partition
      // key); the merge itself moves no vector data
      val emb = T(s, dir, "embeddings")
      val cent = emb.filter(col("vec_id") < 16)
      val shard = (p: Int) => Similarity.ivfAssign(
        emb.filter(pmod(col("vec_id"), lit(2)) === p), cent, "vec_id", "embedding")
      val merged = shard(0).unionByName(shard(1))
        .select(col("cell"), col("vec_id").as("neighbor_id"), col("embedding").as("cv"))
      val queryCells = Similarity.ivfProbe(emb.filter(col("vec_id") < 8),
          cent, "vec_id", "embedding", nprobe = 2)
        .select(col("cell"), col("vec_id").as("query_id"), col("embedding").as("qv"))
      val scored = merged.join(queryCells, "cell")
        .filter(col("neighbor_id") =!= col("query_id"))
        .withColumn("cosine",
          Similarity.dot("qv", "cv") / (Similarity.norm("qv") * Similarity.norm("cv")))
        .select(col("query_id"), col("neighbor_id"), col("cosine"))
      Similarity.topKPerQuery(scored, 5).orderBy("query_id", "rn")
    }),
    "q286_mrr" -> ((s, dir) => {
      // MRR@5 of the exact retrieval path with label-match relevance — the
      // first-hit eval next to q212's recall@k and q277's nDCG. Reciprocal
      // ranks in exact micro-units via integer division (1000000 div rn —
      // both engines' integer div agree; the 1/3 case never touches
      // floats), summed order-free; the one float op is the final 4-dp
      // mean. All ranking work is the |queries|×5 metadata frame
      val emb = T(s, dir, "embeddings")
      val queries = emb.filter(col("vec_id") < 8)
      val nn = Similarity.cosineTopK(emb, queries, "vec_id", "embedding", 5)
        .select(col("query_id"), col("neighbor_id"), col("rn"))
      val firstRel = nn
        .join(emb.select(col("vec_id").as("neighbor_id"), col("label").as("__nl")), "neighbor_id")
        .join(broadcast(queries.select(col("vec_id").as("query_id"),
          col("label").as("__ql"))), "query_id")
        .filter(col("__nl") === col("__ql"))
        .groupBy(col("query_id")).agg(min(col("rn")).as("first_rel_rn"))
      queries.select(col("vec_id").as("query_id"))
        .join(firstRel, Seq("query_id"), "left")
        .select(coalesce(col("first_rel_rn"), lit(0L)).as("fr"))
        .agg(count(lit(1)).cast("long").as("n_queries"),
          sum(when(col("fr") === 0L, 0L)
            .otherwise(expr("CAST(1000000 AS BIGINT) div fr"))).cast("long")
            .as("rr_micro_sum"))
        .select(col("n_queries"), col("rr_micro_sum"),
          ops.Num.roundz(col("rr_micro_sum").cast("double") /
            (col("n_queries").cast("double") * lit(1000000.0)), 4).as("mrr"))
    }),
    "q287_scene_cuts" -> ((s, dir) => {
      // VIDEO shot-boundary detection under the gate — the keyframe
      // selector a vision-language curation pipeline runs before sampling
      // frames: per doc an animated GIF is synthesized whose channel means
      // drift smoothly (+4/+3/+5 per frame) except at every 3rd frame,
      // where a planted +60 red jump marks a cut; REAL ImageIO container
      // walk decodes EVERY frame (step=1), then consecutive-frame absolute
      // channel-mean deltas flag cuts at threshold 40 (smooth Δ=12,
      // cut Δ=72 — clean margins). The lag window runs per doc over ≤9
      // frames; decode fans out map-side before any shuffle. The oracle
      // predicts every mean arithmetically (solid indexed-palette frames
      // are lossless)
      import s.implicits._
      val vids = T(s, dir, "documents").select(col("doc_id"), col("n_chars"))
        .as[(Long, Long)].mapPartitions(_.map { case (id, nc) =>
          val nf = (nc % 6 + 4).toInt
          val baseR = (id % 100).toInt
          val baseG = ((id * 7) % 200).toInt
          val colors = (0 until nf).map { i =>
            val r = baseR + 4 * i + 60 * (i / 3)
            val g = baseG + 3 * i
            val b = 10 + 5 * i
            (r << 16) | (g << 8) | b
          }
          (id, Multimodal.synthGif((id % 8 + 1).toInt, 3, colors))
        }).toDF("doc_id", "payload")
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("doc_id")).orderBy(col("frame_idx"))
      val delta = abs(col("mean_r") - lag(col("mean_r"), 1).over(w)) +
        abs(col("mean_g") - lag(col("mean_g"), 1).over(w)) +
        abs(col("mean_b") - lag(col("mean_b"), 1).over(w))
      Multimodal.sampleGifFrames(vids, "doc_id", step = 1)
        .select(col("doc_id"), col("frame_idx"),
          col("mean_r"), col("mean_g"), col("mean_b"))
        .withColumn("delta_sum", delta)
        .filter(col("delta_sum").isNotNull)
        .select(col("doc_id"), col("frame_idx"),
          col("delta_sum").cast("long").as("delta_sum"),
          when(col("delta_sum") > 40, 1L).otherwise(0L).as("is_cut"))
        .orderBy("doc_id", "frame_idx")
    }),
    "q288_embed_covariance" -> ((s, dir) => {
      // EXACT covariance moments of a strided 16-dim embedding projection —
      // the PCA/whitening input (SemDeDup whitens before clustering; drift
      // monitors eigen-decompose this): per pair (i ≤ j) the (n, Σxᵢ, Σxⱼ,
      // Σxᵢxⱼ) moment table in exact micro/micro² longs, so shard results
      // MERGE BY ADDITION — the distributed-covariance contract a 100 TB
      // corpus needs (no order-dependent float accumulation anywhere; the
      // 4-dp cov display is derived per-row from the exact sums in one
      // fixed op order). Shape: the outer product fans out map-side
      // (N·136 rows — two chained posexplodes, zero joins), one hash
      // aggregate with map-side combine reduces to the 136-row table
      val emb = T(s, dir, "embeddings")
      val proj = emb.select(expr(
        "transform(sequence(0, 15), k -> CAST(round(CAST(element_at(embedding, k * 4 + 1) AS DOUBLE) * 1000000) AS BIGINT))")
        .as("p"))
      val withI = proj.select(col("p"), posexplode(col("p")).as(Seq("i", "mi")))
      withI.select(col("i"), col("mi"), posexplode(col("p")).as(Seq("j", "mj")))
        .filter(col("i") <= col("j"))
        .groupBy(col("i").cast("long").as("i"), col("j").cast("long").as("j"))
        .agg(count(lit(1)).as("n"), sum(col("mi")).as("sum_i"),
          sum(col("mj")).as("sum_j"), sum(col("mi") * col("mj")).as("sum_ij"))
        .select(col("i"), col("j"), col("n"),
          col("sum_i"), col("sum_j"), col("sum_ij"),
          ops.Num.roundz(
            col("sum_ij").cast("double") / col("n").cast("double") -
              (col("sum_i").cast("double") / col("n").cast("double")) *
              (col("sum_j").cast("double") / col("n").cast("double")), 4)
            .as("cov_micro2"))
        .orderBy("i", "j")
    }),
    "q289_index_delete" -> ((s, dir) => {
      // tombstone DELETE from the serving IVF index — q285's merge adds
      // shards, this removes vectors (the GDPR / right-to-be-forgotten
      // path of a vector store): the coded index is immutable parquet, so
      // a delete is a tombstone id-set applied as a broadcast ANTI join at
      // read time until the next compaction rewrites the cell files. The
      // gate row proves search-after-delete ≡ monolithic search over the
      // filtered corpus (the oracle's path); the coarse quantizer is a
      // PARAMETER table and correctly survives member deletion unchanged
      val emb = T(s, dir, "embeddings")
      val cent = emb.filter(col("vec_id") < 16)
      val index = Similarity.ivfAssign(emb, cent, "vec_id", "embedding")
      val tombstones = emb.filter(pmod(col("vec_id"), lit(7)) === 3)
        .select(col("vec_id"))
      val live = index.join(broadcast(tombstones), Seq("vec_id"), "left_anti")
        .select(col("cell"), col("vec_id").as("neighbor_id"), col("embedding").as("cv"))
      val queryCells = Similarity.ivfProbe(
          emb.filter(col("vec_id") < 8 && pmod(col("vec_id"), lit(7)) =!= 3),
          cent, "vec_id", "embedding", nprobe = 2)
        .select(col("cell"), col("vec_id").as("query_id"), col("embedding").as("qv"))
      val scored = live.join(queryCells, "cell")
        .filter(col("neighbor_id") =!= col("query_id"))
        .withColumn("cosine",
          Similarity.dot("qv", "cv") / (Similarity.norm("qv") * Similarity.norm("cv")))
        .select(col("query_id"), col("neighbor_id"), col("cosine"))
      Similarity.topKPerQuery(scored, 5).orderBy("query_id", "rn")
    }),
    "q290_image_resize" -> ((s, dir) => {
      // REAL box-filter image resize under the gate — the step before
      // patch embedding in a VLM pipeline: per doc an 8×6 tri-channel
      // gradient PNG (each channel a distinct linear ramp in x, y, and
      // doc_id — lossless), genuine ImageIO decode, 2×2 box downsample to
      // 4×3 with exact integer channel means (sum div 4 — nothing float).
      // Decode + fan-out are map-side (1 row in, 12 out) before the only
      // shuffle (the output sort); the oracle predicts every target pixel
      // arithmetically
      import s.implicits._
      val imgs = T(s, dir, "documents").select(col("doc_id")).as[Long]
        .mapPartitions(_.map { id =>
          (id, Multimodal.synthPngPixels(8, 6, (x, y) => {
            val r = ((id + 3 * x + 5 * y) % 256).toInt
            val g = ((id * 7 + 2 * x + 7 * y) % 256).toInt
            val b = ((id * 3 + 4 * x + y) % 256).toInt
            (r << 16) | (g << 8) | b
          }))
        }).toDF("doc_id", "payload")
      Multimodal.resizeBox(imgs, "doc_id", 4, 3)
        .orderBy("doc_id", "oy", "ox")
    }),
    "q291_temperature_mix" -> ((s, dir) => {
      // temperature-based source balancing (the mT5/XLM-R α-sampling rule,
      // α = 0.5): sampling weight p_s ∝ n_s^α flattens the source
      // distribution so head sources stop drowning tail ones — the
      // multilingual/multi-domain counterpart of q261's explicit-weight
      // plan. One map-side token-count aggregate to the |sources|-row
      // frame (size(filter(split)) per doc — the token explode never
      // happens); √n on an exact long is one IEEE op both engines round
      // identically, quantized to micro units; shares, allocations, and
      // the epochs_bp upsampling flag are exact integer division
      val docs = T(s, dir, "documents")
      val perSource = docs.select(col("source"),
          expr("size(filter(split(lower(text), '\\\\s+'), t -> length(t) > 0))")
            .cast("long").as("__tok"))
        .groupBy(col("source")).agg(sum(col("__tok")).as("n_tokens"))
        .withColumn("w_micro",
          expr("CAST(round(sqrt(CAST(n_tokens AS DOUBLE)) * 1000000) AS BIGINT)"))
      val tot = perSource.agg(sum(col("w_micro")).as("__wt"))
      perSource.crossJoin(broadcast(tot))
        .select(col("source"), col("n_tokens"), col("w_micro"),
          expr("(10000 * w_micro) div __wt").cast("long").as("share_bp"),
          expr("(100000 * w_micro) div __wt").cast("long").as("alloc_tokens"),
          expr("(((100000 * w_micro) div __wt) * 10000) div n_tokens")
            .cast("long").as("epochs_bp"))
        .orderBy("source")
    }),
    "q292_stream_vector_ingest" -> ((s, dir) =>
      // the vector-store WRITE path as a stream: ascending-id micro-batches
      // of embeddings, each assigned to its cell against the pinned
      // broadcast quantizer and appended as an idempotent batch-keyed index
      // slice; the occupancy audit of the accumulated index must equal the
      // batch assignment of the whole corpus (the oracle IS q283's SQL) —
      // the exactly-once statement for streaming index ingest
      Streaming.vectorIngestReplay(s, dir, s"$TMP/q292_src")
        .orderBy("cell")),
    "q293_source_sketch" -> ((s, dir) => {
      // DATASET-level overlap estimation from MERGEABLE MinHash sketches —
      // the dump-vs-dump comparison (is this crawl mostly a re-crawl?)
      // that decides whether a new source is worth ingesting BEFORE any
      // pair-level dedup runs: per source one k=16 signature of its
      // shingle SET. min() merges across docs, shards, and dumps by
      // construction, so at 100 TB each shard sketches independently and
      // the combiner folds 16 longs per source; the pairwise comparison
      // runs on the |sources|² metadata frame. Same hash family as q44, so
      // the estimates are comparable across the whole dedup stack
      val docs = T(s, dir, "documents")
      val sigs = Dedup.minHashSignatures(
        Dedup.wordShingles(docs.select(col("source"), col("text")),
          "source", "text", 2), "source", 16)
      val a = sigs.select(col("source").as("src_a"), col("sig").as("sa"))
      val b = sigs.select(col("source").as("src_b"), col("sig").as("sb"))
      a.crossJoin(broadcast(b)).filter(col("src_a") < col("src_b"))
        .select(col("src_a"), col("src_b"),
          expr("aggregate(zip_with(sa, sb, (x, y) -> CASE WHEN x = y THEN 1L ELSE 0L END), 0L, (acc, v) -> acc + v)")
            .as("agree"))
        .select(col("src_a"), col("src_b"), col("agree").cast("long").as("agree"),
          ops.Num.roundz(col("agree").cast("double") / lit(16.0), 4).as("est_jaccard"))
        .orderBy("src_a", "src_b")
    }),
    "q294_tfidf_pairs" -> ((s, dir) => {
      // weighted all-pairs similarity (Bayardo et al., WWW'07 shape):
      // rare-token tf-idf cosine over the df-capped vocabulary — the
      // WEIGHTED complement of MinHash set overlap (two docs sharing one
      // distinctive term rank above two sharing ten stopwords). The df cap
      // (≤ 20) is the scale contract: candidate generation is a token
      // equi-join whose per-token fan-in is ≤ cap docs (≤ cap² pairs), so
      // pair volume is Σ_t df_t² over rare tokens — never corpus²; common
      // tokens carry no discriminative signal and are EXCLUDED from the
      // similarity space entirely (dot AND norms — self-consistent
      // semantics the oracle mirrors). Weights are exact milli-nat longs
      // (tf · round(ln(N/df)·1000)); dot/norms are exact long sums; the
      // one float op chain is the final cosine, fixed order, 4 dp
      val docs = T(s, dir, "documents")
      val tok = docs.select(col("doc_id"),
          explode(expr("filter(split(lower(text), '\\\\s+'), t -> length(t) > 0)")).as("w"))
        .groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("tf"))
        .localCheckpoint(eager = false)
      val nDocs = docs.agg(countDistinct(col("doc_id")).as("__n"))
      val dfT = tok.groupBy(col("w")).agg(countDistinct(col("doc_id")).as("df"))
        .filter(col("df") <= 20)
      val wts = tok.join(dfT, Seq("w"))
        .crossJoin(broadcast(nDocs))
        .select(col("doc_id"), col("w"),
          (col("tf") * expr("CAST(round(ln(CAST(__n AS DOUBLE) / CAST(df AS DOUBLE)) * 1000) AS BIGINT)"))
            .as("wt"))
        .localCheckpoint(eager = false)
      val norms = wts.groupBy(col("doc_id")).agg(sum(col("wt") * col("wt")).as("n2"))
      val dots = wts.select(col("doc_id").as("id_a"), col("w"), col("wt").as("wa"))
        .join(wts.select(col("doc_id").as("id_b"), col("w"), col("wt").as("wb")), Seq("w"))
        .filter(col("id_a") < col("id_b"))
        .groupBy(col("id_a"), col("id_b")).agg(sum(col("wa") * col("wb")).as("dot"))
      dots
        .join(norms.select(col("doc_id").as("id_a"), col("n2").as("na2")), Seq("id_a"))
        .join(norms.select(col("doc_id").as("id_b"), col("n2").as("nb2")), Seq("id_b"))
        .select(col("id_a"), col("id_b"),
          ops.Num.roundz(col("dot").cast("double") /
            sqrt(col("na2").cast("double") * col("nb2").cast("double")), 4)
            .as("cosine"))
        .filter(col("cosine") >= 0.5)
        .orderBy("id_a", "id_b")
    }),
    "q295_power_iteration" -> ((s, dir) =>
      // distributed PCA, extraction stage: the top principal direction of
      // the strided 16-dim projection by POWER ITERATION on the
      // correlation matrix — see [[topPrincipalDirection]] (shared with
      // q299, which projects the corpus onto this vector)
      topPrincipalDirection(s, dir)
        .select(col("j").cast("long").as("pos"), col("v").as("v_micro"),
          col("m").cast("long").as("growth"))
        .orderBy("pos")),
    "q296_lpa_communities" -> ((s, dir) => {
      // community detection by SYNCHRONOUS label propagation (Raghavan et
      // al. 2007) over the materialized co-purchase edge table: 4 fixed
      // rounds, each node adopts its neighbors' most frequent label with
      // ties to the smallest — the async/random-order variants converge
      // faster but are irreproducible, and a data pipeline needs the same
      // communities on every run. Per round: one node-keyed join against
      // the label frame, one (node, label) count, one degree-bounded
      // window — 4·O(m) total, on the shared edge artifact (derived once)
      import org.apache.spark.sql.expressions.Window
      val e = copurchaseEdges(s, dir) // (src, dst), both directions
      var lab = e.select(col("src").as("node")).distinct()
        .withColumn("label", col("node"))
      (1 to 4).foreach { _ =>
        val gathered = e
          .join(lab.select(col("node").as("dst"), col("label")), "dst")
          .groupBy(col("src"), col("label")).agg(count(lit(1)).as("c"))
        // argmax by (count desc, label asc) as ONE hash aggregate —
        // max(struct(c, −label)) — instead of a per-round row_number
        // window, which would re-sort every node's candidate list
        lab = gathered
          .groupBy(col("src"))
          .agg(max(struct(col("c"), (-col("label")).as("nl"))).as("b"))
          .select(col("src").as("node"), (-col("b.nl")).as("label"))
          .localCheckpoint()
      }
      lab.select(col("node").cast("long").as("node"),
          col("label").cast("long").as("label"))
        .orderBy("node")
    }),
    "q297_assortativity" -> ((s, dir) => {
      // degree assortativity (Newman 2002): Pearson r of endpoint degrees
      // over the co-purchase edges — the one-number graph-health summary
      // (hub-to-hub wiring r>0 vs hub-to-leaf r<0) that decides whether
      // degree-keyed partitioning will skew. Exact long moment sums over
      // one degree pass + two id-keyed joins; the correlation combines the
      // six exact sums in one fixed double op order, 4 dp
      val e = copurchaseEdges(s, dir)
      val deg = copurchaseDegrees(s, dir)
        .select(col("node").as("src"), col("degree").as("d"))
      val xy = e
        .join(deg.select(col("src"), col("d").as("dx")), "src")
        .join(deg.select(col("src").as("dst"), col("d").as("dy")), "dst")
        .select(col("dx"), col("dy"))
      xy.agg(count(lit(1)).as("n_edges"), sum(col("dx")).as("sx"),
          sum(col("dy")).as("sy"), sum(col("dx") * col("dy")).as("sxy"),
          sum(col("dx") * col("dx")).as("sx2"), sum(col("dy") * col("dy")).as("sy2"))
        .select(col("n_edges").cast("long").as("n_edges"),
          ops.Num.roundz(expr(
            """(CAST(n_edges AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
              | / (sqrt(CAST(n_edges AS DOUBLE) * CAST(sx2 AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
              |    * sqrt(CAST(n_edges AS DOUBLE) * CAST(sy2 AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))""".stripMargin), 4)
            .as("assortativity"))
    }),
    "q298_average_precision" -> ((s, dir) => {
      // AP@5 of the exact retrieval path with label-match relevance — the
      // order-sensitive cousin of q212's recall@k and q277's nDCG (a hit
      // at rank 1 outweighs one at rank 5; standard MAP headline).
      // precision@r quantized to exact micro-units ((cum·1e6) div r —
      // non-negative, so Spark trunc-div and DuckDB floor-div agree),
      // summed at hit ranks only, normalized by min(R, 5) where R counts
      // the query's label mates in the corpus (one |labels|-sized
      // aggregate, broadcast back). All ranking work on the |queries|×5
      // metadata frame.
      import org.apache.spark.sql.expressions.Window
      val emb = T(s, dir, "embeddings")
      val queries = emb.filter(col("vec_id") < 8)
      val nn = Similarity.cosineTopK(emb, queries, "vec_id", "embedding", 5)
        .select(col("query_id"), col("neighbor_id"), col("rn"))
      val rel = nn
        .join(emb.select(col("vec_id").as("neighbor_id"), col("label").as("__nl")), "neighbor_id")
        .join(broadcast(queries.select(col("vec_id").as("query_id"),
          col("label").as("__ql"))), "query_id")
        .select(col("query_id"), col("rn"),
          when(col("__nl") === col("__ql"), 1L).otherwise(0L).as("rel"))
      val w = Window.partitionBy(col("query_id")).orderBy(col("rn"))
      val perQ = rel.withColumn("cum", sum(col("rel")).over(w))
        .withColumn("pu", expr("(cum * 1000000) div rn"))
        .groupBy(col("query_id"))
        .agg(sum(col("rel")).as("n_rel"), sum(col("rel") * col("pu")).as("sum_pu"))
      val mates = emb.groupBy(col("label")).agg(count(lit(1)).as("__cl"))
      val denom = queries.select(col("vec_id").as("query_id"), col("label"))
        .join(broadcast(mates), "label")
        .select(col("query_id"), least(col("__cl") - 1, lit(5L)).as("denom"))
      perQ.join(broadcast(denom), "query_id")
        .select(col("query_id"), col("n_rel").cast("long").as("n_rel"),
          col("sum_pu").cast("long").as("sum_pu"),
          col("denom").cast("long").as("denom"),
          when(col("denom") === 0L, lit(0.0)).otherwise(ops.Num.roundz(
            col("sum_pu").cast("double") / (col("denom").cast("double") * 1000000d), 4))
            .as("ap"))
        .orderBy("query_id")
    }),
    "q299_abtt_outliers" -> ((s, dir) => {
      // All-But-The-Top (Mu & Viswanath, ICLR 2018) applied as an audit:
      // the 20 vectors with the largest |projection| onto the corpus's top
      // principal direction — the anisotropy hubs an ABTT correction
      // subtracts before cosine retrieval (a large common component makes
      // everything look similar to everything). Chains the PCA pipeline
      // end-to-end: q288's one-pass moments → q295's integer power
      // iteration → THIS corpus projection pass. Exactness: the centered
      // projection is n·⟨x,u⟩ − ⟨Σx,u⟩ in exact longs (no mean division,
      // so no trunc-vs-floor hazard on negatives; |terms| ≤ n·6e6·1e6·16
      // ≪ 2⁶³ at bench SFs — re-quantize u before n reaches ~1e5). One
      // corpus scan; the direction and the 16 dim-sums ride as broadcasts;
      // top-20 via TakeOrdered, never a global sort.
      import org.apache.spark.sql.expressions.Window
      val vdir = topPrincipalDirection(s, dir)
      val emb = T(s, dir, "embeddings")
      val ex = emb.select(col("vec_id"), posexplode(expr(
        "transform(sequence(0, 15), k -> CAST(round(CAST(element_at(embedding, k * 4 + 1) AS DOUBLE) * 1000000) AS BIGINT))"))
        .as(Seq("i", "mi")))
      val st = ex.groupBy(col("i")).agg(count(lit(1)).as("n"), sum(col("mi")).as("si"))
      val tv = ex
        .join(broadcast(st), "i")
        .join(broadcast(vdir.select(col("j").as("i"), col("v"))), "i")
        .groupBy(col("vec_id"))
        .agg(sum((col("n") * col("mi") - col("si")) * col("v")).as("tn"))
      tv.orderBy(abs(col("tn")).desc, col("vec_id")).limit(20)
        .withColumn("rk",
          row_number().over(Window.orderBy(abs(col("tn")).desc, col("vec_id"))))
        .select(col("rk").cast("long").as("rk"),
          col("vec_id").cast("long").as("vec_id"), col("tn").cast("long").as("tn"))
        .orderBy("rk")
    }),
    "q300_matryoshka_curve" -> ((s, dir) => {
      // Matryoshka serving lever (MRL, Kusupati et al. 2022): recall@5 of
      // prefix-dimension cosine ranking against the full-64-dim exact
      // top-5 — the dims-vs-quality curve that prices truncated-embedding
      // retrieval (a d-dim prefix scan moves d/64 of the bytes and FLOPs
      // of the full scan; MRL-trained encoders front-load information so
      // short prefixes stay usable). Each leg is one broadcast-queries
      // corpus scan at the sliced width (q45's shape — corpus never
      // shuffles); intersection and the recall ratio run on |queries|×5
      // metadata frames.
      val emb = T(s, dir, "embeddings")
      val queries = emb.filter(col("vec_id") < 8)
      def top5(d: Int): DataFrame = {
        val q = queries.select(col("vec_id").as("query_id"),
          slice(col("embedding"), 1, d).as("qv"))
        val c = emb.select(col("vec_id").as("neighbor_id"),
          slice(col("embedding"), 1, d).as("cv"))
        val scored = c.crossJoin(broadcast(q))
          .filter(col("neighbor_id") =!= col("query_id"))
          .withColumn("cosine",
            Similarity.dot("qv", "cv") / (Similarity.norm("qv") * Similarity.norm("cv")))
          .select(col("query_id"), col("neighbor_id"), col("cosine"))
        Similarity.topKPerQuery(scored, 5).select(col("query_id"), col("neighbor_id"))
      }
      val full = top5(64).localCheckpoint()
      val nq = queries.agg(count(lit(1)).as("n_queries"))
      Seq(8, 16, 32).map { d =>
        top5(d).join(broadcast(full), Seq("query_id", "neighbor_id"))
          .agg(count(lit(1)).as("matched"))
          .select(lit(d.toLong).as("dims"), col("matched"))
      }.reduce(_ unionByName _)
        .crossJoin(broadcast(nq))
        .select(col("dims"), col("n_queries").cast("long").as("n_queries"),
          col("matched").cast("long").as("matched"),
          ops.Num.roundz(col("matched").cast("double") /
            (col("n_queries").cast("double") * 5d), 4).as("recall"))
        .orderBy("dims")
    }),
    "q301_spearman" -> ((s, dir) => {
      // Spearman rank correlation between per-user activity (event count)
      // and spend (exact cents total) — the monotone-association check
      // behind "do heavy users spend more?", robust to the value
      // distribution's tail where q159's Pearson is not. Ranks are
      // row_number under a total order (metric, then user_id — the
      // deterministic tie policy both engines replay), assigned by the
      // two-phase global rank (q173's shape: 32 bin totals to the driver,
      // never a single-partition window); the correlation combines six
      // exact long rank-moments in one fixed double op order. Rank
      // products stay ≪ 2⁶³ up to ~2M users; shard-and-requantize past
      // that.
      val per = T(s, dir, "events").groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_ev"),
          sum(ops.Num.roundz(col("value") * 100, 0).cast("long")).as("cents"))
        .localCheckpoint()
      val (ra, _) = graft.ops.TwoPhase.globalRank(per, col("n_ev"),
        Seq(col("n_ev"), col("user_id")), "ra")
      val (rb, _) = graft.ops.TwoPhase.globalRank(per, col("cents"),
        Seq(col("cents"), col("user_id")), "rb")
      ra.select(col("user_id"), col("ra"))
        .join(rb.select(col("user_id"), col("rb")), "user_id")
        .agg(count(lit(1)).as("n_users"), sum(col("ra")).as("sa"),
          sum(col("rb")).as("sb"), sum(col("ra") * col("rb")).as("sab"),
          sum(col("ra") * col("ra")).as("sa2"), sum(col("rb") * col("rb")).as("sb2"))
        .select(col("n_users").cast("long").as("n_users"),
          ops.Num.roundz(expr(
            """(CAST(n_users AS DOUBLE) * CAST(sab AS DOUBLE) - CAST(sa AS DOUBLE) * CAST(sb AS DOUBLE))
              | / (sqrt(CAST(n_users AS DOUBLE) * CAST(sa2 AS DOUBLE) - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE))
              |    * sqrt(CAST(n_users AS DOUBLE) * CAST(sb2 AS DOUBLE) - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE)))""".stripMargin), 4)
            .as("spearman"))
    }),
    "q302_filtered_ann" -> ((s, dir) => {
      // FILTERED vector search: top-5 under a metadata predicate
      // (label = 2) — the production RAG-serving path (tenant/ACL/
      // recency filters). PRE-filtering applies the predicate to the
      // cell scan BEFORE scoring (cell assignment is per-vector, so the
      // filtered index ≡ filtered assignments; cost ∝ selectivity and
      // exactness within probed cells is preserved); the row also
      // carries post_kept = predicate survivors in the UNFILTERED top-5
      // — the recall loss that makes naive filter-after-search wrong
      // (post_kept < 5 while the pre-filtered side still returns 5).
      // Same broadcast-centroid probes and two-phase ranking as q58,
      // nprobe = 2.
      val emb = T(s, dir, "embeddings")
      val queries = emb.filter(col("vec_id") < 8)
      val cents = emb.filter(col("vec_id") < 16)
      val pre = Similarity.ivfTopK(emb.filter(col("label") === 2), queries,
        cents, "vec_id", "embedding", 5, nprobe = 2)
      val post = Similarity.ivfTopK(emb, queries, cents, "vec_id", "embedding", 5, nprobe = 2)
        .join(emb.select(col("vec_id").as("neighbor_id"), col("label")), "neighbor_id")
        .filter(col("label") === 2)
        .groupBy(col("query_id")).agg(count(lit(1)).as("post_kept"))
      pre.join(broadcast(post), Seq("query_id"), "left")
        .select(col("query_id"), col("rn"), col("neighbor_id"), col("cosine"),
          coalesce(col("post_kept"), lit(0L)).cast("long").as("post_kept"))
        .orderBy("query_id", "rn")
    }),
    "q303_freshness_decay" -> ((s, dir) => {
      // time-decayed engagement ranking: per-user sum of spend halved
      // every week of age (feed-ranking freshness), top 20. Exactness by
      // DYADIC arithmetic: age buckets k = days div 7 capped at 16, each
      // cents amount scaled by 2^(16−k) — a LONG shift, so the per-user
      // sum is an exact integer both engines agree on regardless of
      // add order (a float exp(−λ·age) sum would be order-sensitive).
      // The "now" anchor is data-derived (max ts, q09's rule); one
      // groupBy(user) with map-side combine; top-20 via TakeOrdered.
      val ev = T(s, dir, "events")
      val anchor = ev.agg(max(to_date(col("ts"))).as("__today"))
      val scored = ev.crossJoin(broadcast(anchor))
        .select(col("user_id"),
          ops.Num.roundz(col("value") * 100, 0).cast("long").as("cents"),
          least(expr("datediff(__today, to_date(ts)) div 7"), lit(16L)).as("k"))
        .select(col("user_id"),
          expr("cents * shiftleft(1L, CAST(16 - k AS INT))").as("scaled"))
      scored.groupBy(col("user_id"))
        .agg(sum(col("scaled")).as("scaled"))
        .select(col("user_id"), col("scaled").cast("long").as("scaled"),
          ops.Num.roundz(col("scaled").cast("double") / 65536d, 4).as("score"))
        .orderBy(col("scaled").desc, col("user_id")).limit(20)
    }),
    "q304_colbert_maxsim" -> ((s, dir) => {
      // late-interaction retrieval (ColBERT MaxSim, Khattab & Zaharia
      // SIGIR 2020): each vector is read as 4 16-dim "token" subvectors
      // (contiguous slices); score(q, d) = Σ_i max_j cos(q_i, d_j) — the
      // retrieval family between single-vector cosine (q45) and full
      // cross-attention, ranking by best per-token alignment. Shape: the
      // whole interaction is MAP-SIDE — subvectors are normalized once
      // per row, the 8 prepared queries broadcast, and each corpus row
      // computes all 16 dots and the fixed-order fold (((m0+m1)+m2)+m3
      // — no float-sum order hazard) in one scan with ZERO shuffle
      // before the two-phase k-heap (an explode-and-regroup formulation
      // would shuffle 4·|corpus|·|queries| rows back together).
      val emb = T(s, dir, "embeddings")
      val prep = (idAs: String, out: String) => (df: DataFrame) => df
        .select(col("vec_id").as(idAs),
          expr("transform(sequence(0, 3), i -> slice(embedding, i * 16 + 1, 16))").as("__subs"))
        .withColumn("__norms", expr(
          "transform(__subs, sv -> sqrt(aggregate(zip_with(sv, sv, (a, b) -> CAST(a AS DOUBLE) * CAST(b AS DOUBLE)), CAST(0.0 AS DOUBLE), (s, v) -> s + v)))"))
        .select(col(idAs), expr(
          "zip_with(__subs, __norms, (sv, nm) -> transform(sv, x -> CAST(x AS DOUBLE) / nm))")
          .as(out))
      val q8 = prep("query_id", "qn")(emb.filter(col("vec_id") < 8))
      val cs = prep("neighbor_id", "cn")(emb)
      val dotIJ = (i: Int, j: Int) =>
        s"aggregate(zip_with(element_at(qn, $i), element_at(cn, $j), (x, y) -> x * y), CAST(0.0 AS DOUBLE), (s, v) -> s + v)"
      val g = (i: Int) => s"greatest(${(1 to 4).map(j => dotIJ(i, j)).mkString(", ")})"
      val ms = cs.crossJoin(broadcast(q8))
        .filter(col("neighbor_id") =!= col("query_id"))
        .select(col("query_id"), col("neighbor_id"),
          expr(s"(((${g(1)} + ${g(2)}) + ${g(3)}) + ${g(4)})").as("cosine"))
      Similarity.topKPerQuery(ms, 5)
        .select(col("query_id"), col("neighbor_id"), col("cosine").as("maxsim"), col("rn"))
        .orderBy("query_id", "rn")
    }),
    "q305_vocab_coverage" -> ((s, dir) => {
      // tokenizer vocabulary sizing: corpus token coverage at vocab
      // cutoffs V ∈ {5, 10, 20} (sized to the synthetic 31-token vocabulary so the
      // curve is informative) — the OOV-rate curve read before BPE
      // training (q223/q249 learn the merges; this prices the budget).
      // One token pass to the vocab frame; head ranks via the two-phase
      // global rank (the vocabulary is corpus-sized at 100 TB — never a
      // single-partition window over it); coverage in exact integer
      // basis points.
      val counts = T(s, dir, "documents")
        .select(explode(split(lower(col("text")), "\\s+")).as("token"))
        .filter(length(col("token")) > 0)
        .groupBy(col("token")).agg(count(lit(1)).as("cnt"))
        .withColumn("nc", negate(col("cnt")))
        .localCheckpoint()
      val (ranked, _) = graft.ops.TwoPhase.globalRank(counts, col("nc"),
        Seq(col("nc"), col("token")), "rank")
      val tot = counts.agg(sum(col("cnt")).as("total_tokens"))
      Seq(5, 10, 20).map { v =>
        ranked.filter(col("rank") <= v)
          .agg(coalesce(sum(col("cnt")), lit(0L)).as("covered_tokens"))
          .select(lit(v.toLong).as("vocab_size"), col("covered_tokens"))
      }.reduce(_ unionByName _)
        .crossJoin(broadcast(tot))
        .select(col("vocab_size"),
          col("covered_tokens").cast("long").as("covered_tokens"),
          col("total_tokens").cast("long").as("total_tokens"),
          expr("(covered_tokens * 10000) div total_tokens").as("coverage_bp"))
        .orderBy("vocab_size")
    }),
    "q306_vacuum_retention" -> ((s, dir) => {
      // lakehouse VACUUM under a retention horizon — the 100 TB analogue
      // of the reference's cadenced Postgres VACUUM task (Data
      // Collection/Airflow.py:85-90). Lifecycle staged the way the public
      // formats do it: v1 commits half the days, v2 appends the rest, v3
      // is an OPTIMIZE REWRITE (new compacted files APPENDED — writers
      // never delete; v2's generation stays readable for time travel),
      // then vacuum(retain ≥ 3) reclaims every file no retained snapshot
      // references. The gate reads the post-vacuum v3 snapshot — row
      // fidelity through commit→rewrite→reclaim is the contract
      // ("never delete a file a retained snapshot can read");
      // StorageSpec asserts the file accounting (old generation gone,
      // naive dir read ≡ v3 afterwards).
      import graft.storage.Storage
      val tmp = s"$TMP/q306_vac"; val log = s"$TMP/q306_vac_log"
      val ev = T(s, dir, "events")
        .withColumn("day", TextFunctions.dayString(col("ts")))
      ev.filter(col("day") < "2024-01-16")
        .write.mode("overwrite").partitionBy("day").parquet(tmp)
      Storage.commitSnapshot(s, tmp, log, 1L, reset = true)
      ev.filter(col("day") >= "2024-01-16")
        .write.mode("append").partitionBy("day").parquet(tmp)
      Storage.commitSnapshot(s, tmp, log, 2L)
      Storage.readSnapshot(s, tmp, log, 2L)
        .repartition(col("day"))
        .write.mode("append").partitionBy("day").parquet(tmp)
      Storage.commitRewrite(s, tmp, log, 3L, replacing = 2L)
      Storage.vacuum(s, log, retainMinVersion = 3L)
      Storage.readSnapshot(s, tmp, log, 3L)
        // partition-dir read-back infers `day` as DATE; the contract (and
        // the oracle) speak strings
        .groupBy(col("day").cast("string").as("day"))
        .agg(count(lit(1)).as("cnt"))
        .select(col("day"), col("cnt").cast("long").as("cnt"))
        .orderBy("day")
    }),
    "q307_filtered_recall" -> ((s, dir) => {
      // the EVAL for q302: recall@5 of pre-filtered IVF (nprobe = 2)
      // against the exact filtered top-5, across predicate selectivities
      // (all / half / quarter of the corpus) — filtered-search recall is
      // the hard production question (a selective filter empties probed
      // cells, so recall vs selectivity is the curve that sets nprobe for
      // filtered traffic). Truth via the broadcast-queries brute-force
      // scan on the SAME filtered corpus; hits and ratios on |queries|×5
      // frames.
      val emb = T(s, dir, "embeddings")
      val queries = emb.filter(col("vec_id") < 8)
      val cents = emb.filter(col("vec_id") < 16)
      val legs = Seq(
        ("all", lit(true)),
        ("half", col("label") <= 1),
        ("quarter", col("label") === 2))
      legs.map { case (name, pred) =>
        val corpus = emb.filter(pred)
        val approx = Similarity.ivfTopK(corpus, queries, cents,
          "vec_id", "embedding", 5, nprobe = 2)
          .select(col("query_id"), col("neighbor_id"))
        val truth = Similarity.cosineTopK(corpus, queries, "vec_id", "embedding", 5)
          .select(col("query_id"), col("neighbor_id"))
        approx.join(broadcast(truth), Seq("query_id", "neighbor_id"))
          .agg(count(lit(1)).as("hits"))
          .select(lit(name).as("leg"), col("hits"))
      }.reduce(_ unionByName _)
        .crossJoin(broadcast(queries.agg(count(lit(1)).as("n_queries"))))
        .select(col("leg"), col("n_queries").cast("long").as("n_queries"),
          col("hits").cast("long").as("hits"),
          ops.Num.roundz(col("hits").cast("double") /
            (col("n_queries").cast("double") * 5d), 4).as("recall"))
        .orderBy("leg")
    }),
    "q308_k_anonymity" -> ((s, dir) => {
      // privacy-release audit (Sweeney 2002 k-anonymity): how much of the
      // table survives if every quasi-identifier group smaller than k is
      // suppressed, swept over k ∈ {2, 5, 10}. The governance gate a
      // training-data release runs BEFORE shipping user-derived rows — the
      // reference stores raw author/user rows in Postgres with no such
      // audit. The only corpus-sized work is ONE map-side-combined groupBy
      // to the |QI-combinations| frame (nation × segment ≤ 125 rows;
      // bounded by the QI domain, not the row count, at 100 TB); the
      // k-sweep is a 3×|QI| metadata cross join. Suppression share in
      // exact integer basis points (non-negative ⇒ trunc ≡ floor).
      val g = T(s, dir, "customer")
        .groupBy(col("c_nationkey"), col("c_mktsegment"))
        .agg(count(lit(1)).as("cnt"))
      import s.implicits._
      val ks = Seq(2L, 5L, 10L).toDF("k")
      g.crossJoin(broadcast(ks))
        .groupBy(col("k"))
        .agg(count(lit(1)).as("groups_total"),
          sum(when(col("cnt") < col("k"), 1L).otherwise(0L)).as("groups_below"),
          sum(when(col("cnt") < col("k"), col("cnt")).otherwise(0L)).as("rows_suppressed"),
          sum(col("cnt")).as("rows_total"))
        .select(col("k"), col("groups_total"), col("groups_below"),
          col("rows_suppressed"),
          expr("rows_suppressed * 10000 div rows_total").as("suppression_bp"))
        .orderBy("k")
    }),
    "q309_bloom_dedup" -> ((s, dir) => {
      // CROSS-DUMP dedup with a bloom prefilter (the new-crawl-vs-corpus
      // membership question, e.g. CCNet/RefinedWeb dump-over-dump): the
      // retained corpus' dedup keys (prefix-32 fingerprints, q104's key)
      // ride to every executor as a bloom sketch (~1.2 MB per 10⁶ keys at
      // 1% fpp), the incoming dump is filtered MAP-SIDE before any
      // exchange — at real dup rates that kills the shuffle of ~the whole
      // dump — and the survivors' exact confirm join removes the false
      // positives, so the result is EXACTLY the semi-join-with-counts the
      // oracle computes. Keys are hashed to longs with xxhash64 on BOTH
      // the build and the probe side (same function, same seed ⇒ no
      // false negatives, which is the correctness contract here).
      val docs = T(s, dir, "documents")
        .withColumn("p", substring(col("text"), 1, 32))
        .withColumn("src_n", expr("CAST(substring(source, 4) AS INT)"))
      val old = docs.filter(col("src_n") < 10).select(col("p"))
        .withColumn("h", xxhash64(col("p")))
      val fresh = docs.filter(col("src_n") >= 10)
        .select(col("doc_id"), col("source"), col("p"),
          xxhash64(col("p")).as("h"))
      val bf = old.stat.bloomFilter("h", 100000L, 0.01)
      val pruned = fresh.filter(graft.functions.BloomMightContain(col("h"),
        graft.functions.BloomMightContain.serialize(bf)))
      pruned.join(old.groupBy(col("p")).agg(count(lit(1)).as("n_old_matches")), Seq("p"))
        .select(col("doc_id"), col("source"), col("n_old_matches"))
        .orderBy("doc_id")
    }),
    "q310_pit_features" -> ((s, dir) => {
      // POINT-IN-TIME-correct training-set assembly (the feature-store
      // contract): for every label event (a purchase) the features are
      // computed over the SAME user's strictly-earlier events only — the
      // leakage rule every offline training table must prove. The oracle
      // states the semantics as the quadratic-per-user inequality join
      // (e.ts < l.ts); the engine computes it in ONE pass: one exchange
      // on user_id, one per-user sort, and a single window frame shared
      // by all three features — `rangeBetween(…, -1)` over the micro
      // timestamp is STRICTLY-earlier by value, so equal-timestamp rows
      // never leak in regardless of sort tie-breaks. O(n log n) per
      // partition vs the oracle's O(n²) per user; no user's history ever
      // crosses an executor. Value sums in exact floor-micros longs.
      val ev = T(s, dir, "events")
        .withColumn("tsm", unix_micros(col("ts")))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("tsm"))
        .rangeBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
      ev.select(col("event_id"), col("user_id"), col("event_type"),
          count(lit(1)).over(w).as("prior_events"),
          coalesce(sum(when(col("event_type") === "click", 1L).otherwise(0L)).over(w),
            lit(0L)).as("prior_clicks"),
          coalesce(sum(floor(col("value") * 1e6).cast("long")).over(w),
            lit(0L)).as("prior_value_micros"))
        .filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("prior_events"),
          col("prior_clicks"), col("prior_value_micros"))
        .orderBy("event_id")
    }),
    "q311_url_canonical" -> ((s, dir) => {
      // crawl-frontier URL canonicalization (the dedup key of a web-scale
      // crawl BEFORE any content fetch): lowercase scheme+host, strip
      // `www.` and the default port, drop the fragment, drop tracking
      // params (utm_*, ref), sort the survivors — so syntactic variants
      // collapse to one frontier entry. Raw URLs are synthesized per doc
      // (host/path/id from doc_id residues, tracking params from doc_id
      // itself), so every raw URL is unique but canonicalization
      // collapses them 25:1 — the oracle predicts each canonical form
      // arithmetically. Entirely map-side string work (codegen'd regex +
      // higher-order array functions, zero UDFs) followed by one
      // map-side-combined groupBy on the canonical key: at 100 TB the
      // frontier dedup IS that exchange, and nothing else.
      val raw = T(s, dir, "documents").select(col("doc_id"),
        concat(lit("HTTPS://WWW.Example"), (col("doc_id") % 5).cast("string"),
          lit(".COM:443/Path"), (col("doc_id") % 20).cast("string"),
          lit("/item?utm_source=s"), col("doc_id").cast("string"),
          lit("&id="), (col("doc_id") % 10).cast("string"),
          lit("&ref=r"), (col("doc_id") % 3).cast("string"),
          lit("#frag")).as("url"))
      val canon = raw
        .withColumn("host", regexp_replace(
          lower(regexp_extract(col("url"), "^[A-Za-z]+://([^/:?#]+)", 1)),
          "^www\\.", ""))
        .withColumn("path", regexp_extract(col("url"), "^[A-Za-z]+://[^/?#]+([^?#]*)", 1))
        .withColumn("params", expr(
          "array_join(array_sort(filter(split(regexp_extract(url, '\\\\?([^#]*)', 1), '&'), " +
            "p -> NOT startswith(p, 'utm_') AND NOT startswith(p, 'ref='))), '&')"))
        .select(col("doc_id"),
          concat(lit("https://"), col("host"), col("path"),
            when(col("params") === "", lit("")).otherwise(concat(lit("?"), col("params"))))
            .as("canon_url"))
      canon.groupBy(col("canon_url"))
        .agg(count(lit(1)).as("n_urls"), min(col("doc_id")).as("first_doc"))
        .orderBy("canon_url")
    }),
    "q312_diverse_topk" -> ((s, dir) => {
      // diversity-constrained retrieval (the RAG context-assembly rule,
      // MMR's tractable cousin): from each query's top-10 keep at most 2
      // hits per label group (rank order), then serve the best 5
      // survivors — so one over-represented cluster can't monopolize the
      // context window. The top-10 shortlist comes from the broadcast-
      // queries corpus scan + two-phase k-heap (q45's shape); everything
      // after — the label join-back, both rank windows — runs on the
      // |queries|×10 frame, which BROADCASTS against the corpus for its
      // label lookup. At 100 TB the corpus is scanned once and shuffles
      // never.
      val emb = T(s, dir, "embeddings")
      val top10 = Similarity.cosineTopK(emb, emb.filter(col("vec_id") < 8),
        "vec_id", "embedding", 10)
      val labeled = broadcast(top10)
        .join(emb.select(col("vec_id").as("neighbor_id"), col("label")), Seq("neighbor_id"))
      val wLab = org.apache.spark.sql.expressions.Window
        .partitionBy(col("query_id"), col("label")).orderBy(col("rn"))
      val wSel = org.apache.spark.sql.expressions.Window
        .partitionBy(col("query_id")).orderBy(col("rn"))
      labeled
        .withColumn("label_rank", row_number().over(wLab))
        .filter(col("label_rank") <= 2)
        .withColumn("sel_rn", row_number().over(wSel).cast("long"))
        .filter(col("sel_rn") <= 5)
        .select(col("query_id"), col("sel_rn"), col("neighbor_id"),
          col("label"), col("cosine"))
        .orderBy("query_id", "sel_rn")
    }),
    "q313_image_neardup" -> ((s, dir) => {
      // image NEAR-dup under a hamming tolerance (q228 finds exact dHash
      // collisions; real re-encodes/crops flip a few bits): per doc a 9×7
      // gradient PNG with a per-variant row perturbation is synthesized
      // and REALLY decoded (ImageIO, per partition), its 56-bit dHash
      // split into 7 row-bands, candidates from the (band_idx, band_byte)
      // equi-join — two hashes within hamming ≤ 16 concentrated in ≤ 2
      // rows share ≥ 5 of 7 bands, so banding has 100% recall on the
      // planted variants BY CONSTRUCTION — then the exact
      // bit_count(xor) ≤ 16 verify removes band coincidences. Never
      // pairwise pixels, never all-pairs hashes: candidate volume is
      // Σ bucket² over band buckets, the same contract as q44's LSH.
      import s.implicits._
      val imgs = T(s, dir, "documents").select(col("doc_id"))
        .filter(col("doc_id") < 300)
        .as[Long].mapPartitions(_.map { id =>
          val g = id % 50; val v = id / 50
          (id, Multimodal.synthPngPixels(9, 7, (x, y) => {
            val tweak = if (y == (v % 7)) 7 * x else 0
            val p = ((g * 13 + x * (y + 3) + tweak) % 256).toInt
            (p << 16) | (p << 8) | p
          }))
        }).toDF("doc_id", "payload")
      val hashed = Multimodal.dHash56(imgs, "doc_id").localCheckpoint(eager = false)
      val bands = hashed.select(col("doc_id"), col("dhash"),
        posexplode(expr("transform(sequence(0, 6), b -> shiftright(dhash, b * 8) & 255)"))
          .as(Seq("band_idx", "band_byte")))
      val a = bands.select(col("band_idx"), col("band_byte"),
        col("doc_id").as("id_a"), col("dhash").as("h_a"))
      val b = bands.select(col("band_idx"), col("band_byte"),
        col("doc_id").as("id_b"), col("dhash").as("h_b"))
      a.join(b, Seq("band_idx", "band_byte"))
        .filter(col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"), col("h_a"), col("h_b")).distinct()
        .withColumn("hamming", expr("CAST(bit_count(h_a ^ h_b) AS BIGINT)"))
        .filter(col("hamming") <= 16)
        .select(col("id_a"), col("id_b"), col("hamming"))
        .orderBy("id_a", "id_b")
    }),
    "q314_rouge_overlap" -> ((s, dir) => {
      // ROUGE-1 with clipped counts (Lin 2004) between paired docs — the
      // n-gram overlap eval behind summarization/distillation QA, and the
      // contamination yardstick between candidate generations and
      // references. Pairs are (even doc, its successor); the clipped
      // overlap Σ_w min(tf_cand, tf_ref) comes from ONE token-keyed
      // equi-join of the two per-pair term-frequency frames (tokens only
      // meet inside their pair — the join key is (pair, token), so fan-in
      // is bounded by per-doc vocabulary, never corpus²); recall/precision
      // in exact integer basis points.
      val docs = T(s, dir, "documents")
      def tf(df: DataFrame, pair: Column) = df
        .select(pair.as("pair_id"),
          explode(expr("filter(split(lower(text), '\\\\s+'), t -> length(t) > 0)")).as("w"))
        .groupBy(col("pair_id"), col("w")).agg(count(lit(1)).as("c"))
      val cand = tf(docs.filter(col("doc_id") % 2 === 0), col("doc_id"))
      val ref = tf(docs.filter(col("doc_id") % 2 === 1), col("doc_id") - 1)
      val overlap = cand.select(col("pair_id"), col("w"), col("c").as("c1"))
        .join(ref.select(col("pair_id"), col("w"), col("c").as("c2")), Seq("pair_id", "w"))
        .groupBy(col("pair_id"))
        .agg(sum(least(col("c1"), col("c2"))).as("overlap"))
      val candTot = cand.groupBy(col("pair_id")).agg(sum(col("c")).as("cand_tokens"))
      val refTot = ref.groupBy(col("pair_id")).agg(sum(col("c")).as("ref_tokens"))
      candTot.join(refTot, Seq("pair_id"))
        .join(overlap, Seq("pair_id"), "left")
        .select(col("pair_id"), col("cand_tokens"), col("ref_tokens"),
          coalesce(col("overlap"), lit(0L)).as("overlap"))
        .withColumn("rouge1_recall_bp", expr("overlap * 10000 div ref_tokens"))
        .withColumn("rouge1_precision_bp", expr("overlap * 10000 div cand_tokens"))
        .orderBy("pair_id")
    }),
    "q315_span_corruption" -> ((s, dir) =>
      // T5-style span corruption (Raffel et al. 2020, §3.1.4 objective):
      // every 5th token is replaced by an ordinal sentinel in the input
      // and emitted as "<X_k> token" in the target — the
      // denoising-objective pair generator of a pre-training pipeline.
      // ENTIRELY map-side: tokenize, mask, and re-join are higher-order
      // array ops per row (codegen'd, zero UDFs, zero shuffles — the only
      // exchange in the plan is the output sort), so at 100 TB this is a
      // pure scan-transform-write pass that scales with input bytes.
      // Spark lambda indices are 0-based; the oracle's list lambdas are
      // 1-based and shift by one.
      T(s, dir, "documents")
        .withColumn("tok", expr("filter(split(lower(text), '\\\\s+'), t -> length(t) > 0)"))
        .withColumn("masked", expr("filter(tok, (t, i) -> i % 5 = 0)"))
        .select(col("doc_id"),
          expr("array_join(transform(tok, (t, i) -> IF(i % 5 = 0, " +
            "concat('<X_', CAST(i div 5 AS STRING), '>'), t)), ' ')").as("corrupted"),
          expr("array_join(transform(masked, (t, j) -> " +
            "concat('<X_', CAST(j AS STRING), '> ', t)), ' ')").as("targets"),
          expr("CAST(size(masked) AS BIGINT)").as("n_masked"))
        .orderBy("doc_id")),
    "q316_binary_embedding" -> ((s, dir) => {
      // 1-bit embedding serving (sign LSH / binary passage retrieval —
      // the 32× compression tier below SQ8 and PQ): each 64-dim vector
      // collapses to two 32-bit sign words, ranking is integer hamming
      // (bit_count over xor — NO float anywhere in the scoring path, so
      // determinism is free), and the gate row carries `hit`, membership
      // in the exact float top-5 — the recall readout that prices the
      // tier. Same broadcast-queries one-corpus-scan + two-phase k-heap
      // shape as q45; two words per vector is what rides the wire.
      val emb = T(s, dir, "embeddings")
      def words(df: DataFrame) = df.select(col("vec_id"),
        expr("aggregate(transform(sequence(0, 31), i -> IF(element_at(embedding, i + 1) > 0, " +
          "shiftleft(CAST(1 AS BIGINT), i), CAST(0 AS BIGINT))), CAST(0 AS BIGINT), (a, x) -> a + x)")
          .as("w_lo"),
        expr("aggregate(transform(sequence(32, 63), i -> IF(element_at(embedding, i + 1) > 0, " +
          "shiftleft(CAST(1 AS BIGINT), i - 32), CAST(0 AS BIGINT))), CAST(0 AS BIGINT), (a, x) -> a + x)")
          .as("w_hi"))
      val q = words(emb.filter(col("vec_id") < 8))
        .select(col("vec_id").as("query_id"), col("w_lo").as("q_lo"), col("w_hi").as("q_hi"))
      val c = words(emb)
        .select(col("vec_id").as("neighbor_id"), col("w_lo").as("c_lo"), col("w_hi").as("c_hi"))
      val scored = c.crossJoin(broadcast(q))
        .filter(col("neighbor_id") =!= col("query_id"))
        .withColumn("cosine",
          -(expr("bit_count(q_lo ^ c_lo) + bit_count(q_hi ^ c_hi)").cast("double")))
        .select(col("query_id"), col("neighbor_id"), col("cosine"))
      val top5 = Similarity.topKPerQuery(scored, 5)
        .select(col("query_id"), col("neighbor_id"),
          (-col("cosine")).cast("long").as("hamming"), col("rn"))
      val truth = Similarity.cosineTopK(emb, emb.filter(col("vec_id") < 8),
        "vec_id", "embedding", 5)
        .select(col("query_id"), col("neighbor_id"), lit(1L).as("hit"))
      top5.join(broadcast(truth), Seq("query_id", "neighbor_id"), "left")
        .select(col("query_id"), col("rn"), col("neighbor_id"), col("hamming"),
          coalesce(col("hit"), lit(0L)).as("hit"))
        .orderBy("query_id", "rn")
    }),
    "q317_cdc_apply" -> ((s, dir) => {
      // ordered-changelog APPLY (the consumer of q123's diff stream, and
      // the missing half of q95's upsert: DELETES and re-inserts): replay
      // an I/U/D log onto a base snapshot with latest-op-wins per key.
      // The planted log exercises every ordering hazard — update@1,
      // delete@2, re-insert@3 on overlapping key sets, so %20 keys are
      // deleted THEN re-born. The engine applies the whole log in ONE
      // key-hash aggregate: max(struct(seq, …)) picks each key's final
      // op (no window, no per-op sequential passes — at 100 TB the apply
      // is one exchange), then a map-side filter drops keys whose final
      // op is D.
      val base = T(s, dir, "customer").select(col("c_custkey"),
        ops.Num.roundz(col("c_acctbal") * 100, 0).cast("long").as("cents"),
        col("c_mktsegment").as("segment"))
      val log = base.filter(col("c_custkey") % 7 === 0)
        .select(col("c_custkey"), lit(1L).as("seq"), lit("U").as("op"),
          (col("cents") + 1000L).as("cents"), col("segment"))
        .unionByName(base.filter(col("c_custkey") % 10 === 0)
          .select(col("c_custkey"), lit(2L).as("seq"), lit("D").as("op"),
            col("cents"), col("segment")))
        .unionByName(base.filter(col("c_custkey") % 20 === 0)
          .select(col("c_custkey"), lit(3L).as("seq"), lit("I").as("op"),
            lit(555L).as("cents"), lit("WINBACK").as("segment")))
      base.select(col("c_custkey"), lit(0L).as("seq"), lit("I").as("op"),
          col("cents"), col("segment"))
        .unionByName(log)
        .groupBy(col("c_custkey"))
        .agg(max(struct(col("seq"), col("op"), col("cents"), col("segment"))).as("last"))
        .filter(col("last.op") =!= "D")
        .select(col("c_custkey"), col("last.cents").as("cents"),
          col("last.segment").as("segment"))
        .orderBy("c_custkey")
    }),
    "q318_hits" -> ((s, dir) =>
      // two-sided importance on the DIRECTED customer→part purchase
      // relation: see [[Graph.hits]] — 2 exact-integer iterations, so
      // buyers of widely-bought parts and parts bought by broad buyers
      // reinforce, the signal a single PageRank score conflates
      Graph.hits(
        T(s, dir, "orders")
          .join(T(s, dir, "lineitem"), col("o_orderkey") === col("l_orderkey"))
          .select(col("o_custkey"), col("l_partkey")),
        "o_custkey", "l_partkey", iterations = 2)
        .orderBy("side", "node")),
    "q319_audio_downsample" -> ((s, dir) => {
      // REAL audio decimation under the gate: per doc a deterministic
      // 16-bit PCM ramp is synthesized into a genuine RIFF container,
      // REALLY parsed back (javax.sound, per partition), and decimated
      // 4:1 by block floor-means — see [[Multimodal.downsampleBox]]. The
      // oracle predicts every block mean arithmetically from the ramp
      // formula; sample counts vary per doc (80/84/88) so the full-block
      // contract (remainder dropped) is exercised at n % 4 = 0 only by
      // construction, and min/max/sum summarize the decimated signal
      // exactly.
      import s.implicits._
      val wavs = T(s, dir, "documents").select(col("doc_id"))
        .as[Long].mapPartitions(_.map { id =>
          val n = 80 + (id % 3).toInt * 4
          val samples = Array.tabulate[Short](n)(i => ((id * 31 + i * 7) % 401).toShort)
          (id, Multimodal.synthWavSamples(samples, 8000))
        }).toDF("doc_id", "payload")
      Multimodal.downsampleBox(wavs, "doc_id", 4).orderBy("doc_id")
    }),
    "q320_fixed_width" -> ((s, dir) => {
      // fixed-width (copybook-style) text interchange: rows render to a
      // 32-char fixed layout (custkey 10 zero-padded, segment 10
      // space-padded, signed cents 12 zero-padded), land in a REAL text
      // file, and the reader projects fields back out BY OFFSET — the
      // schema-on-read contract of mainframe/legacy feeds the reference's
      // CSV path can't express. All parse work is map-side codegen'd
      // substrings/casts; the gate aggregates per segment so the oracle
      // (which aggregates the source table directly) proves the roundtrip
      // lossless, sign and padding included.
      val safe = dir.replaceAll("[^A-Za-z0-9._-]", "_")
      val path = s"$TMP/fixed_width/$safe"
      T(s, dir, "customer").select(
          format_string("%010d%-10s%012d", col("c_custkey"), col("c_mktsegment"),
            ops.Num.roundz(col("c_acctbal") * 100, 0).cast("long")).as("value"))
        .write.mode("overwrite").text(path)
      s.read.text(path)
        .select(
          expr("CAST(substring(value, 1, 10) AS BIGINT)").as("c_custkey"),
          expr("trim(substring(value, 11, 10))").as("segment"),
          expr("CAST(substring(value, 21, 12) AS BIGINT)").as("cents"))
        .groupBy(col("segment"))
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("sum_cents"),
          min(col("c_custkey")).as("min_key"), max(col("c_custkey")).as("max_key"))
        .orderBy("segment")
    }),
    "q321_corrupt_quarantine" -> ((s, dir) => {
      // malformed-record quarantine at the ingest boundary: a JSONL feed
      // with planted corrupt lines (doc_id ≡ 7 mod 10) read back in
      // PERMISSIVE mode with an explicit corrupt-record column — bad
      // lines surface as rows (NULL fields + the raw line) instead of
      // failing the job (FAILFAST) or vanishing (DROPMALFORMED): the
      // production triage contract, since a silently-dropped record is
      // the one you needed. The gate row is the full-feed accounting
      // identity predicted from the planting rule; parse + quarantine
      // classification are entirely map-side.
      val safe = dir.replaceAll("[^A-Za-z0-9._-]", "_")
      val path = s"$TMP/jsonl_corrupt/$safe"
      T(s, dir, "documents").select(
          when(col("doc_id") % 10 === 7,
            concat(lit("{oops "), col("doc_id").cast("string")))
            .otherwise(format_string("{\"id\":%d,\"v\":%d}",
              col("doc_id"), col("doc_id") * 3 % 100)).as("value"))
        .write.mode("overwrite").text(path)
      s.read
        .schema("id LONG, v LONG, _corrupt_record STRING")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
        .agg(count(lit(1)).as("n_total"),
          sum(when(col("_corrupt_record").isNull, 1L).otherwise(0L)).as("n_good"),
          sum(when(col("_corrupt_record").isNotNull, 1L).otherwise(0L)).as("n_quarantined"),
          coalesce(sum(col("v")), lit(0L)).as("sum_v"))
    }),
    "q322_decimal_agg" -> ((s, dir) =>
      // exact DECIMAL money aggregation: sums run in Spark's Decimal128
      // (map-side combined, no float drift, no add-order sensitivity) —
      // the ledger-grade alternative to double sums whose last bits
      // depend on partitioning. Totals surface as canonical strings so
      // the two engines' different result-precision widenings
      // (decimal(28,2) vs decimal(38,2)) compare on VALUE.
      T(s, dir, "customer")
        .groupBy(col("c_mktsegment").as("segment"))
        .agg(sum(col("c_acctbal").cast("decimal(18,2)")).as("__bal"),
          count(lit(1)).as("n"))
        .select(col("segment"), col("__bal").cast("string").as("total_bal"), col("n"))
        .orderBy("segment")),
    "q323_nucleus_mass" -> ((s, dir) => {
      // nucleus (top-p) vocabulary statistics PER LANGUAGE: the smallest
      // frequency-ranked head covering 90% of token mass — the
      // per-language truncation budget (q305's global OOV curve, keyed).
      // The running mass comes from [[TwoPhase.prefixSumKeyed]]: a
      // per-language vocabulary is corpus-sized at 100 TB, so
      // partitionBy(lang) alone would serialize each language onto one
      // task — the keyed two-phase rewrite bins globally, windows per
      // (lang, bin), and broadcasts the |langs|·bins offset table back.
      // Membership is integer-exact: a token is in the nucleus iff the
      // mass strictly before it is < 90% of its language's total.
      val tok = T(s, dir, "documents").select(col("lang"),
          explode(expr("filter(split(lower(text), '\\\\s+'), t -> length(t) > 0)")).as("w"))
        .groupBy(col("lang"), col("w")).agg(count(lit(1)).as("cnt"))
        .localCheckpoint(eager = false)
      val cum = TwoPhase.prefixSumKeyed(tok, "lang", -col("cnt"),
        Seq(col("cnt").desc, col("w")), col("cnt"), "cum")
      val totals = tok.groupBy(col("lang")).agg(sum(col("cnt")).as("total_tokens"),
        count(lit(1)).as("vocab"))
      cum.join(broadcast(totals), Seq("lang"))
        .groupBy(col("lang"), col("total_tokens"), col("vocab"))
        .agg(sum(when((col("cum") - col("cnt")) * 10 < col("total_tokens") * 9, 1L)
          .otherwise(0L)).as("nucleus_size"))
        .select(col("lang"), col("total_tokens"), col("vocab"), col("nucleus_size"),
          expr("nucleus_size * 10000 div vocab").as("nucleus_bp"))
        .orderBy("lang")
    }),
    "q324_two_hop_reach" -> ((s, dir) => {
      // 2-hop neighborhood size (friend-of-friend reach, the classic link
      // feature) for a FOCAL BATCH of nodes, expanding only through
      // intermediates of degree ≤ 60% of max. Both bounds are the scale
      // contract: exact all-nodes 2-hop is Σ deg(mid)² — quadratic in
      // density and intrinsically explosive (measured 45 s at sf0.1
      // before the seed bound) — but the PRODUCTION shape is per-batch
      // (score reach for this request's candidates), which caps the path
      // join at |seeds|·deg·cap; the hub-tier exclusion is RELATIVE so
      // the same rule holds at any scale. Edges from the shared
      // materialized co-purchase index; cap a 1-row broadcast; reach
      // counts DISTINCT destinations, self excluded.
      val e = copurchaseEdges(s, dir)
      val deg = copurchaseDegrees(s, dir)
        .select(col("node").as("src"), col("degree").as("deg"))
        .localCheckpoint(eager = false)
      val cap = deg.agg(max(col("deg")).as("__mx"))
      val low = deg.crossJoin(broadcast(cap))
        .filter(col("deg") * 10 <= col("__mx") * 6).select(col("src").as("mid"))
      val seeds = deg.filter(col("src") % 100 === 0)
      val hop2 = e.select(col("src").as("v"), col("dst").as("mid"))
        .filter(col("v") % 100 === 0)
        .join(low, Seq("mid"))
        .join(e.select(col("src").as("mid"), col("dst").as("w")), Seq("mid"))
        .filter(col("w") =!= col("v"))
        .select(col("v"), col("w")).distinct()
        .groupBy(col("v")).agg(count(lit(1)).as("reach2"))
      seeds.select(col("src").as("node"), col("deg").as("n_1hop"))
        .join(hop2, col("node") === hop2("v"), "left")
        .select(col("node"), col("n_1hop"),
          coalesce(col("reach2"), lit(0L)).as("reach2"))
        .orderBy("node")
    }),
    "q325_burstiness" -> ((s, dir) => {
      // term burstiness (index of dispersion Var/mean of per-doc counts,
      // zeros included): the corpus-linguistics signal separating bursty
      // content words from uniformly-sprinkled function words — a
      // keyword/boilerplate discriminator df alone can't see. One token
      // pass to the vocabulary frame carrying (df, Σc, Σc²); dispersion
      // is EXACT integer arithmetic over those moments and the 1-row doc
      // count (D·1000 = (N·Σc² − T²)·1000 div (N·T) — Var/mean needs no
      // float), so zeros never materialize. Top-20 by (df desc, token)
      // via the ordered limit (TakeOrdered — never a full global sort).
      val docs = T(s, dir, "documents")
      val n = docs.agg(count(lit(1)).as("__n"))
      docs.select(col("doc_id"),
          explode(expr("filter(split(lower(text), '\\\\s+'), t -> length(t) > 0)")).as("w"))
        .groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("c"))
        .groupBy(col("w"))
        .agg(count(lit(1)).as("df"), sum(col("c")).as("total"),
          sum(col("c") * col("c")).as("__sq"))
        .crossJoin(broadcast(n))
        .select(col("w").as("token"), col("df"), col("total"),
          expr("(__n * __sq - total * total) * 1000 div (__n * total)").as("disp_milli"))
        .orderBy(col("df").desc, col("token")).limit(20)
    }),
    "q326_equidepth_hist" -> ((s, dir) => {
      // ANALYZE-style equi-depth histogram (32 buckets over order value):
      // the optimizer-statistics primitive behind selectivity estimation
      // — bucket boundaries carry equal row mass, so a range predicate's
      // selectivity reads off bucket counts. Exact bucket assignment via
      // the two-phase global rank + closed-form ntile (q96's machinery:
      // never a single-partition window over the fact table); per-bucket
      // lo/hi/count in exact cents.
      val o = T(s, dir, "orders").select(col("o_orderkey"),
        ops.Num.roundz(col("o_totalprice") * 100, 0).cast("long").as("cents"))
      val (ranked, nTot) = TwoPhase.globalRank(o, col("cents"),
        Seq(col("cents"), col("o_orderkey")), "rank")
      ranked
        .withColumn("bucket", TwoPhase.ntileFromRank("rank", nTot, 32).cast("long"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("cnt"), min(col("cents")).as("lo_cents"),
          max(col("cents")).as("hi_cents"))
        .orderBy("bucket")
    }),
    "q327_strip_accents" -> ((s, dir) => {
      // diacritic folding for multilingual dedup keys: accented variants
      // (planted by translating vowels on even docs — the fixture corpus
      // is pure ASCII, so the accents are synthesized deterministically)
      // fold back to their base letters via the codegen'd
      // [[graft.functions.StripAccents]] expression (NFD + drop combining
      // marks — what NFC normalization alone can't do). Entirely
      // map-side; the gate compares every folded string char-for-char
      // against DuckDB's independent strip_accents implementation, which
      // is the cross-engine semantics proof.
      val accented = when(col("doc_id") % 2 === 0,
        translate(substring(col("text"), 1, 24), "aeiou", "áéíóü"))
        .otherwise(substring(col("text"), 1, 24))
      T(s, dir, "documents")
        .select(col("doc_id"), accented.as("accented"),
          graft.functions.StripAccents(accented).as("folded"))
        .orderBy("doc_id")
    }),
    "q328_robots_filter" -> ((s, dir) => {
      // crawl-policy domain filtering: each doc's host reduces to its
      // REGISTERED domain (last two labels — extracted from the string,
      // never trusted from metadata) and joins a broadcast blocklist, so
      // sub.dom0.com is blocked by the dom0.com entry — suffix-match
      // semantics a naive host equality misses. The blocklist is
      // metadata-sized (it broadcasts; the corpus never shuffles for it);
      // extraction is map-side array ops. Output is the per-domain
      // admission ledger.
      import s.implicits._
      val hosts = T(s, dir, "documents").select(col("doc_id"),
        concat(lit("sub"), (col("doc_id") % 4).cast("string"),
          lit(".dom"), (col("doc_id") % 7).cast("string"), lit(".com")).as("host"))
      val withReg = hosts.withColumn("reg_domain",
        expr("array_join(slice(split(host, '\\\\.'), -2, 2), '.')"))
      val block = Seq("dom0.com", "dom3.com").toDF("reg_domain")
        .withColumn("blocked", lit(1L))
      withReg.join(broadcast(block), Seq("reg_domain"), "left")
        .groupBy(col("reg_domain"))
        .agg(count(lit(1)).as("n_docs"),
          max(coalesce(col("blocked"), lit(0L))).as("blocked"))
        .orderBy("reg_domain")
    }),
    "q329_vector_norm_audit" -> ((s, dir) => {
      // embedding-store hygiene: flag vectors whose norm² deviates from
      // the corpus median by > 10·MAD — the corrupt-vector detector
      // (zeroed rows, double-scaled rows) that runs BEFORE an index
      // build, with two planted corruptions proving both tails. All
      // arithmetic exact: norm² in micro² longs (map-side array fold),
      // median and MAD as lower medians selected BY RANK via the
      // two-phase global rank (never a single-partition window), each
      // 1-row statistic joining back as a broadcast.
      val emb = T(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
        .unionByName(T(s, dir, "embeddings").filter(col("vec_id") < 2)
          .select((col("vec_id") + 9000001L).as("vec_id"),
            expr("transform(embedding, x -> CAST(20.0 AS FLOAT))").as("embedding")))
        .unionByName(T(s, dir, "embeddings").filter(col("vec_id") < 2)
          .select((col("vec_id") + 9000003L).as("vec_id"),
            expr("transform(embedding, x -> CAST(0.0 AS FLOAT))").as("embedding")))
      val nsq = emb.select(col("vec_id"),
        expr("aggregate(transform(embedding, x -> " +
          "CAST(round(CAST(x AS DOUBLE) * 1000000.0, 0) AS BIGINT) * " +
          "CAST(round(CAST(x AS DOUBLE) * 1000000.0, 0) AS BIGINT)), " +
          "CAST(0 AS BIGINT), (a, y) -> a + y)")
          .as("norm_sq")).localCheckpoint(eager = false)
      def lowerMedian(df: DataFrame, v: String): DataFrame = {
        val (ranked, n) = TwoPhase.globalRank(df, col(v), Seq(col(v), col("vec_id")), "__r")
        ranked.filter(col("__r") === lit((n + 1) / 2)).select(col(v).as("__med"))
      }
      val med = lowerMedian(nsq, "norm_sq")
      val dev = nsq.crossJoin(broadcast(med))
        .select(col("vec_id"), col("norm_sq"), abs(col("norm_sq") - col("__med")).as("abs_dev"))
        .localCheckpoint(eager = false)
      val mad = lowerMedian(dev.select(col("vec_id"), col("abs_dev")), "abs_dev")
        .select(col("__med").as("__mad"))
      dev.crossJoin(broadcast(mad))
        .filter(col("abs_dev") > col("__mad") * 10)
        .select(col("vec_id"), col("norm_sq"), col("abs_dev"))
        .orderBy("vec_id")
    }),
    "q330_feature_hashing" -> ((s, dir) => {
      // the hashing trick (Weinberger et al., ICML 2009): tokens map to a
      // FIXED 256-bucket feature space via the codegen'd polynomial hash,
      // with a ±1 sign bit from the next hash bit so colliding tokens
      // partially cancel instead of summing — what makes a
      // dimensionality-fixed featurizer work without a vocabulary at all
      // (no vocab table, no OOV, no growth at 100 TB: the feature space
      // never changes size). The gate row is the per-bucket collision
      // ledger: distinct tokens (collisions = n−1), raw mass, signed
      // mass. One token pass, one bucket aggregate — both map-side
      // combined.
      T(s, dir, "documents").select(
          explode(expr("filter(split(lower(text), '\\\\s+'), t -> length(t) > 0)")).as("w"))
        .groupBy(col("w")).agg(count(lit(1)).as("c"))
        .withColumn("fp", graft.functions.RollingHash(col("w")))
        .withColumn("bucket", col("fp") % 256)
        .withColumn("sign", expr("((fp div 256) % 2) * 2 - 1"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n_distinct"), sum(col("c")).as("mass"),
          sum(col("sign") * col("c")).as("signed_mass"))
        .orderBy("bucket")
    }),
    "q331_count_min" -> ((s, dir) => {
      // count-min sketch (Cormode & Muthukrishnan 2005) with its error
      // audited against exact truth: 3 hash rows × 64 columns of summed
      // mass — a 192-cell MERGEABLE summary (cells sum across shards/
      // batches by construction, the streaming-frequency primitive
      // Misra–Gries (q155) complements with its keep-k form) — then the
      // top-20 true tokens read back est = min over rows, which can only
      // OVERcount (collisions add, never subtract): overest ≥ 0 is the
      // structural guarantee the gate row exhibits per token. The sketch
      // is metadata-sized and broadcasts; truth comes from the same one
      // token pass.
      val tok = T(s, dir, "documents").select(
          explode(expr("filter(split(lower(text), '\\\\s+'), t -> length(t) > 0)")).as("w"))
        .groupBy(col("w")).agg(count(lit(1)).as("c"))
        .withColumn("fp", graft.functions.RollingHash(col("w")))
        .localCheckpoint(eager = false)
      val seeds = Seq((0, 31L, 7L), (1, 131L, 13L), (2, 1031L, 17L))
      val hashed = seeds.map { case (i, a, b) =>
        tok.select(lit(i).as("row"),
          ((col("fp") * a + b) % 1000000007L % 64).as("col"),
          col("w"), col("c"))
      }.reduce(_ unionByName _)
      val sketch = hashed.groupBy(col("row"), col("col")).agg(sum(col("c")).as("cell"))
      val top = tok.orderBy(col("c").desc, col("w")).limit(20)
        .select(col("w"), col("c").as("true_cnt"), col("fp"))
      seeds.map { case (i, a, b) =>
        top.select(col("w"), col("true_cnt"), lit(i).as("row"),
          ((col("fp") * a + b) % 1000000007L % 64).as("col"))
      }.reduce(_ unionByName _)
        .join(broadcast(sketch), Seq("row", "col"))
        .groupBy(col("w"), col("true_cnt"))
        .agg(min(col("cell")).as("cms_est"))
        .select(col("w").as("token"), col("true_cnt"), col("cms_est"),
          (col("cms_est") - col("true_cnt")).as("overest"))
        .orderBy(col("true_cnt").desc, col("token"))
    }),
    "q332_gzip_text" -> ((s, dir) => {
      // compressed-text interchange: lines land in REAL gzip files and
      // read back through Spark's transparent codec path — the default
      // wire format of web-crawl dumps (WET/WARC-derived feeds ship
      // gzipped). The caveat this key encodes: gzip is NOT splittable,
      // so one file = one read task — at 100 TB the parallelism contract
      // is MANY gzip files (here one per write task), never one giant
      // archive. The gate proves byte fidelity through compress +
      // decompress by aggregating the parsed lines against the source
      // table.
      val safe = dir.replaceAll("[^A-Za-z0-9._-]", "_")
      val path = s"$TMP/gzip_text/$safe"
      T(s, dir, "documents")
        .select(concat(col("doc_id").cast("string"), lit("|"), col("text")).as("value"))
        .write.mode("overwrite").option("compression", "gzip").text(path)
      s.read.text(path).select(
          expr("CAST(substring_index(value, '|', 1) AS BIGINT)").as("doc_id"),
          expr("substring(value, instr(value, '|') + 1, length(value))").as("text"))
        .agg(count(lit(1)).as("n_docs"),
          sum(length(col("text")).cast("long")).as("sum_chars"),
          sum(col("doc_id")).as("id_sum"))
    }),
    "q333_partition_overwrite" -> ((s, dir) => {
      // DYNAMIC partition overwrite (the lakehouse backfill contract):
      // rewriting one day's slice must replace exactly that partition —
      // static overwrite mode would silently DROP every other partition,
      // the classic data-loss footgun this mode exists to prevent. The
      // gate writes the full day-partitioned table, re-lands 2024-01-05
      // with doubled cents under partitionOverwriteMode=dynamic, and
      // proves every other day byte-identical; the session config is
      // restored in a finally.
      val safe = dir.replaceAll("[^A-Za-z0-9._-]", "_")
      val path = s"$TMP/dyn_overwrite/$safe"
      val ev = T(s, dir, "events").select(
        date_format(col("ts"), "yyyy-MM-dd").as("day"),
        ops.Num.roundz(col("value") * 100, 0).cast("long").as("cents"))
      ev.write.mode("overwrite").partitionBy("day").parquet(path)
      val conf = "spark.sql.sources.partitionOverwriteMode"
      val old = s.conf.get(conf, "STATIC")
      s.conf.set(conf, "dynamic")
      try ev.filter(col("day") === "2024-01-05")
        .withColumn("cents", col("cents") * 2)
        .write.mode("overwrite").partitionBy("day").parquet(path)
      finally s.conf.set(conf, old)
      // partition-dir read-back type-infers day as DATE — pin the string
      s.read.parquet(path).withColumn("day", col("day").cast("string"))
        .groupBy(col("day"))
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("sum_cents"))
        .orderBy("day")
    }),
    "q334_dynamic_pruning" -> ((s, dir) => {
      // DYNAMIC PARTITION PRUNING: joining a day-partitioned fact to a
      // filtered dim must prune fact PARTITIONS at runtime (the dim's
      // day set rides into the fact scan as a dynamicpruning subquery) —
      // at 100 TB this is the difference between scanning 3 days and
      // scanning all of them when the day list isn't known until the dim
      // is read. PlanSpec asserts the pruning subquery is in the fact
      // scan's partition filters; the gate proves the join result
      // matches the static-filter twin.
      val safe = dir.replaceAll("[^A-Za-z0-9._-]", "_")
      val path = s"$TMP/dpp_fact/$safe"
      val ev = T(s, dir, "events").select(
        date_format(col("ts"), "yyyy-MM-dd").as("day"),
        ops.Num.roundz(col("value") * 100, 0).cast("long").as("cents"))
      ev.write.mode("overwrite").partitionBy("day").parquet(path)
      val fact = s.read.parquet(path).withColumn("day", col("day").cast("string"))
      val dim = T(s, dir, "events")
        .select(date_format(col("ts"), "yyyy-MM-dd").as("day")).distinct()
        .filter(col("day") <= "2024-01-03")
      fact.join(broadcast(dim), Seq("day"))
        .groupBy(col("day"))
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("sum_cents"))
        .orderBy("day")
    }),
    "q335_code_switch" -> ((s, dir) => {
      // code-switching detection (mixed-language documents poison
      // monolingual training sets): language-ID each HALF of the doc
      // independently and flag confident disagreement — the cheap
      // first-pass filter before any per-sentence LID. German marker
      // tails are planted on doc_id ≡ 4 (mod 10) so the flag has
      // positives to find. Entirely expression-native and map-side
      // (the same codegen'd regexp scoring as q50, twice).
      val t = when(col("doc_id") % 10 === 4,
        concat(col("text"), lit(" der die das und ist nicht ein")))
        .otherwise(col("text"))
      T(s, dir, "documents")
        .select(col("doc_id"), t.as("t"))
        .withColumn("h1", expr("substring(t, 1, length(t) div 2)"))
        .withColumn("h2", expr("substring(t, length(t) div 2 + 1, length(t))"))
        .select(col("doc_id"),
          TextAnalysis.langId(col("h1")).as("lang_a"),
          TextAnalysis.langId(col("h2")).as("lang_b"))
        .withColumn("mixed",
          (col("lang_a") =!= lit("und") && col("lang_b") =!= lit("und") &&
            col("lang_a") =!= col("lang_b")).cast("long"))
        .orderBy("doc_id")
    }),
    "q336_temporal_split" -> ((s, dir) => {
      // time-based train/test split WITH EMBARGO (the financial-ML
      // leakage standard, López de Prado 2018): train ends two days
      // before test begins, the gap absorbing look-ahead through
      // slow-moving features; the gate row carries each split's event
      // and user mass plus its USER OVERLAP WITH TEST — the
      // cross-contamination readout (time splits don't isolate users;
      // the overlap column is what an entity-level split would zero).
      // Two aggregates and one distinct-user semi-frame join; the splits
      // are map-side CASE tags, never three scans.
      val ev = T(s, dir, "events").withColumn("split",
        when(col("ts") < lit("2024-01-18").cast("timestamp"), "1_train")
          .when(col("ts") < lit("2024-01-20").cast("timestamp"), "2_embargo")
          .otherwise("3_test"))
      val users = ev.select(col("split"), col("user_id")).distinct()
        .localCheckpoint(eager = false)
      val testUsers = users.filter(col("split") === "3_test")
        .select(col("user_id")).withColumn("__t", lit(1L))
      val overlap = users.join(broadcast(testUsers), Seq("user_id"))
        .groupBy(col("split")).agg(count(lit(1)).as("users_in_test"))
      ev.groupBy(col("split"))
        .agg(count(lit(1)).as("n_events"), count_distinct(col("user_id")).as("n_users"))
        .join(overlap, Seq("split"), "left")
        .select(col("split"), col("n_events"), col("n_users"),
          coalesce(col("users_in_test"), lit(0L)).as("users_in_test"))
        .orderBy("split")
    }),
    "q337_template_dedup" -> ((s, dir) => {
      // instruction-data TEMPLATE dedup: prompts that differ only in
      // filled-in values ("Q123: rate ..." vs "Q456: rate ...") collapse
      // after normalization (lowercase, strip digits and punctuation,
      // collapse whitespace) — the near-dup mode value-level exact dedup
      // (q43) and shingle MinHash (q44) both miss when the template is
      // short and the slots dominate. Normalization is map-side codegen'd
      // regex; dedup is one groupBy on the normalized key; only groups
      // of ≥ 2 surface.
      val prompt = concat(lit("Q"), col("doc_id").cast("string"), lit(": "),
        substring(col("text"), 1, 40))
      T(s, dir, "documents")
        .select(col("doc_id"),
          trim(regexp_replace(regexp_replace(regexp_replace(lower(prompt),
            "[0-9]", ""), "[^a-z ]", ""), "\\s+", " ")).as("template"))
        .groupBy(col("template"))
        .agg(count(lit(1)).as("n_prompts"), min(col("doc_id")).as("keeper_id"))
        .filter(col("n_prompts") >= 2)
        .orderBy("template")
    }),
    "q338_cross_modal_audit" -> ((s, dir) => {
      // cross-modality dedup agreement: text near-dup pairs (the shared
      // materialized MinHash index) vs image exact-dup pairs (dHash over
      // the q228 synthesized gradients), full-outer joined PAIR-KEYED and
      // classified both/text_only/image_only — the audit that says
      // whether one modality's dedup can proxy for the other (it can't:
      // the planted structures are independent, and the ledger shows it).
      // Both pair lists are candidate-bounded (banded LSH; hash groups);
      // the classification join carries only id pairs.
      val (pairs, _) = dedupIndex(s, dir)
      val tp = pairs.filter(col("id_a") < 300 && col("id_b") < 300)
        .select(col("id_a"), col("id_b")).withColumn("t", lit(1L))
      import s.implicits._
      val imgs = T(s, dir, "documents").select(col("doc_id"))
        .filter(col("doc_id") < 300)
        .as[Long].mapPartitions(_.map { id =>
          val g = id % 50
          (id, Multimodal.synthPngPixels(9, 7, (x, y) => {
            val v = ((g * 13 + x * (y + 3)) % 256).toInt
            (v << 16) | (v << 8) | v
          }))
        }).toDF("doc_id", "payload")
      val hashed = Multimodal.dHash56(imgs, "doc_id").localCheckpoint(eager = false)
      val ip = hashed.select(col("dhash"), col("doc_id").as("id_a"))
        .join(hashed.select(col("dhash"), col("doc_id").as("id_b")), Seq("dhash"))
        .filter(col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b")).withColumn("i", lit(1L))
      tp.join(ip, Seq("id_a", "id_b"), "full_outer")
        .select(when(col("t").isNotNull && col("i").isNotNull, "both")
          .when(col("t").isNotNull, "text_only")
          .otherwise("image_only").as("signal"))
        .groupBy(col("signal")).agg(count(lit(1)).as("n_pairs"))
        .orderBy("signal")
    }),
    "q339_stream_cdc_apply" -> ((s, dir) =>
      // q317's changelog apply as a CONTINUOUS MERGE: seq-ordered op
      // batches each merge onto the previous batch-keyed state snapshot
      // (anti join out the batch's keys, union in its non-deletes); the
      // final snapshot must equal the one-shot batch fold — the oracle
      // IS q317's SQL, which makes the gate row the incremental ≡ batch
      // proof. See [[Streaming.cdcApplyReplay]].
      Streaming.cdcApplyReplay(s, dir, s"$TMP/q339_src")),
    "q340_padding_waste" -> ((s, dir) =>
      // dynamic-batching padding ledger: docs bucket to the next
      // power-of-two length tier (the bucketed-batching serving/training
      // standard) and each tier reports its padding waste in exact basis
      // points — the number that decides between bucket granularities
      // (finer tiers = less padding, more batch fragmentation). The tier
      // is an integer indicator ladder (no float log2, whose exactness
      // at tier boundaries would be an engine coin-flip); one token-count
      // pass, one tier aggregate, both map-side combined.
      T(s, dir, "documents")
        .select(TextAnalysis.tokenCount(col("text")).cast("long").as("n"))
        .withColumn("bucket", expr(
          "CASE WHEN n <= 8 THEN 8 WHEN n <= 16 THEN 16 WHEN n <= 32 THEN 32 " +
            "WHEN n <= 64 THEN 64 WHEN n <= 128 THEN 128 WHEN n <= 256 THEN 256 " +
            "WHEN n <= 512 THEN 512 ELSE 1024 END"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n")).as("tokens"))
        .select(col("bucket").cast("long").as("bucket"), col("n_docs"), col("tokens"),
          (col("n_docs") * col("bucket")).as("padded_tokens"),
          expr("((n_docs * bucket - tokens) * 10000) div (n_docs * bucket)").as("waste_bp"))
        .orderBy("bucket")),
    "q341_rendezvous_shards" -> ((s, dir) => {
      // rendezvous (highest-random-weight) sharding with a RESIZE audit:
      // each doc goes to the shard maximizing h(doc, shard), and when the
      // fleet grows 8 → 9 only docs whose NEW shard wins move — the
      // ~1/9 relocation bound that makes HRW the shard-assignment scheme
      // of caches and vector-index fleets (mod-N hashing would move
      // ~8/9 of the corpus). Assignment is pure map-side integer
      // arithmetic (argmax via struct max over the shard sequence, ties
      // to the smallest shard); the gate ledgers per-shard mass before/
      // after and the moved-in count, so the relocation fraction is
      // read straight off the row set.
      def shardOf(n: Int) = expr(
        s"-array_max(transform(sequence(0, ${n - 1}), s -> " +
          "struct((doc_id * (1000003 + s * 17) + s * 1009) % 1000000007 AS h, -s AS ns))).ns")
      val asg = T(s, dir, "documents").select(col("doc_id"),
        shardOf(8).cast("long").as("s8"), shardOf(9).cast("long").as("s9"))
        .localCheckpoint(eager = false)
      val before = asg.groupBy(col("s8").as("shard")).agg(count(lit(1)).as("n_before"))
      val after = asg.groupBy(col("s9").as("shard")).agg(count(lit(1)).as("n_after"))
      val moved = asg.filter(col("s8") =!= col("s9"))
        .groupBy(col("s9").as("shard")).agg(count(lit(1)).as("moved_in"))
      after.join(before, Seq("shard"), "left")
        .join(moved, Seq("shard"), "left")
        .select(col("shard"), coalesce(col("n_before"), lit(0L)).as("n_before"),
          col("n_after"), coalesce(col("moved_in"), lit(0L)).as("moved_in"))
        .orderBy("shard")
    }),
    "q342_pattern_match" -> ((s, dir) => {
      // event-sequence pattern matching (MATCH_RECOGNIZE-lite, the CEP
      // gap in Spark's SQL surface): per user, count occurrences of
      // "view then purchase within the next 2 events, with no error in
      // between" — the conversion-with-clean-path pattern a funnel count
      // (q86) can't express because it needs ORDER and EXCLUSION, not
      // mere presence. One exchange on user_id, one per-user sort, two
      // lead() columns — the pattern is a map-side boolean over the
      // window frame, linear in events.
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      T(s, dir, "events")
        .select(col("user_id"), col("event_type"),
          lead(col("event_type"), 1).over(w).as("n1"),
          lead(col("event_type"), 2).over(w).as("n2"))
        .filter(col("event_type") === "view" &&
          (col("n1") === "purchase" ||
            (col("n1") =!= "error" && col("n2") === "purchase")))
        .groupBy(col("user_id")).agg(count(lit(1)).as("n_matches"))
        .orderBy("user_id")
    }),
    "q343_missing_partitions" -> ((s, dir) => {
      // backfill planning: which calendar days SHOULD exist but don't —
      // the gap detector an orchestrator runs before scheduling catch-up
      // jobs (the reference's Airflow DAG assumes yesterday always
      // landed; this is the check for when it didn't). A day is planted
      // missing (2024-01-11 filtered out); the expected calendar spans
      // min..max day and is generated as ONE sequence explode of a 1-row
      // aggregate (metadata — never a scan), then anti-joined against
      // the observed days (itself an aggregate frame, |days| rows).
      val ev = T(s, dir, "events")
        .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
        .filter(col("day") =!= "2024-01-11")
      val observed = ev.select(col("day")).distinct()
      val bounds = ev.agg(min(col("day").cast("date")).as("lo"),
        max(col("day").cast("date")).as("hi"))
      bounds.select(explode(expr("sequence(lo, hi, interval 1 day)")).as("d"))
        .select(date_format(col("d"), "yyyy-MM-dd").as("day"))
        .join(observed, Seq("day"), "left_anti")
        .orderBy("day")
    }),
    "q344_watermark_sizing" -> ((s, dir) => {
      // watermark sizing from replayed history: per candidate delay
      // (1/10/60 min), how many events would arrive LATE — i.e. with
      // event time below the per-user running max of already-arrived
      // event times minus the delay. Arrival order is synthesized as
      // event time + a deterministic 0–30 min jitter (hash of the id),
      // so out-of-orderness is planted and the oracle replays it
      // arithmetically. One exchange on user_id, one per-user sort in
      // arrival order, a single running-max frame shared by all three
      // candidate delays — the sizing curve costs one pass.
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("arr"), col("event_id"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
      val ev = T(s, dir, "events").select(col("user_id"), col("event_id"),
          unix_micros(col("ts")).as("tsm"))
        .withColumn("arr", col("tsm") +
          (col("event_id") * 2654435761L % 1800000000L))
      val lagged = ev.withColumn("prevmax", max(col("tsm")).over(w))
      import s.implicits._
      val delays = Seq(60L, 600L, 3600L).toDF("delay_s")
      lagged.crossJoin(broadcast(delays))
        .groupBy(col("delay_s"))
        .agg(count(lit(1)).as("n_events"),
          sum(when(col("prevmax").isNotNull &&
            col("tsm") < col("prevmax") - col("delay_s") * 1000000L, 1L)
            .otherwise(0L)).as("n_late"))
        .select(col("delay_s"), col("n_events"), col("n_late"),
          expr("n_late * 10000 div n_events").as("late_bp"))
        .orderBy("delay_s")
    }),
    "q345_prefix_cache" -> ((s, dir) => {
      // KV-cache prefix-sharing estimator (the vLLM/SGLang serving win):
      // at each prefix length N, the fraction of prompts whose first N
      // tokens another prompt already computed — cache_hit_bp =
      // (prompts − distinct prefixes) / prompts. ONE corpus pass: the
      // 3-row N frame broadcasts, prefixes are map-side array slices,
      // and each N's ledger is a count + distinct aggregate. The curve
      // falling with N is the cache-depth budget read.
      import s.implicits._
      val ns = Seq(4, 8, 16).toDF("n_prefix_tokens")
      T(s, dir, "documents")
        .select(expr("filter(split(lower(text), '\\\\s+'), t -> length(t) > 0)").as("tok"))
        .crossJoin(broadcast(ns))
        .select(col("n_prefix_tokens"),
          expr("array_join(slice(tok, 1, n_prefix_tokens), ' ')").as("prefix"))
        .groupBy(col("n_prefix_tokens"))
        .agg(count(lit(1)).as("n_prompts"),
          count_distinct(col("prefix")).as("n_distinct"))
        .select(col("n_prefix_tokens").cast("long").as("n_prefix_tokens"),
          col("n_prompts"), col("n_distinct"),
          expr("(n_prompts - n_distinct) * 10000 div n_prompts").as("cache_hit_bp"))
        .orderBy("n_prefix_tokens")
    }),
    "q346_draft_acceptance" -> ((s, dir) => {
      // n-gram speculative-decoding acceptance rate: how often the
      // corpus-bigram argmax continuation equals the actual next token —
      // the acceptance probability of the cheapest possible draft model,
      // measured on the corpus itself (the go/no-go number BEFORE
      // wiring speculative decoding in). Bigram positions fan out
      // map-side from token arrays (zero joins until scoring); the
      // argmax table is one vocab-keyed min(struct) aggregate — ties
      // break to the smallest continuation, exactly as the oracle's rank
      // window does — and scoring is a single w1-keyed hash join.
      val pairs = T(s, dir, "documents")
        .withColumn("tok", expr("filter(split(lower(text), '\\\\s+'), t -> length(t) > 0)"))
        .select(explode(expr(
          "transform(sequence(1, size(tok) - 1), i -> " +
            "struct(element_at(tok, i) AS w1, element_at(tok, i + 1) AS w2))")).as("p"))
        .select(col("p.w1").as("w1"), col("p.w2").as("w2"))
        .localCheckpoint(eager = false)
      val best = pairs.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c"))
        .groupBy(col("w1"))
        .agg(min(struct((-col("c")).as("nc"), col("w2"))).as("b"))
        .select(col("w1"), col("b.w2").as("draft"))
      pairs.join(best, Seq("w1"))
        .agg(count(lit(1)).as("n_positions"),
          sum(when(col("w2") === col("draft"), 1L).otherwise(0L)).as("n_hits"))
        .select(col("n_positions"), col("n_hits"),
          expr("n_hits * 10000 div n_positions").as("acc_bp"))
    }),
    "q347_retrieval_overlap" -> ((s, dir) => {
      // semantic-cache sizing: how much do different queries' retrieved
      // contexts OVERLAP — query pairs sharing k of their top-5
      // neighbors are the cache hits a result/context cache would serve
      // without re-scoring. Top-5 per query from q45's broadcast-queries
      // scan; the overlap join runs on the |queries|×5 frame (metadata),
      // pair-keyed, never touching the corpus again.
      val emb = T(s, dir, "embeddings")
      val top5 = Similarity.cosineTopK(emb, emb.filter(col("vec_id") < 8),
          "vec_id", "embedding", 5)
        .select(col("query_id"), col("neighbor_id"))
        .localCheckpoint(eager = false)
      top5.select(col("query_id").as("query_a"), col("neighbor_id"))
        .join(top5.select(col("query_id").as("query_b"), col("neighbor_id")),
          Seq("neighbor_id"))
        .filter(col("query_a") < col("query_b"))
        .groupBy(col("query_a"), col("query_b"))
        .agg(count(lit(1)).as("shared"))
        .orderBy("query_a", "query_b")
    }),
    "q348_lsh_cost_plan" -> ((s, dir) =>
      // dedup-join CAPACITY PLANNING from the stored band index: per
      // band, bucket count, the largest bucket, and Σ n(n−1)/2 — the
      // EXACT candidate-pair volume the banded join will generate, read
      // from metadata BEFORE the join runs. This is the number that
      // decides df-caps and shard budgets at 100 TB (a single hot bucket
      // of 10⁵ docs is 5·10⁹ pairs); the whole plan costs one
      // (band, band_hash) aggregate over the already-materialized index,
      // never touching text or signatures. band_hash is injective for
      // 2-row bands (h₁·p + h₂ with h < p), so bucket sizes equal the
      // oracle's string-keyed buckets exactly.
      dedupIndexBands(s, dir)
        .groupBy(col("band"), col("band_hash")).agg(count(lit(1)).as("n"))
        .groupBy(col("band"))
        .agg(count(lit(1)).as("n_buckets"), max(col("n")).as("max_bucket"),
          sum(expr("n * (n - 1) div 2")).as("candidate_pairs"))
        .select(col("band").cast("long").as("band"), col("n_buckets"),
          col("max_bucket"), col("candidate_pairs"))
        .orderBy("band")),
    "q349_oov_drift" -> ((s, dir) => {
      // tokenizer drift monitoring: the OOV rate of each NEW source under
      // a vocabulary frozen on the OLD corpus (top-100 tokens of sources
      // 0–9) — the maintenance signal that says when a tokenizer trained
      // on last year's crawl stops fitting this year's (rising OOV =
      // rising fertility = wasted context). The frozen vocabulary is
      // top-k via the ordered limit (TakeOrdered) and BROADCASTS onto
      // the new half's one token pass; OOV share in exact basis points.
      val docs = T(s, dir, "documents")
        .withColumn("src_n", expr("CAST(substring(source, 4) AS INT)"))
      def toks(df: DataFrame) = df.select(col("source"),
        explode(expr("filter(split(lower(text), '\\\\s+'), t -> length(t) > 0)")).as("w"))
      val vocab = toks(docs.filter(col("src_n") < 10))
        .groupBy(col("w")).agg(count(lit(1)).as("c"))
        .orderBy(col("c").desc, col("w")).limit(100)
        .select(col("w"), lit(1L).as("__in"))
      toks(docs.filter(col("src_n") >= 10))
        .join(broadcast(vocab), Seq("w"), "left")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("tokens"),
          sum(when(col("__in").isNull, 1L).otherwise(0L)).as("oov"))
        .select(col("source"), col("tokens"), col("oov"),
          expr("oov * 10000 div tokens").as("oov_bp"))
        .orderBy("source")
    }),
    "q350_grouped_rank_normalize" -> ((s, dir) => {
      // per-SOURCE quantile normalization (the grouped twin of q173's
      // global rank transform): each doc's length maps to its percentile
      // within its own source — the feature-engineering step that makes
      // length comparable across sources with wildly different length
      // distributions. Ranks come from [[TwoPhase.prefixSumKeyed]]
      // (value = 1): at 100 TB a single source's rows are corpus-sized,
      // so partitionBy(source) alone would serialize each source onto
      // one task; percentiles in exact basis points from the broadcast
      // per-source counts.
      val base = T(s, dir, "documents")
        .select(col("doc_id"), col("source"), col("n_chars"))
      val ranked = TwoPhase.prefixSumKeyed(base, "source", col("n_chars"),
        Seq(col("n_chars"), col("doc_id")), lit(1L), "rank")
      val counts = base.groupBy(col("source")).agg(count(lit(1)).as("cnt"))
      // greatest(cnt-1, 1): a single-doc source yields pct_bp = 0 instead
      // of a division by zero (Spark div → NULL, DuckDB // → error — a
      // cross-engine divergence); the guard is mirrored in the oracle.
      ranked.join(broadcast(counts), Seq("source"))
        .select(col("doc_id"), col("source"), col("n_chars"),
          expr("(rank - 1) * 10000 div greatest(cnt - 1, 1)").as("pct_bp"))
        .orderBy("doc_id")
    }),
    "q351_quality_survivorship" -> ((s, dir) => {
      // quality-aware near-dup survivorship: per component of the SHARED
      // materialized MinHash index, keep the member with the highest
      // quality score (ties to the smallest id) — what production dedup
      // actually ships (q105's min-id representative is the arbitrary
      // baseline; keeping the BEST copy is the point of having found the
      // cluster). One id-keyed join of the stored component map against
      // the expression-native quality scores, then a single
      // max(struct(quality, −id)) aggregate per component — no window,
      // no re-derivation of the pair graph.
      val (_, components) = dedupIndex(s, dir)
      val quality = T(s, dir, "documents").select(col("doc_id").as("node"),
        TextAnalysis.qualityScore(col("text")).as("quality"))
      components.join(quality, Seq("node"))
        .groupBy(col("component"))
        .agg(count(lit(1)).as("n_members"),
          max(struct(col("quality"), (-col("node")).as("negid"))).as("b"))
        .select(col("component"), (-col("b.negid")).as("keeper_id"),
          col("n_members"), col("b.quality").as("kept_quality"))
        .orderBy("component")
    }),
    "q352_dup_weighting" -> ((s, dir) => {
      // duplicate-aware SAMPLING WEIGHTS from the shared component index:
      // instead of dropping near-dup members (q105), weight each member
      // 1/cluster_size so every cluster contributes one document's worth
      // of training mass — the down-weighting alternative production
      // pipelines ship when provenance rules forbid deletion. Weights in
      // exact basis points (10000 div size; the ≤size-1 quantization loss
      // per cluster is the documented price of integer determinism); the
      // per-source ledger (raw docs vs effective mass) is what the
      // mixture planner (q261) consumes. Cost: the component map and its
      // size table are cluster-sized — both broadcast back onto the one
      // corpus-sized scan; no corpus shuffle at all before the final
      // |sources|-row aggregate.
      val (_, components) = dedupIndex(s, dir)
      val sizes = components.groupBy(col("component"))
        .agg(count(lit(1)).as("csize"))
      val weighted = T(s, dir, "documents").select(col("doc_id"), col("source"))
        .join(broadcast(components.withColumnRenamed("node", "doc_id")),
          Seq("doc_id"), "left")
        .join(broadcast(sizes), Seq("component"), "left")
        .withColumn("w_bp", coalesce(expr("10000 div csize"), lit(10000L)))
      weighted.groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("w_bp")).as("eff_bp"))
        .select(col("source"), col("n_docs"), col("eff_bp"),
          expr("eff_bp div n_docs").as("avg_w_bp"))
        .orderBy("source")
    }),
    "q353_shard_checksum" -> ((s, dir) => {
      // anti-entropy shard comparison (Dynamo/Cassandra Merkle-lite): two
      // replicas of a table are compared by ORDER-INVARIANT per-shard
      // checksums — sum of per-row Karp–Rabin fingerprints — so divergence
      // localizes to dirty shards at O(|shards|) wire cost instead of a
      // corpus-sized row join (q123's CDC diff is what you run AFTER this
      // says which shards to bother with). Per-row values stay < 2^31
      // (the q53 fingerprint ring), so a 64-bit sum is exact for < 2^32
      // rows/shard in BOTH engines (DuckDB would widen to HUGEINT, Spark
      // would wrap — staying under the ring bound sidesteps both); a
      // 100 TB deployment shards by file/partition id the same way. The
      // "replica B" here is a deterministic in-flight perturbation (docs
      // with id % 97 == 0 gain a trailing space) — the gate proves the
      // checksum catches exactly those shards.
      val base = T(s, dir, "documents").select(col("doc_id"), col("text"))
      def sums(df: DataFrame, out: String): DataFrame = df
        .withColumn("fp", graft.functions.RollingHash(col("text")))
        .withColumn("rowh", expr("(fp * 31 + doc_id) % 1000000007"))
        .groupBy(expr("doc_id % 16").as("shard"))
        .agg(count(lit(1)).as(s"n_$out"), sum(col("rowh")).as(s"sum_$out"))
      val b = base.withColumn("text",
        when(col("doc_id") % 97 === 0, concat(col("text"), lit(" ")))
          .otherwise(col("text")))
      sums(base, "a").join(broadcast(sums(b, "b")), Seq("shard"))
        .select(col("shard").cast("long").as("shard"), col("n_a").as("n_rows"),
          col("sum_a"), col("sum_b"),
          (col("sum_a") =!= col("sum_b")).as("dirty"))
        .orderBy("shard")
    }),
    "q354_bitext_margin" -> ((s, dir) => {
      // margin-based bitext mining (Artetxe & Schwenk 2019, the CCMatrix
      // pair-scoring rule): a forward neighbor's raw cosine is normalized
      // by the mean cosine of BOTH endpoints' k-NN neighborhoods —
      // margin = cos(x,y) / ((avg_kNN(x) + avg_kNN(y)) / 2) — which
      // demotes "hub" vectors that are near everything. Pools split by
      // vec_id parity (the two "languages"); the backward penalty is
      // computed ONLY for the ≤ |queries|·k forward candidates (broadcast
      // back over one X-pool scan) — the shortlist bound that makes the
      // rule affordable at corpus scale, where both directions would run
      // on the IVF index (q58) instead of the exact scan. All ranking
      // arithmetic on exact bp-quantized cosines; the one float op is a
      // single IEEE division of exact integers, bit-identical cross-engine.
      val emb = T(s, dir, "embeddings")
      val xs = emb.filter(col("vec_id") % 2 === 0)
      val ys = emb.filter(col("vec_id") % 2 === 1)
      val fwd = Similarity.cosineTopK(ys, xs.filter(col("vec_id") < 16),
          "vec_id", "embedding", 4)
        .withColumn("cos_bp", expr("CAST(round(cosine * 10000) AS BIGINT)"))
      val px = fwd.groupBy(col("query_id")).agg(sum(col("cos_bp")).as("px_bp"))
      val cands = emb.join(
        broadcast(fwd.select(col("neighbor_id").as("vec_id")).distinct()),
        Seq("vec_id"))
      val py = Similarity.cosineTopK(xs, cands, "vec_id", "embedding", 4)
        .withColumn("cos_bp", expr("CAST(round(cosine * 10000) AS BIGINT)"))
        .groupBy(col("query_id")).agg(sum(col("cos_bp")).as("py_bp"))
        .withColumnRenamed("query_id", "neighbor_id")
      fwd.join(broadcast(px), Seq("query_id"))
        .join(broadcast(py), Seq("neighbor_id"))
        .select(col("query_id"), col("neighbor_id"), col("cos_bp"),
          col("px_bp"), col("py_bp"),
          Num.roundz((col("cos_bp") * 8).cast("double") /
            (col("px_bp") + col("py_bp")).cast("double"), 4).as("margin"))
        .orderBy(col("query_id"), col("margin").desc, col("neighbor_id"))
    }),
    "q355_bucketed_batching" -> ((s, dir) => {
      // length-bucketed batch ASSEMBLY (the plan q340's waste ledger only
      // measures): docs tier to a power-of-two length bucket, order by
      // (length, id) within the tier, and greedy-pack contiguously into
      // fixed 2048-token batches — batch id = exclusive prefix sum of
      // token counts div budget. The prefix sum is the keyed two-phase
      // form ([[TwoPhase.prefixSumKeyed]]): at 100 TB a single tier is
      // corpus-sized, so a partitionBy(bucket) window would serialize
      // each tier onto one task; here each tier's offsets are a ≤32-row
      // broadcast and the scan stays fully parallel.
      val toks = T(s, dir, "documents")
        .select(col("doc_id"),
          TextAnalysis.tokenCount(col("text")).cast("long").as("n"))
        .withColumn("bucket", expr(
          "CASE WHEN n <= 64 THEN '64' WHEN n <= 128 THEN '128' " +
            "WHEN n <= 256 THEN '256' WHEN n <= 512 THEN '512' " +
            "ELSE '1024' END"))
      TwoPhase.prefixSumKeyed(toks, "bucket", col("n"),
          Seq(col("n"), col("doc_id")), col("n"), "cum")
        .withColumn("batch", expr("(cum - n) div 2048"))
        .groupBy(col("bucket"), col("batch"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n")).as("tokens"))
        .orderBy("bucket", "batch")
    }),
    "q356_bottomk_sample" -> ((s, dir) => {
      // per-source CONSISTENT bottom-k sample (minwise/bottom-k sketch):
      // priority = MINSTD Lehmer hash of the id, keep the 8 smallest per
      // source. Unlike rand()-based sampling the membership is a pure
      // function of the id — re-runs, backfills, and shard-local samples
      // agree, and two sources' samples union-merge into the corpus
      // sample (the bottom-k mergeability that makes this THE distributed
      // sampling primitive). Ranking is the two-phase per-partition
      // k-heap ([[Similarity.topKPerQuery]]): a corpus-sized source never
      // serializes under a partitionBy window. The source→long key map is
      // a |sources|-row frame; its hash injectivity is asserted by a
      // metadata-sized action rather than assumed.
      val docs = T(s, dir, "documents")
      val srcIds = docs.select(col("source")).distinct()
        .withColumn("sid", graft.functions.RollingHash(col("source")))
      val chk = srcIds.agg(countDistinct(col("sid")).as("a"),
        count(lit(1)).as("b")).first()
      require(chk.getLong(0) == chk.getLong(1),
        "q356: source-key hash collision — widen the key")
      val scored = docs.join(broadcast(srcIds), Seq("source"))
        .select(col("sid").as("query_id"), col("doc_id").as("neighbor_id"),
          negate(((col("doc_id") * lit(48271L)) % lit(2147483647L))
            .cast("double")).as("cosine"))
      Similarity.topKPerQuery(scored, 8)
        .join(broadcast(srcIds), col("query_id") === col("sid"))
        .select(col("source"), col("neighbor_id").as("doc_id"),
          negate(col("cosine")).cast("long").as("priority"), col("rn"))
        .orderBy("source", "rn")
    }),
    "q357_heaps_law" -> ((s, dir) => {
      // vocabulary-growth (Heaps' law) curve: distinct bigram types vs
      // corpus prefix size at 4 doc-count checkpoints. The trick that
      // makes "distinct types in every prefix" one pass instead of 4:
      // each type's FIRST-occurrence doc id is a single min() aggregate,
      // and vocab(N) = |{types: first < N}| — the token-sized frame is
      // scanned once, the ≤4-row checkpoint frame broadcasts onto the
      // type-sized and doc-sized summaries only. (The synthetic corpus
      // saturates its tiny vocab early — flat curve, exact values; real
      // crawls give the V ∝ n^β sub-linear climb.)
      val docs = T(s, dir, "documents")
      val cps = docs.agg(count(lit(1)).as("dd"))
        .crossJoin(s.range(1, 5).toDF("i"))
        .select(col("i"), expr("dd * i div 4").as("n_docs"))
      val tok = docs.withColumn("__w", split(lower(col("text")), "\\s+"))
        .filter(size(col("__w")) >= 2)
        .select(col("doc_id"), explode(transform(
          sequence(lit(1), size(col("__w")) - 1),
          j => concat(element_at(col("__w"), j), lit(" "),
            element_at(col("__w"), j + 1)))).as("bg"))
      val vocab = tok.groupBy(col("bg")).agg(min(col("doc_id")).as("fd"))
        .join(broadcast(cps), col("fd") < col("n_docs"))
        .groupBy(col("i"), col("n_docs")).agg(count(lit(1)).as("vocab"))
      val toks = tok.groupBy(col("doc_id")).agg(count(lit(1)).as("nt"))
        .join(broadcast(cps), col("doc_id") < col("n_docs"))
        .groupBy(col("i"), col("n_docs")).agg(sum(col("nt")).as("tokens"))
      vocab.join(toks, Seq("i", "n_docs"))
        .select(col("i"), col("n_docs"), col("tokens"), col("vocab"),
          expr("vocab * 10000 div tokens").as("types_per_10k"))
        .orderBy("i")
    }),
    "q358_neighborhood_jaccard" -> ((s, dir) => {
      // link prediction by NEIGHBORHOOD JACCARD for a focal seed batch:
      // score each non-neighbor candidate by |N(s)∩N(c)| / |N(s)∪N(c)|
      // in exact basis points — the normalized index that q226's
      // Resource Allocation (degree-weighted, batch top-k mining over a
      // time window) is not: Jaccard discounts candidates that are near
      // EVERYTHING, the serving-side "related items" rule. Edges come
      // from the SHARED materialized full-history index; cost is q324's
      // focal bound (|seeds|·deg·deg wedge rows, never all-pairs), the
      // union size folds from the two broadcast degree lookups
      // (|N∪| = d_s + d_c − common), and the existing-edge exclusion
      // anti join shares the (seed, cand) exchange with the common-
      // neighbor count.
      val edges = copurchaseEdges(s, dir)
      val deg = copurchaseDegrees(s, dir)
        .select(col("node").as("src"), col("degree").as("d"))
      val paths = edges.filter(col("src") < 8)
        .select(col("src").as("seed"), col("dst").as("z"))
        .join(edges.select(col("src").as("z"), col("dst").as("cand")), Seq("z"))
        .filter(col("cand") =!= col("seed"))
      paths
        .join(edges.select(col("src").as("seed"), col("dst").as("cand")),
          Seq("seed", "cand"), "left_anti")
        .groupBy(col("seed"), col("cand"))
        .agg(count(lit(1)).as("common_n"))
        .join(broadcast(deg.select(col("src").as("seed"), col("d").as("ds"))),
          Seq("seed"))
        .join(broadcast(deg.select(col("src").as("cand"), col("d").as("dc"))),
          Seq("cand"))
        .select(col("seed"), col("cand").as("candidate"), col("common_n"),
          expr("(common_n * 10000) div (ds + dc - common_n)").as("jaccard_bp"))
        .orderBy(col("seed"), col("jaccard_bp").desc, col("common_n").desc,
          col("candidate"))
    }),
    "q359_ab_ztest" -> ((s, dir) => {
      // two-proportion z-test per metric: arms by user parity (the
      // deterministic stand-in for an assignment table), success = event
      // value over threshold. Counts stay exact longs through one
      // map-side-combined aggregate — the whole experiment readout is
      // |metrics| rows, and the only float work is the final pooled-z
      // expression on those rows (identical op order in both engines).
      // The production shape at 100 TB: one scan, one hash aggregate,
      // no per-arm passes.
      val g = T(s, dir, "events")
        .select(col("event_type"), (col("user_id") % 2).as("arm"),
          when(col("value") > 50, 1L).otherwise(0L).as("sflag"))
        .groupBy(col("event_type"))
        .agg(sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n0"),
          sum(when(col("arm") === 0, col("sflag")).otherwise(0L)).as("c0"),
          sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n1"),
          sum(when(col("arm") === 1, col("sflag")).otherwise(0L)).as("c1"))
      g.select(col("event_type"), col("n0"), col("c0"), col("n1"), col("c1"),
          Num.roundz(expr(
            "(CAST(c1 AS DOUBLE)/n1 - CAST(c0 AS DOUBLE)/n0) / " +
              "sqrt((CAST(c0+c1 AS DOUBLE)/(n0+n1)) * " +
              "(CAST(1 AS DOUBLE) - CAST(c0+c1 AS DOUBLE)/(n0+n1)) * " +
              "(CAST(1 AS DOUBLE)/n0 + CAST(1 AS DOUBLE)/n1))"), 4).as("z"))
        .withColumn("significant", abs(col("z")) > 1.96)
        .orderBy("event_type")
    }),
    "q360_wilson_rank" -> ((s, dir) =>
      // "how not to sort by average rating": rank parts by return rate
      // using the Wilson score LOWER bound (z = 1.96) instead of the
      // naive proportion — a 1/1 returner no longer outranks a 17/30.
      // One hash aggregate to |parts| rows of exact integer counts; the
      // bound is a fixed float expression on that metadata frame and the
      // top-20 is a TakeOrdered heap (ordered on the ROUNDED bound so
      // cross-engine ordering can never hinge on a last-ulp difference).
      T(s, dir, "lineitem")
        .groupBy(col("l_partkey"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("l_returnflag") === "R", 1L).otherwise(0L)).as("pos"))
        .select(col("l_partkey"), col("n"), col("pos"),
          expr("pos * 10000 div n").as("naive_bp"),
          Num.roundz(expr(
            "(CAST(pos AS DOUBLE)/n + CAST(1.9208 AS DOUBLE)/n - " +
              "CAST(1.96 AS DOUBLE)*sqrt((CAST(pos AS DOUBLE)/n*" +
              "(CAST(1 AS DOUBLE)-CAST(pos AS DOUBLE)/n) + " +
              "CAST(0.9604 AS DOUBLE)/n)/n)) / " +
              "(CAST(1 AS DOUBLE) + CAST(3.8416 AS DOUBLE)/n)"), 4)
            .as("wilson_lb"))
        .orderBy(col("wilson_lb").desc, col("l_partkey"))
        .limit(20)),
    "q361_ks_time_drift" -> ((s, dir) => {
      // TEMPORAL drift per metric: two-sample Kolmogorov–Smirnov between
      // the deployment's early and late halves (cut at the exact
      // epoch-microsecond midpoint), D = max_v |F_early(v)−F_late(v)|.
      // Completes the KS triptych on a third axis: q207 compares
      // experiment ARMS, q221 compares each SEGMENT against the rest —
      // this is the did-the-world-change-since-launch monitor. Scale
      // shape as q207: after the (type, cents) hash aggregate the frame
      // is bounded by the VALUE DOMAIN (the cents discipline), not row
      // count — the CDF window runs over that aggregated frame, and the
      // sup statistic is exact integer cross-multiplication
      // |c0·n1 − c1·n0| (n0·n1 ≲ 2⁶³ up to ~3·10⁹ rows/side; beyond that
      // the same expression runs in Decimal128).
      import org.apache.spark.sql.expressions.Window
      val ev = T(s, dir, "events")
        .filter(col("value").isNotNull)
        .select(col("event_type"), unix_micros(col("ts")).as("us"),
          Num.roundz(col("value") * 100, 0).cast("long").as("cents"))
      val mid = ev.agg(expr("(min(us) + max(us)) div 2").as("mid"))
      val g = ev.crossJoin(broadcast(mid))
        .select(col("event_type"), col("cents"),
          when(col("us") <= col("mid"), 0).otherwise(1).as("arm"))
        .groupBy(col("event_type"), col("cents"))
        .agg(sum(when(col("arm") === 0, 1L).otherwise(0L)).as("d0"),
          sum(when(col("arm") === 1, 1L).otherwise(0L)).as("d1"))
      val w = Window.partitionBy(col("event_type")).orderBy(col("cents"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val tw = Window.partitionBy(col("event_type"))
      g.withColumn("c0", sum(col("d0")).over(w))
        .withColumn("c1", sum(col("d1")).over(w))
        .withColumn("tn0", sum(col("d0")).over(tw))
        .withColumn("tn1", sum(col("d1")).over(tw))
        .groupBy(col("event_type"))
        .agg(max(col("tn0")).as("n0"), max(col("tn1")).as("n1"),
          max(abs(col("c0") * col("tn1") - col("c1") * col("tn0"))).as("d_num"))
        .select(col("event_type"), col("n0"), col("n1"), col("d_num"),
          Num.roundz(col("d_num").cast("double") /
            (col("n0") * col("n1")).cast("double"), 6).as("ks"))
        .orderBy("event_type")
    }),
    "q362_conformal_bound" -> ((s, dir) => {
      // split-conformal interval width per group: the k-th smallest
      // absolute residual with k = ⌈0.9·(n+1)⌉ (capped at n) — the
      // distribution-free 90% bound conformal prediction ships. The
      // predictor is the group's exact integer mean (sum div n); the
      // order statistic comes from the keyed two-phase rank
      // ([[TwoPhase.prefixSumKeyed]], value = 1): a corpus-sized group
      // never serializes under a rank window, and `rank == k` reads the
      // answer off one row per group.
      val ev = T(s, dir, "events")
        .filter(col("value").isNotNull)
        .select(col("event_type"), col("event_id"),
          Num.roundz(col("value") * 100, 0).cast("long").as("cents"))
      val m = ev.groupBy(col("event_type"))
        .agg(sum(col("cents")).as("sc"), count(lit(1)).as("n"))
        .select(col("event_type"), col("n"), expr("sc div n").as("mean_c"),
          expr("least((9 * (n + 1) + 9) div 10, n)").as("k"))
      val r = ev.join(broadcast(m), Seq("event_type"))
        .withColumn("resid", abs(col("cents") - col("mean_c")))
      TwoPhase.prefixSumKeyed(r, "event_type", col("resid"),
          Seq(col("resid"), col("event_id")), lit(1L), "rk")
        .filter(col("rk") === col("k"))
        .select(col("event_type"), col("n"), col("k"),
          col("resid").as("bound_cents"))
        .orderBy("event_type")
    }),
    "q363_chi_square" -> ((s, dir) => {
      // event_type × ISO-weekday independence: the SCALAR χ² + dof +
      // Cramér's V effect size — is the traffic MIX a function of the day
      // of week? (q210 keeps the per-cell contribution table for a
      // different contingency; this is the one-row monitor a scheduler
      // alerts on, with the effect size that makes χ² comparable across
      // table shapes.) The corpus-sized work is ONE hash aggregate to
      // |types|·7 observed cells; margins, the zero-cell completion (a
      // missing cell still contributes e = r·c/N), and the per-cell term
      // all run on that metadata frame. Per-cell contribution
      // (oN−rc)²/(N·r·c) is computed from exact longs and quantized to
      // micro-units BEFORE the final sum, so the fold is an exact long
      // sum — no float summation-order drift (at gate scale oN < 2⁵³
      // keeps the doubles exact; a 10¹²-row corpus runs the same three
      // ops in Decimal128). isodow = Spark weekday()+1 ≡ DuckDB isodow.
      val docs = T(s, dir, "events")
        .select(col("event_type").as("source"),
          (weekday(col("ts")) + 1).cast("long").as("lang"))
      val o = docs.groupBy(col("source"), col("lang")).agg(count(lit(1)).as("o"))
      val rt = o.groupBy(col("source")).agg(sum(col("o")).as("r"))
      val ct = o.groupBy(col("lang")).agg(sum(col("o")).as("c"))
      val cells = rt.crossJoin(broadcast(ct))
        .join(o, Seq("source", "lang"), "left")
        .withColumn("o0", coalesce(col("o"), lit(0L)))
        .crossJoin(broadcast(docs.agg(count(lit(1)).as("nn"))))
        .withColumn("contrib_micro", expr(
          "CAST(round(CAST(o0 * nn - r * c AS DOUBLE) * CAST(o0 * nn - r * c AS DOUBLE) " +
            "/ (CAST(r AS DOUBLE) * CAST(c AS DOUBLE) * CAST(nn AS DOUBLE)) " +
            "* CAST(1000000 AS DOUBLE)) AS BIGINT)"))
      cells
        .groupBy(col("nn"))
        .agg(countDistinct(col("source")).as("n_rows"),
          countDistinct(col("lang")).as("n_cols"),
          sum(col("contrib_micro")).as("chi2_micro"))
        .select(col("nn").as("n"), col("n_rows"), col("n_cols"),
          expr("(n_rows - 1) * (n_cols - 1)").as("dof"), col("chi2_micro"),
          Num.roundz(expr(
            "sqrt(CAST(chi2_micro AS DOUBLE) / (CAST(1000000 AS DOUBLE) * " +
              "nn * least(n_rows - 1, n_cols - 1)))"), 4).as("cramers_v"))
    }),
    "q364_stationary_dist" -> ((s, dir) => {
      // stationary distribution of the journey Markov chain (q151's
      // matrix) by power iteration — the long-run share of attention each
      // event state absorbs. The q295 division of labor: the only
      // corpus-sized work is the one lead() pass inside
      // [[Relational.transitionMatrix]]; the chain itself is a
      // |states|²-row metadata frame iterated in EXACT scaled-long
      // arithmetic (π·P with probabilities in millionths, floor-div
      // renormalization), so every engine and every partitioning lands on
      // the same vector bit-for-bit.
      val tm = Relational.transitionMatrix(T(s, dir, "events"),
        "user_id", "ts", "event_id", "event_type")
        .select(col("from_type"), col("to_type"), col("cnt"))
      val tot = tm.groupBy(col("from_type")).agg(sum(col("cnt")).as("t"))
      val p = tm.join(broadcast(tot), Seq("from_type"))
        .select(col("from_type"), col("to_type"),
          expr("(cnt * 1000000) div t").as("ps"))
        .localCheckpoint()
      val states = p.select(col("from_type").as("st")).distinct()
      val n = states.count() // metadata action: |event types| rows
      var pi = states.select(col("st"), lit(1000000L / n).as("v"))
      (1 to 6).foreach { _ =>
        pi = p.join(broadcast(pi), col("from_type") === col("st"))
          .groupBy(col("to_type"))
          .agg(sum(col("v") * col("ps")).as("sv"))
          .select(col("to_type").as("st"), expr("sv div 1000000").as("v"))
          .localCheckpoint()
      }
      pi.select(col("st").as("state"), col("v").as("pi_ppm")).orderBy("state")
    }),
    "q365_stickiness" -> ((s, dir) => {
      // DAU/WAU/MAU stickiness — the product-health ratios every
      // engagement dashboard leads with. Each trailing-distinct series is
      // [[Relational.slidingDistinct]] (distinct (day,user) first, then a
      // bounded map-side day fan-out — never a count-distinct range
      // window); the three |days|-row series join broadcast and the
      // ratios are exact basis points.
      val ev = T(s, dir, "events")
      def series(days: Int, name: String): DataFrame =
        Relational.slidingDistinct(ev, "user_id", "ts", windowDays = days)
          .withColumnRenamed("active", name)
      series(1, "dau")
        .join(broadcast(series(7, "wau")), Seq("day"))
        .join(broadcast(series(28, "mau")), Seq("day"))
        .select(col("day"), col("dau"), col("wau"), col("mau"),
          expr("dau * 10000 div wau").as("dw_bp"),
          expr("wau * 10000 div mau").as("wm_bp"))
        .orderBy("day")
    }),
    "q366_l_diversity" -> ((s, dir) => {
      // l-diversity audit (Machanavajjhala 2007) — the axis k-anonymity
      // (q308) cannot see: a large QI group is still unsafe if everyone
      // in it shares the SENSITIVE value. Per (nation, segment) QI group,
      // count DISTINCT balance bands (the sensitive attribute, shifted to
      // a non-negative band so integer division floors identically in
      // both engines); sweep l ∈ {2, 3, 5} and report the exposed share.
      // One map-side-combined aggregate to the |QI|-frame; the sweep is a
      // 3×|QI| metadata cross join — q308's exact scale shape.
      val g = T(s, dir, "customer")
        .groupBy(col("c_nationkey"), col("c_mktsegment"))
        .agg(countDistinct(expr(
          "(CAST(round(c_acctbal * 100, 0) AS BIGINT) + 100000) div 100000"))
          .as("lv"), count(lit(1)).as("cnt"))
      import s.implicits._
      val ls = Seq(2L, 3L, 5L).toDF("l")
      g.crossJoin(broadcast(ls))
        .groupBy(col("l"))
        .agg(count(lit(1)).as("groups_total"),
          sum(when(col("lv") < col("l"), 1L).otherwise(0L)).as("groups_below"),
          sum(when(col("lv") < col("l"), col("cnt")).otherwise(0L)).as("rows_exposed"),
          sum(col("cnt")).as("rows_total"))
        .select(col("l"), col("groups_total"), col("groups_below"),
          col("rows_exposed"),
          expr("rows_exposed * 10000 div rows_total").as("exposed_bp"))
        .orderBy("l")
    }),
    "q367_slo_burn_rate" -> ((s, dir) => {
      // multiwindow error-budget burn (the SRE alerting rule): per day,
      // the error rate over budget (1% SLO) for the 1-day and trailing
      // 7-day windows; page only when BOTH burn — the fast window for
      // speed, the slow one to suppress blips. Corpus work is one hash
      // aggregate to the |days| frame; the trailing window runs over
      // those per-day rows (q80's argument — metadata, never raw events).
      // Burn in exact bp of budget: err·10⁶ div n (= rate/1% in bp).
      import org.apache.spark.sql.expressions.Window
      val d = T(s, dir, "events")
        .groupBy(TextFunctions.dayString(col("ts")).as("day"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("event_type") === "error", 1L).otherwise(0L)).as("err"))
      val w7 = Window.orderBy(col("day")).rowsBetween(-6, 0)
      d.withColumn("n7", sum(col("n")).over(w7))
        .withColumn("err7", sum(col("err")).over(w7))
        .select(col("day"), col("n"), col("err"),
          expr("err * 1000000 div n").as("burn1_bp"),
          expr("err7 * 1000000 div n7").as("burn7_bp"))
        .withColumn("page",
          col("burn1_bp") >= 20000 && col("burn7_bp") >= 15000)
        .orderBy("day")
    }),
    "q368_hll_mergeability" -> ((s, dir) => {
      // the sketch property that makes 100 TB cardinality work AT ALL:
      // DataSketches HLL (Spark's hll_sketch_agg) per-day partial
      // sketches union-merged across days must stay as accurate as one
      // direct pass. The contract is BOUNDED ERROR, not bit-equality — a
      // found (and sf0.1-falsified) subtlety this gate now encodes: in
      // the sparse/LIST regime a direct sketch and a union of partials
      // take different promotion paths to the dense register array, so
      // their estimates can differ slightly even though dense register
      // merging is an associative per-slot max. The gate pins BOTH
      // estimates within ±5% of the oracle-verified exact distinct —
      // i.e. pre-aggregation loses nothing that matters — plus the exact
      // count itself. (At sf0.01 the two estimates happen to coincide;
      // at sf0.1 merged ≠ direct while both stay in bounds.)
      val ev = T(s, dir, "events")
        .select(col("event_type"), col("user_id"), to_date(col("ts")).as("d"))
      val merged = ev.groupBy(col("event_type"), col("d"))
        .agg(hll_sketch_agg(col("user_id")).as("sk"))
        .groupBy(col("event_type"))
        .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est_merged"))
      val direct = ev.groupBy(col("event_type"))
        .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"))).as("est_direct"),
          countDistinct(col("user_id")).as("exact"))
      direct.join(broadcast(merged), Seq("event_type"))
        .select(col("event_type"), col("exact"),
          (abs(col("est_merged") - col("exact")) * 100 <= col("exact") * 5)
            .as("merged_ok"),
          (abs(col("est_direct") - col("exact")) * 100 <= col("exact") * 5)
            .as("direct_ok"))
        .orderBy("event_type")
    }),
    "q369_csv_multiline" -> ((s, dir) => {
      // the CSV ingest edge that breaks naive line-split readers: fields
      // containing QUOTED NEWLINES and ESCAPED QUOTES. The engine writes
      // a field embedding both, then reads its own output back with
      // multiLine parsing — the oracle reconstructs the expected string
      // from the source table, so the gate proves quote/escape/newline
      // fidelity through a full write→read cycle (q115/q63's roundtrip
      // discipline for the messiest text format in production ingest).
      // multiLine forces whole-file parse units (not line-splittable) —
      // the 100 TB note: shard the FILES, not the lines, for this format.
      val safe = dir.replaceAll("[^A-Za-z0-9._-]", "_")
      val out = T(s, dir, "documents")
        .select(col("doc_id"),
          concat(substring(col("text"), 1, 20), lit("\nhe said \""),
            col("source"), lit("\"")).as("field"))
      val tmp = s"$TMP/q369_csv/$safe"
      out.coalesce(1).write.mode("overwrite").option("header", "true").csv(tmp)
      s.read.option("header", "true").option("multiLine", "true")
        .schema(out.schema).csv(tmp)
        .select(col("doc_id"), col("field"),
          length(col("field")).cast("long").as("field_len"))
        .orderBy("doc_id")
    }),
    "q370_png_chunk_walk" -> ((s, dir) => {
      // asset inventory WITHOUT decode: per image, walk the PNG chunk
      // stream (length-prefixed, CRC32 per chunk), validate integrity,
      // and read the IHDR geometry big-endian — the header-only audit
      // that inventories a petabyte of media for ~64 bytes + CRC math per
      // file while decode (q112) inflates every IDAT. Fixtures are real
      // ImageIO encodes (IHDR,IDAT,IEND); docs with id % 101 == 0 get one
      // IDAT payload byte flipped, so the gate also proves the CRC check
      // actually checks (those rows must come back crc_ok = false with
      // the structure still fully parsed).
      import s.implicits._
      val imgs = T(s, dir, "documents").select(col("doc_id"), col("n_chars"))
        .as[(Long, Long)].mapPartitions(_.map { case (id, nc) =>
          val rgb = (((id % 256) << 16) | ((nc % 256) << 8) | 7L).toInt
          val b = Multimodal.synthPng((nc % 16 + 1).toInt, (id % 16 + 1).toInt, rgb)
          if (id % 101 == 0) b(41) = (b(41) ^ 0x01).toByte // inside IDAT data
          (id, b)
        }).toDF("doc_id", "payload")
      Multimodal.pngChunkWalk(imgs, "doc_id")
        .orderBy("doc_id")
    }),
    "q371_mahalanobis" -> ((s, dir) => {
      // MULTIVARIATE anomaly: top-20 events by bivariate Mahalanobis
      // distance over (value cents, hour-of-day) — the correlated-outlier
      // sweep the univariate z-score (q90) and MAD (q147) fences cannot
      // see (a $300 purchase at 3am can be normal on each axis alone).
      // 2×2 algebra needs no matrix library: maha² = (Cyy·dx² − 2Cxy·dx·dy
      // + Cxx·dy²)/det(C) with C the n-scaled central moment matrix. One
      // exact-long moment aggregate (1 row, broadcast back), the score is
      // fixed-op-order double arithmetic on exact inputs (bit-identical
      // cross-engine), ranking on the ROUNDED score, top-20 TakeOrdered.
      val ev = T(s, dir, "events")
        .filter(col("value").isNotNull)
        .select(col("event_id"),
          Num.roundz(col("value") * 100, 0).cast("long").as("x"),
          hour(col("ts")).cast("long").as("y"))
      val m = ev.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("y")).as("sy"), sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"), sum(col("x") * col("y")).as("sxy"))
      ev.crossJoin(broadcast(m))
        .withColumn("cxx", expr("CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx"))
        .withColumn("cyy", expr("CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy"))
        .withColumn("cxy", expr("CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy"))
        .withColumn("dx", expr("CAST(n AS DOUBLE) * x - sx"))
        .withColumn("dy", expr("CAST(n AS DOUBLE) * y - sy"))
        .select(col("event_id"), col("x").as("cents"), col("y").as("hour"),
          Num.roundz(expr(
            "(cyy * dx * dx - 2 * cxy * dx * dy + cxx * dy * dy) / " +
              "(cxx * cyy - cxy * cxy)"), 4).as("maha2"))
        .orderBy(col("maha2").desc, col("event_id"))
        .limit(20)
    }),
    "q372_preference_pairs" -> ((s, dir) => {
      // DPO/RLHF preference-pair construction: per group, pair the
      // highest-quality member (chosen) against the lowest (rejected) and
      // keep pairs whose margin clears a threshold — the
      // data-assembly step behind every preference-tuning run (ties break
      // to the smaller id on both sides, so the pairing is a pure
      // function of the data). One hash aggregate with max/min(struct) —
      // never a rank window (q351's argmax discipline); quality is the
      // expression-native q51 scorer.
      val q = T(s, dir, "documents")
        .select(col("doc_id"), col("source"),
          TextAnalysis.qualityScore(col("text")).as("quality"))
      q.groupBy(col("source"))
        .agg(max(struct(col("quality"), (-col("doc_id")).as("nid"))).as("b"),
          min(struct(col("quality"), col("doc_id").as("pid"))).as("w"),
          count(lit(1)).as("group_n"))
        .select(col("source"), (-col("b.nid")).as("chosen_id"),
          col("w.pid").as("rejected_id"), col("b.quality").as("q_chosen"),
          col("w.quality").as("q_rejected"),
          Num.roundz(col("b.quality") - col("w.quality"), 4).as("margin"),
          col("group_n"))
        .filter(col("margin") >= 0.3)
        .orderBy("source")
    }),
    "q373_source_exclusive_vocab" -> ((s, dir) => {
      // leave-one-out DATA VALUATION on vocabulary: per source, how many
      // token types exist nowhere else — the irreplaceability readout
      // (drop this source and these types vanish from the corpus) that
      // additive metrics (doc/token counts) cannot express. One token
      // pass to the DISTINCT (source, type) frame; the per-type source
      // count and the exclusivity join both run on that vocab-sized
      // frame, never the corpus.
      val st = T(s, dir, "documents")
        .select(col("source"),
          explode(split(lower(col("text")), "\\s+")).as("w"))
        .filter(col("w") =!= "")
        .distinct()
      val perType = st.groupBy(col("w")).agg(count(lit(1)).as("nsrc"))
      val inSrc = st.groupBy(col("source")).agg(count(lit(1)).as("types_in_source"))
      val excl = st.join(perType.filter(col("nsrc") === 1), Seq("w"))
        .groupBy(col("source")).agg(count(lit(1)).as("exclusive_types"))
      inSrc.join(excl, Seq("source"), "left")
        .withColumn("exclusive_types", coalesce(col("exclusive_types"), lit(0L)))
        .crossJoin(broadcast(perType.agg(count(lit(1)).as("corpus_types"))))
        .select(col("source"), col("types_in_source"), col("exclusive_types"),
          col("corpus_types"),
          expr("exclusive_types * 10000 div types_in_source").as("exclusive_bp"))
        .orderBy("source")
    }),
    "q374_isotonic_calibration" -> ((s, dir) => {
      // isotonic (PAV) calibration of the cents→purchase reliability
      // curve (Zadrozny–Elkan 2002), computed DECLARATIVELY via the
      // minimax identity iso_i = max_{j≤i} min_{k≥i} avg(pos over bins
      // j..k) — no sequential pool-adjacent loop, so no driver-side
      // state: the corpus collapses to ≤10 fixed-width bins in one hash
      // aggregate and the whole solve is a ≤10³-row broadcast triple
      // join on that metadata. q211 reports the RAW reliability bins;
      // this is the monotone regression a serving stack actually applies.
      import org.apache.spark.sql.expressions.Window
      val b = T(s, dir, "events")
        .filter(col("value").isNotNull)
        .select((col("event_type") === "purchase").as("label"),
          Num.roundz(col("value") * 100, 0).cast("long").as("cents"))
        .groupBy(expr("least(greatest(cents, 0) * 10 div 35000, 9)")
          .cast("long").as("bin"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("label"), 1L).otherwise(0L)).as("pos"))
      val w = Window.orderBy(col("bin"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val idx = b.withColumn("rn", row_number().over(Window.orderBy(col("bin"))))
        .withColumn("cn", sum(col("n")).over(w))
        .withColumn("cp", sum(col("pos")).over(w))
      val jf = idx.select(col("rn").as("jr"),
        (col("cn") - col("n")).as("n0"), (col("cp") - col("pos")).as("p0"))
      val kf = idx.select(col("rn").as("kr"), col("cn").as("cnk"), col("cp").as("cpk"))
      val pairs = jf.crossJoin(broadcast(kf)).filter(col("jr") <= col("kr"))
        .select(col("jr"), col("kr"),
          expr("CAST(cpk - p0 AS DOUBLE) / CAST(cnk - n0 AS DOUBLE)").as("a"))
      idx.select(col("rn").as("ir"), col("bin"), col("n"), col("pos"))
        .join(broadcast(pairs),
          col("jr") <= col("ir") && col("ir") <= col("kr"))
        .groupBy(col("ir"), col("bin"), col("n"), col("pos"), col("jr"))
        .agg(min(col("a")).as("mn"))
        .groupBy(col("ir"), col("bin"), col("n"), col("pos"))
        .agg(max(col("mn")).as("iso"))
        .select(col("bin"), col("n"), col("pos"),
          expr("pos * 10000 div n").as("raw_bp"),
          expr("CAST(round(iso * 10000) AS BIGINT)").as("iso_bp"))
        .orderBy("bin")
    }),
    "q375_jackknife_ratio" -> ((s, dir) => {
      // delete-one-DAY jackknife standard error of a ratio metric
      // (purchases per view) — the experiment-analysis variance for
      // ratios, where per-user averaging is wrong and bootstrap needs
      // randomness; delete-1 over day blocks is fully deterministic
      // (Quenouille/Tukey). One hash aggregate to the |days| frame; each
      // leave-one-out ratio quantizes to exact micro-units BEFORE the
      // Σq/Σq² fold, so the variance is exact integer arithmetic and the
      // one float sqrt runs on a 1-row frame.
      val d = T(s, dir, "events")
        .groupBy(TextFunctions.dayString(col("ts")).as("day"))
        .agg(sum(when(col("event_type") === "view", 1L).otherwise(0L)).as("v"),
          sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("p"))
      val tot = d.agg(count(lit(1)).as("n"), sum(col("v")).as("vt"),
        sum(col("p")).as("pt"))
      d.crossJoin(broadcast(tot))
        .withColumn("q", expr(
          "CAST(round(CAST(pt - p AS DOUBLE) / CAST(vt - v AS DOUBLE) * 1000000) AS BIGINT)"))
        .groupBy(col("n"), col("vt"), col("pt"))
        .agg(sum(col("q")).as("sq"), sum(col("q") * col("q")).as("sq2"))
        .select(col("n").as("n_days"), col("vt").as("views"),
          col("pt").as("purchases"),
          Num.roundz(expr("CAST(pt AS DOUBLE) / CAST(vt AS DOUBLE)"), 6).as("ratio"),
          Num.roundz(expr(
            "sqrt(CAST(n - 1 AS DOUBLE) / n * " +
              "(CAST(sq2 AS DOUBLE) - CAST(sq AS DOUBLE) * sq / n)) / CAST(1000000 AS DOUBLE)"), 6)
            .as("jk_se"))
    }),
    "q376_erasure_audit" -> ((s, dir) => {
      // right-to-be-forgotten PROPAGATION audit: after tombstoned users
      // (id % 37 = 0) are deleted from the base table, every user-keyed
      // derived artifact must carry zero tombstone references — and a
      // STALE artifact (materialized before the deletion, the real-world
      // failure mode) must be caught. q289 deletes from one vector index;
      // this is the fleet-wide sweep a GDPR pipeline runs across ALL
      // derivations. Each check is one aggregate + a broadcast semi
      // (tombstone set is id-list-sized); the planted stale artifact must
      // surface refs > 0 with clean = false.
      val ev = T(s, dir, "events")
      val tomb = ev.select(col("user_id")).distinct()
        .filter(col("user_id") % 37 === 0)
      // user_id is non-null in the fixture, but the oracle's NOT IN drops
      // NULL user_id rows whenever the tombstone set is non-empty while
      // left_anti keeps them — filter explicitly so both sides agree under
      // a nullable schema (same defensive guard as q379/q389).
      val live = ev.filter(col("user_id").isNotNull)
        .join(broadcast(tomb), Seq("user_id"), "left_anti")
      def audit(name: String, artifact: DataFrame): DataFrame = artifact
        .join(broadcast(tomb), Seq("user_id"), "left_semi")
        .agg(count(lit(1)).as("tombstoned_refs"))
        .crossJoin(artifact.agg(count(lit(1)).as("n_rows")))
        .select(lit(name).as("artifact"), col("n_rows"), col("tombstoned_refs"),
          (col("tombstoned_refs") === 0).as("clean"))
      val sessions = live.groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_events"))
      val latest = live.groupBy(col("user_id"))
        .agg(max(col("ts")).as("last_ts"))
      val staleTop = ev.groupBy(col("user_id")) // pre-deletion materialization
        .agg(count(lit(1)).as("n_events"))
      audit("sessions_live", sessions)
        .unionByName(audit("latest_live", latest))
        .unionByName(audit("top_users_stale", staleTop))
        .orderBy("artifact")
    }),
    "q377_epoch_shuffle" -> ((s, dir) => {
      // DETERMINISTIC dataloader shuffling: epoch e's order is the global
      // rank under a seeded multiplicative hash of the id — a pure
      // function of (id, epoch), so re-runs agree, any worker can
      // reconstruct its slice, and resuming mid-epoch means reading batch
      // b's rank range, not replaying the stream (what rand()-shuffles
      // can never give you). Rank via the two-phase global rank (no
      // single-partition sort of the corpus); batches are fixed 64-doc
      // slices; the gate pins the first 4 batches of two epochs with
      // order-invariant id sums — different epochs, different batches,
      // same determinism.
      val docs = T(s, dir, "documents").select(col("doc_id"))
      def epoch(e: Int, a: Long): DataFrame = {
        val keyed = docs.withColumn("k",
          (col("doc_id") * lit(a)) % lit(2147483647L))
        val (ranked, _) = TwoPhase.globalRank(keyed, col("k"),
          Seq(col("k"), col("doc_id")), "r")
        ranked.withColumn("batch", expr("(r - 1) div 64"))
          .filter(col("batch") < 4)
          .groupBy(col("batch"))
          .agg(count(lit(1)).as("n_docs"), sum(col("doc_id")).as("id_sum"))
          .withColumn("epoch", lit(e.toLong))
      }
      epoch(1, 48271L).unionByName(epoch(2, 16807L))
        .select(col("epoch"), col("batch"), col("n_docs"), col("id_sum"))
        .orderBy("epoch", "batch")
    }),
    "q378_schema_compat" -> ((s, dir) => {
      // schema-registry compatibility gate: two ingest batches land with
      // drifted schemas; the ledger classifies every field (added /
      // dropped / type_narrowed / unchanged) and rules on READ
      // compatibility (nullable adds pass; drops and narrowing break
      // old readers) — the check that runs BEFORE q118's mergeSchema
      // union ever gets to. The schemas are read back from the written
      // parquet FOOTERS (metadata I/O only — no data scan at any size);
      // the ledger itself is |fields| rows built from that metadata.
      val safe = dir.replaceAll("[^A-Za-z0-9._-]", "_")
      val docs = T(s, dir, "documents")
      val pa = s"$TMP/q378_schema/$safe/a"
      val pb = s"$TMP/q378_schema/$safe/b"
      docs.select(col("doc_id"), col("source"), col("n_chars"))
        .limit(10).write.mode("overwrite").parquet(pa)
      docs.select(col("doc_id"), col("n_chars").cast("int").as("n_chars"),
          col("lang"))
        .limit(10).write.mode("overwrite").parquet(pb)
      val oldS = s.read.parquet(pa).schema
      val newS = s.read.parquet(pb).schema
      val oldM = oldS.fields.map(f => f.name -> f.dataType.simpleString).toMap
      val newM = newS.fields.map(f => f.name -> f.dataType.simpleString).toMap
      import s.implicits._
      (oldM.keySet ++ newM.keySet).toSeq.sorted.map { f =>
        val (o, n) = (oldM.get(f), newM.get(f))
        val change = (o, n) match {
          case (Some(a), Some(b)) if a == b => "unchanged"
          case (Some("bigint"), Some("int")) => "type_narrowed"
          case (Some("int"), Some("bigint")) => "type_widened"
          case (Some(_), Some(_)) => "type_changed"
          case (None, Some(_)) => "added"
          case (Some(_), None) => "dropped"
        }
        val compat = change == "unchanged" || change == "added" ||
          change == "type_widened"
        (f, o.isDefined, n.isDefined, o.orNull, n.orNull, change, compat)
      }.toDF("field", "in_old", "in_new", "old_type", "new_type",
        "change", "read_compatible")
        .orderBy("field")
    }),
    "q379_pseudonymize" -> ((s, dir) => {
      // keyed PSEUDONYMIZATION with a referential-integrity proof: each
      // user id maps to a token by a peppered deterministic hash — the
      // release transform that keeps JOINS working (same user, same
      // token, across every table and every run) while severing the raw
      // id, which q72's in-text scrubbing cannot do. The gate: per-token
      // event counts (the analytics survive the transform) plus an
      // injectivity bit (exactly one raw id behind each token — a
      // collision would silently merge two users' histories). Map-side
      // expression hash, one aggregate; no rainbow-table reversal without
      // the pepper.
      val ev = T(s, dir, "events").filter(col("user_id").isNotNull)
        .withColumn("token", graft.functions.RollingHash(
          concat(lit("pepper-v1:"), col("user_id").cast("string"))))
      ev.groupBy(col("token"))
        .agg(count(lit(1)).as("n_events"),
          countDistinct(col("user_id")).as("raw_ids"))
        .select(col("token"), col("n_events"),
          (col("raw_ids") === 1).as("injective"))
        .orderBy("token")
    }),
    "q380_embedding_drift" -> ((s, dir) => {
      // embedding-BATCH drift monitor: per projected dimension (q295's
      // 16-dim stride), compare the reference half (even ids) against the
      // new half (odd ids) — the did-the-encoder-change check a vector
      // pipeline runs before mixing index generations (a silently
      // re-normalized or re-trained encoder shifts means/scales long
      // before recall collapses). Location gap as the EXACT
      // cross-multiplied mean difference |Σa·n_b − Σb·n_a| (q361's
      // trick — no float summation anywhere); scale ratio from exact
      // Σ|m| folds with one final rounded division. One scan, one
      // 16-row aggregate.
      val proj = T(s, dir, "embeddings")
        .select((col("vec_id") % 2).as("side"), posexplode(expr(
          "transform(sequence(0, 15), k -> CAST(round(CAST(element_at(embedding, k * 4 + 1) AS DOUBLE) * 1000000) AS BIGINT))"))
          .as(Seq("dim", "m")))
      proj.groupBy(col("dim").cast("long").as("dim"))
        .agg(sum(when(col("side") === 0, 1L).otherwise(0L)).as("n_a"),
          sum(when(col("side") === 1, 1L).otherwise(0L)).as("n_b"),
          sum(when(col("side") === 0, col("m")).otherwise(0L)).as("sa"),
          sum(when(col("side") === 1, col("m")).otherwise(0L)).as("sb"),
          sum(when(col("side") === 0, abs(col("m"))).otherwise(0L)).as("aa"),
          sum(when(col("side") === 1, abs(col("m"))).otherwise(0L)).as("ab"))
        .select(col("dim"), col("n_a"), col("n_b"),
          abs(col("sa") * col("n_b") - col("sb") * col("n_a")).as("mean_gap_x"),
          col("aa"), col("ab"),
          Num.roundz(expr(
            "CAST(ab AS DOUBLE) * n_a / (CAST(aa AS DOUBLE) * n_b) * 10000"), 0)
            .cast("long").as("scale_ratio_bp"))
        .orderBy("dim")
    }),
    "q381_join_ivm" -> ((s, dir) => {
      // incremental JOIN-view maintenance: the standing orders⋈customer
      // view absorbs deltas on BOTH sides via the delta-join algebra
      // ΔV = ΔO⋈C ∪ O⋈ΔC ∪ ΔO⋈ΔC (Blakeley 1986) — q111 maintains an
      // AGGREGATE incrementally; this is the join half every lakehouse
      // materialized view needs. The oracle recomputes the full join from
      // scratch, so the green row IS the incremental ≡ recompute proof
      // (q265's discipline). At 100 TB the deltas are batch-sized, so
      // every term shuffles O(|Δ|), never the standing view.
      val o = T(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"),
        Num.roundz(col("o_totalprice") * 100, 0).cast("long").as("cents"),
        col("o_orderdate"))
      val c = T(s, dir, "customer").select(col("c_custkey"), col("c_nationkey"))
      val cut = lit("1999-01-01").cast("date")
      val oOld = o.filter(col("o_orderdate") < cut)
      val dO = o.filter(col("o_orderdate") >= cut)
      val cOld = c.filter(col("c_custkey") % 11 =!= 0)
      val dC = c.filter(col("c_custkey") % 11 === 0)
      def j(l: DataFrame, r: DataFrame): DataFrame =
        l.join(r, col("o_custkey") === col("c_custkey"))
          .select(col("c_nationkey"), col("cents"))
      j(oOld, cOld) // the standing view
        .unionByName(j(dO, cOld)) // ΔO ⋈ C
        .unionByName(j(oOld, dC)) // O ⋈ ΔC
        .unionByName(j(dO, dC)) // ΔO ⋈ ΔC
        .groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("n_rows"), sum(col("cents")).as("sum_cents"))
        .orderBy("c_nationkey")
    }),
    "q382_cdc_chunking" -> ((s, dir) => {
      // content-defined chunking (LBFS/rsync, Muthitacharoen 2001) — the
      // STORAGE-dedup primitive under every backup/blob store: boundaries
      // where a 4-char window hash ≡ 0 (mod 64), so an insertion shifts
      // only its own chunk while text dedup (q43) would see a brand-new
      // document. The rule is stateless (no min-chunk clamp), so every
      // boundary is decidable per position; the walk is the native
      // codegen'd [[graft.functions.CdcChunks]] single pass (the
      // higher-order-function formulation measured 6.7× slower at sf0.1 —
      // PropertySpec asserts their bit-equality), and the dedup ledger is
      // one hash aggregate over chunk fingerprints (never chunk text).
      // The pack clamps a chunk's length to 2^24−1 chars; the oracle
      // mirrors the clamp (least(length, 16777215)) so both sides agree
      // even on a pathological ≥16 MB single chunk.
      val ch = T(s, dir, "documents")
        .select(col("doc_id"),
          explode(graft.functions.CdcChunks(col("text"))).as("packed"))
        .select(col("doc_id"), expr("packed % 16777216").as("clen"),
          expr("packed div 16777216").as("fp"))
      val per = ch.groupBy(col("fp")).agg(count(lit(1)).as("inst"),
        max(col("clen")).as("clen"))
      ch.agg(countDistinct(col("doc_id")).as("n_docs"),
          count(lit(1)).as("total_chunks"), sum(col("clen")).as("total_chars"))
        .crossJoin(broadcast(per.agg(count(lit(1)).as("distinct_chunks"))))
        .select(col("n_docs"), col("total_chunks"), col("distinct_chunks"),
          expr("(total_chunks - distinct_chunks) * 10000 div total_chunks")
            .as("dup_bp"),
          expr("total_chars * 100 div total_chunks").as("mean_len_c"))
    }),
    "q383_join_size_estimate" -> ((s, dir) => {
      // join-size estimation from COUNT-MIN sketches (Cormode &
      // Muthukrishnan 2005, the AGMS-style inner product): |O ⋈ L| is
      // predicted as min over hash rows of Σ_col cellO·cellL — computed
      // from two 192-cell summaries that each side maintains
      // independently, the optimizer-statistics question ("should this
      // join broadcast? how many shuffle partitions?") answered WITHOUT
      // running the join. The estimate can only overcount (collisions
      // add), so overest ≥ 0 is structural; the gate carries the exact
      // size (oracle-verified) and the estimate's error in bp.
      val seeds = Seq((0, 31L, 7L), (1, 131L, 13L), (2, 1031L, 17L))
      def cm(df: DataFrame, key: String, out: String): DataFrame = {
        val cnt = df.groupBy(col(key).as("k")).agg(count(lit(1)).as("c"))
        seeds.map { case (i, a, b) =>
          cnt.select(lit(i).as("row"),
            ((col("k") * a + b) % 1000000007L % 64).as("col"), col("c"))
        }.reduce(_ unionByName _)
          .groupBy(col("row"), col("col")).agg(sum(col("c")).as(out))
      }
      val est = cm(T(s, dir, "orders"), "o_orderkey", "co")
        .join(cm(T(s, dir, "lineitem"), "l_orderkey", "cl"),
          Seq("row", "col"))
        .groupBy(col("row")).agg(sum(col("co") * col("cl")).as("rowest"))
        .agg(min(col("rowest")).as("cms_est"))
      val exact = T(s, dir, "orders")
        .join(T(s, dir, "lineitem"),
          col("o_orderkey") === col("l_orderkey"))
        .agg(count(lit(1)).as("exact_rows"))
      exact.crossJoin(broadcast(est))
        .select(col("exact_rows"), col("cms_est"),
          expr("(cms_est - exact_rows) * 10000 div exact_rows").as("overest_bp"))
    }),
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
    "q394_grid_radius_join" -> ((s, dir) => {
      // Spatial RADIUS self-join by GRID BLOCKING: each point lands in
      // one 200×200 cell of a planted integer plane; the probe side
      // explodes to its 3×3 cell neighborhood, so candidate pairs come
      // from an equi-join on the cell key and the exact integer distance²
      // filter runs only inside neighborhoods — no cross product anywhere
      // (the geo twin of q127's blocked fuzzy join). r = 150 < cell size,
      // so the 9-cell halo provably covers every qualifying pair, and
      // each pair surfaces exactly once per direction (the build side's
      // cell is unique). Output folds to per-point neighbor stats so the
      // gate row count stays O(points) at any SF.
      val u = T(s, dir, "events")
        .filter(col("user_id").isNotNull)
        .select(col("user_id")).distinct()
        .select(col("user_id"),
          (col("user_id") * 7919L % 1001L - 500L).as("px"),
          (col("user_id") * 104729L % 1001L - 500L).as("py"))
      val cell = u
        .withColumn("cx", expr("(px + 500) div 200"))
        .withColumn("cy", expr("(py + 500) div 200"))
      val probe = cell
        .withColumn("dx", explode(array(lit(-1L), lit(0L), lit(1L))))
        .withColumn("dy", explode(array(lit(-1L), lit(0L), lit(1L))))
        .select(col("user_id").as("u_a"), col("px").as("xa"), col("py").as("ya"),
          (col("cx") + col("dx")).as("cx"), (col("cy") + col("dy")).as("cy"))
      val build = cell.select(col("user_id").as("u_b"), col("px").as("xb"),
        col("py").as("yb"), col("cx"), col("cy"))
      probe.join(build, Seq("cx", "cy"))
        .filter(col("u_a") =!= col("u_b"))
        .withColumn("dist2",
          expr("(xa - xb) * (xa - xb) + (ya - yb) * (ya - yb)"))
        .filter(col("dist2") <= 22500L)
        .groupBy(col("u_a"))
        .agg(count(lit(1)).as("n_neighbors"),
          min(col("dist2")).as("min_dist2"),
          sum(col("dist2")).as("sum_dist2"))
        .orderBy("u_a")
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
      // requireQueryBatch enforces.
      val emb = T(s, dir, "embeddings")
      val xs = emb.filter(col("vec_id") % 2 === 0 && col("vec_id") < 2000)
      val ys = emb.filter(col("vec_id") % 2 === 1)
      val fwd = Similarity.cosineTopK(ys, xs, "vec_id", "embedding", 1)
        .select(col("query_id").as("x"), col("neighbor_id").as("y"),
          col("cosine"))
      val backQ = emb.join(fwd.select(col("y").as("vec_id")).distinct(),
        Seq("vec_id"))
      val bwd = Similarity.cosineTopK(xs, backQ, "vec_id", "embedding", 1)
        .select(col("query_id").as("y"), col("neighbor_id").as("bx"))
      fwd.join(bwd, Seq("y"))
        .filter(col("x") === col("bx"))
        .select(col("x"), col("y"),
          expr("CAST(round(cosine * 10000) AS BIGINT)").as("cos_bp"))
        .orderBy("x")
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
      // recall yardstick) is what the index approximates. In production
      // the cell ASSIGNMENT is the stored index (written once); the curve
      // re-derives it per point only because it is a measurement harness.
      val emb = T(s, dir, "embeddings")
      val xs = emb.filter(col("vec_id") % 2 === 0 && col("vec_id") < 2000)
      val ys = emb.filter(col("vec_id") % 2 === 1)
      val cents = emb.filter(col("vec_id") >= 100 && col("vec_id") < 116)
      val fwdE = Similarity.cosineTopK(ys, xs, "vec_id", "embedding", 1)
        .select(col("query_id").as("x"), col("neighbor_id").as("y"))
      val backQE = emb.join(fwdE.select(col("y").as("vec_id")).distinct(),
        Seq("vec_id"))
      val bwdE = Similarity.cosineTopK(xs, backQE, "vec_id", "embedding", 1)
        .select(col("query_id").as("y"), col("neighbor_id").as("bx"))
      val exact = fwdE.join(bwdE, Seq("y")).filter(col("x") === col("bx"))
        .select(col("x"), col("y")).localCheckpoint()
      val nEx = exact.agg(count(lit(1)).as("n_exact"))
      Seq(1, 2, 4, 8).map { np =>
        val fwd = Similarity.ivfTopK(ys, xs, cents, "vec_id", "embedding",
            k = 1, nprobe = np)
          .select(col("query_id").as("x"), col("neighbor_id").as("y"))
        val backQ = emb.join(fwd.select(col("y").as("vec_id")).distinct(),
          Seq("vec_id"))
        val bwd = Similarity.ivfTopK(xs, backQ, cents, "vec_id", "embedding",
            k = 1, nprobe = np)
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
    "q62_range_join" -> ((s, dir) => {
      // unkeyed interval join via time bins: clicks within ±30min per signup
      val ev = T(s, dir, "events")
      val signups = ev.filter(col("event_type") === "signup")
        .select(col("event_id"), col("ts"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("ts").as("click_ts"))
      Relational.binnedRangeJoin(signups, clicks, "ts", "click_ts",
        before = "30 minutes", after = "30 minutes", binWidth = "1 hour")
        .groupBy(col("event_id")).agg(count(lit(1)).as("clicks_nearby"))
        .orderBy("event_id")
    }),
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
      val tmp = s"$TMP/q122_bin"
      val root = java.nio.file.Paths.get(tmp)
      if (java.nio.file.Files.exists(root)) {
        val it = java.nio.file.Files.walk(root).sorted(java.util.Comparator.reverseOrder())
        try it.forEach(p => java.nio.file.Files.delete(p)) finally it.close()
      }
      java.nio.file.Files.createDirectories(root)
      // a NULL text has no byte payload to stage — skipped on BOTH sides
      // (the oracle filters identically), instead of an executor NPE
      T(s, dir, "documents").filter(col("text").isNotNull)
        .select(col("doc_id"), col("text"))
        .as[(Long, String)]
        .foreachPartition { (it: Iterator[(Long, String)]) =>
          it.foreach { case (id, text) =>
            java.nio.file.Files.write(
              java.nio.file.Paths.get(f"$tmp%s/$id%09d.bin"),
              text.getBytes(java.nio.charset.StandardCharsets.UTF_8))
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
          col("o_orderpriority").asc_nulls_first)),
    "q127_fuzzy_join" -> ((s, dir) =>
      fuzzyCustomerPairs(s, dir).orderBy("key_a", "key_b")),
    "q115_xml_roundtrip" -> ((s, dir) => {
      // Spark 4's native XML source (the web-scrape interchange format the
      // reference's collectors would meet in the wild): write, read back
      // with declared schema, prove value fidelity through the gate
      val nation = T(s, dir, "nation")
      val tmp = s"$TMP/q115_xml"
      nation.coalesce(1).write.mode("overwrite")
        .option("rootTag", "nations").option("rowTag", "nation").xml(tmp)
      s.read.schema(nation.schema)
        .option("rowTag", "nation").xml(tmp)
        .orderBy("n_nationkey")
    }),
    "q64_rollup" -> ((s, dir) =>
      // multi-granularity dashboard aggregate: (type, day), per-type subtotal,
      // grand total in ONE pass (vs re-scanning per granularity)
      T(s, dir, "events")
        .withColumn("day", TextFunctions.dayString(col("ts")))
        .rollup(col("event_type"), col("day"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy(col("event_type").asc_nulls_first, col("day").asc_nulls_first)),
    "q65_percentiles" -> ((s, dir) => {
      // exact quantiles via the value-histogram path: `percentile()` holds
      // every group value in one task's buffer at scale, while the histogram
      // shuffles (type, DISTINCT cents value) with map-side combine and its
      // CDF window is bounded by the quantized value domain. Bit-compatible
      // with percentile() (RelationalSpec asserts parity).
      val quants = Relational.histogramQuantiles(
        T(s, dir, "events"), "event_type", "value", Seq(0.5, 0.9, 0.99))
      quants.groupBy(col("event_type"))
        .agg(ops.Num.roundz(min(when(col("q") === 0.5, col("quantile"))), 4).as("p50"),
          ops.Num.roundz(min(when(col("q") === 0.9, col("quantile"))), 4).as("p90"),
          ops.Num.roundz(min(when(col("q") === 0.99, col("quantile"))), 4).as("p99"))
        .orderBy("event_type")
    }),
    "q66_pivot" -> ((s, dir) =>
      // dashboard crosstab: one row per day, one column per event type —
      // explicit pivot values keep the schema deterministic (no value scan)
      T(s, dir, "events")
        .withColumn("day", TextFunctions.dayString(col("ts")))
        .groupBy(col("day"))
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .agg(count(lit(1)))
        .na.fill(0)
        .orderBy("day")),
    "q67_cumulative_users" -> ((s, dir) => {
      // new + cumulative distinct users per day: first-seen day per user,
      // then a running sum over the (tiny) per-day aggregate
      val firstSeen = T(s, dir, "events")
        .groupBy(col("user_id"))
        .agg(min(TextFunctions.dayString(col("ts"))).as("day"))
      firstSeen.groupBy(col("day")).agg(count(lit(1)).as("new_users"))
        .withColumn("cumulative_users",
          sum(col("new_users")).over(
            org.apache.spark.sql.expressions.Window.orderBy("day")))
        .orderBy("day")
    }),
    "q68_frame_sample" -> ((s, dir) =>
      // multimodal frame fan-out: N rows out per payload in, fingerprinted —
      // the explode happens in the map stage, before any shuffle
      Multimodal.frameSampleStub(
        Multimodal.asMultimodal(T(s, dir, "documents"), "doc_id", "text"),
        "doc_id", everyNBytes = 256)
        .select(col("doc_id"), col("frame_idx"),
          graft.functions.RollingHash(decode(col("frame"), "UTF-8")).as("frame_hash"))
        .orderBy("doc_id", "frame_idx")),
    "q69_salted_count" -> ((s, dir) =>
      // the skew remedy itself under the oracle: two-phase salted count over
      // a 3-value key equals the plain GROUP BY exactly
      Relational.saltedCount(T(s, dir, "events"), "event_type", salts = 8)
        .orderBy("event_type")),
    "q70_semi_join" -> ((s, dir) =>
      // existence probe as a real left_semi (no row duplication from the
      // multi-match right side, right columns never materialize)
      T(s, dir, "customer")
        .join(T(s, dir, "orders").filter(col("o_orderstatus") === "P"),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"))
        .orderBy("c_custkey")),
    "q71_except" -> ((s, dir) => {
      // set difference: customers active in 1996 but not in 1997
      val orders = T(s, dir, "orders")
      def activeIn(y: Int) = orders
        .filter(year(col("o_orderdate")) === y).select(col("o_custkey"))
      activeIn(1996).except(activeIn(1997))
        .select(col("o_custkey").as("custkey")).orderBy("custkey")
    }),
    "q72_pii_scrub" -> ((s, dir) =>
      // pre-training hygiene: inject deterministic synthetic PII (the corpus
      // has none), then redact emails / IPv4s / phone runs with placeholders
      T(s, dir, "documents")
        .withColumn("dirty", concat(
          lit("contact user"), col("doc_id"), lit("@example.com from 10.0."),
          (col("doc_id") % 256).cast("string"), lit(".7 call +1 (555) 123-"),
          lpad((col("doc_id") % 10000).cast("string"), 4, "0"), lit(" :: "), col("text")))
        .select(col("doc_id"), TextFunctions.scrubPii(col("dirty")).as("clean"))
        .orderBy("doc_id")),
    "q73_repetition_filter" -> ((s, dir) =>
      // C4/Gopher-style quality gate: repetition ratio + keep flag
      T(s, dir, "documents")
        .withColumn("rep_ratio", TextFunctions.repetitionRatio(col("text")))
        .withColumn("keep", col("rep_ratio") <= 0.2)
        .select("doc_id", "rep_ratio", "keep")
        .orderBy("doc_id")),
    "q74_unified_pipeline" -> ((s, dir) => {
      // The reference's ACTUAL end-to-end DAG under the gate
      // (`Data Collection/Airflow.py:95-102` collect → unify → nlp;
      // `Analysis Dashboard/app.py:105-130` dashboard agg): three raw
      // source-shaped frames are synthesized deterministically from the
      // documents table — reddit with epoch-seconds timestamps
      // (`Reddit.py:151-161`), 4chan with HTML bodies + free-text
      // `MM/dd/yy(Day)HH:mm:ss` timestamps (`chan4.py:81`, the SURVEY §7.4
      // "hard part"), youtube with ISO-`Z` text timestamps
      // (`Youtube_final.py:59,90-96`) — then run through the full
      // Pipeline.run (per-source adapters → unify → dedup → anti-join skip of
      // already-enriched ids → clean → sentiment → moderation) and the
      // per-platform/day dashboard aggregate.
      val docs = T(s, dir, "documents")
      val pad2 = (c: org.apache.spark.sql.Column) => lpad(c.cast("string"), 2, "0")
      val reddit = docs.filter(col("doc_id") % 3 === 0).select(
        concat(lit("sub"), (col("doc_id") % 5).cast("string")).as("subreddit"),
        concat(lit("p"), (col("doc_id") % 50).cast("string")).as("post_id"),
        col("text").as("body"),
        (col("doc_id") % 100).cast("int").as("score"),
        (lit(1704067200L) + (col("doc_id") % 20) * 86400L + col("doc_id") % 1000)
          .as("created_utc"),
        concat(lit("r"), col("doc_id").cast("string")).as("comment_id"))
      val chan = docs.filter(col("doc_id") % 3 === 1).select(
        col("doc_id").cast("string").as("post_number"),
        // HTML shape the reference strips at ingest (`chan4.py:56-62`):
        // quote-ref span, bold wrapper, an &amp; entity
        concat(lit("<span class=\"quote\">&gt;&gt;"), (col("doc_id") - 1).cast("string"),
          lit("</span> <b>"), col("text"), lit("</b> &amp; done")).as("comment"),
        concat(pad2(col("doc_id") % 12 + 1), lit("/"), pad2(col("doc_id") % 28 + 1),
          lit("/24(Day)"), pad2(col("doc_id") % 24), lit(":"),
          pad2(col("doc_id") % 60), lit(":"), pad2(col("doc_id") % 60))
          .as("timestamp_raw"),
        lit("Anonymous").as("name"),
        lit(null).cast("string").as("image_filename"))
      val youtube = docs.filter(col("doc_id") % 3 === 2).select(
        concat(lit("v"), (col("doc_id") % 7).cast("string")).as("video_id"),
        lit("recession talk").as("video_title"),
        concat(lit("y"), col("doc_id").cast("string")).as("comment_id"),
        concat(lit("2024-02-"), pad2(col("doc_id") % 28 + 1), lit("T"),
          pad2(col("doc_id") % 24), lit(":"), pad2(col("doc_id") % 60), lit(":00Z"))
          .as("comment_time"),
        col("text").as("comment_text"))
      // enrich-once: every 10th reddit id is already in the store and must be
      // skipped by the anti-join (`Reddit_4chan_Analysis.py:88-99`)
      val already = docs
        .filter(col("doc_id") % 3 === 0 && col("doc_id") % 10 === 0)
        .select(concat(lit("r"), col("doc_id").cast("string")).as("comment_id"))
      val enriched = Pipeline.run(reddit, chan, youtube, already)
      enriched
        .groupBy(col("platform"), TextFunctions.dayString(col("created_ts")).as("day"),
          col("sentiment"))
        .agg(count(lit(1)).as("cnt"),
          sum(when(col("is_hate_speech"), 1L).otherwise(0L)).as("hate_cnt"),
          // exact integer 1e-4-unit sum of the (4dp-rounded) scores:
          // order-independent and bit-identical to the oracle
          (sum(ops.Num.roundz(col("sentiment_score") * 10000, 0).cast("long")) / 10000.0)
            .as("sum_score"))
        .orderBy("platform", "day", "sentiment")
    }),
    "q75_stateful_sessions" -> ((s, dir) =>
      // the flatMapGroupsWithState sessionizer replayed under the SAME oracle
      // as the built-in session_window (q57): custom state must agree with
      // the declarative twin (flush-sentinel determinism — Streaming.scala)
      Streaming.statefulSessionsReplay(s, dir, s"$TMP/q75_src")
        .orderBy("user_id", "session_start")),
    "q76_curation_chain" -> ((s, dir) =>
      // the composed C4/Gopher-style curation pipeline with per-doc audit
      // verdicts: langid -> quality -> repetition -> content-hash dedup
      Curation.curationChain(T(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id")),
    "q77_neardup_components" -> ((s, dir) => {
      // pairwise near-dup hits -> duplicate CLUSTERS -> one canonical doc per
      // cluster (min id): min-label propagation to the connected-component
      // fixpoint, against a recursive-CTE oracle; components come from the
      // SHARED materialized index (one derivation for q77/q105/q138/q250/q255)
      val (_, comp) = dedupIndex(s, dir)
      comp
        .withColumn("is_canonical", col("node") === col("component"))
        .select(col("node").as("doc_id"), col("component"), col("is_canonical"))
        .orderBy("doc_id")
    }),
    "q78_tfidf_topk" -> ((s, dir) =>
      TextAnalysis.tfIdfTopTerms(T(s, dir, "documents"), "doc_id", "text", k = 3)
        .orderBy("doc_id", "rn")),
    "q79_weighted_mixture" -> ((s, dir) =>
      // data-mixing quota sampler under the gate: per-source budget split
      // 3:1 over two sources, everything else dropped — deterministic
      // pseudo-shuffle order, so the oracle reproduces the exact sample
      Curation.weightedMixture(T(s, dir, "documents"), "source", "doc_id",
        Map("src1" -> 3.0, "src2" -> 1.0), totalBudget = 40)
        .select(col("doc_id"), col("source"))
        .orderBy("source", "doc_id")),
    "q80_moving_average" -> ((s, dir) => {
      // 7-day trailing moving average of daily event value — the dashboard
      // trend-line primitive; the window runs over per-day aggregates (ONE
      // row per day), never raw events, with an integer day index so the
      // RANGE frame is engine-portable
      val daily = T(s, dir, "events")
        .groupBy(TextFunctions.dayString(col("ts")).as("day"))
        .agg(sum(ops.Num.roundz(col("value") * 100, 0).cast("long")).as("day_cents"))
        .withColumn("day_idx", datediff(col("day").cast("date"), lit("1970-01-01").cast("date")))
      // exact-arithmetic moving average: one long sum over the frame, one
      // final double division (a segment-tree vs sequential float summation
      // would otherwise let the two engines disagree in the last ulp)
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(col("day_idx")).rangeBetween(-6, 0)
      daily
        .withColumn("ma7", ops.Num.roundz(
          sum(col("day_cents")).over(w).cast("double") /
            count(col("day_cents")).over(w) / 100.0, 4))
        .select(col("day"), (col("day_cents") / 100.0).as("day_value"), col("ma7"))
        .orderBy("day")
    }),
    "q81_stream_stream_join" -> ((s, dir) =>
      // watermarked stream-stream self-join (view→purchase attribution
      // within 1 h), replayed to equality with the batch range join
      Streaming.streamStreamAttribution(s, dir)
        .orderBy("purchase_id", "view_id")),
    "q82_hopping_window" -> ((s, dir) =>
      // 24 h windows sliding every 6 h: each event lands in exactly 4
      // windows via a map-side Expand — no row blowup crosses a shuffle
      T(s, dir, "events")
        .groupBy(window(col("ts"), "1 day", "6 hours"))
        .agg(count(lit(1)).as("cnt"))
        .select(col("window.start").as("bucket_start"), col("cnt"))
        .orderBy("bucket_start")),
    "q83_custom_udaf" -> ((s, dir) =>
      // typed Aggregator surface: RMS with an exact (Σ cents², n) buffer —
      // partials merge in any order, sqrt+divide happen once at finish
      T(s, dir, "events")
        .groupBy(col("event_type"))
        .agg(ops.Num.roundz(udaf(graft.functions.RmsCents).apply(col("value")), 4).as("rms_value"))
        .orderBy("event_type")),
    "q93_vocab_encode" -> ((s, dir) => {
      // text → training tensors: frequency-ranked vocabulary (1 = most
      // frequent, token tie-break), tokens id-mapped through a BROADCAST
      // vocab join, per-doc sequences rebuilt in position order and
      // Karp–Rabin-fingerprinted for compact verification
      val toks = T(s, dir, "documents")
        .select(col("doc_id"),
          posexplode(split(lower(col("text")), "\\s+")).as(Seq("pos", "tok")))
        .filter(length(col("tok")) > 0)
      // frequency ranking via TwoPhase global rank (bin by -freq so bins
      // follow the sort order; ties — the freq=1 tier — share a bin, which
      // bounds serialization at the largest tie tier, not the whole vocab).
      // The freq frame is checkpointed so the token explode runs once.
      val vocabFreq = toks.groupBy(col("tok")).agg(count(lit(1)).as("freq"))
        .localCheckpoint()
      val (vocab, _) = graft.ops.TwoPhase.globalRank(vocabFreq, -col("freq"),
        Seq(col("freq").desc, col("tok")), "token_id")
      toks.join(broadcast(vocab.select("tok", "token_id")), "tok")
        .groupBy(col("doc_id"))
        .agg(sort_array(collect_list(struct(col("pos"), col("token_id")))).as("ps"))
        .select(col("doc_id"), expr("transform(ps, x -> x.token_id)").as("ids"))
        .select(col("doc_id"), size(col("ids")).cast("long").as("n_tokens"),
          expr("aggregate(ids, CAST(0 AS BIGINT), (acc, x) -> (acc * 31 + x) % 1000000007)")
            .as("ids_fp"))
        .orderBy("doc_id")
    }),
    "q92_jdbc_roundtrip" -> ((s, dir) => {
      // the reference's Postgres store under the gate (Derby stands in —
      // same JDBC write/scan path): per-type daily counts written with
      // batched set-based inserts, read back through the JDBC scan twin
      // no dir cleanup: Derby stays booted for the JVM's lifetime, so
      // deleting under it between calls would corrupt the instance;
      // Overwrite mode replaces the table on every call instead
      val db = s"$TMP/q92_derby"
      val url = s"jdbc:derby:$db;create=true"
      val agg = T(s, dir, "events")
        .groupBy(col("event_type"), TextFunctions.dayString(col("ts")).as("day"))
        .agg(count(lit(1)).as("cnt"))
      graft.storage.Storage.writeJdbc(agg, url, "type_daily",
        org.apache.spark.sql.SaveMode.Overwrite)
      graft.storage.Storage.readJdbc(s, url, "type_daily")
        .select(col("event_type"), col("day"), col("cnt"))
        .orderBy("event_type", "day")
    }),
    "q91_sequence_packing" -> ((s, dir) => {
      // concat-then-chunk packing: docs in id order form one token stream,
      // chunked into 2048-token training sequences — chunk = the sequence
      // the doc STARTS in (floor of the preceding token count / budget).
      // The cumulative sum is a TwoPhase prefix sum (bin by doc_id range,
      // per-bin local windows in parallel, broadcast bin offsets) — no
      // empty-partition window anywhere in the plan, so nothing serializes
      // onto one task at scale. Token counts are localCheckpoint'ed so the
      // tokenizer runs once, not once per two-phase pass.
      val budget = 2048
      val docs = T(s, dir, "documents")
        .select(col("doc_id"), TextAnalysis.tokenCount(col("text")).as("n_tokens"))
        .localCheckpoint()
      val (cum, _) = graft.ops.TwoPhase.prefixSum(docs, col("doc_id"),
        Seq(col("doc_id")), col("n_tokens"), "__cum")
      cum
        .withColumn("__preceding", col("__cum") - col("n_tokens"))
        // exact integer floor division (`div`), matching the oracle's `//`
        .withColumn("chunk_id", expr(s"__preceding div $budget"))
        .groupBy(col("chunk_id"))
        .agg(count(lit(1)).as("docs"), sum(col("n_tokens")).as("tokens"),
          min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))
        .orderBy("chunk_id")
    }),
    "q89_histogram" -> ((s, dir) =>
      // fixed-width value histogram per class — one two-phase hash agg; the
      // bin edge is a float floor both engines compute identically
      T(s, dir, "events")
        .groupBy(col("event_type"),
          (floor(col("value") / 25) * 25).cast("long").as("bin"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy("event_type", "bin")),
    "q90_zscore_anomaly" -> ((s, dir) => {
      // windowed anomaly detection: each day's total scored against the
      // trailing 7-day mean/std. Moments come from EXACT long sums
      // (Σcents, Σcents²) over the frame with the float ops (two divisions,
      // one sqrt) applied once at the end — engine-portable like q80/q83.
      // Headroom bound (same contract as RmsCents): c² wraps silently in
      // Spark while DuckDB sums into HUGEINT, so per-day |cents| must stay
      // ≤ ~3.0e9 (7·c² < 2^63). sf0.1 peaks near 2.7e7 cents/day — ~100×
      // headroom on c; a deployment with larger daily totals must rescale
      // the unit (e.g. whole currency) before this frame.
      val daily = T(s, dir, "events")
        .groupBy(TextFunctions.dayString(col("ts")).as("day"))
        .agg(sum(ops.Num.roundz(col("value") * 100, 0).cast("long")).as("c"))
        .withColumn("day_idx",
          datediff(col("day").cast("date"), lit("1970-01-01").cast("date")))
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(col("day_idx")).rangeBetween(-6, 0)
      val n = count(col("c")).over(w).cast("double")
      val mean = sum(col("c")).over(w).cast("double") / n
      val msq = sum(col("c") * col("c")).over(w).cast("double") / n
      val vr = msq - mean * mean
      val std = when(vr > 0, sqrt(vr)).otherwise(lit(0.0))
      val z = when(std > 0, ops.Num.roundz((col("c").cast("double") - mean) / std, 4))
        .otherwise(lit(0.0))
      daily
        .withColumn("zscore", z)
        .select(col("day"), (col("c") / 100.0).as("day_value"), col("zscore"),
          (abs(col("zscore")) > 2).as("anomaly"))
        .orderBy("day")
    }),
    "q88_bucketed_join" -> ((s, dir) => {
      // the 100 TB layout technique under the gate: both sides written
      // bucketed+sorted on the join key, then joined through the catalog —
      // results provably equal the plain join (the exchange-free plan
      // property itself is asserted in StorageSpec)
      graft.storage.Storage.writeBucketed(
        T(s, dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice"),
        "g88_orders", "o_custkey", 8)
      graft.storage.Storage.writeBucketed(
        T(s, dir, "customer").select("c_custkey", "c_mktsegment"),
        "g88_customer", "c_custkey", 8)
      s.table("g88_orders")
        .join(s.table("g88_customer"), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("cnt"),
          (sum(ops.Num.roundz(col("o_totalprice") * 100, 0).cast("long")) / 100.0).as("sum_price"))
        .orderBy("c_mktsegment")
    }),
    "q86_funnel" -> ((s, dir) => {
      // ordered funnel signup -> view -> purchase: each stage's timestamp
      // must follow the previous stage's; three keyed aggregates + two
      // broadcast-sized joins on user_id, no window over raw events
      val ev = T(s, dir, "events").select(col("user_id"), col("event_type"), col("ts"))
      val s1 = ev.filter(col("event_type") === "signup")
        .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
      val s2 = ev.filter(col("event_type") === "view").join(s1, "user_id")
        .filter(col("ts") > col("t1"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("t2"))
      val s3 = ev.filter(col("event_type") === "purchase").join(s2, "user_id")
        .filter(col("ts") > col("t2"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("t3"))
      val counts = s1.agg(count(lit(1)).as("users")).withColumn("stage", lit("1_signup"))
        .unionByName(s2.agg(count(lit(1)).as("users")).withColumn("stage", lit("2_view")))
        .unionByName(s3.agg(count(lit(1)).as("users")).withColumn("stage", lit("3_purchase")))
      counts.select(col("stage"), col("users")).orderBy("stage")
    }),
    "q87_retention" -> ((s, dir) => {
      // cohort retention: users grouped by first-seen day, activity counted
      // at day offsets 0/1/7 — first-seen agg + one join + one (cohort,
      // offset) agg; distinct users via the same exact path as q67
      val ev = T(s, dir, "events").select(col("user_id"), col("ts"))
      val cohort = ev.groupBy(col("user_id"))
        .agg(min(to_date(col("ts"))).as("cohort_day"))
      ev.join(cohort, "user_id")
        .withColumn("day_offset",
          datediff(to_date(col("ts")), col("cohort_day")).cast("long"))
        .filter(col("day_offset").isin(0L, 1L, 7L))
        .groupBy(TextFunctions.dayString(col("cohort_day")).as("cohort"), col("day_offset"))
        .agg(countDistinct(col("user_id")).as("active_users"))
        .orderBy("cohort", "day_offset")
    }),
    "q85_salted_join" -> ((s, dir) =>
      // the skew JOIN remedy itself under the oracle: salting replicates the
      // dim 8x and spreads each hot event_type over 8 reducers, with results
      // exactly equal to the plain join (the salt never reaches the output)
      Relational.saltedJoin(
        T(s, dir, "events").select(col("event_id"), col("event_type")),
        T(s, dir, "events").groupBy(col("event_type"))
          .agg(count(lit(1)).as("type_total")),
        "event_type", salts = 8)
        .select(col("event_id"), col("event_type"), col("type_total"))
        .orderBy("event_id")),
    "q84_full_outer_join" -> ((s, dir) => {
      // year-over-year customer activity: full outer keeps customers active
      // in either year; USING-style key coalescing, absent side counts as 0
      val orders = T(s, dir, "orders")
      def yearly(y: Int, alias: String) = orders
        .filter(year(col("o_orderdate")) === y)
        .groupBy(col("o_custkey").as("custkey"))
        .agg(count(lit(1)).as(alias))
      yearly(1996, "cnt96")
        .join(yearly(1997, "cnt97"), Seq("custkey"), "full_outer")
        .select(col("custkey"),
          coalesce(col("cnt96"), lit(0L)).as("cnt96"),
          coalesce(col("cnt97"), lit(0L)).as("cnt97"))
        .orderBy("custkey")
    }),
    "q94_scd2_history" -> ((s, dir) =>
      // CDC history build: collapse the per-user event-type stream into
      // SCD2 validity ranges — one key exchange, two window passes
      Warehouse.scd2Compact(
        T(s, dir, "events").select(col("user_id"), col("event_type"), col("ts"), col("event_id")),
        "user_id", "event_type", "ts", "event_id")
        .orderBy("user_id", "valid_from")),
    "q95_merge_upsert" -> ((s, dir) => {
      // MERGE INTO shape: early-January profiles upserted with a late-
      // January delta — matched users update, new users insert, absent
      // users keep; exact cents so the full-outer coalesce is portable
      val ev = T(s, dir, "events").select(col("user_id"), col("ts"),
        ops.Num.roundz(col("value") * 100, 0).cast("long").as("cents"))
      def profile(f: org.apache.spark.sql.Column) = ev.filter(f).groupBy("user_id")
        .agg(count(lit(1)).as("n_events"), sum(col("cents")).as("total_cents"))
      Warehouse.mergeUpsert(
        profile(col("ts") < lit("2024-01-03").cast("timestamp")),
        profile(col("ts") >= lit("2024-01-28").cast("timestamp")),
        "user_id", Seq("n_events", "total_cents"))
        .orderBy("user_id")
    }),
    "q96_decile_stats" -> ((s, dir) => {
      // quantile bucketing of docs by length: EXACT ntile(10) semantics with
      // no global single-partition window — TwoPhase global rank over the
      // unique order (n_chars, doc_id), then the SQL-standard ntile
      // allocation computed map-side from (rank, N). Bit-identical to the
      // window ntile (TwoPhaseSpec asserts parity), distributed at any scale.
      // avg is one exact-long sum divided once — engine-portable
      val docs = T(s, dir, "documents").select(col("doc_id"), col("n_chars"))
      val (ranked, n) = graft.ops.TwoPhase.globalRank(docs, col("n_chars"),
        Seq(col("n_chars"), col("doc_id")), "__rank")
      ranked
        .withColumn("decile", graft.ops.TwoPhase.ntileFromRank("__rank", n, 10).cast("long"))
        .drop("__rank")
        .groupBy(col("decile"))
        .agg(count(lit(1)).as("cnt"), min(col("n_chars")).as("min_chars"),
          max(col("n_chars")).as("max_chars"),
          (sum(col("n_chars")).cast("double") / count(lit(1))).as("avg_chars"))
        .orderBy("decile")
    }),
    "q97_latest_per_key" -> ((s, dir) => {
      // latest-3 snapshot per key — the "current state" read every serving
      // layer runs; rank inside the key partition, never a global sort
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts").desc, col("event_id").desc)
      T(s, dir, "events").select(col("user_id"), col("event_id"), col("event_type"), col("ts"))
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= 3)
        .orderBy("user_id", "rn")
    }),
    "q98_embed_quantize" -> ((s, dir) =>
      // the codes array itself is unit-tested; the gate row compresses it
      // to (fp, sum, dims) because the driver compare is scalar-only —
      // same convention as q93's id-sequence fingerprint. +128 keeps the
      // fold positive (codes ∈ [-127, 127]) so both engines' % agree
      Similarity.quantizeInt8(T(s, dir, "embeddings"), "vec_id", "embedding")
        .select(col("vec_id"), col("scale_e6"),
          expr("aggregate(codes, CAST(0 AS BIGINT), (acc, x) -> (acc * 31 + x + 128) % 1000000007)")
            .as("codes_fp"),
          expr("aggregate(codes, CAST(0 AS BIGINT), (acc, x) -> acc + x)").as("sum_codes"),
          size(col("codes")).cast("long").as("n_dims"))
        .orderBy("vec_id")),
    "q99_partitioned_layout" -> ((s, dir) => {
      // hive-style date partitioning — THE 100 TB layout for time-range
      // scans: the filtered read prunes to 5 of 30 day directories before
      // any row is touched (PlanSpec asserts the pruned partition count)
      val tmp = s"$TMP/q99_part"
      T(s, dir, "events")
        .withColumn("day", TextFunctions.dayString(col("ts")))
        .write.mode("overwrite").partitionBy("day").parquet(tmp)
      s.read.parquet(tmp)
        .filter(col("day").between("2024-01-10", "2024-01-14"))
        .groupBy(col("day").cast("string").as("day"))
        .agg(count(lit(1)).as("cnt"),
          sum(ops.Num.roundz(col("value") * 100, 0).cast("long")).as("sum_cents"))
        .orderBy("day")
    }),
    "q100_bigram_freq" -> ((s, dir) =>
      TextAnalysis.bigramCounts(T(s, dir, "documents"), "text", k = 40)),
    "q101_interval_merge" -> ((s, dir) =>
      // gaps-and-islands: fuse each user's 5-minute activity intervals;
      // exact epoch-microsecond arithmetic end to end
      Warehouse.mergeIntervals(T(s, dir, "events"), "user_id", "ts", widthSec = 300)
        .orderBy("user_id", "island")),
    "q102_contamination" -> ((s, dir) =>
      // benchmark decontamination: flag training docs sharing 3-gram shingles
      // with the (synthetic) eval slice doc_id % 97 == 0; broadcast the tiny
      // eval shingle set, corpus never shuffles for the probe
      Dedup.shingleContamination(T(s, dir, "documents"), "doc_id", "text",
        col("doc_id") % 97 === 0, k = 3, minHits = 3)
        .orderBy("doc_id")),
    "q103_token_zipf" -> ((s, dir) =>
      // corpus-composition audit: top-50 token head with exact cumulative
      // counts (rank/cumsum windows run AFTER the limit — bounded by k)
      TextAnalysis.tokenZipf(T(s, dir, "documents"), "text", k = 50)
        .orderBy("rank")),
    "q104_prefix_dedup" -> ((s, dir) =>
      // prefix-fingerprint dedup: same opening 80 chars ⇒ one keeper —
      // catches truncated/extended re-crawls exact hashing misses
      Dedup.prefixDedup(T(s, dir, "documents"), "doc_id", "text", prefixLen = 80)
        .orderBy("doc_id")),
    "q105_cluster_reps" -> ((s, dir) => {
      // canonical-doc election: near-dup components (shared materialized
      // index, q44 params) -> keep the LONGEST member per cluster (tie: min
      // id) — the quality-aware upgrade of q77's min-id canonicalization
      val (_, comp) = dedupIndex(s, dir)
      Dedup.clusterRepresentativesFrom(comp, T(s, dir, "documents"), "doc_id", "n_chars")
        .orderBy("component", "doc_id")
    }),
    "q106_sequence_assembly" -> ((s, dir) =>
      // event log -> next-action-prediction sequences: per user-day ordered
      // event-type chain, merge-order-independent via post-collect sort
      Curation.assembleSequences(T(s, dir, "events"), "user_id", "ts",
        "event_id", "event_type")
        .orderBy("user_id", "day")),
    "q107_profile" -> ((s, dir) =>
      // data-quality profile: per-column null/distinct/min/max in ONE agg
      // pass + stack unpivot (the look-before-you-train table summary)
      Profiling.profile(T(s, dir, "orders"),
        Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"))
        .orderBy("col_name")),
    "q108_sliding_distinct" -> ((s, dir) =>
      // trailing-7-day distinct users per day: distinct (day,user) first,
      // then a map-side day fan-out — no count-distinct window, no range join
      Relational.slidingDistinct(T(s, dir, "events"), "user_id", "ts", windowDays = 7)
        .orderBy("day")),
    "q109_train_split" -> ((s, dir) =>
      // deterministic 80/10/10 train/val/test assignment by multiplicative
      // id hash; per-split exact counts + char volume
      Curation.trainValTestSplit(T(s, dir, "documents"), "doc_id", "n_chars")
        .orderBy("split")),
    "q110_multimodal_features" -> ((s, dir) =>
      // gate cover for the per-partition feature-extraction seam (q56's
      // decode slot, the mapPartitions shape a real codec plugs into):
      // FakeDecoder emits integral byte stats, so the float vector
      // compresses to an exact fingerprint (q98's scalar convention)
      Multimodal.extractFeatures(
        Multimodal.asMultimodal(T(s, dir, "documents"), "doc_id", "text"),
        "doc_id", Multimodal.FakeDecoder)
        .select(col("doc_id"),
          size(col("features")).cast("long").as("n_features"),
          expr("aggregate(transform(features, x -> CAST(x AS BIGINT)), " +
            "CAST(0 AS BIGINT), (acc, x) -> (acc * 31 + x) % 1000000007)")
            .as("features_fp"))
        .orderBy("doc_id")),
    "q111_incremental_agg" -> ((s, dir) => {
      // materialized-view refresh under the gate: history + one new slice
      // each aggregated separately, merged with mergeAggStates (counts/sums
      // add, min/max take extremes) — the oracle recomputes over base ∪
      // delta in FULL, so a green row proves merge == full recompute
      val ev = T(s, dir, "events").select(col("user_id"), col("ts"),
        ops.Num.roundz(col("value") * 100, 0).cast("long").as("cents"))
      val cutoff = lit("2024-01-20").cast("timestamp")
      def agg(f: org.apache.spark.sql.Column) = ev.filter(f).groupBy("user_id")
        .agg(count(lit(1)).as("n_events"), sum(col("cents")).as("total_cents"),
          min(col("ts")).as("first_ts"), max(col("ts")).as("last_ts"))
      Warehouse.mergeAggStates(agg(col("ts") < cutoff), agg(col("ts") >= cutoff),
        "user_id", sumCols = Seq("n_events", "total_cents"),
        minCols = Seq("first_ts"), maxCols = Seq("last_ts"))
        .orderBy("user_id")
    }),
    "q112_image_decode" -> ((s, dir) => {
      // REAL image decode under the gate: per doc, a solid-color PNG is
      // synthesized with geometry/color derived from (doc_id, n_chars), and
      // ImageDecoder genuinely parses the PNG bytes per partition (JDK
      // ImageIO — no external codecs). The oracle predicts the decoded
      // (width, height, mean RGB) arithmetically; means of a constant-color
      // image are exact, so the compare is bit-strict.
      import s.implicits._
      val imgs = T(s, dir, "documents").select(col("doc_id"), col("n_chars"))
        .as[(Long, Long)].mapPartitions(_.map { case (id, nc) =>
          val rgb = (((id % 256) << 16) | ((nc % 256) << 8) | 7L).toInt
          (id, Multimodal.synthPng((nc % 16 + 1).toInt, (id % 16 + 1).toInt, rgb))
        }).toDF("doc_id", "payload")
      Multimodal.extractFeatures(imgs, "doc_id", Multimodal.ImageDecoder)
        .select(col("doc_id"),
          element_at(col("features"), 1).cast("long").as("width"),
          element_at(col("features"), 2).cast("long").as("height"),
          element_at(col("features"), 3).cast("long").as("mean_r"),
          element_at(col("features"), 4).cast("long").as("mean_g"),
          element_at(col("features"), 5).cast("long").as("mean_b"))
        .orderBy("doc_id")
    }),
    "q113_audio_decode" -> ((s, dir) => {
      // REAL audio decode under the gate: per doc, a constant-amplitude
      // 16-bit mono PCM WAV is synthesized and WavDecoder genuinely parses
      // the RIFF container (JDK javax.sound). Oracle predicts (sample rate,
      // frame count, peak amplitude) arithmetically.
      import s.implicits._
      val wavs = T(s, dir, "documents").select(col("doc_id"), col("n_chars"))
        .as[(Long, Long)].mapPartitions(_.map { case (id, nc) =>
          (id, Multimodal.synthWav((nc % 500 + 1).toInt,
            (id % 30000).toShort, 16000))
        }).toDF("doc_id", "payload")
      Multimodal.extractFeatures(wavs, "doc_id", Multimodal.WavDecoder)
        .select(col("doc_id"),
          element_at(col("features"), 1).cast("long").as("sample_rate"),
          element_at(col("features"), 2).cast("long").as("n_frames"),
          element_at(col("features"), 3).cast("long").as("peak"))
        .orderBy("doc_id")
    }),
    "q139_video_frames" -> ((s, dir) => {
      // REAL video-container frame sampling under the gate: per doc, an
      // animated GIF with (n_chars%5+2) solid-color frames is synthesized
      // (indexed palette — lossless), and sampleGifFrames genuinely walks
      // the container with the JDK ImageIO reader, decoding every 2nd
      // frame. The oracle predicts frame count, geometry, and exact
      // per-channel means arithmetically.
      import s.implicits._
      val vids = T(s, dir, "documents").select(col("doc_id"), col("n_chars"))
        .as[(Long, Long)].mapPartitions(_.map { case (id, nc) =>
          val nFrames = (nc % 5 + 2).toInt
          val colors = (0 until nFrames).map { i =>
            val r = ((id + 37L * i) % 256).toInt
            val g = ((nc + 11L * i) % 256).toInt
            val b = (29 * i + 7) % 256
            (r << 16) | (g << 8) | b
          }
          (id, Multimodal.synthGif((id % 8 + 1).toInt, 3, colors))
        }).toDF("doc_id", "payload")
      Multimodal.sampleGifFrames(vids, "doc_id", step = 2)
        .orderBy("doc_id", "frame_idx")
    }),
    "q140_token_entropy" -> ((s, dir) =>
      // repetition/gibberish curation signal: per-doc token-distribution
      // entropy, float sum folded in sorted token order on both engines
      TextAnalysis.tokenEntropy(T(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id")),
    "q141_incremental_neardup" -> ((s, dir) => {
      // production dedup shape: the existing corpus's banded MinHash index
      // is probed by the new batch — (existing, new) candidates only, the
      // index never self-joins, recomputation stays linear in the batch
      val docs = T(s, dir, "documents")
      val index = Dedup.bandedSignatures(docs.filter(col("doc_id") < 400),
        "doc_id", "text", shingleK = 2, numHashes = 16, bands = 8)
      Dedup.probeNearDup(index, docs.filter(col("doc_id") >= 400),
        "doc_id", "text", shingleK = 2, numHashes = 16, bands = 8,
        threshold = 0.25)
        .orderBy("existing_id", "new_id")
    }),
    "q114_stream_outer_join" -> ((s, dir) =>
      // outer stream-stream attribution: unmatched purchases survive as
      // null-extended rows, flushed deterministically by watermark sentinels
      // (Streaming.scala); oracle = the batch LEFT JOIN twin
      Streaming.streamOuterAttribution(s, dir, s"$TMP/q114_src")
        // null view_id sorts differently in the two engines — make the
        // gate order explicit: nulls first, like Spark's asc default
        .orderBy(col("purchase_id"), col("view_id").asc_nulls_first)),
    "q128_doc_chunking" -> ((s, dir) =>
      // sliding context-window chunking (size 20, stride 15 → overlap 5):
      // one map-side pass, the fan-out happens after column pruning
      Curation.chunkDocuments(T(s, dir, "documents"), "doc_id", "text",
        chunkSize = 20, stride = 15)
        .orderBy("doc_id", "chunk_id")),
    "q129_forward_fill" -> ((s, dir) =>
      // dense series from sparse observations: `value` is only meaningful on
      // purchase events here; carry the last purchase value forward per user
      Relational.forwardFill(
        T(s, dir, "events").withColumn("__sparse",
          when(col("event_type") === "purchase", col("value"))),
        "user_id", "ts", "event_id", "__sparse")
        .select(col("event_id"), col("user_id"), col("ts"), col("filled_value"))
        .orderBy("event_id")),
    "q130_unicode_normalize" -> ((s, dir) => {
      // NFC canonical composition (native codegen'd Expression). The ASCII
      // testdata normalizes to itself, so a decomposed suffix (combining
      // acute + diaeresis) is appended to every doc — the char-count drop
      // proves real composition happened, not an identity pass.
      val raw = concat(col("text"), lit(" cafe\u0301 nai\u0308ve"))
      T(s, dir, "documents").select(
        col("doc_id"),
        length(raw).cast("long").as("n_chars_raw"),
        graft.functions.NfcNormalize(raw).as("norm_text"))
        .withColumn("n_chars_norm", length(col("norm_text")).cast("long"))
        .orderBy("doc_id")
    }),
    "q131_attribution" -> ((s, dir) =>
      // first/last-touch journey attribution for converting users — two
      // co-partitioned hash aggs, tie-breaks inside struct min/max (no window)
      Relational.attribution(T(s, dir, "events"),
        "user_id", "ts", "event_id", "event_type", conversionType = "purchase")
        .orderBy("user_id")),
    "q132_manifest_prune" -> ((s, dir) => {
      // file-level min/max data skipping: time-clustered layout (8 range
      // files over 30 days) + manifest consulted on the driver → a 7-day
      // scan opens ~2 of 8 files (StorageSpec asserts the prune count);
      // result ≡ full scan + filter, which is exactly what the oracle runs
      val tmp = s"$TMP/q132_man"
      T(s, dir, "events")
        .repartitionByRange(8, col("ts")).sortWithinPartitions("ts")
        .write.mode("overwrite").parquet(tmp)
      val (pruned, _, _) = graft.storage.Storage.manifestPrunedRange(
        s, tmp, "ts",
        java.sql.Timestamp.valueOf("2024-01-08 00:00:00"),
        java.sql.Timestamp.valueOf("2024-01-15 00:00:00"))
      pruned.select(col("event_id"), col("ts"), col("user_id"), col("event_type"))
        .orderBy("event_id")
    }),
    "q133_compaction" -> ((s, dir) => {
      // lakehouse OPTIMIZE: a fragmented hive layout (16 writer tasks × 30
      // day dirs ≈ 480 small files) compacts to one file per day with the
      // layout — and its pruning — intact; the gate proves row fidelity
      val tmp = s"$TMP/q133_comp"
      T(s, dir, "events")
        .withColumn("day", TextFunctions.dayString(col("ts")))
        .repartition(16)
        .write.mode("overwrite").partitionBy("day").parquet(tmp)
      graft.storage.Storage.compactPartitioned(s, tmp, "day")
      s.read.parquet(tmp)
        .select(col("event_id"), col("user_id"), col("event_type"),
          col("day").cast("string").as("day"))
        .orderBy("event_id")
    }),
    "q134_embed_centroids" -> ((s, dir) =>
      // exact fixed-point class prototypes: posexplode fan-out is map-side,
      // one hash agg reduces to |labels|·dim rows; integer sums commute so
      // the result is partition-order independent (a float avg is not)
      Similarity.labelCentroids(T(s, dir, "embeddings"), "label", "embedding")
        .select(col("label").cast("long").as("label"), col("pos"),
          col("sum_scaled"), col("n"))
        .orderBy("label", "pos")),
    "q135_scd2_lookup" -> ((s, dir) => {
      // the SCD2 consumer: each purchase enriched with the browsing state
      // the user was in AT purchase time (q94 builds the history; this is
      // the join that makes historical attributes honest — joining
      // "current state" instead silently time-travels them backwards)
      val ev = T(s, dir, "events")
      val dim = Warehouse.scd2Compact(
        ev.filter(col("event_type") =!= "purchase")
          .select(col("user_id"), col("event_type"), col("ts"), col("event_id")),
        "user_id", "event_type", "ts", "event_id")
      val facts = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      Warehouse.pointInTimeLookup(facts, dim, "user_id", "ts")
        .select(col("event_id"), col("user_id"), col("ts"),
          col("state").as("state_at_purchase"))
        .orderBy("event_id")
    }),
    "q137_budget_select" -> ((s, dir) =>
      // greedy token-budget curation: best-quality-first cumulative token
      // sum via the two-phase prefix machinery — no global window
      Curation.budgetSelect(T(s, dir, "documents"), "doc_id", "text",
        budget = 100000L)
        .select(col("doc_id"), col("quality"), col("toks"), col("cum_tokens"))
        .orderBy("doc_id")),
    "q138_cluster_split" -> ((s, dir) => {
      // leakage-safe split: assignment hashes the near-dup CLUSTER (shared
      // materialized index), so a training doc's near-copies can never land
      // in the eval split
      val docs = T(s, dir, "documents")
      val (_, comp) = dedupIndex(s, dir)
      Curation.clusterSafeSplit(docs, "doc_id", "n_chars", comp)
        .orderBy("split")
    }),
    "q136_inverted_index" -> ((s, dir) =>
      // IR posting lists over the corpus: term → sorted doc ids + df. The
      // gate row carries the list as a fold fingerprint + end-point docs
      // (q98 convention — array cells don't survive the value comparator),
      // which pins the exact sorted content modulo hash collisions
      TextAnalysis.invertedIndex(T(s, dir, "documents"), "doc_id", "text")
        .select(col("term"), col("df"),
          element_at(col("postings"), 1).as("first_doc"),
          element_at(col("postings"), -1).as("last_doc"),
          expr("aggregate(postings, CAST(0 AS BIGINT)," +
            " (a, x) -> (a * 31 + x) % 1000000007)").as("postings_fp"))
        .orderBy("term"))
  )

  // ------------------------------------------------------------------ oracle

  private val lexValues = Sentiment.lexicon
    .map { case (w, v) => s"('$w', ${math.round(v * 10)})" }.mkString(", ")

  /** The DuckDB twin of [[TextAnalysis.langId]] over an arbitrary string
    * expression (q50 applies it to `text`; q335 to each document half). */
  private def langCaseOn(colExpr: String): String = {
    def hits(l: String) =
      s"CAST(len(regexp_extract_all(lower($colExpr), '\\b(${TextAnalysis.langMarkers(l).mkString("|")})\\b')) AS INTEGER)"
    val best = s"greatest(${Seq("en", "de", "es", "fr").map(hits).mkString(", ")})"
    Seq("en", "de", "es", "fr")
      .map(l => s"WHEN ${hits(l)} = $best AND $best > 0 THEN '$l'")
      .mkString("CASE ", " ", " ELSE 'und' END")
  }

  private val langCase: String = langCaseOn("text")

  /** q416's oracle: the 10 greedy set-cover rounds unrolled (the bpeOracleSql
    * device — each round is the same two CTEs: argmax gain over uncovered
    * doc-token pairs, then the covered-vocabulary union). A round with
    * nothing left to cover yields an EMPTY pick CTE, which contributes no
    * row and leaves the covered set unchanged — the engine's conditional
    * append, expressed relationally. */
  /** q417's oracle: q412's exact mutual pairs as truth, then per
    * nprobe ∈ {1, 2, 4, 8} the IVF-probed mutual pairs — assignment is
    * crn = 1, probing crn ≤ nprobe over ONE shared centroid-ranking CTE —
    * and the hit count against truth. Everything is MATERIALIZED: the
    * ranking frame is referenced by all eight direction passes and an
    * inlining planner would re-evaluate it per reference. */
  private val q417Sql: String = {
    def stage(np: Int): String =
      s"""f$np AS MATERIALIZED (SELECT x, y FROM (
         |  SELECT qp.vec_id AS x, a.vec_id AS y,
         |    row_number() OVER (PARTITION BY qp.vec_id ORDER BY
         |      list_dot_product(qv.vv, av.vv) / (sqrt(list_dot_product(qv.vv, qv.vv)) * sqrt(list_dot_product(av.vv, av.vv))) DESC,
         |      a.vec_id) AS rn
         |  FROM (SELECT cr.vec_id, cr.cell FROM cr JOIN xs USING (vec_id) WHERE crn <= $np) qp
         |  JOIN ya a ON a.cell = qp.cell
         |  JOIN vecs qv ON qv.vec_id = qp.vec_id
         |  JOIN vecs av ON av.vec_id = a.vec_id) WHERE rn = 1),
         |b$np AS MATERIALIZED (SELECT y, bx FROM (
         |  SELECT qp.vec_id AS y, a.vec_id AS bx,
         |    row_number() OVER (PARTITION BY qp.vec_id ORDER BY
         |      list_dot_product(qv.vv, av.vv) / (sqrt(list_dot_product(qv.vv, qv.vv)) * sqrt(list_dot_product(av.vv, av.vv))) DESC,
         |      a.vec_id) AS rn
         |  FROM (SELECT cr.vec_id, cr.cell FROM cr
         |    JOIN (SELECT DISTINCT y FROM f$np) fy ON fy.y = cr.vec_id
         |    WHERE crn <= $np) qp
         |  JOIN xa a ON a.cell = qp.cell
         |  JOIN vecs qv ON qv.vec_id = qp.vec_id
         |  JOIN vecs av ON av.vec_id = a.vec_id) WHERE rn = 1),
         |m$np AS MATERIALIZED (SELECT f.x, f.y FROM f$np f JOIN b$np b USING (y) WHERE b.bx = f.x)""".stripMargin
    def row(np: Int): String =
      s"""SELECT CAST($np AS BIGINT) AS nprobe,
         |  (SELECT count(*) FROM m$np) AS n_pairs,
         |  (SELECT count(*) FROM m$np mm JOIN ex USING (x, y)) AS hits,
         |  nex.n AS n_exact,
         |  (round(CAST((SELECT count(*) FROM m$np mm JOIN ex USING (x, y)) AS DOUBLE) / greatest(nex.n, 1), 4) + 0.0) AS recall
         |FROM nex""".stripMargin
    s"""WITH vecs AS MATERIALIZED (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vv FROM embeddings),
       |xs AS MATERIALIZED (SELECT vec_id, vv FROM vecs WHERE vec_id % 2 = 0 AND vec_id < 2000),
       |ys AS MATERIALIZED (SELECT vec_id, vv FROM vecs WHERE vec_id % 2 = 1),
       |fs AS (SELECT x.vec_id AS x, y.vec_id AS y,
       |    list_dot_product(x.vv, y.vv) / (sqrt(list_dot_product(x.vv, x.vv)) * sqrt(list_dot_product(y.vv, y.vv))) AS cosine
       |  FROM xs x CROSS JOIN ys y),
       |fe AS MATERIALIZED (SELECT x, y FROM (SELECT x, y,
       |    row_number() OVER (PARTITION BY x ORDER BY cosine DESC, y) AS rn FROM fs)
       |  WHERE rn = 1),
       |bs AS (SELECT b.y, x.vec_id AS bx,
       |    list_dot_product(yv.vv, x.vv) / (sqrt(list_dot_product(yv.vv, yv.vv)) * sqrt(list_dot_product(x.vv, x.vv))) AS cosine
       |  FROM (SELECT DISTINCT y FROM fe) b JOIN ys yv ON yv.vec_id = b.y CROSS JOIN xs x),
       |be AS MATERIALIZED (SELECT y, bx FROM (SELECT y, bx,
       |    row_number() OVER (PARTITION BY y ORDER BY cosine DESC, bx) AS rn FROM bs)
       |  WHERE rn = 1),
       |ex AS MATERIALIZED (SELECT fe.x, fe.y FROM fe JOIN be USING (y) WHERE be.bx = fe.x),
       |nex AS MATERIALIZED (SELECT count(*) AS n FROM ex),
       |cent AS MATERIALIZED (SELECT vec_id AS cell, vv AS cv FROM vecs
       |  WHERE vec_id >= 100 AND vec_id < 116),
       |cr AS MATERIALIZED (SELECT v.vec_id, c.cell,
       |    row_number() OVER (PARTITION BY v.vec_id ORDER BY
       |      list_dot_product(v.vv, c.cv) / (sqrt(list_dot_product(v.vv, v.vv)) * sqrt(list_dot_product(c.cv, c.cv))) DESC,
       |      c.cell) AS crn
       |  FROM vecs v CROSS JOIN cent c),
       |ya AS MATERIALIZED (SELECT cr.vec_id, cr.cell FROM cr JOIN ys USING (vec_id) WHERE crn = 1),
       |xa AS MATERIALIZED (SELECT cr.vec_id, cr.cell FROM cr JOIN xs USING (vec_id) WHERE crn = 1),
       |${Seq(1, 2, 4, 8).map(stage).mkString(",\n")}
       |${Seq(1, 2, 4, 8).map(row).mkString("\nUNION ALL\n")}
       |ORDER BY nprobe""".stripMargin
  }

  private val q416Sql: String = {
    // AS MATERIALIZED throughout: each c_k is referenced by BOTH p_{k+1}
    // and c_{k+1}, and an inlining planner re-evaluates the whole chain
    // per reference — exponential in rounds (measured: the inlined form
    // crawls, the materialized form runs in seconds)
    val steps = (1 to 10).map { k =>
      val gain =
        if (k == 1)
          s"p1 AS MATERIALIZED (SELECT doc_id, count(*) AS g FROM pairs GROUP BY 1 ORDER BY g DESC, doc_id LIMIT 1)"
        else
          s"p$k AS MATERIALIZED (SELECT pr.doc_id, count(*) AS g FROM pairs pr LEFT JOIN c${k - 1} cv ON pr.tok = cv.tok WHERE cv.tok IS NULL GROUP BY 1 ORDER BY g DESC, pr.doc_id LIMIT 1)"
      val cover =
        if (k == 1)
          s"c1 AS MATERIALIZED (SELECT DISTINCT pr.tok FROM pairs pr JOIN p1 USING (doc_id))"
        else
          s"c$k AS MATERIALIZED (SELECT tok FROM c${k - 1} UNION SELECT pr.tok FROM pairs pr JOIN p$k USING (doc_id))"
      s"$gain,\n$cover"
    }.mkString(",\n")
    val sel = (1 to 10)
      .map(k => s"SELECT $k AS step, doc_id, g FROM p$k")
      .mkString("\nUNION ALL ")
    s"""WITH toks AS MATERIALIZED (SELECT doc_id,
       |    list_filter(regexp_split_to_array(lower(text), '\\s+'),
       |      t -> length(t) > 0) AS arr FROM documents),
       |pairs AS MATERIALIZED (SELECT DISTINCT doc_id,
       |    unnest(list_transform(range(1, len(arr)),
       |      i -> arr[i] || ' ' || arr[i + 1])) AS tok FROM toks),
       |$steps,
       |sel AS ($sel)
       |SELECT CAST(step AS BIGINT) AS step, doc_id, CAST(g AS BIGINT) AS gain,
       |  CAST(sum(g) OVER (ORDER BY step) AS BIGINT) AS covered_total
       |FROM sel ORDER BY step""".stripMargin
  }

  /** q389's oracle: the same transition tallies, then 5 chains (base + one
    * per removed channel) of 8 unrolled fixed-point steps in exact
    * millionth integer arithmetic — p' = b + ⌊Q·p/10⁶⌋, generated
    * programmatically because the recurrence is the same three lines per
    * step. A chain's state list excludes its removed channel, so the
    * p-join naturally drops transitions into it (≡ absorbing to null). */
  private val q389Sql: String = {
    val channels = Seq("click", "error", "signup", "view")
    def chain(tag: String, removed: Option[String]): String = {
      val sts = Seq("start", "view", "click", "signup", "error")
        .filterNot(removed.contains)
      val stList = sts.map(x => s"('$x')").mkString(", ")
      val b =
        s"""b_$tag AS MATERIALIZED (SELECT s.st, COALESCE(q.ps, 0) AS bm
           |  FROM (SELECT * FROM (VALUES $stList) s(st)) s
           |  LEFT JOIN q ON q.f = s.st AND q.t = 'purchase'),
           |p_${tag}_1 AS MATERIALIZED (SELECT st, CAST(bm AS BIGINT) AS v FROM b_$tag)""".stripMargin
      val steps = (2 to 8).map { k =>
        s"""p_${tag}_$k AS MATERIALIZED (SELECT b.st, CAST(b.bm + COALESCE(sum(q.ps * p.v), 0) // 1000000 AS BIGINT) AS v
           |  FROM b_$tag b LEFT JOIN q ON q.f = b.st
           |  LEFT JOIN p_${tag}_${k - 1} p ON p.st = q.t
           |  GROUP BY b.st, b.bm)""".stripMargin
      }
      (b +: steps).mkString(",\n")
    }
    val chains = (chain("base", None) +:
      channels.map(c => chain(c, Some(c)))).mkString(",\n")
    val res = channels.map { c =>
      s"""SELECT '$c' AS channel,
         |  (SELECT v FROM p_base_8 WHERE st = 'start') AS pb,
         |  (SELECT v FROM p_${c}_8 WHERE st = 'start') AS pr""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH o AS MATERIALIZED (SELECT user_id, event_type,
       |    row_number() OVER (PARTITION BY user_id
       |      ORDER BY CAST(ts AS TIMESTAMP), event_id) AS ord
       |  FROM events WHERE user_id IS NOT NULL),
       |fp AS MATERIALIZED (SELECT user_id, min(ord) AS po FROM o
       |  WHERE event_type = 'purchase' GROUP BY 1),
       |tr AS MATERIALIZED (SELECT o.user_id, o.event_type, o.ord FROM o
       |  LEFT JOIN fp USING (user_id) WHERE fp.po IS NULL OR o.ord <= fp.po),
       |nx AS MATERIALIZED (SELECT user_id, event_type AS f, ord,
       |    COALESCE(lead(event_type) OVER (PARTITION BY user_id ORDER BY ord),
       |      'end') AS t FROM tr),
       |tal AS MATERIALIZED (SELECT f, t, count(*) AS c FROM nx WHERE f <> 'purchase' GROUP BY 1, 2
       |  UNION ALL
       |  SELECT 'start' AS f, event_type AS t, count(*) AS c FROM tr
       |  WHERE ord = 1 GROUP BY 1, 2),
       |tot AS MATERIALIZED (SELECT f, sum(c) AS tc FROM tal GROUP BY 1),
       |q AS MATERIALIZED (SELECT tal.f, tal.t, CAST(c * 1000000 // tc AS BIGINT) AS ps
       |  FROM tal JOIN tot USING (f)),
       |$chains,
       |res AS MATERIALIZED (
       |$res),
       |sm AS MATERIALIZED (SELECT greatest(sum(pb - pr), 1) AS sd FROM res)
       |SELECT channel, pb AS p_base_ppm, pr AS p_removed_ppm,
       |  CAST(pb - pr AS BIGINT) AS diff_ppm,
       |  CAST((pb - pr) * 10000 // sm.sd AS BIGINT) AS share_bp
       |FROM res CROSS JOIN sm ORDER BY channel""".stripMargin
  }

  /** DuckDB Karp–Rabin fold of a string expression — mirrors
    * [[graft.functions.RollingHash.hash64]] byte-for-byte on ASCII corpora
    * (the testdata; unicode parity is unit-tested Spark-side). Empty → 0,
    * matching the Scala fold over zero bytes. */
  private def krSql(e: String): String =
    s"(CASE WHEN length($e) = 0 THEN CAST(0 AS BIGINT) ELSE list_reduce(" +
      s"list_transform(range(1, length($e) + 1), i -> CAST(ord(substr($e, CAST(i AS INT), 1)) AS BIGINT)), " +
      s"(a, b) -> (a * 31 + b) % 1000000007) END)"

  /** DuckDB twin of [[Dedup.minHashNearDup]] (shingleK=2, numHashes=16,
    * bands=8, threshold 0.25) — generated with the same [[HashFamily]]
    * constants the Spark side uses, so signatures/bands/estimates agree
    * bit-for-bit. */
  private val q44Sql: String = {
    import graft.functions.HashFamily
    val sigCols = (0 until 16).map(i => s"min(${HashFamily.affineSql(i, "x")}) AS h$i").mkString(", ")
    val bandKey = (0 until 8).map(b => s"WHEN $b THEN h${2 * b} || ',' || h${2 * b + 1}").mkString(" ")
    val bandVals = (0 until 8).map(b => s"($b)").mkString(", ")
    val agree = (0 until 16).map(i => s"(CASE WHEN a.h$i = b.h$i THEN 1 ELSE 0 END)").mkString(" + ")
    s"""WITH ws AS (SELECT doc_id, regexp_split_to_array(lower(text), '\\s+') AS w FROM documents),
       |sh AS (SELECT DISTINCT doc_id, w[CAST(i AS BIGINT)] || ' ' || w[CAST(i AS BIGINT) + 1] AS shingle
       |  FROM ws, LATERAL (SELECT unnest(range(1, len(w))) AS i) t),
       |rh AS (SELECT doc_id, ${krSql("shingle")} AS x FROM sh),
       |sig AS (SELECT doc_id, $sigCols FROM rh GROUP BY doc_id),
       |banded AS (SELECT doc_id, t.band, CASE t.band $bandKey END AS bkey
       |  FROM sig, (VALUES $bandVals) AS t(band)),
       |cand AS (SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
       |  FROM banded x JOIN banded y ON x.band = y.band AND x.bkey = y.bkey AND x.doc_id < y.doc_id),
       |est AS (SELECT id_a, id_b, ($agree) AS agree
       |  FROM cand JOIN sig a ON a.doc_id = cand.id_a JOIN sig b ON b.doc_id = cand.id_b)
       |SELECT id_a, id_b, (round(CAST(agree AS DOUBLE) / 16, 4) + 0.0) AS est_jaccard FROM est
       |WHERE (round(CAST(agree AS DOUBLE) / 16, 4) + 0.0) >= 0.25 ORDER BY id_a, id_b""".stripMargin
  }

  /** Connected-component labels for oracle SQL WITHOUT a recursive
    * transitive closure. The classic `conn(a, b)` CTE enumerates every
    * (node, reachable-node) pair — Σ|component|² rows; measured 454 s on
    * the sf1 replay's 161k-pair near-dup graph even with the pair list
    * pre-staged, which is why the sf1 gate could never see these keys.
    * This emits the EQUIVALENT min-label fixpoint, unrolled: each round
    * takes min over {self, neighbors' labels, label's label} — the last
    * term is POINTER JUMPING, so the label horizon grows exponentially
    * and `rounds` = 12 converges for any component diameter ≤ ~2¹².
    * Every CTE is AS MATERIALIZED: each is referenced 3× by the next
    * round and an inlining planner would re-evaluate the chain
    * exponentially (the q416 lesson). Convergence is SELF-CHECKING at the
    * gate: an unconverged label differs from the engine's star-merge
    * fixpoint and fails the value compare loudly — it can time out or
    * mismatch, never silently pass wrong.
    * Expects a symmetric `e(src, dst)` CTE in scope; emits `l0..l<rounds>`
    * with `l<rounds>(node, lab)` the converged (node, component-min). */
  private val ccRounds = 12
  private def minLabelCc(rounds: Int = ccRounds): String =
    ((s"l0 AS MATERIALIZED (SELECT src AS node, least(src, min(dst)) AS lab" +
      " FROM e GROUP BY src)") +: (1 to rounds).map { k =>
      s"""l$k AS MATERIALIZED (SELECT node, min(lab) AS lab FROM (
         |    SELECT node, lab FROM l${k - 1}
         |    UNION ALL SELECT e.src, p.lab FROM e JOIN l${k - 1} p ON p.node = e.dst
         |    UNION ALL SELECT a.node, b.lab FROM l${k - 1} a JOIN l${k - 1} b ON b.node = a.lab
         |  ) GROUP BY node)""".stripMargin
    }).mkString(",\n")

  /** q348's oracle: q44's signature/band CTEs, then per-band bucket-size
    * aggregation — the exact candidate-pair volume Σ n(n−1)/2. The string
    * band key (h₂ᵦ || ',' || h₂ᵦ₊₁) buckets identically to the engine's
    * injective numeric band_hash (h·p + h' with h < p). */
  private val q348Sql: String = {
    import graft.functions.HashFamily
    val sigCols = (0 until 16).map(i => s"min(${HashFamily.affineSql(i, "x")}) AS h$i").mkString(", ")
    val bandKey = (0 until 8).map(b => s"WHEN $b THEN h${2 * b} || ',' || h${2 * b + 1}").mkString(" ")
    val bandVals = (0 until 8).map(b => s"($b)").mkString(", ")
    s"""WITH ws AS (SELECT doc_id, regexp_split_to_array(lower(text), '\\s+') AS w FROM documents),
       |sh AS (SELECT DISTINCT doc_id, w[CAST(i AS BIGINT)] || ' ' || w[CAST(i AS BIGINT) + 1] AS shingle
       |  FROM ws, LATERAL (SELECT unnest(range(1, len(w))) AS i) t),
       |rh AS (SELECT doc_id, ${krSql("shingle")} AS x FROM sh),
       |sig AS (SELECT doc_id, $sigCols FROM rh GROUP BY doc_id),
       |banded AS (SELECT doc_id, t.band, CASE t.band $bandKey END AS bkey
       |  FROM sig, (VALUES $bandVals) AS t(band)),
       |bk AS (SELECT band, bkey, count(*) AS n FROM banded GROUP BY 1, 2)
       |SELECT CAST(band AS BIGINT) AS band, CAST(count(*) AS BIGINT) AS n_buckets,
       |  CAST(max(n) AS BIGINT) AS max_bucket,
       |  CAST(sum(n * (n - 1) // 2) AS BIGINT) AS candidate_pairs
       |FROM bk GROUP BY band ORDER BY band""".stripMargin
  }

  /** Per-SOURCE sketch comparison (q293): q44's signature CTEs grouped by
    * source instead of doc, pairwise agreement on the sources frame. */
  private val q293Sql: String = {
    import graft.functions.HashFamily
    val sigCols = (0 until 16).map(i => s"min(${HashFamily.affineSql(i, "x")}) AS h$i").mkString(", ")
    val agree = (0 until 16).map(i => s"(CASE WHEN a.h$i = b.h$i THEN 1 ELSE 0 END)").mkString(" + ")
    s"""WITH ws AS (SELECT source, regexp_split_to_array(lower(text), '\\s+') AS w FROM documents),
       |sh AS (SELECT DISTINCT source, w[CAST(i AS BIGINT)] || ' ' || w[CAST(i AS BIGINT) + 1] AS shingle
       |  FROM ws, LATERAL (SELECT unnest(range(1, len(w))) AS i) t),
       |rh AS (SELECT source, ${krSql("shingle")} AS x FROM sh),
       |sig AS (SELECT source, $sigCols FROM rh GROUP BY source),
       |p AS (SELECT a.source AS src_a, b.source AS src_b, ($agree) AS agree
       |  FROM sig a JOIN sig b ON a.source < b.source)
       |SELECT src_a, src_b, CAST(agree AS BIGINT) AS agree,
       |  (round(CAST(agree AS DOUBLE) / 16, 4) + 0.0) AS est_jaccard
       |FROM p ORDER BY src_a, src_b""".stripMargin
  }

  /** q295's oracle: the q288 moment CTEs (both triangle halves), the same
    * 1e-5-unit correlation quantization, and 8 UNROLLED power-iteration
    * steps generated by the same loop bounds the Spark side runs — every
    * step is integer arithmetic (the `//` on non-negative abs matches
    * Spark's `div`), so the final vector matches bit-for-bit. */
  /** The shared power-iteration CTE chain ([[topPrincipalDirection]]'s
    * oracle twin): moments → 1e-5-unit correlation → 8 unrolled exact
    * integer iterations, ending at `v8` (the direction) and `m8` (the
    * growth factor). q295 reads it directly; q299 projects the corpus
    * onto `v8`. */
  private val powerIterCte: String = {
    val iters = (1 to 8).map { t =>
      val pv = if (t == 1) "v0" else s"v${t - 1}"
      s"""w$t AS (SELECT corr.i, CAST(sum(corr.r * $pv.v) AS BIGINT) AS w
         |  FROM corr JOIN $pv ON $pv.j = corr.j GROUP BY 1),
         |m$t AS (SELECT max(abs(w)) AS m FROM w$t),
         |v$t AS (SELECT w$t.i AS j,
         |  CAST((CASE WHEN w < 0 THEN -1 ELSE 1 END) * ((abs(w) * 1000000) // m$t.m) AS BIGINT) AS v
         |  FROM w$t, m$t)""".stripMargin
    }.mkString(",\n")
    s"""vecs AS (SELECT CAST(embedding AS DOUBLE[]) AS vv FROM embeddings),
       |m AS (SELECT list_transform(range(0, 16),
       |    k -> CAST(round(vv[CAST(k * 4 + 1 AS INT)] * 1000000) AS BIGINT)) AS p FROM vecs),
       |pr AS (SELECT CAST(i.k AS BIGINT) AS i, CAST(j.k AS BIGINT) AS j,
       |    p[CAST(i.k + 1 AS INT)] AS mi, p[CAST(j.k + 1 AS INT)] AS mj
       |  FROM m, LATERAL (SELECT unnest(range(0, 16)) AS k) i,
       |    LATERAL (SELECT unnest(range(0, 16)) AS k) j),
       |c AS (SELECT i, j,
       |    CAST(sum(mi * mj) AS DOUBLE) / CAST(count(*) AS DOUBLE)
       |      - (CAST(sum(mi) AS DOUBLE) / CAST(count(*) AS DOUBLE))
       |        * (CAST(sum(mj) AS DOUBLE) / CAST(count(*) AS DOUBLE)) AS c
       |  FROM pr GROUP BY 1, 2),
       |vd AS (SELECT i, c AS vc FROM c WHERE i = j),
       |corr AS (SELECT c.i, c.j,
       |    CAST(round(c.c / sqrt(va.vc * vb.vc) * 100000) AS BIGINT) AS r
       |  FROM c JOIN vd va ON va.i = c.i JOIN vd vb ON vb.i = c.j),
       |v0 AS (SELECT CAST(unnest(range(0, 16)) AS BIGINT) AS j, CAST(1000000 AS BIGINT) AS v),
       |$iters""".stripMargin
  }

  private val q295Sql: String =
    s"""WITH $powerIterCte
       |SELECT CAST(v8.j AS BIGINT) AS pos, v8.v AS v_micro, CAST(m8.m AS BIGINT) AS growth
       |FROM v8, m8 ORDER BY pos""".stripMargin

  /** q299's oracle: the same power-iteration direction, then the corpus
    * projection n·⟨x,u⟩ − ⟨Σx,u⟩ in exact longs (no mean division —
    * centered via the sum so there is no negative-division rounding to
    * disagree on), top 20 by |projection|. */
  private val q299Sql: String =
    s"""WITH $powerIterCte,
       |mm AS (SELECT vec_id, list_transform(range(0, 16),
       |    k -> CAST(round(vv[CAST(k * 4 + 1 AS INT)] * 1000000) AS BIGINT)) AS p
       |  FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vv FROM embeddings)),
       |ex AS (SELECT vec_id, CAST(i.k AS BIGINT) AS i, p[CAST(i.k + 1 AS INT)] AS mi
       |  FROM mm, LATERAL (SELECT unnest(range(0, 16)) AS k) i),
       |st AS (SELECT i, count(*) AS n, CAST(sum(mi) AS BIGINT) AS si FROM ex GROUP BY 1),
       |tv AS (SELECT ex.vec_id,
       |    CAST(sum((CAST(st.n AS BIGINT) * ex.mi - st.si) * v8.v) AS BIGINT) AS tn
       |  FROM ex JOIN st ON st.i = ex.i JOIN v8 ON v8.j = ex.i GROUP BY 1)
       |SELECT CAST(row_number() OVER (ORDER BY abs(tn) DESC, vec_id) AS BIGINT) AS rk,
       |  CAST(vec_id AS BIGINT) AS vec_id, tn
       |FROM tv ORDER BY abs(tn) DESC, vec_id LIMIT 20""".stripMargin

  /** q304's oracle: the same normalize-once subvector preparation (so the
    * float op sequence — per-element cast, divide-by-norm, then a plain
    * dot — is identical on both engines), the same 16 dots, the same
    * fixed-order (((m1+m2)+m3)+m4 fold, generated by the same loop
    * bounds. */
  /** q317's batch changelog fold — latest-op-wins stated as the rank
    * window the engine's one-aggregate max(struct) replaces. Shared with
    * q339, whose streamed merge chain must land on the identical final
    * state (the incremental ≡ batch proof). */
  private val q317Sql: String =
    """WITH base AS (SELECT c_custkey,
      |    CAST(round(c_acctbal * 100, 0) AS BIGINT) AS cents,
      |    c_mktsegment AS segment FROM customer),
      |log AS (
      |  SELECT c_custkey, 0 AS seq, 'I' AS op, cents, segment FROM base
      |  UNION ALL SELECT c_custkey, 1, 'U', cents + 1000, segment FROM base WHERE c_custkey % 7 = 0
      |  UNION ALL SELECT c_custkey, 2, 'D', cents, segment FROM base WHERE c_custkey % 10 = 0
      |  UNION ALL SELECT c_custkey, 3, 'I', 555, 'WINBACK' FROM base WHERE c_custkey % 20 = 0),
      |r AS (SELECT *, row_number() OVER (PARTITION BY c_custkey ORDER BY seq DESC) AS rn FROM log)
      |SELECT c_custkey, CAST(cents AS BIGINT) AS cents, segment
      |FROM r WHERE rn = 1 AND op <> 'D' ORDER BY c_custkey""".stripMargin

  private val q304Sql: String = {
    val gi = (i: Int) =>
      (1 to 4).map(j => s"list_dot_product(q.qn[$i], c.cn[$j])")
        .mkString("greatest(", ", ", ")")
    s"""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vv FROM embeddings),
       |sub AS (SELECT vec_id, [vv[1:16], vv[17:32], vv[33:48], vv[49:64]] AS ss FROM v),
       |nrm AS (SELECT vec_id, list_transform(ss,
       |    sv -> list_transform(sv, x -> x / sqrt(list_dot_product(sv, sv)))) AS nn FROM sub),
       |q AS (SELECT vec_id AS query_id, nn AS qn FROM nrm WHERE vec_id < 8),
       |c AS (SELECT vec_id AS neighbor_id, nn AS cn FROM nrm),
       |sc AS (SELECT query_id, neighbor_id,
       |    (((${gi(1)} + ${gi(2)}) + ${gi(3)}) + ${gi(4)}) AS score
       |  FROM c CROSS JOIN q WHERE neighbor_id <> query_id),
       |r AS (SELECT query_id, neighbor_id, score,
       |  CAST(row_number() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS BIGINT) AS rn FROM sc)
       |SELECT query_id, neighbor_id, (round(score, 4) + 0.0) AS maxsim, rn
       |FROM r WHERE rn <= 5 ORDER BY query_id, rn""".stripMargin
  }

  /** q307's oracle: q302's IVF structure (assignment crn = 1, probes
    * crn ≤ 2) and the brute-force truth, each repeated per selectivity
    * leg with the predicate applied to the SAME side the engine applies
    * it (the filtered corpus) — generated by the same leg list the Spark
    * side runs. */
  private val q307Sql: String = {
    val cos = (a: String, b: String) =>
      s"list_dot_product($a, $b) / (sqrt(list_dot_product($a, $a)) * sqrt(list_dot_product($b, $b)))"
    val legs = Seq[(String, String => String)](
      ("all", _ => "1 = 1"),
      ("half", a => s"$a.label <= 1"),
      ("quarter", a => s"$a.label = 2"))
    val legCtes = legs.map { case (name, pred) =>
      s"""iv_$name AS (SELECT query_id, neighbor_id FROM (
         |    SELECT q.query_id, a.vec_id AS neighbor_id,
         |      row_number() OVER (PARTITION BY q.query_id ORDER BY ${cos("q.qv", "a.vv")} DESC, a.vec_id) AS rn
         |    FROM q JOIN asg a ON a.cell = q.cell AND a.vec_id <> q.query_id WHERE ${pred("a")})
         |  WHERE rn <= 5),
         |tr_$name AS (SELECT query_id, neighbor_id FROM (
         |    SELECT qq.vec_id AS query_id, n.vec_id AS neighbor_id,
         |      row_number() OVER (PARTITION BY qq.vec_id ORDER BY ${cos("qq.vv", "n.vv")} DESC, n.vec_id) AS rn
         |    FROM vecs qq CROSS JOIN vecs n
         |    WHERE qq.vec_id < 8 AND n.vec_id <> qq.vec_id AND ${pred("n")})
         |  WHERE rn <= 5),
         |h_$name AS (SELECT '$name' AS leg, count(*) AS hits FROM iv_$name i
         |  JOIN tr_$name t ON t.query_id = i.query_id AND t.neighbor_id = i.neighbor_id)""".stripMargin
    }.mkString(",\n")
    val union = legs.map { case (name, _) => s"SELECT * FROM h_$name" }.mkString(" UNION ALL ")
    s"""WITH vecs AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS vv FROM embeddings),
       |cent AS (SELECT vec_id AS cell, vv AS cv FROM vecs WHERE vec_id < 16),
       |scored AS (SELECT x.vec_id, x.vv, c.cell,
       |  row_number() OVER (PARTITION BY x.vec_id ORDER BY ${cos("x.vv", "c.cv")} DESC, c.cell) AS crn
       |  FROM vecs x CROSS JOIN cent c),
       |asg AS (SELECT s0.vec_id, v0.label, s0.vv, s0.cell FROM scored s0
       |  JOIN vecs v0 ON v0.vec_id = s0.vec_id WHERE s0.crn = 1),
       |q AS (SELECT vec_id AS query_id, vv AS qv, cell FROM scored WHERE vec_id < 8 AND crn <= 2),
       |$legCtes,
       |u AS ($union),
       |nq AS (SELECT count(*) AS n FROM vecs WHERE vec_id < 8)
       |SELECT u.leg, CAST(nq.n AS BIGINT) AS n_queries, CAST(u.hits AS BIGINT) AS hits,
       |  (round(CAST(u.hits AS DOUBLE) / (CAST(nq.n AS DOUBLE) * 5), 4) + 0.0) AS recall
       |FROM u, nq ORDER BY u.leg""".stripMargin
  }

  /** q300's oracle: per prefix width d, the same double-cosine ranking on
    * the sliced vectors (DuckDB `vv[1:d]` ≡ Spark `slice(v, 1, d)`; the
    * float→double element casts agree), intersected with the full-width
    * top-5 — generated per leg by the same loop bounds the Spark side
    * runs. */
  private val q300Sql: String = {
    val dims = Seq(8, 16, 32)
    val legs = dims.map { d =>
      s"""p$d AS (SELECT query_id, neighbor_id, row_number() OVER (PARTITION BY query_id
         |    ORDER BY list_dot_product(qv[1:$d], cv[1:$d]) /
         |      (sqrt(list_dot_product(qv[1:$d], qv[1:$d])) * sqrt(list_dot_product(cv[1:$d], cv[1:$d]))) DESC,
         |    neighbor_id) AS rn FROM s),
         |mt$d AS (SELECT $d AS dims, count(*) AS matched FROM p$d
         |  JOIN f ON f.query_id = p$d.query_id AND f.neighbor_id = p$d.neighbor_id
         |  WHERE p$d.rn <= 5)""".stripMargin
    }.mkString(",\n")
    val union = dims.map(d => s"SELECT * FROM mt$d").mkString(" UNION ALL ")
    s"""WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id < 8),
       |c AS (SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS cv FROM embeddings),
       |s AS (SELECT query_id, neighbor_id, qv, cv FROM c CROSS JOIN q WHERE neighbor_id <> query_id),
       |fr AS (SELECT query_id, neighbor_id, row_number() OVER (PARTITION BY query_id
       |    ORDER BY list_dot_product(qv, cv) / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv))) DESC,
       |    neighbor_id) AS rn FROM s),
       |f AS (SELECT query_id, neighbor_id FROM fr WHERE rn <= 5),
       |nq AS (SELECT count(*) AS n FROM q),
       |$legs,
       |u AS ($union)
       |SELECT CAST(dims AS BIGINT) AS dims, CAST(nq.n AS BIGINT) AS n_queries,
       |  CAST(matched AS BIGINT) AS matched,
       |  (round(CAST(matched AS DOUBLE) / (CAST(nq.n AS DOUBLE) * 5), 4) + 0.0) AS recall
       |FROM u, nq ORDER BY dims""".stripMargin
  }

  /** q296's oracle: 4 unrolled synchronous LPA rounds over the co-purchase
    * edges (both directions via `<>`), most-frequent neighbor label with
    * smallest-label ties — generated by the same loop bounds the Spark
    * side runs. */
  private val q296Sql: String = {
    val rounds = (1 to 4).map { t =>
      val pl = s"l${t - 1}"
      s"""g$t AS (SELECT e.u, l.label, count(*) AS c FROM e JOIN $pl l ON l.node = e.v GROUP BY 1, 2),
         |l$t AS (SELECT u AS node, label FROM (
         |    SELECT u, label, row_number() OVER (PARTITION BY u ORDER BY c DESC, label) AS rn FROM g$t)
         |  WHERE rn = 1)""".stripMargin
    }.mkString(",\n")
    s"""WITH e AS (SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
       |  FROM lineitem a JOIN lineitem b
       |  ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey),
       |l0 AS (SELECT DISTINCT u AS node, u AS label FROM e),
       |$rounds
       |SELECT CAST(node AS BIGINT) AS node, CAST(label AS BIGINT) AS label
       |FROM l4 ORDER BY node""".stripMargin
  }

  /** q141 twin: the q44 signature pipeline with candidates restricted to
    * (existing < 400) × (new ≥ 400) — the incremental probe contract (the
    * index side never self-joins; no ordering filter because the id sets
    * are disjoint). */
  private val q141Sql: String = {
    import graft.functions.HashFamily
    val sigCols = (0 until 16).map(i => s"min(${HashFamily.affineSql(i, "x")}) AS h$i").mkString(", ")
    val bandKey = (0 until 8).map(b => s"WHEN $b THEN h${2 * b} || ',' || h${2 * b + 1}").mkString(" ")
    val bandVals = (0 until 8).map(b => s"($b)").mkString(", ")
    val agree = (0 until 16).map(i => s"(CASE WHEN a.h$i = b.h$i THEN 1 ELSE 0 END)").mkString(" + ")
    s"""WITH ws AS (SELECT doc_id, regexp_split_to_array(lower(text), '\\s+') AS w FROM documents),
       |sh AS (SELECT DISTINCT doc_id, w[CAST(i AS BIGINT)] || ' ' || w[CAST(i AS BIGINT) + 1] AS shingle
       |  FROM ws, LATERAL (SELECT unnest(range(1, len(w))) AS i) t),
       |rh AS (SELECT doc_id, ${krSql("shingle")} AS x FROM sh),
       |sig AS (SELECT doc_id, $sigCols FROM rh GROUP BY doc_id),
       |banded AS (SELECT doc_id, t.band, CASE t.band $bandKey END AS bkey
       |  FROM sig, (VALUES $bandVals) AS t(band)),
       |cand AS (SELECT DISTINCT x.doc_id AS existing_id, y.doc_id AS new_id
       |  FROM banded x JOIN banded y ON x.band = y.band AND x.bkey = y.bkey
       |  WHERE x.doc_id < 400 AND y.doc_id >= 400),
       |est AS (SELECT existing_id, new_id, ($agree) AS agree
       |  FROM cand JOIN sig a ON a.doc_id = cand.existing_id JOIN sig b ON b.doc_id = cand.new_id)
       |SELECT existing_id, new_id, (round(CAST(agree AS DOUBLE) / 16, 4) + 0.0) AS est_jaccard FROM est
       |WHERE (round(CAST(agree AS DOUBLE) / 16, 4) + 0.0) >= 0.25
       |ORDER BY existing_id, new_id""".stripMargin
  }

  /** q230's WITH-chain (shared with q238): multinomial Naive Bayes trained
    * on doc_id % 5 <> 0 — Laplace-smoothed micro-nat weights quantized ONCE
    * per (term, class) cell, exact BIGINT score sums, argmax tie to the
    * greatest label. Ends with CTEs `pred` (doc_id, pred_label,
    * score_micro) and `sc` (the scored split with lang + text). */
  private val nbChainSql: String =
    """WITH tr AS (SELECT doc_id, lang, text FROM documents WHERE doc_id % 5 <> 0),
      |tok AS (SELECT tr.lang AS lab, t.term FROM tr,
      |  LATERAL (SELECT unnest(regexp_split_to_array(lower(text), '\s+')) AS term) t
      |  WHERE length(t.term) > 0),
      |ctc AS (SELECT lab, term, count(*) AS c FROM tok GROUP BY 1, 2),
      |ctot AS (SELECT lab, sum(c) AS n FROM ctc GROUP BY 1),
      |vs AS (SELECT count(DISTINCT term) AS v FROM ctc),
      |w AS (SELECT ct.lab, vo.term,
      |    CAST(round(ln((coalesce(c.c, 0) + 1) / CAST(ct.n + vs.v AS DOUBLE))
      |      * 1000000, 0) AS BIGINT) AS lw
      |  FROM (SELECT DISTINCT term FROM ctc) vo CROSS JOIN ctot ct CROSS JOIN vs
      |  LEFT JOIN ctc c ON c.lab = ct.lab AND c.term = vo.term),
      |pr AS (SELECT lang AS lab, count(*) AS cd FROM tr GROUP BY 1),
      |prior AS (SELECT lab,
      |    CAST(round(ln(CAST(cd AS DOUBLE) / (SELECT sum(cd) FROM pr))
      |      * 1000000, 0) AS BIGINT) AS pm FROM pr),
      |sc AS (SELECT doc_id, lang, text FROM documents WHERE doc_id % 5 = 0),
      |stf AS (SELECT sc.doc_id, t.term, count(*) AS c FROM sc,
      |  LATERAL (SELECT unnest(regexp_split_to_array(lower(text), '\s+')) AS term) t
      |  WHERE length(t.term) > 0 GROUP BY 1, 2),
      |scores AS (SELECT stf.doc_id, w.lab, prior.pm + sum(stf.c * w.lw) AS s
      |  FROM stf JOIN w ON w.term = stf.term JOIN prior ON prior.lab = w.lab
      |  GROUP BY stf.doc_id, w.lab, prior.pm),
      |pred AS (SELECT s.doc_id, max(s.lab) AS pred_label, s.s AS score_micro
      |  FROM scores s JOIN (SELECT doc_id, max(s) AS ms FROM scores GROUP BY 1) b
      |    ON s.doc_id = b.doc_id AND s.s = b.ms
      |  GROUP BY s.doc_id, s.s)""".stripMargin

  private val q230Sql: String =
    s"""$nbChainSql
       |SELECT p.doc_id, p.pred_label, CAST(p.score_micro AS BIGINT) AS score_micro,
       |  p.pred_label = d.lang AS hit
       |FROM pred p JOIN sc d ON d.doc_id = p.doc_id
       |ORDER BY p.doc_id""".stripMargin

  /** q238's oracle: Cohen's kappa between the q50 language heuristic and
    * the q230 NB prediction on the scored split — the rational identity
    * kappa = (n·agree − Σ r·c)/(n² − Σ r·c) on HUGEINT so nothing rounds
    * until the one 4-dp display division. */
  private val q238Sql: String =
    s"""$nbChainSql,
       |hx AS (SELECT doc_id, $langCase AS heur FROM sc),
       |pairs AS (SELECT h.heur AS a, p.pred_label AS b
       |  FROM hx h JOIN pred p USING (doc_id)),
       |tot AS (SELECT count(*) AS n,
       |    sum(CASE WHEN a = b THEN 1 ELSE 0 END) AS ag FROM pairs),
       |ra AS (SELECT a, count(*) AS r FROM pairs GROUP BY 1),
       |cb AS (SELECT b, count(*) AS c FROM pairs GROUP BY 1),
       |pe AS (SELECT coalesce(sum(r * c), 0) AS sm FROM ra JOIN cb ON cb.b = ra.a)
       |SELECT CAST(n AS BIGINT) AS n, CAST(ag AS BIGINT) AS n_agree,
       |  CAST(sm AS BIGINT) AS pe_num,
       |  (round(CAST(CAST(n AS HUGEINT) * ag - sm AS DOUBLE) /
       |    CAST(CAST(n AS HUGEINT) * n - sm AS DOUBLE), 4) + 0.0) AS kappa
       |FROM tot, pe WHERE CAST(n AS HUGEINT) * n > sm""".stripMargin

  /** q233's oracle: the q44 signature pipeline run over the PLANTED corpus
    * (originals < 300 ∪ one-word-appended variants at doc_id + 100000),
    * exact-Jaccard truth restricted to the planted pair mapping (a keyed
    * join, never all-pairs), recall = caught/truth — the dedup family's
    * eval loop, mirroring what q212/q225 do for ANN. */
  private val q233Sql: String = {
    import graft.functions.HashFamily
    val sigCols = (0 until 16).map(i => s"min(${HashFamily.affineSql(i, "x")}) AS h$i").mkString(", ")
    val bandKey = (0 until 8).map(b => s"WHEN $b THEN h${2 * b} || ',' || h${2 * b + 1}").mkString(" ")
    val bandVals = (0 until 8).map(b => s"($b)").mkString(", ")
    val agree = (0 until 16).map(i => s"(CASE WHEN a.h$i = b.h$i THEN 1 ELSE 0 END)").mkString(" + ")
    s"""WITH corp AS (SELECT doc_id, text FROM documents WHERE doc_id < 300
       |  UNION ALL SELECT doc_id + 100000,
       |    array_to_string(wv[1:(len(wv) + 1) // 2], ' ')
       |  FROM (SELECT doc_id, regexp_split_to_array(text, '\\s+') AS wv
       |    FROM documents WHERE doc_id < 300 AND doc_id % 3 = 0)),
       |ws AS (SELECT doc_id, regexp_split_to_array(lower(text), '\\s+') AS w FROM corp),
       |sh AS (SELECT DISTINCT doc_id, w[CAST(i AS BIGINT)] || ' ' || w[CAST(i AS BIGINT) + 1] AS shingle
       |  FROM ws, LATERAL (SELECT unnest(range(1, len(w))) AS i) t),
       |rh AS (SELECT doc_id, ${krSql("shingle")} AS x FROM sh),
       |sig AS (SELECT doc_id, $sigCols FROM rh GROUP BY doc_id),
       |banded AS (SELECT doc_id, t.band, CASE t.band $bandKey END AS bkey
       |  FROM sig, (VALUES $bandVals) AS t(band)),
       |cand AS (SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
       |  FROM banded x JOIN banded y ON x.band = y.band AND x.bkey = y.bkey AND x.doc_id < y.doc_id),
       |est AS (SELECT id_a, id_b, ($agree) AS agree
       |  FROM cand JOIN sig a ON a.doc_id = cand.id_a JOIN sig b ON b.doc_id = cand.id_b),
       |mh AS (SELECT id_a, id_b FROM est
       |  WHERE (round(CAST(agree AS DOUBLE) / 16, 4) + 0.0) >= 0.25),
       |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
       |tshared AS (SELECT x.doc_id AS id_a, y.doc_id AS id_b, count(*) AS shared
       |  FROM sh x JOIN sh y ON y.doc_id = x.doc_id + 100000 AND y.shingle = x.shingle
       |  WHERE x.doc_id < 300 AND x.doc_id % 3 = 0 GROUP BY 1, 2),
       |truth AS (SELECT id_a, id_b FROM tshared
       |  JOIN sizes a ON a.doc_id = id_a JOIN sizes b ON b.doc_id = id_b
       |  WHERE (round(CAST(shared AS DOUBLE) / (a.n + b.n - shared), 4) + 0.0) >= 0.25),
       |caught AS (SELECT t.id_a FROM truth t JOIN mh ON mh.id_a = t.id_a AND mh.id_b = t.id_b)
       |SELECT CAST((SELECT count(*) FROM truth) AS BIGINT) AS n_truth,
       |  CAST((SELECT count(*) FROM caught) AS BIGINT) AS n_caught,
       |  (round(CAST((SELECT count(*) FROM caught) AS DOUBLE) /
       |    (SELECT count(*) FROM truth), 4) + 0.0) AS recall""".stripMargin
  }

  /** q234's oracle: [[bpeEncodeOracleSql]]'s WITH-chain up to the encoded
    * corpus, then tokens-per-word fertility per language — the tokenizer
    * cost curve a multilingual training mix is budgeted by. */
  private def bpeFertilityOracleSql(k: Int): String = {
    val enc = bpeEncodeOracleSql(k)
    val withChain = enc.substring(0, enc.lastIndexOf("\nSELECT doc_id"))
    s"""$withChain,
       |enc AS (SELECT doc_id,
       |    CAST(length(ds) - length(replace(ds, chr(31), '')) AS BIGINT) AS n_bpe
       |  FROM doc$k),
       |wrd AS (SELECT doc_id, lang,
       |    CAST(len(list_filter(regexp_split_to_array(lower(coalesce(text, '')), '\\s+'),
       |      t -> length(t) > 0)) AS BIGINT) AS n_words
       |  FROM documents)
       |SELECT w.lang, CAST(sum(w.n_words) AS BIGINT) AS n_words,
       |  CAST(sum(e.n_bpe) AS BIGINT) AS n_bpe,
       |  (round(CAST(sum(e.n_bpe) AS DOUBLE) / sum(w.n_words), 4) + 0.0) AS fertility
       |FROM wrd w JOIN enc e USING (doc_id)
       |GROUP BY 1 HAVING sum(w.n_words) > 0 ORDER BY 1""".stripMargin
  }

  /** q249's oracle: [[bpeOracleSql]]'s learning chain (b1…b8 on the FULL
    * corpus), then the doc_id < 400 slice encoded incrementally — doc_k is
    * doc_{k-1} with merge b_k applied, so the per-k token totals read
    * straight off the intermediate CTEs (one chain serves every k). */
  private def bpeCurveOracleSql(ks: Seq[Int]): String = {
    val learn = bpeOracleSql(8)
    val withChain = learn.substring(0, learn.lastIndexOf("\nSELECT rank"))
    val doc0 =
      """doc0 AS (SELECT doc_id, array_to_string(list_transform(
        |    list_filter(regexp_split_to_array(lower(coalesce(text, '')), '\s+'),
        |      t -> length(t) > 0),
        |    w -> array_to_string(list_transform(regexp_split_to_array(w, ''),
        |      c -> chr(31) || c || chr(30)), '')), chr(29)) AS ds
        |  FROM documents WHERE doc_id < 400)""".stripMargin
    val docSteps = (1 to 8).map { i =>
      s"""doc$i AS (SELECT doc_id, replace(ds,
         |    chr(31) || b.p1 || chr(30) || chr(31) || b.p2 || chr(30),
         |    chr(31) || b.p1 || b.p2 || chr(30)) AS ds
         |  FROM doc${i - 1}, b$i b)""".stripMargin
    }
    val perK = ks.map(k =>
      s"SELECT CAST($k AS BIGINT) AS k, CAST(sum(length(ds) - " +
        s"length(replace(ds, chr(31), ''))) AS BIGINT) AS n_tokens FROM doc$k")
      .mkString("\nUNION ALL ")
    s"""$withChain,
       |$doc0,
       |${docSteps.mkString(",\n")},
       |nw AS (SELECT CAST(sum(len(list_filter(
       |    regexp_split_to_array(lower(coalesce(text, '')), '\\s+'),
       |    t -> length(t) > 0))) AS BIGINT) AS n_words
       |  FROM documents WHERE doc_id < 400),
       |pk AS ($perK)
       |SELECT k, n_tokens, nw.n_words,
       |  (round(CAST(n_tokens AS DOUBLE) / nw.n_words, 4) + 0.0) AS tokens_per_word
       |FROM pk, nw ORDER BY k""".stripMargin
  }

  /** q250's oracle: the q44 pair list, min-label components via the q77
    * recursive CTE, then Newman Q with the HUGEINT numerator
    * Σ(4·e_c·m − d_c²) over the exact 4m². */
  private val q250Sql: String =
    s"""WITH pairs AS MATERIALIZED ($q44Sql),
       |e AS MATERIALIZED (SELECT id_a AS src, id_b AS dst FROM pairs
       |      UNION SELECT id_b, id_a FROM pairs),
       |${minLabelCc()},
|lab AS (SELECT node, lab AS component FROM l$ccRounds),
       |m AS (SELECT count(*) AS m FROM pairs),
       |deg AS (SELECT src AS node, count(*) AS d FROM e GROUP BY 1),
       |ec AS (SELECT l.component, count(*) AS e_c
       |  FROM pairs p JOIN lab l ON l.node = p.id_a GROUP BY 1),
       |dc AS (SELECT l.component, sum(deg.d) AS d_c
       |  FROM deg JOIN lab l ON l.node = deg.node GROUP BY 1),
       |terms AS (SELECT dc.component, coalesce(ec.e_c, 0) AS e_c, dc.d_c
       |  FROM dc LEFT JOIN ec ON ec.component = dc.component),
       |agg AS (SELECT count(*) AS nc,
       |    sum(4 * CAST(e_c AS HUGEINT) * m.m - CAST(d_c AS HUGEINT) * d_c) AS qnum
       |  FROM terms, m GROUP BY m.m)
       |SELECT CAST(agg.nc AS BIGINT) AS n_components, CAST(m.m AS BIGINT) AS n_edges,
       |  (round(CAST(qnum AS DOUBLE) /
       |    CAST(4 * CAST(m.m AS HUGEINT) * m.m AS DOUBLE), 4) + 0.0) AS modularity
       |FROM agg, m WHERE m.m > 0""".stripMargin

  /** q255's oracle: per-gate survivor counts over the SAME corpus — raw,
    * exact text dedup, and minhash near-dup components (keep one doc per
    * component; docs outside the pair graph survive untouched). */
  private val q255Sql: String =
    s"""WITH pairs AS MATERIALIZED ($q44Sql),
       |e AS MATERIALIZED (SELECT id_a AS src, id_b AS dst FROM pairs
       |      UNION SELECT id_b, id_a FROM pairs),
       |${minLabelCc()},
|lab AS (SELECT node, lab AS component FROM l$ccRounds),
       |n AS (SELECT count(*) AS docs FROM documents),
       |ex AS (SELECT count(DISTINCT text) AS survivors FROM documents),
       |nd AS (SELECT count(*) AS nodes, count(DISTINCT component) AS comps FROM lab),
       |u AS (
       |  SELECT 'a_raw' AS gate, n.docs AS docs_in, n.docs AS survivors FROM n
       |  UNION ALL SELECT 'b_exact_text', n.docs, ex.survivors FROM n, ex
       |  UNION ALL SELECT 'c_minhash_components', n.docs,
       |    n.docs - (nd.nodes - nd.comps) FROM n, nd)
       |SELECT gate, CAST(docs_in AS BIGINT) AS docs_in,
       |  CAST(survivors AS BIGINT) AS survivors,
       |  CAST(docs_in - survivors AS BIGINT) AS removed
       |FROM u ORDER BY gate""".stripMargin

  /** Shared micro-Lloyd CTE chain (q257/q258): comp = 10⁶-quantized
    * components (q235's pattern), c0 = first-4-by-id seeds, then two full
    * assign+update rounds — assignment = exact-long d2 argmin with min-cell
    * tie-break, update = floor(sum/n) — landing at the trained centroid
    * table c2. The chained-CTE unrolling is the q223/q237 convention for
    * fixed-iteration loops. */
  private val lloydCtes: String =
    """comp AS (SELECT vec_id, t.d AS dim,
      |    CAST(round(CAST(embedding[CAST(t.d AS BIGINT)] AS DOUBLE) * 1000000, 0)
      |      AS BIGINT) AS vm
      |  FROM embeddings, LATERAL (SELECT unnest(range(1, len(embedding) + 1)) AS d) t),
      |c0 AS (SELECT vec_id AS cell, dim, vm AS cm FROM comp WHERE vec_id < 4),
      |dd1 AS (SELECT c.vec_id, ct.cell, sum((c.vm - ct.cm) * (c.vm - ct.cm)) AS d2
      |  FROM comp c JOIN c0 ct USING (dim) GROUP BY 1, 2),
      |b1 AS (SELECT vec_id, min(d2) AS md FROM dd1 GROUP BY 1),
      |a1 AS (SELECT d.vec_id, min(d.cell) AS cell FROM dd1 d
      |  JOIN b1 b ON b.vec_id = d.vec_id AND d.d2 = b.md GROUP BY 1),
      |c1 AS (SELECT a.cell, c.dim,
      |    CAST(floor(CAST(sum(c.vm) AS DOUBLE) / count(*)) AS BIGINT) AS cm
      |  FROM comp c JOIN a1 a USING (vec_id) GROUP BY 1, 2),
      |dd2 AS (SELECT c.vec_id, ct.cell, sum((c.vm - ct.cm) * (c.vm - ct.cm)) AS d2
      |  FROM comp c JOIN c1 ct USING (dim) GROUP BY 1, 2),
      |b2 AS (SELECT vec_id, min(d2) AS md FROM dd2 GROUP BY 1),
      |a2 AS (SELECT d.vec_id, min(d.cell) AS cell FROM dd2 d
      |  JOIN b2 b ON b.vec_id = d.vec_id AND d.d2 = b.md GROUP BY 1),
      |c2 AS (SELECT a.cell, c.dim,
      |    CAST(floor(CAST(sum(c.vm) AS DOUBLE) / count(*)) AS BIGINT) AS cm
      |  FROM comp c JOIN a2 a USING (vec_id) GROUP BY 1, 2)""".stripMargin

  /** q257's oracle: the Lloyd chain + a third assignment pass under the
    * trained centroids; per-cell seed/trained occupancy and arrivals. */
  private val q257Sql: String =
    s"""WITH $lloydCtes,
       |dd3 AS (SELECT c.vec_id, ct.cell, sum((c.vm - ct.cm) * (c.vm - ct.cm)) AS d2
       |  FROM comp c JOIN c2 ct USING (dim) GROUP BY 1, 2),
       |b3 AS (SELECT vec_id, min(d2) AS md FROM dd3 GROUP BY 1),
       |a3 AS (SELECT d.vec_id, min(d.cell) AS cell FROM dd3 d
       |  JOIN b3 b ON b.vec_id = d.vec_id AND d.d2 = b.md GROUP BY 1),
       |m AS (SELECT a1.vec_id, a1.cell AS sc, a3.cell AS tc
       |  FROM a1 JOIN a3 USING (vec_id)),
       |tn AS (SELECT tc AS cell, count(*) AS n_trained,
       |    sum(CASE WHEN sc <> tc THEN 1 ELSE 0 END) AS arrivals FROM m GROUP BY 1),
       |sn AS (SELECT sc AS cell, count(*) AS n_seed FROM m GROUP BY 1)
       |SELECT coalesce(tn.cell, sn.cell) AS cell,
       |  CAST(coalesce(n_seed, 0) AS BIGINT) AS n_seed,
       |  CAST(coalesce(n_trained, 0) AS BIGINT) AS n_trained,
       |  CAST(coalesce(arrivals, 0) AS BIGINT) AS arrivals
       |FROM tn FULL JOIN sn ON sn.cell = tn.cell ORDER BY cell""".stripMargin

  /** q258's oracle: the Lloyd chain, both centroid sets re-assembled as
    * cm/10⁶ double lists, the q58-shape cosine search (assign crn = 1,
    * probe crn ≤ 1, cosine over the raw vectors inside matched cells,
    * top-5) run under each, and per-query recall vs the q45 truth. */
  private val q258Sql: String =
    s"""WITH $lloydCtes,
       |vecs AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vv FROM embeddings),
       |cl0 AS (SELECT cell, list(cm / 1000000.0 ORDER BY dim) AS cv FROM c0 GROUP BY 1),
       |cl2 AS (SELECT cell, list(cm / 1000000.0 ORDER BY dim) AS cv FROM c2 GROUP BY 1),
       |qv AS (SELECT vec_id AS query_id, vv AS qvv FROM vecs WHERE vec_id < 8),
       |bs AS (SELECT query_id, vec_id AS neighbor_id,
       |  list_dot_product(qvv, vv) / (sqrt(list_dot_product(qvv, qvv)) * sqrt(list_dot_product(vv, vv))) AS cosine
       |  FROM vecs CROSS JOIN qv WHERE vec_id <> query_id),
       |tr AS (SELECT query_id, neighbor_id FROM (SELECT query_id, neighbor_id,
       |  row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rn
       |  FROM bs) WHERE rn <= 5),
       |cc0 AS (SELECT x.vec_id, c.cell,
       |  row_number() OVER (PARTITION BY x.vec_id ORDER BY
       |    list_dot_product(x.vv, c.cv) / (sqrt(list_dot_product(x.vv, x.vv)) * sqrt(list_dot_product(c.cv, c.cv))) DESC,
       |    c.cell) AS crn
       |  FROM vecs x CROSS JOIN cl0 c),
       |sc0 AS (SELECT qp.vec_id AS query_id, a.vec_id AS neighbor_id,
       |    list_dot_product(q.vv, n.vv) / (sqrt(list_dot_product(q.vv, q.vv)) * sqrt(list_dot_product(n.vv, n.vv))) AS cosine
       |  FROM (SELECT vec_id, cell FROM cc0 WHERE vec_id < 8 AND crn <= 1) qp
       |  JOIN (SELECT vec_id, cell FROM cc0 WHERE crn = 1) a ON a.cell = qp.cell
       |  JOIN vecs q ON q.vec_id = qp.vec_id JOIN vecs n ON n.vec_id = a.vec_id
       |  WHERE a.vec_id <> qp.vec_id),
       |ap0 AS (SELECT query_id, neighbor_id FROM (SELECT query_id, neighbor_id,
       |  row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rn
       |  FROM sc0) WHERE rn <= 5),
       |h0 AS (SELECT tr.query_id, count(ap0.neighbor_id) AS hits FROM tr
       |  LEFT JOIN ap0 ON ap0.query_id = tr.query_id AND ap0.neighbor_id = tr.neighbor_id
       |  GROUP BY 1),
       |cc2 AS (SELECT x.vec_id, c.cell,
       |  row_number() OVER (PARTITION BY x.vec_id ORDER BY
       |    list_dot_product(x.vv, c.cv) / (sqrt(list_dot_product(x.vv, x.vv)) * sqrt(list_dot_product(c.cv, c.cv))) DESC,
       |    c.cell) AS crn
       |  FROM vecs x CROSS JOIN cl2 c),
       |sc2 AS (SELECT qp.vec_id AS query_id, a.vec_id AS neighbor_id,
       |    list_dot_product(q.vv, n.vv) / (sqrt(list_dot_product(q.vv, q.vv)) * sqrt(list_dot_product(n.vv, n.vv))) AS cosine
       |  FROM (SELECT vec_id, cell FROM cc2 WHERE vec_id < 8 AND crn <= 1) qp
       |  JOIN (SELECT vec_id, cell FROM cc2 WHERE crn = 1) a ON a.cell = qp.cell
       |  JOIN vecs q ON q.vec_id = qp.vec_id JOIN vecs n ON n.vec_id = a.vec_id
       |  WHERE a.vec_id <> qp.vec_id),
       |ap2 AS (SELECT query_id, neighbor_id FROM (SELECT query_id, neighbor_id,
       |  row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rn
       |  FROM sc2) WHERE rn <= 5),
       |h2 AS (SELECT tr.query_id, count(ap2.neighbor_id) AS hits FROM tr
       |  LEFT JOIN ap2 ON ap2.query_id = tr.query_id AND ap2.neighbor_id = tr.neighbor_id
       |  GROUP BY 1)
       |SELECT h0.query_id, CAST(h0.hits AS BIGINT) AS hits_seed,
       |  (round(h0.hits / 5.0, 4) + 0.0) AS recall_seed,
       |  CAST(h2.hits AS BIGINT) AS hits_trained,
       |  (round(h2.hits / 5.0, 4) + 0.0) AS recall_trained
       |FROM h0 JOIN h2 USING (query_id) ORDER BY query_id""".stripMargin

  /** q268's oracle: q256's shared IVF+PQ chain (disjoint cent/codebook),
    * the probe/candidate/ADC/rank CTEs instantiated per nprobe, recall
    * summed over the query set — generated so each nprobe leg is
    * textually identical machinery. */
  private val q268Sql: String = {
    val shared =
      """WITH vecs AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vv FROM embeddings),
        |qv AS (SELECT vec_id AS query_id, vv AS qvv FROM vecs WHERE vec_id < 8),
        |bs AS (SELECT query_id, vec_id AS neighbor_id,
        |  list_dot_product(qvv, vv) / (sqrt(list_dot_product(qvv, qvv)) * sqrt(list_dot_product(vv, vv))) AS cosine
        |  FROM vecs CROSS JOIN qv WHERE vec_id <> query_id),
        |tr AS (SELECT query_id, neighbor_id FROM (SELECT query_id, neighbor_id,
        |  row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rn
        |  FROM bs) WHERE rn <= 5),
        |cent AS (SELECT vec_id AS cell, vv AS cv FROM vecs
        |  WHERE vec_id >= 100 AND vec_id < 116),
        |cells AS (SELECT x.vec_id, c.cell,
        |  row_number() OVER (PARTITION BY x.vec_id ORDER BY
        |    list_dot_product(x.vv, c.cv) / (sqrt(list_dot_product(x.vv, x.vv)) * sqrt(list_dot_product(c.cv, c.cv))) DESC,
        |    c.cell) AS crn
        |  FROM vecs x CROSS JOIN cent c),
        |asg AS (SELECT vec_id, cell FROM cells WHERE crn = 1),
        |subs AS (SELECT vec_id, CAST(s.i AS BIGINT) AS sub,
        |    vv[CAST(s.i * 16 + 1 AS INT) : CAST(s.i * 16 + 16 AS INT)] AS xs
        |  FROM vecs, LATERAL (SELECT unnest(range(0, 4)) AS i) s),
        |cb AS (SELECT vec_id AS code, sub, xs AS cs FROM subs
        |  WHERE vec_id >= 200 AND vec_id < 208),
        |sc AS (SELECT x.vec_id, x.sub, c.code,
        |  row_number() OVER (PARTITION BY x.vec_id, x.sub ORDER BY
        |    list_dot_product(x.xs, x.xs) - 2 * list_dot_product(x.xs, c.cs)
        |      + list_dot_product(c.cs, c.cs), c.code) AS rn
        |  FROM subs x JOIN cb c USING (sub)),
        |codes AS (SELECT vec_id, sub, code FROM sc WHERE rn = 1),
        |q AS (SELECT vec_id AS query_id, sub, xs AS qs FROM subs WHERE vec_id < 8),
        |lut AS (SELECT q.query_id, c.sub, c.code,
        |    CAST(round(greatest(list_dot_product(q.qs, q.qs)
        |      - 2 * list_dot_product(q.qs, c.cs)
        |      + list_dot_product(c.cs, c.cs), 0) * 100000) AS BIGINT) AS d
        |  FROM q JOIN cb c USING (sub))""".stripMargin
    val legs = Seq(1, 2, 4, 8).map { np =>
      s"""qp$np AS (SELECT vec_id AS query_id, cell FROM cells
         |  WHERE vec_id < 8 AND crn <= $np),
         |cand$np AS (SELECT DISTINCT qp.query_id, a.vec_id AS neighbor_id
         |  FROM qp$np qp JOIN asg a ON a.cell = qp.cell
         |  WHERE a.vec_id <> qp.query_id),
         |sc2_$np AS (SELECT l.query_id, k.vec_id AS neighbor_id,
         |    CAST(sum(l.d) AS BIGINT) AS adist_tb
         |  FROM codes k JOIN lut l ON l.sub = k.sub AND l.code = k.code
         |  JOIN cand$np cd ON cd.query_id = l.query_id AND cd.neighbor_id = k.vec_id
         |  WHERE k.vec_id <> l.query_id GROUP BY 1, 2),
         |ap$np AS (SELECT query_id, neighbor_id FROM (SELECT query_id, neighbor_id,
         |    row_number() OVER (PARTITION BY query_id
         |      ORDER BY adist_tb, neighbor_id) AS rn FROM sc2_$np) WHERE rn <= 5),
         |h$np AS (SELECT count(ap$np.neighbor_id) AS hits FROM tr
         |  LEFT JOIN ap$np ON ap$np.query_id = tr.query_id
         |    AND ap$np.neighbor_id = tr.neighbor_id)""".stripMargin
    }.mkString(",\n")
    val sel = Seq(1, 2, 4, 8).map(np =>
      s"SELECT CAST($np AS BIGINT) AS nprobe, CAST(hits AS BIGINT) AS hits, " +
        s"(round(hits / 40.0, 4) + 0.0) AS recall FROM h$np")
      .mkString("\nUNION ALL\n")
    s"$shared,\n$legs\n$sel\nORDER BY nprobe"
  }

  /** q269's oracle: q225's flat-ADC chain instantiated per codebook size
    * (disjoint slice 200..200+K), recall summed over the query set. */
  private val q269Sql: String = {
    val shared =
      """WITH vecs AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vv FROM embeddings),
        |qv AS (SELECT vec_id AS query_id, vv AS qvv FROM vecs WHERE vec_id < 8),
        |bs AS (SELECT query_id, vec_id AS neighbor_id,
        |  list_dot_product(qvv, vv) / (sqrt(list_dot_product(qvv, qvv)) * sqrt(list_dot_product(vv, vv))) AS cosine
        |  FROM vecs CROSS JOIN qv WHERE vec_id <> query_id),
        |tr AS (SELECT query_id, neighbor_id FROM (SELECT query_id, neighbor_id,
        |  row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rn
        |  FROM bs) WHERE rn <= 5),
        |subs AS (SELECT vec_id, CAST(s.i AS BIGINT) AS sub,
        |    vv[CAST(s.i * 16 + 1 AS INT) : CAST(s.i * 16 + 16 AS INT)] AS xs
        |  FROM vecs, LATERAL (SELECT unnest(range(0, 4)) AS i) s),
        |q AS (SELECT vec_id AS query_id, sub, xs AS qs FROM subs WHERE vec_id < 8)""".stripMargin
    val legs = Seq(4, 8, 16, 32).map { kk =>
      s"""cb$kk AS (SELECT vec_id AS code, sub, xs AS cs FROM subs
         |  WHERE vec_id >= 200 AND vec_id < ${200 + kk}),
         |sc$kk AS (SELECT x.vec_id, x.sub, c.code,
         |  row_number() OVER (PARTITION BY x.vec_id, x.sub ORDER BY
         |    list_dot_product(x.xs, x.xs) - 2 * list_dot_product(x.xs, c.cs)
         |      + list_dot_product(c.cs, c.cs), c.code) AS rn
         |  FROM subs x JOIN cb$kk c USING (sub)),
         |codes$kk AS (SELECT vec_id, sub, code FROM sc$kk WHERE rn = 1),
         |lut$kk AS (SELECT q.query_id, c.sub, c.code,
         |    CAST(round(greatest(list_dot_product(q.qs, q.qs)
         |      - 2 * list_dot_product(q.qs, c.cs)
         |      + list_dot_product(c.cs, c.cs), 0) * 100000) AS BIGINT) AS d
         |  FROM q JOIN cb$kk c USING (sub)),
         |sc2_$kk AS (SELECT l.query_id, k.vec_id AS neighbor_id,
         |    CAST(sum(l.d) AS BIGINT) AS adist_tb
         |  FROM codes$kk k JOIN lut$kk l ON l.sub = k.sub AND l.code = k.code
         |  WHERE k.vec_id <> l.query_id GROUP BY 1, 2),
         |ap$kk AS (SELECT query_id, neighbor_id FROM (SELECT query_id, neighbor_id,
         |    row_number() OVER (PARTITION BY query_id
         |      ORDER BY adist_tb, neighbor_id) AS rn FROM sc2_$kk) WHERE rn <= 5),
         |h$kk AS (SELECT count(ap$kk.neighbor_id) AS hits FROM tr
         |  LEFT JOIN ap$kk ON ap$kk.query_id = tr.query_id
         |    AND ap$kk.neighbor_id = tr.neighbor_id)""".stripMargin
    }.mkString(",\n")
    val sel = Seq(4, 8, 16, 32).map(kk =>
      s"SELECT CAST($kk AS BIGINT) AS codebook_k, CAST(hits AS BIGINT) AS hits, " +
        s"(round(hits / 40.0, 4) + 0.0) AS recall FROM h$kk")
      .mkString("\nUNION ALL\n")
    s"$shared,\n$legs\n$sel\nORDER BY codebook_k"
  }

  /** q254's oracle: q233's machinery with the three-cohort planted corpus
    * and recall grouped by the exact-Jaccard band (floor(4j), clamped to
    * 3) — the empirical LSH collision curve. */
  private val q254Sql: String = {
    import graft.functions.HashFamily
    val sigCols = (0 until 16).map(i => s"min(${HashFamily.affineSql(i, "x")}) AS h$i").mkString(", ")
    val bandKey = (0 until 8).map(b => s"WHEN $b THEN h${2 * b} || ',' || h${2 * b + 1}").mkString(" ")
    val bandVals = (0 until 8).map(b => s"($b)").mkString(", ")
    val agree = (0 until 16).map(i => s"(CASE WHEN a.h$i = b.h$i THEN 1 ELSE 0 END)").mkString(" + ")
    s"""WITH corp AS (SELECT doc_id, text FROM documents WHERE doc_id < 300
       |  UNION ALL SELECT doc_id + 100000,
       |    CASE WHEN doc_id % 3 = 0 THEN array_to_string(wv[1:(len(wv) + 1) // 2], ' ')
       |         WHEN doc_id % 3 = 1 THEN array_to_string(wv[1:(3 * len(wv) + 3) // 4], ' ')
       |         ELSE text || ' zzplantdup' END
       |  FROM (SELECT doc_id, text, regexp_split_to_array(text, '\\s+') AS wv
       |    FROM documents WHERE doc_id < 300)),
       |ws AS (SELECT doc_id, regexp_split_to_array(lower(text), '\\s+') AS w FROM corp),
       |sh AS (SELECT DISTINCT doc_id, w[CAST(i AS BIGINT)] || ' ' || w[CAST(i AS BIGINT) + 1] AS shingle
       |  FROM ws, LATERAL (SELECT unnest(range(1, len(w))) AS i) t),
       |rh AS (SELECT doc_id, ${krSql("shingle")} AS x FROM sh),
       |sig AS (SELECT doc_id, $sigCols FROM rh GROUP BY doc_id),
       |banded AS (SELECT doc_id, t.band, CASE t.band $bandKey END AS bkey
       |  FROM sig, (VALUES $bandVals) AS t(band)),
       |cand AS (SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
       |  FROM banded x JOIN banded y ON x.band = y.band AND x.bkey = y.bkey AND x.doc_id < y.doc_id),
       |est AS (SELECT id_a, id_b, ($agree) AS agree
       |  FROM cand JOIN sig a ON a.doc_id = cand.id_a JOIN sig b ON b.doc_id = cand.id_b),
       |mh AS (SELECT id_a, id_b FROM est
       |  WHERE (round(CAST(agree AS DOUBLE) / 16, 4) + 0.0) >= 0.25),
       |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
       |tshared AS (SELECT x.doc_id AS id_a, y.doc_id AS id_b, count(*) AS shared
       |  FROM sh x JOIN sh y ON y.doc_id = x.doc_id + 100000 AND y.shingle = x.shingle
       |  WHERE x.doc_id < 300 GROUP BY 1, 2),
       |truth AS (SELECT id_a, id_b,
       |    least((4 * shared) // (a.n + b.n - shared), 3) AS jband
       |  FROM tshared
       |  JOIN sizes a ON a.doc_id = id_a JOIN sizes b ON b.doc_id = id_b
       |  WHERE (round(CAST(shared AS DOUBLE) / (a.n + b.n - shared), 4) + 0.0) >= 0.25),
       |caught AS (SELECT t.jband, count(*) AS n_caught FROM truth t
       |  JOIN mh ON mh.id_a = t.id_a AND mh.id_b = t.id_b GROUP BY 1),
       |tt AS (SELECT jband, count(*) AS n_truth FROM truth GROUP BY 1)
       |SELECT tt.jband AS band, CAST(tt.n_truth AS BIGINT) AS n_truth,
       |  CAST(coalesce(caught.n_caught, 0) AS BIGINT) AS n_caught,
       |  (round(CAST(coalesce(caught.n_caught, 0) AS DOUBLE) / tt.n_truth, 4) + 0.0)
       |    AS recall
       |FROM tt LEFT JOIN caught ON caught.jband = tt.jband
       |ORDER BY band""".stripMargin
  }

  /** DuckDB twin of [[Dedup.simHash]]: 64 affine-parity bit generators over
    * the token Karp–Rabin fingerprint, fingerprint assembled by adding the
    * disjoint powers of two (bit 63 = Long.MinValue, matching Spark's
    * shiftleft(1L, 63) two's-complement wrap). */
  private val q48Sql: String = {
    import graft.functions.HashFamily
    val sums = (0 until 64).map(i =>
      s"sum(CASE WHEN (${HashFamily.affineSql(Dedup.SimSeedBase + i, "x")}) % 2 = 1 THEN 1 ELSE -1 END) AS s$i")
      .mkString(", ")
    val fp = (0 until 64).map { i =>
      val w = if (i == 63) "CAST(-9223372036854775807 AS BIGINT) - 1" else s"CAST(${1L << i} AS BIGINT)"
      s"(CASE WHEN s$i > 0 THEN $w ELSE CAST(0 AS BIGINT) END)"
    }.mkString(" + ")
    s"""WITH tok AS (SELECT doc_id, unnest(regexp_split_to_array(lower(text), '\\s+')) AS w FROM documents),
       |th AS (SELECT doc_id, ${krSql("w")} AS x FROM tok),
       |bs AS (SELECT doc_id, $sums FROM th GROUP BY doc_id)
       |SELECT doc_id, CAST(($fp) AS BIGINT) AS simhash FROM bs ORDER BY doc_id""".stripMargin
  }

  /** Band-bucket expressions replicating [[Similarity.lshBands]]: element t =
    * packed sign bits of the t-th band's planes over a DOUBLE[] column `v`. */
  private def lshBandSqlGen(numPlanes: Int, bands: Int): Seq[String] = {
    val planes = Similarity.hyperplanes(numPlanes, 64)
    val bandBits = numPlanes / bands
    (0 until bands).map { t =>
      (0 until bandBits).map { j =>
        val p = planes(t * bandBits + j)
        val arr = "[" + p.map(v => s"CAST($v AS DOUBLE)").mkString(",") + "]"
        s"(CASE WHEN list_dot_product(v, $arr) >= 0.0 THEN ${1L << j} ELSE 0 END)"
      }.mkString(" + ")
    }
  }

  private val lshBandSql: Seq[String] = lshBandSqlGen(32, 4)

  /** DuckDB twin of q54: LSH-banded candidate generation (32 planes, 8 bands
    * of 4 — wider recall than q55's 4×8) + exact cosine re-score, mirroring
    * [[Similarity.lshBucketNearDup]] on the bounded id range. */
  private val q54Sql: String = {
    val buckCols = lshBandSqlGen(32, 8).zipWithIndex
      .map { case (b, i) => s"($b) AS buck$i" }.mkString(", ")
    val bandCase = (0 until 8).map(i => s"WHEN $i THEN buck$i").mkString(" ")
    val bandVals = (0 until 8).map(i => s"($i)").mkString(", ")
    s"""WITH b AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings WHERE vec_id < 200),
       |bb AS (SELECT vec_id, v, $buckCols FROM b),
       |banded AS (SELECT vec_id, v, t.band, CASE t.band $bandCase END AS bucket
       |  FROM bb, (VALUES $bandVals) AS t(band)),
       |cand AS (SELECT DISTINCT x.vec_id AS id_a, y.vec_id AS id_b, x.v AS xv, y.v AS yv
       |  FROM banded x JOIN banded y ON x.band = y.band AND x.bucket = y.bucket AND x.vec_id < y.vec_id),
       |p AS (SELECT id_a, id_b,
       |  list_dot_product(xv, yv) / (sqrt(list_dot_product(xv, xv)) * sqrt(list_dot_product(yv, yv))) AS cosine
       |  FROM cand)
       |SELECT id_a, id_b, (round(cosine, 4) + 0.0) AS cosine FROM p WHERE cosine >= 0.35
       |ORDER BY id_a, id_b""".stripMargin
  }

  /** DuckDB twin of [[Sentiment.scoreVader]] (q60): window-lag negation
    * scope, booster CASE on the preceding token, integer-micro summation and
    * sign-aware exclamation emphasis — generated from the same constant
    * lists the Spark side uses. */
  private val q60Sql: String = {
    val negList = Sentiment.negators.map(n => s"'$n'").mkString(", ")
    val boostCase = Sentiment.boosters
      .map { case (b, v) => s"WHEN '$b' THEN CAST($v AS DOUBLE)" }
      .mkString("CASE prev1 ", " ", " ELSE CAST(0.0 AS DOUBLE) END")
    val ampUnits = (Sentiment.exclamationBoost * 10000).round
    s"""WITH ws AS (SELECT doc_id, regexp_split_to_array(lower(text), '\\s+') AS w FROM documents),
       |tok AS (SELECT doc_id, CAST(i AS BIGINT) AS pos, w[CAST(i AS BIGINT)] AS word
       |  FROM ws, LATERAL (SELECT unnest(range(1, len(w) + 1)) AS i) t),
       |ann AS (SELECT doc_id, word,
       |  lag(word, 1) OVER win AS prev1, lag(word, 2) OVER win AS prev2, lag(word, 3) OVER win AS prev3
       |  FROM tok WINDOW win AS (PARTITION BY doc_id ORDER BY pos)),
       |lex(word, tenths) AS (VALUES $lexValues),
       |hits AS (SELECT doc_id,
       |  (tenths / 10.0 + (CASE WHEN tenths > 0 THEN 1.0 WHEN tenths < 0 THEN -1.0 ELSE 0.0 END) * ($boostCase))
       |   * (CASE WHEN prev1 IN ($negList) OR prev2 IN ($negList) OR prev3 IN ($negList)
       |      THEN CAST(${Sentiment.negationFactor} AS DOUBLE) ELSE CAST(1.0 AS DOUBLE) END) AS v2
       |  FROM ann JOIN lex USING (word)),
       |sums AS (SELECT doc_id, CAST(sum(CAST(round(v2 * 10000) AS BIGINT)) AS BIGINT) AS micro
       |  FROM hits GROUP BY doc_id),
       |amp AS (SELECT doc_id, least(length(text) - length(replace(text, '!', '')), 4) * $ampUnits AS a
       |  FROM documents),
       |fin AS (SELECT amp.doc_id,
       |  (coalesce(micro, 0) + (CASE WHEN coalesce(micro, 0) > 0 THEN 1
       |     WHEN coalesce(micro, 0) < 0 THEN -1 ELSE 0 END) * a) / 10000.0 AS s
       |  FROM amp LEFT JOIN sums ON sums.doc_id = amp.doc_id)
       |SELECT doc_id, (round(s / sqrt(s * s + 15.0), 4) + 0.0) AS vader_score,
       |  CASE WHEN s / sqrt(s * s + 15.0) >= 0.05 THEN 'positive'
       |       WHEN s / sqrt(s * s + 15.0) <= -0.05 THEN 'negative' ELSE 'neutral' END AS vader_label
       |FROM fin ORDER BY doc_id""".stripMargin
  }

  /** DuckDB twin of the q74 end-to-end DAG: the same synthesized raw shapes,
    * the htmlToText chain collapsed to its algebraic fixed-point on this input
    * (`' ' || text || ' & done'` — any break in the tag-strip / entity-unescape
    * / quote-ref regexp chain would diverge from it), `strptime` with the
    * two-digit-year `%y` pivot for the 4chan format (SURVEY §7.4), and the
    * q34/q35 enrichment SQL over the cleaned body. */
  private val q74Sql: String = {
    val comp = "coalesce(sv, 0.0) / sqrt(coalesce(sv, 0.0) * coalesce(sv, 0.0) + 15.0)"
    val hits = "CAST(len(regexp_extract_all(cb, '\\b(error|slow|bad|crash|fail)\\b')) AS DOUBLE)"
    s"""WITH reddit AS (SELECT 'reddit' AS platform, 'r' || doc_id AS comment_id, text AS body,
       |  make_timestamp((CAST(1704067200 AS BIGINT) + (doc_id % 20) * 86400 + doc_id % 1000)
       |    * CAST(1000000 AS BIGINT)) AS created_ts,
       |  doc_id FROM documents WHERE doc_id % 3 = 0),
       |chan AS (SELECT '4chan' AS platform, CAST(doc_id AS VARCHAR) AS comment_id,
       |  ' ' || text || ' & done' AS body,
       |  strptime(lpad(CAST(doc_id % 12 + 1 AS VARCHAR), 2, '0') || '/' ||
       |    lpad(CAST(doc_id % 28 + 1 AS VARCHAR), 2, '0') || '/24 ' ||
       |    lpad(CAST(doc_id % 24 AS VARCHAR), 2, '0') || ':' ||
       |    lpad(CAST(doc_id % 60 AS VARCHAR), 2, '0') || ':' ||
       |    lpad(CAST(doc_id % 60 AS VARCHAR), 2, '0'), '%m/%d/%y %H:%M:%S') AS created_ts,
       |  doc_id FROM documents WHERE doc_id % 3 = 1),
       |yt AS (SELECT 'youtube' AS platform, 'y' || doc_id AS comment_id, text AS body,
       |  strptime('2024-02-' || lpad(CAST(doc_id % 28 + 1 AS VARCHAR), 2, '0') || 'T' ||
       |    lpad(CAST(doc_id % 24 AS VARCHAR), 2, '0') || ':' ||
       |    lpad(CAST(doc_id % 60 AS VARCHAR), 2, '0') || ':00Z', '%Y-%m-%dT%H:%M:%SZ') AS created_ts,
       |  doc_id FROM documents WHERE doc_id % 3 = 2),
       |unified AS (SELECT * FROM reddit UNION ALL SELECT * FROM chan UNION ALL SELECT * FROM yt),
       |kept AS (SELECT * FROM unified WHERE NOT (platform = 'reddit' AND doc_id % 10 = 0)),
       |cleaned AS (SELECT platform, comment_id, created_ts,
       |  lower(regexp_replace(regexp_replace(body, 'https?://\\S+', '', 'g'),
       |    '[^a-zA-Z0-9\\s]', '', 'g')) AS cb
       |  FROM kept),
       |lex(word, tenths) AS (VALUES $lexValues),
       |tok AS (SELECT comment_id, unnest(regexp_split_to_array(cb, '\\s+')) AS word FROM cleaned),
       |sc AS (SELECT comment_id, sum(tenths) / 10.0 AS sv FROM tok JOIN lex USING (word) GROUP BY 1),
       |enr AS (SELECT platform, strftime(created_ts, '%Y-%m-%d') AS day,
       |  CASE WHEN $comp >= 0.05 THEN 'positive'
       |       WHEN $comp <= -0.05 THEN 'negative' ELSE 'neutral' END AS sentiment,
       |  (round($comp, 4) + 0.0) AS score,
       |  (round($hits / ($hits + 1.0), 4) + 0.0) AS conf
       |  FROM cleaned LEFT JOIN sc USING (comment_id))
       |SELECT platform, day, sentiment, count(*) AS cnt,
       |  CAST(sum(CASE WHEN conf > 0.9 THEN 1 ELSE 0 END) AS BIGINT) AS hate_cnt,
       |  CAST(sum(CAST(round(score * 10000) AS BIGINT)) AS BIGINT) / 10000.0 AS sum_score
       |FROM enr GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin
  }

  /** Gap-sessionization in plain SQL (lag + running break-sum) — oracle for
    * BOTH the built-in session_window (q57) and the flatMapGroupsWithState
    * replay (q75): two engines, one semantic. */
  private val sessionizeSql: String =
    """WITH x AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
      |  CASE WHEN lag(CAST(ts AS TIMESTAMP)) OVER w IS NULL
      |       OR CAST(ts AS TIMESTAMP) - lag(CAST(ts AS TIMESTAMP)) OVER w > INTERVAL 30 MINUTE
      |       THEN 1 ELSE 0 END AS brk
      |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
      |y AS (SELECT user_id, ts, sum(brk) OVER (PARTITION BY user_id ORDER BY ts) AS sid FROM x)
      |SELECT user_id, min(ts) AS session_start, max(ts) AS session_end, count(*) AS events
      |FROM y GROUP BY user_id, sid ORDER BY user_id, session_start""".stripMargin

  /** DuckDB twin of [[graft.ops.Curation.curationChain]]: the q50/q51/q73
    * stage formulas verbatim, dedup keyed on raw text (equivalent to the
    * Spark side's sha2 key — same groups), first-failure drop reasons. */
  private val q76Sql: String =
    s"""WITH f AS (SELECT doc_id, text,
       |  CAST(length(text) AS DOUBLE) AS len,
       |  CAST(len(regexp_extract_all(text, '\\S+')) AS DOUBLE) AS toks,
       |  CAST(len(regexp_extract_all(text, '[A-Za-z]')) AS DOUBLE) AS alpha,
       |  CAST(len(regexp_extract_all(lower(text), '\\b(the|and|of|is|a)\\b')) AS DOUBLE) AS stop
       |  FROM documents),
       |a AS (SELECT doc_id, text, $langCase AS lang_pred,
       |  (round((CASE WHEN len >= 100 AND len <= 10000 THEN 1.0 WHEN len >= 20 THEN 0.5 ELSE 0.0 END) * 0.4
       |    + (CASE WHEN len > 0 THEN alpha / len ELSE 0.0 END) * 0.3
       |    + (CASE WHEN toks > 0 THEN least(stop / toks * 5.0, 1.0) ELSE 0.0 END) * 0.3, 4) + 0.0) AS quality,
       |  (round(1.0 - CAST(len(list_distinct(regexp_split_to_array(lower(text), '\\s+'))) AS DOUBLE)
       |    / len(regexp_split_to_array(lower(text), '\\s+')), 4) + 0.0) AS rep_ratio,
       |  CAST(toks AS BIGINT) AS n_tokens
       |  FROM f),
       |p AS (SELECT *, (lang_pred = 'en' AND quality >= 0.6 AND rep_ratio <= 0.6) AS pass FROM a),
       |kk AS (SELECT text, min(doc_id) AS keeper FROM p WHERE pass GROUP BY text)
       |SELECT doc_id, lang_pred, quality, rep_ratio, n_tokens,
       |  coalesce(pass AND doc_id = keeper, FALSE) AS kept,
       |  CASE WHEN lang_pred <> 'en' THEN 'lang'
       |       WHEN quality < 0.6 THEN 'quality'
       |       WHEN rep_ratio > 0.6 THEN 'repetition'
       |       WHEN doc_id <> keeper THEN 'duplicate' END AS drop_reason
       |FROM p LEFT JOIN kk USING (text) ORDER BY doc_id""".stripMargin

  /** q204 oracle (shared: q218 ranks these scores into terciles). Same
    * map-side positional bigrams, same mixture text; the per-doc fold
    * orders by the distinct bigram. */
  /** The IVF occupancy-audit SQL — shared verbatim by q283 (batch index
    * health) and q292 (streaming ingest): the streaming gate's proof is
    * that the accumulated per-batch index reproduces EXACTLY this
    * batch-assignment table. */
  private val q283Sql: String =
    """WITH vecs AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vv FROM embeddings),
      |cent AS (SELECT vec_id AS cell, vv AS cv FROM vecs WHERE vec_id < 16),
      |cells AS (SELECT x.vec_id, c.cell,
      |  row_number() OVER (PARTITION BY x.vec_id ORDER BY
      |    list_dot_product(x.vv, c.cv) / (sqrt(list_dot_product(x.vv, x.vv)) * sqrt(list_dot_product(c.cv, c.cv))) DESC,
      |    c.cell) AS crn
      |  FROM vecs x CROSS JOIN cent c),
      |asg AS (SELECT vec_id, cell FROM cells WHERE crn = 1),
      |t AS (SELECT count(*) AS n FROM asg)
      |SELECT CAST(cell AS BIGINT) AS cell,
      |  CAST(count(*) AS BIGINT) AS n_vecs,
      |  CAST((10000 * count(*)) // t.n AS BIGINT) AS share_bp,
      |  CAST((1000 * count(*) * 16) // t.n AS BIGINT) AS load_milli
      |FROM asg, t GROUP BY cell, t.n ORDER BY cell""".stripMargin

  private val q204Sql: String =
    """WITH raw AS (SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '\s+'),
        |    t -> length(t) > 0) AS arr FROM documents),
        |bg AS (SELECT doc_id, unnest(list_transform(range(1, len(arr)),
        |    i -> {'a': arr[i], 'b': arr[i + 1]})) AS g FROM raw),
        |bi AS (SELECT doc_id, g.a AS a, g.b AS b FROM bg),
        |dbc AS (SELECT doc_id, a, b, count(*) AS c FROM bi GROUP BY 1, 2, 3),
        |cf2 AS (SELECT a, b, sum(c) AS cf2 FROM dbc GROUP BY 1, 2),
        |cf1 AS (SELECT a, sum(cf2) AS cf1 FROM cf2 GROUP BY 1),
        |tok AS (SELECT unnest(arr) AS t FROM raw),
        |cfu AS (SELECT t, count(*) AS cu FROM tok GROUP BY 1),
        |n AS (SELECT count(*) AS nn FROM tok),
        |terms AS (SELECT dbc.doc_id, dbc.a, dbc.b, dbc.c,
        |    CAST(dbc.c AS DOUBLE) * ln(0.7 * (CAST(cf2.cf2 AS DOUBLE) / CAST(cf1.cf1 AS DOUBLE))
        |      + 0.3 * (CAST(cfu.cu AS DOUBLE) / CAST(n.nn AS DOUBLE))) AS term
        |  FROM dbc JOIN cf2 USING (a, b) JOIN cf1 USING (a)
        |  JOIN cfu ON dbc.b = cfu.t CROSS JOIN n),
        |agg AS (SELECT doc_id, sum(c) AS nb,
        |    (round(-list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list(term ORDER BY a, b)),
        |      (x, y) -> x + y) / sum(c), 4) + 0.0) AS avg_nll
        |  FROM terms GROUP BY doc_id)
        |SELECT d.doc_id, CAST(coalesce(agg.nb, 0) AS BIGINT) AS n_bigrams,
        |  coalesce(agg.avg_nll, CAST(0.0 AS DOUBLE)) AS avg_nll
        |FROM documents d LEFT JOIN agg USING (doc_id) ORDER BY d.doc_id""".stripMargin

  /** q223's oracle: classic BPE ([[Bpe.learnMerges]]) unrolled as k chained
    * CTE steps — k is small and bounded, so no recursion is needed (and a
    * recursive CTE could not host the per-step aggregate anyway). Each step
    * i: re-derive the symbol list from the current wrapped string (`pl`),
    * count adjacent pairs weighted by word frequency (`pr`), take the
    * argmax with the engine's exact tie-break (cnt DESC, p1, p2) (`b`),
    * and apply the merge (`w`).
    *
    * Symbolizations ride as STRINGS with every symbol wrapped as
    * chr(31)‖sym‖chr(30), so applying a merge is ONE `replace`:
    * SQL replace scans left-to-right, replaces non-overlapping matches,
    * and resumes AFTER each replacement — exactly the greedy fold
    * [[Bpe.applyMerge]] implements ("aaaa" + (a,a) → ["aa","aa"], and a
    * pattern can never straddle a symbol boundary because both delimiters
    * participate in the match). A step with no remaining pair leaves `b`
    * empty, which empties every later step through the cross join — the
    * merge list just comes back shorter, like the engine's `exhausted`.
    */
  private def bpeOracleSql(k: Int): String = {
    val w0 =
      """w0 AS (SELECT
        |  array_to_string(list_transform(regexp_split_to_array(word, ''),
        |    c -> chr(31) || c || chr(30)), '') AS ws,
        |  CAST(count(*) AS BIGINT) AS freq
        |  FROM (SELECT unnest(list_filter(regexp_split_to_array(lower(text), '\s+'),
        |      t -> length(t) > 0)) AS word FROM documents)
        |  GROUP BY 1)""".stripMargin
    val steps = (1 to k).map { i =>
      s"""pl$i AS (SELECT freq,
         |  list_transform(list_filter(string_split(ws, chr(30)), x -> length(x) > 0),
         |    x -> ltrim(x, chr(31))) AS l
         |  FROM w${i - 1}),
         |pr$i AS (SELECT p[1] AS p1, p[2] AS p2, CAST(sum(freq) AS BIGINT) AS cnt FROM (
         |    SELECT freq, unnest(list_zip(l[1:len(l)-1], l[2:len(l)])) AS p
         |    FROM pl$i WHERE len(l) >= 2)
         |  GROUP BY 1, 2),
         |b$i AS (SELECT p1, p2, cnt FROM pr$i ORDER BY cnt DESC, p1, p2 LIMIT 1),
         |w$i AS (SELECT replace(ws, chr(31) || b.p1 || chr(30) || chr(31) || b.p2 || chr(30),
         |    chr(31) || b.p1 || b.p2 || chr(30)) AS ws, freq
         |  FROM w${i - 1}, b$i b)""".stripMargin
    }
    val union = (1 to k)
      .map(i => s"SELECT CAST($i AS BIGINT) AS rank, p1, p2, cnt FROM b$i")
      .mkString("\nUNION ALL ")
    s"WITH $w0,\n${steps.mkString(",\n")}\n" +
      s"SELECT rank, p1, p2, cnt FROM (\n$union) ORDER BY rank"
  }

  /** q227's oracle: [[bpeOracleSql]]'s k learning steps (reused verbatim —
    * they define b1..bk), then the corpus ENCODED with those merges. Each
    * document rides as one delimiter-wrapped string (symbols as
    * chr(31)‖sym‖chr(30), words separated by chr(29) so a merge pattern —
    * which requires chr(30)chr(31) adjacency — can never straddle a word
    * boundary), and each merge applies as the same single greedy `replace`
    * the learner's steps use. Token count = chr(31) occurrences; the token
    * string unwraps the delimiters. */
  private def bpeEncodeOracleSql(k: Int): String = {
    val learn = bpeOracleSql(k)
    // reuse the WITH-chain of the learning oracle up to (and incl.) w_k/b_k:
    // strip its final SELECT and append the doc-encoding CTEs
    val withChain = learn.substring(0, learn.lastIndexOf("\nSELECT rank"))
    val doc0 =
      """doc0 AS (SELECT doc_id, array_to_string(list_transform(
        |    list_filter(regexp_split_to_array(lower(coalesce(text, '')), '\s+'),
        |      t -> length(t) > 0),
        |    w -> array_to_string(list_transform(regexp_split_to_array(w, ''),
        |      c -> chr(31) || c || chr(30)), '')), chr(29)) AS ds
        |  FROM documents)""".stripMargin
    val docSteps = (1 to k).map { i =>
      s"""doc$i AS (SELECT doc_id, replace(ds,
         |    chr(31) || b.p1 || chr(30) || chr(31) || b.p2 || chr(30),
         |    chr(31) || b.p1 || b.p2 || chr(30)) AS ds
         |  FROM doc${i - 1}, b$i b)""".stripMargin
    }
    s"""$withChain,
       |$doc0,
       |${docSteps.mkString(",\n")}
       |SELECT doc_id,
       |  CAST(length(ds) - length(replace(ds, chr(31), '')) AS BIGINT) AS n_tokens,
       |  array_to_string(list_transform(
       |    list_filter(string_split(replace(ds, chr(29), ''), chr(30)),
       |      x -> length(x) > 0),
       |    x -> ltrim(x, chr(31))), ' ') AS tokens_s
       |FROM doc$k ORDER BY doc_id""".stripMargin
  }

  def oracleSql: Map[String, String] = Map(
    "q74_unified_pipeline" -> q74Sql,
    "q76_curation_chain" -> q76Sql,
    "q78_tfidf_topk" ->
      """WITH tok AS (SELECT doc_id, t.term FROM documents,
        |  LATERAL (SELECT unnest(regexp_split_to_array(lower(text), '\s+')) AS term) t
        |  WHERE length(t.term) > 0),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
        |idf AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        |n AS (SELECT count(*) AS n FROM documents),
        |s AS (SELECT doc_id, term, (round(tf * ln((n + 1.0) / (df + 1.0)), 4) + 0.0) AS tfidf
        |  FROM tf JOIN idf USING (term) CROSS JOIN n),
        |r AS (SELECT doc_id, term, tfidf,
        |  CAST(row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term) AS BIGINT) AS rn FROM s)
        |SELECT doc_id, term, tfidf, rn FROM r WHERE rn <= 3 ORDER BY doc_id, rn""".stripMargin,
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
    "q115_xml_roundtrip" -> "SELECT * FROM nation ORDER BY n_nationkey",
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
    "q127_fuzzy_join" ->
      // same two blocking keys as the engine (prefix-16 OR length+suffix-8),
      // fixtures included; lev() runs on full names — equivalent to the
      // engine's residue DP by common-prefix/suffix invariance
      // the OR-of-blocks runs as two UNIONed equi-joins: identical pair
      // set, but each block hash-joins (the OR form degraded to a 150k²
      // nested loop at sf1 and the oracle timed out)
      """WITH c AS MATERIALIZED (SELECT c_custkey, c_name FROM customer
        |  UNION ALL SELECT * FROM (VALUES (900000001, 'Customer#A00001111'),
        |    (900000002, 'Customer#B00001111')) t(c_custkey, c_name)),
        |cand AS (SELECT a.c_custkey AS key_a, b.c_custkey AS key_b,
        |    a.c_name AS name_a, b.c_name AS name_b FROM c a JOIN c b
        |  ON substr(a.c_name, 1, 16) = substr(b.c_name, 1, 16)
        |    AND a.c_custkey < b.c_custkey
        |  UNION
        |  SELECT a.c_custkey, b.c_custkey, a.c_name, b.c_name FROM c a JOIN c b
        |  ON length(a.c_name) = length(b.c_name)
        |    AND substr(a.c_name, -8) = substr(b.c_name, -8)
        |    AND a.c_custkey < b.c_custkey)
        |SELECT key_a, key_b, CAST(levenshtein(name_a, name_b) AS BIGINT) AS dist
        |FROM cand WHERE levenshtein(name_a, name_b) <= 1
        |ORDER BY key_a, key_b""".stripMargin,
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
    "q64_rollup" ->
      """SELECT event_type, strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS day, count(*) AS cnt
        |FROM events GROUP BY ROLLUP (event_type, day)
        |ORDER BY event_type NULLS FIRST, day NULLS FIRST""".stripMargin,
    "q65_percentiles" ->
      """SELECT event_type,
        |(round(quantile_cont(value, 0.5), 4) + 0.0) AS p50,
        |(round(quantile_cont(value, 0.9), 4) + 0.0) AS p90,
        |(round(quantile_cont(value, 0.99), 4) + 0.0) AS p99
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q66_pivot" ->
      """SELECT strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS day,
        |count(*) FILTER (event_type = 'click') AS click,
        |count(*) FILTER (event_type = 'error') AS error,
        |count(*) FILTER (event_type = 'purchase') AS purchase,
        |count(*) FILTER (event_type = 'signup') AS signup,
        |count(*) FILTER (event_type = 'view') AS view
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q67_cumulative_users" ->
      """WITH f AS (SELECT user_id, min(strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d')) AS day
        |  FROM events GROUP BY 1),
        |d AS (SELECT day, count(*) AS new_users FROM f GROUP BY 1)
        |SELECT day, new_users, CAST(sum(new_users) OVER (ORDER BY day) AS BIGINT) AS cumulative_users
        |FROM d ORDER BY day""".stripMargin,
    "q69_salted_count" ->
      "SELECT event_type, count(*) AS cnt FROM events GROUP BY 1 ORDER BY 1",
    "q70_semi_join" ->
      """SELECT c_custkey, c_name FROM customer c WHERE EXISTS
        |(SELECT 1 FROM orders o WHERE o.o_orderstatus = 'P' AND o.o_custkey = c.c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "q71_except" ->
      """SELECT o_custkey AS custkey FROM orders WHERE year(o_orderdate) = 1996
        |EXCEPT
        |SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1997
        |ORDER BY custkey""".stripMargin,
    "q72_pii_scrub" ->
      """WITH d AS (SELECT doc_id,
        |  'contact user' || doc_id || '@example.com from 10.0.' || (doc_id % 256) ||
        |  '.7 call +1 (555) 123-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ||
        |  ' :: ' || text AS dirty FROM documents)
        |SELECT doc_id, regexp_replace(regexp_replace(regexp_replace(dirty,
        |  '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |  '\b(?:\d{1,3}\.){3}\d{1,3}\b', '<IP>', 'g'),
        |  '\+?\d[\d\s().-]{7,}\d', '<PHONE>', 'g') AS clean
        |FROM d ORDER BY doc_id""".stripMargin,
    "q73_repetition_filter" ->
      """WITH r AS (SELECT doc_id,
        |  (round(1.0 - CAST(len(list_distinct(regexp_split_to_array(lower(text), '\s+'))) AS DOUBLE)
        |    / len(regexp_split_to_array(lower(text), '\s+')), 4) + 0.0) AS rep_ratio
        |  FROM documents)
        |SELECT doc_id, rep_ratio, rep_ratio <= CAST(0.2 AS DOUBLE) AS keep
        |FROM r ORDER BY doc_id""".stripMargin,
    "q68_frame_sample" ->
      s"""WITH f AS (SELECT doc_id, CAST(i AS BIGINT) AS frame_idx,
         |    substr(text, CAST(i * 256 + 1 AS INT), 256) AS frame
         |  FROM documents, LATERAL (SELECT unnest(range(0,
         |    CAST(greatest(ceil(length(text) / 256.0), 1) AS BIGINT))) AS i) t)
         |SELECT doc_id, frame_idx, ${krSql("frame")} AS frame_hash
         |FROM f ORDER BY doc_id, frame_idx""".stripMargin,
    "q01_csv_scan" -> "SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey",
    "q02_json_flatten" ->
      "SELECT event_id, CAST(json_extract(props, '$.k') AS INTEGER) AS k FROM events ORDER BY event_id",
    "q03_json_explode" ->
      """SELECT o_custkey AS custkey, sum(CAST(round(l_quantity * 100, 0) AS BIGINT)) / 100.0 AS sum_qty
        |FROM orders JOIN lineitem ON l_orderkey = o_orderkey
        |GROUP BY o_custkey ORDER BY custkey""".stripMargin,
    "q04_table_sink_append" ->
      """SELECT l_returnflag, count(*) AS cnt FROM lineitem
        |WHERE l_returnflag IN ('A', 'R') GROUP BY 1 ORDER BY 1""".stripMargin,
    "q05_table_scan" -> "SELECT * FROM orders ORDER BY o_orderkey",
    "q06_project" -> "SELECT c_custkey, c_name, c_mktsegment FROM customer ORDER BY c_custkey",
    "q07_ts_range_filter" ->
      """SELECT l_orderkey, l_linenumber, l_shipdate FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        |ORDER BY l_orderkey, l_linenumber, l_shipdate""".stripMargin,
    "q08_between_filter" ->
      """SELECT c_mktsegment, count(*) AS cnt FROM orders JOIN customer ON o_custkey = c_custkey
        |WHERE o_orderdate BETWEEN TIMESTAMP '1997-01-01' AND TIMESTAMP '1997-12-31'
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q09_recency_filter" ->
      """SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, event_type FROM events
        |WHERE CAST(ts AS TIMESTAMP) > (SELECT max(CAST(ts AS TIMESTAMP)) FROM events) - INTERVAL 1 DAY
        |ORDER BY event_id""".stripMargin,
    "q10_date_cast_filter" ->
      """SELECT strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS day, count(*) AS cnt FROM events
        |WHERE strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') BETWEEN '2024-01-10' AND '2024-01-19'
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q11_inner_equijoin" ->
      """SELECT c_mktsegment, count(*) AS cnt,
        |sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) / 100.0 AS sum_price
        |FROM orders JOIN customer ON o_custkey = c_custkey GROUP BY 1 ORDER BY 1""".stripMargin,
    "q12_anti_join_dedup" ->
      """SELECT c_custkey FROM customer c WHERE NOT EXISTS
        |(SELECT 1 FROM orders o WHERE o.o_orderstatus = 'P' AND o.o_custkey = c.c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "q13_composite_key_anti" ->
      """SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem l
        |WHERE l_returnflag = 'N' AND NOT EXISTS
        |(SELECT 1 FROM lineitem r WHERE r.l_returnflag = 'R'
        | AND r.l_orderkey = l.l_orderkey AND r.l_suppkey = l.l_suppkey)
        |ORDER BY l_orderkey, l_suppkey""".stripMargin,
    "q14_count_global" -> "SELECT count(*) AS cnt FROM lineitem",
    "q15_groupby_count" ->
      "SELECT l_returnflag, count(*) AS cnt FROM lineitem GROUP BY 1 ORDER BY 1",
    "q16_groupby_multi" ->
      """SELECT l_returnflag, l_linestatus, CAST(year(l_shipdate) AS BIGINT) AS ship_year,
        |count(*) AS cnt FROM lineitem GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,
    "q17_topk_groups" ->
      """SELECT o_orderpriority, count(*) AS cnt FROM orders GROUP BY 1
        |ORDER BY cnt DESC, o_orderpriority LIMIT 10""".stripMargin,
    "q18_tumbling_day_count" ->
      """SELECT date_trunc('day', CAST(ts AS TIMESTAMP)) AS bucket_start, count(*) AS cnt
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q19_share_of_total" ->
      """SELECT event_type, count(*) AS cnt,
        |(round(count(*) * 100.0 / sum(count(*)) OVER (), 4) + 0.0) AS pct
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q20_orderby_ts" ->
      """SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, event_type FROM events
        |ORDER BY ts, event_id""".stripMargin,
    "q21_orderby_desc_limit" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin,
    "q22_running_state" ->
      """SELECT user_id, event_id,
        |CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS rn,
        |lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_value
        |FROM events ORDER BY user_id, rn""".stripMargin,
    "q23_union_all" ->
      """SELECT o_orderkey, src FROM (
        |SELECT o_orderkey, 'open' AS src FROM orders WHERE o_orderstatus = 'O'
        |UNION ALL
        |SELECT o_orderkey, 'big' AS src FROM orders WHERE o_totalprice > 400000)
        |ORDER BY o_orderkey, src""".stripMargin,
    "q24_url_strip" ->
      """SELECT doc_id, regexp_replace('see https://example.com/d/' || CAST(doc_id AS VARCHAR) || ' :: ' || text,
        |'https?://\S+', '', 'g') AS clean FROM documents ORDER BY doc_id""".stripMargin,
    "q25_normalize_text" ->
      """SELECT doc_id, lower(regexp_replace(upper(text), '[^a-zA-Z0-9\s]', '', 'g')) AS normalized
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q26_html_to_text" ->
      """SELECT doc_id, regexp_replace(regexp_replace(
        |regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
        |'<p>Line &amp; <b>' || text || '</b> &gt;&gt;42 tail</p>',
        |'<[^>]+>', '', 'g'), '&gt;', '>', 'g'), '&lt;', '<', 'g'), '&quot;', '"', 'g'),
        |'&#039;', '''', 'g'), '&amp;', '&', 'g'), '>>\d+', '', 'g'), '^>+', '', 'g') AS clean
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q27_epoch_to_ts" ->
      """SELECT event_id, make_timestamp((epoch_us(CAST(ts AS TIMESTAMP)) // 1000000) * 1000000) AS ts_sec
        |FROM events ORDER BY event_id""".stripMargin,
    "q28_iso_parse" ->
      """SELECT event_id, strptime(strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%dT%H:%M:%SZ'),
        |'%Y-%m-%dT%H:%M:%SZ') AS parsed FROM events ORDER BY event_id""".stripMargin,
    "q29_date_format" ->
      "SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS day FROM orders ORDER BY o_orderkey",
    "q30_date_arith" ->
      "SELECT o_orderkey, o_orderdate + INTERVAL 30 DAY AS due FROM orders ORDER BY o_orderkey",
    "q31_scalar_math" ->
      """SELECT strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS day, count(*) AS cnt,
        |(round(count(*) / 10.0 * 5.5, 2) + 0.0) AS extrapolated FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q32_json_get" ->
      """SELECT event_id, coalesce(CAST(json_extract(props, '$.k') AS BIGINT), -1) AS k
        |FROM events ORDER BY event_id""".stripMargin,
    "q33_null_guard" ->
      """SELECT doc_id, CASE WHEN text IS NULL OR length(text) = 0 THEN 'not a string'
        |ELSE substr(text, 1, 20) END AS guarded FROM documents ORDER BY doc_id""".stripMargin,
    "q34_sentiment_udf" ->
      s"""WITH lex(word, tenths) AS (VALUES $lexValues),
         |tok AS (SELECT doc_id, unnest(regexp_split_to_array(lower(text), '\\s+')) AS word FROM documents),
         |sc AS (SELECT doc_id, sum(tenths) / 10.0 AS sv FROM tok JOIN lex USING (word) GROUP BY doc_id)
         |SELECT d.doc_id,
         |(round(coalesce(sv, 0.0) / sqrt(coalesce(sv, 0.0) * coalesce(sv, 0.0) + 15.0), 4) + 0.0) AS sentiment_score,
         |CASE WHEN coalesce(sv, 0.0) / sqrt(coalesce(sv, 0.0) * coalesce(sv, 0.0) + 15.0) >= 0.05 THEN 'positive'
         |     WHEN coalesce(sv, 0.0) / sqrt(coalesce(sv, 0.0) * coalesce(sv, 0.0) + 15.0) <= -0.05 THEN 'negative'
         |     ELSE 'neutral' END AS sentiment
         |FROM documents d LEFT JOIN sc USING (doc_id) ORDER BY doc_id""".stripMargin,
    "q35_hate_udf" ->
      """WITH h AS (SELECT doc_id,
        |CAST(len(regexp_extract_all(lower(text), '\b(error|slow|bad|crash|fail)\b')) AS DOUBLE) AS hits
        |FROM documents)
        |SELECT doc_id, (round(hits / (hits + 1.0), 4) + 0.0) > 0.9 AS is_hate_speech,
        |(round(hits / (hits + 1.0), 4) + 0.0) AS hate_speech_confidence FROM h ORDER BY doc_id""".stripMargin,
    "q36_case_label" ->
      """SELECT CASE WHEN value >= 100 THEN 'high' WHEN value >= 50 THEN 'mid' ELSE 'low' END AS label,
        |count(*) AS cnt FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q37_microbatch_trigger" ->
      "SELECT event_type, count(*) AS cnt FROM events GROUP BY 1 ORDER BY 1",
    "q38_stream_dedup" -> "SELECT DISTINCT user_id FROM events ORDER BY user_id",
    "q39_late_data_drop" ->
      """SELECT event_type, count(*) AS cnt FROM events
        |WHERE CAST(ts AS TIMESTAMP) > (SELECT max(CAST(ts AS TIMESTAMP)) FROM events) - INTERVAL 12 HOUR
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q40_incremental_enrich" ->
      """SELECT CASE WHEN value >= 100 THEN 'high' WHEN value >= 50 THEN 'mid' ELSE 'low' END AS label,
        |count(*) AS cnt FROM events e WHERE NOT EXISTS
        |(SELECT 1 FROM events x WHERE x.event_id % 10 = 0 AND x.event_id = e.event_id)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q143_stream_static_join" ->
      """SELECT CASE CAST(user_id % 5 AS INT) WHEN 0 THEN 'bronze' WHEN 1 THEN 'silver'
        |WHEN 2 THEN 'gold' WHEN 3 THEN 'platinum' ELSE 'diamond' END AS tier,
        |count(*) AS cnt FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q144_expectations" ->
      // same strict pass rule (TRUE passes, NULL fails) via coalesce
      """WITH t AS (SELECT count(*) AS total,
        |  sum(CASE WHEN coalesce(value IS NOT NULL AND value >= 0, false) THEN 0 ELSE 1 END) AS v_nonneg,
        |  sum(CASE WHEN coalesce(value <= 100, false) THEN 0 ELSE 1 END) AS v_max,
        |  sum(CASE WHEN coalesce(user_id IS NOT NULL, false) THEN 0 ELSE 1 END) AS v_uid,
        |  sum(CASE WHEN coalesce(length(props) > 0, false) THEN 0 ELSE 1 END) AS v_props
        |  FROM events)
        |SELECT rule, CAST(violations AS BIGINT) AS violations, CAST(total AS BIGINT) AS total,
        |  CAST((10000 * (total - violations)) // total AS BIGINT) AS pass_bp
        |FROM (
        |  SELECT 'value_present_non_negative' AS rule, v_nonneg AS violations, total FROM t
        |  UNION ALL SELECT 'value_at_most_100', v_max, total FROM t
        |  UNION ALL SELECT 'user_id_present', v_uid, total FROM t
        |  UNION ALL SELECT 'props_nonempty', v_props, total FROM t)
        |ORDER BY rule""".stripMargin,
    "q145_weighted_sample" ->
      // same exponential-race key: u from the integer pseudo-shuffle, one
      // ln + one divide, rounded to 10 dp with the id tie-break
      """SELECT doc_id, lang, n_chars, priority FROM (
        |  SELECT doc_id, lang, n_chars,
        |    (round(-ln((((doc_id % 1000003) * 2654435761) % 1000003 + 1) / 1000004.0)
        |      / CAST(n_chars AS DOUBLE), 10) + 0.0) AS priority
        |  FROM documents ORDER BY priority, doc_id LIMIT 100)
        |ORDER BY doc_id""".stripMargin,
    "q146_rolling_median" ->
      """WITH d AS (SELECT event_type, strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS day,
        |  count(*) AS cnt FROM events GROUP BY 1, 2)
        |SELECT event_type, day, cnt,
        |  median(cnt) OVER (PARTITION BY event_type ORDER BY day
        |    ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS rolling_median
        |FROM d ORDER BY event_type, day""".stripMargin,
    "q147_mad_outliers" ->
      """WITH d AS (SELECT event_type, strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS day,
        |  count(*) AS cnt FROM events GROUP BY 1, 2),
        |m AS (SELECT event_type, median(cnt) AS med FROM d GROUP BY 1),
        |dev AS (SELECT d.event_type, d.day, d.cnt, m.med,
        |  abs(CAST(d.cnt AS DOUBLE) - m.med) AS dv FROM d JOIN m USING (event_type)),
        |md AS (SELECT event_type, median(dv) AS mad FROM dev GROUP BY 1)
        |SELECT dev.event_type, day, cnt, med, mad, dv > mad * 3.0 AS is_outlier
        |FROM dev JOIN md USING (event_type) ORDER BY event_type, day""".stripMargin,
    "q148_unigram_logprob" ->
      // the identical ordered fold as q140, over corpus-frequency terms
      """WITH raw AS (SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS arr FROM documents),
        |tok AS (SELECT doc_id, unnest(arr) AS tok FROM raw),
        |tk AS (SELECT doc_id, tok, count(*) AS c FROM tok WHERE length(tok) > 0 GROUP BY 1, 2),
        |cf AS (SELECT tok, sum(c) AS cf FROM tk GROUP BY 1),
        |n AS (SELECT sum(cf) AS n FROM cf),
        |sz AS (SELECT doc_id, sum(c) AS nt FROM tk GROUP BY 1),
        |terms AS (SELECT tk.doc_id, tk.tok,
        |  CAST(c AS DOUBLE) * ln(CAST(cf AS DOUBLE) / CAST(n.n AS DOUBLE)) AS term
        |  FROM tk JOIN cf USING (tok) CROSS JOIN n),
        |s AS (SELECT t.doc_id,
        |  (round(-list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list(term ORDER BY tok)),
        |    (a, b) -> a + b) / CAST(any_value(sz.nt) AS DOUBLE), 4) + 0.0) AS avg_nll
        |  FROM terms t JOIN sz ON t.doc_id = sz.doc_id GROUP BY t.doc_id)
        |SELECT d.doc_id, CAST(coalesce(sz.nt, 0) AS BIGINT) AS n_tokens,
        |  coalesce(s.avg_nll, CAST(0.0 AS DOUBLE)) AS avg_nll
        |FROM documents d LEFT JOIN sz ON d.doc_id = sz.doc_id
        |LEFT JOIN s ON d.doc_id = s.doc_id
        |ORDER BY d.doc_id""".stripMargin,
    "q149_time_travel" ->
      // v1's snapshot ≡ the rows that existed before the second append
      """SELECT strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS day,
        |  count(*) AS cnt, CAST(sum(event_id) AS BIGINT) AS sum_id FROM events
        |WHERE strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') < '2024-01-16'
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q150_snapshot_diff" ->
      // the v1→v2 increment ≡ the rows the second append landed
      """SELECT strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS day,
        |  count(*) AS cnt, CAST(sum(event_id) AS BIGINT) AS sum_id FROM events
        |WHERE strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') >= '2024-01-16'
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q151_transition_matrix" ->
      """WITH p AS (SELECT event_type AS from_type,
        |  lead(event_type) OVER (PARTITION BY user_id
        |    ORDER BY CAST(ts AS TIMESTAMP), event_id) AS to_type FROM events),
        |m AS (SELECT from_type, to_type, count(*) AS cnt FROM p
        |  WHERE to_type IS NOT NULL GROUP BY 1, 2)
        |SELECT from_type, to_type, cnt,
        |  CAST((10000 * cnt) // sum(cnt) OVER (PARTITION BY from_type) AS BIGINT) AS share_bp
        |FROM m ORDER BY from_type, to_type""".stripMargin,
    "q152_winsorize" ->
      // quantile_disc ≡ SQL-standard percentile_disc: actual elements, so
      // the winsorized sum is exact integer arithmetic end-to-end
      """WITH e AS (SELECT event_type,
        |  CAST(round(value * 100, 0) AS BIGINT) AS cents FROM events),
        |c AS (SELECT event_type, quantile_disc(cents, 0.05) AS lo,
        |  quantile_disc(cents, 0.95) AS hi FROM e GROUP BY 1)
        |SELECT e.event_type, count(*) AS n,
        |  CAST(sum(CASE WHEN cents < lo THEN 1 ELSE 0 END) AS BIGINT) AS clipped_low,
        |  CAST(sum(CASE WHEN cents > hi THEN 1 ELSE 0 END) AS BIGINT) AS clipped_high,
        |  CAST(sum(greatest(least(cents, hi), lo)) AS BIGINT) AS sum_winsorized
        |FROM e JOIN c USING (event_type) GROUP BY 1 ORDER BY 1""".stripMargin,
    "q153_journey_trigrams" ->
      """WITH p AS (SELECT event_type AS step1,
        |  lead(event_type, 1) OVER (PARTITION BY user_id
        |    ORDER BY CAST(ts AS TIMESTAMP), event_id) AS step2,
        |  lead(event_type, 2) OVER (PARTITION BY user_id
        |    ORDER BY CAST(ts AS TIMESTAMP), event_id) AS step3 FROM events),
        |m AS (SELECT step1, step2, step3, count(*) AS cnt FROM p
        |  WHERE step2 IS NOT NULL AND step3 IS NOT NULL GROUP BY 1, 2, 3
        |  ORDER BY cnt DESC, step1, step2, step3 LIMIT 25)
        |SELECT step1, step2, step3, cnt,
        |  CAST(row_number() OVER (ORDER BY cnt DESC, step1, step2, step3) AS BIGINT) AS rank
        |FROM m ORDER BY rank""".stripMargin,
    "q154_interevent_gaps" ->
      // floor(gap_us / 1e6): // on non-negative BIGINTs ≡ Spark's `div`
      """WITH g AS (SELECT event_type,
        |  (epoch_us(CAST(ts AS TIMESTAMP)) - epoch_us(lag(CAST(ts AS TIMESTAMP), 1)
        |    OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)))
        |    // 1000000 AS gap_s
        |  FROM events)
        |SELECT event_type, count(*) AS n,
        |  CAST(quantile_disc(gap_s, 0.5) AS BIGINT) AS p50_s,
        |  CAST(quantile_disc(gap_s, 0.9) AS BIGINT) AS p90_s,
        |  CAST(max(gap_s) AS BIGINT) AS max_s
        |FROM g WHERE gap_s IS NOT NULL GROUP BY 1 ORDER BY 1""".stripMargin,
    "q155_heavy_hitters" ->
      // the sketch only proposes candidates — the answer is this exact query
      """WITH tok AS (SELECT unnest(regexp_split_to_array(lower(text), '\s+')) AS item FROM documents),
        |t AS (SELECT item FROM tok WHERE length(item) > 0),
        |n AS (SELECT count(*) AS total FROM t)
        |SELECT item, cnt, CAST((10000 * cnt) // total AS BIGINT) AS share_bp FROM (
        |  SELECT item, count(*) AS cnt FROM t GROUP BY 1) CROSS JOIN n
        |WHERE cnt >= (total * 100 + 9999) // 10000
        |ORDER BY item""".stripMargin,
    "q156_unpivot" ->
      // the melt round-trip keeps pivot's zero-filled cells as explicit rows
      """WITH d AS (SELECT strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS day,
        |  event_type, count(*) AS cnt FROM events GROUP BY 1, 2),
        |days AS (SELECT DISTINCT day FROM d),
        |types AS (SELECT unnest(['click','error','purchase','signup','view']) AS event_type)
        |SELECT days.day, types.event_type, CAST(coalesce(d.cnt, 0) AS BIGINT) AS cnt
        |FROM days CROSS JOIN types
        |LEFT JOIN d ON d.day = days.day AND d.event_type = types.event_type
        |ORDER BY 1, 2""".stripMargin,
    "q157_cube" ->
      """SELECT event_type, strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS day,
        |  count(*) AS cnt,
        |  CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS sum_cents
        |FROM events GROUP BY CUBE (event_type, day)
        |ORDER BY event_type NULLS FIRST, day NULLS FIRST""".stripMargin,
    "q158_psi_drift" ->
      // identical smoothed-term formula and bin-ordered fold as the Spark
      // side; the explicit spine makes absent bins contribute in both
      """WITH e AS (SELECT event_type AS g,
        |  CASE WHEN strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') < '2024-01-16'
        |    THEN 'a' ELSE 'b' END AS p,
        |  least(CAST(round(value * 100, 0) AS BIGINT) // 5000, 9) AS bin FROM events),
        |c AS (SELECT g, bin, count(*) FILTER (p = 'a') AS ca,
        |  count(*) FILTER (p = 'b') AS cb FROM e GROUP BY 1, 2),
        |t AS (SELECT g, sum(ca) AS na, sum(cb) AS nb FROM c GROUP BY 1),
        |spine AS (SELECT g, unnest(range(10)) AS bin FROM (SELECT DISTINCT g FROM e)),
        |terms AS (SELECT spine.g, spine.bin, t.na, t.nb,
        |  (CAST(coalesce(c.ca, 0) + 1 AS DOUBLE) / (t.na + 10) -
        |   CAST(coalesce(c.cb, 0) + 1 AS DOUBLE) / (t.nb + 10)) *
        |  ln((CAST(coalesce(c.ca, 0) + 1 AS DOUBLE) / (t.na + 10)) /
        |     (CAST(coalesce(c.cb, 0) + 1 AS DOUBLE) / (t.nb + 10))) AS term
        |  FROM spine LEFT JOIN c ON spine.g = c.g AND spine.bin = c.bin
        |  JOIN t ON spine.g = t.g)
        |SELECT g AS event_type, CAST(any_value(na) AS BIGINT) AS n_a,
        |  CAST(any_value(nb) AS BIGINT) AS n_b,
        |  (round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list(term ORDER BY bin)),
        |    (a, b) -> a + b), 4) + 0.0) AS psi
        |FROM terms GROUP BY g ORDER BY 1""".stripMargin,
    "q159_group_corr" ->
      // exact integer power sums (HUGEINT ≡ Spark decimal(38,0)), then the
      // one textbook formula on doubles — never the engine's streaming corr
      """WITH s AS (SELECT l_returnflag, count(*) AS n,
        |  sum(CAST(l_quantity AS BIGINT)) AS sx,
        |  sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS sy,
        |  sum(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS sxx,
        |  sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT) *
        |      CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS syy,
        |  sum(CAST(l_quantity AS BIGINT) *
        |      CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS sxy
        |  FROM lineitem GROUP BY 1)
        |SELECT l_returnflag, n, (round(CASE
        |  WHEN sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) > 0
        |   AND sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) > 0
        |  THEN (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
        |    (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) *
        |     sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
        |  END, 4) + 0.0) AS r
        |FROM s ORDER BY 1""".stripMargin,
    "q160_event_entropy" ->
      // the q148-style ordered fold, over each day's category terms
      """WITH c AS (SELECT strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS day,
        |  event_type AS cat, count(*) AS c FROM events GROUP BY 1, 2),
        |t AS (SELECT day, sum(c) AS n FROM c GROUP BY 1),
        |terms AS (SELECT c.day, t.n, c.cat,
        |  (CAST(c.c AS DOUBLE) / t.n) * ln(CAST(c.c AS DOUBLE) / t.n) AS term
        |  FROM c JOIN t USING (day))
        |SELECT day, CAST(any_value(n) AS BIGINT) AS n, count(*) AS n_cats,
        |  (round(-list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list(term ORDER BY cat)),
        |    (a, b) -> a + b), 4) + 0.0) AS entropy
        |FROM terms GROUP BY day ORDER BY day""".stripMargin,
    "q161_pmi_bigrams" ->
      // pmi = ln cb − ln Nb − ln cx − ln cy + 2·ln Nu, the exact term order
      // the Spark side evaluates; Nb is taken BEFORE the min-count floor
      """WITH raw AS (SELECT list_filter(regexp_split_to_array(lower(text), '\s+'),
        |    t -> length(t) > 0) AS arr FROM documents),
        |w AS (SELECT arr FROM raw WHERE len(arr) > 0),
        |uc AS (SELECT tok, count(*) AS cw FROM (SELECT unnest(arr) AS tok FROM w) GROUP BY 1),
        |nu AS (SELECT sum(cw) AS nu FROM uc),
        |bc AS (SELECT w1, w2, count(*) AS cb FROM (
        |  SELECT unnest(arr[:len(arr)-1]) AS w1, unnest(arr[2:]) AS w2 FROM w
        |  WHERE len(arr) >= 2) GROUP BY 1, 2),
        |nb AS (SELECT sum(cb) AS nb FROM bc)
        |SELECT w1, w2, cb,
        |  (round(ln(CAST(cb AS DOUBLE)) - ln(CAST(nb.nb AS DOUBLE)) -
        |    ln(CAST(u1.cw AS DOUBLE)) - ln(CAST(u2.cw AS DOUBLE)) +
        |    2.0 * ln(CAST(nu.nu AS DOUBLE)), 4) + 0.0) AS pmi
        |FROM bc JOIN uc u1 ON bc.w1 = u1.tok JOIN uc u2 ON bc.w2 = u2.tok
        |CROSS JOIN nb CROSS JOIN nu
        |WHERE cb >= 25 ORDER BY w1, w2""".stripMargin,
    "q162_resample" ->
      // generate_series is inclusive on both ends, matching Spark sequence
      """WITH h AS (SELECT event_type, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS b,
        |  count(*) AS cnt, sum(CAST(round(value * 100, 0) AS BIGINT)) AS sc
        |  FROM events GROUP BY 1, 2),
        |s AS (SELECT event_type, min(b) AS mn, max(b) AS mx FROM h GROUP BY 1),
        |spine AS (SELECT event_type, unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS b FROM s)
        |SELECT spine.event_type, strftime(spine.b, '%Y-%m-%d %H') AS bucket,
        |  CAST(coalesce(h.cnt, 0) AS BIGINT) AS cnt, h.cnt IS NULL AS filled,
        |  CAST(last_value(h.sc IGNORE NULLS) OVER (PARTITION BY spine.event_type
        |    ORDER BY spine.b ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS locf_cents
        |FROM spine LEFT JOIN h ON spine.event_type = h.event_type AND spine.b = h.b
        |ORDER BY 1, 2""".stripMargin,
    "q163_conversion_lift" ->
      // z is guarded to genuine proportions (0 < pooled < 1) — the two
      // event types need not be nested, so the pooled rate can exceed 1
      """WITH per AS (SELECT strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS day,
        |  sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS exposures,
        |  sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conversions
        |  FROM events GROUP BY 1),
        |p AS (SELECT * FROM per WHERE exposures > 0),
        |g AS (SELECT sum(exposures) AS e, sum(conversions) AS c FROM p)
        |SELECT day, CAST(exposures AS BIGINT) AS exposures,
        |  CAST(conversions AS BIGINT) AS conversions,
        |  CAST((10000 * conversions) // exposures AS BIGINT) AS cvr_bp,
        |  CASE WHEN g.c > 0 AND g.c < g.e THEN
        |    (round((CAST(conversions AS DOUBLE) / exposures - CAST(g.c AS DOUBLE) / g.e) /
        |      sqrt((CAST(g.c AS DOUBLE) / g.e) * (1.0 - CAST(g.c AS DOUBLE) / g.e) /
        |        CAST(exposures AS DOUBLE)), 4) + 0.0) END AS z
        |FROM p CROSS JOIN g ORDER BY day""".stripMargin,
    "q164_skyline" ->
      // frontier of (qty, min cents per qty) ≡ frontier of the raw points;
      // ROWS preceding under qty DESC = all strictly-greater quantities
      """WITH best AS (SELECT CAST(l_quantity AS BIGINT) AS qty,
        |  min(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS cents
        |  FROM lineitem GROUP BY 1),
        |f AS (SELECT qty, cents, min(cents) OVER (ORDER BY qty DESC
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev FROM best)
        |SELECT qty, cents FROM f WHERE prev IS NULL OR cents < prev
        |ORDER BY qty""".stripMargin,
    "q165_timed_funnel" ->
      // latency = floor-seconds(tc) − floor-seconds(t0), matching Spark's
      // timestamp→long cast; quantile_disc ignores non-converted NULLs
      """WITH entry AS (SELECT user_id, min(CAST(ts AS TIMESTAMP)) AS t0
        |  FROM events WHERE event_type = 'view' GROUP BY 1),
        |hit AS (SELECT e.user_id, min(CAST(p.ts AS TIMESTAMP)) AS tc
        |  FROM entry e JOIN events p ON p.user_id = e.user_id
        |  AND p.event_type = 'purchase'
        |  AND CAST(p.ts AS TIMESTAMP) >= e.t0
        |  AND CAST(p.ts AS TIMESTAMP) <= e.t0 + INTERVAL 24 HOURS GROUP BY 1),
        |j AS (SELECT entry.user_id, t0,
        |  epoch_us(tc) // 1000000 - epoch_us(t0) // 1000000 AS lat
        |  FROM entry LEFT JOIN hit ON entry.user_id = hit.user_id)
        |SELECT strftime(t0, '%Y-%m-%d') AS cohort_day, count(*) AS users,
        |  CAST(sum(CASE WHEN lat IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS converted,
        |  CAST(quantile_disc(lat, 0.5) AS BIGINT) AS p50_latency_s,
        |  CAST((10000 * sum(CASE WHEN lat IS NOT NULL THEN 1 ELSE 0 END)) // count(*) AS BIGINT) AS cvr_bp
        |FROM j GROUP BY 1 ORDER BY 1""".stripMargin,
    "q166_skew_profile" ->
      """WITH cu AS (SELECT user_id AS k, count(*) AS cnt FROM events GROUP BY 1),
        |ce AS (SELECT event_type AS k, count(*) AS cnt FROM events GROUP BY 1),
        |su AS (SELECT 'user_id' AS col_name, CAST(sum(cnt) AS BIGINT) AS n,
        |  count(*) AS n_distinct, CAST(max(cnt) AS BIGINT) AS max_cnt,
        |  CAST(sum(cnt) // count(*) AS BIGINT) AS avg_cnt,
        |  CAST(quantile_disc(cnt, 0.99) AS BIGINT) AS p99_cnt,
        |  CAST((10000 * max(cnt)) // sum(cnt) AS BIGINT) AS top1_share_bp FROM cu),
        |se AS (SELECT 'event_type' AS col_name, CAST(sum(cnt) AS BIGINT) AS n,
        |  count(*) AS n_distinct, CAST(max(cnt) AS BIGINT) AS max_cnt,
        |  CAST(sum(cnt) // count(*) AS BIGINT) AS avg_cnt,
        |  CAST(quantile_disc(cnt, 0.99) AS BIGINT) AS p99_cnt,
        |  CAST((10000 * max(cnt)) // sum(cnt) AS BIGINT) AS top1_share_bp FROM ce)
        |SELECT * FROM su UNION ALL SELECT * FROM se ORDER BY col_name""".stripMargin,
    "q167_mutual_info" ->
      // same ln-space cell terms as the Spark side, folded in (x, y) order
      """WITH e AS (SELECT
        |  date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) // 7 AS week,
        |  event_type,
        |  date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) % 7 AS dow FROM events),
        |cells AS (SELECT week, event_type AS x, dow AS y, count(*) AS c FROM e GROUP BY 1, 2, 3),
        |mx AS (SELECT week, x, sum(c) AS cx FROM cells GROUP BY 1, 2),
        |my AS (SELECT week, y, sum(c) AS cy FROM cells GROUP BY 1, 2),
        |t AS (SELECT week, sum(c) AS n FROM cells GROUP BY 1),
        |terms AS (SELECT cells.week, t.n, cells.x, cells.y,
        |  (CAST(c AS DOUBLE) / t.n) * (ln(CAST(c AS DOUBLE)) - ln(CAST(cx AS DOUBLE)) -
        |    ln(CAST(cy AS DOUBLE)) + ln(CAST(t.n AS DOUBLE))) AS term
        |  FROM cells JOIN mx ON cells.week = mx.week AND cells.x = mx.x
        |  JOIN my ON cells.week = my.week AND cells.y = my.y
        |  JOIN t ON cells.week = t.week)
        |SELECT week, CAST(any_value(n) AS BIGINT) AS n,
        |  (round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list(term ORDER BY x, y)),
        |    (a, b) -> a + b), 4) + 0.0) AS mi
        |FROM terms GROUP BY week ORDER BY week""".stripMargin,
    "q168_gini" ->
      // rank-sum identity over grouped values: a run of c equal values v
      // after cumulative count cp contributes v·(c·cp + c(c+1)/2) — exact
      """WITH e AS (SELECT event_type AS g, CAST(round(value * 100, 0) AS BIGINT) AS v FROM events),
        |c AS (SELECT g, v, count(*) AS c FROM e GROUP BY 1, 2),
        |w AS (SELECT g, v, c, coalesce(sum(c) OVER (PARTITION BY g ORDER BY v
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cp FROM c),
        |a AS (SELECT g, sum(c) AS n, sum(v * c) AS s,
        |  sum(v * (c * cp + (c * (c + 1)) // 2)) AS n1 FROM w GROUP BY 1)
        |SELECT g AS event_type, CAST(n AS BIGINT) AS n, CAST(s AS BIGINT) AS sum_value,
        |  (round(CASE WHEN s > 0 THEN
        |    (2.0 * CAST(n1 AS DOUBLE)) / (CAST(n AS DOUBLE) * CAST(s AS DOUBLE)) -
        |    CAST(n + 1 AS DOUBLE) / CAST(n AS DOUBLE) END, 4) + 0.0) AS gini
        |FROM a ORDER BY 1""".stripMargin,
    "q169_hhi" ->
      // same count shuffle + ordered fold as q160, squared-share terms
      """WITH c AS (SELECT strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS day,
        |  event_type AS cat, count(*) AS c FROM events GROUP BY 1, 2),
        |t AS (SELECT day, sum(c) AS n FROM c GROUP BY 1),
        |terms AS (SELECT c.day, t.n, c.cat,
        |  (CAST(c.c AS DOUBLE) / t.n) * (CAST(c.c AS DOUBLE) / t.n) AS term
        |  FROM c JOIN t USING (day))
        |SELECT day, CAST(any_value(n) AS BIGINT) AS n, count(*) AS n_cats,
        |  (round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list(term ORDER BY cat)),
        |    (a, b) -> a + b), 4) + 0.0) AS hhi
        |FROM terms GROUP BY day ORDER BY day""".stripMargin,
    "q170_changepoint" ->
      // K-scaled CUSUM keeps everything in exact longs; ties resolve to the
      // earliest day, matching the Spark min-over-peak join-back
      """WITH d AS (SELECT event_type AS g, strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS day,
        |  count(*) AS x FROM events GROUP BY 1, 2),
        |t AS (SELECT g, count(*) AS k, sum(x) AS s FROM d GROUP BY 1),
        |w AS (SELECT d.g, d.day, t.k,
        |  abs(sum(t.k * d.x - t.s) OVER (PARTITION BY d.g ORDER BY d.day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) AS a
        |  FROM d JOIN t ON d.g = t.g),
        |m AS (SELECT g, max(a) AS ma FROM w GROUP BY 1)
        |SELECT w.g AS event_type, CAST(any_value(w.k) AS BIGINT) AS n_buckets,
        |  CAST(m.ma AS BIGINT) AS cusum_max_abs, min(w.day) AS changepoint
        |FROM w JOIN m ON w.g = m.g AND w.a = m.ma GROUP BY w.g, m.ma
        |ORDER BY 1""".stripMargin,
    "q171_assoc_rules" ->
      // item counts come from the DISTINCT per-basket item lists, so ci =
      // baskets containing the item — the same frame the pairs explode from
      """WITH b AS (SELECT l_orderkey AS c, list_sort(list(DISTINCT l_partkey)) AS items
        |  FROM lineitem GROUP BY 1),
        |p AS (SELECT c, unnest(items) AS item FROM b),
        |pc AS (SELECT p1.item AS x, p2.item AS y, count(*) AS n_pairs
        |  FROM p p1 JOIN p p2 ON p1.c = p2.c AND p1.item < p2.item GROUP BY 1, 2),
        |f AS (SELECT * FROM pc WHERE n_pairs >= 2),
        |ic AS (SELECT item, count(*) AS ci FROM p GROUP BY 1),
        |n AS (SELECT count(*) AS n FROM b)
        |SELECT x, y, n_pairs,
        |  CAST((10000 * n_pairs) // n.n AS BIGINT) AS support_bp,
        |  CAST((10000 * n_pairs) // i1.ci AS BIGINT) AS conf_xy_bp,
        |  CAST((10000 * n_pairs) // i2.ci AS BIGINT) AS conf_yx_bp,
        |  (round((CAST(n_pairs AS DOUBLE) * n.n) / (CAST(i1.ci AS DOUBLE) * i2.ci), 4) + 0.0) AS lift
        |FROM f JOIN ic i1 ON f.x = i1.item JOIN ic i2 ON f.y = i2.item CROSS JOIN n
        |ORDER BY x, y""".stripMargin,
    "q172_golden_record" ->
      """WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS t, event_id,
        |  CASE WHEN event_type = 'purchase'
        |    THEN CAST(round(value * 100, 0) AS BIGINT) END AS amount_cents,
        |  event_type, strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS day FROM events),
        |w AS (SELECT user_id,
        |  last_value(amount_cents IGNORE NULLS) OVER win AS amount_cents,
        |  last_value(event_type IGNORE NULLS) OVER win AS event_type,
        |  last_value(day IGNORE NULLS) OVER win AS day,
        |  count(*) OVER (PARTITION BY user_id) AS n_versions,
        |  row_number() OVER (PARTITION BY user_id ORDER BY t DESC, event_id DESC) AS rn
        |  FROM e WINDOW win AS (PARTITION BY user_id ORDER BY t, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING))
        |SELECT user_id, amount_cents, event_type, day,
        |  CAST(n_versions AS BIGINT) AS n_versions
        |FROM w WHERE rn = 1 ORDER BY user_id""".stripMargin,
    "q173_rank_normalize" ->
      // the oracle's global window IS the thing the two-phase rank replaces
      """WITH e AS (SELECT event_id, CAST(round(value * 100, 0) AS BIGINT) AS cents FROM events),
        |r AS (SELECT event_id, cents,
        |  row_number() OVER (ORDER BY cents, event_id) AS rank,
        |  count(*) OVER () AS n FROM e)
        |SELECT event_id, cents, CAST(rank AS BIGINT) AS rank,
        |  CAST(((rank - 1) * 10000) // (n - 1) AS BIGINT) AS pct_bp
        |FROM r ORDER BY rank""".stripMargin,
    "q174_rfm" ->
      // quantile_disc cutpoints are actual elements; recency scores invert
      """WITH anchor AS (SELECT max(CAST(ts AS TIMESTAMP)) AS now FROM events),
        |per AS (SELECT user_id,
        |  min(date_diff('day', CAST(ts AS DATE), CAST(now AS DATE))) AS recency_days,
        |  count(*) AS frequency,
        |  sum(CASE WHEN event_type = 'purchase'
        |    THEN CAST(round(value * 100, 0) AS BIGINT) ELSE 0 END) AS monetary
        |  FROM events CROSS JOIN anchor GROUP BY 1),
        |cuts AS (SELECT
        |  quantile_disc(recency_days, 0.33) AS r33, quantile_disc(recency_days, 0.67) AS r67,
        |  quantile_disc(frequency, 0.33) AS f33, quantile_disc(frequency, 0.67) AS f67,
        |  quantile_disc(monetary, 0.33) AS m33, quantile_disc(monetary, 0.67) AS m67 FROM per),
        |s AS (SELECT user_id, recency_days, frequency, monetary,
        |  4 - (1 + (CASE WHEN recency_days > r33 THEN 1 ELSE 0 END) +
        |           (CASE WHEN recency_days > r67 THEN 1 ELSE 0 END)) AS r_score,
        |  1 + (CASE WHEN frequency > f33 THEN 1 ELSE 0 END) +
        |      (CASE WHEN frequency > f67 THEN 1 ELSE 0 END) AS f_score,
        |  1 + (CASE WHEN monetary > m33 THEN 1 ELSE 0 END) +
        |      (CASE WHEN monetary > m67 THEN 1 ELSE 0 END) AS m_score
        |  FROM per CROSS JOIN cuts)
        |SELECT user_id, CAST(recency_days AS BIGINT) AS recency_days, frequency,
        |  CAST(monetary AS BIGINT) AS monetary,
        |  CAST(r_score AS BIGINT) AS r_score, CAST(f_score AS BIGINT) AS f_score,
        |  CAST(m_score AS BIGINT) AS m_score,
        |  CAST(r_score AS VARCHAR) || CAST(f_score AS VARCHAR) || CAST(m_score AS VARCHAR) AS segment
        |FROM s ORDER BY user_id""".stripMargin,
    "q175_seasonality" ->
      """WITH s AS (SELECT event_type, strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS day,
        |  date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) % 7 AS dow,
        |  count(*) AS x FROM events GROUP BY 1, 2, 3),
        |p AS (SELECT event_type, dow, count(*) AS n_buckets_phase, sum(x) AS sum_phase
        |  FROM s GROUP BY 1, 2),
        |t AS (SELECT event_type, count(*) AS nb, sum(x) AS tot FROM s GROUP BY 1)
        |SELECT p.event_type, p.dow, p.n_buckets_phase,
        |  CAST(p.sum_phase AS BIGINT) AS sum_phase,
        |  CAST((10000 * p.sum_phase * t.nb) // (p.n_buckets_phase * t.tot) AS BIGINT)
        |    AS seasonal_idx_bp
        |FROM p JOIN t ON p.event_type = t.event_type WHERE t.tot > 0
        |ORDER BY 1, 2""".stripMargin,
    "q176_autocorr" ->
      // identical power-sum formula as q159, over (series, lag) pairs
      """WITH d AS (SELECT event_type, strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS day,
        |  count(*) AS x FROM events GROUP BY 1, 2),
        |l AS (SELECT event_type, day, x,
        |  lag(x, 1) OVER (PARTITION BY event_type ORDER BY day) AS x1,
        |  lag(x, 7) OVER (PARTITION BY event_type ORDER BY day) AS x7 FROM d),
        |pairs AS (
        |  SELECT event_type, CAST(1 AS BIGINT) AS lag, x1 AS xa, x AS xb FROM l WHERE x1 IS NOT NULL
        |  UNION ALL
        |  SELECT event_type, CAST(7 AS BIGINT) AS lag, x7 AS xa, x AS xb FROM l WHERE x7 IS NOT NULL),
        |s AS (SELECT event_type, lag, count(*) AS n, sum(xa) AS sx, sum(xb) AS sy,
        |  sum(xa * xa) AS sxx, sum(xb * xb) AS syy, sum(xa * xb) AS sxy
        |  FROM pairs GROUP BY 1, 2)
        |SELECT event_type, lag, n, (round(CASE
        |  WHEN sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) > 0
        |   AND sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) > 0
        |  THEN (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
        |    (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) *
        |     sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
        |  END, 4) + 0.0) AS r
        |FROM s ORDER BY 1, 2""".stripMargin,
    "q177_survival" ->
      // same ordered running ln-sum as the Spark side; the everyone-
      // converts case rides a cumulative zero-flag (Spark ln(0) is NULL,
      // libm's is −inf — neither crosses engines safely)
      """WITH entry AS (SELECT user_id, min(CAST(ts AS TIMESTAMP)) AS t0
        |  FROM events WHERE event_type = 'view' GROUP BY 1),
        |hit AS (SELECT e.user_id, min(CAST(p.ts AS TIMESTAMP)) AS te
        |  FROM entry e JOIN events p ON p.user_id = e.user_id
        |  AND p.event_type = 'purchase' AND CAST(p.ts AS TIMESTAMP) >= e.t0 GROUP BY 1),
        |hz AS (SELECT max(CAST(ts AS TIMESTAMP)) AS h FROM events),
        |d AS (SELECT entry.user_id,
        |  CASE WHEN te IS NOT NULL THEN date_diff('day', CAST(t0 AS DATE), CAST(te AS DATE))
        |    ELSE date_diff('day', CAST(t0 AS DATE), CAST(h AS DATE)) END AS dur,
        |  te IS NOT NULL AS ev FROM entry LEFT JOIN hit USING (user_id) CROSS JOIN hz),
        |g AS (SELECT dur, sum(CASE WHEN ev THEN 1 ELSE 0 END) AS events,
        |  sum(CASE WHEN ev THEN 0 ELSE 1 END) AS censored FROM d GROUP BY 1),
        |t AS (SELECT count(*) AS total FROM d),
        |w AS (SELECT dur, events, censored,
        |  total - coalesce(sum(events + censored) OVER (ORDER BY dur
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS at_risk
        |  FROM g CROSS JOIN t),
        |s AS (SELECT dur, events, censored, at_risk,
        |  sum(CASE WHEN events > 0 AND at_risk > events
        |    THEN ln(CAST(at_risk - events AS DOUBLE) / at_risk)
        |    ELSE CAST(0.0 AS DOUBLE) END)
        |    OVER (ORDER BY dur ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumln,
        |  sum(CASE WHEN events > 0 AND at_risk = events THEN 1 ELSE 0 END)
        |    OVER (ORDER BY dur ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS zeroed
        |  FROM w)
        |SELECT dur AS duration_days, CAST(at_risk AS BIGINT) AS at_risk,
        |  CAST(events AS BIGINT) AS events, CAST(censored AS BIGINT) AS censored,
        |  CASE WHEN zeroed > 0 THEN CAST(0.0 AS DOUBLE)
        |    ELSE (round(exp(cumln), 4) + 0.0) END AS survival
        |FROM s ORDER BY 1""".stripMargin,
    "q178_bm25" ->
      // identical float shapes: idf, the length normalizer, the ordered
      // per-doc term fold; rank over the ROUNDED score after the limit
      """WITH raw AS (SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '\s+'),
        |    t -> length(t) > 0) AS arr FROM documents),
        |lens AS (SELECT doc_id, len(arr) AS len FROM raw),
        |st AS (SELECT count(*) AS n, sum(len) AS tl FROM lens),
        |tok AS (SELECT doc_id, unnest(arr) AS tok FROM raw),
        |tf AS (SELECT doc_id, tok, count(*) AS tf FROM tok
        |  WHERE tok IN ('join', 'filter', 'scan') GROUP BY 1, 2),
        |df AS (SELECT tok, count(*) AS df FROM tf GROUP BY 1),
        |sc AS (SELECT tf.doc_id, tf.tok,
        |  ln(1.0 + (CAST(st.n - df.df AS DOUBLE) + 0.5) / (CAST(df.df AS DOUBLE) + 0.5)) *
        |  (CAST(tf.tf AS DOUBLE) * 2.2) /
        |  (CAST(tf.tf AS DOUBLE) + 1.2 * (0.25 + 0.75 *
        |    (CAST(lens.len AS DOUBLE) / (CAST(st.tl AS DOUBLE) / st.n)))) AS s
        |  FROM tf JOIN df USING (tok) JOIN lens ON tf.doc_id = lens.doc_id CROSS JOIN st),
        |agg AS (SELECT doc_id, (round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |    list(s ORDER BY tok)), (a, b) -> a + b), 4) + 0.0) AS bm25 FROM sc GROUP BY 1),
        |top AS (SELECT doc_id, bm25 FROM agg ORDER BY bm25 DESC, doc_id LIMIT 20)
        |SELECT doc_id, bm25,
        |  CAST(row_number() OVER (ORDER BY bm25 DESC, doc_id) AS BIGINT) AS rank
        |FROM top ORDER BY rank""".stripMargin,
    "q179_bollinger" ->
      // breakout decided on exact integers: (7x − Σx)² > 4·(7·Σx² − Σx²̂)
      """WITH d AS (SELECT event_type, strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS day,
        |  count(*) AS x FROM events GROUP BY 1, 2),
        |w AS (SELECT event_type, day, x,
        |  count(*) OVER f AS cnt, sum(x) OVER f AS sx, sum(x * x) OVER f AS sxx
        |  FROM d WINDOW f AS (PARTITION BY event_type ORDER BY day
        |    ROWS BETWEEN 6 PRECEDING AND CURRENT ROW))
        |SELECT event_type, day, CAST(x AS BIGINT) AS x,
        |  (round(CAST(sx AS DOUBLE) / 7, 4) + 0.0) AS mean,
        |  (round(sqrt(CAST(7 AS DOUBLE) * CAST(sxx AS DOUBLE) -
        |    CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) / 7, 4) + 0.0) AS sd,
        |  (7 * x - sx) * (7 * x - sx) > 4 * (7 * sxx - sx * sx) AS breakout
        |FROM w WHERE cnt = 7 ORDER BY event_type, day""".stripMargin,
    "q180_top_movers" ->
      // sign-split division: magnitudes divide on non-negative operands
      """WITH s AS (SELECT event_type,
        |  date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) // 7 AS week,
        |  count(*) AS x FROM events GROUP BY 1, 2),
        |l AS (SELECT event_type, week, x,
        |  lag(x, 1) OVER (PARTITION BY event_type ORDER BY week) AS prev FROM s)
        |SELECT event_type, week, CAST(prev AS BIGINT) AS prev, CAST(x AS BIGINT) AS cur,
        |  CASE WHEN prev > 0 THEN
        |    CASE WHEN x >= prev THEN CAST(((x - prev) * 10000) // prev AS BIGINT)
        |    ELSE -CAST(((prev - x) * 10000) // prev AS BIGINT) END END AS change_bp
        |FROM l WHERE prev IS NOT NULL ORDER BY event_type, week""".stripMargin,
    "q181_ewma" ->
      // list_reduce seeds from the head exactly like the engine's
      // aggregate-over-tail; same fold expression text → same IEEE sequence
      """WITH d AS (SELECT event_type, strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS day,
        |  count(*) AS x FROM events GROUP BY 1, 2)
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n_buckets,
        |  (round(list_reduce(list(CAST(x AS DOUBLE) ORDER BY day),
        |    (acc, e) -> acc * 0.7 + e * 0.3), 4) + 0.0) AS ewma
        |FROM d GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q182_twap" ->
      // epoch_us ≡ unix_micros; weighted sums ride HUGEINT ≡ decimal(38,0)
      """WITH e AS (SELECT event_type, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us,
        |    CAST(round(value * 100, 0) AS BIGINT) AS cents FROM events),
        |d AS (SELECT event_type, cents,
        |    lead(us, 1) OVER (PARTITION BY event_type ORDER BY us, event_id) - us AS dur
        |  FROM e),
        |f AS (SELECT event_type, count(*) AS n_obs, sum(dur) AS sw,
        |    sum(CAST(cents AS HUGEINT) * dur) AS swv
        |  FROM d WHERE dur IS NOT NULL GROUP BY 1)
        |SELECT event_type, CAST(n_obs AS BIGINT) AS n_obs, CAST(sw AS BIGINT) AS total_us,
        |  (round(CAST(swv AS DOUBLE) / CAST(sw AS DOUBLE), 4) + 0.0) AS twap_cents
        |FROM f WHERE sw > 0 ORDER BY event_type""".stripMargin,
    "q183_cohort_retention" ->
      """WITH wk AS (SELECT DISTINCT user_id,
        |    date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) // 7 AS w FROM events),
        |f AS (SELECT user_id, min(w) AS w0 FROM wk GROUP BY 1),
        |m AS (SELECT w0 AS cohort_week, w - w0 AS week_offset, count(*) AS n_users
        |  FROM wk JOIN f USING (user_id) GROUP BY 1, 2),
        |s AS (SELECT cohort_week, n_users AS size FROM m WHERE week_offset = 0)
        |SELECT m.cohort_week, m.week_offset, CAST(m.n_users AS BIGINT) AS n_users,
        |  CAST((10000 * m.n_users) // s.size AS BIGINT) AS retained_bp
        |FROM m JOIN s USING (cohort_week) ORDER BY cohort_week, week_offset""".stripMargin,
    "q184_benford" ->
      // digit bucketing is a string op; the only doubles are the 4-dp
      // expected-share constants (identical formula text)
      """WITH c AS (SELECT CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents FROM orders),
        |d AS (SELECT CAST(substr(CAST(cents AS VARCHAR), 1, 1) AS BIGINT) AS digit,
        |    count(*) AS n FROM c WHERE cents > 0 GROUP BY 1),
        |t AS (SELECT sum(n) AS tot FROM d),
        |b AS (SELECT digit, CAST(n AS BIGINT) AS n,
        |    CAST((10000 * n) // tot AS BIGINT) AS share_bp,
        |    (round(log10(CAST(1 AS DOUBLE) + CAST(1 AS DOUBLE) / digit) * 10000, 4) + 0.0)
        |      AS expected_bp
        |  FROM d, t)
        |SELECT digit, n, share_bp, expected_bp,
        |  (round(CAST(share_bp AS DOUBLE) - expected_bp, 4) + 0.0) AS gap_bp
        |FROM b ORDER BY digit""".stripMargin,
    "q185_clustering_coeff" ->
      // q125's u<v<w triangle enumeration plus degrees from the same
      // canonical pair list; coefficient = triangles over deg-choose-2
      """WITH e AS (SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
        |  FROM lineitem a JOIN lineitem b
        |  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
        |t AS (SELECT e1.u AS a, e1.v AS b, e2.v AS c
        |  FROM e e1 JOIN e e2 ON e1.v = e2.u
        |  JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v),
        |n AS (SELECT unnest([a, b, c]) AS node FROM t),
        |tri AS (SELECT node, count(*) AS triangles FROM n GROUP BY 1),
        |deg AS (SELECT node, count(*) AS deg FROM (
        |    SELECT u AS node FROM e UNION ALL SELECT v AS node FROM e) GROUP BY 1),
        |m AS (SELECT d.node, CAST(d.deg AS BIGINT) AS deg,
        |    CAST(coalesce(tri.triangles, 0) AS BIGINT) AS triangles,
        |    CAST(d.deg * (d.deg - 1) // 2 AS BIGINT) AS wedges
        |  FROM deg d LEFT JOIN tri USING (node) WHERE d.deg >= 2)
        |SELECT node, deg, triangles, wedges,
        |  CAST((10000 * triangles) // wedges AS BIGINT) AS coeff_bp
        |FROM m ORDER BY coeff_bp DESC, triangles DESC, node LIMIT 30""".stripMargin,
    "q186_audience_overlap" ->
      """WITH m AS (SELECT DISTINCT user_id AS u, event_type AS s FROM events
        |    WHERE user_id IS NOT NULL AND event_type IS NOT NULL),
        |sz AS (SELECT s, count(*) AS n FROM m GROUP BY 1),
        |i AS (SELECT a.s AS seg_a, b.s AS seg_b, count(*) AS n_both
        |  FROM m a JOIN m b ON a.u = b.u AND a.s < b.s GROUP BY 1, 2)
        |SELECT seg_a, seg_b, CAST(x.n AS BIGINT) AS n_a, CAST(y.n AS BIGINT) AS n_b,
        |  CAST(n_both AS BIGINT) AS n_both,
        |  CAST((10000 * n_both) // (x.n + y.n - n_both) AS BIGINT) AS jaccard_bp
        |FROM i JOIN sz x ON i.seg_a = x.s JOIN sz y ON i.seg_b = y.s
        |ORDER BY seg_a, seg_b""".stripMargin,
    "q187_pivot" ->
      """SELECT strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS day,
        |  count(*) FILTER (WHERE event_type = 'click') AS click,
        |  count(*) FILTER (WHERE event_type = 'error') AS error,
        |  count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
        |  count(*) FILTER (WHERE event_type = 'signup') AS signup,
        |  count(*) FILTER (WHERE event_type = 'view') AS view
        |FROM events GROUP BY 1 ORDER BY day""".stripMargin,
    "q188_session_stats" ->
      // q57's gap-break reconstruction, summarized; quantile_disc ≡
      // percentile_disc, durations in exact epoch_us
      """WITH x AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS t,
        |  CASE WHEN lag(CAST(ts AS TIMESTAMP)) OVER w IS NULL
        |       OR CAST(ts AS TIMESTAMP) - lag(CAST(ts AS TIMESTAMP)) OVER w > INTERVAL 30 MINUTE
        |       THEN 1 ELSE 0 END AS brk
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |y AS (SELECT user_id, t, sum(brk) OVER (PARTITION BY user_id ORDER BY t) AS sid FROM x),
        |s AS (SELECT user_id, sid, epoch_us(max(t)) - epoch_us(min(t)) AS dur,
        |    count(*) AS ev FROM y GROUP BY 1, 2)
        |SELECT CAST(count(*) AS BIGINT) AS n_sessions,
        |  CAST(quantile_disc(dur, 0.5) AS BIGINT) AS p50_dur_us,
        |  CAST(quantile_disc(dur, 0.9) AS BIGINT) AS p90_dur_us,
        |  CAST(quantile_disc(ev, 0.5) AS BIGINT) AS p50_events,
        |  CAST((100 * sum(ev)) // count(*) AS BIGINT) AS avg_events_x100
        |FROM s""".stripMargin,
    "q189_rrf_fusion" ->
      // q178's BM25 list fused with a length ranking; reciprocal terms in
      // fixed order, fused rank over the ROUNDED score
      """WITH raw AS (SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '\s+'),
        |    t -> length(t) > 0) AS arr FROM documents),
        |lens AS (SELECT doc_id, len(arr) AS len FROM raw),
        |st AS (SELECT count(*) AS n, sum(len) AS tl FROM lens),
        |tok AS (SELECT doc_id, unnest(arr) AS tok FROM raw),
        |tf AS (SELECT doc_id, tok, count(*) AS tf FROM tok
        |  WHERE tok IN ('join', 'filter', 'scan') GROUP BY 1, 2),
        |df AS (SELECT tok, count(*) AS df FROM tf GROUP BY 1),
        |sc AS (SELECT tf.doc_id, tf.tok,
        |  ln(1.0 + (CAST(st.n - df.df AS DOUBLE) + 0.5) / (CAST(df.df AS DOUBLE) + 0.5)) *
        |  (CAST(tf.tf AS DOUBLE) * 2.2) /
        |  (CAST(tf.tf AS DOUBLE) + 1.2 * (0.25 + 0.75 *
        |    (CAST(lens.len AS DOUBLE) / (CAST(st.tl AS DOUBLE) / st.n)))) AS s
        |  FROM tf JOIN df USING (tok) JOIN lens ON tf.doc_id = lens.doc_id CROSS JOIN st),
        |agg AS (SELECT doc_id, (round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |    list(s ORDER BY tok)), (a, b) -> a + b), 4) + 0.0) AS bm25 FROM sc GROUP BY 1),
        |top AS (SELECT doc_id, bm25 FROM agg ORDER BY bm25 DESC, doc_id LIMIT 20),
        |la AS (SELECT doc_id,
        |  CAST(row_number() OVER (ORDER BY bm25 DESC, doc_id) AS BIGINT) AS rank_0 FROM top),
        |lb AS (SELECT doc_id, rank_1 FROM (SELECT doc_id,
        |    CAST(row_number() OVER (ORDER BY n_chars DESC, doc_id) AS BIGINT) AS rank_1
        |  FROM documents) WHERE rank_1 <= 20),
        |j AS (SELECT coalesce(la.doc_id, lb.doc_id) AS doc_id, la.rank_0, lb.rank_1,
        |  (round(coalesce(CAST(1 AS DOUBLE) / (CAST(60 AS DOUBLE) + la.rank_0), CAST(0 AS DOUBLE)) +
        |    coalesce(CAST(1 AS DOUBLE) / (CAST(60 AS DOUBLE) + lb.rank_1), CAST(0 AS DOUBLE)), 4) + 0.0) AS rrf
        |  FROM la FULL OUTER JOIN lb ON la.doc_id = lb.doc_id)
        |SELECT doc_id, rank_0, rank_1, rrf,
        |  CAST(row_number() OVER (ORDER BY rrf DESC, doc_id) AS BIGINT) AS fused_rank
        |FROM j ORDER BY fused_rank""".stripMargin,
    "q190_jsd" ->
      // 0·ln0 ≡ 0 encoded as the same CASE guard; category-sorted fold,
      // halved then rounded — identical formula text
      """WITH p AS (SELECT event_type AS cat,
        |    CASE WHEN CAST(ts AS DATE) < DATE '2024-01-16' THEN 'a' ELSE 'b' END AS period
        |  FROM events),
        |c AS (SELECT cat, count(*) FILTER (WHERE period = 'a') AS ca,
        |    count(*) FILTER (WHERE period = 'b') AS cb FROM p GROUP BY 1),
        |t AS (SELECT sum(ca) AS na, sum(cb) AS nb FROM c),
        |r AS (SELECT cat, na, nb, CAST(ca AS DOUBLE) / na AS pa,
        |    CAST(cb AS DOUBLE) / nb AS pb FROM c, t),
        |s AS (SELECT cat, na, nb,
        |    (CASE WHEN pa > 0 THEN pa * ln(pa / ((pa + pb) / 2)) ELSE CAST(0 AS DOUBLE) END +
        |     CASE WHEN pb > 0 THEN pb * ln(pb / ((pa + pb) / 2)) ELSE CAST(0 AS DOUBLE) END) AS term
        |  FROM r)
        |SELECT CAST(max(na) AS BIGINT) AS n_a, CAST(max(nb) AS BIGINT) AS n_b,
        |  CAST(count(*) AS BIGINT) AS n_cats,
        |  (round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list(term ORDER BY cat)),
        |    (a, b) -> a + b) / 2, 4) + 0.0) AS jsd
        |FROM s""".stripMargin,
    "q191_kcore" ->
      // the same 3 peel rounds unrolled; degree recounted AFTER the last
      // restriction, exactly like the engine's loop
      """WITH e0 AS MATERIALIZED (SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
        |  FROM lineitem a JOIN lineitem b
        |  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
        |d1 AS MATERIALIZED (SELECT node, count(*) AS d FROM (
        |    SELECT u AS node FROM e0 UNION ALL SELECT v FROM e0) GROUP BY 1),
        |n1 AS MATERIALIZED (SELECT node FROM d1 WHERE d >= 6),
        |e1 AS MATERIALIZED (SELECT u, v FROM e0 WHERE u IN (SELECT node FROM n1)
        |  AND v IN (SELECT node FROM n1)),
        |d2 AS MATERIALIZED (SELECT node, count(*) AS d FROM (
        |    SELECT u AS node FROM e1 UNION ALL SELECT v FROM e1) GROUP BY 1),
        |n2 AS MATERIALIZED (SELECT node FROM d2 WHERE d >= 6),
        |e2 AS MATERIALIZED (SELECT u, v FROM e1 WHERE u IN (SELECT node FROM n2)
        |  AND v IN (SELECT node FROM n2)),
        |d3 AS MATERIALIZED (SELECT node, count(*) AS d FROM (
        |    SELECT u AS node FROM e2 UNION ALL SELECT v FROM e2) GROUP BY 1),
        |n3 AS MATERIALIZED (SELECT node FROM d3 WHERE d >= 6),
        |e3 AS MATERIALIZED (SELECT u, v FROM e2 WHERE u IN (SELECT node FROM n3)
        |  AND v IN (SELECT node FROM n3)),
        |f AS MATERIALIZED (SELECT node, count(*) AS deg FROM (
        |    SELECT u AS node FROM e3 UNION ALL SELECT v FROM e3) GROUP BY 1)
        |SELECT node, CAST(deg AS BIGINT) AS deg FROM f
        |ORDER BY deg DESC, node LIMIT 50""".stripMargin,
    "q192_clamped_balance" ->
      // same fold, same zero floor, pure BIGINT arithmetic
      """WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS t, event_id,
        |    CASE WHEN event_type = 'purchase' THEN -CAST(round(value * 100, 0) AS BIGINT)
        |         ELSE CAST(round(value * 100, 0) AS BIGINT) END AS delta
        |  FROM events)
        |SELECT user_id, CAST(count(*) AS BIGINT) AS n_steps,
        |  list_reduce(list_prepend(CAST(0 AS BIGINT), list(delta ORDER BY t, event_id)),
        |    (acc, x) -> greatest(acc + x, CAST(0 AS BIGINT))) AS balance
        |FROM e GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q193_max_concurrency" ->
      // ±1 sweep over the q57 sessions; starts order before ends at the
      // same instant (end-inclusive), running sum peaks at the answer
      """WITH x AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS t,
        |  CASE WHEN lag(CAST(ts AS TIMESTAMP)) OVER w IS NULL
        |       OR CAST(ts AS TIMESTAMP) - lag(CAST(ts AS TIMESTAMP)) OVER w > INTERVAL 30 MINUTE
        |       THEN 1 ELSE 0 END AS brk
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |y AS (SELECT user_id, t, sum(brk) OVER (PARTITION BY user_id ORDER BY t) AS sid FROM x),
        |s AS (SELECT user_id, sid, min(t) AS st, max(t) AS en FROM y GROUP BY 1, 2),
        |sw AS (SELECT epoch_us(st) AS t, 1 AS d FROM s
        |  UNION ALL SELECT epoch_us(en) AS t, -1 AS d FROM s),
        |r AS (SELECT sum(d) OVER (ORDER BY t, -d ROWS UNBOUNDED PRECEDING) AS running FROM sw)
        |SELECT CAST((SELECT count(*) FROM s) AS BIGINT) AS n_sessions,
        |  CAST(max(running) AS BIGINT) AS max_concurrent FROM r""".stripMargin,
    "q194_theil" ->
      // same decomposition: member folds per group, group folds over the
      // nation list, total DEFINED as between + within
      """WITH rows0 AS (SELECT n_name AS g,
        |    CAST(round(o_totalprice * 100, 0) AS BIGINT) AS x
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey),
        |grp AS (SELECT g, count(*) AS ng, sum(x) AS sxg FROM rows0 GROUP BY 1),
        |tot AS (SELECT sum(ng) AS n, sum(sxg) AS sx FROM grp),
        |gs AS (SELECT g, ng, sxg, n, sx,
        |    CAST(sxg AS DOUBLE) / ng AS mug, CAST(sx AS DOUBLE) / n AS mu
        |  FROM grp, tot),
        |w AS (SELECT r.g, list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |    list((r.x / gs.mug) * ln(r.x / gs.mug) ORDER BY r.x)),
        |    (a, b) -> a + b) AS tsum
        |  FROM rows0 r JOIN gs USING (g) GROUP BY r.g),
        |f AS (SELECT gs.g, gs.n, gs.ng,
        |    (CAST(gs.sxg AS DOUBLE) / CAST(gs.sx AS DOUBLE)) * ln(gs.mug / gs.mu) AS bterm,
        |    (CAST(gs.sxg AS DOUBLE) / CAST(gs.sx AS DOUBLE)) * (w.tsum / gs.ng) AS wterm
        |  FROM gs JOIN w USING (g)),
        |z AS (SELECT CAST(max(n) AS BIGINT) AS n, CAST(count(*) AS BIGINT) AS n_groups,
        |  (round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list(bterm ORDER BY g)),
        |    (a, b) -> a + b), 4) + 0.0) AS t_between,
        |  (round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list(wterm ORDER BY g)),
        |    (a, b) -> a + b), 4) + 0.0) AS t_within
        |  FROM f)
        |SELECT n, n_groups, t_between, t_within,
        |  (round(t_between + t_within, 4) + 0.0) AS t_total FROM z""".stripMargin,
    "q195_weighted_median" ->
      // explicit ROWS frame mirrors the engine's two-phase row-wise
      // cumulative; the pick is total-order-first with 2·cum ≥ total
      """WITH x AS (SELECT CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS cents,
        |    CAST(l_quantity AS BIGINT) AS q, l_orderkey, l_linenumber FROM lineitem),
        |w AS (SELECT cents, l_orderkey, l_linenumber,
        |    sum(q) OVER (ORDER BY cents, l_orderkey, l_linenumber
        |      ROWS UNBOUNDED PRECEDING) AS cw,
        |    (SELECT sum(q) FROM x) AS tot FROM x)
        |SELECT cents AS median_amount, CAST(tot AS BIGINT) AS total_weight
        |FROM w WHERE 2 * cw >= tot
        |ORDER BY cents, l_orderkey, l_linenumber LIMIT 1""".stripMargin,
    "q196_lorenz" ->
      // window ntile ≡ the engine's two-phase rank allocation
      // (TwoPhaseSpec pins the parity)
      """WITH sp AS (SELECT o_custkey,
        |    sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS spend
        |  FROM orders GROUP BY 1),
        |d AS (SELECT spend, ntile(10) OVER (ORDER BY spend, o_custkey) AS decile FROM sp),
        |g AS (SELECT decile, count(*) AS n, sum(spend) AS amt FROM d GROUP BY 1),
        |t AS (SELECT sum(amt) AS tot FROM g),
        |c AS (SELECT decile, n, amt,
        |    sum(amt) OVER (ORDER BY decile ROWS UNBOUNDED PRECEDING) AS cum FROM g)
        |SELECT CAST(decile AS BIGINT) AS decile, CAST(n AS BIGINT) AS n,
        |  CAST(amt AS BIGINT) AS amount,
        |  CAST((10000 * amt) // tot AS BIGINT) AS share_bp,
        |  CAST((10000 * cum) // tot AS BIGINT) AS cum_share_bp
        |FROM c, t ORDER BY decile""".stripMargin,
    "q197_trimmed_mean" ->
      """WITH x AS (SELECT event_type, CAST(round(value * 100, 0) AS BIGINT) AS cents
        |  FROM events),
        |b AS (SELECT event_type, quantile_disc(cents, 0.05) AS lo,
        |    quantile_disc(cents, 0.95) AS hi FROM x GROUP BY 1),
        |k AS (SELECT x.event_type, cents, lo, hi FROM x JOIN b USING (event_type)
        |  WHERE cents >= lo AND cents <= hi)
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n_kept,
        |  CAST(max(lo) AS BIGINT) AS lo, CAST(max(hi) AS BIGINT) AS hi,
        |  CAST((100 * sum(cents)) // count(*) AS BIGINT) AS mean_x100
        |FROM k GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q198_mode" ->
      """WITH j AS (SELECT n_name, o_orderpriority AS v FROM orders
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey),
        |c AS (SELECT n_name, v, count(*) AS n FROM j GROUP BY 1, 2),
        |r AS (SELECT n_name, v, n,
        |    row_number() OVER (PARTITION BY n_name ORDER BY n DESC, v) AS rn FROM c)
        |SELECT n_name, v AS mode_value, CAST(n AS BIGINT) AS n
        |FROM r WHERE rn = 1 ORDER BY n_name""".stripMargin,
    "q199_streak" ->
      // gaps-and-islands: consecutive day numbers share dd − row_number()
      """WITH d AS (SELECT DISTINCT user_id,
        |    date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS dd FROM events),
        |i AS (SELECT user_id, dd,
        |    dd - row_number() OVER (PARTITION BY user_id ORDER BY dd) AS isl FROM d),
        |l AS (SELECT user_id, count(*) AS len FROM i GROUP BY user_id, isl),
        |m AS (SELECT user_id, max(len) AS streak_days FROM l GROUP BY 1)
        |SELECT CAST(streak_days AS BIGINT) AS streak_days,
        |  CAST(count(*) AS BIGINT) AS n_users
        |FROM m GROUP BY 1 ORDER BY streak_days""".stripMargin,
    "q200_holt" ->
      // recursive CTE with PURE step semantics and the engine's exact
      // lambda text. (A struct-state list_reduce was tried first and
      // silently diverged: DuckDB evaluates lambda struct fields
      // sequentially and mutates the accumulator IN PLACE, so the trend
      // field saw the freshly-assigned level — don't fold multi-field
      // state through list_reduce.)
      """WITH RECURSIVE d AS (SELECT event_type,
        |    strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS day, count(*) AS x
        |  FROM events GROUP BY 1, 2),
        |ser AS (SELECT event_type,
        |    row_number() OVER (PARTITION BY event_type ORDER BY day) AS rn,
        |    CAST(x AS DOUBLE) AS x FROM d),
        |nb AS (SELECT event_type, max(rn) AS n FROM ser GROUP BY 1),
        |rec AS (
        |  SELECT s2.event_type, CAST(2 AS BIGINT) AS rn, s2.x AS l, s2.x - s1.x AS b
        |  FROM ser s1 JOIN ser s2 ON s1.event_type = s2.event_type
        |    AND s1.rn = 1 AND s2.rn = 2
        |  UNION ALL
        |  SELECT r.event_type, r.rn + 1,
        |    0.3 * s.x + 0.7 * (r.l + r.b),
        |    0.1 * (0.3 * s.x + 0.7 * (r.l + r.b) - r.l) + 0.9 * r.b
        |  FROM rec r JOIN ser s ON s.event_type = r.event_type AND s.rn = r.rn + 1)
        |SELECT r.event_type, CAST(nb.n AS BIGINT) AS n_buckets,
        |  (round(r.l, 4) + 0.0) AS level, (round(r.b, 4) + 0.0) AS trend,
        |  (round(r.l + r.b, 4) + 0.0) AS forecast
        |FROM rec r JOIN nb ON r.event_type = nb.event_type AND r.rn = nb.n
        |WHERE nb.n >= 2 ORDER BY r.event_type""".stripMargin,
    "q201_bfs_hops" ->
      // 3 unrolled frontier expansions from the same max-degree seed
      """WITH p AS MATERIALIZED (SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
        |  FROM lineitem a JOIN lineitem b
        |  ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey),
        |deg AS MATERIALIZED (SELECT u AS node, count(*) AS d FROM p GROUP BY 1),
        |seed AS MATERIALIZED (SELECT node FROM deg ORDER BY d DESC, node LIMIT 1),
        |v0 AS MATERIALIZED (SELECT node FROM seed),
        |f1 AS MATERIALIZED (SELECT DISTINCT v AS node FROM p WHERE u IN (SELECT node FROM v0)
        |  AND v NOT IN (SELECT node FROM v0)),
        |v1 AS MATERIALIZED (SELECT node FROM v0 UNION ALL SELECT node FROM f1),
        |f2 AS MATERIALIZED (SELECT DISTINCT v AS node FROM p WHERE u IN (SELECT node FROM f1)
        |  AND v NOT IN (SELECT node FROM v1)),
        |v2 AS MATERIALIZED (SELECT node FROM v1 UNION ALL SELECT node FROM f2),
        |f3 AS MATERIALIZED (SELECT DISTINCT v AS node FROM p WHERE u IN (SELECT node FROM f2)
        |  AND v NOT IN (SELECT node FROM v2)),
        |h AS MATERIALIZED (SELECT 0 AS hop, count(*) AS n FROM v0
        |  UNION ALL SELECT 1, count(*) FROM f1
        |  UNION ALL SELECT 2, count(*) FROM f2
        |  UNION ALL SELECT 3, count(*) FROM f3)
        |SELECT CAST(hop AS BIGINT) AS hop, CAST(n AS BIGINT) AS n_nodes
        |FROM h WHERE n > 0 ORDER BY hop""".stripMargin,
    "q202_systematic" ->
      // window row_number ≡ the engine's two-phase global rank
      """WITH r AS (SELECT doc_id, n_chars,
        |    row_number() OVER (ORDER BY n_chars, doc_id) AS rank FROM documents)
        |SELECT doc_id, n_chars, CAST(rank AS BIGINT) AS rank
        |FROM r WHERE rank % 100 = 1 ORDER BY rank""".stripMargin,
    "q203_entity_resolution" ->
      // q127's blocked pairs + min-label components, singletons
      // self-canonical via the left-join coalesce. The two blocking
      // predicates run as SEPARATE equi-joins UNIONed (identical pair set
      // to the original OR-join form, which no engine can hash-join — at
      // sf1 the OR forced a 150k×150k nested loop and the oracle timed out)
      s"""WITH c AS MATERIALIZED (SELECT c_custkey, c_name FROM customer
        |    UNION ALL SELECT * FROM (VALUES (900000001, 'Customer#A00001111'),
        |      (900000002, 'Customer#B00001111')) t(c_custkey, c_name)),
        |cand AS (SELECT a.c_custkey AS key_a, b.c_custkey AS key_b,
        |    a.c_name AS name_a, b.c_name AS name_b FROM c a JOIN c b
        |  ON substr(a.c_name, 1, 16) = substr(b.c_name, 1, 16)
        |    AND a.c_custkey < b.c_custkey
        |  UNION
        |  SELECT a.c_custkey, b.c_custkey, a.c_name, b.c_name FROM c a JOIN c b
        |  ON length(a.c_name) = length(b.c_name)
        |    AND substr(a.c_name, -8) = substr(b.c_name, -8)
        |    AND a.c_custkey < b.c_custkey),
        |p AS (SELECT key_a, key_b FROM cand
        |  WHERE levenshtein(name_a, name_b) <= 1),
        |e AS MATERIALIZED (SELECT key_a AS src, key_b AS dst FROM p
        |  UNION SELECT key_b, key_a FROM p),
        |${minLabelCc()},
        |lab AS (SELECT node AS a, lab AS entity FROM l$ccRounds),
        |m AS (SELECT c.c_custkey, coalesce(lab.entity, c.c_custkey) AS entity_id
        |  FROM c LEFT JOIN lab ON c.c_custkey = lab.a),
        |sz AS (SELECT entity_id, count(*) AS cluster_size FROM m GROUP BY 1)
        |SELECT m.c_custkey, m.entity_id, m.c_custkey = m.entity_id AS is_canonical,
        |  CAST(sz.cluster_size AS BIGINT) AS cluster_size
        |FROM m JOIN sz USING (entity_id) ORDER BY m.c_custkey""".stripMargin,
    "q204_bigram_lm" -> q204Sql,
    "q205_srm" ->
      // two-cell chi-square: flag (n_a - n_b)^2 * 100 > 384 * n on exact ints
      """WITH a AS (SELECT event_type,
        |    count(*) FILTER (WHERE user_id % 2 = 0) AS n_a,
        |    count(*) FILTER (WHERE user_id % 2 = 1) AS n_b
        |  FROM events GROUP BY 1)
        |SELECT event_type, CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
        |  (round(CAST(n_a - n_b AS DOUBLE) * CAST(n_a - n_b AS DOUBLE)
        |    / CAST(n_a + n_b AS DOUBLE), 4) + 0.0) AS chi2,
        |  (n_a - n_b) * (n_a - n_b) * 100 > 384 * (n_a + n_b) AS srm_flag
        |FROM a ORDER BY event_type""".stripMargin,
    "q206_did" ->
      // four exact cells from one pass; means and the DiD share formula
      // text with the engine (sum/count casts, rounding order)
      """WITH e AS (SELECT user_id % 2 AS arm,
        |    CASE WHEN CAST(ts AS DATE) < DATE '2024-01-16' THEN 'a' ELSE 'b' END AS period,
        |    CAST(round(value * 100, 0) AS BIGINT) AS cents FROM events),
        |c AS (SELECT
        |    sum(cents) FILTER (WHERE arm = 0 AND period = 'a') AS sca,
        |    count(*) FILTER (WHERE arm = 0 AND period = 'a') AS n_c_pre,
        |    sum(cents) FILTER (WHERE arm = 0 AND period = 'b') AS scb,
        |    count(*) FILTER (WHERE arm = 0 AND period = 'b') AS n_c_post,
        |    sum(cents) FILTER (WHERE arm = 1 AND period = 'a') AS sta,
        |    count(*) FILTER (WHERE arm = 1 AND period = 'a') AS n_t_pre,
        |    sum(cents) FILTER (WHERE arm = 1 AND period = 'b') AS stb,
        |    count(*) FILTER (WHERE arm = 1 AND period = 'b') AS n_t_post
        |  FROM e)
        |SELECT CAST(n_c_pre AS BIGINT) AS n_c_pre, CAST(n_c_post AS BIGINT) AS n_c_post,
        |  CAST(n_t_pre AS BIGINT) AS n_t_pre, CAST(n_t_post AS BIGINT) AS n_t_post,
        |  (round(CAST(sca AS DOUBLE) / CAST(n_c_pre AS DOUBLE), 4) + 0.0) AS m_c_pre,
        |  (round(CAST(scb AS DOUBLE) / CAST(n_c_post AS DOUBLE), 4) + 0.0) AS m_c_post,
        |  (round(CAST(sta AS DOUBLE) / CAST(n_t_pre AS DOUBLE), 4) + 0.0) AS m_t_pre,
        |  (round(CAST(stb AS DOUBLE) / CAST(n_t_post AS DOUBLE), 4) + 0.0) AS m_t_post,
        |  (round((CAST(stb AS DOUBLE) / CAST(n_t_post AS DOUBLE)
        |      - CAST(sta AS DOUBLE) / CAST(n_t_pre AS DOUBLE))
        |    - (CAST(scb AS DOUBLE) / CAST(n_c_post AS DOUBLE)
        |      - CAST(sca AS DOUBLE) / CAST(n_c_pre AS DOUBLE)), 4) + 0.0) AS did
        |FROM c WHERE n_c_pre > 0 AND n_c_post > 0 AND n_t_pre > 0 AND n_t_post > 0""".stripMargin,
    "q207_ks_drift" ->
      // exact-integer KS: D numerator = max |cumA·nB − cumB·nA| over the
      // pooled distinct cents; flag squares the 1.358·sqrt bound into
      // hugeint arithmetic (≡ the engine's decimal(38,0))
      """WITH e AS (SELECT user_id % 2 AS arm,
        |    CAST(round(value * 100, 0) AS BIGINT) AS cents FROM events),
        |g AS (SELECT cents,
        |    count(*) FILTER (WHERE arm = 0) AS na,
        |    count(*) FILTER (WHERE arm = 1) AS nb FROM e GROUP BY 1),
        |c AS (SELECT cents, sum(na) OVER (ORDER BY cents) AS ca,
        |    sum(nb) OVER (ORDER BY cents) AS cb FROM g),
        |t AS (SELECT CAST(sum(na) AS BIGINT) AS ta, CAST(sum(nb) AS BIGINT) AS tb FROM g),
        |d AS (SELECT CAST(max(abs(ca * tb - cb * ta)) AS BIGINT) AS d_num
        |  FROM c CROSS JOIN t)
        |SELECT ta AS n_a, tb AS n_b, d_num,
        |  (round(CAST(d_num AS DOUBLE) / (CAST(ta AS DOUBLE) * CAST(tb AS DOUBLE)), 4) + 0.0)
        |    AS d_stat,
        |  CAST(d_num AS HUGEINT) * CAST(d_num AS HUGEINT) * 1000000
        |    > CAST(1844164 AS HUGEINT) * ta * tb * (ta + tb) AS drift_flag
        |FROM d CROSS JOIN t""".stripMargin,
    "q208_auc" ->
      // rank-free exact AUC from the score histogram: positives at score s
      // beat negatives below s, half-tie with negatives at s → exact 2U
      """WITH e AS (SELECT event_type = 'purchase' AS lab,
        |    CAST(round(value * 100, 0) AS BIGINT) AS cents FROM events),
        |g AS (SELECT cents,
        |    count(*) FILTER (WHERE lab) AS np,
        |    count(*) FILTER (WHERE NOT lab) AS nn FROM e GROUP BY 1),
        |c AS (SELECT cents, np, nn,
        |    sum(nn) OVER (ORDER BY cents) - nn AS below FROM g),
        |a AS (SELECT CAST(sum(np) AS BIGINT) AS n_pos,
        |    (SELECT CAST(sum(nn) AS BIGINT) FROM g) AS n_neg,
        |    CAST(sum(np * (2 * below + nn)) AS BIGINT) AS u2 FROM c)
        |SELECT n_pos, n_neg, u2,
        |  (round(CAST(u2 AS DOUBLE) / (2.0 * CAST(n_pos AS DOUBLE) * CAST(n_neg AS DOUBLE)), 4) + 0.0) AS auc
        |FROM a WHERE n_pos > 0 AND n_neg > 0""".stripMargin,
    "q209_silhouette" ->
      // pairwise Euclidean via norms+dot on double-cast lists, quantized to
      // the tenth-of-bp integer grid before any mean — matches the engine's
      // DotProduct accumulation bit for bit
      """WITH s AS (SELECT vec_id AS sid, label AS sl,
        |    CAST(embedding AS DOUBLE[]) AS sv FROM embeddings WHERE vec_id % 4 = 0),
        |p AS (SELECT vec_id AS pid, label AS pl,
        |    CAST(embedding AS DOUBLE[]) AS pv FROM embeddings),
        |sn AS (SELECT sid, sl, sv, list_dot_product(sv, sv) AS snorm FROM s),
        |pn AS (SELECT pid, pl, pv, list_dot_product(pv, pv) AS pnorm FROM p),
        |pr AS (SELECT sid, sl, pl,
        |    CAST(round(sqrt(greatest(snorm + pnorm - 2 * list_dot_product(sv, pv), 0))
        |      * 100000, 0) AS BIGINT) AS d
        |  FROM pn CROSS JOIN sn WHERE pid <> sid),
        |pc AS (SELECT sid, sl, pl, sum(d) AS sm, count(*) AS n FROM pr GROUP BY 1, 2, 3),
        |ab AS (SELECT sid, sl,
        |    max(CASE WHEN pl = sl THEN CAST(sm AS DOUBLE) / CAST(n AS DOUBLE) END) AS a,
        |    min(CASE WHEN pl <> sl THEN CAST(sm AS DOUBLE) / CAST(n AS DOUBLE) END) AS b
        |  FROM pc GROUP BY 1, 2)
        |SELECT sid AS vec_id, sl AS label,
        |  (round(a / 100000, 4) + 0.0) AS a_dist, (round(b / 100000, 4) + 0.0) AS b_dist,
        |  (round((b - a) / greatest(a, b), 4) + 0.0) AS silhouette
        |FROM ab WHERE a IS NOT NULL AND b IS NOT NULL ORDER BY vec_id""".stripMargin,
    "q210_chi2_assoc" ->
      // per-cell chi-square contribution in exact micro-units:
      // (o·n − r·c)²·10⁶ // (r·c·n) on hugeint ≡ the engine's decimal floor
      """WITH cells AS (SELECT lang, source, CAST(count(*) AS BIGINT) AS o
        |  FROM documents GROUP BY 1, 2),
        |r AS (SELECT lang, sum(o) AS r FROM cells GROUP BY 1),
        |c AS (SELECT source, sum(o) AS c FROM cells GROUP BY 1),
        |n AS (SELECT sum(o) AS n FROM cells)
        |SELECT lang, source, o AS observed,
        |  (round(CAST(r AS DOUBLE) * CAST(c AS DOUBLE) / CAST(n AS DOUBLE), 4) + 0.0) AS expected,
        |  CAST((CAST(o * n - r * c AS HUGEINT) * CAST(o * n - r * c AS HUGEINT) * 1000000)
        |    // (CAST(r AS HUGEINT) * c * n) AS BIGINT) AS contrib_micro
        |FROM cells JOIN r USING (lang) JOIN c USING (source) CROSS JOIN n
        |ORDER BY lang, source""".stripMargin,
    "q211_calibration" ->
      // clamped score deciles: exact integer sums, 4-dp display ratios;
      // greatest(…, 0) clamps out-of-domain negatives into bin 0 exactly
      // like the engine does
      """WITH e AS (SELECT event_type = 'purchase' AS lab,
        |    greatest(least(CAST(round(value * 100, 0) AS BIGINT), 10000), 0) AS cents FROM events),
        |b AS (SELECT least((cents * 10) // 10000, 9) AS bin, cents, lab FROM e)
        |SELECT bin, CAST(count(*) AS BIGINT) AS n,
        |  (round(CAST(sum(cents) AS DOUBLE) / (CAST(count(*) AS DOUBLE) * 10000.0), 4) + 0.0)
        |    AS mean_score,
        |  (round(CAST(count(*) FILTER (WHERE lab) AS DOUBLE) / CAST(count(*) AS DOUBLE), 4) + 0.0)
        |    AS pos_rate,
        |  (round(CAST(count(*) FILTER (WHERE lab) AS DOUBLE) / CAST(count(*) AS DOUBLE)
        |    - CAST(sum(cents) AS DOUBLE) / (CAST(count(*) AS DOUBLE) * 10000.0), 4) + 0.0) AS gap
        |FROM b GROUP BY 1 ORDER BY 1""".stripMargin,
    "q212_recall_at_k" ->
      // truth = q45's brute-force top-5; approx = q58's nprobe=1 IVF top-5;
      // recall = |intersection| / k per query
      """WITH vecs AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vv FROM embeddings),
        |q AS (SELECT vec_id AS query_id, vv AS qv FROM vecs WHERE vec_id < 8),
        |bs AS (SELECT query_id, vec_id AS neighbor_id,
        |  list_dot_product(qv, vv) / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(vv, vv))) AS cosine
        |  FROM vecs CROSS JOIN q WHERE vec_id <> query_id),
        |tr AS (SELECT query_id, neighbor_id FROM (SELECT query_id, neighbor_id,
        |  row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rn
        |  FROM bs) WHERE rn <= 5),
        |cent AS (SELECT vec_id AS cell, vv AS cv FROM vecs WHERE vec_id < 16),
        |scored AS (SELECT x.vec_id, x.vv, c.cell,
        |  row_number() OVER (PARTITION BY x.vec_id ORDER BY
        |    list_dot_product(x.vv, c.cv) / (sqrt(list_dot_product(x.vv, x.vv)) * sqrt(list_dot_product(c.cv, c.cv))) DESC,
        |    c.cell) AS crn
        |  FROM vecs x CROSS JOIN cent c),
        |asg AS (SELECT vec_id, vv, cell FROM scored WHERE crn = 1),
        |qa AS (SELECT vec_id AS query_id, vv AS qv, cell FROM asg WHERE vec_id < 8),
        |s2 AS (SELECT qa.query_id, a.vec_id AS neighbor_id,
        |  list_dot_product(qa.qv, a.vv) / (sqrt(list_dot_product(qa.qv, qa.qv)) * sqrt(list_dot_product(a.vv, a.vv))) AS cosine
        |  FROM qa JOIN asg a ON a.cell = qa.cell AND a.vec_id <> qa.query_id),
        |ap AS (SELECT query_id, neighbor_id FROM (SELECT query_id, neighbor_id,
        |  row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rn
        |  FROM s2) WHERE rn <= 5)
        |SELECT tr.query_id, CAST(count(ap.neighbor_id) AS BIGINT) AS hits,
        |  (round(count(ap.neighbor_id) / 5.0, 4) + 0.0) AS recall
        |FROM tr LEFT JOIN ap ON ap.query_id = tr.query_id AND ap.neighbor_id = tr.neighbor_id
        |GROUP BY tr.query_id ORDER BY tr.query_id""".stripMargin,
    "q213_mann_kendall" ->
      // S and the tie-corrected 18·Var(S) exact; flag S²·18·10⁴ > 38416·var18
      """WITH d AS (SELECT event_type, CAST(ts AS DATE) AS day,
        |    CAST(count(*) AS BIGINT) AS x FROM events GROUP BY 1, 2),
        |p AS (SELECT a.event_type,
        |    sum(CASE WHEN b.x > a.x THEN 1 WHEN b.x < a.x THEN -1 ELSE 0 END) AS s
        |  FROM d a JOIN d b ON a.event_type = b.event_type AND a.day < b.day GROUP BY 1),
        |n AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n FROM d GROUP BY 1),
        |t AS (SELECT event_type, sum(tn * (tn - 1) * (2 * tn + 5)) AS tv
        |  FROM (SELECT event_type, x, count(*) AS tn FROM d GROUP BY 1, 2) GROUP BY 1)
        |SELECT n.event_type, n.n AS n, CAST(coalesce(p.s, 0) AS BIGINT) AS s,
        |  CAST(n.n * (n.n - 1) * (2 * n.n + 5) - t.tv AS BIGINT) AS var18,
        |  CASE WHEN n.n * (n.n - 1) * (2 * n.n + 5) - t.tv > 0 THEN
        |    (round(CAST(coalesce(p.s, 0) AS DOUBLE)
        |      / sqrt(CAST(n.n * (n.n - 1) * (2 * n.n + 5) - t.tv AS DOUBLE) / 18.0), 4) + 0.0)
        |  END AS z,
        |  CAST(coalesce(p.s, 0) AS HUGEINT) * coalesce(p.s, 0) * 180000
        |    > 38416 * CAST(n.n * (n.n - 1) * (2 * n.n + 5) - t.tv AS HUGEINT) AS trend_flag
        |FROM n JOIN t USING (event_type) LEFT JOIN p USING (event_type)
        |ORDER BY event_type""".stripMargin,
    "q214_readability" ->
      // identical formula text: 206.835 − 1.015·(w/s) − 84.6·(sy/w), 4 dp
      """WITH c AS (SELECT doc_id,
        |    CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS words,
        |    CAST(greatest(len(regexp_extract_all(text, '[.!?]+')), 1) AS BIGINT) AS sentences,
        |    CAST(greatest(len(regexp_extract_all(lower(text), '[aeiouy]+')), 1) AS BIGINT) AS syllables
        |  FROM documents)
        |SELECT doc_id, words, sentences, syllables,
        |  CASE WHEN words > 0 THEN
        |    (round(206.835 - 1.015 * CAST(words AS DOUBLE) / CAST(sentences AS DOUBLE)
        |      - 84.6 * CAST(syllables AS DOUBLE) / CAST(words AS DOUBLE), 4) + 0.0)
        |  END AS flesch
        |FROM c ORDER BY doc_id""".stripMargin,
    "q215_log_odds_terms" ->
      // identical formula text: ln((y+1)/(ns−y+1)) − ln((yt−y+1)/((n−ns)−(yt−y)+1))
      """WITH tok AS (SELECT source, t.term FROM documents,
        |  LATERAL (SELECT unnest(regexp_split_to_array(lower(text), '\s+')) AS term) t
        |  WHERE length(t.term) > 0),
        |yst AS (SELECT source, term, CAST(count(*) AS BIGINT) AS y FROM tok GROUP BY 1, 2),
        |ns AS (SELECT source, sum(y) AS ns FROM yst GROUP BY 1),
        |yt AS (SELECT term, sum(y) AS yt FROM yst GROUP BY 1),
        |n AS (SELECT sum(y) AS n FROM yst),
        |sc AS (SELECT source, term, y,
        |    ln(CAST(y + 1 AS DOUBLE) / CAST(ns - y + 1 AS DOUBLE))
        |      - ln(CAST(yt - y + 1 AS DOUBLE) / CAST((n - ns) - (yt - y) + 1 AS DOUBLE)) AS score
        |  FROM yst JOIN ns USING (source) JOIN yt USING (term) CROSS JOIN n),
        |r AS (SELECT source, term, y, score,
        |    row_number() OVER (PARTITION BY source ORDER BY score DESC, term) AS rank FROM sc)
        |SELECT source, term, y, CAST(rank AS BIGINT) AS rank, (round(score, 4) + 0.0) AS log_odds
        |FROM r WHERE rank <= 5 ORDER BY source, rank""".stripMargin,
    "q216_curation_funnel" ->
      // cumulative conjunction counts from ONE aggregate; UNION ALL unpivot
      """WITH m AS (SELECT CAST(count(*) AS BIGINT) AS s0,
        |    CAST(count(*) FILTER (WHERE n_chars BETWEEN 100 AND 500) AS BIGINT) AS s1,
        |    CAST(count(*) FILTER (WHERE n_chars BETWEEN 100 AND 500
        |      AND lang IN ('en', 'es', 'de')) AS BIGINT) AS s2,
        |    CAST(count(*) FILTER (WHERE n_chars BETWEEN 100 AND 500
        |      AND lang IN ('en', 'es', 'de')
        |      AND len(regexp_extract_all(text, '\S+')) >= 20) AS BIGINT) AS s3,
        |    CAST(count(*) FILTER (WHERE n_chars BETWEEN 100 AND 500
        |      AND lang IN ('en', 'es', 'de')
        |      AND len(regexp_extract_all(text, '\S+')) >= 20
        |      AND length(regexp_replace(lower(text), '[^a-z]', '', 'g')) * 10
        |        >= length(text) * 4) AS BIGINT) AS s4
        |  FROM documents),
        |u AS (SELECT 0 AS stage_idx, 'total' AS stage, s0 AS n, s0 FROM m
        |  UNION ALL SELECT 1, 'length', s1, s0 FROM m
        |  UNION ALL SELECT 2, 'lang', s2, s0 FROM m
        |  UNION ALL SELECT 3, 'tokens', s3, s0 FROM m
        |  UNION ALL SELECT 4, 'alpha', s4, s0 FROM m)
        |SELECT CAST(stage_idx AS BIGINT) AS stage_idx, stage, n,
        |  (round(CAST(n AS DOUBLE) / CAST(s0 AS DOUBLE), 4) + 0.0) AS share
        |FROM u ORDER BY stage_idx""".stripMargin,
    "q217_neardup_rate" ->
      s"""WITH pairs AS ($q44Sql),
         |ids AS (SELECT id_a AS doc_id FROM pairs UNION SELECT id_b AS doc_id FROM pairs),
         |f AS (SELECT d.source, d.doc_id, CASE WHEN ids.doc_id IS NULL THEN 0 ELSE 1 END AS dup
         |  FROM documents d LEFT JOIN ids ON d.doc_id = ids.doc_id)
         |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(dup) AS BIGINT) AS n_dup,
         |  (round(CAST(sum(dup) AS DOUBLE) / CAST(count(*) AS DOUBLE), 4) + 0.0) AS dup_rate
         |FROM f GROUP BY source ORDER BY source""".stripMargin,
    "q218_lm_buckets" ->
      s"""WITH scores AS ($q204Sql),
         |b AS (SELECT doc_id, avg_nll,
         |    CAST(ntile(3) OVER (ORDER BY avg_nll, doc_id) AS BIGINT) AS bucket
         |  FROM scores)
         |SELECT bucket, CAST(count(*) AS BIGINT) AS n_docs,
         |  min(avg_nll) AS min_nll, max(avg_nll) AS max_nll,
         |  (round(CAST(sum(CAST(round(avg_nll * 10000, 0) AS BIGINT)) AS DOUBLE)
         |    / (CAST(count(*) AS DOUBLE) * 10000.0), 4) + 0.0) AS mean_nll
         |FROM b GROUP BY bucket ORDER BY bucket""".stripMargin,
    "q219_pettitt" ->
      // interval-add identity: each (i<j) pair contributes sgn on [i, j);
      // flag in hugeint ≡ the engine's decimal(38,0)
      """WITH d0 AS (SELECT event_type AS g, CAST(ts AS DATE) AS day,
        |    CAST(count(*) AS BIGINT) AS x FROM events GROUP BY 1, 2),
        |d AS (SELECT g, day, x,
        |    CAST(row_number() OVER (PARTITION BY g ORDER BY day) AS BIGINT) AS t FROM d0),
        |pr AS (SELECT a.g, a.t AS i, b.t AS j,
        |    CASE WHEN a.x > b.x THEN 1 WHEN a.x < b.x THEN -1 ELSE 0 END AS s
        |  FROM d a JOIN d b ON a.g = b.g AND a.t < b.t),
        |em AS (SELECT g, i AS t, s FROM pr UNION ALL SELECT g, j AS t, -s FROM pr),
        |pt AS (SELECT g, t, sum(s) AS ds FROM em GROUP BY 1, 2),
        |u AS (SELECT g, t, sum(ds) OVER (PARTITION BY g ORDER BY t) AS u FROM pt),
        |k AS (SELECT g, max(abs(u)) AS k FROM u GROUP BY 1),
        |tsr AS (SELECT u.g, k.k, min(u.t) AS t_star
        |  FROM u JOIN k ON u.g = k.g AND abs(u.u) = k.k GROUP BY 1, 2),
        |n AS (SELECT g, CAST(count(*) AS BIGINT) AS n FROM d GROUP BY 1)
        |SELECT n.g AS event_type, n.n AS n, CAST(tsr.k AS BIGINT) AS k,
        |  CAST(tsr.t_star AS BIGINT) AS t_star, d.day AS break_bucket,
        |  (round(least(2.0 * exp(-(6.0 * tsr.k * tsr.k)
        |    / (CAST(n.n * n.n * n.n AS DOUBLE) + CAST(n.n * n.n AS DOUBLE))), 1.0), 4) + 0.0)
        |    AS p_approx,
        |  CAST(6000000 AS HUGEINT) * tsr.k * tsr.k
        |    > CAST(3688879 AS HUGEINT) * (CAST(n.n AS HUGEINT) * n.n * n.n
        |      + CAST(n.n AS HUGEINT) * n.n) AS break_flag
        |FROM n JOIN tsr ON n.g = tsr.g JOIN d ON d.g = n.g AND d.t = tsr.t_star
        |ORDER BY event_type""".stripMargin,
    "q220_cross_corr" ->
      // exact sufficient statistics per lag; r double only at the final row
      """WITH daily AS (SELECT CAST(ts AS DATE) AS day,
        |    CAST(count(*) FILTER (WHERE event_type = 'view') AS BIGINT) AS x,
        |    CAST(count(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS y
        |  FROM events GROUP BY 1),
        |l AS (SELECT unnest(range(0, 4)) AS lag),
        |j AS (SELECT l.lag, a.x, b.y FROM daily a CROSS JOIN l
        |  JOIN daily b ON b.day = a.day + CAST(l.lag AS INTEGER)),
        |agg AS (SELECT lag, CAST(count(*) AS BIGINT) AS n, sum(x) AS sx, sum(y) AS sy,
        |    sum(x * x) AS sxx, sum(y * y) AS syy, sum(x * y) AS sxy FROM j GROUP BY 1)
        |SELECT CAST(lag AS BIGINT) AS lag, n AS n_days,
        |  CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0 THEN
        |    (round(CAST(n * sxy - sx * sy AS DOUBLE)
        |      / sqrt(CAST(n * sxx - sx * sx AS DOUBLE) * CAST(n * syy - sy * sy AS DOUBLE)), 4) + 0.0)
        |  END AS r
        |FROM agg ORDER BY lag""".stripMargin,
    "q221_group_ks" ->
      // the group×unit grid zero-fills absent units so the ECDF difference
      // is evaluated at every pooled distinct unit; hugeint flag as q207
      """WITH e AS (SELECT event_type AS g,
        |    CAST(round(value * 100, 0) AS BIGINT) AS u FROM events),
        |counts AS (SELECT g, u, CAST(count(*) AS BIGINT) AS c FROM e GROUP BY 1, 2),
        |groups AS (SELECT g, sum(c) AS ng FROM counts GROUP BY 1),
        |units AS (SELECT u, sum(c) AS cu FROM counts GROUP BY 1),
        |grand AS (SELECT sum(c) AS n FROM counts),
        |grid AS (SELECT units.u, groups.g, groups.ng, units.cu,
        |    coalesce(counts.c, 0) AS cg
        |  FROM units CROSS JOIN groups
        |  LEFT JOIN counts ON counts.g = groups.g AND counts.u = units.u),
        |cums AS (SELECT g, ng, cu, u,
        |    sum(cg) OVER (PARTITION BY g ORDER BY u) AS cumg,
        |    sum(cu) OVER (PARTITION BY g ORDER BY u) AS cumall
        |  FROM grid),
        |d AS (SELECT g, ng, n - ng AS nr,
        |    max(abs(cumg * (n - ng) - (cumall - cumg) * ng)) AS d_num
        |  FROM cums CROSS JOIN grand GROUP BY 1, 2, 3)
        |SELECT g AS event_type, CAST(ng AS BIGINT) AS n_group,
        |  CAST(nr AS BIGINT) AS n_rest, CAST(d_num AS BIGINT) AS d_num,
        |  (round(CAST(d_num AS DOUBLE) / (CAST(ng AS DOUBLE) * CAST(nr AS DOUBLE)), 4) + 0.0)
        |    AS d_stat,
        |  CAST(d_num AS HUGEINT) * CAST(d_num AS HUGEINT) * 1000000
        |    > CAST(1844164 AS HUGEINT) * ng * nr * (ng + nr) AS drift_flag
        |FROM d WHERE ng > 0 AND nr > 0 ORDER BY event_type""".stripMargin,
    "q222_ttr" ->
      """WITH tok AS (SELECT doc_id, t.term FROM documents,
        |  LATERAL (SELECT unnest(regexp_split_to_array(lower(text), '\s+')) AS term) t
        |  WHERE length(t.term) > 0)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
        |  CAST(count(DISTINCT term) AS BIGINT) AS n_types,
        |  (round(CAST(count(DISTINCT term) AS DOUBLE) / CAST(count(*) AS DOUBLE), 4) + 0.0) AS ttr
        |FROM tok GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q223_bpe_merges" -> bpeOracleSql(8),
    "q226_link_predict" ->
      // q120's co-occurrence edge CTE, RA weights as floor-divided scaled
      // longs (// = Spark's div on non-negatives), wedge pairs via the
      // center self-join, anti-join on the symmetric edge list
      """WITH li AS (SELECT l_orderkey, l_partkey FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1995-01-01'
        |    AND l_shipdate < TIMESTAMP '1996-01-01'),
        |e AS (SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
        |  FROM li a JOIN li b
        |  ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey),
        |d AS (SELECT src, count(*) AS deg FROM e GROUP BY 1),
        |sc AS (SELECT e1.dst AS u, e2.dst AS v,
        |    CAST(sum(1000000 // d.deg) AS BIGINT) AS score
        |  FROM e e1 JOIN e e2 ON e1.src = e2.src AND e1.dst < e2.dst
        |  JOIN d ON d.src = e1.src
        |  WHERE d.deg <= 10000
        |  GROUP BY 1, 2)
        |SELECT u, v, score FROM sc
        |WHERE NOT EXISTS (SELECT 1 FROM e x WHERE x.src = sc.u AND x.dst = sc.v)
        |ORDER BY score DESC, u, v LIMIT 20""".stripMargin,
    "q227_bpe_encode" -> bpeEncodeOracleSql(8),
    "q228_image_dhash" ->
      // every gradient bit of the synthesized 9×7 PNG predicted
      // arithmetically: bit (x, y) set when pixel(x+1, y) > pixel(x, y),
      // pixel(x, y) = (13·(doc_id % 50) + x·(y + 3)) % 256 — genuine
      // ImageIO decode + per-pixel hash loop on the Spark side
      """WITH g AS (SELECT doc_id, doc_id % 50 AS gv FROM documents),
        |bits AS (SELECT g.doc_id,
        |    CASE WHEN (g.gv * 13 + (x.x + 1) * (y.y + 3)) % 256
        |            > (g.gv * 13 + x.x * (y.y + 3)) % 256
        |      THEN CAST(1 AS BIGINT) << CAST(y.y * 8 + x.x AS INT)
        |      ELSE 0 END AS b
        |  FROM g,
        |    (SELECT unnest(range(0, 8)) AS x) x,
        |    (SELECT unnest(range(0, 7)) AS y) y),
        |h AS (SELECT doc_id, CAST(sum(b) AS BIGINT) AS dhash FROM bits GROUP BY 1)
        |SELECT dhash, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(min(doc_id) AS BIGINT) AS keeper_id
        |FROM h GROUP BY dhash HAVING count(*) >= 2 ORDER BY dhash""".stripMargin,
    "q229_negative_sample" ->
      // the identical integer hash on both engines; candidates minus the
      // actually-purchased (custkey, partkey) set
      """WITH mp AS (SELECT max(p_partkey) AS maxp FROM part),
        |pos AS (SELECT DISTINCT o_custkey AS c, l_partkey AS p
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
        |cand AS (SELECT c, sample_idx,
        |    ((c * 2654435761 + sample_idx * 40503 + 12345) % 1000000007) % maxp + 1 AS p
        |  FROM (SELECT DISTINCT o_custkey AS c FROM orders),
        |    (SELECT unnest(range(0, 5)) AS sample_idx), mp)
        |SELECT c AS c_custkey, CAST(sample_idx AS BIGINT) AS sample_idx,
        |  CAST(p AS BIGINT) AS neg_partkey
        |FROM cand
        |WHERE NOT EXISTS (SELECT 1 FROM pos WHERE pos.c = cand.c AND pos.p = cand.p)
        |ORDER BY c_custkey, sample_idx""".stripMargin,
    "q230_nb_classify" -> q230Sql,
    "q231_containment" ->
      // q49's shingle CTEs verbatim; pairs directed (<>) and scored
      // against the SOURCE size only — threshold on the rounded value
      """WITH ws AS (SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS w FROM documents WHERE doc_id < 100),
        |sha AS (SELECT DISTINCT doc_id, w[CAST(i AS BIGINT)] || ' ' || w[CAST(i AS BIGINT) + 1] AS shingle
        |  FROM ws, LATERAL (SELECT unnest(range(1, len(w))) AS i) t),
        |rare AS (SELECT shingle FROM sha GROUP BY shingle HAVING count(*) <= 100),
        |sh AS (SELECT sha.doc_id, sha.shingle FROM sha JOIN rare USING (shingle)),
        |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
        |shared AS (SELECT x.doc_id AS src_id, y.doc_id AS dst_id, count(*) AS shared
        |  FROM sh x JOIN sh y USING (shingle) WHERE x.doc_id <> y.doc_id GROUP BY 1, 2)
        |SELECT src_id, dst_id, CAST(ns.n AS BIGINT) AS n_src,
        |  CAST(shared AS BIGINT) AS shared,
        |  (round(CAST(shared AS DOUBLE) / ns.n, 4) + 0.0) AS containment
        |FROM shared JOIN sizes ns ON ns.doc_id = src_id
        |WHERE (round(CAST(shared AS DOUBLE) / ns.n, 4) + 0.0) >= 0.5
        |ORDER BY src_id, dst_id""".stripMargin,
    "q232_seasonal_error" ->
      // identical aggregated day frame; DuckDB's // is Spark's div on the
      // non-negative error units
      """WITH d AS (SELECT event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day, count(*) AS c
        |  FROM events GROUP BY 1, 2),
        |j AS (SELECT a.event_type, a.c, b.c AS p
        |  FROM d a JOIN d b ON b.event_type = a.event_type AND b.day = a.day - 7)
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
        |  CAST(sum(abs(c - p)) AS BIGINT) AS sae,
        |  (round(CAST(sum(abs(c - p)) AS DOUBLE) / count(*), 4) + 0.0) AS mae,
        |  CAST(sum((10000 * abs(c - p)) // c) // count(*) AS BIGINT) AS mape_bp
        |FROM j GROUP BY 1 ORDER BY 1""".stripMargin,
    "q233_minhash_recall" -> q233Sql,
    "q234_bpe_fertility" -> bpeFertilityOracleSql(8),
    "q235_centroid_classify" ->
      // same micro-long quantization, floor-div centroids, exact long
      // squared distances; argmin tie to the SMALLEST label via the
      // min-dist-then-min-label pair (= Spark's struct-min)
      """WITH comp AS (SELECT vec_id, CAST(label AS BIGINT) AS label, t.d AS dim,
        |    CAST(round(CAST(embedding[CAST(t.d AS BIGINT)] AS DOUBLE) * 1000000, 0)
        |      AS BIGINT) AS vm
        |  FROM embeddings,
        |    LATERAL (SELECT unnest(range(1, len(embedding) + 1)) AS d) t),
        |cent AS (SELECT label AS clabel, dim,
        |    CAST(floor(CAST(sum(vm) AS DOUBLE) / count(*)) AS BIGINT) AS cm
        |  FROM comp GROUP BY 1, 2),
        |dist AS (SELECT c.vec_id, c.label, ct.clabel,
        |    sum((c.vm - ct.cm) * (c.vm - ct.cm)) AS d2
        |  FROM comp c JOIN cent ct ON ct.dim = c.dim GROUP BY 1, 2, 3),
        |best AS (SELECT vec_id, min(d2) AS md FROM dist GROUP BY 1),
        |pred AS (SELECT d.vec_id, d.label, min(d.clabel) AS pred_label
        |  FROM dist d JOIN best b ON b.vec_id = d.vec_id AND d.d2 = b.md
        |  GROUP BY 1, 2)
        |SELECT label, pred_label, CAST(count(*) AS BIGINT) AS n
        |FROM pred GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q236_audio_segments" ->
      // every block flag is arithmetic: block b of doc d is silent iff
      // (d + b) % 3 = 0; a segment starts at a non-silent block whose
      // predecessor is silent (or at block 0) — genuine RIFF parsing and
      // PCM peak scanning on the Spark side
      """WITH v AS (SELECT doc_id, n_chars % 8 + 4 AS nb FROM documents),
        |b AS (SELECT doc_id, nb, unnest(range(0, nb)) AS blk FROM v),
        |fl AS (SELECT doc_id, nb,
        |    CASE WHEN (doc_id + blk) % 3 = 0 THEN 1 ELSE 0 END AS silent,
        |    CASE WHEN (doc_id + blk) % 3 <> 0
        |      AND (blk = 0 OR (doc_id + blk - 1) % 3 = 0)
        |      THEN 1 ELSE 0 END AS seg_start
        |  FROM b)
        |SELECT doc_id, CAST(min(nb) AS BIGINT) AS n_blocks,
        |  CAST(sum(silent) AS BIGINT) AS n_silent,
        |  CAST(sum(seg_start) AS BIGINT) AS n_segments
        |FROM fl GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q237_personalized_pr" ->
      // q120's edge/degree CTEs; 3 unrolled steps with the restart term
      // gated on seed membership via a FULL JOIN against the seed set
      """WITH e AS (SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
        |  FROM lineitem a JOIN lineitem b
        |  ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey),
        |d AS (SELECT src, count(*) AS deg FROM e GROUP BY 1),
        |s AS (SELECT DISTINCT src AS snode FROM e WHERE src % 97 = 0),
        |r0 AS (SELECT snode AS node, CAST(1000000 AS BIGINT) AS r FROM s),
        |c1 AS (SELECT e.dst AS node, CAST((85 * sum(r0.r // d.deg)) // 100 AS BIGINT) AS cin
        |  FROM e JOIN d USING (src) JOIN r0 ON r0.node = e.src GROUP BY 1),
        |r1 AS (SELECT coalesce(c.node, s.snode) AS node,
        |    CAST(CASE WHEN s.snode IS NOT NULL THEN 150000 ELSE 0 END
        |      + coalesce(c.cin, 0) AS BIGINT) AS r
        |  FROM c1 c FULL JOIN s ON s.snode = c.node),
        |c2 AS (SELECT e.dst AS node, CAST((85 * sum(r1.r // d.deg)) // 100 AS BIGINT) AS cin
        |  FROM e JOIN d USING (src) JOIN r1 ON r1.node = e.src GROUP BY 1),
        |r2 AS (SELECT coalesce(c.node, s.snode) AS node,
        |    CAST(CASE WHEN s.snode IS NOT NULL THEN 150000 ELSE 0 END
        |      + coalesce(c.cin, 0) AS BIGINT) AS r
        |  FROM c2 c FULL JOIN s ON s.snode = c.node),
        |c3 AS (SELECT e.dst AS node, CAST((85 * sum(r2.r // d.deg)) // 100 AS BIGINT) AS cin
        |  FROM e JOIN d USING (src) JOIN r2 ON r2.node = e.src GROUP BY 1),
        |r3 AS (SELECT coalesce(c.node, s.snode) AS node,
        |    CAST(CASE WHEN s.snode IS NOT NULL THEN 150000 ELSE 0 END
        |      + coalesce(c.cin, 0) AS BIGINT) AS r
        |  FROM c3 c FULL JOIN s ON s.snode = c.node)
        |SELECT node AS p_partkey, r AS rank_scaled FROM r3
        |ORDER BY rank_scaled DESC, p_partkey LIMIT 20""".stripMargin,
    "q238_kappa_agreement" -> q238Sql,
    "q239_label_outliers" ->
      // q235's comp/cent CTEs verbatim; own-class distance joins exactly
      // ONE centroid row per component; flag on HUGEINT cross-products
      """WITH base AS (SELECT vec_id, label,
        |    CASE WHEN vec_id % 50 = 0
        |      THEN list_transform(embedding, x -> x * CAST(4 AS FLOAT))
        |      ELSE embedding END AS embedding
        |  FROM embeddings),
        |comp AS (SELECT vec_id, CAST(label AS BIGINT) AS label, t.d AS dim,
        |    CAST(round(CAST(embedding[CAST(t.d AS BIGINT)] AS DOUBLE) * 1000000, 0)
        |      AS BIGINT) AS vm
        |  FROM base,
        |    LATERAL (SELECT unnest(range(1, len(embedding) + 1)) AS d) t),
        |cent AS (SELECT label AS clabel, dim,
        |    CAST(floor(CAST(sum(vm) AS DOUBLE) / count(*)) AS BIGINT) AS cm
        |  FROM comp GROUP BY 1, 2),
        |own AS (SELECT c.vec_id, c.label,
        |    sum((c.vm - ct.cm) * (c.vm - ct.cm)) AS d2
        |  FROM comp c JOIN cent ct ON ct.dim = c.dim AND ct.clabel = c.label
        |  GROUP BY 1, 2),
        |cls AS (SELECT label, sum(CAST(d2 AS HUGEINT)) AS s, count(*) AS n
        |  FROM own GROUP BY 1)
        |SELECT o.vec_id, o.label, CAST(o.d2 AS BIGINT) AS d2
        |FROM own o JOIN cls ON cls.label = o.label
        |WHERE CAST(o.d2 AS HUGEINT) * cls.n > 4 * cls.s
        |ORDER BY o.vec_id""".stripMargin,
    "q240_textrank" ->
      // adjacent-pair word graph (count ≥ 3, symmetric, deduped), then
      // q120's three unrolled damped steps on word nodes
      """WITH ws AS (SELECT regexp_split_to_array(lower(text), '\s+') AS w FROM documents),
        |bp AS (SELECT w[CAST(i AS BIGINT)] AS a, w[CAST(i AS BIGINT) + 1] AS b
        |  FROM ws, LATERAL (SELECT unnest(range(1, len(w))) AS i) t),
        |pc AS (SELECT a, b, count(*) AS c FROM bp
        |  WHERE a <> b AND length(a) > 0 AND length(b) > 0 GROUP BY 1, 2),
        |pf AS (SELECT a, b FROM pc WHERE c >= 3),
        |e AS (SELECT a AS src, b AS dst FROM pf UNION SELECT b, a FROM pf),
        |d AS (SELECT src, count(*) AS deg FROM e GROUP BY 1),
        |r0 AS (SELECT src AS node, CAST(1000000 AS BIGINT) AS r FROM d),
        |r1 AS (SELECT e.dst AS node, CAST(150000 + (85 * sum(r0.r // d.deg)) // 100 AS BIGINT) AS r
        |  FROM e JOIN d USING (src) JOIN r0 ON r0.node = e.src GROUP BY e.dst),
        |r2 AS (SELECT e.dst AS node, CAST(150000 + (85 * sum(r1.r // d.deg)) // 100 AS BIGINT) AS r
        |  FROM e JOIN d USING (src) JOIN r1 ON r1.node = e.src GROUP BY e.dst),
        |r3 AS (SELECT e.dst AS node, CAST(150000 + (85 * sum(r2.r // d.deg)) // 100 AS BIGINT) AS r
        |  FROM e JOIN d USING (src) JOIN r2 ON r2.node = e.src GROUP BY e.dst)
        |SELECT node AS word, r AS rank_scaled FROM r3
        |ORDER BY rank_scaled DESC, word LIMIT 20""".stripMargin,
    "q241_emd_drift" ->
      // q221's grid/cums CTEs with the max swapped for the gap-weighted
      // HUGEINT sum; the trailing grid row's gap coalesces to 0
      """WITH e AS (SELECT event_type AS g,
        |    CAST(round(value * 100, 0) AS BIGINT) AS u FROM events),
        |counts AS (SELECT g, u, CAST(count(*) AS BIGINT) AS c FROM e GROUP BY 1, 2),
        |groups AS (SELECT g, sum(c) AS ng FROM counts GROUP BY 1),
        |units AS (SELECT u, sum(c) AS cu FROM counts GROUP BY 1),
        |grand AS (SELECT sum(c) AS n FROM counts),
        |grid AS (SELECT units.u, groups.g, groups.ng, units.cu,
        |    coalesce(counts.c, 0) AS cg
        |  FROM units CROSS JOIN groups
        |  LEFT JOIN counts ON counts.g = groups.g AND counts.u = units.u),
        |cums AS (SELECT g, ng, u,
        |    sum(cg) OVER (PARTITION BY g ORDER BY u) AS cumg,
        |    sum(cu) OVER (PARTITION BY g ORDER BY u) AS cumall,
        |    coalesce(lead(u) OVER (PARTITION BY g ORDER BY u) - u, 0) AS gap
        |  FROM grid),
        |d AS (SELECT g, ng, n - ng AS nr,
        |    sum(CAST(abs(cumg * (n - ng) - (cumall - cumg) * ng) AS HUGEINT)
        |      * gap) AS emd
        |  FROM cums CROSS JOIN grand GROUP BY 1, 2, 3)
        |SELECT g AS event_type, CAST(ng AS BIGINT) AS n_group,
        |  CAST(nr AS BIGINT) AS n_rest, CAST(emd AS BIGINT) AS emd_num,
        |  (round(CAST(emd AS DOUBLE) / (CAST(ng AS DOUBLE) * CAST(nr AS DOUBLE)), 4)
        |    + 0.0) AS emd_units
        |FROM d WHERE ng > 0 AND nr > 0 ORDER BY event_type""".stripMargin,
    "q242_novelty" ->
      // q44's shingle CTE (whole corpus), first-occurrence min per
      // shingle, floor-bp novelty share per doc
      """WITH ws AS (SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS w FROM documents),
        |sh AS (SELECT DISTINCT doc_id, w[CAST(i AS BIGINT)] || ' ' || w[CAST(i AS BIGINT) + 1] AS shingle
        |  FROM ws, LATERAL (SELECT unnest(range(1, len(w))) AS i) t),
        |f AS (SELECT shingle, min(doc_id) AS fd FROM sh GROUP BY 1)
        |SELECT sh.doc_id, CAST(count(*) AS BIGINT) AS n_shingles,
        |  CAST(sum(CASE WHEN f.fd = sh.doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
        |  CAST((10000 * sum(CASE WHEN f.fd = sh.doc_id THEN 1 ELSE 0 END))
        |    // count(*) AS BIGINT) AS novelty_bp
        |FROM sh JOIN f USING (shingle)
        |GROUP BY sh.doc_id ORDER BY sh.doc_id""".stripMargin,
    "q243_stream_quota" ->
      // the batch twin: hourly counts, admission = least(n, quota)
      """SELECT user_id, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour_start,
        |  CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(least(count(*), 1) AS BIGINT) AS n_accepted,
        |  CAST(count(*) - least(count(*), 1) AS BIGINT) AS n_dropped
        |FROM events GROUP BY 1, 2
        |ORDER BY user_id, hour_start""".stripMargin,
    "q244_welch_t" ->
      // the identical sufficient-stats → double chain; variances on
      // HUGEINT numerators, t/df/flag from the same expression tree
      """WITH e AS (SELECT event_type AS g, user_id % 2 AS arm,
        |    CAST(round(value * 100, 0) AS BIGINT) AS u FROM events),
        |st AS (SELECT g,
        |    sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS na,
        |    sum(CASE WHEN arm = 0 THEN u ELSE 0 END) AS sa,
        |    sum(CASE WHEN arm = 0 THEN CAST(u AS HUGEINT) * u ELSE 0 END) AS qa,
        |    sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS nb,
        |    sum(CASE WHEN arm = 1 THEN u ELSE 0 END) AS sb,
        |    sum(CASE WHEN arm = 1 THEN CAST(u AS HUGEINT) * u ELSE 0 END) AS qb
        |  FROM e GROUP BY 1),
        |v AS (SELECT g, na, nb, sa, sb,
        |    CAST(CAST(na AS HUGEINT) * qa - CAST(sa AS HUGEINT) * sa AS DOUBLE) /
        |      (CAST(na AS DOUBLE) * CAST(na - 1 AS DOUBLE)) / CAST(na AS DOUBLE) AS wa,
        |    CAST(CAST(nb AS HUGEINT) * qb - CAST(sb AS HUGEINT) * sb AS DOUBLE) /
        |      (CAST(nb AS DOUBLE) * CAST(nb - 1 AS DOUBLE)) / CAST(nb AS DOUBLE) AS wb
        |  FROM st WHERE na >= 2 AND nb >= 2),
        |t AS (SELECT g, na, nb, wa, wb,
        |    (CAST(sa AS DOUBLE) / na - CAST(sb AS DOUBLE) / nb) / sqrt(wa + wb) AS tt
        |  FROM v WHERE wa + wb > 0)
        |SELECT g AS event_type, CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
        |  (round(tt, 4) + 0.0) AS t_stat,
        |  (round((wa + wb) * (wa + wb) /
        |    (wa * wa / CAST(na - 1 AS DOUBLE) + wb * wb / CAST(nb - 1 AS DOUBLE)), 4)
        |    + 0.0) AS df,
        |  abs(tt) > 1.96 AS sig_flag
        |FROM t ORDER BY event_type""".stripMargin,
    "q245_bh_fdr" ->
      // q221's grid chain → asymptotic KS p per segment → BH at 5% FDR;
      // ranks and the k* cutoff over the |segments|-row metadata frame
      """WITH e AS (SELECT event_type AS g,
        |    CAST(round(value * 100, 0) AS BIGINT) AS u FROM events),
        |counts AS (SELECT g, u, CAST(count(*) AS BIGINT) AS c FROM e GROUP BY 1, 2),
        |groups AS (SELECT g, sum(c) AS ng FROM counts GROUP BY 1),
        |units AS (SELECT u, sum(c) AS cu FROM counts GROUP BY 1),
        |grand AS (SELECT sum(c) AS n FROM counts),
        |grid AS (SELECT units.u, groups.g, groups.ng, units.cu,
        |    coalesce(counts.c, 0) AS cg
        |  FROM units CROSS JOIN groups
        |  LEFT JOIN counts ON counts.g = groups.g AND counts.u = units.u),
        |cums AS (SELECT g, ng, u,
        |    sum(cg) OVER (PARTITION BY g ORDER BY u) AS cumg,
        |    sum(cu) OVER (PARTITION BY g ORDER BY u) AS cumall
        |  FROM grid),
        |d AS (SELECT g, ng, n - ng AS nr,
        |    max(abs(cumg * (n - ng) - (cumall - cumg) * ng)) AS d_num
        |  FROM cums CROSS JOIN grand GROUP BY 1, 2, 3),
        |pv AS (SELECT g, least(1.0, 2 * exp(-2 *
        |    CAST(d_num AS DOUBLE) * CAST(d_num AS DOUBLE) /
        |    (CAST(ng AS DOUBLE) * CAST(nr AS DOUBLE) * CAST(ng + nr AS DOUBLE)))) AS p
        |  FROM d WHERE ng > 0 AND nr > 0),
        |r AS (SELECT g, p,
        |    CAST(row_number() OVER (ORDER BY p, g) AS BIGINT) AS rank FROM pv),
        |m AS (SELECT count(*) AS m FROM r),
        |k AS (SELECT coalesce(max(CASE WHEN p * 100.0 * m.m <= rank * 5.0
        |    THEN rank END), 0) AS k FROM r, m)
        |SELECT g AS event_type, (round(p, 4) + 0.0) AS p, rank,
        |  rank <= k.k AS rejected
        |FROM r, k ORDER BY rank""".stripMargin,
    "q246_ivfpq_search" ->
      // q58's cosine cell CTEs (assignment crn = 1, probe crn <= 2) bound
      // the candidates; q224's LUT/ADC chain scores only those pairs
      """WITH vecs AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vv FROM embeddings),
        |cent AS (SELECT vec_id AS cell, vv AS cv FROM vecs WHERE vec_id < 16),
        |cells AS (SELECT x.vec_id, c.cell,
        |  row_number() OVER (PARTITION BY x.vec_id ORDER BY
        |    list_dot_product(x.vv, c.cv) / (sqrt(list_dot_product(x.vv, x.vv)) * sqrt(list_dot_product(c.cv, c.cv))) DESC,
        |    c.cell) AS crn
        |  FROM vecs x CROSS JOIN cent c),
        |asg AS (SELECT vec_id, cell FROM cells WHERE crn = 1),
        |qprobe AS (SELECT vec_id AS query_id, cell FROM cells
        |  WHERE vec_id < 8 AND crn <= 2),
        |cand AS (SELECT DISTINCT qp.query_id, a.vec_id AS neighbor_id
        |  FROM qprobe qp JOIN asg a ON a.cell = qp.cell
        |  WHERE a.vec_id <> qp.query_id),
        |subs AS (SELECT vec_id, CAST(s.i AS BIGINT) AS sub,
        |    vv[CAST(s.i * 16 + 1 AS INT) : CAST(s.i * 16 + 16 AS INT)] AS xs
        |  FROM vecs, LATERAL (SELECT unnest(range(0, 4)) AS i) s),
        |cb AS (SELECT vec_id AS code, sub, xs AS cs FROM subs WHERE vec_id < 8),
        |sc AS (SELECT x.vec_id, x.sub, c.code,
        |  row_number() OVER (PARTITION BY x.vec_id, x.sub ORDER BY
        |    list_dot_product(x.xs, x.xs) - 2 * list_dot_product(x.xs, c.cs)
        |      + list_dot_product(c.cs, c.cs), c.code) AS rn
        |  FROM subs x JOIN cb c USING (sub)),
        |codes AS (SELECT vec_id, sub, code FROM sc WHERE rn = 1),
        |q AS (SELECT vec_id AS query_id, sub, xs AS qs FROM subs WHERE vec_id < 8),
        |lut AS (SELECT q.query_id, c.sub, c.code,
        |    CAST(round(greatest(list_dot_product(q.qs, q.qs)
        |      - 2 * list_dot_product(q.qs, c.cs)
        |      + list_dot_product(c.cs, c.cs), 0) * 100000) AS BIGINT) AS d
        |  FROM q JOIN cb c USING (sub)),
        |sc2 AS (SELECT l.query_id, k.vec_id AS neighbor_id,
        |    CAST(sum(l.d) AS BIGINT) AS adist_tb
        |  FROM codes k
        |  JOIN lut l ON l.sub = k.sub AND l.code = k.code
        |  JOIN cand cd ON cd.query_id = l.query_id AND cd.neighbor_id = k.vec_id
        |  WHERE k.vec_id <> l.query_id GROUP BY 1, 2),
        |r AS (SELECT query_id, neighbor_id, adist_tb,
        |    CAST(row_number() OVER (PARTITION BY query_id
        |      ORDER BY adist_tb, neighbor_id) AS BIGINT) AS rn FROM sc2)
        |SELECT query_id, neighbor_id, adist_tb, rn FROM r WHERE rn <= 5
        |ORDER BY query_id, rn""".stripMargin,
    "q247_best_threshold" ->
      // the same histogram + descending cumulative identity; max micro-F1
      // then max threshold among ties
      """WITH s AS (SELECT CAST(n_chars AS BIGINT) AS sc, lang = 'en' AS lab FROM documents),
        |h AS (SELECT sc, sum(CASE WHEN lab THEN 1 ELSE 0 END) AS np,
        |    count(*) AS nc FROM s GROUP BY 1),
        |p AS (SELECT sum(np) AS pos FROM h),
        |c AS (SELECT sc, sum(np) OVER (ORDER BY sc DESC) AS tp,
        |    sum(nc) OVER (ORDER BY sc DESC) AS cn FROM h),
        |f AS (SELECT sc, tp, cn, (2 * tp * 1000000) // (cn + p.pos) AS f1m
        |  FROM c, p WHERE p.pos > 0),
        |b AS (SELECT max(f1m) AS mf FROM f),
        |bt AS (SELECT max(sc) AS ms FROM f, b WHERE f1m = mf)
        |SELECT f.sc AS threshold, CAST(tp AS BIGINT) AS tp,
        |  CAST(cn - tp AS BIGINT) AS fp, CAST(p.pos - tp AS BIGINT) AS fn,
        |  (round(2.0 * tp / (cn + p.pos), 4) + 0.0) AS f1
        |FROM f, p, bt WHERE f.sc = bt.ms""".stripMargin,
    "q248_stream_trending" ->
      // the batch twin: daily (day, k) counts, rank by (cnt DESC, k)
      """WITH e AS (SELECT date_trunc('day', CAST(ts AS TIMESTAMP)) AS day_start,
        |    CAST(json_extract(props, '$.k') AS BIGINT) AS k FROM events),
        |c AS (SELECT day_start, k, count(*) AS cnt FROM e
        |  WHERE k IS NOT NULL GROUP BY 1, 2)
        |SELECT day_start, k, CAST(cnt AS BIGINT) AS cnt,
        |  CAST(row_number() OVER (PARTITION BY day_start
        |    ORDER BY cnt DESC, k) AS BIGINT) AS rn
        |FROM c QUALIFY rn <= 3 ORDER BY day_start, rn""".stripMargin,
    "q249_bpe_curve" -> bpeCurveOracleSql(Seq(0, 2, 4, 8)),
    "q250_modularity" -> q250Sql,
    "q251_fk_audit" ->
      // the same left-join orphan counts per declared relation
      """WITH a AS (SELECT 'lineitem.orderkey' AS relation, count(*) AS n_rows,
        |    sum(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END) AS n_orphans
        |  FROM lineitem l LEFT JOIN (SELECT DISTINCT o_orderkey FROM orders) o
        |    ON o.o_orderkey = l.l_orderkey WHERE l.l_orderkey IS NOT NULL),
        |b AS (SELECT 'orders.custkey', count(*),
        |    sum(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END)
        |  FROM orders r LEFT JOIN (SELECT DISTINCT c_custkey FROM customer) c
        |    ON c.c_custkey = r.o_custkey WHERE r.o_custkey IS NOT NULL),
        |cN AS (SELECT 'customer.nationkey', count(*),
        |    sum(CASE WHEN n.n_nationkey IS NULL THEN 1 ELSE 0 END)
        |  FROM customer cu LEFT JOIN (SELECT DISTINCT n_nationkey FROM nation) n
        |    ON n.n_nationkey = cu.c_nationkey WHERE cu.c_nationkey IS NOT NULL),
        |d AS (SELECT 'events.user_id', count(*),
        |    sum(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END)
        |  FROM events e LEFT JOIN (SELECT DISTINCT c_custkey FROM customer) c
        |    ON c.c_custkey = e.user_id WHERE e.user_id IS NOT NULL),
        |u AS (SELECT * FROM a UNION ALL SELECT * FROM b
        |  UNION ALL SELECT * FROM cN UNION ALL SELECT * FROM d)
        |SELECT relation, CAST(n_rows AS BIGINT) AS n_rows,
        |  CAST(n_orphans AS BIGINT) AS n_orphans, n_orphans = 0 AS intact
        |FROM u ORDER BY relation""".stripMargin,
    "q252_seq_monitor" ->
      // identical cumulative frame; the crossing on HUGEINT, final state
      // via max-by-day
      """WITH e AS (SELECT event_type AS g, user_id % 2 AS arm,
        |    CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d FROM events),
        |daily AS (SELECT g, d,
        |    sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS a,
        |    sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS b
        |  FROM e GROUP BY 1, 2),
        |cum AS (SELECT g, d,
        |    sum(a) OVER (PARTITION BY g ORDER BY d) AS ca,
        |    sum(b) OVER (PARTITION BY g ORDER BY d) AS cb
        |  FROM daily),
        |fl AS (SELECT g, d, ca - cb AS diff, ca + cb AS n,
        |    CAST(ca - cb AS HUGEINT) * (ca - cb) * 10000
        |      > CAST(38416 AS HUGEINT) * (ca + cb) AS sig
        |  FROM cum),
        |lastd AS (SELECT g, max(d) AS md FROM fl GROUP BY 1)
        |SELECT f.g AS event_type, CAST(count(*) AS BIGINT) AS n_days,
        |  min(CASE WHEN f.sig THEN f.d END) AS first_sig_day,
        |  CAST(max(CASE WHEN f.d = l.md THEN f.diff END) AS BIGINT) AS final_diff,
        |  CAST(max(CASE WHEN f.d = l.md THEN f.n END) AS BIGINT) AS final_n,
        |  (round(CAST(max(CASE WHEN f.d = l.md THEN f.diff END) AS DOUBLE) /
        |    sqrt(CAST(max(CASE WHEN f.d = l.md THEN f.n END) AS DOUBLE)), 4)
        |    + 0.0) AS final_z
        |FROM fl f JOIN lastd l ON l.g = f.g
        |GROUP BY f.g ORDER BY event_type""".stripMargin,
    "q254_lsh_curve" -> q254Sql,
    "q255_dedup_funnel" -> q255Sql,
    "q256_ivfpq_recall" ->
      // q246's composed IVF+PQ chain with DISJOINT slices (cent 100-115,
      // codebook 200-207) + q225's truth/recall join
      """WITH vecs AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vv FROM embeddings),
        |qv AS (SELECT vec_id AS query_id, vv AS qvv FROM vecs WHERE vec_id < 8),
        |bs AS (SELECT query_id, vec_id AS neighbor_id,
        |  list_dot_product(qvv, vv) / (sqrt(list_dot_product(qvv, qvv)) * sqrt(list_dot_product(vv, vv))) AS cosine
        |  FROM vecs CROSS JOIN qv WHERE vec_id <> query_id),
        |tr AS (SELECT query_id, neighbor_id FROM (SELECT query_id, neighbor_id,
        |  row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rn
        |  FROM bs) WHERE rn <= 5),
        |cent AS (SELECT vec_id AS cell, vv AS cv FROM vecs
        |  WHERE vec_id >= 100 AND vec_id < 116),
        |cells AS (SELECT x.vec_id, c.cell,
        |  row_number() OVER (PARTITION BY x.vec_id ORDER BY
        |    list_dot_product(x.vv, c.cv) / (sqrt(list_dot_product(x.vv, x.vv)) * sqrt(list_dot_product(c.cv, c.cv))) DESC,
        |    c.cell) AS crn
        |  FROM vecs x CROSS JOIN cent c),
        |asg AS (SELECT vec_id, cell FROM cells WHERE crn = 1),
        |qprobe AS (SELECT vec_id AS query_id, cell FROM cells
        |  WHERE vec_id < 8 AND crn <= 2),
        |cand AS (SELECT DISTINCT qp.query_id, a.vec_id AS neighbor_id
        |  FROM qprobe qp JOIN asg a ON a.cell = qp.cell
        |  WHERE a.vec_id <> qp.query_id),
        |subs AS (SELECT vec_id, CAST(s.i AS BIGINT) AS sub,
        |    vv[CAST(s.i * 16 + 1 AS INT) : CAST(s.i * 16 + 16 AS INT)] AS xs
        |  FROM vecs, LATERAL (SELECT unnest(range(0, 4)) AS i) s),
        |cb AS (SELECT vec_id AS code, sub, xs AS cs FROM subs
        |  WHERE vec_id >= 200 AND vec_id < 208),
        |sc AS (SELECT x.vec_id, x.sub, c.code,
        |  row_number() OVER (PARTITION BY x.vec_id, x.sub ORDER BY
        |    list_dot_product(x.xs, x.xs) - 2 * list_dot_product(x.xs, c.cs)
        |      + list_dot_product(c.cs, c.cs), c.code) AS rn
        |  FROM subs x JOIN cb c USING (sub)),
        |codes AS (SELECT vec_id, sub, code FROM sc WHERE rn = 1),
        |q AS (SELECT vec_id AS query_id, sub, xs AS qs FROM subs WHERE vec_id < 8),
        |lut AS (SELECT q.query_id, c.sub, c.code,
        |    CAST(round(greatest(list_dot_product(q.qs, q.qs)
        |      - 2 * list_dot_product(q.qs, c.cs)
        |      + list_dot_product(c.cs, c.cs), 0) * 100000) AS BIGINT) AS d
        |  FROM q JOIN cb c USING (sub)),
        |sc2 AS (SELECT l.query_id, k.vec_id AS neighbor_id,
        |    CAST(sum(l.d) AS BIGINT) AS adist_tb
        |  FROM codes k
        |  JOIN lut l ON l.sub = k.sub AND l.code = k.code
        |  JOIN cand cd ON cd.query_id = l.query_id AND cd.neighbor_id = k.vec_id
        |  WHERE k.vec_id <> l.query_id GROUP BY 1, 2),
        |ap AS (SELECT query_id, neighbor_id FROM (SELECT query_id, neighbor_id,
        |    row_number() OVER (PARTITION BY query_id
        |      ORDER BY adist_tb, neighbor_id) AS rn FROM sc2) WHERE rn <= 5)
        |SELECT tr.query_id, CAST(count(ap.neighbor_id) AS BIGINT) AS hits,
        |  (round(count(ap.neighbor_id) / 5.0, 4) + 0.0) AS recall
        |FROM tr LEFT JOIN ap ON ap.query_id = tr.query_id AND ap.neighbor_id = tr.neighbor_id
        |GROUP BY tr.query_id ORDER BY tr.query_id""".stripMargin,
    "q257_ivf_train" -> q257Sql,
    "q258_ivf_train_recall" -> q258Sql,
    "q268_ivfpq_curve" -> q268Sql,
    "q269_pq_codebook_curve" -> q269Sql,
    "q260_sequence_pack" ->
      // inclusive prefix sum over doc order; straddle = span crossing a
      // 256-token boundary; floor-bp ratios; zero-token docs excluded
      """WITH t AS (SELECT doc_id,
        |    CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS tk
        |  FROM documents),
        |c AS (SELECT doc_id, tk, sum(tk) OVER (ORDER BY doc_id) AS e
        |  FROM t WHERE tk > 0),
        |s AS (SELECT count(*) AS n, sum(tk) AS tot,
        |    sum(CASE WHEN (e - tk) // 256 <> (e - 1) // 256 THEN 1 ELSE 0 END) AS st
        |  FROM c)
        |SELECT CAST(n AS BIGINT) AS n_docs, CAST(tot AS BIGINT) AS total_tokens,
        |  CAST((tot + 255) // 256 AS BIGINT) AS n_chunks,
        |  CAST(st AS BIGINT) AS n_straddle,
        |  CAST((10000 * st) // greatest(n, 1) AS BIGINT) AS straddle_bp,
        |  CAST((10000 * (((tot + 255) // 256) * 256 - tot)) //
        |    (((tot + 255) // 256) * 256) AS BIGINT) AS tail_waste_bp
        |FROM s""".stripMargin,
    "q261_mixture_plan" ->
      // weight-share targets on exact longs; sources outside the weight
      // table (or with no tokens) drop out
      """WITH w(source, wt) AS (VALUES ('src0', 4), ('src1', 3), ('src2', 2), ('src3', 1)),
        |a AS (SELECT source,
        |    CAST(sum(len(regexp_extract_all(text, '\S+'))) AS BIGINT) AS avail
        |  FROM documents GROUP BY 1)
        |SELECT a.source, a.avail AS available_tokens,
        |  CAST((100000 * w.wt) // 10 AS BIGINT) AS target_tokens,
        |  CAST((10000 * ((100000 * w.wt) // 10)) // a.avail AS BIGINT) AS epochs_bp
        |FROM a JOIN w USING (source)
        |WHERE w.wt > 0 AND a.avail > 0 ORDER BY a.source""".stripMargin,
    "q262_dup_spans" ->
      // positional 3-token windows, occurrence counts on the same
      // Karp-Rabin fingerprint the Spark exchange keys on (q53/q254
      // convention), verdict join + per-doc floor-bp aggregate
      s"""WITH ws AS (SELECT doc_id, regexp_split_to_array(lower(text), '\\s+') AS w FROM documents),
         |sh AS (SELECT doc_id,
         |    w[CAST(i AS BIGINT)] || ' ' || w[CAST(i AS BIGINT) + 1] || ' ' ||
         |      w[CAST(i AS BIGINT) + 2] AS shingle
         |  FROM ws, LATERAL (SELECT unnest(range(1, len(w) - 1)) AS i) t),
         |h AS (SELECT doc_id, ${krSql("shingle")} AS hv FROM sh),
         |f AS (SELECT hv, count(*) AS cf FROM h GROUP BY 1)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans,
         |  CAST(sum(CASE WHEN cf > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
         |  CAST((10000 * sum(CASE WHEN cf > 1 THEN 1 ELSE 0 END)) // count(*)
         |    AS BIGINT) AS dup_bp
         |FROM h JOIN f USING (hv) GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q264_hard_negatives" ->
      // q45's brute-force chain with the different-label filter
      """WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv,
        |    label AS ql FROM embeddings WHERE vec_id < 8),
        |c AS (SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS cv,
        |    label AS cl FROM embeddings),
        |s AS (SELECT query_id, neighbor_id,
        |  list_dot_product(qv, cv) / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv))) AS cosine
        |  FROM c CROSS JOIN q WHERE neighbor_id <> query_id AND cl <> ql),
        |r AS (SELECT query_id, neighbor_id, cosine,
        |  CAST(row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS BIGINT) AS rn FROM s)
        |SELECT query_id, neighbor_id, (round(cosine, 4) + 0.0) AS cosine, rn
        |FROM r WHERE rn <= 3 ORDER BY query_id, rn""".stripMargin,
    "q259_cached_views" ->
      // q34's lexicon/compound CTEs; both views from one labeled frame
      // (the cache is never semantic, so the oracle just recomputes)
      s"""WITH lex(word, tenths) AS (VALUES $lexValues),
         |tok AS (SELECT doc_id, unnest(regexp_split_to_array(lower(text), '\\s+')) AS word FROM documents),
         |sc AS (SELECT doc_id, sum(tenths) / 10.0 AS sv FROM tok JOIN lex USING (word) GROUP BY doc_id),
         |lab AS (SELECT d.doc_id, d.lang,
         |  CASE WHEN coalesce(sv, 0.0) / sqrt(coalesce(sv, 0.0) * coalesce(sv, 0.0) + 15.0) >= 0.05 THEN 'positive'
         |       WHEN coalesce(sv, 0.0) / sqrt(coalesce(sv, 0.0) * coalesce(sv, 0.0) + 15.0) <= -0.05 THEN 'negative'
         |       ELSE 'neutral' END AS sentiment
         |  FROM documents d LEFT JOIN sc USING (doc_id)),
         |u AS (SELECT 'by_sentiment' AS view_name, sentiment AS k, count(*) AS n
         |    FROM lab GROUP BY 2
         |  UNION ALL
         |  SELECT 'positive_by_lang', lang, count(*) FROM lab
         |    WHERE sentiment = 'positive' GROUP BY 2)
         |SELECT view_name, k, CAST(n AS BIGINT) AS n FROM u
         |ORDER BY view_name, k""".stripMargin,
    "q253_cuped" ->
      // the identical sufficient-stat aggregate and double chain; the
      // split anchors on min(day) + 15
      """WITH e AS (SELECT user_id, user_id % 2 AS arm,
        |    CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d,
        |    CAST(round(value * 100, 0) AS BIGINT) AS u FROM events),
        |a AS (SELECT min(d) AS d0 FROM e),
        |per AS (SELECT user_id, arm,
        |    sum(CASE WHEN e.d < a.d0 + 15 THEN u ELSE 0 END) AS x,
        |    sum(CASE WHEN e.d < a.d0 + 15 THEN 0 ELSE u END) AS y
        |  FROM e, a GROUP BY 1, 2),
        |s AS (SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy,
        |    sum(CAST(x AS HUGEINT) * x) AS sxx, sum(CAST(x AS HUGEINT) * y) AS sxy,
        |    sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS na,
        |    sum(CASE WHEN arm = 0 THEN x ELSE 0 END) AS sxa,
        |    sum(CASE WHEN arm = 0 THEN y ELSE 0 END) AS sya,
        |    sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS nb,
        |    sum(CASE WHEN arm = 1 THEN x ELSE 0 END) AS sxb,
        |    sum(CASE WHEN arm = 1 THEN y ELSE 0 END) AS syb
        |  FROM per)
        |SELECT CAST(n AS BIGINT) AS n_users, CAST(na AS BIGINT) AS n_a,
        |  CAST(nb AS BIGINT) AS n_b,
        |  (round(CAST(CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy AS DOUBLE) /
        |    CAST(CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx AS DOUBLE), 4)
        |    + 0.0) AS theta,
        |  (round(CAST(sya AS DOUBLE) / na - CAST(syb AS DOUBLE) / nb, 4) + 0.0)
        |    AS diff_raw,
        |  (round(CAST(sya AS DOUBLE) / na - CAST(syb AS DOUBLE) / nb -
        |    (CAST(CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy AS DOUBLE) /
        |     CAST(CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx AS DOUBLE)) *
        |    (CAST(sxa AS DOUBLE) / na - CAST(sxb AS DOUBLE) / nb), 4) + 0.0)
        |    AS diff_adj
        |FROM s WHERE na > 0 AND nb > 0
        |  AND CAST(n AS HUGEINT) * sxx <> CAST(sx AS HUGEINT) * sx""".stripMargin,
    "q224_pq_search" ->
      // q116's assignment CTEs verbatim, then the ADC chain: per-query LUT
      // of round(d·1e5) longs (clamped at 0 like q209), exact long sums,
      // (adist_tb, neighbor_id) ranking
      """WITH vecs AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vv FROM embeddings),
        |subs AS (SELECT vec_id, CAST(s.i AS BIGINT) AS sub,
        |    vv[CAST(s.i * 16 + 1 AS INT) : CAST(s.i * 16 + 16 AS INT)] AS xs
        |  FROM vecs, LATERAL (SELECT unnest(range(0, 4)) AS i) s),
        |cb AS (SELECT vec_id AS code, sub, xs AS cs FROM subs WHERE vec_id < 8),
        |sc AS (SELECT x.vec_id, x.sub, c.code,
        |  row_number() OVER (PARTITION BY x.vec_id, x.sub ORDER BY
        |    list_dot_product(x.xs, x.xs) - 2 * list_dot_product(x.xs, c.cs)
        |      + list_dot_product(c.cs, c.cs), c.code) AS rn
        |  FROM subs x JOIN cb c USING (sub)),
        |codes AS (SELECT vec_id, sub, code FROM sc WHERE rn = 1),
        |q AS (SELECT vec_id AS query_id, sub, xs AS qs FROM subs WHERE vec_id < 8),
        |lut AS (SELECT q.query_id, c.sub, c.code,
        |    CAST(round(greatest(list_dot_product(q.qs, q.qs)
        |      - 2 * list_dot_product(q.qs, c.cs)
        |      + list_dot_product(c.cs, c.cs), 0) * 100000) AS BIGINT) AS d
        |  FROM q JOIN cb c USING (sub)),
        |sc2 AS (SELECT l.query_id, k.vec_id AS neighbor_id,
        |    CAST(sum(l.d) AS BIGINT) AS adist_tb
        |  FROM codes k JOIN lut l ON l.sub = k.sub AND l.code = k.code
        |  WHERE k.vec_id <> l.query_id GROUP BY 1, 2),
        |r AS (SELECT query_id, neighbor_id, adist_tb,
        |    CAST(row_number() OVER (PARTITION BY query_id
        |      ORDER BY adist_tb, neighbor_id) AS BIGINT) AS rn FROM sc2)
        |SELECT query_id, neighbor_id, adist_tb, rn FROM r WHERE rn <= 5
        |ORDER BY query_id, rn""".stripMargin,
    "q225_pq_recall" ->
      // q45's truth CTE + q224's ADC chain, joined per (query, neighbor)
      """WITH vecs AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vv FROM embeddings),
        |qv AS (SELECT vec_id AS query_id, vv AS qvv FROM vecs WHERE vec_id < 8),
        |bs AS (SELECT query_id, vec_id AS neighbor_id,
        |  list_dot_product(qvv, vv) / (sqrt(list_dot_product(qvv, qvv)) * sqrt(list_dot_product(vv, vv))) AS cosine
        |  FROM vecs CROSS JOIN qv WHERE vec_id <> query_id),
        |tr AS (SELECT query_id, neighbor_id FROM (SELECT query_id, neighbor_id,
        |  row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rn
        |  FROM bs) WHERE rn <= 5),
        |subs AS (SELECT vec_id, CAST(s.i AS BIGINT) AS sub,
        |    vv[CAST(s.i * 16 + 1 AS INT) : CAST(s.i * 16 + 16 AS INT)] AS xs
        |  FROM vecs, LATERAL (SELECT unnest(range(0, 4)) AS i) s),
        |cb AS (SELECT vec_id AS code, sub, xs AS cs FROM subs WHERE vec_id < 8),
        |sc AS (SELECT x.vec_id, x.sub, c.code,
        |  row_number() OVER (PARTITION BY x.vec_id, x.sub ORDER BY
        |    list_dot_product(x.xs, x.xs) - 2 * list_dot_product(x.xs, c.cs)
        |      + list_dot_product(c.cs, c.cs), c.code) AS rn
        |  FROM subs x JOIN cb c USING (sub)),
        |codes AS (SELECT vec_id, sub, code FROM sc WHERE rn = 1),
        |q AS (SELECT vec_id AS query_id, sub, xs AS qs FROM subs WHERE vec_id < 8),
        |lut AS (SELECT q.query_id, c.sub, c.code,
        |    CAST(round(greatest(list_dot_product(q.qs, q.qs)
        |      - 2 * list_dot_product(q.qs, c.cs)
        |      + list_dot_product(c.cs, c.cs), 0) * 100000) AS BIGINT) AS d
        |  FROM q JOIN cb c USING (sub)),
        |sc2 AS (SELECT l.query_id, k.vec_id AS neighbor_id,
        |    CAST(sum(l.d) AS BIGINT) AS adist_tb
        |  FROM codes k JOIN lut l ON l.sub = k.sub AND l.code = k.code
        |  WHERE k.vec_id <> l.query_id GROUP BY 1, 2),
        |ap AS (SELECT query_id, neighbor_id FROM (SELECT query_id, neighbor_id,
        |    CAST(row_number() OVER (PARTITION BY query_id
        |      ORDER BY adist_tb, neighbor_id) AS BIGINT) AS rn FROM sc2) WHERE rn <= 5)
        |SELECT tr.query_id, CAST(count(ap.neighbor_id) AS BIGINT) AS hits,
        |  (round(count(ap.neighbor_id) / 5.0, 4) + 0.0) AS recall
        |FROM tr LEFT JOIN ap ON ap.query_id = tr.query_id AND ap.neighbor_id = tr.neighbor_id
        |GROUP BY tr.query_id ORDER BY tr.query_id""".stripMargin,
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
    // the custom-state path must agree with the SAME declarative oracle
    "q75_stateful_sessions" -> sessionizeSql,
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
    "q92_jdbc_roundtrip" ->
      """SELECT event_type, strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS day, count(*) AS cnt
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q93_vocab_encode" ->
      """WITH raw AS (SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS arr FROM documents),
        |tokraw AS (SELECT doc_id,
        |  unnest(list_transform(range(1, len(arr) + 1),
        |    i -> {'pos': i, 'tok': arr[CAST(i AS INT)]})) AS u FROM raw),
        |tok AS (SELECT doc_id, u.pos AS pos, u.tok AS tok FROM tokraw WHERE length(u.tok) > 0),
        |v AS (SELECT tok, count(*) AS freq FROM tok GROUP BY 1),
        |v2 AS (SELECT tok, CAST(row_number() OVER (ORDER BY freq DESC, tok) AS BIGINT) AS token_id FROM v),
        |seq AS (SELECT doc_id, list(token_id ORDER BY pos) AS ids
        |  FROM tok JOIN v2 USING (tok) GROUP BY 1)
        |SELECT doc_id, CAST(len(ids) AS BIGINT) AS n_tokens,
        |  list_reduce(list_prepend(CAST(0 AS BIGINT), ids),
        |    (a, b) -> (a * 31 + b) % 1000000007) AS ids_fp
        |FROM seq ORDER BY doc_id""".stripMargin,
    "q91_sequence_packing" ->
      """WITH t AS (SELECT doc_id,
        |  CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tokens FROM documents),
        |c AS (SELECT doc_id, n_tokens,
        |  -- integer // : DuckDB's CAST(double AS BIGINT) rounds to nearest,
        |  -- Spark's cast truncates — floor division sidesteps both
        |  (CAST(sum(n_tokens) OVER (ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) - n_tokens)
        |    // 2048 AS chunk_id
        |  FROM t)
        |SELECT chunk_id, count(*) AS docs, CAST(sum(n_tokens) AS BIGINT) AS tokens,
        |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
        |FROM c GROUP BY 1 ORDER BY 1""".stripMargin,
    "q89_histogram" ->
      """SELECT event_type, CAST(floor(value / 25) * 25 AS BIGINT) AS bin, count(*) AS cnt
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q90_zscore_anomaly" ->
      """WITH d AS (SELECT strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS day,
        |  CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS c
        |  FROM events GROUP BY 1),
        |i AS (SELECT day, c,
        |  CAST(CAST(day AS DATE) - DATE '1970-01-01' AS BIGINT) AS day_idx FROM d),
        |m AS (SELECT day, c,
        |  CAST(count(*) OVER w AS DOUBLE) AS n,
        |  CAST(CAST(sum(c) OVER w AS BIGINT) AS DOUBLE) AS sc,
        |  CAST(CAST(sum(c * c) OVER w AS BIGINT) AS DOUBLE) AS scc
        |  FROM i WINDOW w AS (ORDER BY day_idx RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)),
        |z AS (SELECT day, c,
        |  CASE WHEN (scc / n - (sc / n) * (sc / n)) > 0
        |       AND sqrt(scc / n - (sc / n) * (sc / n)) > 0
        |    THEN (round((CAST(c AS DOUBLE) - sc / n) / sqrt(scc / n - (sc / n) * (sc / n)), 4) + 0.0)
        |    ELSE 0.0 END AS zscore
        |  FROM m)
        |SELECT day, c / 100.0 AS day_value, zscore, abs(zscore) > 2 AS anomaly
        |FROM z ORDER BY day""".stripMargin,
    "q88_bucketed_join" ->
      """SELECT c_mktsegment, count(*) AS cnt,
        |  CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) / 100.0 AS sum_price
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q86_funnel" ->
      """WITH ev AS (SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts FROM events),
        |s1 AS (SELECT user_id, min(ts) AS t1 FROM ev WHERE event_type = 'signup' GROUP BY 1),
        |s2 AS (SELECT user_id, min(ts) AS t2 FROM ev JOIN s1 USING (user_id)
        |  WHERE event_type = 'view' AND ts > t1 GROUP BY 1),
        |s3 AS (SELECT user_id, min(ts) AS t3 FROM ev JOIN s2 USING (user_id)
        |  WHERE event_type = 'purchase' AND ts > t2 GROUP BY 1)
        |SELECT stage, users FROM (
        |  SELECT '1_signup' AS stage, count(*) AS users FROM s1
        |  UNION ALL SELECT '2_view', count(*) FROM s2
        |  UNION ALL SELECT '3_purchase', count(*) FROM s3)
        |ORDER BY stage""".stripMargin,
    "q87_retention" ->
      """WITH ev AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
        |c AS (SELECT user_id, min(CAST(ts AS DATE)) AS cohort_day FROM ev GROUP BY 1),
        |j AS (SELECT user_id, cohort_day,
        |  CAST(CAST(ts AS DATE) - cohort_day AS BIGINT) AS day_offset
        |  FROM ev JOIN c USING (user_id))
        |SELECT strftime(cohort_day, '%Y-%m-%d') AS cohort, day_offset,
        |  count(DISTINCT user_id) AS active_users
        |FROM j WHERE day_offset IN (0, 1, 7) GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q85_salted_join" ->
      """WITH t AS (SELECT event_type, count(*) AS type_total FROM events GROUP BY 1)
        |SELECT event_id, event_type, type_total FROM events JOIN t USING (event_type)
        |ORDER BY event_id""".stripMargin,
    "q83_custom_udaf" ->
      """WITH c AS (SELECT event_type, CAST(round(value * 100, 0) AS BIGINT) AS cents FROM events)
        |SELECT event_type,
        |  (round(sqrt(CAST(CAST(sum(cents * cents) AS BIGINT) AS DOUBLE) / count(*)) / 100.0, 4) + 0.0) AS rms_value
        |FROM c GROUP BY 1 ORDER BY 1""".stripMargin,
    "q94_scd2_history" ->
      """WITH ev AS (SELECT user_id, event_type AS state, CAST(ts AS TIMESTAMP) AS ts, event_id FROM events),
        |ch AS (SELECT *, lag(state) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev FROM ev),
        |f AS (SELECT user_id, state, ts AS valid_from, event_id FROM ch
        |  WHERE prev IS NULL OR prev <> state)
        |SELECT user_id, state, valid_from,
        |  lead(valid_from) OVER w AS valid_to,
        |  lead(valid_from) OVER w IS NULL AS is_current
        |FROM f WINDOW w AS (PARTITION BY user_id ORDER BY valid_from, event_id)
        |ORDER BY user_id, valid_from""".stripMargin,
    "q95_merge_upsert" ->
      """WITH ev AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
        |  CAST(round(value * 100, 0) AS BIGINT) AS cents FROM events),
        |t AS (SELECT user_id, count(*) AS tn, CAST(sum(cents) AS BIGINT) AS tc
        |  FROM ev WHERE ts < TIMESTAMP '2024-01-03' GROUP BY 1),
        |u AS (SELECT user_id, count(*) AS un, CAST(sum(cents) AS BIGINT) AS uc
        |  FROM ev WHERE ts >= TIMESTAMP '2024-01-28' GROUP BY 1)
        |SELECT user_id, coalesce(un, tn) AS n_events, coalesce(uc, tc) AS total_cents,
        |  CASE WHEN un IS NOT NULL AND tn IS NOT NULL THEN 'update'
        |       WHEN tn IS NULL THEN 'insert' ELSE 'keep' END AS merge_action
        |FROM t FULL OUTER JOIN u USING (user_id) ORDER BY user_id""".stripMargin,
    "q96_decile_stats" ->
      """WITH d AS (SELECT doc_id, n_chars,
        |  CAST(ntile(10) OVER (ORDER BY n_chars, doc_id) AS BIGINT) AS decile FROM documents)
        |SELECT decile, count(*) AS cnt, min(n_chars) AS min_chars, max(n_chars) AS max_chars,
        |  CAST(CAST(sum(n_chars) AS BIGINT) AS DOUBLE) / count(*) AS avg_chars
        |FROM d GROUP BY 1 ORDER BY 1""".stripMargin,
    "q97_latest_per_key" ->
      """WITH ev AS (SELECT user_id, event_id, event_type, CAST(ts AS TIMESTAMP) AS ts FROM events),
        |r AS (SELECT *, CAST(row_number() OVER (
        |  PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS BIGINT) AS rn FROM ev)
        |SELECT user_id, event_id, event_type, ts, rn FROM r WHERE rn <= 3
        |ORDER BY user_id, rn""".stripMargin,
    "q98_embed_quantize" ->
      """WITH m AS (SELECT vec_id, embedding,
        |  CAST(list_max(list_transform(embedding, x -> abs(x))) AS DOUBLE) AS mx FROM embeddings),
        |s AS (SELECT vec_id, embedding,
        |  CASE WHEN mx > 0 THEN 127.0 / mx ELSE 0.0 END AS scale FROM m),
        |q AS (SELECT vec_id, CAST(floor(scale * 1000000 + 0.5) AS BIGINT) AS scale_e6,
        |  list_transform(embedding,
        |    x -> CAST(floor(CAST(x AS DOUBLE) * scale + 0.5) AS BIGINT)) AS codes
        |  FROM s)
        |SELECT vec_id, scale_e6,
        |  list_reduce(list_prepend(CAST(0 AS BIGINT), codes),
        |    (acc, x) -> (acc * 31 + x + 128) % 1000000007) AS codes_fp,
        |  CAST(list_sum(codes) AS BIGINT) AS sum_codes,
        |  CAST(len(codes) AS BIGINT) AS n_dims
        |FROM q ORDER BY vec_id""".stripMargin,
    "q99_partitioned_layout" ->
      """WITH ev AS (SELECT strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS day,
        |  CAST(round(value * 100, 0) AS BIGINT) AS cents FROM events)
        |SELECT day, count(*) AS cnt, CAST(sum(cents) AS BIGINT) AS sum_cents
        |FROM ev WHERE day BETWEEN '2024-01-10' AND '2024-01-14'
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q100_bigram_freq" ->
      """WITH w AS (SELECT regexp_split_to_array(lower(text), '\s+') AS l FROM documents),
        |b AS (SELECT unnest(list_transform(range(1, len(l)), i -> l[i] || ' ' || l[i+1])) AS bigram
        |  FROM w WHERE len(l) >= 2)
        |SELECT bigram, count(*) AS cnt FROM b GROUP BY 1
        |ORDER BY cnt DESC, bigram LIMIT 40""".stripMargin,
    "q101_interval_merge" ->
      """WITH ev AS (SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS s FROM events),
        |i AS (SELECT user_id, s, s + 300000000 AS e FROM ev),
        |m AS (SELECT *, max(e) OVER (PARTITION BY user_id ORDER BY s, e
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm FROM i),
        |f AS (SELECT *, CASE WHEN pm IS NULL OR s > pm THEN 1 ELSE 0 END AS nf FROM m),
        |g AS (SELECT *, CAST(sum(nf) OVER (PARTITION BY user_id ORDER BY s, e
        |  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS island FROM f)
        |SELECT user_id, island, make_timestamp(min(s)) AS start_ts, make_timestamp(max(e)) AS end_ts,
        |  CAST(max(e) - min(s) AS BIGINT) AS covered_us
        |FROM g GROUP BY 1, 2 ORDER BY user_id, island""".stripMargin,
    "q102_contamination" ->
      """WITH ws AS (SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS w FROM documents),
        |sh AS (SELECT DISTINCT doc_id,
        |    w[CAST(i AS BIGINT)] || ' ' || w[CAST(i AS BIGINT) + 1] || ' ' || w[CAST(i AS BIGINT) + 2] AS shingle
        |  FROM ws, LATERAL (SELECT unnest(range(1, len(w) - 1)) AS i) t),
        |bench AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 97 = 0)
        |SELECT doc_id, count(*) AS hits, count(*) >= 3 AS contaminated
        |FROM sh JOIN bench USING (shingle) WHERE doc_id % 97 <> 0
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q103_token_zipf" ->
      """WITH tok AS (SELECT unnest(regexp_split_to_array(lower(text), '\s+')) AS token FROM documents),
        |c AS (SELECT token, count(*) AS cnt FROM tok WHERE len(token) > 0
        |  GROUP BY token ORDER BY cnt DESC, token LIMIT 50)
        |SELECT CAST(row_number() OVER (ORDER BY cnt DESC, token) AS BIGINT) AS rank, token, cnt,
        |  CAST(sum(cnt) OVER (ORDER BY cnt DESC, token ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_cnt
        |FROM c ORDER BY rank""".stripMargin,
    "q104_prefix_dedup" ->
      """WITH p AS (SELECT doc_id,
        |    substr(regexp_replace(lower(text), '\s+', ' ', 'g'), 1, 80) AS pref FROM documents)
        |SELECT doc_id, count(*) OVER (PARTITION BY pref) AS group_size,
        |  doc_id = min(doc_id) OVER (PARTITION BY pref) AS kept
        |FROM p ORDER BY doc_id""".stripMargin,
    "q105_cluster_reps" ->
      s"""WITH pairs AS MATERIALIZED ($q44Sql),
         |e AS MATERIALIZED (SELECT id_a AS src, id_b AS dst FROM pairs
         |      UNION SELECT id_b, id_a FROM pairs),
         |${minLabelCc()},
|lab AS (SELECT node, lab AS component FROM l$ccRounds),
         |j AS (SELECT lab.component, lab.node AS doc_id, d.n_chars
         |  FROM lab JOIN documents d ON d.doc_id = lab.node),
         |r AS (SELECT *, count(*) OVER (PARTITION BY component) AS cluster_size,
         |  row_number() OVER (PARTITION BY component ORDER BY n_chars DESC, doc_id) AS rk FROM j)
         |SELECT component, doc_id, n_chars, cluster_size, rk = 1 AS is_rep
         |FROM r ORDER BY component, doc_id""".stripMargin,
    "q106_sequence_assembly" ->
      """WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id, event_type FROM events)
        |SELECT user_id, strftime(ts, '%Y-%m-%d') AS day,
        |  string_agg(event_type, '>' ORDER BY ts, event_id) AS seq,
        |  count(*) AS n_events
        |FROM e GROUP BY 1, 2 ORDER BY user_id, day""".stripMargin,
    "q107_profile" ->
      Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority").map(c =>
        s"""SELECT '$c' AS col_name,
           |  CAST(coalesce(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_null,
           |  count(DISTINCT $c) AS n_distinct,
           |  CAST(min($c) AS VARCHAR) AS min_value, CAST(max($c) AS VARCHAR) AS max_value
           |FROM orders""".stripMargin)
        .mkString("", "\nUNION ALL\n", "\nORDER BY col_name"),
    "q108_sliding_distinct" ->
      """WITH e AS (SELECT DISTINCT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d, user_id FROM events),
        |days AS (SELECT DISTINCT d FROM e),
        |f AS (SELECT d + CAST(i AS INTEGER) AS day, user_id
        |  FROM e, LATERAL (SELECT unnest(range(0, 7)) AS i) t)
        |SELECT strftime(day, '%Y-%m-%d') AS day, count(DISTINCT user_id) AS active
        |FROM f WHERE day IN (SELECT d FROM days)
        |GROUP BY day ORDER BY day""".stripMargin,
    "q109_train_split" ->
      """WITH s AS (SELECT n_chars,
        |  -- reduce-first multiply, mirroring Curation.trainValTestSplit:
        |  -- overflow-free in BOTH engines for the whole BIGINT id domain
        |  CASE WHEN (((doc_id % 1000000007) * 2654435761) % 1000000007) % 100 < 80 THEN 'train'
        |       WHEN (((doc_id % 1000000007) * 2654435761) % 1000000007) % 100 < 90 THEN 'val'
        |       ELSE 'test' END AS split FROM documents)
        |SELECT split, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars
        |FROM s GROUP BY split ORDER BY split""".stripMargin,
    "q110_multimodal_features" ->
      // byte stats over the UTF-8 payload; ord(substr) == byte value on the
      // ASCII testdata (same precondition as the Karp–Rabin twin)
      """WITH b AS (SELECT doc_id, list_transform(range(1, length(text) + 1),
        |    i -> CAST(ord(substr(text, CAST(i AS INT), 1)) AS BIGINT)) AS bs FROM documents),
        |f AS (SELECT doc_id, CASE WHEN len(bs) = 0
        |    THEN [CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT)]
        |    ELSE [CAST(len(bs) AS BIGINT), CAST(list_sum(bs) AS BIGINT), list_min(bs), list_max(bs)]
        |    END AS fs FROM b)
        |SELECT doc_id, CAST(len(fs) AS BIGINT) AS n_features,
        |  list_reduce(list_prepend(CAST(0 AS BIGINT), fs),
        |    (a, x) -> (a * 31 + x) % 1000000007) AS features_fp
        |FROM f ORDER BY doc_id""".stripMargin,
    "q111_incremental_agg" ->
      // FULL recompute over base ∪ delta — the merge must equal this exactly
      """WITH ev AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
        |  CAST(round(value * 100, 0) AS BIGINT) AS cents FROM events)
        |SELECT user_id, count(*) AS n_events, CAST(sum(cents) AS BIGINT) AS total_cents,
        |  min(ts) AS first_ts, max(ts) AS last_ts
        |FROM ev GROUP BY 1 ORDER BY user_id""".stripMargin,
    "q112_image_decode" ->
      // the decoded properties of a solid-color (n_chars%16+1)×(doc_id%16+1)
      // PNG with RGB (doc_id%256, n_chars%256, 7) — pure arithmetic here,
      // genuine ImageIO parsing on the Spark side
      """SELECT doc_id, CAST(n_chars % 16 + 1 AS BIGINT) AS width,
        |  CAST(doc_id % 16 + 1 AS BIGINT) AS height,
        |  CAST(doc_id % 256 AS BIGINT) AS mean_r,
        |  CAST(n_chars % 256 AS BIGINT) AS mean_g,
        |  CAST(7 AS BIGINT) AS mean_b
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q113_audio_decode" ->
      // decoded WAV properties: 16 kHz, n_chars%500+1 frames, constant
      // amplitude doc_id%30000 — arithmetic here, real RIFF parsing there
      """SELECT doc_id, CAST(16000 AS BIGINT) AS sample_rate,
        |  CAST(n_chars % 500 + 1 AS BIGINT) AS n_frames,
        |  CAST(doc_id % 30000 AS BIGINT) AS peak
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q139_video_frames" ->
      // every-2nd-frame walk of a (n_chars%5+2)-frame animated GIF of
      // (doc_id%8+1)×3 solid-color frames — frame colors are pure
      // arithmetic here, genuine ImageIO container parsing on the Spark
      // side (indexed-palette GIF encoding is lossless, so means are exact)
      """WITH v AS (SELECT doc_id, n_chars, n_chars % 5 + 2 AS nf, doc_id % 8 + 1 AS w
        |  FROM documents),
        |f AS (SELECT doc_id, n_chars, nf, w, unnest(range(0, nf, 2)) AS frame_idx FROM v)
        |SELECT doc_id, CAST(nf AS BIGINT) AS n_frames,
        |  CAST(frame_idx AS BIGINT) AS frame_idx,
        |  CAST(w AS BIGINT) AS width, CAST(3 AS BIGINT) AS height,
        |  CAST((doc_id + 37 * frame_idx) % 256 AS BIGINT) AS mean_r,
        |  CAST((n_chars + 11 * frame_idx) % 256 AS BIGINT) AS mean_g,
        |  CAST((29 * frame_idx + 7) % 256 AS BIGINT) AS mean_b
        |FROM f ORDER BY doc_id, frame_idx""".stripMargin,
    "q140_token_entropy" ->
      // the identical ordered fold: per-token terms listed in sorted token
      // order, summed left-to-right from 0.0 — same IEEE ops, same order
      """WITH raw AS (SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS arr FROM documents),
        |tok AS (SELECT doc_id, unnest(arr) AS tok FROM raw),
        |tk AS (SELECT doc_id, tok, count(*) AS c FROM tok WHERE length(tok) > 0 GROUP BY 1, 2),
        |sz AS (SELECT doc_id, sum(c) AS n FROM tk GROUP BY 1),
        |terms AS (SELECT tk.doc_id, tk.tok,
        |  (CAST(c AS DOUBLE) / CAST(n AS DOUBLE)) * ln(CAST(c AS DOUBLE) / CAST(n AS DOUBLE)) AS term
        |  FROM tk JOIN sz USING (doc_id)),
        |ent AS (SELECT doc_id,
        |  (round(-list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list(term ORDER BY tok)),
        |    (a, b) -> a + b), 4) + 0.0) AS entropy
        |  FROM terms GROUP BY doc_id)
        |SELECT d.doc_id, CAST(coalesce(sz.n, 0) AS BIGINT) AS n_tokens,
        |  coalesce(ent.entropy, CAST(0.0 AS DOUBLE)) AS entropy
        |FROM documents d LEFT JOIN sz ON d.doc_id = sz.doc_id
        |LEFT JOIN ent ON d.doc_id = ent.doc_id
        |ORDER BY d.doc_id""".stripMargin,
    "q141_incremental_neardup" -> q141Sql,
    "q114_stream_outer_join" ->
      // NULLS FIRST matches Spark's ascending null ordering
      """WITH ev AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, event_type FROM events),
        |p AS (SELECT user_id, event_id AS purchase_id, ts AS purchase_ts FROM ev WHERE event_type = 'purchase'),
        |v AS (SELECT user_id, event_id AS view_id, ts AS view_ts FROM ev WHERE event_type = 'view')
        |SELECT p.user_id, purchase_id, view_id
        |FROM p LEFT JOIN v ON p.user_id = v.user_id
        |  AND view_ts BETWEEN purchase_ts - INTERVAL 1 HOUR AND purchase_ts
        |ORDER BY purchase_id, view_id NULLS FIRST""".stripMargin,
    "q84_full_outer_join" ->
      """WITH a AS (SELECT o_custkey AS custkey, count(*) AS cnt96 FROM orders
        |  WHERE year(o_orderdate) = 1996 GROUP BY 1),
        |b AS (SELECT o_custkey AS custkey, count(*) AS cnt97 FROM orders
        |  WHERE year(o_orderdate) = 1997 GROUP BY 1)
        |SELECT custkey, coalesce(cnt96, 0) AS cnt96, coalesce(cnt97, 0) AS cnt97
        |FROM a FULL OUTER JOIN b USING (custkey) ORDER BY custkey""".stripMargin,
    "q81_stream_stream_join" ->
      """WITH ev AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, event_type FROM events),
        |p AS (SELECT user_id, event_id AS purchase_id, ts AS purchase_ts FROM ev WHERE event_type = 'purchase'),
        |v AS (SELECT user_id, event_id AS view_id, ts AS view_ts FROM ev WHERE event_type = 'view')
        |SELECT p.user_id, purchase_id, view_id
        |FROM p JOIN v ON p.user_id = v.user_id
        |  AND view_ts BETWEEN purchase_ts - INTERVAL 1 HOUR AND purchase_ts
        |ORDER BY purchase_id, view_id""".stripMargin,
    "q82_hopping_window" ->
      // Spark window(ts, 1d, 6h): epoch-aligned starts; every event belongs
      // to exactly the 4 windows starting at floor_6h(ts) - k*6h, k = 0..3
      """WITH ev AS (SELECT CAST(ts AS TIMESTAMP) AS ts FROM events),
        |w AS (SELECT make_timestamp(((CAST(floor(epoch(ts) / 21600) AS BIGINT) - k.k) * 21600)
        |    * CAST(1000000 AS BIGINT)) AS bucket_start
        |  FROM ev CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS k) k)
        |SELECT bucket_start, count(*) AS cnt FROM w GROUP BY 1 ORDER BY 1""".stripMargin,
    "q79_weighted_mixture" ->
      // quotas = floor(40 * w / sum(w)): src1 -> 30, src2 -> 10, others 0
      """SELECT doc_id, source FROM (
        |  SELECT doc_id, source,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY ((doc_id % 1000003) * 2654435761) % 1000003, doc_id) AS rn
        |  FROM documents WHERE source IN ('src1', 'src2'))
        |WHERE rn <= CASE source WHEN 'src1' THEN 30 ELSE 10 END
        |ORDER BY source, doc_id""".stripMargin,
    "q80_moving_average" ->
      """WITH d AS (SELECT strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS day,
        |  CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS cents
        |  FROM events GROUP BY 1),
        |i AS (SELECT day, cents,
        |  CAST(CAST(day AS DATE) - DATE '1970-01-01' AS BIGINT) AS day_idx FROM d)
        |SELECT day, cents / 100.0 AS day_value,
        |  (round(CAST(CAST(sum(cents) OVER w AS BIGINT) AS DOUBLE)
        |    / CAST(count(*) OVER w AS BIGINT) / 100.0, 4) + 0.0) AS ma7
        |FROM i WINDOW w AS (ORDER BY day_idx RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
        |ORDER BY day""".stripMargin,
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
    "q128_doc_chunking" ->
      // same window arithmetic: ceil(n/15) windows (min 1), slices of 20;
      // DuckDB zips the parallel unnests positionally
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
        |c AS (SELECT doc_id,
        |  unnest(range(0, greatest(CAST(ceil(len(tk) / 15.0) AS BIGINT), 1))) AS chunk_id,
        |  unnest(list_transform(range(0, greatest(CAST(ceil(len(tk) / 15.0) AS BIGINT), 1)),
        |    i -> array_to_string(tk[i * 15 + 1 : i * 15 + 20], ' '))) AS chunk,
        |  unnest(list_transform(range(0, greatest(CAST(ceil(len(tk) / 15.0) AS BIGINT), 1)),
        |    i -> CAST(len(tk[i * 15 + 1 : i * 15 + 20]) AS BIGINT))) AS chunk_tokens
        |FROM t)
        |SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id, chunk, chunk_tokens
        |FROM c ORDER BY doc_id, chunk_id""".stripMargin,
    "q129_forward_fill" ->
      """SELECT event_id, user_id, ts,
        |  last_value(CASE WHEN event_type = 'purchase' THEN value END IGNORE NULLS)
        |    OVER (PARTITION BY user_id ORDER BY ts, event_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_value
        |FROM events ORDER BY event_id""".stripMargin,
    "q130_unicode_normalize" ->
      // chr(769)/chr(776) = the same combining acute/diaeresis the engine
      // appends; both engines implement Unicode NFC, both count code points
      """WITH r AS (SELECT doc_id,
        |    text || ' cafe' || chr(769) || ' nai' || chr(776) || 've' AS raw
        |  FROM documents)
        |SELECT doc_id, CAST(length(raw) AS BIGINT) AS n_chars_raw,
        |  nfc_normalize(raw) AS norm_text,
        |  CAST(length(nfc_normalize(raw)) AS BIGINT) AS n_chars_norm
        |FROM r ORDER BY doc_id""".stripMargin,
    "q131_attribution" ->
      // rn is unique inside each user, so min_by/max_by on it are
      // deterministic — the window twin of the engine's struct min/max
      """WITH e AS (SELECT user_id, ts, event_id, event_type,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        |  FROM events),
        |fp AS (SELECT user_id, min(rn) AS prn FROM e
        |       WHERE event_type = 'purchase' GROUP BY 1),
        |ft AS (SELECT user_id, min_by(event_type, rn) AS first_touch FROM e GROUP BY 1),
        |lt AS (SELECT e.user_id, max_by(e.event_type, e.rn) AS last_touch
        |       FROM e JOIN fp USING (user_id) WHERE e.rn < fp.prn GROUP BY 1),
        |cv AS (SELECT e.user_id, e.ts AS conversion_at
        |       FROM e JOIN fp USING (user_id) WHERE e.rn = fp.prn)
        |SELECT cv.user_id, ft.first_touch, lt.last_touch, cv.conversion_at
        |FROM cv JOIN ft USING (user_id) LEFT JOIN lt USING (user_id)
        |ORDER BY user_id""".stripMargin,
    "q132_manifest_prune" ->
      // pruning is invisible to correctness: the oracle is the full filter
      """SELECT event_id, ts, user_id, event_type FROM events
        |WHERE ts >= TIMESTAMP '2024-01-08' AND ts < TIMESTAMP '2024-01-15'
        |ORDER BY event_id""".stripMargin,
    "q133_compaction" ->
      """SELECT event_id, user_id, event_type, strftime(ts, '%Y-%m-%d') AS day
        |FROM events ORDER BY event_id""".stripMargin,
    "q134_embed_centroids" ->
      // identical fixed-point scaling: float→double cast and ·10⁶ are
      // IEEE-exact, round is half-away-from-zero in both engines
      """WITH e AS (SELECT label, unnest(embedding) AS v,
        |    unnest(range(0, len(embedding))) AS pos FROM embeddings)
        |SELECT CAST(label AS BIGINT) AS label, pos,
        |  CAST(sum(CAST(round(CAST(v AS DOUBLE) * 1000000) AS BIGINT)) AS BIGINT) AS sum_scaled,
        |  CAST(count(*) AS BIGINT) AS n
        |FROM e GROUP BY 1, 2 ORDER BY label, pos""".stripMargin,
    "q137_budget_select" ->
      // q51's quality formula + a plain windowed cumsum — the oracle can
      // afford the global window the engine's two-phase rewrite avoids
      """WITH f AS (SELECT doc_id,
        |CAST(length(text) AS DOUBLE) AS len,
        |CAST(len(regexp_extract_all(text, '\S+')) AS DOUBLE) AS toks,
        |CAST(len(regexp_extract_all(text, '[A-Za-z]')) AS DOUBLE) AS alpha,
        |CAST(len(regexp_extract_all(lower(text), '\b(the|and|of|is|a)\b')) AS DOUBLE) AS stop
        |FROM documents),
        |q AS (SELECT doc_id, (round(
        |(CASE WHEN len >= 100 AND len <= 10000 THEN CAST(1.0 AS DOUBLE) WHEN len >= 20 THEN CAST(0.5 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END) * CAST(0.4 AS DOUBLE)
        |+ (CASE WHEN len > 0 THEN alpha / len ELSE CAST(0.0 AS DOUBLE) END) * CAST(0.3 AS DOUBLE)
        |+ (CASE WHEN toks > 0 THEN least(stop / toks * CAST(5.0 AS DOUBLE), CAST(1.0 AS DOUBLE)) ELSE CAST(0.0 AS DOUBLE) END) * CAST(0.3 AS DOUBLE),
        |4) + 0.0) AS quality, CAST(toks AS BIGINT) AS toks FROM f),
        |c AS (SELECT doc_id, quality, toks,
        |  sum(toks) OVER (ORDER BY quality DESC, doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tokens FROM q)
        |SELECT doc_id, quality, toks, CAST(cum_tokens AS BIGINT) AS cum_tokens
        |FROM c WHERE cum_tokens <= 100000 ORDER BY doc_id""".stripMargin,
    "q138_cluster_split" ->
      // q77's component CTE; unpaired docs are singleton clusters; the
      // same reduce-first hash as q109, applied to the component id
      s"""WITH pairs AS MATERIALIZED ($q44Sql),
         |e AS MATERIALIZED (SELECT id_a AS src, id_b AS dst FROM pairs
         |      UNION SELECT id_b, id_a FROM pairs),
         |${minLabelCc()},
|lab AS (SELECT node AS a, lab AS component FROM l$ccRounds),
         |dc AS (SELECT d.doc_id, coalesce(l.component, d.doc_id) AS component, d.n_chars
         |       FROM documents d LEFT JOIN lab l ON d.doc_id = l.a),
         |s AS (SELECT *, (((component % 1000000007) * 2654435761) % 1000000007) % 100 AS cell FROM dc)
         |SELECT CASE WHEN cell < 80 THEN 'train' WHEN cell < 90 THEN 'val' ELSE 'test' END AS split,
         |  count(*) AS n_docs,
         |  CAST(count(DISTINCT component) AS BIGINT) AS n_clusters,
         |  CAST(sum(n_chars) AS BIGINT) AS total_chars
         |FROM s GROUP BY 1 ORDER BY split""".stripMargin,
    "q135_scd2_lookup" ->
      // the q94 history CTE over non-purchase events, consumed by a
      // validity-window join; versions are non-overlapping so each purchase
      // matches at most one — LEFT keeps pre-history purchases with NULL
      """WITH ev AS (SELECT user_id, event_type AS state, ts, event_id
        |  FROM events WHERE event_type <> 'purchase'),
        |ch AS (SELECT *, lag(state) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev FROM ev),
        |f AS (SELECT user_id, state, ts AS valid_from, event_id FROM ch
        |  WHERE prev IS NULL OR prev <> state),
        |d AS (SELECT user_id, state, valid_from,
        |  lead(valid_from) OVER (PARTITION BY user_id ORDER BY valid_from, event_id) AS valid_to FROM f),
        |p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase')
        |SELECT p.event_id, p.user_id, p.ts, d.state AS state_at_purchase
        |FROM p LEFT JOIN d ON p.user_id = d.user_id
        |  AND d.valid_from <= p.ts AND (d.valid_to IS NULL OR p.ts < d.valid_to)
        |ORDER BY p.event_id""".stripMargin,
    "q136_inverted_index" ->
      // list_reduce seeds with the first element — identical to the
      // engine's 0-seeded fold because (0·31 + x) mod M = x for doc ids < M
      """WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
        |p AS (SELECT term, list_sort(list(DISTINCT doc_id)) AS postings,
        |  CAST(count(DISTINCT doc_id) AS BIGINT) AS df
        |  FROM t WHERE term <> '' GROUP BY term)
        |SELECT term, df, postings[1] AS first_doc, postings[-1] AS last_doc,
        |  list_reduce(postings, (a, x) -> (a * 31 + x) % 1000000007) AS postings_fp
        |FROM p ORDER BY term""".stripMargin,
    "q44_minhash_neardup" -> q44Sql,
    // components over the SAME pair pipeline as q44, closed transitively by a
    // recursive CTE, labeled by the component minimum
    "q267_stream_psi" ->
      // q158's smoothed-term/bin-fold machinery; reference = batch 0 of
      // the arithmetic id-span batching, one PSI row per later batch
      """WITH m AS (SELECT max(event_id) AS mx FROM events),
        |e AS (SELECT event_id // ((mx + 4) // 4) AS b,
        |    least(CAST(round(value * 100, 0) AS BIGINT) // 5000, 9) AS bin
        |  FROM events, m),
        |c AS (SELECT b, bin, count(*) AS n FROM e GROUP BY 1, 2),
        |r AS (SELECT bin, n FROM c WHERE b = 0),
        |na AS (SELECT sum(n) AS na FROM r),
        |tb AS (SELECT b, sum(n) AS nb FROM c WHERE b > 0 GROUP BY 1),
        |spine AS (SELECT b, unnest(range(10)) AS bin
        |  FROM (SELECT DISTINCT b FROM c WHERE b > 0)),
        |terms AS (SELECT s.b, s.bin, na.na, tb.nb,
        |  (CAST(coalesce(r.n, 0) + 1 AS DOUBLE) / (na.na + 10) -
        |   CAST(coalesce(cb.n, 0) + 1 AS DOUBLE) / (tb.nb + 10)) *
        |  ln((CAST(coalesce(r.n, 0) + 1 AS DOUBLE) / (na.na + 10)) /
        |     (CAST(coalesce(cb.n, 0) + 1 AS DOUBLE) / (tb.nb + 10))) AS term
        |  FROM spine s LEFT JOIN r ON r.bin = s.bin
        |  LEFT JOIN c cb ON cb.b = s.b AND cb.bin = s.bin
        |  CROSS JOIN na JOIN tb ON tb.b = s.b)
        |SELECT b AS batch_id, CAST(any_value(na) AS BIGINT) AS n_a,
        |  CAST(any_value(nb) AS BIGINT) AS n_b,
        |  (round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list(term ORDER BY bin)),
        |    (a, b) -> a + b), 4) + 0.0) AS psi
        |FROM terms GROUP BY b ORDER BY batch_id""".stripMargin,
    "q271_source_dup_matrix" ->
      // the q44 pair list joined to sources, grouped by the unordered pair
      s"""WITH pairs AS ($q44Sql),
         |j AS (SELECT least(a.source, b.source) AS source_lo,
         |    greatest(a.source, b.source) AS source_hi
         |  FROM pairs p
         |  JOIN documents a ON a.doc_id = p.id_a
         |  JOIN documents b ON b.doc_id = p.id_b)
         |SELECT source_lo, source_hi, CAST(count(*) AS BIGINT) AS n_pairs
         |FROM j GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q272_pq_rerank" ->
      // q224's ADC chain with a 20-deep shortlist, then q45's exact-cosine
      // scoring applied to shortlist rows only, re-ranked
      """WITH vecs AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vv FROM embeddings),
        |subs AS (SELECT vec_id, CAST(s.i AS BIGINT) AS sub,
        |    vv[CAST(s.i * 16 + 1 AS INT) : CAST(s.i * 16 + 16 AS INT)] AS xs
        |  FROM vecs, LATERAL (SELECT unnest(range(0, 4)) AS i) s),
        |cb AS (SELECT vec_id AS code, sub, xs AS cs FROM subs WHERE vec_id < 8),
        |sc AS (SELECT x.vec_id, x.sub, c.code,
        |  row_number() OVER (PARTITION BY x.vec_id, x.sub ORDER BY
        |    list_dot_product(x.xs, x.xs) - 2 * list_dot_product(x.xs, c.cs)
        |      + list_dot_product(c.cs, c.cs), c.code) AS rn
        |  FROM subs x JOIN cb c USING (sub)),
        |codes AS (SELECT vec_id, sub, code FROM sc WHERE rn = 1),
        |q AS (SELECT vec_id AS query_id, sub, xs AS qs FROM subs WHERE vec_id < 8),
        |lut AS (SELECT q.query_id, c.sub, c.code,
        |    CAST(round(greatest(list_dot_product(q.qs, q.qs)
        |      - 2 * list_dot_product(q.qs, c.cs)
        |      + list_dot_product(c.cs, c.cs), 0) * 100000) AS BIGINT) AS d
        |  FROM q JOIN cb c USING (sub)),
        |sc2 AS (SELECT l.query_id, k.vec_id AS neighbor_id,
        |    CAST(sum(l.d) AS BIGINT) AS adist_tb
        |  FROM codes k JOIN lut l ON l.sub = k.sub AND l.code = k.code
        |  WHERE k.vec_id <> l.query_id GROUP BY 1, 2),
        |sl AS (SELECT query_id, neighbor_id FROM (SELECT query_id, neighbor_id,
        |    row_number() OVER (PARTITION BY query_id
        |      ORDER BY adist_tb, neighbor_id) AS rn FROM sc2) WHERE rn <= 20),
        |rr AS (SELECT s.query_id, s.neighbor_id,
        |    list_dot_product(qv.vv, nv.vv) /
        |      (sqrt(list_dot_product(qv.vv, qv.vv)) * sqrt(list_dot_product(nv.vv, nv.vv))) AS cosine
        |  FROM sl s JOIN vecs qv ON qv.vec_id = s.query_id
        |  JOIN vecs nv ON nv.vec_id = s.neighbor_id),
        |f AS (SELECT query_id, neighbor_id, cosine,
        |  CAST(row_number() OVER (PARTITION BY query_id
        |    ORDER BY cosine DESC, neighbor_id) AS BIGINT) AS rn FROM rr)
        |SELECT query_id, neighbor_id, (round(cosine, 4) + 0.0) AS cosine, rn
        |FROM f WHERE rn <= 5 ORDER BY query_id, rn""".stripMargin,
    "q273_semdedup" ->
      // the Lloyd chain + q257's trained-assignment pass, then the
      // within-cell lower-id cosine prune
      s"""WITH $lloydCtes,
         |dd3 AS (SELECT c.vec_id, ct.cell, sum((c.vm - ct.cm) * (c.vm - ct.cm)) AS d2
         |  FROM comp c JOIN c2 ct USING (dim) GROUP BY 1, 2),
         |b3 AS (SELECT vec_id, min(d2) AS md FROM dd3 GROUP BY 1),
         |a3 AS (SELECT d.vec_id, min(d.cell) AS cell FROM dd3 d
         |  JOIN b3 b ON b.vec_id = d.vec_id AND d.d2 = b.md GROUP BY 1),
         |vecs AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vv FROM embeddings),
         |wv AS (SELECT a.vec_id, a.cell, v.vv FROM a3 a JOIN vecs v ON v.vec_id = a.vec_id),
         |dr AS (SELECT DISTINCT h.vec_id
         |  FROM wv h JOIN wv l ON l.cell = h.cell AND l.vec_id < h.vec_id
         |  WHERE list_dot_product(h.vv, l.vv) /
         |    (sqrt(list_dot_product(h.vv, h.vv)) * sqrt(list_dot_product(l.vv, l.vv))) > 0.4)
         |SELECT a.vec_id, a.cell,
         |  CAST(CASE WHEN d.vec_id IS NULL THEN 1 ELSE 0 END AS BIGINT) AS kept
         |FROM a3 a LEFT JOIN dr d ON d.vec_id = a.vec_id ORDER BY a.vec_id""".stripMargin,
    "q274_knn_label" ->
      // q45's exact top-5 chain, neighbors' labels gathered, majority with
      // ties to the smallest label
      """WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id < 8),
        |c AS (SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS cv FROM embeddings),
        |s AS (SELECT query_id, neighbor_id,
        |  list_dot_product(qv, cv) / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv))) AS cosine
        |  FROM c CROSS JOIN q WHERE neighbor_id <> query_id),
        |r AS (SELECT query_id, neighbor_id,
        |  row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rn FROM s),
        |nn AS (SELECT query_id, neighbor_id FROM r WHERE rn <= 5),
        |v AS (SELECT nn.query_id, e.label, count(*) AS votes
        |  FROM nn JOIN embeddings e ON e.vec_id = nn.neighbor_id GROUP BY 1, 2),
        |p AS (SELECT query_id, label, votes,
        |  row_number() OVER (PARTITION BY query_id ORDER BY votes DESC, label) AS rn2 FROM v)
        |SELECT query_id, CAST(label AS BIGINT) AS pred_label, CAST(votes AS BIGINT) AS votes
        |FROM p WHERE rn2 = 1 ORDER BY query_id""".stripMargin,
    "q275_dsir" ->
      // token -> KR bucket, target/raw bucket margins, smoothed log-ratio
      // quantized to micro-nat longs, per-doc exact long sum
      s"""WITH tok AS (SELECT doc_id, source, w
         |  FROM (SELECT doc_id, source,
         |      unnest(regexp_split_to_array(lower(text), '\\s+')) AS w
         |    FROM documents) WHERE length(w) > 0),
         |bk AS (SELECT doc_id, source, ${krSql("w")} % 64 AS b FROM tok),
         |tgt AS (SELECT b, count(*) AS tc FROM bk WHERE source = 'src0' GROUP BY 1),
         |raw AS (SELECT b, count(*) AS rc FROM bk GROUP BY 1),
         |tot AS (SELECT sum(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS nt,
         |    count(*) AS nr FROM bk),
         |lam AS (SELECT r.b,
         |    CAST(round((ln(CAST(coalesce(t.tc, 0) + 1 AS DOUBLE) / (tot.nt + 64))
         |      - ln(CAST(r.rc + 1 AS DOUBLE) / (tot.nr + 64))) * 1000000, 0) AS BIGINT) AS lam_unats
         |  FROM raw r LEFT JOIN tgt t ON t.b = r.b CROSS JOIN tot)
         |SELECT bk.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
         |  CAST(sum(lam.lam_unats) AS BIGINT) AS w_unats
         |FROM bk JOIN lam ON lam.b = bk.b
         |GROUP BY 1 ORDER BY bk.doc_id""".stripMargin,
    "q276_editdist_confirm" ->
      // the q44 candidate pairs joined to texts; exact levenshtein and
      // floor-bp similarity of the longer side
      s"""WITH pairs AS ($q44Sql),
         |j AS (SELECT p.id_a, p.id_b, p.est_jaccard,
         |    levenshtein(a.text, b.text) AS lev,
         |    greatest(length(a.text), length(b.text), 1) AS ml
         |  FROM pairs p
         |  JOIN documents a ON a.doc_id = p.id_a
         |  JOIN documents b ON b.doc_id = p.id_b)
         |SELECT id_a, id_b, est_jaccard, CAST(lev AS BIGINT) AS lev,
         |  CAST(10000 - ((10000 * lev) // ml) AS BIGINT) AS sim_bp,
         |  CAST(CASE WHEN 10000 - ((10000 * lev) // ml) >= 5000 THEN 1 ELSE 0 END AS BIGINT) AS confirmed
         |FROM j ORDER BY id_a, id_b""".stripMargin,
    "q277_ndcg" ->
      // q45's exact top-5, label-match relevance, micro-unit DCG weights,
      // IDCG over the first n_rel positions
      """WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv, label AS ql FROM embeddings WHERE vec_id < 8),
        |c AS (SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS cv, label AS nl FROM embeddings),
        |s AS (SELECT query_id, neighbor_id, ql, nl,
        |  list_dot_product(qv, cv) / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv))) AS cosine
        |  FROM c CROSS JOIN q WHERE neighbor_id <> query_id),
        |r AS (SELECT query_id, ql, nl,
        |  row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rn FROM s),
        |g AS (SELECT query_id, rn,
        |    CASE WHEN nl = ql THEN 1 ELSE 0 END AS rel,
        |    CAST(round(1000000 / (ln(rn + 1.0) / ln(2.0)), 0) AS BIGINT) AS w
        |  FROM r WHERE rn <= 5),
        |pq AS (SELECT query_id, sum(rel) AS n_rel, sum(rel * w) AS dcg_u FROM g GROUP BY 1),
        |ic AS (SELECT g.query_id, sum(g.w) AS idcg_u
        |  FROM g JOIN pq ON pq.query_id = g.query_id WHERE g.rn <= pq.n_rel GROUP BY 1)
        |SELECT pq.query_id, CAST(pq.n_rel AS BIGINT) AS n_rel,
        |  CAST(pq.dcg_u AS BIGINT) AS dcg_u,
        |  CAST(coalesce(ic.idcg_u, 0) AS BIGINT) AS idcg_u,
        |  (CASE WHEN coalesce(ic.idcg_u, 0) = 0 THEN 0.0
        |    ELSE (round(CAST(pq.dcg_u AS DOUBLE) / ic.idcg_u, 4) + 0.0) END) AS ndcg
        |FROM pq LEFT JOIN ic ON ic.query_id = pq.query_id ORDER BY pq.query_id""".stripMargin,
    "q278_lsh_precision" ->
      // q44 candidates bucketed by estimated-Jaccard decile; confirmed =
      // q276's floor-bp similarity >= 5000
      s"""WITH pairs AS ($q44Sql),
         |j AS (SELECT CAST(floor(p.est_jaccard * 10) AS BIGINT) AS jacc_decile,
         |    CASE WHEN 10000 - ((10000 * levenshtein(a.text, b.text))
         |      // greatest(length(a.text), length(b.text), 1)) >= 5000
         |      THEN 1 ELSE 0 END AS c
         |  FROM pairs p
         |  JOIN documents a ON a.doc_id = p.id_a
         |  JOIN documents b ON b.doc_id = p.id_b)
         |SELECT jacc_decile, CAST(count(*) AS BIGINT) AS n_pairs,
         |  CAST(sum(c) AS BIGINT) AS n_confirmed,
         |  CAST((10000 * sum(c)) // count(*) AS BIGINT) AS precision_bp
         |FROM j GROUP BY 1 ORDER BY 1""".stripMargin,
    "q279_langid_confusion" ->
      s"""SELECT lang, $langCase AS lang_pred, CAST(count(*) AS BIGINT) AS n_docs
         |FROM documents GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q281_gopher_repetition" ->
      // q204's bigram CTEs, then per-doc total vs max bigram count
      """WITH raw AS (SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '\s+'),
        |    t -> length(t) > 0) AS arr FROM documents),
        |bg AS (SELECT doc_id, unnest(list_transform(range(1, len(arr)),
        |    i -> {'a': arr[i], 'b': arr[i + 1]})) AS g FROM raw),
        |dbc AS (SELECT doc_id, g.a AS a, g.b AS b, count(*) AS c FROM bg GROUP BY 1, 2, 3),
        |agg AS (SELECT doc_id, sum(c) AS nb, max(c) AS tn FROM dbc GROUP BY 1)
        |SELECT doc_id, CAST(nb AS BIGINT) AS n_bigrams, CAST(tn AS BIGINT) AS top_n,
        |  CAST((10000 * tn) // nb AS BIGINT) AS top_share_bp,
        |  CAST(CASE WHEN (10000 * tn) // nb > 2000 THEN 1 ELSE 0 END AS BIGINT) AS flagged
        |FROM agg ORDER BY doc_id""".stripMargin,
    "q282_residual_pq" ->
      // q246's cell CTEs carrying (vv, cv) through, residuals as one
      // element-wise double subtraction, then the same LUT/ADC chain in
      // residual space with the table keyed per (query, probed cell)
      """WITH vecs AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vv FROM embeddings),
        |cent AS (SELECT vec_id AS cell, vv AS cv FROM vecs WHERE vec_id < 16),
        |cells AS (SELECT x.vec_id, x.vv, c.cell, c.cv,
        |  row_number() OVER (PARTITION BY x.vec_id ORDER BY
        |    list_dot_product(x.vv, c.cv) / (sqrt(list_dot_product(x.vv, x.vv)) * sqrt(list_dot_product(c.cv, c.cv))) DESC,
        |    c.cell) AS crn
        |  FROM vecs x CROSS JOIN cent c),
        |res AS (SELECT vec_id, cell,
        |    list_transform(range(1, 65), i -> vv[i] - cv[i]) AS rv
        |  FROM cells WHERE crn = 1),
        |qres AS (SELECT vec_id AS query_id, cell,
        |    list_transform(range(1, 65), i -> vv[i] - cv[i]) AS rv
        |  FROM cells WHERE vec_id < 8 AND crn <= 2),
        |rsubs AS (SELECT vec_id, CAST(s.i AS BIGINT) AS sub,
        |    rv[CAST(s.i * 16 + 1 AS INT) : CAST(s.i * 16 + 16 AS INT)] AS xs
        |  FROM res, LATERAL (SELECT unnest(range(0, 4)) AS i) s),
        |cb AS (SELECT vec_id AS code, sub, xs AS cs FROM rsubs WHERE vec_id < 8),
        |sc AS (SELECT x.vec_id, x.sub, c.code,
        |  row_number() OVER (PARTITION BY x.vec_id, x.sub ORDER BY
        |    list_dot_product(x.xs, x.xs) - 2 * list_dot_product(x.xs, c.cs)
        |      + list_dot_product(c.cs, c.cs), c.code) AS rn
        |  FROM rsubs x JOIN cb c USING (sub)),
        |codes AS (SELECT vec_id, sub, code FROM sc WHERE rn = 1),
        |qsubs AS (SELECT query_id, cell, CAST(s.i AS BIGINT) AS sub,
        |    rv[CAST(s.i * 16 + 1 AS INT) : CAST(s.i * 16 + 16 AS INT)] AS qs
        |  FROM qres, LATERAL (SELECT unnest(range(0, 4)) AS i) s),
        |lut AS (SELECT q.query_id, q.cell, c.sub, c.code,
        |    CAST(round(greatest(list_dot_product(q.qs, q.qs)
        |      - 2 * list_dot_product(q.qs, c.cs)
        |      + list_dot_product(c.cs, c.cs), 0) * 100000) AS BIGINT) AS d
        |  FROM qsubs q JOIN cb c USING (sub)),
        |cand AS (SELECT q.query_id, r.vec_id AS neighbor_id, q.cell
        |  FROM qres q JOIN res r ON r.cell = q.cell
        |  WHERE r.vec_id <> q.query_id),
        |sc2 AS (SELECT l.query_id, k.vec_id AS neighbor_id,
        |    CAST(sum(l.d) AS BIGINT) AS adist_tb
        |  FROM codes k
        |  JOIN cand cd ON cd.neighbor_id = k.vec_id
        |  JOIN lut l ON l.query_id = cd.query_id AND l.cell = cd.cell
        |    AND l.sub = k.sub AND l.code = k.code
        |  GROUP BY 1, 2),
        |r2 AS (SELECT query_id, neighbor_id, adist_tb,
        |    CAST(row_number() OVER (PARTITION BY query_id
        |      ORDER BY adist_tb, neighbor_id) AS BIGINT) AS rn FROM sc2)
        |SELECT query_id, neighbor_id, adist_tb, rn FROM r2 WHERE rn <= 5
        |ORDER BY query_id, rn""".stripMargin,
    // q58's assignment CTE (crn = 1), then the occupancy table
    "q283_ivf_balance" -> q283Sql,
    // the SAME table: streaming-accumulated index ≡ batch assignment
    "q292_stream_vector_ingest" -> q283Sql,
    "q293_source_sketch" -> q293Sql,
    "q295_power_iteration" -> q295Sql,
    "q296_lpa_communities" -> q296Sql,
    "q298_average_precision" ->
      // q45's exact top-5, label-match relevance, micro-unit precision@r
      // via non-negative integer division, min(R,5) normalization
      """WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv, label AS ql FROM embeddings WHERE vec_id < 8),
        |c AS (SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS cv, label AS nl FROM embeddings),
        |s AS (SELECT query_id, neighbor_id, ql, nl,
        |  list_dot_product(qv, cv) / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv))) AS cosine
        |  FROM c CROSS JOIN q WHERE neighbor_id <> query_id),
        |r AS (SELECT query_id, ql, nl,
        |  row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rn FROM s),
        |g AS (SELECT query_id, rn, CASE WHEN nl = ql THEN 1 ELSE 0 END AS rel FROM r WHERE rn <= 5),
        |p AS (SELECT query_id, rn, rel,
        |    (sum(rel) OVER (PARTITION BY query_id ORDER BY rn) * 1000000) // rn AS pu FROM g),
        |pq AS (SELECT query_id, sum(rel) AS n_rel, sum(rel * pu) AS sum_pu FROM p GROUP BY 1),
        |mt AS (SELECT label, count(*) AS cl FROM embeddings GROUP BY 1),
        |d AS (SELECT e.vec_id AS query_id, least(mt.cl - 1, 5) AS denom
        |  FROM embeddings e JOIN mt ON mt.label = e.label WHERE e.vec_id < 8)
        |SELECT pq.query_id, CAST(pq.n_rel AS BIGINT) AS n_rel,
        |  CAST(pq.sum_pu AS BIGINT) AS sum_pu, CAST(d.denom AS BIGINT) AS denom,
        |  (CASE WHEN d.denom = 0 THEN 0.0
        |    ELSE (round(CAST(pq.sum_pu AS DOUBLE) / (CAST(d.denom AS DOUBLE) * 1000000), 4) + 0.0) END) AS ap
        |FROM pq JOIN d ON d.query_id = pq.query_id ORDER BY pq.query_id""".stripMargin,
    "q299_abtt_outliers" -> q299Sql,
    "q300_matryoshka_curve" -> q300Sql,
    "q302_filtered_ann" ->
      // q58's IVF structure at nprobe=2: corpus assignment = rank-1 cell,
      // query probes = rank ≤ 2; the pre-filter is a WHERE on the
      // assignment side, the post-filter counts survivors of the
      // unfiltered top-5
      """WITH vecs AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS vv FROM embeddings),
        |cent AS (SELECT vec_id AS cell, vv AS cv FROM vecs WHERE vec_id < 16),
        |scored AS (SELECT x.vec_id, x.label, x.vv, c.cell,
        |  row_number() OVER (PARTITION BY x.vec_id ORDER BY
        |    list_dot_product(x.vv, c.cv) / (sqrt(list_dot_product(x.vv, x.vv)) * sqrt(list_dot_product(c.cv, c.cv))) DESC,
        |    c.cell) AS crn
        |  FROM vecs x CROSS JOIN cent c),
        |asg AS (SELECT vec_id, label, vv, cell FROM scored WHERE crn = 1),
        |q AS (SELECT vec_id AS query_id, vv AS qv, cell FROM scored WHERE vec_id < 8 AND crn <= 2),
        |sf AS (SELECT q.query_id, a.vec_id AS neighbor_id,
        |  list_dot_product(q.qv, a.vv) / (sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(a.vv, a.vv))) AS cosine
        |  FROM q JOIN asg a ON a.cell = q.cell AND a.vec_id <> q.query_id WHERE a.label = 2),
        |rf AS (SELECT query_id, neighbor_id, cosine,
        |  CAST(row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS BIGINT) AS rn FROM sf),
        |su AS (SELECT q.query_id, a.vec_id AS neighbor_id, a.label,
        |  list_dot_product(q.qv, a.vv) / (sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(a.vv, a.vv))) AS cosine
        |  FROM q JOIN asg a ON a.cell = q.cell AND a.vec_id <> q.query_id),
        |ru AS (SELECT query_id, label,
        |  row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rn FROM su),
        |post AS (SELECT query_id, count(*) AS post_kept FROM ru WHERE rn <= 5 AND label = 2 GROUP BY 1)
        |SELECT rf.query_id, rf.rn, rf.neighbor_id, (round(rf.cosine, 4) + 0.0) AS cosine,
        |  CAST(coalesce(post.post_kept, 0) AS BIGINT) AS post_kept
        |FROM rf LEFT JOIN post ON post.query_id = rf.query_id
        |WHERE rf.rn <= 5 ORDER BY rf.query_id, rf.rn""".stripMargin,
    "q304_colbert_maxsim" -> q304Sql,
    "q306_vacuum_retention" ->
      // the post-vacuum retained snapshot must read as the full table —
      // commit → append → rewrite → reclaim is row-invisible
      """SELECT strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS day,
        |  CAST(count(*) AS BIGINT) AS cnt
        |FROM events GROUP BY 1 ORDER BY day""".stripMargin,
    "q307_filtered_recall" -> q307Sql,
    "q308_k_anonymity" ->
      // the k-sweep is pure arithmetic over the QI-group counts; basis
      // points via non-negative integer division (trunc ≡ floor)
      """WITH g AS (SELECT c_nationkey, c_mktsegment, count(*) AS cnt
        |  FROM customer GROUP BY 1, 2),
        |ks AS (SELECT CAST(unnest([2, 5, 10]) AS BIGINT) AS k)
        |SELECT ks.k,
        |  CAST(count(*) AS BIGINT) AS groups_total,
        |  CAST(sum(CASE WHEN g.cnt < ks.k THEN 1 ELSE 0 END) AS BIGINT) AS groups_below,
        |  CAST(sum(CASE WHEN g.cnt < ks.k THEN g.cnt ELSE 0 END) AS BIGINT) AS rows_suppressed,
        |  CAST(sum(CASE WHEN g.cnt < ks.k THEN g.cnt ELSE 0 END) * 10000
        |    // sum(g.cnt) AS BIGINT) AS suppression_bp
        |FROM g CROSS JOIN ks GROUP BY ks.k ORDER BY ks.k""".stripMargin,
    "q309_bloom_dedup" ->
      // the bloom is a performance lever only: prefilter + exact confirm
      // ≡ the plain inner join on the dedup key (no false negatives)
      """WITH k AS (SELECT doc_id, source, substr(text, 1, 32) AS p,
        |    CAST(substr(source, 4) AS INT) AS src_n FROM documents),
        |old AS (SELECT p, count(*) AS n_old_matches FROM k WHERE src_n < 10 GROUP BY 1)
        |SELECT k.doc_id, k.source, CAST(old.n_old_matches AS BIGINT) AS n_old_matches
        |FROM k JOIN old USING (p) WHERE k.src_n >= 10 ORDER BY k.doc_id""".stripMargin,
    "q312_diverse_topk" ->
      // q45's scoring with k = 10, then the same two rank windows the
      // engine runs — at-most-2-per-label in rank order, best 5 survivors
      """WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id < 8),
        |c AS (SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS cv, label FROM embeddings),
        |s AS (SELECT query_id, neighbor_id, label,
        |  list_dot_product(qv, cv) / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv))) AS cosine
        |  FROM c CROSS JOIN q WHERE neighbor_id <> query_id),
        |r AS (SELECT query_id, neighbor_id, label, cosine,
        |  CAST(row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS BIGINT) AS rn FROM s),
        |t AS (SELECT * FROM r WHERE rn <= 10),
        |lr AS (SELECT *, row_number() OVER (PARTITION BY query_id, label ORDER BY rn) AS label_rank FROM t),
        |kept AS (SELECT * FROM lr WHERE label_rank <= 2),
        |sel AS (SELECT query_id, neighbor_id, label, cosine,
        |  CAST(row_number() OVER (PARTITION BY query_id ORDER BY rn) AS BIGINT) AS sel_rn FROM kept)
        |SELECT query_id, sel_rn, neighbor_id, label, (round(cosine, 4) + 0.0) AS cosine
        |FROM sel WHERE sel_rn <= 5 ORDER BY query_id, sel_rn""".stripMargin,
    "q313_image_neardup" ->
      // every gradient + per-variant-row bit predicted arithmetically
      // (pixel = (13g + x(y+3) + [y = v%7]·7x) mod 256, bit = right
      // neighbor brighter); same 7-row banding, same hamming verify
      """WITH d AS (SELECT doc_id, doc_id % 50 AS g, (doc_id // 50) % 7 AS vr
        |  FROM documents WHERE doc_id < 300),
        |bits AS (SELECT d.doc_id,
        |    CASE WHEN (d.g * 13 + (x.x + 1) * (y.y + 3) + CASE WHEN y.y = d.vr THEN 7 * (x.x + 1) ELSE 0 END) % 256
        |            > (d.g * 13 + x.x * (y.y + 3) + CASE WHEN y.y = d.vr THEN 7 * x.x ELSE 0 END) % 256
        |      THEN CAST(1 AS BIGINT) << CAST(y.y * 8 + x.x AS INT) ELSE 0 END AS b
        |  FROM d, (SELECT unnest(range(0, 8)) AS x) x, (SELECT unnest(range(0, 7)) AS y) y),
        |h AS (SELECT doc_id, CAST(sum(b) AS BIGINT) AS dhash FROM bits GROUP BY 1),
        |bd AS (SELECT doc_id, dhash, bb.b AS band_idx,
        |    (dhash >> CAST(bb.b * 8 AS INT)) & 255 AS band_byte
        |  FROM h, (SELECT unnest(range(0, 7)) AS b) bb),
        |cand AS (SELECT DISTINCT a.doc_id AS id_a, z.doc_id AS id_b, a.dhash AS h_a, z.dhash AS h_b
        |  FROM bd a JOIN bd z ON a.band_idx = z.band_idx AND a.band_byte = z.band_byte
        |    AND a.doc_id < z.doc_id)
        |SELECT id_a, id_b, CAST(bit_count(xor(h_a, h_b)) AS BIGINT) AS hamming
        |FROM cand WHERE bit_count(xor(h_a, h_b)) <= 16 ORDER BY id_a, id_b""".stripMargin,
    "q314_rouge_overlap" ->
      // same tokenization, same clipped Σ min(tf, tf), same integer bp
      """WITH tokc AS (SELECT doc_id AS pair_id,
        |    unnest(list_filter(regexp_split_to_array(lower(text), '\s+'), t -> length(t) > 0)) AS w
        |  FROM documents WHERE doc_id % 2 = 0),
        |tokr AS (SELECT doc_id - 1 AS pair_id,
        |    unnest(list_filter(regexp_split_to_array(lower(text), '\s+'), t -> length(t) > 0)) AS w
        |  FROM documents WHERE doc_id % 2 = 1),
        |c1 AS (SELECT pair_id, w, count(*) AS c FROM tokc GROUP BY 1, 2),
        |c2 AS (SELECT pair_id, w, count(*) AS c FROM tokr GROUP BY 1, 2),
        |ov AS (SELECT c1.pair_id, sum(least(c1.c, c2.c)) AS overlap
        |  FROM c1 JOIN c2 ON c1.pair_id = c2.pair_id AND c1.w = c2.w GROUP BY 1),
        |ct AS (SELECT pair_id, sum(c) AS cand_tokens FROM c1 GROUP BY 1),
        |rt AS (SELECT pair_id, sum(c) AS ref_tokens FROM c2 GROUP BY 1)
        |SELECT ct.pair_id, CAST(ct.cand_tokens AS BIGINT) AS cand_tokens,
        |  CAST(rt.ref_tokens AS BIGINT) AS ref_tokens,
        |  CAST(coalesce(ov.overlap, 0) AS BIGINT) AS overlap,
        |  CAST(coalesce(ov.overlap, 0) * 10000 // rt.ref_tokens AS BIGINT) AS rouge1_recall_bp,
        |  CAST(coalesce(ov.overlap, 0) * 10000 // ct.cand_tokens AS BIGINT) AS rouge1_precision_bp
        |FROM ct JOIN rt USING (pair_id) LEFT JOIN ov USING (pair_id)
        |ORDER BY ct.pair_id""".stripMargin,
    "q315_span_corruption" ->
      // DuckDB list lambdas are 1-based — (i − 1) mirrors Spark's 0-based
      // transform index exactly
      """WITH t AS (SELECT doc_id,
        |    list_filter(regexp_split_to_array(lower(text), '\s+'), t -> length(t) > 0) AS tok
        |  FROM documents)
        |SELECT doc_id,
        |  array_to_string(list_transform(tok, (t, i) -> CASE WHEN (i - 1) % 5 = 0
        |    THEN '<X_' || CAST((i - 1) // 5 AS VARCHAR) || '>' ELSE t END), ' ') AS corrupted,
        |  array_to_string(list_transform(list_filter(tok, (t, i) -> (i - 1) % 5 = 0),
        |    (t, j) -> '<X_' || CAST(j - 1 AS VARCHAR) || '> ' || t), ' ') AS targets,
        |  CAST(len(list_filter(tok, (t, i) -> (i - 1) % 5 = 0)) AS BIGINT) AS n_masked
        |FROM t ORDER BY doc_id""".stripMargin,
    "q316_binary_embedding" ->
      // same two 32-bit sign words, same integer hamming ranking, and the
      // float truth is q45's scoring verbatim
      """WITH b AS (SELECT vec_id, i.i AS i,
        |    CASE WHEN embedding[i.i + 1] > 0
        |      THEN CAST(1 AS BIGINT) << CAST(i.i % 32 AS INT) ELSE 0 END AS v
        |  FROM embeddings, (SELECT unnest(range(0, 64)) AS i) i),
        |w AS (SELECT vec_id,
        |    CAST(sum(CASE WHEN i < 32 THEN v ELSE 0 END) AS BIGINT) AS lo,
        |    CAST(sum(CASE WHEN i >= 32 THEN v ELSE 0 END) AS BIGINT) AS hi
        |  FROM b GROUP BY 1),
        |q AS (SELECT vec_id AS query_id, lo AS q_lo, hi AS q_hi FROM w WHERE vec_id < 8),
        |s AS (SELECT q.query_id, w.vec_id AS neighbor_id,
        |    bit_count(xor(w.lo, q.q_lo)) + bit_count(xor(w.hi, q.q_hi)) AS hamming
        |  FROM w CROSS JOIN q WHERE w.vec_id <> q.query_id),
        |r AS (SELECT query_id, neighbor_id, hamming,
        |  CAST(row_number() OVER (PARTITION BY query_id ORDER BY hamming, neighbor_id) AS BIGINT) AS rn FROM s),
        |fq AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id < 8),
        |fc AS (SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS cv FROM embeddings),
        |fs AS (SELECT query_id, neighbor_id,
        |  list_dot_product(qv, cv) / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv))) AS cosine
        |  FROM fc CROSS JOIN fq WHERE neighbor_id <> query_id),
        |fr AS (SELECT query_id, neighbor_id,
        |  row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rn FROM fs),
        |truth AS (SELECT query_id, neighbor_id FROM fr WHERE rn <= 5)
        |SELECT r.query_id, r.rn, r.neighbor_id, CAST(r.hamming AS BIGINT) AS hamming,
        |  CAST(CASE WHEN truth.neighbor_id IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS hit
        |FROM r LEFT JOIN truth ON truth.query_id = r.query_id AND truth.neighbor_id = r.neighbor_id
        |WHERE r.rn <= 5 ORDER BY r.query_id, r.rn""".stripMargin,
    "q317_cdc_apply" -> q317Sql,
    "q339_stream_cdc_apply" ->
      // the oracle is q317's batch fold VERBATIM: equality of the
      // streamed merge chain's final snapshot with it IS the
      // incremental ≡ batch proof
      q317Sql,
    "q318_hits" ->
      // 2 unrolled HITS iterations in the same scaled-long arithmetic:
      // sum, then score·10⁶ div max, alternating sides
      """WITH e AS MATERIALIZED (SELECT DISTINCT o.o_custkey AS h, l.l_partkey AS a
        |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
        |h0 AS MATERIALIZED (SELECT DISTINCT h AS node, CAST(1000000 AS BIGINT) AS score FROM e),
        |a1r AS MATERIALIZED (SELECT e.a AS node, sum(h0.score) AS raw FROM e JOIN h0 ON h0.node = e.h GROUP BY 1),
        |a1 AS MATERIALIZED (SELECT node, CAST(raw * 1000000 // (SELECT max(raw) FROM a1r) AS BIGINT) AS score FROM a1r),
        |h1r AS MATERIALIZED (SELECT e.h AS node, sum(a1.score) AS raw FROM e JOIN a1 ON a1.node = e.a GROUP BY 1),
        |h1 AS MATERIALIZED (SELECT node, CAST(raw * 1000000 // (SELECT max(raw) FROM h1r) AS BIGINT) AS score FROM h1r),
        |a2r AS MATERIALIZED (SELECT e.a AS node, sum(h1.score) AS raw FROM e JOIN h1 ON h1.node = e.h GROUP BY 1),
        |a2 AS MATERIALIZED (SELECT node, CAST(raw * 1000000 // (SELECT max(raw) FROM a2r) AS BIGINT) AS score FROM a2r),
        |h2r AS MATERIALIZED (SELECT e.h AS node, sum(a2.score) AS raw FROM e JOIN a2 ON a2.node = e.a GROUP BY 1),
        |h2 AS MATERIALIZED (SELECT node, CAST(raw * 1000000 // (SELECT max(raw) FROM h2r) AS BIGINT) AS score FROM h2r)
        |SELECT 'auth' AS side, node, score FROM a2
        |UNION ALL SELECT 'hub', node, score FROM h2
        |ORDER BY side, node""".stripMargin,
    "q319_audio_downsample" ->
      // every block floor-mean predicted from the ramp formula
      // (sample i = (doc_id·31 + i·7) mod 401, blocks of 4, // floors
      // exactly like the engine's Math.floorDiv)
      """WITH d AS (SELECT doc_id, 80 + (doc_id % 3) * 4 AS n FROM documents),
        |m AS (SELECT d.doc_id, bb.b,
        |    CAST(sum((d.doc_id * 31 + (bb.b * 4 + ii.i) * 7) % 401) // 4 AS BIGINT) AS m
        |  FROM d, (SELECT unnest(range(0, 22)) AS b) bb, (SELECT unnest(range(0, 4)) AS i) ii
        |  WHERE bb.b < d.n // 4 GROUP BY 1, 2)
        |SELECT d.doc_id, CAST(d.n AS BIGINT) AS n_in, CAST(d.n // 4 AS BIGINT) AS n_out,
        |  CAST(sum(m.m) AS BIGINT) AS sum_out, CAST(min(m.m) AS BIGINT) AS min_out,
        |  CAST(max(m.m) AS BIGINT) AS max_out
        |FROM d JOIN m ON m.doc_id = d.doc_id GROUP BY 1, 2, 3 ORDER BY d.doc_id""".stripMargin,
    "q320_fixed_width" ->
      // the oracle aggregates the SOURCE table directly — matching the
      // Spark side's render→write→read→parse path proves the fixed-width
      // roundtrip lossless, sign and padding included
      """SELECT c_mktsegment AS segment, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(round(c_acctbal * 100, 0) AS BIGINT)) AS BIGINT) AS sum_cents,
        |  CAST(min(c_custkey) AS BIGINT) AS min_key,
        |  CAST(max(c_custkey) AS BIGINT) AS max_key
        |FROM customer GROUP BY 1 ORDER BY 1""".stripMargin,
    "q321_corrupt_quarantine" ->
      // the planting rule predicts the quarantine accounting exactly
      """SELECT CAST(count(*) AS BIGINT) AS n_total,
        |  CAST(sum(CASE WHEN doc_id % 10 = 7 THEN 0 ELSE 1 END) AS BIGINT) AS n_good,
        |  CAST(sum(CASE WHEN doc_id % 10 = 7 THEN 1 ELSE 0 END) AS BIGINT) AS n_quarantined,
        |  CAST(sum(CASE WHEN doc_id % 10 = 7 THEN 0 ELSE doc_id * 3 % 100 END) AS BIGINT) AS sum_v
        |FROM documents""".stripMargin,
    "q322_decimal_agg" ->
      // exact decimal sums compared on canonical string VALUE (result
      // precisions widen differently per engine)
      """SELECT c_mktsegment AS segment,
        |  CAST(sum(CAST(c_acctbal AS DECIMAL(18, 2))) AS VARCHAR) AS total_bal,
        |  CAST(count(*) AS BIGINT) AS n
        |FROM customer GROUP BY 1 ORDER BY 1""".stripMargin,
    "q323_nucleus_mass" ->
      // the per-lang window IS what prefixSumKeyed replaces; membership
      // by the same strict-before-mass integer inequality
      """WITH tok AS (SELECT lang,
        |    unnest(list_filter(regexp_split_to_array(lower(text), '\s+'), t -> length(t) > 0)) AS w
        |  FROM documents),
        |c AS (SELECT lang, w, count(*) AS cnt FROM tok GROUP BY 1, 2),
        |cum AS (SELECT lang, cnt,
        |    sum(cnt) OVER (PARTITION BY lang ORDER BY cnt DESC, w ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM c),
        |t AS (SELECT lang, sum(cnt) AS total_tokens, count(*) AS vocab FROM c GROUP BY 1)
        |SELECT cum.lang, CAST(t.total_tokens AS BIGINT) AS total_tokens,
        |  CAST(t.vocab AS BIGINT) AS vocab,
        |  CAST(sum(CASE WHEN (cum.cum - cum.cnt) * 10 < t.total_tokens * 9 THEN 1 ELSE 0 END) AS BIGINT) AS nucleus_size,
        |  CAST(sum(CASE WHEN (cum.cum - cum.cnt) * 10 < t.total_tokens * 9 THEN 1 ELSE 0 END) * 10000
        |    // t.vocab AS BIGINT) AS nucleus_bp
        |FROM cum JOIN t USING (lang) GROUP BY cum.lang, t.total_tokens, t.vocab
        |ORDER BY 1""".stripMargin,
    "q324_two_hop_reach" ->
      // same focal batch (node ≡ 0 mod 100), same relative cap
      // (deg·10 ≤ max·6), same distinct-destination count
      """WITH e AS (SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
        |  FROM lineitem a JOIN lineitem b
        |  ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey),
        |deg AS (SELECT src, count(*) AS deg FROM e GROUP BY 1),
        |mx AS (SELECT max(deg) AS m FROM deg),
        |low AS (SELECT deg.src AS mid FROM deg, mx WHERE deg.deg * 10 <= mx.m * 6),
        |h2 AS (SELECT DISTINCT e1.src AS v, e2.dst AS w
        |  FROM e e1 JOIN low ON low.mid = e1.dst JOIN e e2 ON e2.src = e1.dst
        |  WHERE e1.src % 100 = 0 AND e2.dst <> e1.src),
        |r AS (SELECT v, count(*) AS reach2 FROM h2 GROUP BY 1)
        |SELECT deg.src AS node, CAST(deg.deg AS BIGINT) AS n_1hop,
        |  CAST(coalesce(r.reach2, 0) AS BIGINT) AS reach2
        |FROM deg LEFT JOIN r ON r.v = deg.src
        |WHERE deg.src % 100 = 0 ORDER BY node""".stripMargin,
    "q325_burstiness" ->
      // same exact moment arithmetic; the numerator N·Σc² − T² is a
      // variance (≥ 0), so the integer division needs no floor caveat
      """WITH tokr AS (SELECT doc_id,
        |    unnest(list_filter(regexp_split_to_array(lower(text), '\s+'), t -> length(t) > 0)) AS w
        |  FROM documents),
        |c AS (SELECT doc_id, w, count(*) AS c FROM tokr GROUP BY 1, 2),
        |st AS (SELECT w AS token, count(*) AS df, sum(c) AS total, sum(c * c) AS sq FROM c GROUP BY 1),
        |n AS (SELECT count(*) AS n FROM documents)
        |SELECT token, CAST(df AS BIGINT) AS df, CAST(total AS BIGINT) AS total,
        |  CAST((n.n * st.sq - st.total * st.total) * 1000 // (n.n * st.total) AS BIGINT) AS disp_milli
        |FROM st, n ORDER BY df DESC, token LIMIT 20""".stripMargin,
    "q326_equidepth_hist" ->
      // DuckDB's ntile implements the same SQL-standard allocation as
      // ntileFromRank (first n mod k buckets take one extra row)
      """WITH o AS (SELECT o_orderkey,
        |    CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents FROM orders),
        |r AS (SELECT cents,
        |    CAST(ntile(32) OVER (ORDER BY cents, o_orderkey) AS BIGINT) AS bucket FROM o)
        |SELECT bucket, CAST(count(*) AS BIGINT) AS cnt,
        |  CAST(min(cents) AS BIGINT) AS lo_cents, CAST(max(cents) AS BIGINT) AS hi_cents
        |FROM r GROUP BY 1 ORDER BY 1""".stripMargin,
    "q327_strip_accents" ->
      // DuckDB's strip_accents is an INDEPENDENT implementation of the
      // same folding — agreeing char-for-char on every planted accent is
      // the cross-engine semantics proof
      """SELECT doc_id,
        |  CASE WHEN doc_id % 2 = 0 THEN translate(substr(text, 1, 24), 'aeiou', 'áéíóü')
        |    ELSE substr(text, 1, 24) END AS accented,
        |  strip_accents(CASE WHEN doc_id % 2 = 0 THEN translate(substr(text, 1, 24), 'aeiou', 'áéíóü')
        |    ELSE substr(text, 1, 24) END) AS folded
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q328_robots_filter" ->
      // same last-two-label extraction, same suffix-match-by-registered-
      // domain semantics
      """WITH h AS (SELECT doc_id,
        |    'sub' || CAST(doc_id % 4 AS VARCHAR) || '.dom' || CAST(doc_id % 7 AS VARCHAR) || '.com' AS host
        |  FROM documents),
        |r AS (SELECT doc_id, array_to_string(
        |    string_split(host, '.')[len(string_split(host, '.')) - 1 : len(string_split(host, '.'))], '.') AS reg_domain
        |  FROM h),
        |b AS (SELECT * FROM (VALUES ('dom0.com'), ('dom3.com')) AS t(reg_domain))
        |SELECT r.reg_domain, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(max(CASE WHEN b.reg_domain IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS blocked
        |FROM r LEFT JOIN b ON b.reg_domain = r.reg_domain GROUP BY 1 ORDER BY 1""".stripMargin,
    "q329_vector_norm_audit" ->
      // same micro² norms, same planted corruptions, same lower-median-
      // by-rank definition for median and MAD
      """WITH base AS (
        |  SELECT vec_id, embedding FROM embeddings
        |  UNION ALL SELECT vec_id + 9000001, list_transform(embedding, x -> CAST(20.0 AS FLOAT))
        |    FROM embeddings WHERE vec_id < 2
        |  UNION ALL SELECT vec_id + 9000003, list_transform(embedding, x -> CAST(0.0 AS FLOAT))
        |    FROM embeddings WHERE vec_id < 2),
        |nsq AS (SELECT vec_id, CAST(list_sum(list_transform(embedding, x ->
        |    CAST(round(CAST(x AS DOUBLE) * 1000000.0, 0) AS BIGINT) *
        |    CAST(round(CAST(x AS DOUBLE) * 1000000.0, 0) AS BIGINT))) AS BIGINT) AS norm_sq
        |  FROM base),
        |n AS (SELECT count(*) AS n FROM nsq),
        |rmed AS (SELECT norm_sq, row_number() OVER (ORDER BY norm_sq, vec_id) AS r FROM nsq),
        |med AS (SELECT rmed.norm_sq AS med FROM rmed, n WHERE rmed.r = (n.n + 1) // 2),
        |dev AS (SELECT vec_id, norm_sq, abs(norm_sq - med.med) AS abs_dev FROM nsq, med),
        |rmad AS (SELECT abs_dev, row_number() OVER (ORDER BY abs_dev, vec_id) AS r FROM dev),
        |mad AS (SELECT rmad.abs_dev AS mad FROM rmad, n WHERE rmad.r = (n.n + 1) // 2)
        |SELECT d.vec_id, d.norm_sq, CAST(d.abs_dev AS BIGINT) AS abs_dev
        |FROM dev d, mad WHERE d.abs_dev > mad.mad * 10 ORDER BY d.vec_id""".stripMargin,
    "q330_feature_hashing" ->
      // same char-level polynomial hash (list_reduce), same bucket and
      // sign-bit arithmetic
      """WITH tokr AS (SELECT unnest(list_filter(regexp_split_to_array(lower(text), '\s+'),
        |    t -> length(t) > 0)) AS w FROM documents),
        |c AS (SELECT w, count(*) AS c FROM tokr GROUP BY 1),
        |f AS (SELECT w, c, list_reduce(
        |    list_transform(range(1, length(w) + 1),
        |      i -> CAST(ord(substr(w, CAST(i AS INT), 1)) AS BIGINT)),
        |    (a, b) -> (a * 31 + b) % 1000000007) AS fp FROM c),
        |s AS (SELECT fp % 256 AS bucket, ((fp // 256) % 2) * 2 - 1 AS sign, c FROM f)
        |SELECT bucket, CAST(count(*) AS BIGINT) AS n_distinct,
        |  CAST(sum(c) AS BIGINT) AS mass, CAST(sum(sign * c) AS BIGINT) AS signed_mass
        |FROM s GROUP BY 1 ORDER BY 1""".stripMargin,
    "q331_count_min" ->
      // same 3×64 sketch, same row hashes, same min-over-rows readback
      """WITH tokr AS (SELECT unnest(list_filter(regexp_split_to_array(lower(text), '\s+'),
        |    t -> length(t) > 0)) AS w FROM documents),
        |c AS (SELECT w, count(*) AS c FROM tokr GROUP BY 1),
        |f AS (SELECT w, c, list_reduce(
        |    list_transform(range(1, length(w) + 1),
        |      i -> CAST(ord(substr(w, CAST(i AS INT), 1)) AS BIGINT)),
        |    (a, b) -> (a * 31 + b) % 1000000007) AS fp FROM c),
        |seeds AS (SELECT * FROM (VALUES (0, 31, 7), (1, 131, 13), (2, 1031, 17)) AS t(r, a, b)),
        |h AS (SELECT f.w, f.c, f.fp, seeds.r, (f.fp * seeds.a + seeds.b) % 1000000007 % 64 AS col
        |  FROM f CROSS JOIN seeds),
        |sk AS (SELECT r, col, sum(c) AS cell FROM h GROUP BY 1, 2),
        |top AS (SELECT w, c AS true_cnt, fp FROM c JOIN f USING (w, c)
        |  ORDER BY c DESC, w LIMIT 20),
        |est AS (SELECT top.w, top.true_cnt, min(sk.cell) AS cms_est
        |  FROM top CROSS JOIN seeds
        |  JOIN sk ON sk.r = seeds.r AND sk.col = (top.fp * seeds.a + seeds.b) % 1000000007 % 64
        |  GROUP BY 1, 2)
        |SELECT w AS token, CAST(true_cnt AS BIGINT) AS true_cnt,
        |  CAST(cms_est AS BIGINT) AS cms_est,
        |  CAST(cms_est - true_cnt AS BIGINT) AS overest
        |FROM est ORDER BY true_cnt DESC, token""".stripMargin,
    "q332_gzip_text" ->
      // aggregating the source table directly — equality proves the
      // gzip compress/decompress roundtrip lossless
      """SELECT CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(length(text)) AS BIGINT) AS sum_chars,
        |  CAST(sum(doc_id) AS BIGINT) AS id_sum
        |FROM documents""".stripMargin,
    "q333_partition_overwrite" ->
      // only 2024-01-05 doubles; every other day must stay identical —
      // the static-mode data-loss failure would empty them instead
      """SELECT strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS day,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(round(value * 100, 0) AS BIGINT) *
        |    CASE WHEN strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') = '2024-01-05'
        |      THEN 2 ELSE 1 END) AS BIGINT) AS sum_cents
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q334_dynamic_pruning" ->
      // the static-filter twin of the runtime-pruned join
      """SELECT strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS day,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS sum_cents
        |FROM events
        |WHERE strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') <= '2024-01-03'
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q335_code_switch" ->
      // same planted German tails, same per-half langid CASE, same
      // confident-disagreement rule
      s"""WITH t AS (SELECT doc_id,
         |    CASE WHEN doc_id % 10 = 4 THEN text || ' der die das und ist nicht ein'
         |      ELSE text END AS tt FROM documents),
         |h AS (SELECT doc_id, substr(tt, 1, length(tt) // 2) AS h1,
         |    substr(tt, length(tt) // 2 + 1, length(tt)) AS h2 FROM t),
         |lid AS (SELECT doc_id, ${langCaseOn("h1")} AS lang_a,
         |    ${langCaseOn("h2")} AS lang_b FROM h)
         |SELECT doc_id, lang_a, lang_b,
         |  CAST(CASE WHEN lang_a <> 'und' AND lang_b <> 'und' AND lang_a <> lang_b
         |    THEN 1 ELSE 0 END AS BIGINT) AS mixed
         |FROM lid ORDER BY doc_id""".stripMargin,
    "q336_temporal_split" ->
      // same split boundaries, same user-overlap-with-test readout
      """WITH ev AS (SELECT user_id, CASE
        |    WHEN CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-18' THEN '1_train'
        |    WHEN CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-20' THEN '2_embargo'
        |    ELSE '3_test' END AS split FROM events),
        |u AS (SELECT DISTINCT split, user_id FROM ev),
        |tu AS (SELECT user_id FROM u WHERE split = '3_test'),
        |ov AS (SELECT u.split, count(*) AS users_in_test FROM u JOIN tu USING (user_id) GROUP BY 1)
        |SELECT ev.split, CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(count(DISTINCT ev.user_id) AS BIGINT) AS n_users,
        |  CAST(coalesce(max(ov.users_in_test), 0) AS BIGINT) AS users_in_test
        |FROM ev LEFT JOIN ov ON ov.split = ev.split
        |GROUP BY ev.split ORDER BY ev.split""".stripMargin,
    "q337_template_dedup" ->
      // same normalization chain (lower → strip digits → strip
      // non-alpha → collapse whitespace → trim), same ≥2 group filter
      """WITH p AS (SELECT doc_id,
        |    trim(regexp_replace(regexp_replace(regexp_replace(
        |      lower('Q' || CAST(doc_id AS VARCHAR) || ': ' || substr(text, 1, 40)),
        |      '[0-9]', '', 'g'), '[^a-z ]', '', 'g'), '\s+', ' ', 'g')) AS template
        |  FROM documents)
        |SELECT template, CAST(count(*) AS BIGINT) AS n_prompts,
        |  CAST(min(doc_id) AS BIGINT) AS keeper_id
        |FROM p GROUP BY 1 HAVING count(*) >= 2 ORDER BY template""".stripMargin,
    "q338_cross_modal_audit" ->
      // text pairs = q44's full MinHash SQL; image pairs = q228's
      // arithmetic dHash groups; same full-outer classification
      s"""WITH tpairs AS ($q44Sql),
         |tp AS (SELECT id_a, id_b FROM tpairs WHERE id_a < 300 AND id_b < 300),
         |d AS (SELECT doc_id, doc_id % 50 AS gv FROM documents WHERE doc_id < 300),
         |bits AS (SELECT d.doc_id,
         |    CASE WHEN (d.gv * 13 + (x.x + 1) * (y.y + 3)) % 256
         |            > (d.gv * 13 + x.x * (y.y + 3)) % 256
         |      THEN CAST(1 AS BIGINT) << CAST(y.y * 8 + x.x AS INT) ELSE 0 END AS b
         |  FROM d, (SELECT unnest(range(0, 8)) AS x) x, (SELECT unnest(range(0, 7)) AS y) y),
         |h AS (SELECT doc_id, CAST(sum(b) AS BIGINT) AS dhash FROM bits GROUP BY 1),
         |ip AS (SELECT a.doc_id AS id_a, z.doc_id AS id_b
         |  FROM h a JOIN h z ON a.dhash = z.dhash AND a.doc_id < z.doc_id),
         |cls AS (SELECT CASE
         |    WHEN tp.id_a IS NOT NULL AND ip.id_a IS NOT NULL THEN 'both'
         |    WHEN tp.id_a IS NOT NULL THEN 'text_only' ELSE 'image_only' END AS signal
         |  FROM tp FULL OUTER JOIN ip ON tp.id_a = ip.id_a AND tp.id_b = ip.id_b)
         |SELECT signal, CAST(count(*) AS BIGINT) AS n_pairs
         |FROM cls GROUP BY 1 ORDER BY 1""".stripMargin,
    "q340_padding_waste" ->
      // same indicator-ladder tiers, same integer waste arithmetic
      """WITH t AS (SELECT CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n FROM documents),
        |b AS (SELECT CASE WHEN n <= 8 THEN 8 WHEN n <= 16 THEN 16 WHEN n <= 32 THEN 32
        |    WHEN n <= 64 THEN 64 WHEN n <= 128 THEN 128 WHEN n <= 256 THEN 256
        |    WHEN n <= 512 THEN 512 ELSE 1024 END AS bucket, n FROM t)
        |SELECT CAST(bucket AS BIGINT) AS bucket, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n) AS BIGINT) AS tokens,
        |  CAST(count(*) * bucket AS BIGINT) AS padded_tokens,
        |  CAST(((count(*) * bucket - sum(n)) * 10000) // (count(*) * bucket) AS BIGINT) AS waste_bp
        |FROM b GROUP BY bucket ORDER BY bucket""".stripMargin,
    "q341_rendezvous_shards" ->
      // same HRW hash, argmax as the rank window the engine's struct-max
      // replaces; ties to the smallest shard
      """WITH h AS (SELECT doc_id, s.s AS s,
        |    (doc_id * (1000003 + s.s * 17) + s.s * 1009) % 1000000007 AS h
        |  FROM documents, (SELECT unnest(range(0, 9)) AS s) s),
        |r8 AS (SELECT doc_id, s AS s8, row_number() OVER (PARTITION BY doc_id ORDER BY h DESC, s) AS rn
        |  FROM h WHERE s < 8),
        |a8 AS (SELECT doc_id, s8 FROM r8 WHERE rn = 1),
        |r9 AS (SELECT doc_id, s AS s9, row_number() OVER (PARTITION BY doc_id ORDER BY h DESC, s) AS rn
        |  FROM h),
        |a9 AS (SELECT doc_id, s9 FROM r9 WHERE rn = 1),
        |j AS (SELECT a8.doc_id, a8.s8, a9.s9 FROM a8 JOIN a9 USING (doc_id)),
        |bf AS (SELECT s8 AS shard, count(*) AS n_before FROM j GROUP BY 1),
        |af AS (SELECT s9 AS shard, count(*) AS n_after FROM j GROUP BY 1),
        |mv AS (SELECT s9 AS shard, count(*) AS moved_in FROM j WHERE s8 <> s9 GROUP BY 1)
        |SELECT af.shard, CAST(coalesce(bf.n_before, 0) AS BIGINT) AS n_before,
        |  CAST(af.n_after AS BIGINT) AS n_after,
        |  CAST(coalesce(mv.moved_in, 0) AS BIGINT) AS moved_in
        |FROM af LEFT JOIN bf USING (shard) LEFT JOIN mv USING (shard)
        |ORDER BY af.shard""".stripMargin,
    "q342_pattern_match" ->
      // identical lead() pattern; NULL tail windows fail the predicate
      // in both engines (x <> 'error' is NULL, not true, on NULL)
      """WITH o AS (SELECT user_id, event_type,
        |    lead(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS n1,
        |    lead(event_type, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS n2
        |  FROM events)
        |SELECT user_id, CAST(count(*) AS BIGINT) AS n_matches FROM o
        |WHERE event_type = 'view' AND (n1 = 'purchase' OR (n1 <> 'error' AND n2 = 'purchase'))
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q343_missing_partitions" ->
      // same planted gap, same min..max calendar anti-join
      """WITH ev AS (SELECT strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS day FROM events),
        |f AS (SELECT day FROM ev WHERE day <> '2024-01-11'),
        |b AS (SELECT min(CAST(day AS DATE)) AS lo, max(CAST(day AS DATE)) AS hi FROM f),
        |cal AS (SELECT strftime(unnest(generate_series(CAST(lo AS TIMESTAMP),
        |    CAST(hi AS TIMESTAMP), INTERVAL 1 DAY)), '%Y-%m-%d') AS day FROM b),
        |o AS (SELECT DISTINCT day FROM f)
        |SELECT cal.day FROM cal LEFT JOIN o ON o.day = cal.day
        |WHERE o.day IS NULL ORDER BY 1""".stripMargin,
    "q344_watermark_sizing" ->
      // same deterministic arrival jitter, same per-user running max in
      // arrival order, same strict lateness inequality
      """WITH ev AS (SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS tsm FROM events),
        |a AS (SELECT user_id, event_id, tsm,
        |    tsm + (event_id * 2654435761 % 1800000000) AS arr FROM ev),
        |m AS (SELECT user_id, tsm,
        |    max(tsm) OVER (PARTITION BY user_id ORDER BY arr, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prevmax FROM a),
        |d AS (SELECT CAST(unnest([60, 600, 3600]) AS BIGINT) AS delay_s)
        |SELECT d.delay_s, CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(sum(CASE WHEN m.prevmax IS NOT NULL
        |    AND m.tsm < m.prevmax - d.delay_s * 1000000 THEN 1 ELSE 0 END) AS BIGINT) AS n_late,
        |  CAST(sum(CASE WHEN m.prevmax IS NOT NULL
        |    AND m.tsm < m.prevmax - d.delay_s * 1000000 THEN 1 ELSE 0 END) * 10000
        |    // count(*) AS BIGINT) AS late_bp
        |FROM m CROSS JOIN d GROUP BY d.delay_s ORDER BY 1""".stripMargin,
    "q345_prefix_cache" ->
      // same tokenization, same list-slice prefixes (DuckDB slices are
      // 1-based inclusive), same hit arithmetic
      """WITH t AS (SELECT list_filter(regexp_split_to_array(lower(text), '\s+'),
        |    x -> length(x) > 0) AS tok FROM documents),
        |n AS (SELECT CAST(unnest([4, 8, 16]) AS BIGINT) AS n_prefix_tokens),
        |p AS (SELECT n.n_prefix_tokens,
        |    array_to_string(t.tok[1 : CAST(n.n_prefix_tokens AS INT)], ' ') AS prefix
        |  FROM t CROSS JOIN n)
        |SELECT n_prefix_tokens, CAST(count(*) AS BIGINT) AS n_prompts,
        |  CAST(count(DISTINCT prefix) AS BIGINT) AS n_distinct,
        |  CAST((count(*) - count(DISTINCT prefix)) * 10000 // count(*) AS BIGINT) AS cache_hit_bp
        |FROM p GROUP BY 1 ORDER BY 1""".stripMargin,
    "q346_draft_acceptance" ->
      // argmax stated as the rank window the engine's min(struct)
      // replaces; ties to the smallest continuation in both
      """WITH t AS (SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '\s+'),
        |    x -> length(x) > 0) AS tok FROM documents),
        |pr AS (SELECT doc_id, i.i AS i, tok[CAST(i.i AS INT)] AS w1,
        |    tok[CAST(i.i AS INT) + 1] AS w2
        |  FROM t, LATERAL (SELECT unnest(range(1, len(tok))) AS i) i),
        |c AS (SELECT w1, w2, count(*) AS c FROM pr GROUP BY 1, 2),
        |r AS (SELECT w1, w2 AS draft,
        |    row_number() OVER (PARTITION BY w1 ORDER BY c DESC, w2) AS rn FROM c),
        |b AS (SELECT w1, draft FROM r WHERE rn = 1),
        |sc AS (SELECT pr.w2, b.draft FROM pr JOIN b USING (w1))
        |SELECT CAST(count(*) AS BIGINT) AS n_positions,
        |  CAST(sum(CASE WHEN w2 = draft THEN 1 ELSE 0 END) AS BIGINT) AS n_hits,
        |  CAST(sum(CASE WHEN w2 = draft THEN 1 ELSE 0 END) * 10000 // count(*) AS BIGINT) AS acc_bp
        |FROM sc""".stripMargin,
    "q347_retrieval_overlap" ->
      // q45's top-5 scoring twice + a pair-keyed overlap count
      """WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id < 8),
        |c AS (SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS cv FROM embeddings),
        |s AS (SELECT query_id, neighbor_id,
        |  list_dot_product(qv, cv) / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv))) AS cosine
        |  FROM c CROSS JOIN q WHERE neighbor_id <> query_id),
        |r AS (SELECT query_id, neighbor_id,
        |  row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rn FROM s),
        |t5 AS (SELECT query_id, neighbor_id FROM r WHERE rn <= 5)
        |SELECT a.query_id AS query_a, b.query_id AS query_b,
        |  CAST(count(*) AS BIGINT) AS shared
        |FROM t5 a JOIN t5 b ON a.neighbor_id = b.neighbor_id AND a.query_id < b.query_id
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q348_lsh_cost_plan" -> q348Sql,
    "q349_oov_drift" ->
      // same frozen top-100 vocabulary (count desc, token), same OOV
      // left-join accounting
      """WITH d AS (SELECT source, CAST(substr(source, 4) AS INT) AS src_n, text FROM documents),
        |ot AS (SELECT unnest(list_filter(regexp_split_to_array(lower(text), '\s+'),
        |    t -> length(t) > 0)) AS w FROM d WHERE src_n < 10),
        |vc AS (SELECT w, count(*) AS c FROM ot GROUP BY 1),
        |vr AS (SELECT w, row_number() OVER (ORDER BY c DESC, w) AS rn FROM vc),
        |vocab AS (SELECT w FROM vr WHERE rn <= 100),
        |nt AS (SELECT source, unnest(list_filter(regexp_split_to_array(lower(text), '\s+'),
        |    t -> length(t) > 0)) AS w FROM d WHERE src_n >= 10)
        |SELECT nt.source, CAST(count(*) AS BIGINT) AS tokens,
        |  CAST(sum(CASE WHEN vocab.w IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS oov,
        |  CAST(sum(CASE WHEN vocab.w IS NULL THEN 1 ELSE 0 END) * 10000 // count(*) AS BIGINT) AS oov_bp
        |FROM nt LEFT JOIN vocab ON vocab.w = nt.w
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q350_grouped_rank_normalize" ->
      // the per-source window IS what prefixSumKeyed replaces; same
      // exact-bp percentile arithmetic
      """WITH r AS (SELECT doc_id, source, n_chars,
        |    row_number() OVER (PARTITION BY source ORDER BY n_chars, doc_id) AS rank,
        |    count(*) OVER (PARTITION BY source) AS cnt FROM documents)
        |SELECT doc_id, source, CAST(n_chars AS BIGINT) AS n_chars,
        |  CAST((rank - 1) * 10000 // greatest(cnt - 1, 1) AS BIGINT) AS pct_bp
        |FROM r ORDER BY doc_id""".stripMargin,
    "q351_quality_survivorship" ->
      // q44's pair graph + the recursive component labels + q51's exact
      // quality formula; argmax as the rank window the engine's
      // max(struct) replaces, ties to the smallest id
      s"""WITH pairs AS MATERIALIZED ($q44Sql),
         |e AS MATERIALIZED (SELECT id_a AS src, id_b AS dst FROM pairs
         |      UNION SELECT id_b, id_a FROM pairs),
         |${minLabelCc()},
|lab AS (SELECT node, lab AS component FROM l$ccRounds),
         |f AS (SELECT doc_id, CAST(length(text) AS DOUBLE) AS len,
         |    CAST(len(regexp_extract_all(text, '\\S+')) AS DOUBLE) AS toks,
         |    CAST(len(regexp_extract_all(text, '[A-Za-z]')) AS DOUBLE) AS alpha,
         |    CAST(len(regexp_extract_all(lower(text), '\\b(the|and|of|is|a)\\b')) AS DOUBLE) AS stop
         |  FROM documents),
         |ql AS (SELECT doc_id, (round(
         |  (CASE WHEN len >= 100 AND len <= 10000 THEN CAST(1.0 AS DOUBLE) WHEN len >= 20 THEN CAST(0.5 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END) * CAST(0.4 AS DOUBLE)
         |  + (CASE WHEN len > 0 THEN alpha / len ELSE CAST(0.0 AS DOUBLE) END) * CAST(0.3 AS DOUBLE)
         |  + (CASE WHEN toks > 0 THEN least(stop / toks * CAST(5.0 AS DOUBLE), CAST(1.0 AS DOUBLE)) ELSE CAST(0.0 AS DOUBLE) END) * CAST(0.3 AS DOUBLE),
         |  4) + 0.0) AS quality FROM f),
         |mem AS (SELECT l.component, l.node, q.quality FROM lab l JOIN ql q ON q.doc_id = l.node),
         |r AS (SELECT component, node, quality,
         |    row_number() OVER (PARTITION BY component ORDER BY quality DESC, node) AS rn,
         |    count(*) OVER (PARTITION BY component) AS n_members FROM mem)
         |SELECT CAST(component AS BIGINT) AS component, CAST(node AS BIGINT) AS keeper_id,
         |  CAST(n_members AS BIGINT) AS n_members, quality AS kept_quality
         |FROM r WHERE rn = 1 ORDER BY component""".stripMargin,
    "q352_dup_weighting" ->
      // same recursive component labels as q351; singletons (no component
      // row) keep full weight 10000 via the left joins
      s"""WITH pairs AS MATERIALIZED ($q44Sql),
         |e AS MATERIALIZED (SELECT id_a AS src, id_b AS dst FROM pairs
         |      UNION SELECT id_b, id_a FROM pairs),
         |${minLabelCc()},
|lab AS (SELECT node, lab AS component FROM l$ccRounds),
         |sizes AS (SELECT component, count(*) AS csize FROM lab GROUP BY 1),
         |w AS (SELECT d.doc_id, d.source,
         |    COALESCE(CAST(10000 // s.csize AS BIGINT), 10000) AS w_bp
         |  FROM documents d
         |  LEFT JOIN lab l ON l.node = d.doc_id
         |  LEFT JOIN sizes s ON s.component = l.component)
         |SELECT source, count(*) AS n_docs, CAST(sum(w_bp) AS BIGINT) AS eff_bp,
         |  CAST(sum(w_bp) // count(*) AS BIGINT) AS avg_w_bp
         |FROM w GROUP BY 1 ORDER BY 1""".stripMargin,
    "q353_shard_checksum" ->
      // the q53 byte-rolling fingerprint inlined for both replicas; the
      // per-row hash mixes in doc_id so a row SWAP (not just an edit)
      // also dirties the shard sum
      """WITH fa AS (SELECT doc_id, list_reduce(
        |    list_transform(range(1, length(text) + 1),
        |      i -> CAST(ord(substr(text, CAST(i AS INT), 1)) AS BIGINT)),
        |    (a, b) -> (a * 31 + b) % 1000000007) AS fp FROM documents),
        |pert AS (SELECT doc_id,
        |    CASE WHEN doc_id % 97 = 0 THEN text || ' ' ELSE text END AS text
        |  FROM documents),
        |fb AS (SELECT doc_id, list_reduce(
        |    list_transform(range(1, length(text) + 1),
        |      i -> CAST(ord(substr(text, CAST(i AS INT), 1)) AS BIGINT)),
        |    (a, b) -> (a * 31 + b) % 1000000007) AS fp FROM pert),
        |sa AS (SELECT doc_id % 16 AS shard, count(*) AS n_rows,
        |    CAST(sum((fp * 31 + doc_id) % 1000000007) AS BIGINT) AS sum_a
        |  FROM fa GROUP BY 1),
        |sb AS (SELECT doc_id % 16 AS shard,
        |    CAST(sum((fp * 31 + doc_id) % 1000000007) AS BIGINT) AS sum_b
        |  FROM fb GROUP BY 1)
        |SELECT CAST(sa.shard AS BIGINT) AS shard, sa.n_rows, sa.sum_a, sb.sum_b,
        |  (sa.sum_a <> sb.sum_b) AS dirty
        |FROM sa JOIN sb USING (shard) ORDER BY shard""".stripMargin,
    "q354_bitext_margin" ->
      // forward and backward top-4 both as the exact q45 scoring shape;
      // margin from the bp-quantized sums, one IEEE division at the end
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |xq AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id % 2 = 0 AND vec_id < 16),
        |yc AS (SELECT vec_id AS neighbor_id, v AS cv FROM e WHERE vec_id % 2 = 1),
        |fs AS (SELECT query_id, neighbor_id,
        |    list_dot_product(qv, cv) / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv))) AS cosine
        |  FROM yc CROSS JOIN xq),
        |fr AS (SELECT query_id, neighbor_id, (round(cosine, 4) + 0.0) AS cosine,
        |    row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rn FROM fs),
        |fwd AS (SELECT query_id, neighbor_id,
        |    CAST(round(cosine * 10000) AS BIGINT) AS cos_bp FROM fr WHERE rn <= 4),
        |px AS (SELECT query_id, CAST(sum(cos_bp) AS BIGINT) AS px_bp FROM fwd GROUP BY 1),
        |nq AS (SELECT DISTINCT neighbor_id AS query_id FROM fwd),
        |nqv AS (SELECT nq.query_id, e.v AS qv FROM nq JOIN e ON e.vec_id = nq.query_id),
        |xc AS (SELECT vec_id AS neighbor_id, v AS cv FROM e WHERE vec_id % 2 = 0),
        |bs AS (SELECT query_id, neighbor_id,
        |    list_dot_product(qv, cv) / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv))) AS cosine
        |  FROM xc CROSS JOIN nqv),
        |br AS (SELECT query_id, (round(cosine, 4) + 0.0) AS cosine,
        |    row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rn FROM bs),
        |py AS (SELECT query_id AS neighbor_id,
        |    CAST(sum(CAST(round(cosine * 10000) AS BIGINT)) AS BIGINT) AS py_bp
        |  FROM br WHERE rn <= 4 GROUP BY 1)
        |SELECT f.query_id, f.neighbor_id, f.cos_bp, px.px_bp, py.py_bp,
        |  (round(CAST(f.cos_bp * 8 AS DOUBLE) / CAST(px.px_bp + py.py_bp AS DOUBLE), 4) + 0.0) AS margin
        |FROM fwd f JOIN px USING (query_id) JOIN py USING (neighbor_id)
        |ORDER BY query_id, margin DESC, neighbor_id""".stripMargin,
    "q355_bucketed_batching" ->
      // the per-bucket window IS what prefixSumKeyed replaces; exclusive
      // prefix = inclusive minus own n, batch id by integer division
      """WITH t AS (SELECT doc_id,
        |    CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n FROM documents),
        |b AS (SELECT doc_id, n,
        |    CASE WHEN n <= 64 THEN '64' WHEN n <= 128 THEN '128'
        |         WHEN n <= 256 THEN '256' WHEN n <= 512 THEN '512'
        |         ELSE '1024' END AS bucket FROM t),
        |c AS (SELECT bucket, doc_id, n,
        |    sum(n) OVER (PARTITION BY bucket ORDER BY n, doc_id
        |      ROWS UNBOUNDED PRECEDING) AS cum FROM b)
        |SELECT bucket, CAST((cum - n) // 2048 AS BIGINT) AS batch,
        |  count(*) AS n_docs, CAST(sum(n) AS BIGINT) AS tokens
        |FROM c GROUP BY 1, 2 ORDER BY bucket, batch""".stripMargin,
    "q356_bottomk_sample" ->
      // the per-source rank window IS what the two-phase k-heap replaces
      """WITH p AS (SELECT doc_id, source,
        |    (doc_id * 48271) % 2147483647 AS priority FROM documents),
        |r AS (SELECT source, doc_id, priority,
        |    row_number() OVER (PARTITION BY source ORDER BY priority, doc_id) AS rn
        |  FROM p)
        |SELECT source, doc_id, priority, CAST(rn AS BIGINT) AS rn
        |FROM r WHERE rn <= 8 ORDER BY source, rn""".stripMargin,
    "q357_heaps_law" ->
      // same bigram convention as q100; vocab(N) via each type's
      // first-occurrence doc, token mass via per-doc counts
      """WITH d AS (SELECT count(*) AS dd FROM documents),
        |cp AS (SELECT CAST(i AS BIGINT) AS i, dd * i // 4 AS n_docs
        |  FROM d CROSS JOIN (SELECT unnest([1, 2, 3, 4]) AS i) t),
        |w AS (SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS l FROM documents),
        |tok AS (SELECT doc_id,
        |    unnest(list_transform(range(1, len(l)), j -> l[j] || ' ' || l[j+1])) AS bg
        |  FROM w WHERE len(l) >= 2),
        |fo AS (SELECT bg, min(doc_id) AS fd FROM tok GROUP BY 1),
        |pd AS (SELECT doc_id, count(*) AS nt FROM tok GROUP BY 1),
        |v AS (SELECT cp.i, cp.n_docs, count(*) AS vocab
        |  FROM cp JOIN fo ON fo.fd < cp.n_docs GROUP BY 1, 2),
        |tc AS (SELECT cp.i, CAST(sum(pd.nt) AS BIGINT) AS tokens
        |  FROM cp JOIN pd ON pd.doc_id < cp.n_docs GROUP BY 1)
        |SELECT v.i, v.n_docs, tc.tokens, v.vocab,
        |  v.vocab * 10000 // tc.tokens AS types_per_10k
        |FROM v JOIN tc ON tc.i = v.i ORDER BY v.i""".stripMargin,
    "q358_neighborhood_jaccard" ->
      // symmetric co-purchase edges as in q125 (both directions);
      // |N∪| = d_s + d_c − common, score in exact basis points
      """WITH e AS (SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
        |  FROM lineitem a JOIN lineitem b
        |  ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey),
        |deg AS (SELECT src, count(*) AS d FROM e GROUP BY 1),
        |p AS (SELECT e1.src AS seed, e1.dst AS z, e2.dst AS cand
        |  FROM e e1 JOIN e e2 ON e1.dst = e2.src
        |  WHERE e1.src < 8 AND e2.dst <> e1.src),
        |np AS (SELECT p.seed, p.z, p.cand FROM p
        |  LEFT JOIN e ON e.src = p.seed AND e.dst = p.cand
        |  WHERE e.src IS NULL),
        |cn AS (SELECT seed, cand, count(*) AS common_n FROM np GROUP BY 1, 2)
        |SELECT cn.seed, cn.cand AS candidate, cn.common_n,
        |  CAST((cn.common_n * 10000) // (ds.d + dc.d - cn.common_n) AS BIGINT) AS jaccard_bp
        |FROM cn JOIN deg ds ON ds.src = cn.seed JOIN deg dc ON dc.src = cn.cand
        |ORDER BY cn.seed, jaccard_bp DESC, cn.common_n DESC, candidate""".stripMargin,
    "q359_ab_ztest" ->
      // identical pooled-z expression, identical cast order
      """WITH b AS (SELECT event_type, user_id % 2 AS arm,
        |    CASE WHEN value > 50 THEN 1 ELSE 0 END AS sflag FROM events),
        |g AS (SELECT event_type,
        |    CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
        |    CAST(sum(CASE WHEN arm = 0 THEN sflag ELSE 0 END) AS BIGINT) AS c0,
        |    CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
        |    CAST(sum(CASE WHEN arm = 1 THEN sflag ELSE 0 END) AS BIGINT) AS c1
        |  FROM b GROUP BY 1),
        |zz AS (SELECT event_type, n0, c0, n1, c1,
        |  (round((CAST(c1 AS DOUBLE)/n1 - CAST(c0 AS DOUBLE)/n0) /
        |    sqrt((CAST(c0+c1 AS DOUBLE)/(n0+n1)) *
        |    (CAST(1 AS DOUBLE) - CAST(c0+c1 AS DOUBLE)/(n0+n1)) *
        |    (CAST(1 AS DOUBLE)/n0 + CAST(1 AS DOUBLE)/n1)), 4) + 0.0) AS z
        |  FROM g)
        |SELECT event_type, n0, c0, n1, c1, z, abs(z) > 1.96 AS significant
        |FROM zz ORDER BY event_type""".stripMargin,
    "q360_wilson_rank" ->
      // identical Wilson lower-bound expression; ORDER on the rounded
      // bound so the heap can never hinge on a last-ulp difference
      """WITH s AS (SELECT l_partkey, count(*) AS n,
        |    CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS pos
        |  FROM lineitem GROUP BY 1),
        |w AS (SELECT l_partkey, n, pos,
        |    CAST(pos * 10000 // n AS BIGINT) AS naive_bp,
        |    (round((CAST(pos AS DOUBLE)/n + CAST(1.9208 AS DOUBLE)/n -
        |      CAST(1.96 AS DOUBLE)*sqrt((CAST(pos AS DOUBLE)/n*
        |      (CAST(1 AS DOUBLE)-CAST(pos AS DOUBLE)/n) +
        |      CAST(0.9604 AS DOUBLE)/n)/n)) /
        |      (CAST(1 AS DOUBLE) + CAST(3.8416 AS DOUBLE)/n), 4) + 0.0) AS wilson_lb
        |  FROM s)
        |SELECT l_partkey, n, pos, naive_bp, wilson_lb FROM w
        |ORDER BY wilson_lb DESC, l_partkey LIMIT 20""".stripMargin,
    "q361_ks_time_drift" ->
      // same cents quantization, same domain-sized CDF windows, exact
      // cross-multiplied sup statistic; arm = which side of the exact
      // epoch-microsecond midpoint
      """WITH e0 AS (SELECT event_type, epoch_us(CAST(ts AS TIMESTAMP)) AS us,
        |    CAST(round(value * 100) AS BIGINT) AS cents
        |  FROM events WHERE value IS NOT NULL),
        |mid AS (SELECT (min(us) + max(us)) // 2 AS mid FROM e0),
        |ev AS (SELECT event_type, cents,
        |    CASE WHEN us <= mid THEN 0 ELSE 1 END AS arm
        |  FROM e0 CROSS JOIN mid),
        |g AS (SELECT event_type, cents,
        |    sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS d0,
        |    sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS d1
        |  FROM ev GROUP BY 1, 2),
        |c AS (SELECT event_type, cents, d0, d1,
        |    sum(d0) OVER (PARTITION BY event_type ORDER BY cents ROWS UNBOUNDED PRECEDING) AS c0,
        |    sum(d1) OVER (PARTITION BY event_type ORDER BY cents ROWS UNBOUNDED PRECEDING) AS c1,
        |    sum(d0) OVER (PARTITION BY event_type) AS tn0,
        |    sum(d1) OVER (PARTITION BY event_type) AS tn1 FROM g)
        |SELECT event_type, CAST(max(tn0) AS BIGINT) AS n0,
        |  CAST(max(tn1) AS BIGINT) AS n1,
        |  CAST(max(abs(c0 * tn1 - c1 * tn0)) AS BIGINT) AS d_num,
        |  (round(CAST(max(abs(c0 * tn1 - c1 * tn0)) AS DOUBLE) /
        |    CAST(max(tn0) * max(tn1) AS DOUBLE), 6) + 0.0) AS ks
        |FROM c GROUP BY 1 ORDER BY 1""".stripMargin,
    "q362_conformal_bound" ->
      // the per-group rank window IS what prefixSumKeyed replaces;
      // identical integer mean, identical k
      """WITH ev AS (SELECT event_type, event_id,
        |    CAST(round(value * 100) AS BIGINT) AS cents
        |  FROM events WHERE value IS NOT NULL),
        |m AS (SELECT event_type, count(*) AS n,
        |    CAST(sum(cents) // count(*) AS BIGINT) AS mean_c FROM ev GROUP BY 1),
        |kk AS (SELECT event_type, n,
        |    CAST(least((9 * (n + 1) + 9) // 10, n) AS BIGINT) AS k FROM m),
        |r AS (SELECT ev.event_type, abs(ev.cents - m.mean_c) AS resid, ev.event_id
        |  FROM ev JOIN m USING (event_type)),
        |rk AS (SELECT event_type, resid,
        |    row_number() OVER (PARTITION BY event_type ORDER BY resid, event_id) AS rk
        |  FROM r)
        |SELECT kk.event_type, kk.n, kk.k, rk.resid AS bound_cents
        |FROM kk JOIN rk ON rk.event_type = kk.event_type AND rk.rk = kk.k
        |ORDER BY 1""".stripMargin,
    "q363_chi_square" ->
      // identical zero-cell completion and micro-quantized per-cell
      // terms; isodow(ts) ≡ Spark weekday()+1 (Monday = 1)
      """WITH d0 AS (SELECT event_type AS source,
        |    CAST(isodow(CAST(ts AS TIMESTAMP)) AS BIGINT) AS lang FROM events),
        |o AS (SELECT source, lang, count(*) AS o FROM d0 GROUP BY 1, 2),
        |rt AS (SELECT source, CAST(sum(o) AS BIGINT) AS r FROM o GROUP BY 1),
        |ct AS (SELECT lang, CAST(sum(o) AS BIGINT) AS c FROM o GROUP BY 1),
        |nt AS (SELECT count(*) AS nn FROM d0),
        |cells AS (SELECT rt.source, ct.lang, rt.r, ct.c, COALESCE(o.o, 0) AS o0
        |  FROM rt CROSS JOIN ct
        |  LEFT JOIN o ON o.source = rt.source AND o.lang = ct.lang),
        |con AS (SELECT source, lang,
        |    CAST(round(CAST(o0 * nn - r * c AS DOUBLE) * CAST(o0 * nn - r * c AS DOUBLE)
        |      / (CAST(r AS DOUBLE) * CAST(c AS DOUBLE) * CAST(nn AS DOUBLE))
        |      * CAST(1000000 AS DOUBLE)) AS BIGINT) AS cm
        |  FROM cells CROSS JOIN nt)
        |SELECT nt.nn AS n, CAST(count(DISTINCT source) AS BIGINT) AS n_rows,
        |  CAST(count(DISTINCT lang) AS BIGINT) AS n_cols,
        |  CAST((count(DISTINCT source) - 1) * (count(DISTINCT lang) - 1) AS BIGINT) AS dof,
        |  CAST(sum(cm) AS BIGINT) AS chi2_micro,
        |  (round(sqrt(CAST(sum(cm) AS DOUBLE) / (CAST(1000000 AS DOUBLE) * nt.nn *
        |    least(count(DISTINCT source) - 1, count(DISTINCT lang) - 1))), 4) + 0.0) AS cramers_v
        |FROM con CROSS JOIN nt GROUP BY nt.nn""".stripMargin,
    "q364_stationary_dist" ->
      // q151's lead() pairs, probabilities in exact millionths, the same
      // 6 floor-div power-iteration steps unrolled
      """WITH p0 AS (SELECT event_type AS from_type,
        |    lead(event_type) OVER (PARTITION BY user_id
        |      ORDER BY CAST(ts AS TIMESTAMP), event_id) AS to_type FROM events),
        |tm AS (SELECT from_type, to_type, count(*) AS cnt FROM p0
        |  WHERE to_type IS NOT NULL GROUP BY 1, 2),
        |tt AS (SELECT from_type, sum(cnt) AS t FROM tm GROUP BY 1),
        |p AS (SELECT tm.from_type, tm.to_type,
        |    CAST((cnt * 1000000) // t AS BIGINT) AS ps
        |  FROM tm JOIN tt USING (from_type)),
        |st AS (SELECT DISTINCT from_type AS st FROM tm),
        |ns AS (SELECT count(*) AS n FROM st),
        |i0 AS (SELECT st, CAST(1000000 // n AS BIGINT) AS v FROM st CROSS JOIN ns),
        |i1 AS (SELECT p.to_type AS st, CAST(sum(i0.v * p.ps) // 1000000 AS BIGINT) AS v
        |  FROM i0 JOIN p ON p.from_type = i0.st GROUP BY 1),
        |i2 AS (SELECT p.to_type AS st, CAST(sum(i1.v * p.ps) // 1000000 AS BIGINT) AS v
        |  FROM i1 JOIN p ON p.from_type = i1.st GROUP BY 1),
        |i3 AS (SELECT p.to_type AS st, CAST(sum(i2.v * p.ps) // 1000000 AS BIGINT) AS v
        |  FROM i2 JOIN p ON p.from_type = i2.st GROUP BY 1),
        |i4 AS (SELECT p.to_type AS st, CAST(sum(i3.v * p.ps) // 1000000 AS BIGINT) AS v
        |  FROM i3 JOIN p ON p.from_type = i3.st GROUP BY 1),
        |i5 AS (SELECT p.to_type AS st, CAST(sum(i4.v * p.ps) // 1000000 AS BIGINT) AS v
        |  FROM i4 JOIN p ON p.from_type = i4.st GROUP BY 1),
        |i6 AS (SELECT p.to_type AS st, CAST(sum(i5.v * p.ps) // 1000000 AS BIGINT) AS v
        |  FROM i5 JOIN p ON p.from_type = i5.st GROUP BY 1)
        |SELECT st AS state, v AS pi_ppm FROM i6 ORDER BY state""".stripMargin,
    "q365_stickiness" ->
      // q108's fan-out convention at three trailing widths
      """WITH e AS (SELECT DISTINCT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d, user_id FROM events),
        |days AS (SELECT DISTINCT d FROM e),
        |f7 AS (SELECT d + CAST(i AS INTEGER) AS day, user_id
        |  FROM e, LATERAL (SELECT unnest(range(0, 7)) AS i) t),
        |f28 AS (SELECT d + CAST(i AS INTEGER) AS day, user_id
        |  FROM e, LATERAL (SELECT unnest(range(0, 28)) AS i) t),
        |dau AS (SELECT d AS day, count(DISTINCT user_id) AS dau FROM e GROUP BY 1),
        |wau AS (SELECT day, count(DISTINCT user_id) AS wau FROM f7
        |  WHERE day IN (SELECT d FROM days) GROUP BY 1),
        |mau AS (SELECT day, count(DISTINCT user_id) AS mau FROM f28
        |  WHERE day IN (SELECT d FROM days) GROUP BY 1)
        |SELECT strftime(dau.day, '%Y-%m-%d') AS day, dau.dau, wau.wau, mau.mau,
        |  dau.dau * 10000 // wau.wau AS dw_bp, wau.wau * 10000 // mau.mau AS wm_bp
        |FROM dau JOIN wau USING (day) JOIN mau USING (day) ORDER BY day""".stripMargin,
    "q366_l_diversity" ->
      // identical band shift keeps the integer division non-negative, so
      // trunc (Spark div) ≡ floor (DuckDB //)
      """WITH g AS (SELECT c_nationkey, c_mktsegment,
        |    count(DISTINCT (CAST(round(c_acctbal * 100) AS BIGINT) + 100000) // 100000) AS lv,
        |    count(*) AS cnt FROM customer GROUP BY 1, 2),
        |l AS (SELECT unnest([2, 3, 5]) AS l)
        |SELECT CAST(l.l AS BIGINT) AS l, count(*) AS groups_total,
        |  CAST(sum(CASE WHEN g.lv < l.l THEN 1 ELSE 0 END) AS BIGINT) AS groups_below,
        |  CAST(sum(CASE WHEN g.lv < l.l THEN g.cnt ELSE 0 END) AS BIGINT) AS rows_exposed,
        |  CAST(sum(CASE WHEN g.lv < l.l THEN g.cnt ELSE 0 END) * 10000 // sum(g.cnt) AS BIGINT) AS exposed_bp
        |FROM g CROSS JOIN l GROUP BY 1 ORDER BY 1""".stripMargin,
    "q367_slo_burn_rate" ->
      // same per-day aggregate, same trailing frame over the |days| rows
      """WITH d AS (SELECT strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS day,
        |    count(*) AS n,
        |    sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS err
        |  FROM events GROUP BY 1),
        |w AS (SELECT day, n, err,
        |    sum(n) OVER (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS n7,
        |    sum(err) OVER (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS err7
        |  FROM d)
        |SELECT day, CAST(n AS BIGINT) AS n, CAST(err AS BIGINT) AS err,
        |  CAST(err * 1000000 // n AS BIGINT) AS burn1_bp,
        |  CAST(err7 * 1000000 // n7 AS BIGINT) AS burn7_bp,
        |  (err * 1000000 // n >= 20000) AND (err7 * 1000000 // n7 >= 15000) AS page
        |FROM w ORDER BY day""".stripMargin,
    "q368_hll_mergeability" ->
      // the oracle pins the exact cardinality; the two booleans are
      // Spark-side invariants (merged and direct estimates each within
      // ±5% of exact) that must come out TRUE to hash-match this row
      """SELECT event_type, count(DISTINCT user_id) AS exact,
        |  TRUE AS merged_ok, TRUE AS direct_ok
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q369_csv_multiline" ->
      // the oracle reconstructs the expected field from the SOURCE table;
      // the engine must recover it byte-identically through its own
      // written CSV (quoted newline + escaped quotes)
      """WITH f AS (SELECT doc_id,
        |    substr(text, 1, 20) || chr(10) || 'he said "' || source || '"' AS field
        |  FROM documents)
        |SELECT doc_id, field, CAST(length(field) AS BIGINT) AS field_len
        |FROM f ORDER BY doc_id""".stripMargin,
    "q370_png_chunk_walk" ->
      // JDK ImageIO always emits exactly IHDR(13) IDAT IEND for RGB
      // writes; geometry mirrors q112's synthesis, and the planted IDAT
      // byte-flip must surface as crc_ok = false with structure intact
      """SELECT doc_id, CAST(3 AS BIGINT) AS n_chunks,
        |  'IHDR,IDAT,IEND' AS chunk_types,
        |  CAST(n_chars % 16 + 1 AS BIGINT) AS width,
        |  CAST(doc_id % 16 + 1 AS BIGINT) AS height,
        |  CAST(8 AS BIGINT) AS bit_depth, CAST(2 AS BIGINT) AS color_type,
        |  doc_id % 101 <> 0 AS crc_ok
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q371_mahalanobis" ->
      // identical fixed-op-order double pipeline on exact long moments
      """WITH ev AS (SELECT event_id, CAST(round(value * 100) AS BIGINT) AS x,
        |    CAST(hour(CAST(ts AS TIMESTAMP)) AS BIGINT) AS y
        |  FROM events WHERE value IS NOT NULL),
        |m AS (SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy,
        |    sum(x * x) AS sxx, sum(y * y) AS syy, sum(x * y) AS sxy FROM ev),
        |c AS (SELECT event_id, x, y,
        |    CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx AS cxx,
        |    CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy AS cyy,
        |    CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy AS cxy,
        |    CAST(n AS DOUBLE) * x - sx AS dx,
        |    CAST(n AS DOUBLE) * y - sy AS dy
        |  FROM ev CROSS JOIN m)
        |SELECT event_id, x AS cents, y AS hour,
        |  (round((cyy * dx * dx - 2 * cxy * dx * dy + cxx * dy * dy) /
        |    (cxx * cyy - cxy * cxy), 4) + 0.0) AS maha2
        |FROM c ORDER BY maha2 DESC, event_id LIMIT 20""".stripMargin,
    "q372_preference_pairs" ->
      // q51's exact quality formula; argmax/argmin as the rank windows
      // the engine's max/min(struct) replaces, ties to the smaller id
      """WITH f AS (SELECT doc_id,
        |    CAST(length(text) AS DOUBLE) AS len,
        |    CAST(len(regexp_extract_all(text, '\S+')) AS DOUBLE) AS toks,
        |    CAST(len(regexp_extract_all(text, '[A-Za-z]')) AS DOUBLE) AS alpha,
        |    CAST(len(regexp_extract_all(lower(text), '\b(the|and|of|is|a)\b')) AS DOUBLE) AS stop
        |  FROM documents),
        |ql AS (SELECT doc_id, (round(
        |  (CASE WHEN len >= 100 AND len <= 10000 THEN CAST(1.0 AS DOUBLE) WHEN len >= 20 THEN CAST(0.5 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END) * CAST(0.4 AS DOUBLE)
        |  + (CASE WHEN len > 0 THEN alpha / len ELSE CAST(0.0 AS DOUBLE) END) * CAST(0.3 AS DOUBLE)
        |  + (CASE WHEN toks > 0 THEN least(stop / toks * CAST(5.0 AS DOUBLE), CAST(1.0 AS DOUBLE)) ELSE CAST(0.0 AS DOUBLE) END) * CAST(0.3 AS DOUBLE),
        |  4) + 0.0) AS quality FROM f),
        |j AS (SELECT d.source, q.doc_id, q.quality FROM documents d JOIN ql q USING (doc_id)),
        |r AS (SELECT source, doc_id, quality,
        |    row_number() OVER (PARTITION BY source ORDER BY quality DESC, doc_id) AS rb,
        |    row_number() OVER (PARTITION BY source ORDER BY quality ASC, doc_id) AS rw,
        |    count(*) OVER (PARTITION BY source) AS group_n FROM j),
        |b AS (SELECT source, doc_id AS chosen_id, quality AS q_chosen, group_n FROM r WHERE rb = 1),
        |w AS (SELECT source, doc_id AS rejected_id, quality AS q_rejected FROM r WHERE rw = 1)
        |SELECT b.source, b.chosen_id, w.rejected_id, b.q_chosen, w.q_rejected,
        |  (round(b.q_chosen - w.q_rejected, 4) + 0.0) AS margin,
        |  CAST(b.group_n AS BIGINT) AS group_n
        |FROM b JOIN w USING (source)
        |WHERE (round(b.q_chosen - w.q_rejected, 4) + 0.0) >= 0.3
        |ORDER BY b.source""".stripMargin,
    "q373_source_exclusive_vocab" ->
      // same tokenization; exclusivity from the per-type source count
      """WITH st AS (SELECT DISTINCT source, w FROM (
        |    SELECT source, unnest(regexp_split_to_array(lower(text), '\s+')) AS w
        |    FROM documents) t WHERE w <> ''),
        |pt AS (SELECT w, count(*) AS nsrc FROM st GROUP BY 1),
        |ins AS (SELECT source, count(*) AS types_in_source FROM st GROUP BY 1),
        |ex AS (SELECT st.source, count(*) AS exclusive_types
        |  FROM st JOIN pt ON pt.w = st.w AND pt.nsrc = 1 GROUP BY 1),
        |ct AS (SELECT count(*) AS corpus_types FROM pt)
        |SELECT ins.source, ins.types_in_source,
        |  COALESCE(ex.exclusive_types, 0) AS exclusive_types, ct.corpus_types,
        |  CAST(COALESCE(ex.exclusive_types, 0) * 10000 // ins.types_in_source AS BIGINT) AS exclusive_bp
        |FROM ins LEFT JOIN ex USING (source) CROSS JOIN ct
        |ORDER BY ins.source""".stripMargin,
    "q374_isotonic_calibration" ->
      // the same minimax identity, enumerated over the ≤10-bin frame
      """WITH ev AS (SELECT event_type = 'purchase' AS label,
        |    CAST(round(value * 100) AS BIGINT) AS cents
        |  FROM events WHERE value IS NOT NULL),
        |b AS (SELECT least(greatest(cents, 0) * 10 // 35000, 9) AS bin,
        |    count(*) AS n, sum(CASE WHEN label THEN 1 ELSE 0 END) AS pos
        |  FROM ev GROUP BY 1),
        |idx AS (SELECT bin, n, pos,
        |    row_number() OVER (ORDER BY bin) AS rn,
        |    sum(n) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING) AS cn,
        |    sum(pos) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING) AS cp FROM b),
        |pairs AS (SELECT j.rn AS jr, k.rn AS kr,
        |    CAST(k.cp - (j.cp - j.pos) AS DOUBLE) / CAST(k.cn - (j.cn - j.n) AS DOUBLE) AS a
        |  FROM idx j JOIN idx k ON j.rn <= k.rn),
        |tri AS (SELECT i.rn AS ir, i.bin, i.n, i.pos, p.jr, min(p.a) AS mn
        |  FROM idx i JOIN pairs p ON p.jr <= i.rn AND i.rn <= p.kr
        |  GROUP BY 1, 2, 3, 4, 5),
        |iso AS (SELECT ir, bin, n, pos, max(mn) AS iso FROM tri GROUP BY 1, 2, 3, 4)
        |SELECT CAST(bin AS BIGINT) AS bin, CAST(n AS BIGINT) AS n,
        |  CAST(pos AS BIGINT) AS pos,
        |  CAST(pos * 10000 // n AS BIGINT) AS raw_bp,
        |  CAST(round(iso * 10000) AS BIGINT) AS iso_bp
        |FROM iso ORDER BY bin""".stripMargin,
    "q375_jackknife_ratio" ->
      // identical per-day leave-one-out ratios, micro-quantized before
      // the exact Σq/Σq² fold; one sqrt on the 1-row frame
      """WITH d AS (SELECT strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS day,
        |    sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS v,
        |    sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS p
        |  FROM events GROUP BY 1),
        |t AS (SELECT count(*) AS n, CAST(sum(v) AS BIGINT) AS vt,
        |    CAST(sum(p) AS BIGINT) AS pt FROM d),
        |qv AS (SELECT n, vt, pt,
        |    CAST(round(CAST(pt - p AS DOUBLE) / CAST(vt - v AS DOUBLE) * 1000000) AS BIGINT) AS q
        |  FROM d CROSS JOIN t),
        |ag AS (SELECT n, vt, pt, CAST(sum(q) AS BIGINT) AS sq,
        |    CAST(sum(q * q) AS BIGINT) AS sq2 FROM qv GROUP BY 1, 2, 3)
        |SELECT n AS n_days, vt AS views, pt AS purchases,
        |  (round(CAST(pt AS DOUBLE) / CAST(vt AS DOUBLE), 6) + 0.0) AS ratio,
        |  (round(sqrt(CAST(n - 1 AS DOUBLE) / n *
        |    (CAST(sq2 AS DOUBLE) - CAST(sq AS DOUBLE) * sq / n)) / CAST(1000000 AS DOUBLE), 6) + 0.0) AS jk_se
        |FROM ag""".stripMargin,
    "q376_erasure_audit" ->
      // the same three artifacts recomputed from the base table; the
      // stale one must carry refs > 0
      """WITH tomb AS (SELECT DISTINCT user_id FROM events WHERE user_id % 37 = 0),
        |live AS (SELECT * FROM events
        |  WHERE user_id NOT IN (SELECT user_id FROM tomb)),
        |s AS (SELECT user_id FROM live GROUP BY user_id),
        |l AS (SELECT user_id FROM live GROUP BY user_id),
        |st AS (SELECT user_id FROM events GROUP BY user_id)
        |SELECT 'latest_live' AS artifact,
        |  (SELECT count(*) FROM l) AS n_rows,
        |  (SELECT count(*) FROM l WHERE user_id IN (SELECT user_id FROM tomb)) AS tombstoned_refs,
        |  (SELECT count(*) FROM l WHERE user_id IN (SELECT user_id FROM tomb)) = 0 AS clean
        |UNION ALL
        |SELECT 'sessions_live',
        |  (SELECT count(*) FROM s),
        |  (SELECT count(*) FROM s WHERE user_id IN (SELECT user_id FROM tomb)),
        |  (SELECT count(*) FROM s WHERE user_id IN (SELECT user_id FROM tomb)) = 0
        |UNION ALL
        |SELECT 'top_users_stale',
        |  (SELECT count(*) FROM st),
        |  (SELECT count(*) FROM st WHERE user_id IN (SELECT user_id FROM tomb)),
        |  (SELECT count(*) FROM st WHERE user_id IN (SELECT user_id FROM tomb)) = 0
        |ORDER BY artifact""".stripMargin,
    "q377_epoch_shuffle" ->
      // the global rank window IS what the two-phase rank replaces
      """WITH e1 AS (SELECT doc_id, (doc_id * 48271) % 2147483647 AS k FROM documents),
        |r1 AS (SELECT doc_id, row_number() OVER (ORDER BY k, doc_id) AS r FROM e1),
        |b1 AS (SELECT 1 AS epoch, (r - 1) // 64 AS batch, count(*) AS n_docs,
        |    CAST(sum(doc_id) AS BIGINT) AS id_sum
        |  FROM r1 WHERE (r - 1) // 64 < 4 GROUP BY 2),
        |e2 AS (SELECT doc_id, (doc_id * 16807) % 2147483647 AS k FROM documents),
        |r2 AS (SELECT doc_id, row_number() OVER (ORDER BY k, doc_id) AS r FROM e2),
        |b2 AS (SELECT 2 AS epoch, (r - 1) // 64 AS batch, count(*) AS n_docs,
        |    CAST(sum(doc_id) AS BIGINT) AS id_sum
        |  FROM r2 WHERE (r - 1) // 64 < 4 GROUP BY 2)
        |SELECT CAST(epoch AS BIGINT) AS epoch, CAST(batch AS BIGINT) AS batch,
        |  n_docs, id_sum
        |FROM (SELECT * FROM b1 UNION ALL SELECT * FROM b2) u
        |ORDER BY epoch, batch""".stripMargin,
    "q378_schema_compat" ->
      // the ledger is fully determined by the two batch schemas the
      // engine writes; the oracle pins the expected classification
      """SELECT * FROM (VALUES
        |  ('doc_id', TRUE, TRUE, 'bigint', 'bigint', 'unchanged', TRUE),
        |  ('lang', FALSE, TRUE, CAST(NULL AS VARCHAR), 'string', 'added', TRUE),
        |  ('n_chars', TRUE, TRUE, 'bigint', 'int', 'type_narrowed', FALSE),
        |  ('source', TRUE, FALSE, 'string', CAST(NULL AS VARCHAR), 'dropped', FALSE))
        |  t(field, in_old, in_new, old_type, new_type, change, read_compatible)
        |ORDER BY field""".stripMargin,
    "q379_pseudonymize" ->
      // the q53 byte-rolling hash of the peppered id string
      """WITH ev AS (SELECT user_id, list_reduce(
        |    list_transform(range(1, length(t) + 1),
        |      i -> CAST(ord(substr(t, CAST(i AS INT), 1)) AS BIGINT)),
        |    (a, b) -> (a * 31 + b) % 1000000007) AS token
        |  FROM (SELECT user_id, 'pepper-v1:' || CAST(user_id AS VARCHAR) AS t
        |        FROM events WHERE user_id IS NOT NULL) x)
        |SELECT token, count(*) AS n_events,
        |  count(DISTINCT user_id) = 1 AS injective
        |FROM ev GROUP BY 1 ORDER BY 1""".stripMargin,
    "q380_embedding_drift" ->
      // q288's micro-scaled strided projection; exact cross-multiplied
      // location gap, one rounded division for the scale ratio
      """WITH vecs AS (SELECT vec_id % 2 AS side, list_transform(range(0, 16),
        |    k -> CAST(round(CAST(embedding AS DOUBLE[])[CAST(k * 4 + 1 AS INT)] * 1000000) AS BIGINT)) AS p
        |  FROM embeddings),
        |pr AS (SELECT side, CAST(d.k AS BIGINT) AS dim, p[CAST(d.k + 1 AS INT)] AS m
        |  FROM vecs, LATERAL (SELECT unnest(range(0, 16)) AS k) d),
        |g AS (SELECT dim,
        |    CAST(sum(CASE WHEN side = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        |    CAST(sum(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
        |    CAST(sum(CASE WHEN side = 0 THEN m ELSE 0 END) AS BIGINT) AS sa,
        |    CAST(sum(CASE WHEN side = 1 THEN m ELSE 0 END) AS BIGINT) AS sb,
        |    CAST(sum(CASE WHEN side = 0 THEN abs(m) ELSE 0 END) AS BIGINT) AS aa,
        |    CAST(sum(CASE WHEN side = 1 THEN abs(m) ELSE 0 END) AS BIGINT) AS ab
        |  FROM pr GROUP BY 1)
        |SELECT dim, n_a, n_b,
        |  CAST(abs(sa * n_b - sb * n_a) AS BIGINT) AS mean_gap_x, aa, ab,
        |  CAST(round(CAST(ab AS DOUBLE) * n_a / (CAST(aa AS DOUBLE) * n_b) * 10000) AS BIGINT) AS scale_ratio_bp
        |FROM g ORDER BY dim""".stripMargin,
    "q381_join_ivm" ->
      // the oracle is the FULL from-scratch join — a green row proves the
      // delta algebra reproduced it exactly
      """SELECT c_nationkey, count(*) AS n_rows,
        |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sum_cents
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q382_cdc_chunking" ->
      // identical stateless boundary rule, chunk slicing, and per-chunk
      // byte-rolling fingerprints
      """WITH t AS (SELECT doc_id, text, length(text) AS n FROM documents),
        |bs AS (SELECT doc_id, text, n,
        |    list_filter(list_transform(range(4, n + 1), i ->
        |      CASE WHEN (ord(substr(text, CAST(i - 3 AS INT), 1)) * 29791 +
        |        ord(substr(text, CAST(i - 2 AS INT), 1)) * 961 +
        |        ord(substr(text, CAST(i - 1 AS INT), 1)) * 31 +
        |        ord(substr(text, CAST(i AS INT), 1))) % 64 = 0
        |      THEN i ELSE CAST(-1 AS BIGINT) END), x -> x > 0) AS b FROM t),
        |se AS (SELECT doc_id, text,
        |    list_prepend(CAST(1 AS BIGINT), list_transform(b, x -> x + 1)) AS st,
        |    list_append(b, CAST(n AS BIGINT)) AS en FROM bs),
        |ch0 AS (SELECT doc_id, unnest(list_transform(range(1, len(st) + 1),
        |    j -> substr(text, CAST(st[CAST(j AS INT)] AS INT),
        |      CAST(en[CAST(j AS INT)] - st[CAST(j AS INT)] + 1 AS INT)))) AS chunk
        |  FROM se),
        |ch AS (SELECT doc_id, least(length(chunk), 16777215) AS clen, list_reduce(
        |    list_transform(range(1, length(chunk) + 1),
        |      i -> CAST(ord(substr(chunk, CAST(i AS INT), 1)) AS BIGINT)),
        |    (a, b) -> (a * 31 + b) % 1000000007) AS fp
        |  FROM ch0 WHERE chunk <> '')
        |SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
        |  count(*) AS total_chunks,
        |  CAST(count(DISTINCT fp) AS BIGINT) AS distinct_chunks,
        |  CAST((count(*) - count(DISTINCT fp)) * 10000 // count(*) AS BIGINT) AS dup_bp,
        |  CAST(sum(clen) * 100 // count(*) AS BIGINT) AS mean_len_c
        |FROM ch""".stripMargin,
    "q383_join_size_estimate" ->
      // the same 3×64 sketches and inner product, fully arithmetic
      """WITH oc AS (SELECT o_orderkey AS k, count(*) AS c FROM orders GROUP BY 1),
        |lc AS (SELECT l_orderkey AS k, count(*) AS c FROM lineitem GROUP BY 1),
        |sd AS (SELECT * FROM (VALUES (0, 31, 7), (1, 131, 13), (2, 1031, 17)) v(rw, a, b)),
        |go AS (SELECT rw, (k * a + b) % 1000000007 % 64 AS cl_, sum(c) AS co
        |  FROM oc CROSS JOIN sd GROUP BY 1, 2),
        |gl AS (SELECT rw, (k * a + b) % 1000000007 % 64 AS cl_, sum(c) AS cl
        |  FROM lc CROSS JOIN sd GROUP BY 1, 2),
        |re AS (SELECT go.rw, CAST(sum(go.co * gl.cl) AS BIGINT) AS rowest
        |  FROM go JOIN gl ON gl.rw = go.rw AND gl.cl_ = go.cl_ GROUP BY 1),
        |est AS (SELECT CAST(min(rowest) AS BIGINT) AS cms_est FROM re),
        |ex AS (SELECT count(*) AS exact_rows FROM orders
        |  JOIN lineitem ON o_orderkey = l_orderkey)
        |SELECT exact_rows, cms_est,
        |  CAST((cms_est - exact_rows) * 10000 // exact_rows AS BIGINT) AS overest_bp
        |FROM ex CROSS JOIN est""".stripMargin,
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
    "q394_grid_radius_join" ->
      // same planted plane, same 9-cell halo, same exact integer dist²
      """WITH u AS (SELECT DISTINCT user_id FROM events WHERE user_id IS NOT NULL),
        |p AS (SELECT user_id, (user_id * 7919) % 1001 - 500 AS px,
        |    (user_id * 104729) % 1001 - 500 AS py FROM u),
        |c AS (SELECT user_id, px, py, (px + 500) // 200 AS cx, (py + 500) // 200 AS cy FROM p),
        |o AS (SELECT CAST(unnest([-1, 0, 1]) AS BIGINT) AS d),
        |pr AS (SELECT c.user_id AS u_a, px AS xa, py AS ya,
        |    cx + ox.d AS cx, cy + oy.d AS cy FROM c, o ox, o oy),
        |j AS (SELECT pr.u_a,
        |    (pr.xa - b.px) * (pr.xa - b.px) + (pr.ya - b.py) * (pr.ya - b.py) AS dist2
        |  FROM pr JOIN c b ON pr.cx = b.cx AND pr.cy = b.cy AND pr.u_a <> b.user_id)
        |SELECT u_a, count(*) AS n_neighbors, CAST(min(dist2) AS BIGINT) AS min_dist2,
        |  CAST(sum(dist2) AS BIGINT) AS sum_dist2
        |FROM j WHERE dist2 <= 22500 GROUP BY 1 ORDER BY 1""".stripMargin,
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
    "q310_pit_features" ->
      // the SEMANTICS as SQL: per label, aggregate the same user's
      // strictly-earlier events (a quadratic-per-user inequality join —
      // exactly what the engine's single-pass window replaces)
      """WITH lab AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase')
        |SELECT l.event_id, l.user_id,
        |  CAST(count(e.event_id) AS BIGINT) AS prior_events,
        |  CAST(coalesce(sum(CASE WHEN e.event_type = 'click' THEN 1 ELSE 0 END), 0) AS BIGINT) AS prior_clicks,
        |  CAST(coalesce(sum(CAST(floor(e.value * 1000000) AS BIGINT)), 0) AS BIGINT) AS prior_value_micros
        |FROM lab l LEFT JOIN events e ON e.user_id = l.user_id AND e.ts < l.ts
        |GROUP BY 1, 2 ORDER BY 1""".stripMargin,
    "q311_url_canonical" ->
      // every canonicalization step predicted arithmetically from the
      // doc_id residues that built the raw URL; same higher-order list
      // ops on the DuckDB side (list_filter / list_sort)
      """WITH raw AS (SELECT doc_id,
        |    'HTTPS://WWW.Example' || CAST(doc_id % 5 AS VARCHAR) ||
        |    '.COM:443/Path' || CAST(doc_id % 20 AS VARCHAR) ||
        |    '/item?utm_source=s' || CAST(doc_id AS VARCHAR) ||
        |    '&id=' || CAST(doc_id % 10 AS VARCHAR) ||
        |    '&ref=r' || CAST(doc_id % 3 AS VARCHAR) || '#frag' AS url
        |  FROM documents),
        |c AS (SELECT doc_id,
        |    regexp_replace(lower(regexp_extract(url, '^[A-Za-z]+://([^/:?#]+)', 1)), '^www\.', '') AS host,
        |    regexp_extract(url, '^[A-Za-z]+://[^/?#]+([^?#]*)', 1) AS path,
        |    array_to_string(list_sort(list_filter(string_split(regexp_extract(url, '\?([^#]*)', 1), '&'),
        |      p -> NOT starts_with(p, 'utm_') AND NOT starts_with(p, 'ref='))), '&') AS params
        |  FROM raw),
        |canon AS (SELECT doc_id, 'https://' || host || path ||
        |    CASE WHEN params = '' THEN '' ELSE '?' || params END AS canon_url FROM c)
        |SELECT canon_url, CAST(count(*) AS BIGINT) AS n_urls,
        |  CAST(min(doc_id) AS BIGINT) AS first_doc
        |FROM canon GROUP BY 1 ORDER BY 1""".stripMargin,
    "q305_vocab_coverage" ->
      // same tokenization as q103, same (freq desc, token) total order —
      // the oracle's global window IS what the two-phase rank replaces
      """WITH tok AS (SELECT unnest(regexp_split_to_array(lower(text), '\s+')) AS token FROM documents),
        |c AS (SELECT token, count(*) AS cnt FROM tok WHERE len(token) > 0 GROUP BY 1),
        |r AS (SELECT cnt, row_number() OVER (ORDER BY cnt DESC, token) AS rank FROM c),
        |t AS (SELECT CAST(sum(cnt) AS BIGINT) AS total_tokens FROM c),
        |vs AS (SELECT CAST(unnest([5, 10, 20]) AS BIGINT) AS vocab_size),
        |cov AS (SELECT vs.vocab_size, CAST(coalesce(sum(r.cnt), 0) AS BIGINT) AS covered_tokens
        |  FROM vs LEFT JOIN r ON r.rank <= vs.vocab_size GROUP BY 1)
        |SELECT cov.vocab_size, cov.covered_tokens, t.total_tokens,
        |  CAST((cov.covered_tokens * 10000) // t.total_tokens AS BIGINT) AS coverage_bp
        |FROM cov, t ORDER BY cov.vocab_size""".stripMargin,
    "q303_freshness_decay" ->
      // same data-derived anchor, same capped weekly buckets, same exact
      // dyadic scaling (cents << (16 − k)), same top-20 order
      """WITH a AS (SELECT max(CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS today FROM events),
        |e AS (SELECT user_id, CAST(round(value * 100, 0) AS BIGINT) AS cents,
        |    least(date_diff('day', CAST(CAST(ts AS TIMESTAMP) AS DATE), a.today) // 7, 16) AS k
        |  FROM events, a),
        |g AS (SELECT user_id,
        |    CAST(sum(cents * (CAST(1 AS BIGINT) << CAST(16 - k AS INT))) AS BIGINT) AS scaled
        |  FROM e GROUP BY 1)
        |SELECT user_id, scaled, (round(CAST(scaled AS DOUBLE) / 65536, 4) + 0.0) AS score
        |FROM g ORDER BY scaled DESC, user_id LIMIT 20""".stripMargin,
    "q301_spearman" ->
      // same per-user frame, same row_number total order (metric, user_id),
      // same six exact rank-moments, same fixed-order combine
      """WITH per AS (SELECT user_id, count(*) AS n_ev,
        |    CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS cents
        |  FROM events GROUP BY 1),
        |r AS (SELECT user_id,
        |    CAST(row_number() OVER (ORDER BY n_ev, user_id) AS BIGINT) AS ra,
        |    CAST(row_number() OVER (ORDER BY cents, user_id) AS BIGINT) AS rb FROM per),
        |s AS (SELECT count(*) AS n, CAST(sum(ra) AS BIGINT) AS sa, CAST(sum(rb) AS BIGINT) AS sb,
        |    CAST(sum(ra * rb) AS BIGINT) AS sab, CAST(sum(ra * ra) AS BIGINT) AS sa2,
        |    CAST(sum(rb * rb) AS BIGINT) AS sb2 FROM r)
        |SELECT CAST(n AS BIGINT) AS n_users,
        |  (round((CAST(n AS DOUBLE) * CAST(sab AS DOUBLE) - CAST(sa AS DOUBLE) * CAST(sb AS DOUBLE))
        |    / (sqrt(CAST(n AS DOUBLE) * CAST(sa2 AS DOUBLE) - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE))
        |       * sqrt(CAST(n AS DOUBLE) * CAST(sb2 AS DOUBLE) - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE))), 4) + 0.0) AS spearman
        |FROM s""".stripMargin,
    "q297_assortativity" ->
      // same degree pass, same six exact sums, same fixed-order combine
      """WITH e AS (SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
        |  FROM lineitem a JOIN lineitem b
        |  ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey),
        |deg AS (SELECT u, count(*) AS d FROM e GROUP BY 1),
        |xy AS (SELECT a.d AS dx, b.d AS dy FROM e
        |  JOIN deg a ON a.u = e.u JOIN deg b ON b.u = e.v),
        |s AS (SELECT count(*) AS n, CAST(sum(dx) AS BIGINT) AS sx,
        |    CAST(sum(dy) AS BIGINT) AS sy, CAST(sum(dx * dy) AS BIGINT) AS sxy,
        |    CAST(sum(dx * dx) AS BIGINT) AS sx2, CAST(sum(dy * dy) AS BIGINT) AS sy2
        |  FROM xy)
        |SELECT CAST(n AS BIGINT) AS n_edges,
        |  (round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |    / (sqrt(CAST(n AS DOUBLE) * CAST(sx2 AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |       * sqrt(CAST(n AS DOUBLE) * CAST(sy2 AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 4) + 0.0) AS assortativity
        |FROM s""".stripMargin,
    "q294_tfidf_pairs" ->
      // same df-capped vocabulary, same exact milli-nat weights, same
      // long-sum dots/norms, same fixed-order final cosine
      """WITH tokr AS (SELECT doc_id,
        |    unnest(list_filter(regexp_split_to_array(lower(text), '\s+'), t -> length(t) > 0)) AS w
        |  FROM documents),
        |tok AS (SELECT doc_id, w, count(*) AS tf FROM tokr GROUP BY 1, 2),
        |nd AS (SELECT count(DISTINCT doc_id) AS n FROM documents),
        |dft AS (SELECT w, count(DISTINCT doc_id) AS df FROM tok GROUP BY 1
        |  HAVING count(DISTINCT doc_id) <= 20),
        |wts AS (SELECT t.doc_id, t.w,
        |    t.tf * CAST(round(ln(CAST(nd.n AS DOUBLE) / CAST(d.df AS DOUBLE)) * 1000) AS BIGINT) AS wt
        |  FROM tok t JOIN dft d USING (w), nd),
        |norms AS (SELECT doc_id, CAST(sum(wt * wt) AS BIGINT) AS n2 FROM wts GROUP BY 1),
        |dots AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |    CAST(sum(a.wt * b.wt) AS BIGINT) AS dot
        |  FROM wts a JOIN wts b ON a.w = b.w AND a.doc_id < b.doc_id GROUP BY 1, 2),
        |c AS (SELECT id_a, id_b,
        |    (round(CAST(dot AS DOUBLE) / sqrt(CAST(na.n2 AS DOUBLE) * CAST(nb.n2 AS DOUBLE)), 4) + 0.0) AS cosine
        |  FROM dots JOIN norms na ON na.doc_id = dots.id_a
        |    JOIN norms nb ON nb.doc_id = dots.id_b)
        |SELECT id_a, id_b, cosine FROM c WHERE cosine >= 0.5
        |ORDER BY id_a, id_b""".stripMargin,
    "q284_sq8_search" ->
      // per-dim [min,max] → affine 0..255 codes (floor of three IEEE ops
      // both engines round identically), symmetric integer L2 over codes
      """WITH vecs AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vv FROM embeddings),
        |d AS (SELECT vec_id, CAST(s.i AS BIGINT) AS pos, vv[CAST(s.i + 1 AS INT)] AS v
        |  FROM vecs, LATERAL (SELECT unnest(range(0, 64)) AS i) s),
        |st AS (SELECT pos, min(v) AS mn, max(v) AS mx FROM d GROUP BY 1),
        |c AS (SELECT vec_id, pos,
        |    CASE WHEN mx = mn THEN 0
        |      ELSE least(255, greatest(0, CAST(floor((v - mn) * 255 / (mx - mn)) AS BIGINT)))
        |    END AS code
        |  FROM d JOIN st USING (pos)),
        |q AS (SELECT vec_id AS query_id, pos, code AS qc FROM c WHERE vec_id < 8),
        |sc AS (SELECT q.query_id, c.vec_id AS neighbor_id,
        |    CAST(sum((q.qc - c.code) * (q.qc - c.code)) AS BIGINT) AS sqdist
        |  FROM q JOIN c ON q.pos = c.pos AND c.vec_id <> q.query_id GROUP BY 1, 2),
        |r AS (SELECT query_id, neighbor_id, sqdist,
        |  CAST(row_number() OVER (PARTITION BY query_id ORDER BY sqdist, neighbor_id) AS BIGINT) AS rn FROM sc)
        |SELECT query_id, neighbor_id, sqdist, rn FROM r WHERE rn <= 5
        |ORDER BY query_id, rn""".stripMargin,
    "q285_shard_merge" ->
      // the MONOLITHIC nprobe=2 IVF search — equality with the Spark
      // side's merged-two-shard search IS the gate's merge-correctness
      // proof (shared quantizer ⇒ assignment is per-vector ⇒ union ≡ whole)
      """WITH vecs AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vv FROM embeddings),
        |cent AS (SELECT vec_id AS cell, vv AS cv FROM vecs WHERE vec_id < 16),
        |scored AS (SELECT x.vec_id, x.vv, c.cell,
        |  row_number() OVER (PARTITION BY x.vec_id ORDER BY
        |    list_dot_product(x.vv, c.cv) / (sqrt(list_dot_product(x.vv, x.vv)) * sqrt(list_dot_product(c.cv, c.cv))) DESC,
        |    c.cell) AS crn
        |  FROM vecs x CROSS JOIN cent c),
        |asg AS (SELECT vec_id, vv, cell FROM scored WHERE crn = 1),
        |q AS (SELECT vec_id AS query_id, vv AS qv, cell FROM scored WHERE vec_id < 8 AND crn <= 2),
        |s AS (SELECT q.query_id, a.vec_id AS neighbor_id,
        |  list_dot_product(q.qv, a.vv) / (sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(a.vv, a.vv))) AS cosine
        |  FROM q JOIN asg a ON a.cell = q.cell AND a.vec_id <> q.query_id),
        |r AS (SELECT query_id, neighbor_id, cosine,
        |  CAST(row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS BIGINT) AS rn FROM s)
        |SELECT query_id, neighbor_id, (round(cosine, 4) + 0.0) AS cosine, rn FROM r WHERE rn <= 5
        |ORDER BY query_id, rn""".stripMargin,
    "q286_mrr" ->
      // q277's exact top-5 chain, first label match per query, reciprocal
      // ranks as exact micro-unit integer divisions summed order-free
      """WITH vecs AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vv, label FROM embeddings),
        |q AS (SELECT vec_id AS query_id, vv AS qv, label AS ql FROM vecs WHERE vec_id < 8),
        |s AS (SELECT q.query_id, q.ql, x.vec_id AS neighbor_id, x.label AS nl,
        |  list_dot_product(q.qv, x.vv) / (sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(x.vv, x.vv))) AS cosine
        |  FROM q JOIN vecs x ON x.vec_id <> q.query_id),
        |r AS (SELECT query_id, ql, nl,
        |  row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rn FROM s),
        |fr AS (SELECT query_id, min(rn) AS first_rel_rn FROM r
        |  WHERE rn <= 5 AND nl = ql GROUP BY 1),
        |pq AS (SELECT q.query_id, coalesce(fr.first_rel_rn, 0) AS f
        |  FROM q LEFT JOIN fr USING (query_id))
        |SELECT CAST(count(*) AS BIGINT) AS n_queries,
        |  CAST(sum(CASE WHEN f = 0 THEN 0 ELSE 1000000 // f END) AS BIGINT) AS rr_micro_sum,
        |  (round(CAST(sum(CASE WHEN f = 0 THEN 0 ELSE 1000000 // f END) AS DOUBLE)
        |    / (CAST(count(*) AS DOUBLE) * 1000000.0), 4) + 0.0) AS mrr
        |FROM pq""".stripMargin,
    "q287_scene_cuts" ->
      // frame channel means predicted arithmetically (solid-color
      // indexed-palette GIF frames decode losslessly), then the same lag
      // deltas + threshold
      """WITH v AS (SELECT doc_id, n_chars % 6 + 4 AS nf, doc_id % 100 AS br,
        |    (doc_id * 7) % 200 AS bg FROM documents),
        |f AS (SELECT doc_id, br, bg, unnest(range(0, nf)) AS i FROM v),
        |c AS (SELECT doc_id, i, br + 4 * i + 60 * (i // 3) AS r,
        |    bg + 3 * i AS g, 10 + 5 * i AS b FROM f),
        |d AS (SELECT doc_id, i,
        |    abs(r - lag(r) OVER w) + abs(g - lag(g) OVER w) + abs(b - lag(b) OVER w) AS ds
        |  FROM c WINDOW w AS (PARTITION BY doc_id ORDER BY i))
        |SELECT doc_id, CAST(i AS BIGINT) AS frame_idx, CAST(ds AS BIGINT) AS delta_sum,
        |  CAST(CASE WHEN ds > 40 THEN 1 ELSE 0 END AS BIGINT) AS is_cut
        |FROM d WHERE ds IS NOT NULL ORDER BY doc_id, frame_idx""".stripMargin,
    "q288_embed_covariance" ->
      // the same exact micro-scaled moments; sum() returns HUGEINT so the
      // casts pin BIGINT; the cov display repeats the identical op order
      """WITH vecs AS (SELECT CAST(embedding AS DOUBLE[]) AS vv FROM embeddings),
        |m AS (SELECT list_transform(range(0, 16),
        |    k -> CAST(round(vv[CAST(k * 4 + 1 AS INT)] * 1000000) AS BIGINT)) AS p FROM vecs),
        |pr AS (SELECT CAST(i.k AS BIGINT) AS i, CAST(j.k AS BIGINT) AS j,
        |    p[CAST(i.k + 1 AS INT)] AS mi, p[CAST(j.k + 1 AS INT)] AS mj
        |  FROM m, LATERAL (SELECT unnest(range(0, 16)) AS k) i,
        |    LATERAL (SELECT unnest(range(0, 16)) AS k) j
        |  WHERE i.k <= j.k)
        |SELECT i, j, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(mi) AS BIGINT) AS sum_i, CAST(sum(mj) AS BIGINT) AS sum_j,
        |  CAST(sum(mi * mj) AS BIGINT) AS sum_ij,
        |  (round(CAST(sum(mi * mj) AS DOUBLE) / CAST(count(*) AS DOUBLE)
        |    - (CAST(sum(mi) AS DOUBLE) / CAST(count(*) AS DOUBLE))
        |      * (CAST(sum(mj) AS DOUBLE) / CAST(count(*) AS DOUBLE)), 4) + 0.0) AS cov_micro2
        |FROM pr GROUP BY 1, 2 ORDER BY i, j""".stripMargin,
    "q289_index_delete" ->
      // the monolithic nprobe=2 search over the TOMBSTONE-FILTERED corpus;
      // centroids stay the full parameter table (member deletion does not
      // retrain the quantizer)
      """WITH vecs AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vv FROM embeddings),
        |cent AS (SELECT vec_id AS cell, vv AS cv FROM vecs WHERE vec_id < 16),
        |scored AS (SELECT x.vec_id, x.vv, c.cell,
        |  row_number() OVER (PARTITION BY x.vec_id ORDER BY
        |    list_dot_product(x.vv, c.cv) / (sqrt(list_dot_product(x.vv, x.vv)) * sqrt(list_dot_product(c.cv, c.cv))) DESC,
        |    c.cell) AS crn
        |  FROM vecs x CROSS JOIN cent c),
        |asg AS (SELECT vec_id, vv, cell FROM scored WHERE crn = 1 AND vec_id % 7 <> 3),
        |q AS (SELECT vec_id AS query_id, vv AS qv, cell FROM scored
        |  WHERE vec_id < 8 AND vec_id % 7 <> 3 AND crn <= 2),
        |s AS (SELECT q.query_id, a.vec_id AS neighbor_id,
        |  list_dot_product(q.qv, a.vv) / (sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(a.vv, a.vv))) AS cosine
        |  FROM q JOIN asg a ON a.cell = q.cell AND a.vec_id <> q.query_id),
        |r AS (SELECT query_id, neighbor_id, cosine,
        |  CAST(row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS BIGINT) AS rn FROM s)
        |SELECT query_id, neighbor_id, (round(cosine, 4) + 0.0) AS cosine, rn FROM r WHERE rn <= 5
        |ORDER BY query_id, rn""".stripMargin,
    "q290_image_resize" ->
      // every source pixel predicted from the synthesis ramps, then the
      // same 2×2 integer box mean (sum // 4)
      """WITH px AS (SELECT doc_id, x, y,
        |    (doc_id + 3 * x + 5 * y) % 256 AS r,
        |    (doc_id * 7 + 2 * x + 7 * y) % 256 AS g,
        |    (doc_id * 3 + 4 * x + y) % 256 AS b
        |  FROM documents, LATERAL (SELECT unnest(range(0, 8)) AS x) xs,
        |    LATERAL (SELECT unnest(range(0, 6)) AS y) ys)
        |SELECT doc_id, CAST(x // 2 AS BIGINT) AS ox, CAST(y // 2 AS BIGINT) AS oy,
        |  CAST(sum(r) // 4 AS BIGINT) AS pr, CAST(sum(g) // 4 AS BIGINT) AS pg,
        |  CAST(sum(b) // 4 AS BIGINT) AS pb
        |FROM px GROUP BY 1, 2, 3 ORDER BY doc_id, oy, ox""".stripMargin,
    "q291_temperature_mix" ->
      // same map-side token count, same micro-quantized sqrt, same exact
      // integer shares
      """WITH d AS (SELECT source,
        |    len(list_filter(regexp_split_to_array(lower(text), '\s+'), t -> length(t) > 0)) AS tok
        |  FROM documents),
        |ps AS (SELECT source, CAST(sum(tok) AS BIGINT) AS n_tokens FROM d GROUP BY 1),
        |w AS (SELECT source, n_tokens,
        |  CAST(round(sqrt(CAST(n_tokens AS DOUBLE)) * 1000000) AS BIGINT) AS w_micro FROM ps),
        |t AS (SELECT sum(w_micro) AS wt FROM w)
        |SELECT source, n_tokens, w_micro,
        |  CAST((10000 * w_micro) // t.wt AS BIGINT) AS share_bp,
        |  CAST((100000 * w_micro) // t.wt AS BIGINT) AS alloc_tokens,
        |  CAST((((100000 * w_micro) // t.wt) * 10000) // n_tokens AS BIGINT) AS epochs_bp
        |FROM w, t ORDER BY source""".stripMargin,
    "q280_curation_matrix" ->
      // q204's scores terciled + the pair-graph node set as the dup flag
      // (a doc is a dup iff it appears in ANY pair — the closure added
      // nothing the edge endpoints don't already carry) + token mass
      s"""WITH scores AS ($q204Sql),
         |b AS (SELECT doc_id,
         |    CAST(ntile(3) OVER (ORDER BY avg_nll, doc_id) AS BIGINT) AS bucket
         |  FROM scores),
         |pairs AS ($q44Sql),
         |e AS MATERIALIZED (SELECT id_a AS src, id_b AS dst FROM pairs
         |      UNION SELECT id_b, id_a FROM pairs),
         |lab AS (SELECT DISTINCT src AS a FROM e),
         |tk AS (SELECT doc_id,
         |    CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS nt
         |  FROM documents)
         |SELECT b.bucket,
         |  CAST(CASE WHEN lab.a IS NULL THEN 0 ELSE 1 END AS BIGINT) AS is_dup,
         |  CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(tk.nt) AS BIGINT) AS total_tokens
         |FROM b LEFT JOIN lab ON lab.a = b.doc_id
         |JOIN tk ON tk.doc_id = b.doc_id
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q270_cluster_sizes" ->
      // q77's recursive closure, then size-of-cluster → count-of-size
      s"""WITH pairs AS MATERIALIZED ($q44Sql),
         |e AS MATERIALIZED (SELECT id_a AS src, id_b AS dst FROM pairs
         |      UNION SELECT id_b, id_a FROM pairs),
         |${minLabelCc()},
|lab AS (SELECT node AS a, lab AS component FROM l$ccRounds),
         |sz AS (SELECT component, count(*) AS s FROM lab GROUP BY 1)
         |SELECT s AS cluster_size, CAST(count(*) AS BIGINT) AS n_clusters
         |FROM sz GROUP BY s ORDER BY cluster_size""".stripMargin,
    "q265_incremental_components" ->
      // the full-recompute twin: q77's recursive closure over the WHOLE
      // corpus — equality here proves the incremental star-merge path
      s"""WITH pairs AS MATERIALIZED ($q44Sql),
         |e AS MATERIALIZED (SELECT id_a AS src, id_b AS dst FROM pairs
         |      UNION SELECT id_b, id_a FROM pairs),
         |${minLabelCc()},
|lab AS (SELECT node AS a, lab AS component FROM l$ccRounds)
         |SELECT a AS doc_id, component FROM lab ORDER BY doc_id""".stripMargin,
    "q266_stream_neardup" ->
      // survivors = docs that are id_b of NO pair; batch_id from the
      // ascending-id span the stager uses (ceil((max+1)/4))
      s"""WITH pairs AS ($q44Sql),
         |m AS (SELECT max(doc_id) AS mx FROM documents),
         |s AS (SELECT doc_id FROM documents
         |  WHERE doc_id NOT IN (SELECT id_b FROM pairs))
         |SELECT doc_id, CAST(doc_id // ((mx + 4) // 4) AS BIGINT) AS batch_id
         |FROM s, m ORDER BY doc_id""".stripMargin,
    "q77_neardup_components" ->
      s"""WITH pairs AS MATERIALIZED ($q44Sql),
         |e AS MATERIALIZED (SELECT id_a AS src, id_b AS dst FROM pairs
         |      UNION SELECT id_b, id_a FROM pairs),
         |${minLabelCc()},
|lab AS (SELECT node AS a, lab AS component FROM l$ccRounds)
         |SELECT a AS doc_id, component, component = a AS is_canonical
         |FROM lab ORDER BY doc_id""".stripMargin,
    "q48_simhash" -> q48Sql
  )
}
