package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Data-quality profiling: the "look before you train" summary a pipeline
  * runs over every new table drop (the reference eyeballs its Postgres tables
  * by hand; at 100 TB the profile IS the eyeball).
  *
  * Scale shape: TWO aggregation passes, deliberately split by buffer type.
  * String min/max buffers are immutable, so any aggregate containing them
  * falls back to SortAggregate — fused with the count-distincts that means
  * SORTING the (n+1)-way Expand of the whole table (measured 1.76 s at
  * sf0.1). Split, the distinct pass keeps all-long buffers and plans as
  * Expand + two-phase HashAggregate, and the null/min/max pass is a single
  * global aggregate with NO expand and NO sort (empty grouping keys need no
  * ordering). Both 1-row results cross-join and `stack`-unpivot into one row
  * per column; measured 1.9× faster than the fused form (1.76 s → 0.92 s at
  * sf0.1), and the same split wins at any scale — one extra scan is cheaper
  * than sorting an expanded table. Nothing ever collects wide.
  *
  * min/max surface as strings so heterogeneous columns share one schema —
  * profiled columns must be string/integer typed (float formatting is
  * engine-specific; profile floats via their cents/quantized twin instead).
  */
object Profiling {

  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    val statAggs = cols.flatMap { c =>
      Seq(
        // coalesce: sum over an EMPTY table is NULL while the oracle's
        // coalesce(..., 0) reports 0 — keep the engines aligned on empties
        coalesce(sum(when(col(c).isNull, 1L).otherwise(0L)), lit(0L)).as(s"__null_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
    }
    val distAggs = cols.map(c => count_distinct(col(c)).as(s"__dist_$c"))
    val stackArgs = cols.map(c =>
      s"'$c', __null_$c, __dist_$c, __min_$c, __max_$c").mkString(", ")
    df.agg(statAggs.head, statAggs.tail: _*)
      .crossJoin(df.agg(distAggs.head, distAggs.tail: _*))
      .select(expr(
        s"stack(${cols.size}, $stackArgs) AS (col_name, n_null, n_distinct, min_value, max_value)"))
  }

  /** Declarative data-quality expectations, ALL evaluated in one scan — the
    * ingest-gate audit (Deequ / DLT-expectations shape): each rule is a
    * boolean Column; a row PASSES a rule only when it evaluates TRUE — NULL
    * fails (a rule that can't be decided on a row is strict-failed, so a
    * null-riddled column can never "pass" a range check by vacuous
    * three-valued logic; wrap a rule in `coalesce`/`isNull` handling to
    * opt out).
    *
    * Scale shape: the whole rule set is ONE global aggregate (each rule a
    * conditional sum — partial map-side, one 1-row result), then a
    * literal-array explode into one row per rule: N rules over 100 TB cost
    * one scan, not N. Output: (rule, violations, total, pass_bp) with the
    * pass rate as exact floor-divided basis points, ordered by the caller.
    */
  def expectations(df: DataFrame, rules: Seq[(String, org.apache.spark.sql.Column)]): DataFrame = {
    require(rules.nonEmpty, "expectations: at least one rule required")
    require(rules.map(_._1).distinct.size == rules.size,
      "expectations: rule names must be unique")
    val aggs = rules.map { case (name, rule) =>
      coalesce(sum(when(coalesce(rule, lit(false)), 0L).otherwise(1L)), lit(0L))
        .as(s"__v_$name")
    } :+ count(lit(1)).as("__total")
    df.agg(aggs.head, aggs.tail: _*)
      .select(col("__total"), explode(array(rules.map { case (name, _) =>
        struct(lit(name).as("rule"), col(s"__v_$name").as("violations"))
      }: _*)).as("__r"))
      .select(col("__r.rule").as("rule"), col("__r.violations").as("violations"),
        col("__total").as("total"),
        when(col("__total") > 0,
          expr("(10000 * (__total - __r.violations)) div __total"))
          .otherwise(lit(0L)).as("pass_bp"))
  }

  /** Robust per-group outlier detection via median absolute deviation — the
    * heavy-tail-safe alternative to the q90 z-score (one genuine spike day
    * inflates a mean AND its std enough to mask itself; the median/MAD pair
    * is breakdown-50% robust). A row is an outlier when
    * |value − median| > k · MAD (k defaults to the conventional 3).
    *
    * Determinism: values must be integer-derived (counts, cents). The exact
    * interpolating `percentile` then lands on halves, deviations on halves,
    * MAD on quarters — all exact in double and bit-equal to DuckDB's
    * `median`/`quantile_cont`, so comparisons and output need no rounding.
    *
    * Scale shape: two grouped EXACT percentiles (group cardinality is the
    * profile dimension — event types, days-per-key — small by construction;
    * a 100 TB deployment with huge groups swaps in `approx_percentile` at
    * the cost of the oracle) and two BROADCAST joins of group-sized stat
    * frames back onto the fact side — the fact table never reshuffles. */
  /** Per-group winsorization: clip `valueCol` (an exact integer unit —
    * cents, counts) to that group's [loQ, hiQ] DISCRETE percentiles — the
    * standard outlier treatment before moment-based stats (a mean over
    * winsorized values is robust without discarding rows, unlike trimming).
    *
    * Determinism: `percentile_disc` (the SQL-standard smallest-value-with-
    * cume_dist ≥ q, = DuckDB `quantile_disc`) returns an ACTUAL element, so
    * cut points, clipped values, and their sums all stay exact longs — no
    * float interpolation anywhere, hence no cross-engine ulp risk (the
    * interpolating `percentile` would put engine-private FMA ordering inside
    * the cut value). Scale shape: one grouped percentile pass (both
    * cutpoints in ONE aggregate) BROADCAST back; the fact side never
    * reshuffles. */
  def winsorize(df: DataFrame, groupCol: String, valueCol: String,
                loQ: Double = 0.05, hiQ: Double = 0.95): DataFrame = {
    require(loQ >= 0 && hiQ <= 1 && loQ < hiQ, s"bad quantiles [$loQ, $hiQ]")
    // percentile_disc surfaces as DOUBLE; the value is an actual element, so
    // the cast back to long is exact (integer units stay < 2^53)
    val cuts = df.groupBy(col(groupCol))
      .agg(expr(s"percentile_disc($loQ) WITHIN GROUP (ORDER BY $valueCol)")
        .cast("long").as("__lo"),
        expr(s"percentile_disc($hiQ) WITHIN GROUP (ORDER BY $valueCol)")
          .cast("long").as("__hi"))
    df.join(broadcast(cuts), Seq(groupCol))
      .withColumn("winsorized", greatest(least(col(valueCol), col("__hi")), col("__lo")))
      .withColumn("clipped_low", col(valueCol) < col("__lo"))
      .withColumn("clipped_high", col(valueCol) > col("__hi"))
      .drop("__lo", "__hi")
  }

  def madOutliers(df: DataFrame, groupCol: String, valueCol: String,
                  k: Double = 3.0): DataFrame = {
    val med = df.groupBy(col(groupCol))
      .agg(expr(s"percentile($valueCol, 0.5)").as("med"))
    val dev = df.join(broadcast(med), Seq(groupCol))
      .withColumn("__dev", abs(col(valueCol).cast("double") - col("med")))
    val mad = dev.groupBy(col(groupCol))
      .agg(expr("percentile(__dev, 0.5)").as("mad"))
    dev.join(broadcast(mad), Seq(groupCol))
      .withColumn("is_outlier", col("__dev") > col("mad") * lit(k))
      .drop("__dev")
  }

  /** Benford first-digit audit over a positive integer amount column —
    * the fabricated-data smoke test (organic monetary amounts follow
    * log10(1 + 1/d); synthetic or truncated feeds don't). Emits, per
    * leading digit: the exact count, its share in basis points, the
    * Benford-expected share, and the signed gap. The digit is the first
    * character of the decimal rendering — a string op both engines spell
    * identically, with no float log in the bucketing path; the only
    * doubles are the 4-dp expected-share constants (same formula text on
    * the oracle side).
    *
    * Scale shape: one 9-group count aggregate with map-side combine; the
    * global total rides a window over the 9-row result, never a second
    * scan. */
  /** Cross-table referential-integrity audit: for each declared
    * (child.fk → parent.pk) relation, the row count and the ORPHAN count
    * (non-null child keys with no parent) — the warehouse contract check
    * that runs after every load and before anything joins on trust.
    * NULL child keys are excluded by contract (a null FK is "no
    * reference", not a broken one — same convention as SQL's FK
    * constraints).
    *
    * Scale shape: per relation ONE left join of the projected child key
    * column against the DISTINCT parent key set (broadcast when the
    * parent key set is dimension-sized, hash join otherwise) and one
    * count aggregate — the child table never carries more than the key
    * across the wire. Output: one row per declared relation. */
  def fkAudit(relations: Seq[(String, DataFrame, String, DataFrame, String)]): DataFrame = {
    // reduce over unionByName would throw a bare UnsupportedOperationException
    // on an empty list — make the contract explicit
    require(relations.nonEmpty, "fkAudit: at least one relation is required")
    relations.map { case (name, child, fkCol, parent, pkCol) =>
      val p = parent.select(col(pkCol).as("__fk")).distinct()
        .withColumn("__hit", lit(1))
      child.select(col(fkCol).as("__fk")).filter(col("__fk").isNotNull)
        .join(p, Seq("__fk"), "left")
        .agg(count(lit(1)).as("__n"),
          sum(when(col("__hit").isNull, 1L).otherwise(0L)).as("__o"))
        .select(lit(name).as("relation"), col("__n").cast("long").as("n_rows"),
          col("__o").cast("long").as("n_orphans"),
          (col("__o") === 0).as("intact"))
    }.reduce(_ unionByName _)
  }

  def benford(df: DataFrame, amountCol: String): DataFrame = {
    val digits = df
      .filter(col(amountCol) > 0)
      .select(substring(col(amountCol).cast("string"), 1, 1).cast("long").as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("n"))
    val total = Window.partitionBy()
    digits
      .withColumn("__tot", sum(col("n")).over(total))
      .select(col("digit"), col("n").cast("long").as("n"),
        expr("(10000 * n) div __tot").as("share_bp"),
        Num.roundz(log10(lit(1.0) + lit(1.0) / col("digit")) * 10000, 4)
          .as("expected_bp"))
      .withColumn("gap_bp",
        Num.roundz(col("share_bp").cast("double") - col("expected_bp"), 4))
  }
}
