package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Warehouse-maintenance operators: change-data-capture history building,
  * MERGE-style upserts, and interval coalescing. The reference materializes
  * its state by re-reading whole tables each cycle (`Data Collection/
  * Reddit.py:75-80` probes the full comment table to decide inserts); these
  * are the incremental, shuffle-bounded equivalents a 100 TB deployment
  * needs.
  *
  * Scale shapes: every operator here is one hash-partition by the entity key
  * followed by window passes that reuse that single exchange — no
  * self-joins, no driver state. Skew bound = events per entity, the same
  * bound the sessionizers already carry.
  */
object Warehouse {

  /** SCD type-2 history from an event stream: collapse consecutive
    * identical states per key, emit one row per state CHANGE with
    * `[valid_from, valid_to)` validity and an `is_current` flag for the
    * open row. Both window passes share one (key) partitioning; the lag
    * pass sees raw events, the lead pass only the change rows.
    *
    * `orderCols` must totally order events within a key (pass a tiebreak
    * id alongside the timestamp — same determinism rule as SURVEY §7.6). */
  def scd2Compact(events: DataFrame, keyCol: String, stateCol: String,
                  tsCol: String, tieCol: String): DataFrame = {
    val wRaw = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
    val changes = events
      .withColumn("__prev", lag(col(stateCol), 1).over(wRaw))
      .filter(col("__prev").isNull || col("__prev") =!= col(stateCol))
      .select(col(keyCol), col(stateCol).as("state"),
        col(tsCol).as("valid_from"), col(tieCol).as("__tie"))
    val wChanged = Window.partitionBy(col(keyCol)).orderBy(col("valid_from"), col("__tie"))
    changes
      .withColumn("valid_to", lead(col("valid_from"), 1).over(wChanged))
      .withColumn("is_current", col("valid_to").isNull)
      .drop("__tie")
  }

  /** MERGE INTO semantics as a batch operator: rows from `updates` override
    * matching `target` rows, unmatched updates insert, unmatched target rows
    * are kept — implemented as ONE full-outer join on the key with
    * coalesce-override on every value column, plus a `merge_action` audit
    * column (update/insert/keep). This is the lakehouse upsert the
    * reference's whole-table re-probe approximates.
    *
    * Both inputs must carry exactly (key, valueCols); at scale the join
    * shuffles on the key once — if `updates` is a small delta, Spark/AQE
    * broadcast it and the target never moves. */
  def mergeUpsert(target: DataFrame, updates: DataFrame, keyCol: String,
                  valueCols: Seq[String]): DataFrame = {
    val t = valueCols.foldLeft(target)((d, c) => d.withColumnRenamed(c, s"__t_$c"))
    val u = valueCols.foldLeft(updates)((d, c) => d.withColumnRenamed(c, s"__u_$c"))
    val merged = t.join(u, Seq(keyCol), "full_outer")
    val action = when(col(s"__u_${valueCols.head}").isNotNull &&
        col(s"__t_${valueCols.head}").isNotNull, "update")
      .when(col(s"__t_${valueCols.head}").isNull, "insert")
      .otherwise(lit("keep"))
    val values: Seq[Column] =
      valueCols.map(c => coalesce(col(s"__u_$c"), col(s"__t_$c")).as(c))
    merged.select(col(keyCol) +: values :+ action.as("merge_action"): _*)
  }

  /** Coalesce per-key point events into merged activity intervals
    * ("gaps and islands"): each event opens `[ts, ts + widthSec)`, and
    * overlapping/touching intervals fuse. All arithmetic is exact epoch
    * MICROSECONDS (longs) so the differential twin matches bit-for-bit;
    * three window passes (running-max end, island flag, island id) reuse a
    * single (key) exchange, then one hash agg per island. */
  def mergeIntervals(events: DataFrame, keyCol: String, tsCol: String,
                     widthSec: Int): DataFrame = {
    val width = widthSec * 1000000L
    val base = events.select(col(keyCol), unix_micros(col(tsCol)).as("s"))
      .withColumn("e", col("s") + width)
    val w = Window.partitionBy(col(keyCol)).orderBy(col("s"), col("e"))
    base
      .withColumn("__prev_max", max(col("e")).over(w.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("__new", when(col("__prev_max").isNull || col("s") > col("__prev_max"), 1L)
        .otherwise(0L))
      .withColumn("island", sum(col("__new")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col(keyCol), col("island"))
      .agg(timestamp_micros(min(col("s"))).as("start_ts"),
        timestamp_micros(max(col("e"))).as("end_ts"),
        (max(col("e")) - min(col("s"))).as("covered_us"))
  }

  /** Incremental aggregate maintenance (materialized-view refresh): merge a
    * previously materialized per-key aggregate state with the partial
    * aggregate of ONLY the new rows, producing exactly what a full recompute
    * over base ∪ delta would. Valid for decomposable measures: counts and
    * sums merge by addition (`sumCols` — pass counts here too), min/max by
    * least/greatest. Keys absent from one side keep the other side's state.
    *
    * This is THE refresh pattern at 100 TB: the historical aggregate is
    * never rescanned — only the new partition gets a (map-side-combined)
    * aggregation, then ONE key join merges states; when the delta is a
    * day's slice against years of history, AQE broadcasts it and the base
    * never moves. The reference re-reads whole tables each cycle
    * (Data Collection/Reddit.py:75-80) — this replaces that rescan. */
  def mergeAggStates(base: DataFrame, delta: DataFrame, keyCol: String,
                     sumCols: Seq[String], minCols: Seq[String] = Nil,
                     maxCols: Seq[String] = Nil): DataFrame = {
    val vals = sumCols ++ minCols ++ maxCols
    val b = vals.foldLeft(base)((d, c) => d.withColumnRenamed(c, s"__b_$c"))
    val u = vals.foldLeft(delta)((d, c) => d.withColumnRenamed(c, s"__d_$c"))
    def bc(c: String) = col(s"__b_$c")
    def dc(c: String) = col(s"__d_$c")
    // null-safe merges: coalesce pairs (not least/greatest alone) so the
    // semantics don't depend on either engine's NULL handling in least()
    val merged: Seq[Column] =
      sumCols.map(c => (coalesce(bc(c), lit(0L)) + coalesce(dc(c), lit(0L))).as(c)) ++
      minCols.map(c => least(coalesce(bc(c), dc(c)), coalesce(dc(c), bc(c))).as(c)) ++
      maxCols.map(c => greatest(coalesce(bc(c), dc(c)), coalesce(dc(c), bc(c))).as(c))
    b.join(u, Seq(keyCol), "full_outer")
      .select(col(keyCol) +: merged: _*)
  }

  /** Snapshot-diff change-data-capture: given two snapshots of the same
    * keyed table, emit one row per changed key with `change_type` ∈
    * {insert, update, delete} plus the old and new values of every compared
    * column. This is the feed that keeps downstream marts incremental when
    * the upstream only publishes full snapshots (the reference's collectors
    * re-pull whole comment tables each cycle — diffing the pulls is what
    * turns that into a delta stream).
    *
    * Scale shape: ONE full-outer hash join on the key; change detection is a
    * map-side null-safe comparison (`<=>` so NULL→value and value→NULL count
    * as changes without special-casing), and unchanged keys are filtered
    * before anything else sees them — at 100 TB the output is sized by the
    * churn rate, not the table. No windows, no driver state.
    */
  def cdcDiff(oldSnap: DataFrame, newSnap: DataFrame, keyCol: String,
              compareCols: Seq[String]): DataFrame = {
    val o = compareCols.foldLeft(oldSnap)((d, c) => d.withColumnRenamed(c, s"__o_$c"))
    val n = compareCols.foldLeft(newSnap)((d, c) => d.withColumnRenamed(c, s"__n_$c"))
    // presence markers survive the outer join where key columns alone can't
    // distinguish "absent" from "present with NULLs"
    val j = o.withColumn("__in_old", lit(true))
      .join(n.withColumn("__in_new", lit(true)), Seq(keyCol), "full_outer")
    // no compare columns = presence-only diffing: inserts/deletes only,
    // a matched key is never an update
    val changed = compareCols
      .map(c => !(col(s"__o_$c") <=> col(s"__n_$c")))
      .reduceOption(_ || _).getOrElse(lit(false))
    val outCols =
      col(keyCol) +: col("change_type") +:
        compareCols.flatMap(c => Seq(
          col(s"__o_$c").as(s"old_$c"), col(s"__n_$c").as(s"new_$c")))
    j.withColumn("change_type",
        when(col("__in_old").isNull, lit("insert"))
          .when(col("__in_new").isNull, lit("delete"))
          .otherwise(lit("update")))
      .filter(col("change_type") =!= "update" || changed)
      .select(outCols: _*)
  }

  /** Point-in-time dimension lookup — the SCD2 CONSUMER: each fact row is
    * enriched with the dimension version whose half-open validity window
    * `[valid_from, valid_to)` contains the fact's timestamp (open-ended
    * current versions match everything from `valid_from` on). Joining facts
    * to "current state" silently time-travels attributes backwards; this is
    * the join that makes historical aggregates honest.
    *
    * Plan shape: an EQUI join on the key with the validity window as a
    * residual filter — one key-hash exchange each side; per-key fan-out is
    * facts × versions WITHIN the key before the residual prunes to ≤ 1 match
    * (versions are non-overlapping), so per-key cost is bounded by that
    * key's version count, not the table. A key whose version history is
    * itself huge wants the as-of formulation ([[graft.ops.Relational
    * .asOfJoin]]: union + one window) — same semantics when `valid_to` is
    * derived from the next `valid_from`, which [[scd2Compact]] guarantees.
    * Facts with no valid version (before the key's first state) survive
    * with a NULL state, left-join semantics.
    *
    * The dim's columns are aliased to reserved `__`-prefixed names for the
    * join (same convention as `__dk`), so a facts side that itself carries
    * `state`/`valid_from`/`valid_to` keeps them untouched — only the
    * enrichment column is renamed back to `state` on output (if the facts
    * side also has `state`, the result carries both and the caller
    * disambiguates by position/alias, rather than having its column
    * silently dropped). */
  def pointInTimeLookup(facts: DataFrame, dim: DataFrame, keyCol: String,
                        tsCol: String): DataFrame = {
    val d = dim.select(col(keyCol).as("__dk"), col("state").as("__dstate"),
      col("valid_from").as("__dvf"), col("valid_to").as("__dvt"))
    facts.join(d,
      facts(keyCol) === col("__dk") &&
        col("__dvf") <= facts(tsCol) &&
        (col("__dvt").isNull || facts(tsCol) < col("__dvt")),
      "left")
      .drop("__dk", "__dvf", "__dvt")
      .withColumnRenamed("__dstate", "state")
  }

  /** Survivorship merge (golden record): collapse a key's update stream to
    * one row carrying, per column, the LAST NON-NULL value in
    * (orderCol, tieCol) order — the MDM "best version of the truth" rule.
    * q97 keeps the latest whole ROW; this survives per COLUMN, so a field
    * absent from the newest update falls back to the freshest update that
    * had it. Emits `n_versions` for lineage.
    *
    * Scale shape: both windows (full-frame fill + latest-row rank) share
    * the key-hash partitioning — ONE exchange, no join; per-key state is
    * the key's version run, never the table. */
  def goldenRecord(updates: DataFrame, keyCol: String, orderCol: String,
                   tieCol: String, valueCols: Seq[String]): DataFrame = {
    require(valueCols.nonEmpty, "goldenRecord needs at least one value column")
    val full = Window.partitionBy(col(keyCol))
      .orderBy(col(orderCol), col(tieCol))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val latest = Window.partitionBy(col(keyCol))
      .orderBy(col(orderCol).desc, col(tieCol).desc)
    val filled = valueCols.foldLeft(updates) { (d, c) =>
      d.withColumn(s"__g_$c", last(col(c), ignoreNulls = true).over(full))
    }
    filled
      .withColumn("__nv", count(lit(1)).over(full))
      .withColumn("__rn", row_number().over(latest))
      .filter(col("__rn") === 1)
      .select(col(keyCol) +: valueCols.map(c => col(s"__g_$c").as(c))
        :+ col("__nv").cast("long").as("n_versions"): _*)
  }
}
