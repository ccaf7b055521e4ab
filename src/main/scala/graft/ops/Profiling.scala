package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data-quality profiling: the "look before you train" summary a pipeline
  * runs over every new table drop (the reference eyeballs its Postgres tables
  * by hand; at 100 TB the profile IS the eyeball).
  *
  * Scale shape: ONE aggregation pass computes every column's metrics
  * simultaneously — null count, distinct count, min, max — then a `stack`
  * unpivot turns the single wide row into one row per column. The multiple
  * count-distincts expand the input (one replica per distinct-agg, Spark's
  * standard expand plan) but partial aggregation collapses each replica
  * map-side before the one shuffle; nothing ever collects wide.
  *
  * min/max surface as strings so heterogeneous columns share one schema —
  * profiled columns must be string/integer typed (float formatting is
  * engine-specific; profile floats via their cents/quantized twin instead).
  */
object Profiling {

  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap { c =>
      Seq(
        // coalesce: sum over an EMPTY table is NULL while the oracle's
        // coalesce(..., 0) reports 0 — keep the engines aligned on empties
        coalesce(sum(when(col(c).isNull, 1L).otherwise(0L)), lit(0L)).as(s"__null_$c"),
        count_distinct(col(c)).as(s"__dist_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
    }
    val stackArgs = cols.map(c =>
      s"'$c', __null_$c, __dist_$c, __min_$c, __max_$c").mkString(", ")
    df.agg(aggs.head, aggs.tail: _*)
      .select(expr(
        s"stack(${cols.size}, $stackArgs) AS (col_name, n_null, n_distinct, min_value, max_value)"))
  }
}
