package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-corpus curation: deterministic sampling / data mixing.
  *
  * Pretraining mixes draw per-stratum quotas (per language, per source).
  * `rand()` cannot back a differential-tested or reproducible pipeline, so
  * ordering uses a multiplicative-hash pseudo-shuffle of the id — a fixed
  * permutation both engines (and reruns) agree on. At 100 TB the quota
  * window is per-stratum: each partition ranks only its own stratum's rows.
  */
object Curation {

  /** Knuth-style multiplicative scramble of an integer id onto [0, 1000003):
    * deterministic, uniform-ish, and expressible in plain SQL. The id is
    * reduced mod 1000003 BEFORE the multiply — algebraically identical
    * (ab mod m = ((a mod m)b) mod m) but overflow-free for the entire long
    * domain (the product stays < 2^51, vs id·2654435761 overflowing at
    * id ≈ 2^31.7, where Spark would silently wrap while DuckDB raises). */
  def pseudoShuffleKey(id: Column): Column =
    ((id % lit(1000003L)) * lit(2654435761L)) % lit(1000003L)

  /** Keep at most `quota` rows per stratum, chosen by the pseudo-shuffle
    * order (id tie-break). Deterministic alternative to
    * `df.sampleBy(strataCol, fractions, seed)` when exact per-stratum counts
    * and engine-independent reproducibility matter. */
  def stratifiedSample(df: DataFrame, strataCol: String, idCol: String,
                       quota: Int): DataFrame = {
    val w = Window.partitionBy(col(strataCol))
      .orderBy(pseudoShuffleKey(col(idCol)), col(idCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= quota)
      .drop("__rn")
  }

  /** Weighted mixture: per-stratum quotas from a weight map scaled to a
    * total budget (floor allocation; strata missing from `weights` get 0). */
  def weightedMixture(df: DataFrame, strataCol: String, idCol: String,
                      weights: Map[String, Double], totalBudget: Long): DataFrame = {
    val wSum = weights.values.sum
    val quotaCol = weights.foldLeft(lit(0L): Column) { case (acc, (s, wt)) =>
      when(col(strataCol) === s, lit(math.floor(totalBudget * wt / wSum).toLong)).otherwise(acc)
    }
    val w = Window.partitionBy(col(strataCol))
      .orderBy(pseudoShuffleKey(col(idCol)), col(idCol))
    df.withColumn("__quota", quotaCol)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= col("__quota"))
      .drop("__quota", "__rn")
  }
}
