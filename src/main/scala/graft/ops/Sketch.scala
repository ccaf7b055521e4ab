package graft.ops

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Streaming-sketch operators: sublinear-state summaries with EXACT final
  * answers (sketch proposes, exact pass disposes).
  *
  * The scale rationale: a naive heavy-hitter query shuffles the full
  * (item, partial count) vocabulary — at 100 TB that exchange is the job.
  * A per-partition Misra–Gries summary holds k counters regardless of
  * partition size, its keys are a PROVABLE superset of every global heavy
  * hitter, and only candidate items pay the exact-recount shuffle — the
  * exchange shrinks from |vocabulary| to ≤ k·P rows while the final output
  * stays exact (no sketch estimates ever surface).
  */
object Sketch {

  /** Misra–Gries summary of one iterator with k counters: on overflow every
    * counter decrements (the "pair up and cancel" step), so any item whose
    * true frequency exceeds n/(k+1) MUST end with a positive counter.
    * Returned counts are residuals (underestimates) — used only as
    * candidates, never as answers. */
  private[graft] def misraGries(items: Iterator[String], k: Int): mutable.Map[String, Long] = {
    val counters = mutable.Map.empty[String, Long]
    items.foreach { item =>
      if (counters.contains(item)) counters(item) += 1L
      else if (counters.size < k) counters(item) = 1L
      else {
        // decrement-all: retain keys lazily, drop zeros
        val dead = mutable.ArrayBuffer.empty[String]
        counters.keysIterator.foreach { key =>
          val next = counters(key) - 1L
          if (next == 0L) dead += key else counters(key) = next
        }
        dead.foreach(counters.remove)
      }
    }
    counters
  }

  /** Exact heavy hitters: every distinct value of `itemCol` whose frequency
    * is ≥ `shareBp` basis points of the total, with its EXACT count and
    * share. Two passes over a checkpointed item frame:
    *
    *  1. map-side Misra–Gries per partition (k = 2·10000/shareBp counters —
    *     2× the information-theoretic minimum, so the superset guarantee
    *     freq > n/(k+1) ⇒ sketched holds with margin). If an item is in NO
    *     partition's sketch, then per-partition freq_p ≤ n_p/(k+1) sums to
    *     freq ≤ n/(k+1) < threshold — the union of sketch keys (≤ k·P rows,
    *     collected as driver metadata like a file manifest) misses no
    *     answer. The candidate set varies with partitioning; the FINAL
    *     output never does.
    *  2. exact recount of candidate items only: a broadcast isin filter
    *     prunes the corpus BEFORE the exchange, so the groupBy shuffles
    *     candidate rows, not the vocabulary.
    *
    * Driver-memory bound: the raw candidate union is ≤ k·P rows (P =
    * partitions of the checkpointed frame) — with a 10 bp threshold on
    * 10⁵ partitions that is a 2·10⁸-row collect, too big to leave
    * implicit. So the collect is PRE-PRUNED by one hash aggregate over
    * the sketch rows themselves: Misra–Gries counters are underestimates
    * by at most n_p/(k+1) per partition, so a true heavy hitter's
    * summed residual is ≥ minCnt − n/(k+1) — candidates below that
    * margin are provably light and never reach the driver. The pruned
    * set is ≤ n/(minCnt − n/(k+1)) < 2·(k+1) items ≈ answer-sized,
    * INDEPENDENT of partition count; the aggregate itself shuffles
    * ≤ k·P sketch rows, never the corpus.
    *
    * Output: (item, cnt, share_bp) — all exact longs, floor-divided bp. */
  def heavyHitters(items: Dataset[String], shareBp: Long): DataFrame = {
    require(shareBp >= 1 && shareBp <= 10000, s"shareBp out of range: $shareBp")
    val spark = items.sparkSession
    import spark.implicits._
    val k = math.max(1, (2L * 10000L / shareBp).toInt)
    val toks = items.toDF("item").localCheckpoint()
    val n = toks.count()
    if (n == 0) return toks.select(col("item"), lit(0L).as("cnt"), lit(0L).as("share_bp"))
    // threshold in counts, ceil-divided so share_bp ≥ shareBp exactly
    val minCnt = (n * shareBp + 9999L) / 10000L
    // per-partition sketches → summed residuals → margin filter → driver.
    // Safe: Σ_p mg_p(x) ≥ freq(x) − Σ_p n_p/(k+1) = freq(x) − n/(k+1).
    val slack = n / (k + 1)
    val candidates = toks.as[String]
      .mapPartitions(it => misraGries(it, k).iterator)
      .toDF("item", "mg")
      .groupBy(col("item")).agg(sum(col("mg")).as("mg"))
      .filter(col("mg") >= math.max(minCnt - slack, 1L))
      .select("item").as[String].collect()
    toks.filter(col("item").isin(candidates.toIndexedSeq: _*))
      .groupBy(col("item")).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= minCnt)
      .withColumn("share_bp", expr(s"(10000 * cnt) div ${n}L"))
  }
}
