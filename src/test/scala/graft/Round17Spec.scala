package graft

import org.apache.spark.sql.functions._

/** Operator-level checks for the round-17 keys beyond the DuckDB gate. */
class Round17Spec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("q458: the rule closes q307's selective-filter recall gap (>= 0.85 every leg)") {
    val rows = SparkEntry.queries("q458_adaptive_nprobe")(spark, sf)
      .select("leg", "sel_bp", "nprobe", "recall")
      .as[(String, Long, Long, Double)].collect()
    assert(rows.map(_._1).toSeq ==
      Seq("l1_all", "l2_mild", "l3_half", "l4_narrow"))
    rows.foreach { case (leg, _, _, recall) =>
      assert(recall >= 0.85, s"$leg recall $recall — the rule must hold the floor")
    }
    // the widths must follow the rule, monotone in selectivity, and the
    // narrow leg must saturate to the exact pre-filtered fallback
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val total = emb.count()
    val keptByLeg = Map(
      "l1_all" -> total,
      "l2_mild" -> emb.filter(col("label") <= 6).count(),
      "l3_half" -> emb.filter(col("label") <= 4).count(),
      "l4_narrow" -> emb.filter(col("label") === 2).count())
    rows.foreach { case (leg, selBp, np, _) =>
      val kept = keptByLeg(leg)
      assert(selBp == 10000L * kept / total, s"$leg sel_bp")
      assert(np == RegistryRound17.adaptiveNprobe(total, kept, 16L).toLong,
        s"$leg nprobe must come from the shared rule")
    }
    assert(rows.map(_._3).toSeq == rows.map(_._3).toSeq.sorted,
      "nprobe must widen as selectivity falls")
    assert(rows.last._3 == 16L, "the narrow leg must saturate to |cells| (exact fallback)")
  }

  test("q459: the histogram estimate brackets the exact count within one bucket's mass") {
    val rows = SparkEntry.queries("q459_histogram_selectivity")(spark, sf)
      .select("t_cents", "n_total", "est_rows", "actual_rows", "err_bp")
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(rows.length == 5)
    rows.foreach { case (t, n, est, actual, err) =>
      // the estimator can only be off inside the boundary bucket: its
      // error is bounded by one bucket's row mass (ceil(n/32))
      val bucketMass = (n + 31) / 32
      assert(math.abs(est - actual) <= bucketMass,
        s"t=$t: |$est - $actual| exceeds one bucket ($bucketMass)")
      assert(err == math.abs(est - actual) * 10000 / n)
    }
    // monotone: higher thresholds keep fewer rows, estimated AND actual
    assert(rows.map(_._3).toSeq == rows.map(_._3).toSeq.sorted.reverse)
    assert(rows.map(_._4).toSeq == rows.map(_._4).toSeq.sorted.reverse)
  }

  test("q460: the split partitions the hot cell near-evenly and never grows the max") {
    val rows = SparkEntry.queries("q460_ivf_cell_split")(spark, sf)
      .select("cell", "cnt", "split_cell", "max_before", "max_after")
      .as[(Long, Long, Long, Long, Long)].collect()
    val total = spark.read.parquet(s"$sf/embeddings.parquet").count()
    assert(rows.map(_._2).sum == total, "cells must partition the corpus")
    val hot = rows.head._3
    val a = rows.find(_._1 == hot).get._2
    val b = rows.find(_._1 == 16 + hot).get._2
    assert(math.abs(a - b) <= 1, s"KD split must halve: $a vs $b")
    assert(a + b == rows.head._4, "the two halves must rebuild the hot cell")
    assert(rows.head._5 == rows.map(_._2).max, "max_after readout")
    assert(rows.head._5 <= rows.head._4, "a split may never raise the max occupancy")
  }

  test("q458 rule shape: ceil(2/sel^2) capped at cells, floor at base") {
    import RegistryRound17.adaptiveNprobe
    assert(adaptiveNprobe(1000, 1000, 16) == 2)   // sel 1.0  -> base
    assert(adaptiveNprobe(1000, 700, 16) == 5)    // sel 0.7  -> 4.08 -> 5
    assert(adaptiveNprobe(1000, 500, 16) == 8)    // sel 0.5  -> 8
    assert(adaptiveNprobe(1000, 250, 16) == 16)   // sel 0.25 -> 32 -> cap
    assert(adaptiveNprobe(1000, 0, 16) == 16)     // empty estimate -> exact
  }
}
