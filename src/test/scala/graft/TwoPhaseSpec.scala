package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.TwoPhase

/** TwoPhase prefix sum / global rank / ntile: bit-parity with the naive
  * single-partition window forms it replaces, on uniform, skewed, tiny and
  * empty inputs — plus the no-empty-partition-window plan property itself.
  */
class TwoPhaseSpec extends SparkSpec {

  import spark.implicits._

  // logical-plan check: a Window with an empty partitionSpec is exactly the
  // node Spark executes as a single-partition sort — the optimized logical
  // plan is fully traversable (no AQE/query-stage wrappers to peel)
  private def globalWindowCount(df: org.apache.spark.sql.DataFrame): Int =
    df.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window
        if w.partitionSpec.isEmpty => w
    }.size

  test("prefixSum matches the single-partition cumulative window bit-for-bit") {
    val df = (1L to 999L).map(i => (i, (i * 37 % 101) + 1)).toDF("id", "v")
    val w = Window.orderBy("id").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val expect = df.withColumn("cum", sum(col("v")).over(w))
      .orderBy("id").select("id", "cum").collect().map(r => (r.getLong(0), r.getLong(1)))
    val (got, total) = TwoPhase.prefixSum(df, col("id"), Seq(col("id")), col("v"), "cum")
    val gotRows = got.orderBy("id").select("id", "cum").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(gotRows.toSeq == expect.toSeq)
    assert(total == expect.last._2)
  }

  test("prefixSum plans no empty-partition window (the point of the exercise)") {
    val df = (1L to 100L).map(i => (i, i % 7)).toDF("id", "v")
    val (got, _) = TwoPhase.prefixSum(df, col("id"), Seq(col("id")), col("v"), "cum")
    got.collect()
    assert(globalWindowCount(got) == 0, "two-phase plan still has a global window")
  }

  test("globalRank matches row_number over a desc/tie order with heavy ties") {
    // vocab shape: half the keys tie at freq=1 (the worst-case tier)
    val df = (1 to 500).map { i =>
      (s"tok$i", if (i % 2 == 0) 1L else (i % 13 + 1).toLong)
    }.toDF("tok", "freq")
    val w = Window.orderBy(col("freq").desc, col("tok"))
    val expect = df.withColumn("r", row_number().over(w).cast("long"))
      .orderBy("tok").select("tok", "r").collect().map(r => (r.getString(0), r.getLong(1)))
    val (got, n) = TwoPhase.globalRank(df, -col("freq"),
      Seq(col("freq").desc, col("tok")), "r")
    val gotRows = got.orderBy("tok").select("tok", "r").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(gotRows.toSeq == expect.toSeq)
    assert(n == 500L)
  }

  test("ntileFromRank reproduces window ntile exactly, including n % k remainders") {
    for (n <- Seq(1, 9, 10, 37, 100, 101)) {
      val df = (1L to n).map(i => (i * 31 % 997, i)).toDF("v", "id")
      val w = Window.orderBy(col("v"), col("id"))
      val expect = df.withColumn("t", ntile(10).over(w).cast("long"))
        .orderBy("v", "id").select("t").collect().map(_.getLong(0))
      val (ranked, total) = TwoPhase.globalRank(df, col("v"),
        Seq(col("v"), col("id")), "rank")
      val got = ranked.withColumn("t", TwoPhase.ntileFromRank("rank", total, 10))
        .orderBy("v", "id").select("t").collect().map(_.getLong(0))
      assert(got.toSeq == expect.toSeq, s"ntile mismatch at n=$n")
    }
  }

  test("prefixSumKeyed matches the per-key cumulative window bit-for-bit, ties and skew included") {
    // 3 keys with very different sizes (the skew prefixSumKeyed exists for)
    // and heavy value ties so cross-bin tie handling is exercised per key
    val df = (1L to 900L).map { i =>
      val k = if (i % 10 < 6) "a" else if (i % 10 < 9) "b" else "c"
      (k, i, (i * 13 % 7) + 1)
    }.toDF("k", "id", "v")
    val w = Window.partitionBy("k").orderBy(col("v").desc, col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val expect = df.withColumn("cum", sum(col("v")).over(w))
      .orderBy("k", "id").select("k", "id", "cum").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val got = TwoPhase.prefixSumKeyed(df, "k", -col("v"),
        Seq(col("v").desc, col("id")), col("v"), "cum")
      .orderBy("k", "id").select("k", "id", "cum").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == expect.toSeq)
  }

  test("prefixSumKeyed plans no single-key-partition window (every window partitions by (key, bin))") {
    val df = (1L to 300L).map(i => (if (i % 2 == 0) "x" else "y", i, i % 5 + 1))
      .toDF("k", "id", "v")
    val got = TwoPhase.prefixSumKeyed(df, "k", col("id"), Seq(col("id")), col("v"), "cum")
    got.collect()
    val oneColWindows = got.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window
        if w.partitionSpec.size < 2 => w
    }.size
    assert(oneColWindows == 0,
      "a window partitioned by fewer than (key, bin) serializes a whole key onto one task")
  }

  test("prefixSum survives the degenerate bin key: every row the same value") {
    // worst-case tie tier — all rows share one bin; parity must still hold
    // (the plan degrades to one busy window task, the documented bound)
    val df = (1L to 300L).map(i => (42L, i, i % 5 + 1)).toDF("k", "id", "v")
    val w = Window.orderBy("id").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val expect = df.withColumn("cum", sum(col("v")).over(w))
      .orderBy("id").select("cum").collect().map(_.getLong(0))
    val (got, total) = TwoPhase.prefixSum(df, col("k"), Seq(col("id")), col("v"), "cum")
    assert(got.orderBy("id").select("cum").collect().map(_.getLong(0)).toSeq == expect.toSeq)
    assert(total == expect.last)
  }

  test("prefixSum on an empty frame yields an empty frame and total 0") {
    val df = Seq.empty[(Long, Long)].toDF("id", "v")
    val (got, total) = TwoPhase.prefixSum(df, col("id"), Seq(col("id")), col("v"), "cum")
    assert(got.count() == 0 && total == 0L)
  }

  test("prefixSum rejects reserved temp column names with a clear message") {
    val df = (1L to 5L).map(i => (i, i)).toDF("id", "__bin")
    val e = intercept[IllegalArgumentException] {
      TwoPhase.prefixSum(df, col("id"), Seq(col("id")), col("id"), "cum")
    }
    assert(e.getMessage.contains("__bin"))
  }

  test("prefixSum rejects an all-NULL value bin instead of an opaque NPE") {
    val df = (1L to 50L).map(i => (i, null.asInstanceOf[java.lang.Long]))
      .toDF("id", "v")
    val e = intercept[IllegalArgumentException] {
      TwoPhase.prefixSum(df, col("id"), Seq(col("id")), col("v"), "cum")
    }
    assert(e.getMessage.contains("NULL sum"))
  }

  test("gate keys q91/q96/q93 plan no empty-partition window end-to-end") {
    for (k <- Seq("q91_sequence_packing", "q96_decile_stats", "q93_vocab_encode")) {
      val df = SparkEntry.queries(k)(spark, "/root/testdata/sf0.001")
      assert(globalWindowCount(df) == 0, s"$k still plans a global window")
    }
  }
}
