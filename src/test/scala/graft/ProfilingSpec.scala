package graft

import graft.ops.Profiling

class ProfilingSpec extends SparkSpec {
  import spark.implicits._

  test("profile computes null/distinct/min/max per column in one pass") {
    val df = Seq(
      (Some(3L), "b"), (Some(1L), "a"), (None, "a")
    ).toDF("k", "s")
    val out = Profiling.profile(df, Seq("k", "s"))
      .orderBy("col_name").as[(String, Long, Long, String, String)].collect().toSeq
    assert(out == Seq(
      ("k", 1L, 2L, "1", "3"),
      ("s", 0L, 2L, "a", "b")))
  }

  test("profile of an EMPTY table reports 0 nulls / 0 distinct, not NULL") {
    val df = Seq.empty[(Option[Long], String)].toDF("k", "s")
    val out = Profiling.profile(df, Seq("k", "s"))
      .orderBy("col_name").as[(String, Long, Long, Option[String], Option[String])]
      .collect().toSeq
    assert(out == Seq(("k", 0L, 0L, None, None), ("s", 0L, 0L, None, None)))
  }

  test("expectations: one scan, NULL strict-fails, exact basis points") {
    import org.apache.spark.sql.functions.col
    val df = Seq((Some(5L), "a"), (Some(-1L), "b"), (None, "c"), (Some(7L), ""))
      .toDF("v", "s")
    val out = Profiling.expectations(df, Seq(
      "v_non_negative" -> (col("v") >= 0),   // -1 fails, NULL fails -> 2
      "s_nonempty" -> (col("s") =!= "")))    // "" fails -> 1
      .orderBy("rule").as[(String, Long, Long, Long)].collect().toSeq
    assert(out == Seq(("s_nonempty", 1L, 4L, 7500L), ("v_non_negative", 2L, 4L, 5000L)))
  }

  test("expectations on an EMPTY table: zero violations, pass_bp 0 not NULL") {
    import org.apache.spark.sql.functions.col
    val df = Seq.empty[(Long, String)].toDF("v", "s")
    val out = Profiling.expectations(df, Seq("v_pos" -> (col("v") > 0)))
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(out == Seq(("v_pos", 0L, 0L, 0L)))
  }

  test("expectations rejects duplicate rule names") {
    import org.apache.spark.sql.functions.col
    val df = Seq((1L, "x")).toDF("v", "s")
    intercept[IllegalArgumentException] {
      Profiling.expectations(df, Seq("r" -> (col("v") > 0), "r" -> (col("v") < 9)))
    }
  }

  test("madOutliers flags only the spike when MAD degenerates to 0") {
    // med=10, deviations [0,0,0,0,90] → mad=0: any nonzero deviation flags
    val df = Seq(("g", 10L), ("g", 10L), ("g", 10L), ("g", 10L), ("g", 100L))
      .toDF("grp", "v")
    val out = Profiling.madOutliers(df, "grp", "v")
      .orderBy("v").select("v", "med", "mad", "is_outlier")
      .as[(Long, Double, Double, Boolean)].collect().toSeq
    assert(out.map(_._2).forall(_ == 10.0))
    assert(out.map(_._3).forall(_ == 0.0))
    assert(out.map(_._4) == Seq(false, false, false, false, true))
  }

  test("winsorize clips to discrete per-group percentiles, all-long output") {
    // 1..20: p05 disc = 1 (cume_dist 1/20 ≥ 0.05), p95 disc = 19 (19/20 ≥ .95)
    val df = (1L to 20L).map(("g", _)).toDF("grp", "v")
    val out = Profiling.winsorize(df, "grp", "v")
      .orderBy("v").select("v", "winsorized", "clipped_low", "clipped_high")
      .as[(Long, Long, Boolean, Boolean)].collect().toSeq
    assert(out.head == ((1L, 1L, false, false)))
    assert(out.last == ((20L, 19L, false, true)))
    assert(out.count(_._3) == 0 && out.count(_._4) == 1)
    assert(out.map(_._2).sum == (1L to 19L).sum + 19L)
  }

  test("winsorize rejects inverted quantiles") {
    val df = Seq(("g", 1L)).toDF("grp", "v")
    intercept[IllegalArgumentException] {
      Profiling.winsorize(df, "grp", "v", loQ = 0.9, hiQ = 0.1)
    }
  }

  test("madOutliers: symmetric series has no outliers at k=3") {
    // med=3, devs [2,1,0,1,2] → mad=1: no dev exceeds 3
    val df = Seq(("g", 1L), ("g", 2L), ("g", 3L), ("g", 4L), ("g", 5L))
      .toDF("grp", "v")
    val out = Profiling.madOutliers(df, "grp", "v")
      .select("is_outlier").as[Boolean].collect().toSeq
    assert(out == Seq(false, false, false, false, false))
  }

  test("benford: string-bucketed first digits, exact shares, <=0 dropped") {
    val df = Seq(100L, 150L, 20L, 300L, 9L, 0L, -5L).toDF("amt")
    val out = Profiling.benford(df, "amt")
      .select("digit", "n", "share_bp").as[(Long, Long, Long)].collect().toSeq
      .sortBy(_._1)
    assert(out == Seq((1L, 2L, 4000L), (2L, 1L, 2000L),
      (3L, 1L, 2000L), (9L, 1L, 2000L)))
    val exp1 = Profiling.benford(df, "amt")
      .where("digit = 1").select("expected_bp").as[Double].collect().head
    assert(exp1 == 3010.3) // round(log10(2)·10000, 4)
  }

  test("fkAudit: counts orphans per relation, NULL FKs excluded by contract") {
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val clean = Seq(Some(1L), Some(2L), Some(2L), None).toDF("fk")
    val broken = Seq(Some(1L), Some(9L), Some(9L), Some(7L), None).toDF("fk")
    val out = Profiling.fkAudit(Seq(
        ("clean", clean, "fk", parent, "pk"),
        ("broken", broken, "fk", parent, "pk")))
      .orderBy("relation").as[(String, Long, Long, Boolean)].collect().toSeq
    // NULL fks don't count as rows OR orphans; 9 appears twice → 2 orphans
    // plus the 7 → 3
    assert(out == Seq(("broken", 4L, 3L, false), ("clean", 3L, 0L, true)))
  }

  test("fkAudit: empty relation list is a clear contract error") {
    val e = intercept[IllegalArgumentException](Profiling.fkAudit(Seq.empty))
    assert(e.getMessage.contains("at least one relation"))
  }
}
