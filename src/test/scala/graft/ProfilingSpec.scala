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
}
