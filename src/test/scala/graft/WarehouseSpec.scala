package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.ops.Warehouse

class WarehouseSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("scd2Compact collapses consecutive identical states into validity ranges") {
    val ev = Seq(
      (1L, "a", ts("2024-01-01 00:00:00"), 1L),
      (1L, "a", ts("2024-01-01 01:00:00"), 2L), // same state -> absorbed
      (1L, "b", ts("2024-01-01 02:00:00"), 3L), // change
      (1L, "a", ts("2024-01-01 03:00:00"), 4L), // back to a = a NEW range
      (2L, "x", ts("2024-01-01 00:30:00"), 5L)
    ).toDF("user_id", "state", "ts", "event_id")
    val out = Warehouse.scd2Compact(ev, "user_id", "state", "ts", "event_id")
      .orderBy("user_id", "valid_from")
      .select("user_id", "state", "valid_from", "valid_to", "is_current")
      .as[(Long, String, Timestamp, Option[Timestamp], Boolean)].collect().toSeq
    assert(out == Seq(
      (1L, "a", ts("2024-01-01 00:00:00"), Some(ts("2024-01-01 02:00:00")), false),
      (1L, "b", ts("2024-01-01 02:00:00"), Some(ts("2024-01-01 03:00:00")), false),
      (1L, "a", ts("2024-01-01 03:00:00"), None, true),
      (2L, "x", ts("2024-01-01 00:30:00"), None, true)))
    // ranges chain: each valid_to equals the next valid_from within the key
  }

  test("mergeUpsert: updates override, new keys insert, absent keys keep") {
    val target = Seq((1L, 10L, 100L), (2L, 20L, 200L)).toDF("k", "n", "total")
    val updates = Seq((2L, 25L, 250L), (3L, 30L, 300L)).toDF("k", "n", "total")
    val out = Warehouse.mergeUpsert(target, updates, "k", Seq("n", "total"))
      .orderBy("k")
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(out == Seq(
      (1L, 10L, 100L, "keep"),
      (2L, 25L, 250L, "update"),
      (3L, 30L, 300L, "insert")))
  }

  test("mergeIntervals fuses overlapping and touching intervals, splits gaps") {
    // width 60s: 00:00+60s overlaps 00:30; 01:00 touches EXACTLY at the
    // first interval's end (start == prev end -> same island, half-open
    // semantics would split it; the contract is s > prev_max splits);
    // 10:00 is a clean gap
    val ev = Seq(
      (1L, ts("2024-01-01 00:00:00")),
      (1L, ts("2024-01-01 00:00:30")),
      (1L, ts("2024-01-01 00:01:30")),
      (1L, ts("2024-01-01 10:00:00")),
      (2L, ts("2024-01-01 00:00:00"))
    ).toDF("user_id", "ts")
    val out = Warehouse.mergeIntervals(ev, "user_id", "ts", widthSec = 60)
      .orderBy("user_id", "island")
      .select("user_id", "island", "covered_us")
      .as[(Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      (1L, 1L, 150000000L), // 00:00:00 .. 00:02:30 fused (overlap + touch)
      (1L, 2L, 60000000L),  // the 10:00 singleton
      (2L, 1L, 60000000L)))
  }

  test("mergeIntervals covered time equals end-start for each island") {
    val out = Warehouse.mergeIntervals(
      Tables.events(spark, "/root/testdata/sf0.001"), "user_id", "ts", 300)
    val bad = out.filter(
      unix_micros(col("end_ts")) - unix_micros(col("start_ts")) =!= col("covered_us"))
    assert(bad.count() == 0)
    // islands within a user never overlap
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("island")
    val overlaps = out
      .withColumn("prev_end", lag(col("end_ts"), 1).over(w))
      .filter(col("prev_end").isNotNull && col("start_ts") <= col("prev_end"))
    assert(overlaps.count() == 0)
  }

  test("cdcDiff classifies inserts, deletes, updates; drops unchanged rows") {
    val oldSnap = Seq(
      (1L, Some(10.0), "a"), // unchanged → absent from output
      (2L, Some(20.0), "b"), // value update
      (3L, Some(30.0), "c"), // deleted
      (4L, None, "d"))       // NULL → value update (null-safe compare)
      .toDF("k", "bal", "seg")
    val newSnap = Seq(
      (1L, Some(10.0), "a"),
      (2L, Some(21.0), "b"),
      (4L, Some(40.0), "d"),
      (5L, Some(50.0), "e")) // inserted
      .toDF("k", "bal", "seg")
    val out = Warehouse.cdcDiff(oldSnap, newSnap, "k", Seq("bal", "seg"))
      .orderBy("k")
      .as[(Long, String, Option[Double], Option[Double], Option[String], Option[String])]
      .collect().toSeq
    assert(out == Seq(
      (2L, "update", Some(20.0), Some(21.0), Some("b"), Some("b")),
      (3L, "delete", Some(30.0), None, Some("c"), None),
      (4L, "update", None, Some(40.0), Some("d"), Some("d")),
      (5L, "insert", None, Some(50.0), None, Some("e"))))
  }

  test("cdcDiff with no compare columns is presence-only: inserts and deletes") {
    val oldSnap = Seq((1L, "a"), (2L, "b")).toDF("k", "seg")
    val newSnap = Seq((2L, "CHANGED"), (3L, "c")).toDF("k", "seg")
    val out = Warehouse.cdcDiff(oldSnap.select("k"), newSnap.select("k"), "k", Seq.empty)
      .orderBy("k").as[(Long, String)].collect().toSeq
    // key 2 matches -> never an update without compare columns
    assert(out == Seq((1L, "delete"), (3L, "insert")))
  }

  test("pointInTimeLookup picks the version valid AT the fact timestamp") {
    // key 1 history: a [01-01, 01-10), b [01-10, open)
    val hist = Seq(
      (1L, "x", ts("2024-01-01 00:00:00"), 1L),
      (1L, "x", ts("2024-01-05 00:00:00"), 2L), // same state: collapsed
      (1L, "y", ts("2024-01-10 00:00:00"), 3L)
    ).toDF("k", "state", "t", "tie")
    val dim = Warehouse.scd2Compact(hist, "k", "state", "t", "tie")
    val facts = Seq(
      (100L, 1L, ts("2023-12-25 00:00:00")), // before any version -> NULL
      (101L, 1L, ts("2024-01-07 00:00:00")), // inside [x)
      (102L, 1L, ts("2024-01-10 00:00:00")), // boundary: y starts AT 01-10
      (103L, 1L, ts("2024-09-01 00:00:00")), // open-ended current -> y
      (104L, 2L, ts("2024-01-07 00:00:00")) // unknown key -> NULL
    ).toDF("fid", "k", "t")
    val out = Warehouse.pointInTimeLookup(facts, dim, "k", "t")
      .orderBy("fid").select("fid", "state")
      .as[(Long, Option[String])].collect().toSeq
    assert(out == Seq((100L, None), (101L, Some("x")), (102L, Some("y")),
      (103L, Some("y")), (104L, None)))
  }

  test("pointInTimeLookup keeps facts-side valid_from/valid_to columns intact") {
    val hist = Seq((1L, "x", ts("2024-01-01 00:00:00"), 1L)).toDF("k", "state", "t", "tie")
    val dim = Warehouse.scd2Compact(hist, "k", "state", "t", "tie")
    // facts carry their OWN valid_from column — it must survive the lookup
    val facts = Seq((101L, 1L, ts("2024-01-07 00:00:00"), "fact-vf"))
      .toDF("fid", "k", "t", "valid_from")
    val out = Warehouse.pointInTimeLookup(facts, dim, "k", "t")
    assert(out.columns.count(_ == "valid_from") == 1)
    assert(out.select("valid_from").as[String].head() == "fact-vf")
    assert(out.select("state").as[String].head() == "x")
  }

  test("goldenRecord survives the last NON-NULL per column, not the last row") {
    val upd = Seq(
      (1L, 1L, Some(500L), "a"),   // oldest: has amount
      (1L, 2L, None, "b"),         // newest: no amount — amount survives from v1
      (2L, 1L, None, "x"),         // never any amount → NULL
      (2L, 2L, None, "y"),
      (2L, 3L, Some(9L), "z")
    ).toDF("k", "v", "amount", "status")
    val out = Warehouse.goldenRecord(upd, "k", "v", "v", Seq("amount", "status"))
      .orderBy("k").as[(Long, Option[Long], String, Long)].collect().toSeq
    assert(out == Seq(
      (1L, Some(500L), "b", 2L),
      (2L, Some(9L), "z", 3L)))
  }

  test("goldenRecord ties break on the tie column, deterministically") {
    val upd = Seq(
      (1L, 5L, 10L, Some("early")),
      (1L, 5L, 20L, None)          // same version, higher tie — status from tie 10
    ).toDF("k", "v", "tie", "status")
    val out = Warehouse.goldenRecord(upd, "k", "v", "tie", Seq("status"))
      .as[(Long, String, Long)].collect().toSeq
    assert(out == Seq((1L, "early", 2L)))
  }
}
