package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.RollingHash

class RollingHashSpec extends SparkSpec {
  import spark.implicits._

  test("golden value: polynomial 31-hash over UTF-8 bytes") {
    // "abc" -> ((97*31)+98)*31+99 = 96354
    assert(RollingHash.hash64(UTF8String.fromString("abc")) == 96354L)
    assert(RollingHash.hash64(UTF8String.fromString("")) == 0L)
  }

  test("codegen path agrees with direct eval and handles nulls") {
    val df = Seq(Some("abc"), Some("spark"), None).toDF("s")
    val out = df.select(RollingHash(col("s")).as("h")).collect()
    assert(out(0).getLong(0) == 96354L)
    assert(out(1).getLong(0) == RollingHash.hash64(UTF8String.fromString("spark")))
    assert(out(2).isNullAt(0))
  }

  test("registers as a SQL function for spark.sql users") {
    org.apache.spark.sql.graft.Shims.registerFunction(spark, "rolling_hash",
      exprs => graft.functions.RollingHashExpression(exprs.head))
    val out = spark.sql("SELECT rolling_hash('abc') AS h").head().getLong(0)
    assert(out == 96354L)
  }

  test("GraftExtensions injects rolling_hash via spark.sql.extensions") {
    import org.apache.spark.sql.SparkSession
    val prev = spark
    // a fresh session over the SAME SparkContext, built the way a deployment
    // would: withExtensions at construction (getOrCreate would return the
    // shared session, so active/default are cleared first and restored after)
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[4]")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      assert(s2 ne prev, "expected a fresh session with extensions applied")
      val out = s2.sql("SELECT rolling_hash('abc') AS h").head().getLong(0)
      assert(out == 96354L)
      // dot_product rides the same injection: parses to the native expression
      val d = s2.sql(
        "SELECT dot_product(array(CAST(1.0 AS DOUBLE), 2.0), array(CAST(3.0 AS DOUBLE), 4.0)) AS d")
        .head().getDouble(0)
      assert(d == 11.0)
    } finally {
      SparkSession.setActiveSession(prev)
      SparkSession.setDefaultSession(prev)
    }
  }

  test("distinct strings get distinct fingerprints (sample)") {
    val docs = (1 to 500).map(i => s"document number $i payload")
    val n = docs.toDF("s").select(RollingHash(col("s")).as("h")).distinct().count()
    assert(n == 500)
  }

  test("RmsCents aggregator: exact buffer, partition-count independent") {
    import graft.functions.RmsCents
    val vals = Seq(3.0, 4.0, 12.0, 5.0) // sqrt((9+16+144+25)/4) = sqrt(48.5)
    val expected = math.sqrt(48.5)
    def rmsWith(parts: Int): Double = vals.toDF("value").repartition(parts)
      .agg(org.apache.spark.sql.functions.udaf(RmsCents).apply(col("value")))
      .head().getDouble(0)
    // identical (not just close) across partitionings: the buffer is exact
    assert(rmsWith(1) == expected && rmsWith(3) == expected)
    // direct Aggregator contract: merge in either order gives the same buffer
    val b1 = RmsCents.reduce(RmsCents.zero, 3.0)
    val b2 = RmsCents.reduce(RmsCents.zero, 4.0)
    assert(RmsCents.merge(b1, b2) == RmsCents.merge(b2, b1))
  }

  test("RmsCents quantizes half-away-from-zero like the engine's other cents paths") {
    import graft.functions.RmsCents
    // .5-cent boundaries: rint (half-to-even) would give 2 and -2 for both
    assert(RmsCents.reduce(RmsCents.zero, 0.025)._1 == 9L)   // 2.5 cents -> 3
    assert(RmsCents.reduce(RmsCents.zero, 0.015)._1 == 4L)   // 1.5 cents -> 2
    assert(RmsCents.reduce(RmsCents.zero, -0.025)._1 == 9L)  // -2.5 -> -3
    assert(RmsCents.reduce(RmsCents.zero, -0.015)._1 == 4L)  // -1.5 -> -2
  }
}
