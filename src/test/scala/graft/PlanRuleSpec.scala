package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.DotProductExpression

/** The injected optimizer rule (graft.plans.NativeDotProduct): HOF dot
  * products written by plain-Spark users run as the native codegen'd
  * expression — and precision-changing shapes are left alone. */
class PlanRuleSpec extends SparkSpec {

  private val hofSql =
    "aggregate(zip_with(a, b, (x, y) -> x * y), 0D, (acc, v) -> acc + v)"
  private val hofFloatCastSql =
    "aggregate(zip_with(a, b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), 0D, (acc, v) -> acc + v)"

  private def withExtSession[T](f: SparkSession => T): T = {
    val prev = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try f(SparkSession.builder().master("local[4]")
      .withExtensions(new GraftExtensions).getOrCreate())
    finally {
      SparkSession.setActiveSession(prev)
      SparkSession.setDefaultSession(prev)
    }
  }

  private def countNative(df: org.apache.spark.sql.DataFrame): Int = {
    var n = 0
    df.queryExecution.optimizedPlan.transformAllExpressions {
      case e: DotProductExpression => n += 1; e
    }
    n
  }

  test("HOF dot product over double arrays is rewritten to the native expression") {
    withExtSession { s2 =>
      import s2.implicits._
      val df = Seq((Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0)))
        .toDF("a", "b").repartition(1).select(expr(hofSql).as("d"))
      assert(countNative(df) == 1, "expected the rewrite to fire")
      assert(df.head().getDouble(0) == 32.0)
    }
  }

  test("float arrays with per-element double casts are rewritten and agree with the HOF form") {
    withExtSession { s2 =>
      import s2.implicits._
      val vecs = Seq((Array(1.5f, 2.25f), Array(3.0f, 0.5f)))
      val df = vecs.toDF("a", "b").repartition(1).select(expr(hofFloatCastSql).as("d"))
      assert(countNative(df) == 1, "expected the rewrite to fire on the cast form")
      // bit-identical to the un-rewritten HOF on the plain session
      import spark.implicits.{localSeqToDatasetHolder => _}
      val plain = {
        import spark.implicits._
        vecs.toDF("a", "b").select(expr(hofFloatCastSql).as("d")).head().getDouble(0)
      }
      assert(df.head().getDouble(0) == plain)
    }
  }

  test("float-precision products are NOT rewritten (would change rounding)") {
    withExtSession { s2 =>
      import s2.implicits._
      val df = Seq((Array(1.5f, 2.25f), Array(3.0f, 0.5f)))
        .toDF("a", "b").repartition(1).select(expr(hofSql).as("d"))
      assert(countNative(df) == 0, "float x float multiply must be left alone")
    }
  }

  test("a -0.0 start value is NOT rewritten (sign of a -0.0 sum would flip)") {
    withExtSession { s2 =>
      import s2.implicits._
      val negZeroSql =
        "aggregate(zip_with(a, b, (x, y) -> x * y), -0D, (acc, v) -> acc + v)"
      // every product is -0.0, so -0.0 + Σ stays -0.0 (while a +0.0 start
      // would make the whole sum +0.0 — the sign the rewrite must not flip)
      val df = Seq((Array(-0.0, 0.0), Array(1.0, -1.0)))
        .toDF("a", "b").repartition(1).select(expr(negZeroSql).as("d"))
      assert(countNative(df) == 0, "-0.0 start must be left alone")
      // and the un-rewritten result keeps the negative-zero sign
      assert(java.lang.Double.doubleToRawLongBits(df.head().getDouble(0)) ==
        java.lang.Double.doubleToRawLongBits(-0.0))
    }
  }

  test("null element and length mismatch still absorb to NULL after the rewrite") {
    withExtSession { s2 =>
      import s2.implicits._
      val mismatch = Seq((Array(1.0, 2.0), Array(1.0)))
        .toDF("a", "b").repartition(1).select(expr(hofSql).as("d"))
      assert(countNative(mismatch) == 1 && mismatch.head().isNullAt(0))
    }
  }
}
