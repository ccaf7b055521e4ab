package graft

import org.apache.spark.sql.functions._

import graft.functions.ZOrder

/** Morton interleave expression: bit-placement parity with a naive
  * bit-by-bit reference, input masking, null propagation, and the locality
  * property the layout work relies on. */
class ZOrderSpec extends SparkSpec {

  import spark.implicits._

  /** Naive reference: place bit i of x at 2i, bit i of y at 2i+1. */
  private def naive(x: Long, y: Long): Long =
    (0 until 16).foldLeft(0L) { (acc, i) =>
      acc | (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
    }

  test("interleave16 matches the bit-by-bit reference across the domain") {
    val samples = Seq(0L, 1L, 2L, 3L, 255L, 256L, 1023L, 4095L, 65535L,
      12345L, 54321L)
    for (x <- samples; y <- samples)
      assert(ZOrder.interleave16(x, y) == naive(x, y), s"($x, $y)")
  }

  test("inputs are masked to 16 bits") {
    assert(ZOrder.interleave16(0x10000L, 0L) == 0L)
    assert(ZOrder.interleave16(0x12345L + 65536L * 7, 0L) ==
      ZOrder.interleave16(0x2345L, 0L))
  }

  test("expression evaluates in a DataFrame and propagates nulls") {
    val df = Seq((Some(3L), Some(5L)), (None, Some(1L)))
      .toDF("x", "y")
      .select(ZOrder(col("x"), col("y")).as("z"))
    val got = df.as[Option[Long]].collect().toSeq
    // x=3 (bits 0,1 → even positions 0,2 = 5), y=5 (bits 0,2 → odd
    // positions 1,5 = 34): z = 5 | 34 = 39
    assert(got == Seq(Some(39L), None))
  }

  test("z-values of a quadrant stay contiguous: top bits encode the quadrant") {
    // all (x, y) in the low quadrant [0,256)² sort before any point with
    // x or y ≥ 256 of the same 16-bit domain top half — the property file
    // min/max pruning exploits
    val lowMax = ZOrder.interleave16(255L, 255L)
    assert(ZOrder.interleave16(256L, 0L) > lowMax)
    assert(ZOrder.interleave16(0L, 256L) > lowMax)
  }
}
