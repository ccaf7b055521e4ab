package graft

import graft.ops.Sketch

class SketchSpec extends SparkSpec {
  import spark.implicits._

  test("misraGries never drops an item above the n/(k+1) guarantee") {
    // 60× "hot" among 100 items; k=4 ⇒ any freq > 100/5 = 20 must survive
    val stream = Seq.fill(60)("hot") ++ (1 to 40).map(i => s"cold$i")
    // adversarial order: interleave so decrements hit the hot item often
    val interleaved = stream.sortBy(_.hashCode)
    val sketch = Sketch.misraGries(interleaved.iterator, 4)
    assert(sketch.contains("hot"), s"hot item evicted: $sketch")
    assert(sketch.size <= 4)
  }

  test("heavyHitters returns exact counts above the share threshold") {
    // 1000 items: "a"×300, "b"×100, tail of 600 distinct — at 10% (1000bp)
    // the answer is exactly {a: 300/3000bp, b: 100/1000bp}
    val data = Seq.fill(300)("a") ++ Seq.fill(100)("b") ++
      (1 to 600).map(i => s"t$i")
    val out = Sketch.heavyHitters(data.toDS(), shareBp = 1000L)
      .orderBy("item").as[(String, Long, Long)].collect().toSeq
    assert(out == Seq(("a", 300L, 3000L), ("b", 100L, 1000L)))
  }

  test("heavyHitters output is identical across partitionings") {
    val data = (1L to 3000L).map(i => s"w${i % 37}")
    val a = Sketch.heavyHitters(data.toDS().repartition(1), 200L)
      .orderBy("item").as[(String, Long, Long)].collect().toSeq
    val b = Sketch.heavyHitters(data.toDS().repartition(13), 200L)
      .orderBy("item").as[(String, Long, Long)].collect().toSeq
    assert(a == b && a.nonEmpty)
  }

  test("heavyHitters on an empty input returns an empty frame") {
    assert(Sketch.heavyHitters(Seq.empty[String].toDS(), 100L).count() == 0)
  }

  test("heavyHitters: many-partition worst case — the k·P candidate union " +
      "is pruned, the answer stays exact") {
    // 64 partitions × a long distinct tail is the regime where every
    // partition's sketch is full of junk keys (raw union ≈ k·P rows, far
    // more than the answer): the margin prune must discard them without
    // ever dropping a true hitter, including one sitting exactly at the
    // ceil threshold (n = 6000, 500bp → minCnt = 300).
    val data = Seq.fill(900)("hot") ++ Seq.fill(300)("edge") ++
      Seq.fill(299)("under") ++ (1 to 4501).map(i => s"tail$i")
    val shuffled = new scala.util.Random(7).shuffle(data)
    val out = Sketch.heavyHitters(shuffled.toDS().repartition(64), 500L)
      .orderBy("item").as[(String, Long, Long)].collect().toSeq
    assert(out == Seq(("edge", 300L, 500L), ("hot", 900L, 1500L)))
  }
}
