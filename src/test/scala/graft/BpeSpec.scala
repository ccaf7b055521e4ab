package graft

import org.apache.spark.sql.functions._
import graft.ops.Bpe

/** BPE merge learning: equivalence with a sequential in-memory reference on
  * random corpora, greedy-overlap semantics, determinism, encode integrity. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  /** Sequential reference: classic word-frequency BPE with the same
    * (count desc, p1, p2) tie-break. */
  private def referenceMerges(texts: Seq[String], k: Int): Seq[(String, String, Long)] = {
    def applyMerge(syms: List[String], p1: String, p2: String): List[String] = {
      val out = scala.collection.mutable.ListBuffer.empty[String]
      var i = 0
      while (i < syms.length) {
        if (i + 1 < syms.length && syms(i) == p1 && syms(i + 1) == p2) {
          out += (p1 + p2); i += 2
        } else { out += syms(i); i += 1 }
      }
      out.toList
    }
    var words: Map[List[String], Long] = texts
      .flatMap(_.toLowerCase.split("\\s+")).filter(_.nonEmpty)
      .groupBy(identity).map { case (w, g) => (w.split("").toList, g.size.toLong) }
    val merges = scala.collection.mutable.ListBuffer.empty[(String, String, Long)]
    var done = false
    while (merges.size < k && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((syms, f) <- words; p <- syms.zip(syms.tail))
        counts(p) = counts.getOrElse(p, 0L) + f
      if (counts.isEmpty) done = true
      else {
        val ((p1, p2), c) = counts.toSeq.minBy { case ((a, b), n) => (-n, a, b) }
        merges += ((p1, p2, c))
        words = words.groupBy { case (syms, _) => applyMerge(syms, p1, p2) }
          .map { case (s, g) => (s, g.values.sum) }
      }
    }
    merges.toList
  }

  test("learnMerges equals the sequential reference on random corpora") {
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 3) {
      val vocabChars = "abcd"
      val texts = (1 to 60).map { _ =>
        (1 to (2 + rnd.nextInt(5))).map { _ =>
          (1 to (1 + rnd.nextInt(6))).map(_ => vocabChars(rnd.nextInt(4))).mkString
        }.mkString(" ")
      }
      val expect = referenceMerges(texts, 6)
      val got = Bpe.learnMerges(texts.toDF("text"), "text", 6)
      assert(got == expect, s"trial $trial: $got != $expect")
    }
  }

  test("merge fold resolves overlapping pairs exactly like the greedy scan") {
    val df = Seq("aaaa aaa xaax").toDF("text")
    val merges = Bpe.learnMerges(df, "text", 1)
    assert(merges.head._1 == "a" && merges.head._2 == "a")
    // aaaa -> [aa][aa]; aaa -> [aa][a]; xaax -> [x][aa][x]
    val enc = df.select(Bpe.encode(df, "text", Seq(("a", "a"))).as("e"))
      .as[Seq[String]].head()
    assert(enc == Seq("aa", "aa", "aa", "a", "x", "aa", "x"))
  }

  test("encode preserves text: concatenated symbols equal the input sans spaces") {
    val texts = Seq("the cat sat", "a stream table the scan", "the the the")
    val df = texts.toDF("text")
    val merges = Bpe.learnMerges(df, "text", 8).map(m => (m._1, m._2))
    val out = df.select(col("text"), Bpe.encode(df, "text", merges).as("e"))
      .as[(String, Seq[String])].collect()
    out.foreach { case (t, syms) =>
      assert(syms.mkString == t.toLowerCase.replaceAll("\\s+", ""))
    }
    // and merges actually compress: fewer symbols than characters
    val chars = texts.map(_.replaceAll("\\s+", "").length).sum
    assert(out.map(_._2.size).sum < chars)
  }

  test("encodeRanked (production shape) equals the fold encoder") {
    val rnd = new scala.util.Random(11)
    val texts = (1 to 40).map { _ =>
      (1 to (2 + rnd.nextInt(4))).map { _ =>
        (1 to (1 + rnd.nextInt(7))).map(_ => "abcde"(rnd.nextInt(5))).mkString
      }.mkString(" ")
    }
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val merges = Bpe.learnMerges(df, "text", 10).map(m => (m._1, m._2))
    val foldEnc = df.select(col("id"), Bpe.encode(df, "text", merges).as("tokens"))
      .orderBy("id").as[(Long, Seq[String])].collect().toSeq
    val rankEnc = Bpe.encodeRanked(df, "id", "text", merges)
      .orderBy("id").as[(Long, Seq[String])].collect().toSeq
    assert(rankEnc == foldEnc)
  }

  test("encodeRanked rejects a rank-inconsistent merge list eagerly") {
    val df = Seq((1L, "abc")).toDF("id", "text")
    // "bc" is only produced by the LATER merge #1 — the rank loop would
    // silently diverge from the fold encoder, so it must be rejected
    val e = intercept[IllegalArgumentException] {
      Bpe.encodeRanked(df, "id", "text", Seq(("a", "bc"), ("b", "c")))
    }
    assert(e.getMessage.contains("rank-inconsistent"))
    // the learnMerges-shaped list (components are base chars or earlier
    // outputs) passes the same gate
    Bpe.encodeRanked(df, "id", "text", Seq(("b", "c"), ("a", "bc"))).collect()
  }

  test("learnMerges is deterministic run to run") {
    val df = Seq("spark scan scans spans", "span spark spark").toDF("text")
    val a = Bpe.learnMerges(df, "text", 5)
    val b = Bpe.learnMerges(df, "text", 5)
    assert(a == b && a.size == 5)
  }
}
