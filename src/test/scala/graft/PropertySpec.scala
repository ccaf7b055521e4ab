package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import org.apache.spark.sql.functions._

import graft.ops.{Dedup, Relational, Sentiment}

/** ScalaCheck properties (SURVEY.md §5.3), sampled with fixed seeds so runs
  * are deterministic (no scalatestplus bridge in the offline cache). */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  private val idGen = Gen.listOfN(30, Gen.chooseNum(1L, 12L))

  test("property: WordShingles expression ≡ the declarative lambda chain, bit for bit") {
    // the native fused loop must reproduce every quirk of
    // split(lower(t), \s+) → windows → concat_ws → size-filter →
    // array_distinct, including leading/trailing whitespace (empty edge
    // tokens), unicode, tabs/newlines, and sub-k-token texts
    val tokenGen = Gen.oneOf("alpha", "Beta", "GAMMA", "δeλta", "x", "", "émile")
    val sepGen = Gen.oneOf(" ", "  ", "\t", "\n", " \t ")
    val textGen = for {
      n <- Gen.chooseNum(0, 12)
      toks <- Gen.listOfN(n, tokenGen)
      seps <- Gen.listOfN(n + 1, sepGen)
      lead <- Gen.oneOf("", " ", "\t")
      trail <- Gen.oneOf("", " ", "\n")
    } yield lead + toks.zip(seps).map { case (t, s) => t + s }.mkString + trail
    val texts = (1L to 40L).map(s => sample(textGen, s)).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }
    Seq(1, 2, 3).foreach { k =>
      val df = texts.toDF("doc_id", "text")
      val declarative = df
        .select(col("doc_id"), split(lower(col("text")), "\\s+").as("__w"))
        .select(col("doc_id"), expr(
          s"array_distinct(filter(transform(__w, (x, i) -> concat_ws(' ', slice(__w, i + 1, $k)))," +
            s" s -> size(split(s, ' ')) = $k))").as("sh"))
        .orderBy("doc_id").as[(Long, Seq[String])].collect().toSeq
      val native = df
        .select(col("doc_id"), graft.functions.WordShingles(col("text"), k).as("sh"))
        .orderBy("doc_id").as[(Long, Seq[String])].collect().toSeq
      assert(native == declarative, s"k=$k diverged")
      // positional form: index = token offset of each full window, in order
      val declPos = df
        .select(col("doc_id"), split(lower(col("text")), "\\s+").as("__w"))
        .select(col("doc_id"), expr(
          s"filter(transform(__w, (x, i) -> concat_ws(' ', slice(__w, i + 1, $k)))," +
            s" s -> size(split(s, ' ')) = $k)").as("sh"))
        .orderBy("doc_id").as[(Long, Seq[String])].collect().toSeq
      val nativePos = df
        .select(col("doc_id"),
          graft.functions.WordShingles(col("text"), k, distinct = false).as("sh"))
        .orderBy("doc_id").as[(Long, Seq[String])].collect().toSeq
      assert(nativePos == declPos, s"k=$k positional diverged")
    }
  }

  test("property: CdcChunks expression ≡ the higher-order-function chain, bit for bit") {
    // the native single-pass walk must reproduce the declarative
    // boundary/slice/fold pipeline exactly: boundary at every position
    // whose trailing 4-char window hash ≡ 0 (mod 64), chunks between
    // boundaries (empty tail dropped), Karp–Rabin fold per chunk
    val charGen = Gen.oneOf(('a' to 'z') ++ ('0' to '9') ++ Seq(' ', '.', ','))
    val textGen = for {
      n <- Gen.chooseNum(0, 400)
      cs <- Gen.listOfN(n, charGen)
    } yield cs.mkString
    val texts = (1L to 60L).map(s => sample(textGen, s)).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }
    val df = texts.toDF("doc_id", "text").filter(length(col("text")) > 0)
    val declarative = df
      .select(col("doc_id"), expr(
        "filter(sequence(4, greatest(length(text), 4)), i -> " +
          "i <= length(text) AND (ascii(substring(text, i - 3, 1)) * 29791 + " +
          "ascii(substring(text, i - 2, 1)) * 961 + " +
          "ascii(substring(text, i - 1, 1)) * 31 + " +
          "ascii(substring(text, i, 1))) % 64 = 0)").as("b"), col("text"))
      .select(col("doc_id"), expr(
        "transform(filter(zip_with(" +
          "concat(array(1), transform(b, x -> x + 1)), " +
          "concat(b, array(length(text))), " +
          "(st, en) -> substring(text, st, en - st + 1)), c -> c != ''), " +
          "c -> aggregate(sequence(1, length(c)), CAST(0 AS BIGINT), " +
          "(acc, i) -> (acc * 31 + ascii(substring(c, i, 1))) % 1000000007) " +
          "* CAST(16777216 AS BIGINT) + least(length(c), 16777215))").as("p"))
      .orderBy("doc_id").as[(Long, Seq[Long])].collect().toSeq
    val native = df
      .select(col("doc_id"), graft.functions.CdcChunks(col("text")).as("p"))
      .orderBy("doc_id").as[(Long, Seq[Long])].collect().toSeq
    assert(native == declarative, "CdcChunks diverged from the HOF chain")
    assert(native.exists(_._2.length > 1), "generator never produced a boundary")
  }

  test("property: HashFamily constants respect the overflow-safety bounds") {
    import graft.functions.HashFamily
    // a_i odd in [1, 2^31), b_i in [0, P): a_i * x + b_i can never overflow a
    // signed long for x < P — the invariant the DuckDB replication relies on
    (0 until 1100).foreach { i =>
      val (a, b) = (HashFamily.a(i), HashFamily.b(i))
      assert(a % 2 == 1 && a >= 1 && a < (1L << 31), s"a($i)=$a out of bounds")
      assert(b >= 0 && b < HashFamily.P, s"b($i)=$b out of bounds")
    }
    // seeds produce distinct permutations (no duplicate (a, b) pairs)
    val pairs = (0 until 1100).map(i => (HashFamily.a(i), HashFamily.b(i)))
    assert(pairs.distinct.size == pairs.size)
  }

  test("property: affine family output stays in [0, P) and separates inputs") {
    import graft.functions.HashFamily
    val xs = (0L until 1000L).map(x => x * 999983L % HashFamily.P)
    (0 until 16).foreach { i =>
      val hs = xs.map(x => (HashFamily.a(i) * x + HashFamily.b(i)) % HashFamily.P)
      assert(hs.forall(h => h >= 0 && h < HashFamily.P))
      // 2-universal family on distinct inputs: collisions ~ n^2/2P ≈ 0 here
      assert(hs.distinct.size == hs.size, s"seed $i collided unexpectedly")
    }
  }

  test("property: TwoPhase prefix sum equals the sequential scan for random inputs") {
    import graft.ops.TwoPhase
    // random key sets (duplicated keys excluded — the order must be total),
    // random values incl. zeros, random bin counts incl. degenerate bins=1
    for (s <- 1L to 6L) {
      val keys = sample(Gen.listOfN(200, Gen.chooseNum(-5000L, 5000L)), s).distinct
      val rows = keys.map(k => (k, sample(Gen.chooseNum(0L, 99L), s * 7919 + k)))
      val bins = sample(Gen.chooseNum(1, 40), s + 50)
      val (got, total) = TwoPhase.prefixSum(rows.toDF("k", "v"), col("k"),
        Seq(col("k")), col("v"), "cum", bins)
      val gotMap = got.select("k", "cum").as[(Long, Long)].collect().toMap
      val expect = rows.sortBy(_._1).scanLeft((0L, 0L)) {
        case ((_, acc), (k, v)) => (k, acc + v)
      }.tail.toMap
      assert(gotMap == expect, s"seed $s bins=$bins diverged")
      assert(total == rows.map(_._2).sum)
    }
  }

  test("property: histogramQuantiles == percentile() on random quantized data") {
    for (s <- 1L to 4L) {
      val n = 40 + (s * 37 % 120).toInt
      val rows = (1 to n).map { i =>
        val g = "g" + sample(Gen.chooseNum(0, 2), s * 1000 + i)
        (g, sample(Gen.chooseNum(0, 40), s * 2000 + i) * 0.25)
      }
      val df = rows.toDF("g", "v")
      val qs = Seq(0.25, 0.5, 0.75, 0.9)
      val expect = df.groupBy("g")
        .agg(expr(s"percentile(v, array(${qs.mkString(",")}))").as("p"))
        .select(col("g"), posexplode(col("p")))
        .collect().map(r => ((r.getString(0), qs(r.getInt(1))), r.getDouble(2))).toMap
      val got = Relational.histogramQuantiles(df, "g", "v", qs)
        .collect().map(r => ((r.getString(0), r.getDouble(1)), r.getDouble(2))).toMap
      assert(got == expect, s"seed $s diverged")
    }
  }

  test("property: anti-join dedup is idempotent and disjoint from existing") {
    for (s <- 1L to 5L) {
      val in = sample(idGen, s)
      val ex = sample(Gen.listOfN(8, Gen.chooseNum(1L, 12L)), s + 100)
      val out = Relational.antiDedup(in.toDF("k"), ex.toDF("k"), Seq("k"))
      val keys = out.select("k").as[Long].collect().toSet
      assert(keys.intersect(ex.toSet).isEmpty)
      assert(Relational.antiDedup(out, ex.toDF("k"), Seq("k")).count() == out.count())
    }
  }

  test("property: union-all preserves total counts") {
    for (s <- 1L to 5L) {
      val a = sample(idGen, s)
      val b = sample(idGen, s + 50)
      assert(a.toDF("k").unionByName(b.toDF("k")).count() == a.size + b.size)
    }
  }

  test("property: tumbling window counts total the global count (q18 => q14)") {
    val tsGen = Gen.listOfN(25, Gen.chooseNum(0L, 86400L * 20))
    for (s <- 1L to 5L) {
      val secs = sample(tsGen, s)
      val df = secs.toDF("s").select(timestamp_seconds(col("s")).as("ts"))
      val total = Relational.tumblingCounts(df, "ts", "1 day").agg(sum("cnt")).as[Long].head()
      assert(total == secs.size)
    }
  }

  test("property: sentiment label always consistent with score thresholds") {
    for (s <- 1L to 20L) {
      val c = sample(Gen.chooseNum(-1.0, 1.0), s)
      val l = Seq(c).toDF("c").select(Sentiment.label(col("c")).as("l")).as[String].head()
      val expected = if (c >= 0.05) "positive" else if (c <= -0.05) "negative" else "neutral"
      assert(l == expected, s"compound=$c")
    }
  }

  test("property: exact dedup output count equals distinct text count") {
    val textGen = Gen.listOfN(20, Gen.oneOf("a", "b", "c", "d", "e"))
    for (s <- 1L to 5L) {
      val texts = sample(textGen, s)
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      assert(Dedup.exactDedup(docs, "doc_id", "text").count() == texts.distinct.size)
    }
  }

  test("property: anti-join union semi-join partitions the input (q12)") {
    for (s <- 1L to 5L) {
      val in = sample(idGen, s).toDF("k")
      val ex = sample(Gen.listOfN(8, Gen.chooseNum(1L, 12L)), s + 7).toDF("k")
      val anti = in.join(ex, Seq("k"), "left_anti").count()
      val semi = in.join(ex, Seq("k"), "left_semi").count()
      assert(anti + semi == in.count())
    }
  }

  test("property: chunking covers every token exactly once per stride window (q128)") {
    val wordGen = Gen.listOfN(40, Gen.oneOf("aa", "b", "ccc", "dd"))
    for (s <- 1L to 5L) {
      val n = 1 + (s * 11 % 37).toInt
      val words = sample(wordGen, s).take(n)
      val doc = words.mkString(" ")
      val chunks = graft.ops.Curation.chunkDocuments(
        Seq((1L, doc)).toDF("doc_id", "text"), "doc_id", "text", 7, 5)
        .orderBy("chunk_id")
        .as[(Long, Long, String, Long)].collect()
      // window count and coverage invariants for any doc length
      assert(chunks.length == math.max(1, math.ceil(n / 5.0).toInt))
      chunks.foreach { case (_, cid, chunk, ct) =>
        val start = (cid * 5).toInt
        val expect = words.slice(start, start + 7)
        assert(chunk == expect.mkString(" ") && ct == expect.length)
      }
      // stride-prefix concatenation rebuilds the document exactly
      val rebuilt = chunks.map { case (_, _, c, _) =>
        c.split(" ").take(5).mkString(" ")
      }.filter(_.nonEmpty).mkString(" ")
      assert(rebuilt == doc)
    }
  }

  test("property: topKPerQuery == reference window top-k on random scored sets") {
    import org.apache.spark.sql.expressions.Window
    import graft.ops.Similarity
    // random scores INCLUDING planted ties, random partitioning — the
    // two-phase heap+merge must agree with the classic window formulation
    // under the total order (cosine desc, neighbor_id asc)
    val rowsGen = Gen.listOfN(400, for {
      q <- Gen.chooseNum(1L, 6L)
      n <- Gen.chooseNum(100L, 160L)
      c <- Gen.oneOf(Gen.chooseNum(0, 1000).map(_ / 1000.0), Gen.const(0.5))
    } yield (q, n, c))
    for (seed <- 1L to 3L) {
      val rows = sample(rowsGen, seed)
        .groupBy(t => (t._1, t._2)).map(_._2.head).toSeq // unique (query, neighbor)
      val scored = rows.toDF("query_id", "neighbor_id", "cosine").repartition(7)
      val got = Similarity.topKPerQuery(scored, 5)
        .as[(Long, Long, Double, Long)].collect().toSet
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("cosine").desc, col("neighbor_id"))
      val expect = scored.withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= 5)
        .select(col("query_id"), col("neighbor_id"),
          round(col("cosine"), 4).as("cosine"), col("rn"))
        .as[(Long, Long, Double, Long)].collect().toSet
      assert(got == expect && got.nonEmpty, s"seed $seed mismatch")
    }
  }

  test("property: clampedBalance equals the sequential clamped scan; " +
      "never negative; equals the plain sum when nothing overdraws") {
    import graft.ops.Stats
    val deltaGen = Gen.listOfN(40, Gen.chooseNum(-50L, 80L))
    for (seed <- 1L to 5L) {
      val ds = sample(deltaGen, seed).zipWithIndex
        .map { case (d, i) => ("k", i.toLong, d) }
      val df = ds.toDF("k", "seq", "d")
      val got = Stats.clampedBalance(df, "k", Seq("seq"), "d")
        .select("balance").as[Long].collect().head
      val expect = ds.map(_._3).foldLeft(0L)((acc, d) => math.max(acc + d, 0L))
      assert(got == expect && got >= 0, s"seed $seed: $got != $expect")
    }
    // all-positive deltas: the floor never engages
    val pos = (1L to 20L).map(i => ("k", i, i)).toDF("k", "seq", "d")
    val g = Stats.clampedBalance(pos, "k", Seq("seq"), "d")
      .select("balance").as[Long].collect().head
    assert(g == (1L to 20L).sum)
  }

  test("property: weightedMedian equals the brute-force scan pick") {
    import graft.ops.Relational
    val rowGen = Gen.listOfN(60, for {
      amt <- Gen.chooseNum(1L, 30L)
      w <- Gen.chooseNum(1L, 9L)
    } yield (amt, w))
    for (seed <- 1L to 5L) {
      val rows = sample(rowGen, seed).zipWithIndex
        .map { case ((a, w), i) => (a, w, i.toLong) }
      val df = rows.toDF("amt", "w", "id")
      val got = Relational.weightedMedian(df, "amt", "w", Seq("id"))
        .as[(Long, Long)].collect().head
      val total = rows.map(_._2).sum
      val sorted = rows.sortBy(r => (r._1, r._3))
      var cum = 0L
      val pick = sorted.find { r => cum += r._2; 2 * cum >= total }.get._1
      assert(got == ((pick, total)), s"seed $seed: $got vs ($pick, $total)")
    }
  }

  test("property: modePerGroup equals the brute-force argmax with the tie rule") {
    import graft.ops.Stats
    val vGen = Gen.listOfN(80, Gen.chooseNum(0L, 9L))
    for (seed <- 1L to 5L) {
      val vs = sample(vGen, seed).map(v => ("g", v))
      val got = Stats.modePerGroup(vs.toDF("g", "v"), "g", "v")
        .as[(String, Long, Long)].collect().head
      val counts = vs.groupBy(_._2).view.mapValues(_.size.toLong).toMap
      val best = counts.toSeq.sortBy { case (v, n) => (-n, v) }.head
      assert(got == (("g", best._1, best._2)), s"seed $seed: $got vs $best")
    }
  }

  test("property: emdDriftByGroup equals the brute-force CDF integral") {
    import graft.ops.Stats
    val vGen = Gen.listOfN(60, Gen.zip(Gen.oneOf("a", "b", "c"), Gen.chooseNum(0L, 20L)))
    for (seed <- 1L to 5L) {
      val vs = sample(vGen, seed)
      val got = Stats.emdDriftByGroup(vs.toDF("g", "u"), "g", "u")
        .as[(String, Long, Long, Long, Double)].collect()
        .map(r => (r._1, r._4)).toMap
      val units = vs.map(_._2).distinct.sorted
      val n = vs.size.toLong
      vs.map(_._1).distinct.foreach { g =>
        val ing = vs.filter(_._1 == g).map(_._2)
        val ng = ing.size.toLong; val nr = n - ng
        // brute force: walk the sorted unit grid accumulating both CDFs
        var (cumG, cumR, emd) = (0L, 0L, BigInt(0))
        units.zipWithIndex.foreach { case (u, i) =>
          cumG += ing.count(_ == u)
          cumR += vs.count(r => r._1 != g && r._2 == u)
          if (i + 1 < units.size)
            emd += BigInt((cumG * nr - cumR * ng).abs) * (units(i + 1) - u)
        }
        assert(BigInt(got(g)) == emd, s"seed $seed group $g: ${got(g)} vs $emd")
      }
    }
  }

  test("property: bestF1Threshold equals the brute-force sweep") {
    import graft.ops.Stats
    val gen = Gen.listOfN(40, Gen.zip(Gen.chooseNum(0L, 15L), Gen.oneOf(true, false)))
    for (seed <- 1L to 5L) {
      val vs = sample(gen, seed)
      val pos = vs.count(_._2).toLong
      if (pos > 0) {
        val got = Stats.bestF1Threshold(vs.toDF("s", "lab"), "lab", "s")
          .as[(Long, Long, Long, Long, Double)].collect().head
        val best = vs.map(_._1).distinct.map { t =>
          val tp = vs.count(r => r._1 >= t && r._2).toLong
          val cn = vs.count(_._1 >= t).toLong
          ((2 * tp * 1000000L) / (cn + pos), t, tp, cn)
        }.max // (f1 micro, then larger threshold) — the engine's tie rule
        assert((got._1, got._2, got._3) == ((best._2, best._3, best._4 - best._3)),
          s"seed $seed: $got vs $best")
      }
    }
  }
}
