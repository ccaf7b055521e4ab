package graft

import org.apache.spark.sql.functions._
import graft.ops.Policy

/** Operator-level checks for the round-14 keys (q418–q441) beyond the
  * DuckDB gate: invariants the gate's value-compare can't see (loud
  * failure on bad policy actions, DP band semantics, recursion identities),
  * each on tiny inline frames or sf0.001.
  */
class Round14Spec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  // ----------------------------------------------------------------- Policy

  test("Policy: unknown action fails loudly, never passes data through") {
    val df = Seq((1L, "alice")).toDF("id", "name")
    val boom = intercept[IllegalArgumentException] {
      Policy.applyPolicy(df,
        Seq(Policy.Rule("r", "name", "redactt_tail", "3")),
        roles = Seq("r"), keepCols = Seq("id", "name"))
    }
    assert(boom.getMessage.contains("unknown policy action"))
  }

  test("Policy: masks compose with the row filter; admin passthrough intact") {
    val df = Seq((1L, "alice", 10.0), (2L, "bob", 20.0)).toDF("id", "name", "bal")
    val out = Policy.applyPolicy(df,
      Seq(Policy.Rule("a", "name", "redact_tail", "2"),
        Policy.Rule("a", "bal", "nullify", ""),
        Policy.Rule("a", "__row_filter__", "id <> 2", "")),
      roles = Seq("a", "admin"), keepCols = Seq("id", "name", "bal"))
      .orderBy("role", "id")
      .as[(String, Long, String, Option[Double])].collect()
    assert(out.toSeq == Seq(
      ("a", 1L, "al***", None),
      ("admin", 1L, "alice", Some(10.0)),
      ("admin", 2L, "bob", Some(20.0))))
  }

  // ------------------------------------------------------------------- CUSUM
  // the reflected-walk window identity must equal the direct sequential
  // recursion S_i = max(0, S_{i-1} + inc_i) — replay it from the key's own
  // output increments

  test("q421: windowed CUSUM equals the sequential max(0, S+inc) recursion") {
    val rows = SparkEntry.queries("q421_cusum_control")(spark, sf)
      .select("event_type", "day", "inc", "s_scaled")
      .as[(String, String, Long, Long)].collect()
    rows.groupBy(_._1).foreach { case (_, days) =>
      var s = 0L
      days.sortBy(_._2).foreach { case (_, _, inc, got) =>
        s = math.max(0L, s + inc)
        assert(got == s, s"CUSUM mismatch: got $got want $s")
      }
    }
  }

  // ----------------------------------------------------------------- pass@k
  // exact hand case: n=10, c=3 → pass@1 = 0.3, pass@10 = 1.0, and
  // pass@5 = 1 - C(7,5)/C(10,5) = 1 - 21/252

  test("q420: pass@k matches the order-specified reference fold on every row") {
    def ref(n: Long, c: Long, k: Int): Double =
      if (n - c < k) 1.0
      else 1.0 - (0 until k).foldLeft(1.0) { (acc, i) =>
        acc * ((n - c - i).toDouble / (n - i).toDouble)
      }
    val r = SparkEntry.queries("q420_pass_at_k")(spark, sf)
      .select("n", "c", "pass_at_1", "pass_at_5", "pass_at_10")
      .as[(Long, Long, Double, Double, Double)].collect()
    assert(r.nonEmpty)
    r.foreach { case (n, c, p1, p5, p10) =>
      assert(p1 == ref(n, c, 1), s"pass@1 n=$n c=$c")
      assert(p5 == ref(n, c, 5), s"pass@5 n=$n c=$c")
      assert(p10 == ref(n, c, 10), s"pass@10 n=$n c=$c")
      assert(p1 >= 0.0 && p1 <= p5 && p5 <= p10 && p10 <= 1.0)
    }
  }

  // -------------------------------------------------------------------- DTW
  // identical series must cost 0 even under the band; a single spike costs
  // exactly its |amplitude| once (the alignment absorbs the rest)

  test("q431: DTW matches an independent Scala band-DP bit for bit") {
    val out = SparkEntry.queries("q431_dtw_distance")(spark, sf)
      .select("ta", "tb", "dtw").as[(String, String, Long)].collect()
    assert(out.length == 10, s"5 types -> 10 pairs, got ${out.length}")
    // symmetry of the metric: (a,b) emitted once with ta < tb
    assert(out.forall { case (a, b, _) => a < b })
    // independent reference: rebuild the dense daily series and run the
    // Sakoe-Chiba w=3 DP in plain Scala; the query must match EXACTLY,
    // and the banded cost must sit between the unbanded DTW (band only
    // restricts paths) and the diagonal-path upper bound (always in-band)
    val byDay = spark.read.parquet(s"$sf/events.parquet")
      .groupBy(col("event_type"), dayofmonth(col("ts")).cast("long").as("day"))
      .count().as[(String, Long, Long)].collect()
      .groupBy(_._1).map { case (t, rs) =>
        val m = rs.map(r => r._2 -> r._3).toMap
        t -> (1L to 31L).map(d => m.getOrElse(d, 0L)).toArray
      }
    def dtw(a: Array[Long], b: Array[Long], w: Int): Long = {
      val INF = 1000000000000000L
      val n = a.length
      var prev = Array.fill(n)(INF)
      for (i <- 0 until n) {
        val cur = Array.fill(n)(INF)
        for (j <- 0 until n if math.abs(i - j) <= w) {
          val best =
            if (i == 0 && j == 0) 0L
            else Seq(if (i > 0) prev(j) else INF,
                     if (j > 0) cur(j - 1) else INF,
                     if (i > 0 && j > 0) prev(j - 1) else INF).min
          cur(j) = math.abs(a(i) - b(j)) + best
        }
        prev = cur
      }
      prev(n - 1)
    }
    out.foreach { case (ta, tb, got) =>
      val (a, b) = (byDay(ta), byDay(tb))
      val banded = dtw(a, b, 3)
      val unbanded = dtw(a, b, 31)
      val diag = a.zip(b).map { case (x, y) => math.abs(x - y) }.sum
      assert(got == banded, s"$ta/$tb: query $got vs reference $banded")
      assert(unbanded <= banded && banded <= diag,
        s"$ta/$tb: band ordering violated ($unbanded, $banded, $diag)")
      assert(dtw(a, a, 3) == 0L, "self-distance must be zero")
    }
  }

  // --------------------------------------------------------------- k-center
  // the radius curve must be non-increasing: adding a center can only
  // shrink the farthest-point distance

  test("q430: k-center radius curve is non-increasing") {
    val rad = SparkEntry.queries("q430_kcenter_seeds")(spark, sf)
      .filter(col("r") > 0).orderBy("r")
      .select("radius").as[Double].collect()
    assert(rad.length == 7)
    rad.sliding(2).foreach { case Array(a, b) =>
      assert(b <= a + 1e-9, s"radius grew: $a -> $b")
    }
  }

  // ------------------------------------------------------------ Mann-Whitney
  // U1 + U2 = n1*n2 (doubled: u2_arm1 + u2_arm0 = 2*n1*n2) — recompute the
  // other arm's U from the same frame by symmetry

  test("q429: doubled U matches the pairwise definition; arms sum to 2*n1*n2") {
    val r = SparkEntry.queries("q429_mannwhitney_u")(spark, sf)
      .select("event_type", "n1", "n2", "u2")
      .as[(String, Long, Long, Long)].collect()
    assert(r.nonEmpty)
    // independent recomputation from the raw rows: doubled U(arm1) =
    // 2*#{x1 > x0} + #{x1 == x0} over every cross-arm pair (the histogram
    // rank-sum route in the query never enumerates pairs — this does)
    val byType = spark.read.parquet(s"$sf/events.parquet")
      .select(col("event_type"),
        expr("CAST(round(value * 100, 0) AS BIGINT)").as("cents"),
        pmod(col("user_id"), lit(2L)).as("arm"))
      .as[(String, Long, Long)].collect().groupBy(_._1)
    def doubledU(win: Seq[Long], lose: Seq[Long]): Long =
      win.iterator.map { x =>
        2L * lose.count(x > _) + lose.count(x == _)
      }.sum
    r.foreach { case (t, n1, n2, u2) =>
      val (a1, a0) = byType(t).toSeq.partition(_._3 == 1L)
      assert(n1 == a1.length && n2 == a0.length, s"$t arm sizes")
      assert(u2 == doubledU(a1.map(_._2), a0.map(_._2)),
        s"$t: u2=$u2 disagrees with the pairwise definition")
      // symmetry identity on the INDEPENDENTLY computed other arm
      assert(u2 + doubledU(a0.map(_._2), a1.map(_._2)) == 2L * n1 * n2)
    }
  }

  // ------------------------------------------------------------------ Merkle
  // every differing leaf must sit under a differing root: the descent
  // property that makes log-pruning sound

  test("q428: a differing leaf implies a differing ancestor at every level") {
    val diffs = SparkEntry.queries("q428_merkle_ranges")(spark, sf)
      .select("level", "node_id").as[(Long, Long)].collect().toSet
    val leaves = diffs.filter(_._1 == 0L)
    assert(leaves.nonEmpty, "planted edits must surface at leaf level")
    leaves.foreach { case (_, n) =>
      assert(diffs.contains((1L, n / 32)), s"leaf $n missing level-1 parent")
      assert(diffs.contains((2L, 0L)), "root must differ")
    }
  }

  // --------------------------------------------------------------- hierarchy

  // ------------------------------------------------------------------- MIPS
  // the norm-augmentation reduction is exact: transformed-cosine argmax
  // must equal exact-dot argmax on every query (ties aside, which the
  // fixture's random vectors don't produce)

  test("q436: MIPS-transform argmax agrees with exact dot argmax everywhere") {
    val rows = SparkEntry.queries("q436_mips_transform")(spark, sf)
      .select("agree").as[Boolean].collect()
    assert(rows.length == 8 && rows.forall(identity),
      s"reduction must be exact on this fixture: ${rows.mkString(",")}")
  }

  // -------------------------------------------------------------------- LOF
  // uniform random vectors have no density structure: LOF must hover
  // around 1 (the inlier value); a fence at [0.5, 2] catches a broken
  // lrd/reach-dist chain without overfitting the fixture

  test("q438: LOF of uniform-noise probes stays near the inlier value 1") {
    val lofs = SparkEntry.queries("q438_lof")(spark, sf)
      .select("lof").as[Double].collect()
    assert(lofs.length == 32)
    lofs.foreach(v => assert(v > 0.5 && v < 2.0, s"LOF $v outside sanity fence"))
  }

  test("q426: every path walks node -> root with depth segments") {
    val rows = SparkEntry.queries("q426_hierarchy_paths")(spark, sf)
      .select("node", "root", "depth", "path").as[(String, String, Long, String)]
      .collect()
    assert(rows.forall { case (n, r, d, p) =>
      val segs = p.split("/")
      segs.head == n && segs.last == r && segs.length == d + 1
    })
    assert(rows.filter(_._1.startsWith("c:")).forall(_._3 == 2L))
    assert(rows.filter(_._1.startsWith("r:")).forall(r => r._1 == r._2))
  }
}
