package graft

import org.apache.spark.sql.functions._

/** Operator-level checks for the round-15 density-scaled keys (q442–q448)
  * beyond the DuckDB gate: the invariants the value-compare can't see —
  * knob derivations, full recall of the deletion neighborhood, identity
  * with the pinned yardstick keys, and brute-force parity on tiny SFs.
  */
class Round15Spec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("q442: sample is id % max(1, n/128) = 0 and every row is sampled") {
    val n = spark.read.parquet(s"$sf/embeddings.parquet").count()
    val mod = math.max(1L, n / 128L)
    val ids = SparkEntry.queries("q442_silhouette_scaled")(spark, sf)
      .select("vec_id").as[Long].collect()
    assert(ids.forall(_ % mod == 0), "a non-sample id leaked into the output")
    assert(ids.length == (0L until n).count(_ % mod == 0),
      "every sampled point must surface (a and b exist at this SF)")
  }

  test("q443: cells are the power of two above n/32; drops have a witness") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .as[(Long, Seq[Double])].collect().toMap
    val n = emb.size.toLong
    var cells = 1L
    while (cells <= n / 32L) cells *= 2
    val out = SparkEntry.queries("q443_semdedup_lsh")(spark, sf)
      .select("vec_id", "cell", "kept").as[(Long, Long, Long)].collect()
    assert(out.length == n.toInt)
    assert(out.forall(r => r._2 >= 0 && r._2 < cells),
      s"cell out of [0, $cells)")
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / math.sqrt(a.map(x => x * x).sum * b.map(x => x * x).sum)
    }
    val byCell = out.groupBy(_._2)
    out.filter(_._3 == 0L).foreach { case (id, cell, _) =>
      val witness = byCell(cell).exists { case (lo, _, _) =>
        lo < id && cos(emb(id), emb(lo)) > 0.4
      }
      assert(witness, s"dropped $id has no lower-id cos>0.4 witness in cell $cell")
    }
    // kept rows: no witness may exist (the prune is exact within a cell)
    out.filter(_._3 == 1L).foreach { case (id, cell, _) =>
      val witness = byCell(cell).exists { case (lo, _, _) =>
        lo < id && cos(emb(id), emb(lo)) > 0.4
      }
      assert(!witness, s"kept $id actually has a witness in cell $cell")
    }
  }

  test("q444: the rank-difference count IS q62's interval-join count") {
    val viaRank = SparkEntry.queries("q444_range_count_rank")(spark, sf)
      .select("event_id", "clicks_nearby").as[(Long, Long)].collect().toMap
    val viaJoin = SparkEntry.queries("q62_range_join")(spark, sf)
      .select("event_id", "clicks_nearby").as[(Long, Long)].collect().toMap
    assert(viaRank == viaJoin, "same semantics, different algorithm — must agree")
  }

  test("q445: deletion neighborhood has FULL recall at lev <= 1") {
    val names = spark.read.parquet(s"$sf/customer.parquet")
      .select(col("c_name"), col("c_custkey"))
      .as[(String, Long)].collect()
      .groupBy(_._1).map { case (nm, rs) => nm -> rs.map(_._2).min }.toSeq ++
      Seq("Customer#A00001111" -> 900000001L, "Customer#B00001111" -> 900000002L)
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val truth = (for {
      (na, ga) <- names; (nb, gb) <- names
      if ga < gb && lev(na, nb) <= 1
    } yield (ga, gb)).toSet
    val got = SparkEntry.queries("q445_name_group_join")(spark, sf)
      .select("gid_a", "gid_b").as[(Long, Long)].collect().toSet
    assert(got == truth,
      s"missed=${(truth -- got).take(3)} extra=${(got -- truth).take(3)}")
  }

  test("q446: entities are closed over q445's pairs and sizes add up") {
    val pairs = SparkEntry.queries("q445_name_group_join")(spark, sf)
      .select("gid_a", "gid_b").as[(Long, Long)].collect()
    val ent = SparkEntry.queries("q446_er_groups")(spark, sf)
      .select("gid", "entity_id", "n_groups", "n_members")
      .as[(Long, Long, Long, Long)].collect()
    val label = ent.map(r => r._1 -> r._2).toMap
    pairs.foreach { case (a, b) =>
      assert(label(a) == label(b), s"pair ($a,$b) split across entities")
    }
    // every entity label is the min gid of its members (min-label converged)
    ent.groupBy(_._2).foreach { case (e, rows) =>
      assert(rows.map(_._1).min == e, s"entity $e is not its min member")
      assert(rows.forall(_._3 == rows.length), s"entity $e n_groups wrong")
    }
    val total = spark.read.parquet(s"$sf/customer.parquet").count() + 2
    assert(ent.groupBy(_._2).map(_._2.head._4).sum == total,
      "entity member counts must partition the member universe")
  }

  test("q447: exactly q276's listing gated to est>=0.5 and sim_bp>=9000") {
    val full = SparkEntry.queries("q276_editdist_confirm")(spark, sf)
      .filter(col("est_jaccard") >= 0.5 && col("sim_bp") >= 9000)
      .select("id_a", "id_b", "lev").as[(Long, Long, Long)].collect().toSet
    val pruned = SparkEntry.queries("q447_confirm_pruned")(spark, sf)
      .select("id_a", "id_b", "lev").as[(Long, Long, Long)].collect().toSet
    assert(pruned == full,
      "the prefilter must be semantics-preserving at the 9000 bp threshold")
  }

  test("q449: the bucketed serving read path returns exactly q58's answer") {
    val served = SparkEntry.queries("q449_ann_serving")(spark, sf)
      .select("query_id", "neighbor_id", "rn").as[(Long, Long, Long)]
      .collect().toSet
    val direct = SparkEntry.queries("q58_ann_ivf")(spark, sf)
      .select("query_id", "neighbor_id", "rn").as[(Long, Long, Long)]
      .collect().toSet
    assert(served == direct,
      "the layout changes where the index lives, never what the search returns")
  }

  test("q450: Lloyd training strictly decreases exact within-cell distortion") {
    val r = SparkEntry.queries("q450_ivf_train_readout")(spark, sf)
      .select("variant", "sum_d2", "n_vecs", "hits_at_5")
      .as[(String, Long, Long, Long)].collect().map(x => x._1 -> x).toMap
    val n = spark.read.parquet(s"$sf/embeddings.parquet").count()
    assert(r("seed")._3 == n && r("trained")._3 == n, "every vector assigned")
    assert(r("trained")._2 < r("seed")._2,
      s"Lloyd must reduce distortion: ${r("trained")._2} !< ${r("seed")._2}")
    assert(r("seed")._4 >= 0 && r("trained")._4 >= 0)
  }

  test("q448: brute-force parity under the density-derived radius") {
    val out = SparkEntry.queries("q448_radius_scaled")(spark, sf)
      .select("u_a", "n_neighbors", "min_dist2", "sum_dist2")
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    val users = spark.read.parquet(s"$sf/events.parquet")
      .filter(col("user_id").isNotNull)
      .select("user_id").distinct().as[Long].collect()
    val r2 = math.max(1L, 33750000L / users.length)
    val pts = users.map(u => u -> ((u * 7919 % 1001) - 500, (u * 104729 % 1001) - 500)).toMap
    users.foreach { u =>
      val ds = users.filter(_ != u).map { v =>
        val (xa, ya) = pts(u); val (xb, yb) = pts(v)
        (xa - xb) * (xa - xb) + (ya - yb) * (ya - yb)
      }.filter(_ <= r2)
      if (ds.isEmpty) assert(!out.contains(u))
      else {
        val (n, mn, sm) = out(u)
        assert(n == ds.length && mn == ds.min && sm == ds.sum,
          s"user $u: got ($n,$mn,$sm) want (${ds.length},${ds.min},${ds.sum})")
      }
    }
  }
}
