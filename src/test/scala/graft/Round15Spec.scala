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

  test("q444: the rank-difference count IS the interval-join count (retired q62 shape)") {
    // the superlinear original — pair-enumerating binned interval join —
    // rebuilt inline as the yardstick (q62 now registers q444's plan)
    val ev = Tables.events(spark, sf)
    val signups = ev.filter(col("event_type") === "signup")
      .select(col("event_id"), col("ts"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("ts").as("click_ts"))
    val viaJoin = ops.Relational.binnedRangeJoin(signups, clicks, "ts", "click_ts",
      before = "30 minutes", after = "30 minutes", binWidth = "1 hour")
      .groupBy(col("event_id")).agg(count(lit(1)).as("clicks_nearby"))
      .select("event_id", "clicks_nearby").as[(Long, Long)].collect().toMap
    val viaRank = SparkEntry.queries("q444_range_count_rank")(spark, sf)
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

  test("q447: exactly the full confirm listing gated to est>=0.5 and sim_bp>=9000 (retired q276 shape)") {
    // the superlinear original — exact levenshtein over EVERY banded
    // candidate — rebuilt inline as the yardstick (q276 now registers
    // q447's estimate-gated plan)
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val (pairs, _) = SparkEntry.dedupIndex(spark, sf)
    val t = docs.select(col("doc_id"), col("text"))
    val full = pairs
      .join(t.select(col("doc_id").as("id_a"), col("text").as("__ta")), "id_a")
      .join(t.select(col("doc_id").as("id_b"), col("text").as("__tb")), "id_b")
      .withColumn("lev", levenshtein(col("__ta"), col("__tb")).cast("long"))
      .withColumn("sim_bp", (lit(10000L) - expr(
        "(10000 * lev) div greatest(length(__ta), length(__tb), 1)")).cast("long"))
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

  // ------------------------------------------------------------- retired
  // Round-17: the four remaining superlinear originals (q127/q203/q273/
  // q394's old shapes) live ONLY here — each rebuilt inline and pinned
  // against its registered twin or brute force, so the yardstick semantics
  // stay exercised without shipping a melting plan under a registered key.

  test("retired q127 shape: every row-level fuzzy pair has a q445 group-pair witness") {
    val rowPairs = SparkEntry.fuzzyCustomerPairs(spark, sf)
      .select("key_a", "key_b").as[(Long, Long)].collect()
    assert(rowPairs.nonEmpty, "fixture pairs must exist")
    val names = spark.read.parquet(s"$sf/customer.parquet")
      .select(col("c_custkey"), col("c_name")).as[(Long, String)].collect() ++
      Seq((900000001L, "Customer#A00001111"), (900000002L, "Customer#B00001111"))
    val gidOf = names.groupBy(_._2).iterator.flatMap { case (_, rs) =>
      val g = rs.map(_._1).min; rs.map(r => r._1 -> g)
    }.toMap
    val groupPairs = SparkEntry.queries("q445_name_group_join")(spark, sf)
      .select("gid_a", "gid_b").as[(Long, Long)].collect().toSet
    rowPairs.foreach { case (a, b) =>
      val (ga, gb) = (gidOf(a), gidOf(b))
      assert(ga == gb || groupPairs((math.min(ga, gb), math.max(ga, gb))),
        s"row pair ($a,$b) in groups ($ga,$gb) has no q445 witness — " +
          "the group join lost recall the row join had")
    }
  }

  test("retired q203 shape: the member-level closure refines q446's entities") {
    // original member-level MDM, inline: row pairs -> components -> entity
    val base = spark.read.parquet(s"$sf/customer.parquet").select(col("c_custkey"))
      .unionByName(Seq(900000001L, 900000002L).toDF("c_custkey"))
    val pairs = SparkEntry.fuzzyCustomerPairs(spark, sf)
      .select(col("key_a").as("id_a"), col("key_b").as("id_b"))
    val comp = ops.Dedup.connectedComponents(pairs)
    val memberEntity = base.join(comp, base("c_custkey") === comp("node"), "left")
      .select(col("c_custkey"),
        coalesce(col("component"), col("c_custkey")).as("entity_id"))
      .as[(Long, Long)].collect().toMap
    // q446's entity per MEMBER = the entity of the member's name group
    val names = spark.read.parquet(s"$sf/customer.parquet")
      .select(col("c_custkey"), col("c_name")).as[(Long, String)].collect() ++
      Seq((900000001L, "Customer#A00001111"), (900000002L, "Customer#B00001111"))
    val gidOf = names.groupBy(_._2).iterator.flatMap { case (_, rs) =>
      val g = rs.map(_._1).min; rs.map(r => r._1 -> g)
    }.toMap
    val groupEntity = SparkEntry.queries("q446_er_groups")(spark, sf)
      .select("gid", "entity_id").as[(Long, Long)].collect().toMap
    // q445 ⊇ q127's pair set (full deletion-neighborhood recall), so the
    // member closure can only SPLIT what the group closure merges, never
    // the reverse: same member entity ⇒ same group entity
    memberEntity.groupBy(_._2).values.foreach { members =>
      val groupEnts = members.keys.map(m => groupEntity(gidOf(m))).toSet
      assert(groupEnts.size == 1,
        s"a member-level entity spans group entities $groupEnts")
    }
  }

  test("retired q273 shape: fixed-k SemDeDup kept flags match their witnesses") {
    val embDf = spark.read.parquet(s"$sf/embeddings.parquet")
    val trained = ops.Similarity.ivfTrainMicro(embDf, "vec_id", "embedding",
      k = 4, iterations = 2)
    val assigned = ops.Similarity.microAssign(embDf, "vec_id", "embedding", trained)
    val withVec = assigned.join(embDf.select(col("vec_id"), col("embedding")), "vec_id")
    val hi = withVec.select(col("cell"), col("vec_id").as("__ih"), col("embedding").as("vh"))
    val lo = withVec.select(col("cell"), col("vec_id").as("__il"), col("embedding").as("vl"))
    val dropped = hi.join(lo, Seq("cell"))
      .filter(col("__il") < col("__ih"))
      .filter((ops.Similarity.dot("vh", "vl") /
        (ops.Similarity.norm("vh") * ops.Similarity.norm("vl"))) > 0.4)
      .select(col("__ih").as("vec_id")).distinct()
      .as[Long].collect().toSet
    val cells = assigned.select("vec_id", "cell").as[(Long, Long)].collect().toMap
    val emb = embDf.select(col("vec_id"), col("embedding").cast("array<double>"))
      .as[(Long, Seq[Double])].collect().toMap
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / math.sqrt(a.map(x => x * x).sum * b.map(x => x * x).sum)
    }
    emb.keys.foreach { id =>
      val witness = emb.keys.exists(lo =>
        lo < id && cells(lo) == cells(id) && cos(emb(id), emb(lo)) > 0.4)
      assert(dropped(id) == witness,
        s"vec $id: dropped=${dropped(id)} but witness=$witness in cell ${cells(id)}")
    }
  }

  test("retired q394 shape: fixed-knob grid join equals brute force at r=150") {
    val users = spark.read.parquet(s"$sf/events.parquet")
      .filter(col("user_id").isNotNull)
      .select("user_id").distinct().as[Long].collect()
    val pts = users.map(u => u -> ((u * 7919 % 1001) - 500, (u * 104729 % 1001) - 500)).toMap
    // the original fixed 200-cell/150-radius plan, inline
    val u = spark.read.parquet(s"$sf/events.parquet")
      .filter(col("user_id").isNotNull)
      .select(col("user_id")).distinct()
      .select(col("user_id"),
        (col("user_id") * 7919L % 1001L - 500L).as("px"),
        (col("user_id") * 104729L % 1001L - 500L).as("py"))
    val cell = u
      .withColumn("cx", expr("(px + 500) div 200"))
      .withColumn("cy", expr("(py + 500) div 200"))
    val probe = cell
      .withColumn("dx", explode(array(lit(-1L), lit(0L), lit(1L))))
      .withColumn("dy", explode(array(lit(-1L), lit(0L), lit(1L))))
      .select(col("user_id").as("u_a"), col("px").as("xa"), col("py").as("ya"),
        (col("cx") + col("dx")).as("cx"), (col("cy") + col("dy")).as("cy"))
    val build = cell.select(col("user_id").as("u_b"), col("px").as("xb"),
      col("py").as("yb"), col("cx"), col("cy"))
    val out = probe.join(build, Seq("cx", "cy"))
      .filter(col("u_a") =!= col("u_b"))
      .withColumn("dist2", expr("(xa - xb) * (xa - xb) + (ya - yb) * (ya - yb)"))
      .filter(col("dist2") <= 22500L)
      .groupBy(col("u_a"))
      .agg(count(lit(1)).as("n"), min(col("dist2")).as("mn"), sum(col("dist2")).as("sm"))
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    users.foreach { x =>
      val ds = users.filter(_ != x).map { v =>
        val (xa, ya) = pts(x); val (xb, yb) = pts(v)
        (xa - xb) * (xa - xb) + (ya - yb) * (ya - yb)
      }.filter(_ <= 22500L)
      if (ds.isEmpty) assert(!out.contains(x))
      else assert(out(x) == ((ds.length.toLong, ds.min, ds.sum)),
        s"user $x: got ${out(x)} want (${ds.length},${ds.min},${ds.sum})")
    }
  }
}
