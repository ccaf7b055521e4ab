package graft

import org.apache.spark.sql.functions._

/** Operator-level checks for the round-16 keys beyond the DuckDB gate —
  * the invariants the value-compare can't see: q451's ADC scores against an
  * in-memory reconstruction of the PQ lookup tables, candidate containment
  * in the probed cell, and the recall readout's consistency with the exact
  * top-5 key. (q452's pin tests live in StreamingSpec next to the other
  * streaming semantics fixtures.)
  */
class Round16Spec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("q451: ADC distances equal an in-memory PQ lookup-table reconstruction") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .as[(Long, Seq[Double])].collect().toMap
    // codes: per vector, nearest codeword per 16-dim subspace (min L2,
    // code-id tie-break) over the first-8 codebook — q116's assignment
    def sub(v: Seq[Double], s: Int): Seq[Double] = v.slice(s * 16, s * 16 + 16)
    def d2(a: Seq[Double], b: Seq[Double]): Double =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val codebook = (0L until 8L).map(c => c -> emb(c)).toMap
    def codeOf(v: Seq[Double], s: Int): Long =
      codebook.toSeq.map { case (c, cv) => (d2(sub(v, s), sub(cv, s)), c) }
        .min._2
    // the engine's LUT entries land on the 1e-6 integer grid BEFORE the
    // sum; reconstruct with the same expansion shape (x·x − 2x·c + c·c),
    // tolerance ±1 grid unit per subspace for the double-chain difference
    // between the zip-map reference here and the fixed-order DotProduct
    def lutQ(q: Seq[Double], s: Int, code: Long): Long = {
      val qs = sub(q, s); val cs = sub(codebook(code), s)
      def dot(a: Seq[Double], b: Seq[Double]) = a.zip(b).map(t => t._1 * t._2).sum
      math.round((dot(qs, qs) - 2.0 * dot(qs, cs) + dot(cs, cs)) * 1e6)
    }
    val out = SparkEntry.queries("q451_adc_search")(spark, sf)
      .select("query_id", "neighbor_id", "adc_d2q")
      .as[(Long, Long, Long)].collect()
    assert(out.nonEmpty)
    out.foreach { case (q, n, adc) =>
      val expect = (0 until 4).map(s => lutQ(emb(q), s, codeOf(emb(n), s))).sum
      assert(math.abs(adc - expect) <= 4,
        s"ADC($q,$n)=$adc but LUT reconstruction says $expect")
    }
  }

  test("q451: candidates live in the query's probed cell; ranks are 1..5 by distance") {
    val serving = SparkEntry.queries("q449_ann_serving")(spark, sf)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).map { case (q, ns) => q -> ns.map(_._2).toSet }
    val adc = SparkEntry.queries("q451_adc_search")(spark, sf)
      .select("query_id", "rn", "neighbor_id", "adc_d2q")
      .as[(Long, Long, Long, Long)].collect().toSeq
    adc.groupBy(_._1).foreach { case (q, rows) =>
      val sorted = rows.sortBy(_._2)
      assert(sorted.map(_._2) == (1L to sorted.length), s"ranks not dense for $q")
      assert(sorted.map(_._4) == sorted.map(_._4).sorted,
        s"ADC distances must be non-decreasing in rank for $q")
      assert(sorted.forall(r => r._3 != q), s"self-match leaked for $q")
    }
    // both keys search the SAME serving cells, so q451's candidate pool is
    // q449's cell membership — any rank-5 cutoff difference aside, every
    // ADC result must at least come from that cell (checked via q449's
    // top-5 whenever the cell holds <= 5 non-self members)
    serving.foreach { case (q, ns) =>
      if (ns.size < 5)
        assert(adc.filter(_._1 == q).map(_._3).toSet == ns,
          s"sub-5 cell must return identical member sets for $q")
    }
  }

  test("q451: hits_at_5 equals the overlap with the exact top-5 (q45)") {
    val truth = SparkEntry.queries("q45_cosine_topk")(spark, sf)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val adc = SparkEntry.queries("q451_adc_search")(spark, sf)
      .select("query_id", "neighbor_id", "hit", "hits_at_5")
      .as[(Long, Long, Long, Long)].collect().toSeq
    adc.foreach { case (q, n, hit, _) =>
      assert((hit == 1L) == truth((q, n)), s"hit flag wrong for ($q,$n)")
    }
    adc.groupBy(_._1).foreach { case (q, rows) =>
      val expect = rows.count(r => truth((q, r._2))).toLong
      assert(rows.forall(_._4 == expect), s"hits_at_5 wrong for $q")
    }
  }

  test("q453: beam results are reachable, correctly ranked, and honestly scored") {
    val out = SparkEntry.queries("q453_graph_ann")(spark, sf)
      .select("query_id", "rn", "neighbor_id", "cos_q", "hit", "hits_at_5")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(out.nonEmpty)
    out.groupBy(_._1).foreach { case (q, rows) =>
      val sorted = rows.sortBy(_._2)
      assert(sorted.map(_._2) == (1L to sorted.length), s"ranks not dense for $q")
      assert(sorted.map(_._4).reverse == sorted.map(_._4).reverse.sorted,
        s"cos_q must be non-increasing in rank for $q")
      assert(sorted.forall(_._3 != q), s"self-match leaked for $q")
      assert(rows.forall(_._6 == rows.map(_._5).sum), s"hits_at_5 wrong for $q")
    }
    // the recall readout is honest: hits flag exactly the exact-top-5 overlap
    val truth = SparkEntry.queries("q45_cosine_topk")(spark, sf)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    out.foreach { case (q, _, n, _, hit, _) =>
      assert((hit == 1L) == truth((q, n)), s"hit flag wrong for ($q,$n)")
    }
  }

  test("q453: every emitted node is graph-reachable from the entry within 4 hops") {
    // rebuild the graph the key builds (LSH cells, within-cell top-4
    // symmetrized) and BFS from each query's entry — beam results must be
    // a subset of the 4-hop reachable set (the beam can only prune, never
    // teleport)
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .as[(Long, Seq[Double])].collect().toMap
    val n = emb.size.toLong
    var cells = 1L
    while (cells <= n / 32L) cells *= 2
    val out = SparkEntry.queries("q453_graph_ann")(spark, sf)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSeq
    // engine-computed cell per node (reuse the registered q443 key's cells:
    // same signature, same modulus)
    val cellOf = SparkEntry.queries("q443_semdedup_lsh")(spark, sf)
      .select("vec_id", "cell").as[(Long, Long)].collect().toMap
    def cos(a: Long, b: Long): Double = {
      val (va, vb) = (emb(a), emb(b))
      val dot = va.zip(vb).map(t => t._1 * t._2).sum
      dot / (math.sqrt(va.map(x => x * x).sum) * math.sqrt(vb.map(x => x * x).sum))
    }
    val byCell = emb.keys.groupBy(cellOf)
    val adj = scala.collection.mutable.Map.empty[Long, Set[Long]].withDefaultValue(Set.empty)
    byCell.values.foreach { members =>
      val m = members.toSeq
      m.foreach { s =>
        m.filter(_ != s)
          .map(d => (math.round(cos(s, d) * 1e6), d))
          .sortBy { case (cq, d) => (-cq, d) }.take(4)
          .foreach { case (_, d) => adj(s) += d; adj(d) += s }
      }
    }
    val ids = emb.keys.toSeq.sorted
    out.groupBy(_._1).foreach { case (q, rows) =>
      val entry = ids.find(_ != q).get
      var frontier = Set(entry)
      var seen = Set(entry)
      (1 to 4).foreach { _ =>
        frontier = frontier.flatMap(adj).diff(seen)
        seen ++= frontier
      }
      rows.map(_._2).foreach(nd =>
        assert(seen(nd) || nd == entry, s"node $nd not 4-hop reachable for query $q"))
    }
  }

  test("q454: ORC read back prunes to the filtered partition directory") {
    val df = SparkEntry.queries("q454_orc_roundtrip")(spark, sf)
    df.collect()
    val plan = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(plan.contains("Format: ORC") || plan.toLowerCase.contains("orc"), plan)
    assert(plan.contains("PartitionFilters") &&
      plan.contains("o_orderpriority"), s"partition predicate not pruning:\n$plan")
  }

  test("q456: fingerprints group the planted '+ dup' docs with their source") {
    // the dup family shares its leading 40 chars with the source doc, so
    // their synthesized audio — and the WHT fingerprint — must collide
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text")).as[(Long, String)].collect().toSeq
    val out = SparkEntry.queries("q456_audio_fingerprint")(spark, sf)
      .select("doc_id", "fp").as[(Long, Long)].collect().toMap
    assert(out.values.forall(_ != -1L), "every synthesized WAV must parse")
    val byPrefix = docs.groupBy(_._2.take(40))
    byPrefix.values.filter(_.size > 1).foreach { grp =>
      val fps = grp.map(d => out(d._1)).distinct
      assert(fps.size == 1, s"same leading content must share a fingerprint: $grp")
    }
  }

  test("q457: summary estimates carry the equi-depth rank-error bound") {
    // a 32-bound equi-depth summary's rank error is < ns/32 per shard, so
    // the merged estimate's rank error is < N/32 — verify the VALUE at
    // the estimate's exact rank stays inside that band, and the summary
    // is exact wherever a shard bound lands on the target rank
    val out = SparkEntry.queries("q457_quantile_merge")(spark, sf)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(out.map(_._1) == Seq(1L, 5L, 25L, 50L, 75L, 95L, 99L))
    val cents = Tables.events(spark, sf)
      .select(expr("CAST(round(value * 100, 0) AS BIGINT)").as("c"))
      .as[Long].collect().sorted
    val n = cents.length
    out.foreach { case (p, est, exact, err) =>
      assert(err == math.abs(est - exact))
      assert(exact == cents(((p * n + 99) / 100 - 1).toInt),
        s"exact side must be the true percentile at p=$p")
      // est is >= exact (summaries bias up: bound_i sits at the TOP of its
      // bucket) and its true rank is within N/32 + 8 (one bucket per shard
      // boundary slack) of the target
      assert(est >= exact, s"equi-depth upper bounds can't undershoot at p=$p")
      val targetRank = (p * n + 99) / 100
      val estRank = cents.count(_ <= est)
      assert(estRank - targetRank <= n / 32 + 8,
        s"estimate rank error beyond the summary bound at p=$p")
    }
  }

  test("q452: era chains respect the 2-horizon minimum re-emission gap") {
    // round-17: the replay runs on 3-DAY buckets, so every invariant is
    // stated on the bucket spine — era days are bucket starts, the horizon
    // is bucketDays * (spanBuckets div 6) days, and the eviction lag is
    // two BATCHES = 2 * bucketDays days
    val bucketDays = 3L
    val out = SparkEntry.queries("q452_stream_ttl_dedup")(spark, sf)
      .as[(Long, java.sql.Date, Long)].collect().toSeq
    val evDays = Tables.events(spark, sf).filter(col("user_id").isNotNull)
      .select(col("user_id"), to_date(col("ts")).as("d"))
      .distinct().as[(Long, java.sql.Date)].collect()
      .groupBy(_._1).map { case (u, ds) => u -> ds.map(_._2.toLocalDate.toEpochDay).sorted }
    val d0 = evDays.values.flatten.min
    val ev = evDays.map { case (u, ds) =>
      u -> ds.map(d => d0 + bucketDays * ((d - d0) / bucketDays)).distinct.sorted
    }
    val spanBuckets = {
      val all = ev.values.flatten
      (all.max - all.min) / bucketDays + 1
    }
    val h = bucketDays * math.max(1L, spanBuckets / 6)
    out.groupBy(_._1).foreach { case (u, rows) =>
      val eras = rows.sortBy(_._3).map(_._2.toLocalDate.toEpochDay)
      // era 1 is the user's first event bucket
      assert(eras.head == ev(u).head, s"user $u era 1 is not the first event bucket")
      // consecutive eras are at least 2h + 2 buckets apart: eviction needs
      // the lag-2 watermark (max bucket two batches back, minus h) to
      // reach the previous era's expiry (era bucket + h)
      eras.sliding(2).foreach {
        case Seq(a, b) => assert(b - a >= 2 * h + 2 * bucketDays,
          s"user $u eras $a -> $b violate the eviction lag bound")
        case _ =>
      }
      // every era day is one of the user's event buckets
      assert(eras.forall(ev(u).contains), s"user $u emitted a non-event bucket")
    }
  }
}
