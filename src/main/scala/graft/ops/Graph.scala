package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Graph scoring over relational edge lists — the crawl-frontier /
  * item-importance signal of a large-scale data pipeline (which pages or
  * items to fetch, keep, or upsample next). The reference scores activity
  * with flat counts (`Data Analysis/Reddit_4chan_Analysis.py` groupbys); a
  * link-structure rank is the standard upgrade at corpus scale.
  *
  * Determinism discipline: ranks are SCALED LONGS (1.0 ≡ `Scale`), every
  * per-iteration contribution is an integer floor-division, and integer sums
  * are order-independent — so the result is bit-identical across partition
  * counts, retries, and engines (a float PageRank's `sum(double)` is
  * accumulation-order-dependent and can never hash-match an oracle).
  */
object Graph {

  val Scale = 1000000L

  /** Undirected co-occurrence edges from an (entity, container) relation:
    * two entities are linked when they share a container (co-purchased
    * parts, co-cited docs). Output: (src, dst) distinct, both directions,
    * src ≠ dst.
    *
    * Scale shape: the self-join is keyed on the container (co-located
    * shuffle, never cartesian) and fan-out is bounded by the per-container
    * entity count — for order baskets a small constant (TPC-H ≈ 4 lines
    * ⇒ ≈ 12 directed pairs per order). A pathological hot container (one
    * basket with 10^5 items) needs a cap upstream, same discipline as
    * ngramJaccard's df-cap. */
  def coOccurrenceEdges(rel: DataFrame, entityCol: String,
                        containerCol: String): DataFrame = {
    val a = rel.select(col(containerCol).as("__c"), col(entityCol).as("src")).distinct()
    val b = a.select(col("__c"), col("src").as("dst"))
    a.join(b, Seq("__c"))
      .filter(col("src") =!= col("dst"))
      .select(col("src"), col("dst"))
      .distinct()
  }

  /** Damped PageRank (d = 0.85) for a fixed iteration count, in scaled-long
    * arithmetic:
    *
    *   r₀(n)   = Scale
    *   rₖ₊₁(n) = 0.15·Scale + (85 · Σ_{(m,n)∈E} (rₖ(m) div deg(m))) div 100
    *
    * Node set = nodes with at least one out-edge (for the symmetric edge
    * lists [[coOccurrenceEdges]] emits, that is every connected node, so
    * there are no dangling-mass corrections to apply).
    *
    * Scale shape: the edge list is collapsed ONCE into an adjacency-list
    * frame (|nodes| rows, out-neighbors as an array — the degree is the
    * array size), so each iteration is a node-to-node join of the rank
    * frame against the adjacency frame followed by a map-side explode and
    * one `groupBy(dst)` partial-aggregated sum. Contributions fan out
    * AFTER the join, inside the stage — the per-iteration shuffles carry
    * |nodes|-sized frames, never the raw edge list (the edge-keyed join
    * formulation shuffled all m edge rows every iteration; this is the
    * standard adjacency formulation of every public Pregel-style
    * implementation). Skew bound: one row per node — a celebrity node's
    * adjacency array is that node's row, the explode streams it.
    *
    * Output: (node, rank) — rank in Scale units. */
  def pageRank(edges: DataFrame, iterations: Int = 3): DataFrame = {
    // adjacency: out-neighbors per node; sort_array makes the frame (not
    // just the result) deterministic across shuffles
    val adj = edges.select(col("src"), col("dst"))
      .groupBy(col("src"))
      .agg(sort_array(collect_list(col("dst"))).as("__out"),
        count(lit(1)).as("__deg"))
      .localCheckpoint()
    var ranks = adj.select(col("src").as("node"), lit(Scale).as("rank"))
    for (_ <- 1 to iterations) {
      ranks = adj
        .join(ranks, adj("src") === ranks("node"))
        .select(explode(col("__out")).as("dst"), expr("rank div __deg").as("__contrib"))
        .groupBy(col("dst"))
        .agg(sum(col("__contrib")).as("__in"))
        .select(col("dst").as("node"),
          (lit(15L * Scale / 100L) + expr("(85 * __in) div 100")).as("rank"))
        .localCheckpoint(eager = false)
    }
    ranks
  }

  /** Per-node triangle counts over an undirected edge list — the local
    * clustering signal (community density, spam-ring detection, link-farm
    * flagging) that flat degree counts miss.
    *
    * Algorithm: degree-based edge orientation + wedge closing — the standard
    * distributed formulation (Suri & Vassilvitskii, WWW'11 "Counting
    * Triangles and the Curse of the Last Reducer"). Every edge is oriented
    * from its lower-(degree, id) endpoint to its higher one; each triangle
    * then has exactly ONE vertex with two out-edges into it, so enumerating
    * out-neighbor pairs (wedges) and closing them against the oriented edge
    * list counts each triangle exactly once. The orientation is the scale
    * lever: out-degrees are bounded by O(√m) regardless of raw degree skew,
    * collapsing wedge volume from Σ deg² (quadratic in the hottest hub) to
    * O(m^1.5) — the "last reducer" on a celebrity node never happens.
    *
    * Shuffle shape: degree agg (8-byte keys) → two joins keyed on node ids
    * (the oriented edge list is localCheckpointed and reused as both wedge
    * source and closing probe) → explode each closed triangle to its three
    * vertices → one final groupBy(node). Edges, not documents, on every
    * exchange.
    *
    * Input may carry either or both directions; it is canonicalized and
    * de-duplicated here. Output: (node, triangles), nodes with ≥ 1 triangle.
    */
  def triangleCounts(edges: DataFrame, broadcastClose: Boolean = true): DataFrame = {
    val und = edges
      .select(least(col("src"), col("dst")).as("u"),
        greatest(col("src"), col("dst")).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
      .localCheckpoint()
    val deg = und.select(explode(array(col("u"), col("v"))).as("n"))
      .groupBy(col("n")).agg(count(lit(1)).as("d"))
    // orientation key (degree, id): total order, so ties can't create cycles
    val annotated = und
      .join(deg.select(col("n").as("u"), col("d").as("__du")), Seq("u"))
      .join(deg.select(col("n").as("v"), col("d").as("__dv")), Seq("v"))
    // orientation key (degree, id) PACKED into one long (degree in the high
    // 32 bits) — a primitive compare in the wedge filter and a single-long
    // probe key downstream, where a struct would cost generic ordering and
    // generic hashing on the Σ outdeg²-row stream. Precondition: ids and
    // degrees fit in 32/31 bits (any realistic key domain; widen to the
    // struct form beyond that).
    def okey(d: Column, n: Column) = shiftleft(d, 32).bitwiseOR(n)
    val uFirst = okey(col("__du"), col("u")) < okey(col("__dv"), col("v"))
    val oriented = annotated.select(
      when(uFirst, col("u")).otherwise(col("v")).as("a"),
      when(uFirst, col("v")).otherwise(col("u")).as("b"),
      when(uFirst, okey(col("__dv"), col("v")))
        .otherwise(okey(col("__du"), col("u"))).as("__bk"))
      .localCheckpoint()
    // wedges a→b1, a→b2 with b1 ≺ b2 in orientation order; the closing edge
    // (if present) is then necessarily oriented b1→b2. The wedge stream is
    // the big intermediate (Σ outdeg² rows) — it must NEVER shuffle: the
    // closing-edge set is only m rows, packed to one long each, so it is
    // BROADCAST (Spark's dense single-long hash relation) and wedges are
    // generated, probed, and partially aggregated inside one map-side
    // stage. (For a graph whose edge list outgrows a broadcast, set
    // broadcastClose = false to fall back to a shuffled closing join —
    // same result, and the wedge shuffle returns as the documented cost.)
    val w1 = oriented.select(col("a"), col("b").as("b1"), col("__bk").as("__k1"))
    val w2 = oriented.select(col("a"), col("b").as("b2"), col("__bk").as("__k2"))
    val closing = oriented
      .select(shiftleft(col("a"), 32).bitwiseOR(col("b")).as("__pk"))
    val triangles = w1.join(w2, Seq("a"))
      .filter(col("__k1") < col("__k2"))
      .withColumn("__pk", shiftleft(col("b1"), 32).bitwiseOR(col("b2")))
      .join(if (broadcastClose) broadcast(closing) else closing, Seq("__pk"))
    triangles
      .select(explode(array(col("a"), col("b1"), col("b2"))).as("node"))
      .groupBy(col("node"))
      .agg(count(lit(1)).as("triangles"))
  }
}
