package graft.ops

import org.apache.spark.sql.DataFrame
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
    * Scale shape: each iteration is one join of the rank frame against the
    * degree-annotated edge list on `src` plus one `groupBy(dst)` sum — the
    * textbook distributed PageRank step. The edge frame is localCheckpointed
    * and reused by every iteration (the join key stays `src`, so a
    * pre-partitioned edge list keeps the shuffle one-sided); the rank frame
    * is |nodes| rows, orders of magnitude smaller than the edges.
    *
    * Output: (node, rank) — rank in Scale units. */
  def pageRank(edges: DataFrame, iterations: Int = 3): DataFrame = {
    val e = edges.select(col("src"), col("dst")).localCheckpoint()
    // degree-annotated edges: contribution denominator rides along each edge
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("__deg"))
    val eDeg = e.join(deg, Seq("src")).localCheckpoint()
    var ranks = deg.select(col("src").as("node"), lit(Scale).as("rank"))
    for (_ <- 1 to iterations) {
      ranks = eDeg
        .join(ranks, eDeg("src") === ranks("node"))
        .select(col("dst"), expr("rank div __deg").as("__contrib"))
        .groupBy(col("dst"))
        .agg(sum(col("__contrib")).as("__in"))
        .select(col("dst").as("node"),
          (lit(15L * Scale / 100L) + expr("(85 * __in) div 100")).as("rank"))
        .localCheckpoint(eager = false)
    }
    ranks
  }
}
