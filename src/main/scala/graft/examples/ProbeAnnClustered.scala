package graft.examples

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Similarity

/** ANN lever probe across data regimes (round-11 verdict item 3): the gate
  * fixtures' embeddings are i.i.d. uniform on the sphere, so every recall
  * curve the registry publishes (q256/q258/q268/q269) is structurally
  * capped — random vectors have no cluster neighborhoods for IVF cells or
  * a PQ codebook to exploit. This probe runs the SAME levers on a corpus
  * with planted cluster structure (`gen_scale.py clustered`) next to the
  * uniform one, with the quantizers TRAINED (Lloyd on the corpus — the
  * exact-micro trainer behind q257) instead of sampled from corpus slices:
  *
  *   1. IVF nprobe curve, trained coarse quantizer (k=16 cells): recall@5
  *      at nprobe 1/2/4/8/16 — rises to brute force at nprobe = |cells|.
  *   2. PQ codebook curve, trained codebook (full-dim Lloyd centroids as
  *      the shared codeword frame, K = 4/8/16/32): flat ADC recall@5.
  *   3. The registry's untrained corpus-slice configs (q268/q269 shape)
  *      for the contrast column.
  *
  * Usage: runMain graft.examples.ProbeAnnClustered <embDir> [label]
  */
object ProbeAnnClustered {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val label = if (args.length > 1) args(1) else dir
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val queries = emb.filter(col("vec_id") < 8)
    val truth = Similarity.cosineTopK(emb, queries, "vec_id", "embedding", 5)
      .select(col("query_id"), col("neighbor_id")).localCheckpoint()

    def recall(approx: DataFrame): Double = {
      val hits = truth.join(
        approx.select(col("query_id").as("__aq"), col("neighbor_id").as("__an")),
        col("query_id") === col("__aq") && col("neighbor_id") === col("__an"),
        "left").agg(count(col("__an"))).head.getLong(0)
      hits / 40.0
    }

    // 1. IVF nprobe curve, TRAINED coarse quantizer (16 cells)
    val trained16 = Similarity.microCentroidVectors(
      Similarity.ivfTrainMicro(emb, "vec_id", "embedding", k = 16, iterations = 3),
      "vec_id", "embedding").localCheckpoint()
    Seq(1, 2, 4, 8, 16).foreach { np =>
      val r = recall(Similarity.ivfTopK(emb, queries, trained16,
        "vec_id", "embedding", 5, nprobe = np))
      println(f"[annprobe] $label ivf_trained16 nprobe=$np%2d recall@5=$r%.3f")
    }

    // 1b. IVF nprobe curve with MORE cells than planted clusters (64 cells
    // on 32 clusters): Lloyd splits dense clusters across sister cells, so
    // a query's neighborhood straddles a cell boundary and nprobe>1 is
    // what recovers it — the regime where the lever is visible at all
    // (with cells <= clusters, a separated cluster is a cell and nprobe=1
    // is already exhaustive for the neighborhood).
    val trained64 = Similarity.microCentroidVectors(
      Similarity.ivfTrainMicro(emb, "vec_id", "embedding", k = 64, iterations = 3),
      "vec_id", "embedding").localCheckpoint()
    Seq(1, 2, 4, 8, 16).foreach { np =>
      val r = recall(Similarity.ivfTopK(emb, queries, trained64,
        "vec_id", "embedding", 5, nprobe = np))
      println(f"[annprobe] $label ivf_trained64 nprobe=$np%2d recall@5=$r%.3f")
    }

    // 2. PQ codebook curve, TRAINED codebook (Lloyd centroids as codewords).
    // Two read-outs per K: raw ADC recall@5 (saturates at cluster
    // resolution — all members of a cluster share a code, so ADC cannot
    // rank WITHIN one), and the production shape: ADC shortlist(50) →
    // exact cosine re-rank → top-5, where better codes buy better
    // shortlists and the codebook lever actually shows.
    Seq(4, 8, 16, 32).foreach { kk =>
      val cb = Similarity.microCentroidVectors(
        Similarity.ivfTrainMicro(emb, "vec_id", "embedding", k = kk, iterations = 3),
        "vec_id", "embedding").localCheckpoint()
      val codes = Similarity.pqEncode(emb, cb, "vec_id", "embedding", m = 4, subDim = 16)
      val rAdc = recall(Similarity.pqSearchTopK(codes, queries, cb,
        "vec_id", "embedding", m = 4, subDim = 16, k = 5))
      val shortlist = Similarity.pqSearchTopK(codes, queries, cb,
          "vec_id", "embedding", m = 4, subDim = 16, k = 50)
        .select(col("query_id").as("__sq"), col("neighbor_id").as("__sn"))
      val rescored = shortlist
        .join(broadcast(queries.select(col("vec_id").as("__sq"), col("embedding").as("qv"))), Seq("__sq"))
        .join(emb.select(col("vec_id").as("__sn"), col("embedding").as("cv")), Seq("__sn"))
        .select(col("__sq").as("query_id"), col("__sn").as("neighbor_id"),
          (Similarity.dot("qv", "cv") / (Similarity.norm("qv") * Similarity.norm("cv"))).as("cosine"))
      val rRerank = recall(Similarity.topKPerQuery(rescored, 5))
      println(f"[annprobe] $label pq_trained K=$kk%2d adc_recall@5=$rAdc%.3f shortlist50_rerank_recall@5=$rRerank%.3f")
    }

    // 2c. PRODUCT-trained codebook (pqTrainMicro: an independent Lloyd per
    // subspace — K^m effective cells from m·K codewords) on the RAW
    // vectors: separates the "codebook is a sliced full-dim frame" cap
    // from the "raw vectors quantize cluster-coarse" cap.
    Seq(4, 8, 16, 32).foreach { kk =>
      val cb = Similarity.pqTrainMicro(emb, "vec_id", "embedding",
        m = 4, subDim = 16, k = kk, iterations = 3).localCheckpoint()
      val codes = Similarity.pqEncode(emb, cb, "vec_id", "embedding", m = 4, subDim = 16)
      val r = recall(Similarity.pqSearchTopK(codes, queries, cb,
        "vec_id", "embedding", m = 4, subDim = 16, k = 5))
      println(f"[annprobe] $label pq_product_trained K=$kk%2d adc_recall@5=$r%.3f")
    }

    // 2b. RESIDUAL-coded IVFPQ (q282's shape, trained quantizers): codes
    // quantize v − centroid(cell(v)) instead of v, recentering every cell
    // at the origin so the codebook spends its codewords on the
    // within-cell offsets — the fix for raw ADC's within-cluster ranking
    // ceiling read out in section 2. Same ADC path, no exact re-rank;
    // codebook = product-trained per-subspace Lloyd on the residuals.
    val res = Similarity.residuals(emb, trained16, "vec_id", "embedding")
      .localCheckpoint()
    val qres = Similarity.residuals(queries, trained16, "vec_id", "embedding",
      nprobe = 4)
    Seq(4, 8, 16, 32).foreach { kk =>
      val rcb = Similarity.pqTrainMicro(res, "vec_id", "rvec",
        m = 4, subDim = 16, k = kk, iterations = 3).localCheckpoint()
      val r = recall(Similarity.pqResidualSearchTopK(res, qres, rcb,
        "vec_id", m = 4, subDim = 16, k = 5))
      println(f"[annprobe] $label residual_pq_trained K=$kk%2d nprobe=4 adc_recall@5=$r%.3f")
    }
    // production code-budget point: m=8 subspaces × K=64 codewords = 48
    // bits/vector (the m=4, K≤32 grid above tops out at 20 bits — below
    // the within-cluster ranking resolution on isotropic offsets no matter
    // how the codebook is trained)
    locally {
      val rcb = Similarity.pqTrainMicro(res, "vec_id", "rvec",
        m = 8, subDim = 8, k = 64, iterations = 3).localCheckpoint()
      val r = recall(Similarity.pqResidualSearchTopK(res, qres, rcb,
        "vec_id", m = 8, subDim = 8, k = 5))
      // and the full production composition (q272's shape on the residual
      // index): residual-ADC shortlist(50) → exact cosine re-rank → top-5
      val shortlist = Similarity.pqResidualSearchTopK(res, qres, rcb,
          "vec_id", m = 8, subDim = 8, k = 50)
        .select(col("query_id").as("__sq"), col("neighbor_id").as("__sn"))
      val rescored = shortlist
        .join(broadcast(queries.select(col("vec_id").as("__sq"), col("embedding").as("qv"))), Seq("__sq"))
        .join(emb.select(col("vec_id").as("__sn"), col("embedding").as("cv")), Seq("__sn"))
        .select(col("__sq").as("query_id"), col("__sn").as("neighbor_id"),
          (Similarity.dot("qv", "cv") / (Similarity.norm("qv") * Similarity.norm("cv"))).as("cosine"))
      val rr = recall(Similarity.topKPerQuery(rescored, 5))
      println(f"[annprobe] $label residual_pq_trained m=8 K=64 nprobe=4 adc_recall@5=$r%.3f shortlist50_rerank_recall@5=$rr%.3f")
    }

    // 3. the registry's untrained corpus-slice configs, for contrast
    Seq(1, 2, 4, 8).foreach { np =>
      val r = recall(Similarity.ivfPqTopK(emb, queries,
        centroids = emb.filter(col("vec_id") >= 100 && col("vec_id") < 116),
        codebook = emb.filter(col("vec_id") >= 200 && col("vec_id") < 208),
        "vec_id", "embedding", m = 4, subDim = 16, k = 5, nprobe = np))
      println(f"[annprobe] $label ivfpq_untrained(q268) nprobe=$np%2d recall@5=$r%.3f")
    }
    Seq(4, 8, 16, 32).foreach { kk =>
      val cb = emb.filter(col("vec_id") >= 200 && col("vec_id") < 200 + kk)
      val codes = Similarity.pqEncode(emb, cb, "vec_id", "embedding", m = 4, subDim = 16)
      val r = recall(Similarity.pqSearchTopK(codes, queries, cb,
        "vec_id", "embedding", m = 4, subDim = 16, k = 5))
      println(f"[annprobe] $label pq_untrained(q269) K=$kk%2d recall@5=$r%.3f")
    }
    spark.stop()
  }
}
