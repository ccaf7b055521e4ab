package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.Similarity
object Q417Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"PROBE $tag ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val dir = "/root/testdata/sf0.1"
    val emb = SparkEntry.T(spark, dir, "embeddings")
    val cents = emb.filter(col("vec_id") >= 100 && col("vec_id") < 116)
    val xs = emb.filter(col("vec_id") % 2 === 0 && col("vec_id") < 2000)
    val ys = emb.filter(col("vec_id") % 2 === 1)
    // warmup
    SparkEntry.queries("q417_mutual_knn_ivf")(spark, dir).write.format("noop").mode("overwrite").save()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
    time("assign")(Similarity.ivfAssign(emb, cents, "vec_id", "embedding").write.format("noop").mode("overwrite").save())
    val assigned = Similarity.ivfAssign(emb, cents, "vec_id", "embedding").localCheckpoint()
    val ysIdx = assigned.filter(col("vec_id") % 2 === 1)
    time("exact-2dir") {
      val fwdE = Similarity.cosineTopK(ys, xs, "vec_id", "embedding", 1)
        .select(col("query_id").as("x"), col("neighbor_id").as("y"))
      val backQE = emb.join(fwdE.select(col("y").as("vec_id")).distinct(), Seq("vec_id"))
      val bwdE = Similarity.cosineTopK(xs, backQE, "vec_id", "embedding", 1)
        .select(col("query_id").as("y"), col("neighbor_id").as("bx"))
      fwdE.join(bwdE, Seq("y")).filter(col("x") === col("bx"))
        .write.format("noop").mode("overwrite").save()
    }
    time("one-ivf-search")(
      Similarity.ivfTopKIndexed(ysIdx, xs, cents, "vec_id", "embedding", 1, 4)
        .write.format("noop").mode("overwrite").save())
    time("full")(SparkEntry.queries("q417_mutual_knn_ivf")(spark, dir).write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
