package graft.examples

import org.apache.spark.sql.SparkSession

import graft.ops.Similarity

/** Silhouette scaling probe: measures [[Similarity.silhouetteSampled]] with
  * an explicit `sampleMod`, backing SCALE.md's claim that holding the SAMPLE
  * SIZE fixed (raising the mod with the corpus) keeps the pair volume — and
  * the runtime — linear in corpus size. `sbt "runMain
  * graft.examples.ProbeSilhouette <dir> <mod> [passes=2]"`. */
object ProbeSilhouette {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val mod = args(1).toInt
    val passes = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = graft.Tables.embeddings(spark, dir)
    for (i <- 1 to passes) {
      val t0 = System.nanoTime()
      Similarity.silhouetteSampled(emb, "vec_id", "embedding", "label", mod)
        .write.format("noop").mode("overwrite").save()
      println(f"[probe] silhouette mod=$mod dir=$dir pass $i: " +
        f"${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
