package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.Similarity

/** Runnable tour of the library's extension surface over the testdata —
  * sample code through the public API, also used as the manual smoke drive.
  *
  * `sbt "runMain graft.examples.Demo [sfDir]"`
  */
object Demo {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val emb = Tables.embeddings(spark, dir)
    println("== IVF: train (2 Lloyd iterations), then nprobe=1 top-3 ==")
    val seeds = emb.filter(col("vec_id") < 8).select("vec_id", "embedding")
    val trained = Similarity.ivfTrain(emb, "vec_id", "embedding", k = 8, iterations = 2)
    println(f"distortion seeds=${Similarity.ivfDistortion(emb, seeds, "vec_id", "embedding")}%.4f" +
      f" trained=${Similarity.ivfDistortion(emb, trained, "vec_id", "embedding")}%.4f")
    Similarity.ivfTopK(emb, emb.filter(col("vec_id") < 3), trained, "vec_id", "embedding", 3)
      .orderBy("query_id", "rn").show(9, false)

    println("== LSH: banded near-dup pairs at cosine >= 0.35 ==")
    Similarity.lshBucketNearDup(emb, "vec_id", "embedding", threshold = 0.35)
      .orderBy(desc("cosine")).show(5, false)

    spark.stop()
  }
}
