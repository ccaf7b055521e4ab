package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.Similarity

/** Scratch probe — deleted before end of round. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    val emb = Tables.embeddings(spark, dir)
    def time(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$tag: ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$n")
    }
    time("scan")(emb.count())
    val banded = Similarity.lshBands(emb, "vec_id", "embedding", 32, 4, 64)
    time("banded")(banded.count())
    time("full1")(Similarity.lshBucketNearDup(emb, "vec_id", "embedding", 0.35).count())
    time("full2")(Similarity.lshBucketNearDup(emb, "vec_id", "embedding", 0.35).count())
    spark.stop()
  }
}
