package graft
import org.apache.spark.sql.SparkSession

/** Scratch probe — deleted before end of round. */
object Probe {
  def main(args: Array[String]): Unit = {
    val tuned = args.headOption.contains("tuned")
    val b = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    if (tuned) {
      b.config("spark.sql.files.maxPartitionBytes", "4m")
      b.config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1m")
    }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    for (q <- Seq("q12_anti_join_dedup", "q04_table_sink_append", "q03_json_explode",
      "q20_orderby_ts", "q11_inner_equijoin", "q48_simhash"); i <- 1 to 2) {
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(q)(spark, dir).count()
      println(f"tuned=$tuned $q run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$n")
    }
    spark.stop()
  }
}
