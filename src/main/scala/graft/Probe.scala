package graft
import org.apache.spark.sql.SparkSession
import graft.schema.Comments

/** Scratch probe — deleted before end of round. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val reddit = Seq(
      ("politics", "p1", "Economy is good https://x.y 😀", 12, 1704067200.0, "rc1"),
      ("economy", "p2", "bad crash fail", -1, 1704067260.0, "rc2")
    ).toDF("subreddit", "post_id", "body", "score", "created_utc", "comment_id")
    val chan = Seq(
      ("1001", "<p>&gt;recession is fake &amp; slow</p>", "01/01/24(Mon)00:00:00", "anon", null.asInstanceOf[String])
    ).toDF("post_number", "comment", "timestamp_raw", "name", "image_filename")
    val yt = Seq(
      ("v1", "Recession", "yc1", "2024-01-01T00:02:00Z", "great video, love it")
    ).toDF("video_id", "video_title", "comment_id", "comment_time", "comment_text")
    val enriched = Pipeline.run(reddit, chan, yt, Seq.empty[String].toDF("comment_id"))
    enriched.orderBy("platform", "comment_id").show(10, false)
    Pipeline.sentimentShareByPlatform(enriched).orderBy("platform", "sentiment").show(false)
    Pipeline.dailyCounts(enriched).show(false)
    spark.stop()
  }
}
