package graft.examples

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{SparkEntry, Tables}
import graft.ops.Dedup

/** Isolation timing probe (the verify skill's "Probe pattern"): time ONE
  * registered query key several times on a warm session, away from the full
  * bench's noise, before calling any number a regression or a win.
  *
  * Usage: runMain graft.examples.Probe <key|q44stages> [sfDir] [reps]
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val key = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    // `explain` mode reuses args(2) as a dir — don't parse it as reps there
    val reps = if (args.length > 2 && key != "explain") args(2).toInt else 3
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // SPARK_GRAFT_NO_BROADCAST=1: preview the at-scale (SMJ) plan shape,
    // where identical self-join branches collapse via ReusedExchange
    if (sys.env.contains("SPARK_GRAFT_NO_BROADCAST"))
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    def time(label: String, df: => DataFrame): Unit = {
      df.write.format("noop").mode("overwrite").save() // untimed warm-up
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[probe] $label%-28s min=${ts.min}%.3f all=${ts.map(t => f"$t%.3f").mkString(",")}")
    }

    if (key == "explain") {
      // args: explain <key> [sfDir] — dump the formatted physical plan
      val d = if (args.length > 2) args(2) else "/root/testdata/sf0.01"
      SparkEntry.queries(args(1))(spark, d).explain("formatted")
    } else if (key == "q44stages") {
      val docs = Tables.documents(spark, sfDir)
      time("shingles", Dedup.wordShingles(docs, "doc_id", "text", 2))
      time("signatures", Dedup.minHashSignatures(
        Dedup.wordShingles(docs, "doc_id", "text", 2), "doc_id", 16))
      time("full q44", SparkEntry.queries("q44_minhash_neardup")(spark, sfDir))
    } else if (key == "q55scaled") {
      // q55's shape with bits-per-band grown for a 10x corpus (12 bits/band
      // vs the registered 8): the SCALE.md occupancy-vs-n demonstration
      time("q55 48 planes/4 bands", graft.ops.Similarity.lshBucketNearDup(
        Tables.embeddings(spark, sfDir), "vec_id", "embedding",
        threshold = 0.35, numPlanes = 48, bands = 4, dim = 64))
    } else {
      // comma-separated key list: one warm session, sequential isolation timings
      key.split(",").foreach(k => time(k, SparkEntry.queries(k)(spark, sfDir)))
    }
    spark.stop()
  }
}
