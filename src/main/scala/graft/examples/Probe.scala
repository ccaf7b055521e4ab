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
    val reps = if (args.length > 2) args(2).toInt else 3
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

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
    } else {
      time(key, SparkEntry.queries(key)(spark, sfDir))
    }
    spark.stop()
  }
}
