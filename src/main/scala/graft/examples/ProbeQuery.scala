package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

import graft.SparkEntry

/** One-key profiler: run a single `SparkEntry.queries` entry N times against
  * a chosen SF dir and print per-pass wall seconds plus the AQE-final
  * formatted plan — the local feedback loop for plan work (`sbt "runMain
  * graft.examples.ProbeQuery q45_cosine_topk /root/testdata/sf0.1 3"`). */
object ProbeQuery {
  def main(args: Array[String]): Unit = {
    val key = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val passes = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries(key)
    for (i <- 1 to passes) {
      val t0 = System.nanoTime()
      fn(spark, dir).write.format("noop").mode("overwrite").save()
      println(f"[probe] $key pass $i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val df = fn(spark, dir)
    df.write.format("noop").mode("overwrite").save()
    println(df.queryExecution.explainString(ExplainMode.fromString("formatted")))
    spark.stop()
  }
}
