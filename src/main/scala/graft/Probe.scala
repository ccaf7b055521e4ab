package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.Relational
import graft.storage.Storage

/** Scratch probe — deleted before end of round. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir", "/root/repo/target/warehouse")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    // partitioned store + pruning
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
      .withColumn("platform", concat(lit("p"), col("user_id") % 3))
    Storage.writePartitionedByDay(ev, "ts", "/root/repo/target/qtmp/probe_store")
    val pruned = spark.read.parquet("/root/repo/target/qtmp/probe_store")
      .filter(col("platform") === "p1" && col("day") === "2024-01-05")
    println("pruned rows: " + pruned.count())
    pruned.explain("formatted")
    // bucketed co-located join
    Storage.writeBucketed(Tables.orders(spark, "/root/testdata/sf0.001"), "probe_orders", "o_orderkey", 4)
    Storage.writeBucketed(Tables.lineitem(spark, "/root/testdata/sf0.001"), "probe_lineitem", "l_orderkey", 4)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val j = spark.table("probe_orders").join(spark.table("probe_lineitem"),
      col("o_orderkey") === col("l_orderkey"))
    println("bucketed join rows: " + j.count())
    j.explain("formatted")
    // salted ops on real skew
    println("saltedCount:")
    Relational.saltedCount(ev, "platform", 8).orderBy("platform").show(false)
    spark.stop()
  }
}
