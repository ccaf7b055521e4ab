package graft.examples

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._

import graft.SparkEntry
import graft.ops.{Dedup, Graph}

/** Step-level plan evidence for the round-17 iterative-loop change: the
  * registered keys' explain output hides loop internals behind
  * (local)checkpoints, so this dumps ONE representative loop step per
  * changed operator — LPA round, CC propagation step, BFS hop, k-core peel
  * round, HITS half-step — in both strategies (`_shuffle` = the round-16
  * shape, `_bcast` = the round-17 size-conditional broadcast) against the
  * real sf inputs. `sbt "runMain graft.examples.DumpStepPlans <outDir> [sfDir]"` */
object DumpStepPlans {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    // mirror the BENCH session (not DumpPlans' local[4]): the loop-step
    // join strategy is exactly what this evidence is about, and AQE's
    // runtime broadcast conversion differs between the two configs
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))

    def dump(name: String)(df: DataFrame): Unit = {
      // collect, not a noop write: the write spawns a SEPARATE
      // QueryExecution, leaving df's own at the initial plan — collect
      // executes df's QE so the dump is AQE-final (r17 advice item 1).
      // Step frames here are ≤ |nodes|-row metadata, safe to collect.
      df.collect()
      val plan = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
      Files.writeString(Paths.get(outDir, s"$name.txt"), plan)
      println(s"[dumpstepplans] wrote $outDir/$name.txt")
    }

    val e = SparkEntry.copurchaseEdges(spark, dir)

    // one LPA round (q296 loop body)
    def lpaRound(bcast: Boolean): DataFrame = {
      val lab = e.select(col("src").as("node")).distinct()
        .withColumn("label", col("node")).localCheckpoint()
      val labSide = lab.select(col("node").as("dst"), col("label"))
      e.join(if (bcast) broadcast(labSide) else labSide, "dst")
        .groupBy(col("src"), col("label")).agg(count(lit(1)).as("c"))
        .groupBy(col("src"))
        .agg(max(struct(col("c"), (-col("label")).as("nl"))).as("b"))
        .select(col("src").as("node"), (-col("b.nl")).as("label"))
    }
    dump("lpa_round_shuffle")(lpaRound(bcast = false))
    dump("lpa_round_bcast")(lpaRound(bcast = true))

    // one CC propagation step over the q445/q446 pair graph
    val pairs = SparkEntry.queries("q445_name_group_join")(spark, dir)
      .select(col("gid_a").as("src"), col("gid_b").as("dst")).localCheckpoint()
    val nodes = pairs.select(col("src")).union(pairs.select(col("dst"))).distinct()
      .select(col("src").as("node")).localCheckpoint()
    def ccStep(bcast: Boolean): DataFrame = {
      val edges0 = pairs
        .union(pairs.select(col("dst"), col("src")))
        .union(nodes.select(col("node").as("src"), col("node").as("dst")))
      val edges = (if (bcast) edges0 else edges0.repartition(col("dst"))).localCheckpoint()
      val labels = nodes.withColumn("label", col("node"))
      val labSide = labels.select(col("node").as("dst"), col("label").as("dlabel"))
      edges.join(if (bcast) broadcast(labSide) else labSide, Seq("dst"))
        .groupBy(col("src")).agg(min(col("dlabel")).as("label"))
        .select(col("src").as("node"), col("label"))
    }
    dump("cc_step_shuffle")(ccStep(bcast = false))
    dump("cc_step_bcast")(ccStep(bcast = true))

    // one BFS hop (q201 loop body): frontier semi-join + visited anti-join
    val seed = SparkEntry.copurchaseDegrees(spark, dir)
      .orderBy(col("degree").desc, col("node")).limit(1).select("node")
      .localCheckpoint()
    def bfsHop(bcast: Boolean): DataFrame = {
      def side(df: DataFrame) = if (bcast) broadcast(df) else df
      e.join(side(seed.select(col("node").as("src"))), Seq("src"), "left_semi")
        .select(col("dst").as("node")).distinct()
        .join(side(seed.select("node")), Seq("node"), "left_anti")
    }
    dump("bfs_hop_shuffle")(bfsHop(bcast = false))
    dump("bfs_hop_bcast")(bfsHop(bcast = true))

    // one k-core peel round (q191 loop body)
    val und = e.select(least(col("src"), col("dst")).as("u"),
      greatest(col("src"), col("dst")).as("v"))
      .filter(col("u") < col("v")).distinct().localCheckpoint()
    val keep = SparkEntry.copurchaseDegrees(spark, dir)
      .filter(col("degree") >= 6).select(col("node")).localCheckpoint()
    def peelRound(bcast: Boolean): DataFrame = {
      def side(df: DataFrame) = if (bcast) broadcast(df) else df
      und.join(side(keep.select(col("node").as("u"))), Seq("u"), "left_semi")
        .join(side(keep.select(col("node").as("v"))), Seq("v"), "left_semi")
    }
    dump("kcore_round_shuffle")(peelRound(bcast = false))
    dump("kcore_round_bcast")(peelRound(bcast = true))

    // one HITS half-step (q318 loop body) via the exposed helper
    val hitsE = graft.Tables.load(spark, dir, "orders")
      .join(graft.Tables.load(spark, dir, "lineitem"),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("h"), col("l_partkey").as("a"))
      .distinct().localCheckpoint()
    val hub = hitsE.select(col("h").as("node")).distinct()
      .select(col("node"), lit(Graph.Scale).as("score")).localCheckpoint()
    dump("hits_halfstep_shuffle")(
      Graph.hitsHalfStep(hitsE, hub, "h", "a", broadcastScores = false))
    dump("hits_halfstep_bcast")(
      Graph.hitsHalfStep(hitsE, hub, "h", "a", broadcastScores = true))

    spark.stop()
  }
}
