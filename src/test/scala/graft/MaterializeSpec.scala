package graft

import graft.ops.Dedup

/** The write-once guard must key on input CONTENT, not path: a long-lived
  * JVM that rewrites an input in place (server / notebook deployment) must
  * get a fresh derivation on next touch, never the stale artifact. */
class MaterializeSpec extends SparkSpec {

  test("once() refreshes when the input is rewritten in place within one JVM") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_mat").toString
    val in = s"$base/docs"
    val idx = s"$base/idx"

    Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "alpha beta gamma delta zeta"),
      (3L, "totally different words here now"))
      .toDF("doc_id", "text").write.mode("overwrite").parquet(in)
    val (_, comp1) = Dedup.componentIndex(spark.read.parquet(in), "doc_id", "text",
      shingleK = 2, numHashes = 16, bands = 8, threshold = 0.25, indexDir = idx)
    val ids1 = comp1.select("node").as[Long].collect().toSet
    assert(ids1 == Set(1L, 2L)) // doc 3 has no near-dup pair, so no component row

    // rewrite the SAME path with different content (one more doc)
    Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "alpha beta gamma delta zeta"),
      (3L, "totally different words here now"),
      (4L, "alpha beta gamma delta epsilon"))
      .toDF("doc_id", "text").write.mode("overwrite").parquet(in)
    val (_, comp2) = Dedup.componentIndex(spark.read.parquet(in), "doc_id", "text",
      shingleK = 2, numHashes = 16, bands = 8, threshold = 0.25, indexDir = idx)
    val ids2 = comp2.select("node").as[Long].collect().toSet
    assert(ids2 == Set(1L, 2L, 4L),
      s"stale artifact served after in-place input rewrite: $ids2")
  }
}
