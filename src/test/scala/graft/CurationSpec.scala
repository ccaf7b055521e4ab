package graft

import graft.ops.Curation

class CurationSpec extends SparkSpec {
  import spark.implicits._

  private def docs = (1L to 100L).map(i =>
    (i, if (i % 4 == 0) "de" else "en")).toDF("doc_id", "lang")

  test("stratifiedSample keeps exactly the quota per stratum, reproducibly") {
    val a = Curation.stratifiedSample(docs, "lang", "doc_id", 10)
    val counts = a.groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(counts == Map("en" -> 10L, "de" -> 10L))
    val b = Curation.stratifiedSample(docs, "lang", "doc_id", 10)
    assert(a.orderBy("doc_id").collect().toSeq == b.orderBy("doc_id").collect().toSeq)
  }

  test("stratifiedSample with quota above stratum size keeps everything") {
    val out = Curation.stratifiedSample(docs, "lang", "doc_id", 1000)
    assert(out.count() == 100)
  }

  test("weightedMixture allocates the budget by weight") {
    val out = Curation.weightedMixture(docs, "lang", "doc_id",
      Map("en" -> 3.0, "de" -> 1.0), totalBudget = 40)
    val counts = out.groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(counts == Map("en" -> 30L, "de" -> 10L))
  }

  test("weightedMixture drops strata with no weight") {
    val out = Curation.weightedMixture(docs, "lang", "doc_id",
      Map("en" -> 1.0), totalBudget = 12)
    val counts = out.groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(counts == Map("en" -> 12L))
  }

  test("curationChain assigns first-failure reasons and dedups by content") {
    val good = "the quick brown fox jumps over the lazy dog and runs on " +
      "through the green fields of a long morning walk is a fine thing " +
      "when the sun is up and the air is cool and clear"
    val fixture = Seq(
      (1L, good),                         // keeper
      (2L, good),                         // exact duplicate of 1 -> duplicate
      (3L, "der und die ist das der und die ist das der und die ist das " +
        "der und die ist das der und die ist das der und die ist das " +
        "der und die ist das der und die ist das"), // German -> lang
      (4L, "the sun is up"),              // English but too short -> quality
      (5L, ("the and of is a " * 30).trim) // all repeats -> repetition
    ).toDF("doc_id", "text")
    val out = Curation.curationChain(fixture, "doc_id", "text")
      .orderBy("doc_id")
      .select("doc_id", "kept", "drop_reason")
      .as[(Long, Boolean, Option[String])].collect().toSeq
    assert(out == Seq(
      (1L, true, None),
      (2L, false, Some("duplicate")),
      (3L, false, Some("lang")),
      (4L, false, Some("quality")),
      (5L, false, Some("repetition"))))
  }

  test("curationChain audits degenerate docs as kept=false, never null") {
    // empty/whitespace text makes rep_ratio null -> __pass null; the audit
    // contract (matching the oracle's coalesce(..., FALSE)) is kept=false
    val fixture = Seq((1L, ""), (2L, "   "), (3L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val kept = Curation.curationChain(fixture, "doc_id", "text")
      .select("kept").as[Boolean].collect().toSeq
    assert(kept == Seq(false, false, false)) // would throw on null before collect otherwise
  }
}
