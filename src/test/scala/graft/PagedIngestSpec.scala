package graft

import graft.sources.PagedIngest

class PagedIngestSpec extends SparkSpec {
  import spark.implicits._

  private def fakeClient = new PagedIngest.PageClient[(Long, String)] {
    val pages: Map[Option[String], (Seq[(Long, String)], Option[String])] = Map(
      None -> (Seq((1L, "a"), (2L, "b")), Some("c1")),
      Some("c1") -> (Seq((3L, "c")), Some("c2")),
      Some("c2") -> (Seq.empty, Some("c3")), // empty page mid-stream
      Some("c3") -> (Seq((4L, "d")), None))
    def fetch(cursor: Option[String]): (Seq[(Long, String)], Option[String]) = pages(cursor)
  }

  test("paged ingest drains the cursor chain, appending one page at a time") {
    val out = java.nio.file.Files.createTempDirectory("graft_ingest").toString + "/sink"
    val (pages, rows) = PagedIngest.ingest(spark, fakeClient) { df =>
      df.write.mode("append").parquet(out)
    }
    assert(pages == 3 && rows == 4) // the empty page appends nothing
    assert(spark.read.parquet(out).as[(Long, String)].collect().toSet ==
      Set((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")))
  }

  test("maxPages bounds a run; startCursor resumes the chain") {
    val out = java.nio.file.Files.createTempDirectory("graft_ingest2").toString + "/sink"
    var lastCursor: Option[String] = None
    // wrap the client to observe the cursor handed to each fetch
    val observing = new PagedIngest.PageClient[(Long, String)] {
      def fetch(c: Option[String]) = { lastCursor = c; fakeClient.fetch(c) }
    }
    val (p1, r1) = PagedIngest.ingest(spark, observing, maxPages = 1) { df =>
      df.write.mode("append").parquet(out)
    }
    assert(p1 == 1 && r1 == 2 && lastCursor.isEmpty)
    // resume from the persisted cursor: the rest of the chain lands
    val (p2, r2) = PagedIngest.ingest(spark, fakeClient, startCursor = Some("c1")) { df =>
      df.write.mode("append").parquet(out)
    }
    assert(p2 == 2 && r2 == 2)
    assert(spark.read.parquet(out).count() == 4)
  }
}
