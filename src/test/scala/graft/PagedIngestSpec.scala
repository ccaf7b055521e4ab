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
    val res = PagedIngest.ingest(spark, fakeClient) { df =>
      df.write.mode("append").parquet(out)
    }
    // 4 fetches issued, the empty mid-page appends nothing, chain exhausted
    assert(res.fetches == 4 && res.pages == 3 && res.rows == 4 && res.resumeCursor.isEmpty)
    assert(spark.read.parquet(out).as[(Long, String)].collect().toSet ==
      Set((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")))
  }

  test("maxFetches bounds remote calls; resumeCursor resumes the chain") {
    val out = java.nio.file.Files.createTempDirectory("graft_ingest2").toString + "/sink"
    val r1 = PagedIngest.ingest(spark, fakeClient, maxFetches = 1) { df =>
      df.write.mode("append").parquet(out)
    }
    assert(r1.fetches == 1 && r1.rows == 2 && r1.resumeCursor == Some("c1"))
    // resume from the REPORTED cursor: the rest of the chain lands
    val r2 = PagedIngest.ingest(spark, fakeClient, startCursor = r1.resumeCursor) { df =>
      df.write.mode("append").parquet(out)
    }
    assert(r2.fetches == 3 && r2.rows == 2 && r2.resumeCursor.isEmpty)
    assert(spark.read.parquet(out).count() == 4)
  }

  test("a repeated cursor stops the run instead of looping to maxFetches") {
    val endless = new PagedIngest.PageClient[(Long, String)] {
      def fetch(c: Option[String]) =
        (Seq.empty, Some("again")) // echoes the same cursor forever
    }
    // fetch(None)→"again" is legitimate; fetch("again")→"again" is stuck
    val res = PagedIngest.ingest(spark, endless, maxFetches = 5)(_ => ())
    assert(res.fetches == 2 && res.pages == 0 && res.stuckCursor &&
      res.resumeCursor == Some("again"))
  }

  test("a stuck cursor with non-empty pages writes each page exactly once") {
    var served = 0
    val echo = new PagedIngest.PageClient[(Long, String)] {
      def fetch(c: Option[String]) = { served += 1; (Seq((served.toLong, "x")), Some("loop")) }
    }
    var written = Seq.empty[(Long, String)]
    val res = PagedIngest.ingest(spark, echo) { df =>
      written ++= df.as[(Long, String)].collect()
    }
    // page at cursor None and page at cursor "loop" each land once; the
    // re-fetch of "loop" (which would duplicate) never happens
    assert(res.fetches == 2 && res.rows == 2 && res.stuckCursor)
    assert(written.sorted == Seq((1L, "x"), (2L, "x")))
  }
}
