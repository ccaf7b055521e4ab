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

  test("maxFetches terminates even when the API hands out cursors with empty pages") {
    val endless = new PagedIngest.PageClient[(Long, String)] {
      def fetch(c: Option[String]) =
        (Seq.empty, Some("again")) // never-ending empty pages
    }
    val res = PagedIngest.ingest(spark, endless, maxFetches = 5)(_ => ())
    assert(res.fetches == 5 && res.pages == 0 && res.resumeCursor == Some("again"))
  }
}
