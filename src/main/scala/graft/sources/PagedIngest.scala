package graft.sources

import org.apache.spark.sql.{DataFrame, Encoder, SparkSession}

/** Cursor-paginated ingest adapter — the engine-side seam for the reference's
  * rate-limited collection loops (`Data Collection/Reddit.py:23-59`: HTTP GET
  * with `after` cursor + 100 req/min throttle; 4chan/YouTube variants).
  *
  * Boundary design: a cursored remote API is inherently serial, so pages
  * arrive as driver-side batches — but each page immediately becomes a
  * distributed DataFrame handed to the sink (durable parquet append, JDBC,
  * or a streaming source's staging dir), so at most ONE page of rows ever
  * sits on the driver. Rate limiting, auth and retries live inside the
  * injectable client (same seam shape as `Moderation.Client` /
  * `Multimodal.Decoder`); the loop itself is deterministic and testable.
  */
object PagedIngest {

  /** One page fetch: rows + the next cursor (None = stream exhausted). */
  trait PageClient[T] extends Serializable {
    def fetch(cursor: Option[String]): (Seq[T], Option[String])
  }

  /** Result of one ingest run: fetches issued, non-empty pages written, rows
    * written, the cursor to resume from (None = stream exhausted), and
    * whether the run stopped because the API repeated a cursor. */
  final case class IngestResult(fetches: Int, pages: Int, rows: Long,
                                resumeCursor: Option[String],
                                stuckCursor: Boolean = false)

  /** Drain the cursor chain, converting each page to a DataFrame and handing
    * it to `sink` (append-mode by convention). `maxFetches` bounds the number
    * of remote CALLS in one run (the reference's scheduler slot) — counting
    * fetches, not non-empty pages, so an API that hands out cursors with
    * empty pages cannot loop unboundedly. Resume by persisting
    * `resumeCursor` with the data and passing it as `startCursor` next run. */
  def ingest[T: Encoder](spark: SparkSession, client: PageClient[T],
                         startCursor: Option[String] = None,
                         maxFetches: Int = Int.MaxValue)(
      sink: DataFrame => Unit): IngestResult = {
    var cursor = startCursor
    var fetches = 0
    var pages = 0
    var rows = 0L
    var exhausted = false
    var stuck = false
    while (!exhausted && !stuck && fetches < maxFetches) {
      val (batch, next) = client.fetch(cursor)
      fetches += 1
      // a buggy/adversarial API that echoes the cursor it was given would
      // otherwise re-fetch (and duplicate) the same page until maxFetches;
      // this page was fetched once, so write it, then stop instead of
      // following the repeated cursor
      stuck = next.isDefined && next == cursor
      if (batch.nonEmpty) {
        sink(spark.createDataset(batch).toDF())
        pages += 1
        rows += batch.size
      }
      cursor = next
      exhausted = next.isEmpty
    }
    IngestResult(fetches, pages, rows, if (exhausted) None else cursor, stuck)
  }
}
