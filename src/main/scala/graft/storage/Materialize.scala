package graft.storage

import org.apache.spark.sql.DataFrame

/** Write-once-per-JVM materialization guard — the shared discipline behind
  * the dedup component index, the co-purchase edge table, and the LM score
  * table: a derivation several consumers share is computed and persisted
  * exactly once per (input, params) key per JVM, atomically (concurrent
  * first touches block on `computeIfAbsent` rather than double-write), and
  * every NEW JVM recomputes on first touch so a stale on-disk artifact can
  * never be served. The key must encode the input identity AND every
  * parameter the derivation depends on.
  *
  * Input identity is CONTENT, not path: callers fold in
  * [[inputFingerprint]] — a hash of the input's file listing with sizes and
  * mtimes — so a long-lived JVM (server / notebook deployment) that
  * rewrites an input in place gets a fresh derivation on next touch instead
  * of being served the stale artifact (the write targets the same indexDir,
  * so the refresh overwrites it). The fingerprint is a driver-side metadata
  * listing, never a data read.
  *
  * This is the single-process analog of a production pipeline's
  * materialized-table step (per ingest batch, the component map / edge
  * table / quality scores are written once and every downstream consumer
  * scans them — at 100 TB the difference between one corpus pass and one
  * per consumer).
  */
object Materialize {
  private val done = new java.util.concurrent.ConcurrentHashMap[String, Unit]()

  def once(key: String)(write: => Unit): Unit =
    done.computeIfAbsent(key, _ => write)

  /** Cheap content fingerprint of a DataFrame's file-source inputs: a hash
    * over the sorted (uri, size, mtime) triples. Any rewrite changes it —
    * Spark part-file names are unique per write, so even a same-length
    * rewrite flips the listing. Non-file-backed inputs (in-memory test
    * frames) yield a constant, degrading to the plain path key. */
  def inputFingerprint(df: DataFrame): String = {
    val entries = df.inputFiles.sorted.map { u =>
      val f = try {
        val uri = java.net.URI.create(u)
        new java.io.File(if (uri.getPath == null) u else uri.getPath)
      } catch { case _: IllegalArgumentException => new java.io.File(u) }
      s"$u:${f.length}:${f.lastModified}"
    }
    val h = entries.foldLeft(1125899906842597L)((acc, s) => acc * 31 + s.hashCode)
    java.lang.Long.toHexString(h)
  }

  /** The composite key for [[once]]: artifact dir + input content. */
  def key(indexDir: String, input: DataFrame): String =
    s"$indexDir#${inputFingerprint(input)}"
}
