package graft.schema

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.ops.TextFunctions

/** Unified comment model (SURVEY.md §1.4): every platform in the reference
  * converges on the same implicit shape — Airflow's "unify_and_normalize"
  * step (`Data Collection/Airflow.py:69-73`). Here it's one canonical
  * StructType plus per-source adapters composed with `unionByName`.
  *
  * Per-source raw shapes (reference DDL):
  *  - reddit: `Data Collection/Reddit.py:151-161` (epoch-seconds timestamps)
  *  - 4chan:  `Data Collection/chan4.py:19-28` (free-text timestamps, HTML
  *            bodies)
  *  - youtube: `Data Collection/Youtube_final.py:90-96` (ISO-8601 `Z` text
  *            timestamps, composite (video_id, comment_id) key)
  */
object Comments {

  /** Canonical schema: (platform, comment_id, parent_id, body, author,
    * score, created_ts). */
  val schema: StructType = StructType(Seq(
    StructField("platform", StringType, nullable = false),
    StructField("comment_id", StringType),
    StructField("parent_id", StringType),
    StructField("body", StringType),
    StructField("author", StringType),
    StructField("score", IntegerType),
    StructField("created_ts", TimestampType)))

  /** reddit raw (subreddit, post_id, body, score, created_utc epoch-seconds,
    * comment_id) → canonical. */
  def fromReddit(df: DataFrame): DataFrame =
    df.select(
      lit("reddit").as("platform"),
      col("comment_id").cast(StringType).as("comment_id"),
      col("post_id").cast(StringType).as("parent_id"),
      col("body").cast(StringType).as("body"),
      col("subreddit").cast(StringType).as("author"), // closest authorship dim the source keeps
      coalesce(col("score").cast(IntegerType), lit(0)).as("score"),
      TextFunctions.epochToTs(col("created_utc")).as("created_ts"))

  /** 4chan raw (post_number, comment html, timestamp_raw text, name,
    * image_filename) → canonical; body HTML-stripped as the reference does at
    * ingest (`chan4.py:56-62`). */
  def fromChan(df: DataFrame): DataFrame =
    df.select(
      lit("4chan").as("platform"),
      col("post_number").cast(StringType).as("comment_id"),
      lit(null).cast(StringType).as("parent_id"),
      TextFunctions.htmlToText(col("comment")).as("body"),
      col("name").cast(StringType).as("author"),
      lit(0).as("score"),
      TextFunctions.chanTimestamp(col("timestamp_raw")).as("created_ts"))

  /** youtube raw (video_id, video_title, comment_id, comment_time ISO-Z text,
    * comment_text) → canonical. */
  def fromYoutube(df: DataFrame): DataFrame =
    df.select(
      lit("youtube").as("platform"),
      col("comment_id").cast(StringType).as("comment_id"),
      col("video_id").cast(StringType).as("parent_id"),
      col("comment_text").cast(StringType).as("body"),
      lit(null).cast(StringType).as("author"),
      lit(0).as("score"),
      TextFunctions.isoParse(col("comment_time")).as("created_ts"))

  /** "unify": cross-source assembly is a union, not a loop (SURVEY §2.6 q23). */
  def unify(sources: DataFrame*): DataFrame =
    sources.reduce(_.unionByName(_))
}
