package graft.io

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Minimal WARC (ISO 28500 Web ARChive — Common Crawl's distribution
  * format, the canonical LLM training-data source) record scan, built on
  * the text source's custom record delimiter: each WARC record becomes
  * one row at scan time and ALL parsing is per-row column expressions —
  * embarrassingly parallel, no shuffle, codegen'd. Gzipped `.warc.gz`
  * inputs decompress transparently through the Hadoop codec (one task
  * per archive, as with any non-splittable gzip; Common Crawl ships
  * ~1 GB segment files precisely so file-level parallelism suffices).
  *
  * Parsed per record: warc_type, target_uri, record_id, warc_date,
  * content_length, and the raw content block (headers beyond these stay
  * in `content`'s header section for callers that need more). Use
  * [[httpPayload]] to strip the HTTP envelope from `response` records
  * before text extraction. */
object Warc {

  private val Delim = "WARC/1.0\r\n"

  def records(spark: SparkSession, path: String): DataFrame = {
    val raw = spark.read.option("lineSep", Delim).text(path)
    // the first split before the leading delimiter is empty — drop it
    raw.filter(length(col("value")) > 0)
      .select(
        substring_index(col("value"), "\r\n\r\n", 1).as("hdr"),
        // content starts after the first blank line (4 delimiter chars)
        col("value").substr(
          length(substring_index(col("value"), "\r\n\r\n", 1)) + lit(5),
          length(col("value"))).as("raw_content"))
      .select(
        hdrField("WARC-Type").as("warc_type"),
        hdrField("WARC-Target-URI").as("target_uri"),
        hdrField("WARC-Record-ID").as("record_id"),
        hdrField("WARC-Date").as("warc_date"),
        regexp_extract(col("hdr"), "Content-Length: ([0-9]+)", 1)
          .cast("long").as("content_length"),
        col("raw_content"))
      // honor Content-Length when present: records end with \r\n\r\n
      // before the next delimiter, which would otherwise trail in content
      .withColumn("content",
        when(col("content_length") > 0,
          col("raw_content").substr(lit(1),
            col("content_length").cast("int")))
          .otherwise(col("raw_content")))
      .drop("raw_content")
  }

  private def hdrField(name: String): Column =
    regexp_extract(col("hdr"), name + ": ([^\r\n]+)", 1)

  /** Strip the HTTP response envelope (status line + headers) from a
    * `response` record's content, leaving the payload; non-HTTP content
    * passes through untouched. */
  def httpPayload(content: Column): Column =
    when(content.startsWith("HTTP/"),
      content.substr(
        length(substring_index(content, "\r\n\r\n", 1)) + lit(5),
        length(content)))
      .otherwise(content)
}
