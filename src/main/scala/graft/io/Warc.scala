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
        // guard the cast: a truncated/header-less record yields an empty
        // extract, and under ANSI an unconditional cast('') would abort
        // the ENTIRE scan — one malformed record in a 100 TB crawl must
        // not kill the job. (The optimizer can also reorder predicates
        // so the projection evaluates before the record filter — e.g.
        // a filter inferred from a downstream generator — making the
        // guard load-bearing even on well-formed archives.)
        when(lenField =!= "", lenField.cast("long"))
          .as("content_length"),
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

  private def lenField: Column =
    regexp_extract(col("hdr"), "Content-Length: ([0-9]+)", 1)

  /** Strip the HTTP response envelope (status line + headers) from a
    * `response` record's content, leaving the payload; non-HTTP content
    * passes through untouched. */
  def httpPayload(content: Column): Column =
    when(content.startsWith("HTTP/"),
      content.substr(
        length(substring_index(content, "\r\n\r\n", 1)) + lit(5),
        length(content)))
      .otherwise(content)

  /** HTTP status code of a `response` record's content (the envelope's
    * status line), NULL for non-HTTP content — the gate that keeps
    * 404/500/redirect bodies out of a text corpus. Map-side regex. */
  def httpStatus(content: Column): Column = {
    val s = regexp_extract(content, "^HTTP/[0-9.]+ ([0-9]{3})", 1)
    // guarded cast: a malformed status line extracts '' and an
    // unconditional ANSI cast would abort the scan (the Content-Length
    // lesson) — malformed envelopes report NULL instead
    when(content.startsWith("HTTP/") && s =!= "", s.cast("int"))
  }

  /** The envelope's Content-Type value (parameters like charset
    * stripped, lowercased), NULL for non-HTTP content or a missing
    * header — the text/html vs pdf/image router before any byte is
    * decoded. */
  def httpContentType(content: Column): Column = {
    val ct = lower(trim(
      regexp_extract(substring_index(content, "\r\n\r\n", 1),
        "(?im)^content-type:\\s*([^;\r\n]+)", 1)))
    when(content.startsWith("HTTP/") && ct =!= "", ct)
  }

  /** WET sidecar scan — Common Crawl's extracted-text companion archives
    * (`*.warc.wet.gz`): `conversion` records whose content IS the page
    * text, already extracted by the crawler. This is the fast path that
    * SKIPS HTML extraction entirely: no HTTP envelope to strip, no
    * markup chain to run — the scan's per-row work is just the WARC
    * header parse. Exposes `WARC-Refers-To` (the originating response
    * record) so WET rows can re-join their WARC/WAT siblings. Same
    * parallelism story as [[records]]. */
  def wetRecords(spark: SparkSession, path: String): DataFrame =
    records(spark, path)
      .filter(col("warc_type") === "conversion")
      .select(col("record_id"), col("target_uri"), col("warc_date"),
        col("content_length"), col("content").as("text"))

  /** The subset of Common Crawl's WAT envelope JSON the link-graph path
    * needs: the canonical target URI and the outlink array. Unmodelled
    * fields are simply not parsed — `from_json` ignores them. */
  private val WatSchema = org.apache.spark.sql.types.StructType.fromDDL(
    """Envelope STRUCT<
      |  `WARC-Header-Metadata` STRUCT<`WARC-Target-URI` STRING>,
      |  `Payload-Metadata` STRUCT<
      |    `HTTP-Response-Metadata` STRUCT<
      |      `HTML-Metadata` STRUCT<
      |        Links ARRAY<STRUCT<path STRING, url STRING>>>>>>""".stripMargin)

  /** WAT sidecar scan — the metadata companion archives (`*.warc.wat.gz`)
    * whose `metadata` records carry a JSON envelope with the page's
    * outlinks, HTTP headers, and structural metadata. This feeds the
    * link graph WITHOUT any payload decode: one `from_json` over the
    * schema subset above (map-side, codegen'd), one `explode` of the
    * Links array — the HTML itself is never read. Output: one row per
    * outlink (src_url, dst_url, link_path); compose with
    * [[graft.text.UrlOps.registeredDomain]] + `graft.ops.Graph` for the
    * domain graph (the q155/q158 shape). */
  def watLinks(spark: SparkSession, path: String): DataFrame =
    records(spark, path)
      .filter(col("warc_type") === "metadata")
      .select(col("target_uri"),
        from_json(col("content"), WatSchema).as("j"))
      .select(
        coalesce(
          col("j.Envelope.WARC-Header-Metadata.WARC-Target-URI"),
          col("target_uri")).as("src_url"),
        explode(col("j.Envelope.Payload-Metadata.HTTP-Response-Metadata" +
          ".HTML-Metadata.Links")).as("l"))
      .select(col("src_url"), col("l.url").as("dst_url"),
        col("l.path").as("link_path"))
      .filter(col("dst_url").isNotNull)
}
