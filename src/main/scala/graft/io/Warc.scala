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

  // ---- charset-aware binary scan --------------------------------------

  private val RecordSchema = org.apache.spark.sql.types.StructType.fromDDL(
    """record_id STRING, warc_type STRING, target_uri STRING,
      |warc_date STRING, content_length BIGINT, http_status INT,
      |http_content_type STRING, charset_declared STRING, charset STRING,
      |decode_ok INT, text STRING""".stripMargin.replace("\n", " "))

  private val DelimBytes = Delim.getBytes("US-ASCII")
  private val CrlfCrlf = "\r\n\r\n".getBytes("US-ASCII")

  private def indexOf(hay: Array[Byte], needle: Array[Byte],
                      from: Int): Int = {
    var i = math.max(from, 0)
    val last = hay.length - needle.length
    while (i <= last) {
      var j = 0
      while (j < needle.length && hay(i + j) == needle(j)) j += 1
      if (j == needle.length) return i
      i += 1
    }
    -1
  }

  /** Forward-only byte window over an InputStream — the incremental
    * record-parse substrate for [[recordsDecoded]]: buffers only from
    * the current consume point forward and fills on demand, so peak
    * memory is the largest single record (plus one delimiter
    * scan-ahead), NOT the inflated archive (a ~1 GB compressed Common
    * Crawl WARC inflates to ~5 GB; materializing that per task is an
    * executor OOM). Offsets are ABSOLUTE stream positions; the parse
    * loop never looks behind the last `drop`. */
  private final class ByteWindow(in: java.io.InputStream) {
    private var buf = new Array[Byte](1 << 16)
    private var base = 0L // absolute offset of buf(0)
    private var len = 0   // valid bytes in buf
    private var eof = false

    /** Absolute end of currently buffered data (== total stream length
      * once EOF has been reached). */
    def end: Long = base + len

    private def fill(): Boolean = {
      if (eof) return false
      if (len == buf.length) {
        // cap growth below VM array limits: `<< 1` would overflow to a
        // negative size past 1 GiB buffered and surface as an opaque
        // NegativeArraySizeException; a single record (or delimiter
        // scan-ahead) that large deserves a descriptive failure instead
        val maxLen = Int.MaxValue - 16
        if (buf.length >= maxLen)
          throw new IllegalStateException(
            s"WARC record exceeds the $maxLen-byte buffer limit at " +
              s"stream offset $base — archive is malformed or carries " +
              "a record too large to parse in one window")
        val grown =
          new Array[Byte](math.min(buf.length.toLong * 2L, maxLen).toInt)
        System.arraycopy(buf, 0, grown, 0, len)
        buf = grown
      }
      val n = in.read(buf, len, buf.length - len)
      if (n < 0) { eof = true; false } else { len += n; true }
    }

    /** Buffer through absolute offset `upto` (exclusive); false when
      * the stream ends first. */
    def ensure(upto: Long): Boolean = {
      while (base + len < upto && fill()) {}
      base + len >= upto
    }

    /** Buffer the remainder of the stream (the no-Content-Length tail
      * record case — bounded by that record's own size). */
    def readToEof(): Unit = while (fill()) {}

    /** First absolute offset >= `from` where `needle` matches, or -1
      * when the rest of the stream has no match. */
    def indexOf(needle: Array[Byte], from: Long): Long = {
      var i = math.max(from, base)
      while (true) {
        if (!ensure(i + needle.length)) return -1L
        val lastAbs = base + len - needle.length
        while (i <= lastAbs) {
          val off = (i - base).toInt
          var j = 0
          while (j < needle.length && buf(off + j) == needle(j)) j += 1
          if (j == needle.length) return i
          i += 1
        }
        if (!fill()) return -1L
      }
      -1L
    }

    /** Exact-position match test (the trailing-CRLFCRLF probe). */
    def matchesAt(needle: Array[Byte], at: Long): Boolean = {
      if (at < base || !ensure(at + needle.length)) return false
      val off = (at - base).toInt
      var j = 0
      while (j < needle.length && buf(off + j) == needle(j)) j += 1
      j == needle.length
    }

    /** Copy of buffered bytes [from, until) — callers ensure() first;
      * both ends clamp to the buffered region. */
    def slice(from: Long, until: Long): Array[Byte] = {
      val u = math.min(until, base + len)
      val f = math.min(math.max(from, base), u)
      java.util.Arrays.copyOfRange(buf, (f - base).toInt, (u - base).toInt)
    }

    /** Discard buffered bytes before absolute offset `upto` — the
      * memory-bound lever; parse never revisits dropped bytes. */
    def drop(upto: Long): Unit = {
      if (upto > base) {
        val d = math.min(upto - base, len.toLong).toInt
        System.arraycopy(buf, d, buf, 0, len - d)
        base += d
        len -= d
      }
    }
  }

  private def headerField(hdr: String, name: String): Option[String] = {
    val m = java.util.regex.Pattern
      .compile("(?im)^" + java.util.regex.Pattern.quote(name) +
        ":\\s*([^\\r\\n]+)").matcher(hdr)
    if (m.find()) Some(m.group(1).trim) else None
  }

  /** Charset declared in a Content-Type value's `charset=` parameter. */
  private def charsetParam(ct: String): Option[String] = {
    val m = java.util.regex.Pattern
      .compile("(?i)charset\\s*=\\s*\"?([A-Za-z0-9._-]+)").matcher(ct)
    if (m.find()) Some(m.group(1)) else None
  }

  /** Charset declared by an HTML `<meta charset=..>` or the legacy
    * `<meta http-equiv=Content-Type content="..; charset=..">` form,
    * searched in the first `probe` payload bytes read as ISO-8859-1
    * (ASCII-compatible — every IANA charset a meta tag can name agrees
    * with ASCII on the bytes the tag itself uses). */
  private def metaCharset(payload: Array[Byte], probe: Int): Option[String] = {
    val head = new String(payload, 0, math.min(probe, payload.length),
      java.nio.charset.StandardCharsets.ISO_8859_1)
    val m1 = java.util.regex.Pattern
      .compile("(?is)<meta[^>]*charset\\s*=\\s*[\"']?([A-Za-z0-9._-]+)")
      .matcher(head)
    if (m1.find()) Some(m1.group(1)) else None
  }

  /** Strict decode attempt: full round through a REPORTing decoder —
    * None on unsupported charset name or malformed/unmappable input. */
  private def tryDecode(bytes: Array[Byte], cs: String): Option[String] =
    try {
      val dec = java.nio.charset.Charset.forName(cs).newDecoder()
        .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
        .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
      Some(dec.decode(java.nio.ByteBuffer.wrap(bytes)).toString)
    } catch { case _: Exception => None }

  /** CHARSET-AWARE WARC scan — the ingest-normalize step a real crawl
    * needs before any text rule: real Common Crawl response bodies are a
    * charset zoo (historically ~30%+ of pages non-UTF-8: ISO-8859-x,
    * Shift_JIS, GBK, windows-1251 ...), and reading them through the
    * UTF-8 text source pre-mojibakes every non-UTF-8 row beyond repair —
    * the damage gate can then only DROP them. This scan reads archives
    * via the `binaryFile` source (the [[graft.io.Archives]] pattern),
    * splits records on the delimiter BYTES, and decodes each response
    * payload by its declared charset: the HTTP `Content-Type` header's
    * `charset=` parameter wins, then the HTML `<meta charset>` /
    * http-equiv form probed in the first `metaProbeBytes` payload bytes,
    * then UTF-8. An undecodable body (unsupported name or bytes that
    * violate the declared encoding) is NOT dropped: it falls back to
    * UTF-8 with U+FFFD replacement and reports `decode_ok = 0` — the
    * mojibake-flag contract ([[graft.text.TextOps]]'s damage gate
    * decides downstream, per-corpus policy).
    *
    * Scale shape: one task per archive (the gzip story of [[records]] —
    * `.gz` members are inflated in-task, multi-member streams
    * included), all parsing per-row inside the scan, archive bytes
    * never shuffle; only decoded text and header fields flow on.
    * Inflation is STREAMED record-by-record through a forward-only
    * [[ByteWindow]]: peak task memory is the COMPRESSED archive (the
    * `binaryFile` source materializes those bytes — ~1 GB for a
    * standard Common Crawl segment) plus the largest single record,
    * never the ~5× inflated archive.
    * `mapPartitions` is the honest tool here — per-record byte-level
    * codec work no Catalyst expression expresses (the
    * [[graft.multimodal.Multimodal]] decode precedent). */
  def recordsDecoded(spark: SparkSession, path: String,
                     metaProbeBytes: Int = 1024): DataFrame =
    decodeArchives(spark.read.format("binaryFile").load(path),
      metaProbeBytes)

  /** The `binaryFile` source's fixed schema — needed explicitly by the
    * STREAMING reader (file-source streams require a user schema). */
  private val BinaryFileSchema =
    org.apache.spark.sql.types.StructType.fromDDL(
      "path STRING, modificationTime TIMESTAMP, " +
        "length BIGINT, content BINARY")

  /** STREAMING [[recordsDecoded]] — the continuous-crawl front door:
    * Common Crawl drops land as files, so a `binaryFile` FILE-SOURCE
    * stream over the drop directory + the same per-archive streaming
    * record decode turns each newly-arrived archive into decoded-record
    * rows exactly once (file-source tracking via the query checkpoint).
    * Compose with [[graft.streaming.Streaming.warcDocStream]] /
    * `curateForeachBatch` for crawl-to-curated end-to-end. */
  def recordsDecodedStream(spark: SparkSession, path: String,
                           metaProbeBytes: Int = 1024): DataFrame =
    decodeArchives(
      spark.readStream.format("binaryFile").schema(BinaryFileSchema)
        .load(path),
      metaProbeBytes)

  /** Shared decode transform over a (path, content) archive frame —
    * batch and streaming sources route through the same per-record
    * incremental parser (map-only `flatMap`, streaming-legal). */
  private def decodeArchives(archives: DataFrame,
                             metaProbeBytes: Int): DataFrame = {
    import org.apache.spark.sql.Row
    implicit val enc =
      org.apache.spark.sql.catalyst.encoders.RowEncoder
        .encoderFor(RecordSchema)
    val probe = metaProbeBytes
    archives
      .select(col("path"), col("content"))
      .flatMap { fr =>
        val raw0 = fr.getAs[Array[Byte]]("content")
        val in0 = new java.io.ByteArrayInputStream(raw0)
        val in: java.io.InputStream =
          if (raw0.length >= 2 && (raw0(0) & 0xff) == 0x1f &&
            (raw0(1) & 0xff) == 0x8b)
            // GZIPInputStream concatenates multi-member streams — same
            // member semantics as the former whole-archive inflate
            new java.util.zip.GZIPInputStream(in0)
          else in0
        val w = new ByteWindow(in)
        new scala.collection.AbstractIterator[Row] {
          private var pos: Long = w.indexOf(DelimBytes, 0L)
          private var ready: Row = null

          override def hasNext: Boolean = {
            while (ready == null && pos >= 0L) parseOne()
            ready != null
          }

          override def next(): Row = {
            if (!hasNext) throw new NoSuchElementException("WARC scan")
            val r = ready; ready = null; r
          }

          // parse ONE record at `pos` — the batch delimiter-scan
          // semantics re-expressed in absolute stream offsets; advances
          // `pos` and drops consumed bytes (the memory bound: one
          // record, never the inflated archive)
          private def parseOne(): Unit = {
            val hdrStart = pos + DelimBytes.length
            val hdrEnd = w.indexOf(CrlfCrlf, hdrStart)
            if (hdrEnd < 0) { pos = -1L; return }
            val hdr = new String(w.slice(hdrStart, hdrEnd),
              java.nio.charset.StandardCharsets.ISO_8859_1)
            val cStart = hdrEnd + 4
            val declaredLen = headerField(hdr, "Content-Length")
              .flatMap(v => scala.util.Try(v.toLong).toOption)
            val nextDelim = w.indexOf(DelimBytes, cStart)
            val cEnd = declaredLen match {
              case Some(n) =>
                w.ensure(cStart + n) // clamps at EOF like bytes.length
                math.min(cStart + n, w.end)
              case None =>
                val stop =
                  if (nextDelim < 0) { w.readToEof(); w.end }
                  else nextDelim
                // records end with \r\n\r\n before the next delimiter
                if (stop - 4 >= cStart && w.matchesAt(CrlfCrlf, stop - 4))
                  stop - 4
                else stop
            }
            val content = w.slice(cStart, math.max(cEnd, cStart))
            // HTTP envelope split (response records)
            val isHttp = content.length >= 5 &&
              new String(content, 0, 5,
                java.nio.charset.StandardCharsets.US_ASCII) == "HTTP/"
            // Warc-qualified: the bare name would resolve to the
            // inherited Iterator.indexOf via auto-tupling — infinite
            // self-consumption
            val envEnd =
              if (isHttp) Warc.indexOf(content, CrlfCrlf, 0) else -1
            val (env, payload) =
              if (envEnd >= 0)
                (new String(content, 0, envEnd,
                  java.nio.charset.StandardCharsets.ISO_8859_1),
                  java.util.Arrays.copyOfRange(content, envEnd + 4,
                    content.length))
              else if (isHttp)
                (new String(content,
                  java.nio.charset.StandardCharsets.ISO_8859_1),
                  Array.empty[Byte])
              else ("", content)
            val status: Option[Int] =
              if (!isHttp) None
              else {
                val m = java.util.regex.Pattern
                  .compile("^HTTP/[0-9.]+ ([0-9]{3})").matcher(env)
                if (m.find()) Some(m.group(1).toInt) else None
              }
            val ctRaw = if (isHttp) headerField(env, "Content-Type")
              else None
            val mediaType = ctRaw.map(_.split(";")(0).trim.toLowerCase)
              .filter(_.nonEmpty)
            val declared = ctRaw.flatMap(charsetParam)
              .orElse(metaCharset(payload, probe))
              .map(_.toLowerCase)
            val attempt = declared.flatMap(cs => tryDecode(payload, cs)
              .map(t => (t, cs, 1)))
              .orElse(tryDecode(payload, "utf-8")
                .map(t => (t, "utf-8", if (declared.isEmpty) 1 else 0)))
            val (text, used, ok) = attempt.getOrElse {
              // undecodable under every candidate: UTF-8 with U+FFFD
              // replacement — flagged, never dropped
              (new String(payload,
                java.nio.charset.StandardCharsets.UTF_8), "utf-8", 0)
            }
            ready = Row(
              headerField(hdr, "WARC-Record-ID").orNull,
              headerField(hdr, "WARC-Type").orNull,
              headerField(hdr, "WARC-Target-URI").orNull,
              headerField(hdr, "WARC-Date").orNull,
              declaredLen.map(Long.box).orNull,
              status.map(Int.box).orNull,
              mediaType.orNull,
              declared.orNull,
              used, ok, text)
            pos = if (nextDelim >= 0 && nextDelim < cEnd)
              w.indexOf(DelimBytes, cEnd) else nextDelim
            if (pos >= 0L) w.drop(pos)
          }
        }
      }
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
