package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.io.Warc

/** WARC ingest: record splitting, header parsing, Content-Length
  * truncation, HTTP envelope stripping. */
class WarcSpec extends SparkSpec {

  private def fixture(): String = {
    def rec(headers: Seq[(String, String)], body: String): String = {
      val hdr = headers.map { case (k, v) => s"$k: $v" }.mkString("\r\n")
      s"WARC/1.0\r\n$hdr\r\n\r\n$body\r\n\r\n"
    }
    val httpBody = "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" +
      "<html>hello crawl</html>"
    val warc =
      rec(Seq("WARC-Type" -> "warcinfo",
        "WARC-Record-ID" -> "<urn:uuid:info-1>",
        "WARC-Date" -> "2024-01-01T00:00:00Z",
        "Content-Length" -> "9"), "robots: x") +
      rec(Seq("WARC-Type" -> "response",
        "WARC-Target-URI" -> "http://example.org/a",
        "WARC-Record-ID" -> "<urn:uuid:resp-1>",
        "WARC-Date" -> "2024-01-01T00:00:01Z",
        "Content-Length" -> httpBody.length.toString), httpBody) +
      rec(Seq("WARC-Type" -> "conversion",
        "WARC-Target-URI" -> "http://example.org/a",
        "WARC-Record-ID" -> "<urn:uuid:conv-1>",
        "WARC-Date" -> "2024-01-01T00:00:02Z",
        "Content-Length" -> "11"), "hello crawl")
    val dir = Files.createTempDirectory("graft_warc")
    val f = dir.resolve("segment-00000.warc")
    Files.write(f, warc.getBytes("UTF-8"))
    f.toString
  }

  test("records: one row per WARC record, headers parsed, Content-Length " +
    "honored, HTTP envelope stripped") {
    val df = Warc.records(spark, fixture())
    val rows = df.orderBy("warc_date").collect()
    assert(rows.length == 3)
    assert(rows.map(_.getAs[String]("warc_type")).toSeq ==
      Seq("warcinfo", "response", "conversion"))
    // warcinfo has no target URI → empty extract
    assert(rows(0).getAs[String]("target_uri") == "")
    assert(rows(1).getAs[String]("target_uri") == "http://example.org/a")
    // Content-Length truncation removed the record-trailing \r\n\r\n
    assert(rows(2).getAs[String]("content") == "hello crawl")
    assert(rows(0).getAs[String]("content") == "robots: x")
    // HTTP envelope stripping on the response record
    val payload = df.filter(col("warc_type") === "response")
      .select(Warc.httpPayload(col("content"))).head().getString(0)
    assert(payload == "<html>hello crawl</html>")
    // and the conversion payload is already bare
    val conv = df.filter(col("warc_type") === "conversion")
      .select(Warc.httpPayload(col("content"))).head().getString(0)
    assert(conv == "hello crawl")
  }

  test("ingestWarc: documents-shaped frame, envelope stripped, stable ids") {
    val path = fixture()
    val docs = graft.pipeline.Pipelines.ingestWarc(spark, path)
    assert(docs.columns.toSeq ==
      Seq("doc_id", "text", "lang", "source", "n_chars"))
    val rows = docs.orderBy("text").collect()
    assert(rows.length == 2) // warcinfo excluded
    assert(rows.map(_.getAs[String]("text")).toSeq ==
      Seq("<html>hello crawl</html>", "hello crawl"))
    assert(rows.forall(_.getAs[String]("source") == "example.org"))
    assert(rows.forall(r =>
      r.getAs[Long]("n_chars") == r.getAs[String]("text").length))
    // ids are stable across re-reads of the same segment
    val again = graft.pipeline.Pipelines.ingestWarc(spark, path)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(again == rows.map(_.getAs[Long]("doc_id")).toSet)
  }

  test("ingestWarc extractHtml: response markup strips to prose, " +
    "conversion text is unchanged") {
    val docs = graft.pipeline.Pipelines
      .ingestWarc(spark, fixture(), extractHtml = true)
      .orderBy("text").collect()
    // "<html>hello crawl</html>" → "hello crawl"; the conversion
    // record's plain text passes through identically
    assert(docs.map(_.getAs[String]("text")).toSeq ==
      Seq("hello crawl", "hello crawl"))
    assert(docs.forall(r =>
      r.getAs[Long]("n_chars") == r.getAs[String]("text").length))
  }

  test("ingestWarc HTTP gates: non-2xx bodies drop with okStatusOnly, " +
    "contentTypes routes media, envelope-less conversion text passes") {
    val path = fixture2xx()
    val all = graft.pipeline.Pipelines.ingestWarc(spark, path)
    assert(all.count() == 4) // 200 html + 404 + 200 pdf + conversion
    val ok = graft.pipeline.Pipelines.ingestWarc(spark, path,
      okStatusOnly = true)
    assert(ok.count() == 3) // the 404 body drops
    val html = graft.pipeline.Pipelines.ingestWarc(spark, path,
      okStatusOnly = true, contentTypes = Some(Seq("text/html")))
    val texts = html.orderBy("text").collect()
      .map(_.getAs[String]("text")).toSeq
    // pdf body routed away; conversion text (no envelope) passes through
    assert(texts == Seq("<html>ok page</html>", "bare text"), s"$texts")
  }

  private def fixture2xx(): String = {
    def rec(headers: Seq[(String, String)], body: String): String = {
      val hdr = (headers :+ ("Content-Length" -> body.length.toString))
        .map { case (k, v) => s"$k: $v" }.mkString("\r\n")
      s"WARC/1.0\r\n$hdr\r\n\r\n$body\r\n\r\n"
    }
    def resp(id: String, status: String, ct: Option[String],
             body: String): String = {
      val ctLine = ct.map(c => s"Content-Type: $c\r\n").getOrElse("")
      rec(Seq("WARC-Type" -> "response",
        "WARC-Target-URI" -> "http://example.org/x",
        "WARC-Record-ID" -> s"<urn:uuid:$id>",
        "WARC-Date" -> "2024-01-01T00:00:01Z"),
        s"HTTP/1.1 $status\r\n$ctLine\r\n$body")
    }
    val warc =
      resp("h1", "200 OK", Some("text/html; charset=utf-8"),
        "<html>ok page</html>") +
      resp("h2", "404 Not Found", None, "missing") +
      resp("h3", "200 OK", Some("application/pdf"), "%PDF-1.4 x") +
      rec(Seq("WARC-Type" -> "conversion",
        "WARC-Target-URI" -> "http://example.org/x",
        "WARC-Record-ID" -> "<urn:uuid:h4>",
        "WARC-Date" -> "2024-01-01T00:00:02Z"), "bare text")
    val dir = Files.createTempDirectory("graft_http")
    val f = dir.resolve("segment-00000.warc")
    Files.write(f, warc.getBytes("UTF-8"))
    f.toString
  }

  private def wetFixture(): String = {
    def rec(headers: Seq[(String, String)], body: String): String = {
      val hdr = (headers :+ ("Content-Length" -> body.length.toString))
        .map { case (k, v) => s"$k: $v" }.mkString("\r\n")
      s"WARC/1.0\r\n$hdr\r\n\r\n$body\r\n\r\n"
    }
    val wet =
      rec(Seq("WARC-Type" -> "warcinfo",
        "WARC-Record-ID" -> "<urn:uuid:i>",
        "WARC-Date" -> "2024-01-01T00:00:00Z"), "software: t") +
      rec(Seq("WARC-Type" -> "conversion",
        "WARC-Target-URI" -> "http://example.org/a",
        "WARC-Record-ID" -> "<urn:uuid:w1>",
        "WARC-Refers-To" -> "<urn:uuid:resp-1>",
        "WARC-Date" -> "2024-01-01T00:00:01Z"),
        // extracted text that HAPPENS to start like an HTTP envelope —
        // the WET path must NOT strip it (there is no envelope in WET)
        "HTTP/1.1 is a protocol\r\n\r\nand this line must survive")
    val dir = Files.createTempDirectory("graft_wet")
    val f = dir.resolve("segment-00000.warc.wet")
    Files.write(f, wet.getBytes("UTF-8"))
    f.toString
  }

  test("wetRecords + ingestWet: conversion text taken VERBATIM — no " +
    "envelope strip, no markup chain; warcinfo excluded") {
    val recs = Warc.wetRecords(spark, wetFixture()).collect()
    assert(recs.length == 1)
    assert(recs(0).getAs[String]("text") ==
      "HTTP/1.1 is a protocol\r\n\r\nand this line must survive")
    val docs = graft.pipeline.Pipelines.ingestWet(spark, wetFixture())
    assert(docs.columns.toSeq ==
      Seq("doc_id", "text", "lang", "source", "n_chars"))
    val r = docs.head()
    // ingestWarc's response path WOULD strip this prefix — the WET fast
    // path keeps it, because conversion content is already payload
    assert(r.getAs[String]("text").startsWith("HTTP/1.1 is a protocol"))
    assert(r.getAs[String]("source") == "example.org")
    assert(r.getAs[Long]("n_chars") == r.getAs[String]("text").length)
  }

  private def watFixture(withLinks: Boolean): String = {
    def rec(headers: Seq[(String, String)], body: String): String = {
      val hdr = (headers :+ ("Content-Length" -> body.length.toString))
        .map { case (k, v) => s"$k: $v" }.mkString("\r\n")
      s"WARC/1.0\r\n$hdr\r\n\r\n$body\r\n\r\n"
    }
    val env =
      if (withLinks)
        """{"Envelope":{"WARC-Header-Metadata":{"WARC-Target-URI":
          |"http://canonical.example.org/a"},"Payload-Metadata":
          |{"HTTP-Response-Metadata":{"HTML-Metadata":{"Links":[
          |{"path":"A@/href","url":"https://x.example.net/1"},
          |{"path":"IMG@/src","url":"https://img.example.net/p.png"},
          |{"path":"A@/href"}]}}}}}""".stripMargin.replace("\n", "")
      else """{"Envelope":{"Payload-Metadata":{}}}"""
    val wat =
      rec(Seq("WARC-Type" -> "metadata",
        "WARC-Target-URI" -> "http://example.org/a",
        "WARC-Record-ID" -> "<urn:uuid:m1>",
        "WARC-Date" -> "2024-01-01T00:00:01Z"), env) +
      rec(Seq("WARC-Type" -> "metadata",
        "WARC-Target-URI" -> "http://example.org/broken",
        "WARC-Record-ID" -> "<urn:uuid:m2>",
        "WARC-Date" -> "2024-01-01T00:00:02Z"), "{not json at all")
    val dir = Files.createTempDirectory("graft_wat")
    val f = dir.resolve("segment-00000.warc.wat")
    Files.write(f, wat.getBytes("UTF-8"))
    f.toString
  }

  test("watLinks: envelope target URI wins over the record header, one " +
    "row per outlink, null-url entries dropped, malformed JSON and " +
    "link-less envelopes yield no rows") {
    val got = Warc.watLinks(spark, watFixture(withLinks = true))
      .orderBy("dst_url").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSeq
    assert(got == Seq(
      ("http://canonical.example.org/a", "https://img.example.net/p.png",
        "IMG@/src"),
      ("http://canonical.example.org/a", "https://x.example.net/1",
        "A@/href")), s"got $got")
    assert(Warc.watLinks(spark, watFixture(withLinks = false)).count() == 0)
  }

  // ---- charset-aware binary scan ----------------------------------

  /** Byte-level fixture builder for recordsDecoded: response records
    * with an arbitrary body byte payload and Content-Type. */
  private def binRec(rid: String, rtype: String, uri: Option[String],
                     content: Array[Byte]): Array[Byte] = {
    val hdr = new StringBuilder()
      .append("WARC/1.0\r\n")
      .append(s"WARC-Type: $rtype\r\n")
      .append(s"WARC-Record-ID: <urn:uuid:$rid>\r\n")
    uri.foreach(u => hdr.append(s"WARC-Target-URI: $u\r\n"))
    hdr.append(s"Content-Length: ${content.length}\r\n\r\n")
    hdr.toString.getBytes("US-ASCII") ++ content ++
      "\r\n\r\n".getBytes("US-ASCII")
  }

  private def httpBytes(body: Array[Byte], ct: String): Array[Byte] =
    (s"HTTP/1.1 200 OK\r\nContent-Type: $ct\r\n" +
      s"Content-Length: ${body.length}\r\n\r\n").getBytes("US-ASCII") ++
      body

  private def charsetFixtureBytes: Array[Byte] =
    binRec("w1", "response", Some("https://a.example/1"),
      httpBytes("déjà vu".getBytes("ISO-8859-1"),
        "text/html; charset=ISO-8859-1")) ++
    binRec("w2", "response", Some("https://b.example/2"),
      httpBytes(("<html><head><meta http-equiv=\"Content-Type\" " +
        "content=\"text/html; charset=windows-1251\"></head>" +
        "<body>привет</body></html>").getBytes("windows-1251"),
        "text/html")) ++
    binRec("w3", "response", Some("https://c.example/3"),
      httpBytes("plain utf-8 ✓".getBytes("UTF-8"), "text/plain")) ++
    binRec("w4", "response", Some("https://d.example/4"),
      httpBytes(Array[Byte]('o', 'k', 0xff.toByte, 'x'),
        "text/html; charset=utf-8"))

  private def writeTmp(name: String, bytes: Array[Byte]): String = {
    val dir = Files.createTempDirectory("graft_warc_bin")
    val f = dir.resolve(name)
    Files.write(f, bytes)
    f.toString
  }

  test("recordsDecoded: declared Content-Type charset wins (ISO-8859-1 " +
    "round-trips), the HTML meta http-equiv form is the fallback " +
    "(windows-1251), absent declarations decode as UTF-8") {
    val f = writeTmp("seg.warc", charsetFixtureBytes)
    val rows = Warc.recordsDecoded(spark, f).orderBy("record_id")
      .collect().map(r => (r.getAs[String]("record_id"),
        r.getAs[String]("charset_declared"), r.getAs[String]("charset"),
        r.getAs[Int]("decode_ok"), r.getAs[String]("text"))).toSeq
    assert(rows.map(_._1) == Seq("<urn:uuid:w1>", "<urn:uuid:w2>",
      "<urn:uuid:w3>", "<urn:uuid:w4>"))
    assert(rows(0)._2 == "iso-8859-1" && rows(0)._3 == "iso-8859-1" &&
      rows(0)._4 == 1 && rows(0)._5 == "déjà vu", s"got ${rows(0)}")
    assert(rows(1)._2 == "windows-1251" && rows(1)._3 == "windows-1251" &&
      rows(1)._4 == 1 && rows(1)._5.contains("привет"), s"got ${rows(1)}")
    assert(rows(2)._2 == null && rows(2)._3 == "utf-8" &&
      rows(2)._4 == 1 && rows(2)._5 == "plain utf-8 ✓", s"got ${rows(2)}")
  }

  test("recordsDecoded: a body that violates its declared charset is " +
    "NOT dropped — UTF-8 replacement decode, decode_ok = 0") {
    val f = writeTmp("seg.warc", charsetFixtureBytes)
    val r = Warc.recordsDecoded(spark, f)
      .filter(col("record_id") === "<urn:uuid:w4>").head()
    assert(r.getAs[Int]("decode_ok") == 0)
    assert(r.getAs[String]("text") == "ok\ufffdx")
    assert(r.getAs[String]("charset") == "utf-8")
  }

  test("recordsDecoded: gzipped archives inflate in-task and produce " +
    "the identical rows") {
    val plain = writeTmp("seg.warc", charsetFixtureBytes)
    val bout = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(bout)
    gz.write(charsetFixtureBytes); gz.close()
    val gzf = writeTmp("seg.warc.gz", bout.toByteArray)
    val a = Warc.recordsDecoded(spark, plain).orderBy("record_id")
      .collect().toSeq
    val b = Warc.recordsDecoded(spark, gzf).orderBy("record_id")
      .collect().toSeq
    assert(a == b, "gz rows differ from plain rows")
  }

  test("ingestWarc decodeCharset=true: documents-shaped frame with the " +
    "decoded text and a decode_ok flag; gates still apply") {
    val f = writeTmp("seg.warc", charsetFixtureBytes)
    val docs = graft.pipeline.Pipelines.ingestWarc(spark, f,
      types = Seq("response"), decodeCharset = true,
      contentTypes = Some(Seq("text/html")))
      .orderBy("source").collect()
    // text/plain record w3 is routed out by the media-type gate
    assert(docs.length == 3)
    val bySource = docs.map(r =>
      r.getAs[String]("source") -> r).toMap
    assert(bySource("a.example").getAs[String]("text") == "déjà vu")
    assert(bySource("a.example").getAs[Int]("decode_ok") == 1)
    assert(bySource("d.example").getAs[Int]("decode_ok") == 0)
    assert(docs.forall(r => r.getAs[Long]("n_chars") ==
      r.getAs[String]("text").length))
  }

  test("records: a truncated header-less record yields a null " +
    "content_length instead of aborting the scan under ANSI") {
    val warc = "WARC/1.0\r\nWARC-Type: response\r\n" +
      "WARC-Record-ID: <urn:uuid:ok>\r\nContent-Length: 4\r\n\r\nbody\r\n\r\n" +
      // truncated record: headers cut off before Content-Length
      "WARC/1.0\r\nWARC-Type: respo"
    val dir = Files.createTempDirectory("graft_trunc")
    val f = dir.resolve("segment-00000.warc")
    Files.write(f, warc.getBytes("UTF-8"))
    val rows = Warc.records(spark, f.toString).orderBy("record_id")
      .collect()
    assert(rows.length == 2)
    assert(rows.exists(r => r.isNullAt(r.fieldIndex("content_length"))))
    assert(rows.exists(r =>
      !r.isNullAt(r.fieldIndex("content_length")) &&
        r.getAs[String]("content") == "body"))
  }

  test("Cdx: the fixture index parses field-for-field, a malformed " +
    "line quarantines as NULLs, digest dedup keeps the earliest " +
    "capture, and the fetch plan is one offset-ordered sweep per " +
    "archive with non-200s gated") {
    import graft.io.Cdx
    import org.apache.spark.sql.functions._
    val path = getClass.getResource("/graft/fixture.cdx").getPath
    val recs = Cdx.records(spark, path)
    assert(recs.count() == 6)
    val a = recs.filter(col("urlkey") === "com,example)/a").head()
    assert(a.getAs[String]("timestamp") == "20250101120000" &&
      a.getAs[String]("url") == "https://example.com/a" &&
      a.getAs[String]("mime") == "text/html" &&
      a.getAs[Int]("status") == 200 &&
      a.getAs[String]("digest") == "SHAAAAAA1111" &&
      a.getAs[Long]("length") == 1200L &&
      a.getAs[Long]("offset") == 0L &&
      a.getAs[String]("filename") == "crawl-00.warc.gz")
    // quarantine: the junk line keeps its raw text, fields NULL
    val bad = recs.filter(col("url").isNull).collect()
    assert(bad.length == 1 &&
      bad(0).getAs[String]("line").startsWith("this line"))
    // digest dedup: /a2 repeats /a's digest and is the LATER capture
    val kept = Cdx.dedupByDigest(recs)
      .filter(col("digest") === "SHAAAAAA1111").collect()
    assert(kept.length == 1 &&
      kept(0).getAs[String]("urlkey") == "com,example)/a")
    // fetch plan: per archive, offset order; the 404 never fetches
    val plan = Cdx.planFetch(Cdx.dedupByDigest(recs))
      .orderBy("filename", "fetch_seq").collect()
    assert(plan.map(r => (r.getAs[String]("filename"),
      r.getAs[Int]("fetch_seq"), r.getAs[Long]("offset"))).toSeq ==
      Seq(("crawl-00.warc.gz", 1, 0L), ("crawl-00.warc.gz", 2, 1200L),
        ("crawl-01.warc.gz", 1, 0L)))
  }
}
