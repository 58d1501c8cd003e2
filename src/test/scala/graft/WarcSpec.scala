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
}
