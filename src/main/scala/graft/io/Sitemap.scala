package graft.io

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sitemap ingestion (sitemaps.org XML) — the third leg of crawl
  * planning next to the robots gate and the CDX index reader: a
  * sitemap enumerates a host's fetchable URLs (and freshness hints)
  * BEFORE any page is fetched, so the frontier plans on ~100-byte
  * entries, never archives.
  *
  * Parsing is deliberately regex-structural (`<loc>`/`<lastmod>`
  * inside `<url>`/`<sitemap>` blocks) rather than a full XML parse:
  * real-world sitemaps are machine-generated and regular, the patterns
  * live in the Java-regex ∩ RE2 subset so SQL engines replay them
  * verbatim, and the whole extraction is map-side codegen'd column
  * work — no UDF, no shuffle, file-level parallelism.
  */
object Sitemap {

  /** The per-entry blocks of a sitemap: `<url>…</url>` (urlset) or
    * `<sitemap>…</sitemap>` (sitemapindex), document order. */
  private def blocks(xml: Column): Column =
    regexp_extract_all(coalesce(xml, lit("")),
      lit("(?s)<(?:url|sitemap)>(.*?)</(?:url|sitemap)>"), lit(1))

  /** Which sitemap flavor a document is: `index` (a sitemapindex
    * pointing at further sitemaps), `urlset` (page entries), or
    * `unknown`. The index/leaf split drives the fetch plan: index
    * entries go back on the frontier, urlset entries are candidates. */
  def sitemapKind(xml: Column): Column =
    when(coalesce(xml, lit("")).contains("<sitemapindex"), "index")
      .when(coalesce(xml, lit("")).contains("<urlset"), "urlset")
      .otherwise("unknown")

  /** Explode one row per sitemap entry: (…, entry_no ≥ 1, url,
    * lastmod — empty string when the optional tag is absent, kind).
    * Map-side regex over the blocks; keeps every input column. */
  def sitemapEntries(df: DataFrame, xmlCol: String = "xml"): DataFrame = {
    // input columns survive into the output next to the fixed entry
    // columns — a frame already carrying one of those names would come
    // out with ambiguous duplicates (and the temp names would be
    // silently dropped), so fail it by name instead
    val reserved = Seq("entry_no", "url", "lastmod", "kind",
      "_p", "_b", "_kind")
    val clash = df.columns.toSeq.intersect(reserved)
    require(clash.isEmpty,
      s"sitemapEntries input already carries ${clash.mkString(", ")} — " +
        "rename before parsing (the entry columns use those names)")
    val locPat = "<loc>([^<]*)</loc>"
    val modPat = "<lastmod>([^<]*)</lastmod>"
    // sitemaps.org REQUIRES entity-escaping inside <loc>: a URL with a
    // query string arrives as ?a=1&amp;b=2, and undecoded it matches
    // neither the robots gate, the captured-set anti-join, nor the
    // real fetch — decode both extracted fields (identity on
    // entity-free values, the overwhelmingly common case)
    def unescape(c: Column): Column =
      graft.functions.UrlExpressions.xmlUnescape(c)
    df.withColumn("_kind", sitemapKind(col(xmlCol)))
      .select(col("*"),
        posexplode(blocks(col(xmlCol))).as(Seq("_p", "_b")))
      .select(col("*"),
        (col("_p") + 1).as("entry_no"),
        unescape(regexp_extract(col("_b"), locPat, 1)).as("url"),
        unescape(regexp_extract(col("_b"), modPat, 1)).as("lastmod"),
        col("_kind").as("kind"))
      .drop("_p", "_b", "_kind")
      .filter(length(col("url")) > 0)
  }

  /** `Sitemap:` discovery lines out of a robots.txt body (the standard
    * way hosts ANNOUNCE their sitemaps) — one URL per declaration,
    * case-insensitive directive, surrounding whitespace trimmed. */
  def sitemapsFromRobots(robotsTxt: Column): Column =
    regexp_extract_all(coalesce(robotsTxt, lit("")),
      lit("(?im)^\\s*sitemap\\s*:\\s*(\\S+)\\s*$"), lit(1))
}
