package graft.text

import org.apache.spark.sql.{Column, DataFrame, Encoders}
import org.apache.spark.sql.functions._

/** URL curation primitives — the first stage of a crawl-derived training
  * pipeline (FineWeb/RefinedWeb-style URL filtering runs BEFORE any text
  * is fetched or decoded, making it the cheapest place to drop garbage at
  * 100 TB: a blocklist decision costs a few string ops per row, a decode
  * costs the payload). All map-only column-expression chains — no UDF,
  * no shuffle; the only join in the family is a broadcast left_anti
  * against a list-sized blocklist.
  */
object UrlOps {

  /** Tracking query parameters dropped by [[normalizeUrl]] (regex
    * alternation over parameter NAMES). Only UNAMBIGUOUS tracking names:
    * bare `ref` is deliberately absent — it is a functional parameter on
    * many sites (GitHub `?ref=branch`, git forges, docs sites), so
    * dropping it would collapse distinct resources into one canonical
    * URL. Corpora where `ref` IS tracking can pass a custom alternation
    * to the [[normalizeUrl]] overload. */
  val TrackingParams =
    "utm_[^=&]*|gclid|fbclid|msclkid|mc_eid|igshid|twclid|yclid"

  /** Canonical URL form for dedup keys and blocklist joins: fragment
    * stripped; scheme and host[:port] lowercased (path case AND any
    * userinfo are PRESERVED — both are case-sensitive per RFC 3986);
    * default `:80`/`:443` ports stripped; duplicate path slashes
    * collapsed; trailing slash dropped; tracking parameters removed, an
    * emptied query dropped entirely. Deliberately conservative: no
    * percent-decoding and no parameter re-ordering — both can change
    * request semantics. */
  def normalizeUrl(url: Column): Column = normalizeUrl(url, TrackingParams)

  /** [[normalizeUrl]] with a caller-supplied tracking-parameter NAME
    * alternation (anchored per parameter, `name` or `name=...` forms). */
  def normalizeUrl(url: Column, trackingParams: String): Column = {
    val noFrag = regexp_replace(url, "#.*$", "")
    // authority = scheme://[userinfo@]host[:port]; scheme and host are
    // case-insensitive, userinfo is not
    val auth = regexp_extract(noFrag,
      "^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)", 1)
    val rest = noFrag.substr(length(auth) + lit(1), length(noFrag))
    val scheme = lower(regexp_extract(auth,
      "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val userinfo = regexp_extract(auth,
      "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*@)", 1)
    val hostPort = lower(regexp_extract(auth,
      "^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/?#@]*@)?([^/?#]*)$", 1))
    val hostPortNorm =
      when(scheme === "https", regexp_replace(hostPort, ":443$", ""))
        .when(scheme === "http", regexp_replace(hostPort, ":80$", ""))
        .otherwise(hostPort)
    val authNorm = when(auth === "", lit(""))
      .otherwise(concat(scheme, lit("://"), userinfo, hostPortNorm))
    val path = regexp_extract(rest, "^([^?]*)", 1)
    val query = regexp_extract(rest, "\\?(.*)$", 1)
    val pathNorm =
      regexp_replace(regexp_replace(path, "/{2,}", "/"), "/$", "")
    val keptQ = array_join(
      filter(split(query, "&"),
        p => !p.rlike(s"^($trackingParams)(=|$$)")), "&")
    concat(authNorm, pathNorm,
      when(keptQ === "", lit("")).otherwise(concat(lit("?"), keptQ)))
  }

  /** Lowercased host of a URL: authority minus scheme, userinfo, port. */
  def hostOf(url: Column): Column =
    lower(regexp_extract(url,
      "^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/?#@]*@)?([^/?#:]*)", 1))

  /** Second-level labels treated as public suffixes by
    * [[registeredDomain]] when followed by a 2-letter ccTLD (co.uk,
    * com.au, ac.jp ...). A documented heuristic covering the common
    * cases — for production exactness use the rule-set overload
    * `registeredDomain(host, suffixes)` with [[PslSuffixes]] or a full
    * Public Suffix List; the grouping SHAPE (map-only) is unchanged. */
  val TwoLevelSuffixes = Seq("co", "com", "org", "net", "ac", "gov", "edu")

  /** Registrable domain of a HOST (not a full URL): the last two labels,
    * or the last three under a [[TwoLevelSuffixes]] + 2-letter-ccTLD
    * pair. The aggregation key for per-site caps, domain mix reports,
    * and blocklist joins — subdomains (www / cdn / user hosts) collapse
    * to one owner. */
  def registeredDomain(host: Column): Column = {
    val parts = split(lower(host), "\\.")
    val n = size(parts)
    val tld = element_at(parts, -1)
    val sld = element_at(parts, -2)
    val twoLevel = sld.isin(TwoLevelSuffixes: _*) && (length(tld) === 2)
    // condition order guards ANSI element_at: -2/-3 only evaluate once
    // n makes them valid
    when(n <= 1, lower(host))
      .when(n >= 3 && twoLevel,
        concat_ws(".", element_at(parts, -3), sld, tld))
      .otherwise(concat_ws(".", sld, tld))
  }

  /** [[registeredDomain]] under an EXPLICIT public-suffix rule set with
    * full publicsuffix.org semantics (plain rules, `*.` wildcards, `!`
    * exceptions; longest match wins) — the production-exact path the
    * default heuristic documents. Pass [[PslSuffixes]] (the shipped
    * snapshot), [[loadSuffixRules]] over the full
    * `public_suffix_list.dat`, or any custom rule list. Same map-only
    * shape: one codegen'd expression per row, no shuffle
    * ([[graft.functions.RegisteredDomainPsl]]). */
  def registeredDomain(host: Column, suffixes: Seq[String]): Column =
    graft.functions.UrlExpressions.registeredDomainPsl(host, suffixes)

  /** Parse PSL-grammar text: one rule per line, `//` comments and blank
    * lines ignored. Feed the result to [[registeredDomain]]'s rule-set
    * overload. */
  def loadSuffixRules(lines: Iterator[String]): Seq[String] =
    lines.map(_.trim).filter(l => l.nonEmpty && !l.startsWith("//")).toList

  private def loadPslResource(name: String): Seq[String] = {
    val in = getClass.getResourceAsStream(s"/graft/$name")
    require(in != null, s"graft/$name missing")
    try loadSuffixRules(
      scala.io.Source.fromInputStream(in, "UTF-8").getLines())
    finally in.close()
  }

  /** The shipped Public Suffix List SNAPSHOT
    * (resources/graft/public_suffix_snapshot.dat — curated offline from
    * general PSL knowledge as of early 2025: the major ccTLD
    * second-level schemes, the designated-city wildcard/exception
    * families, and the common PRIVATE-section hosts; every listed rule
    * is believed present in the genuine list, the gap is coverage, not
    * fidelity. The file's header documents how to swap in the full
    * publicsuffix.org list — `loadSuffixRules` parses it as-is). */
  lazy val PslSuffixes: Seq[String] = loadPslResource(
    "public_suffix_snapshot.dat")

  /** The small excerpt kept as the TEST fixture (the snapshot's
    * predecessor; see public_suffix_excerpt.dat). */
  lazy val PslExcerptSuffixes: Seq[String] = loadPslResource(
    "public_suffix_excerpt.dat")

  /** FineWeb-style per-domain cap: keep at most `maxDocs` rows per
    * registrable domain of `urlCol`, chosen in deterministic md5 order
    * of `idCol` — a reproducible uniform sample of each domain's docs,
    * with no crawl-position or recency bias, so one SEO farm cannot
    * dominate the corpus mix. One hash-partitioned `row_number` window
    * on the domain key (the W6 top-k shape), no second shuffle; the
    * domain itself is map-side label math. The mega-domain skew
    * mitigation is AUTOMATIC: Spark plans the `rk <= k` filter as a
    * `WindowGroupLimit` with a Partial phase — each input partition is
    * pre-capped to its local top-`maxDocs` BEFORE the exchange (a
    * superset of the global winners under any order), so at most
    * k·partitions rows per domain ever shuffle (PlanSpec-gated).
    * `suffixes` switches the domain key to the PSL rule-set path
    * ([[registeredDomain]]'s overload). */
  def capPerDomain(df: DataFrame, urlCol: String, maxDocs: Int,
                   idCol: String = "doc_id",
                   suffixes: Option[Seq[String]] = None): DataFrame = {
    require(maxDocs > 0, s"maxDocs must be positive, got $maxDocs")
    val dom = suffixes match {
      case Some(rules) => registeredDomain(hostOf(col(urlCol)), rules)
      case None => registeredDomain(hostOf(col(urlCol)))
    }
    graft.ops.Windows.topKPerGroup(
      df.withColumn("_reg_dom", dom), Seq("_reg_dom"),
      Seq(md5(col(idCol).cast("string")), col(idCol)), maxDocs)
      .drop("_reg_dom", "rk")
  }

  /** Drop rows whose URL's registrable domain is on `blocked` — the
    * URL-level spam/SEO/adult gate run before fetch/decode. The
    * blocklist broadcasts (it is list-sized); the corpus never shuffles
    * (left_anti with a broadcast build side). */
  def dropBlockedDomains(df: DataFrame, urlCol: String,
                         blocked: Seq[String]): DataFrame = {
    val spark = df.sparkSession
    val b = broadcast(
      spark.createDataset(blocked)(Encoders.STRING)
        .toDF("blocked_domain"))
    df.join(b,
      registeredDomain(hostOf(col(urlCol))) === col("blocked_domain"),
      "left_anti")
  }

  /** Disallow prefixes from a robots.txt body — SIMPLIFIED: every
    * `Disallow:` line regardless of its User-agent section (the
    * conservative read a bulk curation pass takes by honoring the most
    * restrictive rule set; agent-section scoping would need a stateful
    * parse — documented trade-off). Case-insensitive, one multiline
    * regex in the Java ∩ RE2 subset, map-only. Empty `Disallow:` lines
    * (allow-all markers) are excluded by the `\S+` requirement; the
    * gap matcher is `[ \t]*`, NOT `\s*` — `\s` crosses the newline and
    * would capture the next line's first token on an empty rule. */
  /** Canonical-URL dedup — the self-declared duplicate collapse that
    * runs BEFORE any content hashing: group pages by their normalized
    * `rel=canonical` target ([[graft.text.TextOps.canonicalUrl]],
    * falling back to the page's own URL when no canonical is declared),
    * keep the first (min id) of each group. Mirrors and
    * tracking-parameter variants that declare one canonical form
    * collapse without reading a byte of body text beyond the head
    * regex. Returns the input plus (canonical, keep) — one window
    * keyed on the normalized canonical string; the mega-group skew
    * mitigation is the same `WindowGroupLimit`-class story as
    * [[capPerDomain]] (here rank 1 of each group).
    *
    * RELATIVE canonical targets (RFC 6596 allows any RFC 3986
    * reference) are resolved against the page URL before normalizing —
    * without this, the very common `href="/"` / `href="/page"` forms
    * would normalize to the same key for EVERY site and mass-collapse
    * unrelated pages. Resolution: absolute targets pass through;
    * `//host/...` takes the page scheme; `/path` takes the page
    * origin; any other relative form (dot-segments, bare `page.html`)
    * conservatively falls back to the page's own URL — no collapse is
    * always safe, full RFC 3986 merge-path semantics are not worth a
    * false one. */
  def canonicalDedup(docs: DataFrame, urlCol: String = "url",
                     htmlCol: String = "html",
                     idCol: String = "doc_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val page = col(urlCol)
    val raw = graft.text.TextOps.canonicalUrl(col(htmlCol))
    val scheme = regexp_extract(page, "^([A-Za-z][A-Za-z0-9+.-]*):", 1)
    val origin = regexp_extract(page,
      "^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)", 1)
    val resolved = when(raw.isNull, page)
      .when(raw.rlike("^[A-Za-z][A-Za-z0-9+.-]*://"), raw)
      .when(raw.startsWith("//") && scheme =!= "",
        concat(scheme, lit(":"), raw))
      .when(raw.startsWith("/") && !raw.startsWith("//") &&
        origin =!= "", concat(origin, raw))
      .otherwise(page)
    val canon = normalizeUrl(resolved)
    val w = Window.partitionBy("canonical").orderBy(col(idCol))
    docs.withColumn("canonical", canon)
      .withColumn("keep", (row_number().over(w) === 1).cast("int"))
  }

  /** `<loc>` URLs from a sitemap.xml body, in document order — the
    * crawl-frontier seed source beside outlink extraction (sitemaps
    * surface pages no link reaches). Handles both urlset and
    * sitemapindex files (the `<loc>` shape is shared); whitespace
    * around the value trimmed. Map-side `regexp_extract_all` in the
    * RE2 ∩ Java subset; compose with `explode` + [[normalizeUrl]] into
    * [[crawlFrontier]]. */
  def sitemapUrls(xml: Column): Column =
    transform(
      regexp_extract_all(coalesce(xml, lit("")),
        lit("(?is)<loc>\\s*([^<]+?)\\s*</loc>"), lit(1)),
      u => trim(u))

  def robotsDisallows(robotsTxt: Column): Column =
    regexp_extract_all(coalesce(robotsTxt, lit("")),
      lit("(?im)^disallow:[ \\t]*(\\S+)"), lit(1))

  /** ROBOTS-RULE URL FILTER — crawl politeness as a relational gate:
    * drop URLs whose host has a matching (host, prefix) disallow rule
    * and whose path starts with the prefix. `rules` is the per-host
    * rule table ([[robotsDisallows]] exploded per fetched robots.txt,
    * or any policy list) — list-sized, so it rides a BROADCAST
    * left_anti with an equi-join on host and the prefix test as the
    * residual; the URL corpus never shuffles. Path is the raw path
    * component (no query/fragment), empty for bare-host URLs — prefix
    * semantics per the original robots.txt convention (plain string
    * prefix, no wildcards). */
  def dropDisallowed(urls: DataFrame, rules: DataFrame,
                     urlCol: String = "url"): DataFrame = {
    val host = hostOf(col(urlCol))
    val path = regexp_extract(col(urlCol),
      "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]+(/[^?#]*)", 1)
    val r = broadcast(rules.select(col("host").as("_r_host"),
      col("prefix").as("_r_prefix")))
    urls.withColumn("_host", host).withColumn("_path", path)
      .join(r, col("_host") === col("_r_host") &&
        col("_path").startsWith(col("_r_prefix")), "left_anti")
      .drop("_host", "_path")
  }

  /** URL PATH-DEPTH STATISTICS per registrable domain — the crawl
    * frontier-shaping signal (deep archives and calendar traps show up
    * as depth excursions; most curation policies cap fetch depth per
    * domain): URL count, max depth, and the exact-quotient mean depth,
    * where depth = number of non-empty `/`-separated path segments
    * (query/fragment excluded). Map-only projection + one grouped
    * aggregation; URL strings never shuffle — only (domain, depth). */
  def urlDepthStats(urls: DataFrame, urlCol: String = "url",
                    suffixes: Option[Seq[String]] = None): DataFrame = {
    val host = hostOf(col(urlCol))
    val domain = suffixes.map(sx => registeredDomain(host, sx))
      .getOrElse(registeredDomain(host))
    val path = regexp_extract(col(urlCol),
      "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]+(/[^?#]*)", 1)
    val depth = size(filter(split(path, "/"), s => length(s) > 0))
      .cast("long")
    urls.filter(length(host) > 0)
      .select(domain.as("domain"), depth.as("depth"))
      .groupBy("domain")
      .agg(count(lit(1)).as("n_urls"),
        max("depth").as("max_depth"),
        (sum("depth").cast("double") / count(lit(1))).as("mean_depth"))
  }

  /** Crawl-delay seconds from a robots.txt body: the FIRST
    * `Crawl-delay: N` line (case-insensitive, any agent section — the
    * same conservative whole-file read as [[robotsDisallows]]),
    * `defaultDelay` when absent. The guard keeps the ANSI-mode cast off
    * the empty no-match string. */
  def crawlDelay(robotsTxt: Column, defaultDelay: Int = 1): Column = {
    val m = regexp_extract(coalesce(robotsTxt, lit("")),
      "(?im)^crawl-delay:[ \\t]*(\\d+)", 1)
    when(m =!= "", m.cast("long")).otherwise(defaultDelay.toLong)
  }

  /** FETCH MAKESPAN per fetcher shard — the politeness-bound schedule
    * estimate that closes the [[hostShardPlan]] loop: a host's serial
    * fetch time is n_urls · crawl_delay (politeness forbids
    * parallelism WITHIN a host), and a shard that interleaves its
    * hosts finishes when its slowest host does, so the shard makespan
    * is max over hosts — the OPTIMISTIC (perfect-interleave) bound,
    * documented; the pessimistic serial bound is the sum, also
    * emitted. `robots` is the per-host (host, robots_txt) table —
    * catalog-sized, broadcast; the URL corpus reduces to per-host
    * counts before anything joins. */
  def fetchMakespan(urls: DataFrame, robots: DataFrame,
                    urlCol: String = "url", nShards: Int = 8,
                    defaultDelay: Int = 1): DataFrame = {
    val perHost = urls.select(hostOf(col(urlCol)).as("host"))
      .filter(length(col("host")) > 0)
      .groupBy("host").agg(count(lit(1)).as("n_urls"))
    perHost
      .join(broadcast(robots.select(col("host"),
        crawlDelay(col("robots_txt"), defaultDelay).as("delay"))),
        Seq("host"), "left")
      .withColumn("delay",
        coalesce(col("delay"), lit(defaultDelay.toLong)))
      .withColumn("shard", TextOps.hashBucket(col("host"), nShards))
      .withColumn("fetch_seconds", col("n_urls") * col("delay"))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_hosts"),
        sum("n_urls").as("n_urls"),
        max("fetch_seconds").as("makespan_seconds"),
        sum("fetch_seconds").as("serial_seconds"))
  }

  /** CRAWL FRONTIER — the next-fetch queue builder: candidate outlinks,
    * canonicalized ([[normalizeUrl]]), minus everything already crawled
    * (one url-keyed left_anti), ranked by reference count — the
    * "most-cited uncrawled URL first" priority every breadth-oriented
    * crawler starts from (in-degree is the cheap stand-in for URL-level
    * PageRank). Returns the top `k` (url, n_refs). At 100 TB both
    * sides hash-partition on the canonical URL for the anti-join, the
    * count is map-side combined, and the top-k is one bounded take —
    * nothing but (url, count) pairs ever shuffles. */
  def crawlFrontier(outlinks: DataFrame, crawled: DataFrame,
                    urlCol: String = "url", k: Int = 100): DataFrame = {
    require(k > 0, "k must be positive")
    val cand = outlinks.select(normalizeUrl(col(urlCol)).as("u"))
    val seen = crawled.select(normalizeUrl(col(urlCol)).as("u")).distinct()
    cand.join(seen, Seq("u"), "left_anti")
      .groupBy("u").agg(count(lit(1)).as("n_refs"))
      .orderBy(col("n_refs").desc, col("u"))
      .limit(k)
      .select(col("u").as("url"), col("n_refs"))
  }

  /** FETCHER-SHARD PLAN — the crawl-scheduling step after the politeness
    * gates: assign every distinct host to one of `nShards` fetcher
    * shards by its md5 bucket (all of a host's URLs land on the same
    * fetcher, the invariant per-host rate limiting needs), and report
    * per-shard load: host count, total URLs, and the largest single
    * host (the politeness-bound critical path — a shard's wall-clock is
    * `max_host_urls · crawl_delay`, not its total). Two grouped
    * aggregations, host-cardinality then shard-cardinality — URL
    * payloads never shuffle, and the skew this REPORTS is exactly what
    * the md5 assignment keeps bounded across shards. */
  def hostShardPlan(urls: DataFrame, urlCol: String = "url",
                    nShards: Int = 8): DataFrame = {
    require(nShards > 0, "nShards must be positive")
    val perHost = urls.select(hostOf(col(urlCol)).as("host"))
      .filter(length(col("host")) > 0)
      .groupBy("host").agg(count(lit(1)).as("n_urls"))
      .withColumn("shard", TextOps.hashBucket(col("host"), nShards))
    perHost.groupBy("shard")
      .agg(count(lit(1)).as("n_hosts"),
        sum("n_urls").as("n_urls"),
        max("n_urls").as("max_host_urls"))
  }

  /** RFC 9309 robots.txt GROUP PARSE — the full agent-scoped form of
    * [[robotsDisallows]] (which conservatively flattens every Disallow
    * regardless of its User-agent section). Entirely RELATIONAL — lines
    * explode, a gaps-and-islands window assigns group ids, agent
    * selection and rule extraction are joins/filters — so there is no
    * custom parser to keep in sync with the SQL surface and the whole
    * parse is one plan.
    *
    * Semantics (RFC 9309 §2.2):
    *  - a GROUP is one or more adjacent `User-agent:` lines followed by
    *    its `Allow:` / `Disallow:` rules; the next User-agent line
    *    after at least one rule starts a new group;
    *  - blank lines and `#` comments are insignificant (1994-spec
    *    record separation by blank line is NOT applied);
    *  - rules before any User-agent line belong to no group — ignored;
    *  - group selection per host: the groups whose agent token equals
    *    `agent` (case-insensitive product-token match); if none exist,
    *    the `*` groups. Multiple matching groups combine (§2.2.1);
    *  - empty rule values (`Disallow:` with nothing — the allow-all
    *    idiom) contribute no rule;
    *  - `*` in a rule value matches any char sequence; a trailing `$`
    *    anchors the end; both are compiled to a regex with every other
    *    char escaped (RE2 ∩ Java subset — no user-controlled regex
    *    runs raw).
    *
    * Returns (host, allow ∈ {0,1}, pattern, plen, rx) — feed to
    * [[robotsDecisions]]. Cardinality is |hosts| · rules-per-file:
    * catalog-sized next to a URL corpus, so the decision join
    * broadcasts it. */
  /** The shared robots GROUP machinery both directive readers ride:
    * comment-stripped non-empty lines with their UA-group id, plus the
    * (host, g) groups SELECTED for `agent` (exact agent group beats
    * `*` — RFC 9309 §2.2.1). One implementation, so UA matching and
    * group detection cannot diverge between the allow/disallow rules
    * and Crawl-delay. */
  private def robotsGroups(robots: DataFrame, agent: String,
      hostCol: String, bodyCol: String): DataFrame = {
    require(agent.nonEmpty, "agent must be non-empty")
    val W = org.apache.spark.sql.expressions.Window
    val lines = robots.select(col(hostCol).as("host"),
        posexplode(split(coalesce(col(bodyCol), lit("")), "\n"))
          .as(Seq("ln", "raw")))
      .select(col("host"), col("ln"),
        trim(regexp_replace(col("raw"), "#.*", "")).as("line"))
      .filter(col("line") =!= "")
    val isUa = col("line").rlike("(?i)^user-agent[ \t]*:")
    val cls = lines.select(col("host"), col("ln"), col("line"),
      when(isUa, lower(trim(regexp_extract(col("line"),
        "(?i)^user-agent[ \t]*:(.*)$", 1)))).as("ua"))
    val wOrd = W.partitionBy("host").orderBy("ln")
    // group selection as WINDOW FLAGS over the same host partitioning
    // the gaps-and-islands pass already established — the former
    // exact/wild distinct + anti-join + semi-join spent four exchanges
    // per directive reader on what three stacked window maxes answer in
    // place: a (host, g) group is selected iff it names the agent, or
    // the host names it nowhere and the group is `*` (RFC 9309 §2.2.1,
    // same set as the old exact ∪ wild construction).
    // Locale.ROOT: a tr-locale driver must not fold the agent name
    // differently from the executor-side lower()
    val agentLc = agent.toLowerCase(java.util.Locale.ROOT)
    val isExact = when(col("ua") === agentLc, 1).otherwise(0)
    val isWild = when(col("ua") === "*", 1).otherwise(0)
    cls
      .withColumn("ua_start",
        (col("ua").isNotNull &&
          coalesce(lag(col("ua").isNotNull, 1).over(wOrd), lit(false))
            === false).cast("int"))
      .withColumn("g", sum("ua_start").over(
        wOrd.rowsBetween(W.unboundedPreceding, W.currentRow)))
      .withColumn("_gx", max(isExact).over(W.partitionBy("host", "g")))
      .withColumn("_gw", max(isWild).over(W.partitionBy("host", "g")))
      .withColumn("_hx", max(isExact).over(W.partitionBy("host")))
      .withColumn("selected",
        col("_gx") === 1 || (col("_hx") === 0 && col("_gw") === 1))
      .drop("_gx", "_gw", "_hx")
  }

  def robotsAgentRules(robots: DataFrame, agent: String = "*",
                       hostCol: String = "host",
                       bodyCol: String = "body"): DataFrame = {
    val grouped = robotsGroups(robots, agent, hostCol, bodyCol)
    val rules = grouped
      .select(col("host"), col("g"), col("selected"),
        when(col("ua").isNull &&
          col("line").rlike("(?i)^allow[ \t]*:"), 1)
          .when(col("ua").isNull &&
            col("line").rlike("(?i)^disallow[ \t]*:"), 0).as("allow"),
        trim(regexp_extract(col("line"),
          "(?i)^(dis)?allow[ \t]*:(.*)$", 2)).as("value"))
      .filter(col("allow").isNotNull && col("g") > 0 &&
        col("value") =!= "" && col("selected"))
      .select(col("host"), col("allow"), col("value").as("pattern"))
      .distinct()
    // pattern -> anchored regex: escape everything, then * -> .* and a
    // trailing $ -> end anchor; precedence length is the raw pattern's
    val endAnchor = col("pattern").endsWith("$")
    val core = when(endAnchor,
      expr("substring(pattern, 1, length(pattern) - 1)"))
      .otherwise(col("pattern"))
    val esc = regexp_replace(core,
      "[\\.\\^\\$\\+\\?\\(\\)\\[\\]\\{\\}\\|\\\\]", "\\\\$0")
    val rx = concat(lit("^"), regexp_replace(esc, "\\*", ".*"),
      when(endAnchor, lit("$")).otherwise(lit("")))
    rules.select(col("host"), col("allow"), col("pattern"),
      length(col("pattern")).cast("long").as("plen"), rx.as("rx"))
  }

  /** Per-host CRAWL-DELAY under the same agent-group scoping as
    * [[robotsAgentRules]] (the SHARED [[robotsGroups]] machinery —
    * exact agent group wins over `*`; the de facto directive most
    * large crawlers honor even though RFC 9309 leaves it out): one row
    * per host that declares one, seconds as DOUBLE (fractional delays
    * occur in the wild), the FIRST declaration in the selected group
    * winning (file order — repeated directives are author error;
    * first-wins is what big crawlers do). Feeds the frontier's
    * per-host politeness spacing (fetch_seq · delay = the earliest
    * polite fetch time). */
  def robotsCrawlDelays(robots: DataFrame, agent: String = "*",
                        hostCol: String = "host",
                        bodyCol: String = "body"): DataFrame = {
    robotsGroups(robots, agent, hostCol, bodyCol)
      .select(col("host"), col("g"), col("ln"), col("selected"),
        when(col("line").rlike("(?i)^crawl-delay[ \t]*:"),
          trim(regexp_extract(col("line"),
            "(?i)^crawl-delay[ \t]*:(.*)$", 1))).as("delay"))
      .filter(col("delay").isNotNull && col("g") > 0 &&
        col("delay").rlike("^[0-9]+(\\.[0-9]+)?$") && col("selected"))
      .groupBy("host")
      .agg(min_by(col("delay"), col("ln")).as("d"))
      .select(col("host"), col("d").cast("double").as("crawl_delay_s"))
  }

  /** Apply [[robotsAgentRules]] to a URL table — RFC 9309 §2.2.2
    * precedence: among the host's rules whose compiled pattern matches
    * the URL path, the LONGEST raw pattern wins; Allow wins a length
    * tie; no matching rule (or no rules for the host at all) means
    * allowed. Returns the input plus (allowed ∈ {0,1}, rule — the
    * winning pattern, null when none matched).
    *
    * The rule table broadcasts (|hosts|·rules rows); candidates are the
    * host's own rules (LEFT equi-join on host, the regex match as
    * residual); the winner is one per-id max(struct(plen, allow,
    * pattern)) aggregation — map-side combined, no window, one pass
    * over `urls` (idCol must identify rows), riding any existing
    * id partitioning. Matching
    * is on the path PLUS query (de-facto REP matching — common crawler
    * rules target query strings, e.g. a Disallow of slash-star followed
    * by `?sessionid=`, and RFC 9309 §2.2.2's match target is the
    * percent-encoded path-and-query);
    * fragments are excluded, bare-host URLs match as "/", and a
    * query-only URL ("http://h?x") matches as "/?x". */
  def robotsDecisions(urls: DataFrame, rules: DataFrame,
                      urlCol: String = "url",
                      idCol: String = "doc_id"): DataFrame = {
    val host = hostOf(col(urlCol))
    val pq = regexp_extract(col(urlCol),
      "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]+([/?][^#]*)", 1)
    val path = when(pq === "", lit("/"))
      .when(pq.startsWith("?"), concat(lit("/"), pq))
      .otherwise(pq)
    val r = broadcast(rules.select(col("host").as("_r_host"),
      col("allow").as("_r_allow"), col("pattern").as("_r_pattern"),
      col("plen").as("_r_plen"), col("rx").as("_r_rx")))
    // ONE pass over `urls` (idCol identifies rows — every caller's
    // contract): LEFT broadcast join + per-id max. The former
    // inner-join winners + left join-back consumed the urls lineage on
    // BOTH sides of the id join, and the join's pushed null filters
    // made the two subtrees non-identical, so exchange reuse never
    // fired — q309 parsed every sitemap twice. A url with no matching
    // rule keeps one null-rule row, whose all-null struct is the max
    // only when nothing real matched — exactly the old left-join null.
    urls
      .select(struct(col("*")).as("_u"), col(idCol).as("_id"),
        host.as("_host"), path.as("_path"))
      .join(r, col("_host") === col("_r_host") &&
        regexp_like(col("_path"), col("_r_rx")), "left")
      .groupBy(col("_id"))
      .agg(first(col("_u")).as("_u"),
        max(struct(col("_r_plen").as("plen"),
          col("_r_allow").as("allow"),
          col("_r_pattern").as("pattern"))).as("_w"))
      .select(col("_u.*"),
        coalesce(col("_w.allow"), lit(1)).cast("int").as("allowed"),
        col("_w.pattern").as("rule"))
  }

  /** Broadcast a substring keyword list as an Aho-Corasick automaton —
    * the C4/CCNet-style URL blocklist gate at real list sizes
    * (thousands of entries): ONE pass per row, cost independent of the
    * list length (see [[graft.functions.AhoCorasick]]). Keywords are
    * lowercased and deduplicated; match the lowercased URL. */
  def keywordAutomatonBroadcast(spark: org.apache.spark.sql.SparkSession,
      keywords: Seq[String])
      : org.apache.spark.broadcast.Broadcast[
        graft.functions.AhoCorasick.Automaton] =
    spark.sparkContext.broadcast(graft.functions.AhoCorasick.build(
      // Locale.ROOT: a tr-locale driver would fold I to dotless ı and
      // silently never match the executor-side lower()
      keywords.map(_.toLowerCase(java.util.Locale.ROOT)).distinct))

  /** Distinct blocked keywords found ANYWHERE in the (lowercased) URL,
    * keyword-list order — substring semantics by design ('bet' flags
    * 'alphabet', exactly like the published lists intend reviewers to
    * tune with anchors). Map-only, one automaton pass. */
  def urlKeywordMatches(url: Column,
      bc: org.apache.spark.broadcast.Broadcast[
        graft.functions.AhoCorasick.Automaton]): Column =
    graft.functions.AhoCorasick.matches(
      lower(coalesce(url, lit(""))), bc)

  /** The gate form: keep rows whose URL matches NO keyword. */
  def urlKeywordGate(docs: DataFrame,
      bc: org.apache.spark.broadcast.Broadcast[
        graft.functions.AhoCorasick.Automaton],
      urlCol: String = "url"): DataFrame =
    docs.filter(size(urlKeywordMatches(col(urlCol), bc)) === 0)
}
