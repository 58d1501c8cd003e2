package graft

import org.apache.spark.sql.functions._
import graft.text.UrlOps

/** URL curation primitives: canonicalization, registrable domain,
  * blocklist gate. */
class UrlSpec extends SparkSpec {
  import spark.implicits._

  private def norm(url: String): String =
    Seq(url).toDF("u").select(UrlOps.normalizeUrl(col("u"))).head()
      .getString(0)

  private def regDom(host: String): String =
    Seq(host).toDF("h").select(UrlOps.registeredDomain(col("h"))).head()
      .getString(0)

  test("normalizeUrl: case, ports, slashes, tracking params, fragment") {
    // authority lowercases, path case preserved
    assert(norm("HTTPS://WWW.Ex.COM/Path/File.HTML") ==
      "https://www.ex.com/Path/File.HTML")
    // default ports strip; non-default ports survive
    assert(norm("https://ex.com:443/a") == "https://ex.com/a")
    assert(norm("http://ex.com:80/a") == "http://ex.com/a")
    assert(norm("http://ex.com:443/a") == "http://ex.com:443/a")
    assert(norm("https://ex.com:8443/a") == "https://ex.com:8443/a")
    // duplicate slashes collapse, trailing slash drops (root included)
    assert(norm("https://ex.com//a///b/") == "https://ex.com/a/b")
    assert(norm("https://ex.com/") == "https://ex.com")
    // tracking params drop wherever they sit; an emptied query vanishes
    assert(norm("https://ex.com/a?utm_source=x&id=5&fbclid=z") ==
      "https://ex.com/a?id=5")
    assert(norm("https://ex.com/a?gclid=1") == "https://ex.com/a")
    // bare `ref` is FUNCTIONAL on many sites (GitHub branches, forges) —
    // the default list keeps it; a custom alternation can drop it
    assert(norm("https://ex.com/a?ref=main") == "https://ex.com/a?ref=main")
    assert(Seq("https://ex.com/a?ref=main&id=1").toDF("u")
      .select(UrlOps.normalizeUrl(col("u"), "ref")).head().getString(0) ==
      "https://ex.com/a?id=1")
    // a non-tracking param whose name merely CONTAINS a tracking name
    // survives (anchored match on the full name)
    assert(norm("https://ex.com/a?refresh=1") ==
      "https://ex.com/a?refresh=1")
    // fragment always strips; kept params keep their order
    assert(norm("https://ex.com/a?b=2&a=1#frag") ==
      "https://ex.com/a?b=2&a=1")
    // no percent-decoding (semantics-preserving conservatism)
    assert(norm("https://ex.com/a%2Fb") == "https://ex.com/a%2Fb")
    // userinfo is case-sensitive per RFC 3986: preserved verbatim while
    // scheme and host still lowercase around it
    assert(norm("HTTPS://UserA@WWW.Ex.COM:443/p") ==
      "https://UserA@www.ex.com/p")
  }

  test("hostOf strips scheme, userinfo, and port") {
    val got = Seq("https://User@WWW.Ex.COM:8443/p?q=1").toDF("u")
      .select(UrlOps.hostOf(col("u"))).head().getString(0)
    assert(got == "www.ex.com")
  }

  test("registeredDomain: two-label default, two-level ccTLD suffixes, " +
    "single labels") {
    assert(regDom("www.example.com") == "example.com")
    assert(regDom("a.b.c.example.org") == "example.org")
    assert(regDom("files.acme.co.uk") == "acme.co.uk")
    assert(regDom("acme.co.uk") == "acme.co.uk")
    // 'co' before a LONG tld is an ordinary label, not a suffix
    assert(regDom("x.co.com") == "co.com")
    assert(regDom("LOCALHOST") == "localhost")
    assert(regDom("ex.com") == "ex.com")
  }

  test("registeredDomain rule-set overload: PSL semantics over the " +
    "shipped snapshot — multi-label suffixes, wildcards, exceptions") {
    val psl = UrlOps.PslSuffixes
    def rd(h: String): String = Seq(h).toDF("h")
      .select(UrlOps.registeredDomain(col("h"), psl)).head().getString(0)
    // suffixes the 7-label heuristic cannot know
    assert(rd("blog.example.or.jp") == "example.or.jp")
    assert(rd("x.y.ne.jp") == "y.ne.jp")
    assert(rd("shop.example.com.br") == "example.com.br")
    // private-domain entries: every user site is its own registrable host
    assert(rd("alice.github.io") == "alice.github.io")
    assert(rd("my-app.herokuapp.com") == "my-app.herokuapp.com")
    // longest rule wins: s3.amazonaws.com over amazonaws.com
    assert(rd("bucket.s3.amazonaws.com") == "bucket.s3.amazonaws.com")
    // heuristic-covered cases agree
    assert(rd("files.acme.co.uk") == "acme.co.uk")
    assert(rd("WWW.Example.COM") == "example.com")
    assert(rd("localhost") == "localhost")
    // wildcard `*.ck`: every <label>.ck is a public suffix
    assert(rd("foo.bar.ck") == "foo.bar.ck")
    // exception `!www.ck` beats the wildcard
    assert(rd("a.www.ck") == "www.ck")
    // a custom minimal rule list works the same way
    val custom = Seq("or.jp")
    val got = Seq("a.b.or.jp").toDF("h")
      .select(UrlOps.registeredDomain(col("h"), custom)).head().getString(0)
    assert(got == "b.or.jp")
  }

  test("registeredDomain snapshot coverage: real crawl tails — ccTLD " +
    "schemes beyond the excerpt, designated-city wildcards with their " +
    "city exceptions, private-section hosts (VERDICT r9 item 4)") {
    val psl = UrlOps.PslSuffixes
    def rd(h: String): String = Seq(h).toDF("h")
      .select(UrlOps.registeredDomain(col("h"), psl)).head().getString(0)
    // the verdict's named cases against the snapshot
    assert(rd("alice.github.io") == "alice.github.io")
    assert(rd("files.acme.co.uk") == "acme.co.uk")
    assert(rd("shop.example.com.br") == "example.com.br")
    assert(rd("x.y.ne.jp") == "y.ne.jp")
    // ccTLD schemes the old excerpt lacked
    assert(rd("www.impots.gouv.fr") == "impots.gouv.fr")
    assert(rd("portal.gem.gob.mx") == "gem.gob.mx")
    assert(rd("www.city.edmonton.ab.ca") == "edmonton.ab.ca")
    assert(rd("lib.example.edu.rs") == "example.edu.rs")
    assert(rd("x.example.pp.ru") == "example.pp.ru")
    // Japan designated-city wildcard: every ward label is a suffix...
    assert(rd("a.b.nakahara.kawasaki.jp") == "b.nakahara.kawasaki.jp")
    // ...but the city's own site is the documented exception
    assert(rd("www.city.kawasaki.jp") == "city.kawasaki.jp")
    // prefecture second-levels
    assert(rd("www.pref.aichi.jp") == "pref.aichi.jp")
    // private-section tails
    assert(rd("store.myshopify.com") == "store.myshopify.com")
    assert(rd("docs.readthedocs.io") == "docs.readthedocs.io")
    assert(rd("demo.hf.space") == "demo.hf.space")
    // round-11 expansion tails (VERDICT r10 item 4): regions the
    // curated set previously heuristic-fell-back on
    assert(rd("news.example.co.ke") == "example.co.ke")
    assert(rd("www.bank.com.pe") == "bank.com.pe")
    assert(rd("portal.minsa.gob.pe") == "minsa.gob.pe")
    assert(rd("shop.vendor.com.sa") == "vendor.com.sa")
    assert(rd("x.uni.ac.tz") == "uni.ac.tz")
    assert(rd("a.site.com.lk") == "site.com.lk")
    assert(rd("b.firm.com.kz") == "firm.com.kz")
    assert(rd("blog.author.blogspot.de") == "author.blogspot.de")
    assert(rd("api.lb-123.eu-west-1.elb.amazonaws.com") ==
      "lb-123.eu-west-1.elb.amazonaws.com")
    assert(rd("svc.my-app.run.app") == "my-app.run.app")
    // round-12 expansion tails (VERDICT r11 item 5): US locality
    // scheme, cn provinces, it regions, ua oblasts, pl cities, new
    // gTLDs, blogspot variants, PaaS hosts
    assert(rd("www.school.k12.ca.us") == "school.k12.ca.us")
    assert(rd("branch.library.lib.tx.us") == "library.lib.tx.us")
    assert(rd("host.company.bj.cn") == "company.bj.cn")
    assert(rd("www.comune.abruzzo.it") == "comune.abruzzo.it")
    assert(rd("x.firm.kiev.ua") == "firm.kiev.ua")
    assert(rd("shop.sklep.krakow.pl") == "sklep.krakow.pl")
    assert(rd("cdn.assets.netlify.app") == "assets.netlify.app")
    assert(rd("x.my-site.pages.dev") == "my-site.pages.dev")
    assert(rd("a.b.agency") == "b.agency")
    assert(rd("news.blogspot.ru") == "news.blogspot.ru")
    assert(rd("www.shop.tokyo") == "shop.tokyo")
    // round-13 expansion tails (VERDICT r12 item 6): kr regions, se
    // single letters, hu thematic, tr/th/il/in schemes, no counties,
    // au state schemes, baltic/greek/portuguese second levels
    assert(rd("www.portal.seoul.kr") == "portal.seoul.kr")
    assert(rd("x.firm.co.in") == "firm.co.in")
    assert(rd("a.site.a.se") == "site.a.se")
    assert(rd("www.hotel.budapest.hotel.hu") == "budapest.hotel.hu")
    assert(rd("x.shirket.com.tr") == "shirket.com.tr")
    assert(rd("www.dept.k12.il") == "dept.k12.il")
    assert(rd("x.skole.oslo.no") == "skole.oslo.no")
    assert(rd("www.school.vic.edu.au") == "school.vic.edu.au")
    assert(rd("x.agency.gov.lv") == "agency.gov.lv")
    assert(rd("a.co.com.ee") == "co.com.ee")
    assert(rd("x.uni.edu.gr") == "uni.edu.gr")
    assert(rd("www.empresa.com.pt") == "empresa.com.pt")
    assert(rd("x.banque.com.dz") == "banque.com.dz")
    assert(rd("a.b.ac.th") == "b.ac.th")
    // round-14 expansion tails (VERDICT r13 item 6): middle-east,
    // central/south asia, africa, pacific, balkans schemes
    assert(rd("www.wizara.gov.iq") == "wizara.gov.iq")
    assert(rd("x.daneshgah.ac.ir") == "daneshgah.ac.ir")
    assert(rd("a.firm.com.ps") == "firm.com.ps")
    assert(rd("x.resort.com.mv") == "resort.com.mv")
    assert(rd("www.okuu.edu.kg") == "okuu.edu.kg")
    assert(rd("a.hotel.com.fj") == "hotel.com.fj")
    assert(rd("x.shop.co.gg") == "shop.co.gg")
    assert(rd("www.firma.com.mk") == "firma.com.mk")
    assert(rd("x.shkolla.edu.al") == "shkolla.edu.al")
    assert(rd("a.kompanija.co.me") == "kompanija.co.me")
    assert(rd("www.empresa.co.mz") == "empresa.co.mz")
    assert(rd("x.ecole.gouv.sn") == "ecole.gouv.sn")
    assert(rd("a.duka.co.rw") == "duka.co.rw")
    assert(rd("www.sharika.com.ly") == "sharika.com.ly")
    assert(rd("x.sebaka.co.ls") == "sebaka.co.ls")
    // round-15 expansion tails (VERDICT r14 item 7): .no municipality
    // second levels (the PSL's famous long tail), the gs.<county>
    // primary-school scheme, remaining delegated gTLDs
    assert(rd("www.barnehage.voss.no") == "barnehage.voss.no")
    assert(rd("x.kultur.tromso.no") == "kultur.tromso.no")
    assert(rd("a.etat.ringerike.no") == "etat.ringerike.no")
    assert(rd("x.skole.gs.oslo.no") == "skole.gs.oslo.no")
    assert(rd("a.b.gs.mr.no") == "b.gs.mr.no")
    assert(rd("www.fond.fund") == "fond.fund")
    assert(rd("x.cabinet.associates") == "cabinet.associates")
    // round-16 expansion tails: private-section tunnel/PaaS hosts the
    // crawl actually sees (each its own registrable domain)
    assert(rd("x.happy-tunnel.trycloudflare.com") ==
      "happy-tunnel.trycloudflare.com")
    assert(rd("a.pub-1234.r2.dev") == "pub-1234.r2.dev")
    assert(rd("x.demo.shinyapps.io") == "demo.shinyapps.io")
    assert(rd("db.project.supabase.co") == "project.supabase.co")
    assert(rd("a.tunnel.ngrok-free.app") == "tunnel.ngrok-free.app")
    assert(rd("x.myapp.up.railway.app") == "myapp.up.railway.app")
    assert(rd("a.sandbox.csb.app") == "sandbox.csb.app")
    assert(rd("x.site.cprapid.com") == "site.cprapid.com")
    // round-17 expansion tails: the dynamic-DNS rental families (every
    // label a different tenant — the per-domain-cap blind spot the
    // private section exists for)
    assert(rd("cam.frontdoor.hopto.org") == "frontdoor.hopto.org")
    assert(rd("x.nas.ddns.net") == "nas.ddns.net")
    assert(rd("a.media.dyndns-home.com") == "media.dyndns-home.com")
    assert(rd("x.git.homelinux.org") == "git.homelinux.org")
    assert(rd("b.files.selfip.net") == "files.selfip.net")
    assert(rd("x.demo.000webhostapp.com") == "demo.000webhostapp.com")
    // round-17 expansion tails: the .jp geographic municipality
    // scheme (third-level suffixes — the registrable domain sits at
    // the FOURTH label, where the prefecture-only snapshot put it one
    // too shallow)
    assert(rd("www.lib.chiyoda.tokyo.jp") == "lib.chiyoda.tokyo.jp")
    assert(rd("a.b.kamakura.kanagawa.jp") == "b.kamakura.kanagawa.jp")
    assert(rd("x.onsen.hakone.kanagawa.jp") ==
      "onsen.hakone.kanagawa.jp")
    assert(rd("x.y.karuizawa.nagano.jp") == "y.karuizawa.nagano.jp")
    assert(rd("ryokan.yufu.oita.jp") == "ryokan.yufu.oita.jp")
    // rule count reflects the expansion
    assert(psl.size > 3400, s"snapshot shrank: ${psl.size}")
    // the excerpt fixture still loads independently
    assert(UrlOps.PslExcerptSuffixes.nonEmpty &&
      UrlOps.PslExcerptSuffixes.size < psl.size)
  }

  test("robotsMeta + canonicalUrl + sitemapUrls: quote styles and " +
    "attribute orders tolerated, absent signals are 0/NULL/empty") {
    import graft.text.TextOps
    val pages = Seq(
      (1L, "<head><meta name='robots' content='NOINDEX, nofollow'>" +
        "<link rel='canonical' href='https://a.com/x'></head>"),
      (2L, "<head><meta content=\"nofollow\" name=\"robots\">" +
        "<link href=\"https://b.com/y\" rel=\"canonical\"></head>"),
      (3L, "<head><meta name=\"robots\" content=\"index, follow\">" +
        "</head>"),
      (4L, "<head></head>")).toDF("doc_id", "h")
    val got = pages.select(col("doc_id"),
        TextOps.robotsMeta(col("h")).as("rm"),
        TextOps.canonicalUrl(col("h")).as("c"))
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getStruct(1).getInt(0),
        r.getStruct(1).getInt(1),
        if (r.isNullAt(2)) null else r.getString(2))).toSeq
    assert(got == Seq(
      (1L, 1, 1, "https://a.com/x"), // single quotes, uppercase directive
      (2L, 0, 1, "https://b.com/y"), // reversed attribute orders
      (3L, 0, 0, null), // explicit index,follow is not a block
      (4L, 0, 0, null)), s"got $got")
    // sitemapindex files share the <loc> shape; whitespace trimmed
    val sm = "<sitemapindex><sitemap><loc>\n  https://a.com/s1.xml\n" +
      "</loc></sitemap><sitemap><loc>https://a.com/s2.xml</loc>" +
      "</sitemap></sitemapindex>"
    val urls = Seq(sm).toDF("x")
      .select(UrlOps.sitemapUrls(col("x"))).head().getSeq[String](0).toSeq
    assert(urls == Seq("https://a.com/s1.xml", "https://a.com/s2.xml"))
    assert(Seq(null.asInstanceOf[String]).toDF("x")
      .select(UrlOps.sitemapUrls(col("x"))).head()
      .getSeq[String](0).isEmpty)
  }

  test("canonicalDedup: declared canonicals collapse keep-first, the " +
    "fallback is the page's own URL, normalization unifies variants") {
    val docs = Seq(
      (1L, "https://m.site.com/a",
        "<link rel=\"canonical\" href=\"https://site.com/a\">"),
      // same canonical declared with tracking noise — normalizeUrl
      // collapses it onto doc 1's group
      (2L, "https://www.site.com/a?utm_source=x",
        "<link rel=\"canonical\" " +
          "href=\"HTTPS://Site.com/a?utm_source=feed#top\">"),
      (3L, "https://site.com/b", "<p>no canonical</p>"),
      (4L, "https://site.com/b", "<p>none either</p>"))
      .toDF("doc_id", "url", "html")
    val got = UrlOps.canonicalDedup(docs).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getAs[String]("canonical"),
        r.getAs[Int]("keep"))).toSeq
    assert(got == Seq(
      (1L, "https://site.com/a", 1),
      (2L, "https://site.com/a", 0),
      (3L, "https://site.com/b", 1),
      (4L, "https://site.com/b", 0)), s"got $got")
  }

  test("canonicalDedup: RELATIVE canonical targets resolve against the " +
    "page URL — '/' on two different hosts must NOT collapse; " +
    "protocol-relative takes the page scheme; path-relative falls " +
    "back to the page URL") {
    val docs = Seq(
      // root-relative "/" — the RFC 6596 form the r10 advice flagged:
      // without resolution both would key on the bare "/" and
      // mass-collapse across unrelated sites
      (1L, "https://alpha.com/deep/page", "<link rel=\"canonical\" href=\"/\">"),
      (2L, "https://beta.org/other", "<link rel=\"canonical\" href=\"/\">"),
      // root-relative path resolves to the page's own origin and
      // collapses with an absolute declaration of the same target
      (3L, "https://alpha.com/p?utm_source=x",
        "<link rel=\"canonical\" href=\"/canon\">"),
      (4L, "https://alpha.com/q",
        "<link rel=\"canonical\" href=\"https://alpha.com/canon\">"),
      // protocol-relative: page scheme prepended
      (5L, "https://gamma.net/x",
        "<link rel=\"canonical\" href=\"//gamma.net/canon\">"),
      // other relative forms (no authority, not root-anchored):
      // conservative fallback to the page's own URL — no collapse
      (6L, "https://delta.io/a/b", "<link rel=\"canonical\" href=\"page.html\">"),
      (7L, "https://delta.io/a/c", "<link rel=\"canonical\" href=\"../up\">"))
      .toDF("doc_id", "url", "html")
    val got = UrlOps.canonicalDedup(docs).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getAs[String]("canonical"),
        r.getAs[Int]("keep"))).toSeq
    assert(got == Seq(
      (1L, "https://alpha.com", 1),
      (2L, "https://beta.org", 1),
      (3L, "https://alpha.com/canon", 1),
      (4L, "https://alpha.com/canon", 0),
      (5L, "https://gamma.net/canon", 1),
      (6L, "https://delta.io/a/b", 1),
      (7L, "https://delta.io/a/c", 1)), s"got $got")
  }

  test("dropBlockedDomains: registrable-domain match, broadcast anti-join") {
    val df = Seq(
      (1L, "https://www.Spam.com/a"),
      (2L, "https://cdn.spam.com/b"), // subdomain of the blocked owner
      (3L, "https://spam.co.uk/c"), // different registrable domain
      (4L, "https://ham.com/d"))
      .toDF("id", "url")
    val kept = UrlOps.dropBlockedDomains(df, "url", Seq("spam.com"))
    assert(kept.select("id").collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(3L, 4L))
    val plan = kept.queryExecution.sparkPlan.toString
    assert(plan.contains("BroadcastHashJoin") &&
      plan.contains("LeftAnti"), s"blocklist should broadcast:\n$plan")
  }

  test("robotsDisallows: all Disallow lines, case-insensitive, " +
    "allow-all markers and Allow lines excluded, null-safe") {
    val robots = "User-agent: *\nDisallow: /private\nAllow: /public\n" +
      "DISALLOW: /tmp/\nDisallow:\nUser-agent: bot\ndisallow: /b"
    val got = Seq(Some(robots), None).toDF("t")
      .select(UrlOps.robotsDisallows(col("t")).as("d")).collect()
      .map(_.getSeq[String](0).toSeq).toSeq
    assert(got == Seq(Seq("/private", "/tmp/", "/b"), Seq()))
  }

  test("dropDisallowed: host equality + path prefix, query string not " +
    "part of the path, broadcast anti-join") {
    val urls = Seq(
      (1L, "https://a.com/private/x"), // rule host+prefix -> dropped
      (2L, "https://a.com/pub"), // host matches, prefix doesn't
      (3L, "https://b.com/private/x"), // no rule for b.com
      (4L, "https://a.com/?p=/private"), // query, not path
      (5L, "https://a.com/b"), // second rule exact-prefix
      (6L, "https://a.com")) // bare host: empty path
      .toDF("id", "url")
    val rules = Seq(("a.com", "/private"), ("a.com", "/b"))
      .toDF("host", "prefix")
    val kept = UrlOps.dropDisallowed(urls, rules)
    assert(kept.select("id").collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(2L, 3L, 4L, 6L))
    val plan = kept.queryExecution.sparkPlan.toString
    assert(plan.contains("BroadcastHashJoin") &&
      plan.contains("LeftAnti"), s"rules should broadcast:\n$plan")
  }

  test("robotsAgentRules: RFC 9309 groups — adjacent UA lines share a " +
    "group, exact agent beats *, pre-group rules ignored, empty value " +
    "and comments dropped, wildcard/$ compiled") {
    val aBody = """# top comment
                  |Disallow: /ignored-before-group/
                  |
                  |User-agent: GraftBot
                  |User-agent: otherbot
                  |disallow: /private/
                  |Allow: /private/public*
                  |Disallow: /cal*$
                  |Allow:
                  |
                  |User-agent: *
                  |Disallow: /""".stripMargin
    val robots = Seq(("a.com", aBody),
      ("b.com", "User-agent: *\nDisallow: /"))
      .toDF("host", "body")
    val rules = UrlOps.robotsAgentRules(robots, "graftbot").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2),
        r.getString(4))).toSet
    // a.com: only the graftbot group (exact beats *); the pre-group
    // disallow and the empty Allow: contribute nothing
    assert(rules == Set(
      ("a.com", 0, "/private/", "^/private/"),
      ("a.com", 1, "/private/public*", "^/private/public.*"),
      ("a.com", 0, "/cal*$", "^/cal.*$"),
      ("b.com", 0, "/", "^/")))
  }

  test("robotsDecisions: longest raw pattern wins, Allow wins the tie, " +
    "no-match and unknown host default to allowed, bare host is /") {
    val robots = Seq(
      ("a.com", "User-agent: graftbot\nDisallow: /private/\n" +
        "Allow: /private/ok*\nDisallow: /cal*$\n\n" +
        "User-agent: *\nDisallow: /"),
      ("t.com", "User-agent: *\nDisallow: /a\nAllow: /a/x\n" +
        "Disallow: /a/y\nDisallow: /dup\nAllow: /dup"))
      .toDF("host", "body")
    val rules = UrlOps.robotsAgentRules(robots, "graftbot")
    val urls = Seq(
      (1L, "https://a.com/private/x"), // 0 via /private/
      (2L, "https://a.com/private/ok1"), // 1: longer Allow wins
      (3L, "https://a.com/cal2026"), // 0 via anchored wildcard
      (4L, "https://a.com/public"), // 1: no match in graftbot group
      (5L, "https://a.com"), // 1: bare host -> "/", no match
      (6L, "https://c.com/x"), // 1: host absent from robots
      (7L, "https://t.com/dup"), // 1: length tie, Allow wins
      (8L, "https://t.com/a/xyz"), // 1: Allow /a/x (4) > Disallow /a (2)
      (9L, "https://t.com/a/y1")) // 0: Disallow /a/y (4) > /a (2)
      .toDF("doc_id", "url")
    val got = UrlOps.robotsDecisions(urls, rules).orderBy("doc_id")
      .collect()
      .map(r => (r.getLong(0), r.getInt(2), Option(r.getString(3))))
      .toSeq
    assert(got == Seq(
      (1L, 0, Some("/private/")), (2L, 1, Some("/private/ok*")),
      (3L, 0, Some("/cal*$")), (4L, 1, None), (5L, 1, None),
      (6L, 1, None), (7L, 1, Some("/dup")), (8L, 1, Some("/a/x")),
      (9L, 0, Some("/a/y"))))
  }

  test("robotsDecisions: query strings participate in matching " +
    "(de-facto REP — session-id style rules), fragments do not, " +
    "query-only URLs match as /?q") {
    val robots = Seq(
      ("q.com", "User-agent: *\nDisallow: /*?sessionid=\n" +
        "Disallow: /?landing"))
      .toDF("host", "body")
    val rules = UrlOps.robotsAgentRules(robots, "graftbot")
    val urls = Seq(
      (1L, "https://q.com/page?sessionid=abc"), // 0: wildcard-query rule
      (2L, "https://q.com/page?other=1"),       // 1: query doesn't match
      (3L, "https://q.com/page"),               // 1: no query at all
      (4L, "https://q.com/x?sessionid=1#frag"), // 0: fragment excluded
      (5L, "https://q.com?landing"))            // 0: query-only -> /?landing
      .toDF("doc_id", "url")
    val got = UrlOps.robotsDecisions(urls, rules).orderBy("doc_id")
      .collect()
      .map(r => (r.getLong(0), r.getInt(2), Option(r.getString(3))))
      .toSeq
    assert(got == Seq(
      (1L, 0, Some("/*?sessionid=")), (2L, 1, None), (3L, 1, None),
      (4L, 0, Some("/*?sessionid=")), (5L, 0, Some("/?landing"))))
  }

  // ---- Sitemaps ----------------------------------------------------------

  test("sitemapEntries: urlset and sitemapindex blocks, optional " +
    "lastmod comes back empty, multiline XML (the (?s) flag), " +
    "loc-less blocks dropped, null/empty xml yields no rows") {
    import graft.io.Sitemap
    val urlset = """<?xml version="1.0"?>
      |<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
      |  <url>
      |    <loc>https://a.example.com/1</loc>
      |    <lastmod>2026-02-03</lastmod>
      |  </url>
      |  <url><loc>https://a.example.com/2</loc></url>
      |  <url><priority>0.5</priority></url>
      |</urlset>""".stripMargin
    val index = "<sitemapindex><sitemap><loc>https://a.example.com/s1" +
      ".xml</loc></sitemap></sitemapindex>"
    val rows = Seq((1L, urlset), (2L, index), (3L, ""),
      (4L, null.asInstanceOf[String])).toDF("id", "xml")
    val got = Sitemap.sitemapEntries(rows, "xml")
      .orderBy("id", "entry_no")
      .select("id", "entry_no", "url", "lastmod", "kind")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2),
        r.getString(3), r.getString(4))).toSeq
    assert(got == Seq(
      (1L, 1, "https://a.example.com/1", "2026-02-03", "urlset"),
      (1L, 2, "https://a.example.com/2", "", "urlset"),
      (2L, 1, "https://a.example.com/s1.xml", "", "index")),
      s"got $got")
  }

  test("xmlUnescape kernel: five predefined entities, decimal and hex " +
    "numeric references, SINGLE-PASS rule on double escapes, lenient " +
    "on malformed input, fast-path identity without '&', null in -> " +
    "null out") {
    import graft.functions.UrlExpressions.xmlUnescape
    def u(s: String): String =
      Seq(s).toDF("t").select(xmlUnescape(col("t")).as("u"))
        .head().getString(0)
    assert(u("a=1&amp;b=2") == "a=1&b=2")
    assert(u("&lt;x&gt; &quot;q&quot; &apos;r&apos;") ==
      "<x> \"q\" 'r'")
    assert(u("&#47;&#x2F;&#X2f;") == "///") // dec, hex, capital X
    assert(u("&#8364;") == "€") // multi-byte code point
    assert(u("&#x1F600;") == new String(Character.toChars(0x1F600)))
    // single-pass: &amp;lt; is the literal text &lt;, never <
    assert(u("&amp;lt;") == "&lt;")
    assert(u("lit&amp;amp;eral") == "lit&amp;eral")
    // lenient: bare &, unknown/unterminated/empty/overlong entities,
    // out-of-range and zero code points all pass through verbatim
    assert(u("a & b") == "a & b")
    assert(u("&unknown; &#; &#xZZ; &#1114112; &#0; &#x0;") ==
      "&unknown; &#; &#xZZ; &#1114112; &#0; &#x0;")
    assert(u("trailing &amp") == "trailing &amp")
    assert(u("&waytoolongname;") == "&waytoolongname;")
    assert(u("") == "")
    assert(u("no entities at all") == "no entities at all")
    val n = Seq[String](null).toDF("t")
      .select(xmlUnescape(col("t")).as("u")).head()
    assert(n.isNullAt(0))
  }

  test("sitemapsFromRobots: case-insensitive directive, leading " +
    "whitespace, multiple declarations in file order, none -> empty") {
    import graft.io.Sitemap
    val robots = """User-agent: *
      |Disallow: /private
      |Sitemap: https://x.example.com/sitemap.xml
      |  SITEMAP:   https://x.example.com/news.xml
      |# Sitemap: https://x.example.com/commented.xml""".stripMargin
    val got = Seq(robots, "User-agent: *", null.asInstanceOf[String])
      .toDF("t")
      .select(Sitemap.sitemapsFromRobots(col("t")).as("s"))
      .collect().map(_.getSeq[String](0)).toSeq
    assert(got.head == Seq("https://x.example.com/sitemap.xml",
      "https://x.example.com/news.xml"), s"got ${got.head}")
    assert(got(1) == Seq.empty && got(2) == Seq.empty)
  }

  // ---- Keyword blocklists (Aho-Corasick) ---------------------------------

  test("AhoCorasick: the classic overlap case (ushers -> he, she, " +
    "hers in pattern order), substring-inside-word, case folding via " +
    "the URL wrapper, empty/null, build validation, gate") {
    import graft.functions.AhoCorasick
    val bc = spark.sparkContext.broadcast(
      AhoCorasick.build(Seq("he", "she", "his", "hers")))
    val got = Seq("ushers", "this", "x", "", "HE")
      .toDF("t")
      .select(AhoCorasick.matches(col("t"), bc).as("m"))
      .collect().map(_.getSeq[String](0)).toSeq
    assert(got(0) == Seq("he", "she", "hers"), s"got ${got(0)}")
    assert(got(1) == Seq("his"))
    assert(got(2) == Seq.empty && got(3) == Seq.empty)
    assert(got(4) == Seq.empty) // automaton itself is case-sensitive
    val n = Seq[String](null).toDF("t")
      .select(AhoCorasick.matches(col("t"), bc).as("m")).head()
    assert(n.isNullAt(0))
    // the URL wrapper folds case and matches substrings inside words
    val bcU = UrlOps.keywordAutomatonBroadcast(spark,
      Seq("CASINO", "bet"))
    val um = Seq("https://x.example.com/ALPHABET-Casino/page")
      .toDF("url")
      .select(UrlOps.urlKeywordMatches(col("url"), bcU).as("m"))
      .head().getSeq[String](0)
    assert(um == Seq("casino", "bet"), s"got $um")
    // parity with the naive K-contains form on a mixed fixture
    val kws = Seq("alpha", "bet", "gamma", "eta")
    val bcP = UrlOps.keywordAutomatonBroadcast(spark, kws)
    val fixture = Seq("zeta-meta", "alphabet", "none here", "gamma eta")
    val ac = fixture.toDF("url")
      .select(UrlOps.urlKeywordMatches(col("url"), bcP).as("m"))
      .collect().map(_.getSeq[String](0).toSeq).toSeq
    val naive = fixture.map(u => kws.filter(u.contains))
    assert(ac == naive, s"ac $ac vs naive $naive")
    // gate drops flagged rows
    val gated = UrlOps.urlKeywordGate(
      fixture.toDF("url"), bcP).collect().map(_.getString(0)).toSeq
    assert(gated == Seq("none here"), s"got $gated")
    intercept[IllegalArgumentException] {
      AhoCorasick.build(Seq("a", "a"))
    }
    intercept[IllegalArgumentException] {
      AhoCorasick.build(Seq("a", ""))
    }
  }

  test("robotsCrawlDelays: agent-group scoping (exact beats *), " +
    "first declaration wins, fractional values, malformed dropped, " +
    "comments stripped, pre-group delays ignored") {
    val body = """Crawl-delay: 99
      |User-agent: other
      |Crawl-delay: 7
      |
      |User-agent: graftbot
      |Crawl-delay: 0.5   # half a second
      |Crawl-delay: 9
      |
      |User-agent: *
      |Crawl-delay: 3
      |Disallow: /x""".stripMargin
    val robots = Seq(
      ("a.com", body),
      ("b.com", "User-agent: *\nCrawl-delay: 2\n"),
      ("c.com", "User-agent: *\nCrawl-delay: soon\n"),
      ("d.com", "User-agent: *\nDisallow: /\n"))
      .toDF("host", "body")
    val bot = UrlOps.robotsCrawlDelays(robots, agent = "graftbot")
      .orderBy("host").collect()
      .map(r => (r.getString(0), r.getDouble(1))).toSeq
    // a.com: the graftbot group's FIRST delay (0.5 — not 9, not the
    // pre-group 99, not other's 7, not *'s 3); b.com falls to *;
    // c.com's value is malformed; d.com declares none
    assert(bot == Seq(("a.com", 0.5), ("b.com", 2.0)), s"got $bot")
    val any = UrlOps.robotsCrawlDelays(robots)
      .orderBy("host").collect()
      .map(r => (r.getString(0), r.getDouble(1))).toSeq
    assert(any == Seq(("a.com", 3.0), ("b.com", 2.0)), s"got $any")
  }
}
