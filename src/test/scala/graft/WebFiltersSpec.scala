package graft

import graft.operators.WebFilters
import org.apache.spark.sql.functions._

class WebFiltersSpec extends SparkTestBase {
  import spark.implicits._

  private val page =
    """<html><head><title> My  &amp; Your <b>Page</b> </title>
      |<style>body { color: red; }</style>
      |<script type="text/javascript">if (1 < 2) { alert("x"); }</script>
      |</head><body>
      |<nav><a href="/">Home</a> <a href="/x">Other page here</a></nav>
      |<!-- boilerplate comment with enough words to be a block -->
      |<p>This is the first real paragraph of the page, long enough to keep.</p>
      |<div>Second paragraph mentions <a href="/ref">a reference</a> briefly but stays mostly prose text.</div>
      |<p>Fish &amp; Chips &lt;deluxe&gt; &quot;edition&quot; &#39;quoted&#39;&nbsp;here for entity checks.</p>
      |<ul><li>tiny</li><li>also tiny</li></ul>
      |<footer><a href="/terms">Terms of service page</a> <a href="/priv">Privacy policy page</a> (c)</footer>
      |</body></html>""".stripMargin

  test("htmlMainContent: head/script/style/comments die wholesale; nav and " +
    "footer die on link density; short blocks die on min chars; entities " +
    "decode; prose survives in order") {
    val got = Seq((1L, page)).toDF("doc_id", "html")
      .select(WebFilters.htmlMainContent(col("html")).as("t"))
      .as[String].head()
    val lines = got.split("\n").toSeq
    assert(lines == Seq(
      "This is the first real paragraph of the page, long enough to keep.",
      "Second paragraph mentions a reference briefly but stays mostly prose text.",
      "Fish & Chips <deluxe> \"edition\" 'quoted' here for entity checks."),
      lines)
  }

  test("htmlExtract: counts, title, digest of the kept content") {
    val row = WebFilters.htmlExtract(Seq((1L, page)).toDF("doc_id", "html"))
      .collect().head
    assert(row.getAs[String]("title") == "My & Your Page")
    // nav, comment-free boilerplate... non-empty blocks: nav, p1, div,
    // p2, tiny, also tiny, footer = 7
    assert(row.getAs[Long]("n_blocks") == 7L, row)
    assert(row.getAs[Long]("kept_blocks") == 3L, row)
    val expected = Seq(
      "This is the first real paragraph of the page, long enough to keep.",
      "Second paragraph mentions a reference briefly but stays mostly prose text.",
      "Fish & Chips <deluxe> \"edition\" 'quoted' here for entity checks.")
      .mkString("\n")
    assert(row.getAs[Long]("kept_chars") == expected.length.toLong)
    assert(row.getAs[String]("content_digest") ==
      org.apache.commons.codec.digest.DigestUtils.md5Hex(expected))
  }

  test("blockKeep boundary: link density exactly 1/2 keeps, just over drops") {
    // txt = 30 chars, anchor text 15 chars -> 2*15 <= 30 keeps
    val keepHtml = "<p>" + "x" * 15 + "<a href='/'>" + "y" * 15 + "</a></p>"
    // txt = 29 chars, anchor text 15 -> 30 > 29 drops
    val dropHtml = "<p>" + "x" * 14 + "<a href='/'>" + "y" * 15 + "</a></p>"
    val got = Seq((1L, keepHtml), (2L, dropHtml)).toDF("doc_id", "html")
    val kept = WebFilters.htmlExtract(got).orderBy("doc_id")
      .select("kept_blocks").as[Long].collect().toSeq
    assert(kept == Seq(1L, 0L), kept)
  }

  test("htmlExtract is map-only: no exchange anywhere in the plan") {
    Tables.register(spark, sfDir)
    val plan = WebFilters.htmlExtract(
      WebFilters.htmlFixture(spark.table("documents"), limit = 10))
      .queryExecution.executedPlan.toString
    // the fixture's orderBy+limit plans as TakeOrderedAndProject (no
    // shuffle exchange); extraction itself adds only projections
    assert(!plan.contains("Exchange"), plan)
  }

  test("htmlLinks: absolute hrefs pass, root-relative resolve against the " +
    "page's canonical host, path-relative merge per RFC 3986 §5.3, " +
    "scheme-without-authority drops") {
    val html = """<a href="https://other.org/x">abs</a>
                 |<a class="nav" href="/rel/path">rootrel</a>
                 |<a href="//mirror.org/m">protorel</a>
                 |<a data-href="/beacon" href="/real">shadow</a>
                 |<a href="/first" href="/dup-second">dup</a>
                 |<a href="sub/page">pathrel</a>
                 |<a href="#frag">frag</a>
                 |<a href="javascript:void(0)">js</a>""".stripMargin
    val got = WebFilters.htmlLinks(
        Seq((1L, html, "HTTP://WWW.Base.ORG:80/deep/page")).toDF(
          "doc_id", "html", "base_url"))
      .orderBy("url").select("url").as[String].collect().toSeq
    // javascript: has a scheme but no authority — NULL and drop;
    // path-relative merges against the base directory (/deep/);
    // fragment-only resolves to the base document; //host takes the base
    // scheme; data-href must not shadow the real href; a duplicate href
    // attribute keeps the FIRST value (browser behavior)
    assert(got == Seq("http://base.org/deep/page",
      "http://base.org/deep/sub/page", "http://base.org/first",
      "http://base.org/real", "http://base.org/rel/path",
      "http://mirror.org/m", "https://other.org/x"), got)
  }

  test("htmlLinks RFC 3986 dot-segment matrix: ./ and ../ removal, " +
    "excess .. stops at root, trailing dot segment keeps its slash, " +
    "query-only and empty refs resolve to the base") {
    val cases = Seq(
      1L -> "a.html", 2L -> "./s/b.html", 3L -> "../up/c?z=1",
      4L -> "../../../root.html", 5L -> "?q=9", 6L -> "",
      7L -> "sub/..", 8L -> "mailto:x@y.example", 9L -> "/abs/../top")
    val df = cases.map { case (id, href) =>
      (id, s"""<a href="$href">t</a>""", "https://h.org/d/e/page")
    }.toDF("doc_id", "html", "base_url")
    val got = WebFilters.htmlLinks(df).orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got == Seq(
      1L -> "https://h.org/d/e/a.html",
      2L -> "https://h.org/d/e/s/b.html",
      3L -> "https://h.org/d/up/c?z=1",
      4L -> "https://h.org/root.html",
      5L -> "https://h.org/d/e/page?q=9",
      6L -> "https://h.org/d/e/page",
      7L -> "https://h.org/d/e/",      // trailing /.. pops AND keeps slash
      // 8 (mailto:) dropped
      9L -> "https://h.org/top"), got) // root-relative also dot-normalizes
  }

  test("urlCanonical: case, ports, www, fragments, tracking params, " +
    "param order, trailing slashes, unparseable input") {
    val cases = Seq(
      "HTTP://WWW.Example.COM:80/A/B/?utm_source=x&b=2&a=1#frag" ->
        "http://example.com/A/B?a=1&b=2",
      "https://site.org:443/p" -> "https://site.org/p",
      "https://site.org:8443/p" -> "https://site.org:8443/p",
      "http://site.org" -> "http://site.org/",
      "http://site.org///" -> "http://site.org/",
      "http://site.org/?gclid=1&fbclid=2&UTM_CAMPAIGN=3" -> "http://site.org/",
      "ftp://files.org/x" -> "ftp://files.org/x",
      "nonsense" -> null)
    val got = cases.zipWithIndex
      .map { case ((u, _), i) => (i.toLong, u) }.toDF("doc_id", "url")
      .select(col("doc_id"), WebFilters.urlCanonical(col("url")).as("c"))
      .orderBy("doc_id").select("c").collect().map(_.getString(0)).toSeq
    assert(got == cases.map(_._2), got)
  }

  test("warcParse: preamble skipped, missing headers degrade to ''/NULL, " +
    "payload trimmed of framing whitespace, ordinals per file") {
    val body = "junk preamble\n" +
      "WARC/1.0\nWARC-Type: response\nWARC-Target-URI: http://a/1\n" +
      "Content-Length: 5\n\nhello\n\n" +
      "WARC/1.0\nWARC-Type: request\n\npayload two\n\n" +
      // truncated record: headers but NO blank-line separator — all
      // headers must still parse and the payload must be EMPTY (the
      // header bytes are not payload); malformed Content-Length -> NULL
      "WARC/1.0\nWARC-Type: metadata\nContent-Length: N/A\n"
    val got = WebFilters.warcParse(Seq((7L, body)).toDF("file_id", "body"))
      .orderBy("rec_idx").collect()
    assert(got.length == 3)
    val r1 = got(0); val r2 = got(1); val r3 = got(2)
    assert(r3.getAs[String]("warc_type") == "metadata" &&
      r3.isNullAt(r3.fieldIndex("content_length")) &&
      r3.getAs[Long]("payload_len") == 0L, r3)
    assert(r1.getAs[Long]("rec_idx") == 1L &&
      r1.getAs[String]("warc_type") == "response" &&
      r1.getAs[String]("target_uri") == "http://a/1" &&
      r1.getAs[Long]("content_length") == 5L &&
      r1.getAs[Long]("payload_len") == 5L &&
      r1.getAs[String]("payload_digest") ==
        org.apache.commons.codec.digest.DigestUtils.md5Hex("hello"), r1)
    assert(r2.getAs[String]("target_uri") == "" &&
      r2.isNullAt(r2.fieldIndex("content_length")) &&
      r2.getAs[Long]("payload_len") == "payload two".length.toLong, r2)
  }

  test("robotsRules: RFC 9309 groups (consecutive user-agent lines share " +
    "rules), comments stripped, empty Disallow emits no rule, CRLF " +
    "bodies parse; robotsFilter longest-match with Allow precedence, " +
    "directory-URL blocking, duplicate rows preserved") {
    val robots = Seq(
      // CRLF line endings throughout — must parse like LF
      ("a.org", "User-agent: googlebot\r\nDisallow: /g/\r\n\r\n" +
        "User-agent: *\r\nDisallow: /x/ # comment\r\nDisallow:"),
      ("b.org", "User-agent: *\nDisallow: /\nAllow: /public/"),
      // consecutive UA lines: the * group shares the rule block even
      // though the nearest PRECEDING ua line is 'other'
      ("c.org", "User-agent: *\nUser-agent: other\nDisallow: /shared/"),
      // equal-length tie: Allow wins (least-restrictive, RFC 9309)
      ("d.org", "User-agent: *\nDisallow: /tie/\nAllow: /tie/")
    ).toDF("host", "body")
    val rules = WebFilters.robotsRules(robots).collect()
      .map(r => (r.getString(0), r.getString(1), r.getBoolean(2))).toSet
    assert(rules == Set(("a.org", "/x/", false), ("b.org", "/", false),
      ("b.org", "/public/", true), ("c.org", "/shared/", false),
      ("d.org", "/tie/", false), ("d.org", "/tie/", true)), rules)
    val urls = Seq(
      (1L, "http://a.org/x/page"),   // blocked by /x/
      (2L, "http://a.org/g/page"),   // googlebot group, not *
      (3L, "http://a.org/y"),        // no matching prefix
      (4L, "http://b.org/anything"), // blocked by /
      (5L, "http://c.org/x/page"),   // multi-UA group, /x/ not a c.org rule
      (6L, "http://a.org/x/"),       // the DIRECTORY URL itself: canonical
                                     // path /x but the /x/ rule must block
      (7L, "http://a.org/xylophone"),// /x/ must NOT block /xy...
      (7L, "http://a.org/xylophone"),// duplicate row must survive
      (8L, "http://b.org/public/doc"), // Allow: /public/ outranks Disallow: /
      (9L, "http://c.org/shared/x"), // rule shared across the UA pair
      (10L, "http://d.org/tie/x"),   // equal-length tie -> Allow wins
      (11L, "http://e.org/x/page")   // no robots at all
    ).toDF("doc_id", "url")
    val got = WebFilters.robotsFilter(urls, WebFilters.robotsRules(robots))
      .orderBy("doc_id").select("robots_blocked").as[Boolean].collect().toSeq
    assert(got == Seq(true, false, false, true, false, true, false, false,
      false, true, false, false), got)
  }

  test("robotsFilter RFC 9309 wildcards: * spans segments, trailing $ " +
    "anchors, specificity is raw pattern length, metachars in plain " +
    "rules stay literal") {
    val robots = Seq(
      ("w.org", "User-agent: *\nDisallow: /*.pdf$\nAllow: /pub/*.pdf$\n" +
        "Disallow: /exact$\nDisallow: /a*b"),
      // a WILDCARD directory rule must block the directory URL itself,
      // exactly like the plain-spelled directory rule does
      ("d.org", "User-agent: *\nDisallow: /*/private/"),
      // regex metachars in a PLAIN rule must match literally, not as regex
      ("m.org", "User-agent: *\nDisallow: /p(1)")).toDF("host", "body")
    val urls = Seq(
      (1L, "http://w.org/docs/x.pdf"),   // *.pdf$ blocks
      (2L, "http://w.org/docs/x.pdfs"),  // $ anchor: no match
      (3L, "http://w.org/pub/y.pdf"),    // Allow /pub/*.pdf$ (len 11) beats
                                         // Disallow /*.pdf$ (len 7)
      (4L, "http://w.org/exact"),        // $ after literal path
      (5L, "http://w.org/exact/sub"),    // anchored rule must NOT match
      (6L, "http://w.org/aXYb"),         // /a*b mid-pattern wildcard
      (7L, "http://w.org/aXYc"),         // ...but not a different tail
      (8L, "http://m.org/p(1)"),         // literal parens block
      (9L, "http://m.org/pX"),           // would match if ( ) leaked as regex
      (10L, "http://d.org/a/private/"),  // wildcard DIR rule blocks the dir
                                         // URL (canonical path /a/private)
      (11L, "http://d.org/a/private/x"), // ...and everything under it
      (12L, "http://d.org/a/privateer")  // ...but not a sibling prefix
    ).toDF("doc_id", "url")
    val got = WebFilters.robotsFilter(urls, WebFilters.robotsRules(robots))
      .orderBy("doc_id").select("robots_blocked").as[Boolean].collect().toSeq
    assert(got == Seq(true, false, false, true, false, true, false,
      true, false, true, true, false), got)
  }

  test("robotsSitemaps: non-group directive binds file-wide, " +
    "case-insensitive key, comments strip, empty values and duplicates " +
    "drop") {
    val robots = Seq(
      ("a.org", "User-agent: googlebot\nSitemap: https://a.org/s1.xml\n" +
        "User-agent: *\nSITEMAP:https://a.org/s2.xml # note\n" +
        "Sitemap: https://a.org/s1.xml\nSitemap:\nDisallow: /x")).toDF(
      "host", "body")
    val got = WebFilters.robotsSitemaps(robots).orderBy("sitemap_url")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(got == Seq(("a.org", "https://a.org/s1.xml"),
      ("a.org", "https://a.org/s2.xml")), got)
  }

  test("robotsCrawlDelay: wildcard-group values only, max across groups, " +
    "malformed values skipped") {
    val robots = Seq(
      ("a.org", "User-agent: bot\nCrawl-delay: 9\n\n" +
        "User-agent: x\nUser-agent: *\nCrawl-delay: 0.5\n\n" +
        "User-agent: *\nCrawl-delay: 2"),
      ("b.org", "User-agent: *\nCrawl-delay: fast"),
      ("c.org", "User-agent: other\nCrawl-delay: 3")).toDF("host", "body")
    val got = WebFilters.robotsCrawlDelay(robots).orderBy("host")
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    // a.org: the bot group's 9 is invisible to *; max(0.5, 2) = 2.0.
    // b.org malformed and c.org non-wildcard emit nothing.
    assert(got == Seq(("a.org", 2.0)), got)
  }

  test("urlFilter verdicts + urlDedup keep-first groups") {
    val pages = Seq(
      (1L, "http://www.example.com/a?utm_source=x"),
      (2L, "http://example.com:80/a"),          // same canonical as 1
      (3L, "https://ads.example.com/banner"),    // blocked domain
      (4L, "http://sub.doubleclick.net/pix"),    // blocked subdomain
      (5L, "http://ok.org/logo.PNG"),            // blocked extension
      (6L, "ftp://ok.org/file"),                 // scheme
      (7L, "garbage")).toDF("doc_id", "url")
    val f = WebFilters.urlFilter(pages).orderBy("doc_id")
      .select("doc_id", "keep", "blocked_domain", "blocked_ext", "scheme_ok")
      .collect().map(r => (r.getLong(0), r.getBoolean(1), r.getBoolean(2),
        r.getBoolean(3), r.getBoolean(4))).toSeq
    assert(f == Seq(
      (1L, true, false, false, true), (2L, true, false, false, true),
      (3L, false, true, false, true), (4L, false, true, false, true),
      (5L, false, false, true, true), (6L, false, false, false, false),
      (7L, false, false, false, false)), f)
    val d = WebFilters.urlDedup(pages).orderBy("canonical_url")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(d.contains(("http://example.com/a", 1L, 2L)), d)
    // unparseable URL contributes no group
    assert(d.map(_._3).sum == 6L, d)
    // an EMPTY blocklist disables the domain rule instead of crashing
    val none = WebFilters.urlFilter(pages, blockedHosts = Seq.empty)
      .where(col("blocked_domain")).count()
    assert(none == 0L)
  }

  test("htmlAnchors: hrefs resolve like htmlLinks, anchor text strips " +
    "inline tags + decodes entities, data-href can't shadow, hrefless " +
    "and unresolvable anchors drop") {
    val html = """<a href="https://other.org/x">plain <b>bold</b> text</a>
                 |<a data-href="/beacon" href="/real">Fish &amp; Chips</a>
                 |<a href="//mirror.org/m">  spaced   out  </a>
                 |<a name="top">no href at all</a>
                 |<a href="/unquoted" data-u=http://x.org/>still open</a>
                 |<a href="/bareattr" download/><a href="/after">after bare</a>
                 |<a href="/selfclosed"/><a href="#frag">fragment only</a>""".stripMargin
    val got = WebFilters.htmlAnchors(
        Seq((1L, html, "HTTP://Base.ORG/deep")).toDF(
          "doc_id", "html", "base_url"))
      .orderBy("url").select("url", "text").as[(String, String)]
      .collect().toSeq
    // the SELF-CLOSING anchor must neither emit an element nor swallow
    // the next anchor's element (its href still shows up in htmlLinks —
    // the documented contract difference between the two extractors);
    // an UNQUOTED attribute value ending in '/' is still an OPEN tag,
    // while '/' after a BARE attribute (download/>) is the self-closing
    // marker — the following anchor keeps its own element either way
    assert(got == Seq(
      ("http://base.org/after", "after bare"),
      ("http://base.org/deep", "fragment only"), // RFC 3986: #frag = base doc
      ("http://base.org/real", "Fish & Chips"),
      ("http://base.org/unquoted", "still open"),
      ("http://mirror.org/m", "spaced out"),
      ("https://other.org/x", "plain bold text")), got)
    val links = WebFilters.htmlLinks(
        Seq((1L, html, "HTTP://Base.ORG/deep")).toDF(
          "doc_id", "html", "base_url"))
      .select("url").as[String].collect().toSet
    assert(links.contains("http://base.org/selfclosed"), links)
  }

  test("anchorText: dominant text by count, ties to the lexicographically " +
    "smallest; empty texts count as inlinks but don't vote; an all-empty " +
    "target reports NULL top; canonical variants collapse") {
    val anchors = Seq(
      (1L, "b", "http://t.org/p?utm_source=x", "beta"),
      (2L, "b", "http://www.t.org/p", "beta"),
      (3L, "b", "http://t.org:80/p", "alpha"),
      (4L, "b", "http://t.org/p", "alpha"),   // 2-2 tie -> alpha wins
      (5L, "b", "http://t.org/p", ""),        // counts, doesn't vote
      (6L, "b", "http://t.org/q", "gamma"),
      (7L, "b", "http://t.org/icon", "")      // only empty texts -> NULL top
    ).toDF("doc_id", "base_url", "url", "text")
    val got = WebFilters.anchorText(anchors).orderBy("canonical_url")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        Option(r.getString(3)), if (r.isNullAt(4)) -1L else r.getLong(4)))
      .toSeq
    assert(got == Seq(
      ("http://t.org/icon", 1L, 0L, None, -1L),
      ("http://t.org/p", 5L, 2L, Some("alpha"), 2L),
      ("http://t.org/q", 1L, 1L, Some("gamma"), 1L)), got)
  }

  test("hostGraph: self-loops excluded, per-host-pair link counts; " +
    "pageRank on a hand-computed two-node graph") {
    val links = Seq(
      (1L, "https://a.org/1", "https://b.org/x"),
      (1L, "https://a.org/1", "https://b.org/y"),
      (2L, "https://a.org/2", "https://a.org/self"), // self-loop: excluded
      (3L, "https://b.org/1", "https://a.org/z")
    ).toDF("doc_id", "base_url", "url")
    val edges = WebFilters.hostGraph(links).orderBy("src", "dst")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    assert(edges == Seq(("a.org", "b.org", 2L), ("b.org", "a.org", 1L)), edges)
    // one-directional a->b: after iter1 b = 0.075 + 0.85*0.5 = 0.5,
    // a = 0.075; after iter2 b = 0.075 + 0.85*0.075 = 0.13875
    val oneWay = Seq(("a", "b", 1L)).toDF("src", "dst", "w")
    val pr = graft.operators.Graphs.pageRank(oneWay, iters = 2)
      .orderBy("node").collect()
      .map(r => (r.getString(0), r.getDouble(1))).toSeq
    assert(pr == Seq(("a", 0.075), ("b", 0.13875)), pr)
  }

  test("pageRank: symmetric two-node flow stays at the uniform fixed " +
    "point (delegation wiring itself is covered by TracesSpec's " +
    "hand-computed serviceCentrality golden)") {
    val sym = Seq(("a", "b", 3L), ("b", "a", 3L)).toDF("src", "dst", "w")
    val pr = graft.operators.Graphs.pageRank(sym, iters = 3)
      .orderBy("node").collect().map(_.getDouble(1)).toSeq
    assert(pr == Seq(0.5, 0.5), pr)
  }

  test("pageRank plan: inflow is a plain partial-aggregated sum — no " +
    "collect_list / ObjectHashAggregate buffering a hub node's entire " +
    "in-edge list in one task (power-law web-host in-degree safety)") {
    val edges = Seq(("a", "b", 1L), ("b", "a", 2L), ("c", "a", 1L))
      .toDF("src", "dst", "w")
    val plan = graft.operators.Graphs.pageRank(edges, iters = 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("collect_list"), plan)
    assert(!plan.contains("ObjectHashAggregate"), plan)
    assert(plan.contains("partial_sum") || plan.contains("partial sum") ||
      plan.contains("HashAggregate"), plan)
  }

  test("crawlBudget: cap per host, most-linked first, canonical tiebreak; " +
    "rows beyond budget drop") {
    val frontier = Seq(
      ("http://big.org/a", 5L), ("http://big.org/b", 9L),
      ("http://big.org/c", 9L), ("http://big.org/d", 1L),
      ("http://small.org/only", 2L)
    ).toDF("canonical_url", "group_size")
    val got = WebFilters.crawlBudget(frontier, cap = 2)
      .orderBy("host", "rk")
      .select("host", "canonical_url", "rk")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    assert(got == Seq(
      ("big.org", "http://big.org/b", 1L),   // 9, tie broken by URL asc
      ("big.org", "http://big.org/c", 2L),
      ("small.org", "http://small.org/only", 1L)), got)
    intercept[IllegalArgumentException] {
      WebFilters.crawlBudget(frontier, cap = 0).collect()
    }
  }

  test("sitemapParse: entity-decoded locs, optional fields NULL when " +
    "absent, malformed priority NULL, loc-less entries skipped") {
    val body = """<?xml version="1.0"?><urlset>
      |<url><loc> https://a.org/full?x=1&amp;y=2 </loc><lastmod>2026-02-03</lastmod>
      |<changefreq>daily</changefreq><priority>0.8</priority></url>
      |<url><loc>https://a.org/min</loc></url>
      |<url><lastmod>2026-01-01</lastmod></url>
      |<url><loc>https://a.org/bad</loc><priority>N/A</priority></url>
      |<url><loc>https://a.org/bad2</loc><priority>1.2.3</priority></url>
      |</urlset>""".stripMargin
    val got = WebFilters.sitemapParse(Seq(("a.org", body)).toDF("host", "body"))
      .orderBy("loc").collect()
      .map(r => (r.getString(1), Option(r.getString(2)),
        Option(r.getString(3)),
        if (r.isNullAt(4)) None else Some(r.getDouble(4)))).toSeq
    assert(got == Seq(
      ("https://a.org/bad", None, None, None),
      // '1.2.3' passes a loose [0-9.]+ but is not a number: the tight
      // digits(.digits)? grammar NULLs it in BOTH engines instead of
      // hard-erroring the oracle's CAST
      ("https://a.org/bad2", None, None, None),
      ("https://a.org/full?x=1&y=2", Some("2026-02-03"), Some("daily"),
        Some(0.8)),
      ("https://a.org/min", None, None, None)), got)
  }

  test("sitemapIndex: child sitemaps with optional lastmod, loc-less " +
    "entries skipped, the enclosing <sitemapindex> tag never parses as " +
    "an entry; output composes with sitemapRecrawl") {
    val body = """<?xml version="1.0"?><sitemapindex>
      |<sitemap><loc> https://a.org/sm/1.xml?x=1&amp;y=2 </loc>
      |<lastmod>2026-02-03</lastmod></sitemap>
      |<sitemap><loc>https://a.org/sm/2.xml</loc></sitemap>
      |<sitemap><lastmod>2026-01-01</lastmod></sitemap>
      |</sitemapindex>""".stripMargin
    val children = WebFilters.sitemapIndex(
      Seq(("a.org", body)).toDF("host", "body"))
    val got = children.orderBy("loc").collect()
      .map(r => (r.getString(1), Option(r.getString(2)))).toSeq
    assert(got == Seq(
      ("https://a.org/sm/1.xml?x=1&y=2", Some("2026-02-03")),
      ("https://a.org/sm/2.xml", None)), got)
    // two-level discovery: the recrawl schedule runs over CHILD SITEMAPS
    val fetched = Seq(("https://a.org/sm/1.xml?y=2&x=1", "2026-01-20"))
      .toDF("url", "crawled_at")
    val due = WebFilters.sitemapRecrawl(children, fetched)
      .orderBy("loc").select("loc", "due").collect()
      .map(r => (r.getString(0), r.getBoolean(1))).toSeq
    assert(due == Seq(
      // fetched (param order canonicalizes) but index lastmod is newer
      ("https://a.org/sm/1.xml?x=1&y=2", true),
      ("https://a.org/sm/2.xml", true)), due) // never fetched
  }

  test("sitemapRecrawl: never-crawled and newer-lastmod entries are due; " +
    "older lastmod and lastmod-less crawled entries are not") {
    val entries = WebFilters.sitemapParse(Seq(("a.org",
      "<urlset>" +
        "<url><loc>https://a.org/new</loc><lastmod>2026-02-01</lastmod></url>" +
        "<url><loc>https://a.org/fresh</loc><lastmod>2026-02-01</lastmod></url>" +
        "<url><loc>https://a.org/stale</loc><lastmod>2026-01-01</lastmod></url>" +
        "<url><loc>https://a.org/nomod</loc></url>" +
        "</urlset>")).toDF("host", "body"))
    val crawled = Seq(
      (1L, "https://a.org/fresh", "2026-01-15"),
      (2L, "https://a.org/stale", "2026-01-15"),
      (3L, "https://a.org/nomod", "2026-01-15")
    ).toDF("doc_id", "url", "crawled_at")
    val got = WebFilters.sitemapRecrawl(entries, crawled)
      .orderBy("canonical_url")
      .select("canonical_url", "due").collect()
      .map(r => (r.getString(0), r.getBoolean(1))).toSeq
    assert(got == Seq(
      ("https://a.org/fresh", true),   // lastmod after crawl
      ("https://a.org/new", true),     // never crawled
      ("https://a.org/nomod", false),  // crawled, no lastmod claim
      ("https://a.org/stale", false)), got)
  }

  test("relCanonicalDedup: both attribute orders and entity decode " +
    "collapse variants; no declaration falls back to self; a garbage " +
    "declaration drops the page") {
    val pages = Seq(
      (1L, "https://self.org/a",
        "<head><link rel=\"canonical\" href=\"https://c.org/one\"/></head>"),
      (2L, "https://self.org/b",
        "<head><link href=\"https://c.org/one?utm_source=x&amp;gclid=1\" " +
          "rel=\"canonical\"/></head>"),
      (3L, "https://self.org/c", "<head></head>"),          // self
      (4L, "https://self.org/d",
        "<head><link rel=\"canonical\" href=\"not a url\"/></head>"), // drops
      // data-rel must NOT declare a canonical ('-' is a word boundary, so
      // \brel would match inside it) — this page falls back to self
      (5L, "https://self.org/e",
        "<head><link data-rel=\"canonical\" href=\"https://cdn.x/app.css\"/></head>")
    ).toDF("doc_id", "url", "html")
    val got = WebFilters.relCanonicalDedup(pages).orderBy("canonical_target")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq(
      ("https://c.org/one", 1L, 2L),
      ("https://self.org/c", 3L, 1L),
      ("https://self.org/e", 5L, 1L)), got)
  }

  test("hostQuality: canonical-host rollup of C4/Gopher keep rates — " +
    "hand-computed golden with url variants collapsing to one host") {
    val goodLine =
      "the quick brown fox jumps over the lazy dog again and again."
    val good = Seq.fill(5)(goodLine).mkString("\n") // 60 words, 5 kept lines
    val pages = Seq(
      (1L, "https://WWW.A.org:443/x", good),
      (2L, "http://a.org:80/y", "junk"),
      (3L, "http://b.org/z", "junk")
    ).toDF("doc_id", "url", "text")
    val got = WebFilters.hostQuality(pages).orderBy("host")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5))).toSeq
    assert(got == Seq(
      ("a.org", 2L, 61L, 0.5, 0.5, 0.5),
      ("b.org", 1L, 1L, 0.0, 0.0, 0.0)), got)
  }

  test("crawlDelta: new/gone/changed/unchanged; canonical variants " +
    "collapse keep-first BEFORE the compare") {
    val prev = Seq(
      (1L, "http://s.org/same", "alpha"),
      (2L, "http://s.org/edit", "old text"),
      (3L, "http://s.org/dead", "bye"),
      // duplicate canonical in ONE snapshot: keeper is min doc_id's digest
      (5L, "http://s.org/dup?utm_source=x", "from five"),
      (4L, "http://www.s.org/dup", "from four"),
      // NULL content digests as EMPTY content, never as absence
      (6L, "http://s.org/nulled", null.asInstanceOf[String])
    ).toDF("doc_id", "url", "text")
    val curr = Seq(
      (10L, "http://s.org/same", "alpha"),
      (11L, "http://s.org/edit", "new text"),
      (12L, "http://s.org/born", "hi"),
      (13L, "http://s.org/dup", "from four"), // matches prev's keeper (4)
      (16L, "http://s.org/nulled", "")        // "" == null's digest
    ).toDF("doc_id", "url", "text")
    val got = WebFilters.crawlDelta(prev, curr).orderBy("canonical_url")
      .select("canonical_url", "status")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(got == Seq(
      ("http://s.org/born", "new"),
      ("http://s.org/dead", "gone"),
      ("http://s.org/dup", "unchanged"),
      ("http://s.org/edit", "changed"),
      // a fetched page with NULL/empty content is a real fetch — not gone
      ("http://s.org/nulled", "unchanged"),
      ("http://s.org/same", "unchanged")), got)
  }

  test("warcHttp: status/mime/charset parse; 200+text/html keeps; " +
    "redirect without Content-Type, non-HTML mime, and a payload with " +
    "no status line all reject without erroring") {
    val recs = Seq(
      "HTTP/1.1 200 OK\nContent-Type: text/html; charset=UTF-8\n\n<html>ok</html>",
      "HTTP/1.1 200 OK\nContent-Type: TEXT/HTML\n\nbare",
      "HTTP/1.1 404 Not Found\nContent-Type: text/html; charset=\"latin-1\"\n\nmiss",
      "HTTP/1.1 301 Moved Permanently\nLocation: https://x.org/\n\n",
      "HTTP/1.1 200 OK\nContent-Type: image/png\n\nPNG",
      "no envelope at all")
      .zipWithIndex.map { case (p, i) =>
        s"WARC/1.0\nWARC-Type: response\nWARC-Target-URI: https://x.org/$i\n\n$p\n\n"
      }.mkString
    val got = WebFilters.warcHttp(Seq((1L, recs)).toDF("file_id", "body"))
      .orderBy("rec_idx")
      .select("http_status", "mime", "charset", "body_len", "keep")
      .collect().map(r => (Option(r.get(0)), r.getString(1), r.getString(2),
        r.getLong(3), r.getBoolean(4))).toSeq
    assert(got == Seq(
      (Some(200), "text/html", "utf-8", 15L, true),
      (Some(200), "text/html", "", 4L, true),
      (Some(404), "text/html", "latin-1", 4L, false),
      // the redirect's trailing blank line is WARC framing, so its HTTP
      // headers never terminate: no body, no media type
      (Some(301), "", "", 0L, false),
      (Some(200), "image/png", "", 3L, false),
      (None, "", "", 0L, false)), got)
  }

  test("warcHttp keepMimes: text/plain admits; empty list keeps nothing") {
    val body = "WARC/1.0\nWARC-Target-URI: https://x.org/\n\n" +
      "HTTP/1.1 200 OK\nContent-Type: text/plain\n\nhello\n\n"
    val df = Seq((1L, body)).toDF("file_id", "body")
    assert(WebFilters.warcHttp(df, keepMimes = Seq("text/plain", "text/html"))
      .select("keep").as[Boolean].head())
    assert(!WebFilters.warcHttp(df, keepMimes = Seq.empty)
      .select("keep").as[Boolean].head())
  }

  test("metaNoindex/metaNofollow: both attribute orders, case-insensitive " +
    "values, 'none' implies both, token anchoring, name decoys don't match") {
    val cases = Seq(
      (1L, "<meta name=\"robots\" content=\"noindex, nofollow\">", true, true),
      (2L, "<meta content=\"NOFOLLOW\" name=\"Robots\">", false, true),
      (3L, "<meta name=\"ROBOTS\" content=\"none\">", true, true),
      // token anchoring: noindexing is not noindex; name mismatch and
      // data-name are not the robots channel
      (4L, "<meta name=\"robots\" content=\"noindexing, follow\">" +
        "<meta name=\"description\" content=\"noindex\">" +
        "<meta data-name=\"robots\" content=\"noindex\">", false, false),
      // most-restrictive-wins across multiple robots tags
      (5L, "<meta name=\"robots\" content=\"index\">" +
        "<meta name=\"robots\" content=\" nofollow \">", false, true),
      (6L, "<p>no meta here</p>", false, false))
    val got = cases.map { case (id, h, _, _) => (id, h) }
      .toDF("doc_id", "html")
      .select(col("doc_id"), WebFilters.metaNoindex(col("html")).as("ni"),
        WebFilters.metaNofollow(col("html")).as("nf"))
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getBoolean(1), r.getBoolean(2)))
    assert(got.toSeq == cases.map { case (id, _, ni, nf) => (id, ni, nf) },
      got.mkString(", "))
  }

  test("docBase materialized onto the page frame re-anchors relative " +
    "links: absolute, root-relative, and path-relative base declarations " +
    "each work; mailto base and no base fall back to the document URL; " +
    "absolute links ignore the base") {
    def links(html: String) = WebFilters.htmlLinks(
      Seq((1L, html, "https://site.org/d/page")).toDF(
          "doc_id", "html", "base_url")
        .withColumn("base_url",
          WebFilters.docBase(col("html"), col("base_url"))))
      .orderBy("url").select("url").as[String].collect().toSeq
    val anchors = "<a href=\"p.html\">a</a><a href=\"/r\">b</a>" +
      "<a href=\"https://abs.org/z\">c</a>"
    assert(links(anchors) == Seq(
      "https://abs.org/z", "https://site.org/d/p.html", "https://site.org/r"))
    assert(links("<base href=\"https://cdn.net/assets/\">" + anchors) == Seq(
      "https://abs.org/z", "https://cdn.net/assets/p.html", "https://cdn.net/r"))
    assert(links("<base href=\"/b/\">" + anchors) == Seq(
      "https://abs.org/z", "https://site.org/b/p.html", "https://site.org/r"))
    // path-relative base resolves against the document URL first
    assert(links("<base href=\"sub/\">" + anchors) == Seq(
      "https://abs.org/z", "https://site.org/d/sub/p.html", "https://site.org/r"))
    assert(links("<base href=\"mailto:x\">" + anchors) == Seq(
      "https://abs.org/z", "https://site.org/d/p.html", "https://site.org/r"))
    // first base wins; data-href can't declare one
    assert(links("<base data-href=\"/decoy/\" href=\"/real/\">" +
      "<base href=\"/second/\"><a href=\"q.html\">q</a>") ==
      Seq("https://site.org/real/q.html"))
  }

  test("htmlCharset: charset attribute (quoted/unquoted/single-quoted), " +
    "http-equiv parameter form, attribute form wins, charset= inside an " +
    "unrelated attribute value or outside any meta tag never matches") {
    val cases = Seq(
      (1L, "<meta charset=\"UTF-8\">", "utf-8"),
      (2L, "<meta charset=iso-8859-1>", "iso-8859-1"),
      (3L, "<META CHARSET='koi8-r'>", "koi8-r"),
      (4L, "<meta http-equiv=\"Content-Type\" content=\"text/html; " +
        "charset=Windows-1252\">", "windows-1252"),
      (5L, "<meta charset=\"utf-8\"><meta http-equiv=\"Content-Type\" " +
        "content=\"text/html; charset=latin-1\">", "utf-8"),
      (6L, "<p>charset=fake outside a meta tag</p>", ""),
      // a charset= substring inside another attribute's VALUE is not a
      // declaration — before the fix this decoy won over the real one
      (7L, "<meta name=\"description\" content=\"set charset=shift_jis " +
        "in vim\"><meta charset=\"utf-8\">", "utf-8"),
      (8L, "<meta name=\"description\" content=\"set charset=shift_jis\">",
        ""),
      // content-first attribute order of the http-equiv form
      (9L, "<meta content=\"text/html; charset=EUC-KR\" " +
        "http-equiv=\"content-type\">", "euc-kr"))
    val got = cases.map { case (id, h, _) => (id, h) }.toDF("doc_id", "html")
      .select(col("doc_id"), WebFilters.htmlCharset(col("html")).as("c"))
      .orderBy("doc_id").select("c").as[String].collect().toSeq
    assert(got == cases.map(_._3), got)
  }

  test("hreflangLinks + translationClusters: any attribute order, " +
    "relative hrefs resolve, x-default keys the cluster with min-" +
    "canonical fallback, decoys and unresolvable hrefs drop") {
    val decl = "<link rel=\"alternate\" hreflang=\"en\" href=\"/en/a\">" +
      "<link hreflang=\"De\" href=\"https://site.org/de/a?utm_source=x\" rel=\"alternate\">" +
      "<link rel=\"alternate\" hreflang=\"x-default\" href=\"https://www.site.org/en/a\">" +
      "<link rel=\"stylesheet\" href=\"/c.css\">" +
      "<link rel=\"alternate\" href=\"/feed.xml\">" +
      "<link rel=\"alternate\" hreflang=\"zz\" href=\"mailto:x@y.org\">"
    val noDefault = "<link rel=\"alternate\" hreflang=\"fr\" href=\"https://other.org/fr\">" +
      "<link rel=\"alternate\" hreflang=\"es\" href=\"https://other.org/es\">"
    val pages = Seq(
      (1L, decl, "https://site.org/en/a"),
      (2L, decl, "https://site.org/de/a"),   // same set -> same cluster
      (3L, noDefault, "https://other.org/fr")
    ).toDF("doc_id", "html", "base_url")
    val links = WebFilters.hreflangLinks(pages)
      .where(col("doc_id") === 1).orderBy("lang")
      .collect().map(r => (r.getString(1), r.getString(2))).toSeq
    assert(links == Seq(
      ("de", "https://site.org/de/a?utm_source=x"),
      ("en", "https://site.org/en/a"),
      ("x-default", "https://www.site.org/en/a")), links)
    val clusters = WebFilters.translationClusters(pages)
      .orderBy("cluster_key", "lang")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
      .toSeq
    assert(clusters == Seq(
      // no x-default: min canonical alternate keys the cluster
      ("https://other.org/es", "es", "https://other.org/es"),
      ("https://other.org/es", "fr", "https://other.org/fr"),
      // x-default canonical (www stripped) keys pages 1+2's shared set
      ("https://site.org/en/a", "de", "https://site.org/de/a"),
      ("https://site.org/en/a", "en", "https://site.org/en/a"),
      ("https://site.org/en/a", "x-default", "https://site.org/en/a")),
      clusters)
  }

  test("paginationChains: canonical variants chain, cycles drop whole, a " +
    "chain missing its first page roots at the earliest survivor, " +
    "duplicate canonicals collapse keep-first, maxHops truncates") {
    def page(id: Long, url: String, next: Option[String]) =
      (id, url, next.map(n =>
        s"""<link rel="next" href="$n">""").getOrElse("<p>end</p>"))
    val pages = Seq(
      // 3-page chain; middle pointer needs canonicalization to chain
      page(1, "http://a.org/s/p0", Some("http://WWW.A.org/s/p1?utm_source=x")),
      page(2, "http://a.org/s/p1", Some("http://a.org/s/p2")),
      page(3, "http://a.org/s/p2", None),
      // 2-cycle: no root -> drops entirely
      page(10, "http://c.org/x", Some("http://c.org/y")),
      page(11, "http://c.org/y", Some("http://c.org/x")),
      // first page missing: p1 is untargeted -> roots the remainder
      page(20, "http://b.org/t/p1", Some("http://b.org/t/p2")),
      page(21, "http://b.org/t/p2", None),
      // duplicate canonical of page 2: higher id loses, its pointer too
      page(30, "http://www.a.org/s/p1", Some("http://a.org/elsewhere"))
    ).toDF("doc_id", "url", "html")
    val got = WebFilters.paginationChains(pages)
      .orderBy("chain_root", "hop")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSeq
    assert(got == Seq(
      ("http://a.org/s/p0", 0, 1L), ("http://a.org/s/p0", 1, 2L),
      ("http://a.org/s/p0", 2, 3L),
      ("http://b.org/t/p1", 0, 20L), ("http://b.org/t/p1", 1, 21L)), got)
    // maxHops truncation: the 3-page chain cut at one hop
    val cut = WebFilters.paginationChains(pages, maxHops = 1)
      .where(col("chain_root") === "http://a.org/s/p0")
      .orderBy("hop").collect().map(_.getInt(1)).toSeq
    assert(cut == Seq(0, 1), cut)
  }

  test("followLinks: rel=nofollow anchors drop (multi-token rel too), " +
    "data-rel decoy keeps, page-level meta nofollow drops every link") {
    val html =
      """<p><a href="https://a.org/keep">k</a>
        |<a rel="nofollow" href="https://a.org/paid">p</a>
        |<a href="/ugc" rel="noopener nofollow">u</a>
        |<a href="/fine" rel="noopener">f</a>
        |<a data-rel="nofollow" href="/decoy">d</a></p>""".stripMargin
    val pages = Seq(
      (1L, html, "https://h.example.org/d/1"),
      (2L, "<meta name=\"robots\" content=\"nofollow\">" + html,
        "https://h.example.org/d/2")
    ).toDF("doc_id", "html", "base_url")
    val got = WebFilters.followLinks(pages).orderBy("doc_id", "url")
      .select("doc_id", "url")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got == Seq(
      (1L, "https://a.org/keep"),
      (1L, "https://h.example.org/decoy"),
      (1L, "https://h.example.org/fine")), got)
  }

  test("meta robots accepts whitespace-separated directive lists " +
    "(content=\"noindex nofollow\") without loosening token anchoring") {
    val cases = Seq(
      (1L, "<meta name=\"robots\" content=\"noindex nofollow\">", true, true),
      (2L, "<meta name=\"robots\" content=\"noindex, nofollow\">", true, true),
      (3L, "<meta name=\"robots\" content=\"noindexing nofollowed\">",
        false, false),
      (4L, "<meta name=\"robots\" content=\"index follow\">", false, false),
      (5L, "<meta name=\"robots\" content=\"nofollow noindex\">", true, true),
      (6L, "<meta name=\"robots\" content=\"none\">", true, true))
    val df = cases.map(c => (c._1, c._2)).toDF("id", "html")
      .select(col("id"), WebFilters.metaNoindex(col("html")).as("ni"),
        WebFilters.metaNofollow(col("html")).as("nf"))
      .orderBy("id").collect()
    cases.zip(df).foreach { case ((id, h, ni, nf), row) =>
      assert(row.getBoolean(1) == ni && row.getBoolean(2) == nf, s"$id: $h")
    }
  }

  test("transcode matches the JDK decoders byte-for-byte: random bytes " +
    "under every supported label, validity-gated utf-8, latin-1 fallback") {
    import java.nio.charset.{Charset, StandardCharsets}
    val rnd = new scala.util.Random(17)
    val labels = Seq("utf-8", "iso-8859-1", "windows-1252", "")
    val rows = (0 until 240).map { i =>
      // mix pure-random bytes with valid-utf-8-by-construction strings
      // so BOTH verdict branches get real coverage
      val bytes =
        if (i % 3 == 0) s"ok .. café € $i".getBytes(StandardCharsets.UTF_8)
        else Array.fill(rnd.nextInt(40))(rnd.nextInt(256).toByte)
      (i.toLong, bytes, labels(i % labels.length))
    }
    val got = WebFilters.transcode(
        rows.toDF("id", "body_bytes", "charset"))
      .select("id", "charset_used", "decode_ok", "text")
      .orderBy("id").collect()
    def validUtf8(b: Array[Byte]): Boolean =
      try { StandardCharsets.UTF_8.newDecoder()
        .decode(java.nio.ByteBuffer.wrap(b)); true }
      catch { case _: java.nio.charset.CharacterCodingException => false }
    rows.zip(got).foreach { case ((id, bytes, label), row) =>
      val latin1 = new String(bytes, StandardCharsets.ISO_8859_1)
      val (wantUsed, wantOk, wantText) = label match {
        case "iso-8859-1" => ("iso-8859-1", true, latin1)
        case "windows-1252" =>
          // JDK is the reference for the 251 defined bytes; the five
          // undefined ones (81 8D 8F 90 9D) follow WHATWG (C1 controls
          // pass through) where the JDK would emit U+FFFD
          val undef = Set(0x81, 0x8d, 0x8f, 0x90, 0x9d)
          val text = bytes.map { b =>
            val u = b & 0xff
            if (undef(u)) u.toChar
            else new String(Array(b), Charset.forName("windows-1252")).charAt(0)
          }.mkString
          ("windows-1252", true, text)
        case _ => // utf-8 label or defaulted (random bytes carry no meta)
          if (validUtf8(bytes))
            ("utf-8", true, new String(bytes, StandardCharsets.UTF_8))
          else ("iso-8859-1", false, latin1)
      }
      assert(row.getString(1) == wantUsed && row.getBoolean(2) == wantOk &&
        row.getString(3) == wantText,
        s"id=$id label=$label hex=${bytes.map("%02x".format(_)).mkString}" +
          s" got=(${row.getString(1)},${row.getBoolean(2)})" +
          s" want=($wantUsed,$wantOk)")
    }
  }

  test("transcode survives realistic page sizes: 1 KB to 1 MB bodies, " +
    "valid and malformed, decode with correct verdicts (regression: the " +
    "hex-regex validity check StackOverflowed at ~1 KB in Java regex)") {
    import java.nio.charset.StandardCharsets
    val rnd = new scala.util.Random(91)
    val rows = Seq(1_000, 10_000, 100_000, 1_000_000).zipWithIndex.flatMap {
      case (n, i) =>
        val valid = ("café € " * (n / 10)).getBytes(StandardCharsets.UTF_8)
        val broken = valid.clone(); broken(valid.length / 2) = 0xE9.toByte
        Seq((i * 2L, valid, "utf-8"), (i * 2L + 1, broken, "utf-8"))
    }
    val got = WebFilters.transcode(
        rows.toDF("id", "body_bytes", "charset"))
      .select("id", "decode_ok").orderBy("id").collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    rows.foreach { case (id, _, _) =>
      assert(got(id) == (id % 2 == 0), s"id=$id")
    }
    // and the repair path (same validity check) on a large flagged page
    val big = ("donâ€™t cafÃ© " * 20000)
    val rep = WebFilters.mojibakeRepair(Seq((1L, big)).toDF("doc_id", "text"))
      .select("repaired").collect().head.getBoolean(0)
    assert(rep)
  }

  test("UTF-8 validity: native is_valid_utf8 == the oracle's hex regex " +
    "== the JDK decoder on random byte strings") {
    import java.nio.charset.StandardCharsets
    val rnd = new scala.util.Random(23)
    val cases = (0 until 300).map { i =>
      val bytes =
        if (i % 4 == 0) s"plain € $i café".getBytes(StandardCharsets.UTF_8)
        else Array.fill(rnd.nextInt(30))(rnd.nextInt(256).toByte)
      (i.toLong, bytes)
    }
    def jdk(b: Array[Byte]): Boolean =
      try { StandardCharsets.UTF_8.newDecoder()
        .decode(java.nio.ByteBuffer.wrap(b)); true }
      catch { case _: java.nio.charset.CharacterCodingException => false }
    val got = cases.toDF("id", "b")
      .select(col("id"), is_valid_utf8(col("b").cast("string")).as("nat"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val rx = java.util.regex.Pattern.compile(WebFilters.Utf8HexPat)
    cases.foreach { case (id, b) =>
      val hex = b.map("%02x".format(_)).mkString
      assert(got(id) == jdk(b), s"native vs JDK id=$id hex=$hex")
      assert(got(id) == rx.matcher(hex).matches(), s"native vs regex id=$id hex=$hex")
    }
  }

  test("transcode precedence: HTTP charset beats the meta declaration, " +
    "meta beats the default, unknown labels flag decode_ok=false") {
    import java.nio.charset.StandardCharsets
    def b(s: String) = s.getBytes(StandardCharsets.ISO_8859_1)
    val rows = Seq(
      // http latin-1 vs meta utf-8: E9 decodes as é only if http wins
      (1L, b("<meta charset=\"utf-8\">café"), "latin-1"),
      // no http: meta iso-8859-1 applies
      (2L, b("<meta charset=\"iso-8859-1\">café"), ""),
      // unknown label, valid-utf8 bytes: flagged, utf-8 used
      (3L, b("plain ascii"), "shift_jis"),
      // cp1252 C1 remap: 93/94 curly quotes, 80 euro, 81 passthrough
      (4L, Array(0x93, 0x68, 0x69, 0x94, 0x80, 0x81).map(_.toByte),
        "cp1252"))
    val got = WebFilters.transcode(rows.toDF("id", "body_bytes", "charset"))
      .select("id", "charset_used", "decode_ok", "text")
      .orderBy("id").collect()
    assert(got(0).getString(1) == "iso-8859-1" && got(0).getBoolean(2) &&
      got(0).getString(3).endsWith("café"), got(0).toString)
    assert(got(1).getString(1) == "iso-8859-1" && got(1).getBoolean(2) &&
      got(1).getString(3).endsWith("café"), got(1).toString)
    assert(got(2).getString(1) == "utf-8" && !got(2).getBoolean(2),
      got(2).toString)
    assert(got(3).getString(1) == "windows-1252" && got(3).getBoolean(2) &&
      got(3).getString(3) == "“hi”€\u0081", got(3).toString)
  }

  test("mojibakeScore: counts artifact pairs, two-hit verdict, clean " +
    "text never flags") {
    import spark.implicits._
    val rows = Seq(
      (1L, "donâ€™t say â€œcafÃ©"),       // 3 artifacts -> mojibake
      (2L, "one cafÃ© only"),              // 1 artifact  -> below threshold
      (3L, "plain ascii text"),            // clean
      (4L, "real café and naïve words"))   // real accents, NOT artifacts
      .toDF("doc_id", "text")
    val got = WebFilters.mojibakeScore(rows).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_artifacts"), r.getAs[Boolean]("mojibake")))).toMap
    assert(got(1L) == ((3L, true)))
    assert(got(2L) == ((1L, false)))
    assert(got(3L) == ((0L, false)))
    assert(got(4L) == ((0L, false)))
  }

  test("mojibakeRepair: cp1252 roundtrip restores the true characters, " +
    "clean and non-latin-1 text pass through untouched") {
    import spark.implicits._
    val rows = Seq(
      // both artifact families: punctuation (via C1 remap) + accents
      (1L, "donâ€™t â€” cafÃ© naÃ¯ve Â» fin"),
      // flagged but mixed with CJK: lossless guard must refuse
      (2L, "cafÃ© cafÃ© 中文 mixed"),
      // clean text below threshold: untouched even though repairable
      (3L, "real café stays"))
      .toDF("doc_id", "text")
    val got = WebFilters.mojibakeRepair(rows).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Boolean]("repaired"), r.getAs[String]("text_repaired"))))
      .toMap
    assert(got(1L) == ((true, "don’t — café naïve » fin")))
    assert(got(2L) == ((false, "cafÃ© cafÃ© 中文 mixed")))
    assert(got(3L) == ((false, "real café stays")))
  }
}
