package graft.queries

import graft.QSpec
import graft.QSpec._
import graft.operators.{CorpusFilters, WebFilters}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Web-pipeline front half as oracle-checked queries: HTML main-content
  * extraction, the extract→filter composition, URL-level filtering, and
  * canonical-URL dedup. The HTML/URL fixtures are deterministic string
  * constructions over the `documents` table, built identically in Spark
  * and in the DuckDB oracle, so the oracle replays extraction on byte-
  * identical inputs. */
object WebQueries {

  /** Shared DuckDB CTE chain: the synthetic HTML corpus (mirrors
    * WebFilters.htmlFixture — 12-word lines from the shared lowercase
    * token contract, wrapped by line-length mod 3, boilerplate around).
    * Ends at fx(doc_id, html). */
  private val duckHtmlFixtureCore =
    """wx AS (SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '\s+'),
      |    x -> len(x) > 0) AS w
      |  FROM (SELECT * FROM documents ORDER BY doc_id LIMIT 150) d),
      |lx AS (SELECT doc_id, list_transform(
      |    generate_series(1, CAST(ceil(len(w) / 12.0) AS INT)),
      |    i -> array_to_string(list_slice(w, (i-1)*12+1, i*12), ' ')) AS lines
      |  FROM wx WHERE len(w) > 0),
      |hsrc AS (SELECT doc_id,
      |  '<html><head><title>Doc ' || doc_id || ' &amp; friends</title><style>p { margin: 0; }</style><script>var a = 1 && 2; if (a < 3) { a = 4; }</script></head>' ||
      |  '<body><nav><a href="/">Home</a> <a href="/cats">Cats</a> <a href="/dogs">Dogs</a></nav><!-- rendered by demo -->' ||
      |  '<div id="main"><p>Fish &amp; Chips &lt;deluxe edition&gt; from the corner shop</p><p>We work with the best of the best, and that is that.</p>' ||
      |  array_to_string(list_transform(lines, l -> CASE len(l) % 3
      |       WHEN 0 THEN '<p>' || l || '.</p>'
      |       WHEN 1 THEN '<div class="entry">' || l || ' <a href="/read/more">more &amp; info</a></div>'
      |       ELSE '<li>' || l || '</li>' END), '') ||
      |  '</div><footer><a href="/terms">Terms of service</a> <a href="/privacy">Privacy policy</a> <a href="/contact">Contact the team</a> (c) demo</footer></body></html>' AS html
      | FROM lx)""".stripMargin

  /** The fixture under its classic name `fx` — every existing consumer
    * (duckHtmlExtract etc.) reads fx; [[duckHtmlFixtureCore]] exists so a
    * query can build fx DIFFERENTLY (e.g. ta_warc_e2e, whose fx is the
    * HTML parsed back OUT of WARC+HTTP envelopes wrapping hsrc). */
  private val duckHtmlFixture =
    duckHtmlFixtureCore + ",\nfx AS (SELECT doc_id, html FROM hsrc)"

  /** Shared DuckDB extraction chain over fx (mirrors WebFilters.htmlExtract
    * block by block): drop head/script/style/comments, split at block tags,
    * strip inline tags + decode entities + ws-normalize per block, compute
    * anchor-text chars, apply the keep rule. Ends at
    * kx(doc_id, pos, txt, lc, keep) and ag(doc_id, n_blocks, kept_blocks,
    * body). */
  private val duckHtmlExtract =
    """ex0 AS (SELECT doc_id, html,
      |  regexp_replace(regexp_replace(regexp_replace(regexp_replace(html,
      |    '(?is)<head\b[^>]*>.*?</head>', ' ', 'g'),
      |    '(?is)<script\b[^>]*>.*?</script>', ' ', 'g'),
      |    '(?is)<style\b[^>]*>.*?</style>', ' ', 'g'),
      |    '(?s)<!--.*?-->', ' ', 'g') AS c FROM fx),
      |bx AS (SELECT doc_id, unnest(blocks) AS b, generate_subscripts(blocks, 1) AS pos
      |  FROM (SELECT doc_id, regexp_split_to_array(c,
      |    '(?i)</?(?:p|div|li|ul|ol|h[1-6]|tr|td|th|table|thead|tbody|section|article|header|footer|nav|aside|blockquote|pre|br|hr)\b[^>]*>') AS blocks
      |    FROM ex0) z),
      |tx AS (SELECT doc_id, pos,
      |  trim(regexp_replace(
      |    replace(replace(replace(replace(replace(replace(
      |      regexp_replace(b, '<[^>]*>', '', 'g'),
      |      '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&#39;', chr(39)),
      |      '&nbsp;', ' '), '&amp;', '&'),
      |    '\s+', ' ', 'g')) AS txt,
      |  coalesce(list_sum(list_transform(
      |    regexp_extract_all(b, '(?is)<a\b[^>]*>(.*?)</a>', 1),
      |    x -> len(regexp_replace(x, '<[^>]*>', '', 'g')))), 0) AS lc
      |  FROM bx),
      |kx AS (SELECT doc_id, pos, txt, lc,
      |  (len(txt) >= 15 AND 2 * lc <= len(txt)) AS keep
      |  FROM tx WHERE len(txt) > 0),
      |ag AS (SELECT doc_id,
      |  CAST(count(*) AS BIGINT) AS n_blocks,
      |  CAST(count(*) FILTER (WHERE keep) AS BIGINT) AS kept_blocks,
      |  coalesce(string_agg(txt, chr(10) ORDER BY pos) FILTER (WHERE keep), '') AS body
      |  FROM kx GROUP BY doc_id)""".stripMargin

  /** Shared DuckDB URL fixture (mirrors the Spark construction in
    * [[urlFixture]]): six URL shapes per doc_id mod 6 — canonicalization
    * collisions, a blocked domain, a blocked extension, a non-http scheme,
    * and an unparseable value. Ends at ux(doc_id, url). */
  private val duckUrlFixture =
    """ux AS (SELECT doc_id, CASE doc_id % 6
      |  WHEN 0 THEN 'HTTP://WWW.Example.COM:80/a/' || (doc_id // 12) || '/?utm_source=feed&page=2#top'
      |  WHEN 1 THEN 'http://example.com/a/' || (doc_id // 12) || '?page=2&utm_medium=rss'
      |  WHEN 2 THEN 'https://ads.example.com/banner/' || doc_id
      |  WHEN 3 THEN 'http://static.example.org/img/photo' || doc_id || '.JPG'
      |  WHEN 4 THEN 'ftp://files.example.org/pub/' || doc_id
      |  ELSE 'not a url ' || doc_id END AS url
      |  FROM (SELECT doc_id FROM documents ORDER BY doc_id LIMIT 200) d)""".stripMargin

  /** Shared DuckDB canonicalization chain over ux (mirrors
    * WebFilters.urlCanonical/urlHost), parameterized on the columns
    * carried through (so the anchor-text chain can keep its text): ends
    * at cx($carry, url, scheme, host, path, canonical_url). The base
    * string marks carried columns with the __CARRY__ token (ADVICE r15:
    * replacing the literal 'doc_id' would silently rewrite any future
    * doc_id used in a GROUP BY / join predicate / function argument),
    * so only the select-list carries can ever be parameterized. */
  private def duckCanonicalChain(carry: String): String =
    duckUrlCanonicalBase.replace("__CARRY__", carry)

  private val duckUrlCanonical = duckUrlCanonicalBase.replace(
    "__CARRY__", "doc_id")

  private lazy val duckUrlCanonicalBase =
    """nf AS (SELECT __CARRY__, url, regexp_replace(url, '#.*', '') AS u FROM ux),
      |pc AS (SELECT __CARRY__, url, u,
      |  lower(coalesce(regexp_extract(u, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1), '')) AS scheme,
      |  lower(coalesce(regexp_extract(u, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1), '')) AS hostport,
      |  regexp_replace(u, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*', '') AS rest
      |  FROM nf),
      |hx AS (SELECT __CARRY__, url, scheme, rest,
      |  regexp_replace(CASE WHEN scheme = 'http' THEN regexp_replace(hostport, ':80$', '')
      |    WHEN scheme = 'https' THEN regexp_replace(hostport, ':443$', '')
      |    ELSE hostport END, '^www\.', '') AS host
      |  FROM pc),
      |px AS (SELECT __CARRY__, url, scheme, host,
      |  coalesce(regexp_extract(rest, '^([^?]*)', 1), '') AS path0,
      |  coalesce(regexp_extract(rest, '\?(.*)', 1), '') AS qs
      |  FROM hx),
      |qx AS (SELECT __CARRY__, url, scheme, host,
      |  CASE WHEN regexp_replace(path0, '/+$', '') = '' THEN '/'
      |    ELSE regexp_replace(path0, '/+$', '') END AS path,
      |  list_sort(list_filter(string_split(qs, '&'), p -> p <> ''
      |    AND NOT regexp_matches(p, '^(?i)(utm_[a-z0-9]+|gclid|fbclid)='))) AS params
      |  FROM px),
      |cx AS (SELECT __CARRY__, url, scheme, host, path,
      |  CASE WHEN scheme = '' OR host = '' THEN NULL
      |    ELSE scheme || '://' || host || path ||
      |      (CASE WHEN len(params) > 0 THEN '?' || array_to_string(params, '&') ELSE '' END)
      |  END AS canonical_url
      |  FROM qx)""".stripMargin


  /** Appends the relative-href exercise paragraph to fx's html (mirrors
    * the Spark-side concat in ta_html_links / ta_crawl_frontier): plain
    * path-relative, `./`, `../`, excess-`../` beyond root, trailing
    * `..`, query-only, fragment-only, empty, and two scheme-without-
    * authority refs. Ends at fr(doc_id, html). */
  private val duckRelLinksFixture =
    """fr AS (SELECT doc_id, html ||
      |  '<p><a href="a' || (doc_id % 9) ||
      |  '.html">r1</a> <a href="./sub/b.html">r2</a>' ||
      |  ' <a href="../up/c?z=1">r3</a>' ||
      |  ' <a href="../../../root.html">r4</a> <a href="?q=' ||
      |  (doc_id % 4) || '">r5</a> <a href="#frag">r6</a>' ||
      |  ' <a href="">r7</a> <a href="javascript:void(0)">r8</a>' ||
      |  ' <a href="mailto:x@y.example">r9</a> <a href="sub/..">r10</a></p>'
      |  AS html FROM fx)""".stripMargin

  /** Spark twin of [[duckRelLinksFixture]]'s html suffix — appended to
    * the html fixture by ta_html_links / ta_crawl_frontier so the RFC
    * 3986 relative-resolution matrix is oracle-exercised without
    * touching the shared fixture every other html query replays. */
  private def relLinksHtml(docId: Column): Column = concat(
    lit("<p><a href=\"a"), (docId % 9).cast("string"),
    lit(".html\">r1</a> <a href=\"./sub/b.html\">r2</a>" +
      " <a href=\"../up/c?z=1\">r3</a>" +
      " <a href=\"../../../root.html\">r4</a> <a href=\"?q="),
    (docId % 4).cast("string"),
    lit("\">r5</a> <a href=\"#frag\">r6</a>" +
      " <a href=\"\">r7</a> <a href=\"javascript:void(0)\">r8</a>" +
      " <a href=\"mailto:x@y.example\">r9</a> <a href=\"sub/..\">r10</a></p>"))

  /** Shared DuckDB CTE chain: href extraction (lazy, delimiter-anchored —
    * first href of a duplicate-attribute tag, data-href can't shadow) +
    * full RFC 3986 §5 resolution over fr against the fixture base
    * `https://docs.example.org/d/{doc_id}` (mirrors
    * WebFilters.resolveHref: §5.3 merge against the base directory
    * `/d/`, §5.2.4 dot-segment removal via the same string-accumulator
    * list_reduce stack, trailing-dot-segment slash fixup, ref fragment
    * dropped, scheme-without-authority → NULL; the fixture base has no
    * query, so the empty-ref and query-only rows share one branch).
    * Ends at ux(doc_id, url). */
  private val duckHtmlLinks =
    """lk AS (SELECT doc_id,
      |  unnest(regexp_extract_all(html,
      |    '(?is)<a\b[^>]*?[\s"'']href\s*=\s*"([^"]*)"', 1)) AS href
      |  FROM fr),
      |lh AS (SELECT doc_id, href,
      |  regexp_replace(href, '#.*', '') AS hnf FROM lk),
      |lp AS (SELECT doc_id, href, hnf,
      |  coalesce(regexp_extract(hnf, '^([^?]*)', 1), '') AS hp,
      |  coalesce(regexp_extract(hnf, '(\?.*)', 1), '') AS hq
      |  FROM lh),
      |lm AS (SELECT doc_id, href, hnf, hp, hq,
      |  CASE WHEN href LIKE '/%' THEN hp
      |       WHEN hp = '' THEN '/d/' || doc_id
      |       ELSE '/d/' || hp END AS mp
      |  FROM lp),
      |lr AS (SELECT doc_id, href, hnf, hq, mp,
      |  list_reduce(string_split(mp, '/'), (acc, x) ->
      |    CASE WHEN x = '.' THEN acc
      |         WHEN x = '..' THEN regexp_replace(acc, '/[^/]*$', '')
      |         ELSE acc || '/' || x END) AS rp0
      |  FROM lm),
      |lf AS (SELECT doc_id, href, hnf, hq,
      |  CASE WHEN (CASE WHEN rp0 = '' THEN '/' ELSE rp0 END) NOT LIKE '%/'
      |        AND regexp_matches(mp, '(^|/)\.\.?$')
      |    THEN (CASE WHEN rp0 = '' THEN '/' ELSE rp0 END) || '/'
      |    ELSE (CASE WHEN rp0 = '' THEN '/' ELSE rp0 END) END AS rp
      |  FROM lr),
      |ux AS (SELECT doc_id, CASE
      |    WHEN regexp_matches(href, '^[A-Za-z][A-Za-z0-9+.-]*://') THEN href
      |    WHEN href LIKE '//%' THEN 'https:' || href
      |    WHEN regexp_matches(hnf, '^[A-Za-z][A-Za-z0-9+.-]*:') THEN NULL
      |    ELSE 'https://docs.example.org' || rp || hq END AS url
      |  FROM lf)""".stripMargin

  /** Shared DuckDB cross-host ANCHOR fixture (mirrors
    * WebFilters.anchorFixture byte for byte — seven hosts, four anchors
    * per page exercising the resolution/canonicalization matrix). Ends
    * at af(doc_id, base_url, html). */
  private val duckAnchorFixture =
    """aw AS (SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '\s+'),
      |    x -> len(x) > 0) AS ws
      |  FROM (SELECT * FROM documents ORDER BY doc_id LIMIT 150) d),
      |af AS (SELECT doc_id,
      |  'https://h' || (doc_id % 7) || '.example.org/d/' || doc_id AS base_url,
      |  '<html><body><p>See <a href="http://h' || ((doc_id + 1) % 7) ||
      |    '.example.org/p/' || (doc_id % 20) || '">' ||
      |    coalesce(ws[1], 'w1') || ' ' || coalesce(ws[2], 'w2') ||
      |    '</a> now.</p><p><a href="//h' || ((doc_id + 3) % 7) ||
      |    '.example.org:443/q/' || (doc_id % 10) || '/">' ||
      |    coalesce(ws[3], 'w3') ||
      |    ' &amp; co</a></p><p><a href="/local/' || (doc_id % 5) ||
      |    '">back ' || coalesce(ws[1], 'w1') ||
      |    '</a> <a data-href="/x" href="HTTPS://WWW.h' || ((doc_id + 5) % 7) ||
      |    '.example.org:443/r/?b=2&a=1&utm_source=x#f"><b>' ||
      |    coalesce(ws[4], 'w4') ||
      |    '</b> page</a></p></body></html>' AS html
      |  FROM aw WHERE len(ws) > 0)""".stripMargin

  /** Shared DuckDB anchor-extraction chain over af (mirrors
    * WebFilters.htmlAnchors: full anchor elements, href via the
    * delimiter-anchored lazy pattern, body inline-stripped +
    * entity-decoded + ws-normalized, href resolved against the fixture's
    * base https://h{doc_id%7}.example.org). Ends at
    * ux(doc_id, text, url) — the canonical chain's expected entry. */
  private val duckAnchors =
    """ae AS (SELECT doc_id, unnest(regexp_extract_all(html,
      |    '(?is)<a\b[^>]*?[\s"'']href\s*=\s*"[^"]*"(?:[^>]*[^/>]|[^>]*=[^\s"''>]*/)?>.*?</a>')) AS elem
      |  FROM af),
      |ar AS (SELECT doc_id,
      |  regexp_extract(elem, '(?is)<a\b[^>]*?[\s"'']href\s*=\s*"([^"]*)"', 1) AS href,
      |  trim(regexp_replace(
      |    replace(replace(replace(replace(replace(replace(
      |      regexp_replace(coalesce(regexp_extract(elem,
      |        '(?is)^<a\b[^>]*>(.*)</a>$', 1), ''), '<[^>]*>', '', 'g'),
      |      '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&#39;', chr(39)),
      |      '&nbsp;', ' '), '&amp;', '&'),
      |    '\s+', ' ', 'g')) AS text
      |  FROM ae),
      |ux AS (SELECT doc_id, text, CASE
      |    WHEN regexp_matches(href, '^[A-Za-z][A-Za-z0-9+.-]*://') THEN href
      |    WHEN href LIKE '//%' THEN 'https:' || href
      |    WHEN href LIKE '/%' THEN 'https://h' || (doc_id % 7) || '.example.org' || href
      |    ELSE NULL END AS url
      |  FROM ar)""".stripMargin

  /** Shared DuckDB C4 + Gopher verdict chain over doc2(doc_id, text)
    * (mirrors CorpusFilters.c4LineFilter / gopherFilter — the
    * ta_web_pipeline replay, factored so the host-quality rollup reuses
    * the identical rules). Ends at c4(doc_id, n_lines, kept_lines,
    * c4_keep) and gv(doc_id, n_words, stop_hits, gopher_keep). */
  private val duckQualityVerdicts =
    """cs AS (SELECT doc_id, text,
      |  list_transform(regexp_split_to_array(text, '\n'), l -> trim(l)) AS lines
      |  FROM doc2),
      |ck AS (SELECT doc_id, text, lines,
      |  list_filter(lines, l -> regexp_matches(l, '[.!?"]$')
      |    AND len(list_filter(regexp_split_to_array(l, '\s+'), w2 -> len(w2) > 0)) >= 3
      |    AND NOT contains(lower(l), 'javascript')) AS kept
      |  FROM cs),
      |c4 AS (SELECT doc_id, CAST(len(lines) AS BIGINT) AS n_lines,
      |  CAST(len(kept) AS BIGINT) AS kept_lines,
      |  (len(kept) >= 3 AND NOT contains(text, '{')
      |    AND NOT contains(lower(text), 'lorem ipsum')) AS c4_keep
      |  FROM ck),
      |gt AS (SELECT doc_id,
      |  list_filter(regexp_split_to_array(lower(text), '\s+'), x -> len(x) > 0) AS w2,
      |  list_filter(list_transform(string_split(text, chr(10)), l -> trim(l)),
      |    l -> len(l) > 0) AS ls
      |  FROM doc2),
      |gs AS (SELECT doc_id,
      |  CAST(len(w2) AS BIGINT) AS n_words,
      |  round(CAST(list_sum(list_transform(w2, x -> len(x))) AS DOUBLE)
      |    / greatest(len(w2), 1), 4) AS mean_word_len,
      |  round(CAST(len(list_filter(w2, x -> contains(x, '#')
      |      OR contains(x, '...'))) AS DOUBLE)
      |    / greatest(len(w2), 1), 4) AS symbol_ratio,
      |  round(CAST(len(list_filter(ls, l -> substring(l, 1, 1) IN
      |      ('-', '*', chr(8226)))) AS DOUBLE)
      |    / greatest(len(ls), 1), 4) AS bullet_ratio,
      |  round(CAST(len(list_filter(ls, l -> l LIKE '%...')) AS DOUBLE)
      |    / greatest(len(ls), 1), 4) AS ellipsis_ratio,
      |  round(CAST(len(list_filter(w2, x -> regexp_matches(x, '[a-z]')))
      |      AS DOUBLE) / greatest(len(w2), 1), 4) AS alpha_ratio,
      |  CAST((CASE WHEN list_contains(w2, 'the') THEN 1 ELSE 0 END)
      |    + (CASE WHEN list_contains(w2, 'be') THEN 1 ELSE 0 END)
      |    + (CASE WHEN list_contains(w2, 'to') THEN 1 ELSE 0 END)
      |    + (CASE WHEN list_contains(w2, 'of') THEN 1 ELSE 0 END)
      |    + (CASE WHEN list_contains(w2, 'and') THEN 1 ELSE 0 END)
      |    + (CASE WHEN list_contains(w2, 'that') THEN 1 ELSE 0 END)
      |    + (CASE WHEN list_contains(w2, 'have') THEN 1 ELSE 0 END)
      |    + (CASE WHEN list_contains(w2, 'with') THEN 1 ELSE 0 END)
      |    AS BIGINT) AS stop_hits
      |  FROM gt),
      |gv AS (SELECT doc_id, n_words, stop_hits,
      |  (n_words >= 50 AND n_words <= 100000
      |    AND mean_word_len >= 3 AND mean_word_len <= 10
      |    AND symbol_ratio <= 0.1 AND bullet_ratio <= 0.9
      |    AND ellipsis_ratio <= 0.3 AND alpha_ratio >= 0.8
      |    AND stop_hits >= 2) AS gopher_keep
      |  FROM gs)""".stripMargin

  /** Shared DuckDB sitemap fixture (mirrors [[sitemapFixture]] byte for
    * byte): per-host urlset bodies, one loc-less entry per host at the
    * head. Ends at sm(host, body). */
  private val duckSitemapFixture =
    """sm0 AS (SELECT doc_id, 'h' || (doc_id % 5) || '.example.org' AS host,
      |  '<url><loc>https://h' || (doc_id % 5) || '.example.org/page/' || doc_id ||
      |    CASE WHEN doc_id % 4 = 1 THEN '?a=1&amp;b=2' ELSE '' END || '</loc>' ||
      |    CASE WHEN doc_id % 3 = 0 THEN '' ELSE '<lastmod>2026-01-' ||
      |      lpad(CAST(doc_id % 27 + 1 AS VARCHAR), 2, '0') || '</lastmod>' END ||
      |    CASE WHEN doc_id % 4 = 2 THEN '<changefreq>daily</changefreq>'
      |      WHEN doc_id % 4 = 3 THEN '<changefreq>weekly</changefreq>'
      |      ELSE '' END ||
      |    CASE WHEN doc_id % 2 = 1 THEN '<priority>0.' || (doc_id % 10) ||
      |      '</priority>' ELSE '' END ||
      |    '</url>' AS rec
      |  FROM (SELECT doc_id FROM documents ORDER BY doc_id LIMIT 200) d),
      |sm AS (SELECT host,
      |    '<?xml version="1.0"?><urlset><url><lastmod>2026-01-01</lastmod></url>' ||
      |    string_agg(rec, '' ORDER BY doc_id) || '</urlset>' AS body
      |  FROM sm0 GROUP BY host)""".stripMargin

  /** Shared DuckDB sitemap-entry chain over sm (mirrors
    * WebFilters.sitemapParse): explode url blocks, tag extraction,
    * entity-decoded loc, NULLed optional fields, loc-less entries
    * skipped. Ends at se(host, loc, lastmod, changefreq, priority). */
  private val duckSitemapEntries =
    """sp0 AS (SELECT host, unnest(regexp_extract_all(body,
      |    '(?is)<url\b[^>]*>.*?</url>')) AS e FROM sm),
      |se0 AS (SELECT host,
      |  trim(regexp_replace(replace(replace(replace(replace(replace(replace(
      |    coalesce(regexp_extract(e, '(?is)<loc[^>]*>(.*?)</loc>', 1), ''),
      |    '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&#39;', chr(39)),
      |    '&nbsp;', ' '), '&amp;', '&'), '\s+', ' ', 'g')) AS loc,
      |  trim(regexp_replace(coalesce(regexp_extract(e,
      |    '(?is)<lastmod[^>]*>(.*?)</lastmod>', 1), ''), '\s+', ' ', 'g')) AS lm,
      |  trim(regexp_replace(coalesce(regexp_extract(e,
      |    '(?is)<changefreq[^>]*>(.*?)</changefreq>', 1), ''), '\s+', ' ', 'g')) AS cf,
      |  trim(regexp_replace(coalesce(regexp_extract(e,
      |    '(?is)<priority[^>]*>(.*?)</priority>', 1), ''), '\s+', ' ', 'g')) AS pr
      |  FROM sp0),
      |se AS (SELECT host, loc,
      |  nullif(lm, '') AS lastmod, nullif(cf, '') AS changefreq,
      |  CASE WHEN regexp_matches(pr, '^[0-9]+(\.[0-9]+)?$') THEN CAST(pr AS DOUBLE)
      |    ELSE NULL END AS priority
      |  FROM se0 WHERE loc <> '')""".stripMargin

  /** Shared DuckDB sitemap-INDEX fixture + entry chain (mirrors
    * [[sitemapIndexFixture]] byte for byte and
    * WebFilters.sitemapIndex): per-host sitemapindex bodies listing
    * child sitemap files — entity-escaped query on every %4==1 child,
    * lastmod missing on %3==0, one loc-less entry per host at the head;
    * the `<sitemap\b` explode cannot match the enclosing
    * `<sitemapindex>` tag. Ends at six(host, loc, lastmod). */
  private val duckSitemapIndex =
    """smi0 AS (SELECT doc_id, 'h' || (doc_id % 5) || '.example.org' AS host,
      |  '<sitemap><loc>https://h' || (doc_id % 5) || '.example.org/sm/' || doc_id ||
      |    CASE WHEN doc_id % 4 = 1 THEN '?a=1&amp;b=2' ELSE '' END || '</loc>' ||
      |    CASE WHEN doc_id % 3 = 0 THEN '' ELSE '<lastmod>2026-02-' ||
      |      lpad(CAST(doc_id % 27 + 1 AS VARCHAR), 2, '0') || '</lastmod>' END ||
      |    '</sitemap>' AS rec
      |  FROM (SELECT doc_id FROM documents ORDER BY doc_id LIMIT 200) d),
      |smi AS (SELECT host,
      |    '<?xml version="1.0"?><sitemapindex><sitemap><lastmod>2026-01-01</lastmod></sitemap>' ||
      |    string_agg(rec, '' ORDER BY doc_id) || '</sitemapindex>' AS body
      |  FROM smi0 GROUP BY host),
      |six0 AS (SELECT host, unnest(regexp_extract_all(body,
      |    '(?is)<sitemap\b[^>]*>.*?</sitemap>')) AS e FROM smi),
      |six1 AS (SELECT host,
      |  trim(regexp_replace(replace(replace(replace(replace(replace(replace(
      |    coalesce(regexp_extract(e, '(?is)<loc[^>]*>(.*?)</loc>', 1), ''),
      |    '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&#39;', chr(39)),
      |    '&nbsp;', ' '), '&amp;', '&'), '\s+', ' ', 'g')) AS loc,
      |  trim(regexp_replace(coalesce(regexp_extract(e,
      |    '(?is)<lastmod[^>]*>(.*?)</lastmod>', 1), ''), '\s+', ' ', 'g')) AS lm
      |  FROM six0),
      |six AS (SELECT host, loc, nullif(lm, '') AS lastmod
      |  FROM six1 WHERE loc <> '')""".stripMargin

  /** Shared DuckDB robots-rules chain (mirrors WebFilters.robotsRules +
    * the pattern compile robotsFilter performs on the rules side): takes
    * a prior CTE rb(host, body), replays RFC 9309 grouping (consecutive
    * user-agent lines share a block, comments strip, empty values drop),
    * emits every wildcard-agent rule with its compiled regex. Ends at
    * rr(host, prefix, allow, special, rx). Plain string — backslashes
    * are literal; never start a continuation line with a pipe. */
  private val duckRobotsRules =
    """lx3 AS (SELECT host, unnest(ls) AS l0, generate_subscripts(ls, 1) AS pos
      |  FROM (SELECT host, regexp_split_to_array(body, '\r?\n') AS ls FROM rb) z),
      |ne AS (SELECT host, pos, line, lower(line) AS low
      |  FROM (SELECT host, pos, regexp_replace(
      |    regexp_replace(l0, '#.*', ''), '^\s+|\s+$', '', 'g') AS line
      |    FROM lx3) t WHERE line <> ''),
      |gf AS (SELECT host, pos, line, low,
      |  CASE WHEN low LIKE 'user-agent:%' AND NOT coalesce(
      |      lag(low LIKE 'user-agent:%') OVER (PARTITION BY host ORDER BY pos),
      |      false) THEN 1 ELSE 0 END AS sg
      |  FROM ne),
      |gl AS (SELECT host, pos, line, low,
      |  sum(sg) OVER (PARTITION BY host ORDER BY pos) AS grp FROM gf),
      |ua AS (SELECT DISTINCT host, grp FROM gl WHERE low LIKE 'user-agent:%'
      |  AND regexp_replace(substring(line, 12), '^\s+|\s+$', '', 'g') = '*'),
      |ru AS (SELECT g.host,
      |  CASE WHEN g.low LIKE 'allow:%'
      |    THEN regexp_replace(substring(g.line, 7), '^\s+|\s+$', '', 'g')
      |    ELSE regexp_replace(substring(g.line, 10), '^\s+|\s+$', '', 'g')
      |  END AS prefix,
      |  (g.low LIKE 'allow:%') AS allow
      |  FROM gl g JOIN ua ON ua.host = g.host AND ua.grp = g.grp
      |  WHERE g.low LIKE 'disallow:%' OR g.low LIKE 'allow:%'),
      |ru2 AS (SELECT host, prefix, allow FROM ru WHERE prefix <> ''),
      |rw AS (SELECT host, prefix, allow,
      |  (contains(prefix, '*') OR prefix LIKE '%$') AS special,
      |  (prefix LIKE '%$') AS anch,
      |  CASE WHEN prefix LIKE '%$'
      |    THEN substring(prefix, 1, len(prefix) - 1) ELSE prefix END AS pbody
      |  FROM ru2),
      |rr AS (SELECT host, prefix, allow, special, anch,
      |  '^' || replace(regexp_replace(pbody,
      |      '([.^$+?(){}\[\]|\\])', '\\\1', 'g'), '*', '.*') ||
      |    (CASE WHEN anch THEN '$' ELSE '' END) AS rx
      |  FROM rw)""".stripMargin

  /** Shared DuckDB WARC framing chain (mirrors
    * WebFilters.warcRecordFrames): takes a prior CTE
    * rc(doc_id, file_id, rec), concatenates per-file bodies in doc
    * order, splits records at `WARC/1.0` version lines (slot 0 and empty
    * slots are not records), separates WARC headers from payload at the
    * first blank line with trailing whitespace trimmed. Ends at
    * rv(file_id, rec_idx, hdrs, payload). */
  private val duckWarcFrames =
    """fl AS (SELECT file_id, string_agg(rec, '' ORDER BY doc_id) AS body
      |  FROM rc GROUP BY file_id),
      |rx AS (SELECT file_id, unnest(rs) AS rec,
      |  generate_subscripts(rs, 1) - 1 AS rec_idx
      |  FROM (SELECT file_id,
      |    regexp_split_to_array(body, '(?m)^WARC/1\.0\r?\n') AS rs FROM fl) z),
      |rv AS (SELECT file_id, rec_idx, rec,
      |  CASE WHEN regexp_matches(rec, '\r?\n\r?\n')
      |    THEN coalesce(regexp_extract(rec, '(?s)^(.*?)\r?\n\r?\n', 1), '')
      |    ELSE rec END AS hdrs,
      |  CASE WHEN regexp_matches(rec, '\r?\n\r?\n')
      |    THEN regexp_replace(regexp_replace(rec, '(?s)^.*?\r?\n\r?\n', ''),
      |      '\s+$', '')
      |    ELSE '' END AS payload
      |  FROM rx WHERE rec_idx > 0 AND rec <> '')""".stripMargin

  /** Shared DuckDB HTTP-envelope parse chain (mirrors
    * WebFilters.warcHttp's payload parsing): takes rv from
    * [[duckWarcFrames]], splits the HTTP response at its first blank
    * line, extracts status / media type / charset and the trimmed body.
    * Ends at hz(file_id, rec_idx, hdrs, st, hb, mime, charset). */
  private val duckWarcHttp =
    """hp AS (SELECT file_id, rec_idx, hdrs,
      |  coalesce(regexp_extract(payload, '^HTTP/[0-9.]+[ \t]+([0-9]{3})', 1), '') AS st,
      |  CASE WHEN regexp_matches(payload, '\r?\n\r?\n')
      |    THEN coalesce(regexp_extract(payload, '(?s)^(.*?)\r?\n\r?\n', 1), '')
      |    ELSE payload END AS hh,
      |  CASE WHEN regexp_matches(payload, '\r?\n\r?\n')
      |    THEN regexp_replace(regexp_replace(payload, '(?s)^.*?\r?\n\r?\n', ''), '\s+$', '')
      |    ELSE '' END AS hb
      |  FROM rv),
      |hm AS (SELECT file_id, rec_idx, hdrs, st, hb,
      |  coalesce(regexp_extract(hh, '(?im)^Content-Type:[ \t]*([^\r\n]*)', 1), '') AS ct
      |  FROM hp),
      |hz AS (SELECT file_id, rec_idx, hdrs, st, hb,
      |  lower(trim(coalesce(regexp_extract(ct, '^([^;]*)', 1), ''))) AS mime,
      |  lower(coalesce(regexp_extract(ct, '(?i)charset[ \t]*=[ \t]*"?([A-Za-z0-9_.:-]+)', 1), '')) AS charset
      |  FROM hm)""".stripMargin

  /** The Spark-side URL fixture — one URL shape per doc_id mod 6. */
  private def urlFixture(docs: org.apache.spark.sql.DataFrame) = {
    val grp = floor(col("doc_id") / 12).cast("long").cast("string")
    val id = col("doc_id").cast("string")
    docs.orderBy("doc_id").limit(200).select(col("doc_id"),
      when(col("doc_id") % 6 === 0,
        concat(lit("HTTP://WWW.Example.COM:80/a/"), grp, lit("/?utm_source=feed&page=2#top")))
        .when(col("doc_id") % 6 === 1,
          concat(lit("http://example.com/a/"), grp, lit("?page=2&utm_medium=rss")))
        .when(col("doc_id") % 6 === 2,
          concat(lit("https://ads.example.com/banner/"), id))
        .when(col("doc_id") % 6 === 3,
          concat(lit("http://static.example.org/img/photo"), id, lit(".JPG")))
        .when(col("doc_id") % 6 === 4,
          concat(lit("ftp://files.example.org/pub/"), id))
        .otherwise(concat(lit("not a url "), id)).as("url"))
  }

  val all: Seq[QSpec] = Seq(

    // HTML main-content extraction: the boilerplate heuristic must keep
    // the prose blocks and kill the title/nav/footer — the oracle replays
    // the regex pipeline on the identically-constructed HTML
    df("ta_html_extract",
      s"""WITH $duckHtmlFixture,
         |$duckHtmlExtract,
         |tt AS (SELECT doc_id,
         |  trim(regexp_replace(replace(replace(replace(replace(replace(replace(
         |    regexp_replace(
         |      coalesce(regexp_extract(html, '(?is)<title[^>]*>(.*?)</title>', 1), ''),
         |      '<[^>]*>', '', 'g'),
         |    '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&#39;', chr(39)),
         |    '&nbsp;', ' '), '&amp;', '&'),
         |    '\\s+', ' ', 'g')) AS title FROM fx)
         |SELECT a.doc_id, t.title, a.n_blocks, a.kept_blocks,
         |  CAST(len(a.body) AS BIGINT) AS kept_chars, md5(a.body) AS content_digest
         |FROM ag a JOIN tt t USING (doc_id) ORDER BY doc_id""".stripMargin) { (s, _) =>
      WebFilters.htmlExtract(WebFilters.htmlFixture(s.table("documents")))
        .orderBy("doc_id")
    },

    // the web pipeline END TO END: HTML -> main content -> C4 line filter
    // -> Gopher quality gate, per-doc verdicts from each stage
    df("ta_web_pipeline",
      s"""WITH $duckHtmlFixture,
         |$duckHtmlExtract,
         |doc2 AS (SELECT doc_id, body AS text FROM ag),
         |$duckQualityVerdicts
         |SELECT c4.doc_id, c4.n_lines, c4.kept_lines, c4.c4_keep,
         |  gv.n_words, gv.stop_hits, gv.gopher_keep,
         |  (c4.c4_keep AND gv.gopher_keep) AS keep
         |FROM c4 JOIN gv USING (doc_id) ORDER BY doc_id""".stripMargin) { (s, _) =>
      val extracted = WebFilters.htmlFixture(s.table("documents"))
        .select(col("doc_id"),
          WebFilters.htmlMainContent(col("html")).as("text"))
      val c4 = CorpusFilters.c4LineFilter(extracted)
        .select(col("doc_id"), col("n_lines"), col("kept_lines"),
          col("keep").as("c4_keep"))
      val gopher = CorpusFilters.gopherFilter(extracted)
        .select(col("doc_id"), col("n_words"), col("stop_hits"),
          col("keep").as("gopher_keep"))
      c4.join(gopher, Seq("doc_id"))
        .withColumn("keep", col("c4_keep") && col("gopher_keep"))
        .orderBy("doc_id")
    },

    // per-host quality profile: the data-driven feedback loop from the
    // text filters back to the crawl blocklist — per canonical host, C4 /
    // Gopher / joint keep rates
    df("ta_host_quality",
      s"""WITH doc2 AS (SELECT doc_id, text
         |  FROM (SELECT * FROM documents ORDER BY doc_id LIMIT 200) d),
         |$duckQualityVerdicts,
         |hh AS (SELECT doc_id, 'h' || (doc_id % 7) || '.example.org' AS host
         |  FROM doc2)
         |SELECT hh.host, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(gv.n_words) AS BIGINT) AS n_words,
         |  round(avg(CASE WHEN gv.gopher_keep THEN 1.0 ELSE 0.0 END), 4)
         |    AS gopher_keep_rate,
         |  round(avg(CASE WHEN c4.c4_keep THEN 1.0 ELSE 0.0 END), 4)
         |    AS c4_keep_rate,
         |  round(avg(CASE WHEN gv.gopher_keep AND c4.c4_keep
         |    THEN 1.0 ELSE 0.0 END), 4) AS keep_rate
         |FROM hh JOIN gv USING (doc_id) JOIN c4 USING (doc_id)
         |GROUP BY hh.host ORDER BY host""".stripMargin) { (s, _) =>
      val pages = s.table("documents").orderBy("doc_id").limit(200)
        .select(col("doc_id"), col("text"),
          concat(lit("https://WWW.h"), (col("doc_id") % 7).cast("string"),
            lit(".example.org:443/x/"), col("doc_id").cast("string"))
            .as("url"))
      WebFilters.hostQuality(pages).orderBy("host")
    },


    // the corpus DATA CARD: the one-query datasheet a curation run
    // publishes — per language: volume (docs, tokens, share), quality
    // keep rates (the same shared C4/Gopher verdicts every filter uses),
    // exact-duplicate rate, and mean document length. All uniform-key
    // partial aggs; the totals row is a broadcast scalar
    df("ta_corpus_datasheet",
      s"""WITH doc2 AS (SELECT doc_id, text FROM documents),
         |$duckQualityVerdicts,
         |wl AS (SELECT doc_id, lang,
         |  CAST(len(list_filter(regexp_split_to_array(lower(text), '\\s+'),
         |    x -> len(x) > 0)) AS BIGINT) AS n_words,
         |  md5(text) AS h FROM documents),
         |dg AS (SELECT h, count(*) AS c FROM wl GROUP BY h),
         |wd AS (SELECT wl.*, dg.c > 1 AS is_dup FROM wl JOIN dg USING (h)),
         |pl AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(wd.n_words) AS BIGINT) AS n_words,
         |  round(CAST(sum(wd.n_words) AS BIGINT) / count(*), 4) AS mean_words,
         |  round(avg(CASE WHEN c4.c4_keep THEN 1.0 ELSE 0.0 END), 4)
         |    AS c4_keep_rate,
         |  round(avg(CASE WHEN gv.gopher_keep THEN 1.0 ELSE 0.0 END), 4)
         |    AS gopher_keep_rate,
         |  round(avg(CASE WHEN wd.is_dup THEN 1.0 ELSE 0.0 END), 4)
         |    AS dup_rate,
         |  round(avg(CASE WHEN wd.n_words >= 64 THEN 1.0 ELSE 0.0 END), 4)
         |    AS long_doc_rate
         |  FROM wd JOIN c4 USING (doc_id) JOIN gv USING (doc_id)
         |  GROUP BY lang),
         |tt AS (SELECT CAST(sum(n_docs) AS BIGINT) AS tot FROM pl)
         |SELECT lang, n_docs, round(CAST(n_docs AS DOUBLE) / tt.tot, 4)
         |    AS share,
         |  n_words, mean_words, c4_keep_rate, gopher_keep_rate, dup_rate,
         |  long_doc_rate
         |FROM pl CROSS JOIN tt ORDER BY lang""".stripMargin) { (s, _) =>
      val d = s.table("documents")
      val base = d.select(col("doc_id"), col("lang"),
        coalesce(size(graft.operators.Dedup.tokens(col("text"))).cast("long"),
          lit(0L)).as("n_words"),
        CorpusFilters.c4Keep(col("text")).as("ck"),
        CorpusFilters.gopherKeep(col("text")).as("gk"),
        md5(col("text")).as("h"))
      val dup = base.groupBy("h").agg(count(lit(1)).as("c"))
      val perLang = base.join(dup, Seq("h"))
        .withColumn("is_dup", col("c") > 1)
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_words").as("n_words"),
          round(sum("n_words") / count(lit(1)), 4).as("mean_words"),
          round(avg(when(col("ck"), 1.0).otherwise(0.0)), 4)
            .as("c4_keep_rate"),
          round(avg(when(col("gk"), 1.0).otherwise(0.0)), 4)
            .as("gopher_keep_rate"),
          round(avg(when(col("is_dup"), 1.0).otherwise(0.0)), 4)
            .as("dup_rate"),
          round(avg(when(col("n_words") >= 64, 1.0).otherwise(0.0)), 4)
            .as("long_doc_rate"))
      perLang
        .crossJoin(broadcast(perLang.agg(sum("n_docs").as("tot"))))
        .withColumn("share", round(col("n_docs") / col("tot"), 4))
        .select("lang", "n_docs", "share", "n_words", "mean_words",
          "c4_keep_rate", "gopher_keep_rate", "dup_rate", "long_doc_rate")
        .orderBy("lang")
    },

    // extract -> corpus-level line dedup: the constant blocks every page
    // shares (in-content boilerplate the link-density rule can't see —
    // same prose on every page) die via lineDedup's distinct-doc rule
    df("ta_web_line_dedup",
      s"""WITH $duckHtmlFixture,
         |$duckHtmlExtract,
         |doc2 AS (SELECT doc_id, body AS text FROM ag),
         |raw AS (SELECT doc_id,
         |  list_transform(regexp_split_to_array(text, '\\n'), l -> trim(l)) AS ls
         |  FROM doc2),
         |lx2 AS (SELECT doc_id, unnest(ls) AS line,
         |  generate_subscripts(ls, 1) AS pos FROM raw),
         |nz AS (SELECT doc_id, pos, line, md5(line) AS h FROM lx2
         |  WHERE len(line) > 0),
         |fq AS (SELECT h, count(DISTINCT doc_id) AS dcnt FROM nz GROUP BY h),
         |fl AS (SELECT nz.doc_id, nz.pos, nz.line, fq.dcnt >= 2 AS removed
         |  FROM nz JOIN fq USING (h))
         |SELECT doc_id, count(*) AS n_lines,
         |  CAST(sum(CASE WHEN removed THEN 1 ELSE 0 END) AS BIGINT) AS removed_lines,
         |  CAST(sum(CASE WHEN NOT removed THEN 1 ELSE 0 END) AS BIGINT) AS kept_lines,
         |  md5(coalesce(string_agg(CASE WHEN NOT removed THEN line END,
         |    chr(10) ORDER BY pos), '')) AS kept_digest
         |FROM fl GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, _) =>
      CorpusFilters.lineDedup(
          WebFilters.htmlFixture(s.table("documents"))
            .select(col("doc_id"),
              WebFilters.htmlMainContent(col("html")).as("text")))
        .orderBy("doc_id")
    },

    // outlink extraction: anchor hrefs resolved absolute per RFC 3986 §5
    // (root-relative against the page's canonical scheme://host,
    // path-relative / dot-segment / query-only / fragment-only refs via
    // §5.3 merge + §5.2.4 removal — the relLinksHtml suffix exercises the
    // whole matrix), canonicalized
    df("ta_html_links",
      s"""WITH $duckHtmlFixture,
         |$duckRelLinksFixture,
         |$duckHtmlLinks,
         |$duckUrlCanonical
         |SELECT doc_id, url, canonical_url FROM cx
         |WHERE url IS NOT NULL ORDER BY doc_id, url""".stripMargin) { (s, _) =>
      val fx = WebFilters.htmlFixture(s.table("documents"))
        .withColumn("html", concat(col("html"), relLinksHtml(col("doc_id"))))
        .withColumn("base_url",
          concat(lit("https://docs.example.org/d/"), col("doc_id").cast("string")))
      WebFilters.htmlLinks(fx)
        .withColumn("canonical_url", WebFilters.urlCanonical(col("url")))
        .orderBy("doc_id", "url")
    },

    // the crawl loop closed: extracted outlinks -> URL filter -> canonical
    // dedup = the NEXT frontier, with how many link occurrences collapsed
    // into each entry
    df("ta_crawl_frontier",
      s"""WITH $duckHtmlFixture,
         |$duckRelLinksFixture,
         |$duckHtmlLinks,
         |$duckUrlCanonical
         |SELECT canonical_url, CAST(min(doc_id) AS BIGINT) AS keeper,
         |  CAST(count(*) AS BIGINT) AS group_size
         |FROM cx
         |WHERE url IS NOT NULL AND canonical_url IS NOT NULL
         |  AND scheme IN ('http', 'https')
         |  AND NOT (host IN ('ads.example.com', 'tracker.example.net', 'doubleclick.net', 'adservice.example.org')
         |    OR host LIKE '%.ads.example.com' OR host LIKE '%.tracker.example.net'
         |    OR host LIKE '%.doubleclick.net' OR host LIKE '%.adservice.example.org')
         |  AND NOT regexp_matches(lower(path), '\\.(jpe?g|png|gif|webp|bmp|ico|svg|css|js|mjs|woff2?|ttf|mp[34]|avi|mov|mkv|zip|tar|gz|tgz|rar|7z|exe|dmg|iso|pdf)$$')
         |GROUP BY canonical_url ORDER BY canonical_url""".stripMargin) { (s, _) =>
      val fx = WebFilters.htmlFixture(s.table("documents"))
        .withColumn("html", concat(col("html"), relLinksHtml(col("doc_id"))))
        .withColumn("base_url",
          concat(lit("https://docs.example.org/d/"), col("doc_id").cast("string")))
      WebFilters.urlDedup(
          WebFilters.urlFilter(WebFilters.htmlLinks(fx)).where(col("keep")))
        .orderBy("canonical_url")
    },

    // URL-level filtering (crawl-frontier gate): scheme / domain blocklist
    // / extension rules + the canonical form
    df("ta_url_filter",
      s"""WITH $duckUrlFixture,
         |$duckUrlCanonical
         |SELECT doc_id, url, canonical_url, host,
         |  (scheme IN ('http', 'https')) AS scheme_ok,
         |  (host IN ('ads.example.com', 'tracker.example.net', 'doubleclick.net', 'adservice.example.org')
         |    OR host LIKE '%.ads.example.com' OR host LIKE '%.tracker.example.net'
         |    OR host LIKE '%.doubleclick.net' OR host LIKE '%.adservice.example.org') AS blocked_domain,
         |  regexp_matches(lower(path), '\\.(jpe?g|png|gif|webp|bmp|ico|svg|css|js|mjs|woff2?|ttf|mp[34]|avi|mov|mkv|zip|tar|gz|tgz|rar|7z|exe|dmg|iso|pdf)$$') AS blocked_ext,
         |  ((scheme IN ('http', 'https'))
         |    AND NOT (host IN ('ads.example.com', 'tracker.example.net', 'doubleclick.net', 'adservice.example.org')
         |      OR host LIKE '%.ads.example.com' OR host LIKE '%.tracker.example.net'
         |      OR host LIKE '%.doubleclick.net' OR host LIKE '%.adservice.example.org')
         |    AND NOT regexp_matches(lower(path), '\\.(jpe?g|png|gif|webp|bmp|ico|svg|css|js|mjs|woff2?|ttf|mp[34]|avi|mov|mkv|zip|tar|gz|tgz|rar|7z|exe|dmg|iso|pdf)$$')
         |    AND canonical_url IS NOT NULL) AS keep
         |FROM cx ORDER BY doc_id""".stripMargin) { (s, _) =>
      WebFilters.urlFilter(urlFixture(s.table("documents")))
        .select(col("doc_id"), col("url"), col("canonical_url"), col("host"),
          col("scheme_ok"), col("blocked_domain"), col("blocked_ext"),
          col("keep"))
        .orderBy("doc_id")
    },

    // WARC-style archive parsing (the Common Crawl container — the web
    // pipeline's byte-level entry point): 15 multi-record files built
    // from the documents table, parsed back to per-record rows
    df("ta_warc_parse",
      s"""WITH rc AS (SELECT doc_id, doc_id // 10 AS file_id,
        |  'WARC/1.0' || chr(10) || 'WARC-Type: response' || chr(10) ||
        |  'WARC-Target-URI: https://docs.example.org/d/' || doc_id || chr(10) ||
        |  'WARC-Date: 2026-01-01T00:00:00Z' || chr(10) ||
        |  'Content-Length: ' || len(text) || chr(10) || chr(10) ||
        |  text || chr(10) || chr(10) AS rec
        |  FROM (SELECT * FROM documents ORDER BY doc_id LIMIT 150) d),
        |$duckWarcFrames
        |SELECT file_id, CAST(rec_idx AS BIGINT) AS rec_idx,
        |  coalesce(regexp_extract(hdrs, '(?im)^WARC-Type:\\s*(\\S+)', 1), '') AS warc_type,
        |  coalesce(regexp_extract(hdrs, '(?im)^WARC-Target-URI:\\s*(\\S+)', 1), '') AS target_uri,
        |  coalesce(regexp_extract(hdrs, '(?im)^WARC-Date:\\s*(\\S+)', 1), '') AS warc_date,
        |  CAST(nullif(coalesce(regexp_extract(hdrs, '(?im)^Content-Length:\\s*([0-9]+)', 1), ''), '') AS BIGINT) AS content_length,
        |  CAST(len(payload) AS BIGINT) AS payload_len,
        |  md5(payload) AS payload_digest
        |FROM rv ORDER BY file_id, rec_idx""".stripMargin) { (s, _) =>
      val recs = s.table("documents").orderBy("doc_id").limit(150)
        .select(col("doc_id"),
          floor(col("doc_id") / 10).cast("long").as("file_id"),
          concat(
            lit("WARC/1.0\nWARC-Type: response\nWARC-Target-URI: " +
              "https://docs.example.org/d/"), col("doc_id").cast("string"),
            lit("\nWARC-Date: 2026-01-01T00:00:00Z\nContent-Length: "),
            length(col("text")).cast("string"),
            lit("\n\n"), col("text"), lit("\n\n")).as("rec"))
      val files = recs.groupBy("file_id").agg(
        concat_ws("", transform(
          array_sort(collect_list(struct(col("doc_id"), col("rec")))),
          x => x.getField("rec"))).as("body"))
      WebFilters.warcParse(files).orderBy("file_id", "rec_idx")
    },

    // HTTP-envelope gate over WARC response payloads (the FIRST filter a
    // real crawl pipeline applies — only 200 + text/html proceeds): six
    // response shapes exercise status parsing, media-type lowering,
    // charset extraction (bare + quoted), a Location-only redirect with
    // no Content-Type, a non-HTML media type, and a malformed capture
    // with no status line (reject verdict, never an error)
    df("ta_warc_http",
      s"""WITH pc AS (SELECT doc_id, doc_id // 10 AS file_id, CASE doc_id % 6
        |  WHEN 0 THEN 'HTTP/1.1 200 OK' || chr(10) || 'Content-Type: text/html; charset=UTF-8'
        |    || chr(10) || chr(10) || '<html><body><p>' || text || '</p></body></html>'
        |  WHEN 1 THEN 'HTTP/1.1 200 OK' || chr(10) || 'Content-Type: TEXT/HTML'
        |    || chr(10) || chr(10) || text
        |  WHEN 2 THEN 'HTTP/1.1 404 Not Found' || chr(10) || 'Content-Type: text/html; charset="latin-1"'
        |    || chr(10) || chr(10) || 'not found: ' || doc_id
        |  WHEN 3 THEN 'HTTP/1.1 301 Moved Permanently' || chr(10) || 'Location: https://docs.example.org/d/'
        |    || doc_id || chr(10) || chr(10)
        |  WHEN 4 THEN 'HTTP/1.1 200 OK' || chr(10) || 'Content-Type: image/png'
        |    || chr(10) || chr(10) || 'PNGPIX' || doc_id
        |  ELSE 'plain capture without envelope ' || text END AS payload
        |  FROM (SELECT * FROM documents ORDER BY doc_id LIMIT 150) d),
        |rc AS (SELECT doc_id, file_id,
        |  'WARC/1.0' || chr(10) || 'WARC-Type: response' || chr(10) ||
        |  'WARC-Target-URI: https://docs.example.org/d/' || doc_id || chr(10) ||
        |  'Content-Length: ' || len(payload) || chr(10) || chr(10) ||
        |  payload || chr(10) || chr(10) AS rec
        |  FROM pc),
        |$duckWarcFrames,
        |$duckWarcHttp
        |SELECT file_id, CAST(rec_idx AS BIGINT) AS rec_idx,
        |  coalesce(regexp_extract(hdrs, '(?im)^WARC-Target-URI:\\s*(\\S+)', 1), '') AS target_uri,
        |  CAST(nullif(st, '') AS INT) AS http_status,
        |  mime, charset,
        |  CAST(len(hb) AS BIGINT) AS body_len, md5(hb) AS body_digest,
        |  (CASE WHEN st = '' THEN false
        |    ELSE CAST(st AS INT) = 200 AND mime = 'text/html' END) AS keep
        |FROM hz ORDER BY file_id, rec_idx""".stripMargin) { (s, _) =>
      WebFilters.warcHttp(warcHttpFixture(s.table("documents")))
        .orderBy("file_id", "rec_idx")
    },

    // meta-robots page policy (robots.txt's in-document sibling): both
    // attribute orders, case-insensitive values, 'none' implying both
    // directives, token anchoring ('noindexing' must not read as
    // noindex), name-mismatch and data-name decoys that must not match
    df("ta_meta_robots",
      s"""WITH $duckHtmlFixture,
         |mx AS (SELECT doc_id, html || CASE doc_id % 6
         |  WHEN 0 THEN '<meta name="robots" content="noindex, nofollow">'
         |  WHEN 1 THEN '<meta content="nofollow" name="robots">'
         |  WHEN 2 THEN '<meta name="ROBOTS" content="NONE">'
         |  WHEN 3 THEN '<meta name="robots" content="noindexing, follow"><meta name="description" content="noindex">'
         |  WHEN 4 THEN '<meta data-name="robots" content="noindex">'
         |  ELSE '<meta name="robots" content="noindex nofollow">' END AS html
         |  FROM fx),
         |mc AS (SELECT doc_id, list_concat(
         |  regexp_extract_all(html, '(?is)<meta\\b[^>]*?[\\s"'']name\\s*=\\s*"robots"[^>]*?[\\s"'']content\\s*=\\s*"([^"]*)"', 1),
         |  regexp_extract_all(html, '(?is)<meta\\b[^>]*?[\\s"'']content\\s*=\\s*"([^"]*)"[^>]*?[\\s"'']name\\s*=\\s*"robots"', 1)) AS cs
         |  FROM mx),
         |md AS (SELECT doc_id,
         |  len(list_filter(cs, c -> regexp_matches(lower(c), '(^|[\\s,])\\s*(noindex|none)\\s*([\\s,]|$$)'))) > 0 AS noindex,
         |  len(list_filter(cs, c -> regexp_matches(lower(c), '(^|[\\s,])\\s*(nofollow|none)\\s*([\\s,]|$$)'))) > 0 AS nofollow
         |  FROM mc)
         |SELECT doc_id, noindex, nofollow, NOT noindex AS index_keep
         |FROM md ORDER BY doc_id""".stripMargin) { (s, _) =>
      val fx = WebFilters.htmlFixture(s.table("documents"))
        .withColumn("html", concat(col("html"), metaRobotsHtml(col("doc_id"))))
      fx.select(col("doc_id"),
          WebFilters.metaNoindex(col("html")).as("noindex"),
          WebFilters.metaNofollow(col("html")).as("nofollow"),
          (!WebFilters.metaNoindex(col("html"))).as("index_keep"))
        .orderBy("doc_id")
    },

    // nofollow-aware outlink extraction (the frame the frontier and the
    // host graph should consume — nofollow links are not endorsements):
    // anchor-level rel="nofollow" (token-anchored, multi-token rel,
    // data-rel decoy) and page-level meta nofollow both prune; absolute
    // and root-relative hrefs resolve as in htmlLinks
    df("ta_follow_links",
      s"""WITH nf AS (SELECT doc_id,
         |  'https://h' || (doc_id % 7) || '.example.org/d/' || doc_id AS base_url,
         |  '<html><body>' ||
         |  (CASE WHEN doc_id % 7 = 0 THEN '<meta name="robots" content="nofollow">' ELSE '' END) ||
         |  '<p><a href="https://h' || ((doc_id + 1) % 7) || '.example.org/f/' || (doc_id % 20) || '">f</a>' ||
         |  ' <a rel="nofollow" href="https://h' || ((doc_id + 2) % 7) || '.example.org/g/' || (doc_id % 10) || '">g</a>' ||
         |  ' <a href="/local/' || (doc_id % 5) || '" rel="noopener nofollow">l</a>' ||
         |  ' <a href="https://h' || ((doc_id + 3) % 7) || '.example.org/k/' || (doc_id % 4) || '" rel="noopener">k</a>' ||
         |  ' <a data-rel="nofollow" href="/keep/' || (doc_id % 3) || '">d</a></p></body></html>' AS html
         |  FROM (SELECT doc_id FROM documents ORDER BY doc_id LIMIT 150) d),
         |mf AS (SELECT doc_id, base_url, html FROM nf
         |  WHERE len(list_filter(list_concat(
         |    regexp_extract_all(html, '(?is)<meta\\b[^>]*?[\\s"'']name\\s*=\\s*"robots"[^>]*?[\\s"'']content\\s*=\\s*"([^"]*)"', 1),
         |    regexp_extract_all(html, '(?is)<meta\\b[^>]*?[\\s"'']content\\s*=\\s*"([^"]*)"[^>]*?[\\s"'']name\\s*=\\s*"robots"', 1)),
         |    c -> regexp_matches(lower(c), '(^|[\\s,])\\s*(nofollow|none)\\s*([\\s,]|$$)'))) = 0),
         |tg AS (SELECT doc_id, base_url,
         |  unnest(regexp_extract_all(html, '(?is)<a\\b[^>]*?[\\s"'']href\\s*=\\s*"[^"]*"[^>]*>', 0)) AS tag
         |  FROM mf),
         |tr AS (SELECT doc_id, base_url,
         |  lower(coalesce(regexp_extract(tag, '(?is)[\\s"'']rel\\s*=\\s*"([^"]*)"', 1), '')) AS rel,
         |  coalesce(regexp_extract(tag, '(?is)<a\\b[^>]*?[\\s"'']href\\s*=\\s*"([^"]*)"', 1), '') AS href
         |  FROM tg),
         |tk AS (SELECT doc_id, base_url, href FROM tr
         |  WHERE NOT regexp_matches(rel, '(^|[\\s,])nofollow([\\s,]|$$)'))
         |SELECT doc_id, base_url,
         |  CASE WHEN regexp_matches(href, '^[A-Za-z][A-Za-z0-9+.-]*://') THEN href
         |    ELSE 'https://h' || (doc_id % 7) || '.example.org' || regexp_replace(href, '#.*', '') END AS url
         |FROM tk ORDER BY doc_id, url""".stripMargin) { (s, _) =>
      WebFilters.followLinks(followLinksFixture(s.table("documents")))
        .orderBy("doc_id", "url")
    },

    // <base href> honored in link resolution (the HTML element that
    // redirects every relative link on the page): absolute, root-
    // relative, and path-relative base declarations each re-anchor the
    // page's relative links; an unresolvable (mailto:) declaration falls
    // back to the document URL. The oracle recomputes the effective base
    // from the fixture's construction formula (the generic §5 resolution
    // chain is pinned by ta_html_links)
    df("ta_base_href",
      s"""WITH bx AS (SELECT doc_id,
         |  'https://h' || (doc_id % 7) || '.example.org/d/' || doc_id AS page_url,
         |  CASE doc_id % 5
         |    WHEN 1 THEN 'https://cdn.example.net/assets/'
         |    WHEN 2 THEN '/b2/'
         |    WHEN 3 THEN 'sub/'
         |    ELSE '' END AS b
         |  FROM (SELECT doc_id FROM documents ORDER BY doc_id LIMIT 150) d),
         |eb AS (SELECT doc_id,
         |  CASE WHEN b = '' THEN page_url
         |    WHEN b LIKE 'https://%' THEN b
         |    WHEN b LIKE '/%' THEN 'https://h' || (doc_id % 7) || '.example.org' || b
         |    ELSE 'https://h' || (doc_id % 7) || '.example.org/d/' || b END AS eff
         |  FROM bx),
         |lk AS (SELECT doc_id, eff, unnest([
         |    'p' || (doc_id % 3) || '.html',
         |    '/r/' || (doc_id % 4),
         |    'https://abs.example.org/z']) AS href
         |  FROM eb)
         |SELECT doc_id, CASE
         |    WHEN href LIKE 'https://%' THEN href
         |    WHEN href LIKE '/%' THEN regexp_extract(eff, '^(https://[^/]*)', 1) || href
         |    ELSE regexp_replace(eff, '[^/]*$$', '') || href END AS url
         |FROM lk ORDER BY doc_id, url""".stripMargin) { (s, _) =>
      // the materialize-once contract: the effective base is resolved on
      // the PAGE frame (the fetch/extract stage), then link extraction
      // runs unchanged against it — see docBase's scaladoc for why it is
      // not nested inside htmlLinks
      val fx = baseHrefFixture(s.table("documents"))
      WebFilters.htmlLinks(fx.withColumn("base_url",
          WebFilters.docBase(col("html"), col("base_url"))))
        .orderBy("doc_id", "url")
    },

    // hreflang alternate extraction (the signal grouping a page with its
    // translations): any attribute order, token-anchored rel (multi-token
    // 'alternate stylesheet' still declares one), case-insensitive lang,
    // entity-decoded hrefs; stylesheet and hreflang-less RSS-alternate
    // decoys drop
    df("ta_hreflang",
      s"""WITH $duckHreflangFixture,
         |tg AS (SELECT doc_id, unnest(regexp_extract_all(html, '(?is)<link\\b[^>]*>', 0)) AS tag FROM hfx),
         |tr AS (SELECT doc_id,
         |  lower(coalesce(regexp_extract(tag, '(?is)[\\s"'']rel\\s*=\\s*"([^"]*)"', 1), '')) AS rel,
         |  lower(coalesce(regexp_extract(tag, '(?is)[\\s"'']hreflang\\s*=\\s*"([^"]*)"', 1), '')) AS lang,
         |  replace(coalesce(regexp_extract(tag, '(?is)[\\s"'']href\\s*=\\s*"([^"]*)"', 1), ''), '&amp;', '&') AS href
         |  FROM tg),
         |lk AS (SELECT doc_id, lang, href AS url FROM tr
         |  WHERE regexp_matches(rel, '(^|[\\s,])alternate([\\s,]|$$)')
         |    AND lang <> '' AND href <> '')
         |SELECT doc_id, lang, url FROM lk
         |ORDER BY doc_id, lang, url""".stripMargin) { (s, _) =>
      WebFilters.hreflangLinks(hreflangFixture(s.table("documents")))
        .orderBy("doc_id", "lang", "url")
    },

    // translation clusters + per-language pick (the monolingual corpus
    // builder's variant collapse): cluster key = the canonicalized
    // x-default alternate (falls back to the smallest canonical
    // alternate), members deduped, the 'en' variant kept per cluster
    df("dd_translation_pick",
      s"""WITH $duckHreflangFixture,
         |tg AS (SELECT doc_id, unnest(regexp_extract_all(html, '(?is)<link\\b[^>]*>', 0)) AS tag FROM hfx),
         |tr AS (SELECT doc_id,
         |  lower(coalesce(regexp_extract(tag, '(?is)[\\s"'']rel\\s*=\\s*"([^"]*)"', 1), '')) AS rel,
         |  lower(coalesce(regexp_extract(tag, '(?is)[\\s"'']hreflang\\s*=\\s*"([^"]*)"', 1), '')) AS lang,
         |  replace(coalesce(regexp_extract(tag, '(?is)[\\s"'']href\\s*=\\s*"([^"]*)"', 1), ''), '&amp;', '&') AS href
         |  FROM tg),
         |ux AS (SELECT doc_id, lang, href AS url FROM tr
         |  WHERE regexp_matches(rel, '(^|[\\s,])alternate([\\s,]|$$)')
         |    AND lang <> '' AND href <> ''),
         |${duckCanonicalChain("doc_id, lang")},
         |ky AS (SELECT doc_id, coalesce(
         |    min(CASE WHEN lang = 'x-default' THEN canonical_url END),
         |    min(canonical_url)) AS cluster_key
         |  FROM cx WHERE canonical_url IS NOT NULL GROUP BY doc_id),
         |mm AS (SELECT DISTINCT ky.cluster_key, cx.lang, cx.canonical_url AS url
         |  FROM cx JOIN ky USING (doc_id) WHERE cx.canonical_url IS NOT NULL)
         |SELECT cluster_key, min(CASE WHEN lang = 'en' THEN url END) AS keep_url,
         |  CAST(count(DISTINCT lang) AS BIGINT) AS n_langs
         |FROM mm GROUP BY cluster_key ORDER BY cluster_key""".stripMargin) { (s, _) =>
      WebFilters.translationClusters(hreflangFixture(s.table("documents")))
        .groupBy("cluster_key")
        .agg(min(when(col("lang") === "en", col("url"))).as("keep_url"),
          countDistinct(col("lang")).as("n_langs"))
        .orderBy("cluster_key")
    },

    // parallel-corpus candidate pairs mined from the hreflang clusters:
    // cross-language page pairs per cluster, digest-inequality gate
    // (the every-5th-group verbatim-copy de page drops) and length-ratio
    // gate (the every-4th-group fr stub drops); x-default never pairs.
    // The oracle replays cluster build, URL join, gates and ratio
    df("dd_translation_pairs",
      """WITH tp AS (SELECT doc_id, doc_id // 3 AS grp, doc_id % 3 AS m
        |  FROM (SELECT doc_id FROM documents ORDER BY doc_id LIMIT 150) d),
        |px AS (SELECT doc_id, grp, m,
        |  'https://example.com/' ||
        |    (CASE m WHEN 0 THEN 'en' WHEN 1 THEN 'de' ELSE 'fr' END) ||
        |    '/p/' || grp AS base_url,
        |  CASE WHEN m = 0 THEN repeat('en' || grp || ' ', CAST(20 + grp % 7 AS INT))
        |    WHEN m = 1 THEN CASE WHEN grp % 5 = 0
        |      THEN repeat('en' || grp || ' ', CAST(20 + grp % 7 AS INT))
        |      ELSE repeat('de' || grp || ' ', CAST(18 + grp % 7 AS INT)) END
        |    ELSE CASE WHEN grp % 4 = 0 THEN repeat('fr' || grp || ' ', 5)
        |      ELSE repeat('fr' || grp || ' ', CAST(22 + grp % 7 AS INT)) END
        |    END AS text
        |  FROM tp),
        |lx AS (SELECT doc_id, l.lang,
        |  'https://example.com/' || l.pth || '/p/' || grp AS url
        |  FROM px CROSS JOIN (VALUES ('en', 'en'), ('de', 'de'),
        |    ('fr', 'fr'), ('x-default', 'en')) l(lang, pth)),
        |ky AS (SELECT doc_id, coalesce(
        |    min(CASE WHEN lang = 'x-default' THEN url END), min(url))
        |    AS cluster_key
        |  FROM lx GROUP BY doc_id),
        |mm AS (SELECT DISTINCT ky.cluster_key, lx.lang, lx.url
        |  FROM lx JOIN ky USING (doc_id) WHERE lx.lang <> 'x-default'),
        |pg AS (SELECT doc_id, base_url AS curl,
        |  CAST(len(list_filter(regexp_split_to_array(lower(text), '\s+'),
        |    x -> len(x) > 0)) AS BIGINT) AS ln, md5(text) AS dig FROM px),
        |mj AS (SELECT mm.cluster_key, mm.lang, pg.doc_id, pg.ln, pg.dig
        |  FROM mm JOIN pg ON pg.curl = mm.url),
        |pr AS (SELECT a.cluster_key, a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  a.lang AS lang_a, b.lang AS lang_b,
        |  round(CAST(least(a.ln, b.ln) AS DOUBLE) / greatest(a.ln, b.ln), 4)
        |    AS len_ratio
        |  FROM mj a JOIN mj b ON a.cluster_key = b.cluster_key
        |    AND a.doc_id < b.doc_id
        |  WHERE a.lang <> b.lang AND a.dig <> b.dig)
        |SELECT cluster_key, doc_a, doc_b, lang_a, lang_b, len_ratio
        |FROM pr WHERE len_ratio >= 0.5
        |ORDER BY cluster_key, doc_a, doc_b""".stripMargin) { (s, _) =>
      WebFilters.translationPairs(translationPairsFixture(s.table("documents")))
        .orderBy("cluster_key", "doc_a", "doc_b")
    },

    // pagination chains (rel=next walking): roots via the anti-join rule
    // (a page no next pointer targets — NOT a position formula, so a
    // truncated first group still roots at its earliest page), bounded
    // walk, canonicalized pointers (www/utm variants still chain); the
    // oracle recomputes the canonical forms from the fixture construction
    // (the canonical chain itself is pinned by ta_url_filter) and walks
    // with a recursive CTE
    df("ta_pagination",
      """WITH RECURSIVE nd AS (SELECT doc_id, doc_id // 3 AS grp, doc_id % 3 AS pos
        |  FROM (SELECT doc_id FROM documents ORDER BY doc_id LIMIT 150) d),
        |no AS (SELECT doc_id AS d, 'https://site.org/art/' || grp || '/p' || pos AS cu,
        |  CASE WHEN pos < 2 THEN 'https://site.org/art/' || grp || '/p' || (pos + 1) END AS n
        |  FROM nd),
        |rt AS (SELECT * FROM no WHERE cu NOT IN
        |  (SELECT n FROM no WHERE n IS NOT NULL)),
        |g AS (SELECT cu AS chain_root, 0 AS hop, d AS doc_id,
        |    cu AS canonical_url, n AS nxt FROM rt
        |  UNION ALL
        |  SELECT g.chain_root, g.hop + 1, no.d, no.cu, no.n
        |  FROM g JOIN no ON no.cu = g.nxt WHERE g.hop < 5)
        |SELECT chain_root, CAST(hop AS INT) AS hop, doc_id, canonical_url
        |FROM g ORDER BY chain_root, hop""".stripMargin) { (s, _) =>
      WebFilters.paginationChains(paginationFixture(s.table("documents")))
        .orderBy("chain_root", "hop")
    },

    // chain merge: the reconstructed multi-page article — page count +
    // the md5 of hop-ordered newline-joined page content per chain
    df("ta_page_merge",
      """WITH RECURSIVE nd AS (SELECT doc_id, text, doc_id // 3 AS grp, doc_id % 3 AS pos
        |  FROM (SELECT * FROM documents ORDER BY doc_id LIMIT 150) d),
        |no AS (SELECT doc_id AS d, text, 'https://site.org/art/' || grp || '/p' || pos AS cu,
        |  CASE WHEN pos < 2 THEN 'https://site.org/art/' || grp || '/p' || (pos + 1) END AS n
        |  FROM nd),
        |rt AS (SELECT * FROM no WHERE cu NOT IN
        |  (SELECT n FROM no WHERE n IS NOT NULL)),
        |g AS (SELECT cu AS chain_root, 0 AS hop, d AS doc_id, text, n AS nxt FROM rt
        |  UNION ALL
        |  SELECT g.chain_root, g.hop + 1, no.d, no.text, no.n
        |  FROM g JOIN no ON no.cu = g.nxt WHERE g.hop < 5)
        |SELECT chain_root, CAST(count(*) AS BIGINT) AS n_pages,
        |  md5(string_agg(text, chr(10) ORDER BY hop)) AS content_digest
        |FROM g GROUP BY chain_root ORDER BY chain_root""".stripMargin) { (s, _) =>
      val docs = s.table("documents").orderBy("doc_id").limit(150)
      WebFilters.mergeChains(
          WebFilters.paginationChains(paginationFixture(s.table("documents"))),
          docs)
        .orderBy("chain_root")
    },

    // declared character encoding (HTML5 prescan rule: first charset=
    // inside any <meta> tag — both the charset attribute and the
    // http-equiv Content-Type parameter forms), composed with the
    // HTTP-layer charset which wins when both exist, utf-8 default
    df("ta_charset",
      s"""WITH cx AS (SELECT doc_id,
         |  CASE doc_id % 6
         |    WHEN 0 THEN '<html><head><meta charset="UTF-8"></head><body>x</body></html>'
         |    WHEN 1 THEN '<html><head><meta charset=iso-8859-1></head><body>x</body></html>'
         |    WHEN 2 THEN '<html><head><meta http-equiv="Content-Type" content="text/html; charset=Windows-1252"></head><body>x</body></html>'
         |    WHEN 3 THEN '<html><head><meta name="description" content="mentions charset=shift_jis"><meta charset="utf-8"><meta http-equiv="Content-Type" content="text/html; charset=latin-1"></head><body>x</body></html>'
         |    WHEN 4 THEN '<html><head><meta name="description" content="how to set charset=shift_jis"></head><body><p>charset=fake outside a meta tag</p></body></html>'
         |    ELSE '<HTML><HEAD><META CHARSET=''koi8-r''></HEAD></HTML>' END AS html,
         |  CASE doc_id % 4 WHEN 0 THEN 'utf-8' WHEN 2 THEN 'latin-1' ELSE '' END AS http_charset
         |  FROM (SELECT doc_id FROM documents ORDER BY doc_id LIMIT 150) d),
         |h0 AS (SELECT doc_id, http_charset,
         |  coalesce(regexp_extract(html,
         |    '(?is)<meta\\b[^>=]*?[\\s"'']charset\\s*=\\s*["'']?([A-Za-z0-9_.:-]+)', 1), '') AS attr,
         |  coalesce(regexp_extract(html,
         |    '(?is)<meta\\b[^>]*?[\\s"'']http-equiv\\s*=\\s*"content-type"[^>]*?[\\s"'']content\\s*=\\s*"([^"]*)"', 1), '') AS eq1,
         |  coalesce(regexp_extract(html,
         |    '(?is)<meta\\b[^>]*?[\\s"'']content\\s*=\\s*"([^"]*)"[^>]*?[\\s"'']http-equiv\\s*=\\s*"content-type"', 1), '') AS eq2
         |  FROM cx),
         |hc AS (SELECT doc_id, http_charset,
         |  lower(CASE WHEN attr <> '' THEN attr
         |    ELSE coalesce(regexp_extract(
         |      CASE WHEN eq1 <> '' THEN eq1 ELSE eq2 END,
         |      '(?i)charset[ \\t]*=[ \\t]*"?([A-Za-z0-9_.:-]+)', 1), '') END) AS html_charset
         |  FROM h0)
         |SELECT doc_id, http_charset, html_charset,
         |  coalesce(nullif(http_charset, ''), nullif(html_charset, ''), 'utf-8') AS effective
         |FROM hc ORDER BY doc_id""".stripMargin) { (s, _) =>
      val fx = charsetFixture(s.table("documents"))
      fx.select(col("doc_id"), col("http_charset"),
          WebFilters.htmlCharset(col("html")).as("html_charset"),
          coalesce(
            when(col("http_charset") === "", lit(null)).otherwise(col("http_charset")),
            when(WebFilters.htmlCharset(col("html")) === "", lit(null))
              .otherwise(WebFilters.htmlCharset(col("html"))),
            lit("utf-8")).as("effective"))
        .orderBy("doc_id")
    },

    // charset TRANSCODE gate — the stage that APPLIES the extracted
    // charset: real ISO-8859-1 / Windows-1252 / UTF-8 / malformed bytes
    // decode by the pinned precedence (HTTP charset > meta charset >
    // UTF-8 default) with a decode_ok verdict; the oracle rebuilds the
    // same blobs and replays the decode at the BYTE level (latin-1 via
    // hex->chr, cp1252 via the shared WHATWG table, utf-8 validity via
    // the shared RFC 3629 hex regex)
    df("ta_transcode",
      s"""WITH tx AS (SELECT doc_id,
         |  CASE doc_id % 8
         |    WHEN 0 THEN encode('<html><body>plain ' || doc_id || '</body></html>')
         |    WHEN 1 THEN encode('<html><head><meta charset="utf-8"></head><body>caf') || unhex('C3A9') || encode(' price ') || unhex('E282AC') || encode(' n=' || doc_id || '</body></html>')
         |    WHEN 2 THEN encode('<html><body>caf') || unhex('E9') || encode(' n=' || doc_id || '</body></html>')
         |    WHEN 3 THEN encode('<html><body>he said ') || unhex('93') || encode('hi') || unhex('94') || encode(' for ') || unhex('80') || encode('99 ') || unhex('81') || encode(' n=' || doc_id || '</body></html>')
         |    WHEN 4 THEN encode('<html><body>x') || unhex('E9') || encode('y n=' || doc_id || '</body></html>')
         |    WHEN 5 THEN encode('<html><head><meta charset="iso-8859-1"></head><body>caf') || unhex('E9') || encode(' n=' || doc_id || '</body></html>')
         |    WHEN 6 THEN encode('<html><head><meta charset="utf-8"></head><body>caf') || unhex('E9') || encode(' n=' || doc_id || '</body></html>')
         |    ELSE encode('<html><body>ascii only n=' || doc_id || '</body></html>') END AS bb,
         |  CASE doc_id % 8 WHEN 0 THEN 'utf-8' WHEN 2 THEN 'latin-1'
         |    WHEN 3 THEN 'windows-1252' WHEN 4 THEN 'utf-8'
         |    WHEN 6 THEN 'latin-1' WHEN 7 THEN 'shift_jis'
         |    ELSE '' END AS http_charset
         |  FROM (SELECT doc_id FROM documents ORDER BY doc_id LIMIT 150) d),
         |tcin AS (SELECT doc_id, ${DuckOracles.duckLatin1("bb")} AS pre,
         |  lower(hex(bb)) AS h, http_charset FROM tx),
         |${DuckOracles.duckTranscode("doc_id")}
         |SELECT doc_id, charset_used, decode_ok, text
         |FROM tcout ORDER BY doc_id""".stripMargin) { (s, _) =>
      WebFilters.transcode(transcodeFixture(s.table("documents")),
          bytesCol = "body_bytes", httpCharsetCol = "http_charset")
        .select("doc_id", "charset_used", "decode_ok", "text")
        .orderBy("doc_id")
    },

    // transcode INSIDE the WARC chain: archives read BYTE-PRESERVING
    // (latin-1 strings), the HTTP envelope gate extracts the header
    // charset, the raw bytes are recovered (encode latin-1 — exact
    // inverse of the read), and the transcode gate decodes each page by
    // the HTTP > meta > utf-8 precedence — a UTF-8 page arrives as
    // mojibake codepoints and leaves as real text, a latin-1/cp1252
    // page decodes by its header, a header-less page falls back to its
    // meta declaration. The oracle replays every stage on the same
    // codepoints via the shared warc/http/transcode fragments
    df("ta_warc_transcode",
      s"""WITH wsrc AS (SELECT doc_id FROM documents ORDER BY doc_id LIMIT 150),
         |pc AS (SELECT doc_id, doc_id // 10 AS file_id,
         |  'HTTP/1.1 200 OK' || chr(10) || 'Content-Type: ' ||
         |  CASE doc_id % 4 WHEN 0 THEN 'text/html; charset=UTF-8'
         |    WHEN 1 THEN 'text/html; charset=latin-1'
         |    WHEN 2 THEN 'text/html; charset=Windows-1252'
         |    ELSE 'text/html' END || chr(10) || chr(10) ||
         |  CASE doc_id % 4
         |    WHEN 0 THEN '<p>caf' || chr(195) || chr(169) || ' price ' || chr(194) || chr(163) || doc_id || '</p>'
         |    WHEN 1 THEN '<p>caf' || chr(233) || ' n=' || doc_id || '</p>'
         |    WHEN 2 THEN '<p>he said ' || chr(147) || 'hi' || chr(148) || ' for ' || chr(128) || doc_id || '</p>'
         |    ELSE '<html><head><meta charset="iso-8859-1"></head><body>caf' || chr(233) || ' n=' || doc_id || '</body></html>' END AS payload
         |  FROM wsrc),
         |rc AS (SELECT doc_id, file_id,
         |  'WARC/1.0' || chr(10) || 'WARC-Target-URI: https://docs.example.org/d/' || doc_id
         |  || chr(10) || 'Content-Length: ' || len(payload) || chr(10) || chr(10)
         |  || payload || chr(10) || chr(10) AS rec
         |  FROM pc),
         |$duckWarcFrames,
         |$duckWarcHttp,
         |tcin AS (SELECT CAST(regexp_extract(
         |    coalesce(regexp_extract(hdrs, '(?im)^WARC-Target-URI:\\s*(\\S+)', 1), ''),
         |    '/d/([0-9]+)$$', 1) AS BIGINT) AS doc_id,
         |  hb AS pre, ${DuckOracles.duckLatin1Hex("hb")} AS h,
         |  charset AS http_charset
         |  FROM hz WHERE CAST(nullif(st, '') AS INT) = 200 AND mime = 'text/html'),
         |${DuckOracles.duckTranscode("doc_id")}
         |SELECT doc_id, charset_used, decode_ok, text
         |FROM tcout ORDER BY doc_id""".stripMargin) { (s, _) =>
      val kept = WebFilters
        .warcHttp(warcTranscodeFixture(s.table("documents")), keepBody = true)
        .where(col("keep"))
      val pages = kept.select(
        regexp_extract(col("target_uri"), "/d/([0-9]+)$", 1).cast("long")
          .as("doc_id"),
        col("charset"),
        encode(col("http_body"), "ISO-8859-1").as("body_bytes"))
      WebFilters.transcode(pages, "body_bytes", "charset")
        .select("doc_id", "charset_used", "decode_ok", "text")
        .orderBy("doc_id")
    },

    // mojibake DETECTOR — the verdict for pages that arrive ALREADY
    // wrongly decoded (upstream of the byte-level transcode gate): the
    // fixture plants the classic UTF-8-read-as-cp1252 artifact pairs on
    // every 5th doc; detection is one regex pass over the shared
    // signature alternation, threshold 2 hits
    df("ta_mojibake",
      s"""WITH d AS (SELECT doc_id,
         |  text || CASE WHEN doc_id % 5 = 0
         |    THEN ' donâ€™t â€” cafÃ© naÃ¯ve Â» fin' ELSE '' END AS text
         |  FROM (SELECT doc_id, text FROM documents ORDER BY doc_id LIMIT 150) x),
         |m AS (SELECT doc_id, text,
         |  CAST(len(regexp_extract_all(text,
         |    '${WebFilters.MojibakePattern}')) AS BIGINT) AS n_artifacts
         |  FROM d)
         |SELECT doc_id, n_artifacts,
         |  round(n_artifacts * 100.0 / greatest(CAST(len(text) AS DOUBLE), 1.0), 4)
         |    AS artifact_rate,
         |  n_artifacts >= 2 AS mojibake
         |FROM m ORDER BY doc_id""".stripMargin) { (s, _) =>
      WebFilters.mojibakeScore(mojibakeFixture(s.table("documents")))
        .select("doc_id", "n_artifacts", "artifact_rate", "mojibake")
        .orderBy("doc_id")
    },

    // mojibake REPAIR — ftfy's fix_encoding inverse: Spark re-encodes
    // flagged text through the cp1252 it was wrongly decoded with
    // (inverse WHATWG translate + latin-1 byte identity) and re-decodes
    // the bytes as UTF-8; the oracle replays the SAME repair as the
    // explicit artifact->char mapping, so the digest pins that the
    // byte-level roundtrip lands exactly on the true characters
    df("ta_mojibake_repair",
      s"""WITH d AS (SELECT doc_id,
         |  text || CASE WHEN doc_id % 5 = 0
         |    THEN ' donâ€™t â€” cafÃ© naÃ¯ve Â» fin' ELSE '' END AS text
         |  FROM (SELECT doc_id, text FROM documents ORDER BY doc_id LIMIT 150) x),
         |m AS (SELECT doc_id, text,
         |  CAST(len(regexp_extract_all(text,
         |    '${WebFilters.MojibakePattern}')) AS BIGINT) AS n FROM d)
         |SELECT doc_id, n >= 2 AS repaired,
         |  md5(CASE WHEN n >= 2 THEN
         |    replace(replace(replace(replace(replace(text,
         |      'â€™', '’'), 'â€”', '—'), 'Ã©', 'é'), 'Ã¯', 'ï'), 'Â»', '»')
         |  ELSE text END) AS repaired_digest
         |FROM m ORDER BY doc_id""".stripMargin) { (s, _) =>
      WebFilters.mojibakeRepair(mojibakeFixture(s.table("documents")))
        .select(col("doc_id"), col("repaired"),
          md5(col("text_repaired")).as("repaired_digest"))
        .orderBy("doc_id")
    },

    // the round-16 stack END TO END in one query: WARC bytes -> HTTP
    // envelope gate (404s drop) -> main-content extraction on the parsed
    // bodies -> meta-robots index/follow verdicts -> nofollow-aware
    // outlink counts. Every stage replayed in DuckDB on the same bytes
    // via the shared warc/http/extract fragments
    df("ta_warc_e2e",
      s"""WITH $duckHtmlFixtureCore,
         |mx AS (SELECT doc_id, html || CASE doc_id % 6
         |  WHEN 0 THEN '<meta name="robots" content="noindex, nofollow">'
         |  WHEN 1 THEN '<meta content="nofollow" name="robots">'
         |  WHEN 2 THEN '<meta name="ROBOTS" content="NONE">'
         |  WHEN 3 THEN '<meta name="robots" content="noindexing, follow"><meta name="description" content="noindex">'
         |  WHEN 4 THEN '<meta data-name="robots" content="noindex">'
         |  ELSE '<meta name="robots" content="noindex nofollow">' END ||
         |  '<p><a rel="nofollow" href="/paid">sponsored link</a></p>' AS html
         |  FROM hsrc),
         |pc AS (SELECT doc_id, doc_id // 10 AS file_id,
         |  CASE WHEN doc_id % 7 = 0
         |    THEN 'HTTP/1.1 404 Not Found' || chr(10) || 'Content-Type: text/html'
         |      || chr(10) || chr(10) || 'gone: ' || doc_id
         |    ELSE 'HTTP/1.1 200 OK' || chr(10) || 'Content-Type: text/html; charset=UTF-8'
         |      || chr(10) || chr(10) || html END AS payload
         |  FROM mx),
         |rc AS (SELECT doc_id, file_id,
         |  'WARC/1.0' || chr(10) || 'WARC-Target-URI: https://docs.example.org/d/' || doc_id
         |  || chr(10) || 'Content-Length: ' || len(payload) || chr(10) || chr(10)
         |  || payload || chr(10) || chr(10) AS rec
         |  FROM pc),
         |$duckWarcFrames,
         |$duckWarcHttp,
         |fx AS (SELECT CAST(regexp_extract(
         |    coalesce(regexp_extract(hdrs, '(?im)^WARC-Target-URI:\\s*(\\S+)', 1), ''),
         |    '/d/([0-9]+)$$', 1) AS BIGINT) AS doc_id, hb AS html
         |  FROM hz WHERE CAST(nullif(st, '') AS INT) = 200 AND mime = 'text/html'),
         |$duckHtmlExtract,
         |mc2 AS (SELECT doc_id, list_concat(
         |  regexp_extract_all(html, '(?is)<meta\\b[^>]*?[\\s"'']name\\s*=\\s*"robots"[^>]*?[\\s"'']content\\s*=\\s*"([^"]*)"', 1),
         |  regexp_extract_all(html, '(?is)<meta\\b[^>]*?[\\s"'']content\\s*=\\s*"([^"]*)"[^>]*?[\\s"'']name\\s*=\\s*"robots"', 1)) AS cs
         |  FROM fx),
         |md2 AS (SELECT doc_id,
         |  len(list_filter(cs, c -> regexp_matches(lower(c), '(^|[\\s,])\\s*(noindex|none)\\s*([\\s,]|$$)'))) > 0 AS noindex,
         |  len(list_filter(cs, c -> regexp_matches(lower(c), '(^|[\\s,])\\s*(nofollow|none)\\s*([\\s,]|$$)'))) > 0 AS nofollow
         |  FROM mc2),
         |tg2 AS (SELECT f.doc_id,
         |  unnest(regexp_extract_all(f.html, '(?is)<a\\b[^>]*?[\\s"'']href\\s*=\\s*"[^"]*"[^>]*>', 0)) AS tag
         |  FROM fx f JOIN md2 USING (doc_id) WHERE NOT md2.nofollow),
         |tk2 AS (SELECT doc_id FROM tg2 WHERE NOT regexp_matches(
         |  lower(coalesce(regexp_extract(tag, '(?is)[\\s"'']rel\\s*=\\s*"([^"]*)"', 1), '')),
         |  '(^|[\\s,])nofollow([\\s,]|$$)')),
         |fl2 AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_follow_links
         |  FROM tk2 GROUP BY doc_id)
         |SELECT ag.doc_id, ag.kept_blocks, md5(ag.body) AS content_digest,
         |  md2.noindex, md2.nofollow,
         |  coalesce(fl2.n_follow_links, 0) AS n_follow_links
         |FROM ag JOIN md2 USING (doc_id) LEFT JOIN fl2 USING (doc_id)
         |ORDER BY doc_id""".stripMargin) { (s, _) =>
      val kept = WebFilters
        .warcHttp(warcE2eFixture(s.table("documents")), keepBody = true)
        .where(col("keep"))
      val pages = kept.select(
        regexp_extract(col("target_uri"), "/d/([0-9]+)$", 1).cast("long")
          .as("doc_id"),
        col("target_uri").as("base_url"), col("http_body").as("html"))
      val ex = WebFilters.htmlExtract(pages)
        .select("doc_id", "kept_blocks", "content_digest")
      val meta = pages.select(col("doc_id"),
        WebFilters.metaNoindex(col("html")).as("noindex"),
        WebFilters.metaNofollow(col("html")).as("nofollow"))
      val fl = WebFilters.followLinks(pages).groupBy("doc_id")
        .agg(count(lit(1)).as("n_follow_links"))
      ex.join(meta, "doc_id").join(fl, Seq("doc_id"), "left")
        .select(col("doc_id"), col("kept_blocks"), col("content_digest"),
          col("noindex"), col("nofollow"),
          coalesce(col("n_follow_links"), lit(0L)).as("n_follow_links"))
        .orderBy("doc_id")
    },

    // robots.txt rules applied to the crawl frontier, RFC 9309: Allow +
    // Disallow patterns of the wildcard agent's group(s) (consecutive
    // user-agent lines share one rule block), most-specific-match
    // precedence (raw pattern length) with Allow winning equal-length
    // ties — Disallow: / + Allow: /banner/1 blocks everything on the ad
    // host except the /banner/1* tree; the multi-UA static.example.org
    // group blocks /img/ where nearest-preceding-agent parsing would
    // have missed it, with the WILDCARD Allow: /img/photo1* punching
    // the photo1x set back out; Disallow: /a/1$ shows the end anchor
    // (re-blocks exactly /a/1, not /a/10)
    df("ta_robots_filter",
      s"""WITH $duckUrlFixture,
         |$duckUrlCanonical,
         |rb AS (SELECT * FROM (VALUES
         |  ('example.com', '# demo' || chr(10) || 'User-agent: googlebot'
         |    || chr(10) || 'Disallow: /g/' || chr(10) || '' || chr(10)
         |    || 'User-agent: *' || chr(10) || 'Disallow: /a/'
         |    || chr(10) || 'Allow: /a/1' || chr(10) || 'Disallow: /a/1$$'
         |    || chr(10) || 'Disallow: /private/' || chr(10) || 'Disallow:'),
         |  ('ads.example.com', 'User-agent: *' || chr(10) || 'Disallow: /'
         |    || chr(10) || 'Allow: /banner/1'),
         |  ('static.example.org', 'User-agent: *' || chr(10)
         |    || 'User-agent: imagebot' || chr(10) || 'Disallow: /img/'
         |    || chr(10) || 'Allow: /img/photo1*')
         |  ) AS t(host, body)),
         |$duckRobotsRules,
         |mt AS (SELECT c.doc_id, c.url, c.host, c.path, r.prefix, r.allow
         |  FROM cx c LEFT JOIN rr r ON r.host = c.host
         |    AND (CASE WHEN r.special AND r.anch THEN regexp_matches(c.path, r.rx)
         |      WHEN r.special THEN regexp_matches(c.path || '/', r.rx)
         |      ELSE substring(c.path || '/', 1, len(r.prefix)) = r.prefix END)),
         |mx AS (SELECT *, max(len(prefix))
         |    OVER (PARTITION BY doc_id, url, host, path) AS ml FROM mt)
         |SELECT doc_id, url, host, path,
         |  coalesce(NOT bool_or(allow) FILTER (WHERE len(prefix) = ml), false)
         |    AS robots_blocked
         |FROM mx GROUP BY doc_id, url, host, path
         |ORDER BY doc_id""".stripMargin) { (s, _) =>
      import s.implicits._
      val robots = Seq(
        ("example.com", "# demo\nUser-agent: googlebot\nDisallow: /g/\n\n" +
          "User-agent: *\nDisallow: /a/\nAllow: /a/1\nDisallow: /a/1$\n" +
          "Disallow: /private/\nDisallow:"),
        ("ads.example.com", "User-agent: *\nDisallow: /\nAllow: /banner/1"),
        ("static.example.org",
          "User-agent: *\nUser-agent: imagebot\nDisallow: /img/\n" +
            "Allow: /img/photo1*"))
        .toDF("host", "body")
      WebFilters.robotsFilter(urlFixture(s.table("documents")),
          WebFilters.robotsRules(robots))
        .select(col("doc_id"), col("url"), col("host"), col("path"),
          col("robots_blocked"))
        .orderBy("doc_id")
    },

    // Sitemap: discovery lines from robots.txt — where real sitemap
    // discovery starts (robots -> index -> children -> pages). RFC 9309
    // §2.3: a non-group directive, so it binds file-wide regardless of
    // surrounding user-agent groups; case-insensitive key, comments
    // strip, empty values and duplicates drop
    df("ta_robots_sitemaps",
      s"""WITH rsl AS (SELECT doc_id,
         |  'h' || (doc_id % 5) || '.example.org' AS host,
         |  CASE doc_id % 4
         |    WHEN 0 THEN 'Sitemap: https://h' || (doc_id % 5) ||
         |      '.example.org/sm/' || doc_id || '.xml'
         |    WHEN 1 THEN 'SITEMAP:https://h' || (doc_id % 5) ||
         |      '.example.org/sm/' || doc_id || '.xml  # discovered'
         |    WHEN 2 THEN 'Sitemap: https://h' || (doc_id % 5) ||
         |      '.example.org/index.xml'
         |    ELSE 'Disallow: /x/' || doc_id END AS line
         |  FROM (SELECT doc_id FROM documents ORDER BY doc_id LIMIT 200) d),
         |rsb AS (SELECT host, 'User-agent: *' || chr(10) || 'Sitemap:'
         |    || chr(10) || string_agg(line, chr(10) ORDER BY doc_id) AS body
         |  FROM rsl GROUP BY host),
         |rsx AS (SELECT host, unnest(ls) AS l0
         |  FROM (SELECT host, regexp_split_to_array(body, '\\r?\\n') AS ls
         |    FROM rsb) z),
         |rst AS (SELECT host, regexp_replace(regexp_replace(l0, '#.*', ''),
         |    '^\\s+|\\s+$$', '', 'g') AS ln FROM rsx),
         |rss AS (SELECT DISTINCT host, regexp_replace(substring(ln, 9),
         |    '^\\s+|\\s+$$', '', 'g') AS sitemap_url
         |  FROM rst WHERE lower(ln) LIKE 'sitemap:%'
         |    AND regexp_replace(substring(ln, 9), '^\\s+|\\s+$$', '', 'g') <> '')
         |SELECT host, sitemap_url FROM rss
         |ORDER BY host, sitemap_url""".stripMargin) { (s, _) =>
      val id5 = (col("doc_id") % 5).cast("string")
      val id = col("doc_id").cast("string")
      val line = when(col("doc_id") % 4 === 0,
          concat(lit("Sitemap: https://h"), id5, lit(".example.org/sm/"),
            id, lit(".xml")))
        .when(col("doc_id") % 4 === 1,
          concat(lit("SITEMAP:https://h"), id5, lit(".example.org/sm/"),
            id, lit(".xml  # discovered")))
        .when(col("doc_id") % 4 === 2,
          concat(lit("Sitemap: https://h"), id5, lit(".example.org/index.xml")))
        .otherwise(concat(lit("Disallow: /x/"), id))
      val robots = s.table("documents").orderBy("doc_id").limit(200)
        .select(col("doc_id"),
          concat(lit("h"), id5, lit(".example.org")).as("host"),
          line.as("line"))
        .groupBy("host")
        .agg(concat(lit("User-agent: *\nSitemap:\n"),
          concat_ws("\n", transform(
            array_sort(collect_list(struct(col("doc_id"), col("line")))),
            x => x.getField("line")))).as("body"))
      WebFilters.robotsSitemaps(robots).orderBy("host", "sitemap_url")
    },

    // per-host politeness plan: the crawl budget composed with robots
    // Crawl-delay (wildcard-agent group semantics, strict numeric
    // grammar, max across groups) — est_seconds = how long this host's
    // budgeted frontier slice takes at its declared delay; hosts
    // declaring none (or garbage) stay NULL for the scheduler's default
    df("ta_crawl_politeness",
      s"""WITH $duckAnchorFixture,
         |$duckAnchors,
         |${duckCanonicalChain("doc_id, text")},
         |fr AS (SELECT canonical_url, CAST(min(doc_id) AS BIGINT) AS keeper,
         |    CAST(count(*) AS BIGINT) AS group_size
         |  FROM cx WHERE url IS NOT NULL AND canonical_url IS NOT NULL
         |    AND scheme IN ('http', 'https')
         |  GROUP BY canonical_url),
         |hb AS (SELECT *, regexp_replace(
         |    lower(coalesce(regexp_extract(regexp_replace(canonical_url, '#.*', ''),
         |      '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1), '')),
         |    '^www\\.', '') AS host FROM fr),
         |rn AS (SELECT *, row_number() OVER (PARTITION BY host
         |    ORDER BY group_size DESC, canonical_url ASC) AS rk FROM hb),
         |bq AS (SELECT host, CAST(count(*) AS BIGINT) AS n_urls
         |  FROM rn WHERE rk <= 3 GROUP BY host),
         |cdl AS (SELECT doc_id, 'h' || doc_id || '.example.org' AS host,
         |  CASE doc_id % 3
         |    WHEN 0 THEN 'User-agent: *' || chr(10) || 'Crawl-delay: ' || (doc_id + 1)
         |    WHEN 1 THEN 'User-agent: a' || chr(10) || 'User-agent: *' || chr(10)
         |      || 'Crawl-delay: 0.5' || chr(10) || '' || chr(10)
         |      || 'User-agent: *' || chr(10) || 'Crawl-delay: 2'
         |    ELSE 'User-agent: *' || chr(10) || 'Crawl-delay: fast' END AS body
         |  FROM (SELECT doc_id FROM documents ORDER BY doc_id LIMIT 7) d),
         |cl0 AS (SELECT host, unnest(ls) AS l0, generate_subscripts(ls, 1) AS pos
         |  FROM (SELECT host, regexp_split_to_array(body, '\\r?\\n') AS ls
         |    FROM cdl) z),
         |cne AS (SELECT host, pos, line, lower(line) AS low FROM (
         |  SELECT host, pos, regexp_replace(regexp_replace(l0, '#.*', ''),
         |    '^\\s+|\\s+$$', '', 'g') AS line FROM cl0) t
         |  WHERE line <> ''),
         |cgf AS (SELECT host, pos, line, low,
         |  CASE WHEN low LIKE 'user-agent:%' AND NOT coalesce(
         |      lag(low LIKE 'user-agent:%') OVER (PARTITION BY host ORDER BY pos),
         |      false) THEN 1 ELSE 0 END AS sg
         |  FROM cne),
         |cgl AS (SELECT host, pos, line, low,
         |  sum(sg) OVER (PARTITION BY host ORDER BY pos) AS grp FROM cgf),
         |cua AS (SELECT DISTINCT host, grp FROM cgl WHERE low LIKE 'user-agent:%'
         |  AND regexp_replace(substring(line, 12), '^\\s+|\\s+$$', '', 'g') = '*'),
         |cdv AS (SELECT g.host, regexp_replace(substring(g.line, 13),
         |    '^\\s+|\\s+$$', '', 'g') AS v
         |  FROM cgl g JOIN cua ON cua.host = g.host AND cua.grp = g.grp
         |  WHERE g.low LIKE 'crawl-delay:%'),
         |cdd AS (SELECT host, max(CAST(v AS DOUBLE)) AS crawl_delay FROM cdv
         |  WHERE regexp_matches(v, '^[0-9]+(\\.[0-9]+)?$$') GROUP BY host)
         |SELECT bq.host, bq.n_urls, cdd.crawl_delay,
         |  round(bq.n_urls * cdd.crawl_delay, 4) AS est_seconds
         |FROM bq LEFT JOIN cdd ON cdd.host = bq.host
         |ORDER BY bq.host""".stripMargin) { (s, _) =>
      val fx = WebFilters.anchorFixture(s.table("documents"))
      val budget = WebFilters.crawlBudget(
        WebFilters.urlDedup(
          WebFilters.urlFilter(WebFilters.htmlLinks(fx)).where(col("keep"))),
        cap = 3)
      val k = col("doc_id")
      val robots = s.table("documents").orderBy("doc_id").limit(7)
        .select(concat(lit("h"), k.cast("string"), lit(".example.org"))
            .as("host"),
          when(k % 3 === 0,
            concat(lit("User-agent: *\nCrawl-delay: "), (k + 1).cast("string")))
          .when(k % 3 === 1, lit("User-agent: a\nUser-agent: *\n" +
            "Crawl-delay: 0.5\n\nUser-agent: *\nCrawl-delay: 2"))
          .otherwise(lit("User-agent: *\nCrawl-delay: fast")).as("body"))
      budget.groupBy("host").agg(count(lit(1)).as("n_urls"))
        .join(WebFilters.robotsCrawlDelay(robots), Seq("host"), "left")
        .withColumn("est_seconds",
          round(col("n_urls") * col("crawl_delay"), 4))
        .orderBy("host")
    },

    // the WHOLE crawl loop in one query: outlinks -> URL filter ->
    // RFC 9309 robots verdict (wildcards + Allow precedence live inside
    // the composition) -> canonical dedup -> per-host budget = the next
    // polite frontier. Per-host rules exercise all three verdict shapes:
    // directory Disallow, Disallow-all + Allow carve-out, wildcard
    df("ta_crawl_loop",
      s"""WITH $duckAnchorFixture,
         |$duckAnchors,
         |${duckCanonicalChain("doc_id, text")},
         |kept AS (SELECT row_number() OVER (ORDER BY doc_id, url) AS rid,
         |    doc_id, url, scheme, host, path, canonical_url
         |  FROM cx
         |  WHERE url IS NOT NULL AND canonical_url IS NOT NULL
         |    AND scheme IN ('http', 'https')
         |    AND NOT (host IN ('ads.example.com', 'tracker.example.net', 'doubleclick.net', 'adservice.example.org')
         |      OR host LIKE '%.ads.example.com' OR host LIKE '%.tracker.example.net'
         |      OR host LIKE '%.doubleclick.net' OR host LIKE '%.adservice.example.org')
         |    AND NOT regexp_matches(lower(path), '\\.(jpe?g|png|gif|webp|bmp|ico|svg|css|js|mjs|woff2?|ttf|mp[34]|avi|mov|mkv|zip|tar|gz|tgz|rar|7z|exe|dmg|iso|pdf)$$')),
         |rb AS (SELECT 'h' || doc_id || '.example.org' AS host,
         |  CASE doc_id % 3
         |    WHEN 0 THEN 'User-agent: *' || chr(10) || 'Disallow: /p/'
         |    WHEN 1 THEN 'User-agent: *' || chr(10) || 'Disallow: /'
         |      || chr(10) || 'Allow: /q/'
         |    ELSE 'User-agent: *' || chr(10) || 'Disallow: /r*' END AS body
         |  FROM (SELECT doc_id FROM documents ORDER BY doc_id LIMIT 7) d),
         |$duckRobotsRules,
         |mt AS (SELECT k.rid, k.doc_id, k.url, k.host, k.path, k.canonical_url,
         |    r.prefix, r.allow
         |  FROM kept k LEFT JOIN rr r ON r.host = k.host
         |    AND (CASE WHEN r.special AND r.anch THEN regexp_matches(k.path, r.rx)
         |      WHEN r.special THEN regexp_matches(k.path || '/', r.rx)
         |      ELSE substring(k.path || '/', 1, len(r.prefix)) = r.prefix END)),
         |mx AS (SELECT *, max(len(prefix)) OVER (PARTITION BY rid) AS ml
         |  FROM mt),
         |vd AS (SELECT rid, doc_id, canonical_url,
         |  coalesce(NOT bool_or(allow) FILTER (WHERE len(prefix) = ml), false)
         |    AS robots_blocked
         |  FROM mx GROUP BY rid, doc_id, canonical_url),
         |fr AS (SELECT canonical_url, CAST(min(doc_id) AS BIGINT) AS keeper,
         |    CAST(count(*) AS BIGINT) AS group_size
         |  FROM vd WHERE NOT robots_blocked GROUP BY canonical_url),
         |hb AS (SELECT *, regexp_replace(
         |    lower(coalesce(regexp_extract(regexp_replace(canonical_url, '#.*', ''),
         |      '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1), '')),
         |    '^www\\.', '') AS host FROM fr),
         |rn AS (SELECT *, row_number() OVER (PARTITION BY host
         |    ORDER BY group_size DESC, canonical_url ASC) AS rk FROM hb)
         |SELECT canonical_url, keeper, group_size, host,
         |  CAST(rk AS BIGINT) AS rk
         |FROM rn WHERE rk <= 2 ORDER BY host, rk""".stripMargin) { (s, _) =>
      val fx = WebFilters.anchorFixture(s.table("documents"))
      val k = col("doc_id")
      val robots = s.table("documents").orderBy("doc_id").limit(7)
        .select(concat(lit("h"), k.cast("string"), lit(".example.org"))
            .as("host"),
          when(k % 3 === 0, lit("User-agent: *\nDisallow: /p/"))
            .when(k % 3 === 1, lit("User-agent: *\nDisallow: /\nAllow: /q/"))
            .otherwise(lit("User-agent: *\nDisallow: /r*")).as("body"))
      val filtered = WebFilters.urlFilter(WebFilters.htmlLinks(fx))
        .where(col("keep"))
      val polite = WebFilters
        .robotsFilter(filtered, WebFilters.robotsRules(robots))
        .where(!col("robots_blocked"))
      WebFilters.crawlBudget(WebFilters.urlDedup(polite), cap = 2)
        .orderBy("host", "rk")
    },

    // canonical-URL dedup: keep-first per canonical form — scheme/port/
    // case/tracking-param/fragment variants of the same page collapse
    df("dd_url_dedup",
      s"""WITH $duckUrlFixture,
         |$duckUrlCanonical
         |SELECT canonical_url, CAST(min(doc_id) AS BIGINT) AS keeper,
         |  CAST(count(*) AS BIGINT) AS group_size
         |FROM cx WHERE canonical_url IS NOT NULL
         |GROUP BY canonical_url ORDER BY canonical_url""".stripMargin) { (s, _) =>
      WebFilters.urlDedup(urlFixture(s.table("documents")))
        .orderBy("canonical_url")
    },

    // anchor-text profile per link target: the off-page relevance signal
    // (what OTHER pages call this page) — dominant text = highest count,
    // ties to the lexicographically smallest text
    df("ta_anchor_text",
      s"""WITH $duckAnchorFixture,
         |$duckAnchors,
         |${duckCanonicalChain("doc_id, text")},
         |at AS (SELECT canonical_url, text FROM cx
         |  WHERE canonical_url IS NOT NULL),
         |ag2 AS (SELECT canonical_url, text, count(*) AS cnt
         |  FROM at GROUP BY 1, 2),
         |sel AS (SELECT canonical_url, text, cnt, row_number() OVER
         |  (PARTITION BY canonical_url ORDER BY cnt DESC, text ASC) AS rn
         |  FROM ag2 WHERE text <> ''),
         |tot AS (SELECT canonical_url, CAST(sum(cnt) AS BIGINT) AS n_anchors,
         |  CAST(count(*) FILTER (WHERE text <> '') AS BIGINT) AS n_texts
         |  FROM ag2 GROUP BY 1)
         |SELECT t.canonical_url AS canonical_url, t.n_anchors, t.n_texts,
         |  s.text AS top_text, CAST(s.cnt AS BIGINT) AS top_count
         |FROM tot t LEFT JOIN sel s
         |  ON s.canonical_url = t.canonical_url AND s.rn = 1
         |ORDER BY t.canonical_url""".stripMargin) { (s, _) =>
      WebFilters.anchorText(
          WebFilters.htmlAnchors(WebFilters.anchorFixture(s.table("documents"))))
        .orderBy("canonical_url")
    },

    // host authority: weighted PageRank over the cross-host link graph
    // (self-loops excluded) — the crawl-prioritization signal, same shared
    // PageRank as the service-dependency centrality
    df("ta_host_rank",
      s"""WITH $duckAnchorFixture,
         |$duckAnchors,
         |${duckCanonicalChain("doc_id, text")},
         |e AS (SELECT 'h' || (doc_id % 7) || '.example.org' AS src,
         |    host AS dst, count(*) AS w
         |  FROM cx WHERE url IS NOT NULL AND host <> ''
         |    AND host <> 'h' || (doc_id % 7) || '.example.org'
         |  GROUP BY 1, 2),
         |${DuckOracles.pageRank2("h")}
         |SELECT h AS host, rank FROM r2 ORDER BY host""".stripMargin) { (s, _) =>
      WebFilters.hostRank(
          WebFilters.htmlAnchors(WebFilters.anchorFixture(s.table("documents"))),
          iters = 2)
        .orderBy("host")
    },

    // per-host crawl budget: the politeness/fairness gate — frontier
    // capped at 3 URLs per host, most-linked first, canonical-URL
    // tiebreak
    df("ta_crawl_budget",
      s"""WITH $duckAnchorFixture,
         |$duckAnchors,
         |${duckCanonicalChain("doc_id, text")},
         |fr AS (SELECT canonical_url, CAST(min(doc_id) AS BIGINT) AS keeper,
         |    CAST(count(*) AS BIGINT) AS group_size
         |  FROM cx WHERE url IS NOT NULL AND canonical_url IS NOT NULL
         |    AND scheme IN ('http', 'https')
         |  GROUP BY canonical_url),
         |hb AS (SELECT *, regexp_replace(
         |    lower(coalesce(regexp_extract(regexp_replace(canonical_url, '#.*', ''),
         |      '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1), '')),
         |    '^www\\.', '') AS host FROM fr),
         |rn AS (SELECT *, row_number() OVER (PARTITION BY host
         |    ORDER BY group_size DESC, canonical_url ASC) AS rk FROM hb)
         |SELECT canonical_url, keeper, group_size, host,
         |  CAST(rk AS BIGINT) AS rk
         |FROM rn WHERE rk <= 3 ORDER BY host, rk""".stripMargin) { (s, _) =>
      val fx = WebFilters.anchorFixture(s.table("documents"))
      WebFilters.crawlBudget(
          WebFilters.urlDedup(
            WebFilters.urlFilter(WebFilters.htmlLinks(fx)).where(col("keep"))),
          cap = 3)
        .orderBy("host", "rk")
    },

    // crawl snapshot delta: per canonical URL new / gone / changed /
    // unchanged between two crawls — the incremental-recrawl planner
    df("ta_crawl_delta",
      """WITH base AS (SELECT doc_id, text
        |  FROM (SELECT * FROM documents ORDER BY doc_id LIMIT 200) d),
        |prev AS (SELECT doc_id,
        |  'https://docs.example.org/d/' || doc_id AS url, text FROM base),
        |curr AS (
        |  SELECT doc_id, 'https://docs.example.org/d/' || doc_id AS url,
        |    CASE WHEN doc_id % 7 = 0 THEN text || ' updated' ELSE text END AS text
        |  FROM base WHERE doc_id % 11 <> 3
        |  UNION ALL
        |  SELECT doc_id, 'https://docs.example.org/n/' || doc_id AS url,
        |    upper(text) AS text FROM base WHERE doc_id % 13 = 1),
        |ps AS (SELECT url AS canonical_url,
        |  md5(coalesce(text, '')) AS prev_digest FROM prev),
        |cs AS (SELECT url AS canonical_url,
        |  md5(coalesce(text, '')) AS curr_digest FROM curr)
        |SELECT coalesce(ps.canonical_url, cs.canonical_url) AS canonical_url,
        |  CASE WHEN ps.prev_digest IS NULL THEN 'new'
        |    WHEN cs.curr_digest IS NULL THEN 'gone'
        |    WHEN ps.prev_digest = cs.curr_digest THEN 'unchanged'
        |    ELSE 'changed' END AS status,
        |  ps.prev_digest, cs.curr_digest
        |FROM ps FULL OUTER JOIN cs ON ps.canonical_url = cs.canonical_url
        |ORDER BY canonical_url""".stripMargin) { (s, _) =>
      val base = s.table("documents").orderBy("doc_id").limit(200)
        .select(col("doc_id"), col("text"))
      val prev = base.select(col("doc_id"),
        concat(lit("https://docs.example.org/d/"),
          col("doc_id").cast("string")).as("url"), col("text"))
      val curr = base.where(col("doc_id") % 11 =!= 3)
        .select(col("doc_id"),
          concat(lit("https://docs.example.org/d/"),
            col("doc_id").cast("string")).as("url"),
          when(col("doc_id") % 7 === 0, concat(col("text"), lit(" updated")))
            .otherwise(col("text")).as("text"))
        .unionAll(base.where(col("doc_id") % 13 === 1)
          .select(col("doc_id"),
            concat(lit("https://docs.example.org/n/"),
              col("doc_id").cast("string")).as("url"),
            upper(col("text")).as("text")))
      WebFilters.crawlDelta(prev, curr).orderBy("canonical_url")
    },

    // sitemap parsing (the crawl DISCOVERY channel beside links): per-host
    // urlset bodies round-tripped to entry rows — entity-decoded loc,
    // optional lastmod/changefreq/priority, loc-less entries skipped
    df("ta_sitemap_parse",
      s"""WITH $duckSitemapFixture,
         |$duckSitemapEntries
         |SELECT host, loc, lastmod, changefreq, priority
         |FROM se ORDER BY host, loc""".stripMargin) { (s, _) =>
      WebFilters.sitemapParse(sitemapFixture(s.table("documents")))
        .orderBy("host", "loc")
    },

    // sitemap-driven recrawl schedule: due = never crawled OR declared
    // lastmod strictly later than the stored crawl time (ISO dates —
    // lexicographic IS chronological)
    df("ta_sitemap_recrawl",
      s"""WITH $duckSitemapFixture,
         |$duckSitemapEntries,
         |ux AS (SELECT 0 AS doc_id, loc AS url, lastmod FROM se),
         |${duckCanonicalChain("doc_id, lastmod")},
         |store AS (SELECT 'https://h' || (doc_id % 5) || '.example.org/page/'
         |    || doc_id AS u0, '2026-01-10' AS crawled_at
         |  FROM (SELECT doc_id FROM documents ORDER BY doc_id LIMIT 200) d
         |  WHERE doc_id % 2 = 0),
         |sx AS (SELECT u0 AS cu, max(crawled_at) AS crawled_at
         |  FROM store GROUP BY u0)
         |SELECT cx.canonical_url, cx.lastmod, sx.crawled_at,
         |  (sx.crawled_at IS NULL OR (cx.lastmod IS NOT NULL
         |    AND cx.lastmod > sx.crawled_at)) AS due
         |FROM cx LEFT JOIN sx ON sx.cu = cx.canonical_url
         |WHERE cx.canonical_url IS NOT NULL
         |ORDER BY canonical_url""".stripMargin) { (s, _) =>
      val entries = WebFilters.sitemapParse(
        sitemapFixture(s.table("documents")))
      val crawled = s.table("documents").orderBy("doc_id").limit(200)
        .where(col("doc_id") % 2 === 0)
        .select(concat(lit("https://h"), (col("doc_id") % 5).cast("string"),
            lit(".example.org/page/"), col("doc_id").cast("string")).as("url"),
          lit("2026-01-10").as("crawled_at"))
      WebFilters.sitemapRecrawl(entries, crawled)
        .select("canonical_url", "lastmod", "crawled_at", "due")
        .orderBy("canonical_url")
    },

    // sitemap INDEX files (where real discovery starts: robots.txt ->
    // index -> child sitemaps -> pages): per-host sitemapindex bodies
    // parsed to child-sitemap rows, composed with the SAME recrawl
    // schedule — due = child never fetched OR index-declared lastmod
    // newer than the stored fetch time
    df("ta_sitemap_index",
      s"""WITH $duckSitemapIndex,
         |ux AS (SELECT 0 AS doc_id, loc AS url, lastmod FROM six),
         |${duckCanonicalChain("doc_id, lastmod")},
         |store AS (SELECT 'https://h' || (doc_id % 5) || '.example.org/sm/'
         |    || doc_id AS u0, '2026-02-10' AS fetched_at
         |  FROM (SELECT doc_id FROM documents ORDER BY doc_id LIMIT 200) d
         |  WHERE doc_id % 2 = 0),
         |sx AS (SELECT u0 AS cu, max(fetched_at) AS crawled_at
         |  FROM store GROUP BY u0)
         |SELECT cx.canonical_url, cx.lastmod, sx.crawled_at,
         |  (sx.crawled_at IS NULL OR (cx.lastmod IS NOT NULL
         |    AND cx.lastmod > sx.crawled_at)) AS due
         |FROM cx LEFT JOIN sx ON sx.cu = cx.canonical_url
         |WHERE cx.canonical_url IS NOT NULL
         |ORDER BY canonical_url""".stripMargin) { (s, _) =>
      val children = WebFilters.sitemapIndex(
        sitemapIndexFixture(s.table("documents")))
      val fetched = s.table("documents").orderBy("doc_id").limit(200)
        .where(col("doc_id") % 2 === 0)
        .select(concat(lit("https://h"), (col("doc_id") % 5).cast("string"),
            lit(".example.org/sm/"), col("doc_id").cast("string")).as("url"),
          lit("2026-02-10").as("crawled_at"))
      WebFilters.sitemapRecrawl(children, fetched)
        .select("canonical_url", "lastmod", "crawled_at", "due")
        .orderBy("canonical_url")
    },

    // declared-canonical dedup: pages grouped by their own rel=canonical
    // target (both attribute orders, entity decode, tracking params
    // strip) — the variant sets syntactic canonicalization can't see
    df("dd_rel_canonical",
      s"""WITH rc AS (SELECT doc_id,
         |  'https://self.example.org/d/' || doc_id AS url0,
         |  '<html><head>' || CASE doc_id % 4
         |    WHEN 0 THEN '<link rel="canonical" href="https://c.example.org/p/'
         |      || (doc_id // 4) || '"/>'
         |    WHEN 1 THEN '<link href="https://c.example.org/p/' || (doc_id // 4)
         |      || '" rel="canonical"/>'
         |    WHEN 2 THEN '<link rel="canonical" href="https://c.example.org/p/'
         |      || (doc_id // 4) || '?utm_source=x&amp;fbclid=z"/>'
         |    ELSE '' END || '</head><body></body></html>' AS html
         |  FROM (SELECT doc_id FROM documents ORDER BY doc_id LIMIT 200) d),
         |dx AS (SELECT doc_id, url0,
         |  replace(replace(replace(replace(replace(replace(
         |    CASE WHEN coalesce(regexp_extract(html,
         |      '(?is)<link\\b[^>]*?[\\s"'']rel\\s*=\\s*"canonical"[^>]*?[\\s"'']href\\s*=\\s*"([^"]*)"', 1), '') <> ''
         |    THEN regexp_extract(html,
         |      '(?is)<link\\b[^>]*?[\\s"'']rel\\s*=\\s*"canonical"[^>]*?[\\s"'']href\\s*=\\s*"([^"]*)"', 1)
         |    ELSE coalesce(regexp_extract(html,
         |      '(?is)<link\\b[^>]*?[\\s"'']href\\s*=\\s*"([^"]*)"[^>]*?[\\s"'']rel\\s*=\\s*"canonical"', 1), '') END,
         |    '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&#39;', chr(39)),
         |    '&nbsp;', ' '), '&amp;', '&') AS decl
         |  FROM rc),
         |ux AS (SELECT doc_id,
         |  CASE WHEN decl <> '' THEN decl ELSE url0 END AS url FROM dx),
         |$duckUrlCanonical
         |SELECT canonical_url AS canonical_target,
         |  CAST(min(doc_id) AS BIGINT) AS keeper,
         |  CAST(count(*) AS BIGINT) AS group_size
         |FROM cx WHERE canonical_url IS NOT NULL
         |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, _) =>
      val grp = floor(col("doc_id") / 4).cast("long").cast("string")
      val pages = s.table("documents").orderBy("doc_id").limit(200)
        .select(col("doc_id"),
          concat(lit("https://self.example.org/d/"),
            col("doc_id").cast("string")).as("url"),
          concat(lit("<html><head>"),
            when(col("doc_id") % 4 === 0,
              concat(lit("<link rel=\"canonical\" href=\"https://c.example.org/p/"),
                grp, lit("\"/>")))
              .when(col("doc_id") % 4 === 1,
                concat(lit("<link href=\"https://c.example.org/p/"), grp,
                  lit("\" rel=\"canonical\"/>")))
              .when(col("doc_id") % 4 === 2,
                concat(lit("<link rel=\"canonical\" href=\"https://c.example.org/p/"),
                  grp, lit("?utm_source=x&amp;fbclid=z\"/>")))
              .otherwise(lit("")),
            lit("</head><body></body></html>")).as("html"))
      WebFilters.relCanonicalDedup(pages).orderBy("canonical_target")
    })

  /** Spark-side sitemap fixture (mirrors [[duckSitemapFixture]] byte for
    * byte): five hosts, one urlset body per host built from the docs —
    * entries carry an entity-escaped query, optional lastmod/changefreq/
    * priority by doc_id residue, plus one loc-less entry per host that
    * the parser must skip. */
  private def sitemapFixture(docs: org.apache.spark.sql.DataFrame) = {
    val id = col("doc_id").cast("string")
    val entry = concat(
      lit("<url><loc>https://h"), (col("doc_id") % 5).cast("string"),
      lit(".example.org/page/"), id,
      when(col("doc_id") % 4 === 1, lit("?a=1&amp;b=2")).otherwise(lit("")),
      lit("</loc>"),
      when(col("doc_id") % 3 === 0, lit(""))
        .otherwise(concat(lit("<lastmod>2026-01-"),
          lpad(((col("doc_id") % 27) + 1).cast("string"), 2, "0"),
          lit("</lastmod>"))),
      when(col("doc_id") % 4 === 2, lit("<changefreq>daily</changefreq>"))
        .when(col("doc_id") % 4 === 3, lit("<changefreq>weekly</changefreq>"))
        .otherwise(lit("")),
      when(col("doc_id") % 2 === 1,
        concat(lit("<priority>0."), (col("doc_id") % 10).cast("string"),
          lit("</priority>"))).otherwise(lit("")),
      lit("</url>"))
    docs.orderBy("doc_id").limit(200)
      .select(col("doc_id"),
        concat(lit("h"), (col("doc_id") % 5).cast("string"),
          lit(".example.org")).as("host"),
        entry.as("rec"))
      .groupBy("host")
      .agg(concat(
        lit("<?xml version=\"1.0\"?><urlset>" +
          "<url><lastmod>2026-01-01</lastmod></url>"),
        concat_ws("", transform(
          array_sort(collect_list(struct(col("doc_id"), col("rec")))),
          x => x.getField("rec"))),
        lit("</urlset>")).as("body"))
  }

  /** Spark-side WARC+HTTP fixture (mirrors ta_warc_http's pc/rc CTEs
    * byte for byte): 15 files of WARC response records whose payloads
    * are raw HTTP responses — six shapes per doc_id mod 6 exercising
    * status / media type / charset / redirect / non-HTML / no-envelope. */
  private def warcHttpFixture(docs: org.apache.spark.sql.DataFrame) = {
    val id = col("doc_id").cast("string")
    val payload = when(col("doc_id") % 6 === 0, concat(
        lit("HTTP/1.1 200 OK\nContent-Type: text/html; charset=UTF-8\n\n" +
          "<html><body><p>"), col("text"), lit("</p></body></html>")))
      .when(col("doc_id") % 6 === 1, concat(
        lit("HTTP/1.1 200 OK\nContent-Type: TEXT/HTML\n\n"), col("text")))
      .when(col("doc_id") % 6 === 2, concat(
        lit("HTTP/1.1 404 Not Found\nContent-Type: text/html; " +
          "charset=\"latin-1\"\n\nnot found: "), id))
      .when(col("doc_id") % 6 === 3, concat(
        lit("HTTP/1.1 301 Moved Permanently\n" +
          "Location: https://docs.example.org/d/"), id, lit("\n\n")))
      .when(col("doc_id") % 6 === 4, concat(
        lit("HTTP/1.1 200 OK\nContent-Type: image/png\n\nPNGPIX"), id))
      .otherwise(concat(lit("plain capture without envelope "), col("text")))
    val recs = docs.orderBy("doc_id").limit(150)
      .select(col("doc_id"),
        floor(col("doc_id") / 10).cast("long").as("file_id"),
        payload.as("payload"))
      .select(col("doc_id"), col("file_id"), concat(
        lit("WARC/1.0\nWARC-Type: response\nWARC-Target-URI: " +
          "https://docs.example.org/d/"), col("doc_id").cast("string"),
        lit("\nContent-Length: "), length(col("payload")).cast("string"),
        lit("\n\n"), col("payload"), lit("\n\n")).as("rec"))
    recs.groupBy("file_id").agg(
      concat_ws("", transform(
        array_sort(collect_list(struct(col("doc_id"), col("rec")))),
        x => x.getField("rec"))).as("body"))
  }

  /** Spark twin of ta_meta_robots' mx suffix — one meta-robots shape per
    * doc_id mod 6 (both attribute orders, case, 'none', the token and
    * name/data-name decoys, and the space-separated directive list real
    * crawlers accept). */
  private def metaRobotsHtml(docId: Column): Column =
    when(docId % 6 === 0,
      lit("<meta name=\"robots\" content=\"noindex, nofollow\">"))
      .when(docId % 6 === 1,
        lit("<meta content=\"nofollow\" name=\"robots\">"))
      .when(docId % 6 === 2, lit("<meta name=\"ROBOTS\" content=\"NONE\">"))
      .when(docId % 6 === 3,
        lit("<meta name=\"robots\" content=\"noindexing, follow\">" +
          "<meta name=\"description\" content=\"noindex\">"))
      .when(docId % 6 === 4,
        lit("<meta data-name=\"robots\" content=\"noindex\">"))
      .otherwise(lit("<meta name=\"robots\" content=\"noindex nofollow\">"))

  /** Spark-side fixture for ta_follow_links (mirrors its nf CTE byte for
    * byte): per page five anchors — plain keep, rel=nofollow drop,
    * multi-token rel drop, rel=noopener keep, data-rel decoy keep — and
    * a page-level meta nofollow on every doc_id % 7 == 0 page. */
  private def followLinksFixture(docs: org.apache.spark.sql.DataFrame) = {
    val id = col("doc_id")
    def host(off: Int) =
      concat(lit("https://h"), ((id + off) % 7).cast("string"),
        lit(".example.org"))
    docs.orderBy("doc_id").limit(150).select(col("doc_id"),
      concat(host(0), lit("/d/"), id.cast("string")).as("base_url"),
      concat(
        lit("<html><body>"),
        when(id % 7 === 0,
          lit("<meta name=\"robots\" content=\"nofollow\">")).otherwise(lit("")),
        lit("<p><a href=\""), host(1), lit("/f/"), (id % 20).cast("string"),
        lit("\">f</a> <a rel=\"nofollow\" href=\""), host(2), lit("/g/"),
        (id % 10).cast("string"),
        lit("\">g</a> <a href=\"/local/"), (id % 5).cast("string"),
        lit("\" rel=\"noopener nofollow\">l</a> <a href=\""), host(3),
        lit("/k/"), (id % 4).cast("string"),
        lit("\" rel=\"noopener\">k</a> <a data-rel=\"nofollow\" " +
          "href=\"/keep/"), (id % 3).cast("string"),
        lit("\">d</a></p></body></html>")).as("html"))
  }

  /** Shared DuckDB hreflang fixture (mirrors [[hreflangFixture]] byte
    * for byte): 50 translation sets of three pages (en/de/fr by doc_id
    * mod 3), each page declaring all three alternates + an x-default —
    * attribute-order swap on de, multi-token rel on fr, a
    * canonicalization exercise (www/case/utm/entity) on en — plus
    * stylesheet and hreflang-less feed decoys. Ends at hfx(doc_id, html) — hfx, not hx: the canonical chain's own hx CTE would collide. */
  // lazy: declared after `all` in source order, so a strict val would
  // still be null while `all`'s query SQL interpolates it
  private lazy val duckHreflangFixture =
    """hfx AS (SELECT doc_id,
      |  '<html><head><link rel="alternate" hreflang="en" href="https://www.Example.COM/en/page/' ||
      |  (doc_id // 3) || '?utm_source=x&amp;b=2">' ||
      |  '<link hreflang="DE" href="https://example.com/de/page/' || (doc_id // 3) || '" rel="alternate">' ||
      |  '<link rel="alternate stylesheet" hreflang="fr" href="https://example.com/fr/page/' || (doc_id // 3) || '">' ||
      |  '<link rel="alternate" hreflang="x-default" href="https://example.com/en/page/' || (doc_id // 3) || '?b=2">' ||
      |  '<link rel="stylesheet" href="/css/x.css"><link rel="alternate" href="/feed.xml">' ||
      |  '</head><body>p</body></html>' AS html
      |  FROM (SELECT doc_id FROM documents ORDER BY doc_id LIMIT 150) d)""".stripMargin

  /** Spark twin of [[duckHreflangFixture]]. */
  private def hreflangFixture(docs: org.apache.spark.sql.DataFrame) = {
    val grp = floor(col("doc_id") / 3).cast("long").cast("string")
    docs.orderBy("doc_id").limit(150).select(col("doc_id"),
      lit("https://h.example.org/x").as("base_url"),
      concat(
        lit("<html><head><link rel=\"alternate\" hreflang=\"en\" " +
          "href=\"https://www.Example.COM/en/page/"), grp,
        lit("?utm_source=x&amp;b=2\">" +
          "<link hreflang=\"DE\" href=\"https://example.com/de/page/"), grp,
        lit("\" rel=\"alternate\">" +
          "<link rel=\"alternate stylesheet\" hreflang=\"fr\" " +
          "href=\"https://example.com/fr/page/"), grp,
        lit("\"><link rel=\"alternate\" hreflang=\"x-default\" " +
          "href=\"https://example.com/en/page/"), grp,
        lit("?b=2\"><link rel=\"stylesheet\" href=\"/css/x.css\">" +
          "<link rel=\"alternate\" href=\"/feed.xml\">" +
          "</head><body>p</body></html>")).as("html"))
  }

  /** Spark-side fixture for dd_translation_pairs (mirrors its px chain):
    * 50 translation sets of three pages (en/de/fr by doc_id mod 3), each
    * page AT its canonical variant URL with deterministic per-language
    * text — the de page copies the en text verbatim on every 5th group
    * (the digest gate must drop that pair) and the fr page is a 5-token
    * stub on every 4th group (the length-ratio gate must drop its
    * pairs). All four alternates (en/de/fr/x-default→en) declared on
    * every page. */
  private def translationPairsFixture(docs: org.apache.spark.sql.DataFrame) = {
    val grp = floor(col("doc_id") / 3).cast("long")
    val m = col("doc_id") % 3
    val grpS = grp.cast("string")
    val plang = when(m === 0, lit("en")).when(m === 1, lit("de"))
      .otherwise(lit("fr"))
    def alt(lang: String, path: String) = concat(
      lit("<link rel=\"alternate\" hreflang=\"" + lang +
        "\" href=\"https://example.com/" + path + "/p/"), grpS, lit("\">"))
    docs.orderBy("doc_id").limit(150)
      .withColumn("__grp", grp).withColumn("__m", m)
      .select(col("doc_id"),
        concat(lit("https://example.com/"), plang, lit("/p/"), grpS)
          .as("base_url"),
        concat(lit("<html><head>"), alt("en", "en"), alt("de", "de"),
          alt("fr", "fr"), alt("x-default", "en"),
          lit("</head><body>p</body></html>")).as("html"),
        expr("CASE WHEN __m = 0 THEN repeat(concat('en', __grp, ' '), " +
          "CAST(20 + __grp % 7 AS INT)) " +
          "WHEN __m = 1 THEN CASE WHEN __grp % 5 = 0 THEN " +
          "repeat(concat('en', __grp, ' '), CAST(20 + __grp % 7 AS INT)) " +
          "ELSE repeat(concat('de', __grp, ' '), CAST(18 + __grp % 7 AS INT)) END " +
          "ELSE CASE WHEN __grp % 4 = 0 THEN repeat(concat('fr', __grp, ' '), 5) " +
          "ELSE repeat(concat('fr', __grp, ' '), CAST(22 + __grp % 7 AS INT)) " +
          "END END").as("text"))
  }

  /** Spark-side WARC e2e fixture (mirrors ta_warc_e2e's mx/pc/rc chain
    * byte for byte): the html fixture pages plus the meta-robots arm and
    * a rel=nofollow sponsor anchor, wrapped as HTTP responses (every 7th
    * page a 404 the gate must drop) inside WARC records, 10 per file. */
  private def warcE2eFixture(docs: org.apache.spark.sql.DataFrame) = {
    val id = col("doc_id").cast("string")
    val pg = WebFilters.htmlFixture(docs)
      .withColumn("html", concat(col("html"), metaRobotsHtml(col("doc_id")),
        lit("<p><a rel=\"nofollow\" href=\"/paid\">sponsored link</a></p>")))
    val payload = when(col("doc_id") % 7 === 0,
      concat(lit("HTTP/1.1 404 Not Found\nContent-Type: text/html\n\ngone: "),
        id))
      .otherwise(concat(
        lit("HTTP/1.1 200 OK\nContent-Type: text/html; charset=UTF-8\n\n"),
        col("html")))
    val recs = pg.select(col("doc_id"),
        floor(col("doc_id") / 10).cast("long").as("file_id"),
        payload.as("payload"))
      .select(col("doc_id"), col("file_id"), concat(
        lit("WARC/1.0\nWARC-Target-URI: https://docs.example.org/d/"), id,
        lit("\nContent-Length: "), length(col("payload")).cast("string"),
        lit("\n\n"), col("payload"), lit("\n\n")).as("rec"))
    recs.groupBy("file_id").agg(
      concat_ws("", transform(
        array_sort(collect_list(struct(col("doc_id"), col("rec")))),
        x => x.getField("rec"))).as("body"))
  }

  /** Spark-side WARC fixture for ta_warc_transcode (mirrors its pc/rc
    * CTEs codepoint for codepoint): 200-status pages whose payload
    * strings are BYTE-PRESERVING latin-1 reads — a UTF-8 page shows as
    * mojibake codepoints (C3 A9 for the é byte pair), a latin-1 page as
    * é, a cp1252 page as the raw C1 codepoints — with the charset
    * declared in the Content-Type header (or, on the mod-3 arm, only in
    * a meta tag). */
  private def warcTranscodeFixture(docs: org.apache.spark.sql.DataFrame) = {
    val id = col("doc_id").cast("string")
    val m = col("doc_id") % 4
    val body = when(m === 0,
      concat(lit("<p>cafÃ© price Â£"), id, lit("</p>")))
      .when(m === 1, concat(lit("<p>café n="), id, lit("</p>")))
      .when(m === 2,
        concat(lit("<p>he said hi for "), id, lit("</p>")))
      .otherwise(concat(
        lit("<html><head><meta charset=\"iso-8859-1\"></head><body>café n="),
        id, lit("</body></html>")))
    val ct = when(m === 0, lit("text/html; charset=UTF-8"))
      .when(m === 1, lit("text/html; charset=latin-1"))
      .when(m === 2, lit("text/html; charset=Windows-1252"))
      .otherwise(lit("text/html"))
    val payload = concat(lit("HTTP/1.1 200 OK\nContent-Type: "), ct,
      lit("\n\n"), body)
    docs.orderBy("doc_id").limit(150)
      .select(col("doc_id"),
        floor(col("doc_id") / 10).cast("long").as("file_id"),
        concat(
          lit("WARC/1.0\nWARC-Target-URI: https://docs.example.org/d/"), id,
          lit("\nContent-Length: "), length(payload).cast("string"),
          lit("\n\n"), payload, lit("\n\n")).as("rec"))
      .groupBy("file_id").agg(
        concat_ws("", transform(
          array_sort(collect_list(struct(col("doc_id"), col("rec")))),
          x => x.getField("rec"))).as("body"))
  }

  /** Spark-side pagination fixture: 50 three-page article chains (grp =
    * doc_id/3, position = doc_id%3), each non-final page declaring a
    * rel=next whose href needs CANONICALIZATION to chain (www host +
    * tracking param), the final page carrying data-rel and rel=prev
    * decoys relNext must ignore. The oracle recomputes the canonical
    * node/pointer forms from this construction. */
  private def paginationFixture(docs: org.apache.spark.sql.DataFrame) = {
    val grp = floor(col("doc_id") / 3).cast("long").cast("string")
    val pos = (col("doc_id") % 3).cast("string")
    val nextPos = ((col("doc_id") % 3) + 1).cast("string")
    docs.orderBy("doc_id").limit(150).select(col("doc_id"),
      concat(lit("https://Site.ORG/art/"), grp, lit("/p"), pos).as("url"),
      concat(lit("<html><head>"),
        when(col("doc_id") % 3 < 2,
          concat(lit("<link rel=\"next\" href=\"https://www.site.org/art/"),
            grp, lit("/p"), nextPos, lit("?utm_source=feed\">")))
          .otherwise(lit("<link data-rel=\"next\" href=\"/decoy\">" +
            "<link rel=\"prev\" href=\"/prev-decoy\">")),
        lit("</head><body>x</body></html>")).as("html"))
  }

  /** Spark-side fixture for ta_base_href (base-tag shape per doc_id mod
    * 5, three links per page — path-relative, root-relative, absolute;
    * the mod-4 arm declares an unresolvable mailto: base that must fall
    * back to the document URL). */
  private def baseHrefFixture(docs: org.apache.spark.sql.DataFrame) = {
    val id = col("doc_id")
    val baseTag = when(id % 5 === 1,
      lit("<base href=\"https://cdn.example.net/assets/\">"))
      .when(id % 5 === 2, lit("<base href=\"/b2/\">"))
      .when(id % 5 === 3, lit("<base href=\"sub/\">"))
      .when(id % 5 === 4, lit("<base href=\"mailto:nobody\">"))
      .otherwise(lit(""))
    docs.orderBy("doc_id").limit(150).select(col("doc_id"),
      concat(lit("https://h"), (id % 7).cast("string"),
        lit(".example.org/d/"), id.cast("string")).as("base_url"),
      concat(lit("<html><head>"), baseTag,
        lit("</head><body><p><a href=\"p"), (id % 3).cast("string"),
        lit(".html\">a</a> <a href=\"/r/"), (id % 4).cast("string"),
        lit("\">b</a> <a href=\"https://abs.example.org/z\">c</a>" +
          "</p></body></html>")).as("html"))
  }

  /** Spark-side fixture for ta_charset (mirrors its cx CTE byte for
    * byte): six meta-charset shapes — quoted/unquoted attribute,
    * http-equiv parameter, first-wins double declaration, an out-of-tag
    * decoy, single quotes + upper case — plus the HTTP-layer charset
    * column per doc_id mod 4. */
  private def charsetFixture(docs: org.apache.spark.sql.DataFrame) = {
    val id = col("doc_id")
    docs.orderBy("doc_id").limit(150).select(col("doc_id"),
      when(id % 6 === 0, lit(
        "<html><head><meta charset=\"UTF-8\"></head><body>x</body></html>"))
        .when(id % 6 === 1, lit(
          "<html><head><meta charset=iso-8859-1></head><body>x</body></html>"))
        .when(id % 6 === 2, lit(
          "<html><head><meta http-equiv=\"Content-Type\" content=\"text/html; " +
            "charset=Windows-1252\"></head><body>x</body></html>"))
        .when(id % 6 === 3, lit(
          "<html><head><meta name=\"description\" content=\"mentions " +
            "charset=shift_jis\"><meta charset=\"utf-8\">" +
            "<meta http-equiv=\"Content-Type\" " +
            "content=\"text/html; charset=latin-1\"></head><body>x</body></html>"))
        .when(id % 6 === 4, lit(
          "<html><head><meta name=\"description\" content=\"how to set " +
            "charset=shift_jis\"></head><body><p>charset=fake outside " +
            "a meta tag</p></body></html>"))
        .otherwise(lit("<HTML><HEAD><META CHARSET='koi8-r'></HEAD></HTML>"))
        .as("html"),
      when(id % 4 === 0, lit("utf-8"))
        .when(id % 4 === 2, lit("latin-1"))
        .otherwise(lit("")).as("http_charset"))
  }

  /** Spark-side fixture for ta_mojibake / ta_mojibake_repair (mirrors
    * their d CTE byte for byte): every 5th doc gets the classic
    * UTF-8-read-as-cp1252 artifact suffix (curly apostrophe, em-dash,
    * two accented-latin pairs, guillemet). */
  private def mojibakeFixture(docs: org.apache.spark.sql.DataFrame) =
    docs.orderBy("doc_id").limit(150).select(col("doc_id"),
      when(col("doc_id") % 5 === 0,
        concat(col("text"), lit(" donâ€™t â€” cafÃ© naÃ¯ve Â» fin")))
        .otherwise(col("text")).as("text"))

  /** Spark-side byte fixture for ta_transcode (mirrors its tx CTE byte
    * for byte): eight charset shapes over REAL bytes — plain ascii,
    * multibyte utf-8 under a meta declaration, latin-1, windows-1252
    * (curly quotes, euro, one undefined C1 byte), malformed-utf-8
    * labeled utf-8, meta-declared iso-8859-1, HTTP-beats-meta, and an
    * unknown label (shift_jis). */
  private def transcodeFixture(docs: org.apache.spark.sql.DataFrame) = {
    val id = col("doc_id")
    val ids = id.cast("string")
    def asc(c: Column) = encode(c, "UTF-8")
    def hx(h: String) = unhex(lit(h))
    val tail = asc(concat(lit(" n="), ids, lit("</body></html>")))
    val body = when(id % 8 === 0,
      asc(concat(lit("<html><body>plain "), ids, lit("</body></html>"))))
      .when(id % 8 === 1, concat(
        asc(lit("<html><head><meta charset=\"utf-8\"></head><body>caf")),
        hx("C3A9"), asc(lit(" price ")), hx("E282AC"), tail))
      .when(id % 8 === 2,
        concat(asc(lit("<html><body>caf")), hx("E9"), tail))
      .when(id % 8 === 3, concat(asc(lit("<html><body>he said ")),
        hx("93"), asc(lit("hi")), hx("94"), asc(lit(" for ")), hx("80"),
        asc(lit("99 ")), hx("81"), tail))
      .when(id % 8 === 4,
        concat(asc(lit("<html><body>x")), hx("E9"),
          asc(concat(lit("y n="), ids, lit("</body></html>")))))
      .when(id % 8 === 5, concat(
        asc(lit("<html><head><meta charset=\"iso-8859-1\"></head><body>caf")),
        hx("E9"), tail))
      .when(id % 8 === 6, concat(
        asc(lit("<html><head><meta charset=\"utf-8\"></head><body>caf")),
        hx("E9"), tail))
      .otherwise(asc(concat(lit("<html><body>ascii only n="), ids,
        lit("</body></html>"))))
    val http = when(id % 8 === 0, lit("utf-8"))
      .when(id % 8 === 2, lit("latin-1"))
      .when(id % 8 === 3, lit("windows-1252"))
      .when(id % 8 === 4, lit("utf-8"))
      .when(id % 8 === 6, lit("latin-1"))
      .when(id % 8 === 7, lit("shift_jis"))
      .otherwise(lit(""))
    docs.orderBy("doc_id").limit(150)
      .select(id, body.as("body_bytes"), http.as("http_charset"))
  }

  /** Spark-side sitemap-INDEX fixture (mirrors [[duckSitemapIndex]]'s
    * smi chain byte for byte): five hosts, one sitemapindex body per
    * host listing the host's child sitemap files — entity-escaped query
    * on %4==1 children, lastmod missing on %3==0, one loc-less entry
    * per host that the parser must skip. */
  private def sitemapIndexFixture(docs: org.apache.spark.sql.DataFrame) = {
    val id = col("doc_id").cast("string")
    val entry = concat(
      lit("<sitemap><loc>https://h"), (col("doc_id") % 5).cast("string"),
      lit(".example.org/sm/"), id,
      when(col("doc_id") % 4 === 1, lit("?a=1&amp;b=2")).otherwise(lit("")),
      lit("</loc>"),
      when(col("doc_id") % 3 === 0, lit(""))
        .otherwise(concat(lit("<lastmod>2026-02-"),
          lpad(((col("doc_id") % 27) + 1).cast("string"), 2, "0"),
          lit("</lastmod>"))),
      lit("</sitemap>"))
    docs.orderBy("doc_id").limit(200)
      .select(col("doc_id"),
        concat(lit("h"), (col("doc_id") % 5).cast("string"),
          lit(".example.org")).as("host"),
        entry.as("rec"))
      .groupBy("host")
      .agg(concat(
        lit("<?xml version=\"1.0\"?><sitemapindex>" +
          "<sitemap><lastmod>2026-01-01</lastmod></sitemap>"),
        concat_ws("", transform(
          array_sort(collect_list(struct(col("doc_id"), col("rec")))),
          x => x.getField("rec"))),
        lit("</sitemapindex>")).as("body"))
  }
}
