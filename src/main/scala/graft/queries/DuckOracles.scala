package graft.queries

/** Shared DuckDB oracle fragments used by more than one registry query —
  * factored for the same reason the Scala side shares `Graphs.pageRank`:
  * a replay fix applied to one copy must not silently miss the other. */
object DuckOracles {

  /** Two synchronous weighted-PageRank rounds over a prior CTE
    * `e(src, dst, w)`, replaying [[graft.operators.Graphs.pageRank]]'s
    * exact contract: uniform start, decimal 0.15 teleport over n,
    * per-round inflow as a SUM of integer micro-unit contributions
    * (round(c·1e12) cast to BIGINT — order-insensitive, so the engines
    * agree without any sorted fold), round(6) per round. Both `round`s
    * are half-away-from-zero on positive doubles in both engines.
    * `nodeCol` names the node column in the emitted CTEs; the chain
    * ends at r2($nodeCol, rank). Used by the service-centrality,
    * host-rank, and TextRank oracles.
    *
    * NOTE this fragment is the iters=2 pin ONLY: the Scala
    * `Graphs.pageRank(iters = k)` parameter is oracle-covered solely at
    * k = 2 (every registry caller uses the default); a non-default
    * iters run is outside cross-engine coverage by construction. */
  def pageRank2(nodeCol: String): String =
    s"""nodes AS (SELECT src AS $nodeCol FROM e UNION SELECT dst FROM e),
       |nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
       |ow AS (SELECT src, CAST(sum(w) AS DOUBLE) AS ow FROM e GROUP BY src),
       |r0 AS (SELECT $nodeCol, 1.0 / nn.n AS rank FROM nodes CROSS JOIN nn),
       |c1 AS (SELECT e.dst, r0.rank * e.w / ow.ow AS c
       |  FROM e JOIN ow USING (src) JOIN r0 ON r0.$nodeCol = e.src),
       |i1 AS (SELECT dst, sum(CAST(round(c * 1e12) AS BIGINT)) / 1e12 AS infl
       |  FROM c1 GROUP BY dst),
       |r1 AS (SELECT $nodeCol, round(0.15 / nn.n
       |    + 0.85 * coalesce(i1.infl, 0), 6) AS rank
       |  FROM nodes CROSS JOIN nn LEFT JOIN i1 ON i1.dst = nodes.$nodeCol),
       |c2 AS (SELECT e.dst, r1.rank * e.w / ow.ow AS c
       |  FROM e JOIN ow USING (src) JOIN r1 ON r1.$nodeCol = e.src),
       |i2 AS (SELECT dst, sum(CAST(round(c * 1e12) AS BIGINT)) / 1e12 AS infl
       |  FROM c2 GROUP BY dst),
       |r2 AS (SELECT $nodeCol, round(0.15 / nn.n
       |    + 0.85 * coalesce(i2.infl, 0), 6) AS rank
       |  FROM nodes CROSS JOIN nn LEFT JOIN i2 ON i2.dst = nodes.$nodeCol)"""
      .stripMargin

  /** Shared hashed bag-of-words embedding chain (replays
    * [[graft.operators.TextAnalysis.hashEmbedding]] at dims=64 over the
    * `documents` table, salt "he"): md5-slot feature hashing, ±1 signs,
    * L2-normalize, round(4). Ends at hemb(doc_id, embedding). Used by
    * the embedding dump and the image-text alignment oracle. */
  val hashEmbedding64: String =
    """hetk AS (SELECT doc_id, list_filter(
      |  regexp_split_to_array(lower(text), '\s+'), x -> len(x) > 0) AS w
      |  FROM documents),
      |hetx AS (SELECT doc_id, unnest(w) AS t FROM hetk),
      |hesx AS (SELECT doc_id,
      |  CAST(floor(CAST(list_sum(list_transform(generate_series(1, 8),
      |    i -> (strpos('0123456789abcdef',
      |      substring(md5(concat('he', t)), i, 1)) - 1)
      |      * 16.0 ** (8 - i))) AS DOUBLE) / 4294967296.0 * 64) AS INT) AS slot,
      |  CASE WHEN CAST(list_sum(list_transform(generate_series(1, 8),
      |    i -> (strpos('0123456789abcdef',
      |      substring(md5(concat('hes', t)), i, 1)) - 1)
      |      * 16.0 ** (8 - i))) AS DOUBLE) / 4294967296.0 < 0.5
      |    THEN 1.0 ELSE -1.0 END AS sgn FROM hetx),
      |hecnt AS (SELECT doc_id, slot, sum(sgn) AS s FROM hesx GROUP BY doc_id, slot),
      |heds AS (SELECT DISTINCT doc_id FROM hecnt),
      |hegrid AS (SELECT doc_id, d FROM heds CROSS JOIN generate_series(0, 63) t(d)),
      |heraw AS (SELECT g.doc_id, list(coalesce(c.s, 0.0) ORDER BY g.d) AS raw
      |  FROM hegrid g LEFT JOIN hecnt c ON c.doc_id = g.doc_id AND c.slot = g.d
      |  GROUP BY g.doc_id),
      |hen AS (SELECT doc_id, raw,
      |  sqrt(list_sum(list_transform(raw, x -> x * x))) AS nrm FROM heraw),
      |hemb AS (SELECT doc_id, CASE WHEN nrm > 0
      |  THEN list_transform(raw, x -> round(x / nrm, 4))
      |  ELSE list_transform(raw, x -> 0.0) END AS embedding
      |  FROM hen)""".stripMargin

  /** Luhn validity of a card-candidate string expression (separators
    * stripped, 13–19 digits, ISO/IEC 7812 checksum ≡ 0 mod 10) — the
    * DuckDB replay of [[graft.operators.CorpusFilters.luhnChecksum]],
    * digit-for-digit: from the right, every second digit doubles with
    * the carry-9 rule. Usable inside a lambda (pass the lambda variable
    * name as `cand`). */
  def duckLuhnValid(cand: String): String = {
    val ds = s"regexp_replace($cand, '[ -]', '', 'g')"
    s"len($ds) BETWEEN 13 AND 19 AND list_sum(list_transform(" +
      s"generate_series(1, len($ds)), i -> CASE WHEN (len($ds) - i) % 2 = 1" +
      s" THEN CASE WHEN CAST(substring($ds, i, 1) AS INT) > 4" +
      s" THEN CAST(substring($ds, i, 1) AS INT) * 2 - 9" +
      s" ELSE CAST(substring($ds, i, 1) AS INT) * 2 END" +
      s" ELSE CAST(substring($ds, i, 1) AS INT) END)) % 10 = 0"
  }

  /** ISO-8859-1 decode of a DuckDB BLOB expression — bytes map 1:1 to
    * codepoints (the byte-preserving decode
    * [[graft.operators.WebFilters.transcode]] uses for its prescan and
    * its fallback). Hex pairs → codepoint → chr, concatenated in order;
    * empty blob → ''. */
  def duckLatin1(blob: String): String =
    s"coalesce(list_aggregate(list_transform(generate_series(1, " +
      s"octet_length($blob)), i -> chr(CAST(16 * (strpos('0123456789abcdef'," +
      s" substr(lower(hex($blob)), 2*i-1, 1)) - 1) + strpos(" +
      s"'0123456789abcdef', substr(lower(hex($blob)), 2*i, 1)) - 1 AS INT))" +
      s"), 'string_agg', ''), '')"

  /** Lowercase hex of the latin-1 BYTES of a string whose codepoints are
    * all ≤ U+00FF (the byte-preserving read contract: such a string IS
    * a byte sequence). Inverse of [[duckLatin1]]; empty string → ''. */
  def duckLatin1Hex(str: String): String =
    s"coalesce(list_aggregate(list_transform(generate_series(1, " +
      s"length($str)), i -> substr('0123456789abcdef', " +
      s"unicode(substr($str, i, 1)) // 16 + 1, 1) || " +
      s"substr('0123456789abcdef', unicode(substr($str, i, 1)) % 16 + 1, 1)" +
      s"), 'string_agg', ''), '')"

  /** WHATWG windows-1252 C1 remap of an already-latin-1-decoded string —
    * the same 27-entry table as the Scala side
    * ([[graft.operators.WebFilters.Cp1252Map]], the single source), so
    * the two translate calls cannot drift. */
  def duckCp1252(expr: String): String = {
    val from = graft.operators.WebFilters.Cp1252Map
      .map(p => s"chr(${p._1})").mkString(" || ")
    val to = graft.operators.WebFilters.Cp1252Map
      .map(p => s"chr(${p._2})").mkString(" || ")
    s"translate($expr, $from, $to)"
  }

  /** Replay of [[graft.operators.WebFilters.transcode]] over a prior CTE
    * `tcin($keyCol, pre, h, http_charset)` where `pre` is the latin-1
    * decode of the page bytes and `h` their lowercase hex (produce them
    * with [[duckLatin1]]/[[duckLatin1Hex]] or lower(hex(blob)) as the
    * caller's input dictates). Ends at
    * `tcout($keyCol, pre, charset_used, decode_ok, text)`. Label
    * precedence, alias canonicalization, the UTF-8 validity regex
    * (shared literal — [[graft.operators.WebFilters.Utf8HexPat]]), the
    * cp1252 table, and the latin-1 fallback all mirror the Scala
    * operator by construction. */
  def duckTranscode(keyCol: String): String =
    s"""tl0 AS (SELECT $keyCol, pre, h, http_charset,
       |  coalesce(regexp_extract(pre,
       |    '(?is)<meta\\b[^>=]*?[\\s"'']charset\\s*=\\s*["'']?([A-Za-z0-9_.:-]+)', 1), '') AS attr,
       |  coalesce(regexp_extract(pre,
       |    '(?is)<meta\\b[^>]*?[\\s"'']http-equiv\\s*=\\s*"content-type"[^>]*?[\\s"'']content\\s*=\\s*"([^"]*)"', 1), '') AS eq1,
       |  coalesce(regexp_extract(pre,
       |    '(?is)<meta\\b[^>]*?[\\s"'']content\\s*=\\s*"([^"]*)"[^>]*?[\\s"'']http-equiv\\s*=\\s*"content-type"', 1), '') AS eq2
       |  FROM tcin),
       |tlb AS (SELECT $keyCol, pre, h, lower(coalesce(
       |    nullif(http_charset, ''),
       |    nullif(lower(CASE WHEN attr <> '' THEN attr
       |      ELSE coalesce(regexp_extract(
       |        CASE WHEN eq1 <> '' THEN eq1 ELSE eq2 END,
       |        '(?i)charset[ \\t]*=[ \\t]*"?([A-Za-z0-9_.:-]+)', 1), '') END), ''),
       |    'utf-8')) AS label FROM tl0),
       |tcn AS (SELECT $keyCol, pre, h,
       |  CASE WHEN label IN ('iso-8859-1','iso8859-1','iso_8859-1','latin1','latin-1','l1','cp819') THEN 'iso-8859-1'
       |    WHEN label IN ('windows-1252','cp1252','x-cp1252') THEN 'windows-1252'
       |    WHEN label IN ('utf-8','utf8','us-ascii','ascii') THEN 'utf-8'
       |    ELSE 'unknown' END AS canon,
       |  regexp_matches(h, '${graft.operators.WebFilters.Utf8HexPat}') AS u8
       |  FROM tlb),
       |tcout AS (SELECT $keyCol, pre,
       |  CASE WHEN canon IN ('iso-8859-1','windows-1252') THEN canon
       |    WHEN u8 THEN 'utf-8' ELSE 'iso-8859-1' END AS charset_used,
       |  (canon IN ('iso-8859-1','windows-1252')
       |    OR (canon = 'utf-8' AND u8)) AS decode_ok,
       |  CASE WHEN canon = 'iso-8859-1' THEN pre
       |    WHEN canon = 'windows-1252' THEN ${duckCp1252("pre")}
       |    WHEN u8 THEN decode(unhex(h)) ELSE pre END AS text
       |  FROM tcn)""".stripMargin
}
