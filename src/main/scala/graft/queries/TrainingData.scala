package graft.queries

import graft.QSpec
import graft.QSpec._
import graft.operators.{CorpusFilters, Dedup, Events, RetrievalEval, Similarity, TextAnalysis}
import org.apache.spark.sql.functions._

/** Training-data pipeline operators (dedup, similarity search, text
  * analysis) as oracle-checked queries over the `documents` and `embeddings`
  * tables. The Spark side runs the operator library (graft.operators.*); the
  * oracle is hand-written DuckDB SQL with identical semantics.
  *
  * Cross-engine determinism: all hashing is md5 hex (byte-identical
  * everywhere); float math is double-widened and evaluated left-to-right in
  * both engines; similarity values are rounded before ordering.
  */
object TrainingData {

  /** Shared DuckDB CTE: filtered lowercase word arrays of documents. */
  private val duckWords =
    """toks AS (SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '\s+'),
      |  x -> len(x) > 0) AS w FROM documents)""".stripMargin

  /** Shared DuckDB CTE chain: word 3-gram shingles + 8 minhash columns
    * (one md5 per shingle; hash i = 16-hex-char fragment of the doubled
    * digest at offset 4i — mirrors Dedup.minhashSignatures). */
  private val duckMinhashSig = {
    val mhCols = (0 until 8)
      .map(i => s"min(substring(h2, ${4 * i + 1}, 16)) AS mh$i").mkString(",\n  ")
    s"""$duckWords,
       |sh AS (SELECT doc_id, concat(md5(shingle), md5(shingle)) AS h2 FROM (
       |  SELECT doc_id, unnest(list_transform(generate_series(1, len(w)-2),
       |    i -> concat_ws(' ', w[i], w[i+1], w[i+2]))) AS shingle
       |  FROM toks WHERE len(w) >= 3) x),
       |sig AS (SELECT doc_id,
       |  $mhCols
       |  FROM sh GROUP BY doc_id)""".stripMargin
  }

  /** Parameterized variant of `duckMinhashSig`: the full words → shingles →
    * 8-column minhash → 4 LSH bands chain over an arbitrary source CTE,
    * with every CTE name prefixed (so two corpora can carry independent
    * chains in one query — the fuzzy-decontamination oracle needs the
    * corpus AND the eval set banded). */
  private def duckBandsOver(src: String, pfx: String): String = {
    val mhCols = (0 until 8)
      .map(i => s"min(substring(h2, ${4 * i + 1}, 16)) AS mh$i").mkString(",\n  ")
    s"""${pfx}w AS (SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '\\s+'),
       |  x -> len(x) > 0) AS w FROM $src),
       |${pfx}sh AS (SELECT doc_id, concat(md5(shingle), md5(shingle)) AS h2 FROM (
       |  SELECT doc_id, unnest(list_transform(generate_series(1, len(w)-2),
       |    i -> concat_ws(' ', w[i], w[i+1], w[i+2]))) AS shingle
       |  FROM ${pfx}w WHERE len(w) >= 3) x),
       |${pfx}sig AS (SELECT doc_id,
       |  $mhCols
       |  FROM ${pfx}sh GROUP BY doc_id),
       |${pfx}bands AS (
       |  SELECT doc_id, 0 AS band, md5(concat(mh0, mh1)) AS bkey FROM ${pfx}sig
       |  UNION ALL SELECT doc_id, 1, md5(concat(mh2, mh3)) FROM ${pfx}sig
       |  UNION ALL SELECT doc_id, 2, md5(concat(mh4, mh5)) FROM ${pfx}sig
       |  UNION ALL SELECT doc_id, 3, md5(concat(mh6, mh7)) FROM ${pfx}sig)""".stripMargin
  }

  /** One spherical-k-means oracle iteration (mirrors
    * Similarity.kmeansCentroids): from centroid CTE `prev` (p, c, nc) over
    * the sample CTE `es`, emit CTE `cur` with the re-trained round(4)
    * centroids; empty cells keep their previous centroid. */
  private def duckKmeansIter(prev: String, cur: String, tag: String): String =
    s"""a$tag AS (SELECT vec_id, list_position(scores, list_aggregate(scores, 'max')) - 1 AS cell FROM (
       |  SELECT vec_id, list(list_sum(list_transform(generate_series(1, 64), i -> v[i] * c[i])) / nc ORDER BY p) AS scores
       |  FROM es CROSS JOIN $prev GROUP BY vec_id) x),
       |t$tag AS (SELECT cell, d, round(avg(v[d]), 4) AS cd
       |  FROM a$tag JOIN es USING (vec_id) CROSS JOIN generate_series(1, 64) t(d)
       |  GROUP BY cell, d),
       |l$tag AS (SELECT cell, list(cd ORDER BY d) AS c FROM t$tag GROUP BY cell),
       |$cur AS (SELECT $prev.p, coalesce(l$tag.c, $prev.c) AS c,
       |  sqrt(list_sum(list_transform(generate_series(1, 64),
       |    i -> coalesce(l$tag.c, $prev.c)[i] * coalesce(l$tag.c, $prev.c)[i]))) AS nc
       |  FROM $prev LEFT JOIN l$tag ON l$tag.cell = $prev.p)""".stripMargin

  /** The full learned-quality-classifier chain (hashed embedding →
    * 3 unrolled GD rounds → per-doc score) as a reusable CTE list
    * ending at `clf(doc_id, score)` — shared by the classifier query
    * and the calibration report. */
  private val duckClassifierChain =
    """toks AS (SELECT doc_id, list_filter(
        |  regexp_split_to_array(lower(text), '\s+'), x -> len(x) > 0) AS w
        |  FROM documents),
        |tx AS (SELECT doc_id, unnest(w) AS t FROM toks),
        |sx AS (SELECT doc_id,
        |  CAST(floor(CAST(list_sum(list_transform(generate_series(1, 8),
        |    i -> (strpos('0123456789abcdef',
        |      substring(md5(concat('he', t)), i, 1)) - 1)
        |      * 16.0 ** (8 - i))) AS DOUBLE) / 4294967296.0 * 64) AS INT) AS slot,
        |  CASE WHEN CAST(list_sum(list_transform(generate_series(1, 8),
        |    i -> (strpos('0123456789abcdef',
        |      substring(md5(concat('hes', t)), i, 1)) - 1)
        |      * 16.0 ** (8 - i))) AS DOUBLE) / 4294967296.0 < 0.5
        |    THEN 1.0 ELSE -1.0 END AS sgn FROM tx),
        |cnt AS (SELECT doc_id, slot, sum(sgn) AS s FROM sx GROUP BY doc_id, slot),
        |ds AS (SELECT DISTINCT doc_id FROM cnt),
        |grid AS (SELECT doc_id, d FROM ds CROSS JOIN generate_series(0, 63) t(d)),
        |rawv AS (SELECT g.doc_id, list(coalesce(c.s, 0.0) ORDER BY g.d) AS raw
        |  FROM grid g LEFT JOIN cnt c ON c.doc_id = g.doc_id AND c.slot = g.d
        |  GROUP BY g.doc_id),
        |nn AS (SELECT doc_id, raw,
        |  sqrt(list_sum(list_transform(raw, x -> x * x))) AS nrm FROM rawv),
        |emba AS (SELECT doc_id, CASE WHEN nrm > 0
        |  THEN list_transform(raw, x -> round(x / nrm, 4))
        |  ELSE list_transform(raw, x -> 0.0) END AS embedding FROM nn),
        |yy AS (SELECT doc_id, CASE WHEN source = 'src0' THEN 1.0 ELSE 0.0 END
        |  AS y FROM documents),
        |feat AS (SELECT e.doc_id, yy.y,
        |  CAST(generate_subscripts(e.embedding, 1) AS INT) AS d,
        |  unnest(e.embedding) AS val
        |  FROM emba e JOIN yy USING (doc_id)),
        |w0 AS (SELECT CAST(d AS INT) AS d, 0.0 AS w FROM generate_series(1, 64) t(d)),
        |z1 AS (SELECT doc_id, y, sum(w * val) AS z
        |  FROM feat JOIN w0 USING (d) GROUP BY doc_id, y),
        |s1 AS (SELECT feat.d, feat.val, z1.y, 1.0/(1.0 + exp(-z1.z)) AS sig
        |  FROM feat JOIN z1 USING (doc_id)),
        |g1 AS (SELECT d, avg((sig - y) * val) AS g FROM s1 GROUP BY d),
        |w1 AS (SELECT d, round(w - 1.0 * g, 4) AS w FROM g1 JOIN w0 USING (d)),
        |z2 AS (SELECT doc_id, y, sum(w * val) AS z
        |  FROM feat JOIN w1 USING (d) GROUP BY doc_id, y),
        |s2 AS (SELECT feat.d, feat.val, z2.y, 1.0/(1.0 + exp(-z2.z)) AS sig
        |  FROM feat JOIN z2 USING (doc_id)),
        |g2 AS (SELECT d, avg((sig - y) * val) AS g FROM s2 GROUP BY d),
        |w2 AS (SELECT d, round(w - 1.0 * g, 4) AS w FROM g2 JOIN w1 USING (d)),
        |z3 AS (SELECT doc_id, y, sum(w * val) AS z
        |  FROM feat JOIN w2 USING (d) GROUP BY doc_id, y),
        |s3 AS (SELECT feat.d, feat.val, z3.y, 1.0/(1.0 + exp(-z3.z)) AS sig
        |  FROM feat JOIN z3 USING (doc_id)),
        |g3 AS (SELECT d, avg((sig - y) * val) AS g FROM s3 GROUP BY d),
        |w3 AS (SELECT d, round(w - 1.0 * g, 4) AS w FROM g3 JOIN w2 USING (d)),
        |zf AS (SELECT doc_id, sum(w * val) AS z
        |  FROM feat JOIN w3 USING (d) GROUP BY doc_id),
        |clf AS (SELECT doc_id, round(1.0/(1.0 + exp(-z)), 4) AS score
        |  FROM zf)""".stripMargin


  private val ssKnnGraphOracle =
    """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |cn AS (SELECT p, c, sqrt(list_sum(list_transform(generate_series(1, 64), i -> c[i] * c[i]))) AS nc
        |  FROM (SELECT p, list_transform(generate_series(1, 64),
        |    d -> (strpos('0123456789abcdef', substring(md5(concat(p + 1000, '_', d - 1)), 1, 1)) - 8.5)) AS c
        |  FROM generate_series(0, 7) t(p)) x),
        |i0 AS (SELECT vec_id,
        |  list(list_sum(list_transform(generate_series(1, 64), i -> v[i] * c[i])) / nc ORDER BY p) AS scores
        |  FROM e CROSS JOIN cn WHERE vec_id % 5 = 0 GROUP BY vec_id),
        |ic0 AS (SELECT vec_id, list_position(scores, list_aggregate(scores, 'max')) - 1 AS cell FROM i0),
        |itr AS (SELECT cell, d, round(avg(v[d]), 4) AS cd
        |  FROM ic0 JOIN e USING (vec_id) CROSS JOIN generate_series(1, 64) t(d)
        |  GROUP BY cell, d),
        |itl AS (SELECT cell, list(cd ORDER BY d) AS c FROM itr GROUP BY cell),
        |tc AS (SELECT cn.p, coalesce(itl.c, cn.c) AS c,
        |  sqrt(list_sum(list_transform(generate_series(1, 64),
        |    i -> coalesce(itl.c, cn.c)[i] * coalesce(itl.c, cn.c)[i]))) AS nc
        |  FROM cn LEFT JOIN itl ON itl.cell = cn.p),
        |scored AS (SELECT vec_id,
        |  list(list_sum(list_transform(generate_series(1, 64), i -> v[i] * c[i])) / nc ORDER BY p) AS scores
        |  FROM e CROSS JOIN tc GROUP BY vec_id),
        |cells AS (SELECT s.vec_id, e.v,
        |  sqrt(list_sum(list_transform(generate_series(1, 64), i -> e.v[i] * e.v[i]))) AS nrm,
        |  list_position(s.scores, list_aggregate(s.scores, 'max')) - 1 AS cell
        |  FROM scored s JOIN e ON e.vec_id = s.vec_id),
        |p AS (SELECT a.vec_id AS src, b.vec_id AS dst,
        |  round(list_sum(list_transform(generate_series(1, 64),
        |    i -> a.v[i] * b.v[i])) / (a.nrm * b.nrm), 4) AS sim
        |  FROM cells a JOIN cells b
        |    ON a.cell = b.cell AND a.vec_id <> b.vec_id),
        |r AS (SELECT src, dst, sim, CAST(row_number() OVER (
        |  PARTITION BY src ORDER BY sim DESC, dst) AS INT) AS rnk FROM p)
        |SELECT src, dst, sim, rnk FROM r WHERE rnk <= 3
        |ORDER BY src, rnk LIMIT 300""".stripMargin

  private val ssHardNegativesOracle =
    """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |cn AS (SELECT p, c, sqrt(list_sum(list_transform(generate_series(1, 64), i -> c[i] * c[i]))) AS nc
        |  FROM (SELECT p, list_transform(generate_series(1, 64),
        |    d -> (strpos('0123456789abcdef', substring(md5(concat(p + 1000, '_', d - 1)), 1, 1)) - 8.5)) AS c
        |  FROM generate_series(0, 7) t(p)) x),
        |i0 AS (SELECT vec_id,
        |  list(list_sum(list_transform(generate_series(1, 64), i -> v[i] * c[i])) / nc ORDER BY p) AS scores
        |  FROM e CROSS JOIN cn WHERE vec_id % 5 = 0 GROUP BY vec_id),
        |ic0 AS (SELECT vec_id, list_position(scores, list_aggregate(scores, 'max')) - 1 AS cell FROM i0),
        |itr AS (SELECT cell, d, round(avg(v[d]), 4) AS cd
        |  FROM ic0 JOIN e USING (vec_id) CROSS JOIN generate_series(1, 64) t(d)
        |  GROUP BY cell, d),
        |itl AS (SELECT cell, list(cd ORDER BY d) AS c FROM itr GROUP BY cell),
        |tc AS (SELECT cn.p, coalesce(itl.c, cn.c) AS c,
        |  sqrt(list_sum(list_transform(generate_series(1, 64),
        |    i -> coalesce(itl.c, cn.c)[i] * coalesce(itl.c, cn.c)[i]))) AS nc
        |  FROM cn LEFT JOIN itl ON itl.cell = cn.p),
        |scored AS (SELECT vec_id,
        |  list(list_sum(list_transform(generate_series(1, 64), i -> v[i] * c[i])) / nc ORDER BY p) AS scores
        |  FROM e CROSS JOIN tc GROUP BY vec_id),
        |cells AS (SELECT s.vec_id, e.v, emb.label AS lbl,
        |  sqrt(list_sum(list_transform(generate_series(1, 64), i -> e.v[i] * e.v[i]))) AS nrm,
        |  list_position(s.scores, list_aggregate(s.scores, 'max')) - 1 AS cell
        |  FROM scored s JOIN e ON e.vec_id = s.vec_id
        |  JOIN embeddings emb ON emb.vec_id = s.vec_id),
        |p AS (SELECT a.vec_id AS src, b.vec_id AS dst, b.lbl AS neg_label,
        |  round(list_sum(list_transform(generate_series(1, 64),
        |    i -> a.v[i] * b.v[i])) / (a.nrm * b.nrm), 4) AS sim
        |  FROM cells a JOIN cells b
        |    ON a.cell = b.cell AND a.vec_id <> b.vec_id AND a.lbl <> b.lbl),
        |r AS (SELECT src, dst, neg_label, sim, CAST(row_number() OVER (
        |  PARTITION BY src ORDER BY sim DESC, dst) AS INT) AS rnk FROM p)
        |SELECT src, dst, neg_label, sim, rnk FROM r WHERE rnk <= 3
        |ORDER BY src, rnk LIMIT 300""".stripMargin

  private val ssLabelPropOracle =
    """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |cn AS (SELECT p, c, sqrt(list_sum(list_transform(generate_series(1, 64), i -> c[i] * c[i]))) AS nc
        |  FROM (SELECT p, list_transform(generate_series(1, 64),
        |    d -> (strpos('0123456789abcdef', substring(md5(concat(p + 1000, '_', d - 1)), 1, 1)) - 8.5)) AS c
        |  FROM generate_series(0, 7) t(p)) x),
        |i0 AS (SELECT vec_id,
        |  list(list_sum(list_transform(generate_series(1, 64), i -> v[i] * c[i])) / nc ORDER BY p) AS scores
        |  FROM e CROSS JOIN cn WHERE vec_id % 5 = 0 GROUP BY vec_id),
        |ic0 AS (SELECT vec_id, list_position(scores, list_aggregate(scores, 'max')) - 1 AS cell FROM i0),
        |itr AS (SELECT cell, d, round(avg(v[d]), 4) AS cd
        |  FROM ic0 JOIN e USING (vec_id) CROSS JOIN generate_series(1, 64) t(d)
        |  GROUP BY cell, d),
        |itl AS (SELECT cell, list(cd ORDER BY d) AS c FROM itr GROUP BY cell),
        |tc AS (SELECT cn.p, coalesce(itl.c, cn.c) AS c,
        |  sqrt(list_sum(list_transform(generate_series(1, 64),
        |    i -> coalesce(itl.c, cn.c)[i] * coalesce(itl.c, cn.c)[i]))) AS nc
        |  FROM cn LEFT JOIN itl ON itl.cell = cn.p),
        |scored AS (SELECT vec_id,
        |  list(list_sum(list_transform(generate_series(1, 64), i -> v[i] * c[i])) / nc ORDER BY p) AS scores
        |  FROM e CROSS JOIN tc GROUP BY vec_id),
        |cells AS (SELECT s.vec_id, e.v,
        |  sqrt(list_sum(list_transform(generate_series(1, 64), i -> e.v[i] * e.v[i]))) AS nrm,
        |  list_position(s.scores, list_aggregate(s.scores, 'max')) - 1 AS cell
        |  FROM scored s JOIN e ON e.vec_id = s.vec_id),
        |p AS (SELECT a.vec_id AS src, b.vec_id AS dst,
        |  round(list_sum(list_transform(generate_series(1, 64),
        |    i -> a.v[i] * b.v[i])) / (a.nrm * b.nrm), 4) AS sim
        |  FROM cells a JOIN cells b
        |    ON a.cell = b.cell AND a.vec_id <> b.vec_id),
        |r AS (SELECT src, dst, sim, CAST(row_number() OVER (
        |  PARTITION BY src ORDER BY sim DESC, dst) AS INT) AS rnk FROM p),
        |knn AS (SELECT src, dst FROM r WHERE rnk <= 3),
        |l0 AS (SELECT vec_id AS id,
        |  CASE WHEN vec_id % 5 = 0 THEN label END AS lbl,
        |  vec_id % 5 = 0 AS seed FROM embeddings),
        |v1 AS (SELECT src, nlbl FROM (
        |  SELECT src, nlbl, row_number() OVER (PARTITION BY src ORDER BY c DESC, nlbl) AS rn
        |  FROM (SELECT g.src, l.lbl AS nlbl, count(*) AS c FROM knn g
        |        JOIN l0 l ON l.id = g.dst WHERE l.lbl IS NOT NULL
        |        GROUP BY g.src, l.lbl) x) y WHERE rn = 1),
        |l1 AS (SELECT l0.id, CASE WHEN l0.seed THEN l0.lbl
        |    ELSE coalesce(v1.nlbl, l0.lbl) END AS lbl, l0.seed
        |  FROM l0 LEFT JOIN v1 ON v1.src = l0.id),
        |v2 AS (SELECT src, nlbl FROM (
        |  SELECT src, nlbl, row_number() OVER (PARTITION BY src ORDER BY c DESC, nlbl) AS rn
        |  FROM (SELECT g.src, l.lbl AS nlbl, count(*) AS c FROM knn g
        |        JOIN l1 l ON l.id = g.dst WHERE l.lbl IS NOT NULL
        |        GROUP BY g.src, l.lbl) x) y WHERE rn = 1),
        |l2 AS (SELECT l1.id, CASE WHEN l1.seed THEN l1.lbl
        |    ELSE coalesce(v2.nlbl, l1.lbl) END AS lbl, l1.seed
        |  FROM l1 LEFT JOIN v2 ON v2.src = l1.id)
        |SELECT id AS vec_id, lbl AS label_prop, seed FROM l2
        |ORDER BY vec_id LIMIT 300""".stripMargin

  private val ddSemanticClustersOracle =
    """WITH RECURSIVE
      |e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      |cn AS (SELECT p, c, sqrt(list_sum(list_transform(generate_series(1, 64), i -> c[i] * c[i]))) AS nc
      |  FROM (SELECT p, list_transform(generate_series(1, 64),
      |    d -> (strpos('0123456789abcdef', substring(md5(concat(p + 1000, '_', d - 1)), 1, 1)) - 8.5)) AS c
      |  FROM generate_series(0, 7) t(p)) x),
      |i0 AS (SELECT vec_id,
      |  list(list_sum(list_transform(generate_series(1, 64), i -> v[i] * c[i])) / nc ORDER BY p) AS scores
      |  FROM e CROSS JOIN cn WHERE vec_id % 5 = 0 GROUP BY vec_id),
      |ic0 AS (SELECT vec_id, list_position(scores, list_aggregate(scores, 'max')) - 1 AS cell FROM i0),
      |itr AS (SELECT cell, d, round(avg(v[d]), 4) AS cd
      |  FROM ic0 JOIN e USING (vec_id) CROSS JOIN generate_series(1, 64) t(d)
      |  GROUP BY cell, d),
      |itl AS (SELECT cell, list(cd ORDER BY d) AS c FROM itr GROUP BY cell),
      |tc AS (SELECT cn.p, coalesce(itl.c, cn.c) AS c,
      |  sqrt(list_sum(list_transform(generate_series(1, 64),
      |    i -> coalesce(itl.c, cn.c)[i] * coalesce(itl.c, cn.c)[i]))) AS nc
      |  FROM cn LEFT JOIN itl ON itl.cell = cn.p),
      |scored AS (SELECT vec_id,
      |  list(list_sum(list_transform(generate_series(1, 64), i -> v[i] * c[i])) / nc ORDER BY p) AS scores
      |  FROM e CROSS JOIN tc GROUP BY vec_id),
      |cells AS (SELECT s.vec_id, e.v,
      |  sqrt(list_sum(list_transform(generate_series(1, 64), i -> e.v[i] * e.v[i]))) AS nrm,
      |  list_position(s.scores, list_aggregate(s.scores, 'max')) - 1 AS cell
      |  FROM scored s JOIN e ON e.vec_id = s.vec_id),
      |pp AS (SELECT a.vec_id AS src, b.vec_id AS dst,
      |  round(list_sum(list_transform(generate_series(1, 64),
      |    i -> a.v[i] * b.v[i])) / (a.nrm * b.nrm), 4) AS sim
      |  FROM cells a JOIN cells b
      |    ON a.cell = b.cell AND a.vec_id <> b.vec_id),
      |rk AS (SELECT src, dst, sim, row_number() OVER (
      |  PARTITION BY src ORDER BY sim DESC, dst) AS rnk FROM pp),
      |pr AS (SELECT src, dst FROM rk WHERE rnk <= 3 AND sim >= 0.3),
      |edges AS (SELECT src, dst FROM pr UNION SELECT dst, src FROM pr),
      |reach(a, b) AS (
      |  SELECT src, dst FROM edges
      |  UNION
      |  SELECT r2.a, e2.dst FROM reach r2 JOIN edges e2 ON e2.src = r2.b)
      |SELECT a AS id, least(a, min(b)) AS cluster_id
      |FROM reach GROUP BY a ORDER BY id LIMIT 200""".stripMargin

  /** A pinned-cells ANN oracle chain rewritten to derive the cell count
    * from the corpus itself — k = max(8, ceil(n/250)), SemDeDup's own
    * occupancy rule and exactly what [[graft.operators.Similarity.AutoCells]]
    * resolves to — so the operator DEFAULT (not just the harness-pinned
    * k=8 form) is driver-gated and sf1-measured every round. DuckDB: a
    * scalar generate_series bound may be subquery-derived only in scalar
    * position, hence the kk/ps CTE pair (the dd_semdedup_scaled pattern). */
  private def scaledCellsOracle(pinned: String): String = {
    val cn = "cn AS (SELECT p, c, sqrt"
    val src = "FROM generate_series(0, 7) t(p)) x)"
    require(pinned.contains(cn) && pinned.contains(src),
      "unexpected pinned-oracle shape")
    pinned
      .replace(cn,
        "kk AS (SELECT CAST(greatest(8, ceil(count(*) / 250.0)) AS INT) AS k FROM embeddings),\n" +
        "ps AS (SELECT unnest(generate_series(0, k - 1)) AS p FROM kk),\n" + cn)
      .replace(src, "FROM ps) x)")
  }

  /** Shared DuckDB WordPiece VOCAB chain (mirrors
    * TextAnalysis.wordpieceVocab: the unigramSeed substring-frequency
    * rule at maxPieceLen=4, top 256 by (cnt desc, piece asc), plus every
    * single corpus character). Ends at wpv(piece, cnt). */
  private val duckWpVocab =
    """wpwf AS (SELECT w AS word, count(*) AS wc FROM (
      |  SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w
      |  FROM documents) x GROUP BY w),
      |wpmx AS (SELECT max(len(word)) AS ml FROM wpwf),
      |wpst AS (SELECT unnest(generate_series(1, (SELECT ml FROM wpmx))) AS s),
      |wpln AS (SELECT unnest(generate_series(1, 4)) AS l),
      |wpp AS (SELECT substring(word, s, l) AS piece,
      |  CAST(sum(wc) AS BIGINT) AS cnt
      |  FROM wpwf, wpst, wpln
      |  WHERE s <= len(word) AND s + l - 1 <= len(word)
      |  GROUP BY piece),
      |wptop AS (SELECT piece, cnt FROM wpp ORDER BY cnt DESC, piece LIMIT 256),
      |wpv AS (SELECT piece, max(cnt) AS cnt FROM (
      |  SELECT piece, cnt FROM wptop UNION ALL
      |  SELECT piece, cnt FROM wpp WHERE len(piece) = 1) u GROUP BY piece)"""
      .stripMargin

  /** Shared DuckDB WordPiece ENCODE chain over wpv (mirrors
    * TextAnalysis.wordpieceEncode's greedy longest-match-first walk): a
    * best-piece table per (word, position) — the longest vocab piece
    * matching there, found by an EQUI-join on the enumerated candidate
    * substrings — then a recursive CTE replays the deterministic greedy
    * walk (one successor per state; a stuck position collapses the word
    * to [UNK] exactly as the Spark segmenter does). Needs WITH RECURSIVE.
    * Ends at wpj(doc_id, pos, n, ts, unk). */
  private val duckWpEncode =
    """wpc AS (SELECT word, s, substring(word, s, l) AS c, l
      |  FROM wpwf, wpst, wpln
      |  WHERE s <= len(word) AND s + l - 1 <= len(word)),
      |wpbp AS (SELECT word, s AS pos, max(l) AS bl
      |  FROM wpc JOIN wpv ON wpv.piece = wpc.c GROUP BY word, s),
      |wpseg AS (
      |  SELECT word, 1 AS pos, CAST('' AS VARCHAR) AS ts, false AS unk
      |  FROM wpwf
      |  UNION ALL
      |  SELECT s.word,
      |    CASE WHEN b.bl IS NULL THEN len(s.word) + 1
      |      ELSE s.pos + b.bl END AS pos,
      |    CASE WHEN b.bl IS NULL THEN '[UNK]'
      |      WHEN s.pos = 1 THEN substring(s.word, 1, b.bl)
      |      ELSE s.ts || ' ##' || substring(s.word, s.pos, b.bl) END AS ts,
      |    (s.unk OR b.bl IS NULL) AS unk
      |  FROM wpseg s LEFT JOIN wpbp b ON b.word = s.word AND b.pos = s.pos
      |  WHERE s.pos <= len(s.word)),
      |wpfw AS (SELECT word, ts, unk,
      |  CAST(len(string_split(ts, ' ')) AS BIGINT) AS n
      |  FROM wpseg WHERE pos = len(word) + 1),
      |wpdw AS (SELECT doc_id, unnest(ww) AS word,
      |  unnest(generate_series(1, len(ww))) AS pos
      |  FROM (SELECT doc_id, regexp_extract_all(lower(text), '[a-z]+') AS ww
      |    FROM documents) x),
      |wpj AS (SELECT doc_id, pos, n, ts, unk FROM wpdw JOIN wpfw USING (word))"""
      .stripMargin

  val all: Seq[QSpec] = Seq(

    // ---- deduplication ----------------------------------------------------

    df("dd_exact_dedup",
      """SELECT count(*) AS kept, CAST(sum(keeper) AS BIGINT) AS keeper_id_sum,
        |  CAST(sum(group_size) AS BIGINT) AS total_rows
        |FROM (SELECT min(doc_id) AS keeper, count(*) AS group_size
        |      FROM documents GROUP BY md5(text)) t""".stripMargin) { (s, _) =>
      Dedup.exactGroups(s.table("documents"))
        .agg(count(lit(1)).as("kept"), sum(col("keeper")).as("keeper_id_sum"),
          sum(col("group_size")).as("total_rows"))
    },

    // incremental (batch-vs-corpus) dedup: docs with doc_id % 10 = 0 play
    // the "new crawl batch", the rest the already-released corpus — batch
    // rows whose text the corpus has seen are dropped, then keep-first
    // within the batch
    df("dd_incremental_dedup",
      """WITH corpus AS (SELECT DISTINCT md5(text) AS h FROM documents
        |  WHERE doc_id % 10 <> 0),
        |b AS (SELECT doc_id, n_chars, md5(text) AS h FROM documents
        |  WHERE doc_id % 10 = 0),
        |fresh AS (SELECT b.* FROM b LEFT JOIN corpus c ON b.h = c.h
        |  WHERE c.h IS NULL),
        |keep AS (SELECT h, min(doc_id) AS keeper FROM fresh GROUP BY h)
        |SELECT count(*) AS kept, CAST(sum(f.doc_id) AS BIGINT) AS kept_id_sum,
        |  CAST(sum(f.n_chars) AS BIGINT) AS kept_chars
        |FROM fresh f JOIN keep k ON f.h = k.h AND f.doc_id = k.keeper""".stripMargin) { (s, _) =>
      val docs = s.table("documents")
      Dedup.incrementalDedup(docs.where(col("doc_id") % 10 === 0),
          docs.where(col("doc_id") % 10 =!= 0))
        .agg(count(lit(1)).as("kept"), sum(col("doc_id")).as("kept_id_sum"),
          sum(col("n_chars")).as("kept_chars"))
    },

    // incremental NEAR-dup dedup: the fuzzy sibling of dd_incremental_dedup
    // — planted batch rows (negative ids) are corpus docs with a tweaked
    // tail; LSH candidates verified by exact 3-gram Jaccard >= 0.5 die
    df("dd_incremental_neardup",
      s"""WITH corpus AS (SELECT doc_id, text FROM documents WHERE doc_id % 10 <> 0),
         |b0 AS (SELECT doc_id, text FROM documents WHERE doc_id % 10 = 0
         |  UNION ALL SELECT -(doc_id + 1), text || ' extra tail'
         |  FROM corpus WHERE doc_id % 9 = 1),
         |${duckBandsOver("b0", "b")},
         |${duckBandsOver("corpus", "c")},
         |cand AS (SELECT DISTINCT bbands.doc_id AS id_a, cbands.doc_id AS id_b
         |  FROM bbands JOIN cbands USING (band, bkey)),
         |sa AS (SELECT DISTINCT doc_id, shingle FROM (
         |  SELECT doc_id, unnest(list_transform(generate_series(1, len(w)-2),
         |    i -> concat_ws(' ', w[i], w[i+1], w[i+2]))) AS shingle
         |  FROM bw WHERE len(w) >= 3) x),
         |sb AS (SELECT DISTINCT doc_id, shingle FROM (
         |  SELECT doc_id, unnest(list_transform(generate_series(1, len(w)-2),
         |    i -> concat_ws(' ', w[i], w[i+1], w[i+2]))) AS shingle
         |  FROM cw WHERE len(w) >= 3) x),
         |ca AS (SELECT doc_id, count(*) AS c FROM sa GROUP BY doc_id),
         |cb2 AS (SELECT doc_id, count(*) AS c FROM sb GROUP BY doc_id),
         |iv AS (SELECT id_a, id_b, count(*) AS i FROM cand
         |  JOIN sa ON sa.doc_id = cand.id_a
         |  JOIN sb ON sb.doc_id = cand.id_b AND sb.shingle = sa.shingle
         |  GROUP BY id_a, id_b),
         |jac AS (SELECT cand.id_a,
         |  round(CAST(coalesce(iv.i, 0) AS DOUBLE) / (ca.c + cb2.c - coalesce(iv.i, 0)), 4) AS j
         |  FROM cand LEFT JOIN iv ON iv.id_a = cand.id_a AND iv.id_b = cand.id_b
         |  JOIN ca ON ca.doc_id = cand.id_a JOIN cb2 ON cb2.doc_id = cand.id_b),
         |drops AS (SELECT DISTINCT id_a FROM jac WHERE j >= 0.5)
         |SELECT count(*) AS kept, CAST(sum(doc_id) AS BIGINT) AS kept_id_sum
         |FROM b0 WHERE doc_id NOT IN (SELECT id_a FROM drops)""".stripMargin) { (s, _) =>
      val d = s.table("documents")
      val corpus = d.where(col("doc_id") % 10 =!= 0).select("doc_id", "text")
      val batch = d.where(col("doc_id") % 10 === 0).select("doc_id", "text")
        .unionByName(corpus.where(col("doc_id") % 9 === 1)
          .select((-(col("doc_id") + 1L)).as("doc_id"),
            concat(col("text"), lit(" extra tail")).as("text")))
      Dedup.incrementalNearDedup(batch, corpus)
        .agg(count(lit(1)).as("kept"), sum(col("doc_id")).as("kept_id_sum"))
    },

    // bloom-membership scale path of the same batch-vs-corpus check: the
    // filter is probabilistic (no false negatives, fpp extra drops), so no
    // value oracle — but the row carries its own bound-check inputs
    // (batch_size and the EXACT duplicate count), pinning
    // kept_approx ∈ [batch − dups − fpp·batch, batch − dups] in DedupSpec
    // and any future driver range check; DedupSpec also pins containment,
    // PlanSpec the map-only apply
    noOracle("dd_bloom_dedup") { (s, _) =>
      val docs = s.table("documents")
      val corpus = docs.where(col("doc_id") % 10 =!= 0)
      val batch = docs.where(col("doc_id") % 10 === 0)
      val kept = Dedup.bloomDedup(batch, corpus,
          expectedItems = corpus.count(), fpp = 0.01)
        .agg(count(lit(1)).as("kept_approx"))
      val stats = batch
        .withColumn("h", coalesce(md5(col("text")), lit("0")))
        .join(corpus.select(coalesce(md5(col("text")), lit("0")).as("sh"))
          .distinct(), col("h") === col("sh"), "left")
        .agg(count(lit(1)).as("batch_size"),
          sum(when(col("sh").isNotNull, 1L).otherwise(0L)).as("true_dup_count"))
      kept.crossJoin(broadcast(stats))
    },

    df("dd_minhash_signature",
      s"""WITH $duckMinhashSig
         |SELECT doc_id, mh0, mh1, mh2, mh3, mh4, mh5, mh6, mh7
         |FROM sig ORDER BY doc_id LIMIT 100""".stripMargin) { (s, _) =>
      Dedup.minhashSignatures(s.table("documents"), n = 3, k = 8)
        .orderBy("doc_id").limit(100)
    },

    df("dd_minhash_lsh_pairs",
      s"""WITH $duckMinhashSig,
         |bands AS (
         |  SELECT doc_id, 0 AS band, md5(concat(mh0, mh1)) AS bkey FROM sig
         |  UNION ALL SELECT doc_id, 1, md5(concat(mh2, mh3)) FROM sig
         |  UNION ALL SELECT doc_id, 2, md5(concat(mh4, mh5)) FROM sig
         |  UNION ALL SELECT doc_id, 3, md5(concat(mh6, mh7)) FROM sig)
         |SELECT count(*) AS cnt FROM (
         |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         |  FROM bands a JOIN bands b
         |    ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id) p""".stripMargin) {
      (s, _) =>
        Dedup.lshCandidatePairs(s.table("documents"), n = 3, k = 8, r = 2)
          .agg(count(lit(1)).as("cnt"))
    },

    df("dd_simhash",
      s"""WITH $duckWords,
         |h AS (SELECT doc_id, substring(md5(t), 1, 8) AS h
         |      FROM (SELECT doc_id, unnest(w) AS t FROM toks) x WHERE len(t) > 0),
         |bits AS (SELECT doc_id, j,
         |    ((strpos('0123456789abcdef', substring(h, (j // 4) + 1, 1)) - 1) >> (3 - (j % 4))) & 1 AS bit
         |  FROM h CROSS JOIN generate_series(0, 31) t(j)),
         |votes AS (SELECT doc_id, j, sum(bit * 2 - 1) AS vote FROM bits GROUP BY doc_id, j)
         |SELECT doc_id, CAST(sum(CASE WHEN vote > 0 THEN (CAST(1 AS BIGINT) << j) ELSE 0 END) AS BIGINT) AS simhash
         |FROM votes GROUP BY doc_id ORDER BY doc_id LIMIT 100""".stripMargin) { (s, _) =>
      Dedup.simhash(s.table("documents")).orderBy("doc_id").limit(100)
    },

    df("dd_ngram_jaccard",
      s"""WITH $duckWords,
         |sh AS (SELECT DISTINCT doc_id, shingle FROM (
         |  SELECT doc_id, unnest(list_transform(generate_series(1, len(w)-1),
         |    i -> concat_ws(' ', w[i], w[i+1]))) AS shingle
         |  FROM toks WHERE len(w) >= 2) x),
         |cnt AS (SELECT doc_id, count(*) AS c FROM sh GROUP BY doc_id),
         |pairs AS (SELECT doc_id AS id_a, doc_id + 1 AS id_b FROM documents),
         |inter AS (SELECT id_a, id_b, count(*) AS i
         |  FROM pairs JOIN sh sa ON sa.doc_id = id_a
         |  JOIN sh sb ON sb.doc_id = id_b AND sb.shingle = sa.shingle
         |  GROUP BY id_a, id_b)
         |SELECT p.id_a, p.id_b,
         |  round(coalesce(i.i, 0) / (ca.c + cb.c - coalesce(i.i, 0)), 4) AS jaccard
         |FROM pairs p
         |LEFT JOIN inter i ON i.id_a = p.id_a AND i.id_b = p.id_b
         |JOIN cnt ca ON ca.doc_id = p.id_a
         |JOIN cnt cb ON cb.doc_id = p.id_b
         |ORDER BY p.id_a LIMIT 100""".stripMargin) { (s, _) =>
      val docs = s.table("documents")
      val pairs = docs.select(col("doc_id").as("id_a"), (col("doc_id") + 1).as("id_b"))
      Dedup.ngramJaccard(docs, pairs, n = 2).orderBy("id_a").limit(100)
    },

    // Broder containment (|A∩B|/|A|, both directions): the asymmetric
    // sub-document-duplication score Jaccard drowns on size mismatch
    df("dd_containment",
      s"""WITH $duckWords,
         |sh AS (SELECT DISTINCT doc_id, shingle FROM (
         |  SELECT doc_id, unnest(list_transform(generate_series(1, len(w)-1),
         |    i -> concat_ws(' ', w[i], w[i+1]))) AS shingle
         |  FROM toks WHERE len(w) >= 2) x),
         |cnt AS (SELECT doc_id, count(*) AS c FROM sh GROUP BY doc_id),
         |pairs AS (SELECT doc_id AS id_a, doc_id + 1 AS id_b FROM documents),
         |inter AS (SELECT id_a, id_b, count(*) AS i
         |  FROM pairs JOIN sh sa ON sa.doc_id = id_a
         |  JOIN sh sb ON sb.doc_id = id_b AND sb.shingle = sa.shingle
         |  GROUP BY id_a, id_b)
         |SELECT p.id_a, p.id_b,
         |  round(coalesce(i.i, 0) / ca.c, 4) AS containment_a_in_b,
         |  round(coalesce(i.i, 0) / cb.c, 4) AS containment_b_in_a
         |FROM pairs p
         |LEFT JOIN inter i ON i.id_a = p.id_a AND i.id_b = p.id_b
         |JOIN cnt ca ON ca.doc_id = p.id_a
         |JOIN cnt cb ON cb.doc_id = p.id_b
         |ORDER BY p.id_a LIMIT 100""".stripMargin) { (s, _) =>
      val docs = s.table("documents")
      val pairs = docs.select(col("doc_id").as("id_a"),
        (col("doc_id") + 1).as("id_b"))
      Dedup.ngramContainment(docs, pairs, n = 2).orderBy("id_a").limit(100)
    },

    df("dd_embedding_neardup",
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |pairs AS (SELECT vec_id AS id_a, vec_id + 1 AS id_b FROM embeddings),
        |s AS (SELECT id_a, id_b,
        |  list_sum(list_transform(generate_series(1, len(ea.v)), i -> ea.v[i] * eb.v[i])) AS dp,
        |  sqrt(list_sum(list_transform(generate_series(1, len(ea.v)), i -> ea.v[i] * ea.v[i]))) AS na,
        |  sqrt(list_sum(list_transform(generate_series(1, len(eb.v)), i -> eb.v[i] * eb.v[i]))) AS nb
        |  FROM pairs JOIN e ea ON ea.vec_id = id_a JOIN e eb ON eb.vec_id = id_b)
        |SELECT id_a, id_b, round(dp / (na * nb), 4) AS sim
        |FROM s WHERE round(dp / (na * nb), 4) >= -1.0
        |ORDER BY id_a LIMIT 100""".stripMargin) { (s, _) =>
      val emb = s.table("embeddings")
      val pairs = emb.select(col("vec_id").as("id_a"), (col("vec_id") + 1).as("id_b"))
      Similarity.embeddingNearDups(emb, pairs, threshold = -1.0)
        .orderBy("id_a").limit(100)
    },

    // near-dup clustering: connected components over the candidate-pair
    // graph (consecutive-id embedding pairs at cos >= 0.2), cluster_id =
    // min reachable id — the keeper-selection step after LSH. The oracle
    // computes the transitive closure with a recursive CTE; Spark runs
    // iterative min-label propagation — same fixpoint.
    df("dd_neardup_clusters",
      """WITH RECURSIVE
        |e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |p0 AS (SELECT vec_id AS id_a, vec_id + 1 AS id_b FROM embeddings),
        |sim AS (SELECT id_a, id_b,
        |  round(list_sum(list_transform(generate_series(1, len(ea.v)), i -> ea.v[i] * eb.v[i])) /
        |  (sqrt(list_sum(list_transform(generate_series(1, len(ea.v)), i -> ea.v[i] * ea.v[i]))) *
        |   sqrt(list_sum(list_transform(generate_series(1, len(eb.v)), i -> eb.v[i] * eb.v[i])))), 4) AS s
        |  FROM p0 JOIN e ea ON ea.vec_id = id_a JOIN e eb ON eb.vec_id = id_b),
        |pr AS (SELECT id_a, id_b FROM sim WHERE s >= 0.2),
        |edges AS (SELECT id_a AS src, id_b AS dst FROM pr UNION SELECT id_b, id_a FROM pr),
        |reach(src, dst) AS (
        |  SELECT src, dst FROM edges
        |  UNION
        |  SELECT r.src, e2.dst FROM reach r JOIN edges e2 ON e2.src = r.dst)
        |SELECT src AS id, least(src, min(dst)) AS cluster_id
        |FROM reach GROUP BY src ORDER BY id LIMIT 200""".stripMargin) { (s, _) =>
      val emb = s.table("embeddings")
      val pairs = Similarity.embeddingNearDups(emb,
          emb.select(col("vec_id").as("id_a"), (col("vec_id") + 1).as("id_b")),
          threshold = 0.2)
        .select(col("id_a"), col("id_b"))
      Dedup.neardupClusters(pairs).orderBy("id").limit(200)
    },

    // full dedup pipeline close-out: LSH banded candidates → exact
    // jaccard >= 0.5 → connected components → ONE representative per
    // cluster (best n_chars, tie to min id). "Keep the best copy, not the
    // first copy". Candidates come from the MinHash LSH band join — the
    // production-scale path (a raw shared-shingle self-join is quadratic
    // in hot shingles: 153 s at sf0.1 vs ~2 s banded) — and the banding is
    // bit-identical in both engines, so the oracle checks the REAL plan
    df("dd_cluster_keep_best",
      s"""WITH RECURSIVE
         |$duckMinhashSig,
         |bands AS (
         |  SELECT doc_id, 0 AS band, md5(concat(mh0, mh1)) AS bkey FROM sig
         |  UNION ALL SELECT doc_id, 1, md5(concat(mh2, mh3)) FROM sig
         |  UNION ALL SELECT doc_id, 2, md5(concat(mh4, mh5)) FROM sig
         |  UNION ALL SELECT doc_id, 3, md5(concat(mh6, mh7)) FROM sig),
         |cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         |  FROM bands a JOIN bands b
         |  ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id),
         |sh2 AS (SELECT DISTINCT doc_id, shingle FROM (
         |  SELECT doc_id, unnest(list_transform(generate_series(1, len(w)-1),
         |    i -> concat_ws(' ', w[i], w[i+1]))) AS shingle
         |  FROM toks WHERE len(w) >= 2) x),
         |cnt AS (SELECT doc_id, count(*) AS c FROM sh2 GROUP BY doc_id),
         |inter AS (SELECT id_a, id_b, count(*) AS i
         |  FROM cand JOIN sh2 sa ON sa.doc_id = id_a
         |  JOIN sh2 sb ON sb.doc_id = id_b AND sb.shingle = sa.shingle
         |  GROUP BY id_a, id_b),
         |pr AS (SELECT id_a, id_b FROM inter
         |  JOIN cnt ca ON ca.doc_id = id_a JOIN cnt cb ON cb.doc_id = id_b
         |  WHERE round(CAST(i AS DOUBLE) / (ca.c + cb.c - i), 4) >= 0.5),
         |edges AS (SELECT id_a AS src, id_b AS dst FROM pr
         |  UNION SELECT id_b, id_a FROM pr),
         |reach(src, dst) AS (
         |  SELECT src, dst FROM edges
         |  UNION
         |  SELECT r.src, e2.dst FROM reach r JOIN edges e2 ON e2.src = r.dst),
         |cl AS (SELECT src AS id, least(src, min(dst)) AS cluster_id
         |  FROM reach GROUP BY src),
         |m AS (SELECT cl.cluster_id, cl.id, d.n_chars AS score
         |  FROM cl JOIN documents d ON d.doc_id = cl.id),
         |b AS (SELECT cluster_id, max(score) AS best_score,
         |  count(*) AS cluster_size FROM m GROUP BY cluster_id)
         |SELECT m.cluster_id, min(m.id) AS keeper_id,
         |  CAST(max(m.score) AS BIGINT) AS best_score,
         |  CAST(max(b.cluster_size) AS BIGINT) AS cluster_size
         |FROM m JOIN b USING (cluster_id) WHERE m.score = b.best_score
         |GROUP BY m.cluster_id ORDER BY m.cluster_id""".stripMargin) { (s, _) =>
      val docs = s.table("documents")
      val cand = Dedup.lshCandidatePairs(docs, n = 3, k = 8, r = 2)
      val pairs = Dedup.ngramJaccard(docs, cand, n = 2)
        .where(col("jaccard") >= 0.5)
      val clusters = Dedup.neardupClusters(pairs.select("id_a", "id_b"))
      Dedup.clusterKeepBest(docs, clusters, col("n_chars"))
        .orderBy("cluster_id")
    },

    // ---- similarity search ------------------------------------------------

    df("ss_cosine_topk",
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |q AS (SELECT v AS qv FROM e WHERE vec_id = 7),
        |s AS (SELECT vec_id,
        |  list_sum(list_transform(generate_series(1, len(v)), i -> v[i] * qv[i])) AS dp,
        |  sqrt(list_sum(list_transform(generate_series(1, len(v)), i -> v[i] * v[i]))) AS nv,
        |  sqrt(list_sum(list_transform(generate_series(1, len(qv)), i -> qv[i] * qv[i]))) AS nq
        |  FROM e CROSS JOIN q WHERE vec_id <> 7)
        |SELECT vec_id, round(dp / (nv * nq), 4) AS sim
        |FROM s ORDER BY sim DESC, vec_id LIMIT 10""".stripMargin) { (s, _) =>
      Similarity.cosineTopK(s.table("embeddings"), queryId = 7, k = 10)
    },

    // Rocchio pseudo-relevance feedback (two-pass dense retrieval): the
    // oracle replays pass 1, the rank-ordered left-fold query expansion
    // (alpha*q + beta/f * sum of feedback vectors), and pass 2
    df("ss_prf_rocchio",
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |q AS (SELECT v AS qv FROM e WHERE vec_id = 7),
        |s1 AS (SELECT vec_id, v, round(
        |  list_sum(list_transform(generate_series(1, len(v)), i -> v[i] * qv[i]))
        |  / (sqrt(list_sum(list_transform(generate_series(1, len(v)), i -> v[i] * v[i])))
        |   * sqrt(list_sum(list_transform(generate_series(1, len(qv)), i -> qv[i] * qv[i])))), 4) AS sim
        |  FROM e CROSS JOIN q WHERE vec_id <> 7),
        |fb AS (SELECT vec_id, sim, v FROM s1 ORDER BY sim DESC, vec_id LIMIT 5),
        |pk AS (SELECT list(v ORDER BY sim DESC, vec_id) AS vs FROM fb),
        |ex AS (SELECT list_reduce(
        |    list_prepend(list_transform(qv, x -> x * 1.0), vs),
        |    (acc, vv) -> list_transform(generate_series(1, len(acc)),
        |      i -> acc[i] + 0.75 / len(vs) * vv[i])) AS qx
        |  FROM pk CROSS JOIN q),
        |s2 AS (SELECT vec_id, round(
        |  list_sum(list_transform(generate_series(1, len(v)), i -> v[i] * qx[i]))
        |  / (sqrt(list_sum(list_transform(generate_series(1, len(v)), i -> v[i] * v[i])))
        |   * sqrt(list_sum(list_transform(generate_series(1, len(qx)), i -> qx[i] * qx[i])))), 4) AS sim
        |  FROM e CROSS JOIN ex WHERE vec_id <> 7)
        |SELECT vec_id, sim FROM s2 ORDER BY sim DESC, vec_id LIMIT 10""".stripMargin) { (s, _) =>
      Similarity.prfTopK(s.table("embeddings"), queryId = 7, k = 10,
        feedback = 5, alpha = 1.0, beta = 0.75)
    },

    // MMR diversity re-ranking: the oracle replays the pool, the rank-
    // indexed pool x pool sim matrix, and the k-step greedy argmax as a
    // recursive CTE picking the min (ns, id, ix) struct each round
    df("ss_mmr_rerank",
      """WITH RECURSIVE e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |q AS (SELECT v AS qv FROM e WHERE vec_id = 7),
        |s1 AS (SELECT vec_id, v, round(
        |  list_sum(list_transform(generate_series(1, len(v)), i -> v[i] * qv[i]))
        |  / (sqrt(list_sum(list_transform(generate_series(1, len(v)), i -> v[i] * v[i])))
        |   * sqrt(list_sum(list_transform(generate_series(1, len(qv)), i -> qv[i] * qv[i])))), 4) AS sim
        |  FROM e CROSS JOIN q WHERE vec_id <> 7),
        |pool AS (SELECT vec_id, sim, v FROM s1 ORDER BY sim DESC, vec_id LIMIT 20),
        |pk AS (SELECT list(struct_pack(id := vec_id, rel := sim, v := v)
        |    ORDER BY sim DESC, vec_id) AS cs0 FROM pool),
        |ws AS (SELECT list_transform(cs0, c -> struct_pack(id := c.id, rel := c.rel,
        |  sims := list_transform(cs0, d -> round(
        |    list_sum(list_transform(generate_series(1, len(c.v)), i -> c.v[i] * d.v[i]))
        |    / (sqrt(list_sum(list_transform(generate_series(1, len(c.v)), i -> c.v[i] * c.v[i])))
        |     * sqrt(list_sum(list_transform(generate_series(1, len(d.v)), i -> d.v[i] * d.v[i])))), 4)))) AS cs
        |  FROM pk),
        |g AS (SELECT 0 AS step, CAST([] AS INT[]) AS sel FROM ws
        |  UNION ALL
        |  SELECT g.step + 1, list_append(g.sel, struct_extract(list_reduce(
        |    list_transform(list_filter(generate_series(1, len(ws.cs)),
        |      i -> NOT list_contains(g.sel, i)),
        |    i -> struct_pack(
        |      ns := -(0.7 * struct_extract(ws.cs[i], 'rel') - 0.3 * list_reduce(
        |        list_prepend(-1.0, list_transform(g.sel,
        |          j -> struct_extract(ws.cs[i], 'sims')[j])),
        |        (m, x) -> greatest(m, x))),
        |      id := struct_extract(ws.cs[i], 'id'), ix := i)),
        |    (a, b) -> CASE WHEN b < a THEN b ELSE a END), 'ix'))
        |  FROM g, ws WHERE g.step < 10)
        |SELECT CAST(t.i AS INT) AS mmr_rank,
        |  struct_extract(ws.cs[g.sel[t.i]], 'id') AS vec_id,
        |  struct_extract(ws.cs[g.sel[t.i]], 'rel') AS rel
        |FROM g, ws, generate_series(1, 10) t(i) WHERE g.step = 10
        |ORDER BY mmr_rank""".stripMargin) { (s, _) =>
      Similarity.mmrTopK(s.table("embeddings"), queryId = 7, k = 10,
        pool = 20, mmrLambda = 0.7)
    },

    // retrieval-evaluation metrics (recall@k / MRR@k / nDCG@k — what the
    // ANN family is tuned against): arithmetic result/judgment fixture
    // with three per-query classes (dense hits incl. judged-irrelevant
    // ranks, sparse hits, zero hits), DCG discounts embedded as the SAME
    // Scala-computed double literals in both engines (libm log2 may
    // differ in the last ulp; a shared literal cannot), DCG row sums
    // nano-unit quantized
    df("ss_retrieval_eval",
      s"""WITH q2 AS (SELECT unnest(generate_series(0, 19)) AS qid),
         |rs AS (SELECT qid AS query_id, r AS rank,
         |    (qid*7 + (r+2)*(1 + qid%3)) % 50 AS doc_id
         |  FROM q2 CROSS JOIN generate_series(1, 10) t(r)),
         |qr AS (SELECT qid AS query_id, (qid*7 + g) % 50 AS doc_id,
         |    g % 4 AS grade
         |  FROM q2 CROSS JOIN generate_series(1, 8) t2(g)),
         |ws AS (SELECT [${(1 to 10).map(r =>
             RetrievalEval.dcgWeight(r).toString).mkString(", ")}] AS w),
         |tr AS (SELECT query_id,
         |    count(CASE WHEN grade > 0 THEN 1 END) AS n_relevant,
         |    list(grade ORDER BY grade DESC) FILTER (WHERE grade > 0) AS gs
         |  FROM qr GROUP BY query_id
         |  HAVING count(CASE WHEN grade > 0 THEN 1 END) > 0),
         |ti AS (SELECT query_id, n_relevant,
         |    list_sum(list_transform(generate_series(1, least(len(gs), 10)),
         |      i -> (2.0 ** gs[i] - 1) * w[i])) AS idcg
         |  FROM tr CROSS JOIN ws),
         |ht AS (SELECT r.query_id, r.rank, q.grade
         |  FROM rs r JOIN qr q USING (query_id, doc_id) WHERE r.rank <= 10),
         |pq AS (SELECT ht.query_id,
         |    count(CASE WHEN grade > 0 THEN 1 END) AS hit,
         |    count(*) AS judged_n,
         |    min(CASE WHEN grade > 0 THEN rank END) AS first,
         |    sum(CAST(round(((2.0 ** grade - 1) * w[rank]) * 1e9) AS BIGINT)) / 1e9 AS dcg
         |  FROM ht CROSS JOIN ws GROUP BY ht.query_id),
         |rt AS (SELECT query_id, count(*) AS nret FROM rs
         |  WHERE rank <= 10 GROUP BY query_id)
         |SELECT ti.query_id, CAST(ti.n_relevant AS BIGINT) AS n_relevant,
         |  round(coalesce(pq.hit, 0) / CAST(ti.n_relevant AS DOUBLE), 6) AS recall,
         |  round(coalesce(pq.hit, 0) /
         |    CAST(least(ti.n_relevant, 10) AS DOUBLE), 6) AS recall_capped,
         |  round(coalesce(1.0 / pq.first, 0.0), 6) AS rr,
         |  round(coalesce(pq.dcg, 0.0) / ti.idcg, 6) AS ndcg,
         |  round(coalesce(coalesce(pq.judged_n, 0) / CAST(rt.nret AS DOUBLE),
         |    0.0), 6) AS judged
         |FROM ti LEFT JOIN pq USING (query_id) LEFT JOIN rt USING (query_id)
         |ORDER BY query_id""".stripMargin) { (s, _) =>
      val results = s.range(20).select(col("id").as("query_id"),
          explode(sequence(lit(1), lit(10))).as("rank"))
        .select(col("query_id"), col("rank"),
          ((col("query_id") * 7 + (col("rank") + 2) *
            (lit(1) + col("query_id") % 3)) % 50).as("doc_id"))
      val qrels = s.range(20).select(col("id").as("query_id"),
          explode(sequence(lit(1), lit(8))).as("g"))
        .select(col("query_id"),
          ((col("query_id") * 7 + col("g")) % 50).as("doc_id"),
          (col("g") % 4).as("grade"))
      RetrievalEval.evaluate(results, qrels, k = 10).orderBy("query_id")
    },

    df("ss_lsh_buckets",
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |proj AS (SELECT vec_id, p,
        |  list_sum(list_transform(generate_series(1, 64),
        |    d -> v[d] * (strpos('0123456789abcdef', substring(md5(concat(p, '_', d - 1)), 1, 1)) - 8.5))) AS dp
        |  FROM e CROSS JOIN generate_series(0, 7) t(p)),
        |bucket AS (SELECT vec_id,
        |  string_agg(CASE WHEN dp > 0 THEN '1' ELSE '0' END, '' ORDER BY p) AS bucket
        |  FROM proj GROUP BY vec_id)
        |SELECT bucket, count(*) AS cnt FROM bucket GROUP BY bucket
        |ORDER BY bucket""".stripMargin) { (s, _) =>
      Similarity.lshBuckets(s.table("embeddings"), planes = 8, dims = 64)
        .groupBy("bucket").agg(count(lit(1)).as("cnt"))
        .orderBy("bucket")
    },

    df("ss_ann_lsh",
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |proj AS (SELECT vec_id, p,
        |  list_sum(list_transform(generate_series(1, 64),
        |    d -> v[d] * (strpos('0123456789abcdef', substring(md5(concat(p, '_', d - 1)), 1, 1)) - 8.5))) AS dp
        |  FROM e CROSS JOIN generate_series(0, 7) t(p)),
        |bucket AS (SELECT vec_id,
        |  string_agg(CASE WHEN dp > 0 THEN '1' ELSE '0' END, '' ORDER BY p) AS bucket
        |  FROM proj GROUP BY vec_id),
        |eb AS (SELECT e.vec_id, e.v, b.bucket FROM e JOIN bucket b ON b.vec_id = e.vec_id),
        |q AS (SELECT v AS qv, bucket AS qbucket FROM eb WHERE vec_id = 7),
        |s AS (SELECT eb.vec_id,
        |  list_sum(list_transform(generate_series(1, len(v)), i -> v[i] * qv[i])) AS dp,
        |  sqrt(list_sum(list_transform(generate_series(1, len(v)), i -> v[i] * v[i]))) AS nv,
        |  sqrt(list_sum(list_transform(generate_series(1, len(qv)), i -> qv[i] * qv[i]))) AS nq
        |  FROM eb JOIN q ON eb.bucket = q.qbucket WHERE eb.vec_id <> 7)
        |SELECT vec_id, round(dp / (nv * nq), 4) AS sim
        |FROM s ORDER BY sim DESC, vec_id LIMIT 10""".stripMargin) { (s, _) =>
      Similarity.annTopKLsh(s.table("embeddings"), queryId = 7, k = 10,
        planes = 8, dims = 64)
    },

    df("ss_ivf_cells",
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |cn AS (SELECT p, c, sqrt(list_sum(list_transform(generate_series(1, 64), i -> c[i] * c[i]))) AS nc
        |  FROM (SELECT p, list_transform(generate_series(1, 64),
        |    d -> (strpos('0123456789abcdef', substring(md5(concat(p + 1000, '_', d - 1)), 1, 1)) - 8.5)) AS c
        |  FROM generate_series(0, 7) t(p)) x),
        |scored AS (SELECT vec_id,
        |  list(list_sum(list_transform(generate_series(1, 64), i -> v[i] * c[i])) / nc ORDER BY p) AS scores
        |  FROM e CROSS JOIN cn GROUP BY vec_id),
        |cells AS (SELECT vec_id,
        |  list_position(scores, list_aggregate(scores, 'max')) - 1 AS cell FROM scored)
        |SELECT cell, count(*) AS cnt FROM cells GROUP BY cell ORDER BY cell""".stripMargin) {
      (s, _) =>
        Similarity.ivfCells(s.table("embeddings"), centroids = 8, dims = 64)
          .groupBy("cell").agg(count(lit(1)).as("cnt"))
          .orderBy("cell")
    },

    df("ss_ann_ivf",
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |cn AS (SELECT p, c, sqrt(list_sum(list_transform(generate_series(1, 64), i -> c[i] * c[i]))) AS nc
        |  FROM (SELECT p, list_transform(generate_series(1, 64),
        |    d -> (strpos('0123456789abcdef', substring(md5(concat(p + 1000, '_', d - 1)), 1, 1)) - 8.5)) AS c
        |  FROM generate_series(0, 7) t(p)) x),
        |scored AS (SELECT vec_id,
        |  list(list_sum(list_transform(generate_series(1, 64), i -> v[i] * c[i])) / nc ORDER BY p) AS scores
        |  FROM e CROSS JOIN cn GROUP BY vec_id),
        |cells AS (SELECT s.vec_id, e.v, s.scores,
        |  list_position(s.scores, list_aggregate(s.scores, 'max')) - 1 AS cell
        |  FROM scored s JOIN e ON e.vec_id = s.vec_id),
        |q AS (SELECT v AS qv, scores AS qscores,
        |  list_sort(scores, 'DESC')[2] AS thr FROM cells WHERE vec_id = 7),
        |cand AS (SELECT c.vec_id, c.v, q.qv FROM cells c CROSS JOIN q
        |  WHERE c.vec_id <> 7 AND q.qscores[c.cell + 1] >= q.thr),
        |sims AS (SELECT vec_id,
        |  list_sum(list_transform(generate_series(1, 64), i -> v[i] * qv[i])) AS dp,
        |  sqrt(list_sum(list_transform(generate_series(1, 64), i -> v[i] * v[i]))) AS nv,
        |  sqrt(list_sum(list_transform(generate_series(1, 64), i -> qv[i] * qv[i]))) AS nq
        |  FROM cand)
        |SELECT vec_id, round(dp / (nv * nq), 4) AS sim
        |FROM sims ORDER BY sim DESC, vec_id LIMIT 10""".stripMargin) { (s, _) =>
      Similarity.annTopKIvf(s.table("embeddings"), queryId = 7, k = 10,
        centroids = 8, nprobe = 2, dims = 64)
    },

    // trained IVF: one seeded sampled k-means iteration (vec_id % 5 sample,
    // element-wise round(avg,4) per cell; empty cells keep their seed), then
    // assignment of the whole corpus under the trained matrix. The oracle
    // recomputes the training pass — round(4) makes the trained centroids
    // engine-portable (see Similarity.ivfCentroidsTrained).
    df("ss_ivf_cells_trained",
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |cn AS (SELECT p, c, sqrt(list_sum(list_transform(generate_series(1, 64), i -> c[i] * c[i]))) AS nc
        |  FROM (SELECT p, list_transform(generate_series(1, 64),
        |    d -> (strpos('0123456789abcdef', substring(md5(concat(p + 1000, '_', d - 1)), 1, 1)) - 8.5)) AS c
        |  FROM generate_series(0, 7) t(p)) x),
        |s0 AS (SELECT vec_id,
        |  list(list_sum(list_transform(generate_series(1, 64), i -> v[i] * c[i])) / nc ORDER BY p) AS scores
        |  FROM e CROSS JOIN cn WHERE vec_id % 5 = 0 GROUP BY vec_id),
        |c0 AS (SELECT vec_id, list_position(scores, list_aggregate(scores, 'max')) - 1 AS cell FROM s0),
        |tr AS (SELECT cell, d, round(avg(v[d]), 4) AS cd
        |  FROM c0 JOIN e USING (vec_id) CROSS JOIN generate_series(1, 64) t(d)
        |  GROUP BY cell, d),
        |tl AS (SELECT cell, list(cd ORDER BY d) AS c FROM tr GROUP BY cell),
        |tc AS (SELECT cn.p, coalesce(tl.c, cn.c) AS c,
        |  sqrt(list_sum(list_transform(generate_series(1, 64),
        |    i -> coalesce(tl.c, cn.c)[i] * coalesce(tl.c, cn.c)[i]))) AS nc
        |  FROM cn LEFT JOIN tl ON tl.cell = cn.p),
        |scored AS (SELECT vec_id,
        |  list(list_sum(list_transform(generate_series(1, 64), i -> v[i] * c[i])) / nc ORDER BY p) AS scores
        |  FROM e CROSS JOIN tc GROUP BY vec_id),
        |cells AS (SELECT vec_id, list_position(scores, list_aggregate(scores, 'max')) - 1 AS cell FROM scored)
        |SELECT cell, count(*) AS cnt FROM cells GROUP BY cell ORDER BY cell""".stripMargin) {
      (s, _) =>
        Similarity.ivfCellsTrained(s.table("embeddings"), centroids = 8,
            dims = 64, sampleMod = 5)
          .groupBy("cell").agg(count(lit(1)).as("cnt"))
          .orderBy("cell")
    },

    df("ss_ann_ivf_trained",
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |cn AS (SELECT p, c, sqrt(list_sum(list_transform(generate_series(1, 64), i -> c[i] * c[i]))) AS nc
        |  FROM (SELECT p, list_transform(generate_series(1, 64),
        |    d -> (strpos('0123456789abcdef', substring(md5(concat(p + 1000, '_', d - 1)), 1, 1)) - 8.5)) AS c
        |  FROM generate_series(0, 7) t(p)) x),
        |s0 AS (SELECT vec_id,
        |  list(list_sum(list_transform(generate_series(1, 64), i -> v[i] * c[i])) / nc ORDER BY p) AS scores
        |  FROM e CROSS JOIN cn WHERE vec_id % 5 = 0 GROUP BY vec_id),
        |c0 AS (SELECT vec_id, list_position(scores, list_aggregate(scores, 'max')) - 1 AS cell FROM s0),
        |tr AS (SELECT cell, d, round(avg(v[d]), 4) AS cd
        |  FROM c0 JOIN e USING (vec_id) CROSS JOIN generate_series(1, 64) t(d)
        |  GROUP BY cell, d),
        |tl AS (SELECT cell, list(cd ORDER BY d) AS c FROM tr GROUP BY cell),
        |tc AS (SELECT cn.p, coalesce(tl.c, cn.c) AS c,
        |  sqrt(list_sum(list_transform(generate_series(1, 64),
        |    i -> coalesce(tl.c, cn.c)[i] * coalesce(tl.c, cn.c)[i]))) AS nc
        |  FROM cn LEFT JOIN tl ON tl.cell = cn.p),
        |scored AS (SELECT vec_id,
        |  list(list_sum(list_transform(generate_series(1, 64), i -> v[i] * c[i])) / nc ORDER BY p) AS scores
        |  FROM e CROSS JOIN tc GROUP BY vec_id),
        |cells AS (SELECT s.vec_id, e.v, s.scores,
        |  list_position(s.scores, list_aggregate(s.scores, 'max')) - 1 AS cell
        |  FROM scored s JOIN e ON e.vec_id = s.vec_id),
        |q AS (SELECT v AS qv, scores AS qscores,
        |  list_sort(scores, 'DESC')[2] AS thr FROM cells WHERE vec_id = 7),
        |cand AS (SELECT c.vec_id, c.v, q.qv FROM cells c CROSS JOIN q
        |  WHERE c.vec_id <> 7 AND q.qscores[c.cell + 1] >= q.thr),
        |sims AS (SELECT vec_id,
        |  list_sum(list_transform(generate_series(1, 64), i -> v[i] * qv[i])) AS dp,
        |  sqrt(list_sum(list_transform(generate_series(1, 64), i -> v[i] * v[i]))) AS nv,
        |  sqrt(list_sum(list_transform(generate_series(1, 64), i -> qv[i] * qv[i]))) AS nq
        |  FROM cand)
        |SELECT vec_id, round(dp / (nv * nq), 4) AS sim
        |FROM sims ORDER BY sim DESC, vec_id LIMIT 10""".stripMargin) { (s, _) =>
      Similarity.annTopKIvfTrained(s.table("embeddings"), queryId = 7, k = 10,
        centroids = 8, nprobe = 2, dims = 64, sampleMod = 5)
    },

    // class centroids: element-wise mean embedding per label (the building
    // block of IVF training / prototype classifiers). posexplode ≡
    // unnest+generate_subscripts; means are exact-order-independent enough
    // after round(4) since addition groups per dimension in both engines.
    df("ss_label_centroids",
      """SELECT label, d, CAST(round(avg(val) * 10000) AS BIGINT) / 10000.0 AS c FROM (
        |  SELECT label, generate_subscripts(v, 1) AS d, unnest(v) AS val
        |  FROM (SELECT label, embedding::DOUBLE[] AS v FROM embeddings) e) t
        |GROUP BY label, d ORDER BY label, d LIMIT 200""".stripMargin) { (s, _) =>
      s.table("embeddings")
        .select(col("label"), posexplode(Similarity.asDouble(col("embedding"))))
        .select(col("label"), (col("pos") + 1).cast("long").as("d"),
          col("col").as("val"))
        // roundZ: a per-dimension mean of signed embedding components
        // rounds to ZERO from below — the signed-zero hash class
        .groupBy("label", "d").agg(Similarity.roundZ(avg("val"), 4).as("c"))
        .orderBy("label", "d").limit(200)
    },

    // gap-based sessionization over the events stream (1h inactivity gap):
    // session boundaries via lag + running sum — the standard large-scale
    // sessionize; counts are oracle-exact on the raw ns timestamps.
    dialect("ev_sessionize",
      """WITH o AS (SELECT user_id, ts_ns, event_id,
        |  CASE WHEN ts_ns - (lag(ts_ns) OVER w) > 3600000000000 OR (lag(ts_ns) OVER w) IS NULL
        |       THEN 1 ELSE 0 END AS new_session
        |FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts_ns, event_id)),
        |s AS (SELECT user_id, sum(new_session) OVER (PARTITION BY user_id ORDER BY ts_ns, event_id
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id FROM o)
        |SELECT user_id, count(DISTINCT session_id) AS sessions, count(*) AS events
        |FROM s GROUP BY user_id ORDER BY user_id LIMIT 100""".stripMargin,
      """WITH o AS (SELECT user_id, epoch_ns(ts) AS ts_ns, event_id FROM events),
        |o2 AS (SELECT user_id, ts_ns, event_id,
        |  CASE WHEN ts_ns - (lag(ts_ns) OVER w) > 3600000000000 OR (lag(ts_ns) OVER w) IS NULL
        |       THEN 1 ELSE 0 END AS new_session
        |FROM o WINDOW w AS (PARTITION BY user_id ORDER BY ts_ns, event_id)),
        |s AS (SELECT user_id, sum(new_session) OVER (PARTITION BY user_id ORDER BY ts_ns, event_id
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id FROM o2)
        |SELECT user_id, count(DISTINCT session_id) AS sessions, count(*) AS events
        |FROM s GROUP BY user_id ORDER BY user_id LIMIT 100""".stripMargin),

    // ordered conversion funnel (view -> click -> purchase within 7 days
    // of the first view): per-user earliest-occurrence chaining, counts +
    // conversion per step
    df("ev_funnel",
      """WITH ev AS (SELECT user_id AS u, event_type AS ty,
        |  epoch_ns(ts) AS et FROM events),
        |s1 AS (SELECT u, min(et) AS t, min(et) AS anchor FROM ev
        |  WHERE ty = 'view' GROUP BY u),
        |s2 AS (SELECT e.u, min(e.et) AS t, min(s1.anchor) AS anchor
        |  FROM ev e JOIN s1 ON s1.u = e.u
        |  WHERE e.ty = 'click' AND e.et > s1.t
        |    AND e.et <= s1.anchor + 604800000000000 GROUP BY e.u),
        |s3 AS (SELECT e.u, min(e.et) AS t, min(s2.anchor) AS anchor
        |  FROM ev e JOIN s2 ON s2.u = e.u
        |  WHERE e.ty = 'purchase' AND e.et > s2.t
        |    AND e.et <= s2.anchor + 604800000000000 GROUP BY e.u),
        |c AS (SELECT 1 AS step, 'view' AS step_type, count(*) AS n_users
        |    FROM s1
        |  UNION ALL SELECT 2, 'click', count(*) FROM s2
        |  UNION ALL SELECT 3, 'purchase', count(*) FROM s3)
        |SELECT step, step_type, n_users,
        |  round(n_users / (SELECT n_users FROM c WHERE step = 1), 6)
        |    AS conversion
        |FROM c ORDER BY step""".stripMargin) { (s, _) =>
      Events.funnel(s.table("events"),
          Seq("view", "click", "purchase"), windowNs = 604800000000000L)
        .orderBy("step")
    },

    // cohort retention: users cohort by first-event day; distinct users
    // seen again per (cohort day, day offset)
    df("ev_retention",
      """WITH f AS (SELECT user_id AS u, min(CAST(ts AS DATE)) AS d0
        |  FROM events GROUP BY u),
        |r AS (SELECT DISTINCT e.user_id AS u, f.d0,
        |  date_diff('day', f.d0, CAST(e.ts AS DATE)) AS day_offset
        |  FROM events e JOIN f ON f.u = e.user_id)
        |SELECT strftime(d0, '%Y-%m-%d') AS cohort_day, day_offset,
        |  count(*) AS n_users
        |FROM r GROUP BY d0, day_offset
        |ORDER BY cohort_day, day_offset""".stripMargin) { (s, _) =>
      Events.retention(s.table("events"))
        .select(date_format(col("cohort_day"), "yyyy-MM-dd").as("cohort_day"),
          col("day_offset").cast("long").as("day_offset"), col("n_users"))
        .orderBy("cohort_day", "day_offset")
    },

    // session entry paths: the most common first-3 event-type sequences
    // of gap-based sessions (the sessionize rule) — funnel DISCOVERY
    // where ev_funnel is fixed-steps conversion
    df("ev_session_paths",
      """WITH o AS (SELECT user_id AS u, event_type AS ty,
        |  epoch_ns(ts) AS et, event_id AS eid FROM events),
        |o2 AS (SELECT *, CASE WHEN (lag(et) OVER w) IS NULL
        |    OR et - (lag(et) OVER w) > 3600000000000 THEN 1 ELSE 0 END AS ns
        |  FROM o WINDOW w AS (PARTITION BY u ORDER BY et, eid)),
        |s AS (SELECT u, ty, et, eid, sum(ns) OVER (PARTITION BY u
        |  ORDER BY et, eid ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |  AS sess FROM o2),
        |r AS (SELECT *, row_number() OVER (PARTITION BY u, sess
        |  ORDER BY et, eid) AS rn FROM s),
        |p AS (SELECT u, sess, string_agg(ty, '>' ORDER BY et, eid) AS path
        |  FROM r WHERE rn <= 3 GROUP BY u, sess)
        |SELECT path, count(*) AS n_sessions FROM p GROUP BY path
        |ORDER BY n_sessions DESC, path""".stripMargin) { (s, _) =>
      Events.sessionPaths(s.table("events"))
        .orderBy(col("n_sessions").desc, col("path"))
    },

    // per-session rollup (the sessionize rule): event count, wall
    // duration, entry/exit event types — the session feature table
    df("ev_session_stats",
      """WITH o AS (SELECT user_id AS u, event_type AS ty,
        |  epoch_ns(ts) AS et, event_id AS eid FROM events),
        |o2 AS (SELECT *, CASE WHEN (lag(et) OVER w) IS NULL
        |    OR et - (lag(et) OVER w) > 3600000000000 THEN 1 ELSE 0 END AS ns
        |  FROM o WINDOW w AS (PARTITION BY u ORDER BY et, eid)),
        |s AS (SELECT u, ty, et, eid, sum(ns) OVER (PARTITION BY u
        |  ORDER BY et, eid ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |  AS sess FROM o2),
        |s2 AS (SELECT *,
        |  first_value(ty) OVER (PARTITION BY u, sess ORDER BY et, eid)
        |    AS entry_type,
        |  last_value(ty) OVER (PARTITION BY u, sess ORDER BY et, eid
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |    AS exit_type
        |  FROM s)
        |SELECT u AS user_id, CAST(sess AS BIGINT) AS session_id,
        |  count(*) AS n_events,
        |  max(et) - min(et) AS duration_ns,
        |  min(entry_type) AS entry_type, min(exit_type) AS exit_type
        |FROM s2 GROUP BY u, sess
        |ORDER BY user_id, session_id LIMIT 200""".stripMargin) { (s, _) =>
      Events.sessionStats(s.table("events"))
        .select(col("u").as("user_id"), col("sess").as("session_id"),
          col("n_events"), col("duration_ns"),
          col("entry_type"), col("exit_type"))
        .orderBy("user_id", "session_id").limit(200)
    },

    // bounce rate by session entry type: share of sessions ending after
    // their single first event
    df("ev_bounce_rate",
      """WITH o AS (SELECT user_id AS u, event_type AS ty,
        |  epoch_ns(ts) AS et, event_id AS eid FROM events),
        |o2 AS (SELECT *, CASE WHEN (lag(et) OVER w) IS NULL
        |    OR et - (lag(et) OVER w) > 3600000000000 THEN 1 ELSE 0 END AS ns
        |  FROM o WINDOW w AS (PARTITION BY u ORDER BY et, eid)),
        |s AS (SELECT u, ty, et, eid, sum(ns) OVER (PARTITION BY u
        |  ORDER BY et, eid ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |  AS sess FROM o2),
        |s2 AS (SELECT u, sess,
        |  first_value(ty) OVER (PARTITION BY u, sess ORDER BY et, eid)
        |    AS entry_type, count(*) OVER (PARTITION BY u, sess) AS ne
        |  FROM s),
        |g AS (SELECT DISTINCT u, sess, entry_type, ne FROM s2)
        |SELECT entry_type, count(*) AS n_sessions,
        |  CAST(sum(CASE WHEN ne = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_bounces,
        |  round(sum(CASE WHEN ne = 1 THEN 1 ELSE 0 END)
        |    / CAST(count(*) AS DOUBLE), 6) AS bounce_rate
        |FROM g GROUP BY entry_type ORDER BY entry_type""".stripMargin) {
      (s, _) =>
      Events.bounceRate(s.table("events")).orderBy("entry_type")
    },

    // engagement deciles: users bucketed by event volume — the
    // power-user curve behind per-user sampling caps
    df("ev_engagement_deciles",
      """WITH pu AS (SELECT user_id AS u, count(*) AS n_events
        |  FROM events GROUP BY user_id),
        |d AS (SELECT u, n_events,
        |  ntile(10) OVER (ORDER BY n_events DESC, u) AS decile FROM pu)
        |SELECT decile, count(*) AS n_users,
        |  CAST(sum(n_events) AS BIGINT) AS total_events,
        |  max(n_events) AS max_events, min(n_events) AS min_events
        |FROM d GROUP BY decile ORDER BY decile""".stripMargin) { (s, _) =>
      Events.engagementDeciles(s.table("events"))
        .orderBy("decile")
    },

    // DAU + rolling 7-day active users per day: the engagement
    // denominator behind per-user sampling caps
    df("ev_active_users",
      """WITH ud AS (SELECT user_id AS u, CAST(ts AS DATE) AS d,
        |  count(*) AS ne FROM events GROUP BY 1, 2),
        |mx AS (SELECT max(d) AS md FROM ud),
        |e AS (SELECT u, ne, d + CAST(x AS INTEGER) AS day, x = 0 AS is_day
        |  FROM ud, unnest(generate_series(0, 6)) AS t(x))
        |SELECT strftime(day, '%Y-%m-%d') AS day,
        |  count(DISTINCT CASE WHEN is_day THEN u END) AS dau,
        |  count(DISTINCT u) AS rolling_active,
        |  CAST(sum(CASE WHEN is_day THEN ne END) AS BIGINT) AS n_events
        |FROM e, mx WHERE day <= md GROUP BY day ORDER BY day""".stripMargin) {
      (s, _) =>
      Events.activeUsers(s.table("events"))
        .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
          col("dau"), col("rolling_active"), col("n_events"))
        .orderBy("day")
    },

    // sketch-path active users (HLL++): the variant a billion-user
    // deployment runs; approx counts are engine-specific -> rows-only
    // check, the error bound is ScalaTest-pinned against the exact twin
    noOracle("ev_active_users_approx") { (s, _) =>
      Events.activeUsersApprox(s.table("events"))
        .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
          col("dau_approx"), col("rolling_active_approx"), col("n_events"))
        .orderBy("day")
    },

    // sketch-path engagement deciles: percentile_approx edges broadcast +
    // map-only bucketing, no single-partition ntile — the 100 TB variant;
    // sketch edges are engine-specific -> rows-only check, the bucket
    // error bound is ScalaTest-pinned against the exact twin
    noOracle("ev_engagement_deciles_approx") { (s, _) =>
      Events.engagementDecilesApprox(s.table("events"))
        .orderBy("decile")
    },

    // conversion attribution: first/last non-conversion touch before
    // each purchase — the acquisition-path matrix
    df("ev_attribution",
      """WITH o AS (SELECT user_id AS u, event_type AS ty,
        |  epoch_ns(ts) AS et, event_id AS eid FROM events),
        |t AS (SELECT *,
        |  first_value(CASE WHEN ty <> 'purchase' THEN ty END IGNORE NULLS)
        |    OVER (PARTITION BY u ORDER BY et, eid
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS ft,
        |  last_value(CASE WHEN ty <> 'purchase' THEN ty END IGNORE NULLS)
        |    OVER (PARTITION BY u ORDER BY et, eid
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS lt
        |  FROM o)
        |SELECT coalesce(ft, '(direct)') AS first_touch,
        |  coalesce(lt, '(direct)') AS last_touch,
        |  count(*) AS n_conversions, count(DISTINCT u) AS n_users
        |FROM t WHERE ty = 'purchase' GROUP BY 1, 2
        |ORDER BY first_touch, last_touch""".stripMargin) { (s, _) =>
      Events.attribution(s.table("events"), conversionType = "purchase")
        .orderBy("first_touch", "last_touch")
    },

    // session wall-duration distribution by entry type: exact p50/p90 of
    // the sessionize rollup — "landing page X starts long sessions"
    df("ev_session_duration_pct",
      """WITH o AS (SELECT user_id AS u, event_type AS ty,
        |  epoch_ns(ts) AS et, event_id AS eid FROM events),
        |o2 AS (SELECT *, CASE WHEN (lag(et) OVER w) IS NULL
        |    OR et - (lag(et) OVER w) > 3600000000000 THEN 1 ELSE 0 END AS ns
        |  FROM o WINDOW w AS (PARTITION BY u ORDER BY et, eid)),
        |s AS (SELECT u, ty, et, eid, sum(ns) OVER (PARTITION BY u
        |  ORDER BY et, eid ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |  AS sess FROM o2),
        |s2 AS (SELECT *,
        |  first_value(ty) OVER (PARTITION BY u, sess ORDER BY et, eid)
        |    AS entry_type FROM s),
        |g AS (SELECT u, sess, min(entry_type) AS entry_type,
        |  max(et) - min(et) AS duration_ns FROM s2 GROUP BY u, sess)
        |SELECT entry_type, count(*) AS n_sessions,
        |  round(quantile_cont(CAST(duration_ns AS DOUBLE), 0.5), 4)
        |    AS p50_duration_ns,
        |  round(quantile_cont(CAST(duration_ns AS DOUBLE), 0.9), 4)
        |    AS p90_duration_ns,
        |  CAST(max(duration_ns) AS BIGINT) AS max_duration_ns
        |FROM g GROUP BY entry_type ORDER BY entry_type""".stripMargin) {
      (s, _) =>
      Events.sessionStats(s.table("events"))
        .groupBy("entry_type")
        .agg(count(lit(1)).as("n_sessions"),
          round(percentile(col("duration_ns"), lit(0.5)), 4)
            .as("p50_duration_ns"),
          round(percentile(col("duration_ns"), lit(0.9)), 4)
            .as("p90_duration_ns"),
          max(col("duration_ns")).as("max_duration_ns"))
        .orderBy("entry_type")
    },

    // sketch-path session-duration percentiles: percentile_approx per
    // entry type (mergeable sketch — a hot landing page's full session
    // set never sits in one exact-percentile buffer); sketch values are
    // engine-specific -> rows-only check, bound pinned in EventsSpec vs
    // the exact twin above
    noOracle("ev_session_duration_pct_approx") { (s, _) =>
      Events.sessionStats(s.table("events"))
        .groupBy("entry_type")
        .agg(count(lit(1)).as("n_sessions"),
          percentile_approx(col("duration_ns").cast("double"), lit(0.5),
            lit(10000)).as("p50_duration_ns"),
          percentile_approx(col("duration_ns").cast("double"), lit(0.9),
            lit(10000)).as("p90_duration_ns"),
          max(col("duration_ns")).as("max_duration_ns"))
        .orderBy("entry_type")
    },

    // session transition matrix: next-event Markov table within gap
    // sessions, with P(to | from) and the terminal (end) step
    df("ev_transitions",
      """WITH o AS (SELECT user_id AS u, event_type AS ty,
        |  epoch_ns(ts) AS et, event_id AS eid FROM events),
        |o2 AS (SELECT *, CASE WHEN (lag(et) OVER w) IS NULL
        |    OR et - (lag(et) OVER w) > 3600000000000 THEN 1 ELSE 0 END AS ns
        |  FROM o WINDOW w AS (PARTITION BY u ORDER BY et, eid)),
        |s AS (SELECT u, ty, et, eid, sum(ns) OVER (PARTITION BY u
        |  ORDER BY et, eid ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |  AS sess FROM o2),
        |t AS (SELECT ty AS from_type,
        |  coalesce(lead(ty) OVER (PARTITION BY u, sess ORDER BY et, eid),
        |    '(end)') AS to_type FROM s),
        |g AS (SELECT from_type, to_type, count(*) AS n_transitions
        |  FROM t GROUP BY 1, 2)
        |SELECT from_type, to_type, n_transitions,
        |  round(n_transitions /
        |    sum(n_transitions) OVER (PARTITION BY from_type), 6) AS p
        |FROM g ORDER BY from_type, to_type""".stripMargin) { (s, _) =>
      Events.transitions(s.table("events"))
        .orderBy("from_type", "to_type")
    },

    // DAU forecast: the product KPI run through the METRICS family's
    // Holt-Winters operator (cross-family reuse — the per-day DAU series
    // dressed in the metric-series schema rides the exact recurrence the
    // PromQL surface serves); oracle unrolls the same recursion
    df("ev_dau_forecast",
      """WITH RECURSIVE g AS (SELECT CAST(ts AS DATE) AS day,
        |  count(DISTINCT user_id) AS dau FROM events GROUP BY 1),
        |pts AS (SELECT CAST(dau AS DOUBLE) AS v,
        |  CAST(row_number() OVER (ORDER BY day) AS INT) AS i FROM g),
        |n AS (SELECT CAST(max(i) AS BIGINT) AS n FROM pts),
        |ld AS (SELECT strftime(max(day), '%Y-%m-%d') AS last_day FROM g),
        |hw AS (SELECT 2 AS i, p2.v AS s, p2.v - p1.v AS b
        |  FROM pts p1, pts p2 WHERE p1.i = 1 AND p2.i = 2
        |  UNION ALL
        |  SELECT hw.i + 1, 0.5 * p.v + 0.5 * (hw.s + hw.b),
        |    0.3 * ((0.5 * p.v + 0.5 * (hw.s + hw.b)) - hw.s) + 0.7 * hw.b
        |  FROM hw JOIN pts p ON p.i = hw.i + 1)
        |SELECT 'dau' AS "name", ld.last_day, n.n AS n_points,
        |  round(hw.s, 6) AS smoothed
        |FROM n CROSS JOIN ld LEFT JOIN hw ON hw.i = n.n""".stripMargin) {
      (s, _) =>
      val series = s.table("events")
        .groupBy(to_date(col("ts")).as("day"))
        .agg(count_distinct(col("user_id")).as("int_value"))
        .select(lit("dau").as("name"),
          lit(null).cast("string").as("service_name"),
          lit(null).cast("string").as("service_namespace"),
          lit(null).cast("string").as("service_instance_id"),
          lit(null).cast("string").as("resource_attributes"),
          lit(null).cast("string").as("scope_name"),
          lit(null).cast("string").as("metric_attributes"),
          col("day").cast("timestamp").as("time_unix_nano"),
          col("int_value"), lit(null).cast("double").as("double_value"))
      graft.operators.Metrics.holtWinters(series, sf = 0.5, tf = 0.3)
        .select(col("name"),
          date_format(col("last_time"), "yyyy-MM-dd").as("last_day"),
          col("n_points"), col("smoothed"))
    },

    // inter-event gap distribution per event type (gap attributed to the
    // EARLIER event — "how long after an X does the user act again"):
    // the dwell/hazard panel behind session-gap tuning
    df("ev_inter_event",
      """WITH o AS (SELECT user_id AS u, event_type AS ty,
        |  epoch_ns(ts) AS et, event_id AS eid FROM events),
        |g AS (SELECT ty, (lead(et) OVER (PARTITION BY u ORDER BY et, eid))
        |    - et AS gap_ns FROM o)
        |SELECT ty AS event_type, count(*) AS n_gaps,
        |  round(quantile_cont(CAST(gap_ns AS DOUBLE), 0.5), 4) AS p50_gap_ns,
        |  round(quantile_cont(CAST(gap_ns AS DOUBLE), 0.9), 4) AS p90_gap_ns,
        |  CAST(max(gap_ns) AS BIGINT) AS max_gap_ns
        |FROM g WHERE gap_ns IS NOT NULL
        |GROUP BY ty ORDER BY event_type""".stripMargin) { (s, _) =>
      Events.interEventGaps(s.table("events")).orderBy("event_type")
    },

    // DAU/MAU stickiness: daily active over rolling-28-day active — the
    // engagement-intensity ratio
    df("ev_stickiness",
      """WITH ud AS (SELECT user_id AS u, CAST(ts AS DATE) AS d,
        |  count(*) AS ne FROM events GROUP BY 1, 2),
        |mx AS (SELECT max(d) AS md FROM ud),
        |e AS (SELECT u, d + CAST(x AS INTEGER) AS day, x = 0 AS is_day
        |  FROM ud, unnest(generate_series(0, 27)) AS t(x)),
        |g AS (SELECT strftime(day, '%Y-%m-%d') AS day,
        |  count(DISTINCT CASE WHEN is_day THEN u END) AS dau,
        |  count(DISTINCT u) AS mau
        |  FROM e, mx WHERE day <= md GROUP BY day)
        |SELECT day, dau, mau, round(dau / mau, 6) AS stickiness
        |FROM g ORDER BY day""".stripMargin) { (s, _) =>
      Events.activeUsers(s.table("events"), windowDays = 28)
        .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
          col("dau"), col("rolling_active").as("mau"),
          round(col("dau") / col("rolling_active"), 6).as("stickiness"))
        .orderBy("day")
    },

    // RFM segmentation: recency/frequency/monetary per user, each scored
    // 1-4 against the global quartiles (edges + values round(6) so an
    // engine-ulp cannot flip a score); recency inverted (recent = 4)
    df("ev_rfm",
      """WITH pu AS (SELECT user_id, max(CAST(ts AS DATE)) AS last_day,
        |  CAST(count(*) AS BIGINT) AS frequency,
        |  round(sum("value"), 6) AS monetary
        |  FROM events GROUP BY user_id),
        |mx AS (SELECT max(last_day) AS corpus_last FROM pu),
        |b AS (SELECT user_id,
        |  CAST(datediff('day', last_day, corpus_last) AS BIGINT)
        |    AS recency_days, frequency, monetary FROM pu, mx),
        |e AS (SELECT
        |  list_transform(quantile_cont(CAST(recency_days AS DOUBLE),
        |    [0.25, 0.5, 0.75]), x -> round(x, 6)) AS re,
        |  list_transform(quantile_cont(CAST(frequency AS DOUBLE),
        |    [0.25, 0.5, 0.75]), x -> round(x, 6)) AS fe,
        |  list_transform(quantile_cont(monetary,
        |    [0.25, 0.5, 0.75]), x -> round(x, 6)) AS me FROM b),
        |s AS (SELECT user_id, recency_days, frequency, monetary,
        |  4 - CAST(len(list_filter(re,
        |    q -> CAST(recency_days AS DOUBLE) > q)) AS BIGINT) AS r_score,
        |  1 + CAST(len(list_filter(fe,
        |    q -> CAST(frequency AS DOUBLE) > q)) AS BIGINT) AS f_score,
        |  1 + CAST(len(list_filter(me, q -> monetary > q)) AS BIGINT)
        |    AS m_score
        |  FROM b, e)
        |SELECT user_id, recency_days, frequency, monetary,
        |  r_score, f_score, m_score,
        |  concat(r_score, f_score, m_score) AS segment
        |FROM s ORDER BY user_id LIMIT 200""".stripMargin) { (s, _) =>
      Events.rfm(s.table("events")).orderBy("user_id").limit(200)
    },

    // sketch-path RFM: percentile_approx quartile edges (mergeable
    // sketch, no full-frame percentile buffer) — edges are
    // engine-specific -> rows-only check; per-user score displacement
    // <= 1 per dimension is EventsSpec-pinned vs the exact twin
    noOracle("ev_rfm_approx") { (s, _) =>
      Events.rfmApprox(s.table("events")).orderBy("user_id").limit(200)
    },

    // cohort churn: users inactive for the corpus's trailing week, per
    // first-event-day cohort
    df("ev_churn",
      """WITH pu AS (SELECT user_id AS u, min(CAST(ts AS DATE)) AS cohort_day,
        |  max(CAST(ts AS DATE)) AS last_day FROM events GROUP BY 1),
        |mx AS (SELECT max(last_day) AS corpus_end FROM pu),
        |c AS (SELECT cohort_day,
        |  CASE WHEN datediff('day', last_day, corpus_end) >= 7
        |    THEN 1 ELSE 0 END AS churned FROM pu, mx)
        |SELECT strftime(cohort_day, '%Y-%m-%d') AS cohort_day,
        |  count(*) AS cohort_size,
        |  CAST(sum(churned) AS BIGINT) AS n_churned,
        |  round(CAST(sum(churned) AS DOUBLE) / count(*), 6) AS churn_rate
        |FROM c GROUP BY 1 ORDER BY cohort_day""".stripMargin) { (s, _) =>
      Events.churn(s.table("events"))
        .select(date_format(col("cohort_day"), "yyyy-MM-dd").as("cohort_day"),
          col("cohort_size"), col("n_churned"), col("churn_rate"))
        .orderBy("cohort_day")
    },

    // activity heatmap by (day-of-week 1=Sunday, hour): the load-shape
    // panel; DuckDB's 0-based dow shifts +1 to Spark's rule
    df("ev_hour_dow",
      """SELECT CAST(dayofweek(ts) + 1 AS BIGINT) AS dow,
        |  CAST(hour(ts) AS BIGINT) AS "hour",
        |  count(*) AS n_events,
        |  count(DISTINCT user_id) AS n_users,
        |  round(sum("value"), 6) AS total_value
        |FROM events GROUP BY 1, 2 ORDER BY dow, "hour"""".stripMargin) {
      (s, _) =>
      Events.hourDowHeatmap(s.table("events")).orderBy("dow", "hour")
    },

    // power-user share: events produced by the most-active 1% of users,
    // over the same count histogram as the Gini (mid-level exact split)
    df("ev_power_share",
      """WITH pu AS (SELECT user_id AS u, count(*) AS n
        |  FROM events GROUP BY 1),
        |h AS (SELECT n, CAST(count(*) AS BIGINT) AS nu FROM pu GROUP BY 1),
        |t AS (SELECT CAST(sum(nu) AS BIGINT) AS tu,
        |  CAST(sum(n * nu) AS BIGINT) AS te FROM h),
        |w AS (SELECT n, nu, tu, te,
        |  CAST(ceil(0.01 * tu) AS BIGINT) AS k,
        |  CAST(sum(nu) OVER (ORDER BY n DESC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS cum_u FROM h, t),
        |s AS (SELECT tu, te, k, n,
        |  greatest(0, least(nu, k - (cum_u - nu))) AS take_u FROM w)
        |SELECT max(tu) AS n_users, max(te) AS n_events,
        |  max(k) AS top_k_users,
        |  CAST(sum(take_u * n) AS BIGINT) AS top_events,
        |  round(CAST(sum(take_u * n) AS DOUBLE) / max(te), 6) AS top_share
        |FROM s""".stripMargin) { (s, _) =>
      Events.powerUserShare(s.table("events"))
    },

    // engagement Gini: inequality of events-per-user via the exact
    // Lorenz trapezoid over the count-of-counts histogram
    df("ev_gini",
      """WITH pu AS (SELECT user_id AS u, count(*) AS n
        |  FROM events GROUP BY 1),
        |h AS (SELECT n, count(*) AS nu FROM pu GROUP BY 1),
        |t AS (SELECT sum(nu) AS tu, sum(n * nu) AS te FROM h),
        |c AS (SELECT n, nu,
        |  sum(nu) OVER w AS cu, sum(n * nu) OVER w AS ce
        |  FROM h WINDOW w AS (ORDER BY n
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |l AS (SELECT cu / t.tu AS p, ce / t.te AS lz,
        |  coalesce(lag(cu / t.tu) OVER (ORDER BY n), 0) AS p0,
        |  coalesce(lag(ce / t.te) OVER (ORDER BY n), 0) AS lz0
        |  FROM c, t)
        |SELECT round(1 - sum((p - p0) * (lz + lz0)), 6) AS gini,
        |  (SELECT CAST(tu AS BIGINT) FROM t) AS n_users,
        |  (SELECT CAST(te AS BIGINT) FROM t) AS n_events
        |FROM l""".stripMargin) { (s, _) =>
      Events.engagementGini(s.table("events"))
    },

    // corpus n-gram diversity: distinct-1 / distinct-2 ratios per source
    // (the generation-diversity metric applied to corpus strata)
    df("ta_distinct_ngrams",
      """WITH d AS (SELECT source,
        |  list_filter(regexp_split_to_array(lower(text), '\s+'),
        |    x -> len(x) > 0) AS ws FROM documents),
        |u AS (SELECT source, count(*) AS n_tokens,
        |  count(DISTINCT w) AS d_uni
        |  FROM (SELECT source, unnest(ws) AS w FROM d) GROUP BY source),
        |b AS (SELECT source, count(*) AS n_bi, count(DISTINCT bg) AS d_bi
        |  FROM (SELECT source, unnest(CASE WHEN len(ws) < 2 THEN []
        |    ELSE list_transform(generate_series(1, len(ws) - 1),
        |      i -> ws[i] || ' ' || ws[i + 1]) END) AS bg FROM d)
        |  GROUP BY source)
        |SELECT u.source, n_tokens, round(d_uni / n_tokens, 6) AS distinct_1,
        |  round(d_bi / n_bi, 6) AS distinct_2
        |FROM u JOIN b USING (source) ORDER BY source""".stripMargin) {
      (s, _) =>
      val d = s.table("documents").select(col("source"),
        expr("filter(split(lower(text), '\\\\s+'), x -> length(x) > 0)")
          .as("ws"))
      val uni = d.select(col("source"), explode(col("ws")).as("w"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_tokens"), countDistinct(col("w")).as("d_uni"))
      val bi = d.select(col("source"), explode(expr(
          """CASE WHEN size(ws) < 2 THEN array()
            |ELSE transform(sequence(1, size(ws) - 1),
            |  i -> concat(try_element_at(ws, i), ' ',
            |    try_element_at(ws, i + 1))) END""".stripMargin)).as("bg"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_bi"), countDistinct(col("bg")).as("d_bi"))
      uni.join(bi, Seq("source"))
        .select(col("source"), col("n_tokens"),
          round(col("d_uni") / col("n_tokens"), 6).as("distinct_1"),
          round(col("d_bi") / col("n_bi"), 6).as("distinct_2"))
        .orderBy("source")
    },

    // event value distribution: exact p50/p90/p99 of the value payload
    // per event type — the order-value / latency-payload profile
    df("ev_value_percentiles",
      """SELECT event_type, count(*) AS n_events,
        |  round(sum("value"), 4) AS total_value,
        |  round(quantile_cont("value", 0.5), 6) AS p50,
        |  round(quantile_cont("value", 0.9), 6) AS p90,
        |  round(quantile_cont("value", 0.99), 6) AS p99
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) {
      (s, _) =>
      s.table("events").groupBy("event_type")
        .agg(count(lit(1)).as("n_events"),
          round(sum(col("value")), 4).as("total_value"),
          round(expr("percentile(value, 0.5)"), 6).as("p50"),
          round(expr("percentile(value, 0.9)"), 6).as("p90"),
          round(expr("percentile(value, 0.99)"), 6).as("p99"))
        .orderBy("event_type")
    },

    // time-to-convert: per converting user the first-view -> first-
    // purchase delay, summarized as exact percentiles
    df("ev_time_to_convert",
      """WITH u AS (SELECT user_id,
        |  min(CASE WHEN event_type = 'view' THEN epoch_ns(ts) END) AS v0,
        |  min(CASE WHEN event_type = 'purchase' THEN epoch_ns(ts) END) AS p0
        |  FROM events GROUP BY user_id),
        |d AS (SELECT CAST(p0 - v0 AS DOUBLE) AS delta_ns FROM u
        |  WHERE v0 IS NOT NULL AND p0 IS NOT NULL AND p0 > v0)
        |SELECT count(*) AS n_users,
        |  round(quantile_cont(delta_ns, 0.5), 4) AS p50_ns,
        |  round(quantile_cont(delta_ns, 0.9), 4) AS p90_ns,
        |  CAST(max(delta_ns) AS BIGINT) AS max_ns
        |FROM d""".stripMargin) { (s, _) =>
      s.table("events")
        .groupBy("user_id")
        .agg(min(when(col("event_type") === "view", col("ts_ns"))).as("v0"),
          min(when(col("event_type") === "purchase", col("ts_ns"))).as("p0"))
        .where(col("v0").isNotNull && col("p0").isNotNull &&
          col("p0") > col("v0"))
        .select((col("p0") - col("v0")).cast("double").as("delta_ns"))
        .agg(count(lit(1)).as("n_users"),
          round(expr("percentile(delta_ns, 0.5)"), 4).as("p50_ns"),
          round(expr("percentile(delta_ns, 0.9)"), 4).as("p90_ns"),
          max(col("delta_ns")).cast("long").as("max_ns"))
    },

    // cohort LTV curve: cumulative value per cohort over day offsets,
    // plus cumulative value per cohort user — retention's value twin
    df("ev_cohort_ltv",
      """WITH f AS (SELECT user_id AS u, min(CAST(ts AS DATE)) AS d0
        |  FROM events GROUP BY u),
        |o AS (SELECT e.user_id AS u, f.d0,
        |  date_diff('day', f.d0, CAST(e.ts AS DATE)) AS day_offset,
        |  e."value" AS v
        |  FROM events e JOIN f ON f.u = e.user_id),
        |g AS (SELECT d0, day_offset, count(DISTINCT u) AS n_active,
        |  round(sum(v), 4) AS day_value
        |  FROM o GROUP BY 1, 2),
        |c AS (SELECT *, round(sum(day_value) OVER w, 4) AS cum_value,
        |  first_value(n_active) OVER w AS cohort_size
        |  FROM g WINDOW w AS (PARTITION BY d0 ORDER BY day_offset
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT strftime(d0, '%Y-%m-%d') AS cohort_day, day_offset,
        |  n_active, day_value, cum_value,
        |  round(cum_value / cohort_size, 6) AS ltv_per_user
        |FROM c ORDER BY cohort_day, day_offset""".stripMargin) { (s, _) =>
      Events.cohortValue(s.table("events"))
        .select(date_format(col("cohort_day"), "yyyy-MM-dd").as("cohort_day"),
          col("day_offset").cast("long").as("day_offset"),
          col("n_active"), col("day_value"), col("cum_value"),
          col("ltv_per_user"))
        .orderBy("cohort_day", "day_offset")
    },

    // heavy hitters: top-20 corpus tokens by frequency
    dialect("ta_top_tokens",
      """SELECT w, count(*) AS cnt FROM (
        |  SELECT explode(filter(split(lower(text), '\\s+'), x -> length(x) > 0)) AS w
        |  FROM documents) t
        |GROUP BY w ORDER BY cnt DESC, w LIMIT 20""".stripMargin,
      """SELECT w, count(*) AS cnt FROM (
        |  SELECT unnest(list_filter(regexp_split_to_array(lower(text), '\s+'),
        |    x -> len(x) > 0)) AS w
        |  FROM documents) t
        |GROUP BY w ORDER BY cnt DESC, w LIMIT 20""".stripMargin),

    // ---- text analysis ----------------------------------------------------

    df("ta_token_count",
      """SELECT doc_id,
        |  CAST(len(list_filter(regexp_split_to_array(text, '\s+'), x -> len(x) > 0)) AS BIGINT) AS ws_tokens,
        |  CAST(coalesce(list_sum(list_transform(regexp_extract_all(text, '[A-Za-z]+', 0),
        |      w -> CAST(ceil(len(w) / 4.0) AS BIGINT))), 0)
        |    + len(regexp_replace(text, '[A-Za-z\s]', '', 'g')) AS BIGINT) AS bpeish_tokens
        |FROM documents ORDER BY doc_id LIMIT 100""".stripMargin) { (s, _) =>
      s.table("documents").select(col("doc_id"),
          TextAnalysis.wsTokens(col("text")).cast("long").as("ws_tokens"),
          TextAnalysis.bpeishTokens(col("text")).as("bpeish_tokens"))
        .orderBy("doc_id").limit(100)
    },

    df("ta_quality_score",
      """WITH w AS (SELECT doc_id, text,
        |  list_filter(regexp_split_to_array(lower(text), '\s+'), x -> len(x) > 0) AS words
        |  FROM documents),
        |f AS (SELECT doc_id,
        |  CAST(len(words) AS BIGINT) AS word_cnt,
        |  round(CAST(len(regexp_replace(text, '\s', '', 'g')) AS DOUBLE) / len(words), 4) AS mean_word_len,
        |  round(CAST(len(list_filter(words, x -> x IN ('the','a','an','and','of','to','in','is'))) AS DOUBLE) / len(words), 4) AS stop_ratio,
        |  round(CAST(len(regexp_replace(text, '[A-Za-z0-9\s]', '', 'g')) AS DOUBLE) / greatest(len(text), 1), 4) AS punct_ratio
        |  FROM w)
        |SELECT doc_id, word_cnt, mean_word_len, stop_ratio, punct_ratio,
        |  CAST(round((CASE WHEN word_cnt BETWEEN 5 AND 100000 THEN 0.25 ELSE 0.0 END)
        |      + (CASE WHEN mean_word_len BETWEEN 2.0 AND 12.0 THEN 0.25 ELSE 0.0 END)
        |      + (CASE WHEN stop_ratio > 0.01 THEN 0.25 ELSE 0.0 END)
        |      + (CASE WHEN punct_ratio < 0.2 THEN 0.25 ELSE 0.0 END), 2)
        |    AS DOUBLE) AS quality
        |FROM f ORDER BY doc_id LIMIT 100""".stripMargin) { (s, _) =>
      TextAnalysis.qualityScore(s.table("documents")).orderBy("doc_id").limit(100)
    },

    // Flesch reading-ease + FK grade from regexp proxies (ws-token words,
    // [.!?]+ sentence runs floor 1, vowel-group syllables); identical
    // left-assoc arithmetic both sides so the round(4) cannot diverge
    df("ta_readability",
      """WITH f AS (SELECT doc_id,
        |  CAST(len(list_filter(regexp_split_to_array(text, '\s+'),
        |    x -> len(x) > 0)) AS BIGINT) AS n_words,
        |  CAST(greatest(1, len(regexp_extract_all(text, '[.!?]+')))
        |    AS BIGINT) AS n_sentences,
        |  CAST(len(regexp_extract_all(lower(text), '[aeiouy]+'))
        |    AS BIGINT) AS n_syllables
        |  FROM documents)
        |SELECT doc_id, n_words, n_sentences, n_syllables,
        |  CASE WHEN n_words > 0 THEN round(206.835
        |    - 1.015 * (CAST(n_words AS DOUBLE) / n_sentences)
        |    - 84.6 * (CAST(n_syllables AS DOUBLE) / n_words), 4) END
        |    AS flesch_ease,
        |  CASE WHEN n_words > 0 THEN round(0.39
        |    * (CAST(n_words AS DOUBLE) / n_sentences)
        |    + 11.8 * (CAST(n_syllables AS DOUBLE) / n_words)
        |    - 15.59, 4) END AS fk_grade
        |FROM f ORDER BY doc_id LIMIT 200""".stripMargin) { (s, _) =>
      TextAnalysis.readability(s.table("documents"))
        .orderBy("doc_id").limit(200)
    },

    df("ta_langid",
      """WITH w AS (SELECT doc_id,
        |  list_filter(regexp_split_to_array(lower(text), '\s+'), x -> len(x) > 0) AS words
        |  FROM documents),
        |c AS (SELECT doc_id,
        |  len(list_filter(words, x -> x IN ('the','and','of','is','a'))) AS c_en,
        |  len(list_filter(words, x -> x IN ('der','die','und','das','ist'))) AS c_de,
        |  len(list_filter(words, x -> x IN ('le','la','et','les','est'))) AS c_fr,
        |  len(list_filter(words, x -> x IN ('el','la','y','los','es'))) AS c_es
        |  FROM w)
        |SELECT doc_id,
        |  CASE WHEN c_en = best AND best > 0 THEN 'en'
        |       WHEN c_de = best AND best > 0 THEN 'de'
        |       WHEN c_fr = best AND best > 0 THEN 'fr'
        |       WHEN c_es = best AND best > 0 THEN 'es'
        |       ELSE 'und' END AS lang_pred
        |FROM (SELECT *, greatest(c_en, c_de, c_fr, c_es) AS best FROM c) t
        |ORDER BY doc_id LIMIT 200""".stripMargin) { (s, _) =>
      TextAnalysis.langId(s.table("documents")).orderBy("doc_id").limit(200)
    },

    // per-source document-length bands: the truncation/packing policy
    // input — how long is this source's tail, exactly
    df("ta_length_bands",
      """SELECT source, count(*) AS n_docs,
        |  round(quantile_cont(CAST(n_chars AS DOUBLE), 0.1), 4) AS p10_chars,
        |  round(quantile_cont(CAST(n_chars AS DOUBLE), 0.5), 4) AS p50_chars,
        |  round(quantile_cont(CAST(n_chars AS DOUBLE), 0.9), 4) AS p90_chars,
        |  CAST(max(n_chars) AS BIGINT) AS max_chars
        |FROM documents GROUP BY source ORDER BY source""".stripMargin) {
      (s, _) =>
      s.table("documents").groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          round(percentile(col("n_chars"), lit(0.1)), 4).as("p10_chars"),
          round(percentile(col("n_chars"), lit(0.5)), 4).as("p50_chars"),
          round(percentile(col("n_chars"), lit(0.9)), 4).as("p90_chars"),
          max(col("n_chars")).as("max_chars"))
        .orderBy("source")
    },

    // language purity audit: the labeled lang vs the n-gram prediction as
    // a per-source confusion matrix — the "is src3 really Spanish"
    // curation diagnostic (composes langId against the lang column)
    df("ta_lang_purity",
      """WITH w AS (SELECT doc_id,
        |  list_filter(regexp_split_to_array(lower(text), '\s+'), x -> len(x) > 0) AS words
        |  FROM documents),
        |c AS (SELECT doc_id,
        |  len(list_filter(words, x -> x IN ('the','and','of','is','a'))) AS c_en,
        |  len(list_filter(words, x -> x IN ('der','die','und','das','ist'))) AS c_de,
        |  len(list_filter(words, x -> x IN ('le','la','et','les','est'))) AS c_fr,
        |  len(list_filter(words, x -> x IN ('el','la','y','los','es'))) AS c_es
        |  FROM w),
        |lp AS (SELECT doc_id,
        |  CASE WHEN c_en = best AND best > 0 THEN 'en'
        |       WHEN c_de = best AND best > 0 THEN 'de'
        |       WHEN c_fr = best AND best > 0 THEN 'fr'
        |       WHEN c_es = best AND best > 0 THEN 'es'
        |       ELSE 'und' END AS lang_pred
        |FROM (SELECT *, greatest(c_en, c_de, c_fr, c_es) AS best FROM c) t)
        |SELECT d.source, d.lang, lp.lang_pred, count(*) AS n_docs
        |FROM documents d JOIN lp ON lp.doc_id = d.doc_id
        |GROUP BY 1, 2, 3
        |ORDER BY source, lang, lang_pred""".stripMargin) { (s, _) =>
      val docs = s.table("documents")
      TextAnalysis.langId(docs)
        .join(docs.select(col("doc_id"), col("source"), col("lang")), "doc_id")
        .groupBy("source", "lang", "lang_pred")
        .agg(count(lit(1)).as("n_docs"))
        .orderBy("source", "lang", "lang_pred")
    },

    df("ta_fingerprint",
      """SELECT doc_id, md5(array_to_string(list_sort(list_distinct(
        |  list_filter(regexp_split_to_array(lower(text), '\s+'), x -> len(x) > 0))), ' ')) AS fingerprint
        |FROM documents ORDER BY doc_id LIMIT 100""".stripMargin) { (s, _) =>
      TextAnalysis.fingerprint(s.table("documents")).orderBy("doc_id").limit(100)
    },

    df("ta_winnowing",
      """WITH d AS (SELECT doc_id, lower(text) AS t FROM documents WHERE length(text) >= 8),
        |h AS (SELECT doc_id,
        |  list_transform(generate_series(1, length(t) - 7),
        |    p -> substring(md5(substr(t, p, 8)), 1, 8)) AS hs FROM d),
        |fp AS (SELECT doc_id, list_sort(list_distinct(
        |  list_transform(generate_series(4, len(hs)),
        |    i -> list_aggregate(list_slice(hs, i - 3, i), 'min')))) AS l FROM h)
        |SELECT doc_id, CAST(len(l) AS BIGINT) AS n_fingerprints,
        |  md5(array_to_string(l, ',')) AS fp_digest
        |FROM fp ORDER BY doc_id LIMIT 100""".stripMargin) { (s, _) =>
      TextAnalysis.winnowing(s.table("documents"), k = 8, w = 4)
        .orderBy("doc_id").limit(100)
    },

    dialect("ta_vocab",
      """SELECT count(DISTINCT w) AS vocab, count(*) AS total_tokens FROM (
        |  SELECT explode(filter(split(lower(text), '\\s+'), x -> length(x) > 0)) AS w
        |  FROM documents) t""".stripMargin,
      """SELECT count(DISTINCT w) AS vocab, count(*) AS total_tokens FROM (
        |  SELECT unnest(list_filter(regexp_split_to_array(lower(text), '\s+'),
        |    x -> len(x) > 0)) AS w
        |  FROM documents) t""".stripMargin),

    // Zipf's-law fit over the unigram distribution: ln(freq) ~ ln(rank)
    // least squares — slope ≈ -1 with high r² marks natural language; a
    // flattening slope flags boilerplate/templated text taking over
    df("ta_zipf",
      """WITH toks AS (SELECT unnest(list_filter(
        |    regexp_split_to_array(lower(text), '\s+'),
        |    x -> len(x) > 0)) AS term FROM documents),
        |f AS (SELECT term, count(*) AS c FROM toks GROUP BY term),
        |r AS (SELECT c, row_number() OVER (ORDER BY c DESC, term) AS rank
        |  FROM f)
        |SELECT count(*) AS n_terms, CAST(sum(c) AS BIGINT) AS n_tokens,
        |  round(regr_slope(ln(c), ln(rank)), 4) AS slope,
        |  round(regr_intercept(ln(c), ln(rank)), 4) AS intercept,
        |  round(regr_r2(ln(c), ln(rank)), 4) AS r2
        |FROM r""".stripMargin) { (s, _) =>
      TextAnalysis.zipfFit(s.table("documents"))
    },

    // per-source vocabulary drift: JS divergence of each source's unigram
    // distribution vs the whole corpus — the corpus-release health metric;
    // absent-term mass folds into the closed form 0.5*ln(2)*(1 - sum q)
    df("ta_vocab_drift",
      """WITH toks AS (SELECT source AS stratum,
        |  unnest(list_filter(regexp_split_to_array(lower(text), '\s+'),
        |    x -> len(x) > 0)) AS term FROM documents),
        |sc AS (SELECT stratum, term, count(*) AS c FROM toks GROUP BY stratum, term),
        |stot AS (SELECT stratum, CAST(sum(c) AS BIGINT) AS n FROM sc GROUP BY stratum),
        |gc AS (SELECT term, CAST(sum(c) AS BIGINT) AS g FROM sc GROUP BY term),
        |gt AS (SELECT CAST(sum(g) AS BIGINT) AS gt FROM gc),
        |j AS (SELECT sc.stratum, stot.n,
        |  sc.c / CAST(stot.n AS DOUBLE) AS p,
        |  gc.g / CAST(gt.gt AS DOUBLE) AS q
        |  FROM sc JOIN gc USING (term) JOIN stot USING (stratum) CROSS JOIN gt)
        |SELECT stratum, count(*) AS n_terms, max(n) AS n_tokens,
        |  round(CAST(sum(CAST(round((p * ln(p / ((p + q) / 2))
        |      + q * ln(q / ((p + q) / 2))) / 2, 12) AS DECIMAL(28,14))) AS DOUBLE)
        |    + 0.5 * ln(2) * (1 - CAST(sum(CAST(round(q, 12)
        |      AS DECIMAL(28,14))) AS DOUBLE)), 4) AS js_divergence
        |FROM j GROUP BY stratum ORDER BY stratum""".stripMargin) { (s, _) =>
      TextAnalysis.vocabDrift(s.table("documents")).orderBy("stratum")
    },

    df("ta_fingerprint_collisions",
      """SELECT count(DISTINCT md5(array_to_string(list_sort(list_distinct(
        |  list_filter(regexp_split_to_array(lower(text), '\s+'), x -> len(x) > 0))), ' '))) AS distinct_fp,
        |  count(*) AS docs
        |FROM documents""".stripMargin) { (s, _) =>
      TextAnalysis.fingerprint(s.table("documents"))
        .agg(countDistinct(col("fingerprint")).as("distinct_fp"),
          count(lit(1)).as("docs"))
    },

    // per-doc top-3 terms by tf-idf; tfidf rounded to 4 decimals BEFORE the
    // rank so an ulp difference in ln() between engines cannot flip an order
    df("ta_tfidf_top",
      s"""WITH $duckWords,
         |tf AS (SELECT doc_id, t AS term, count(*) AS tf
         |  FROM (SELECT doc_id, unnest(w) AS t FROM toks) x GROUP BY doc_id, t),
         |dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
         |n AS (SELECT count(*) AS n_docs FROM documents),
         |s AS (SELECT doc_id, term, tf, df,
         |  round(tf * ln(CAST(n_docs AS DOUBLE) / df), 4) AS tfidf
         |  FROM tf JOIN dfreq USING (term) CROSS JOIN n),
         |r AS (SELECT s.*, row_number() OVER (
         |  PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rnk FROM s)
         |SELECT doc_id, term, tf, df, tfidf, rnk FROM r WHERE rnk <= 3
         |ORDER BY doc_id, rnk LIMIT 300""".stripMargin) { (s, _) =>
      TextAnalysis.tfidfTopTerms(s.table("documents"), k = 3)
        .withColumn("rnk", col("rnk").cast("long"))
        .orderBy("doc_id", "rnk").limit(300)
    },

    // BM25 topic retrieval for a literal query term set (Lucene idf form,
    // k1=1.2 b=0.75): per-term contributions round(6), per-doc sum as
    // exact DECIMAL, rank on round(4) with doc_id tiebreak
    df("ta_bm25_topk",
      """WITH base AS (SELECT doc_id,
        |  list_filter(regexp_split_to_array(lower(text), '\s+'), w -> len(w) > 0) AS ws
        |  FROM documents),
        |b AS (SELECT doc_id, ws, CAST(len(ws) AS DOUBLE) AS dl FROM base WHERE len(ws) > 0),
        |stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM b),
        |tf AS (SELECT doc_id, dl, term, CAST(count(*) AS DOUBLE) AS tf
        |  FROM (SELECT doc_id, dl, unnest(ws) AS term FROM b) x
        |  WHERE term IN ('vector', 'merge', 'spark') GROUP BY doc_id, dl, term),
        |dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
        |c AS (SELECT tf.doc_id,
        |  CAST(round(ln(1 + (s.n_docs - df + 0.5) / (df + 0.5))
        |    * tf.tf * 2.2 / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * tf.dl / s.avgdl)), 6)
        |    AS DECIMAL(18,6)) AS w
        |  FROM tf JOIN dfreq USING (term) CROSS JOIN stats s)
        |SELECT doc_id, count(*) AS matched_terms,
        |  CAST(round(sum(w), 4) AS DOUBLE) AS score
        |FROM c GROUP BY doc_id ORDER BY score DESC, doc_id LIMIT 20""".stripMargin) { (s, _) =>
      TextAnalysis.bm25TopK(s.table("documents"),
        Seq("vector", "merge", "spark"), k = 20)
    },

    // perplexity-style quality: mean token surprisal under the corpus
    // unigram LM (add-one smoothing), round(4) before compare so ln-ulp
    // differences between engines cannot surface
    df("ta_unigram_surprisal",
      s"""WITH $duckWords,
         |t AS (SELECT doc_id, unnest(w) AS term FROM toks),
         |freq AS (SELECT term, count(*) AS cnt FROM t GROUP BY term),
         |st AS (SELECT CAST(sum(cnt) AS DOUBLE) AS total,
         |  CAST(count(*) AS DOUBLE) AS vocab FROM freq),
         |n AS (SELECT doc_id, -ln((cnt + 1) / (total + vocab)) AS nll
         |  FROM t JOIN freq USING (term) CROSS JOIN st)
         |SELECT doc_id, count(*) AS n_tokens, round(avg(nll), 4) AS surprisal
         |FROM n GROUP BY doc_id ORDER BY doc_id LIMIT 100""".stripMargin) { (s, _) =>
      TextAnalysis.unigramSurprisal(s.table("documents"))
        .orderBy("doc_id").limit(100)
    },

    // CCNet head/middle/tail perplexity terciles over the per-doc unigram
    // surprisal: exact-percentile thresholds (percentile ≡ percentile_cont,
    // both linear-interpolating), round(4) on scores AND thresholds before
    // the comparison; the rollup covers every doc so the whole assignment
    // is oracle-checked, not a LIMITed prefix
    df("ta_perplexity_buckets",
      s"""WITH $duckWords,
         |t AS (SELECT doc_id, unnest(w) AS term FROM toks),
         |freq AS (SELECT term, count(*) AS cnt FROM t GROUP BY term),
         |st AS (SELECT CAST(sum(cnt) AS DOUBLE) AS total,
         |  CAST(count(*) AS DOUBLE) AS vocab FROM freq),
         |n AS (SELECT doc_id, -ln((cnt + 1) / (total + vocab)) AS nll
         |  FROM t JOIN freq USING (term) CROSS JOIN st),
         |s AS (SELECT doc_id, round(avg(nll), 4) AS surprisal
         |  FROM n GROUP BY doc_id),
         |thr AS (SELECT
         |  round(percentile_cont(0.3333333333333333) WITHIN GROUP (ORDER BY surprisal), 4) AS t1,
         |  round(percentile_cont(0.6666666666666666) WITHIN GROUP (ORDER BY surprisal), 4) AS t2
         |  FROM s),
         |b AS (SELECT doc_id, surprisal,
         |  CASE WHEN surprisal <= t1 THEN 'head'
         |       WHEN surprisal <= t2 THEN 'middle'
         |       ELSE 'tail' END AS bucket
         |  FROM s CROSS JOIN thr)
         |SELECT bucket, count(*) AS docs, CAST(sum(doc_id) AS BIGINT) AS id_sum,
         |  round(min(surprisal), 4) AS min_surprisal,
         |  round(max(surprisal), 4) AS max_surprisal
         |FROM b GROUP BY bucket ORDER BY bucket""".stripMargin) { (s, _) =>
      TextAnalysis.perplexityBuckets(s.table("documents"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("docs"), sum("doc_id").as("id_sum"),
          round(min("surprisal"), 4).as("min_surprisal"),
          round(max("surprisal"), 4).as("max_surprisal"))
        .orderBy("bucket")
    },

    // deterministic hash-based stratified sampling (downsample 'en' to 25%,
    // keep 75% elsewhere): the keep/drop decision derives from md5 of the
    // doc id, so the SAME rows are kept in any engine / partitioning / run
    df("ta_sample_stratified",
      """WITH s AS (SELECT lang, doc_id FROM documents
        |  WHERE CAST(list_sum(list_transform(generate_series(1, 8),
        |    i -> (strpos('0123456789abcdef',
        |      substring(md5(concat('s0', CAST(doc_id AS VARCHAR))), i, 1)) - 1)
        |      * 16.0 ** (8 - i))) AS DOUBLE) / 4294967296.0
        |    < CASE WHEN lang = 'en' THEN 0.25 ELSE 0.75 END)
        |SELECT lang, count(*) AS kept, CAST(sum(doc_id) AS BIGINT) AS id_sum
        |FROM s GROUP BY lang ORDER BY lang""".stripMargin) { (s, _) =>
      graft.operators.Sampling.stratifiedSample(s.table("documents"), "lang",
          rates = Map("en" -> 0.25), defaultRate = 0.75, salt = "s0")
        .groupBy("lang")
        .agg(count(lit(1)).as("kept"), sum(col("doc_id")).as("id_sum"))
        .orderBy("lang")
    },

    // deterministic global training-order shuffle: seeded md5 sort key,
    // first hex char -> 16 shards, rank within shard = pos. (shard, pos)
    // is a reproducible permutation with no global sort anywhere.
    df("ta_shuffle_order",
      """WITH k AS (SELECT doc_id,
        |  md5(concat('s0', '_', CAST(doc_id AS VARCHAR))) AS skey
        |  FROM documents),
        |s AS (SELECT doc_id, skey,
        |  CAST(strpos('0123456789abcdef', substring(skey, 1, 1)) - 1 AS INT) AS shard
        |  FROM k)
        |SELECT doc_id, shard, CAST(row_number() OVER (
        |  PARTITION BY shard ORDER BY skey, doc_id) - 1 AS BIGINT) AS pos
        |FROM s ORDER BY shard, pos LIMIT 500""".stripMargin) { (s, _) =>
      graft.operators.Sampling.shuffleOrder(s.table("documents"))
        .select("doc_id", "shard", "pos")
        .orderBy("shard", "pos").limit(500)
    },

    // token-budget mixture sampling: per-language keep rates min(1,
    // budget*w/tokens) so sampled token mass tracks the target mixture;
    // the keep decision is the shared md5 unit hash (salt 'mix')
    df("ta_mixture_sample",
      """WITH toks AS (SELECT doc_id, lang,
        |  CAST(len(list_filter(regexp_split_to_array(lower(text), '\s+'),
        |    x -> len(x) > 0)) AS BIGINT) AS tok FROM documents),
        |tot AS (SELECT lang, count(*) AS total_docs,
        |  CAST(sum(tok) AS BIGINT) AS total_tokens FROM toks GROUP BY lang),
        |wt AS (SELECT lang, total_docs, total_tokens,
        |  CAST(CASE lang WHEN 'en' THEN 0.35 WHEN 'de' THEN 0.2
        |    WHEN 'es' THEN 0.2 WHEN 'fr' THEN 0.15 ELSE 0.0 END AS DOUBLE)
        |    AS weight FROM tot),
        |rt AS (SELECT *, least(1.0,
        |  round(10000.0 * weight / total_tokens, 6)) AS rate FROM wt),
        |j AS (SELECT t.lang, t.tok, r.total_docs, r.total_tokens, r.weight,
        |  r.rate,
        |  CAST(list_sum(list_transform(generate_series(1, 8),
        |    i -> (strpos('0123456789abcdef',
        |      substring(md5(concat('mix', CAST(t.doc_id AS VARCHAR))), i, 1)) - 1)
        |      * 16.0 ** (8 - i))) AS DOUBLE) / 4294967296.0 < r.rate AS kept
        |  FROM toks t JOIN rt r USING (lang))
        |SELECT lang, total_docs, total_tokens, weight, rate,
        |  CAST(sum(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS sampled_docs,
        |  CAST(sum(CASE WHEN kept THEN tok ELSE 0 END) AS BIGINT)
        |    AS sampled_tokens
        |FROM j GROUP BY lang, total_docs, total_tokens, weight, rate
        |ORDER BY lang""".stripMargin) { (s, _) =>
      graft.operators.Sampling.mixtureReport(s.table("documents"),
          weights = Map("en" -> 0.35, "de" -> 0.2, "es" -> 0.2, "fr" -> 0.15),
          budgetTokens = 10000L)
        .orderBy("lang")
    },

    // benchmark decontamination: docs outside src0 checked for 5-gram
    // overlap against the src0 "eval set" — the broadcast-eval-grams shape
    // (the corpus is never shuffled by gram, only rolled up per doc)
    // multi-suite decontamination: the src0 docs play K benchmark suites
    // (keyed by lang); leakage reported per (doc, suite) — one broadcast
    // carries every suite's grams, adding a suite costs bytes not a scan
    df("ta_decontaminate_suites",
      """WITH t AS (SELECT doc_id, source, lang,
        |  list_filter(regexp_split_to_array(lower(text), '\s+'),
        |    x -> len(x) > 0) AS w FROM documents),
        |eg AS (SELECT DISTINCT lang, gh FROM (
        |  SELECT lang, unnest(list_transform(generate_series(1, len(w) - 4),
        |    i -> md5(array_to_string(w[i:i+4], ' ')))) AS gh
        |  FROM t WHERE source = 'src0' AND len(w) >= 5) x),
        |c0 AS (SELECT doc_id, text FROM documents WHERE source <> 'src0'
        |  UNION ALL SELECT -(doc_id + 1), 'planted prefix ' || text
        |  FROM documents WHERE source = 'src0' AND doc_id % 3 = 0),
        |tc AS (SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '\s+'),
        |  x -> len(x) > 0) AS w FROM c0),
        |dg AS (SELECT doc_id, unnest(list_transform(generate_series(1, len(w) - 4),
        |    i -> md5(array_to_string(w[i:i+4], ' ')))) AS gh
        |  FROM tc WHERE len(w) >= 5)
        |SELECT doc_id, lang, CAST(count(*) AS BIGINT) AS matched_grams
        |FROM dg JOIN eg USING (gh) GROUP BY doc_id, lang
        |ORDER BY doc_id, lang LIMIT 200""".stripMargin) { (s, _) =>
      val d = s.table("documents")
      val ev = d.where(col("source") === "src0")
      val corpus = d.where(col("source") =!= "src0").select("doc_id", "text")
        .unionByName(ev.where(col("doc_id") % 3 === 0)
          .select((-(col("doc_id") + 1L)).as("doc_id"),
            concat(lit("planted prefix "), col("text")).as("text")))
      CorpusFilters.decontaminateSuites(corpus, ev, suiteCol = "lang")
        .orderBy("doc_id", "lang").limit(200)
    },

    df("ta_decontaminate",
      """WITH t AS (SELECT doc_id, source,
        |  list_filter(regexp_split_to_array(lower(text), '\s+'),
        |    x -> len(x) > 0) AS w FROM documents),
        |eg AS (SELECT DISTINCT gh FROM (
        |  SELECT unnest(list_transform(generate_series(1, len(w) - 4),
        |    i -> md5(array_to_string(w[i:i+4], ' ')))) AS gh
        |  FROM t WHERE source = 'src0' AND len(w) >= 5) x),
        |dg AS (SELECT doc_id, unnest(list_transform(generate_series(1, len(w) - 4),
        |    i -> md5(array_to_string(w[i:i+4], ' ')))) AS gh
        |  FROM t WHERE source <> 'src0' AND len(w) >= 5),
        |m AS (SELECT doc_id, count(*) AS matched_grams
        |  FROM dg JOIN eg USING (gh) GROUP BY doc_id),
        |c AS (SELECT doc_id, CAST(greatest(len(w) - 4, 0) AS BIGINT) AS n_grams
        |  FROM t WHERE source <> 'src0')
        |SELECT c.doc_id, c.n_grams,
        |  CAST(coalesce(m.matched_grams, 0) AS BIGINT) AS matched_grams,
        |  coalesce(m.matched_grams, 0) > 0 AS contaminated
        |FROM c LEFT JOIN m ON m.doc_id = c.doc_id
        |ORDER BY c.doc_id LIMIT 100""".stripMargin) { (s, _) =>
      val d = s.table("documents")
      CorpusFilters.decontaminate(
          d.where(col("source") =!= "src0"), d.where(col("source") === "src0"),
          n = 5)
        .orderBy("doc_id").limit(100)
    },

    // fuzzy MinHash decontamination: eval set = every 7th doc; the corpus
    // is the rest PLUS planted near-copies of eval docs (negative id space
    // -(doc_id+1), disjoint from the generator's non-negative ids at ANY
    // scale factor; one word appended — same synthetic-fixture trick as
    // ta_redact_pii) so band collisions are guaranteed non-degenerate
    df("ta_decontaminate_fuzzy",
      s"""WITH ev AS (SELECT doc_id, text FROM documents WHERE doc_id % 7 = 0),
         |corp AS (SELECT doc_id, text FROM documents WHERE doc_id % 7 <> 0
         |  UNION ALL SELECT -(doc_id + 1), text || ' postscript'
         |  FROM ev WHERE doc_id % 3 = 0),
         |${duckBandsOver("ev", "e")},
         |${duckBandsOver("corp", "c")},
         |ek AS (SELECT DISTINCT band, bkey FROM ebands),
         |m AS (SELECT doc_id, count(*) AS matched_bands
         |  FROM cbands JOIN ek USING (band, bkey) GROUP BY doc_id),
         |ids AS (SELECT DISTINCT doc_id FROM cbands)
         |SELECT i.doc_id, CAST(coalesce(m.matched_bands, 0) AS BIGINT) AS matched_bands,
         |  coalesce(m.matched_bands, 0) > 0 AS contaminated
         |FROM ids i LEFT JOIN m ON m.doc_id = i.doc_id
         |ORDER BY i.doc_id""".stripMargin) { (s, _) =>
      val d = s.table("documents")
      val ev = d.where(col("doc_id") % 7 === 0).select("doc_id", "text")
      val corp = d.where(col("doc_id") % 7 =!= 0).select("doc_id", "text")
        .unionByName(ev.where(col("doc_id") % 3 === 0)
          .select((-(col("doc_id") + 1L)).as("doc_id"),
            concat(col("text"), lit(" postscript")).as("text")))
      CorpusFilters.decontaminateFuzzy(corp, ev).orderBy("doc_id")
    },

    // the corpus "data card": the one-row release-notes summary a corpus
    // drop publishes (docs, token mass, language/source spread, exact-dup
    // rate, mean length). One scan + partial-aggregated count-distincts.
    df("ta_data_card",
      """WITH t AS (SELECT lang, source, md5(text) AS h,
        |  len(list_filter(regexp_split_to_array(lower(text), '\s+'),
        |    w -> len(w) > 0)) AS nw
        |  FROM documents)
        |SELECT count(*) AS n_docs,
        |  CAST(sum(nw) AS BIGINT) AS n_tokens,
        |  count(DISTINCT lang) AS n_langs,
        |  count(DISTINCT source) AS n_sources,
        |  count(DISTINCT h) AS n_unique_texts,
        |  round(1 - CAST(count(DISTINCT h) AS DOUBLE) / count(*), 4) AS dup_rate,
        |  round(CAST(sum(nw) AS DOUBLE) / count(*), 4) AS mean_words
        |FROM t""".stripMargin) { (s, _) =>
      s.table("documents")
        .select(col("lang"), col("source"), md5(col("text")).as("h"),
          size(Dedup.tokens(col("text"))).cast("long").as("nw"))
        .agg(count(lit(1)).as("n_docs"), sum("nw").as("n_tokens"),
          countDistinct("lang").as("n_langs"),
          countDistinct("source").as("n_sources"),
          countDistinct("h").as("n_unique_texts"),
          round(lit(1) - countDistinct("h").cast("double") / count(lit(1)), 4)
            .as("dup_rate"),
          round(sum("nw").cast("double") / count(lit(1)), 4).as("mean_words"))
    },

    // Gopher document-quality rules, each measurement exposed plus the
    // combined verdict (round-before-compare keeps the float thresholds
    // engine-portable)
    df("ta_gopher_filter",
      """WITH t AS (SELECT doc_id,
        |  list_filter(regexp_split_to_array(lower(text), '\s+'),
        |    x -> len(x) > 0) AS w,
        |  list_filter(list_transform(string_split(text, chr(10)),
        |    l -> trim(l)), l -> len(l) > 0) AS ls FROM documents),
        |s AS (SELECT doc_id,
        |  CAST(len(w) AS BIGINT) AS n_words,
        |  round(CAST(list_sum(list_transform(w, x -> len(x))) AS DOUBLE)
        |    / greatest(len(w), 1), 4) AS mean_word_len,
        |  round(CAST(len(list_filter(w, x -> contains(x, '#')
        |      OR contains(x, '...'))) AS DOUBLE)
        |    / greatest(len(w), 1), 4) AS symbol_ratio,
        |  round(CAST(len(list_filter(ls, l -> substring(l, 1, 1) IN
        |      ('-', '*', chr(8226)))) AS DOUBLE)
        |    / greatest(len(ls), 1), 4) AS bullet_ratio,
        |  round(CAST(len(list_filter(ls, l -> l LIKE '%...')) AS DOUBLE)
        |    / greatest(len(ls), 1), 4) AS ellipsis_ratio,
        |  round(CAST(len(list_filter(w, x -> regexp_matches(x, '[a-z]')))
        |      AS DOUBLE) / greatest(len(w), 1), 4) AS alpha_ratio,
        |  CAST((CASE WHEN list_contains(w, 'the') THEN 1 ELSE 0 END)
        |    + (CASE WHEN list_contains(w, 'be') THEN 1 ELSE 0 END)
        |    + (CASE WHEN list_contains(w, 'to') THEN 1 ELSE 0 END)
        |    + (CASE WHEN list_contains(w, 'of') THEN 1 ELSE 0 END)
        |    + (CASE WHEN list_contains(w, 'and') THEN 1 ELSE 0 END)
        |    + (CASE WHEN list_contains(w, 'that') THEN 1 ELSE 0 END)
        |    + (CASE WHEN list_contains(w, 'have') THEN 1 ELSE 0 END)
        |    + (CASE WHEN list_contains(w, 'with') THEN 1 ELSE 0 END)
        |    AS BIGINT) AS stop_hits
        |  FROM t)
        |SELECT doc_id, n_words, mean_word_len, symbol_ratio, bullet_ratio,
        |  ellipsis_ratio, alpha_ratio, stop_hits,
        |  (n_words >= 50 AND n_words <= 100000
        |    AND mean_word_len >= 3 AND mean_word_len <= 10
        |    AND symbol_ratio <= 0.1 AND bullet_ratio <= 0.9
        |    AND ellipsis_ratio <= 0.3 AND alpha_ratio >= 0.8
        |    AND stop_hits >= 2) AS keep
        |FROM s ORDER BY doc_id LIMIT 100""".stripMargin) { (s, _) =>
      CorpusFilters.gopherFilter(s.table("documents"))
        .orderBy("doc_id").limit(100)
    },

    // the batch curation FUNNEL, end to end in one query: raw corpus ->
    // Gopher quality gate -> exact dedup (keep-first) -> n-gram
    // decontamination vs the src0 eval slice, reported as (stage, docs,
    // tokens) — the per-stage accounting a pipeline publishes with every
    // corpus release. Composes the already-verified operators; the oracle
    // restates the full chain. The synthetic corpus defeats every stage
    // as-is (no stop words, no exact dups, no eval overlap), so the query
    // plants each effect: a stop-word tail on corpus docs (quality stage
    // becomes the word-count rule), exact copies of every 10th doc
    // (dedup stage), and suffixed src0 texts as leaked docs whose
    // interior 5-grams still match the eval set (decontamination stage)
    df("ta_curation_funnel",
      """WITH corp AS (
        |  SELECT doc_id, text || ' with the rest of that have be to and' AS text
        |  FROM documents WHERE source <> 'src0'
        |  UNION ALL
        |  SELECT -(2 * doc_id + 1), text || ' with the rest of that have be to and'
        |  FROM documents WHERE source <> 'src0' AND doc_id % 10 = 0
        |  UNION ALL
        |  SELECT -(2 * doc_id + 2), text || ' with the rest of that have be to and'
        |  FROM documents WHERE source = 'src0'),
        |ev AS (SELECT doc_id, text FROM documents WHERE source = 'src0'),
        |t AS (SELECT doc_id, text,
        |  list_filter(regexp_split_to_array(lower(text), '\s+'),
        |    x -> len(x) > 0) AS w,
        |  list_filter(list_transform(string_split(text, chr(10)),
        |    l -> trim(l)), l -> len(l) > 0) AS ls FROM corp),
        |g AS (SELECT doc_id, text, w FROM t
        |  WHERE len(w) >= 50 AND len(w) <= 100000
        |  AND round(CAST(list_sum(list_transform(w, x -> len(x))) AS DOUBLE)
        |    / greatest(len(w), 1), 4) BETWEEN 3 AND 10
        |  AND round(CAST(len(list_filter(w, x -> contains(x, '#')
        |      OR contains(x, '...'))) AS DOUBLE)
        |    / greatest(len(w), 1), 4) <= 0.1
        |  AND round(CAST(len(list_filter(ls, l -> substring(l, 1, 1) IN
        |      ('-', '*', chr(8226)))) AS DOUBLE)
        |    / greatest(len(ls), 1), 4) <= 0.9
        |  AND round(CAST(len(list_filter(ls, l -> l LIKE '%...')) AS DOUBLE)
        |    / greatest(len(ls), 1), 4) <= 0.3
        |  AND round(CAST(len(list_filter(w, x -> regexp_matches(x, '[a-z]')))
        |      AS DOUBLE) / greatest(len(w), 1), 4) >= 0.8
        |  AND (CASE WHEN list_contains(w, 'the') THEN 1 ELSE 0 END)
        |    + (CASE WHEN list_contains(w, 'be') THEN 1 ELSE 0 END)
        |    + (CASE WHEN list_contains(w, 'to') THEN 1 ELSE 0 END)
        |    + (CASE WHEN list_contains(w, 'of') THEN 1 ELSE 0 END)
        |    + (CASE WHEN list_contains(w, 'and') THEN 1 ELSE 0 END)
        |    + (CASE WHEN list_contains(w, 'that') THEN 1 ELSE 0 END)
        |    + (CASE WHEN list_contains(w, 'have') THEN 1 ELSE 0 END)
        |    + (CASE WHEN list_contains(w, 'with') THEN 1 ELSE 0 END) >= 2),
        |k AS (SELECT min(doc_id) AS doc_id FROM g GROUP BY md5(text)),
        |d2 AS (SELECT g.* FROM g JOIN k USING (doc_id)),
        |eg AS (SELECT DISTINCT gh FROM (
        |  SELECT unnest(list_transform(generate_series(1, len(w) - 4),
        |    i -> md5(array_to_string(w[i:i+4], ' ')))) AS gh FROM (
        |    SELECT list_filter(regexp_split_to_array(lower(text), '\s+'),
        |      x -> len(x) > 0) AS w FROM ev) x WHERE len(w) >= 5) y),
        |dg AS (SELECT doc_id, unnest(list_transform(generate_series(1, len(w) - 4),
        |    i -> md5(array_to_string(w[i:i+4], ' ')))) AS gh
        |  FROM d2 WHERE len(w) >= 5),
        |cont AS (SELECT DISTINCT doc_id FROM dg JOIN eg USING (gh)),
        |d3 AS (SELECT * FROM d2
        |  WHERE doc_id NOT IN (SELECT doc_id FROM cont))
        |SELECT stage, docs, tokens FROM (
        |  SELECT '0_raw' AS stage, count(*) AS docs,
        |    CAST(coalesce(sum(len(w)), 0) AS BIGINT) AS tokens FROM t
        |  UNION ALL SELECT '1_quality', count(*),
        |    CAST(coalesce(sum(len(w)), 0) AS BIGINT) FROM g
        |  UNION ALL SELECT '2_dedup', count(*),
        |    CAST(coalesce(sum(len(w)), 0) AS BIGINT) FROM d2
        |  UNION ALL SELECT '3_decontaminated', count(*),
        |    CAST(coalesce(sum(len(w)), 0) AS BIGINT) FROM d3) z
        |ORDER BY stage""".stripMargin) { (s, _) =>
      val d = s.table("documents")
      val suffix = lit(" with the rest of that have be to and")
      val base = d.where(col("source") =!= "src0")
      // planted rows live in the negative id space (odd = dup copies,
      // even = leaked src0 docs) — disjoint from real non-negative doc_ids
      // and from each other at any scale factor (ADVICE r7)
      val corpus = base
        .select(col("doc_id"), concat(col("text"), suffix).as("text"))
        .unionByName(base.where(col("doc_id") % 10 === 0)
          .select((-(col("doc_id") * 2L + 1L)).as("doc_id"),
            concat(col("text"), suffix).as("text")))
        .unionByName(d.where(col("source") === "src0")
          .select((-(col("doc_id") * 2L + 2L)).as("doc_id"),
            concat(col("text"), suffix).as("text")))
      val ev = d.where(col("source") === "src0").select("doc_id", "text")
      val toks = size(Dedup.tokens(col("text"))).cast("long")
      // each funnel stage feeds BOTH its own aggregate and the next
      // stage; without materialization the (interpreted-lambda-heavy)
      // Gopher gate re-evaluates once per downstream branch — checkpoint
      // the two reused frames so the gate and the dedup join run once
      val q = corpus.where(CorpusFilters.gopherKeep(col("text")))
        .localCheckpoint()
      val keepers = q.groupBy(md5(col("text"))).agg(min("doc_id").as("doc_id"))
      val d2 = q.join(keepers.select("doc_id"), "doc_id").localCheckpoint()
      val d3 = d2.join(
        CorpusFilters.decontaminate(d2, ev, n = 5)
          .where(!col("contaminated")).select("doc_id"), "doc_id")
      def stage(name: String, f: org.apache.spark.sql.DataFrame) =
        f.agg(count(lit(1)).as("docs"),
            coalesce(sum(toks), lit(0L)).as("tokens"))
          .select(lit(name).as("stage"), col("docs"), col("tokens"))
      stage("0_raw", corpus).unionByName(stage("1_quality", q))
        .unionByName(stage("2_dedup", d2))
        .unionByName(stage("3_decontaminated", d3))
        .orderBy("stage")
    },

    // sign-bit binary quantization (32 bits per BIGINT word — exact,
    // positive, engine-portable integers)
    df("ss_quant_binary",
      """WITH b AS (SELECT vec_id,
        |  list_transform(generate_series(0, 1), wd ->
        |    CAST(list_sum(list_transform(generate_series(1, 32), d ->
        |      CASE WHEN embedding[wd * 32 + d] >= 0
        |        THEN (CAST(1 AS BIGINT) << (d - 1)) ELSE 0 END)) AS BIGINT))
        |  AS bits FROM embeddings)
        |SELECT vec_id, bits[1] AS w0, bits[2] AS w1
        |FROM b ORDER BY vec_id LIMIT 100""".stripMargin) { (s, _) =>
      Similarity.quantizeBinary(s.table("embeddings"), dims = 64)
        .select(col("vec_id"), element_at(col("bits"), 1).as("w0"),
          element_at(col("bits"), 2).as("w1"))
        .orderBy("vec_id").limit(100)
    },

    // Hamming top-k over the packed sign bits: broadcast query row,
    // map-only xor+bit_count scan, deterministic id tiebreak

    // batch ANN: exact top-5 for every query in a query SET, one corpus
    // pass — broadcast queries, map-only scoring, two-phase top-k (the
    // per-query partial rides the aggregation; the final window sees
    // k x partitions rows, never the corpus). Oracle: plain per-query
    // row_number over the full cross product
    df("ss_batch_topk",
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |n AS (SELECT vec_id, v, sqrt(list_sum(list_transform(
        |    generate_series(1, 64), i -> v[i] * v[i]))) AS nv FROM e),
        |q AS (SELECT vec_id AS qid, v AS qv, nv AS nq FROM n
        |  WHERE vec_id % 97 = 0 AND nv > 0),
        |p AS (SELECT qid, c.vec_id,
        |  round(list_sum(list_transform(generate_series(1, 64),
        |    i -> c.v[i] * qv[i])) / (c.nv * nq), 4) AS sim
        |  FROM n c CROSS JOIN q WHERE c.vec_id <> qid AND c.nv > 0),
        |r AS (SELECT qid AS query_id, vec_id, sim,
        |  CAST(row_number() OVER (PARTITION BY qid
        |    ORDER BY sim DESC, vec_id) AS BIGINT) AS rnk FROM p)
        |SELECT query_id, vec_id, sim, rnk FROM r WHERE rnk <= 5
        |ORDER BY query_id, rnk""".stripMargin) { (s, _) =>
      val emb = s.table("embeddings")
      Similarity.batchTopK(emb,
          emb.where(col("vec_id") % 97 === 0)
            .select(col("vec_id").as("query_id"), col("embedding")),
          k = 5)
        .orderBy("query_id", "rnk")
    },

    // ANN recall@k evaluation: |IVF(nprobe=2) top-5 ∩ exact top-5| / 5
    // per query over the query set — the index-config eval loop as a
    // first-class operator; both sides share round(4)/id tie rules so
    // the intersection is engine-exact
    df("ss_recall_at_k",
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |cn AS (SELECT p, c, sqrt(list_sum(list_transform(generate_series(1, 64), i -> c[i] * c[i]))) AS nc
        |  FROM (SELECT p, list_transform(generate_series(1, 64),
        |    d -> (strpos('0123456789abcdef', substring(md5(concat(p + 1000, '_', d - 1)), 1, 1)) - 8.5)) AS c
        |  FROM generate_series(0, 7) t(p)) x),
        |s0 AS (SELECT vec_id,
        |  list(list_sum(list_transform(generate_series(1, 64), i -> v[i] * c[i])) / nc ORDER BY p) AS scores
        |  FROM e CROSS JOIN cn WHERE vec_id % 5 = 0 GROUP BY vec_id),
        |c0 AS (SELECT vec_id, list_position(scores, list_aggregate(scores, 'max')) - 1 AS cell FROM s0),
        |tr AS (SELECT cell, d, round(avg(v[d]), 4) AS cd
        |  FROM c0 JOIN e USING (vec_id) CROSS JOIN generate_series(1, 64) t(d)
        |  GROUP BY cell, d),
        |tl AS (SELECT cell, list(cd ORDER BY d) AS c FROM tr GROUP BY cell),
        |tc AS (SELECT cn.p, coalesce(tl.c, cn.c) AS c,
        |  sqrt(list_sum(list_transform(generate_series(1, 64),
        |    i -> coalesce(tl.c, cn.c)[i] * coalesce(tl.c, cn.c)[i]))) AS nc
        |  FROM cn LEFT JOIN tl ON tl.cell = cn.p),
        |scored AS (SELECT vec_id,
        |  list(list_sum(list_transform(generate_series(1, 64), i -> v[i] * c[i])) / nc ORDER BY p) AS scores
        |  FROM e CROSS JOIN tc GROUP BY vec_id),
        |cells AS (SELECT s.vec_id, e.v, s.scores,
        |  list_position(s.scores, list_aggregate(s.scores, 'max')) - 1 AS cell
        |  FROM scored s JOIN e ON e.vec_id = s.vec_id),
        |q AS (SELECT vec_id AS qid, v AS qv,
        |  sqrt(list_sum(list_transform(generate_series(1, 64), i -> v[i] * v[i]))) AS nq,
        |  scores AS qscores, list_sort(scores, 'DESC')[2] AS thr
        |  FROM cells WHERE vec_id % 97 = 0
        |    AND list_sum(list_transform(generate_series(1, 64), i -> v[i] * v[i])) > 0),
        |n AS (SELECT vec_id, v, cell,
        |  sqrt(list_sum(list_transform(generate_series(1, 64), i -> v[i] * v[i]))) AS nv
        |  FROM cells),
        |ex AS (SELECT qid, vec_id FROM (
        |  SELECT q.qid, n.vec_id, row_number() OVER (PARTITION BY q.qid ORDER BY
        |    round(list_sum(list_transform(generate_series(1, 64),
        |      i -> n.v[i] * q.qv[i])) / (n.nv * q.nq), 4) DESC, n.vec_id) AS rnk
        |  FROM n CROSS JOIN q WHERE n.vec_id <> q.qid AND n.nv > 0) x WHERE rnk <= 5),
        |ap AS (SELECT qid, vec_id FROM (
        |  SELECT q.qid, n.vec_id, row_number() OVER (PARTITION BY q.qid ORDER BY
        |    round(list_sum(list_transform(generate_series(1, 64),
        |      i -> n.v[i] * q.qv[i])) / (n.nv * q.nq), 4) DESC, n.vec_id) AS rnk
        |  FROM n CROSS JOIN q
        |  WHERE n.vec_id <> q.qid AND n.nv > 0
        |    AND q.qscores[n.cell + 1] >= q.thr) y
        |  WHERE rnk <= 5)
        |SELECT x.qid AS query_id, CAST(count(a.vec_id) AS BIGINT) AS hits,
        |  round(count(a.vec_id) / 5.0, 4) AS recall
        |FROM ex x LEFT JOIN ap a ON a.qid = x.qid AND a.vec_id = x.vec_id
        |GROUP BY x.qid ORDER BY query_id""".stripMargin) { (s, _) =>
      val emb = s.table("embeddings")
      Similarity.recallAtK(emb,
          emb.where(col("vec_id") % 97 === 0)
            .select(col("vec_id").as("query_id"), col("embedding")),
          k = 5, centroids = 8, nprobe = 2, dims = 64)
        .orderBy("query_id")
    },

    df("ss_ann_hamming",
      """WITH b AS (SELECT vec_id,
        |  list_transform(generate_series(0, 1), wd ->
        |    CAST(list_sum(list_transform(generate_series(1, 32), d ->
        |      CASE WHEN embedding[wd * 32 + d] >= 0
        |        THEN (CAST(1 AS BIGINT) << (d - 1)) ELSE 0 END)) AS BIGINT))
        |  AS bits FROM embeddings),
        |q AS (SELECT bits AS qbits FROM b WHERE vec_id = 7)
        |SELECT vec_id,
        |  CAST(bit_count(xor(bits[1], qbits[1]))
        |    + bit_count(xor(bits[2], qbits[2])) AS BIGINT) AS hamming
        |FROM b, q WHERE vec_id <> 7
        |ORDER BY hamming, vec_id LIMIT 10""".stripMargin) { (s, _) =>
      Similarity.annTopKHamming(s.table("embeddings"), dims = 64,
        queryId = 7, k = 10)
    },

    // product quantization: trained per-subvector codebooks (one sampled
    // k-means pass, round(4) means — the ivf_cells_trained recipe per
    // subvector), then nearest-code assignment by squared L2; 8 codes of
    // 4 bits each = 64x compression. first-min ties both engines
    df("ss_pq_codes",
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |seed AS (SELECT s, c, list_transform(generate_series(1, 8),
        |    d -> (strpos('0123456789abcdef', substring(md5(concat(
        |      s * 100 + c + 2000, '_', d - 1)), 1, 1)) - 8.5)) AS cent
        |  FROM generate_series(0, 7) ts(s)
        |  CROSS JOIN generate_series(0, 15) tc(c)),
        |sub AS (SELECT vec_id, s,
        |    list_transform(generate_series(1, 8), d -> v[s * 8 + d]) AS sv
        |  FROM e CROSS JOIN generate_series(0, 7) ts(s)),
        |s0 AS (SELECT vec_id, s, list(list_sum(list_transform(
        |    generate_series(1, 8),
        |    i -> (sv[i] - cent[i]) * (sv[i] - cent[i]))) ORDER BY c) AS dists
        |  FROM sub JOIN seed USING (s) WHERE vec_id % 5 = 0
        |  GROUP BY vec_id, s),
        |a0 AS (SELECT vec_id, s,
        |    list_position(dists, list_aggregate(dists, 'min')) - 1 AS code
        |  FROM s0),
        |tr AS (SELECT s, code, d, round(avg(sv[d]), 4) AS cd
        |  FROM a0 JOIN sub USING (vec_id, s)
        |  CROSS JOIN generate_series(1, 8) t(d)
        |  GROUP BY s, code, d),
        |tl AS (SELECT s, code, list(cd ORDER BY d) AS cent FROM tr
        |  GROUP BY s, code),
        |bk AS (SELECT seed.s, seed.c, coalesce(tl.cent, seed.cent) AS cent
        |  FROM seed LEFT JOIN tl ON tl.s = seed.s AND tl.code = seed.c),
        |fs AS (SELECT vec_id, s, list(list_sum(list_transform(
        |    generate_series(1, 8),
        |    i -> (sv[i] - cent[i]) * (sv[i] - cent[i]))) ORDER BY c) AS dists
        |  FROM sub JOIN bk USING (s) GROUP BY vec_id, s),
        |codes AS (SELECT vec_id, s,
        |    list_position(dists, list_aggregate(dists, 'min')) - 1 AS code
        |  FROM fs)
        |SELECT vec_id,
        |  CAST(max(CASE WHEN s = 0 THEN code END) AS BIGINT) AS c0,
        |  CAST(max(CASE WHEN s = 1 THEN code END) AS BIGINT) AS c1,
        |  CAST(max(CASE WHEN s = 2 THEN code END) AS BIGINT) AS c2,
        |  CAST(max(CASE WHEN s = 3 THEN code END) AS BIGINT) AS c3,
        |  CAST(max(CASE WHEN s = 4 THEN code END) AS BIGINT) AS c4,
        |  CAST(max(CASE WHEN s = 5 THEN code END) AS BIGINT) AS c5,
        |  CAST(max(CASE WHEN s = 6 THEN code END) AS BIGINT) AS c6,
        |  CAST(max(CASE WHEN s = 7 THEN code END) AS BIGINT) AS c7
        |FROM codes GROUP BY vec_id ORDER BY vec_id LIMIT 100""".stripMargin) {
      (s, _) =>
        Similarity.pqCodes(s.table("embeddings"))
          .orderBy("vec_id").limit(100)
    },

    // PQ/ADC top-k: the serving-side pair of ss_pq_codes — query-to-code
    // lookup sums over the trained codebooks, no raw corpus vectors read
    df("ss_ann_pq",
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |seed AS (SELECT s, c, list_transform(generate_series(1, 8),
        |    d -> (strpos('0123456789abcdef', substring(md5(concat(
        |      s * 100 + c + 2000, '_', d - 1)), 1, 1)) - 8.5)) AS cent
        |  FROM generate_series(0, 7) ts(s)
        |  CROSS JOIN generate_series(0, 15) tc(c)),
        |sub AS (SELECT vec_id, s,
        |    list_transform(generate_series(1, 8), d -> v[s * 8 + d]) AS sv
        |  FROM e CROSS JOIN generate_series(0, 7) ts(s)),
        |s0 AS (SELECT vec_id, s, list(list_sum(list_transform(
        |    generate_series(1, 8),
        |    i -> (sv[i] - cent[i]) * (sv[i] - cent[i]))) ORDER BY c) AS dists
        |  FROM sub JOIN seed USING (s) WHERE vec_id % 5 = 0
        |  GROUP BY vec_id, s),
        |a0 AS (SELECT vec_id, s,
        |    list_position(dists, list_aggregate(dists, 'min')) - 1 AS code
        |  FROM s0),
        |tr AS (SELECT s, code, d, round(avg(sv[d]), 4) AS cd
        |  FROM a0 JOIN sub USING (vec_id, s)
        |  CROSS JOIN generate_series(1, 8) t(d)
        |  GROUP BY s, code, d),
        |tl AS (SELECT s, code, list(cd ORDER BY d) AS cent FROM tr
        |  GROUP BY s, code),
        |bk AS (SELECT seed.s, seed.c, coalesce(tl.cent, seed.cent) AS cent
        |  FROM seed LEFT JOIN tl ON tl.s = seed.s AND tl.code = seed.c),
        |fs AS (SELECT vec_id, s, list(list_sum(list_transform(
        |    generate_series(1, 8),
        |    i -> (sv[i] - cent[i]) * (sv[i] - cent[i]))) ORDER BY c) AS dists
        |  FROM sub JOIN bk USING (s) GROUP BY vec_id, s),
        |codes AS (SELECT vec_id, s,
        |    list_position(dists, list_aggregate(dists, 'min')) - 1 AS code
        |  FROM fs),
        |q AS (SELECT s, sv AS qs FROM sub WHERE vec_id = 7),
        |ad AS (SELECT codes.vec_id, list_sum(list_transform(
        |    generate_series(1, 8),
        |    i -> (qs[i] - cent[i]) * (qs[i] - cent[i]))) AS ds
        |  FROM codes JOIN bk ON bk.s = codes.s AND bk.c = codes.code
        |  JOIN q ON q.s = codes.s)
        |SELECT vec_id, round(sum(ds), 4) AS adc_dist
        |FROM ad WHERE vec_id <> 7 GROUP BY vec_id
        |ORDER BY adc_dist, vec_id LIMIT 10""".stripMargin) { (s, _) =>
      Similarity.annTopKPq(s.table("embeddings"), queryId = 7, topK = 10)
    },

    // IVF-PQ: the canonical FAISS composition — trained IVF cells prune
    // candidates to the query's nprobe best cells, PQ/ADC lookups score
    // the survivors. The oracle re-states BOTH training recipes (trained
    // centroids ≡ ss_ivf_cells_trained, trained codebooks ≡ ss_pq_codes)
    // and intersects probe set with ADC distances
    df("ss_ann_ivfpq",
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |cn AS (SELECT p, c, sqrt(list_sum(list_transform(generate_series(1, 64), i -> c[i] * c[i]))) AS nc
        |  FROM (SELECT p, list_transform(generate_series(1, 64),
        |    d -> (strpos('0123456789abcdef', substring(md5(concat(p + 1000, '_', d - 1)), 1, 1)) - 8.5)) AS c
        |  FROM generate_series(0, 7) t(p)) x),
        |i0 AS (SELECT vec_id,
        |  list(list_sum(list_transform(generate_series(1, 64), i -> v[i] * c[i])) / nc ORDER BY p) AS scores
        |  FROM e CROSS JOIN cn WHERE vec_id % 5 = 0 GROUP BY vec_id),
        |ic0 AS (SELECT vec_id, list_position(scores, list_aggregate(scores, 'max')) - 1 AS cell FROM i0),
        |itr AS (SELECT cell, d, round(avg(v[d]), 4) AS cd
        |  FROM ic0 JOIN e USING (vec_id) CROSS JOIN generate_series(1, 64) t(d)
        |  GROUP BY cell, d),
        |itl AS (SELECT cell, list(cd ORDER BY d) AS c FROM itr GROUP BY cell),
        |tc AS (SELECT cn.p, coalesce(itl.c, cn.c) AS c,
        |  sqrt(list_sum(list_transform(generate_series(1, 64),
        |    i -> coalesce(itl.c, cn.c)[i] * coalesce(itl.c, cn.c)[i]))) AS nc
        |  FROM cn LEFT JOIN itl ON itl.cell = cn.p),
        |scored AS (SELECT vec_id,
        |  list(list_sum(list_transform(generate_series(1, 64), i -> v[i] * c[i])) / nc ORDER BY p) AS scores
        |  FROM e CROSS JOIN tc GROUP BY vec_id),
        |cells AS (SELECT vec_id, scores,
        |  list_position(scores, list_aggregate(scores, 'max')) - 1 AS cell FROM scored),
        |seed AS (SELECT s, c, list_transform(generate_series(1, 8),
        |    d -> (strpos('0123456789abcdef', substring(md5(concat(
        |      s * 100 + c + 2000, '_', d - 1)), 1, 1)) - 8.5)) AS cent
        |  FROM generate_series(0, 7) ts(s)
        |  CROSS JOIN generate_series(0, 15) tc2(c)),
        |sub AS (SELECT vec_id, s,
        |    list_transform(generate_series(1, 8), d -> v[s * 8 + d]) AS sv
        |  FROM e CROSS JOIN generate_series(0, 7) ts(s)),
        |p0 AS (SELECT vec_id, s, list(list_sum(list_transform(
        |    generate_series(1, 8),
        |    i -> (sv[i] - cent[i]) * (sv[i] - cent[i]))) ORDER BY c) AS dists
        |  FROM sub JOIN seed USING (s) WHERE vec_id % 5 = 0
        |  GROUP BY vec_id, s),
        |pa0 AS (SELECT vec_id, s,
        |    list_position(dists, list_aggregate(dists, 'min')) - 1 AS code
        |  FROM p0),
        |ptr AS (SELECT s, code, d, round(avg(sv[d]), 4) AS cd
        |  FROM pa0 JOIN sub USING (vec_id, s)
        |  CROSS JOIN generate_series(1, 8) t(d)
        |  GROUP BY s, code, d),
        |ptl AS (SELECT s, code, list(cd ORDER BY d) AS cent FROM ptr
        |  GROUP BY s, code),
        |bk AS (SELECT seed.s, seed.c, coalesce(ptl.cent, seed.cent) AS cent
        |  FROM seed LEFT JOIN ptl ON ptl.s = seed.s AND ptl.code = seed.c),
        |fs AS (SELECT vec_id, s, list(list_sum(list_transform(
        |    generate_series(1, 8),
        |    i -> (sv[i] - cent[i]) * (sv[i] - cent[i]))) ORDER BY c) AS dists
        |  FROM sub JOIN bk USING (s) GROUP BY vec_id, s),
        |codes AS (SELECT vec_id, s,
        |    list_position(dists, list_aggregate(dists, 'min')) - 1 AS code
        |  FROM fs),
        |q AS (SELECT scores AS qscores, list_sort(scores, 'DESC')[2] AS thr
        |  FROM cells WHERE vec_id = 7),
        |cand AS (SELECT c.vec_id FROM cells c CROSS JOIN q
        |  WHERE c.vec_id <> 7 AND q.qscores[c.cell + 1] >= q.thr),
        |qs AS (SELECT s, sv AS qsv FROM sub WHERE vec_id = 7),
        |ad AS (SELECT codes.vec_id, list_sum(list_transform(
        |    generate_series(1, 8),
        |    i -> (qsv[i] - cent[i]) * (qsv[i] - cent[i]))) AS ds
        |  FROM codes JOIN cand USING (vec_id)
        |  JOIN bk ON bk.s = codes.s AND bk.c = codes.code
        |  JOIN qs ON qs.s = codes.s)
        |SELECT vec_id, round(sum(ds), 4) AS adc_dist
        |FROM ad GROUP BY vec_id
        |ORDER BY adc_dist, vec_id LIMIT 10""".stripMargin) { (s, _) =>
      Similarity.annTopKIvfPq(s.table("embeddings"), queryId = 7, k = 10,
        centroids = 8, nprobe = 2, dims = 64)
    },

    // IVF-PQ with RESIDUAL coding (the FAISS IVFADC default): codebooks
    // train on v − centroid(cell(v)) and ADC scores against the query's
    // per-cell residual — same oracle chain with the residual substitution
    df("ss_ann_ivfpq_res",
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |cn AS (SELECT p, c, sqrt(list_sum(list_transform(generate_series(1, 64), i -> c[i] * c[i]))) AS nc
        |  FROM (SELECT p, list_transform(generate_series(1, 64),
        |    d -> (strpos('0123456789abcdef', substring(md5(concat(p + 1000, '_', d - 1)), 1, 1)) - 8.5)) AS c
        |  FROM generate_series(0, 7) t(p)) x),
        |i0 AS (SELECT vec_id,
        |  list(list_sum(list_transform(generate_series(1, 64), i -> v[i] * c[i])) / nc ORDER BY p) AS scores
        |  FROM e CROSS JOIN cn WHERE vec_id % 5 = 0 GROUP BY vec_id),
        |ic0 AS (SELECT vec_id, list_position(scores, list_aggregate(scores, 'max')) - 1 AS cell FROM i0),
        |itr AS (SELECT cell, d, round(avg(v[d]), 4) AS cd
        |  FROM ic0 JOIN e USING (vec_id) CROSS JOIN generate_series(1, 64) t(d)
        |  GROUP BY cell, d),
        |itl AS (SELECT cell, list(cd ORDER BY d) AS c FROM itr GROUP BY cell),
        |tc AS (SELECT cn.p, coalesce(itl.c, cn.c) AS c,
        |  sqrt(list_sum(list_transform(generate_series(1, 64),
        |    i -> coalesce(itl.c, cn.c)[i] * coalesce(itl.c, cn.c)[i]))) AS nc
        |  FROM cn LEFT JOIN itl ON itl.cell = cn.p),
        |scored AS (SELECT vec_id,
        |  list(list_sum(list_transform(generate_series(1, 64), i -> v[i] * c[i])) / nc ORDER BY p) AS scores
        |  FROM e CROSS JOIN tc GROUP BY vec_id),
        |cells AS (SELECT vec_id, scores,
        |  list_position(scores, list_aggregate(scores, 'max')) - 1 AS cell FROM scored),
        |seed AS (SELECT s, c, list_transform(generate_series(1, 8),
        |    d -> (strpos('0123456789abcdef', substring(md5(concat(
        |      s * 100 + c + 2000, '_', d - 1)), 1, 1)) - 8.5)) AS cent
        |  FROM generate_series(0, 7) ts(s)
        |  CROSS JOIN generate_series(0, 15) tc2(c)),
        |rz AS (SELECT e.vec_id, cells.cell,
        |    list_transform(generate_series(1, 64), i -> e.v[i] - tc.c[i]) AS rv
        |  FROM e JOIN cells USING (vec_id) JOIN tc ON tc.p = cells.cell),
        |sub AS (SELECT vec_id, s,
        |    list_transform(generate_series(1, 8), d -> rv[s * 8 + d]) AS sv
        |  FROM rz CROSS JOIN generate_series(0, 7) ts(s)),
        |p0 AS (SELECT vec_id, s, list(list_sum(list_transform(
        |    generate_series(1, 8),
        |    i -> (sv[i] - cent[i]) * (sv[i] - cent[i]))) ORDER BY c) AS dists
        |  FROM sub JOIN seed USING (s) WHERE vec_id % 5 = 0
        |  GROUP BY vec_id, s),
        |pa0 AS (SELECT vec_id, s,
        |    list_position(dists, list_aggregate(dists, 'min')) - 1 AS code
        |  FROM p0),
        |ptr AS (SELECT s, code, d, round(avg(sv[d]), 4) AS cd
        |  FROM pa0 JOIN sub USING (vec_id, s)
        |  CROSS JOIN generate_series(1, 8) t(d)
        |  GROUP BY s, code, d),
        |ptl AS (SELECT s, code, list(cd ORDER BY d) AS cent FROM ptr
        |  GROUP BY s, code),
        |bk AS (SELECT seed.s, seed.c, coalesce(ptl.cent, seed.cent) AS cent
        |  FROM seed LEFT JOIN ptl ON ptl.s = seed.s AND ptl.code = seed.c),
        |fs AS (SELECT vec_id, s, list(list_sum(list_transform(
        |    generate_series(1, 8),
        |    i -> (sv[i] - cent[i]) * (sv[i] - cent[i]))) ORDER BY c) AS dists
        |  FROM sub JOIN bk USING (s) GROUP BY vec_id, s),
        |codes AS (SELECT vec_id, s,
        |    list_position(dists, list_aggregate(dists, 'min')) - 1 AS code
        |  FROM fs),
        |q AS (SELECT scores AS qscores, list_sort(scores, 'DESC')[2] AS thr
        |  FROM cells WHERE vec_id = 7),
        |cand AS (SELECT c.vec_id, c.cell FROM cells c CROSS JOIN q
        |  WHERE c.vec_id <> 7 AND q.qscores[c.cell + 1] >= q.thr),
        |qvv AS (SELECT v AS qv FROM e WHERE vec_id = 7),
        |qr AS (SELECT tc.p AS cell, s, list_transform(generate_series(1, 8),
        |    d -> qv[s * 8 + d] - tc.c[s * 8 + d]) AS qsv
        |  FROM qvv CROSS JOIN tc CROSS JOIN generate_series(0, 7) ts(s)),
        |ad AS (SELECT codes.vec_id, list_sum(list_transform(
        |    generate_series(1, 8),
        |    i -> (qsv[i] - cent[i]) * (qsv[i] - cent[i]))) AS ds
        |  FROM codes JOIN cand USING (vec_id)
        |  JOIN bk ON bk.s = codes.s AND bk.c = codes.code
        |  JOIN qr ON qr.s = codes.s AND qr.cell = cand.cell)
        |SELECT vec_id, round(sum(ds), 4) AS adc_dist
        |FROM ad GROUP BY vec_id
        |ORDER BY adc_dist, vec_id LIMIT 10""".stripMargin) { (s, _) =>
      Similarity.annTopKIvfPqResidual(s.table("embeddings"), queryId = 7,
        k = 10, centroids = 8, nprobe = 2, dims = 64)
    },

    // semantic clustering: connected components over the thresholded
    // k-NN-graph edges — SemDeDup's drop-verdict generalized to whole
    // cluster structure (keeper selection, diversity caps). Same trained
    // cells; the recursive CTE states the transitive-closure truth the
    // iterative min-label propagation must reach
    df("dd_semantic_clusters", ddSemanticClustersOracle) { (s, _) =>
      val emb = s.table("embeddings")
      val edges = Similarity.knnGraph(emb, k = 3, centroids = 8, dims = 64)
        .where(col("sim") >= 0.3)
        .select(col("src").as("id_a"), col("dst").as("id_b"))
      Dedup.neardupClusters(edges).orderBy("id").limit(200)
    },
    // the same cluster structure under the OPERATOR DEFAULT cell budget
    // (AutoCells: k = max(8, ceil(n/250)) — see ss_knn_graph_scaled).
    // This was the repo's slowest sf1 query in its pinned-8 form (the
    // whole corpus lands in 8 cells so the pair join is ~n²/8); with
    // data-proportional cells the per-cell pair work stays constant and
    // the sf1 gate measures the 100 TB default path every round.
    df("dd_semantic_clusters_scaled",
        scaledCellsOracle(ddSemanticClustersOracle)) { (s, _) =>
      val emb = s.table("embeddings")
      val edges = Similarity.knnGraph(emb, k = 3, dims = 64)
        .where(col("sim") >= 0.3)
        .select(col("src").as("id_a"), col("dst").as("id_b"))
      Dedup.neardupClusters(edges).orderBy("id").limit(200)
    },

    // matryoshka adaptive retrieval: 16-dim-prefix cosine funnels to 50
    // candidates, exact 64-dim cosine reranks to 10; round(4) + id
    // tiebreaks at both cuts
    df("ss_ann_matryoshka",
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |q AS (SELECT v AS qv, v[1:16] AS qp FROM e WHERE vec_id = 7),
        |p AS (SELECT vec_id, v,
        |  round(list_sum(list_transform(generate_series(1, 16),
        |    i -> v[i] * qp[i])) /
        |   (sqrt(list_sum(list_transform(generate_series(1, 16), i -> v[i] * v[i]))) *
        |    sqrt(list_sum(list_transform(generate_series(1, 16), i -> qp[i] * qp[i])))), 4)
        |    AS psim, qv
        |  FROM e CROSS JOIN q WHERE vec_id <> 7),
        |cand AS (SELECT * FROM p ORDER BY psim DESC, vec_id LIMIT 50),
        |r AS (SELECT vec_id, psim,
        |  round(list_sum(list_transform(generate_series(1, 64),
        |    i -> v[i] * qv[i])) /
        |   (sqrt(list_sum(list_transform(generate_series(1, 64), i -> v[i] * v[i]))) *
        |    sqrt(list_sum(list_transform(generate_series(1, 64), i -> qv[i] * qv[i])))), 4)
        |    AS sim
        |  FROM cand)
        |SELECT vec_id, psim, sim FROM r
        |ORDER BY sim DESC, vec_id LIMIT 10""".stripMargin) { (s, _) =>
      Similarity.annTopKMatryoshka(s.table("embeddings"), queryId = 7,
        k = 10, prefilterK = 50, prefixDims = 16)
    },

    // within-cell k-NN graph under the trained quantizer: directed top-3
    // neighbor edges per vector, cells bound the pairwise stage; sims
    // round(4) before the rank, dst tiebreak
    df("ss_knn_graph", ssKnnGraphOracle) { (s, _) =>
      Similarity.knnGraph(s.table("embeddings"), k = 3, centroids = 8,
          dims = 64)
        .orderBy("src", "rnk").limit(300)
    },
    // the same k-NN graph under the OPERATOR DEFAULT cell budget
    // (AutoCells: k = max(8, ceil(n/250))) — both sides derive k from the
    // data, so this entry stays oracle-exact at any scale and the sf1
    // gate measures the default path, not only the pinned-8 oracle form
    df("ss_knn_graph_scaled", scaledCellsOracle(ssKnnGraphOracle)) { (s, _) =>
      Similarity.knnGraph(s.table("embeddings"), k = 3, dims = 64)
        .orderBy("src", "rnk").limit(300)
    },

    // hard-negative mining: top-3 most-similar DIFFERENT-label vectors per
    // vector — the contrastive-training pair generator. Same trained-cells
    // chain as ss_knn_graph with the label inequality at the pair join.
    df("ss_hard_negatives", ssHardNegativesOracle) { (s, _) =>
      Similarity.hardNegatives(s.table("embeddings"), k = 3, centroids = 8,
          dims = 64)
        .orderBy("src", "rnk").limit(300)
    },
    // hard negatives under the operator-default AutoCells budget (see
    // ss_knn_graph_scaled)
    df("ss_hard_negatives_scaled", scaledCellsOracle(ssHardNegativesOracle)) { (s, _) =>
      Similarity.hardNegatives(s.table("embeddings"), k = 3, dims = 64)
        .orderBy("src", "rnk").limit(300)
    },

    // zero-shot domain tagging: nearest-label-centroid classification from
    // the trusted seed slice (vec_id % 5 = 0), reported as the full
    // confusion matrix (true label x predicted label x count)
    df("ss_centroid_classify",
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |sc AS (SELECT em.label AS lbl, d, round(avg(e.v[d]), 4) AS cd
        |  FROM e JOIN embeddings em ON em.vec_id = e.vec_id
        |  CROSS JOIN generate_series(1, 64) t(d)
        |  WHERE e.vec_id % 5 = 0 GROUP BY lbl, d),
        |lcl AS (SELECT lbl, list(cd ORDER BY d) AS c FROM sc GROUP BY lbl),
        |lcn AS (SELECT lbl, c, sqrt(list_sum(list_transform(generate_series(1, 64), i -> c[i] * c[i]))) AS nc FROM lcl),
        |scored AS (SELECT vec_id,
        |  list(list_sum(list_transform(generate_series(1, 64), i -> v[i] * c[i])) / nc ORDER BY lbl) AS scores,
        |  list(lbl ORDER BY lbl) AS lbls
        |  FROM e CROSS JOIN lcn GROUP BY vec_id),
        |pred AS (SELECT vec_id,
        |  lbls[list_position(scores, list_aggregate(scores, 'max'))] AS pred_label
        |  FROM scored)
        |SELECT em.label, p.pred_label, count(*) AS n
        |FROM pred p JOIN embeddings em ON em.vec_id = p.vec_id
        |GROUP BY em.label, p.pred_label
        |ORDER BY em.label, p.pred_label""".stripMargin) { (s, _) =>
      Similarity.centroidClassify(s.table("embeddings"), dims = 64)
        .groupBy("label", "pred_label").agg(count(lit(1)).as("n"))
        .orderBy("label", "pred_label")
    },

    // topic/domain clustering: 2 Lloyd iterations of sampled spherical
    // k-means from the deterministic seed matrix, then every vector is
    // assigned map-only and per-cluster inertia sums the round(4) per-row
    // squared distances exactly (DECIMAL), cast to DOUBLE for the report
    df("ss_kmeans_topics",
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |es AS (SELECT * FROM e WHERE vec_id % 5 = 0),
        |cn0 AS (SELECT p, c, sqrt(list_sum(list_transform(generate_series(1, 64), i -> c[i] * c[i]))) AS nc
        |  FROM (SELECT p, list_transform(generate_series(1, 64),
        |    d -> (strpos('0123456789abcdef', substring(md5(concat(p + 1000, '_', d - 1)), 1, 1)) - 8.5)) AS c
        |  FROM generate_series(0, 7) t(p)) x),
        |${duckKmeansIter("cn0", "cn1", "1")},
        |${duckKmeansIter("cn1", "cn2", "2")},
        |fin AS (SELECT vec_id, list_position(scores, list_aggregate(scores, 'max')) - 1 AS cluster FROM (
        |  SELECT vec_id, list(list_sum(list_transform(generate_series(1, 64), i -> v[i] * c[i])) / nc ORDER BY p) AS scores
        |  FROM e CROSS JOIN cn2 GROUP BY vec_id) x),
        |sq AS (SELECT f.vec_id, f.cluster,
        |  round(list_sum(list_transform(generate_series(1, 64),
        |    i -> (e.v[i] - c2.c[i]) * (e.v[i] - c2.c[i]))), 4) AS sqd
        |  FROM fin f JOIN e ON e.vec_id = f.vec_id JOIN cn2 c2 ON c2.p = f.cluster)
        |SELECT cluster, count(*) AS n, CAST(sum(vec_id) AS BIGINT) AS id_sum,
        |  CAST(sum(CAST(sqd AS DECIMAL(20,4))) AS DOUBLE) AS inertia
        |FROM sq GROUP BY cluster ORDER BY cluster""".stripMargin) { (s, _) =>
      Similarity.kmeansClusters(s.table("embeddings"), k = 8, dims = 64,
          iters = 2)
        .groupBy("cluster")
        .agg(count(lit(1)).as("n"), sum("vec_id").as("id_sum"),
          sum(col("sqd").cast("decimal(20,4)")).cast("double").as("inertia"))
        .orderBy("cluster")
    },

    // label propagation over the k-NN graph: 20% seeds (vec_id % 5 = 0)
    // keep their trusted label; everyone else takes the majority label of
    // their k=3 out-neighbors for 2 synchronous rounds (count desc, label
    // asc tiebreak). The oracle recomputes the full trained-cells kNN
    // chain plus both rounds
    df("ss_label_prop", ssLabelPropOracle) { (s, _) =>
      Similarity.labelPropagation(s.table("embeddings"), k = 3, centroids = 8,
          dims = 64, iters = 2, seedMod = 5)
        .orderBy("vec_id").limit(300)
    },
    // label propagation under the operator-default AutoCells budget (see
    // ss_knn_graph_scaled)
    df("ss_label_prop_scaled", scaledCellsOracle(ssLabelPropOracle)) { (s, _) =>
      Similarity.labelPropagation(s.table("embeddings"), k = 3, dims = 64,
          iters = 2, seedMod = 5)
        .orderBy("vec_id").limit(300)
    },

    // embedding-space decontamination: max cosine of every corpus vector
    // to a broadcast eval set (label 0, id%5 sample), flagged at 0.35 —
    // dots/norms are bit-identical sequential sums in both engines, so
    // the max is exact and only the final round(4) guards the compare
    df("ss_decontaminate_embed",
      """WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
        |n AS (SELECT vec_id, label, v,
        |  sqrt(list_sum(list_transform(generate_series(1, 64), i -> v[i] * v[i]))) AS nv
        |  FROM e),
        |ev AS (SELECT v AS evv, nv AS nev FROM n
        |  WHERE label = 0 AND vec_id % 5 = 0),
        |m AS (SELECT c.vec_id,
        |  round(max(list_sum(list_transform(generate_series(1, 64),
        |    i -> c.v[i] * evv[i])) / (c.nv * nev)), 4) AS max_eval_sim
        |  FROM n c CROSS JOIN ev WHERE c.label <> 0 GROUP BY c.vec_id)
        |SELECT vec_id, max_eval_sim, max_eval_sim >= 0.35 AS contaminated
        |FROM m ORDER BY vec_id LIMIT 100""".stripMargin) { (s, _) =>
      val emb = s.table("embeddings")
      Similarity.embeddingDecontaminate(
          emb.where(col("label") =!= 0),
          emb.where(col("label") === 0 && col("vec_id") % 5 === 0),
          threshold = 0.35)
        .orderBy("vec_id").limit(100)
    },

    // exact top-k per stratum (k best docs per language by length,
    // deterministic doc_id tiebreak): two window passes Spark-side — a
    // salt-bucketed prune then the global rank — so one giant stratum
    // cannot pin a single task; the oracle states the single-window truth
    // the two-phase plan must equal
    df("ta_stratum_topk",
      """WITH r AS (SELECT lang, doc_id, n_chars,
        |  CAST(row_number() OVER (PARTITION BY lang
        |    ORDER BY n_chars DESC, doc_id) AS INTEGER) AS rank_in_stratum
        |  FROM documents)
        |SELECT lang, doc_id, n_chars, rank_in_stratum FROM r
        |WHERE rank_in_stratum <= 3
        |ORDER BY lang, rank_in_stratum""".stripMargin) { (s, _) =>
      graft.operators.Sampling.stratumTopK(s.table("documents"), "lang",
          col("n_chars"), k = 3)
        .select("lang", "doc_id", "n_chars", "rank_in_stratum")
        .orderBy("lang", "rank_in_stratum")
    },

    // ---- embedding compression ------------------------------------------

    // matryoshka prefix truncation + renormalize: scalar rollups (sum of
    // renormalized coords, prefix norm) keep the check float-portable
    df("ss_matryoshka",
      """WITH v AS (SELECT vec_id,
        |  list_transform(embedding[1:16], x -> CAST(x AS DOUBLE)) AS t
        |  FROM embeddings),
        |n AS (SELECT vec_id, t,
        |  sqrt(list_sum(list_transform(t, x -> x * x))) AS nrm FROM v)
        |SELECT vec_id, round(nrm, 4) AS norm_trunc,
        |  round(CASE WHEN nrm > 0
        |    THEN list_sum(list_transform(t, x -> x / nrm))
        |    ELSE 0.0 END, 4) AS elem_sum
        |FROM n ORDER BY vec_id LIMIT 100""".stripMargin) { (s, _) =>
      Similarity.matryoshkaTruncate(s.table("embeddings"), dims = 16)
        .select(col("vec_id"), round(col("norm_trunc"), 4).as("norm_trunc"),
          round(aggregate(col("vec_trunc"), lit(0.0), (a, x) => a + x), 4)
            .as("elem_sum"))
        .orderBy("vec_id").limit(100)
    },

    // symmetric int8 quantization: integer rollups are exact cross-engine
    df("ss_quant_int8",
      """WITH v AS (SELECT vec_id,
        |  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS t
        |  FROM embeddings),
        |m AS (SELECT vec_id, t,
        |  list_max(list_transform(t, x -> abs(x))) AS ma FROM v),
        |q AS (SELECT vec_id, ma, CASE WHEN ma > 0
        |  THEN list_transform(t, x ->
        |    greatest(-127, least(127, CAST(round(x * 127.0 / ma) AS BIGINT))))
        |  ELSE list_transform(t, x -> CAST(0 AS BIGINT)) END AS qv FROM m)
        |SELECT vec_id, round(ma / 127.0, 6) AS scale,
        |  CAST(list_sum(qv) AS BIGINT) AS q_sum,
        |  CAST(list_max(qv) AS BIGINT) AS q_max,
        |  CAST(list_min(qv) AS BIGINT) AS q_min
        |FROM q ORDER BY vec_id LIMIT 100""".stripMargin) { (s, _) =>
      Similarity.quantizeInt8(s.table("embeddings"))
        .select(col("vec_id"), round(col("max_abs") / 127.0, 6).as("scale"),
          aggregate(col("q"), lit(0L), (a, x) => a + x).as("q_sum"),
          array_max(col("q")).as("q_max"), array_min(col("q")).as("q_min"))
        .orderBy("vec_id").limit(100)
    },

    // SQ8 ANN: int8-code scoring (per-vector scales cancel in the cosine,
    // so candidate ranking is exact integer arithmetic) + float rerank of
    // the top-40 window only
    df("ss_sq8_topk",
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |g AS (SELECT vec_id, v,
        |  list_max(list_transform(v, x -> abs(x))) AS ma FROM e),
        |c AS (SELECT vec_id, v, CASE WHEN ma > 0
        |  THEN list_transform(v, x ->
        |    greatest(-127, least(127, CAST(round(x * 127.0 / ma) AS BIGINT))))
        |  ELSE list_transform(v, x -> CAST(0 AS BIGINT)) END AS q FROM g),
        |qr AS (SELECT v AS qv, q AS qc FROM c WHERE vec_id = 7),
        |s AS (SELECT vec_id, v, qv,
        |  list_sum(list_transform(generate_series(1, len(q)), i -> q[i] * qc[i])) AS idot,
        |  list_sum(list_transform(q, x -> x * x)) AS inv,
        |  list_sum(list_transform(qc, x -> x * x)) AS inq
        |  FROM c CROSS JOIN qr WHERE vec_id <> 7),
        |a AS (SELECT vec_id, v, qv, CASE WHEN inv > 0 AND inq > 0
        |  THEN round(idot / (sqrt(inv) * sqrt(inq)), 6)
        |  ELSE -1.0 END AS approx_sim FROM s),
        |cand AS (SELECT * FROM a ORDER BY approx_sim DESC, vec_id LIMIT 40)
        |SELECT vec_id, approx_sim,
        |  CASE WHEN list_sum(list_transform(v, x -> x * x)) > 0
        |      AND list_sum(list_transform(qv, x -> x * x)) > 0
        |    THEN round(list_sum(list_transform(generate_series(1, len(v)), i -> v[i] * qv[i]))
        |      / (sqrt(list_sum(list_transform(v, x -> x * x)))
        |        * sqrt(list_sum(list_transform(qv, x -> x * x)))), 4)
        |    ELSE -1.0 END AS sim
        |FROM cand ORDER BY sim DESC, vec_id LIMIT 10""".stripMargin) { (s, _) =>
      Similarity.annTopKSq8(s.table("embeddings"), queryId = 7, k = 10,
        rerank = 40)
    },

    // batch SQ8 ANN: the whole query set over the int8-code scan in one
    // corpus pass, bounded-heap candidates, float rerank per query
    df("ss_batch_sq8",
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |g AS (SELECT vec_id, v,
        |  list_max(list_transform(v, x -> abs(x))) AS ma FROM e),
        |c AS (SELECT vec_id, v, CASE WHEN ma > 0
        |  THEN list_transform(v, x ->
        |    greatest(-127, least(127, CAST(round(x * 127.0 / ma) AS BIGINT))))
        |  ELSE list_transform(v, x -> CAST(0 AS BIGINT)) END AS q FROM g),
        |qs AS (SELECT vec_id AS qid, v AS qv, q AS qc,
        |  list_sum(list_transform(q, x -> x * x)) AS inq
        |  FROM c WHERE vec_id % 97 = 0),
        |s AS (SELECT qid, c.vec_id, qv, c.v,
        |  CASE WHEN list_sum(list_transform(c.q, x -> x * x)) > 0 AND inq > 0
        |    THEN round(list_sum(list_transform(generate_series(1, len(c.q)),
        |        i -> c.q[i] * qc[i]))
        |      / (sqrt(list_sum(list_transform(c.q, x -> x * x))) * sqrt(inq)), 6)
        |    ELSE -1.0 END AS approx_sim
        |  FROM c CROSS JOIN qs WHERE c.vec_id <> qid),
        |ra AS (SELECT *, row_number() OVER (PARTITION BY qid
        |    ORDER BY approx_sim DESC, vec_id) AS ar FROM s),
        |cand AS (SELECT * FROM ra WHERE ar <= 40),
        |ex AS (SELECT qid AS query_id, vec_id, approx_sim,
        |  CASE WHEN list_sum(list_transform(v, x -> x * x)) > 0
        |      AND list_sum(list_transform(qv, x -> x * x)) > 0
        |    THEN round(list_sum(list_transform(generate_series(1, len(v)),
        |        i -> v[i] * qv[i]))
        |      / (sqrt(list_sum(list_transform(v, x -> x * x)))
        |        * sqrt(list_sum(list_transform(qv, x -> x * x)))), 4)
        |    ELSE -1.0 END AS sim
        |  FROM cand),
        |r AS (SELECT query_id, vec_id, approx_sim, sim,
        |  CAST(row_number() OVER (PARTITION BY query_id
        |    ORDER BY sim DESC, vec_id) AS BIGINT) AS rnk FROM ex)
        |SELECT query_id, vec_id, approx_sim, sim, rnk FROM r WHERE rnk <= 5
        |ORDER BY query_id, rnk""".stripMargin) { (s, _) =>
      val emb = s.table("embeddings")
      Similarity.batchTopKSq8(emb,
          emb.where(col("vec_id") % 97 === 0)
            .select(col("vec_id").as("query_id"), col("embedding")),
          k = 5, rerank = 40)
        .orderBy("query_id", "rnk")
    },

    // hybrid retrieval: BM25 candidates + exact-cosine candidates fused by
    // reciprocal rank (rank-only — lexical and dense scores never compare
    // directly); fused score is a fixed-order sum of exact rationals
    df("ss_hybrid_rrf",
      """WITH base AS (SELECT doc_id,
        |  list_filter(regexp_split_to_array(lower(text), '\s+'), w -> len(w) > 0) AS ws
        |  FROM documents),
        |b AS (SELECT doc_id, ws, CAST(len(ws) AS DOUBLE) AS dl FROM base WHERE len(ws) > 0),
        |stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM b),
        |tf AS (SELECT doc_id, dl, term, CAST(count(*) AS DOUBLE) AS tf
        |  FROM (SELECT doc_id, dl, unnest(ws) AS term FROM b) x
        |  WHERE term IN ('vector', 'merge', 'spark') GROUP BY doc_id, dl, term),
        |dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
        |c AS (SELECT tf.doc_id,
        |  CAST(round(ln(1 + (s.n_docs - df + 0.5) / (df + 0.5))
        |    * tf.tf * 2.2 / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * tf.dl / s.avgdl)), 6)
        |    AS DECIMAL(18,6)) AS w
        |  FROM tf JOIN dfreq USING (term) CROSS JOIN stats s),
        |lex AS (SELECT doc_id, CAST(round(sum(w), 4) AS DOUBLE) AS score
        |  FROM c GROUP BY doc_id ORDER BY score DESC, doc_id LIMIT 20),
        |lr AS (SELECT doc_id,
        |  row_number() OVER (ORDER BY score DESC, doc_id) AS br FROM lex),
        |e2 AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |q2 AS (SELECT v AS qv FROM e2 WHERE vec_id = 7),
        |sc2 AS (SELECT vec_id, round(
        |    list_sum(list_transform(generate_series(1, len(v)), i -> v[i] * qv[i]))
        |    / (sqrt(list_sum(list_transform(v, x -> x * x)))
        |      * sqrt(list_sum(list_transform(qv, x -> x * x)))), 4) AS sim
        |  FROM e2 CROSS JOIN q2 WHERE vec_id <> 7
        |  ORDER BY sim DESC, vec_id LIMIT 20),
        |ar AS (SELECT vec_id AS doc_id,
        |  row_number() OVER (ORDER BY sim DESC, vec_id) AS ar FROM sc2)
        |SELECT coalesce(lr.doc_id, ar.doc_id) AS doc_id,
        |  lr.br AS bm25_rank, ar.ar AS ann_rank,
        |  round(coalesce(1.0 / (60 + lr.br), 0)
        |    + coalesce(1.0 / (60 + ar.ar), 0), 6) AS rrf_score
        |FROM lr FULL OUTER JOIN ar ON lr.doc_id = ar.doc_id
        |ORDER BY rrf_score DESC, doc_id LIMIT 15""".stripMargin) { (s, _) =>
      Similarity.hybridTopKRrf(s.table("documents"), s.table("embeddings"),
        queryId = 7, queryTerms = Seq("vector", "merge", "spark"), k = 15)
    },

    // ---- corpus-curation filters (C4 / Gopher / chunk dedup / packing) ----

    // C4 line filter (Raffel et al. 2020): terminal-punctuation lines with
    // >= 3 words and no javascript mention; brace/lorem document flags
    df("ta_c4_filter",
      """WITH s AS (SELECT doc_id, text,
        |  list_transform(regexp_split_to_array(text, '\n'), l -> trim(l)) AS lines
        |  FROM documents),
        |k AS (SELECT doc_id, text, lines,
        |  list_filter(lines, l -> regexp_matches(l, '[.!?"]$')
        |    AND len(list_filter(regexp_split_to_array(l, '\s+'), w -> len(w) > 0)) >= 3
        |    AND NOT contains(lower(l), 'javascript')) AS kept
        |  FROM s)
        |SELECT doc_id, CAST(len(lines) AS BIGINT) AS n_lines,
        |  CAST(len(kept) AS BIGINT) AS kept_lines,
        |  contains(text, '{') AS has_brace,
        |  contains(lower(text), 'lorem ipsum') AS has_lorem,
        |  (len(kept) >= 3 AND NOT contains(text, '{')
        |    AND NOT contains(lower(text), 'lorem ipsum')) AS keep,
        |  md5(coalesce(array_to_string(kept, chr(10)), '')) AS kept_digest
        |FROM k ORDER BY doc_id LIMIT 100""".stripMargin) { (s, _) =>
      graft.operators.CorpusFilters.c4LineFilter(s.table("documents"))
        .orderBy("doc_id").limit(100)
    },

    // Gopher repetition stats (Rae et al. 2021): most frequent word /
    // word 2-gram with deterministic lexicographic tie-break
    df("ta_repetition",
      """WITH raw AS (SELECT doc_id,
        |  list_filter(regexp_split_to_array(lower(text), '\s+'), w -> len(w) > 0) AS ws
        |  FROM documents),
        |base AS (SELECT doc_id, ws FROM raw WHERE len(ws) > 0),
        |tot AS (SELECT doc_id, CAST(len(ws) AS BIGINT) AS total_words,
        |  CAST(list_sum(list_transform(ws, w -> len(w))) AS BIGINT) AS total_chars
        |  FROM base),
        |wx AS (SELECT doc_id, unnest(ws) AS w FROM base),
        |wcnt AS (SELECT doc_id, w, count(*) AS cnt FROM wx GROUP BY 1, 2),
        |wmax AS (SELECT doc_id, max(cnt) AS mc FROM wcnt GROUP BY 1),
        |wtop AS (SELECT c.doc_id, min(c.w) AS top_word,
        |  CAST(max(c.cnt) AS BIGINT) AS top_word_cnt
        |  FROM wcnt c JOIN wmax m ON c.doc_id = m.doc_id AND c.cnt = m.mc
        |  GROUP BY c.doc_id),
        |bx AS (SELECT doc_id, unnest(CASE WHEN len(ws) >= 2
        |  THEN list_transform(generate_series(1, len(ws) - 1),
        |    i -> ws[i] || ' ' || ws[i + 1])
        |  ELSE CAST([] AS VARCHAR[]) END) AS g FROM base),
        |bcnt AS (SELECT doc_id, g, count(*) AS cnt FROM bx GROUP BY 1, 2),
        |bmax AS (SELECT doc_id, max(cnt) AS mc FROM bcnt GROUP BY 1),
        |btop AS (SELECT c.doc_id, min(c.g) AS top_2gram,
        |  CAST(max(c.cnt) AS BIGINT) AS top_2gram_cnt
        |  FROM bcnt c JOIN bmax m ON c.doc_id = m.doc_id AND c.cnt = m.mc
        |  GROUP BY c.doc_id)
        |SELECT t.doc_id, total_words, total_chars, top_word, top_word_cnt,
        |  round(CAST(top_word_cnt AS DOUBLE) / total_words, 4) AS top_word_frac,
        |  top_2gram, top_2gram_cnt,
        |  round(top_2gram_cnt * CAST(len(top_2gram) - 1 AS DOUBLE) / total_chars, 4)
        |    AS top_2gram_frac
        |FROM tot t LEFT JOIN wtop USING (doc_id) LEFT JOIN btop USING (doc_id)
        |ORDER BY doc_id LIMIT 100""".stripMargin) { (s, _) =>
      graft.operators.CorpusFilters.repetitionStats(s.table("documents"))
        .orderBy("doc_id").limit(100)
    },

    // sub-document dedup: 16-word chunks, corpus-wide keep-first by
    // (doc_id, position) — the RefinedWeb-style boilerplate killer
    df("dd_chunk_dedup",
      """WITH raw AS (SELECT doc_id,
        |  list_filter(regexp_split_to_array(lower(text), '\s+'), w -> len(w) > 0) AS ws
        |  FROM documents),
        |base AS (SELECT doc_id, ws FROM raw WHERE len(ws) > 0),
        |cx AS (SELECT doc_id, ws,
        |  unnest(generate_series(1, CAST(ceil(len(ws) / 16.0) AS INT))) AS idx
        |  FROM base),
        |ch AS (SELECT doc_id, idx,
        |  md5(array_to_string(list_slice(ws, (idx - 1) * 16 + 1, idx * 16), ' ')) AS h
        |  FROM cx),
        |rn AS (SELECT doc_id, idx,
        |  row_number() OVER (PARTITION BY h ORDER BY doc_id, idx) AS rn FROM ch)
        |SELECT doc_id, count(*) AS n_chunks,
        |  CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS kept_chunks,
        |  CAST(count(*) - sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS dropped_chunks
        |FROM rn GROUP BY doc_id ORDER BY doc_id LIMIT 100""".stripMargin) { (s, _) =>
      graft.operators.CorpusFilters.chunkDedup(s.table("documents"))
        .orderBy("doc_id").limit(100)
    },

    // content-defined chunking dedup: boundaries from the md5 of a 4-word
    // rolling window (hex prefix '0' → ~16-word mean chunks), so chunk
    // alignment survives insertions; corpus-wide keep-first like dd_chunk
    df("dd_cdc_dedup",
      """WITH raw AS (SELECT doc_id,
        |  list_filter(regexp_split_to_array(lower(text), '\s+'), w -> len(w) > 0) AS ws
        |  FROM documents),
        |base AS (SELECT doc_id, ws FROM raw WHERE len(ws) > 0),
        |wx AS (SELECT doc_id, ws, unnest(generate_series(1, len(ws))) AS idx
        |  FROM base),
        |fx AS (SELECT doc_id, idx, ws[idx] AS word,
        |  CASE WHEN idx >= 4 AND substring(md5(array_to_string(
        |    list_slice(ws, idx - 3, idx), ' ')), 1, 1) = '0'
        |  THEN 1 ELSE 0 END AS flag FROM wx),
        |cx AS (SELECT doc_id, idx, word,
        |  coalesce(CAST(sum(flag) OVER (PARTITION BY doc_id ORDER BY idx
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0)
        |    AS chunk FROM fx),
        |ch AS (SELECT doc_id, chunk,
        |  md5(string_agg(word, ' ' ORDER BY idx)) AS h
        |  FROM cx GROUP BY doc_id, chunk),
        |rn AS (SELECT doc_id, chunk,
        |  row_number() OVER (PARTITION BY h ORDER BY doc_id, chunk) AS rn FROM ch)
        |SELECT doc_id, count(*) AS n_chunks,
        |  CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS kept_chunks,
        |  CAST(count(*) - sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS dropped_chunks
        |FROM rn GROUP BY doc_id ORDER BY doc_id LIMIT 100""".stripMargin) { (s, _) =>
      graft.operators.CorpusFilters.cdcChunkDedup(s.table("documents"))
        .orderBy("doc_id").limit(100)
    },

    // exact-substring dedup (Lee et al. 2021): every duplicated run of >= 8
    // words is cut, corpus-wide first occurrence kept; kept_digest is the
    // md5 of the surviving text — byte-exact check of WHICH words were cut
    df("dd_substring_dedup",
      """WITH raw AS (SELECT doc_id,
        |  list_filter(regexp_split_to_array(lower(text), '\s+'), w -> len(w) > 0) AS ws
        |  FROM documents),
        |base AS (SELECT doc_id, ws FROM raw WHERE len(ws) > 0),
        |wx AS (SELECT doc_id, ws, unnest(generate_series(1, len(ws) - 7)) AS pos
        |  FROM base WHERE len(ws) >= 8),
        |wins AS (SELECT doc_id, pos,
        |  md5(array_to_string(list_slice(ws, pos, pos + 7), ' ')) AS h FROM wx),
        |rn AS (SELECT doc_id, pos,
        |  row_number() OVER (PARTITION BY h ORDER BY doc_id, pos) AS rn,
        |  count(*) OVER (PARTITION BY h) AS cnt FROM wins),
        |cv AS (SELECT doc_id, pos, unnest(generate_series(0, 7)) AS d
        |  FROM rn WHERE cnt > 1 AND rn > 1),
        |cov AS (SELECT DISTINCT doc_id, pos + d AS idx FROM cv),
        |rm AS (SELECT doc_id, list(idx) AS rml FROM cov GROUP BY doc_id),
        |j AS (SELECT base.doc_id, ws, coalesce(rml, []) AS rml
        |  FROM base LEFT JOIN rm ON base.doc_id = rm.doc_id)
        |SELECT doc_id, CAST(len(ws) AS BIGINT) AS n_words,
        |  CAST(len(rml) AS BIGINT) AS removed_words,
        |  CAST(len(ws) - len(rml) AS BIGINT) AS kept_words,
        |  md5(coalesce(array_to_string(
        |    list_filter(ws, (w, i) -> NOT list_contains(rml, i)), ' '), ''))
        |    AS kept_digest
        |FROM j ORDER BY doc_id LIMIT 100""".stripMargin) { (s, _) =>
      Dedup.substringDedup(s.table("documents"))
        .orderBy("doc_id").limit(100)
    },

    // PII redaction over text with deterministic synthetic PII appended in
    // the query itself (the corpus is clean), so counts and the redacted
    // digest are non-degenerate on BOTH engines
    df("ta_redact_pii",
      """WITH d AS (SELECT doc_id,
        |  text || ' reach me: user' || CAST(doc_id AS VARCHAR)
        |    || '@example.com or 10.0.' || CAST(doc_id % 256 AS VARCHAR)
        |    || '.7 tel +4915112345678' AS text
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(text,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
        |  CAST(len(regexp_extract_all(text,
        |    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS BIGINT) AS n_ips,
        |  CAST(len(regexp_extract_all(
        |    regexp_replace(regexp_replace(text,
        |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |      '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
        |    '\+?\d{9,15}')) AS BIGINT) AS n_phones,
        |  md5(regexp_replace(regexp_replace(regexp_replace(text,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
        |    '\+?\d{9,15}', '<PHONE>', 'g')) AS redacted_digest
        |FROM d ORDER BY doc_id LIMIT 100""".stripMargin) { (s, _) =>
      graft.operators.CorpusFilters.redactPii(
        s.table("documents").withColumn("text",
          concat(col("text"), lit(" reach me: user"), col("doc_id").cast("string"),
            lit("@example.com or 10.0."), (col("doc_id") % 256).cast("string"),
            lit(".7 tel +4915112345678"))))
        .orderBy("doc_id").limit(100)
    },

    // card-number PII with the Luhn gate: the fixture plants one valid
    // PAN (4111…1111, spaces), one checksum-failing lookalike (…1112,
    // hyphens), and an 11-digit Luhn-valid string too short to be a PAN —
    // n_candidates counts the first two, n_valid_cards only the first,
    // and the digest proves ONLY the valid one was redacted
    df("ta_pii_cards",
      """WITH d AS (SELECT doc_id,
        |  text || ' pay 4111 1111 1111 1111 now or 4111-1111-1111-1112 ref 79927398713' AS text
        |  FROM documents),
        |c AS (SELECT doc_id, text,
        |  regexp_extract_all(text, '\b(?:\d[ -]?){12,18}\d\b') AS cands FROM d),
        |v AS (SELECT doc_id, text, cands,
        |  list_filter(cands, cc ->
        |    len(regexp_replace(cc, '[ -]', '', 'g')) BETWEEN 13 AND 19 AND
        |    list_sum(list_transform(
        |      generate_series(1, len(regexp_replace(cc, '[ -]', '', 'g'))),
        |      i -> CASE WHEN (len(regexp_replace(cc, '[ -]', '', 'g')) - i) % 2 = 1
        |        THEN CASE WHEN CAST(substring(regexp_replace(cc, '[ -]', '', 'g'), i, 1) AS INT) > 4
        |          THEN CAST(substring(regexp_replace(cc, '[ -]', '', 'g'), i, 1) AS INT) * 2 - 9
        |          ELSE CAST(substring(regexp_replace(cc, '[ -]', '', 'g'), i, 1) AS INT) * 2 END
        |        ELSE CAST(substring(regexp_replace(cc, '[ -]', '', 'g'), i, 1) AS INT) END))
        |      % 10 = 0) AS valid
        |  FROM c)
        |SELECT doc_id, CAST(len(cands) AS BIGINT) AS n_candidates,
        |  CAST(len(valid) AS BIGINT) AS n_valid_cards,
        |  md5(list_reduce(list_prepend(text, valid),
        |    (acc, x) -> replace(acc, x, '<CARD>'))) AS redacted_digest
        |FROM v ORDER BY doc_id LIMIT 100""".stripMargin) { (s, _) =>
      graft.operators.CorpusFilters.piiCards(
        s.table("documents").withColumn("text",
          concat(col("text"),
            lit(" pay 4111 1111 1111 1111 now or 4111-1111-1111-1112 ref 79927398713"))))
        .orderBy("doc_id").limit(100)
    },

    // per-source PII prevalence report: planted PII on coprime moduli
    // (emails %3, IPs %5, Luhn-valid cards %7, Luhn-FAILING phones %11 —
    // the phone deliberately fails the card checksum so no row
    // double-counts) -> per-source totals + prevalence rate, the report
    // that drives per-source scrub/drop policy
    df("ta_pii_prevalence",
      s"""WITH d AS (SELECT doc_id, source,
         |  text || CASE WHEN doc_id % 3 = 0 THEN ' mail u' || CAST(doc_id AS VARCHAR) || '@example.com' ELSE '' END
         |       || CASE WHEN doc_id % 5 = 0 THEN ' from 10.1.' || CAST(doc_id % 256 AS VARCHAR) || '.9' ELSE '' END
         |       || CASE WHEN doc_id % 7 = 0 THEN ' card 4111 1111 1111 1111' ELSE '' END
         |       || CASE WHEN doc_id % 11 = 0 THEN ' tel +4915112345670' ELSE '' END AS text
         |  FROM documents),
         |m AS (SELECT source,
         |  CAST(len(regexp_extract_all(text, '${CorpusFilters.EmailPattern}')) AS BIGINT) AS e,
         |  CAST(len(regexp_extract_all(text, '${CorpusFilters.Ipv4Pattern}')) AS BIGINT) AS i,
         |  CAST(len(regexp_extract_all(
         |    regexp_replace(regexp_replace(text,
         |      '${CorpusFilters.EmailPattern}', '<EMAIL>', 'g'),
         |      '${CorpusFilters.Ipv4Pattern}', '<IP>', 'g'),
         |    '${CorpusFilters.PhonePattern}')) AS BIGINT) AS p,
         |  CAST(len(list_filter(regexp_extract_all(text,
         |    '${CorpusFilters.CardPattern}'),
         |    cc -> ${DuckOracles.duckLuhnValid("cc")})) AS BIGINT) AS c
         |  FROM d)
         |SELECT source, CAST(count(*) AS BIGINT) AS docs,
         |  CAST(sum(CASE WHEN e + i + p + c > 0 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS docs_with_pii,
         |  CAST(sum(e) AS BIGINT) AS emails, CAST(sum(i) AS BIGINT) AS ips,
         |  CAST(sum(p) AS BIGINT) AS phones, CAST(sum(c) AS BIGINT) AS cards,
         |  round(CAST(sum(CASE WHEN e + i + p + c > 0 THEN 1 ELSE 0 END)
         |    AS DOUBLE) / count(*), 4) AS pii_rate
         |FROM m GROUP BY source ORDER BY source""".stripMargin) { (s, _) =>
      val id = col("doc_id")
      graft.operators.CorpusFilters.piiReport(
          s.table("documents").withColumn("text", concat(col("text"),
            when(id % 3 === 0, concat(lit(" mail u"), id.cast("string"),
              lit("@example.com"))).otherwise(lit("")),
            when(id % 5 === 0, concat(lit(" from 10.1."),
              (id % 256).cast("string"), lit(".9"))).otherwise(lit("")),
            when(id % 7 === 0, lit(" card 4111 1111 1111 1111"))
              .otherwise(lit("")),
            when(id % 11 === 0, lit(" tel +4915112345670"))
              .otherwise(lit("")))))
        .orderBy("source")
    },

    // C4-style content blocklist gate: token-anchored case-insensitive
    // matching over a config word/phrase list, keep = zero hits; the
    // fixture plants single-word and phrase hits on coprime moduli plus
    // a substring decoy ("scasino" — the leading s removes the left word
    // boundary, so the anchoring keeps it clean)
    df("ta_blocklist_filter",
      """WITH d AS (SELECT doc_id,
        |  text || CASE WHEN doc_id % 6 = 0 THEN ' win at CASINO BONUS now' ELSE '' END
        |       || CASE WHEN doc_id % 9 = 0 THEN ' buy viagra cheap' ELSE '' END
        |       || CASE WHEN doc_id % 7 = 0 THEN ' the scasino decoy stays clean' ELSE '' END AS text
        |  FROM documents),
        |m AS (SELECT doc_id,
        |  CAST(len(regexp_extract_all(lower(text),
        |    '\b(viagra|casino bonus|xxx)\b')) AS BIGINT) AS n_blocked
        |  FROM d)
        |SELECT doc_id, n_blocked, n_blocked <= 0 AS keep
        |FROM m ORDER BY doc_id LIMIT 100""".stripMargin) { (s, _) =>
      val id = col("doc_id")
      graft.operators.CorpusFilters.blocklistGate(
          s.table("documents").withColumn("text", concat(col("text"),
            when(id % 6 === 0, lit(" win at CASINO BONUS now")).otherwise(lit("")),
            when(id % 9 === 0, lit(" buy viagra cheap")).otherwise(lit("")),
            when(id % 7 === 0, lit(" the scasino decoy stays clean"))
              .otherwise(lit("")))),
          words = Seq("viagra", "casino bonus", "xxx"))
        .select("doc_id", "n_blocked", "keep")
        .orderBy("doc_id").limit(100)
    },

    // deterministic token-budget shard packing summary (per-group running
    // token count cut at 512-token boundaries; md5-ordered, reproducible)
    df("ta_pack_shards",
      """WITH base AS (SELECT doc_id,
        |  CAST(len(list_filter(regexp_split_to_array(text, '\s+'),
        |    w -> len(w) > 0)) AS BIGINT) AS toks,
        |  md5('p0' || CAST(doc_id AS VARCHAR)) AS h FROM documents),
        |g AS (SELECT doc_id, toks, h,
        |  CAST(CAST(list_sum(list_transform(generate_series(1, 8),
        |    i -> (strpos('0123456789abcdef', substring(h, i, 1)) - 1)
        |      * 16.0 ** (8 - i))) AS BIGINT) % 8 AS INT) AS grp FROM base),
        |c AS (SELECT grp, toks, CAST(sum(toks) OVER (PARTITION BY grp
        |  ORDER BY h, doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |  AS BIGINT) AS cum FROM g),
        |s AS (SELECT grp, toks,
        |  CAST(floor((cum - toks) / 512) AS BIGINT) AS shard FROM c)
        |SELECT grp, shard, count(*) AS docs, CAST(sum(toks) AS BIGINT) AS tokens
        |FROM s GROUP BY grp, shard ORDER BY grp, shard""".stripMargin) { (s, _) =>
      graft.operators.CorpusFilters.packShards(s.table("documents"))
        .groupBy("grp", "shard")
        .agg(count(lit(1)).as("docs"), sum(col("toks")).as("tokens"))
        .orderBy("grp", "shard")
    },

    // GPT-style sequence packing (concat-and-chunk): docs concatenate in
    // doc_id order and chunk into fixed 128-token training sequences;
    // a doc spans chunks when the boundary falls inside it. The Spark
    // side computes the prefix sum with the two-phase distributed scan
    // (per-partition offsets, window per partition id) — this oracle
    // pins that it equals the straight global cumsum
    df("ta_seq_pack",
      """WITH tk AS (SELECT doc_id,
        |  CAST(len(list_filter(regexp_split_to_array(lower(text), '\s+'),
        |    x -> len(x) > 0)) AS BIGINT) AS n_tokens
        |  FROM documents),
        |tk2 AS (SELECT doc_id, coalesce(n_tokens, 0) AS n_tokens FROM tk),
        |cs AS (SELECT doc_id, n_tokens,
        |  CAST(coalesce(sum(n_tokens) OVER (ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
        |    AS tok_start
        |  FROM tk2),
        |ck AS (SELECT doc_id, n_tokens, tok_start,
        |  CASE WHEN n_tokens > 0 THEN tok_start // 128 END AS first_chunk,
        |  CASE WHEN n_tokens > 0 THEN (tok_start + n_tokens - 1) // 128 END
        |    AS last_chunk
        |  FROM cs)
        |SELECT doc_id, n_tokens, tok_start, first_chunk, last_chunk,
        |  CAST(coalesce(last_chunk - first_chunk + 1, 0) AS BIGINT) AS n_chunks
        |FROM ck ORDER BY doc_id LIMIT 300""".stripMargin) { (s, _) =>
      graft.operators.CorpusFilters.seqPack(s.table("documents"), seqLen = 128)
        .orderBy("doc_id").limit(300)
    },

    // MATERIALIZED packed sequences — the inverse map a training loader
    // consumes: one row per (chunk_id, doc_id) with the doc's token
    // slice in that chunk, boundary docs split exactly at chunk edges.
    // DuckDB replays from the same global cumsum + a generate_series
    // explode; slices tile each chunk to exactly 128 tokens (tail
    // excepted — CorpusFiltersSpec pins that invariant corpus-wide)
    df("ta_seq_chunks",
      """WITH tk AS (SELECT doc_id,
        |  CAST(len(list_filter(regexp_split_to_array(lower(text), '\s+'),
        |    x -> len(x) > 0)) AS BIGINT) AS n_tokens
        |  FROM documents),
        |tk2 AS (SELECT doc_id, coalesce(n_tokens, 0) AS n_tokens FROM tk),
        |cs AS (SELECT doc_id, n_tokens,
        |  CAST(coalesce(sum(n_tokens) OVER (ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
        |    AS tok_start
        |  FROM tk2 ),
        |ck AS (SELECT doc_id, n_tokens, tok_start,
        |  tok_start // 128 AS first_chunk,
        |  (tok_start + n_tokens - 1) // 128 AS last_chunk
        |  FROM cs WHERE n_tokens > 0),
        |ex AS (SELECT doc_id, n_tokens, tok_start,
        |  unnest(generate_series(first_chunk, last_chunk)) AS chunk_id
        |  FROM ck),
        |sl AS (SELECT chunk_id, doc_id,
        |  CAST(greatest(0, tok_start - chunk_id * 128) AS BIGINT) AS chunk_off,
        |  CAST(greatest(0, chunk_id * 128 - tok_start) AS BIGINT) AS doc_slice_start,
        |  CAST(least(n_tokens, (chunk_id + 1) * 128 - tok_start)
        |    - greatest(0, chunk_id * 128 - tok_start) AS BIGINT) AS doc_slice_len
        |  FROM ex)
        |SELECT chunk_id, doc_id, chunk_off, doc_slice_start, doc_slice_len
        |FROM sl ORDER BY chunk_id, doc_id LIMIT 500""".stripMargin) { (s, _) =>
      graft.operators.CorpusFilters.seqChunks(s.table("documents"), seqLen = 128)
        .orderBy("chunk_id", "doc_id").limit(500)
    },

    // SemDeDup (Abbas et al. 2023): trained-IVF clustering bounds the
    // pairwise cosine pass per cell; a vector with an earlier cluster-mate
    // at round(cos,4) >= 0.3 is a semantic duplicate. The oracle recomputes
    // the full train→assign→within-cell-pairs chain
    df("dd_semdedup",
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |cn AS (SELECT p, c, sqrt(list_sum(list_transform(generate_series(1, 64), i -> c[i] * c[i]))) AS nc
        |  FROM (SELECT p, list_transform(generate_series(1, 64),
        |    d -> (strpos('0123456789abcdef', substring(md5(concat(p + 1000, '_', d - 1)), 1, 1)) - 8.5)) AS c
        |  FROM generate_series(0, 7) t(p)) x),
        |s0 AS (SELECT vec_id,
        |  list(list_sum(list_transform(generate_series(1, 64), i -> v[i] * c[i])) / nc ORDER BY p) AS scores
        |  FROM e CROSS JOIN cn WHERE vec_id % 5 = 0 GROUP BY vec_id),
        |c0 AS (SELECT vec_id, list_position(scores, list_aggregate(scores, 'max')) - 1 AS cell FROM s0),
        |tr AS (SELECT cell, d, round(avg(v[d]), 4) AS cd
        |  FROM c0 JOIN e USING (vec_id) CROSS JOIN generate_series(1, 64) t(d)
        |  GROUP BY cell, d),
        |tl AS (SELECT cell, list(cd ORDER BY d) AS c FROM tr GROUP BY cell),
        |tc AS (SELECT cn.p, coalesce(tl.c, cn.c) AS c,
        |  sqrt(list_sum(list_transform(generate_series(1, 64),
        |    i -> coalesce(tl.c, cn.c)[i] * coalesce(tl.c, cn.c)[i]))) AS nc
        |  FROM cn LEFT JOIN tl ON tl.cell = cn.p),
        |scored AS (SELECT vec_id,
        |  list(list_sum(list_transform(generate_series(1, 64), i -> v[i] * c[i])) / nc ORDER BY p) AS scores
        |  FROM e CROSS JOIN tc GROUP BY vec_id),
        |cells AS (SELECT s.vec_id, e.v,
        |  list_position(s.scores, list_aggregate(s.scores, 'max')) - 1 AS cell
        |  FROM scored s JOIN e ON e.vec_id = s.vec_id),
        |dup AS (SELECT DISTINCT b.vec_id AS id
        |  FROM cells a JOIN cells b ON a.cell = b.cell AND a.vec_id < b.vec_id
        |  WHERE round(
        |    list_sum(list_transform(generate_series(1, 64), i -> a.v[i] * b.v[i])) /
        |    (sqrt(list_sum(list_transform(generate_series(1, 64), i -> a.v[i] * a.v[i]))) *
        |     sqrt(list_sum(list_transform(generate_series(1, 64), i -> b.v[i] * b.v[i])))), 4) >= 0.3)
        |SELECT c.vec_id, c.cell, (d.id IS NOT NULL) AS dropped
        |FROM cells c LEFT JOIN dup d ON d.id = c.vec_id
        |ORDER BY c.vec_id LIMIT 200""".stripMargin) { (s, _) =>
      Similarity.semDedup(s.table("embeddings"), centroids = 8, dims = 64,
          threshold = 0.3)
        .orderBy("vec_id").limit(200)
    },

    // SemDeDup at the PAPER's cell budget: k = max(8, ceil(n/250)) — the
    // k ~ n/target_cell_size rule that keeps the within-cell pairwise
    // stage O(n * cell) instead of O(n^2/k) as the corpus grows. This
    // entry exists so the k-scaling contract is CONTINUOUSLY measured
    // (bench + SCALE.md sf1 point), not just argued in prose; both sides
    // compute k from the data, so the same entry is oracle-exact at any
    // scale (DuckDB: scalar generate_series accepts the subquery-derived
    // bound table functions reject)
    df("dd_semdedup_scaled",
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |kk AS (SELECT CAST(greatest(8, ceil(count(*) / 250.0)) AS INT) AS k FROM embeddings),
        |ps AS (SELECT unnest(generate_series(0, k - 1)) AS p FROM kk),
        |cn AS (SELECT p, c, sqrt(list_sum(list_transform(generate_series(1, 64), i -> c[i] * c[i]))) AS nc
        |  FROM (SELECT p, list_transform(generate_series(1, 64),
        |    d -> (strpos('0123456789abcdef', substring(md5(concat(p + 1000, '_', d - 1)), 1, 1)) - 8.5)) AS c
        |  FROM ps) x),
        |s0 AS (SELECT vec_id,
        |  list(list_sum(list_transform(generate_series(1, 64), i -> v[i] * c[i])) / nc ORDER BY p) AS scores
        |  FROM e CROSS JOIN cn WHERE vec_id % 5 = 0 GROUP BY vec_id),
        |c0 AS (SELECT vec_id, list_position(scores, list_aggregate(scores, 'max')) - 1 AS cell FROM s0),
        |tr AS (SELECT cell, d, round(avg(v[d]), 4) AS cd
        |  FROM c0 JOIN e USING (vec_id) CROSS JOIN generate_series(1, 64) t(d)
        |  GROUP BY cell, d),
        |tl AS (SELECT cell, list(cd ORDER BY d) AS c FROM tr GROUP BY cell),
        |tc AS (SELECT cn.p, coalesce(tl.c, cn.c) AS c,
        |  sqrt(list_sum(list_transform(generate_series(1, 64),
        |    i -> coalesce(tl.c, cn.c)[i] * coalesce(tl.c, cn.c)[i]))) AS nc
        |  FROM cn LEFT JOIN tl ON tl.cell = cn.p),
        |scored AS (SELECT vec_id,
        |  list(list_sum(list_transform(generate_series(1, 64), i -> v[i] * c[i])) / nc ORDER BY p) AS scores
        |  FROM e CROSS JOIN tc GROUP BY vec_id),
        |cells AS (SELECT s.vec_id, e.v,
        |  list_position(s.scores, list_aggregate(s.scores, 'max')) - 1 AS cell
        |  FROM scored s JOIN e ON e.vec_id = s.vec_id),
        |dup AS (SELECT DISTINCT b.vec_id AS id
        |  FROM cells a JOIN cells b ON a.cell = b.cell AND a.vec_id < b.vec_id
        |  WHERE round(
        |    list_sum(list_transform(generate_series(1, 64), i -> a.v[i] * b.v[i])) /
        |    (sqrt(list_sum(list_transform(generate_series(1, 64), i -> a.v[i] * a.v[i]))) *
        |     sqrt(list_sum(list_transform(generate_series(1, 64), i -> b.v[i] * b.v[i])))), 4) >= 0.3)
        |SELECT c.vec_id, c.cell, (d.id IS NOT NULL) AS dropped
        |FROM cells c LEFT JOIN dup d ON d.id = c.vec_id
        |ORDER BY c.vec_id LIMIT 200""".stripMargin) { (s, _) =>
      val emb = s.table("embeddings")
      val k = math.max(8, math.ceil(emb.count() / 250.0).toInt)
      Similarity.semDedup(emb, centroids = k, dims = 64, threshold = 0.3)
        .orderBy("vec_id").limit(200)
    },

    // D4 (Tirumala et al. 2023): SemDeDup survivors ranked by cosine to
    // their cell's survivor-centroid; the most prototypical 25% of each
    // cell is dropped on top of the near-dup drops. The oracle extends the
    // dd_semdedup chain with the centroid/rank stage
    df("dd_d4_prune",
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |cn AS (SELECT p, c, sqrt(list_sum(list_transform(generate_series(1, 64), i -> c[i] * c[i]))) AS nc
        |  FROM (SELECT p, list_transform(generate_series(1, 64),
        |    d -> (strpos('0123456789abcdef', substring(md5(concat(p + 1000, '_', d - 1)), 1, 1)) - 8.5)) AS c
        |  FROM generate_series(0, 7) t(p)) x),
        |s0 AS (SELECT vec_id,
        |  list(list_sum(list_transform(generate_series(1, 64), i -> v[i] * c[i])) / nc ORDER BY p) AS scores
        |  FROM e CROSS JOIN cn WHERE vec_id % 5 = 0 GROUP BY vec_id),
        |c0 AS (SELECT vec_id, list_position(scores, list_aggregate(scores, 'max')) - 1 AS cell FROM s0),
        |tr AS (SELECT cell, d, round(avg(v[d]), 4) AS cd
        |  FROM c0 JOIN e USING (vec_id) CROSS JOIN generate_series(1, 64) t(d)
        |  GROUP BY cell, d),
        |tl AS (SELECT cell, list(cd ORDER BY d) AS c FROM tr GROUP BY cell),
        |tc AS (SELECT cn.p, coalesce(tl.c, cn.c) AS c,
        |  sqrt(list_sum(list_transform(generate_series(1, 64),
        |    i -> coalesce(tl.c, cn.c)[i] * coalesce(tl.c, cn.c)[i]))) AS nc
        |  FROM cn LEFT JOIN tl ON tl.cell = cn.p),
        |scored AS (SELECT vec_id,
        |  list(list_sum(list_transform(generate_series(1, 64), i -> v[i] * c[i])) / nc ORDER BY p) AS scores
        |  FROM e CROSS JOIN tc GROUP BY vec_id),
        |cells AS (SELECT s.vec_id, e.v,
        |  list_position(s.scores, list_aggregate(s.scores, 'max')) - 1 AS cell
        |  FROM scored s JOIN e ON e.vec_id = s.vec_id),
        |dup AS (SELECT DISTINCT b.vec_id AS id
        |  FROM cells a JOIN cells b ON a.cell = b.cell AND a.vec_id < b.vec_id
        |  WHERE round(
        |    list_sum(list_transform(generate_series(1, 64), i -> a.v[i] * b.v[i])) /
        |    (sqrt(list_sum(list_transform(generate_series(1, 64), i -> a.v[i] * a.v[i]))) *
        |     sqrt(list_sum(list_transform(generate_series(1, 64), i -> b.v[i] * b.v[i])))), 4) >= 0.3),
        |keep AS (SELECT c.vec_id, c.cell, c.v FROM cells c
        |  LEFT JOIN dup d ON d.id = c.vec_id WHERE d.id IS NULL),
        |kc AS (SELECT cell, dd, round(avg(v[dd]), 4) AS cd
        |  FROM keep CROSS JOIN generate_series(1, 64) t(dd) GROUP BY cell, dd),
        |kl AS (SELECT cell, list(cd ORDER BY dd) AS cent FROM kc GROUP BY cell),
        |sc AS (SELECT k.vec_id, k.cell,
        |  round(list_sum(list_transform(generate_series(1, 64), i -> k.v[i] * cent[i])) /
        |    (sqrt(list_sum(list_transform(generate_series(1, 64), i -> k.v[i] * k.v[i]))) *
        |     sqrt(list_sum(list_transform(generate_series(1, 64), i -> cent[i] * cent[i])))), 4) AS proto_sim
        |  FROM keep k JOIN kl USING (cell)),
        |rk AS (SELECT vec_id, cell, proto_sim,
        |  CAST(row_number() OVER (PARTITION BY cell ORDER BY proto_sim DESC, vec_id) AS INT) AS rnk,
        |  count(*) OVER (PARTITION BY cell) AS cnt FROM sc)
        |SELECT c.vec_id, c.cell, rk.proto_sim,
        |  CASE WHEN d.id IS NOT NULL THEN 'dup'
        |       WHEN rk.rnk <= CAST(floor(0.25 * rk.cnt) AS INT) THEN 'proto'
        |       ELSE 'kept' END AS verdict
        |FROM cells c LEFT JOIN dup d ON d.id = c.vec_id
        |LEFT JOIN rk ON rk.vec_id = c.vec_id
        |ORDER BY c.vec_id LIMIT 200""".stripMargin) { (s, _) =>
      Similarity.d4Prune(s.table("embeddings"), centroids = 8, dims = 64,
          threshold = 0.3, dropFrac = 0.25)
        .orderBy("vec_id").limit(200)
    },

    // line-level corpus dedup (CCNet/RefinedWeb boilerplate strip): a
    // trimmed line in >= 2 distinct docs is removed from ALL docs (unlike
    // chunk dedup's keep-first); kept_digest proves WHICH lines survive.
    // The corpus is single-line, so the query itself appends deterministic
    // boilerplate (one line shared by all docs, one by even docs) plus a
    // unique ref line — same synthetic-fixture trick as ta_redact_pii
    df("dd_line_dedup",
      """WITH d AS (SELECT doc_id,
        |  text || chr(10) || 'subscribe to our newsletter today' || chr(10)
        |    || CASE WHEN doc_id % 2 = 0
        |         THEN 'all rights reserved' || chr(10) ELSE '' END
        |    || 'ref ' || CAST(doc_id AS VARCHAR) AS text
        |  FROM documents),
        |raw AS (SELECT doc_id,
        |  list_transform(regexp_split_to_array(text, '\n'), l -> trim(l)) AS ls
        |  FROM d),
        |lx AS (SELECT doc_id, unnest(ls) AS line,
        |  generate_subscripts(ls, 1) AS pos FROM raw),
        |nz AS (SELECT doc_id, pos, line, md5(line) AS h FROM lx
        |  WHERE len(line) > 0),
        |fq AS (SELECT h, count(DISTINCT doc_id) AS dcnt FROM nz GROUP BY h),
        |fl AS (SELECT nz.doc_id, nz.pos, nz.line, fq.dcnt >= 2 AS removed
        |  FROM nz JOIN fq USING (h))
        |SELECT doc_id, count(*) AS n_lines,
        |  CAST(sum(CASE WHEN removed THEN 1 ELSE 0 END) AS BIGINT) AS removed_lines,
        |  CAST(sum(CASE WHEN NOT removed THEN 1 ELSE 0 END) AS BIGINT) AS kept_lines,
        |  md5(coalesce(string_agg(CASE WHEN NOT removed THEN line END,
        |    chr(10) ORDER BY pos), '')) AS kept_digest
        |FROM fl GROUP BY doc_id ORDER BY doc_id LIMIT 100""".stripMargin) { (s, _) =>
      graft.operators.CorpusFilters.lineDedup(
          s.table("documents").withColumn("text",
            concat(col("text"), lit("\nsubscribe to our newsletter today\n"),
              when(col("doc_id") % 2 === 0, lit("all rights reserved\n"))
                .otherwise(lit("")),
              lit("ref "), col("doc_id").cast("string"))))
        .orderBy("doc_id").limit(100)
    },

    // intra-document repetition removal: a line repeated WITHIN one doc
    // keeps only its first occurrence (map-only — no other doc consulted;
    // contrast dd_line_dedup's corpus-frequency rule). The corpus is
    // single-line, so the query plants a line that repeats inside each doc
    df("dd_intradoc_dedup",
      """WITH d AS (SELECT doc_id, text || chr(10)
        |  || 'repeated boilerplate line' || chr(10)
        |  || 'unique line ' || CAST(doc_id AS VARCHAR) || chr(10)
        |  || 'repeated boilerplate line' AS text FROM documents),
        |t AS (SELECT doc_id, list_filter(list_transform(
        |  string_split(text, chr(10)), x -> trim(x)), x -> len(x) > 0) AS tl
        |  FROM d),
        |k AS (SELECT doc_id, CAST(len(tl) AS BIGINT) AS n_lines,
        |  list_filter(tl, (x, i) -> list_position(tl, x) = i) AS kept FROM t)
        |SELECT doc_id, n_lines, CAST(len(kept) AS BIGINT) AS kept_lines,
        |  md5(array_to_string(kept, chr(10))) AS kept_digest
        |FROM k ORDER BY doc_id LIMIT 100""".stripMargin) { (s, _) =>
      CorpusFilters.intraDocDedup(
          s.table("documents").withColumn("text",
            concat(col("text"), lit("\nrepeated boilerplate line\nunique line "),
              col("doc_id").cast("string"),
              lit("\nrepeated boilerplate line"))))
        .orderBy("doc_id").limit(100)
    },

    // bigram-LM surprisal (KenLM-style): -ln((c(prev,cur)+1)/(c(prev)+V))
    // averaged per doc — word-order-aware fluency the unigram LM can't see
    df("ta_bigram_surprisal",
      """WITH toks AS (SELECT doc_id, list_filter(
        |  regexp_split_to_array(lower(text), '\s+'), x -> len(x) > 0) AS w
        |  FROM documents),
        |bg AS (SELECT doc_id, unnest(w[1:len(w)-1]) AS prev,
        |  unnest(w[2:len(w)]) AS cur FROM toks WHERE len(w) >= 2),
        |bf AS (SELECT prev, cur, count(*) AS cb FROM bg GROUP BY prev, cur),
        |uf AS (SELECT t AS term, count(*) AS cu FROM (
        |  SELECT unnest(w) AS t FROM toks) x GROUP BY t),
        |vv AS (SELECT CAST(count(*) AS DOUBLE) AS vocab FROM uf),
        |n AS (SELECT doc_id, -ln((cb + 1) / (cu + vocab)) AS nll
        |  FROM bg JOIN bf USING (prev, cur)
        |  JOIN uf ON uf.term = bg.prev CROSS JOIN vv)
        |SELECT doc_id, count(*) AS n_bigrams, round(avg(nll), 4) AS surprisal
        |FROM n GROUP BY doc_id ORDER BY doc_id LIMIT 100""".stripMargin) { (s, _) =>
      TextAnalysis.bigramSurprisal(s.table("documents"))
        .orderBy("doc_id").limit(100)
    },

    // BPE vocabulary induction (Sennrich et al. 2016): 3 merge rounds over
    // the word-frequency table; greedy merge application is one global
    // regexp_replace on delimiter-encoded symbols — left-to-right
    // non-overlapping in both Java regex and RE2, so the learned merge
    // table is bit-identical across engines
    // character-level Shannon entropy per doc: the gibberish/blob signal
    // (prose sits ~2.6-2.9 nats); both engines fold the <=26-entry count
    // list in sorted char order, so the double sum is order-identical
    df("ta_char_entropy",
      """WITH ch AS (SELECT doc_id,
        |  unnest(regexp_extract_all(lower(text), '[a-z]')) AS c
        |  FROM documents),
        |cnt AS (SELECT doc_id, c, count(*) AS k FROM ch GROUP BY doc_id, c),
        |l AS (SELECT doc_id, CAST(sum(k) AS BIGINT) AS n_chars,
        |  list(k ORDER BY c) AS ks FROM cnt GROUP BY doc_id)
        |SELECT doc_id, n_chars,
        |  round(list_sum(list_transform(ks,
        |    k -> -(k / CAST(n_chars AS DOUBLE))
        |       * ln(k / CAST(n_chars AS DOUBLE)))), 6) AS entropy
        |FROM l ORDER BY doc_id LIMIT 100""".stripMargin) { (s, _) =>
      TextAnalysis.charEntropy(s.table("documents"))
        .orderBy("doc_id").limit(100)
    },

    // unigram-LM seed table (Kudo 2018): the most frequent substrings of
    // length <= 3 across the word-frequency table — the trainer's one
    // distributed pass beyond word counts, oracle-exact (the driver-side
    // EM derives its seed with the identical rule, spec-pinned equal)
    df("ta_unigram_seed",
      """WITH wf AS (SELECT w AS word, count(*) AS wc FROM (
        |  SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w
        |  FROM documents) x GROUP BY w),
        |mx AS (SELECT max(len(word)) AS ml FROM wf),
        |st AS (SELECT unnest(generate_series(1, (SELECT ml FROM mx))) AS s),
        |ln AS (SELECT unnest(generate_series(1, 3)) AS l),
        |p AS (SELECT substring(word, s, l) AS piece,
        |  CAST(sum(wc) AS BIGINT) AS cnt
        |  FROM wf, st, ln
        |  WHERE s <= len(word) AND s + l - 1 <= len(word)
        |  GROUP BY piece)
        |SELECT piece, cnt FROM p
        |ORDER BY cnt DESC, piece LIMIT 50""".stripMargin) { (s, _) =>
      TextAnalysis.unigramSeed(s.table("documents"), maxPieceLen = 3)
        .orderBy(col("cnt").desc, col("piece")).limit(50)
    },

    // unigram-LM tokenizer training (SentencePiece's second model beside
    // BPE): EM over the distinct-word frame with integer micro-nat Viterbi
    // — driver-side by the bpeMerges contract, so the learned vocabulary
    // is engine-specific -> rows-only; the EM golden, the coverage
    // invariant, and seed ≡ ta_unigram_seed are CorpusFiltersSpec-pinned
    noOracle("ta_unigram_vocab") { (s, _) =>
      TextAnalysis.unigramVocab(s.table("documents"), vocabSize = 64)
        .orderBy(col("cnt").desc, col("piece"))
    },

    // ONE unigram EM round, oracle-checked cross-engine (the full trainer
    // is rows-only because multi-round EM isn't SQL-replayable — but one
    // round at maxPieceLen=2 IS: the oracle enumerates EVERY legal
    // segmentation of each distinct word as a breakpoint bitmask, scores
    // it under the seed's integer micro-nat costs, and picks the minimum
    // with the DP's exact tie rule — among equal costs the segmentation
    // whose piece-length sequence read from the END is lexicographically
    // largest, which is precisely Viterbi's prefer-longer-final-piece
    // backpointer choice. Usage counts, char floor, prune, and scores
    // then replay the trainer's M-step arithmetic 1:1.
    // word length capped at 12 on BOTH sides (Spark trains on the corpus
    // rebuilt from its <= 12-char tokens; the oracle filters the word
    // frame identically): the oracle enumerates 2^(len-1) masks per
    // distinct word, so one long token in a regenerated fixture must
    // bound the job at 2^11 masks, never 2^39
    df("ta_unigram_em1",
      """WITH wf AS (SELECT w AS word, count(*) AS wc FROM (
        |  SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w
        |  FROM documents) x WHERE len(w) <= 12 GROUP BY w),
        |mx AS (SELECT max(len(word)) AS ml FROM wf),
        |st AS (SELECT unnest(generate_series(1, (SELECT ml FROM mx))) AS s),
        |ln2 AS (SELECT unnest(generate_series(1, 2)) AS l),
        |sd AS (SELECT substring(word, s, l) AS piece,
        |  CAST(sum(wc) AS BIGINT) AS cnt
        |  FROM wf, st, ln2
        |  WHERE s <= len(word) AND s + l - 1 <= len(word)
        |  GROUP BY piece),
        |topseed AS (SELECT piece, cnt FROM sd
        |  QUALIFY row_number() OVER (ORDER BY cnt DESC, piece) <= 48),
        |px AS (SELECT piece, cnt FROM topseed WHERE len(piece) > 1
        |  UNION ALL SELECT piece, greatest(cnt, CAST(1 AS BIGINT)) FROM sd
        |  WHERE len(piece) = 1),
        |ct AS (SELECT CAST(sum(cnt) AS DOUBLE) AS total FROM px),
        |cost AS (SELECT piece,
        |  CAST(round(-ln(cnt / (SELECT total FROM ct)) * 1000000) AS BIGINT) AS c
        |  FROM px),
        |mk AS (SELECT word, wc,
        |  unnest(generate_series(0, CAST(pow(2, len(word) - 1) AS BIGINT) - 1)) AS mask
        |  FROM wf),
        |bx AS (SELECT word, wc, mask,
        |  list_concat(list_concat([CAST(0 AS BIGINT)],
        |    list_filter(generate_series(1, len(word) - 1),
        |      i -> ((mask >> (i - 1)) & 1) = 1)),
        |    [CAST(len(word) AS BIGINT)]) AS bounds
        |  FROM mk),
        |sg AS (SELECT word, wc, mask,
        |  list_transform(generate_series(1, len(bounds) - 1),
        |    j -> substring(word, CAST(bounds[j] + 1 AS INT),
        |      CAST(bounds[j+1] - bounds[j] AS INT))) AS pieces,
        |  list_reverse(list_transform(generate_series(1, len(bounds) - 1),
        |    j -> bounds[j+1] - bounds[j])) AS rl
        |  FROM bx
        |  WHERE len(list_filter(generate_series(1, len(bounds) - 1),
        |    j -> bounds[j+1] - bounds[j] > 2)) = 0),
        |pe AS (SELECT word, wc, mask, rl, pieces, unnest(pieces) AS piece FROM sg),
        |sc AS (SELECT word, wc, mask, rl, pieces, sum(c) AS total,
        |  count(*) FILTER (WHERE c IS NULL) AS missing
        |  FROM pe LEFT JOIN cost USING (piece)
        |  GROUP BY word, wc, mask, rl, pieces),
        |ch AS (SELECT word, wc, pieces FROM sc WHERE missing = 0
        |  QUALIFY row_number() OVER (PARTITION BY word
        |    ORDER BY total ASC, rl DESC) = 1),
        |use1 AS (SELECT piece, CAST(sum(wc) AS BIGINT) AS cnt
        |  FROM (SELECT wc, unnest(pieces) AS piece FROM ch) u GROUP BY piece),
        |after1 AS (SELECT piece, cnt FROM use1
        |  UNION ALL SELECT piece, CAST(1 AS BIGINT) FROM sd
        |  WHERE len(piece) = 1 AND piece NOT IN (SELECT piece FROM use1)),
        |nch AS (SELECT count(*) AS n FROM sd WHERE len(piece) = 1),
        |nonch AS (SELECT piece, cnt FROM after1 WHERE len(piece) > 1
        |  QUALIFY row_number() OVER (ORDER BY cnt DESC, piece)
        |    <= greatest(32 - (SELECT n FROM nch), 0)),
        |kept AS (SELECT piece, cnt FROM nonch
        |  UNION ALL SELECT piece, cnt FROM after1 WHERE len(piece) = 1),
        |kt AS (SELECT CAST(sum(cnt) AS DOUBLE) AS total FROM kept)
        |SELECT piece, cnt, round(ln(cnt / (SELECT total FROM kt)), 6) AS score
        |FROM kept ORDER BY cnt DESC, piece""".stripMargin) { (s, _) =>
      // rebuild the corpus from its <= 12-char tokens: tokenizing the
      // rebuilt text yields exactly the oracle's len-capped word frame
      val capped = s.table("documents").select(concat_ws(" ",
        filter(expr("regexp_extract_all(lower(text), '[a-z]+', 0)"),
          w => length(w) <= 12)).as("text"))
      TextAnalysis.unigramVocab(capped, vocabSize = 32,
          maxPieceLen = 2, emIters = 1, seedSize = 48)
        .orderBy(col("cnt").desc, col("piece"))
    },

    // unigram tokenization of the corpus under the trained vocabulary
    // (train-then-apply, the ta_bpe_encode twin); rows-only — the token
    // digests depend on the driver-trained vocab; round-trip and
    // determinism are spec-pinned
    noOracle("ta_unigram_encode") { (s, _) =>
      val docs = s.table("documents")
      TextAnalysis.unigramEncode(docs,
          TextAnalysis.unigramVocab(docs, vocabSize = 64))
        .orderBy("doc_id").limit(100)
    },

    // tokenizer bake-off: BPE (3 merges) vs unigram-LM (64 pieces)
    // fertility per language — the report that decides which tokenizer a
    // pipeline commits to
    noOracle("ta_tokenizer_compare") { (s, _) =>
      val docs = s.table("documents")
      TextAnalysis.tokenizerCompare(docs,
          TextAnalysis.bpeMerges(docs, merges = 3),
          TextAnalysis.unigramVocab(docs, vocabSize = 64))
        .orderBy("lang")
    },

    // WordPiece vocabulary (the third tokenizer family, BERT's): top-256
    // substrings by the seed frequency rule + every corpus character —
    // unlike BPE/unigram TRAINING, this vocab is fully SQL-replayable
    df("ta_wordpiece_vocab",
      s"""WITH $duckWpVocab
         |SELECT piece, cnt FROM wpv ORDER BY cnt DESC, piece""".stripMargin) {
      (s, _) =>
      TextAnalysis.wordpieceVocab(s.table("documents"),
          vocabSize = 256, maxPieceLen = 4)
        .orderBy(col("cnt").desc, col("piece"))
    },

    // WordPiece encode: greedy longest-match-first with ## continuation
    // markers — the oracle replays the walk with a recursive CTE over a
    // per-(word,pos) best-piece table
    df("ta_wordpiece_encode",
      s"""WITH RECURSIVE $duckWpVocab,
         |$duckWpEncode
         |SELECT doc_id, CAST(sum(n) AS BIGINT) AS n_wp_tokens,
         |  CAST(sum(CASE WHEN unk THEN 1 ELSE 0 END) AS BIGINT) AS n_unk_words,
         |  md5(string_agg(ts, ' ' ORDER BY pos)) AS tok_digest
         |FROM wpj GROUP BY doc_id ORDER BY doc_id LIMIT 100""".stripMargin) {
      (s, _) =>
      val docs = s.table("documents")
      TextAnalysis.wordpieceEncode(docs,
          TextAnalysis.wordpieceVocab(docs, vocabSize = 256, maxPieceLen = 4))
        .orderBy("doc_id").limit(100)
    },

    // one LIKELIHOOD-scored WordPiece merge round: every adjacent symbol
    // pair over the char-split word-frequency table scores
    // freq(ab)/(freq(a)*freq(b)) — the published WordPiece criterion
    // (vs BPE's raw pair frequency); ranking uses the unrounded score
    // with the denominator product formed in doubles (identical IEEE
    // values both engines; a long product overflows at corpus scale)
    df("ta_wordpiece_merge1",
      """WITH wf AS (SELECT w AS word, count(*) AS wc FROM (
        |  SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w
        |  FROM documents) x GROUP BY w),
        |sy AS (SELECT unnest(list_transform(generate_series(1, len(word)),
        |    i -> word[i])) AS c, wc FROM wf),
        |sc AS (SELECT c, CAST(sum(wc) AS BIGINT) AS scnt FROM sy GROUP BY c),
        |pr AS (SELECT unnest(list_transform(generate_series(1, len(word) - 1),
        |    i -> word[i])) AS pa,
        |  unnest(list_transform(generate_series(1, len(word) - 1),
        |    i -> word[i + 1])) AS pb, wc
        |  FROM wf WHERE len(word) >= 2),
        |pc AS (SELECT pa, pb, CAST(sum(wc) AS BIGINT) AS pair_cnt
        |  FROM pr GROUP BY pa, pb),
        |sj AS (SELECT pc.pa, pc.pb, pc.pair_cnt,
        |  a.scnt AS left_cnt, b.scnt AS right_cnt,
        |  pc.pair_cnt / (CAST(a.scnt AS DOUBLE) * b.scnt) AS sc0
        |  FROM pc JOIN sc a ON a.c = pc.pa JOIN sc b ON b.c = pc.pb),
        |rk AS (SELECT *, CAST(row_number() OVER (
        |  ORDER BY sc0 DESC, pa, pb) AS BIGINT) AS rnk FROM sj)
        |SELECT rnk, pa AS left_sym, pb AS right_sym, pair_cnt,
        |  left_cnt, right_cnt, round(sc0 * 1e9, 6) AS score_e9
        |FROM rk WHERE rnk <= 10 ORDER BY rnk""".stripMargin) { (s, _) =>
      TextAnalysis.wordpieceMergeScores(s.table("documents"), topK = 10)
        .orderBy("rnk")
    },

    // the ITERATED WordPiece trainer: two likelihood-scored merge rounds
    // — round 2 re-scores over the symbol sequences with round 1's
    // winner merged everywhere (left-to-right non-overlapping, the BPE
    // application rule), pinning that the loop updates BOTH the pair
    // numerator and the symbol-count denominators
    df("ta_wordpiece_merge2",
      """WITH wf AS (SELECT w AS word, count(*) AS wc FROM (
        |  SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w
        |  FROM documents) x GROUP BY w),
        |e0 AS (SELECT word, wc,
        |  '|' || array_to_string(list_transform(generate_series(1, len(word)),
        |    i -> word[i]), '| |') || '|' AS enc FROM wf),
        |s1 AS (SELECT word, wc, regexp_extract_all(enc, '\|([a-z]+)\|', 1) AS syms FROM e0),
        |y1 AS (SELECT unnest(syms) AS c, wc FROM s1),
        |sc1 AS (SELECT c, CAST(sum(wc) AS BIGINT) AS scnt FROM y1 GROUP BY c),
        |p1 AS (SELECT unnest(syms[1:len(syms)-1]) AS pa, unnest(syms[2:len(syms)]) AS pb, wc
        |  FROM s1 WHERE len(syms) >= 2),
        |c1 AS (SELECT pa, pb, CAST(sum(wc) AS BIGINT) AS pcnt FROM p1 GROUP BY pa, pb),
        |j1 AS (SELECT c1.pa, c1.pb, c1.pcnt, a.scnt AS la, b.scnt AS lb,
        |  c1.pcnt / (CAST(a.scnt AS DOUBLE) * b.scnt) AS sc0
        |  FROM c1 JOIN sc1 a ON a.c = c1.pa JOIN sc1 b ON b.c = c1.pb),
        |b1 AS (SELECT * FROM j1 ORDER BY sc0 DESC, pa, pb LIMIT 1),
        |e1 AS (SELECT word, wc, regexp_replace(enc,
        |  '\|' || b1.pa || '\| \|' || b1.pb || '\|', '|' || b1.pa || b1.pb || '|', 'g') AS enc
        |  FROM e0 CROSS JOIN b1),
        |s2 AS (SELECT word, wc, regexp_extract_all(enc, '\|([a-z]+)\|', 1) AS syms FROM e1),
        |y2 AS (SELECT unnest(syms) AS c, wc FROM s2),
        |sc2 AS (SELECT c, CAST(sum(wc) AS BIGINT) AS scnt FROM y2 GROUP BY c),
        |p2 AS (SELECT unnest(syms[1:len(syms)-1]) AS pa, unnest(syms[2:len(syms)]) AS pb, wc
        |  FROM s2 WHERE len(syms) >= 2),
        |c2 AS (SELECT pa, pb, CAST(sum(wc) AS BIGINT) AS pcnt FROM p2 GROUP BY pa, pb),
        |j2 AS (SELECT c2.pa, c2.pb, c2.pcnt, a.scnt AS la, b.scnt AS lb,
        |  c2.pcnt / (CAST(a.scnt AS DOUBLE) * b.scnt) AS sc0
        |  FROM c2 JOIN sc2 a ON a.c = c2.pa JOIN sc2 b ON b.c = c2.pb),
        |b2 AS (SELECT * FROM j2 ORDER BY sc0 DESC, pa, pb LIMIT 1)
        |SELECT 1 AS round, pa AS left_sym, pb AS right_sym, pcnt AS pair_cnt,
        |  la AS left_cnt, lb AS right_cnt, round(sc0 * 1e9, 6) AS score_e9 FROM b1
        |UNION ALL SELECT 2, pa, pb, pcnt, la, lb, round(sc0 * 1e9, 6) FROM b2
        |ORDER BY round""".stripMargin) { (s, _) =>
      TextAnalysis.wordpieceMerges(s.table("documents"), merges = 2)
        .orderBy("round")
    },

    // WordPiece fertility + UNK rate per language — the signal BPE can't
    // report (how often a word falls out of the vocabulary entirely)
    df("ta_wordpiece_fertility",
      s"""WITH RECURSIVE $duckWpVocab,
         |$duckWpEncode,
         |wpd AS (SELECT doc_id, CAST(sum(n) AS BIGINT) AS t,
         |  CAST(sum(CASE WHEN unk THEN 1 ELSE 0 END) AS BIGINT) AS u
         |  FROM wpj GROUP BY doc_id),
         |wpb AS (SELECT doc_id, lang,
         |  CAST(len(regexp_extract_all(lower(text), '[a-z]+')) AS BIGINT)
         |    AS n_words
         |  FROM documents)
         |SELECT lang, CAST(sum(n_words) AS BIGINT) AS n_words,
         |  CAST(sum(coalesce(t, 0)) AS BIGINT) AS n_wp_tokens,
         |  round(CAST(sum(coalesce(t, 0)) AS DOUBLE)
         |    / greatest(sum(n_words), 1), 4) AS fertility,
         |  CAST(sum(coalesce(u, 0)) AS BIGINT) AS n_unk_words,
         |  round(CAST(sum(coalesce(u, 0)) AS DOUBLE)
         |    / greatest(sum(n_words), 1), 4) AS unk_rate
         |FROM wpb LEFT JOIN wpd USING (doc_id)
         |GROUP BY lang ORDER BY lang""".stripMargin) { (s, _) =>
      val docs = s.table("documents")
      TextAnalysis.wordpieceFertility(docs,
          TextAnalysis.wordpieceVocab(docs, vocabSize = 256, maxPieceLen = 4))
        .orderBy("lang")
    },

    // TextRank corpus keywords: PageRank over the word co-occurrence graph
    // (adjacent >=4-char words, top-500 heaviest undirected pairs) — the
    // same shared PageRank as the service centrality and host rank
    df("ta_textrank",
      s"""WITH tw AS (SELECT list_filter(
         |    regexp_extract_all(lower(text), '[a-z]+'), t -> len(t) >= 4) AS w
         |  FROM documents),
         |pr0 AS (SELECT unnest(w[1:len(w)-1]) AS a, unnest(w[2:len(w)]) AS b
         |  FROM tw WHERE len(w) >= 2),
         |cp AS (SELECT least(a, b) AS a, greatest(a, b) AS b,
         |    count(*) AS cnt
         |  FROM pr0 WHERE a <> b GROUP BY 1, 2),
         |te AS (SELECT a, b, cnt FROM cp ORDER BY cnt DESC, a, b LIMIT 500),
         |e AS (SELECT a AS src, b AS dst, cnt AS w FROM te
         |  UNION ALL SELECT b, a, cnt FROM te),
         |${DuckOracles.pageRank2("kw")}
         |SELECT kw AS keyword, rank FROM r2
         |ORDER BY rank DESC, keyword LIMIT 40""".stripMargin) { (s, _) =>
      TextAnalysis.textrankKeywords(s.table("documents"), topK = 40,
        minWordLen = 4, maxEdges = 500)
    },

    df("ta_bpe_merges",
      """WITH wf AS (SELECT w AS word, count(*) AS wc FROM (
        |  SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w
        |  FROM documents) x GROUP BY w),
        |e0 AS (SELECT word, wc,
        |  '|' || array_to_string(list_transform(generate_series(1, len(word)),
        |    i -> word[i]), '| |') || '|' AS enc FROM wf),
        |s1 AS (SELECT word, wc, regexp_extract_all(enc, '\|([a-z]+)\|', 1) AS syms FROM e0),
        |p1 AS (SELECT unnest(syms[1:len(syms)-1]) AS pa, unnest(syms[2:len(syms)]) AS pb, wc
        |  FROM s1 WHERE len(syms) >= 2),
        |c1 AS (SELECT pa, pb, CAST(sum(wc) AS BIGINT) AS cnt FROM p1 GROUP BY pa, pb),
        |b1 AS (SELECT pa, pb, cnt FROM c1 ORDER BY cnt DESC, pa, pb LIMIT 1),
        |e1 AS (SELECT word, wc, regexp_replace(enc,
        |  '\|' || b1.pa || '\| \|' || b1.pb || '\|', '|' || b1.pa || b1.pb || '|', 'g') AS enc
        |  FROM e0 CROSS JOIN b1),
        |s2 AS (SELECT word, wc, regexp_extract_all(enc, '\|([a-z]+)\|', 1) AS syms FROM e1),
        |p2 AS (SELECT unnest(syms[1:len(syms)-1]) AS pa, unnest(syms[2:len(syms)]) AS pb, wc
        |  FROM s2 WHERE len(syms) >= 2),
        |c2 AS (SELECT pa, pb, CAST(sum(wc) AS BIGINT) AS cnt FROM p2 GROUP BY pa, pb),
        |b2 AS (SELECT pa, pb, cnt FROM c2 ORDER BY cnt DESC, pa, pb LIMIT 1),
        |e2 AS (SELECT word, wc, regexp_replace(enc,
        |  '\|' || b2.pa || '\| \|' || b2.pb || '\|', '|' || b2.pa || b2.pb || '|', 'g') AS enc
        |  FROM e1 CROSS JOIN b2),
        |s3 AS (SELECT word, wc, regexp_extract_all(enc, '\|([a-z]+)\|', 1) AS syms FROM e2),
        |p3 AS (SELECT unnest(syms[1:len(syms)-1]) AS pa, unnest(syms[2:len(syms)]) AS pb, wc
        |  FROM s3 WHERE len(syms) >= 2),
        |c3 AS (SELECT pa, pb, CAST(sum(wc) AS BIGINT) AS cnt FROM p3 GROUP BY pa, pb),
        |b3 AS (SELECT pa, pb, cnt FROM c3 ORDER BY cnt DESC, pa, pb LIMIT 1)
        |SELECT 1 AS round, pa AS left_sym, pb AS right_sym, cnt FROM b1
        |UNION ALL SELECT 2, pa, pb, cnt FROM b2
        |UNION ALL SELECT 3, pa, pb, cnt FROM b3
        |ORDER BY round""".stripMargin) { (s, _) =>
      TextAnalysis.bpeMerges(s.table("documents"), merges = 3)
        .orderBy("round")
    },

    // BPE tokenization (apply the learned merges to every document — the
    // pass a training pipeline runs over the whole corpus): train on the
    // word-frequency table (same 3 rounds as ta_bpe_merges), encode each
    // DISTINCT word once, hash-join back on the word key, reassemble per
    // doc in document order. tok_digest pins WHICH token sequence each doc
    // produced, not just the count
    df("ta_bpe_encode",
      """WITH wf AS (SELECT w AS word, count(*) AS wc FROM (
        |  SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w
        |  FROM documents) x GROUP BY w),
        |e0 AS (SELECT word, wc,
        |  '|' || array_to_string(list_transform(generate_series(1, len(word)),
        |    i -> word[i]), '| |') || '|' AS enc FROM wf),
        |s1 AS (SELECT word, wc, regexp_extract_all(enc, '\|([a-z]+)\|', 1) AS syms FROM e0),
        |p1 AS (SELECT unnest(syms[1:len(syms)-1]) AS pa, unnest(syms[2:len(syms)]) AS pb, wc
        |  FROM s1 WHERE len(syms) >= 2),
        |c1 AS (SELECT pa, pb, CAST(sum(wc) AS BIGINT) AS cnt FROM p1 GROUP BY pa, pb),
        |b1 AS (SELECT pa, pb FROM c1 ORDER BY cnt DESC, pa, pb LIMIT 1),
        |e1 AS (SELECT word, wc, CASE WHEN b1.pa IS NULL THEN enc ELSE regexp_replace(enc,
        |  '\|' || b1.pa || '\| \|' || b1.pb || '\|', '|' || b1.pa || b1.pb || '|', 'g') END AS enc
        |  FROM e0 LEFT JOIN b1 ON TRUE),
        |s2 AS (SELECT word, wc, regexp_extract_all(enc, '\|([a-z]+)\|', 1) AS syms FROM e1),
        |p2 AS (SELECT unnest(syms[1:len(syms)-1]) AS pa, unnest(syms[2:len(syms)]) AS pb, wc
        |  FROM s2 WHERE len(syms) >= 2),
        |c2 AS (SELECT pa, pb, CAST(sum(wc) AS BIGINT) AS cnt FROM p2 GROUP BY pa, pb),
        |b2 AS (SELECT pa, pb FROM c2 ORDER BY cnt DESC, pa, pb LIMIT 1),
        |e2 AS (SELECT word, wc, CASE WHEN b2.pa IS NULL THEN enc ELSE regexp_replace(enc,
        |  '\|' || b2.pa || '\| \|' || b2.pb || '\|', '|' || b2.pa || b2.pb || '|', 'g') END AS enc
        |  FROM e1 LEFT JOIN b2 ON TRUE),
        |s3 AS (SELECT word, wc, regexp_extract_all(enc, '\|([a-z]+)\|', 1) AS syms FROM e2),
        |p3 AS (SELECT unnest(syms[1:len(syms)-1]) AS pa, unnest(syms[2:len(syms)]) AS pb, wc
        |  FROM s3 WHERE len(syms) >= 2),
        |c3 AS (SELECT pa, pb, CAST(sum(wc) AS BIGINT) AS cnt FROM p3 GROUP BY pa, pb),
        |b3 AS (SELECT pa, pb FROM c3 ORDER BY cnt DESC, pa, pb LIMIT 1),
        |e3 AS (SELECT word, CASE WHEN b3.pa IS NULL THEN enc ELSE regexp_replace(enc,
        |  '\|' || b3.pa || '\| \|' || b3.pb || '\|', '|' || b3.pa || b3.pb || '|', 'g') END AS enc
        |  FROM e2 LEFT JOIN b3 ON TRUE),
        |tk AS (SELECT word, regexp_extract_all(enc, '\|([a-z]+)\|', 1) AS toks FROM e3),
        |dw AS (SELECT doc_id, unnest(ww) AS word,
        |  unnest(generate_series(1, len(ww))) AS pos
        |  FROM (SELECT doc_id, regexp_extract_all(lower(text), '[a-z]+') AS ww
        |    FROM documents) x),
        |j AS (SELECT doc_id, pos, len(toks) AS n,
        |  array_to_string(toks, ' ') AS ts FROM dw JOIN tk USING (word))
        |SELECT doc_id, CAST(sum(n) AS BIGINT) AS n_bpe_tokens,
        |  md5(string_agg(ts, ' ' ORDER BY pos)) AS tok_digest
        |FROM j GROUP BY doc_id ORDER BY doc_id LIMIT 100""".stripMargin) { (s, _) =>
      val docs = s.table("documents")
      TextAnalysis.bpeEncode(docs, TextAnalysis.bpeMerges(docs, merges = 3))
        .orderBy("doc_id").limit(100)
    },

    // tokenizer fertility: BPE tokens per word by language under the
    // 3-merge vocabulary — the over-segmentation report a curation run
    // publishes before committing a tokenizer
    df("ta_bpe_fertility",
      """WITH wf AS (SELECT w AS word, count(*) AS wc FROM (
        |  SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w
        |  FROM documents) x GROUP BY w),
        |e0 AS (SELECT word, wc,
        |  '|' || array_to_string(list_transform(generate_series(1, len(word)),
        |    i -> word[i]), '| |') || '|' AS enc FROM wf),
        |s1 AS (SELECT word, wc, regexp_extract_all(enc, '\|([a-z]+)\|', 1) AS syms FROM e0),
        |p1 AS (SELECT unnest(syms[1:len(syms)-1]) AS pa, unnest(syms[2:len(syms)]) AS pb, wc
        |  FROM s1 WHERE len(syms) >= 2),
        |c1 AS (SELECT pa, pb, CAST(sum(wc) AS BIGINT) AS cnt FROM p1 GROUP BY pa, pb),
        |b1 AS (SELECT pa, pb FROM c1 ORDER BY cnt DESC, pa, pb LIMIT 1),
        |e1 AS (SELECT word, wc, CASE WHEN b1.pa IS NULL THEN enc ELSE regexp_replace(enc,
        |  '\|' || b1.pa || '\| \|' || b1.pb || '\|', '|' || b1.pa || b1.pb || '|', 'g') END AS enc
        |  FROM e0 LEFT JOIN b1 ON TRUE),
        |s2 AS (SELECT word, wc, regexp_extract_all(enc, '\|([a-z]+)\|', 1) AS syms FROM e1),
        |p2 AS (SELECT unnest(syms[1:len(syms)-1]) AS pa, unnest(syms[2:len(syms)]) AS pb, wc
        |  FROM s2 WHERE len(syms) >= 2),
        |c2 AS (SELECT pa, pb, CAST(sum(wc) AS BIGINT) AS cnt FROM p2 GROUP BY pa, pb),
        |b2 AS (SELECT pa, pb FROM c2 ORDER BY cnt DESC, pa, pb LIMIT 1),
        |e2 AS (SELECT word, wc, CASE WHEN b2.pa IS NULL THEN enc ELSE regexp_replace(enc,
        |  '\|' || b2.pa || '\| \|' || b2.pb || '\|', '|' || b2.pa || b2.pb || '|', 'g') END AS enc
        |  FROM e1 LEFT JOIN b2 ON TRUE),
        |s3 AS (SELECT word, wc, regexp_extract_all(enc, '\|([a-z]+)\|', 1) AS syms FROM e2),
        |p3 AS (SELECT unnest(syms[1:len(syms)-1]) AS pa, unnest(syms[2:len(syms)]) AS pb, wc
        |  FROM s3 WHERE len(syms) >= 2),
        |c3 AS (SELECT pa, pb, CAST(sum(wc) AS BIGINT) AS cnt FROM p3 GROUP BY pa, pb),
        |b3 AS (SELECT pa, pb FROM c3 ORDER BY cnt DESC, pa, pb LIMIT 1),
        |e3 AS (SELECT word, CASE WHEN b3.pa IS NULL THEN enc ELSE regexp_replace(enc,
        |  '\|' || b3.pa || '\| \|' || b3.pb || '\|', '|' || b3.pa || b3.pb || '|', 'g') END AS enc
        |  FROM e2 LEFT JOIN b3 ON TRUE),
        |tk AS (SELECT word, len(regexp_extract_all(enc, '\|([a-z]+)\|', 1)) AS n FROM e3),
        |dw AS (SELECT doc_id, unnest(ww) AS word FROM (
        |  SELECT doc_id, regexp_extract_all(lower(text), '[a-z]+') AS ww
        |  FROM documents) x),
        |ag AS (SELECT doc_id, CAST(sum(n) AS BIGINT) AS nb, count(*) AS nw
        |  FROM dw JOIN tk USING (word) GROUP BY doc_id)
        |SELECT d.lang, CAST(sum(coalesce(a.nw, 0)) AS BIGINT) AS n_words,
        |  CAST(sum(coalesce(a.nb, 0)) AS BIGINT) AS n_bpe_tokens,
        |  round(CAST(sum(coalesce(a.nb, 0)) AS DOUBLE)
        |    / greatest(sum(coalesce(a.nw, 0)), 1), 4) AS fertility
        |FROM documents d LEFT JOIN ag a USING (doc_id)
        |GROUP BY d.lang ORDER BY d.lang""".stripMargin) { (s, _) =>
      val docs = s.table("documents")
      TextAnalysis.bpeFertility(docs, TextAnalysis.bpeMerges(docs, merges = 3))
        .orderBy("lang")
    },

    // hashed bag-of-words document embedding (the hashing trick): md5-derived
    // slot and sign per token, L2-normalized round(4) — the deterministic
    // text->vector bridge that lets SemDeDup/ANN run on raw-text corpora.
    // Emitted exploded to (doc_id, d, val) rows — the driver's pandas
    // comparator cannot sort an array-valued column, so the oracle shape is
    // scalar per row (the ss_label_centroids pattern).
    df("ta_hash_embedding",
      s"""WITH ${DuckOracles.hashEmbedding64},
        |emb AS (SELECT doc_id, embedding FROM hemb ORDER BY doc_id LIMIT 100)
        |SELECT doc_id, generate_subscripts(embedding, 1) AS d,
        |  unnest(embedding) AS val
        |FROM emb ORDER BY doc_id, d""".stripMargin) { (s, _) =>
      TextAnalysis.hashEmbedding(s.table("documents"))
        .orderBy("doc_id").limit(100)
        .select(col("doc_id"), posexplode(col("embedding")))
        .select(col("doc_id"), (col("pos") + 1).cast("long").as("d"),
          col("col").as("val"))
        .orderBy("doc_id", "d")
    },

    // cross-corpus chunk dedup: new-batch docs (non-src0) probed against an
    // already-released reference (src0 plus every doc_id % 7 = 0 — the
    // synthetic "previously released" overlap); chunks seen in the ref are
    // dropped, fully_dup marks docs with nothing left
    df("dd_cross_dedup",
      """WITH rawd AS (SELECT doc_id,
        |  list_filter(regexp_split_to_array(lower(text), '\s+'), w -> len(w) > 0) AS ws
        |  FROM documents WHERE source <> 'src0'),
        |refd AS (SELECT doc_id,
        |  list_filter(regexp_split_to_array(lower(text), '\s+'), w -> len(w) > 0) AS ws
        |  FROM documents WHERE source = 'src0' OR doc_id % 7 = 0),
        |rb AS (SELECT doc_id, ws FROM rawd WHERE len(ws) > 0),
        |rc AS (SELECT doc_id, idx,
        |  md5(array_to_string(list_slice(ws, (idx - 1) * 16 + 1, idx * 16), ' ')) AS h
        |  FROM (SELECT doc_id, ws,
        |    unnest(generate_series(1, CAST(ceil(len(ws) / 16.0) AS INT))) AS idx
        |  FROM rb) x),
        |refc AS (SELECT DISTINCT
        |  md5(array_to_string(list_slice(ws, (idx - 1) * 16 + 1, idx * 16), ' ')) AS h
        |  FROM (SELECT doc_id, ws,
        |    unnest(generate_series(1, CAST(ceil(len(ws) / 16.0) AS INT))) AS idx
        |  FROM refd WHERE len(ws) > 0) x)
        |SELECT rc.doc_id, count(*) AS n_chunks,
        |  CAST(sum(CASE WHEN refc.h IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS dropped_chunks,
        |  CAST(sum(CASE WHEN refc.h IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS kept_chunks,
        |  sum(CASE WHEN refc.h IS NULL THEN 1 ELSE 0 END) = 0 AS fully_dup
        |FROM rc LEFT JOIN refc ON refc.h = rc.h
        |GROUP BY rc.doc_id ORDER BY rc.doc_id LIMIT 100""".stripMargin) { (s, _) =>
      val d = s.table("documents")
      graft.operators.CorpusFilters.crossChunkDedup(
          d.where(col("source") =!= "src0"),
          d.where(col("source") === "src0" || col("doc_id") % 7 === 0))
        .orderBy("doc_id").limit(100)
    },

    // prototypicality (Sorscher et al. 2022): cosine to the OWN label's
    // centroid, ranked within label — the data-pruning order (drop
    // redundant prototypes, keep the informative tail)
    df("ss_prototypicality",
      """WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
        |cd AS (SELECT label, d, round(avg(v[d]), 4) AS c
        |  FROM e CROSS JOIN generate_series(1, 64) t(d) GROUP BY label, d),
        |cl AS (SELECT label, list(c ORDER BY d) AS cent FROM cd GROUP BY label),
        |s AS (SELECT e.vec_id, e.label,
        |  round(list_sum(list_transform(generate_series(1, 64), i -> v[i] * cent[i])) /
        |    (sqrt(list_sum(list_transform(generate_series(1, 64), i -> v[i] * v[i]))) *
        |     sqrt(list_sum(list_transform(generate_series(1, 64), i -> cent[i] * cent[i])))), 4) AS proto_sim
        |  FROM e JOIN cl USING (label)),
        |r AS (SELECT vec_id, label, proto_sim,
        |  CAST(row_number() OVER (PARTITION BY label
        |    ORDER BY proto_sim DESC, vec_id) AS INTEGER) AS rank_in_label
        |  FROM s)
        |SELECT vec_id, label, proto_sim, rank_in_label FROM r
        |ORDER BY label, rank_in_label LIMIT 200""".stripMargin) { (s, _) =>
      Similarity.prototypicality(s.table("embeddings"), dims = 64)
        .orderBy("label", "rank_in_label").limit(200)
    },

    // per-stratum quality-median filter: keep docs at/above their own
    // language's exact median quality (percentile_cont ≡ Spark percentile;
    // quality is quarter-valued so every median is binary-exact)
    df("ta_quality_above_median",
      """WITH w AS (SELECT doc_id, lang, text,
        |  list_filter(regexp_split_to_array(lower(text), '\s+'), x -> len(x) > 0) AS words
        |  FROM documents),
        |f AS (SELECT doc_id, lang,
        |  CAST(len(words) AS BIGINT) AS word_cnt,
        |  round(CAST(len(regexp_replace(text, '\s', '', 'g')) AS DOUBLE) / len(words), 4) AS mean_word_len,
        |  round(CAST(len(list_filter(words, x -> x IN ('the','a','an','and','of','to','in','is'))) AS DOUBLE) / len(words), 4) AS stop_ratio,
        |  round(CAST(len(regexp_replace(text, '[A-Za-z0-9\s]', '', 'g')) AS DOUBLE) / greatest(len(text), 1), 4) AS punct_ratio
        |  FROM w),
        |q AS (SELECT doc_id, lang,
        |  CAST(round((CASE WHEN word_cnt BETWEEN 5 AND 100000 THEN 0.25 ELSE 0.0 END)
        |      + (CASE WHEN mean_word_len BETWEEN 2.0 AND 12.0 THEN 0.25 ELSE 0.0 END)
        |      + (CASE WHEN stop_ratio > 0.01 THEN 0.25 ELSE 0.0 END)
        |      + (CASE WHEN punct_ratio < 0.2 THEN 0.25 ELSE 0.0 END), 2)
        |    AS DOUBLE) AS quality
        |  FROM f),
        |m AS (SELECT lang, CAST(round(percentile_cont(0.5)
        |  WITHIN GROUP (ORDER BY quality), 4) AS DOUBLE) AS stratum_median
        |  FROM q GROUP BY lang)
        |SELECT doc_id, lang, quality, stratum_median,
        |  quality >= stratum_median AS keep
        |FROM q JOIN m USING (lang)
        |ORDER BY doc_id LIMIT 200""".stripMargin) { (s, _) =>
      TextAnalysis.qualityAboveMedian(s.table("documents"))
        .orderBy("doc_id").limit(200)
    },

    // DSIR importance weights (Xie et al. 2023): hashed-unigram log-ratio
    // of target (src0) vs raw distributions, mean per doc; the bucket hash
    // is the shared md5 unit-hash scaled to 64 buckets
    df("ta_dsir_weight",
      """WITH toks AS (SELECT doc_id, source, list_filter(
        |  regexp_split_to_array(lower(text), '\s+'), x -> len(x) > 0) AS w
        |  FROM documents),
        |tx AS (SELECT doc_id, source, unnest(w) AS t FROM toks),
        |bx AS (SELECT doc_id, source,
        |  CAST(floor(CAST(list_sum(list_transform(generate_series(1, 8),
        |    i -> (strpos('0123456789abcdef',
        |      substring(md5(concat('dsir', t)), i, 1)) - 1)
        |      * 16.0 ** (8 - i))) AS DOUBLE) / 4294967296.0 * 64) AS BIGINT)
        |    AS bucket FROM tx),
        |tc AS (SELECT bucket, count(*) AS ct FROM bx WHERE source = 'src0'
        |  GROUP BY bucket),
        |ttot AS (SELECT CAST(count(*) AS DOUBLE) AS tt FROM bx
        |  WHERE source = 'src0'),
        |rc AS (SELECT bucket, count(*) AS cr FROM bx GROUP BY bucket),
        |rtot AS (SELECT CAST(count(*) AS DOUBLE) AS tr FROM bx),
        |ab AS (SELECT CAST(b AS BIGINT) AS bucket FROM generate_series(0, 63) t(b)),
        |lr AS (SELECT ab.bucket,
        |  CAST(round((ln((coalesce(tc.ct, 0) + 1) / (ttot.tt + 64))
        |    - ln((coalesce(rc.cr, 0) + 1) / (rtot.tr + 64))) * 1000000000)
        |    AS BIGINT) AS lrz
        |  FROM ab LEFT JOIN tc USING (bucket) LEFT JOIN rc USING (bucket)
        |  CROSS JOIN ttot CROSS JOIN rtot)
        |SELECT doc_id, count(*) AS n_tokens,
        |  CAST(round(CAST(sum(l.lrz) AS DOUBLE) / count(*) / 1000000000.0
        |    * 10000) AS BIGINT) / 10000.0 AS dsir_weight
        |FROM bx JOIN lr l USING (bucket)
        |GROUP BY doc_id ORDER BY doc_id LIMIT 100""".stripMargin) { (s, _) =>
      val d = s.table("documents")
      graft.operators.Sampling.dsirWeights(d, d.where(col("source") === "src0"))
        .orderBy("doc_id").limit(100)
    },

    // learned quality classifier: logistic regression on the hashed doc
    // embeddings, positives = src0, 3 full-batch GD steps with round(4)
    // weights after every update (the trained-centroid trick) — the
    // oracle retrains the model from scratch and rescores every doc
    df("ta_quality_classifier",
      s"""WITH $duckClassifierChain
        |SELECT doc_id, score, score >= 0.5 AS keep
        |FROM clf ORDER BY doc_id LIMIT 100""".stripMargin) { (s, _) =>
      TextAnalysis.qualityClassifier(s.table("documents"),
          positive = col("source") === "src0")
        .orderBy("doc_id").limit(100)
    },

    // calibration of the learned filter against the heuristic: classifier-
    // probability deciles vs mean Gopher-style quality + actual positive
    // count per decile — the reliability diagram a curation run reads
    // before trusting the learned threshold (DECIMAL-exact bin sums, one
    // final division, so partial-agg order cannot flip a mean)
    df("ta_quality_calibration",
      s"""WITH $duckClassifierChain,
        |qw AS (SELECT doc_id, text, list_filter(
        |  regexp_split_to_array(lower(text), '\\s+'), x -> len(x) > 0)
        |  AS words FROM documents),
        |qf AS (SELECT doc_id,
        |  CAST(len(words) AS BIGINT) AS word_cnt,
        |  round(CAST(len(regexp_replace(text, '\\s', '', 'g')) AS DOUBLE)
        |    / len(words), 4) AS mean_word_len,
        |  round(CAST(len(list_filter(words, x -> x IN
        |    ('the','a','an','and','of','to','in','is'))) AS DOUBLE)
        |    / len(words), 4) AS stop_ratio,
        |  round(CAST(len(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g'))
        |    AS DOUBLE) / greatest(len(text), 1), 4) AS punct_ratio
        |  FROM qw),
        |q AS (SELECT doc_id,
        |  round((CASE WHEN word_cnt BETWEEN 5 AND 100000 THEN 0.25 ELSE 0.0 END)
        |    + (CASE WHEN mean_word_len BETWEEN 2.0 AND 12.0 THEN 0.25 ELSE 0.0 END)
        |    + (CASE WHEN stop_ratio > 0.01 THEN 0.25 ELSE 0.0 END)
        |    + (CASE WHEN punct_ratio < 0.2 THEN 0.25 ELSE 0.0 END), 2)
        |    AS quality FROM qf),
        |j AS (SELECT clf.doc_id,
        |  least(CAST(floor(score * 10) AS BIGINT), 9) AS bin, score, quality,
        |  CAST(yy.y AS BIGINT) AS pos
        |  FROM clf JOIN q USING (doc_id) JOIN yy USING (doc_id))
        |SELECT bin, CAST(count(*) AS BIGINT) AS n_docs,
        |  round(CAST(sum(CAST(score AS DECIMAL(18,4))) AS DOUBLE)
        |    / count(*), 4) AS mean_score,
        |  round(CAST(sum(CAST(quality AS DECIMAL(18,4))) AS DOUBLE)
        |    / count(*), 4) AS mean_quality,
        |  CAST(sum(pos) AS BIGINT) AS positives
        |FROM j GROUP BY bin ORDER BY bin""".stripMargin) { (s, _) =>
      TextAnalysis.qualityCalibration(s.table("documents"),
          positive = col("source") === "src0")
        .withColumn("bin", col("bin").cast("long"))
        .orderBy("bin")
    },


    // DSIR importance resampling: Gumbel top-k over the weights — the
    // paper's sequential weighted draw as one distributed pass. u is the
    // shared md5 unit hash shifted half a hash-ulp into (0,1) (ln(0) is
    // an engine error); keys round(4) before the cut, doc_id tiebreak
    df("ta_dsir_sample",
      """WITH toks AS (SELECT doc_id, source, list_filter(
        |  regexp_split_to_array(lower(text), '\s+'), x -> len(x) > 0) AS w
        |  FROM documents),
        |tx AS (SELECT doc_id, source, unnest(w) AS t FROM toks),
        |bx AS (SELECT doc_id, source,
        |  CAST(floor(CAST(list_sum(list_transform(generate_series(1, 8),
        |    i -> (strpos('0123456789abcdef',
        |      substring(md5(concat('dsir', t)), i, 1)) - 1)
        |      * 16.0 ** (8 - i))) AS DOUBLE) / 4294967296.0 * 64) AS BIGINT)
        |    AS bucket FROM tx),
        |tc AS (SELECT bucket, count(*) AS ct FROM bx WHERE source = 'src0'
        |  GROUP BY bucket),
        |ttot AS (SELECT CAST(count(*) AS DOUBLE) AS tt FROM bx
        |  WHERE source = 'src0'),
        |rc AS (SELECT bucket, count(*) AS cr FROM bx GROUP BY bucket),
        |rtot AS (SELECT CAST(count(*) AS DOUBLE) AS tr FROM bx),
        |ab AS (SELECT CAST(b AS BIGINT) AS bucket FROM generate_series(0, 63) t(b)),
        |lr AS (SELECT ab.bucket,
        |  CAST(round((ln((coalesce(tc.ct, 0) + 1) / (ttot.tt + 64))
        |    - ln((coalesce(rc.cr, 0) + 1) / (rtot.tr + 64))) * 1000000000)
        |    AS BIGINT) AS lrz
        |  FROM ab LEFT JOIN tc USING (bucket) LEFT JOIN rc USING (bucket)
        |  CROSS JOIN ttot CROSS JOIN rtot),
        |wt AS (SELECT doc_id,
        |  CAST(round(CAST(sum(l.lrz) AS DOUBLE) / count(*) / 1000000000.0
        |    * 10000) AS BIGINT) / 10000.0 AS dsir_weight
        |  FROM bx JOIN lr l USING (bucket) GROUP BY doc_id),
        |g AS (SELECT doc_id, dsir_weight,
        |  CAST(round((dsir_weight - ln(-ln(
        |    (CAST(list_sum(list_transform(generate_series(1, 8),
        |      i -> (strpos('0123456789abcdef',
        |        substring(md5(concat('dsirs', CAST(doc_id AS VARCHAR))), i, 1)) - 1)
        |        * 16.0 ** (8 - i))) AS DOUBLE) + 0.5) / 4294967296.0))) * 10000)
        |    AS BIGINT) / 10000.0 AS skey
        |  FROM wt)
        |SELECT doc_id, dsir_weight, skey FROM g
        |ORDER BY skey DESC, doc_id LIMIT 200""".stripMargin) { (s, _) =>
      val d = s.table("documents")
      graft.operators.Sampling.dsirSample(d,
        d.where(col("source") === "src0"), n = 200)
    },

    // temperature-scaled source mixing (mT5 §3.1): share ∝ n_docs^0.3,
    // deterministic md5 keep decision (salt 'tmix'); n^alpha rounds to 6
    // decimals and sums as exact DECIMAL so partial-agg order can't flip
    // the shares (the round-before-sum pattern)
    df("ta_temperature_mix",
      """WITH c AS (SELECT lang, count(*) AS total_docs FROM documents
        |  GROUP BY lang),
        |p AS (SELECT lang, total_docs,
        |  CAST(round(power(total_docs, 0.3), 6) AS DECIMAL(38,6)) AS pw FROM c),
        |d AS (SELECT sum(pw) AS pw_sum,
        |  CAST(sum(total_docs) AS BIGINT) AS n_total FROM p),
        |r AS (SELECT lang, total_docs,
        |  round(CAST(total_docs AS DOUBLE) / n_total, 6) AS nat_share,
        |  round(CAST(pw AS DOUBLE) / CAST(pw_sum AS DOUBLE), 6) AS temp_share
        |  FROM p CROSS JOIN d),
        |rt AS (SELECT *, least(1.0,
        |  round(200.0 * temp_share / total_docs, 6)) AS rate FROM r),
        |j AS (SELECT doc_id, lang, total_docs, nat_share, temp_share, rate,
        |  CAST(list_sum(list_transform(generate_series(1, 8),
        |    i -> (strpos('0123456789abcdef',
        |      substring(md5(concat('tmix', CAST(doc_id AS VARCHAR))), i, 1)) - 1)
        |      * 16.0 ** (8 - i))) AS DOUBLE) / 4294967296.0 < rate AS kept
        |  FROM documents JOIN rt USING (lang))
        |SELECT lang, total_docs, nat_share, temp_share, rate,
        |  CAST(sum(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS sampled_docs,
        |  CAST(sum(CASE WHEN kept THEN doc_id ELSE 0 END) AS BIGINT) AS id_sum
        |FROM j GROUP BY lang, total_docs, nat_share, temp_share, rate
        |ORDER BY lang""".stripMargin) { (s, _) =>
      graft.operators.Sampling.temperatureReport(s.table("documents"),
          alpha = 0.3, budgetDocs = 200L)
        .orderBy("lang")
    },

    // near-dup verification: LSH candidate pairs re-checked with a real
    // string metric (edit similarity on the 2k prefix) — the precision
    // stage after the banded recall stage
    df("dd_editdist_verify",
      s"""WITH $duckMinhashSig,
         |bands AS (
         |  SELECT doc_id, 0 AS band, md5(concat(mh0, mh1)) AS bkey FROM sig
         |  UNION ALL SELECT doc_id, 1, md5(concat(mh2, mh3)) FROM sig
         |  UNION ALL SELECT doc_id, 2, md5(concat(mh4, mh5)) FROM sig
         |  UNION ALL SELECT doc_id, 3, md5(concat(mh6, mh7)) FROM sig),
         |p AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         |  FROM bands a JOIN bands b
         |    ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id),
         |tt AS (SELECT doc_id,
         |  substring(coalesce(text, ''), 1, 2000) AS t FROM documents),
         |v AS (SELECT id_a, id_b, round(1.0 -
         |    CAST(levenshtein(ta.t, tb.t) AS DOUBLE) /
         |      greatest(len(ta.t), len(tb.t), 1), 4) AS edit_sim
         |  FROM p JOIN tt ta ON ta.doc_id = id_a
         |  JOIN tt tb ON tb.doc_id = id_b)
         |SELECT id_a, id_b, edit_sim FROM v WHERE edit_sim >= 0.3
         |ORDER BY id_a, id_b""".stripMargin) { (s, _) =>
      Dedup.editDistVerify(s.table("documents"), threshold = 0.3)
        .orderBy("id_a", "id_b")
    },

    // minhash calibration: estimated (signature-match) vs true Jaccard per
    // LSH candidate pair — the QA artifact that sizes k before a corpus run
    df("dd_minhash_calibration",
      s"""WITH $duckMinhashSig,
         |bands AS (
         |  SELECT doc_id, 0 AS band, md5(concat(mh0, mh1)) AS bkey FROM sig
         |  UNION ALL SELECT doc_id, 1, md5(concat(mh2, mh3)) FROM sig
         |  UNION ALL SELECT doc_id, 2, md5(concat(mh4, mh5)) FROM sig
         |  UNION ALL SELECT doc_id, 3, md5(concat(mh6, mh7)) FROM sig),
         |p AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         |  FROM bands a JOIN bands b
         |    ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id),
         |e AS (SELECT id_a, id_b, round((
         |    ${(0 until 8).map(i =>
                  s"CASE WHEN sa.mh$i = sb.mh$i THEN 1 ELSE 0 END")
                  .mkString(" +\n         |    ")}) / 8.0, 4) AS est_jaccard
         |  FROM p JOIN sig sa ON sa.doc_id = id_a
         |  JOIN sig sb ON sb.doc_id = id_b),
         |s3 AS (SELECT DISTINCT doc_id, shingle FROM (
         |  SELECT doc_id, unnest(list_transform(generate_series(1, len(w)-2),
         |    i -> concat_ws(' ', w[i], w[i+1], w[i+2]))) AS shingle
         |  FROM toks WHERE len(w) >= 3) x),
         |cnt AS (SELECT doc_id, count(*) AS c FROM s3 GROUP BY doc_id),
         |inter AS (SELECT id_a, id_b, count(*) AS i FROM p
         |  JOIN s3 sa ON sa.doc_id = id_a
         |  JOIN s3 sb ON sb.doc_id = id_b AND sb.shingle = sa.shingle
         |  GROUP BY id_a, id_b),
         |tj AS (SELECT p.id_a, p.id_b,
         |  round(coalesce(i.i, 0) / (ca.c + cb.c - coalesce(i.i, 0)), 4)
         |    AS jaccard
         |  FROM p LEFT JOIN inter i ON i.id_a = p.id_a AND i.id_b = p.id_b
         |  JOIN cnt ca ON ca.doc_id = p.id_a
         |  JOIN cnt cb ON cb.doc_id = p.id_b)
         |SELECT e.id_a, e.id_b, est_jaccard, jaccard,
         |  round(abs(est_jaccard - jaccard), 4) AS abs_err
         |FROM e JOIN tj ON tj.id_a = e.id_a AND tj.id_b = e.id_b
         |ORDER BY e.id_a, e.id_b""".stripMargin) { (s, _) =>
      Dedup.minhashCalibration(s.table("documents"))
        .orderBy("id_a", "id_b")
    },

    // deterministic held-out split: a doc's split depends only on its own
    // id hash, so membership survives growth/filtering/re-partitioning
    df("ta_heldout_split",
      """WITH u AS (SELECT doc_id,
        |  CAST(list_sum(list_transform(generate_series(1, 8),
        |    i -> (strpos('0123456789abcdef',
        |      substring(md5(concat('split', CAST(doc_id AS VARCHAR))), i, 1)) - 1)
        |      * 16.0 ** (8 - i))) AS DOUBLE) / 4294967296.0 AS u
        |  FROM documents),
        |s AS (SELECT doc_id, CASE WHEN u < 0.1 THEN 'test'
        |  WHEN u < 0.2 THEN 'val' ELSE 'train' END AS split FROM u)
        |SELECT split, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(doc_id) AS BIGINT) AS id_sum
        |FROM s GROUP BY split ORDER BY split""".stripMargin) { (s, _) =>
      graft.operators.Sampling.heldoutReport(s.table("documents"),
          valRate = 0.1, testRate = 0.1)
        .orderBy("split")
    },

    // LEAK-FREE split: assignment by near-dup CLUSTER (coalesce(cluster,
    // own id)), so no candidate pair straddles train/test —
    // leaked_pairs is 0 BY CONSTRUCTION while the same hash applied
    // per-doc (naive_leaked_pairs) provably leaks on the same graph.
    // Clusters = connected components over the consecutive-id embedding
    // pairs at cos >= 0.2 (the dd_neardup_clusters fixture).
    df("dd_split_leakfree",
      """WITH RECURSIVE
        |e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |p0 AS (SELECT vec_id AS id_a, vec_id + 1 AS id_b FROM embeddings),
        |sim AS (SELECT id_a, id_b,
        |  round(list_sum(list_transform(generate_series(1, len(ea.v)), i -> ea.v[i] * eb.v[i])) /
        |  (sqrt(list_sum(list_transform(generate_series(1, len(ea.v)), i -> ea.v[i] * ea.v[i]))) *
        |   sqrt(list_sum(list_transform(generate_series(1, len(eb.v)), i -> eb.v[i] * eb.v[i])))), 4) AS s
        |  FROM p0 JOIN e ea ON ea.vec_id = id_a JOIN e eb ON eb.vec_id = id_b),
        |pr AS (SELECT id_a, id_b FROM sim WHERE s >= 0.2),
        |edges AS (SELECT id_a AS src, id_b AS dst FROM pr UNION SELECT id_b, id_a FROM pr),
        |reach(src, dst) AS (
        |  SELECT src, dst FROM edges
        |  UNION
        |  SELECT r.src, e2.dst FROM reach r JOIN edges e2 ON e2.src = r.dst),
        |cl AS (SELECT src AS id, least(src, min(dst)) AS cluster_id
        |  FROM reach GROUP BY src),
        |docs AS (SELECT vec_id AS doc_id FROM embeddings),
        |su AS (SELECT doc_id, coalesce(cluster_id, doc_id) AS unit_id
        |  FROM docs LEFT JOIN cl ON cl.id = docs.doc_id),
        |hu AS (SELECT doc_id, unit_id,
        |  CAST(list_sum(list_transform(generate_series(1, 8),
        |    i -> (strpos('0123456789abcdef',
        |      substring(md5(concat('lf', CAST(unit_id AS VARCHAR))), i, 1)) - 1)
        |      * 16.0 ** (8 - i))) AS DOUBLE) / 4294967296.0 AS u
        |  FROM su),
        |sp AS (SELECT doc_id, unit_id, CASE WHEN u < 0.1 THEN 'test'
        |  WHEN u < 0.2 THEN 'val' ELSE 'train' END AS split FROM hu),
        |hn AS (SELECT doc_id,
        |  CAST(list_sum(list_transform(generate_series(1, 8),
        |    i -> (strpos('0123456789abcdef',
        |      substring(md5(concat('lf', CAST(doc_id AS VARCHAR))), i, 1)) - 1)
        |      * 16.0 ** (8 - i))) AS DOUBLE) / 4294967296.0 AS u
        |  FROM docs),
        |nv AS (SELECT doc_id, CASE WHEN u < 0.1 THEN 'test'
        |  WHEN u < 0.2 THEN 'val' ELSE 'train' END AS split FROM hn),
        |lk AS (SELECT CAST(count(*) AS BIGINT) AS leaked_pairs FROM pr
        |  JOIN sp a ON a.doc_id = pr.id_a JOIN sp b ON b.doc_id = pr.id_b
        |  WHERE a.split <> b.split),
        |nlk AS (SELECT CAST(count(*) AS BIGINT) AS naive_leaked_pairs FROM pr
        |  JOIN nv a ON a.doc_id = pr.id_a JOIN nv b ON b.doc_id = pr.id_b
        |  WHERE a.split <> b.split)
        |SELECT split, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(count(DISTINCT unit_id) AS BIGINT) AS n_units,
        |  CAST(sum(doc_id) AS BIGINT) AS id_sum,
        |  leaked_pairs, naive_leaked_pairs
        |FROM sp, lk, nlk
        |GROUP BY split, leaked_pairs, naive_leaked_pairs
        |ORDER BY split""".stripMargin) { (s, _) =>
      val emb = s.table("embeddings")
      val pairs = Similarity.embeddingNearDups(emb,
          emb.select(col("vec_id").as("id_a"), (col("vec_id") + 1).as("id_b")),
          threshold = 0.2)
        .select("id_a", "id_b")
      val clusters = Dedup.neardupClusters(pairs)
      val docs = emb.select(col("vec_id").as("doc_id"))
      val lf = graft.operators.Sampling.leakFreeSplit(docs, clusters,
        valRate = 0.1, testRate = 0.1, salt = "lf")
      val nv = graft.operators.Sampling.heldoutSplit(docs,
        valRate = 0.1, testRate = 0.1, salt = "lf")
      def leaks(splits: org.apache.spark.sql.DataFrame, out: String) = pairs
        .join(splits.select(col("doc_id").as("id_a"), col("split").as("sa")), "id_a")
        .join(splits.select(col("doc_id").as("id_b"), col("split").as("sb")), "id_b")
        .agg(count(when(col("sa") =!= col("sb"), lit(1))).as(out))
      lf.groupBy("split")
        .agg(count(lit(1)).as("n_docs"),
          countDistinct("unit_id").as("n_units"),
          sum("doc_id").as("id_sum"))
        .crossJoin(broadcast(leaks(lf, "leaked_pairs")))
        .crossJoin(broadcast(leaks(nv, "naive_leaked_pairs")))
        .orderBy("split")
    },

    // cross-source overlap matrix: the provenance report (how much of
    // crawl X already sits in dump Y); cross-source copies planted from
    // src0 into a synthetic re-release, disjoint negative id space
    df("dd_source_overlap",
      """WITH c AS (SELECT doc_id, source, text FROM documents
        |  UNION ALL SELECT -(doc_id + 1), 'rerelease', text
        |  FROM documents WHERE source = 'src0' AND doc_id % 7 = 0),
        |h AS (SELECT DISTINCT source AS src,
        |  coalesce(md5(text), '0') AS h FROM c),
        |tot AS (SELECT src, CAST(count(*) AS BIGINT) AS total_a
        |  FROM h GROUP BY src),
        |pairs AS (SELECT a.src AS source_a, b.src AS source_b,
        |  CAST(count(*) AS BIGINT) AS shared_texts
        |  FROM h a JOIN h b ON a.h = b.h AND a.src <> b.src
        |  GROUP BY a.src, b.src)
        |SELECT source_a, source_b, shared_texts, total_a,
        |  round(CAST(shared_texts AS DOUBLE) / total_a, 4) AS overlap_frac
        |FROM pairs JOIN tot ON tot.src = pairs.source_a
        |ORDER BY source_a, source_b""".stripMargin) { (s, _) =>
      val d = s.table("documents")
      val corpus = d.select("doc_id", "source", "text")
        .unionByName(d.where(col("source") === "src0" && col("doc_id") % 7 === 0)
          .select((-(col("doc_id") + 1L)).as("doc_id"),
            lit("rerelease").as("source"), col("text")))
      Dedup.sourceOverlap(corpus)
        .orderBy("source_a", "source_b")
    },

    // per-doc n-gram novelty: fraction of a doc's bigrams no other doc
    // carries — what exact/sub-doc dedup would leave behind
    df("ta_novelty",
      s"""WITH $duckWords,
         |g AS (SELECT doc_id, unnest(list_transform(generate_series(1, len(w) - 1),
         |    i -> concat_ws(' ', w[i], w[i+1]))) AS shingle
         |  FROM toks WHERE len(w) >= 2),
         |r AS (SELECT shingle, count(*) AS n_docs FROM (
         |  SELECT DISTINCT doc_id, shingle FROM g) x GROUP BY shingle)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams,
         |  CAST(sum(CASE WHEN n_docs = 1 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS novel_grams,
         |  round(CAST(sum(CASE WHEN n_docs = 1 THEN 1 ELSE 0 END) AS DOUBLE)
         |    / count(*), 4) AS novelty
         |FROM g JOIN r USING (shingle)
         |GROUP BY doc_id ORDER BY doc_id LIMIT 100""".stripMargin) { (s, _) =>
      graft.operators.TextAnalysis.noveltyScore(s.table("documents"), n = 2)
        .orderBy("doc_id").limit(100)
    },

    // boilerplate report: word n-grams shared across documents, by reach
    df("ta_dup_ngrams",
      s"""WITH $duckWords,
         |g AS (SELECT doc_id, unnest(list_transform(generate_series(1, len(w) - 2),
         |    i -> array_to_string(w[i:i+2], ' '))) AS gram
         |  FROM toks WHERE len(w) >= 3),
         |pd AS (SELECT gram, doc_id, count(*) AS occ FROM g GROUP BY gram, doc_id),
         |a AS (SELECT gram, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(occ) AS BIGINT) AS n_occurrences FROM pd GROUP BY gram)
         |SELECT gram, n_docs, n_occurrences FROM a WHERE n_docs > 1
         |ORDER BY n_docs DESC, n_occurrences DESC, gram
         |LIMIT 50""".stripMargin) { (s, _) =>
      graft.operators.TextAnalysis.dupNgrams(s.table("documents"),
        n = 3, topK = 50)
    }
  )
}
