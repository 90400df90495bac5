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
}
