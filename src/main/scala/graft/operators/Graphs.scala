package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Shared graph machinery — ONE weighted-PageRank implementation so the
  * service-dependency ranking ([[Traces.serviceCentrality]]) and the web
  * host-authority ranking ([[WebFilters.hostRank]]) cannot drift apart.
  * The math and determinism contract are exactly the r14 centrality's
  * (see that scaladoc's history): damping over `iters` synchronous
  * rounds from the uniform start; a node's rank flows to its successors
  * proportionally to edge weight; dangling nodes (in-edges only) absorb
  * rank without redistributing — the simplified PR variant, divergence
  * from the redistribute-to-all rule documented here.
  *
  * Deterministic cross-engine: each round's per-node inflow quantizes
  * every contribution to integer micro-units (round(c·1e12) as long)
  * and takes a plain `sum()` — integer addition is order-insensitive,
  * so engine sum order can never drift a rank, and unlike the previous
  * collect-sorted-fold there is NO per-node buffering: a power-law hub
  * (the top host of a real web graph has in-degree O(all hosts)) costs
  * a partial-aggregated long sum, not an in-memory list in one task.
  * Each round still rounds ranks to 6 decimals. Quantization bound:
  * per-edge error ≤ 5e-13, total inflow ≤ 1 so the long sum ≤ ~1e12
  * (no overflow), and accumulated error per node ≤ in-degree·5e-13 —
  * invisible at the 6-decimal contract for any graph below ~1e6
  * in-degree per node per ulp, and the oracle replays the SAME
  * quantization so the engines agree exactly regardless.
  * The teleport term is computed in
  * BigDecimal ((1 − damping) exactly, NOT the JVM double subtraction)
  * because 1 − 0.85 = 0.15000000000000002 in binary doubles while a SQL
  * oracle's 0.15 literal is the nearest-to-0.15 double — a 1-ulp
  * pre-round divergence that can flip a round(6) at the boundary.
  *
  * Shape at 100 TB: the caller reduces the raw data to a node-pair-
  * bounded edge frame FIRST (services², hosts² — thousands of rows when
  * the input is petabytes); everything here is arithmetic on that frame
  * (one count() for N at construction, `iters` small joins). */
object Graphs {

  /** Weighted PageRank over an edge frame (src, dst, w). Returns one row
    * per node that appears on any edge: (node, rank), rank rounded to 6
    * decimals (the cross-engine contract above). */
  def pageRank(edgeFrame: DataFrame, iters: Int = 2,
               damping: Double = 0.85,
               srcCol: String = "src", dstCol: String = "dst",
               weightCol: String = "w"): DataFrame = {
    require(iters >= 1 && damping > 0 && damping < 1,
      s"bad pagerank config ($iters, $damping)")
    val edges = edgeFrame
      .select(col(srcCol).as("src"), col(dstCol).as("dst"),
        col(weightCol).as("w"))
      .localCheckpoint()
    val nodes = edges.select(col("src").as("node"))
      .union(edges.select(col("dst"))).distinct().localCheckpoint()
    val n = nodes.count().toDouble
    val outw = edges.groupBy("src")
      .agg(sum(col("w")).cast("double").as("ow"))
    var pr = nodes.withColumn("rank", lit(1.0 / n))
    val teleport = (BigDecimal(1) - BigDecimal(damping)).toDouble / n
    for (_ <- 1 to iters) {
      val contrib = edges.join(outw, "src")
        .join(pr.select(col("node").as("src"), col("rank")), "src")
        .select(col("dst"),
          (col("rank") * col("w") / col("ow")).as("c"))
      val inflow = contrib.groupBy("dst")
        .agg((sum(round(col("c") * lit(1e12), 0).cast("long")) / lit(1e12))
          .as("infl"))
      pr = nodes.join(inflow, col("node") === col("dst"), "left")
        .select(col("node"),
          round(lit(teleport) +
            lit(damping) * coalesce(col("infl"), lit(0.0)), 6).as("rank"))
    }
    pr
  }
}
