package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Retrieval-evaluation metrics — the measurement half of the ANN /
  * retrieval family (recall@k, MRR@k, nDCG@k are what a corpus team
  * tunes IVF cell counts, SQ8 rerank windows, and RRF fusion against;
  * RecallBench measures the in-repo indexes with exactly these ideas).
  * Inputs: `results(query_id, doc_id, rank)` — one system's ranked
  * lists, rank 1-based — and `qrels(query_id, doc_id, grade)` — graded
  * judgments, grade > 0 relevant (grade 0 rows are judged-irrelevant
  * and contribute nothing, but their presence must not crash or skew).
  *
  * Cross-engine determinism: the per-rank DCG discounts 1/log2(r+1)
  * are computed ONCE in Scala and embedded as double literals in both
  * the plan and any oracle SQL built from [[dcgWeight]] (two engines'
  * libm log2 may differ in the last ulp; a shared literal cannot); the
  * DCG sum over a query's hits quantizes each term to integer
  * nano-units and takes a plain long sum (the Graphs.pageRank rule —
  * order-insensitive, so partitioning can never drift a score); nDCG
  * rounds to 6. The ideal DCG folds the query's grades sorted
  * descending — a deterministic left fold over identical lists in both
  * engines.
  *
  * Shape at 100 TB: every metric is one equi-join of results×qrels on
  * (query_id, doc_id) plus per-query partial aggs — results are
  * k-bounded per query and qrels judgment-bounded, so nothing here
  * touches a corpus-sized frame. Queries with NO positive judgment are
  * excluded (recall/nDCG are undefined there), documented contract. */
object RetrievalEval {

  /** The rank-r DCG discount 1/log2(r+1), exposed so oracle SQL can
    * embed the SAME double literal the plan uses. */
  def dcgWeight(r: Int): Double = {
    require(r >= 1, s"bad rank $r")
    1.0 / (math.log(r + 1.0) / math.log(2.0))
  }

  /** Per-query retrieval metrics in one frame:
    * (query_id, n_relevant, recall, recall_capped, rr, ndcg, judged).
    *
    *  - `recall` — relevant hits in the top k over n_relevant;
    *  - `recall_capped` — the R-capped variant, denominator
    *    `min(n_relevant, k)`: a query with 40 relevants can still score
    *    1.0 at k=10 (recall@k's ceiling of k/n_relevant makes plain
    *    recall incomparable across queries — the standard IR fix);
    *  - `rr` — reciprocal rank of the first relevant hit within the
    *    top k, 0 when none (MRR@k is the mean of this column);
    *  - `ndcg` — nDCG@k with exponential gains;
    *  - `judged` — the fraction of the query's returned top-k rows that
    *    carry ANY judgment (grade 0 counts — it IS a judgment); the
    *    pool-coverage diagnostic that tells you whether a low recall is
    *    a bad index or an unjudged pool. Denominator is the rows the
    *    system actually returned within k (a short list isn't
    *    penalized); 0 when it returned none. */
  def evaluate(results: DataFrame, qrels: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"bad k $k")
    val wArr = array((1 to k).map(r => lit(dcgWeight(r))): _*)
    // per-query judgment profile; queries with no positive grade drop
    val truth = qrels.groupBy("query_id").agg(
        count(when(col("grade") > 0, lit(1))).as("n_relevant"),
        sort_array(collect_list(when(col("grade") > 0, col("grade"))),
          asc = false).as("__gs"))
      .where(col("n_relevant") > 0)
      .select(col("query_id"), col("n_relevant"),
        // ideal DCG: grades sorted desc folded with the literal weights
        // (identical lists + identical fold order in any engine)
        (aggregate(
          zip_with(
            slice(col("__gs"), 1, k),
            slice(wArr, lit(1), least(size(col("__gs")), lit(k))),
            (g, w) => (pow(lit(2.0), g) - 1) * w),
          lit(0.0), (acc, x) => acc + x)).as("__idcg"))
    val topK = results.where(col("rank") <= k)
    val hits = topK.join(qrels, Seq("query_id", "doc_id"))
    val perQuery = hits.groupBy("query_id").agg(
      count(when(col("grade") > 0, lit(1))).as("__hit"),
      count(lit(1)).as("__judged"),
      min(when(col("grade") > 0, col("rank"))).as("__first"),
      // nano-unit quantized terms, plain long sum: order-insensitive
      (sum(round(((pow(lit(2.0), col("grade")) - 1) *
        element_at(wArr, col("rank"))) * lit(1e9), 0).cast("long")) / 1e9)
        .as("__dcg"))
    val returned = topK.groupBy("query_id").agg(count(lit(1)).as("__nret"))
    truth.join(perQuery, Seq("query_id"), "left")
      .join(returned, Seq("query_id"), "left")
      .select(col("query_id"), col("n_relevant"),
        round(coalesce(col("__hit"), lit(0L)).cast("double") /
          col("n_relevant"), 6).as("recall"),
        round(coalesce(col("__hit"), lit(0L)).cast("double") /
          least(col("n_relevant"), lit(k.toLong)), 6).as("recall_capped"),
        round(coalesce(lit(1.0) / col("__first"), lit(0.0)), 6).as("rr"),
        round(coalesce(col("__dcg"), lit(0.0)) / col("__idcg"), 6)
          .as("ndcg"),
        round(coalesce(coalesce(col("__judged"), lit(0L)).cast("double") /
          col("__nret"), lit(0.0)), 6).as("judged"))
  }
}
