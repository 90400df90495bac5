package graft.queries

import graft.QSpec
import graft.QSpec._
import org.apache.spark.sql.functions._

/** The relational operator surface of SURVEY.md §2.4 (Q1–Q41), one oracle-
  * checked query per operator family. The reference delegates all of this to
  * its host engine (DuckDB); we delegate to Spark SQL / Catalyst — no custom
  * operators are needed for parity (SURVEY §4.2).
  *
  * Determinism rules for oracle hash-parity:
  *   - every query has a total ORDER BY (row order is part of the contract);
  *   - no raw timestamps in output — formatted strings only (engine-native
  *     timestamp encodings differ);
  *   - derived doubles are round()ed; raw parquet doubles pass through
  *     unmodified (identical bits in both engines);
  *   - double→int conversions use explicit floor() (DuckDB CAST rounds,
  *     Spark CAST truncates);
  *   - NULLS FIRST is explicit wherever a sort key can be null (defaults
  *     differ between the engines).
  */
object Relational {

  /** Exact interpolated quantile of lineitem.l_extendedprice as a
    * DISTRIBUTED computation (guide §1.2: fix the algorithm before the
    * config): a range-partitioned sort + a two-row order-statistic pick,
    * instead of percentile_cont's single-group object aggregate that
    * collects all N values into one buffer and sorts them on one core.
    * The interpolation replays Spark's own Percentile.getPercentile
    * arithmetic — `lower·(hi−pos) + higher·(pos−lo)` at pos = p·(N−1) —
    * so the value is bit-identical to the SQL form the oracle still runs.
    * Driver traffic is two doubles and one count (the pageRank/seqPack
    * bounded-artifact rule); the sorted RDD is persisted across the
    * zipWithIndex count pass and the pick pass, then released. */
  private def exactQuantile(s: org.apache.spark.sql.SparkSession, p: Double,
                            outName: String, scale: Int): org.apache.spark.sql.DataFrame = {
    val vals = s.table("lineitem").select(col("l_extendedprice").as("v"))
      .where(col("v").isNotNull)
    val n = vals.count()
    require(n > 0, "exactQuantile over an empty table")
    val pos = p * (n - 1)
    val lo = math.floor(pos).toLong
    val hi = math.ceil(pos).toLong
    val sorted = vals.orderBy("v").rdd.map(_.getDouble(0))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val picked = sorted.zipWithIndex()
        .filter { case (_, i) => i == lo || i == hi }
        .collect().sortBy(_._2).map(_._1)
      val v = if (lo == hi) picked(0)
              else picked(0) * (hi - pos) + picked(1) * (pos - lo)
      s.range(1).select(round(lit(v), scale).as(outName))
    } finally sorted.unpersist(blocking = false)
  }

  val all: Seq[QSpec] = Seq(
    // Q1 projection
    // ORDER BY covers every projected column: (orderkey, linenumber) is
    // not unique at sf0.1, and a LIMIT under a non-total order lets each
    // engine break ties with different physical rows
    sameSql("q01_projection",
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
        |ORDER BY l_orderkey, l_linenumber, l_quantity LIMIT 100""".stripMargin),
    // Q2 filter: range + equality + AND
    sameSql("q02_filter_range",
      "SELECT count(*) AS cnt FROM lineitem WHERE l_quantity > 30 AND l_returnflag = 'R'"),
    // Q3 filter: IN list
    sameSql("q03_filter_in",
      "SELECT count(*) AS cnt FROM orders WHERE o_orderpriority IN ('1-URGENT','2-HIGH')"),
    // Q4 filter: LIKE
    sameSql("q04_filter_like",
      "SELECT count(*) AS cnt FROM part WHERE p_name LIKE '%red%'"),
    // Q5 NULL semantics (nullif + IS NULL)
    sameSql("q05_null_filter",
      "SELECT count(*) AS cnt FROM orders WHERE nullif(o_orderstatus, 'O') IS NULL"),
    // Q6 hash aggregate, multi-key GROUP BY (TPC-H Q1 core)
    sameSql("q06_groupby_agg",
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_base_price,
        |  round(avg(l_quantity), 4) AS avg_qty,
        |  round(avg(l_extendedprice), 4) AS avg_price,
        |  count(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin),
    // Q7 min/max/avg/sum/count
    sameSql("q07_agg_stats",
      """SELECT round(min(o_totalprice), 2) AS min_price,
        |  round(max(o_totalprice), 2) AS max_price,
        |  round(avg(o_totalprice), 4) AS avg_price,
        |  round(sum(o_totalprice), 2) AS sum_price,
        |  count(*) AS cnt
        |FROM orders""".stripMargin),
    // Q8 exact percentile (ordered-set aggregate). The SQL form
    // (percentile_cont) stays as the DuckDB oracle; Spark-side it planned
    // as a single-group ObjectHashAggregate that collects EVERY value into
    // one reducer's buffer and sorts it single-threaded — 2.5 s at sf0.1
    // and a straight row-count wall at scale. The distributed form
    // computes the identical two order statistics via a range-partitioned
    // sort (exactOrderStat) and interpolates with Spark's own
    // percentile_cont formula, so the value is bit-identical.
    df("q08_percentile",
      """SELECT round(CAST(percentile_cont(0.95) WITHIN GROUP (ORDER BY l_extendedprice) AS DOUBLE), 4) AS p95_price
        |FROM lineitem""".stripMargin) { (s, _) =>
      exactQuantile(s, 0.95, "p95_price", 4)
    },
    // Q8b exact median — same distributed order-statistic form (median =
    // percentile_cont(0.5); DuckDB's median() is defined identically)
    df("q08_median",
      "SELECT round(CAST(median(l_extendedprice) AS DOUBLE), 2) AS med_price FROM lineitem") {
      (s, _) => exactQuantile(s, 0.5, "med_price", 2)
    },
    // Q8c/Q8d — the 100 TB production path for Q8's exact ordered-set
    // aggregates (SCALE.md §2, VERDICT r7 #6): approx_percentile is a
    // mergeable quantile sketch, aggregated map-side in full partial
    // aggregation — no single-group global collection of every value.
    // The sketch state is engine-specific, so there is no DuckDB value
    // oracle (rows-only check); QueriesSpec asserts closeness to the
    // exact q08 values and PlanSpec pins the partial-agg plan shape.
    noOracle("q08_percentile_approx") { (s, _) =>
      s.sql("""SELECT round(approx_percentile(l_extendedprice, 0.95, 10000), 4)
              |  AS p95_price_approx FROM lineitem""".stripMargin)
    },
    noOracle("q08_median_approx") { (s, _) =>
      s.sql("""SELECT round(approx_percentile(l_extendedprice, 0.5, 10000), 2)
              |  AS med_price_approx FROM lineitem""".stripMargin)
    },
    // Q9 count(DISTINCT)
    sameSql("q09_count_distinct",
      "SELECT count(DISTINCT c_nationkey) AS n_nations FROM customer"),
    // Q10 top-K (TakeOrderedAndProject)
    sameSql("q10_topk",
      "SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10"),
    // Q11 multi-column sort asc/desc
    sameSql("q11_multisort",
      "SELECT n_nationkey, n_name FROM nation ORDER BY n_regionkey DESC, n_name ASC, n_nationkey"),
    // Q12 inner equi-join + filter
    sameSql("q12_join_filter",
      """SELECT count(*) AS cnt FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |WHERE c.c_mktsegment = 'BUILDING'""".stripMargin),
    // Q13 multi-way join + group
    sameSql("q13_join_multiway",
      """SELECT n.n_name, count(*) AS cnt
        |FROM customer c
        |JOIN nation n ON c.c_nationkey = n.n_nationkey
        |JOIN region r ON n.n_regionkey = r.r_regionkey
        |WHERE r.r_name = 'ASIA' GROUP BY n.n_name ORDER BY n.n_name""".stripMargin),
    // Q14 broadcast join (DataFrame API, explicit broadcast of small dims;
    // result-identical to q13 — the hint is plan-level only)
    df("q14_broadcast_join",
      """SELECT n.n_name, count(*) AS cnt
        |FROM customer c
        |JOIN nation n ON c.c_nationkey = n.n_nationkey
        |JOIN region r ON n.n_regionkey = r.r_regionkey
        |WHERE r.r_name = 'ASIA' GROUP BY n.n_name ORDER BY n.n_name""".stripMargin) { (s, _) =>
      val c = s.table("customer")
      val n = broadcast(s.table("nation"))
      val r = broadcast(s.table("region"))
      c.join(n, c("c_nationkey") === n("n_nationkey"))
        .join(r, n("n_regionkey") === r("r_regionkey"))
        .where(r("r_name") === "ASIA")
        .groupBy(n("n_name"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy("n_name")
    },
    // Q15 left outer join (row preservation + match count)
    sameSql("q15_left_join",
      """SELECT count(*) AS cnt, count(l.l_orderkey) AS matched
        |FROM orders o LEFT JOIN lineitem l ON o.o_orderkey = l.l_orderkey""".stripMargin),
    // Q16 anti join (NOT EXISTS)
    sameSql("q16_anti_join",
      """SELECT count(*) AS cnt FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)""".stripMargin),
    // Q16b semi join (EXISTS)
    sameSql("q16_semi_join",
      """SELECT count(*) AS cnt FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)""".stripMargin),
    // Q17 self join
    sameSql("q17_self_join",
      "SELECT count(*) AS cnt FROM nation a JOIN nation b ON a.n_regionkey = b.n_regionkey"),
    // Q18 scalar subquery
    sameSql("q18_scalar_subquery",
      """SELECT count(*) AS cnt FROM orders
        |WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders)""".stripMargin),
    // Q19 UNION ALL
    sameSql("q19_union_all",
      """SELECT count(*) AS cnt FROM
        |(SELECT o_orderkey AS k FROM orders UNION ALL SELECT l_orderkey AS k FROM lineitem) u""".stripMargin),
    // Q20 EXCEPT (distinct semantics in both engines)
    sameSql("q20_except",
      """SELECT count(*) AS cnt FROM
        |((SELECT c_nationkey AS k FROM customer) EXCEPT (SELECT s_nationkey AS k FROM supplier)) d""".stripMargin),
    // Q21 INTERSECT
    sameSql("q21_intersect",
      """SELECT count(*) AS cnt FROM
        |((SELECT c_nationkey AS k FROM customer) INTERSECT (SELECT s_nationkey AS k FROM supplier)) i""".stripMargin),
    // Q22 running-sum window
    sameSql("q22_window_sum",
      """SELECT o_custkey, o_orderkey,
        |  round(sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS run_sum
        |FROM orders ORDER BY o_custkey, o_orderkey LIMIT 100""".stripMargin),
    // Q23 ranking window (top-2 per group)
    sameSql("q23_window_rank",
      """SELECT n_regionkey, n_name, rn FROM (
        |  SELECT n_regionkey, n_name,
        |    CAST(row_number() OVER (PARTITION BY n_regionkey
        |      ORDER BY n_name, n_nationkey) AS BIGINT) AS rn
        |  FROM nation) x
        |WHERE rn <= 2 ORDER BY n_regionkey, rn""".stripMargin),
    // Q23b lead/lag window navigation (inter-event gaps per user)
    sameSql("q23_lag_lead",
      """SELECT user_id, event_id,
        |  event_id - (lag(event_id) OVER w) AS gap_prev,
        |  (lead(event_id) OVER w) - event_id AS gap_next
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
        |ORDER BY user_id, event_id LIMIT 100""".stripMargin),
    // Q23c ntile bucketing
    sameSql("q23_ntile",
      """SELECT b, count(*) AS cnt, min(o_orderkey) AS min_key FROM (
        |  SELECT o_orderkey, CAST(ntile(4) OVER (ORDER BY o_totalprice,
        |    o_orderkey) AS BIGINT) AS b
        |  FROM orders) t
        |GROUP BY b ORDER BY b""".stripMargin),
    // Q23d first/last value over a frame
    sameSql("q23_first_last",
      """SELECT n_regionkey,
        |  first_value(n_name) OVER w AS first_name,
        |  last_value(n_name) OVER (PARTITION BY n_regionkey ORDER BY n_name
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_name
        |FROM nation
        |WINDOW w AS (PARTITION BY n_regionkey ORDER BY n_name)
        |ORDER BY n_regionkey, first_name, last_name LIMIT 50""".stripMargin),
    // Q7b statistical aggregates (sample stddev/variance, correlation)
    sameSql("q07_stats_ext",
      """SELECT round(stddev_samp(l_quantity), 4) AS sd_qty,
        |  round(var_samp(l_quantity), 4) AS var_qty,
        |  round(corr(l_quantity, l_extendedprice), 4) AS corr_qty_price
        |FROM lineitem""".stripMargin),
    // Q7c argmin/argmax-style aggregates (dialect: max_by vs arg_max)
    dialect("q07_arg_minmax",
      """SELECT max_by(o_orderkey, o_totalprice) AS top_order,
        |  min_by(o_orderkey, o_totalprice) AS bottom_order FROM orders""".stripMargin,
      """SELECT arg_max(o_orderkey, o_totalprice) AS top_order,
        |  arg_min(o_orderkey, o_totalprice) AS bottom_order FROM orders""".stripMargin),
    // Q24 date_trunc hour bucketing (ns-timestamp events table)
    dialect("q24_hour_bucket",
      """SELECT date_format(date_trunc('HOUR', ts), 'yyyy-MM-dd HH:mm:ss') AS h, count(*) AS cnt
        |FROM events GROUP BY 1 ORDER BY h""".stripMargin,
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS h, count(*) AS cnt
        |FROM events GROUP BY 1 ORDER BY h""".stripMargin),
    // Q25 strftime/date_format partition keys
    dialect("q25_date_format",
      """SELECT date_format(o_orderdate, 'yyyy-MM-dd') AS d, count(*) AS cnt
        |FROM orders GROUP BY 1 ORDER BY d""".stripMargin,
      """SELECT strftime(o_orderdate, '%Y-%m-%d') AS d, count(*) AS cnt
        |FROM orders GROUP BY 1 ORDER BY d""".stripMargin),
    // Q26 CAST/arithmetic (explicit floor: DuckDB CAST(double AS int) rounds)
    sameSql("q26_cast_floor",
      "SELECT CAST(floor(avg(l_quantity)) AS BIGINT) AS avg_qty_floor FROM lineitem"),
    // Q27 COALESCE / NULLIF
    sameSql("q27_coalesce",
      """SELECT coalesce(nullif(event_type, 'error'), 'ERR') AS et, count(*) AS cnt
        |FROM events GROUP BY 1 ORDER BY et""".stripMargin),
    // Q28 JSON extraction
    dialect("q28_json_extract",
      "SELECT count(*) AS cnt FROM events WHERE CAST(get_json_object(props, '$.k') AS BIGINT) > 50",
      "SELECT count(*) AS cnt FROM events WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) > 50"),
    // Q29 string functions
    sameSql("q29_string_fns",
      """SELECT count(*) AS cnt FROM part
        |WHERE length(p_name) > 9 AND lower(p_type) LIKE '%m%' AND upper(p_brand) LIKE 'BRAND#%'""".stripMargin),
    // Q29b regexp extraction (first word of the type column); Spark string
    // literals eat backslashes, DuckDB's don't — same regex, two spellings
    dialect("q29_regexp_extract",
      """SELECT regexp_extract(p_type, '^(\\w+)', 1) AS family, count(*) AS cnt
        |FROM part GROUP BY 1 ORDER BY family""".stripMargin,
      """SELECT regexp_extract(p_type, '^(\w+)', 1) AS family, count(*) AS cnt
        |FROM part GROUP BY 1 ORDER BY family""".stripMargin),
    // Q30 hex/unhex/md5 round trip (binary length spelling differs)
    dialect("q30_hex_unhex",
      "SELECT count(*) AS cnt FROM part WHERE length(unhex(md5(p_name))) = 16",
      "SELECT count(*) AS cnt FROM part WHERE octet_length(unhex(md5(p_name))) = 16"),
    // Q31 array explode/unnest
    dialect("q31_explode",
      "SELECT count(*) AS cnt FROM (SELECT explode(embedding) AS e FROM embeddings) t",
      "SELECT count(*) AS cnt FROM (SELECT unnest(embedding) AS e FROM embeddings) t"),
    // Q32 struct values: build, nest, project fields back out
    dialect("q32_struct",
      """SELECT s.k AS k, s.nm AS nm FROM
        |(SELECT named_struct('k', n_nationkey, 'nm', n_name) AS s FROM nation) t
        |ORDER BY k LIMIT 10""".stripMargin,
      """SELECT s.k AS k, s.nm AS nm FROM
        |(SELECT struct_pack(k := n_nationkey, nm := n_name) AS s FROM nation) t
        |ORDER BY k LIMIT 10""".stripMargin),
    // Q33 range generator
    sameSql("q33_range",
      "SELECT count(*) AS cnt FROM range(2049)"),
    // Q40 HAVING
    sameSql("q40_having",
      """SELECT o_custkey, count(*) AS cnt FROM orders GROUP BY o_custkey
        |HAVING count(*) > 5 ORDER BY cnt DESC, o_custkey LIMIT 20""".stripMargin),
    // Q41 ROLLUP (explicit NULLS FIRST — engine defaults differ)
    sameSql("q41_rollup",
      """SELECT l_returnflag, l_linestatus, count(*) AS cnt FROM lineitem
        |GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST, cnt""".stripMargin),
    // Q41b CUBE
    sameSql("q41_cube",
      """SELECT l_returnflag, l_linestatus, count(*) AS cnt FROM lineitem
        |GROUP BY CUBE(l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST, cnt""".stripMargin)
  )
}
