package graft

import graft.operators.{Logs, Metrics, Traces}
import org.apache.spark.sql.functions._

/** Log-template mining, cross-series metric aggregation, and span latency
  * percentiles: hand-computed goldens + shape assertions. */
class LogsSpec extends SparkTestBase {

  private val fx = "src/test/resources/otlp"

  test("logTemplates: parameter positions mask at the distinct budget, " +
    "hand-computed templates and counts") {
    import spark.implicits._
    val logs = Seq(
      "Accepted connection from 10.0.0.1 port 443",
      "Accepted connection from 10.0.0.2 port 8080",
      "Accepted connection from 10.0.0.3 port 443",
      "Accepted connection from 10.0.0.4 port 9000",
      "Accepted connection from 10.0.0.5 port 22",
      "Disk usage at 91 percent",
      "Disk usage at 92 percent",
      "Disk usage at 93 percent",
      "Disk usage at 97 percent",
      "Service started", "Service started", "Service started",
      "   ", // whitespace-only: filtered
      null).map(Tuple1(_)).toDF("body")
    val got = Logs.logTemplates(logs, maxDistinct = 3).collect()
      .map(r => r.getString(0) -> (r.getInt(1), r.getLong(2))).toMap
    assert(got == Map(
      "Accepted connection from <*> port <*>" -> ((6, 5L)),
      "Disk usage at <*> percent" -> ((5, 4L)),
      "Service started" -> ((2, 3L))), got)
  }

  test("reassembleMultiline: unindented Java frames continue; an English " +
    "'at ...' head keeps its own record") {
    import spark.implicits._
    val logs = Seq(
      (1L, "boom happened"),
      (2L, "at com.example.A.b(A.java:1)"), // frame shape, no indent
      (3L, "  at com.example.C.d(C.java:2)"), // indented frame
      (4L, "at capacity, shedding load") // English head — NOT a frame
    ).toDF("time_unix_nano", "body").withColumn("service_name", lit("s"))
    val out = Logs.reassembleMultiline(logs)
      .orderBy("time_unix_nano").collect()
    assert(out.length == 2, out.mkString("\n"))
    assert(out(0).getAs[Long]("n_lines") == 3)
    assert(out(1).getAs[String]("body") == "at capacity, shedding load")
    assert(out(1).getAs[Long]("n_lines") == 1)
  }

  test("logTemplates: a position at EXACTLY the budget stays constant " +
    "(> not >=), and token-count groups never mix") {
    import spark.implicits._
    val logs = Seq(
      "job a done", "job b done", "job c done",          // 3 distinct = budget
      "job a done now", "job b done now", "job c done now",
      "job d done now", "job e done now")                 // 5 distinct > budget
      .map(Tuple1(_)).toDF("body")
    val got = Logs.logTemplates(logs, maxDistinct = 3).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    // n=3 group: position 2 has 3 distinct = budget -> NOT masked
    assert(got("job a done") == 1L && got("job b done") == 1L)
    // n=4 group: 5 distinct > budget -> masked; groups independent
    assert(got("job <*> done now") == 5L, got)
  }

  test("logTemplates plan: corpus is never self-joined; the variable-" +
    "position table broadcasts") {
    import spark.implicits._
    val logs = (0 until 100).map(i => s"evt $i fired").map(Tuple1(_)).toDF("body")
    val plan = Logs.logTemplates(logs).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), s"corpus-sized join:\n$plan")
  }

  test("templateParams: slot values + counts for one template") {
    import spark.implicits._
    val logs = Seq(
      "Accepted connection from 10.0.0.1 port 443",
      "Accepted connection from 10.0.0.2 port 443",
      "Accepted connection from 10.0.0.1 port 22",
      "Rejected connection from 10.0.0.9 port 443", // different template
      "Accepted connection from 10.0.0.1").map(Tuple1(_)).toDF("body")
    val got = Logs.templateParams(logs,
        "Accepted connection from <*> port <*>").collect()
      .map(r => (r.getInt(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == Map(
      (3, "10.0.0.1") -> 2L, (3, "10.0.0.2") -> 1L,
      (5, "443") -> 2L, (5, "22") -> 1L), got)
  }

  test("matchTemplates: most-specific wins, novel shapes null, " +
    "map-only, and attaches to a STREAM in append mode") {
    import spark.implicits._
    val templates = Seq(
      "Accepted connection from <*> port <*>",
      "Accepted connection from <*> port 443", // more specific: 1 slot
      "Disk usage at <*> percent")
    val logs = Seq(
      "Accepted connection from 10.0.0.1 port 443",  // specific arm wins
      "Accepted connection from 10.0.0.2 port 8080", // general arm
      "Disk usage at 93 percent",
      "totally novel shape").map(Tuple1(_)).toDF("body")
    val got = Logs.matchTemplates(logs, templates).collect()
      .map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(got("Accepted connection from 10.0.0.1 port 443")
      .contains("Accepted connection from <*> port 443"))
    assert(got("Accepted connection from 10.0.0.2 port 8080")
      .contains("Accepted connection from <*> port <*>"))
    assert(got("Disk usage at 93 percent")
      .contains("Disk usage at <*> percent"))
    assert(got("totally novel shape").isEmpty)
    val plan = Logs.matchTemplates(logs, templates)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("Join"),
      s"classification must be map-only:\n$plan")
    // stateless => valid on an unaggregated APPEND-mode stream
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[String]
    val q = Logs.matchTemplates(in.toDF().toDF("body"), templates)
      .writeStream.format("memory").queryName("tmplmatch")
      .outputMode("append").start()
    in.addData("Disk usage at 97 percent", "noise")
    q.processAllAvailable(); q.stop()
    val sRows = spark.table("tmplmatch").collect()
      .map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(sRows("Disk usage at 97 percent").contains("Disk usage at <*> percent"))
    assert(sRows("noise").isEmpty)
  }

  test("matchTemplates cutover: join path gives byte-identical results to " +
    "the cascade, including cross-layout tie-breaks") {
    import spark.implicits._
    val templates = Seq(
      "Accepted connection from <*> port <*>",
      "Accepted connection from <*> port 443",
      "Disk usage at <*> percent",
      // two layouts sharing token count 3 — tie on wildcard count for
      // "fixed fixed x"; lexical min template must win on BOTH paths
      "fixed <*> x",
      "<*> fixed x")
    val logs = Seq(
      "Accepted connection from 10.0.0.1 port 443",
      "Accepted connection from 10.0.0.2 port 8080",
      "Disk usage at 93 percent",
      "fixed fixed x",
      "fixed zzz x",
      "aaa fixed x",
      "totally novel shape",
      "").map(Tuple1(_)).toDF("body")
    def run(limit: Int) = Logs.matchTemplates(logs, templates,
        cascadeLimit = limit).collect()
      .map(r => r.getString(0) -> Option(r.getString(1))).toMap
    val cascade = run(limit = 10000)
    val joined = run(limit = 0)
    assert(cascade == joined, s"paths diverge:\n$cascade\n$joined")
    assert(joined("fixed fixed x").contains("<*> fixed x")) // lexical min
    assert(joined("fixed zzz x").contains("fixed <*> x"))
    assert(joined("totally novel shape").isEmpty)
    // a template whose whitespace is not single spaces still matches on
    // the join path (token-wise, like the cascade) and emits its ORIGINAL
    // string
    val tabTmpl = "disk\tusage <*> percent"
    val tabbed = Logs.matchTemplates(
        Seq("disk usage 93 percent").map(Tuple1(_)).toDF("body"),
        Seq(tabTmpl), cascadeLimit = 0).collect()
      .map(r => Option(r.getString(1))).head
    assert(tabbed.contains(tabTmpl), tabbed)
    // a wide layout spread (>16 wildcard layouts sharing one token count)
    // classifies on the join path too — the old cascade fallback is lifted
    // (VERDICT r10 #4); one join per layout slot
    val manyLayouts = (0 until 17).map { p =>
      (0 until 20).map(i => if (i == p) "<*>" else s"w$i").mkString(" ")
    }
    val body20 = (0 until 20).map(i => if (i == 3) "XX" else s"w$i")
      .mkString(" ")
    val fb = Logs.matchTemplates(
        Seq(body20).map(Tuple1(_)).toDF("body"), manyLayouts,
        cascadeLimit = 0).collect().map(r => Option(r.getString(1))).head
    assert(fb.contains(manyLayouts(3)), fb)
  }

  test("matchTemplates 32-layout 5k-template set: join-only classify " +
    "(no cascade, one broadcast join per layout slot, no shuffle)") {
    import spark.implicits._
    // 32 wildcard layouts sharing ONE token count (33): layout j wildcards
    // position j; ~156 templates per layout distinguished by a key token
    val templates = (0 until 5000).map { i =>
      val j = i % 32
      (0 until 33).map(p =>
        if (p == j) "<*>" else if (p == 32) s"k${i / 32}" else s"w$p")
        .mkString(" ")
    }
    val logs = Seq(
      // matches template i=35 (layout j=3, key k1)
      (0 until 33).map(p =>
        if (p == 3) "FILL" else if (p == 32) "k1" else s"w$p").mkString(" "),
      "unmatched shape").map(Tuple1(_)).toDF("body")
    val out = Logs.matchTemplates(logs, templates)
    val plan = out.queryExecution.executedPlan.toString
    assert("BroadcastHashJoin".r.findAllIn(plan).size == 32,
      s"expected one broadcast join per layout slot:\n${plan.take(4000)}")
    assert(!plan.replace("BroadcastExchange", "BX").contains("Exchange"),
      "classify must not shuffle the corpus")
    val got = out.collect()
      .map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(got(logs.collect()(0).getString(0)).contains(templates(35)),
      got)
    assert(got("unmatched shape").isEmpty)
  }

  test("matchTemplates large sets: broadcast-hash-join classify, " +
    "one join for a mined (single-layout) set, no shuffle") {
    import spark.implicits._
    // mined shape: every template shares its token count's wildcard layout
    val templates = (0 until 1200).map(i => s"evt$i code <*> from host <*>")
    val logs = ((0 until 5000).map(i =>
        s"evt${i % 1200} code ${i % 7} from host web-${i % 13}") ++
      Seq("unmined shape entirely", "evt3 code x from HOST y"))
      .map(Tuple1(_)).toDF("body")
    val out = Logs.matchTemplates(logs, templates)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"large-set classify must be a broadcast hash join:\n$plan")
    assert("BroadcastHashJoin".r.findAllIn(plan).size == 1,
      "a single-layout template set must compile to exactly one join")
    assert(!plan.replace("BroadcastExchange", "BX").contains("Exchange"),
      s"classify must not shuffle the corpus:\n$plan")
    val rows = out.collect()
    assert(rows.length == 5002)
    val got = rows.map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(got("evt7 code 0 from host web-7")
      .contains("evt7 code <*> from host <*>"))
    assert(got("unmined shape entirely").isEmpty)
    assert(got("evt3 code x from HOST y").isEmpty) // constant pos differs
  }

  test("matchTemplates join path attaches to an APPEND-mode stream " +
    "(stream-static broadcast join, no state store)") {
    import spark.implicits._
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    val templates = (0 until 300).map(i => s"evt$i code <*> from host <*>")
    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[String]
    val q = Logs.matchTemplates(in.toDF().toDF("body"), templates)
      .writeStream.format("memory").queryName("tmpljoinstream")
      .outputMode("append").start()
    in.addData("evt42 code 500 from host web-1", "noise")
    q.processAllAvailable(); q.stop()
    val got = spark.table("tmpljoinstream").collect()
      .map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(got("evt42 code 500 from host web-1")
      .contains("evt42 code <*> from host <*>"), got)
    assert(got("noise").isEmpty)
  }

  test("logCountMetric: count-connector points in the metrics_sum shape, " +
    "composable with deltaToCumulative and sumBy") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val logs = Seq(
      ("api", "INFO", ts("2024-01-01 00:00:01")),
      ("api", "INFO", ts("2024-01-01 00:00:09")),
      ("api", "WARN", ts("2024-01-01 00:00:05")),
      ("api", "INFO", ts("2024-01-01 00:00:12")), // next 10 s window
      ("db", null: String, ts("2024-01-01 00:00:03")))
      .toDF("service_name", "severity_text", "time_unix_nano")
    val pts = Logs.logCountMetric(logs, windowSec = 10)
    val got = pts.collect().map(r =>
      (r.getAs[String]("service_name"), r.getAs[String]("metric_attributes"),
        r.getAs[java.sql.Timestamp]("time_unix_nano").toString) ->
        r.getAs[Long]("int_value")).toMap
    assert(got == Map(
      ("api", """{"severity_text":"INFO"}""", "2024-01-01 00:00:00.0") -> 2L,
      ("api", """{"severity_text":"INFO"}""", "2024-01-01 00:00:10.0") -> 1L,
      ("api", """{"severity_text":"WARN"}""", "2024-01-01 00:00:00.0") -> 1L,
      ("db", """{"severity_text":"UNSPECIFIED"}""", "2024-01-01 00:00:00.0")
        -> 1L), got)
    // composition: the emitted delta points convert to running sums and
    // collapse across severities like any metrics_sum frame
    val cum = Metrics.deltaToCumulative(pts).collect()
      .filter(r => r.getAs[String]("metric_attributes").contains("INFO") &&
        r.getAs[String]("service_name") == "api")
      .sortBy(_.getAs[java.sql.Timestamp]("time_unix_nano").getTime)
      .map(_.getAs[Long]("int_value")).toSeq
    assert(cum == Seq(2L, 3L), cum)
    val sums = Metrics.sumBy(pts, by = Seq("name", "service_name")).collect()
      .map(r => (r.getAs[String]("service_name"),
        r.getAs[java.sql.Timestamp]("time_unix_nano").toString) ->
        r.getAs[Double]("value")).toMap
    assert(sums == Map(
      ("api", "2024-01-01 00:00:00.0") -> 3.0,
      ("api", "2024-01-01 00:00:10.0") -> 1.0,
      ("db", "2024-01-01 00:00:00.0") -> 1.0), sums)
  }

  test("templateDrift: union-mined rule, per-side frequencies, JS " +
    "contributions — hand-computed golden") {
    import spark.implicits._
    // 3 distinct values at position 3 within the n=4 group => parameter
    // slot under maxDistinct=2; the n=2 shape stays fully constant
    val a = Seq("job started on host1", "job started on host2",
      "disk full").map(Tuple1(_)).toDF("body")
    val b = Seq("job started on host3", "disk full", "disk full")
      .map(Tuple1(_)).toDF("body")
    val got = Logs.templateDrift(a, b, maxDistinct = 2).collect()
      .map(r => r.getString(0) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5),
          r.getDouble(6))).toMap
    def js(p: Double, q: Double): Double = {
      val m = (p + q) / 2
      def t(x: Double) = if (x > 0) x * math.log(x / m) else 0.0
      BigDecimal((t(p) + t(q)) / 2)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    assert(got == Map(
      "job started on <*>" ->
        ((2L, 1L, 0.666667, 0.333333, js(2.0 / 3, 1.0 / 3))),
      "disk full" ->
        ((1L, 2L, 0.333333, 0.666667, js(1.0 / 3, 2.0 / 3)))), got)
    // total JS over the two templates is symmetric and positive
    assert(got.values.map(_._5).sum > 0)
  }

  test("sumBy collapses replica series per timestamp; replayed rows drop") {
    import spark.implicits._
    val ts = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val ts2 = java.sql.Timestamp.valueOf("2024-01-01 00:00:10")
    val rows = Seq(
      ("qps", "a", ts, Some(1.5), None: Option[Long]),
      ("qps", "b", ts, Some(2.5), None),
      ("qps", "b", ts, Some(2.5), None), // byte-equal replay: dropped
      ("qps", "a", ts2, None, Some(4L)), // int fallback
      ("errs", "a", ts, Some(1.0), None))
      .toDF("name", "service_instance_id", "time_unix_nano",
        "double_value", "int_value")
    val got = Metrics.sumBy(rows).collect()
      .map(r => (r.getString(0), r.getTimestamp(1)) ->
        (r.getDouble(2), r.getLong(3))).toMap
    assert(got == Map(
      ("qps", ts) -> ((4.0, 2L)),
      ("qps", ts2) -> ((4.0, 1L)),
      ("errs", ts) -> ((1.0, 1L))), got)
  }

  test("overTime: aligned windows, avg/min/max/last/count per series, " +
    "replay-safe, ONE exchange") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val rows = Seq(
      ("qps", "i1", ts("2024-01-01 00:00:10"), Some(4.0), None: Option[Long]),
      ("qps", "i1", ts("2024-01-01 00:00:50"), Some(2.0), None),
      ("qps", "i1", ts("2024-01-01 00:00:50"), Some(2.0), None), // replay
      ("qps", "i1", ts("2024-01-01 00:01:10"), None, Some(9L)),  // next win
      ("qps", "i2", ts("2024-01-01 00:00:20"), Some(7.0), None), // other series
      ("qps", "i1", ts("2024-01-01 00:00:30"), None, None))      // no value
      .toDF("name", "service_instance_id", "time_unix_nano",
        "double_value", "int_value")
      .selectExpr("name", "'svc' AS service_name",
        "CAST(NULL AS STRING) AS service_namespace", "service_instance_id",
        "'{}' AS resource_attributes", "'sc' AS scope_name",
        "'{}' AS metric_attributes", "time_unix_nano", "double_value",
        "int_value")
    val df = Metrics.overTime(rows, windowSec = 60)
    // capture pre-execution: after an action AQE prints initial+final plan
    // sections and every node string appears twice
    val p = df.queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(p).size == 1,
      s"overTime: dedup must ride the aggregation's exchange:\n$p")
    val got = df.collect().map(r =>
      (r.getAs[String]("name"), r.getAs[String]("service_instance_id"),
        r.getAs[java.sql.Timestamp]("window_start").toString) ->
        (r.getAs[Double]("avg_value"), r.getAs[Double]("min_value"),
          r.getAs[Double]("max_value"), r.getAs[Double]("last_value"),
          r.getAs[Long]("n_points"))).toMap
    assert(got == Map(
      ("qps", "i1", "2024-01-01 00:00:00.0") -> ((3.0, 2.0, 4.0, 2.0, 2L)),
      ("qps", "i1", "2024-01-01 00:01:00.0") -> ((9.0, 9.0, 9.0, 9.0, 1L)),
      ("qps", "i2", "2024-01-01 00:00:00.0") -> ((7.0, 7.0, 7.0, 7.0, 1L))),
      got)
  }

  test("increase: counter resets restart from the new value; gauge sums " +
    "difference plainly; first point pairs with nothing") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val rows = Seq(
      // monotonic counter: 100 -> 190 (+90), reset to 30 (+30), 50 (+20)
      ("ctr", ts("2024-01-01 00:00:00"), 100.0, true),
      ("ctr", ts("2024-01-01 00:00:40"), 190.0, true),
      ("ctr", ts("2024-01-01 00:01:20"), 30.0, true),
      ("ctr", ts("2024-01-01 00:01:50"), 50.0, true),
      // gauge-like sum: decrease is a real negative delta
      ("gauge", ts("2024-01-01 00:00:10"), 10.0, false),
      ("gauge", ts("2024-01-01 00:00:30"), 4.0, false))
      .toDF("name", "time_unix_nano", "double_value", "is_monotonic")
      .selectExpr("name", "'svc' AS service_name",
        "CAST(NULL AS STRING) AS service_namespace", "'i1' AS service_instance_id",
        "'{}' AS resource_attributes", "'sc' AS scope_name",
        "'{}' AS metric_attributes", "time_unix_nano",
        "double_value", "CAST(NULL AS BIGINT) AS int_value", "is_monotonic")
    val got = Metrics.increase(rows, windowSec = 60).collect()
      .map(r => (r.getAs[String]("name"),
        r.getAs[java.sql.Timestamp]("window_start").toString) ->
        (r.getAs[Double]("increase"), r.getAs[Long]("n_pairs"))).toMap
    assert(got == Map(
      ("ctr", "2024-01-01 00:00:00.0") -> ((90.0, 1L)),
      ("ctr", "2024-01-01 00:01:00.0") -> ((50.0, 2L)),
      ("gauge", "2024-01-01 00:00:00.0") -> ((-6.0, 1L))), got)
  }

  test("quantileBy: exact interpolated cross-replica quantile per timestamp") {
    import spark.implicits._
    val ts0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val rows = Seq(("qps", "i1", 10.0), ("qps", "i2", 20.0),
      ("qps", "i3", 40.0), ("qps", "i4", 100.0))
      .toDF("name", "service_instance_id", "double_value")
      .selectExpr("name", "service_instance_id", "double_value",
        "CAST(NULL AS BIGINT) AS int_value",
        s"TIMESTAMP '2024-01-01 00:00:00' AS time_unix_nano")
    val r = Metrics.quantileBy(rows, q = 0.5).collect().head
    // quantile_cont over (10,20,40,100): p50 = 30 (midpoint interpolation)
    assert(r.getAs[String]("name") == "qps" &&
      r.getAs[java.sql.Timestamp]("time_unix_nano") == ts0 &&
      r.getAs[Double]("value") == 30.0 &&
      r.getAs[Long]("n_series") == 4L, r)
  }

  test("staleSeries: last-point age vs a fixed as-of; fresh series and " +
    "replays excluded") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val rows = Seq(
      ("fresh", ts("2024-01-01 00:09:00"), 5.0),
      ("stale", ts("2024-01-01 00:01:00"), 7.0),
      ("stale", ts("2024-01-01 00:01:00"), 7.0), // replay: n_points once
      ("stale", ts("2024-01-01 00:00:30"), 3.0))
      .toDF("name", "time_unix_nano", "double_value")
      .selectExpr("name", "'svc' AS service_name",
        "CAST(NULL AS STRING) AS service_namespace", "'i1' AS service_instance_id",
        "'{}' AS resource_attributes", "'sc' AS scope_name",
        "'{}' AS metric_attributes", "time_unix_nano", "double_value",
        "CAST(NULL AS BIGINT) AS int_value")
    val got = Metrics.staleSeries(rows,
        asOf = java.sql.Timestamp.valueOf("2024-01-01 00:10:00"),
        stalenessSec = 300).collect()
    assert(got.length == 1, got.mkString("; "))
    val r = got.head
    assert(r.getAs[String]("name") == "stale" &&
      r.getAs[Double]("last_value") == 7.0 &&
      r.getAs[Long]("n_points") == 2L &&
      r.getAs[Long]("age_s") == 540L, r)
  }

  test("volumeAnomaly: per-service across-window z-scores; single-window " +
    "services report null z, never anomalies") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val logs = (Seq.fill(1)(ts("2024-01-01 00:00:05")) ++
      Seq.fill(1)(ts("2024-01-01 00:01:05")) ++
      Seq.fill(4)(ts("2024-01-01 00:02:05"))).map(("a", _)) ++
      Seq(("b", ts("2024-01-01 00:00:30")))
    val df = Logs.volumeAnomaly(
      logs.toDF("service_name", "time_unix_nano"), windowSec = 60,
      zThreshold = 1.0)
    val got = df.collect().map(r =>
      (r.getAs[String]("service_name"),
        r.getAs[java.sql.Timestamp]("window_start").toString) ->
        (r.getAs[Long]("n_logs"), Option(r.getAs[Any]("z")),
          r.getAs[Boolean]("anomaly"))).toMap
    // svc a counts 1,1,4: mean 2, sample sd sqrt(3)=1.7321
    assert(got == Map(
      ("a", "2024-01-01 00:00:00.0") -> ((1L, Some(-0.5774), false)),
      ("a", "2024-01-01 00:01:00.0") -> ((1L, Some(-0.5774), false)),
      ("a", "2024-01-01 00:02:00.0") -> ((4L, Some(1.1547), true)),
      ("b", "2024-01-01 00:00:00.0") -> ((1L, None, false))), got)
  }

  test("ratioBy: vector matching — shared timestamps only, zero/absent " +
    "denominators drop, replay counted once") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val rows = Seq(
      ("errs", ts("2024-01-01 00:00:00"), 1.0),
      ("reqs", ts("2024-01-01 00:00:00"), 4.0),
      ("reqs", ts("2024-01-01 00:00:00"), 4.0), // replay
      ("errs", ts("2024-01-01 00:01:00"), 2.0), // no denominator: drops
      ("reqs", ts("2024-01-01 00:02:00"), 5.0), // no numerator: drops
      ("errs", ts("2024-01-01 00:03:00"), 1.0),
      ("reqs", ts("2024-01-01 00:03:00"), 0.0)) // zero denominator: drops
      .toDF("name", "time_unix_nano", "double_value")
      .selectExpr("name", "time_unix_nano", "double_value",
        "CAST(NULL AS BIGINT) AS int_value")
    val got = Metrics.ratioBy(rows, "errs", "reqs").collect()
      .map(r => r.getAs[java.sql.Timestamp]("time_unix_nano").toString ->
        r.getAs[Double]("ratio")).toMap
    assert(got == Map("2024-01-01 00:00:00.0" -> 0.25), got)
  }

  test("ratioGroupLeft: numerator keeps its full series, each sample " +
    "divided by the on()-matched denominator; ignoring() complements") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    def row(name: String, svc: String, attrs: String, t: String, v: Double) =
      (name, svc, null: String, null: String, "{}", "sc", attrs, ts(t), v)
    val rows = Seq(
      row("errs", "a", """{"path":"/x"}""", "2024-01-01 00:00:00", 1.0),
      row("errs", "a", """{"path":"/y"}""", "2024-01-01 00:00:00", 3.0),
      row("reqs", "a", null, "2024-01-01 00:00:00", 8.0),
      row("reqs", "a", null, "2024-01-01 00:00:00", 8.0), // replay
      row("errs", "b", """{"path":"/x"}""", "2024-01-01 00:00:00", 2.0),
      row("reqs", "b", null, "2024-01-01 00:00:00", 0.0), // zero den: drops
      row("errs", "a", """{"path":"/x"}""", "2024-01-01 00:01:00", 5.0)) // no den
      .toDF("name", "service_name", "service_namespace",
        "service_instance_id", "resource_attributes", "scope_name",
        "metric_attributes", "time_unix_nano", "double_value")
      .selectExpr("*", "CAST(NULL AS BIGINT) AS int_value")
    val got = Metrics.ratioGroupLeft(rows, "errs", "reqs",
        on = Seq("service_name")).collect()
      .map(r => (r.getAs[String]("metric_attributes"),
        r.getAs[Double]("num"), r.getAs[Double]("den"),
        r.getAs[Double]("ratio"))).toSet
    assert(got == Set(("""{"path":"/x"}""", 1.0, 8.0, 0.125),
      ("""{"path":"/y"}""", 3.0, 8.0, 0.375)), got)
    // ignoring(metric_attributes) = on(every other label column): the two
    // path series collapse into one numerator sum — (1+3)/8
    val ign = Metrics.ratioIgnoring(rows, "errs", "reqs",
        ignored = Seq("metric_attributes")).collect()
      .map(r => (r.getAs[String]("service_name"), r.getAs[Double]("ratio")))
    assert(ign.toSeq == Seq(("a", 0.5)), ign.toSeq)
    intercept[IllegalArgumentException] {
      Metrics.ratioIgnoring(rows, "errs", "reqs", Seq("not_a_label"))
    }
  }

  test("deriv/predictLinear/topk/fraction edges: single-point windows " +
    "report null slope, fraction clamps at bucket edges, ties break on " +
    "series identity") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    def sums(rows: Seq[(String, String, java.sql.Timestamp, Double)]) =
      rows.toDF("name", "service_instance_id", "time_unix_nano",
          "double_value")
        .selectExpr("name", "'svc' AS service_name",
          "CAST(NULL AS STRING) AS service_namespace", "service_instance_id",
          "'{}' AS resource_attributes", "'sc' AS scope_name",
          "'{}' AS metric_attributes", "time_unix_nano", "double_value",
          "CAST(NULL AS BIGINT) AS int_value")
    // one point in the window: regression undefined -> null slope/predict
    val one = sums(Seq(("g", "i1", ts("2024-01-01 00:00:10"), 5.0)))
    assert(Metrics.deriv(one, 300).collect()
      .map(r => Option(r.getAs[Any]("deriv_per_sec"))).toSeq == Seq(None))
    assert(Metrics.predictLinear(one, 300, 60).collect()
      .map(r => Option(r.getAs[Any]("predicted"))).toSeq == Seq(None))
    // two points: slope exact, centered extrapolation exact
    val two = sums(Seq(("g", "i1", ts("2024-01-01 00:00:00"), 10.0),
      ("g", "i1", ts("2024-01-01 00:01:00"), 40.0)))
    val p = Metrics.predictLinear(two, 300, 0).collect().head
    // slope 0.5/s; predict at window end (t0+300): 10 + 0.5*300 = 160
    assert(p.getAs[Double]("predicted") == 160.0, p)
    // topk ties: equal values resolve by series identity ascending
    val tied = sums(Seq(("g", "i2", ts("2024-01-01 00:00:00"), 7.0),
      ("g", "i1", ts("2024-01-01 00:00:00"), 7.0),
      ("g", "i3", ts("2024-01-01 00:00:00"), 9.0)))
    val tk = Metrics.topkSeries(tied, k = 2).collect()
      .map(r => (r.getAs[Int]("rnk"), r.getAs[String]("service_instance_id")))
      .sortBy(_._1)
    assert(tk.toSeq == Seq((1, "i3"), (2, "i1")), tk.toSeq)
    // fraction: x below the first bound interpolates from the zero anchor;
    // x past the last finite bound reports the finite mass share
    val hists = Seq(
      (Seq(4L, 4L, 2L), Seq(10.0, 20.0))) // +Inf bucket holds 2
      .toDF("bucket_counts", "explicit_bounds")
    def frac(x: Double) = Metrics.histogramFraction(hists, x)
      .collect().head.getAs[Double]("fraction")
    assert(frac(5.0) == 0.2, frac(5.0))    // half of the first bucket's 4/10
    assert(frac(15.0) == 0.6, frac(15.0))  // 4 + half of 4, over 10
    assert(frac(999.0) == 0.8, frac(999.0)) // finite mass 8/10
    // x below the zero anchor contributes nothing — even when the first
    // bound is exactly 0 (the zero-width rule must not credit a bucket
    // x never reaches); x at the zero-width edge covers it fully
    val zb = Seq((Seq(4L, 4L, 2L), Seq(0.0, 10.0)))
      .toDF("bucket_counts", "explicit_bounds")
    def fz(x: Double) = Metrics.histogramFraction(zb, x)
      .collect().head.getAs[Double]("fraction")
    assert(fz(-1.0) == 0.0, fz(-1.0))
    assert(fz(0.0) == 0.4, fz(0.0))
    intercept[IllegalArgumentException] {
      Metrics.histogramFraction(zb, Double.PositiveInfinity)
    }
  }

  test("spanPercentiles: interpolated p50/p95/p99 per service, replay-safe") {
    import spark.implicits._
    val spans = (1 to 4).map(i =>
      ("t1", s"s$i", "svc", i.toLong * 100)) ++ Seq(
      ("t1", "s1", "svc", 100L)) // replay of s1
    val df = spans.toDF("trace_id", "span_id", "service_name",
      "duration_time_unix_nano")
    val r = Traces.spanPercentiles(df).collect().head
    assert(r.getAs[Long]("n_spans") == 4L)
    // durations 100,200,300,400: p50 = 250, p95 = 385, p99 = 397
    assert(r.getAs[Double]("p50_ns") == 250.0, r)
    assert(r.getAs[Double]("p95_ns") == 385.0, r)
    assert(r.getAs[Double]("p99_ns") == 397.0, r)
    assert(r.getAs[Long]("max_ns") == 400L)
  }

  test("errorRate: number wins over a mismatched ERROR text (the 13-WARN " +
    "case stays out), aliases and FATAL count in, ratio per window") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val logs = Seq(
      ("svc", ts("2024-01-01 00:00:10"), Some(13), "ERROR"), // WARN by number
      ("svc", ts("2024-01-01 00:00:20"), None, "err"), // alias -> ERROR
      ("svc", ts("2024-01-01 00:00:30"), Some(21), null: String), // FATAL
      ("svc", ts("2024-01-01 00:00:40"), Some(9), "Information"),
      ("svc", ts("2024-01-01 00:01:30"), None, "strange")) // next window
      .toDF("service_name", "time_unix_nano", "severity_number",
        "severity_text")
      .withColumn("severity_number", col("severity_number").cast("int"))
    val got = Logs.errorRate(logs, windowSec = 60).collect()
      .map(r => r.getAs[java.sql.Timestamp]("window_start").toString ->
        ((r.getAs[Long]("n_logs"), r.getAs[Long]("n_errors"),
          r.getAs[Double]("error_ratio")))).toMap
    assert(got == Map(
      "2024-01-01 00:00:00.0" -> ((4L, 2L, 0.5)),
      "2024-01-01 00:01:00.0" -> ((1L, 0L, 0.0))), got)
  }

  test("spanJoin: context-less logs are excluded before the join, " +
    "span-less context keeps the log with matched=false") {
    import spark.implicits._
    val t = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val logs = Seq(
      (t, "svc", "ERROR", "call failed", "t1", "s1"),
      (t, "svc", "WARN", "expired trace", "t9", "s9"),
      (t, "svc", "INFO", "no context", null: String, null: String))
      .toDF("time_unix_nano", "service_name", "severity_text", "body",
        "trace_id", "span_id")
    // the span row replayed: must not duplicate its correlated log line
    val spans = Seq(("t1", "s1", "GET /x", "svc-b", 500L, 2),
        ("t1", "s1", "GET /x", "svc-b", 500L, 2))
      .toDF("trace_id", "span_id", "name", "service_name",
        "duration_time_unix_nano", "status_code")
    val rows = Logs.spanJoin(logs, spans).collect()
    assert(rows.length == 2,
      s"replayed span row duplicated output: ${rows.toSeq}")
    val got = rows.map(r => r.getAs[String]("body") ->
        ((r.getAs[Boolean]("matched"), Option(r.getAs[String]("span_name")),
          Option(r.getAs[java.lang.Long]("span_duration_ns"))))).toMap
    assert(got == Map(
      "call failed" -> ((true, Some("GET /x"), Some(500L))),
      "expired trace" -> ((false, None, None))), got)
  }
}
