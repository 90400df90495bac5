package graft

import graft.operators.Metrics
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Replay-insensitivity sweep for the round-11 metric window operators:
  * the seal export is at-least-once, so EVERY operator must produce
  * byte-identical results when fed byte-equal replayed rows — the
  * contract `Replay.dedupWithin` implements and each operator wires to
  * its own shuffle keys. A sweep (rather than per-op goldens) pins that
  * no future operator edit drops the dedup or keys it uselessly. */
class MetricsReplaySpec extends SparkTestBase {

  private def sums: DataFrame = {
    import spark.implicits._
    val ts0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    (0 until 60).map { i =>
      val inst = s"i${i % 3}"
      val name = if (i % 2 == 0) "qps" else "errs"
      val t = new java.sql.Timestamp(ts0.getTime + (i / 6) * 60000L)
      (name, "svc", null: String, inst, "{}", "sc", "{}", t,
        true, Some((i % 7).toDouble), None: Option[Long], 2)
    }.toDF("name", "service_name", "service_namespace",
      "service_instance_id", "resource_attributes", "scope_name",
      "metric_attributes", "time_unix_nano", "is_monotonic",
      "double_value", "int_value", "aggregation_temporality")
  }

  test("round-11 window operators: replayed byte-equal rows change " +
    "nothing (every dedup actually wired)") {
    val once = sums
    // every 4th row replayed twice more — an aggressive at-least-once mix
    val replayed = once
      .unionAll(once.where(pmod(col("service_instance_id").substr(2, 1)
        .cast("int"), lit(3)) === 0))
      .unionAll(once.limit(5))
    val asOf = java.sql.Timestamp.valueOf("2024-01-01 01:00:00")
    val ops: Seq[(String, DataFrame => DataFrame)] = Seq(
      "resets" -> (Metrics.resets(_, 300)),
      "changes" -> (Metrics.changes(_, 300)),
      "deriv" -> (Metrics.deriv(_, 300)),
      "predictLinear" -> (Metrics.predictLinear(_, 300, 60)),
      "quantileOverTime" -> (Metrics.quantileOverTime(_, 0.5, 300)),
      "deltaOverTime" -> (Metrics.deltaOverTime(_, 300)),
      "topk" -> (Metrics.topkSeries(_, 2)),
      "bottomk" -> (Metrics.bottomkSeries(_, 2)),
      "countValues" -> (Metrics.countValues(_)),
      "avgBy" -> (Metrics.aggregateBy(_, "avg")),
      "maxBy" -> (Metrics.aggregateBy(_, "max")),
      // 45 s windows against 60 s point spacing: real gaps exist, so the
      // pin is non-vacuous
      "gapReport" -> (Metrics.gapReport(_, 45)),
      "ratioGroupLeft" ->
        (Metrics.ratioGroupLeft(_, "errs", "qps", Seq("service_name"))),
      "staleSeries" -> (Metrics.staleSeries(_, asOf, 60)),
      "instantRate" -> (Metrics.instantRate(_)),
      "stddevBy" -> (Metrics.aggregateBy(_, "stddev")),
      "seasonality" -> (Metrics.seasonality(_, "minute")),
      // k = 0 keeps every scoreable point, so the pin covers the join
      "seasonalAnomaly" -> (Metrics.seasonalAnomaly(_, "minute", 0.0)),
      "holtWinters" -> (Metrics.holtWinters(_)),
      "idelta" -> (Metrics.idelta(_)),
      "adjustedTotal" -> (Metrics.adjustedTotal(_)))
    for ((label, op) <- ops) {
      val a = op(once).collect().map(_.toString).sorted.toSeq
      val b = op(replayed).collect().map(_.toString).sorted.toSeq
      assert(a == b, s"$label diverges under replay:\n${
        a.diff(b).take(3)}\nvs\n${b.diff(a).take(3)}")
      assert(a.nonEmpty, s"$label produced no rows — vacuous pin")
    }
  }

  test("clampValues: null values stay null (no fabricated bound), " +
    "bounds apply to real values") {
    val withNull = sums.withColumn("double_value",
      when(col("service_instance_id") === "i0", lit(null).cast("double"))
        .otherwise(col("double_value")))
    val out = Metrics.clampValues(withNull, lo = Some(2.0), hi = Some(5.0))
      .select("service_instance_id", "value", "value_clamped").collect()
    val nullRows = out.filter(_.getString(0) == "i0")
    assert(nullRows.nonEmpty && nullRows.forall(r => r.isNullAt(1) && r.isNullAt(2)),
      "a null sample must clamp to null, not to a bound")
    val realRows = out.filter(_.getString(0) != "i0")
    assert(realRows.nonEmpty && realRows.forall { r =>
      val c = r.getDouble(2); c >= 2.0 && c <= 5.0
    })
  }

  test("aggOp family: count is present-sample count, stddev is the " +
    "POPULATION moment, group collapses to 1, unknown op fails loud") {
    import spark.implicits._
    val t = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val pts = Seq(("m", t, Some(10.0)), ("m", t, Some(20.0)),
        ("m", t, Some(40.0)), ("m", t, None))
      .toDF("name", "time_unix_nano", "double_value")
      .withColumn("int_value", lit(null).cast("long"))
    def one(op: String) = Metrics.aggregateBy(pts, op).collect().head
    assert(one("count").getAs[Double]("value") == 3.0) // null not a sample
    // pop stddev of {10,20,40}: mean 70/3, var 1400/9
    assert(math.abs(one("stddev").getAs[Double]("value") -
      math.sqrt(1400.0 / 9)) < 1e-5)
    assert(math.abs(one("stdvar").getAs[Double]("value") - 1400.0 / 9) < 1e-5)
    assert(one("group").getAs[Double]("value") == 1.0)
    intercept[IllegalArgumentException] { Metrics.aggregateBy(pts, "median") }
  }

  test("adjustedTotal: a reset contributes the restarted value, not a " +
    "negative delta; single-point series report null") {
    import spark.implicits._
    val ts0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def t(i: Int) = new java.sql.Timestamp(ts0.getTime + i * 1000L)
    val pts = Seq(
      // c: 5 -> 8 (+3), 8 -> 2 (reset: +2), 2 -> 6 (+4) = 9, 1 reset
      ("c", t(0), 5.0), ("c", t(1), 8.0), ("c", t(2), 2.0), ("c", t(3), 6.0),
      ("lone", t(0), 7.0)) // no pair -> null total
      .toDF("name", "time_unix_nano", "double_value")
      .withColumn("service_name", lit("svc"))
      .withColumn("service_namespace", lit(null: String))
      .withColumn("service_instance_id", lit("i"))
      .withColumn("resource_attributes", lit("{}"))
      .withColumn("scope_name", lit("sc"))
      .withColumn("metric_attributes", lit("{}"))
      .withColumn("int_value", lit(null).cast("long"))
    val got = Metrics.adjustedTotal(pts).collect()
      .map(r => r.getAs[String]("name") ->
        ((Option(r.getAs[java.lang.Double]("adjusted_total")),
          r.getAs[Long]("n_resets"), r.getAs[Long]("n_points")))).toMap
    assert(got("c") == ((Some(9.0), 1L, 4L)), got)
    assert(got("lone") == ((None, 0L, 1L)), got)
  }

  test("histogramStddev: midpoint moments; empty points and bound-less " +
    "points stay null instead of fabricating spread") {
    import spark.implicits._
    val pts = Seq(
      // mids [5,15,20]; mean 12.5; pop var 56.25
      ("h1", Seq(2L, 0L, 2L), Seq(10.0, 20.0)),
      ("h2", Seq(0L, 0L, 0L), Seq(10.0, 20.0)), // empty -> null
      ("h3", Seq(4L), Seq.empty[Double])) // no bounds -> null
      .toDF("name", "bucket_counts", "explicit_bounds")
    val got = Metrics.histogramStddev(pts).collect()
      .map(r => r.getAs[String]("name") ->
        ((Option(r.getAs[java.lang.Double]("stdvar")),
          Option(r.getAs[java.lang.Double]("stddev"))))).toMap
    assert(got("h1") == ((Some(56.25), Some(7.5))), got)
    assert(got("h2") == ((None, None)), got)
    assert(got("h3") == ((None, None)), got)
  }

  test("aggregateWithout preserves the canonical value bytes: int-typed " +
    "and string-typed '3' stay DISTINCT series, escapes survive") {
    import spark.implicits._
    val t = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def pt(attrs: String, v: Double) =
      ("m", "svc", null: String, "i", "{}", "sc", attrs, t, v)
    val pts = Seq(
      pt("""{"pod":"a","retries":3}""", 1.0),
      pt("""{"pod":"b","retries":3}""", 2.0), // merges with the first
      pt("""{"pod":"a","retries":"3"}""", 4.0), // string-typed: its own
      pt("""{"msg":"x,\"y\":z","pod":"c"}""", 8.0)) // escapes+comma keep
      .toDF("name", "service_name", "service_namespace",
        "service_instance_id", "resource_attributes", "scope_name",
        "metric_attributes", "time_unix_nano", "double_value")
      .withColumn("int_value", lit(null).cast("long"))
    val got = graft.operators.Metrics
      .aggregateWithout(pts, "sum", Seq("pod")).collect()
      .map(r => r.getAs[String]("metric_attributes") ->
        r.getAs[Double]("value")).toMap
    assert(got == Map(
      """{"retries":3}""" -> 3.0,
      """{"retries":"3"}""" -> 4.0,
      """{"msg":"x,\"y\":z"}""" -> 8.0), got)
  }

  test("holtWinters: Prometheus recurrence hand-computed; " +
    "single-point series null; two-point series smooth to the newer value") {
    import spark.implicits._
    def ts(sec: Int) =
      new java.sql.Timestamp(1704067200000L + sec * 1000L)
    val pts = Seq(
      // 100,190,30,90: s=190,b=90 -> s=155,b=52.5 -> s=148.75
      ("m4", ts(0), 100.0), ("m4", ts(60), 190.0),
      ("m4", ts(120), 30.0), ("m4", ts(180), 90.0),
      ("m2", ts(0), 10.0), ("m2", ts(60), 4.0),
      ("m1", ts(0), 7.0))
      .toDF("name", "time_unix_nano", "double_value")
      .withColumn("service_name", lit("s"))
      .withColumn("service_namespace", lit(null).cast("string"))
      .withColumn("service_instance_id", lit("i"))
      .withColumn("resource_attributes", lit("{}"))
      .withColumn("scope_name", lit("sc"))
      .withColumn("metric_attributes", lit("{}"))
      .withColumn("int_value", lit(null).cast("long"))
    val got = Metrics.holtWinters(pts, sf = 0.5, tf = 0.3).collect()
      .map(r => r.getAs[String]("name") ->
        ((Option(r.getAs[java.lang.Double]("smoothed")),
          r.getAs[Long]("n_points")))).toMap
    assert(got == Map(
      "m4" -> ((Some(148.75), 4L)),
      "m2" -> ((Some(4.0), 2L)), // first step collapses to v[1]
      "m1" -> ((None, 1L))), got)
  }

  test("seasonalAnomaly: z vs the bucket's own moments, zero-spread " +
    "buckets excluded, threshold is inclusive") {
    import spark.implicits._
    def ts(min: Int, sec: Int) =
      java.sql.Timestamp.valueOf(f"2024-01-01 00:$min%02d:$sec%02d")
    // minute 0: {10,4,13} -> mean 9, pop stddev sqrt(14); minute 1:
    // constant {5,5} -> excluded (zero spread)
    val pts = Seq(
      ("q", ts(0, 0), 10.0), ("q", ts(0, 20), 4.0), ("q", ts(0, 40), 13.0),
      ("q", ts(1, 0), 5.0), ("q", ts(1, 30), 5.0))
      .toDF("name", "time_unix_nano", "double_value")
      .withColumn("service_name", lit("s"))
      .withColumn("service_namespace", lit(null).cast("string"))
      .withColumn("service_instance_id", lit("i"))
      .withColumn("resource_attributes", lit("{}"))
      .withColumn("scope_name", lit("sc"))
      .withColumn("metric_attributes", lit("{}"))
      .withColumn("int_value", lit(null).cast("long"))
    val got = Metrics.seasonalAnomaly(pts, "minute", k = 1.0).collect()
      .map(r => (r.getAs[Double]("value"), r.getAs[Double]("z_score")))
      .toSet
    val sd = BigDecimal(math.sqrt(14.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def z(v: Double) = BigDecimal((v - 9.0) / sd)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // |z(10)| = 0.267 < 1: kept out; 4 and 13 qualify; minute-1 rows
    // never appear even though k would catch nothing there anyway
    assert(got == Set((4.0, z(4.0)), (13.0, z(13.0))), got)
  }

  test("idelta: raw last-pair difference — a drop stays negative (no " +
    "counter-reset rewrite), single-point series null") {
    import spark.implicits._
    def ts(sec: Int) = new java.sql.Timestamp(1704067200000L + sec * 1000L)
    val pts = Seq(("g", ts(0), 10.0), ("g", ts(60), 4.0), ("one", ts(0), 7.0))
      .toDF("name", "time_unix_nano", "double_value")
      .withColumn("service_name", lit("s"))
      .withColumn("service_namespace", lit(null).cast("string"))
      .withColumn("service_instance_id", lit("i"))
      .withColumn("resource_attributes", lit("{}"))
      .withColumn("scope_name", lit("sc"))
      .withColumn("metric_attributes", lit("{}"))
      .withColumn("int_value", lit(null).cast("long"))
      .withColumn("is_monotonic", lit(true)) // would flip irate, not idelta
    val got = Metrics.idelta(pts).collect()
      .map(r => r.getAs[String]("name") ->
        Option(r.getAs[java.lang.Double]("idelta_value"))).toMap
    assert(got == Map("g" -> Some(-6.0), "one" -> None), got)
  }

  test("exemplarSpans: int-valued exemplars coalesce, unmatched " +
    "exemplars keep the row with matched=false, id-less exemplars drop") {
    import spark.implicits._
    val t = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val pts = Seq(
      ("lat", t, """[{"as_double":9.5,"trace_id":"t1","span_id":"s1"},
        {"as_int":7,"trace_id":"t9","span_id":"s9"},
        {"as_double":1.0}]""".replaceAll("\n\\s*", "")),
      ("lat", t, null: String))
      .toDF("name", "time_unix_nano", "exemplars_json")
    // the span row replayed: must not double the matching exemplar row
    val spans = Seq(("t1", "s1", "GET /x", "svc", 1234L),
        ("t1", "s1", "GET /x", "svc", 1234L))
      .toDF("trace_id", "span_id", "name", "service_name",
        "duration_time_unix_nano")
    val rows = Metrics.exemplarSpans(pts, spans).collect()
    val got = rows.map(r => (r.getAs[String]("trace_id"),
        r.getAs[Double]("exemplar_value"), r.getAs[Boolean]("matched"),
        Option(r.getAs[String]("span_name")))).toSet
    assert(rows.length == 2, // a row count, not the set: dupes must FAIL
      s"replayed span row duplicated output: ${rows.toSeq}")
    assert(got == Set(
      ("t1", 9.5, true, Some("GET /x")),
      ("t9", 7.0, false, None)), got)
  }
}
