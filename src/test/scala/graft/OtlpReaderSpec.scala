package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Port of the reference's reader SQLLogicTest goldens
  * (test/sql/read_otlp_*.test) onto the DSv2 source. */
class OtlpReaderSpec extends SparkTestBase {

  private val fx = "src/test/resources/otlp"

  // ---- logs ----------------------------------------------------------------

  test("logs: count, schema, severity goldens (read_otlp_json.test)") {
    val df = Otlp.readLogs(spark, s"$fx/logs_simple.jsonl")
    assert(df.schema.fieldNames.toSeq == graft.otlp.OtlpSchemas.logs().fieldNames.toSeq)
    assert(df.count() == 3)
    assert(df.where(col("severity_text").isin("INFO", "WARN", "ERROR")).count() == 3)
    val first = df.orderBy("time_unix_nano").first()
    assert(first.getAs[String]("service_name") == "test-service")
    assert(first.getAs[String]("body") == "Application started")
    assert(first.getAs[String]("trace_id") == "5b8efff798038103d269b633813fc60c")
    assert(first.getAs[String]("event_name") == "startup")
    // canonical attribute JSON: keys sorted (see AttrJson scaladoc)
    assert(first.getAs[String]("resource_attributes") ==
      """{"host.name":"test-host","service.name":"test-service"}""")
  }

  test("logs: projection pushdown emits only required columns") {
    val df = Otlp.readLogs(spark, s"$fx/logs_simple.jsonl").select("body")
    assert(df.orderBy("body").first().getString(0) == "Application started")
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("body"))
    assert(df.count() == 3)
  }

  test("parser skips rendering pruned heavy columns (beats reference limitation)") {
    val bytes = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$fx/logs_simple.jsonl"))
    val schema = graft.otlp.OtlpSchemas.logs()
    val full = graft.otlp.OtlpJsonParser.parse(bytes)
    val pruned = graft.otlp.OtlpJsonParser.parse(bytes, nsAsLong = false,
      need = Set("body").contains)
    val ra = schema.fieldIndex("resource_attributes")
    val la = schema.fieldIndex("log_attributes")
    assert(full.signal("logs").head(ra) != null)
    assert(pruned.signal("logs").head(ra) == null)
    assert(pruned.signal("logs").head(la) == null)
    assert(pruned.signal("logs").head(schema.fieldIndex("body")) == "Application started")
    assert(pruned.signal("logs").size == full.signal("logs").size)
  }

  test("logs: int attribute rendered as JSON number") {
    val df = Otlp.readLogs(spark, s"$fx/logs_simple.jsonl")
    val warn = df.where(col("severity_text") === "WARN").first()
    assert(warn.getAs[String]("log_attributes") == """{"memory.used_percent":85}""")
  }

  test("logs: document (multi-line JSON) file parses as one envelope") {
    assert(Otlp.readLogs(spark, s"$fx/logs_document.json").count() == 1)
  }

  test("streamed NDJSON: many lines decode; a mid-file bad line names the path") {
    // the JSONL scan path parses one envelope at a time (per-task heap is
    // one envelope, not the file) — behavior must match the whole-file path
    val line = java.nio.file.Files.readAllLines(
      java.nio.file.Paths.get(s"$fx/logs_simple.jsonl")).get(0)
    val big = java.nio.file.Files.createTempFile("logs_many", ".jsonl")
    try {
      java.nio.file.Files.write(big,
        java.util.Collections.nCopies(5000, line))
      assert(Otlp.readLogs(spark, big.toString).count() == 5000)

      val bad = java.nio.file.Files.createTempFile("logs_bad_mid", ".jsonl")
      try {
        val lines = new java.util.ArrayList[String](
          java.util.Collections.nCopies(100, line))
        lines.add("{not json")
        lines.addAll(java.util.Collections.nCopies(100, line))
        java.nio.file.Files.write(bad, lines)
        val e = intercept[Exception] {
          Otlp.readLogs(spark, bad.toString).count()
        }
        def msgs(t: Throwable): Seq[String] =
          if (t == null) Seq.empty
          else Option(t.getMessage).toSeq ++ msgs(t.getCause)
        assert(msgs(e).exists(m => m.contains("OTLP parse error") &&
          m.contains("logs_bad_mid")), msgs(e).mkString("|"))
      } finally java.nio.file.Files.delete(bad)
    } finally java.nio.file.Files.delete(big)
  }

  test("logs nulls: severity 0 → NULL, empty ids → NULL, body {} → NULL") {
    val df = Otlp.readLogs(spark, s"$fx/logs_nulls.jsonl")
    assert(df.count() == 3)
    assert(df.where(col("trace_id").isNull && col("span_id").isNull).count() == 3)
    assert(df.where(col("severity_number").isNull).count() == 1)
    assert(df.where(col("body").isNull).count() == 1)
    assert(df.where(col("scope_name").isNull).count() == 3)
  }

  // ---- traces --------------------------------------------------------------

  test("traces: count, duration, name goldens") {
    val df = Otlp.readTraces(spark, s"$fx/traces_simple.jsonl")
    assert(df.schema.fieldNames.toSeq == graft.otlp.OtlpSchemas.traces().fieldNames.toSeq)
    assert(df.count() == 3)
    assert(df.where(col("name").like("%users%")).count() == 2)
    assert(df.where(col("duration_time_unix_nano") > 0).count() == 3)
    val first = df.orderBy("start_time_unix_nano").first()
    assert(first.getAs[Long]("duration_time_unix_nano") == 100000000L)
    assert(first.getAs[Int]("kind") == 2)
    assert(first.getAs[String]("parent_span_id") == "eee19b7ec3c1b173")
  }

  test("traces: status, events_json, links_json") {
    val df = Otlp.readTraces(spark, s"$fx/traces_simple.jsonl")
    val err = df.where(col("status_code") === 2).first()
    assert(err.getAs[String]("status_status_message") == "boom")
    assert(err.getAs[String]("events_json").contains(""""name":"retry""""))
    assert(err.getAs[String]("links_json").contains("5b8efff798038103d269b633813fc60c"))
    assert(df.where(col("events_json").isNull).count() == 2)
  }

  test("traces nulls: zero timestamps → NULL start, duration 0, no parent") {
    val df = Otlp.readTraces(spark, s"$fx/traces_nulls.jsonl")
    assert(df.count() == 3)
    assert(df.where(col("duration_time_unix_nano") === 0).count() == 3)
    assert(df.where(col("parent_span_id").isNull).count() == 3)
    assert(df.where(col("scope_name").isNull).count() == 3)
    assert(df.where(col("start_time_unix_nano").isNull).count() == 3)
  }

  test("traces: single minimal record golden") {
    val df = Otlp.readTraces(spark, s"$fx/single_trace.jsonl")
    val r = df.first()
    assert(r.getAs[String]("trace_id") == "00000000000000000000000000000001")
    assert(r.getAs[String]("name") == "single_span")
  }

  // ---- metrics -------------------------------------------------------------

  test("metrics: one parse yields exactly one row per shape reader") {
    val p = s"$fx/metrics_all_types.jsonl"
    assert(Otlp.readMetricsGauge(spark, p).count() == 1)
    assert(Otlp.readMetricsSum(spark, p).count() == 1)
    assert(Otlp.readMetricsHistogram(spark, p).count() == 1)
    assert(Otlp.readMetricsExpHistogram(spark, p).count() == 1)
  }

  test("metrics histogram: bucket/bounds/attr goldens (read_otlp_metrics_histogram.test)") {
    val r = Otlp.readMetricsHistogram(spark, s"$fx/metrics_all_types.jsonl").first()
    assert(r.getAs[String]("name") == "latency.hist")
    assert(r.getAs[String]("unit") == "ms")
    assert(r.getAs[Long]("count") == 50L)
    assert(r.getAs[Double]("sum") == 250.0)
    assert(r.getSeq[Long](r.fieldIndex("bucket_counts")).toSeq == Seq(5L, 10L, 15L, 12L, 8L))
    assert(r.getSeq[Double](r.fieldIndex("explicit_bounds")).toSeq == Seq(5.0, 10.0, 20.0, 50.0))
    assert(r.getAs[String]("metric_attributes") == """{"endpoint":"/health"}""")
    assert(r.getAs[String]("service_name") == "test-service")
    assert(r.getAs[Int]("aggregation_temporality") == 2)
  }

  test("metrics sum: negative int value, temporality, monotonic") {
    val r = Otlp.readMetricsSum(spark, s"$fx/metrics_all_types.jsonl").first()
    assert(r.getAs[Long]("int_value") == -7L)
    assert(r.isNullAt(r.fieldIndex("double_value")))
    assert(r.getAs[Int]("aggregation_temporality") == 1)
    assert(!r.getAs[Boolean]("is_monotonic"))
  }

  test("metrics gauge: double value and int NULL") {
    val r = Otlp.readMetricsGauge(spark, s"$fx/metrics_all_types.jsonl").first()
    assert(r.getAs[Double]("double_value") == 0.75)
    assert(r.isNullAt(r.fieldIndex("int_value")))
  }

  test("metrics exp histogram: buckets and offsets") {
    val r = Otlp.readMetricsExpHistogram(spark, s"$fx/metrics_all_types.jsonl").first()
    assert(r.getAs[Int]("scale") == 3)
    assert(r.getAs[Long]("zero_count") == 1L)
    assert(r.getAs[Int]("positive_offset") == 2)
    assert(r.getSeq[Long](r.fieldIndex("positive_bucket_counts")).toSeq == Seq(3L, 4L, 2L))
    assert(r.getAs[Int]("negative_offset") == -1)
    assert(r.getSeq[Long](r.fieldIndex("negative_bucket_counts")).toSeq == Seq(2L, 1L))
  }

  test("metrics: shape readers yield 0 rows on a logs file (not an error)") {
    assert(Otlp.readMetricsGauge(spark, s"$fx/logs_simple.jsonl").count() == 0)
    assert(Otlp.readMetricsHistogram(spark, s"$fx/logs_simple.jsonl").count() == 0)
  }

  test("metrics: temporality accepts name-string enums") {
    val r = Otlp.readMetricsSum(spark, s"$fx/metrics_temporality_strings.jsonl").first()
    assert(r.getAs[Int]("aggregation_temporality") == 1)
  }

  test("metrics: optional sum/min/max NULL when absent") {
    val r = Otlp.readMetricsHistogram(spark, s"$fx/metrics_optional_fields.jsonl").first()
    assert(r.isNullAt(r.fieldIndex("sum")))
    assert(r.isNullAt(r.fieldIndex("min")))
    assert(r.isNullAt(r.fieldIndex("max")))
    assert(r.getSeq[Long](r.fieldIndex("bucket_counts")).toSeq == Seq(1L, 2L, 3L, 4L))
  }

  test("metrics: summary points produce no rows in any shape") {
    val p = s"$fx/metrics_summary_only.jsonl"
    assert(Otlp.readMetricsGauge(spark, p).count() == 0)
    assert(Otlp.readMetricsSum(spark, p).count() == 0)
    assert(Otlp.readMetricsHistogram(spark, p).count() == 0)
  }

  test("metrics / metrics_summary placeholders throw at bind") {
    intercept[UnsupportedOperationException] {
      Otlp.readMetrics(spark, s"$fx/metrics_all_types.jsonl")
    }
    intercept[UnsupportedOperationException] {
      Otlp.readMetricsSummary(spark, s"$fx/metrics_all_types.jsonl")
    }
  }

  // ---- files, globs, errors ------------------------------------------------

  test("empty file → 0 rows; whitespace-only → error") {
    assert(Otlp.readTraces(spark, s"$fx/empty.jsonl").count() == 0)
    val e = intercept[Exception] {
      Otlp.readTraces(spark, s"$fx/whitespace.jsonl").count()
    }
    assert(e.getMessage.contains("OTLP parse error") ||
      Option(e.getCause).exists(_.getMessage.contains("OTLP parse error")))
  }

  test("malformed file fails the whole scan (never partial rows)") {
    intercept[Exception] {
      Otlp.readTraces(spark, s"$fx/malformed.jsonl").count()
    }
  }

  test("nonexistent path errors at resolution") {
    intercept[Exception] {
      Otlp.readTraces(spark, s"$fx/does_not_exist.jsonl").count()
    }
  }

  test("glob: traces_*.jsonl matches 4 files / 8 spans (read_otlp_limits.test)") {
    assert(Otlp.readTraces(spark, s"$fx/traces_*.jsonl").count() == 8)
  }

  test("glob scan parallelism: one partition per file") {
    val df = Otlp.readTraces(spark, s"$fx/traces_*.jsonl")
    assert(df.rdd.getNumPartitions == 4)
  }

  test("timestamp boundary parses; overflow past i64::MAX errors (no clamp)") {
    val ok = Otlp.readLogs(spark, s"$fx/ts_boundary_logs.jsonl")
      .select(date_format(col("time_unix_nano"), "yyyy-MM-dd HH:mm:ss.SSSSSS"))
      .first().getString(0)
    assert(ok == "2262-04-11 23:47:16.854775")
    val e = intercept[Exception] {
      Otlp.readLogs(spark, s"$fx/ts_overflow_logs.jsonl").count()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(m => m.contains("OTLP parse error") && m.contains("Parse failed")))
  }

  test("ns_as_long exposes exact nanoseconds as BIGINT") {
    val df = Otlp.readLogs(spark, s"$fx/ts_boundary_logs.jsonl",
      Map("ns_as_long" -> "true"))
    assert(df.schema("time_unix_nano").dataType == LongType)
    assert(df.first().getAs[Long]("time_unix_nano") == 9223372036854775000L)
  }

  test("file cap: max_file_bytes errors on oversized input") {
    val e = intercept[Exception] {
      Otlp.readLogs(spark, s"$fx/logs_simple.jsonl",
        Map("max_file_bytes" -> "10")).count()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("exceeds")))
  }

  test("batch regression: file larger than one vector batch (2049 rows)") {
    val line = java.nio.file.Files.readAllLines(
      java.nio.file.Paths.get(s"$fx/logs_simple.jsonl")).get(0)
    val tmp = java.nio.file.Files.createTempFile("many_logs", ".jsonl")
    val content = (Seq.fill(2049)(line)).mkString("\n")
    java.nio.file.Files.writeString(tmp, content)
    try assert(Otlp.readLogs(spark, tmp.toString).count() == 2049)
    finally java.nio.file.Files.delete(tmp)
  }

  test("ndjson byte-range splits: >1 partition, row set identical to the " +
      "single-partition read (mid-line and exact-boundary cuts)") {
    def line(i: Int) =
      s"""{"resourceLogs":[{"resource":{"attributes":[{"key":"service.name","value":{"stringValue":"svc$i"}}]},"scopeLogs":[{"scope":{"name":"s"},"logRecords":[{"timeUnixNano":"${1640000000000000000L + i}","severityNumber":9,"severityText":"INFO","body":{"stringValue":"row $i é✓ ${"x" * (i % 37)}"}}]}]}]}"""
    val tmp = java.nio.file.Files.createTempFile("split_logs", ".jsonl")
    java.nio.file.Files.writeString(tmp,
      (0 until 2000).map(line).mkString("\n") + "\n")
    try {
      val whole = Otlp.readLogs(spark, tmp.toString, Map("split_bytes" -> "0"))
      assert(whole.rdd.getNumPartitions == 1)
      // mid-line cuts: variable-length lines (the x-padding and multibyte
      // é✓ make boundaries land inside lines and inside UTF-8 sequences)
      val split = Otlp.readLogs(spark, tmp.toString, Map("split_bytes" -> "50000"))
      assert(split.rdd.getNumPartitions > 1, "large NDJSON must range-split")
      assert(split.count() == 2000)
      assert(split.exceptAll(whole).isEmpty && whole.exceptAll(split).isEmpty,
        "range-split read must equal the whole-file read")
      // exact-boundary cuts: every line the same byte length, split size a
      // multiple of it — a range boundary falls exactly ON a line start,
      // exercising the previous-range-owns-it / next-range-discards rule
      val fixed = java.nio.file.Files.createTempFile("split_fixed", ".jsonl")
      val base = line(0)
      java.nio.file.Files.writeString(fixed,
        (0 until 400).map(_ => base).mkString("\n") + "\n")
      try {
        val lineBytes = base.getBytes("UTF-8").length + 1
        val sf = Otlp.readLogs(spark, fixed.toString,
          Map("split_bytes" -> (lineBytes * 40).toString))
        assert(sf.rdd.getNumPartitions == 10)
        assert(sf.count() == 400)
      } finally java.nio.file.Files.delete(fixed)
    } finally java.nio.file.Files.delete(tmp)
  }

  test("ndjson splits: a single multi-line JSON document never splits") {
    val tmp = java.nio.file.Files.createTempFile("pretty_logs", ".json")
    // pretty-printed = first line is just "{" — the planner probe rejects
    // it and the whole-file fallback parses the document
    val pretty = java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$fx/logs_simple.jsonl")).linesIterator.next()
    val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(pretty)
    java.nio.file.Files.writeString(tmp,
      node.toPrettyString)
    try {
      val df = Otlp.readLogs(spark, tmp.toString, Map("split_bytes" -> "64"))
      assert(df.rdd.getNumPartitions == 1, "multi-line doc must stay whole-file")
      assert(df.count() == 1) // line 1 of the fixture carries one record
    } finally java.nio.file.Files.delete(tmp)
  }

  test("ndjson splits are exempt from the whole-file cap (beats the " +
      "reference's one-thread-per-file + cap model)") {
    def line(i: Int) =
      s"""{"resourceLogs":[{"scopeLogs":[{"logRecords":[{"timeUnixNano":"${i}","body":{"stringValue":"r$i"}}]}]}]}"""
    val tmp = java.nio.file.Files.createTempFile("cap_logs", ".jsonl")
    java.nio.file.Files.writeString(tmp,
      (0 until 100).map(line).mkString("\n") + "\n")
    try {
      val opts = Map("max_file_bytes" -> "1000", "split_bytes" -> "2000")
      assert(Otlp.readLogs(spark, tmp.toString, opts).count() == 100)
      intercept[Exception] { // unsplit, the same cap still errors (parity)
        Otlp.readLogs(spark, tmp.toString,
          Map("max_file_bytes" -> "1000", "split_bytes" -> "0")).count()
      }
    } finally java.nio.file.Files.delete(tmp)
  }

  test("opt-in filter pushdown: identical results, filters reach the scan") {
    val base = Otlp.readLogs(spark, s"$fx/logs_simple.jsonl")
    val fp = Otlp.readLogs(spark, s"$fx/logs_simple.jsonl",
      Map("filter_pushdown" -> "true"))
    def q(df: org.apache.spark.sql.DataFrame) =
      df.where(col("severity_text") === "INFO" && col("trace_id").isNotNull)
        .select("body")
    assert(q(fp).collect().toSeq == q(base).collect().toSeq)
    assert(q(fp).count() == 1)
    // default (parity with the reference) pushes nothing
    val scanDefault = q(base).queryExecution.executedPlan.collectLeaves().head.toString
    assert(scanDefault.contains("PushedFilters: []"), scanDefault)
    val scanPushed = q(fp).queryExecution.executedPlan.collectLeaves().head.toString
    assert(scanPushed.contains("EqualTo(severity_text,INFO)"), scanPushed)
    // range + string-match filters also push and stay correct
    val r = fp.where(col("severity_number") >= 13 &&
      col("body").contains("memory")).select("severity_text")
    assert(r.collect().map(_.getString(0)).toSeq == Seq("WARN"))
  }

  test("union and join across reader scans (read_otlp_concurrent.test)") {
    val a = Otlp.readTraces(spark, s"$fx/traces_simple.jsonl")
    val b = Otlp.readTraces(spark, s"$fx/traces_nulls.jsonl")
    assert(a.unionAll(b).count() == 6)
    val logs = Otlp.readLogs(spark, s"$fx/logs_simple.jsonl")
    assert(a.join(logs, "trace_id").count() == 4) // 2 spans x 2 logs on fc60c
  }

  test("glob with a malformed member fails the whole scan") {
    val tmp = java.nio.file.Files.createTempDirectory("glob_malformed")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$fx/traces_simple.jsonl"),
      tmp.resolve("traces_ok.jsonl"))
    java.nio.file.Files.writeString(tmp.resolve("traces_bad.jsonl"), "{broken")
    try intercept[Exception] {
      Otlp.readTraces(spark, s"$tmp/traces_*.jsonl").count()
    } finally {
      tmp.toFile.listFiles().foreach(_.delete()); tmp.toFile.delete()
    }
  }

  test("delta->cumulative: running sums per series in time order, " +
    "cumulative points pass through, temporality reports 2") {
    import org.apache.spark.sql.functions.col
    val got = graft.operators.Metrics.deltaToCumulative(
        Otlp.readMetricsSum(spark, s"$fx/delta_metrics.jsonl"))
      .orderBy("name", "time_unix_nano").collect()
      .map(r => (r.getAs[String]("name"),
        Option(r.getAs[Any]("int_value")),
        Option(r.getAs[Any]("double_value")),
        r.getAs[Int]("aggregation_temporality")))
    val byName = got.groupBy(_._1)
    // int delta series 5, 3, -2 -> 5, 8, 6 (non-monotonic deltas legal)
    assert(byName("orders.delta").map(_._2) ===
      Seq(Some(5L), Some(8L), Some(6L)))
    // double delta series 1.5, 2.25 -> 1.5, 3.75
    assert(byName("latency.delta").map(_._3) ===
      Seq(Some(1.5), Some(3.75)))
    // already-cumulative series byte-unchanged, temporality kept
    assert(byName("total.cumulative").map(_._2) ===
      Seq(Some(100L), Some(110L)))
    // every delta row reports temporality 2 after conversion
    assert(got.forall(_._4 == 2), got.mkString("; "))
    // a same-named series with different attributes never mixes: tag one
    val tagged = Otlp.readMetricsSum(spark, s"$fx/delta_metrics.jsonl")
      .withColumn("metric_attributes",
        org.apache.spark.sql.functions.when(
          col("name") === "orders.delta" &&
            col("time_unix_nano") === org.apache.spark.sql.functions
              .to_timestamp(org.apache.spark.sql.functions.lit("2021-12-20 11:33:20")),
          "{\"k\":\"v\"}").otherwise(col("metric_attributes")))
    val t2 = graft.operators.Metrics.deltaToCumulative(tagged)
      .where(col("name") === "orders.delta")
      .orderBy("time_unix_nano").collect()
      .map(_.getAs[Long]("int_value"))
    // first point now its own series: remaining run is 3, 1 — not 8, 6
    assert(t2.toSeq == Seq(5L, 3L, 1L), t2.toSeq)
  }

  test("metric rate: per-second increases, counter reset restarts from " +
    "the new value, non-monotonic sums difference plainly") {
    val got = graft.operators.Metrics.rate(
        Otlp.readMetricsSum(spark, s"$fx/rate_metrics.jsonl"))
      .orderBy("name", "time_unix_nano").collect()
      .map(r => r.getAs[String]("name") ->
        Option(r.getAs[Any]("rate_per_sec")))
    val byName = got.groupBy(_._1)
    // 100, 190, RESET->30, 90 over 60s steps: null, 1.5, 0.5 (reset!), 1.0
    assert(byName("requests.total").map(_._2) ===
      Seq(None, Some(1.5), Some(0.5), Some(1.0)))
    // 10, 4, 13 non-monotonic: null, -0.1, 0.15 (negative rates legal)
    assert(byName("queue.size").map(_._2) ===
      Seq(None, Some(-0.1), Some(0.15)))
    // review-finding regressions: (a) an at-least-once byte-equal replay
    // changes nothing; (b) two distinct points at one microsecond yield
    // null rates, not an ANSI divide-by-zero; (c) two producer INSTANCES
    // of one series never merge (no fake counter resets)
    val sums = Otlp.readMetricsSum(spark, s"$fx/rate_metrics.jsonl")
    val replayed = graft.operators.Metrics.rate(sums.unionAll(sums.limit(1)))
      .orderBy("name", "time_unix_nano").collect()
      .map(r => Option(r.getAs[Any]("rate_per_sec")))
    assert(replayed.length == got.length, "replay must collapse")
    val sameTs = sums.where(org.apache.spark.sql.functions.col("name") === "queue.size")
      .limit(1)
    val tsPair = graft.operators.Metrics.rate(
        sums.unionAll(sameTs.withColumn("double_value",
          org.apache.spark.sql.functions.col("double_value") + 1.0)))
      .where(org.apache.spark.sql.functions.col("name") === "queue.size")
      .collect()
    assert(tsPair.length == 4, tsPair.mkString("; "))
    val twoInstances = sums.unionAll(sums.withColumn("service_instance_id",
      org.apache.spark.sql.functions.lit("pod-2")))
    val perInst = graft.operators.Metrics.rate(twoInstances)
      .where(org.apache.spark.sql.functions.col("name") === "requests.total")
      .collect().map(r => Option(r.getAs[Any]("rate_per_sec")))
    // each instance reproduces the single-series rates — nothing merges
    assert(perInst.count(_.isEmpty) == 2, perInst.mkString("; "))
    assert(perInst.count(_.contains(1.5)) == 2, perInst.mkString("; "))
  }

  test("histogram quantile: interpolated median, first-bucket-from-0, " +
    "+Inf bucket reports the max finite bound, quantiles ordered") {
    val hists = Otlp.readMetricsHistogram(spark, s"$fx/hist_metrics.jsonl")
    def qs(q: Double): Seq[Double] = graft.operators.Metrics
      .histogramQuantile(hists, q)
      .orderBy("time_unix_nano").collect()
      .map(_.getAs[Double]("quantile")).toSeq
    // counts [2,3,4,1] bounds [10,50,100]: target 5 lands at cum 5 ->
    // bucket 2 exactly: 10 + 40*(5-2)/3 = 50; [8,1,0,1]: 10*5/8 = 6.25;
    // [0,0,0,5]: all mass in +Inf -> max finite bound
    assert(qs(0.5) == Seq(50.0, 6.25, 100.0), qs(0.5))
    // q=0.25 of [2,3,4,1]: target 2.5 -> bucket 2: 10 + 40*0.5/3
    assert(qs(0.25).head == 16.666667, qs(0.25))
    // quantiles are monotone in q for every point
    val (q1, q9) = (qs(0.1), qs(0.9))
    q1.zip(q9).foreach { case (a, b) => assert(a <= b, (a, b)) }
  }

  test("aggregate-then-quantile: bucket counts sum elementwise per " +
    "layout group; different layouts never merge; replay rows drop") {
    import spark.implicits._
    val hists = Seq(
      ("lat", Seq(2L, 3L, 4L, 1L), Seq(10.0, 50.0, 100.0)),
      ("lat", Seq(8L, 1L, 0L, 1L), Seq(10.0, 50.0, 100.0)),
      ("lat", Seq(8L, 1L, 0L, 1L), Seq(10.0, 50.0, 100.0)), // replay
      ("lat", Seq(5L, 5L), Seq(7.0)))                       // other layout
      .toDF("name", "bucket_counts", "explicit_bounds")
    val agg = graft.operators.Metrics.aggregateHistograms(hists, Seq("name"))
      .collect().map(r => r.getAs[Seq[Double]]("explicit_bounds") ->
        (r.getAs[Seq[Long]]("bucket_counts"), r.getAs[Long]("n_points"))).toMap
    // [2,3,4,1] + [8,1,0,1] elementwise (replay dropped)
    assert(agg(Seq(10.0, 50.0, 100.0)) == ((Seq(10L, 4L, 4L, 2L), 2L)), agg)
    assert(agg(Seq(7.0)) == ((Seq(5L, 5L), 1L)), agg)
    // quantile over the AGGREGATE: total 20, target 10 -> cum hits 10 at
    // bucket 1 exactly: 10 * 10/10 = 10.0
    val q = graft.operators.Metrics.histogramQuantile(
        graft.operators.Metrics.aggregateHistograms(hists, Seq("name")), 0.5)
      .where(org.apache.spark.sql.functions.size(
        org.apache.spark.sql.functions.col("explicit_bounds")) === 3)
      .collect().head
    assert(q.getAs[Double]("quantile") == 10.0, q)
  }

  test("exp-histogram quantile: log-linear interpolation in base-2 " +
    "buckets, zero-bucket hit -> 0, negative buckets walk mirrored") {
    val hists = Otlp.readMetricsExpHistogram(spark, s"$fx/exp_metrics.jsonl")
    val got = graft.operators.Metrics.expHistogramQuantile(hists, q = 0.5)
      .orderBy("time_unix_nano").collect()
      .map(r => Option(r.getAs[Any]("quantile")))
    // scale 0, zero 2, offset 1, counts [2,4,2]: target 5 -> exponent
    // 1 + 1 + (5-4)/4 = 2.25 -> 2^2.25; all-zero-mass point -> 0;
    // mixed point (neg [1], zero 1, pos [3]): total 5, target 2.5 lands
    // in the positive range -> 2^((2.5-2)/3) = 2^(1/6);
    // scale 1, offset 4, [4,4]: 2^(5/2);
    // negative-dominant point (noff 1, nc [2,5,1], total 8, target 4):
    // most-negative-first walk hits the middle bucket (reversed cums
    // [1,6,8], ridx 2 -> 0-based i=1), exponent descends 3 -> 2 with
    // frac (4-1)/5 = 0.6: -2^(1+1+1-0.6) = -2^2.4
    assert(got === Seq(Some(4.756828), Some(0.0), Some(1.122462),
      Some(5.656854), Some(-5.278032)), got)
    // a single-bucket histogram (no finite bound) reports null instead of
    // an element_at(b, 0) runtime error (review-finding regression)
    import spark.implicits._
    val single = Seq((Seq(5L), Seq.empty[Double]))
      .toDF("bucket_counts", "explicit_bounds")
    val sq = graft.operators.Metrics.histogramQuantile(single, q = 0.5)
      .collect().head
    assert(sq.getAs[Any]("quantile") == null, sq)
    // fp clamp (ADVICE r8): a zero_count big enough that (zero + Σpc)
    // rounds UP pushes __target past the last cumulative, idx to len+1 —
    // must report the top bucket's upper bound, not an ANSI out-of-bounds.
    // 2^53 has double spacing 2, so 2^53 + 3 rounds to 2^53 + 4 and
    // q=1 leaves target-zero = 4 > Σpc = 3.
    val big = Seq((9007199254740992L, 0, 0, Seq(1L, 2L), 0, Seq.empty[Long]))
      .toDF("zero_count", "scale", "positive_offset",
        "positive_bucket_counts", "negative_offset",
        "negative_bucket_counts")
    val clamped = graft.operators.Metrics.expHistogramQuantile(big, q = 1.0)
      .collect().head
    assert(clamped.getAs[Double]("quantile") == 4.0, clamped) // 2^((0+2)/1)
    // monotone in q where defined
    val q9 = graft.operators.Metrics.expHistogramQuantile(hists, q = 0.9)
      .orderBy("time_unix_nano").collect()
      .map(r => Option(r.getAs[Any]("quantile")))
    got.zip(q9).foreach {
      case (Some(a: Double), Some(b: Double)) => assert(a <= b, (a, b))
      case (a, b) => assert(a.isDefined == b.isDefined, (a, b))
    }
  }

  test("exp-histogram merge: cross-scale downscale to the group minimum, " +
    "dense arrays compose with the quantile walk") {
    val agg = graft.operators.Metrics.aggregateExpHistograms(
      Otlp.readMetricsExpHistogram(spark, s"$fx/exp_metrics.jsonl"))
    val r = agg.collect().head
    // fixture: scales [0,0,0,1,0]; the scale-1 point (offset 4, [4,4])
    // downscales to scale 0 as floor(4/2)=floor(5/2)=2 -> 8 at idx 2
    assert(r.getAs[Int]("scale") == 0, r)
    assert(r.getAs[Long]("zero_count") == 8L, r)
    assert(r.getAs[Long]("n_points") == 5L, r)
    assert(r.getAs[Int]("positive_offset") == 0 &&
      r.getSeq[Long](r.fieldIndex("positive_bucket_counts")).toSeq ==
        Seq(3L, 2L, 12L, 2L), r)
    // negative side merges point 3's (offset 0, [1]) with point 5's
    // (offset 1, [2,5,1]) -> offset 0, [1, 2, 5, 1]
    assert(r.getAs[Int]("negative_offset") == 0 &&
      r.getSeq[Long](r.fieldIndex("negative_bucket_counts")).toSeq ==
        Seq(1L, 2L, 5L, 1L), r)
    // composes with expHistogramQuantile: total 36 (neg 9 + zero 8 +
    // pos 19), target 18 lands in the first positive bucket ->
    // 2^((18-17)/3) = 2^(1/3)
    val q = graft.operators.Metrics.expHistogramQuantile(agg, q = 0.5)
      .collect().head
    assert(q.getAs[Double]("quantile") == 1.259921, q)
    // a group whose points carry ONLY zero-bucket mass still emits its
    // row (review finding: the inner join from bucket entries dropped
    // it), with empty bucket arrays the quantile walk maps to 0
    import spark.implicits._
    val zeroOnly = Seq(("z.hist", 0, 7L, 0, Seq.empty[Long], 0,
        Seq.empty[Long]))
      .toDF("name", "scale", "zero_count", "positive_offset",
        "positive_bucket_counts", "negative_offset",
        "negative_bucket_counts")
    val zr = graft.operators.Metrics.aggregateExpHistograms(zeroOnly)
      .collect().head
    assert(zr.getAs[Long]("zero_count") == 7L &&
      zr.getSeq[Long](zr.fieldIndex("positive_bucket_counts")).isEmpty &&
      zr.getAs[Long]("n_points") == 1L, zr)
    val zq = graft.operators.Metrics.expHistogramQuantile(
      graft.operators.Metrics.aggregateExpHistograms(zeroOnly), q = 0.5)
      .collect().head
    assert(zq.getAs[Double]("quantile") == 0.0, zq)
  }

  test("SQL view over the reader works end-to-end (minimum slice)") {
    Otlp.readLogs(spark, s"$fx/logs_simple.jsonl").createOrReplaceTempView("otlp_logs_v")
    val rows = spark.sql(
      """SELECT time_unix_nano, service_name, severity_text, body
        |FROM otlp_logs_v WHERE severity_text = 'INFO'
        |ORDER BY time_unix_nano""".stripMargin).collect()
    assert(rows.length == 1 && rows(0).getAs[String]("body") == "Application started")
  }
}
