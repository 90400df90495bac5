package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** OTAP decode parity (reference test/sql/read_otap.test): decoding the
  * OTAP form must equal transforming the equivalent OTLP protobuf,
  * row-for-row, both directions. Runs against the reference's own OTAP
  * corpus when present (read-only test input). */
class OtapReaderSpec extends SparkTestBase {

  private val corpus = "/root/reference/test/data/otap"
  private def available: Boolean = new java.io.File(corpus).isDirectory

  private def exceptBothWays(a: DataFrame, b: DataFrame): Unit = {
    assert(a.exceptAll(b).count() == 0, "otap minus otlp not empty")
    assert(b.exceptAll(a).count() == 0, "otlp minus otap not empty")
  }

  test("otap logs ≡ otlp logs (EXCEPT both ways)") {
    assume(available)
    val otap = Otlp.readOtapLogs(spark, s"$corpus/logs-initial.bar")
    val otlp = Otlp.readLogs(spark, s"$corpus/logs-initial.otlp")
    assert(otap.count() == 3)
    exceptBothWays(otap, otlp)
  }

  test("otap traces ≡ otlp traces (EXCEPT both ways)") {
    assume(available)
    val otap = Otlp.readOtapTraces(spark, s"$corpus/traces-initial.bar")
    val otlp = Otlp.readTraces(spark, s"$corpus/traces-initial.otlp")
    assert(otap.count() == 1)
    exceptBothWays(otap, otlp)
  }

  test("otap metrics: each shape reader extracts its own rows") {
    assume(available)
    val p = s"$corpus/metrics-initial.bar"
    assert(Otlp.readOtapMetricsGauge(spark, p).count() == 1)
    assert(Otlp.readOtapMetricsSum(spark, p).count() == 1)
    assert(Otlp.readOtapMetricsHistogram(spark, p).count() == 1)
    assert(Otlp.readOtapMetricsExpHistogram(spark, p).count() == 1)
  }

  test("otap metrics ≡ otlp metrics for all four shapes (EXCEPT both ways)") {
    assume(available)
    val bar = s"$corpus/metrics-initial.bar"
    val pb = s"$corpus/metrics-initial.otlp"
    exceptBothWays(Otlp.readOtapMetricsGauge(spark, bar),
      Otlp.readMetricsGauge(spark, pb))
    exceptBothWays(Otlp.readOtapMetricsSum(spark, bar),
      Otlp.readMetricsSum(spark, pb))
    exceptBothWays(Otlp.readOtapMetricsHistogram(spark, bar),
      Otlp.readMetricsHistogram(spark, pb))
    exceptBothWays(Otlp.readOtapMetricsExpHistogram(spark, bar),
      Otlp.readMetricsExpHistogram(spark, pb))
  }

  test("zstd-compressed OTAP decodes to the same rows") {
    assume(available)
    val z = Otlp.readOtapLogs(spark, s"$corpus/logs-zstd.bar")
    assert(z.count() == 3)
    exceptBothWays(z, Otlp.readLogs(spark, s"$corpus/logs-initial.otlp"))
  }

  test("otap schema parity with otlp readers") {
    assume(available)
    val otap = Otlp.readOtapLogs(spark, s"$corpus/logs-initial.bar")
    val otlp = Otlp.readLogs(spark, s"$corpus/logs-initial.otlp")
    assert(otap.schema == otlp.schema)
  }

  test("dictionary-reuse streams are rejected with a clear error (not garbage)") {
    assume(available && new java.io.File(s"$corpus/logs-reuse.bar").exists())
    // logs-reuse.bar carries continuation batches without schema messages —
    // decodable only by a stateful per-stream decoder (the reference's own
    // read_otap tests exercise only self-contained files too)
    val e = intercept[Exception] {
      Otlp.readOtapLogs(spark, s"$corpus/logs-reuse.bar").count()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("OTLP parse error")), msgs(e).mkString("|"))
  }

  test("otap value spot checks") {
    assume(available)
    val logs = Otlp.readOtapLogs(spark, s"$corpus/logs-initial.bar")
    assert(logs.select("service_name").distinct().first().getString(0)
      == "fixture-service")
    assert(logs.where(col("severity_text") === "INFO").count() == 2)
    val spans = Otlp.readOtapTraces(spark, s"$corpus/traces-initial.bar")
    val s = spans.first()
    assert(s.getAs[String]("name") == "first-span")
    assert(s.getAs[Long]("duration_time_unix_nano") == 500L)
    assert(s.getAs[String]("trace_state") == "vendor=value")
    assert(s.getAs[Int]("status_code") == 2)
  }
}
