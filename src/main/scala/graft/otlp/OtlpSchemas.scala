package graft.otlp

import org.apache.spark.sql.types._

/** The six fixed OTLP signal schemas (reference:
  * site/src/content/docs/reference/schemas.md; SURVEY.md §1.2). Column names
  * and order are part of the engine contract — they are NOT inferred from
  * data; every file must conform.
  *
  * Type policy (SURVEY.md §1.3 / §7.3):
  *   - ns timestamps (DuckDB TIMESTAMP_NS) → Spark TimestampType (µs,
  *     truncated toward zero), matching the reference's own live-ingest
  *     tables (schemas.md "Type system notes"). Exact-ns access: the reader
  *     option `ns_as_long=true` swaps these columns to LongType raw ns.
  *   - u64 values land in the next-wider signed type with an overflow guard
  *     in the parser (u64 timestamps > Long.MaxValue fail the scan, no clamp).
  *   - trace/span ids are lowercase-hex strings; attribute maps are compact
  *     JSON text columns.
  */
object OtlpSchemas {

  val Signals: Seq[String] =
    Seq("logs", "traces", "metrics_gauge", "metrics_sum", "metrics_histogram",
      "metrics_exp_histogram")

  /** Placeholders registered by the reference that throw at bind. */
  val PlaceholderSignals: Seq[String] = Seq("metrics", "metrics_summary")

  private def ts(name: String, nsAsLong: Boolean) =
    if (nsAsLong) StructField(name, LongType) else StructField(name, TimestampType)

  def logs(nsAsLong: Boolean = false): StructType = StructType(Seq(
    ts("time_unix_nano", nsAsLong),
    ts("observed_time_unix_nano", nsAsLong),
    StructField("trace_id", StringType),
    StructField("span_id", StringType),
    StructField("service_name", StringType),
    StructField("service_namespace", StringType),
    StructField("service_instance_id", StringType),
    StructField("severity_number", IntegerType),
    StructField("severity_text", StringType),
    StructField("event_name", StringType),
    StructField("body", StringType),
    StructField("resource_attributes", StringType),
    StructField("scope_name", StringType),
    StructField("scope_version", StringType),
    StructField("scope_attributes", StringType),
    StructField("log_attributes", StringType),
    StructField("dropped_attributes_count", IntegerType),
    StructField("flags", IntegerType)))

  def traces(nsAsLong: Boolean = false): StructType = StructType(Seq(
    ts("start_time_unix_nano", nsAsLong),
    StructField("duration_time_unix_nano", LongType),
    StructField("trace_id", StringType),
    StructField("span_id", StringType),
    StructField("parent_span_id", StringType),
    StructField("trace_state", StringType),
    StructField("service_name", StringType),
    StructField("service_namespace", StringType),
    StructField("service_instance_id", StringType),
    StructField("name", StringType),
    StructField("kind", IntegerType),
    StructField("status_code", IntegerType),
    StructField("status_status_message", StringType),
    StructField("resource_attributes", StringType),
    StructField("scope_name", StringType),
    StructField("scope_version", StringType),
    StructField("scope_attributes", StringType),
    StructField("span_attributes", StringType),
    StructField("events_json", StringType),
    StructField("links_json", StringType),
    StructField("dropped_attributes_count", IntegerType),
    StructField("dropped_events_count", IntegerType),
    StructField("dropped_links_count", IntegerType),
    StructField("flags", IntegerType)))

  def metricsGauge(nsAsLong: Boolean = false): StructType = StructType(Seq(
    ts("time_unix_nano", nsAsLong),
    ts("start_time_unix_nano", nsAsLong),
    StructField("name", StringType),
    StructField("description", StringType),
    StructField("unit", StringType),
    StructField("int_value", LongType),
    StructField("double_value", DoubleType),
    StructField("service_name", StringType),
    StructField("service_namespace", StringType),
    StructField("service_instance_id", StringType),
    StructField("resource_attributes", StringType),
    StructField("scope_name", StringType),
    StructField("scope_version", StringType),
    StructField("scope_attributes", StringType),
    StructField("metric_attributes", StringType),
    StructField("flags", IntegerType),
    StructField("exemplars_json", StringType)))

  def metricsSum(nsAsLong: Boolean = false): StructType = StructType(
    metricsGauge(nsAsLong).fields ++ Seq(
      StructField("aggregation_temporality", IntegerType),
      StructField("is_monotonic", BooleanType)))

  def metricsHistogram(nsAsLong: Boolean = false): StructType = StructType(Seq(
    ts("time_unix_nano", nsAsLong),
    ts("start_time_unix_nano", nsAsLong),
    StructField("name", StringType),
    StructField("description", StringType),
    StructField("unit", StringType),
    StructField("count", LongType),
    StructField("sum", DoubleType),
    StructField("min", DoubleType),
    StructField("max", DoubleType),
    StructField("bucket_counts", ArrayType(LongType)),
    StructField("explicit_bounds", ArrayType(DoubleType)),
    StructField("service_name", StringType),
    StructField("service_namespace", StringType),
    StructField("service_instance_id", StringType),
    StructField("resource_attributes", StringType),
    StructField("scope_name", StringType),
    StructField("scope_version", StringType),
    StructField("scope_attributes", StringType),
    StructField("metric_attributes", StringType),
    StructField("flags", IntegerType),
    StructField("exemplars_json", StringType),
    StructField("aggregation_temporality", IntegerType)))

  def metricsExpHistogram(nsAsLong: Boolean = false): StructType = StructType(Seq(
    ts("time_unix_nano", nsAsLong),
    ts("start_time_unix_nano", nsAsLong),
    StructField("name", StringType),
    StructField("description", StringType),
    StructField("unit", StringType),
    StructField("count", LongType),
    StructField("sum", DoubleType),
    StructField("min", DoubleType),
    StructField("max", DoubleType),
    StructField("scale", IntegerType),
    StructField("zero_count", LongType),
    StructField("zero_threshold", DoubleType),
    StructField("positive_offset", IntegerType),
    StructField("positive_bucket_counts", ArrayType(LongType)),
    StructField("negative_offset", IntegerType),
    StructField("negative_bucket_counts", ArrayType(LongType)),
    StructField("service_name", StringType),
    StructField("service_namespace", StringType),
    StructField("service_instance_id", StringType),
    StructField("resource_attributes", StringType),
    StructField("scope_name", StringType),
    StructField("scope_version", StringType),
    StructField("scope_attributes", StringType),
    StructField("metric_attributes", StringType),
    StructField("flags", IntegerType),
    StructField("exemplars_json", StringType),
    StructField("aggregation_temporality", IntegerType)))

  def forSignal(signal: String, nsAsLong: Boolean = false): StructType = signal match {
    case "logs"                  => logs(nsAsLong)
    case "traces"                => traces(nsAsLong)
    case "metrics_gauge"         => metricsGauge(nsAsLong)
    case "metrics_sum"           => metricsSum(nsAsLong)
    case "metrics_histogram"     => metricsHistogram(nsAsLong)
    case "metrics_exp_histogram" => metricsExpHistogram(nsAsLong)
    case s if PlaceholderSignals.contains(s) =>
      throw new UnsupportedOperationException(
        s"read_otlp_$s is not implemented: use the shape-specific readers " +
          "(metrics_gauge, metrics_sum, metrics_histogram, metrics_exp_histogram)")
    case other =>
      throw new IllegalArgumentException(
        s"unknown OTLP signal '$other'; expected one of ${Signals.mkString(", ")}")
  }
}
