package graft.queries

import graft.{Otlp, QSpec}
import graft.QSpec._
import org.apache.spark.sql.functions._

/** The OTLP reader surface exposed as registry queries (rows-only driver
  * checks — DuckDB has no OTLP extension loaded on the oracle side, so the
  * value-level goldens live in OtlpReaderSpec/OtlpProtoSpec/OtapReaderSpec).
  * Fixture inputs ship with the repo; paths are absolute because the driver
  * runs Verify from its own working directory. */
object OtlpReaders {
  private val fx = "/root/repo/src/test/resources/otlp"

  val all: Seq[QSpec] = Seq(
    noOracle("otlp_read_logs") { (s, _) =>
      Otlp.readLogs(s, s"$fx/logs_simple.jsonl")
        .select("time_unix_nano", "service_name", "severity_text", "body",
          "trace_id", "log_attributes")
        .orderBy("time_unix_nano")
    },
    noOracle("otlp_read_traces") { (s, _) =>
      Otlp.readTraces(s, s"$fx/traces_simple.jsonl")
        .select("start_time_unix_nano", "trace_id", "span_id", "name", "kind",
          "duration_time_unix_nano", "status_code")
        .orderBy("start_time_unix_nano", "span_id")
    },
    noOracle("otlp_read_metrics_gauge") { (s, _) =>
      Otlp.readMetricsGauge(s, s"$fx/metrics_all_types.jsonl")
        .select("time_unix_nano", "name", "double_value", "metric_attributes")
        .orderBy("name")
    },
    noOracle("otlp_read_metrics_sum") { (s, _) =>
      Otlp.readMetricsSum(s, s"$fx/metrics_all_types.jsonl")
        .select("time_unix_nano", "name", "int_value",
          "aggregation_temporality", "is_monotonic")
        .orderBy("name")
    },
    noOracle("otlp_read_metrics_histogram") { (s, _) =>
      Otlp.readMetricsHistogram(s, s"$fx/metrics_all_types.jsonl")
        .select("name", "count", "sum", "bucket_counts", "explicit_bounds",
          "aggregation_temporality")
        .orderBy("name")
    },
    noOracle("otlp_read_metrics_exp_histogram") { (s, _) =>
      Otlp.readMetricsExpHistogram(s, s"$fx/metrics_all_types.jsonl")
        .select("name", "count", "scale", "zero_count", "positive_offset",
          "positive_bucket_counts", "negative_offset", "negative_bucket_counts")
        .orderBy("name")
    },
    // aggregation over a reader scan: the minimum end-to-end slice widened
    noOracle("otlp_logs_severity_rollup") { (s, _) =>
      Otlp.readLogs(s, s"$fx/logs_simple.jsonl")
        .groupBy("service_name", "severity_text")
        .agg(count(lit(1)).as("cnt"))
        .orderBy("service_name", "severity_text")
    }
  )
}
