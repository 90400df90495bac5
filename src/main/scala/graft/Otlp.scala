package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** User-facing entry points mirroring the reference's 12 reader table
  * functions (reference src/storage/otlp_extension.cpp registration list):
  * `read_otlp_logs('path')` ≡ `Otlp.readLogs(spark, "path")` ≡
  * `spark.read.format("otlp").option("signal","logs").load(path)`. */
object Otlp {
  private def read(spark: SparkSession, signal: String, path: String,
                   options: Map[String, String]): DataFrame = {
    var r = spark.read.format("otlp").option("signal", signal)
    options.foreach { case (k, v) => r = r.option(k, v) }
    r.load(path)
  }

  def readLogs(spark: SparkSession, path: String,
               options: Map[String, String] = Map.empty): DataFrame =
    read(spark, "logs", path, options)
  def readTraces(spark: SparkSession, path: String,
                 options: Map[String, String] = Map.empty): DataFrame =
    read(spark, "traces", path, options)
  def readMetricsGauge(spark: SparkSession, path: String,
                       options: Map[String, String] = Map.empty): DataFrame =
    read(spark, "metrics_gauge", path, options)
  def readMetricsSum(spark: SparkSession, path: String,
                     options: Map[String, String] = Map.empty): DataFrame =
    read(spark, "metrics_sum", path, options)
  def readMetricsHistogram(spark: SparkSession, path: String,
                           options: Map[String, String] = Map.empty): DataFrame =
    read(spark, "metrics_histogram", path, options)
  def readMetricsExpHistogram(spark: SparkSession, path: String,
                              options: Map[String, String] = Map.empty): DataFrame =
    read(spark, "metrics_exp_histogram", path, options)

  /** Registered placeholders — throw like the reference's bind step. */
  def readMetrics(spark: SparkSession, path: String): DataFrame =
    read(spark, "metrics", path, Map.empty)
  def readMetricsSummary(spark: SparkSession, path: String): DataFrame =
    read(spark, "metrics_summary", path, Map.empty)

  /** OTAP (OTel-Arrow) twins: same schemas, Arrow IPC input. */
  def readOtapLogs(spark: SparkSession, path: String): DataFrame =
    read(spark, "logs", path, Map("format" -> "otap"))
  def readOtapTraces(spark: SparkSession, path: String): DataFrame =
    read(spark, "traces", path, Map("format" -> "otap"))
  def readOtapMetricsGauge(spark: SparkSession, path: String): DataFrame =
    read(spark, "metrics_gauge", path, Map("format" -> "otap"))
  def readOtapMetricsSum(spark: SparkSession, path: String): DataFrame =
    read(spark, "metrics_sum", path, Map("format" -> "otap"))
  def readOtapMetricsHistogram(spark: SparkSession, path: String): DataFrame =
    read(spark, "metrics_histogram", path, Map("format" -> "otap"))
  def readOtapMetricsExpHistogram(spark: SparkSession, path: String): DataFrame =
    read(spark, "metrics_exp_histogram", path, Map("format" -> "otap"))
}
