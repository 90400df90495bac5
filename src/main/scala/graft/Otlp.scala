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

  /** Read a signal back from the otlp_serve PARQUET EXPORT layout
    * (`root/otlp_<signal>/year=/month=/day=`), optionally pruned to a UTC
    * time range. The y/m/d partition columns derive from event time, so
    * the range predicate on them is evaluated against partition VALUES at
    * planning — a one-day query over a year of exports lists and reads
    * only that day's directories (PartitionFilters in the scan; the
    * mechanism behind the reference's time-scoped query pruning). The
    * precise-timestamp predicate still applies inside the surviving
    * partitions (timestamps are µs here; export partitions traces on
    * start time, everything else on time_unix_nano). */
  def readExport(spark: SparkSession, root: String, signal: String,
                 fromUtc: java.time.Instant = null,
                 toUtc: java.time.Instant = null): DataFrame = {
    import org.apache.spark.sql.functions._
    var df = spark.read.parquet(s"$root/otlp_$signal")
    if (fromUtc == null && toUtc == null) return df
    val tsCol =
      if (signal == "traces") "start_time_unix_nano" else "time_unix_nano"
    // partition discovery types y/m/d as ints; make_date avoids any
    // string-format dependence in the pruning predicate
    val day = make_date(col("year").cast("int"), col("month").cast("int"),
      col("day").cast("int"))
    def utcDay(i: java.time.Instant) =
      java.sql.Date.valueOf(i.atZone(java.time.ZoneOffset.UTC).toLocalDate)
    if (fromUtc != null)
      df = df.where(day >= lit(utcDay(fromUtc)) &&
        col(tsCol) >= lit(java.sql.Timestamp.from(fromUtc)))
    if (toUtc != null)
      df = df.where(day <= lit(utcDay(toUtc)) &&
        col(tsCol) <= lit(java.sql.Timestamp.from(toUtc)))
    df
  }

  /** The promoted-attribute read pattern (reference serve.md "Attribute
    * promotion": rows sealed BEFORE a key was promoted read back NULL in
    * its column, so portable queries across old and new data use
    * `COALESCE(resource_attr_k, json_extract_string(resource_attributes,
    * '$."k"'))`). `promotedCol("deployment.environment")` returns exactly
    * that column against any table/DataFrame carrying the serve layout —
    * typed to the promoted VARCHAR contract. When the promoted column
    * exists and is non-null the read never touches the JSON blob, so
    * min/max pruning and dictionary filters on the real column still
    * apply; only legacy rows pay the JSON extraction.
    *
    * `promotedScopeCol` is the scope_attributes twin. Column naming
    * matches promotion exactly (ServerConfig.promotedColumn — non-
    * alphanumerics become '_'). */
  def promotedCol(key: String): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    coalesce(
      col(graft.streaming.ServerConfig.promotedColumn(key)),
      get_json_object(col("resource_attributes"), s"$$['$key']"))
  }

  def promotedScopeCol(key: String): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    coalesce(
      col(graft.streaming.ServerConfig.promotedScopeColumn(key)),
      get_json_object(col("scope_attributes"), s"$$['$key']"))
  }

  /** View-builder form of [[promotedCol]]: overlays the coalesced read
    * pattern for each key as its promoted column name, so downstream
    * queries reference `resource_attr_k` uniformly regardless of WHEN
    * (or whether) the key was promoted. Three table shapes, one call:
    * a fully-promoted table keeps its real column for non-legacy rows
    * (min/max pruning still applies there), a mixed table coalesces per
    * row, and a never-promoted table — where the physical column does
    * not exist at all, so [[promotedCol]] would fail to resolve — reads
    * purely from the JSON blob. */
  def promotedView(df: org.apache.spark.sql.DataFrame,
                   keys: Seq[String]): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    keys.foldLeft(df) { (d, k) =>
      val name = graft.streaming.ServerConfig.promotedColumn(k)
      val fromJson = get_json_object(col("resource_attributes"), s"$$['$k']")
      d.withColumn(name,
        if (d.columns.contains(name)) coalesce(col(name), fromJson)
        else fromJson)
    }
  }

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
