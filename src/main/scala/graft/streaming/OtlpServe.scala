package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

import scala.collection.concurrent.TrieMap

/** Control plane: the Spark-side analogs of the reference's six lifecycle
  * table functions (otlp_serve / otap_serve / otlp_stop / otlp_flush /
  * otlp_server_list / otlp_seal_list — src/otlp_start_stop.cpp) plus
  * otlp_uri_parser. Servers are registered per JVM keyed by canonical URI;
  * every function returns a DataFrame like its reference counterpart. */
object OtlpServe {
  private val registry = TrieMap[String, OtlpServer]()

  // ---- serve --------------------------------------------------------------

  def otlpServe(spark: SparkSession, uri: String = "otlp:localhost",
                params: Map[String, String] = Map.empty): DataFrame =
    serve(spark, "otlp_serve", uri, params)

  def otapServe(spark: SparkSession, uri: String,
                params: Map[String, String] = Map.empty): DataFrame =
    serve(spark, "otap_serve", uri, params)

  private def serve(spark: SparkSession, fn: String, uri: String,
                    params: Map[String, String]): DataFrame = {
    val cfg = ServerConfig(fn, uri, params)
    val key = cfg.uri.canonical
    registry.synchronized {
      if (registry.contains(key))
        throw new IllegalStateException("OTLP server already exists")
      val server = new OtlpServer(cfg, spark)
      try server.start()
      catch { case e: Exception => throw e }
      registry.put(key, server)
    }
    val schema = StructType(Seq(
      StructField("listen_uri", StringType), StructField("listen_url", StringType),
      StructField("auth_token", StringType), StructField("schema_name", StringType),
      StructField("logs_table", StringType), StructField("traces_table", StringType),
      StructField("metrics_gauge_table", StringType),
      StructField("metrics_sum_table", StringType),
      StructField("metrics_histogram_table", StringType),
      StructField("metrics_exp_histogram_table", StringType),
      StructField("catalog_name", StringType)))
    val row = Row(key, cfg.uri.url, cfg.token, cfg.schema,
      cfg.tableName("logs"), cfg.tableName("traces"),
      cfg.tableName("metrics_gauge"), cfg.tableName("metrics_sum"),
      cfg.tableName("metrics_histogram"), cfg.tableName("metrics_exp_histogram"),
      cfg.catalog)
    spark.createDataFrame(java.util.List.of(row), schema)
  }

  // ---- stop / flush -------------------------------------------------------

  def otlpStop(spark: SparkSession, uri: String): DataFrame = {
    val key = OtlpUri.parse(uri).canonical
    val schema = StructType(Seq(
      StructField("status", StringType), StructField("dropped_rows", LongType)))
    registry.remove(key) match {
      case Some(server) =>
        val dropped = server.stop()
        spark.createDataFrame(
          java.util.List.of(Row(s"Stopped listening on $key", dropped)), schema)
      case None =>
        spark.createDataFrame(
          java.util.List.of(Row(s"No server found listening on $key", 0L)), schema)
    }
  }

  def otlpFlush(spark: SparkSession, uri: String): DataFrame = {
    val key = OtlpUri.parse(uri).canonical
    val schema = StructType(Seq(
      StructField("status", StringType), StructField("sealed_rows", LongType),
      StructField("seals_total", LongType), StructField("error", StringType)))
    registry.get(key) match {
      case Some(server) =>
        val (rows, err) = server.flush()
        spark.createDataFrame(java.util.List.of(
          Row(if (err == null) "sealed" else "error", rows,
            server.sealsTotal.get(), err)), schema)
      case None =>
        spark.createDataFrame(java.util.List.of(
          Row(s"No server found listening on $key", 0L, 0L, null)), schema)
    }
  }

  /** Stop every server (test teardown helper). */
  def stopAll(spark: SparkSession): Unit =
    registry.keys.toSeq.foreach(k => otlpStop(spark, k))

  // ---- listings -----------------------------------------------------------

  def serverList(spark: SparkSession): DataFrame = {
    val schema = StructType(Seq(
      StructField("listen_uri", StringType), StructField("listen_url", StringType),
      StructField("transport", StringType), StructField("schema_name", StringType),
      StructField("catalog_name", StringType), StructField("target", StringType),
      StructField("is_listening", BooleanType), StructField("last_error", StringType),
      StructField("auth_enabled", BooleanType),
      StructField("active_requests", LongType), StructField("total_requests", LongType),
      StructField("total_rows", LongType), StructField("buffered_rows", LongType),
      StructField("buffered_bytes", LongType), StructField("admitted_bytes", LongType),
      StructField("seal_target_bytes", LongType), StructField("seal_max_age_ms", LongType),
      StructField("oldest_buffered_age_ms", LongType),
      StructField("seals_total", LongType), StructField("seal_failures_total", LongType),
      StructField("committed_rows_total", LongType),
      StructField("last_seal_age_ms", LongType), StructField("seal_last_error", StringType),
      StructField("maintenance_runs_total", LongType),
      StructField("maintenance_failures_total", LongType),
      StructField("last_maintenance_age_ms", LongType),
      StructField("maintenance_last_error", StringType),
      StructField("promoted_columns_total", IntegerType),
      StructField("buffered_wire_bytes", LongType),
      StructField("admitted_inflation_ratio", DoubleType),
      StructField("otap_streams_open", IntegerType),
      StructField("maintenance_deferrals_total", LongType),
      StructField("retention_deleted_files_total", LongType)))
    val now = System.currentTimeMillis()
    val rows = registry.values.toSeq.sortBy(_.cfg.uri.canonical).map { s =>
      Row(s.cfg.uri.canonical, s.cfg.uri.url, s.cfg.transport, s.cfg.schema,
        s.cfg.catalog, s.cfg.target, s.isListening, s.lastError,
        s.cfg.authEnabled,
        s.activeRequests.get(), s.totalRequests.get(),
        s.totalRowsBuffered.get(), s.bufferedRows, s.bufferedBytes,
        s.admittedBytes, s.cfg.sealTargetBytes, s.cfg.sealMaxAgeMs,
        s.oldestBufferedAgeMs.map(Long.box).orNull,
        s.sealsTotal.get(), s.sealFailuresTotal.get(),
        s.committedRowsTotal.get(),
        if (s.lastSealAtMs < 0) null else Long.box(now - s.lastSealAtMs),
        s.sealLastError,
        s.maintenanceRuns.get(), s.maintenanceFailures.get(),
        if (s.lastMaintenanceAtMs < 0) null else Long.box(now - s.lastMaintenanceAtMs),
        s.maintenanceLastError,
        s.promotedColumnsTotal,
        s.bufferedWireBytes,
        s.admittedInflationRatio.map(Double.box).orNull,
        s.otapStreamsOpen,
        s.maintenanceDeferrals.get(),
        s.retentionDeletedFilesTotal)
    }
    import scala.collection.JavaConverters._
    spark.createDataFrame(rows.asJava, schema)
  }

  def sealList(spark: SparkSession): DataFrame = {
    val schema = StructType(Seq(
      StructField("listen_uri", StringType), StructField("seq", LongType),
      StructField("success", BooleanType), StructField("error", StringType),
      StructField("rows", LongType), StructField("bytes", LongType),
      StructField("append_ms", LongType), StructField("commit_ms", LongType),
      StructField("trigger", StringType), StructField("signals_sealed", IntegerType),
      StructField("sealed_rows_total", LongType), StructField("seals_total", LongType),
      StructField("seal_failures_total", LongType), StructField("age_ms", LongType)))
    val now = System.currentTimeMillis()
    val rows = registry.values.toSeq.sortBy(_.cfg.uri.canonical).flatMap(_.sealHistory)
      .map(e => Row(e.listenUri, e.seq, e.success, e.error, e.rows, e.bytes,
        e.appendMs, e.commitMs, e.trigger, e.signalsSealed, e.sealedRowsTotal,
        e.sealsTotal, e.sealFailuresTotal, now - e.atMs))
    import scala.collection.JavaConverters._
    spark.createDataFrame(rows.asJava, schema)
  }

  /** otlp_uri_parser scalar analog: 1-row (host, port, ipv6, url). */
  def uriParser(spark: SparkSession, uri: String): DataFrame = {
    val p = OtlpUri.parse(uri)
    val schema = StructType(Seq(
      StructField("host", StringType), StructField("port", IntegerType),
      StructField("ipv6", BooleanType), StructField("url", StringType)))
    spark.createDataFrame(
      java.util.List.of(Row(p.host, p.port, p.ipv6, p.url)), schema)
  }

  /** Registered server (internal / test access). */
  def get(uri: String): Option[OtlpServer] =
    registry.get(OtlpUri.parse(uri).canonical)
}
