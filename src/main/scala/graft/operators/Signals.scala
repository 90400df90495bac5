package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cross-signal rollups — the operators that look at logs, spans, and
  * metric points TOGETHER (each per-signal family keeps its own file:
  * [[Logs]], [[Traces]], [[Metrics]]). */
object Signals {

  /** RESOURCE inventory: per service, the record count and time span of
    * each signal it emits — the "what telemetry does this service ship,
    * and since when" single-pane audit (the cross-signal face of
    * [[Metrics.metricInventory]] / [[Logs.scopeInventory]]). Services
    * missing a signal report 0 for it; first/last times span ALL
    * signals. Null service names group as their own row (mis-configured
    * SDKs are exactly what an audit must surface).
    *
    * Shape at 100 TB: each signal collapses INDEPENDENTLY to a
    * service-keyed rollup (one partial-agg exchange per signal; the
    * replay dedup keys by uniform (service, time) — service alone would
    * funnel a hot service's whole corpus into one window task, the r11
    * skew lesson), and only the three service-bounded frames
    * full-outer-join (NULL-SAFE keys, so null-service rollups from
    * different signals merge into the one audit row — the r11
    * null-label-key lesson) — the corpora never meet in one shuffle. */
  def resourceInventory(logs: DataFrame, spans: DataFrame,
                        points: DataFrame): DataFrame = {
    def roll(df: DataFrame, tCol: String, nName: String,
             alias: String): DataFrame =
      Replay.dedupWithin(df, Seq(col("service_name"), col(tCol)))
        .groupBy("service_name")
        .agg(count(lit(1)).as(nName),
          min(col(tCol)).as(s"__min_$nName"),
          max(col(tCol)).as(s"__max_$nName"))
        .withColumnRenamed("service_name", s"__svc_$alias")
    val l = roll(logs, "time_unix_nano", "n_logs", "l")
    val s = roll(spans, "start_time_unix_nano", "n_spans", "s")
    val p = roll(points, "time_unix_nano", "n_points", "p")
    l.join(s, col("__svc_l") <=> col("__svc_s"), "full_outer")
      .withColumn("__svc_ls", coalesce(col("__svc_l"), col("__svc_s")))
      .join(p, col("__svc_ls") <=> col("__svc_p"), "full_outer")
      .select(coalesce(col("__svc_ls"), col("__svc_p")).as("service_name"),
        coalesce(col("n_logs"), lit(0L)).as("n_logs"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("n_points"), lit(0L)).as("n_points"),
        least(col("__min_n_logs"), col("__min_n_spans"),
          col("__min_n_points")).as("first_time"),
        greatest(col("__max_n_logs"), col("__max_n_spans"),
          col("__max_n_points")).as("last_time"))
  }
}
