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
    * service-keyed rollup (one partial-agg exchange per signal, with the
    * replay dedup riding it), and only the three service-bounded frames
    * full-outer-join — the corpora never meet in one shuffle. */
  def resourceInventory(logs: DataFrame, spans: DataFrame,
                        points: DataFrame): DataFrame = {
    def roll(df: DataFrame, tCol: String, nName: String): DataFrame =
      Replay.dedupWithin(df, Seq(col("service_name")))
        .groupBy("service_name")
        .agg(count(lit(1)).as(nName),
          min(col(tCol)).as(s"__min_$nName"),
          max(col(tCol)).as(s"__max_$nName"))
    val l = roll(logs, "time_unix_nano", "n_logs")
    val s = roll(spans, "start_time_unix_nano", "n_spans")
    val p = roll(points, "time_unix_nano", "n_points")
    l.join(s, Seq("service_name"), "full_outer")
      .join(p, Seq("service_name"), "full_outer")
      .select(col("service_name"),
        coalesce(col("n_logs"), lit(0L)).as("n_logs"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("n_points"), lit(0L)).as("n_points"),
        least(col("__min_n_logs"), col("__min_n_spans"),
          col("__min_n_points")).as("first_time"),
        greatest(col("__max_n_logs"), col("__max_n_spans"),
          col("__max_n_points")).as("last_time"))
  }
}
