package graft.streaming

import graft.otlp.OtlpSchemas
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import java.sql.Timestamp

/** Structured-Streaming analytics over the live-ingest output: the seal
  * pipeline lands telemetry as partitioned parquet (SealWriter), and these
  * streams `readStream` that layout — so the OTLP server's group-commits
  * become micro-batches downstream without any coupling between the two
  * processes. This is the Spark-native continuation the reference leaves to
  * its host engine (it has no event-time/window machinery at all —
  * README "Late/duplicate data handling: none"; SURVEY §2.3): watermarks,
  * windowed aggregation, and custom per-trace state are *extensions* that
  * Structured Streaming gives the same storage layout.
  *
  * Scale: file-source streams list only new files per micro-batch (the seal
  * layout appends, never rewrites, and compaction is gated to parquet-part
  * rewrites inside a partition the stream has already passed — set
  * `maxFileAge` / start fresh checkpoints accordingly); state stores are
  * keyed by (window, service) or trace_id — both high-cardinality uniform
  * keys that partition cleanly across executors.
  */
object TelemetryStreams {

  /** One window length of extra state-expiry slack, in milliseconds —
    * parsed from the same duration-string dialect the window()/watermark
    * options use ("1 minute", "30 seconds", ...). Driver-side, once per
    * stream start. */
  private[streaming] def windowSlackMs(windowLen: String): Long = {
    val iv = org.apache.spark.sql.catalyst.util.IntervalUtils.stringToInterval(
      org.apache.spark.unsafe.types.UTF8String.fromString(windowLen))
    require(iv.months == 0, s"window length must be day-scale or finer: $windowLen")
    iv.days * 86400000L + iv.microseconds / 1000L
  }

  /** Stream of sealed log rows from a parquet-export root. */
  def logStream(spark: SparkSession, parquetRoot: String): DataFrame =
    spark.readStream
      .schema(OtlpSchemas.logs())
      .option("pathGlobFilter", "*.parquet")
      .option("recursiveFileLookup", "true") // partition dirs year=/month=/day=
      .parquet(s"$parquetRoot/otlp_logs")

  /** Stream of sealed span rows. */
  def traceStream(spark: SparkSession, parquetRoot: String): DataFrame =
    spark.readStream
      .schema(OtlpSchemas.traces())
      .option("pathGlobFilter", "*.parquet")
      .option("recursiveFileLookup", "true")
      .parquet(s"$parquetRoot/otlp_traces")

  /** Windowed severity counts per service with an event-time watermark:
    * the standard error-rate stream. Late rows beyond the watermark are
    * dropped (documented extension over the reference's no-watermark
    * contract). */
  def severityRate(logs: DataFrame, windowLen: String = "1 minute",
                   watermark: String = "2 minutes"): DataFrame =
    logs
      .withWatermark("time_unix_nano", watermark)
      .groupBy(
        window(col("time_unix_nano"), windowLen).as("w"),
        col("service_name"), col("severity_text"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("w.start").as("window_start"), col("w.end").as("window_end"),
        col("service_name"), col("severity_text"), col("cnt"))

  /** Windowed RED metrics on the span stream — the live face of
    * `operators.Traces.redMetrics`: per (window, service, span name) the
    * span rate, error count (status code 2), and total/max duration. The
    * operational dashboard feed, watermark-bounded like every windowed
    * stream here. */
  def redRate(spans: DataFrame, windowLen: String = "1 minute",
              watermark: String = "2 minutes"): DataFrame =
    spans
      .withWatermark("start_time_unix_nano", watermark)
      .groupBy(
        window(col("start_time_unix_nano"), windowLen).as("w"),
        col("service_name"), col("name"))
      .agg(count(lit(1)).as("n_spans"),
        sum(when(col("status_code") === 2, 1L).otherwise(0L)).as("n_errors"),
        sum(col("duration_time_unix_nano").cast("long")).as("total_ns"),
        max(col("duration_time_unix_nano").cast("long")).as("max_ns"))
      .select(col("w.start").as("window_start"), col("w.end").as("window_end"),
        col("service_name"), col("name").as("span_name"),
        col("n_spans"), col("n_errors"), col("total_ns"), col("max_ns"))

  /** Windowed exception counts on the live span stream — the streaming
    * face of `operators.Traces.exceptionReport`: span events named
    * 'exception' (the OTel semantic convention) roll up per (window,
    * service, exception type). The from_json + explode of each row's own
    * events array is stateless, so the windowed aggregation and the
    * replay dedup are the only state, watermark-bounded like every
    * windowed stream here. The seal export is at-least-once: a replayed
    * span must not double its exception counts, so spans dedup on
    * (trace_id, span_id) within the watermark — the batch twin's
    * convention, applied before the explode.
    *
    * Known divergence from the batch twin (ADVICE r10): the stream keys
    * dedup on span identity (first row wins), while the batch
    * `Replay.dedupWithin` drops only BYTE-EQUAL rows — two rows sharing
    * (trace_id, span_id) but differing in events_json count once here and
    * twice in batch. Under the byte-equal-replay contract such rows do not
    * occur (a replayed seal row is byte-identical); if a producer ever
    * re-emits a span with amended events, batch counts both emissions and
    * the stream counts the first. */
  def exceptionRate(spans: DataFrame, windowLen: String = "1 minute",
                    watermark: String = "2 minutes"): DataFrame = {
    val evType = org.apache.spark.sql.types.DataType.fromDDL(
      "array<struct<time_unix_nano:bigint,name:string," +
        "attributes:map<string,string>>>")
      .asInstanceOf[org.apache.spark.sql.types.ArrayType]
    spans
      .withWatermark("start_time_unix_nano", watermark)
      // filter BEFORE the dedup: replays are byte-equal, so dropping
      // event-less spans first is semantically identical and bounds the
      // dedup state by the (rare) event-bearing spans, not span volume
      .where(col("events_json").isNotNull)
      .dropDuplicatesWithinWatermark("trace_id", "span_id")
      .select(col("start_time_unix_nano"), col("service_name"),
        explode(from_json(col("events_json"), evType)).as("e"))
      .where(col("e.name") === "exception")
      .groupBy(
        window(col("start_time_unix_nano"), windowLen).as("w"),
        col("service_name"),
        coalesce(element_at(col("e.attributes"), "exception.type"),
          lit("unknown")).as("exception_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("w.start").as("window_start"), col("w.end").as("window_end"),
        col("service_name"), col("exception_type"), col("n_events"))
  }

  /** Windowed cross-series aggregation on the live sum-metric stream — the
    * streaming face of `operators.Metrics.sumBy` (PromQL `sum by (name)`
    * over time windows): per (window, name) the summed value and the point
    * count across every replica series. The batch form sums at exact
    * timestamps; a stream cannot wait for same-instant alignment, so the
    * window IS the alignment — the standard dashboard semantics.
    * Watermark-bounded state like every windowed stream here. */
  def sumByStream(sums: DataFrame, windowLen: String = "1 minute",
                  watermark: String = "2 minutes"): DataFrame = {
    val v = coalesce(col("double_value"), col("int_value").cast("double"))
    sums
      .withWatermark("time_unix_nano", watermark)
      // the seal export is at-least-once: a byte-equal replayed point must
      // not double into the window sum (the batch twin distinct()s; the
      // stream dedups on the full point identity within the watermark)
      .dropDuplicatesWithinWatermark()
      .where(v.isNotNull)
      .withColumn("__v", v)
      .groupBy(window(col("time_unix_nano"), windowLen).as("w"), col("name"))
      .agg(round(sum(col("__v")), 6).as("value"),
        count(lit(1)).as("n_points"))
      .select(col("w.start").as("window_start"), col("w.end").as("window_end"),
        col("name"), col("value"), col("n_points"))
  }

  /** Windowed range-vector aggregation on the live sum-metric stream —
    * the streaming face of `operators.Metrics.overTime`: per (window,
    * FULL series identity — the batch twin's exact key, so two services
    * sharing a metric name, or one exporter emitting distinct
    * metric_attributes label sets, never merge) the window's
    * avg/min/max/last/count. The recording-rule downsampler running AT
    * ingest instead of over the stored table; `last_value` takes the
    * window's max event time (value tiebreak), deterministic like the
    * batch twin. Replay dedup on full point identity within the
    * watermark (the sumByStream convention); watermark-bounded window
    * state, nothing else. */
  def overTimeStream(sums: DataFrame, windowLen: String = "1 minute",
                     watermark: String = "2 minutes"): DataFrame = {
    val v = coalesce(col("double_value"), col("int_value").cast("double"))
    val series = graft.operators.Metrics.seriesKey
    sums
      .withWatermark("time_unix_nano", watermark)
      .dropDuplicatesWithinWatermark()
      .where(v.isNotNull)
      .withColumn("__v", v)
      .groupBy(window(col("time_unix_nano"), windowLen).as("w") +: series: _*)
      .agg(round(avg(col("__v")), 6).as("avg_value"),
        min(col("__v")).as("min_value"),
        max(col("__v")).as("max_value"),
        max(struct(col("time_unix_nano").as("t"), col("__v").as("v")))
          .getField("v").as("last_value"),
        count(lit(1)).as("n_points"))
      .select(col("w.start").as("window_start") +:
        col("w.end").as("window_end") +: series :+ col("avg_value") :+
        col("min_value") :+ col("max_value") :+ col("last_value") :+
        col("n_points"): _*)
  }

  /** SLO error-budget burn rate on the LIVE span stream — the streaming
    * face of `operators.Traces.burnRate`, and the operator that is
    * inherently live: multi-window burn-rate alerting (SRE workbook ch. 5)
    * pages on the STREAM, not on yesterday's table. Per (window, service):
    * span count, error count (status code 2), observed error rate, and
    * burn = error rate / (1 − SLO target). The batch twin's aligned
    * `windowSec` grid and the stream's `window()` are both epoch-aligned,
    * so equal window lengths yield identical buckets (stream≡batch
    * spec-pinned). Replay dedup on span identity within the watermark
    * (the [[exceptionRate]] convention); windowed-aggregation state only. */
  def burnRateStream(spans: DataFrame, sloTarget: Double,
                     windowLen: String = "5 minutes",
                     watermark: String = "10 minutes"): DataFrame = {
    require(sloTarget > 0.0 && sloTarget < 1.0, s"bad SLO target $sloTarget")
    spans
      .withWatermark("start_time_unix_nano", watermark)
      .dropDuplicatesWithinWatermark("trace_id", "span_id")
      .groupBy(
        window(col("start_time_unix_nano"), windowLen).as("w"),
        col("service_name"))
      .agg(count(lit(1)).as("n_spans"),
        sum(when(col("status_code") === 2, 1L).otherwise(0L)).as("n_errors"))
      .select(col("w.start").as("window_start"), col("w.end").as("window_end"),
        col("service_name"), col("n_spans"), col("n_errors"),
        round(col("n_errors").cast("double") / col("n_spans"), 6)
          .as("error_rate"),
        round((col("n_errors").cast("double") / col("n_spans")) /
          lit(1.0 - sloTarget), 4).as("burn_rate"))
  }

  /** Multi-window multi-burn alert on the LIVE span stream — the
    * streaming face of `operators.Traces.multiBurnAlert`: ONE windowed
    * aggregation carries both arms, because closing-slice membership is
    * a pure map on the event time (`epoch-sec mod longSec ≥ longSec −
    * shortSec` — the last aligned short window inside each long one,
    * exactly the batch operator's join partner). A closed (window,
    * service) row emits only when the long burn AND the closing
    * slice's burn both reach `threshold`; windows whose closing slice
    * saw no spans stay silent (the batch join-drop: no current traffic
    * is not currently burning). Append mode; stream ≡ batch for
    * windows fully inside the frame (spec-pinned). */
  def multiBurnStream(spans: DataFrame, sloTarget: Double,
                      longSec: Long = 300, shortSec: Long = 60,
                      threshold: Double = 1.0,
                      watermark: String = "10 minutes"): DataFrame = {
    require(sloTarget > 0.0 && sloTarget < 1.0, s"bad SLO target $sloTarget")
    // shortSec > 0 explicitly: a negative shortSec passes the divisibility
    // check but makes the closing predicate vacuously false — the batch
    // twin throws here, so the stream must too (stream≡batch contract)
    require(shortSec > 0 && longSec > shortSec && longSec % shortSec == 0,
      s"shortSec must be positive and divide longSec " +
        s"(got $shortSec / $longSec)")
    val closing =
      pmod(unix_timestamp(col("start_time_unix_nano")), lit(longSec)) >=
        lit(longSec - shortSec)
    val err = col("status_code") === 2
    spans
      .withWatermark("start_time_unix_nano", watermark)
      .dropDuplicatesWithinWatermark("trace_id", "span_id")
      .withColumn("__closing", closing)
      .groupBy(
        window(col("start_time_unix_nano"), s"$longSec seconds").as("w"),
        col("service_name"))
      .agg(count(lit(1)).as("n_spans"),
        sum(when(err, 1L).otherwise(0L)).as("n_errors"),
        sum(when(col("__closing"), 1L).otherwise(0L)).as("__ns"),
        sum(when(col("__closing") && err, 1L).otherwise(0L)).as("__ne"))
      .where(col("__ns") > 0)
      .select(col("w.start").as("window_start"), col("service_name"),
        col("n_spans"), col("n_errors"),
        round((col("n_errors").cast("double") / col("n_spans")) /
          lit(1.0 - sloTarget), 4).as("long_burn"),
        round((col("__ne").cast("double") / col("__ns")) /
          lit(1.0 - sloTarget), 4).as("short_burn"))
      .where(col("long_burn") >= threshold && col("short_burn") >= threshold)
  }

  /** Period-to-date ERROR BUDGET on the LIVE span stream — the streaming
    * face of `operators.Traces.errorBudget`, and the panel SREs watch
    * BETWEEN the pages [[multiBurnStream]] raises: a running
    * (n_spans, n_errors) per service since stream start (the SLO
    * period — start a fresh checkpoint per period), re-emitting each
    * service's budget spent/remaining as it changes (update or complete
    * output mode; there is no window to close — the period IS the
    * window). Replayed spans dedup on (trace_id, span_id) with
    * UNBOUNDED state by design: period-to-date truth needs
    * period-long memory — the same price the batch twin pays by
    * re-scanning the period's seals, and attributionStream's documented
    * trade. Aggregation state is one row per service; dedup keys are
    * uniform random ids — both partition cleanly across executors.
    * Stream ≡ batch pinned on a mid-period micro-batch split. */
  def errorBudgetStream(spans: DataFrame, sloTarget: Double): DataFrame = {
    require(sloTarget > 0.0 && sloTarget < 1.0, s"bad SLO target $sloTarget")
    val rate = col("n_errors").cast("double") / col("n_spans")
    val burn = rate / lit(1.0 - sloTarget)
    spans
      .dropDuplicates("trace_id", "span_id")
      .groupBy(col("service_name"))
      .agg(count(lit(1)).as("n_spans"),
        sum(when(col("status_code") === 2, 1L).otherwise(0L)).as("n_errors"))
      .withColumn("error_rate", round(rate, 6))
      .withColumn("budget_used", round(burn, 4))
      .withColumn("budget_remaining", round(lit(1.0) - burn, 4))
  }

  /** LIVE service dependency edges — `operators.Traces.serviceGraph` on
    * the span stream, per event-time window: the repo's STREAM-STREAM
    * self-join (child × parent spans on (trace_id, parent = span)),
    * watermark-bounded with an explicit time-range predicate — a child
    * must start within [−skewSlackSec, +joinSlackSec] of its parent —
    * which is what lets Spark EVICT join state (an unbounded
    * parent-resolution join would hold every span forever); then one
    * windowed per-edge aggregation on the parent's start time.
    *
    * Semantics vs the batch twin: identical edges/counts for spans
    * whose parent resolves within the slack bounds (spec-pinned);
    * a child that starts further from its parent than the slack is
    * NOT resolved here by design (batch over sealed history remains
    * the no-bounds route). Late spans beyond the watermark drop per
    * the documented extension contract; WITHIN-watermark replays
    * double-count (the batch twin replay-dedups; chaining a dedup
    * before a stream-stream join is not supported) — feed
    * exactly-once micro-batches (the seal stream's contract) or
    * dedupe upstream.
    *
    * Scale: join state is watermark+slack-bounded per side, keyed by
    * uniform (trace, span) — partitions cleanly; the aggregation
    * rides (window, caller, callee) keys. */
  def serviceGraphStream(spans: DataFrame, windowLen: String = "5 minutes",
                         watermark: String = "10 minutes",
                         joinSlackSec: Long = 300,
                         skewSlackSec: Long = 60): DataFrame = {
    require(joinSlackSec > 0 && skewSlackSec >= 0,
      s"bad slack ($joinSlackSec, $skewSlackSec)")
    // the root-span filter sits BEFORE the watermark on purpose (the
    // optimizer would push it there anyway): the child side's watermark
    // advances only with CHILD spans, so an all-roots stream holds
    // windows open rather than emitting edges early — real traffic
    // always carries children, and making the placement explicit keeps
    // the behavior independent of pushdown rules
    val child = spans
      .where(col("parent_span_id").isNotNull && col("parent_span_id") =!= "")
      .withWatermark("start_time_unix_nano", watermark)
      .select(col("trace_id").as("t"), col("parent_span_id").as("p"),
        col("service_name").as("callee_service"),
        col("status_code").as("code"),
        col("duration_time_unix_nano").cast("long").as("dur"),
        col("start_time_unix_nano").as("cst"))
    val parent = spans.withWatermark("start_time_unix_nano", watermark)
      .select(col("trace_id").as("pt"), col("span_id").as("ps"),
        col("service_name").as("caller_service"),
        col("start_time_unix_nano").as("pst"))
    child.join(parent,
        col("t") === col("pt") && col("p") === col("ps") &&
          col("cst") >= col("pst") - expr(s"INTERVAL $skewSlackSec SECOND") &&
          col("cst") <= col("pst") + expr(s"INTERVAL $joinSlackSec SECOND"))
      .groupBy(window(col("pst"), windowLen).as("w"),
        col("caller_service"), col("callee_service"))
      .agg(count(lit(1)).as("n_calls"),
        sum(when(col("code") === 2, 1L).otherwise(0L)).as("n_errors"),
        sum(col("dur")).as("total_callee_ns"))
      .select(col("w.start").as("window_start"), col("caller_service"),
        col("callee_service"), col("n_calls"), col("n_errors"),
        col("total_callee_ns"))
  }

  /** Apdex on the LIVE span stream — the streaming face of
    * `operators.Traces.apdex`, windowed: per (window, service) the
    * satisfied (≤ T) / tolerating (≤ 4T) / frustrated buckets and the
    * Apdex score (satisfied + tolerating/2) / total, round(4). The batch
    * twin scores a settled table in one number; the stream scores each
    * aligned window — a window whose spans all fall inside it reports the
    * batch twin's exact score (spec-pinned). Null-duration spans are
    * excluded like the batch twin (only measured samples count). */
  def apdexStream(spans: DataFrame, thresholdNs: Long,
                  windowLen: String = "5 minutes",
                  watermark: String = "10 minutes"): DataFrame = {
    require(thresholdNs > 0, "thresholdNs must be positive")
    spans
      .withWatermark("start_time_unix_nano", watermark)
      .dropDuplicatesWithinWatermark("trace_id", "span_id")
      .where(col("duration_time_unix_nano").isNotNull)
      .withColumn("__dur", col("duration_time_unix_nano").cast("long"))
      .groupBy(
        window(col("start_time_unix_nano"), windowLen).as("w"),
        col("service_name"))
      .agg(count(lit(1)).as("n_spans"),
        sum(when(col("__dur") <= thresholdNs, 1L).otherwise(0L))
          .as("satisfied"),
        sum(when(col("__dur") > thresholdNs &&
          col("__dur") <= 4 * thresholdNs, 1L).otherwise(0L))
          .as("tolerating"),
        sum(when(col("__dur") > 4 * thresholdNs, 1L).otherwise(0L))
          .as("frustrated"))
      .select(col("w.start").as("window_start"), col("w.end").as("window_end"),
        col("service_name"), col("n_spans"), col("satisfied"),
        col("tolerating"), col("frustrated"),
        round((col("satisfied") + col("tolerating").cast("double") / 2) /
          col("n_spans"), 4).as("apdex"))
  }

  /** PromQL binary-op ratio on the LIVE sum-metric stream — the streaming
    * face of `operators.Metrics.ratioBy`: per (window [, kept labels])
    * the ratio of the two metrics' summed values. The batch form matches
    * at exact shared timestamps; a stream cannot wait for same-instant
    * alignment, so the window IS the alignment (the [[sumByStream]]
    * convention). Windows where the denominator is absent or zero drop —
    * no match, no sample, never a divide-by-zero. Replay dedup on full
    * point identity within the watermark; windowed state only. */
  def ratioByStream(sums: DataFrame, numName: String, denName: String,
                    by: Seq[String] = Seq.empty,
                    windowLen: String = "1 minute",
                    watermark: String = "2 minutes"): DataFrame = {
    require(numName != denName, "numerator and denominator must differ")
    val v = coalesce(col("double_value"), col("int_value").cast("double"))
    sums
      .withWatermark("time_unix_nano", watermark)
      .where(col("name").isin(numName, denName) && v.isNotNull)
      .dropDuplicatesWithinWatermark()
      .withColumn("__v", v)
      .groupBy(window(col("time_unix_nano"), windowLen).as("w") +:
        by.map(col): _*)
      .agg(sum(when(col("name") === numName, col("__v"))).as("num"),
        sum(when(col("name") === denName, col("__v"))).as("den"))
      .where(col("num").isNotNull && col("den").isNotNull &&
        col("den") =!= 0)
      .select(col("w.start").as("window_start") +:
        col("w.end").as("window_end") +: by.map(col) :+ col("num") :+
        col("den") :+ round(col("num") / col("den"), 6).as("ratio"): _*)
  }

  /** The logs → metrics COUNT CONNECTOR on the live stream — the
    * streaming face of `operators.Logs.logCountMetric`: per (window,
    * service, severity) log counts emitted as delta sum-metric points in
    * the metrics_sum shape, so the output COMPOSES with the metric
    * streams here ([[sumByStream]], [[overTimeStream]]) exactly like the
    * batch twin composes with the batch transforms. Same epoch-aligned
    * windows as the batch `windowSec` grid (stream≡batch spec-pinned);
    * watermark-bounded windowed state only, append-mode legal. */
  def logCountStream(logs: DataFrame, windowLen: String = "1 minute",
                     watermark: String = "2 minutes"): DataFrame =
    logs
      .withWatermark("time_unix_nano", watermark)
      .groupBy(
        window(col("time_unix_nano"), windowLen).as("w"),
        col("service_name"),
        coalesce(col("severity_text"), lit("UNSPECIFIED")).as("__sev"))
      .agg(count(lit(1)).as("int_value"))
      .select(lit("log.record.count").as("name"),
        col("service_name"),
        lit(null).cast("string").as("service_namespace"),
        lit(null).cast("string").as("service_instance_id"),
        lit(null).cast("string").as("resource_attributes"),
        lit("graft.count_connector").as("scope_name"),
        to_json(map(lit("severity_text"), col("__sev")))
          .as("metric_attributes"),
        col("w.start").as("time_unix_nano"),
        lit(true).as("is_monotonic"),
        lit(null).cast("double").as("double_value"),
        col("int_value"),
        lit(1).as("aggregation_temporality"))

  /** A span the rate limiter admitted, with its admission rank in its
    * (service, window) budget. */
  case class AdmittedSpan(service_name: String, window_start: Timestamp,
                          trace_id: String, span_id: String, rank: Long)

  /** Per-(service, window) admission state: how many spans passed. */
  case class LimitState(admitted: Long)

  /** Rate-limiting sampler on the LIVE span stream — the collector's
    * rate_limiting processor as custom state: at most `n` spans pass per
    * (service, aligned event-time window); the rest drop. ARRIVAL order
    * decides (the collector's actual behavior — it cannot wait to sort a
    * window by event time), which is the documented divergence from the
    * batch twin `operators.Traces.rateLimitSample`'s earliest-first
    * deterministic pick: batch audits what SHOULD have passed, the
    * stream enforces the budget live. State is ONE counter per active
    * (service, window), expired by event-time timeout once the
    * watermark passes the window (bounded by services × active
    * windows). */
  def rateLimitStream(spans: DataFrame, n: Long,
                      windowLen: String = "1 minute",
                      watermark: String = "2 minutes"): Dataset[AdmittedSpan] = {
    val spark = spans.sparkSession
    import spark.implicits._
    require(n > 0, "n must be positive")
    // the watermarked event-time column must survive projection into the
    // stateful operator or EventTimeTimeout refuses to bind (the
    // rateStream contract)
    val lite = spans
      .withWatermark("start_time_unix_nano", watermark)
      .select(col("start_time_unix_nano"),
        window(col("start_time_unix_nano"), windowLen)
          .getField("start").as("window_start"),
        col("service_name"), col("trace_id"), col("span_id"))
      .as[(Timestamp, Timestamp, String, String, String)]
    lite.groupByKey { case (_, w, svc, _, _) => (svc, w) }
      .flatMapGroupsWithState[LimitState, AdmittedSpan](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (_, _, state: GroupState[LimitState]) if state.hasTimedOut =>
          state.remove(); Iterator.empty
        case ((svc, w), it, state: GroupState[LimitState]) =>
          var admitted = state.getOption.map(_.admitted).getOrElse(0L)
          val out = it.flatMap { case (_, _, _, t, s) =>
            if (admitted < n) {
              admitted += 1
              Some(AdmittedSpan(svc, w, t, s, admitted))
            } else None
          }.toList
          state.update(LimitState(admitted))
          // expire one full window PAST the window end (timeout = start
          // + 2×windowLen): correctness does not depend on the slack —
          // Spark drops rows below the watermark before this operator
          // ever sees them — but the slack keeps the budget-reset safe
          // even if a future edit loosens that filtering
          state.setTimeoutTimestamp(w.getTime + windowSlackMs(windowLen),
            windowLen)
          out.iterator
      }
  }

  /** Live log-volume anomaly against a BATCH-MINED baseline — the
    * batch-mines/stream-scores split [[graft.operators.Logs.matchTemplates]]
    * established, applied to `operators.Logs.volumeAnomaly`: yesterday's
    * per-service mean/stddev (the batch operator's `svc_mean`/`svc_sd`
    * columns, or any frame shaped (service_name, svc_mean, svc_sd))
    * joins stream-static onto live windowed counts, z-scoring each
    * window AS IT CLOSES. A z-score needs a baseline; computing it on
    * the stream itself would make every window shift every past score —
    * the static split is the semantics, not a compromise. Services
    * absent from the baseline report null z (no baseline to deviate
    * from), matching the batch twin's no-baseline rule. Windowed
    * aggregation state only; stream-static joins are append-legal. */
  def volumeAnomalyStream(logs: DataFrame, baseline: DataFrame,
                          windowLen: String = "1 minute",
                          watermark: String = "2 minutes",
                          zThreshold: Double = 3.0): DataFrame =
    logs
      .withWatermark("time_unix_nano", watermark)
      .groupBy(window(col("time_unix_nano"), windowLen).as("w"),
        col("service_name"))
      .agg(count(lit(1)).as("n_logs"))
      // dropDuplicates: the batch volumeAnomaly output (the docstring's
      // blessed baseline) carries one row PER WINDOW with constant
      // per-service stats — joining it raw would emit each live window
      // once per baseline row (review finding)
      .join(baseline.select(col("service_name"), col("svc_mean"),
        col("svc_sd")).dropDuplicates("service_name"),
        Seq("service_name"), "left")
      .select(col("w.start").as("window_start"),
        col("w.end").as("window_end"),
        col("service_name"), col("n_logs"),
        round(col("svc_mean"), 4).as("svc_mean"),
        round(col("svc_sd"), 4).as("svc_sd"),
        when(col("svc_sd") > 0,
          round((col("n_logs") - col("svc_mean")) / col("svc_sd"), 4))
          .as("z"))
      .withColumn("anomaly",
        coalesce(abs(col("z")) >= zThreshold, lit(false)))

  /** Live windowed ERROR share — `operators.Logs.errorRate`'s streaming
    * face: severity normalization is map-only (the ONE rule,
    * `Logs.normalizeSeverity`), so the stream just windows the same two
    * conditional counts; a window always closes with ≥1 row, so the
    * ratio never divides by zero. Stream ≡ batch on the same frame
    * (same epoch-aligned grid). Windowed aggregation state only. */
  def errorRateStream(logs: DataFrame, windowLen: String = "1 minute",
                      watermark: String = "2 minutes"): DataFrame =
    graft.operators.Logs.normalizeSeverity(logs)
      .withWatermark("time_unix_nano", watermark)
      .groupBy(window(col("time_unix_nano"), windowLen).as("w"),
        col("service_name"))
      .agg(count(lit(1)).as("n_logs"),
        count(when(col("severity_canonical").isin("ERROR", "FATAL"),
          lit(1))).as("n_errors"))
      .select(col("w.start").as("window_start"), col("service_name"),
        col("n_logs"), col("n_errors"),
        round(col("n_errors") / col("n_logs"), 6).as("error_ratio"))

  /** Live SEASONAL anomaly scoring against a BATCH-MINED time-of-day
    * baseline — `operators.Metrics.seasonalAnomaly`'s streaming face
    * under the same static split: the batch [[graft.operators.Metrics
    * .seasonality]] profile (name, bucket, avg_value, stddev_value)
    * joins stream-static onto arriving points, scoring each against its
    * own hour/minute/day-of-week moments. MAP-ONLY on the stream (bucket
    * extraction + static join + arithmetic): no window, no state.
    * Zero-spread and absent buckets drop, |z| < k drops — exactly the
    * batch operator's output rule, so stream ≡ batch on the same frame. */
  def seasonalAnomalyStream(points: DataFrame, baseline: DataFrame,
                            bucket: String = "hour",
                            k: Double = 2.0): DataFrame = {
    // long, matching the batch operator's bucket type (the stream-static
    // join key must not need an implicit widening cast)
    val b = (bucket match {
      case "hour"   => hour(col("time_unix_nano"))
      case "minute" => minute(col("time_unix_nano"))
      case "dow"    => dayofweek(col("time_unix_nano"))
      case other => throw new IllegalArgumentException(
        s"unknown bucket: $other (hour|minute|dow)")
    }).cast("long")
    val v = coalesce(col("double_value"), col("int_value").cast("double"))
    points
      .withColumn("bucket", b)
      .where(v.isNotNull)
      .withColumn("value", v)
      // the batch profile carries one row per (name, bucket) already,
      // but dedup defensively like every static side here
      .join(baseline.select(col("name"), col("bucket"), col("avg_value"),
          col("stddev_value")).where(col("stddev_value") > 0)
          .dropDuplicates("name", "bucket"),
        Seq("name", "bucket"))
      .withColumn("z_score",
        round((col("value") - col("avg_value")) / col("stddev_value"), 6))
      .where(abs(col("z_score")) >= k)
      .select(col("name"), col("bucket"), col("time_unix_nano"),
        col("value"), col("avg_value"), col("stddev_value"), col("z_score"))
  }

  /** Live slow-outlier tagging against BATCH-MINED per-endpoint
    * thresholds — `operators.Traces.slowOutliers`'s streaming face under
    * the same static split: the batch operator's (service, span name,
    * threshold_ns) frame joins stream-static onto the raw span stream,
    * tagging each arriving span at or above its own endpoint's quantile
    * with its exceedance. MAP-ONLY on the stream (a filter + arithmetic
    * after the static join): no window, no state — the exemplar feed a
    * live dashboard pages on. */
  def slowOutliersStream(spans: DataFrame, thresholds: DataFrame): DataFrame =
    spans
      .select(col("service_name"), col("name").as("span_name"),
        col("trace_id"), col("span_id"),
        col("duration_time_unix_nano").cast("long").as("dur_ns"))
      // dropDuplicates: batch slowOutliers emits one row per tagged SPAN
      // (each carrying its endpoint's threshold), not one per endpoint —
      // joining it raw would tag every live span once per batch outlier
      .join(thresholds.select(col("service_name"), col("span_name"),
        col("threshold_ns")).dropDuplicates("service_name", "span_name"),
        Seq("service_name", "span_name"))
      .where(col("dur_ns") >= col("threshold_ns"))
      .withColumn("exceedance",
        round(col("dur_ns") / col("threshold_ns"), 4))

  /** Exact-duplicate suppression on the stream (trace_id+span_id within the
    * watermark horizon) — the dedup the reference documents as a downstream
    * responsibility for its at-least-once parquet path. */
  def dedupSpans(spans: DataFrame, watermark: String = "10 minutes"): DataFrame =
    spans
      .withWatermark("start_time_unix_nano", watermark)
      .dropDuplicatesWithinWatermark("trace_id", "span_id")

  /** Per-trace rollup state tracked with flatMapGroupsWithState. */
  case class TraceAgg(trace_id: String, spans: Long, error_spans: Long,
                      root_span: String, total_duration_ns: Long)

  /** Narrow span projection for the stateful rollup (public: Catalyst's
    * generated deserializer cannot touch private classes). */
  case class SpanLite(trace_id: String, span_id: String,
                      parent_span_id: Option[String], name: String,
                      status_code: Int, duration_ns: Long)

  /** Narrow sum-point projection for the streaming rate (public for
    * Catalyst's deserializer, like SpanLite). */
  case class SumPoint(ts: java.sql.Timestamp, name: String,
                      service_name: Option[String],
                      service_namespace: Option[String],
                      service_instance_id: Option[String],
                      resource_attributes: Option[String],
                      scope_name: Option[String],
                      metric_attributes: Option[String], t_us: Long,
                      value: Double, is_monotonic: Boolean)

  /** Last seen point per series — the whole state of the streaming rate. */
  case class SeriesLast(last_v: Double, last_t_us: Long)

  /** A rate observation: the point plus its per-second rate (None for a
    * series' first point and for late/out-of-order arrivals). Carries the
    * FULL series identity — two series distinguished only by namespace,
    * resource attributes, or scope must stay attributable to one producer
    * in the output, or the full-producer-identity state key is defeated at
    * the consumer (ADVICE r8). */
  case class RatePoint(name: String, service_name: Option[String],
                       service_namespace: Option[String],
                       service_instance_id: Option[String],
                       resource_attributes: Option[String],
                       scope_name: Option[String],
                       metric_attributes: Option[String], t_us: Long,
                       value: Double, rate_per_sec: Option[Double])

  /** Per-second rate on the LIVE cumulative-sum stream — the streaming
    * face of `operators.Metrics.rate`, whose lag-window form cannot run in
    * append mode: state is ONE (value, time) pair per series, each
    * arriving point emits its rate against the stored predecessor (same
    * counter-reset rule, same round(6), same FULL producer-identity
    * series key — two replicas of one service never merge), and the first
    * point of a series — or a point at/behind the stored time — emits a
    * null rate without rewinding state. Points later than the watermark
    * itself (more than `stalenessMs` behind the stream's max event time)
    * are dropped by the engine's standard late-data filter and emit
    * nothing. Series idle past the staleness horizon expire via the
    * event-time timeout (watermark-driven — no processing-time polling),
    * so state is bounded by the LIVE series set and a restarted series
    * just re-primes with one null. */
  def rateStream(sums: DataFrame, stalenessMs: Long = 3600000L)
      : Dataset[RatePoint] = {
    val spark = sums.sparkSession
    import spark.implicits._
    require(stalenessMs > 0, "stalenessMs must be positive")
    // the watermarked event-time column must survive projection all the
    // way into the stateful operator or EventTimeTimeout refuses to bind
    val lite = sums
      .withWatermark("time_unix_nano", s"$stalenessMs milliseconds")
      .select(col("time_unix_nano").as("ts"),
        col("name"), col("service_name"), col("service_namespace"),
        col("service_instance_id"), col("resource_attributes"),
        col("scope_name"), col("metric_attributes"),
        unix_micros(col("time_unix_nano")).as("t_us"),
        coalesce(col("double_value"), col("int_value").cast("double"))
          .as("value"),
        coalesce(col("is_monotonic"), lit(false)).as("is_monotonic"))
      .where(col("name").isNotNull && col("value").isNotNull)
      .as[SumPoint]
    def round6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    lite.groupByKey(p => (p.name, p.service_name, p.service_namespace,
        p.service_instance_id, p.resource_attributes, p.scope_name,
        p.metric_attributes))
      .flatMapGroupsWithState[SeriesLast, RatePoint](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (_, _, state: GroupState[SeriesLast]) if state.hasTimedOut =>
          state.remove(); Iterator.empty
        case (_, it, state: GroupState[SeriesLast]) =>
          val pts = it.toIndexedSeq.sortBy(_.t_us)
          var st = state.getOption
          val out = pts.map { p =>
            val rate = st.collect {
              case s if p.t_us > s.last_t_us =>
                val inc = if (p.is_monotonic && p.value < s.last_v) p.value
                          else p.value - s.last_v
                round6(inc / ((p.t_us - s.last_t_us) / 1e6))
            }
            if (st.forall(_.last_t_us < p.t_us))
              st = Some(SeriesLast(p.value, p.t_us))
            RatePoint(p.name, p.service_name, p.service_namespace,
              p.service_instance_id, p.resource_attributes, p.scope_name,
              p.metric_attributes, p.t_us, p.value, rate)
          }
          st.foreach { s =>
            state.update(s)
            state.setTimeoutTimestamp(s.last_t_us / 1000 + stalenessMs)
          }
          out.iterator
      }
  }

  /** Buffered per-trace state for the streaming tail sampler. */
  case class TailBuf(spans: List[SpanLite])

  /** A span the tail sampler decided to keep, tagged with why. */
  case class KeptSpan(trace_id: String, span_id: String, name: String,
                      status_code: Int, duration_ns: Long,
                      keep_reason: String)

  /** Tail-based trace sampling on the LIVE stream — the collector policy
    * `operators.Traces.tailSample` applies to settled tables, as custom
    * state: spans buffer per trace until the trace goes idle for
    * `decisionWaitMs` (the collector's decision wait), then the WHOLE
    * trace either emits — error spans present → 'error'; any span ≥
    * `slowNs` → 'slow'; else a deterministic md5 hash draw at
    * `sampleRate` → 'sampled' — or drops wholesale. The hash is
    * [[graft.operators.Sampling.hashUnitLocal]], bit-identical to the
    * batch operator's column form, so stream and batch keep EXACTLY the
    * same clean traces (same salt).
    *
    * State is one buffered span list per in-flight trace, keyed by the
    * uniform trace id and bounded by the decision window — the same
    * contract as [[traceRollup]]; a span arriving after its trace's
    * decision re-opens state and is judged (and possibly dropped) alone,
    * the standard late-span caveat of every tail sampler. */
  def tailSampleStream(spans: DataFrame, slowNs: Long, sampleRate: Double,
                       decisionWaitMs: Long = 10000,
                       salt: String = "tail"): Dataset[KeptSpan] = {
    val spark = spans.sparkSession
    import spark.implicits._
    require(sampleRate >= 0.0 && sampleRate <= 1.0, s"bad rate $sampleRate")
    val lite = spans.select(
        col("trace_id"), col("span_id"), col("parent_span_id"),
        col("name"), col("status_code"),
        col("duration_time_unix_nano").as("duration_ns"))
      .where(col("trace_id").isNotNull)
      .as[SpanLite]
    lite.groupByKey(_.trace_id)
      .flatMapGroupsWithState[TailBuf, KeptSpan](
        OutputMode.Append(), GroupStateTimeout.ProcessingTimeTimeout()) {
        case (traceId, it, state: GroupState[TailBuf]) =>
          if (state.hasTimedOut) {
            val buf = state.getOption.getOrElse(TailBuf(Nil))
            state.remove()
            val reason =
              if (buf.spans.exists(_.status_code == 2)) "error"
              else if (buf.spans.exists(_.duration_ns >= slowNs)) "slow"
              else if (graft.operators.Sampling
                .hashUnitLocal(traceId, salt) < sampleRate) "sampled"
              else null
            if (reason == null) Iterator.empty
            else buf.spans.reverseIterator.map(s => KeptSpan(traceId,
              s.span_id, s.name, s.status_code, s.duration_ns, reason))
          } else {
            val buf = state.getOption.getOrElse(TailBuf(Nil))
            state.update(TailBuf(it.foldLeft(buf.spans)((acc, s) => s :: acc)))
            state.setTimeoutDuration(decisionWaitMs)
            Iterator.empty
          }
      }
  }

  /** Custom-state operator: accumulate per-trace span counts / error counts
    * / root span name, emitting the running rollup on every update and
    * expiring idle traces via a processing-time timeout. */
  def traceRollup(spans: DataFrame, idleTimeoutMs: Long = 60000)
      : Dataset[TraceAgg] = {
    val spark = spans.sparkSession
    import spark.implicits._
    val lite = spans.select(
        col("trace_id"), col("span_id"), col("parent_span_id"),
        col("name"), col("status_code"),
        col("duration_time_unix_nano").as("duration_ns"))
      .where(col("trace_id").isNotNull)
      .as[SpanLite]
    lite.groupByKey(_.trace_id)
      .flatMapGroupsWithState[TraceAgg, TraceAgg](
        OutputMode.Append(), GroupStateTimeout.ProcessingTimeTimeout()) {
        case (traceId, spans, state: GroupState[TraceAgg]) =>
          if (state.hasTimedOut) {
            val out = state.getOption
            state.remove()
            out.iterator
          } else {
            var agg = state.getOption.getOrElse(TraceAgg(traceId, 0, 0, null, 0))
            spans.foreach { s =>
              agg = agg.copy(
                spans = agg.spans + 1,
                error_spans = agg.error_spans + (if (s.status_code == 2) 1 else 0),
                root_span = if (s.parent_span_id.isEmpty) s.name else agg.root_span,
                total_duration_ns = agg.total_duration_ns + s.duration_ns)
            }
            state.update(agg)
            state.setTimeoutDuration(idleTimeoutMs)
            Iterator(agg)
          }
      }
  }
}
