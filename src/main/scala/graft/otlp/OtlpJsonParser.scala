package graft.otlp

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, JsonNodeFactory, ObjectNode}

import java.math.BigInteger
import java.nio.charset.StandardCharsets
import scala.collection.mutable.ArrayBuffer

/** Parse failure — surfaces from the scan as
  * "OTLP parse error on <path>: <reason>" (reference
  * test/sql/read_otlp_timestamp_overflow.test error contract). */
final class OtlpParseException(msg: String) extends RuntimeException(msg)

/** OTLP/JSON + JSONL parser: one parse of a file's bytes yields the rows of
  * ALL signals found (logs, traces, and all four metric shapes at once —
  * reference src/function/read_otlp.cpp parse-once model, SURVEY.md §2.1).
  *
  * Behavioral contract pinned by the reference's SQLLogicTests:
  *   - JSONL: one export envelope per line; a single multi-line JSON
  *     document also parses (logs_document.json); empty file → 0 rows;
  *     whitespace-only file → error; any malformed line fails the whole
  *     scan (never partial rows).
  *   - an envelope must contain resourceLogs / resourceSpans /
  *     resourceMetrics (camelCase or snake_case) — anything else errors.
  *   - u64 timeUnixNano > i64::MAX → parse error (no clamp/null).
  *   - timestamps: 0 / absent → NULL; severity_number 0 → NULL;
  *     empty trace/span ids → NULL; ids lowercased hex.
  *   - enums accept both int and name-string encodings
  *     (AGGREGATION_TEMPORALITY_DELTA, SPAN_KIND_SERVER, ...).
  *   - summary metric points produce no rows (the summary reader is a
  *     registered placeholder); gauge/sum points with no value or a
  *     NaN/Inf double are skipped with a counter, not errored.
  *
  * Values are plain JVM objects (String/Long/Int/Boolean/Double/Array);
  * the DSv2 reader converts to Catalyst form, and the ingest server reuses
  * the same parser for external Rows.
  */
object OtlpJsonParser {
  private val mapper = new ObjectMapper()
  private val nf = JsonNodeFactory.instance
  private val I64Max = BigInteger.valueOf(Long.MaxValue)

  /** Per-parse skip counters (summary/NaN/Inf/missing-value points). */
  final case class Skipped(summaryPoints: Long, invalidPoints: Long)

  final case class ParsedFile(rows: Map[String, IndexedSeq[Array[Any]]],
                              skipped: Skipped) {
    def signal(name: String): IndexedSeq[Array[Any]] =
      rows.getOrElse(name, IndexedSeq.empty)
    def totalRows: Long = rows.valuesIterator.map(_.size.toLong).sum
  }

  // ---- field access helpers (camelCase with snake_case fallback) ----------

  private def get(n: JsonNode, camel: String, snake: String): JsonNode = {
    if (n == null) return null
    val c = n.get(camel)
    if (c != null && !c.isNull) c else {
      val s = n.get(snake)
      if (s != null && !s.isNull) s else null
    }
  }
  private def str(n: JsonNode, camel: String, snake: String): String = {
    val v = get(n, camel, snake)
    if (v == null) null else v.asText()
  }
  private def strOrNullIfEmpty(n: JsonNode, camel: String, snake: String): String = {
    val s = str(n, camel, snake)
    if (s == null || s.isEmpty) null else s
  }

  /** numeric text → BigInteger; malformed input is a parse error, not a
    * bare NumberFormatException escaping the error contract. */
  private def bigInt(txt: String): BigInteger =
    try new BigInteger(txt)
    catch { case _: NumberFormatException =>
      throw new OtlpParseException("Parse failed") }

  private def parseLong(txt: String): Long =
    try txt.toLong
    catch { case _: NumberFormatException =>
      throw new OtlpParseException("Parse failed") }

  /** u64 ns timestamp → Some(ns Long); None for 0/absent; error past i64. */
  private def tsNanos(n: JsonNode, camel: String, snake: String): Option[Long] = {
    val v = get(n, camel, snake)
    if (v == null) return None
    val txt = v.asText()
    if (txt.isEmpty) return None
    val bi = bigInt(txt)
    if (bi.signum() < 0) throw new OtlpParseException("Parse failed")
    if (bi.compareTo(I64Max) > 0) throw new OtlpParseException("Parse failed")
    val l = bi.longValue()
    if (l == 0L) None else Some(l)
  }

  /** u64 count field → Long with overflow guard; default when absent. */
  private def u64(n: JsonNode, camel: String, snake: String, default: Long = 0L): Long = {
    val v = get(n, camel, snake)
    if (v == null) return default
    val bi = bigInt(v.asText())
    if (bi.signum() < 0 || bi.compareTo(I64Max) > 0)
      throw new OtlpParseException("Parse failed")
    bi.longValue()
  }

  private def intField(n: JsonNode, camel: String, snake: String, default: Int = 0): Int = {
    val v = get(n, camel, snake)
    if (v == null) default else v.asInt(default)
  }

  /** Timestamp cell value under the ns policy (µs Long or raw-ns Long). */
  private def tsCell(ns: Option[Long], nsAsLong: Boolean): Any =
    ns.map(v => if (nsAsLong) v else Math.floorDiv(v, 1000L)).orNull

  /** hex id: lowercase; empty/absent → null. */
  private def hexId(n: JsonNode, camel: String, snake: String): String = {
    val s = str(n, camel, snake)
    if (s == null || s.isEmpty) null else s.toLowerCase
  }

  private def enumInt(n: JsonNode, camel: String, snake: String,
                      names: Map[String, Int], default: Int = 0): Int = {
    val v = get(n, camel, snake)
    if (v == null) default
    else if (v.isNumber) v.asInt()
    else names.getOrElse(v.asText(), v.asText().toIntOption.getOrElse(default))
  }

  private val TemporalityNames = Map(
    "AGGREGATION_TEMPORALITY_UNSPECIFIED" -> 0,
    "AGGREGATION_TEMPORALITY_DELTA" -> 1,
    "AGGREGATION_TEMPORALITY_CUMULATIVE" -> 2)
  private val KindNames = Map(
    "SPAN_KIND_UNSPECIFIED" -> 0, "SPAN_KIND_INTERNAL" -> 1,
    "SPAN_KIND_SERVER" -> 2, "SPAN_KIND_CLIENT" -> 3,
    "SPAN_KIND_PRODUCER" -> 4, "SPAN_KIND_CONSUMER" -> 5)
  private val StatusNames = Map(
    "STATUS_CODE_UNSET" -> 0, "STATUS_CODE_OK" -> 1, "STATUS_CODE_ERROR" -> 2)

  /** service.name / service.namespace / service.instance.id from resource
    * attributes (kept inside resource_attributes too — promotion reads them
    * back out of the JSON). */
  private def serviceTriple(resource: JsonNode): (String, String, String) = {
    var name: String = null; var ns: String = null; var inst: String = null
    val attrs = if (resource == null) null else get(resource, "attributes", "attributes")
    if (attrs != null && attrs.isArray) attrs.forEach { kv =>
      val k = str(kv, "key", "key")
      lazy val v = {
        val n = AttrJson.anyValueToNode(get(kv, "value", "value"))
        if (n.isNull) null else if (n.isTextual) n.asText() else n.toString
      }
      k match {
        case "service.name"        => name = v
        case "service.namespace"   => ns = v
        case "service.instance.id" => inst = v
        case _                     =>
      }
    }
    (name, ns, inst)
  }

  private def attrsJson(n: JsonNode): String =
    AttrJson.attrsToJson(if (n == null) null else get(n, "attributes", "attributes"))

  /** events/links/exemplars → compact JSON array text; null when absent/empty. */
  private def jsonArray(items: JsonNode)(render: JsonNode => ObjectNode): String = {
    if (items == null || !items.isArray || items.isEmpty) return null
    val arr = new ArrayNode(nf)
    items.forEach(e => arr.add(render(e)))
    AttrJson.compact(arr)
  }

  // ---- envelope iteration -------------------------------------------------

  /** Split file bytes into export-envelope JsonNodes (JSONL or single doc). */
  def envelopes(content: Array[Byte]): Iterator[JsonNode] = {
    if (content.isEmpty) return Iterator.empty
    val text = new String(content, StandardCharsets.UTF_8)
    if (text.trim.isEmpty)
      throw new OtlpParseException("invalid content (whitespace-only file)")
    val lines = text.split("\n").iterator.map(_.trim).filter(_.nonEmpty).toArray
    if (lineParses(lines.head)) {
      lines.iterator.map(parseLine)
    } else {
      val doc =
        try mapper.readTree(text)
        catch { case e: Exception =>
          throw new OtlpParseException(s"malformed JSON document: ${e.getMessage}") }
      Iterator.single(doc)
    }
  }

  /** One JSONL line → envelope node; OtlpParseException on malformed. */
  def parseLine(line: String): JsonNode =
    try mapper.readTree(line)
    catch { case e: Exception =>
      throw new OtlpParseException(s"malformed JSON line: ${e.getMessage}") }

  /** Whether a line parses standalone (NDJSON probe; no exception). */
  def lineParses(line: String): Boolean =
    try { mapper.readTree(line); true } catch { case _: Exception => false }

  // ---- main entry ---------------------------------------------------------

  def parse(content: Array[Byte], nsAsLong: Boolean = false,
            need: String => Boolean = _ => true): ParsedFile =
    parseEnvelopes(envelopes(content), nsAsLong, need)

  /** Row-build from already-materialized envelope nodes (shared with the
    * protobuf decoder, which converts wire format → the same node shape).
    *
    * `need` is the projection predicate: columns it rejects are emitted as
    * NULL and their (expensive) rendering — attribute-JSON serialization,
    * events/links/exemplars arrays, service-triple extraction — is skipped
    * entirely. This goes one step past the reference, whose parser
    * materializes every column regardless of projection (its documented
    * limitation, SURVEY §4.1). The full-width row layout is unchanged; the
    * DSv2 reader projects by index afterwards. */
  def parseEnvelopes(envs: Iterator[JsonNode], nsAsLong: Boolean,
                     need: String => Boolean = _ => true): ParsedFile = {
    val logs = ArrayBuffer[Array[Any]]()
    val traces = ArrayBuffer[Array[Any]]()
    val gauge = ArrayBuffer[Array[Any]]()
    val sum = ArrayBuffer[Array[Any]]()
    val hist = ArrayBuffer[Array[Any]]()
    val expHist = ArrayBuffer[Array[Any]]()
    var skippedSummary = 0L
    var skippedInvalid = 0L

    val needService = need("service_name") || need("service_namespace") ||
      need("service_instance_id")
    val needResAttrs = need("resource_attributes")
    val needScopeAttrs = need("scope_attributes")

    envs.foreach { env =>
      if (!env.isObject)
        throw new OtlpParseException("invalid OTLP envelope (not a JSON object)")
      val rls = get(env, "resourceLogs", "resource_logs")
      val rss = get(env, "resourceSpans", "resource_spans")
      val rms = get(env, "resourceMetrics", "resource_metrics")
      if (rls == null && rss == null && rms == null)
        throw new OtlpParseException(
          "invalid OTLP envelope (no resourceLogs/resourceSpans/resourceMetrics)")

      if (rls != null && rls.isArray) rls.forEach { rl =>
        val resource = get(rl, "resource", "resource")
        val (svcName, svcNs, svcInst) =
          if (needService) serviceTriple(resource) else (null, null, null)
        val resAttrs = if (needResAttrs) attrsJson(resource) else null
        val sls = get(rl, "scopeLogs", "scope_logs")
        if (sls != null && sls.isArray) sls.forEach { sl =>
          val scope = get(sl, "scope", "scope")
          val scopeName = if (scope == null) null else strOrNullIfEmpty(scope, "name", "name")
          val scopeVer = if (scope == null) null else strOrNullIfEmpty(scope, "version", "version")
          val scopeAttrs = if (needScopeAttrs) attrsJson(scope) else null
          val lrs = get(sl, "logRecords", "log_records")
          if (lrs != null && lrs.isArray) lrs.forEach { lr =>
            val sev = enumInt(lr, "severityNumber", "severity_number",
              SeverityNames, 0)
            val attrsNode = get(lr, "attributes", "attributes")
            val eventName = Option(strOrNullIfEmpty(lr, "eventName", "event_name"))
              .getOrElse(attrText(attrsNode, "event.name"))
            logs += Array[Any](
              tsCell(tsNanos(lr, "timeUnixNano", "time_unix_nano"), nsAsLong),
              tsCell(tsNanos(lr, "observedTimeUnixNano", "observed_time_unix_nano"), nsAsLong),
              hexId(lr, "traceId", "trace_id"),
              hexId(lr, "spanId", "span_id"),
              svcName, svcNs, svcInst,
              if (sev == 0) null else Int.box(sev),
              strOrNullIfEmpty(lr, "severityText", "severity_text"),
              eventName,
              AttrJson.anyValueToText(get(lr, "body", "body")),
              resAttrs, scopeName, scopeVer, scopeAttrs,
              if (need("log_attributes")) AttrJson.attrsToJson(attrsNode) else null,
              Int.box(intField(lr, "droppedAttributesCount", "dropped_attributes_count")),
              Int.box(intField(lr, "flags", "flags")))
          }
        }
      }

      if (rss != null && rss.isArray) rss.forEach { rs =>
        val resource = get(rs, "resource", "resource")
        val (svcName, svcNs, svcInst) =
          if (needService) serviceTriple(resource) else (null, null, null)
        val resAttrs = if (needResAttrs) attrsJson(resource) else null
        val sss = get(rs, "scopeSpans", "scope_spans")
        if (sss != null && sss.isArray) sss.forEach { ss =>
          val scope = get(ss, "scope", "scope")
          val scopeName = if (scope == null) null else strOrNullIfEmpty(scope, "name", "name")
          val scopeVer = if (scope == null) null else strOrNullIfEmpty(scope, "version", "version")
          val scopeAttrs = if (needScopeAttrs) attrsJson(scope) else null
          val spans = get(ss, "spans", "spans")
          if (spans != null && spans.isArray) spans.forEach { sp =>
            val startNs = tsNanos(sp, "startTimeUnixNano", "start_time_unix_nano")
            val endNs = tsNanos(sp, "endTimeUnixNano", "end_time_unix_nano")
            val duration = (startNs, endNs) match {
              case (Some(s), Some(e)) => e - s
              case _                  => 0L
            }
            val status = get(sp, "status", "status")
            traces += Array[Any](
              tsCell(startNs, nsAsLong),
              Long.box(duration),
              hexId(sp, "traceId", "trace_id"),
              hexId(sp, "spanId", "span_id"),
              hexId(sp, "parentSpanId", "parent_span_id"),
              strOrNullIfEmpty(sp, "traceState", "trace_state"),
              svcName, svcNs, svcInst,
              str(sp, "name", "name"),
              Int.box(enumInt(sp, "kind", "kind", KindNames)),
              Int.box(if (status == null) 0 else enumInt(status, "code", "code", StatusNames)),
              if (status == null) null else strOrNullIfEmpty(status, "message", "message"),
              resAttrs, scopeName, scopeVer, scopeAttrs,
              if (need("span_attributes"))
                AttrJson.attrsToJson(get(sp, "attributes", "attributes"))
              else null,
              if (!need("events_json")) null
              else jsonArray(get(sp, "events", "events")) { ev =>
                val o = new ObjectNode(nf)
                tsNanos(ev, "timeUnixNano", "time_unix_nano")
                  .foreach(v => o.put("time_unix_nano", v))
                val n = str(ev, "name", "name"); if (n != null) o.put("name", n)
                o.set[JsonNode]("attributes", mapper.readTree(
                  AttrJson.attrsToJson(get(ev, "attributes", "attributes"))))
                val d = intField(ev, "droppedAttributesCount", "dropped_attributes_count")
                if (d != 0) o.put("dropped_attributes_count", d)
                o
              },
              if (!need("links_json")) null
              else jsonArray(get(sp, "links", "links")) { lk =>
                val o = new ObjectNode(nf)
                val t = hexId(lk, "traceId", "trace_id"); if (t != null) o.put("trace_id", t)
                val s = hexId(lk, "spanId", "span_id"); if (s != null) o.put("span_id", s)
                val st = strOrNullIfEmpty(lk, "traceState", "trace_state")
                if (st != null) o.put("trace_state", st)
                o.set[JsonNode]("attributes", mapper.readTree(
                  AttrJson.attrsToJson(get(lk, "attributes", "attributes"))))
                val d = intField(lk, "droppedAttributesCount", "dropped_attributes_count")
                if (d != 0) o.put("dropped_attributes_count", d)
                o
              },
              Int.box(intField(sp, "droppedAttributesCount", "dropped_attributes_count")),
              Int.box(intField(sp, "droppedEventsCount", "dropped_events_count")),
              Int.box(intField(sp, "droppedLinksCount", "dropped_links_count")),
              Int.box(intField(sp, "flags", "flags")))
          }
        }
      }

      if (rms != null && rms.isArray) rms.forEach { rm =>
        val resource = get(rm, "resource", "resource")
        val (svcName, svcNs, svcInst) =
          if (needService) serviceTriple(resource) else (null, null, null)
        val resAttrs = if (needResAttrs) attrsJson(resource) else null
        val sms = get(rm, "scopeMetrics", "scope_metrics")
        if (sms != null && sms.isArray) sms.forEach { sm =>
          val scope = get(sm, "scope", "scope")
          val scopeName = if (scope == null) null else strOrNullIfEmpty(scope, "name", "name")
          val scopeVer = if (scope == null) null else strOrNullIfEmpty(scope, "version", "version")
          val scopeAttrs = if (needScopeAttrs) attrsJson(scope) else null
          val metrics = get(sm, "metrics", "metrics")
          if (metrics != null && metrics.isArray) metrics.forEach { m =>
            val mName = str(m, "name", "name")
            val mDesc = strOrNullIfEmpty(m, "description", "description")
            val mUnit = strOrNullIfEmpty(m, "unit", "unit")

            def pointCommon(dp: JsonNode): (Any, Any, String, String, Int) = (
              tsCell(tsNanos(dp, "timeUnixNano", "time_unix_nano"), nsAsLong),
              tsCell(tsNanos(dp, "startTimeUnixNano", "start_time_unix_nano"), nsAsLong),
              if (need("metric_attributes"))
                AttrJson.attrsToJson(get(dp, "attributes", "attributes"))
              else null,
              if (!need("exemplars_json")) null
              else jsonArray(get(dp, "exemplars", "exemplars")) { ex =>
                val o = new ObjectNode(nf)
                tsNanos(ex, "timeUnixNano", "time_unix_nano")
                  .foreach(v => o.put("time_unix_nano", v))
                val ai = get(ex, "asInt", "as_int")
                if (ai != null) o.put("as_int", parseLong(ai.asText()))
                val ad = get(ex, "asDouble", "as_double")
                if (ad != null) o.put("as_double", ad.asDouble())
                val t = hexId(ex, "traceId", "trace_id"); if (t != null) o.put("trace_id", t)
                val s = hexId(ex, "spanId", "span_id"); if (s != null) o.put("span_id", s)
                o.set[JsonNode]("filtered_attributes", mapper.readTree(
                  AttrJson.attrsToJson(get(ex, "filteredAttributes", "filtered_attributes"))))
                o
              },
              intField(dp, "flags", "flags"))

            /** asInt/asDouble → (int_value, double_value); None = skip. */
            def numberValue(dp: JsonNode): Option[(Any, Any)] = {
              val ai = get(dp, "asInt", "as_int")
              val ad = get(dp, "asDouble", "as_double")
              if (ai != null) Some((Long.box(parseLong(ai.asText())), null))
              else if (ad != null) {
                val d = ad.asDouble()
                if (d.isNaN || d.isInfinite) None
                else Some((null, Double.box(d)))
              } else None
            }

            def longArray(n: JsonNode): Array[Long] =
              if (n == null || !n.isArray) Array.empty
              else {
                val out = new Array[Long](n.size)
                var i = 0
                n.forEach { x =>
                  val bi = bigInt(x.asText())
                  if (bi.signum() < 0 || bi.compareTo(I64Max) > 0)
                    throw new OtlpParseException("Parse failed")
                  out(i) = bi.longValue(); i += 1
                }
                out
              }
            def doubleArray(n: JsonNode): Array[Double] =
              if (n == null || !n.isArray) Array.empty
              else { val out = new Array[Double](n.size); var i = 0
                n.forEach { x => out(i) = x.asDouble(); i += 1 }; out }
            def optDouble(dp: JsonNode, c: String, s: String): Any = {
              val v = get(dp, c, s); if (v == null) null else Double.box(v.asDouble())
            }

            val g = get(m, "gauge", "gauge")
            if (g != null) {
              val dps = get(g, "dataPoints", "data_points")
              if (dps != null && dps.isArray) dps.forEach { dp =>
                numberValue(dp) match {
                  case Some((iv, dv)) =>
                    val (t, st, attrs, ex, fl) = pointCommon(dp)
                    gauge += Array[Any](t, st, mName, mDesc, mUnit, iv, dv,
                      svcName, svcNs, svcInst, resAttrs, scopeName, scopeVer,
                      scopeAttrs, attrs, Int.box(fl), ex)
                  case None => skippedInvalid += 1
                }
              }
            }
            val su = get(m, "sum", "sum")
            if (su != null) {
              val temporality = enumInt(su, "aggregationTemporality",
                "aggregation_temporality", TemporalityNames)
              val monotonic = {
                val v = get(su, "isMonotonic", "is_monotonic")
                v != null && v.asBoolean(false)
              }
              val dps = get(su, "dataPoints", "data_points")
              if (dps != null && dps.isArray) dps.forEach { dp =>
                numberValue(dp) match {
                  case Some((iv, dv)) =>
                    val (t, st, attrs, ex, fl) = pointCommon(dp)
                    sum += Array[Any](t, st, mName, mDesc, mUnit, iv, dv,
                      svcName, svcNs, svcInst, resAttrs, scopeName, scopeVer,
                      scopeAttrs, attrs, Int.box(fl), ex,
                      Int.box(temporality), Boolean.box(monotonic))
                  case None => skippedInvalid += 1
                }
              }
            }
            val h = get(m, "histogram", "histogram")
            if (h != null) {
              val temporality = enumInt(h, "aggregationTemporality",
                "aggregation_temporality", TemporalityNames)
              val dps = get(h, "dataPoints", "data_points")
              if (dps != null && dps.isArray) dps.forEach { dp =>
                val (t, st, attrs, ex, fl) = pointCommon(dp)
                hist += Array[Any](t, st, mName, mDesc, mUnit,
                  Long.box(u64(dp, "count", "count")),
                  optDouble(dp, "sum", "sum"),
                  optDouble(dp, "min", "min"),
                  optDouble(dp, "max", "max"),
                  longArray(get(dp, "bucketCounts", "bucket_counts")),
                  doubleArray(get(dp, "explicitBounds", "explicit_bounds")),
                  svcName, svcNs, svcInst, resAttrs, scopeName, scopeVer,
                  scopeAttrs, attrs, Int.box(fl), ex, Int.box(temporality))
              }
            }
            val eh = get(m, "exponentialHistogram", "exponential_histogram")
            if (eh != null) {
              val temporality = enumInt(eh, "aggregationTemporality",
                "aggregation_temporality", TemporalityNames)
              val dps = get(eh, "dataPoints", "data_points")
              if (dps != null && dps.isArray) dps.forEach { dp =>
                val (t, st, attrs, ex, fl) = pointCommon(dp)
                val pos = get(dp, "positive", "positive")
                val neg = get(dp, "negative", "negative")
                expHist += Array[Any](t, st, mName, mDesc, mUnit,
                  Long.box(u64(dp, "count", "count")),
                  optDouble(dp, "sum", "sum"),
                  optDouble(dp, "min", "min"),
                  optDouble(dp, "max", "max"),
                  Int.box(intField(dp, "scale", "scale")),
                  Long.box(u64(dp, "zeroCount", "zero_count")),
                  optDouble(dp, "zeroThreshold", "zero_threshold"),
                  Int.box(if (pos == null) 0 else intField(pos, "offset", "offset")),
                  if (pos == null) Array.empty[Long]
                  else longArray(get(pos, "bucketCounts", "bucket_counts")),
                  Int.box(if (neg == null) 0 else intField(neg, "offset", "offset")),
                  if (neg == null) Array.empty[Long]
                  else longArray(get(neg, "bucketCounts", "bucket_counts")),
                  svcName, svcNs, svcInst, resAttrs, scopeName, scopeVer,
                  scopeAttrs, attrs, Int.box(fl), ex, Int.box(temporality))
              }
            }
            if (get(m, "summary", "summary") != null) {
              val dps = get(get(m, "summary", "summary"), "dataPoints", "data_points")
              if (dps != null && dps.isArray) skippedSummary += dps.size()
            }
          }
        }
      }
    }

    ParsedFile(Map(
      "logs" -> logs.toIndexedSeq, "traces" -> traces.toIndexedSeq,
      "metrics_gauge" -> gauge.toIndexedSeq, "metrics_sum" -> sum.toIndexedSeq,
      "metrics_histogram" -> hist.toIndexedSeq,
      "metrics_exp_histogram" -> expHist.toIndexedSeq),
      Skipped(skippedSummary, skippedInvalid))
  }

  private val SeverityNames: Map[String, Int] = {
    val base = Seq("TRACE" -> 1, "DEBUG" -> 5, "INFO" -> 9, "WARN" -> 13,
      "ERROR" -> 17, "FATAL" -> 21)
    base.flatMap { case (n, v) =>
      (0 until 4).map(i => s"SEVERITY_NUMBER_$n${if (i == 0) "" else (i + 1).toString}" -> (v + i))
    }.toMap + ("SEVERITY_NUMBER_UNSPECIFIED" -> 0)
  }

  /** First attribute with the given key rendered as text (event.name). */
  private def attrText(attrs: JsonNode, key: String): String = {
    if (attrs == null || !attrs.isArray) return null
    var out: String = null
    attrs.forEach { kv =>
      if (out == null && str(kv, "key", "key") == key)
        out = AttrJson.anyValueToText(get(kv, "value", "value"))
    }
    out
  }
}
