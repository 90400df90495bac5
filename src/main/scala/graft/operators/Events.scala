package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product-analytics operators over the events table (event_id, ts/ts_ns,
  * user_id, event_type, value, props) — the behavioral-funnel queries a
  * training-data pipeline runs to select users/sessions worth keeping,
  * next to the gap-based sessionization already in the registry
  * (ev_sessionize). Beyond-reference surface, built the Spark way.
  */
object Events {

  /** Ordered conversion FUNNEL: per user, the earliest occurrence of
    * step 1 anchors the funnel, and each later step counts only if it
    * occurs strictly AFTER the previous step's time and within
    * `windowNs` of the anchor (the classic entry-window funnel, not
    * per-hop windows). Reports one row per step: users reaching it and
    * the conversion ratio vs step 1, round(6).
    *
    * Shape at 100 TB: one user-keyed partial agg per step over that
    * step's type slice (uniform keys, map-side combine), each joined to
    * the previous step's user frame — k steps = k slice-sized joins,
    * never an events×events self-join; the final counts are single-row
    * aggregates per step (a ≤k-row frame). */
  def funnel(events: DataFrame, steps: Seq[String], windowNs: Long,
             userCol: String = "user_id", typeCol: String = "event_type",
             tsNsCol: String = "ts_ns"): DataFrame = {
    require(steps.size >= 2, "funnel needs at least two steps")
    require(steps.distinct.size == steps.size, "funnel steps must differ")
    require(windowNs > 0, "windowNs must be positive")
    val ev = events.select(col(userCol).as("u"), col(typeCol).as("ty"),
      col(tsNsCol).as("et"))
    var cur = ev.where(col("ty") === steps.head)
      .groupBy("u").agg(min(col("et")).as("t"))
      .withColumn("anchor", col("t"))
    var frames = List((1, steps.head, cur))
    steps.zipWithIndex.drop(1).foreach { case (st, k) =>
      cur = cur.select(col("u"), col("t").as("tp"), col("anchor"))
        .join(ev.where(col("ty") === st), Seq("u"))
        .where(col("et") > col("tp") &&
          col("et") <= col("anchor") + lit(windowNs))
        .groupBy("u")
        // anchor is constant per user: min() just carries it through
        .agg(min(col("et")).as("t"), min(col("anchor")).as("anchor"))
      frames = frames :+ ((k + 1, st, cur))
    }
    val counts = frames.map { case (i, st, f) =>
      f.agg(count(lit(1)).as("n_users"))
        .select(lit(i).as("step"), lit(st).as("step_type"), col("n_users"))
    }.reduce(_ unionByName _)
    // the counts frame is <= steps rows: the whole-frame window is fine
    val w = Window.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    counts.withColumn("conversion", round(
      col("n_users").cast("double") /
        max(when(col("step") === 1, col("n_users"))).over(w), 6))
  }

  /** Gap-based SESSIONIZATION as an operator (the registry's
    * ev_sessionize rule, reusable): projects events to
    * (u, ty, et, eid) and assigns `sess` — a per-user running session
    * ordinal that increments whenever the inactivity gap to the previous
    * event exceeds `gapNs`. ONE user-keyed window (uniform partitions
    * bounded by per-user history); shared by [[sessionPaths]] so the
    * session rule has one definition. */
  def sessionize(events: DataFrame, gapNs: Long = 3600000000000L,
                 userCol: String = "user_id",
                 typeCol: String = "event_type",
                 tsNsCol: String = "ts_ns",
                 idCol: String = "event_id"): DataFrame = {
    require(gapNs > 0, "gapNs must be positive")
    val wU = Window.partitionBy(col("u"))
      .orderBy(col("et"), col("eid"))
    val newSession = when(lag(col("et"), 1).over(wU).isNull ||
      col("et") - lag(col("et"), 1).over(wU) > gapNs, 1L).otherwise(0L)
    events.select(col(userCol).as("u"), col(typeCol).as("ty"),
        col(tsNsCol).as("et"), col(idCol).as("eid"))
      .withColumn("sess", sum(newSession).over(
        wU.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** Session ENTRY PATHS: the most common first-`k` event-type sequences
    * of gap-based sessions ([[sessionize]]'s rule) — "how do sessions
    * start", the navigation funnel-discovery complement to [[funnel]]'s
    * fixed-steps conversion. One row per observed path with its session
    * count.
    *
    * Shape at 100 TB: the session id is a user-keyed running sum (one
    * window, uniform user partitions bounded by per-user history), the
    * path assembly collects at most k rows per session, and the rollup
    * partial-aggregates onto the path space (≤ |event types|^k, tiny). */
  def sessionPaths(events: DataFrame, gapNs: Long = 3600000000000L,
                   k: Int = 3,
                   userCol: String = "user_id",
                   typeCol: String = "event_type",
                   tsNsCol: String = "ts_ns",
                   idCol: String = "event_id"): DataFrame = {
    require(k >= 1, "k must be positive")
    val base = sessionize(events, gapNs, userCol, typeCol, tsNsCol, idCol)
    val wS = Window.partitionBy(col("u"), col("sess"))
      .orderBy(col("et"), col("eid"))
    base.withColumn("rn", row_number().over(wS))
      .where(col("rn") <= k)
      .groupBy("u", "sess")
      .agg(concat_ws(">", expr(
        "transform(array_sort(collect_list(struct(rn, ty))), x -> x.ty)"))
        .as("path"))
      .groupBy("path")
      .agg(count(lit(1)).as("n_sessions"))
  }

  /** Cohort VALUE (LTV curve): cohort by first-event day ([[retention]]'s
    * rule); per (cohort day, day offset) the active users, that day's
    * summed value, the cohort's CUMULATIVE value, and cumulative value
    * per cohort user — the lifetime-value curve next to retention's
    * activity curve. Offset 0 always exists (the first event is on the
    * cohort day), so the cohort size is the first row's n_active.
    * round(4) on values, round(6) on the per-user ratio.
    *
    * Shape at 100 TB: one user-keyed partial agg (first day) joined
    * back user-keyed, a (cohort, offset) partial agg, and the running
    * sum windows over the days × offsets frame — tiny by construction. */
  def cohortValue(events: DataFrame,
                  userCol: String = "user_id",
                  tsCol: String = "ts",
                  valueCol: String = "value"): DataFrame = {
    val byOffset =
      cohortFrame(events, userCol, tsCol, Seq(col(valueCol).as("v")))
      .groupBy("cohort_day", "day_offset")
      .agg(countDistinct(col("u")).as("n_active"),
        round(sum(col("v")), 4).as("day_value"))
    val wC = Window.partitionBy(col("cohort_day")).orderBy(col("day_offset"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    byOffset
      .withColumn("cum_value", round(sum(col("day_value")).over(wC), 4))
      .withColumn("cohort_size", first(col("n_active")).over(wC))
      .withColumn("ltv_per_user",
        round(col("cum_value") / col("cohort_size"), 6))
  }

  /** Engagement GINI: the inequality coefficient of events-per-user —
    * 0 = every user equally active, →1 = a few users generate everything;
    * the one-number summary behind per-user caps and contributor-skew
    * dashboards, computed exactly via the Lorenz-curve trapezoid rule
    * over the grouped count-of-counts. round(6).
    *
    * Shape at 100 TB: events collapse to per-user counts (uniform
    * partial agg), those collapse to the COUNT HISTOGRAM (n → users
    * with n events) — a frame bounded by the distinct activity levels,
    * thousands of rows at any corpus size — and only that tiny frame
    * passes through the ordered cumulative window (single-partition by
    * construction, bounded, never the user space). */
  def engagementGini(events: DataFrame,
                     userCol: String = "user_id"): DataFrame = {
    val hist = events.groupBy(col(userCol).as("u"))
      .agg(count(lit(1)).as("n"))
      .groupBy("n").agg(count(lit(1)).as("nu"))
    val tot = hist.agg(sum(col("nu")).as("tu"),
      sum(col("n") * col("nu")).as("te"))
    val wOrd = Window.orderBy(col("n"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    hist.crossJoin(broadcast(tot))
      .withColumn("p", sum(col("nu")).over(wOrd) / col("tu"))
      .withColumn("l", sum(col("n") * col("nu")).over(wOrd) / col("te"))
      .withColumn("p0", lag(col("p"), 1, 0.0).over(Window.orderBy(col("n"))))
      .withColumn("l0", lag(col("l"), 1, 0.0).over(Window.orderBy(col("n"))))
      .agg(round(lit(1.0) -
          sum((col("p") - col("p0")) * (col("l") + col("l0"))), 6)
          .as("gini"),
        max(col("tu")).as("n_users"), max(col("te")).as("n_events"))
  }

  /** Session TRANSITION matrix: within gap-based sessions
    * ([[sessionize]]'s rule), the next-event Markov table — for each
    * observed (from_type → to_type) step its count and the conditional
    * probability P(to | from), with a session's last event stepping to
    * the terminal `(end)`. The navigation-model complement to
    * [[sessionPaths]]' entry prefixes, and in training-data terms the
    * label prior for next-event-prediction slices. round(6) on p.
    *
    * Shape at 100 TB: the sessionize window's user-keyed exchange is the
    * only corpus-side one — the lead() window partitions by (u, sess), a
    * superset of the user key the rows already cluster on; the rollup
    * partial-aggregates onto the ≤ (|types|+1)² matrix, and the
    * conditional normalization windows over that tiny frame. */
  def transitions(events: DataFrame, gapNs: Long = 3600000000000L,
                  userCol: String = "user_id",
                  typeCol: String = "event_type",
                  tsNsCol: String = "ts_ns",
                  idCol: String = "event_id"): DataFrame = {
    val wS = Window.partitionBy(col("u"), col("sess"))
      .orderBy(col("et"), col("eid"))
    val matrix = sessionize(events, gapNs, userCol, typeCol, tsNsCol, idCol)
      .withColumn("to_type",
        coalesce(lead(col("ty"), 1).over(wS), lit("(end)")))
      .groupBy(col("ty").as("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n_transitions"))
    val wF = Window.partitionBy(col("from_type"))
    matrix.withColumn("p",
      round(col("n_transitions") /
        sum(col("n_transitions")).over(wF), 6))
  }

  /** INTER-EVENT GAP distribution per event type: for each consecutive
    * same-user event pair (full timeline — not session-bounded), the gap
    * to the NEXT event attributed to the EARLIER event's type ("how long
    * after an X does the user act again") — the dwell/hazard panel
    * behind session-gap tuning and nudge timing. Exact p50/p90 per type
    * (type cardinality bounds the agg state; the percentile input per
    * group is user-pair gaps — swap percentile_approx by the
    * queueDelayApprox pattern at extreme volume).
    *
    * Shape at 100 TB: ONE user-keyed window (uniform key) for the lead,
    * then a partial agg onto the small type frame. */
  def interEventGaps(events: DataFrame,
                     userCol: String = "user_id",
                     typeCol: String = "event_type",
                     tsNsCol: String = "ts_ns",
                     idCol: String = "event_id"): DataFrame = {
    val wU = Window.partitionBy(col("u")).orderBy(col("et"), col("eid"))
    events.select(col(userCol).as("u"), col(typeCol).as("ty"),
        col(tsNsCol).as("et"), col(idCol).as("eid"))
      .withColumn("gap_ns", lead(col("et"), 1).over(wU) - col("et"))
      .where(col("gap_ns").isNotNull)
      .groupBy(col("ty").as("event_type"))
      .agg(count(lit(1)).as("n_gaps"),
        round(percentile(col("gap_ns"), lit(0.5)), 4).as("p50_gap_ns"),
        round(percentile(col("gap_ns"), lit(0.9)), 4).as("p90_gap_ns"),
        max(col("gap_ns")).as("max_gap_ns"))
  }

  /** Per-session ROLLUP over [[sessionize]]'s rule: one row per (user,
    * session) with its event count, wall duration, and entry/exit event
    * types — the session-level feature table behind "keep sessions with
    * ≥ N meaningful events" training-data selection and every
    * engagement dashboard.
    *
    * Shape at 100 TB: the sessionize window's user-keyed exchange is
    * the only one — the (u, sess) groupBy is a subset-key partial agg
    * on the partitioning the window already established; entry/exit
    * types ride min/max over (et, eid, ty) structs (deterministic
    * ties), never a per-session sort. */
  def sessionStats(events: DataFrame, gapNs: Long = 3600000000000L,
                   userCol: String = "user_id",
                   typeCol: String = "event_type",
                   tsNsCol: String = "ts_ns",
                   idCol: String = "event_id"): DataFrame =
    sessionize(events, gapNs, userCol, typeCol, tsNsCol, idCol)
      .groupBy("u", "sess")
      .agg(count(lit(1)).as("n_events"),
        (max(col("et")) - min(col("et"))).as("duration_ns"),
        min(struct(col("et"), col("eid"), col("ty")))
          .getField("ty").as("entry_type"),
        max(struct(col("et"), col("eid"), col("ty")))
          .getField("ty").as("exit_type"))

  /** BOUNCE RATE by entry type — per session entry event-type, how many
    * sessions start there and what share end after that single event
    * (the landing-page quality readout; in training-data terms, the
    * "discard one-event sessions" filter's per-entry accounting).
    * Composes [[sessionStats]]; output is one row per entry type.
    * round(6). */
  def bounceRate(events: DataFrame, gapNs: Long = 3600000000000L,
                 userCol: String = "user_id",
                 typeCol: String = "event_type",
                 tsNsCol: String = "ts_ns",
                 idCol: String = "event_id"): DataFrame =
    sessionStats(events, gapNs, userCol, typeCol, tsNsCol, idCol)
      .groupBy(col("entry_type"))
      .agg(count(lit(1)).as("n_sessions"),
        sum(when(col("n_events") === 1, 1L).otherwise(0L)).as("n_bounces"))
      .withColumn("bounce_rate",
        round(col("n_bounces").cast("double") / col("n_sessions"), 6))

  /** ENGAGEMENT DECILES: users ranked into `n` equal-count buckets by
    * their event volume, with each bucket's user count and volume
    * bounds — the power-user curve ("the top decile produces X% of
    * events") that drives per-user sampling caps in a training
    * pipeline. One user-keyed partial agg, then an ntile over the
    * user-count frame (users, not events — the big side never sorts).
    * Ties break on user id for a deterministic decile edge. */
  def engagementDeciles(events: DataFrame, n: Int = 10,
                        userCol: String = "user_id"): DataFrame = {
    require(n >= 2, "need at least two buckets")
    val perUser = events.groupBy(col(userCol).as("u"))
      .agg(count(lit(1)).as("n_events"))
    val w = Window.orderBy(col("n_events").desc, col("u"))
    // long, matching every SQL engine's BIGINT ntile (oracle parity is
    // type-sensitive, not just value-sensitive)
    perUser.withColumn("decile", ntile(n).over(w).cast("long"))
      .groupBy("decile")
      .agg(count(lit(1)).as("n_users"),
        sum(col("n_events")).as("total_events"),
        max(col("n_events")).as("max_events"),
        min(col("n_events")).as("min_events"))
  }

  /** ENGAGEMENT DECILES, sketch form — the 100 TB path beside the exact
    * [[engagementDeciles]] (the `ev_active_users_approx` exact/sketch
    * split): the exact form's global ntile is a single-task sort over
    * the whole per-user frame, fine for an oracle harness, fatal at 10⁹
    * users. Here the decile EDGES come from one `percentile_approx`
    * partial aggregate (a t-digest-style sketch that merges
    * associatively — no global sort, no single partition), the one-row
    * edge frame broadcasts, and bucketing is a map-only array scan per
    * user. Buckets are value-ranged rather than equal-count: ties at an
    * edge land together instead of being split by user id, so bucket
    * populations can differ from ntile's by the tied mass — the error
    * bound EventsSpec pins. The output decile domain is a DENSE 1..n
    * spine: when tied sketch edges collapse adjacent buckets (heavily
    * tied distributions), the swallowed deciles still appear with
    * n_users = total_events = 0 and null min/max, so downstream
    * consumers expecting n rows never mis-align (ADVICE r13).
    *
    * Shape at 100 TB: per-user partial agg (uniform user key) → sketch
    * agg to ONE row → broadcast → map. Nothing global ever sorts. */
  def engagementDecilesApprox(events: DataFrame, n: Int = 10,
                              userCol: String = "user_id",
                              accuracy: Int = 10000): DataFrame = {
    require(n >= 2, "need at least two buckets")
    val perUser = events.groupBy(col(userCol).as("u"))
      .agg(count(lit(1)).as("n_events"))
    val qs = (1 until n).map(i => lit(i.toDouble / n))
    val edges = perUser.agg(
      percentile_approx(col("n_events"), array(qs: _*), lit(accuracy))
        .as("__edges"))
    perUser.join(broadcast(edges))
      // decile 1 = top users, like ntile over (n_events DESC): a user
      // ABOVE k of the n-1 ascending edges sits k buckets from the
      // bottom
      .withColumn("decile",
        (lit(n) - size(filter(col("__edges"),
          e => col("n_events") > e))).cast("long"))
      .groupBy("decile")
      .agg(count(lit(1)).as("n_users"),
        sum(col("n_events")).as("total_events"),
        max(col("n_events")).as("max_events"),
        min(col("n_events")).as("min_events"))
      // dense 1..n spine: tied sketch edges can collapse buckets and
      // leave gaps in the decile numbering — emit the swallowed deciles
      // as explicit zero rows (≤ n-row frames on both sides)
      .join(events.sparkSession.range(1, n + 1)
        .select(col("id").as("decile")), Seq("decile"), "right")
      .select(col("decile"),
        coalesce(col("n_users"), lit(0L)).as("n_users"),
        coalesce(col("total_events"), lit(0L)).as("total_events"),
        col("max_events"), col("min_events"))
  }

  /** ACTIVE USERS: per calendar day, the distinct users active that day
    * (DAU) and in the trailing `windowDays` window ending that day
    * (rolling WAU/MAU) — the engagement denominator every per-user
    * sampling policy normalizes by. Days outside the observed range are
    * not reported.
    *
    * Shape at 100 TB: first collapse events to the (user, day) presence
    * frame (uniform partial agg — the multiplication below never sees
    * raw events); then each user-day fans out to the `windowDays` window
    * ends it covers (map-only ×w explode) and ONE (day) aggregation
    * counts distinct users per covered day. No self-join over a time
    * range, no per-day re-scan; cost is w × |user-days|, and the
    * distinct rides the aggregation's own partial phases. */
  def activeUsers(events: DataFrame, windowDays: Int = 7,
                  userCol: String = "user_id",
                  tsCol: String = "ts"): DataFrame =
    userDayWindowFrame(events, windowDays, userCol, tsCol)
      .groupBy("day")
      .agg(count_distinct(when(col("is_day"), col("u"))).as("dau"),
        count_distinct(col("u")).as("rolling_active"),
        sum(when(col("is_day"), col("n_events"))).as("n_events"))

  /** The (user, covered day) fan-out frame [[activeUsers]] and
    * [[activeUsersApprox]] aggregate — ONE definition of the
    * collapse-then-explode-then-trim rule so the exact and sketch twins
    * can never drift: events collapse to (user, day) presence (uniform
    * partial agg — the ×w multiplication never sees raw events), each
    * user-day fans out to the `windowDays` window ends it covers
    * (map-only explode), and the single-row bounds frame broadcasts to
    * trim the tail past the last observed day. */
  private def userDayWindowFrame(events: DataFrame, windowDays: Int,
                                 userCol: String,
                                 tsCol: String): DataFrame = {
    require(windowDays >= 1, "windowDays must be positive")
    val userDays = events
      .select(col(userCol).as("u"), to_date(col(tsCol)).as("d"))
      .groupBy("u", "d").agg(count(lit(1)).as("n_events"))
    val bounds = userDays.agg(max(col("d")).as("max_d"))
    userDays
      .select(col("u"), col("d"), col("n_events"),
        explode(sequence(lit(0), lit(windowDays - 1))).as("off"))
      .select(col("u"), col("d"), col("n_events"),
        date_add(col("d"), col("off")).as("day"),
        (col("off") === 0).as("is_day"))
      .join(broadcast(bounds), col("day") <= col("max_d"))
  }

  /** [[activeUsers]]'s SKETCH path: DAU/rolling actives via
    * `approx_count_distinct` (HyperLogLog++, `rsd` relative error) —
    * at billions of users the exact path's per-day distinct is a
    * user-space shuffle per window, while the sketch partial-aggregates
    * map-side like any sum; this is the variant a 100 TB deployment
    * actually runs, next to the exact twin the oracle can check.
    * Same day/window semantics as [[activeUsers]]. */
  def activeUsersApprox(events: DataFrame, windowDays: Int = 7,
                        rsd: Double = 0.02,
                        userCol: String = "user_id",
                        tsCol: String = "ts"): DataFrame =
    userDayWindowFrame(events, windowDays, userCol, tsCol)
      .groupBy("day")
      .agg(approx_count_distinct(when(col("is_day"), col("u")), rsd)
          .as("dau_approx"),
        approx_count_distinct(col("u"), rsd).as("rolling_active_approx"),
        sum(when(col("is_day"), col("n_events"))).as("n_events"))

  /** Conversion ATTRIBUTION: for each conversion event, the event type
    * of the user's FIRST touch ever and LAST touch immediately before
    * the conversion (non-conversion events are touches); conversions
    * with no prior touch attribute to '(direct)'. Output is the
    * (first_touch, last_touch) matrix with conversion and converter
    * counts — the "which acquisition path actually converts" table, and
    * in training-data terms the label joiner for next-event-prediction
    * slices.
    *
    * Shape at 100 TB: ONE user-keyed ordered window computes both
    * running touches (first/last with ignoreNulls over the preceding
    * frame — no self-join of conversions against touch history), then a
    * partial agg onto the tiny type×type matrix. */
  def attribution(events: DataFrame, conversionType: String,
                  userCol: String = "user_id",
                  typeCol: String = "event_type",
                  tsNsCol: String = "ts_ns",
                  idCol: String = "event_id"): DataFrame = {
    val wU = Window.partitionBy(col("u")).orderBy(col("et"), col("eid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val touch = when(col("ty") =!= conversionType, col("ty"))
    events.select(col(userCol).as("u"), col(typeCol).as("ty"),
        col(tsNsCol).as("et"), col(idCol).as("eid"))
      .withColumn("__first", first(touch, ignoreNulls = true).over(wU))
      .withColumn("__last", last(touch, ignoreNulls = true).over(wU))
      .where(col("ty") === conversionType)
      .groupBy(coalesce(col("__first"), lit("(direct)")).as("first_touch"),
        coalesce(col("__last"), lit("(direct)")).as("last_touch"))
      .agg(count(lit(1)).as("n_conversions"),
        countDistinct(col("u")).as("n_users"))
  }

  /** Cohort RETENTION: users cohort by the calendar day of their FIRST
    * event; for each (cohort day, day offset) the distinct users seen
    * again at that offset (offset 0 = the cohort day itself, so its
    * count is the cohort size). The activation/stickiness table every
    * product dashboard draws — and the sampling frame for
    * "train only on users retained past day N".
    *
    * Shape at 100 TB: one user-keyed partial agg (first day), joined
    * back user-keyed, then a (cohort, offset) partial agg over DISTINCT
    * (user, offset) — output is days × offsets, tiny. */
  def retention(events: DataFrame,
                userCol: String = "user_id",
                tsCol: String = "ts"): DataFrame =
    cohortFrame(events, userCol, tsCol)
      // count(DISTINCT u) rather than a full-frame distinct(): the
      // dedup rides the (cohort, offset) aggregation's own partial-agg
      // phases instead of adding a whole-row exchange
      .groupBy("cohort_day", "day_offset")
      .agg(countDistinct(col("u")).as("n_users"))

  /** ONE definition of the cohort rule [[retention]] and [[cohortValue]]
    * share — cohort by the calendar day of the user's FIRST event, each
    * event tagged with its (u, cohort_day, day_offset) plus any `extra`
    * carried columns: one user-keyed partial agg (first day) joined
    * back on the uniform user key. */
  private def cohortFrame(events: DataFrame, userCol: String,
                          tsCol: String,
                          extra: Seq[Column] = Nil): DataFrame = {
    val firstDay = events
      .select(col(userCol).as("u"), to_date(col(tsCol)).as("d"))
      .groupBy("u").agg(min(col("d")).as("cohort_day"))
    events.select(col(userCol).as("u") +: to_date(col(tsCol)).as("d")
        +: extra: _*)
      .join(firstDay, Seq("u"))
      .withColumn("day_offset", datediff(col("d"), col("cohort_day")))
  }

  /** RFM segmentation: per user the classic recency/frequency/monetary
    * triple — days since last activity (relative to the corpus's last
    * day), event count, and value sum — each scored 1–4 against the
    * GLOBAL quartiles of the per-user frame (recency inverted: the most
    * RECENT quartile scores 4). Segment = the concatenated "rfm" code,
    * the marketing-analytics user taxonomy behind "win back the 411s".
    *
    * Both the per-user values and the quartile edges round(6) before
    * comparison, so an engine-ulp in a double sum cannot flip a score.
    *
    * Shape at 100 TB: one user-keyed partial agg, ONE quartile-edge row
    * from a percentile aggregate (exact here for oracle parity; use the
    * sketch twin [[rfmApprox]] at extreme scale), broadcast back, then
    * map-only scoring. No per-user window. */
  def rfm(events: DataFrame,
          userCol: String = "user_id",
          tsCol: String = "ts",
          valueCol: String = "value"): DataFrame = {
    val base = rfmBase(events, userCol, tsCol, valueCol)
    val qs = array(lit(0.25), lit(0.5), lit(0.75))
    val edges = base.agg(
      transform(percentile(col("recency_days"), qs), e => round(e, 6))
        .as("r_edges"),
      transform(percentile(col("frequency"), qs), e => round(e, 6))
        .as("f_edges"),
      transform(percentile(col("monetary"), qs), e => round(e, 6))
        .as("m_edges"))
    rfmScore(base, edges)
  }

  /** RFM, sketch form — the 100 TB path beside the exact [[rfm]] (the
    * [[engagementDecilesApprox]] exact/sketch split): the exact quartile
    * edges buffer the WHOLE per-user frame's values in one percentile
    * agg; `percentile_approx`'s mergeable rank sketch bounds that state
    * by `accuracy` and rides the aggregation's partial phases. Edges
    * are observed values within rank error n/accuracy instead of
    * interpolated midpoints, so per-user scores can shift by at most
    * one step where a user's value straddles an edge — values are
    * engine-specific, the registry entry is rows-only and the score
    * displacement bound is EventsSpec-pinned against the exact twin. */
  def rfmApprox(events: DataFrame,
                accuracy: Int = 10000,
                userCol: String = "user_id",
                tsCol: String = "ts",
                valueCol: String = "value"): DataFrame = {
    val base = rfmBase(events, userCol, tsCol, valueCol)
    val qs = array(lit(0.25), lit(0.5), lit(0.75))
    def sketch(v: Column) =
      transform(percentile_approx(v.cast("double"), qs, lit(accuracy)),
        e => round(e, 6))
    val edges = base.agg(
      sketch(col("recency_days")).as("r_edges"),
      sketch(col("frequency")).as("f_edges"),
      sketch(col("monetary")).as("m_edges"))
    rfmScore(base, edges)
  }

  /** The per-user (recency_days, frequency, monetary) frame both RFM
    * forms score — ONE definition so the exact and sketch twins can
    * never drift: one user-keyed partial agg plus a broadcast
    * corpus-last row. */
  private def rfmBase(events: DataFrame, userCol: String, tsCol: String,
                      valueCol: String): DataFrame = {
    val perUser = events
      .select(col(userCol).as("user_id"), to_date(col(tsCol)).as("d"),
        col(valueCol).as("v"))
      .groupBy("user_id")
      .agg(max(col("d")).as("last_day"),
        count(lit(1)).as("frequency"),
        round(sum(col("v")), 6).as("monetary"))
    val maxDay = perUser.agg(max(col("last_day")).as("corpus_last"))
    perUser.crossJoin(broadcast(maxDay))
      .withColumn("recency_days",
        datediff(col("corpus_last"), col("last_day")).cast("long"))
      .drop("corpus_last", "last_day")
  }

  /** Shared RFM scoring: broadcast a one-row (r_edges, f_edges, m_edges)
    * frame and score each dimension 1–4 map-only (recency inverted). */
  private def rfmScore(base: DataFrame, edges: DataFrame): DataFrame = {
    def above(v: Column, es: Column): Column =
      size(filter(es, e => v > e)).cast("long")
    base.crossJoin(broadcast(edges))
      // recency: fewer days = better; score 4 = at-or-below Q1
      .withColumn("r_score", lit(4) - above(col("recency_days").cast("double"),
        col("r_edges")))
      .withColumn("f_score", lit(1) + above(col("frequency").cast("double"),
        col("f_edges")))
      .withColumn("m_score", lit(1) + above(col("monetary"), col("m_edges")))
      .select(col("user_id"), col("recency_days"), col("frequency"),
        col("monetary"), col("r_score"), col("f_score"), col("m_score"),
        concat(col("r_score"), col("f_score"), col("m_score")).as("segment"))
  }

  /** CHURN by cohort: per first-event-day cohort, how many users are
    * INACTIVE for the trailing `inactiveDays` of the corpus (last event
    * at or before corpus_end − inactiveDays) — the denominator-honest
    * churn table next to [[retention]]'s activity curve. round(6).
    *
    * Shape at 100 TB: ONE user-keyed partial agg (first day AND last
    * day in the same pass), a broadcast corpus-end row, then a
    * (cohort_day) partial agg. */
  def churn(events: DataFrame, inactiveDays: Int = 7,
            userCol: String = "user_id",
            tsCol: String = "ts"): DataFrame = {
    val perUser = events
      .select(col(userCol).as("u"), to_date(col(tsCol)).as("d"))
      .groupBy("u")
      .agg(min(col("d")).as("cohort_day"), max(col("d")).as("last_day"))
    val end = perUser.agg(max(col("last_day")).as("corpus_end"))
    perUser.crossJoin(broadcast(end))
      .withColumn("churned",
        datediff(col("corpus_end"), col("last_day")) >= inactiveDays)
      .groupBy("cohort_day")
      .agg(count(lit(1)).as("cohort_size"),
        sum(when(col("churned"), 1L).otherwise(0L)).as("n_churned"))
      .withColumn("churn_rate",
        round(col("n_churned").cast("double") / col("cohort_size"), 6))
  }

  /** Activity HEATMAP: events, distinct users, and value by (day-of-week,
    * hour-of-day) — the load-shape panel behind capacity planning and
    * send-time optimization. dow is 1=Sunday..7 (Spark's rule; the
    * oracle shifts DuckDB's 0-based dow to match). One partial agg onto
    * a ≤168-row frame; countDistinct rides its partial phases. */
  def hourDowHeatmap(events: DataFrame,
                     userCol: String = "user_id",
                     tsCol: String = "ts",
                     valueCol: String = "value"): DataFrame =
    events
      .groupBy(dayofweek(col(tsCol)).cast("long").as("dow"),
        hour(col(tsCol)).cast("long").as("hour"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col(userCol)).as("n_users"),
        round(sum(col(valueCol)), 6).as("total_value"))

  /** POWER-USER share: what fraction of all events the most-active
    * `topFrac` of users produce — the one-number skew readout next to
    * [[engagementGini]], computed over the same COUNT HISTOGRAM so the
    * ordered walk never touches the user space. The top-K cut (K =
    * ceil(topFrac × users)) splits mid-level exactly: a partially
    * included activity level contributes level × remaining-users
    * events. round(6).
    *
    * Shape at 100 TB: identical to Gini — two partial aggs down to the
    * activity-level histogram, one bounded ordered window, one row out. */
  def powerUserShare(events: DataFrame, topFrac: Double = 0.01,
                     userCol: String = "user_id"): DataFrame = {
    require(topFrac > 0 && topFrac <= 1, s"topFrac in (0,1], got $topFrac")
    val hist = events.groupBy(col(userCol).as("u"))
      .agg(count(lit(1)).as("n"))
      .groupBy("n").agg(count(lit(1)).as("nu"))
    val tot = hist.agg(sum(col("nu")).as("tu"),
      sum(col("n") * col("nu")).as("te"))
    val wDesc = Window.orderBy(col("n").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    hist.crossJoin(broadcast(tot))
      .withColumn("k", ceil(lit(topFrac) * col("tu")).cast("long"))
      .withColumn("cum_u", sum(col("nu")).over(wDesc))
      // users of THIS level counted toward the top-K cut
      .withColumn("take_u",
        greatest(lit(0L), least(col("nu"), col("k") - (col("cum_u") - col("nu")))))
      .agg(max(col("tu")).as("n_users"), max(col("te")).as("n_events"),
        max(col("k")).as("top_k_users"),
        sum(col("take_u") * col("n")).as("top_events"))
      .withColumn("top_share",
        round(col("top_events").cast("double") / col("n_events"), 6))
  }
}
