package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import java.sql.Timestamp

/** Streaming twins for the product-analytics operator family
  * (`operators.Events`) — the live face of the events table, completing
  * the repo convention that every dashboard operator has a streaming
  * twin. Built on the same custom-state machinery as the telemetry
  * twins ([[TelemetryStreams]]). */
object EventStreams {

  /** One event with its session identity: `session_start_ns` is the
    * event-time of the session's FIRST event — the session key that is
    * stable under watermark-bounded state expiry, unlike the batch
    * operator's per-user running ordinal (an ordinal would have to be
    * stored forever; a start-time restarts correctly after expiry
    * because any post-expiry event is by definition > gap away). The
    * batch rule derives the same identity as min(et) per (u, sess). */
  case class SessionedEvent(user_id: Long, event_id: Long,
                            event_type: String, ts_ns: Long,
                            session_start_ns: Long)

  /** Per-user sessionization state: last event time + current session's
    * start (both ns, the gap axis) + the last event's WATERMARK-axis
    * time (epoch ms of the `ts` column — the timeout must be set on the
    * axis the watermark advances on, which `ts_ns` need not share). */
  case class SessionState(lastEtNs: Long, sessionStartNs: Long,
                          lastTsMs: Long)

  /** One session-internal step emitted by [[transitionsStream]]:
    * `to_type` is `(end)` when the step closes a session (gap exceeded
    * or state expired) — the batch `operators.Events.transitions`
    * matrix's own terminal row. `ts_ns` is the FROM event's time (the
    * step is attributed to the event that took it). */
  case class TransitionEvent(user_id: Long, from_type: String,
                             to_type: String, ts_ns: Long,
                             session_start_ns: Long)

  /** [[transitionsStream]] state: [[SessionState]]'s fields plus the
    * last event's type — the pending FROM side of the next step. */
  case class TransState(lastEtNs: Long, sessionStartNs: Long,
                        lastTsMs: Long, lastType: String)

  /** One conversion with its running first/last-touch attribution, from
    * [[attributionStream]] — `(direct)` when the user converted with no
    * prior non-conversion touch, the batch operator's own sentinel. */
  case class AttributionEvent(user_id: Long, first_touch: String,
                              last_touch: String, ts_ns: Long,
                              event_id: Long)

  /** [[attributionStream]] state: the user's first and most recent
    * non-conversion touch so far (None until one is seen). */
  case class AttrState(firstTouch: Option[String],
                       lastTouch: Option[String])

  /** [[attributionStreamTtl]] state: the touches plus the user's last
    * activity instant (ms), which drives the event-time TTL eviction. */
  case class AttrStateTtl(firstTouch: Option[String],
                          lastTouch: Option[String], lastTsMs: Long)

  /** LIVE daily-active-users — `operators.Events.activeUsers`'s DAU
    * face on the stream: per event-time day window, the distinct users
    * seen, emitted as the window closes. Distinctness is plain
    * `dropDuplicates` on (user, day WINDOW) — the window column is the
    * event-time key, so state is one row per ACTIVE (user, day) and
    * lives exactly until the watermark closes the day (see the inline
    * comment: the WithinWatermark variant would evict after only the
    * slack and double-count). The live path never holds the user
    * space, only the open days'. The rolling
    * WAU/MAU face stays batch (it must re-see w days of history — a
    * stream would hold w× the state for a number the nightly batch
    * profile already publishes; the batch-mines/stream-scores split).
    * Stream ≡ batch dau per day on the same frame (UTC day windows =
    * to_date's day rule). */
  def dauStream(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      // the window struct inherits ts's event-time role; keeping ts too
      // would leave TWO event-time columns (stream error)
      .select(col("user_id"), window(col("ts"), "1 day").as("w"))
      // dropDuplicates (NOT ...WithinWatermark): the window column is
      // the event-time key, so dedup state lives until the watermark
      // closes the DAY — WithinWatermark would evict after only the
      // slack and re-count a morning user seen again that evening
      .dropDuplicates("user_id", "w")
      .groupBy(col("w"))
      .agg(count(lit(1)).as("dau"))
      .select(col("w.start").cast("date").as("day"), col("dau"))

  /** Gap-based SESSIONIZATION on the LIVE event stream — the registry's
    * ev_sessionize rule (one definition: `operators.Events.sessionize`,
    * inactivity gap > `gapNs` opens a session) as per-user custom state:
    * each arriving event is tagged with its session's start time, state
    * is one (lastEt, sessionStart) pair per active user, expired by
    * event-time timeout one gap past the last event (+ the same
    * explicit-slack rationale as `TelemetryStreams.rateLimitStream` —
    * after expiry a new event is necessarily > gap away, so the fresh
    * state assigns the exact session start the retained state would
    * have).
    *
    * Contract (matches the batch twin exactly when honored): events
    * must arrive per-user in event-time order across micro-batches —
    * the seal-replay and memory-stream shapes. Rows below the watermark
    * are dropped by Spark before this operator; an out-of-order event
    * WITHIN the watermark slack that time-travels behind its user's
    * last seen event joins the CURRENT session (the collector-side
    * reorder buffer is the fix, not unbounded state here).
    *
    * Input needs (ts TIMESTAMP, ts_ns, user_id, event_id, event_type) —
    * the events-table layout. Scale: state is two longs per ACTIVE
    * user (watermark-expired), keyed by the uniform user axis. */
  def sessionizeStream(events: DataFrame, gapNs: Long = 3600000000000L,
                       watermark: String = "2 minutes"): Dataset[SessionedEvent] = {
    val spark = events.sparkSession
    import spark.implicits._
    require(gapNs > 0, "gapNs must be positive")
    val gapMs = math.max(gapNs / 1000000L, 1L)
    // the watermarked event-time column must survive projection into the
    // stateful operator (the rateStream contract)
    val lite = events
      .withWatermark("ts", watermark)
      .select(col("ts"), col("user_id").cast("long").as("u"),
        col("event_id").cast("long").as("eid"), col("event_type"),
        col("ts_ns").cast("long").as("et"))
      .as[(Timestamp, Long, Long, String, Long)]
    lite.groupByKey(_._2)
      .flatMapGroupsWithState[SessionState, SessionedEvent](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (_, _, state: GroupState[SessionState]) if state.hasTimedOut =>
          state.remove(); Iterator.empty
        case (u, it, state: GroupState[SessionState]) =>
          var st = state.getOption.orNull
          // micro-batch iterators carry no order guarantee; a user's
          // per-batch slice is session-sized, so the in-memory sort is
          // bounded (the batch twin's orderBy(et, eid), same tiebreak)
          val out = it.toSeq.sortBy(e => (e._5, e._3)).map {
            case (ts, _, eid, ty, et) =>
              // max(): a late event that time-travels behind the user's
              // last seen one joins the CURRENT session (the documented
              // contract) WITHOUT rewinding the gap anchor — a rewound
              // anchor would make the next on-time event look > gap away
              // and fabricate a session break
              st =
                if (st == null || et - st.lastEtNs > gapNs)
                  SessionState(et, et, ts.getTime)
                else SessionState(math.max(et, st.lastEtNs),
                  st.sessionStartNs, math.max(ts.getTime, st.lastTsMs))
              SessionedEvent(u, eid, ty, et, st.sessionStartNs)
          }
          state.update(st)
          state.setTimeoutTimestamp(math.max(
            st.lastTsMs + 2 * gapMs,
            state.getCurrentWatermarkMs() + 1))
          out.iterator
      }
  }

  /** LIVE session-transition steps — the streaming face of
    * `operators.Events.transitions`: each arriving event emits the step
    * its predecessor took ((from = previous type, to = this type) when
    * the gap holds, (from = previous type, to = "(end)") when the gap
    * breaks the session), and state expiry emits the final "(end)" step
    * of a session nothing followed. Aggregating the emitted steps by
    * (from_type, to_type) IS the batch matrix's n_transitions — the
    * stream≡batch pin in EventsSpec — with the one live-path caveat
    * that an open session's terminal "(end)" row has not been emitted
    * yet (the batch operator sees a closed corpus; the stream learns a
    * session ended only via gap or timeout).
    *
    * Same per-user ordering contract and state/timeout discipline as
    * [[sessionizeStream]]; state adds one string (the pending FROM
    * type) to the two longs. */
  def transitionsStream(events: DataFrame, gapNs: Long = 3600000000000L,
                        watermark: String = "2 minutes")
      : Dataset[TransitionEvent] = {
    val spark = events.sparkSession
    import spark.implicits._
    require(gapNs > 0, "gapNs must be positive")
    val gapMs = math.max(gapNs / 1000000L, 1L)
    val lite = events
      .withWatermark("ts", watermark)
      .select(col("ts"), col("user_id").cast("long").as("u"),
        col("event_id").cast("long").as("eid"), col("event_type"),
        col("ts_ns").cast("long").as("et"))
      .as[(Timestamp, Long, Long, String, Long)]
    lite.groupByKey(_._2)
      .flatMapGroupsWithState[TransState, TransitionEvent](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (u, _, state: GroupState[TransState]) if state.hasTimedOut =>
          val st = state.get
          state.remove()
          Iterator.single(TransitionEvent(u, st.lastType, "(end)",
            st.lastEtNs, st.sessionStartNs))
        case (u, it, state: GroupState[TransState]) =>
          var st = state.getOption.orNull
          val out = scala.collection.mutable.ArrayBuffer[TransitionEvent]()
          for ((ts, _, _, ty, et) <- it.toSeq.sortBy(e => (e._5, e._3))) {
            if (st != null) {
              if (et - st.lastEtNs > gapNs) {
                out += TransitionEvent(u, st.lastType, "(end)",
                  st.lastEtNs, st.sessionStartNs)
                st = TransState(et, et, ts.getTime, ty)
              } else {
                // max(): a cross-batch late event joins the current
                // session without rewinding the gap anchor (the
                // sessionizeStream rule) — a rewound anchor would make
                // the next on-time event fabricate an (end)
                out += TransitionEvent(u, st.lastType, ty,
                  st.lastEtNs, st.sessionStartNs)
                st = TransState(math.max(et, st.lastEtNs),
                  st.sessionStartNs, math.max(ts.getTime, st.lastTsMs), ty)
              }
            } else st = TransState(et, et, ts.getTime, ty)
          }
          state.update(st)
          state.setTimeoutTimestamp(math.max(
            st.lastTsMs + 2 * gapMs,
            state.getCurrentWatermarkMs() + 1))
          out.iterator
      }
  }

  /** LIVE first/last-touch attribution — the streaming face of
    * `operators.Events.attribution`: per user, the running first and
    * most recent non-conversion touch; every arriving conversion emits
    * one row with both (or "(direct)" when none preceded). Aggregating
    * emitted rows by (first_touch, last_touch) with count +
    * countDistinct(user) IS the batch matrix — the stream≡batch pin.
    *
    * Contract (same as [[sessionizeStream]]'s): events must arrive
    * per-user in event-time order ACROSS micro-batches — the seal-replay
    * and memory-stream shapes. Within a batch the per-user slice is
    * sorted here; a touch that time-travels behind an already-processed
    * conversion cannot retro-attribute it (append mode never retracts),
    * so out-of-order feeds need the collector-side reorder buffer, not
    * this operator.
    *
    * State is two small strings per user and does NOT expire
    * (NoTimeout): attribution's lookback is the user's whole history —
    * exactly the batch operator's unbounded-preceding window — so
    * evicting on a watermark would silently turn long-cycle converters
    * into "(direct)". At 10⁹ users that is two interned strings each;
    * a deployment that wants bounded state takes
    * [[attributionStreamTtl]] (explicit event-time TTL, documented
    * "(direct)"-after-idle semantics) or composes the batch operator
    * over sealed history instead. */
  def attributionStream(events: DataFrame, conversionType: String)
      : Dataset[AttributionEvent] = {
    val spark = events.sparkSession
    import spark.implicits._
    val lite = events
      .select(col("user_id").cast("long").as("u"),
        col("event_id").cast("long").as("eid"), col("event_type"),
        col("ts_ns").cast("long").as("et"))
      .as[(Long, Long, String, Long)]
    lite.groupByKey(_._1)
      .flatMapGroupsWithState[AttrState, AttributionEvent](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (u, it, state: GroupState[AttrState]) =>
          var st = state.getOption.getOrElse(AttrState(None, None))
          val out = scala.collection.mutable.ArrayBuffer[AttributionEvent]()
          for ((_, eid, ty, et) <- it.toSeq.sortBy(e => (e._4, e._2))) {
            if (ty == conversionType)
              out += AttributionEvent(u,
                st.firstTouch.getOrElse("(direct)"),
                st.lastTouch.getOrElse("(direct)"), et, eid)
            else
              st = AttrState(st.firstTouch.orElse(Some(ty)), Some(ty))
          }
          state.update(st)
          out.iterator
      }
  }

  /** [[attributionStream]] with BOUNDED state — the TTL trade named in
    * the unbounded twin's contract, made concrete: a user idle (no
    * event of any kind) longer than `ttl` in EVENT time has their
    * touch state evicted on the watermark, so a conversion after the
    * gap attributes "(direct)". That is the deliberate semantic price
    * of bounded state; the exact unbounded lookback remains
    * [[attributionStream]] or the batch operator over sealed history.
    * Eviction is event-time-deterministic (watermark-driven, like
    * [[sessionizeStream]]'s expiry), so replays yield identical
    * output. */
  def attributionStreamTtl(events: DataFrame, conversionType: String,
                           ttl: String = "30 days",
                           watermark: String = "2 minutes")
      : Dataset[AttributionEvent] = {
    val spark = events.sparkSession
    import spark.implicits._
    val ttlMs = TelemetryStreams.windowSlackMs(ttl)
    require(ttlMs > 0, s"ttl must be positive: $ttl")
    val lite = events
      .withWatermark("ts", watermark)
      .select(col("ts"), col("user_id").cast("long").as("u"),
        col("event_id").cast("long").as("eid"), col("event_type"),
        col("ts_ns").cast("long").as("et"))
      .as[(Timestamp, Long, Long, String, Long)]
    lite.groupByKey(_._2)
      .flatMapGroupsWithState[AttrStateTtl, AttributionEvent](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (_, _, state: GroupState[AttrStateTtl]) if state.hasTimedOut =>
          state.remove(); Iterator.empty
        case (u, it, state: GroupState[AttrStateTtl]) =>
          var st = state.getOption.getOrElse(AttrStateTtl(None, None, 0L))
          val out = scala.collection.mutable.ArrayBuffer[AttributionEvent]()
          for ((ts, _, eid, ty, et) <- it.toSeq.sortBy(e => (e._5, e._3))) {
            // INLINE ttl check: the semantics must not depend on
            // micro-batch boundaries — a single-batch replay of the
            // whole history must expire exactly what the live run
            // expired (Spark fires state timeouts only AFTER a batch's
            // new data, so the timeout alone would let a coalesced
            // replay attribute through a past-ttl gap). The watermark
            // timeout below is then pure state GC, not the rule.
            if (st.lastTsMs > 0 && ts.getTime - st.lastTsMs > ttlMs)
              st = AttrStateTtl(None, None, st.lastTsMs)
            // every event refreshes the idle clock (max: a late event
            // must not rewind it — the sessionizeStream anchor rule)
            val tick = math.max(st.lastTsMs, ts.getTime)
            if (ty == conversionType) {
              out += AttributionEvent(u,
                st.firstTouch.getOrElse("(direct)"),
                st.lastTouch.getOrElse("(direct)"), et, eid)
              st = st.copy(lastTsMs = tick)
            } else
              st = AttrStateTtl(st.firstTouch.orElse(Some(ty)), Some(ty), tick)
          }
          state.update(st)
          state.setTimeoutTimestamp(math.max(st.lastTsMs + ttlMs,
            state.getCurrentWatermarkMs() + 1))
          out.iterator
      }
  }
}
