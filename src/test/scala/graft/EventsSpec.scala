package graft

import graft.operators.Events
import org.apache.spark.sql.functions._

/** Hand-computed goldens for the product-analytics event operators —
  * ordering and windowing edges the sf-table oracle can't isolate. */
class EventsSpec extends SparkTestBase {

  test("funnel: steps must be ordered in time, the entry window anchors " +
    "at step 1, out-of-window and out-of-order conversions drop") {
    import spark.implicits._
    val ns = 1000000000L
    val ev = Seq(
      // u1: full ordered conversion inside the window
      (1L, "view", 10 * ns), (1L, "click", 20 * ns),
      (1L, "purchase", 30 * ns),
      // u2: click BEFORE the first view — not a conversion
      (2L, "click", 5 * ns), (2L, "view", 10 * ns),
      // u3: click after view but outside the 50 s entry window
      (3L, "view", 10 * ns), (3L, "click", 70 * ns),
      // u4: view only
      (4L, "view", 10 * ns),
      // u5: simultaneous view+click (strictly-after rule drops the click)
      (5L, "view", 10 * ns), (5L, "click", 10 * ns))
      .toDF("user_id", "event_type", "ts_ns")
    val got = Events.funnel(ev, Seq("view", "click", "purchase"),
        windowNs = 50 * ns).collect()
      .map(r => r.getAs[Int]("step") ->
        ((r.getAs[String]("step_type"), r.getAs[Long]("n_users"),
          r.getAs[Double]("conversion")))).toMap
    assert(got == Map(
      1 -> (("view", 5L, 1.0)),
      2 -> (("click", 1L, 0.2)),
      3 -> (("purchase", 1L, 0.2))), got)
  }

  test("retention: cohort by first-event day, offset 0 equals cohort " +
    "size, repeat visits within a day count once") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val ev = Seq(
      (1L, ts("2024-01-01 08:00:00")), (1L, ts("2024-01-01 19:00:00")),
      (1L, ts("2024-01-03 09:00:00")),
      (2L, ts("2024-01-01 12:00:00")),
      (3L, ts("2024-01-02 07:00:00")), (3L, ts("2024-01-03 07:00:00")))
      .toDF("user_id", "ts")
    val got = Events.retention(ev).collect()
      .map(r => (r.getAs[java.sql.Date]("cohort_day").toString,
        r.getAs[Int]("day_offset")) -> r.getAs[Long]("n_users")).toMap
    assert(got == Map(
      ("2024-01-01", 0) -> 2L, ("2024-01-01", 2) -> 1L,
      ("2024-01-02", 0) -> 1L, ("2024-01-02", 1) -> 1L), got)
  }

  test("activeUsers: DAU counts the day itself, rolling window covers " +
    "the trailing 7 days, the tail past the last observed day is cut") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val ev = Seq(
      (1L, ts("2024-01-01 08:00:00")), (1L, ts("2024-01-01 09:00:00")),
      (2L, ts("2024-01-01 12:00:00")),
      (1L, ts("2024-01-02 10:00:00")),
      (3L, ts("2024-01-09 07:00:00")))
      .toDF("user_id", "ts")
    val got = Events.activeUsers(ev).collect()
      .map(r => r.getAs[java.sql.Date]("day").toString ->
        ((r.getAs[Long]("dau"), r.getAs[Long]("rolling_active"),
          Option(r.getAs[java.lang.Long]("n_events"))))).toMap
    assert(got == Map(
      "2024-01-01" -> ((2L, 2L, Some(3L))), // u1 twice + u2
      "2024-01-02" -> ((1L, 2L, Some(1L))),
      "2024-01-03" -> ((0L, 2L, None)), "2024-01-04" -> ((0L, 2L, None)),
      "2024-01-05" -> ((0L, 2L, None)), "2024-01-06" -> ((0L, 2L, None)),
      "2024-01-07" -> ((0L, 2L, None)), // day-1 users still in window
      "2024-01-08" -> ((0L, 1L, None)), // only day-2's u1 remains
      "2024-01-09" -> ((1L, 1L, Some(1L)))), got) // u3; no day 10+ tail
  }

  test("attribution: first/last touch skip conversions in the history, " +
    "conversion-first users attribute to (direct)") {
    import spark.implicits._
    val ns = 1000000000L
    val ev = Seq(
      // u1: view -> click -> purchase: first=view last=click
      (1L, "view", 10 * ns, 1L), (1L, "click", 20 * ns, 2L),
      (1L, "purchase", 30 * ns, 3L),
      // u2: purchase with no prior touch -> (direct)
      (2L, "purchase", 5 * ns, 4L),
      // u3: view -> purchase -> purchase: BOTH convs see first=last=view
      // (the intervening purchase is not a touch)
      (3L, "view", 10 * ns, 5L), (3L, "purchase", 20 * ns, 6L),
      (3L, "purchase", 30 * ns, 7L))
      .toDF("user_id", "event_type", "ts_ns", "event_id")
    val got = Events.attribution(ev, "purchase").collect()
      .map(r => (r.getAs[String]("first_touch"),
        r.getAs[String]("last_touch")) ->
        ((r.getAs[Long]("n_conversions"), r.getAs[Long]("n_users")))).toMap
    assert(got == Map(
      ("view", "click") -> ((1L, 1L)),
      ("(direct)", "(direct)") -> ((1L, 1L)),
      ("view", "view") -> ((2L, 1L))), got)
  }

  test("transitions: Markov steps stay inside sessions (a gap breaks " +
    "the chain into (end) + fresh entry), P conditions on from_type") {
    import spark.implicits._
    val h = 3600000000000L // the default gap
    val ev = Seq(
      // u1 session 1: view -> click -> view -> (end)
      (1L, "view", 10L, 1L), (1L, "click", 20L, 2L), (1L, "view", 30L, 3L),
      // u1 session 2 (gap > 1h): view -> (end) — no click->view bridge
      (1L, "view", 30L + h + 1, 4L),
      // u2: click -> (end)
      (2L, "click", 50L, 5L))
      .toDF("user_id", "event_type", "ts_ns", "event_id")
    val got = Events.transitions(ev).collect()
      .map(r => (r.getAs[String]("from_type"), r.getAs[String]("to_type")) ->
        ((r.getAs[Long]("n_transitions"), r.getAs[Double]("p")))).toMap
    assert(got == Map(
      ("view", "click") -> ((1L, 0.333333)),
      ("view", "(end)") -> ((2L, 0.666667)),
      ("click", "view") -> ((1L, 0.5)),
      ("click", "(end)") -> ((1L, 0.5))), got)
  }

  test("engagementGini: Lorenz trapezoid equals the pairwise-difference " +
    "definition on a hand-checked population") {
    import spark.implicits._
    val t = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    // per-user counts [1,1,2,4]: sum|xi-xj| over ordered pairs = 20,
    // 2*n^2*mean = 64 -> G = 0.3125
    val ev = (Seq(1L, 2L) ++ Seq.fill(2)(3L) ++ Seq.fill(4)(4L))
      .zipWithIndex.map { case (u, i) => (u, s"e$i", t) }
      .toDF("user_id", "event_type", "ts")
    val r = Events.engagementGini(ev).collect().head
    assert(r.getAs[Double]("gini") == 0.3125, r)
    assert(r.getAs[Long]("n_users") == 4L)
    assert(r.getAs[Long]("n_events") == 8L)
  }

  test("activeUsersApprox tracks the exact twin within the sketch's " +
    "error bound on the driver corpus") {
    Tables.register(spark, sfDir)
    val ev = spark.table("events")
    val exact = Events.activeUsers(ev).collect()
      .map(r => r.getAs[java.sql.Date]("day").toString ->
        ((r.getAs[Long]("dau"), r.getAs[Long]("rolling_active")))).toMap
    val approx = Events.activeUsersApprox(ev, rsd = 0.02).collect()
      .map(r => r.getAs[java.sql.Date]("day").toString ->
        ((r.getAs[Long]("dau_approx"),
          r.getAs[Long]("rolling_active_approx")))).toMap
    assert(approx.keySet == exact.keySet)
    for ((day, (d, ra)) <- exact; (da, raa) = approx(day)) {
      // 5x the 2% rsd: a generous bound that still fails a broken sketch
      assert(d == 0 && da == 0 || math.abs(da - d) <= math.max(2, 0.1 * d),
        s"$day dau approx $da vs exact $d")
      assert(math.abs(raa - ra) <= math.max(2, 0.1 * ra),
        s"$day rolling approx $raa vs exact $ra")
    }
  }

  test("engagementDecilesApprox tracks the exact ntile twin: every user's " +
    "sketch bucket within 1 of exact, totals conserved, no global window " +
    "in the plan") {
    Tables.register(spark, sfDir)
    val ev = spark.table("events")
    val approxDf = Events.engagementDecilesApprox(ev)
    // the whole point of the twin: no single-partition global sort
    val plan = approxDf.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      s"approx path must not plan a window:\n$plan")
    val exact = Events.engagementDeciles(ev).collect()
      .map(r => r.getAs[Long]("decile") ->
        ((r.getAs[Long]("n_users"), r.getAs[Long]("total_events")))).toMap
    val approx = approxDf.collect()
      .map(r => r.getAs[Long]("decile") ->
        ((r.getAs[Long]("n_users"), r.getAs[Long]("total_events")))).toMap
    // conservation: every user and every event lands in exactly one bucket
    assert(approx.values.map(_._1).sum == exact.values.map(_._1).sum)
    assert(approx.values.map(_._2).sum == exact.values.map(_._2).sum)
    // per-bucket population within the tied-mass slack of the equal-count
    // exact form: a value-ranged bucket moves whole tie cohorts across an
    // edge where ntile splits them, so the slack is the largest cohort
    // (plus a sketch-noise floor) — still fails a broken sketch outright
    val share = exact.values.map(_._1).sum / 10.0
    val maxTie = ev.groupBy(col("user_id").as("u"))
      .agg(count(lit(1)).as("n_events"))
      .groupBy("n_events").count()
      .agg(max("count")).collect().head.getLong(0)
    for (d <- 1L to 10L) {
      val (nu, _) = approx.getOrElse(d, (0L, 0L))
      val (ne, _) = exact(d)
      assert(math.abs(nu - ne) <= math.max(math.max(2, maxTie), 0.3 * share),
        s"decile $d approx users $nu vs exact $ne (tie slack $maxTie)")
    }
    // per-user bucket displacement <= 1: recompute each side's bucket rule
    val perUser = ev.groupBy(col("user_id").as("u"))
      .agg(count(lit(1)).as("n_events"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("n_events").desc, col("u"))
    val exactBuckets = perUser.withColumn("d", ntile(10).over(w))
      .collect().map(r => r.getAs[Long]("u") -> r.getAs[Int]("d")).toMap
    val edges = perUser.agg(percentile_approx(col("n_events"),
        array((1 until 10).map(i => lit(i / 10.0)): _*), lit(10000)))
      .collect().head.getSeq[Long](0)
    val counts = perUser.collect()
      .map(r => r.getAs[Long]("u") -> r.getAs[Long]("n_events")).toMap
    // ntile splits a tied value across buckets and the sketch's edge-rank
    // convention differs by up to one edge at an exactly-tied edge value —
    // so the honest per-user bound is the exact bucket RANGE of the user's
    // VALUE, widened by two (one edge-convention step + one sketch step)
    val valueRange = counts.toSeq.groupBy(_._2).map { case (v, us) =>
      val bs = us.map { case (u, _) => exactBuckets(u) }
      v -> ((bs.min, bs.max))
    }
    for ((u, v) <- counts) {
      val da = 10 - edges.count(v > _)
      val (lo, hi) = valueRange(v)
      assert(da >= lo - 2 && da <= hi + 2,
        s"user $u: approx bucket $da outside exact range [$lo,$hi]±2 (v=$v)")
    }
  }

  test("powerUserShare: the top-K cut splits a tied activity level " +
    "exactly (take only the remaining users' events)") {
    import spark.implicits._
    // counts: three users at 5 events, one at 1 -> 16 events, 4 users.
    // topFrac .25 -> K=1: ONE of the three level-5 users is 'top';
    // share = 5/16, never 15/16
    val ev = (Seq.fill(5)(1L) ++ Seq.fill(5)(2L) ++ Seq.fill(5)(3L) ++ Seq(4L))
      .zipWithIndex.map { case (u, i) => (i.toLong, u) }
      .toDF("event_id", "user_id")
    val r = Events.powerUserShare(ev, topFrac = 0.25).collect().head
    assert(r.getAs[Long]("n_users") == 4 && r.getAs[Long]("n_events") == 16)
    assert(r.getAs[Long]("top_k_users") == 1)
    assert(r.getAs[Long]("top_events") == 5, r)
    assert(r.getAs[Double]("top_share") == 0.3125, r)
  }

  test("cohortValue: cumulative per-cohort value, ltv normalizes by the " +
    "offset-0 cohort size even as later offsets lose users") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val ev = Seq(
      // cohort 01-01: u1 + u2 (size 2); only u1 returns on day 1
      (1L, ts("2024-01-01 08:00:00"), 10.0),
      (2L, ts("2024-01-01 09:00:00"), 20.0),
      (1L, ts("2024-01-02 10:00:00"), 30.0),
      // cohort 01-03: u3 alone
      (3L, ts("2024-01-03 11:00:00"), 5.0))
      .toDF("user_id", "ts", "value")
    val got = Events.cohortValue(ev).collect()
      .map(r => (r.getAs[java.sql.Date]("cohort_day").toString,
        r.getAs[Int]("day_offset")) ->
        ((r.getAs[Long]("n_active"), r.getAs[Double]("day_value"),
          r.getAs[Double]("cum_value"), r.getAs[Double]("ltv_per_user"))))
      .toMap
    assert(got == Map(
      ("2024-01-01", 0) -> ((2L, 30.0, 30.0, 15.0)),
      ("2024-01-01", 1) -> ((1L, 30.0, 60.0, 30.0)), // /2, not /1
      ("2024-01-03", 0) -> ((1L, 5.0, 5.0, 5.0))), got)
  }

  test("dauStream ≡ batch activeUsers dau for closed day windows; a " +
    "user repeated across micro-batches within one day counts once") {
    import spark.implicits._
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val rows = Seq(
      (ts("2024-01-01 08:00:00"), 1L), (ts("2024-01-01 09:00:00"), 1L),
      (ts("2024-01-01 12:00:00"), 2L),
      // -- micro-batch boundary: u1 again SAME day (dedup state carries)
      (ts("2024-01-01 18:00:00"), 1L),
      (ts("2024-01-02 10:00:00"), 1L))
    // day-3 nudge advances the watermark past both days' window ends
    val nudge = (ts("2024-01-03 12:00:00"), 9L)
    val in = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(java.sql.Timestamp, Long)]
    val run = graft.streaming.EventStreams
      .dauStream(in.toDF().toDF("ts", "user_id"), watermark = "1 hour")
      .writeStream.format("memory").queryName("daustream")
      .outputMode("append").start()
    val (b1, b2) = rows.splitAt(3)
    in.addData(b1: _*); run.processAllAvailable()
    in.addData(b2: _*); run.processAllAvailable()
    in.addData(nudge); run.processAllAvailable()
    run.stop()
    val got = spark.table("daustream").collect()
      .map(r => r.getAs[java.sql.Date]("day").toString ->
        r.getAs[Long]("dau")).toMap
    val expect = Events.activeUsers(
        rows.toDF("ts", "user_id"), windowDays = 1).collect()
      .map(r => r.getAs[java.sql.Date]("day").toString ->
        r.getAs[Long]("dau")).toMap
    assert(got == expect, s"stream $got vs batch $expect")
    assert(got == Map("2024-01-01" -> 2L, "2024-01-02" -> 1L), got)
  }

  test("sessionizeStream ≡ batch sessionize across a mid-session " +
    "micro-batch split; state carries, session identity is the start time") {
    import spark.implicits._
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ns = 1000000000L
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    def ts(sec: Long) = new java.sql.Timestamp(base + sec * 1000)
    // (ts, user_id, event_id, event_type, ts_ns); gap rule = 60 s
    val rows = Seq(
      (ts(0), 1L, 101L, "view", 0 * ns),
      (ts(10), 1L, 102L, "click", 10 * ns),
      (ts(5), 2L, 201L, "view", 5 * ns),
      // -- micro-batch boundary SPLITS u1's first session here --
      (ts(20), 1L, 103L, "purchase", 20 * ns), // still session@0 (gap 10)
      (ts(100), 1L, 104L, "view", 100 * ns), // gap 80 > 60: new session
      (ts(70), 2L, 202L, "view", 70 * ns), // gap 65 > 60: new session
      (ts(90), 2L, 203L, "click", 90 * ns)) // gap 20: same session
    val in = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(java.sql.Timestamp, Long, Long, String, Long)]
    val streamIn = in.toDF()
      .toDF("ts", "user_id", "event_id", "event_type", "ts_ns")
    val run = graft.streaming.EventStreams
      .sessionizeStream(streamIn, gapNs = 60 * ns)
      .writeStream.format("memory").queryName("sessstream")
      .outputMode("append").start()
    val (b1, b2) = rows.splitAt(3)
    in.addData(b1: _*); run.processAllAvailable()
    in.addData(b2: _*); run.processAllAvailable()
    run.stop()
    val got = spark.table("sessstream").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("event_id")) ->
        r.getAs[Long]("session_start_ns")).toMap
    // batch twin: same rule, session identity derived as min(et) per
    // (u, sess)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("u"), col("sess"))
    val expect = Events.sessionize(
        rows.toDF("ts", "user_id", "event_id", "event_type", "ts_ns"),
        gapNs = 60 * ns)
      .withColumn("session_start_ns", min(col("et")).over(w))
      .collect()
      .map(r => (r.getAs[Long]("u"), r.getAs[Long]("eid")) ->
        r.getAs[Long]("session_start_ns")).toMap
    assert(got == expect, s"stream $got vs batch $expect")
    // the fixture exercises real session breaks: 3 distinct starts for
    // the 2 users' 4 sessions
    assert(got.values.toSet == Set(0L, 5 * ns, 100 * ns, 70 * ns))
  }

  test("transitionsStream ≡ batch transitions matrix across a mid-session " +
    "micro-batch split; expiry emits the final (end) steps") {
    import spark.implicits._
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ns = 1000000000L
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    def ts(sec: Long) = new java.sql.Timestamp(base + sec * 1000)
    // the sessionizeStream fixture: 2 users, 4 sessions, gap rule 60 s
    val rows = Seq(
      (ts(0), 1L, 101L, "view", 0 * ns),
      (ts(10), 1L, 102L, "click", 10 * ns),
      (ts(5), 2L, 201L, "view", 5 * ns),
      // -- micro-batch boundary SPLITS u1's first session here --
      (ts(20), 1L, 103L, "purchase", 20 * ns),
      (ts(100), 1L, 104L, "view", 100 * ns),
      (ts(70), 2L, 202L, "view", 70 * ns),
      (ts(90), 2L, 203L, "click", 90 * ns))
    // far-future sentinel: advances the watermark past every real user's
    // timeout so the open sessions' terminal (end) steps flush; its own
    // state never times out (the watermark trails it), so it adds nothing
    val nudge = (ts(100000), 9L, 901L, "view", 100000 * ns)
    val in = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(java.sql.Timestamp, Long, Long, String, Long)]
    val streamIn = in.toDF()
      .toDF("ts", "user_id", "event_id", "event_type", "ts_ns")
    val run = graft.streaming.EventStreams
      .transitionsStream(streamIn, gapNs = 60 * ns)
      .writeStream.format("memory").queryName("transstream")
      .outputMode("append").start()
    val (b1, b2) = rows.splitAt(3)
    in.addData(b1: _*); run.processAllAvailable()
    in.addData(b2: _*); run.processAllAvailable()
    in.addData(nudge); run.processAllAvailable()
    run.stop()
    val got = spark.table("transstream").collect()
      .groupBy(r => (r.getAs[String]("from_type"), r.getAs[String]("to_type")))
      .view.mapValues(_.length.toLong).toMap
    val expect = Events.transitions(
        rows.toDF("ts", "user_id", "event_id", "event_type", "ts_ns"),
        gapNs = 60 * ns)
      .collect()
      .map(r => (r.getAs[String]("from_type"), r.getAs[String]("to_type")) ->
        r.getAs[Long]("n_transitions")).toMap
    assert(got == expect, s"stream $got vs batch $expect")
    // the fixture's matrix has both step kinds: intra-session steps AND
    // all four sessions' (end) terminals
    assert(got.values.sum == 7L, got) // 3 intra steps + 4 (end) rows...
  }

  test("transitionsStream: a cross-batch late event joins the current " +
    "session without rewinding the gap anchor — no fabricated (end)") {
    import spark.implicits._
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ns = 1000000000L
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    def ts(sec: Long) = new java.sql.Timestamp(base + sec * 1000)
    val in = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(java.sql.Timestamp, Long, Long, String, Long)]
    val run = graft.streaming.EventStreams
      .transitionsStream(in.toDF()
        .toDF("ts", "user_id", "event_id", "event_type", "ts_ns"),
        gapNs = 60 * ns, watermark = "10 hours")
      .writeStream.format("memory").queryName("latetrans")
      .outputMode("append").start()
    in.addData((ts(100), 1L, 1L, "view", 100 * ns))
    run.processAllAvailable()
    // LATE: et=50 time-travels behind 100 (inside the 10h watermark
    // slack) — joins the current session, anchor must stay at 100
    in.addData((ts(50), 1L, 2L, "click", 50 * ns))
    run.processAllAvailable()
    // 130-100=30 < 60: same session. A rewound anchor (50) would have
    // seen 80 > 60 and fabricated an (end)
    in.addData((ts(130), 1L, 3L, "purchase", 130 * ns))
    run.processAllAvailable()
    run.stop()
    val got = spark.table("latetrans").collect()
      .map(r => (r.getAs[String]("from_type"), r.getAs[String]("to_type")))
    assert(!got.exists(_._2 == "(end)"),
      s"late arrival fabricated a session break: ${got.mkString(";")}")
    assert(got.toSet == Set(("view", "click"), ("click", "purchase")), got)
  }

  test("attributionStream ≡ batch attribution matrix; a conversion " +
    "in a later micro-batch still sees first/last touches from earlier " +
    "batches, and a touchless conversion is (direct)") {
    import spark.implicits._
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ns = 1000000000L
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    def ts(sec: Long) = new java.sql.Timestamp(base + sec * 1000)
    val rows = Seq(
      (ts(0), 1L, 101L, "ad", 0 * ns),
      (ts(10), 1L, 102L, "search", 10 * ns),
      (ts(5), 2L, 201L, "purchase", 5 * ns), // touchless: (direct)
      // -- micro-batch boundary: u1's touches live in batch 1 --
      (ts(20), 1L, 103L, "purchase", 20 * ns), // ad -> search
      (ts(30), 1L, 104L, "purchase", 30 * ns), // STILL ad -> search
      (ts(40), 2L, 202L, "email", 40 * ns),
      (ts(50), 2L, 203L, "purchase", 50 * ns)) // email -> email
    val in = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(java.sql.Timestamp, Long, Long, String, Long)]
    val streamIn = in.toDF()
      .toDF("ts", "user_id", "event_id", "event_type", "ts_ns")
    val run = graft.streaming.EventStreams
      .attributionStream(streamIn, conversionType = "purchase")
      .writeStream.format("memory").queryName("attrstream")
      .outputMode("append").start()
    val (b1, b2) = rows.splitAt(3)
    in.addData(b1: _*); run.processAllAvailable()
    in.addData(b2: _*); run.processAllAvailable()
    run.stop()
    val emitted = spark.table("attrstream").collect()
    val got = emitted
      .groupBy(r => (r.getAs[String]("first_touch"),
        r.getAs[String]("last_touch")))
      .view.mapValues(rs => (rs.length.toLong,
        rs.map(_.getAs[Long]("user_id")).distinct.length.toLong)).toMap
    val expect = Events.attribution(
        rows.toDF("ts", "user_id", "event_id", "event_type", "ts_ns"),
        conversionType = "purchase")
      .collect()
      .map(r => (r.getAs[String]("first_touch"),
        r.getAs[String]("last_touch")) ->
        ((r.getAs[Long]("n_conversions"), r.getAs[Long]("n_users")))).toMap
    assert(got == expect, s"stream $got vs batch $expect")
    assert(got == Map(
      ("ad", "search") -> ((2L, 1L)),
      ("(direct)", "(direct)") -> ((1L, 1L)),
      ("email", "email") -> ((1L, 1L))), got)
  }

  test("rfmApprox tracks the exact twin: base values identical, per-user " +
    "score displacement <= 1 per dimension") {
    Tables.register(spark, sfDir)
    val ev = spark.table("events")
    val exact = Events.rfm(ev).collect()
      .map(r => r.getAs[Long]("user_id") ->
        ((r.getAs[Long]("recency_days"), r.getAs[Long]("frequency"),
          r.getAs[Double]("monetary"),
          r.getAs[Long]("r_score"), r.getAs[Long]("f_score"),
          r.getAs[Long]("m_score")))).toMap
    val approx = Events.rfmApprox(ev).collect()
      .map(r => r.getAs[Long]("user_id") ->
        ((r.getAs[Long]("recency_days"), r.getAs[Long]("frequency"),
          r.getAs[Double]("monetary"),
          r.getAs[Long]("r_score"), r.getAs[Long]("f_score"),
          r.getAs[Long]("m_score")))).toMap
    assert(approx.keySet == exact.keySet)
    for ((u, (rd, fr, mo, r1, f1, m1)) <- exact) {
      val (rda, fra, moa, r2, f2, m2) = approx(u)
      // the base frame is shared code — values must be identical
      assert(rd == rda && fr == fra && mo == moa, s"user $u base")
      // a sketch edge is an observed value within rank error of the
      // interpolated exact edge: a user's score can shift only where
      // their value straddles that edge — at most one step per dimension
      assert(math.abs(r1 - r2) <= 1, s"user $u r_score $r1 vs $r2")
      assert(math.abs(f1 - f2) <= 1, s"user $u f_score $f1 vs $f2")
      assert(math.abs(m1 - m2) <= 1, s"user $u m_score $m1 vs $m2")
    }
  }

  test("session-duration sketch percentiles: counts/max identical, sketch " +
    "values are observed durations within one rank step of the target") {
    Tables.register(spark, sfDir)
    val stats = Events.sessionStats(spark.table("events"))
    val exact = SparkEntry.queries("ev_session_duration_pct")(spark, sfDir)
      .collect().map(r => r.getString(0) ->
        ((r.getAs[Long]("n_sessions"), r.getAs[Long]("max_duration_ns")))).toMap
    val approx = SparkEntry.queries("ev_session_duration_pct_approx")(spark, sfDir)
      .collect().map(r => r.getString(0) ->
        ((r.getAs[Long]("n_sessions"), r.getAs[Long]("max_duration_ns"),
          r.getAs[Double]("p50_duration_ns"),
          r.getAs[Double]("p90_duration_ns")))).toMap
    assert(approx.keySet == exact.keySet)
    val durs = stats.select(col("entry_type"), col("duration_ns")).collect()
      .groupBy(_.getString(0))
      .map { case (k, rs) =>
        k -> rs.map(_.getAs[Long]("duration_ns")).sorted.toIndexedSeq }
    for ((ty, (n, mx, p50, p90)) <- approx) {
      val (ne, mxe) = exact(ty)
      assert(n == ne && mx == mxe, s"$ty basics")
      val ds = durs(ty)
      def rankOk(v: Double, q: Double): Boolean = {
        val target = q * (ds.length - 1)
        ds.zipWithIndex.exists { case (d, i) =>
          d.toDouble == v && math.abs(i - target) <= 1.0 }
      }
      assert(rankOk(p50, 0.5), s"$ty p50 $p50 vs $ds")
      assert(rankOk(p90, 0.9), s"$ty p90 $p90 vs $ds")
    }
  }

  test("interEventGaps: gap attributed to the EARLIER event's type, last " +
    "event of a user contributes nothing") {
    import spark.implicits._
    val ev = Seq(
      (1L, "view", 10L, 1L), (1L, "click", 20L, 2L), (1L, "view", 50L, 3L),
      (2L, "view", 100L, 4L)) // single event: no gap
      .toDF("user_id", "event_type", "ts_ns", "event_id")
    val got = Events.interEventGaps(ev).collect()
      .map(r => r.getAs[String]("event_type") ->
        ((r.getAs[Long]("n_gaps"), r.getAs[Double]("p50_gap_ns"),
          r.getAs[Long]("max_gap_ns")))).toMap
    // view@10 -> click@20 (gap 10, attributed to view);
    // click@20 -> view@50 (gap 30, attributed to click)
    assert(got == Map("view" -> ((1L, 10.0, 10L)),
      "click" -> ((1L, 30.0, 30L))), got)
  }

  test("attributionStreamTtl: an idle-past-ttl user's touches evict on " +
    "the watermark and a later conversion goes (direct); an active user " +
    "keeps full attribution") {
    import spark.implicits._
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ns = 1000000000L
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    def ts(sec: Long) = new java.sql.Timestamp(base + sec * 1000)
    val in = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(java.sql.Timestamp, Long, Long, String, Long)]
    val run = graft.streaming.EventStreams
      .attributionStreamTtl(in.toDF()
          .toDF("ts", "user_id", "event_id", "event_type", "ts_ns"),
        conversionType = "purchase", ttl = "100 seconds",
        watermark = "1 seconds")
      .writeStream.format("memory").queryName("attrttl")
      .outputMode("append").start()
    // u1 touches "ad" then goes idle past the 100 s ttl; u2 touches just
    // before its conversion
    in.addData((ts(0), 1L, 101L, "ad", 0 * ns))
    run.processAllAvailable()
    // watermark nudge far past u1's (lastTs + ttl): u1's state times out
    in.addData((ts(10000), 9L, 901L, "view", 10000 * ns))
    run.processAllAvailable()
    in.addData(
      (ts(20000), 1L, 102L, "purchase", 20000 * ns),
      (ts(20000), 2L, 201L, "promo", 20000 * ns),
      (ts(20010), 2L, 202L, "purchase", 20010 * ns))
    run.processAllAvailable()
    // close u2's window too (not strictly needed — conversions emit
    // immediately in append)
    run.stop()
    val got = spark.table("attrttl").collect()
      .map(r => r.getAs[Long]("user_id") ->
        ((r.getAs[String]("first_touch"), r.getAs[String]("last_touch"))))
      .toMap
    assert(got(1L) == (("(direct)", "(direct)")),
      s"expired user must attribute (direct): $got")
    assert(got(2L) == (("promo", "promo")), got)

    // batching-independence: the SAME history coalesced into ONE
    // micro-batch (the standard catch-up replay shape) must expire
    // exactly what the live run expired — the inline event-time ttl
    // check, not the batch-boundary-dependent state timeout, is the rule
    val in2 = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(java.sql.Timestamp, Long, Long, String, Long)]
    val run2 = graft.streaming.EventStreams
      .attributionStreamTtl(in2.toDF()
          .toDF("ts", "user_id", "event_id", "event_type", "ts_ns"),
        conversionType = "purchase", ttl = "100 seconds",
        watermark = "1 seconds")
      .writeStream.format("memory").queryName("attrttl2")
      .outputMode("append").start()
    in2.addData(
      (ts(0), 1L, 101L, "ad", 0 * ns),
      (ts(10000), 9L, 901L, "view", 10000 * ns),
      (ts(20000), 1L, 102L, "purchase", 20000 * ns),
      (ts(20000), 2L, 201L, "promo", 20000 * ns),
      (ts(20010), 2L, 202L, "purchase", 20010 * ns))
    run2.processAllAvailable(); run2.stop()
    val replay = spark.table("attrttl2").collect()
      .map(r => r.getAs[Long]("user_id") ->
        ((r.getAs[String]("first_touch"), r.getAs[String]("last_touch"))))
      .toMap
    assert(replay == got, s"single-batch replay $replay vs live $got")
  }
}
