package graft

import graft.operators.Signals
import org.apache.spark.sql.functions._

class SignalsSpec extends SparkTestBase {

  test("resourceInventory: per-service signal counts zero-fill missing " +
    "signals, the time span covers ALL signals, null services surface") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val logs = Seq(("a", ts("2024-01-01 00:00:10")),
        ("a", ts("2024-01-01 00:00:50")),
        (null: String, ts("2024-01-01 00:00:20")))
      .toDF("service_name", "time_unix_nano")
    // the null-service span must MERGE with the null-service log row
    // (null-safe join keys), not fragment into a second null row
    val spans = Seq(("a", ts("2024-01-01 00:00:05")),
        ("b", ts("2024-01-01 00:01:00")),
        (null: String, ts("2024-01-01 00:00:30")))
      .toDF("service_name", "start_time_unix_nano")
    val points = Seq(("c", ts("2024-01-01 00:02:00")))
      .toDF("service_name", "time_unix_nano")
    val got = Signals.resourceInventory(logs, spans, points).collect()
      .map(r => Option(r.getAs[String]("service_name")) ->
        ((r.getAs[Long]("n_logs"), r.getAs[Long]("n_spans"),
          r.getAs[Long]("n_points"),
          r.getAs[java.sql.Timestamp]("first_time").toString,
          r.getAs[java.sql.Timestamp]("last_time").toString))).toMap
    assert(got == Map(
      // span at 00:00:05 opens a's window even though logs start later
      Some("a") -> ((2L, 1L, 0L, "2024-01-01 00:00:05.0",
        "2024-01-01 00:00:50.0")),
      Some("b") -> ((0L, 1L, 0L, "2024-01-01 00:01:00.0",
        "2024-01-01 00:01:00.0")),
      Some("c") -> ((0L, 0L, 1L, "2024-01-01 00:02:00.0",
        "2024-01-01 00:02:00.0")),
      None -> ((1L, 1L, 0L, "2024-01-01 00:00:20.0",
        "2024-01-01 00:00:30.0"))), got)
  }
}
