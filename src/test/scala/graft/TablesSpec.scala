package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Pins `Tables.events`' fixture-schema tolerance: the driver has shipped
  * `events.ts` both as parquet TIMESTAMP(NANOS) (reads as BIGINT ns under
  * `nanosAsLong`) and as TIMESTAMP(MICROS) (round 6's regenerated testdata —
  * that flip broke every events query and zeroed the round's artifacts,
  * ADVICE r6). Both shapes must yield the same two-column contract:
  * `ts` TIMESTAMP (µs) + `ts_ns` BIGINT ns. */
class TablesSpec extends SparkTestBase {

  private def writeAndRead(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val dir = java.nio.file.Files.createTempDirectory("tables_spec").toString
    df.write.mode("overwrite").parquet(s"$dir/events.parquet")
    Tables.events(spark, dir)
  }

  test("ns-long fixture: ts_ns kept exact, ts truncated to micros") {
    import spark.implicits._
    // 1640995200.123456789s — ns precision beyond micros
    val ns = 1640995200123456789L
    val ev = writeAndRead(Seq((ns, "click", 1.0)).toDF("ts", "kind", "value"))
    assert(ev.schema("ts").dataType == TimestampType)
    assert(ev.schema("ts_ns").dataType == LongType)
    val row = ev.select(col("ts_ns"), unix_micros(col("ts"))).head()
    assert(row.getLong(0) == ns)
    assert(row.getLong(1) == ns / 1000) // truncated toward -inf
  }

  test("timestamp[us] fixture: ts normalized to TimestampType, ts_ns derived") {
    import spark.implicits._
    val micros = 1640995200123456L
    val ev = writeAndRead(
      Seq((micros, "click", 1.0)).toDF("us", "kind", "value")
        .select(timestamp_micros(col("us")).as("ts"), col("kind"), col("value")))
    assert(ev.schema("ts").dataType == TimestampType)
    assert(ev.schema("ts_ns").dataType == LongType)
    val row = ev.select(col("ts_ns"), unix_micros(col("ts"))).head()
    assert(row.getLong(0) == micros * 1000L)
    assert(row.getLong(1) == micros)
  }

  test("driver testdata fixture registers and both columns are queryable") {
    val ev = Tables.events(spark, sfDir)
    assert(ev.schema("ts").dataType == TimestampType)
    assert(ev.schema("ts_ns").dataType == LongType)
    // integer `div`, not `/`: double division of ns-magnitude longs
    // (~1.6e18 > 2^53) rounds by up to ~128ns and can fail on a true
    // nanosecond fixture — the exact shape this disjunct exists to tolerate
    val n = ev.filter(col("ts_ns") === unix_micros(col("ts")) * 1000L ||
      expr("ts_ns div 1000") === unix_micros(col("ts"))).count()
    assert(n == ev.count() && n > 0)
  }
}
