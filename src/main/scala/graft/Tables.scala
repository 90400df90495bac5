package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Registers the driver-provided parquet tables (TESTDATA.md) as temp views.
  *
  * `events.ts` has shipped as either parquet TIMESTAMP(NANOS,false) (older
  * fixtures; Spark's parquet reader rejects it natively, so we read with
  * `spark.sql.legacy.parquet.nanosAsLong` and it surfaces as BIGINT ns) or
  * plain TIMESTAMP(MICROS) (current fixtures). We branch on the read schema
  * and expose BOTH representations either way, mirroring the
  * nanosecond-timestamp policy of the reference engine (SURVEY.md §1.3;
  * reference site/src/content/docs/reference/schemas.md:182 — live-ingest
  * tables are µs TIMESTAMP, file readers keep exact ns):
  *   - `ts`    TIMESTAMP (µs; when source is ns, truncated toward −∞)
  *   - `ts_ns` BIGINT nanoseconds since epoch (exact when source is ns,
  *             µs·1000 when source is µs)
  */
object Tables {
  val plainTables: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "documents", "embeddings")

  private val registered = scala.collection.mutable.Set[String]()

  /** Idempotently register all test tables from `dir` as temp views. */
  def register(spark: SparkSession, dir: String): Unit = synchronized {
    val key = System.identityHashCode(spark) + "|" + dir
    if (registered.contains(key)) return
    plainTables.foreach { t =>
      spark.read.parquet(s"$dir/$t.parquet").createOrReplaceTempView(t)
    }
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    events(spark, dir).createOrReplaceTempView("events")
    // mark only after full success so a partial failure is retried
    registered.add(key)
  }

  /** The events table with `ts` (µs timestamp) and `ts_ns` (raw ns long). */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$dir/events.parquet")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        // TIMESTAMP(NANOS) fixture read as raw ns longs
        raw.withColumnRenamed("ts", "ts_ns")
          .withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))
      case _: org.apache.spark.sql.types.TimestampType |
           _: org.apache.spark.sql.types.TimestampNTZType =>
        // Normalize to TimestampType (session TZ is UTC in every entrypoint)
        // so downstream queries see the same type the ns fixture produced.
        raw.withColumn("ts", col("ts").cast("timestamp"))
          .withColumn("ts_ns", unix_micros(col("ts")) * lit(1000L))
      case other =>
        throw new IllegalStateException(
          s"events.ts has unsupported parquet type $other (expected ns-long or timestamp)")
    }
  }
}
