package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Registers the driver-provided parquet tables (TESTDATA.md) as temp views.
  *
  * `events.ts` is parquet TIMESTAMP(NANOS,false), which Spark's parquet reader
  * rejects natively. We read it with `spark.sql.legacy.parquet.nanosAsLong`
  * and expose BOTH representations, mirroring the nanosecond-timestamp policy
  * of the reference engine (SURVEY.md §1.3; reference
  * site/src/content/docs/reference/schemas.md:182 — live-ingest tables are
  * µs TIMESTAMP, file readers keep exact ns):
  *   - `ts`    TIMESTAMP (µs, ns truncated toward negative infinity)
  *   - `ts_ns` BIGINT raw nanoseconds since epoch (exact-ns shadow column)
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
    spark.read.parquet(s"$dir/events.parquet")
      .withColumnRenamed("ts", "ts_ns")
      .withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))
  }
}
