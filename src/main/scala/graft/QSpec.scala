package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One named query of the engine's surface: a Spark implementation plus an
  * optional DuckDB oracle SQL (run by the driver on the same parquet tables).
  * Column names of the Spark result and the oracle result MUST match — the
  * driver's comparator sorts columns by name before hashing values.
  */
final case class QSpec(
    name: String,
    spark: (SparkSession, String) => DataFrame,
    oracle: Option[String]) {
  require(name.matches("[a-z0-9_]+"), s"bad query name: $name")
}

object QSpec {
  /** Dev-loop name filter for `SPARK_GRAFT_BENCH_FILTER` /
    * `SPARK_GRAFT_VERIFY_FILTER`: a comma-separated list of name PREFIXES
    * (an exact name is its own prefix). Anchored matching — plain
    * substring made `ss_` select `dd_cro·ss_·dedup` (observed in a judge
    * run); a prefix cannot cross the family underscore. None = no filter
    * (the driver's full-registry mode). */
  def nameMatches(filter: Option[String], name: String): Boolean =
    filter.forall { f =>
      val prefixes = f.split(',').map(_.trim).filter(_.nonEmpty)
      prefixes.isEmpty || prefixes.exists(name.startsWith)
    }

  /** Silence the expected per-release WARN from eager checkpoint-block
    * frees ("locally checkpointed … cannot be recomputed after
    * unpersisting"): superseded round checkpoints are released on purpose
    * and never recomputed, and at 155 queries the repeats would bury the
    * one log line that matters in a bench/verify artifact. */
  def quietCheckpointRelease(): Unit =
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.rdd.MapPartitionsRDD",
      org.apache.logging.log4j.Level.ERROR)

  /** SQL that is valid and result-identical in both Spark SQL and DuckDB. */
  def sameSql(name: String, sql: String): QSpec =
    QSpec(name, (s, dir) => { Tables.register(s, dir); s.sql(sql) }, Some(sql))

  /** Per-dialect SQL (function-name or syntax gaps). */
  def dialect(name: String, sparkSql: String, duckSql: String): QSpec =
    QSpec(name, (s, dir) => { Tables.register(s, dir); s.sql(sparkSql) }, Some(duckSql))

  /** DataFrame-API implementation with a DuckDB oracle. */
  def df(name: String, oracle: String)(fn: (SparkSession, String) => DataFrame): QSpec =
    QSpec(name, (s, dir) => { Tables.register(s, dir); fn(s, dir) }, Some(oracle))

  /** No DuckDB-expressible oracle — driver records a rows-only check. */
  def noOracle(name: String)(fn: (SparkSession, String) => DataFrame): QSpec =
    QSpec(name, (s, dir) => { Tables.register(s, dir); fn(s, dir) }, None)
}
