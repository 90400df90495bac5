package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable sampling for training-data pipelines.
  *
  * Unlike `df.sample` (RNG seeded per partition — resample on any
  * repartition, irreproducible across engines), these operators derive the
  * keep/drop decision from md5 of the row's id: the same row makes the same
  * decision in any engine, any partitioning, any run — which is what makes
  * a training-data sample auditable. Pure map-side filters: they push down
  * to the scan and never shuffle.
  */
object Sampling {

  /** Uniform value in [0,1) derived from md5(salt || id): the first 8 hex
    * chars read as a 32-bit integer, over 2^32. */
  def hashUnit(idCol: Column, salt: String): Column =
    conv(substring(md5(concat(lit(salt), idCol.cast("string"))), 1, 8), 16, 10)
      .cast("double") / lit(4294967296.0)

  /** Deterministic Bernoulli sample at `rate`. */
  def hashSample(df: DataFrame, rate: Double, salt: String = "s0",
                 idCol: String = "doc_id"): DataFrame =
    df.where(hashUnit(col(idCol), salt) < rate)

  /** Stratified sample: per-stratum keep rates (e.g. downsample a dominant
    * language), strata not listed keep `defaultRate`. The rebalancing
    * primitive of corpus curation — one map-side filter regardless of the
    * number of strata. */
  def stratifiedSample(df: DataFrame, strataCol: String,
                       rates: Map[String, Double], defaultRate: Double,
                       salt: String = "s0", idCol: String = "doc_id"): DataFrame = {
    val rate = rates.foldLeft(lit(defaultRate)) { case (acc, (stratum, r)) =>
      when(col(strataCol) === stratum, lit(r)).otherwise(acc)
    }
    df.where(hashUnit(col(idCol), salt) < rate)
  }

  /** Exact top-k rows per stratum by `scoreCol` (descending), ties broken
    * deterministically by `idCol` ascending — the curation primitive between
    * sampling (keep a rate) and packing (keep everything, order it): keep
    * the k BEST of each stratum, reproducibly.
    *
    * Runs in two window passes so one giant stratum cannot pin a single
    * task: pass 1 prunes within (stratum, salt-bucket) — a row in the
    * stratum's global top-k is necessarily in its bucket's top-k, so
    * pruning is lossless — and pass 2 ranks the <= buckets*k survivors per
    * stratum. The heavy sort is over buckets-way parallel slices of the
    * data; the final sort sees k*buckets rows per stratum regardless of
    * stratum size. Output carries `rank_in_stratum` (1-based, dense in the
    * row_number sense). */
  def stratumTopK(df: DataFrame, strataCol: String, scoreCol: Column, k: Int,
                  idCol: String = "doc_id", buckets: Int = 32): DataFrame = {
    require(k > 0 && buckets > 0, "k and buckets must be positive")
    // crc32 of the id is deterministic across runs/partitionings (unlike
    // spark_partition_id) — same row, same bucket, same survivors
    val salt = pmod(crc32(col(idCol).cast("string")), lit(buckets))
    val local = Window.partitionBy(col(strataCol), salt)
      .orderBy(scoreCol.desc, col(idCol).asc)
    val global = Window.partitionBy(col(strataCol))
      .orderBy(scoreCol.desc, col(idCol).asc)
    df.withColumn("_bucket_rank", row_number().over(local))
      .where(col("_bucket_rank") <= k)
      .drop("_bucket_rank")
      .withColumn("rank_in_stratum", row_number().over(global))
      .where(col("rank_in_stratum") <= k)
  }
}
