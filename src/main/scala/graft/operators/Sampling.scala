package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
}
