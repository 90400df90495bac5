package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** Deterministic release of the block-manager blocks behind
  * `Dataset.localCheckpoint()`.
  *
  * `Dataset.unpersist()` only clears CacheManager entries (the
  * `.persist()`/`.cache()` path); a localCheckpoint's blocks belong to the
  * checkpointed RDD itself and survive until GC + ContextCleaner notice the
  * RDD is unreachable. In a long-lived session (the 155-query bench sweep, a
  * production notebook) that lag lets superseded round-checkpoints pile up
  * in the block manager and squeeze execution memory — the round-8 bench
  * recorded 2-14x regressions on queries late in the sweep with zero code
  * change (VERDICT r8 #2).
  *
  * The checkpointed RDD is reachable through the frame's plan: a
  * checkpointed Dataset's logical plan is exactly a [[LogicalRDD]] leaf over
  * the persisted RDD. Releasing through that leaf frees the blocks NOW.
  *
  * Only call this on frames this module itself checkpointed and has
  * superseded: a checkpointed frame received from a caller also surfaces as
  * a LogicalRDD leaf, and releasing it would free blocks the caller still
  * owns (worse: lineage is truncated, so the data is unrecoverable). */
private[graft] object Blocks {

  /** Free the blocks of every localCheckpoint leaf in `df`'s plan.
    * No-op on frames that were never checkpointed (no LogicalRDD leaves). */
  def release(df: DataFrame): Unit =
    df.queryExecution.analyzed.collect {
      case lr: LogicalRDD => lr.rdd
    }.foreach(_.unpersist(blocking = false))

  /** Eager localCheckpoint that additionally returns the value of a
    * one-row aggregate `metric` OBSERVED during the same materialization:
    * the rows already stream past a CollectMetrics node while the
    * checkpoint job runs, so iterative operators (connected components,
    * trace walks) read their per-round convergence statistic for free
    * instead of paying a separate aggregate job per round. Metric
    * delivery is an async listener hop — poll with a generous timeout and
    * return None if it never arrives (a future Spark behavior change), so
    * a caller can fall back to the explicit job: correctness never rides
    * the piggyback. */
  def checkpointObserving(df: DataFrame, metric: org.apache.spark.sql.Column)
      : (DataFrame, Option[org.apache.spark.sql.Row]) = {
    val obs = org.apache.spark.sql.Observation()
    val out = df.observe(obs, metric).localCheckpoint()
    val t0 = System.nanoTime()
    val row =
      try Some(scala.concurrent.Await.result(obs.future,
        scala.concurrent.duration.Duration(10, "s")))
      catch { case _: java.util.concurrent.TimeoutException => None }
    if (sys.env.contains("SPARK_GRAFT_OBS_DEBUG"))
      System.err.println(f"[obs-wait] ${(System.nanoTime() - t0) / 1e6}%.1f ms")
    (out, row)
  }
}
