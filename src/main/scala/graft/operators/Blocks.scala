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
}
