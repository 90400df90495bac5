package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** At-least-once replay dedup that rides the aggregation's own shuffle.
  *
  * The seal export is at-least-once, so every telemetry-analytics operator
  * must drop byte-equal replayed rows before aggregating (the traceTree
  * convention). A bare `distinct()` is correct but costs a corpus-wide
  * exchange keyed by EVERY column — including wide attribute-JSON strings —
  * in addition to the window/groupBy exchange the operator needs anyway:
  * two full passes over the corpus where one suffices.
  *
  * [[Replay.dedupWithin]] folds the dedup into one window partitioned by
  * the keys the downstream aggregation shuffles on: each partition is
  * totally ordered by every column, so byte-equal rows land adjacent and
  * a row equal to its predecessor (null-safe struct compare) is a replay.
  * Because the partitioning matches (or subsumes) the clustering the next
  * window/groupBy requires, Catalyst inserts NO second corpus exchange —
  * plan-pinned in PlanSpec.
  *
  * Key choice rules (callers): the keys must be a function of the row (so
  * replays co-locate — any column subset qualifies) and must match the
  * downstream shuffle keys; include a time/uniformizing column when the
  * aggregation key alone would make a partition hold an unbounded slice of
  * the corpus (e.g. histogram layouts aggregate per (name, bounds) over
  * all time — dedup on (name, bounds, time) and let the exploded partial
  * agg re-key, its exchange is output-cardinality-sized).
  */
private[graft] object Replay {

  /** Drop byte-equal duplicate rows, shuffling once on `keys`. */
  def dedupWithin(df: DataFrame, keys: Seq[Column]): DataFrame = {
    val all = df.columns.toSeq.map(col)
    val w = Window.partitionBy(keys: _*).orderBy(all: _*)
    df.withColumn("__replay_prev", lag(struct(all: _*), 1).over(w))
      .where(!(col("__replay_prev") <=> struct(all: _*)))
      .drop("__replay_prev")
  }

  /** Aligned window start: the timestamp floored to a `windowSec` grid.
    * ONE shared definition — operators that window on time must align
    * identically or their outputs stop composing (logCountMetric's
    * points feed overTime; a drifted copy would mis-bucket silently). */
  def windowStart(timeCol: Column, windowSec: Long): Column =
    timestamp_seconds(
      floor(unix_micros(timeCol) / lit(windowSec * 1000000L))
        .cast("long") * windowSec)
}
