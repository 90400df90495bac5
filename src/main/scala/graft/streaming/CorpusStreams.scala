package graft.streaming

import graft.operators.{CorpusFilters, Dedup}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured-Streaming corpus curation: the training-data operators
  * applied to a LIVE document feed (a crawler drop-folder, a Kafka topic,
  * the seal export of an ingest server) instead of a settled corpus. The
  * map-only curation family (C4/Gopher filters, PII redaction, quality,
  * token counts) composes with streaming DataFrames untouched — this
  * object adds the pieces that genuinely need streaming machinery:
  * watermarked state for cross-batch dedup and event-time windowed corpus
  * telemetry.
  *
  * Scale: dedup state is keyed by md5(text) — maximally uniform, sized by
  * the watermark horizon not the corpus (the store holds one key per
  * DISTINCT recent document); windowed stats state is (window × stratum)
  * rows. Both partition cleanly across executors, and late arrivals
  * beyond the watermark are dropped rather than growing state without
  * bound — the same contract as TelemetryStreams.
  */
object CorpusStreams {

  /** Cross-batch exact dedup over a document stream: the first arrival of
    * a text body within the watermark horizon survives, replays and
    * duplicates after it are suppressed. This is the streaming face of
    * `Dedup.exactGroups` — state bounded by the horizon, so an
    * at-least-once upstream (e.g. the parquet seal export) becomes
    * effectively-once for downstream training-data consumers. */
  def dedupDocStream(docs: DataFrame, tsCol: String = "ts",
                     textCol: String = "text",
                     watermark: String = "10 minutes"): DataFrame =
    docs
      .withColumn("text_hash", md5(col(textCol)))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("text_hash")
      // the state key is internal — callers get their own schema back,
      // the same contract qualityGate keeps
      .drop("text_hash")

  /** Quality gate on the stream: Gopher document rules as one map-only
    * WHERE (`CorpusFilters.gopherKeep`), keeping the caller's columns —
    * attaches to a streaming plan unchanged; a join against the
    * measurement frame would be a stream-stream join. */
  def qualityGate(docs: DataFrame, textCol: String = "text",
                  minWords: Int = 50): DataFrame =
    docs.where(CorpusFilters.gopherKeep(col(textCol), minWords = minWords))

  /** Event-time windowed corpus telemetry per stratum: docs, tokens, and
    * mean quality per (window, stratum) — the live dashboard a curation
    * pipeline publishes while filling shards. Append-mode compatible
    * (watermarked tumbling windows). */
  def corpusStats(docs: DataFrame, tsCol: String = "ts",
                  strataCol: String = "lang", textCol: String = "text",
                  windowLen: String = "1 minute",
                  watermark: String = "2 minutes"): DataFrame =
    docs
      .withColumn("toks", size(Dedup.tokens(col(textCol))).cast("long"))
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen).as("w"), col(strataCol))
      .agg(count(lit(1)).as("docs"), sum("toks").as("tokens"))
      .select(col("w.start").as("window_start"), col("w.end").as("window_end"),
        col(strataCol), col("docs"), col("tokens"))
}
