package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Metric-stream transforms over the flattened sum table the OTLP readers
  * produce — collector-side conversions the storage layer (reference:
  * store-what-arrives) leaves to the query engine. */
object Metrics {

  /** DELTA → CUMULATIVE temporality conversion for sum metrics (the OTel
    * collector's cumulativetodelta processor, inverted): within each
    * series — (name, service, attribute set) — delta points become the
    * running sum in time order and report temporality 2; points that
    * arrived cumulative (or unspecified) pass through byte-unchanged.
    * The conversion every dashboard needs when producers ship mixed
    * temporalities.
    *
    * Shape at 100 TB: ONE window partitioned by the series key — high
    * cardinality (uniform), and each partition holds only that series'
    * points within the table's retention, so no single task sees more
    * than one series' history. Temporality rides in the partition key, so
    * the running sum never mixes delta and cumulative points of a
    * same-named series. */
  def deltaToCumulative(sums: DataFrame): DataFrame = {
    val w = Window
      .partitionBy(col("name"), col("service_name"),
        col("metric_attributes"), col("aggregation_temporality"))
      .orderBy(col("time_unix_nano"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val isDelta = col("aggregation_temporality") === 1
    sums
      .withColumn("int_value",
        when(isDelta, sum(col("int_value")).over(w))
          .otherwise(col("int_value")))
      .withColumn("double_value",
        when(isDelta, sum(col("double_value")).over(w))
          .otherwise(col("double_value")))
      .withColumn("aggregation_temporality",
        when(isDelta, lit(2)).otherwise(col("aggregation_temporality")))
  }
}
