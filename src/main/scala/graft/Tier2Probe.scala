package graft

import graft.streaming.{SealBatch, SealFrames}

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import scala.jdk.CollectionConverters._

/** Scale probe for the tier-2 physical-layout read path (see
  * TierTwoReadSpec for the correctness-gated version of the same
  * assertions at toy scale). Seals a multi-million-span corpus through the
  * production write path (SealFrames.stageAndPublish: (service, time)
  * clustering + adaptive trace_id blooms), then measures what Spark's
  * parquet read side actually fetches:
  *
  *   - trace_id point lookup, bloom filtering on vs off (reference
  *     measured ~8x bytes: benchmark/otlp-compaction-probe/README.md)
  *   - single-service scan, clustered layout vs the identical rows
  *     written unclustered (reference measured ~3.2x scan cost:
  *     benchmark/otlp-query-probe/README.md)
  *
  * Usage: runMain graft.Tier2Probe [spansInMillions] (default 2)
  * Prints one [tier2] line per measurement; ratios land in SCALE.md.
  * Measured reads disable parquet.hadoop.vectored.io (it bypasses the FS
  * statistics counters — fetch mechanics change, needed ranges don't). */
object Tier2Probe {
  def main(args: Array[String]): Unit = {
    val millions = if (args.nonEmpty) args(0).toDouble else 2.0
    val n = (millions * 1e6).toLong
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val base = new java.io.File("/tmp/graft_tier2_probe")
    org.apache.commons.io.FileUtils.deleteDirectory(base)
    val clustered = s"${base.getAbsolutePath}/clustered"
    val unclustered = s"${base.getAbsolutePath}/unclustered"

    def spans(from: Long, count: Long): DataFrame =
      spark.range(from, from + count).select(
        timestamp_micros(lit(1699920000000000L) + (col("id") % 86400L) * 1000000L)
          .as("start_time_unix_nano"),
        (col("id") % 1000 + 1).as("duration_time_unix_nano"),
        md5(concat(lit("t"), col("id"))).as("trace_id"),
        col("id").cast("string").as("span_id"),
        format_string("svc%02d", col("id") % 20).as("service_name"))

    // Moderate row groups (8 MB) so each multi-hundred-MB-equivalent file
    // has the many-row-group shape a production 128 MB-group seal has.
    val hconf = spark.sparkContext.hadoopConfiguration
    hconf.set("parquet.block.size", (8 * 1024 * 1024).toString)

    // One file per seal (coalesce(1)): a production seal file is hundreds
    // of MB with many row groups; at probe scale the equivalent shape is a
    // ~500k-row file with ~4 row groups of the 8 MB size set above. The
    // earlier many-tiny-files shape (16 files x 15k rows per seal) has one
    // row group per file spanning all 20 services — nothing for clustering
    // to prune, and not what a large deployment's layout looks like.
    val seals = 4
    val per = n / seals
    val t0 = System.nanoTime()
    (0 until seals).foreach { i =>
      SealFrames.stageAndPublish(spark,
        SealBatch("traces", IndexedSeq.empty, 0L, 0L, 0L, s"t2-$i", Nil),
        spans(i * per, per).coalesce(1), new Path(clustered))
    }
    val sealSec = (System.nanoTime() - t0) / 1e9
    spans(0L, n)
      .withColumn("year", date_format(col("start_time_unix_nano"), "yyyy"))
      .withColumn("month", date_format(col("start_time_unix_nano"), "MM"))
      .withColumn("day", date_format(col("start_time_unix_nano"), "dd"))
      .repartition(seals, col("trace_id"))
      .write.mode("overwrite").partitionBy("year", "month", "day")
      .option("compression", "zstd").parquet(unclustered)
    println(f"[tier2] sealed n=$n in $sealSec%.1f s")

    def bytesAndTime[A](fn: => A): (Long, Double) = {
      FileSystem.clearStatistics()
      val s = System.nanoTime()
      fn
      val sec = (System.nanoTime() - s) / 1e9
      (FileSystem.getAllStatistics.asScala.map(_.getBytesRead).sum, sec)
    }
    def read(opts: (String, String)*) = {
      var r = spark.read.option("parquet.hadoop.vectored.io.enabled", "false")
      opts.foreach { case (k, v) => r = r.option(k, v) }
      r
    }

    val target = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"t${n / 2}".getBytes("UTF-8"))
      d.map("%02x".format(_)).mkString
    }
    def lookup(on: Boolean): (Long, Double) = bytesAndTime {
      val rows = read("parquet.filter.bloom.enabled" -> on.toString)
        .parquet(clustered).where(col("trace_id") === target)
        .select("span_id").collect()
      require(rows.length == 1, s"expected 1 span, got ${rows.length}")
    }
    lookup(on = true) // warmup (codegen + file listing)
    val (bOn, tOn) = lookup(on = true)
    val (bOff, tOff) = lookup(on = false)
    println(f"[tier2] bloom point lookup: on=${bOn / 1024}KB/$tOn%.2fs " +
      f"off=${bOff / 1024}KB/$tOff%.2fs bytes_ratio=${bOff.toDouble / bOn}%.1fx")

    def svcScan(root: String): (Long, Double) = bytesAndTime {
      val c = read().parquet(root).where(col("service_name") === "svc07")
        .select("trace_id").collect().length
      require(c == n / 20, s"expected ${n / 20} rows, got $c")
    }
    svcScan(clustered) // warmup
    val (bC, tC) = svcScan(clustered)
    val (bU, tU) = svcScan(unclustered)
    println(f"[tier2] service scan: clustered=${bC / 1024}KB/$tC%.2fs " +
      f"unclustered=${bU / 1024}KB/$tU%.2fs bytes_ratio=${bU.toDouble / bC}%.1fx " +
      f"time_ratio=${tU / tC}%.1fx")

    org.apache.commons.io.FileUtils.deleteDirectory(base)
    spark.stop()
  }
}
