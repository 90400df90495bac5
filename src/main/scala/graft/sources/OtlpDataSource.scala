package graft.sources

import com.fasterxml.jackson.databind.ObjectMapper
import graft.otlp.{OtlpJsonParser, OtlpParseException, OtlpSchemas}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{DataType, StructType, _}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import java.io.IOException
import java.util.OptionalLong
import scala.collection.JavaConverters._

/** `spark.read.format("otlp").option("signal", "<signal>").load(path)` —
  * batch DSv2 reader for OTLP JSON / JSONL / protobuf telemetry files,
  * the Spark-native analog of the reference's 12 `read_otlp_*`/`read_otap_*`
  * table functions (reference src/function/read_otlp.cpp; SURVEY.md §2.1).
  *
  * Options:
  *   - `signal` (default "logs"): logs | traces | metrics_gauge |
  *     metrics_sum | metrics_histogram | metrics_exp_histogram.
  *     "metrics" / "metrics_summary" reproduce the reference's registered
  *     placeholders and throw at schema resolution.
  *   - `format` (default "auto"): auto | otlp | otap — otap reads
  *     OTel-Arrow `BatchArrowRecords` streams.
  *   - `ns_as_long`: expose ns-timestamp columns as raw BIGINT nanoseconds
  *     instead of µs TimestampType (exact-ns fidelity; SURVEY.md §7.3 #1).
  *   - `max_file_bytes` (default 100 MB): whole-file materialization cap,
  *     kept for behavioral parity with the reference's prototype reader.
  *
  * Execution model: the glob expands at table resolution (error when no file
  * matches, like the reference's bind step); each matched file becomes one
  * `InputPartition` — identical parallelism to the reference's
  * one-thread-per-file scan, but distributed across executors. Projection
  * pushdown prunes the emitted columns; filter pushdown is deliberately
  * omitted (reference declares filter_pushdown=false) — Catalyst still
  * evaluates filters above the scan.
  *
  * Scale: at 100 TB the unit of work stays one file per task, so input
  * layout (many medium files) drives parallelism; readers stream bytes via
  * the Hadoop FS API (s3a/abfs/gs work unchanged) and emit pruned rows.
  */
class OtlpDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "otlp"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    OtlpSchemas.forSignal(
      options.getOrDefault("signal", "logs"),
      options.getBoolean("ns_as_long", false))

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: java.util.Map[String, String]): Table =
    new OtlpTable(schema, new CaseInsensitiveStringMap(properties))
}

object OtlpDataSource {
  val DefaultMaxFileBytes: Long = 100L * 1024 * 1024

  /** Expand `path`/`paths` options through the Hadoop FS glob; error when a
    * pattern matches nothing (reference bind-time contract). */
  def resolveFiles(options: CaseInsensitiveStringMap, conf: Configuration): Seq[(String, Long)] = {
    val patterns: Seq[String] =
      if (options.containsKey("paths"))
        new ObjectMapper().readTree(options.get("paths")).elements().asScala
          .map(_.asText()).toSeq
      else Option(options.get("path")).toSeq
    if (patterns.isEmpty)
      throw new IllegalArgumentException("otlp source requires a path")
    patterns.flatMap { p =>
      val hp = new Path(p)
      val fs = hp.getFileSystem(conf)
      val matches = Option(fs.globStatus(hp)).map(_.toSeq).getOrElse(Seq.empty)
      if (matches.isEmpty)
        throw new IOException(s"No files found matching pattern: $p")
      matches.filter(_.isFile).map(st => (st.getPath.toString, st.getLen))
    }
  }
}

class OtlpTable(schema: StructType, options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {
  override def name(): String =
    s"otlp(${options.getOrDefault("signal", "logs")})"
  override def schema(): StructType = schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder = {
    val merged = new java.util.HashMap[String, String](options)
    merged.putAll(opts)
    new OtlpScanBuilder(schema, new CaseInsensitiveStringMap(merged))
  }
}

class OtlpScanBuilder(fullSchema: StructType, options: CaseInsensitiveStringMap)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = fullSchema
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = {
    val conf = SparkSession.active.sessionState.newHadoopConf()
    val files = OtlpDataSource.resolveFiles(options, conf)
    new OtlpScan(fullSchema, required, files, options)
  }
}

class OtlpScan(fullSchema: StructType, required: StructType,
               files: Seq[(String, Long)], options: CaseInsensitiveStringMap)
    extends Scan with Batch with SupportsReportStatistics {
  private val signal = options.getOrDefault("signal", "logs")
  private val nsAsLong = options.getBoolean("ns_as_long", false)
  private val format = options.getOrDefault("format", "auto")
  private val maxBytes =
    options.getLong("max_file_bytes", OtlpDataSource.DefaultMaxFileBytes)

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"otlp signal=$signal files=${files.size}"
  override def estimateStatistics(): Statistics = new Statistics {
    override def sizeInBytes(): OptionalLong =
      OptionalLong.of(files.map(_._2).sum)
    override def numRows(): OptionalLong = OptionalLong.empty()
  }
  override def planInputPartitions(): Array[InputPartition] =
    files.map { case (p, len) => OtlpInputPartition(p, len) }.toArray
  override def createReaderFactory(): PartitionReaderFactory =
    new OtlpReaderFactory(signal, fullSchema, required, nsAsLong, format, maxBytes)
}

case class OtlpInputPartition(path: String, length: Long) extends InputPartition

class OtlpReaderFactory(signal: String, fullSchema: StructType,
                        required: StructType, nsAsLong: Boolean,
                        format: String, maxBytes: Long)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[OtlpInputPartition]
    new OtlpPartitionReader(p, signal, fullSchema, required, nsAsLong, format, maxBytes)
  }
}

/** Reads one whole file, parses it, and emits pruned `InternalRow`s. */
class OtlpPartitionReader(partition: OtlpInputPartition, signal: String,
                          fullSchema: StructType, required: StructType,
                          nsAsLong: Boolean, format: String, maxBytes: Long)
    extends PartitionReader[InternalRow] {

  private val projection: Array[Int] =
    required.fields.map(f => fullSchema.fieldIndex(f.name))
  private val types: Array[DataType] = required.fields.map(_.dataType)

  private lazy val rows: Iterator[Array[Any]] = {
    if (partition.length > maxBytes)
      throw new IOException(
        s"File ${partition.path} is ${partition.length} bytes which exceeds " +
          s"the ${maxBytes} byte limit")
    val path = new Path(partition.path)
    val fs = path.getFileSystem(new Configuration())
    val in = fs.open(path)
    val content =
      try {
        val buf = new Array[Byte](partition.length.toInt)
        in.readFully(0, buf)
        buf
      } finally in.close()
    try {
      val needed = required.fieldNames.toSet
      val parsed = OtlpFormats.parse(content, format, nsAsLong, signal, needed.contains)
      parsed.signal(signal).iterator
    } catch {
      case e: OtlpParseException =>
        throw new IOException(
          s"OTLP parse error on ${partition.path}: ${e.getMessage}")
    }
  }

  private var current: InternalRow = _

  override def next(): Boolean = {
    if (rows.hasNext) {
      val full = rows.next()
      val vals = new Array[Any](projection.length)
      var i = 0
      while (i < projection.length) {
        vals(i) = OtlpPartitionReader.toCatalyst(full(projection(i)), types(i))
        i += 1
      }
      current = new GenericInternalRow(vals)
      true
    } else false
  }
  override def get(): InternalRow = current
  override def close(): Unit = ()
}

object OtlpPartitionReader {
  /** JVM value from the parser → Catalyst internal value. */
  def toCatalyst(v: Any, dt: DataType): Any = v match {
    case null              => null
    case s: String         => UTF8String.fromString(s)
    case a: Array[Long]    => new GenericArrayData(a)
    case a: Array[Double]  => new GenericArrayData(a)
    case other             => other // Long/Int/Double/Boolean primitives
  }
}

/** Format detection + dispatch shared by the batch reader and ingest server. */
object OtlpFormats {
  /** logs → logs, traces → traces, metrics_* → metrics (a .pb file doesn't
    * self-describe its request type; the requested signal picks it, exactly
    * like the reference's `otlp_transform(data, signal)` FFI). */
  def family(signal: String): String =
    if (signal.startsWith("metrics")) "metrics" else signal

  /** auto: '{' (after whitespace) → OTLP JSON/JSONL; otherwise protobuf.
    * `need` is the projection predicate — pruned columns skip their
    * (expensive) rendering in the JSON/protobuf row builders. */
  def parse(content: Array[Byte], format: String, nsAsLong: Boolean,
            signal: String,
            need: String => Boolean = _ => true): OtlpJsonParser.ParsedFile =
    format match {
      case "otap" => graft.otlp.OtapDecoder.parse(content, nsAsLong)
      case "otlp" | "auto" =>
        var i = 0
        while (i < content.length && Character.isWhitespace(content(i))) i += 1
        if (content.isEmpty || (i < content.length && content(i) == '{'))
          OtlpJsonParser.parse(content, nsAsLong, need)
        else
          graft.otlp.OtlpProtoParser.parse(content, family(signal), nsAsLong, need)
      case other =>
        throw new IllegalArgumentException(s"unknown otlp format '$other'")
    }
}
