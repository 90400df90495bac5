package graft.sources

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.UnsafeRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** In-memory DSv2 batch source over rows already encoded as UnsafeRow byte
  * images (graft.streaming.RowBin).
  *
  * This is the seal pipeline's bridge from the driver-resident ingest
  * buffers into a distributed Spark write with ZERO per-row work on the
  * driver: `planInputPartitions` hands each task a chunk of byte arrays
  * (fast to serialize — no boxed objects), and the partition reader emits
  * each image as an `InternalRow` via `UnsafeRow.pointTo` — no conversion,
  * no copy. Pure public DSv2 API; on a real cluster the chunks ride inside
  * the InputPartition exactly as any first-party in-memory source would.
  *
  * Data is handed over through a driver-side registry keyed by a one-shot
  * handle (register → read → unregister), because DSv2 options can only
  * carry strings. */
class SealRowSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SealRowSource.entry(options.get(SealRowSource.HandleKey)).schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: java.util.Map[String, String]): Table =
    new SealRowTable(schema, properties.get(SealRowSource.HandleKey))
  override def supportsExternalMetadata(): Boolean = true
}

object SealRowSource {
  private[sources] val HandleKey = "handle"

  final case class Entry(schema: StructType, chunks: Array[Array[Array[Byte]]])

  private val registry = new ConcurrentHashMap[String, Entry]()
  private val seq = new AtomicLong(0)

  def register(schema: StructType, chunks: Array[Array[Array[Byte]]]): String = {
    val handle = s"seal-${seq.incrementAndGet()}"
    registry.put(handle, Entry(schema, chunks))
    handle
  }

  def unregister(handle: String): Unit = registry.remove(handle)

  private[sources] def entry(handle: String): Entry = {
    val e = registry.get(handle)
    if (e == null)
      throw new IllegalStateException(
        s"seal handle $handle is not registered (already unregistered?)")
    e
  }

  def dataFrame(spark: SparkSession, handle: String): DataFrame =
    spark.read.format(classOf[SealRowSource].getName)
      .option(HandleKey, handle).load()
}

class SealRowTable(schema0: StructType, handle: String)
    extends Table with SupportsRead {
  override def name(): String = s"graft_seal_$handle"
  override def schema(): StructType = schema0
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder =
    () => new SealRowScan(schema0, handle)
}

class SealRowScan(schema: StructType, handle: String) extends Scan with Batch {
  override def readSchema(): StructType = schema
  override def toBatch: Batch = this
  override def description(): String = s"GraftSealRows(handle=$handle)"
  // resolved on the DRIVER at plan time, while the handle is registered;
  // the chunks then travel inside the serialized partitions
  override def planInputPartitions(): Array[InputPartition] = {
    val e = SealRowSource.entry(handle)
    e.chunks.map(c => SealRowPartition(c, e.schema.fields.length): InputPartition)
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new SealRowReaderFactory
}

case class SealRowPartition(rows: Array[Array[Byte]], numFields: Int)
    extends InputPartition

class SealRowReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[SealRowPartition]
    new PartitionReader[InternalRow] {
      private val row = new UnsafeRow(p.numFields)
      private var i = -1
      override def next(): Boolean = { i += 1; i < p.rows.length }
      override def get(): InternalRow = {
        val b = p.rows(i); row.pointTo(b, b.length); row
      }
      override def close(): Unit = ()
    }
  }
}
