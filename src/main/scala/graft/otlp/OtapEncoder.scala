package graft.otlp

import org.apache.arrow.memory.RootAllocator
import org.apache.arrow.vector._
import org.apache.arrow.vector.complex.StructVector
import org.apache.arrow.vector.ipc.ArrowStreamWriter
import org.apache.arrow.vector.types.pojo.{ArrowType, Field, FieldType, Schema}
import org.apache.arrow.vector.types.TimeUnit

import java.io.ByteArrayOutputStream
import java.nio.channels.Channels
import java.nio.charset.StandardCharsets.UTF_8
import scala.jdk.CollectionConverters._

/** Minimal OTel-Arrow (`BatchArrowRecords`) LOGS encoder — the load
  * generator for the OTAP transport bench and the producer side of the
  * encoder↔[[OtapStreamDecoder]] round-trip pin. OTAP's performance claim
  * is dictionary/schema REUSE across stream messages (the reference ships
  * OTAP precisely as its high-throughput wire — serve.md "OTel-Arrow
  * protocol support"), so the encoder emits the two message shapes a real
  * producer session uses:
  *
  *  - an INITIAL message whose Arrow IPC slices carry (schema + batch) for
  *    each payload, and
  *  - a CONTINUATION message carrying batch-only IPC slices that decode
  *    through the reader state the initial message established — the
  *    steady-state shape whose per-message cost is one IPC batch read,
  *    no schema/dictionary work.
  *
  * Payloads per message: LOGS (type 30) with n rows + RESOURCE_ATTRS
  * (type 1) carrying service.name/host.name, joined through resource.id —
  * every message is its own id join scope, so the attrs rows ride along
  * in each message (the conforming single-batch-per-type shape the
  * decoder's segment rule documents). Columns are the name-addressed
  * subset OtapDecoder assembles; absent optional columns decode as null,
  * exactly as the reference's own minimal corpus files do. */
object OtapEncoder {

  /** The four reusable IPC slices: (logsInitial, logsContinuation,
    * attrsInitial, attrsContinuation). Build once, wrap per message with
    * [[batchMessage]]. */
  def logsRecordSlices(n: Int, service: String = "bench-service")
      : (Array[Byte], Array[Byte], Array[Byte], Array[Byte]) = {
    val alloc = new RootAllocator()
    try {
      val logs = twoBatchSlices(alloc, logsSchema) { root =>
        val ts = root.getVector("time_unix_nano").asInstanceOf[TimeStampNanoVector]
        val sevN = root.getVector("severity_number").asInstanceOf[IntVector]
        val sevT = root.getVector("severity_text").asInstanceOf[VarCharVector]
        val body = root.getVector("body").asInstanceOf[StructVector]
        val bType = body.getChild("type").asInstanceOf[IntVector]
        val bSer = body.getChild("ser").asInstanceOf[VarBinaryVector]
        val res = root.getVector("resource").asInstanceOf[StructVector]
        val resId = res.getChild("id").asInstanceOf[BigIntVector]
        val scope = root.getVector("scope").asInstanceOf[StructVector]
        val scName = scope.getChild("name").asInstanceOf[VarCharVector]
        val bodyCbor = cborText(
          "benchmark log record with a reasonably sized message body")
        var i = 0
        while (i < n) {
          ts.setSafe(i, 1640000000000000000L + i)
          sevN.setSafe(i, 9)
          sevT.setSafe(i, "INFO".getBytes(UTF_8))
          body.setIndexDefined(i)
          bType.setSafe(i, 1)
          bSer.setSafe(i, bodyCbor)
          res.setIndexDefined(i)
          resId.setSafe(i, 1L)
          scope.setIndexDefined(i)
          scName.setSafe(i, "bench-logger".getBytes(UTF_8))
          i += 1
        }
        root.setRowCount(n)
      }
      val attrs = twoBatchSlices(alloc, attrsSchema) { root =>
        val pid = root.getVector("parent_id").asInstanceOf[BigIntVector]
        val key = root.getVector("key").asInstanceOf[VarCharVector]
        val typ = root.getVector("type").asInstanceOf[IntVector]
        val str = root.getVector("str").asInstanceOf[VarCharVector]
        val kvs = Seq("service.name" -> service, "host.name" -> "bench-host")
        kvs.zipWithIndex.foreach { case ((k, v), i) =>
          pid.setSafe(i, 1L)
          key.setSafe(i, k.getBytes(UTF_8))
          typ.setSafe(i, 1)
          str.setSafe(i, v.getBytes(UTF_8))
        }
        root.setRowCount(kvs.size)
      }
      (logs._1, logs._2, attrs._1, attrs._2)
    } finally alloc.close()
  }

  /** One `BatchArrowRecords{batch_id=1, arrow_payloads=2}` envelope over
    * a LOGS slice + a RESOURCE_ATTRS slice (schema ids fixed per payload
    * type, as otel-arrow assigns them for an unchanged schema). */
  def batchMessage(batchId: Long, logsRecord: Array[Byte],
                   attrsRecord: Array[Byte]): Array[Byte] = {
    import graft.streaming.GrpcWire.Pb
    def payload(schemaId: Long, ptype: Int, record: Array[Byte]) =
      Pb.msg { o =>
        Pb.vint(o, 1, schemaId); Pb.vint(o, 2, ptype)
        Pb.lenDelim(o, 3, record)
      }
    Pb.msg { o =>
      Pb.vint(o, 1, batchId)
      Pb.lenDelim(o, 2, payload(1L, 30, logsRecord))
      Pb.lenDelim(o, 2, payload(2L, 1, attrsRecord))
    }
  }

  /** Write (schema + batch + identical batch) as one Arrow IPC stream and
    * slice it at the recorded byte offsets: prefix = self-contained
    * initial message, suffix = batch-only continuation (no EOS marker —
    * the decoder's feed treats clean EOF as "no message yet"). */
  private def twoBatchSlices(alloc: RootAllocator, schema: Schema)
                            (fill: VectorSchemaRoot => Unit)
      : (Array[Byte], Array[Byte]) = {
    val root = VectorSchemaRoot.create(schema, alloc)
    try {
      val out = new ByteArrayOutputStream()
      val writer = new ArrowStreamWriter(root, null, Channels.newChannel(out))
      writer.start()
      fill(root)
      writer.writeBatch()
      val p1 = out.size()
      writer.writeBatch()
      val p2 = out.size()
      // no writer.end(): an EOS marker would terminate the decoder's
      // long-lived stream reader
      val all = out.toByteArray
      (java.util.Arrays.copyOfRange(all, 0, p1),
        java.util.Arrays.copyOfRange(all, p1, p2))
    } finally root.close()
  }

  private def field(name: String, t: ArrowType, children: Field*): Field =
    new Field(name, FieldType.nullable(t), children.asJava)

  private def logsSchema = new Schema(Seq(
    field("time_unix_nano", new ArrowType.Timestamp(TimeUnit.NANOSECOND, null)),
    field("severity_number", new ArrowType.Int(32, true)),
    field("severity_text", ArrowType.Utf8.INSTANCE),
    field("body", ArrowType.Struct.INSTANCE,
      field("type", new ArrowType.Int(32, true)),
      field("ser", ArrowType.Binary.INSTANCE)),
    field("resource", ArrowType.Struct.INSTANCE,
      field("id", new ArrowType.Int(64, true))),
    field("scope", ArrowType.Struct.INSTANCE,
      field("name", ArrowType.Utf8.INSTANCE))).asJava)

  private def attrsSchema = new Schema(Seq(
    field("parent_id", new ArrowType.Int(64, true)),
    field("key", ArrowType.Utf8.INSTANCE),
    field("type", new ArrowType.Int(32, true)),
    field("str", ArrowType.Utf8.INSTANCE)).asJava)

  /** CBOR text string (major type 3) — the body encoding OTAP uses for
    * plain string bodies. */
  private def cborText(s: String): Array[Byte] = {
    val b = s.getBytes(UTF_8)
    require(b.length < 256, "bench body fits a 1-byte CBOR length")
    if (b.length < 24) (0x60 + b.length).toByte +: b
    else (0x78.toByte +: b.length.toByte +: b)
  }
}
