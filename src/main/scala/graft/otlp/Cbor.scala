package graft.otlp

import com.fasterxml.jackson.databind.JsonNode
import com.fasterxml.jackson.databind.node.{ArrayNode, JsonNodeFactory, ObjectNode}

/** Minimal CBOR (RFC 8949) → JsonNode decoder for the OTAP `ser` columns
  * (otel-arrow serializes complex AnyValues — maps, arrays — as CBOR).
  * Byte strings render as base64 text to match the OTLP JSON bytesValue
  * rendering, keeping OTAP↔OTLP attribute text parity. */
object Cbor {
  private val nf = JsonNodeFactory.instance

  def decode(bytes: Array[Byte]): JsonNode = {
    val r = new R(bytes)
    val v = r.item()
    v
  }

  private final class R(b: Array[Byte]) {
    var i = 0
    private def u8(): Int = { val v = b(i) & 0xff; i += 1; v }
    private def uN(n: Int): Long = {
      var out = 0L
      var k = 0
      while (k < n) { out = (out << 8) | (b(i + k) & 0xffL); k += 1 }
      i += n; out
    }
    private def argOf(ai: Int): Long = ai match {
      case x if x < 24 => x
      case 24 => uN(1)
      case 25 => uN(2)
      case 26 => uN(4)
      case 27 => uN(8)
      case 31 => -1L // indefinite
      case x  => throw new OtlpParseException(s"CBOR: bad additional info $x")
    }

    def item(): JsonNode = {
      val ib = u8()
      val mt = ib >> 5
      val ai = ib & 0x1f
      mt match {
        case 0 => nf.numberNode(argOf(ai))
        case 1 => nf.numberNode(-1L - argOf(ai))
        case 2 => // byte string → base64 (OTLP JSON bytesValue rendering)
          val len = argOf(ai).toInt
          val s = java.util.Arrays.copyOfRange(b, i, i + len); i += len
          nf.textNode(java.util.Base64.getEncoder.encodeToString(s))
        case 3 =>
          val len = argOf(ai).toInt
          val s = new String(b, i, len, java.nio.charset.StandardCharsets.UTF_8)
          i += len; nf.textNode(s)
        case 4 =>
          val len = argOf(ai)
          val arr = new ArrayNode(nf)
          if (len < 0) { while ((b(i) & 0xff) != 0xff) arr.add(item()); i += 1 }
          else (0L until len).foreach(_ => arr.add(item()))
          arr
        case 5 =>
          val len = argOf(ai)
          val obj = new ObjectNode(nf)
          def put(): Unit = {
            val k = item()
            val v = item()
            obj.set[JsonNode](if (k.isTextual) k.asText() else k.toString, v)
          }
          if (len < 0) { while ((b(i) & 0xff) != 0xff) put(); i += 1 }
          else (0L until len).foreach(_ => put())
          obj
        case 7 => ai match {
          case 20 => nf.booleanNode(false)
          case 21 => nf.booleanNode(true)
          case 22 | 23 => nf.nullNode()
          case 25 => // half float
            val h = uN(2).toInt
            val sign = (h >> 15) & 1; val exp = (h >> 10) & 0x1f; val frac = h & 0x3ff
            val mag =
              if (exp == 0) frac / 1024.0 * math.pow(2, -14)
              else if (exp == 31) { if (frac == 0) Double.PositiveInfinity else Double.NaN }
              else (1 + frac / 1024.0) * math.pow(2, exp - 15)
            nf.numberNode(if (sign == 1) -mag else mag)
          case 26 => nf.numberNode(
            java.lang.Float.intBitsToFloat(uN(4).toInt).toDouble)
          case 27 => nf.numberNode(java.lang.Double.longBitsToDouble(uN(8)))
          case x => throw new OtlpParseException(s"CBOR: simple value $x unsupported")
        }
        case x => throw new OtlpParseException(s"CBOR: major type $x unsupported")
      }
    }
  }
}
