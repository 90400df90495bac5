package graft.otlp

import scala.collection.mutable.ArrayBuffer

/** Test-only BatchArrowRecords surgery: split a .bar file into its
  * ArrowPayload triples and rebuild a file from (possibly relabeled,
  * reordered) triples — the tool for hand-crafting segment-rule fixtures
  * that no conforming encoder will produce (OtapReaderSpec). */
object OtapTestProto {

  /** (schema_id field bytes verbatim?, no —) returns (schemaIdString,
    * payloadType, recordBytes) for every ArrowPayload in the message.
    * String schema ids only (otel-arrow v1 fixtures use strings). */
  def parsePayloads(content: Array[Byte]): Seq[(String, Int, Array[Byte])] = {
    val out = ArrayBuffer[(String, Int, Array[Byte])]()
    var i = 0
    def varint(): Long = {
      var shift = 0; var v = 0L
      while (shift < 64) {
        val b = content(i); i += 1
        v |= (b & 0x7fL) << shift
        if ((b & 0x80) == 0) return v
        shift += 7
      }
      sys.error("varint too long")
    }
    while (i < content.length) {
      val tag = varint()
      val (field, wire) = ((tag >>> 3).toInt, (tag & 7).toInt)
      wire match {
        case 0 => varint()
        case 1 => i += 8
        case 5 => i += 4
        case 2 =>
          val len = varint().toInt
          val sub = java.util.Arrays.copyOfRange(content, i, i + len)
          i += len
          if (field == 2) {
            var j = 0
            var sid = ""
            var ptype = 0
            var rec: Array[Byte] = null
            def pv(): Long = {
              var shift = 0; var v = 0L
              while (true) {
                val b = sub(j); j += 1
                v |= (b & 0x7fL) << shift
                if ((b & 0x80) == 0) return v
                shift += 7
              }
              v
            }
            while (j < sub.length) {
              val t = pv()
              val (f2, w2) = ((t >>> 3).toInt, (t & 7).toInt)
              w2 match {
                case 0 =>
                  val v = pv(); if (f2 == 2) ptype = v.toInt
                case 2 =>
                  val l2 = pv().toInt
                  val s2 = java.util.Arrays.copyOfRange(sub, j, j + l2); j += l2
                  if (f2 == 3) rec = s2
                  else if (f2 == 1) sid = new String(s2, "UTF-8")
                case 1 => j += 8
                case 5 => j += 4
                case w => sys.error(s"bad wire type $w")
              }
            }
            if (rec != null) out += ((sid, ptype, rec))
          }
        case w => sys.error(s"bad wire type $w")
      }
    }
    out.toSeq
  }

  /** Encode triples back into one BatchArrowRecords message. */
  def buildMessage(payloads: Seq[(String, Int, Array[Byte])]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def wv(v0: Long): Unit = {
      var v = v0
      while ((v & ~0x7fL) != 0) { out.write(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
      out.write(v.toInt)
    }
    def bytesField(field: Int, b: Array[Byte]): Unit = {
      wv((field << 3) | 2); wv(b.length.toLong); out.write(b)
    }
    payloads.foreach { case (sid, ptype, rec) =>
      val p = new java.io.ByteArrayOutputStream()
      def pwv(v0: Long): Unit = {
        var v = v0
        while ((v & ~0x7fL) != 0) { p.write(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
        p.write(v.toInt)
      }
      val sidB = sid.getBytes("UTF-8")
      pwv((1 << 3) | 2); pwv(sidB.length.toLong); p.write(sidB)
      pwv((2 << 3) | 0); pwv(ptype.toLong)
      pwv((3 << 3) | 2); pwv(rec.length.toLong); p.write(rec)
      bytesField(2, p.toByteArray)
    }
    out.toByteArray
  }
}
