package graft.otlp

/** OTAP (OTel-Arrow `BatchArrowRecords`) decoder — reads the protobuf
  * envelope (batch_id / payloads of Arrow IPC streams per payload type) and
  * reassembles rows via arrow-java. Implemented in OtapDecoder2 phase; this
  * entry point keeps the format dispatch stable. */
object OtapDecoder {
  def parse(content: Array[Byte], nsAsLong: Boolean): OtlpJsonParser.ParsedFile =
    throw new OtlpParseException(
      "OTAP decoding not yet implemented in this build")
}
