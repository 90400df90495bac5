package graft

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path}

/** Minimal protobuf wire writer (test-only) + parity tests: a .pb encoding
  * of the same records as the JSON fixtures must produce identical rows
  * (the reference pins OTLP-pb ↔ OTLP-json equivalence through its
  * read_otlp_protobuf.test goldens). */
object ProtoW {
  final class Msg {
    val out = new ByteArrayOutputStream()
    def varint(v: Long): Msg = {
      var x = v
      while ((x & ~0x7fL) != 0) { out.write(((x & 0x7f) | 0x80).toInt); x >>>= 7 }
      out.write(x.toInt); this
    }
    def tag(field: Int, wire: Int): Msg = varint((field.toLong << 3) | wire)
    def vint(field: Int, v: Long): Msg = { tag(field, 0); varint(v) }
    def fixed64(field: Int, v: Long): Msg = {
      tag(field, 1)
      var i = 0; while (i < 8) { out.write(((v >>> (8 * i)) & 0xff).toInt); i += 1 }
      this
    }
    def double(field: Int, v: Double): Msg =
      fixed64(field, java.lang.Double.doubleToLongBits(v))
    def fixed32(field: Int, v: Int): Msg = {
      tag(field, 5)
      var i = 0; while (i < 4) { out.write((v >>> (8 * i)) & 0xff); i += 1 }
      this
    }
    def bytes(field: Int, b: Array[Byte]): Msg = {
      tag(field, 2); varint(b.length); out.write(b); this
    }
    def string(field: Int, s: String): Msg =
      bytes(field, s.getBytes(StandardCharsets.UTF_8))
    def msg(field: Int, m: Msg): Msg = bytes(field, m.out.toByteArray)
    def toBytes: Array[Byte] = out.toByteArray
  }
  def m(): Msg = new Msg

  def hexBytes(hex: String): Array[Byte] =
    hex.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  def strAttr(key: String, v: String): Msg =
    m().string(1, key).msg(2, m().string(1, v))
  def intAttr(key: String, v: Long): Msg =
    m().string(1, key).msg(2, m().vint(3, v))

  def resource(attrs: Msg*): Msg = {
    val r = m(); attrs.foreach(a => r.msg(1, a)); r
  }
  def scope(name: String): Msg = m().string(1, name)
}

class OtlpProtoSpec extends SparkTestBase {
  import ProtoW._

  private val fx = "src/test/resources/otlp"

  private def write(bytes: Array[Byte]): Path = {
    val p = Files.createTempFile("otlp_test", ".pb")
    Files.write(p, bytes); p
  }

  /** logs_simple.jsonl rows 1-3 re-encoded as ExportLogsServiceRequest. */
  private def logsPb: Array[Byte] = {
    val res = resource(strAttr("service.name", "test-service"),
      strAttr("host.name", "test-host"))
    def rl(lr: Msg): Msg =
      m().msg(1, res).msg(2, m().msg(1, scope("test-logger")).msg(2, lr))
    val r1 = m().fixed64(1, 1640000000000000000L).vint(2, 9)
      .string(3, "INFO").msg(5, m().string(1, "Application started"))
      .msg(6, strAttr("event.name", "startup"))
      .bytes(9, hexBytes("5B8EFFF798038103D269B633813FC60C".toLowerCase))
      .bytes(10, hexBytes("EEE19B7EC3C1B174".toLowerCase))
    val r2 = m().fixed64(1, 1640000010000000000L).vint(2, 13)
      .string(3, "WARN").msg(5, m().string(1, "High memory usage detected"))
      .msg(6, intAttr("memory.used_percent", 85))
    val r3 = m().fixed64(1, 1640000020000000000L).vint(2, 17)
      .string(3, "ERROR").msg(5, m().string(1, "Database connection failed"))
      .msg(6, strAttr("db.system", "postgresql"))
      .msg(6, strAttr("error.type", "ConnectionError"))
      .bytes(9, hexBytes("5B8EFFF798038103D269B633813FC60C".toLowerCase))
      .bytes(10, hexBytes("EEE19B7EC3C1B175".toLowerCase))
    m().msg(1, rl(r1)).msg(1, rl(r2)).msg(1, rl(r3)).toBytes
  }

  test("protobuf logs ≡ JSON logs (EXCEPT both ways empty)") {
    val p = write(logsPb)
    try {
      val pb = Otlp.readLogs(spark, p.toString)
      val js = Otlp.readLogs(spark, s"$fx/logs_simple.jsonl")
      assert(pb.count() == 3)
      assert(pb.exceptAll(js).count() == 0, "pb minus json not empty")
      assert(js.exceptAll(pb).count() == 0, "json minus pb not empty")
    } finally Files.delete(p)
  }

  test("protobuf traces: span fields, status, packed metrics arrays") {
    val span = m()
      .bytes(1, hexBytes("5b8efff798038103d269b633813fc60c"))
      .bytes(2, hexBytes("eee19b7ec3c1b174"))
      .bytes(4, hexBytes("eee19b7ec3c1b173"))
      .string(5, "GET /users").vint(6, 2)
      .fixed64(7, 1640000000000000000L).fixed64(8, 1640000000100000000L)
      .msg(9, strAttr("http.method", "GET"))
      .msg(15, m().string(2, "ok-ish").vint(3, 1))
    val req = m().msg(1,
      m().msg(1, resource(strAttr("service.name", "svc")))
        .msg(2, m().msg(1, scope("tracer")).msg(2, span))).toBytes
    val p = write(req)
    try {
      val df = Otlp.readTraces(spark, p.toString)
      val r = df.first()
      assert(df.count() == 1)
      assert(r.getAs[String]("trace_id") == "5b8efff798038103d269b633813fc60c")
      assert(r.getAs[String]("parent_span_id") == "eee19b7ec3c1b173")
      assert(r.getAs[Long]("duration_time_unix_nano") == 100000000L)
      assert(r.getAs[Int]("kind") == 2)
      assert(r.getAs[Int]("status_code") == 1)
      assert(r.getAs[String]("status_status_message") == "ok-ish")
      assert(r.getAs[String]("service_name") == "svc")
      assert(r.getAs[String]("span_attributes") == """{"http.method":"GET"}""")
    } finally Files.delete(p)
  }

  test("protobuf histogram: packed bucket_counts/explicit_bounds + temporality") {
    // packed fixed64 bucket counts [5,10,15] and packed doubles [1.5, 2.5]
    val packedCounts = {
      val b = new ByteArrayOutputStream()
      Seq(5L, 10L, 15L).foreach { v =>
        var i = 0; while (i < 8) { b.write(((v >>> (8 * i)) & 0xff).toInt); i += 1 }
      }
      b.toByteArray
    }
    val packedBounds = {
      val b = new ByteArrayOutputStream()
      Seq(1.5, 2.5).map(java.lang.Double.doubleToLongBits).foreach { v =>
        var i = 0; while (i < 8) { b.write(((v >>> (8 * i)) & 0xff).toInt); i += 1 }
      }
      b.toByteArray
    }
    val dp = m().fixed64(3, 1640000070000000000L).fixed64(4, 30L)
      .double(5, 99.5).bytes(6, packedCounts).bytes(7, packedBounds)
      .msg(9, strAttr("endpoint", "/health")).double(11, 0.5).double(12, 9.5)
    val hist = m().msg(1, dp).vint(2, 2)
    val metric = m().string(1, "latency.hist").string(3, "ms").msg(9, hist)
    val req = m().msg(1,
      m().msg(1, resource(strAttr("service.name", "svc")))
        .msg(2, m().msg(1, scope("meter")).msg(2, metric))).toBytes
    val p = write(req)
    try {
      val r = Otlp.readMetricsHistogram(spark, p.toString).first()
      assert(r.getAs[Long]("count") == 30L)
      assert(r.getAs[Double]("sum") == 99.5)
      assert(r.getSeq[Long](r.fieldIndex("bucket_counts")).toSeq == Seq(5L, 10L, 15L))
      assert(r.getSeq[Double](r.fieldIndex("explicit_bounds")).toSeq == Seq(1.5, 2.5))
      assert(r.getAs[Double]("min") == 0.5)
      assert(r.getAs[Double]("max") == 9.5)
      assert(r.getAs[Int]("aggregation_temporality") == 2)
      assert(r.getAs[String]("metric_attributes") == """{"endpoint":"/health"}""")
    } finally Files.delete(p)
  }

  test("protobuf exp histogram: zigzag scale/offset, varint buckets") {
    val pos = m().vint(1, 4 /* zigzag(2) */).bytes(2, {
      val b = m(); Seq(3L, 4L).foreach(b.varint); b.toBytes
    })
    val neg = m().vint(1, 1 /* zigzag(-1) */).msg(2, m())
    val dp = m().fixed64(3, 1640000080000000000L).fixed64(4, 7L)
      .vint(6, 6 /* zigzag(3) */).fixed64(7, 1L).msg(8, pos).msg(9, neg)
    val eh = m().msg(1, dp).vint(2, 1)
    val metric = m().string(1, "latency.exp").msg(10, eh)
    val req = m().msg(1, m().msg(2, m().msg(2, metric))).toBytes
    val p = write(req)
    try {
      val r = Otlp.readMetricsExpHistogram(spark, p.toString).first()
      assert(r.getAs[Int]("scale") == 3)
      assert(r.getAs[Int]("positive_offset") == 2)
      assert(r.getSeq[Long](r.fieldIndex("positive_bucket_counts")).toSeq == Seq(3L, 4L))
      assert(r.getAs[Int]("negative_offset") == -1)
      assert(r.getAs[Long]("zero_count") == 1L)
      assert(r.getAs[Int]("aggregation_temporality") == 1)
    } finally Files.delete(p)
  }

  test("reference-generated .pb fixtures decode (read_otlp_protobuf.test)") {
    val refData = "/root/reference/test/data"
    assume(new java.io.File(refData).isDirectory)
    val traces = Otlp.readTraces(spark, s"$refData/otlp_traces.pb")
    assert(traces.count() == 1)
    val t = traces.first()
    assert(t.getAs[String]("trace_id").nonEmpty)
    assert(t.getAs[String]("span_id").nonEmpty)
    assert(Seq("test-service", "trace-service").contains(t.getAs[String]("service_name")))
    assert(!t.isNullAt(t.fieldIndex("start_time_unix_nano")))
    assert(Otlp.readLogs(spark, s"$refData/otlp_logs.pb").count() >= 1)
    val gauges = Otlp.readMetricsGauge(spark, s"$refData/otlp_metrics.pb").count()
    val sums = Otlp.readMetricsSum(spark, s"$refData/otlp_metrics.pb").count()
    assert(gauges + sums >= 1)
  }

  test("auto-detect: proto whose length byte is 0x7b ('{') still decodes") {
    // craft a request whose first resourceLogs submessage is exactly 123
    // bytes: after skipping the 0x0A tag as whitespace, the sniffer sees
    // '{' — the JSON attempt must fail over to the wire decoder
    val res = resource(strAttr("service.name", "svc-padded-to-length-x"))
    var rl = m().msg(1, res).msg(2, m().msg(1, scope("padscope"))
      .msg(2, m().fixed64(1, 1640000000000000000L).vint(2, 9)
        .msg(5, m().string(1, "x"))))
    var bytes = rl.toBytes
    // pad the scope name until the submessage is exactly 123 bytes
    var pad = 0
    while (bytes.length != 123 && pad < 200) {
      pad += 1
      rl = m().msg(1, res).msg(2, m().msg(1, scope("padscope" + "x" * pad))
        .msg(2, m().fixed64(1, 1640000000000000000L).vint(2, 9)
          .msg(5, m().string(1, "x"))))
      bytes = rl.toBytes
    }
    assert(bytes.length == 123, s"could not pad to 123 (got ${bytes.length})")
    val req = m().msg(1, rl).toBytes
    assert(req(0) == 0x0a && req(1) == 0x7b, "fixture must hit the ambiguity")
    val p = write(req)
    try {
      assert(Otlp.readLogs(spark, p.toString).count() == 1)
      // explicit format overrides also work
      assert(Otlp.readLogs(spark, p.toString, Map("format" -> "protobuf")).count() == 1)
      intercept[Exception] {
        Otlp.readLogs(spark, p.toString, Map("format" -> "json")).count()
      }
    } finally Files.delete(p)
  }

  test("protobuf gauge + sum from one request") {
    val gdp = m().fixed64(3, 1640000065000000000L).double(4, 0.75)
    val sdp = m().fixed64(3, 1640000060000000000L).fixed64(6, -7L)
    val gauge = m().string(1, "cpu").msg(5, m().msg(1, gdp))
    val sumM = m().string(1, "orders").msg(7, m().msg(1, sdp).vint(2, 1).vint(3, 0))
    val req = m().msg(1, m().msg(2, m().msg(2, gauge).msg(2, sumM))).toBytes
    val p = write(req)
    try {
      val g = Otlp.readMetricsGauge(spark, p.toString).first()
      assert(g.getAs[Double]("double_value") == 0.75)
      val s = Otlp.readMetricsSum(spark, p.toString).first()
      assert(s.getAs[Long]("int_value") == -7L)
      assert(s.getAs[Int]("aggregation_temporality") == 1)
      assert(!s.getAs[Boolean]("is_monotonic"))
    } finally Files.delete(p)
  }
}
