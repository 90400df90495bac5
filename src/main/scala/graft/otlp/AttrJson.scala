package graft.otlp

import com.fasterxml.jackson.databind.JsonNode
import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.{ArrayNode, JsonNodeFactory, ObjectNode}

/** Canonical JSON rendering of OTLP attribute lists and AnyValues.
  *
  * Contract (reference test/sql/read_otlp_metrics_histogram.test "Test
  * metric_attributes" golden `{"endpoint":"/health"}`): compact output (no
  * spaces), scalar AnyValues rendered as native JSON scalars
  * (string/number/bool), arrayValue → JSON array, kvlistValue → JSON object,
  * bytesValue kept as its base64 string.
  *
  * Top-level attribute keys are SORTED lexicographically: the reference's
  * own read_otap.test pins `read_otap_X(bar) EXCEPT read_otlp_X(otlp)`
  * empty in both directions, and the OTAP attribute tables arrive sorted by
  * (value-type, key) while OTLP carries input order — only a canonical key
  * order can make both paths render identical JSON text. Nested kvlist
  * values keep their own order (both transports preserve it).
  */
object AttrJson {
  private val mapper = new ObjectMapper()
  private val nf = JsonNodeFactory.instance

  /** OTLP AnyValue node ({"stringValue": ...} etc.) → plain JsonNode. */
  def anyValueToNode(v: JsonNode): JsonNode = {
    if (v == null || v.isNull || !v.isObject) return nf.nullNode()
    def f(names: String*): Option[JsonNode] =
      names.iterator.map(v.get).find(n => n != null && !n.isNull)
    f("stringValue", "string_value").map(n => nf.textNode(n.asText()))
      .orElse(f("boolValue", "bool_value").map(n => nf.booleanNode(n.asBoolean())))
      .orElse(f("intValue", "int_value").map { n =>
        val l = try n.asText().toLong
                catch { case _: NumberFormatException =>
                  throw new OtlpParseException("Parse failed") }
        nf.numberNode(l)
      })
      .orElse(f("doubleValue", "double_value").map(n => nf.numberNode(n.asDouble())))
      .orElse(f("bytesValue", "bytes_value").map(n => nf.textNode(n.asText())))
      .orElse(f("arrayValue", "array_value").map { a =>
        val arr = new ArrayNode(nf)
        val vals = a.get("values")
        if (vals != null && vals.isArray) vals.forEach(x => arr.add(anyValueToNode(x)))
        arr
      })
      .orElse(f("kvlistValue", "kvlist_value").map { kl =>
        val obj = new ObjectNode(nf)
        val vals = kl.get("values")
        if (vals != null && vals.isArray) vals.forEach { kv =>
          val k = if (kv.hasNonNull("key")) kv.get("key").asText() else ""
          obj.set[JsonNode](k, anyValueToNode(kv.get("value")))
        }
        obj
      })
      .getOrElse(nf.nullNode())
  }

  /** Attribute list [{key, value}, ...] → compact JSON object text with
    * keys sorted lexicographically (last value wins on duplicate keys).
    * Absent/empty list → "{}". */
  def attrsToJson(attrs: JsonNode): String = {
    val pairs = scala.collection.mutable.LinkedHashMap[String, JsonNode]()
    if (attrs != null && attrs.isArray) attrs.forEach { kv =>
      val k = if (kv.hasNonNull("key")) kv.get("key").asText() else ""
      pairs(k) = anyValueToNode(kv.get("value"))
    }
    sortedObject(pairs.toSeq)
  }

  /** (key, value-node) pairs → compact key-sorted JSON object text. */
  def sortedObject(pairs: Seq[(String, JsonNode)]): String = {
    val obj = new ObjectNode(nf)
    pairs.sortBy(_._1).foreach { case (k, v) => obj.set[JsonNode](k, v) }
    mapper.writeValueAsString(obj)
  }

  /** AnyValue → display string: bare string for stringValue, JSON text for
    * everything else; null for absent/empty (log body semantics). */
  def anyValueToText(v: JsonNode): String = {
    if (v == null || v.isNull || !v.isObject || v.isEmpty) return null
    val sv = if (v.hasNonNull("stringValue")) v.get("stringValue")
             else v.get("string_value")
    if (sv != null && !sv.isNull) sv.asText()
    else {
      val n = anyValueToNode(v)
      if (n.isNull) null else mapper.writeValueAsString(n)
    }
  }

  def compact(node: JsonNode): String = mapper.writeValueAsString(node)
}
