package graft.otlp

import com.fasterxml.jackson.databind.JsonNode
import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.{ArrayNode, JsonNodeFactory, ObjectNode}

/** Canonical JSON rendering of OTLP attribute lists and AnyValues.
  *
  * Contract (reference test/sql/read_otlp_metrics_histogram.test "Test
  * metric_attributes" golden `{"endpoint":"/health"}`; SURVEY.md §7.3 #4):
  * compact output (no spaces), keys in input order, scalar AnyValues rendered
  * as native JSON scalars (string/number/bool), arrayValue → JSON array,
  * kvlistValue → JSON object, bytesValue kept as its base64 string.
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
      .orElse(f("intValue", "int_value").map(n => nf.numberNode(n.asText().toLong)))
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

  /** Attribute list [{key, value}, ...] → compact JSON object text in input
    * order. Absent/empty list → "{}". */
  def attrsToJson(attrs: JsonNode): String = {
    val obj = new ObjectNode(nf)
    if (attrs != null && attrs.isArray) attrs.forEach { kv =>
      val k = if (kv.hasNonNull("key")) kv.get("key").asText() else ""
      obj.set[JsonNode](k, anyValueToNode(kv.get("value")))
    }
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
