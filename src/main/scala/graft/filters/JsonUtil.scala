package graft.filters

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.json.JsonMapper
import com.fasterxml.jackson.databind.node.{ArrayNode, DoubleNode, ObjectNode, NullNode}
import com.fasterxml.jackson.core.json.JsonReadFeature

/** JSON parse/serialize with the reference's NaN policy: parse accepts
  * NaN/Infinity literals; serialization emits them as `null`
  * (simplejson `ignore_nan=True` — `/root/reference/src/aerovaldb/
  * utils/json.py:11-18`). */
object JsonUtil {
  val mapper: ObjectMapper = JsonMapper.builder()
    .enable(JsonReadFeature.ALLOW_NON_NUMERIC_NUMBERS)
    .build()

  def parse(json: String): JsonNode = mapper.readTree(json)

  /** Replace non-finite numbers with null, recursively (in a copy). */
  def nanToNull(node: JsonNode): JsonNode = node match {
    case d: DoubleNode if d.doubleValue.isNaN || d.doubleValue.isInfinite =>
      NullNode.getInstance
    case o: ObjectNode =>
      val copy = o.objectNode()
      o.properties().forEach(e => copy.set[JsonNode](e.getKey, nanToNull(e.getValue)))
      copy
    case a: ArrayNode =>
      val copy = a.arrayNode()
      a.forEach(e => copy.add(nanToNull(e)))
      copy
    case other => other
  }

  def serialize(node: JsonNode): String = mapper.writeValueAsString(nanToNull(node))

  /** Parse-and-reserialize a JSON string applying the NaN policy. */
  def normalize(json: String): String = serialize(parse(json))
}
