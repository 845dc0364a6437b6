package graft.spec

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import scala.jdk.CollectionConverters._

/** Minimal JSON value model for constraint specs and test instances.
  *
  * Mirrors the reference's instance model
  * (`/root/reference/crates/jsonschema-value/src/lib.rs:39-62`): seven JSON
  * types, math equality for numbers (`cmp.rs:48` equal_numbers), deep
  * array/object equality (`cmp.rs:128/143`), and the key semantic that an
  * integral float (`1.0`) counts as an integer (`types.rs:192-204`).
  */
sealed trait JsonValue {
  def jsonType: JsonType = this match {
    case JNull       => JsonType.Null
    case _: JBool    => JsonType.Boolean
    case n: JNum     => if (n.isIntegral) JsonType.Integer else JsonType.Number
    case _: JStr     => JsonType.String
    case _: JArr     => JsonType.Array
    case _: JObj     => JsonType.Object
  }
}
case object JNull extends JsonValue
final case class JBool(value: Boolean) extends JsonValue
/** All numbers as BigDecimal: exact cross-representation comparison. */
final case class JNum(value: BigDecimal) extends JsonValue {
  @transient lazy val isIntegral: Boolean =
    value.scale <= 0 || value.remainder(BigDecimal(1)).compareTo(BigDecimal(0)) == 0
}
final case class JStr(value: String) extends JsonValue
final case class JArr(items: Vector[JsonValue]) extends JsonValue
final case class JObj(fields: Vector[(String, JsonValue)]) extends JsonValue {
  lazy val toMap: Map[String, JsonValue] = fields.toMap
  // building the hash map costs more than scanning for the small objects
  // that dominate real documents (validator hot path: one fresh JObj per
  // node per row)
  def get(key: String): Option[JsonValue] = {
    if (fields.length <= 8) {
      var i = 0
      while (i < fields.length) {
        if (fields(i)._1 == key) return Some(fields(i)._2)
        i += 1
      }
      None
    } else toMap.get(key)
  }
  def has(key: String): Boolean = {
    if (fields.length <= 8) {
      var i = 0
      while (i < fields.length) {
        if (fields(i)._1 == key) return true
        i += 1
      }
      false
    } else toMap.contains(key)
  }
}

/** The seven JSON types (`jsonschema-value/src/types.rs:19-27`). */
sealed abstract class JsonType(val name: String)
object JsonType {
  case object Null    extends JsonType("null")
  case object Boolean extends JsonType("boolean")
  case object Integer extends JsonType("integer")
  case object Number  extends JsonType("number")
  case object String  extends JsonType("string")
  case object Array   extends JsonType("array")
  case object Object  extends JsonType("object")
  val all: Seq[JsonType] = Seq(Null, Boolean, Integer, Number, String, Array, Object)
  def fromName(s: String): Option[JsonType] = all.find(_.name == s)
}

object JsonValue {
  private val mapper = new ObjectMapper()

  /** Streaming parse (no intermediate JsonNode tree): the contentSchema
    * kernel parses one document per ROW, and the readTree+convert form was
    * ~40% of its per-row cost. Same laxity as readTree (one value read;
    * trailing tokens ignored) so verdicts are unchanged. */
  def parse(text: String): JsonValue = {
    val p = mapper.getFactory.createParser(text)
    try {
      val t = p.nextToken()
      if (t == null) throw new java.io.IOException("empty JSON input")
      readValue(p)
    } finally p.close()
  }

  private def readValue(p: com.fasterxml.jackson.core.JsonParser): JsonValue = {
    import com.fasterxml.jackson.core.JsonToken._
    p.currentToken() match {
      case START_OBJECT =>
        val b = Vector.newBuilder[(String, JsonValue)]
        while (p.nextToken() != END_OBJECT) {
          val k = p.currentName()
          p.nextToken()
          b += k -> readValue(p)
        }
        JObj(b.result())
      case START_ARRAY =>
        val b = Vector.newBuilder[JsonValue]
        while (p.nextToken() != END_ARRAY) b += readValue(p)
        JArr(b.result())
      case VALUE_STRING => JStr(p.getText)
      case VALUE_NUMBER_INT | VALUE_NUMBER_FLOAT => JNum(BigDecimal(p.getDecimalValue))
      case VALUE_TRUE => JBool(true)
      case VALUE_FALSE => JBool(false)
      case VALUE_NULL => JNull
      case other => throw new java.io.IOException(s"unexpected JSON token: $other")
    }
  }

  def fromNode(n: JsonNode): JsonValue = {
    if (n == null || n.isNull) JNull
    else if (n.isBoolean) JBool(n.booleanValue())
    else if (n.isNumber) JNum(BigDecimal(n.decimalValue()))
    else if (n.isTextual) JStr(n.textValue())
    else if (n.isArray) JArr(n.elements().asScala.map(fromNode).toVector)
    else if (n.isObject)
      JObj(n.properties().asScala.map(e => e.getKey -> fromNode(e.getValue)).toVector)
    else sys.error(s"unsupported JSON node: $n")
  }

  /** JSON-Schema equality: math equality for numbers, deep for containers
    * (`jsonschema-value/src/cmp.rs:114-157`). */
  def equal(a: JsonValue, b: JsonValue): Boolean = (a, b) match {
    case (JNull, JNull)         => true
    case (JBool(x), JBool(y))   => x == y
    case (JNum(x), JNum(y))     => x.compareTo(y) == 0
    case (JStr(x), JStr(y))     => x == y
    case (JArr(x), JArr(y))     =>
      x.length == y.length && x.iterator.zip(y.iterator).forall { case (p, q) => equal(p, q) }
    case (JObj(x), JObj(y))     =>
      x.length == y.length && {
        val ym = y.toMap
        x.forall { case (k, v) => ym.get(k).exists(equal(v, _)) }
      }
    case _ => false
  }

  /** Render as compact JSON text (stable field order = input order). */
  def render(v: JsonValue): String = v match {
    case JNull    => "null"
    case JBool(b) => b.toString
    case JNum(n)  =>
      if (n.isWhole && n.abs < BigDecimal("9223372036854775807")) n.toBigInt.toString
      else n.bigDecimal.toPlainString
    case JStr(s)  => quote(s)
    case JArr(xs) => xs.map(render).mkString("[", ",", "]")
    case JObj(fs) => fs.map { case (k, x) => quote(k) + ":" + render(x) }.mkString("{", ",", "}")
  }

  def quote(s: String): String = {
    val sb = new StringBuilder("\"")
    s.foreach {
      case '"'  => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.append('"').toString
  }
}
