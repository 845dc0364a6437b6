package graft
object R5Probe {
  def main(args: Array[String]): Unit = {
    import graft.spec._
    val sj = JsonValue.parse("""{"$ref": "#/definitions/value", "definitions": {"value": {"type": "string", "minLength": 2}}}""")
    val spec = Spec.parse(sj)
    println("orig isValid ab: " + Interp.isValid(spec, JsonValue.parse("\"ab\"")))
    val canon = Canonical.canonicalize(spec)
    println("canon: " + JsonValue.render(Spec.toJson(canon)))
    println("canon isValid ab: " + Interp.isValid(canon, JsonValue.parse("\"ab\"")))
  }
}
