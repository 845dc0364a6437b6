package graft
object R5Probe {
  def main(args: Array[String]): Unit = {
    import graft.spec._
    val s = Spec.parseJson("""{"allOf":[{"type":"object","properties":{"a":{"type":"integer","maximum":5}}}],"type":"object","properties":{"a":{"type":"integer","minimum":2}}}""")
    println(JsonValue.render(Spec.toJson(Canonical.canonicalize(s))))
  }
}
