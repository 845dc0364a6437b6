package graft

import graft.spec._

/** Dev probe: print ours vs want for the knownDivergent entries. */
object CanonicalKnownDump {
  def main(args: Array[String]): Unit = {
    val spec = new CanonicalFormSpec
    val f = args.headOption.getOrElse("numeric.json")
    spec.load(f).foreach { case (desc, schemaJson, expected, _) =>
      if (spec.knownDivergent.contains(s"$f / $desc")) {
        val sp = Spec.parse(schemaJson)
        val ours = spec.canonForm(Spec.toJson(Canonical.canonicalize(sp)))
        val want = spec.canonForm(expected)
        println(s"--- $desc")
        println(s"  in:   ${JsonValue.render(schemaJson)}")
        println(s"  ours: ${JsonValue.render(ours)}")
        println(s"  want: ${JsonValue.render(want)}")
      }
    }
  }
}
