package graft

import graft.spec.{Spec, SpecError, Canonical, JsonValue}
import graft.spec.JsonValue._

/** Dev tool: print every outstanding canonical form divergence in full.
  * Run: sbt "Test/runMain graft.DumpDivergences negation.json"
  */
object DumpDivergences {
  def main(args: Array[String]): Unit = {
    val spec = new CanonicalFormSpec
    val files = if (args.nonEmpty) args.toVector
      else Vector("negation.json", "oneof.json", "numeric.json", "algebra.json")
    files.foreach { f =>
      println(s"===== $f =====")
      spec.load(f).foreach { case (desc, schemaJson, expected, _) =>
        val key = s"$f / $desc"
        val s = try Spec.parse(schemaJson) catch { case _: SpecError => null }
        if (s != null && !spec.knownDivergent.contains(key)) {
          val ours = spec.canonForm(Spec.toJson(Canonical.canonicalize(s)))
          val want = spec.canonForm(expected)
          if (ours != want) {
            println(s"--- $desc")
            println(s"  schema: ${JsonValue.render(schemaJson)}")
            println(s"  ours:   ${JsonValue.render(ours)}")
            println(s"  want:   ${JsonValue.render(want)}")
          }
        }
      }
    }
  }
}
