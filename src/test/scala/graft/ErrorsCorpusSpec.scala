package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.spec._

/** The reference's canonical-suite REJECTION cases: `errors.json` plus the
  * `error`-keyed groups embedded in the other corpus files (vendored
  * verbatim from `/root/reference/crates/jsonschema/tests/canonical-suite/`,
  * driven there by `tests/canonical_suite.rs`). Each names an error kind —
  * InvalidSchemaType / ValidationError (meta-schema) / InvalidPattern /
  * ReferenceResolution — our engine funnels all four into `SpecError`
  * raised by the matching stage: root-shape check in `Spec.parse`,
  * `Meta.check`, ECMA pattern translation, or eager ref resolution in the
  * compiled build. The assertion is the reference's user-visible contract:
  * a schema the reference refuses to build MUST NOT produce a working
  * validator here either. */
class ErrorsCorpusSpec extends AnyFunSuite {

  val files = Seq("errors.json", "dependencies.json", "items.json",
    "pattern_properties.json", "references.json", "string.json")

  def load(name: String): Vector[(String, Vector[JsonValue], String)] = {
    val in = getClass.getResourceAsStream(s"/canonical-suite/$name")
    require(in != null, s"missing /canonical-suite/$name")
    val JArr(groups) = JsonValue.parse(new String(in.readAllBytes(), "UTF-8")): @unchecked
    groups.flatMap { g =>
      val go = g.asInstanceOf[JObj]
      val desc = go.get("description").collect { case JStr(s) => s }.getOrElse("")
      go.get("error").collect { case JStr(kind) =>
        val schemas = go.get("schema").map(Vector(_))
          .orElse(go.get("schemas").collect { case JArr(xs) => xs })
          .getOrElse(Vector.empty)
        (desc, schemas, kind)
      }
    }
  }

  /** Every stage a user-supplied schema passes through before validating
    * rows; returns the first SpecError, or None if a validator was built. */
  def buildRejects(schemaJson: JsonValue): Boolean =
    try {
      Meta.check(schemaJson)
      val spec = Spec.parse(schemaJson)
      // force eager compilation: ref resolution + pattern translation
      val p = Interp.prepare(spec)
      p.isValid(JsonValue.parse("""{"probe": 1}"""))
      p.isValid(JsonValue.parse("\"probe\""))
      false
    } catch {
      case _: SpecError => true
    }

  files.foreach { f =>
    val cases = load(f)
    if (cases.nonEmpty) test(s"rejection corpus: $f (${cases.size} groups)") {
      val misses = cases.flatMap { case (desc, schemas, kind) =>
        schemas.collect { case s if !buildRejects(s) => s"$desc [$kind]" }
      }
      assert(misses.isEmpty,
        s"schemas the reference rejects but we accept:\n${misses.mkString("\n")}")
    }
  }
}
