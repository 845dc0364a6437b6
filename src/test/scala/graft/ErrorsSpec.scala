package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.spec._

/** Error enumeration (Interp.errors — the single-document iter_errors
  * analog): keyword-level messages with instance + schema paths. */
class ErrorsSpec extends AnyFunSuite {

  private def errs(schema: String, instance: String): Vector[Interp.VError] =
    Interp.errors(Interp.prepare(Spec.parseJson(schema)), JsonValue.parse(instance))

  test("valid instances produce no errors") {
    assert(errs("""{"type":"integer","minimum":3}""", "5").isEmpty)
  }

  test("scalar keyword errors carry paths and values") {
    val e = errs("""{"type":"integer","minimum":3,"multipleOf":2}""", "1")
    assert(e.map(_.schemaPath).toSet == Set("#/minimum", "#/multipleOf"))
    assert(e.exists(_.message.contains("less than the minimum of 3")))
  }

  test("nested property errors: instance path tracks the field") {
    val e = errs(
      """{"properties":{"a":{"properties":{"b":{"type":"string"}},
          "required":["b"]}}}""",
      """{"a":{"b":5}}""")
    assert(e.length == 1)
    assert(e.head.instancePath == "/a/b")
    assert(e.head.schemaPath == "#/properties/a/properties/b/type")
  }

  test("array items, additionalProperties:false and required") {
    val e1 = errs("""{"items":{"type":"integer"}}""", """[1,"x",3,"y"]""")
    assert(e1.map(_.instancePath) == Vector("/1", "/3"))
    // one aggregated error at the object, the reference's template
    val e2 = errs("""{"properties":{"a":{}},"additionalProperties":false}""",
      """{"a":1,"zz":2}""")
    assert(e2.length == 1 && e2.head.instancePath == "" &&
      e2.head.message == "Additional properties are not allowed ('zz' was unexpected)")
    val e2b = errs("""{"additionalProperties":false}""", """{"x":1,"y":2}""")
    assert(e2b.head.message == "Additional properties are not allowed ('x', 'y' were unexpected)")
    val e3 = errs("""{"required":["k"]}""", "{}")
    assert(e3.head.message == "\"k\" is a required property")
  }

  test("combinators: anyOf/oneOf summaries, allOf recursion, not") {
    val any = errs("""{"anyOf":[{"type":"string"},{"minimum":10}]}""", "3")
    assert(any.exists(_.schemaPath == "#/anyOf"))
    val one = errs("""{"oneOf":[{"type":"integer"},{"minimum":0}]}""", "3")
    assert(one.exists(_.message ==
      "3 is valid under more than one of the schemas listed in the 'oneOf' keyword"))
    val all = errs("""{"allOf":[{"minimum":5},{"maximum":1}]}""", "3")
    assert(all.map(_.schemaPath).toSet == Set("#/allOf/0/minimum", "#/allOf/1/maximum"))
    val nt = errs("""{"not":{"type":"integer"}}""", "3")
    assert(nt.head.schemaPath == "#/not")
  }

  test("$ref failures recurse through the ref with the ref'd schema path") {
    val e = errs(
      """{"$defs":{"pos":{"minimum":0}},"properties":{"x":{"$ref":"#/$defs/pos"}}}""",
      """{"x":-3}""")
    assert(e.length == 1)
    assert(e.head.instancePath == "/x")
    assert(e.head.schemaPath.startsWith("#/properties/x/$ref"))
    assert(e.head.message.contains("less than the minimum of 0"))
  }

  test("masked errors redact instance data but keep paths (error.rs masked analog)") {
    val p = Interp.prepare(Spec.parseJson(
      """{"properties":{"ssn":{"maximum":100}},"additionalProperties":false}"""))
    val doc = JsonValue.parse("""{"ssn": 999, "secret-key": 1}""")
    val open = Interp.errors(p, doc)
    val masked = Interp.errors(p, doc, 100, masked = true)
    assert(open.exists(_.message.contains("999")))
    assert(open.exists(_.message.contains("'secret-key'")))
    assert(!masked.exists(_.message.contains("999")))
    assert(!masked.exists(_.message.contains("secret-key")))
    // same failures at the same paths, only the rendering differs
    assert(open.map(e => (e.instancePath, e.schemaPath)) ==
      masked.map(e => (e.instancePath, e.schemaPath)))
  }

  test("every invalid official-suite case yields at least one error; valid cases none") {
    var checked = 0
    for (f <- Seq("object.json", "array.json", "combinators.json", "numeric.json",
      "string.json", "conditional.json", "ref.json", "unevaluated.json")) {
      SuiteHarness.loadResource(f).foreach { c =>
        val spec = try Spec.parse(c.schema) catch { case _: SpecError => null }
        if (spec != null) {
          val p = Interp.prepare(spec)
          val verdict = try Some(p.isValid(c.data)) catch { case _: SpecError => None }
          verdict.foreach { ok =>
            val e = Interp.errors(p, c.data)
            assert(e.isEmpty == ok, s"$f/${c.group}/${c.description}: valid=$ok errors=${e.take(3)}")
            checked += 1
          }
        }
      }
    }
    info(s"checked $checked suite cases")
    assert(checked > 150)
  }
}
