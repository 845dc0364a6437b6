package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.spec._

/** Differential tests for the closure-compiled validator (Compiled.scala):
  * over every vendored official-suite case, the compiled verdict must
  * equal the tree-walk verdict AND the expected verdict whenever the
  * compiled path engages. Dynamic-ref / unevaluated* schemas must fall
  * back (compile → None). */
class CompiledSpec extends AnyFunSuite {

  val files = Seq("anchor.json", "array.json", "combinators.json", "conditional.json",
    "content.json", "content_assert.json", "dynamicref.json", "ecmascript_regex.json",
    "enum_const.json", "format.json", "numeric.json", "object.json", "recursiveref.json",
    "ref.json", "ref_advanced.json", "string.json", "type.json", "unevaluated.json")

  /** Files whose expected verdicts depend on format/content ASSERTION —
    * the engine asserts those; the naive interpreter (and therefore the
    * compiled form, its mirror) is annotation-only there, so only the
    * differential property applies. */
  val annotationOnly = Set("format.json", "content.json", "content_assert.json")

  test("official-suite differential: compiled == tree-walk (== expected where interp asserts)") {
    var compiledCases = 0; var fallbackCases = 0
    val failures = scala.collection.mutable.Buffer[String]()
    files.foreach { f =>
      SuiteHarness.loadResource(f).foreach { c =>
        val spec = try Spec.parse(c.schema) catch { case _: SpecError => null }
        if (spec != null) {
          val prepared = Interp.prepare(spec)
          val interp = try Some(prepared.isValidInterp(c.data)) catch { case _: SpecError => None }
          interp.foreach { tw =>
            Compiled.compile(prepared.registry, prepared.entry) match {
              case Some(fastC) =>
                compiledCases += 1
                val fv = fastC(c.data)
                if (fv != tw || (tw != c.valid && !annotationOnly(f)))
                  failures += s"$f / ${c.group} / ${c.description}: compiled=$fv interp=$tw want=${c.valid}"
              case None => fallbackCases += 1
            }
          }
        }
      }
    }
    info(s"compiled-path cases: $compiledCases, tree-walk fallbacks: $fallbackCases")
    assert(failures.isEmpty, failures.take(10).mkString("\n"))
    assert(compiledCases > 200) // the fast path must cover the bulk of the corpus
  }

  test("unevaluated* and dynamic-scope refs compile; verdicts match the tree-walk") {
    for (json <- Seq(
      """{"$dynamicRef": "#x", "$defs": {"a": {"$dynamicAnchor": "x", "type": "integer"}}}""",
      """{"$recursiveRef": "#", "$recursiveAnchor": true, "type": ["object", "integer"],
          "additionalProperties": {"$recursiveRef": "#"}}""",
      """{"unevaluatedProperties": false}""",
      """{"properties": {"a": {"unevaluatedItems": false}}}""")) {
      val p = Interp.prepare(Spec.parseJson(json))
      val c = Compiled.compile(p.registry, p.entry)
      assert(c.nonEmpty, json)
      for (inst <- Seq("5", """"s"""", """{"a": [1]}""", """{"x": {"y": 3}}""", "[1, 2]")) {
        val v = JsonValue.parse(inst)
        assert(c.get(v) == p.isValidInterp(v), s"$json / $inst")
      }
    }
  }

  test("recursive $ref schemas compile (cycle cut) and agree on deep instances") {
    // linked list: {"value": int, "next": <self>}
    val spec = Spec.parseJson(
      """{"$defs": {"node": {"type": "object", "required": ["value"],
           "properties": {"value": {"type": "integer"},
                          "next": {"$ref": "#/$defs/node"}}}},
          "$ref": "#/$defs/node"}""")
    val p = Interp.prepare(spec)
    assert(Compiled.compile(p.registry, p.entry).nonEmpty)
    def list(n: Int, bad: Boolean): JsonValue =
      if (n == 0) JObj(Vector("value" -> (if (bad) JStr("x") else JNum(BigDecimal(0)))))
      else JObj(Vector("value" -> JNum(BigDecimal(n)), "next" -> list(n - 1, bad)))
    for (depth <- Seq(0, 1, 17, 64); bad <- Seq(false, true)) {
      val v = list(depth, bad)
      assert(p.isValid(v) == p.isValidInterp(v))
      assert(p.isValid(v) == !bad)
    }
    // structure-free self-loop accepts everything (reference cycle rule)
    val loop = Interp.prepare(Spec.parseJson("""{"$ref": "#"}"""))
    assert(loop.isValid(JStr("anything")))
  }
}
