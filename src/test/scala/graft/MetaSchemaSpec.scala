package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.spec._

/** The REAL draft 2020-12 meta-schema family (8 documents vendored from
  * `crates/jsonschema/metaschemas/draft2020-12/` — public spec documents)
  * bundled into one compound document and run by our engine: relative
  * `$ref "meta/core"` resolution against the root `$id`, one resource per
  * embedded `$id`, and `$dynamicRef "#meta"` bouncing to the OUTERMOST
  * `$dynamicAnchor meta` in the dynamic scope — the full referencing
  * stack in one test. */
class MetaSchemaSpec extends AnyFunSuite {

  private def res(name: String): JsonValue = {
    val in = getClass.getResourceAsStream(s"/metaschema-2020-12/$name")
    require(in != null, s"missing $name")
    JsonValue.parse(new String(in.readAllBytes(), "UTF-8"))
  }

  private val metaNames = Seq("core", "applicator", "unevaluated", "validation",
    "meta-data", "format-annotation", "content")

  lazy val prepared: Interp.Prepared = Meta.officialPrepared

  test("bundling pulls in all seven vocabulary meta-schemas") {
    val b = prepared.root.asInstanceOf[Spec.Obj]
    assert(Bundler.unresolvableUris(b).isEmpty)
    assert(b.defs.count(_._1.startsWith("bundled")) == 7)
  }

  test("well-formed schemas validate against the real meta-schema") {
    val good = Seq(
      """true""",
      """{}""",
      """{"type": "object", "properties": {"a": {"type": "string"}}, "required": ["a"]}""",
      """{"allOf": [{"minimum": 0}], "not": {"enum": [1, 2]}}""",
      """{"$defs": {"n": {"$ref": "#/$defs/n"}}, "items": {"$dynamicRef": "#x"}}""",
      """{"properties": {"p": {"patternProperties": {"^a": {"maxLength": 3}}}}}""")
    good.foreach { s =>
      assert(prepared.isValid(JsonValue.parse(s)), s)
    }
  }

  test("malformed schemas are rejected by the real meta-schema") {
    val bad = Seq(
      """{"type": 123}""",                       // type must be string/array of strings
      """{"type": "nonsense"}""",                // not one of the seven simple types
      """{"required": "name"}""",                // required must be an array
      """{"required": ["a", "a"]}""",            // uniqueItems on required
      """{"properties": []}""",                  // properties must be an object
      """{"minLength": -1}""",                   // nonNegativeInteger
      """{"multipleOf": 0}""",                   // exclusiveMinimum 0
      """{"enum": 5}""",                         // enum must be an array
      """{"$defs": {"x": {"minimum": "zero"}}}""") // nested via $dynamicRef #meta
    bad.foreach { s =>
      assert(!prepared.isValid(JsonValue.parse(s)), s)
    }
  }

  test("shared compiled validator is safe under concurrent threads (dynamic dispatch)") {
    val docs = Seq(res("schema.json"), res("meta/core.json"), res("meta/applicator.json"),
      JsonValue.parse("""{"type": "object"}"""), JsonValue.parse("""{"type": 123}"""))
    val want = docs.map(prepared.isValid)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(16)
    try {
      val futures = (1 to 64).map { _ =>
        pool.submit(new java.util.concurrent.Callable[Seq[Boolean]] {
          def call(): Seq[Boolean] = docs.map(prepared.isValid)
        })
      }
      futures.foreach(f => assert(f.get() == want))
    } finally pool.shutdown()
  }

  test("the meta-schema family validates ITSELF (every document)") {
    assert(prepared.isValid(res("schema.json")))
    metaNames.foreach { n =>
      assert(prepared.isValid(res(s"meta/$n.json")), n)
    }
  }

  test("vocabulary gate: unknown REQUIRED vocabulary refuses the build at every tier") {
    // `vocabularies.rs` analog: a dialect requiring an unimplemented
    // vocabulary must refuse; optional (false) unknown vocabularies pass
    val requiresUnknown = Spec.parseJson("""{
      "$vocabulary": {
        "https://json-schema.org/draft/2020-12/vocab/core": true,
        "https://example.com/vocab/made-up": true
      },
      "type": "object"}""")
    intercept[SpecError](Interp.prepare(requiresUnknown))
    intercept[SpecError](Compiled.compile(Registry.build(requiresUnknown), requiresUnknown))
    intercept[SpecError](graft.run.Validation.compileSpec(requiresUnknown,
      org.apache.spark.sql.types.StructType(Seq.empty)))

    val optionalUnknown = Spec.parseJson("""{
      "$vocabulary": {
        "https://json-schema.org/draft/2020-12/vocab/core": true,
        "https://example.com/vocab/made-up": false
      },
      "type": "object"}""")
    Interp.prepare(optionalUnknown) // must not throw
    assert(Vocabularies.unknownRequired(optionalUnknown).isEmpty)

    // the official 2020-12 dialect declares only known vocabularies
    assert(Vocabularies.unknownRequired(Spec.parse(res("schema.json"))).isEmpty)
    // $vocabulary round-trips through render (bundle/dereference surface)
    val rendered = Spec.toJson(requiresUnknown)
    assert(JsonValue.render(rendered).contains("made-up"))
  }
}
