package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, rng}
import graft.spec._

/** Differential + unit coverage for the fused streaming parse+validate
  * path (Streaming.scala). The contract: `isValidText(text)` ==
  * `isValid(JsonValue.parse(text))` on every document that parses. */
class StreamingSpec extends AnyFunSuite {

  private def prep(schemaJson: String): Interp.Prepared =
    Interp.prepare(Spec.parseJson(schemaJson))

  // ---- unit: dispatch + object/array pass corners ---------------------------

  val tagUnion: String =
    """{
      "type": "object",
      "required": ["tag"],
      "properties": {"tag": {"type": "string", "enum": ["a", "b"]}},
      "oneOf": [
        {"type": "object", "required": ["tag", "x"], "additionalProperties": false,
         "properties": {"tag": {"const": "a"}, "x": {"type": "integer", "minimum": 0}}},
        {"type": "object", "required": ["tag"], "additionalProperties": false,
         "properties": {"tag": {"const": "b"}, "y": {"type": "string", "minLength": 2}}}
      ]
    }"""

  test("JObj.getOrNull: first occurrence wins at both the linear and hashed sizes") {
    // the hashed >8-field path must keep the same first-wins rule the
    // dispatch kernels rely on (ADVICE r04: the hash path was lost and
    // wide-object const dispatch regressed to O(fields))
    def obj(n: Int) = JObj(
      (1 to n).map(i => s"k$i" -> (JStr(s"v$i"): JsonValue)).toVector
        ++ Vector("dup" -> (JStr("first"): JsonValue), "dup" -> (JStr("second"): JsonValue)))
    for (n <- Seq(2, 20)) {
      val o = obj(n)
      assert(o.getOrNull("dup") == JStr("first"), s"n=$n")
      assert(o.getOrNull("k1") == JStr("v1"))
      assert(o.getOrNull("nope") == null)
    }
  }

  test("tag dispatch: key first, key last, absent, unknown, duplicate, wrong branch fields") {
    val p = prep(tagUnion)
    val cases = Seq(
      """{"tag": "a", "x": 3}"""        -> true,
      """{"x": 3, "tag": "a"}"""        -> true,  // dispatch key last: buffered replay
      """{"tag": "a", "x": -1}"""       -> false, // branch constraint fails
      """{"tag": "a"}"""                -> false, // branch required x missing
      """{"tag": "b"}"""                -> true,
      """{"tag": "b", "y": "zz"}"""     -> true,
      """{"tag": "b", "y": "z"}"""      -> false, // minLength via branch
      """{"tag": "b", "x": 1}"""        -> false, // additionalProperties: false
      """{"tag": "c"}"""                -> false, // unknown tag
      """{"x": 3}"""                    -> false, // dispatch key absent
      """{"tag": "a", "tag": "b", "x": 3}""" -> false, // dup key: first dispatches, second fails const
      """"a""""                          -> false, // non-object: type + trial
      """[1, 2]"""                       -> false
    )
    cases.foreach { case (doc, want) =>
      assert(p.isValidText(doc) == want, s"text: $doc")
      assert(p.isValid(JsonValue.parse(doc)) == want, s"tree: $doc")
    }
  }

  test("tag dispatch: escaped-const tags (renderTable only) fall back correctly") {
    // "a\nb" cannot live in the raw-string fast table — the slow path must
    // decide it; plain "c" dispatches fast; unknown tags reject either way
    val p = prep(
      """{
        "type": "object", "required": ["t"],
        "oneOf": [
          {"type": "object", "properties": {"t": {"const": "a\nb"}, "x": {"type": "integer"}},
           "required": ["t", "x"], "additionalProperties": false},
          {"type": "object", "properties": {"t": {"const": "c"}},
           "required": ["t"], "additionalProperties": false}
        ]
      }""")
    val cases = Seq(
      "{\"t\": \"a\\nb\", \"x\": 1}" -> true,
      "{\"t\": \"a\\nb\"}"           -> false, // branch required x
      "{\"t\": \"c\"}"               -> true,
      "{\"x\": 1, \"t\": \"a\\nb\"}" -> true,  // tag last: buffered replay
      "{\"t\": \"d\"}"               -> false)
    cases.foreach { case (doc, want) =>
      assert(p.isValidText(doc) == want, s"text: $doc")
      assert(p.isValid(JsonValue.parse(doc)) == want, s"tree: $doc")
    }
  }

  test("type-dispatched oneOf incl. integer/number split") {
    val p = prep(
      """{"oneOf": [
           {"type": "integer", "minimum": 5},
           {"type": "string", "pattern": "^a"},
           {"type": "array", "items": {"type": "integer"}, "minItems": 1}
         ]}""")
    val cases = Seq(
      "7" -> true, "4" -> false, "7.5" -> false, "7.0" -> true,
      "\"abc\"" -> true, "\"b\"" -> false,
      "[1,2]" -> true, "[]" -> false, "[1,\"x\"]" -> false,
      "null" -> false, "true" -> false, "{}" -> false)
    cases.foreach { case (doc, want) =>
      assert(p.isValidText(doc) == want, doc)
      assert(p.isValid(JsonValue.parse(doc)) == want, doc)
    }
  }

  test("objects: required, bounds, patternProperties overlap, propertyNames") {
    val p = prep(
      """{
        "type": "object",
        "required": ["a", "b"],
        "minProperties": 2, "maxProperties": 4,
        "properties": {"a": {"type": "integer"}, "b": {"type": "string"}},
        "patternProperties": {"^a": {"minimum": 0}},
        "propertyNames": {"maxLength": 3},
        "additionalProperties": {"type": "boolean"}
      }""")
    val cases = Seq(
      """{"a": 1, "b": "x"}"""                 -> true,
      """{"a": -1, "b": "x"}"""                -> false, // pattern ^a overlaps property a
      """{"a": 1, "b": "x", "c": true}"""      -> true,
      """{"a": 1, "b": "x", "c": 1}"""         -> false, // AP type
      """{"a": 1}"""                           -> false, // required b
      """{"a": 1, "b": "x", "c": true, "d": true, "e": true}""" -> false, // maxProperties
      """{"a": 1, "b": "x", "long": true}"""   -> false  // propertyNames
    )
    cases.foreach { case (doc, want) =>
      assert(p.isValidText(doc) == want, doc)
      assert(p.isValid(JsonValue.parse(doc)) == want, doc)
    }
  }

  test("arrays: prefixItems + items(false) tuple, scalar checks") {
    val p = prep(
      """{"type": "array", "minItems": 2, "maxItems": 3, "items": false,
         "prefixItems": [{"type": "string"}, {"type": "number", "multipleOf": 0.5}, {"enum": [1, "z", null]}]}""")
    val cases = Seq(
      """["s", 1.5]"""        -> true,
      """["s", 1.5, "z"]"""   -> true,
      """["s", 1.5, null]"""  -> true,
      """["s", 1.5, 2]"""     -> false, // enum: 2 not a member (1 is)
      """["s", 1.5, 1]"""     -> true,
      """["s", 1.3]"""        -> false,
      """["s"]"""             -> false, // minItems
      """["s", 1.5, 1, 1]"""  -> false  // items: false beyond prefix
    )
    cases.foreach { case (doc, want) =>
      assert(p.isValidText(doc) == want, doc)
      assert(p.isValid(JsonValue.parse(doc)) == want, doc)
    }
  }

  test("streamed dependentRequired (presence bits) and contains (per-item counting)") {
    val p = prep(
      """{
        "type": "object",
        "properties": {"card": {"type": "string"}, "cvv": {"type": "string"},
                       "zip": {"type": "string"},
                       "tags": {"type": "array", "items": {"type": "string"},
                                "contains": {"pattern": "^x"}, "minContains": 1, "maxContains": 2}},
        "required": ["card"],
        "dependentRequired": {"cvv": ["zip", "card"], "card": []}
      }""")
    val cases = Seq(
      """{"card": "c"}"""                                   -> true,
      """{"card": "c", "cvv": "1"}"""                       -> false, // cvv needs zip
      """{"card": "c", "cvv": "1", "zip": "z"}"""           -> true,
      """{"cvv": "1", "zip": "z"}"""                        -> false, // required card
      """{"zip": "z", "cvv": "1", "card": "c"}"""           -> true,  // order independent
      """{"card": "c", "tags": ["xa"]}"""                   -> true,
      """{"card": "c", "tags": ["a"]}"""                    -> false, // minContains
      """{"card": "c", "tags": ["xa", "xb", "xc"]}"""       -> false, // maxContains
      """{"card": "c", "tags": ["xa", "b", "xc"]}"""        -> true,
      """{"card": "c", "tags": ["xa", 1]}"""                -> false  // items type beside contains
    )
    cases.foreach { case (doc, want) =>
      assert(p.isValidText(doc) == want, s"text: $doc")
      assert(p.isValid(JsonValue.parse(doc)) == want, s"tree: $doc")
    }
  }

  test("materialized fallbacks: not / if-then-else / uniqueItems / contains nodes") {
    val p = prep(
      """{
        "type": "object",
        "properties": {
          "n": {"not": {"type": "string"}},
          "u": {"type": "array", "uniqueItems": true},
          "c": {"type": "array", "contains": {"type": "integer"}, "minContains": 2},
          "i": {"if": {"type": "integer"}, "then": {"minimum": 0}, "else": {"type": "string"}}
        }
      }""")
    val cases = Seq(
      """{"n": 5, "u": [1, 2], "c": [1, "x", 2], "i": 3}"""  -> true,
      """{"n": "s"}"""                                        -> false,
      """{"u": [1, 1]}"""                                     -> false,
      """{"c": [1, "x"]}"""                                   -> false,
      """{"i": -3}"""                                         -> false,
      """{"i": "ok"}"""                                       -> true
    )
    cases.foreach { case (doc, want) =>
      assert(p.isValidText(doc) == want, doc)
      assert(p.isValid(JsonValue.parse(doc)) == want, doc)
    }
  }

  test("fused not / if-then-else folds (VERDICT_r04 #8): all atoms, no node materialization bail") {
    // scalar bodies fold into the pass (twin closures per number/string,
    // twin-on-constant for null/bool, atomStatus constants for arr/obj)
    val p1 = prep("""{"not": {"type": "string", "minLength": 2}}""")
    Seq("\"a\"" -> true, "\"ab\"" -> false, "5" -> true, "null" -> true,
        "[1,2]" -> true, "{\"x\":1}" -> true).foreach { case (d, w) =>
      assert(p1.isValidText(d) == w, d); assert(p1.isValid(JsonValue.parse(d)) == w, d)
    }
    // not over a type set: arrays/objects fold as constants
    val p2 = prep("""{"not": {"type": ["array", "null"]}}""")
    Seq("[1]" -> false, "[]" -> false, "null" -> false, "5" -> true,
        "{}" -> true, "\"s\"" -> true).foreach { case (d, w) =>
      assert(p2.isValidText(d) == w, d)
    }
    // numeric conditional: if/then/else fully fused, arrays/objects vacuous
    val p3 = prep("""{"if": {"type": "integer", "minimum": 0}, "then": {"multipleOf": 2}, "else": {"type": ["string", "object", "array", "number", "null", "boolean"]}}""")
    Seq("4" -> true, "3" -> false, "-3" -> true, "\"s\"" -> true,
        "{}" -> true, "[1]" -> true).foreach { case (d, w) =>
      assert(p3.isValidText(d) == w, d)
    }
    // if over a type pin whose branches decide arr/obj constantly
    val p4 = prep("""{"if": {"type": "array"}, "then": false, "else": {"type": ["string", "number"]}}""")
    Seq("[1]" -> false, "\"s\"" -> true, "5" -> true, "{}" -> false,
        "null" -> false).foreach { case (d, w) =>
      assert(p4.isValidText(d) == w, d)
    }
    // body containing combinators still folds via atomStatus recursion
    val p5 = prep("""{"not": {"anyOf": [{"type": "array"}, {"type": "string", "pattern": "^x"}]}}""")
    Seq("[1]" -> false, "\"xa\"" -> false, "\"a\"" -> true, "5" -> true,
        "{}" -> true).foreach { case (d, w) =>
      assert(p5.isValidText(d) == w, d)
    }
    // value-dependent OBJECT condition still gets correct verdicts through
    // the per-position materialization fallback
    val p6 = prep("""{"type": "object", "properties": {"v": {"if": {"type": "object", "required": ["tag"]}, "then": {"required": ["val"]}, "else": true}}}""")
    Seq("""{"v": {"tag": 1, "val": 2}}""" -> true,
        """{"v": {"tag": 1}}""" -> false,
        """{"v": {"other": 1}}""" -> true,
        """{"v": 5}""" -> true).foreach { case (d, w) =>
      assert(p6.isValidText(d) == w, d)
    }
  }

  test("$ref merge, allOf merge, cycles") {
    val p = prep(
      """{
        "$defs": {
          "node": {"type": "object",
                   "properties": {"v": {"type": "integer"}, "next": {"$ref": "#/$defs/node"}},
                   "required": ["v"]}
        },
        "allOf": [{"$ref": "#/$defs/node"}, {"type": "object", "maxProperties": 2}]
      }""")
    val cases = Seq(
      """{"v": 1}"""                                  -> true,
      """{"v": 1, "next": {"v": 2, "next": {"v": 3}}}""" -> true,
      """{"v": "x"}"""                                -> false,
      """{"v": 1, "next": {"next": {}}}"""            -> false, // nested required v
      """{"v": 1, "next": {"v": 2}, "z": 0}"""        -> false  // maxProperties via allOf
    )
    cases.foreach { case (doc, want) =>
      assert(p.isValidText(doc) == want, doc)
      assert(p.isValid(JsonValue.parse(doc)) == want, doc)
    }
  }

  test("grammar strictness: skipped regions are still parsed; trailing tokens ignored") {
    val p = prep("""{"type": "object", "properties": {"a": {"type": "integer"}}}""")
    // the "free" field is unconstrained (skipValue path) — malformedness there must throw
    intercept[java.io.IOException](p.isValidText("""{"free": 01, "a": 2}"""))
    intercept[java.io.IOException](p.isValidText("""{"free": [1,], "a": 2}"""))
    intercept[java.io.IOException](p.isValidText("""{"free": "\q", "a": 2}"""))
    // trailing garbage after the root value is ignored — same laxity as parse
    assert(p.isValidText("""{"a": 2} trailing"""))
    assert(p.isValid(JsonValue.parse("""{"a": 2} trailing""")))
  }

  // ---- differential: official suite corpus ----------------------------------

  test("official suite corpus: streaming verdict == tree verdict on every case") {
    val files = Seq("type.json", "numeric.json", "string.json", "enum_const.json",
      "object.json", "array.json", "combinators.json", "conditional.json",
      "ref.json", "ref_advanced.json", "anchor.json", "dynamicref.json",
      "recursiveref.json", "format.json", "unevaluated.json", "content.json",
      "content_assert.json", "ecmascript_regex.json")
    var checked = 0
    val failures = scala.collection.mutable.Buffer[String]()
    files.foreach { f =>
      SuiteHarness.loadResource(f).foreach { c =>
        Seq(false, true).foreach { fmts =>
          val p = Interp.prepare(Spec.parse(c.schema), assertFormats = fmts)
          val text = JsonValue.render(c.data)
          val tree = p.isValid(c.data)
          val stream = p.isValidText(text)
          checked += 1
          if (stream != tree)
            failures += s"$f / ${c.group} / ${c.description} (fmts=$fmts): stream=$stream tree=$tree"
        }
      }
    }
    info(s"checked $checked (case × assertFormats) pairs")
    assert(checked > 1000)
    assert(failures.isEmpty, s"\n${failures.take(10).mkString("\n")}")
  }

  // ---- differential: generated pairs -----------------------------------------

  test("streaming verdict == tree verdict for 3000 generated (spec, instance) pairs") {
    val ps = new PropertySpec
    var seed = rng.Seed(20260817L)
    var streamCompiled = 0
    var fallbacks = 0
    val failures = scala.collection.mutable.Buffer[String]()
    for (_ <- 1 to 3000) {
      val specJson = ps.genSpec.pureApply(Gen.Parameters.default, seed); seed = seed.next
      val value = ps.genValue.pureApply(Gen.Parameters.default, seed); seed = seed.next
      val p = Interp.prepare(Spec.parse(specJson))
      val text = JsonValue.render(value)
      Streaming.compile(p.registry, p.entry, assertFormats = false) match {
        case None => fallbacks += 1
        case Some(f) =>
          streamCompiled += 1
          val sv = f(text)
          val tw = p.isValidInterp(value)
          if (sv != tw)
            failures += s"spec=${JsonValue.render(specJson)} value=$text: stream=$sv interp=$tw"
      }
    }
    info(s"stream-compiled: $streamCompiled, fallbacks: $fallbacks")
    assert(failures.isEmpty, s"\n${failures.take(10).mkString("\n")}")
    assert(streamCompiled > 2500)
  }

  // ---- the recursive bench fixture -------------------------------------------

  test("recursive bench fixture: streaming == tree on the real document and mutations") {
    val instance = new String(getClass.getResourceAsStream(
      "/bench/recursive_instance.json").readAllBytes(), "UTF-8")
    val schema = new String(getClass.getResourceAsStream(
      "/bench/recursive_schema.json").readAllBytes(), "UTF-8")
    val p = prep(schema)
    assert(p.isValidText(instance))
    assert(p.isValid(JsonValue.parse(instance)))
    // mutations: break the document in schema-visible ways
    val mutations = Seq(
      instance.replaceFirst("\"structured-content\"", "\"mystery-content\""), // unknown tag
      instance.replaceFirst("\"tag\": \"span\"", "\"tag\": \"blink\""),       // unknown inner tag
      instance.replaceFirst("0,", "0.5,"),                                    // integer slot gets fraction
      instance.replaceFirst("\\[", "[[],")                                    // tuple arity broken
    )
    mutations.foreach { m =>
      assume(m != instance)
      val tree = p.isValid(JsonValue.parse(m))
      assert(p.isValidText(m) == tree, "mutation verdicts must agree")
    }
  }
}
