package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, rng}
import graft.spec._

class CanonicalSpec extends AnyFunSuite {

  def canon(json: String): Spec = Canonical.canonicalize(Spec.parseJson(json))

  /** The typed number piece of a partitioned-emission result (untyped
    * numeric leaves render as anyOf[other-types, {type:number, ...}]). */
  def numPiece(s: Spec): Spec.Obj = s match {
    case o: Spec.Obj if o.anyOf.nonEmpty =>
      o.anyOf.collectFirst {
        case b: Spec.Obj if b.types.exists(t =>
          t.contains(JsonType.Number) || t.contains(JsonType.Integer)) => b
      }.getOrElse(fail(s"no number piece in $s"))
    case o: Spec.Obj => o
    case other => fail(s"not an Obj: $other")
  }

  test("allOf bound intersection folds (partitioned emission)") {
    val got = canon("""{"allOf":[{"minimum":0},{"maximum":10}]}""")
    // untyped bounds render in the reference's partitioned view
    val np = numPiece(got)
    assert(np.minimum == Some(BigDecimal(0)) && np.maximum == Some(BigDecimal(10)))
    val others = got.asInstanceOf[Spec.Obj].anyOf.filterNot(_ eq np)
    assert(others == Vector(Spec.Obj(types =
      Some(Set(JsonType.Null, JsonType.Boolean, JsonType.String, JsonType.Array, JsonType.Object): Set[JsonType]))))
  }

  test("contradictory bounds become Reject (only when type pins the leaf)") {
    assert(canon("""{"type":"integer","minimum":10,"maximum":5}""") == Spec.Reject)
    assert(canon("""{"type":"number","allOf":[{"minimum":5},{"maximum":3}]}""") == Spec.Reject)
    assert(canon("""{"type":"number","exclusiveMinimum":3,"maximum":3}""") == Spec.Reject)
    assert(canon("""{"type":"string","minLength":4,"maxLength":2}""") == Spec.Reject)
    assert(canon("""{"type":"integer","enum":[]}""") == Spec.Reject)
    // without a type constraint other types still pass vacuously
    assert(canon("""{"minimum":5,"maximum":3}""") != Spec.Reject)
  }

  test("interval/const equivalence") {
    assert(canon("""{"type":"integer","minimum":1,"maximum":1}""")
      == Spec.Obj(const = Some(JNum(BigDecimal(1)))))
    assert(canon("""{"enum":[5]}""") == Spec.Obj(const = Some(JNum(BigDecimal(5)))))
  }

  test("enum dedup with math equality") {
    val got = canon("""{"enum":[1, 1.0, 2, 1]}""").asInstanceOf[Spec.Obj]
    assert(got.enumVals.get.length == 2)
  }

  test("anyOf simplification: Reject branches drop, Accept dominates") {
    // the sole surviving branch replaces the disjunction, then renders
    // in the partitioned view
    assert(numPiece(canon("""{"anyOf":[{"type":"integer","minimum":5,"maximum":3},{"minimum":0}]}"""))
      .minimum == Some(BigDecimal(0)))
    assert(canon("""{"anyOf":[{"type":"integer","minimum":5,"maximum":3},{"type":"number","minimum":4,"maximum":0}]}""") == Spec.Reject)
    assert(canon("""{"anyOf":[true,{"minimum":0}]}""") == Spec.Accept)
  }

  test("empty schema canonicalizes to Accept") {
    assert(canon("""{}""") == Spec.Accept)
    assert(canon("""{"allOf":[{},{}]}""") == Spec.Accept)
  }

  test("canonicalization preserves acceptance (property)") {
    // same shape as the reference's suite check (`tests/suite.rs:65-80`):
    // canonicalize-then-compare acceptance on every generated pair
    val p = new PropertySpec
    var seed = rng.Seed(987654321L)
    var bad = List.empty[String]
    for (_ <- 1 to 300) {
      val specJson = p.genSpec.pureApply(Gen.Parameters.default, seed); seed = seed.next
      val value = p.genValue.pureApply(Gen.Parameters.default, seed); seed = seed.next
      val orig = Spec.parse(specJson)
      val c = Canonical.canonicalize(orig)
      if (Interp.isValid(orig, value) != Interp.isValid(c, value))
        bad ::= s"${JsonValue.render(specJson)} on ${JsonValue.render(value)}"
    }
    assert(bad.isEmpty, bad.take(5).mkString("\n"))
  }

  test("allOf folding keeps unevaluated*/content* members (r1 ADVICE regression)") {
    // {"allOf":[{"unevaluatedProperties":false}]} must NOT become Accept
    val got = canon("""{"allOf":[{"unevaluatedProperties":false}]}""")
    assert(got != Spec.Accept)
    val o = got.asInstanceOf[Spec.Obj]
    assert(o.unevaluatedProperties.contains(Spec.Reject) ||
      o.allOf.exists { case m: Spec.Obj => m.unevaluatedProperties.nonEmpty; case _ => false })
    // content keywords survive too
    val ce = canon("""{"allOf":[{"contentEncoding":"base64"}]}""")
    assert(ce != Spec.Accept)
    // and a member's minContains is not hoisted next to a parent contains
    val mc = canon("""{"contains":{"minimum":0},"allOf":[{"minContains":2}]}""")
      .asInstanceOf[Spec.Obj]
    assert(mc.minContains.isEmpty, "minContains must stay in the member (no-op there)")
  }

  test("anyOf Accept-dominance disabled when unevaluated* is in scope") {
    val spec = """{"anyOf":[{},{"properties":{"a":{"type":"string"}}}],
                   "unevaluatedProperties": false}"""
    val orig = Spec.parseJson(spec)
    val c = Canonical.canonicalize(orig)
    // instance {"a":"x"}: branch 2 evaluates "a" → accepted; dropping the
    // anyOf would leave "a" unevaluated → rejected
    val inst = JObj(Vector("a" -> JStr("x")))
    assert(Interp.isValid(orig, inst) == Interp.isValid(c, inst))
  }

  test("negation pushdown: typed-leaf bounds, double negation, De Morgan") {
    // not(minimum:5) accepts ONLY numbers < 5 (non-numbers pass minimum
    // vacuously, so their negation rejects them)
    val g1 = canon("""{"not":{"minimum":5}}""").asInstanceOf[Spec.Obj]
    assert(g1.not.isEmpty && g1.exclusiveMaximum.contains(BigDecimal(5)))
    // `integer` beside `number` adds nothing — numericNormalize drops it
    assert(g1.types.contains(Set(JsonType.Number): Set[JsonType]))
    // double negation through type complement
    val g2 = canon("""{"not":{"not":{"type":"string"}}}""").asInstanceOf[Spec.Obj]
    assert(g2.types.contains(Set(JsonType.String): Set[JsonType]))
    // De Morgan: ¬(minimum:0 ∨ string) — both negations pushed and folded
    val g3 = canon("""{"not":{"anyOf":[{"minimum":0},{"type":"string"}]}}""")
      .asInstanceOf[Spec.Obj]
    assert(g3.not.isEmpty)
    assert(g3.exclusiveMaximum.contains(BigDecimal(0))) // ¬(min 0) merged up
    // acceptance preserved on witnesses
    for (v <- Seq[JsonValue](JNum(BigDecimal(-1)), JNum(BigDecimal(3)), JStr("x"), JBool(true))) {
      val orig = Spec.parseJson("""{"not":{"anyOf":[{"minimum":0},{"type":"string"}]}}""")
      assert(Interp.isValid(orig, v) == Interp.isValid(g3, v), JsonValue.render(v))
    }
    // minLength 0 is universal → its negation is Reject
    assert(canon("""{"not":{"minLength":0}}""") == Spec.Reject)
  }

  test("anyOf covered-branch dropping (subsumption)") {
    // covered branch drops, then the singleton disjunction unwraps
    assert(canon("""{"anyOf":[{"type":"string"},{"type":"string","minLength":2}]}""")
      == Spec.Obj(types = Some(Set(JsonType.String): Set[JsonType])))
    // numeric bound subsumption
    assert(numPiece(canon("""{"anyOf":[{"minimum":0},{"minimum":5,"maximum":9}]}"""))
      .minimum == Some(BigDecimal(0)))
    // NOT dropped when the sets are incomparable (a gap between them)
    val g3 = canon("""{"anyOf":[{"type":"number","maximum":3},{"type":"number","minimum":5}]}""")
      .asInstanceOf[Spec.Obj]
    assert(g3.anyOf.length == 2)
  }

  test("pairwise-disjoint oneOf becomes anyOf, then the union folds") {
    // disjoint type branches: exactly-one ≡ at-least-one ≡ the type union
    assert(canon("""{"oneOf":[{"type":"string"},{"type":"integer"},{"type":"array"}]}""")
      == Spec.Obj(types = Some(Set(JsonType.String, JsonType.Integer, JsonType.Array): Set[JsonType])))
    // overlapping branches take the exact encoding: the non-shared rays
    // (reference oneof.json "overlapping windows keep exactly the
    // non-shared rays") — non-numbers match BOTH vacuous branches (count
    // 2) so only numbers outside the overlap survive
    val g2 = canon("""{"oneOf":[{"minimum":0},{"maximum":10}]}""").asInstanceOf[Spec.Obj]
    assert(g2.oneOf.isEmpty)
    val numT2 = Some(Set(JsonType.Number): Set[JsonType])
    assert(g2.anyOf.toSet == Set(
      Spec.Obj(types = numT2, exclusiveMinimum = Some(BigDecimal(10))),
      Spec.Obj(types = numT2, exclusiveMaximum = Some(BigDecimal(0)))))
    // verdict preserved across the encoding
    val orig2 = Spec.parseJson("""{"oneOf":[{"minimum":0},{"maximum":10}]}""")
    for (v <- Seq[JsonValue](JNum(BigDecimal(-5)), JNum(BigDecimal(5)),
        JNum(BigDecimal(15)), JStr("x")))
      assert(Interp.isValid(orig2, v) == Interp.isValid(g2, v), JsonValue.render(v))
    // disjoint by value sets: members union into one set
    assert(canon("""{"oneOf":[{"enum":[1,2]},{"enum":[3,4]}]}""").asInstanceOf[Spec.Obj]
      .enumVals.exists(_.length == 4))
    // disjoint by numeric ranges (type-pinned): the gap keeps them apart
    val g4 = canon("""{"oneOf":[{"type":"number","maximum":4},{"type":"number","minimum":5}]}""")
      .asInstanceOf[Spec.Obj]
    assert(g4.oneOf.isEmpty && g4.anyOf.length == 2)
  }

  test("pointer refs INTO definitions disable structure-moving rewrites") {
    // folding would dangle #/$defs/x/allOf/0 — the document must pass
    // through untouched (conservative Raw gate)
    val json = """{"properties":{"p":{"$ref":"#/$defs/x/allOf/0"}},
                   "$defs":{"x":{"allOf":[{"minimum":1},{"maximum":9}]}}}"""
    val spec = Spec.parseJson(json)
    assert(Canonical.canonicalize(spec) == spec)
    // whole-definition refs still canonicalize
    val ok = canon("""{"properties":{"p":{"$ref":"#/$defs/x"}},
                       "$defs":{"x":{"allOf":[{"minimum":1},{"maximum":9}]}}}""")
      .asInstanceOf[Spec.Obj]
    assert(ok.defs("x").asInstanceOf[Spec.Obj].allOf.isEmpty)
  }

  test("pinned key set dominated by not-branch is unsatisfiable") {
    // required+maxProperties pin keys to {a}; every such object has all
    // property names in the not-branch's enum -> not always fails
    assert(canon("""{"type":"object","properties":{"a":{"type":"string"}},
      "required":["a"],"minProperties":1,"maxProperties":1,
      "not":{"type":"object","propertyNames":{"enum":["a","b"]}}}""") == Spec.Reject)
    // a second admissible key breaks the pin -> satisfiable ({"c":...})
    assert(canon("""{"type":"object","required":["a"],"maxProperties":2,
      "not":{"propertyNames":{"enum":["a","b"]}}}""") != Spec.Reject)
    // value-dependent not-branch -> undecidable, stays satisfiable
    assert(canon("""{"type":"object","required":["a"],"maxProperties":1,
      "not":{"properties":{"a":{"type":"number"}}}}""") != Spec.Reject)
    // required can't fit under maxProperties at all
    assert(canon("""{"type":"object","required":["a","b"],"maxProperties":1}""")
      == Spec.Reject)
  }

  test("allOf multipleOf pairs fold to the exact rational LCM") {
    val g1 = numPiece(canon("""{"allOf":[{"multipleOf":4},{"multipleOf":6}]}"""))
    assert(g1.multipleOf.contains(BigDecimal(12)) && g1.allOf.isEmpty)
    val g2 = numPiece(canon("""{"allOf":[{"multipleOf":0.1},{"multipleOf":0.25}]}"""))
    assert(g2.multipleOf.exists(_.compareTo(BigDecimal("0.5")) == 0), g2.multipleOf)
    // verdict preserved: 0.5 and 1.0 are multiples of both; 0.2 is not
    for ((v, want) <- Seq("0.5" -> true, "1.0" -> true, "0.2" -> false, "0.75" -> false))
      assert(Interp.isValid(g2, JsonValue.parse(v)) == want, v)
    // whole canonical document (incl. the free-types piece) verdict-safe
    val whole = canon("""{"allOf":[{"multipleOf":0.1},{"multipleOf":0.25}]}""")
    for ((v, want) <- Seq("0.5" -> true, "0.2" -> false, "\"x\"" -> true))
      assert(Interp.isValid(whole, JsonValue.parse(v)) == want, v)
    // LCM overshooting the window -> Reject (numeric gap)
    assert(canon("""{"type":"number","allOf":[{"multipleOf":4},{"multipleOf":6}],
      "minimum":1,"maximum":11}""") == Spec.Reject)
  }

  test("recursive-schema emptiness: no finite witness -> Reject; escapes survive") {
    // every instance needs infinite property depth
    assert(canon("""{"$defs":{"x":{"type":"object","required":["a"],
      "properties":{"a":{"$ref":"#/$defs/x"}}}},"$ref":"#/$defs/x"}""") == Spec.Reject)
    // arrays forced nonempty with self-typed items
    assert(canon("""{"$defs":{"x":{"type":"array","minItems":1,
      "items":{"$ref":"#/$defs/x"}}},"$ref":"#/$defs/x"}""") == Spec.Reject)
    // mutual recursion without a base case
    assert(canon("""{"$defs":{
      "x":{"type":"object","required":["y"],"properties":{"y":{"$ref":"#/$defs/y"}}},
      "y":{"type":"object","required":["x"],"properties":{"x":{"$ref":"#/$defs/x"}}}},
      "$ref":"#/$defs/x"}""") == Spec.Reject)
    // escape via anyOf null branch: satisfiable
    assert(canon("""{"$defs":{"x":{"anyOf":[{"type":"null"},
      {"type":"object","required":["a"],"properties":{"a":{"$ref":"#/$defs/x"}}}]}},
      "$ref":"#/$defs/x"}""") != Spec.Reject)
    // escape because the recursive property is OPTIONAL: satisfiable
    assert(canon("""{"$defs":{"x":{"type":"object",
      "properties":{"next":{"$ref":"#/$defs/x"}}}},"$ref":"#/$defs/x"}""") != Spec.Reject)
    // non-recursive: required key forbidden by additionalProperties:false
    assert(canon("""{"type":"object","required":["a"],
      "additionalProperties":false}""") == Spec.Reject)
    // ...but allowed when properties covers it
    assert(canon("""{"type":"object","required":["a"],
      "properties":{"a":{}},"additionalProperties":false}""") != Spec.Reject)
  }

  test("allOf pure-anyOf member hoists and the conjunct distributes") {
    // (min 0) ∧ (max 5 ∨ min 10) = [0,5] ∨ [10,∞) — the reference's
    // conjunct-through-union distribution (algebra.rs)
    val got = canon("""{"allOf":[{"minimum":0},{"anyOf":[{"maximum":5},{"minimum":10}]}]}""")
      .asInstanceOf[Spec.Obj]
    assert(got.allOf.isEmpty && got.minimum.isEmpty)
    // partitioned view: the two number windows plus the free-types piece
    val numT = Some(Set(JsonType.Number): Set[JsonType])
    assert(got.anyOf.toSet == Set(
      Spec.Obj(types = numT, minimum = Some(BigDecimal(0)), maximum = Some(BigDecimal(5))),
      Spec.Obj(types = numT, minimum = Some(BigDecimal(10))),
      Spec.Obj(types = Some(Set(JsonType.Null, JsonType.Boolean, JsonType.String,
        JsonType.Array, JsonType.Object): Set[JsonType]))))
    // acceptance preserved on witnesses spanning the pieces
    val orig = Spec.parseJson("""{"allOf":[{"minimum":0},{"anyOf":[{"maximum":5},{"minimum":10}]}]}""")
    for (v <- Seq[JsonValue](JNum(BigDecimal(-1)), JNum(BigDecimal(3)),
        JNum(BigDecimal(7)), JNum(BigDecimal(12)), JStr("x")))
      assert(Interp.isValid(orig, v) == Interp.isValid(got, v), JsonValue.render(v))
  }
}
