package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, rng}
import graft.spec._

/** Property tests (FIXTURES.md §6, mirroring the reference's
  * canonical_proptest.rs generators: bounds in [-8,8], lengths in [0,4],
  * small divisors/enums): for every generated (spec, instance) pair the
  * Spark engine verdict over a 1-row Dataset must equal the naive
  * interpreter's verdict. */
class PropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  // ---- generators --------------------------------------------------------

  val genNum: Gen[JsonValue] = Gen.oneOf(
    Gen.choose(-10, 10).map(i => JNum(BigDecimal(i))),
    Gen.choose(-80, 80).map(i => JNum(BigDecimal(i) / 10)))

  val genScalar: Gen[JsonValue] = Gen.oneOf(
    genNum,
    Gen.oneOf("", "a", "ab", "abc", "aba", "zz").map(JStr(_)),
    Gen.oneOf(true, false).map(JBool(_)),
    Gen.const(JNull))

  val genObjValue: Gen[JsonValue] = for {
    a <- genScalar
    withB <- Gen.oneOf(true, false)
    b <- genScalar
  } yield if (withB) JObj(Vector("a" -> a, "b" -> b)) else JObj(Vector("a" -> a))

  val genValue: Gen[JsonValue] = Gen.frequency(
    5 -> genScalar,
    2 -> Gen.listOfN(3, genNum).map(xs => JArr(xs.toVector)),
    1 -> Gen.listOf(Gen.oneOf("a", "b", "ab")).map(xs => JArr(xs.take(3).map(JStr(_)).toVector)),
    2 -> genObjValue)

  def obj(fields: (String, JsonValue)*): JObj = JObj(fields.toVector)

  val genBound: Gen[JsonValue] = Gen.choose(-8, 8).map(i => JNum(BigDecimal(i)))
  val genLen: Gen[JsonValue] = Gen.choose(0, 4).map(i => JNum(BigDecimal(i)))

  val genScalarSpec: Gen[JsonValue] = Gen.oneOf[Gen[JsonValue]](
    Gen.oneOf("integer", "number", "string", "boolean", "null", "array")
      .map(t => obj("type" -> JStr(t))),
    genBound.map(b => obj("minimum" -> b)),
    genBound.map(b => obj("maximum" -> b)),
    genBound.map(b => obj("exclusiveMinimum" -> b)),
    genBound.map(b => obj("exclusiveMaximum" -> b)),
    Gen.oneOf(BigDecimal(1), BigDecimal(2), BigDecimal(3), BigDecimal("0.5"))
      .map(d => obj("multipleOf" -> JNum(d))),
    genLen.map(n => obj("minLength" -> n)),
    genLen.map(n => obj("maxLength" -> n)),
    Gen.oneOf("^a", "a$", "a+", "^ab$", "z").map(p => obj("pattern" -> JStr(p))),
    Gen.listOfN(3, genScalar).map(vs => obj("enum" -> JArr(vs.toVector.distinct))),
    genScalar.map(v => obj("const" -> v)),
    genLen.map(n => obj("minItems" -> n)),
    genLen.map(n => obj("maxItems" -> n)),
    Gen.const(obj("uniqueItems" -> JBool(true))),
    genBound.map(b => obj("items" -> obj("minimum" -> b))),
    genBound.map(b => obj("contains" -> obj("minimum" -> b))),
  ).flatMap(identity)

  def merge(a: JObj, b: JObj): JObj = JObj((a.fields.toMap ++ b.fields.toMap).toVector)

  /** unevaluatedProperties shapes — the keyword class the r1 canonicalizer
    * bug lived in (allOf folding dropped it); the generator must emit it so
    * the acceptance-preservation property can catch regressions. */
  val genUnevalSpec: Gen[JsonValue] = for {
    inner <- Gen.oneOf(
      obj("properties" -> obj("a" -> JBool(true))),
      obj("properties" -> obj("a" -> JBool(true), "b" -> JBool(true))),
      obj("required" -> JArr(Vector(JStr("a")))),
      obj())
    u <- Gen.oneOf[JsonValue](JBool(false), obj("type" -> JStr("string")))
    shape <- Gen.choose(0, 2)
  } yield shape match {
    case 0 => obj("allOf" -> JArr(Vector(merge(inner, obj("unevaluatedProperties" -> u)))))
    case 1 => merge(obj("allOf" -> JArr(Vector(inner))), obj("unevaluatedProperties" -> u))
    case _ => obj("anyOf" -> JArr(Vector(JBool(true), inner)), "unevaluatedProperties" -> u)
  }

  /** contains + min/maxContains split across allOf members — hoisting
    * m*Contains next to a parent `contains` must not tighten semantics. */
  val genContainsSpec: Gen[JsonValue] = for {
    b <- genBound
    mn <- Gen.choose(0, 2).map(i => JNum(BigDecimal(i)))
    mx <- Gen.choose(0, 3).map(i => JNum(BigDecimal(i)))
    split <- Gen.oneOf(true, false)
  } yield
    if (split)
      obj("contains" -> obj("minimum" -> b),
        "allOf" -> JArr(Vector(obj("minContains" -> mn, "maxContains" -> mx))))
    else
      obj("allOf" -> JArr(Vector(obj("contains" -> obj("minimum" -> b), "minContains" -> mn))),
        "maxContains" -> mx)

  /** $ref through $defs (and a self-recursive variant): exercises the
    * registry resolution + compile-time unrolling paths. */
  val genRefSpec: Gen[JsonValue] = for {
    inner <- genScalarSpec
    shape <- Gen.choose(0, 2)
  } yield shape match {
    case 0 => obj("$defs" -> obj("d" -> inner), "$ref" -> JStr("#/$defs/d"))
    case 1 => obj("$defs" -> obj("d" -> inner),
      "anyOf" -> JArr(Vector(obj("$ref" -> JStr("#/$defs/d")), obj("type" -> JStr("null")))))
    case _ => obj("$defs" -> obj("d" -> merge(inner.asInstanceOf[JObj],
        obj("properties" -> obj("a" -> obj("$ref" -> JStr("#/$defs/d")))))),
      "$ref" -> JStr("#/$defs/d"))
  }

  val genSpec: Gen[JsonValue] = Gen.frequency[Gen[JsonValue]](
    3 -> genScalarSpec,
    2 -> (for (a <- genScalarSpec; b <- genScalarSpec) yield merge(a.asInstanceOf[JObj], b.asInstanceOf[JObj])),
    2 -> (for (a <- genScalarSpec; b <- genScalarSpec)
      yield obj("allOf" -> JArr(Vector(a, b)))), // exercises allOf folding (incl. multipleOf LCM)
    2 -> (for (a <- genScalarSpec; b <- genScalarSpec)
      yield obj("anyOf" -> JArr(Vector(a, b)))),
    2 -> (for (a <- genScalarSpec; b <- genScalarSpec)
      yield obj("oneOf" -> JArr(Vector(a, b)))),
    2 -> genScalarSpec.map(s => obj("not" -> s)),
    2 -> (for (i <- genScalarSpec; t <- genScalarSpec; e <- genScalarSpec)
      yield obj("if" -> i, "then" -> t, "else" -> e)),
    2 -> genUnevalSpec,
    2 -> genContainsSpec,
    2 -> genRefSpec,
  ).flatMap(identity)

  test("Spec -> JSON -> Spec round trip is verdict-preserving and render-idempotent") {
    var seed = rng.Seed(20260818L)
    for (_ <- 1 to 400) {
      val specJson = genSpec.pureApply(Gen.Parameters.default, seed); seed = seed.next
      val value = genValue.pureApply(Gen.Parameters.default, seed); seed = seed.next
      val s1 = Spec.parse(specJson)
      val j1 = Spec.toJson(s1)
      val s2 = Spec.parse(j1)
      // serializer idempotency: one round trip reaches a fixed point
      assert(JsonValue.render(Spec.toJson(s2)) == JsonValue.render(j1),
        JsonValue.render(specJson))
      // and the round-tripped spec keeps the verdict
      assert(Interp.isValid(s2, value) == Interp.isValid(s1, value),
        s"${JsonValue.render(specJson)} / ${JsonValue.render(value)}")
    }
  }

  test("compiled verdict == tree-walk verdict for 2000 generated (spec, instance) pairs") {
    var seed = rng.Seed(20260817L)
    var compiledChecked = 0
    var fallbacks = 0
    val failures = scala.collection.mutable.Buffer[String]()
    for (_ <- 1 to 2000) {
      val specJson = genSpec.pureApply(Gen.Parameters.default, seed); seed = seed.next
      val value = genValue.pureApply(Gen.Parameters.default, seed); seed = seed.next
      val p = Interp.prepare(Spec.parse(specJson))
      Compiled.compile(p.registry, p.entry) match {
        case None => fallbacks += 1 // unevaluated*/dynamic-scope generators
        case Some(fastC) =>
          compiledChecked += 1
          val fv = fastC(value); val tw = p.isValidInterp(value)
          if (fv != tw)
            failures += s"spec=${JsonValue.render(specJson)} value=${JsonValue.render(value)}: compiled=$fv interp=$tw"
      }
    }
    info(s"compiled: $compiledChecked, fallbacks: $fallbacks")
    assert(failures.isEmpty, s"\n${failures.take(10).mkString("\n")}")
    assert(compiledChecked > 1200)
  }

  test("engine verdict == interpreter verdict for generated (spec, instance) pairs") {
    val seed0 = rng.Seed(20260816L)
    var seed = seed0
    var checked = 0
    var skipped = 0
    val failures = scala.collection.mutable.Buffer[String]()
    for (_ <- 1 to 120) {
      val specJson = genSpec.pureApply(Gen.Parameters.default, seed)
      seed = seed.next
      val value = genValue.pureApply(Gen.Parameters.default, seed)
      seed = seed.next
      val spec = Spec.parse(specJson)
      val want = Interp.isValid(spec, value)
      SuiteHarness.buildAndCompile(spark, spec, value) match {
        case None => skipped += 1
        case Some(got) =>
          checked += 1
          if (got != want)
            failures += s"spec=${JsonValue.render(specJson)} value=${JsonValue.render(value)}: engine=$got interp=$want"
      }
    }
    assert(failures.isEmpty, s"\n${failures.take(10).mkString("\n")}\n(${failures.size} of $checked failed)")
    assert(checked > 80, s"only $checked checked ($skipped skipped)")
  }
}
