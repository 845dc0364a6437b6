package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.run.Validation

/** Row-level keyword semantics over a typed table — the minimum
  * end-to-end slice from SURVEY.md §7. */
case class TClip(clip_id: String, sr_hz: Integer, dur_ms: Integer,
                 codec: String, transcript: String)

class CompilerSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  val clipSpec =
    """{
      "properties": {
        "clip_id":    {"type": "string", "pattern": "^clip-[0-9a-f]{16}$"},
        "sr_hz":      {"type": "integer", "enum": [8000, 16000, 22050, 24000, 44100, 48000]},
        "dur_ms":     {"type": "integer", "minimum": 1, "maximum": 600000},
        "codec":      {"type": "string"},
        "transcript": {"type": "string", "maxLength": 10}
      },
      "required": ["clip_id", "sr_hz", "dur_ms", "codec"]
    }"""

  def clips = Seq(
    TClip("clip-0123456789abcdef", 16000, 1000, "pcm16", "hello"),      // valid
    TClip("CLIP-BAD", 16000, 1000, "pcm16", "hello"),                   // pattern
    TClip("clip-0123456789abcdef", 12345, 1000, "pcm16", "hi"),         // enum
    TClip("clip-0123456789abcdef", 16000, 0, "pcm16", "hi"),            // minimum
    TClip("clip-0123456789abcdef", 16000, 700000, "pcm16", "hi"),       // maximum
    TClip("clip-0123456789abcdef", 16000, 1000, null, "hi"),            // required+type
    TClip("clip-0123456789abcdef", 16000, 1000, "pcm16", "0123456789X") // maxLength
  ).toDF()

  test("full clip spec: valid flag and per-row violations") {
    val plan = Validation.compile(clipSpec, clips.schema)
    val out = plan.withValidation(clips).collect()
    assert(out(0).getAs[Boolean]("valid"))
    assert(!out(1).getAs[Boolean]("valid"))
    val kw = (i: Int) => out(i).getSeq[org.apache.spark.sql.Row](out(i).fieldIndex("violations")).map(_.getString(0))
    assert(kw(1) == Seq("pattern"))
    assert(kw(2) == Seq("enum"))
    assert(kw(3) == Seq("minimum"))
    assert(kw(4) == Seq("maximum"))
    assert(kw(5).toSet == Set("type", "required"))
    assert(kw(6) == Seq("maxLength"))
  }

  test("violation rows carry key, keyword and paths") {
    val plan = Validation.compile(clipSpec, clips.schema)
    val v = plan.violations(clips, Seq("clip_id")).collect()
    val patternRow = v.find(_.getAs[String]("keyword") == "pattern").get
    assert(patternRow.getAs[String]("clip_id") == "CLIP-BAD")
    assert(patternRow.getAs[String]("schema_path") == "/properties/clip_id/pattern")
    assert(patternRow.getAs[String]("instance_path") == "/clip_id")
    assert(patternRow.getAs[String]("message").contains("does not match"))
  }

  test("isValid short-circuit verdict") {
    val plan = Validation.compile(clipSpec, clips.schema)
    assert(!plan.isValid(clips))
    assert(plan.isValid(clips.limit(1)))
  }

  test("multipleOf uses exact decimal remainder") {
    val df = Seq(0.0075, 0.00751).toDF("x")
    val plan = Validation.compile("""{"properties":{"x":{"multipleOf":0.0001}}}""", df.schema)
    val got = plan.withValid(df).select("valid").as[Boolean].collect()
    assert(got.sameElements(Array(true, false)))
  }

  test("multipleOf huge values don't silently pass (decimal-cast overflow regression)") {
    // 1e23 overflows DecimalType(38,15); with the compiled kernel the
    // verdict is computed exactly instead of vacuously accepted
    val df = Seq(1e23, 1.5e23).toDF("x")
    val plan = Validation.compile("""{"properties":{"x":{"multipleOf":1e23}}}""", df.schema)
    val got = plan.withValid(df).select("valid").as[Boolean].collect()
    assert(got(0), "1e23 is a multiple of 1e23")
    assert(!got(1), "1.5e23 is not a multiple of 1e23")
  }

  test("propertyNames: invalid field name only fails rows where it is present") {
    val df = Seq(("k", Integer.valueOf(1)), ("k2", null.asInstanceOf[Integer]))
      .toDF("ok", "bad_name")
    val plan = Validation.compile(
      """{"propertyNames":{"maxLength":3}}""", df.schema)
    val got = plan.withValid(df).select("valid").as[Boolean].collect()
    assert(!got(0), "bad_name present → propertyNames fails")
    assert(got(1), "bad_name absent (null) → passes")
  }

  test("unresolvable $ref fails at compile time, not silently accepts") {
    val df = Seq(1).toDF("x")
    intercept[graft.spec.SpecError] {
      Validation.compile("""{"properties":{"x":{"$ref":"#/$defs/nope"}}}""", df.schema)
    }
    intercept[graft.spec.SpecError] {
      Validation.compile("""{"properties":{"x":{"$ref":"https://example.com/s.json"}}}""", df.schema)
    }
  }

  test("integral double counts as integer (1.0 is an integer)") {
    val df = Seq(1.0, 1.5).toDF("x")
    val plan = Validation.compile("""{"properties":{"x":{"type":"integer"}}}""", df.schema)
    val got = plan.withValid(df).select("valid").as[Boolean].collect()
    assert(got.sameElements(Array(true, false)))
  }

  test("const and numeric cross-type equality") {
    val df = Seq(1L, 2L).toDF("x")
    val plan = Validation.compile("""{"properties":{"x":{"const":1.0}}}""", df.schema)
    val got = plan.withValid(df).select("valid").as[Boolean].collect()
    assert(got.sameElements(Array(true, false)))
  }

  test("array keywords: items, minItems, uniqueItems, contains") {
    val df = Seq(
      (1, Seq(1, 2, 3)),
      (2, Seq(1, 1)),
      (3, Seq(200)),
      (4, Seq.empty[Int]),
    ).toDF("id", "xs")
    val spec = """{
      "properties": {"xs": {
        "items": {"maximum": 100}, "minItems": 1, "uniqueItems": true,
        "contains": {"minimum": 2}
      }}}"""
    val plan = Validation.compile(spec, df.schema)
    val out = plan.withValidation(df).orderBy("id").collect()
    def kws(i: Int) = out(i).getSeq[org.apache.spark.sql.Row](out(i).fieldIndex("violations")).map(_.getString(0)).toSet
    assert(kws(0) == Set.empty[String])
    assert(kws(1) == Set("uniqueItems", "contains"))
    assert(kws(2) == Set("items"))
    assert(kws(3) == Set("minItems", "contains"))
  }

  test("combinators: anyOf / oneOf / not / if-then-else") {
    val df = Seq(5, 15, 25).toDF("x")
    val anyOf = Validation.compile(
      """{"properties":{"x":{"anyOf":[{"maximum":10},{"minimum":20}]}}}""", df.schema)
    assert(anyOf.withValid(df).select("valid").as[Boolean].collect()
      .sameElements(Array(true, false, true)))
    val oneOf = Validation.compile(
      """{"properties":{"x":{"oneOf":[{"minimum":10},{"maximum":20}]}}}""", df.schema)
    assert(oneOf.withValid(df).select("valid").as[Boolean].collect()
      .sameElements(Array(true, false, true)))
    val ite = Validation.compile(
      """{"properties":{"x":{"if":{"minimum":10},"then":{"maximum":20},"else":{"minimum":1}}}}""", df.schema)
    assert(ite.withValid(df).select("valid").as[Boolean].collect()
      .sameElements(Array(true, true, false)))
  }

  test("$ref to $defs resolves; cycle accepts") {
    val df = Seq(5, -1).toDF("x")
    val plan = Validation.compile(
      """{"$defs":{"pos":{"minimum":0}},"properties":{"x":{"$ref":"#/$defs/pos"}}}""",
      df.schema)
    assert(plan.withValid(df).select("valid").as[Boolean].collect()
      .sameElements(Array(true, false)))
  }

  test("format: ipv4 / uuid / date-time / email") {
    val df = Seq(
      ("1.2.3.4", "c7f2952c-0b4c-44f3-b8a7-2f98c79c9e3f", "2023-01-15T10:30:00Z", "a@b.com"),
      ("256.1.1.1", "not-a-uuid", "2023-02-30T10:30:00Z", "nope"),
    ).toDF("ip", "id", "ts", "mail")
    val spec = """{"properties":{
      "ip": {"format": "ipv4"}, "id": {"format": "uuid"},
      "ts": {"format": "date-time"}, "mail": {"format": "email"}}}"""
    val plan = Validation.compile(spec, df.schema)
    val out = plan.withValidation(df).collect()
    assert(out(0).getAs[Boolean]("valid"))
    val kws = out(1).getSeq[org.apache.spark.sql.Row](out(1).fieldIndex("violations")).map(_.getString(2)).toSet
    assert(kws == Set("/ip", "/id", "/ts", "/mail"))
  }

  test("verdicts aggregate per partition") {
    val plan = Validation.compile(clipSpec, clips.schema)
    val v = plan.verdicts(clips.repartition(2)).collect()
    assert(v.map(_.getAs[Long]("rows")).sum == 7)
    assert(v.map(_.getAs[Long]("invalid_rows")).sum == 6)
  }

  test("maskedErrors redacts instance values from violation messages") {
    import spark.implicits._
    val df = Seq((1L, "supersecret", 9999.0)).toDF("id", "name", "price")
    val spec = """{"properties":{"name":{"maxLength":3},"price":{"maximum":100}}}"""
    val open = Validation.compile(spec, df.schema)
      .violations(df, Seq("id")).collect().map(_.getAs[String]("message"))
    val masked = Validation.compile(spec, df.schema,
        graft.compile.CompileOptions(maskedErrors = true))
      .violations(df, Seq("id")).collect().map(_.getAs[String]("message"))
    assert(open.exists(_.contains("supersecret")) && open.exists(_.contains("9999")))
    assert(masked.nonEmpty && masked.length == open.length)
    assert(!masked.exists(m => m.contains("supersecret") || m.contains("9999")), masked.mkString("|"))
  }
}
