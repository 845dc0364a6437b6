package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.spec._

/** The reference's headline "Recursive" benchmark (nested dictionary
  * content with recursive `#/definitions` refs —
  * `crates/benchmark/data/recursive_{schema,instance}.json`, PUBLIC
  * reference benchmark data vendored verbatim). Validates that our
  * engine accepts/rejects the same instances before Bench measures
  * throughput on it. */
class RecursiveBenchSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def res(name: String): String =
    new String(getClass.getResourceAsStream(s"/bench/$name").readAllBytes(), "UTF-8")

  lazy val prepared = Interp.prepare(Spec.parseJson(res("recursive_schema.json")))
  lazy val instance = res("recursive_instance.json")

  test("reference recursive instance validates (interpreter)") {
    assert(prepared.isValid(JsonValue.parse(instance)))
  }

  test("mutations are rejected: missing required tag, bad href, wrong arity") {
    // a structured-content node without its required "tag"
    val noTag = instance.replaceFirst("\"tag\": \"div\"", "\"tagX\": \"div\"")
    // href failing the ^(?:https?:|\?) pattern
    val badHref = instance.replace("\"href\": \"https://example.com\"", "\"href\": \"ftp://x\"")
    for (m <- Seq(noTag, badHref)) {
      assert(m != instance) // the mutation actually applied
      assert(!prepared.isValid(JsonValue.parse(m)), m.take(80))
    }
    // outer rows must be exactly 8 elements
    val arity = JsonValue.parse(instance) match {
      case JArr(rows) => JArr(rows.map { case JArr(cells) => JArr(cells.tail); case x => x })
      case x => x
    }
    assert(!prepared.isValid(arity))
  }

  test("content_schema_valid kernel validates per-row inside codegen") {
    val df = spark.range(0, 64, 1, 4)
      .select(graft.functions.exprs.content_schema_valid(
        // row-varying payload: forbid constant folding of the kernel
        regexp_replace(lit(instance), lit("term1"), concat(lit("term"), col("id"))),
        prepared).as("ok"))
    assert(df.where(col("ok")).count() == 64)
  }

  test("content_schema_valid: malformed JSON passes vacuously, invalid fails") {
    val spec = Spec.parseJson(
      """{"type": "object", "required": ["a"],
         "properties": {"a": {"type": "integer", "minimum": 0}}}""")
    val p = Interp.prepare(spec)
    import spark.implicits._
    val rows = Seq(
      """{"a": 1}"""          -> true,  // valid
      """{"a": -5}"""         -> false, // invalid (well-formed)
      """{"b": 1}"""          -> false, // required missing
      """{"a": 1"""           -> true,  // malformed: vacuous pass
      """{"""                 -> true,  // malformed: vacuous pass
      // the streaming asymmetry: minimum fails BEFORE the malformed tail —
      // a stream-false must be re-checked for grammar and pass vacuously
      """{"a": -5, "b": [1,"""-> true,
      """not json at all"""   -> true)
    val df = rows.toDF("doc", "want")
      .select(graft.functions.exprs.content_schema_valid(col("doc"), p).as("got"),
              col("want"))
    assert(df.where(col("got") =!= col("want")).count() == 0)
  }
}
