package graft

// One-off deep equivalence sweep (not part of the default gate — run with
// testOnly). Kept in the tree so future rounds can re-run it cheaply.
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.Tag
import org.scalacheck.{Gen, rng}
import graft.spec._

object DeepSweep extends Tag("graft.DeepSweep")

class DeepSweepSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("2000-sample engine/interp/canonical equivalence sweep", DeepSweep) {
    val p = new PropertySpec
    var seed = rng.Seed(777000111L)
    var checked = 0
    val failures = scala.collection.mutable.Buffer[String]()
    for (_ <- 1 to 2000) {
      val specJson = p.genSpec.pureApply(Gen.Parameters.default, seed); seed = seed.next
      val value = p.genValue.pureApply(Gen.Parameters.default, seed); seed = seed.next
      val spec = Spec.parse(specJson)
      val want = Interp.isValid(spec, value)
      val cWant = Interp.isValid(Canonical.canonicalize(spec), value)
      if (want != cWant)
        failures += s"CANON ${JsonValue.render(specJson)} on ${JsonValue.render(value)}: $want vs $cWant"
      SuiteHarness.buildAndCompile(spark, spec, value).foreach { got =>
        checked += 1
        if (got != want)
          failures += s"ENGINE ${JsonValue.render(specJson)} on ${JsonValue.render(value)}: engine=$got interp=$want"
      }
    }
    info(s"checked $checked engine verdicts, 2000 canonical verdicts")
    assert(failures.isEmpty, failures.take(10).mkString("\n"))
  }
}
