package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.spec._

/** `assertFormats` — the single-document analog of the reference's
  * `validate_formats(true)` option: the format suite's assertion-mode
  * expectations must hold through BOTH the compiled path and the
  * tree-walk, matching the engine's verdicts. */
class FormatAssertSpec extends AnyFunSuite {

  test("format.json verdicts match with assertFormats on (compiled + tree-walk)") {
    var checked = 0
    val failures = scala.collection.mutable.Buffer[String]()
    SuiteHarness.loadResource("format.json").foreach { c =>
      val spec = try Spec.parse(c.schema) catch { case _: SpecError => null }
      if (spec != null) {
        val p = Interp.prepare(spec, assertFormats = true)
        val compiledV = try Some(p.isValid(c.data)) catch { case _: SpecError => None }
        compiledV.foreach { got =>
          checked += 1
          val tw = p.isValidInterp(c.data)
          if (got != c.valid || tw != c.valid)
            failures += s"${c.group} / ${c.description}: compiled=$got interp=$tw want=${c.valid}"
        }
      }
    }
    info(s"checked $checked format cases")
    assert(failures.isEmpty, failures.take(10).mkString("\n"))
    assert(checked > 50)
  }

  test("annotation default: format-only schemas accept every instance") {
    SuiteHarness.loadResource("format.json").foreach { c =>
      val formatOnly = c.schema match {
        case o: JObj => o.fields.map(_._1).forall(k => k == "format" || k == "$comment")
        case _ => false
      }
      if (formatOnly) {
        val spec = try Spec.parse(c.schema) catch { case _: SpecError => null }
        if (spec != null)
          assert(Interp.prepare(spec).isValid(c.data),
            s"${c.group} / ${c.description} rejected under annotation-only default")
      }
    }
  }
}
