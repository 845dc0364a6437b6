package graft

import graft.spec._
import org.scalacheck.{Gen, rng}

/** One-off: find a generated schema whose canonicalization blows the
  * stack or fails to terminate quickly; print it for a regression test. */
object CanonCrashHunt {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(5000)
    val ps = new PropertySpec
    var seed = rng.Seed(987654321L)
    for (i <- 1 to n) {
      val specJson = ps.genSpec.pureApply(Gen.Parameters.default, seed); seed = seed.next
      seed = seed.next // keep value-seed cadence aligned with SweepStress
      val spec = Spec.parse(specJson)
      try {
        val t0 = System.nanoTime()
        Canonical.canonicalize(spec)
        val ms = (System.nanoTime() - t0) / 1e6
        if (ms > 2000) {
          println(s"SLOW ${ms.toInt}ms at $i: ${JsonValue.render(specJson)}")
        }
      } catch {
        case e: StackOverflowError =>
          println(s"OVERFLOW at $i: ${JsonValue.render(specJson)}")
          return
        case e: Throwable =>
          println(s"THROW ${e.getClass.getSimpleName} at $i: ${JsonValue.render(specJson).take(400)}")
      }
    }
    println("no crash found")
  }
}
