package graft

import graft.spec._

/** Microbench for the dynamic-JSON validation path (the reference's
  * "Recursive" headline): splits per-document cost into JSON parse vs
  * compiled-closure validation, single-threaded, no Spark. */
object RecursivePerfProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(20000)
    val instance = new String(getClass.getResourceAsStream(
      "/bench/recursive_instance.json").readAllBytes(), "UTF-8")
    val schema = new String(getClass.getResourceAsStream(
      "/bench/recursive_schema.json").readAllBytes(), "UTF-8")
    val prepared = Interp.prepare(Spec.parseJson(schema))
    val parsed = JsonValue.parse(instance)
    require(prepared.isValid(parsed))
    require(prepared.isValidText(instance))
    // warmup
    (1 to 3000).foreach { _ => prepared.isValid(JsonValue.parse(instance)) }
    (1 to 3000).foreach { _ => prepared.isValidText(instance) }
    // interleaved rounds, best-of per label: the shared microVM has
    // CPU-steal windows, so a single timed block per label confounds the
    // engine's speed with whatever the host was doing in that second
    val rounds = 3
    val best = scala.collection.mutable.LinkedHashMap[String, Double]()
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      val s = (System.nanoTime() - t0) / 1e9
      val r = n / s
      if (r > best.getOrElse(label, 0d)) best(label) = r
    }
    val interpOnly = Interp.prepare(Spec.parseJson(schema))
    (1 to rounds).foreach { _ =>
      time("parse-only")      { var i = 0; while (i < n) { JsonValue.parse(instance); i += 1 } }
      time("validate-only")   { var i = 0; while (i < n) { prepared.isValid(parsed); i += 1 } }
      time("parse+validate")  { var i = 0; while (i < n) { prepared.isValid(JsonValue.parse(instance)); i += 1 } }
      time("stream-validate") { var i = 0; while (i < n) { prepared.isValidText(instance); i += 1 } }
      time("tree-walk-only")  { var i = 0; while (i < n) { interpOnly.isValidInterp(parsed); i += 1 } }
    }
    best.foreach { case (label, r) =>
      println(f"$label: $r%.0f docs/s (${1e9 / r}%.0f ns/doc)")
    }
  }
}
