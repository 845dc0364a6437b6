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
    // warmup
    (1 to 3000).foreach { _ => prepared.isValid(JsonValue.parse(instance)) }
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"$label: ${n / s}%.0f docs/s (${s * 1e9 / n}%.0f ns/doc)")
    }
    time("parse-only")      { var i = 0; while (i < n) { JsonValue.parse(instance); i += 1 } }
    time("validate-only")   { var i = 0; while (i < n) { prepared.isValid(parsed); i += 1 } }
    time("parse+validate")  { var i = 0; while (i < n) { prepared.isValid(JsonValue.parse(instance)); i += 1 } }
    val interpOnly = Interp.prepare(Spec.parseJson(schema))
    time("tree-walk-only")  { var i = 0; while (i < n) { interpOnly.isValidInterp(parsed); i += 1 } }
  }
}
