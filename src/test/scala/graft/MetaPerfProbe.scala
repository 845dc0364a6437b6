package graft

import graft.spec._

/** Scratch probe: official-metaschema validation throughput (exercises
  * the compiled dynamic-dispatch path). */
object MetaPerfProbe {
  def main(args: Array[String]): Unit = {
    def res(n: String): JsonValue = JsonValue.parse(new String(
      getClass.getResourceAsStream(s"/metaschema-2020-12/$n").readAllBytes(), "UTF-8"))
    val docs = Seq("schema.json", "meta/core.json", "meta/applicator.json",
      "meta/validation.json").map(res)
    val p = Meta.officialPrepared
    (1 to 50).foreach(_ => docs.foreach(p.isValid))
    var t0 = System.nanoTime()
    (1 to 200).foreach(_ => docs.foreach(p.isValid))
    println(f"compiled:  ${(System.nanoTime() - t0) / (200.0 * docs.size) / 1000}%.1f us/doc")
    (1 to 50).foreach(_ => docs.foreach(p.isValidInterp))
    t0 = System.nanoTime()
    (1 to 200).foreach(_ => docs.foreach(p.isValidInterp))
    println(f"tree-walk: ${(System.nanoTime() - t0) / (200.0 * docs.size) / 1000}%.1f us/doc")
  }
}
