package graft

import graft.spec._

/** Dev probe: run the streaming validator once and dump the dispatch-path
  * diagnostics counters (requires GRAFT_STREAM_DEBUG). */
object StreamDbgDump {
  def main(args: Array[String]): Unit = {
    val instance = new String(getClass.getResourceAsStream(
      "/bench/recursive_instance.json").readAllBytes(), "UTF-8")
    val schema = new String(getClass.getResourceAsStream(
      "/bench/recursive_schema.json").readAllBytes(), "UTF-8")
    val prepared = Interp.prepare(Spec.parseJson(schema))
    (1 to 100).foreach(_ => require(prepared.isValidText(instance)))
    val labels = Seq("calls", "undecided!=1", "buffered", "consGrown",
      "nonStringValue", "keyNotDispatch", "noFastTag", "fastHit")
    labels.zip(Streaming.DBG).foreach { case (l, c) => println(s"$l: $c") }
  }
}
