package graft

import graft.spec._

/** Sampling profile of the CITM streaming validate lane (r06 CITM-gap
  * investigation — same method as StreamProfileProbe, CITM workload). */
object CitmProfileProbe {
  def main(args: Array[String]): Unit = {
    val instance = new String(getClass.getResourceAsStream(
      "/bench/citm_catalog.json").readAllBytes(), "UTF-8")
    val schema = new String(getClass.getResourceAsStream(
      "/bench/citm_catalog_schema.json").readAllBytes(), "UTF-8")
    val prepared = Interp.prepare(Spec.parseJson(schema))
    require(prepared.isValidText(instance))
    @volatile var stop = false
    @volatile var iters = 0L
    val worker = new Thread(() => {
      while (!stop) { prepared.isValidText(instance); iters += 1 }
    }, "probe-worker")
    worker.setDaemon(true)
    worker.start()
    Thread.sleep(3000)
    val it0 = iters; val t0 = System.nanoTime()
    val counts = scala.collection.mutable.HashMap[String, Int]()
    val leaf = scala.collection.mutable.HashMap[String, Int]()
    var samples = 0
    while (System.nanoTime() - t0 < 10e9.toLong) {
      val st = worker.getStackTrace
      if (st.nonEmpty) {
        samples += 1
        val top = st.head
        leaf(s"${top.getClassName}.${top.getMethodName}:${top.getLineNumber}") =
          leaf.getOrElse(s"${top.getClassName}.${top.getMethodName}:${top.getLineNumber}", 0) + 1
        st.take(10).map(f => s"${f.getClassName}.${f.getMethodName}").distinct.foreach { fr =>
          counts(fr) = counts.getOrElse(fr, 0) + 1
        }
        if (st.head.getMethodName == "regionMatches" && st.length > 1) {
          val c = s"caller:${st(1).getClassName}.${st(1).getMethodName}:${st(1).getLineNumber}"
          leaf(c) = leaf.getOrElse(c, 0) + 1
        }
      }
      Thread.sleep(2)
    }
    val dps = (iters - it0) * 1e9 / (System.nanoTime() - t0)
    stop = true
    println(f"docs/s single-core: $dps%.1f  samples=$samples")
    println("== leaf frames ==")
    leaf.toSeq.sortBy(-_._2).take(15).foreach { case (f, c) =>
      println(f"  ${100.0 * c / samples}%5.1f%%  $f") }
    println("== frames (top 15, any depth) ==")
    counts.toSeq.sortBy(-_._2).take(15).foreach { case (f, c) =>
      println(f"  ${100.0 * c / samples}%5.1f%%  $f") }
  }
}
