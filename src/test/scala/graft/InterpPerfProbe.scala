package graft

import graft.spec._

/** Scratch single-thread profiler for the recursive-validation path. */
object InterpPerfProbe {
  def main(args: Array[String]): Unit = {
    def res(name: String): String =
      new String(getClass.getResourceAsStream(s"/bench/$name").readAllBytes(), "UTF-8")
    val schema = res("recursive_schema.json")
    val instanceStr = res("recursive_instance.json")
    val prepared = Interp.prepare(Spec.parseJson(schema))
    val v = JsonValue.parse(instanceStr)
    // warmup
    (1 to 50).foreach(_ => { JsonValue.parse(instanceStr); prepared.isValid(v) })
    var t0 = System.nanoTime()
    (1 to 500).foreach(_ => JsonValue.parse(instanceStr))
    println(f"parse:   ${(System.nanoTime() - t0) / 500.0 / 1000}%.1f us/doc")
    t0 = System.nanoTime()
    (1 to 500).foreach(_ => prepared.isValid(v))
    println(f"isValid: ${(System.nanoTime() - t0) / 500.0 / 1000}%.1f us/doc")

    // poor-man's sampling profiler: histogram of graft frames
    @volatile var stop = false
    val worker = new Thread(() => while (!stop) prepared.isValid(v))
    worker.setDaemon(true); worker.start()
    val hist = scala.collection.mutable.Map[String, Int]().withDefaultValue(0)
    val until = System.nanoTime() + 3e9.toLong
    while (System.nanoTime() < until) {
      val st = worker.getStackTrace
      // topmost frame + topmost graft frame
      if (st.nonEmpty) {
        hist("TOP " + st.head.getClassName + "." + st.head.getMethodName) += 1
        st.find(f => f.getClassName.startsWith("graft") || f.getClassName.startsWith("java.util.regex"))
          .foreach(f => hist("G " + f.getClassName + "." + f.getMethodName + ":" + f.getLineNumber) += 1)
      }
      Thread.sleep(2)
    }
    stop = true
    hist.toSeq.sortBy(-_._2).take(25).foreach { case (k, n) => println(f"$n%5d  $k") }
  }
}
