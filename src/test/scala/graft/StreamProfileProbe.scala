package graft

import graft.spec._

/** Dev probe: poor-man's sampling profiler for the stream-validate lane —
  * runs the loop in a worker thread and samples its stack, printing the
  * hottest (class, method) frames. No JFR/agents in this container. */
object StreamProfileProbe {
  def main(args: Array[String]): Unit = {
    val lane = args.headOption.getOrElse("stream")
    val instance = new String(getClass.getResourceAsStream(
      "/bench/recursive_instance.json").readAllBytes(), "UTF-8")
    val schema = new String(getClass.getResourceAsStream(
      "/bench/recursive_schema.json").readAllBytes(), "UTF-8")
    val prepared = Interp.prepare(Spec.parseJson(schema))
    require(prepared.isValidText(instance))
    @volatile var stop = false
    val worker = new Thread(() => {
      while (!stop) {
        var i = 0
        while (i < 1000) {
          lane match {
            case "stream" => prepared.isValidText(instance)
            case "parse"  => JsonValue.parse(instance)
            case "pv"     => prepared.isValid(JsonValue.parse(instance))
          }
          i += 1
        }
      }
    }, "probe-worker")
    worker.setDaemon(true)
    worker.start()
    Thread.sleep(2000) // JIT warmup
    val counts = scala.collection.mutable.HashMap[String, Int]()
    val leaf = scala.collection.mutable.HashMap[String, Int]()
    val stacks = scala.collection.mutable.HashMap[Vector[String], Int]()
    val t0 = System.nanoTime()
    var samples = 0
    while (System.nanoTime() - t0 < 10e9.toLong) {
      val st = worker.getStackTrace
      if (st.nonEmpty) {
        samples += 1
        val top = st.head
        leaf(s"${top.getClassName}.${top.getMethodName}") =
          leaf.getOrElse(s"${top.getClassName}.${top.getMethodName}", 0) + 1
        st.take(12).map(f => s"${f.getClassName}.${f.getMethodName}").distinct.foreach { fr =>
          counts(fr) = counts.getOrElse(fr, 0) + 1
        }
        if (st.exists(_.getClassName.contains("Compiled"))) {
          val key = st.take(14).toVector.map(f => s"${f.getClassName}.${f.getMethodName}:${f.getLineNumber}")
          stacks(key) = stacks.getOrElse(key, 0) + 1
        }
      }
      Thread.sleep(2)
    }
    stop = true
    // most frequent full stacks through Compiled twins
    println("== stacks through Compiled (top 3) ==")
    stacks.toSeq.sortBy(-_._2).take(3).foreach { case (st, c) =>
      println(f"  -- ${100.0 * c / samples}%4.1f%%"); st.foreach(f => println(s"     $f"))
    }
    println(s"== $lane: $samples samples; LEAF frames ==")
    leaf.toSeq.sortBy(-_._2).take(18).foreach { case (f, c) =>
      println(f"  ${100.0 * c / samples}%5.1f%% $f")
    }
    println("== frames anywhere in top-12 ==")
    counts.toSeq.sortBy(-_._2).take(18).foreach { case (f, c) =>
      println(f"  ${100.0 * c / samples}%5.1f%% $f")
    }
  }
}
