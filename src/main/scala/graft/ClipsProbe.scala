package graft

import org.apache.spark.sql.SparkSession

/** Focused clips-suite throughput probe: one JVM, one parallelism level,
  * N repeats — for separating engine regressions from the shared box's
  * CPU-steal bursts (BENCH_SCALING.md methodology note). */
object ClipsProbe {
  def main(args: Array[String]): Unit = {
    val cores = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val nClips = sys.env.getOrElse("SPARK_GRAFT_CLIPS", "200000").toLong
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPEATS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", s"${16 * 1024 * 1024}")
      .config("spark.sql.files.openCostInBytes", s"${1024 * 1024}")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val path = Bench.clipsFixture(spark, nClips, 128)
    val times = (1 to reps).map { i =>
      val t0 = System.nanoTime()
      val rows = Bench.validateClips(spark, path)
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[probe] rep=$i rows=$rows time=$dt%.2fs clips_per_sec=${rows / dt}%.0f")
      dt
    }
    println(f"[probe] min=${times.min}%.2fs best_clips_per_sec=${nClips / times.min}%.0f")
    spark.stop()
  }
}
