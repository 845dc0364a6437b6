package graft

import org.apache.spark.sql.SparkSession

/** Scaling-efficiency evidence (north rule: throughput scaling >= 0.8 from
  * N to 4N executors). The sandbox has no cluster, so per the driver's
  * instruction we run the SAME job on the SAME input at two parallelism
  * levels — local[8] and local[32] — and report throughput at both plus
  * efficiency = (T8 / T32) / (32 / 8). Results are appended to
  * BENCH_SCALING.md and summarized in BASELINE.md.
  */
object ScalingBench {

  private def run(cores: Int, clipsPath: String, repeats: Int): Double = {
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-scaling-$cores")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Bench.validateClips(spark, clipsPath) // warmup
    val times = (1 to repeats).map { _ =>
      val t0 = System.nanoTime()
      Bench.validateClips(spark, clipsPath)
      (System.nanoTime() - t0) / 1e9
    }
    spark.stop()
    // SparkContext must be fully cleared before a new master is used
    org.apache.spark.sql.SparkSession.clearActiveSession()
    org.apache.spark.sql.SparkSession.clearDefaultSession()
    times.min
  }

  def main(args: Array[String]): Unit = {
    val nClips = sys.env.getOrElse("SPARK_GRAFT_CLIPS", "200000").toLong
    val repeats = sys.env.getOrElse("SPARK_GRAFT_REPEATS", "3").toInt

    // fixture written once with a bootstrap session
    val boot = SparkSession.builder().master("local[8]")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    boot.sparkContext.setLogLevel("WARN")
    val clipsPath = Bench.clipsFixture(boot, nClips, 64)
    boot.stop()
    SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()

    val t8 = run(8, clipsPath, repeats)
    val t32 = run(32, clipsPath, repeats)
    val tp8 = nClips / t8
    val tp32 = nClips / t32
    val eff = (t8 / t32) / (32.0 / 8.0)

    val line = f"""{"clips":$nClips,"t_local8_sec":$t8%.3f,"t_local32_sec":$t32%.3f,"clips_per_sec_8":$tp8%.0f,"clips_per_sec_32":$tp32%.0f,"scaling_efficiency":$eff%.3f}"""
    println(line)
    val md =
      f"""
         |## Scaling run ${java.time.Instant.now()}
         |
         || cores | time (s) | clips/sec |
         || --- | --- | --- |
         || local[8] | $t8%.3f | $tp8%.0f |
         || local[32] | $t32%.3f | $tp32%.0f |
         |
         |efficiency (T8/T32)/(32/8) = **$eff%.3f** (target >= 0.8) over $nClips clips, full constraint suite.
         |""".stripMargin
    java.nio.file.Files.writeString(java.nio.file.Paths.get("BENCH_SCALING.md"), md,
      java.nio.file.StandardOpenOption.CREATE, java.nio.file.StandardOpenOption.APPEND)
  }
}
