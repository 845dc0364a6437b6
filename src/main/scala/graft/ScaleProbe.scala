package graft

import org.apache.spark.sql.SparkSession

/** One-level clips-suite probe against an EXISTING fixture path (r06
  * scaling investigation — lets heap/core variants run without
  * regenerating fixtures). args: <path> [cores] [reps] */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val path = args(0)
    val cores = args.lift(1).getOrElse("32")
    val reps = args.lift(2).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder().master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", s"${16 * 1024 * 1024}")
      .config("spark.sql.files.openCostInBytes", s"${1024 * 1024}")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val ts = (1 to reps).map { i =>
      val t0 = System.nanoTime()
      val rows = Bench.validateClips(spark, path)
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[scaleprobe] cores=$cores rep=$i rows=$rows time=$dt%.2fs rate=${rows/dt}%.0f/s")
      dt
    }
    println(f"[scaleprobe] cores=$cores min=${ts.min}%.2fs")
    spark.stop()
  }
}
