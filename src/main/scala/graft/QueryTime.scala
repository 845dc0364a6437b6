package graft

import org.apache.spark.sql.SparkSession

/** Local iteration probe: time selected SparkEntry queries the way Bench
  * does (`.count()`, min over reps in a warm JVM) without the clips
  * fixture. Usage: runMain graft.QueryTime <sfDir> <q1,q2,...> [reps] */
object QueryTime {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").toSeq
    val reps = args.lift(2).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      System.err.println(f"[qtime] $name min=${ts.min}%.2fs reps=[${ts.map(t => f"$t%.2f").mkString(",")}]")
    }
    spark.stop()
  }
}
