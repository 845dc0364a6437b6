package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object CodegenProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val q = SparkEntry.queries("q_validate_nested")(spark, "/root/testdata/sf0.001")
    val p = q.queryExecution.executedPlan.toString
    System.err.println("WSCG stages: " + "\\*\\(\\d+\\)".r.findAllIn(p).toSeq.distinct.mkString(","))
    p.linesIterator.filter(l => l.contains("HashAggregate")).foreach(l => System.err.println(l.take(80)))
    System.err.println("forall in plan: " + "forall".r.findAllIn(p).size)
    System.err.println("exists in plan: " + "exists".r.findAllIn(p).size)
    System.err.println("lambdafunction: " + "lambdafunction".r.findAllIn(p.toLowerCase).size)
    System.err.println("forallelems: " + "forallelems".r.findAllIn(p.toLowerCase).size)
    System.err.println("counttrueelems: " + "counttrueelems".r.findAllIn(p.toLowerCase).size)
    spark.stop()
  }
}
