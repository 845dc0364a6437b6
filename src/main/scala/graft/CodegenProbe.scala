package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.debug._

object CodegenProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val clips = graft.audio.ClipsGen.generate(spark, 100, 2).toDF()
    val plan = graft.audio.AudioChecks.fullPlan(clips.schema)
    val validated = plan.withValidation(clips)
    val agg = validated.agg(count(lit(1)), sum(when(!col("valid"), 1L).otherwise(0L)),
      sum(size(col("violations"))))
    val out = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(out)) { agg.debugCodegen() }
    val code = out.toString
    System.err.println("audioSnr calls: " + "audioSnr\\(".r.findAllIn(code).size)
    System.err.println("pcmStats calls: " + "pcmStats\\(".r.findAllIn(code).size)
    System.err.println("expectedTranscript calls: " + "expectedTranscript\\(".r.findAllIn(code).size)
    System.err.println("subExpr funcs: " + "subExpr".r.findAllIn(code).size)
    System.err.println("total chars: " + code.length)
    java.nio.file.Files.writeString(java.nio.file.Paths.get("/tmp/clips_codegen.txt"), code)
    spark.stop()
  }
}
